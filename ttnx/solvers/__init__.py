from ttnx.solvers.als import als_linsolve, als_eigsolve, als_gen_eigsolv  # noqa: F401
from ttnx.solvers.mals import mals_linsolve, mals_eigsolve  # noqa: F401
from ttnx.solvers.dmrg import dmrg_linsolve, dmrg_eigsolve  # noqa: F401
from ttnx.solvers.tdvp import tdvp, tdvp2, tdvp1sweep, tdvp2sweep  # noqa: F401
from ttnx.solvers.steppers import (  # noqa: F401
    euler_method,
    implicit_euler_method,
    crank_nicholson_method,
    rk4_method,
)
from ttnx.solvers.als_scan import (  # noqa: F401
    als_linsolve_scan,
    als_eigsolve_scan,
)
from ttnx.solvers.mals_scan import (  # noqa: F401
    mals_linsolve_scan,
    mals_eigsolve_scan,
)
from ttnx.solvers.dmrg_scan import (  # noqa: F401
    dmrg_linsolve_scan,
    dmrg_eigsolve_scan,
)
from ttnx.solvers.tdvp_scan import (  # noqa: F401
    tdvp1_scan,
    tdvp2_scan,
)
from ttnx.solvers.krylov import (  # noqa: F401
    krylov_linsolve,
    expm_multiply,
    expintegrator_tt,
    gmres_tt,
    bicgstab_tt,
    cg_tt,
)
from ttnx.solvers.round_scan import (  # noqa: F401
    make_cn_evolve,
    make_cn_step,
    matvec_padded,
    tt_round_gram,
    tt_round_scan,
)
