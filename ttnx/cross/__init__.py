from ttnx.cross.cross import (  # noqa: F401
    MaxVol,
    Greedy,
    DMRGCross,
    DMRG,
    MaxVolPivot,
    RandomPivot,
    tt_cross,
    tt_integrate,
    gauss_legendre,
)
from ttnx.cross.maxvol import maxvol  # noqa: F401
from ttnx.cross.device import (  # noqa: F401
    dmrg_cross_device,
    evaluate_tt_indices,
    index_evaluator,
    maxvol_cross_device,
    maxvol_fixed,
    tt_cross_device,
)
