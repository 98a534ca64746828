from ttnx.utils.manifold import (  # noqa: F401
    ttvector_manifold,
    TTVectorSpace,
    manifold_gradient_descent,
    rayleigh_quotient,
    retract,
)
from ttnx.utils.convert import (  # noqa: F401
    to_ttvector,
    from_reference_layout,
    to_reference_layout,
)
from ttnx.utils.checkpoint import save_tt, load_tt  # noqa: F401
from ttnx.utils.validation import (  # noqa: F401
    assert_valid_tt,
    assert_valid_tto,
    assert_finite,
    debug_nans,
)
from ttnx.utils.profiling import (  # noqa: F401
    trace,
    Timer,
    SolverTelemetry,
    sync_and_time,
    contraction_flops,
)
