"""ttnx — TPU-native tensor-train / quantics-tensor-train numerics in JAX.

A from-scratch TPU-first framework with the capabilities of
``MartinMikkelsen/TensorTrainNumerics.jl`` (mounted read-only at
/root/reference): TT/QTT containers and algebra, SVD decomposition and
rounding, sweep solvers (ALS/MALS/DMRG), time evolution (TDVP, Euler family,
Krylov), QTT function encodings and operators, the QTT Fourier transform,
TT-cross black-box approximation, and quadrature — plus the TPU-only layers the
reference does not have: mesh/sharding parallelism, batched solves, Pallas
kernels, checkpointing, and profiling.

Numerical parity with the reference requires float64, so x64 mode is enabled on
import (pass-through if the user already configured it).
"""

import jax as _jax

_jax.config.update("jax_enable_x64", True)

from ttnx.core.tt import (  # noqa: E402
    TTVector,
    TTOperator,
    zeros_tt,
    ones_tt,
    rand_tt,
    rand_tt_like,
    zeros_tto,
    rand_tto,
    id_tto,
    r_and_d_to_rks,
    increase_ranks,
    concatenate,
    visualize,
)
from ttnx.core.decomp import (  # noqa: E402
    ttv_decomp,
    tto_decomp,
    ttv_to_tensor,
    tto_to_tensor,
    tto_to_ttv,
    ttv_to_tto,
    matricize,
)
from ttnx.core.canonical import (  # noqa: E402
    orthogonalize,
    entanglement_entropy,
    entanglemententropy,
    svdtrunc,
    tt_compress,
    tt_round,
)
from ttnx.core.algebra import (  # noqa: E402
    add,
    sub,
    scale,
    matvec,
    matmul,
    inner_core_product,
    outer_product,
    dot,
    norm,
    hadamard,
    hadamard_ttm,
    kron_tt,
    kron_tto,
    ttv_to_diag_tto,
    linear_combination,
    euclidean_distance,
    euclidean_distance_normalized,
)

__version__ = "0.1.0"
