"""Jitted 2-site TDVP tests (rank-adaptive, vs the eager implementation)."""

import numpy as np

from ttnx import id_tto, qtt_sin, toeplitz_to_qtto, ttv_to_tensor
from ttnx.solvers.tdvp import tdvp2
from ttnx.solvers.tdvp_scan import tdvp2_scan


def vec(tt):
    return np.asarray(ttv_to_tensor(tt)).reshape(-1)


def test_zero_hamiltonian_identity():
    d = 4
    out = tdvp2_scan(0.0 * id_tto(d), qtt_sin(d, lam=np.pi), [0.05],
                     normalize=False, rmax=8)
    ref = vec(qtt_sin(d, lam=np.pi))
    assert np.linalg.norm(vec(out) - ref) / np.linalg.norm(ref) < 1e-12


def test_matches_eager_real_time():
    d = 4
    H = toeplitz_to_qtto(2.0, -1.0, -1.0, d)
    u0 = qtt_sin(d)
    eager = tdvp2(H, u0, [0.01] * 3, normalize=False, max_bond=8)
    scan = tdvp2_scan(H, u0, [0.01] * 3, normalize=False, rmax=8, max_bond=8)
    rel = np.linalg.norm(vec(scan) - vec(eager)) / np.linalg.norm(vec(eager))
    assert rel < 1e-10


def test_matches_eager_imaginary_time():
    d = 4
    hg = 1.0 / (2 ** d + 1)
    A = (0.1 / hg ** 2) * toeplitz_to_qtto(-2.0, 1.0, 1.0, d)
    u0 = qtt_sin(d, a=hg, b=1 - hg)
    eager = tdvp2(A, u0, [1e-3] * 5, imaginary_time=True, normalize=False,
                  max_bond=8, truncerr=1e-12)
    scan = tdvp2_scan(A, u0, [1e-3] * 5, imaginary_time=True, normalize=False,
                      rmax=8, max_bond=8, truncerr=1e-12)
    rel = np.linalg.norm(vec(scan) - np.real(vec(eager))) / np.linalg.norm(
        vec(eager))
    assert rel < 1e-12


def test_rank_adaptation_honest():
    # starting from rank 2, ranks grow only where the state needs them and
    # numerically-zero singular values are not counted
    d = 5
    H = toeplitz_to_qtto(2.0, -1.0, -1.0, d)
    u0 = qtt_sin(d)
    out = tdvp2_scan(H, u0, [0.01] * 2, normalize=False, rmax=8, max_bond=6,
                     truncerr=1e-12)
    assert max(out.ranks) <= 6
    assert max(out.ranks) > 2  # grew beyond the initial rank


def test_real_dtype_gram_split_matches_complex_svd():
    """The device form of tdvp2 (real f64 imaginary time, eigh split)
    matches the complex SVD path."""
    import jax.numpy as jnp
    import numpy as np

    d = 4
    hg = 1.0 / (2 ** d + 1)
    A = (0.1 / hg ** 2) * toeplitz_to_qtto(-2.0, 1.0, 1.0, d)
    u0 = qtt_sin(d, a=hg, b=1 - hg)
    steps = [1e-3] * 2
    ref = tdvp2_scan(A, u0, steps, imaginary_time=True, normalize=False,
                     max_bond=8)
    dev = tdvp2_scan(A, u0, steps, imaginary_time=True, normalize=False,
                     max_bond=8, dtype=jnp.float64, split="gram")
    rel = (np.linalg.norm(vec(dev) - np.real(vec(ref)))
           / np.linalg.norm(vec(ref)))
    assert rel < 1e-10, rel
