"""Quantics-TT tooling: grids, analytic function encodings, multi-dimensional
QTT wrappers with serial/interleaved orderings, core splitting/merging.

Bit convention (matches the reference's big-endian maps,
/root/reference/src/qtt_tools.jl:15-23): site 0 carries the most significant
bit, so with C-order arrays ``tensor.reshape(-1)`` *is* the uniform-grid
vector and no index shuffling ever happens on device.
"""

from __future__ import annotations

import math
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ttnx.core import algebra
from ttnx.core.decomp import ttv_decomp, ttv_to_tensor
from ttnx.core.tt import TTOperator, TTVector

__all__ = [
    "gauss_chebyshev_lobatto",
    "index_to_point",
    "tuple_to_index",
    "function_to_tensor",
    "tensor_to_grid",
    "function_to_qtt",
    "function_to_qtt_uniform",
    "qtt_to_function",
    "qtt_to_vector",
    "qtt_polynom",
    "qtt_cos",
    "qtt_sin",
    "qtt_exp",
    "qtt_chebyshev",
    "qtt_basis_vector",
    "qtt_trapezoidal",
    "qtto_to_matrix",
    "to_qtt",
    "to_ttv",
    "QTTVector",
    "QTTOperator",
    "check_compat",
    "reorder",
    "reorder_vec",
    "reorder_op",
    "function_to_qttv",
    "qttv_to_array",
]


# ---------------------------------------------------------------------------
# Grids and index maps
# ---------------------------------------------------------------------------


def gauss_chebyshev_lobatto(n: int, shifted: bool = True):
    """Chebyshev–Lobatto nodes and weights
    (/root/reference/src/qtt_tools.jl:3-13)."""
    j = np.arange(n)
    x = np.cos(np.pi * j / (n - 1))
    w = np.pi / (n - 1) * np.ones(n)
    w[0] /= 2
    w[-1] /= 2
    if shifted:
        x = (x + 1) / 2
        w = w / 2
    return x, w


def index_to_point(bits: Sequence[int]) -> float:
    """Map big-endian bits (0-based) to ``x`` on the uniform grid of
    ``[0, 1]`` with ``2^d - 1`` spacing (/root/reference/src/qtt_tools.jl:15-18,
    which uses 1-based indices)."""
    d = len(bits)
    n = sum(int(b) << (d - 1 - i) for i, b in enumerate(bits))
    return n / (2 ** d - 1)


def tuple_to_index(bits: Sequence[int]) -> int:
    """Big-endian bits (0-based) to 0-based linear grid index
    (/root/reference/src/qtt_tools.jl:20-23 is the 1-based variant)."""
    d = len(bits)
    return sum(int(b) << (d - 1 - i) for i, b in enumerate(bits))


def _sample_grid(f: Callable, xs: np.ndarray) -> np.ndarray:
    """Evaluate ``f`` on a 1-D grid, vectorized when possible."""
    try:
        out = np.asarray(f(xs))
        if out.shape == xs.shape:
            return out
    except Exception:
        pass
    return np.asarray([f(float(x)) for x in xs])


def function_to_tensor(f: Callable, d: int, a: float = 0.0, b: float = 1.0):
    """Sample ``f`` on the 2^d-point uniform grid of [0, 1] and reshape to the
    bit tensor (the reference's ``a``/``b`` keywords are likewise inert on the
    grid, /root/reference/src/qtt_tools.jl:25-31)."""
    del a, b  # kept for signature parity; the reference samples [0, 1] too
    n = 2 ** d
    xs = np.arange(n) / (n - 1)
    vals = _sample_grid(f, xs)
    return jnp.asarray(vals.reshape((2,) * d))


def tensor_to_grid(tensor):
    """Bit tensor -> grid vector: a C-order reshape
    (/root/reference/src/qtt_tools.jl:33-40)."""
    return jnp.asarray(tensor).reshape(-1)


def function_to_qtt(f: Callable, d: int, a: float = 0.0, b: float = 1.0,
                    tol: float = 1e-12) -> TTVector:
    """(/root/reference/src/qtt_tools.jl:45-48)"""
    return ttv_decomp(np.asarray(function_to_tensor(f, d, a, b)), tol=tol)


def function_to_qtt_uniform(f: Callable, d: int, tol: float = 1e-12) -> TTVector:
    """Left-endpoint uniform sampling ``x_n = n / 2^d`` with LITTLE-endian bit
    order (site 0 = least significant bit).

    This mirrors the reference exactly: its Julia ``digits()`` scatter makes
    this the one little-endian encoding in the package
    (/root/reference/src/qtt_tools.jl:73-82), which is what pairs with the
    bit-reversing quantics DFT MPO (see :func:`ttnx.ops.fourier.fourier_qtto`).
    """
    n = 2 ** d
    xs = np.arange(n) / n
    vals = _sample_grid(f, xs)
    little = vals.reshape((2,) * d).transpose(tuple(range(d - 1, -1, -1)))
    return ttv_decomp(little, tol=tol)


def qtt_to_vector(qtt: TTVector):
    """QTT -> grid vector by progressive contraction, O(2^d r^2)
    (/root/reference/src/qtt_tools.jl:57-71)."""
    return ttv_to_tensor(qtt).reshape(-1)


def qtt_to_function(qtt: TTVector):
    """(/root/reference/src/qtt_tools.jl:53-55)"""
    return qtt_to_vector(qtt)


# ---------------------------------------------------------------------------
# Analytic QTT encodings (exact low-rank cores)
# ---------------------------------------------------------------------------


def _qtt_rank_struct(d: int, r: int) -> list[np.ndarray]:
    """Zero cores of the (1, r, ..., r, 1) rank profile."""
    rks = [1] + [r] * (d - 1) + [1]
    return [np.zeros((rks[k], 2, rks[k + 1])) for k in range(d)]


def qtt_polynom(coef: Sequence[float], d: int, a: float = 0.0,
                b: float = 1.0) -> TTVector:
    """Exact rank-p QTT of the polynomial with coefficients ``coef`` on the
    uniform grid of [a, b] — binomial cascade cores
    (/root/reference/src/qtt_tools.jl:88-110)."""
    p = len(coef)
    h = (b - a) / (2 ** d - 1)
    cores = _qtt_rank_struct(d, p)

    def phi(x, s):
        return sum(coef[k] * x ** (k - s) * math.comb(k, s) for k in range(s, p))

    t1 = a
    cores[0][0, 0, :] = [phi(t1, k) for k in range(p)]
    t1 = a + h * 2 ** (d - 1)  # convention: coarsest bit first
    cores[0][0, 1, :] = [phi(t1, k) for k in range(p)]
    for k in range(1, d - 1):
        tk = h * 2 ** (d - 1 - k)
        for j in range(p):
            cores[k][j, 0, j] = 1.0
            for i in range(p):
                cores[k][i, 1, j] = math.comb(i, i - j) * tk ** (i - j) if i >= j else 0.0
    cores[d - 1][0, 0, 0] = 1.0
    td = h
    cores[d - 1][:, 1, 0] = [td ** k for k in range(p)]
    return TTVector([jnp.asarray(c) for c in cores])


def _qtt_trig(d: int, a: float, b: float, lam: float, first_row, last_col) -> TTVector:
    """Shared rank-2 rotation-core builder for sin/cos
    (/root/reference/src/qtt_tools.jl:116-154)."""
    h = (b - a) / (2 ** d - 1)
    cores = _qtt_rank_struct(d, 2)

    def rot(t):
        c, s = math.cos(lam * math.pi * t), math.sin(lam * math.pi * t)
        return np.array([[c, -s], [s, c]])

    cores[0][0, 0, :] = first_row(a)
    cores[0][0, 1, :] = first_row(a + h * 2 ** (d - 1))
    for k in range(1, d - 1):
        tk = h * 2 ** (d - 1 - k)
        cores[k][:, 0, :] = np.eye(2)
        cores[k][:, 1, :] = rot(tk)
    cores[d - 1][0, 0, 0] = 1.0
    cores[d - 1][:, 1, 0] = last_col(h)
    return TTVector([jnp.asarray(c) for c in cores])


def qtt_sin(d: int, a: float = 0.0, b: float = 1.0, lam: float = 1.0) -> TTVector:
    """Exact rank-2 QTT of ``sin(lam*pi*x)`` on the uniform grid of [a, b]
    (/root/reference/src/qtt_tools.jl:138-154)."""
    return _qtt_trig(
        d, a, b, lam,
        first_row=lambda t: [math.sin(lam * math.pi * t), math.cos(lam * math.pi * t)],
        last_col=lambda t: [math.cos(lam * math.pi * t), math.sin(lam * math.pi * t)],
    )


def qtt_cos(d: int, a: float = 0.0, b: float = 1.0, lam: float = 1.0) -> TTVector:
    """Exact rank-2 QTT of ``cos(lam*pi*x)``
    (/root/reference/src/qtt_tools.jl:116-132)."""
    return _qtt_trig(
        d, a, b, lam,
        first_row=lambda t: [math.cos(lam * math.pi * t), -math.sin(lam * math.pi * t)],
        last_col=lambda t: [math.cos(lam * math.pi * t), math.sin(lam * math.pi * t)],
    )


def qtt_exp(d: int, a: float = 0.0, b: float = 1.0, alpha: float = 1.0,
            beta: float = 0.0) -> TTVector:
    """Exact rank-1 QTT of ``exp(alpha*x + beta)``
    (/root/reference/src/qtt_tools.jl:160-176)."""
    h = (b - a) / (2 ** d - 1)
    cores = _qtt_rank_struct(d, 1)
    cores[0][0, 0, 0] = math.exp(alpha * a + beta)
    cores[0][0, 1, 0] = math.exp(alpha * (a + h * 2 ** (d - 1)) + beta)
    for k in range(1, d - 1):
        cores[k][0, 0, 0] = 1.0
        cores[k][0, 1, 0] = math.exp(alpha * h * 2 ** (d - 1 - k))
    cores[d - 1][0, 0, 0] = 1.0
    cores[d - 1][0, 1, 0] = math.exp(alpha * h)
    return TTVector([jnp.asarray(c) for c in cores])


def qtt_chebyshev(n: int, d: int) -> TTVector:
    """Exact rank-2 QTT of the Chebyshev polynomial T_n on the shifted
    Chebyshev–Lobatto nodes (/root/reference/src/qtt_tools.jl:207-223)."""
    cores = _qtt_rank_struct(d, 2)
    N = 2 ** d
    x_nodes, _ = gauss_chebyshev_lobatto(N, shifted=True)
    theta = np.arccos(np.clip(2 * x_nodes - 1, -1.0, 1.0))

    def rot(t):
        return np.array([[math.cos(n * t), -math.sin(n * t)],
                         [math.sin(n * t), math.cos(n * t)]])

    cores[0][0, 0, :] = [math.cos(n * theta[0]), -math.sin(n * theta[0])]
    idx = 2 ** (d - 1)
    cores[0][0, 1, :] = [math.cos(n * theta[idx]), -math.sin(n * theta[idx])]
    for k in range(1, d - 1):
        cores[k][:, 0, :] = np.eye(2)
        cores[k][:, 1, :] = rot(theta[2 ** (d - 1 - k)])
    cores[d - 1][:, 0, 0] = [1.0, 0.0]
    cores[d - 1][:, 1, 0] = [math.cos(n * theta[1]), math.sin(n * theta[1])]
    return TTVector([jnp.asarray(c) for c in cores])


def qtt_basis_vector(d: int, pos: int, val: float = 1.0) -> TTVector:
    """Rank-1 QTT of ``val * e_pos`` (0-based position; the reference is
    1-based, /root/reference/src/qtt_tools.jl:190-199)."""
    cores = _qtt_rank_struct(d, 1)
    for k in range(d):
        bit = (pos >> (d - 1 - k)) & 1
        cores[k][0, bit, 0] = val if k == 0 else 1.0
    return TTVector([jnp.asarray(c) for c in cores])


def qtt_trapezoidal(d: int, a: float = 0.0, b: float = 1.0) -> TTVector:
    """Quadrature-weight vector as rank-1 QTT: all-ones scaled by the grid
    spacing ``h``, exactly as the reference builds it
    (/root/reference/src/qtt_tools.jl:225-241)."""
    h = (b - a) / (2 ** d - 1)
    cores = _qtt_rank_struct(d, 1)
    for k in range(d):
        cores[k][0, :, 0] = 1.0
    out = TTVector([jnp.asarray(c) for c in cores])
    return algebra.scale(h, out)


def qtto_to_matrix(A: TTOperator):
    """MPO -> dense matrix with big-endian row/column bit order
    (/root/reference/src/qtt_tools.jl:181-188)."""
    from ttnx.core.decomp import tto_to_tensor

    t = tto_to_tensor(A)
    return t.reshape(int(np.prod(A.out_dims)), int(np.prod(A.in_dims)))


# ---------------------------------------------------------------------------
# TT <-> QTT core splitting
# ---------------------------------------------------------------------------


def to_qtt(tt: TTVector, split_dims: Sequence[Sequence[int]],
           threshold: float = 0.0) -> TTVector:
    """Split each core's physical dimension into factors via SVD, big-endian
    (first factor = coarsest) — /root/reference/src/qtt_tools.jl:254-310.
    ``threshold`` is relative to the largest singular value."""
    if len(split_dims) != tt.N:
        raise ValueError("split_dims must have one entry per TT core")
    for i in range(tt.N):
        if int(np.prod(split_dims[i])) != tt.dims[i]:
            raise ValueError(f"prod(split_dims[{i}]) must equal {tt.dims[i]}")

    out_cores = []
    for i in range(tt.N):
        core = tt.cores[i]  # (r_l, n, r_r)
        rank_prev = core.shape[0]
        rank_next = core.shape[2]
        remaining = tt.dims[i]
        for split_size in list(split_dims[i])[:-1]:
            remaining //= split_size
            # C-order reshape puts the coarse factor first: big-endian split.
            m = core.reshape(rank_prev, split_size, remaining, rank_next)
            m = m.reshape(rank_prev * split_size, remaining * rank_next)
            u, s, vt = jnp.linalg.svd(m, full_matrices=False)
            s_host = np.asarray(s)
            if threshold > 0:
                keep = max(1, int(np.sum(s_host / s_host[0] > threshold)))
            else:
                keep = s_host.size
            out_cores.append(u[:, :keep].reshape(rank_prev, split_size, keep))
            core = (s[:keep, None] * vt[:keep, :]).reshape(
                keep, remaining, rank_next)
            rank_prev = keep
        out_cores.append(core)
    return TTVector(out_cores)


def to_ttv(qtt: TTVector, merge_numbers: Sequence[int]) -> TTVector:
    """Contract consecutive cores back into merged physical dims, big-endian
    (/root/reference/src/qtt_tools.jl:323-360)."""
    if sum(merge_numbers) != qtt.N:
        raise ValueError(
            f"merge_numbers must sum to {qtt.N} (the number of QTT cores)")
    out_cores = []
    k = 0
    for count in merge_numbers:
        core = qtt.cores[k]
        for j in range(k + 1, k + count):
            nxt = qtt.cores[j]
            rl, n1, _ = core.shape
            _, n2, rr = nxt.shape
            core = jnp.einsum("amb,bnc->amnc", core, nxt).reshape(rl, n1 * n2, rr)
        out_cores.append(core)
        k += count
    return TTVector(out_cores)


# ---------------------------------------------------------------------------
# Multi-dimensional QTT wrappers
# ---------------------------------------------------------------------------


def _check_qtt_meta(N, dims, n_dims, bits_per_dim, ordering):
    if n_dims * bits_per_dim != N:
        raise ValueError(
            f"n_dims * bits_per_dim must equal N "
            f"(got {n_dims}*{bits_per_dim}={n_dims * bits_per_dim} != {N})")
    if any(n != 2 for n in dims):
        raise ValueError(f"All physical dimensions must be 2 for QTT (got {dims})")
    if ordering not in ("interleaved", "serial"):
        raise ValueError(
            f"ordering must be 'interleaved' or 'serial' (got {ordering})")


@jax.tree_util.register_pytree_node_class
class QTTVector(TTVector):
    """A QTT state with multi-dimensional metadata: ``n_dims`` spatial
    dimensions x ``bits_per_dim`` bits, sites in ``'serial'`` or
    ``'interleaved'`` order (/root/reference/src/qtt_tools.jl:370-379)."""

    __slots__ = ("n_dims", "bits_per_dim", "ordering")

    def __init__(self, tt: TTVector | Sequence, n_dims: int, bits_per_dim: int,
                 ordering: str, ot=None):
        if isinstance(tt, TTVector):
            cores, ot = tt.cores, tt.ot
        else:
            cores = tt
        super().__init__(cores, ot)
        _check_qtt_meta(len(self.cores), self.dims, n_dims, bits_per_dim, ordering)
        self.n_dims = int(n_dims)
        self.bits_per_dim = int(bits_per_dim)
        self.ordering = ordering

    def tree_flatten(self):
        return self.cores, (self.ot, self.n_dims, self.bits_per_dim, self.ordering)

    @classmethod
    def tree_unflatten(cls, aux, children):
        ot, n_dims, bits_per_dim, ordering = aux
        obj = object.__new__(cls)
        obj.cores = tuple(children)
        obj.ot = ot
        obj.n_dims = n_dims
        obj.bits_per_dim = bits_per_dim
        obj.ordering = ordering
        return obj

    def tt(self) -> TTVector:
        """Strip metadata (reference's ``TTvector(q)``)."""
        return TTVector(self.cores, self.ot)

    def _rewrap(self, tt: TTVector) -> "QTTVector":
        return QTTVector(tt, self.n_dims, self.bits_per_dim, self.ordering)

    # arithmetic keeps metadata when compatible
    def __add__(self, other):
        if isinstance(other, QTTVector):
            check_compat(self, other)
            return self._rewrap(algebra.add(self.tt(), other.tt()))
        return algebra.add(self.tt(), other)

    def __sub__(self, other):
        if isinstance(other, QTTVector):
            check_compat(self, other)
            return self._rewrap(algebra.sub(self.tt(), other.tt()))
        return algebra.sub(self.tt(), other)

    def __mul__(self, a):
        return self._rewrap(algebra.scale(a, self.tt()))

    __rmul__ = __mul__

    def __truediv__(self, a):
        return self._rewrap(algebra.scale(1.0 / a, self.tt()))

    def __neg__(self):
        return self._rewrap(algebra.scale(-1.0, self.tt()))

    def astype(self, dtype):
        return self._rewrap(self.tt().astype(dtype))

    def conj(self):
        return self._rewrap(self.tt().conj())

    def copy(self):
        return self._rewrap(self.tt())

    # metadata-preserving forwards (reference's ~35 dispatch forwards,
    # /root/reference/src/qtt_tools.jl:530-647)
    def hadamard(self, other):
        check_compat(self, other)
        o = other.tt() if isinstance(other, QTTVector) else other
        return self._rewrap(algebra.hadamard(self.tt(), o))

    def orthogonalize(self, i: int = 0):
        from ttnx.core.canonical import orthogonalize as _orth

        return self._rewrap(_orth(self.tt(), i))

    def compress(self, max_bond: int, **kwargs):
        from ttnx.core.canonical import tt_compress as _compress

        return self._rewrap(_compress(self.tt(), max_bond, **kwargs))

    def increase_ranks(self, max_bond: int, **kwargs):
        from ttnx.core.tt import increase_ranks as _inc

        return self._rewrap(_inc(self.tt(), max_bond, **kwargs))

    def entanglement_entropy(self, base=None):
        from ttnx.core.canonical import entanglement_entropy as _ee
        import math as _math

        return _ee(self.tt(), base if base is not None else _math.e)

    def __repr__(self):
        return (
            f"QTTVector(dtype={self.dtype}, {self.n_dims}d x "
            f"{self.bits_per_dim} bits, {self.ordering}, ranks={self.ranks})"
        )


@jax.tree_util.register_pytree_node_class
class QTTOperator(TTOperator):
    """A QTT operator with multi-dimensional metadata
    (/root/reference/src/qtt_tools.jl:384-393)."""

    __slots__ = ("n_dims", "bits_per_dim", "ordering")

    def __init__(self, tt: TTOperator | Sequence, n_dims: int, bits_per_dim: int,
                 ordering: str, ot=None):
        if isinstance(tt, TTOperator):
            cores, ot = tt.cores, tt.ot
        else:
            cores = tt
        super().__init__(cores, ot)
        _check_qtt_meta(len(self.cores), self.dims, n_dims, bits_per_dim, ordering)
        self.n_dims = int(n_dims)
        self.bits_per_dim = int(bits_per_dim)
        self.ordering = ordering

    def tree_flatten(self):
        return self.cores, (self.ot, self.n_dims, self.bits_per_dim, self.ordering)

    @classmethod
    def tree_unflatten(cls, aux, children):
        ot, n_dims, bits_per_dim, ordering = aux
        obj = object.__new__(cls)
        obj.cores = tuple(children)
        obj.ot = ot
        obj.n_dims = n_dims
        obj.bits_per_dim = bits_per_dim
        obj.ordering = ordering
        return obj

    def tt(self) -> TTOperator:
        return TTOperator(self.cores, self.ot)

    def _rewrap(self, tt: TTOperator) -> "QTTOperator":
        return QTTOperator(tt, self.n_dims, self.bits_per_dim, self.ordering)

    def __add__(self, other):
        if isinstance(other, QTTOperator):
            check_compat(self, other)
            return self._rewrap(algebra.add_op(self.tt(), other.tt()))
        return algebra.add_op(self.tt(), other)

    def __sub__(self, other):
        if isinstance(other, QTTOperator):
            check_compat(self, other)
            return self._rewrap(algebra.sub_op(self.tt(), other.tt()))
        return algebra.sub_op(self.tt(), other)

    def __mul__(self, a):
        if isinstance(a, (TTVector, TTOperator)):
            return self.__matmul__(a)
        return self._rewrap(algebra.scale_op(a, self.tt()))

    def __rmul__(self, a):
        return self._rewrap(algebra.scale_op(a, self.tt()))

    def __matmul__(self, other):
        if isinstance(other, QTTVector):
            check_compat(self, other)
            return other._rewrap(algebra.matvec(self.tt(), other.tt()))
        if isinstance(other, TTVector):
            return algebra.matvec(self.tt(), other)
        if isinstance(other, QTTOperator):
            check_compat(self, other)
            return self._rewrap(algebra.matmul(self.tt(), other.tt()))
        if isinstance(other, TTOperator):
            return algebra.matmul(self.tt(), other)
        raise TypeError(f"cannot contract QTTOperator with {type(other)}")

    def copy(self):
        return self._rewrap(self.tt())

    def astype(self, dtype):
        return self._rewrap(self.tt().astype(dtype))

    def __repr__(self):
        return (
            f"QTTOperator(dtype={self.dtype}, {self.n_dims}d x "
            f"{self.bits_per_dim} bits, {self.ordering}, ranks={self.ranks})"
        )


def check_compat(a, b) -> None:
    """Metadata compatibility guard (/root/reference/src/qtt_tools.jl:491-528).
    Plain TT objects are always compatible."""
    a_is_q = isinstance(a, (QTTVector, QTTOperator))
    b_is_q = isinstance(b, (QTTVector, QTTOperator))
    if not (a_is_q and b_is_q):
        return
    if a.n_dims != b.n_dims:
        raise ValueError(f"QTT n_dims mismatch: {a.n_dims} != {b.n_dims}")
    if a.bits_per_dim != b.bits_per_dim:
        raise ValueError(
            f"QTT bits_per_dim mismatch: {a.bits_per_dim} != {b.bits_per_dim}")
    if a.ordering != b.ordering:
        raise ValueError(f"QTT ordering mismatch: {a.ordering} != {b.ordering}")


# ---------------------------------------------------------------------------
# Ordering conversion (serial <-> interleaved) via adjacent swap network
# ---------------------------------------------------------------------------


def _swap_adjacent_sites(a, b, threshold: float = 0.0):
    """Swap physical indices of adjacent MPS cores via contract + transposed
    SVD re-split (/root/reference/src/qtt_tools.jl:660-695)."""
    rl, d1, _ = a.shape
    _, d2, rr = b.shape
    m = jnp.einsum("lam,mbr->lbar", a, b).reshape(rl * d2, d1 * rr)
    u, s, vt = jnp.linalg.svd(m, full_matrices=False)
    s_host = np.asarray(s)
    if threshold > 0:
        keep = max(1, int(np.sum(s_host > threshold * s_host[0])))
    else:
        keep = s_host.size
    new_a = u[:, :keep].reshape(rl, d2, keep)
    new_b = (s[:keep, None] * vt[:keep, :]).reshape(keep, d1, rr)
    return new_a, new_b


def _swap_adjacent_sites_op(a, b, threshold: float = 0.0):
    """Operator-core variant (/root/reference/src/qtt_tools.jl:852-885)."""
    rl, d1, _, _ = a.shape
    _, d2, _, rr = b.shape
    m = jnp.einsum("aijm,mklb->aklijb", a, b).reshape(rl * d2 * d2, d1 * d1 * rr)
    u, s, vt = jnp.linalg.svd(m, full_matrices=False)
    s_host = np.asarray(s)
    if threshold > 0:
        keep = max(1, int(np.sum(s_host > threshold * s_host[0])))
    else:
        keep = s_host.size
    new_a = u[:, :keep].reshape(rl, d2, d2, keep)
    new_b = (s[:keep, None] * vt[:keep, :]).reshape(keep, d1, d1, rr)
    return new_a, new_b


def _bubble_sort_swaps(perm: Sequence[int]) -> list[int]:
    """Adjacent-swap positions that bubble-sort ``perm`` ascending
    (/root/reference/src/qtt_tools.jl:705-718)."""
    p = list(perm)
    swaps = []
    n = len(p)
    for _ in range(n):
        for j in range(n - 1):
            if p[j] > p[j + 1]:
                p[j], p[j + 1] = p[j + 1], p[j]
                swaps.append(j)
    return swaps


def _ordering_perm(n_dims: int, bits_per_dim: int, src: str, dst: str) -> list[int]:
    """perm[site] = target position (/root/reference/src/qtt_tools.jl:740-755)."""
    N = n_dims * bits_per_dim
    perm = [0] * N
    for dim in range(n_dims):
        for b in range(bits_per_dim):
            if src == "serial" and dst == "interleaved":
                perm[dim * bits_per_dim + b] = b * n_dims + dim
            else:
                perm[b * n_dims + dim] = dim * bits_per_dim + b
    return perm


def reorder_vec(q: QTTVector, new_ordering: str,
                threshold: float = 0.0) -> QTTVector:
    """Serial <-> interleaved conversion by a bubble-sorted adjacent-swap
    network of SVD re-splits (/root/reference/src/qtt_tools.jl:732-774)."""
    if new_ordering not in ("interleaved", "serial"):
        raise ValueError("ordering must be 'interleaved' or 'serial'")
    if q.ordering == new_ordering:
        return q.copy()
    perm = _ordering_perm(q.n_dims, q.bits_per_dim, q.ordering, new_ordering)
    cores = list(q.cores)
    for k in _bubble_sort_swaps(perm):
        cores[k], cores[k + 1] = _swap_adjacent_sites(
            cores[k], cores[k + 1], threshold)
    return QTTVector(TTVector(cores), q.n_dims, q.bits_per_dim, new_ordering)


def reorder_op(A: QTTOperator, new_ordering: str,
               threshold: float = 0.0) -> QTTOperator:
    """(/root/reference/src/qtt_tools.jl:895-935)"""
    if new_ordering not in ("interleaved", "serial"):
        raise ValueError("ordering must be 'interleaved' or 'serial'")
    if A.ordering == new_ordering:
        return A.copy()
    perm = _ordering_perm(A.n_dims, A.bits_per_dim, A.ordering, new_ordering)
    cores = list(A.cores)
    for k in _bubble_sort_swaps(perm):
        cores[k], cores[k + 1] = _swap_adjacent_sites_op(
            cores[k], cores[k + 1], threshold)
    return QTTOperator(TTOperator(cores), A.n_dims, A.bits_per_dim, new_ordering)


def reorder(q, new_ordering: str, threshold: float = 0.0):
    """Type-dispatching reorder (vector or operator)."""
    if isinstance(q, QTTVector):
        return reorder_vec(q, new_ordering, threshold)
    if isinstance(q, QTTOperator):
        return reorder_op(q, new_ordering, threshold)
    raise TypeError("reorder expects a QTTVector or QTTOperator")


# ---------------------------------------------------------------------------
# Multi-dimensional sampling and readout
# ---------------------------------------------------------------------------


def _serial_to_ordering_axes(n_dims: int, bits_per_dim: int) -> list[int]:
    """axes[t] = serial axis feeding interleaved position t."""
    axes = []
    for level in range(bits_per_dim):
        for dim in range(n_dims):
            axes.append(dim * bits_per_dim + level)
    return axes


def function_to_qttv(f: Callable, n_dims: int, bits_per_dim: int,
                     ordering: str = "interleaved", a: float = 0.0,
                     b: float = 1.0, tol: float = 1e-12) -> QTTVector:
    """Sample an n-D function on the uniform grid and TT-SVD it into a
    ``QTTVector`` (/root/reference/src/qtt_tools.jl:805-839).

    ``f`` receives either a coordinate array of shape ``(m, n_dims)``
    (vectorized, preferred) or a single length-``n_dims`` vector (fallback).
    """
    n_pts = 2 ** bits_per_dim
    h = (b - a) / (n_pts - 1)
    axes = [a + h * np.arange(n_pts)] * n_dims
    mesh = np.meshgrid(*axes, indexing="ij")
    coords = np.stack([m.reshape(-1) for m in mesh], axis=-1)  # (n_pts^nd, nd)
    try:
        vals = np.asarray(f(coords))
        if vals.shape != (coords.shape[0],):
            raise ValueError
    except Exception:
        vals = np.asarray([f(c) for c in coords])
    grid = vals.reshape((n_pts,) * n_dims)
    serial_bits = grid.reshape((2,) * (n_dims * bits_per_dim))
    if ordering == "interleaved":
        tensor = np.transpose(
            serial_bits, _serial_to_ordering_axes(n_dims, bits_per_dim))
    elif ordering == "serial":
        tensor = serial_bits
    else:
        raise ValueError("ordering must be 'interleaved' or 'serial'")
    ttv = ttv_decomp(tensor, tol=tol)
    return QTTVector(ttv, n_dims, bits_per_dim, ordering)


def qttv_to_array(q: QTTVector):
    """Contract the chain and return the ``n_dims``-dimensional grid array
    (/root/reference/src/qtt_tools.jl:943-972)."""
    full = np.asarray(ttv_to_tensor(q.tt()))
    n_pts = 2 ** q.bits_per_dim
    if q.ordering == "interleaved":
        axes = _serial_to_ordering_axes(q.n_dims, q.bits_per_dim)
        inv = np.argsort(axes)
        full = np.transpose(full, inv)
    return jnp.asarray(full.reshape((n_pts,) * q.n_dims))
