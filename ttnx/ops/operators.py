"""QTT operator constructors: Toeplitz stencils, Laplacian boundary-condition
family, prolongations, spin-chain Hamiltonians.

All cores are tiny structured constants assembled host-side with numpy and
shipped to the device once — XLA then folds them into the jitted solver
programs. Layout: ``(r_left, n_out, n_in, r_right)``.

Reference semantics: /root/reference/src/tt_operators.jl. One deliberate
improvement: the NN-Laplacian is built with rank-1 boundaries (the reference
pads its boundary ranks to 4/5 and relies on its contraction routine reading
only the first boundary entry, lines 332-349), which additionally lets
``qtt_laplacian`` support NN in more than one dimension.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ttnx.core.tt import TTOperator, id_tto
from ttnx.core.algebra import add_op, kron_tto, scale_op

__all__ = [
    "toeplitz_to_qtto",
    "shift",
    "gradient",
    "laplacian",
    "laplacian_DN",
    "laplacian_ND",
    "laplacian_NN",
    "laplacian_P",
    "inv_laplacian_DN",
    "qtto_prolongation",
    "qtto_constant_prolongation",
    "qtto_linear_prolongation",
    "pauli_matrix",
    "pauli_sum_tto",
    "pauli_pair_sum_tto",
    "H_mu",
    "H_munu",
    "heisenberg_xyz_tto",
    "ising_tto",
    "xxz_tto",
    "xxx_tto",
    "xy_tto",
    "qtt_laplacian",
]

_ID = np.eye(2)
_J = np.array([[0.0, 1.0], [0.0, 0.0]])  # superdiagonal shift block
_JT = _J.T
_I1 = np.array([[1.0, 0.0], [0.0, 0.0]])
_I2 = np.array([[0.0, 0.0], [0.0, 1.0]])
_E = np.ones((2, 2))


def _op(blocks, dtype=np.float64) -> TTOperator:
    """Build a TTOperator from a list of per-site block matrices.

    ``blocks[k]`` is a nested list ``[[B_00, B_01, ...], ...]`` of 2x2 physical
    blocks (or ``0``); entry ``(a, b)`` is the physical block connecting left
    bond index a to right bond index b. Site 0 must have one row, site d-1 one
    column.
    """
    cores = []
    for block in blocks:
        rl = len(block)
        rr = len(block[0])
        core = np.zeros((rl, 2, 2, rr), dtype=dtype)
        for a in range(rl):
            for b in range(rr):
                blk = block[a][b]
                if isinstance(blk, (int, float)) and blk == 0:
                    continue
                core[a, :, :, b] = blk
        cores.append(jnp.asarray(core))
    return TTOperator(cores)


def toeplitz_to_qtto(alpha, beta, gamma, d: int) -> TTOperator:
    """Rank-3 exact QTT of the tridiagonal Toeplitz matrix
    ``alpha*I + beta*sub + gamma*super`` — the master finite-difference stencil
    (/root/reference/src/tt_operators.jl:4-19)."""
    first = [[_ID, _JT, _J]]
    mid = [[_ID, _JT, _J], [0, _J, 0], [0, 0, _JT]]
    last = [[alpha * _ID + beta * _J + gamma * _JT], [gamma * _J], [beta * _JT]]
    if d == 1:
        return _op([[[alpha * _ID + beta * _J + gamma * _JT]]])
    blocks = [first] + [mid] * (d - 2) + [last]
    return _op(blocks)


def shift(d: int) -> TTOperator:
    """(/root/reference/src/tt_operators.jl:24-26)"""
    return toeplitz_to_qtto(0, 1, 0, d)


def gradient(d: int) -> TTOperator:
    """Gradient stencil ``toeplitz(1, 0, -1)``
    (/root/reference/src/tt_operators.jl:276-279; exported as ``∇``)."""
    return toeplitz_to_qtto(1, 0, -1, d)


def laplacian(d: int) -> TTOperator:
    """Dirichlet–Dirichlet Laplacian ``toeplitz(2, -1, -1)``
    (/root/reference/src/tt_operators.jl:283-285; exported as ``Δ``)."""
    return toeplitz_to_qtto(2, -1, -1, d)


def laplacian_DN(d: int) -> TTOperator:
    """Dirichlet–Neumann Laplacian, rank 4
    (/root/reference/src/tt_operators.jl:290-306)."""
    if d < 4:
        raise ValueError("Dimension must be at least 4")
    first = [[_ID, _JT, _J, _I2]]
    mid = [[_ID, _JT, _J, 0], [0, _J, 0, 0], [0, 0, _JT, 0], [0, 0, 0, _I2]]
    last = [[2 * _ID - _J - _JT], [-_J], [-_JT], [-_I2]]
    return _op([first] + [mid] * (d - 2) + [last])


def laplacian_ND(d: int) -> TTOperator:
    """Neumann–Dirichlet Laplacian, rank 4
    (/root/reference/src/tt_operators.jl:311-327)."""
    if d < 4:
        raise ValueError("Dimension must be at least 4")
    first = [[_ID, _JT, _J, _I1]]
    mid = [[_ID, _JT, _J, 0], [0, _J, 0, 0], [0, 0, _JT, 0], [0, 0, 0, _I1]]
    last = [[2 * _ID - _J - _JT], [-_J], [-_JT], [-_I1]]
    return _op([first] + [mid] * (d - 2) + [last])


def laplacian_NN(d: int) -> TTOperator:
    """Neumann–Neumann Laplacian, rank 5 with rank-1 boundaries
    (/root/reference/src/tt_operators.jl:332-349)."""
    if d < 4:
        raise ValueError("Dimension must be at least 4")
    first = [[_ID, _JT, _J, _I2, _I1]]
    mid = [
        [_ID, _JT, _J, 0, 0],
        [0, _J, 0, 0, 0],
        [0, 0, _JT, 0, 0],
        [0, 0, 0, _I2, 0],
        [0, 0, 0, 0, -_I1],
    ]
    last = [[2 * _ID - _J - _JT], [-_J], [-_JT], [-_I2], [-_I1]]
    return _op([first] + [mid] * (d - 2) + [last])


def laplacian_P(d: int) -> TTOperator:
    """Periodic Laplacian, rank 5 (/root/reference/src/tt_operators.jl:354-381)."""
    if d < 4:
        raise ValueError("Dimension must be at least 4")
    first = [[_ID, _JT, _J, _J, _JT]]
    mid = [
        [_ID, _JT, _J, 0, 0],
        [0, _J, 0, 0, 0],
        [0, 0, _JT, 0, 0],
        [0, 0, 0, _J, 0],
        [0, 0, 0, 0, _JT],
    ]
    last = [[2 * _ID - _J - _JT], [-_J], [-_JT], [-_J], [-_JT]]
    return _op([first] + [mid] * (d - 2) + [last])


def inv_laplacian_DN(d: int) -> TTOperator:
    """Exact inverse of the Dirichlet–Neumann Laplacian, rank 4
    (/root/reference/src/tt_operators.jl:386-413)."""
    if d < 2:
        raise ValueError("Dimension must be at least 2")
    first = [[_ID, _I2, _J, _JT]]
    mid = [
        [_ID, _I2, _J, _JT],
        [0, 2 * _E, 0, 0],
        [0, _I2 + _JT, _E, 0],
        [0, _I2 + _J, 0, _E],
    ]
    last = [[_E + _I2], [2 * _E], [_E + _I2 + _JT], [_E + _I2 + _J]]
    return _op([first] + [mid] * (d - 2) + [last])


def qtto_prolongation(d: int) -> TTOperator:
    """Multigrid prolongation, rank 2 (/root/reference/src/tt_operators.jl:418-436)."""
    if d < 2:
        raise ValueError("Dimension must be at least 2")
    first = [[0.5 * _ID, 0.5 * _JT]]
    mid = [[_ID, _JT], [0, _J]]
    last_core = np.zeros((2, 2, 2, 1))
    # reference fills (i, j) entries of the final core directly:
    last_core[0, 0, 0, 0] = 1.0
    last_core[0, 1, 0, 0] = 2.0
    last_core[0, 0, 1, 0] = 1.0
    last_core[0, 1, 1, 0] = 0.0
    cores = _op([first] + [mid] * (d - 2)).cores if d > 2 else _op([first]).cores
    return TTOperator(list(cores) + [jnp.asarray(last_core)])


def qtto_constant_prolongation(d: int) -> TTOperator:
    """Constant prolongation from d to d+1 binary sites: identity cores plus a
    rectangular ones-core with singleton input dim
    (/root/reference/src/tt_operators.jl:441-458)."""
    if d < 1:
        raise ValueError("Dimension must be at least 1")
    cores = list(id_tto(d).cores)
    cores.append(jnp.ones((1, 2, 1, 1), dtype=jnp.float64))
    return TTOperator(cores)


def qtto_linear_prolongation(d: int) -> TTOperator:
    """Linear prolongation from d to d+1 binary sites:
    identity branch ⊕ ``0.5*(I + shift)`` branch with a rectangular selector
    core (/root/reference/src/tt_operators.jl:463-504)."""
    if d < 1:
        raise ValueError("Dimension must be at least 1")
    ident = id_tto(d)
    if d == 1:
        avg_core = jnp.asarray(0.5 * np.array([[1.0, 1.0], [0.0, 1.0]])
                               ).reshape(1, 2, 2, 1)
        average = TTOperator([avg_core])
    else:
        average = add_op(scale_op(0.5, id_tto(d)), scale_op(0.5, shift(d)))
    ir, ar = ident.ranks, average.ranks
    cores = []
    for k in range(d):
        rl = 1 if k == 0 else ir[k] + ar[k]
        rr = ir[k + 1] + ar[k + 1]
        core = np.zeros((rl, 2, 2, rr))
        ic = np.asarray(ident.cores[k])
        ac = np.asarray(average.cores[k])
        if k == 0:
            core[0:1, :, :, : ir[1]] = ic
            core[0:1, :, :, ir[1]:] = ac
        else:
            core[: ir[k], :, :, : ir[k + 1]] = ic
            core[ir[k]:, :, :, ir[k + 1]:] = ac
        cores.append(jnp.asarray(core))
    l0, l1 = ir[d], ar[d]
    last = np.zeros((l0 + l1, 2, 1, 1))
    last[:l0, 0, 0, 0] = 1.0  # identity branch -> even points (bit 0)
    last[l0:, 1, 0, 0] = 1.0  # average branch -> odd points (bit 1)
    cores.append(jnp.asarray(last))
    return TTOperator(cores)


# ---------------------------------------------------------------------------
# Spin chains
# ---------------------------------------------------------------------------


def _pauli_axis(mu) -> str:
    axis = str(mu).lower().lstrip(":")
    if axis in ("x", "y", "z"):
        return axis
    raise ValueError("Pauli axis must be 'x', 'y', or 'z'")


def pauli_matrix(mu):
    """(/root/reference/src/tt_operators.jl:45-54)"""
    axis = _pauli_axis(mu)
    if axis == "x":
        return np.array([[0.0, 1.0], [1.0, 0.0]])
    if axis == "y":
        return np.array([[0.0, -1j], [1j, 0.0]], dtype=np.complex128)
    return np.array([[1.0, 0.0], [0.0, -1.0]])


def _pauli_pair_factors(mu, nu):
    """YY pairs use the real-arithmetic trick ``-Y_real ⊗ Y_real``
    (/root/reference/src/tt_operators.jl:56-64)."""
    a, b = _pauli_axis(mu), _pauli_axis(nu)
    if a == "y" and b == "y":
        y_real = np.array([[0.0, -1.0], [1.0, 0.0]])
        return -y_real, y_real
    return pauli_matrix(a), pauli_matrix(b)


def pauli_sum_tto(mu, d: int) -> TTOperator:
    """Rank-2 MPO of ``sum_i P_mu^(i)`` (/root/reference/src/tt_operators.jl:75-107)."""
    if d < 1:
        raise ValueError("number of spin sites must be at least 1")
    P = pauli_matrix(mu)
    dtype = np.complex128 if np.iscomplexobj(P) else np.float64
    eye = np.eye(2, dtype=dtype)
    if d == 1:
        return TTOperator([jnp.asarray(P.reshape(1, 2, 2, 1))])
    first = [[P, eye]]
    mid = [[eye, 0], [P, eye]]
    last = [[eye], [P]]
    return _op([first] + [mid] * (d - 2) + [last], dtype=dtype)


def pauli_pair_sum_tto(mu, nu, d: int) -> TTOperator:
    """Rank-3 nearest-neighbor MPO of ``sum_i P_mu^(i) P_nu^(i+1)``
    (/root/reference/src/tt_operators.jl:118-148)."""
    if d < 2:
        raise ValueError("nearest-neighbor Pauli pair sum needs at least 2 sites")
    Pmu, Pnu = _pauli_pair_factors(mu, nu)
    dtype = np.result_type(Pmu.dtype, Pnu.dtype, np.float64)
    eye = np.eye(2, dtype=dtype)
    first = [[0, Pmu, eye]]
    mid = [[eye, 0, 0], [Pnu, 0, 0], [0, Pmu, eye]]
    last = [[eye], [Pnu], [0]]
    return _op([first] + [mid] * (d - 2) + [last], dtype=dtype)


def H_mu(mu, d: int) -> TTOperator:
    return pauli_sum_tto(mu, d)


def H_munu(mu, nu, d: int) -> TTOperator:
    return pauli_pair_sum_tto(mu, nu, d)


def heisenberg_xyz_tto(d: int, jx=1.0, jy=1.0, jz=1.0, lam=0.0,
                       field="x") -> TTOperator:
    """Open-boundary Heisenberg XYZ Hamiltonian as a direct rank-5 MPO
    ``H = jx H_xx + jy H_yy + jz H_zz + lam H_field``
    (/root/reference/src/tt_operators.jl:162-218)."""
    if d < 2:
        raise ValueError("Heisenberg XYZ chain needs at least 2 spin sites")
    Px1, Px2 = _pauli_pair_factors("x", "x")
    Py1, Py2 = _pauli_pair_factors("y", "y")
    Pz1, Pz2 = _pauli_pair_factors("z", "z")
    Pf = pauli_matrix(field) if lam != 0 else np.zeros((2, 2))
    dtype = np.result_type(Px1.dtype, Py1.dtype, Pz1.dtype, Pf.dtype,
                           type(jx), type(jy), type(jz), type(lam), np.float64)
    eye = np.eye(2, dtype=dtype)
    first = [[lam * Pf, jx * Px1, jy * Py1, jz * Pz1, eye]]
    mid = [
        [eye, 0, 0, 0, 0],
        [Px2, 0, 0, 0, 0],
        [Py2, 0, 0, 0, 0],
        [Pz2, 0, 0, 0, 0],
        [lam * Pf, jx * Px1, jy * Py1, jz * Pz1, eye],
    ]
    last = [[eye], [Px2], [Py2], [Pz2], [lam * Pf]]
    return _op([first] + [mid] * (d - 2) + [last], dtype=dtype)


def ising_tto(d: int, J=1.0, h=0.0, interaction="z", field="x") -> TTOperator:
    """(/root/reference/src/tt_operators.jl:229-238)"""
    axis = _pauli_axis(interaction)
    jx = J if axis == "x" else 0.0
    jy = J if axis == "y" else 0.0
    jz = J if axis == "z" else 0.0
    return heisenberg_xyz_tto(d, jx=jx, jy=jy, jz=jz, lam=h, field=field)


def xxz_tto(d: int, J=1.0, delta=1.0, h=0.0, field="z") -> TTOperator:
    """(/root/reference/src/tt_operators.jl:247-249)"""
    return heisenberg_xyz_tto(d, jx=J, jy=J, jz=J * delta, lam=h, field=field)


def xxx_tto(d: int, J=1.0, h=0.0, field="z") -> TTOperator:
    """(/root/reference/src/tt_operators.jl:258-260)"""
    return heisenberg_xyz_tto(d, jx=J, jy=J, jz=J, lam=h, field=field)


def xy_tto(d: int, jx=1.0, jy=1.0, h=0.0, field="z") -> TTOperator:
    """(/root/reference/src/tt_operators.jl:269-271)"""
    return heisenberg_xyz_tto(d, jx=jx, jy=jy, jz=0.0, lam=h, field=field)


# ---------------------------------------------------------------------------
# Multi-dimensional QTT Laplacian
# ---------------------------------------------------------------------------

# Greek-letter aliases matching the reference's exported names (``∇`` and
# ``Δ⁻¹_DN`` are not valid Python identifiers; use ``gradient`` /
# ``inv_laplacian_DN`` for those).
Δ = laplacian
Δ_DN = laplacian_DN
Δ_ND = laplacian_ND
Δ_NN = laplacian_NN
Δ_P = laplacian_P

_BC_BUILDERS = {
    "DD": laplacian,
    "DN": laplacian_DN,
    "ND": laplacian_ND,
    "NN": laplacian_NN,
}


def qtt_laplacian(n_dims: int, bits_per_dim: int, ordering: str = "interleaved",
                  a: float = 0.0, b: float = 1.0, bc: str = "DN"):
    """n-D Laplacian as a Kronecker sum of 1-D BC-variant operators with
    ``1/h^2`` scaling, returned as a ``QTTOperator``
    (/root/reference/src/tt_operators.jl:644-703).

    Unlike the reference, ``bc='NN'`` works for ``n_dims > 1`` here because our
    NN operator has rank-1 boundaries.
    """
    from ttnx.ops.qtt import QTTOperator, reorder_op

    if ordering not in ("interleaved", "serial"):
        raise ValueError("ordering must be 'interleaved' or 'serial'")
    if n_dims < 1:
        raise ValueError("n_dims must be at least 1")
    if bc not in _BC_BUILDERS:
        raise ValueError("bc must be 'DD', 'DN', 'ND', or 'NN'")

    d = bits_per_dim
    h = (b - a) / (2 ** d - 1)
    scl = 1.0 / h ** 2
    lap_1d = _BC_BUILDERS[bc](d)
    eye_1d = id_tto(d)

    if n_dims == 1:
        return QTTOperator(scale_op(scl, lap_1d), 1, d, ordering)

    def build_term(k: int) -> TTOperator:
        term = lap_1d if k == 0 else eye_1d
        for dim in range(1, n_dims):
            term = kron_tto(term, lap_1d if dim == k else eye_1d)
        return term

    result = scale_op(scl, build_term(0))
    for k in range(1, n_dims):
        result = add_op(result, scale_op(scl, build_term(k)))

    serial = QTTOperator(result, n_dims, d, "serial")
    if ordering == "serial":
        return serial
    return reorder_op(serial, "interleaved")
