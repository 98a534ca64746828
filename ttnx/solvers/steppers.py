"""Time steppers: explicit/implicit Euler, Crank–Nicolson, RK4.

Reference: /root/reference/src/solvers/euler.jl. The inner linear solve
dispatches over {mals, als, dmrg, krylov}; rank control is explicit
(``max_bond``) rather than the reference's global side channel.
"""

from __future__ import annotations

import numpy as np

from ttnx.core.algebra import add, add_op, dot, matvec, norm, scale, scale_op, sub
from ttnx.core.canonical import orthogonalize, tt_compress
from ttnx.core.tt import TTOperator, TTVector, id_tto
from ttnx.solvers.als import als_linsolve
from ttnx.solvers.dmrg import dmrg_linsolve
from ttnx.solvers.krylov import krylov_linsolve
from ttnx.solvers.mals import mals_linsolve

__all__ = ["euler_method", "implicit_euler_method", "crank_nicholson_method",
           "rk4_method"]


def _solve(tt_solver, M, rhs, guess, max_bond, **kwargs):
    if tt_solver == "mals":
        return mals_linsolve(M, rhs, guess, **kwargs)
    if tt_solver == "als":
        return als_linsolve(M, rhs, guess, **kwargs)
    if tt_solver == "dmrg":
        return dmrg_linsolve(M, rhs, guess, **kwargs)
    if tt_solver == "krylov":
        return krylov_linsolve(M, rhs, guess, max_bond=max_bond, **kwargs)
    raise ValueError(f"Unknown TT solver: {tt_solver}")


def euler_method(A: TTOperator, u0: TTVector, steps, normalize: bool = True,
                 return_error: bool = False):
    """Explicit Euler ``u <- u + h A u``
    (reference euler_method /root/reference/src/solvers/euler.jl:76-97)."""
    u = u0
    eye = id_tto(A.N, dtype=A.dtype)
    for h in np.atleast_1d(steps):
        update = matvec(A, u)
        u = orthogonalize(add(u, scale(h, update)), 0)
        if normalize:
            u = scale(1.0 / float(np.sqrt(np.real(dot(u, u)))), u)
    if return_error:
        h = float(np.atleast_1d(steps)[-1])
        M = add_op(eye, scale_op(h, A))
        residual = sub(u, matvec(M, u))
        return u, float(norm(residual) / norm(u))
    return u


def implicit_euler_method(A: TTOperator, u0: TTVector, guess: TTVector, steps,
                          normalize: bool = True, return_error: bool = False,
                          tt_solver: str = "mals", max_bond: int = 0,
                          **kwargs):
    """Implicit Euler: solve ``(I - h A) u_next = u`` each step
    (reference implicit_euler_method /root/reference/src/solvers/euler.jl:99-143)."""
    u = u0
    u_prev = u0
    eye = id_tto(A.N, dtype=A.dtype)
    for h in np.atleast_1d(steps):
        M = add_op(eye, scale_op(-h, A))
        nxt = _solve(tt_solver, M, u, guess, max_bond, **kwargs)
        if normalize:
            nxt = scale(1.0 / float(norm(nxt)), nxt)
        u_prev = u
        u = tt_compress(nxt, max_bond) if max_bond > 0 else orthogonalize(nxt, 0)
        guess = u
    if return_error:
        h = float(np.atleast_1d(steps)[-1])
        M = add_op(eye, scale_op(-h, A))
        residual = sub(matvec(M, u), u_prev)
        return u, float(norm(residual) / norm(u))
    return u


def crank_nicholson_method(A: TTOperator, u0: TTVector, guess: TTVector, steps,
                           normalize: bool = True, return_error: bool = False,
                           tt_solver: str = "mals", max_bond: int = 0,
                           **kwargs):
    """Crank–Nicolson: ``(I - h/2 A) u_next = (I + h/2 A) u``
    (reference crank_nicholson_method /root/reference/src/solvers/euler.jl:145-191)."""
    u = u0
    u_prev = u0
    eye = id_tto(A.N, dtype=A.dtype)
    for h in np.atleast_1d(steps):
        lhs = add_op(eye, scale_op(-h / 2, A))
        rhs = matvec(add_op(eye, scale_op(h / 2, A)), u)
        nxt = _solve(tt_solver, lhs, rhs, guess, max_bond, **kwargs)
        if normalize:
            nxt = scale(1.0 / float(norm(nxt)), nxt)
        u_prev = u
        u = tt_compress(nxt, max_bond) if max_bond > 0 else orthogonalize(nxt, 0)
        guess = u
    if return_error:
        h = float(np.atleast_1d(steps)[-1])
        lhs = add_op(eye, scale_op(-h / 2, A))
        rhs = matvec(add_op(eye, scale_op(h / 2, A)), u_prev)
        residual = sub(matvec(lhs, u), rhs)
        return u, float(norm(residual) / norm(u))
    return u


def rk4_method(A: TTOperator, u0: TTVector, steps, max_bond: int,
               normalize: bool = True, return_error: bool = False):
    """Classic RK4 with rank compression after every stage
    (reference rk4_method /root/reference/src/solvers/euler.jl:193-222)."""
    u = u0

    def increment(u, h):
        k1 = matvec(A, u)
        k2 = matvec(A, tt_compress(add(u, scale(h / 2, k1)), max_bond))
        k3 = matvec(A, tt_compress(add(u, scale(h / 2, k2)), max_bond))
        k4 = matvec(A, tt_compress(add(u, scale(h, k3)), max_bond))
        ksum = add(add(k1, scale(2.0, k2)), add(scale(2.0, k3), k4))
        return scale(h / 6, tt_compress(ksum, max_bond))

    for h in np.atleast_1d(steps):
        u_new = tt_compress(add(u, increment(u, h)), max_bond)
        if normalize:
            u_new = scale(1.0 / float(np.sqrt(np.real(dot(u_new, u_new)))), u_new)
        u = u_new
    if return_error:
        h = float(np.atleast_1d(steps)[-1])
        incr = increment(u, h)
        residual = tt_compress(sub(sub(u, sub(u, incr)), incr), max_bond)
        return u, float(norm(residual) / max(float(norm(u)), 1e-300))
    return u
