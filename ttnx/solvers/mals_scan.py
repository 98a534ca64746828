"""Jitted rank-adaptive MALS: two-site sweeps with *dynamic* ranks in fixed
buffers — masks are runtime data, not static metadata.

This completes the padded-rank discipline: truncation updates a mask vector
(never a buffer shape), so one compiled program serves every rank trajectory.
The discarded-weight rule (reference sv_trunc,
/root/reference/src/solvers/mals.jl:42-56) becomes a cumulative-sum
computation over the fixed-width singular-value vector.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ttnx.core.canonical import orthogonalize
from ttnx.core.tt import TTOperator, TTVector
from ttnx.solvers.als_scan import (
    _boundary_env,
    _boundary_env_b,
    pack_op,
    pack_tt,
    unpack_tt,
)

__all__ = ["mals_sweep", "mals_linsolve_scan", "mals_eig_sweep",
           "mals_eigsolve_scan"]


def _keep_mask(s, tol, R):
    """Dynamic discarded-weight mask: drop the largest trailing block whose
    squared weight stays below ``tol * |s|^2`` (zero padding singular values
    are always dropped); keep at least one."""
    s2 = s * s
    total = jnp.sum(s2)
    tails = jnp.cumsum(s2[::-1])[::-1]  # tails[i] = sum_{j>=i} s_j^2
    keep_flags = tails >= tol * total
    keep_flags = keep_flags.at[0].set(True)
    return keep_flags.astype(s.dtype)


def _local2_solve(L, Ai, Aj, Renv, Lb, bi, bj, Rb, m_l, m_r):
    R = L.shape[0]
    n = Ai.shape[1]
    M = R * n * n * R
    K = jnp.einsum("aWb,WiIw,wjJv,cvd->aijcbIJd", L, Ai, Aj, Renv,
                   optimize=True).reshape(M, M)
    maskv = (m_l[:, None, None, None] * m_r[None, None, None, :]
             * jnp.ones((1, n, n, 1), dtype=m_l.dtype)).reshape(M)
    K = (K * maskv[:, None] * maskv[None, :] + jnp.diag(1.0 - maskv)
         + 1e-100 * jnp.diag(maskv))
    rhs = jnp.einsum("au,uiv,vjw,cw->aijc", Lb, bi, bj, Rb,
                     optimize=True).reshape(M) * maskv
    return jnp.linalg.solve(K, rhs).reshape(R, n, n, R)


@partial(jax.jit, static_argnames=())
def mals_sweep(A_stack, b_stack, x_stack, mask_stack, tol):
    """One full MALS sweep (forward + backward) with dynamic rank masks.

    Returns ``(x_stack, mask_stack)`` — the mask stack carries the adapted
    ranks as data.
    """
    d, R, n, _ = x_stack.shape
    dt = x_stack.dtype
    RA = A_stack.shape[1]
    Rb = b_stack.shape[1]

    def right_envs(x, masks):
        init = (_boundary_env(R, RA, dt), _boundary_env_b(R, Rb, dt))

        def step(carry, inp):
            Renv, Rb_env = carry
            xc, Ac, bc, mr = inp
            xc = xc * mr[None, None, :]
            new = jnp.einsum("aip,Wijw,bjq,pwq->aWb", jnp.conj(xc), Ac, xc,
                             Renv, optimize=True)
            new_b = jnp.einsum("aip,uiv,pv->au", jnp.conj(xc), bc, Rb_env,
                               optimize=True)
            return (new, new_b), (new, new_b)

        (_, _), (envs, envs_b) = lax.scan(step, init,
                                          (x, A_stack, b_stack, masks[1:]),
                                          reverse=True)
        envs = jnp.concatenate([envs, init[0][None]], axis=0)
        envs_b = jnp.concatenate([envs_b, init[1][None]], axis=0)
        return envs, envs_b

    Renvs, Rb_envs = right_envs(x_stack, mask_stack)

    def fwd(carry, inp):
        L, Lb, m_l, _last = carry
        Ai, Aj, bi, bj, Renv, Rb_env, m_r = inp
        V = _local2_solve(L, Ai, Aj, Renv, Lb, bi, bj, Rb_env, m_l, m_r)
        u, s, vt = jnp.linalg.svd(V.reshape(R * n, n * R),
                                  full_matrices=False)
        keep = _keep_mask(s, tol, R)[:R]
        core = (u[:, :R] * keep[None, :]).reshape(R, n, R)
        sv = (s[:R, None] * vt[:R, :]) * keep[:, None]
        last = sv.reshape(R, n, R)
        L_new = jnp.einsum("aic,aWb,Wijw,bjd->cwd", jnp.conj(core), L, Ai,
                           core, optimize=True)
        Lb_new = jnp.einsum("aip,au,uiv->pv", jnp.conj(core), Lb, bi,
                            optimize=True)
        return (L_new, Lb_new, keep, last), (core, keep)

    L0 = _boundary_env(R, RA, dt)
    Lb0 = _boundary_env_b(R, Rb, dt)
    m0 = jnp.zeros((R,), dtype=mask_stack.dtype).at[0].set(1.0)
    last0 = x_stack[d - 1]
    inputs = (A_stack[:-1], A_stack[1:], b_stack[:-1], b_stack[1:],
              Renvs[2:], Rb_envs[2:], mask_stack[2:])
    (L, Lb, m_last, last), (fwd_cores, fwd_masks) = lax.scan(
        fwd, (L0, Lb0, m0, last0), inputs)
    x_mid = jnp.concatenate([fwd_cores, last[None]], axis=0)
    masks_mid = jnp.concatenate(
        [mask_stack[0][None], fwd_masks, mask_stack[d][None]], axis=0)

    # left envs from the (left-orthogonal) forward cores
    def left_envs(x, masks):
        init = (_boundary_env(R, RA, dt), _boundary_env_b(R, Rb, dt))

        def step(carry, inp):
            L, Lb = carry
            xc, Ac, bc, mr = inp
            xc = xc * mr[None, None, :]
            L_new = jnp.einsum("aic,aWb,Wijw,bjd->cwd", jnp.conj(xc), L, Ac,
                               xc, optimize=True)
            Lb_new = jnp.einsum("aip,au,uiv->pv", jnp.conj(xc), Lb, bc,
                                optimize=True)
            return (L_new, Lb_new), (L_new, Lb_new)

        (_, _), (envs, envs_b) = lax.scan(step, init,
                                          (x, A_stack, b_stack, masks[1:]))
        envs = jnp.concatenate([init[0][None], envs], axis=0)
        envs_b = jnp.concatenate([init[1][None], envs_b], axis=0)
        return envs, envs_b

    Lenvs, Lb_envs = left_envs(x_mid, masks_mid)

    def bwd(carry, inp):
        Renv, Rb_env, m_r, _first = carry
        Ai, Aj, bi, bj, Lenv, Lb_env, m_l = inp
        V = _local2_solve(Lenv, Ai, Aj, Renv, Lb_env, bi, bj, Rb_env,
                          m_l, m_r)
        u, s, vt = jnp.linalg.svd(V.reshape(R * n, n * R),
                                  full_matrices=False)
        keep = _keep_mask(s, tol, R)[:R]
        core = (vt[:R, :] * keep[:, None]).reshape(R, n, R)
        us = (u[:, :R] * s[None, :R]) * keep[None, :]
        first = us.reshape(R, n, R)
        R_new = jnp.einsum("aip,Wijw,bjq,pwq->aWb", jnp.conj(core), Aj, core,
                           Renv, optimize=True)
        Rb_new = jnp.einsum("aip,uiv,pv->au", jnp.conj(core), bj, Rb_env,
                            optimize=True)
        return (R_new, Rb_new, keep, first), (core, keep)

    R0 = _boundary_env(R, RA, dt)
    Rb0 = _boundary_env_b(R, Rb, dt)
    first0 = x_mid[0]
    inputs_b = (A_stack[:-1], A_stack[1:], b_stack[:-1], b_stack[1:],
                Lenvs[: d - 1], Lb_envs[: d - 1], masks_mid[: d - 1])
    (Renv, Rb_env, m_first, first), (bwd_cores, bwd_masks) = lax.scan(
        bwd, (R0, Rb0, m0, first0), inputs_b, reverse=True)
    x_out = jnp.concatenate([first[None], bwd_cores], axis=0)
    masks_out = jnp.concatenate(
        [mask_stack[0][None], bwd_masks, mask_stack[d][None]], axis=0)
    return x_out, masks_out


def _local2_eigmin(L, Ai, Aj, Renv, m_l, m_r):
    """Smallest eigenpair of the masked two-site operator; padded directions
    sit just above the spectral range (data-dependent pad — see
    ttnx.solvers.als_scan._local_eig_padded)."""
    R = L.shape[0]
    n = Ai.shape[1]
    M = R * n * n * R
    K = jnp.einsum("aWb,WiIw,wjJv,cvd->aijcbIJd", L, Ai, Aj, Renv,
                   optimize=True).reshape(M, M)
    maskv = (m_l[:, None, None, None] * m_r[None, None, None, :]
             * jnp.ones((1, n, n, 1), dtype=m_l.dtype)).reshape(M)
    Km = K * maskv[:, None] * maskv[None, :]
    pad = jnp.linalg.norm(Km) + 1.0
    K = Km + jnp.diag(pad * (1.0 - maskv))
    K = 0.5 * (K + K.conj().T)
    w, U = jnp.linalg.eigh(K)
    return w[0], U[:, 0].reshape(R, n, n, R)


@partial(jax.jit, static_argnames=())
def mals_eig_sweep(A_stack, x_stack, mask_stack, tol):
    """One full rank-adaptive MALS eigsweep; returns
    ``(x_stack, mask_stack, energies)``."""
    d, R, n, _ = x_stack.shape
    dt = x_stack.dtype
    RA = A_stack.shape[1]

    def right_envs(x, masks):
        init = _boundary_env(R, RA, dt)

        def step(carry, inp):
            xc, Ac, mr = inp
            xc = xc * mr[None, None, :]
            new = jnp.einsum("aip,Wijw,bjq,pwq->aWb", jnp.conj(xc), Ac, xc,
                             carry, optimize=True)
            return new, new

        _, envs = lax.scan(step, init, (x, A_stack, masks[1:]), reverse=True)
        return jnp.concatenate([envs, init[None]], axis=0)

    Renvs = right_envs(x_stack, mask_stack)

    def fwd(carry, inp):
        L, m_l, _last = carry
        Ai, Aj, Renv, m_r = inp
        lam, V = _local2_eigmin(L, Ai, Aj, Renv, m_l, m_r)
        u, s, vt = jnp.linalg.svd(V.reshape(R * n, n * R),
                                  full_matrices=False)
        keep = _keep_mask(s, tol, R)[:R]
        core = (u[:, :R] * keep[None, :]).reshape(R, n, R)
        last = ((s[:R, None] * vt[:R, :]) * keep[:, None]).reshape(R, n, R)
        L_new = jnp.einsum("aic,aWb,Wijw,bjd->cwd", jnp.conj(core), L, Ai,
                           core, optimize=True)
        return (L_new, keep, last), (core, keep, lam)

    L0 = _boundary_env(R, RA, dt)
    m0 = jnp.zeros((R,), dtype=mask_stack.dtype).at[0].set(1.0)
    inputs = (A_stack[:-1], A_stack[1:], Renvs[2:], mask_stack[2:])
    (L, _, last), (fwd_cores, fwd_masks, lams_f) = lax.scan(
        fwd, (L0, m0, x_stack[d - 1]), inputs)
    x_mid = jnp.concatenate([fwd_cores, last[None]], axis=0)
    masks_mid = jnp.concatenate(
        [mask_stack[0][None], fwd_masks, mask_stack[d][None]], axis=0)

    def left_envs(x, masks):
        init = _boundary_env(R, RA, dt)

        def step(carry, inp):
            xc, Ac, mr = inp
            xc = xc * mr[None, None, :]
            new = jnp.einsum("aic,aWb,Wijw,bjd->cwd", jnp.conj(xc), carry, Ac,
                             xc, optimize=True)
            return new, new

        _, envs = lax.scan(step, init, (x, A_stack, masks[1:]))
        return jnp.concatenate([init[None], envs], axis=0)

    Lenvs = left_envs(x_mid, masks_mid)

    def bwd(carry, inp):
        Renv, m_r, _first = carry
        Ai, Aj, Lenv, m_l = inp
        lam, V = _local2_eigmin(Lenv, Ai, Aj, Renv, m_l, m_r)
        u, s, vt = jnp.linalg.svd(V.reshape(R * n, n * R),
                                  full_matrices=False)
        keep = _keep_mask(s, tol, R)[:R]
        core = (vt[:R, :] * keep[:, None]).reshape(R, n, R)
        first = ((u[:, :R] * s[None, :R]) * keep[None, :]).reshape(R, n, R)
        R_new = jnp.einsum("aip,Wijw,bjq,pwq->aWb", jnp.conj(core), Aj, core,
                           Renv, optimize=True)
        return (R_new, keep, first), (core, keep, lam)

    R0 = _boundary_env(R, RA, dt)
    inputs_b = (A_stack[:-1], A_stack[1:], Lenvs[: d - 1], masks_mid[: d - 1])
    (Renv, _, first), (bwd_cores, bwd_masks, lams_b) = lax.scan(
        bwd, (R0, m0, x_mid[0]), inputs_b, reverse=True)
    x_out = jnp.concatenate([first[None], bwd_cores], axis=0)
    masks_out = jnp.concatenate(
        [mask_stack[0][None], bwd_masks, mask_stack[d][None]], axis=0)
    return x_out, masks_out, jnp.concatenate([lams_f, lams_b[::-1]])


def mals_eigsolve_scan(A: TTOperator, x0: TTVector, tol: float = 1e-12,
                       rmax: int | None = None, n_sweeps: int = 2):
    """Jitted rank-adaptive smallest-eigenpair solver; returns ``(E, x)``
    (the realized ranks come back as data, like the linsolve variant)."""
    if rmax is None:
        rmax = min(int(round(np.sqrt(float(np.prod(x0.dims))))), 64)
    x = orthogonalize(x0, 0)
    dt = jnp.result_type(A.dtype, x.dtype)
    A_stack = pack_op(A.astype(dt), max(A.ranks))
    x_stack = pack_tt(x.astype(dt), rmax)
    real_dt = jnp.zeros((), dt).real.dtype
    d = x.N
    mask_np = np.zeros((d + 1, rmax))
    for i, r in enumerate(x.ranks):
        mask_np[i, :r] = 1.0
    masks = jnp.asarray(mask_np, dtype=real_dt)
    tol_arr = jnp.asarray(tol, real_dt)
    energies = []
    for _ in range(n_sweeps):
        x_stack, masks, lams = mals_eig_sweep(A_stack, x_stack, masks,
                                              tol_arr)
        energies.append(np.asarray(jnp.real(lams)))
    rks = [int(v) for v in np.asarray(jnp.sum(masks, axis=1))]
    return np.concatenate(energies), unpack_tt(x_stack, rks)


def mals_linsolve_scan(A: TTOperator, b: TTVector, x0: TTVector,
                       tol: float = 1e-12, rmax: int | None = None,
                       n_sweeps: int = 1):
    """Drop-in jitted rank-adaptive MALS solve. ``rmax`` is the buffer cap;
    the realized ranks adapt to ``tol`` at runtime and are returned in the
    unpacked TT."""
    if rmax is None:
        rmax = int(round(np.sqrt(float(np.prod(x0.dims)))))
        rmax = min(rmax, 64)
    x = orthogonalize(x0, 0)
    dt = jnp.result_type(A.dtype, b.dtype, x.dtype)
    A_stack = pack_op(A.astype(dt), max(A.ranks))
    b_stack = pack_tt(b.astype(dt), max(b.ranks))
    x_stack = pack_tt(x.astype(dt), rmax)
    real_dt = jnp.zeros((), dt).real.dtype
    d = x.N
    mask_np = np.zeros((d + 1, rmax))
    for i, r in enumerate(x.ranks):
        mask_np[i, :r] = 1.0
    masks = jnp.asarray(mask_np, dtype=real_dt)
    tol_arr = jnp.asarray(tol, real_dt)
    for _ in range(n_sweeps):
        x_stack, masks = mals_sweep(A_stack, b_stack, x_stack, masks, tol_arr)
    # realized ranks come back as data
    rks = [int(v) for v in np.asarray(jnp.sum(masks, axis=1))]
    return unpack_tt(x_stack, rks)
