"""Jitted 1-site TDVP: the whole symmetric sweep as lax.scans.

1-site TDVP preserves ranks, so the padded-rank discipline applies with
*static* masks and the full time step compiles to one XLA program —
`vmap` gives batched evolution of independent states (the config-4 workload).
Local exponentials use dense ``expm`` of the masked effective Hamiltonians
(padded diagonal = 0 ⇒ identity evolution on padding, which zero-padded
states never populate).

Reference semantics: /root/reference/src/solvers/tdvp.jl:45-203.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import jax.scipy.linalg
from jax import lax

from ttnx.core.canonical import orthogonalize
from ttnx.core.tt import TTOperator, TTVector
from ttnx.solvers.als_scan import (
    _boundary_env,
    pack_op,
    pack_tt,
    rank_masks,
    unpack_tt,
)

__all__ = ["tdvp1_step", "tdvp1_scan", "tdvp2_step", "tdvp2_scan"]


def _k1_masked(L, Ac, Renv, m_l, m_r):
    R = L.shape[0]
    n = Ac.shape[1]
    M = R * n * R
    K = jnp.einsum("aWb,WiJw,cwd->aicbJd", L, Ac, Renv,
                   optimize=True).reshape(M, M)
    maskv = (m_l[:, None, None] * m_r[None, None, :]
             * jnp.ones((1, n, 1), dtype=m_l.dtype)).reshape(M)
    return K * maskv[:, None] * maskv[None, :]


def _k0_masked(L, Renv, m):
    R = L.shape[0]
    K = jnp.einsum("aWb,cWd->acbd", L, Renv, optimize=True).reshape(R * R,
                                                                    R * R)
    maskv = (m[:, None] * m[None, :]).reshape(R * R)
    return K * maskv[:, None] * maskv[None, :]


def _expmv(K, t, v):
    return (jax.scipy.linalg.expm(t * K) @ v.reshape(-1)).reshape(v.shape)


def _right_env_stack_A(x, A, mask_r):
    d, R, n, _ = x.shape
    init = _boundary_env(R, A.shape[1], x.dtype)

    def step(carry, inp):
        xc, Ac, mr = inp
        xc = xc * mr[None, None, :]
        new = jnp.einsum("aip,Wijw,bjq,pwq->aWb", jnp.conj(xc), Ac, xc, carry,
                         optimize=True)
        return new, new

    _, envs = lax.scan(step, init, (x, A, mask_r), reverse=True)
    return jnp.concatenate([envs, init[None]], axis=0)


@partial(jax.jit, static_argnames=())
def tdvp1_step(A_stack, x_stack, masks, dt):
    """One symmetric 1-site TDVP sweep (L->R then R->L) for time step ``dt``
    on ``i dpsi/dt = H psi`` (pass ``dt = -1j*h_imag`` for imaginary time).
    All arrays complex; returns the updated stack."""
    d, R, n, _ = x_stack.shape
    dtc = x_stack.dtype
    Renvs = _right_env_stack_A(x_stack, A_stack, masks[1:])
    L0 = _boundary_env(R, A_stack.shape[1], dtc)

    t1 = -1j * dt
    t0 = +1j * dt

    def fwd(carry, inp):
        L, C = carry
        core, Ac, Renv, m_l, m_r = inp
        AC = jnp.einsum("ab,bnc->anc", C, core)
        K1 = _k1_masked(L, Ac, Renv, m_l, m_r)
        AC = _expmv(K1, t1, AC)
        q, r = jnp.linalg.qr(AC.reshape(R * n, R))
        q = q * m_r[None, :]
        r = r * m_r[:, None]
        new_core = q.reshape(R, n, R)
        L_new = jnp.einsum("aic,aWb,Wijw,bjd->cwd", jnp.conj(new_core), L, Ac,
                           new_core, optimize=True)
        K0 = _k0_masked(L_new, Renv, m_r)
        C_new = _expmv(K0, t0, r)
        return (L_new, C_new), new_core

    C0 = jnp.zeros((R, R), dtype=dtc).at[0, 0].set(1.0)
    inputs = (x_stack[:-1], A_stack[:-1], Renvs[1:d], masks[:-2], masks[1:-1])
    (L, C), fwd_cores = lax.scan(fwd, (L0, C0), inputs)

    # full step at the last site
    AC = jnp.einsum("ab,bnc->anc", C, x_stack[d - 1])
    K1 = _k1_masked(L, A_stack[d - 1], Renvs[d], masks[d - 1], masks[d])
    AC = _expmv(K1, t1, AC)

    # backward sweep: sites d-1 .. 1 give right-orthogonal cores; their bond
    # back-evolution feeds the previous site, ending with the center at site 0
    Lenvs = _left_env_stack_from(fwd_cores, A_stack, masks)

    def bwd(carry, inp):
        Renv, AC = carry
        core_left, Ac, Ac_left, Lenv, Lenv_left, m_l, m_ll, m_r = inp
        qt, rt = jnp.linalg.qr(AC.reshape(R, n * R).T)
        new_core = qt.T.reshape(R, n, R) * m_l[:, None, None]
        t = rt.T * m_l[None, :]
        R_new = jnp.einsum("aip,Wijw,bjq,pwq->aWb", jnp.conj(new_core), Ac,
                           new_core, Renv, optimize=True)
        K0 = _k0_masked(Lenv, R_new, m_l)
        C = _expmv(K0, t0, t)
        AC_prev = jnp.einsum("anb,bc->anc", core_left, C)
        K1p = _k1_masked(Lenv_left, Ac_left, R_new, m_ll, m_l)
        AC_prev = _expmv(K1p, t1, AC_prev)
        return (R_new, AC_prev), new_core

    Rb0 = _boundary_env(R, A_stack.shape[1], dtc)
    inputs_b = (fwd_cores, A_stack[1:], A_stack[:-1], Lenvs[1:d],
                Lenvs[0:d - 1], masks[1:-1], masks[:-2], masks[2:])
    (Renv, AC0), bwd_cores = lax.scan(bwd, (Rb0, AC), inputs_b, reverse=True)
    return jnp.concatenate([AC0[None], bwd_cores], axis=0)


def _left_env_stack_from(cores_left, A, masks):
    """Left envs from the forward-written left-orthogonal cores 0..d-2;
    Lenvs[i] covers sites 0..i-1 (length d)."""
    d_minus_1, R, n, _ = cores_left.shape
    init = _boundary_env(R, A.shape[1], cores_left.dtype)

    def step(carry, inp):
        xc, Ac = inp
        new = jnp.einsum("aic,aWb,Wijw,bjd->cwd", jnp.conj(xc), carry, Ac, xc,
                         optimize=True)
        return new, new

    _, envs = lax.scan(step, init, (cores_left, A[:-1]))
    return jnp.concatenate([init[None], envs], axis=0)


def _k2_masked(L, Ai, Aj, Renv, m_l, m_r):
    R = L.shape[0]
    n = Ai.shape[1]
    M = R * n * n * R
    K = jnp.einsum("aWb,WiIw,wjJv,cvd->aijcbIJd", L, Ai, Aj, Renv,
                   optimize=True).reshape(M, M)
    maskv = (m_l[:, None, None, None] * m_r[None, None, None, :]
             * jnp.ones((1, n, n, 1), dtype=m_l.dtype)).reshape(M)
    return K * maskv[:, None] * maskv[None, :]


def _keep_mask_tdvp(s, truncerr, max_keep, R):
    """Absolute-threshold keep mask capped at ``max_keep`` (the reference
    tdvp2 uses _svdtrunc's absolute rule, tdvp.jl:250-253). Numerically-zero
    padded singular values are always dropped so reported ranks stay honest."""
    idx = jnp.arange(R)
    floor = jnp.maximum(truncerr, s[0] * 1e-15)
    keep = (s[:R] >= floor) & (idx < max_keep)
    keep = keep.at[0].set(True)
    return keep.astype(s.dtype)


@partial(jax.jit, static_argnames=())
def tdvp2_step(A_stack, x_stack, mask_stack, dt, truncerr, max_keep):
    """One 2-site TDVP sweep (L->R then R->L) with half time steps and
    dynamic rank masks (jitted analog of the eager tdvp2sweep)."""
    d, R, n, _ = x_stack.shape
    dtc = x_stack.dtype
    Renvs = _right_env_stack_A(x_stack, A_stack, mask_stack[1:])
    t2 = -1j * dt / 2
    t1 = +1j * dt / 2
    L0 = _boundary_env(R, A_stack.shape[1], dtc)

    def fwd(carry, inp):
        L, AC, m_l = carry
        core_next, Ai, Aj, Renv, m_r, is_last = inp
        AAC = jnp.einsum("asg,gtb->astb", AC, core_next)
        K2 = _k2_masked(L, Ai, Aj, Renv, m_l, m_r)
        AAC = _expmv(K2, t2, AAC)
        u, s, vt = jnp.linalg.svd(AAC.reshape(R * n, n * R),
                                  full_matrices=False)
        keep = _keep_mask_tdvp(jnp.abs(s[:R]), truncerr, max_keep, R)
        core = (u[:, :R] * keep[None, :]).reshape(R, n, R)
        AC_new = ((s[:R, None] * vt[:R, :]) * keep[:, None]).reshape(R, n, R)
        L_new = jnp.einsum("aic,aWb,Wijw,bjd->cwd", jnp.conj(core), L, Ai,
                           core, optimize=True)
        K1 = _k1_masked(L_new, Aj, Renv, keep, m_r)
        # skip the 1-site back-evolution on the last forward bond (expm(0)=I)
        AC_new = _expmv(K1, t1 * (1.0 - is_last), AC_new)
        return (L_new, AC_new, keep), (core, keep)

    m0 = mask_stack[0]
    inputs = (x_stack[1:], A_stack[:-1], A_stack[1:], Renvs[2:],
              mask_stack[2:],
              jnp.arange(d - 1) == d - 2)
    (L, AC, m_last), (fwd_cores, fwd_masks) = lax.scan(
        fwd, (L0, x_stack[0], m0), inputs)
    x_mid = jnp.concatenate([fwd_cores, AC[None]], axis=0)
    masks_mid = jnp.concatenate(
        [mask_stack[0][None], fwd_masks, mask_stack[d][None]], axis=0)

    Lenvs = _left_env_stack_from(x_mid[:-1], A_stack, masks_mid)
    R0 = _boundary_env(R, A_stack.shape[1], dtc)

    def bwd(carry, inp):
        Renv, AC, m_r = carry
        core_prev, Ai, Aj, Lenv, m_l, is_first = inp
        AAC = jnp.einsum("asg,gtb->astb", core_prev, AC)
        K2 = _k2_masked(Lenv, Ai, Aj, Renv, m_l, m_r)
        AAC = _expmv(K2, t2, AAC)
        u, s, vt = jnp.linalg.svd(AAC.reshape(R * n, n * R),
                                  full_matrices=False)
        keep = _keep_mask_tdvp(jnp.abs(s[:R]), truncerr, max_keep, R)
        core = (vt[:R, :] * keep[:, None]).reshape(R, n, R)
        AC_new = ((u[:, :R] * s[None, :R]) * keep[None, :]).reshape(R, n, R)
        R_new = jnp.einsum("aip,Wijw,bjq,pwq->aWb", jnp.conj(core), Aj, core,
                           Renv, optimize=True)
        K1 = _k1_masked(Lenv, Ai, R_new, m_l, keep)
        AC_new = _expmv(K1, t1 * (1.0 - is_first), AC_new)
        return (R_new, AC_new, keep), (core, keep)

    inputs_b = (x_mid[:-1], A_stack[:-1], A_stack[1:], Lenvs[: d - 1],
                masks_mid[: d - 1], jnp.arange(d - 1) == 0)
    (Renv, AC0, m_first), (bwd_cores, bwd_masks) = lax.scan(
        bwd, (R0, x_mid[d - 1], mask_stack[d]), inputs_b, reverse=True)
    x_out = jnp.concatenate([AC0[None], bwd_cores], axis=0)
    masks_out = jnp.concatenate(
        [mask_stack[0][None], bwd_masks, mask_stack[d][None]], axis=0)
    return x_out, masks_out


def tdvp2_scan(H: TTOperator, u0: TTVector, steps, imaginary_time=False,
               normalize=True, rmax: int | None = None, truncerr: float = 0.0,
               max_bond: int | None = None):
    """Jitted 2-site TDVP driver with dynamic rank masks."""
    from ttnx.core.algebra import norm, scale

    x = orthogonalize(u0, 0)
    if rmax is None:
        rmax = max(2 * max(x.ranks), 4)
    if max_bond is None:
        max_bond = rmax
    dtc = jnp.complex128
    A_stack = pack_op(H.astype(dtc), max(H.ranks))
    x_stack = pack_tt(x.astype(dtc), rmax)
    d = x.N
    mask_np = np.zeros((d + 1, rmax))
    for i, r in enumerate(x.ranks):
        mask_np[i, :r] = 1.0
    masks = jnp.asarray(mask_np, dtype=jnp.float64)
    te = jnp.asarray(truncerr, jnp.float64)
    mk = jnp.asarray(min(max_bond, rmax), jnp.int32)
    for h in np.atleast_1d(steps):
        dt = (1j * h) if imaginary_time else jnp.asarray(h, dtc)
        x_stack, masks = tdvp2_step(A_stack, x_stack, masks,
                                    jnp.asarray(dt, dtc), te, mk)
        if normalize:
            rks = [int(v) for v in np.asarray(jnp.sum(jnp.real(masks),
                                                      axis=1))]
            out = unpack_tt(x_stack, rks)
            out = scale(1.0 / float(norm(out)), out)
            x_stack = pack_tt(out, rmax)
    rks = [int(v) for v in np.asarray(jnp.sum(jnp.real(masks), axis=1))]
    return unpack_tt(x_stack, rks)


def tdvp1_scan(H: TTOperator, u0: TTVector, steps, imaginary_time=False,
               normalize=True, rmax: int | None = None):
    """Driver: jitted 1-site TDVP over ``steps`` (eager normalization between
    steps, mirroring the reference driver tdvp.jl:154-203)."""
    from ttnx.core.algebra import norm, scale

    x = orthogonalize(u0, 0)
    rks = x.ranks
    if rmax is None:
        rmax = max(max(rks), 2)
    dtc = jnp.complex128
    A_stack = pack_op(H.astype(dtc), max(H.ranks))
    masks = rank_masks(rks, rmax, dtype=jnp.float64)
    x_stack = pack_tt(x.astype(dtc), rmax)
    for h in np.atleast_1d(steps):
        # imaginary time: dt_eff = +i*h makes the site evolution exp(+h*K),
        # matching the reference driver (tdvp.jl:179)
        dt = (1j * h) if imaginary_time else jnp.asarray(h, dtc)
        x_stack = tdvp1_step(A_stack, x_stack, masks, jnp.asarray(dt, dtc))
        if normalize:
            out = unpack_tt(x_stack, rks)
            out = scale(1.0 / float(norm(out)), out)
            x_stack = pack_tt(out, rmax)
    return unpack_tt(x_stack, rks)
