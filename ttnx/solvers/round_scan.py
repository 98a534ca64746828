"""Jitted padded-rank MPO application + TT rounding — the fused
"contraction + rounding" pipeline of the north star, plus a fully-jitted
Crank–Nicolson heat step built from it.

All shapes static: the MPO application blows the padded rank up to
``RA * R`` in one batched einsum, and the rounding scan truncates back to a
fixed target ``R_out``. Together with :func:`ttnx.solvers.als_scan.als_sweeps`
this makes one time step of the d=12 heat equation (BASELINE config 2) a
single compiled XLA program.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ttnx.core.tt import r_and_d_to_rks
from ttnx.solvers.als_scan import als_sweeps, rank_masks

__all__ = ["matvec_padded", "tt_round_scan", "tt_round_gram", "cn_step",
           "make_cn_step", "make_cn_evolve"]


def matvec_padded(A_stack, x_stack):
    """Padded MPO·MPS: ``y[d, RA*R, n, RA*R]`` from ``A[d, RA, n, n, RA]`` and
    ``x[d, R, n, R]`` — one batched einsum over the site axis (the reference's
    hot kernel, /root/reference/src/tt_operations.jl:101-111)."""
    d, RA, n, _, _ = A_stack.shape
    R = x_stack.shape[1]
    y = jnp.einsum("kaijb,kcjd->kacibd", A_stack, x_stack, optimize=True)
    return y.reshape(d, RA * R, n, RA * R)


def _right_orth_scan(y, masks_r, method: str = "qr"):
    """Right-orthogonalize the padded chain (masked LQ sweep); returns new
    stack with site 0 holding the center.

    ``method='qr'`` uses Householder QR of the transposed site matrix;
    ``method='gram'`` factors the site as ``cm = G^{1/2} (G^{-1/2} cm)``
    with ``G = cm cm^H`` via a single eigh — matmul-dominated (MXU work
    instead of LAPACK panels) and the remote-TPU path: the QR/SVD
    composition SIGABRTs that toolchain's compiler
    (scripts/probe_round_bisect*.py), while matmul/eigh programs compile.
    The pseudo-inverted square root handles rank-deficient sites exactly
    (deficient directions carry no mass, their rows come out zero), which
    both the padded-zero invariant and the low-true-rank boundary bonds
    of an MPO-apply chain require. Precision: directions below
    ``sqrt(eps)*sigma_max`` lose relative accuracy (squared condition
    number) — fine for the f32 device path; the f64 parity path keeps
    ``method='qr'``."""
    d, R, n, _ = y.shape

    def gram_lq(cm):
        """cm (R, nR) = T @ q; q has orthonormal rows on the row space of
        cm and zero rows in its null space; T = (cm cm^H)^{1/2} (PSD)."""
        G = cm @ cm.conj().T
        w, V = jnp.linalg.eigh(G)                      # ascending
        s = jnp.sqrt(jnp.maximum(w.real, 0.0))
        cutoff = jnp.finfo(s.dtype).eps * R * jnp.max(s)
        keep = s > cutoff
        s_inv = jnp.where(keep, 1.0 / jnp.where(keep, s, 1.0), 0.0)
        s_kept = jnp.where(keep, s, 0.0)
        proj = V.conj().T @ cm                         # (R, nR)
        q = (V * s_inv[None, :].astype(V.dtype)) @ proj
        T = (V * s_kept[None, :].astype(V.dtype)) @ V.conj().T
        return q, T

    def step(carry, inp):
        T, = carry
        core, m_l = inp
        c = jnp.einsum("anb,bc->anc", core, T)
        if method == "gram":
            q2, t2 = gram_lq(c.reshape(R, n * R))
            q = q2.reshape(R, n, R) * m_l[:, None, None]
            t = t2 * m_l[None, :]
        else:
            qt, rt = jnp.linalg.qr(c.reshape(R, n * R).T)
            q = qt.T.reshape(R, n, R) * m_l[:, None, None]
            t = rt.T * m_l[None, :]
        return (t,), q

    T0 = jnp.zeros((R, R), dtype=y.dtype).at[0, 0].set(1.0)
    # process sites d-1 .. 1; site 0 absorbs the final transfer
    (T,), cores = lax.scan(step, (T0,), (y[1:], masks_r[:-1][1:d]),
                           reverse=True)
    first = jnp.einsum("anb,bc->anc", y[0], T)
    return jnp.concatenate([first[None], cores], axis=0)


def tt_round_scan(y, masks_y, R_out: int, masks_out, method: str = "svd"):
    """Truncate a padded chain to buffer rank ``R_out``: right-orthogonalize,
    then a left-to-right masked truncation scan keeping the top ``R_out``
    singular directions per bond (jitted analog of
    :func:`ttnx.core.canonical.tt_round`).

    ``masks_y [d+1, R]`` bounds the input ranks; ``masks_out [d+1, R_out]``
    the (feasibility-clamped) output ranks. ``method='svd'`` (default,
    full-precision) truncates via the site SVD; ``method='gram'`` is the
    matmul-dominated TPU form — CholeskyQR2 orthogonalization plus an eigh
    of the tiny ``(R_out*n, R_out*n)`` Gram matrix per site (top-k
    eigenvectors = left singular vectors). The Gram form halves the
    attainable precision for directions below ``sqrt(eps)*sigma_max``
    (squared condition number) but keeps every dominant direction exact —
    the right trade for f32 device programs, and the only composition the
    remote TPU compiler accepts (see _right_orth_scan)."""
    d, R, n, _ = y.shape
    y = _right_orth_scan(y, masks_y, method=method)
    k = min(R_out, R)

    def step(carry, inp):
        T, = carry  # (R_out, R) transfer into this site
        core, m_r_out = inp
        c = jnp.einsum("ab,bnc->anc", T, core)        # (R_out, n, R)
        cm = c.reshape(R_out * n, R)
        if method == "gram":
            G = cm @ cm.conj().T                      # (R_out*n, R_out*n)
            w, V = jnp.linalg.eigh(G)                 # ascending
            u_k = V[:, ::-1][:, :k]
            t_k = u_k.conj().T @ cm                   # rows scale like s*vt
        elif R_out * n < R:
            # A WIDE svd inside lax.scan SIGABRTs the remote TPU compiler
            # (xla::TransposeFolding, measured 2026-08-20,
            # scripts/probe_svd_variants.py); the tall transpose compiles
            # and is mathematically identical: cm = vt2.T @ diag(s) @ ut.T.
            ut, s, vt2 = jnp.linalg.svd(cm.T, full_matrices=False)
            u_k = vt2.T[:, :k]
            t_k = s[:k, None] * ut.T[:k, :]
        else:
            u, s, vt = jnp.linalg.svd(cm, full_matrices=False)
            u_k = u[:, :k]
            t_k = s[:k, None] * vt[:k, :]
        u_k = u_k * m_r_out[None, :k]
        pad = jnp.zeros((R_out * n, R_out - k), dtype=cm.dtype)
        new_core = jnp.concatenate([u_k, pad], axis=1).reshape(
            R_out, n, R_out)
        t_k = t_k * m_r_out[:k, None]
        T_new = jnp.concatenate(
            [t_k, jnp.zeros((R_out - k, R), dtype=cm.dtype)], axis=0)
        return (T_new,), new_core

    T0 = jnp.zeros((R_out, R), dtype=y.dtype).at[0, 0].set(1.0)
    (T,), cores = lax.scan(step, (T0,), (y[:-1], masks_out[1:d]))
    # last site absorbs the remaining transfer; pad its right rank to R_out
    last = jnp.einsum("ab,bnc->anc", T, y[d - 1])      # (R_out, n, R)
    last = last[:, :, :1]                              # boundary rank is 1
    last = jnp.pad(last, ((0, 0), (0, 0), (0, R_out - 1)))
    return jnp.concatenate([cores, last[None]], axis=0)


def _gram_chain_xla(y):
    """XLA fallback for :func:`ttnx.kernels.gram.gram_chain_fused`: backward
    ``lax.scan`` of the pure-matmul right-Gram recurrence. Works for every
    dtype (the Pallas kernel is real-f32 only)."""
    d, R, n, _ = y.shape
    G0 = jnp.zeros((R, R), y.dtype).at[0, 0].set(1.0)

    def step(G, yk):
        Gn = jnp.einsum("aib,bc,xic->ax", yk, G, jnp.conj(yk), optimize=True)
        return Gn, G  # emit the PRE-update Gram (the bond right of this site)

    G1, Gs_tail = lax.scan(step, G0, y[1:], reverse=True)
    return jnp.concatenate([G1[None], Gs_tail], axis=0)  # Gs[k] = G_{k+1}


@jax.custom_batching.custom_vmap
def _gram_chain_fused_batchable(y):
    """The fused Pallas Gram chain with a custom vmap rule: `jax.vmap` of a
    Mosaic kernel adds a grid dimension the remote-TPU toolchain rejects
    (measured 2026-08-21: HTTP 500 from the compile helper), so batched
    callers — `vmap`-ed CN steps — transparently take the XLA scan instead
    while the single-problem flagship path keeps the kernel."""
    from ttnx.kernels.dispatch import pallas_interpret
    from ttnx.kernels.gram import gram_chain_fused

    return gram_chain_fused(y, interpret=pallas_interpret())


@_gram_chain_fused_batchable.def_vmap
def _gram_chain_fused_vmap_rule(axis_size, in_batched, y):
    del axis_size, in_batched
    return jax.vmap(_gram_chain_xla)(y), True


def tt_round_gram(y, R_out: int, masks_out):
    """Gram-chain rounding — the fused production path (VERDICT r2 item 2).

    Orthogonalization-free truncation: a backward pure-matmul sweep computes
    the right Gram matrices ``G_k`` of the (unorthogonalized) chain — fused
    into ONE Pallas kernel on TPU (:func:`ttnx.kernels.gram.gram_chain_fused`)
    — then a single left-to-right sweep truncates each bond with one small
    eigh: at site k, ``B = c G_{k+1} c^H`` is the exact Gram of the remaining
    matricization (the left basis carried in ``T`` is orthonormal), so the
    top ``R_out`` eigenvectors of ``B`` ARE the optimal left singular
    vectors. Equivalent to orthogonalize-then-truncate in exact arithmetic;
    numerically it squares the condition number for directions below
    ``sqrt(eps)*sigma_max`` — the same trade the existing ``method='gram'``
    path makes, accepted for the f32 device pipeline (f64 parity uses
    ``tt_round_scan(method='svd')``). Versus ``tt_round_scan('gram')`` this
    halves the eigh count (d instead of 2d) and replaces the whole
    right-orthogonalization scan with one kernel dispatch.

    Reference semantics: /root/reference/src/tt_tools.jl:743-789.
    """
    from ttnx.kernels.gram import can_fuse_gram_chain

    d, R, n, _ = y.shape
    if R_out > R:
        raise ValueError(f"R_out={R_out} must be <= padded rank {R}")
    if can_fuse_gram_chain(y.dtype, d, R, n):
        Gs = _gram_chain_fused_batchable(y)
    else:
        Gs = _gram_chain_xla(y)

    def step(T, inp):
        yk, G, m_r_out = inp
        c = jnp.einsum("ab,bnc->anc", T, yk)          # (R_out, n, R)
        cm = c.reshape(R_out * n, R)
        B = jnp.einsum("ab,bc,xc->ax", cm, G, jnp.conj(cm), optimize=True)
        B = 0.5 * (B + B.conj().T)
        w, V = jnp.linalg.eigh(B)                     # ascending
        u_k = V[:, ::-1][:, :R_out] * m_r_out[None, :]
        T_new = (u_k.conj().T @ cm) * m_r_out[:, None]
        return T_new, u_k.reshape(R_out, n, R_out)

    T0 = jnp.zeros((R_out, R), dtype=y.dtype).at[0, 0].set(1.0)
    T, cores = lax.scan(step, T0, (y[:-1], Gs[: d - 1], masks_out[1:d]))
    last = jnp.einsum("ab,bnc->anc", T, y[d - 1])     # (R_out, n, R)
    last = last[:, :, :1]                             # boundary rank is 1
    last = jnp.pad(last, ((0, 0), (0, 0), (0, R_out - 1)))
    return jnp.concatenate([cores, last[None]], axis=0)


def round_masks(in_rks, R_out: int, dims):
    """Output rank vector for rounding to cap ``R_out`` (host-side)."""
    rks = [min(r, R_out) for r in in_rks]
    return r_and_d_to_rks(rks, dims, rmax=R_out)


@partial(jax.jit, static_argnames=("sweep_count", "solver", "orth",
                                   "round_rhs", "round_method", "precision",
                                   "cg_iters"))
def cn_step(lhs_stack, rhs_stack, u_stack, guess_noise, masks_u,
            masks_rhs_big, masks_u_out, sweep_count: int = 4,
            solver: str = "lu", orth: str = "qr", round_rhs: bool = True,
            round_method: str = "svd", precision: str | None = None,
            cg_iters: int = 48):
    """One Crank–Nicolson step as a single compiled program:
    ``u <- ALS-solve(lhs, round(rhs_op @ u))`` (reference stepper:
    /root/reference/src/solvers/euler.jl:145-191).

    ``guess_noise`` (masked, ~1e-3 of the state scale) is added to the ALS
    *guess only*: a rank-deficient state makes the ALS environments singular
    and locks the rank; the converged ALS solution is guess-independent, so
    the noise never reaches the output while the RHS stays exact.

    ``precision`` ('highest'|'float32'|None) pins the matmul precision for
    every contraction in the step. TPU f32 dots default to single-pass bf16
    inputs (~4e-3 relative per contraction — measured on the v5e probe);
    'highest' selects the multi-pass f32 form, which costs ~3x MXU cycles on
    these latency-bound shapes but restores f32-class accuracy.
    """
    from contextlib import nullcontext

    ctx = (jax.default_matmul_precision(precision) if precision
           else nullcontext())
    with ctx:
        R_out = u_stack.shape[1]
        big = matvec_padded(rhs_stack, u_stack)
        if not round_rhs:
            # keep the rhs at the applied (Kronecker) rank: larger b
            # environments but zero dense-linalg primitives in the whole
            # program when combined with solver='cg' and orth='polar' (pure
            # matmuls -> always compiles on TPU toolchains that reject
            # LU/QR/SVD inside scans)
            b = big
        elif round_method == "gram_chain":
            b = tt_round_gram(big, R_out, masks_u_out)
        else:
            b = tt_round_scan(big, masks_rhs_big, R_out, masks_u_out,
                              method=round_method)
        guess = u_stack + guess_noise
        return als_sweeps(lhs_stack, b, guess, masks_u, sweep_count,
                          solver=solver, orth=orth, cg_iters=cg_iters)


def make_cn_step(A, h: float, rmax: int, dims, u_rks, dtype=jnp.float64,
                 sweep_count: int = 4, solver: str = "lu", orth: str = "qr",
                 round_rhs: bool = True, round_method: str = "svd",
                 precision: str | None = None, cg_iters: int = 48):
    """Host-side setup for :func:`cn_step` on ``du/dt = A u``: packs
    ``I -/+ h/2 A`` and builds all masks. Returns ``(step_fn, pack, unpack)``.
    """
    from ttnx.core.algebra import add_op, scale_op
    from ttnx.core.tt import id_tto
    from ttnx.solvers.als_scan import pack_op, pack_tt, unpack_tt

    if round_method not in ("svd", "gram", "gram_chain"):
        raise ValueError("round_method must be 'svd', 'gram' or "
                         f"'gram_chain', got {round_method!r}")
    if solver not in ("lu", "cg", "bicgstab", "cg_fused", "bicgstab_fused"):
        raise ValueError(
            "solver must be 'lu', 'cg', 'bicgstab', 'cg_fused' or "
            f"'bicgstab_fused', got {solver!r}")
    if orth not in ("qr", "polar"):
        raise ValueError(f"orth must be 'qr' or 'polar', got {orth!r}")
    d = len(dims)
    # cast FIRST: the construction ops run eagerly on the active device and
    # the TPU has no f64 (a late astype would dispatch f64 ops)
    A = A.astype(dtype)
    eye = id_tto(d, dtype=dtype)
    lhs = add_op(eye, scale_op(-h / 2, A))
    rhs = add_op(eye, scale_op(h / 2, A))
    RA = max(rhs.ranks)
    lhs_stack = pack_op(lhs, max(lhs.ranks))
    rhs_stack = pack_op(rhs, RA)

    u_rks = r_and_d_to_rks(u_rks, dims, rmax=rmax)
    real_dt = jnp.zeros((), dtype).real.dtype
    masks_u = rank_masks(u_rks, rmax, dtype=real_dt)
    # the applied chain's active positions are the Kronecker pattern
    # {a*R + c : a < rA, c < rx} — a SCATTERED set, not a prefix, so its
    # masks are outer products of the factor masks
    masks_A = np.zeros((d + 1, RA))
    for i, r in enumerate(rhs.ranks):
        masks_A[i, :r] = 1.0
    masks_u_np = np.asarray(masks_u)
    masks_big = jnp.asarray(np.stack(
        [np.outer(masks_A[i], masks_u_np[i]).reshape(-1)
         for i in range(d + 1)]), dtype=real_dt)
    big_rks = [min(a * b, RA * rmax) for a, b in zip(rhs.ranks, u_rks)]
    out_rks = round_masks(big_rks, rmax, dims)
    masks_out = rank_masks(out_rks, rmax, dtype=real_dt)

    # masked guess-noise stack (zero outside the u_rks rank profile)
    rng = np.random.default_rng(0)
    noise_np = np.zeros((d, rmax, 2, rmax))
    for i in range(d):
        noise_np[i, : u_rks[i], :, : u_rks[i + 1]] = 1e-3 * rng.standard_normal(
            (u_rks[i], 2, u_rks[i + 1]))
    guess_noise = jnp.asarray(noise_np, dtype=dtype)

    def step_fn(u_stack):
        return cn_step(lhs_stack, rhs_stack, u_stack, guess_noise, masks_u,
                       masks_big, masks_out, sweep_count, solver, orth,
                       round_rhs, round_method, precision, cg_iters)

    def pack(u):
        from ttnx.core.canonical import tt_round

        if max(u.ranks) > rmax:  # avoid eager SVD sweeps when already feasible
            u = tt_round(u, max_bond=rmax)
        return pack_tt(u.astype(dtype), rmax)

    unpack = lambda s: unpack_tt(s, u_rks)
    return step_fn, pack, unpack


def make_cn_evolve(A, h: float, rmax: int, dims, u_rks, n_steps: int,
                   **kwargs):
    """Whole-trajectory Crank–Nicolson as ONE compiled program:
    ``lax.fori_loop`` over :func:`cn_step`, so ``n_steps`` of time evolution
    cost a single dispatch. On the remote-TPU ('axon') tunnel every dispatch
    is a ~25 ms RPC round trip — per-step timing of a single-step program is
    dominated by that floor, while the fused trajectory amortizes it to
    nothing (this is also just the right way to run long evolutions on any
    TPU: no host round trips, XLA pipelines the whole loop).

    Returns ``(evolve_fn, pack, unpack)`` with ``evolve_fn(u_stack) ->
    u_stack after n_steps``.

    CAUTION (remote-TPU 'axon' toolchain, measured 2026-08-20): small
    ``n_steps`` compile fine (4 trips -> 4.6 s warm) but ran 15x slower
    per step than chaining async single-step dispatches, and a 32-trip
    program wedged the remote compile service for over an hour. On that
    platform prefer ``make_cn_step`` + an async dispatch chain with one
    final sync; use this fused form on direct-attached TPUs."""
    step_fn, pack, unpack = make_cn_step(A, h, rmax, dims, u_rks, **kwargs)

    @jax.jit
    def evolve_fn(u_stack):
        return lax.fori_loop(0, n_steps, lambda i, u: step_fn(u), u_stack)

    return evolve_fn, pack, unpack
