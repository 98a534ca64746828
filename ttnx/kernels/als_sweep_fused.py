"""Whole-half-sweep fused ALS: env updates + matrix-free CG + matmul-only
orthogonalization per site, one Mosaic kernel per half-sweep.

Round-4 measured the batched rank-64 ALS residual precisely (STATUS r4,
seven probes): after fusing the CG local solves (:mod:`local_cg_mf`) and
the env chains (:mod:`env_chain`), ~50% of the wall clock at B=256 was
still the ~500 mid-size XLA dispatches of the in-sweep env updates, the
batched QR orthogonalizations and the `lax.scan` output-stacking copies —
and every HLO-level restructure measured equal or worse. The fix (VERDICT
r4 #1) is to fuse the ENTIRE half-sweep: this module runs, per problem
block and per half-sweep, all ``d-1`` site iterations — local rhs build,
the whole fixed-iteration matrix-free CG, orthogonalization, and the
carried env updates — inside ONE Pallas kernel (grid over the problem
batch, ``block_b`` problems per grid step with batched dots: the
single-problem form compiled but ran latency-bound at ~300 GF/s, measured
2026-08-21 — small serialized (R, R) dots; the batched-block form is the
same fix local_cg_mf uses). A full forward+backward ALS pass over a batch
of 256 rank-64 problems becomes 3 kernel dispatches (right-env chain,
forward, backward) instead of ~500.

QR cannot run on the MXU, so orthogonalization is replaced by the
**Newton–Schulz polar form**: ``Q = V G^{-1/2}``, ``T = G^{1/2}`` with
``G = V^T V + diag(1 - m)`` (the padded directions get an identity block,
so ``G`` is SPD and padded columns stay exactly zero). The coupled NS
iteration ``Y_{k+1} = Y_k (3I - Z_k Y_k)/2``, ``Z_{k+1} = (3I - Z_k Y_k)
Z_k / 2`` converges to ``(G/|G|_F)^{±1/2}`` — pure (R, R) matmuls; the
factorization error ``V - Q T`` is bounded by the pairing residual
``|I - Z_k Y_k|``, whose pre-quadratic phase lifts the smallest
eigenvalue by ~1.5x/iteration — hence the generous default iteration
counts (they cost 3 small dots each vs the CG loop's 16 per iteration).
Two passes (CholeskyQR2-style) keep f32 orthogonality for moderately
conditioned ``V``; any factorization ``V = Q T`` with well-conditioned
``Q`` is gauge-equivalent to the QR the XLA path uses (parity tests
compare represented vectors). Reference hot loop replaced:
/root/reference/src/solvers/als.jl:47-70,104-136.

Mosaic playbook as in :mod:`local_cg_mf` / :mod:`env_chain`: static
unrolled site loops, `fori_loop` for CG/NS inner iterations, no
transposes (every dot contracts chosen axes of both operands), keepdims
scalar reductions, constants (identity, boundaries, mask tensors) passed
as inputs, SMEM scalar table for the MPO cores, i*0-typed index maps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["als_fwd_bwd_fused_batched", "can_fuse_half_sweep"]


def can_fuse_half_sweep(dtype, d: int, R: int, RA: int, n: int,
                        block_b: int = 4) -> bool:
    """VMEM gate (per problem block): b stack + env stacks + working set;
    real f32 only, R >= 32 (below that the XLA path is fine and the
    (R, R) dots waste the MXU)."""
    if jnp.issubdtype(jnp.dtype(dtype), jnp.complexfloating):
        return False
    if jnp.dtype(dtype) != jnp.float32:
        return False
    itemsize = 4
    per_problem = itemsize * (
        2 * d * n * R * R            # b stack + x outputs
        + 2 * (d + 1) * RA * R * R   # Renv/Lenv stacks
        + 2 * (d + 1) * R * R        # b-env stacks
        + 10 * n * R * R             # CG iterates + scratch
    )
    shared = itemsize * 3 * (d + 1) * R * R
    return R >= 32 and block_b * per_problem + shared <= 12 * 1024 * 1024


def _bdot(a, b, dims):
    """Batched dot over the leading block axis of both operands."""
    return jax.lax.dot_general(a, b, (dims, ((0,), (0,))),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _fsum(x):
    """Per-problem (bt, 1, 1) keepdims scalar (Mosaic rejects the
    flattening reshape a plain sum would need)."""
    s = jnp.sum(x, axis=2, keepdims=True)
    return jnp.sum(s, axis=1, keepdims=True)


def _ns_polar(G, eye, iters: int):
    """Coupled Newton–Schulz: (G^{1/2}, G^{-1/2}) for a batch of SPD ``G``
    (bt, R, R), regularized on padded directions by the caller. ``eye``
    is the shared (R, R) identity."""
    fr = jnp.sqrt(_fsum(G * G))
    sq = jnp.sqrt(fr)
    Y = G * (1.0 / fr)
    Z = jnp.zeros_like(G) + eye[None]

    def body(_, state):
        Y, Z = state
        T = 1.5 * eye[None] - 0.5 * _bdot(Z, Y, ((2,), (1,)))
        return (_bdot(Y, T, ((2,), (1,))), _bdot(T, Z, ((2,), (1,))))

    Y, Z = jax.lax.fori_loop(0, iters, body, (Y, Z))
    return Y * sq, Z * (1.0 / sq)


def _cg_site(L, Rcarry, Ak_row, rhs, m2, n: int, RA: int, iters: int):
    """Matrix-free CG on one site's masked local systems for a block of
    problems. ``L``/``Rcarry`` are length-RA lists of (bt, R, R) env
    slices [bra, ket]; ``Ak_row(Wi, Jw)`` an SMEM scalar; ``rhs`` a
    length-n list of masked (bt, R, R) slices; ``m2`` the shared (R, R)
    bond mask."""

    def apply_k(p):
        pm = [p[J] * m2[None] for J in range(n)]
        s = [[_bdot(pm[J], Rcarry[w], ((2,), (2,))) for w in range(RA)]
             for J in range(n)]
        out = []
        for i in range(n):
            acc = None
            for W in range(RA):
                m = None
                for J in range(n):
                    for w in range(RA):
                        term = Ak_row(W * n + i, J * RA + w) * s[J][w]
                        m = term if m is None else m + term
                t = _bdot(L[W], m, ((2,), (1,)))
                acc = t if acc is None else acc + t
            out.append(acc * m2[None] + (1.0 - m2[None]) * p[i])
        return tuple(out)

    def pdot(a, b):
        acc = None
        for i in range(n):
            s = _fsum(a[i] * b[i])
            acc = s if acc is None else acc + s
        return acc

    x = tuple(jnp.zeros_like(r) for r in rhs)
    r = tuple(rhs)
    p = r
    rs = pdot(r, r)

    def body(_, state):
        x, r, p, rs = state
        ap = apply_k(p)
        denom = pdot(p, ap)
        ok = jnp.abs(denom) > 0.0
        alpha = jnp.where(ok, rs / jnp.where(ok, denom, 1.0), 0.0)
        x = tuple(x[i] + alpha * p[i] for i in range(n))
        r = tuple(r[i] - alpha * ap[i] for i in range(n))
        rs_new = pdot(r, r)
        okb = jnp.abs(rs) > 0.0
        beta = jnp.where(okb, rs_new / jnp.where(okb, rs, 1.0), 0.0)
        p = tuple(r[i] + beta * p[i] for i in range(n))
        return (x, r, p, rs_new)

    x, _, _, _ = jax.lax.fori_loop(0, iters, body, (x, r, p, rs))
    return x


def _orth_cols(V, dpad, m2, eye, n: int, it1: int, it2: int):
    """Two-pass NS polar orthogonalization of the COLUMNS of the merged
    (R*n, R) site matrices (forward-sweep gauge): returns (Q list, T)
    with ``V[i] = Q[i] @ T`` per problem."""
    G = None
    for i in range(n):
        g = _bdot(V[i], V[i], ((1,), (1,)))
        G = g if G is None else G + g
    Gh1, Gi1 = _ns_polar(G + dpad[None], eye, it1)
    Q1 = [_bdot(V[i], Gi1, ((2,), (1,))) * m2[None] for i in range(n)]
    G2 = None
    for i in range(n):
        g = _bdot(Q1[i], Q1[i], ((1,), (1,)))
        G2 = g if G2 is None else G2 + g
    Gh2, Gi2 = _ns_polar(G2 + dpad[None], eye, it2)
    Q = [_bdot(Q1[i], Gi2, ((2,), (1,))) * m2[None] for i in range(n)]
    T = _bdot(Gh2, Gh1, ((2,), (1,)))
    return Q, T


def _orth_rows(V, dpad, m2, eye, n: int, it1: int, it2: int):
    """Mirror for the ROWS of the merged (R, n*R) site matrices (backward
    gauge): ``V[i] = T @ Q[i]`` per problem."""
    G = None
    for i in range(n):
        g = _bdot(V[i], V[i], ((2,), (2,)))
        G = g if G is None else G + g
    Gh1, Gi1 = _ns_polar(G + dpad[None], eye, it1)
    Q1 = [_bdot(Gi1, V[i], ((2,), (1,))) * m2[None] for i in range(n)]
    G2 = None
    for i in range(n):
        g = _bdot(Q1[i], Q1[i], ((2,), (2,)))
        G2 = g if G2 is None else G2 + g
    Gh2, Gi2 = _ns_polar(G2 + dpad[None], eye, it2)
    Q = [_bdot(Gi2, Q1[i], ((2,), (1,))) * m2[None] for i in range(n)]
    T = _bdot(Gh1, Gh2, ((2,), (1,)))
    return Q, T


def _fwd_kernel(b_ref, A_ref, Renv_ref, Rb_ref, mrow_ref, mcol_ref,
                dpad_ref, eye_ref, e00_ref, e00b_ref,
                lenv_ref, lbenv_ref, x0_ref, *,
                d: int, R: int, RA: int, n: int, bt: int, cg_iters: int,
                ns1: int, ns2: int):
    """Forward half-sweep for a block of ``bt`` problems. Solves sites
    0..d-2, emits the left-env stacks of the new cores (lenv[k] covers
    sites 0..k-1) and the new site-0 core; the site-(d-1) core is never
    consumed by the backward sweep."""
    eye = eye_ref[:]
    e00 = e00_ref[:]
    e00b = e00b_ref[:]
    zero = jnp.zeros((bt, R, R), jnp.float32)

    L = [zero + e00[None] if W == 0 else zero for W in range(RA)]
    Lb = zero + e00b[None]
    for W in range(RA):
        lenv_ref[:, 0, W] = L[W]
    lbenv_ref[:, 0] = Lb

    x0_new = None
    for k in range(d - 1):
        m2 = mrow_ref[k] * mcol_ref[k + 1]
        bk = [b_ref[:, k, i] for i in range(n)]
        Renv = [Renv_ref[:, k + 1, w] for w in range(RA)]
        Rb_env = Rb_ref[:, k + 1]
        t1 = [_bdot(Lb, bk[i], ((2,), (1,))) for i in range(n)]
        rhs = [_bdot(t1[i], Rb_env, ((2,), (2,))) * m2[None]
               for i in range(n)]

        def Ak_row(wi, jw, k=k):
            return A_ref[k, wi, jw]

        V = _cg_site(L, Renv, Ak_row, rhs, m2, n, RA, cg_iters)
        Q, _T = _orth_cols(V, dpad_ref[k + 1], m2, eye, n, ns1, ns2)
        # env updates with the new core
        L_new = [None] * RA
        for i in range(n):
            t = [_bdot(Q[i], L[W], ((1,), (1,))) for W in range(RA)]
            for W in range(RA):
                for j in range(n):
                    v = _bdot(t[W], Q[j], ((2,), (1,)))
                    for w in range(RA):
                        term = A_ref[k, W * n + i, j * RA + w] * v
                        L_new[w] = term if L_new[w] is None \
                            else L_new[w] + term
        Lb_new = None
        for i in range(n):
            tb = _bdot(Q[i], t1[i], ((1,), (1,)))
            Lb_new = tb if Lb_new is None else Lb_new + tb
        for W in range(RA):
            lenv_ref[:, k + 1, W] = L_new[W]
        lbenv_ref[:, k + 1] = Lb_new
        L = L_new
        Lb = Lb_new
        if k == 0:
            x0_new = Q
    for i in range(n):
        x0_ref[:, i] = x0_new[i]


def _bwd_kernel(b_ref, A_ref, Lenv_ref, Lb_ref, x0_ref, mrow_ref,
                mcol_ref, dpad_ref, eye_ref, e00_ref, e00b_ref,
                out_ref, *, d: int, R: int, RA: int, n: int, bt: int,
                cg_iters: int, ns1: int, ns2: int):
    """Backward half-sweep for a block of ``bt`` problems: solves sites
    d-1..1 carrying the right envs of the new cores; absorbs the final T
    into the (forward-produced) site-0 core."""
    eye = eye_ref[:]
    e00 = e00_ref[:]
    e00b = e00b_ref[:]
    zero = jnp.zeros((bt, R, R), jnp.float32)

    Renv = [zero + e00[None] if w == 0 else zero for w in range(RA)]
    Rb_c = zero + e00b[None]
    T_last = zero + eye[None]
    for k in range(d - 1, 0, -1):
        m2 = mrow_ref[k] * mcol_ref[k + 1]
        bk = [b_ref[:, k, i] for i in range(n)]
        L = [Lenv_ref[:, k, W] for W in range(RA)]
        Lb = Lb_ref[:, k]
        t1 = [_bdot(Lb, bk[i], ((2,), (1,))) for i in range(n)]
        rhs = [_bdot(t1[i], Rb_c, ((2,), (2,))) * m2[None]
               for i in range(n)]

        def Ak_row(wi, jw, k=k):
            return A_ref[k, wi, jw]

        V = _cg_site(L, Renv, Ak_row, rhs, m2, n, RA, cg_iters)
        Q, T = _orth_rows(V, dpad_ref[k], m2, eye, n, ns1, ns2)
        # right-env updates with the new core
        s = [[_bdot(Q[j], Renv[w], ((2,), (2,))) for w in range(RA)]
             for j in range(n)]
        R_new = []
        for W in range(RA):
            acc = None
            for i in range(n):
                m = None
                for j in range(n):
                    for w in range(RA):
                        term = A_ref[k, W * n + i, j * RA + w] * s[j][w]
                        m = term if m is None else m + term
                t = _bdot(Q[i], m, ((2,), (2,)))
                acc = t if acc is None else acc + t
            R_new.append(acc)
        Rb_new = None
        for i in range(n):
            sb = _bdot(bk[i], Rb_c, ((2,), (2,)))
            tb = _bdot(Q[i], sb, ((2,), (2,)))
            Rb_new = tb if Rb_new is None else Rb_new + tb
        for i in range(n):
            out_ref[:, k, i] = Q[i]
        Renv = R_new
        Rb_c = Rb_new
        T_last = T
    m2_0 = mrow_ref[0] * mcol_ref[1]
    for i in range(n):
        out_ref[:, 0, i] = _bdot(x0_ref[:, i], T_last,
                                 ((2,), (1,))) * m2_0[None]


@functools.partial(jax.jit, static_argnames=("cg_iters", "ns_iters",
                                             "block_b", "interpret"))
def als_fwd_bwd_fused_batched(A_stack, b_batch, x_batch, masks,
                              cg_iters: int = 32,
                              ns_iters: tuple = (24, 8),
                              block_b: int = 4,
                              interpret: bool = False):
    """One full forward+backward batched ALS pass in 3 kernel dispatches.

    ``A_stack (d, RA, n, n, RA)`` shared operator; ``b_batch/x_batch
    (B, d, R, n, R)`` with ``Rb == R`` (the padded CN pipeline contract);
    ``masks (d+1, R)`` shared rank profile. Matches
    ``als_sweeps_b(..., sweep_count=2)`` up to the orthogonalization gauge
    (represented vectors agree — parity tests); the gauge here is NS polar
    (``T = G^{1/2}``) instead of QR.
    """
    B, d, R, n, _ = x_batch.shape
    RA = A_stack.shape[1]
    if b_batch.shape[2] != R:
        raise ValueError("fused half-sweep requires Rb == R")
    if B % block_b != 0:
        block_b = 1
    dt = x_batch.dtype
    from ttnx.kernels.env_chain import env_chain_fused_batched

    xm = x_batch * masks[1:][None, :, None, None, :]
    Renvs, Rb_envs = env_chain_fused_batched(xm, A_stack, b_batch,
                                             left=False,
                                             interpret=interpret, raw=True)
    bt_arr = jnp.transpose(b_batch, (0, 1, 3, 2, 4))   # (B, d, n, R, R)
    A2 = A_stack.reshape(d, RA * n, n * RA)
    eye = jnp.eye(R, dtype=dt)
    mrow = jnp.broadcast_to(masks[:, :, None], (d + 1, R, R))
    mcol = jnp.broadcast_to(masks[:, None, :], (d + 1, R, R))
    dpad = (1.0 - masks)[:, :, None] * eye[None]
    e00 = jnp.zeros((R, R), dt).at[0, 0].set(1.0)
    e00b = jnp.zeros((R, R), dt).at[0, 0].set(1.0)

    space = pl.ANY if interpret else pltpu.VMEM
    sspace = pl.ANY if interpret else pltpu.SMEM
    ns1, ns2 = ns_iters
    bt = block_b
    grid = (B // bt,)

    bspec = lambda *shape: pl.BlockSpec(
        (bt,) + shape, lambda i: (i,) + tuple(i * 0 for _ in shape),
        memory_space=space)
    shared = lambda *shape, ms: pl.BlockSpec(
        shape, lambda i: tuple(i * 0 for _ in shape), memory_space=ms)

    fwd = functools.partial(_fwd_kernel, d=d, R=R, RA=RA, n=n, bt=bt,
                            cg_iters=cg_iters, ns1=ns1, ns2=ns2)
    Lenvs, Lb_envs, x0_new = pl.pallas_call(
        fwd,
        grid=grid,
        in_specs=[
            bspec(d, n, R, R),                    # b
            shared(d, RA * n, n * RA, ms=sspace),  # A scalars
            bspec(d + 1, RA, R, R),               # Renvs
            bspec(d + 1, R, R),                   # Rb envs
            shared(d + 1, R, R, ms=space),        # mrow
            shared(d + 1, R, R, ms=space),        # mcol
            shared(d + 1, R, R, ms=space),        # dpad
            shared(R, R, ms=space),               # eye
            shared(R, R, ms=space),               # e00
            shared(R, R, ms=space),               # e00b
        ],
        out_specs=(bspec(d + 1, RA, R, R), bspec(d + 1, R, R),
                   bspec(n, R, R)),
        out_shape=(jax.ShapeDtypeStruct((B, d + 1, RA, R, R), dt),
                   jax.ShapeDtypeStruct((B, d + 1, R, R), dt),
                   jax.ShapeDtypeStruct((B, n, R, R), dt)),
        interpret=interpret,
    )(bt_arr, A2, Renvs, Rb_envs, mrow, mcol, dpad, eye, e00, e00b)

    bwd = functools.partial(_bwd_kernel, d=d, R=R, RA=RA, n=n, bt=bt,
                            cg_iters=cg_iters, ns1=ns1, ns2=ns2)
    x_out = pl.pallas_call(
        bwd,
        grid=grid,
        in_specs=[
            bspec(d, n, R, R),                    # b
            shared(d, RA * n, n * RA, ms=sspace),  # A scalars
            bspec(d + 1, RA, R, R),               # Lenvs
            bspec(d + 1, R, R),                   # Lb envs
            bspec(n, R, R),                       # new site-0 core
            shared(d + 1, R, R, ms=space),        # mrow
            shared(d + 1, R, R, ms=space),        # mcol
            shared(d + 1, R, R, ms=space),        # dpad
            shared(R, R, ms=space),               # eye
            shared(R, R, ms=space),               # e00
            shared(R, R, ms=space),               # e00b
        ],
        out_specs=bspec(d, n, R, R),
        out_shape=jax.ShapeDtypeStruct((B, d, n, R, R), dt),
        interpret=interpret,
    )(bt_arr, A2, Lenvs, Lb_envs, x0_new, mrow, mcol, dpad, eye, e00, e00b)
    return jnp.transpose(x_out, (0, 1, 3, 2, 4))
