"""TDVP time evolution on the TT manifold (1-site and 2-site).

Reference: /root/reference/src/solvers/tdvp.jl. Our core layout is already the
``(left, phys, right)`` MPS layout the reference permutes into (tdvp.jl:22-25),
so the sweeps run directly on the cores. Krylov exponentials use
:func:`ttnx.solvers.krylov.expm_multiply` (replacing KrylovKit.exponentiate).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ttnx.core.algebra import add, matvec, norm, scale, sub
from ttnx.core.canonical import orthogonalize, svdtrunc
from ttnx.core.tt import TTOperator, TTVector
from ttnx.solvers.krylov import expm_multiply

__all__ = ["tdvp", "tdvp2", "tdvp1sweep", "tdvp2sweep"]


def _mpo_asbs(core):
    """(r_l, s_out, s_in, r_r) -> (r_l, s_out, r_r, s_in), the reference's
    (a, s, b, s') layout (tdvp.jl:25)."""
    return jnp.transpose(core, (0, 1, 3, 2))


def _apply_h1(AC, FL, FR, M):
    """``HAC[x,s,z] = FL[x,a,p] AC[p,t,y] M[a,s,b,t] FR[y,b,z]``
    (reference _applyH1_lsr tdvp.jl:29-31)."""
    return jnp.einsum("xap,pty,asbt,ybz->xsz", FL, AC, M, FR, optimize=True)


def _apply_h0(C, FL, FR):
    """``HC[x,z] = FL[x,a,p] C[p,y] FR[y,a,z]``
    (reference _applyH0 tdvp.jl:33-35)."""
    return jnp.einsum("xap,py,yaz->xz", FL, C, FR, optimize=True)


def _apply_h2(AAC, FL, FR, M1, M2):
    """``HAAC[x,s,v,z] = FL[x,a,p] AAC[p,t,u,y] M1[a,s,b,t] M2[b,v,c,u]
    FR[y,c,z]`` (reference _applyH2_lsr tdvp.jl:205-208)."""
    return jnp.einsum("xap,ptuy,asbt,bvcu,ycz->xsvz", FL, AAC, M1, M2, FR,
                      optimize=True)


def _update_left_env(A, M, FL):
    """``FL'[a,z,b] = FL[x,p,y] A[y,t,b] M[p,s,z,t] conj(A)[x,s,a]``
    (reference _update_left_env tdvp.jl:37-39)."""
    return jnp.einsum("xpy,ytb,pszt,xsa->azb", FL, A, M, jnp.conj(A),
                      optimize=True)


def _update_right_env(A, M, FR):
    """``FR'[x,a,b] = A[x,t,y] FR[y,p,z] M[a,s,p,t] conj(A)[b,s,z]``
    (reference _update_right_env tdvp.jl:41-43)."""
    return jnp.einsum("xty,ypz,aspt,bsz->xab", A, FR, M, jnp.conj(A),
                      optimize=True)


def _init_right_envs(cores, Ms, dtype):
    n_sites = len(cores)
    F = [None] * (n_sites + 2)
    F[0] = jnp.ones((1, 1, 1), dtype=dtype)
    F[n_sites + 1] = jnp.ones((1, 1, 1), dtype=dtype)
    for k in range(n_sites - 1, -1, -1):
        F[k + 1] = _update_right_env(cores[k], Ms[k], F[k + 2])
    return F


def tdvp1sweep(dt, psi: TTVector, H: TTOperator, F=None, ishermitian=True,
               tol=1e-12, krylov_dim=30, verbose=False):
    """One symmetric 1-site TDVP sweep L->R then R->L; each site evolves by
    ``exp(-i dt H1)`` forward and each bond by ``exp(+i dt H0)`` backward
    (reference tdvp1sweep! /root/reference/src/solvers/tdvp.jl:45-152).

    Returns ``(psi_new, F)`` with the environment cache for reuse."""
    n_sites = psi.N
    complex_t = (isinstance(dt, complex) or psi.is_complex or H.is_complex)
    dtype = jnp.complex128 if complex_t else jnp.float64
    cores = [c.astype(dtype) for c in psi.cores]
    Ms = [_mpo_asbs(c.astype(dtype)) for c in H.cores]

    if F is None:
        F = _init_right_envs(cores, Ms, dtype)
    else:
        F = [f.astype(dtype) for f in F]

    def t_eff(z):
        zz = np.complex128(z)
        return zz.real if zz.imag == 0 else zz

    AC = cores[0]
    for k in range(n_sites - 1):
        h1 = lambda x, k=k: _apply_h1(x, F[k], F[k + 2], Ms[k])
        AC = expm_multiply(h1, t_eff(-1j * dt), AC, tol=tol,
                           krylov_dim=krylov_dim)
        if verbose:
            e = jnp.vdot(AC, h1(AC))
            print(f"TDVP sweep: site={k} energy={float(jnp.real(e))}")
        dl, d, dr = AC.shape
        q, r = jnp.linalg.qr(AC.reshape(dl * d, dr))
        cores[k] = q.reshape(dl, d, -1)
        F[k + 1] = _update_left_env(cores[k], Ms[k], F[k])
        h0 = lambda x, k=k: _apply_h0(x, F[k + 1], F[k + 2])
        C = expm_multiply(h0, t_eff(+1j * dt), r, tol=tol,
                          krylov_dim=krylov_dim)
        AC = jnp.einsum("ag,gsb->asb", C, cores[k + 1])

    h1n = lambda x: _apply_h1(x, F[n_sites - 1], F[n_sites + 1], Ms[n_sites - 1])
    AC = expm_multiply(h1n, t_eff(-1j * dt), AC, tol=tol, krylov_dim=krylov_dim)

    for k in range(n_sites - 2, -1, -1):
        dl, d, dr = AC.shape
        qt, rt = jnp.linalg.qr(AC.reshape(dl, d * dr).T)
        cores[k + 1] = qt.T.reshape(-1, d, dr)
        F[k + 2] = _update_right_env(cores[k + 1], Ms[k + 1], F[k + 3])
        h0 = lambda x, k=k: _apply_h0(x, F[k + 1], F[k + 2])
        C = expm_multiply(h0, t_eff(+1j * dt), rt.T, tol=tol,
                          krylov_dim=krylov_dim)
        AC = jnp.einsum("asg,gb->asb", cores[k], C)
        h1 = lambda x, k=k: _apply_h1(x, F[k], F[k + 2], Ms[k])
        AC = expm_multiply(h1, t_eff(-1j * dt), AC, tol=tol,
                           krylov_dim=krylov_dim)

    cores[0] = AC
    return TTVector(cores), F


def tdvp2sweep(dt, psi: TTVector, H: TTOperator, F=None, max_bond=None,
               truncerr=0.0, ishermitian=True, tol=1e-12, krylov_dim=30,
               verbose=False):
    """One 2-site TDVP sweep with half time steps and truncated SVD rank
    adaptation (reference tdvp2sweep! /root/reference/src/solvers/tdvp.jl:210-301)."""
    n_sites = psi.N
    complex_t = (isinstance(dt, complex) or psi.is_complex or H.is_complex)
    dtype = jnp.complex128 if complex_t else jnp.float64
    cores = [c.astype(dtype) for c in psi.cores]
    Ms = [_mpo_asbs(c.astype(dtype)) for c in H.cores]
    dt_half = dt / 2

    if F is None:
        F = _init_right_envs(cores, Ms, dtype)
    else:
        F = [f.astype(dtype) for f in F]

    def t_eff(z):
        zz = np.complex128(z)
        return zz.real if zz.imag == 0 else zz

    AC = cores[0]
    for k in range(n_sites - 1):
        AAC = jnp.einsum("asg,gtb->astb", AC, cores[k + 1])
        h2 = lambda x, k=k: _apply_h2(x, F[k], F[k + 3], Ms[k], Ms[k + 1])
        AAC = expm_multiply(h2, t_eff(-1j * dt_half), AAC, tol=tol,
                            krylov_dim=krylov_dim)
        dl, d1, d2, dr = AAC.shape
        u, s, vt = svdtrunc(AAC.reshape(dl * d1, d2 * dr), max_bond=max_bond,
                            truncerr=truncerr)
        cores[k] = u.reshape(dl, d1, -1)
        F[k + 1] = _update_left_env(cores[k], Ms[k], F[k])
        AC = (s[:, None] * vt).reshape(-1, d2, dr)
        if k < n_sites - 2:
            h1 = lambda x, k=k: _apply_h1(x, F[k + 1], F[k + 3], Ms[k + 1])
            AC = expm_multiply(h1, t_eff(+1j * dt_half), AC, tol=tol,
                               krylov_dim=krylov_dim)

    for k in range(n_sites - 2, -1, -1):
        AAC = jnp.einsum("asg,gtb->astb", cores[k], AC)
        h2 = lambda x, k=k: _apply_h2(x, F[k], F[k + 3], Ms[k], Ms[k + 1])
        AAC = expm_multiply(h2, t_eff(-1j * dt_half), AAC, tol=tol,
                            krylov_dim=krylov_dim)
        dl, d1, d2, dr = AAC.shape
        u, s, vt = svdtrunc(AAC.reshape(dl * d1, d2 * dr), max_bond=max_bond,
                            truncerr=truncerr)
        cores[k + 1] = vt.reshape(-1, d2, dr)
        F[k + 2] = _update_right_env(cores[k + 1], Ms[k + 1], F[k + 3])
        AC = (u * s[None, :]).reshape(dl, d1, -1)
        if k > 0:
            h1 = lambda x, k=k: _apply_h1(x, F[k], F[k + 2], Ms[k])
            AC = expm_multiply(h1, t_eff(+1j * dt_half), AC, tol=tol,
                               krylov_dim=krylov_dim)

    cores[0] = AC
    return TTVector(cores), F


def _tdvp_driver(sweep_fn, H, u0, steps, normalize, return_error, sweeps,
                 carry_env, imaginary_time, verbose, **kwargs):
    psi = orthogonalize(u0, 0)
    wants_complex = not imaginary_time
    if wants_complex and not psi.is_complex:
        psi = psi.astype(jnp.complex128)
    Hc = H.astype(jnp.complex128) if (wants_complex and not H.is_complex) else H

    psi_prev = psi
    F = None
    for h in np.atleast_1d(steps):
        psi_prev_step = psi
        dt_eff = (1j * h) if imaginary_time else complex(h)
        for _ in range(sweeps):
            F_in = F if carry_env else None
            psi, F = sweep_fn(dt_eff, psi, Hc, F_in, verbose=verbose, **kwargs)
        if normalize:
            psi = scale(1.0 / float(norm(psi)), psi)
        psi = orthogonalize(psi, 0)
        F = None
        psi_prev = psi_prev_step

    if return_error:
        h = float(np.atleast_1d(steps)[-1])
        diff = scale(1.0 / h, sub(psi, psi_prev))
        if imaginary_time:
            residual = sub(diff, matvec(Hc, psi))
        else:
            residual = add(diff, scale(1j, matvec(Hc, psi)))
        rel_error = float(norm(residual) / norm(psi))
        return psi, rel_error
    return psi


def tdvp(H: TTOperator, u0: TTVector, steps, normalize=True,
         return_error=False, sweeps=1, carry_env=True, verbose=False,
         imaginary_time=False, config=None, **kwargs):
    """1-site TDVP driver (reference tdvp /root/reference/src/solvers/tdvp.jl:154-203).

    Real-time evolution of ``i dpsi/dt = H psi`` (complexifies real input);
    ``imaginary_time=True`` evolves ``dpsi/dt = H psi`` in real arithmetic.
    ``config`` (:class:`ttnx.config.TDVPConfig`) overrides option defaults."""
    if config is not None:
        normalize, sweeps = config.normalize, config.sweeps
        carry_env = config.carry_env
        imaginary_time = config.imaginary_time
    return _tdvp_driver(tdvp1sweep, H, u0, steps, normalize, return_error,
                        sweeps, carry_env, imaginary_time, verbose, **kwargs)


def tdvp2(H: TTOperator, u0: TTVector, steps, normalize=True,
          return_error=False, sweeps=1, carry_env=True, verbose=False,
          max_bond=None, truncerr=0.0, imaginary_time=False, config=None,
          **kwargs):
    """2-site TDVP driver with rank adaptation
    (reference tdvp2 /root/reference/src/solvers/tdvp.jl:303-357).
    ``config`` (:class:`ttnx.config.TDVPConfig`) overrides option defaults."""
    if config is not None:
        normalize, sweeps = config.normalize, config.sweeps
        carry_env = config.carry_env
        imaginary_time = config.imaginary_time
        max_bond, truncerr = config.max_bond, config.truncerr
    return _tdvp_driver(tdvp2sweep, H, u0, steps, normalize, return_error,
                        sweeps, carry_env, imaginary_time, verbose,
                        max_bond=max_bond, truncerr=truncerr, **kwargs)
