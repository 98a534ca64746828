"""AD, manifold optimization, converters, checkpointing
(mirror /root/reference/test/test_ad.jl, test_manopt.jl, and the ext/ layer)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import ttnx
from ttnx import (
    dot,
    from_reference_layout,
    heisenberg_xyz_tto,
    laplacian,
    load_tt,
    manifold_gradient_descent,
    matvec,
    norm,
    qtt_sin,
    qtto_to_matrix,
    rand_tt,
    rayleigh_quotient,
    save_tt,
    to_ttvector,
    ttv_to_tensor,
    ttvector_manifold,
)
from ttnx.core.algebra import scale
from ttnx.utils.validation import assert_finite, assert_valid_tt


def vec(tt):
    return np.asarray(ttv_to_tensor(tt)).reshape(-1)


class TestAutodiff:
    def test_grad_dot_matches_fd(self, key):
        # the ChainRulesCore-ext analog: JAX-native gradient of dot(A, B)
        # vs finite differences (/root/reference/test/test_ad.jl:27-87)
        k1, k2 = jax.random.split(key)
        a = rand_tt(k1, (2, 2, 2), rmax=2)
        b = rand_tt(k2, (2, 2, 2), rmax=2)

        f = lambda x: dot(x, b)
        g = jax.grad(f)(a)
        eps = 1e-6
        for site in range(3):
            probe = np.zeros_like(np.asarray(a.cores[site]))
            probe[0 if site == 0 else 1, 0, 0] = 1.0
            ap = ttnx.TTVector([
                c + eps * probe if k == site else c
                for k, c in enumerate(a.cores)])
            am = ttnx.TTVector([
                c - eps * probe if k == site else c
                for k, c in enumerate(a.cores)])
            fd = (float(f(ap)) - float(f(am))) / (2 * eps)
            assert np.isclose(float(g.cores[site][0 if site == 0 else 1, 0, 0]),
                              fd, atol=1e-5)

    def test_grad_matvec_energy(self, key):
        # gradient of <x, H x> through the MPO contraction
        d = 4
        H = laplacian(d)
        x = rand_tt(key, (2,) * d, rmax=2)
        f = lambda v: jnp.real(dot(v, matvec(H, v)))
        g = jax.grad(f)(x)
        # directional derivative check
        k2 = jax.random.split(key)[0]
        direction = rand_tt(k2, (2,) * d, rmax=2)
        eps = 1e-6
        xp = ttnx.TTVector([c + eps * dc for c, dc in
                            zip(x.cores, direction.cores)])
        xm = ttnx.TTVector([c - eps * dc for c, dc in
                            zip(x.cores, direction.cores)])
        fd = (float(f(xp)) - float(f(xm))) / (2 * eps)
        inner = sum(float(jnp.sum(gc * dc))
                    for gc, dc in zip(g.cores, direction.cores))
        assert np.isclose(inner, fd, rtol=1e-5)

    def test_grad_complex_dot(self, key):
        k1, k2 = jax.random.split(key)
        a = rand_tt(k1, (2, 2), rmax=2, dtype=jnp.complex128)
        b = rand_tt(k2, (2, 2), rmax=2, dtype=jnp.complex128)
        f = lambda x: jnp.real(dot(x, b))
        g = jax.grad(f)(a)  # Wirtinger gradient through conj
        assert g.cores[0].dtype == jnp.complex128

    def test_gradient_descent_reaches_dmrg_energy(self, key):
        # /root/reference/test/test_ad.jl:116-157 — AD gradient descent on the
        # Rayleigh quotient approaches the ground-state energy (the reference
        # accepts E_dmrg + 0.2 after 400 backtracking steps)
        d = 5
        H = heisenberg_xyz_tto(d)
        cost = rayleigh_quotient(H)
        x0 = rand_tt(key, (2,) * d, rmax=6, normalise=True, orthogonal=True)
        e0 = float(cost(x0))
        x, hist = manifold_gradient_descent(cost, x0, steps=250, lr=0.05)
        e_dense = np.linalg.eigvalsh(np.asarray(qtto_to_matrix(H)))[0]
        # monotone descent, substantial progress, variational bound, proximity
        assert all(hist[i + 1] <= hist[i] + 1e-9 for i in range(len(hist) - 1))
        assert hist[-1] < e0 - 1.0
        assert hist[-1] > e_dense - 1e-6
        assert hist[-1] < e_dense + 0.2

    def test_optax_compatibility(self, key):
        # TT pytrees drive optax optimizers directly
        import optax

        d = 4
        H = laplacian(d)
        cost = rayleigh_quotient(H)
        x = rand_tt(key, (2,) * d, rmax=4, normalise=True, orthogonal=True)
        opt = optax.adam(0.05)
        state = opt.init(x)
        value0 = float(cost(x))

        @jax.jit
        def step(x, state):
            val, g = jax.value_and_grad(cost)(x)
            updates, state = opt.update(g, state)
            x = optax.apply_updates(x, updates)
            return x, state, val

        for _ in range(100):
            x, state, val = step(x, state)
        e_dense = np.linalg.eigvalsh(np.asarray(qtto_to_matrix(H)))[0]
        assert float(val) < value0
        assert float(val) - e_dense < 1e-2


class TestManifold:
    def test_manifold_ops(self, key):
        k1, k2 = jax.random.split(key)
        p = rand_tt(k1, (2, 2, 2), rmax=2)
        X = rand_tt(k2, (2, 2, 2), rmax=2)
        M = ttvector_manifold(p)
        assert np.isclose(float(M.inner(p, X, X)), vec(X) @ vec(X))
        assert np.isclose(float(M.norm(p, X)), np.linalg.norm(vec(X)))
        z = M.zero_vector(p)
        assert np.allclose(vec(z), 0.0)
        moved = M.retract(p, X, 0.5)
        assert np.allclose(vec(moved), vec(p) + 0.5 * vec(X), atol=1e-12)


class TestConverters:
    def test_to_ttvector(self, rng):
        cores = [rng.standard_normal((1, 3, 2)),
                 rng.standard_normal((2, 4, 2)),
                 rng.standard_normal((2, 2, 1))]
        tt = to_ttvector(cores)
        assert tt.dims == (3, 4, 2)
        ref = np.einsum("aib,bjc,ckd->ijk", *cores)[..., 0]
        # first core has leading 1 axis; contract fully
        ref = np.einsum("aib,bjc,ckd->aijkd", *cores)[0, ..., 0]
        assert np.allclose(np.asarray(ttv_to_tensor(tt)), ref)

    def test_to_ttvector_validates(self, rng):
        with pytest.raises(ValueError):
            to_ttvector([rng.standard_normal((1, 2, 2)),
                         rng.standard_normal((3, 2, 1))])
        with pytest.raises(ValueError):
            to_ttvector([rng.standard_normal((2, 2, 1))])

    def test_reference_layout_round_trip(self, key):
        from ttnx.utils.convert import to_reference_layout

        x = rand_tt(key, (2, 3, 2), rmax=2)
        back = from_reference_layout(to_reference_layout(x))
        assert np.allclose(vec(back), vec(x))


class TestCheckpoint:
    def test_vector_round_trip(self, key, tmp_path):
        x = rand_tt(key, (2,) * 5, rmax=3)
        p = str(tmp_path / "x.npz")
        save_tt(p, x)
        y = load_tt(p)
        assert np.allclose(vec(y), vec(x))
        assert y.ot == x.ot

    def test_operator_round_trip(self, tmp_path):
        H = heisenberg_xyz_tto(4)
        p = str(tmp_path / "h.npz")
        save_tt(p, H)
        H2 = load_tt(p)
        assert np.allclose(np.asarray(qtto_to_matrix(H2)),
                           np.asarray(qtto_to_matrix(H)))

    def test_qtt_round_trip(self, tmp_path):
        from ttnx import QTTVector, function_to_qttv

        q = function_to_qttv(lambda c: c[..., 0] + c[..., 1], 2, 3,
                             ordering="serial")
        p = str(tmp_path / "q.npz")
        save_tt(p, q)
        q2 = load_tt(p)
        assert isinstance(q2, QTTVector)
        assert q2.ordering == "serial"
        assert q2.n_dims == 2 and q2.bits_per_dim == 3


class TestValidation:
    def test_valid_tt_passes(self, key):
        assert_valid_tt(rand_tt(key, (2, 2, 2), rmax=2))

    def test_bond_mismatch_raises(self):
        bad = ttnx.TTVector.__new__(ttnx.TTVector)
        bad.cores = (jnp.ones((1, 2, 3)), jnp.ones((2, 2, 1)))
        bad.ot = (0, 0)
        with pytest.raises(ValueError):
            assert_valid_tt(bad)

    def test_assert_finite(self, key):
        x = rand_tt(key, (2, 2), rmax=2)
        assert_finite(x)
        bad = scale(float("nan"), x)
        with pytest.raises(FloatingPointError):
            assert_finite(bad)
