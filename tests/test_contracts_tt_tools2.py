"""Behavioral-contract port, part 2: the remaining distinct test sets of
/root/reference/test/test_tt_tools.jl not covered by test_contracts_tt_tools.py
or test_core_tt.py — decomposition root/flag semantics, noise perturbation,
orthogonality-flag contracts, entropy bases, matricize, and the printed
representation contract (reference lines cited per class)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import ttnx
from ttnx.core.canonical import entanglement_entropy, orthogonalize
from ttnx.core.decomp import (
    matricize,
    tto_decomp,
    tto_to_tensor,
    ttv_decomp,
    ttv_to_tensor,
)
from ttnx.core.tt import TTVector, rand_tt, rand_tt_like


class TestDecompContracts:
    """/root/reference/test/test_tt_tools.jl:246-375"""

    def test_centered_root_ot_flags(self, rng):
        # reference :320-325 — root at index 1 (0-based): flags mark
        # left-orthogonal before, center, right-orthogonal after
        t = rng.standard_normal((2, 3, 2))
        tt = ttv_decomp(t, index=1)
        assert tt.ot == (1, 0, -1)
        assert np.allclose(np.asarray(ttv_to_tensor(tt)), t, atol=1e-10)

    def test_ttsvd_matches_plain_tt_svd_magnitudes(self, rng):
        # reference :246-307 — ttv_decomp of the all-ones tensor agrees with
        # a plain truncated-SVD TT decomposition up to per-core sign gauges
        d = 10
        t = np.ones((2,) * d)
        tt = ttv_decomp(t)
        assert max(tt.ranks) == 1  # rank-1 tensor
        for c in tt.cores:
            v = np.abs(np.asarray(c)).reshape(-1)
            # each core of the symmetric rank-1 state is |[a, a]| — the same
            # equal-magnitude cores the plain truncated-SVD TT gives
            assert np.allclose(v, v[0], atol=1e-12)
        assert np.allclose(np.asarray(ttv_to_tensor(tt)), t, atol=1e-10)

    def test_tto_nonsymmetric_matvec(self, rng):
        # reference :345-359 — guards the (x1,y1,...,xd,yd) interleave
        dims = (2, 2)
        n = 4
        A_mat = rng.standard_normal((n, n))
        A_tt = tto_decomp(A_mat.reshape(dims + dims))
        assert np.allclose(
            np.asarray(tto_to_tensor(A_tt)).reshape(n, n), A_mat, atol=1e-10)
        v = rng.standard_normal(n)
        v_tt = ttv_decomp(v.reshape(dims))
        Av = np.asarray(ttv_to_tensor(ttnx.matvec(A_tt, v_tt))).reshape(-1)
        assert np.allclose(Av, A_mat @ v, atol=1e-10)

    def test_tto_non_uniform_dims(self, rng):
        # reference :360-369
        dims = (2, 3)
        n = 6
        A_mat = rng.standard_normal((n, n))
        A_tt = tto_decomp(A_mat.reshape(dims + dims))
        assert A_tt.dims == dims
        assert np.allclose(
            np.asarray(tto_to_tensor(A_tt)).reshape(n, n), A_mat, atol=1e-10)

    def test_tto_preserves_eltype_f32(self, rng):
        # reference :370-373
        t = rng.standard_normal((2, 2, 2, 2)).astype(np.float32)
        assert tto_to_tensor(tto_decomp(t)).dtype == jnp.float32


class TestNoisePerturbation:
    """rand_tt(tt; eps) noise-addition overload
    (/root/reference/test/test_tt_tools.jl:598-642) — ttnx analog:
    rand_tt_like(key, x, eps) with an explicit PRNG key."""

    def _base(self, key, dtype=jnp.float64):
        return rand_tt(key, (2, 2, 2), (1, 2, 2, 1)).astype(dtype)

    def test_structure_preserved_and_values_change(self, key):
        tt = self._base(key)
        noisy = rand_tt_like(jax.random.PRNGKey(1), tt, eps=1e-5)
        assert noisy.N == tt.N
        assert noisy.dims == tt.dims
        assert noisy.ranks == tt.ranks
        assert noisy.ot == (0,) * tt.N
        assert not all(np.allclose(np.asarray(a), np.asarray(b))
                       for a, b in zip(noisy.cores, tt.cores))

    def test_zero_eps_is_copy(self, key):
        tt = self._base(key)
        same = rand_tt_like(jax.random.PRNGKey(1), tt, eps=0.0)
        for a, b in zip(same.cores, tt.cores):
            assert np.allclose(np.asarray(a), np.asarray(b))

    def test_complex_dtype_preserved(self, key):
        tt = self._base(key, jnp.complex128)
        noisy = rand_tt_like(jax.random.PRNGKey(2), tt, eps=1e-3)
        assert noisy.dtype == jnp.complex128
        assert noisy.dims == tt.dims and noisy.ranks == tt.ranks

    def test_different_keys_differ(self, key):
        tt = self._base(key)
        n1 = rand_tt_like(jax.random.PRNGKey(3), tt, eps=1e-5)
        n2 = rand_tt_like(jax.random.PRNGKey(4), tt, eps=1e-5)
        assert not all(np.allclose(np.asarray(a), np.asarray(b))
                       for a, b in zip(n1.cores, n2.cores))


class TestOrthogonalizeContract:
    """/root/reference/test/test_tt_tools.jl:981-1018 — value preservation,
    flag placement, and actual core orthonormality at every center."""

    @pytest.mark.parametrize("center", [0, 1, 2])
    def test_flags_and_orthonormality(self, key, center):
        tt = rand_tt(key, (2, 3, 4), (1, 2, 3, 1))
        ref = np.asarray(ttv_to_tensor(tt))
        orth = orthogonalize(tt, center)
        assert np.allclose(np.asarray(ttv_to_tensor(orth)), ref, atol=1e-12)
        assert orth.ot[center] == 0
        for j in range(center):
            assert orth.ot[j] == 1
            c = np.asarray(orth.cores[j])  # (r_l, n, r_r)
            m = c.reshape(-1, c.shape[2])
            assert np.allclose(m.T @ m, np.eye(c.shape[2]), atol=1e-12)
        for j in range(center + 1, 3):
            assert orth.ot[j] == -1
            c = np.asarray(orth.cores[j])
            m = c.reshape(c.shape[0], -1)
            assert np.allclose(m @ m.T, np.eye(c.shape[0]), atol=1e-12)


class TestEntropyContract:
    """/root/reference/test/test_tt_tools.jl:1019-1036 — bases + GHZ."""

    def test_bell_base2(self):
        bell = np.zeros((2, 2))
        bell[0, 0] = bell[1, 1] = 1 / np.sqrt(2)
        s = entanglement_entropy(ttv_decomp(bell), base=2)
        assert np.allclose(s, [1.0], atol=1e-12)

    def test_ghz_complex(self):
        ghz = np.zeros((2, 2, 2), dtype=np.complex128)
        ghz[0, 0, 0] = 1 / np.sqrt(2)
        ghz[1, 1, 1] = 1j / np.sqrt(2)
        s = entanglement_entropy(ttv_decomp(ghz))
        assert np.allclose(s, [np.log(2)] * 2, atol=1e-12)


class TestMatricizeContract:
    """/root/reference/test/test_tt_tools.jl:1038-1050 — basis vectors map to
    single unit entries of the 2^d grid vector."""

    @pytest.mark.parametrize("pos", [0, 2, 4, 7])
    def test_basis_vector(self, pos):
        d = 3
        tt = ttnx.qtt_basis_vector(d, pos)
        v = np.asarray(matricize(tt)).reshape(-1)
        assert v.size == 2 ** d
        assert np.isclose(np.sum(np.abs(v) ** 2), 1.0)
        assert np.count_nonzero(v) == 1
        assert np.isclose(np.abs(v[pos]), 1.0)


class TestShowContract:
    """/root/reference/test/test_tt_tools.jl:1051-1101 — the printed
    representation names the container class, dtype, site count, and the
    canonical-form description; visualize emits a bond/leg diagram."""

    def test_ttvector_repr(self, key):
        tt = rand_tt(key, (2, 3, 4), (1, 2, 3, 1))
        s = repr(tt)
        assert "TTVector" in s and "float64" in s and "sites=3" in s
        assert "ot=none" in s
        assert "center @ site 1" in repr(orthogonalize(tt, 1))
        assert "left-canonical" in repr(tt.with_ot((1, 1, 1)))
        assert "right-canonical" in repr(tt.with_ot((-1, -1, -1)))

    def test_ttoperator_repr(self, key):
        A = ttnx.rand_tto(key, (2, 3), 2)
        s = repr(A)
        assert "TTOperator" in s and "float64" in s
        assert "dims=(2, 3)" in s

    def test_visualize_diagram(self, key):
        tt = rand_tt(key, (2, 3, 4), (1, 2, 3, 1))
        diagram = ttnx.visualize(tt)
        assert isinstance(diagram, str)
        for frag in ("1--", "2--", "3--", "|", "4"):
            assert frag in diagram
