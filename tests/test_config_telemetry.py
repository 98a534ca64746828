"""Config dataclasses and SolverTelemetry wired through the solver entry
points (SURVEY §5 config/metrics subsystems; no reference counterpart —
replaces kwargs + Ref globals)."""

import numpy as np
import pytest

import jax

from ttnx import (
    ALSConfig,
    DMRGConfig,
    KrylovConfig,
    MALSConfig,
    SolverTelemetry,
    TDVPConfig,
    als_eigsolve,
    als_linsolve,
    dmrg_eigsolve,
    dmrg_linsolve,
    id_tto,
    krylov_linsolve,
    laplacian,
    mals_linsolve,
    norm,
    qtt_sin,
    rand_tt,
    tdvp,
)


@pytest.fixture
def system(key):
    d = 5
    A = id_tto(d)
    b = qtt_sin(d)
    x0 = rand_tt(key, (2,) * d, rmax=4, normalise=True)
    return A, b, x0


class TestConfigObjects:
    def test_als_config_controls_sweeps_and_info(self, system):
        A, b, x0 = system
        out = als_linsolve(A, b, x0, config=ALSConfig(sweep_count=4,
                                                      return_info=True))
        x, info = out
        assert info["residual"] < 1e-10

    def test_mals_config(self, system):
        A, b, x0 = system
        x = mals_linsolve(A, b, x0, config=MALSConfig(tol=1e-12, rmax=8))
        assert float(norm(x - b) / norm(b)) < 1e-6

    def test_dmrg_config(self, system):
        A, b, x0 = system
        x, info = dmrg_linsolve(A, b, x0, return_info=True,
                                config=DMRGConfig(tol=1e-12,
                                                  sweep_schedule=(2,)))
        # config does not override return_info (not a DMRGConfig field)
        assert info["residual"] < 1e-8

    def test_krylov_config(self, system):
        A, b, x0 = system
        x = krylov_linsolve(A, b, x0,
                            config=KrylovConfig(krylov_solver="gmres",
                                                maxiter=30))
        assert float(norm(x - b) / norm(b)) < 1e-6

    def test_tdvp_config(self, key):
        d = 4
        H = -1.0 * laplacian(d)
        u0 = qtt_sin(d)
        out_cfg = tdvp(H, u0, [1e-3] * 2,
                       config=TDVPConfig(normalize=False, imaginary_time=True))
        out_kw = tdvp(H, u0, [1e-3] * 2, normalize=False, imaginary_time=True)
        from ttnx import ttv_to_tensor

        a = np.asarray(ttv_to_tensor(out_cfg))
        b = np.asarray(ttv_to_tensor(out_kw))
        assert a.dtype == b.dtype
        assert np.allclose(a, b, atol=1e-12)


class TestTelemetry:
    def test_als_linsolve_feeds_telemetry(self, system):
        A, b, x0 = system
        tel = SolverTelemetry()
        als_linsolve(A, b, x0, sweep_count=4, telemetry=tel)
        assert tel.local_solves == 4 * 4  # (d-1) per half sweep
        assert len(tel.residuals) == 4
        assert tel.residuals[-1] <= tel.residuals[0] * (1 + 1e-12)
        assert tel.wall_seconds > 0
        assert max(tel.max_ranks) <= 4

    def test_als_eigsolve_feeds_energy(self, key):
        d = 4
        A = laplacian(d)
        x0 = rand_tt(key, (2,) * d, rmax=3, normalise=True)
        tel = SolverTelemetry()
        E, x = als_eigsolve(A, x0, telemetry=tel)
        assert len(tel.energies) == len(E)
        assert tel.local_solves == len(E)

    def test_mals_dmrg_telemetry(self, system, key):
        A, b, x0 = system
        tel = SolverTelemetry()
        mals_linsolve(A, b, x0, telemetry=tel)
        assert tel.local_solves > 0 and len(tel.residuals) == 1

        tel2 = SolverTelemetry()
        d = 4
        H = laplacian(d)
        x1 = rand_tt(key, (2,) * d, rmax=4, normalise=True)
        E, x, r_hist = dmrg_eigsolve(H, x1, telemetry=tel2)
        assert tel2.energies == [float(e) for e in E]
        assert tel2.max_ranks == [int(r) for r in r_hist]
        assert tel2.wall_seconds > 0
