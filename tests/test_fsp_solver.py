"""FSP driver tests mirroring the reference test_fsp_solver.cpp: call-
sequence misuse detection, and the Poisson analytic oracle
Sum |p_i - Poisson(lambda*t)| <= fsp_tol under each ODE backend, with the
solve->check->expand loop actually exercised (tiny initial bounds)."""
import numpy as np
import pytest
from scipy.stats import poisson as poisson_law

import pacmensl_tpu as pm
from pacmensl_tpu.sys.errors import SetupError


def make_poisson_solver(backend, ode):
    b = pm.models.poisson(2.0)
    s = pm.FspSolverMultiSinks(backend=backend, odes_type=ode)
    s.set_model(b.model)
    s.set_initial_bounds(b.bounds)
    # larger growth factor than the bundled 0.1 to keep the number of
    # expansion epochs (= per-shape compiles) small in CI
    s.set_expansion_factors([0.5])
    s.set_initial_distribution(b.x0, b.p0)
    s.set_ode_tolerances(1e-8, 1e-14)
    return s


def check_poisson(d, t):
    pdf = poisson_law.pmf(d.states[:, 0], 2.0 * t)
    return np.abs(d.p - pdf).sum()


@pytest.mark.parametrize("backend,ode", [
    ("box", "krylov"), ("ell", "petsc"),
    pytest.param("box", "cvode", marks=pytest.mark.slow)])
def test_poisson_oracle(backend, ode):
    s = make_poisson_solver(backend, ode)
    t_final, fsp_tol = 10.0, 1.0e-6
    d = s.solve(t_final, fsp_tol)
    assert check_poisson(d, t_final) <= fsp_tol
    # bounds must have grown well past the initial 5
    assert d.bounds[0] > 20


@pytest.mark.slow
def test_solve_tspan():
    s = make_poisson_solver("box", "krylov")
    tspan = [2.0, 5.0, 10.0]
    dists = s.solve_tspan(tspan, 1.0e-6)
    assert len(dists) == 3
    for t, d in zip(tspan, dists):
        assert d.t == pytest.approx(t)
        assert check_poisson(d, t) <= 1.0e-6


def test_misuse_detection():
    """Reference test_fsp_solver.cpp:127: SetUp before model is an error."""
    s = pm.FspSolverMultiSinks()
    with pytest.raises(SetupError):
        s.set_up()
    b = pm.models.poisson(2.0)
    s.set_model(b.model)
    with pytest.raises(SetupError):
        s.set_up()              # bounds missing
    s.set_initial_bounds(b.bounds)
    with pytest.raises(SetupError):
        s.set_up()              # initial distribution missing
    with pytest.raises(SetupError):
        s.set_initial_distribution(b.x0, None)


def test_toggle_solve_with_custom_constraints():
    """Toggle switch under its published custom constraints; checks mass
    conservation and marginal sanity."""
    b = pm.models.toggle()
    s = pm.FspSolverMultiSinks(backend="box", odes_type="krylov")
    s.set_model(b.model)
    s.set_constraint_functions(b.constraint)
    s.set_initial_bounds([50, 50, 500])
    s.set_expansion_factors(b.expansion_factors)
    s.set_initial_distribution(b.x0, b.p0)
    fsp_tol = 1e-4
    d = s.solve(100.0, fsp_tol)
    assert d.sum() >= 1.0 - fsp_tol
    m0 = d.marginal(0)
    assert m0.sum() == pytest.approx(d.sum())
    assert d.mean(0) > 0.1     # some mRNA produced by t=100


@pytest.mark.slow
def test_restart_from_distribution():
    """SetInitialDistribution(DiscreteDistribution) restart path."""
    s = make_poisson_solver("box", "krylov")
    d5 = s.solve(5.0, 1.0e-6)
    s2 = make_poisson_solver("box", "krylov")
    s2.set_initial_distribution(d5)
    d10 = s2.solve(10.0, 1.0e-6, t_init=5.0)
    assert check_poisson(d10, 10.0) <= 2.0e-6


def test_event_log_populated():
    s = make_poisson_solver("box", "krylov")
    s.solve(5.0, 1.0e-6)
    log = s.get_event_log()
    for name in ("Solving", "ODESolve", "MatrixGeneration"):
        assert name in log.events
    red = s.reduce_component_timing()
    assert red["Solving"][2] > 0


@pytest.mark.slow
def test_transcr_reg_6d_solve():
    """6-species transcription-regulation benchmark model (reference
    examples/transcr_reg_6d.cpp): time-varying reactions, dynamic
    expansion, probability conservation over the first minute of the
    cell cycle."""
    b = pm.models.transcription_regulation_6d()
    s = pm.FspSolverMultiSinks(backend="ell", odes_type="cvode")
    s.set_model(b.model)
    s.set_initial_bounds(b.bounds)
    s.set_expansion_factors(b.expansion_factors)
    s.set_initial_distribution(b.x0, b.p0)
    n0 = int(np.prod(np.asarray(b.bounds) + 1))
    d = s.solve(30.0, 1e-4)
    total = float(d.sum()) + float(d.sinks.sum())
    assert abs(total - 1.0) < 1e-8
    assert d.num_states > n0, "expected dynamic expansion"
