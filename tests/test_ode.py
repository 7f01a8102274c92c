"""Integrator tests mirroring the reference test_ode.cpp strategy: each
backend drives a real FSP problem to t_final and is compared against a
dense-expm oracle; error-injection tests assert that a failing matvec
propagates out as status -1."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import scipy.linalg as sla

import pacmensl_tpu as pm
from pacmensl_tpu.ops.ell_operator import EllOperator
from pacmensl_tpu.ops.vecops import FspVector
from pacmensl_tpu.statespace.state_set import StateSet
from pacmensl_tpu.statespace.constraints import ConstraintSet
from pacmensl_tpu.sys.errors import SetupError
from pacmensl_tpu.solvers.krylov import KrylovSolver
from pacmensl_tpu.solvers.rk import RKSolver
from pacmensl_tpu.solvers.bdf import BdfSolver


@pytest.fixture(scope="module")
def toggle_fixture():
    """Toggle model on a small box (reference test_ode fixture uses
    fsp_size {100,100}; we use a smaller box so a dense oracle is cheap)."""
    b = pm.models.toggle()
    cs = ConstraintSet(None, [12, 12])
    ss = StateSet(b.model.stoichiometry, cs, init_states=[[0, 0]])
    ss.expand()
    op = EllOperator(b.model, ss)
    y0p = np.zeros(op.n_pad)
    y0p[ss.state2index([[0, 0]])[0]] = 1.0
    y0 = FspVector(p=jnp.asarray(y0p), sinks=jnp.zeros(op.num_constraints))
    # dense oracle including sink rows
    n, n_c = ss.num_states, op.num_constraints
    A = op.dense_matrix()
    Afull = np.zeros((n + n_c, n + n_c))
    Afull[:, :n] = A
    t_final = 100.0
    w = sla.expm(t_final * Afull) @ np.concatenate([y0p[:n], np.zeros(n_c)])
    return b, ss, op, y0, t_final, w


def _check(res, ss, op, w, tol):
    n = ss.num_states
    assert int(res.status) == 0
    p = np.asarray(jax.device_get(res.y.p))[:n]
    assert np.abs(p - w[:n]).sum() < tol
    np.testing.assert_allclose(np.asarray(jax.device_get(res.y.sinks)),
                               w[n:], atol=tol)


def test_krylov_toggle(toggle_fixture):
    b, ss, op, y0, t_final, w = toggle_fixture
    res = KrylovSolver(op.action, rhs_cost=op.local_mv_flops()).solve(
        y0, 0.0, t_final)
    _check(res, ss, op, w, 1e-10)


def test_rk_toggle(toggle_fixture):
    b, ss, op, y0, t_final, w = toggle_fixture
    res = RKSolver(op.action, rtol=1e-8, atol=1e-14).solve(y0, 0.0, t_final)
    _check(res, ss, op, w, 1e-6)


def test_bdf_toggle(toggle_fixture):
    b, ss, op, y0, t_final, w = toggle_fixture
    res = BdfSolver(op.action, rtol=1e-8, atol=1e-14).solve(y0, 0.0, t_final)
    _check(res, ss, op, w, 1e-5)


@pytest.mark.parametrize("solver_cls", [KrylovSolver, RKSolver, BdfSolver])
def test_handling_bad_matvec(toggle_fixture, solver_cls):
    """Reference test_ode.cpp:188,261: an rhs failure mid-integration must
    propagate.  Injection: the matvec turns NaN after t > 1."""
    b, ss, op, y0, t_final, w = toggle_fixture

    def bad(t, y):
        d = op.action(t, y)
        bad_factor = jnp.where(t > 1.0, jnp.nan, 1.0)
        return FspVector(p=d.p * bad_factor, sinks=d.sinks)

    res = solver_cls(bad).solve(y0, 0.0, t_final)
    assert int(res.status) == -1


@pytest.mark.parametrize("solver_cls", [KrylovSolver, RKSolver, BdfSolver])
def test_fsp_stop_condition(solver_cls):
    """With a tight bound, the sink check must stop integration early with
    status 1 and a state satisfying the check."""
    b = pm.models.poisson(2.0)
    cs = ConstraintSet(None, [5], [0.1])
    ss = StateSet(b.model.stoichiometry, cs, init_states=[[0]])
    ss.expand()
    op = EllOperator(b.model, ss)
    y0p = np.zeros(op.n_pad)
    y0p[ss.state2index([[0]])[0]] = 1.0
    y0 = FspVector(p=jnp.asarray(y0p), sinks=jnp.zeros(1))
    fsp_tol, t_final = 1e-6, 10.0

    def stop_check(t, y):
        return jnp.max(y.sinks) - fsp_tol * (t / t_final)

    res = solver_cls(op.action, stop_check=stop_check).solve(y0, 0.0, t_final)
    assert int(res.status) == 1
    assert float(res.t) < t_final
    # returned state satisfies the tolerance at the returned time
    # (Krylov interpolates back; RK re-steps; BDF reverts)
    assert float(jnp.max(res.y.sinks)) <= fsp_tol * float(res.t) / t_final \
        + 1e-14


@pytest.mark.parametrize("ts_type", ["cn", "bdf"])
def test_ts_type_pluggable(ts_type):
    """TsFsp pluggability parity (reference accepts any -ts_type and
    auto-wires implicit machinery, TsFsp.cpp:227-274): the PETSC backend
    must run implicit methods too.  Poisson oracle at loose tolerance."""
    from scipy.stats import poisson as poisson_law
    b = pm.models.poisson(2.0)
    s = pm.FspSolverMultiSinks(backend="ell", odes_type="petsc")
    s.set_ts_type(ts_type)
    s.set_model(b.model)
    s.set_initial_bounds(b.bounds)
    s.set_expansion_factors([0.5])
    s.set_initial_distribution(b.x0, b.p0)
    s.set_ode_tolerances(1e-6, 1e-12)
    d = s.solve(4.0, 1e-4)
    pdf = poisson_law.pmf(d.states[:, 0], 2.0 * 4.0)
    assert np.abs(d.p - pdf).sum() <= 1e-4


def test_ts_type_unknown_rejected():
    s = pm.FspSolverMultiSinks(odes_type="petsc")
    s.set_ts_type("weird")
    b = pm.models.poisson(2.0)
    s.set_model(b.model)
    s.set_initial_bounds(b.bounds)
    s.set_initial_distribution(b.x0, b.p0)
    with pytest.raises(SetupError):
        s.solve(1.0, 1e-4)
