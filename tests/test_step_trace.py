"""Per-accepted-step observability (reference per-step perf logging,
OdeSolverBase.cpp:105-132, and the RHS-evaluation event): the integrators
record (t, h, m/order) on device per accepted step; the FSP driver drains
them into StepTrace and accounts RHS counts/FLOPs into the event log."""
import numpy as np
import pytest

import pacmensl_tpu as pm
from pacmensl_tpu.sys.events import EVT_RHS


@pytest.mark.parametrize("odes", ["krylov", "cvode", "petsc"])
def test_per_step_trace_and_rhs_event(odes):
    b = pm.models.poisson(2.0)
    s = pm.FspSolverMultiSinks(backend="ell", odes_type=odes)
    s.set_model(b.model)
    s.set_initial_bounds([10])
    s.set_expansion_factors([0.5])
    s.set_initial_distribution(b.x0, b.p0)
    s.solve(5.0, 1e-4)

    tr = s.step_trace
    n_epochs = s.events.events["ODESolve"].count
    # one trace row per accepted step — strictly more rows than epochs
    assert tr.n_steps > n_epochs
    t = np.asarray(tr.model_time)
    h = np.asarray(tr.step_h)
    aux = np.asarray(tr.aux)
    # model time is nondecreasing within the solve and ends at t_final
    assert (np.diff(t) >= -1e-12).all()
    assert t[-1] == pytest.approx(5.0, rel=1e-9)
    # step sizes are positive and consistent with the time advance
    assert (h > 0).all()
    # method detail: Krylov m in [m_min, m_max]; BDF order in [1, 5];
    # RK constant 7 stages
    if odes == "krylov":
        assert ((aux >= 1) & (aux <= 60)).all()
    elif odes == "cvode":
        assert ((aux >= 1) & (aux <= 5)).all()
    else:
        assert (aux == 7).all()
    assert len(tr.n_eqs) == len(tr.model_time) == len(tr.step_h)

    # RHS event: counted from the integrator's carried matvec stats
    rhs = s.events.events[EVT_RHS]
    assert rhs.count > 0
    assert rhs.flops > 0
    # every accepted step costs at least one matvec
    assert rhs.count >= tr.n_steps


def test_trace_ring_overflow_reconstructs_chronology():
    """When an epoch exceeds the ring capacity, the drained trace stays
    chronological and the dropped prefix is counted."""
    import jax.numpy as jnp
    from pacmensl_tpu.solvers.rk import RKSolver
    from pacmensl_tpu.ops.vecops import FspVector

    def mv(t, y):
        return FspVector(p=-0.1 * y.p, sinks=jnp.zeros_like(y.sinks))

    y0 = FspVector(p=jnp.ones((8,)), sinks=jnp.zeros((1,)))
    solver = RKSolver(mv, trace_cap=16)
    res = solver.solve(y0, 0.0, 50.0)
    n_steps = int(res.stats.n_steps)
    assert n_steps > 16, "test needs an epoch longer than the ring"

    from pacmensl_tpu.sys.events import StepTrace
    st = StepTrace()
    st.record_epoch(n_steps, res.trace, y0.p.size)
    assert st.n_steps == 16
    assert st.truncated == n_steps - 16
    assert (np.diff(st.model_time) > 0).all()
