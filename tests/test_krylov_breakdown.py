"""Regression tests for the Krylov happy-breakdown path.

Round-2 bug: on happy breakdown (Arnoldi basis exhausts a space smaller
than the requested Krylov dimension) the local error was set to
``btol`` instead of 0, so step acceptance required
``tau >= btol/(abs_tol*delta)`` while the rejection loop only *shrinks*
tau — a death spiral walking tau to ~1e-31 until max_reject -> status -1.
Every FSP solve's early epochs have tiny state spaces, so any
(small space, small tau heuristic) combination hit this; the driver's
``dryrun_multichip`` config (Poisson bounds=[8], krylov dim range
(10, 20)) failed deterministically.

The breakdown contract (reference KrylovFsp.cpp:101-262 completes on any
space size): on breakdown the subspace is invariant, expm is exact for
any tau, and the step must be accepted.
"""
import math

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.stats import poisson as poisson_law

import pacmensl_tpu as pm
from pacmensl_tpu.parallel.mesh import make_mesh
from pacmensl_tpu.solvers.krylov import KrylovSolver
from pacmensl_tpu.ops.vecops import FspVector


def _poisson_solver(meshed, dtype, m_rng=(10, 20), bounds=(8,)):
    b = pm.models.poisson(2.0)
    mesh = make_mesh(8) if meshed else None
    s = pm.FspSolverMultiSinks(backend="ell", odes_type="krylov",
                               mesh=mesh, dtype=dtype)
    s.set_model(b.model)
    s.set_krylov_dim_range(*m_rng)
    s.set_initial_bounds(list(bounds))
    s.set_expansion_factors([1.0])
    s.set_initial_distribution(b.x0, b.p0)
    return s


def _check_poisson(d, t, tol):
    pdf = poisson_law.pmf(d.states[:, 0], 2.0 * t)
    assert np.abs(d.p - pdf).sum() <= tol


@pytest.mark.parametrize("t_final", [0.5, 2.0])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.float64])
@pytest.mark.parametrize("meshed", [False, True])
def test_dryrun_config_small_space_small_m(t_final, dtype, meshed):
    """The exact driver dryrun leg: 9-state space < m_min=10."""
    tol = 1e-4
    s = _poisson_solver(meshed, dtype)
    d = s.solve(t_final, tol)
    _check_poisson(d, t_final, 2e-3 if dtype == jnp.float32 else 1e-3)


@pytest.mark.parametrize("n_states", [2, 5, 24])
def test_space_smaller_than_m_min_sweep(n_states):
    """Generic n_states < m_min (default 25) sweep, direct on the
    integrator: breakdown must be accepted and the result exact."""
    # birth-death generator on n_states states (no sinks in the operator:
    # a closed system so expm preserves mass and has a known action)
    n = n_states
    birth, death = 1.3, 0.7
    A = np.zeros((n, n))
    for i in range(n):
        if i + 1 < n:
            A[i + 1, i] += birth
            A[i, i] -= birth
        if i > 0:
            A[i - 1, i] += death
            A[i, i] -= death
    Aj = jnp.asarray(A, jnp.float64)

    def mv(t, y):
        return FspVector(p=Aj @ y.p, sinks=jnp.zeros_like(y.sinks))

    p0 = np.zeros(n)
    p0[0] = 1.0
    y0 = FspVector(p=jnp.asarray(p0, jnp.float64),
                   sinks=jnp.zeros((1,), jnp.float64))
    ks = KrylovSolver(mv, dtype=jnp.float64)   # default m_min=25 > n
    res = ks.solve(y0, 0.0, 3.0)
    assert int(res.status) == 0, int(res.status)
    from scipy.linalg import expm as sexpm
    ref = sexpm(3.0 * A) @ p0
    assert np.abs(np.asarray(res.y.p) - ref).max() < 1e-10
    # breakdown means few matvecs: never more than ~n per step
    assert int(res.stats.n_steps) >= 1


def test_expansion_epochs_cross_breakdown_boundary():
    """Tight bounds force epochs whose space grows through m_min: early
    epochs break down, later ones don't; the whole chain must match the
    analytic law (the dryrun's second leg, unmeshed and quick)."""
    s = _poisson_solver(False, jnp.float64)
    d = s.solve(2.0, 1e-4)
    n_epochs = s.events.events["ODESolve"].count
    assert n_epochs >= 2
    lam = 4.0
    err = sum(abs(float(pi) - math.exp(-lam) * lam ** int(x[0])
                  / math.factorial(int(x[0])))
              for x, pi in zip(d.states, d.p))
    assert err <= 1e-3, err
