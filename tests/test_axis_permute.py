"""Box-backend species-axis reordering (statespace/permute.py).

The box backend reorders species by descending box extent so the fused
kernel's flat-shift halo stays within the tile budget (hog1p's leading
4-state gene axis measured a 10.4 GB tile-padding OOM on the XLA
fallback).  These tests pin that the permutation is ACTIVE for such
models and invisible at the API: states come back in user order, solved
distributions match the (unpermuted) compressed backend, and restarting
from a permuted solve's output works.
"""
import numpy as np
import pytest

import pacmensl_tpu as pm
from pacmensl_tpu.statespace.permute import (choose_axis_order,
                                             permute_model,
                                             permute_constraints)
from pacmensl_tpu.statespace.constraints import ConstraintSet


def test_choose_axis_order():
    # largest first (halo), next-two largest in the trailing tile dims
    assert choose_axis_order([5, 2, 3]) is None          # already optimal
    np.testing.assert_array_equal(choose_axis_order([2, 9, 4]), [1, 0, 2])
    # stable on ties
    np.testing.assert_array_equal(choose_axis_order([3, 7, 7]), [1, 0, 2])
    # 5 species: smallest extents land in the middle
    np.testing.assert_array_equal(
        choose_axis_order([4, 50, 60, 40, 45]), [2, 3, 0, 4, 1])


def test_permuted_model_and_constraints_evaluate_identically():
    b = pm.models.hog1p_3d()
    order = np.array([1, 2, 0])
    pm_model = permute_model(b.model, order)
    cs = ConstraintSet(b.constraint, b.bounds, b.expansion_factors)
    pcs = permute_constraints(cs, order, 3)
    rng = np.random.default_rng(0)
    x_user = rng.integers(0, 4, size=(50, 3))
    x_int = x_user[:, order]
    for r in range(b.model.num_reactions):
        np.testing.assert_allclose(
            np.asarray(pm_model.propensity(x_int, r)),
            np.asarray(b.model.propensity(x_user, r)))
    np.testing.assert_allclose(np.asarray(pcs.values(x_int)),
                               np.asarray(cs.values(x_user)))
    # stoichiometry columns permuted
    np.testing.assert_array_equal(pm_model.stoichiometry,
                                  b.model.stoichiometry[:, order])


@pytest.mark.medium
def test_hog1p_3d_box_solve_permutes_and_matches_ell():
    """hog1p_3d: gene axis (extent 4) leads; the box backend must engage
    the permutation and still return user-order states that match the
    compressed backend exactly."""
    b = pm.models.hog1p_3d()

    def run(backend):
        s = pm.FspSolverMultiSinks(backend=backend, odes_type="cvode")
        s.set_model(b.model)
        s.set_constraint_functions(b.constraint)
        s.set_initial_bounds(b.bounds)
        s.set_expansion_factors(b.expansion_factors)
        s.set_initial_distribution(b.x0, b.p0)
        return s, s.solve(3.0, 1e-4)

    s_box, d1 = run("box")
    assert getattr(s_box, "_axis_inv", None) is not None, \
        "permutation should engage (gene axis is shortest)"
    # internal space leads with the largest extent
    shp = s_box._space.shape
    assert shp[0] == max(shp)
    _, d2 = run("ell")
    m = {tuple(x): float(p) for x, p in zip(d2.states, d2.p)}
    assert d1.num_states == d2.num_states
    tv = 0.5 * sum(abs(float(p) - m[tuple(x)])
                   for x, p in zip(d1.states, d1.p))
    assert tv < 1e-8, tv
    # restart from the permuted solve's own output (user-order states)
    s3 = pm.FspSolverMultiSinks(backend="box", odes_type="cvode")
    s3.set_model(b.model)
    s3.set_constraint_functions(b.constraint)
    s3.set_initial_bounds(b.bounds)
    s3.set_expansion_factors(b.expansion_factors)
    s3.set_initial_distribution(d1)
    d3 = s3.solve(3.5, 1e-4, t_init=3.0)
    assert abs(d3.sum() - 1.0) < 1e-3


@pytest.mark.medium
def test_mid_solve_reorder_on_anisotropic_growth():
    """Anisotropic expansion that flips the extent ordering must trigger
    the capacity-growth reorder rebuild (stale order measured a 51.7 GB
    tile-padding OOM on hog1p t=180) and still match the ELL backend."""
    import jax.numpy as jnp
    from pacmensl_tpu.models.model import Model

    # species A capped at 12 (no growth); species B births fast and its
    # bound expands past A's -> descending order flips mid-solve
    stoich = np.array([[1, 0], [-1, 0], [0, 1], [0, -1]])

    def prop(x, r):
        xf = x.astype(jnp.float32) if hasattr(x, "astype") else x
        if r == 0:
            return 0.3 * jnp.ones_like(xf[:, 0])
        if r == 1:
            return 0.5 * xf[:, 0]
        if r == 2:
            return 6.0 * jnp.ones_like(xf[:, 1])
        return 0.4 * xf[:, 1]

    def run(backend):
        s = pm.FspSolverMultiSinks(backend=backend, odes_type="krylov")
        s.set_model(Model(stoich, prop))
        s.set_initial_bounds([12, 4])
        s.set_expansion_factors([0.0, 0.6])
        s.set_initial_distribution(np.array([[0, 0]]), np.array([1.0]))
        return s, s.solve(6.0, 1e-6)

    s_box, d1 = run("box")
    # B's stationary-ish mean 15 pushes its bound well past 12
    assert d1.bounds[1] > 12
    assert getattr(s_box, "_axis_inv", None) is not None, \
        "reorder should have engaged once B outgrew A"
    _, d2 = run("ell")
    assert d1.num_states == d2.num_states
    m = {tuple(x): float(p) for x, p in zip(d2.states, d2.p)}
    tv = 0.5 * sum(abs(float(p) - m[tuple(x)])
                   for x, p in zip(d1.states, d1.p))
    assert tv < 5e-7, tv


@pytest.mark.medium
def test_sens_mid_solve_reorder_matches_unpermuted():
    """The sens driver's reorder rebuild must carry p AND dp through the
    same state-identity map (reference ExpandVec semantics)."""
    import jax.numpy as jnp
    from pacmensl_tpu.models.model import SensModel
    from pacmensl_tpu.sensfsp.sens_solver import SensFspSolverMultiSinks

    stoich = np.array([[1, 0], [-1, 0], [0, 1], [0, -1]])
    kb = 6.0

    def prop(x, r):
        xf = x.astype(jnp.float32) if hasattr(x, "astype") else x
        if r == 0:
            return 0.3 * jnp.ones_like(xf[:, 0])
        if r == 1:
            return 0.5 * xf[:, 0]
        if r == 2:
            return kb * jnp.ones_like(xf[:, 1])
        return 0.4 * xf[:, 1]

    def d_prop(x, j, r):
        xf = x.astype(jnp.float32) if hasattr(x, "astype") else x
        if j == 0 and r == 2:          # d/d kb
            return jnp.ones_like(xf[:, 1])
        return jnp.zeros_like(xf[:, 0])

    m = SensModel(stoich, prop, num_parameters=1, d_propensity=d_prop,
                  dprop_sparsity=((2,),), d_t_coeff=None,
                  dtcoef_sparsity=())

    def run(backend):
        s = SensFspSolverMultiSinks(backend=backend, odes_type="krylov")
        s.set_model(m)
        s.set_initial_bounds([12, 4])
        s.set_expansion_factors([0.0, 0.6])
        s.set_initial_distribution(np.array([[0, 0]]), np.array([1.0]))
        return s, s.solve(6.0, 1e-6)

    s_box, d1 = run("box")
    assert d1.bounds[1] > 12
    assert getattr(s_box, "_axis_inv", None) is not None
    _, d2 = run("ell")
    key = {tuple(x): i for i, x in enumerate(map(tuple, d2.states))}
    idx = np.array([key[tuple(x)] for x in d1.states])
    np.testing.assert_allclose(d1.p, d2.p[idx], rtol=1e-5, atol=1e-10)
    np.testing.assert_allclose(d1.dp[0], d2.dp[0][idx],
                               rtol=1e-4, atol=1e-8)
