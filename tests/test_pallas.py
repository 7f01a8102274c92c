"""Pallas fused box-action kernel vs the XLA stencil path.

The kernel must reproduce BoxOperator.action exactly (same masked stencil,
same sink semantics) — validated in interpret mode on CPU, over 1-D, 2-D
(custom product constraints) and 3-D boxes, including after an epoch-style
bounds change at fixed capacity.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import pacmensl_tpu as pm
from pacmensl_tpu.ops.box_operator import BoxOperator
from pacmensl_tpu.ops.vecops import FspVector
from pacmensl_tpu.statespace.box_space import BoxStateSpace
from pacmensl_tpu.statespace.constraints import ConstraintSet


def _compare(bundle, t=0.3, bounds=None, dtype=jnp.float64):
    cs = ConstraintSet(bundle.constraint,
                       bounds if bounds is not None else bundle.bounds,
                       bundle.expansion_factors)
    space = BoxStateSpace(bundle.model.stoichiometry, cs, bundle.x0)
    ref_op = BoxOperator(bundle.model, space, dtype=dtype, use_pallas=False)
    pal_op = BoxOperator(bundle.model, space, dtype=dtype, use_pallas=True)
    assert pal_op._pallas is not None

    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.random(space.shape), dtype) * ref_op.mask_f
    y = FspVector(p=p, sinks=jnp.zeros((space.num_constraints,), dtype))

    want = ref_op.action(t, y)
    got = pal_op.action(t, y)
    np.testing.assert_allclose(np.asarray(got.p), np.asarray(want.p),
                               rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(np.asarray(got.sinks),
                               np.asarray(want.sinks),
                               rtol=1e-12, atol=1e-13)
    return ref_op, pal_op, space, y


def test_pallas_poisson_1d():
    _compare(pm.models.poisson(), bounds=np.array([50]))


def test_pallas_toggle_2d_product_constraints():
    _compare(pm.models.toggle(), bounds=np.array([12, 9, 40]))


def test_pallas_repressilator_3d():
    b = pm.models.repressilator()
    b2 = type(b)(model=b.model, constraint=b.constraint, bounds=b.bounds,
                 expansion_factors=b.expansion_factors, x0=b.x0, p0=b.p0,
                 name=b.name)
    _compare(b2)


def test_pallas_epoch_stability_bounds_as_data():
    """Growing bounds within capacity must flow through the same kernel
    (bounds are SMEM data, not baked constants)."""
    b = pm.models.toggle()
    cs = ConstraintSet(b.constraint, np.array([16, 9, 40]),
                       b.expansion_factors)
    space = BoxStateSpace(b.model.stoichiometry, cs, b.x0)
    pal_op = BoxOperator(b.model, space, dtype=jnp.float64, use_pallas=True)
    ref_op = BoxOperator(b.model, space, dtype=jnp.float64, use_pallas=False)

    rng = np.random.default_rng(1)
    shape0 = space.shape
    p = jnp.asarray(rng.random(shape0), jnp.float64) * ref_op.mask_f
    y = FspVector(p=p, sinks=jnp.zeros((space.num_constraints,),
                                       jnp.float64))
    # epoch 2: grow a bound but stay within the capacity ladder
    space.set_bounds(np.array([18, 9, 41]))
    assert tuple(space.shape) == tuple(shape0), "capacity must not change"
    d_pal = pal_op.refresh_data()
    d_ref = ref_op.refresh_data()
    got = pal_op.action(0.0, y, d_pal)
    want = ref_op.action(0.0, y, d_ref)
    np.testing.assert_allclose(np.asarray(got.p), np.asarray(want.p),
                               rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(np.asarray(got.sinks),
                               np.asarray(want.sinks),
                               rtol=1e-12, atol=1e-13)


def test_pallas_time_varying_hog1p_3d():
    """Time-varying coefficients (hog1p) flow through the c vector."""
    b = pm.models.hog1p_3d()
    cs = ConstraintSet(b.constraint, b.bounds, b.expansion_factors)
    space = BoxStateSpace(b.model.stoichiometry, cs, b.x0)
    ref_op = BoxOperator(b.model, space, dtype=jnp.float64, use_pallas=False)
    pal_op = BoxOperator(b.model, space, dtype=jnp.float64, use_pallas=True)
    rng = np.random.default_rng(2)
    p = jnp.asarray(rng.random(space.shape), jnp.float64) * ref_op.mask_f
    y = FspVector(p=p, sinks=jnp.zeros((space.num_constraints,),
                                       jnp.float64))
    for t in (0.0, 30.0, 120.0):
        want = ref_op.action(t, y)
        got = pal_op.action(t, y)
        np.testing.assert_allclose(np.asarray(got.p), np.asarray(want.p),
                                   rtol=1e-12, atol=1e-13)
        np.testing.assert_allclose(np.asarray(got.sinks),
                                   np.asarray(want.sinks),
                                   rtol=1e-12, atol=1e-13)


def test_pallas_tiled_grid(monkeypatch):
    """Boxes over the single-block VMEM budget run the grid-tiled kernel
    (3-neighbor halo blocks); shrink the budgets so a small repressilator
    box exercises grid > 1, and check exact agreement with the XLA path —
    including the cross-grid SMEM sink accumulation."""
    from pacmensl_tpu.ops import pallas_box
    monkeypatch.setattr(pallas_box, "VMEM_BUDGET", 1024)
    monkeypatch.setattr(pallas_box, "TILE_ROWS", 4)
    b = pm.models.repressilator()
    # repressilator carries 6 constraints (3 coords + 3 products); the
    # bounds vector must match that arity and cover x0 = (21, 0, 0)
    _, pal_op, _, _ = _compare(
        b, bounds=np.array([25, 15, 15, 60, 30, 60]))
    assert pal_op._pallas.grid > 1


def test_pallas_tiled_negative_and_large_shifts(monkeypatch):
    """Tiled halo handling with shifts in the major axis (|k| spanning
    several tiles' worth of rows is rejected; |k| within one tile works),
    and death reactions (negative flat shifts)."""
    from pacmensl_tpu.ops import pallas_box
    monkeypatch.setattr(pallas_box, "VMEM_BUDGET", 1024)
    monkeypatch.setattr(pallas_box, "TILE_ROWS", 8)
    _, pal_op, _, _ = _compare(pm.models.toggle(),
                               bounds=np.array([40, 33, 100]))
    assert pal_op._pallas.grid > 1


def test_pallas_end_to_end_solve():
    """Full FSP solve with the pallas matvec matches the XLA matvec."""
    b = pm.models.toggle()

    def make(use_pallas):
        s = pm.FspSolverMultiSinks(backend="box", odes_type="krylov")
        s.set_model(b.model)
        s.set_constraints(b.constraint, [5, 5, 10], b.expansion_factors)
        s.set_initial_distribution(b.x0, b.p0)
        s._pallas_mode = use_pallas
        return s

    s_ref = make(False)
    d_ref = s_ref.solve(t_final=20.0, fsp_tol=1e-4)
    s_pal = make(True)
    d_pal = s_pal.solve(t_final=20.0, fsp_tol=1e-4)
    m0 = d_ref.marginal(0)
    m1 = d_pal.marginal(0)
    n = min(m0.size, m1.size)
    assert np.abs(m0[:n] - m1[:n]).sum() < 1e-10
