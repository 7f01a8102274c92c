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


def test_pallas_padded_layout_equivalence():
    """The flat padded [n_pad] fast path (call_padded, no per-matvec
    pad/unpad) must match the box-layout action exactly, with an exactly
    zero tail (the invariant the integrators rely on when carrying the
    padded layout end-to-end)."""
    b = pm.models.repressilator()
    cs = ConstraintSet(None, np.array([25, 15, 15]), np.full(3, 0.2))
    space = BoxStateSpace(b.model.stoichiometry, cs, b.x0)
    op = BoxOperator(b.model, space, dtype=jnp.float64, use_pallas=True)
    assert op.padded_layout

    rng = np.random.default_rng(1)
    p_box = jnp.asarray(rng.random(space.shape), jnp.float64) * op.mask_f
    nc = space.num_constraints
    y_box = FspVector(p=p_box, sinks=jnp.zeros((nc,), jnp.float64))
    want = op.action(0.3, y_box)

    p_flat = op.to_padded(p_box)
    assert p_flat.shape == (op.n_pad,)
    y_flat = FspVector(p=p_flat, sinks=jnp.zeros((nc,), jnp.float64))
    got = op.action(0.3, y_flat)

    assert got.p.shape == (op.n_pad,)
    n = int(np.prod(space.shape))
    np.testing.assert_allclose(
        np.asarray(op.from_padded(got.p)), np.asarray(want.p),
        rtol=1e-12, atol=1e-13)
    # tail must be exactly zero — integrator norms/dots see the raw vector
    assert not np.asarray(got.p[n:]).any()
    np.testing.assert_allclose(np.asarray(got.sinks),
                               np.asarray(want.sinks),
                               rtol=1e-12, atol=1e-13)


def test_pallas_padded_layout_tiled_grid():
    """Padded fast path through the grid-tiled kernel (grid > 1)."""
    import pacmensl_tpu.ops.pallas_box as pb
    b = pm.models.repressilator()
    cs = ConstraintSet(None, np.array([25, 23, 23]), np.full(3, 0.2))
    space = BoxStateSpace(b.model.stoichiometry, cs, b.x0)
    old_budget, old_tile = pb.VMEM_BUDGET, pb.TILE_ROWS
    pb.VMEM_BUDGET, pb.TILE_ROWS = 16 * 1024, 40
    try:
        op = BoxOperator(b.model, space, dtype=jnp.float64,
                         use_pallas=True)
        assert op._pallas.grid > 1 and op.padded_layout
        rng = np.random.default_rng(2)
        p_box = jnp.asarray(rng.random(space.shape), jnp.float64) \
            * op.mask_f
        nc = space.num_constraints
        want = op.action(0.1, FspVector(
            p=p_box, sinks=jnp.zeros((nc,), jnp.float64)))
        got = op.action(0.1, FspVector(
            p=op.to_padded(p_box), sinks=jnp.zeros((nc,), jnp.float64)))
        n = int(np.prod(space.shape))
        np.testing.assert_allclose(
            np.asarray(op.from_padded(got.p)), np.asarray(want.p),
            rtol=1e-12, atol=1e-13)
        assert not np.asarray(got.p[n:]).any()
        np.testing.assert_allclose(np.asarray(got.sinks),
                                   np.asarray(want.sinks),
                                   rtol=1e-12, atol=1e-13)
    finally:
        pb.VMEM_BUDGET, pb.TILE_ROWS = old_budget, old_tile


@pytest.mark.slow
def test_padded_layout_full_solve_matches_reference_path():
    """End-to-end FSP solve (expand loop included) through the padded-layout
    fast path (pallas=True, interpret on CPU) vs the default XLA box path.
    Covers the solver's padded initial vector, epoch scatter across a
    capacity change, and distribution extraction."""
    b = pm.models.repressilator()

    def run(pallas):
        s = pm.FspSolverMultiSinks(backend="box", odes_type="krylov",
                                   dtype=jnp.float64, pallas=pallas)
        s.set_model(b.model)
        s.set_initial_bounds(np.array([22, 2, 2]))
        s.set_expansion_factors(np.array([0.2, 0.2, 0.2]))
        s.set_initial_distribution(b.x0, b.p0)
        return s.solve(1.0, 1.0e-4)

    want = run(False)
    got = run(True)
    assert got.num_states == want.num_states
    # the two paths round differently, so the adaptive integrators take
    # different step sequences: agreement is bounded by the ODE tolerance,
    # not machine epsilon — compare in total variation at that scale
    tv = 0.5 * float(np.abs(np.asarray(got.p)
                            - np.asarray(want.p)).sum())
    assert tv < 1e-6, tv
    # sink mass integrates the leaked flux along the (diverged) step
    # sequence; agreement is at the FSP tolerance scale, not roundoff
    np.testing.assert_allclose(np.asarray(got.sinks),
                               np.asarray(want.sinks),
                               rtol=5e-2, atol=1e-8)


def test_padded_layout_when_n_pad_equals_n():
    """Regression (round-3 advice): a tile-aligned box (prod(shape) a
    multiple of 128 with no row padding) has n_pad == n; the flat padded
    initial vector must still take the kernel's padded path — the old
    guard sent it down the legacy box path whose box-shaped output
    crashed the integrator's axpy at trace time."""
    from pacmensl_tpu.models.model import Model

    # 4 independent birth-death species, bounds 3 each -> box (4,4,4,4),
    # n = 256 = 2 rows of 128, no padding
    S = 4
    stoich = np.vstack([np.eye(S, dtype=int), -np.eye(S, dtype=int)])

    def prop(x, r):
        xf = x.astype(jnp.float64) if not jnp.issubdtype(
            x.dtype, jnp.floating) else x
        if r < S:
            return jnp.full_like(xf[:, 0], 0.8)
        return 0.5 * xf[:, r - S]

    m = Model(stoich, prop)
    s = pm.FspSolverMultiSinks(backend="box", odes_type="krylov",
                               dtype=jnp.float64, pallas=True)
    s.set_model(m)
    s.set_initial_bounds([3, 3, 3, 3])
    s.set_expansion_factors([0.0, 0.0, 0.0, 0.0])
    s.set_initial_distribution(np.zeros((1, S), np.int64), np.array([1.0]))
    s.set_up()
    assert s._operator.padded_layout
    assert s._operator.n_pad == int(np.prod(s._space.shape)), \
        "test needs the tile-aligned n_pad == n case"
    d = s.solve(0.3, 0.0)           # fixed space, short horizon
    total = float(d.sum()) + float(d.sinks.sum())
    assert abs(total - 1.0) < 1e-8


def test_pallas_lane_aligned_fast_path_matches_generic():
    """Minor extent exactly 128 engages the lane-aligned kernel (minor
    coordinate = lane index, carry-free flat shifts, [rows, 1] upper
    coordinate fields).  It must agree bit-for-bit in structure with the
    generic carry-select kernel on the same shape — single-block and
    grid-tiled, with product constraints and in-kernel sinks."""
    import pacmensl_tpu.ops.pallas_box as pb
    from pacmensl_tpu.ops.pallas_box import PallasBoxKernel
    from pacmensl_tpu.models.library import repressilator, toggle

    rng = np.random.default_rng(0)

    def build(mm, shape, comps, aligned, sink_active=None):
        R = np.atleast_2d(np.asarray(mm.stoichiometry)).shape[0]
        k = PallasBoxKernel(mm.propensity, mm.stoichiometry, shape,
                            list(range(R)), dtype=jnp.float64,
                            components=comps, synth_mask=True,
                            sink_active=sink_active)
        if not aligned:
            k.aligned = False
            k._fn = k._build()
            k._call = jax.jit(k._fn)
        return k

    cases = [
        (toggle().model, (6, 128), (4, 120),
         (lambda x: x[:, 0], lambda x: x[:, 1],
          lambda x: x[:, 0] * x[:, 1]), False),
        (repressilator().model, (3, 5, 128), (2, 4, 126),
         (lambda x: x[:, 0], lambda x: x[:, 1], lambda x: x[:, 2],
          lambda x: x[:, 1] * x[:, 2]), False),
        (repressilator().model, (40, 40, 128), (38, 38, 126),
         (lambda x: x[:, 0], lambda x: x[:, 1], lambda x: x[:, 2]),
         True),                      # force grid tiling
    ]
    saved = (pb.VMEM_BUDGET, pb.TILE_ROWS, pb.MAX_TILE_ROWS)
    try:
        for mm, shape, bounds, comps, tiled in cases:
            if tiled:
                pb.VMEM_BUDGET = 64 * 1024
                pb.TILE_ROWS = 256
                pb.MAX_TILE_ROWS = 256
            else:
                pb.VMEM_BUDGET, pb.TILE_ROWS, pb.MAX_TILE_ROWS = saved
            ka = build(mm, shape, comps, True)
            kg = build(mm, shape, comps, False)
            assert ka.aligned and not kg.aligned
            if tiled:
                assert ka.grid > 1
            n = int(np.prod(shape))
            p = jnp.asarray(rng.random(n).reshape(shape))
            c = jnp.asarray(np.arange(1, len(ka.reactions) + 1) * 0.5)
            b = jnp.asarray(bounds)
            dpa, sa = ka(c, b, p, None)
            dpg, sg = kg(c, b, p, None)
            np.testing.assert_allclose(np.asarray(dpa), np.asarray(dpg),
                                       rtol=1e-12, atol=1e-13)
            np.testing.assert_allclose(np.asarray(jnp.asarray(sa)),
                                       np.asarray(jnp.asarray(sg)),
                                       rtol=1e-12, atol=1e-13)
    finally:
        pb.VMEM_BUDGET, pb.TILE_ROWS, pb.MAX_TILE_ROWS = saved
