"""Sharded fused Pallas kernel (shard_map + ppermute halo exchange,
parallel/halo_box.py) must match the single-device kernel and the XLA
stencil path exactly — the multi-chip analogue of the reference's
MatMult-with-VecScatter hot loop (FspMatrixBase.cpp:36-62).  Runs in
pallas interpret mode on the virtual 8-device CPU mesh."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import pacmensl_tpu as pm
from pacmensl_tpu.parallel.mesh import make_mesh, shard_fsp_vector
from pacmensl_tpu.ops.box_operator import BoxOperator
from pacmensl_tpu.ops.vecops import FspVector
from pacmensl_tpu.statespace.box_space import BoxStateSpace
from pacmensl_tpu.statespace.constraints import ConstraintSet


def _setup(bounds):
    b = pm.models.toggle()
    cs = ConstraintSet(None, bounds)
    pad = np.ones(2, np.int64)
    pad[0] = 8
    space = BoxStateSpace(b.model.stoichiometry, cs, b.x0, pad_quanta=pad)
    assert space.shape[0] % 8 == 0
    return b, cs, space


@pytest.mark.parametrize("synth", [True, False])
def test_sharded_kernel_matches_single_device(synth):
    b, cs, space = _setup([39, 17])
    mesh = make_mesh(8)
    op1 = BoxOperator(b.model, space, dtype=jnp.float32, use_pallas=True)
    op8 = BoxOperator(b.model, space, dtype=jnp.float32, use_pallas=True,
                      mesh=mesh)
    from pacmensl_tpu.parallel.halo_box import ShardedPallasBoxAction
    from pacmensl_tpu.ops.pallas_box import PallasBoxKernel
    assert isinstance(op8._pallas, ShardedPallasBoxAction)
    if not synth:
        # force the mask-READING kernels (halo-exchanged mask arrays)
        comps = cs.components
        op1._pallas = PallasBoxKernel(
            b.model.propensity, b.model.stoichiometry, space.shape,
            op1.enable_reactions, dtype=jnp.float32, components=comps,
            synth_mask=False)
        op8._pallas = ShardedPallasBoxAction(
            b.model.propensity, b.model.stoichiometry, space.shape,
            op8.enable_reactions, mesh, dtype=jnp.float32,
            components=comps, synth_mask=False)
        assert not op8._pallas.synth_mask
    rng = np.random.default_rng(0)
    p = (rng.random(space.shape)
         * np.asarray(space.mask_host, np.float64)).astype(np.float32)
    y1 = FspVector(p=jnp.asarray(p), sinks=jnp.zeros(2, jnp.float32))
    y8 = shard_fsp_vector(y1, mesh)
    assert y8.p.sharding.spec[0] is not None     # sharded along axis 0

    d1 = jax.jit(op1.action)(0.3, y1, op1.data())
    d8 = jax.jit(op8.action)(0.3, y8, op8.data())
    np.testing.assert_allclose(np.asarray(jax.device_get(d8.p)),
                               np.asarray(jax.device_get(d1.p)),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(jax.device_get(d8.sinks)),
                               np.asarray(jax.device_get(d1.sinks)),
                               rtol=1e-5, atol=1e-7)
    # and against the XLA stencil ground truth
    op0 = BoxOperator(b.model, space, dtype=jnp.float32, use_pallas=False)
    d0 = jax.jit(op0.action)(0.3, y1, op0.data())
    np.testing.assert_allclose(np.asarray(jax.device_get(d8.p)),
                               np.asarray(jax.device_get(d0.p)),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(jax.device_get(d8.sinks)),
                               np.asarray(jax.device_get(d0.sinks)),
                               rtol=1e-4, atol=1e-6)


def test_sharded_solve_with_pallas_kernel():
    """Meshed end-to-end box solve with the fused kernel forced on (the
    r1 VERDICT's gap: meshed solves silently fell back to the stencil)."""
    b = pm.models.poisson(2.0)
    mesh = make_mesh(8)
    s = pm.FspSolverMultiSinks(backend="box", odes_type="krylov",
                               mesh=mesh, pallas=True, dtype=jnp.float32)
    s.set_model(b.model)
    s.set_initial_bounds([15])
    s.set_expansion_factors([0.5])
    s.set_initial_distribution(b.x0, b.p0)
    d = s.solve(5.0, 1e-5)
    from pacmensl_tpu.parallel.halo_box import ShardedPallasBoxAction
    assert isinstance(s._operator._pallas, ShardedPallasBoxAction)
    from scipy.stats import poisson as law
    err = np.abs(d.p - law.pmf(d.states[:, 0], 10.0)).sum()
    assert err <= 5e-5, err


def test_sharded_comm_is_surface_not_volume():
    b, cs, space = _setup([63, 15])
    mesh = make_mesh(8)
    op8 = BoxOperator(b.model, space, dtype=jnp.float32, use_pallas=True,
                      mesh=mesh)
    comm = op8._pallas.comm_values_per_matvec()
    assert comm < int(np.prod(space.shape))   # strictly sub-volume


@pytest.mark.medium
def test_overlap_split_matches_monolithic(monkeypatch):
    """Halo/compute overlap (SURVEY M3): the interior+boundary-strip split
    must reproduce the monolithic ppermute->kernel path exactly — the
    structural guarantee that moving the ICI exchange off the interior's
    critical path changes nothing numerically."""
    import os
    import numpy as np
    import jax.numpy as jnp
    import pacmensl_tpu as pm
    from pacmensl_tpu.parallel.mesh import make_mesh
    from pacmensl_tpu.parallel.halo_box import ShardedPallasBoxAction
    from pacmensl_tpu.statespace.box_space import BoxStateSpace
    from pacmensl_tpu.statespace.constraints import ConstraintSet

    b = pm.models.repressilator()
    cs = ConstraintSet(b.constraint, np.array([31, 7, 7, 99, 21, 99]),
                       b.expansion_factors)
    sp = BoxStateSpace(b.model.stoichiometry, cs, b.x0, pad_quanta=[8, 1, 1])
    mesh = make_mesh(8)
    c = jnp.ones(6, jnp.float64)
    bounds = jnp.asarray(cs.bounds)
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.random(sp.shape)) * sp.mask.astype(jnp.float64)
    mask_f = sp.mask.astype(jnp.float64)

    outs = {}
    for ov in ("0", "1"):
        monkeypatch.setenv("PACMENSL_HALO_OVERLAP", ov)
        act = ShardedPallasBoxAction(
            b.model.propensity, b.model.stoichiometry, sp.shape, range(6),
            mesh, dtype=jnp.float64, components=b.constraint.components,
            synth_mask=bool(sp.mask_is_constraint_only))
        assert act.overlap == (ov == "1")
        outs[ov] = act(c, bounds, p, mask_f)
    np.testing.assert_allclose(np.asarray(outs["1"][0]),
                               np.asarray(outs["0"][0]),
                               rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(np.asarray(outs["1"][1]),
                               np.asarray(outs["0"][1]),
                               rtol=1e-12, atol=1e-13)
