"""Multi-chip scaling sweep.

Mirror of the reference ``submit_scalability_multi_nodes.sh`` (1-32 MPI
ranks x {Block, Graph} partitioning on the repressilator): runs the
repressilator SpMV benchmark and a short FSP solve over increasing mesh
sizes and reports throughput + parallel efficiency.

On real hardware this needs a multi-chip slice; for a functional check it
runs on virtual CPU devices:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    JAX_PLATFORMS=cpu python examples/scaling_sweep.py -max_devices 8
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(argv=None):
    import jax
    import jax.numpy as jnp
    import pacmensl_tpu as pm
    from pacmensl_tpu.parallel.mesh import make_mesh, shard_fsp_vector
    from pacmensl_tpu.ops.box_operator import BoxOperator
    from pacmensl_tpu.ops.vecops import FspVector
    from pacmensl_tpu.statespace.box_space import BoxStateSpace
    from pacmensl_tpu.statespace.constraints import ConstraintSet

    opts = pm.Options.from_argv(argv)
    max_dev = opts.get_int("max_devices", len(jax.devices()))
    iters = opts.get_int("iters", 100)

    b = pm.models.repressilator()
    # a grown benchmark space; pad the big axis for divisibility
    bounds = np.array([127, 15, 15, 44 * 16, 4 * 16, 44 * 16])
    cs = ConstraintSet(b.constraint, bounds)
    results = {}
    n = 1
    while n <= max_dev:
        space = BoxStateSpace(b.model.stoichiometry, cs, b.x0,
                              pad_quanta=[max_dev, 1, 1])
        op = BoxOperator(b.model, space)
        rng = np.random.default_rng(0)
        p = rng.random(space.shape) * np.asarray(jax.device_get(op.mask_f))
        y = FspVector(p=jnp.asarray(p),
                      sinks=jnp.zeros(space.num_constraints))
        if n > 1:
            y = shard_fsp_vector(y, make_mesh(n))
        act = jax.jit(op.action)
        out = act(0.0, y)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = act(0.0, out)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        thr = op.nnz() / dt
        results[n] = thr
        eff = thr / (results[1] * n) if 1 in results else 1.0
        print(f"devices={n:2d}  {dt*1e6:9.1f} us/matvec  "
              f"{thr/1e9:8.3f} Gnnz/s  efficiency={eff:6.1%}")
        n *= 2


if __name__ == "__main__":
    main()
