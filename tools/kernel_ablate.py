"""Ablation timer for the fused Pallas box kernel on the bench shape.

Times the kernel with pieces switched off to locate the bottleneck:
  full      — the production configuration (synth mask, in-kernel sinks)
  nosink    — components=None (no in-kernel sink reductions)
  unitprop  — propensity replaced by a constant (propensity eval cost)
  hbmmask   — mask read from HBM instead of synthesized

Run on the real chip:  python tools/kernel_ablate.py
Env: BOUND (default 140 -> 141^3 box), ITERS (default 32).
"""
import os
import sys
import time

os.environ.setdefault("PACMENSL_TPU_X64", "0")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pacmensl_tpu as pm
from pacmensl_tpu.ops.box_operator import BoxOperator
from pacmensl_tpu.ops.pallas_box import PallasBoxKernel, is_tpu_device
from pacmensl_tpu.statespace.box_space import BoxStateSpace
from pacmensl_tpu.statespace.constraints import ConstraintSet


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_kernel(kern, c, bounds, p, mask, iters):
    """Two-point K-slope through a chained fori_loop (tunnel-latency-proof)."""
    def chain(k, p0):
        def body(_, p_acc):
            dp, _sinks = kern._call(c, bounds, p_acc, mask)
            return dp
        return lax.fori_loop(0, k, body, p0)

    f = jax.jit(chain, static_argnums=0)
    lo, hi = iters, 4 * iters
    f(lo, p).block_until_ready()          # compile lo
    f(hi, p).block_until_ready()          # compile hi
    t0 = time.perf_counter(); f(lo, p).block_until_ready()
    t1 = time.perf_counter(); f(hi, p).block_until_ready()
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (hi - lo)


def main():
    bound = int(os.environ.get("BOUND", "127"))
    iters = int(os.environ.get("ITERS", "160"))
    log(f"device: {jax.devices()[0]}  tpu={is_tpu_device()}")
    b = pm.models.repressilator()
    bounds = np.array([bound] * 3, np.int64)
    cs = ConstraintSet(None, bounds, np.full(3, 0.2))
    # exact-capacity space, same as bench.py (bound 127 -> 128^3,
    # lane-aligned kernel)
    os.environ["PACMENSL_BOX_HEADROOM"] = "1"
    space = BoxStateSpace(b.model.stoichiometry, cs, b.x0,
                          prealloc_budget=2.0e8)
    op = BoxOperator(b.model, space, dtype=jnp.float32)
    n = space.num_states
    nnz = n * 7  # 6 off-diag + diag
    log(f"shape={space.shape} n={n} pallas={op._pallas is not None}")
    if op._pallas is None:
        log("no pallas kernel built; aborting"); return

    base = op._pallas
    key = jax.random.PRNGKey(0)
    p = jax.random.uniform(key, space.shape, jnp.float32)
    mask = space.mask.astype(jnp.float32)
    c = jnp.ones((len(base.reactions),), jnp.float32)
    bnd = jnp.asarray(space.bounds, jnp.int32)

    def build(name, **kw):
        args = dict(
            propensity=b.model.propensity,
            stoichiometry=b.model.stoichiometry,
            shape=space.shape,
            enable_reactions=base.reactions,
            dtype=jnp.float32,
            components=base.components,
            synth_mask=base.synth_mask,
            sink_active=base.sink_active,
        )
        args.update(kw)
        k = PallasBoxKernel(**args)
        ck = jnp.ones((len(k.reactions),), jnp.float32)
        dt = time_kernel(k, ck, bnd, p, mask, iters)
        log(f"{name:10s}: {dt*1e6:9.1f} us/matvec  "
            f"{nnz/dt/1e9:7.1f} Gnnz/s  grid={k.grid} T={k.tile_rows} "
            f"H={k.halo_rows} aligned={k.aligned}")
        return dt

    unit = lambda x, r: jnp.ones_like(x[:, 0])

    build("full")
    build("r1", enable_reactions=[0])
    build("r2", enable_reactions=[0, 1])
    build("nosink", components=None, sink_active=None, synth_mask=False)
    build("unitnosink", propensity=unit, components=None, sink_active=None,
          synth_mask=False)


if __name__ == "__main__":
    main()
