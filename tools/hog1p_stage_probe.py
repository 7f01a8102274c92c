"""Isolate the hog1p t=168.6 post-reorder crash: build the box space /
operator at the failing rung's bounds and run each stage separately.

Stages: space build (device BFS) -> sink-activity sweep -> operator +
one matvec -> 20 BDF steps.  Prints a line per stage so the crashing one
is identifiable from the log tail.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import pacmensl_tpu as pm
from pacmensl_tpu.ops.box_operator import BoxOperator
from pacmensl_tpu.ops.vecops import FspVector
from pacmensl_tpu.statespace.box_space import BoxStateSpace
from pacmensl_tpu.statespace.constraints import ConstraintSet
from pacmensl_tpu.statespace.permute import permute_model, permute_constraints


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    b = pm.models.hog1p_5d()
    B2 = np.array([3, 36, 73, 36, 58, 73, 116])
    order = np.array([2, 3, 0, 1, 4])
    m = permute_model(b.model, order)
    cs = permute_constraints(
        ConstraintSet(b.constraint, B2, b.expansion_factors), order, 5)
    init = b.x0[:, order]
    budget = 8.0e9 / (36 * 4)
    t0 = time.perf_counter()
    sp = BoxStateSpace(m.stoichiometry, cs, init, prealloc_budget=budget,
                       build_on_device=True)
    log(f"STAGE space: n={sp.num_states} shape={sp.shape} "
        f"[{time.perf_counter()-t0:.1f}s]")

    t0 = time.perf_counter()
    op = BoxOperator(m, sp, dtype=jnp.float32)
    log(f"STAGE operator: pallas={op._pallas is not None} "
        f"padded={op.padded_layout} [{time.perf_counter()-t0:.1f}s]")

    rng = np.random.default_rng(0)
    if op.padded_layout:
        p = jnp.asarray(rng.random(op.n_pad), op.dtype)
    else:
        p = jnp.asarray(rng.random(sp.shape), op.dtype)
    y = FspVector(p=p, sinks=jnp.zeros((sp.num_constraints,), op.dtype))
    t0 = time.perf_counter()
    d = jax.jit(op.action)(0.5, y, op.data())
    jax.block_until_ready(d)
    log(f"STAGE matvec: ok [{time.perf_counter()-t0:.1f}s]")

    from pacmensl_tpu.solvers.bdf import BdfSolver
    solver = BdfSolver(op.action, rtol=1e-4, atol=1e-14,
                       dtype=op.dtype, max_steps=20)
    t0 = time.perf_counter()
    res = solver.solve(y, 0.0, 1.0e-3, data=op.data())
    jax.block_until_ready(res.y.p)
    log(f"STAGE bdf20: status={int(res.status)} t={float(res.t):.2e} "
        f"[{time.perf_counter()-t0:.1f}s]")
    log("ALL STAGES OK")


if __name__ == "__main__":
    main()
