"""Benchmark: FSP SpMV throughput on the repressilator benchmark model.

Measures the hot kernel of every FSP solve — the truncated CME operator
action (the SpMV analogue of the reference's FspMatrixConstrained::Action)
— on the repressilator model at its grown benchmark state space
(reference examples/repressilator.cpp: t_final=10, fsp_tol=1e-4).

Baseline: the same operator as per-reaction scipy CSR matrices on the host
CPU — structurally the reference's stored-SELL single-rank hot loop
(pacmensl publishes no numbers in-repo; BASELINE.md mandates regeneration).
``vs_baseline`` = our nnz/s divided by the CSR-on-CPU nnz/s.

Timing protocol: matvecs are chained inside one jitted ``lax.fori_loop``
(exactly how the Krylov integrator consumes them) and timed via the
two-point K-slope, because each RPC through the TPU tunnel carries ~25 ms
fixed latency that would otherwise swamp per-matvec numbers.

Prints exactly ONE JSON line on stdout; diagnostics go to stderr.
Env knobs: PACMENSL_BENCH_DTYPE=f32|f64 (default f32 — the TPU-native
dtype; the reference's f64 numerics remain available for CPU parity),
PACMENSL_BENCH_ITERS.
"""
import json
import os
import sys
import time

os.environ.setdefault("PACMENSL_TPU_X64",
                      "1" if os.environ.get("PACMENSL_BENCH_DTYPE") == "f64"
                      else "0")

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    import pacmensl_tpu as pm
    from pacmensl_tpu.ops.box_operator import BoxOperator
    from pacmensl_tpu.ops.ell_operator import EllOperator
    from pacmensl_tpu.ops.vecops import FspVector
    from pacmensl_tpu.statespace.box_space import BoxStateSpace
    from pacmensl_tpu.statespace.state_set import StateSet
    from pacmensl_tpu.statespace.constraints import ConstraintSet

    dtype = (jnp.float64 if os.environ.get("PACMENSL_BENCH_DTYPE") == "f64"
             else jnp.float32)
    k_lo = int(os.environ.get("PACMENSL_BENCH_ITERS", "40"))
    k_hi = 4 * k_lo
    log(f"devices: {jax.devices()}  dtype: {dtype.__name__}")

    b = pm.models.repressilator()

    # --- 1) end-to-end FSP solve (reference benchmark config) ------------
    def run_solve():
        s = pm.FspSolverMultiSinks(backend="box", odes_type="krylov",
                                   dtype=dtype)
        s.set_model(b.model)
        s.set_constraint_functions(b.constraint)
        s.set_initial_bounds(b.bounds)
        s.set_expansion_factors(b.expansion_factors)
        s.set_initial_distribution(b.x0, b.p0)
        t0 = time.perf_counter()
        d = s.solve(10.0, 1.0e-4)
        return d, time.perf_counter() - t0

    d, wall_cold = run_solve()
    d, wall_warm = run_solve()      # compile-cached
    log(f"repressilator solve: n_states={d.num_states} "
        f"bounds={d.bounds.tolist()} mass={d.sum():.6f} "
        f"wall cold={wall_cold:.2f}s warm={wall_warm:.2f}s")

    # --- 2) SpMV throughput at the final state space ---------------------
    cs = ConstraintSet(b.constraint, d.bounds, b.expansion_factors)
    space = BoxStateSpace(b.model.stoichiometry, cs, b.x0)
    op = BoxOperator(b.model, space, dtype=dtype)
    log(f"pallas kernel: {op._pallas is not None}")
    rng = np.random.default_rng(0)
    p = rng.random(space.shape) * np.asarray(jax.device_get(op.mask_f))
    y = FspVector(p=jnp.asarray(p, dtype),
                  sinks=jnp.zeros((space.num_constraints,), dtype))
    data = op.data()

    def chained(K):
        @jax.jit
        def run(y):
            out = lax.fori_loop(0, K,
                                lambda i, v: op.action(0.0, v, data), y)
            return out.p.sum() + out.sinks.sum()
        return run

    ts = {}
    for K in (k_lo, k_hi):
        f = chained(K)
        jax.device_get(f(y))                        # compile + warm
        t0 = time.perf_counter()
        jax.device_get(f(y))
        ts[K] = time.perf_counter() - t0
    dt = max((ts[k_hi] - ts[k_lo]) / (k_hi - k_lo), 1e-9)
    nnz = op.nnz()
    ours = nnz / dt
    log(f"TPU/box SpMV: n={space.num_states} nnz={nnz} "
        f"{dt*1e6:.1f} us/matvec -> {ours/1e9:.3f} Gnnz/s")

    # --- 3) reference-equivalent baseline: scipy CSR on host CPU ---------
    import scipy.sparse as sp
    ss = StateSet(b.model.stoichiometry, cs, init_states=b.x0)
    ss.expand()
    eop = EllOperator(b.model, ss, dtype=jnp.float64)
    src = np.asarray(jax.device_get(eop.src_idx))
    off = np.asarray(jax.device_get(eop.off_val))
    dia = np.asarray(jax.device_get(eop.diag_val))
    n = ss.num_states
    rows_l, cols_l, vals_l = [], [], []
    for k in range(src.shape[0]):
        ok = off[k, :n] != 0
        rows_l.append(np.nonzero(ok)[0])
        cols_l.append(src[k, :n][ok])
        vals_l.append(off[k, :n][ok])
        rows_l.append(np.arange(n))
        cols_l.append(np.arange(n))
        vals_l.append(-dia[k, :n])
    A = sp.csr_matrix((np.concatenate(vals_l),
                       (np.concatenate(rows_l), np.concatenate(cols_l))),
                      shape=(n, n))
    v = rng.random(n)
    A @ v
    iters = max(k_lo, 10)
    t0 = time.perf_counter()
    for _ in range(iters):
        v2 = A @ v
    base_dt = (time.perf_counter() - t0) / iters
    base = A.nnz / base_dt
    log(f"CPU/CSR SpMV baseline: nnz={A.nnz} {base_dt*1e6:.1f} us/matvec "
        f"-> {base/1e9:.3f} Gnnz/s")

    print(json.dumps({
        "metric": "repressilator_spmv_nnz_per_s",
        "value": round(ours, 1),
        "unit": "nnz/s",
        "vs_baseline": round(ours / base, 3),
    }))


if __name__ == "__main__":
    main()
