"""Benchmark: FSP SpMV throughput on the repressilator benchmark model.

Measures the hot kernel of every FSP solve — the truncated CME operator
action (the SpMV analogue of the reference's FspMatrixConstrained::Action,
``src/Matrix/FspMatrixBase.cpp:36-62``) — on the repressilator model
(reference ``examples/repressilator.cpp``) at a fixed benchmark-sized
state space (~2.1M states, the scale the reference's t_final=10 solve
grows to).  The space is built at *fixed bounds* so the benchmark is
deterministic and cheap to set up: running the full solve→expand loop
first would re-measure compile latency through the device tunnel, not
SpMV throughput.

Baseline: the same operator as a scipy CSR matrix on the host CPU —
structurally the reference's stored-SELL single-rank hot loop (pacmensl
publishes no numbers in-repo; BASELINE.md mandates regeneration).
``vs_baseline`` = our nnz/s divided by the CSR-on-CPU nnz/s.

Timing protocol: matvecs are chained inside one jitted ``lax.fori_loop``
(exactly how the Krylov integrator consumes them) and timed via the
two-point K-slope, because each RPC through the TPU tunnel carries ~25 ms
fixed latency that would otherwise swamp per-matvec numbers.

Prints exactly ONE JSON line on stdout; diagnostics go to stderr.
Env knobs:
  PACMENSL_BENCH_DTYPE=f32|f64   (default f32 — the TPU-native dtype)
  PACMENSL_BENCH_ITERS=K         (default 24; chained loop sizes K, 4K)
  PACMENSL_BENCH_BOUND=B         (default 127; coordinate bound per species)
  PACMENSL_BENCH_SOLVE=1         also run + log the end-to-end FSP solve
                                 (stderr only; off by default — expansion
                                 epochs recompile, which measures the
                                 tunnel's compile latency, not the chip)
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
    from pacmensl_tpu.ops.vecops import FspVector
    from pacmensl_tpu.statespace.box_space import BoxStateSpace
    from pacmensl_tpu.statespace.constraints import ConstraintSet

    dtype = (jnp.float64 if os.environ.get("PACMENSL_BENCH_DTYPE") == "f64"
             else jnp.float32)
    # 160/640 chain: the aligned kernel runs ~60 us/matvec, so the
    # two-point slope needs hundreds of chained matvecs (~30 ms of
    # differential work) to stand clear of the tunnel's multi-ms
    # run-to-run noise — the old 24/96 slope measured noise (observed
    # fraction 1.91 of the stream roofline, a physical impossibility)
    k_lo = int(os.environ.get("PACMENSL_BENCH_ITERS", "160"))
    k_hi = 4 * k_lo
    bound = int(os.environ.get("PACMENSL_BENCH_BOUND", "127"))
    t_all = time.perf_counter()
    log(f"devices: {jax.devices()}  dtype: {dtype.__name__}")

    b = pm.models.repressilator()

    # --- benchmark state space at fixed bounds ---------------------------
    # Hyper-rectangle variant of the reference benchmark (its examples run
    # both custom-constraint and hyper-rectangle stages,
    # examples/repressilator.cpp:120-128).  (bound+1)^3 states.
    bench_bounds = np.array([bound, bound, bound], dtype=np.int64)
    cs = ConstraintSet(None, bench_bounds,
                       np.full(3, 0.2))
    # Fixed-bounds benchmark: no expansion ever happens, so allocating
    # the adaptive solver's 8x expansion headroom would only pad the box
    # (bound 127 -> 141^3 capacity, 34% dead elements in every matvec)
    # and measure padding, not the kernel.  Exact capacity also lands
    # the minor extent on one lane group (128), engaging the kernel's
    # lane-aligned fast path.
    held = os.environ.get("PACMENSL_BOX_HEADROOM")
    os.environ["PACMENSL_BOX_HEADROOM"] = "1"
    try:
        # budgeted path + headroom 1 -> exact fine-rounded extents
        space = BoxStateSpace(b.model.stoichiometry, cs, b.x0,
                              prealloc_budget=2.0e8)
    finally:
        if held is None:
            os.environ.pop("PACMENSL_BOX_HEADROOM", None)
        else:
            os.environ["PACMENSL_BOX_HEADROOM"] = held
    op = BoxOperator(b.model, space, dtype=dtype)
    log(f"space: shape={space.shape} n={space.num_states} "
        f"pallas={op._pallas is not None} "
        f"[setup {time.perf_counter()-t_all:.1f}s]")

    rng = np.random.default_rng(0)
    p = rng.random(space.shape) * np.asarray(jax.device_get(op.mask_f))
    p /= p.sum()
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
        t0 = time.perf_counter()
        jax.device_get(f(y))                        # compile + warm
        log(f"K={K}: compile+run {time.perf_counter()-t0:.1f}s")
        t0 = time.perf_counter()
        jax.device_get(f(y))
        ts[K] = time.perf_counter() - t0
        log(f"K={K}: steady {ts[K]:.3f}s")
    dt = max((ts[k_hi] - ts[k_lo]) / (k_hi - k_lo), 1e-9)
    nnz = op.nnz()
    ours = nnz / dt
    log(f"TPU/box SpMV: n={space.num_states} nnz={nnz} "
        f"{dt*1e6:.1f} us/matvec -> {ours/1e9:.3f} Gnnz/s")

    # --- roofline fraction: measured stream bandwidth vs kernel traffic --
    # The fused kernel's HBM traffic model (pallas_box): synth-mask mode
    # reads p once (+ halo duplication 2H/T in tiled mode) and writes dp
    # once; mask-reading mode reads the mask too.  Compare the achieved
    # bytes/s against a measured x2-copy stream on the same chip.
    # The probe buffers must dwarf VMEM (128 MB on v5e): at the benchmark
    # box size (~11 MB f32) BOTH ping-pong buffers are VMEM-resident and
    # the "stream" measures on-chip bandwidth (observed 1.6-4.8 TB/s),
    # not HBM.  256 MB per buffer forces genuine HBM traffic.  The
    # kernel-traffic model below still uses the BOX size.
    n_elems = int(np.prod(space.shape))
    n_probe = max(n_elems, 1 << 26)

    # Return a SCALAR: fetching the full array back through the device
    # tunnel would measure RPC transfer, not HBM streaming.  Two-point
    # K-slope cancels the fixed dispatch latency like the SpMV timing.
    #
    # The probe is a chained PALLAS COPY kernel over a 256 MB buffer
    # (>> the 128 MB VMEM, forcing genuine HBM traffic): 2*n*itemsize
    # of traffic per step, through the exact same pallas dispatch path
    # as the SpMV kernel, and opaque to XLA so no folding is possible.
    # (History: a linear recurrence probe strength-reduced to ~8.8 TB/s;
    # a nonlinear two-buffer recurrence resisted folding but its
    # loop-carried XLA schedule swung 43.9-287 GB/s run-to-run through
    # the tunnel — useless as a roofline denominator.)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from pacmensl_tpu.ops.pallas_box import is_tpu_device
    PROBE_T = 4096
    rows_probe = n_probe // 128
    rows_probe -= rows_probe % PROBE_T
    x = jnp.zeros((rows_probe, 128), dtype)

    def _copy_kernel(src_ref, dst_ref):
        dst_ref[:] = src_ref[:]

    pcopy = pl.pallas_call(
        _copy_kernel,
        out_shape=jax.ShapeDtypeStruct((rows_probe, 128), dtype),
        in_specs=[pl.BlockSpec((PROBE_T, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((PROBE_T, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        grid=(rows_probe // PROBE_T,),
        interpret=not is_tpu_device(),
    )

    def stream(k, v):
        return lax.fori_loop(0, k, lambda i, a: pcopy(a), v).sum()
    stream_j = jax.jit(stream, static_argnums=0)
    stream_j(k_lo, x).block_until_ready()
    stream_j(k_hi, x).block_until_ready()
    t0 = time.perf_counter()
    stream_j(k_lo, x).block_until_ready()
    t1 = time.perf_counter()
    stream_j(k_hi, x).block_until_ready()
    t2 = time.perf_counter()
    bw = 2.0 * rows_probe * 128 * jnp.dtype(dtype).itemsize * \
        (k_hi - k_lo) / max((t2 - t1) - (t1 - t0), 1e-9)
    # sanity: a v5e datasheet reads ~819 GB/s HBM; a measurement far above
    # means the probe collapsed again and the roofline below is noise
    if bw > 1.3e12:
        log(f"WARNING: stream probe measured {bw/1e9:.0f} GB/s — above "
            "any plausible single-chip HBM rate; roofline suspect")
    kern = getattr(op, "_pallas", None)
    frac = None
    if kern is not None:
        halo = (2.0 * kern.halo_rows / kern.tile_rows
                if kern.grid > 1 else 0.0)
        n_ops = 1 if kern.synth_mask else 2
        traffic = (n_ops * (1.0 + halo) + 1.0) * n_elems * \
            jnp.dtype(dtype).itemsize
        frac = (traffic / bw) / dt
        log(f"stream bandwidth: {bw/1e9:.1f} GB/s; kernel traffic "
            f"{traffic/1e6:.1f} MB/matvec -> roofline {traffic/bw*1e6:.1f} "
            f"us; achieved fraction {frac:.2f}")
        if frac > 1.25:
            log("WARNING: fraction > 1.25 is physically impossible "
                "against a true stream rate — matvec slope under-resolved "
                "or stream probe collapsed; treat with suspicion")

    # --- reference-equivalent baseline: scipy CSR on host CPU ------------
    # Built directly from the box enumeration (vectorized) — same sparsity
    # as the reference's per-reaction SELL assembly (column = index of
    # x - s_r, off-diag value = prop(x - s_r), diag = -sum prop(x)).
    import scipy.sparse as sp
    shape = tuple(int(s) for s in space.shape)
    n = int(np.prod(shape))
    grid = np.indices(shape).reshape(len(shape), -1).T  # [n, N] states
    strides = np.array([int(np.prod(shape[i + 1:]))
                        for i in range(len(shape))], dtype=np.int64)
    stoich = np.asarray(b.model.stoichiometry)
    rows_l, cols_l, vals_l = [], [], []
    diag = np.zeros(n)
    for r in range(stoich.shape[0]):
        rate = np.asarray(jax.device_get(
            b.model.propensity(jnp.asarray(grid), r)), np.float64)
        diag -= rate                                  # outflow from x
        dest = grid + stoich[r]                       # x -> x + s_r
        ok = ((dest >= 0) & (dest <= bench_bounds)).all(axis=1)
        rows_l.append((dest[ok] * strides).sum(axis=1))
        cols_l.append(np.nonzero(ok)[0])
        vals_l.append(rate[ok])
    rows_l.append(np.arange(n))
    cols_l.append(np.arange(n))
    vals_l.append(diag)
    A = sp.csr_matrix((np.concatenate(vals_l),
                       (np.concatenate(rows_l), np.concatenate(cols_l))),
                      shape=(n, n))
    v = rng.random(n)
    A @ v
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        A @ v
    base_dt = (time.perf_counter() - t0) / iters
    base = A.nnz / base_dt
    log(f"CPU/CSR SpMV baseline: nnz={A.nnz} {base_dt*1e6:.1f} us/matvec "
        f"-> {base/1e9:.3f} Gnnz/s")

    # --- optional: end-to-end solve (reference benchmark config) ---------
    if os.environ.get("PACMENSL_BENCH_SOLVE") == "1":
        s = pm.FspSolverMultiSinks(backend="box", odes_type="krylov",
                                   dtype=dtype)
        s.set_model(b.model)
        s.set_constraint_functions(b.constraint)
        s.set_initial_bounds(b.bounds)
        s.set_expansion_factors(b.expansion_factors)
        s.set_initial_distribution(b.x0, b.p0)
        t0 = time.perf_counter()
        d = s.solve(10.0, 1.0e-4)
        log(f"repressilator solve: n_states={d.num_states} "
            f"bounds={d.bounds.tolist()} mass={d.sum():.6f} "
            f"wall={time.perf_counter()-t0:.2f}s")

    log(f"total bench wall: {time.perf_counter()-t_all:.1f}s")
    rec = {
        "metric": "repressilator_spmv_nnz_per_s",
        "value": round(ours, 1),
        "unit": "nnz/s",
        "vs_baseline": round(ours / base, 3),
    }
    if frac is not None:
        # same-session roofline evidence (VERDICT r3 item 6): kernel
        # bytes/s divided by THIS session's measured stream bytes/s
        rec["roofline_fraction"] = round(float(frac), 3)
        rec["stream_gbps"] = round(float(bw) / 1e9, 1)
    print(json.dumps(rec))


def _watchdog(seconds: int):
    """Emit a fallback JSON line and exit if the benchmark wedges.

    The tunneled TPU's remote compile service has been observed to hang
    indefinitely (trivial programs not compiling within minutes); a
    benchmark that never prints is worse than one that reports failure.
    """
    import signal

    def on_alarm(signum, frame):
        log(f"WATCHDOG: bench exceeded {seconds}s (tunnel/compile hang?); "
            "emitting failure record")
        print(json.dumps({
            "metric": "repressilator_spmv_nnz_per_s",
            "value": 0.0,
            "unit": "nnz/s",
            "vs_baseline": 0.0,
        }), flush=True)
        os._exit(3)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(seconds)


if __name__ == "__main__":
    _watchdog(int(os.environ.get("PACMENSL_BENCH_TIMEOUT", "540")))
    main()
