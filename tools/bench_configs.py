"""Run any of BASELINE.json's five benchmark configs end-to-end.

Each config mirrors its reference driver exactly (file:line cited below);
prints wall, state count, mass, and the per-phase event report — the rows
BASELINE.md's measured-results tables record.

Usage: python tools/bench_configs.py <config> [-repeat N] [common opts]
  configs: repressilator | hog1p | transcr6d | sens_hog1p | stationary_rep
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402
import pacmensl_tpu as pm  # noqa: E402


def _report(tag, wall, d, s):
    print(f"=== {tag}: wall {wall:.2f}s  n_states {d.num_states}  "
          f"bounds {np.asarray(d.bounds).tolist()}  mass {d.sum():.6f}")
    print(s.get_event_log().report(), flush=True)


def run_repressilator(opts):
    """examples/repressilator.cpp:131-133,162-165 (adaptive, custom)."""
    b = pm.models.repressilator()
    s = pm.FspSolverMultiSinks()
    s.set_from_options(opts)
    s.set_model(b.model)
    s.set_constraint_functions(b.constraint)
    s.set_initial_bounds(b.bounds)
    s.set_expansion_factors(b.expansion_factors)
    s.set_initial_distribution(b.x0, b.p0)
    t0 = time.perf_counter()
    d = s.solve(opts.get_float("t_final", 10.0),
                opts.get_float("fsp_tol", 1e-4))
    _report("repressilator", time.perf_counter() - t0, d, s)


def run_hog1p(opts):
    """examples/hog1p.cpp:150-158: t_final=180, tol 1e-4, tv signal."""
    b = pm.models.hog1p_5d()
    s = pm.FspSolverMultiSinks(odes_type="cvode")
    s.set_from_options(opts)
    s.set_model(b.model)
    s.set_constraint_functions(b.constraint)
    s.set_initial_bounds(b.bounds)
    s.set_expansion_factors(b.expansion_factors)
    s.set_initial_distribution(b.x0, b.p0)
    t0 = time.perf_counter()
    d = s.solve(opts.get_float("t_final", 180.0),
                opts.get_float("fsp_tol", 1e-4))
    _report("hog1p_5d", time.perf_counter() - t0, d, s)


def run_transcr6d(opts):
    """examples/transcr_reg_6d.cpp:128-129: t_final=300, tol 1e-4."""
    b = pm.models.transcription_regulation_6d()
    s = pm.FspSolverMultiSinks(odes_type="cvode")
    s.set_from_options(opts)
    s.set_model(b.model)
    s.set_initial_bounds(b.bounds)
    s.set_expansion_factors(b.expansion_factors)
    s.set_initial_distribution(b.x0, b.p0)
    t0 = time.perf_counter()
    d = s.solve(opts.get_float("t_final", 300.0),
                opts.get_float("fsp_tol", 1e-4))
    _report("transcr_reg_6d", time.perf_counter() - t0, d, s)


def run_sens_hog1p(opts):
    """BASELINE.json config 4: forward sensitivity on hog1p (trans,
    gamma); same t_final=180 / tol 1e-4 protocol as the plain solve
    (examples/hog1p.cpp:150-158).  Default = the honest 5-species
    model; pass -model3d for the round-4 3-species substitution."""
    b = (pm.models.hog1p_3d_sens() if opts.has("model3d")
         else pm.models.hog1p_5d_sens())
    s = pm.SensFspSolverMultiSinks(odes_type="cvode")
    s.set_from_options(opts)
    s.set_model(b.model)
    s.set_constraint_functions(b.constraint)
    s.set_initial_bounds(b.bounds)
    s.set_expansion_factors(b.expansion_factors)
    s.set_initial_distribution(b.x0, b.p0)
    t0 = time.perf_counter()
    d = s.solve(opts.get_float("t_final", 180.0),
                opts.get_float("fsp_tol", 1e-4))
    wall = time.perf_counter() - t0
    _report("sens_hog1p", wall, d, s)
    for j in range(d.num_parameters):
        print(f"  dP/dtheta_{j} sum = {d.dp[j].sum():+.3e}")


def run_stationary_rep(opts):
    """BASELINE.json config 5: stationary FSP on the repressilator."""
    b = pm.models.repressilator()
    s = pm.StationaryFspSolverMultiSinks()
    s.set_from_options(opts)
    s.set_model(b.model)
    s.set_constraint_functions(b.constraint)
    s.set_initial_bounds(b.bounds)
    s.set_expansion_factors(b.expansion_factors)
    s.set_initial_distribution(b.x0, b.p0)
    t0 = time.perf_counter()
    d = s.solve(opts.get_float("sfsp_tol", 1e-6))
    _report("stationary_repressilator", time.perf_counter() - t0, d, s)


CONFIGS = {
    "repressilator": run_repressilator,
    "hog1p": run_hog1p,
    "transcr6d": run_transcr6d,
    "sens_hog1p": run_sens_hog1p,
    "stationary_rep": run_stationary_rep,
}


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "repressilator"
    opts = pm.Options.from_argv(sys.argv[2:])
    repeat = opts.get_int("repeat", 1) if opts.has("repeat") else 1
    for i in range(repeat):
        print(f"--- {name} run {i + 1}/{repeat}")
        CONFIGS[name](opts)


if __name__ == "__main__":
    main()
