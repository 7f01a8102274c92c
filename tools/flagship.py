"""Flagship benchmark: repressilator adaptive-custom stage only.

Runs the reference's headline configuration (examples/repressilator.cpp
stage 1: custom product constraints, t_final=10, fsp_tol=1e-4) once and
prints the wall time, the phase report, and per-epoch timing when
-epoch_trace is set.  Used to chase the <100 s target of the round-3
verdict without paying the other three stages of the full example.

Usage: python tools/flagship.py [-t_final 10] [-fsp_tol 1e-4] [-repeat N]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402
import pacmensl_tpu as pm  # noqa: E402


def run_once(opts, t_final, fsp_tol):
    b = pm.models.repressilator()
    s = pm.FspSolverMultiSinks()
    s.set_from_options(opts)
    s.set_model(b.model)
    s.set_constraint_functions(b.constraint)
    s.set_initial_bounds(b.bounds)
    s.set_expansion_factors(b.expansion_factors)
    s.set_initial_distribution(b.x0, b.p0)
    t0 = time.perf_counter()
    d = s.solve(t_final, fsp_tol)
    wall = time.perf_counter() - t0
    print(f"=== wall {wall:.2f}s  n_states {d.num_states}  "
          f"bounds {d.bounds.tolist()}  mass {d.sum():.6f}")
    print(s.get_event_log().report())
    return wall, d


def main(argv=None):
    opts = pm.Options.from_argv(argv)
    t_final = opts.get_float("t_final", 10.0)
    fsp_tol = opts.get_float("fsp_tol", 1.0e-4)
    repeat = opts.get_int("repeat", 1) if opts.has("repeat") else 1
    walls = []
    for i in range(repeat):
        print(f"--- run {i + 1}/{repeat}")
        wall, _ = run_once(opts, t_final, fsp_tol)
        walls.append(wall)
    print("walls:", " ".join(f"{w:.2f}" for w in walls))


if __name__ == "__main__":
    main()
