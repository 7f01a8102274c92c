"""6-species transcription-regulation benchmark driver.

Mirror of the reference ``examples/transcr_reg_6d.cpp``: cell-volume
growth makes three reactions time-varying; dynamic expansion +
repartitioning from small initial bounds.

Usage:
    python examples/transcr_reg_6d.py [-t_final 300] [-fsp_tol 1e-4]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import pacmensl_tpu as pm


def main(argv=None):
    opts = pm.Options.from_argv(argv)
    t_final = opts.get_float("t_final", 300.0)
    fsp_tol = opts.get_float("fsp_tol", 1.0e-4)
    out_dir = opts.get("out_dir", "results")

    b = pm.models.transcription_regulation_6d()
    s = pm.FspSolverMultiSinks(odes_type="cvode")
    s.set_from_options(opts)
    s.set_model(b.model)
    s.set_initial_bounds(b.bounds)
    s.set_expansion_factors(b.expansion_factors)
    s.set_initial_distribution(b.x0, b.p0)

    t0 = time.perf_counter()
    d = s.solve(t_final, fsp_tol)
    wall = time.perf_counter() - t0
    print(f"transcr_reg_6d: wall {wall:.2f}s  n_states {d.num_states}  "
          f"bounds {d.bounds.tolist()}  mass {d.sum():.6f}")
    print(s.get_event_log().report())
    os.makedirs(out_dir, exist_ok=True)
    for i in range(6):
        np.savetxt(os.path.join(out_dir, f"transcr6d_marginal_{i}.csv"),
                   d.marginal(i), delimiter=",")


if __name__ == "__main__":
    main()
