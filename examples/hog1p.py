"""hog1p 5-species MAPK benchmark driver.

Mirror of the reference ``examples/hog1p.cpp``: time-varying gene
activation signal, t_final = 180 s, fsp_tol = 1e-4, custom constraints
(with hyper-rectangle variant), marginal + per-step performance CSVs.

Usage:
    python examples/hog1p.py [-fsp_odes_type cvode|petsc|krylov]
        [-t_final 180] [-fsp_tol 1e-4] [-hyperrec] [-out_dir results]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import pacmensl_tpu as pm


def main(argv=None):
    opts = pm.Options.from_argv(argv)
    t_final = opts.get_float("t_final", 180.0)
    fsp_tol = opts.get_float("fsp_tol", 1.0e-4)
    out_dir = opts.get("out_dir", "results")
    hyperrec = opts.get_bool("hyperrec", False)

    b = pm.models.hog1p_5d()
    s = pm.FspSolverMultiSinks(odes_type="cvode")   # tv model: BDF default
    s.set_from_options(opts)
    s.set_model(b.model)
    if hyperrec:
        s.set_initial_bounds(b.bounds_hyperrec)
        s.set_expansion_factors(b.expansion_factors_hyperrec)
    else:
        s.set_constraint_functions(b.constraint)
        s.set_initial_bounds(b.bounds)
        s.set_expansion_factors(b.expansion_factors)
    s.set_initial_distribution(b.x0, b.p0)

    t0 = time.perf_counter()
    d = s.solve(t_final, fsp_tol)
    wall = time.perf_counter() - t0
    print(f"hog1p: wall {wall:.2f}s  n_states {d.num_states}  "
          f"bounds {d.bounds.tolist()}  mass {d.sum():.6f}")
    print(s.get_event_log().report())

    os.makedirs(out_dir, exist_ok=True)
    for i in range(5):
        np.savetxt(os.path.join(out_dir, f"hog1p_marginal_{i}.csv"),
                   d.marginal(i), delimiter=",")
    tr = s.step_trace
    np.savetxt(os.path.join(out_dir, "hog1p_perf.csv"),
               np.column_stack([tr.model_time, tr.step_h, tr.aux,
                                tr.n_eqs, tr.wall_time]),
               delimiter=",",
               header="model_time,step_h,m_or_order,n_eqs,epoch_wall")


if __name__ == "__main__":
    main()
