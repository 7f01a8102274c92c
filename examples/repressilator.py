"""Repressilator benchmark driver.

Mirror of the reference ``examples/repressilator.cpp``: solves the
3-species repressilator CME to t_final = 10 with fsp_tol = 1e-4 under four
configurations (adaptive / fixed final bounds x custom / hyper-rectangle
constraints), reports per-phase timings (the reference's PETSc log stages)
and dumps the final marginal distributions to CSV.

Usage:
    python examples/repressilator.py [-fsp_verbosity 1] [-fsp_odes_type
    krylov|cvode|petsc] [-t_final 10] [-fsp_tol 1e-4] [-out_dir results]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import pacmensl_tpu as pm


def run_stage(name, bundle, constraint, bounds, factors, opts, t_final,
              fsp_tol, out_dir):
    s = pm.FspSolverMultiSinks()
    s.set_from_options(opts)
    s.set_model(bundle.model)
    if constraint is not None:
        s.set_constraint_functions(constraint)
    s.set_initial_bounds(bounds)
    s.set_expansion_factors(factors)
    s.set_initial_distribution(bundle.x0, bundle.p0)
    t0 = time.perf_counter()
    d = s.solve(t_final, fsp_tol)
    wall = time.perf_counter() - t0
    print(f"--- stage {name}: wall {wall:.2f}s  n_states {d.num_states}  "
          f"bounds {d.bounds.tolist()}  mass {d.sum():.6f}")
    print(s.get_event_log().report())
    os.makedirs(out_dir, exist_ok=True)
    for i in range(bundle.model.num_species):
        np.savetxt(os.path.join(
            out_dir, f"repressilator_marginal_{i}_{name}.csv"),
            d.marginal(i), delimiter=",")
    # per-ODE-step trace CSV (reference FiniteProblemSolverPerfInfo dump)
    tr = s.step_trace
    np.savetxt(os.path.join(out_dir, f"repressilator_perf_{name}.csv"),
               np.column_stack([tr.model_time, tr.step_h, tr.aux,
                                tr.n_eqs, tr.wall_time]),
               delimiter=",",
               header="model_time,step_h,m_or_order,n_eqs,epoch_wall")
    return d, wall


def main(argv=None):
    opts = pm.Options.from_argv(argv)
    t_final = opts.get_float("t_final", 10.0)
    fsp_tol = opts.get_float("fsp_tol", 1.0e-4)
    out_dir = opts.get("out_dir", "results")
    b = pm.models.repressilator()

    # Stage 1: adaptive with custom constraints
    d_c, _ = run_stage("adaptive_custom", b, b.constraint, b.bounds,
                       b.expansion_factors, opts, t_final, fsp_tol, out_dir)
    # Stage 2: adaptive with default hyper-rectangle constraints
    d_h, _ = run_stage("adaptive_hyperrec", b, None, b.bounds_hyperrec,
                       b.expansion_factors_hyperrec, opts, t_final,
                       fsp_tol, out_dir)
    # Stage 3+4: fixed-shape solves at the FINAL bounds the adaptive
    # stages reached (reference repressilator.cpp:186-195 reuses
    # GetShapeBounds() of the adaptive solve; the space is then already
    # large enough, so no expansion occurs)
    run_stage("fixed_custom", b, b.constraint, d_c.bounds,
              b.expansion_factors, opts, t_final, fsp_tol, out_dir)
    run_stage("fixed_hyperrec", b, None, d_h.bounds,
              b.expansion_factors_hyperrec, opts, t_final, fsp_tol,
              out_dir)


if __name__ == "__main__":
    main()
