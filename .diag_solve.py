import os, sys, time
os.environ.setdefault("PACMENSL_TPU_X64", "0")
import jax, jax.numpy as jnp
import pacmensl_tpu as pm
print("devices:", jax.devices(), file=sys.stderr, flush=True)
b = pm.models.repressilator()
s = pm.FspSolverMultiSinks(backend="box", odes_type="krylov", dtype=jnp.float32)
s.set_model(b.model)
s.set_constraint_functions(b.constraint)
s.set_initial_bounds(b.bounds)
s.set_expansion_factors(b.expansion_factors)
s.set_initial_distribution(b.x0, b.p0)
s.set_verbosity(2)
t0 = time.perf_counter()
d = s.solve(10.0, 1.0e-4)
print(f"DONE n={d.num_states} mass={d.sum():.6f} wall={time.perf_counter()-t0:.1f}s", flush=True)
print(s.reduce_component_timing(), flush=True)
