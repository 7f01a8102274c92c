"""Global configuration for pacmensl_tpu.

The reference library (pacmensl) is double-precision throughout (PETSc
``PetscReal`` = f64).  On TPU, float64 is software-emulated and slow, so the
framework is dtype-parametric: every solver object takes a ``dtype`` and the
global default can be steered with the ``PACMENSL_TPU_X64`` environment
variable.  When the variable is unset the default is **platform-aware**:
x64 on CPU/GPU (matching the reference numerics) and f32 on TPU (the
hardware-native dtype; emulated f64 there would silently cost ~10x).

This module must be imported before any JAX arrays are created, because
``jax_enable_x64`` has to be set at import time.
"""
from __future__ import annotations

import os

import jax


def _default_platform_is_tpu() -> bool:
    """Platform probe that does NOT initialize the XLA backend when an
    explicit platform is configured.  Initializing here would break
    multi-host runs: ``jax.distributed.initialize`` must run before any
    backend-initializing call, and this module executes at package import
    (the reference's PACMENSLInit-before-everything has the same contract,
    Sys.cpp:31-63).  'axon' is the tunneled-TPU plugin platform."""
    plats = jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", "")
    if plats:
        first = plats.split(",")[0].strip().lower()
        return "tpu" in first or first == "axon"
    try:
        d = jax.devices()[0]
        return d.platform == "tpu" or "tpu" in str(d.device_kind).lower()
    except Exception:
        return False


# Exact-f32 matmuls.  TPU MXU contractions default to bfloat16 passes
# (~1e-3 relative error) — fine for neural nets, poison for probability
# transport: observed on-chip as noise-level mass appearing at far states
# whose boundary sink flux then drives runaway FSP expansion (bounds
# inflating 1000x past the true support).  The hot stencil/gather paths
# use no large matmuls, so "highest" costs only the small Hessenberg
# expm / basis-lincomb contractions a few extra MXU passes.
jax.config.update("jax_default_matmul_precision", "highest")

_x64_env = os.environ.get("PACMENSL_TPU_X64")
if _x64_env is None:
    _X64 = not _default_platform_is_tpu()
else:
    _X64 = _x64_env not in ("0", "false", "False")
if _X64:
    jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: FSP solves re-jit on capacity growth and
# across solver instances; identical HLO (operator data is passed as jit
# arguments, not baked constants) hits this cache instead of recompiling.
# Compiles through the TPU tunnel cost tens of seconds, so this is load-
# bearing for solve latency, not just a convenience.
#
# TPU ONLY.  XLA:CPU executables with collectives (multi-device virtual
# meshes) deadlock when loaded back from the persistent cache: all
# participants stall at a collective rendezvous and the hardcoded 40 s
# termination timeout aborts the process.  Reproduced deterministically —
# fresh compile passes, cache hit aborts — so the cache is enabled only
# when the default platform is a TPU (where it is also the only place it
# pays for itself).
_CACHE_DIR = os.environ.get("PACMENSL_TPU_CACHE_DIR",
                            "/tmp/pacmensl_jax_cache")
if _CACHE_DIR and _default_platform_is_tpu():
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402  (after x64 flag)

#: Default floating point dtype for probability vectors and operators.
DEFAULT_DTYPE = jnp.float64 if _X64 else jnp.float32

#: Default integer dtype for state coordinates.
STATE_DTYPE = jnp.int32

#: Default integer dtype for linearized state keys (mixed-radix indices).
KEY_DTYPE = jnp.int64 if _X64 else jnp.int32


def default_dtype():
    return DEFAULT_DTYPE


def x64_enabled() -> bool:
    return _X64
