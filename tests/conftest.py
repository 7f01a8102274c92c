"""Test configuration: run every test on a virtual 8-device CPU mesh.

Multi-chip behavior is validated the way the reference validates MPI
behavior — by actually running on multiple (virtual) devices — rather than
by mocking (SURVEY.md §4 takeaway 4).

The environment may pre-import jax with a TPU platform plugin (sitecustomize)
before this file runs, so forcing CPU requires updating jax.config, not just
the environment variables.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: expansion epochs re-jit per shape; cache
# makes suite re-runs and cross-test shape reuse fast.
jax.config.update("jax_compilation_cache_dir", "/tmp/pacmensl_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pacmensl_tpu  # noqa: E402,F401  (sets x64 before array creation)

assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8, jax.devices()
