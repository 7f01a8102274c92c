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
# NOTE: no persistent compilation cache here — XLA:CPU executables with
# collectives (the 8-device virtual mesh) deadlock at their rendezvous
# when loaded back from the cache and abort the process after the
# hardcoded 40 s timeout (reproduced deterministically).  pacmensl_tpu's
# config enables the cache only on TPU platforms for the same reason.
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pacmensl_tpu  # noqa: E402,F401  (sets x64 before array creation)

assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8, jax.devices()
