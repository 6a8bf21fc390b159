"""Test configuration: run JAX on CPU with an 8-device virtual mesh.

Mirrors SURVEY.md §4.8: CPU-backed jax with
--xla_force_host_platform_device_count simulates an N-chip mesh so sharding
paths are exercised without TPU hardware.

NOTE: this environment pre-imports jax at interpreter startup, so
JAX_PLATFORMS in os.environ is read too late; we must go through
jax.config.update before any backend initializes.
"""

import os

# Small Pallas blocks: interpret-mode kernel tests then run a single
# grid step instead of 8 (the kernel body is block-size agnostic).
os.environ.setdefault("ARKPLONK_PALLAS_LANES", "128")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# NO persistent compile cache for the suite.  XLA:CPU executable
# (de)serialization segfaults on specific programs in this jaxlib —
# three full-suite runs crashed inside compilation_cache
# put/get_executable_and_time at the same MSM program (solo runs pass
# because an unloaded machine compiles it in <1 s, below the persist
# threshold, so the serializer never runs).  The suite is stable and
# ~10 min without the cache; set ARKPLONK_CACHE=1 to opt back in.
os.environ.setdefault("ARKPLONK_CACHE", "0")
from arkplonk_tpu import perf  # noqa: E402

perf.maybe_enable_compile_cache()
