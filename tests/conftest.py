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

# Persistent compile cache, in a CPU-only directory separate from the
# TPU entries (.jax_cache).  Two concurrent suite/dryrun processes once
# interleaved writes in the shared dir and produced an entry whose
# DESERIALIZATION segfaulted every later full-suite run (crash inside
# compilation_cache.get_executable_and_time) — keep test-cache writers
# isolated, and wipe this dir if a load ever crashes again.
# ARKPLONK_CACHE=0 opts out.
os.environ.setdefault(
    "ARKPLONK_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_cpu"))
from arkplonk_tpu import perf  # noqa: E402

perf.maybe_enable_compile_cache()
