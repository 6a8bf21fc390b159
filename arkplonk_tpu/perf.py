"""Performance infrastructure: compile cache + honest device timing.

Two sandbox quirks this module exists to neutralize (both verified by
measurement in round 2):

1. `jax.block_until_ready` on the tunneled TPU backend returns at
   *dispatch*, not execution — every round-1 throughput number measured
   with it was inflated by orders of magnitude (Fr mont-mul reported
   1.27 G/s; honest readback-timed rate is ~10x lower).  `sync()` forces
   execution by reading one element back to host.

2. XLA compiles are served remotely (~2-4 min even for trivial graphs),
   but the persistent compile cache WORKS — for the TPU backend
   (measured 207 s -> 23 s round 2; 195 s init + compile -> 0.2 s round
   3) AND for the CPU test mesh (1.23 s -> 0.02 s across processes,
   re-verified round 3; the round-2 "machine-feature validation"
   thrashing no longer reproduces).  Every entry point enables it, so
   the driver's end-of-round bench/dryrun runs hit entries pre-warmed
   during the build session.
"""

from __future__ import annotations

import os
import time

_CACHE_DIR = os.environ.get(
    "ARKPLONK_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))


def enable_compile_cache(path: str | None = None) -> None:
    import jax

    path = path or _CACHE_DIR
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # persist anything that took >=1s to compile: tunnel-served TPU
    # compiles cost seconds to minutes each, and the big CPU mesh
    # programs (dryrun/tests) cost minutes; sub-second entries are not
    # worth the serialization/disk churn (hundreds per test run).
    # ARKPLONK_CACHE_MIN_S overrides (the dryrun entry point persists
    # aggressively: its wall budget is dominated by many ~0.5s compiles)
    min_s = float(os.environ.get("ARKPLONK_CACHE_MIN_S", "1.0"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_s)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    # a cache problem must never break a prove
    jax.config.update("jax_raise_persistent_cache_errors", False)


def maybe_enable_compile_cache() -> None:
    """Enable the cache unless disabled (ARKPLONK_CACHE=0)."""
    if os.environ.get("ARKPLONK_CACHE", "1") in ("0", "false", ""):
        return
    try:
        enable_compile_cache()
    except Exception:
        pass


def sync(tree) -> None:
    """Force full device execution of every leaf (block_until_ready is
    dispatch-only on the tunneled backend; a host readback is the only
    reliable barrier)."""
    import jax

    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "ndim"):
            idx = (0,) * leaf.ndim
            jax.device_get(leaf[idx])


def timeit(fn, *args, iters: int = 10, warmup: int = 2) -> float:
    """Median-free mean seconds per call with a forced sync each call."""
    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        sync(fn(*args))
    return (time.perf_counter() - t0) / iters


def timeit_chain(fn, a, b, iters: int = 10, warmup: int = 2) -> float:
    """Chained variant (output feeds back as second arg): defeats any
    backend-side dedup of identical executions; one sync at the end."""
    out = b
    for _ in range(warmup):
        out = fn(a, out)
    sync(out)
    t0 = time.perf_counter()
    out0 = out
    for _ in range(iters):
        out = fn(a, out)
    sync(out)
    del out0
    return (time.perf_counter() - t0) / iters
