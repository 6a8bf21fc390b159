"""Microbenchmarks for the hot field/curve kernels on the real chip.

Usage: python tools/micro_bench.py [fr_mul fq_mul jac_add jac_add_fused ...]
Prints one line per metric: name, ops/s, time per call.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from arkplonk_tpu.fields.jaxfield import FR, FQ


def timeit(fn, *args, iters=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return dt


def timeit_chain(fn, a, b, iters=20, warmup=2):
    """Data-dependent chain: each call consumes the previous output, so
    no backend can dedupe/cache identical executions."""
    out = b
    for _ in range(warmup):
        out = fn(a, out)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(a, out)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def rand_fr(n, seed=0):
    rng = np.random.default_rng(seed)
    vals = [int.from_bytes(rng.bytes(31), "little") % FR.modulus
            for _ in range(min(n, 1024))]
    arr = FR.encode(vals)
    reps = (n + arr.shape[1] - 1) // arr.shape[1]
    return jnp.asarray(np.tile(arr, (1, reps))[:, :n])


def rand_fq(n, seed=0):
    rng = np.random.default_rng(seed)
    vals = [int.from_bytes(rng.bytes(47), "little") % FQ.modulus
            for _ in range(min(n, 1024))]
    arr = FQ.encode(vals)
    reps = (n + arr.shape[1] - 1) // arr.shape[1]
    return jnp.asarray(np.tile(arr, (1, reps))[:, :n])


def rand_points(n, seed=0):
    """Random multiples of the generator, on device (Jacobian, non-normalized ok)."""
    from arkplonk_tpu.curve import host as cv
    from arkplonk_tpu.curve import g1_jax as g1
    rng = np.random.default_rng(seed)
    base = [cv.G1.mul(cv.G1_GEN, int.from_bytes(rng.bytes(31), "little"))
            for _ in range(min(n, 256))]
    pts = (base * ((n + len(base) - 1) // len(base)))[:n]
    return g1.encode_points(pts)


def main():
    which = set(sys.argv[1:]) or {"fr_mul", "fq_mul", "jac_add"}
    N = 1 << 20

    if "fr_mul" in which:
        a, b = rand_fr(N, 1), rand_fr(N, 2)
        f = jax.jit(FR.mont_mul)
        dt = timeit_chain(f, a, b)
        print(f"fr_mul      n={N}  {N/dt/1e6:9.1f} M/s   {dt*1e3:8.3f} ms/call")

    if "fq_mul" in which:
        a, b = rand_fq(N, 1), rand_fq(N, 2)
        f = jax.jit(FQ.mont_mul)
        dt = timeit_chain(f, a, b)
        print(f"fq_mul      n={N}  {N/dt/1e6:9.1f} M/s   {dt*1e3:8.3f} ms/call")

    if "jac_add" in which:
        n = 1 << 16
        from arkplonk_tpu.curve import g1_jax as g1
        p = rand_points(n, 1)
        q = rand_points(n, 2)
        f = jax.jit(lambda p, q: g1._jac_add_jnp(p, q))
        t0 = time.perf_counter()
        out = f(p, q)
        jax.block_until_ready(out)
        print(f"jac_add jnp compile: {time.perf_counter()-t0:.1f}s")
        dt = timeit_chain(f, p, q, iters=10)
        print(f"jac_add_jnp n={n}  {n/dt/1e6:9.2f} M/s   {dt*1e3:8.3f} ms/call")


if __name__ == "__main__":
    main()
