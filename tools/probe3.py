"""Probe 3: where does ~1s per commit-bearing round go at 2^12?

Times, steady-state on the tunnel TPU:
  1. empty dispatch + sync            (pure tunnel round-trip)
  2. wire iNTT dispatch (L,5,n)       (round-1 compute alone)
  3. full _msm_fn at n=2^12, P=4      (the commit path alone)
  4. msm sub-stages: digits+sort only; accumulate-loop only
"""
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from arkplonk_tpu import perf
from arkplonk_tpu.curve import host as cv, msm2, g1_jax as g1
from arkplonk_tpu.fields.jaxfield import FR, FQ
from arkplonk_tpu.poly import ntt
from arkplonk_tpu.fields.limb import encode_ints


def timeit(fn, *args, iters=10):
    out = fn(*args)
    perf.sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        perf.sync(fn(*args))
    return (time.perf_counter() - t0) / iters


def main():
    n = 1 << 12
    P = 4
    rng = np.random.default_rng(0)

    # 1. empty dispatch
    x = jnp.zeros((8, 128), jnp.uint32)
    f_empty = jax.jit(lambda x: x + 1)
    print(f"empty dispatch+sync:    {timeit(f_empty, x)*1e3:8.1f} ms",
          flush=True)

    # 2. wire intt
    dd = ntt.get_device_domain(n)
    vals = [int.from_bytes(rng.bytes(31), "little") % cv.R
            for _ in range(1024)]
    arr = FR.to_mont(jnp.asarray(encode_ints(vals, FR.L)))
    stack5 = jnp.tile(arr[:, None, :], (1, 5, n // 1024))
    f_intt = jax.jit(lambda s: ntt.intt(s, dd))
    print(f"intt (L,5,2^12):        {timeit(f_intt, stack5)*1e3:8.1f} ms",
          flush=True)

    # 3. full msm pipeline
    base = [cv.G1.mul(cv.G1_GEN, 3 + i) for i in range(256)]
    pts = (base * (n // 256))[:n]
    m = msm2.PippengerMSM(pts)
    stack = jnp.tile(arr[:, None, :], (1, P, n // 1024))
    c = msm2.pick_window(n)
    W, _ = msm2._window_plan(c)
    print(f"msm plan: c={c} W={W} B={1 << (c-1)}", flush=True)
    t0 = time.time()
    out = m.commit_mont_batch(stack)
    print(f"msm first (compile):    {time.time()-t0:8.1f} s", flush=True)
    t0 = time.time()
    iters = 5
    for _ in range(iters):
        m.commit_mont_batch(stack)
    print(f"msm steady e2e:         {(time.time()-t0)/iters*1e3:8.1f} ms",
          flush=True)

    # 3b. device-only portion (no host decode/recombine)
    fn = msm2._msm_fn(n, P, c)
    print(f"msm device-only:        "
          f"{timeit(fn, stack, m.px, m.py, iters=5)*1e3:8.1f} ms", flush=True)

    # 4. stages
    f_dig = jax.jit(lambda s: msm2._digits(s, n, P, c))
    print(f"digits only:            {timeit(f_dig, stack)*1e3:8.1f} ms",
          flush=True)

    def dig_sort(s):
        bucket, sign = msm2._digits(s, n, P, c)
        return msm2._sort_plan(bucket, sign, 1 << (c - 1))
    f_ds = jax.jit(dig_sort)
    print(f"digits+sort:            {timeit(f_ds, stack)*1e3:8.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
