"""Microprobes for the Pallas kernel cost model on the real chip.

Measures, per element:
  - raw u32 multiply throughput (the L^2 schoolbook floor)
  - raw f32 multiply throughput (alternative product path)
  - the full Fq/Fr Montgomery kernels
  - the fused madd / jadd point kernels
"""
import sys
import time
import functools

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from arkplonk_tpu import perf
from arkplonk_tpu.fields import pallas2
from arkplonk_tpu.fields.jaxfield import FQ, FR

S, K = pallas2.S_SUB, pallas2.LANES
L = 24


def mk_mul_kernel(reps, dtype):
    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[...]
        b = b_ref[...]
        acc = jnp.zeros_like(a[0:1])
        # one (1,S,K) vreg mul + one consume op per rep (so Mosaic
        # cannot DCE any product)
        for i in range(reps):
            p = a[i % L:i % L + 1] * b[(i * 7 + 3) % L:(i * 7 + 3) % L + 1]
            acc = (acc ^ p) if dtype == jnp.uint32 else acc + p
        o_ref[...] = acc

    @jax.jit
    def call(a, b):
        T = a.shape[2]
        spec = pl.BlockSpec((L, S, K), lambda i: (0, 0, i),
                            memory_space=pltpu.VMEM)
        ospec = pl.BlockSpec((1, S, K), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, S, T), dtype),
            grid=(T // K,),
            in_specs=[spec, spec],
            out_specs=ospec,
        )(a, b)

    return call


def bench(label, fn, args, per_elem_ops, n, iters=10):
    out = fn(*args)
    perf.sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        perf.sync(fn(*args))
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:24s} {dt*1e3:8.2f} ms  "
          f"{n/dt/1e6:9.1f} Melem/s  "
          f"{n*per_elem_ops/dt/1e9:9.2f} Gop/s", flush=True)


def main():
    n = 1 << 20
    T = n // S
    rng = np.random.default_rng(0)
    au = jnp.asarray(rng.integers(0, 1 << 16, (L, S, T), dtype=np.uint32))
    bu = jnp.asarray(rng.integers(0, 1 << 16, (L, S, T), dtype=np.uint32))
    af = au.astype(jnp.float32)
    bf = bu.astype(jnp.float32)

    REPS = 512
    bench(f"u32 mul x{REPS}", mk_mul_kernel(REPS, jnp.uint32), (au, bu),
          REPS, n)
    bench(f"f32 mul x{REPS}", mk_mul_kernel(REPS, jnp.float32), (af, bf),
          REPS, n)

    # full Montgomery kernels
    from arkplonk_tpu.fields.pallas2 import _mont_kernel
    fq_k = _mont_kernel(FQ.modulus, FQ.L, False)
    fr_k = _mont_kernel(FR.modulus, FR.L, False)
    afr = au[:16]
    bfr = bu[:16]
    bench("fq mont_mul", fq_k, (au, bu), 1, n)
    bench("fr mont_mul", fr_k, (afr, bfr), 1, n)

    # fused point kernels
    from arkplonk_tpu.curve import pallas_jac
    mk = pallas_jac._madd_kernel(False)
    jk = pallas_jac._jadd_kernel(False)
    one = jnp.broadcast_to(
        jnp.asarray(FQ.ONE_np, jnp.uint32).reshape(L, 1, 1), (L, S, T))
    zero = jnp.zeros((L, S, T), jnp.uint32)
    vmask = jnp.ones((1, S, T), jnp.uint32)
    smask = jnp.zeros((1, S, T), jnp.uint32)
    bench("madd kernel", mk, (au, bu, one, bu, au, vmask, smask), 1, n)
    bench("jadd kernel", jk, (au, bu, one, bu, au, one), 1, n)

    # chained-in-jit: isolate per-iteration device cost (no host sync)
    REPC = 50

    def chain_madd(T):
        @jax.jit
        def f(ax, ay, az, px, py, v, sg):
            def body(i, st):
                ax, ay, az = st
                ax, ay, az, _ = mk(ax, ay, az, px, py, v, sg)
                return ax, ay, az
            return jax.lax.fori_loop(0, REPC, body, (ax, ay, az))
        nn = T * S
        args = (au[:, :, :T], bu[:, :, :T], one[:, :, :T], bu[:, :, :T],
                au[:, :, :T], vmask[:, :, :T], smask[:, :, :T])
        out = f(*args)
        perf.sync(out)
        t0 = time.perf_counter()
        for _ in range(3):
            perf.sync(f(*args))
        dt = (time.perf_counter() - t0) / 3 / REPC
        print(f"madd chained T={T:7d} ({nn:8d} lanes): {dt*1e3:7.3f} "
              f"ms/iter  {nn/dt/1e6:8.1f} Mlane/s", flush=True)

    for T in (512, 8192, 131072):
        chain_madd(T)

    # per-XLA-op overhead: chain of small elementwise ops on (128, 512)
    @jax.jit
    def f_ops(x):
        def body(i, x):
            for _ in range(20):
                x = (x * 3 + 1) ^ (x >> 5)
            return x
        return jax.lax.fori_loop(0, 50, body, x)

    xsmall = jnp.ones((128, 512), jnp.uint32)
    perf.sync(f_ops(xsmall))
    t0 = time.perf_counter()
    for _ in range(3):
        perf.sync(f_ops(xsmall))
    dt = (time.perf_counter() - t0) / 3
    print(f"small-op chain: {dt*1e3/50/60:7.4f} ms/op "
          f"(total {dt*1e3:.1f} ms / 3000 fused-op-groups)", flush=True)


if __name__ == "__main__":
    main()
