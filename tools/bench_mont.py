"""Honest TPU benchmark: old (L,B)-row kernel vs new (L,8,128)-slab kernel."""
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from arkplonk_tpu import perf
from arkplonk_tpu.fields.jaxfield import FR, FQ
from arkplonk_tpu.fields import pallas_mont, pallas2


def rand(F, n, seed=0):
    rng = np.random.default_rng(seed)
    vals = [int.from_bytes(rng.bytes(48), "little") % F.modulus
            for _ in range(min(n, 1024))]
    arr = F.encode(vals)
    reps = (n + arr.shape[1] - 1) // arr.shape[1]
    return jnp.asarray(np.tile(arr, (1, reps))[:, :n])


def main():
    N = 1 << int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
    for name, F in (("fr", FR), ("fq", FQ)):
        a, b = rand(F, N, 1), rand(F, N, 2)
        for kname, fn in (
            ("old", jax.jit(lambda a, b, F=F: pallas_mont.mont_mul_pallas(F, a, b))),
            ("new", jax.jit(lambda a, b, F=F: pallas2.mont_mul_pallas2(F, a, b))),
        ):
            t0 = time.perf_counter()
            out = fn(a, b)
            perf.sync(out)
            tc = time.perf_counter() - t0
            dt = perf.timeit_chain(fn, a, b, iters=10)
            print(f"{name}_mul {kname}  n={N}  {N/dt/1e6:8.1f} M/s  "
                  f"{dt*1e3:8.3f} ms/call  (first {tc:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
