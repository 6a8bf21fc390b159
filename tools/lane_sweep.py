import sys
import time
import os

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np
from arkplonk_tpu import perf
from arkplonk_tpu.fields.jaxfield import FQ, FR
from arkplonk_tpu.fields import pallas2


def rand(F, n, seed=0):
    rng = np.random.default_rng(seed)
    vals = [int.from_bytes(rng.bytes(48), "little") % F.modulus
            for _ in range(min(n, 1024))]
    arr = F.encode(vals)
    reps = (n + arr.shape[1] - 1) // arr.shape[1]
    return jnp.asarray(np.tile(arr, (1, reps))[:, :n])


N = 1 << 20
for name, F in (("fq", FQ), ("fr", FR)):
    a, b = rand(F, N, 1), rand(F, N, 2)
    fn = jax.jit(lambda a, b, F=F: pallas2.mont_mul_pallas2(F, a, b))
    t0 = time.perf_counter()
    perf.sync(fn(a, b))
    tc = time.perf_counter() - t0
    dt = perf.timeit_chain(fn, a, b, iters=10)
    print(f"{name} LANES={os.environ.get('ARKPLONK_PALLAS_LANES', '512'):>5}"
          f"  {N/dt/1e6:8.1f} M/s  {dt*1e3:7.3f} ms  (first {tc:.0f}s)",
          flush=True)
