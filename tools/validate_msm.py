"""TPU-side validation + timing of the current MSM pipeline.

Usage: python tools/validate_msm.py [log2n] [P]
Checks device results against the host MSM, then times steady-state.
"""
import sys
import time

sys.path.insert(0, ".")
import jax
import numpy as np
import jax.numpy as jnp

from arkplonk_tpu import perf
from arkplonk_tpu.curve import host as cv, msm2
from arkplonk_tpu.fields.jaxfield import FR


def main():
    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    P = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    n = 1 << log2n
    rng = np.random.default_rng(1)
    base = [cv.G1.mul(cv.G1_GEN, int.from_bytes(rng.bytes(31), "little"))
            for _ in range(min(n, 256))]
    pts = (base * ((n + 255) // 256))[:n]
    m = msm2.PippengerMSM(pts)
    c = msm2.pick_window(n)
    W, _ = msm2._window_plan(c)
    print(f"n=2^{log2n} P={P} c={c} W={W} B={1 << (c - 1)}", flush=True)

    polys = [[int.from_bytes(rng.bytes(31), "little") % cv.R
              for _ in range(n)] for _ in range(P)]
    polys[0][5] = 0
    polys[0][6] = cv.R - 1
    if P > 1:
        polys[1] = [0] * n  # zero poly -> None
    stack = jnp.stack([jnp.asarray(FR.encode(p)) for p in polys], axis=1)

    t0 = time.time()
    got = m.commit_mont_batch(stack)
    print(f"first commit_mont_batch: {time.time()-t0:.1f}s", flush=True)
    for i, p in enumerate(polys):
        exp = cv.msm_host(pts, p)
        ok = got[i] == exp
        print(f"poly {i}: {'MATCH' if ok else 'MISMATCH'}", flush=True)
        assert ok

    iters = 5
    t0 = time.time()
    for _ in range(iters):
        got = m.commit_mont_batch(stack)
    dt = (time.time() - t0) / iters
    print(f"steady commit_mont_batch(P={P}) @2^{log2n}: {dt*1e3:.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
