"""Per-stage TPU timing at BENCH_LOG2N (default 2^12): MSM, NTT,
quotient, scans — the mega prover's building blocks.  Uses the same
shapes as the prover so the persistent compile cache serves everything.

Readback-timed (block_until_ready returns at dispatch on this tunnel).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from arkplonk_tpu.fields.jaxfield import FR  # noqa: E402
from arkplonk_tpu.fields import host  # noqa: E402
from arkplonk_tpu.poly import ntt  # noqa: E402
from arkplonk_tpu.curve import msm3  # noqa: E402
from arkplonk_tpu.curve.msm2 import pick_window, _window_plan  # noqa: E402
from arkplonk_tpu.curve import device_finish as df  # noqa: E402
from arkplonk_tpu.pcs import kzg  # noqa: E402
from arkplonk_tpu.proving import device as dv  # noqa: E402

LG = int(os.environ.get("BENCH_LOG2N", "12"))
N = 1 << LG


def sync(x):
    return np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0]))


def bench(label, fn, *args, iters=3):
    fn(*args)  # compile/warm
    sync(fn(*args))
    best = None
    for _ in range(iters):
        t0 = time.time()
        r = fn(*args)
        sync(r)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label:36s} {best*1e3:9.1f} ms", flush=True)
    return best


def rand_stack(b, n, seed=0):
    rng = np.random.default_rng(seed)
    vals = [int.from_bytes(rng.bytes(31), "little") % host.R
            for _ in range(1024)]
    arr = np.asarray(FR.encode(vals)).reshape(FR.L, 1, 1024)
    out = np.tile(arr, (1, b, max(1, n // 1024)))[:, :, :n]
    return jnp.asarray(out)


def main():
    print("backend:", jax.devices()[0].platform, "n =", N, flush=True)
    srs = kzg.SRS.setup(N + 8)
    msm = msm3.PippengerMSM3(srs.g1[:N])
    c = pick_window(N)
    W, _ = _window_plan(c)
    print(f"window c={c} W={W} buckets={1 << (c - 1)}")

    stack4 = rand_stack(4, N, 1)
    pxy = msm.pxy

    fn_acc = jax.jit(lambda s, p: msm3._msm_body_v3(N, 4, c, s, p,
                                                    to_raw=False,
                                                    reduce=False))
    bench("MSM accumulation only", fn_acc, stack4, pxy)

    fn_msm = jax.jit(lambda s, p: msm3._msm_body_v3(N, 4, c, s, p,
                                                    to_raw=False))
    bench("MSM body (acc + weighted reduce)", fn_msm, stack4, pxy)

    def fn_full_commit(s, p):
        (wx, wy, wz), a = msm3._msm_body_v3(N, 4, c, s, p, to_raw=False)
        (jx, jy, jz), a2 = df.recombine_device(wx, wy, wz, 4, W, c)
        return df.to_affine_bytes(jx, jy, jz)

    bench("full commit (MSM+recomb+affine)", jax.jit(fn_full_commit),
          stack4, pxy)

    dd = ntt.get_device_domain(N)
    stack5 = rand_stack(5, N, 2)
    bench("iNTT batch 5 (wires)", jax.jit(lambda x: ntt.intt(x, dd, None)),
          stack5)
    dd4 = ntt.get_device_domain(4 * N)
    stack12 = rand_stack(12, 4 * N, 3)
    bench("NTT 4n batch 12", jax.jit(lambda x: ntt.ntt(x, dd4, None)),
          stack12)

    sc = rand_stack(1, 1, 4)[:, 0]
    zf = dv._z_poly_fn(N, None)
    sig = rand_stack(4, N, 5)
    bench("z-poly (scan+intt)", zf, dd, stack4, sig, sc, sc)

    sel4 = rand_stack(12, 4 * N, 6)
    sig4 = rand_stack(4, 4 * N, 7)
    polys = rand_stack(12, N, 8)
    chal = rand_stack(11, 1, 9)
    bench("quotient (4n fused)", dv._quotient_fn(N, None),
          dd4, sel4, sig4, polys, chal)

    bench("open fn (division)", dv._open_fn(N, None),
          rand_stack(11, N, 10), sc, sc)


if __name__ == "__main__":
    main()
