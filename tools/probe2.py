"""Second probe session: new-MSM validation + jnp-vs-pallas point add
costs + XLA gather throughput."""
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from arkplonk_tpu import perf
from arkplonk_tpu.curve import host as cv, msm2, g1_jax as g1
from arkplonk_tpu.fields.jaxfield import FR, FQ

REPC = 30


def chain(fn, init, label, per=None):
    out = fn(init)
    perf.sync(out)
    t0 = time.perf_counter()
    for _ in range(3):
        perf.sync(fn(init))
    dt = (time.perf_counter() - t0) / 3 / REPC
    extra = f"  ({per(dt):.1f})" if per else ""
    print(f"{label:36s} {dt*1e3:8.3f} ms/iter{extra}", flush=True)


def main():
    # 1. jnp jac_add chained at several widths
    for lanes in (4096, 65536):
        pts = g1.encode_points(
            [cv.G1.mul(cv.G1_GEN, 3 + i) for i in range(256)])
        reps = lanes // 256
        p = tuple(jnp.tile(c, (1, reps)) for c in pts)

        @jax.jit
        def f(p):
            def body(i, q):
                return g1._jac_add_jnp(q, p)
            return jax.lax.fori_loop(0, REPC, body, p)

        chain(f, p, f"jnp jac_add lanes={lanes}")

    # 2. XLA gather: take_along_axis (G,B) from (L,n) tables
    n = 1 << 18
    rng = np.random.default_rng(0)
    tbl = jnp.asarray(rng.integers(0, 1 << 16, (24, n), dtype=np.uint32))
    idx = jnp.asarray(rng.integers(0, n, (80, 4096), dtype=np.int32))

    @jax.jit
    def fg(idx):
        def body(i, s):
            g = tbl[:, (idx + i) % n]
            return s + g.sum(dtype=jnp.uint32)
        return jax.lax.fori_loop(0, REPC, body, jnp.uint32(0))

    chain(fg, idx, "gather (24,80,4096) from (24,2^18)",
          per=lambda dt: 24 * 80 * 4096 * 4 / dt / 1e9)

    # 3. validate + time the new MSM
    for log2n, P in ((12, 1), (12, 4)):
        nn = 1 << log2n
        base = [cv.G1.mul(cv.G1_GEN, int.from_bytes(rng.bytes(31), "little"))
                for _ in range(256)]
        pts = (base * (nn // 256))[:nn]
        m = msm2.PippengerMSM(pts)
        c = msm2.pick_window(nn)
        W, _ = msm2._window_plan(c)
        polys = [[int.from_bytes(rng.bytes(31), "little") % cv.R
                  for _ in range(nn)] for _ in range(P)]
        stack = jnp.stack([jnp.asarray(FR.encode(p)) for p in polys], axis=1)
        t0 = time.time()
        got = m.commit_mont_batch(stack)
        print(f"msm 2^{log2n} P={P} c={c} W={W} first: {time.time()-t0:.1f}s",
              flush=True)
        for i, p in enumerate(polys):
            exp = cv.msm_host(pts, p)
            assert got[i] == exp, f"MISMATCH poly {i}"
        print(f"  all {P} polys MATCH", flush=True)
        t0 = time.time()
        iters = 5
        for _ in range(iters):
            m.commit_mont_batch(stack)
        print(f"  steady: {(time.time()-t0)/iters*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
