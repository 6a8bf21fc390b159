"""NTT / MSM / prove scaling over mesh sizes (BASELINE scaling counter).

Runs the distributed NTT (four-step), the sharded MSM, and optionally
the full mesh prover at mesh sizes 1/2/4/8 and reports wall time +
efficiency vs 1 device.

On real multi-chip hardware this measures true scaling. On the CPU
virtual mesh (the only thing available in this sandbox) the devices
share host cores, so wall-clock "efficiency" is meaningless — the run
still validates that the sharded programs execute with the intended
collective structure and records bit-exactness across mesh shapes.
The JSON notes which regime produced the numbers.

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/scaling_bench.py [log2n]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# This sandbox pre-imports jax, so JAX_PLATFORMS in the env is read too
# late; force the platform through config BEFORE any backend initializes
# (see tests/conftest.py).  Default: CPU virtual mesh; ARKPLONK_SCALING_TPU=1
# opts into the real chip (never run while another device process is live).
if os.environ.get("ARKPLONK_SCALING_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
    os.environ["ARKPLONK_CACHE"] = "0"   # CPU AOT cache entries thrash here

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from arkplonk_tpu.fields.jaxfield import FR  # noqa: E402
from arkplonk_tpu.fields import host  # noqa: E402
from arkplonk_tpu.poly import ntt  # noqa: E402
from arkplonk_tpu.mesh import sharding as ms  # noqa: E402


def _rand_stack(n, b, seed=0):
    rng = np.random.default_rng(seed)
    vals = [int.from_bytes(rng.bytes(31), "little") % host.R
            for _ in range(1024)]
    arr = np.asarray(FR.encode(vals)).reshape(FR.L, 1, 1024)
    reps = (b, n // 1024 if n >= 1024 else 1)
    out = np.tile(arr, (1, *reps))[:, :, :n]
    return jnp.asarray(out)


def time_fn(f, *args, iters=3):
    f(*args)[0].block_until_ready()
    best = None
    for _ in range(iters):
        t0 = time.time()
        r = f(*args)
        np.asarray(jax.device_get(r[0]))  # readback sync
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best


def ntt_scaling(n, mesh_sizes):
    out = {}
    x = _rand_stack(n, 4)
    for d in mesh_sizes:
        mesh = ms.make_mesh(d)
        ma = (mesh, mesh.axis_names[0]) if d > 1 else None
        dd = ntt.get_device_domain(n)

        def run(x):
            y = ntt.intt(x, dd, ma)   # the prover's hot transform
            return (y,)

        xs = ms.put_sharded(mesh, x) if d > 1 else x
        out[d] = round(time_fn(jax.jit(run), xs) * 1e3, 2)
    base = out[mesh_sizes[0]]
    return {"ms": out,
            "efficiency": {d: round(base / (out[d] * d), 3) for d in out}}


def msm_scaling(n, mesh_sizes):
    """Point-partitioned Pippenger across the mesh vs single device.
    Uses a small synthetic point set (mesh-size-divisible)."""
    from arkplonk_tpu.curve import host as cv, msm2

    rng = np.random.default_rng(3)
    base = [cv.G1.mul(cv.G1_GEN,
                      int.from_bytes(rng.bytes(31), "little") % cv.R)
            for _ in range(64)]
    pts = (base * ((n + 63) // 64))[:n]
    stack = _rand_stack(n, 2, seed=4)
    out = {}
    result0 = None
    for d in mesh_sizes:
        mesh = ms.make_mesh(d)
        m = (msm2.ShardedPippengerMSM(mesh, pts) if d > 1
             else msm2.PippengerMSM(pts))
        t_best = None
        for _ in range(3):
            t0 = time.time()
            r = m.commit_mont_batch(stack)
            dt = time.time() - t0
            t_best = dt if t_best is None else min(t_best, dt)
        if result0 is None:
            result0 = r
        else:
            assert r == result0, f"mesh={d} result diverged (bit-exactness)"
        out[d] = round(t_best * 1e3, 2)
    base_ms = out[mesh_sizes[0]]
    return {"ms": out, "bit_exact_across_mesh_shapes": True,
            "efficiency": {d: round(base_ms / (out[d] * d), 3)
                           for d in out}}


def scan_scaling(n, mesh_sizes):
    """Distributed z(X)-style exclusive prefix product (mesh/scans.py) vs
    the single-device associative scan; bit-exact across mesh shapes."""
    from arkplonk_tpu.mesh import scans as dscans
    from arkplonk_tpu.proving import device as D

    x = _rand_stack(n, 1, seed=7)[:, 0]   # (L, n)
    out = {}
    ref = None
    for d in mesh_sizes:
        mesh = ms.make_mesh(d)
        if d > 1:
            f = dscans.make_exclusive_prefix_mul(mesh)
            xs = ms.put_sharded(mesh, x)
        else:
            f = jax.jit(D.shifted_prefix_product)
            xs = x
        out[d] = round(time_fn(lambda v: (f(v),), xs) * 1e3, 2)
        got = FR.decode_fast(f(xs))
        if ref is None:
            ref = got
        else:
            assert got == ref, f"scan diverged at mesh={d}"
    base = out[mesh_sizes[0]]
    return {"ms": out, "bit_exact_across_mesh_shapes": True,
            "efficiency": {d: round(base / (out[d] * d), 3) for d in out}}


def quotient_scaling(n, mesh_sizes):
    """Fused quotient stage (SURVEY §3.2 round 4 — the hottest pointwise
    4n pipeline) across mesh sizes; bit-exact across shapes."""
    from arkplonk_tpu.proving import device as D

    sel4 = _rand_stack(4 * n, 12, seed=11)
    sig4 = _rand_stack(4 * n, 4, seed=12)
    polys = _rand_stack(n, 12, seed=13)
    chal = _rand_stack(1, 11, seed=14)
    dd4 = ntt.get_device_domain(4 * n)
    out = {}
    ref = None
    for d in mesh_sizes:
        mesh = ms.make_mesh(d)
        ma = (mesh, "x") if d > 1 else None
        f = D._quotient_fn(n, ma)
        if d > 1:
            args = (dd4, ms.put_sharded(mesh, sel4),
                    ms.put_sharded(mesh, sig4),
                    jax.device_put(polys, ms.replicated(mesh)),
                    jax.device_put(chal, ms.replicated(mesh)))
        else:
            args = (dd4, sel4, sig4, polys, chal)
        out[d] = round(time_fn(lambda *a: (f(*a),), *args) * 1e3, 2)
        got = FR.decode_fast(f(*args))
        if ref is None:
            ref = got
        else:
            assert got == ref, f"quotient diverged at mesh={d}"
    base = out[mesh_sizes[0]]
    return {"ms": out, "bit_exact_across_mesh_shapes": True,
            "efficiency": {d: round(base / (out[d] * d), 3) for d in out}}


def prove_scaling(lg, mesh_sizes):
    """Full 5-round mesh prove at 2^lg: steady time per mesh size,
    byte-identical proofs across mesh shapes (VERDICT r4 item 4)."""
    import random as _random
    from arkplonk_tpu.pcs import kzg
    from arkplonk_tpu.proving.device import DeviceProver
    from arkplonk_tpu.proving.serde import proof_to_bytes

    n = 1 << lg
    srs = kzg.SRS.setup(n + 8)

    def build(cs):
        cs.add_dummy_lookup_table()
        while cs.circuit_bound() < n - 1:
            cs.add_dummy_constraints()

    def mk_rng():
        rng = _random.Random(0xA11CE)
        return lambda: rng.randrange(0, 1 << 255)

    out = {}
    ref = None
    for d in mesh_sizes:
        mesh = ms.make_mesh(d) if d > 1 else None
        prover = DeviceProver(b"scal", rng=mk_rng(), mesh=mesh)
        build(prover.cs)
        prover.preprocess(srs)
        t_best = None
        for _ in range(2):
            prover.clear_witness()
            build(prover.cs)
            t0 = time.time()
            proof = prover.prove_with_preprocessed(srs, prover.device_pk)
            dt = time.time() - t0
            t_best = dt if t_best is None else min(t_best, dt)
        blob = proof_to_bytes(proof)
        if ref is None:
            ref = blob
        else:
            assert blob == ref, f"proof bytes diverged at mesh={d}"
        out[d] = round(t_best, 2)
    base = out[mesh_sizes[0]]
    return {"s": out, "proof_bytes_equal_across_mesh_shapes": True,
            "efficiency": {d: round(base / (out[d] * d), 3) for d in out}}


def main():
    lg = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    n = 1 << lg
    sizes = [d for d in (1, 2, 4, 8) if d <= len(jax.devices())]
    detail = {
        "platform": jax.default_backend(),
        "n_devices_available": len(jax.devices()),
        "regime": ("hardware" if jax.default_backend() == "tpu"
                   else "virtual-mesh (shared host cores: efficiency "
                        "numbers are NOT hardware scaling)"),
        "log2n": lg,
        "ntt": ntt_scaling(n, sizes),
        "msm": msm_scaling(min(n, 1 << 12), sizes),
        "scan": scan_scaling(n, sizes),
        "quotient": quotient_scaling(min(n, 1 << 12), sizes),
    }
    lg_prove = os.environ.get("SCALING_PROVE")
    if lg_prove:
        # full mesh prove is minutes/size on the virtual mesh; 1-vs-8
        # captures the shard-boundary coverage the VERDICT asks for
        detail["prove"] = prove_scaling(int(lg_prove), [1, sizes[-1]])
    print(json.dumps(detail, indent=1))
    if os.environ.get("SCALING_OUT"):
        with open(os.environ["SCALING_OUT"], "w") as f:
            json.dump(detail, f, indent=1)


if __name__ == "__main__":
    main()
