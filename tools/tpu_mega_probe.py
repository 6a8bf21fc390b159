"""TPU probe: validate the mega (single-dispatch) prover byte-exactness
vs the host golden path at a small size, then time it at BENCH_LOG2N.

Run:  python tools/tpu_mega_probe.py
"""

import os
import random
import sys
import time

os.environ.setdefault("ARKPLONK_MEGA", "1")
os.environ.setdefault("ARKPLONK_TIMING", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

print("backend:", jax.devices()[0].platform, flush=True)

from arkplonk_tpu.pcs import kzg  # noqa: E402
from arkplonk_tpu.proving.prover import Prover  # noqa: E402
from arkplonk_tpu.proving.device import DeviceProver  # noqa: E402
from arkplonk_tpu.proving import device_mega  # noqa: E402
from arkplonk_tpu.proving.serde import proof_to_bytes  # noqa: E402


def det_rng(seed=7):
    rng = random.Random(seed)
    return lambda: rng.randrange(0, 1 << 255)


def build(cs, size):
    cs.add_dummy_lookup_table()
    while cs.circuit_bound() < size - 1:
        cs.add_dummy_constraints()


def validate(srs, size):
    print(f"== validate mega vs host at n={size}", flush=True)
    hp = Prover(b"ark", rng=det_rng())
    build(hp.cs, size)
    hp.preprocess(srs)
    hproof = hp.prove_with_preprocessed(srs, hp.prover_key)

    dp = DeviceProver(b"ark", rng=det_rng())
    build(dp.cs, size)
    dp.preprocess(srs)
    t0 = time.time()
    dproof = device_mega.prove_mega(dp, dp.device_pk)
    print(f"mega first prove: {time.time()-t0:.2f}s", flush=True)
    assert dproof is not None, "mega fell back"
    assert proof_to_bytes(dproof) == proof_to_bytes(hproof), "PROOF MISMATCH"
    print("byte-identical OK", flush=True)
    return dp


def timeit(srs, size, iters=3):
    print(f"== timing mega at n={size}", flush=True)
    dp = DeviceProver(b"ark", rng=det_rng())
    build(dp.cs, size)
    t0 = time.time()
    dp.preprocess(srs)
    print(f"preprocess: {time.time()-t0:.2f}s", flush=True)
    t0 = time.time()
    p = device_mega.prove_mega(dp, dp.device_pk)
    print(f"first prove: {time.time()-t0:.2f}s", flush=True)
    assert p is not None
    for i in range(iters):
        dp.clear_witness()
        build(dp.cs, size)
        t0 = time.time()
        p = device_mega.prove_mega(dp, dp.device_pk)
        dt = time.time() - t0
        print(f"steady prove[{i}]: {dt:.3f}s", flush=True)
    # verify once with the native pairing
    vk = dp._host.verifier_key
    tr = dp._host.preprocessed_transcript.clone()
    pis = dict(dp.cs.public_inputs)
    t0 = time.time()
    ok = p.verify(vk, tr, srs, pis)
    print(f"verify: {time.time()-t0:.3f}s ok={ok}", flush=True)


if __name__ == "__main__":
    lg = int(os.environ.get("BENCH_LOG2N", "12"))
    srs = kzg.SRS.setup((1 << lg) + 8)
    validate(srs, 1 << 5)
    if lg > 5:
        timeit(srs, 1 << lg)
