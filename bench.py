"""Benchmark driver: PLONK prove wall time on the bench circuit.

Mirrors the reference criterion benchmark (benches/plonk.rs:26-68): a dummy
arith+lookup circuit padded to 2^k, KZG10 on BLS12-381.  Runs the device
(TPU) prover; prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

vs_baseline = reference prove time at the same size on the Ryzen 7 3700X
(BASELINE.md) divided by ours, i.e. >1.0 means faster than the reference.

Environment knobs:
  BENCH_LOG2N   circuit size exponent (default 12; first prove includes
                ~3-4 min of served XLA-TPU compile in this sandbox)
  BENCH_BACKEND "device" (default) or "host"
"""

import json
import os
import random
import sys
import time


REFERENCE_PROVE_MS = {
    5: 16.208, 6: 21.712, 7: 29.545, 8: 49.039, 9: 72.533, 10: 130.71,
    11: 247.74, 12: 459.45, 13: 781.89, 14: 1482.4, 15: 2868.2,
    16: 5476.6, 17: 10118.0, 18: 20184.0,
}


def build_bench_circuit(cs, size):
    """benches/plonk.rs:52-61: dummy lookup table + dummy constraints."""
    cs.add_dummy_lookup_table()
    while cs.circuit_bound() < size - 1:
        cs.add_dummy_constraints()


def main():
    log2n = int(os.environ.get("BENCH_LOG2N", "12"))
    backend = os.environ.get("BENCH_BACKEND", "device")
    n = 1 << log2n

    import jax

    from arkplonk_tpu.pcs import kzg
    from arkplonk_tpu.proving.prover import Prover
    from arkplonk_tpu.proving.device import DeviceProver
    from arkplonk_tpu.api.circuit import Verifier

    rng = random.Random(7)

    def det_rng():
        return rng.randrange(0, 1 << 255)

    t0 = time.time()
    srs = kzg.SRS.setup(n + 8)
    t_srs = time.time() - t0

    cls = DeviceProver if backend == "device" else Prover
    prover = cls(b"ark", rng=det_rng)
    build_bench_circuit(prover.cs, n)
    t0 = time.time()
    prover.preprocess(srs)
    t_compile = time.time() - t0

    # proof 1: includes XLA compilation; proof 2: steady-state
    pis = dict(prover.cs.public_inputs)
    t0 = time.time()
    proof = prover.prove_with_preprocessed(
        srs, prover.device_pk if backend == "device" else prover.prover_key)
    t_first = time.time() - t0

    prover.clear_witness()
    build_bench_circuit(prover.cs, n)
    t0 = time.time()
    proof = prover.prove_with_preprocessed(
        srs, prover.device_pk if backend == "device" else prover.prover_key)
    t_prove = time.time() - t0

    # verify (host)
    verifier = Verifier(b"ark", rng=det_rng)
    build_bench_circuit(verifier.cs, n)
    verifier.preprocess(srs)
    t0 = time.time()
    ok = verifier.verify(proof, srs, pis)
    t_verify = time.time() - t0
    assert ok, "bench proof failed to verify"

    ref_ms = REFERENCE_PROVE_MS.get(log2n)
    vs = (ref_ms / 1000.0) / t_prove if ref_ms else 0.0
    result = {
        "metric": f"plonk_prove_2e{log2n}",
        "value": round(t_prove, 4),
        "unit": "s",
        "vs_baseline": round(vs, 4),
        "detail": {
            "backend": backend,
            "srs_s": round(t_srs, 2),
            "preprocess_s": round(t_compile, 2),
            "first_prove_s": round(t_first, 2),
            "verify_s": round(t_verify, 3),
            "platform": jax.devices()[0].platform,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
