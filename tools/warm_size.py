"""Warm the prover's compile cache at one size, with retry-on-EOF.

The tunnel compile service sometimes drops the connection mid-compile
("remote_compile: Network Error: Unexpected EOF") on the largest
programs.  Compiles happen sequentially at first dispatch and every
SUCCESSFUL compile lands in the persistent cache, so retrying the same
prove makes monotonic progress: each attempt starts from the cache and
fails (if at all) strictly later.  This driver loops until a full
prove + verify succeeds or the attempt budget is exhausted.

Usage:  python tools/warm_size.py <log2n> [attempts]
NEVER run while another device process is live (single-tenant tunnel).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    lg = int(sys.argv[1])
    attempts = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n = 1 << lg

    import random
    from arkplonk_tpu.pcs import kzg
    from arkplonk_tpu.proving.device import DeviceProver

    def build(cs):
        cs.add_dummy_lookup_table()
        while cs.circuit_bound() < n - 1:
            cs.add_dummy_constraints()

    def mk_rng():
        rng = random.Random(7)
        return lambda: rng.randrange(0, 1 << 255)

    srs = kzg.SRS.setup(n + 8)
    t0 = time.time()
    prover = DeviceProver(b"ark", rng=mk_rng())
    build(prover.cs)
    prover.preprocess(srs)
    print(f"[warm 2^{lg}] preprocess {time.time()-t0:.1f}s", flush=True)

    proof = None
    for i in range(attempts):
        t0 = time.time()
        try:
            prover.clear_witness()
            build(prover.cs)
            proof = prover.prove_with_preprocessed(srs, prover.device_pk)
            print(f"[warm 2^{lg}] attempt {i}: prove OK {time.time()-t0:.1f}s",
                  flush=True)
            break
        except Exception as e:
            print(f"[warm 2^{lg}] attempt {i}: {time.time()-t0:.1f}s "
                  f"{type(e).__name__}: {str(e)[:140]}", flush=True)
            if "UNAVAILABLE" not in str(e) and "Network" not in str(e):
                raise
    if proof is None:
        print(f"[warm 2^{lg}] FAILED after {attempts} attempts", flush=True)
        sys.exit(1)

    # steady timing
    times = []
    for _ in range(2):
        prover.clear_witness()
        build(prover.cs)
        t0 = time.time()
        proof = prover.prove_with_preprocessed(srs, prover.device_pk)
        times.append(time.time() - t0)
    t0 = time.time()
    ok = proof.verify(prover._host.verifier_key,
                      prover._host.preprocessed_transcript.clone(), srs,
                      dict(prover._host.cs.public_inputs))
    print(f"[warm 2^{lg}] steady {min(times):.3f}s verify "
          f"{time.time()-t0:.3f}s ok={ok}", flush=True)


if __name__ == "__main__":
    main()
