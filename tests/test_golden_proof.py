"""Frozen end-to-end proof fixture.

With blinding driven by a seeded RNG, the full prover byte stream is
deterministic: these digests pin the protocol order (prover.rs:163-638),
every transcript append (transcript.rs:27-50), the ark-serialize point/
scalar conventions, and the key/proof serde layout (proof.rs:686-707,
widget/mod.rs:506-572) in one shot.  Any single byte of drift anywhere
in the pipeline fails this test.
"""

import hashlib
import random

import pytest

from arkplonk_tpu.fields.host import CURVE
from arkplonk_tpu.pcs import kzg
from arkplonk_tpu.proving.prover import Prover
from arkplonk_tpu.proving import serde

pytestmark = pytest.mark.skipif(
    CURVE != "bls12_381", reason="fixture is BLS12-381")

PROOF_SHA = "bed78235e467dc0bda6a2581894fa11e71dc88bfaca3a16cd02ec3dad40ee67b"
VK_SHA = "c95c1ea3fe0f10c3c96d45d5eafe60041aaf6cd287230a98da34f14779a0fe87"
PROOF_LEN = 1591
VK_LEN = 968


def _build():
    srs = kzg.SRS.setup(64 + 8)
    rng = random.Random(424242)

    def det():
        return rng.randrange(0, 1 << 255)

    prover = Prover(b"golden-proof", rng=det)
    cs = prover.cs
    a = cs.add_input(3)
    b = cs.add_input(5)
    c = cs.arithmetic_gate((a, b, None), mul=1)
    cs.range_gate(c, 8)
    prover.preprocess(srs)
    proof = prover.prove_with_preprocessed(srs, prover.prover_key)
    return srs, prover, proof


def test_frozen_proof_bytes():
    srs, prover, proof = _build()
    blob = serde.proof_to_bytes(proof)
    assert len(blob) == PROOF_LEN
    assert hashlib.sha256(blob).hexdigest() == PROOF_SHA
    vkb = serde.verifier_key_to_bytes(prover.verifier_key)
    assert len(vkb) == VK_LEN
    assert hashlib.sha256(vkb).hexdigest() == VK_SHA
    # the frozen blob round-trips and still verifies
    p2 = serde.proof_from_bytes(blob)
    ok = p2.verify(prover.verifier_key,
                   prover.preprocessed_transcript.clone(), srs,
                   dict(prover.cs.public_inputs))
    assert ok
