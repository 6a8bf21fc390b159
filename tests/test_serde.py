"""Serde round-trips for Proof / VerifierKey / VerifierData.

Analogue of the reference serde tests (proof.rs:686-707,
widget/mod.rs:438-572, circuit.rs:441-448)."""

import random

from arkplonk_tpu.api.circuit import Verifier
from arkplonk_tpu.proving.prover import Prover
from arkplonk_tpu.proving import serde
from arkplonk_tpu.pcs import kzg

SRS = kzg.SRS.setup(1 << 9)
RNG = random.Random(5)


def det_rng():
    return RNG.randrange(0, 1 << 255)


def _gadget(cs):
    a = cs.add_input(2)
    b = cs.add_input(3)
    c = cs.arithmetic_gate((a, b, None), mul=1)
    cs.constrain_to_constant(c, 6, None)
    v = cs.add_input(9)
    cs.range_gate(v, 4)


def test_proof_roundtrip_and_verify():
    prover = Prover(b"demo", rng=det_rng)
    _gadget(prover.cs)
    prover.preprocess(SRS)
    pis = dict(prover.cs.public_inputs)
    proof = prover.prove_with_preprocessed(SRS, prover.prover_key)

    blob = serde.proof_to_bytes(proof)
    back = serde.proof_from_bytes(blob)
    assert back == proof
    assert serde.proof_to_bytes(back) == blob

    verifier = Verifier(b"demo", rng=det_rng)
    _gadget(verifier.cs)
    verifier.preprocess(SRS)
    assert verifier.verify(back, SRS, pis)


def test_verifier_key_roundtrip():
    verifier = Verifier(b"demo", rng=det_rng)
    _gadget(verifier.cs)
    vk = verifier.preprocess(SRS)
    blob = serde.verifier_key_to_bytes(vk)
    back = serde.verifier_key_from_bytes(blob)
    assert back.n == vk.n
    assert back.commitments == vk.commitments


def test_verifier_data_roundtrip():
    verifier = Verifier(b"demo", rng=det_rng)
    _gadget(verifier.cs)
    vk = verifier.preprocess(SRS)
    pi = {3: 12345, 17: 999}
    blob = serde.verifier_data_to_bytes(vk, pi)
    vk2, pi2 = serde.verifier_data_from_bytes(blob)
    assert vk2.commitments == vk.commitments
    assert pi2 == pi
