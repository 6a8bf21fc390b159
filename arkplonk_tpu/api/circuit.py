"""User-facing Circuit API: compile / gen_proof / verify_proof.

Mirrors /root/reference/plonk-core/src/circuit.rs:208-314 and the Verifier
driver (proof_system/verifier.rs).
"""

from __future__ import annotations

from ..transcript.plonk import PlonkTranscript
from ..circuit.composer import StandardComposer
from ..proving.prover import Prover
from ..proving import preprocess as prep
from ..proving import pi as pi_mod


class Verifier:
    def __init__(self, label: bytes, rng=None, msm=None, pcs=None):
        self.cs = StandardComposer(rng=rng)
        self.verifier_key = None
        self.preprocessed_transcript = PlonkTranscript(label)
        self.msm = msm
        self.pcs = pcs

    def key_transcript(self, label: bytes, message: bytes):
        self.preprocessed_transcript.t.append_message(label, message)

    def circuit_bound(self) -> int:
        return self.cs.circuit_bound()

    def preprocess(self, srs):
        self.verifier_key = prep.preprocess_verifier(
            self.cs, srs, self.preprocessed_transcript, msm=self.msm,
            pcs=self.pcs)
        return self.verifier_key

    def verify(self, proof, srs, public_inputs: dict) -> bool:
        return proof.verify(self.verifier_key,
                            self.preprocessed_transcript.clone(), srs,
                            public_inputs, pcs=self.pcs)


class Circuit:
    """Subclass and implement `gadget(composer)`; set `padded_circuit_size`.

    (reference circuit.rs Circuit trait)"""

    #: Circuit identifier associated constant (circuit.rs:214,
    #: `const CIRCUIT_ID: [u8; 32]`).  Subclasses may override with a
    #: 32-byte domain-separating identifier; the default mirrors the
    #: reference tests' `[0xff; 32]` (circuit.rs:366).
    CIRCUIT_ID: bytes = b"\xff" * 32

    def gadget(self, composer: StandardComposer):
        raise NotImplementedError

    def padded_circuit_size(self) -> int:
        raise NotImplementedError

    def compile(self, srs, rng=None):
        """Returns (prover_key, verifier_key, pi_positions) (circuit.rs:226)."""
        prover = Prover(b"CircuitCompilation", rng=rng)
        self.gadget(prover.cs)
        prover.preprocess(srs)
        verifier = Verifier(b"CircuitCompilation", rng=rng)
        self.gadget(verifier.cs)
        verifier.preprocess(srs)
        return (prover.prover_key, verifier.verifier_key,
                verifier.cs.intended_pi_pos)

    def gen_proof(self, srs, prover_key, transcript_init: bytes, rng=None):
        """NOTE (reference circuit.rs:262-286): in this path the transcript
        is NOT seeded with the circuit description — only the label. The
        matching `verify_proof` below behaves the same way."""
        prover = Prover(transcript_init, rng=rng)
        self.gadget(prover.cs)
        prover.prover_key = prover_key
        pi = dict(prover.cs.public_inputs)
        return prover.prove(srs), pi


def verify_proof(srs, plonk_verifier_key, proof, public_inputs: dict,
                 transcript_init: bytes) -> bool:
    """Free function (circuit.rs:295-314); fresh un-seeded transcript,
    mirroring Verifier::new + verify."""
    transcript = PlonkTranscript(transcript_init)
    return proof.verify(plonk_verifier_key, transcript, srs, public_inputs)


def gadget_tester(gadget, n: int, srs=None, rng=None, msm=None, pcs=None):
    """End-to-end fixture mirroring constraint_system/helper.rs:38-99."""
    from ..pcs import kzg
    if srs is None:
        srs = kzg.SRS.setup(2 * max(n, 32))

    prover = Prover(b"demo", rng=rng, msm=msm, pcs=pcs)
    prover.key_transcript(b"key", b"additional seed information")
    gadget(prover.cs)
    prover.preprocess(srs)
    public_inputs = dict(prover.cs.public_inputs)
    proof = prover.prove(srs)

    verifier = Verifier(b"demo", rng=rng, msm=msm, pcs=pcs)
    verifier.key_transcript(b"key", b"additional seed information")
    gadget(verifier.cs)
    verifier.preprocess(srs)
    assert verifier.verify(proof, srs, public_inputs), \
        "proof verification failed"
    return proof
