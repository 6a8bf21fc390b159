"""TranscriptProtocol: the PLONK-specific transcript operations.

Mirrors /root/reference/plonk-core/src/transcript.rs:16-50 exactly:
labels and byte layouts must match for bit-exact Fiat-Shamir challenges.
"""

from __future__ import annotations

from .merlin import Transcript
from . import serialize as ser


class PlonkTranscript:
    def __init__(self, label: bytes):
        self.t = Transcript(label)

    def clone(self) -> "PlonkTranscript":
        c = object.__new__(PlonkTranscript)
        c.t = self.t.clone()
        return c

    # `append` with CanonicalSerialize'd items (transcript.rs:28-32)
    def append_fr(self, label: bytes, x: int):
        self.t.append_message(label, ser.fr_to_bytes(x))

    def append_g1(self, label: bytes, p):
        self.t.append_message(label, ser.g1_to_bytes(p))

    def append_pi(self, label: bytes, pi_bytes: bytes):
        """Public-input struct append (prover.rs:182 appends the PI object)."""
        self.t.append_message(label, pi_bytes)

    # transcript.rs:34-44: 31 challenge bytes -> LE int (< r always)
    def challenge_scalar(self, label: bytes) -> int:
        buf = self.t.challenge_bytes(label, 31)
        return int.from_bytes(buf, "little")

    # transcript.rs:46-50
    def circuit_domain_sep(self, n: int):
        self.t.append_message(b"dom-sep", b"circuit_size")
        self.t.append_u64(b"n", n)
