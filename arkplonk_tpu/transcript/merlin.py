"""Merlin transcript (STROBE-128) — byte-exact host Fiat-Shamir.

Re-implements, from the STROBE/Merlin specifications, the transcript the
reference gets from the `merlin` crate (v3.0), wrapped with the
`TranscriptProtocol` extensions of
/root/reference/plonk-core/src/transcript.rs:16-50:
  - append(label, item)        -> append_message(label, canonical_serialize(item))
  - challenge_scalar(label)    -> 31 challenge bytes -> LE integer (< r)
  - circuit_domain_sep(n)      -> append_message(b"dom-sep", b"circuit_size");
                                  append_u64(b"n", n)

Bit-exactness target per SURVEY.md §7.3; validated against the published
Merlin test vector in tests/test_transcript.py.
"""

from __future__ import annotations

from .keccak import keccak_f1600_bytes

STROBE_R = 166
FLAG_I = 1
FLAG_A = 1 << 1
FLAG_C = 1 << 2
FLAG_T = 1 << 3
FLAG_M = 1 << 4
FLAG_K = 1 << 5

MERLIN_PROTOCOL_LABEL = b"Merlin v1.0"


class Strobe128:
    """STROBE-128 duplex (only the ops Merlin needs: AD / meta-AD / PRF)."""

    def __init__(self, protocol_label: bytes):
        st = bytearray(200)
        st[0:6] = bytes([1, STROBE_R + 2, 1, 0, 1, 96])
        st[6:18] = b"STROBEv1.0.2"
        keccak_f1600_bytes(st)
        self.state = st
        self.pos = 0
        self.pos_begin = 0
        self.cur_flags = 0
        self.meta_ad(protocol_label, False)

    def _run_f(self):
        self.state[self.pos] ^= self.pos_begin
        self.state[self.pos + 1] ^= 0x04
        self.state[STROBE_R + 1] ^= 0x80
        keccak_f1600_bytes(self.state)
        self.pos = 0
        self.pos_begin = 0

    def _absorb(self, data: bytes):
        for byte in data:
            self.state[self.pos] ^= byte
            self.pos += 1
            if self.pos == STROBE_R:
                self._run_f()

    def _squeeze(self, n: int) -> bytes:
        out = bytearray(n)
        for i in range(n):
            out[i] = self.state[self.pos]
            self.state[self.pos] = 0
            self.pos += 1
            if self.pos == STROBE_R:
                self._run_f()
        return bytes(out)

    def _begin_op(self, flags: int, more: bool):
        if more:
            assert self.cur_flags == flags, "flag mismatch on continued op"
            return
        assert flags & FLAG_T == 0, "T flag unsupported"
        old_begin = self.pos_begin
        self.pos_begin = self.pos + 1
        self.cur_flags = flags
        self._absorb(bytes([old_begin, flags]))
        force_f = flags & (FLAG_C | FLAG_K) != 0
        if force_f and self.pos != 0:
            self._run_f()

    def meta_ad(self, data: bytes, more: bool):
        self._begin_op(FLAG_M | FLAG_A, more)
        self._absorb(data)

    def ad(self, data: bytes, more: bool):
        self._begin_op(FLAG_A, more)
        self._absorb(data)

    def prf(self, n: int, more: bool) -> bytes:
        self._begin_op(FLAG_I | FLAG_A | FLAG_C, more)
        return self._squeeze(n)

    def clone(self) -> "Strobe128":
        c = object.__new__(Strobe128)
        c.state = bytearray(self.state)
        c.pos = self.pos
        c.pos_begin = self.pos_begin
        c.cur_flags = self.cur_flags
        return c


def _make_strobe(protocol_label: bytes):
    """Prefer the native C STROBE core (native/transcript.c) when built."""
    from . import native
    if native.available():
        return native.CStrobe128(protocol_label)
    return Strobe128(protocol_label)


class Transcript:
    """Merlin v1.0 transcript."""

    def __init__(self, label: bytes):
        self.strobe = _make_strobe(MERLIN_PROTOCOL_LABEL)
        self.append_message(b"dom-sep", label)

    def clone(self) -> "Transcript":
        t = object.__new__(Transcript)
        t.strobe = self.strobe.clone()
        return t

    def append_message(self, label: bytes, message: bytes):
        self.strobe.meta_ad(label, False)
        self.strobe.meta_ad(len(message).to_bytes(4, "little"), True)
        self.strobe.ad(message, False)

    def append_u64(self, label: bytes, x: int):
        self.append_message(label, x.to_bytes(8, "little"))

    def challenge_bytes(self, label: bytes, n: int) -> bytes:
        self.strobe.meta_ad(label, False)
        self.strobe.meta_ad(n.to_bytes(4, "little"), True)
        return self.strobe.prf(n, False)
