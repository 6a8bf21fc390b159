"""Keccak/STROBE/Merlin transcript tests.

The keccak permutation is validated bit-exactly against hashlib's SHA3; the
Merlin layer against the published merlin test vector ("test protocol").
"""

import hashlib

from arkplonk_tpu.transcript.keccak import sha3_256
from arkplonk_tpu.transcript.merlin import Transcript
from arkplonk_tpu.transcript.plonk import PlonkTranscript
from arkplonk_tpu.transcript import serialize as ser
from arkplonk_tpu.curve import host as cv
from arkplonk_tpu.fields.host import R


def test_keccak_vs_hashlib():
    for msg in [b"", b"abc", b"x" * 135, b"y" * 136, b"z" * 500]:
        assert sha3_256(msg) == hashlib.sha3_256(msg).digest()


def test_merlin_known_vector():
    # From the merlin crate's transcript equivalence test:
    # Transcript::new(b"test protocol"); append_message(b"some label",
    # b"some data"); 32 challenge bytes for b"challenge".
    t = Transcript(b"test protocol")
    t.append_message(b"some label", b"some data")
    got = t.challenge_bytes(b"challenge", 32)
    assert got.hex() == \
        "d5a21972d0d5fe320c0d263fac7fffb8145aa640af6e9bca177c03c7efcf0615"


def test_merlin_determinism_and_sensitivity():
    t1 = Transcript(b"proto")
    t2 = Transcript(b"proto")
    t1.append_message(b"l", b"data")
    t2.append_message(b"l", b"data")
    assert t1.challenge_bytes(b"c", 16) == t2.challenge_bytes(b"c", 16)
    t3 = Transcript(b"proto")
    t3.append_message(b"l", b"datb")
    assert t3.challenge_bytes(b"c", 16) != t1.clone().challenge_bytes(b"c", 16)


def test_clone_independent():
    t = PlonkTranscript(b"x")
    t.append_fr(b"f", 42)
    c = t.clone()
    a = t.challenge_scalar(b"ch")
    b = c.challenge_scalar(b"ch")
    assert a == b < R
    t.append_fr(b"g", 1)
    c.append_fr(b"g", 2)
    assert t.challenge_scalar(b"ch") != c.challenge_scalar(b"ch")


def test_g1_serde_roundtrip():
    g = cv.G1_GEN
    for p in [None, g, cv.G1.mul(g, 7), cv.G1.neg(cv.G1.mul(g, 7))]:
        b = ser.g1_to_bytes(p)
        assert len(b) == 48
        assert ser.g1_from_bytes(b) == p


def test_g2_serde_roundtrip():
    h = cv.G2_GEN
    for p in [None, h, cv.G2.mul(h, 11), cv.G2.neg(cv.G2.mul(h, 11))]:
        b = ser.g2_to_bytes(p)
        assert len(b) == 96
        assert ser.g2_from_bytes(b) == p
