"""Golden vectors for the ark-serialize v0.3 wire conventions.

VERDICT round-1 item 2: one wrong flag bit silently changes every
challenge.  No arkworks binary can run in this sandbox (no Rust
toolchain, zero egress), so these vectors pin the conventions two ways:

1. The G1 generator's compressed bytes are cross-checked against the
   *public* zcash-format generator encoding
   97f1d3a73197d7942695638c4fa9ac0fc3688c4f9774b905a14e3a3f171bac58
   6c55e83ff97a1aeffb3af00adb22c6bb  (draft-irtf-cfrg-pairing-friendly
   / zcash BLS12-381 spec): ark-serialize is the byte-REVERSE of that
   x encoding (little- vs big-endian), the data bits of the top byte
   must agree, and zcash's sign bit (y > (q-1)/2) must be the negation
   of ark's PositiveY (y > -y) — same comparison, so the two formats'
   sign bits must match for every point.
2. Frozen hex of the ark v0.3 layout (SWFlags: Infinity=1<<6,
   NegativeY=1<<7, PositiveY=0; x little-endian; G2 = c0 || c1 with
   flags on the last byte of c1).  Any byte drift fails here.
"""

import hashlib

import pytest

from arkplonk_tpu.transcript import serialize as ser
from arkplonk_tpu.curve import host as cv
from arkplonk_tpu.fields.host import Q, R, CURVE

pytestmark = pytest.mark.skipif(
    CURVE != "bls12_381", reason="golden vectors are BLS12-381")

ZCASH_G1_GEN_COMPRESSED = bytes.fromhex(
    "97f1d3a73197d7942695638c4fa9ac0fc3688c4f9774b905a14e3a3f171bac58"
    "6c55e83ff97a1aeffb3af00adb22c6bb")

GOLDEN = {
    "g1_gen": "bbc622db0af03afbef1a7af93fe8556c58ac1b173f3a4ea105b97497"
              "4f8c68c30faca94f8c63952694d79731a7d3f197",
    "g1_gen_neg": "bbc622db0af03afbef1a7af93fe8556c58ac1b173f3a4ea105b97497"
                  "4f8c68c30faca94f8c63952694d79731a7d3f117",
    "g1_inf": "00000000000000000000000000000000000000000000000000000000"
              "0000000000000000000000000000000000000040",
    "g1_7": "b7fc7e62705aef542dbcc5d4bce62a7bf22eef1691bef30dac121fb2"
            "00ca7dc9a4403b90da4501cfee1935b9bef32819",
    "g2_gen": "b8bd21c1c85680d4efbb05a82603ac0b77d1e37a640b51b4023b40fa"
              "d47ae4c65110c52d27050826910a8ff0b2a24a02"
              "7e2b045d057dace5575d941312f14c3349507fdcbb61dab51ab62099"
              "d0d06b59654f2788a0d3ac7d609f7152602be093",
    "fr_1": "0100000000000000000000000000000000000000000000000000000000000000",
    "fr_rm1": "00000000fffffffffe5bfeff02a4bd5305d8a10908d83933487d9d29"
              "53a7ed73",
}


def test_g1_generator_matches_public_zcash_encoding():
    ours = ser.g1_to_bytes(cv.G1_GEN)
    # x bytes: ark is little-endian, zcash big-endian; mask both flag sets
    ark_x = bytearray(ours)
    ark_x[-1] &= 0x3F
    zc_x = bytearray(ZCASH_G1_GEN_COMPRESSED)
    zc_x[0] &= 0x1F
    assert bytes(ark_x) == bytes(reversed(zc_x))
    # sign bits: zcash bit5-of-first-byte is set iff y > (q-1)/2, which is
    # exactly ark's NegativeY... no: ark NegativeY means y <= -y, i.e.
    # y <= (q-1)/2 is FALSE case.  y > q - y  <=>  y > (q-1)/2 (q odd), so
    # ark PositiveY == zcash sign-bit-set; NegativeY == sign bit clear.
    zcash_sign = bool(ZCASH_G1_GEN_COMPRESSED[0] & 0x20)
    ark_negative = bool(ours[-1] & 0x80)
    assert zcash_sign == (not ark_negative)


def test_frozen_vectors():
    g = cv.G1_GEN
    assert ser.g1_to_bytes(g).hex() == GOLDEN["g1_gen"]
    assert ser.g1_to_bytes(cv.G1.neg(g)).hex() == GOLDEN["g1_gen_neg"]
    assert ser.g1_to_bytes(None).hex() == GOLDEN["g1_inf"]
    assert ser.g1_to_bytes(cv.G1.mul(g, 7)).hex() == GOLDEN["g1_7"]
    assert ser.g2_to_bytes(cv.G2_GEN).hex() == GOLDEN["g2_gen"]
    assert ser.fr_to_bytes(1).hex() == GOLDEN["fr_1"]
    assert ser.fr_to_bytes(R - 1).hex() == GOLDEN["fr_rm1"]


def test_flag_semantics():
    # NegativeY = 1<<7 set exactly when y <= -y (canonical integers)
    g = cv.G1_GEN
    for k in range(2, 30):
        p = cv.G1.mul(g, k)
        b = ser.g1_to_bytes(p)
        neg = bool(b[-1] & 0x80)
        assert neg == (p[1] <= Q - p[1])
        assert not (b[-1] & 0x40)
        assert ser.g1_from_bytes(b) == p
    # infinity: zero x, bit6 only; bit6|bit7 together is rejected
    inf = ser.g1_to_bytes(None)
    assert inf[-1] == 0x40 and all(c == 0 for c in inf[:-1])
    bad = bytearray(inf)
    bad[-1] = 0xC0
    with pytest.raises(ValueError):
        ser.g1_from_bytes(bytes(bad))


def test_challenge_sequence_fixture():
    """Frozen Fiat-Shamir challenge sequence for a fixed tiny proof
    session: catches ANY byte drift in transcript appends (labels,
    point/scalar serialization) or the challenge mapping."""
    from arkplonk_tpu.transcript.plonk import PlonkTranscript
    t = PlonkTranscript(b"golden")
    t.append_fr(b"s", 12345)
    t.append_g1(b"p", cv.G1.mul(cv.G1_GEN, 9))
    c1 = t.challenge_scalar(b"alpha")
    t.append_fr(b"alpha", c1)
    t.append_g1(b"q", None)
    c2 = t.challenge_scalar(b"beta")
    digest = hashlib.sha256(
        c1.to_bytes(32, "little") + c2.to_bytes(32, "little")).hexdigest()
    assert digest == ("12e05df8ea563ed234ee9fac8832a66f"
                      "2c38f5d255e961ba853b4cb338e38155"), (
        hex(c1), hex(c2), digest)
