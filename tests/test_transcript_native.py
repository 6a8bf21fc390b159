"""Native C STROBE core vs pure-Python: byte-exact equivalence."""

import pytest

from arkplonk_tpu.transcript import native
from arkplonk_tpu.transcript.merlin import (Strobe128, Transcript,
                                            MERLIN_PROTOCOL_LABEL)


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native transcript lib not built")


def test_strobe_equivalence():
    py = Strobe128(MERLIN_PROTOCOL_LABEL)
    c = native.CStrobe128(MERLIN_PROTOCOL_LABEL)
    for s in (py, c):
        s.meta_ad(b"dom-sep", False)
        s.meta_ad((4).to_bytes(4, "little"), True)
        s.ad(b"test", False)
    assert py.prf(32, False) == c.prf(32, False)
    # continue after PRF
    for s in (py, c):
        s.meta_ad(b"more", False)
        s.ad(b"x" * 500, False)  # spans several keccak blocks
    assert py.prf(64, False) == c.prf(64, False)


def test_transcript_uses_native_and_matches_vector():
    t = Transcript(b"test protocol")
    assert isinstance(t.strobe, native.CStrobe128)
    t.append_message(b"some label", b"some data")
    got = t.challenge_bytes(b"challenge", 32)
    assert got.hex() == \
        "d5a21972d0d5fe320c0d263fac7fffb8145aa640af6e9bca177c03c7efcf0615"


def test_native_clone():
    t = Transcript(b"proto")
    t.append_message(b"a", b"b")
    c = t.clone()
    assert t.challenge_bytes(b"c", 16) == c.challenge_bytes(b"c", 16)
