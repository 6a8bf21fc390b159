"""Device STROBE/Merlin transcript: byte-exact vs the host Strobe128."""

import numpy as np
import jax
import jax.numpy as jnp

from arkplonk_tpu.transcript.merlin import Strobe128, MERLIN_PROTOCOL_LABEL
from arkplonk_tpu.transcript.plonk import PlonkTranscript
from arkplonk_tpu.transcript import device_strobe as ds
from arkplonk_tpu.transcript import serialize as ser
from arkplonk_tpu.fields.jaxfield import FR
from arkplonk_tpu.fields.host import R
from arkplonk_tpu.curve import host as cv


def _tobytes(arr):
    return bytes(np.asarray(arr).astype(np.uint8))


def test_keccak_matches_host():
    from arkplonk_tpu.transcript.keccak import keccak_f1600_bytes
    rng = np.random.default_rng(0)
    st = bytearray(rng.integers(0, 256, 200, dtype=np.uint8).tobytes())
    dev = ds.keccak_f1600_dev(jnp.asarray(
        np.frombuffer(bytes(st), dtype=np.uint8).astype(np.uint32)))
    keccak_f1600_bytes(st)
    assert _tobytes(dev) == bytes(st)


def test_strobe_schedule_matches_host():
    """Mixed absorb/squeeze schedule incl. >166-byte spills."""
    host = Strobe128(MERLIN_PROTOCOL_LABEL)
    dev = ds.DeviceStrobe.from_host(Strobe128(MERLIN_PROTOCOL_LABEL))
    rng = np.random.default_rng(1)
    for size in (3, 48, 200, 166, 1):
        data = rng.integers(0, 256, size, dtype=np.uint8).tobytes()
        host.meta_ad(b"lbl", False)
        dev.meta_ad_const(b"lbl", False)
        host.ad(data, False)
        dev.ad(jnp.asarray(np.frombuffer(data, np.uint8).astype(np.uint32)),
               False)
        hb = host.prf(31, False)
        db = dev.prf(31, False)
        assert _tobytes(db) == hb
        assert dev.pos == host.pos
        assert dev.pos_begin == host.pos_begin
    assert _tobytes(dev.state) == bytes(host.state)


def test_plonk_transcript_parity():
    """Full PLONK-style schedule: appends + challenges match the host
    PlonkTranscript (and thus the merlin wire format)."""
    ht = PlonkTranscript(b"par")
    dt = ds.DeviceTranscript.from_host_plonk(PlonkTranscript(b"par"))

    p = cv.G1.mul(cv.G1_GEN, 17)
    pb = ser.g1_to_bytes(p)
    ht.t.append_message(b"w_l", pb)
    dt.append_message(
        b"w_l", jnp.asarray(np.frombuffer(pb, np.uint8).astype(np.uint32)))

    hc = ht.challenge_scalar(b"zeta")
    dc_mont = dt.challenge_fr_mont(b"zeta")
    dc = FR.decode_fast(dc_mont)[0]
    assert dc == hc

    ht.append_fr(b"zeta", hc)
    from arkplonk_tpu.fields.limb import encode_ints
    raw = jnp.asarray(encode_ints([hc], FR.L))  # non-Montgomery limbs
    dt.append_fr_raw(b"zeta", raw)

    hc2 = ht.challenge_scalar(b"beta")
    dc2 = FR.decode_fast(dt.challenge_fr_mont(b"beta"))[0]
    assert dc2 == hc2 and 0 <= dc2 < R
