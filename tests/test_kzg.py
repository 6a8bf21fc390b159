"""KZG10 commit/open/check host reference tests."""

import random

from arkplonk_tpu.fields.host import R
from arkplonk_tpu.pcs import kzg
from arkplonk_tpu.curve import host as cv

RNG = random.Random(99)


def _srs(d=32):
    return kzg.SRS.setup(d)


def test_srs_structure():
    srs = _srs(8)
    # g1[i] should be tau^i * G: check pairing relation
    # e(g1[i+1], H) == e(g1[i], beta_h)
    lhs = cv.pairing(srs.g1[3], srs.h)
    rhs = cv.pairing(srs.g1[2], srs.beta_h)
    assert lhs == rhs
    assert srs.g1[0] == cv.G1_GEN


def test_poly_division():
    p = [RNG.randrange(R) for _ in range(10)]
    z = RNG.randrange(R)
    v = kzg.poly_eval(p, z)
    p0 = list(p)
    p0[0] = (p0[0] - v) % R
    q = kzg.divide_by_linear(p0, z)
    # q*(X-z) == p - v
    back = kzg.poly_add(kzg.poly_mul(q, [(-z) % R, 1]), [v])
    assert [c % R for c in back] == p


def test_open_check_single():
    srs = _srs(32)
    p = [RNG.randrange(R) for _ in range(20)]
    c = kzg.commit(srs, p)
    z = RNG.randrange(R)
    chi = RNG.randrange(R)
    proof = kzg.open_polys(srs, [p], z, chi)
    assert kzg.check(srs, [c], z, [kzg.poly_eval(p, z)], proof, chi)
    # wrong value fails
    assert not kzg.check(srs, [c], z, [(kzg.poly_eval(p, z) + 1) % R],
                         proof, chi)


def test_open_check_aggregate():
    srs = _srs(32)
    polys = [[RNG.randrange(R) for _ in range(RNG.randrange(5, 30))]
             for _ in range(4)]
    comms = [kzg.commit(srs, p) for p in polys]
    z = RNG.randrange(R)
    chi = RNG.randrange(R)
    proof = kzg.open_polys(srs, polys, z, chi)
    vals = [kzg.poly_eval(p, z) for p in polys]
    assert kzg.check(srs, comms, z, vals, proof, chi)
    # tampered eval fails
    bad = list(vals)
    bad[2] = (bad[2] + 5) % R
    assert not kzg.check(srs, comms, z, bad, proof, chi)
    # wrong challenge fails
    assert not kzg.check(srs, comms, z, vals, proof, (chi + 1) % R)


def test_zero_poly_commit():
    srs = _srs(8)
    assert kzg.commit(srs, [0, 0, 0]) is None


def test_native_fixed_base_powers_matches_python():
    """SRS generation: C windowed fixed-base (native/pairing.c
    g1_fixed_base_powers) must agree with the exact-Python ladder and
    with per-scalar G1.mul (reference SRS semantics:
    commitment.rs:29-37 KZG10::setup powers of tau)."""
    from arkplonk_tpu.curve import native_pairing as npr
    if not npr.available():
        import pytest
        pytest.skip("native pairing core unavailable")
    rng = random.Random(42)
    tau = rng.randrange(1, R)
    count = 33
    taus = [pow(tau, i, R) for i in range(count)]
    native = npr.g1_fixed_base_powers(cv.G1_GEN, taus)
    for i in (0, 1, 2, 17, 32):
        assert native[i] == cv.G1.mul(cv.G1_GEN, taus[i])
    # edge scalars: 0 -> identity, r-1 -> -G
    edge = npr.g1_fixed_base_powers(cv.G1_GEN, [0, R - 1])
    assert edge[0] is None
    assert edge[1] == cv.G1.mul(cv.G1_GEN, R - 1)


def test_srs_cache_integrity(tmp_path):
    """A corrupted or tampered cached .srs must be rejected on load
    (digest trailer + generator/tau head check in SRS.setup)."""
    import pytest
    srs = kzg.SRS.setup(8, cache_dir=str(tmp_path))
    (path,) = list(tmp_path.glob("*.srs"))
    # warm reload passes both checks
    srs2 = kzg.SRS.setup(8, cache_dir=str(tmp_path))
    assert srs2.g1 == srs.g1
    # flip one byte inside a point -> digest check fires
    data = bytearray(path.read_bytes())
    data[len(kzg._SRS_MAGIC) + 8 + 100] ^= 0x01
    path.write_bytes(bytes(data))
    with pytest.raises(AssertionError, match="corrupt"):
        kzg.SRS.setup(8, cache_dir=str(tmp_path))
    # digest-less legacy file with a wrong head -> head check fires
    g1, h, bh = srs.g1, srs.h, srs.beta_h
    body = bytearray()
    import struct as _s
    body += _s.pack("<Q", len(g1))
    for x, y in reversed(g1):  # reversed: g1[0] is no longer the generator
        body += x.to_bytes(48, "little") + y.to_bytes(48, "little")
    for pt in (h, bh):
        for c in (*pt[0], *pt[1]):
            body += c.to_bytes(48, "little")
    path.write_bytes(kzg._SRS_MAGIC + bytes(body))
    with pytest.raises(AssertionError, match="mismatch"):
        kzg.SRS.setup(8, cache_dir=str(tmp_path))
