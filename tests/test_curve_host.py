"""Host curve arithmetic: group laws, MSM reference, pairing bilinearity."""

import random

from arkplonk_tpu.fields import bls12_381 as C
from arkplonk_tpu.fields.host import R
from arkplonk_tpu.curve import host as cv

RNG = random.Random(7)


def test_generators_on_curve():
    assert cv.g1_is_on_curve(cv.G1_GEN)
    assert cv.g2_is_on_curve(cv.G2_GEN)


def test_g1_group_law():
    g = cv.G1_GEN
    g2 = cv.G1.double(g)
    g3 = cv.G1.add(g2, g)
    assert cv.G1.add(g, g2) == g3
    assert cv.G1.mul(g, 3) == g3
    assert cv.G1.add(g3, cv.G1.neg(g3)) is None
    # subgroup order
    assert cv.G1.mul(g, R) is None
    # jacobian path agrees
    assert cv.jac_to_affine(cv.jac_mul(cv.jac_from_affine(g), 12345)) == \
        cv.G1.mul(g, 12345)


def test_g2_group_law():
    h = cv.G2_GEN
    h5 = cv.G2.mul(h, 5)
    assert cv.g2_is_on_curve(h5)
    assert cv.G2.mul(h, R) is None


def test_msm_host():
    n = 10
    scalars = [RNG.randrange(R) for _ in range(n)]
    points = [cv.G1.mul(cv.G1_GEN, RNG.randrange(1 << 40)) for _ in range(n)]
    want = None
    for s, p in zip(scalars, points):
        want = cv.G1.add(want, cv.G1.mul(p, s))
    got = cv.msm_host(points, scalars)
    assert got == want


def test_fq2_field():
    a = (RNG.randrange(cv.Q), RNG.randrange(cv.Q))
    ai = cv.f2_inv(a)
    assert cv.f2_mul(a, ai) == cv.F2_ONE
    s = cv.f2_sqrt(cv.f2_sqr(a))
    assert s is not None and cv.f2_sqr(s) == cv.f2_sqr(a)


def test_fq12_field():
    a = tuple(tuple((RNG.randrange(cv.Q), RNG.randrange(cv.Q))
                    for _ in range(3)) for _ in range(2))
    ai = cv.f12_inv(a)
    assert cv.f12_mul(a, ai) == cv.F12_ONE


def test_pairing_bilinear():
    e = cv.pairing(cv.G1_GEN, cv.G2_GEN)
    assert e != cv.F12_ONE  # non-degenerate
    a, b = 13, 29
    lhs = cv.pairing(cv.G1.mul(cv.G1_GEN, a), cv.G2.mul(cv.G2_GEN, b))
    rhs = cv.f12_pow(e, a * b)
    assert lhs == rhs
    # e(P, -Q) = e(P, Q)^-1
    inv = cv.pairing(cv.G1_GEN, cv.G2.neg(cv.G2_GEN))
    assert cv.f12_mul(e, inv) == cv.F12_ONE


def test_multi_pairing_kzg_shape():
    # e(aG1, G2) * e(-G1, aG2) == 1  (the KZG-style product check)
    a = 777
    out = cv.multi_pairing([
        (cv.G1.mul(cv.G1_GEN, a), cv.G2_GEN),
        (cv.G1.neg(cv.G1_GEN), cv.G2.mul(cv.G2_GEN, a)),
    ])
    assert out == cv.F12_ONE
