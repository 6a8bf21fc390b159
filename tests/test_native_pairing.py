"""Native C pairing core vs the pure-Python golden tower (exact Fq12)."""

import time

import numpy as np
import pytest

from arkplonk_tpu.curve import host as cv
from arkplonk_tpu.curve import native_pairing as npair

pytestmark = pytest.mark.skipif(
    not npair.available(), reason="C toolchain unavailable")


def _g1(k):
    return cv.G1.mul(cv.G1_GEN, k)


def _g2(k):
    return cv.G2.mul(cv.G2_GEN, k)


def test_single_pairing_matches_python():
    p, q = _g1(5), _g2(7)
    exp = cv.multi_pairing_py([(p, q)])
    got = npair.multi_pairing([(p, q)])
    assert got == exp


def test_bilinearity_native():
    # e(aP, bQ) == e(abP, Q)
    a, b = 11, 13
    lhs = npair.multi_pairing([(_g1(a), _g2(b))])
    rhs = npair.multi_pairing([(_g1(a * b), _g2(1))])
    assert lhs == rhs


def test_multi_pairing_product_and_identity():
    # e(P, Q) * e(-P, Q) == 1
    p, q = _g1(3), _g2(9)
    out = npair.multi_pairing([(p, q), (cv.G1.neg(p), q)])
    assert out == cv.F12_ONE
    # infinity entries are skipped
    out2 = npair.multi_pairing([(None, q), (p, None)])
    assert out2 == cv.F12_ONE


def test_multi_pairing_matches_python_product():
    pairs = [(_g1(2), _g2(3)), (_g1(4), _g2(5))]
    assert npair.multi_pairing(pairs) == cv.multi_pairing_py(pairs)


def test_g1_msm_matches_host():
    rng = np.random.default_rng(7)
    pts = [_g1(int.from_bytes(rng.bytes(16), "little")) for _ in range(9)]
    scalars = [int.from_bytes(rng.bytes(31), "little") % cv.R
               for _ in range(9)]
    pts[3] = None
    scalars[5] = 0
    exp = cv.msm_host([p for p, s in zip(pts, scalars)
                       if p is not None and s],
                      [s for p, s in zip(pts, scalars)
                       if p is not None and s])
    got = npair.g1_msm(pts, scalars)
    assert got == exp
    assert npair.g1_msm([None, pts[0]], [5, 0]) is None
