"""Fused Pallas jac_add kernel: interpret-mode equivalence vs jnp path."""

import random

import jax
import pytest

from arkplonk_tpu.curve import host as cv
from arkplonk_tpu.curve import g1_jax as g1
from arkplonk_tpu.curve.pallas_point import jac_add_pallas

RNG = random.Random(0xF0F0)


@pytest.mark.skip(reason="EXPERIMENTAL: fused point kernel compiles "
                         ">9min on the sandbox TPU and is too large for "
                         "the interpreter; enable with round-2 split")
def test_kernel_matches_jnp():
    n = 10
    pts = [cv.G1.mul(cv.G1_GEN, RNG.randrange(1, 1 << 40)) for _ in range(n)]
    qts = [cv.G1.mul(cv.G1_GEN, RNG.randrange(1, 1 << 40)) for _ in range(n)]
    # exercise the special branches
    pts[0] = None                      # p = identity
    qts[1] = None                      # q = identity
    qts[2] = pts[2]                    # doubling
    qts[3] = cv.G1.neg(pts[3])         # inverse -> identity
    pts[4] = None
    qts[4] = None                      # both identity
    P = g1.encode_points(pts)
    Q = g1.encode_points(qts)
    got = g1.decode_points(jac_add_pallas(P, Q))
    want = [cv.G1.add(a, b) for a, b in zip(pts, qts)]
    assert got == want
