"""Device G1 Jacobian ops + Pippenger MSM vs host reference."""

import random

import jax.numpy as jnp
import pytest

from arkplonk_tpu.curve import host as cv
from arkplonk_tpu.curve import g1_jax as g1
from arkplonk_tpu.curve.msm import DeviceMSM
from arkplonk_tpu.fields.host import R

RNG = random.Random(0xC0FFEE)


def rand_points(n):
    return [cv.G1.mul(cv.G1_GEN, RNG.randrange(1, 1 << 48)) for _ in range(n)]


def test_jac_add_double():
    pts = rand_points(6) + [None, None]
    qts = rand_points(6) + [rand_points(1)[0], None]
    P = g1.encode_points(pts)
    Qp = g1.encode_points(qts)
    got = g1.decode_points(g1.jac_add(P, Qp))
    want = [cv.G1.add(p, q) for p, q in zip(pts, qts)]
    assert got == want
    got2 = g1.decode_points(g1.jac_double(P))
    want2 = [cv.G1.double(p) for p in pts]
    assert got2 == want2
    # doubling through add (equal operands)
    got3 = g1.decode_points(g1.jac_add(P, P))
    assert got3 == want2
    # inverse points -> identity
    negs = [cv.G1.neg(p) if p else None for p in pts]
    Np = g1.encode_points(negs)
    got4 = g1.decode_points(g1.jac_add(P, Np))
    assert got4 == [None] * len(pts)


def test_device_msm_matches_host():
    n = 37
    pts = rand_points(n)
    scalars = [RNG.randrange(R) for _ in range(n)]
    scalars[3] = 0
    scalars[5] = 1
    want = cv.msm_host(pts, scalars)
    got = DeviceMSM(pts).mul(scalars)
    assert got == want


def test_device_msm_small_scalars():
    # n chosen to pad to the same kernel shape (64) as the test above
    n = 40
    pts = rand_points(n)
    scalars = list(range(n))
    want = cv.msm_host(pts, scalars)
    got = DeviceMSM(pts).mul(scalars)
    assert got == want
