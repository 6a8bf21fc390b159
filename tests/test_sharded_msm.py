"""Mesh-sharded MSM vs host reference."""

import random

import jax

from arkplonk_tpu.curve import host as cv
from arkplonk_tpu.curve.msm import ShardedDeviceMSM
from arkplonk_tpu.fields.jaxfield import FR
from arkplonk_tpu.mesh import sharding as ms

RNG = random.Random(0x5A)


def test_sharded_msm_matches_host():
    mesh = ms.make_mesh(8)
    n = 64
    pts = [cv.G1.mul(cv.G1_GEN, RNG.randrange(1, 1 << 48)) for _ in range(n)]
    scalars = [RNG.randrange(cv.R) for _ in range(n)]
    scalars[0] = 0
    m = ShardedDeviceMSM(mesh, pts)
    got = m.commit_mont(FR.encode_fast(scalars))
    want = cv.msm_host(pts, scalars)
    assert got == want
