"""Round-2 Pippenger MSM vs the exact host MSM (CPU, jnp point path)."""

import numpy as np
import jax.numpy as jnp
import pytest

from arkplonk_tpu.curve import host as cv
from arkplonk_tpu.curve import msm2
from arkplonk_tpu.fields.jaxfield import FR


def _points(n, seed):
    rng = np.random.default_rng(seed)
    return [cv.G1.mul(cv.G1_GEN, int.from_bytes(rng.bytes(31), "little"))
            for _ in range(n)]


@pytest.mark.parametrize("n", [32, 100, 257])
def test_msm_matches_host(n):
    pts = _points(n, 1)
    rng = np.random.default_rng(2)
    scalars = [int.from_bytes(rng.bytes(31), "little") % cv.R
               for _ in range(n)]
    exp = cv.msm_host(pts, scalars)
    got = msm2.PippengerMSM(pts).mul(scalars)
    assert got == exp


def test_msm_special_scalars():
    n = 64
    pts = _points(n, 3)
    scalars = [0] * n
    scalars[0] = 1
    scalars[1] = cv.R - 1
    scalars[5] = (cv.R - 1) // 2
    scalars[7] = 0xFFFF_FFFF_FFFF_FFFF
    exp = cv.msm_host(pts, scalars)
    m = msm2.PippengerMSM(pts)
    assert m.mul(scalars) == exp
    # all-zero -> identity (None)
    assert m.mul([0] * n) is None


def test_msm_batch():
    n = 64
    pts = _points(n, 4)
    rng = np.random.default_rng(5)
    polys = [[int.from_bytes(rng.bytes(31), "little") % cv.R
              for _ in range(n)] for _ in range(3)]
    stack = jnp.stack(
        [jnp.asarray(FR.encode(p)) for p in polys], axis=1)  # (L, 3, n)
    m = msm2.PippengerMSM(pts)
    got = m.commit_mont_batch(stack)
    for g, p in zip(got, polys):
        assert g == cv.msm_host(pts, p)


def test_window_plan_invariant():
    # the +H signed-digit bias must never overflow the window span
    for c in range(6, 17):
        W, H = msm2._window_plan(c)
        assert (1 << 255) + H < 1 << (c * W)
        # and digits reconstruct: sum (d_w - half) 2^(cw) == s
        half = 1 << (c - 1)
        for s in (0, 1, cv.R - 1, (1 << 255) - 1):
            u = s + H
            acc = 0
            for w in range(W):
                d = (u >> (c * w)) & ((1 << c) - 1)
                acc += (d - half) << (c * w)
            assert acc == s, (c, s)
