"""MSM v3 (chunked streaming kernels) vs the host golden MSM.

Covers both execution paths: the jnp fallback (what CPU test runs use)
and the Mosaic kernels in Pallas interpret mode (the code that runs on
the TPU), including the in-kernel weighted suffix reduction.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from arkplonk_tpu.curve import host as cv
from arkplonk_tpu.curve import msm3
from arkplonk_tpu.fields.jaxfield import FR


def _points(n, rng):
    base = [cv.G1.mul(cv.G1_GEN,
                      int.from_bytes(rng.bytes(31), "little") % cv.R)
            for _ in range(min(n, 64))]
    reps = -(-n // len(base))
    # distinct points: add i*G to avoid duplicate-point anomaly storms
    out = []
    g = cv.G1_GEN
    acc = g
    for i in range(n):
        out.append(cv.G1.add(base[i % len(base)], acc))
        acc = cv.G1.add(acc, g)
    return out


def test_v3_jnp_matches_host():
    rng = np.random.default_rng(1)
    n = 512
    pts = _points(n, rng)
    m = msm3.PippengerMSM3(pts)
    polys = [[int.from_bytes(rng.bytes(31), "little") % cv.R
              for _ in range(n)] for _ in range(3)]
    polys.append([0] * n)          # zero poly -> identity commitment
    stack = jnp.stack([jnp.asarray(FR.encode(p)) for p in polys], axis=1)
    got = m.commit_mont_batch(stack)
    for i, p in enumerate(polys):
        assert got[i] == cv.msm_host(pts, p), f"poly {i}"


@pytest.mark.slow
def test_v3_kernels_interpret_match_host():
    """Exercise the Mosaic accumulate + weighted-reduce kernels in
    interpret mode (exact same code path as the TPU).

    Small configuration (n=64, P=1, c=4): the interpreter lowers every
    in-kernel limb op to real XLA ops, so the graph grows with
    P*W*B lanes x kernel ops — the previous n=256/P=2 config took >25
    minutes of XLA:CPU compile alone.  All code paths (chunked masked
    accumulate, dynamic-shift ladder, signed digits) are identical."""
    rng = np.random.default_rng(2)
    n = 64
    pts = _points(n, rng)
    c = 4
    P = 1
    polys = [[int.from_bytes(rng.bytes(31), "little") % cv.R
              for _ in range(n)] for _ in range(P)]
    stack = jnp.stack([jnp.asarray(FR.encode(p)) for p in polys], axis=1)
    pxy = msm3.encode_points_rows(pts)
    (wx, wy, wz), anom = jax.jit(
        lambda s, t: msm3._msm_body_v3(n, P, c, s, t, interpret=True)
    )(stack, pxy)
    assert int(anom) == 0
    W, _ = msm3._window_plan(c)
    decoded = msm3.decode_raw_jacobian(
        np.asarray(wx), np.asarray(wy), np.asarray(wz))
    got = msm3.recombine_windows(decoded, P, W, c)
    for i, p in enumerate(polys):
        assert got[i] == cv.msm_host(pts, p), f"poly {i}"
