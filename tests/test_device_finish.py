"""Device MSM finish (recombination + affine + serialization) vs host."""

import numpy as np
import jax.numpy as jnp

from arkplonk_tpu.curve import host as cv
from arkplonk_tpu.curve import device_finish as df
from arkplonk_tpu.curve import g1_jax as g1
from arkplonk_tpu.curve.msm2 import recombine_windows
from arkplonk_tpu.transcript import serialize as ser
from arkplonk_tpu.fields.jaxfield import FQ
from arkplonk_tpu.fields.limb import limbs_to_vec


def _enc_jac(points):
    """Affine host points -> (L, P) Montgomery Jacobian arrays (z=1)."""
    px, py, _ = g1.encode_points(points)
    one = np.asarray(FQ.ones((len(points),)))
    return jnp.asarray(px), jnp.asarray(py), jnp.asarray(one)


def test_fq_inv_device():
    xs = [5, 7, 12345678901234567890 % cv.Q, 0]
    enc = np.stack([np.asarray(FQ.encode(x)) for x in xs], axis=1)
    inv = df.fq_inv_device(jnp.asarray(enc))
    raw = limbs_to_vec(np.asarray(FQ.from_mont(inv)))
    from arkplonk_tpu.fields.host import fq_inv
    for x, got in zip(xs, raw):
        assert got == (fq_inv(x) if x else 0)


def test_recombine_and_serialize_matches_host():
    rng = np.random.default_rng(3)
    P, W, c = 2, 5, 7
    pts = [cv.G1.mul(cv.G1_GEN, int(rng.integers(2, 1 << 60)))
           for _ in range(P * W)]
    pts[3] = None  # an infinity window sum
    enc_pts = [p if p is not None else None for p in pts]
    px, py, _ = g1.encode_points([p or cv.G1_GEN for p in pts])
    one = np.asarray(FQ.ones((P * W,))).copy()
    for i, p in enumerate(pts):
        if p is None:
            one[:, i] = 0  # z=0 -> infinity
    (jx, jy, jz), anom = df.recombine_device(
        jnp.asarray(px), jnp.asarray(py), jnp.asarray(one), P, W, c)
    assert int(anom) == 0
    xraw, yraw, inf, byts = df.to_affine_bytes(jx, jy, jz)

    exp = recombine_windows(pts, P, W, c)
    xs = limbs_to_vec(np.asarray(xraw))
    ys = limbs_to_vec(np.asarray(yraw))
    for i in range(P):
        if exp[i] is None:
            assert int(inf[i]) == 1
            got = None
        else:
            assert int(inf[i]) == 0
            got = (xs[i], ys[i])
            assert got == exp[i]
        dev_bytes = bytes(np.asarray(byts[i]).astype(np.uint8))
        assert dev_bytes == ser.g1_to_bytes(exp[i])


def test_serialize_flag_bits():
    """Sign/infinity flags match ser.g1_to_bytes across many points."""
    for k in range(2, 40):
        p = cv.G1.mul(cv.G1_GEN, k)
        jx, jy, jz = _enc_jac([p])
        _, _, inf, byts = df.to_affine_bytes(jx, jy, jz)
        assert bytes(np.asarray(byts[0]).astype(np.uint8)) == \
            ser.g1_to_bytes(p)
