"""Fused point-op bodies (madd/jadd) vs the host golden curve ops.

Runs both the jnp path and the Pallas kernels in interpret mode on the
CPU; asserts exact limb equality after affine normalization.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from arkplonk_tpu.fields.jaxfield import FQ
from arkplonk_tpu.curve import host as cv
from arkplonk_tpu.curve import pallas_jac


def _rand_points(n, seed):
    rng = np.random.default_rng(seed)
    return [cv.G1.mul(cv.G1_GEN, int.from_bytes(rng.bytes(31), "little"))
            for _ in range(n)]


def _enc_jac(points_jac):
    xs = [p[0] for p in points_jac]
    ys = [p[1] for p in points_jac]
    zs = [p[2] for p in points_jac]
    return (jnp.asarray(FQ.encode(xs)), jnp.asarray(FQ.encode(ys)),
            jnp.asarray(FQ.encode(zs)))


def _dec_jac(tree):
    X = FQ.decode(tree[0])
    Y = FQ.decode(tree[1])
    Z = FQ.decode(tree[2])
    return [cv.jac_to_affine((x, y, z)) for x, y, z in zip(X, Y, Z)]


def _jacify(p, mult):
    """Affine -> Jacobian with a non-trivial Z (Z=mult)."""
    if p is None:
        return (1, 1, 0)
    z = mult % cv.Q
    z2 = z * z % cv.Q
    return (p[0] * z2 % cv.Q, p[1] * z2 * z % cv.Q, z)


N_TEST = 16


@pytest.mark.parametrize("interpret", [False, True], ids=["jnp", "pallas"])
def test_madd_generic(interpret):
    pts = _rand_points(N_TEST, 1)
    qts = _rand_points(N_TEST, 2)
    accs = [_jacify(p, 3 + i) for i, p in enumerate(pts)]
    # lane 3: acc = infinity; lane 5: invalid; lane 7: negated addend;
    # lane 9: q = -acc (result infinity); lane 11: q == acc (anomaly)
    accs[3] = (1, 1, 0)
    valid = np.ones(N_TEST, np.uint32)
    valid[5] = 0
    sgn = np.zeros(N_TEST, np.uint32)
    sgn[7] = 1
    qts[9] = (pts[9][0], (-pts[9][1]) % cv.Q)
    qts[11] = pts[11]
    accs[11] = _jacify(pts[11], 5)

    acc_dev = _enc_jac(accs)
    px = jnp.asarray(FQ.encode([q[0] for q in qts]))
    py = jnp.asarray(FQ.encode([q[1] for q in qts]))
    out, anom = pallas_jac.madd(
        acc_dev, px, py, jnp.asarray(valid), jnp.asarray(sgn),
        interpret=interpret)
    got = _dec_jac(out)

    for i in range(N_TEST):
        if i == 11:
            continue  # anomaly lane: caller must use the fallback
        if valid[i] == 0:
            exp = cv.jac_to_affine(accs[i])
        else:
            q = qts[i]
            if sgn[i]:
                q = (q[0], (-q[1]) % cv.Q)
            exp = cv.jac_to_affine(
                cv.jac_add(accs[i], cv.jac_from_affine(q)))
        assert got[i] == exp, f"lane {i}"
    assert int(anom) == 1


@pytest.mark.parametrize("interpret", [False, True], ids=["jnp", "pallas"])
def test_jadd_generic(interpret):
    pts = _rand_points(N_TEST, 3)
    qts = _rand_points(N_TEST, 4)
    pj = [_jacify(p, 2 + i) for i, p in enumerate(pts)]
    qj = [_jacify(q, 7 + i) for i, q in enumerate(qts)]
    pj[2] = (1, 1, 0)             # p infinite
    qj[4] = (1, 1, 0)             # q infinite
    pj[6] = (1, 1, 0)
    qj[6] = (1, 1, 0)             # both infinite
    qj[8] = _jacify((pts[8][0], (-pts[8][1]) % cv.Q), 9)   # q = -p
    qj[10] = _jacify(pts[10], 13)    # q = p: complete jadd must DOUBLE
    # (equal operands occur structurally in the MSM weighted reduction)

    out, anom = pallas_jac.jadd(_enc_jac(pj), _enc_jac(qj),
                                interpret=interpret)
    got = _dec_jac(out)
    for i in range(N_TEST):
        exp = cv.jac_to_affine(cv.jac_add(pj[i], qj[i]))
        assert got[i] == exp, f"lane {i}"
    assert int(anom) == 0
