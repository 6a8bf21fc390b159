"""Device G1 point arithmetic over Fq limb arrays (Jacobian coordinates).

TPU-native replacement for the `ark-ec` group ops behind
`VariableBaseMSM` (reference commitment.rs:45,83).  Points are pytrees
(X, Y, Z) of (L, ...) Fq Montgomery limb arrays; the identity is Z == 0.
All ops are branch-free (selects), so they vectorize across point batches
and work inside associative scans.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..fields.jaxfield import FQ, U32
from ..fields.limb import encode_ints


def encode_points(points) -> tuple:
    """List of host affine points ((x, y) or None) -> Jacobian pytree
    (X, Y, Z) with shape (L, n) each (Montgomery form)."""
    xs, ys, zs = [], [], []
    for p in points:
        if p is None:
            xs.append(1)
            ys.append(1)
            zs.append(0)
        else:
            xs.append(p[0])
            ys.append(p[1])
            zs.append(1)
    X = FQ.to_mont(jnp.asarray(encode_ints(xs, FQ.L)))
    Y = FQ.to_mont(jnp.asarray(encode_ints(ys, FQ.L)))
    Z = FQ.to_mont(jnp.asarray(encode_ints(zs, FQ.L)))
    return (X, Y, Z)


def decode_points(p) -> list:
    """Jacobian pytree -> list of host affine points (or None).

    One shared Montgomery-trick inversion for all Z's (a per-point
    Fermat pow cost ~2 ms each on host)."""
    from ..fields.host import Q, fq_inv
    X, Y, Z = (FQ.decode_fast(c) for c in p)
    nz = [z for z in Z if z != 0]
    invs = {}
    if nz:
        # batch inversion: prefix products + one Fermat + suffix walk
        prefix = [1]
        for z in nz:
            prefix.append(prefix[-1] * z % Q)
        t = fq_inv(prefix[-1])
        for i in range(len(nz) - 1, -1, -1):
            invs[i] = prefix[i] * t % Q
            t = t * nz[i] % Q
    out = []
    j = 0
    for x, y, z in zip(X, Y, Z):
        if z == 0:
            out.append(None)
        else:
            zi = invs[j]
            j += 1
            zi2 = zi * zi % Q
            out.append((x * zi2 % Q, y * zi2 * zi % Q))
    return out


def identity(shape=()) -> tuple:
    one = FQ.ones(shape)
    return (one, one, FQ.zeros(shape))


def jac_double(p) -> tuple:
    """2P, dbl-2009-l formulas (a=0); identity-safe (Z=0 -> Z'=0)."""
    x, y, z = p
    a = FQ.mont_sqr(x)
    b = FQ.mont_sqr(y)
    c = FQ.mont_sqr(b)
    t = FQ.mont_sqr(FQ.add(x, b))
    d = FQ.add(FQ.sub(FQ.sub(t, a), c), FQ.sub(t, FQ.add(a, c)))  # 2*(t-a-c)
    e = FQ.add(FQ.add(a, a), a)  # 3a
    f = FQ.mont_sqr(e)
    x3 = FQ.sub(f, FQ.add(d, d))
    c8 = FQ.add(FQ.add(c, c), FQ.add(c, c))
    c8 = FQ.add(c8, c8)
    y3 = FQ.sub(FQ.mont_mul(e, FQ.sub(d, x3)), c8)
    z3 = FQ.add(FQ.mont_mul(y, z), FQ.mont_mul(y, z))
    # y == 0 (only at infinity for this curve) or z == 0 -> identity
    zmask = FQ.is_zero(z) | FQ.is_zero(y)
    z3 = FQ.select(zmask, FQ.zeros(z3.shape[1:]), z3)
    return (x3, y3, z3)


def jac_add(p, q) -> tuple:
    """P + Q, complete via selects (handles identity, doubling, inverse).

    The fused per-add Mosaic kernel lives in curve/pallas_jac.py (madd/
    jadd, used by the MSM); this jnp form is the composable fallback."""
    return _jac_add_jnp(p, q)


def _jac_add_jnp(p, q) -> tuple:
    x1, y1, z1 = p
    x2, y2, z2 = q
    z1z1 = FQ.mont_sqr(z1)
    z2z2 = FQ.mont_sqr(z2)
    u1 = FQ.mont_mul(x1, z2z2)
    u2 = FQ.mont_mul(x2, z1z1)
    s1 = FQ.mont_mul(FQ.mont_mul(y1, z2), z2z2)
    s2 = FQ.mont_mul(FQ.mont_mul(y2, z1), z1z1)
    h = FQ.sub(u2, u1)
    rr = FQ.sub(s2, s1)
    h_zero = FQ.is_zero(h)
    r_zero = FQ.is_zero(rr)
    p_inf = FQ.is_zero(z1)
    q_inf = FQ.is_zero(z2)

    # add-2007-bl
    i = FQ.mont_sqr(FQ.add(h, h))
    j = FQ.mont_mul(h, i)
    r2 = FQ.add(rr, rr)
    v = FQ.mont_mul(u1, i)
    x3 = FQ.sub(FQ.sub(FQ.mont_sqr(r2), j), FQ.add(v, v))
    s1j = FQ.mont_mul(s1, j)
    y3 = FQ.sub(FQ.mont_mul(r2, FQ.sub(v, x3)), FQ.add(s1j, s1j))
    z3 = FQ.mont_mul(FQ.sub(FQ.sub(FQ.mont_sqr(FQ.add(z1, z2)), z1z1),
                            z2z2), h)

    dx, dy, dz = jac_double(p)

    def sel(mask, a, b):
        return FQ.select(mask, a, b)

    # default: the add result
    ox, oy, oz = x3, y3, z3
    # same x: either double (same y) or infinity (opposite y)
    both = (~p_inf) & (~q_inf)
    is_dbl = both & h_zero & r_zero
    is_inf = both & h_zero & (~r_zero)
    ox = sel(is_dbl, dx, ox)
    oy = sel(is_dbl, dy, oy)
    oz = sel(is_dbl, dz, oz)
    oz = sel(is_inf, FQ.zeros(oz.shape[1:]), oz)
    # p infinite -> q ; q infinite -> p
    ox = sel(q_inf, x1, sel(p_inf, x2, ox))
    oy = sel(q_inf, y1, sel(p_inf, y2, oy))
    oz = sel(q_inf, z1, sel(p_inf, z2, oz))
    # both infinite: q_inf branch keeps z1 == 0 -> identity, fine
    return (ox, oy, oz)
