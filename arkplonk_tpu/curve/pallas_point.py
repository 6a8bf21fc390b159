"""Pallas TPU kernel: fused complete Jacobian G1 point addition.

The MSM's Hillis-Steele scans spend their time in `g1_jax.jac_add`:
~36 Fq Montgomery muls, each previously its own kernel launch with HBM
round-trips between them.  This kernel inlines the complete add (including
the doubling / identity / inverse branches as selects) into ONE Mosaic
kernel: every intermediate lives in VMEM/registers.

Used by curve/msm.py when Pallas is enabled; the g1_jax jnp path remains
the reference (interpret-mode equivalence tested).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..fields.jaxfield import FQ
from ..fields import pallas_mont as pm

BLOCK = 256  # smaller than the mont kernel: the fused body is ~40x bigger


def _is_zero(t):
    # (L, B) -> (1, B) bool
    return jnp.all(t == 0, axis=0, keepdims=True)


@functools.lru_cache(maxsize=None)
def _jac_add_kernel(interpret: bool):
    from jax.experimental import pallas as pl

    L = FQ.L
    N, NP = pm._mont_constants(FQ.modulus, L)

    def mul(a, b):
        return pm.mont_mul_tile(a, b, N, NP, L)

    def add(a, b):
        return pm.add_tile(a, b, N, L)

    def sub(a, b):
        return pm.sub_tile(a, b, N, L)

    def kernel(x1r, y1r, z1r, x2r, y2r, z2r, oxr, oyr, ozr):
        x1, y1, z1 = x1r[...], y1r[...], z1r[...]
        x2, y2, z2 = x2r[...], y2r[...], z2r[...]

        z1z1 = mul(z1, z1)
        z2z2 = mul(z2, z2)
        u1 = mul(x1, z2z2)
        u2 = mul(x2, z1z1)
        s1 = mul(mul(y1, z2), z2z2)
        s2 = mul(mul(y2, z1), z1z1)
        h = sub(u2, u1)
        rr = sub(s2, s1)
        h_zero = _is_zero(h)
        r_zero = _is_zero(rr)
        p_inf = _is_zero(z1)
        q_inf = _is_zero(z2)

        # add-2007-bl
        i = mul(add(h, h), add(h, h))
        j = mul(h, i)
        r2 = add(rr, rr)
        v = mul(u1, i)
        x3 = sub(sub(mul(r2, r2), j), add(v, v))
        s1j = mul(s1, j)
        y3 = sub(mul(r2, sub(v, x3)), add(s1j, s1j))
        zs = add(z1, z2)
        z3 = mul(sub(sub(mul(zs, zs), z1z1), z2z2), h)

        # dbl-2009-l (a=0) on (x1, y1, z1)
        da = mul(x1, x1)
        db = mul(y1, y1)
        dc = mul(db, db)
        dt = mul(add(x1, db), add(x1, db))
        dd = add(sub(sub(dt, da), dc), sub(dt, add(da, dc)))
        de = add(add(da, da), da)
        df = mul(de, de)
        dx = sub(df, add(dd, dd))
        c2 = add(dc, dc)
        c4 = add(c2, c2)
        c8 = add(c4, c4)
        dy = sub(mul(de, sub(dd, dx)), c8)
        dz = add(mul(y1, z1), mul(y1, z1))
        dmask = _is_zero(z1) | _is_zero(y1)
        dz = jnp.where(dmask, jnp.zeros_like(dz), dz)

        both = (~p_inf) & (~q_inf)
        is_dbl = both & h_zero & r_zero
        is_inf = both & h_zero & (~r_zero)
        ox = jnp.where(is_dbl, dx, x3)
        oy = jnp.where(is_dbl, dy, y3)
        oz = jnp.where(is_dbl, dz, z3)
        oz = jnp.where(is_inf, jnp.zeros_like(oz), oz)
        ox = jnp.where(q_inf, x1, jnp.where(p_inf, x2, ox))
        oy = jnp.where(q_inf, y1, jnp.where(p_inf, y2, oy))
        oz = jnp.where(q_inf, z1, jnp.where(p_inf, z2, oz))
        oxr[...] = ox
        oyr[...] = oy
        ozr[...] = oz

    @jax.jit
    def call(x1, y1, z1, x2, y2, z2):  # all (L, n), n % BLOCK == 0
        n = x1.shape[1]
        spec = pl.BlockSpec((L, BLOCK), lambda i: (0, i))
        shp = jax.ShapeDtypeStruct((L, n), jnp.uint32)
        return pl.pallas_call(
            kernel,
            out_shape=(shp, shp, shp),
            grid=(n // BLOCK,),
            in_specs=[spec] * 6,
            out_specs=(spec, spec, spec),
            interpret=interpret,
        )(x1, y1, z1, x2, y2, z2)

    return call


def jac_add_pallas(p, q, interpret: bool = False):
    """Pytree wrapper: (L, ...) leaves; broadcasts/flattens/pads."""
    L = FQ.L
    shape = jnp.broadcast_shapes(p[0].shape[1:], q[0].shape[1:])
    coords = [jnp.broadcast_to(c, (L,) + shape) for c in (*p, *q)]
    n = 1
    for d in shape:
        n *= d
    flat = [c.reshape(L, n) for c in coords]
    pad = (-n) % BLOCK
    if pad:
        z = jnp.zeros((L, pad), jnp.uint32)
        flat = [jnp.concatenate([c, z], axis=1) for c in flat]
    ox, oy, oz = _jac_add_kernel(interpret)(*flat)
    if pad:
        ox, oy, oz = ox[:, :n], oy[:, :n], oz[:, :n]
    return (ox.reshape((L,) + shape), oy.reshape((L,) + shape),
            oz.reshape((L,) + shape))
