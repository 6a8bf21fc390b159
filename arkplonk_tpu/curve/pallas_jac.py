"""Fused Pallas G1 point kernels on the (L, 8, LANES) slab layout.

TPU-native replacement for the `ark-ec` group ops behind
`VariableBaseMSM` (reference plonk-core/src/commitment.rs:45,83).  Two
ops, each available as a fused Mosaic kernel and as a compact jnp graph
(CPU tests / fallback) sharing one parametric body:

  * ``madd``  — masked mixed-add accumulate: Jacobian acc += affine P
    (the Pippenger bucket-accumulation inner step; handles acc=infinity,
    skip lanes, sign flip of P).
  * ``jadd``  — Jacobian + Jacobian (bucket reduction trees; handles
    either side infinity and P + (-P) -> infinity).

Neither op carries the in-kernel doubling branch (7 extra muls ≈ 25k
extra Mosaic ops -> minutes of extra compile): for MSM inputs (distinct
SRS powers / distinct bucket sums with challenge-derived scalars) the
equal-x case only occurs with cryptographically negligible probability.
Correctness stays unconditional: both ops emit an ``anomaly`` count
(lanes where the add would need the doubling formula); callers check it
and fall back to the complete path (g1_jax.jac_add) on a hit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..fields.jaxfield import FQ
from ..fields.pallas_mont import (
    mont_mul_tile, add_tile, sub_tile, _mont_constants,
)
from ..fields import pallas2

U32 = jnp.uint32
L = FQ.L  # 24 limbs for BLS12-381 Fq


class _TileOps:
    """Field ops on in-kernel (L, ...) tiles (16-bit clean limbs)."""

    def __init__(self):
        self.N, self.NP = _mont_constants(FQ.modulus, L)

    def mul(self, a, b):
        return mont_mul_tile(a, b, self.N, self.NP, L)

    def add(self, a, b):
        return add_tile(a, b, self.N, L)

    def sub(self, a, b):
        return sub_tile(a, b, self.N, L)

    def neg(self, y):
        """N - y for y != 0 (G1 y-coords are never 0: the curve group
        order is odd, so no 2-torsion exists)."""
        bor = jnp.zeros_like(y[0:1])
        rows = []
        for k in range(L):
            t = jnp.uint32(0x10000 + self.N[k]) - y[k:k + 1] - bor
            rows.append(t & 0xFFFF)
            bor = jnp.uint32(1) - (t >> 16)
        return jnp.concatenate(rows, axis=0)

    def is_zero(self, t):
        return jnp.all(t == 0, axis=0, keepdims=True)

    def ones_like(self, t):
        one = [int(x) for x in FQ.ONE_np]
        rows = [jnp.full((1,) + t.shape[1:], one[k], U32) for k in range(L)]
        return jnp.concatenate(rows, axis=0)


class _JnpOps:
    """Same interface over jaxfield's compact scan-based graphs."""

    def mul(self, a, b):
        return FQ.mont_mul(a, b)

    def add(self, a, b):
        return FQ.add(a, b)

    def sub(self, a, b):
        return FQ.sub(a, b)

    def neg(self, y):
        return FQ.neg(y)

    def is_zero(self, t):
        return FQ.is_zero(t)[None]

    def ones_like(self, t):
        return FQ.ones(t.shape[1:])


def _madd_formulas(ax, ay, az, px, py, valid, sgn, f):
    """madd-2007-bl (Z2=1), a=0 curve. valid/sgn: (1, ...) u32 masks.
    Returns ox, oy, oz, anomaly(u32)."""
    vmask = valid != 0
    y2 = jnp.where(sgn != 0, f.neg(py), py)

    z1z1 = f.mul(az, az)
    u2 = f.mul(px, z1z1)
    s2 = f.mul(f.mul(y2, az), z1z1)
    h = f.sub(u2, ax)
    rr = f.sub(s2, ay)
    hh = f.mul(h, h)
    i4 = f.add(f.add(hh, hh), f.add(hh, hh))
    j = f.mul(h, i4)
    r2 = f.add(rr, rr)
    v = f.mul(ax, i4)
    x3 = f.sub(f.sub(f.mul(r2, r2), j), f.add(v, v))
    yj = f.mul(ay, j)
    y3 = f.sub(f.mul(r2, f.sub(v, x3)), f.add(yj, yj))
    zh = f.add(az, h)
    z3 = f.sub(f.sub(f.mul(zh, zh), z1z1), hh)

    p_inf = f.is_zero(az)
    h0 = f.is_zero(h)
    r0 = f.is_zero(rr)

    anomaly = vmask & (~p_inf) & h0 & r0
    res_inf = vmask & (~p_inf) & h0 & (~r0)

    zero = jnp.zeros_like(z3)
    one = f.ones_like(az)

    ox = jnp.where(p_inf, px, x3)
    oy = jnp.where(p_inf, y2, y3)
    oz = jnp.where(p_inf, one, z3)
    oz = jnp.where(res_inf, zero, oz)
    ox = jnp.where(vmask, ox, ax)
    oy = jnp.where(vmask, oy, ay)
    oz = jnp.where(vmask, oz, az)
    return ox, oy, oz, anomaly.astype(U32)


def _jdbl_formulas(x1, y1, z1, f):
    """dbl-2009-l (a=0), identity-safe (Z=0 or Y=0 -> infinity)."""
    a = f.mul(x1, x1)
    b = f.mul(y1, y1)
    c = f.mul(b, b)
    t = f.add(x1, b)
    t = f.mul(t, t)
    d = f.add(f.sub(f.sub(t, a), c), f.sub(t, f.add(a, c)))
    e = f.add(f.add(a, a), a)
    ff = f.mul(e, e)
    x3 = f.sub(ff, f.add(d, d))
    c2 = f.add(c, c)
    c4 = f.add(c2, c2)
    c8 = f.add(c4, c4)
    y3 = f.sub(f.mul(e, f.sub(d, x3)), c8)
    z3 = f.mul(y1, z1)
    z3 = f.add(z3, z3)
    mask = f.is_zero(z1) | f.is_zero(y1)
    z3 = jnp.where(mask, jnp.zeros_like(z3), z3)
    return x3, y3, z3


def _jadd_formulas(x1, y1, z1, x2, y2, z2, f):
    """add-2007-bl made COMPLETE: the doubling case (same affine point,
    h=0 and r=0) selects the dbl-2009-l result instead of being flagged.
    Equal operands occur structurally in the MSM weighted reduction —
    suffix partial sums are bitwise-equal across empty-bucket runs — so
    jadd must compute them, not anomaly out (the anomaly output is kept
    for interface compatibility and is always 0)."""
    z1z1 = f.mul(z1, z1)
    z2z2 = f.mul(z2, z2)
    u1 = f.mul(x1, z2z2)
    u2 = f.mul(x2, z1z1)
    s1 = f.mul(f.mul(y1, z2), z2z2)
    s2 = f.mul(f.mul(y2, z1), z1z1)
    h = f.sub(u2, u1)
    rr = f.sub(s2, s1)
    i = f.mul(f.add(h, h), f.add(h, h))
    j = f.mul(h, i)
    r2 = f.add(rr, rr)
    v = f.mul(u1, i)
    x3 = f.sub(f.sub(f.mul(r2, r2), j), f.add(v, v))
    s1j = f.mul(s1, j)
    y3 = f.sub(f.mul(r2, f.sub(v, x3)), f.add(s1j, s1j))
    zs = f.add(z1, z2)
    z3 = f.mul(f.sub(f.sub(f.mul(zs, zs), z1z1), z2z2), h)

    p_inf = f.is_zero(z1)
    q_inf = f.is_zero(z2)
    h0 = f.is_zero(h)
    r0 = f.is_zero(rr)
    both = (~p_inf) & (~q_inf)
    dbl_case = both & h0 & r0
    res_inf = both & h0 & (~r0)

    dx, dy, dz = _jdbl_formulas(x1, y1, z1, f)

    zero = jnp.zeros_like(z3)
    ox = jnp.where(q_inf, x1, jnp.where(p_inf, x2,
                                        jnp.where(dbl_case, dx, x3)))
    oy = jnp.where(q_inf, y1, jnp.where(p_inf, y2,
                                        jnp.where(dbl_case, dy, y3)))
    oz = jnp.where(q_inf, z1, jnp.where(p_inf, z2,
                                        jnp.where(dbl_case, dz,
                                                  jnp.where(res_inf, zero,
                                                            z3))))
    anomaly = jnp.zeros_like(oz[0:1]).astype(U32)
    return ox, oy, oz, anomaly


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

def _specs():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    S, K = pallas2.S_SUB, pallas2.LANES
    val = pl.BlockSpec((L, S, K), lambda i: (0, 0, i),
                       memory_space=pltpu.VMEM)
    msk = pl.BlockSpec((1, S, K), lambda i: (0, 0, i),
                       memory_space=pltpu.VMEM)
    return val, msk


@functools.lru_cache(maxsize=None)
def _madd_kernel(interpret: bool):
    from jax.experimental import pallas as pl

    ops = _TileOps()

    def kernel(ax, ay, az, px, py, valid, sgn, ox, oy, oz, anom):
        rx, ry, rz, an = _madd_formulas(
            ax[...], ay[...], az[...], px[...], py[...],
            valid[...], sgn[...], ops)
        ox[...] = rx
        oy[...] = ry
        oz[...] = rz
        anom[...] = an

    @jax.jit
    def call(ax, ay, az, px, py, valid, sgn):
        K = pallas2.LANES
        S = pallas2.S_SUB
        T = ax.shape[2]
        val, msk = _specs()
        shp = jax.ShapeDtypeStruct((L, S, T), U32)
        mshp = jax.ShapeDtypeStruct((1, S, T), U32)
        return pl.pallas_call(
            kernel,
            out_shape=(shp, shp, shp, mshp),
            grid=(T // K,),
            in_specs=[val, val, val, val, val, msk, msk],
            out_specs=(val, val, val, msk),
            interpret=interpret,
        )(ax, ay, az, px, py, valid, sgn)

    return call


@functools.lru_cache(maxsize=None)
def _jadd_kernel(interpret: bool):
    from jax.experimental import pallas as pl

    ops = _TileOps()

    def kernel(x1, y1, z1, x2, y2, z2, ox, oy, oz, anom):
        rx, ry, rz, an = _jadd_formulas(
            x1[...], y1[...], z1[...], x2[...], y2[...], z2[...], ops)
        ox[...] = rx
        oy[...] = ry
        oz[...] = rz
        anom[...] = an

    @jax.jit
    def call(x1, y1, z1, x2, y2, z2):
        K = pallas2.LANES
        S = pallas2.S_SUB
        T = x1.shape[2]
        val, msk = _specs()
        shp = jax.ShapeDtypeStruct((L, S, T), U32)
        mshp = jax.ShapeDtypeStruct((1, S, T), U32)
        return pl.pallas_call(
            kernel,
            out_shape=(shp, shp, shp, mshp),
            grid=(T // K,),
            in_specs=[val] * 6,
            out_specs=(val, val, val, msk),
            interpret=interpret,
        )(x1, y1, z1, x2, y2, z2)

    return call


@functools.lru_cache(maxsize=None)
def _horner_kernel(c: int, W: int, interpret: bool):
    """Whole Pippenger window recombination in ONE Mosaic kernel:
    out_p = sum_w 2^(c*w) * S_{p,w}, state VMEM-resident.

    The XLA-graph formulation (scan over windows of tiny (L, 4) point
    ops) costs ~5 ms PER WINDOW on the tunnel backend — tiny-shape op
    overhead dominates arithmetic 25x.  Here the flat Horner loop
    (double every step, masked add of the next window sum every c-th
    step) runs inside the kernel: ~(W-1)*c iterations of ~82k Mosaic
    ops on one (L, 8, 128) tile ≈ 20 ms total, no per-step overhead.

    Inputs: s{x,y,z}_ref (W, L, 8, 128) — window sum S_{p,w} in
    [w, :, 0, p].  Output: (L, 8, 128) with result p in [:, 0, p]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ops = _TileOps()
    steps = (W - 1) * c

    def kernel(sx, sy, sz, ox, oy, oz):
        x0 = sx[W - 1]
        y0 = sy[W - 1]
        z0 = sz[W - 1]

        def body(i, st):
            x, y, z = st
            x, y, z = _jdbl_formulas(x, y, z, ops)
            add_now = (i % c) == (c - 1)
            wc = jnp.where(add_now, W - 2 - i // c, 0)
            gx = sx[wc]
            gy = sy[wc]
            gz = jnp.where(add_now, sz[wc], jnp.zeros_like(z0))
            # gz=0 = infinity: jadd returns the accumulator unchanged
            x, y, z, _ = _jadd_formulas(x, y, z, gx, gy, gz, ops)
            return x, y, z

        x, y, z = jax.lax.fori_loop(0, steps, body, (x0, y0, z0))
        ox[...] = x
        oy[...] = y
        oz[...] = z

    @jax.jit
    def call(sx, sy, sz):  # (W, L, 8, 128) each
        spec = pl.BlockSpec((W, L, S_SUB := pallas2.S_SUB, 128),
                            lambda: (0, 0, 0, 0),
                            memory_space=pltpu.VMEM)
        ospec = pl.BlockSpec((L, pallas2.S_SUB, 128), lambda: (0, 0, 0),
                             memory_space=pltpu.VMEM)
        shp = jax.ShapeDtypeStruct((L, pallas2.S_SUB, 128), U32)
        return pl.pallas_call(
            kernel,
            out_shape=(shp, shp, shp),
            in_specs=[spec] * 3,
            out_specs=(ospec, ospec, ospec),
            interpret=interpret,
        )(sx, sy, sz)

    return call


def horner_recombine(wx, wy, wz, P: int, W: int, c: int,
                     interpret: bool = False):
    """(L, G=P*W) Montgomery Jacobian window sums -> (L, P) totals via
    the fused Mosaic Horner kernel (P <= 128 lanes)."""
    S = pallas2.S_SUB

    def prep(a):
        a3 = a.reshape(L, P, W).transpose(2, 0, 1)       # (W, L, P)
        pad = jnp.zeros((W, L, S * 128 - P), U32)
        return jnp.concatenate([a3, pad], axis=2).reshape(W, L, S, 128)

    ox, oy, oz = _horner_kernel(c, W, interpret)(
        prep(wx), prep(wy), prep(wz))
    return (ox.reshape(L, -1)[:, :P], oy.reshape(L, -1)[:, :P],
            oz.reshape(L, -1)[:, :P])


@functools.lru_cache(maxsize=None)
def _jdbl_kernel(interpret: bool):
    from jax.experimental import pallas as pl

    ops = _TileOps()

    def kernel(x1, y1, z1, ox, oy, oz):
        rx, ry, rz = _jdbl_formulas(x1[...], y1[...], z1[...], ops)
        ox[...] = rx
        oy[...] = ry
        oz[...] = rz

    @jax.jit
    def call(x1, y1, z1):
        K = pallas2.LANES
        S = pallas2.S_SUB
        T = x1.shape[2]
        val, _ = _specs()
        shp = jax.ShapeDtypeStruct((L, S, T), U32)
        return pl.pallas_call(
            kernel,
            out_shape=(shp, shp, shp),
            grid=(T // K,),
            in_specs=[val] * 3,
            out_specs=(val, val, val),
            interpret=interpret,
        )(x1, y1, z1)

    return call


# ---------------------------------------------------------------------------
# public ops on flat (L, n) arrays (packed/unpacked internally)
# ---------------------------------------------------------------------------

def use_pallas() -> bool:
    from ..fields import pallas_mont
    return pallas_mont.pallas_enabled() and not FQ._pallas_off


def madd(acc, px, py, valid, sgn, interpret: bool = False):
    """Masked mixed-add accumulate over flat (L, n) coordinate arrays.

    acc: (X, Y, Z) Jacobian pytree; px/py affine Montgomery coords;
    valid/sgn: (n,) masks.  Returns ((X', Y', Z'), anomaly_count)."""
    n = acc[0].shape[1]
    if use_pallas() or interpret:
        npad = pallas2.padded(n)
        packed = [pallas2.pack(c, npad) for c in (*acc, px, py)]
        masks = [pallas2.pack(m[None].astype(U32), npad)
                 for m in (valid, sgn)]
        ox, oy, oz, an = _madd_kernel(interpret)(*packed, *masks)
        out = tuple(pallas2.unpack(c, n) for c in (ox, oy, oz))
        return out, jnp.sum(pallas2.unpack(an, n))
    ox, oy, oz, an = _madd_formulas(
        *acc, px, py, valid[None].astype(U32), sgn[None].astype(U32),
        _JnpOps())
    return (ox, oy, oz), jnp.sum(an)


def jadd(p, q, interpret: bool = False):
    """Jacobian + Jacobian over flat (L, n) pytrees -> (sum, anomaly_count)."""
    n = p[0].shape[1]
    if use_pallas() or interpret:
        npad = pallas2.padded(n)
        packed = [pallas2.pack(c, npad) for c in (*p, *q)]
        ox, oy, oz, an = _jadd_kernel(interpret)(*packed)
        out = tuple(pallas2.unpack(c, n) for c in (ox, oy, oz))
        return out, jnp.sum(pallas2.unpack(an, n))
    ox, oy, oz, an = _jadd_formulas(*p, *q, _JnpOps())
    return (ox, oy, oz), jnp.sum(an)


def jdbl(p, interpret: bool = False):
    """Jacobian doubling over flat (L, n) pytrees (complete)."""
    n = p[0].shape[1]
    if use_pallas() or interpret:
        npad = pallas2.padded(n)
        packed = [pallas2.pack(c, npad) for c in p]
        ox, oy, oz = _jdbl_kernel(interpret)(*packed)
        return tuple(pallas2.unpack(c, n) for c in (ox, oy, oz))
    return _jdbl_formulas(*p, _JnpOps())
