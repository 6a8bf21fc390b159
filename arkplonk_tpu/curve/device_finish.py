"""Device MSM finish: window recombination + affine + ark-serialize bytes.

Lets commitments feed the on-device transcript with NO host round-trip:
raw window sums (the MSM body's output) are recombined with the Horner
doubling chain (out_p = sum_w 2^(c*w) * S_{p,w}), converted to affine
with one vectorized Fermat inversion, and serialized to the compressed
ark-serialize v0.3 layout (x LE 48 bytes, bit7 = NegativeY, bit6 =
infinity) — byte-identical to transcript/serialize.g1_to_bytes
(asserted in tests/test_device_finish.py).

All ops run on tiny (L, P) lanes: the jnp field path is forced at trace
time (a Mosaic launch would cost more than the arithmetic here).
"""

from __future__ import annotations

import contextlib
import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..fields.jaxfield import FQ, FR
from ..curve import pallas_jac

U32 = jnp.uint32


@contextlib.contextmanager
def _jnp_fields():
    with FQ.pallas_disabled(), FR.pallas_disabled():
        yield


_QM2_BITS = np.array(
    [(FQ.modulus - 2 >> i) & 1
     for i in range(FQ.modulus.bit_length() - 1, -1, -1)],
    dtype=np.uint32)  # MSB first


def fq_inv_device(z):
    """Vectorized Fermat inverse z^(q-2) on (L, ...) Montgomery limbs.
    Maps 0 -> 0 (used as the infinity-safe batch inverse)."""
    with _jnp_fields():
        bits = jnp.asarray(_QM2_BITS)
        one = FQ.ones(z.shape[1:])

        def body(i, acc):
            acc = FQ.mont_mul(acc, acc)
            withm = FQ.mont_mul(acc, z)
            return jnp.where(bits[i] != 0, withm, acc)

        return jax.lax.fori_loop(0, _QM2_BITS.shape[0], body, one)


def recombine_device(wx, wy, wz, P: int, W: int, c: int):
    """(L, G=P*W) Montgomery Jacobian window sums -> (L, P) Jacobian
    totals + anomaly count.  Horner over windows, high to low:
    acc = 2^c * acc + S_w."""
    ops = pallas_jac._JnpOps()
    with _jnp_fields():
        L = FQ.L
        sx = wx.reshape(L, P, W)
        sy = wy.reshape(L, P, W)
        sz = wz.reshape(L, P, W)
        acc = (sx[..., W - 1], sy[..., W - 1], sz[..., W - 1])

        def win_body(i, st):
            x, y, z, an = st
            w = W - 2 - i

            def dbl_body(_, p):
                return pallas_jac._jdbl_formulas(*p, ops)

            x, y, z = jax.lax.fori_loop(0, c, dbl_body, (x, y, z))
            gx = jax.lax.dynamic_index_in_dim(sx, w, axis=2, keepdims=False)
            gy = jax.lax.dynamic_index_in_dim(sy, w, axis=2, keepdims=False)
            gz = jax.lax.dynamic_index_in_dim(sz, w, axis=2, keepdims=False)
            x, y, z, a = pallas_jac._jadd_formulas(x, y, z, gx, gy, gz, ops)
            return x, y, z, an + jnp.sum(a)

        x, y, z, an = jax.lax.fori_loop(
            0, W - 1, win_body, (*acc, jnp.uint32(0)))
        return (x, y, z), an


_Q_LIMBS = np.array([(FQ.modulus >> (16 * k)) & 0xFFFF for k in range(FQ.L)],
                    dtype=np.uint32)


def _y_negative_raw(yraw):
    """(L, P) RAW 16-bit limbs -> (P,) u32 flag: 1 iff y <= q - y, i.e.
    NOT (2y > q) (ark SWFlags::NegativeY; serialize.py:_y_is_positive)."""
    # 2y as 25 16-bit limbs via carry chain (L static, unrolled)
    carry = jnp.zeros_like(yraw[0])
    limbs2 = []
    for k in range(FQ.L):
        t = (yraw[k] << 1) | carry
        limbs2.append(t & 0xFFFF)
        carry = t >> 16
    # 2y - q: borrow chain; top carry limb joins as limb L
    borrow = jnp.zeros_like(carry)
    for k in range(FQ.L):
        t = jnp.uint32(0x10000) + limbs2[k] - jnp.uint32(_Q_LIMBS[k]) - borrow
        borrow = jnp.uint32(1) - (t >> 16)
    # include the carry limb (q has no limb L): borrow clears if carry=1
    borrow = jnp.where(carry != 0, jnp.zeros_like(borrow), borrow)
    # borrow==1  <=>  2y < q  <=>  y < q-y  (q odd, y != q-y unless y=0)
    # NegativeY flag: y <= -y  <=>  NOT (y > q-y)  <=>  2y < q or y == 0
    return borrow


def to_affine_bytes(jx, jy, jz):
    """(L, P) Montgomery Jacobian -> (xraw, yraw (L, P) RAW limbs,
    inf (P,), comp_bytes (P, 48) u32)."""
    with _jnp_fields():
        zi = fq_inv_device(jz)
        zi2 = FQ.mont_mul(zi, zi)
        xa = FQ.mont_mul(jx, zi2)
        ya = FQ.mont_mul(jy, FQ.mont_mul(zi2, zi))
        xraw = FQ.from_mont(xa)
        yraw = FQ.from_mont(ya)
        inf = jnp.all(jz == 0, axis=0).astype(U32)      # (P,)
        xraw = jnp.where(inf[None, :] != 0, jnp.zeros_like(xraw), xraw)
        yraw = jnp.where(inf[None, :] != 0, jnp.zeros_like(yraw), yraw)
        neg = _y_negative_raw(yraw)
        neg = jnp.where(inf != 0, jnp.zeros_like(neg), neg)
        lo = xraw & 0xFF                                # (L, P)
        hi = (xraw >> 8) & 0xFF
        byts = jnp.stack([lo, hi], axis=1).reshape(2 * FQ.L,
                                                   xraw.shape[1]).T
        flags = (inf << 6) | (neg << 7)
        byts = byts.at[:, -1].set(byts[:, -1] | flags)
        return xraw, yraw, inf, byts
