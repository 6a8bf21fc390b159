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
    Maps 0 -> 0 (used as the infinity-safe batch inverse).

    Square-and-multiply over the 381 exponent bits, scanned in chunks of
    8 with the inner 8 statically unrolled: per-iteration overhead of a
    tiny-lane XLA loop on the tunnel backend (~70 us) dominates the
    arithmetic, so 48 chunk steps beat 381 single-bit steps ~8x."""
    CH = 8
    nbits = _QM2_BITS.shape[0]
    pad = (-nbits) % CH
    # pad with leading zero bits (squarings of 1 are harmless: acc=1)
    bits = np.concatenate([np.zeros(pad, np.uint32), _QM2_BITS])
    bits_ch = jnp.asarray(bits.reshape(-1, CH))
    with _jnp_fields():
        one = FQ.ones(z.shape[1:])

        def chunk(acc, bits8):
            for j in range(CH):
                acc = FQ.mont_mul(acc, acc)
                withm = FQ.mont_mul(acc, z)
                acc = jnp.where(bits8[j] != 0, withm, acc)
            return acc, None

        acc, _ = jax.lax.scan(chunk, one, bits_ch)
        return acc


def recombine_device(wx, wy, wz, P: int, W: int, c: int):
    """(L, G=P*W) Montgomery Jacobian window sums -> (L, P) Jacobian
    totals + anomaly count.  Horner over windows, high to low:
    acc = 2^c * acc + S_w.

    On TPU this runs as ONE fused Mosaic kernel
    (pallas_jac.horner_recombine): the XLA-graph fallback below (scan
    over windows) pays ~5 ms of tiny-shape op overhead PER WINDOW on
    the tunnel backend (~200 ms per finish vs ~20 ms in-kernel)."""
    if pallas_jac.use_pallas() and P <= 128:
        x, y, z = pallas_jac.horner_recombine(wx, wy, wz, P, W, c)
        return (x, y, z), jnp.uint32(0)
    ops = pallas_jac._JnpOps()
    with _jnp_fields():
        L = FQ.L
        sx = wx.reshape(L, P, W)
        sy = wy.reshape(L, P, W)
        sz = wz.reshape(L, P, W)
        acc = (sx[..., W - 1], sy[..., W - 1], sz[..., W - 1])
        # window sums W-2 .. 0, scan axis leading
        rev = jnp.arange(W - 2, -1, -1)
        xs = (sx[:, :, rev].transpose(2, 0, 1),
              sy[:, :, rev].transpose(2, 0, 1),
              sz[:, :, rev].transpose(2, 0, 1))

        def win_body(carry, S_w):
            x, y, z, an = carry
            for _ in range(c):  # static unroll: straight-line c * jdbl
                x, y, z = pallas_jac._jdbl_formulas(x, y, z, ops)
            x, y, z, a = pallas_jac._jadd_formulas(x, y, z, *S_w, ops)
            return (x, y, z, an + jnp.sum(a)), None

        (x, y, z, an), _ = jax.lax.scan(
            win_body, (*acc, jnp.uint32(0)), xs)
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
