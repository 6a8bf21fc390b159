"""Canonical serialization (ark-serialize 0.3 wire format).

The reference feeds every transcript append and all key/proof serde through
`ark_serialize::CanonicalSerialize` (e.g. transcript.rs:29-31, proof.rs:41).
Byte layout re-implemented here:

- Field element Fp: little-endian bytes of the plain (non-Montgomery)
  integer; 32 bytes for Fr, 48 for Fq.
- G1 affine compressed: x as Fq (48 B LE) with flag bits OR'ed into the
  most-significant byte: bit7 = y-is-NEGATIVE (y <= -y), bit6 = infinity
  (with x serialized as zero).  This is ark-serialize v0.3 `SWFlags`
  (`u8_bitmask`: Infinity -> 1<<6, NegativeY -> 1<<7, PositiveY -> 0;
  `from_u8` rejects bit7|bit6 together so infinity has one encoding),
  with "positive" = `y > -y` on canonical integers
  (`GroupAffine::serialize` uses `SWFlags::from_y_sign(self.y > -self.y)`).
- G2 affine compressed: x in Fq2 serialized as c0 then c1, flags on the last
  byte of c1; the Fq2 sign comparison is lexicographic (c1, then c0).

No arkworks binary exists in this sandbox (no Rust toolchain, zero
egress), so these conventions cannot be cross-executed; they are locked
instead by tests/test_ark_serialize.py golden vectors derived from the
documented v0.3 algorithm and exact curve arithmetic.
"""

from __future__ import annotations

from ..fields.host import Q, R
from ..curve import host as cv

FR_BYTES = 32
FQ_BYTES = 48


def fr_to_bytes(x: int) -> bytes:
    return (x % R).to_bytes(FR_BYTES, "little")


def fr_from_bytes(b: bytes) -> int:
    x = int.from_bytes(b, "little")
    if x >= R:
        raise ValueError("non-canonical Fr bytes")
    return x


def fq_to_bytes(x: int, flags: int = 0) -> bytes:
    b = bytearray((x % Q).to_bytes(FQ_BYTES, "little"))
    b[-1] |= flags
    return bytes(b)


FLAG_INFINITY = 1 << 6   # SWFlags::Infinity  (ark-serialize 0.3)
FLAG_NEGATIVE_Y = 1 << 7  # SWFlags::NegativeY (bit set when y <= -y)


def _y_is_positive(y: int, mod: int) -> bool:
    return y > mod - y


def g1_to_bytes(p) -> bytes:
    """Compressed G1 point (48 bytes)."""
    if p is None:
        return fq_to_bytes(0, FLAG_INFINITY)
    x, y = p
    flags = 0 if _y_is_positive(y % Q, Q) else FLAG_NEGATIVE_Y
    return fq_to_bytes(x, flags)


def g1_from_bytes(b: bytes):
    raw = bytearray(b)
    flags = raw[-1] & 0xC0
    raw[-1] &= 0x3F
    if (flags & FLAG_INFINITY) and (flags & FLAG_NEGATIVE_Y):
        # SWFlags::from_u8 rejects this combination (one encoding only)
        raise ValueError("invalid point flags")
    x = int.from_bytes(raw, "little")
    if flags & FLAG_INFINITY:
        return None
    from ..fields.host import C, sqrt_mod
    rhs = (x * x % Q * x + C.G1_B) % Q
    y = sqrt_mod(rhs, Q)
    if y is None:
        raise ValueError("x not on curve")
    if _y_is_positive(y, Q) == bool(flags & FLAG_NEGATIVE_Y):
        y = Q - y
    return (x, y)


def g2_to_bytes(p) -> bytes:
    """Compressed G2 point (96 bytes): c0 || c1 with flags on last byte."""
    if p is None:
        return fq_to_bytes(0) + fq_to_bytes(0, FLAG_INFINITY)
    (x0, x1), (y0, y1) = p
    # "positive" on Fq2 compares lexicographically (c1, then c0)
    if y1 != 0:
        pos = _y_is_positive(y1, Q)
    else:
        pos = _y_is_positive(y0, Q)
    flags = 0 if pos else FLAG_NEGATIVE_Y
    return fq_to_bytes(x0) + fq_to_bytes(x1, flags)


def g2_from_bytes(b: bytes):
    raw0 = b[:FQ_BYTES]
    raw1 = bytearray(b[FQ_BYTES:])
    flags = raw1[-1] & 0xC0
    raw1[-1] &= 0x3F
    if (flags & FLAG_INFINITY) and (flags & FLAG_NEGATIVE_Y):
        raise ValueError("invalid point flags")
    x = (int.from_bytes(raw0, "little"), int.from_bytes(raw1, "little"))
    if flags & FLAG_INFINITY:
        return None
    rhs = cv.f2_add(cv.f2_mul(cv.f2_sqr(x), x), (cv.C.G2_B_C0, cv.C.G2_B_C1))
    y = cv.f2_sqrt(rhs)
    if y is None:
        raise ValueError("x not on twist")
    y0, y1 = y
    pos = _y_is_positive(y1, Q) if y1 != 0 else _y_is_positive(y0, Q)
    if pos == bool(flags & FLAG_NEGATIVE_Y):
        y = cv.f2_neg(y)
    return (x, y)
