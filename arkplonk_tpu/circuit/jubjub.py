"""Embedded twisted-Edwards curve (JubJub) arithmetic over Fr (host).

Plays the role of `ark-ed-on-bls12-381` / the `TEModelParameters` bound used
by the reference's ECC gadgets (plonk-core/src/constraint_system/ecc/*).
Curve: -x^2 + y^2 = 1 + d x^2 y^2 over Fr.
"""

from __future__ import annotations

from ..fields.host import C
from ..fields.host import R, fr_inv

A = C.JUBJUB_A
D = C.JUBJUB_D

IDENTITY = (0, 1)
GENERATOR = (C.JUBJUB_GEN_X, C.JUBJUB_GEN_Y)


def is_on_curve(p) -> bool:
    x, y = p
    lhs = (A * x * x + y * y) % R
    rhs = (1 + D * x * x % R * y * y) % R
    return lhs == rhs


def add(p, q):
    """Complete twisted Edwards addition (works for doubling/identity)."""
    x1, y1 = p
    x2, y2 = q
    x1y2 = x1 * y2 % R
    y1x2 = y1 * x2 % R
    y1y2 = y1 * y2 % R
    x1x2 = x1 * x2 % R
    dxy = D * x1y2 % R * y1x2 % R
    x3 = (x1y2 + y1x2) * fr_inv(1 + dxy) % R
    y3 = (y1y2 - A * x1x2) * fr_inv(1 - dxy) % R
    return (x3, y3)


def neg(p):
    x, y = p
    return ((-x) % R, y)


def mul(p, k: int):
    acc = IDENTITY
    while k:
        if k & 1:
            acc = add(acc, p)
        p = add(p, p)
        k >>= 1
    return acc


def wnaf2(k: int) -> list[int]:
    """NAF (width-2 WNAF) digits, least-significant first, in {-1,0,1}.

    Matches arkworks `BigInteger::find_wnaf(2)` used at
    reference ecc/scalar_mul/fixed_base.rs:66."""
    out = []
    while k != 0:
        if k & 1:
            z = 2 - (k % 4)
            k -= z
        else:
            z = 0
        out.append(z)
        k >>= 1
    return out
