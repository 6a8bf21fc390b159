"""Cross-cutting utilities (reference plonk-core/src/util.rs).

The numeric pieces of util.rs live elsewhere (`fields/host.Domain` for the
`EvaluationDomainExt` extension trait, `circuit/lookup_table.lc` for the
Horner linear combination); this module carries the embedded-curve scalar
conversions (util.rs:95-146) that the reference exports through its prelude
(prelude.rs:17, `from_embedded_curve_scalar`).

Scalars are plain Python ints here — the host layer is exact integer math —
so "conversion" is a range check plus a modular reduction, mirroring the
reference's bit-level semantics: both directions panic when the source value
does not fit the destination field.
"""

from __future__ import annotations

from .fields.host import C, R

#: Modulus of the embedded curve's scalar field (JubJub Fr for BLS12-381,
#: the ed-on-bls12-377 scalar field for BLS12-377).
EMBEDDED_MODULUS = C.JUBJUB_ORDER

_ERR = ("The embedded scalar exceeds the capacity representation of the "
        "outter curve scalar")  # typo mirrored from util.rs:108


def from_embedded_curve_scalar(embedded_scalar: int) -> int:
    """Lift an embedded-curve (JubJub) scalar into the pairing curve's Fr.

    Mirrors `from_embedded_curve_scalar` (reference util.rs:94-117,
    exported by prelude.rs:17).  Panics (AssertionError) if the value does
    not fit below the smaller of the two moduli.
    """
    s = int(embedded_scalar)
    assert 0 <= s < EMBEDDED_MODULUS, "not a canonical embedded scalar"
    # Fr modulus has more bits than the embedded modulus for both supported
    # curves, so the reference's first branch applies: assert s < MODULUS.
    assert s < R, _ERR
    return s % R


def to_embedded_curve_scalar(pfc_scalar: int) -> int:
    """Project a pairing-curve Fr element onto the embedded scalar field.

    Mirrors `to_embedded_curve_scalar` (reference util.rs:119-146).
    Panics (AssertionError) if the Fr value is >= the embedded modulus —
    the reduction must be a no-op, not a wrap.
    """
    s = int(pfc_scalar)
    assert 0 <= s < R, "not a canonical Fr element"
    assert s < EMBEDDED_MODULUS, _ERR
    return s % EMBEDDED_MODULUS


def powers_of(scalar: int, max_degree: int, m: int = R) -> list[int]:
    """[1, s, s^2, ..., s^max_degree] (reference util.rs:16-21)."""
    out = [1]
    for _ in range(max_degree):
        out.append(out[-1] * scalar % m)
    return out
