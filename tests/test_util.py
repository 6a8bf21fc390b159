"""Embedded↔outer scalar conversion + prelude/API parity.

Covers reference util.rs:95-146 (from/to_embedded_curve_scalar),
prelude.rs:12-18 (export surface), circuit.rs:214 (CIRCUIT_ID) and the
trace-print gate dump (composer.rs:714-751).
"""

import io
import contextlib

import pytest

from arkplonk_tpu.fields.host import C, R
from arkplonk_tpu.util import (EMBEDDED_MODULUS, from_embedded_curve_scalar,
                               powers_of, to_embedded_curve_scalar)


def test_roundtrip_small_values():
    for v in (0, 1, 12345, EMBEDDED_MODULUS - 1):
        assert from_embedded_curve_scalar(v) == v
        assert to_embedded_curve_scalar(v) == v
        assert to_embedded_curve_scalar(from_embedded_curve_scalar(v)) == v


def test_from_embedded_rejects_noncanonical():
    with pytest.raises(AssertionError):
        from_embedded_curve_scalar(EMBEDDED_MODULUS)
    with pytest.raises(AssertionError):
        from_embedded_curve_scalar(-1)


def test_to_embedded_panics_above_embedded_modulus():
    # util.rs:119-146: an Fr element >= the embedded modulus must panic,
    # not silently wrap.
    with pytest.raises(AssertionError, match="exceeds the capacity"):
        to_embedded_curve_scalar(EMBEDDED_MODULUS)
    with pytest.raises(AssertionError):
        to_embedded_curve_scalar(R - 1)


def test_embedded_modulus_is_jubjub_subgroup_order():
    from arkplonk_tpu.circuit import jubjub
    assert EMBEDDED_MODULUS == C.JUBJUB_ORDER
    # the generator has exactly this order
    assert jubjub.mul(jubjub.GENERATOR, EMBEDDED_MODULUS) == jubjub.IDENTITY


def test_powers_of():
    assert powers_of(5, 3) == [1, 5, 25, 125]
    assert powers_of(R - 1, 2) == [1, R - 1, 1]


def test_prelude_surface():
    """prelude.rs:12-18 names all resolve."""
    from arkplonk_tpu import prelude
    for name in prelude.__all__:
        assert getattr(prelude, name) is not None


def test_circuit_id_default():
    from arkplonk_tpu.prelude import Circuit
    assert Circuit.CIRCUIT_ID == b"\xff" * 32

    class MyCircuit(Circuit):
        CIRCUIT_ID = bytes(range(32))

    assert len(MyCircuit.CIRCUIT_ID) == 32


def test_trace_print_dumps_gates():
    """trace-print analogue: per-gate selector/witness dump
    (composer.rs:714-751)."""
    from arkplonk_tpu.circuit.composer import StandardComposer
    cs = StandardComposer()
    a = cs.add_input(3)
    b = cs.add_input(4)
    cs.arithmetic_gate((a, b, None), mul=1)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        cs.check_circuit_satisfied(trace_print=True)
    out = buf.getvalue()
    assert "#Gate Index = 0" in out
    assert "- qm -> " in out and "- w_4 -> " in out
    # one block per gate
    assert out.count("#Gate Index") == cs.n
