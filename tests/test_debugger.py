"""Device circuit debugger: vectorized identity check + failing-gate index."""

from arkplonk_tpu.circuit.composer import StandardComposer
from arkplonk_tpu.proving.debugger import check_circuit_satisfied_device


def _rng():
    return 0  # blinding zeros keep the debugger deterministic


def test_satisfied_circuit():
    cs = StandardComposer(rng=lambda: 0)
    a = cs.add_input(3)
    b = cs.add_input(4)
    c = cs.arithmetic_gate((a, b, None), add=(1, 1))
    cs.constrain_to_constant(c, 7, None)
    v = cs.add_input(9)
    cs.range_gate(v, 4)
    ok, bad = check_circuit_satisfied_device(cs)
    assert ok and bad == -1


def test_unsatisfied_circuit_locates_gate():
    cs = StandardComposer(rng=lambda: 0)
    a = cs.add_input(3)
    b = cs.add_input(4)
    c = cs.arithmetic_gate((a, b, None), add=(1, 1))
    bad_gate_index = cs.n  # the next gate is the broken one
    cs.constrain_to_constant(c, 8, None)  # 7 != 8
    ok, bad = check_circuit_satisfied_device(cs)
    assert not ok
    assert bad == bad_gate_index
