"""End-to-end prove+verify over the host golden path.

Python analogue of the reference's gadget_tester-based test suites
(constraint_system/helper.rs:38-99 + per-gate test modules), including
should-fail cases.
"""

import random

import pytest

from arkplonk_tpu.api.circuit import gadget_tester, Circuit, verify_proof
from arkplonk_tpu.circuit import jubjub
from arkplonk_tpu.circuit.lookup_table import LookupTable
from arkplonk_tpu.fields.host import R
from arkplonk_tpu.pcs import kzg

RNG = random.Random(0xDE7)


def det_rng():
    return RNG.randrange(0, 1 << 255)


SRS = kzg.SRS.setup(1 << 9)


def test_arith_gates():
    def gadget(cs):
        a = cs.add_input(3)
        b = cs.add_input(5)
        c = cs.arithmetic_gate((a, b, None), add=(1, 1))
        d = cs.arithmetic_gate((a, c, None), mul=1)
        cs.constrain_to_constant(d, 24, None)
        cs.check_circuit_satisfied()
    gadget_tester(gadget, 16, srs=SRS, rng=det_rng)


def test_public_inputs():
    def gadget(cs):
        a = cs.add_input(10)
        b = cs.add_input(20)
        # a + b - 30 + PI = 0 with PI = 0 position; use pi in gate
        c = cs.arithmetic_gate((a, b, None), add=(1, 1), pi=(-5) % R)
        cs.constrain_to_constant(c, 25, None)
        cs.check_circuit_satisfied()
    gadget_tester(gadget, 16, srs=SRS, rng=det_rng)


def test_unsatisfied_circuit_fails():
    def gadget(cs):
        a = cs.add_input(3)
        b = cs.add_input(5)
        c = cs.arithmetic_gate((a, b, None), add=(1, 1))
        # force wrong constant: c = 8, constrain to 9
        cs.constrain_to_constant(c, 9, None)
    with pytest.raises(AssertionError):
        gadget_tester(gadget, 16, srs=SRS, rng=det_rng)


def test_range_gate():
    def gadget(cs):
        v = cs.add_input(63)
        cs.range_gate(v, 6)
        w = cs.add_input(1000)
        cs.range_gate(w, 10)
        cs.check_circuit_satisfied()
    gadget_tester(gadget, 64, srs=SRS, rng=det_rng)


def test_range_gate_out_of_range_fails():
    def gadget(cs):
        v = cs.add_input(1 << 7)
        cs.range_gate(v, 6)
    with pytest.raises(AssertionError):
        gadget_tester(gadget, 64, srs=SRS, rng=det_rng)


def test_logic_gates():
    def gadget(cs):
        a = cs.add_input(0b1101)
        b = cs.add_input(0b1011)
        c = cs.xor_gate(a, b, 4)
        cs.constrain_to_constant(c, 0b0110, None)
        d = cs.and_gate(a, b, 4)
        cs.constrain_to_constant(d, 0b1001, None)
        cs.check_circuit_satisfied()
    gadget_tester(gadget, 64, srs=SRS, rng=det_rng)


def test_conditionals_and_iszero():
    def gadget(cs):
        bit = cs.add_input(1)
        cs.boolean_gate(bit)
        x = cs.add_input(7)
        y = cs.add_input(9)
        sel = cs.conditional_select(bit, x, y)
        cs.assert_equal(sel, x)
        z = cs.is_eq_with_output(x, y)
        cs.constrain_to_constant(z, 0, None)
        w = cs.is_zero_with_output(cs.zero_var)
        cs.constrain_to_constant(w, 1, None)
        cs.check_circuit_satisfied()
    gadget_tester(gadget, 64, srs=SRS, rng=det_rng)


def test_lookup_gate():
    def gadget(cs):
        cs.lookup_table = LookupTable.xor_table(0, 3)
        a = cs.add_input(2)
        b = cs.add_input(5)
        c = cs.add_input(7)  # 2 xor 5
        d = cs.add_input((R - 1) % R)
        cs.lookup_gate(a, b, c, d)
        cs.constrain_to_constant(c, 7, None)
    gadget_tester(gadget, 128, srs=SRS, rng=det_rng)


def test_lookup_gate_not_in_table_fails():
    def gadget(cs):
        cs.lookup_table = LookupTable.xor_table(0, 3)
        a = cs.add_input(2)
        b = cs.add_input(5)
        c = cs.add_input(6)  # wrong output
        d = cs.add_input((R - 1) % R)
        cs.lookup_gate(a, b, c, d)
    from arkplonk_tpu.errors import ElementNotIndexed
    with pytest.raises((AssertionError, ElementNotIndexed)):
        gadget_tester(gadget, 128, srs=SRS, rng=det_rng)


def test_point_addition():
    def gadget(cs):
        p1 = cs.add_affine(jubjub.GENERATOR)
        g2 = jubjub.add(jubjub.GENERATOR, jubjub.GENERATOR)
        p2 = cs.add_affine(g2)
        p3 = cs.point_addition_gate(p1, p2)
        cs.assert_equal_public_point(p3, jubjub.add(jubjub.GENERATOR, g2))
        cs.check_circuit_satisfied()
    gadget_tester(gadget, 64, srs=SRS, rng=det_rng)


def test_conditional_point_ops():
    def gadget(cs):
        bit1 = cs.add_input(1)
        cs.boolean_gate(bit1)
        bit0 = cs.zero_var
        pa = cs.add_affine(jubjub.GENERATOR)
        pid = cs.point_identity()
        chosen = cs.conditional_point_select(pa, pid, bit1)
        cs.assert_equal_public_point(chosen, jubjub.GENERATOR)
        chosen0 = cs.conditional_point_select(pa, pid, bit0)
        cs.assert_equal_public_point(chosen0, jubjub.IDENTITY)
        neg = cs.conditional_point_neg(bit1, pa)
        cs.assert_equal_public_point(neg, jubjub.neg(jubjub.GENERATOR))
        cs.check_circuit_satisfied()
    gadget_tester(gadget, 256, srs=SRS, rng=det_rng)


@pytest.mark.slow
def test_fixed_base_scalar_mul():
    def gadget(cs):
        s = cs.add_input(7777)
        res = cs.fixed_base_scalar_mul(s)
        cs.assert_equal_public_point(res, jubjub.mul(jubjub.GENERATOR, 7777))
        cs.check_circuit_satisfied()
    gadget_tester(gadget, 512, srs=kzg.SRS.setup(1 << 11), rng=det_rng)


def test_multi_proof_reuse():
    """One preprocessed prover, several proofs (composer.rs:963-1008)."""
    from arkplonk_tpu.proving.prover import Prover
    from arkplonk_tpu.api.circuit import Verifier

    def gadget(cs):
        a = cs.add_input(4)
        b = cs.add_input(6)
        c = cs.arithmetic_gate((a, b, None), add=(1, 1))
        cs.constrain_to_constant(c, 10, None)

    prover = Prover(b"demo", rng=det_rng)
    gadget(prover.cs)
    prover.preprocess(SRS)
    pis = dict(prover.cs.public_inputs)
    proofs = [prover.prove_with_preprocessed(SRS, prover.prover_key)]
    prover.clear_witness()
    for _ in range(2):
        gadget(prover.cs)
        proofs.append(prover.prove_with_preprocessed(SRS, prover.prover_key))
        prover.clear_witness()

    verifier = Verifier(b"demo", rng=det_rng)
    gadget(verifier.cs)
    verifier.preprocess(SRS)
    for p in proofs:
        assert verifier.verify(p, SRS, pis)


def test_circuit_api():
    """compile -> gen_proof -> verify_proof (circuit.rs test_full shape)."""

    class TestCircuit(Circuit):
        def __init__(self, a, b):
            self.a, self.b = a, b

        def gadget(self, cs):
            a = cs.add_input(self.a)
            b = cs.add_input(self.b)
            c = cs.arithmetic_gate((a, b, None), add=(1, 1),
                                   pi=(-(self.a + self.b)) % R)
            cs.constrain_to_constant(c, 0, None)

        def padded_circuit_size(self):
            return 32

    circ = TestCircuit(7, 8)
    pk, vk, pi_pos = circ.compile(SRS, rng=det_rng)
    proof, pi = circ.gen_proof(SRS, pk, b"Test", rng=det_rng)
    assert verify_proof(SRS, vk, proof, pi, b"Test")
    # wrong PI fails
    bad_pi = dict(pi)
    for k in bad_pi:
        bad_pi[k] = (bad_pi[k] + 1) % R
    assert not verify_proof(SRS, vk, proof, bad_pi, b"Test")
