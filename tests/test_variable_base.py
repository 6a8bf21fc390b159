"""variable_base_scalar_mul gadget coverage (VERDICT weak item 6;
reference ecc/scalar_mul/variable_base.rs:102-168) + coset constants."""

import random

import pytest

from arkplonk_tpu.api.circuit import gadget_tester
from arkplonk_tpu.circuit import jubjub
from arkplonk_tpu.circuit.composer import StandardComposer
from arkplonk_tpu.circuit.coset_check import check_coset_constants
from arkplonk_tpu.pcs import kzg


def det_rng():
    rng = random.Random(0xFEED)
    return rng.randrange(0, 1 << 255)


def test_variable_base_scalar_mul_satisfied():
    """Front-end satisfiability (cheap): correct result passes, wrong
    result trips the circuit checker."""
    cs = StandardComposer()
    s = cs.add_input(5555)
    p = cs.add_affine(jubjub.GENERATOR)
    res = cs.variable_base_scalar_mul(s, p)
    cs.assert_equal_public_point(res, jubjub.mul(jubjub.GENERATOR, 5555))
    cs.check_circuit_satisfied()


def test_variable_base_scalar_mul_wrong_result_fails():
    cs = StandardComposer()
    s = cs.add_input(5555)
    p = cs.add_affine(jubjub.GENERATOR)
    res = cs.variable_base_scalar_mul(s, p)
    cs.assert_equal_public_point(res, jubjub.mul(jubjub.GENERATOR, 5556))
    with pytest.raises(Exception):
        cs.check_circuit_satisfied()


@pytest.mark.slow
def test_variable_base_scalar_mul_e2e():
    """Full prove+verify through the gadget_tester harness."""
    def gadget(cs):
        s = cs.add_input(31337)
        p = cs.add_affine(jubjub.GENERATOR)
        res = cs.variable_base_scalar_mul(s, p)
        cs.assert_equal_public_point(
            res, jubjub.mul(jubjub.GENERATOR, 31337))

    gadget_tester(gadget, 4096, srs=kzg.SRS.setup(1 << 13), rng=det_rng)


def test_coset_constants_valid():
    assert check_coset_constants()


def test_coset_constants_reject_subgroup_element():
    from arkplonk_tpu.fields.host import R
    from arkplonk_tpu.fields.bls12_381 import FR_GENERATOR
    # an actual 2^32-subgroup element: g^((r-1)/2^32)
    w = pow(FR_GENERATOR, (R - 1) >> 32, R)
    with pytest.raises(ValueError):
        check_coset_constants(ks=(w, 13, 17))