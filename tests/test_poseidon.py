"""Poseidon host permutation + in-circuit gadget end-to-end."""

import random

from arkplonk_tpu.circuit import poseidon
from arkplonk_tpu.api.circuit import gadget_tester
from arkplonk_tpu.fields.host import R
from arkplonk_tpu.pcs import kzg

RNG = random.Random(0x705E)


def det():
    return RNG.randrange(0, 1 << 255)


def test_permutation_properties():
    s1 = poseidon.permute([1, 2, 3])
    s2 = poseidon.permute([1, 2, 3])
    assert s1 == s2
    assert s1 != poseidon.permute([1, 2, 4])
    assert all(0 <= x < R for x in s1)
    # MDS is invertible (determinant nonzero): check no two equal rows
    assert len({tuple(r) for r in poseidon.MDS}) == 3


def test_hash2_gadget_matches_host():
    a, b = 12345, 67890
    want = poseidon.hash2(a, b)

    def gadget(cs):
        av = cs.add_input(a)
        bv = cs.add_input(b)
        hv = poseidon.hash2_gadget(cs, av, bv)
        cs.constrain_to_constant(hv, want, None)
        cs.check_circuit_satisfied()

    gadget_tester(gadget, 1 << 9, srs=kzg.SRS.setup(1 << 10), rng=det)


def test_hash2_gadget_wrong_preimage_fails():
    import pytest
    want = poseidon.hash2(1, 2)

    def gadget(cs):
        av = cs.add_input(1)
        bv = cs.add_input(3)  # wrong preimage
        hv = poseidon.hash2_gadget(cs, av, bv)
        cs.constrain_to_constant(hv, want, None)

    with pytest.raises(AssertionError):
        gadget_tester(gadget, 1 << 9, srs=kzg.SRS.setup(1 << 10), rng=det)
