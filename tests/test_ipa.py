"""IPA PCS backend: commit/open/check self-consistency."""

import random

from arkplonk_tpu.fields.host import R
from arkplonk_tpu.pcs import ipa
from arkplonk_tpu.pcs.kzg import poly_eval

RNG = random.Random(11)

SETUP = ipa.IPASetup.setup(32)


def test_generators_distinct_on_curve():
    from arkplonk_tpu.curve.host import g1_is_on_curve
    assert len({p for p in SETUP.g}) == len(SETUP.g)
    for p in SETUP.g[:4] + [SETUP.u]:
        assert g1_is_on_curve(p)


def test_open_check_single():
    p = [RNG.randrange(R) for _ in range(20)]
    c = ipa.commit(SETUP, p)
    z = RNG.randrange(R)
    chi = RNG.randrange(R)
    proof = ipa.open_polys(SETUP, [p], z, chi)
    assert ipa.check(SETUP, [c], z, [poly_eval(p, z)], proof, chi)
    assert not ipa.check(SETUP, [c], z, [(poly_eval(p, z) + 1) % R],
                         proof, chi)


def test_open_check_aggregate():
    polys = [[RNG.randrange(R) for _ in range(RNG.randrange(4, 30))]
             for _ in range(3)]
    comms = [ipa.commit(SETUP, p) for p in polys]
    z = RNG.randrange(R)
    chi = RNG.randrange(R)
    proof = ipa.open_polys(SETUP, polys, z, chi)
    vals = [poly_eval(p, z) for p in polys]
    assert ipa.check(SETUP, comms, z, vals, proof, chi)
    bad = list(vals)
    bad[1] = (bad[1] + 3) % R
    assert not ipa.check(SETUP, comms, z, bad, proof, chi)


def test_full_protocol_over_ipa():
    """The PCS-generic protocol runs end-to-end over the IPA backend
    (the reference's KZG/IPA test-matrix, plonk-core/src/test.rs:96)."""
    import random
    from arkplonk_tpu.api.circuit import gadget_tester
    from arkplonk_tpu.pcs import ipa as ipa_mod

    rng = random.Random(0xABC)

    def det():
        return rng.randrange(0, 1 << 255)

    def gadget(cs):
        a = cs.add_input(6)
        b = cs.add_input(7)
        c = cs.arithmetic_gate((a, b, None), mul=1)
        cs.constrain_to_constant(c, 42, None)
        v = cs.add_input(12)
        cs.range_gate(v, 4)

    setup = ipa_mod.IPASetup.setup(1 << 7)
    gadget_tester(gadget, 64, srs=setup, rng=det, pcs=ipa_mod)
