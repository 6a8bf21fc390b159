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


def test_generator_derivation_frozen():
    """Blake2s(PC-DL-2020 || i_le8) derivation per ark-poly-commit 0.3
    sample_generators (commitment.rs:52-63 instantiates Blake2s); frozen
    so any drift in the digest schedule or point decoding is caught.
    The points are prime-order (cofactor cleared)."""
    import hashlib
    from arkplonk_tpu.curve import host as cv
    from arkplonk_tpu.fields.host import CURVE
    from arkplonk_tpu.transcript import serialize as ser
    if CURVE != "bls12_381":
        return
    g0, g1 = SETUP.g[0], SETUP.g[1]
    d = hashlib.sha256(
        ser.g1_to_bytes(g0) + ser.g1_to_bytes(g1)).hexdigest()
    assert d == ("bdd5a36bb8b39b56ecc3c3f6416f2d35"
                 "7c9e6093dce16e4b4a383c9c2da8cb9a")
    assert cv.jac_to_affine(
        cv.jac_mul(cv.jac_from_affine(g0), cv.R)) is None


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
