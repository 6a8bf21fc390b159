"""BLS12-377 + ed-on-bls12-377 configuration (the reference's second
curve pair, plonk-core/src/test.rs:96-138).

The curve is selected at import time (ARKPLONK_CURVE), so these tests
run in a subprocess with the env set; the in-process suite stays on
BLS12-381."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script: str, timeout=900):
    env = dict(os.environ)
    env["ARKPLONK_CURVE"] = "bls12_377"
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("PYTHONPATH", REPO)
    r = subprocess.run([sys.executable, "-c", script], env=env, cwd=REPO,
                       capture_output=True, text=True, timeout=timeout)
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    return r.stdout


def test_bls377_fields_and_groups():
    out = _run("""
from arkplonk_tpu.fields import host
from arkplonk_tpu.fields.host import C
from arkplonk_tpu.curve import host as cv
from arkplonk_tpu.circuit import jubjub as te

assert host.CURVE == "bls12_377"
assert C.R_MOD.bit_length() == 253 and C.Q_MOD.bit_length() == 377

# domain of max two-adicity exists, and the NTT root has exact order
d = host.Domain(1 << 10)
w = d.group_gen
acc = w
for _ in range(9):
    acc = acc * acc % host.R
assert acc != 1 and acc * acc % host.R == 1

# G1/G2 generators on curve and in the r-torsion
assert cv.g1_is_on_curve(cv.G1_GEN)
assert cv.G1.mul(cv.G1_GEN, C.R_MOD - 1) == cv.G1.neg(cv.G1_GEN)
assert cv.g2_is_on_curve(cv.G2_GEN)
assert cv.G2.mul(cv.G2_GEN, C.R_MOD - 1) == cv.G2.neg(cv.G2_GEN)

# embedded TE curve: generator on curve with exact subgroup order
assert te.is_on_curve(te.GENERATOR)
assert te.mul(te.GENERATOR, C.JUBJUB_ORDER) == te.IDENTITY
assert te.mul(te.GENERATOR, C.JUBJUB_ORDER // 3) != te.IDENTITY

# coset constants K1/K2/K3 valid for the full 2^47 two-adic tower
from arkplonk_tpu.circuit.coset_check import check_coset_constants
check_coset_constants()
print("groups-ok")
""")
    assert "groups-ok" in out


def test_bls377_pairing_bilinear():
    out = _run("""
import os
os.environ["ARKPLONK_NATIVE_PAIRING"] = "0"  # C core is 381-only
from arkplonk_tpu.curve import host as cv

a, b = 1234567, 89101112
lhs = cv.pairing(cv.G1.mul(cv.G1_GEN, a), cv.G2.mul(cv.G2_GEN, b))
rhs = cv.f12_pow(cv.pairing(cv.G1_GEN, cv.G2_GEN), a * b)
assert lhs == rhs and lhs != cv.F12_ONE
print("pairing-ok")
""")
    assert "pairing-ok" in out


@pytest.mark.slow
def test_bls377_gadget_suite():
    """Every gate family through gadget_tester on the second curve
    config — the reference's batch_test! matrix row for BLS12-377 +
    ed-on-bls12-377 (test.rs:96-138, circuit.rs:392-508), positive and
    should-fail cases."""
    out = _run("""
import os
os.environ["ARKPLONK_NATIVE_PAIRING"] = "0"
import random
from arkplonk_tpu.api.circuit import gadget_tester
from arkplonk_tpu.pcs import kzg
from arkplonk_tpu.fields.host import R
from arkplonk_tpu.circuit import jubjub as te
from arkplonk_tpu.circuit.lookup_table import LookupTable
from arkplonk_tpu.errors import ProofVerificationError, ElementNotIndexed

rng = random.Random(99)
def det_rng():
    return rng.randrange(0, 1 << 252)
SRS = kzg.SRS.setup(1 << 11)

def arith(cs):
    a = cs.add_input(11); b = cs.add_input(7)
    c = cs.arithmetic_gate((a, b, None), add=(1, 1))
    d = cs.arithmetic_gate((a, c, None), mul=1)
    cs.constrain_to_constant(d, 11 * 18)
gadget_tester(arith, 16, srs=SRS, rng=det_rng)

def range_ok(cs):
    cs.range_gate(cs.add_input(250), 8)
gadget_tester(range_ok, 64, srs=SRS, rng=det_rng)

def range_bad(cs):
    cs.range_gate(cs.add_input(256), 8)
try:
    gadget_tester(range_bad, 64, srs=SRS, rng=det_rng)
    raise SystemExit("range_bad verified")
except (ProofVerificationError, AssertionError):
    pass

def logic(cs):
    a = cs.add_input(0b1011); b = cs.add_input(0b0110)
    x = cs.xor_gate(a, b, 8); cs.constrain_to_constant(x, 0b1101)
    y = cs.and_gate(a, b, 8); cs.constrain_to_constant(y, 0b0010)
gadget_tester(logic, 64, srs=SRS, rng=det_rng)

def lookup(cs):
    cs.lookup_table = LookupTable.xor_table(0, 3)
    a = cs.add_input(5); b = cs.add_input(3)
    c = cs.add_input(6); d = cs.add_input((R - 1) % R)
    cs.lookup_gate(a, b, c, d)
gadget_tester(lookup, 128, srs=SRS, rng=det_rng)

def lookup_bad(cs):
    cs.lookup_table = LookupTable.xor_table(0, 2)
    cs.lookup_gate(cs.add_input(1), cs.add_input(2), cs.add_input(9),
                   cs.add_input((R - 1) % R))
try:
    gadget_tester(lookup_bad, 128, srs=SRS, rng=det_rng)
    raise SystemExit("lookup_bad verified")
except (ProofVerificationError, ElementNotIndexed, AssertionError):
    pass

G = te.GENERATOR
def ecc(cs):
    p1 = cs.add_affine(G)
    p2 = cs.add_affine(te.mul(G, 2))
    p3 = cs.point_addition_gate(p1, p2)
    cs.assert_equal_public_point(p3, te.mul(G, 3))
gadget_tester(ecc, 64, srs=SRS, rng=det_rng)

def fbsm(cs):
    s = 0x1234
    sv = cs.add_input(s)
    p = cs.fixed_base_scalar_mul(sv, G)
    cs.assert_equal_public_point(p, te.mul(G, s))
gadget_tester(fbsm, 512, srs=SRS, rng=det_rng)
print("gadgets-377-ok")
""", timeout=3600)
    assert "gadgets-377-ok" in out


@pytest.mark.slow
def test_bls377_ipa_e2e():
    """377 x IPA cell of the (curve x PCS) matrix (test.rs:96-138)."""
    out = _run("""
import os
os.environ["ARKPLONK_NATIVE_PAIRING"] = "0"
import random
from arkplonk_tpu.api.circuit import gadget_tester
from arkplonk_tpu.pcs import ipa as ipa_mod

rng = random.Random(7)
def det_rng():
    return rng.randrange(0, 1 << 252)

def gadget(cs):
    a = cs.add_input(9); b = cs.add_input(4)
    c = cs.arithmetic_gate((a, b, None), mul=1)
    cs.constrain_to_constant(c, 36)

setup = ipa_mod.IPASetup.setup(1 << 6)
gadget_tester(gadget, 16, srs=setup, rng=det_rng, pcs=ipa_mod)
print("ipa-377-ok")
""", timeout=1800)
    assert "ipa-377-ok" in out


@pytest.mark.slow
def test_bls377_host_prove_verify():
    out = _run("""
import os
os.environ["ARKPLONK_NATIVE_PAIRING"] = "0"
import random
from arkplonk_tpu.proving.prover import Prover
from arkplonk_tpu.api.circuit import Verifier
from arkplonk_tpu.pcs import kzg
from arkplonk_tpu.fields.host import R

srs = kzg.SRS.setup(1 << 7)

def gadget(cs):
    a = cs.add_input(11)
    b = cs.add_input(7)
    c = cs.arithmetic_gate((a, b, None), add=(1, 1))
    cs.range_gate(c, 8)
    d = cs.xor_gate(a, b, 8)
    cs.constrain_to_constant(d, 11 ^ 7)

rng = random.Random(42)
prover = Prover(b"t377", rng=lambda: rng.randrange(0, 1 << 252))
gadget(prover.cs)
proof = prover.prove(srs)
pis = dict(prover.cs.public_inputs)
ver = Verifier(b"t377", rng=None)
gadget(ver.cs)
ver.preprocess(srs)
assert ver.verify(proof, srs, pis)
print("e2e-ok")
""", timeout=1800)
    assert "e2e-ok" in out
