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
