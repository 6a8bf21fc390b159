"""Device prover vs host golden prover: identical proofs, verifies OK.

The deterministic blinding RNG makes the two paths byte-comparable
(SURVEY.md §4.8b: golden cross-checks between slow and fast paths).
"""

import random

import pytest

from arkplonk_tpu.api.circuit import Verifier
from arkplonk_tpu.proving.prover import Prover
from arkplonk_tpu.proving.device import DeviceProver
from arkplonk_tpu.circuit.lookup_table import LookupTable
from arkplonk_tpu.fields.host import R
from arkplonk_tpu.pcs import kzg

SRS = kzg.SRS.setup(1 << 9)


def mk_rng():
    rng = random.Random(0xBEEF)
    return lambda: rng.randrange(0, 1 << 255)


def build_gadget(cs):
    cs.lookup_table = LookupTable.xor_table(0, 2)
    a = cs.add_input(3)
    b = cs.add_input(5)
    c = cs.arithmetic_gate((a, b, None), add=(1, 1))
    d = cs.arithmetic_gate((a, c, None), mul=1)
    cs.constrain_to_constant(d, 24, None)
    v = cs.add_input(13)
    cs.range_gate(v, 4)
    x = cs.add_input(2)
    y = cs.add_input(1)
    out = cs.add_input(3)
    cs.lookup_gate(x, y, out, cs.add_input((R - 1) % R))
    w = cs.xor_gate(a, b, 4)
    cs.constrain_to_constant(w, 6, None)


def _proof_fields(p):
    return [p.a_comm, p.b_comm, p.c_comm, p.d_comm, p.z_comm, p.f_comm,
            p.h_1_comm, p.h_2_comm, p.z_2_comm, p.t_1_comm, p.t_2_comm,
            p.t_3_comm, p.t_4_comm, p.aw_opening.w, p.saw_opening.w,
            p.evaluations]


def test_device_prover_matches_host(monkeypatch):
    # Pin the PER-ROUND device path here (the mega path is covered by
    # test_device_mega.py, which runs earlier in the suite).  Compiling
    # a SECOND mega program instance in the same XLA:CPU process
    # segfaults this jaxlib (same class of crash as the serializer one
    # noted in conftest.py); the per-round path is exactly the fallback
    # the mega prover takes on an MSM anomaly, so this also gives that
    # branch standing coverage.
    # NOTE: test_device_mega is @pytest.mark.slow (its one mega compile
    # is ~4 min on CPU), so a `-m "not slow"` run has NO mega-path
    # coverage — the production default prove path is then untested.
    # Run at least test_device_mega.py when touching proving/device*.py.
    monkeypatch.setenv("ARKPLONK_MEGA", "0")
    host_prover = Prover(b"demo", rng=mk_rng())
    build_gadget(host_prover.cs)
    host_prover.preprocess(SRS)
    pis = dict(host_prover.cs.public_inputs)
    host_proof = host_prover.prove_with_preprocessed(
        SRS, host_prover.prover_key)

    dev_prover = DeviceProver(b"demo", rng=mk_rng())
    build_gadget(dev_prover.cs)
    dev_prover.preprocess(SRS)
    dev_proof = dev_prover.prove_with_preprocessed(SRS, dev_prover.device_pk)

    hf = _proof_fields(host_proof)
    df = _proof_fields(dev_proof)
    for i, (h, d) in enumerate(zip(hf, df)):
        assert h == d, f"proof field {i} differs"

    verifier = Verifier(b"demo", rng=mk_rng())
    build_gadget(verifier.cs)
    verifier.preprocess(SRS)
    assert verifier.verify(dev_proof, SRS, pis)


def test_enc_stack_narrow_matches_full():
    """Narrow signed-residue upload == full-limb encoding for every
    tier (i32 / i64 / full-limb fallback) and at the tier boundaries."""
    import numpy as np
    import jax
    from arkplonk_tpu.proving.device import _enc_stack, enc_stack_narrow

    rng = random.Random(11)
    cases = [
        [[0, 1, 2, 3], [4, 5, R - 1, R - 3]],            # i32 (+neg)
        [[1 << 40, R - (1 << 40), 7, 9]],                # i64
        [[rng.randrange(R) for _ in range(4)]],          # full fallback
        [[(1 << 31), R - (1 << 31), (1 << 31) - 1, R - (1 << 31) + 1]],
        [[(1 << 62) - 1, R - (1 << 62) + 1, 0, 1]],
        [[(1 << 62), R - (1 << 62), 5, 6]],              # just past i62
    ]
    for i, lists in enumerate(cases):
        a = np.asarray(jax.device_get(_enc_stack(lists)))
        b = np.asarray(jax.device_get(enc_stack_narrow(lists)))
        assert (a == b).all(), f"case {i} mismatch"
