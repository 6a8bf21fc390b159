"""Single-dispatch (mega) prover vs the host golden path.

The mega program runs all 5 rounds + Fiat-Shamir on device
(proving/device_mega.py); its proof must be byte-identical to the host
prover's (reference protocol: prover.rs:163-638).
"""

import os
import random

import pytest

from arkplonk_tpu.pcs import kzg
from arkplonk_tpu.proving.prover import Prover
from arkplonk_tpu.proving.device import DeviceProver
from arkplonk_tpu.proving.serde import proof_to_bytes

SRS = kzg.SRS.setup(1 << 9)


def _det_rng():
    rng = random.Random(7)
    return lambda: rng.randrange(0, 1 << 255)


def _build(cs, size=31):
    cs.add_dummy_lookup_table()
    while cs.circuit_bound() < size:
        cs.add_dummy_constraints()


@pytest.mark.slow
def test_mega_matches_host(monkeypatch):
    hp = Prover(b"ark", rng=_det_rng())
    _build(hp.cs)
    hp.preprocess(SRS)
    hproof = hp.prove_with_preprocessed(SRS, hp.prover_key)

    monkeypatch.setenv("ARKPLONK_HOST_PREPROCESS", "1")
    monkeypatch.setenv("ARKPLONK_MEGA", "1")
    dp = DeviceProver(b"ark", rng=_det_rng())
    _build(dp.cs)
    dp.preprocess(SRS)

    from arkplonk_tpu.proving import device_mega
    dproof = device_mega.prove_mega(dp, dp.device_pk)
    assert dproof is not None, "mega path unexpectedly fell back"
    assert proof_to_bytes(dproof) == proof_to_bytes(hproof)
