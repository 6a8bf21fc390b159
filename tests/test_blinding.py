"""ZK blinding (composer.rs:241-243, 580-648).

Guards against the round-2 regression where `add_blinding_factors()` was
accidentally moved behind a `return` and never ran: the composer must
create the 3 blinding rows at construction, and two proofs of the same
circuit with the OS RNG must differ byte-for-byte.
"""

import pytest

from arkplonk_tpu.circuit.composer import StandardComposer
from arkplonk_tpu.fields.host import CURVE
from arkplonk_tpu.pcs import kzg
from arkplonk_tpu.proving.prover import Prover
from arkplonk_tpu.proving import serde


def test_composer_has_blinding_rows():
    cs = StandardComposer()
    # zero-var constraint row + 2 random wire rows + 1 repeated-random row
    assert cs.n == 4
    # the blinding rows carry zero selectors but nonzero random wires
    blind_vals = [cs.variables[v] for v in cs.w_l[1:3]]
    assert all(v != 0 for v in blind_vals), "blinding wires are not random"
    # rows 1,2 random and distinct with overwhelming probability
    assert len({cs.variables[v]
                for w in (cs.w_l, cs.w_r, cs.w_o, cs.w_4)
                for v in w[1:3]}) == 8


def test_with_expected_size_also_blinds():
    cs = StandardComposer.with_expected_size(64)
    assert cs.n == 4
    assert cs.expected_size == 64


@pytest.mark.skipif(CURVE != "bls12_381", reason="SRS fixture is 381")
def test_osrng_proofs_differ():
    srs = kzg.SRS.setup(64 + 8)

    def build():
        prover = Prover(b"blind")
        cs = prover.cs
        a = cs.add_input(3)
        b = cs.add_input(5)
        cs.arithmetic_gate((a, b, None), mul=1)
        prover.preprocess(srs)
        return prover, prover.prove_with_preprocessed(srs,
                                                      prover.prover_key)

    p1, proof1 = build()
    p2, proof2 = build()
    assert serde.proof_to_bytes(proof1) != serde.proof_to_bytes(proof2)
    # both verify
    for p, proof in ((p1, proof1), (p2, proof2)):
        ok = proof.verify(p.verifier_key,
                          p.preprocessed_transcript.clone(), srs,
                          dict(p.cs.public_inputs))
        assert ok
