"""Hand-replayed Fiat-Shamir challenge sequence (VERDICT r4 missing #2).

The golden-proof hash pins our pipeline's *stability*; this test pins
the *schedule* independently: every transcript append/challenge of a
full prove is re-executed here against the RAW Merlin transcript
(validated against the published merlin test vector in
tests/test_transcript.py), with labels and ordering transcribed by hand
from the reference sources — NOT from transcript/plonk.py or the
prover.  A schedule bug that kept prover+verifier self-consistent but
diverged from plonk-core would fail here.

Reference schedule sources:
- seed: widget/mod.rs:252-278 (note q_4 after q_c, variable before
  fixed, no q_lookup/table commitments, trailing circuit_domain_sep)
- rounds: prover.rs:182,217-226,294-337,366,398-426 (the "seperation"
  append-label typos at :403,:407),472-481
- evaluations: prover.rs:516-553 (table evals NOT appended; custom
  labels in CustomEvaluations order, linearisation_poly.rs:110-140)
- openings: prover.rs:563,594 (two draws of b"aggregate_witness",
  nothing appended between them)
- challenge mapping: transcript.rs:34-44 (31 bytes LE);
  appends of drawn challenges are 32-byte LE (ark-serialize Fr)
"""

import random

import pytest

from arkplonk_tpu.fields.host import CURVE
from arkplonk_tpu.pcs import kzg
from arkplonk_tpu.proving.prover import Prover
from arkplonk_tpu.proving import pi as pi_mod
from arkplonk_tpu.transcript import plonk as tp
from arkplonk_tpu.transcript import serialize as ser
from arkplonk_tpu.transcript.merlin import Transcript

pytestmark = pytest.mark.skipif(
    CURVE != "bls12_381", reason="fixture is BLS12-381")


def _build(cs):
    from arkplonk_tpu.circuit.lookup_table import LookupTable
    from arkplonk_tpu.fields.host import R
    cs.lookup_table = LookupTable.xor_table(0, 2)
    a = cs.add_input(3)
    b = cs.add_input(5)
    c = cs.arithmetic_gate((a, b, None), add=(1, 1), pi=4)
    cs.range_gate(cs.add_input(13), 4)
    cs.lookup_gate(cs.add_input(2), cs.add_input(1), cs.add_input(3),
                   cs.add_input((R - 1) % R))
    cs.xor_gate(a, b, 4)


def test_challenge_schedule_hand_replayed(monkeypatch):
    recorded = []
    orig = tp.PlonkTranscript.challenge_scalar

    def rec(self, label):
        v = orig(self, label)
        recorded.append((label, v))
        return v

    monkeypatch.setattr(tp.PlonkTranscript, "challenge_scalar", rec)

    srs = kzg.SRS.setup(64 + 8)
    rng = random.Random(31337)
    prover = Prover(b"hand-replay", rng=lambda: rng.randrange(0, 1 << 255))
    prover.key_transcript(b"key", b"additional seed information")
    _build(prover.cs)
    prover.preprocess(srs)
    pis = dict(prover.cs.public_inputs)
    proof = prover.prove_with_preprocessed(srs, prover.prover_key)
    assert len(recorded) == 14  # zeta,beta,gamma,delta,epsilon,alpha,
    #                             5 separations, z, aw, saw

    # ---- independent replay on the raw Merlin transcript ----------------
    vk = prover.verifier_key
    c = vk.commitments
    ev = proof.evaluations
    t = Transcript(b"hand-replay")
    t.append_message(b"key", b"additional seed information")

    def ap_g1(label, p):
        t.append_message(label, ser.g1_to_bytes(p))

    def ap_fr(label, x):
        t.append_message(label, ser.fr_to_bytes(x))

    def chal(label):
        return int.from_bytes(t.challenge_bytes(label, 31), "little")

    out = []

    def chal_ap(ch_label, ap_label):
        v = chal(ch_label)
        ap_fr(ap_label, v)
        out.append((ch_label, v))
        return v

    # seed (widget/mod.rs:252-278)
    for lbl in (b"q_m", b"q_l", b"q_r", b"q_o", b"q_c", b"q_4",
                b"q_arith", b"q_range", b"q_logic",
                b"q_variable_group_add", b"q_fixed_group_add",
                b"left_sigma", b"right_sigma", b"out_sigma",
                b"fourth_sigma"):
        ap_g1(lbl, c[lbl.decode()])
    t.append_message(b"dom-sep", b"circuit_size")
    t.append_u64(b"n", vk.n)

    # prove (prover.rs:182..)
    t.append_message(b"pi", pi_mod.to_bytes(pis))
    ap_g1(b"w_l", proof.a_comm)
    ap_g1(b"w_r", proof.b_comm)
    ap_g1(b"w_o", proof.c_comm)
    ap_g1(b"w_4", proof.d_comm)
    chal_ap(b"zeta", b"zeta")
    ap_g1(b"f", proof.f_comm)
    ap_g1(b"h1", proof.h_1_comm)
    ap_g1(b"h2", proof.h_2_comm)
    for lbl in (b"beta", b"gamma", b"delta", b"epsilon"):
        chal_ap(lbl, lbl)
    ap_g1(b"z", proof.z_comm)
    chal_ap(b"alpha", b"alpha")
    chal_ap(b"range separation challenge",
            b"range seperation challenge")       # typo: prover.rs:403
    chal_ap(b"logic separation challenge",
            b"logic seperation challenge")       # typo: prover.rs:407
    chal_ap(b"fixed base separation challenge",
            b"fixed base separation challenge")
    chal_ap(b"variable base separation challenge",
            b"variable base separation challenge")
    chal_ap(b"lookup separation challenge",
            b"lookup separation challenge")
    for lbl, p in ((b"t_1", proof.t_1_comm), (b"t_2", proof.t_2_comm),
                   (b"t_3", proof.t_3_comm), (b"t_4", proof.t_4_comm)):
        ap_g1(lbl, p)
    chal_ap(b"z", b"z")

    # evaluations (prover.rs:516-553; table evals NOT appended)
    ap_fr(b"a_eval", ev.a_eval)
    ap_fr(b"b_eval", ev.b_eval)
    ap_fr(b"c_eval", ev.c_eval)
    ap_fr(b"d_eval", ev.d_eval)
    ap_fr(b"left_sig_eval", ev.left_sigma_eval)
    ap_fr(b"right_sig_eval", ev.right_sigma_eval)
    ap_fr(b"out_sig_eval", ev.out_sigma_eval)
    ap_fr(b"perm_eval", ev.permutation_eval)
    ap_fr(b"f_eval", ev.f_eval)
    ap_fr(b"q_lookup_eval", ev.q_lookup_eval)
    ap_fr(b"lookup_perm_eval", ev.z2_next_eval)
    ap_fr(b"h_1_eval", ev.h1_eval)
    ap_fr(b"h_1_next_eval", ev.h1_next_eval)
    ap_fr(b"h_2_eval", ev.h2_eval)
    for label, val in ev.custom_evals:
        ap_fr(label.encode(), val)

    out.append((b"aggregate_witness", chal(b"aggregate_witness")))
    out.append((b"aggregate_witness", chal(b"aggregate_witness")))

    assert out == recorded
