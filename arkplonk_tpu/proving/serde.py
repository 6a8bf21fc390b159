"""Serialization of proofs and keys (the checkpoint/artifact layer).

SURVEY.md §5.4: "the artifact lifecycle is the checkpoint system" — the
reference CanonicalSerializes Proof (proof.rs:41), ProverKey
(widget/mod.rs:285-292), VerifierKey (:137-148) and VerifierData
(circuit.rs:25-32).  Byte layout follows the ark-serialize derive: fields in
declaration order, G1 compressed (48 B), Fr 32 B LE, Vec with u64-LE length.
"""

from __future__ import annotations

import io
import pickle

from ..transcript import serialize as ser
from .proof import Proof
from .linearisation import ProofEvaluations
from .keys import VerifierKey, ProverKey


# --- Proof ------------------------------------------------------------------

_PROOF_COMMS = ["a_comm", "b_comm", "c_comm", "d_comm", "z_comm", "f_comm",
                "h_1_comm", "h_2_comm", "z_2_comm", "t_1_comm", "t_2_comm",
                "t_3_comm", "t_4_comm"]

_EVAL_FIELDS = [
    # wire_evals
    "a_eval", "b_eval", "c_eval", "d_eval",
    # perm_evals
    "left_sigma_eval", "right_sigma_eval", "out_sigma_eval",
    "permutation_eval",
    # lookup_evals (declaration order, linearisation_poly.rs:76-106)
    "q_lookup_eval", "z2_next_eval", "h1_eval", "h1_next_eval", "h2_eval",
    "f_eval", "table_eval", "table_next_eval",
]


def proof_to_bytes(p: Proof) -> bytes:
    out = io.BytesIO()
    for name in _PROOF_COMMS:
        out.write(ser.g1_to_bytes(getattr(p, name)))
    # aw/saw openings: kzg10::Proof { w, random_v: Option<Fr> = None }
    for opening in (p.aw_opening, p.saw_opening):
        out.write(ser.g1_to_bytes(opening.w))
        out.write(b"\x00")  # Option::None tag
    ev = p.evaluations
    for name in _EVAL_FIELDS:
        out.write(ser.fr_to_bytes(getattr(ev, name)))
    # custom_evals: Vec<(String, F)> with u64 length; strings as u64-len +
    # utf8 bytes
    out.write(len(ev.custom_evals).to_bytes(8, "little"))
    for label, val in ev.custom_evals:
        lb = label.encode()
        out.write(len(lb).to_bytes(8, "little"))
        out.write(lb)
        out.write(ser.fr_to_bytes(val))
    return out.getvalue()


def proof_from_bytes(data: bytes) -> Proof:
    buf = io.BytesIO(data)

    def g1():
        return ser.g1_from_bytes(buf.read(48))

    def fr():
        return ser.fr_from_bytes(buf.read(32))

    p = Proof()
    for name in _PROOF_COMMS:
        setattr(p, name, g1())
    from ..pcs.kzg import OpeningProof
    for name in ("aw_opening", "saw_opening"):
        w = g1()
        tag = buf.read(1)
        assert tag == b"\x00", "hiding openings not supported"
        setattr(p, name, OpeningProof(w))
    ev = ProofEvaluations()
    for name in _EVAL_FIELDS:
        setattr(ev, name, fr())
    count = int.from_bytes(buf.read(8), "little")
    customs = []
    for _ in range(count):
        ln = int.from_bytes(buf.read(8), "little")
        label = buf.read(ln).decode()
        customs.append((label, fr()))
    ev.custom_evals = tuple(customs)
    p.evaluations = ev
    return p


# --- VerifierKey ------------------------------------------------------------

_VK_COMM_ORDER = [
    # widget/mod.rs VerifierKey declaration order: arithmetic{q_m,q_l,q_r,
    # q_o,q_4,q_c,q_arith}, range, logic, lookup{q_lookup,t1..t4},
    # fixed_group, variable_group, permutation{4 sigmas}
    "q_m", "q_l", "q_r", "q_o", "q_4", "q_c", "q_arith",
    "q_range", "q_logic",
    "q_lookup", "table_1", "table_2", "table_3", "table_4",
    "q_fixed_group_add", "q_variable_group_add",
    "left_sigma", "right_sigma", "out_sigma", "fourth_sigma",
]


def verifier_key_to_bytes(vk: VerifierKey) -> bytes:
    out = io.BytesIO()
    out.write(vk.n.to_bytes(8, "little"))
    for name in _VK_COMM_ORDER:
        out.write(ser.g1_to_bytes(vk.commitments[name]))
    return out.getvalue()


def verifier_key_from_bytes(data: bytes) -> VerifierKey:
    buf = io.BytesIO(data)
    n = int.from_bytes(buf.read(8), "little")
    comms = {}
    for name in _VK_COMM_ORDER:
        comms[name] = ser.g1_from_bytes(buf.read(48))
    return VerifierKey(n=n, commitments=comms)


# --- ProverKey / VerifierData ----------------------------------------------

def prover_key_save(pk: ProverKey, path: str):
    """ProverKey persistence (pickle of exact integer data; the device form
    is rebuilt on load — mirrors compile-once/prove-many, prover.rs:157)."""
    with open(path, "wb") as f:
        pickle.dump(pk, f)


def prover_key_load(path: str) -> ProverKey:
    with open(path, "rb") as f:
        return pickle.load(f)


def verifier_data_to_bytes(vk: VerifierKey, pi: dict) -> bytes:
    """VerifierData { key, pi } (circuit.rs:25-63)."""
    from . import pi as pi_mod
    return verifier_key_to_bytes(vk) + pi_mod.to_bytes(pi)


def verifier_data_from_bytes(data: bytes):
    buf = io.BytesIO(data)
    n = int.from_bytes(buf.read(8), "little")
    buf.seek(0)
    vk_len = 8 + 48 * len(_VK_COMM_ORDER)
    vk = verifier_key_from_bytes(data[:vk_len])
    rest = data[vk_len:]
    count = int.from_bytes(rest[:8], "little")
    pi = {}
    off = 8
    for _ in range(count):
        pos = int.from_bytes(rest[off:off + 8], "little")
        val = ser.fr_from_bytes(rest[off + 8:off + 40])
        pi[pos] = val
        off += 40
    return vk, pi
