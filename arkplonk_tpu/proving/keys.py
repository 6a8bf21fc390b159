"""ProverKey / VerifierKey structures (widget/mod.rs:137-397).

ProverKey holds, per selector/sigma: (coefficient list, 4n coset evals).
VerifierKey holds commitments; `seed_transcript` appends the circuit
description in the exact reference order (widget/mod.rs:252-278).
"""

from __future__ import annotations

from dataclasses import dataclass, field


SELECTOR_ORDER = ["q_m", "q_l", "q_r", "q_o", "q_4", "q_c", "q_arith",
                  "q_range", "q_logic", "q_lookup", "q_fixed_group_add",
                  "q_variable_group_add"]
SIGMA_ORDER = ["left_sigma", "right_sigma", "out_sigma", "fourth_sigma"]


@dataclass
class ProverKey:
    n: int
    # name -> coefficient list
    selectors: dict
    # name -> 4n coset evals
    selectors_4n: dict
    sigmas: dict
    sigmas_4n: dict
    linear_evaluations_4n: list
    v_h_coset_4n: list
    v_h_coset_4n_inv: list
    # lookup: 4 padded table column multisets (evaluation form)
    table_columns: list
    # sigma lagrange (n) forms, kept for the device z(X) path
    sigma_lagranges: list = field(default_factory=list)


@dataclass
class VerifierKey:
    n: int
    commitments: dict  # q_* and *_sigma and table_1..4 -> G1 point

    def padded_circuit_size(self) -> int:
        t = self.n
        return 1 if t == 0 else 1 << (t - 1).bit_length()

    def seed_transcript(self, transcript):
        """widget/mod.rs:252-278 — note q_lookup and table columns are NOT
        seeded, and the q/sigma order differs from commit order."""
        c = self.commitments
        transcript.append_g1(b"q_m", c["q_m"])
        transcript.append_g1(b"q_l", c["q_l"])
        transcript.append_g1(b"q_r", c["q_r"])
        transcript.append_g1(b"q_o", c["q_o"])
        transcript.append_g1(b"q_c", c["q_c"])
        transcript.append_g1(b"q_4", c["q_4"])
        transcript.append_g1(b"q_arith", c["q_arith"])
        transcript.append_g1(b"q_range", c["q_range"])
        transcript.append_g1(b"q_logic", c["q_logic"])
        transcript.append_g1(b"q_variable_group_add",
                             c["q_variable_group_add"])
        transcript.append_g1(b"q_fixed_group_add", c["q_fixed_group_add"])
        transcript.append_g1(b"left_sigma", c["left_sigma"])
        transcript.append_g1(b"right_sigma", c["right_sigma"])
        transcript.append_g1(b"out_sigma", c["out_sigma"])
        transcript.append_g1(b"fourth_sigma", c["fourth_sigma"])
        transcript.circuit_domain_sep(self.n)
