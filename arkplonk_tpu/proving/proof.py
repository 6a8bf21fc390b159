"""Proof object + verification (host).

Mirrors /root/reference/plonk-core/src/proof_system/proof.rs:
13 commitments + 2 batch openings + evaluations; `verify` re-derives all
challenges, computes r0 (:428-486) and the ~19-point linearisation
commitment MSM (:489-603), then runs the two KZG checks.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..fields import host
from ..fields.host import R
from ..curve import host as cv
from ..pcs import kzg
from ..circuit.composer import K1, K2, K3
from ..circuit.lookup_table import lc
from . import widgets
from . import pi as pi_mod
from .linearisation import ProofEvaluations, compute_first_lagrange_evaluation


@dataclass
class Proof:
    a_comm: tuple = None
    b_comm: tuple = None
    c_comm: tuple = None
    d_comm: tuple = None
    z_comm: tuple = None
    f_comm: tuple = None
    h_1_comm: tuple = None
    h_2_comm: tuple = None
    z_2_comm: tuple = None
    t_1_comm: tuple = None
    t_2_comm: tuple = None
    t_3_comm: tuple = None
    t_4_comm: tuple = None
    aw_opening: object = None
    saw_opening: object = None
    evaluations: ProofEvaluations = field(default_factory=ProofEvaluations)

    # ------------------------------------------------------------------

    def verify(self, plonk_vk, transcript, srs, public_inputs: dict,
               pcs=None) -> bool:
        pcs = pcs if pcs is not None else kzg
        domain = host.Domain(plonk_vk.padded_circuit_size())
        n = domain.size
        ev = self.evaluations

        transcript.append_pi(b"pi", pi_mod.to_bytes(public_inputs))

        transcript.append_g1(b"w_l", self.a_comm)
        transcript.append_g1(b"w_r", self.b_comm)
        transcript.append_g1(b"w_o", self.c_comm)
        transcript.append_g1(b"w_4", self.d_comm)
        zeta = transcript.challenge_scalar(b"zeta")
        transcript.append_fr(b"zeta", zeta)
        transcript.append_g1(b"f", self.f_comm)
        transcript.append_g1(b"h1", self.h_1_comm)
        transcript.append_g1(b"h2", self.h_2_comm)
        beta = transcript.challenge_scalar(b"beta")
        transcript.append_fr(b"beta", beta)
        gamma = transcript.challenge_scalar(b"gamma")
        transcript.append_fr(b"gamma", gamma)
        delta = transcript.challenge_scalar(b"delta")
        transcript.append_fr(b"delta", delta)
        epsilon = transcript.challenge_scalar(b"epsilon")
        transcript.append_fr(b"epsilon", epsilon)
        transcript.append_g1(b"z", self.z_comm)
        alpha = transcript.challenge_scalar(b"alpha")
        transcript.append_fr(b"alpha", alpha)
        range_ch = transcript.challenge_scalar(b"range separation challenge")
        transcript.append_fr(b"range seperation challenge", range_ch)
        logic_ch = transcript.challenge_scalar(b"logic separation challenge")
        transcript.append_fr(b"logic seperation challenge", logic_ch)
        fixed_ch = transcript.challenge_scalar(
            b"fixed base separation challenge")
        transcript.append_fr(b"fixed base separation challenge", fixed_ch)
        var_ch = transcript.challenge_scalar(
            b"variable base separation challenge")
        transcript.append_fr(b"variable base separation challenge", var_ch)
        lookup_ch = transcript.challenge_scalar(b"lookup separation challenge")
        transcript.append_fr(b"lookup separation challenge", lookup_ch)
        transcript.append_g1(b"t_1", self.t_1_comm)
        transcript.append_g1(b"t_2", self.t_2_comm)
        transcript.append_g1(b"t_3", self.t_3_comm)
        transcript.append_g1(b"t_4", self.t_4_comm)
        z_challenge = transcript.challenge_scalar(b"z")
        transcript.append_fr(b"z", z_challenge)

        z_h_eval = (pow(z_challenge, n, R) - 1) % R
        l1_eval = compute_first_lagrange_evaluation(
            n, z_h_eval, z_challenge)

        r0 = self._compute_r0(domain, public_inputs,
                              alpha, beta, gamma, delta, epsilon,
                              z_challenge, l1_eval, lookup_ch)

        transcript.append_fr(b"a_eval", ev.a_eval)
        transcript.append_fr(b"b_eval", ev.b_eval)
        transcript.append_fr(b"c_eval", ev.c_eval)
        transcript.append_fr(b"d_eval", ev.d_eval)
        transcript.append_fr(b"left_sig_eval", ev.left_sigma_eval)
        transcript.append_fr(b"right_sig_eval", ev.right_sigma_eval)
        transcript.append_fr(b"out_sig_eval", ev.out_sigma_eval)
        transcript.append_fr(b"perm_eval", ev.permutation_eval)
        transcript.append_fr(b"f_eval", ev.f_eval)
        transcript.append_fr(b"q_lookup_eval", ev.q_lookup_eval)
        transcript.append_fr(b"lookup_perm_eval", ev.z2_next_eval)
        transcript.append_fr(b"h_1_eval", ev.h1_eval)
        transcript.append_fr(b"h_1_next_eval", ev.h1_next_eval)
        transcript.append_fr(b"h_2_eval", ev.h2_eval)
        for label, val in ev.custom_evals:
            transcript.append_fr(label.encode(), val)

        lin_comm = self._compute_linearisation_commitment(
            domain, alpha, beta, gamma, delta, epsilon, zeta,
            range_ch, logic_ch, fixed_ch, var_ch, lookup_ch,
            z_challenge, l1_eval, plonk_vk)

        zeta_sq = zeta * zeta % R
        table_parts = [
            (plonk_vk.commitments[f"table_{i+1}"], s)
            for i, s in enumerate([1, zeta, zeta_sq, zeta_sq * zeta % R])]
        table_comm = _msm_points(table_parts)

        aw_challenge = transcript.challenge_scalar(b"aggregate_witness")
        aw_commits = [
            lin_comm,
            plonk_vk.commitments["left_sigma"],
            plonk_vk.commitments["right_sigma"],
            plonk_vk.commitments["out_sigma"],
            self.f_comm, self.h_2_comm, table_comm,
            self.a_comm, self.b_comm, self.c_comm, self.d_comm]
        aw_evals = [
            (-r0) % R, ev.left_sigma_eval, ev.right_sigma_eval,
            ev.out_sigma_eval, ev.f_eval, ev.h2_eval, ev.table_eval,
            ev.a_eval, ev.b_eval, ev.c_eval, ev.d_eval]

        saw_challenge = transcript.challenge_scalar(b"aggregate_witness")
        saw_commits = [self.z_comm, self.a_comm, self.b_comm, self.d_comm,
                       self.h_1_comm, self.z_2_comm, table_comm]
        saw_evals = [ev.permutation_eval, ev.custom("a_next_eval"),
                     ev.custom("b_next_eval"), ev.custom("d_next_eval"),
                     ev.h1_next_eval, ev.z2_next_eval, ev.table_next_eval]

        saw_z = z_challenge * domain.group_gen % R
        if hasattr(pcs, "batch_check"):
            # both openings in ONE 2-pairing product (vs the reference's
            # two PC::check calls, proof.rs:398-425)
            return pcs.batch_check(srs, [
                (aw_commits, z_challenge, aw_evals, self.aw_opening,
                 aw_challenge),
                (saw_commits, saw_z, saw_evals, self.saw_opening,
                 saw_challenge)])
        ok1 = pcs.check(srs, aw_commits, z_challenge, aw_evals,
                        self.aw_opening, aw_challenge)
        if not ok1:
            return False
        return pcs.check(srs, saw_commits, saw_z, saw_evals,
                         self.saw_opening, saw_challenge)

    # ------------------------------------------------------------------

    def _compute_r0(self, domain, pub_inputs, alpha, beta, gamma, delta,
                    epsilon, z_challenge, l1_eval, lookup_ch) -> int:
        ev = self.evaluations
        pi_eval = pi_mod.barycentric_eval(pub_inputs, z_challenge, domain)
        alpha_sq = alpha * alpha % R
        lookup_sq = lookup_ch * lookup_ch % R
        lookup_cu = lookup_sq * lookup_ch % R
        b_0 = (ev.a_eval + beta * ev.left_sigma_eval + gamma) % R
        b_1 = (ev.b_eval + beta * ev.right_sigma_eval + gamma) % R
        b_2 = (ev.c_eval + beta * ev.out_sigma_eval + gamma) % R
        b_3 = (ev.d_eval + gamma) * ev.permutation_eval % R * alpha % R
        b = b_0 * b_1 % R * b_2 % R * b_3 % R
        c = l1_eval * alpha_sq % R
        eps_opd = epsilon * (1 + delta) % R
        d_0 = lookup_sq * ev.z2_next_eval % R
        d_1 = (eps_opd + delta * ev.h2_eval) % R
        d_2 = (eps_opd + ev.h2_eval + delta * ev.h1_next_eval) % R
        d = d_0 * d_1 % R * d_2 % R
        e = lookup_cu * l1_eval % R
        return (pi_eval - b - c - d - e) % R

    def _compute_linearisation_commitment(self, domain, alpha, beta, gamma,
                                          delta, epsilon, zeta, range_ch,
                                          logic_ch, fixed_ch, var_ch,
                                          lookup_ch, z_challenge, l1_eval,
                                          plonk_vk):
        ev = self.evaluations
        c = plonk_vk.commitments
        parts = []

        # arithmetic (widget/arithmetic.rs:128-157)
        q_arith_eval = ev.custom("q_arith_eval")
        parts.append((c["q_m"], ev.a_eval * ev.b_eval % R * q_arith_eval % R))
        parts.append((c["q_l"], ev.a_eval * q_arith_eval % R))
        parts.append((c["q_r"], ev.b_eval * q_arith_eval % R))
        parts.append((c["q_o"], ev.c_eval * q_arith_eval % R))
        parts.append((c["q_4"], ev.d_eval * q_arith_eval % R))
        parts.append((c["q_c"], q_arith_eval))

        # custom gate widgets
        parts.append((c["q_range"], widgets.range_constraint(
            range_ch, ev.a_eval, ev.b_eval, ev.c_eval, ev.d_eval,
            ev.custom("d_next_eval"))))
        parts.append((c["q_logic"], widgets.logic_constraint(
            logic_ch, ev.a_eval, ev.b_eval, ev.c_eval, ev.d_eval,
            ev.custom("a_next_eval"), ev.custom("b_next_eval"),
            ev.custom("d_next_eval"), ev.custom("q_c_eval"))))
        parts.append((c["q_fixed_group_add"], widgets.fbsm_constraint(
            fixed_ch, ev.a_eval, ev.b_eval, ev.c_eval, ev.d_eval,
            ev.custom("a_next_eval"), ev.custom("b_next_eval"),
            ev.custom("d_next_eval"), ev.custom("q_l_eval"),
            ev.custom("q_r_eval"), ev.custom("q_c_eval"))))
        parts.append((c["q_variable_group_add"], widgets.ca_constraint(
            var_ch, ev.a_eval, ev.b_eval, ev.c_eval, ev.d_eval,
            ev.custom("a_next_eval"), ev.custom("b_next_eval"),
            ev.custom("d_next_eval"))))

        # lookup (widget/lookup.rs:238-294)
        one_plus_delta = (1 + delta) % R
        eps_opd = epsilon * one_plus_delta % R
        lookup_sq = lookup_ch * lookup_ch % R
        lookup_cu = lookup_sq * lookup_ch % R
        compressed = lc([ev.a_eval, ev.b_eval, ev.c_eval, ev.d_eval], zeta)
        parts.append((c["q_lookup"],
                      (compressed - ev.f_eval) * lookup_ch % R))
        b_0 = (epsilon + ev.f_eval) % R
        b_1 = (eps_opd + ev.table_eval + delta * ev.table_next_eval) % R
        b_2 = l1_eval * lookup_cu % R
        parts.append((self.z_2_comm,
                      (one_plus_delta * b_0 % R * b_1 % R * lookup_sq
                       + b_2) % R))
        c_0 = (-ev.z2_next_eval) * lookup_sq % R
        c_1 = (eps_opd + ev.h2_eval + delta * ev.h1_next_eval) % R
        parts.append((self.h_1_comm, c_0 * c_1 % R))

        # permutation (proof_system/permutation.rs:327-385)
        alpha_sq = alpha * alpha % R
        beta_z = beta * z_challenge % R
        x = (ev.a_eval + beta_z + gamma) % R \
            * ((ev.b_eval + K1 * beta_z + gamma) % R) % R \
            * ((ev.c_eval + K2 * beta_z + gamma) % R) % R \
            * ((ev.d_eval + K3 * beta_z + gamma) % R * alpha % R) % R
        parts.append((self.z_comm, (x + l1_eval * alpha_sq) % R))
        y = (ev.a_eval + beta * ev.left_sigma_eval + gamma) % R \
            * ((ev.b_eval + beta * ev.right_sigma_eval + gamma) % R) % R \
            * ((ev.c_eval + beta * ev.out_sigma_eval + gamma) % R) % R \
            * (beta * ev.permutation_eval % R * alpha % R) % R
        parts.append((c["fourth_sigma"], (-y) % R))

        # quotient pieces
        z_h_eval = (pow(z_challenge, domain.size, R) - 1) % R
        z_n = (z_h_eval + 1) % R
        t1 = (-z_h_eval) % R
        t2 = t1 * z_n % R
        t3 = t2 * z_n % R
        t4 = t3 * z_n % R
        parts.append((self.t_1_comm, t1))
        parts.append((self.t_2_comm, t2))
        parts.append((self.t_3_comm, t3))
        parts.append((self.t_4_comm, t4))

        return _msm_points(parts)


def _msm_points(parts):
    from ..curve import native_pairing
    if native_pairing.available():
        return native_pairing.g1_msm([p for p, _ in parts],
                                     [s for _, s in parts])
    acc = None
    for point, scalar in parts:
        if point is None or scalar % R == 0:
            continue
        acc = cv.G1.add(acc, cv.G1.mul(point, scalar % R))
    return acc
