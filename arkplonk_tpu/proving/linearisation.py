"""Linearisation polynomial r(X) + the proof evaluations (host).

Mirrors /root/reference/plonk-core/src/proof_system/linearisation_poly.rs.
The `custom_evals` label ordering (q_arith_eval, q_c_eval, q_l_eval,
q_r_eval, a_next_eval, b_next_eval, d_next_eval) matters for the
transcript byte stream (prover.rs:547-554 appends them in order).
"""

from __future__ import annotations

from dataclasses import dataclass

from ..fields import host
from ..fields.host import R, fr_inv
from ..pcs.kzg import poly_eval, poly_add, poly_scale
from ..circuit.composer import K1, K2, K3
from ..circuit.lookup_table import lc
from . import widgets


@dataclass
class ProofEvaluations:
    # wire evals at z
    a_eval: int = 0
    b_eval: int = 0
    c_eval: int = 0
    d_eval: int = 0
    # permutation evals
    left_sigma_eval: int = 0
    right_sigma_eval: int = 0
    out_sigma_eval: int = 0
    permutation_eval: int = 0  # z(z*omega)
    # lookup evals
    q_lookup_eval: int = 0
    z2_next_eval: int = 0
    h1_eval: int = 0
    h1_next_eval: int = 0
    h2_eval: int = 0
    f_eval: int = 0
    table_eval: int = 0
    table_next_eval: int = 0
    # custom evals (ordered list of (label, value))
    custom_evals: tuple = ()

    def custom(self, label: str) -> int:
        for lbl, v in self.custom_evals:
            if lbl == label:
                return v
        raise KeyError(label)


def compute_first_lagrange_evaluation(n: int, z_h_eval: int,
                                      z_challenge: int) -> int:
    """L_1(z) = (z^n - 1) / (n (z - 1))  (proof.rs:622-633)."""
    denom = n * (z_challenge - 1) % R
    return z_h_eval * fr_inv(denom) % R


def compute(domain: host.Domain, pk, alpha, beta, gamma, delta, epsilon,
            zeta, range_ch, logic_ch, fixed_ch, var_ch, lookup_ch,
            z_challenge, w_l_poly, w_r_poly, w_o_poly, w_4_poly,
            t_1_poly, t_2_poly, t_3_poly, t_4_poly, z_poly, z2_poly,
            f_poly, h1_poly, h2_poly, table_poly):
    n = domain.size
    omega = domain.group_gen
    shifted_z = z_challenge * omega % R

    ev = ProofEvaluations()
    ev.a_eval = poly_eval(w_l_poly, z_challenge)
    ev.b_eval = poly_eval(w_r_poly, z_challenge)
    ev.c_eval = poly_eval(w_o_poly, z_challenge)
    ev.d_eval = poly_eval(w_4_poly, z_challenge)
    ev.left_sigma_eval = poly_eval(pk.sigmas["left_sigma"], z_challenge)
    ev.right_sigma_eval = poly_eval(pk.sigmas["right_sigma"], z_challenge)
    ev.out_sigma_eval = poly_eval(pk.sigmas["out_sigma"], z_challenge)
    ev.permutation_eval = poly_eval(z_poly, shifted_z)

    q_arith_eval = poly_eval(pk.selectors["q_arith"], z_challenge)
    ev.q_lookup_eval = poly_eval(pk.selectors["q_lookup"], z_challenge)
    q_c_eval = poly_eval(pk.selectors["q_c"], z_challenge)
    q_l_eval = poly_eval(pk.selectors["q_l"], z_challenge)
    q_r_eval = poly_eval(pk.selectors["q_r"], z_challenge)
    a_next_eval = poly_eval(w_l_poly, shifted_z)
    b_next_eval = poly_eval(w_r_poly, shifted_z)
    d_next_eval = poly_eval(w_4_poly, shifted_z)

    ev.custom_evals = (
        ("q_arith_eval", q_arith_eval),
        ("q_c_eval", q_c_eval),
        ("q_l_eval", q_l_eval),
        ("q_r_eval", q_r_eval),
        ("a_next_eval", a_next_eval),
        ("b_next_eval", b_next_eval),
        ("d_next_eval", d_next_eval),
    )

    ev.z2_next_eval = poly_eval(z2_poly, shifted_z)
    ev.h1_eval = poly_eval(h1_poly, z_challenge)
    ev.h1_next_eval = poly_eval(h1_poly, shifted_z)
    ev.h2_eval = poly_eval(h2_poly, z_challenge)
    ev.f_eval = poly_eval(f_poly, z_challenge)
    ev.table_eval = poly_eval(table_poly, z_challenge)
    ev.table_next_eval = poly_eval(table_poly, shifted_z)

    vanishing_poly_eval = (pow(z_challenge, n, R) - 1) % R
    z_challenge_to_n = (vanishing_poly_eval + 1) % R
    l1_eval = compute_first_lagrange_evaluation(
        n, vanishing_poly_eval, z_challenge)

    # --- gate constraints -------------------------------------------------
    arith_scalar_parts = {
        "q_m": ev.a_eval * ev.b_eval % R,
        "q_l": ev.a_eval, "q_r": ev.b_eval, "q_o": ev.c_eval,
        "q_4": ev.d_eval, "q_c": 1,
    }
    gate_poly = []
    for name, scalar in arith_scalar_parts.items():
        gate_poly = poly_add(gate_poly,
                             poly_scale(pk.selectors[name], scalar))
    gate_poly = poly_scale(gate_poly, q_arith_eval)

    rng_scalar = widgets.range_constraint(
        range_ch, ev.a_eval, ev.b_eval, ev.c_eval, ev.d_eval, d_next_eval)
    gate_poly = poly_add(gate_poly,
                         poly_scale(pk.selectors["q_range"], rng_scalar))
    logic_scalar = widgets.logic_constraint(
        logic_ch, ev.a_eval, ev.b_eval, ev.c_eval, ev.d_eval,
        a_next_eval, b_next_eval, d_next_eval, q_c_eval)
    gate_poly = poly_add(gate_poly,
                         poly_scale(pk.selectors["q_logic"], logic_scalar))
    fbsm_scalar = widgets.fbsm_constraint(
        fixed_ch, ev.a_eval, ev.b_eval, ev.c_eval, ev.d_eval,
        a_next_eval, b_next_eval, d_next_eval, q_l_eval, q_r_eval, q_c_eval)
    gate_poly = poly_add(
        gate_poly, poly_scale(pk.selectors["q_fixed_group_add"], fbsm_scalar))
    ca_scalar = widgets.ca_constraint(
        var_ch, ev.a_eval, ev.b_eval, ev.c_eval, ev.d_eval,
        a_next_eval, b_next_eval, d_next_eval)
    gate_poly = poly_add(
        gate_poly,
        poly_scale(pk.selectors["q_variable_group_add"], ca_scalar))

    # --- lookup -----------------------------------------------------------
    lookup_sep_sq = lookup_ch * lookup_ch % R
    lookup_sep_cu = lookup_ch * lookup_sep_sq % R
    one_plus_delta = (delta + 1) % R
    eps_opd = epsilon * one_plus_delta % R
    compressed = lc([ev.a_eval, ev.b_eval, ev.c_eval, ev.d_eval], zeta)
    lookup_poly = poly_scale(pk.selectors["q_lookup"],
                             (compressed - ev.f_eval) * lookup_ch % R)
    b_0 = (epsilon + ev.f_eval) % R
    b_1 = (eps_opd + ev.table_eval + delta * ev.table_next_eval) % R
    b_2 = l1_eval * lookup_sep_cu % R
    lookup_poly = poly_add(
        lookup_poly,
        poly_scale(z2_poly, (one_plus_delta * b_0 % R * b_1 % R
                             * lookup_sep_sq + b_2) % R))
    c_0 = (-ev.z2_next_eval) * lookup_sep_sq % R
    c_1 = (eps_opd + ev.h2_eval + delta * ev.h1_next_eval) % R
    lookup_poly = poly_add(lookup_poly, poly_scale(h1_poly, c_0 * c_1 % R))

    # --- permutation ------------------------------------------------------
    beta_z = beta * z_challenge % R
    a_0 = (ev.a_eval + beta_z + gamma) % R
    a_1 = (ev.b_eval + K1 * beta_z + gamma) % R
    a_2 = (ev.c_eval + K2 * beta_z + gamma) % R
    a_3 = (ev.d_eval + K3 * beta_z + gamma) % R
    id_scalar = a_0 * a_1 % R * a_2 % R * a_3 % R * alpha % R
    perm_poly = poly_scale(z_poly, id_scalar)
    s_0 = (ev.a_eval + beta * ev.left_sigma_eval + gamma) % R
    s_1 = (ev.b_eval + beta * ev.right_sigma_eval + gamma) % R
    s_2 = (ev.c_eval + beta * ev.out_sigma_eval + gamma) % R
    copy_scalar = s_0 * s_1 % R * s_2 % R * beta % R \
        * ev.permutation_eval % R * alpha % R
    perm_poly = poly_add(perm_poly,
                         poly_scale(pk.sigmas["fourth_sigma"],
                                    (-copy_scalar) % R))
    perm_poly = poly_add(perm_poly,
                         poly_scale(z_poly, l1_eval * alpha % R * alpha % R))

    # --- negative quotient term ------------------------------------------
    qt = poly_scale(t_4_poly, z_challenge_to_n)
    qt = poly_add(qt, t_3_poly)
    qt = poly_scale(qt, z_challenge_to_n)
    qt = poly_add(qt, t_2_poly)
    qt = poly_scale(qt, z_challenge_to_n)
    qt = poly_add(qt, t_1_poly)
    neg_qt = poly_scale(qt, (-vanishing_poly_eval) % R)

    lin_poly = poly_add(poly_add(poly_add(gate_poly, perm_poly),
                                 lookup_poly), neg_qt)
    return lin_poly, ev
