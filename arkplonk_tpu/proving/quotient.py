"""Quotient polynomial t(X) (host golden path).

Mirrors /root/reference/plonk-core/src/proof_system/quotient_poly.rs:
coset-FFT all witness/z/lookup polys onto the 4n domain (+4 wraparound
elements for the omega-shifted accesses), evaluate
gates+permutation+lookup numerators pointwise, divide by the precomputed
v_H coset evals, coset-iFFT back.
"""

from __future__ import annotations

from ..fields import host
from ..fields.host import R
from ..poly import ntt
from ..circuit.lookup_table import lc
from . import widgets


def compute_first_lagrange_poly_scaled(domain: host.Domain, scale: int):
    evals = [0] * domain.size
    evals[0] = scale % R
    return ntt.intt_host(evals, domain)


def _coset_4n_wrap(poly, domain_4n, wrap=4):
    evals = ntt.coset_ntt_host(poly, domain_4n)
    return evals + evals[:wrap]


def compute(domain: host.Domain, pk, z_poly, z2_poly, w_l_poly, w_r_poly,
            w_o_poly, w_4_poly, pi_poly, f_poly, table_poly, h1_poly,
            h2_poly, alpha, beta, gamma, delta, epsilon, zeta,
            range_ch, logic_ch, fixed_ch, var_ch, lookup_ch):
    n = domain.size
    domain_4n = host.Domain(4 * n)

    l1_poly = compute_first_lagrange_poly_scaled(domain, 1)
    l1_eval_4n = ntt.coset_ntt_host(l1_poly, domain_4n)

    z_4n = _coset_4n_wrap(z_poly, domain_4n)
    wl_4n = _coset_4n_wrap(w_l_poly, domain_4n)
    wr_4n = _coset_4n_wrap(w_r_poly, domain_4n)
    wo_4n = ntt.coset_ntt_host(w_o_poly, domain_4n)
    w4_4n = _coset_4n_wrap(w_4_poly, domain_4n)
    z2_4n = _coset_4n_wrap(z2_poly, domain_4n)
    f_4n = ntt.coset_ntt_host(f_poly, domain_4n)
    table_4n = _coset_4n_wrap(table_poly, domain_4n)
    h1_4n = _coset_4n_wrap(h1_poly, domain_4n)
    h2_4n = ntt.coset_ntt_host(h2_poly, domain_4n)

    pi_4n = ntt.coset_ntt_host(pi_poly, domain_4n)

    l1_alpha_sq_4n = ntt.coset_ntt_host(
        compute_first_lagrange_poly_scaled(domain, alpha * alpha % R),
        domain_4n)

    sel = pk.selectors_4n
    sig = pk.sigmas_4n
    lin = pk.linear_evaluations_4n

    quotient = []
    size_4n = domain_4n.size
    for i in range(size_4n):
        a, b, c, d = wl_4n[i], wr_4n[i], wo_4n[i], w4_4n[i]
        a_next, b_next, d_next = wl_4n[i + 4], wr_4n[i + 4], w4_4n[i + 4]

        arith = widgets.arithmetic(
            sel["q_m"][i], sel["q_l"][i], sel["q_r"][i], sel["q_o"][i],
            sel["q_4"][i], sel["q_c"][i], sel["q_arith"][i], a, b, c, d)
        rng = widgets.range_constraint(range_ch, a, b, c, d, d_next) \
            * sel["q_range"][i] % R
        logic = widgets.logic_constraint(
            logic_ch, a, b, c, d, a_next, b_next, d_next, sel["q_c"][i]) \
            * sel["q_logic"][i] % R
        fbsm = widgets.fbsm_constraint(
            fixed_ch, a, b, c, d, a_next, b_next, d_next,
            sel["q_l"][i], sel["q_r"][i], sel["q_c"][i]) \
            * sel["q_fixed_group_add"][i] % R
        ca = widgets.ca_constraint(
            var_ch, a, b, c, d, a_next, b_next, d_next) \
            * sel["q_variable_group_add"][i] % R
        gate = (arith + pi_4n[i] + rng + logic + fbsm + ca) % R

        perm = widgets.permutation_quotient(
            lin[i], sig["left_sigma"][i], sig["right_sigma"][i],
            sig["out_sigma"][i], sig["fourth_sigma"][i],
            a, b, c, d, z_4n[i], z_4n[i + 4],
            alpha, l1_alpha_sq_4n[i], beta, gamma)

        lookup = widgets.lookup_quotient(
            sel["q_lookup"][i], a, b, c, d, f_4n[i], table_4n[i],
            table_4n[i + 4], h1_4n[i], h1_4n[i + 4], h2_4n[i], z2_4n[i],
            z2_4n[i + 4], l1_eval_4n[i], delta, epsilon, zeta, lookup_ch)

        quotient.append((gate + perm + lookup) * pk.v_h_coset_4n_inv[i] % R)

    return ntt.coset_intt_host(quotient, domain_4n)
