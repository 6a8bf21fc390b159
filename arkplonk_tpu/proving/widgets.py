"""Gate-constraint widgets: the per-gate polynomial identities.

Each widget is a scalar function used in three places (the reference's
`GateConstraint` trait, widget/mod.rs:61-131):
1. quotient term: evaluated pointwise over the 4n coset domain
2. linearisation term: evaluated at challenge z, scaling the selector poly
3. verifier MSM row: same scalar, scaling the selector commitment

Formulas mirrored from widget/{range,logic}.rs and widget/ecc/*.rs.
The device (jnp) port reuses these formulas symbolically in proving/device.py.
"""

from __future__ import annotations

from ..fields.host import R
from ..circuit import jubjub

COEFF_A = jubjub.A
COEFF_D = jubjub.D


def delta(f: int) -> int:
    """f(f-1)(f-2)(f-3)"""
    return f * (f - 1) % R * (f - 2) % R * (f - 3) % R


def delta_xor_and(a: int, b: int, w: int, c: int, q_c: int) -> int:
    """widget/logic.rs:114-133"""
    F = w * (w * (4 * w - 18 * (a + b) + 81)
             + 18 * (a * a % R + b * b % R) - 81 * (a + b) + 83) % R
    E = (3 * (a + b + c) - 2 * F) % R
    B = q_c * ((9 * c) - 3 * (a + b)) % R
    return (B + E) % R


def arithmetic(q_m, q_l, q_r, q_o, q_4, q_c, q_arith, a, b, c, d) -> int:
    """widget/arithmetic.rs:51-63 (without PI)."""
    return (q_m * a % R * b + q_l * a + q_r * b + q_o * c + q_4 * d
            + q_c) % R * q_arith % R


def range_constraint(sep: int, a, b, c, d, d_next) -> int:
    """widget/range.rs:47-74"""
    kappa = sep * sep % R
    kappa_sq = kappa * kappa % R
    kappa_cu = kappa_sq * kappa % R
    b1 = delta(c - 4 * d)
    b2 = delta(b - 4 * c) * kappa % R
    b3 = delta(a - 4 * b) * kappa_sq % R
    b4 = delta(d_next - 4 * a) * kappa_cu % R
    return (b1 + b2 + b3 + b4) * sep % R


def logic_constraint(sep: int, a, b, c, d, a_next, b_next, d_next,
                     q_c) -> int:
    """widget/logic.rs:65-91"""
    kappa = sep * sep % R
    kappa_sq = kappa * kappa % R
    kappa_cu = kappa_sq * kappa % R
    kappa_qu = kappa_cu * kappa % R
    aa = (a_next - 4 * a) % R
    c0 = delta(aa)
    bb = (b_next - 4 * b) % R
    c1 = delta(bb) * kappa % R
    dd = (d_next - 4 * d) % R
    c2 = delta(dd) * kappa_sq % R
    w = c
    c3 = (w - aa * bb) % R * kappa_cu % R
    c4 = delta_xor_and(aa, bb, w, dd, q_c) * kappa_qu % R
    return (c0 + c1 + c2 + c3 + c4) * sep % R


def fbsm_constraint(sep: int, a, b, c, d, a_next, b_next, d_next,
                    q_l, q_r, q_c) -> int:
    """widget/ecc/fixed_base_scalar_mul.rs:88-138"""
    kappa = sep * sep % R
    kappa_sq = kappa * kappa % R
    kappa_cu = kappa_sq * kappa % R
    x_beta, y_beta = q_l, q_r
    acc_x, acc_x_next = a, a_next
    acc_y, acc_y_next = b, b_next
    xy_alpha = c
    accumulated_bit, accumulated_bit_next = d, d_next
    bit = (accumulated_bit_next - accumulated_bit - accumulated_bit) % R
    bit_consistency = bit * (bit - 1) % R * (bit + 1) % R
    y_alpha = (bit * bit % R * (y_beta - 1) + 1) % R
    x_alpha = x_beta * bit % R
    xy_consistency = (bit * q_c - xy_alpha) % R * kappa % R
    x3 = acc_x_next
    lhs = (x3 + x3 * xy_alpha % R * acc_x % R * acc_y % R * COEFF_D) % R
    rhs = (x_alpha * acc_y + y_alpha * acc_x) % R
    x_acc_consistency = (lhs - rhs) * kappa_sq % R
    y3 = acc_y_next
    lhs = (y3 - y3 * xy_alpha % R * acc_x % R * acc_y % R * COEFF_D) % R
    rhs = (y_alpha * acc_y - COEFF_A * x_alpha % R * acc_x) % R
    y_acc_consistency = (lhs - rhs) * kappa_cu % R
    checks = (bit_consistency + x_acc_consistency + y_acc_consistency
              + xy_consistency) % R
    return checks * sep % R


def ca_constraint(sep: int, a, b, c, d, a_next, b_next, d_next) -> int:
    """widget/ecc/curve_addition.rs:62-96"""
    x1, x3, y1, y3 = a, a_next, b, b_next
    x2, y2, x1_y2 = c, d, d_next
    kappa = sep * sep % R
    xy_consistency = (x1 * y2 - x1_y2) % R
    y1_x2 = y1 * x2 % R
    y1_y2 = y1 * y2 % R
    x1_x2 = x1 * x2 % R
    x3_lhs = (x1_y2 + y1_x2) % R
    x3_rhs = (x3 + x3 * COEFF_D % R * x1_y2 % R * y1_x2) % R
    x3_consistency = (x3_lhs - x3_rhs) * kappa % R
    y3_lhs = (y1_y2 - COEFF_A * x1_x2) % R
    y3_rhs = (y3 - y3 * COEFF_D % R * x1_y2 % R * y1_x2) % R
    y3_consistency = (y3_lhs - y3_rhs) * kappa % R * kappa % R
    return (xy_consistency + x3_consistency + y3_consistency) * sep % R


def lookup_quotient(q_lookup_i, w_l_i, w_r_i, w_o_i, w_4_i, f_i, table_i,
                    table_i_next, h1_i, h1_i_next, h2_i, z2_i, z2_i_next,
                    l1_i, delta_ch, epsilon, zeta, lookup_sep) -> int:
    """widget/lookup.rs:97-151"""
    from ..circuit.lookup_table import lc
    lookup_sep_sq = lookup_sep * lookup_sep % R
    lookup_sep_cu = lookup_sep_sq * lookup_sep % R
    one_plus_delta = (delta_ch + 1) % R
    eps_one_plus_delta = epsilon * one_plus_delta % R
    compressed = lc([w_l_i, w_r_i, w_o_i, w_4_i], zeta)
    a = q_lookup_i * (compressed - f_i) % R * lookup_sep % R
    b0 = (epsilon + f_i) % R
    b1 = (eps_one_plus_delta + table_i + delta_ch * table_i_next) % R
    b = z2_i * one_plus_delta % R * b0 % R * b1 % R * lookup_sep_sq % R
    c0 = (eps_one_plus_delta + h1_i + delta_ch * h2_i) % R
    c1 = (eps_one_plus_delta + h2_i + delta_ch * h1_i_next) % R
    c = (-z2_i_next) * c0 % R * c1 % R * lookup_sep_sq % R
    d = (z2_i - 1) * l1_i % R * lookup_sep_cu % R
    return (a + b + c + d) % R


def permutation_quotient(x_i, sigma1_i, sigma2_i, sigma3_i, sigma4_i,
                         w_l_i, w_r_i, w_o_i, w_4_i, z_i, z_i_next,
                         alpha, l1_alpha_sq_i, beta, gamma) -> int:
    """proof_system/permutation.rs:61-153 (identity + copy + L1 terms)."""
    from ..circuit.composer import K1, K2, K3
    a = (w_l_i + beta * x_i + gamma) % R \
        * ((w_r_i + beta * K1 * x_i + gamma) % R) % R \
        * ((w_o_i + beta * K2 * x_i + gamma) % R) % R \
        * ((w_4_i + beta * K3 * x_i + gamma) % R) % R \
        * z_i % R * alpha % R
    b = (w_l_i + beta * sigma1_i + gamma) % R \
        * ((w_r_i + beta * sigma2_i + gamma) % R) % R \
        * ((w_o_i + beta * sigma3_i + gamma) % R) % R \
        * ((w_4_i + beta * sigma4_i + gamma) % R) % R \
        * z_i_next % R * alpha % R
    c = (z_i - 1) * l1_alpha_sq_i % R
    return (a - b + c) % R
