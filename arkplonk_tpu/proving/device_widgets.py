"""Gate-constraint widgets, device (jnp) edition.

Same formulas as proving/widgets.py (see the file:line refs there), written
over `Fv` limb-array views so they evaluate vectorized across the whole 4n
coset domain on the TPU VPU in one fused pass.
"""

from __future__ import annotations

from ..fields.fview import Fv
from ..fields.host import C

COEFF_A = C.JUBJUB_A
COEFF_D = C.JUBJUB_D


def delta(f: Fv) -> Fv:
    return f * (f - 1) * (f - 2) * (f - 3)


def delta_xor_and(a: Fv, b: Fv, w: Fv, c: Fv, q_c: Fv) -> Fv:
    F = w * (w * (4 * w - 18 * (a + b) + 81)
             + 18 * (a.square() + b.square()) - 81 * (a + b) + 83)
    E = 3 * (a + b + c) - 2 * F
    B = q_c * (9 * c - 3 * (a + b))
    return B + E


def arithmetic(q_m, q_l, q_r, q_o, q_4, q_c, q_arith, a, b, c, d) -> Fv:
    return (q_m * a * b + q_l * a + q_r * b + q_o * c + q_4 * d + q_c) \
        * q_arith


def range_constraint(sep: Fv, a, b, c, d, d_next) -> Fv:
    kappa = sep.square()
    kappa_sq = kappa.square()
    kappa_cu = kappa_sq * kappa
    b1 = delta(c - 4 * d)
    b2 = delta(b - 4 * c) * kappa
    b3 = delta(a - 4 * b) * kappa_sq
    b4 = delta(d_next - 4 * a) * kappa_cu
    return (b1 + b2 + b3 + b4) * sep


def logic_constraint(sep: Fv, a, b, c, d, a_next, b_next, d_next, q_c) -> Fv:
    kappa = sep.square()
    kappa_sq = kappa.square()
    kappa_cu = kappa_sq * kappa
    kappa_qu = kappa_cu * kappa
    aa = a_next - 4 * a
    c0 = delta(aa)
    bb = b_next - 4 * b
    c1 = delta(bb) * kappa
    dd = d_next - 4 * d
    c2 = delta(dd) * kappa_sq
    w = c
    c3 = (w - aa * bb) * kappa_cu
    c4 = delta_xor_and(aa, bb, w, dd, q_c) * kappa_qu
    return (c0 + c1 + c2 + c3 + c4) * sep


def fbsm_constraint(sep: Fv, a, b, c, d, a_next, b_next, d_next,
                    q_l, q_r, q_c) -> Fv:
    kappa = sep.square()
    kappa_sq = kappa.square()
    kappa_cu = kappa_sq * kappa
    x_beta, y_beta = q_l, q_r
    acc_x, acc_x_next = a, a_next
    acc_y, acc_y_next = b, b_next
    xy_alpha = c
    bit = d_next - d - d
    bit_consistency = bit * (bit - 1) * (bit + 1)
    y_alpha = bit.square() * (y_beta - 1) + 1
    x_alpha = x_beta * bit
    xy_consistency = (bit * q_c - xy_alpha) * kappa
    x3 = acc_x_next
    xlhs = x3 + x3 * xy_alpha * acc_x * acc_y * COEFF_D
    xrhs = x_alpha * acc_y + y_alpha * acc_x
    x_acc = (xlhs - xrhs) * kappa_sq
    y3 = acc_y_next
    ylhs = y3 - y3 * xy_alpha * acc_x * acc_y * COEFF_D
    yrhs = y_alpha * acc_y - COEFF_A * x_alpha * acc_x
    y_acc = (ylhs - yrhs) * kappa_cu
    return (bit_consistency + x_acc + y_acc + xy_consistency) * sep


def ca_constraint(sep: Fv, a, b, c, d, a_next, b_next, d_next) -> Fv:
    x1, x3, y1, y3 = a, a_next, b, b_next
    x2, y2, x1_y2 = c, d, d_next
    kappa = sep.square()
    xy_consistency = x1 * y2 - x1_y2
    y1_x2 = y1 * x2
    y1_y2 = y1 * y2
    x1_x2 = x1 * x2
    x3_consistency = (x1_y2 + y1_x2
                      - (x3 + x3 * COEFF_D * x1_y2 * y1_x2)) * kappa
    y3_consistency = (y1_y2 - COEFF_A * x1_x2
                      - (y3 - y3 * COEFF_D * x1_y2 * y1_x2)) \
        * kappa.square()
    return (xy_consistency + x3_consistency + y3_consistency) * sep


def lookup_quotient(q_lookup, a, b, c, d, f, table, table_next, h1, h1_next,
                    h2, z2, z2_next, l1, delta_ch: Fv, epsilon: Fv,
                    zeta: Fv, lookup_sep: Fv) -> Fv:
    sep_sq = lookup_sep.square()
    sep_cu = sep_sq * lookup_sep
    one_plus_delta = delta_ch + 1
    eps_opd = epsilon * one_plus_delta
    compressed = ((d * zeta + c) * zeta + b) * zeta + a
    qa = q_lookup * (compressed - f) * lookup_sep
    qb = z2 * one_plus_delta * (epsilon + f) \
        * (eps_opd + table + delta_ch * table_next) * sep_sq
    qc = -(z2_next * (eps_opd + h1 + delta_ch * h2)
           * (eps_opd + h2 + delta_ch * h1_next) * sep_sq)
    qd = (z2 - 1) * l1 * sep_cu
    return qa + qb + qc + qd


def permutation_quotient(x, s1, s2, s3, s4, a, b, c, d, z, z_next,
                         alpha: Fv, l1_alpha_sq, beta: Fv, gamma: Fv) -> Fv:
    from ..circuit.composer import K1, K2, K3
    ident = (a + beta * x + gamma) \
        * (b + beta * K1 * x + gamma) \
        * (c + beta * K2 * x + gamma) \
        * (d + beta * K3 * x + gamma) * z * alpha
    copy = (a + beta * s1 + gamma) \
        * (b + beta * s2 + gamma) \
        * (c + beta * s3 + gamma) \
        * (d + beta * s4 + gamma) * z_next * alpha
    l1_term = (z - 1) * l1_alpha_sq
    return ident - copy + l1_term
