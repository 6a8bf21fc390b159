"""BLS12-377 curve and field constants (the reference's second curve).

The reference is generic over the pairing curve and tests {BLS12-381,
BLS12-377} x {KZG10, IPA} (/root/reference/plonk-core/src/test.rs:96-138,
circuit.rs:392-508 with `ark-bls12-377` + `ark-ed-on-bls12-377` dev-deps,
plonk-core/Cargo.toml:41-44).  Select with ARKPLONK_CURVE=bls12_377.

Provenance/validation: r and q are DERIVED here from the BLS parameter
x = 0x8508c00000000001 (r = x^4 - x^2 + 1, q = ((x-1)^2/3)*r + x, the
BLS12 family equations), so a memory slip in the moduli is impossible.
The G1/G2 generators are the published ark-bls12-377 values; both are
checked on-curve and in the r-torsion by tests/test_bls377.py, which a
wrong coordinate cannot pass.
"""

# BLS parameter x (positive for BLS12-377; the Miller loop runs on |x|)
BLS_X = 0x8508C00000000001
BLS_X_IS_NEGATIVE = False

# --- Scalar field Fr -------------------------------------------------------
R_MOD = BLS_X ** 4 - BLS_X ** 2 + 1
assert R_MOD == 0x12AB655E9A2CA55660B44D1E5C37B00159AA76FED00000010A11800000000001

FR_GENERATOR = 22
FR_TWO_ADICITY = 47
FR_TWO_ADIC_ROOT = pow(FR_GENERATOR, (R_MOD - 1) >> FR_TWO_ADICITY, R_MOD)

# --- Base field Fq ---------------------------------------------------------
Q_MOD = ((BLS_X - 1) ** 2 * R_MOD) // 3 + BLS_X
assert Q_MOD.bit_length() == 377

# --- Tower -----------------------------------------------------------------
# Fq2 = Fq[u]/(u^2 - FQ2_NONRESIDUE); Fq6 = Fq2[v]/(v^3 - XI); Fq12 = Fq6[w]/(w^2 - v)
FQ2_NONRESIDUE = Q_MOD - 5          # u^2 = -5
XI_C0, XI_C1 = 0, 1                 # xi = u
# G2 twist: E'/Fq2 : y^2 = x^3 + b/xi  (D-type; b=1, 1/u = -u/5)
TWIST = "D"

# --- G1:  y^2 = x^3 + 1 ----------------------------------------------------
G1_X = 0x008848DEFE740A67C8FC6225BF87FF5485951E2CAA9D41BB188282C8BD37CB5CD5481512FFCD394EEAB9B16EB21BE9EF
G1_Y = 0x01914A69C5102EFF1F674F5D30AFEEC4BD7FB348CA3E52D96D182AD44FB82305C2FE3D3634A9591AFD82DE55559C8EA6
G1_B = 1
G1_COFACTOR = 0x170B5D44300000000000000000000000

# --- G2 --------------------------------------------------------------------
G2_X_C0 = 0x018480BE71C785FEC89630A2A3841D01C565F071203E50317EA501F557DB6B9B71889F52BB53540274E3E48F7C005196
G2_X_C1 = 0x00EA6040E700403170DC5A51B1B140D5532777EE6651CECBE7223ECE0799C9DE5CF89984BFF76FE6B26BFEFA6EA16AFE
G2_Y_C0 = 0x00690D665D446F7BD960736BCBB2EFB4DE03ED7274B49A58E458C282F832D204F2CF88886D8C7C2EF094094409FD4DDF
G2_Y_C1 = 0x00F8169FD28355189E549DA3151A70AA61EF11AC3D591BF12463B01ACEE304C24279B83F5E52270BD9A1CDD185EB8F93
G2_B_C0 = 0
G2_B_C1 = (-pow(5, -1, Q_MOD)) % Q_MOD   # b/xi = 1/u = -u/5

# --- Embedded curve: ed-on-bls12-377 (twisted Edwards over Fr) -------------
# a*x^2 + y^2 = 1 + d*x^2*y^2 with a = -1, d = 3021 (Zexe paper, App. A;
# `ark-ed-on-bls12-377` in the reference's dev-deps).
JUBJUB_A = R_MOD - 1
JUBJUB_D = 3021
JUBJUB_ORDER = \
    2111115437357092606062206234695386632838870926408408195193685246394721360383
JUBJUB_COFACTOR = 4
# Generator of the prime-order subgroup.  Derived deterministically (the
# ark GENERATOR bytes are not reproducible from first principles without
# the crate): smallest y >= 2 giving an on-curve point, negated-x root
# chosen as min(x, r-x), multiplied by the cofactor.  Validated on-curve
# with exact order JUBJUB_ORDER in tests/test_bls377.py.  NOTE: this is a
# valid generator but not byte-identical to ark-ed-on-bls12-377's choice;
# proofs remain verifiable because the generator enters only through the
# fixed-base gadget's precomputed multiples, which prover and verifier
# derive from this same constant.
def _derive_te_generator():
    r = R_MOD
    a, d = JUBJUB_A, JUBJUB_D

    def sqrt_mod(val, m):
        val %= m
        if val == 0:
            return 0
        if pow(val, (m - 1) // 2, m) != 1:
            return None
        q, s = m - 1, 0
        while q % 2 == 0:
            q //= 2
            s += 1
        z = 2
        while pow(z, (m - 1) // 2, m) != m - 1:
            z += 1
        mm, c, t, res = s, pow(z, q, m), pow(val, q, m), pow(val, (q + 1) // 2, m)
        while t != 1:
            i, tt = 0, t
            while tt != 1:
                tt = tt * tt % m
                i += 1
            b = pow(c, 1 << (mm - i - 1), m)
            mm, c, t, res = i, b * b % m, t * b * b % m, res * b % m
        return res

    def te_add(p, q):
        x1, y1 = p
        x2, y2 = q
        dxy = d * x1 * x2 % r * y1 * y2 % r
        x3 = (x1 * y2 + y1 * x2) * pow(1 + dxy, -1, r) % r
        y3 = (y1 * y2 - a * x1 * x2) * pow(1 - dxy, -1, r) % r
        return (x3, y3)

    def te_mul(p, k):
        acc = (0, 1)
        while k:
            if k & 1:
                acc = te_add(acc, p)
            p = te_add(p, p)
            k >>= 1
        return acc

    for y in range(2, 1000):
        num = (y * y - 1) % r
        den = (d * y * y - a) % r
        x = sqrt_mod(num * pow(den, -1, r) % r, r)
        if x is None:
            continue
        p = (min(x, r - x), y)
        g = te_mul(p, JUBJUB_COFACTOR)
        if g != (0, 1) and te_mul(g, JUBJUB_ORDER) == (0, 1):
            return g
    raise AssertionError("no TE generator found")


JUBJUB_GEN_X, JUBJUB_GEN_Y = _derive_te_generator()
