"""BLS12-381 curve and field constants.

TPU-native re-implementation of the parameter set the reference consumes from
`ark-bls12-381` (see /root/reference/plonk-core/Cargo.toml:40 dev-deps and the
generic `PairingEngine` bound in plonk-core/src/commitment.rs:22).  Values are
the standard published BLS12-381 parameters.
"""

# --- Scalar field Fr -------------------------------------------------------
# r = 2^32 * 3 * 11 * 19 * 10177 * 125527 * ... (two-adicity 32)
R_MOD = 0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001

# Multiplicative generator of Fr* (smallest: 7)
FR_GENERATOR = 7
FR_TWO_ADICITY = 32
# 2^32-th primitive root of unity: 7^((r-1)/2^32) mod r
FR_TWO_ADIC_ROOT = pow(FR_GENERATOR, (R_MOD - 1) >> FR_TWO_ADICITY, R_MOD)

# --- Base field Fq ---------------------------------------------------------
Q_MOD = 0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAAAB

# --- Tower -----------------------------------------------------------------
# Fq2 = Fq[u]/(u^2 - FQ2_NONRESIDUE); Fq6 = Fq2[v]/(v^3 - XI); Fq12 = Fq6[w]/(w^2 - v)
FQ2_NONRESIDUE = Q_MOD - 1          # u^2 = -1
XI_C0, XI_C1 = 1, 1                 # xi = u + 1
# G2 twist: E'/Fq2 : y^2 = x^3 + b*xi  (M-type)
TWIST = "M"

# --- G1 --------------------------------------------------------------------
G1_X = 0x17F1D3A73197D7942695638C4FA9AC0FC3688C4F9774B905A14E3A3F171BAC586C55E83FF97A1AEFFB3AF00ADB22C6BB
G1_Y = 0x08B3F481E3AAA0F1A09E30ED741D8AE4FCF5E095D5D00AF600DB18CB2C04B3EDD03CC744A2888AE40CAA232946C5E7E1
G1_B = 4
G1_COFACTOR = 0x396C8C005555E1568C00AAAB0000AAAB

# --- G2 (over Fq2 = Fq[u]/(u^2+1)) ----------------------------------------
G2_X_C0 = 0x024AA2B2F08F0A91260805272DC51051C6E47AD4FA403B02B4510B647AE3D1770BAC0326A805BBEFD48056C8C121BDB8
G2_X_C1 = 0x13E02B6052719F607DACD3A088274F65596BD0D09920B61AB5DA61BBDC7F5049334CF11213945D57E5AC7D055D042B7E
G2_Y_C0 = 0x0CE5D527727D6E118CC9CDC6DA2E351AADFD9BAA8CBDD3A76D429A695160D12C923AC9CC3BACA289E193548608B82801
G2_Y_C1 = 0x0606C4A02EA734CC32ACD2B02BC28B99CB3E287E85A763AF267492AB572E99AB3F370D275CEC1DA1AAA9075FF05F79BE
# Twist curve y^2 = x^3 + 4(u+1)
G2_B_C0 = 4
G2_B_C1 = 4

# BLS parameter x (negative): the Miller-loop exponent is |x| = 0xd201000000010000
BLS_X = 0xD201000000010000
BLS_X_IS_NEGATIVE = True

# --- Embedded curve: JubJub (twisted Edwards over Fr) ----------------------
# a*x^2 + y^2 = 1 + d*x^2*y^2  with a = -1, d = -(10240/10241)
# Mirrors the `TEModelParameters` bound used throughout the reference
# (plonk-core/src/circuit.rs:208-291): the embedded curve's base field is Fr.
JUBJUB_A = R_MOD - 1  # -1 mod r
JUBJUB_D = (-10240 * pow(10241, R_MOD - 2, R_MOD)) % R_MOD
# Subgroup order (JubJub scalar field)
JUBJUB_ORDER = 6554484396890773809930967563523245729705921265872317281365359162392183254199
JUBJUB_COFACTOR = 8
# Generator of the prime-order subgroup (the ark-ed-on-bls12-381 GENERATOR);
# affine (x, y) over Fr.  Validated on-curve + order in tests/test_fields.py.
JUBJUB_GEN_X = 8076246640662884909881801758704306714034609987455869804520522091855516602923
JUBJUB_GEN_Y = 13262374693698910701929044844600465831413122818447359594527400194675274060458
