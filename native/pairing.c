/* BLS12-381 pairing core (C, host-side).
 *
 * Native replacement for the pure-Python Fq12 tower / Miller loop in
 * arkplonk_tpu/curve/host.py (which itself mirrors the role ark-ec's
 * PairingEngine plays for the reference verifier, plonk-core
 * commitment.rs:29-49, proof.rs:398-425).  The Python path takes ~0.7 s
 * per pairing; this core runs the same algorithms in a few ms.
 *
 * Same tower as curve/host.py (Fq2 u^2=-1, Fq6 v^3=xi=u+1, Fq12 w^2=v)
 * and the same pairing VALUE (tests check exact agreement against the
 * golden path), but the hot path is restructured:
 *   - Miller loop in affine TWIST coordinates: untwisted G2 points have
 *     X in the v^2 line and Y in the v*w line of Fq12, so the curve
 *     arithmetic stays in Fq2 (one fq2 inversion per step instead of
 *     the golden path's Fq12 inversions); the line through
 *     (x1 v^2, y1 vw) evaluated at P=(px,py) is the sparse element
 *        l = py + (s*x1 - y1) vw - (px*s/xi) v^2 w,   s = twist slope,
 *     which equals MINUS the golden path's line: the (-1)^lines factor
 *     is killed by the (even) final exponent, so values still agree.
 *   - final exponentiation: easy part with a real Frobenius map
 *     (phi(v)=v*xi^((p-1)/3), phi(w)=w*xi^((p-1)/6)); hard part as the
 *     EXACT base-p decomposition e=(p^4-p^2+1)/r = e0+e1 p+e2 p^2+e3 p^3
 *     via a shared-squaring 4-way Straus multi-exponentiation of
 *     y^e0 * phi(y)^e1 * phi^2(y)^e2 * phi^3(y)^e3 (~380 squarings
 *     instead of ~2000 full-width ones).
 *
 * Field arithmetic: 6x64-bit Montgomery (CIOS with __int128), inversion
 * by binary extended gcd.
 */

#include <stdint.h>
#include <string.h>

typedef unsigned __int128 u128;
typedef uint64_t u64;

#define NL 6

static const u64 MOD[NL] = {
    0xb9feffffffffaaabULL, 0x1eabfffeb153ffffULL, 0x6730d2a0f6b0f624ULL,
    0x64774b84f38512bfULL, 0x4b1ba7b6434bacd7ULL, 0x1a0111ea397fe69aULL};
static const u64 INV64 = 0x89f3fffcfffcfffdULL;
static const u64 R2[NL] = {
    0xf4df1f341c341746ULL, 0x0a76e6a609d104f1ULL, 0x8de5476c4c95b6d5ULL,
    0x67eb88a9939d83c0ULL, 0x9a793e85b519952dULL, 0x11988fe592cae3aaULL};
static const u64 ONE_M[NL] = {
    0x760900000002fffdULL, 0xebf4000bc40c0002ULL, 0x5f48985753c758baULL,
    0x77ce585370525745ULL, 0x5c071a97a256ec6dULL, 0x15f65ec3fa80e493ULL};
static const u64 BLS_X = 0xD201000000010000ULL; /* |x|; x is negative */

typedef struct { u64 c[NL]; } fq;
typedef struct { fq c0, c1; } fq2;
typedef struct { fq2 c0, c1, c2; } fq6;
typedef struct { fq6 c0, c1; } fq12;

/* ---------------- fq ---------------- */

static void fq_zero(fq *r) { memset(r, 0, sizeof *r); }
static void fq_one(fq *r) { memcpy(r->c, ONE_M, sizeof ONE_M); }
static int fq_is_zero(const fq *a) {
    u64 t = 0;
    for (int i = 0; i < NL; i++) t |= a->c[i];
    return t == 0;
}
static int fq_eq(const fq *a, const fq *b) {
    return memcmp(a->c, b->c, sizeof a->c) == 0;
}

static int geq_mod(const u64 *a) {
    for (int i = NL - 1; i >= 0; i--) {
        if (a[i] > MOD[i]) return 1;
        if (a[i] < MOD[i]) return 0;
    }
    return 1;
}

static void cond_sub(u64 *a) {
    if (geq_mod(a)) {
        u128 bor = 0;
        for (int i = 0; i < NL; i++) {
            u128 t = (u128)a[i] - MOD[i] - bor;
            a[i] = (u64)t;
            bor = (t >> 64) & 1;
        }
    }
}

static void fq_add(fq *r, const fq *a, const fq *b) {
    u128 c = 0;
    for (int i = 0; i < NL; i++) {
        u128 t = (u128)a->c[i] + b->c[i] + c;
        r->c[i] = (u64)t;
        c = t >> 64;
    }
    cond_sub(r->c);
}

static void fq_sub(fq *r, const fq *a, const fq *b) {
    u128 bor = 0;
    u64 t6[NL];
    for (int i = 0; i < NL; i++) {
        u128 t = (u128)a->c[i] - b->c[i] - bor;
        t6[i] = (u64)t;
        bor = (t >> 64) & 1;
    }
    if (bor) {
        u128 c = 0;
        for (int i = 0; i < NL; i++) {
            u128 t = (u128)t6[i] + MOD[i] + c;
            t6[i] = (u64)t;
            c = t >> 64;
        }
    }
    memcpy(r->c, t6, sizeof t6);
}

static void fq_neg(fq *r, const fq *a) {
    if (fq_is_zero(a)) { *r = *a; return; }
    u128 bor = 0;
    for (int i = 0; i < NL; i++) {
        u128 t = (u128)MOD[i] - a->c[i] - bor;
        r->c[i] = (u64)t;
        bor = (t >> 64) & 1;
    }
}

/* CIOS Montgomery multiplication */
static void fq_mul(fq *r, const fq *a, const fq *b) {
    u64 t[NL + 2];
    memset(t, 0, sizeof t);
    for (int i = 0; i < NL; i++) {
        u128 c = 0;
        for (int j = 0; j < NL; j++) {
            u128 s = (u128)t[j] + (u128)a->c[i] * b->c[j] + c;
            t[j] = (u64)s;
            c = s >> 64;
        }
        u128 s = (u128)t[NL] + c;
        t[NL] = (u64)s;
        t[NL + 1] = (u64)(s >> 64);
        u64 m = t[0] * INV64;
        c = ((u128)t[0] + (u128)m * MOD[0]) >> 64;
        for (int j = 1; j < NL; j++) {
            u128 s2 = (u128)t[j] + (u128)m * MOD[j] + c;
            t[j - 1] = (u64)s2;
            c = s2 >> 64;
        }
        s = (u128)t[NL] + c;
        t[NL - 1] = (u64)s;
        t[NL] = t[NL + 1] + (u64)(s >> 64);
    }
    memcpy(r->c, t, NL * sizeof(u64));
    cond_sub(r->c);
}

static void fq_sqr(fq *r, const fq *a) { fq_mul(r, a, a); }

static void fq_to_mont(fq *r, const fq *a) {
    fq r2;
    memcpy(r2.c, R2, sizeof R2);
    fq_mul(r, a, &r2);
}

static void fq_from_mont(fq *r, const fq *a) {
    fq one;
    fq_zero(&one);
    one.c[0] = 1;
    fq_mul(r, a, &one);
}

/* helpers on raw 6-limb values for the binary xgcd */
static int limbs_is_zero(const u64 *a) {
    u64 t = 0;
    for (int i = 0; i < NL; i++) t |= a[i];
    return t == 0;
}
static int limbs_is_even(const u64 *a) { return (a[0] & 1) == 0; }
static void limbs_rshift1(u64 *a) {
    for (int i = 0; i < NL - 1; i++)
        a[i] = (a[i] >> 1) | (a[i + 1] << 63);
    a[NL - 1] >>= 1;
}
static u64 limbs_add(u64 *a, const u64 *b) { /* returns carry */
    u128 c = 0;
    for (int i = 0; i < NL; i++) {
        u128 t = (u128)a[i] + b[i] + c;
        a[i] = (u64)t;
        c = t >> 64;
    }
    return (u64)c;
}
static u64 limbs_sub(u64 *a, const u64 *b) { /* returns borrow */
    u128 bor = 0;
    for (int i = 0; i < NL; i++) {
        u128 t = (u128)a[i] - b[i] - bor;
        a[i] = (u64)t;
        bor = (t >> 64) & 1;
    }
    return (u64)bor;
}
static int limbs_cmp(const u64 *a, const u64 *b) {
    for (int i = NL - 1; i >= 0; i--) {
        if (a[i] > b[i]) return 1;
        if (a[i] < b[i]) return -1;
    }
    return 0;
}

/* Montgomery-domain inverse: given â = aR, returns a^{-1}R.
 * Binary extended gcd computes â^{-1} = a^{-1}R^{-1}; two R2-muls fix
 * the factor.  Zero maps to zero. */
static void fq_inv(fq *r, const fq *a) {
    if (fq_is_zero(a)) { fq_zero(r); return; }
    u64 u[NL], v[NL], b[NL], c[NL];
    memcpy(u, a->c, sizeof u);
    memcpy(v, MOD, sizeof v);
    memset(b, 0, sizeof b);
    b[0] = 1;
    memset(c, 0, sizeof c);
    while (!limbs_is_zero(u) && !limbs_is_zero(v)) {
        while (limbs_is_even(u)) {
            limbs_rshift1(u);
            if (limbs_is_even(b)) limbs_rshift1(b);
            else { u64 cr = limbs_add(b, MOD); limbs_rshift1(b);
                   b[NL - 1] |= cr << 63; }
        }
        while (limbs_is_even(v)) {
            limbs_rshift1(v);
            if (limbs_is_even(c)) limbs_rshift1(c);
            else { u64 cr = limbs_add(c, MOD); limbs_rshift1(c);
                   c[NL - 1] |= cr << 63; }
        }
        if (limbs_cmp(u, v) >= 0) {
            limbs_sub(u, v);
            if (limbs_sub(b, c)) limbs_add(b, MOD);
        } else {
            limbs_sub(v, u);
            if (limbs_sub(c, b)) limbs_add(c, MOD);
        }
    }
    fq t;
    if (!limbs_is_zero(u)) memcpy(t.c, b, sizeof b);
    else memcpy(t.c, c, sizeof c);
    cond_sub(t.c);
    fq r2m;
    memcpy(r2m.c, R2, sizeof R2);
    fq_mul(&t, &t, &r2m);   /* a^{-1}R^{-1} * R2 / R = a^{-1} */
    fq_mul(r, &t, &r2m);    /* * R2 / R = a^{-1} R */
}

/* ---------------- fq2: u^2 = -1 ---------------- */

static void f2_zero(fq2 *r) { fq_zero(&r->c0); fq_zero(&r->c1); }
static void f2_one(fq2 *r) { fq_one(&r->c0); fq_zero(&r->c1); }
static int f2_is_zero(const fq2 *a) {
    return fq_is_zero(&a->c0) && fq_is_zero(&a->c1);
}
static int f2_eq(const fq2 *a, const fq2 *b) {
    return fq_eq(&a->c0, &b->c0) && fq_eq(&a->c1, &b->c1);
}
static void f2_add(fq2 *r, const fq2 *a, const fq2 *b) {
    fq_add(&r->c0, &a->c0, &b->c0);
    fq_add(&r->c1, &a->c1, &b->c1);
}
static void f2_sub(fq2 *r, const fq2 *a, const fq2 *b) {
    fq_sub(&r->c0, &a->c0, &b->c0);
    fq_sub(&r->c1, &a->c1, &b->c1);
}
static void f2_neg(fq2 *r, const fq2 *a) {
    fq_neg(&r->c0, &a->c0);
    fq_neg(&r->c1, &a->c1);
}
static void f2_mul(fq2 *r, const fq2 *a, const fq2 *b) {
    fq t0, t1, t2, s1, s2;
    fq_mul(&t0, &a->c0, &b->c0);
    fq_mul(&t1, &a->c1, &b->c1);
    fq_add(&s1, &a->c0, &a->c1);
    fq_add(&s2, &b->c0, &b->c1);
    fq_mul(&t2, &s1, &s2);
    fq_sub(&r->c0, &t0, &t1);
    fq_sub(&t2, &t2, &t0);
    fq_sub(&r->c1, &t2, &t1);
}
static void f2_sqr(fq2 *r, const fq2 *a) { f2_mul(r, a, a); }
static void f2_conj(fq2 *r, const fq2 *a) {
    r->c0 = a->c0;
    fq_neg(&r->c1, &a->c1);
}
static void f2_inv(fq2 *r, const fq2 *a) {
    fq d, t, di;
    fq_sqr(&d, &a->c0);
    fq_sqr(&t, &a->c1);
    fq_add(&d, &d, &t);
    fq_inv(&di, &d);
    fq_mul(&r->c0, &a->c0, &di);
    fq_neg(&t, &a->c1);
    fq_mul(&r->c1, &t, &di);
}
/* multiply by xi = 1 + u: (c0 - c1) + (c0 + c1) u */
static void f2_mul_xi(fq2 *r, const fq2 *a) {
    fq t0, t1;
    fq_sub(&t0, &a->c0, &a->c1);
    fq_add(&t1, &a->c0, &a->c1);
    r->c0 = t0;
    r->c1 = t1;
}

/* ---------------- fq6 = fq2[v]/(v^3 - xi) ---------------- */

static void f6_zero(fq6 *r) { f2_zero(&r->c0); f2_zero(&r->c1); f2_zero(&r->c2); }
static void f6_one(fq6 *r) { f2_one(&r->c0); f2_zero(&r->c1); f2_zero(&r->c2); }
static int f6_is_zero(const fq6 *a) {
    return f2_is_zero(&a->c0) && f2_is_zero(&a->c1) && f2_is_zero(&a->c2);
}
static int f6_eq(const fq6 *a, const fq6 *b) {
    return f2_eq(&a->c0, &b->c0) && f2_eq(&a->c1, &b->c1)
        && f2_eq(&a->c2, &b->c2);
}
static void f6_add(fq6 *r, const fq6 *a, const fq6 *b) {
    f2_add(&r->c0, &a->c0, &b->c0);
    f2_add(&r->c1, &a->c1, &b->c1);
    f2_add(&r->c2, &a->c2, &b->c2);
}
static void f6_sub(fq6 *r, const fq6 *a, const fq6 *b) {
    f2_sub(&r->c0, &a->c0, &b->c0);
    f2_sub(&r->c1, &a->c1, &b->c1);
    f2_sub(&r->c2, &a->c2, &b->c2);
}
static void f6_neg(fq6 *r, const fq6 *a) {
    f2_neg(&r->c0, &a->c0);
    f2_neg(&r->c1, &a->c1);
    f2_neg(&r->c2, &a->c2);
}
static void f6_mul(fq6 *r, const fq6 *a, const fq6 *b) {
    fq2 t0, t1, t2, s1, s2, tmp, c0, c1, c2;
    f2_mul(&t0, &a->c0, &b->c0);
    f2_mul(&t1, &a->c1, &b->c1);
    f2_mul(&t2, &a->c2, &b->c2);
    /* c0 = t0 + xi*((a1+a2)(b1+b2) - t1 - t2) */
    f2_add(&s1, &a->c1, &a->c2);
    f2_add(&s2, &b->c1, &b->c2);
    f2_mul(&tmp, &s1, &s2);
    f2_sub(&tmp, &tmp, &t1);
    f2_sub(&tmp, &tmp, &t2);
    f2_mul_xi(&tmp, &tmp);
    f2_add(&c0, &t0, &tmp);
    /* c1 = (a0+a1)(b0+b1) - t0 - t1 + xi*t2 */
    f2_add(&s1, &a->c0, &a->c1);
    f2_add(&s2, &b->c0, &b->c1);
    f2_mul(&tmp, &s1, &s2);
    f2_sub(&tmp, &tmp, &t0);
    f2_sub(&tmp, &tmp, &t1);
    f2_mul_xi(&s1, &t2);
    f2_add(&c1, &tmp, &s1);
    /* c2 = (a0+a2)(b0+b2) - t0 - t2 + t1 */
    f2_add(&s1, &a->c0, &a->c2);
    f2_add(&s2, &b->c0, &b->c2);
    f2_mul(&tmp, &s1, &s2);
    f2_sub(&tmp, &tmp, &t0);
    f2_sub(&tmp, &tmp, &t2);
    f2_add(&c2, &tmp, &t1);
    r->c0 = c0;
    r->c1 = c1;
    r->c2 = c2;
}
static void f6_sqr(fq6 *r, const fq6 *a) { f6_mul(r, a, a); }
static void f6_mul_by_v(fq6 *r, const fq6 *a) {
    fq2 t;
    f2_mul_xi(&t, &a->c2);
    fq2 a0 = a->c0, a1 = a->c1;
    r->c0 = t;
    r->c1 = a0;
    r->c2 = a1;
}
static void f6_inv(fq6 *r, const fq6 *a) {
    fq2 c0, c1, c2, t, s, ti;
    f2_sqr(&c0, &a->c0);
    f2_mul(&t, &a->c1, &a->c2);
    f2_mul_xi(&t, &t);
    f2_sub(&c0, &c0, &t);
    f2_sqr(&t, &a->c2);
    f2_mul_xi(&t, &t);
    f2_mul(&s, &a->c0, &a->c1);
    f2_sub(&c1, &t, &s);
    f2_sqr(&t, &a->c1);
    f2_mul(&s, &a->c0, &a->c2);
    f2_sub(&c2, &t, &s);
    /* t = xi*(a2*c1 + a1*c2) + a0*c0 */
    f2_mul(&t, &a->c2, &c1);
    f2_mul(&s, &a->c1, &c2);
    f2_add(&t, &t, &s);
    f2_mul_xi(&t, &t);
    f2_mul(&s, &a->c0, &c0);
    f2_add(&t, &t, &s);
    f2_inv(&ti, &t);
    f2_mul(&r->c0, &c0, &ti);
    f2_mul(&r->c1, &c1, &ti);
    f2_mul(&r->c2, &c2, &ti);
}

/* ---------------- fq12 = fq6[w]/(w^2 - v) ---------------- */

static void f12_one(fq12 *r) { f6_one(&r->c0); f6_zero(&r->c1); }
static int f12_eq(const fq12 *a, const fq12 *b) {
    return f6_eq(&a->c0, &b->c0) && f6_eq(&a->c1, &b->c1);
}
static void f12_add(fq12 *r, const fq12 *a, const fq12 *b) {
    f6_add(&r->c0, &a->c0, &b->c0);
    f6_add(&r->c1, &a->c1, &b->c1);
}
static void f12_sub(fq12 *r, const fq12 *a, const fq12 *b) {
    f6_sub(&r->c0, &a->c0, &b->c0);
    f6_sub(&r->c1, &a->c1, &b->c1);
}
static void f12_neg(fq12 *r, const fq12 *a) {
    f6_neg(&r->c0, &a->c0);
    f6_neg(&r->c1, &a->c1);
}
static void f12_mul(fq12 *r, const fq12 *a, const fq12 *b) {
    fq6 t0, t1, s1, s2, tv, c0, c1;
    f6_mul(&t0, &a->c0, &b->c0);
    f6_mul(&t1, &a->c1, &b->c1);
    f6_mul_by_v(&tv, &t1);
    f6_add(&c0, &t0, &tv);
    f6_add(&s1, &a->c0, &a->c1);
    f6_add(&s2, &b->c0, &b->c1);
    f6_mul(&c1, &s1, &s2);
    f6_sub(&c1, &c1, &t0);
    f6_sub(&c1, &c1, &t1);
    r->c0 = c0;
    r->c1 = c1;
}
static void f12_sqr(fq12 *r, const fq12 *a) { f12_mul(r, a, a); }
static void f12_conj(fq12 *r, const fq12 *a) {
    r->c0 = a->c0;
    f6_neg(&r->c1, &a->c1);
}
static void f12_inv(fq12 *r, const fq12 *a) {
    fq6 t, s, ti;
    f6_sqr(&t, &a->c0);
    f6_sqr(&s, &a->c1);
    f6_mul_by_v(&s, &s);
    f6_sub(&t, &t, &s);
    f6_inv(&ti, &t);
    f6_mul(&r->c0, &a->c0, &ti);
    f6_mul(&s, &a->c1, &ti);
    f6_neg(&r->c1, &s);
}
static int f12_is_zero_x(const fq12 *a) {
    return f6_is_zero(&a->c0) && f6_is_zero(&a->c1);
}

/* pow by big-endian byte exponent */
/* ---------------- Frobenius + cyclotomic machinery ---------------- */

static void f2_pow_bytes(fq2 *r, const fq2 *a, const uint8_t *e, int len) {
    fq2 acc;
    f2_one(&acc);
    int started = 0;
    for (int i = 0; i < len; i++) {
        for (int bit = 7; bit >= 0; bit--) {
            if (started) f2_sqr(&acc, &acc);
            if ((e[i] >> bit) & 1) {
                if (!started) { acc = *a; started = 1; }
                else f2_mul(&acc, &acc, a);
            }
        }
    }
    *r = acc;
}

/* gw[k] = xi^(k*(p-1)/6); phi(v)=v*gw^2, phi(w)=w*gw^1 */
static fq2 FROB_GW[6];
static fq2 XI_INV;
static int FROB_READY = 0;

static void frob_init(const uint8_t *pm1d6, int len) {
    if (FROB_READY) return;
    fq2 xi;
    fq_one(&xi.c0);
    fq_one(&xi.c1);                /* xi = 1 + u (Montgomery) */
    f2_inv(&XI_INV, &xi);
    f2_one(&FROB_GW[0]);
    f2_pow_bytes(&FROB_GW[1], &xi, pm1d6, len);
    for (int k = 2; k < 6; k++)
        f2_mul(&FROB_GW[k], &FROB_GW[k - 1], &FROB_GW[1]);
    FROB_READY = 1;
}

/* phi(sum c_ij v^i w^j) = sum conj(c_ij) gw^(2i+j) v^i w^j; alias-safe */
static void f12_frob(fq12 *r, const fq12 *a) {
    fq2 c;
    f2_conj(&r->c0.c0, &a->c0.c0);
    f2_conj(&c, &a->c0.c1); f2_mul(&r->c0.c1, &c, &FROB_GW[2]);
    f2_conj(&c, &a->c0.c2); f2_mul(&r->c0.c2, &c, &FROB_GW[4]);
    f2_conj(&c, &a->c1.c0); f2_mul(&r->c1.c0, &c, &FROB_GW[1]);
    f2_conj(&c, &a->c1.c1); f2_mul(&r->c1.c1, &c, &FROB_GW[3]);
    f2_conj(&c, &a->c1.c2); f2_mul(&r->c1.c2, &c, &FROB_GW[5]);
}

/* ---------------- twist-affine Miller loop ---------------- */

/* line through untwisted (x1 v^2, y1 vw) with twist slope s, at P:
 * l = py + (s*x1 - y1) vw - (px*s/xi) v^2 w   (see header comment) */
static void line_build(fq12 *l, const fq2 *s, const fq2 *x1, const fq2 *y1,
                       const fq *px, const fq *py) {
    fq2 t;
    memset(l, 0, sizeof *l);
    l->c0.c0.c0 = *py;
    f2_mul(&t, s, x1);
    f2_sub(&l->c1.c1, &t, y1);
    f2_mul(&t, s, &XI_INV);
    fq_mul(&t.c0, &t.c0, px);
    fq_mul(&t.c1, &t.c1, px);
    f2_neg(&l->c1.c2, &t);
}

/* vertical line x = x1 v^2 at P: l = px - x1 v^2 */
static void vline_build(fq12 *l, const fq2 *x1, const fq *px) {
    memset(l, 0, sizeof *l);
    l->c0.c0.c0 = *px;
    f2_neg(&l->c0.c2, x1);
}

static void miller(fq12 *f, const fq *px, const fq *py,
                   const fq2 *qx, const fq2 *qy) {
    fq2 xq, yq, xr, yr, s, num, den, t;
    fq12 l;
    /* twist coordinates: x' = qx/xi, y' = qy/xi */
    f2_mul(&xq, qx, &XI_INV);
    f2_mul(&yq, qy, &XI_INV);
    xr = xq;
    yr = yq;
    int rinf = 0;
    f12_one(f);
    int top = 63;
    while (top >= 0 && !((BLS_X >> top) & 1)) top--;
    for (int i = top - 1; i >= 0; i--) {
        f12_sqr(f, f);
        if (!rinf) {
            if (f2_is_zero(&yr)) {          /* tangent vertical (2-torsion;
                                               unreachable for r-order Q) */
                vline_build(&l, &xr, px);
                f12_mul(f, f, &l);
                rinf = 1;
            } else {
                /* twist curve y^2 = xi x^3 + 4/xi: tangent slope
                 * s = 3 xi x^2 / (2y), and x1+x2+x3 = s^2/xi */
                f2_sqr(&t, &xr);
                f2_add(&num, &t, &t);
                f2_add(&num, &num, &t);      /* 3 x^2 */
                f2_mul_xi(&num, &num);
                f2_add(&den, &yr, &yr);
                f2_inv(&den, &den);
                f2_mul(&s, &num, &den);
                line_build(&l, &s, &xr, &yr, px, py);
                f12_mul(f, f, &l);
                f2_sqr(&t, &s);
                f2_mul(&t, &t, &XI_INV);
                f2_sub(&t, &t, &xr);
                f2_sub(&t, &t, &xr);          /* x3 */
                f2_sub(&num, &xr, &t);
                f2_mul(&num, &s, &num);
                f2_sub(&yr, &num, &yr);       /* y3 */
                xr = t;
            }
        }
        if ((BLS_X >> i) & 1) {
            if (rinf) {
                xr = xq;
                yr = yq;
                rinf = 0;
            } else if (f2_eq(&xr, &xq)) {
                if (f2_eq(&yr, &yq)) {        /* R == Q: tangent step */
                    f2_sqr(&t, &xr);
                    f2_add(&num, &t, &t);
                    f2_add(&num, &num, &t);
                    f2_mul_xi(&num, &num);
                    f2_add(&den, &yr, &yr);
                    f2_inv(&den, &den);
                    f2_mul(&s, &num, &den);
                } else {                      /* R == -Q: vertical */
                    vline_build(&l, &xr, px);
                    f12_mul(f, f, &l);
                    rinf = 1;
                    continue;
                }
                line_build(&l, &s, &xr, &yr, px, py);
                f12_mul(f, f, &l);
                f2_sqr(&t, &s);
                f2_mul(&t, &t, &XI_INV);
                f2_sub(&t, &t, &xr);
                f2_sub(&t, &t, &xq);
                f2_sub(&num, &xr, &t);
                f2_mul(&num, &s, &num);
                f2_sub(&yr, &num, &yr);
                xr = t;
            } else {
                f2_sub(&num, &yq, &yr);
                f2_sub(&den, &xq, &xr);
                f2_inv(&den, &den);
                f2_mul(&s, &num, &den);
                line_build(&l, &s, &xr, &yr, px, py);
                f12_mul(f, f, &l);
                f2_sqr(&t, &s);
                f2_mul(&t, &t, &XI_INV);
                f2_sub(&t, &t, &xr);
                f2_sub(&t, &t, &xq);
                f2_sub(&num, &xr, &t);
                f2_mul(&num, &s, &num);
                f2_sub(&yr, &num, &yr);
                xr = t;
            }
        }
    }
    /* BLS_X is negative for BLS12-381 */
    f12_conj(f, f);
}

/* ---------------- final exponentiation ---------------- */

/* 4-way Straus multi-exp with shared squarings and 4-bit windows:
 * r = prod_k b[k]^(e_k), exponents big-endian, `dlen` bytes each. */
static void straus4(fq12 *r, const fq12 b[4], const uint8_t *e, int dlen) {
    static fq12 tab[4][16];
    for (int k = 0; k < 4; k++) {
        f12_one(&tab[k][0]);
        tab[k][1] = b[k];
        for (int d = 2; d < 16; d++)
            f12_mul(&tab[k][d], &tab[k][d - 1], &b[k]);
    }
    fq12 acc;
    f12_one(&acc);
    int started = 0;
    for (int byte = 0; byte < dlen; byte++) {
        for (int half = 0; half < 2; half++) {
            if (started)
                for (int q = 0; q < 4; q++) f12_sqr(&acc, &acc);
            for (int k = 0; k < 4; k++) {
                int nib = half ? (e[k * dlen + byte] & 0xF)
                               : (e[k * dlen + byte] >> 4);
                if (nib) {
                    f12_mul(&acc, &acc, &tab[k][nib]);
                    started = 1;
                }
            }
        }
    }
    *r = acc;
}

/* f -> f^((q^12-1)/r).  e_digits: the base-p digits e0..e3 of
 * (p^4-p^2+1)/r, big-endian, edig_len/4 bytes each. */
static void final_exp(fq12 *r, const fq12 *f,
                      const uint8_t *e_digits, int edig_len) {
    fq12 f1, t, y, b[4];
    f12_conj(&f1, f);
    f12_inv(&t, f);
    f12_mul(&f1, &f1, &t);           /* f^(p^6 - 1) */
    f12_frob(&t, &f1);
    f12_frob(&t, &t);
    f12_mul(&y, &t, &f1);            /* ^(p^2 + 1): easy part done */
    b[0] = y;
    f12_frob(&b[1], &b[0]);
    f12_frob(&b[2], &b[1]);
    f12_frob(&b[3], &b[2]);
    straus4(r, b, e_digits, edig_len / 4);
}

/* ---------------- G1 (E(Fq): y^2 = x^3 + 4) Jacobian ---------------- */

typedef struct { fq x, y, z; } g1j;

static void g1j_inf(g1j *r) {
    fq_one(&r->x);
    fq_one(&r->y);
    fq_zero(&r->z);
}
static int g1j_is_inf(const g1j *p) { return fq_is_zero(&p->z); }

static void g1j_double(g1j *r, const g1j *p) {
    if (g1j_is_inf(p) || fq_is_zero(&p->y)) { g1j_inf(r); return; }
    fq a, b, c, d, e, f, t, x3, y3, z3;
    fq_sqr(&a, &p->x);
    fq_sqr(&b, &p->y);
    fq_sqr(&c, &b);
    fq_add(&t, &p->x, &b);
    fq_sqr(&t, &t);
    fq_sub(&t, &t, &a);
    fq_sub(&t, &t, &c);
    fq_add(&d, &t, &t);
    fq_add(&e, &a, &a);
    fq_add(&e, &e, &a);
    fq_sqr(&f, &e);
    fq_add(&t, &d, &d);
    fq_sub(&x3, &f, &t);
    fq_sub(&t, &d, &x3);
    fq_mul(&y3, &e, &t);
    fq_add(&t, &c, &c);
    fq_add(&t, &t, &t);
    fq_add(&t, &t, &t);
    fq_sub(&y3, &y3, &t);
    fq_mul(&z3, &p->y, &p->z);
    fq_add(&z3, &z3, &z3);
    r->x = x3;
    r->y = y3;
    r->z = z3;
}

static void g1j_add(g1j *r, const g1j *p, const g1j *q) {
    if (g1j_is_inf(p)) { *r = *q; return; }
    if (g1j_is_inf(q)) { *r = *p; return; }
    fq z1z1, z2z2, u1, u2, s1, s2, h, rr, t;
    fq_sqr(&z1z1, &p->z);
    fq_sqr(&z2z2, &q->z);
    fq_mul(&u1, &p->x, &z2z2);
    fq_mul(&u2, &q->x, &z1z1);
    fq_mul(&s1, &p->y, &q->z);
    fq_mul(&s1, &s1, &z2z2);
    fq_mul(&s2, &q->y, &p->z);
    fq_mul(&s2, &s2, &z1z1);
    fq_sub(&h, &u2, &u1);
    fq_sub(&rr, &s2, &s1);
    if (fq_is_zero(&h)) {
        if (fq_is_zero(&rr)) { g1j_double(r, p); return; }
        g1j_inf(r);
        return;
    }
    fq i, j, r2, v, x3, y3, z3;
    fq_add(&t, &h, &h);
    fq_sqr(&i, &t);
    fq_mul(&j, &h, &i);
    fq_add(&r2, &rr, &rr);
    fq_mul(&v, &u1, &i);
    fq_sqr(&x3, &r2);
    fq_sub(&x3, &x3, &j);
    fq_add(&t, &v, &v);
    fq_sub(&x3, &x3, &t);
    fq_sub(&t, &v, &x3);
    fq_mul(&y3, &r2, &t);
    fq_mul(&t, &s1, &j);
    fq_add(&t, &t, &t);
    fq_sub(&y3, &y3, &t);
    fq_add(&z3, &p->z, &q->z);
    fq_sqr(&z3, &z3);
    fq_sub(&z3, &z3, &z1z1);
    fq_sub(&z3, &z3, &z2z2);
    fq_mul(&z3, &z3, &h);
    r->x = x3;
    r->y = y3;
    r->z = z3;
}

/* ---------------- public API ---------------- */

/* Small G1 MSM (verifier-side linear combinations).
 * pts: k*12 u64 raw affine coords; infs: k bytes (nonzero = identity);
 * scalars: k*32 bytes big-endian; out: 12 u64 raw affine + *out_inf. */
void g1_msm(const u64 *pts, const uint8_t *infs, const uint8_t *scalars,
            int k, u64 *out, uint8_t *out_inf) {
    g1j acc, t;
    g1j_inf(&acc);
    /* shared-squaring Straus with 4-bit windows: per-point tables of
     * P..15P, then one pass of 4 doublings per nibble position with a
     * table add per point.  ~256 dbl + k*(14+60) adds vs the naive
     * per-point ladder's k*(256 dbl + 128 add). */
    #define MSM_KMAX 96
    static g1j tab[MSM_KMAX][16];
    int idx[MSM_KMAX];
    int kk = 0;
    for (int i = 0; i < k && kk < MSM_KMAX; i++) {
        if (infs[i]) continue;
        g1j p;
        memcpy(p.x.c, pts + i * 12, 6 * sizeof(u64));
        memcpy(p.y.c, pts + i * 12 + 6, 6 * sizeof(u64));
        fq_to_mont(&p.x, &p.x);
        fq_to_mont(&p.y, &p.y);
        fq_one(&p.z);
        g1j_inf(&tab[kk][0]);
        tab[kk][1] = p;
        for (int d = 2; d < 16; d++)
            g1j_add(&tab[kk][d], &tab[kk][d - 1], &p);
        idx[kk] = i;
        kk++;
    }
    int started = 0;
    for (int byte = 0; byte < 32; byte++) {
        for (int half = 0; half < 2; half++) {
            if (started)
                for (int q = 0; q < 4; q++) { g1j_double(&t, &acc); acc = t; }
            for (int j = 0; j < kk; j++) {
                const uint8_t b = scalars[idx[j] * 32 + byte];
                int nib = half ? (b & 0xF) : (b >> 4);
                if (nib) {
                    g1j_add(&t, &acc, &tab[j][nib]);
                    acc = t;
                    started = 1;
                }
            }
        }
    }
    /* overflow tail (k > MSM_KMAX): naive ladder, never hit by the
     * verifier's ~20-40 term combinations */
    for (int i = 0; i < k; i++) {
        int in_tab = 0;
        for (int j = 0; j < kk; j++) if (idx[j] == i) { in_tab = 1; break; }
        if (in_tab || infs[i]) continue;
        g1j p, ps, sum;
        memcpy(p.x.c, pts + i * 12, 6 * sizeof(u64));
        memcpy(p.y.c, pts + i * 12 + 6, 6 * sizeof(u64));
        fq_to_mont(&p.x, &p.x);
        fq_to_mont(&p.y, &p.y);
        fq_one(&p.z);
        const uint8_t *s = scalars + i * 32;
        ps = p;
        g1j_inf(&sum);
        for (int byte = 31; byte >= 0; byte--)
            for (int bit = 0; bit < 8; bit++) {
                if ((s[byte] >> bit) & 1) { g1j_add(&t, &sum, &ps); sum = t; }
                g1j_double(&t, &ps);
                ps = t;
            }
        g1j_add(&t, &acc, &sum);
        acc = t;
    }
    if (g1j_is_inf(&acc)) {
        *out_inf = 1;
        memset(out, 0, 12 * sizeof(u64));
        return;
    }
    *out_inf = 0;
    fq zi, zi2, zi3, ax, ay;
    fq_inv(&zi, &acc.z);
    fq_sqr(&zi2, &zi);
    fq_mul(&zi3, &zi2, &zi);
    fq_mul(&ax, &acc.x, &zi2);
    fq_mul(&ay, &acc.y, &zi3);
    fq_from_mont(&ax, &ax);
    fq_from_mont(&ay, &ay);
    memcpy(out, ax.c, 6 * sizeof(u64));
    memcpy(out + 6, ay.c, 6 * sizeof(u64));
}

/* debug exports: raw Miller value and standalone final exp */
static void f12_store_raw(const fq12 *f, u64 *out) {
    const fq *coeffs = (const fq *)f;
    for (int i = 0; i < 12; i++) {
        fq raw;
        fq_from_mont(&raw, &coeffs[i]);
        memcpy(out + i * 6, raw.c, 6 * sizeof(u64));
    }
}
static void f12_load_raw(fq12 *f, const u64 *in) {
    fq *coeffs = (fq *)f;
    for (int i = 0; i < 12; i++) {
        memcpy(coeffs[i].c, in + i * 6, 6 * sizeof(u64));
        fq_to_mont(&coeffs[i], &coeffs[i]);
    }
}
void dbg_miller(const u64 *g1, const u64 *g2,
                const uint8_t *pm1d6, int pm1d6_len, u64 *out) {
    frob_init(pm1d6, pm1d6_len);
    fq px, py;
    fq2 qx, qy;
    memcpy(px.c, g1, 6 * sizeof(u64));
    memcpy(py.c, g1 + 6, 6 * sizeof(u64));
    memcpy(qx.c0.c, g2, 6 * sizeof(u64));
    memcpy(qx.c1.c, g2 + 6, 6 * sizeof(u64));
    memcpy(qy.c0.c, g2 + 12, 6 * sizeof(u64));
    memcpy(qy.c1.c, g2 + 18, 6 * sizeof(u64));
    fq_to_mont(&px, &px);
    fq_to_mont(&py, &py);
    fq_to_mont(&qx.c0, &qx.c0);
    fq_to_mont(&qx.c1, &qx.c1);
    fq_to_mont(&qy.c0, &qy.c0);
    fq_to_mont(&qy.c1, &qy.c1);
    fq12 m;
    miller(&m, &px, &py, &qx, &qy);
    f12_store_raw(&m, out);
}
void dbg_finalexp(const u64 *in, const uint8_t *pm1d6, int pm1d6_len,
                  const uint8_t *edig, int edig_len, u64 *out) {
    frob_init(pm1d6, pm1d6_len);
    fq12 f;
    f12_load_raw(&f, in);
    final_exp(&f, &f, edig, edig_len);
    f12_store_raw(&f, out);
}
void dbg_frob(const u64 *in, const uint8_t *pm1d6, int pm1d6_len,
              u64 *out) {
    frob_init(pm1d6, pm1d6_len);
    fq12 f;
    f12_load_raw(&f, in);
    f12_frob(&f, &f);
    f12_store_raw(&f, out);
}

/* g1s: k * 12 u64 (x, y raw little-endian limbs)
 * g2s: k * 24 u64 (x.c0, x.c1, y.c0, y.c1)
 * infs: k bytes, nonzero -> skip pair
 * pm1d6: (p-1)/6 big-endian bytes (Frobenius constant exponent)
 * edig: the 4 base-p digits of (p^4-p^2+1)/r, big-endian,
 *       edig_len/4 bytes each, lowest digit first
 * out: 72 u64 — the final Fq12, raw (non-Montgomery) limbs in order
 *      c0.c0.c0, c0.c0.c1, c0.c1.c0, ..., c1.c2.c1 */
void multi_pairing(const u64 *g1s, const u64 *g2s, const uint8_t *infs,
                   int k, const uint8_t *pm1d6, int pm1d6_len,
                   const uint8_t *edig, int edig_len, u64 *out) {
    fq12 f, m;
    frob_init(pm1d6, pm1d6_len);
    f12_one(&f);
    for (int i = 0; i < k; i++) {
        if (infs[i]) continue;
        fq px, py;
        fq2 qx, qy;
        memcpy(px.c, g1s + i * 12, 6 * sizeof(u64));
        memcpy(py.c, g1s + i * 12 + 6, 6 * sizeof(u64));
        memcpy(qx.c0.c, g2s + i * 24, 6 * sizeof(u64));
        memcpy(qx.c1.c, g2s + i * 24 + 6, 6 * sizeof(u64));
        memcpy(qy.c0.c, g2s + i * 24 + 12, 6 * sizeof(u64));
        memcpy(qy.c1.c, g2s + i * 24 + 18, 6 * sizeof(u64));
        fq_to_mont(&px, &px);
        fq_to_mont(&py, &py);
        fq_to_mont(&qx.c0, &qx.c0);
        fq_to_mont(&qx.c1, &qx.c1);
        fq_to_mont(&qy.c0, &qy.c0);
        fq_to_mont(&qy.c1, &qy.c1);
        miller(&m, &px, &py, &qx, &qy);
        f12_mul(&f, &f, &m);
    }
    final_exp(&f, &f, edig, edig_len);
    /* serialize raw */
    fq *coeffs = (fq *)&f;
    for (int i = 0; i < 12; i++) {
        fq raw;
        fq_from_mont(&raw, &coeffs[i]);
        memcpy(out + i * 6, raw.c, 6 * sizeof(u64));
    }
}

/* ---------------- SRS generation (fixed-base powers) ----------------
 *
 * out[i] = scalars[i] * G.  Native replacement for the Python
 * _fixed_base_powers in pcs/kzg.py (the reference gets this from
 * ark-poly-commit's KZG10::setup, plonk-core/src/commitment.rs:29-37):
 * at 2^18 the Python windowed ladder costs tens of minutes; this core
 * runs it in seconds, so large-n SRS setup is never the bench
 * bottleneck.
 *
 * base_xy: 12 u64 raw affine G; scalars: count*32 bytes LITTLE-endian;
 * out: count*12 u64 raw affine; out_infs: count bytes (nonzero =
 * identity, only for scalar == 0 mod r).
 *
 * Windowed fixed-base: table[w][d] = d * 2^(8w) * G for w < 32,
 * d < 256 (one-time ~16k adds), then each output is <= 31 table adds;
 * Jacobian -> affine via one shared batch inversion. */
#include <stdlib.h>

void g1_fixed_base_powers(const u64 *base_xy, const uint8_t *scalars,
                          long count, u64 *out, uint8_t *out_infs) {
    enum { WIN = 8, NWIN = 32, TSZ = 1 << WIN };
    g1j *table = (g1j *)malloc(sizeof(g1j) * NWIN * TSZ);
    g1j *jac = (g1j *)malloc(sizeof(g1j) * (size_t)count);
    fq *pre = (fq *)malloc(sizeof(fq) * ((size_t)count + 1));
    if (!table || !jac || !pre) { free(table); free(jac); free(pre); return; }

    g1j base;
    memcpy(base.x.c, base_xy, 6 * sizeof(u64));
    memcpy(base.y.c, base_xy + 6, 6 * sizeof(u64));
    fq_to_mont(&base.x, &base.x);
    fq_to_mont(&base.y, &base.y);
    fq_one(&base.z);

    for (int w = 0; w < NWIN; w++) {
        g1j *row = table + (size_t)w * TSZ;
        g1j_inf(&row[0]);
        row[1] = base;
        for (int d = 2; d < TSZ; d++)
            g1j_add(&row[d], &row[d - 1], &base);
        if (w + 1 < NWIN) {
            g1j t;
            for (int b = 0; b < WIN; b++) { g1j_double(&t, &base); base = t; }
        }
    }

    for (long i = 0; i < count; i++) {
        const uint8_t *s = scalars + i * 32;
        g1j acc, t;
        g1j_inf(&acc);
        for (int w = 0; w < NWIN; w++) {
            const uint8_t d = s[w];
            if (d) { g1j_add(&t, &acc, &table[(size_t)w * TSZ + d]); acc = t; }
        }
        jac[i] = acc;
    }

    /* batch inversion of the z coordinates (Montgomery trick) */
    fq_one(&pre[0]);
    for (long i = 0; i < count; i++) {
        out_infs[i] = (uint8_t)g1j_is_inf(&jac[i]);
        if (out_infs[i])
            pre[i + 1] = pre[i];
        else
            fq_mul(&pre[i + 1], &pre[i], &jac[i].z);
    }
    fq t_inv;
    fq_inv(&t_inv, &pre[count]);
    for (long i = count - 1; i >= 0; i--) {
        if (out_infs[i]) {
            memset(out + i * 12, 0, 12 * sizeof(u64));
            continue;
        }
        fq zi, zi2, zi3, ax, ay;
        fq_mul(&zi, &t_inv, &pre[i]);
        fq_mul(&t_inv, &t_inv, &jac[i].z);
        fq_sqr(&zi2, &zi);
        fq_mul(&zi3, &zi2, &zi);
        fq_mul(&ax, &jac[i].x, &zi2);
        fq_mul(&ay, &jac[i].y, &zi3);
        fq_from_mont(&ax, &ax);
        fq_from_mont(&ay, &ay);
        memcpy(out + i * 12, ax.c, 6 * sizeof(u64));
        memcpy(out + i * 12 + 6, ay.c, 6 * sizeof(u64));
    }
    free(table);
    free(jac);
    free(pre);
}
