/* BLS12-381 pairing core (C, host-side).
 *
 * Native replacement for the pure-Python Fq12 tower / Miller loop in
 * arkplonk_tpu/curve/host.py (which itself mirrors the role ark-ec's
 * PairingEngine plays for the reference verifier, plonk-core
 * commitment.rs:29-49, proof.rs:398-425).  The Python path takes ~0.7 s
 * per pairing; this core runs the same algorithms in a few ms.
 *
 * Structure mirrors curve/host.py 1:1 (same tower: Fq2 u^2=-1,
 * Fq6 v^3=xi=u+1, Fq12 w^2=v; same untwist; same affine Miller loop;
 * same plain-exponentiation final exp), so the Python tests can check
 * byte-exact agreement against the golden path.
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
static void f12_pow_bytes(fq12 *r, const fq12 *a, const uint8_t *e, int len) {
    fq12 acc;
    f12_one(&acc);
    int started = 0;
    for (int i = 0; i < len; i++) {
        for (int bit = 7; bit >= 0; bit--) {
            if (started) f12_sqr(&acc, &acc);
            if ((e[i] >> bit) & 1) {
                if (!started) { acc = *a; started = 1; }
                else f12_mul(&acc, &acc, a);
            }
        }
    }
    *r = acc;
}

/* ---------------- affine E(Fq12) group law + Miller ---------------- */

typedef struct { fq12 x, y; int inf; } ept;

static void ept_double(ept *r, const ept *p) {
    if (p->inf || f12_is_zero_x(&p->y)) { r->inf = 1; return; }
    fq12 num, den, lam, t, x3, y3;
    fq12 three, two;
    /* 3*x^2 / (2*y) */
    f12_sqr(&t, &p->x);
    f12_add(&num, &t, &t);
    f12_add(&num, &num, &t);
    f12_add(&den, &p->y, &p->y);
    f12_inv(&den, &den);
    f12_mul(&lam, &num, &den);
    f12_sqr(&x3, &lam);
    f12_add(&t, &p->x, &p->x);
    f12_sub(&x3, &x3, &t);
    f12_sub(&t, &p->x, &x3);
    f12_mul(&y3, &lam, &t);
    f12_sub(&y3, &y3, &p->y);
    r->x = x3;
    r->y = y3;
    r->inf = 0;
    (void)three; (void)two;
}

static void ept_add(ept *r, const ept *p, const ept *q) {
    if (p->inf) { *r = *q; return; }
    if (q->inf) { *r = *p; return; }
    if (f12_eq(&p->x, &q->x)) {
        if (f12_eq(&p->y, &q->y)) { ept_double(r, p); return; }
        r->inf = 1;
        return;
    }
    fq12 lam, t, d, x3, y3;
    f12_sub(&t, &q->y, &p->y);
    f12_sub(&d, &q->x, &p->x);
    f12_inv(&d, &d);
    f12_mul(&lam, &t, &d);
    f12_sqr(&x3, &lam);
    f12_sub(&x3, &x3, &p->x);
    f12_sub(&x3, &x3, &q->x);
    f12_sub(&t, &p->x, &x3);
    f12_mul(&y3, &lam, &t);
    f12_sub(&y3, &y3, &p->y);
    r->x = x3;
    r->y = y3;
    r->inf = 0;
}

/* line through p1,p2 evaluated at t (host.py _line) */
static void line_eval(fq12 *r, const ept *p1, const ept *p2,
                      const fq12 *xt, const fq12 *yt) {
    fq12 m, num, den, t;
    if (!f12_eq(&p1->x, &p2->x)) {
        f12_sub(&num, &p2->y, &p1->y);
        f12_sub(&den, &p2->x, &p1->x);
        f12_inv(&den, &den);
        f12_mul(&m, &num, &den);
    } else if (f12_eq(&p1->y, &p2->y)) {
        f12_sqr(&t, &p1->x);
        f12_add(&num, &t, &t);
        f12_add(&num, &num, &t);
        f12_add(&den, &p1->y, &p1->y);
        f12_inv(&den, &den);
        f12_mul(&m, &num, &den);
    } else {
        f12_sub(r, xt, &p1->x);
        return;
    }
    f12_sub(&t, xt, &p1->x);
    f12_mul(&t, &m, &t);
    f12_sub(&num, yt, &p1->y);
    f12_sub(r, &t, &num);
}

/* untwist: G2 (x, y) over Fq2 -> E(Fq12) (host.py untwist) */
static void untwist(ept *r, const fq2 *qx, const fq2 *qy) {
    fq2 xi, xi_inv, t;
    fq_one(&xi.c0);
    fq_one(&xi.c1);           /* xi = 1 + u (Montgomery one in each) */
    f2_inv(&xi_inv, &xi);
    memset(r, 0, sizeof *r);
    f6_zero(&r->x.c0);
    f6_zero(&r->x.c1);
    f6_zero(&r->y.c0);
    f6_zero(&r->y.c1);
    f2_mul(&t, qx, &xi_inv);
    r->x.c0.c2 = t;           /* X = (x/xi) v^2 */
    f2_mul(&t, qy, &xi_inv);
    r->y.c1.c1 = t;           /* Y = (y/xi) v w */
    r->inf = 0;
}

/* Miller loop f_{|x|,Q}(P); P affine G1 (Montgomery fq), Q affine G2 */
static void miller(fq12 *f, const fq *px, const fq *py,
                   const fq2 *qx, const fq2 *qy) {
    ept Qp, Rp;
    fq12 xt, yt, l;
    untwist(&Qp, qx, qy);
    memset(&xt, 0, sizeof xt);
    memset(&yt, 0, sizeof yt);
    xt.c0.c0.c0 = *px;        /* embed G1 coords in Fq12 */
    yt.c0.c0.c0 = *py;
    f12_one(f);
    Rp = Qp;
    /* bits of BLS_X from the second-highest down */
    int top = 63;
    while (top >= 0 && !((BLS_X >> top) & 1)) top--;
    for (int i = top - 1; i >= 0; i--) {
        f12_sqr(f, f);
        line_eval(&l, &Rp, &Rp, &xt, &yt);
        f12_mul(f, f, &l);
        ept_double(&Rp, &Rp);
        if ((BLS_X >> i) & 1) {
            line_eval(&l, &Rp, &Qp, &xt, &yt);
            f12_mul(f, f, &l);
            ept_add(&Rp, &Rp, &Qp);
        }
    }
    /* BLS_X is negative for BLS12-381 */
    f12_conj(f, f);
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
    g1j acc;
    g1j_inf(&acc);
    for (int i = 0; i < k; i++) {
        if (infs[i]) continue;
        g1j p, t;
        memcpy(p.x.c, pts + i * 12, 6 * sizeof(u64));
        memcpy(p.y.c, pts + i * 12 + 6, 6 * sizeof(u64));
        fq_to_mont(&p.x, &p.x);
        fq_to_mont(&p.y, &p.y);
        fq_one(&p.z);
        const uint8_t *s = scalars + i * 32;
        g1j ps = p;
        g1j sum;
        g1j_inf(&sum);
        /* LSB-first double-and-add over the 256-bit scalar */
        for (int byte = 31; byte >= 0; byte--) {
            for (int bit = 0; bit < 8; bit++) {
                if ((s[byte] >> bit) & 1) {
                    g1j_add(&t, &sum, &ps);
                    sum = t;
                }
                g1j_double(&t, &ps);
                ps = t;
            }
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

/* g1s: k * 12 u64 (x, y raw little-endian limbs)
 * g2s: k * 24 u64 (x.c0, x.c1, y.c0, y.c1)
 * infs: k bytes, nonzero -> skip pair
 * qsq / ehard: big-endian exponent bytes for the final exponentiation
 * out: 72 u64 — the final Fq12, raw (non-Montgomery) limbs in order
 *      c0.c0.c0, c0.c0.c1, c0.c1.c0, ..., c1.c2.c1 */
void multi_pairing(const u64 *g1s, const u64 *g2s, const uint8_t *infs,
                   int k, const uint8_t *qsq, int qsq_len,
                   const uint8_t *ehard, int ehard_len, u64 *out) {
    fq12 f, m;
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
    /* final exponentiation (host.py final_exponentiation):
     * easy: f1 = conj(f) * f^-1 ; f2 = f1^(q^2) * f1 ; hard: f2^e */
    fq12 f1, f2, t;
    f12_conj(&f1, &f);
    f12_inv(&t, &f);
    f12_mul(&f1, &f1, &t);
    f12_pow_bytes(&f2, &f1, qsq, qsq_len);
    f12_mul(&f2, &f2, &f1);
    f12_pow_bytes(&f, &f2, ehard, ehard_len);
    /* serialize raw */
    fq *coeffs = (fq *)&f;
    for (int i = 0; i < 12; i++) {
        fq raw;
        fq_from_mont(&raw, &coeffs[i]);
        memcpy(out + i * 6, raw.c, 6 * sizeof(u64));
    }
}
