"""Host-side BLS12-381 group & pairing arithmetic (exact Python ints).

Covers the roles `ark-ec` plays for the reference (G1/G2 group law, pairings
behind `PairingEngine`, used by the KZG check at
/root/reference/plonk-core/src/commitment.rs:29-49 and proof.rs:398-425).
Per SURVEY.md §7.3 the pairing stays on host: only 2 pairings per
verification.  The prover-side heavy G1 work has a device path in
`curve/g1_jax.py`; this module is the golden reference for it.

Conventions (tower constants come from the active curve module, so the
same code serves BLS12-381 (u^2=-1, xi=u+1, M-twist) and BLS12-377
(u^2=-5, xi=u, D-twist)):
- G1/G2 affine points are `(x, y)` tuples; the identity is `None`.
- Fq2 elements are `(c0, c1)` with u^2 = NR (C.FQ2_NONRESIDUE).
- Fq6 elements are 3-tuples of Fq2 with v^3 = xi = (C.XI_C0, C.XI_C1).
- Fq12 elements are 2-tuples of Fq6 with w^2 = v.
"""

from __future__ import annotations

from ..fields.host import C
from ..fields.host import Q, R, fq_inv, sqrt_mod

# ---------------------------------------------------------------------------
# Fq2
# ---------------------------------------------------------------------------

F2_ZERO = (0, 0)
F2_ONE = (1, 0)
NR = C.FQ2_NONRESIDUE % Q  # u^2 = NR
XI = (C.XI_C0, C.XI_C1)    # the sextic twist constant


def f2_add(a, b):
    return ((a[0] + b[0]) % Q, (a[1] + b[1]) % Q)


def f2_sub(a, b):
    return ((a[0] - b[0]) % Q, (a[1] - b[1]) % Q)


def f2_neg(a):
    return ((-a[0]) % Q, (-a[1]) % Q)


def f2_mul(a, b):
    # (a0 + a1 u)(b0 + b1 u) = a0b0 + NR*a1b1 + (a0b1 + a1b0) u
    t0 = a[0] * b[0] % Q
    t1 = a[1] * b[1] % Q
    t2 = (a[0] + a[1]) * (b[0] + b[1]) % Q
    return ((t0 + NR * t1) % Q, (t2 - t0 - t1) % Q)


def f2_sqr(a):
    return f2_mul(a, a)


def f2_scalar(a, k):
    return (a[0] * k % Q, a[1] * k % Q)


def f2_conj(a):
    return (a[0], (-a[1]) % Q)


def f2_inv(a):
    # 1/(a0 + a1 u) = (a0 - a1 u)/(a0^2 - NR*a1^2)
    d = (a[0] * a[0] - NR * a[1] * a[1]) % Q
    di = fq_inv(d)
    return (a[0] * di % Q, (-a[1]) * di % Q)


def f2_is_zero(a):
    return a[0] % Q == 0 and a[1] % Q == 0


def f2_sqrt(a):
    """Square root in Fq2 (for point decompression), None if non-residue."""
    if f2_is_zero(a):
        return F2_ZERO
    # Algorithm 9 of "Square root computation over even extension fields"
    # using q^2 structure: candidate via a^((q^2+7)/16)? Simpler: solve with
    # norm trick: find x = x0 + x1 u with x^2 = a.
    a0, a1 = a
    if a1 == 0:
        s = sqrt_mod(a0, Q)
        if s is not None:
            return (s, 0)
        # a = a0 = (t u)^2 = NR t^2  =>  t^2 = a0/NR
        t = sqrt_mod(a0 * fq_inv(NR) % Q, Q)
        assert t is not None
        return (0, t)
    # norm N = a0^2 - NR*a1^2 must be a QR in Fq
    n = (a0 * a0 - NR * a1 * a1) % Q
    sn = sqrt_mod(n, Q)
    if sn is None:
        return None
    # x0^2 = (a0 + sn)/2 or (a0 - sn)/2
    inv2 = fq_inv(2)
    for cand in ((a0 + sn) * inv2 % Q, (a0 - sn) * inv2 % Q):
        x0 = sqrt_mod(cand, Q)
        if x0 is None or x0 == 0:
            continue
        x1 = a1 * fq_inv(2 * x0) % Q
        if f2_sqr((x0, x1)) == (a0 % Q, a1 % Q):
            return (x0, x1)
    return None


# ---------------------------------------------------------------------------
# Fq6 = Fq2[v]/(v^3 - xi)
# ---------------------------------------------------------------------------

F6_ZERO = (F2_ZERO, F2_ZERO, F2_ZERO)
F6_ONE = (F2_ONE, F2_ZERO, F2_ZERO)


def f6_add(a, b):
    return tuple(f2_add(x, y) for x, y in zip(a, b))


def f6_sub(a, b):
    return tuple(f2_sub(x, y) for x, y in zip(a, b))


def f6_neg(a):
    return tuple(f2_neg(x) for x in a)


def _mul_xi(a):
    return f2_mul(a, XI)


def f6_mul(a, b):
    a0, a1, a2 = a
    b0, b1, b2 = b
    t0 = f2_mul(a0, b0)
    t1 = f2_mul(a1, b1)
    t2 = f2_mul(a2, b2)
    c0 = f2_add(t0, _mul_xi(f2_sub(f2_mul(f2_add(a1, a2), f2_add(b1, b2)), f2_add(t1, t2))))
    c1 = f2_add(f2_sub(f2_mul(f2_add(a0, a1), f2_add(b0, b1)), f2_add(t0, t1)), _mul_xi(t2))
    c2 = f2_add(f2_sub(f2_mul(f2_add(a0, a2), f2_add(b0, b2)), f2_add(t0, t2)), t1)
    return (c0, c1, c2)


def f6_sqr(a):
    return f6_mul(a, a)


def f6_mul_by_v(a):
    # v * (a0 + a1 v + a2 v^2) = xi*a2 + a0 v + a1 v^2
    return (_mul_xi(a[2]), a[0], a[1])


def f6_inv(a):
    a0, a1, a2 = a
    c0 = f2_sub(f2_sqr(a0), _mul_xi(f2_mul(a1, a2)))
    c1 = f2_sub(_mul_xi(f2_sqr(a2)), f2_mul(a0, a1))
    c2 = f2_sub(f2_sqr(a1), f2_mul(a0, a2))
    t = f2_add(_mul_xi(f2_add(f2_mul(a2, c1), f2_mul(a1, c2))), f2_mul(a0, c0))
    ti = f2_inv(t)
    return (f2_mul(c0, ti), f2_mul(c1, ti), f2_mul(c2, ti))


# ---------------------------------------------------------------------------
# Fq12 = Fq6[w]/(w^2 - v)
# ---------------------------------------------------------------------------

F12_ZERO = (F6_ZERO, F6_ZERO)
F12_ONE = (F6_ONE, F6_ZERO)


def f12_add(a, b):
    return (f6_add(a[0], b[0]), f6_add(a[1], b[1]))


def f12_sub(a, b):
    return (f6_sub(a[0], b[0]), f6_sub(a[1], b[1]))


def f12_neg(a):
    return (f6_neg(a[0]), f6_neg(a[1]))


def f12_mul(a, b):
    a0, a1 = a
    b0, b1 = b
    t0 = f6_mul(a0, b0)
    t1 = f6_mul(a1, b1)
    c0 = f6_add(t0, f6_mul_by_v(t1))
    c1 = f6_sub(f6_sub(f6_mul(f6_add(a0, a1), f6_add(b0, b1)), t0), t1)
    return (c0, c1)


def f12_sqr(a):
    return f12_mul(a, a)


def f12_conj(a):
    return (a[0], f6_neg(a[1]))


def f12_inv(a):
    a0, a1 = a
    t = f6_sub(f6_sqr(a0), f6_mul_by_v(f6_sqr(a1)))
    ti = f6_inv(t)
    return (f6_mul(a0, ti), f6_neg(f6_mul(a1, ti)))


def f12_pow(a, e: int):
    if e < 0:
        return f12_pow(f12_inv(a), -e)
    acc = F12_ONE
    for bit in bin(e)[2:]:
        acc = f12_sqr(acc)
        if bit == "1":
            acc = f12_mul(acc, a)
    return acc


def f12_from_fq(x: int):
    return (((x % Q, 0), F2_ZERO, F2_ZERO), F6_ZERO)


# ---------------------------------------------------------------------------
# Generic short-Weierstrass group law over any of the tower fields
# ---------------------------------------------------------------------------

class _GroupOps:
    """Affine group law parameterized by field ops (exact, host-side)."""

    def __init__(self, add, sub, neg, mul, inv, scalar, zero, one):
        self.fadd, self.fsub, self.fneg = add, sub, neg
        self.fmul, self.finv, self.fscalar = mul, inv, scalar
        self.fzero, self.fone = zero, one

    def add(self, p, q):
        if p is None:
            return q
        if q is None:
            return p
        x1, y1 = p
        x2, y2 = q
        if x1 == x2:
            if y1 == y2:
                return self.double(p)
            return None
        lam = self.fmul(self.fsub(y2, y1), self.finv(self.fsub(x2, x1)))
        x3 = self.fsub(self.fsub(self.fmul(lam, lam), x1), x2)
        y3 = self.fsub(self.fmul(lam, self.fsub(x1, x3)), y1)
        return (x3, y3)

    def double(self, p):
        if p is None:
            return None
        x1, y1 = p
        if y1 == self.fzero or (isinstance(y1, int) and y1 % Q == 0):
            return None
        lam = self.fmul(self.fscalar(self.fmul(x1, x1), 3),
                        self.finv(self.fscalar(y1, 2)))
        x3 = self.fsub(self.fmul(lam, lam), self.fscalar(x1, 2))
        y3 = self.fsub(self.fmul(lam, self.fsub(x1, x3)), y1)
        return (x3, y3)

    def neg(self, p):
        if p is None:
            return None
        return (p[0], self.fneg(p[1]))

    def mul(self, p, k: int):
        k %= R
        acc = None
        add = self.add
        while k:
            if k & 1:
                acc = add(acc, p)
            p = self.double(p)
            k >>= 1
        return acc


def _fq_ops():
    return _GroupOps(
        add=lambda a, b: (a + b) % Q,
        sub=lambda a, b: (a - b) % Q,
        neg=lambda a: (-a) % Q,
        mul=lambda a, b: a * b % Q,
        inv=fq_inv,
        scalar=lambda a, k: a * k % Q,
        zero=0, one=1)


def _f2_ops():
    return _GroupOps(f2_add, f2_sub, f2_neg, f2_mul, f2_inv, f2_scalar,
                     F2_ZERO, F2_ONE)


def _f12_ops():
    return _GroupOps(f12_add, f12_sub, f12_neg, f12_mul, f12_inv,
                     lambda a, k: f12_mul(a, f12_from_fq(k)),
                     F12_ZERO, F12_ONE)


G1 = _fq_ops()
G2 = _f2_ops()
G12 = _f12_ops()

G1_GEN = (C.G1_X, C.G1_Y)
G2_GEN = ((C.G2_X_C0, C.G2_X_C1), (C.G2_Y_C0, C.G2_Y_C1))


def g1_is_on_curve(p):
    if p is None:
        return True
    x, y = p
    return (y * y - x * x * x - C.G1_B) % Q == 0


def g2_is_on_curve(p):
    if p is None:
        return True
    x, y = p
    b = (C.G2_B_C0, C.G2_B_C1)
    return f2_sub(f2_sqr(y), f2_add(f2_mul(x, f2_sqr(x)), b)) == F2_ZERO


# ---------------------------------------------------------------------------
# Jacobian G1 (prover-side host reference: MSM)
# ---------------------------------------------------------------------------

def jac_from_affine(p):
    if p is None:
        return (1, 1, 0)
    return (p[0], p[1], 1)


def jac_to_affine(p):
    x, y, z = p
    if z == 0:
        return None
    zi = fq_inv(z)
    zi2 = zi * zi % Q
    return (x * zi2 % Q, y * zi2 * zi % Q)


def jac_double(p):
    x, y, z = p
    if z == 0 or y == 0:
        return (1, 1, 0)
    a = x * x % Q
    b = y * y % Q
    c = b * b % Q
    d = 2 * ((x + b) * (x + b) - a - c) % Q
    e = 3 * a % Q
    f = e * e % Q
    x3 = (f - 2 * d) % Q
    y3 = (e * (d - x3) - 8 * c) % Q
    z3 = 2 * y * z % Q
    return (x3, y3, z3)


def jac_add(p, q):
    x1, y1, z1 = p
    x2, y2, z2 = q
    if z1 == 0:
        return q
    if z2 == 0:
        return p
    z1z1 = z1 * z1 % Q
    z2z2 = z2 * z2 % Q
    u1 = x1 * z2z2 % Q
    u2 = x2 * z1z1 % Q
    s1 = y1 * z2 * z2z2 % Q
    s2 = y2 * z1 * z1z1 % Q
    if u1 == u2:
        if s1 == s2:
            return jac_double(p)
        return (1, 1, 0)
    h = (u2 - u1) % Q
    i = 4 * h * h % Q
    j = h * i % Q
    rr = 2 * (s2 - s1) % Q
    v = u1 * i % Q
    x3 = (rr * rr - j - 2 * v) % Q
    y3 = (rr * (v - x3) - 2 * s1 * j) % Q
    z3 = 2 * h * z1 * z2 % Q
    return (x3, y3, z3)


def jac_mul(p, k: int):
    k %= R
    acc = (1, 1, 0)
    while k:
        if k & 1:
            acc = jac_add(acc, p)
        p = jac_double(p)
        k >>= 1
    return acc


def msm_host(points, scalars, window: int = 8):
    """Pippenger bucket-method MSM over affine G1 points (host reference).

    Golden model for the device MSM (`curve/msm.py`); mirrors the role of
    arkworks `VariableBaseMSM` (reference commitment.rs:45,83)."""
    assert len(points) == len(scalars)
    jpoints = [jac_from_affine(p) for p in points]
    num_windows = (255 + window - 1) // window
    window_sums = []
    for wi in range(num_windows):
        shift = wi * window
        buckets = [(1, 1, 0)] * ((1 << window) - 1)
        for p, s in zip(jpoints, scalars):
            digit = (s >> shift) & ((1 << window) - 1)
            if digit:
                buckets[digit - 1] = jac_add(buckets[digit - 1], p)
        running = (1, 1, 0)
        total = (1, 1, 0)
        for b in reversed(buckets):
            running = jac_add(running, b)
            total = jac_add(total, running)
        window_sums.append(total)
    acc = (1, 1, 0)
    for ws in reversed(window_sums):
        for _ in range(window):
            acc = jac_double(acc)
        acc = jac_add(acc, ws)
    return jac_to_affine(acc)


# ---------------------------------------------------------------------------
# Pairing (ate pairing, Miller loop in Fq12 via untwist)
# ---------------------------------------------------------------------------

def untwist(q):
    """Map a G2 point on the twist E'(Fq2) to E(Fq12): Y^2 = X^3 + b.

    M-twist (E': y^2 = x^3 + b*xi, BLS12-381):  psi(x,y) = (x/w^2, y/w^3)
      = ((x/xi) v^2, (y/xi) v w)   since w^2 = v, v^3 = xi.
    D-twist (E': y^2 = x^3 + b/xi, BLS12-377):  psi(x,y) = (x*w^2, y*w^3)
      = (x v, (y v) w):  Y^2 - X^3 = xi*(y^2 - x^3) = xi*b/xi = b."""
    if q is None:
        return None
    x, y = q
    if C.TWIST == "M":
        xi_inv = f2_inv(XI)
        X = (F2_ZERO, F2_ZERO, f2_mul(x, xi_inv))   # (x/xi) v^2
        Y6 = (F2_ZERO, f2_mul(y, xi_inv), F2_ZERO)  # (y/xi) v (times w)
    else:
        X = (F2_ZERO, x, F2_ZERO)                   # x v
        Y6 = (F2_ZERO, y, F2_ZERO)                  # y v (times w)
    return ((X, F6_ZERO), (F6_ZERO, Y6))  # (X in Fq12, Y = (...)*w)


def _line(p1, p2, t):
    """Evaluate the line through p1,p2 (Fq12 points) at t; all in Fq12."""
    x1, y1 = p1
    x2, y2 = p2
    xt, yt = t
    if x1 != x2:
        m = f12_mul(f12_sub(y2, y1), f12_inv(f12_sub(x2, x1)))
        return f12_sub(f12_mul(m, f12_sub(xt, x1)), f12_sub(yt, y1))
    if y1 == y2:
        three = f12_from_fq(3)
        two = f12_from_fq(2)
        m = f12_mul(f12_mul(three, f12_mul(x1, x1)),
                    f12_inv(f12_mul(two, y1)))
        return f12_sub(f12_mul(m, f12_sub(xt, x1)), f12_sub(yt, y1))
    return f12_sub(xt, x1)


def miller_loop(p, q):
    """Miller loop f_{|x|,Q}(P) with P in G1 (affine ints), Q in G2."""
    if p is None or q is None:
        return F12_ONE
    P = (f12_from_fq(p[0]), f12_from_fq(p[1]))
    Qp = untwist(q)
    f = F12_ONE
    R_pt = Qp
    for bit in bin(C.BLS_X)[3:]:  # skip leading 1
        f = f12_mul(f12_sqr(f), _line(R_pt, R_pt, P))
        R_pt = G12.double(R_pt)
        if bit == "1":
            f = f12_mul(f, _line(R_pt, Qp, P))
            R_pt = G12.add(R_pt, Qp)
    if C.BLS_X_IS_NEGATIVE:
        f = f12_conj(f)
    return f


def final_exponentiation(f):
    """f^((q^12-1)/r): easy part then hard part by plain exponentiation."""
    # easy part: f^(q^6-1) = conj(f) * f^-1 ; then ^(q^2+1)
    f1 = f12_mul(f12_conj(f), f12_inv(f))
    f2 = f12_mul(f12_pow(f1, Q * Q), f1)
    # hard part (not the optimized addition chain; host-side, rarely called)
    e = (Q ** 4 - Q ** 2 + 1) // R
    return f12_pow(f2, e)


def pairing(p, q):
    """e(P, Q) for P in G1, Q in G2."""
    return multi_pairing([(p, q)])


def multi_pairing(pairs):
    """prod e(P_i, Q_i): shared final exponentiation (the KZG batch check).

    Dispatches to the native C core (curve/native_pairing.py, ~100x
    faster) when buildable; ARKPLONK_NATIVE_PAIRING=0 forces this exact
    Python path (the golden reference the C core is tested against)."""
    from . import native_pairing
    if native_pairing.available():
        return native_pairing.multi_pairing(pairs)
    return multi_pairing_py(pairs)


def multi_pairing_py(pairs):
    f = F12_ONE
    for p, q in pairs:
        f = f12_mul(f, miller_loop(p, q))
    return final_exponentiation(f)
