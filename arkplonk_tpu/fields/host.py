"""Host-side exact field arithmetic over Python ints.

This is the bit-exact reference layer: the composer, transcript, verifier and
all golden-value tests run on it.  The device (JAX/Pallas) limb kernels in
`fr_jax.py` are validated against these functions.

Plays the role the `ark-ff::PrimeField` trait plays for the reference
(/root/reference/plonk-core/Cargo.toml:31).
"""

from __future__ import annotations

import os

CURVE = os.environ.get("ARKPLONK_CURVE", "bls12_381")
if CURVE == "bls12_381":
    from . import bls12_381 as C
elif CURVE == "bls12_377":
    from . import bls12_377 as C
else:  # pragma: no cover
    raise ValueError(f"unknown ARKPLONK_CURVE {CURVE!r}")

R = C.R_MOD
Q = C.Q_MOD


def fr(x: int) -> int:
    return x % R


def fq(x: int) -> int:
    return x % Q


def inv_mod(a: int, m: int) -> int:
    if a % m == 0:
        raise ZeroDivisionError("inverse of zero")
    return pow(a, -1, m)


def fr_inv(a: int) -> int:
    return inv_mod(a, R)


def fq_inv(a: int) -> int:
    return inv_mod(a, Q)


def batch_inv(vals, m: int = R):
    """Montgomery batch inversion: one modular inverse for the whole list.

    Mirrors the batch-inversion idiom arkworks uses inside the permutation
    grand-product (reference permutation/mod.rs:536-545 does per-element
    inversion; we always batch).
    Zero entries map to zero (caller beware).
    """
    n = len(vals)
    prefix = [1] * (n + 1)
    for i, v in enumerate(vals):
        prefix[i + 1] = prefix[i] * (v if v % m else 1) % m
    total_inv = inv_mod(prefix[n], m)
    out = [0] * n
    for i in range(n - 1, -1, -1):
        v = vals[i]
        if v % m:
            out[i] = prefix[i] * total_inv % m
            total_inv = total_inv * v % m
    return out


def legendre(a: int, m: int) -> int:
    return pow(a, (m - 1) // 2, m)


def sqrt_mod(a: int, m: int) -> int | None:
    """Tonelli-Shanks square root (general two-adicity)."""
    a %= m
    if a == 0:
        return 0
    if legendre(a, m) != 1:
        return None
    # factor m-1 = q * 2^s
    q, s = m - 1, 0
    while q % 2 == 0:
        q //= 2
        s += 1
    if s == 1:
        return pow(a, (m + 1) // 4, m)
    # find non-residue
    z = 2
    while legendre(z, m) != m - 1:
        z += 1
    c = pow(z, q, m)
    x = pow(a, (q + 1) // 2, m)
    t = pow(a, q, m)
    mm = s
    while t != 1:
        i, tt = 0, t
        while tt != 1:
            tt = tt * tt % m
            i += 1
        b = pow(c, 1 << (mm - i - 1), m)
        x = x * b % m
        t = t * b * b % m
        c = b * b % m
        mm = i
    return x


# --- Evaluation domain ------------------------------------------------------

class Domain:
    """Radix-2 multiplicative subgroup of Fr* of size n = 2^k.

    TPU-native analogue of `GeneralEvaluationDomain` +
    `EvaluationDomainExt` (reference plonk-core/src/util.rs:24-89).
    """

    def __init__(self, n: int):
        assert n & (n - 1) == 0 and n > 0, "domain size must be a power of two"
        k = n.bit_length() - 1
        if k > C.FR_TWO_ADICITY:
            from ..errors import InvalidEvalDomainSize
            raise InvalidEvalDomainSize(k, C.FR_TWO_ADICITY)
        self.size = n
        self.log_size = k
        self.group_gen = pow(C.FR_TWO_ADIC_ROOT, 1 << (C.FR_TWO_ADICITY - k), R)
        self.group_gen_inv = fr_inv(self.group_gen)
        self.size_inv = fr_inv(n)
        # coset generator used by ark-poly's coset FFT (the field's
        # multiplicative generator)
        self.coset_gen = C.FR_GENERATOR
        self.coset_gen_inv = fr_inv(self.coset_gen)
        self._elements = None

    def elements(self):
        if self._elements is None:
            w = self.group_gen
            out = [1] * self.size
            for i in range(1, self.size):
                out[i] = out[i - 1] * w % R
            self._elements = out
        return self._elements

    def evaluate_vanishing_polynomial(self, tau: int) -> int:
        return (pow(tau, self.size, R) - 1) % R
