"""Field arithmetic: device limb kernels vs exact host ints.

Analogue of the arkworks field axioms the reference inherits; golden checks
are random-vector cross-validation against Python-int arithmetic.
"""

import random

import numpy as np
import pytest

from arkplonk_tpu.fields import bls12_381 as C
from arkplonk_tpu.fields import host
from arkplonk_tpu.fields.jaxfield import FR, FQ


RNG = random.Random(0xA11CE)


def rand_elems(field, n):
    return [RNG.randrange(field.modulus) for _ in range(n)]


@pytest.mark.parametrize("F", [FR, FQ], ids=["Fr", "Fq"])
def test_codec_roundtrip(F):
    xs = rand_elems(F, 33) + [0, 1, F.modulus - 1]
    enc = F.encode(xs)
    assert F.decode(enc) == xs


@pytest.mark.parametrize("F", [FR, FQ], ids=["Fr", "Fq"])
def test_add_sub_neg(F):
    n = 64
    a = rand_elems(F, n)
    b = rand_elems(F, n)
    A, B = F.encode(a), F.encode(b)
    assert F.decode(F.add(A, B)) == [(x + y) % F.modulus for x, y in zip(a, b)]
    assert F.decode(F.sub(A, B)) == [(x - y) % F.modulus for x, y in zip(a, b)]
    assert F.decode(F.neg(A)) == [(-x) % F.modulus for x in a]
    # edge: sub with zero, neg of zero
    Z = F.zeros((n,))
    assert F.decode(F.neg(Z)) == [0] * n
    assert F.decode(F.sub(Z, B)) == [(-y) % F.modulus for y in b]


@pytest.mark.parametrize("F", [FR, FQ], ids=["Fr", "Fq"])
def test_mont_mul(F):
    n = 64
    a = rand_elems(F, n) + [0, 1, F.modulus - 1, F.modulus - 1]
    b = rand_elems(F, n) + [1, 0, F.modulus - 1, 1]
    A, B = F.encode(a), F.encode(b)
    assert F.decode(F.mont_mul(A, B)) == [x * y % F.modulus for x, y in zip(a, b)]


@pytest.mark.parametrize("F", [FR, FQ], ids=["Fr", "Fq"])
def test_pow_and_inv(F):
    n = 8
    a = rand_elems(F, n)
    A = F.encode(a)
    e = 0xDEADBEEF12345
    assert F.decode(F.pow_fixed(A, e)) == [pow(x, e, F.modulus) for x in a]
    got = F.decode(F.inv(A))
    assert got == [pow(x, -1, F.modulus) for x in a]


def test_batch_inv_scan():
    n = 32
    a = rand_elems(FR, n)
    a[5] = 0  # zero passes through as zero
    A = FR.encode(a)
    got = FR.decode(FR.batch_inv_scan(A))
    want = [pow(x, -1, FR.modulus) if x else 0 for x in a]
    assert got == want


def test_host_batch_inv():
    vals = rand_elems(FR, 20)
    vals[3] = 0
    out = host.batch_inv(vals)
    for v, o in zip(vals, out):
        assert (v * o) % host.R == (1 if v else 0)


def test_domain_roots():
    d = host.Domain(1 << 10)
    w = d.group_gen
    assert pow(w, d.size, host.R) == 1
    assert pow(w, d.size // 2, host.R) == host.R - 1


def test_jubjub_constants_on_curve():
    r = C.R_MOD
    x, y = C.JUBJUB_GEN_X, C.JUBJUB_GEN_Y
    lhs = (C.JUBJUB_A * x * x + y * y) % r
    rhs = (1 + C.JUBJUB_D * x * x % r * y * y) % r
    assert lhs == rhs


def test_broadcasting():
    a = rand_elems(FR, 16)
    s = RNG.randrange(FR.modulus)
    A = FR.encode(a)
    S = FR.encode(s).reshape(FR.L, 1)
    import jax.numpy as jnp
    got = FR.decode(FR.mont_mul(A, jnp.asarray(S)))
    assert got == [x * s % FR.modulus for x in a]
