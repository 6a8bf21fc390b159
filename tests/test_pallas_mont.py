"""Pallas fused Montgomery kernel: interpret-mode correctness vs host ints."""

import random

import jax.numpy as jnp
import pytest

from arkplonk_tpu.fields.jaxfield import FR, FQ
from arkplonk_tpu.fields import pallas_mont

RNG = random.Random(0x9A77A5)


@pytest.mark.parametrize("F", [FR, FQ], ids=["Fr", "Fq"])
def test_kernel_matches_host(F):
    n = 600  # exercises block padding (600 -> 1024)
    xs = [RNG.randrange(F.modulus) for _ in range(n)]
    ys = [RNG.randrange(F.modulus) for _ in range(n)]
    xs[:3] = [0, 1, F.modulus - 1]
    ys[:3] = [5, 0, F.modulus - 1]
    A = jnp.asarray(F.encode(xs))
    B = jnp.asarray(F.encode(ys))
    out = pallas_mont.mont_mul_pallas(F, A, B, interpret=True)
    got = F.decode(out)
    assert got == [x * y % F.modulus for x, y in zip(xs, ys)]


def test_broadcast_scalar():
    xs = [RNG.randrange(FR.modulus) for _ in range(40)]
    s = RNG.randrange(FR.modulus)
    A = jnp.asarray(FR.encode(xs))
    S = jnp.asarray(FR.encode(s)).reshape(FR.L, 1)
    out = pallas_mont.mont_mul_pallas(FR, A, S, interpret=True)
    assert FR.decode(out) == [x * s % FR.modulus for x in xs]
