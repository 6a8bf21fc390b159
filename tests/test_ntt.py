"""NTT: device kernels vs exact host reference (and host vs naive eval)."""

import random

import jax.numpy as jnp
import pytest

from arkplonk_tpu.fields import host
from arkplonk_tpu.fields.jaxfield import FR
from arkplonk_tpu.poly import ntt as N

RNG = random.Random(0xF00D)
R = host.R


def poly_eval(coeffs, x):
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % R
    return acc


def test_host_ntt_matches_naive():
    n = 16
    d = host.Domain(n)
    coeffs = [RNG.randrange(R) for _ in range(n)]
    evals = N.ntt_host(coeffs, d)
    for i, w in enumerate(d.elements()):
        assert evals[i] == poly_eval(coeffs, w)
    back = N.intt_host(evals, d)
    assert back == coeffs


def test_host_coset_ntt():
    n = 8
    d = host.Domain(n)
    coeffs = [RNG.randrange(R) for _ in range(n)]
    evals = N.coset_ntt_host(coeffs, d)
    g = d.coset_gen
    for i, w in enumerate(d.elements()):
        assert evals[i] == poly_eval(coeffs, g * w % R)
    assert N.coset_intt_host(evals, d) == coeffs


@pytest.mark.parametrize("k", [1, 4, 8])
def test_device_ntt_roundtrip(k):
    n = 1 << k
    dd = N.get_device_domain(n)
    coeffs = [RNG.randrange(R) for _ in range(n)]
    x = jnp.asarray(FR.encode(coeffs))
    evals = N.ntt(x, dd)
    assert FR.decode(evals) == N.ntt_host(coeffs, dd.host)
    back = N.intt(evals, dd)
    assert FR.decode(back) == coeffs


@pytest.mark.parametrize("k", [4, 6])
def test_device_coset_ntt(k):
    n = 1 << k
    dd = N.get_device_domain(n)
    coeffs = [RNG.randrange(R) for _ in range(n)]
    x = jnp.asarray(FR.encode(coeffs))
    evals = N.coset_ntt(x, dd)
    assert FR.decode(evals) == N.coset_ntt_host(coeffs, dd.host)
    back = N.coset_intt(evals, dd)
    assert FR.decode(back) == coeffs
