"""Four-step kernel NTT vs the host golden NTT (interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from arkplonk_tpu.fields import host
from arkplonk_tpu.fields.jaxfield import FR
from arkplonk_tpu.poly import ntt, ntt4


def _rand(n, seed, batch=1):
    rng = np.random.default_rng(seed)
    vals = [[int.from_bytes(rng.bytes(31), "little") % host.R
             for _ in range(n)] for _ in range(batch)]
    arr = jnp.stack([jnp.asarray(FR.encode(v)) for v in vals], axis=1)
    return vals, arr  # (L, batch, n)


@pytest.mark.parametrize("n", [128, 512])
def test_ntt4_matches_host(n):
    vals, arr = _rand(n, 1)
    dd = ntt.get_device_domain(n)
    out = ntt4.ntt(arr, dd, interpret=True)
    got = FR.decode(out[:, 0])
    exp = ntt.ntt_host(vals[0], host.Domain(n))
    assert got == exp


@pytest.mark.parametrize("n", [128, 512])
def test_intt4_roundtrip_and_host(n):
    vals, arr = _rand(n, 2)
    dd = ntt.get_device_domain(n)
    out = ntt4.intt(arr, dd, interpret=True)
    got = FR.decode(out[:, 0])
    exp = ntt.intt_host(vals[0], host.Domain(n))
    assert got == exp


def test_ntt4_batched():
    n = 512
    vals, arr = _rand(n, 3, batch=3)
    dd = ntt.get_device_domain(n)
    out = ntt4.ntt(arr, dd, interpret=True)
    for b in range(3):
        assert FR.decode(out[:, b]) == ntt.ntt_host(vals[b], host.Domain(n))


@pytest.mark.slow
@pytest.mark.parametrize("n", [4096])
def test_ntt4_matches_host_slow(n):
    vals, arr = _rand(n, 5)
    dd = ntt.get_device_domain(n)
    out = ntt4.ntt(arr, dd, interpret=True)
    got = FR.decode(out[:, 0])
    exp = ntt.ntt_host(vals[0], host.Domain(n))
    assert got == exp


@pytest.mark.slow
def test_ntt4_two_level_recursion():
    n = 1 << 15  # 128 * 256 -> recursion with packed 128*2 tail
    vals, arr = _rand(n, 4)
    dd = ntt.get_device_domain(n)
    out = ntt4.ntt(arr, dd, interpret=True)
    got = FR.decode(out[:, 0])
    exp = ntt.ntt_host(vals[0], host.Domain(n))
    assert got == exp
