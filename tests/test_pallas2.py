"""pallas2 slab-layout kernels vs the jnp golden path (interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from arkplonk_tpu.fields.jaxfield import FR, FQ
from arkplonk_tpu.fields import pallas2


def _rand_vals(F, n, seed):
    rng = np.random.default_rng(seed)
    return [int.from_bytes(rng.bytes(48), "little") % F.modulus
            for _ in range(n)]


@pytest.mark.parametrize("F", [FR, FQ], ids=["fr", "fq"])
@pytest.mark.parametrize("n", [7, 1024, 1500])
def test_mont_mul_matches_jnp(F, n):
    av = _rand_vals(F, n, 1)
    bv = _rand_vals(F, n, 2)
    a = jnp.asarray(F.encode(av))
    b = jnp.asarray(F.encode(bv))
    with F.pallas_disabled():
        ref = F.mont_mul(a, b)
    out = pallas2.mont_mul_pallas2(F, a, b, interpret=True)
    assert np.array_equal(np.asarray(ref), np.asarray(out))
    # decoded values match bigint math
    dec = F.decode(out)
    for x, y, z in zip(av, bv, dec):
        assert z == x * y % F.modulus


@pytest.mark.parametrize("F", [FR, FQ], ids=["fr", "fq"])
def test_mont_mul_edge_values(F):
    vals = [0, 1, F.modulus - 1, F.modulus - 2, 2, 1 << 128]
    a = jnp.asarray(F.encode(vals))
    b = jnp.asarray(F.encode(list(reversed(vals))))
    with F.pallas_disabled():
        ref = F.mont_mul(a, b)
    out = pallas2.mont_mul_pallas2(F, a, b, interpret=True)
    assert np.array_equal(np.asarray(ref), np.asarray(out))


@pytest.mark.parametrize("F", [FR, FQ], ids=["fr", "fq"])
def test_add_sub_tiles(F):
    n = pallas2.BLOCK
    av = _rand_vals(F, n, 3)
    bv = _rand_vals(F, n, 4)
    from arkplonk_tpu.fields.pallas_mont import add_tile, sub_tile, _mont_constants
    a = pallas2.pack(jnp.asarray(F.encode(av)), n)
    b = pallas2.pack(jnp.asarray(F.encode(bv)), n)
    N, _ = _mont_constants(F.modulus, F.L)
    add = pallas2.unpack(add_tile(a, b, N, F.L), n)
    sub = pallas2.unpack(sub_tile(a, b, N, F.L), n)
    add_dec = F.decode(add)
    sub_dec = F.decode(sub)
    for x, y, s, d in zip(av, bv, add_dec, sub_dec):
        assert s == (x + y) % F.modulus
        assert d == (x - y) % F.modulus
