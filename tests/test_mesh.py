"""Mesh-shape invariance: distributed scans and the sharded prover stages
must produce bit-identical results to the single-device path.

(SURVEY.md §5.2: deterministic-reduction tests — same result across mesh
shapes; field arithmetic is exact so any nondeterminism is a bug signal.)
"""

import random

import jax
import jax.numpy as jnp
import pytest

from arkplonk_tpu.fields.jaxfield import FR
from arkplonk_tpu.mesh import sharding as ms
from arkplonk_tpu.mesh import scans as dscans
from arkplonk_tpu.poly import ntt
from arkplonk_tpu.proving import device as D

RNG = random.Random(0xD15)


def rand_fr_ints(n):
    return [RNG.randrange(1, FR.modulus) for _ in range(n)]


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "tests need 8 virtual devices"
    return ms.make_mesh(8)


def test_distributed_prefix_mul(mesh):
    n = 64
    vals = rand_fr_ints(n)
    x = FR.encode_fast(vals)
    xs = ms.put_sharded(mesh, x)
    got = FR.decode_fast(dscans.make_exclusive_prefix_mul(mesh)(xs))
    want = FR.decode_fast(D.shifted_prefix_product(x))
    assert got == want


def test_distributed_batch_inv(mesh):
    n = 64
    vals = rand_fr_ints(n)
    vals[7] = 0
    x = FR.encode_fast(vals)
    xs = ms.put_sharded(mesh, x)
    got = FR.decode_fast(dscans.make_batch_inv(mesh)(xs))
    want = [pow(v, -1, FR.modulus) if v else 0 for v in vals]
    assert got == want


def test_sharded_z_poly_matches_local(mesh):
    n = 64
    wires = FR.encode_fast(rand_fr_ints(4 * n)).reshape(FR.L, 4, n)
    sig = FR.encode_fast(rand_fr_ints(4 * n)).reshape(FR.L, 4, n)
    beta = FR.encode_fast([123])
    gamma = FR.encode_fast([456])
    dd = ntt.get_device_domain(n)
    local = D._z_poly_fn(n)(dd, wires, sig, beta, gamma)
    ma = (mesh, "x")
    sharded = D._z_poly_fn(n, ma)(
        dd, ms.put_sharded(mesh, wires), ms.put_sharded(mesh, sig),
        jax.device_put(beta, ms.replicated(mesh)),
        jax.device_put(gamma, ms.replicated(mesh)))
    assert FR.decode_fast(local) == FR.decode_fast(sharded)


def test_sharded_quotient_matches_local(mesh):
    n = 64
    sel4 = FR.encode_fast(rand_fr_ints(12 * 4 * n)).reshape(FR.L, 12, 4 * n)
    sig4 = FR.encode_fast(rand_fr_ints(4 * 4 * n)).reshape(FR.L, 4, 4 * n)
    polys = FR.encode_fast(rand_fr_ints(12 * n)).reshape(FR.L, 12, n)
    chal = FR.encode_fast(rand_fr_ints(11)).reshape(FR.L, 11, 1)
    dd4 = ntt.get_device_domain(4 * n)
    local = D._quotient_fn(n)(dd4, sel4, sig4, polys, chal)
    ma = (mesh, "x")
    sharded = D._quotient_fn(n, ma)(
        dd4, ms.put_sharded(mesh, sel4), ms.put_sharded(mesh, sig4),
        ms.put_sharded(mesh, polys),
        jax.device_put(chal, ms.replicated(mesh)))
    assert FR.decode_fast(local) == FR.decode_fast(sharded)
