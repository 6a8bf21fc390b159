"""Distributed four-step NTT: bit-exactness + explicit-collective check.

VERDICT r4 item 5: the mesh NTT must (a) be bit-exact vs the host NTT at
2^12+, and (b) lower to all-to-all transposes instead of the butterfly
path's per-stage gather collectives.
"""

import random

import jax
import pytest

from arkplonk_tpu.fields import host
from arkplonk_tpu.fields.jaxfield import FR
from arkplonk_tpu.mesh import sharding as ms
from arkplonk_tpu.poly import ntt, ntt_mesh

RNG = random.Random(0x4E7)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "tests need 8 virtual devices"
    return ms.make_mesh(8)


def rand_fr_ints(n):
    return [RNG.randrange(0, FR.modulus) for _ in range(n)]


@pytest.mark.parametrize("log2n", [9, 12])
def test_mesh_ntt_bit_exact_vs_host(mesh, log2n):
    n = 1 << log2n
    ma = (mesh, "x")
    assert ntt_mesh.supported(n, ma)
    vals = rand_fr_ints(n)
    dom = host.Domain(n)
    dd = ntt.get_device_domain(n)
    x = ms.put_sharded(mesh, FR.encode_fast(vals))

    got_f = FR.decode_fast(ntt_mesh.ntt(x, dd, ma))
    assert got_f == ntt.ntt_host(vals, dom)

    got_i = FR.decode_fast(ntt_mesh.intt(x, dd, ma))
    assert got_i == ntt.intt_host(vals, dom)


def test_mesh_ntt_batched_matches_single_device(mesh):
    n = 1 << 12
    B = 3
    ma = (mesh, "x")
    dd = ntt.get_device_domain(n)
    vals = rand_fr_ints(B * n)
    x = FR.encode_fast(vals).reshape(FR.L, B, n)
    with FR.pallas_disabled():
        want = FR.decode_fast(ntt.ntt(x, dd))
    got = FR.decode_fast(ntt_mesh.ntt(ms.put_sharded(mesh, x), dd, ma))
    assert got == want


def test_mesh_dispatch_routes_to_four_step(mesh):
    """ntt.ntt(mesh_axes=...) must take the four-step path for
    supported sizes (it was hard-disabled under a mesh before r5)."""
    n = 1 << 12
    ma = (mesh, "x")
    dd = ntt.get_device_domain(n)
    vals = rand_fr_ints(n)
    x = ms.put_sharded(mesh, FR.encode_fast(vals))
    with FR.pallas_disabled():
        got = FR.decode_fast(ntt.ntt(x, dd, ma))
    assert got == ntt.ntt_host(vals, host.Domain(n))


def test_collectives_are_all_to_all(mesh):
    """The compiled four-step program's collectives are 3 all-to-alls;
    the butterfly path lowers to (more, larger) gather-style collectives."""
    n = 1 << 12
    ma = (mesh, "x")
    dd = ntt.get_device_domain(n)
    x = ms.put_sharded(mesh, FR.encode_fast(rand_fr_ints(n)))

    fn = ntt_mesh._mesh_ntt_fn(n, False, ma)
    with FR.pallas_disabled():
        inner = fn.__closure__  # noqa: F841  (call once to build)
        _ = fn(x.reshape(FR.L, 1, n), dd)
    # recompile the shard-mapped inner program and inspect its HLO
    import jax.numpy as jnp  # noqa: F401
    lowered = jax.jit(lambda v: ntt_mesh._mesh_ntt_fn(n, False, ma)(
        v, dd)).lower(x.reshape(FR.L, 1, n))
    hlo = lowered.compile().as_text()
    n_a2a = hlo.count("all-to-all")
    assert n_a2a >= 3, f"expected >=3 all-to-all ops, found {n_a2a}"

    # butterfly path at the same size for comparison: it must contain
    # gather-style collectives (all-gather / collective-permute), which
    # the four-step path avoids entirely for the data array
    def butterfly(v):
        xr = ntt._gather_last(v, dd.bitrev, ma)
        return ntt._ntt_core(xr, dd.tw, dd.k, ma)

    with FR.pallas_disabled():
        hlo_b = jax.jit(butterfly).lower(x).compile().as_text()
    gathers = hlo_b.count("all-gather") + hlo_b.count("collective-permute") \
        + hlo_b.count("all-to-all")
    assert gathers >= 1, "butterfly path unexpectedly collective-free"


def test_mesh_intt_batched(mesh):
    """Batched (B>1) inverse: the n_inv scale must broadcast across
    batch dims (regression: rank mismatch inside shard_map)."""
    n = 1 << 9
    B = 4
    ma = (mesh, "x")
    dd = ntt.get_device_domain(n)
    vals = rand_fr_ints(B * n)
    x = FR.encode_fast(vals).reshape(FR.L, B, n)
    with FR.pallas_disabled():
        want = FR.decode_fast(ntt.intt(x, dd))
    got = FR.decode_fast(ntt_mesh.intt(ms.put_sharded(mesh, x), dd, ma))
    assert got == want
