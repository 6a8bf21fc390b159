"""Distributed field scans over the mesh (SURVEY.md §2.3.4).

The reference computes the z(X)/z2(X) grand products with a serial prefix
product (permutation/mod.rs:733-747, flagged "Non-parallelizable?").  Here:
two-level scans under shard_map — a local associative scan per chip, an
all-gather of the per-chip totals over ICI, an exclusive product of the
totals as the chip offset.  Batch inversion composes prefix/suffix scans
with one (replicated) Fermat inverse.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..fields.jaxfield import FR


def _excl_of_gathered(totals, my):
    """totals: (L, S) per-shard totals; product of totals[:, :my]."""
    S = totals.shape[1]
    incl = jax.lax.associative_scan(FR.mont_mul, totals, axis=1)
    excl = jnp.concatenate([FR.ones((1,)), incl[:, :S - 1]], axis=1)
    return jax.lax.dynamic_slice_in_dim(excl, my, 1, axis=1)


def make_exclusive_prefix_mul(mesh, axis: str = "x"):
    """Returns fn: (L, n)-sharded ratios -> exclusive prefix products
    [1, r0, r0 r1, ...] with the same sharding."""

    def local(r):
        incl = jax.lax.associative_scan(FR.mont_mul, r, axis=1)
        total = incl[:, -1:]
        totals = jax.lax.all_gather(total, axis, axis=1, tiled=True)
        my = jax.lax.axis_index(axis)
        offset = _excl_of_gathered(totals, my)
        excl_local = jnp.concatenate(
            [FR.ones((1,)), incl[:, :-1]], axis=1)
        # element 0 of each shard must be the pure offset (prefix of all
        # previous shards); others offset * local exclusive
        return FR.mont_mul(excl_local, offset)

    inner = jax.jit(jax.shard_map(local, mesh=mesh, in_specs=P(None, axis),
                                  out_specs=P(None, axis), check_vma=False))

    def wrapper(x):
        with FR.pallas_disabled():
            return inner(x)

    return wrapper


def make_batch_inv(mesh, axis: str = "x"):
    """Returns fn: (L, n)-sharded x -> elementwise inverses (zeros pass
    through), via distributed prefix/suffix scans + one replicated
    inverse."""

    def local(x):
        zero_mask = FR.is_zero(x)
        safe = FR.select(zero_mask, FR.ones(x.shape[1:]), x)
        incl = jax.lax.associative_scan(FR.mont_mul, safe, axis=1)
        total = incl[:, -1:]
        totals = jax.lax.all_gather(total, axis, axis=1, tiled=True)
        my = jax.lax.axis_index(axis)
        pre_off = _excl_of_gathered(totals, my)
        # global exclusive prefix for each element
        prefix_excl = FR.mont_mul(
            jnp.concatenate([FR.ones((1,)), incl[:, :-1]], axis=1), pre_off)
        # suffix products: reverse local scan + reversed offsets
        rev = jnp.flip(safe, axis=1)
        rincl = jax.lax.associative_scan(FR.mont_mul, rev, axis=1)
        rtotal = rincl[:, -1:]
        rtotals = jax.lax.all_gather(rtotal, axis, axis=1, tiled=True)
        S = rtotals.shape[1]
        # suffix offset for shard my = product of totals of shards AFTER my
        rev_t = jnp.flip(rtotals, axis=1)
        suf_off = _excl_of_gathered(rev_t, S - 1 - my)
        suffix_excl = FR.mont_mul(
            jnp.flip(jnp.concatenate([FR.ones((1,)), rincl[:, :-1]], axis=1),
                     axis=1), suf_off)
        # grand total (same on every shard)
        grand = jax.lax.associative_scan(FR.mont_mul, totals, axis=1)[:, -1:]
        ginv = FR.inv(grand)
        inv = FR.mont_mul(FR.mont_mul(prefix_excl, suffix_excl), ginv)
        return FR.select(zero_mask, FR.zeros(x.shape[1:]), inv)

    inner = jax.jit(jax.shard_map(local, mesh=mesh, in_specs=P(None, axis),
                                  out_specs=P(None, axis), check_vma=False))

    def wrapper(x):
        with FR.pallas_disabled():
            return inner(x)

    return wrapper
