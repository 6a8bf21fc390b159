"""Device combine_split for the plookup round.

The reference's `MultiSet::combine_split` (multiset.rs:131-174) is an
order-preserving bucket concatenation of table t and query f, split
even/odd into h1/h2.  Round 1 ran it on host (two full decodes + Python
dict buckets + re-encode per prove — seconds at 2^18).

Device formulation (exact same output as the host golden path):
  1. lex-sort the 2n concatenated (value-limbs, t-position) tuples — the
     Montgomery limb representation is bijective, and only equality
     matters for grouping, so no decode is needed;
  2. mark group boundaries, broadcast each group's first t-position
     (= the bucket's first-appearance rank in t, the IndexMap order) via
     an associative segmented-fill scan;
  3. re-sort by rank (single u32 key, value limbs as payload) — the
     concatenation s in bucket order; within a bucket all values are
     equal so unstable sort order is irrelevant;
  4. h1 = s[0::2], h2 = s[1::2].

An f-value missing from t surfaces as a group whose first element is an
f element (rank sentinel >= n); returned as an error flag that the
caller maps to ElementNotIndexed (reference multiset.rs:149).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..fields.jaxfield import FR

U32 = jnp.uint32


@functools.lru_cache(maxsize=None)
def _combine_split_fn(n: int, mesh_axes=None):
    L = FR.L

    @jax.jit
    def f(t, fq):  # (L, n) Montgomery evals each
        if mesh_axes is not None:
            # the dual sort is gather-heavy; run it replicated (the XLA
            # partitioner would all-gather for the sort anyway) and let
            # the caller reshard the outputs
            from jax.sharding import NamedSharding, PartitionSpec as P
            rep = NamedSharding(mesh_axes[0], P())
            t = jax.sharding.reshard(t, rep)
            fq = jax.sharding.reshard(fq, rep)
        V = jnp.concatenate([t, fq], axis=1)           # (L, 2n)
        tpos = jnp.concatenate(
            [jnp.arange(n, dtype=U32), jnp.full((n,), 2 * n, U32)])
        # tpos participates as the last sort key so each group's first
        # element carries the group's minimal t-position.  The order
        # BETWEEN different values is irrelevant (the rank re-sort below
        # fixes the final order), only grouping + within-group tpos
        # order matter — so the sortnet's packed-word comparator is as
        # good as the native lexicographic one, without lax.sort's
        # minutes-long server-side first-execution codegen (sortnet.py).
        from ..poly import sortnet
        if sortnet.use_sortnet():
            words = sortnet.pack16([V[i] for i in range(L)][::-1])
            order = sortnet.argsort_words(tuple(words) + (tpos,))
            oidx = order.astype(jnp.int32)
            Vs = V[:, oidx]
            tp = tpos[oidx]
        else:
            ops = tuple(V[i] for i in range(L)) + (tpos,)
            sorted_ops = jax.lax.sort(ops, num_keys=L + 1)
            Vs = jnp.stack(sorted_ops[:L])             # (L, 2n)
            tp = sorted_ops[L]
        prev = jnp.concatenate(
            [jnp.full((L, 1), 0xFFFFFFFF, U32), Vs[:, :-1]], axis=1)
        boundary = jnp.any(Vs != prev, axis=0).astype(U32)

        def comb(a, b):
            fa, va = a
            fb, vb = b
            return fa | fb, jnp.where(fb != 0, vb, va)

        _flags, ranks = jax.lax.associative_scan(
            comb, (boundary, tp), axis=0)
        bad = jnp.any((boundary != 0) & (tp >= n))

        if sortnet.use_sortnet():
            order2 = sortnet.argsort_words((ranks,))   # index-stable
            S = Vs[:, order2.astype(jnp.int32)]        # (L, 2n)
        else:
            ops2 = (ranks,) + tuple(Vs[i] for i in range(L))
            sorted2 = jax.lax.sort(ops2, num_keys=1)
            S = jnp.stack(sorted2[1:])                 # (L, 2n)
        h1, h2 = S[:, 0::2], S[:, 1::2]
        if mesh_axes is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            sh = NamedSharding(mesh_axes[0], P(None, mesh_axes[1]))
            h1 = jax.sharding.reshard(h1, sh)
            h2 = jax.sharding.reshard(h2, sh)
        return h1, h2, bad

    return f


def combine_split_device(t_dev, f_dev, mesh_axes=None):
    """(h1, h2, bad_flag) device arrays for (L, n) t/f eval arrays."""
    n = t_dev.shape[1]
    return _combine_split_fn(n, mesh_axes)(t_dev, f_dev)
