"""Bitonic sorting network over u32 word-tuples.

Why not `jax.lax.sort`: on the tunneled TPU backend the native sort is
JIT-compiled SERVER-side at first execution, at a cost that scales with
n and operand count — measured 233 s for one (16, 32768) u32 sort and
~19 min for the 17-operand combine_split sort at 2^16; at 2^18 it
exceeds the remote-compile RPC limit and kills the connection
("Network Error: Unexpected EOF", the round-4/5 2^18 blocker).

A bitonic network is the TPU-shaped alternative: log2(n)·(log2(n)+1)/2
compare-exchange stages, each one vectorized gather + lexicographic
compare + select, all inside ONE `fori_loop` body — the compiled graph
is tiny and n-independent, first execution costs nothing special, and
steady state is latency-bound at a few ms per poly.

Determinism: a trailing index word breaks all ties, so the resulting
permutation equals numpy's/XLA's STABLE argsort for the same key tuple
(bitonic itself is unstable; with distinct keys order is total).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

U32 = jnp.uint32


def _stages(n: int):
    """(k, j) per bitonic stage for size n (power of two)."""
    ks, js = [], []
    k = 2
    while k <= n:
        j = k // 2
        while j >= 1:
            ks.append(k)
            js.append(j)
            j //= 2
        k *= 2
    return np.asarray(ks, np.uint32), np.asarray(js, np.uint32)


def sort_words(words):
    """Sort positions by the lexicographic order of `words`
    (most-significant word first), ties broken by position index.

    words: list of (..., n) u32 arrays sharing a shape; the last axis is
    sorted.  Returns the sorted word arrays PLUS the permutation as a
    final (..., n) u32 array (i.e. `order` such that out[w][..., i] =
    words[w][..., order[i]]).
    """
    n0 = words[0].shape[-1]
    n = max(2, 1 << (n0 - 1).bit_length())
    if n != n0:
        # pad to the next power of two with the maximal key: padded
        # entries sort AFTER every real entry (a real all-ones key ties
        # and wins on the index word), so out[..., :n0] is the answer
        pad = [(0, 0)] * (words[0].ndim - 1) + [(0, n - n0)]
        words = tuple(jnp.pad(w, pad, constant_values=np.uint32(0xFFFFFFFF))
                      for w in words)
    ks, js = (jnp.asarray(a) for a in _stages(n))
    iota = jax.lax.broadcasted_iota(U32, (n,), 0)
    state = tuple(words) + (jnp.broadcast_to(iota, words[0].shape),)
    W = len(state)

    def stage(s, st):
        k = ks[s]
        j = js[s]
        pidx = (iota ^ j).astype(jnp.int32)
        partner = tuple(jnp.take(a, pidx, axis=-1) for a in st)
        # lexicographic self > partner (msw first; index word last)
        gt = jnp.zeros(st[0].shape, bool)
        eq = jnp.ones(st[0].shape, bool)
        for a, b in zip(st, partner):
            gt = gt | (eq & (a > b))
            eq = eq & (a == b)
        asc = (iota & k) == 0           # ascending run?
        is_lo = (iota & j) == 0         # lower element of the pair?
        # ascending pair: lo keeps min, hi keeps max (descending flips)
        take_partner = jnp.where(is_lo == asc, gt, ~gt & ~eq)
        return tuple(jnp.where(take_partner, b, a)
                     for a, b in zip(st, partner))

    out = jax.lax.fori_loop(0, len(ks), stage, state, unroll=False)
    if n != n0:
        out = tuple(a[..., :n0] for a in out)
    return out[:W - 1] + (out[W - 1],)


def argsort_words(words):
    """Permutation only (stable argsort by the word tuple)."""
    return sort_words(words)[-1]


def pack16(limbs):
    """(2W, ..., n) arrays of 16-bit limbs -> W u32 words, element i
    packing (limbs[2i+1] << 16) | limbs[2i].  Any consistent total
    order works for grouping; this one keeps adjacent limbs together."""
    return [(limbs[i + 1] << 16) | limbs[i]
            for i in range(0, len(limbs), 2)]


@functools.lru_cache(maxsize=None)
def use_sortnet() -> bool:
    import os
    return os.environ.get("ARKPLONK_SORTNET", "1") not in ("0", "false", "")
