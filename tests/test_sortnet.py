"""Bitonic sortnet == stable argsort (the lax.sort replacement)."""

import numpy as np
import pytest

import jax.numpy as jnp

from arkplonk_tpu.poly import sortnet

RNG = np.random.default_rng(0xB170)


@pytest.mark.parametrize("n", [2, 8, 64, 1024])
def test_single_word_matches_stable_argsort(n):
    keys = RNG.integers(0, 16, size=n, dtype=np.uint32)  # many ties
    order = np.asarray(sortnet.argsort_words((jnp.asarray(keys),)))
    want = np.argsort(keys, kind="stable")
    assert order.tolist() == want.tolist()
    skey = np.asarray(sortnet.sort_words((jnp.asarray(keys),))[0])
    assert skey.tolist() == np.sort(keys).tolist()


def test_batched_rows_sort_independently():
    keys = RNG.integers(0, 2**32, size=(5, 256), dtype=np.uint32)
    out = np.asarray(sortnet.sort_words((jnp.asarray(keys),))[0])
    assert out.tolist() == np.sort(keys, axis=-1).tolist()


def test_multi_word_lexicographic():
    n = 512
    hi = RNG.integers(0, 4, size=n, dtype=np.uint32)
    lo = RNG.integers(0, 4, size=n, dtype=np.uint32)
    order = np.asarray(
        sortnet.argsort_words((jnp.asarray(hi), jnp.asarray(lo))))
    want = np.lexsort((np.arange(n), lo, hi))  # last key is primary
    assert order.tolist() == want.tolist()


def test_pack16_is_injective():
    limbs = [jnp.asarray(RNG.integers(0, 2**16, size=64, dtype=np.uint32))
             for _ in range(16)]
    words = sortnet.pack16(limbs)
    assert len(words) == 8
    vals = np.stack([np.asarray(w) for w in words])
    # distinct columns stay distinct
    cols = {tuple(vals[:, i]) for i in range(64)}
    orig = {tuple(int(np.asarray(l)[i]) for l in limbs) for i in range(64)}
    assert len(cols) == len(orig)


@pytest.mark.parametrize("n", [3, 100, 1000])
def test_non_power_of_two_padding(n):
    keys = RNG.integers(0, 8, size=n, dtype=np.uint32)
    order = np.asarray(sortnet.argsort_words((jnp.asarray(keys),)))
    want = np.argsort(keys, kind="stable")
    assert order.tolist() == want.tolist()
    skey = np.asarray(sortnet.sort_words((jnp.asarray(keys),))[0])
    assert skey.tolist() == np.sort(keys).tolist()
