"""Device combine_split vs the host MultiSet golden path (exact order)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from arkplonk_tpu.circuit.lookup_table import MultiSet
from arkplonk_tpu.proving.device_lookup import combine_split_device
from arkplonk_tpu.fields.jaxfield import FR
from arkplonk_tpu.fields.host import R


def _check(t_vals, f_vals):
    t_dev = jnp.asarray(FR.encode(t_vals))
    f_dev = jnp.asarray(FR.encode(f_vals))
    h1, h2, bad = combine_split_device(t_dev, f_dev)
    assert not bool(jax.device_get(bad))
    exp1, exp2 = MultiSet(list(t_vals)).combine_split(MultiSet(list(f_vals)))
    assert FR.decode(h1) == exp1.elems
    assert FR.decode(h2) == exp2.elems


def test_combine_split_small_exact():
    t = [5, 5, 7, 3, 7, 7, 9, 5]
    f = [7, 5, 5, 3, 3, 9, 9, 7]
    _check(t, f)


def test_combine_split_random():
    rng = np.random.default_rng(3)
    n = 64
    pool = [int(x) for x in rng.integers(0, 50, 16)]
    t = [pool[i % len(pool)] for i in rng.integers(0, 16, n)]
    f = [t[i] for i in rng.integers(0, n, n)]
    _check(t, f)


def test_combine_split_big_values():
    rng = np.random.default_rng(4)
    vals = [int.from_bytes(rng.bytes(31), "little") % R for _ in range(8)]
    t = [vals[i % 8] for i in range(32)]
    f = [vals[(i * 3) % 8] for i in range(32)]
    _check(t, f)


def test_combine_split_missing_element_flag():
    t = [1, 2, 3, 4]
    f = [1, 2, 3, 99]  # 99 not in table
    t_dev = jnp.asarray(FR.encode(t))
    f_dev = jnp.asarray(FR.encode(f))
    _h1, _h2, bad = combine_split_device(t_dev, f_dev)
    assert bool(jax.device_get(bad))
