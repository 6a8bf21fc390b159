"""Pallas TPU field kernels, round-2 layout rewrite: (L, 8, 128) slabs.

Round 1 laid kernel blocks out as (L, BLOCK): every per-limb row op ran
on a (1, BLOCK) value, which Mosaic tiles at 1/8 sublane utilization —
7/8 of the VPU idle on the hottest code in the prover.  Honest
readback-timed measurement (round 2, see perf.py) put Fq mont-mul at
~85 M/s on the v5e chip.

This module re-runs the SAME proven limb algebra (pallas_mont.mont_mul_tile
is shape-agnostic) on a ``(L, sublane=8, lane=128)`` tile: the batch
occupies a full (8, 128) vreg per limb row, so every row op is one fully
utilized VPU op — an ~8x utilization win with no algorithm change.

Host arrays stay (L, n); `pack`/`unpack` are free XLA reshapes
(row-major (L, n) -> (L, 8, n/8)), padding to BLOCK = 1024.

Replaces the arkworks `ark-ff` Montgomery backend the reference leans on
(plonk-core/Cargo.toml:27-31, `asm` feature).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .pallas_mont import (  # shape-agnostic tile algebra (16-bit limbs)
    mont_mul_tile, add_tile, sub_tile, _cond_sub_tile, _mont_constants,
)

import os

S_SUB = 8
LANES = int(os.environ.get("ARKPLONK_PALLAS_LANES", "512"))
BLOCK = S_SUB * LANES  # batch elements per grid step

U32 = jnp.uint32


# ---------------------------------------------------------------------------
# layout helpers
# ---------------------------------------------------------------------------

def pack(x, npad: int):
    """(L, n) -> (L, S, npad//S) with zero padding (npad % BLOCK == 0)."""
    L, n = x.shape
    if n < npad:
        x = jnp.concatenate([x, jnp.zeros((L, npad - n), U32)], axis=1)
    return x.reshape(L, S_SUB, npad // S_SUB)


def unpack(y, n: int):
    """(L, S, T) -> (L, n)."""
    return y.reshape(y.shape[0], -1)[:, :n]


def padded(n: int) -> int:
    return max(BLOCK, ((n + BLOCK - 1) // BLOCK) * BLOCK)


# ---------------------------------------------------------------------------
# standalone mont-mul kernel
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _mont_kernel(modulus: int, L: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, NP = _mont_constants(modulus, L)

    def kernel(a_ref, b_ref, o_ref):
        o_ref[...] = mont_mul_tile(a_ref[...], b_ref[...], N, NP, L)

    @jax.jit
    def call(a, b):  # (L, S, T), T % LANES == 0
        T = a.shape[2]
        spec = pl.BlockSpec((L, S_SUB, LANES), lambda i: (0, 0, i),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((L, S_SUB, T), U32),
            grid=(T // LANES,),
            in_specs=[spec, spec],
            out_specs=spec,
            interpret=interpret,
        )(a, b)

    return call


def mont_mul_pallas2(field, a, b, interpret: bool = False):
    """Drop-in mont_mul: broadcasts, packs to the slab layout, runs the
    kernel, restores shape.  a, b: (L, ...) u32 Montgomery limbs."""
    L = field.L
    shape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    a = jnp.broadcast_to(a, (L,) + shape)
    b = jnp.broadcast_to(b, (L,) + shape)
    n = 1
    for d in shape:
        n *= d
    npad = padded(n)
    af = pack(a.reshape(L, n), npad)
    bf = pack(b.reshape(L, n), npad)
    out = _mont_kernel(field.modulus, L, interpret)(af, bf)
    return unpack(out, n).reshape((L,) + shape)
