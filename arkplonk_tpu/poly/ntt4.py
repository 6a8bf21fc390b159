"""Four-step (Bailey) NTT with fused in-VMEM radix-128 Pallas kernels.

The round-1 device NTT (poly/ntt.py `_ntt_core`) runs one XLA butterfly
stage per fori iteration: every stage pays a Pallas mont-mul launch
(~1.8 ms on this backend) plus a full HBM round trip of the operand —
at 4n = 2^20 with a 12-poly batch that is ~20 launches and ~70 GB of
traffic per NTT call.

This module computes the same exact transform as n = 128^d * k
recursion (SURVEY §2.3.2 / §7 "four-step distributed NTT" plan):

    NTT_n(x) :  view (n1=128, n2) row-major
                -> NTT_128 along the strided axis   (ONE kernel call)
                -> twiddle by w_n^(i2*k1)           (one mont-mul call)
                -> NTT_{n2} along rows               (recurse)
                -> transpose                         (XLA, bandwidth-cheap)

The radix-128 kernel runs all log2(128) butterfly stages on VMEM-resident
(L, 8, 128) tiles: the transform axis lives in the 128 lanes (butterflies
= lane rotations + selects), batch in sublanes x grid, so every element
is loaded from HBM exactly once per level.  Transforms of size k < 128
pack 128/k per lane row (lane rotations never cross k-blocks since
partner = j XOR h with h < k).

Outputs are bit-for-bit the same field elements as poly/ntt.py; the
equivalence tests run the kernels in interpret mode on CPU.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import host
from ..fields.jaxfield import FR, U32
from ..fields.limb import encode_ints
from ..fields.pallas_mont import (
    mont_mul_tile, add_tile, sub_tile, _mont_constants,
)

KMAX = 128
S_SUB = 8


def _enc(xs):
    # numpy (NOT jnp): these feed lru_cached tables that may be built
    # while tracing — caching a tracer would leak it across jits.
    return np.asarray(encode_ints([x * FR.R_mod % host.R for x in xs],
                                  FR.L))


def _bitrev(i, k):
    return int(bin(i)[2:].zfill(k)[::-1], 2)


@functools.lru_cache(maxsize=None)
def _stage_tables(k: int, inverse: bool):
    """Per-stage lane twiddle rows (L, log2 k, 128) + packed bitrev index
    (128,) for size-k transforms packed 128//k per lane row."""
    lg = k.bit_length() - 1
    n_full = host.Domain(k) if k > 1 else None
    w = pow(n_full.group_gen_inv if inverse else n_full.group_gen, 1, host.R)
    rows = []
    for s in range(lg):
        h = 1 << s
        row = []
        for j in range(KMAX):
            jk = j % k
            exp = (jk % h) * (k // (2 * h)) if h > 0 else 0
            row.append(pow(w, exp, host.R))
        rows.append(row)
    tw = np.stack([_enc(r) for r in rows], axis=1)  # (L, lg, 128)
    brev = np.zeros(KMAX, dtype=np.int32)
    for j in range(KMAX):
        blk = (j // k) * k
        brev[j] = blk + _bitrev(j % k, lg)
    return tw, brev


@functools.lru_cache(maxsize=None)
def _ntt_kernel(k: int, interpret: bool):
    """Full size-k (k <= 128) DIT NTT along the lane axis; input must be
    in (packed) bit-reversed order."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L = FR.L
    N, NP = _mont_constants(FR.modulus, L)
    lg = k.bit_length() - 1

    def kernel(tw_ref, x_ref, o_ref):
        x = x_ref[...]
        lane = jax.lax.broadcasted_iota(jnp.uint32, (S_SUB, KMAX), 1)
        for s in range(lg):
            h = 1 << s
            bit = (lane & h) != 0
            xm = pltpu.roll(x, KMAX - h, axis=2)   # x[j+h] (lane rotate)
            xp = pltpu.roll(x, h, axis=2)          # x[j-h]
            partner = jnp.where(bit[None], xp, xm)
            u = jnp.where(bit[None], partner, x)
            v = jnp.where(bit[None], x, partner)
            twr = tw_ref[:, s][:, None, :]    # (L, 1, 128)
            t = mont_mul_tile(v, jnp.broadcast_to(twr, v.shape), N, NP, L)
            sm = add_tile(u, t, N, L)
            df = sub_tile(u, t, N, L)
            x = jnp.where(bit[None], df, sm)
        o_ref[...] = x

    @jax.jit
    def call(tw, x):  # x: (L, batch, 128), batch % 8 == 0
        batch = x.shape[1]
        xspec = pl.BlockSpec((L, S_SUB, KMAX), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
        tspec = pl.BlockSpec((L, lg, KMAX), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((L, batch, KMAX), U32),
            grid=(batch // S_SUB,),
            in_specs=[tspec, xspec],
            out_specs=xspec,
            interpret=interpret,
        )(tw, x)

    return call


def _level_twiddle(roots, N: int, m: int, n1: int):
    """(L, n2, n1) twiddles w_m^(i2*k1), gathered at runtime from the
    full top-level (L, N) root table (stride N//m).  Gathering instead
    of baking a host table keeps the table out of the executable (a
    closed-over (L, 2^20) table is ~128 MB of HLO literal text)."""
    n2 = m // n1
    stride = N // m
    i2 = jax.lax.broadcasted_iota(jnp.uint32, (n2, n1), 0)
    k1 = jax.lax.broadcasted_iota(jnp.uint32, (n2, n1), 1)
    # (i2*stride) < N <= 2^24 and k1 < 128 keep the product below 2^32
    exp = ((i2 * jnp.uint32(stride)) % jnp.uint32(N) * k1) % jnp.uint32(N)
    return roots[:, exp.astype(jnp.int32)]  # (L, n2, n1)


def _ntt_last_axis(x, n: int, inverse: bool, interpret: bool,
                   roots, N: int):
    """Exact NTT along the last axis of (L, B, n), natural in/out.
    `roots` is the top-level (L, N) (inverse-)root table; the recursion
    reads its levels' twiddles through strided gathers."""
    L, Bb, _ = x.shape
    if n <= KMAX:
        tw, brev = _stage_tables(n, inverse)
        packed = n < KMAX
        if packed:
            # pack 128//n transforms per lane row
            per = KMAX // n
            pad_b = (-Bb * n) % KMAX
            flat = x.reshape(L, Bb * n)
            if pad_b:
                flat = jnp.concatenate(
                    [flat, jnp.zeros((L, pad_b), U32)], axis=1)
            rows = flat.shape[1] // KMAX
            v = flat.reshape(L, rows, KMAX)
        else:
            v = x
            rows = Bb
        pad_r = (-rows) % S_SUB
        if pad_r:
            v = jnp.concatenate(
                [v, jnp.zeros((L, pad_r, KMAX), U32)], axis=1)
        v = v[:, :, brev]
        out = _ntt_kernel(n, interpret)(tw, v)
        if pad_r:
            out = out[:, :rows]
        if packed:
            out = out.reshape(L, -1)[:, :Bb * n].reshape(L, Bb, n)
        return out
    n1 = KMAX
    n2 = n // n1
    v = x.reshape(L, Bb, n1, n2).transpose(0, 1, 3, 2)   # (L,B,n2,n1)
    v = _ntt_last_axis(v.reshape(L, Bb * n2, n1), n1, inverse, interpret,
                       roots, N)
    v = v.reshape(L, Bb, n2, n1)
    tw = _level_twiddle(roots, N, n, n1)                 # (L, n2, n1)
    v = FR.mont_mul(v, tw[:, None])
    v = v.transpose(0, 1, 3, 2)                          # (L,B,n1,n2)
    v = _ntt_last_axis(v.reshape(L, Bb * n1, n2), n2, inverse, interpret,
                       roots, N)
    v = v.reshape(L, Bb, n1, n2).transpose(0, 1, 3, 2)   # (L,B,n2,n1)
    return v.reshape(L, Bb, n)


MIN_N = 8192  # measured crossover vs the per-stage path (v5e: 2^12
              # per-stage 13.9ms vs 22.0ms; 2^14 40.3ms vs 11.2ms)


def supported(n: int, mesh_axes) -> bool:
    from ..curve import pallas_jac
    return (mesh_axes is None and n >= MIN_N and n % KMAX == 0
            and pallas_jac.use_pallas())


def ntt(x, dd, interpret: bool = False):
    """Forward NTT (natural->natural), same results as ntt.ntt."""
    shape = x.shape
    n = shape[-1]
    v = x.reshape(FR.L, -1, n)
    out = _ntt_last_axis(v, n, False, interpret, dd.roots, dd.n)
    return out.reshape(shape)


def intt(x, dd, interpret: bool = False):
    shape = x.shape
    n = shape[-1]
    v = x.reshape(FR.L, -1, n)
    out = _ntt_last_axis(v, n, True, interpret, dd.roots_inv, dd.n)
    n_inv = dd.n_inv.reshape((FR.L,) + (1,) * (out.ndim - 1))
    return FR.mont_mul(out, n_inv).reshape(shape)
