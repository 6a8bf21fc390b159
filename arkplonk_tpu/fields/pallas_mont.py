"""Pallas TPU kernel: fused Montgomery multiplication.

One Mosaic kernel per block replaces the ~50-op XLA subgraph (products,
constant-matrix dot, carry scans, conditional subtract) that jaxfield.py
emits per mont_mul.  Motivation (measured, see ROADMAP.md): steady-state
prove time on the tunnel TPU is dominated by per-kernel launch overhead,
and XLA-TPU compile time by the sheer number of generated kernels.

The kernel body is the same exact 16-bit-limb REDC as
`JaxField.mont_mul` — fully unrolled VPU ops on (L, BLOCK) u32 tiles:
  1. schoolbook columns of a*b via lo/hi-16 splits (all sums < 2^22)
  2. carry to 2L exact limbs
  3. m = T_lo * N' mod R (constant scalar muls)
  4. u = (T + m*N) / R, conditional subtract

Enabled automatically on TPU backends (ARKPLONK_PALLAS=0/1 overrides);
the jnp path remains for CPU tests and as the correctness reference.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

MASK16 = 0xFFFF
BLOCK = 512  # lanes per kernel invocation (multiple of 128)


def pallas_enabled() -> bool:
    env = os.environ.get("ARKPLONK_PALLAS")
    if env is not None:
        return env not in ("0", "false", "")
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _mont_constants(modulus: int, L: int):
    from .limb import to_limbs
    N = [int(x) for x in to_limbs(modulus, L)]
    R_full = 1 << (16 * L)
    NP = [int(x) for x in to_limbs((-pow(modulus, -1, R_full)) % R_full, L)]
    return N, NP


def mont_mul_tile(a, b, N, NP, L):
    """Unrolled 16-bit-limb REDC on (L, B) u32 tiles — the shared in-kernel
    primitive for the mont-mul and fused point kernels."""
    # 1. schoolbook columns of a*b (rows kept as (1, B))
    cols = [None] * (2 * L)

    def acc(k, v):
        cols[k] = v if cols[k] is None else cols[k] + v

    for i in range(L):
        p = a[i:i + 1] * b           # (L, B) u32, exact
        lo = p & MASK16
        hi = p >> 16
        for j in range(L):
            acc(i + j, lo[j:j + 1])
            if i + j + 1 < 2 * L:
                acc(i + j + 1, hi[j:j + 1])

    # 2. carry to exact 16-bit limbs T[0..2L)
    T = []
    c = jnp.zeros_like(a[0:1])
    for k in range(2 * L):
        s = cols[k] + c
        T.append(s & MASK16)
        c = s >> 16

    # 3. m = (T mod R) * N' mod R   (N' limbs are scalar constants)
    mcols = [None] * L
    for i in range(L):
        ti = T[i]
        for j in range(L - i):
            if NP[j] == 0:
                continue
            p = ti * NP[j]           # < 2^32, exact u32
            acc2 = p & MASK16
            mcols[i + j] = acc2 if mcols[i + j] is None \
                else mcols[i + j] + acc2
            if i + j + 1 < L:
                h = p >> 16
                mcols[i + j + 1] = h if mcols[i + j + 1] is None \
                    else mcols[i + j + 1] + h
    m = []
    c = jnp.zeros_like(a[0:1])
    for k in range(L):
        s = (mcols[k] if mcols[k] is not None
             else jnp.zeros_like(c)) + c
        m.append(s & MASK16)
        c = s >> 16

    # 4. u = (T + m*N) / R ; conditional subtract
    ucols = [t for t in T]
    for i in range(L):
        mi = m[i]
        for j in range(L):
            if N[j] == 0:
                continue
            p = mi * N[j]
            ucols[i + j] = ucols[i + j] + (p & MASK16)
            if i + j + 1 < 2 * L:
                ucols[i + j + 1] = ucols[i + j + 1] + (p >> 16)
    c = jnp.zeros_like(a[0:1])
    res = []
    for k in range(2 * L):
        s = ucols[k] + c
        if k >= L:
            res.append(s & MASK16)
        c = s >> 16
    # conditional subtract N (res < 2N)
    bor = jnp.zeros_like(a[0:1])
    diff = []
    for k in range(L):
        d = res[k] + jnp.uint32(0x10000 - N[k]) - bor
        diff.append(d & MASK16)
        bor = jnp.uint32(1) - (d >> 16)
    keep = bor.astype(bool)
    return jnp.concatenate(
        [jnp.where(keep, r, d) for r, d in zip(res, diff)], axis=0)


def add_tile(a, b, N, L):
    """(a + b) mod N on (L, B) tiles."""
    c = jnp.zeros_like(a[0:1])
    out = []
    for k in range(L):
        s = a[k:k + 1] + b[k:k + 1] + c
        out.append(s & MASK16)
        c = s >> 16
    return _cond_sub_tile(jnp.concatenate(out, axis=0), N, L)


def sub_tile(a, b, N, L):
    """(a - b) mod N on (L, B) tiles."""
    bor = jnp.zeros_like(a[0:1])
    d = []
    for k in range(L):
        t = a[k:k + 1] + jnp.uint32(0x10000) - b[k:k + 1] - bor
        d.append(t & MASK16)
        bor = jnp.uint32(1) - (t >> 16)
    dd = jnp.concatenate(d, axis=0)
    c = jnp.zeros_like(a[0:1])
    e = []
    for k in range(L):
        s = dd[k:k + 1] + jnp.uint32(N[k]) + c
        e.append(s & MASK16)
        c = s >> 16
    ee = jnp.concatenate(e, axis=0)
    return jnp.where(bor.astype(bool), ee, dd)


def _cond_sub_tile(a, N, L):
    bor = jnp.zeros_like(a[0:1])
    diff = []
    for k in range(L):
        d = a[k:k + 1] + jnp.uint32(0x10000 - N[k]) - bor
        diff.append(d & MASK16)
        bor = jnp.uint32(1) - (d >> 16)
    return jnp.where(bor.astype(bool), a, jnp.concatenate(diff, axis=0))


@functools.lru_cache(maxsize=None)
def _mont_kernel(modulus: int, L: int, interpret: bool):
    from jax.experimental import pallas as pl

    N, NP = _mont_constants(modulus, L)

    def kernel(a_ref, b_ref, o_ref):
        o_ref[...] = mont_mul_tile(a_ref[...], b_ref[...], N, NP, L)

    @jax.jit
    def call(a, b):  # (L, n) with n % BLOCK == 0
        n = a.shape[1]
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((L, n), jnp.uint32),
            grid=(n // BLOCK,),
            in_specs=[pl.BlockSpec((L, BLOCK), lambda i: (0, i)),
                      pl.BlockSpec((L, BLOCK), lambda i: (0, i))],
            out_specs=pl.BlockSpec((L, BLOCK), lambda i: (0, i)),
            interpret=interpret,
        )(a, b)

    return call


def mont_mul_pallas(field, a, b, interpret: bool = False):
    """Shape-flexible wrapper: broadcasts, flattens, pads to BLOCK,
    invokes the kernel, restores shape."""
    L = field.L
    shape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    a = jnp.broadcast_to(a, (L,) + shape)
    b = jnp.broadcast_to(b, (L,) + shape)
    n = 1
    for d in shape:
        n *= d
    af = a.reshape(L, n)
    bf = b.reshape(L, n)
    pad = (-n) % BLOCK
    if pad:
        af = jnp.concatenate([af, jnp.zeros((L, pad), jnp.uint32)], axis=1)
        bf = jnp.concatenate([bf, jnp.zeros((L, pad), jnp.uint32)], axis=1)
    out = _mont_kernel(field.modulus, L, interpret)(af, bf)
    if pad:
        out = out[:, :n]
    return out.reshape((L,) + shape)
