"""Vectorized Montgomery field arithmetic on uint32 limb arrays (JAX).

TPU-native replacement for the arkworks `ark-ff` Montgomery backend the
reference relies on (/root/reference/plonk-core/Cargo.toml:27-31 enables the
x86 `asm` feature); here the same role is played by VPU-vectorized limb
arithmetic that XLA fuses, with a Pallas kernel path for the hottest shapes.

Representation: ``(L, *batch)`` uint32 arrays, little-endian 16-bit limbs,
values kept in **Montgomery form** (x*R mod N, R = 2^(16 L)).

All ops are pure jnp and jittable; `FR` / `FQ` instances are module-level
singletons.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import bls12_381 as C
from .limb import W, MASK, n_limbs, to_limbs, vec_to_limbs, from_limbs, limbs_to_vec

U32 = jnp.uint32


class JaxField:
    """Montgomery arithmetic mod `modulus` over 16-bit limb arrays."""

    def __init__(self, modulus: int, name: str):
        self.name = name
        self.modulus = modulus
        self.L = L = n_limbs(modulus)
        self.R = 1 << (W * L)
        assert self.R > 2 * modulus
        self.R_mod = self.R % modulus
        self.R2_mod = self.R * self.R % modulus
        # N' = -N^{-1} mod R  (full-width Montgomery constant)
        self.nprime = (-pow(modulus, -1, self.R)) % self.R
        # host-side numpy constants (converted lazily by jnp)
        self.N_np = to_limbs(modulus, L)
        self.NPRIME_np = to_limbs(self.nprime, L)
        self.R2_np = to_limbs(self.R2_mod, L)
        self.ONE_np = to_limbs(self.R_mod, L)  # 1 in Montgomery form
        self.ZERO_np = np.zeros((L,), dtype=np.uint32)

    # ---- host codecs ------------------------------------------------------

    def encode(self, xs) -> np.ndarray:
        """Python ints -> Montgomery-form limb array.

        Scalar int -> (L,); iterable -> (L, n)."""
        if isinstance(xs, int):
            return to_limbs(xs * self.R_mod % self.modulus, self.L)
        return vec_to_limbs([x * self.R_mod % self.modulus for x in xs], self.L)

    def decode(self, a) -> "int | list[int]":
        """Montgomery-form limb array -> Python ints."""
        a = np.asarray(jax.device_get(a))
        rinv = pow(self.R_mod, -1, self.modulus)
        if a.ndim == 1:
            return from_limbs(a) * rinv % self.modulus
        shape = a.shape[1:]
        vals = [v * rinv % self.modulus for v in limbs_to_vec(a.reshape(self.L, -1))]
        if len(shape) == 1:
            return vals
        return np.array(vals, dtype=object).reshape(shape)

    def zeros(self, shape=()) -> jnp.ndarray:
        return jnp.zeros((self.L,) + tuple(shape), dtype=U32)

    def ones(self, shape=()) -> jnp.ndarray:
        one = jnp.asarray(self.ONE_np, dtype=U32)
        return jnp.broadcast_to(one.reshape((self.L,) + (1,) * len(shape)),
                                (self.L,) + tuple(shape))

    # ---- limb helpers -----------------------------------------------------

    def _carry(self, cols, out_len):
        """Propagate 16-bit carries through column accumulators.

        cols: (ncols, ...) uint32 array (each entry < 2^31). Returns
        (out_len, ...) array of 16-bit limbs. Carry past out_len is dropped
        (caller guarantees it is zero)."""
        ncols = cols.shape[0]
        out = []
        c = jnp.zeros(cols.shape[1:], dtype=U32)
        for k in range(out_len):
            s = (cols[k] + c) if k < ncols else c
            out.append(s & MASK)
            c = s >> W
        return jnp.stack(out, axis=0)

    def _mul_cols(self, a, b, trunc=None):
        """Schoolbook column accumulators of a*b (no scatters).

        a: (La, ...), b: (Lb, ...) limb arrays (16-bit clean).
        Returns (ncols, ...) array of column sums, each < 2^22, where
        ncols = La+Lb+1 (or `trunc`).  Column k holds
        sum_{i+j=k} lo(a_i*b_j) + sum_{i+j=k-1} hi(a_i*b_j).
        """
        La, Lb = a.shape[0], b.shape[0]
        ncols = (La + Lb + 1) if trunc is None else trunc
        shape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
        # all partial products in one broadcast multiply: (La, Lb, ...)
        P = a[:, None] * b[None, :]
        lo = P & MASK
        hi = P >> W
        pad_width = [(0, 0)] * (len(shape) + 1)
        acc = jnp.zeros((ncols,) + shape, dtype=U32)
        for i in range(La):
            if trunc is not None and i >= ncols:
                break
            # row i of lo occupies columns i..i+Lb-1 ; hi -> i+1..i+Lb
            row_lo, row_hi = lo[i], hi[i]
            lo_pad = list(pad_width)
            lo_pad[0] = (i, max(ncols - i - Lb, 0))
            row = jnp.pad(row_lo[:ncols - i] if trunc is not None else row_lo,
                          lo_pad)
            acc = acc + row[:ncols]
            if i + 1 < ncols:
                hi_pad = list(pad_width)
                hi_pad[0] = (i + 1, max(ncols - i - 1 - Lb, 0))
                rowh = jnp.pad(row_hi[:ncols - i - 1] if trunc is not None else row_hi,
                               hi_pad)
                acc = acc + rowh[:ncols]
        return acc

    # ---- core ops ---------------------------------------------------------

    def _cond_sub_n(self, a):
        """a - N if a >= N else a, for a < 2N given as (L, ...) 16-bit limbs."""
        N = self.N_np
        bor = jnp.zeros(a.shape[1:], dtype=U32)
        diff = []
        for k in range(self.L):
            d = a[k] + U32(0x10000 - int(N[k])) - bor
            diff.append(d & MASK)
            bor = U32(1) - (d >> W)
        # bor == 1  =>  a < N  => keep a
        keep = bor.astype(bool)
        diff = jnp.stack(diff, axis=0)
        return jnp.where(keep[None], a, diff)

    def add(self, a, b):
        c = jnp.zeros(jnp.broadcast_shapes(a.shape[1:], b.shape[1:]), dtype=U32)
        out = []
        for k in range(self.L):
            s = a[k] + b[k] + c
            out.append(s & MASK)
            c = s >> W
        # a+b < 2N < R so the final carry is 0
        return self._cond_sub_n(jnp.stack(out, axis=0))

    def sub(self, a, b):
        # d = a - b (mod R) with borrow flag; if a < b add N back.
        shape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
        bor = jnp.zeros(shape, dtype=U32)
        d = []
        for k in range(self.L):
            t = a[k] + U32(0x10000) - b[k] - bor
            d.append(t & MASK)
            bor = U32(1) - (t >> W)
        d = jnp.stack(d, axis=0)
        # e = d + N (mod R): when a<b, d = a-b+R and e wraps to a-b+N < N.
        c = jnp.zeros(shape, dtype=U32)
        e = []
        for k in range(self.L):
            s = d[k] + U32(int(self.N_np[k])) + c
            e.append(s & MASK)
            c = s >> W
        e = jnp.stack(e, axis=0)
        return jnp.where(bor.astype(bool)[None], e, d)

    def neg(self, a):
        z = self.is_zero(a)
        N = jnp.asarray(self.N_np, dtype=U32).reshape((self.L,) + (1,) * (a.ndim - 1))
        bor = jnp.zeros(a.shape[1:], dtype=U32)
        out = []
        for k in range(self.L):
            d = N[k] + U32(0x10000) - a[k] - bor
            out.append(d & MASK)
            bor = U32(1) - (d >> W)
        res = jnp.stack(out, axis=0)
        return jnp.where(z[None], jnp.zeros_like(res), res)

    def mont_mul(self, a, b):
        """Montgomery product: (a * b * R^{-1}) mod N, inputs/outputs Montgomery form."""
        L = self.L
        # T = a*b as 2L columns -> carried limbs
        t_cols = self._mul_cols(a, b)
        T = self._carry(t_cols, 2 * L)  # < N^2 < R*N, fits exactly 2L limbs
        # m = (T mod R) * N' mod R
        NP = jnp.asarray(self.NPRIME_np, dtype=U32).reshape((L,) + (1,) * (T.ndim - 1))
        m = self._carry(self._mul_cols(T[:L], NP, trunc=L), L)
        # u = (T + m*N) / R ; low L limbs cancel to zero
        Nl = jnp.asarray(self.N_np, dtype=U32).reshape((L,) + (1,) * (T.ndim - 1))
        mn_cols = self._mul_cols(m, Nl)
        u_cols = mn_cols[:2 * L] + T  # columns stay < 2^22 + 2^16 < 2^31
        u = self._carry(u_cols, 2 * L)
        # (T + m*N) < 2*R*N fits 2L limbs; result (T+mN)/R < 2N < R.
        return self._cond_sub_n(u[L:2 * L])

    def mont_sqr(self, a):
        return self.mont_mul(a, a)

    def mul_const(self, a, k: int):
        """Multiply by a small host constant k (plain int, not Montgomery)."""
        km = jnp.asarray(self.encode(k % self.modulus), dtype=U32)
        km = km.reshape((self.L,) + (1,) * (a.ndim - 1))
        return self.mont_mul(a, km)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=0)

    def equal(self, a, b):
        return jnp.all(a == b, axis=0)

    def select(self, mask, a, b):
        """mask: bool over element shape; where(mask, a, b)."""
        return jnp.where(mask[None], a, b)

    def pow_fixed(self, a, e: int):
        """a^e for a static integer exponent, via fori_loop (compact graph)."""
        if e == 0:
            return self.ones(a.shape[1:])
        bits = [int(bi) for bi in bin(e)[2:]]
        bits_arr = jnp.asarray(np.array(bits, dtype=np.uint32))

        def body(i, acc):
            acc = self.mont_sqr(acc)
            mul = self.mont_mul(acc, a)
            return self.select(bits_arr[i] == 1, mul, acc)

        # first bit is always 1: start from a
        return jax.lax.fori_loop(1, len(bits), body, a) if len(bits) > 1 else a

    def inv(self, a):
        """Pointwise inverse via Fermat (a^(N-2)); zero maps to zero."""
        return self.pow_fixed(a, self.modulus - 2)

    def batch_inv_scan(self, a):
        """Batch inversion of a (L, n) vector via prefix products + one
        Fermat inverse + suffix walk. Zero entries map to zero.
        O(n) mont_muls + one pow; far cheaper than pointwise `inv`."""
        n = a.shape[1]
        one = self.ones((n,))
        safe = self.select(self.is_zero(a), one, a)
        # inclusive prefix products P_i = safe_0 * ... * safe_i
        prods = jax.lax.associative_scan(
            lambda x, y: self.mont_mul(x, y), safe, axis=1)
        total_inv = self.inv(prods[:, -1:])
        # walk backwards: inv_i = P_{i-1} * Tinv_i ; Tinv_{i-1} = Tinv_i * safe_i
        shifted = jnp.concatenate([self.ones((1,)), prods[:, :-1]], axis=1)
        # suffix products of safe from i+1..end:
        rev = jnp.flip(safe, axis=1)
        suf = jax.lax.associative_scan(lambda x, y: self.mont_mul(x, y), rev, axis=1)
        suf = jnp.flip(suf, axis=1)  # suf_i = safe_i * ... * safe_{n-1}
        suf_excl = jnp.concatenate([suf[:, 1:], self.ones((1,))], axis=1)
        inv_each = self.mont_mul(self.mont_mul(shifted, suf_excl), total_inv)
        return self.select(self.is_zero(a), self.zeros((n,)), inv_each)


FR = JaxField(C.R_MOD, "Fr")
FQ = JaxField(C.Q_MOD, "Fq")
