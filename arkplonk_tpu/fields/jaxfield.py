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

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .host import C
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
        self._jit_cache = {}
        self._pallas_off = False
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

    def to_mont(self, raw):
        """Raw (plain-integer) limbs -> Montgomery form (device op)."""
        R2 = jnp.asarray(self.R2_np, dtype=U32).reshape(
            (self.L,) + (1,) * (raw.ndim - 1))
        return self.mont_mul(raw, R2)

    def from_mont(self, a):
        """Montgomery form -> raw limbs (device op)."""
        one = jnp.zeros((self.L,) + (1,) * (a.ndim - 1), dtype=U32)
        one = one.at[0].set(1)
        return self.mont_mul(a, one)

    def _jitted(self, name):
        fn = self._jit_cache.get(name)
        if fn is None:
            fn = jax.jit(getattr(self, name))
            self._jit_cache[name] = fn
        return fn

    def encode_fast(self, xs) -> jnp.ndarray:
        """ints -> Montgomery limb array via the bytes fast path + device
        to_mont. Returns (L, n) device array."""
        from .limb import encode_ints
        raw = jnp.asarray(encode_ints([x % self.modulus for x in xs], self.L))
        return self._jitted("to_mont")(raw)

    def decode_fast(self, a) -> list:
        """Montgomery limb array -> ints via device from_mont + bytes."""
        from .limb import decode_ints
        raw = jax.device_get(self._jitted("from_mont")(a))
        return decode_ints(raw)

    def zeros(self, shape=()) -> jnp.ndarray:
        return jnp.zeros((self.L,) + tuple(shape), dtype=U32)

    def ones(self, shape=()) -> jnp.ndarray:
        one = jnp.asarray(self.ONE_np, dtype=U32)
        return jnp.broadcast_to(one.reshape((self.L,) + (1,) * len(shape)),
                                (self.L,) + tuple(shape))

    # ---- limb helpers -----------------------------------------------------

    @functools.cached_property
    def _conv_matrix(self):
        """Constant (2L, 2L^2) f32 0/1 matrix turning the flattened lo||hi
        partial-product tensor into schoolbook column sums via ONE dot.

        Column sums stay < 2^21 < 2^24, so f32 accumulation is exact; on
        TPU the dot rides the MXU instead of a pad/add chain on the VPU."""
        L = self.L
        T = np.zeros((2 * L, 2 * L * L), dtype=np.float32)
        for i in range(L):
            for j in range(L):
                k = i + j
                T[k, i * L + j] = 1.0              # lo contribution
                if k + 1 < 2 * L:
                    T[k + 1, L * L + i * L + j] = 1.0  # hi contribution
        return T

    def _mul_cols(self, a, b, trunc=None):
        """Schoolbook column accumulators of a*b.

        a, b: (L, ...) limb arrays (16-bit clean). Returns (2L, ...) uint32
        column sums (each < 2^22); column k = sum_{i+j=k} lo(a_i b_j)
        + sum_{i+j=k-1} hi(a_i b_j). `trunc` slices the output columns."""
        L = self.L
        assert a.shape[0] == L and b.shape[0] == L
        shape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
        P = a[:, None] * b[None, :]          # (L, L, ...) u32 products
        lo = (P & MASK).astype(jnp.float32)
        hi = (P >> W).astype(jnp.float32)
        stacked = jnp.concatenate(
            [lo.reshape((L * L,) + shape), hi.reshape((L * L,) + shape)],
            axis=0)
        # Precision.HIGHEST: on TPU this is the bf16x6 decomposition, which
        # is EXACT here — inputs are integers < 2^16 (exactly split into
        # 3 bf16 terms) and all partial sums are integers < 2^24, exact in
        # f32. The default (bf16 truncation) is NOT exact.
        cols = jax.lax.dot_general(
            self._conv_matrix, stacked,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        cols = cols.astype(U32)
        if trunc is not None:
            cols = cols[:trunc]
        return cols

    def _carry(self, cols, out_len):
        """Propagate 16-bit carries through column accumulators.

        cols: (ncols, ...) uint32 array (each entry < 2^31). Returns
        (out_len, ...) array of 16-bit limbs via one lax.scan (compact
        graph). Carry past out_len is dropped (caller guarantees zero)."""
        ncols = cols.shape[0]
        if ncols < out_len:
            cols = jnp.concatenate(
                [cols, jnp.zeros((out_len - ncols,) + cols.shape[1:], U32)],
                axis=0)
        else:
            cols = cols[:out_len]

        def step(c, col):
            s = col + c
            return s >> W, s & MASK

        _, out = jax.lax.scan(step, jnp.zeros(cols.shape[1:], U32), cols)
        return out

    # ---- core ops ---------------------------------------------------------

    def _scan_sub(self, a, b):
        """(a - b) mod R limbwise + final borrow flag; one lax.scan."""
        shape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])

        def step(bor, ab):
            ak, bk = ab
            t = ak + U32(0x10000) - bk - bor
            return U32(1) - (t >> W), t & MASK

        a = jnp.broadcast_to(a, (self.L,) + shape)
        b = jnp.broadcast_to(b, (self.L,) + shape)
        bor, d = jax.lax.scan(step, jnp.zeros(shape, U32), (a, b))
        return d, bor

    def _scan_add(self, a, b):
        """(a + b) limbwise mod R (carry out dropped); one lax.scan."""
        shape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])

        def step(c, ab):
            ak, bk = ab
            s = ak + bk + c
            return s >> W, s & MASK

        a = jnp.broadcast_to(a, (self.L,) + shape)
        b = jnp.broadcast_to(b, (self.L,) + shape)
        _, out = jax.lax.scan(step, jnp.zeros(shape, U32), (a, b))
        return out

    def _n_limbs_bcast(self, ndim):
        return jnp.asarray(self.N_np, dtype=U32).reshape(
            (self.L,) + (1,) * (ndim - 1))

    def _cond_sub_n(self, a):
        """a - N if a >= N else a, for a < 2N given as (L, ...) 16-bit limbs."""
        diff, bor = self._scan_sub(a, self._n_limbs_bcast(a.ndim))
        # bor == 1  =>  a < N  => keep a
        return jnp.where(bor.astype(bool)[None], a, diff)

    def add(self, a, b):
        # a+b < 2N < R so the final carry is 0
        return self._cond_sub_n(self._scan_add(a, b))

    def sub(self, a, b):
        # d = a - b (mod R) with borrow flag; if a < b add N back.
        d, bor = self._scan_sub(a, b)
        e = self._scan_add(d, self._n_limbs_bcast(d.ndim))
        return jnp.where(bor.astype(bool)[None], e, d)

    def neg(self, a):
        z = self.is_zero(a)
        res, _ = self._scan_sub(self._n_limbs_bcast(a.ndim), a)
        return jnp.where(z[None], jnp.zeros_like(res), res)

    def pallas_disabled(self):
        """Context manager: force the jnp path while tracing (needed for
        auto-sharded graphs where a pallas_call cannot be partitioned)."""
        import contextlib

        @contextlib.contextmanager
        def _ctx():
            prev = self._pallas_off
            self._pallas_off = True
            try:
                yield
            finally:
                self._pallas_off = prev

        return _ctx()

    def mont_mul(self, a, b):
        """Montgomery product: (a * b * R^{-1}) mod N, inputs/outputs
        Montgomery form. Dispatches to the fused Pallas kernel on TPU
        backends (fields/pallas_mont.py), else the jnp graph below."""
        if not self._pallas_off:
            from . import pallas_mont
            if pallas_mont.pallas_enabled():
                return pallas_mont.mont_mul_pallas(self, a, b)
        return self._mont_mul_jnp(a, b)

    def _mont_mul_jnp(self, a, b):
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
