"""Device Pippenger multi-scalar multiplication.

TPU-native replacement for arkworks `VariableBaseMSM::multi_scalar_mul`
(reference commitment.rs:36-47) following SURVEY.md §2.2 / §7.3: the
bucket scatter (memory-random on CPU/GPU) is reformulated sort-free-ish as
sort + segmented associative scan + searchsorted gather — all primitives
that map onto the TPU.

Per window of c bits:
  1. digits d_i from the scalar limb matrix
  2. stable argsort by digit; gather points into sorted order
  3. segmented inclusive scan (combine = jac_add, reset across segments)
  4. bucket totals gathered at segment ends via searchsorted
  5. weighted bucket reduction sum_b b*S_b via a reversed scan of suffix
     sums + tree reduction
Window results are recombined on host (255 cheap point doublings).

Multi-chip sharding (BASELINE: "points partitioned across chips, bucket
sums reduced via psum") happens one level up in mesh/sharding.py by
sharding the point axis and jac-adding the per-shard results.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..fields.jaxfield import FQ, U32
from ..fields.limb import W as LIMB_BITS
from ..fields.host import R
from . import g1_jax as g1
from . import host as cv

def pick_window(n: int) -> int:
    """Pippenger window size ~ log2(n), aligned to 16-bit limb splits."""
    if n >= 1 << 14:
        return 16
    if n >= 1 << 7:
        return 8
    return 4


def scalars_to_digits(scalars, window: int) -> np.ndarray:
    """Host ints -> (num_windows, n) int32 digit matrix."""
    from ..fields.limb import encode_ints
    raw = encode_ints([s % R for s in scalars], 16)  # (16, n) 16-bit limbs
    if window == 16:
        return raw.astype(np.int32)
    per = 16 // window
    mask = (1 << window) - 1
    parts = [(raw >> (window * k)) & mask for k in range(per)]
    # interleave: window w of scalar = limb w//per, sub-digit w%per
    out = np.empty((16 * per, raw.shape[1]), dtype=np.int32)
    for limb in range(16):
        for k in range(per):
            out[limb * per + k] = parts[k][limb]
    return out


@functools.lru_cache(maxsize=None)
def _all_windows_fn(n: int, window: int):
    """All windows in one call via EXPLICIT batch dims (not vmap: the
    Pallas mont-mul kernels cannot be auto-batched once the flattened
    width exceeds one block)."""
    return jax.jit(_windows_batched_body(n, window))


def _hs_scan_points(pt, seg, steps: int):
    """Hillis-Steele segmented inclusive scan of points (combine=jac_add,
    reset across `seg` boundaries), batched: pt leaves are (L, W, n),
    seg is (W, n).

    FIXED shapes at every step -> ONE jac_add instance in the XLA graph
    regardless of n (an associative_scan here generated ~2 log n
    distinct-shaped point-add kernels; measured 526s XLA-TPU compile).
    Work is n log n point-adds instead of 2n — the compile/runtime trade
    round 1 takes; a Pallas point kernel replaces this in the scaling
    pass."""
    n = pt[0].shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)

    def body(i, carry):
        x, y, z = carry
        off = jnp.int32(1) << i
        src = jnp.maximum(iota - off, 0)
        sx, sy, sz = x[..., src], y[..., src], z[..., src]
        valid = (iota >= off)[None, :] & (seg[..., src] == seg)  # (W, n)
        ax, ay, az = g1.jac_add((x, y, z), (sx, sy, sz))
        return (FQ.select(valid, ax, x), FQ.select(valid, ay, y),
                FQ.select(valid, az, z))

    return jax.lax.fori_loop(0, steps, body, pt)


def _hs_total_sum(pt, steps: int):
    """Total sum along the last axis via Hillis-Steele shifts; result in
    column 0. pt leaves (L, W, n)."""
    n = pt[0].shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)

    def body(i, carry):
        x, y, z = carry
        off = jnp.int32(1) << i
        src = jnp.minimum(iota + off, n - 1)
        valid = ((iota + off) <= n - 1)[None, :]
        ax, ay, az = g1.jac_add((x, y, z), (x[..., src], y[..., src],
                                            z[..., src]))
        return (FQ.select(valid, ax, x), FQ.select(valid, ay, y),
                FQ.select(valid, az, z))

    x, y, z = jax.lax.fori_loop(0, steps, body, pt)
    return (x[..., :1], y[..., :1], z[..., :1])


def _windows_batched_body(n: int, window: int):
    steps_n = max((n - 1).bit_length(), 1)
    nb = 1 << window
    steps_b = max((nb - 2).bit_length(), 1)

    def f(digits, px, py, pz):
        """All windows at once: digits (W, n) int32, points (L, n) each.
        Returns the window sums as (L, W, 1) pytree leaves."""
        order = jnp.argsort(digits, axis=-1, stable=True)   # (W, n)
        d_s = jnp.take_along_axis(digits, order, axis=-1)
        pt = (px[:, order], py[:, order], pz[:, order])     # (L, W, n)

        sums = _hs_scan_points(pt, d_s, steps_n)

        # bucket totals at segment ends: for bucket b, last index with
        # d_s == b is searchsorted(d_s, b, 'right') - 1 (per window)
        buckets = jnp.arange(1, nb, dtype=jnp.int32)
        idx = jax.vmap(lambda row: jnp.searchsorted(
            row, buckets, side="right"))(d_s) - 1           # (W, nb-1)
        valid = (idx >= 0) & (jnp.take_along_axis(
            d_s, jnp.clip(idx, 0, n - 1), axis=-1) == buckets[None, :])
        idx = jnp.clip(idx, 0, n - 1)

        def gather(c):
            return jnp.take_along_axis(
                c, jnp.broadcast_to(idx[None], (FQ.L,) + idx.shape),
                axis=-1)

        bx = gather(sums[0])
        by = gather(sums[1])
        bz = FQ.select(valid, gather(sums[2]),
                       FQ.zeros(idx.shape))

        # weighted reduction: sum_b b * S_b = sum of suffix sums.
        rseg = jnp.zeros(idx.shape, dtype=jnp.int32)
        suff = _hs_scan_points(
            (jnp.flip(bx, axis=-1), jnp.flip(by, axis=-1),
             jnp.flip(bz, axis=-1)), rseg, steps_b)
        x, y, z = _hs_total_sum(suff, steps_b)
        # reorder leaves to (W, L, 1) to preserve the old interface
        return (x.transpose(1, 0, 2), y.transpose(1, 0, 2),
                z.transpose(1, 0, 2))

    return f


@functools.lru_cache(maxsize=None)
def _digits_fn(window: int):
    from ..fields.jaxfield import FR

    @jax.jit
    def f(coeffs_mont):
        """(L, ..., n) Montgomery Fr coeffs -> (..., num_windows, n) int32
        digits, fully on device (the 16-bit limbs ARE the windows).
        No vmap: from_mont's Pallas kernel handles batch dims natively."""
        raw = FR.from_mont(coeffs_mont)  # (16, ..., n) 16-bit limbs
        lead = raw.shape[1:-1]
        n = raw.shape[-1]
        if window == 16:
            out = raw
        else:
            per = 16 // window
            mask = (1 << window) - 1
            parts = [((raw >> (window * k)) & mask) for k in range(per)]
            out = jnp.stack(parts, axis=1)  # (16, per, ..., n)
            out = out.reshape((16 * per,) + lead + (n,))
        # move the window axis after the batch dims: (..., W, n)
        perm = tuple(range(1, 1 + len(lead))) + (0, out.ndim - 1)
        return out.transpose(perm).astype(jnp.int32)

    return f


class DeviceMSM:
    """Fixed point set (e.g. the SRS G1 powers) resident on device."""

    def __init__(self, points):
        self.n = len(points)
        self.points = g1.encode_points(points)

    def commit_mont(self, coeffs_mont) -> "tuple | None":
        """MSM with scalars given as an on-device Montgomery Fr coefficient
        array (L, n) — the device prover's commit hook: no host decode of
        the polynomial, only the ~16-32 window sums come back."""
        return self.commit_mont_batch(coeffs_mont[:, None, :])[0]

    def commit_mont_batch(self, coeffs_mont) -> list:
        """Batched MSMs: (L, P, n) Montgomery coeff stack -> P affine
        points, in ONE device call (windows x polys ride the same vmap)."""
        L, P, n = coeffs_mont.shape
        assert n <= self.n, (n, self.n)
        window = pick_window(n)
        digits = _digits_fn(window)(coeffs_mont)   # (P, W, n)
        num_w = digits.shape[1]
        digits = digits.reshape(P * num_w, n)
        px, py, pz = (c[:, :n] for c in self.points)
        fn = _all_windows_fn(n, window)
        ws = fn(digits, px, py, pz)
        pts = g1.decode_points(tuple(c.squeeze(-1).T for c in ws))
        out = []
        for p_i in range(P):
            acc = (1, 1, 0)
            for wsum in reversed(pts[p_i * num_w:(p_i + 1) * num_w]):
                for _ in range(window):
                    acc = cv.jac_double(acc)
                if wsum is not None:
                    acc = cv.jac_add(acc, cv.jac_from_affine(wsum))
            out.append(cv.jac_to_affine(acc))
        return out

    def mul(self, scalars) -> "tuple | None":
        """MSM over the first len(scalars) points; returns host affine."""
        n_real = len(scalars)
        assert n_real <= self.n
        # pad to a power of two (>= 32): zero scalars contribute nothing and
        # every commitment in a prove shares one compiled kernel
        n = max(32, 1 << (n_real - 1).bit_length())
        n = min(n, self.n) if self.n >= n else n_real
        scalars = list(scalars) + [0] * (n - n_real)
        window = pick_window(n)
        digits = jnp.asarray(scalars_to_digits(scalars, window))
        px, py, pz = (c[:, :n] for c in self.points)
        if px.shape[1] < n:  # SRS smaller than pad target
            pad = n - px.shape[1]
            px = jnp.concatenate([px, jnp.tile(px[:, :1], (1, pad))], axis=1)
            py = jnp.concatenate([py, jnp.tile(py[:, :1], (1, pad))], axis=1)
            pz = jnp.concatenate([pz, jnp.tile(pz[:, :1], (1, pad))], axis=1)
        fn = _all_windows_fn(n, window)
        ws = fn(digits, px, py, pz)
        # ws: pytree of (num_windows, L, 1) stacked window sums
        pts = g1.decode_points(tuple(c.squeeze(-1).T for c in ws))
        # host recombination: acc = sum_w 2^{cw} W_w
        acc = (1, 1, 0)
        for wsum in reversed(pts):
            for _ in range(window):
                acc = cv.jac_double(acc)
            if wsum is not None:
                acc = cv.jac_add(acc, cv.jac_from_affine(wsum))
        return cv.jac_to_affine(acc)


def msm_device(points, scalars):
    """One-shot device MSM (encodes points each call)."""
    return DeviceMSM(points).mul(scalars)


class ShardedDeviceMSM:
    """Mesh-sharded Pippenger: points partitioned across chips
    (SURVEY §2.3.3 / BASELINE "points partitioned across chips, bucket
    sums reduced across the mesh").

    Each chip runs the full window pipeline on its point shard (local
    argsort/scan/buckets — no collectives), then the per-shard window
    sums are reduced IN-PROGRAM with a log2(S)-step ppermute butterfly
    of Jacobian adds over the mesh axis (the psum analogue for the
    point group — psum itself only reduces ring sums).  Only the W
    reduced window sums come back to host.
    """

    def __init__(self, mesh, points, axis: str = "x"):
        from jax.sharding import NamedSharding, PartitionSpec as P
        self.mesh = mesh
        self.axis = axis
        self.n = len(points)
        sh = NamedSharding(mesh, P(None, axis))
        self.points = tuple(jax.device_put(c, sh)
                            for c in g1.encode_points(points))

    @functools.cached_property
    def _shards(self):
        return self.mesh.shape[self.axis]

    def _sharded_fn(self, n_local: int, window: int):
        from jax.sharding import PartitionSpec as P
        body = _windows_batched_body(n_local, window)
        S = self._shards
        axis = self.axis

        def local(digits, px, py, pz):
            ws = body(digits, px, py, pz)  # pytree of (W, L, 1)
            # leaves to (L, W, 1) for jac_add's (L, ...) convention
            acc = tuple(c.transpose(1, 0, 2) for c in ws)
            k = 1
            while k < S:  # butterfly all-reduce: after log2(S) exchanges
                perm = [(i, i ^ k) for i in range(S)]  # every shard holds
                other = tuple(jax.lax.ppermute(c, axis, perm)  # the total
                              for c in acc)
                acc = g1.jac_add(acc, other)
                k *= 2
            return tuple(c.transpose(1, 0, 2) for c in acc)

        return jax.jit(jax.shard_map(
            local, mesh=self.mesh,
            in_specs=(P(None, self.axis), P(None, self.axis),
                      P(None, self.axis), P(None, self.axis)),
            out_specs=P(None, None, None), check_vma=False))

    def commit_mont(self, coeffs_mont):
        """(L, n) Montgomery coeffs (may be host or sharded) -> affine."""
        n = coeffs_mont.shape[-1]
        assert n == self.points[0].shape[-1], "shard layout must match"
        S = self._shards
        assert n % S == 0
        window = pick_window(n // S)
        digits = _digits_fn(window)(coeffs_mont)
        from jax.sharding import NamedSharding, PartitionSpec as P
        digits = jax.device_put(
            digits, NamedSharding(self.mesh, P(None, self.axis)))
        fn = self._sharded_fn(n // S, window)
        ws = fn(digits, *self.points)
        # ws: (W, L, 1) per coordinate, already mesh-reduced in-program
        pts = g1.decode_points(tuple(c.squeeze(-1).T for c in ws))
        acc = (1, 1, 0)
        for wsum in reversed(pts):
            for _ in range(window):
                acc = cv.jac_double(acc)
            if wsum is not None:
                acc = cv.jac_add(acc, cv.jac_from_affine(wsum))
        return cv.jac_to_affine(acc)
