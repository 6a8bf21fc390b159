"""Device Pippenger MSM v3: chunked streaming accumulation.

v2 (msm2.py) launched one fused madd kernel per bucket *round* (~40-100
launches per MSM) plus ~25 reduction launches; on the tunneled TPU every
Mosaic launch costs ~1.5-5 ms, so launch overhead dominated at small n.
v3 keeps v2's math (signed digits via the carry-free +H trick, argsort
bucket plan, masked mixed-adds, weighted suffix reduction — reference
algorithm: arkworks `VariableBaseMSM`, plonk-core/src/commitment.rs:36-47)
and restructures the data flow:

  1. points live row-major `(n, 2L)` on device — one gathered point is
     192 contiguous bytes instead of 48 strided 1-element reads;
  2. bucket rounds are processed in chunks of Kc: ONE XLA gather per
     chunk and ONE Mosaic kernel launch that fori_loops the Kc masked
     mixed-adds with accumulators resident in VMEM (grid is over lane
     blocks; the round axis is innermost so each lane block's
     accumulator block stays in VMEM across its whole chunk);
  3. the outer chunk loop is a `lax.while_loop` bounded by the DYNAMIC
     max bucket occupancy (no static worst-case padding);
  4. the weighted reduction sum_b b*S_b is a double suffix ladder over
     the small shared per-step jadd kernel (~2*log2(B) launches; a
     fully fused one-launch variant was tried and abandoned — ~28
     inlined add bodies cost ~40 min of Mosaic compile).

Interfaces match msm2.PippengerMSM (commit_mont / commit_mont_batch /
mul) so the fused round programs can swap bodies.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..fields.jaxfield import FR, FQ
from ..fields.host import R
from ..fields import pallas2
from . import g1_jax as g1
from . import host as cv
from . import pallas_jac
from . import msm2
from .msm2 import (_window_plan, pick_window, _digits,
                   decode_raw_jacobian, recombine_windows)

U32 = jnp.uint32
Lq = FQ.L
KC = 8                       # bucket rounds per gather/launch chunk


# ---------------------------------------------------------------------------
# sort plan (packed single-operand key when it fits 32 bits)
# ---------------------------------------------------------------------------

def _sort_plan(bucket, sign, half: int, n: int):
    """Returns (order, ssign, starts, ends) like msm2._sort_plan but
    sorts ONE packed u32 key (bucket << log2n | index) when bucket and
    index bits fit — a single-operand sort is much cheaper than the
    variadic (key, payload) form."""
    idx_bits = max(1, (n - 1).bit_length())
    bkt_bits = half.bit_length()
    G = bucket.shape[0]
    if idx_bits + bkt_bits <= 32:
        iota = jax.lax.broadcasted_iota(U32, (G, n), 1)
        packed = (bucket << idx_bits) | iota
        from ..poly import sortnet
        if sortnet.use_sortnet():
            # bitonic network instead of lax.sort: the native sort's
            # first execution is JIT-compiled server-side at a cost
            # that blows the remote-compile RPC at 2^18 (sortnet.py)
            skey = sortnet.sort_words((packed,))[0]
        else:
            skey = jax.lax.sort(packed, dimension=-1)
        order = skey & ((1 << idx_bits) - 1)
        sortedb = skey >> idx_bits
        ssign = jnp.take_along_axis(sign, order, axis=-1)
    else:
        order = jnp.argsort(bucket, axis=-1, stable=False)
        sortedb = jnp.take_along_axis(bucket, order, axis=-1)
        ssign = jnp.take_along_axis(sign, order, axis=-1)
    # bucket ranges via scatter-add histogram + cumsum — NOT
    # searchsorted: the vmapped binary search is another lazily
    # server-compiled op (measured 396 s first execution at 2^12 vs
    # 0.96 s for the histogram, identical outputs)
    cnt = jnp.zeros((G, half + 1), U32).at[
        jnp.arange(G)[:, None], sortedb].add(1)
    ends_incl = jnp.cumsum(cnt, axis=-1).astype(jnp.int32)
    starts = ends_incl[:, :-1]      # # elements < b   (b = 1..half)
    ends = ends_incl[:, 1:]         # # elements <= b
    return order, ssign, starts, ends


# ---------------------------------------------------------------------------
# chunked accumulate kernel
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _accum_kernel(kc: int, interpret: bool):
    """(acc3, pts(kc, 2L, S, T), mask(kc, 1, S, T)) -> acc3', anom.

    Grid (T/LANES, kc): for a fixed lane block the kc rounds run on
    consecutive grid steps, so the accumulator output block stays
    resident in VMEM; pts blocks stream through the Mosaic pipeline
    (auto double-buffered).  mask bit0 = valid, bit1 = sign."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ops = pallas_jac._TileOps()
    S, K = pallas2.S_SUB, pallas2.LANES

    def kernel(ax, ay, az, pts, msk, ox, oy, oz, anom):
        r = pl.program_id(1)

        @pl.when(r == 0)
        def _():
            ox[...] = ax[...]
            oy[...] = ay[...]
            oz[...] = az[...]
            anom[...] = jnp.zeros_like(anom)

        m = msk[0]
        valid = (m & 1).astype(U32)
        sgn = (m >> 1).astype(U32)
        rx, ry, rz, an = pallas_jac._madd_formulas(
            ox[...], oy[...], oz[...], pts[0, :Lq], pts[0, Lq:],
            valid, sgn, ops)
        ox[...] = rx
        oy[...] = ry
        oz[...] = rz
        anom[...] = anom[...] + an

    @jax.jit
    def call(ax, ay, az, pts, msk):
        T = ax.shape[2]
        val = pl.BlockSpec((Lq, S, K), lambda i, r: (0, 0, i),
                           memory_space=pltpu.VMEM)
        mko = pl.BlockSpec((1, S, K), lambda i, r: (0, 0, i),
                           memory_space=pltpu.VMEM)
        pspec = pl.BlockSpec((1, 2 * Lq, S, K), lambda i, r: (r, 0, 0, i),
                             memory_space=pltpu.VMEM)
        mspec = pl.BlockSpec((1, 1, S, K), lambda i, r: (r, 0, 0, i),
                             memory_space=pltpu.VMEM)
        shp = jax.ShapeDtypeStruct((Lq, S, T), U32)
        mshp = jax.ShapeDtypeStruct((1, S, T), U32)
        return pl.pallas_call(
            kernel,
            out_shape=(shp, shp, shp, mshp),
            grid=(T // K, kc),
            in_specs=[val, val, val, pspec, mspec],
            out_specs=(val, val, val, mko),
            interpret=interpret,
        )(ax, ay, az, pts, msk)

    return call


# ---------------------------------------------------------------------------
# MSM body
# ---------------------------------------------------------------------------

def _gather_chunk(pxy_rows, order, ssign, starts, ends, base, n, kc):
    """One chunk's points+masks: (kc, 2L, lanes), (kc, 1, lanes)."""
    G, B = starts.shape
    offs = base + jnp.arange(kc, dtype=jnp.int32)  # (kc,)
    idx = starts[None] + offs[:, None, None]       # (kc, G, B)
    valid = idx < ends[None]
    idxc = jnp.minimum(idx, n - 1).astype(jnp.int32)
    gidx = jnp.arange(G, dtype=jnp.int32)[None, :, None]
    pidx = order[gidx, idxc]                       # (kc, G, B)
    sg = ssign[gidx, idxc]
    pts = pxy_rows[pidx.reshape(-1)]               # (kc*G*B, 2L)
    pts = pts.reshape(kc, G * B, 2 * Lq).transpose(0, 2, 1)
    msk = (valid.astype(U32) | (sg << 1)).reshape(kc, 1, G * B)
    return pts, msk


def _top_window_plan(n, c):
    """Replication plan for the degenerate top Pippenger window.

    The signed-digit top window only has ~2^t + 2 distinct bucket ids
    (t = 255 - c*(W-1) effective bits), so its buckets hold ~n/2^t
    entries while full windows hold ~2n/2^c — the global max-occupancy
    accumulation loop is then dominated by the top window (measured 611
    vs mean 16 at n=2^12, c=9: 77 serial chunk rounds instead of ~5).
    Spread each top bucket over R replicas (distinct bucket ids, folded
    back before the weighted reduction): occupancy rebalances to the
    full-window level."""
    from .msm2 import FR_BITS as _FRB
    W, _H = _window_plan(c)
    half = 1 << (c - 1)
    t = max(_FRB - c * (W - 1), 0)
    B_top = (1 << t) + 2           # bucket ids used by the top window
    R = max(half // B_top, 1)      # replicas that fit in [1, half]
    return W, half, t, B_top, R


def _msm_body_v3(n, P, c, coeffs, pxy_rows, interpret=False, to_raw=True,
                 reduce=True):
    """(L, P, n) Montgomery scalars + (n, 2L) row-major points ->
    ((L, G) raw Jacobian window sums, anomaly count).  to_raw=False
    keeps the sums in Montgomery form for on-device consumption
    (device_finish.recombine_device)."""
    W, half, _t, B_top, R = _top_window_plan(n, c)
    B = half
    G = P * W
    lanes = G * B
    npad = pallas2.padded(lanes)
    S = pallas2.S_SUB
    T = npad // S
    use_pl = pallas_jac.use_pallas() or interpret

    bucket, sign = _digits(coeffs, n, P, c)
    if R >= 2:
        # replicate top-window buckets: id -> id + (i mod R) * B_top
        iota_n = jax.lax.broadcasted_iota(U32, (1, n), 1)
        gidx = jax.lax.broadcasted_iota(jnp.int32, (G, 1), 0)
        is_top = (gidx % W) == (W - 1)
        repl = (iota_n % jnp.uint32(R)) * jnp.uint32(B_top)
        bucket = jnp.where(is_top & (bucket != 0), bucket + repl, bucket)
    order, ssign, starts, ends = _sort_plan(bucket, sign, half, n)
    rounds = jnp.max(ends - starts).astype(jnp.int32)

    def pack3(x):
        return pallas2.pack(x, npad)

    zero3 = jnp.zeros((Lq, S, T), U32)
    state = (jnp.int32(0), zero3, zero3, zero3,
             jnp.zeros((1, S, T), U32))

    def pad_last(x):
        if x.shape[-1] == npad:
            return x
        return jnp.concatenate(
            [x, jnp.zeros(x.shape[:-1] + (npad - x.shape[-1],), x.dtype)],
            axis=-1)

    kc = KC if use_pl else 2   # small chunks keep the CPU graphs compilable
    if use_pl:
        acc_fn = _accum_kernel(kc, interpret)

        def body(st):
            base, ax, ay, az, anom = st
            pts, msk = _gather_chunk(
                pxy_rows, order, ssign, starts, ends, base, n, kc)
            ptsp = pad_last(pts).reshape(kc, 2 * Lq, S, T)
            mskp = pad_last(msk).reshape(kc, 1, S, T)
            ax, ay, az, an = acc_fn(ax, ay, az, ptsp, mskp)
            return base + kc, ax, ay, az, anom + an
    else:
        def body(st):
            base, ax, ay, az, anom = st
            pts, msk = _gather_chunk(
                pxy_rows, order, ssign, starts, ends, base, n, kc)
            axf = pallas2.unpack(ax, lanes)
            ayf = pallas2.unpack(ay, lanes)
            azf = pallas2.unpack(az, lanes)
            anf = jnp.uint32(0)
            for k in range(kc):
                (axf, ayf, azf), an = pallas_jac.madd(
                    (axf, ayf, azf), pts[k, :Lq], pts[k, Lq:],
                    msk[k, 0] & 1, msk[k, 0] >> 1)
                anf = anf + an
            return (base + kc, pack3(axf), pack3(ayf), pack3(azf),
                    anom + jnp.full((1, S, T), 0, U32).at[0, 0, 0]
                    .add(anf))

    def cond(st):
        return st[0] < rounds

    _, ax, ay, az, anom_acc = jax.lax.while_loop(cond, body, state)
    anom = jnp.sum(anom_acc)
    if not reduce:      # profiling: bucket accumulation only
        return (ax, ay, az), anom

    # ---- replica fold + weighted reduction, ONE jadd call site.
    # Phase 1 (Kf steps): fold the top window's replica buckets back
    # (binary tree over the replica axis, stride B_top * 2^k).
    # Phase 2 (2*levels steps): double suffix ladder = weighted bucket
    # sum.  A single fori_loop with index-dependent shift/mask replaces
    # statically-unrolled jadd launches: every inlined Mosaic payload is
    # ~9 MB of serialized executable, so an unrolled ladder dominated
    # program size (~145 MB/program) and tunnel-served compile time.
    flatx = pallas2.unpack(ax, lanes)
    flaty = pallas2.unpack(ay, lanes)
    flatz = pallas2.unpack(az, lanes)

    levels = (B - 1).bit_length()
    Kf = (R - 1).bit_length() if R >= 2 else 0
    iota_b = jnp.arange(B, dtype=jnp.int32)
    if Kf:
        r_idx = iota_b // B_top                       # replica per lane
        top_lane = np.zeros((G, B), dtype=bool)
        top_lane[np.arange(G) % W == W - 1, :] = True
        top_lane = jnp.asarray(top_lane)
        kill = top_lane & (r_idx[None, :] > 0)        # replica lanes

    def ladder_body(k, st):
        tx, ty, tz, an = st
        in_fold = k < Kf
        if Kf:
            # entering the ladder phase: drop folded replica lanes so
            # the weighted suffix sum sees only ids < B_top
            tz = jnp.where((k == Kf) & kill.reshape(-1)[None, :],
                           jnp.uint32(0), tz)
        kl = jnp.where(in_fold, k, jnp.mod(k - Kf, levels))
        s = jnp.where(in_fold,
                      jnp.int32(B_top) << kl, jnp.int32(1) << kl)
        idx = iota_b + s
        valid_b = idx < B
        if Kf:
            fold_ok = ((jnp.mod(r_idx, jnp.int32(2) << kl) == 0)
                       & (r_idx + (jnp.int32(1) << kl) < R))
            valid = jnp.where(in_fold,
                              top_lane & (fold_ok & valid_b)[None, :],
                              valid_b[None, :])         # (G, B) | (1, B)
            valid = jnp.broadcast_to(valid, (G, B)).reshape(-1)
        else:
            valid = jnp.broadcast_to(valid_b[None, :], (G, B)).reshape(-1)
        idxc = jnp.where(valid_b, idx, 0)

        def shift(cc):
            c3 = cc.reshape(Lq, G, B)
            g = jnp.take(c3, idxc, axis=2)
            # masked-out lanes become infinity (z=0): jadd's q_inf
            # branch returns the left operand there
            return jnp.where(valid.reshape(G, B)[None], g,
                             jnp.uint32(0)).reshape(Lq, G * B)

        (tx, ty, tz), a = pallas_jac.jadd(
            (tx, ty, tz), (shift(tx), shift(ty), shift(tz)),
            interpret=interpret)
        return tx, ty, tz, an + a

    n_steps = Kf + 2 * levels
    if n_steps and interpret:
        # interpret mode: unroll statically (the emulated kernel inside a
        # fori_loop is pathologically slow under the CPU interpreter);
        # same math, same kernel, concrete shift per step
        st = (flatx, flaty, flatz, anom)
        for k in range(n_steps):
            st = ladder_body(k, st)
        flatx, flaty, flatz, anom = st
    elif n_steps:
        flatx, flaty, flatz, anom = jax.lax.fori_loop(
            0, n_steps, ladder_body, (flatx, flaty, flatz, anom))
    heads = tuple(cc.reshape(Lq, G, B)[:, :, 0]
                  for cc in (flatx, flaty, flatz))
    if to_raw:
        heads = tuple(FQ.from_mont(cc) for cc in heads)
    return heads, anom


def encode_points_rows(points):
    """Affine points -> (n, 2L) u32 row-major Montgomery limb array."""
    px, py, _ = g1.encode_points(points)
    return jnp.concatenate([px, py], axis=0).T.copy()


@functools.lru_cache(maxsize=None)
def _msm_win_fn(n: int, c: int):
    """THE shared MSM program: (L, 4, n) Montgomery scalar stack +
    (n, 2L) row-major points -> Montgomery Jacobian window sums
    (3 x (Lq, 4W)) + anomaly count.

    P is FIXED at 4 (smaller batches are zero-padded by the caller):
    one compiled executable serves every commitment in preprocess and
    all five prover rounds.  Padding columns are free — zero scalars
    hit only the skipped bucket 0, so they never raise the dynamic
    max-occupancy trip count of the accumulation loop."""

    def fn(coeffs, pxy_rows):
        return _msm_body_v3(n, 4, c, coeffs, pxy_rows, to_raw=False)

    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def _finish_fn(c: int):
    """THE shared MSM finish program: window sums (+ accumulated
    anomaly) -> affine RAW coords, infinity flags, ark-serialize
    compressed bytes, and the total anomaly count.  Device Horner
    recombination (fused Mosaic kernel on TPU) + one Fermat inversion.
    Like the MSM body, compiled once per window width and reused by
    preprocess and all five prover rounds."""
    from .device_finish import recombine_device, to_affine_bytes
    W, _H = _window_plan(c)

    @jax.jit
    def fn(wx, wy, wz, anom):
        (jx, jy, jz), a2 = recombine_device(wx, wy, wz, 4, W, c)
        xraw, yraw, inf, byts = to_affine_bytes(jx, jy, jz)
        return xraw, yraw, inf, byts, (anom + a2).reshape(1)

    return fn


class PippengerMSM3:
    """v3 drop-in for msm2.PippengerMSM (same public interface)."""

    def __init__(self, points):
        self.n = len(points)
        self.points_host = list(points)
        assert all(p is not None for p in points), "SRS points finite"
        self.pxy = encode_points_rows(points)

    def _run(self, stack):
        from ..fields.limb import limbs_to_vec
        L, P, n = stack.shape
        assert n == self.n, (n, self.n)
        c = pick_window(n)
        out = []
        for k in range(0, P, 4):
            sub = stack[:, k:k + 4]
            pp = sub.shape[1]
            if pp < 4:
                sub = jnp.concatenate(
                    [sub, jnp.zeros((L, 4 - pp, n), sub.dtype)], axis=1)
            (wx, wy, wz), anom = _msm_win_fn(n, c)(sub, self.pxy)
            xraw, yraw, inf, _byts, an = _finish_fn(c)(wx, wy, wz, anom)
            xh, yh, infh, anh = jax.device_get((xraw, yraw, inf, an))
            if int(anh[0]) > 0:
                out.extend(self._host_fallback(sub)[:pp])
                continue
            xs = limbs_to_vec(xh)
            ys = limbs_to_vec(yh)
            out.extend(None if int(infh[i]) else (xs[i], ys[i])
                       for i in range(pp))
        return out

    def _host_fallback(self, stack):
        from .host import msm_host
        out = []
        for p_i in range(stack.shape[1]):
            scalars = FR.decode_fast(stack[:, p_i])
            out.append(msm_host(self.points_host, scalars))
        return out

    def commit_mont(self, coeffs_mont):
        return self._run(coeffs_mont[:, None, :])[0]

    def commit_mont_batch(self, coeffs_mont):
        return self._run(coeffs_mont)

    def mul(self, scalars):
        n_real = len(scalars)
        assert n_real <= self.n
        vals = [s % R for s in scalars] + [0] * (self.n - n_real)
        from ..fields.limb import encode_ints
        raw = jnp.asarray(encode_ints(vals, FR.L))
        stack = FR.to_mont(raw)[:, None, :]
        return self._run(stack)[0]
