"""Device Pippenger MSM, round-2 rewrite: O(n) point-adds.

TPU-native replacement for arkworks `VariableBaseMSM::multi_scalar_mul`
(reference plonk-core/src/commitment.rs:36-47).  Round 1 used
Hillis-Steele segmented scans = n log n full Jacobian adds per window;
this version does the textbook-work Pippenger with TPU-shaped data flow:

  1. signed windowed digits via the carry-free +H trick: adding
     H = sum_w 2^(c*w-1) makes every unsigned digit of (s+H) minus
     2^(c-1) the signed digit — no sequential window carry ripple;
     sign flips the point (negated y), halving the bucket count;
  2. per-window argsort by bucket (XLA sort, measured cheap) +
     searchsorted bucket ranges — the memory-random bucket scatter
     becomes a dense gather;
  3. a `lax.while_loop` over bucket *rounds*: round r gathers the r-th
     element of every bucket (dense (G, B) gather) and folds it into
     (G, B) Jacobian accumulators with ONE fused masked mixed-add
     kernel call — total work = ~n mixed adds per window, lane-parallel
     across windows x buckets; accumulators stay in the packed
     (L, 8, T) kernel layout across iterations;
  4. weighted bucket reduction sum_b b*S_b via the split
     b = hi*2^m + lo: row/column tree sums + two short suffix scans +
     m fused doublings — O(B) adds instead of B*log(B);
  5. host window recombination (W points, ~255 cheap bigint doublings).

Completeness: the fused kernels flag (instead of computing) the
equal-x doubling case, which challenge-derived scalars cannot hit except
with negligible probability; on a nonzero anomaly count the caller falls
back to the exact host MSM, so the result is unconditionally correct.

Windows x polys batch through the same pipeline (a (P, W) group axis),
so one compiled executable serves every commitment of a prove.
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

U32 = jnp.uint32
FR_BITS = 255  # BLS12-381 Fr modulus bit length


def decode_raw_jacobian(wx, wy, wz):
    """Host numpy (L, G) RAW (non-Montgomery) limb arrays -> affine
    points (None = infinity), one shared batch inversion."""
    from ..fields.host import Q, fq_inv
    from ..fields.limb import limbs_to_vec
    X = limbs_to_vec(np.asarray(wx))
    Y = limbs_to_vec(np.asarray(wy))
    Z = limbs_to_vec(np.asarray(wz))
    nz = [z for z in Z if z != 0]
    inv = {}
    if nz:
        prefix = [1]
        for z in nz:
            prefix.append(prefix[-1] * z % Q)
        t = fq_inv(prefix[-1])
        for i in range(len(nz) - 1, -1, -1):
            inv[i] = prefix[i] * t % Q
            t = t * nz[i] % Q
    out = []
    j = 0
    for x, y, z in zip(X, Y, Z):
        if z == 0:
            out.append(None)
        else:
            zi = inv[j]
            j += 1
            zi2 = zi * zi % Q
            out.append((x * zi2 % Q, y * zi2 * zi % Q))
    return out


def recombine_windows(pts, P: int, W: int, c: int):
    """Window recombination: out[p] = sum_w 2^(c*w) * pts[p*W + w].

    Native C double-and-add when available (~1 ms), else host bigint
    Horner (~20 ms for P=4) — the only host point math left per commit."""
    from . import native_pairing
    if native_pairing.available():
        out = []
        weights = [pow(2, c * w, cv.R) for w in range(W)]
        for p_i in range(P):
            out.append(native_pairing.g1_msm(
                pts[p_i * W:(p_i + 1) * W], weights))
        return out
    out = []
    for p_i in range(P):
        acc = (1, 1, 0)
        for w in range(W - 1, -1, -1):
            for _ in range(c):
                acc = cv.jac_double(acc)
            s = pts[p_i * W + w]
            if s is not None:
                acc = cv.jac_add(acc, cv.jac_from_affine(s))
        out.append(cv.jac_to_affine(acc))
    return out


def pick_window(n: int) -> int:
    """Window width from a measured v5e cost model of the v3 pipeline
    (curve/msm3): chunked masked accumulation bounded by max bucket
    occupancy (~2n/2^c with top-window replication), the fold+ladder
    reduction, and the per-group bucket sort.  Constants calibrated on
    the tunneled v5e at n=2^12 (kernel ~30M madd/s at 8x512-lane
    blocks, ~2.5 ms per chunk launch+gather, sort ~0.12 us/key).
    The floor extends down to c=2 so tiny point sets (e.g. a 2-point
    shard on a wide mesh) don't pay a huge empty-bucket reduction."""
    best, best_cost = 8, None
    for c in range(2, 17):
        W = _window_plan(c)[0]
        half = 1 << (c - 1)
        lanes = 4 * W * half
        occ = max(1.0, 2.0 * n / (1 << c))
        max_occ = occ + 4.0 * occ ** 0.5 + 4.0
        chunks = -(-int(max_occ) // 8)
        acc = chunks * (2.5e-3 + 8 * lanes / 30e6)
        ladder = (2 * (c - 1) + 8) * (0.7e-3 + lanes * 2 / 30e6)
        sort = 8e-3 + 2e-9 * 4 * W * n   # measured: 17 ms at 8M keys
        cost = acc + ladder + sort
        if best_cost is None or cost < best_cost:
            best, best_cost = c, cost
    return best


@functools.lru_cache(maxsize=None)
def _window_plan(c: int):
    """(W, H): window count and the signed-digit bias constant, chosen so
    u = s + H < 2^(c*W) for all scalars s < 2^255."""
    half = 1 << (c - 1)
    W = -(-FR_BITS // c)
    while True:
        H = sum(half << (c * w) for w in range(W))
        if (1 << FR_BITS) + H < 1 << (c * W):
            return W, H
        W += 1


def _digits(coeffs, n: int, P: int, c: int):
    """(L, P, n) Montgomery scalars -> bucket (G, n) u32 in [0, 2^(c-1)]
    and sign (G, n) u32; G = P*W."""
    W, H = _window_plan(c)
    half = 1 << (c - 1)
    G = P * W
    L_ext = -(-(c * W) // 16) + 1

    raw = FR.from_mont(coeffs)  # (16, P, n) 16-bit limbs
    if L_ext > raw.shape[0]:
        raw = jnp.concatenate(
            [raw, jnp.zeros((L_ext - raw.shape[0], P, n), U32)], axis=0)
    h_limbs = jnp.asarray(
        np.array([(H >> (16 * k)) & 0xFFFF for k in range(L_ext)],
                 dtype=np.uint32))

    def step(carry, xs):
        limb, h = xs
        s = limb + h + carry
        return s >> 16, s & 0xFFFF

    _, u = jax.lax.scan(step, jnp.zeros((P, n), U32), (raw, h_limbs))

    lo = np.array([(w * c) >> 4 for w in range(W)])
    off = np.array([(w * c) & 15 for w in range(W)], dtype=np.uint32)
    u_lo = u[lo]                     # (W, P, n)
    u_hi = u[lo + 1]
    d = ((u_lo | (u_hi << 16)) >> off[:, None, None]) & ((1 << c) - 1)
    sign = d < half
    bucket = jnp.where(sign, half - d, d - half)
    # group-major layout: (P, W, n) -> (G, n)
    bucket = bucket.transpose(1, 0, 2).reshape(G, n)
    sign = sign.astype(U32).transpose(1, 0, 2).reshape(G, n)
    return bucket, sign


def _sort_plan(bucket, sign, half: int):
    """argsort by bucket per group row; returns order, sorted sign,
    bucket starts/ends (G, B)."""
    from ..poly import sortnet
    G, n = bucket.shape
    idx_bits = max(1, (n - 1).bit_length())
    if sortnet.use_sortnet() and idx_bits + half.bit_length() <= 32:
        iota = jax.lax.broadcasted_iota(U32, (G, n), 1)
        skey = sortnet.sort_words(((bucket << idx_bits) | iota,))[0]
        order = skey & ((1 << idx_bits) - 1)
        sortedb = skey >> idx_bits
    else:
        order = jnp.argsort(bucket, axis=-1, stable=False)
        sortedb = jnp.take_along_axis(bucket, order, axis=-1)
    ssign = jnp.take_along_axis(sign, order, axis=-1)
    # scatter-add histogram instead of vmapped searchsorted (the binary
    # search costs minutes of lazy server-side compilation at first
    # execution on the tunnel backend; identical outputs)
    cnt = jnp.zeros((G, half + 1), U32).at[
        jnp.arange(G)[:, None], sortedb].add(1)
    ends_incl = jnp.cumsum(cnt, axis=-1).astype(jnp.int32)
    starts = ends_incl[:, :-1]
    ends = ends_incl[:, 1:]
    return order, ssign, starts, ends


# ---------------------------------------------------------------------------
# Pallas path: packed accumulators, fused kernels, split reduction
# ---------------------------------------------------------------------------

def _msm_body_pallas(n, P, c, coeffs, px, py):
    W, _H = _window_plan(c)
    half = 1 << (c - 1)
    B = half
    G = P * W
    Lq = FQ.L
    blk = pallas2.BLOCK
    S = pallas2.S_SUB
    if B >= blk:
        Gp = G
    else:
        gmul = blk // B
        Gp = -(-G // gmul) * gmul
    lanes = Gp * B
    T = lanes // S
    mk = pallas_jac._madd_kernel(False)
    jk = pallas_jac._jadd_kernel(False)
    dk = pallas_jac._jdbl_kernel(False)
    # split B = HI * LO for the O(B) weighted reduction
    m = (c - 1) // 2
    LO = 1 << m
    HI = B // LO

    bucket, sign = _digits(coeffs, n, P, c)
    order, ssign, starts, ends = _sort_plan(bucket, sign, half)

    def pad_rows(x):
        if Gp == G:
            return x
        return jnp.concatenate(
            [x, jnp.zeros((Gp - G,) + x.shape[1:], x.dtype)], axis=0)

    order_p = pad_rows(order)
    ssign_p = pad_rows(ssign)
    starts_p = pad_rows(starts)
    ends_p = pad_rows(ends)
    rounds = jnp.max(ends - starts).astype(jnp.int32)

    def packT(x):
        return x.reshape(x.shape[0], S, T)

    zero3 = jnp.zeros((Lq, S, T), U32)
    state = (jnp.int32(0), zero3, zero3, zero3, jnp.uint32(0))

    def cond(st):
        return st[0] < rounds

    def body(st):
        r, ax, ay, az, anom = st
        idx = starts_p + r
        valid = idx < ends_p
        idxc = jnp.minimum(idx, n - 1)
        pidx = jnp.take_along_axis(order_p, idxc, axis=-1)
        sg = jnp.take_along_axis(ssign_p, idxc, axis=-1)
        gx = packT(px[:, pidx].reshape(Lq, lanes))
        gy = packT(py[:, pidx].reshape(Lq, lanes))
        v = packT(valid.astype(U32).reshape(1, lanes))
        sgp = packT(sg.reshape(1, lanes))
        ax, ay, az, an = mk(ax, ay, az, gx, gy, v, sgp)
        return r + 1, ax, ay, az, jnp.sum(an) + anom

    _, ax, ay, az, anom = jax.lax.while_loop(cond, body, state)

    # ---- reduction -------------------------------------------------------
    def jadd_flat(p, q):
        X = p[0].shape[1]
        npad = pallas2.padded(X)
        pp = [pallas2.pack(cc, npad) for cc in p]
        qq = [pallas2.pack(cc, npad) for cc in q]
        ox, oy, oz, an = jk(*pp, *qq)
        return (tuple(pallas2.unpack(cc, X) for cc in (ox, oy, oz)),
                jnp.sum(pallas2.unpack(an, X)))

    def tree_last(tree, shape):
        """Halving tree sum along the LAST axis of `shape`; leaves are
        (L, prod(shape)). Returns leaves (L, prod(shape[:-1]))."""
        w = shape[-1]
        lead = 1
        for d in shape[:-1]:
            lead *= d
        an_tot = jnp.uint32(0)
        cur = tree
        while w > 1:
            h = w // 2
            v = [cc.reshape(Lq, lead, w) for cc in cur]
            p1 = tuple(cc[:, :, :h].reshape(Lq, lead * h) for cc in v)
            p2 = tuple(cc[:, :, h:2 * h].reshape(Lq, lead * h) for cc in v)
            cur, an = jadd_flat(p1, p2)
            an_tot = an_tot + an
            w = h
        return cur, an_tot

    def suffix_then_total(tree, lead, width):
        """Suffix sums along last axis (HS) then total: returns
        (sum_j suffix_j, suffix_0) as (L, lead) leaves."""
        an_tot = jnp.uint32(0)
        cur = tree
        k = 1
        while k < width:
            v = [cc.reshape(Lq, lead, width) for cc in cur]
            sh = tuple(jnp.concatenate(
                [cc[:, :, k:], jnp.zeros((Lq, lead, k), U32)],
                axis=-1).reshape(Lq, lead * width) for cc in v)
            cur, an = jadd_flat(
                tuple(cc.reshape(Lq, lead * width) for cc in v), sh)
            an_tot = an_tot + an
            k *= 2
        suf0 = tuple(cc.reshape(Lq, lead, width)[:, :, 0] for cc in cur)
        tot, an = tree_last(cur, (lead, width))
        return tot, suf0, an_tot + an

    flat = (ax.reshape(Lq, lanes), ay.reshape(Lq, lanes),
            az.reshape(Lq, lanes))

    # row sums over LO -> R (L, Gp*HI); suffix-weight over HI
    Rsum, an1 = tree_last(flat, (Gp, HI, LO))
    sufTR, T0, an2 = suffix_then_total(Rsum, Gp, HI)
    # col sums over HI -> C (L, Gp*LO): transpose HI/LO axes first
    v4 = [cc.reshape(Lq, Gp, HI, LO).transpose(0, 1, 3, 2)
          .reshape(Lq, lanes) for cc in flat]
    Csum, an3 = tree_last(tuple(v4), (Gp, LO, HI))
    sufTC, _c0, an4 = suffix_then_total(Csum, Gp, LO)

    # D = sufTR - T0 (point negation = negate y); RES = 2^m * D + sufTC
    negT0 = (T0[0], FQ.neg(T0[1]), T0[2])
    D, an5 = jadd_flat(sufTR, negT0)
    for _ in range(m):
        npad = pallas2.padded(Gp)
        packed = [pallas2.pack(cc, npad) for cc in D]
        dx, dy, dz = dk(*packed)
        D = tuple(pallas2.unpack(cc, Gp) for cc in (dx, dy, dz))
    RES, an6 = jadd_flat(D, sufTC)

    anom = anom + an1 + an2 + an3 + an4 + an5 + an6
    # raw (non-Montgomery) limbs so the host needs NO extra device call
    # to decode the window sums (sync latency is ~28 ms on the tunnel)
    out = tuple(FQ.from_mont(cc[:, :G]) for cc in RES)
    return out, anom


# ---------------------------------------------------------------------------
# jnp path (CPU tests / fallback): flat arrays, 2-pass suffix reduction
# ---------------------------------------------------------------------------

def _msm_body_jnp(n, P, c, coeffs, px, py):
    W, _H = _window_plan(c)
    half = 1 << (c - 1)
    B = half
    G = P * W
    Lq = FQ.L

    bucket, sign = _digits(coeffs, n, P, c)
    order, ssign, starts, ends = _sort_plan(bucket, sign, half)
    rounds = jnp.max(ends - starts).astype(jnp.int32)

    zero3 = jnp.zeros((Lq, G * B), U32)
    state = (jnp.int32(0), zero3, zero3, zero3, jnp.uint32(0))

    def cond(st):
        return st[0] < rounds

    def body(st):
        r, ax, ay, az, anom = st
        idx = starts + r
        valid = idx < ends
        idxc = jnp.minimum(idx, n - 1)
        pidx = jnp.take_along_axis(order, idxc, axis=-1)
        sg = jnp.take_along_axis(ssign, idxc, axis=-1)
        gx = px[:, pidx].reshape(Lq, G * B)
        gy = py[:, pidx].reshape(Lq, G * B)
        (ax, ay, az), a = pallas_jac.madd(
            (ax, ay, az), gx, gy,
            valid.reshape(-1).astype(U32), sg.reshape(-1))
        return r + 1, ax, ay, az, anom + a

    _, ax, ay, az, anom = jax.lax.while_loop(cond, body, state)

    def suffix_pass(tree, anom):
        for k in range(c - 1):
            s = 1 << k
            shifted = []
            for cc in tree:
                c3 = cc.reshape(Lq, G, B)
                c3 = jnp.concatenate(
                    [c3[:, :, s:], jnp.zeros((Lq, G, s), U32)], axis=-1)
                shifted.append(c3.reshape(Lq, G * B))
            tree, a = pallas_jac.jadd(tree, tuple(shifted))
            anom = anom + a
        return tree, anom

    tree = (ax, ay, az)
    tree, anom = suffix_pass(tree, anom)   # sfx[b] = sum_{j>=b} S_j
    tree, anom = suffix_pass(tree, anom)   # [0]   = sum_b b*S_b
    out = tuple(FQ.from_mont(cc.reshape(Lq, G, B)[:, :, 0])
                for cc in tree)
    return out, anom


@functools.lru_cache(maxsize=None)
def _msm_fn(n: int, P: int, c: int):
    """Jitted full-pipeline MSM: (L,P,n) Montgomery scalars + (L,n)
    affine point coords -> ((L,G) Jacobian window sums, anomaly count)."""
    use_pl = pallas_jac.use_pallas()

    def fn(coeffs, px, py):
        if use_pl:
            return _msm_body_pallas(n, P, c, coeffs, px, py)
        return _msm_body_jnp(n, P, c, coeffs, px, py)

    return jax.jit(fn)


class PippengerMSM:
    """Fixed point set (e.g. SRS G1 powers) resident on device.

    Drop-in for the round-1 DeviceMSM: same commit_mont / _batch / mul
    interface, ~log(n)/2 less point-add work and fused Mosaic kernels.
    """

    def __init__(self, points):
        self.n = len(points)
        self.points_host = list(points)
        assert all(p is not None for p in points), "SRS points finite"
        px, py, _ = g1.encode_points(points)
        self.px, self.py = px, py

    # -- helpers ------------------------------------------------------------

    def _run(self, stack):
        """(L, P, n) Montgomery coeffs -> list of P host points."""
        L, P, n = stack.shape
        assert n == self.n, (n, self.n)
        c = pick_window(n)
        W, _H = _window_plan(c)
        outs = _msm_fn(n, P, c)(stack, self.px, self.py)
        # ONE host fetch for window sums + anomaly flag
        ((wx, wy, wz), anom) = jax.device_get(outs)
        if int(anom) > 0:
            # equal-x anomaly (negligible probability): exact host fallback
            return self._host_fallback(stack)
        pts = decode_raw_jacobian(wx, wy, wz)  # G = P*W points
        return recombine_windows(pts, P, W, c)

    def _host_fallback(self, stack):
        from .host import msm_host
        out = []
        for p_i in range(stack.shape[1]):
            scalars = FR.decode_fast(stack[:, p_i])
            out.append(msm_host(self.points_host, scalars))
        return out

    # -- public API (DeviceMSM-compatible) ----------------------------------

    def commit_mont(self, coeffs_mont):
        """(L, n) on-device Montgomery coeff array -> host affine point."""
        return self._run(coeffs_mont[:, None, :])[0]

    def commit_mont_batch(self, coeffs_mont):
        """(L, P, n) Montgomery coeff stack -> P host affine points."""
        return self._run(coeffs_mont)

    def mul(self, scalars):
        """MSM over the first len(scalars) points; host ints in."""
        n_real = len(scalars)
        assert n_real <= self.n
        vals = [s % R for s in scalars] + [0] * (self.n - n_real)
        from ..fields.limb import encode_ints
        raw = jnp.asarray(encode_ints(vals, FR.L))
        stack = FR.to_mont(raw)[:, None, :]
        return self._run(stack)[0]


def msm_device(points, scalars):
    """One-shot device MSM (encodes points each call)."""
    return PippengerMSM(points).mul(scalars)


class ShardedPippengerMSM:
    """Mesh-sharded Pippenger: points partitioned across chips (SURVEY
    §2.3.3 / BASELINE "points partitioned across chips, bucket sums
    reduced across the mesh").

    Each shard runs the FULL local pipeline (digits/sort/accumulate/
    reduce) on its point slice under `shard_map`, then the per-shard
    window sums are reduced IN-PROGRAM by a log2(S)-step ppermute
    butterfly of Jacobian adds over the mesh axis (the psum analogue
    for the point group).  Only the G reduced window sums come back to
    host; recombination is identical to the single-device path."""

    def __init__(self, mesh, points, axis: str = "x"):
        from jax.sharding import NamedSharding, PartitionSpec as P
        self.mesh = mesh
        self.axis = axis
        self.n = len(points)
        self.shards = mesh.shape[axis]
        assert self.n % self.shards == 0
        self.n_local = self.n // self.shards
        self.points_host = list(points)
        px, py, _ = g1.encode_points(points)
        sh = NamedSharding(mesh, P(None, axis))
        self.px = jax.device_put(px, sh)
        self.py = jax.device_put(py, sh)

    @functools.lru_cache(maxsize=None)
    def _fn(self, P_polys: int, c: int):
        from jax.sharding import PartitionSpec as P
        nl = self.n_local
        use_pl = pallas_jac.use_pallas()

        S = self.shards
        axis = self.axis

        def local(stack, px, py):
            body = _msm_body_pallas if use_pl else _msm_body_jnp
            raw, anom = body(nl, P_polys, c, stack, px, py)
            # bodies return RAW limbs for the host decode; the reduction
            # adds in Montgomery form with the anomaly-tracking add (an
            # equal-x hit between shard sums falls back to host like any
            # other anomaly)
            acc = tuple(FQ.to_mont(t) for t in raw)
            k = 1
            while k < S:  # butterfly all-reduce: after log2(S) exchanges
                perm = [(i, i ^ k) for i in range(S)]  # every shard holds
                other = tuple(jax.lax.ppermute(t, axis, perm)  # the total
                              for t in acc)
                acc, a = pallas_jac.jadd(acc, other)
                anom = anom + a
                k *= 2
            wx, wy, wz = (FQ.from_mont(t) for t in acc)
            return (wx[..., None], wy[..., None], wz[..., None],
                    anom.reshape(1))

        return jax.jit(jax.shard_map(
            local, mesh=self.mesh,
            in_specs=(P(None, None, self.axis), P(None, self.axis),
                      P(None, self.axis)),
            out_specs=(P(None, None, None), P(None, None, None),
                       P(None, None, None), P(self.axis)),
            check_vma=False))

    def commit_mont_batch(self, coeffs_mont):
        from jax.sharding import NamedSharding, PartitionSpec as P
        Lr, Pp, n = coeffs_mont.shape
        assert n == self.n
        c = pick_window(self.n_local)
        W, _H = _window_plan(c)
        stack = jax.device_put(
            coeffs_mont, NamedSharding(self.mesh, P(None, None, self.axis)))
        outs = self._fn(Pp, c)(stack, self.px, self.py)
        wx, wy, wz, anom = jax.device_get(outs)  # one host fetch
        if int(np.sum(anom)) > 0:
            out = []
            for p_i in range(Pp):
                scalars = FR.decode_fast(coeffs_mont[:, p_i])
                from .host import msm_host
                out.append(msm_host(self.points_host, scalars))
            return out
        G = Pp * W
        # window sums arrive mesh-reduced (replicated): same recombine
        # as the single-device path
        pts = decode_raw_jacobian(
            wx.reshape(FQ.L, G), wy.reshape(FQ.L, G), wz.reshape(FQ.L, G))
        return recombine_windows(pts, Pp, W, c)

    def commit_mont(self, coeffs_mont):
        return self.commit_mont_batch(coeffs_mont[:, None, :])[0]
