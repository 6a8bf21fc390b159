"""Device (TPU) prover: JAX/limb-array numeric cores for the 5-round protocol.

This is the performance path of the framework (SURVEY.md §3.2 "primary
target for TPU kernels"): every O(n)/O(n log n) stage of
`prover.rs:163-638` runs vectorized on device:

- round 1: batched iNTT of the 4 wire columns
- round 2: table/query compression (Horner by zeta) on device; the
  order-sensitive `combine_split` bucket sort stays on host (SURVEY §7.3)
- round 3: z(X)/z2(X) grand products as batch-inverse + associative prefix
  scans (replacing the reference's serial loops, permutation/mod.rs:733-747)
- round 4: one batched coset-NTT to 4n, fully fused pointwise widget
  evaluation, multiply by the period-4 v_H^{-1} table, coset-iNTT
- round 5: polynomial evaluations as powers-of-z reductions, linearisation
  assembly, synthetic division via an associative linear-recurrence scan

Commitments currently decode coefficients to the host MSM; the device
Pippenger (curve/msm.py) replaces that hook.

Cross-checked against the host golden path in tests/test_device_prover.py
(same deterministic RNG -> identical proofs).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import host
from ..fields.host import R
from ..fields.jaxfield import FR, U32
from ..fields.fview import Fv, fv_const
from ..fields.limb import encode_ints
from ..poly import ntt
from ..circuit.composer import K1, K2, K3, SELECTOR_NAMES
from . import device_widgets as dw
from .preprocess import compute_vanishing_poly_over_coset


# ---------------------------------------------------------------------------
# small device primitives
# ---------------------------------------------------------------------------

def powers_of(x, n: int):
    """(L,1) scalar -> (L,n) powers [1, x, x^2, ...] via associative scan."""
    ones = FR.ones((1,))
    rest = jnp.broadcast_to(x, (FR.L, n - 1)) if n > 1 else x[:, :0]
    elems = jnp.concatenate([ones, rest], axis=1)
    return jax.lax.associative_scan(FR.mont_mul, elems, axis=1)


def sum_reduce(x):
    """Field sum along the last axis: (L, ..., n) -> (L, ..., 1)."""
    n = x.shape[-1]
    while n > 1:
        half = n // 2
        lo = x[..., :half]
        hi = x[..., half:2 * half]
        rem = x[..., 2 * half:]
        x = jnp.concatenate([FR.add(lo, hi), rem], axis=-1)
        n = x.shape[-1]
    return x


def eval_polys(coeffs, zpows):
    """Evaluate (L, P, n) coefficient stack at a point given its (L, n)
    power table. Returns (L, P)."""
    prod = FR.mont_mul(coeffs, zpows[:, None, :])
    return sum_reduce(prod)[..., 0]


def shifted_prefix_product(ratios):
    """[1, r0, r0 r1, ...] of length n (drops the total product)."""
    n = ratios.shape[-1]
    incl = jax.lax.associative_scan(FR.mont_mul, ratios, axis=1)
    return jnp.concatenate([FR.ones((1,)), incl[:, :n - 1]], axis=1)


def divide_by_linear(coeffs, z):
    """Synthetic division of (L, n) coeffs by (X - z); the remainder
    (= p(z)) is dropped.  q_i = c_{i+1} + z q_{i+1}: a first-order linear
    recurrence, solved with an associative scan over (A=z, B=c) pairs."""
    n = coeffs.shape[-1]
    c_rev = jnp.flip(coeffs[:, 1:], axis=1)  # c_{n-1} ... c_1
    zb = jnp.broadcast_to(z, (FR.L, n - 1))

    def combine(x, y):
        ax, bx = x
        ay, by = y
        return FR.mont_mul(ax, ay), FR.add(FR.mont_mul(bx, ay), by)

    _, q_rev = jax.lax.associative_scan(combine, (zb, c_rev), axis=1)
    return jnp.flip(q_rev, axis=1)  # q_0 .. q_{n-2}


# ---------------------------------------------------------------------------
# jitted stage cores (cached per size)
# ---------------------------------------------------------------------------

def _mesh_safe(fn, mesh_axes):
    """Force the jnp field path while tracing mesh-sharded programs
    (pallas_call cannot be auto-partitioned)."""
    if mesh_axes is None:
        return fn

    def wrapper(*args):
        with FR.pallas_disabled():
            return fn(*args)

    return wrapper


def _scan_ops(mesh_axes):
    """(batch_inv, exclusive_prefix_mul) — local or distributed."""
    if mesh_axes is None:
        return FR.batch_inv_scan, shifted_prefix_product
    from ..mesh import scans as dscans
    mesh, ax = mesh_axes
    return (dscans.make_batch_inv(mesh, ax),
            dscans.make_exclusive_prefix_mul(mesh, ax))


@functools.lru_cache(maxsize=None)
def _z_poly_fn(n: int, mesh_axes=None):
    batch_inv, excl_prefix = _scan_ops(mesh_axes)
    kvec = jnp.asarray(encode_ints(
        [k * FR.R_mod % R for k in (1, K1, K2, K3)], FR.L)).reshape(FR.L, 4, 1)

    @jax.jit
    def f(dd, wires, sigma_lag, beta, gamma):
        roots = dd.roots[:, None, :]
        beta_b = beta[:, :, None]
        gamma_b = gamma[:, :, None]
        num_t = FR.add(FR.add(wires, FR.mont_mul(
            FR.mont_mul(beta_b, kvec), roots)), gamma_b)
        den_t = FR.add(FR.add(wires, FR.mont_mul(beta_b, sigma_lag)), gamma_b)

        def prod4(t):
            return FR.mont_mul(FR.mont_mul(t[:, 0], t[:, 1]),
                               FR.mont_mul(t[:, 2], t[:, 3]))

        num = prod4(num_t)
        den = prod4(den_t)
        ratios = FR.mont_mul(num, batch_inv(den))
        z_evals = excl_prefix(ratios)
        return ntt.intt(z_evals, dd, mesh_axes)

    return _mesh_safe(f, mesh_axes)


@functools.lru_cache(maxsize=None)
def _z2_poly_fn(n: int, mesh_axes=None):
    batch_inv, excl_prefix = _scan_ops(mesh_axes)

    @jax.jit
    def f(dd, fq, t, h1, h2, delta, epsilon):
        n_ = t.shape[-1]
        roll1 = (jax.lax.broadcasted_iota(jnp.int32, (n_, 1), 0)
                 .squeeze(-1) + 1) % n_
        t_next = ntt._gather_last(t, roll1, mesh_axes)
        h1_next = ntt._gather_last(h1, roll1, mesh_axes)
        one = FR.ones((1,))
        opd = FR.add(delta, one)
        eps_opd = FR.mont_mul(epsilon, opd)
        num = FR.mont_mul(FR.mont_mul(opd, FR.add(epsilon, fq)),
                          FR.add(FR.add(eps_opd, t),
                                 FR.mont_mul(delta, t_next)))
        den = FR.mont_mul(
            FR.add(FR.add(eps_opd, h1), FR.mont_mul(h2, delta)),
            FR.add(FR.add(eps_opd, h2), FR.mont_mul(h1_next, delta)))
        ratios = FR.mont_mul(num, batch_inv(den))
        z2_evals = excl_prefix(ratios)
        return ntt.intt(z2_evals, dd, mesh_axes)

    return _mesh_safe(f, mesh_axes)


@functools.lru_cache(maxsize=None)
def _wire_intt_fn(n: int, mesh_axes=None):
    @jax.jit
    def f(dd, wire_evals):  # (L, B, n)
        return ntt.intt(wire_evals, dd, mesh_axes)

    return _mesh_safe(f, mesh_axes)


@functools.lru_cache(maxsize=None)
def _compress_fn(n: int, mesh_axes=None):
    @jax.jit
    def f(cols, zeta):  # (L, 4, n), (L, 1)
        acc = cols[:, 3]
        for k in (2, 1, 0):
            acc = FR.add(FR.mont_mul(acc, zeta), cols[:, k])
        return acc

    return _mesh_safe(f, mesh_axes)


@functools.lru_cache(maxsize=None)
def _query_fn(n: int, mesh_axes=None):
    """Build the compressed query column f: wire compression where
    q_lookup is set, else the table's first entry (prover.rs:252-275).
    The t[0] broadcast is a masked reduction so it shards cleanly."""

    @jax.jit
    def f(cw, ct, mask):
        iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
        ct0 = jnp.sum(jnp.where((iota == 0)[None, :], ct, 0),
                      axis=-1, keepdims=True)
        return jnp.where(mask[None, :], cw,
                         jnp.broadcast_to(ct0, ct.shape))

    return _mesh_safe(f, mesh_axes)


@functools.lru_cache(maxsize=None)
def _tsplit_fn(n: int, mesh_axes=None):
    """(L, 4n) quotient coeffs -> (L, 4, n) t1..t4 chunks
    (prover.rs:107-123 split_tx_poly), shard-safe."""

    @jax.jit
    def f(t):
        if mesh_axes is None:
            return t.reshape(FR.L, 4, n)
        from jax.sharding import NamedSharding, PartitionSpec as P
        sh = NamedSharding(mesh_axes[0], P(None, None, mesh_axes[1]))
        return jax.lax.reshape(t, (FR.L, 4, n), out_sharding=sh)

    return _mesh_safe(f, mesh_axes)


@functools.lru_cache(maxsize=None)
def _quotient_fn(n: int, mesh_axes=None):
    m = 4 * n
    # period-4 v_H^{-1} table over the coset
    vh = compute_vanishing_poly_over_coset(host.Domain(4 * n), n)[:4]
    vh_inv = host.batch_inv(vh)
    vh_inv_dev = jnp.asarray(encode_ints(
        [x * FR.R_mod % R for x in vh_inv], FR.L))

    @jax.jit
    def f(dd4, sel4, sig4, polys_n, challenges):
        """sel4: (L, 12, m) selector coset evals (order SELECTOR_NAMES)
        sig4: (L, 4, m); polys_n: (L, 12, n) coefficient stack of
        [z, wl, wr, wo, w4, z2, f, table, h1, h2, pi, l1];
        challenges: (L, 10, 1): alpha, beta, gamma, delta, epsilon, zeta,
        range, logic, fixed, var, lookup -> actually 11."""
        padded = jnp.concatenate(
            [polys_n, jnp.zeros((FR.L, polys_n.shape[1], m - n), U32)],
            axis=-1)
        evals = ntt.coset_ntt(padded, dd4, mesh_axes)
        (z4, wl4, wr4, wo4, w44, z24, f4, tb4, h14, h24, pi4, l14) = \
            [evals[:, i] for i in range(12)]
        (alpha, beta, gamma, delta, epsilon, zeta, range_ch, logic_ch,
         fixed_ch, var_ch, lookup_ch) = [Fv(challenges[:, i]) for i in range(11)]

        roll4_idx = (jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
                     .squeeze(-1) + 4) % m

        def nxt(x):
            # omega-shift: x[i+4] with wraparound (quotient_poly.rs:74-79);
            # gather form so the sharded axis lowers to a halo exchange
            return Fv(ntt._gather_last(x, roll4_idx, mesh_axes))

        sel = {name: Fv(sel4[:, i]) for i, name in enumerate(SELECTOR_NAMES)}
        s1, s2, s3, s4 = [Fv(sig4[:, i]) for i in range(4)]
        a, b, c, d = Fv(wl4), Fv(wr4), Fv(wo4), Fv(w44)
        a_n, b_n, d_n = nxt(wl4), nxt(wr4), nxt(w44)
        z, z_n = Fv(z4), nxt(z4)
        z2, z2_n = Fv(z24), nxt(z24)
        tb, tb_n = Fv(tb4), nxt(tb4)
        h1, h1_n = Fv(h14), nxt(h14)
        h2 = Fv(h24)
        fq = Fv(f4)
        l1 = Fv(l14)
        # linear evaluations over the coset: x = g * w^i  (the reference's
        # `linear_evaluations` table, preprocess.rs:205-212)
        x_lin = Fv(FR.mul_const(dd4.roots, 7))  # 7 = Fr generator g

        arith = dw.arithmetic(sel["q_m"], sel["q_l"], sel["q_r"], sel["q_o"],
                              sel["q_4"], sel["q_c"], sel["q_arith"],
                              a, b, c, d)
        rng = dw.range_constraint(range_ch, a, b, c, d, d_n) * sel["q_range"]
        logic = dw.logic_constraint(logic_ch, a, b, c, d, a_n, b_n, d_n,
                                    sel["q_c"]) * sel["q_logic"]
        fbsm = dw.fbsm_constraint(fixed_ch, a, b, c, d, a_n, b_n, d_n,
                                  sel["q_l"], sel["q_r"], sel["q_c"]) \
            * sel["q_fixed_group_add"]
        ca = dw.ca_constraint(var_ch, a, b, c, d, a_n, b_n, d_n) \
            * sel["q_variable_group_add"]
        gate = arith + Fv(pi4) + rng + logic + fbsm + ca

        l1_alpha_sq = l1 * alpha * alpha
        perm = dw.permutation_quotient(x_lin, s1, s2, s3, s4, a, b, c, d,
                                       z, z_n, alpha, l1_alpha_sq, beta,
                                       gamma)
        lookup = dw.lookup_quotient(sel["q_lookup"], a, b, c, d, fq, tb,
                                    tb_n, h1, h1_n, h2, z2, z2_n, l1,
                                    delta, epsilon, zeta, lookup_ch)

        total = (gate + perm + lookup).a
        vh_tiled = jnp.tile(vh_inv_dev, (1, m // 4))
        q = FR.mont_mul(total, vh_tiled)
        return ntt.coset_intt(q, dd4, mesh_axes)

    return _mesh_safe(f, mesh_axes)


def _replicate(x, mesh_axes):
    """Reshard onto every device (for cheap tail stages whose halving
    reductions / flips don't divide the shard count)."""
    if mesh_axes is None:
        return x
    from jax.sharding import NamedSharding, PartitionSpec as P
    return jax.sharding.reshard(x, NamedSharding(mesh_axes[0], P()))


@functools.lru_cache(maxsize=None)
def _eval_stack_fn(n: int, mesh_axes=None):
    @jax.jit
    def f(coeffs, z):  # (L, P, n), (L, 1) -> (L, P)
        coeffs = _replicate(coeffs, mesh_axes)
        z = _replicate(z, mesh_axes)
        zp = powers_of(z, n)
        return eval_polys(coeffs, zp)

    return _mesh_safe(f, mesh_axes)


@functools.lru_cache(maxsize=None)
def _eval_both_fn(n: int, mesh_axes=None):
    """Round-5 evaluation stacks at z AND z*omega in ONE dispatch,
    returning RAW limbs (host decodes with no further device calls —
    each sync costs ~28 ms on the tunnel backend)."""

    @jax.jit
    def f(z_stack, zw_stack, z, zw):
        z_stack = _replicate(z_stack, mesh_axes)
        zw_stack = _replicate(zw_stack, mesh_axes)
        z = _replicate(z, mesh_axes)
        zw = _replicate(zw, mesh_axes)
        evz = eval_polys(z_stack, powers_of(z, n))
        evzw = eval_polys(zw_stack, powers_of(zw, n))
        return FR.from_mont(evz), FR.from_mont(evzw)

    return _mesh_safe(f, mesh_axes)


@functools.lru_cache(maxsize=None)
def _lincomb_fn(n: int, mesh_axes=None):
    @jax.jit
    def f(coeffs, scalars):  # (L, P, n) x (L, P, 1) -> (L, n)
        prod = FR.mont_mul(coeffs, scalars)
        acc = prod[:, 0]
        for i in range(1, prod.shape[1]):
            acc = FR.add(acc, prod[:, i])
        return acc

    return _mesh_safe(f, mesh_axes)


@functools.lru_cache(maxsize=None)
def _open_fn(n: int, mesh_axes=None):
    @jax.jit
    def f(polys, chi, z):  # (L, P, n), (L,1), (L,1) -> witness coeffs (L, n)
        polys = _replicate(polys, mesh_axes)
        chi = _replicate(chi, mesh_axes)
        z = _replicate(z, mesh_axes)
        P = polys.shape[1]
        agg = polys[:, P - 1]
        for i in range(P - 2, -1, -1):
            agg = FR.add(FR.mont_mul(agg, chi), polys[:, i])
        zp = powers_of(z, n)
        v = sum_reduce(FR.mont_mul(agg, zp))[:, 0]
        agg = agg.at[:, 0].set(FR.sub(agg[:, 0], v))
        q = divide_by_linear(agg, z)
        return jnp.concatenate([q, jnp.zeros((FR.L, 1), U32)], axis=1)

    return _mesh_safe(f, mesh_axes)


# ---------------------------------------------------------------------------
# Device prover key + prover
# ---------------------------------------------------------------------------

def _enc_stack(lists):
    """List of int-lists (same length) -> (L, P, n) Montgomery device array."""
    flat = [x % R for lst in lists for x in lst]
    n = len(lists[0])
    raw = jnp.asarray(encode_ints(flat, FR.L)).reshape(FR.L, len(lists), n)
    return FR.to_mont(raw)


@functools.lru_cache(maxsize=None)
def _expand_narrow_fn(P: int, n: int, tier: str):
    """Jitted expander: narrow signed balanced residues -> (L, P, n)
    Montgomery limbs.  tier 'i32': input (P, n) int32; tier 'i64':
    input (P, n, 2) u32 two's-complement halves (|value| < 2^62)."""
    @jax.jit
    def f(packed):
        if tier == "i32":
            y = packed.astype(jnp.int32)
            neg = y < 0
            a = jnp.where(neg, -y, y).astype(U32)
            limbs = jnp.stack(
                [a & 0xFFFF, a >> 16]
                + [jnp.zeros((P, n), U32)] * (FR.L - 2), axis=0)
        else:
            lo, hi = packed[..., 0], packed[..., 1]
            neg = (hi >> 31).astype(jnp.bool_)
            nlo = (~lo) + jnp.uint32(1)
            carry = (nlo == 0) & neg
            alo = jnp.where(neg, nlo, lo)
            ahi = jnp.where(neg, (~hi) + carry.astype(U32), hi)
            limbs = jnp.stack(
                [alo & 0xFFFF, alo >> 16, ahi & 0xFFFF, ahi >> 16]
                + [jnp.zeros((P, n), U32)] * (FR.L - 4), axis=0)
            neg = neg[None]
        raw = jnp.where(neg if tier == "i64" else neg[None],
                        FR.sub(FR.zeros((P, n)), limbs), limbs)
        return FR.to_mont(raw)

    return f


def enc_stack_narrow(lists):
    """_enc_stack with a narrow upload: values are shipped as balanced
    residues (x or x - R, whichever is small) in the narrowest dtype
    that covers them — int32 or u32-pair int64 — and expanded to
    Montgomery limbs on device.  The tunnel moves ~1.3 MB/s, so the
    4-16x byte reduction dominates large-n upload time (at 2^18 full
    selector limbs are ~268 MB).  Falls back to full limbs when any
    value's balanced residue exceeds 62 bits."""
    half = R >> 1
    i32max = 1 << 31
    i62max = 1 << 62
    P, n = len(lists), len(lists[0])
    bal = np.empty((P, n), dtype=np.int64)
    tier = "i32"
    for i, lst in enumerate(lists):
        row = bal[i]
        for j, x in enumerate(lst):
            x %= R
            y = x if x <= half else x - R
            if y >= i62max or y < -i62max:
                return _enc_stack(lists)
            if y >= i32max or y < -i32max:
                tier = "i64"
            row[j] = y
    if tier == "i32":
        return _expand_narrow_fn(P, n, "i32")(
            jnp.asarray(bal.astype(np.int32)))
    halves = bal.view(np.uint32).reshape(P, n, 2)
    return _expand_narrow_fn(P, n, "i64")(jnp.asarray(halves))


def _dec_stack(arr):
    """(L, P, n) or (L, n) Montgomery device array -> nested int lists."""
    vals = FR.decode_fast(arr)
    if arr.ndim == 2:
        return vals
    n = arr.shape[-1]
    P = arr.shape[1]
    return [vals[i * n:(i + 1) * n] for i in range(P)]


class DeviceProverKey:
    """Device-resident preprocessed circuit (the TPU ProverKey).

    Holds the SRS G1 powers on device (PippengerMSM) so commitments never
    round-trip polynomial coefficients through the host."""

    def __init__(self, host_pk, srs=None):
        from .keys import SIGMA_ORDER
        self.host_pk = host_pk
        n = host_pk.n
        self.n = n

        def pad_to(lst, size):
            return list(lst) + [0] * (size - len(lst))

        # NOTE: stacked in composer SELECTOR_NAMES order (what _quotient_fn
        # and the round-5 indexing consume)
        self.sel_coeffs = _enc_stack(
            [pad_to(host_pk.selectors[s], n) for s in SELECTOR_NAMES])
        self.sel4 = _enc_stack(
            [host_pk.selectors_4n[s] for s in SELECTOR_NAMES])
        self.sig_coeffs = _enc_stack(
            [pad_to(host_pk.sigmas[s], n) for s in SIGMA_ORDER])
        self.sig4 = _enc_stack(
            [host_pk.sigmas_4n[s] for s in SIGMA_ORDER])
        self.sigma_lagrange = _enc_stack(host_pk.sigma_lagranges)
        self.table_cols = _enc_stack(
            [col.elems for col in host_pk.table_columns])
        self.msm = None
        if srs is not None:
            self.msm = make_device_msm(srs.g1[:n])

    @classmethod
    def from_device_arrays(cls, n, sel_coeffs, sel4, sig_coeffs, sig4,
                           sigma_lagrange, table_cols, msm):
        """Direct construction from the device preprocess (no host
        ProverKey materialized)."""
        self = cls.__new__(cls)
        self.host_pk = None
        self.n = n
        self.sel_coeffs = sel_coeffs
        self.sel4 = sel4
        self.sig_coeffs = sig_coeffs
        self.sig4 = sig4
        self.sigma_lagrange = sigma_lagrange
        self.table_cols = table_cols
        self.msm = msm
        return self


def make_device_msm(points):
    """Device MSM selection: v3 (chunked streaming kernels) by default;
    ARKPLONK_MSM=v2 -> per-round launches, v1 -> round-1 scan MSM."""
    import os
    sel = os.environ.get("ARKPLONK_MSM", "v3")
    if sel == "v1":
        from ..curve.msm import DeviceMSM
        return DeviceMSM(points)
    if sel == "v2":
        from ..curve.msm2 import PippengerMSM
        return PippengerMSM(points)
    from ..curve.msm3 import PippengerMSM3
    return PippengerMSM3(points)


class DeviceProver:
    """Drop-in replacement for proving.prover.Prover with device cores.

    Shares the host Prover's composer/transcript/preprocess; overrides the
    numeric pipeline of prove_with_preprocessed.

    `mesh`: an optional jax.sharding.Mesh — the full 5-round pipeline
    then runs with every evaluation-domain axis sharded over it
    (SURVEY §2.3 / §5.7-5.8): NTT gathers lower to collectives, grand
    products to distributed scans, and commitments to the point-sharded
    Pippenger with per-shard window sums."""

    def __init__(self, label: bytes, rng=None, msm=None, mesh=None):
        from .prover import Prover
        self._host = Prover(label, rng=rng, msm=msm)
        self.msm = msm
        self.mesh = mesh
        self.mesh_axes = (mesh, "x") if mesh is not None else None
        self.device_pk = None

    @property
    def cs(self):
        return self._host.cs

    @property
    def prover_key(self):
        return self._host.prover_key

    def key_transcript(self, label, message):
        self._host.key_transcript(label, message)

    def circuit_bound(self):
        return self._host.circuit_bound()

    def preprocess(self, srs):
        import os
        if os.environ.get("ARKPLONK_HOST_PREPROCESS") == "1":
            pk = self._host.preprocess(srs)
            self.device_pk = DeviceProverKey(pk, srs=srs)
            return pk
        from .device_preprocess import device_preprocess
        if self._host.prover_key is not None or self.device_pk is not None:
            raise ValueError("circuit already preprocessed")
        n = self._host.cs.circuit_bound()
        if self.msm is not None:
            msm = self.msm
        elif self.mesh is not None:
            from ..curve.msm2 import ShardedPippengerMSM
            msm = ShardedPippengerMSM(self.mesh, srs.g1[:n])
        else:
            msm = make_device_msm(srs.g1[:n])
        dpk, vk = device_preprocess(
            self._host.cs, srs, self._host.preprocessed_transcript, msm)
        if self.mesh is not None:
            from ..mesh import sharding as ms
            for attr in ("sel_coeffs", "sel4", "sig_coeffs", "sig4",
                         "sigma_lagrange", "table_cols"):
                setattr(dpk, attr,
                        ms.put_sharded(self.mesh, getattr(dpk, attr)))
        self.device_pk = dpk
        self._host.verifier_key = vk
        return dpk

    def clear_witness(self):
        self._host.clear_witness()

    def prove(self, srs):
        if self.device_pk is None:
            self.preprocess(srs)
        proof = self.prove_with_preprocessed(srs, self.device_pk)
        self.clear_witness()
        return proof

    # ------------------------------------------------------------------

    def prove_with_preprocessed(self, srs, dpk: DeviceProverKey):
        import os as _os
        import time as _time
        _timing = _os.environ.get("ARKPLONK_TIMING")
        _t0 = _time.time()

        def _mark(label):
            nonlocal _t0
            if _timing:
                now = _time.time()
                print(f"[timing] {label}: {now - _t0:.3f}s", flush=True)
                _t0 = now
        from ..pcs import kzg
        from ..circuit.lookup_table import MultiSet
        from . import pi as pi_mod
        from . import widgets
        from .proof import Proof
        from .linearisation import (ProofEvaluations,
                                    compute_first_lagrange_evaluation)
        from ..circuit.lookup_table import lc
        from ..circuit.composer import K1, K2, K3

        cs = self._host.cs
        hd = host.Domain(cs.circuit_bound())
        n = hd.size
        ma = self.mesh_axes
        if ma is None and _os.environ.get("ARKPLONK_MEGA", "1") == "1":
            # whole-prove single dispatch (device transcript); falls
            # through to the per-round path on MSM anomaly or v2 MSM
            from . import device_mega
            proof = device_mega.prove_mega(self, dpk)
            if proof is not None:
                _mark("mega prove (single dispatch)")
                return proof
        # fused one-dispatch-per-round path (single device only);
        # commitments go through the SHARED MSM program inside
        # commit_mont_batch (curve/msm3._msm_win_fn)
        from ..curve.msm2 import PippengerMSM
        from ..curve.msm3 import PippengerMSM3
        from . import device_rounds as dr
        fused = ma is None and isinstance(dpk.msm,
                                          (PippengerMSM, PippengerMSM3))
        ddn = ntt.get_device_domain(n)

        def shard(x):
            if ma is None:
                return x
            from ..mesh import sharding as ms
            return ms.put_sharded(ma[0], x)

        transcript = self._host.preprocessed_transcript.clone()
        transcript.append_pi(b"pi", pi_mod.to_bytes(cs.public_inputs))

        def commit(coeff_ints):
            return kzg.commit(srs, coeff_ints, msm=self.msm)

        def commit_dev(coeff_arr):
            return commit_batch([coeff_arr])[0]

        def commit_batch(coeff_arrs):
            """Commit several (L, n) coeff arrays (or a prepared
            (L, P, n) stack) in ONE batched MSM call.  Always padded to
            P=4 so a single compiled executable serves every commitment
            in the prove (zero poly -> identity -> None, matching
            kzg.commit's None convention)."""
            if dpk.msm is None:
                if not isinstance(coeff_arrs, list):
                    coeff_arrs = [coeff_arrs[:, i]
                                  for i in range(coeff_arrs.shape[1])]
                return [commit(_dec_stack(a)) for a in coeff_arrs]
            if isinstance(coeff_arrs, list):
                P = len(coeff_arrs)
                stack = jnp.stack(coeff_arrs, axis=1)
            else:
                stack = coeff_arrs
                P = stack.shape[1]
            if P < 4:
                stack = jnp.concatenate(
                    [stack, jnp.zeros((FR.L, 4 - P, n), U32)], axis=1)
            return dpk.msm.commit_mont_batch(stack)[:P]

        def enc_scalar(x):
            return jnp.asarray(FR.encode(x % R)).reshape(FR.L, 1)

        # --- Round 1: witness polys (+ PI poly in the same batched iNTT) --
        pad = [0] * (n - len(cs.w_l))
        w_scalars = [[cs.variables[v] for v in w] + pad
                     for w in (cs.w_l, cs.w_r, cs.w_o, cs.w_4)]
        pi_evals = pi_mod.as_evals(cs.public_inputs, n)
        wire_evals = shard(_enc_stack(w_scalars + [pi_evals]))  # (L, 5, n)
        wire_coeffs5 = _wire_intt_fn(n, ma)(ddn, wire_evals)
        w_comms = commit_batch(wire_coeffs5[:, :4])
        wire_coeffs = wire_coeffs5[:, :4]
        pi_poly_dev = wire_coeffs5[:, 4]
        for lbl, cm in zip([b"w_l", b"w_r", b"w_o", b"w_4"], w_comms):
            transcript.append_g1(lbl, cm)

        _mark("round1 wires+commits")
        # --- Round 2: plookup --------------------------------------------
        zeta = transcript.challenge_scalar(b"zeta")
        transcript.append_fr(b"zeta", zeta)
        zeta_d = enc_scalar(zeta)

        q_lookup_padded = cs.q_lookup + [0] * (n - len(cs.q_lookup))
        mask = np.array([q % R != 0 for q in q_lookup_padded])
        if fused:
            cf_dev, lookup_evals_dev, lookup_coeffs, bad_flag = \
                dr.r2_fn(n)(ddn, dpk.table_cols, wire_evals,
                            jnp.asarray(mask), zeta_d)
            if bool(jax.device_get(bad_flag)):
                from ..errors import ElementNotIndexed
                raise ElementNotIndexed("lookup query element not in table")
            ct_dev = lookup_evals_dev[:, 0]
            f_comm, h_1_comm, h_2_comm = commit_batch(lookup_coeffs[:, 1:4])
        else:
            ct_dev = _compress_fn(n, ma)(dpk.table_cols, zeta_d)   # (L, n)
            cw_dev = _compress_fn(n, ma)(wire_evals[:, :4], zeta_d)
            cf_dev = _query_fn(n, ma)(cw_dev, ct_dev,
                                      shard(jnp.asarray(mask)))
            from .device_lookup import combine_split_device
            h1_dev, h2_dev, bad_flag = combine_split_device(
                ct_dev, cf_dev, ma)
            if bool(jax.device_get(bad_flag)):
                from ..errors import ElementNotIndexed
                raise ElementNotIndexed("lookup query element not in table")
            lookup_evals_dev = jnp.stack(
                [ct_dev, cf_dev, h1_dev, h2_dev], axis=1)  # [t, f, h1, h2]
            lookup_coeffs = _wire_intt_fn(n, ma)(ddn, lookup_evals_dev)
            f_comm, h_1_comm, h_2_comm = commit_batch(
                [lookup_coeffs[:, 1], lookup_coeffs[:, 2],
                 lookup_coeffs[:, 3]])
        table_poly_dev = lookup_coeffs[:, 0]
        f_poly_dev = lookup_coeffs[:, 1]
        h1_poly_dev = lookup_coeffs[:, 2]
        h2_poly_dev = lookup_coeffs[:, 3]
        transcript.append_g1(b"f", f_comm)
        transcript.append_g1(b"h1", h_1_comm)
        transcript.append_g1(b"h2", h_2_comm)

        _mark("round2 lookup+commits")
        # --- Round 3: grand products -------------------------------------
        beta = transcript.challenge_scalar(b"beta")
        transcript.append_fr(b"beta", beta)
        gamma = transcript.challenge_scalar(b"gamma")
        transcript.append_fr(b"gamma", gamma)
        delta = transcript.challenge_scalar(b"delta")
        transcript.append_fr(b"delta", delta)
        epsilon = transcript.challenge_scalar(b"epsilon")
        transcript.append_fr(b"epsilon", epsilon)
        assert len({beta, gamma, delta, epsilon}) == 4

        if fused:
            z_poly_dev, z2_poly_dev = dr.r3_fn(n)(
                ddn, wire_evals, dpk.sigma_lagrange, cf_dev,
                lookup_evals_dev, enc_scalar(beta), enc_scalar(gamma),
                enc_scalar(delta), enc_scalar(epsilon))
        else:
            z_poly_dev = _z_poly_fn(n, ma)(
                ddn, wire_evals[:, :4], dpk.sigma_lagrange,
                enc_scalar(beta), enc_scalar(gamma))
            z2_poly_dev = _z2_poly_fn(n, ma)(ddn, cf_dev, ct_dev,
                                             lookup_evals_dev[:, 2],
                                             lookup_evals_dev[:, 3],
                                             enc_scalar(delta),
                                             enc_scalar(epsilon))
        z_comm, z_2_comm = commit_batch([z_poly_dev, z2_poly_dev])
        transcript.append_g1(b"z", z_comm)

        _mark("round3 z/z2+commits")
        # --- Round 4: quotient -------------------------------------------
        alpha = transcript.challenge_scalar(b"alpha")
        transcript.append_fr(b"alpha", alpha)
        range_ch = transcript.challenge_scalar(b"range separation challenge")
        transcript.append_fr(b"range seperation challenge", range_ch)
        logic_ch = transcript.challenge_scalar(b"logic separation challenge")
        transcript.append_fr(b"logic seperation challenge", logic_ch)
        fixed_ch = transcript.challenge_scalar(
            b"fixed base separation challenge")
        transcript.append_fr(b"fixed base separation challenge", fixed_ch)
        var_ch = transcript.challenge_scalar(
            b"variable base separation challenge")
        transcript.append_fr(b"variable base separation challenge", var_ch)
        lookup_ch = transcript.challenge_scalar(
            b"lookup separation challenge")
        transcript.append_fr(b"lookup separation challenge", lookup_ch)

        l1_poly_dev = jnp.broadcast_to(
            jnp.asarray(FR.encode(hd.size_inv)).reshape(FR.L, 1), (FR.L, n))
        polys_n = jnp.stack(
            [z_poly_dev, wire_coeffs[:, 0], wire_coeffs[:, 1],
             wire_coeffs[:, 2], wire_coeffs[:, 3], z2_poly_dev, f_poly_dev,
             table_poly_dev, h1_poly_dev, h2_poly_dev, pi_poly_dev,
             l1_poly_dev], axis=1)
        chal_stack = jnp.stack(
            [enc_scalar(x) for x in
             (alpha, beta, gamma, delta, epsilon, zeta, range_ch, logic_ch,
              fixed_ch, var_ch, lookup_ch)], axis=1)
        dd4 = ntt.get_device_domain(4 * n)
        if fused:
            t_stack = dr.r4_fn(n)(dd4, dpk.sel4, dpk.sig4, polys_n,
                                  chal_stack)
        else:
            t_coeffs = _quotient_fn(n, ma)(dd4, dpk.sel4, dpk.sig4,
                                           polys_n, chal_stack)
            t_stack = _tsplit_fn(n, ma)(t_coeffs)  # (L, 4, n)
        t_comms = commit_batch(t_stack)
        for lbl, cm in zip([b"t_1", b"t_2", b"t_3", b"t_4"], t_comms):
            transcript.append_g1(lbl, cm)

        _mark("round4 quotient+commits")
        # --- Round 5: evaluations + linearisation + openings -------------
        z_challenge = transcript.challenge_scalar(b"z")
        transcript.append_fr(b"z", z_challenge)
        shifted_z = z_challenge * hd.group_gen % R

        # evaluation stacks
        sel_idx = {nme: i for i, nme in enumerate(SELECTOR_NAMES)}
        z_stack = jnp.concatenate([
            wire_coeffs,                                 # a, b, c, d
            dpk.sig_coeffs[:, 0:3],                      # sigma 1..3
            dpk.sel_coeffs[:, sel_idx["q_arith"]][:, None],
            dpk.sel_coeffs[:, sel_idx["q_lookup"]][:, None],
            dpk.sel_coeffs[:, sel_idx["q_c"]][:, None],
            dpk.sel_coeffs[:, sel_idx["q_l"]][:, None],
            dpk.sel_coeffs[:, sel_idx["q_r"]][:, None],
            f_poly_dev[:, None], h1_poly_dev[:, None], h2_poly_dev[:, None],
            table_poly_dev[:, None]], axis=1)
        zw_stack = jnp.stack(
            [z_poly_dev, wire_coeffs[:, 0], wire_coeffs[:, 1],
             wire_coeffs[:, 3], h1_poly_dev, z2_poly_dev, table_poly_dev],
            axis=1)
        _mark("r5: build stacks")
        evz_raw, evzw_raw = jax.device_get(_eval_both_fn(n, ma)(
            z_stack, zw_stack, enc_scalar(z_challenge),
            enc_scalar(shifted_z)))
        from ..fields.limb import limbs_to_vec
        evz = limbs_to_vec(np.asarray(evz_raw))
        evzw = limbs_to_vec(np.asarray(evzw_raw))
        _mark("r5: eval@z,zw + decode")
        (a_eval, b_eval, c_eval, d_eval, sig1_eval, sig2_eval, sig3_eval,
         q_arith_eval, q_lookup_eval, q_c_eval, q_l_eval, q_r_eval,
         f_eval, h1_eval, h2_eval, table_eval) = evz
        (perm_eval, a_next_eval, b_next_eval, d_next_eval, h1_next_eval,
         z2_next_eval, table_next_eval) = evzw

        ev = ProofEvaluations(
            a_eval=a_eval, b_eval=b_eval, c_eval=c_eval, d_eval=d_eval,
            left_sigma_eval=sig1_eval, right_sigma_eval=sig2_eval,
            out_sigma_eval=sig3_eval, permutation_eval=perm_eval,
            q_lookup_eval=q_lookup_eval, z2_next_eval=z2_next_eval,
            h1_eval=h1_eval, h1_next_eval=h1_next_eval, h2_eval=h2_eval,
            f_eval=f_eval, table_eval=table_eval,
            table_next_eval=table_next_eval,
            custom_evals=(
                ("q_arith_eval", q_arith_eval),
                ("q_c_eval", q_c_eval),
                ("q_l_eval", q_l_eval),
                ("q_r_eval", q_r_eval),
                ("a_next_eval", a_next_eval),
                ("b_next_eval", b_next_eval),
                ("d_next_eval", d_next_eval),
            ))

        # linearisation scalars (host ints, same formulas as the verifier)
        vanishing_eval = (pow(z_challenge, n, R) - 1) % R
        z_to_n = (vanishing_eval + 1) % R
        l1_eval = compute_first_lagrange_evaluation(
            n, vanishing_eval, z_challenge)

        scalars = {}
        scalars["q_m"] = a_eval * b_eval % R * q_arith_eval % R
        scalars["q_l"] = a_eval * q_arith_eval % R
        scalars["q_r"] = b_eval * q_arith_eval % R
        scalars["q_o"] = c_eval * q_arith_eval % R
        scalars["q_4"] = d_eval * q_arith_eval % R
        scalars["q_c"] = q_arith_eval
        scalars["q_arith"] = 0  # q_arith itself has no linearisation term
        scalars["q_range"] = widgets.range_constraint(
            range_ch, a_eval, b_eval, c_eval, d_eval, d_next_eval)
        scalars["q_logic"] = widgets.logic_constraint(
            logic_ch, a_eval, b_eval, c_eval, d_eval, a_next_eval,
            b_next_eval, d_next_eval, q_c_eval)
        scalars["q_fixed_group_add"] = widgets.fbsm_constraint(
            fixed_ch, a_eval, b_eval, c_eval, d_eval, a_next_eval,
            b_next_eval, d_next_eval, q_l_eval, q_r_eval, q_c_eval)
        scalars["q_variable_group_add"] = widgets.ca_constraint(
            var_ch, a_eval, b_eval, c_eval, d_eval, a_next_eval,
            b_next_eval, d_next_eval)
        # lookup
        lookup_sq = lookup_ch * lookup_ch % R
        lookup_cu = lookup_sq * lookup_ch % R
        opd = (delta + 1) % R
        eps_opd = epsilon * opd % R
        compressed = lc([a_eval, b_eval, c_eval, d_eval], zeta)
        scalars["q_lookup_lin"] = (compressed - f_eval) * lookup_ch % R
        z2_scalar = (opd * ((epsilon + f_eval) % R) % R
                     * ((eps_opd + table_eval + delta * table_next_eval) % R)
                     % R * lookup_sq + l1_eval * lookup_cu) % R
        h1_scalar = (-z2_next_eval) * lookup_sq % R \
            * ((eps_opd + h2_eval + delta * h1_next_eval) % R) % R
        # permutation
        beta_z = beta * z_challenge % R
        ident = (a_eval + beta_z + gamma) % R \
            * ((b_eval + K1 * beta_z + gamma) % R) % R \
            * ((c_eval + K2 * beta_z + gamma) % R) % R \
            * ((d_eval + K3 * beta_z + gamma) % R) % R * alpha % R
        z_scalar = (ident + l1_eval * alpha % R * alpha) % R
        copy = (a_eval + beta * sig1_eval + gamma) % R \
            * ((b_eval + beta * sig2_eval + gamma) % R) % R \
            * ((c_eval + beta * sig3_eval + gamma) % R) % R \
            * beta % R * perm_eval % R * alpha % R
        sig4_scalar = (-copy) % R
        # quotient pieces
        t1_s = (-vanishing_eval) % R
        t2_s = t1_s * z_to_n % R
        t3_s = t2_s * z_to_n % R
        t4_s = t3_s * z_to_n % R

        lin_stack = jnp.concatenate([
            dpk.sel_coeffs,                       # 12 selectors
            z_poly_dev[:, None],                  # z (combined scalar)
            dpk.sig_coeffs[:, 3][:, None],        # fourth sigma
            h1_poly_dev[:, None], z2_poly_dev[:, None],
            t_stack], axis=1)
        order = SELECTOR_NAMES
        lin_scalars = [scalars[nme] if nme != "q_lookup"
                       else scalars["q_lookup_lin"] for nme in order]
        lin_scalars += [z_scalar, sig4_scalar, h1_scalar, z2_scalar,
                        t1_s, t2_s, t3_s, t4_s]
        lin_scalar_dev = _enc_stack([[s] for s in lin_scalars])
        lin_poly_dev = _lincomb_fn(n, ma)(lin_stack, lin_scalar_dev)
        _mark("r5: linearisation")

        # transcript: evaluations
        transcript.append_fr(b"a_eval", a_eval)
        transcript.append_fr(b"b_eval", b_eval)
        transcript.append_fr(b"c_eval", c_eval)
        transcript.append_fr(b"d_eval", d_eval)
        transcript.append_fr(b"left_sig_eval", sig1_eval)
        transcript.append_fr(b"right_sig_eval", sig2_eval)
        transcript.append_fr(b"out_sig_eval", sig3_eval)
        transcript.append_fr(b"perm_eval", perm_eval)
        transcript.append_fr(b"f_eval", f_eval)
        transcript.append_fr(b"q_lookup_eval", q_lookup_eval)
        transcript.append_fr(b"lookup_perm_eval", z2_next_eval)
        transcript.append_fr(b"h_1_eval", h1_eval)
        transcript.append_fr(b"h_1_next_eval", h1_next_eval)
        transcript.append_fr(b"h_2_eval", h2_eval)
        for label, val in ev.custom_evals:
            transcript.append_fr(label.encode(), val)

        # NOTE: nothing is appended between the two aggregate challenges
        # (the openings are not transcript inputs, prover.rs:563-618), so
        # both can be drawn up front and the openings batched.
        aw_challenge = transcript.challenge_scalar(b"aggregate_witness")
        saw_challenge = transcript.challenge_scalar(b"aggregate_witness")
        aw_stack = jnp.concatenate([
            lin_poly_dev[:, None], dpk.sig_coeffs[:, 0:3],
            f_poly_dev[:, None], h2_poly_dev[:, None],
            table_poly_dev[:, None], wire_coeffs], axis=1)
        saw_stack = jnp.stack(
            [z_poly_dev, wire_coeffs[:, 0], wire_coeffs[:, 1],
             wire_coeffs[:, 3], h1_poly_dev, z2_poly_dev, table_poly_dev],
            axis=1)
        if fused:
            open_stack = dr.r5_fn(n)(
                aw_stack, saw_stack, enc_scalar(aw_challenge),
                enc_scalar(saw_challenge), enc_scalar(z_challenge),
                enc_scalar(shifted_z))
            aw_c, saw_c = commit_batch(open_stack)
        else:
            aw_w = _open_fn(n, ma)(aw_stack, enc_scalar(aw_challenge),
                                   enc_scalar(z_challenge))
            saw_w = _open_fn(n, ma)(saw_stack, enc_scalar(saw_challenge),
                                    enc_scalar(shifted_z))
            aw_c, saw_c = commit_batch([aw_w, saw_w])
        aw_opening = kzg.OpeningProof(aw_c)
        saw_opening = kzg.OpeningProof(saw_c)
        _mark("r5: opens+commits")

        _mark("round5 evals+openings")
        return Proof(
            a_comm=w_comms[0], b_comm=w_comms[1], c_comm=w_comms[2],
            d_comm=w_comms[3], z_comm=z_comm, f_comm=f_comm,
            h_1_comm=h_1_comm, h_2_comm=h_2_comm, z_2_comm=z_2_comm,
            t_1_comm=t_comms[0], t_2_comm=t_comms[1], t_3_comm=t_comms[2],
            t_4_comm=t_comms[3], aw_opening=aw_opening,
            saw_opening=saw_opening, evaluations=ev)
