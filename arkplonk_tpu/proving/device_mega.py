"""Pipelined device-transcript prover: ~16 chained dispatches, ZERO host
syncs per proof.

The tunneled TPU costs ~50-200 ms per device<->host transfer (and
~1.3 MB/s of bandwidth), so the per-round structure — fetch window sums,
serialize commitments, squeeze challenges on host, upload scalars —
pays ~0.5-1 s of wire time per round even with fused round programs.

Here Fiat-Shamir runs ON DEVICE (transcript/device_strobe.py, byte-exact
vs the host Merlin/STROBE-128): every commitment is recombined,
normalized to affine and ark-serialized on device (curve/device_finish),
absorbed into the traced 200-byte STROBE state, and the next round's
challenges are squeezed without leaving HBM.  All dispatches are
enqueued back-to-back (the STROBE state + challenge scalars chain
device-to-device); the host performs exactly ONE upload (witness wires)
and ONE fetch (a single flat vector: 15 affine points + 23 evaluations +
anomaly/error flags, ~4 KB) per proof.

Compile-unit structure (round 4 redesign): each protocol round is split
at its commitment boundary into a COMPUTE piece (a1..a5) and a
FINISH/transcript piece (b1..b5), with the commitment running through
the ONE shared MSM program (curve/msm3._msm_win_fn, P=4, smaller
batches zero-padded).  The round-2/3 design inlined the whole MSM body
(bucket accumulation + 16 statically-unrolled Mosaic reduction steps)
into every round program: ~145 MB of serialized executable per round,
i.e. ~750 MB of compile artifacts per circuit size pushed through a
~1.3 MB/s tunnel on every cold compile AND every warm cache load.  The
split + sharing cuts total executable bytes ~10x while keeping the
zero-sync pipeline (the extra dispatches are device-to-device chained,
~3-5 ms each).  For the same reason the NTT domain tables are runtime
arguments (poly/ntt.DeviceDomain pytree), not closure constants.

The STROBE byte schedule depends only on static label/length sequences,
so the transcript cursor (pos/pos_begin/flags) is captured at BUILD time
by abstract tracing (jax.eval_shape) and baked into the next transcript
piece's program as static ints.

Round structure and transcript labels mirror proving/device.py (itself
byte-identical to the host golden path), reference prover.rs:163-638.
On an MSM equal-x anomaly (probability ~2^-240 per add on random
challenge data) the caller falls back to the per-round path, which
reproduces the identical proof deterministically.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import host
from ..fields.host import R
from ..fields.jaxfield import FR, FQ, U32
from ..fields.fview import Fv
from ..poly import ntt
from ..circuit.composer import K1, K2, K3, SELECTOR_NAMES
from ..curve import msm3
from ..curve.msm2 import pick_window, _window_plan
from ..transcript.device_strobe import DeviceStrobe, DeviceTranscript
from . import device_widgets as dw
from . import device as dv


# transcript append schedule for the round-5 evaluations:
# (label, which stack, index) — order matches device.py / prover.rs:514-554
_EVAL_APPENDS = [
    (b"a_eval", 0, 0), (b"b_eval", 0, 1), (b"c_eval", 0, 2),
    (b"d_eval", 0, 3), (b"left_sig_eval", 0, 4), (b"right_sig_eval", 0, 5),
    (b"out_sig_eval", 0, 6), (b"perm_eval", 1, 0), (b"f_eval", 0, 12),
    (b"q_lookup_eval", 0, 8), (b"lookup_perm_eval", 1, 5),
    (b"h_1_eval", 0, 13), (b"h_1_next_eval", 1, 4), (b"h_2_eval", 0, 14),
    (b"q_arith_eval", 0, 7), (b"q_c_eval", 0, 9), (b"q_l_eval", 0, 10),
    (b"q_r_eval", 0, 11), (b"a_next_eval", 1, 1), (b"b_next_eval", 1, 2),
    (b"d_next_eval", 1, 3),
]


def _chal(ts, ch_label, ap_label=None):
    """Squeeze a 31-byte challenge; optionally append it back (32-byte
    LE, matching PlonkTranscript.challenge_scalar + append_fr).
    Returns (L, 1) Montgomery limbs."""
    buf = ts.challenge_bytes(ch_label, 31)
    msg = jnp.concatenate([buf, jnp.zeros((1,), U32)])
    if ap_label is not None:
        ts.append_message(ap_label, msg, length=32)
    pairs = msg.reshape(FR.L, 2)
    raw = (pairs[:, 0] | (pairs[:, 1] << 8)).reshape(FR.L, 1)
    return FR.to_mont(raw)


def _compress4(cols, zeta):
    acc = cols[:, 3]
    for k in (2, 1, 0):
        acc = FR.add(FR.mont_mul(acc, zeta), cols[:, k])
    return acc


class _Rounds:
    """The per-round compute/finish programs.

    Transcript pieces (b1..b4, a5) are cursor-dependent and live here,
    keyed by (n, c, cursor0); the cursor-independent compute pieces
    (a1..a4, b5) are module-level lru factories keyed by n alone so a
    different preprocessed-transcript prefix never retraces them."""

    def __init__(self, n: int, c: int, cursor0):
        self.n = n
        self.c = c
        self.W, _ = _window_plan(c)
        self.G = 4 * self.W
        hd = host.Domain(n)
        self.omega_m = jnp.asarray(FR.encode(hd.group_gen)).reshape(FR.L, 1)
        self.n_m = jnp.asarray(FR.encode(n)).reshape(FR.L, 1)
        self.sel_idx = {nme: i for i, nme in enumerate(SELECTOR_NAMES)}

        # pre-warm the lru_cached jit factories OUTSIDE any trace: their
        # closure constants (jnp.asarray(...).reshape) would otherwise be
        # created inside the eval_shape trace below and leak tracers
        from .device_lookup import _combine_split_fn
        for fac in (dv._z_poly_fn, dv._z2_poly_fn, dv._quotient_fn,
                    dv._tsplit_fn, dv._open_fn, _combine_split_fn):
            fac(n, None)

        # transcript pieces, built in protocol order chaining the static
        # transcript cursor
        cur = cursor0
        self.b1, cur = self._build(self._b1, cur, self._bspec())
        self.b2, cur = self._build(self._b2, cur, self._bspec())
        self.b3, cur = self._build(self._b3, cur, self._bspec())
        self.b4, cur = self._build(self._b4, cur, self._bspec())
        self.a5, cur = self._build(self._a5, cur, self._spec_a5())

    def _build(self, body, cursor, spec):
        """jit a transcript piece with the entry cursor baked in; capture
        the exit cursor by abstract tracing (no compile, no execution)."""
        cell = {}

        def wrapped(*args):
            ts = DeviceTranscript(DeviceStrobe(args[0], *cursor))
            out = body(ts, *args[1:])
            cell["cursor"] = (ts.s.pos, ts.s.pos_begin, ts.s.cur_flags)
            return (ts.s.state,) + tuple(out)

        jax.eval_shape(wrapped, *spec)
        return jax.jit(wrapped), cell["cursor"]

    def _absorb(self, ts, byts, labels, xraw, yraw, inf, anom, keep):
        """Absorb the labelled commitment bytes (from the shared MSM
        finish program) into the transcript; pass the points through."""
        for i, lbl in enumerate(labels):
            if lbl is not None:
                ts.append_message(lbl, byts[i], length=48)
        return xraw[:, :keep], yraw[:, :keep], inf[:keep], anom

    def _pad4(self, stack):
        L, P, n = stack.shape
        if P == 4:
            return stack
        return jnp.concatenate(
            [stack, jnp.zeros((L, 4 - P, n), stack.dtype)], axis=1)

    # ---- abstract input specs (build-time cursor capture) --------------
    def _a(self, *shape):
        return jax.ShapeDtypeStruct(shape, U32)

    def _bspec(self):
        Lq = FQ.L
        return [self._a(200), self._a(Lq, 4), self._a(Lq, 4),
                self._a(4), self._a(4, 48), self._a(1)]

    def _spec_a5(self):
        n, L = self.n, FR.L
        sc = self._a(L, 1)
        return ([self._a(200)] + [sc] * 12
                + [self._a(L, 5, n), self._a(L, 12, n), self._a(L, 4, n),
                   self._a(L, 4, n), self._a(L, n), self._a(L, n),
                   self._a(L, 4, n)])

    # ---- round 1 -------------------------------------------------------
    def _b1(self, ts, xr, yr, inf, byts, anom):
        x, y, inf, an = self._absorb(
            ts, byts, [b"w_l", b"w_r", b"w_o", b"w_4"], xr, yr, inf,
            anom, 4)
        zeta = _chal(ts, b"zeta", b"zeta")
        return zeta, x, y, inf, an

    # ---- round 2 -------------------------------------------------------
    def _b2(self, ts, xr, yr, inf, byts, anom):
        x, y, inf, an = self._absorb(
            ts, byts, [b"f", b"h1", b"h2"], xr, yr, inf, anom, 3)
        beta = _chal(ts, b"beta", b"beta")
        gamma = _chal(ts, b"gamma", b"gamma")
        delta = _chal(ts, b"delta", b"delta")
        epsilon = _chal(ts, b"epsilon", b"epsilon")
        return beta, gamma, delta, epsilon, x, y, inf, an

    # ---- round 3 -------------------------------------------------------
    def _b3(self, ts, xr, yr, inf, byts, anom):
        x, y, inf, an = self._absorb(
            ts, byts, [b"z", None], xr, yr, inf, anom, 2)
        alpha = _chal(ts, b"alpha", b"alpha")
        range_ch = _chal(ts, b"range separation challenge",
                         b"range seperation challenge")
        logic_ch = _chal(ts, b"logic separation challenge",
                         b"logic seperation challenge")
        fixed_ch = _chal(ts, b"fixed base separation challenge",
                         b"fixed base separation challenge")
        var_ch = _chal(ts, b"variable base separation challenge",
                       b"variable base separation challenge")
        lookup_ch = _chal(ts, b"lookup separation challenge",
                          b"lookup separation challenge")
        return (alpha, range_ch, logic_ch, fixed_ch, var_ch, lookup_ch,
                x, y, inf, an)

    # ---- round 4 -------------------------------------------------------
    def _b4(self, ts, xr, yr, inf, byts, anom):
        x, y, inf, an = self._absorb(
            ts, byts, [b"t_1", b"t_2", b"t_3", b"t_4"], xr, yr, inf,
            anom, 4)
        z_ch = _chal(ts, b"z", b"z")
        return z_ch, x, y, inf, an

    # ---- round 5 -------------------------------------------------------
    def _a5(self, ts, z_ch, alpha, beta, gamma, delta, epsilon, zeta,
            range_ch, logic_ch, fixed_ch, var_ch, lookup_ch,
            coeffs5, sel_coeffs, sig_coeffs, lookup_coeffs,
            z_poly, z2_poly, t_stack):
        """Round 5 compute: evaluations + linearisation + openings
        (prover.rs:477-618)."""
        n = self.n
        si = self.sel_idx
        wire_coeffs = coeffs5[:, :4]
        table_poly = lookup_coeffs[:, 0]
        f_poly = lookup_coeffs[:, 1]
        h1_poly = lookup_coeffs[:, 2]
        h2_poly = lookup_coeffs[:, 3]
        zw = FR.mont_mul(z_ch, self.omega_m)

        z_stack = jnp.concatenate([
            wire_coeffs,
            sig_coeffs[:, 0:3],
            sel_coeffs[:, si["q_arith"]][:, None],
            sel_coeffs[:, si["q_lookup"]][:, None],
            sel_coeffs[:, si["q_c"]][:, None],
            sel_coeffs[:, si["q_l"]][:, None],
            sel_coeffs[:, si["q_r"]][:, None],
            f_poly[:, None], h1_poly[:, None], h2_poly[:, None],
            table_poly[:, None]], axis=1)
        zw_stack = jnp.stack(
            [z_poly, wire_coeffs[:, 0], wire_coeffs[:, 1],
             wire_coeffs[:, 3], h1_poly, z2_poly, table_poly], axis=1)
        evz = dv.eval_polys(z_stack, dv.powers_of(z_ch, n))    # (L, 16)
        evzw = dv.eval_polys(zw_stack, dv.powers_of(zw, n))    # (L, 7)
        evz_raw = FR.from_mont(evz)
        evzw_raw = FR.from_mont(evzw)
        stacks_raw = (evz_raw, evzw_raw)
        for lbl, which, idx in _EVAL_APPENDS:
            ts.append_fr_raw(lbl, stacks_raw[which][:, idx])

        # linearisation scalars, all on device (linearisation_poly.rs:164,
        # same formula set as proof.rs:489-603)
        def ev(arr, i):
            return Fv(arr[:, i:i + 1])

        a_e, b_e, c_e, d_e = (ev(evz, i) for i in range(4))
        s1_e, s2_e, s3_e = (ev(evz, i) for i in range(4, 7))
        q_arith_e, q_lookup_e, q_c_e, q_l_e, q_r_e = (
            ev(evz, i) for i in range(7, 12))
        f_e, h1_e, h2_e, table_e = (ev(evz, i) for i in range(12, 16))
        perm_e, a_ne, b_ne, d_ne, h1_ne, z2_ne, table_ne = (
            ev(evzw, i) for i in range(7))

        one = Fv(FR.ones((1,)))
        zfv = Fv(z_ch)
        zn = Fv(FR.pow_fixed(z_ch, n))          # z^n
        vanish = zn - one
        l1_eval = vanish * Fv(FR.inv(
            FR.mont_mul(self.n_m, FR.sub(z_ch, FR.ones((1,))))))

        alpha_f, beta_f, gamma_f = Fv(alpha), Fv(beta), Fv(gamma)
        delta_f, eps_f, zeta_f = Fv(delta), Fv(epsilon), Fv(zeta)
        lookup_f = Fv(lookup_ch)

        scal = {
            "q_m": a_e * b_e * q_arith_e,
            "q_l": a_e * q_arith_e,
            "q_r": b_e * q_arith_e,
            "q_o": c_e * q_arith_e,
            "q_4": d_e * q_arith_e,
            "q_c": q_arith_e,
            "q_arith": Fv(FR.zeros((1,))),
            "q_range": dw.range_constraint(
                Fv(range_ch), a_e, b_e, c_e, d_e, d_ne),
            "q_logic": dw.logic_constraint(
                Fv(logic_ch), a_e, b_e, c_e, d_e, a_ne, b_ne, d_ne, q_c_e),
            "q_fixed_group_add": dw.fbsm_constraint(
                Fv(fixed_ch), a_e, b_e, c_e, d_e, a_ne, b_ne, d_ne,
                q_l_e, q_r_e, q_c_e),
            "q_variable_group_add": dw.ca_constraint(
                Fv(var_ch), a_e, b_e, c_e, d_e, a_ne, b_ne, d_ne),
        }
        lookup_sq = lookup_f.square()
        lookup_cu = lookup_sq * lookup_f
        opd = delta_f + 1
        eps_opd = eps_f * opd
        compressed = ((d_e * zeta_f + c_e) * zeta_f + b_e) * zeta_f + a_e
        scal["q_lookup"] = (compressed - f_e) * lookup_f
        z2_scalar = (opd * (eps_f + f_e)
                     * (eps_opd + table_e + delta_f * table_ne)
                     * lookup_sq + l1_eval * lookup_cu)
        h1_scalar = -(z2_ne * lookup_sq
                      * (eps_opd + h2_e + delta_f * h1_ne))
        beta_z = beta_f * zfv
        ident = (a_e + beta_z + gamma_f) * (b_e + K1 * beta_z + gamma_f) \
            * (c_e + K2 * beta_z + gamma_f) \
            * (d_e + K3 * beta_z + gamma_f) * alpha_f
        z_scalar = ident + l1_eval * alpha_f * alpha_f
        copy = (a_e + beta_f * s1_e + gamma_f) \
            * (b_e + beta_f * s2_e + gamma_f) \
            * (c_e + beta_f * s3_e + gamma_f) \
            * beta_f * perm_e * alpha_f
        sig4_scalar = -copy
        t1_s = -vanish
        t2_s = t1_s * zn
        t3_s = t2_s * zn
        t4_s = t3_s * zn

        lin_scalars = [scal[nme] for nme in SELECTOR_NAMES]
        lin_scalars += [z_scalar, sig4_scalar, h1_scalar, z2_scalar,
                        t1_s, t2_s, t3_s, t4_s]
        lin_stack = jnp.concatenate([
            sel_coeffs,
            z_poly[:, None], sig_coeffs[:, 3][:, None],
            h1_poly[:, None], z2_poly[:, None],
            t_stack], axis=1)
        scal_dev = jnp.stack([s.a for s in lin_scalars], axis=1)
        prod = FR.mont_mul(lin_stack, scal_dev)
        lin_poly = prod[:, 0]
        for i in range(1, prod.shape[1]):
            lin_poly = FR.add(lin_poly, prod[:, i])

        # openings (prover.rs:563-618): nothing is appended between the
        # two aggregate challenges, so both are drawn back-to-back
        aw_ch = _chal(ts, b"aggregate_witness")
        saw_ch = _chal(ts, b"aggregate_witness")
        aw_stack = jnp.concatenate([
            lin_poly[:, None], sig_coeffs[:, 0:3],
            f_poly[:, None], h2_poly[:, None], table_poly[:, None],
            wire_coeffs], axis=1)
        open_fn = dv._open_fn(n, None)
        aw_w = open_fn(aw_stack, aw_ch, z_ch)
        saw_w = open_fn(zw_stack, saw_ch, zw)
        cstack = self._pad4(jnp.stack([aw_w, saw_w], axis=1))
        return evz_raw, evzw_raw, cstack

@functools.lru_cache(maxsize=None)
def _rounds(n: int, c: int, cursor0):
    return _Rounds(n, c, cursor0)


def _pad4(stack):
    L, P, n = stack.shape
    if P == 4:
        return stack
    return jnp.concatenate(
        [stack, jnp.zeros((L, 4 - P, n), stack.dtype)], axis=1)


@functools.lru_cache(maxsize=None)
def _a1_fn(n: int):
    @jax.jit
    def f(dd, wire_evals):
        """Round 1 compute: witness polys (prover.rs:184-203)."""
        coeffs5 = ntt.intt(wire_evals, dd, None)
        return coeffs5, coeffs5[:, :4]

    return f


@functools.lru_cache(maxsize=None)
def _a2_fn(n: int):
    from .device_lookup import _combine_split_fn
    cs_fn = _combine_split_fn(n, None)

    @jax.jit
    def f(dd, zeta, wire_evals, mask, table_cols):
        """Round 2 compute: plookup query/split (prover.rs:222-317)."""
        ct = _compress4(table_cols, zeta)
        cw = _compress4(wire_evals[:, :4], zeta)
        iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
        ct0 = jnp.sum(jnp.where((iota == 0)[None, :], ct, 0),
                      axis=-1, keepdims=True)
        cf = jnp.where(mask[None, :], cw, jnp.broadcast_to(ct0, ct.shape))
        h1_ev, h2_ev, bad = cs_fn(ct, cf)
        lookup_evals = jnp.stack([ct, cf, h1_ev, h2_ev], axis=1)
        lookup_coeffs = ntt.intt(lookup_evals, dd, None)
        return (cf, lookup_evals, lookup_coeffs, bad,
                _pad4(lookup_coeffs[:, 1:4]))

    return f


@functools.lru_cache(maxsize=None)
def _a3_fn(n: int):
    z_fn = dv._z_poly_fn(n, None)
    z2_fn = dv._z2_poly_fn(n, None)

    @jax.jit
    def f(dd, wire_evals, sigma_lag, cf, lookup_evals,
          beta, gamma, delta, epsilon):
        """Round 3 compute: grand products (prover.rs:323-389)."""
        z_poly = z_fn(dd, wire_evals[:, :4], sigma_lag, beta, gamma)
        z2_poly = z2_fn(dd, cf, lookup_evals[:, 0], lookup_evals[:, 2],
                        lookup_evals[:, 3], delta, epsilon)
        return (z_poly, z2_poly,
                _pad4(jnp.stack([z_poly, z2_poly], axis=1)))

    return f


@functools.lru_cache(maxsize=None)
def _a4_fn(n: int):
    q_fn = dv._quotient_fn(n, None)
    ts_fn = dv._tsplit_fn(n, None)
    size_inv_m = jnp.asarray(
        FR.encode(host.Domain(n).size_inv)).reshape(FR.L, 1)

    @jax.jit
    def f(dd4, sel4, sig4, coeffs5, z_poly, z2_poly, lookup_coeffs,
          alpha, beta, gamma, delta, epsilon, zeta, range_ch, logic_ch,
          fixed_ch, var_ch, lookup_ch):
        """Round 4 compute: quotient (prover.rs:391-455)."""
        l1_poly = jnp.broadcast_to(size_inv_m, (FR.L, n))
        polys_n = jnp.stack(
            [z_poly, coeffs5[:, 0], coeffs5[:, 1], coeffs5[:, 2],
             coeffs5[:, 3], z2_poly, lookup_coeffs[:, 1],
             lookup_coeffs[:, 0], lookup_coeffs[:, 2], lookup_coeffs[:, 3],
             coeffs5[:, 4], l1_poly], axis=1)
        chal_stack = jnp.stack(
            [alpha, beta, gamma, delta, epsilon, zeta, range_ch, logic_ch,
             fixed_ch, var_ch, lookup_ch], axis=1)
        t_coeffs = q_fn(dd4, sel4, sig4, polys_n, chal_stack)
        return ts_fn(t_coeffs)

    return f


@functools.lru_cache(maxsize=None)
def _b5_fn():
    @jax.jit
    def f(x5, y5, inf5, anom5, xs13, ys13, infs13, anoms, bad,
          evz_raw, evzw_raw):
        """Final pack: the two opening commitments (already affine from
        the shared finish program; no transcript absorbs,
        prover.rs:563-618) join the 13 round commitments in ONE flat
        output vector (a single device->host transfer)."""
        X = jnp.concatenate([xs13, x5[:, :2]], axis=1)   # (Lq, 15) raw
        Y = jnp.concatenate([ys13, y5[:, :2]], axis=1)
        INF = jnp.concatenate([infs13, inf5[:2]])        # (15,)
        anom_total = jnp.sum(anoms) + anom5[0]
        # ONE output buffer: each device->host transfer pays ~50-200 ms
        # of tunnel latency, so the proof ships as a single flat vector
        flat = jnp.concatenate([
            X.reshape(-1), Y.reshape(-1), INF,
            evz_raw.reshape(-1), evzw_raw.reshape(-1),
            anom_total.reshape(1), bad.astype(U32).reshape(1)])
        return flat

    return f


def encode_witness(cs, n: int):
    """(L, 5, n) Montgomery stack of [w_l, w_r, w_o, w_4, pi_evals].

    Narrow upload (dv.enc_stack_narrow): witness values ship as
    balanced residues in the narrowest covering dtype and expand to
    Montgomery limbs on device — 4-16x fewer wire bytes than full
    limbs through the ~1.3 MB/s tunnel."""
    from . import pi as pi_mod
    pad = [0] * (n - len(cs.w_l))
    cols = [[cs.variables[v] for v in w] + pad
            for w in (cs.w_l, cs.w_r, cs.w_o, cs.w_4)]
    cols.append(pi_mod.as_evals(cs.public_inputs, n))
    return dv.enc_stack_narrow(cols)


def prove_mega(device_prover, dpk):
    """Whole-prove pipelined dispatch.  Returns a Proof, or None when
    this path does not apply / hit an MSM anomaly (the caller falls back
    to the per-round path which reproduces the identical proof)."""
    from ..curve.msm3 import PippengerMSM3
    if not isinstance(dpk.msm, PippengerMSM3):
        return None
    from . import pi as pi_mod
    from ..pcs import kzg
    from .proof import Proof
    from .linearisation import ProofEvaluations
    from ..fields.limb import limbs_to_vec

    cs = device_prover._host.cs
    n = host.Domain(cs.circuit_bound()).size
    c = pick_window(n)

    transcript = device_prover._host.preprocessed_transcript.clone()
    transcript.append_pi(b"pi", pi_mod.to_bytes(cs.public_inputs))
    dts = DeviceTranscript.from_host_plonk(transcript)
    s = dts.s

    wire_evals = encode_witness(cs, n)
    q_lookup_padded = cs.q_lookup + [0] * (n - len(cs.q_lookup))
    mask = jnp.asarray(np.array([q % R != 0 for q in q_lookup_padded]))

    r = _rounds(n, c, (s.pos, s.pos_begin, s.cur_flags))
    msm_fn = msm3._msm_win_fn(n, c)
    ddn = ntt.get_device_domain(n)
    dd4 = ntt.get_device_domain(4 * n)
    pxy = dpk.msm.pxy
    st = s.state

    import os as _os
    import time as _time
    _prof = _os.environ.get("ARKPLONK_MEGA_TIMING") == "1"

    def _sync(label, x):
        # readback-sync per round (PROFILING ONLY: breaks the zero-sync
        # pipeline, each sync pays ~0.1s of tunnel latency)
        if _prof:
            t0 = _time.time()
            np.asarray(jax.device_get(x))
            print(f"[mega] {label}: +{_time.time() - t0:.3f}s "
                  f"(since start {_time.time() - _T0:.3f}s)", flush=True)

    fin_fn = msm3._finish_fn(c)

    _T0 = _time.time()
    coeffs5, cst1 = _a1_fn(n)(ddn, wire_evals)
    (w1x, w1y, w1z), m1 = msm_fn(cst1, pxy)
    fr1 = fin_fn(w1x, w1y, w1z, m1)
    (st, zeta, x1, y1, i1, an1) = r.b1(st, *fr1)
    _sync("round1", st)

    cf, lookup_evals, lookup_coeffs, bad, cst2 = _a2_fn(n)(
        ddn, zeta, wire_evals, mask, dpk.table_cols)
    (w2x, w2y, w2z), m2 = msm_fn(cst2, pxy)
    fr2 = fin_fn(w2x, w2y, w2z, m2)
    (st, beta, gamma, delta, epsilon, x2, y2, i2, an2) = r.b2(st, *fr2)
    _sync("round2", st)

    z_poly, z2_poly, cst3 = _a3_fn(n)(
        ddn, wire_evals, dpk.sigma_lagrange, cf, lookup_evals,
        beta, gamma, delta, epsilon)
    (w3x, w3y, w3z), m3 = msm_fn(cst3, pxy)
    fr3 = fin_fn(w3x, w3y, w3z, m3)
    (st, alpha, range_ch, logic_ch, fixed_ch, var_ch, lookup_ch,
     x3, y3, i3, an3) = r.b3(st, *fr3)
    _sync("round3", st)

    t_stack = _a4_fn(n)(
        dd4, dpk.sel4, dpk.sig4, coeffs5, z_poly, z2_poly, lookup_coeffs,
        alpha, beta, gamma, delta, epsilon, zeta, range_ch, logic_ch,
        fixed_ch, var_ch, lookup_ch)
    (w4x, w4y, w4z), m4 = msm_fn(t_stack, pxy)
    fr4 = fin_fn(w4x, w4y, w4z, m4)
    (st, z_ch, x4, y4, i4, an4) = r.b4(st, *fr4)
    _sync("round4", st)

    (st, evz_raw, evzw_raw, cst5) = r.a5(
        st, z_ch, alpha, beta, gamma, delta, epsilon, zeta,
        range_ch, logic_ch, fixed_ch, var_ch, lookup_ch,
        coeffs5, dpk.sel_coeffs, dpk.sig_coeffs, lookup_coeffs,
        z_poly, z2_poly, t_stack)
    (w5x, w5y, w5z), m5 = msm_fn(cst5, pxy)
    (x5, y5, i5, _byts5, an5) = fin_fn(w5x, w5y, w5z, m5)
    xs13 = jnp.concatenate([x1, x2, x3, x4], axis=1)
    ys13 = jnp.concatenate([y1, y2, y3, y4], axis=1)
    infs13 = jnp.concatenate([i1, i2, i3, i4])
    anoms = jnp.concatenate([an1, an2, an3, an4])
    flat = _b5_fn()(x5, y5, i5, an5, xs13, ys13, infs13, anoms, bad,
                    evz_raw, evzw_raw)
    _sync("round5", flat)

    flat = np.asarray(jax.device_get(flat))
    Lq = FQ.L
    o = 0

    def take(count, shape=None):
        nonlocal o
        seg = flat[o:o + count]
        o += count
        return seg.reshape(shape) if shape is not None else seg

    X = take(Lq * 15, (Lq, 15))
    Y = take(Lq * 15, (Lq, 15))
    INF = take(15)
    evz_raw = take(FR.L * 16, (FR.L, 16))
    evzw_raw = take(FR.L * 7, (FR.L, 7))
    anom = int(take(1)[0])
    badf = int(take(1)[0])
    if badf:
        from ..errors import ElementNotIndexed
        raise ElementNotIndexed("lookup query element not in table")
    if anom > 0:
        return None

    xs = limbs_to_vec(X)
    ys = limbs_to_vec(Y)
    pts = [None if int(INF[i]) else (xs[i], ys[i]) for i in range(15)]
    evz = limbs_to_vec(evz_raw)
    evzw = limbs_to_vec(evzw_raw)

    ev = ProofEvaluations(
        a_eval=evz[0], b_eval=evz[1], c_eval=evz[2], d_eval=evz[3],
        left_sigma_eval=evz[4], right_sigma_eval=evz[5],
        out_sigma_eval=evz[6], permutation_eval=evzw[0],
        q_lookup_eval=evz[8], z2_next_eval=evzw[5],
        h1_eval=evz[13], h1_next_eval=evzw[4], h2_eval=evz[14],
        f_eval=evz[12], table_eval=evz[15], table_next_eval=evzw[6],
        custom_evals=(
            ("q_arith_eval", evz[7]),
            ("q_c_eval", evz[9]),
            ("q_l_eval", evz[10]),
            ("q_r_eval", evz[11]),
            ("a_next_eval", evzw[1]),
            ("b_next_eval", evzw[2]),
            ("d_next_eval", evzw[3]),
        ))
    return Proof(
        a_comm=pts[0], b_comm=pts[1], c_comm=pts[2], d_comm=pts[3],
        f_comm=pts[4], h_1_comm=pts[5], h_2_comm=pts[6],
        z_comm=pts[7], z_2_comm=pts[8],
        t_1_comm=pts[9], t_2_comm=pts[10], t_3_comm=pts[11],
        t_4_comm=pts[12],
        aw_opening=kzg.OpeningProof(pts[13]),
        saw_opening=kzg.OpeningProof(pts[14]),
        evaluations=ev)
