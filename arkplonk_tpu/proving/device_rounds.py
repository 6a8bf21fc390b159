"""Fused per-round prover programs: ONE device dispatch per round.

On the tunneled TPU each dispatch + host sync costs tens of ms, so the
round-1 structure (separate compute and commit dispatches, ~20 per
prove) pays ~0.5 s of pure overhead.  Here every protocol round is a
single jitted program that runs the round's numeric core AND the
Pippenger MSM body for its commitments, returning the round's device
arrays plus raw window sums; the host fetches only the window sums
(a few KB) to serialize commitments into the transcript
(reference round boundaries: prover.rs:184-618).

Used by DeviceProver when single-device (the mesh path keeps the
stage-level structure so shardings stay explicit).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..poly import ntt
from ..curve import msm2, pallas_jac
from . import device as dv


def msm_kind(msm) -> str:
    from ..curve import msm3 as m3
    return "v3" if isinstance(msm, m3.PippengerMSM3) else "v2"


def msm_tables(msm):
    from ..curve import msm3 as m3
    if isinstance(msm, m3.PippengerMSM3):
        return (msm.pxy,)
    return (msm.px, msm.py)


def _body(kind, n, P, c, stack, tables):
    if kind == "v3":
        from ..curve import msm3 as m3
        return m3._msm_body_v3(n, P, c, stack, tables[0])
    if pallas_jac.use_pallas():
        return msm2._msm_body_pallas(n, P, c, stack, *tables)
    return msm2._msm_body_jnp(n, P, c, stack, *tables)


def _compress4(cols, zeta):
    acc = cols[:, 3]
    for k in (2, 1, 0):
        from ..fields.jaxfield import FR
        acc = FR.add(FR.mont_mul(acc, zeta), cols[:, k])
    return acc


@functools.lru_cache(maxsize=None)
def r1_fn(n: int, c: int, kind: str):
    dd = ntt.get_device_domain(n)

    @jax.jit
    def f(wire_evals, *tables):  # (L, 5, n): w_l w_r w_o w_4 pi
        coeffs5 = ntt.intt(wire_evals, dd, None)
        (wx, wy, wz), anom = _body(kind, n, 4, c, coeffs5[:, :4], tables)
        return coeffs5, wx, wy, wz, anom

    return f


@functools.lru_cache(maxsize=None)
def r2_fn(n: int, c: int, kind: str):
    dd = ntt.get_device_domain(n)
    from .device_lookup import _combine_split_fn
    cs_fn = _combine_split_fn(n, None)

    @jax.jit
    def f(table_cols, wire_evals, mask, zeta, *tables):
        ct = _compress4(table_cols, zeta)
        cw = _compress4(wire_evals[:, :4], zeta)
        iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
        ct0 = jnp.sum(jnp.where((iota == 0)[None, :], ct, 0),
                      axis=-1, keepdims=True)
        cf = jnp.where(mask[None, :], cw, jnp.broadcast_to(ct0, ct.shape))
        h1, h2, bad = cs_fn(ct, cf)
        lookup_evals = jnp.stack([ct, cf, h1, h2], axis=1)
        coeffs4 = ntt.intt(lookup_evals, dd, None)   # t, f, h1, h2 polys
        (wx, wy, wz), anom = _body(kind, n, 3, c, coeffs4[:, 1:4], tables)
        return cf, lookup_evals, coeffs4, wx, wy, wz, anom, bad

    return f


@functools.lru_cache(maxsize=None)
def r3_fn(n: int, c: int, kind: str):
    z_fn = dv._z_poly_fn(n, None)
    z2_fn = dv._z2_poly_fn(n, None)

    @jax.jit
    def f(wire_evals, sigma_lag, cf, lookup_evals, beta, gamma, delta,
          epsilon, *tables):
        z = z_fn(wire_evals[:, :4], sigma_lag, beta, gamma)
        z2 = z2_fn(cf, lookup_evals[:, 0], lookup_evals[:, 2],
                   lookup_evals[:, 3], delta, epsilon)
        stack = jnp.stack([z, z2], axis=1)
        (wx, wy, wz), anom = _body(kind, n, 2, c, stack, tables)
        return z, z2, wx, wy, wz, anom

    return f


@functools.lru_cache(maxsize=None)
def r4_fn(n: int, c: int, kind: str):
    q_fn = dv._quotient_fn(n, None)
    ts_fn = dv._tsplit_fn(n, None)

    @jax.jit
    def f(sel4, sig4, polys_n, challenges, *tables):
        t = q_fn(sel4, sig4, polys_n, challenges)
        t_stack = ts_fn(t)
        (wx, wy, wz), anom = _body(kind, n, 4, c, t_stack, tables)
        return t_stack, wx, wy, wz, anom

    return f


@functools.lru_cache(maxsize=None)
def r5_fn(n: int, c: int, kind: str):
    open_fn = dv._open_fn(n, None)

    @jax.jit
    def f(aw_stack, saw_stack, chi_aw, chi_saw, z, zw, *tables):
        aw = open_fn(aw_stack, chi_aw, z)
        saw = open_fn(saw_stack, chi_saw, zw)
        stack = jnp.stack([aw, saw], axis=1)
        (wx, wy, wz), anom = _body(kind, n, 2, c, stack, tables)
        return wx, wy, wz, anom

    return f


def finish_commits(wx, wy, wz, anom, P, c, fallback):
    """Fetched raw window sums -> P host affine commitments (or the
    exact host fallback on an equal-x anomaly)."""
    if int(anom) > 0:
        return fallback()
    W, _H = msm2._window_plan(c)
    pts = msm2.decode_raw_jacobian(wx, wy, wz)
    return msm2.recombine_windows(pts, P, W, c)
