"""Fused per-round prover compute programs: ONE dispatch per round.

On the tunneled TPU each dispatch + host sync costs tens of ms, so the
round-1 structure (separate compute and commit dispatches, ~20 per
prove) paid ~0.5 s of pure overhead.  Each protocol round's numeric
core is a single jitted program (reference round boundaries:
prover.rs:184-618).

Commitments run through the SHARED device MSM program
(curve/msm3._msm_win_fn, one executable for every commitment in
preprocess and all five rounds) via ``PippengerMSM3.commit_mont_batch``
— embedding the MSM body in each round program (the round-2/3 design)
serialized a ~9 MB Mosaic payload per unrolled reduction step into
every round executable: ~145 MB per program through a ~1.3 MB/s tunnel,
for both cold compiles and warm cache loads.

NTT domain tables (poly/ntt.DeviceDomain) are runtime ARGUMENTS, not
closure constants, for the same reason (a closed-over table is an HLO
literal serialized into the executable).

Used by DeviceProver when single-device (the mesh path keeps the
stage-level structure so shardings stay explicit).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..poly import ntt
from . import device as dv


def _compress4(cols, zeta):
    from ..fields.jaxfield import FR
    acc = cols[:, 3]
    for k in (2, 1, 0):
        acc = FR.add(FR.mont_mul(acc, zeta), cols[:, k])
    return acc


@functools.lru_cache(maxsize=None)
def r2_fn(n: int):
    from .device_lookup import _combine_split_fn
    cs_fn = _combine_split_fn(n, None)

    @jax.jit
    def f(dd, table_cols, wire_evals, mask, zeta):
        ct = _compress4(table_cols, zeta)
        cw = _compress4(wire_evals[:, :4], zeta)
        iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
        ct0 = jnp.sum(jnp.where((iota == 0)[None, :], ct, 0),
                      axis=-1, keepdims=True)
        cf = jnp.where(mask[None, :], cw, jnp.broadcast_to(ct0, ct.shape))
        h1, h2, bad = cs_fn(ct, cf)
        lookup_evals = jnp.stack([ct, cf, h1, h2], axis=1)
        coeffs4 = ntt.intt(lookup_evals, dd, None)   # t, f, h1, h2 polys
        return cf, lookup_evals, coeffs4, bad

    return f


@functools.lru_cache(maxsize=None)
def r3_fn(n: int):
    z_fn = dv._z_poly_fn(n, None)
    z2_fn = dv._z2_poly_fn(n, None)

    @jax.jit
    def f(dd, wire_evals, sigma_lag, cf, lookup_evals, beta, gamma, delta,
          epsilon):
        z = z_fn(dd, wire_evals[:, :4], sigma_lag, beta, gamma)
        z2 = z2_fn(dd, cf, lookup_evals[:, 0], lookup_evals[:, 2],
                   lookup_evals[:, 3], delta, epsilon)
        return z, z2

    return f


@functools.lru_cache(maxsize=None)
def r4_fn(n: int):
    q_fn = dv._quotient_fn(n, None)
    ts_fn = dv._tsplit_fn(n, None)

    @jax.jit
    def f(dd4, sel4, sig4, polys_n, challenges):
        t = q_fn(dd4, sel4, sig4, polys_n, challenges)
        return ts_fn(t)

    return f


@functools.lru_cache(maxsize=None)
def r5_fn(n: int):
    open_fn = dv._open_fn(n, None)

    @jax.jit
    def f(aw_stack, saw_stack, chi_aw, chi_saw, z, zw):
        aw = open_fn(aw_stack, chi_aw, z)
        saw = open_fn(saw_stack, chi_saw, zw)
        return jnp.stack([aw, saw], axis=1)

    return f
