"""Distributed four-step NTT with explicit all-to-all transposes.

Replaces GSPMD's auto-collectives for mesh-sharded NTTs (the per-stage
butterfly path lowers every high-stride stage to gathers) with the
communication-optimal four-step schedule (SURVEY §2.3.2, §5.8; reference
hot sites quotient_poly.rs:71-120, preprocess.rs:139-207):

    view x (natural order, element axis sharded contiguously over S
    devices) as an (n1, n2) matrix, i = i1*n2 + i2
    1. all-to-all  -> each device holds ALL i1 for its i2 block
    2. local NTT_n1 over i1, then twiddle by w^(i2*k1)
    3. all-to-all  -> each device holds ALL i2 for its k1 block
    4. local NTT_n2 over i2
    5. all-to-all  -> natural-order output shards (p = k2*n1 + k1)

Exactly 3 all-to-alls of the array (each moving (S-1)/S of the data once
over ICI) regardless of n — vs log2(n/S) collective-gather stages for
the butterfly path.  Outputs are bit-identical to poly/ntt.py (tested on
the virtual CPU mesh at 2^12/2^13 in tests/test_ntt_mesh.py).

The local transforms run the plain XLA butterfly core (`ntt._ntt_core`)
inside shard_map — Pallas kernels cannot be traced under manual
partitioning on the CPU test mesh, and per-device sizes (n/S) sit below
the ntt4 crossover for all mesh shapes we target.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..fields.jaxfield import FR


def _split(n: int, S: int):
    """Balanced power-of-two factorization n = n1*n2 with S | n1, S | n2."""
    k = n.bit_length() - 1
    k1 = k // 2
    return 1 << k1, 1 << (k - k1)


def supported(n: int, mesh_axes) -> bool:
    import os
    if mesh_axes is None or os.environ.get("ARKPLONK_MESH_NTT", "1") in (
            "0", "false", ""):
        return False
    S = mesh_axes[0].shape[mesh_axes[1]]
    n1, n2 = _split(n, S)
    return n & (n - 1) == 0 and n1 % S == 0 and n2 % S == 0


@functools.lru_cache(maxsize=None)
def _mesh_ntt_fn(n: int, inverse: bool, mesh_axes):
    """shard_map'd four-step transform for (L, B, n) element-sharded x."""
    from . import ntt

    mesh, ax = mesh_axes
    S = mesh.shape[ax]
    n1, n2 = _split(n, S)
    # This builder may run inside an outer jit trace (stage fns call
    # ntt.intt under jit); domain construction slices concrete arrays,
    # which would produce tracers that leak into the lru cache.
    with jax.ensure_compile_time_eval():
        dd1 = ntt.get_device_domain(n1)
        dd2 = ntt.get_device_domain(n2)

    def local(x, roots, tw1, br1, tw2, br2, n_inv):
        # x: (L, B, n/S) local shard of the natural-order array
        L, B, _ = x.shape
        d = jax.lax.axis_index(ax)
        v = x.reshape(L, B, n1 // S, n2)
        # 1) transpose: gather all i1 for this device's i2 block
        v = jax.lax.all_to_all(v, ax, split_axis=3, concat_axis=2,
                               tiled=True)                # (L,B,n1,n2/S)
        # 2) local NTT_n1 over i1 (put i1 last)
        v = v.transpose(0, 1, 3, 2)                        # (L,B,n2/S,n1)
        v = ntt._ntt_core(v[..., br1], tw1, n1.bit_length() - 1)
        # twiddle w^(i2*k1), i2 global; exp < n1*n2 = n <= 2^24 fits u32
        i2 = (jax.lax.broadcasted_iota(jnp.uint32, (n2 // S, n1), 0)
              + jnp.uint32(d) * jnp.uint32(n2 // S))
        k1 = jax.lax.broadcasted_iota(jnp.uint32, (n2 // S, n1), 1)
        exp = (i2 * k1) % jnp.uint32(n)
        v = FR.mont_mul(v, roots[:, None, exp.astype(jnp.int32)])
        # 3) transpose: gather all i2 for this device's k1 block
        v = jax.lax.all_to_all(v, ax, split_axis=3, concat_axis=2,
                               tiled=True)                 # (L,B,n2,n1/S)
        # 4) local NTT_n2 over i2
        v = v.transpose(0, 1, 3, 2)                        # (L,B,n1/S,n2)
        v = ntt._ntt_core(v[..., br2], tw2, n2.bit_length() - 1)
        # 5) natural-order output: split k2, concat k1, local transpose
        v = jax.lax.all_to_all(v, ax, split_axis=3, concat_axis=2,
                               tiled=True)                 # (L,B,n1,n2/S)
        v = v.transpose(0, 1, 3, 2)                        # (L,B,n2/S,n1)
        if inverse:  # 1/n scaling stays local (sharded mont_mul outside
            scale = n_inv.reshape((L,) + (1,) * (v.ndim - 1))
            v = FR.mont_mul(v, scale)  # shard_map trips

        return v.reshape(L, B, n // S)                     # p = k2*n1 + k1

    inner = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, None, ax), P(), P(), P(), P(), P(), P()),
        out_specs=P(None, None, ax), check_vma=False))

    def call(x, dd):
        roots = dd.roots_inv if inverse else dd.roots
        tw1 = dd1.tw_inv if inverse else dd1.tw
        tw2 = dd2.tw_inv if inverse else dd2.tw
        with FR.pallas_disabled():
            return inner(x, roots, tw1, dd1.bitrev, tw2, dd2.bitrev,
                         dd.n_inv)

    return call


def ntt(x, dd, mesh_axes):
    """Forward NTT (natural in/out), bit-identical to ntt.ntt."""
    shape = x.shape
    v = x.reshape(FR.L, -1, dd.n)
    return _mesh_ntt_fn(dd.n, False, mesh_axes)(v, dd).reshape(shape)


def intt(x, dd, mesh_axes):
    shape = x.shape
    v = x.reshape(FR.L, -1, dd.n)
    return _mesh_ntt_fn(dd.n, True, mesh_axes)(v, dd).reshape(shape)
