"""Mesh / sharding layer: multi-chip distribution of the prover.

Replaces the reference's rayon thread parallelism (SURVEY.md §5.8) with the
JAX collectives stack: evaluation-domain vectors are sharded over the mesh
on the element axis (SURVEY §5.7), so

- pointwise quotient/widget evaluation is embarrassingly parallel,
- NTT butterflies whose stride crosses the shard boundary become XLA
  all-to-all/collective-permute (inserted automatically under jit with
  sharded operands),
- the z(X)/z2(X) associative scans become XLA's distributed scans,
- MSM point batches are sharded and the per-shard partial sums are
  jac-added (a psum-like tree) on the way out.

Limb-array layout (L, ..., n): shard the LAST axis; the limb axis stays
replicated on-chip.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return jax.make_mesh((len(devices),), ("x",), devices=devices)


def shard_elements(mesh: Mesh, ndim: int) -> NamedSharding:
    """Sharding for an (L, ..., n) limb array: last axis over the mesh."""
    spec = [None] * (ndim - 1) + ["x"]
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_sharded(mesh: Mesh, arr):
    """Place a limb array with its element axis sharded over the mesh."""
    return jax.device_put(arr, shard_elements(mesh, arr.ndim))
