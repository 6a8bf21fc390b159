"""Runtime configuration (SURVEY §5.6).

The reference selects field/curve/PCS through Rust generics and cargo
features (plonk-core/Cargo.toml:18-46, circuit.rs:208-212); XLA
specializes at trace time, so here the same choices are a runtime
dataclass resolved once per session.  Environment overrides use the
ARKPLONK_* namespace.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


@dataclass(frozen=True)
class Config:
    # protocol
    curve: str = "bls12_381"          # pairing curve
    embedded_curve: str = "jubjub"    # in-circuit TE curve
    pcs: str = "kzg"                  # "kzg" | "ipa"
    # execution
    backend: str = "device"           # "device" | "host"
    mesh_shape: tuple = ()            # () = single chip; (8,) = 1-axis mesh
    pallas: bool = True               # fused Mosaic kernels on TPU
    compile_cache: bool = True
    timing: bool = False              # per-round timing marks

    @staticmethod
    def from_env() -> "Config":
        def flag(name, default):
            v = os.environ.get(name)
            if v is None:
                return default
            return v not in ("0", "false", "")

        mesh = os.environ.get("ARKPLONK_MESH", "")
        return Config(
            pcs=os.environ.get("ARKPLONK_PCS", "kzg"),
            backend=os.environ.get("ARKPLONK_BACKEND", "device"),
            mesh_shape=tuple(int(x) for x in mesh.split(",") if x),
            pallas=flag("ARKPLONK_PALLAS", True),
            compile_cache=flag("ARKPLONK_CACHE", True),
            timing=flag("ARKPLONK_TIMING", False),
        )

    def pcs_module(self):
        if self.pcs == "kzg":
            from .pcs import kzg
            return kzg
        if self.pcs == "ipa":
            from .pcs import ipa
            return ipa
        raise ValueError(f"unknown pcs {self.pcs!r}")

    def make_prover(self, label: bytes, rng=None):
        """Prover instance per this config (device/host/mesh)."""
        if self.backend == "host":
            from .proving.prover import Prover
            return Prover(label, rng=rng, pcs=self.pcs_module())
        from .proving.device import DeviceProver
        mesh = None
        if self.mesh_shape:
            from .mesh import sharding as ms
            total = 1
            for d in self.mesh_shape:
                total *= d
            mesh = ms.make_mesh(total)
        return DeviceProver(label, rng=rng, mesh=mesh)

    def make_verifier(self, label: bytes, rng=None):
        from .api.circuit import Verifier
        return Verifier(label, rng=rng, pcs=self.pcs_module())
