"""One-import user surface (reference plonk-core/src/prelude.rs:12-18).

    from arkplonk_tpu.prelude import *

exposes the same names the reference prelude does: the circuit API
(Circuit, verify_proof, VerifierData), the composer front-end
(StandardComposer, Point), the proof-system types (Proof, ProverKey,
VerifierKey), the error taxonomy, and `from_embedded_curve_scalar`.
"""

from .api.circuit import Circuit, Verifier, verify_proof, gadget_tester
from .circuit.composer import StandardComposer, Point
from .errors import PlonkError as Error
from .proving.prover import Prover
from .proving.proof import Proof
from .proving.keys import ProverKey, VerifierKey
from .proving.serde import (verifier_data_to_bytes,
                            verifier_data_from_bytes)
from .util import from_embedded_curve_scalar

__all__ = [
    "Circuit", "Verifier", "verify_proof", "gadget_tester",
    "StandardComposer", "Point", "Error", "Prover", "Proof",
    "ProverKey", "VerifierKey",
    "verifier_data_to_bytes", "verifier_data_from_bytes",
    "from_embedded_curve_scalar",
]
