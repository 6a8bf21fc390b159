"""Error taxonomy (parity with /root/reference/plonk-core/src/error.rs).

A proof run is a short-lived pure computation (SURVEY.md §5.3): errors
surface as typed exceptions, never as process-level failures; multi-host
runs restart from preprocessed artifacts.
"""

from __future__ import annotations


class PlonkError(Exception):
    """Base class (error.rs:11)."""


class InvalidEvalDomainSize(PlonkError):
    """Circuit size exceeds the field's two-adicity (error.rs:15-20)."""

    def __init__(self, log_size_of_group: int, adicity: int):
        self.log_size_of_group = log_size_of_group
        self.adicity = adicity
        super().__init__(
            f"Log-size of the EvaluationDomain group > TWO_ADICITY: "
            f"{log_size_of_group} > {adicity}")


class ProofVerificationError(PlonkError):
    """The aggregated KZG check failed (error.rs / proof.rs:408)."""


class CircuitInputsNotFound(PlonkError):
    pass


class UninitializedPIGenerator(PlonkError):
    pass


class InvalidPublicInputBytes(PlonkError):
    pass


class MismatchedPolyLen(PlonkError):
    """Selector/wire columns out of sync (preprocess.rs:92-116)."""


class ElementNotIndexed(PlonkError):
    """Plookup query element missing from the table (error.rs:80-84,
    multiset.rs:149)."""


class TablePreProcessingError(PlonkError):
    pass


class PCError(PlonkError):
    """Polynomial-commitment backend error (error.rs PCError)."""

    def __init__(self, error: str):
        super().__init__(f"Polynomial Commitment Error: {error}")
