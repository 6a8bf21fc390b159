"""Coset-constant validity (reference permutation/constants.rs:37-84).

The wire-identity permutation encodes columns as {1, K1, K2, K3} * H.
Soundness needs the four cosets pairwise disjoint for every evaluation
domain H up to the field's two-adicity: k_i must not lie in the 2^32
roots-of-unity subgroup, nor may k_i / k_j for i != j.
"""

from __future__ import annotations

from ..fields.host import C, R, fr_inv
from .composer import K1, K2, K3

TWO_ADICITY = C.FR_TWO_ADICITY  # 32 (BLS12-381) / 47 (BLS12-377)


def check_coset_constants(ks=(K1, K2, K3), max_log: int = TWO_ADICITY):
    """Raises ValueError if any constant (or ratio) falls into a domain
    coset; mirrors constants.rs `check_coset_ks`."""
    pow2 = 1 << max_log

    def in_two_adic_subgroup(x: int) -> bool:
        return pow(x % R, pow2, R) == 1

    for i, k in enumerate(ks):
        if in_two_adic_subgroup(k):
            raise ValueError(f"K{i+1}={k} lies in the 2^{max_log} subgroup")
    for i, ki in enumerate(ks):
        for j, kj in enumerate(ks):
            if i != j and in_two_adic_subgroup(ki * fr_inv(kj) % R):
                raise ValueError(
                    f"K{i+1}/K{j+1} lies in the 2^{max_log} subgroup")
    return True
