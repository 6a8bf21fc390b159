"""Public inputs helpers (reference proof_system/pi.rs).

Sparse position->value map; dense evals; canonical serialization of the
BTreeMap for the transcript append at prover.rs:182 / proof.rs:128
(u64-LE length, then sorted (u64-LE position, 32-byte LE Fr) pairs —
the ark-serialize derive for BTreeMap<usize, F>).
"""

from __future__ import annotations

from ..fields import host
from ..fields.host import R
from ..poly import ntt
from ..transcript import serialize as ser


def as_evals(pi: dict, n: int) -> list:
    out = [0] * n
    for pos, val in pi.items():
        out[pos] = val % R
    return out


def into_dense_poly(pi: dict, n: int) -> list:
    return ntt.intt_host(as_evals(pi, n), host.Domain(n))


def to_bytes(pi: dict) -> bytes:
    items = sorted(pi.items())
    out = len(items).to_bytes(8, "little")
    for pos, val in items:
        out += pos.to_bytes(8, "little") + ser.fr_to_bytes(val)
    return out


def barycentric_eval(evals, point: int, domain: host.Domain) -> int:
    """proof.rs:635-677.  `evals` is a dense list or the sparse
    {position: value} PI map — the verifier stays O(#nonzero PIs), not
    O(n) (the dense walk alone costs ~0.3 s of host Python at 2^18)."""
    numerator = (pow(point, domain.size, R) - 1) % R * domain.size_inv % R
    if isinstance(evals, dict):
        items = sorted((i, v) for i, v in evals.items() if v % R != 0)
    else:
        items = [(i, e) for i, e in enumerate(evals) if e % R != 0]
    if not items:
        return 0
    gi = domain.group_gen_inv
    denoms = [(pow(gi, i, R) * point - 1) % R for i, _ in items]
    denoms = host.batch_inv(denoms)
    acc = 0
    for (_, v), d in zip(items, denoms):
        acc = (acc + v * d) % R
    return acc * numerator % R
