"""Inner-product-argument polynomial commitment (secondary PCS backend).

Mirrors the role of `ark_poly_commit::ipa_pc::InnerProductArgPC` in the
reference (commitment.rs:52-91): a discrete-log-based scheme with no
trusted setup, transparent generators, O(log n) proofs and O(n) verify.
Self-consistent Bulletproofs-style construction (not wire-compatible with
arkworks' — the reference's own IPA is only used through the generic PCS
interface, which this module implements: setup/commit/open_polys/check).

The PCS interface matches pcs/kzg.py so the prover/verifier can swap
backends (the reference's `HomomorphicCommitment` genericity).
"""

from __future__ import annotations

import hashlib

from ..fields.host import R, Q, fr_inv, sqrt_mod
from ..curve import host as cv
from ..transcript.merlin import Transcript
from ..transcript import serialize as ser
from .kzg import poly_add, poly_scale, poly_eval

# ark-poly-commit 0.3 ipa_pc::InnerProductArgPC::PROTOCOL_NAME — the
# reference instantiates InnerProductArgPC<G1Affine, Blake2s, ...>
# (plonk-core/src/test.rs:96-110, commitment.rs:52-63)
_PROTOCOL_NAME = b"PC-DL-2020"


def _from_random_bytes(digest: bytes):
    """ark-ec 0.3 GroupAffine::from_random_bytes on a 32-byte Blake2s
    digest: x = LE(digest zero-padded to 48 bytes), flag bits live in the
    top byte (always 0 here, so greatest=False -> the smaller y root),
    None when x is not on the curve."""
    x = int.from_bytes(digest, "little")
    if x >= Q:
        return None
    rhs = (x * x % Q * x + cv.C.G1_B) % Q
    y = sqrt_mod(rhs, Q)
    if y is None:
        return None
    y = min(y, Q - y)  # greatest=False
    return (x, y)


def _sample_generator(i: int):
    """ipa_pc::sample_generators body for index i: Blake2s over
    PROTOCOL_NAME || i_le8 (then || j_le8 on retries), point from the
    digest, cofactor cleared.  Follows ark-poly-commit 0.3; byte-level
    equality with arkworks is unvalidated in this sandbox (no network,
    no Rust) but the construction is the same."""
    h = hashlib.blake2s(
        _PROTOCOL_NAME + i.to_bytes(8, "little")).digest()
    p = _from_random_bytes(h)
    j = 0
    while p is None:
        h = hashlib.blake2s(
            _PROTOCOL_NAME + i.to_bytes(8, "little")
            + j.to_bytes(8, "little")).digest()
        p = _from_random_bytes(h)
        j += 1
    return cv.jac_to_affine(
        cv.jac_mul(cv.jac_from_affine(p), cv.C.G1_COFACTOR))


class IPASetup:
    """Transparent commitment key: n+1 generators + the IP binding point U."""

    def __init__(self, generators, u):
        self.g = generators
        self.u = u

    @property
    def max_degree(self):
        return len(self.g) - 1

    @staticmethod
    def setup(max_degree: int, seed: bytes = b"") -> "IPASetup":
        """Generators follow ipa_pc 0.3's sample_generators layout:
        indices 0..size are the commitment key, the next index is the
        hiding/binding point (arkworks' h; our U)."""
        del seed  # derivation is protocol-fixed, like the reference's
        # pad the basis to a power of two (the folding needs it)
        size = max(2, 1 << (max_degree).bit_length())
        gens = [_sample_generator(i) for i in range(size)]
        u = _sample_generator(size)
        return IPASetup(gens, u)

    def trim(self, supported_degree: int) -> "IPASetup":
        return self


class IPAOpeningProof:
    """log n rounds of (L, R) points + the folded scalar a0."""

    def __init__(self, rounds, a0):
        self.rounds = rounds  # list of (L_point, R_point)
        self.a0 = a0

    def __eq__(self, other):
        return (isinstance(other, IPAOpeningProof)
                and self.rounds == other.rounds and self.a0 == other.a0)


def commit(setup: IPASetup, coeffs, msm=None):
    idx = [i for i, c in enumerate(coeffs) if c % R != 0]
    if not idx:
        return None
    points = [setup.g[i] for i in idx]
    scalars = [coeffs[i] % R for i in idx]
    if msm is None:
        return cv.msm_host(points, scalars)
    return msm(points, scalars)


def _fold_challenge(transcript, l_pt, r_pt) -> int:
    transcript.append_message(b"ipa_l", ser.g1_to_bytes(l_pt))
    transcript.append_message(b"ipa_r", ser.g1_to_bytes(r_pt))
    u = int.from_bytes(transcript.challenge_bytes(b"ipa_u", 31), "little")
    return u if u % R else 1


def open_polys(setup: IPASetup, polys, z: int, chi: int, msm=None
               ) -> IPAOpeningProof:
    """Aggregate with powers of chi, then IPA-fold <a, powers-of-z>."""
    agg = []
    power = 1
    for p in polys:
        agg = poly_add(agg, poly_scale(p, power))
        power = power * chi % R
    n = max(2, 1 << (len(agg) - 1).bit_length()) if len(agg) > 1 else 2
    a = [c % R for c in agg] + [0] * (n - len(agg))
    b = [pow(z, i, R) for i in range(n)]
    g = [cv.jac_from_affine(p) for p in setup.g[:n]]
    u_point = cv.jac_from_affine(setup.u)

    transcript = Transcript(b"arkplonk-ipa")
    transcript.append_message(b"v", ser.fr_to_bytes(poly_eval(agg, z)))

    rounds = []
    while n > 1:
        half = n // 2
        a_lo, a_hi = a[:half], a[half:]
        b_lo, b_hi = b[:half], b[half:]
        g_lo, g_hi = g[:half], g[half:]
        ip_l = sum(x * y for x, y in zip(a_hi, b_lo)) % R
        ip_r = sum(x * y for x, y in zip(a_lo, b_hi)) % R
        l_pt = _msm_jac(g_lo + [u_point], a_hi + [ip_l])
        r_pt = _msm_jac(g_hi + [u_point], a_lo + [ip_r])
        l_aff = cv.jac_to_affine(l_pt)
        r_aff = cv.jac_to_affine(r_pt)
        u = _fold_challenge(transcript, l_aff, r_aff)
        u_inv = fr_inv(u)
        a = [(lo + u * hi) % R for lo, hi in zip(a_lo, a_hi)]
        b = [(lo + u_inv * hi) % R for lo, hi in zip(b_lo, b_hi)]
        g = [cv.jac_add(glo, cv.jac_mul(ghi, u_inv))
             for glo, ghi in zip(g_lo, g_hi)]
        rounds.append((l_aff, r_aff))
        n = half
    return IPAOpeningProof(rounds, a[0])


def _msm_jac(jac_points, scalars):
    acc = (1, 1, 0)
    for p, s in zip(jac_points, scalars):
        if s % R:
            acc = cv.jac_add(acc, cv.jac_mul(p, s % R))
    return acc


def check(setup: IPASetup, commitments, z: int, values, proof, chi: int,
          msm=None) -> bool:
    """Folded check in MSM form.

    The naive verifier folds the generator vector level by level
    (O(n log n) host point ops — minutes at 2^12+); instead the final
    folded generator is expressed directly as <s, G> with
    s_i = prod_j u_j^{-1 · bit_{k-1-j}(i)} (the standard Bulletproofs
    verifier shortcut; arkworks ipa_pc::succinct_check does the same),
    and the b-vector fold has the closed form
    b0 = prod_j (1 + u_j^{-1} z^{n_j/2}).  One n-point Pippenger (host
    or the device `msm` hook) replaces all point folding.
    """
    assert len(commitments) == len(values)
    acc = (1, 1, 0)
    v = 0
    power = 1
    for c, val in zip(commitments, values):
        if c is not None:
            acc = cv.jac_add(acc, cv.jac_mul(cv.jac_from_affine(c), power))
        v = (v + val * power) % R
        power = power * chi % R

    k = len(proof.rounds)
    n = 1 << k
    u_point = cv.jac_from_affine(setup.u)

    # one transcript pass re-derives the fold challenges
    transcript = Transcript(b"arkplonk-ipa")
    transcript.append_message(b"v", ser.fr_to_bytes(v))
    us = [_fold_challenge(transcript, l_aff, r_aff)
          for (l_aff, r_aff) in proof.rounds]
    u_invs = [fr_inv(u) for u in us]

    # C' = C + v*U + sum_j (u_j L_j + u_j^{-1} R_j)
    cprime = cv.jac_add(acc, cv.jac_mul(u_point, v))
    for (l_aff, r_aff), u, u_inv in zip(proof.rounds, us, u_invs):
        if l_aff is not None:
            cprime = cv.jac_add(
                cprime, cv.jac_mul(cv.jac_from_affine(l_aff), u))
        if r_aff is not None:
            cprime = cv.jac_add(
                cprime, cv.jac_mul(cv.jac_from_affine(r_aff), u_inv))

    # closed-form b fold: round j multiplies by (1 + u_j^{-1} z^(n_j/2))
    b0 = 1
    half = n // 2
    for u_inv in u_invs:
        b0 = b0 * (1 + u_inv * pow(z, half, R)) % R
        half //= 2

    # s_i = a0 * prod_j u_j^{-bit_{k-1-j}(i)}; built LSB-out so round
    # k-1 lands on bit 0
    s = [proof.a0 % R]
    for j in range(k - 1, -1, -1):
        s = s + [x * u_invs[j] % R for x in s]

    # expect = <s, G> + a0*b0*U in ONE MSM
    pts = list(setup.g[:n]) + [setup.u]
    scs = s + [proof.a0 * b0 % R]
    if msm is None:
        expect = cv.msm_host(pts, scs)
    else:
        expect = msm(pts, scs)
    return cv.jac_to_affine(cprime) == expect
