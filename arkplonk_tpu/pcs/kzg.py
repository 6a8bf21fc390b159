"""KZG10 polynomial commitment scheme (host reference path).

TPU-native counterpart of the reference's `SonicKZG10` instantiation
(/root/reference/plonk-core/src/commitment.rs:22-49).  Semantics mirrored:

- `commit(p)`    = MSM over SRS G1 powers with p's coefficients
- `open(polys, z, chi)` aggregates with powers of the opening challenge chi
  (commitment.rs:96-129 `linear_combination`/`aggregate_polynomials`) and
  returns W = commit((P - P(z))/(X - z))
- `check` is the pairing identity e(C' - v'·G + z·W, H) == e(W, tau·H),
  i.e. the 1-2 pairings per verify of reference proof.rs:398-425.

The host MSM here is the golden model; the device Pippenger lives in
curve/msm.py and is swapped in by the prover.
"""

from __future__ import annotations

import hashlib
import os
import struct

from ..fields.host import R, fr_inv
from ..curve import host as cv

_SRS_MAGIC = b"ARKPLONK-SRS\x01"


def _write_srs(path, g1, h, beta_h):
    """Raw little-endian binary (48-byte Fq limbs), not pickle: stable,
    inspectable, and safe to load (SURVEY §5.4 artifact plan).  A sha256
    digest of the point data trails the file; `_read_srs` rejects a
    corrupted or tampered in-tree cache on load."""
    body = bytearray()
    body += struct.pack("<Q", len(g1))
    for x, y in g1:
        body += x.to_bytes(48, "little")
        body += y.to_bytes(48, "little")
    for pt in (h, beta_h):
        (xc0, xc1), (yc0, yc1) = pt
        for v in (xc0, xc1, yc0, yc1):
            body += v.to_bytes(48, "little")
    with open(path + ".tmp", "wb") as f:
        f.write(_SRS_MAGIC)
        f.write(body)
        f.write(hashlib.sha256(body).digest())
    os.replace(path + ".tmp", path)


def _read_srs(path):
    with open(path, "rb") as f:
        assert f.read(len(_SRS_MAGIC)) == _SRS_MAGIC, "bad SRS file"
        body = f.read()
    # digest trailer (files written before the trailer existed lack it;
    # the head check in SRS.setup still covers those)
    (count,) = struct.unpack("<Q", body[:8])
    expected = 8 + count * 96 + 2 * 192
    if len(body) >= expected + 32:
        assert hashlib.sha256(body[:expected]).digest() \
            == body[expected:expected + 32], f"SRS cache corrupt: {path}"
    off = 8
    g1 = []
    for _ in range(count):
        x = int.from_bytes(body[off:off + 48], "little")
        y = int.from_bytes(body[off + 48:off + 96], "little")
        g1.append((x, y))
        off += 96
    pts = []
    for _ in range(2):
        vals = [int.from_bytes(body[off + i * 48:off + (i + 1) * 48],
                               "little") for i in range(4)]
        pts.append(((vals[0], vals[1]), (vals[2], vals[3])))
        off += 192
    return g1, pts[0], pts[1]


class SRS:
    """Universal structured reference string (powers of tau).

    Plays the role of `UniversalParams` from ark-poly-commit; trim = slice
    (reference circuit.rs:236,276,310)."""

    def __init__(self, g1_powers, g2_gen, g2_tau):
        self.g1 = g1_powers          # [tau^i]G1, i = 0..d
        self.h = g2_gen              # [1]G2
        self.beta_h = g2_tau         # [tau]G2

    @property
    def max_degree(self):
        return len(self.g1) - 1

    def trim(self, supported_degree: int) -> "SRS":
        if supported_degree > self.max_degree:
            raise ValueError("trim beyond SRS size")
        s = SRS(self.g1[: supported_degree + 1], self.h, self.beta_h)
        return s

    @staticmethod
    def setup(max_degree: int, seed: bytes = b"arkplonk-tpu-test-srs",
              cache_dir: str | None = None) -> "SRS":
        """Deterministic test SRS (tau derived from seed). Cached on disk:
        SURVEY.md §5.4 — the artifact lifecycle is the checkpoint system."""
        if cache_dir is None:
            cache_dir = os.path.join(os.path.dirname(__file__), "_srs_cache")
        os.makedirs(cache_dir, exist_ok=True)
        from ..fields.host import CURVE
        key = hashlib.sha256(
            seed + CURVE.encode() + str(max_degree).encode()).hexdigest()[:16]
        path = os.path.join(cache_dir, f"srs_{key}_{max_degree}.srs")
        tau = int.from_bytes(hashlib.sha512(seed).digest(), "little") % R
        if os.path.exists(path):
            srs = SRS(*_read_srs(path))
            # head check: the cache key hashes seed/curve/degree, not the
            # contents — cross-check g1[0]/g1[1] against the generator and
            # tau so a stale or corrupted file cannot be loaded silently
            assert srs.g1[0] == cv.G1_GEN and len(srs.g1) == max_degree + 1 \
                and srs.g1[1] == cv.jac_to_affine(
                    cv.jac_mul(cv.jac_from_affine(cv.G1_GEN), tau)), \
                f"SRS cache mismatch: {path}"
            return srs
        g1 = _fixed_base_powers(cv.G1_GEN, tau, max_degree + 1)
        h = cv.G2_GEN
        beta_h = cv.G2.mul(h, tau)
        _write_srs(path, g1, h, beta_h)
        return SRS(g1, h, beta_h)


def _fixed_base_powers(g, tau: int, count: int):
    """[tau^i]G for i<count via windowed fixed-base multiplication.

    Native C fast path (native/pairing.c g1_fixed_base_powers) when the
    curve is BLS12-381; exact-Python ladder otherwise (golden model,
    cross-checked in tests/test_kzg.py)."""
    from ..curve import native_pairing
    if native_pairing.available():
        taus = [1] * count
        for i in range(1, count):
            taus[i] = taus[i - 1] * tau % R
        return native_pairing.g1_fixed_base_powers(g, taus)
    # precompute window tables for g: table[w][d] = d * 2^(8w) * g  (Jacobian)
    window = 8
    num_windows = (255 + window - 1) // window
    base = cv.jac_from_affine(g)
    tables = []
    for _ in range(num_windows):
        row = [(1, 1, 0)] * (1 << window)
        acc = (1, 1, 0)
        for d in range(1, 1 << window):
            acc = cv.jac_add(acc, base)
            row[d] = acc
        tables.append(row)
        for _ in range(window):
            base = cv.jac_double(base)

    def mul(k):
        acc = (1, 1, 0)
        for w in range(num_windows):
            d = (k >> (w * window)) & ((1 << window) - 1)
            if d:
                acc = cv.jac_add(acc, tables[w][d])
        return acc

    jac = []
    t = 1
    for _ in range(count):
        jac.append(mul(t))
        t = t * tau % R
    return _batch_to_affine(jac)


def _batch_to_affine(jac_points):
    """Jacobian -> affine with ONE shared inversion (Montgomery trick);
    the per-point `jac_to_affine` inversion dominates SRS generation at
    2^18 otherwise."""
    from ..fields.host import Q, fq_inv
    zs = [p[2] for p in jac_points if p[2] != 0]
    prefix = [1]
    for z in zs:
        prefix.append(prefix[-1] * z % Q)
    t = fq_inv(prefix[-1]) if zs else 1
    inv = [0] * len(zs)
    for i in range(len(zs) - 1, -1, -1):
        inv[i] = prefix[i] * t % Q
        t = t * zs[i] % Q
    out = []
    j = 0
    for x, y, z in jac_points:
        if z == 0:
            out.append(None)
        else:
            zi = inv[j]
            j += 1
            zi2 = zi * zi % Q
            out.append((x * zi2 % Q, y * zi2 % Q * zi % Q))
    return out


# --- polynomial helpers (host, coefficient lists of ints mod R) -------------

def poly_eval(coeffs, x: int) -> int:
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % R
    return acc


def poly_add(a, b):
    n = max(len(a), len(b))
    return [((a[i] if i < len(a) else 0) + (b[i] if i < len(b) else 0)) % R
            for i in range(n)]


def poly_scale(a, k: int):
    return [c * k % R for c in a]


def poly_mul(a, b):
    if not a or not b:
        return []
    out = [0] * (len(a) + len(b) - 1)
    for i, x in enumerate(a):
        if x == 0:
            continue
        for j, y in enumerate(b):
            out[i + j] = (out[i + j] + x * y) % R
    return out


def divide_by_linear(coeffs, z: int):
    """Synthetic (Ruffini) division by (X - z): returns quotient; the caller
    already knows the remainder is p(z)."""
    q = [0] * max(len(coeffs) - 1, 0)
    acc = 0
    for i in range(len(coeffs) - 1, 0, -1):
        acc = (acc * z + coeffs[i]) % R
        q[i - 1] = acc
    return q


# --- commit / open / check --------------------------------------------------

def commit(srs: SRS, coeffs, msm=None) -> tuple:
    """Commit to coefficient list. `msm` may override the MSM implementation
    (device Pippenger); defaults to the host reference."""
    if len(coeffs) > len(srs.g1):
        raise ValueError(f"polynomial degree {len(coeffs)-1} exceeds SRS")
    idx = [i for i, c in enumerate(coeffs) if c % R != 0]
    if not idx:
        return None
    points = [srs.g1[i] for i in idx]
    scalars = [coeffs[i] % R for i in idx]
    if msm is None:
        return cv.msm_host(points, scalars)
    return msm(points, scalars)


class OpeningProof:
    """KZG opening proof: a single G1 witness commitment (non-hiding).

    Matches `kzg10::Proof { w, random_v: None }`."""

    def __init__(self, w):
        self.w = w

    def __eq__(self, other):
        return isinstance(other, OpeningProof) and self.w == other.w


def open_polys(srs: SRS, polys, z: int, chi: int, msm=None) -> OpeningProof:
    """Aggregate polys with powers of chi; witness for evaluation at z."""
    agg = []
    power = 1
    for p in polys:
        agg = poly_add(agg, poly_scale(p, power))
        power = power * chi % R
    v = poly_eval(agg, z)
    agg[0] = (agg[0] - v) % R
    w = divide_by_linear(agg, z)
    return OpeningProof(commit(srs, w, msm=msm))


def _check_lhs(commitments, z: int, values, proof: OpeningProof, chi: int):
    """The G1 linear combination C' - v*G + z*W of one aggregated
    opening check (lhs of e(lhs, H) * e(-W, tau*H) == 1)."""
    assert len(commitments) == len(values)
    v = 0
    power = 1
    parts = []
    for c, val in zip(commitments, values):
        parts.append((c, power))
        v = (v + val * power) % R
        power = power * chi % R
    parts.append((cv.G1_GEN, (-v) % R))
    if proof.w is not None:
        parts.append((proof.w, z % R))
    return _host_msm(parts)


def _host_msm(parts):
    from ..curve import native_pairing
    if native_pairing.available():
        return native_pairing.g1_msm([p for p, _ in parts],
                                     [s for _, s in parts])
    acc = None
    for point, scalar in parts:
        if point is None or scalar % R == 0:
            continue
        acc = cv.G1.add(acc, cv.G1.mul(point, scalar % R))
    return acc


def check(srs: SRS, commitments, z: int, values, proof: OpeningProof,
          chi: int) -> bool:
    """Verify an aggregated opening: one 2-pairing product."""
    return batch_check(srs, [(commitments, z, values, proof, chi)])


def batch_check(srs: SRS, groups) -> bool:
    """Verify several aggregated openings with ONE 2-pairing product.

    groups: iterable of (commitments, z, values, proof, chi).  Each
    opening i contributes e(lhs_i, H) * e(-W_i, tau*H); a random
    separator r folds them: e(sum r^i lhs_i, H) * e(-sum r^i W_i, tau*H)
    == 1.  (The reference runs PC::check per opening, proof.rs:398-425 —
    two separate products; this halves the pairing count.)"""
    import hashlib
    groups = list(groups)
    lhss = []
    ws = []
    for commitments, z, values, proof, chi in groups:
        lhss.append(_check_lhs(commitments, z, values, proof, chi))
        ws.append(proof.w)
    if all(l is None for l in lhss) and all(w is None for w in ws):
        return True
    # verifier-local separator: hash of all inputs (unpredictable to a
    # prover who fixed the proof before seeing it is not required — any
    # value unknown at proving time works; a hash beats trusting an RNG)
    h = hashlib.sha256()
    for p in lhss + ws:
        h.update(repr(p).encode())
    seps = [1]
    for _ in range(len(groups) - 1):
        seps.append(int.from_bytes(
            hashlib.sha256(h.digest() + len(seps).to_bytes(4, "big"))
            .digest(), "big") % R)
    lhs = _host_msm(list(zip(lhss, seps)))
    wneg = _host_msm([(w, (-s) % R) for w, s in zip(ws, seps)])
    pairs = [(lhs, srs.h), (wneg, srs.beta_h)]
    return cv.multi_pairing(
        [p for p in pairs if p[0] is not None]) == cv.F12_ONE
