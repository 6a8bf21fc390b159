"""Limb codec: arbitrary-precision field elements <-> uint32 limb arrays.

Device representation: little-endian limbs of W=16 bits stored one per uint32
lane, limb axis LEADING (shape ``(L, *batch)``).  The trailing axes are the
element axes, so elementwise field ops vectorize across the TPU VPU's 8x128
lanes and shard across the mesh on the element axis.

16-bit limbs are chosen so that a limb product fits uint32 exactly
((2^16-1)^2 < 2^32) and a full schoolbook column sum of lo/hi halves stays
< 2^22 — the "product headroom" rule from SURVEY.md §7.3.
"""

from __future__ import annotations

import numpy as np

W = 16  # bits per limb
MASK = (1 << W) - 1


def n_limbs(modulus: int) -> int:
    """Limbs needed so that R = 2^(W*L) > 2*modulus (Montgomery headroom)."""
    L = (modulus.bit_length() + W - 1) // W
    if 2 * modulus >= 1 << (W * L):
        L += 1
    return L


def to_limbs(x: int, L: int) -> np.ndarray:
    """Single int -> (L,) uint32 little-endian limb vector."""
    out = np.empty((L,), dtype=np.uint32)
    for i in range(L):
        out[i] = x & MASK
        x >>= W
    assert x == 0, "value does not fit in limbs"
    return out


def from_limbs(a: np.ndarray) -> int:
    """(L,) limb vector -> int."""
    x = 0
    for i in range(a.shape[0] - 1, -1, -1):
        x = (x << W) | int(a[i])
    return x


def vec_to_limbs(xs, L: int) -> np.ndarray:
    """Iterable of ints -> (L, n) uint32 array."""
    xs = list(xs)
    out = np.empty((L, len(xs)), dtype=np.uint32)
    for j, x in enumerate(xs):
        for i in range(L):
            out[i, j] = x & MASK
            x >>= W
        assert x == 0
    return out


def limbs_to_vec(a: np.ndarray) -> list[int]:
    """(L, n) uint32 array -> list of ints."""
    a = np.asarray(a)
    L = a.shape[0]
    flat = a.reshape(L, -1).astype(object)
    vals = [0] * flat.shape[1]
    for i in range(L - 1, -1, -1):
        for j in range(flat.shape[1]):
            vals[j] = (vals[j] << W) | int(flat[i, j])
    return vals


# --- fast vectorized codecs (bytes-based; O(n) C-speed per element) ---------

def encode_ints(xs, L: int) -> np.ndarray:
    """List of ints -> (L, n) uint32 raw (NON-Montgomery) limbs, fast path.

    Each int is serialized to 2*L little-endian bytes, then viewed as
    uint16 limbs; avoids the per-limb Python loop of `vec_to_limbs`."""
    n = len(xs)
    nbytes = 2 * L
    buf = b"".join(x.to_bytes(nbytes, "little") for x in xs)
    arr = np.frombuffer(buf, dtype="<u2").reshape(n, L)
    return np.ascontiguousarray(arr.T).astype(np.uint32)


def decode_ints(a: np.ndarray) -> list:
    """(L, n) uint32 raw limbs -> list of ints, fast path."""
    a = np.asarray(a)
    L, n = a.shape[0], int(np.prod(a.shape[1:], dtype=np.int64))
    u16 = a.reshape(L, n).T.astype("<u2")
    raw = u16.tobytes()
    nbytes = 2 * L
    return [int.from_bytes(raw[i * nbytes:(i + 1) * nbytes], "little")
            for i in range(n)]
