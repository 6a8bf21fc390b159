"""Keccak-f[1600] permutation (pure Python, host-side).

Backs the STROBE-128 sponge used by the Merlin transcript (the reference's
Fiat-Shamir layer, /root/reference/plonk-core/src/transcript.rs:16-50 via the
`merlin` crate).  Validated against hashlib's SHA3 in tests.
"""

from __future__ import annotations

_ROUND_CONSTANTS = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]

_ROTATIONS = [
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
]

_MASK64 = (1 << 64) - 1


def _rotl(x: int, n: int) -> int:
    n %= 64
    return ((x << n) | (x >> (64 - n))) & _MASK64


def keccak_f1600(lanes: list[int]) -> list[int]:
    """Apply keccak-f[1600] to a 25-lane (5x5, lane = uint64) state.

    State indexing: lanes[x + 5*y] (column-major per FIPS-202)."""
    a = list(lanes)
    for rc in _ROUND_CONSTANTS:
        # theta
        c = [a[x] ^ a[x + 5] ^ a[x + 10] ^ a[x + 15] ^ a[x + 20]
             for x in range(5)]
        d = [c[(x - 1) % 5] ^ _rotl(c[(x + 1) % 5], 1) for x in range(5)]
        a = [a[i] ^ d[i % 5] for i in range(25)]
        # rho + pi
        b = [0] * 25
        for x in range(5):
            for y in range(5):
                b[y + 5 * ((2 * x + 3 * y) % 5)] = _rotl(
                    a[x + 5 * y], _ROTATIONS[x][y])
        # chi
        a = [b[i] ^ ((~b[(i + 1) % 5 + 5 * (i // 5)]) & _MASK64
                     & b[(i + 2) % 5 + 5 * (i // 5)]) for i in range(25)]
        # iota
        a[0] ^= rc
    return a


def keccak_f1600_bytes(state: bytearray) -> None:
    """In-place keccak-f on a 200-byte state (little-endian lanes)."""
    lanes = [int.from_bytes(state[8 * i:8 * i + 8], "little")
             for i in range(25)]
    lanes = keccak_f1600(lanes)
    for i, lane in enumerate(lanes):
        state[8 * i:8 * i + 8] = lane.to_bytes(8, "little")


def sha3_256(data: bytes) -> bytes:
    """SHA3-256 built on keccak_f1600 — used only to validate the permutation
    against hashlib in tests."""
    rate = 136
    state = bytearray(200)
    # pad10*1 with SHA3 domain bits 01
    padded = bytearray(data)
    padded.append(0x06)
    while len(padded) % rate != 0:
        padded.append(0x00)
    padded[-1] ^= 0x80
    for off in range(0, len(padded), rate):
        for i in range(rate):
            state[i] ^= padded[off + i]
        keccak_f1600_bytes(state)
    return bytes(state[:32])
