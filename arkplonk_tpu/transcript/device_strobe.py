"""Device-resident Merlin transcript: STROBE-128/Keccak-f[1600] in jnp.

Why: Fiat-Shamir forces a host round-trip per prover round when the
transcript lives on the host (~47 ms dispatch+sync each on the tunneled
TPU; reference round boundaries prover.rs:184-618).  With the transcript
ON DEVICE the five round programs chain through a traced 200-byte STROBE
state: the host enqueues all dispatches back-to-back without waiting and
fetches the proof once at the end.

The STROBE schedule (byte positions, permutation points) depends only on
the STATIC sequence of operation lengths — never on data — so `pos`,
`pos_begin` and flags stay Python ints at trace time; only the state
bytes are traced.  Byte-exactness vs the host Strobe128
(transcript/merlin.py, validated against the published merlin vector) is
asserted in tests/test_device_strobe.py.

State layout: (200,) uint32, one byte per element (value < 256).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .merlin import (STROBE_R, FLAG_I, FLAG_A, FLAG_C, FLAG_M,
                     MERLIN_PROTOCOL_LABEL, Strobe128)

U32 = jnp.uint32

_RC = np.array(
    [[rc & 0xFFFFFFFF, rc >> 32] for rc in [
        0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
        0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
        0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
        0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
        0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
        0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
        0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
        0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
    ]], dtype=np.uint32)

_ROT = [[0, 36, 3, 41, 18], [1, 44, 10, 45, 2], [62, 6, 43, 15, 61],
        [28, 55, 25, 21, 56], [27, 20, 39, 8, 14]]


def _rotl64(lo, hi, n):
    n %= 64
    if n == 0:
        return lo, hi
    if n == 32:
        return hi, lo
    if n < 32:
        return ((lo << n) | (hi >> (32 - n))) & jnp.uint32(0xFFFFFFFF), \
               ((hi << n) | (lo >> (32 - n))) & jnp.uint32(0xFFFFFFFF)
    m = n - 32
    return ((hi << m) | (lo >> (32 - m))) & jnp.uint32(0xFFFFFFFF), \
           ((lo << m) | (hi >> (32 - m))) & jnp.uint32(0xFFFFFFFF)


def keccak_f1600_dev(state_bytes):
    """(200,) u32 byte state -> permuted (200,) u32 byte state."""
    b = state_bytes.reshape(25, 8)
    lo = (b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16) | (b[:, 3] << 24))
    hi = (b[:, 4] | (b[:, 5] << 8) | (b[:, 6] << 16) | (b[:, 7] << 24))
    rc_tab = jnp.asarray(_RC)

    def round_body(r, lh):
        lo, hi = lh
        # theta
        clo = [lo[x] ^ lo[x + 5] ^ lo[x + 10] ^ lo[x + 15] ^ lo[x + 20]
               for x in range(5)]
        chi_ = [hi[x] ^ hi[x + 5] ^ hi[x + 10] ^ hi[x + 15] ^ hi[x + 20]
                for x in range(5)]
        dlo, dhi = [], []
        for x in range(5):
            rl, rh = _rotl64(clo[(x + 1) % 5], chi_[(x + 1) % 5], 1)
            dlo.append(clo[(x - 1) % 5] ^ rl)
            dhi.append(chi_[(x - 1) % 5] ^ rh)
        alo = [lo[i] ^ dlo[i % 5] for i in range(25)]
        ahi = [hi[i] ^ dhi[i % 5] for i in range(25)]
        # rho + pi
        blo = [None] * 25
        bhi = [None] * 25
        for x in range(5):
            for y in range(5):
                rl, rh = _rotl64(alo[x + 5 * y], ahi[x + 5 * y],
                                 _ROT[x][y])
                blo[y + 5 * ((2 * x + 3 * y) % 5)] = rl
                bhi[y + 5 * ((2 * x + 3 * y) % 5)] = rh
        # chi
        olo = [blo[i] ^ (~blo[(i + 1) % 5 + 5 * (i // 5)]
                         & blo[(i + 2) % 5 + 5 * (i // 5)])
               for i in range(25)]
        ohi = [bhi[i] ^ (~bhi[(i + 1) % 5 + 5 * (i // 5)]
                         & bhi[(i + 2) % 5 + 5 * (i // 5)])
               for i in range(25)]
        # iota
        olo[0] = olo[0] ^ rc_tab[r, 0]
        ohi[0] = ohi[0] ^ rc_tab[r, 1]
        return jnp.stack(olo), jnp.stack(ohi)

    lo, hi = jax.lax.fori_loop(0, 24, round_body, (lo, hi))
    out = []
    for k in range(4):
        out.append((lo >> (8 * k)) & 0xFF)
    for k in range(4):
        out.append((hi >> (8 * k)) & 0xFF)
    return jnp.stack(out, axis=1).reshape(200)


class DeviceStrobe:
    """STROBE-128 with a traced (200,) u32 byte state and static
    positions.  Mirrors merlin.Strobe128 op for op."""

    def __init__(self, state, pos: int, pos_begin: int, cur_flags: int):
        self.state = state
        self.pos = pos
        self.pos_begin = pos_begin
        self.cur_flags = cur_flags

    @classmethod
    def from_host(cls, host_strobe) -> "DeviceStrobe":
        st = np.frombuffer(bytes(host_strobe.state), dtype=np.uint8)
        return cls(jnp.asarray(st.astype(np.uint32)),
                   host_strobe.pos, host_strobe.pos_begin,
                   host_strobe.cur_flags)

    def _run_f(self):
        s = self.state
        s = s.at[self.pos].set(s[self.pos] ^ np.uint32(self.pos_begin))
        s = s.at[self.pos + 1].set(s[self.pos + 1] ^ np.uint32(0x04))
        s = s.at[STROBE_R + 1].set(s[STROBE_R + 1] ^ np.uint32(0x80))
        self.state = keccak_f1600_dev(s)
        self.pos = 0
        self.pos_begin = 0

    def _absorb(self, data):
        """data: (k,) u32 traced byte array (k static)."""
        k = data.shape[0]
        off = 0
        while k > 0:
            take = min(k, STROBE_R - self.pos)
            seg = data[off:off + take]
            self.state = self.state.at[self.pos:self.pos + take].set(
                self.state[self.pos:self.pos + take] ^ seg)
            self.pos += take
            off += take
            k -= take
            if self.pos == STROBE_R:
                self._run_f()

    def _absorb_const(self, data: bytes):
        self._absorb(jnp.asarray(
            np.frombuffer(data, dtype=np.uint8).astype(np.uint32)))

    def _squeeze(self, n: int):
        out = []
        while n > 0:
            take = min(n, STROBE_R - self.pos)
            out.append(self.state[self.pos:self.pos + take])
            self.state = self.state.at[self.pos:self.pos + take].set(
                jnp.zeros((take,), U32))
            self.pos += take
            n -= take
            if self.pos == STROBE_R:
                self._run_f()
        return jnp.concatenate(out) if len(out) > 1 else out[0]

    def _begin_op(self, flags: int, more: bool):
        if more:
            assert self.cur_flags == flags
            return
        old_begin = self.pos_begin
        self.pos_begin = self.pos + 1
        self.cur_flags = flags
        self._absorb_const(bytes([old_begin, flags]))
        if flags & FLAG_C and self.pos != 0:
            self._run_f()

    def meta_ad_const(self, data: bytes, more: bool):
        self._begin_op(FLAG_M | FLAG_A, more)
        self._absorb_const(data)

    def ad(self, data, more: bool):
        self._begin_op(FLAG_A, more)
        self._absorb(data)

    def ad_const(self, data: bytes, more: bool):
        self._begin_op(FLAG_A, more)
        self._absorb_const(data)

    def prf(self, n: int, more: bool):
        self._begin_op(FLAG_I | FLAG_A | FLAG_C, more)
        return self._squeeze(n)


class DeviceTranscript:
    """Merlin transcript ops over a DeviceStrobe (labels are static)."""

    def __init__(self, strobe: DeviceStrobe):
        self.s = strobe

    @classmethod
    def from_host_plonk(cls, plonk_transcript) -> "DeviceTranscript":
        host = plonk_transcript.t.strobe
        if not isinstance(host, Strobe128):
            # native C strobe: struct layout = 200-byte state, then
            # pos (u8) and pos_begin (u8) (native/transcript.c:70-74)
            raw = bytes(host._buf.raw)
            py = Strobe128.__new__(Strobe128)
            py.state = bytearray(raw[:200])
            py.pos = raw[200]
            py.pos_begin = raw[201]
            py.cur_flags = host.cur_flags
            host = py
        return cls(DeviceStrobe.from_host(host))

    def append_message(self, label: bytes, message, length: int = None):
        """message: traced (k,) u32 byte array or bytes."""
        if isinstance(message, (bytes, bytearray)):
            length = len(message)
        elif length is None:
            length = int(message.shape[0])
        self.s.meta_ad_const(label, False)
        self.s.meta_ad_const(length.to_bytes(4, "little"), True)
        if isinstance(message, (bytes, bytearray)):
            self.s.ad_const(bytes(message), False)
        else:
            self.s.ad(message, False)

    def challenge_bytes(self, label: bytes, n: int):
        self.s.meta_ad_const(label, False)
        self.s.meta_ad_const(n.to_bytes(4, "little"), True)
        return self.s.prf(n, False)

    def challenge_fr_mont(self, label: bytes):
        """31 challenge bytes -> (L, 1) Montgomery Fr limb array
        (byte-compatible with PlonkTranscript.challenge_scalar)."""
        from ..fields.jaxfield import FR
        buf = self.challenge_bytes(label, 31)          # (31,) u32 LE bytes
        padded = jnp.concatenate([buf, jnp.zeros((1,), U32)])
        pairs = padded.reshape(FR.L, 2)
        raw = (pairs[:, 0] | (pairs[:, 1] << 8)).reshape(FR.L, 1)
        return FR.to_mont(raw)

    def append_fr_raw(self, label: bytes, raw_limbs):
        """raw_limbs: (L,) or (L,1) NON-Montgomery 16-bit limb array ->
        32-byte LE append (matches ser.fr_to_bytes)."""
        from ..fields.jaxfield import FR
        v = raw_limbs.reshape(FR.L)
        lobytes = v & 0xFF
        hibytes = (v >> 8) & 0xFF
        msg = jnp.stack([lobytes, hibytes], axis=1).reshape(2 * FR.L)
        self.append_message(label, msg, length=32)
