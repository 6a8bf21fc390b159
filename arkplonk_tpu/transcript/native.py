"""ctypes binding for the native (C) STROBE-128 transcript core.

Builds on demand from native/transcript.c (cc must be available); falls
back silently to the pure-Python implementation in merlin.py when the
shared library cannot be built/loaded.  Byte-exactness vs the Python path
is asserted in tests/test_transcript_native.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_LIB = None


def _lib_path() -> str:
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(root, "native", "libarkplonk_transcript.so")


def load():
    """Returns the loaded CDLL or None."""
    global _LIB
    if _LIB is not None:
        return _LIB
    path = _lib_path()
    if not os.path.exists(path):
        src = os.path.join(os.path.dirname(path), "transcript.c")
        if not os.path.exists(src):
            return None
        try:
            subprocess.run(["cc", "-O3", "-fPIC", "-Wall", "-shared",
                            "-o", path, src], check=True,
                           capture_output=True, timeout=60)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.strobe_init.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                ctypes.c_uint64]
    lib.strobe_absorb.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                  ctypes.c_uint64]
    lib.strobe_squeeze.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                   ctypes.c_uint64]
    lib.strobe_begin_op.argtypes = [ctypes.c_void_p, ctypes.c_uint8,
                                    ctypes.c_int]
    _LIB = lib
    return lib


_STATE_SIZE = 208  # sizeof(strobe128) with padding


class CStrobe128:
    """Drop-in replacement for merlin.Strobe128 backed by the C core."""

    def __init__(self, protocol_label: bytes):
        lib = load()
        assert lib is not None
        self._lib = lib
        self._buf = ctypes.create_string_buffer(_STATE_SIZE)
        lib.strobe_init(self._buf, protocol_label, len(protocol_label))
        self.cur_flags = 0x12  # A|M after init label

    def clone_into(self, other: "CStrobe128"):
        ctypes.memmove(other._buf, self._buf, _STATE_SIZE)

    def clone(self) -> "CStrobe128":
        c = object.__new__(CStrobe128)
        c._lib = self._lib
        c._buf = ctypes.create_string_buffer(_STATE_SIZE)
        ctypes.memmove(c._buf, self._buf, _STATE_SIZE)
        c.cur_flags = self.cur_flags
        return c

    def meta_ad(self, data: bytes, more: bool):
        if not more:
            self._lib.strobe_begin_op(self._buf, 0x02 | 0x10, 0)
            self.cur_flags = 0x12
        else:
            assert self.cur_flags == 0x12
        self._lib.strobe_absorb(self._buf, data, len(data))

    def ad(self, data: bytes, more: bool):
        if not more:
            self._lib.strobe_begin_op(self._buf, 0x02, 0)
            self.cur_flags = 0x02
        else:
            assert self.cur_flags == 0x02
        self._lib.strobe_absorb(self._buf, data, len(data))

    def prf(self, n: int, more: bool) -> bytes:
        if not more:
            self._lib.strobe_begin_op(self._buf, 0x01 | 0x02 | 0x04, 0)
            self.cur_flags = 0x07
        else:
            assert self.cur_flags == 0x07
        out = ctypes.create_string_buffer(n)
        self._lib.strobe_squeeze(self._buf, out, n)
        return out.raw[:n]


def available() -> bool:
    return load() is not None
