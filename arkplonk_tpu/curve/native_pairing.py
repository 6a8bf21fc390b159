"""ctypes binding for the native (C) BLS12-381 pairing core.

Builds native/pairing.c on demand (like transcript/native.py); falls
back to the pure-Python tower in curve/host.py when unavailable.  The
C core mirrors host.py's algorithms 1:1; equality of the full Fq12
output is asserted in tests/test_native_pairing.py.

Replaces the verifier-side `PairingEngine` work of the reference
(plonk-core/src/commitment.rs:29-49, proof.rs:398-425): the Python
Miller loop costs ~0.7 s per pairing, the C core a few ms.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

from ..fields.host import Q, R

_LIB = None
# Frobenius constant exponent (p-1)/6 and the EXACT base-p digits of the
# hard exponent (p^4-p^2+1)/r: the C core computes
# y^e0 * phi(y)^e1 * phi^2(y)^e2 * phi^3(y)^e3 with a shared-squaring
# Straus multi-exp (phi = p-power Frobenius), which equals y^e exactly.
_PM1D6 = ((Q - 1) // 6).to_bytes(48, "big")
_EH_INT = (Q ** 4 - Q ** 2 + 1) // R
assert _EH_INT * R == Q ** 4 - Q ** 2 + 1
_EDIGITS = b"".join(
    ((_EH_INT // Q ** k) % Q).to_bytes(48, "big") for k in range(4))
assert sum(((_EH_INT // Q ** k) % Q) * Q ** k for k in range(4)) == _EH_INT


def _lib_path() -> str:
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(root, "native", "libarkplonk_pairing.so")


def load():
    global _LIB
    if _LIB is not None:
        return _LIB or None
    path = _lib_path()
    src = os.path.join(os.path.dirname(path), "pairing.c")
    if not os.path.exists(path) or (
            os.path.exists(src)
            and os.path.getmtime(src) > os.path.getmtime(path)):
        if not os.path.exists(src):
            _LIB = False
            return None
        try:
            subprocess.run(["cc", "-O3", "-march=native", "-fPIC", "-Wall", "-shared",
                            "-o", path, src], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            _LIB = False
            return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        _LIB = False
        return None
    lib.multi_pairing.argtypes = [
        ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint64)]
    lib.g1_msm.argtypes = [
        ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint8)]
    lib.g1_fixed_base_powers.argtypes = [
        ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_long, ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_uint8)]
    _LIB = lib
    return lib


def available() -> bool:
    if os.environ.get("ARKPLONK_NATIVE_PAIRING", "1") in ("0", "false"):
        return False
    from ..fields.host import CURVE
    if CURVE != "bls12_381":
        return False  # the C core hardwires the BLS12-381 modulus/tower
    return load() is not None


def _limbs(x: int) -> list:
    return [(x >> (64 * i)) & 0xFFFFFFFFFFFFFFFF for i in range(6)]


def multi_pairing(pairs):
    """prod e(P_i, Q_i) with shared final exponentiation; same signature
    and Fq12 tuple-tower return value as host.multi_pairing."""
    lib = load()
    assert lib is not None
    k = len(pairs)
    g1 = (ctypes.c_uint64 * (12 * k))()
    g2 = (ctypes.c_uint64 * (24 * k))()
    infs = (ctypes.c_uint8 * max(k, 1))()
    for i, (p, q) in enumerate(pairs):
        if p is None or q is None:
            infs[i] = 1
            continue
        g1[i * 12:i * 12 + 6] = _limbs(p[0] % Q)
        g1[i * 12 + 6:i * 12 + 12] = _limbs(p[1] % Q)
        (xc0, xc1), (yc0, yc1) = q
        g2[i * 24:i * 24 + 6] = _limbs(xc0 % Q)
        g2[i * 24 + 6:i * 24 + 12] = _limbs(xc1 % Q)
        g2[i * 24 + 12:i * 24 + 18] = _limbs(yc0 % Q)
        g2[i * 24 + 18:i * 24 + 24] = _limbs(yc1 % Q)
    pm = (ctypes.c_uint8 * len(_PM1D6)).from_buffer_copy(_PM1D6)
    ed = (ctypes.c_uint8 * len(_EDIGITS)).from_buffer_copy(_EDIGITS)
    out = (ctypes.c_uint64 * 72)()
    lib.multi_pairing(g1, g2, infs, k, pm, len(_PM1D6), ed, len(_EDIGITS),
                      out)

    def fq_at(j):
        v = 0
        for i in range(6):
            v |= int(out[j * 6 + i]) << (64 * i)
        return v

    def f2_at(j):
        return (fq_at(j), fq_at(j + 1))

    def f6_at(j):
        return (f2_at(j), f2_at(j + 2), f2_at(j + 4))

    return (f6_at(0), f6_at(6))


def g1_fixed_base_powers(g, scalars):
    """[s*G for s in scalars] via the C windowed fixed-base core
    (native/pairing.c g1_fixed_base_powers); returns affine int tuples
    (None for s == 0).  Replaces the Python ladder in kzg.SRS.setup —
    at 2^18 that ladder costs tens of minutes, this a few seconds."""
    import numpy as np
    lib = load()
    assert lib is not None
    count = len(scalars)
    base = (ctypes.c_uint64 * 12)()
    base[0:6] = _limbs(g[0] % Q)
    base[6:12] = _limbs(g[1] % Q)
    sc = bytearray(32 * count)
    for i, s in enumerate(scalars):
        sc[i * 32:(i + 1) * 32] = (s % R).to_bytes(32, "little")
    scb = (ctypes.c_uint8 * (32 * count)).from_buffer(sc)
    out = (ctypes.c_uint64 * (12 * count))()
    infs = (ctypes.c_uint8 * max(count, 1))()
    lib.g1_fixed_base_powers(base, scb, count, out, infs)
    arr = np.ctypeslib.as_array(out).reshape(count, 12)
    lo = arr.astype(object)
    pts = []
    for i in range(count):
        if infs[i]:
            pts.append(None)
            continue
        row = lo[i]
        x = 0
        y = 0
        for k in range(5, -1, -1):
            x = (x << 64) | int(row[k])
            y = (y << 64) | int(row[6 + k])
        pts.append((x, y))
    return pts


def g1_msm(points, scalars):
    """Small host MSM: sum_i scalars[i] * points[i]; points affine ints
    or None; returns affine tuple or None.  Native double-and-add per
    point — meant for the verifier's ~20-40 term linear combinations."""
    lib = load()
    assert lib is not None
    k = len(points)
    assert len(scalars) == k
    pts = (ctypes.c_uint64 * (12 * k))()
    infs = (ctypes.c_uint8 * max(k, 1))()
    sc = (ctypes.c_uint8 * (32 * k))()
    for i, (p, s) in enumerate(zip(points, scalars)):
        s = s % R
        if p is None or s == 0:
            infs[i] = 1
            continue
        pts[i * 12:i * 12 + 6] = _limbs(p[0] % Q)
        pts[i * 12 + 6:i * 12 + 12] = _limbs(p[1] % Q)
        sc[i * 32:(i + 1) * 32] = list(s.to_bytes(32, "big"))
    out = (ctypes.c_uint64 * 12)()
    oinf = ctypes.c_uint8(0)
    lib.g1_msm(pts, infs, sc, k, out, ctypes.byref(oinf))
    if oinf.value:
        return None
    x = 0
    y = 0
    for i in range(6):
        x |= int(out[i]) << (64 * i)
        y |= int(out[6 + i]) << (64 * i)
    return (x, y)
