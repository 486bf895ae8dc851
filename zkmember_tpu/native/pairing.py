"""ctypes bindings for the native pairing engine (_zkpairing.cc).

Drop-in accelerators for curves.bls12_381.multi_pairing and
curves.bw6_761.multi_pairing: same (P, Q) pair lists in, same Fq12/Fq6
host tower element out.  All curve constants (moduli, Frobenius gammas,
loop bit strings) are computed by the Python curve modules — the single
source of truth — and shipped to C++ at first use.

Falls back silently (available() -> False) when no toolchain exists;
callers keep the pure-Python tower path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "_zkpairing.cc")
_LIB = os.path.join(_HERE, "_zkpairing.so")

_lock = threading.Lock()
_lib = None
_load_failed = False
_bls_ready = False
_bw6_ready = False

_u64p = ctypes.POINTER(ctypes.c_uint64)
_u8p = ctypes.POINTER(ctypes.c_uint8)


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-o", _LIB, _SRC,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=180)
        return True
    except Exception:
        return False


def _load():
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        if os.environ.get("ZKMEMBER_NO_NATIVE"):
            _load_failed = True
            return None
        need = not os.path.exists(_LIB) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        )
        if need and not _build():
            _load_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _load_failed = True
            return None
        lib.zkp_bls_setup.argtypes = [_u64p, _u8p, ctypes.c_int, ctypes.c_uint64, _u64p]
        lib.zkp_bls_setup.restype = ctypes.c_int
        lib.zkp_bls_multi_pairing.argtypes = [ctypes.c_int, _u64p, _u64p, _u64p]
        lib.zkp_bls_multi_pairing.restype = ctypes.c_int
        lib.zkp_bw6_setup.argtypes = [
            _u64p, _u64p, _u8p, ctypes.c_int, _u8p, ctypes.c_int, _u64p
        ]
        lib.zkp_bw6_setup.restype = ctypes.c_int
        lib.zkp_bw6_multi_pairing.argtypes = [ctypes.c_int, _u64p, _u64p, _u64p]
        lib.zkp_bw6_multi_pairing.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _limbs(v: int, nl: int) -> np.ndarray:
    return np.frombuffer(int(v).to_bytes(nl * 8, "little"), dtype="<u8").copy()


def _bits_msb(v: int) -> np.ndarray:
    return np.array(
        [(v >> i) & 1 for i in reversed(range(v.bit_length()))], dtype=np.uint8
    )


def _ptr64(a: np.ndarray):
    return a.ctypes.data_as(_u64p)


def _ptr8(a: np.ndarray):
    return a.ctypes.data_as(_u8p)


def _digit_bits(e: int, q: int, k: int) -> np.ndarray:
    """Base-q digits of e as a (k, nd) MSB-first bit matrix (shared length).

    The C++ hard part computes f^e = prod_i (f^(q^i))^(digit_i) as one
    Straus ladder with Frobenius-powered bases — the exact exponent."""
    digits = []
    for _ in range(k):
        digits.append(e % q)
        e //= q
    assert e == 0
    nd = max(d.bit_length() for d in digits)
    out = np.zeros((k, nd), np.uint8)
    for i, d in enumerate(digits):
        for j in range(nd):
            out[i, nd - 1 - j] = (d >> j) & 1
    return out


def _setup_bls(lib) -> None:
    global _bls_ready
    if _bls_ready:
        return
    from zkmember_tpu.curves import bls12_381 as bls

    q = _limbs(bls.Q, 6)
    ed = _digit_bits((bls.Q**4 - bls.Q**2 + 1) // bls.R, bls.Q, 4)
    ed = np.ascontiguousarray(ed)
    gammas = np.concatenate(
        [
            np.concatenate([_limbs(g.coeffs[0].v, 6), _limbs(g.coeffs[1].v, 6)])
            for g in bls._FROB_GAMMA
        ]
    )
    rc = lib.zkp_bls_setup(
        _ptr64(q), _ptr8(ed), ed.shape[1], ctypes.c_uint64(-bls.X), _ptr64(gammas)
    )
    assert rc == 0
    _bls_ready = True


def _setup_bw6(lib) -> None:
    global _bw6_ready
    if _bw6_ready:
        return
    from zkmember_tpu.curves import bw6_761 as bw6

    q = _limbs(bw6.Q, 12)
    nu = _limbs(bw6.NU.v, 12)
    r_bits = _bits_msb(bw6.R)
    ed = np.ascontiguousarray(_digit_bits((bw6.Q * bw6.Q - bw6.Q + 1) // bw6.R, bw6.Q, 2))
    gammas = np.concatenate([_limbs(g.v, 12) for g in bw6._FROB_GAMMA])
    rc = lib.zkp_bw6_setup(
        _ptr64(q), _ptr64(nu), _ptr8(r_bits), len(r_bits),
        _ptr8(ed), ed.shape[1], _ptr64(gammas),
    )
    assert rc == 0
    _bw6_ready = True


def bls_multi_pairing(pairs):
    """prod_i e(P_i, Q_i) over BLS12-381 -> host Fq12, or None if unavailable.

    pairs: [(P, Q2)] with P = (Fq, Fq) affine, Q2 = (Fq2, Fq2) affine;
    entries with P or Q None (infinity) are skipped (their factor is 1).
    """
    lib = _load()
    if lib is None:
        return None
    _setup_bls(lib)
    from zkmember_tpu.curves import bls12_381 as bls

    live = [(P, Q) for P, Q in pairs if P is not None and Q is not None]
    k = len(live)
    g1 = np.zeros((max(k, 1), 2, 6), "<u8")
    g2 = np.zeros((max(k, 1), 2, 2, 6), "<u8")
    for i, (P, Q) in enumerate(live):
        g1[i, 0] = _limbs(P[0].v, 6)
        g1[i, 1] = _limbs(P[1].v, 6)
        for ci in range(2):
            g2[i, ci, 0] = _limbs(Q[ci].coeffs[0].v, 6)
            g2[i, ci, 1] = _limbs(Q[ci].coeffs[1].v, 6)
    out = np.zeros((12, 6), "<u8")
    rc = lib.zkp_bls_multi_pairing(k, _ptr64(g1), _ptr64(g2), _ptr64(out))
    assert rc == 0
    vals = [int.from_bytes(out[i].tobytes(), "little") for i in range(12)]
    Fq, Fq2, Fq6, Fq12 = bls.Fq, bls.Fq2, bls.Fq6, bls.Fq12
    f2 = [Fq2(Fq(vals[2 * j]), Fq(vals[2 * j + 1])) for j in range(6)]
    return Fq12(Fq6(f2[0], f2[1], f2[2]), Fq6(f2[3], f2[4], f2[5]))


def bw6_multi_pairing(pairs):
    """prod_i e(P_i, Q_i) over BW6-761 -> host Fq6, or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    _setup_bw6(lib)
    from zkmember_tpu.curves import bw6_761 as bw6

    live = [(P, Q) for P, Q in pairs if P is not None and Q is not None]
    k = len(live)
    g1 = np.zeros((max(k, 1), 2, 12), "<u8")
    g2 = np.zeros((max(k, 1), 2, 12), "<u8")
    for i, (P, Q) in enumerate(live):
        g1[i, 0] = _limbs(P[0].v, 12)
        g1[i, 1] = _limbs(P[1].v, 12)
        g2[i, 0] = _limbs(Q[0].v, 12)
        g2[i, 1] = _limbs(Q[1].v, 12)
    out = np.zeros((6, 12), "<u8")
    rc = lib.zkp_bw6_multi_pairing(k, _ptr64(g1), _ptr64(g2), _ptr64(out))
    assert rc == 0
    vals = [int.from_bytes(out[i].tobytes(), "little") for i in range(6)]
    Fq, Fq3, Fq6 = bw6.Fq, bw6.Fq3, bw6.Fq6
    return Fq6(
        Fq3(Fq(vals[0]), Fq(vals[1]), Fq(vals[2])),
        Fq3(Fq(vals[3]), Fq(vals[4]), Fq(vals[5])),
    )
