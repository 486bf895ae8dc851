"""ctypes bindings for the C++ host accelerator (_zknative.cc).

Host-side analog of ark-ff's asm backend (SURVEY.md section 2.2 row 1): the
prover seams that are latency-bound on interpreted Python bignums — sparse
A/B/C witness evaluation, canonical<->Montgomery conversion at the device
boundary, batched inversion, power/geometric sequences — run as native
64-bit-limb Montgomery code instead.

The shared library builds lazily on first import (g++ -O3, ~2 s) and is
cached next to the source; if no toolchain is available everything falls
back to the pure-Python paths (callers guard on `available()`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "_zknative.cc")
_LIB = os.path.join(_HERE, "_zknative.so")

_lock = threading.Lock()
_lib = None
_load_failed = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-o", _LIB, _SRC, "-pthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
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
        u64p = ctypes.POINTER(ctypes.c_uint64)
        i64p = ctypes.POINTER(ctypes.c_int64)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i64 = ctypes.c_int64
        u64 = ctypes.c_uint64
        lib.zk_mont_mul.argtypes = [ctypes.c_int, i64, u64p, u64p, u64p, u64p, u64]
        lib.zk_mont_mul_const.argtypes = [ctypes.c_int, i64, u64p, u64p, u64p, u64p, u64]
        lib.zk_csr_matvec.argtypes = [ctypes.c_int, i64, i64p, i64p, u64p, u64p, u64p, u64p, u64]
        lib.zk_batch_inv.argtypes = [ctypes.c_int, i64, u64p, u64p, u64p, u64, u64p, u8p, i64]
        lib.zk_mont_pow.argtypes = [ctypes.c_int, i64, u64p, u8p, i64, u64p, u64p, u64, u64p]
        lib.zk_geom_seq.argtypes = [ctypes.c_int, i64, u64p, u64p, u64p, u64p, u64]
        lib.zk_add_mod.argtypes = [ctypes.c_int, i64, u64p, u64p, u64p, u64p]
        lib.zk_sub_mod.argtypes = [ctypes.c_int, i64, u64p, u64p, u64p, u64p]
        lib.zk_rsub_const.argtypes = [ctypes.c_int, i64, u64p, u64p, u64p, u64p]
        lib.zk_mul_const_add.argtypes = [ctypes.c_int, i64, u64p, u64p, u64p, u64p, u64]
        lib.zk_synth_div.argtypes = [ctypes.c_int, i64, u64p, u64p, u64p, u64p, u64p, u64]
        for f in ("zk_mont_mul", "zk_mont_mul_const", "zk_csr_matvec",
                  "zk_batch_inv", "zk_mont_pow", "zk_geom_seq", "zk_add_mod",
                  "zk_sub_mod", "zk_rsub_const", "zk_mul_const_add",
                  "zk_synth_div"):
            getattr(lib, f).restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


# ---------------------------------------------------------------------------
# array plumbing: python ints / 16-bit device planes <-> u64 limb rows
# ---------------------------------------------------------------------------


def ints_to_u64(vals, nl: int) -> np.ndarray:
    """Python ints -> (len, nl) little-endian uint64 rows."""
    buf = b"".join(int(v).to_bytes(nl * 8, "little") for v in vals)
    return np.frombuffer(buf, dtype="<u8").reshape(len(vals), nl).copy()


def u64_to_ints(arr: np.ndarray) -> list[int]:
    arr = np.ascontiguousarray(arr, dtype="<u8")
    row_bytes = arr.shape[-1] * 8
    raw = arr.tobytes()
    return [
        int.from_bytes(raw[i * row_bytes : (i + 1) * row_bytes], "little")
        for i in range(arr.size // arr.shape[-1])
    ]


def u16_planes_to_u64(planes: np.ndarray) -> np.ndarray:
    """Device (B, n) uint32 16-bit-limb planes -> (B, n//4) u64 rows."""
    planes = np.asarray(planes)
    assert planes.shape[-1] % 4 == 0
    u16 = np.ascontiguousarray(planes.astype("<u2"))
    return u16.view("<u8").reshape(planes.shape[:-1] + (planes.shape[-1] // 4,))


def u64_to_u16_planes(arr: np.ndarray) -> np.ndarray:
    """(B, nl) u64 rows -> (B, 4*nl) uint32 16-bit-limb device planes."""
    arr = np.ascontiguousarray(arr, dtype="<u8")
    return (
        arr.view("<u2").reshape(arr.shape[:-1] + (arr.shape[-1] * 4,))
        .astype(np.uint32)
    )


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


class NativeField:
    """Per-modulus native context (mirrors fields.device.FieldSpec)."""

    _cache: dict = {}

    @classmethod
    def get(cls, p: int, n_u16_limbs: int) -> "NativeField | None":
        key = (p, n_u16_limbs)
        if key not in cls._cache:
            cls._cache[key] = cls(p, n_u16_limbs) if available() else None
        return cls._cache[key]

    def __init__(self, p: int, n_u16_limbs: int):
        assert n_u16_limbs % 4 == 0
        self.p = p
        self.nl = n_u16_limbs // 4
        R = 1 << (64 * self.nl)
        self.inv64 = (-pow(p, -1, 1 << 64)) % (1 << 64)
        self.p64 = ints_to_u64([p], self.nl)[0].copy()
        self.r2_64 = ints_to_u64([R * R % p], self.nl)[0].copy()
        self.one_mont64 = ints_to_u64([R % p], self.nl)[0].copy()
        self.one_plain64 = ints_to_u64([1], self.nl)[0].copy()
        e = p - 2
        self.pm2_bits = np.array(
            [(e >> i) & 1 for i in reversed(range(e.bit_length()))], dtype=np.uint8
        )

    # -- batch ops (all arrays are (B, nl) u64, Montgomery unless noted) ----
    def mont_mul(self, a, b):
        lib = _load()
        a = np.ascontiguousarray(a, "<u8")
        b = np.ascontiguousarray(b, "<u8")
        out = np.empty_like(a)
        rc = lib.zk_mont_mul(
            self.nl, a.shape[0], _ptr(a, ctypes.c_uint64), _ptr(b, ctypes.c_uint64),
            _ptr(out, ctypes.c_uint64), _ptr(self.p64, ctypes.c_uint64), self.inv64)
        assert rc == 0
        return out

    def _mul_const(self, a, c64):
        lib = _load()
        a = np.ascontiguousarray(a, "<u8")
        c = np.ascontiguousarray(c64, "<u8")
        out = np.empty_like(a)
        rc = lib.zk_mont_mul_const(
            self.nl, a.shape[0], _ptr(a, ctypes.c_uint64), _ptr(c, ctypes.c_uint64),
            _ptr(out, ctypes.c_uint64), _ptr(self.p64, ctypes.c_uint64), self.inv64)
        assert rc == 0
        return out

    def to_mont(self, a_canonical):
        return self._mul_const(a_canonical, self.r2_64)

    def from_mont(self, a_mont):
        return self._mul_const(a_mont, self.one_plain64)

    def csr_matvec(self, indptr, cols, coeffs_mont, z_mont):
        """out[r] = sum_k coeffs[k]*z[cols[k]]; all Montgomery."""
        lib = _load()
        indptr = np.ascontiguousarray(indptr, "<i8")
        cols = np.ascontiguousarray(cols, "<i8")
        coeffs = np.ascontiguousarray(coeffs_mont, "<u8")
        z = np.ascontiguousarray(z_mont, "<u8")
        rows = indptr.shape[0] - 1
        out = np.empty((rows, self.nl), "<u8")
        rc = lib.zk_csr_matvec(
            self.nl, rows, _ptr(indptr, ctypes.c_int64), _ptr(cols, ctypes.c_int64),
            _ptr(coeffs, ctypes.c_uint64), _ptr(z, ctypes.c_uint64),
            _ptr(out, ctypes.c_uint64), _ptr(self.p64, ctypes.c_uint64), self.inv64)
        assert rc == 0
        return out

    def batch_inv(self, a_mont):
        lib = _load()
        a = np.ascontiguousarray(a_mont, "<u8")
        out = np.empty_like(a)
        rc = lib.zk_batch_inv(
            self.nl, a.shape[0], _ptr(a, ctypes.c_uint64), _ptr(out, ctypes.c_uint64),
            _ptr(self.p64, ctypes.c_uint64), self.inv64,
            _ptr(self.one_mont64, ctypes.c_uint64),
            _ptr(self.pm2_bits, ctypes.c_uint8), self.pm2_bits.shape[0])
        assert rc == 0
        return out

    def geom_seq(self, count: int, base_mont64, scale_mont64):
        """[scale, scale*base, ..., scale*base^(count-1)] (Montgomery)."""
        lib = _load()
        base = np.ascontiguousarray(base_mont64, "<u8")
        scale = np.ascontiguousarray(scale_mont64, "<u8")
        out = np.empty((count, self.nl), "<u8")
        rc = lib.zk_geom_seq(
            self.nl, count, _ptr(base, ctypes.c_uint64), _ptr(scale, ctypes.c_uint64),
            _ptr(out, ctypes.c_uint64), _ptr(self.p64, ctypes.c_uint64), self.inv64)
        assert rc == 0
        return out

    def add(self, a, b):
        lib = _load()
        a = np.ascontiguousarray(a, "<u8")
        b = np.ascontiguousarray(b, "<u8")
        out = np.empty_like(a)
        rc = lib.zk_add_mod(
            self.nl, a.shape[0], _ptr(a, ctypes.c_uint64), _ptr(b, ctypes.c_uint64),
            _ptr(out, ctypes.c_uint64), _ptr(self.p64, ctypes.c_uint64))
        assert rc == 0
        return out

    def sub(self, a, b):
        lib = _load()
        a = np.ascontiguousarray(a, "<u8")
        b = np.ascontiguousarray(b, "<u8")
        out = np.empty_like(a)
        rc = lib.zk_sub_mod(
            self.nl, a.shape[0], _ptr(a, ctypes.c_uint64), _ptr(b, ctypes.c_uint64),
            _ptr(out, ctypes.c_uint64), _ptr(self.p64, ctypes.c_uint64))
        assert rc == 0
        return out

    def rsub_const(self, a, c64):
        """out[i] = c - a[i] (the Marlin (alpha - row_M) shape)."""
        lib = _load()
        a = np.ascontiguousarray(a, "<u8")
        c = np.ascontiguousarray(c64, "<u8")
        out = np.empty_like(a)
        rc = lib.zk_rsub_const(
            self.nl, a.shape[0], _ptr(a, ctypes.c_uint64), _ptr(c, ctypes.c_uint64),
            _ptr(out, ctypes.c_uint64), _ptr(self.p64, ctypes.c_uint64))
        assert rc == 0
        return out

    def mul_const_add(self, acc, a, c64):
        """acc[i] += c * a[i] in place (returns acc)."""
        lib = _load()
        acc = np.ascontiguousarray(acc, "<u8")
        a = np.ascontiguousarray(a, "<u8")
        c = np.ascontiguousarray(c64, "<u8")
        rc = lib.zk_mul_const_add(
            self.nl, a.shape[0], _ptr(a, ctypes.c_uint64), _ptr(c, ctypes.c_uint64),
            _ptr(acc, ctypes.c_uint64), _ptr(self.p64, ctypes.c_uint64), self.inv64)
        assert rc == 0
        return acc

    def synth_div(self, f_mont, z64):
        """f -> (q, rem=f(z)): synthetic division by (X - z), Montgomery."""
        lib = _load()
        f = np.ascontiguousarray(f_mont, "<u8")
        z = np.ascontiguousarray(z64, "<u8")
        n = f.shape[0]
        q = np.zeros((max(n - 1, 1), self.nl), "<u8")
        rem = np.empty((self.nl,), "<u8")
        rc = lib.zk_synth_div(
            self.nl, n, _ptr(f, ctypes.c_uint64), _ptr(z, ctypes.c_uint64),
            _ptr(q, ctypes.c_uint64), _ptr(rem, ctypes.c_uint64),
            _ptr(self.p64, ctypes.c_uint64), self.inv64)
        assert rc == 0
        return q, rem

    # -- int-list conveniences ---------------------------------------------
    def mont64_of_int(self, v: int) -> np.ndarray:
        return ints_to_u64([v % self.p], self.nl)[0].copy()

    def ints_to_mont(self, vals) -> np.ndarray:
        return self.to_mont(ints_to_u64(vals, self.nl))

    def mont_to_ints(self, a_mont) -> list[int]:
        return u64_to_ints(self.from_mont(a_mont))
