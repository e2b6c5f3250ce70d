"""ctypes bindings for the native host runtime (native/ecloop_host.cpp).

The native library provides the host-side runtime fast paths: bloom
build/probe, exact sorted-list membership, bulk hex parsing, and an
independent C++ secp256k1+hash160 oracle for hit verification.  Every
caller has a pure-Python fallback — `available()` gates usage, and the
library is (re)built on demand with `build()` (plain `make -C native`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SO = os.path.join(_ROOT, "native", "libecloophost.so")

_lib = None
_tried = False


def build(quiet: bool = True) -> bool:
    """Compile the native library in-tree. Returns success."""
    try:
        r = subprocess.run(
            ["make", "-C", os.path.join(_ROOT, "native")],
            capture_output=quiet, timeout=120)
        return r.returncode == 0
    except (OSError, subprocess.TimeoutExpired):
        return False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) and os.environ.get("ECLOOP_NATIVE_BUILD", "1") == "1":
        build()
    if not os.path.exists(_SO):
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None

    u8p = ctypes.POINTER(ctypes.c_uint8)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    u64p = ctypes.POINTER(ctypes.c_uint64)

    lib.ecl_hash160.argtypes = [u8p, ctypes.c_size_t, u8p]
    lib.ecl_sha256.argtypes = [u8p, ctypes.c_size_t, u8p]
    lib.ecl_ec_mul_g.argtypes = [u8p, u8p]
    lib.ecl_ec_mul_g.restype = ctypes.c_int
    lib.ecl_pk_hash160.argtypes = [u8p, ctypes.c_int, u8p]
    lib.ecl_pk_hash160.restype = ctypes.c_int
    lib.ecl_bloom_add.argtypes = [u64p, ctypes.c_uint64, u32p, ctypes.c_size_t]
    lib.ecl_bloom_has.argtypes = [u64p, ctypes.c_uint64, u32p,
                                  ctypes.c_size_t, u8p]
    lib.ecl_list_search.argtypes = [u32p, ctypes.c_size_t, u32p]
    lib.ecl_list_search.restype = ctypes.c_int64
    lib.ecl_list_search_batch.argtypes = [u32p, ctypes.c_size_t, u32p,
                                          ctypes.c_size_t, u8p]
    lib.ecl_parse_h160_lines.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                         u32p, ctypes.c_size_t]
    lib.ecl_parse_h160_lines.restype = ctypes.c_size_t
    lib.ecl_parse_key_lines.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                        u8p, ctypes.c_size_t]
    lib.ecl_parse_key_lines.restype = ctypes.c_size_t
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _u8(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _u32(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))


def _u64(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


# --- oracle ---------------------------------------------------------------

def hash160(pub: bytes) -> bytes:
    lib = _load()
    buf = np.frombuffer(pub, dtype=np.uint8)
    out = np.empty(20, dtype=np.uint8)
    lib.ecl_hash160(_u8(buf), len(pub), _u8(out))
    return out.tobytes()


def pk_hash160(priv: int, compressed: bool) -> bytes | None:
    """hash160 of priv*G — the independent C++ verification oracle."""
    lib = _load()
    k = np.frombuffer(priv.to_bytes(32, "big"), dtype=np.uint8)
    out = np.empty(20, dtype=np.uint8)
    if not lib.ecl_pk_hash160(_u8(k), int(compressed), _u8(out)):
        return None
    return out.tobytes()


def ec_mul_g(priv: int) -> tuple[int, int] | None:
    lib = _load()
    k = np.frombuffer(priv.to_bytes(32, "big"), dtype=np.uint8)
    out = np.empty(64, dtype=np.uint8)
    if not lib.ecl_ec_mul_g(_u8(k), _u8(out)):
        return None
    b = out.tobytes()
    return int.from_bytes(b[:32], "big"), int.from_bytes(b[32:], "big")


# --- bloom ------------------------------------------------------------------

def bloom_add(bits: np.ndarray, hashes: np.ndarray) -> None:
    """bits: (W,) u64 (mutated in place); hashes: (N, 5) u32."""
    lib = _load()
    h = np.ascontiguousarray(hashes, dtype=np.uint32)
    lib.ecl_bloom_add(_u64(bits), len(bits), _u32(h), len(h))


def bloom_has(bits: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    lib = _load()
    h = np.ascontiguousarray(hashes, dtype=np.uint32)
    out = np.empty(len(h), dtype=np.uint8)
    lib.ecl_bloom_has(_u64(bits), len(bits), _u32(h), len(h), _u8(out))
    return out.astype(bool)


# --- sorted list -------------------------------------------------------------

def list_search(sorted_rows: np.ndarray, h: np.ndarray) -> int:
    """sorted_rows: (N, 5) u32 lexicographically sorted; h: (5,). -1 if
    absent."""
    lib = _load()
    rows = np.ascontiguousarray(sorted_rows, dtype=np.uint32)
    hq = np.ascontiguousarray(h, dtype=np.uint32)
    return int(lib.ecl_list_search(_u32(rows), len(rows), _u32(hq)))


def list_search_batch(sorted_rows: np.ndarray, hs: np.ndarray) -> np.ndarray:
    lib = _load()
    rows = np.ascontiguousarray(sorted_rows, dtype=np.uint32)
    hq = np.ascontiguousarray(hs, dtype=np.uint32)
    out = np.empty(len(hq), dtype=np.uint8)
    lib.ecl_list_search_batch(_u32(rows), len(rows), _u32(hq), len(hq),
                              _u8(out))
    return out.astype(bool)


# --- parsing -----------------------------------------------------------------

def parse_h160_lines(text: bytes) -> np.ndarray:
    lib = _load()
    max_rows = text.count(b"\n") + 1
    out = np.empty((max_rows, 5), dtype=np.uint32)
    n = lib.ecl_parse_h160_lines(text, len(text), _u32(out), max_rows)
    return out[:n].copy()


def parse_key_lines(text: bytes) -> np.ndarray:
    """-> (N, 32) u8 big-endian keys."""
    lib = _load()
    max_rows = text.count(b"\n") + 1
    out = np.empty((max_rows, 32), dtype=np.uint8)
    n = lib.ecl_parse_key_lines(text, len(text), _u8(out), max_rows)
    return out[:n].copy()
