"""ctypes bindings for the native (C++) bulk SysEx codec.

Loads ``native/build/libcsyx.so`` (built by ``scripts/build_native.sh``; the
build is also attempted automatically on first use when a compiler is
available).  Falls back cleanly: callers should check :func:`available` or use
:func:`unpack_voices` / :func:`pack_voices`, which raise ``RuntimeError`` when
the library is missing.

The native codec is a drop-in for the NumPy one (dxvae_tpu/data/sysex.py) and
is verified bit-exact against it in tests/test_native.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

from dxvae_tpu.data.algorithms import ALGO_ADJ
from dxvae_tpu.data.sysex import GEN_NAME, N_PARAMS, SIZE_X, VOICE_BYTES

_REPO = Path(__file__).resolve().parents[2]
_LIB_PATH = _REPO / "native" / "build" / "libcsyx.so"
_lib = None  # None = not attempted yet; False = attempted, unavailable


def _load():
    global _lib
    if _lib is not None:
        return _lib or None
    if not _LIB_PATH.exists():
        src = _REPO / "native" / "csyx.cc"
        if src.exists():
            try:
                _LIB_PATH.parent.mkdir(parents=True, exist_ok=True)
                subprocess.run(
                    ["g++", "-O3", "-fPIC", "-shared", "-o", str(_LIB_PATH), str(src)],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception:
                _lib = False  # cache the failure: don't re-run the compiler per call
                return None
        else:
            _lib = False
            return None
    lib = ctypes.CDLL(os.fspath(_LIB_PATH))
    lib.csyx_unpack.restype = ctypes.c_int
    lib.csyx_unpack.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.csyx_pack.restype = ctypes.c_int
    lib.csyx_pack.argtypes = [
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.csyx_checksum.restype = ctypes.c_int
    lib.csyx_checksum.argtypes = [ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def unpack_voices(raw: np.ndarray):
    """Native equivalent of sysex.unpack_voices: (N,128) u8 -> (params, X, adj)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native csyx library unavailable (run scripts/build_native.sh)")
    raw = np.ascontiguousarray(raw, dtype=np.uint8)
    n = raw.shape[0]
    assert raw.ndim == 2 and raw.shape[1] == VOICE_BYTES
    params = np.empty((n, 7, N_PARAMS), np.int32)
    X = np.empty((n, 7, SIZE_X), np.float32)
    rc = lib.csyx_unpack(
        raw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n,
        params.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        X.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise RuntimeError(f"csyx_unpack failed: {rc}")
    adj = ALGO_ADJ[params[:, 0, 18]].astype(np.float32)
    return params, X, adj


def pack_voices(params: np.ndarray, names: np.ndarray | None = None) -> np.ndarray:
    """Native equivalent of sysex.pack_voices: (N,7,21) int -> (N,128) u8."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native csyx library unavailable (run scripts/build_native.sh)")
    p = np.ascontiguousarray(params, dtype=np.int32)
    n = p.shape[0]
    name = np.ascontiguousarray(GEN_NAME, dtype=np.uint8)
    raw = np.empty((n, VOICE_BYTES), np.uint8)
    rc = lib.csyx_pack(
        p.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n,
        name.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        raw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        raise ValueError("packed voice bytes out of 7-bit range; params not canonical")
    if names is not None:
        # the C ABI takes one 10-byte name; per-voice names are verbatim bytes
        # at 118..127, so stamp them here — same broadcast contract as
        # sysex.pack_voices ((10,) or (N, 10)), including its 7-bit validation
        # (a byte > 0x7F inside a SysEx message corrupts framing)
        # validate BEFORE the uint8 cast (mirroring sysex.pack_voices): int
        # inputs >= 256 or negative would wrap modulo 256 and could silently
        # pass a post-cast 7-bit check
        nm = np.asarray(names)
        if nm.size and (nm.min() < 0 or nm.max() > 0x7F):
            raise ValueError("voice name bytes out of 7-bit SysEx range")
        raw[:, 118:128] = np.ascontiguousarray(nm, dtype=np.uint8)
    return raw


def dx7_checksum(payload: np.ndarray) -> int:
    lib = _load()
    if lib is None:
        raise RuntimeError("native csyx library unavailable")
    payload = np.ascontiguousarray(payload, dtype=np.uint8).ravel()
    return int(lib.csyx_checksum(
        payload.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), payload.size
    ))
