"""ctypes binding for the native audio engine (csrc/audio_engine.cpp).

Same pattern as zonos_tpu/text/native.py: built on first use with g++,
cached under ``build/``; on any failure the callers fall back to scipy —
the C++ filter design matches scipy.signal.resample_poly's default, so the
two paths agree numerically.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path

import numpy as np

logger = logging.getLogger("zonos_tpu.audio.native")

_REPO_ROOT = Path(__file__).resolve().parents[2]
_SRC = _REPO_ROOT / "csrc" / "audio_engine.cpp"
_LIB = _REPO_ROOT / "build" / "libzonos_audio.so"

_lib = None
_tried = False


def _build() -> bool:
    if _LIB.exists() and _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
        return True
    try:
        _LIB.parent.mkdir(parents=True, exist_ok=True)
        subprocess.run(
            ["g++", "-O2", "-fPIC", "-std=c++17", "-shared", "-o", str(_LIB), str(_SRC)],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception as e:
        logger.debug("native audio build failed: %s", e)
        return False


def get_lib():
    """Returns the loaded CDLL or None if unavailable."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not _SRC.exists() or not _build():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB))
        lib.zonos_resample_out_len.restype = ctypes.c_long
        lib.zonos_resample_out_len.argtypes = [ctypes.c_long, ctypes.c_int, ctypes.c_int]
        lib.zonos_resample.restype = ctypes.c_int
        lib.zonos_resample.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_long,
        ]
        _lib = lib
    except Exception as e:  # pragma: no cover
        logger.debug("native audio load failed: %s", e)
        _lib = None
    return _lib


def resample_native(wav: np.ndarray, up: int, down: int) -> np.ndarray | None:
    """Polyphase resample [channels, samples] float32, or None on failure."""
    lib = get_lib()
    if lib is None:
        return None
    wav = np.ascontiguousarray(wav, np.float32)
    ch, n_in = wav.shape
    n_out = lib.zonos_resample_out_len(n_in, up, down)
    out = np.empty((ch, n_out), np.float32)
    rc = lib.zonos_resample(
        wav.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_in, ch, up, down,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_out,
    )
    if rc != 0:
        return None
    return out
