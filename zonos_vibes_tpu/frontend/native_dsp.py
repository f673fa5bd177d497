"""ctypes binding for the native host DSP library (native/zvt_dsp.cpp).

Host-side speaker-audio preprocessing (resample to 16 kHz + log-mel) without
a JAX dispatch; falls back to the JAX implementations in ``utils/dsp.py``
when the shared library hasn't been built. Build with ``make -C native``
(attempted automatically once if g++ is available).
"""

from __future__ import annotations

import ctypes
import functools
import pathlib
import subprocess

import numpy as np

_NATIVE_DIR = pathlib.Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libzvt_dsp.so"


@functools.cache
def _load():
    if not _LIB_PATH.exists():
        try:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    lib.zvt_resample_out_len.restype = ctypes.c_int64
    lib.zvt_resample_out_len.argtypes = [ctypes.c_int64, ctypes.c_int, ctypes.c_int]
    lib.zvt_resample_f32.restype = ctypes.c_int64
    lib.zvt_resample_f32.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
    ]
    lib.zvt_mel_frames.restype = ctypes.c_int64
    lib.zvt_mel_frames.argtypes = [ctypes.c_int64, ctypes.c_int]
    lib.zvt_log_mel_16k.restype = None
    lib.zvt_log_mel_16k.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
    ]
    return lib


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def resample(wav: np.ndarray, orig_sr: int, new_sr: int) -> np.ndarray:
    """Mono float32 ``[T]`` windowed-sinc resample (native)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native DSP library unavailable")
    wav = np.ascontiguousarray(wav, np.float32)
    out_len = lib.zvt_resample_out_len(wav.shape[0], orig_sr, new_sr)
    out = np.empty(out_len, np.float32)
    n = lib.zvt_resample_f32(
        _fptr(wav), wav.shape[0], orig_sr, new_sr, _fptr(out), out_len
    )
    return out[:n]


def log_mel_16k(wav: np.ndarray) -> np.ndarray:
    """Speaker-frontend log-mel: 16 kHz mono ``[T] -> [80, frames]``."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native DSP library unavailable")
    wav = np.ascontiguousarray(wav, np.float32)
    frames = lib.zvt_mel_frames(wav.shape[0], 160)
    out = np.empty((80, frames), np.float32)
    lib.zvt_log_mel_16k(_fptr(wav), wav.shape[0], _fptr(out))
    return out
