"""Audio DSP in JAX: windowed-sinc resampling, STFT, mel spectrogram.

The reference leans on torchaudio C++ ops (SURVEY.md §2.9 N8:
``torchaudio.transforms.Resample`` for 16 kHz speaker input and DAC 44.1 kHz
preprocessing, ``MelSpectrogram`` for the speaker frontend,
speaker_cloning.py:13-35,374). These are native JAX equivalents implementing
the same documented algorithms:

* ``resample``: polyphase windowed-sinc interpolation (torchaudio
  ``sinc_interp_hann`` semantics: gcd reduction, rolloff 0.99, lowpass filter
  width 6, hann^2 window) expressed as a strided conv — runs on TPU or CPU.
* ``mel_spectrogram``: center=True reflect-padded STFT (hann window, periodic)
  -> power -> HTK-scale triangular mel filterbank (norm=None), matching
  torchaudio ``MelSpectrogram`` defaults.
* ``log_fbank``: the speaker frontend ``log(mel + 1e-6)`` with per-utterance
  mean subtraction over time (speaker_cloning.py:30-34).
"""

from __future__ import annotations

import functools
import math

import jax.numpy as jnp
import numpy as np
from jax import lax


# ---------------------------------------------------------------------------
# Resampling
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=32)
def _sinc_kernel(
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
):
    """Polyphase kernel bank [new_freq, width*2 + orig_freq] (numpy, cached).

    torchaudio's construction: each output phase p in [0, new_freq) has taps
    ``sinc(base_freq * t) * hann^2`` at ``t = idx - p/new_freq`` with
    ``idx = arange(-width, width + orig_freq) / orig_freq`` and
    ``base_freq = min(orig, new) * rolloff``.
    """
    g = math.gcd(orig_freq, new_freq)
    orig_freq, new_freq = orig_freq // g, new_freq // g
    base_freq = min(orig_freq, new_freq) * rolloff
    width = math.ceil(lowpass_filter_width * orig_freq / base_freq)
    idx = np.arange(-width, width + orig_freq, dtype=np.float64) / orig_freq
    t = (-np.arange(new_freq, dtype=np.float64) / new_freq)[:, None] + idx[None, :]
    t = t * base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)
    window = np.cos(t * np.pi / lowpass_filter_width / 2) ** 2
    t = t * np.pi
    kernel = np.where(t == 0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t))
    kernel = kernel * window * (base_freq / orig_freq)
    return kernel.astype(np.float32), orig_freq, new_freq, width


def resample(x: jnp.ndarray, orig_sr: int, new_sr: int) -> jnp.ndarray:
    """Resample ``[..., T]`` from ``orig_sr`` to ``new_sr``."""
    if orig_sr == new_sr:
        return x
    kernel, orig_f, new_f, width = _sinc_kernel(orig_sr, new_sr)
    length = x.shape[-1]
    target_len = int(math.ceil(new_f * length / orig_f))
    lead = x.shape[:-1]
    xf = x.reshape((-1, 1, length)).astype(jnp.float32)
    xf = jnp.pad(xf, ((0, 0), (0, 0), (width, width + orig_f)))
    # Phases as output channels of a strided conv: [out=new_f, in=1, K]
    k = jnp.asarray(kernel)[:, None, :]
    y = lax.conv_general_dilated(
        xf, k, window_strides=(orig_f,), padding=[(0, 0)],
        dimension_numbers=("NCW", "OIW", "NCW"),
    )  # [B, new_f, frames]
    y = jnp.swapaxes(y, 1, 2).reshape(xf.shape[0], -1)[:, :target_len]
    return y.reshape(lead + (target_len,)).astype(x.dtype)


# ---------------------------------------------------------------------------
# STFT / mel
# ---------------------------------------------------------------------------

def hann_window(win_length: int) -> np.ndarray:
    """Periodic hann (torch.hann_window default)."""
    return 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(win_length) / win_length))


def _hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=8)
def mel_filterbank(
    n_mels: int, n_fft: int, sample_rate: int,
    f_min: float = 0.0, f_max: float | None = None,
) -> np.ndarray:
    """Triangular HTK-scale filterbank ``[n_fft//2 + 1, n_mels]``
    (torchaudio ``melscale_fbanks`` with norm=None, mel_scale='htk')."""
    f_max = f_max or sample_rate / 2.0
    freqs = np.linspace(0, sample_rate / 2.0, n_fft // 2 + 1)
    mel_pts = np.linspace(_hz_to_mel_htk(f_min), _hz_to_mel_htk(f_max), n_mels + 2)
    f_pts = _mel_to_hz_htk(mel_pts)
    slopes = f_pts[None, :] - freqs[:, None]  # [F, n_mels+2]
    down = -slopes[:, :-2] / np.maximum(f_pts[1:-1] - f_pts[:-2], 1e-10)
    up = slopes[:, 2:] / np.maximum(f_pts[2:] - f_pts[1:-1], 1e-10)
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


def stft_power(
    x: jnp.ndarray,
    n_fft: int = 512,
    win_length: int = 400,
    hop_length: int = 160,
    center: bool = True,
) -> jnp.ndarray:
    """Power spectrogram ``[..., n_fft//2+1, frames]`` (torch.stft semantics:
    reflect pad n_fft//2 on both sides when center, window zero-padded to
    n_fft)."""
    if center:
        pad = n_fft // 2
        x = jnp.pad(
            x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect"
        )
    T = x.shape[-1]
    n_frames = 1 + (T - n_fft) // hop_length
    idx = (
        np.arange(n_fft)[None, :] + hop_length * np.arange(n_frames)[:, None]
    )  # [frames, n_fft]
    frames = x[..., idx]  # [..., frames, n_fft]
    win = np.zeros(n_fft, np.float32)
    ofs = (n_fft - win_length) // 2
    win[ofs : ofs + win_length] = hann_window(win_length)
    spec = jnp.fft.rfft(frames * jnp.asarray(win), n=n_fft, axis=-1)
    power = jnp.square(jnp.real(spec)) + jnp.square(jnp.imag(spec))
    return jnp.swapaxes(power, -1, -2)


def mel_spectrogram(
    x: jnp.ndarray,
    sample_rate: int = 16_000,
    n_fft: int = 512,
    win_length: int = 400,
    hop_length: int = 160,
    n_mels: int = 80,
) -> jnp.ndarray:
    """``[..., T] -> [..., n_mels, frames]`` power mel."""
    power = stft_power(x, n_fft, win_length, hop_length)  # [..., F, frames]
    fb = jnp.asarray(mel_filterbank(n_mels, n_fft, sample_rate))
    return jnp.einsum("...ft,fm->...mt", power, fb)


def log_fbank(x: jnp.ndarray, sample_rate: int = 16_000) -> jnp.ndarray:
    """Speaker frontend (speaker_cloning.py:13-35): log-mel with
    per-utterance mean subtraction over time. ``[B, T] -> [B, 80, frames]``."""
    mel = mel_spectrogram(x, sample_rate)
    out = jnp.log(mel + 1e-6)
    return out - out.mean(axis=-1, keepdims=True)
