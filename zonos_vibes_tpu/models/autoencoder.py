"""DAC autoencoder wrapper with the reference's preprocessing contract
(zonos/autoencoder.py:11-27): resample to 44.1 kHz, right-pad to a multiple
of the 512-sample hop, 9 codebooks x 1024 codes at ~86.13 Hz."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.dsp import resample
from .dac import DACConfig, DACModel


class DACAutoencoder:
    def __init__(self, config: DACConfig | None = None):
        self.model = DACModel(config)
        cfg = self.model.config
        self.codebook_size = cfg.codebook_size  # 1024
        self.num_codebooks = cfg.n_codebooks  # 9
        self.sampling_rate = cfg.sampling_rate  # 44100
        self.hop = cfg.hop_length  # 512

    def init(self, key: jax.Array, dtype=jnp.float32) -> dict:
        return self.model.init(key, dtype)

    def preprocess(self, wav: jnp.ndarray, sr: int) -> jnp.ndarray:
        """``[..., T]`` any rate -> 44.1 kHz right-padded to hop multiple
        (autoencoder.py:17-20)."""
        wav = resample(wav, sr, self.sampling_rate)
        right = -wav.shape[-1] % self.hop
        if right:
            wav = jnp.pad(wav, [(0, 0)] * (wav.ndim - 1) + [(0, right)])
        return wav

    def encode(self, params: dict, wav: jnp.ndarray) -> jnp.ndarray:
        """``[B, 1, T] -> [B, 9, T/512]`` int codes (autoencoder.py:22-23)."""
        return self.model.encode(params, wav)

    def decode(self, params: dict, codes: jnp.ndarray) -> jnp.ndarray:
        """``[B, 9, T'] -> [B, 1, T'*512]`` float waveform in [-1, 1]
        (autoencoder.py:25-27; fp32 accumulation on TPU instead of the
        reference's CUDA fp16 autocast)."""
        return self.model.decode(params, codes)
