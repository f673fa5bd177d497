"""Native C++ DSP library vs the JAX reference implementations."""

import jax.numpy as jnp
import numpy as np
import pytest

from zonos_vibes_tpu.frontend import native_dsp
from zonos_vibes_tpu.utils.dsp import log_fbank, resample

pytestmark = pytest.mark.skipif(
    not native_dsp.available(), reason="native DSP library not built"
)


def test_native_resample_matches_jax():
    rng = np.random.default_rng(0)
    wav = rng.standard_normal(44100).astype(np.float32) * 0.3
    ours = native_dsp.resample(wav, 44100, 16000)
    ref = np.asarray(resample(jnp.asarray(wav[None]), 44100, 16000))[0]
    assert abs(ours.shape[0] - ref.shape[0]) <= 1
    n = min(ours.shape[0], ref.shape[0])
    np.testing.assert_allclose(ours[:n], ref[:n], rtol=1e-4, atol=1e-5)


def test_native_resample_identity():
    wav = np.arange(100, dtype=np.float32)
    np.testing.assert_array_equal(native_dsp.resample(wav, 16000, 16000), wav)


def test_native_log_mel_matches_jax():
    rng = np.random.default_rng(1)
    wav = rng.standard_normal(16000).astype(np.float32) * 0.2
    ours = native_dsp.log_mel_16k(wav)
    ref = np.asarray(log_fbank(jnp.asarray(wav[None])))[0]
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=2e-3)
