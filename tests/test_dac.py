"""DAC codec golden-parity tests: our JAX implementation with weights
converted from a randomly-initialized HF ``transformers`` DacModel must
reproduce its encode / decode outputs (the reference pipeline runs exactly
that torch model, zonos/autoencoder.py:11-27)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from zonos_vibes_tpu.models.dac import DACConfig, DACModel
from zonos_vibes_tpu.utils.checkpoint import convert_dac_state_dict

transformers = pytest.importorskip("transformers")
from transformers.models.dac import DacConfig as HFDacConfig, DacModel  # noqa: E402

TINY = dict(
    encoder_hidden_size=16,
    downsampling_ratios=[2, 4],
    decoder_hidden_size=64,
    n_codebooks=3,
    codebook_size=32,
    codebook_dim=4,
    sampling_rate=44100,
)


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    hf = DacModel(HFDacConfig(**TINY)).eval()
    ours = DACModel(
        DACConfig(
            encoder_hidden_size=16,
            downsampling_ratios=(2, 4),
            decoder_hidden_size=64,
            n_codebooks=3,
            codebook_size=32,
            codebook_dim=4,
        )
    )
    params = convert_dac_state_dict(hf.state_dict(), ours.config, jnp.float32)
    return hf, ours, params


def test_decoder_parity(pair):
    hf, ours, params = pair
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 32, size=(2, 3, 10))
    with torch.no_grad():
        ref = hf.decode(audio_codes=torch.from_numpy(codes)).audio_values.numpy()
    out = np.asarray(ours.decode(params, jnp.asarray(codes)))[:, 0, :]
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_encoder_parity(pair):
    hf, ours, params = pair
    rng = np.random.default_rng(1)
    hop = 8  # 2*4
    wav = rng.standard_normal((1, 1, hop * 20)).astype(np.float32) * 0.1
    with torch.no_grad():
        ref_codes = hf.encode(torch.from_numpy(wav)).audio_codes.numpy()
    codes = np.asarray(ours.encode(params, jnp.asarray(wav)))
    assert codes.shape == ref_codes.shape
    # Nearest-neighbour assignments must agree except at exact-tie boundaries.
    agree = (codes == ref_codes).mean()
    assert agree > 0.99, f"code agreement {agree}"


def test_roundtrip_shapes(pair):
    _, ours, params = pair
    codes = jnp.zeros((1, 3, 5), jnp.int32)
    wav = ours.decode(params, codes)
    assert wav.shape == (1, 1, 5 * 8)
    codes2 = ours.encode(params, wav)
    assert codes2.shape == (1, 3, 5)


def test_flagship_decoder_half_receptive_field_within_stream_margin():
    """The latency-tuned serving config (bench/pool_stream_ttfa.py:
    stream_margin=12) relies on the 44.1 kHz decoder's half receptive
    field being < 12 code frames — measure it empirically (perturb one
    frame, diff the waveforms) so a decoder-topology change that widens
    the RF fails here instead of silently degrading streamed chunks."""
    import jax

    cfg = DACConfig()  # flagship topology
    model = DACModel(cfg)
    params = model.init(jax.random.key(0))
    T = 64
    rng = np.random.default_rng(0)
    codes = jnp.asarray(
        rng.integers(0, cfg.codebook_size, (1, cfg.n_codebooks, T)))
    mid = T // 2
    codes2 = codes.at[0, :, mid].set(
        (codes[0, :, mid] + 7) % cfg.codebook_size)
    w1 = np.asarray(model.decode(params, codes))[0, 0]
    w2 = np.asarray(model.decode(params, codes2))[0, 0]
    idx = np.nonzero(np.abs(w1 - w2) > 1e-7)[0]
    hop = cfg.hop_length
    left = (mid * hop - idx.min()) / hop
    right = (idx.max() - (mid + 1) * hop) / hop
    assert max(left, right) < 12, (left, right)
    # Measured 9.02 frames each side (round 4); 12 leaves ~33% slack.
