"""Conditioner zoo tests: math vs independent torch references + the
PrefixConditioner contract (required keys, uncond fallback, concat order)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from zonos_vibes_tpu.config import PrefixConditionerConfig
from zonos_vibes_tpu.models.conditioners import (
    ConditionerSpec,
    PrefixConditioner,
    apply_conditioner,
    init_conditioner,
)

D = 32


def test_fourier_conditioner_math():
    spec = ConditionerSpec(
        {"type": "FourierConditioner", "name": "emotion", "input_dim": 8,
         "std": 1.0, "min_val": 0.0, "max_val": 1.0},
        D,
    )
    params = init_conditioner(jax.random.key(0), spec, jnp.float32)
    x = np.random.default_rng(0).random((2, 1, 8)).astype(np.float32)
    out = np.asarray(apply_conditioner(params, spec, jnp.asarray(x)))
    w = torch.from_numpy(np.asarray(params["weight"]))
    f = 2 * torch.pi * torch.from_numpy(x) @ w.T
    ref = torch.cat([f.cos(), f.sin()], dim=-1).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
    assert out.shape == (2, 1, D)


def test_fourier_min_max_normalization():
    spec = ConditionerSpec(
        {"type": "FourierConditioner", "name": "fmax", "input_dim": 1,
         "min_val": 0.0, "max_val": 24000.0},
        D,
    )
    params = init_conditioner(jax.random.key(1), spec, jnp.float32)
    lo = apply_conditioner(params, spec, jnp.zeros((1, 1, 1)))
    hi = apply_conditioner(params, spec, jnp.full((1, 1, 1), 24000.0))
    # x=0 -> f=0 -> cos=1, sin=0
    np.testing.assert_allclose(
        np.asarray(lo)[..., : D // 2], np.ones((1, 1, D // 2)), atol=1e-6
    )
    assert not np.allclose(np.asarray(hi), np.asarray(lo))


def test_integer_conditioner():
    spec = ConditionerSpec(
        {"type": "IntegerConditioner", "name": "language_id",
         "min_val": -1, "max_val": 126},
        D,
    )
    params = init_conditioner(jax.random.key(2), spec, jnp.float32)
    assert params["int_embedder"]["weight"].shape == (128, D)
    out = apply_conditioner(params, spec, jnp.asarray([[[5]]]))
    ref = params["int_embedder"]["weight"][6]  # 5 - (-1)
    np.testing.assert_allclose(np.asarray(out)[0, 0], np.asarray(ref))


def test_uncond_vector_and_required_keys():
    cfg = PrefixConditionerConfig.from_dict(
        {
            "projection": "linear",
            "conditioners": [
                {"type": "EspeakPhonemeConditioner", "name": "espeak"},
                {"type": "PassthroughConditioner", "name": "speaker",
                 "cond_dim": 16, "projection": "linear",
                 "uncond_type": "learned"},
                {"type": "FourierConditioner", "name": "emotion",
                 "input_dim": 8, "uncond_type": "learned"},
            ],
        }
    )
    pc = PrefixConditioner(cfg, D)
    assert pc.required_keys == {"espeak"}
    params = pc.init(jax.random.key(3), jnp.float32)

    phonemes = jnp.asarray([[2, 10, 11, 3]])
    # Missing required key raises.
    with pytest.raises(ValueError):
        pc.apply(params, {"speaker": jnp.ones((1, 1, 16))})

    out = pc.apply(params, {"espeak": phonemes})
    # seq dim = phonemes(4) + speaker uncond(1) + emotion uncond(1)
    assert out.shape == (1, 6, D)

    out2 = pc.apply(
        params,
        {"espeak": phonemes, "speaker": jnp.ones((1, 1, 16)),
         "emotion": jnp.full((1, 1, 8), 0.125)},
    )
    assert out2.shape == (1, 6, D)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_batch_broadcast():
    cfg = PrefixConditionerConfig.from_dict(
        {
            "projection": "none",
            "conditioners": [
                {"type": "EspeakPhonemeConditioner", "name": "espeak"},
                {"type": "FourierConditioner", "name": "pitch_std",
                 "input_dim": 1, "min_val": 0, "max_val": 400,
                 "uncond_type": "learned"},
            ],
        }
    )
    pc = PrefixConditioner(cfg, D)
    params = pc.init(jax.random.key(4), jnp.float32)
    phonemes = jnp.asarray([[2, 5, 3], [2, 7, 3]])  # batch 2
    out = pc.apply(params, {"espeak": phonemes})  # pitch uncond [1,1,D] -> broadcast
    assert out.shape == (2, 4, D)
