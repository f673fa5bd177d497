"""Pallas flash-prefill kernel vs the XLA reference (interpret mode on CPU).

Covers: causal masking, GQA head grouping, nonzero chunk offsets (audio-
prefix continuation placement), non-block-divisible chunk lengths, bf16.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from zonos_vibes_tpu.ops.attention import prefill_attention
from zonos_vibes_tpu.ops.pallas.prefill_attention import prefill_attention_pallas


def _rand(shape, dtype=np.float32, seed=0):
    return jnp.asarray(np.random.default_rng(seed).standard_normal(shape).astype(dtype))


@pytest.mark.parametrize("S,offset", [(128, 0), (96, 0), (64, 64), (200, 33)])
def test_matches_xla_reference(S, offset):
    B, Hq, Hkv, D, T = 2, 8, 2, 64, 256
    q = _rand((B, S, Hq, D), seed=1)
    kc = _rand((B, Hkv, D, T), seed=2)
    vc = _rand((B, Hkv, D, T), seed=3)
    ref = prefill_attention(q, kc, vc, jnp.int32(offset), S)
    out = prefill_attention_pallas(
        q, kc, vc, jnp.int32(offset), block_q=64, block_k=128, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_bf16_inputs():
    B, Hq, Hkv, D, T = 1, 4, 4, 64, 128
    q = _rand((B, 100, Hq, D), seed=4).astype(jnp.bfloat16)
    kc = _rand((B, Hkv, D, T), seed=5).astype(jnp.bfloat16)
    vc = _rand((B, Hkv, D, T), seed=6).astype(jnp.bfloat16)
    ref = prefill_attention(q, kc, vc, jnp.int32(0), 100)
    out = prefill_attention_pallas(
        q, kc, vc, jnp.int32(0), block_q=64, block_k=128, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=3e-2, atol=3e-2,
    )
