"""Pallas flash-decode kernel vs the XLA reference (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from zonos_vibes_tpu.ops.attention import decode_attention
from zonos_vibes_tpu.ops.pallas.decode_attention import decode_attention_pallas


@pytest.mark.parametrize("seq_end", [1, 60, 128, 200])
def test_matches_xla_reference(seq_end):
    rng = np.random.default_rng(0)
    B, Hq, Hkv, D, T = 2, 8, 2, 64, 256
    q = jnp.asarray(rng.standard_normal((B, 1, Hq, D)).astype(np.float32))
    kc = jnp.asarray(rng.standard_normal((B, Hkv, D, T)).astype(np.float32))
    vc = jnp.asarray(rng.standard_normal((B, Hkv, D, T)).astype(np.float32))

    ref = decode_attention(q, kc, vc, jnp.int32(seq_end))
    out = decode_attention_pallas(
        q, kc, vc, jnp.int32(seq_end), block=128, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_bf16_inputs():
    rng = np.random.default_rng(1)
    B, Hq, Hkv, D, T = 1, 4, 4, 64, 128
    q = jnp.asarray(rng.standard_normal((B, 1, Hq, D)), jnp.bfloat16)
    kc = jnp.asarray(rng.standard_normal((B, Hkv, D, T)), jnp.bfloat16)
    vc = jnp.asarray(rng.standard_normal((B, Hkv, D, T)), jnp.bfloat16)
    ref = decode_attention(q, kc, vc, jnp.int32(77))
    out = decode_attention_pallas(q, kc, vc, jnp.int32(77), block=128,
                                  interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=3e-2, atol=3e-2,
    )


@pytest.mark.parametrize("prefix_end", [0, 1, 60, 128, 200])
@pytest.mark.parametrize("layer", [0, 2])
def test_layered_matches_xla_reference(prefix_end, layer):
    """Layer-indexed kernel (full stacked cache + separate current column)
    vs the XLA slab reference with the column spliced in."""
    from zonos_vibes_tpu.ops.pallas.decode_attention import (
        decode_attention_pallas_layered,
    )

    rng = np.random.default_rng(2)
    L, B, Hq, Hkv, D, T = 3, 2, 8, 2, 64, 256
    q = jnp.asarray(rng.standard_normal((B, 1, Hq, D)).astype(np.float32))
    kc = jnp.asarray(rng.standard_normal((L, B, Hkv, D, T)).astype(np.float32))
    vc = jnp.asarray(rng.standard_normal((L, B, Hkv, D, T)).astype(np.float32))
    k_cur = jnp.asarray(rng.standard_normal((B, Hkv, D, 1)).astype(np.float32))
    v_cur = jnp.asarray(rng.standard_normal((B, Hkv, D, 1)).astype(np.float32))

    # Reference: splice the current column at prefix_end, dense attention
    # over the prefix INCLUDING the current token.
    slab_k = kc[layer].at[:, :, :, prefix_end].set(k_cur[..., 0])
    slab_v = vc[layer].at[:, :, :, prefix_end].set(v_cur[..., 0])
    ref = decode_attention(q, slab_k, slab_v, jnp.int32(prefix_end + 1))

    out = decode_attention_pallas_layered(
        q, kc, vc, k_cur, v_cur, jnp.int32(prefix_end), jnp.int32(layer),
        block=128, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_layered_single_block_unaligned_T():
    """Short serving caches (T rounded to 8, not 512) run as ONE block whose
    size equals T — the Mosaic-legal single-block case the dispatcher now
    accepts instead of falling back to the slab path."""
    from zonos_vibes_tpu.ops.pallas.decode_attention import (
        decode_attention_pallas_layered,
    )

    rng = np.random.default_rng(5)
    L, B, Hq, Hkv, D, T = 2, 3, 8, 2, 64, 176
    q = jnp.asarray(rng.standard_normal((B, 1, Hq, D)).astype(np.float32))
    kc = jnp.asarray(rng.standard_normal((L, B, Hkv, D, T)).astype(np.float32))
    vc = jnp.asarray(rng.standard_normal((L, B, Hkv, D, T)).astype(np.float32))
    k_cur = jnp.asarray(rng.standard_normal((B, Hkv, D, 1)).astype(np.float32))
    v_cur = jnp.asarray(rng.standard_normal((B, Hkv, D, 1)).astype(np.float32))
    prefix_end, layer = 111, 1

    slab_k = kc[layer].at[:, :, :, prefix_end].set(k_cur[..., 0])
    slab_v = vc[layer].at[:, :, :, prefix_end].set(v_cur[..., 0])
    ref = decode_attention(q, slab_k, slab_v, jnp.int32(prefix_end + 1))
    out = decode_attention_pallas_layered(
        q, kc, vc, k_cur, v_cur, jnp.int32(prefix_end), jnp.int32(layer),
        block=512, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )
