"""Ring-attention (CP) and Ulysses sequence-parallel prefill vs the dense
causal reference, on the spoofed 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zonos_vibes_tpu.config import MeshConfig
from zonos_vibes_tpu.parallel.ring_attention import (
    ring_attention_prefill,
    ulysses_prefill,
)
from zonos_vibes_tpu.parallel.sharding import make_mesh


def _dense_causal(q, k, v):
    B, S, Hq, D = q.shape
    Hkv = k.shape[2]
    G = Hq // Hkv
    qg = q.reshape(B, S, Hkv, G, D).astype(np.float32) / np.sqrt(D)
    scores = np.einsum("bikgd,bjkd->bkgij", qg, np.asarray(k, np.float32))
    mask = np.tril(np.ones((S, S), bool))
    scores = np.where(mask[None, None, None], scores, -1e30)
    probs = jax.nn.softmax(jnp.asarray(scores), axis=-1)
    out = np.einsum(
        "bkgij,bjkd->bikgd", np.asarray(probs), np.asarray(v, np.float32)
    )
    return out.reshape(B, S, Hq, D)


def _qkv(B=2, S=32, Hq=8, Hkv=4, D=16, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, S, Hq, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, S, Hkv, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, S, Hkv, D)).astype(np.float32))
    return q, k, v


@pytest.mark.parametrize("sp", [2, 4, 8])
def test_ring_matches_dense(sp):
    mesh = make_mesh(MeshConfig(data=1, model=sp))
    q, k, v = _qkv()
    out = ring_attention_prefill(q, k, v, mesh, axis_name="model")
    ref = _dense_causal(q, k, v)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("sp", [2, 4])
def test_ulysses_matches_dense(sp):
    mesh = make_mesh(MeshConfig(data=1, model=sp))
    q, k, v = _qkv(seed=1)
    out = ulysses_prefill(q, k, v, mesh, axis_name="model")
    ref = _dense_causal(q, k, v)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_ring_with_data_axis_too():
    """CP composed with DP: batch over data, sequence over model."""
    mesh = make_mesh(MeshConfig(data=2, model=4))
    q, k, v = _qkv(B=4, seed=2)
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P("data", "model", None, None))
    q, k, v = (jax.device_put(x, sh) for x in (q, k, v))
    out = ring_attention_prefill(q, k, v, mesh, axis_name="model")
    ref = _dense_causal(q, k, v)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("seq_end", [1, 7, 16, 33, 64])
def test_sp_decode_matches_gathered(seq_end):
    """Sequence-sharded flash-decode (SURVEY.md §5.7): partial attention per
    KV time-shard + pmax/psum combine == decode over the gathered cache —
    including seq_end values that leave whole shards fully masked."""
    from zonos_vibes_tpu.ops.attention import decode_attention
    from zonos_vibes_tpu.parallel.ring_attention import sp_decode_attention

    rng = np.random.default_rng(seq_end)
    B, Hq, Hkv, D, T = 2, 8, 2, 16, 64
    q = jnp.asarray(rng.standard_normal((B, 1, Hq, D)).astype(np.float32))
    kc = jnp.asarray(rng.standard_normal((B, Hkv, D, T)).astype(np.float32))
    vc = jnp.asarray(rng.standard_normal((B, Hkv, D, T)).astype(np.float32))
    mesh = make_mesh(MeshConfig(data=1, model=4))

    ref = decode_attention(q, kc, vc, jnp.int32(seq_end))
    out = sp_decode_attention(q, kc, vc, seq_end, mesh, axis_name="model")
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4
    )
