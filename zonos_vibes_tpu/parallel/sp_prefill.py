"""Sequence-parallel prefill for the transformer backbone.

SURVEY.md §2.10/§5.7: prefill is the only phase with enough sequence length
to shard (conditioning + audio-prefix, thousands of frames for long
continuations); decode is a single token. This module runs the FULL layer
stack with hidden states sharded along sequence over a mesh axis:

* LN / projections / MLP are elementwise or row-wise in sequence — GSPMD
  keeps them sequence-sharded from one sharding constraint on the hidden;
* attention is the only cross-position op: per layer it routes through
  ring attention (``ppermute`` KV ring, blockwise online softmax) or
  Ulysses (``all_to_all`` seq<->head reshard) from parallel/ring_attention;
* each layer's K/V chunk is collected and written into the standard
  ``[L, B, Hkv, Dh, T]`` decode cache (layout: models/backbone.py
  allocate_kv_cache), so decode proceeds unchanged after an SP prefill —
  the cache assembly is the one all-gather this strategy pays.

Covers the first prefill (write offset 0 — the engine's only prefill shape,
engine/generate.py:_prefill_state). RoPE uses global positions, so chunk
placement is invisible to the math.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import BackboneConfig
from ..ops.norms import layer_norm
from ..ops.mlp import swiglu
from ..ops.rope import apply_rope, expand_rope_table, rope_table
from .ring_attention import ring_attention_prefill, ulysses_prefill


def sp_prefill_forward(
    params: dict,
    cfg: BackboneConfig,
    hidden: jnp.ndarray,  # [B, S, D] global; S % axis_size == 0
    cache: dict,  # from allocate_kv_cache, written at [0:S]
    lengths_per_sample: jnp.ndarray,  # [B] int32 RoPE base positions
    mesh: Mesh,
    axis_name: str = "model",
    method: str = "ring",  # "ring" | "ulysses"
    rope: jnp.ndarray | None = None,
):
    """Sequence-parallel equivalent of models/backbone.transformer_forward
    for the first prefill. Returns ``(hidden_out [B, S, D], cache)`` —
    bitwise-comparable to the dense path up to reduction order."""
    B, S, D = hidden.shape
    Hq, Hkv, Dh = cfg.num_heads, cfg.num_heads_kv, cfg.head_dim
    if rope is None:
        rope = expand_rope_table(rope_table(cfg.head_dim))
    attn = {"ring": ring_attention_prefill, "ulysses": ulysses_prefill}[method]
    seq_spec = NamedSharding(mesh, P(None, axis_name, None))

    hidden = jax.lax.with_sharding_constraint(hidden, seq_spec)
    positions = (
        jnp.arange(S, dtype=jnp.int32)[None, :]
        + lengths_per_sample.astype(jnp.int32)[:, None]
    )

    def body(h, layer_params):
        x = layer_norm(
            h, layer_params["norm1"]["weight"], layer_params["norm1"]["bias"],
            cfg.norm_epsilon,
        )
        qkv = x @ layer_params["in_proj"]["weight"]
        q, k, v = jnp.split(qkv, [Hq * Dh, (Hq + Hkv) * Dh], axis=-1)
        q = apply_rope(q.reshape(B, S, Hq, Dh), positions, rope)
        k = apply_rope(k.reshape(B, S, Hkv, Dh), positions, rope)
        v = v.reshape(B, S, Hkv, Dh)
        y = attn(q, k, v, mesh, axis_name)
        y = y.reshape(B, S, Hq * Dh) @ layer_params["out_proj"]["weight"]
        h = h + y
        x = layer_norm(
            h, layer_params["norm2"]["weight"], layer_params["norm2"]["bias"],
            cfg.norm_epsilon,
        )
        h = h + swiglu(x, layer_params["fc1"]["weight"],
                       layer_params["fc2"]["weight"])
        h = jax.lax.with_sharding_constraint(h, seq_spec)
        return h, (k, v)

    hidden, (ks, vs) = jax.lax.scan(body, hidden, params["layers"])
    hidden = layer_norm(
        hidden, params["norm_f"]["weight"], params["norm_f"]["bias"],
        cfg.norm_epsilon,
    )
    # Assemble the decode cache: [L, B, S, Hkv, Dh] -> [L, B, Hkv, Dh, S]
    # written at time offset 0 (the all-gather this strategy pays; decode
    # then runs the standard single-chip/TP path against a full cache).
    k_slab = ks.transpose(0, 1, 3, 4, 2).astype(cache["k"].dtype)
    v_slab = vs.transpose(0, 1, 3, 4, 2).astype(cache["v"].dtype)
    zero = (0, 0, 0, 0, 0)
    cache = {
        **cache,  # preserve the decode-stage buffers (k_stage/v_stage)
        "k": jax.lax.dynamic_update_slice(cache["k"], k_slab, zero),
        "v": jax.lax.dynamic_update_slice(cache["v"], v_slab, zero),
    }
    return hidden, cache
