"""Sequence-parallel prefill wired into the generate path (SURVEY.md §5.7).

``sp_generate_jit`` is the ParallelEngine's long-prefill route: the prefill
backbone pass runs sequence-sharded over a mesh axis
(parallel/sp_prefill.sp_prefill_forward — ring or Ulysses attention), writes
the standard decode cache, and hands off to the UNCHANGED decode loop
(engine/generate._decode_loop) — so a long audio-prefix continuation pays
O(S/axis) prefill memory/compute per device and decodes exactly like the
dense path. Everything outside the backbone pass (delay pattern, first-frame
sampling, EOS machinery, finalize) is shared with engine/generate by
construction, keeping the two paths semantically identical.

Use case (reference parity): /tts ``prefix_audio_path`` continuations — the
reference prefills the whole prefix densely on one GPU
(/root/reference/zonos/model.py:241-264); here thousands of prefix frames
shard over the mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..engine.generate import (
    UNKNOWN_TOKEN,
    _decode_loop,
    _finalize,
    _find_multiple,
    _masked_scatter_frame,
)
from ..models.zonos import ZonosModel
from ..ops.attention import NEG_INF
from ..ops.delay_pattern import apply_delay_pattern
from ..ops.rope import expand_rope_table, rope_table
from ..ops.sampling import SamplingParams, sample_from_logits
from .sp_prefill import sp_prefill_forward

_STATICS = (
    "model", "prefix_audio_len", "max_new_tokens", "cfg_scale", "sampling",
    "disable_eos", "mesh", "axis_name", "method",
)


@functools.partial(jax.jit, static_argnames=_STATICS)
def sp_generate_jit(
    model: ZonosModel,
    params: dict,
    prefix_conditioning: jnp.ndarray,  # [2B, Lc, D] (cond ‖ uncond)
    audio_prefix_codes: jnp.ndarray,  # [B, K, Lp] int32
    key: jax.Array,
    prefix_audio_len: int,
    max_new_tokens: int,
    cfg_scale: float,
    sampling: SamplingParams,
    disable_eos: bool,
    mesh,
    axis_name: str = "model",
    method: str = "ring",
):
    """generate_jit with the prefill backbone pass sequence-sharded.
    Transformer backbones, bf16/f32 caches (no kv_int8). Outputs match the
    dense path up to reduction order (tests/test_sp_prefill.py)."""
    cfg = model.config
    K = cfg.num_codebooks
    mask_tok = cfg.masked_token_id
    two_b, cond_len, _ = prefix_conditioning.shape
    batch = two_b // 2
    lp = prefix_audio_len
    audio_seq_len = lp + max_new_tokens
    seq_len = cond_len + audio_seq_len + K
    seq_len = _find_multiple(seq_len, 512 if seq_len >= 1024 else 8)
    rope = expand_rope_table(rope_table(cfg.backbone.head_dim))
    cache = model.allocate_cache(two_b, seq_len, prefix_conditioning.dtype)

    codes = jnp.full((batch, K, audio_seq_len), UNKNOWN_TOKEN, jnp.int32)
    if lp > 0:
        codes = codes.at[..., :lp].set(audio_prefix_codes.astype(jnp.int32))
    delayed = apply_delay_pattern(codes, mask_tok)

    prefix_frames = delayed[..., : lp + 1]
    emb = model.embed_codes(params, prefix_frames)
    emb = jnp.concatenate([emb, emb], axis=0)
    hidden = jnp.concatenate(
        [prefix_conditioning.astype(emb.dtype), emb], axis=1
    )

    # SP needs S divisible by the axis size: RIGHT-pad with zeros. Padded
    # queries produce garbage outputs (discarded — logits come from the
    # real last position) and padded K/V land at cache positions past the
    # prefill end, outside every decode attention bound, and are
    # overwritten by the first stage flush at those positions anyway.
    S_real = cond_len + lp + 1
    axis_size = mesh.shape[axis_name]
    pad = -S_real % axis_size
    if pad:
        hidden = jnp.pad(hidden, ((0, 0), (0, pad), (0, 0)))
    lengths0 = jnp.zeros((two_b,), jnp.int32)

    hidden_out, cache = sp_prefill_forward(
        params["backbone"], cfg.backbone, hidden, cache, lengths0,
        mesh, axis_name=axis_name, method=method, rope=rope,
    )

    last = hidden_out[:, S_real - 1: S_real, :]
    logits = model.apply_heads(params, last)[:, :, 0, :]
    if cfg_scale != 1.0:
        cond_l, uncond_l = jnp.split(logits, 2, axis=0)
        logits = uncond_l + (cond_l - uncond_l) * cfg_scale
    V = logits.shape[-1]
    col = jnp.arange(V)
    logits = jnp.where(
        col[None, None, :] >= cfg.head_vocab_size, NEG_INF, logits
    )
    if disable_eos:
        logits = logits.at[:, :, cfg.eos_token_id].set(NEG_INF)
    key, k0 = jax.random.split(key)
    next_token = sample_from_logits(k0, logits, sampling)

    offset0 = lp + 1
    frame = delayed[..., offset0]
    frame = _masked_scatter_frame(frame, next_token)
    delayed = delayed.at[..., offset0].set(frame)

    state = {
        "delayed": delayed,
        "cache": cache,
        "offset": jnp.int32(offset0),
        "remaining": jnp.full((batch,), delayed.shape[-1] - offset0, jnp.int32),
        "stopping": jnp.zeros((batch,), bool),
        "stop_offset": jnp.full((batch,), -1, jnp.int32),
        "key": key,
    }
    if isinstance(cache, dict) and "k_stage" in cache:
        state["stage_base"] = jnp.int32(S_real)
    state = _decode_loop(
        model, params, state, cond_len, cfg_scale, sampling, disable_eos,
        step_limit=None,
    )
    return _finalize(model, state)
