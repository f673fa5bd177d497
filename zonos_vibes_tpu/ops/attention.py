"""GQA attention with a preallocated KV cache — XLA reference implementations.

Semantics match the reference backbone (zonos/backbone/_torch.py:105-141):

* fused qkv projection, no bias; RoPE on q and k (interleaved-pair, ops/rope.py)
* the KV cache is a preallocated ``[B, max_seqlen, H_kv, D]`` buffer updated by
  slice assignment at the current sequence offset (_torch.py:33-49)
* prefill attends causally within the new chunk (``is_causal=seqlen > 1``);
  single-token decode attends to the full valid prefix ``[:sequence_end]``
  with no causal mask (_torch.py:136)
* left-padded conditioning tokens are *attended to* (the reference does not
  mask pads) — parity requires we don't either.

These are the portable jnp paths; the Pallas flash kernels in
``ops/pallas/`` are drop-in replacements for the same signatures.
Softmax always accumulates in fp32.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)

# Pallas flash-decode dispatch: "auto" (TPU + aligned shapes), "1", "0".
_PALLAS_DECODE = os.environ.get("ZVT_PALLAS_DECODE", "auto")
_PALLAS_BLOCK = 512
def _decode_block_ok(T: int) -> bool:
    """A cache length is kernel-eligible if it tiles into full blocks OR can
    run as a SINGLE block (Mosaic allows any block whose last dim equals the
    array dim, so short serving caches — rounded to 8, not 512 — still take
    the kernel instead of the slab fallback). Cap the single block at 2 *
    block so VMEM stays bounded."""
    return T % _PALLAS_BLOCK == 0 or T <= 2 * _PALLAS_BLOCK


# Pallas flash-prefill dispatch; only pays off for long chunks (audio-prefix
# continuation) — short text prefills stay on the XLA dense path.
_PALLAS_PREFILL = os.environ.get("ZVT_PALLAS_PREFILL", "auto")
_PALLAS_PREFILL_MIN_S = 512

# Short-cache decode dispatch (VERDICT r4 #5) — MEASURED NEGATIVE RESULT
# (round 5, docs/KERNELS.md): the hypothesis was that below some cache
# length the layered Pallas custom-call's ~5 µs/layer fixed cost (144
# µs/step at 26 layers, round-4/5 traces) dominates and a fused pure-XLA
# attention over (flushed prefix ‖ stage ‖ current) would win by avoiding
# custom-call entry/exit. A/B at 86 steps (T=168, int8): Pallas 2.752
# ms/step vs XLA-short 2.799 ms/step — XLA's own handling of the
# concat-softmax + per-segment dots costs ~190 µs/step, MORE than the
# launch overhead it saves, and both costs are T-independent so the
# verdict holds at any short cache. Default off; the path stays for
# non-TPU backends (it IS the CPU-test fallback semantics) and as the
# env-gated knob that produced the measurement.
_DECODE_SHORT_T_ENV = os.environ.get("ZVT_DECODE_SHORT_T")


def _decode_short_t() -> int:
    # Deferred (not at import): jax.default_backend() initializes the
    # platform, and test conftests switch it after package import.
    if _DECODE_SHORT_T_ENV is not None:
        return int(_DECODE_SHORT_T_ENV)
    return 0 if jax.default_backend() == "tpu" else 640


def _decode_layered_xla_short(
    q, kc, vc, ksc, vsc, k_stage, v_stage, k_cur, v_cur,
    flushed_end, stage_len, layer,
):
    """Fused short-cache decode attention, one layer picked by a traced
    index. Semantics identical to the layered Pallas kernels
    (ops/pallas/decode_attention.py): softmax over the concatenation of
    the flushed prefix (masked to ``flushed_end``; int8 dequant rides
    POST-dot — per-token scales commute with the D-contraction), the
    exact time-major stage tail (masked to ``stage_len``) and the current
    token. No slab splice, no materialized dequant copy: every piece is
    an operand of its own dot, so XLA fuses the int8/bf16 cache reads
    directly into the score/value contractions."""
    B, S, Hq, D = q.shape
    L, _, Hkv, _, T = kc.shape
    G = Hq // Hkv
    STAGE = k_stage.shape[2]
    qg = q.reshape(B, Hkv, G, D).astype(jnp.float32) * (D ** -0.5)

    kc_l = jax.lax.dynamic_index_in_dim(kc, layer, 0, keepdims=False)
    vc_l = jax.lax.dynamic_index_in_dim(vc, layer, 0, keepdims=False)
    sc_pre = jnp.einsum(
        "bkgd,bkdt->bkgt", qg, kc_l.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    if ksc is not None:
        ks_l = jax.lax.dynamic_index_in_dim(ksc, layer, 0, keepdims=False)
        sc_pre = sc_pre * ks_l[:, :, None, :]
    t_idx = jnp.arange(T, dtype=jnp.int32)[None, None, None, :]
    sc_pre = jnp.where(
        t_idx < jnp.asarray(flushed_end, jnp.int32), sc_pre, NEG_INF
    )

    ks_st = jax.lax.dynamic_index_in_dim(
        k_stage, layer, 0, keepdims=False
    ).reshape(B, STAGE, Hkv, D)
    vs_st = jax.lax.dynamic_index_in_dim(
        v_stage, layer, 0, keepdims=False
    ).reshape(B, STAGE, Hkv, D)
    sc_st = jnp.einsum(
        "bkgd,bskd->bkgs", qg, ks_st.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    s_idx = jnp.arange(STAGE, dtype=jnp.int32)[None, None, None, :]
    sc_st = jnp.where(
        s_idx < jnp.asarray(stage_len, jnp.int32), sc_st, NEG_INF
    )

    sc_cur = jnp.einsum(
        "bkgd,bkd->bkg", qg, k_cur[..., 0].astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )[..., None]

    probs = jax.nn.softmax(
        jnp.concatenate([sc_pre, sc_st, sc_cur], axis=-1), axis=-1
    )
    p_pre, p_st, p_cur = (
        probs[..., :T], probs[..., T: T + STAGE], probs[..., T + STAGE:]
    )
    if vsc is not None:
        vs_l = jax.lax.dynamic_index_in_dim(vsc, layer, 0, keepdims=False)
        p_pre = p_pre * vs_l[:, :, None, :]
    out = jnp.einsum(
        "bkgt,bkdt->bkgd", p_pre, vc_l.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    out = out + jnp.einsum(
        "bkgs,bskd->bkgd", p_st, vs_st.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    out = out + p_cur * v_cur[..., 0].astype(jnp.float32)[:, :, None, :]
    return out.reshape(B, 1, Hq, D).astype(q.dtype)


def update_kv_cache(
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    offset: jnp.ndarray,
):
    """Write ``k, v`` ``[B, S, H_kv, D]`` into ``[B, H_kv, D, T]`` caches at
    time slots ``[offset:offset+S]``.

    Cache layout is head-major and TIME-MINOR (``[B, H_kv, D, T]``): each
    (batch, head) slab is a ``[D, T]`` matrix whose minor dim is the long
    time axis, so the Pallas decode kernel can DMA lane-aligned ``[D, block]``
    slabs (head_dim=64 < the 128-lane tile, so time must be minor).
    ``offset`` is a scalar (shared across the batch, matching the reference's
    scalar ``seqlen_offset``). Returns updated ``(k_cache, v_cache)``.
    """
    k = k.astype(k_cache.dtype).transpose(0, 2, 3, 1)  # [B, Hkv, D, S]
    v = v.astype(v_cache.dtype).transpose(0, 2, 3, 1)
    zero = jnp.zeros((), dtype=jnp.int32)
    idx = (zero, zero, zero, jnp.asarray(offset, jnp.int32))
    k_cache = jax.lax.dynamic_update_slice(k_cache, k, idx)
    v_cache = jax.lax.dynamic_update_slice(v_cache, v, idx)
    return k_cache, v_cache


def _grouped_scores(q: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """``q [B,S,Hq,D] x k [B,Hkv,D,T] -> scores [B,Hkv,G,S,T]`` (fp32)."""
    B, S, Hq, D = q.shape
    Hkv = k.shape[1]
    G = Hq // Hkv
    qg = q.reshape(B, S, Hkv, G, D)
    scores = jnp.einsum(
        "bskgd,bkdt->bkgst", qg, k, preferred_element_type=jnp.float32
    )
    return scores * (1.0 / jnp.sqrt(jnp.asarray(D, jnp.float32)))


def _apply_scores(probs: jnp.ndarray, v: jnp.ndarray, out_dtype) -> jnp.ndarray:
    """``probs [B,Hkv,G,S,T] x v [B,Hkv,D,T] -> [B,S,Hq,D]``."""
    B, Hkv, G, S, T = probs.shape
    D = v.shape[2]
    out = jnp.einsum(
        "bkgst,bkdt->bskgd",
        probs.astype(v.dtype),
        v,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(B, S, Hkv * G, D).astype(out_dtype)


def prefill_attention(
    q: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    offset: jnp.ndarray,
    chunk_len: int,
) -> jnp.ndarray:
    """Causal attention for a prefill chunk already written into the cache.

    Query position ``i`` (absolute ``offset + i``) attends to cache positions
    ``[0, offset + i]``. For the common first-prefill ``offset == 0`` this is
    plain causal attention over the chunk.

    Args:
      q: ``[B, S, Hq, D]`` (RoPE already applied), ``S == chunk_len``.
      k_cache/v_cache: ``[B, Hkv, D, T_max]`` with the chunk written at
        ``[offset : offset + S]``.
      offset: scalar int32 absolute position of the chunk start.
    Returns ``[B, S, Hq, D]``.
    """
    B, S, Hq, D = q.shape
    T = k_cache.shape[3]
    scores = _grouped_scores(q, k_cache)  # [B,Hkv,G,S,T]
    key_pos = jnp.arange(T, dtype=jnp.int32)[None, :]
    qry_pos = jnp.asarray(offset, jnp.int32) + jnp.arange(S, dtype=jnp.int32)[:, None]
    mask = key_pos <= qry_pos  # [S, T]
    scores = jnp.where(mask[None, None, None], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    return _apply_scores(probs, v_cache, q.dtype)


def decode_attention(
    q: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    seq_end: jnp.ndarray,
) -> jnp.ndarray:
    """Single-query attention over the valid prefix ``[:seq_end]``.

    Args:
      q: ``[B, 1, Hq, D]``.
      k_cache/v_cache: ``[B, Hkv, D, T_max]``.
      seq_end: scalar int32 — number of valid cache positions (inclusive of
        the token just written).
    Returns ``[B, 1, Hq, D]``.
    """
    T = k_cache.shape[3]
    scores = _grouped_scores(q, k_cache)  # [B,Hkv,G,1,T]
    valid = jnp.arange(T, dtype=jnp.int32)[None, None, None, None, :] < jnp.asarray(
        seq_end, jnp.int32
    )
    scores = jnp.where(valid, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    return _apply_scores(probs, v_cache, q.dtype)


def _pallas_prefill_eligible(q, k_cache) -> bool:
    if _PALLAS_PREFILL == "0":
        return False
    B, S, Hq, D = q.shape
    _, Hkv, _, T = k_cache.shape
    ok = (
        S >= _PALLAS_PREFILL_MIN_S
        and Hq % Hkv == 0
        and D % 8 == 0
        and T % 128 == 0
        and jax.default_backend() == "tpu"
    )
    return ok if _PALLAS_PREFILL == "auto" else True


def prefill_attention_auto(
    q: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    offset: jnp.ndarray,
    chunk_len: int,
) -> jnp.ndarray:
    """Dispatch: Pallas flash-prefill on TPU for long chunks (block-pruned
    causal; no [S, T] score materialization), XLA dense otherwise. Same
    signature/semantics as :func:`prefill_attention`."""
    if _pallas_prefill_eligible(q, k_cache):
        from .pallas.prefill_attention import prefill_attention_pallas

        return prefill_attention_pallas(q, k_cache, v_cache, offset)
    return prefill_attention(q, k_cache, v_cache, offset, chunk_len)


def _pallas_decode_eligible(q, k_cache) -> bool:
    if _PALLAS_DECODE == "0":
        return False
    B, S, Hq, D = q.shape
    _, Hkv, _, T = k_cache.shape
    ok = (
        S == 1
        and Hq % Hkv == 0
        and D % 8 == 0
        and _decode_block_ok(T)
        and jax.default_backend() == "tpu"
    )
    return ok if _PALLAS_DECODE == "auto" else True


def decode_attention_layered_auto(
    q: jnp.ndarray,  # [B, 1, Hq, D]
    k_cache: jnp.ndarray,  # [L, B, Hkv, D, T] flushed prefix, READ-ONLY
    v_cache: jnp.ndarray,  # [L, B, Hkv, D, T]
    k_stage: jnp.ndarray,  # [L, B, STAGE, Hkv*D] time-major unflushed tail
    v_stage: jnp.ndarray,  # [L, B, STAGE, Hkv*D]
    k_cur: jnp.ndarray,  # [B, Hkv, D, 1] current token's column
    v_cur: jnp.ndarray,  # [B, Hkv, D, 1]
    flushed_end: jnp.ndarray,  # scalar int32: flushed prefix length
    stage_len: jnp.ndarray,  # scalar int32: valid stage rows (excl. cur)
    layer: jnp.ndarray,  # scalar int32
) -> jnp.ndarray:
    """Decode attention over (flushed cache prefix) + (time-major stage
    tail) + (current token), layer picked by a traced index. On TPU this is
    the layer-indexed Pallas kernel (scalar-prefetched layer => no per-layer
    slab materialization; stage and current token fold into the
    online-softmax epilogue). The XLA fallback reproduces the semantics on
    a materialized slab: splice the stage window and the current column,
    dense attention over the combined valid prefix."""
    B, S, Hq, D = q.shape
    L, _, Hkv, _, T = k_cache.shape
    if S == 1 and Hq % Hkv == 0 and 0 < T <= _decode_short_t():
        return _decode_layered_xla_short(
            q, k_cache, v_cache, None, None, k_stage, v_stage,
            k_cur, v_cur, flushed_end, stage_len, layer,
        )
    ok = (
        _PALLAS_DECODE != "0"
        and S == 1
        and Hq % Hkv == 0
        and D % 8 == 0
        and _decode_block_ok(T)
        and (jax.default_backend() == "tpu" or _PALLAS_DECODE == "1")
    )
    if ok:
        from .pallas.decode_attention import decode_attention_pallas_layered

        return decode_attention_pallas_layered(
            q, k_cache, v_cache, k_stage, v_stage, k_cur, v_cur,
            flushed_end, stage_len, layer, block=_PALLAS_BLOCK,
        )
    kc = jax.lax.dynamic_index_in_dim(k_cache, layer, 0, keepdims=False)
    vc = jax.lax.dynamic_index_in_dim(v_cache, layer, 0, keepdims=False)
    zero = jnp.zeros((), jnp.int32)
    fe = jnp.asarray(flushed_end, jnp.int32)
    STAGE = k_stage.shape[2]
    # Stage window: [B, STAGE, Hkv, D] -> [B, Hkv, D, STAGE] spliced at
    # flushed_end; rows beyond stage_len are stale but masked out below.
    # Pad T by STAGE first so the full-window splice near the cache end
    # cannot clamp (dynamic_update_slice clamps start indices, which would
    # corrupt valid positions), then trim back.
    pad = [(0, 0)] * 3 + [(0, STAGE)]
    kc = jnp.pad(kc, pad)
    vc = jnp.pad(vc, pad)
    B_, Hkv_, D_ = q.shape[0], k_cache.shape[2], k_cache.shape[3]
    ks = jax.lax.dynamic_index_in_dim(k_stage, layer, 0, keepdims=False)
    vs = jax.lax.dynamic_index_in_dim(v_stage, layer, 0, keepdims=False)
    ks = ks.reshape(B_, STAGE, Hkv_, D_)
    vs = vs.reshape(B_, STAGE, Hkv_, D_)
    kc = jax.lax.dynamic_update_slice(
        kc, ks.transpose(0, 2, 3, 1).astype(kc.dtype), (zero, zero, zero, fe)
    )
    vc = jax.lax.dynamic_update_slice(
        vc, vs.transpose(0, 2, 3, 1).astype(vc.dtype), (zero, zero, zero, fe)
    )
    cur_pos = fe + jnp.asarray(stage_len, jnp.int32)
    idx = (zero, zero, zero, cur_pos)
    kc = jax.lax.dynamic_update_slice(kc, k_cur.astype(kc.dtype), idx)
    vc = jax.lax.dynamic_update_slice(vc, v_cur.astype(vc.dtype), idx)
    T_orig = k_cache.shape[4]
    return decode_attention(q, kc[..., :T_orig], vc[..., :T_orig], cur_pos + 1)


def decode_attention_layered_q_auto(
    q: jnp.ndarray,  # [B, 1, Hq, D]
    k_cache: jnp.ndarray,  # [L, B, Hkv, D, T] int8 flushed prefix
    v_cache: jnp.ndarray,  # [L, B, Hkv, D, T] int8
    k_scale: jnp.ndarray,  # [L, B, Hkv, T] f32
    v_scale: jnp.ndarray,  # [L, B, Hkv, T] f32
    k_stage: jnp.ndarray,  # [L, B, STAGE, Hkv*D] exact (activation dtype)
    v_stage: jnp.ndarray,
    k_cur: jnp.ndarray,  # [B, Hkv, D, 1]
    v_cur: jnp.ndarray,
    flushed_end: jnp.ndarray,
    stage_len: jnp.ndarray,
    layer: jnp.ndarray,
) -> jnp.ndarray:
    """int8-KV decode attention (int8 phase 2): TPU runs the quantized
    layered Pallas kernel (dequant in the operand read — cache crosses HBM
    as int8); the fallback dequantizes this layer's slab and reuses the
    bf16 layered semantics."""
    B, S, Hq, D = q.shape
    L, _, Hkv, _, T = k_cache.shape
    if S == 1 and Hq % Hkv == 0 and 0 < T <= _decode_short_t():
        return _decode_layered_xla_short(
            q, k_cache, v_cache, k_scale, v_scale, k_stage, v_stage,
            k_cur, v_cur, flushed_end, stage_len, layer,
        )
    ok = (
        _PALLAS_DECODE != "0"
        and S == 1
        and Hq % Hkv == 0
        and D % 8 == 0
        and _decode_block_ok(T)
        and (jax.default_backend() == "tpu" or _PALLAS_DECODE == "1")
    )
    if ok:
        from .pallas.decode_attention import decode_attention_pallas_layered_q

        return decode_attention_pallas_layered_q(
            q, k_cache, v_cache, k_scale, v_scale, k_stage, v_stage,
            k_cur, v_cur, flushed_end, stage_len, layer, block=_PALLAS_BLOCK,
        )
    kc = jax.lax.dynamic_index_in_dim(k_cache, layer, 0, keepdims=True)
    vc = jax.lax.dynamic_index_in_dim(v_cache, layer, 0, keepdims=True)
    ks = jax.lax.dynamic_index_in_dim(k_scale, layer, 0, keepdims=True)
    vs = jax.lax.dynamic_index_in_dim(v_scale, layer, 0, keepdims=True)
    kc = (kc.astype(jnp.float32) * ks[:, :, :, None, :]).astype(q.dtype)
    vc = (vc.astype(jnp.float32) * vs[:, :, :, None, :]).astype(q.dtype)
    kst = jax.lax.dynamic_index_in_dim(k_stage, layer, 0, keepdims=True)
    vst = jax.lax.dynamic_index_in_dim(v_stage, layer, 0, keepdims=True)
    return decode_attention_layered_auto(
        q, kc, vc, kst, vst, k_cur, v_cur, flushed_end, stage_len,
        jnp.int32(0),
    )


def decode_attention_pooled_auto(
    q: jnp.ndarray,  # [B, 1, Hq, D]
    k_cache: jnp.ndarray,  # [L, B, Hkv, D, T] READ-ONLY
    v_cache: jnp.ndarray,  # [L, B, Hkv, D, T]
    k_cur: jnp.ndarray,  # [B, Hkv, D, 1]
    v_cur: jnp.ndarray,  # [B, Hkv, D, 1]
    prefix_ends: jnp.ndarray,  # [B] int32 per-row valid prefix (excl. cur)
    layer: jnp.ndarray,  # scalar int32
) -> jnp.ndarray:
    """Continuous-batching decode attention: every row attends to its OWN
    prefix length (rows of one pooled step sit at different positions).
    TPU: the pooled Pallas kernel (per-row scalar-prefetched seq_end);
    fallback: dense attention with a per-row mask and per-row current-token
    splice."""
    B, S, Hq, D = q.shape
    L, _, Hkv, _, T = k_cache.shape
    ok = (
        _PALLAS_DECODE != "0"
        and S == 1
        and Hq % Hkv == 0
        and D % 8 == 0
        and _decode_block_ok(T)
        and (jax.default_backend() == "tpu" or _PALLAS_DECODE == "1")
    )
    if ok:
        from .pallas.decode_attention import decode_attention_pallas_pooled

        return decode_attention_pallas_pooled(
            q, k_cache, v_cache, k_cur, v_cur, prefix_ends, layer,
            block=_PALLAS_BLOCK,
        )
    kc = jax.lax.dynamic_index_in_dim(k_cache, layer, 0, keepdims=False)
    vc = jax.lax.dynamic_index_in_dim(v_cache, layer, 0, keepdims=False)
    pe = jnp.asarray(prefix_ends, jnp.int32)
    # Per-row current-token splice via a one-hot select over T (cheap for
    # the CPU correctness path).
    t_iota = jnp.arange(T, dtype=jnp.int32)[None, None, None, :]
    cur_mask = t_iota == pe[:, None, None, None]
    kc = jnp.where(cur_mask, k_cur.astype(kc.dtype), kc)
    vc = jnp.where(cur_mask, v_cur.astype(vc.dtype), vc)
    scores = _grouped_scores(q, kc)  # [B,Hkv,G,1,T]
    valid = t_iota[:, :, :, None, :] <= pe[:, None, None, None, None]
    scores = jnp.where(valid, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    return _apply_scores(probs, vc, q.dtype)


def decode_attention_pooled_staged_auto(
    q: jnp.ndarray,  # [B, 1, Hq, D]
    k_cache: jnp.ndarray,  # [L, B, Hkv, D, T] flushed prefixes, READ-ONLY
    v_cache: jnp.ndarray,
    k_stage: jnp.ndarray,  # [L, B, STAGE, Hkv*D] per-row ring stages
    v_stage: jnp.ndarray,
    k_cur: jnp.ndarray,  # [B, Hkv, D, 1]
    v_cur: jnp.ndarray,
    bases: jnp.ndarray,  # [B] int32 per-row flushed watermark
    stage_lens: jnp.ndarray,  # [B] int32 valid ring rows (excl. cur)
    layer: jnp.ndarray,
) -> jnp.ndarray:
    """Pooled decode attention with per-row ring stages: row b covers
    flushed prefix [0, base_b) + ring window [base_b, base_b + len_b) +
    current token. TPU: the pooled-staged Pallas kernel; fallback: dense
    over a per-row spliced slab."""
    B, S, Hq, D = q.shape
    L, _, Hkv, _, T = k_cache.shape
    ok = (
        _PALLAS_DECODE != "0"
        and S == 1
        and Hq % Hkv == 0
        and D % 8 == 0
        and _decode_block_ok(T)
        and (jax.default_backend() == "tpu" or _PALLAS_DECODE == "1")
    )
    if ok:
        from .pallas.decode_attention import (
            decode_attention_pallas_pooled_staged,
        )

        return decode_attention_pallas_pooled_staged(
            q, k_cache, v_cache, k_stage, v_stage, k_cur, v_cur,
            bases, stage_lens, layer, block=_PALLAS_BLOCK,
        )
    kc = jax.lax.dynamic_index_in_dim(k_cache, layer, 0, keepdims=False)
    vc = jax.lax.dynamic_index_in_dim(v_cache, layer, 0, keepdims=False)
    ks = jax.lax.dynamic_index_in_dim(k_stage, layer, 0, keepdims=False)
    vs = jax.lax.dynamic_index_in_dim(v_stage, layer, 0, keepdims=False)
    STAGE = ks.shape[1]
    ks = ks.reshape(B, STAGE, Hkv, D)
    vs = vs.reshape(B, STAGE, Hkv, D)
    pe = jnp.asarray(bases, jnp.int32)
    sl = jnp.asarray(stage_lens, jnp.int32)
    # Per-row splice: position p in [base, base+len) takes ring row
    # (p - base); position base+len takes the current column.
    t_iota = jnp.arange(T, dtype=jnp.int32)[None, :]  # [1, T]
    rel = t_iota - pe[:, None]  # [B, T]
    in_ring = (rel >= 0) & (rel < sl[:, None])
    is_cur = rel == sl[:, None]
    ring_idx = jnp.clip(rel, 0, STAGE - 1)  # [B, T]
    ring_k = jnp.take_along_axis(
        ks, ring_idx[:, :, None, None].repeat(Hkv, 2).repeat(D, 3), axis=1
    ).transpose(0, 2, 3, 1)  # [B, Hkv, D, T]
    ring_v = jnp.take_along_axis(
        vs, ring_idx[:, :, None, None].repeat(Hkv, 2).repeat(D, 3), axis=1
    ).transpose(0, 2, 3, 1)
    m_ring = in_ring[:, None, None, :]
    m_cur = is_cur[:, None, None, :]
    kc = jnp.where(m_ring, ring_k.astype(kc.dtype), kc)
    vc = jnp.where(m_ring, ring_v.astype(vc.dtype), vc)
    kc = jnp.where(m_cur, k_cur.astype(kc.dtype), kc)
    vc = jnp.where(m_cur, v_cur.astype(vc.dtype), vc)
    scores = _grouped_scores(q, kc)  # [B,Hkv,G,1,T]
    valid = (
        t_iota[:, None, None, None, :]
        <= (pe + sl)[:, None, None, None, None]
    )
    scores = jnp.where(valid, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    return _apply_scores(probs, vc, q.dtype)


def decode_attention_pooled_staged_q_auto(
    q: jnp.ndarray,  # [B, 1, Hq, D]
    k_cache: jnp.ndarray,  # [L, B, Hkv, D, T] int8 flushed prefixes
    v_cache: jnp.ndarray,  # int8
    k_scale: jnp.ndarray,  # [L, B, Hkv, T] f32
    v_scale: jnp.ndarray,  # [L, B, Hkv, T] f32
    k_stage: jnp.ndarray,  # [L, B, STAGE, Hkv*D] per-row ring stages (exact)
    v_stage: jnp.ndarray,
    k_cur: jnp.ndarray,  # [B, Hkv, D, 1]
    v_cur: jnp.ndarray,
    bases: jnp.ndarray,  # [B] int32 per-row flushed watermark
    stage_lens: jnp.ndarray,  # [B] int32 valid ring rows (excl. cur)
    layer: jnp.ndarray,
) -> jnp.ndarray:
    """int8-KV pooled decode attention (ring mode): the per-row flushed
    prefix crosses HBM as int8 + per-(head, token) scales; ring window and
    current token stay exact. TPU: the quantized pooled-staged Pallas
    kernel; fallback: dequantize this layer's slab and reuse the bf16
    pooled-staged semantics."""
    B, S, Hq, D = q.shape
    L, _, Hkv, _, T = k_cache.shape
    ok = (
        _PALLAS_DECODE != "0"
        and S == 1
        and Hq % Hkv == 0
        and D % 8 == 0
        and _decode_block_ok(T)
        and (jax.default_backend() == "tpu" or _PALLAS_DECODE == "1")
    )
    if ok:
        from .pallas.decode_attention import (
            decode_attention_pallas_pooled_staged_q,
        )

        return decode_attention_pallas_pooled_staged_q(
            q, k_cache, v_cache, k_scale, v_scale, k_stage, v_stage,
            k_cur, v_cur, bases, stage_lens, layer, block=_PALLAS_BLOCK,
        )
    kc = jax.lax.dynamic_index_in_dim(k_cache, layer, 0, keepdims=True)
    vc = jax.lax.dynamic_index_in_dim(v_cache, layer, 0, keepdims=True)
    ks = jax.lax.dynamic_index_in_dim(k_scale, layer, 0, keepdims=True)
    vs = jax.lax.dynamic_index_in_dim(v_scale, layer, 0, keepdims=True)
    kc = (kc.astype(jnp.float32) * ks[:, :, :, None, :]).astype(q.dtype)
    vc = (vc.astype(jnp.float32) * vs[:, :, :, None, :]).astype(q.dtype)
    kst = jax.lax.dynamic_index_in_dim(k_stage, layer, 0, keepdims=True)
    vst = jax.lax.dynamic_index_in_dim(v_stage, layer, 0, keepdims=True)
    return decode_attention_pooled_staged_auto(
        q, kc, vc, kst, vst, k_cur, v_cur, bases, stage_lens, jnp.int32(0)
    )


def decode_attention_auto(
    q: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    seq_end: jnp.ndarray,
) -> jnp.ndarray:
    """Dispatch: Pallas flash-decode on TPU with aligned shapes (reads only
    the valid prefix), XLA reference otherwise. Same signature/semantics as
    :func:`decode_attention`."""
    if _pallas_decode_eligible(q, k_cache):
        from .pallas.decode_attention import decode_attention_pallas

        return decode_attention_pallas(
            q, k_cache, v_cache, seq_end, block=_PALLAS_BLOCK
        )
    return decode_attention(q, k_cache, v_cache, seq_end)
