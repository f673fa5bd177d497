"""Transformer backbone — TPU-native re-design of the reference backbone
(zonos/backbone/_torch.py:52-152).

Architecture (identical math, different engineering):

* pre-LN blocks: ``x += Attn(LN(x)); x += SwiGLU(LN(x))``; final LayerNorm.
* GQA attention with fused qkv projection (no bias), interleaved-pair RoPE,
  preallocated KV cache, causal prefill / full-prefix decode.

TPU-first choices:

* **Stacked layer weights + ``lax.scan``**: all blocks share shapes, so layer
  params are stored with a leading ``[n_layer]`` axis and the stack runs as a
  single scanned step — one compiled block body regardless of depth, fast
  compiles, and a natural home for per-layer KV caches (scan xs/ys).
* Params are functional pytrees (nested dicts); weights ``[in, out]`` so every
  projection is ``x @ W`` on the MXU. bf16 params/activations, fp32 softmax.
* No data-dependent Python control flow: prefill vs decode is a *static*
  choice on the chunk length.

The hybrid (Mamba) backbone lives in ``models/mamba_backbone.py``; both
register in ``BACKBONES`` mirroring the reference registry
(zonos/backbone/__init__.py:1-12).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import BackboneConfig
from ..ops.attention import (
    decode_attention_layered_auto,
    decode_attention_layered_q_auto,
    decode_attention_pooled_auto,
    decode_attention_pooled_staged_auto,
    decode_attention_pooled_staged_q_auto,
    prefill_attention_auto,
    update_kv_cache,
)
from ..ops.mlp import swiglu_mid
from ..ops.quant import proj_matmul
from ..ops.norms import layer_norm
from ..ops.rope import apply_rope, expand_rope_table, rope_table


def init_transformer_backbone(
    key: jax.Array, cfg: BackboneConfig, dtype=jnp.bfloat16
) -> dict:
    """Random-init params with the same tensor shapes the checkpoint loader
    fills (loader: utils/checkpoint.py). Leading axis of every layer tensor is
    ``n_layer`` (stacked for scan)."""
    L, D = cfg.n_layer, cfg.d_model
    Hq, Hkv, Dh = cfg.num_heads, cfg.num_heads_kv, cfg.head_dim
    F = cfg.attn_mlp_d_intermediate
    qkv_out = (Hq + 2 * Hkv) * Dh
    ks = jax.random.split(key, 4)

    def dense(k, shape, fan_in):
        return (jax.random.normal(k, shape, jnp.float32) / jnp.sqrt(fan_in)).astype(
            dtype
        )

    # Norm vectors are stored fp32: layer_norm computes in fp32 anyway, and
    # bf16 storage costs a per-layer slice+convert op in the decode loop
    # (~2 us/layer measured via xprof) for no memory win that matters.
    f32 = jnp.float32
    return {
        "layers": {
            "norm1": {"weight": jnp.ones((L, D), f32), "bias": jnp.zeros((L, D), f32)},
            "in_proj": {"weight": dense(ks[0], (L, D, qkv_out), D)},
            "out_proj": {"weight": dense(ks[1], (L, Hq * Dh, D), Hq * Dh)},
            "norm2": {"weight": jnp.ones((L, D), f32), "bias": jnp.zeros((L, D), f32)},
            "fc1": {"weight": dense(ks[2], (L, D, 2 * F), D)},
            "fc2": {"weight": dense(ks[3], (L, F, D), F)},
        },
        "norm_f": {"weight": jnp.ones((D,), dtype), "bias": jnp.zeros((D,), dtype)},
    }


# Decode-tail stage depth: fresh K/V columns land in a small TIME-MAJOR
# stage buffer (cheap aligned writes) and are spliced into the time-minor
# cache once per STAGE steps — the strided per-step column splice into
# ``[..., T]`` costs ~675 us x2 at batch 16 (tile read-modify-writes across
# every (layer, batch, head) regardless of T), the staged write ~2 us.
KV_STAGE = 128


def allocate_kv_cache(
    cfg: BackboneConfig, batch_size: int, max_seqlen: int, dtype=jnp.bfloat16,
    kv_int8: bool = False,
) -> dict:
    """Preallocated per-layer KV cache pytree: time-minor main slabs
    ``[L, B, Hkv, Dh, T]`` (lane-aligned for the Pallas decode kernel; the
    reference allocates ``[B, T, 2, Hkv, Dh]`` per layer, _torch.py:97)
    plus the time-major decode stage ``[L, B, KV_STAGE, Hkv, Dh]``.

    ``kv_int8`` (int8 phase 2): the main slabs store int8 with
    per-(layer, row, head, token) f32 scales — half the flushed-prefix HBM
    traffic. The stage stays in the activation dtype (the recent tail is
    exact); quantization happens at flush/prefill-splice time, amortized."""
    L = cfg.n_layer
    shape = (L, batch_size, cfg.num_heads_kv, cfg.head_dim, max_seqlen)
    # Clamp the stage depth to the cache length (tiny test configs) so a
    # full-stage flush is always a legal splice. The stage stores heads
    # FLATTENED ([..., Hkv*Dh]) — exactly the 2D view the Pallas kernel
    # reads, so no reshape (= no layout copy) sits between the buffer and
    # the kernel operand.
    stage = min(KV_STAGE, max_seqlen)
    sshape = (L, batch_size, stage, cfg.num_heads_kv * cfg.head_dim)
    out = {
        "k": jnp.zeros(shape, jnp.int8 if kv_int8 else dtype),
        "v": jnp.zeros(shape, jnp.int8 if kv_int8 else dtype),
        "k_stage": jnp.zeros(sshape, dtype),
        "v_stage": jnp.zeros(sshape, dtype),
    }
    if kv_int8:
        sc_shape = (L, batch_size, cfg.num_heads_kv, max_seqlen)
        out["k_scale"] = jnp.ones(sc_shape, jnp.float32)
        out["v_scale"] = jnp.ones(sc_shape, jnp.float32)
    return out


def flush_kv_stage(cache: dict, stage_base: jnp.ndarray) -> dict:
    """Splice the full stage (time-major ``[L, B, STAGE, Hkv*Dh]``) into the
    time-minor main cache at ``stage_base``. Called by the decode loop once
    per segment of up to STAGE steps (amortizing the strided time-minor
    write); slots beyond the filled prefix are stale but are either masked
    by readers or overwritten by the next flush before ever being attended.

    int8-KV caches quantize HERE — once per STAGE steps, never per step:
    per-(token, head) absmax over head_dim, int8 values + f32 scales."""
    zero = jnp.zeros((), jnp.int32)
    sb = jnp.asarray(stage_base, jnp.int32)
    idx = (zero, zero, zero, zero, sb)
    L, B, Hkv, Dh, _ = cache["k"].shape
    STAGE = cache["k_stage"].shape[2]

    def tm(stage):  # [L,B,STAGE,Hkv*Dh] -> [L,B,Hkv,Dh,STAGE]
        return stage.reshape(L, B, STAGE, Hkv, Dh).transpose(0, 1, 3, 4, 2)

    if "k_scale" in cache:
        from ..ops.quant import quantize_kv

        qk, sk = quantize_kv(tm(cache["k_stage"]), dh_axis=3)
        qv, sv = quantize_kv(tm(cache["v_stage"]), dh_axis=3)
        sidx = (zero, zero, zero, sb)
        return {
            **cache,
            "k": jax.lax.dynamic_update_slice(cache["k"], qk, idx),
            "v": jax.lax.dynamic_update_slice(cache["v"], qv, idx),
            "k_scale": jax.lax.dynamic_update_slice(cache["k_scale"], sk, sidx),
            "v_scale": jax.lax.dynamic_update_slice(cache["v_scale"], sv, sidx),
        }

    return {
        **cache,
        "k": jax.lax.dynamic_update_slice(cache["k"], tm(cache["k_stage"]), idx),
        "v": jax.lax.dynamic_update_slice(cache["v"], tm(cache["v_stage"]), idx),
    }


def _block(
    layer_params: dict,
    cfg: BackboneConfig,
    x: jnp.ndarray,
    attend,
    positions: jnp.ndarray,
    table: jnp.ndarray,
    capture_fc2: bool = False,
):
    """One transformer block; attention is delegated to ``attend(q, k, v)``
    which returns ``(y [B,S,Hq,Dh], k_col, v_col [B,Hkv,Dh,S])`` — the
    freshly produced cache COLUMNS (the caller owns the canonical cache
    write)."""
    B, S, D = x.shape
    Hq, Hkv, Dh = cfg.num_heads, cfg.num_heads_kv, cfg.head_dim

    pack = layer_params.get("norm_pack")
    if pack is not None:  # [4, D]: norm1 w/b, norm2 w/b (see _stack_forward)
        n1w, n1b, n2w, n2b = pack[0], pack[1], pack[2], pack[3]
    else:
        n1w, n1b = layer_params["norm1"]["weight"], layer_params["norm1"]["bias"]
        n2w, n2b = layer_params["norm2"]["weight"], layer_params["norm2"]["bias"]

    h = layer_norm(x, n1w, n1b, cfg.norm_epsilon)
    qkv = proj_matmul(h, layer_params["in_proj"])
    q, k, v = jnp.split(qkv, [Hq * Dh, (Hq + Hkv) * Dh], axis=-1)
    q = q.reshape(B, S, Hq, Dh)
    k = k.reshape(B, S, Hkv, Dh)
    v = v.reshape(B, S, Hkv, Dh)
    q = apply_rope(q, positions, table)
    k = apply_rope(k, positions, table)

    y, k_new, v_new = attend(q, k, v)
    y = proj_matmul(y.reshape(B, S, Hq * Dh), layer_params["out_proj"])
    x = x + y

    h = layer_norm(x, n2w, n2b, cfg.norm_epsilon)
    mid = swiglu_mid(h, layer_params["fc1"])  # fc2 input [B, S, F]
    x = x + proj_matmul(mid, layer_params["fc2"])
    if capture_fc2:
        # Quantization calibration (ops/quant.awq_fold): per-channel
        # energy of the fc2 input over this call's (B, S) positions.
        return x, k_new, v_new, jnp.sum(
            mid.astype(jnp.float32) ** 2, axis=(0, 1)
        )
    return x, k_new, v_new


def _stack_forward(
    layers: dict,
    norm_f: dict | None,
    cfg: BackboneConfig,
    hidden: jnp.ndarray,
    cache: dict,
    offset: jnp.ndarray,
    lengths_per_sample: jnp.ndarray,
    rope: jnp.ndarray | None = None,
    stage_base: jnp.ndarray | None = None,
    pooled: bool = False,
    pool_base: jnp.ndarray | None = None,
    capture_fc2: bool = False,
):
    """Layer-stack forward over ``layers`` (stacked ``[L, ...]`` params).

    Shared by :func:`transformer_forward` (full stack + final norm) and the
    pipeline-parallel stage runner (``parallel/pp_backbone.py``), which calls
    it on each pipe rank's CONTIGUOUS layer shard and applies ``norm_f`` only
    after the last stage. ``norm_f=None`` skips the final LayerNorm.

    Args:
      hidden: ``[B, S, D]`` (S static — full prefix for prefill, 1 for decode).
      cache: from :func:`allocate_kv_cache` (leading layer axis must match
        ``layers``).
      offset: scalar int32 write offset into the cache (``seqlen_offset``).
      lengths_per_sample: ``[B]`` int32 per-row RoPE base positions
        (reference _torch.py:74-75 semantics: ``positions = arange(S) + lps``).
      rope: optional precomputed :func:`rope_table` (built on the fly if None).
      stage_base: decode only — scalar int32 flushed-prefix length. When
        given, fresh columns go to the time-major stage (slot ``offset -
        stage_base``) and the CALLER owns flushing (:func:`flush_kv_stage`
        once per KV_STAGE steps). When None, columns splice straight into
        the time-minor cache (single-shot / compat path).
      pooled: continuous-batching decode — every row sits at its OWN cache
        position, given by ``lengths_per_sample`` (``offset`` is ignored);
        attention bounds and column writes are per-row.
      pool_base: pooled RING mode — ``[B]`` int32 per-row flushed
        watermarks. Fresh columns land in the row's time-major ring slot
        ``pos - base`` (cheap aligned write); attention covers flushed
        prefix + ring window + current token; the CALLER splices rings
        back once per segment (engine/pool.flush_pool_rings). Without it,
        pooled mode falls back to per-step per-row time-minor splices.

    Returns ``(hidden_out [B, S, D], new_cache)``.
    """
    B, S, _ = hidden.shape
    if rope is None:
        rope = rope_table(cfg.head_dim)
    if rope.ndim == 3 and rope.shape[-1] == 2:
        rope = expand_rope_table(rope)  # lane-native [P, 2, D] form, once
    positions = (
        jnp.arange(S, dtype=jnp.int32)[None, :]
        + lengths_per_sample.astype(jnp.int32)[:, None]
    )
    is_decode = S == 1

    # The KV caches stay OUT of the scan's xs/ys: threading `[L, ...]` caches
    # through scan forces XLA to (a) materialize per-layer slab reads/writes
    # and (b) copy the ENTIRE stacked ys cache into the enclosing while-loop
    # carry every decode step (~0.8 ms/step at cache len 2560, measured via
    # xprof — two 170 MB copies). Instead the scan closes over the caches
    # read-only, emits just the new columns as ys, and ONE small
    # dynamic_update_slice per step writes all layers' columns back — which
    # XLA performs in place on the while carry. On the decode path the
    # layer-indexed Pallas kernel reads the full stacked cache directly
    # (scalar-prefetched layer index), so not even a slab is materialized.
    # Fresh columns are produced in the ACTIVATION dtype: for int8-KV
    # caches that is the stage dtype (quantization happens at flush time).
    kv_int8 = "k_scale" in cache
    cdtype = cache["k_stage"].dtype if "k_stage" in cache else cache["k"].dtype
    L, B_c, Hkv_c, Dh_c = cache["k"].shape[:4]

    ring = pooled and is_decode and pool_base is not None and "k_stage" in cache
    if is_decode and pooled:
        row_pos = lengths_per_sample.astype(jnp.int32)  # [B] abs positions
        if ring:
            ring_base = jnp.asarray(pool_base, jnp.int32)
            ring_len = row_pos - ring_base  # [B] valid ring rows (excl. cur)
    elif is_decode:
        if stage_base is None:
            # Compat/single-shot path: attend with an empty dummy stage and
            # splice the column straight into the time-minor cache below.
            flushed_end = jnp.asarray(offset, jnp.int32)
            stage_len = jnp.zeros((), jnp.int32)
            k_stage = cache.get("k_stage")
            v_stage = cache.get("v_stage")
            if k_stage is None:
                k_stage = jnp.zeros((L, B_c, 8, Hkv_c * Dh_c), cdtype)
                v_stage = k_stage
        else:
            flushed_end = jnp.asarray(stage_base, jnp.int32)
            stage_len = jnp.asarray(offset, jnp.int32) - flushed_end
            k_stage = cache["k_stage"]
            v_stage = cache["v_stage"]

    def scan_body(carry, layer_params):
        h, l = carry
        if is_decode and pooled and ring and kv_int8:
            def attend(q, k, v):
                k_col = k.astype(cdtype).transpose(0, 2, 3, 1)
                v_col = v.astype(cdtype).transpose(0, 2, 3, 1)
                y = decode_attention_pooled_staged_q_auto(
                    q, cache["k"], cache["v"], cache["k_scale"],
                    cache["v_scale"], cache["k_stage"], cache["v_stage"],
                    k_col, v_col, ring_base, ring_len, l,
                )
                return y, k_col, v_col
        elif is_decode and pooled and ring:
            def attend(q, k, v):
                k_col = k.astype(cdtype).transpose(0, 2, 3, 1)
                v_col = v.astype(cdtype).transpose(0, 2, 3, 1)
                y = decode_attention_pooled_staged_auto(
                    q, cache["k"], cache["v"], cache["k_stage"],
                    cache["v_stage"], k_col, v_col, ring_base, ring_len, l,
                )
                return y, k_col, v_col
        elif is_decode and pooled:
            def attend(q, k, v):
                k_col = k.astype(cdtype).transpose(0, 2, 3, 1)
                v_col = v.astype(cdtype).transpose(0, 2, 3, 1)
                y = decode_attention_pooled_auto(
                    q, cache["k"], cache["v"], k_col, v_col, row_pos, l
                )
                return y, k_col, v_col
        elif is_decode and kv_int8:
            def attend(q, k, v):
                k_col = k.astype(cdtype).transpose(0, 2, 3, 1)
                v_col = v.astype(cdtype).transpose(0, 2, 3, 1)
                y = decode_attention_layered_q_auto(
                    q, cache["k"], cache["v"], cache["k_scale"],
                    cache["v_scale"], k_stage, v_stage,
                    k_col, v_col, flushed_end, stage_len, l,
                )
                return y, k_col, v_col
        elif is_decode:
            def attend(q, k, v):
                k_col = k.astype(cdtype).transpose(0, 2, 3, 1)
                v_col = v.astype(cdtype).transpose(0, 2, 3, 1)
                y = decode_attention_layered_auto(
                    q, cache["k"], cache["v"], k_stage, v_stage,
                    k_col, v_col, flushed_end, stage_len, l,
                )
                return y, k_col, v_col
        else:
            def attend(q, k, v):
                kc = jax.lax.dynamic_index_in_dim(cache["k"], l, 0, keepdims=False)
                vc = jax.lax.dynamic_index_in_dim(cache["v"], l, 0, keepdims=False)
                if kv_int8:
                    # Dequantize this layer's slab for the prefill read
                    # (prefill runs once; the chunk itself is written below
                    # in exact dtype before attending).
                    ks = jax.lax.dynamic_index_in_dim(
                        cache["k_scale"], l, 0, keepdims=False
                    )
                    vs = jax.lax.dynamic_index_in_dim(
                        cache["v_scale"], l, 0, keepdims=False
                    )
                    kc = (kc.astype(jnp.float32) * ks[:, :, None, :]).astype(cdtype)
                    vc = (vc.astype(jnp.float32) * vs[:, :, None, :]).astype(cdtype)
                kc, vc = update_kv_cache(kc, vc, k, v, offset)
                y = prefill_attention_auto(q, kc, vc, offset, k.shape[1])
                k_col = k.astype(cdtype).transpose(0, 2, 3, 1)
                v_col = v.astype(cdtype).transpose(0, 2, 3, 1)
                return y, k_col, v_col

        if capture_fc2:
            h, k_new, v_new, fc2_e = _block(
                layer_params, cfg, h, attend, positions, rope,
                capture_fc2=True,
            )
            return (h, l + 1), (k_new, v_new, fc2_e)
        h, k_new, v_new = _block(layer_params, cfg, h, attend, positions, rope)
        if is_decode:
            # Emit decode ys FLAT [B, Hkv*Dh]: a [B, Hkv, Dh, 1] column's
            # minor dim 1 pads to a full 128-lane tile, so stacking it into
            # [L, B, Hkv, Dh, 1] ys makes every per-layer write (and the
            # post-scan flatten) a padded-tile relayout — measured as the
            # per-step reshape/copy tail in docs/KERNELS.md. The merge
            # itself moves only size-1 axes (free).
            k_new = k_new.reshape(B, -1)
            v_new = v_new.reshape(B, -1)
        return (h, l + 1), (k_new, v_new)

    # Pack the four per-layer norm vectors into ONE [L, 4, D] xs leaf: as
    # separate [L, D] leaves each costs a standalone dynamic-slice op in the
    # decode loop (4 x ~0.5 us/layer measured via xprof); packed, it's one
    # slice and the row reads are static. The stack runs once per call,
    # outside the scan.
    layers_xs = {k: v for k, v in layers.items() if k not in ("norm1", "norm2")}
    layers_xs["norm_pack"] = jnp.stack(
        [
            layers["norm1"]["weight"], layers["norm1"]["bias"],
            layers["norm2"]["weight"], layers["norm2"]["bias"],
        ],
        axis=1,
    )
    fc2_energy = None
    if capture_fc2:
        (hidden, _), (k_cols, v_cols, fc2_energy) = jax.lax.scan(
            scan_body, (hidden, jnp.int32(0)), layers_xs
        )  # fc2_energy: [L, F] summed squares over this call's positions
    else:
        (hidden, _), (k_cols, v_cols) = jax.lax.scan(
            scan_body, (hidden, jnp.int32(0)), layers_xs
        )
    # k_cols/v_cols: decode [L, B, Hkv*Dh] (flat columns, see scan_body);
    # prefill [L, B, Hkv, Dh, S].
    zero = jnp.zeros((), jnp.int32)
    new_cache = dict(cache)
    if is_decode and pooled and ring:
        # RING mode: fresh columns land in each row's time-major ring slot
        # (pos - base) — full (Hkv, Dh) planes, tile-aligned and cheap; the
        # strided time-minor splice happens ONCE per scheduler segment
        # (engine/pool.flush_pool_rings), closing the ~1.4 ms/step per-row
        # splice headroom recorded in docs/KERNELS.md.
        from ..ops.pallas.stage_write import stage_splice_rows_auto

        cols_k = k_cols[:, :, None, :]
        cols_v = v_cols[:, :, None, :]
        new_cache["k_stage"] = stage_splice_rows_auto(
            cache["k_stage"], cols_k, ring_len
        )
        new_cache["v_stage"] = stage_splice_rows_auto(
            cache["v_stage"], cols_v, ring_len
        )
    elif is_decode and pooled:
        # Per-row column splice at each row's own position. B is small and
        # static, so an unrolled per-row dynamic_update_slice beats a
        # full-cache one-hot traversal. NOTE: this is the strided
        # time-minor write the staged design exists to amortize
        # (CLAUDE.md); used only for caches without a stage (hybrid attn
        # layers) — the transformer pool runs RING mode above.
        k_cols = k_cols.reshape(k_cols.shape[0], B_c, Hkv_c, Dh_c)[..., None]
        v_cols = v_cols.reshape(v_cols.shape[0], B_c, Hkv_c, Dh_c)[..., None]
        nk, nv = cache["k"], cache["v"]
        for b in range(B_c):
            bidx = jnp.int32(b)
            pos = row_pos[b]
            nk = jax.lax.dynamic_update_slice(
                nk, k_cols[:, b : b + 1], (zero, bidx, zero, zero, pos)
            )
            nv = jax.lax.dynamic_update_slice(
                nv, v_cols[:, b : b + 1], (zero, bidx, zero, zero, pos)
            )
        new_cache["k"], new_cache["v"] = nk, nv
    elif is_decode and stage_base is not None:
        # Staged decode: the fresh columns land in the TIME-MAJOR stage at
        # slot (offset - stage_base) — full (Hkv, Dh) planes, so the write
        # is tile-aligned and cheap; the caller flushes once per KV_STAGE
        # steps (flush_kv_stage).
        from ..ops.pallas.stage_write import stage_splice_auto

        cols_k = k_cols[:, :, None, :]
        cols_v = v_cols[:, :, None, :]
        new_cache["k_stage"] = stage_splice_auto(
            cache["k_stage"], cols_k, stage_len
        )
        new_cache["v_stage"] = stage_splice_auto(
            cache["v_stage"], cols_v, stage_len
        )
    else:
        # Prefill (or compat decode): splice at time offset across layers.
        if is_decode:  # compat path emitted flat columns — restore 5-D
            k_cols = k_cols.reshape(L, B_c, Hkv_c, Dh_c)[..., None]
            v_cols = v_cols.reshape(L, B_c, Hkv_c, Dh_c)[..., None]
        idx = (zero, zero, zero, zero, jnp.asarray(offset, jnp.int32))
        if kv_int8:
            from ..ops.quant import quantize_kv

            qk, sk = quantize_kv(k_cols, dh_axis=3)  # [L,B,Hkv,Dh,S]
            qv, sv = quantize_kv(v_cols, dh_axis=3)
            sidx = (zero, zero, zero, jnp.asarray(offset, jnp.int32))
            new_cache["k"] = jax.lax.dynamic_update_slice(cache["k"], qk, idx)
            new_cache["v"] = jax.lax.dynamic_update_slice(cache["v"], qv, idx)
            new_cache["k_scale"] = jax.lax.dynamic_update_slice(
                cache["k_scale"], sk, sidx
            )
            new_cache["v_scale"] = jax.lax.dynamic_update_slice(
                cache["v_scale"], sv, sidx
            )
        else:
            new_cache["k"] = jax.lax.dynamic_update_slice(cache["k"], k_cols, idx)
            new_cache["v"] = jax.lax.dynamic_update_slice(cache["v"], v_cols, idx)
    if norm_f is not None:
        hidden = layer_norm(
            hidden, norm_f["weight"], norm_f["bias"], cfg.norm_epsilon
        )
    if capture_fc2:
        return hidden, new_cache, fc2_energy
    return hidden, new_cache


def transformer_forward(
    params: dict,
    cfg: BackboneConfig,
    hidden: jnp.ndarray,
    cache: dict,
    offset: jnp.ndarray,
    lengths_per_sample: jnp.ndarray,
    rope: jnp.ndarray | None = None,
    stage_base: jnp.ndarray | None = None,
    pooled: bool = False,
    pool_base: jnp.ndarray | None = None,
    capture_fc2: bool = False,
):
    """Full layer stack + final LayerNorm (see :func:`_stack_forward`)."""
    return _stack_forward(
        params["layers"], params["norm_f"], cfg, hidden, cache, offset,
        lengths_per_sample, rope, stage_base=stage_base, pooled=pooled,
        pool_base=pool_base, capture_fc2=capture_fc2,
    )


class TransformerBackbone:
    """Class wrapper over the functional transformer stack — uniform
    interface with :class:`..models.mamba_backbone.HybridBackbone`
    (mirrors the reference registry contract, backbone/__init__.py:1-12)."""

    supported_architectures = ["transformer"]

    def __init__(self, cfg: BackboneConfig):
        assert not cfg.is_hybrid, "transformer backbone requires empty ssm_cfg"
        self.cfg = cfg

    def init(self, key, dtype=jnp.bfloat16) -> dict:
        return init_transformer_backbone(key, self.cfg, dtype)

    def allocate_cache(self, batch: int, max_seqlen: int, dtype=jnp.bfloat16,
                       kv_int8: bool = False):
        return allocate_kv_cache(self.cfg, batch, max_seqlen, dtype,
                                 kv_int8=kv_int8)

    def forward(self, params, hidden, cache, offset, lengths, rope=None,
                stage_base=None, pooled=False, pool_base=None,
                capture_fc2=False):
        return transformer_forward(
            params, self.cfg, hidden, cache, offset, lengths, rope,
            stage_base=stage_base, pooled=pooled, pool_base=pool_base,
            capture_fc2=capture_fc2,
        )
