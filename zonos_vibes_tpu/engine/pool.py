"""Continuous-batching decode pool.

The reference serves one request at a time to completion (server.py:59-91);
our group batching shares one decode across SIMULTANEOUS compatible
arrivals, and the segment scheduler interleaves jobs so nothing
head-of-line blocks — but interleaved jobs still each pay the full
per-step weight read (~3.2 GB at flagship scale). This module adds the
missing piece for STAGGERED load: a fixed-slot decode pool where every
active request is one batch row of a single compiled step, so weight
reads amortize across requests that arrived at different times
(vLLM-style continuous batching, re-derived TPU-first: static shapes,
per-row cache positions via the pooled Pallas kernel, masked row
bookkeeping — no dynamic batch reshapes, no recompiles on join/leave).

Row lifecycle:
  join   — the request is prefilled SOLO (batch 1, its own compiled
           cond-bucket program, writing a small [L, 2, ...] cache), then
           its cache rows / delayed codes / counters are spliced into a
           free slot (cond row ``s``, CFG uncond row ``slots + s``);
  step   — one pooled decode step advances every ACTIVE row: per-row
           positions drive RoPE, attention bounds, cache column writes,
           delayed-buffer reads/writes, and per-row PRNG
           (``fold_in(fold_in(base, row_seed), row_step)`` — a row's
           sample stream depends only on its own seed and step, so its
           codes are INDEPENDENT of what else shares the pool);
  leave  — when a row's EOS cascade completes, extract + revert its codes
           and mark the slot free; the stale cache rows are simply
           overwritten by the next join.

Greedy decoding of a pooled row matches `DecodeEngine.generate` exactly
(same math, same EOS cascade); sampled rows are deterministic in
(row_seed, join-time state) and isolated from pool neighbors
(tests/test_pool.py).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..config import ZonosConfig
from ..models.zonos import ZonosModel
from ..ops.attention import NEG_INF
from ..ops.delay_pattern import revert_delay_pattern
from ..ops.rope import expand_rope_table, rope_table
from ..ops.sampling import (
    SamplingParams,
    knobs_from_params,
    sample_from_logits_dyn,
)
from .generate import _find_multiple, _masked_scatter_frame, prefill_dyn_jit


@dataclass(frozen=True)
class PoolConfig:
    slots: int = 4
    max_cond_len: int = 512
    max_new_tokens: int = 86 * 30  # per request ceiling (30 s)
    # Static width of the repetition-penalty window buffer the pooled step
    # compiles with; rows use any DYNAMIC window <= this (the dyn sampler
    # masks older columns out of the counts — ops/sampling.py).
    max_rep_window: int = 8


def _pool_cache_len(model: ZonosModel, pc: PoolConfig) -> int:
    # +KV_STAGE margin: the per-segment ring flush splices a FULL stage
    # window at each row's watermark; the margin guarantees the splice never
    # clamps back onto valid positions near the cache end.
    from ..models.backbone import KV_STAGE

    seq = (pc.max_cond_len + pc.max_new_tokens + model.config.num_codebooks
           + KV_STAGE)
    return _find_multiple(seq, 512 if seq >= 1024 else 8)


def make_pool(model: ZonosModel, pc: PoolConfig, dtype=jnp.bfloat16,
              kv_int8: bool = False, state_bf16: bool = False) -> dict:
    """All-slots-free pool state. Pooled decode runs RING mode for BOTH
    backbones — each row's fresh attention columns land in its ring slot
    (pos - flush_base) and the strided time-minor splice happens once per
    segment (:func:`flush_pool_rings`). Transformer caches keep their
    time-major stage; hybrid caches get per-attn-layer ring stages
    (``pool_ring`` allocation). Mamba conv/SSM state is per-row recurrent
    state with no position, so it needs no ring at all.

    ``kv_int8``: the flushed prefixes store int8 + per-(head, token) f32
    scales (transformer caches only) — at pool scale the KV read is
    ~100 KB/token/request and rivals the int8 weight read late in
    generation; the ring window and current column stay exact, and
    quantization rides the once-per-segment flush.

    ``state_bf16`` (hybrid caches only): store Mamba SSM state bf16
    (recurrence still computes fp32) — at 16 pooled rows the fp32 state
    read+write is ~4.4 ms/step, the dominant term of the hybrid pooled
    step (docs/KERNELS.md); bf16 storage halves it. Opt-in because it is
    a lossy state representation (documented tolerance in tests)."""
    K = model.config.num_codebooks
    T = _pool_cache_len(model, pc)
    cache = model.allocate_cache(2 * pc.slots, T, dtype, kv_int8=kv_int8,
                                 state_bf16=state_bf16, pool_ring=True)
    if "k" in cache:
        keys = ("k", "v", "k_stage", "v_stage") + (
            ("k_scale", "v_scale") if kv_int8 else ()
        )
        cache = {k: cache[k] for k in keys}
    lbuf = pc.max_new_tokens + K
    S = pc.slots
    # Per-row RUNTIME sampling/cfg knobs (ops/sampling.KNOB_FIELDS): rows
    # with different sampling configs share the one compiled step — the
    # dyn sampler is where-gated to bit-exact parity with the static
    # pipeline, so any knob combination still matches its solo generate.
    default_knobs = knobs_from_params(SamplingParams(), 2.0)
    knobs = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (S,)), default_knobs
    )
    return {
        "cache": cache,
        "delayed": jnp.zeros((S, K, lbuf), jnp.int32),
        "pos": jnp.zeros((S,), jnp.int32),       # absolute cache position
        "step": jnp.zeros((S,), jnp.int32),      # delayed-buffer offset
        "active": jnp.zeros((S,), bool),
        "remaining": jnp.zeros((S,), jnp.int32),
        "stopping": jnp.zeros((S,), bool),
        "stop_offset": jnp.full((S,), -1, jnp.int32),
        "row_seed": jnp.zeros((S,), jnp.uint32),
        # Ring mode: per-slot flushed watermark (ring covers [base, pos)).
        "flush_base": jnp.zeros((S,), jnp.int32),
        "knobs": knobs,
    }


def _pool_ring_mode(cache: dict) -> bool:
    """True when the pool cache carries ring stages (transformer: the flat
    cache's stage; hybrid: per-attn-layer stages from ``pool_ring``)."""
    if "k_stage" in cache:
        return True
    attn = cache.get("attn")
    return bool(attn) and all("k_stage" in kv for kv in attn.values())


def _ring_stage_depth(cache: dict) -> int:
    if "k_stage" in cache:
        return cache["k_stage"].shape[2]
    return next(iter(cache["attn"].values()))["k_stage"].shape[1]


def prefill_request(
    model: ZonosModel,
    params: dict,
    prefix_conditioning: jnp.ndarray,  # [2, Lc, D] (cond ‖ uncond)
    key: jax.Array,
    max_new_tokens: int,
    cfg_scale: float,
    sampling: SamplingParams,
    kv_int8: bool = False,
    state_bf16: bool = False,
    audio_prefix_codes: jnp.ndarray | None = None,  # [1, K, Lp] int32
) -> dict:
    """Solo prefill for a joining request (its own compiled cond-bucket
    program); returns ``(request state, knobs)`` to splice via :func:`join`.
    ``kv_int8``/``state_bf16`` must match the pool's (the spliced cache
    layouts agree). Sampling/cfg ride as TRACED knobs (prefill_dyn_jit) —
    a new knob combination never triggers a prefill recompile.
    ``audio_prefix_codes``: optional audio-prefix continuation — the row
    joins at position ``cond_len + Lp + 1`` (compiled per prefix-length
    bucket, as the solo path is)."""
    K = model.config.num_codebooks
    prefix = (
        audio_prefix_codes if audio_prefix_codes is not None
        else jnp.zeros((1, K, 0), jnp.int32)
    )
    knobs = knobs_from_params(sampling, float(cfg_scale))
    state = prefill_dyn_jit(
        model, params, prefix_conditioning, prefix, key,
        int(prefix.shape[-1]), int(max_new_tokens), knobs, kv_int8,
        state_bf16,
    )
    return state, knobs


def _splice_cache_rows(pool_cache: dict, req_cache: dict, slot: int,
                       n_slots: int) -> dict:
    """Copy the request's (cond, uncond) cache rows into pool rows
    ``(slot, n_slots + slot)``. The request cache may be shorter in T (its
    own cond bucket) — trailing positions are written later by pooled steps.
    Handles both cache layouts: transformer ``{k, v}`` [L, B, Hkv, Dh, T]
    (batch dim 1) and hybrid ``{attn, runs, solo}`` (batch dim 0 for attn KV
    and solo states, dim 1 for run-stacked states)."""
    pairs = ((slot, 0), (n_slots + slot, 1))

    def row_splice(dst_leaf, src_leaf, bdim):
        out = dst_leaf
        for dst, src in pairs:
            row = jax.lax.dynamic_slice_in_dim(src_leaf, src, 1, axis=bdim)
            start = [jnp.int32(0)] * dst_leaf.ndim
            start[bdim] = jnp.int32(dst)
            out = jax.lax.dynamic_update_slice(out, row, tuple(start))
        return out

    if "k" in pool_cache:
        # Stage buffers are NOT spliced: a freshly prefilled request has an
        # empty ring (its prefix went through the direct prefill splice)
        # and join resets the slot's watermark to pos. int8-KV pools also
        # splice the per-(head, token) scale rows ([L, B, Hkv, T], batch
        # dim 1) — the solo prefill quantized its prefix at splice time.
        keys = ("k", "v") + (
            ("k_scale", "v_scale") if "k_scale" in pool_cache else ()
        )
        return {
            **pool_cache,
            **{kk: row_splice(pool_cache[kk], req_cache[kk], 1)
               for kk in keys},
        }
    return {
        # Hybrid attn entries may carry ring stages (k_stage/v_stage) —
        # NOT spliced (join resets the row's watermark to pos), preserved.
        "attn": {
            name: {
                **kv,
                **{kk: row_splice(kv[kk], req_cache["attn"][name][kk], 0)
                   for kk in ("k", "v")},
            }
            for name, kv in pool_cache["attn"].items()
        },
        "runs": [
            {
                kk: row_splice(run[kk], req_run[kk], 1)
                for kk in ("conv", "ssm")
            }
            for run, req_run in zip(pool_cache["runs"], req_cache["runs"])
        ],
        "solo": {
            name: {
                kk: row_splice(st[kk], req_cache["solo"][name][kk], 0)
                for kk in ("conv", "ssm")
            }
            for name, st in pool_cache["solo"].items()
        },
    }


@jax.jit
def join(pool: dict, req_state: dict, slot: int, cond_len, row_seed,
         knobs: dict | None = None) -> dict:
    """Splice a prefilled request into ``slot`` (cond row ``slot``, uncond
    row ``slots + slot``). ``knobs``: the row's runtime sampling/cfg knobs
    (from :func:`prefill_request`); traced values, so distinct knob
    combinations reuse this one compiled join. ``slot`` is traced too —
    ONE compiled join serves every slot (a static slot cost one
    compile per slot over the remote-TPU tunnel at first use, the
    dominant term in the round-3 pooled-TTFA regression)."""
    slot = jnp.asarray(slot, jnp.int32)
    S = pool["active"].shape[0]
    zero = jnp.zeros((), jnp.int32)
    cache = _splice_cache_rows(pool["cache"], req_state["cache"], slot, S)
    delayed = jax.lax.dynamic_update_slice(
        pool["delayed"], req_state["delayed"],
        (jnp.int32(slot), zero, zero),
    )
    upd = lambda arr, v: arr.at[slot].set(v)
    new_knobs = pool["knobs"]
    if knobs is not None:
        new_knobs = jax.tree.map(
            lambda rows, v: rows.at[slot].set(v), new_knobs, knobs
        )
    return {
        "cache": cache,
        "delayed": delayed,
        "pos": upd(pool["pos"], jnp.asarray(cond_len, jnp.int32)
                   + req_state["offset"]),
        # Engine body semantics (generate.py): reads delayed[offset],
        # writes offset+1 — the pool's ``step`` is the NEXT write column.
        "step": upd(pool["step"], req_state["offset"] + 1),
        "active": upd(pool["active"], True),
        "remaining": upd(pool["remaining"], req_state["remaining"][0]),
        "stopping": upd(pool["stopping"], req_state["stopping"][0]),
        "stop_offset": upd(pool["stop_offset"], req_state["stop_offset"][0]),
        "row_seed": upd(pool["row_seed"], jnp.asarray(row_seed, jnp.uint32)),
        # Fresh ring: nothing of this row is staged yet.
        "flush_base": upd(pool["flush_base"],
                          jnp.asarray(cond_len, jnp.int32)
                          + req_state["offset"]),
        "knobs": new_knobs,
    }


def _pool_body(model: ZonosModel, params: dict, pool: dict, base_key,
               wmax: int, sorted_sampler: bool, rope):
    cfg: ZonosConfig = model.config
    K = cfg.num_codebooks
    S = pool["active"].shape[0]
    eos, mask_tok = cfg.eos_token_id, cfg.masked_token_id
    active = pool["active"] & (pool["remaining"] > 0)

    # Per-row previous frame: delayed[s, :, step_s - 1].
    idx = jnp.maximum(pool["step"] - 1, 0)[:, None, None]
    frame_in = jnp.take_along_axis(pool["delayed"], idx, axis=2)  # [S,K,1]
    emb = model.embed_codes(params, frame_in)
    emb = jnp.concatenate([emb, emb], axis=0)  # CFG rows [cond..., uncond...]
    lengths = jnp.concatenate([pool["pos"], pool["pos"]])  # [2S] per-row
    kw = {}
    if _pool_ring_mode(pool["cache"]):  # ring mode (transformer or hybrid)
        kw["pool_base"] = jnp.concatenate(
            [pool["flush_base"], pool["flush_base"]]
        )
    logits, cache = model.compute_logits(
        params, emb, pool["cache"], jnp.int32(0), lengths,
        pool["knobs"]["cfg_scale"], rope, pooled=True, **kw,
    )

    head_v = model.head_out_dim
    bias = jnp.zeros((S, K, head_v), jnp.float32).at[:, 1:, eos].set(NEG_INF)
    logits = logits + bias

    # Per-row repetition window (static wmax buffer, dynamic per-row window
    # inside the dyn sampler) + per-row PRNG: a row's stream depends only
    # on (row_seed, row_step, its own knobs) — invariant to pool
    # composition.
    widx = (pool["step"][:, None] - wmax + jnp.arange(wmax)[None, :])
    widx = jnp.maximum(widx, 0)[:, None, :].repeat(K, axis=1)
    gen_window = jnp.take_along_axis(pool["delayed"], widx, axis=2)

    def sample_row(seed, step, lg, gw, kn):
        k = jax.random.fold_in(jax.random.fold_in(base_key, seed), step)
        return sample_from_logits_dyn(
            k, lg[None], kn, gw[None], sorted_stages=sorted_sampler
        )[0]

    next_token = jax.vmap(sample_row)(
        pool["row_seed"], pool["step"], logits, gen_window, pool["knobs"]
    )  # [S, K]

    # EOS cascade (reference model.py:283-294 semantics, vectorized).
    eos_in_cb0 = next_token[:, 0] == eos
    remaining = jnp.where(
        eos_in_cb0 & active, jnp.minimum(pool["remaining"], 9),
        pool["remaining"],
    )
    stop_offset = jnp.where(
        eos_in_cb0 & ~pool["stopping"] & active, pool["step"],
        pool["stop_offset"],
    )
    stopping = pool["stopping"] | (eos_in_cb0 & active)
    eos_idx = jnp.clip(9 - remaining, 0, K - 1)
    cb = jnp.arange(K, dtype=jnp.int32)[None, :]
    cascade = jnp.where(
        cb < eos_idx[:, None], mask_tok,
        jnp.where(cb == eos_idx[:, None], eos, next_token),
    )
    next_token = jnp.where(stopping[:, None], cascade, next_token)

    # Write the frame at each row's delayed column (masked_scatter
    # semantics for UNKNOWN slots, engine._masked_scatter_frame).
    cur = jnp.take_along_axis(
        pool["delayed"], pool["step"][:, None, None].repeat(K, axis=1), axis=2
    )[..., 0]
    frame = _masked_scatter_frame(cur, next_token)
    col = jnp.arange(pool["delayed"].shape[-1], dtype=jnp.int32)[None, None, :]
    write = (col == pool["step"][:, None, None]) & active[:, None, None]
    delayed = jnp.where(write, frame[..., None], pool["delayed"])

    adv = active.astype(jnp.int32)
    return {
        "cache": cache,
        "delayed": delayed,
        "pos": pool["pos"] + adv,
        "step": pool["step"] + adv,
        "active": pool["active"],
        "remaining": jnp.where(active, remaining - 1, pool["remaining"]),
        "stopping": jnp.where(active, stopping, pool["stopping"]),
        "stop_offset": jnp.where(active, stop_offset, pool["stop_offset"]),
        "row_seed": pool["row_seed"],
        "flush_base": pool["flush_base"],
        "knobs": pool["knobs"],
    }


@functools.partial(
    jax.jit,
    static_argnames=("model", "n_steps", "wmax", "sorted_sampler"),
    donate_argnames=("pool",),
)
def pool_steps_jit(
    model: ZonosModel,
    params: dict,
    pool: dict,
    base_key: jax.Array,
    n_steps: int,
    wmax: int = PoolConfig.max_rep_window,
    sorted_sampler: bool = True,
) -> dict:
    """Advance every active row by up to ``n_steps`` pooled decode steps
    (early exit when nothing is running). Sampling/cfg knobs are per-row
    RUNTIME values (``pool["knobs"]``) — one compiled step serves any mix
    of request configs; the static sampling bounds are ``wmax`` (the
    repetition-window buffer width) and ``sorted_sampler`` (False compiles
    OUT the sort-bearing top-p/top-k stages — XLA:TPU sorts cost ~2 ms per
    8-slot step — legal only while every row has top_p == top_k == 0; the
    scheduler picks per segment, each variant compiles once). Ring mode:
    columns land in per-row ring slots during the loop, and ONE structural
    flush at the end splices every row's window back into the time-minor
    cache (the per-step strided splice this replaces cost ~1.4 ms/step at
    16 rows). ``n_steps`` must not exceed the ring depth."""
    rope = expand_rope_table(rope_table(model.config.backbone.head_dim))
    ring = _pool_ring_mode(pool["cache"])
    if ring:
        stage_depth = _ring_stage_depth(pool["cache"])
        assert n_steps <= stage_depth, (
            f"segment of {n_steps} steps overflows the {stage_depth}-deep "
            f"ring stage"
        )

    def cond_fn(carry):
        i, p = carry
        running = p["active"] & (p["remaining"] > 0)
        return (i < n_steps) & jnp.any(running)

    def body_fn(carry):
        i, p = carry
        p = _pool_body(model, params, p, base_key, wmax, sorted_sampler, rope)
        return i + 1, p

    _, pool = jax.lax.while_loop(cond_fn, body_fn, (jnp.int32(0), pool))
    if ring:
        pool = flush_pool_rings(pool)
    return pool


def flush_pool_rings(pool: dict) -> dict:
    """Splice every row's ring window ``[base, base + STAGE)`` into the
    time-minor cache and advance the watermark to ``pos``. Runs ONCE per
    segment, outside the stepping loop (a per-step lax.cond flush executes
    both branches — CLAUDE.md). Slots beyond a row's ``pos`` carry stale
    ring rows, but those positions are past the attention bound and the
    NEXT segment's flush (whose window starts at the new base == pos)
    overwrites them before they are ever valid."""
    cache = pool["cache"]
    base2 = jnp.concatenate([pool["flush_base"], pool["flush_base"]])
    zero0 = jnp.zeros((), jnp.int32)
    if "attn" in cache:
        # Hybrid pool: per-attn-layer ring stages [B2, STAGE, Hkv*Dh] ->
        # per-row time-minor splices, once per segment.
        new_attn = {}
        for name, kv in cache["attn"].items():
            B2, Hkv, Dh, _ = kv["k"].shape
            STAGE = kv["k_stage"].shape[1]

            def tm1(stage):  # [B,STAGE,Hkv*Dh] -> [B,Hkv,Dh,STAGE]
                return stage.reshape(B2, STAGE, Hkv, Dh).transpose(0, 2, 3, 1)

            ks, vs = tm1(kv["k_stage"]), tm1(kv["v_stage"])
            nk, nv = kv["k"], kv["v"]
            for r in range(B2):
                idx = (jnp.int32(r), zero0, zero0, base2[r])
                nk = jax.lax.dynamic_update_slice(nk, ks[r : r + 1], idx)
                nv = jax.lax.dynamic_update_slice(nv, vs[r : r + 1], idx)
            new_attn[name] = {**kv, "k": nk, "v": nv}
        return {
            **pool,
            "cache": {**cache, "attn": new_attn},
            "flush_base": pool["pos"],
        }

    L, B2, Hkv, Dh, _ = cache["k"].shape
    STAGE = cache["k_stage"].shape[2]

    def tm(stage):  # [L,B,STAGE,Hkv*Dh] -> [L,B,Hkv,Dh,STAGE]
        return stage.reshape(L, B2, STAGE, Hkv, Dh).transpose(0, 1, 3, 4, 2)

    ks, vs = tm(cache["k_stage"]), tm(cache["v_stage"])
    zero = jnp.zeros((), jnp.int32)
    if "k_scale" in cache:
        # int8-KV pool: quantization rides the flush (per-(head, token)
        # absmax over head_dim — a token's quantized value is independent
        # of WHEN it flushes, so pooled codes match the solo kv_int8
        # engine whenever flush boundaries align).
        from ..ops.quant import quantize_kv

        qk, sk = quantize_kv(ks, dh_axis=3)  # [L,B2,Hkv,Dh,STAGE] / scales
        qv, sv = quantize_kv(vs, dh_axis=3)
        nk, nv = cache["k"], cache["v"]
        nks, nvs = cache["k_scale"], cache["v_scale"]
        for r in range(B2):
            idx = (zero, jnp.int32(r), zero, zero, base2[r])
            sidx = (zero, jnp.int32(r), zero, base2[r])
            nk = jax.lax.dynamic_update_slice(nk, qk[:, r : r + 1], idx)
            nv = jax.lax.dynamic_update_slice(nv, qv[:, r : r + 1], idx)
            nks = jax.lax.dynamic_update_slice(nks, sk[:, r : r + 1], sidx)
            nvs = jax.lax.dynamic_update_slice(nvs, sv[:, r : r + 1], sidx)
        return {
            **pool,
            "cache": {**cache, "k": nk, "v": nv,
                      "k_scale": nks, "v_scale": nvs},
            "flush_base": pool["pos"],
        }

    nk, nv = cache["k"], cache["v"]
    for r in range(B2):
        idx = (zero, jnp.int32(r), zero, zero, base2[r])
        nk = jax.lax.dynamic_update_slice(nk, ks[:, r : r + 1], idx)
        nv = jax.lax.dynamic_update_slice(nv, vs[:, r : r + 1], idx)
    return {
        **pool,
        "cache": {**cache, "k": nk, "v": nv},
        "flush_base": pool["pos"],
    }


def row_finished(pool: dict, slot: int) -> bool:
    return bool(pool["active"][slot]) and int(pool["remaining"][slot]) <= 0


@functools.partial(jax.jit, static_argnames=("model",))
def _extract_row_device(model: ZonosModel, pool: dict, slot):
    """Device half of :func:`extract_row`: ONE compiled program (slot
    traced) returning the full reverted code grid + the row's counters.
    The previous eager form dispatched ~a dozen ops per call (each an
    RPC on the remote-TPU tunnel) and specialized per slot AND per
    valid-length — extract_row runs per segment per streaming row, so
    that was a steady TTFA tax."""
    delayed = jax.lax.dynamic_slice_in_dim(
        pool["delayed"], jnp.asarray(slot, jnp.int32), 1, axis=0
    )
    out = revert_delay_pattern(delayed)[0]
    out = jnp.where(out >= model.config.codebook_size, 0, out)
    slot = jnp.asarray(slot, jnp.int32)
    return out, pool["step"][slot], pool["stop_offset"][slot]


def finalize_extract(model: ZonosModel, out, step, stop):
    """Host half of :func:`extract_row`: trim the device result. ``step``
    is the NEXT write column; the last written column is step - 1 (== the
    standard engine's final ``offset``)."""
    K = model.config.num_codebooks
    step = int(step) - 1
    stop = int(stop)
    valid = max(step - K, 0)
    if stop >= 0:
        valid = min(valid, max(stop - 1, 0))
    return out[:, :valid], valid


def extract_row(model: ZonosModel, pool: dict, slot: int):
    """Finished row -> ``(codes [K, frames] np.ndarray, valid_frames)``;
    caller marks the slot free via :func:`release_row`. Callers extracting
    SEVERAL rows per barrier (streaming pools) should instead batch the
    ``_extract_row_device`` results into one ``jax.device_get`` and trim
    via :func:`finalize_extract` — each separate device_get is a full
    host<->device roundtrip (0.15 s on the remote-TPU tunnel)."""
    out, step, stop = jax.device_get(_extract_row_device(model, pool, slot))
    return finalize_extract(model, out, step, stop)


@functools.partial(jax.jit, donate_argnames=("pool",))
def release_row(pool: dict, slot) -> dict:
    """Mark ``slot`` free. Jitted with a TRACED slot: the eager form
    (``active.at[slot].set(False)`` with a Python-int slot) dispatched a
    fresh per-slot program over the remote-TPU tunnel — ~1.1 s of compile
    in the measured round-5 TTFA budget the first time each slot released
    (the same per-Python-int trap the round-3 join fix removed). The pool
    is donated (callers always rebind), so the update is in-place rather
    than a full multi-GB cache copy."""
    return {
        **pool,
        "active": pool["active"].at[jnp.asarray(slot, jnp.int32)].set(False),
    }


def make_pool_emit(model: ZonosModel, dac_model, margin: int,
                   vocode_win: int):
    """Build the per-segment streaming-emit function: ONE device program
    that, for every pool row, computes the row's newly-stable span, vocodes
    a fixed ``vocode_win``-frame window around it through the DAC decoder,
    and returns ready-to-ship int16 PCM plus the segment's bookkeeping
    counters — so the scheduler's post-segment barrier is ONE
    ``jax.device_get`` total. The previous shape (one barrier fetch + one
    vocoder dispatch + one fetch PER streaming row) paid a full remote-TPU
    tunnel roundtrip (~0.1-0.15 s) per stream per segment — the dominant
    term of the round-4 pooled-TTFA budget (VERDICT r4 #1).

    Window semantics match ``_PoolJob._vocode_span`` exactly: emit
    ``[emitted, e)`` where ``e = min(stable, emitted + emit_cap)``, vocoded
    with >= ``margin`` frames of true context on both sides inside a
    fixed, right-zero-padded window (sample-exact vs the one-shot decode
    away from the final margin; the DAC half receptive field is pinned
    < margin by tests/test_dac.py). ``stable`` withholds ``margin`` frames
    until the row's EOS cascade completes (``done``), when it flushes to
    ``valid``; a final span longer than ``emit_cap`` leaves a remainder the
    caller finishes via the host fallback path.

    Returns a function ``emit(dac_params, pool, emitted, mnt_cap) ->
    dict`` (jit it once per pool job); ``emitted``/``mnt_cap`` are ``[S]``
    int32 (frames already shipped / per-row frame budget)."""
    K = model.config.num_codebooks
    hop = dac_model.config.hop_length
    emit_cap = vocode_win - 2 * margin
    assert emit_cap >= 8, (margin, vocode_win)
    cap_samples = emit_cap * hop

    def emit(dac_params: dict, pool: dict, emitted, mnt_cap) -> dict:
        step, stop = pool["step"], pool["stop_offset"]
        # finalize_extract math, traced (step is the NEXT write column).
        valid = jnp.maximum(step - 1 - K, 0)
        valid = jnp.where(
            stop >= 0, jnp.minimum(valid, jnp.maximum(stop - 1, 0)), valid
        )
        valid = jnp.minimum(valid, mnt_cap)
        done = pool["active"] & (pool["remaining"] <= 0)
        stable = jnp.where(done, valid, jnp.maximum(valid - margin, 0))
        e = jnp.clip(stable, emitted, emitted + emit_cap)
        c1 = jnp.minimum(valid, e + margin)
        c0 = jnp.maximum(c1 - vocode_win, 0)

        codes = revert_delay_pattern(pool["delayed"])  # [S, K, Trev]
        codes = jnp.where(codes >= model.config.codebook_size, 0, codes)
        w = jnp.arange(vocode_win, dtype=jnp.int32)
        tidx = c0[:, None, None] + w[None, None, :]
        win = jnp.take_along_axis(
            codes,
            jnp.broadcast_to(
                jnp.minimum(tidx, codes.shape[-1] - 1),
                (codes.shape[0], K, vocode_win),
            ),
            axis=2,
        )
        win = jnp.where(
            w[None, None, :] < (c1 - c0)[:, None, None], win, 0
        )
        wav = dac_model.decode(dac_params, win)[:, 0, :]  # [S, W*hop]
        pcm = (jnp.clip(wav, -1.0, 1.0) * 32767.0).astype(jnp.int16)
        # Shift each row so its chunk starts at sample 0 (fixed-size
        # return; the host slices take_frames*hop bytes).
        off = (emitted - c0) * hop
        pcm = jnp.concatenate(
            [pcm, jnp.zeros((pcm.shape[0], cap_samples), jnp.int16)], axis=1
        )
        sidx = off[:, None] + jnp.arange(cap_samples, dtype=jnp.int32)[None, :]
        pcm = jnp.take_along_axis(pcm, sidx, axis=1)
        return {
            "active": pool["active"],
            "remaining": pool["remaining"],
            "valid": valid,
            "new_emitted": e,
            "pcm": pcm,  # [S, emit_cap*hop] int16, chunk-aligned
        }

    return emit
