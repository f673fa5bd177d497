"""Decode engine: prefill + jitted ``lax.while_loop`` autoregressive decode.

Behavioral spec: reference ``Zonos.generate`` (zonos/model.py:218-315) — CFG
batch doubling, delay-pattern bookkeeping, EOS logit bias, per-row EOS
cascade, repetition-penalty window, early stop when every row finished.

TPU-first engineering (the reference's weaknesses are the design targets):

* The reference crosses host<->device every step (`.item()` loop, Python
  ``while`` on a device tensor, model.py:283-307). Here the ENTIRE decode —
  prefill + all steps + EOS cascade — is ONE compiled XLA program: a
  ``lax.while_loop`` whose body embeds the frame, runs the backbone
  single-token step against the preallocated KV cache, mixes CFG, samples,
  and applies the EOS cascade as pure vector math. Early exit (all rows done)
  is the loop condition, so EOS still saves wall-clock.
* The CUDA-Graph / torch.compile machinery (model.py:118-179) is replaced by
  ``jax.jit`` — XLA gives graph capture + fusion natively (SURVEY.md §2.9
  N4/N5).
* Static shapes throughout; compiled programs are cached per
  (batch, cond_len, prefix_len, max_new_tokens, cfg, sampling) signature.
* **Streaming**: the same loop body also runs in bounded segments
  (``decode_segment_jit``), so ``DecodeEngine.generate_stream`` yields
  frames every N steps with host-side abort between segments — the TPU
  equivalent of the reference's per-step ``callback`` hook
  (model.py:229,306-307) without per-step host sync.

The EOS cascade, vectorized (reference model.py:283-294): when codebook 0
emits EOS, the row's remaining step count clamps to 9 and on each following
step codebook ``idx = 9 - remaining`` emits EOS with all earlier codebooks
MASK — the diagonal walk the delay pattern requires.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Iterator

import jax
import jax.numpy as jnp

from ..config import ZonosConfig
from ..models.backbone import flush_kv_stage
from ..models.zonos import ZonosModel
from ..ops.attention import NEG_INF
from ..ops.delay_pattern import apply_delay_pattern, revert_delay_pattern
from ..ops.rope import expand_rope_table, rope_table
from ..ops.sampling import (
    SamplingParams,
    sample_from_logits,
    sample_from_logits_dyn,
)

UNKNOWN_TOKEN = -1


def _find_multiple(n: int, k: int) -> int:
    return n if n % k == 0 else n + k - (n % k)


def _masked_scatter_frame(
    frame: jnp.ndarray, next_token: jnp.ndarray
) -> jnp.ndarray:
    """Fill UNKNOWN slots of ``frame [B, K]`` from ``next_token [B, K]`` with
    torch ``masked_scatter_`` semantics (model.py:260,296-297): masked slots
    take source elements in FLATTENED order, not elementwise. In the last
    K-1 delayed columns codebook 0's slot is MASK-padded (not UNKNOWN), so
    the reference really does write codebook k's prediction into slot k+1
    there — an elementwise ``where`` diverges from the reference on the
    final 8 frames of a max-length generation (verified against a
    random-init reference capture, tools/capture_reference.py)."""
    unknown = frame == UNKNOWN_TOKEN
    src_idx = jnp.cumsum(unknown.astype(jnp.int32), axis=1) - unknown
    gathered = jnp.take_along_axis(next_token, src_idx, axis=1)
    return jnp.where(unknown, gathered, frame)


@dataclass(frozen=True)
class GenerateResult:
    codes: jnp.ndarray  # [B, K, audio_seq_len] int32, invalid tail zero-filled
    valid_length: jnp.ndarray  # scalar int32: max valid frames over the batch
    valid_lengths: jnp.ndarray | None = None  # [B] int32 per-row frame counts


# ---------------------------------------------------------------------------
# Traced building blocks (called inside the jitted entry points below)
# ---------------------------------------------------------------------------

def _prefill_state(
    model: ZonosModel,
    params: dict,
    prefix_conditioning: jnp.ndarray,
    audio_prefix_codes: jnp.ndarray,
    key: jax.Array,
    prefix_audio_len: int,
    max_new_tokens: int,
    cfg_scale: float,
    sampling: SamplingParams,
    disable_eos: bool = False,
    kv_int8: bool = False,
    state_bf16: bool = False,
    knobs: dict | None = None,
) -> dict:
    """Build caches, apply the delay pattern, run prefill, sample the first
    frame (model.py:241-264). Returns the decode-loop state pytree.

    The reference builds its EOS logit bias only AFTER the first frame
    (model.py:256-267), so with ``disable_eos=False`` the first frame is
    sampled unbiased here too (parity). ``disable_eos=True`` is our
    extension promising NO EOS anywhere — that contract must also hold for
    the first frame, so the all-codebook bias applies to the prefill
    logits.

    ``knobs`` (pool joins): TRACED sampling/cfg knobs
    (ops/sampling.knobs_from_params) replace the static ``cfg_scale`` /
    ``sampling`` — one compiled prefill per geometry regardless of knob
    values, bit-identical outputs."""
    cfg: ZonosConfig = model.config
    K = cfg.num_codebooks
    mask_tok = cfg.masked_token_id

    two_b, cond_len, _ = prefix_conditioning.shape
    batch = two_b // 2
    lp = prefix_audio_len
    audio_seq_len = lp + max_new_tokens
    # Cache length: multiple of 8 (reference setup_cache, model.py:198-202);
    # long generations round to the Pallas decode block (512) so the
    # flash-decode kernel's DMA slabs stay aligned.
    seq_len = cond_len + audio_seq_len + K
    seq_len = _find_multiple(seq_len, 512 if seq_len >= 1024 else 8)

    # Pre-expanded ([P, 2, D]) so the in-loop rotation is elementwise-only;
    # expanding lazily inside apply_rope lands the 8.4 MB table prep in the
    # decode while body (~59 us/step measured — XLA does not hoist it).
    rope = expand_rope_table(rope_table(cfg.backbone.head_dim))
    # Cache dtype follows the activation dtype (bf16 for real checkpoints,
    # fp32 in CPU tests — mixed bf16/fp32 dots don't lower on XLA:CPU).
    cache = model.allocate_cache(two_b, seq_len, prefix_conditioning.dtype,
                                 kv_int8=kv_int8, state_bf16=state_bf16)

    codes = jnp.full((batch, K, audio_seq_len), UNKNOWN_TOKEN, jnp.int32)
    if lp > 0:
        codes = codes.at[..., :lp].set(audio_prefix_codes.astype(jnp.int32))
    delayed = apply_delay_pattern(codes, mask_tok)  # [B, K, audio_seq_len+K]

    prefix_frames = delayed[..., : lp + 1]
    emb = model.embed_codes(params, prefix_frames)  # [B, lp+1, D]
    emb = jnp.concatenate([emb, emb], axis=0)  # CFG doubling
    hidden = jnp.concatenate(
        [prefix_conditioning.astype(emb.dtype), emb], axis=1
    )
    lengths0 = jnp.zeros((two_b,), jnp.int32)
    cfg_eff = (
        jnp.broadcast_to(knobs["cfg_scale"], (batch,))
        if knobs is not None else cfg_scale
    )
    logits, cache = model.compute_logits(
        params, hidden, cache, jnp.int32(0), lengths0, cfg_eff, rope
    )

    if disable_eos:
        logits = logits.at[:, :, cfg.eos_token_id].set(NEG_INF)
    key, k0 = jax.random.split(key)
    if knobs is not None:
        next_token = sample_from_logits_dyn(k0, logits, knobs)  # [B, K]
    else:
        next_token = sample_from_logits(k0, logits, sampling)  # [B, K]

    offset0 = lp + 1
    frame = delayed[..., offset0]
    frame = _masked_scatter_frame(frame, next_token)
    delayed = delayed.at[..., offset0].set(frame)

    max_steps = delayed.shape[-1] - offset0
    state = {
        "delayed": delayed,
        "cache": cache,
        "offset": jnp.int32(offset0),
        "remaining": jnp.full((batch,), max_steps, jnp.int32),
        "stopping": jnp.zeros((batch,), bool),
        # Per-row delayed column where cb0 emitted EOS (-1 = still running) —
        # used to trim each utterance in batched serving.
        "stop_offset": jnp.full((batch,), -1, jnp.int32),
        "key": key,
    }
    if isinstance(cache, dict) and "k_stage" in cache:
        # Staged KV decode (transformer backbone): fresh columns go to the
        # time-major stage; flushed prefix ends exactly at the prefill.
        state["stage_base"] = jnp.int32(cond_len + lp + 1)
    return state


def _decode_loop(
    model: ZonosModel,
    params: dict,
    state: dict,
    cond_len: int,
    cfg_scale: float,
    sampling: SamplingParams,
    disable_eos: bool,
    step_limit: int | None,
) -> dict:
    """Run the decode while_loop from ``state``; stops when every row is
    done or (if given) after ``step_limit`` steps."""
    cfg: ZonosConfig = model.config
    K = cfg.num_codebooks
    eos = cfg.eos_token_id
    mask_tok = cfg.masked_token_id
    batch = state["delayed"].shape[0]
    two_b = 2 * batch
    rope = expand_rope_table(rope_table(cfg.backbone.head_dim))

    # EOS only from codebook 0 (model.py:266-267); disable_eos forbids all.
    head_v = model.head_out_dim
    logit_bias = jnp.zeros((batch, K, head_v), jnp.float32)
    eos_rows = slice(0, None) if disable_eos else slice(1, None)
    logit_bias = logit_bias.at[:, eos_rows, eos].set(NEG_INF)

    start_offset = state["offset"]

    def cond_fn(s):
        go = jnp.max(s["remaining"]) > 0
        if step_limit is not None:
            go &= (s["offset"] - start_offset) < step_limit
        return go

    staged = "stage_base" in state
    stage_depth = state["cache"]["k_stage"].shape[2] if staged else 0

    def body_fn(s):
        offset = s["offset"] + 1
        delayed = s["delayed"]
        frame_in = jax.lax.dynamic_slice_in_dim(delayed, offset - 1, 1, axis=2)
        emb = model.embed_codes(params, frame_in)  # [B, 1, D]
        emb = jnp.concatenate([emb, emb], axis=0)  # CFG repeat (model.py:142)
        cache_off = offset - 1 + cond_len  # absolute cache position
        lengths = jnp.full((two_b,), cache_off, jnp.int32)
        stage_base = s.get("stage_base")
        logits, cache = model.compute_logits(
            params, emb, s["cache"], cache_off, lengths, cfg_scale, rope,
            stage_base=stage_base,
        )
        logits = logits + logit_bias

        # Repetition penalty window: the last `window` delayed frames. A
        # window wider than the whole delayed buffer just covers everything
        # generated (the reference's `[..., -window:]` takes min implicitly).
        w = min(sampling.repetition_penalty_window, delayed.shape[-1])
        gen_window = jax.lax.dynamic_slice_in_dim(delayed, offset - w, w, axis=2)

        key, k_step = jax.random.split(s["key"])
        next_token = sample_from_logits(k_step, logits, sampling, gen_window)

        # -- EOS cascade, vectorized (model.py:283-294) ---------------------
        eos_in_cb0 = next_token[:, 0] == eos
        remaining = jnp.where(
            eos_in_cb0, jnp.minimum(s["remaining"], 9), s["remaining"]
        )
        stop_offset = jnp.where(
            eos_in_cb0 & ~s["stopping"], offset, s["stop_offset"]
        )
        stopping = s["stopping"] | eos_in_cb0
        eos_idx = jnp.clip(9 - remaining, 0, K - 1)  # [B]
        cb = jnp.arange(K, dtype=jnp.int32)[None, :]
        cascade = jnp.where(
            cb < eos_idx[:, None],
            mask_tok,
            jnp.where(cb == eos_idx[:, None], eos, next_token),
        )
        next_token = jnp.where(stopping[:, None], cascade, next_token)

        frame = jax.lax.dynamic_slice_in_dim(delayed, offset, 1, axis=2)[..., 0]
        frame = _masked_scatter_frame(frame, next_token)
        delayed = jax.lax.dynamic_update_slice_in_dim(
            delayed, frame[..., None], offset, axis=2
        )

        out = {
            "delayed": delayed,
            "cache": cache,
            "offset": offset,
            "remaining": remaining - 1,
            "stopping": stopping,
            "stop_offset": stop_offset,
            "key": key,
        }
        if staged:
            out["stage_base"] = s["stage_base"]
        return out

    if not staged:
        return jax.lax.while_loop(cond_fn, body_fn, state)

    # Staged KV decode runs in SEGMENTS of up to stage_depth steps: an inner
    # while_loop (same early-exit semantics) bounded by the stage capacity,
    # then ONE unconditional flush splices the segment's columns into the
    # time-minor cache. A per-step `lax.cond` flush does NOT work: XLA
    # executes both branches inside the decode while-loop (measured: the
    # flush transpose + splice and a full-cache select ran every step),
    # so the flush must sit structurally outside the stepping loop.
    def inner_cond(t):
        # Next body writes cache position t.offset + cond_len into stage
        # slot (pos - stage_base); stop when the stage is full. The bound is
        # ABSOLUTE (not per-segment), so mid-stage re-entry (streaming
        # chunks) fills the same canonical [prefill_end + k*depth) windows
        # and streamed decode stays bit-exact vs one-shot.
        return cond_fn(t) & (
            (t["offset"] + cond_len - t["stage_base"]) < stage_depth
        )

    def outer_body(s):
        s = jax.lax.while_loop(inner_cond, body_fn, s)
        # Flush ONLY an exactly-full stage (canonical boundaries). This
        # lax.cond sits OUTSIDE the stepping loop: even if XLA executes
        # both branches, the cost amortizes over stage_depth steps.
        full = (s["offset"] + cond_len - s["stage_base"]) == stage_depth
        cache = jax.lax.cond(
            full,
            lambda c: flush_kv_stage(c, s["stage_base"]),
            lambda c: c,
            s["cache"],
        )
        stage_base = jnp.where(
            full, s["stage_base"] + stage_depth, s["stage_base"]
        )
        return {**s, "cache": cache, "stage_base": stage_base}

    return jax.lax.while_loop(cond_fn, outer_body, state)


def _finalize(model: ZonosModel, state: dict):
    """Delay-pattern revert + cleanup (model.py:309-311)."""
    cfg = model.config
    K = cfg.num_codebooks
    out = revert_delay_pattern(state["delayed"])  # [B, K, audio_seq_len]
    out = jnp.where(out >= cfg.codebook_size, 0, out)
    # Codebook k lags k steps; fewer than K decoded steps -> nothing final.
    valid_length = jnp.maximum(state["offset"] - K, 0)
    # Per-row: cb0's EOS at delayed column o means its frame o-1 is EOS, so
    # o-1 valid audio frames; rows still running use the global count.
    valid_lengths = jnp.where(
        state["stop_offset"] >= 0,
        jnp.maximum(state["stop_offset"] - 1, 0),
        valid_length,
    )
    valid_lengths = jnp.minimum(valid_lengths, valid_length)
    t = jnp.arange(out.shape[-1], dtype=jnp.int32)[None, None, :]
    out = jnp.where(t < valid_lengths[:, None, None], out, 0)
    return out, valid_length, valid_lengths


# ---------------------------------------------------------------------------
# Jitted entry points
# ---------------------------------------------------------------------------

_STATICS = (
    "model", "prefix_audio_len", "max_new_tokens", "cfg_scale", "sampling",
    "disable_eos", "kv_int8", "state_bf16",
)


@functools.partial(jax.jit, static_argnames=_STATICS)
def generate_jit(
    model: ZonosModel,
    params: dict,
    prefix_conditioning: jnp.ndarray,  # [2B, Lc, D] (cond ‖ uncond)
    audio_prefix_codes: jnp.ndarray,  # [B, K, Lp] int32 (Lp may be 0)
    key: jax.Array,
    prefix_audio_len: int,
    max_new_tokens: int,
    cfg_scale: float,
    sampling: SamplingParams,
    disable_eos: bool = False,
    kv_int8: bool = False,
    state_bf16: bool = False,
):
    cond_len = prefix_conditioning.shape[1]
    state = _prefill_state(
        model, params, prefix_conditioning, audio_prefix_codes, key,
        prefix_audio_len, max_new_tokens, cfg_scale, sampling, disable_eos,
        kv_int8=kv_int8, state_bf16=state_bf16,
    )
    state = _decode_loop(
        model, params, state, cond_len, cfg_scale, sampling, disable_eos,
        step_limit=None,
    )
    return _finalize(model, state)


@functools.partial(jax.jit, static_argnames=_STATICS)
def prefill_jit(
    model, params, prefix_conditioning, audio_prefix_codes, key,
    prefix_audio_len, max_new_tokens, cfg_scale, sampling,
    disable_eos: bool = False,
    kv_int8: bool = False,
    state_bf16: bool = False,
):
    return _prefill_state(
        model, params, prefix_conditioning, audio_prefix_codes, key,
        prefix_audio_len, max_new_tokens, cfg_scale, sampling, disable_eos,
        kv_int8=kv_int8, state_bf16=state_bf16,
    )


@functools.partial(
    jax.jit,
    static_argnames=("model", "prefix_audio_len", "max_new_tokens",
                     "kv_int8", "state_bf16"),
)
def prefill_dyn_jit(
    model, params, prefix_conditioning, audio_prefix_codes, key,
    prefix_audio_len, max_new_tokens, knobs,
    kv_int8: bool = False,
    state_bf16: bool = False,
):
    """Prefill with TRACED sampling/cfg knobs (pool joins): one compiled
    program per geometry, any knob values — a client moving a slider never
    triggers a prefill recompile. Bit-identical to :func:`prefill_jit` with
    the equivalent static params (ops/sampling.sample_from_logits_dyn)."""
    return _prefill_state(
        model, params, prefix_conditioning, audio_prefix_codes, key,
        prefix_audio_len, max_new_tokens, 0.0, None, False,
        kv_int8=kv_int8, state_bf16=state_bf16, knobs=knobs,
    )


@functools.partial(
    jax.jit,
    static_argnames=("model", "cond_len", "cfg_scale", "sampling",
                     "disable_eos", "n_steps"),
    donate_argnames=("state",),
)
def decode_segment_jit(
    model, params, state, cond_len: int, cfg_scale: float,
    sampling: SamplingParams, n_steps: int, disable_eos: bool = False,
):
    """Run at most ``n_steps`` decode steps; returns (state, codes, valid)."""
    state = _decode_loop(
        model, params, state, cond_len, cfg_scale, sampling, disable_eos,
        step_limit=n_steps,
    )
    codes, valid, valid_rows = _finalize(model, state)
    done = jnp.max(state["remaining"]) <= 0
    return state, codes, valid, valid_rows, done


class DecodeEngine:
    """User-facing generate API. Compiled programs cached by jit on the
    static signature (batch, cond_len, prefix_len, steps, cfg, sampling).

    ``kv_int8`` (int8 phase 2, transformer only): store the flushed KV
    prefix as int8 + per-(head, token) scales — half the cache HBM traffic;
    the staged tail and current token stay exact. Opt-in because it is a
    lossy cache representation (documented tolerance in tests/test_quant)."""

    def __init__(self, model: ZonosModel, kv_int8: bool = False,
                 state_bf16: bool = False):
        self.model = model
        self.kv_int8 = kv_int8
        self.state_bf16 = state_bf16

    def _norm_args(self, prefix_conditioning, audio_prefix_codes,
                   sampling_params, cfg_scale):
        if cfg_scale == 1.0:
            raise NotImplementedError(
                "cfg_scale == 1 unsupported (reference asserts the same, "
                "model.py:231)"
            )
        if sampling_params is None:
            sampling_params = SamplingParams(min_p=0.1)  # model.py:226 default
        elif isinstance(sampling_params, dict):
            sampling_params = SamplingParams.from_dict(sampling_params)
        K = self.model.config.num_codebooks
        if audio_prefix_codes is None:
            b = prefix_conditioning.shape[0] // 2
            audio_prefix_codes = jnp.zeros((b, K, 0), jnp.int32)
        return audio_prefix_codes, sampling_params

    def generate(
        self,
        params: dict,
        prefix_conditioning: jnp.ndarray,
        audio_prefix_codes: jnp.ndarray | None = None,
        *,
        key: jax.Array,
        max_new_tokens: int = 86 * 30,
        cfg_scale: float = 2.0,
        sampling_params: SamplingParams | dict | None = None,
        disable_eos: bool = False,
    ) -> GenerateResult:
        audio_prefix_codes, sampling_params = self._norm_args(
            prefix_conditioning, audio_prefix_codes, sampling_params, cfg_scale
        )
        codes, valid, valid_rows = generate_jit(
            self.model,
            params,
            prefix_conditioning,
            audio_prefix_codes,
            key,
            int(audio_prefix_codes.shape[-1]),
            int(max_new_tokens),
            float(cfg_scale),
            sampling_params,
            disable_eos,
            self.kv_int8,
            self.state_bf16,
        )
        return GenerateResult(
            codes=codes, valid_length=valid, valid_lengths=valid_rows
        )

    def generate_stream(
        self,
        params: dict,
        prefix_conditioning: jnp.ndarray,
        audio_prefix_codes: jnp.ndarray | None = None,
        *,
        key: jax.Array,
        max_new_tokens: int = 86 * 30,
        cfg_scale: float = 2.0,
        sampling_params: SamplingParams | dict | None = None,
        disable_eos: bool = False,
        chunk_steps: int = 43,  # ~0.5 s of audio per yield
    ) -> Iterator[GenerateResult]:
        """Yield a cumulative :class:`GenerateResult` every ``chunk_steps``
        decode steps. Identical outputs to :meth:`generate` with the same
        key; stop consuming the iterator to abort (the reference callback's
        ``return False``, model.py:306-307)."""
        audio_prefix_codes, sampling_params = self._norm_args(
            prefix_conditioning, audio_prefix_codes, sampling_params, cfg_scale
        )
        cond_len = int(prefix_conditioning.shape[1])
        state = prefill_jit(
            self.model, params, prefix_conditioning, audio_prefix_codes, key,
            int(audio_prefix_codes.shape[-1]), int(max_new_tokens),
            float(cfg_scale), sampling_params, disable_eos, self.kv_int8,
            self.state_bf16,
        )
        while True:
            state, codes, valid, valid_rows, done = decode_segment_jit(
                self.model, params, state, cond_len, float(cfg_scale),
                sampling_params, int(chunk_steps), disable_eos,
            )
            yield GenerateResult(
                codes=codes, valid_length=valid, valid_lengths=valid_rows
            )
            if bool(done):
                return
