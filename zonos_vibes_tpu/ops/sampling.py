"""Token sampling suite — fully vectorized, jit-friendly.

Reproduces the reference pipeline (zonos/sampling.py:117-182) with explicit
JAX PRNG keys instead of torch's global generator:

  1. repetition penalty (CTRL-style, sliding window over the last W delayed
     frames; factors accumulated multiplicatively per token id)
  2. if temperature > 0: ``softmax(logits/T)`` then, in order, the unified
     (NovelAI) transform, top-p, top-k, min-p, and a Gumbel-trick multinomial
  3. else greedy argmax.

All knobs live in the hashable ``SamplingParams`` so the enabled branches are
resolved at trace time (no data-dependent control flow under jit). Everything
operates on ``[B, K, V]`` logits and returns ``[B, K]`` int32 tokens.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

_EPS = 1e-20


@dataclass(frozen=True)
class SamplingParams:
    temperature: float = 1.0
    top_p: float = 0.0
    top_k: int = 0
    min_p: float = 0.0
    linear: float = 0.0
    conf: float = 0.0
    quad: float = 0.0
    repetition_penalty: float = 3.0
    repetition_penalty_window: int = 2

    @classmethod
    def from_dict(cls, d: dict | None) -> "SamplingParams":
        return cls(**(d or {}))


def apply_repetition_penalty(
    logits: jnp.ndarray,
    generated_tokens: jnp.ndarray,
    penalty: float,
    window: int,
) -> jnp.ndarray:
    """CTRL repetition penalty over a sliding window (sampling.py:99-114).

    ``factors[v] = penalty ** count(v in last-window tokens)`` per (batch,
    codebook) row; penalized as ``logits*f`` where ``logits <= 0`` else
    ``logits/f``. Token ids are clamped to ``V - 1`` (MASK tokens land on the
    top vocab slot exactly as the reference's ``clamp_max`` does).
    """
    V = logits.shape[-1]
    window_tokens = generated_tokens[..., -window:]
    window_tokens = jnp.minimum(window_tokens, V - 1).astype(jnp.int32)
    counts = jax.nn.one_hot(window_tokens, V, dtype=jnp.float32).sum(axis=-2)
    factors = jnp.power(jnp.asarray(penalty, jnp.float32), counts)
    lf = logits.astype(jnp.float32)
    return jnp.where(lf <= 0, lf * factors, lf / factors)


def apply_unified(probs: jnp.ndarray, linear: float, conf: float, quad: float):
    """NovelAI unified sampler (sampling.py:29-43)."""
    logprobs = jnp.log(jnp.maximum(probs, _EPS))
    entropy = -jnp.sum(probs * logprobs, axis=-1, keepdims=True)
    raw = logprobs * (linear + entropy * conf) - jnp.square(logprobs) * quad
    return jax.nn.softmax(raw, axis=-1)


def apply_top_p(probs: jnp.ndarray, p: float) -> jnp.ndarray:
    """Nucleus filter (sampling.py:64-79): drop tokens whose *preceding*
    cumulative mass (sorted desc) already exceeds ``p``; renormalize."""
    sort_idx = jnp.argsort(-probs, axis=-1)
    probs_sort = jnp.take_along_axis(probs, sort_idx, axis=-1)
    cum = jnp.cumsum(probs_sort, axis=-1)
    keep = (cum - probs_sort) <= p
    probs_sort = jnp.where(keep, probs_sort, 0.0)
    inv_idx = jnp.argsort(sort_idx, axis=-1)
    out = jnp.take_along_axis(probs_sort, inv_idx, axis=-1)
    return out / jnp.sum(out, axis=-1, keepdims=True)


def apply_top_k(probs: jnp.ndarray, k: int) -> jnp.ndarray:
    """Top-k filter via pivot threshold (sampling.py:45-61)."""
    k = min(k, probs.shape[-1])
    topv = jax.lax.top_k(probs, k)[0]
    pivot = topv[..., -1:]
    out = jnp.where(probs < pivot, 0.0, probs)
    return out / jnp.sum(out, axis=-1, keepdims=True)


def apply_min_p(probs: jnp.ndarray, min_p: float) -> jnp.ndarray:
    """min-p filter (sampling.py:82-96)."""
    top = jnp.max(probs, axis=-1, keepdims=True)
    out = jnp.where(probs < min_p * top, 0.0, probs)
    return out / jnp.sum(out, axis=-1, keepdims=True)


def gumbel_multinomial(key: jax.Array, probs: jnp.ndarray) -> jnp.ndarray:
    """One multinomial draw via the exponential race used by the reference
    (``argmax(probs / Exp(1))``, sampling.py:19-21) — equivalent to
    Gumbel-max on ``log probs``. Zero-prob tokens can never win."""
    e = jax.random.exponential(key, probs.shape, dtype=jnp.float32)
    return jnp.argmax(probs / e, axis=-1).astype(jnp.int32)


def sample_from_logits(
    key: jax.Array,
    logits: jnp.ndarray,
    params: SamplingParams,
    generated_tokens: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Full sampling pipeline. ``logits [B, K, V] -> tokens [B, K]`` int32."""
    if params.repetition_penalty != 1.0 and generated_tokens is not None:
        logits = apply_repetition_penalty(
            logits,
            generated_tokens,
            params.repetition_penalty,
            params.repetition_penalty_window,
        )
    logits = logits.astype(jnp.float32)

    if params.temperature > 0:
        probs = jax.nn.softmax(logits / params.temperature, axis=-1)
        if params.linear > 0.0:
            probs = apply_unified(probs, params.linear, params.conf, params.quad)
        if params.top_p > 0:
            probs = apply_top_p(probs, params.top_p)
        if params.top_k > 0:
            probs = apply_top_k(probs, params.top_k)
        if params.min_p > 0:
            probs = apply_min_p(probs, params.min_p)
        return gumbel_multinomial(key, probs)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Runtime-knob sampler (continuous-batching pools)
# ---------------------------------------------------------------------------

KNOB_FIELDS = (
    "temperature", "top_p", "top_k", "min_p", "linear", "conf", "quad",
    "repetition_penalty", "repetition_penalty_window", "cfg_scale",
)


def knobs_from_params(params: SamplingParams, cfg_scale: float) -> dict:
    """SamplingParams + cfg -> the runtime knob dict (f32/int32 scalars) the
    pooled step consumes. Values are materialized as dtype-exact scalars so
    the dyn sampler's arithmetic is bit-identical to the static pipeline."""
    return {
        "temperature": jnp.float32(params.temperature),
        "top_p": jnp.float32(params.top_p),
        "top_k": jnp.int32(params.top_k),
        "min_p": jnp.float32(params.min_p),
        "linear": jnp.float32(params.linear),
        "conf": jnp.float32(params.conf),
        "quad": jnp.float32(params.quad),
        "repetition_penalty": jnp.float32(params.repetition_penalty),
        "repetition_penalty_window": jnp.int32(
            params.repetition_penalty_window
        ),
        "cfg_scale": jnp.float32(cfg_scale),
    }


def sample_from_logits_dyn(
    key: jax.Array,
    logits: jnp.ndarray,
    knobs: dict,
    generated_tokens: jnp.ndarray | None = None,
    sorted_stages: bool = True,
) -> jnp.ndarray:
    """Runtime-knob sampling pipeline: same five stages as
    :func:`sample_from_logits`, but every knob is a TRACED scalar (see
    :func:`knobs_from_params`) so rows with different sampling configs can
    share one compiled pooled step — no recompile when a client moves a
    slider. Every stage is always traced and ``where``-gated to the EXACT
    identity when its knob is off, so outputs are bit-identical to the
    static pipeline with the equivalent ``SamplingParams``:

    * repetition penalty: ``generated_tokens`` carries the STATIC max
      window; positions older than the row's dynamic window are masked out
      of the one-hot counts (adding exact zeros), and ``penalty == 1``
      selects the unpenalized logits;
    * unified/top-p/min-p: computed then selected (their "off" values are
      not identities under the math — top-p 0 would keep one token,
      unified 0/0/0 is uniform);
    * top-k: the pivot (k-th largest) comes from the SAME descending sort
      top-p uses — same value as ``lax.top_k``, works with a traced k;
    * ``temperature == 0`` selects argmax over the penalized logits.

    ``sorted_stages`` (STATIC): top-p/top-k are the only stages that need
    a sort, and XLA:TPU sorts are expensive enough to tax every pooled
    step (measured ~2 ms/step at 8 slots). ``False`` compiles them OUT —
    legal only when every row's top_p == 0 and top_k == 0 (the reference
    defaults: min_p and the unified sampler are sort-free). The pool
    scheduler picks the variant per segment from its rows' knobs; each
    variant compiles once.
    """
    lf = logits.astype(jnp.float32)
    if generated_tokens is not None:
        W = generated_tokens.shape[-1]
        V = lf.shape[-1]
        wdyn = knobs["repetition_penalty_window"]
        valid = jnp.arange(W) >= (W - wdyn)  # last-wdyn slots of the window
        wt = jnp.minimum(generated_tokens, V - 1).astype(jnp.int32)
        counts = (
            jax.nn.one_hot(wt, V, dtype=jnp.float32)
            * valid.astype(jnp.float32)[..., :, None]
        ).sum(axis=-2)
        factors = jnp.power(knobs["repetition_penalty"], counts)
        penalized = jnp.where(lf <= 0, lf * factors, lf / factors)
        lf = jnp.where(knobs["repetition_penalty"] != 1.0, penalized, lf)

    t = knobs["temperature"]
    probs = jax.nn.softmax(lf / jnp.where(t > 0, t, 1.0), axis=-1)

    uni = apply_unified(probs, knobs["linear"], knobs["conf"], knobs["quad"])
    probs = jnp.where(knobs["linear"] > 0, uni, probs)

    if sorted_stages:
        # One descending sort serves both stages. top-p: nucleus keep +
        # inverse-permute back (apply_top_p's exact math, sort hoisted).
        sort_idx = jnp.argsort(-probs, axis=-1)
        probs_sort = jnp.take_along_axis(probs, sort_idx, axis=-1)
        cum = jnp.cumsum(probs_sort, axis=-1)
        keep = (cum - probs_sort) <= knobs["top_p"]
        ps = jnp.where(keep, probs_sort, 0.0)
        inv_idx = jnp.argsort(sort_idx, axis=-1)
        topp = jnp.take_along_axis(ps, inv_idx, axis=-1)
        topp = topp / jnp.sum(topp, axis=-1, keepdims=True)
        probs = jnp.where(knobs["top_p"] > 0, topp, probs)

        # top-k pivot = k-th largest of the CURRENT probs. When top-p is
        # active the distribution changed, but only by zeroing a SUFFIX of
        # the sorted order and rescaling — so the k-th largest is still
        # sorted position k-1, rescaled identically. Reuse the sort.
        V = probs.shape[-1]
        k_eff = jnp.clip(knobs["top_k"], 1, V)
        probs_now = jnp.take_along_axis(probs, sort_idx, axis=-1)
        pivot = jax.lax.dynamic_slice_in_dim(probs_now, k_eff - 1, 1, axis=-1)
        topk = jnp.where(probs < pivot, 0.0, probs)
        topk = topk / jnp.sum(topk, axis=-1, keepdims=True)
        probs = jnp.where(knobs["top_k"] > 0, topk, probs)

    minp = apply_min_p(probs, knobs["min_p"])
    probs = jnp.where(knobs["min_p"] > 0, minp, probs)

    sampled = gumbel_multinomial(key, probs)
    greedy = jnp.argmax(lf, axis=-1).astype(jnp.int32)
    return jnp.where(t > 0, sampled, greedy)
