"""Quantization quality gate (VERDICT r2 #4): a quantization mode ships
with NUMBERS, not a flag. For each mode vs the bf16 reference at flagship
scale (random-init weights — the only weights available offline; Gaussian
weights are the standard proxy for per-channel absmax error):

* margin-weighted top-k overlap — teacher-forced on the bf16 greedy
  prefix: per position, |top8(ref) ∩ top8(quant)| / 8, weighted by the
  ref distribution's top-1/top-2 probability margin. (Replaces the old
  greedy_code_agreement, which was argmax noise on random-init
  near-uniform logits — VERDICT r3 weak #2: positions where the model is
  indifferent contribute ~nothing here, decisive positions dominate.)
* distributional drift — mean/max total-variation distance between the
  next-token distributions (post CFG + softmax) over the decode, per
  codebook, aggregated.

Usage: python tools/quality_quant.py [steps] [modes...]
Defaults: 86 steps, modes int8 int4. (int4full is experimental — highest
TVD and axon-layout-fragile for the all-int4 grouped program; pass it
explicitly to measure.) Prints one JSON line per mode.
"""
import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from zonos_vibes_tpu.utils import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

from zonos_vibes_tpu.config import ZONOS_V01_TRANSFORMER  # noqa: E402
from zonos_vibes_tpu.engine.generate import DecodeEngine  # noqa: E402
from zonos_vibes_tpu.models.zonos import ZonosModel  # noqa: E402
from zonos_vibes_tpu.ops.quant import quantize_zonos_params  # noqa: E402
from zonos_vibes_tpu.ops.sampling import SamplingParams  # noqa: E402

args = [a for a in sys.argv[1:]]
steps = int(args[0]) if args and args[0].isdigit() else 86
modes = [a for a in args if not a.isdigit()] or ["int8", "int4"]

model = ZonosModel(ZONOS_V01_TRANSFORMER)
params = model.init(jax.random.key(0))
phon = jnp.asarray([[2] + [40] * 58 + [3]])
cond = model.prepare_conditioning(params, {"espeak": phon})
GREEDY = SamplingParams(temperature=0.0)


def greedy_codes(p):
    eng = DecodeEngine(model)
    res = eng.generate(p, cond, key=jax.random.key(1), max_new_tokens=steps,
                       sampling_params=GREEDY, disable_eos=True)
    return np.asarray(jax.device_get(res.codes))[0]  # [K, steps]


ref_codes = greedy_codes(params)

from zonos_vibes_tpu.ops.delay_pattern import apply_delay_pattern  # noqa: E402
from zonos_vibes_tpu.ops.rope import expand_rope_table, rope_table  # noqa: E402

K = model.config.num_codebooks
delayed = apply_delay_pattern(
    jnp.asarray(ref_codes)[None], model.config.masked_token_id
)  # [1, K, steps+K]
rope = expand_rope_table(rope_table(model.config.backbone.head_dim))

_awq_energy = None


def awq_energy():
    """fc2-input per-channel energies over the SAME teacher-forced
    context the gate measures on — real activations, not an input-
    distribution proxy (the round-5 GPTQ MC-Hessian negative result)."""
    global _awq_energy
    if _awq_energy is None:
        @jax.jit
        def cap(p, delayed):
            emb = model.embed_codes(p, delayed)
            emb = jnp.concatenate([emb, emb], axis=0)
            hidden = jnp.concatenate([cond.astype(emb.dtype), emb], axis=1)
            T = hidden.shape[1]
            cache = model.allocate_cache(2, ((T + 7) // 8) * 8, cond.dtype)
            lengths = jnp.zeros((2,), jnp.int32)
            _, _, e = model.backbone_forward(
                p, hidden, cache, jnp.int32(0), lengths, rope,
                capture_fc2=True,
            )
            return e  # [L, F]
        _awq_energy = jax.device_get(cap(params, delayed))
    return _awq_energy


for mode in modes:
    # Mode grammar: "int8" | "int4full" | "int4" + optional suffixes
    # "fc1" (fc2 stays int8) / "fc2" (fc1 stays int8) / "g64"|"g32"
    # (scale-group size, default 128) / "gptq" (fc2 error compensation,
    # VERDICT r4 #2) / "real" (PACKED s4 device arrays instead of the
    # fake quant-dequant — exercises the layout machinery; viable since
    # ops/quant._pin_s4_layout constrains every consumer program's s4
    # entry layout to the creation-pinned packed one, VERDICT r4 #4).
    # "awq" (activation-aware fc2 fold against captured real fc2-input
    # energies, per-layer alpha search — ops/quant.awq_fold).
    # E.g. int4fc1g64, int4gptq, int4g64gptq, int4awq, int4fullreal.
    base = mode.removesuffix("real")
    bits = 4 if base.startswith("int4full") else 8
    mlp_bits = 4 if base.startswith("int4") else None
    fc2_bits = None
    if "fc1" in base:
        mlp_bits, fc2_bits = 4, 8
    elif "fc2" in base:
        mlp_bits, fc2_bits = 8, 4
    group = 64 if "g64" in base else (32 if "g32" in base else 128)
    qp = quantize_zonos_params(
        params, bits=bits, mlp_bits=mlp_bits,
        fake=not mode.endswith("real"),
        int4_group=group, fc2_bits=fc2_bits, gptq="gptq" in base,
        awq_energy=awq_energy() if "awq" in base else None)
    # fake=True (default): quantize->dequantize host-side — numerically
    # equivalent to the packed path up to one bf16 weight rounding, no s4
    # device arrays. "...real" runs the packed-s4 teacher-forced program
    # (the one whose divergent layout assignment used to recurse before
    # the _pin_s4_layout consumption-point constraint).

    # Distributional drift: teacher-forced on the bf16 greedy prefix —
    # compare per-step sampling distributions on identical contexts.
    @jax.jit
    def probs_along(p, delayed):
        """Teacher-forced full-sequence pass: prefill the whole delayed
        buffer as one chunk and read logits at EVERY position."""
        emb = model.embed_codes(p, delayed)  # [1, T, D]
        emb = jnp.concatenate([emb, emb], axis=0)
        hidden = jnp.concatenate([cond.astype(emb.dtype), emb], axis=1)
        T = hidden.shape[1]
        cache = model.allocate_cache(2, ((T + 7) // 8) * 8, cond.dtype)
        lengths = jnp.zeros((2,), jnp.int32)
        out, _ = model.backbone_forward(
            p, hidden, cache, jnp.int32(0), lengths, rope
        )
        pos = out[:, cond.shape[1]:, :]  # audio positions
        logits = model.apply_heads(p, pos)  # [2, K, T', V]
        c, u = jnp.split(logits, 2, axis=0)
        logits = u + (c - u) * 2.0
        V = logits.shape[-1]
        mask = jnp.arange(V)[None, None, None, :] >= model.config.head_vocab_size
        logits = jnp.where(mask, -1e30, logits)
        return jax.nn.softmax(logits[0], axis=-1)  # [K, T', V]

    p_ref = np.asarray(jax.device_get(probs_along(params, delayed)))
    p_q = np.asarray(jax.device_get(probs_along(qp, delayed)))
    tv = 0.5 * np.abs(p_ref - p_q).sum(-1)  # [K, T']

    # Margin-weighted top-8 overlap: how much of the ref's candidate set
    # survives quantization, counted where the ref actually has an
    # opinion (top-1 minus top-2 probability as the weight).
    TOPK = 8
    top_ref = np.argsort(-p_ref, axis=-1)[..., :TOPK]  # [K, T', 8]
    top_q = np.argsort(-p_q, axis=-1)[..., :TOPK]
    overlap = np.array([
        [len(np.intersect1d(top_ref[k, t], top_q[k, t])) / TOPK
         for t in range(top_ref.shape[1])]
        for k in range(top_ref.shape[0])
    ])  # [K, T']
    sorted_ref = -np.sort(-p_ref, axis=-1)
    margin = sorted_ref[..., 0] - sorted_ref[..., 1]  # [K, T']
    wsum = margin.sum()
    weighted_overlap = float((overlap * margin).sum() / max(wsum, 1e-9))

    print(json.dumps({
        "mode": mode, "steps": steps,
        "topk_overlap_margin_weighted": round(weighted_overlap, 4),
        "tv_distance_mean": round(float(tv.mean()), 4),
        "tv_distance_p95": round(float(np.quantile(tv, 0.95)), 4),
        "tv_distance_max": round(float(tv.max()), 4),
    }), flush=True)
