"""Weight-only int8 quantization for the decode hot path.

Single-stream decode is weight-bandwidth-bound (~3.2 GB of bf16 parameter
reads per step at flagship scale — docs/KERNELS.md): storing the backbone
projections as int8 + per-output-channel scales halves the HBM traffic the
roofline is made of. The dequant (int8 -> bf16 convert + scale multiply)
fuses into the matmul's operand read on TPU — weights cross HBM as int8.

Scheme: symmetric per-output-channel absmax (`w_q = round(w / s)`,
`s = absmax(col) / 127`), the standard weight-only recipe; activations stay
bf16, accumulation fp32 via the usual dot. Quality impact of weight-only
int8 at this scale is well below the bf16 noise floor of the sampler.

Layout: a quantized projection leaf is ``{"weight_int8": [.., in, out] i8,
"scale": [.., 1, out] f32}`` — same tree positions as the bf16 ``weight``
leaves, so partition specs keep working (the contraction layouts are
unchanged).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_weight(w: jnp.ndarray) -> dict:
    """``[..., in, out]`` float -> int8 + per-out-channel scale (fp32).
    Leading axes (e.g. the stacked-layer axis) are preserved. Quantization
    math runs HOST-side (numpy): it is one-time load work, and doing it on
    device would spike HBM with fp32 copies of multi-GB stacked tensors."""
    import numpy as np

    w32 = np.asarray(jax.device_get(w), np.float32)
    absmax = np.max(np.abs(w32), axis=-2, keepdims=True)  # [..., 1, out]
    scale = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.round(w32 / scale), -127, 127).astype(np.int8)
    return {"weight_int8": jnp.asarray(q), "scale": jnp.asarray(scale)}


def proj_matmul(x: jnp.ndarray, p: dict) -> jnp.ndarray:
    """``x @ W`` for either a bf16 leaf ``{"weight"}`` or a quantized leaf
    ``{"weight_int8", "scale"}``. Dequant is expressed so XLA fuses the
    int8->activation-dtype convert into the dot's operand read."""
    if "weight_int8" in p:
        w = p["weight_int8"].astype(x.dtype)
        y = x @ w
        return y * p["scale"].astype(y.dtype)
    return x @ p["weight"]


_QUANT_KEYS = ("in_proj", "out_proj", "fc1", "fc2")


def quantize_backbone_params(backbone_params: dict) -> dict:
    """Quantize the transformer backbone's projection weights in place-like
    fashion (returns a new tree; norms/embeddings untouched). Works on the
    stacked-layer tree (models/backbone.init_transformer_backbone) and the
    hybrid per-layer list (models/mamba_backbone.init)."""
    def quantize_layer(layer: dict) -> dict:
        out = dict(layer)
        for k in _QUANT_KEYS:
            if k in layer and "weight" in layer[k]:
                out[k] = quantize_weight(layer[k]["weight"])
        return out

    out = dict(backbone_params)
    layers = backbone_params["layers"]
    if isinstance(layers, (list, tuple)):
        out["layers"] = [quantize_layer(l) for l in layers]
    else:
        out["layers"] = quantize_layer(layers)
    return out


def quantize_zonos_params(params: dict, heads: bool = True,
                          embeddings: bool = False) -> dict:
    """Full-model variant: backbone projections int8; conditioners stay
    bf16 (negligible bytes).

    ``heads`` (int8 phase 2): the 9 output heads are ``K x D x 1152`` —
    ~2% of the remaining per-step HBM traffic once the backbone is int8;
    per-out-channel scales apply to the fp32 logits after the einsum.

    ``embeddings`` (off by default): the decode step GATHERS K rows
    (~36 KB/step at flagship scale), so int8 tables buy memory footprint,
    not bandwidth — supported for completeness. A zero-size ``act_dtype``
    marker preserves the activation dtype the bf16 table produced."""
    out = dict(params)
    out["backbone"] = quantize_backbone_params(params["backbone"])
    if heads and "weight" in params["heads"]:
        out["heads"] = quantize_weight(params["heads"]["weight"])
    if embeddings and "weight" in params["embeddings"]:
        w = params["embeddings"]["weight"]  # [K, V, D]
        q = quantize_weight(w)  # scale [K, 1, D] (per-channel over V rows)
        q["act_dtype"] = jnp.zeros((), w.dtype)
        out["embeddings"] = q
    return out


def dequantize_weight(p: dict, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Materialize the bf16 weight (tests / fallback paths)."""
    return (p["weight_int8"].astype(jnp.float32) * p["scale"]).astype(dtype)


def quantize_kv(x: jnp.ndarray, dh_axis: int):
    """Symmetric per-(token, head) int8 for KV cache columns: absmax over
    the head_dim axis (traced, device-side — runs inside the decode
    program at stage-flush/prefill-splice time, amortized over the staged
    tokens). Returns ``(int8 values, f32 scales with dh_axis squeezed)``."""
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=dh_axis, keepdims=True)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, jnp.squeeze(scale, axis=dh_axis)
