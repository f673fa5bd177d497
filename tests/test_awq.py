"""AWQ activation-aware fc2 fold (ops/quant.awq_fold, VERDICT r4 #2).

The fold rescales fc2 contraction rows by per-channel activation RMS and
compensates exactly in fc1's y-half output columns — an exact-math
identity on the block output (proved here in fp64), with the fc1 side
absorbed by its per-out-channel quantization scales. The alpha grid
includes 0 (no fold), so the weighted fc2 quantization error can only
improve over plain RTN; also pinned here on a skewed-energy synthetic.

Reference semantics unchanged: quantization is a TPU-serving addition
(the torch reference runs bf16 only); sampling distributions measured by
tools/quality_quant.py are the parity yardstick.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zonos_vibes_tpu.config import (
    ZONOS_V01_TRANSFORMER,
    BackboneConfig,
    _freeze,
)
from zonos_vibes_tpu.models.zonos import ZonosModel
from zonos_vibes_tpu.ops.quant import _rtn_groupquant, awq_fold

TINY = dataclasses.replace(
    ZONOS_V01_TRANSFORMER,
    backbone=BackboneConfig(
        d_model=64,
        n_layer=3,
        attn_mlp_d_intermediate=256,
        attn_cfg=_freeze({"num_heads": 4, "num_heads_kv": 2}),
    ),
)


def _forward(model, params, cond, rope, delayed, capture=False):
    emb = model.embed_codes(params, delayed)
    emb = jnp.concatenate([emb, emb], axis=0)
    hidden = jnp.concatenate([cond.astype(emb.dtype), emb], axis=1)
    T = hidden.shape[1]
    cache = model.allocate_cache(2, ((T + 7) // 8) * 8, cond.dtype)
    lengths = jnp.zeros((2,), jnp.int32)
    return model.backbone_forward(
        params, hidden, cache, jnp.int32(0), lengths, rope,
        capture_fc2=capture,
    )


def test_capture_fc2_shape_and_noninterference():
    """capture_fc2=True returns [L, F] energies and does NOT perturb the
    forward result vs the plain path."""
    from zonos_vibes_tpu.ops.rope import expand_rope_table, rope_table

    model = ZonosModel(TINY)
    params = model.init(jax.random.key(0), dtype=jnp.float32)
    cond = model.prepare_conditioning(
        params, {"espeak": jnp.asarray([[2] + [40] * 10 + [3]])}
    )
    rope = expand_rope_table(rope_table(TINY.backbone.head_dim))
    delayed = jnp.zeros((1, TINY.num_codebooks, 20), jnp.int32)
    out0, _ = _forward(model, params, cond, rope, delayed)
    out1, _, e = _forward(model, params, cond, rope, delayed, capture=True)
    assert e.shape == (3, 256)
    assert bool(jnp.all(e >= 0))
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1))


def test_awq_fold_is_exact_identity_fp64():
    """In fp64 the folded (unquantized) backbone is BIT-exact with the
    unfolded one — the rescale is an exact-math identity, so all quality
    impact comes from where the int4 grid lands, never from the fold."""
    from zonos_vibes_tpu.ops.rope import expand_rope_table, rope_table

    jax.config.update("jax_enable_x64", True)
    try:
        model = ZonosModel(TINY)
        params = model.init(jax.random.key(0), dtype=jnp.float64)
        cond = model.prepare_conditioning(
            params, {"espeak": jnp.asarray([[2] + [40] * 10 + [3]])}
        )
        rope = expand_rope_table(
            rope_table(TINY.backbone.head_dim)
        ).astype(jnp.float64)
        delayed = jnp.zeros((1, TINY.num_codebooks, 20), jnp.int32)
        out0, _, e = _forward(model, params, cond, rope, delayed, capture=True)
        folded = awq_fold(
            params["backbone"]["layers"], e, group_size=64, alphas=(0.7,)
        )
        # Re-widen the fp32-stored fold exactly: recompute in fp64 from the
        # effective per-channel scale so the comparison isolates the MATH.
        f64 = dict(params["backbone"]["layers"])
        w1o = np.asarray(params["backbone"]["layers"]["fc1"]["weight"])
        w2o = np.asarray(params["backbone"]["layers"]["fc2"]["weight"])
        w2f = np.asarray(folded["fc2"]["weight"], np.float64)
        ref_col = np.where(w2o[..., :1] == 0, 1.0, w2o[..., :1])
        s = (w2f[..., :1] / ref_col)[..., 0]  # [L, F] effective scales
        w1n = np.array(w1o)
        w1n[..., :, : w2o.shape[1]] = w1o[..., :, : w2o.shape[1]] / s[:, None, :]
        f64["fc1"] = {"weight": jnp.asarray(w1n)}
        f64["fc2"] = {"weight": jnp.asarray(w2o * s[..., None])}
        p2 = dict(params)
        p2["backbone"] = dict(params["backbone"])
        p2["backbone"]["layers"] = f64
        out1, _ = _forward(model, p2, cond, rope, delayed)
        np.testing.assert_array_equal(np.asarray(out0), np.asarray(out1))
    finally:
        jax.config.update("jax_enable_x64", False)


def test_awq_search_improves_weighted_error():
    """On a skewed-energy synthetic, the alpha search strictly reduces the
    energy-weighted fc2 dequant error vs plain RTN (alpha=0 is in the
    grid, so it can never be worse)."""
    rng = np.random.default_rng(0)
    F, D = 256, 64
    w2 = rng.standard_normal((F, D)).astype(np.float32)
    energy = (rng.uniform(0.1, 10, size=F) ** 2).astype(np.float64)

    def weighted_err(w2_eff, s):
        q, sc = _rtn_groupquant(w2_eff, 7.0, 64, clip_search=True)
        dq = (q * sc).reshape(F, D)
        return float(
            (((dq / s[:, None] - w2) ** 2).sum(axis=1) * energy).sum()
        )

    err_rtn = weighted_err(w2, np.ones(F, np.float32))
    layers = {
        "fc1": {"weight": np.zeros((1, 8, 2 * F), np.float32)},
        "fc2": {"weight": w2[None]},
    }
    folded = awq_fold(layers, energy[None], group_size=64)
    w2f = np.asarray(folded["fc2"]["weight"][0])
    s = w2f[:, 0] / np.where(w2[:, 0] == 0, 1.0, w2[:, 0])
    err_awq = weighted_err(w2f, s.astype(np.float32))
    assert err_awq <= err_rtn + 1e-6
    assert not np.allclose(s, 1.0)  # skewed energies pick a real fold


def test_quantize_backbone_awq_smoke():
    """awq_energy plumbs through quantize_backbone_params on a stacked
    tree and produces the standard grouped-int4 leaf layout."""
    from zonos_vibes_tpu.ops.quant import quantize_backbone_params

    model = ZonosModel(TINY)
    params = model.init(jax.random.key(0), dtype=jnp.float32)
    e = np.abs(np.random.default_rng(1).standard_normal((3, 256))) + 0.1
    qp = quantize_backbone_params(
        params["backbone"], bits=8, mlp_bits=4, int4_group=64,
        fake=True, awq_energy=e,
    )
    assert "weight" in qp["layers"]["fc2"]  # fake path: dequantized leaf
    assert qp["layers"]["fc2"]["weight"].shape == (3, 256, 64)

    # Fake leaves must come back in the ACTIVATION dtype even though the
    # fold re-stores fc1/fc2 as fp32 intermediates — a f32 leaf would
    # promote the residual stream and break the decode scan carry dtype.
    params16 = model.init(jax.random.key(0), dtype=jnp.bfloat16)
    qp16 = quantize_backbone_params(
        params16["backbone"], bits=8, mlp_bits=4, int4_group=64,
        fake=True, awq_energy=e,
    )
    assert qp16["layers"]["fc2"]["weight"].dtype == jnp.bfloat16
    assert qp16["layers"]["fc1"]["weight"].dtype == jnp.bfloat16
