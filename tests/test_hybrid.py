"""Hybrid (Mamba-2 + attention) backbone tests: prefill/decode consistency
and end-to-end generation through the decode engine."""

import jax
import jax.numpy as jnp
import numpy as np

from zonos_vibes_tpu.config import (
    BackboneConfig,
    PrefixConditionerConfig,
    ZonosConfig,
    _freeze,
)
from zonos_vibes_tpu.engine.generate import DecodeEngine
from zonos_vibes_tpu.models.mamba_backbone import HybridBackbone
from zonos_vibes_tpu.models.zonos import ZonosModel
from zonos_vibes_tpu.ops.sampling import SamplingParams

HYBRID_BB = BackboneConfig(
    d_model=64,
    n_layer=3,
    d_intermediate=0,
    attn_mlp_d_intermediate=96,
    attn_layer_idx=(1,),
    ssm_cfg=_freeze({"layer": "Mamba2", "d_state": 16, "headdim": 16,
                     "chunk_size": 8}),
    attn_cfg=_freeze({"num_heads": 4, "num_heads_kv": 2, "rotary_emb_dim": 8}),
    rms_norm=True,
    residual_in_fp32=True,
)

TINY_HYBRID = ZonosConfig(
    backbone=HYBRID_BB,
    prefix_conditioner=PrefixConditionerConfig.from_dict(
        {"projection": "linear",
         "conditioners": [{"type": "EspeakPhonemeConditioner", "name": "espeak"}]}
    ),
)


def test_config_routing():
    model = ZonosModel(TINY_HYBRID)
    assert isinstance(model.backbone, HybridBackbone)
    assert TINY_HYBRID.backbone.is_hybrid


def test_prefill_then_decode_matches_full_prefill():
    bb = HybridBackbone(HYBRID_BB)
    params = bb.init(jax.random.key(0), jnp.float32)
    B, S, D = 2, 12, 64
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, S, D)).astype(np.float32) * 0.3
    )
    cache = bb.allocate_cache(B, 32, jnp.float32)
    lengths0 = jnp.zeros((B,), jnp.int32)

    full, _ = bb.forward(params, x, cache, jnp.int32(0), lengths0)

    pre, c = bb.forward(params, x[:, :9], cache, jnp.int32(0), lengths0)
    outs = [pre]
    for t in range(9, S):
        y, c = bb.forward(
            params, x[:, t : t + 1], c, jnp.int32(t),
            jnp.full((B,), t, jnp.int32),
        )
        outs.append(y)
    stitched = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(
        np.asarray(stitched), np.asarray(full), rtol=2e-3, atol=2e-3
    )


def test_hybrid_generate_end_to_end():
    model = ZonosModel(TINY_HYBRID)
    params = model.init(jax.random.key(1), jnp.float32)
    cond = model.prepare_conditioning(
        params, {"espeak": jnp.asarray([[2, 11, 21, 3]])}
    )
    engine = DecodeEngine(model)
    res = engine.generate(
        params, cond, key=jax.random.key(2), max_new_tokens=6,
        sampling_params=SamplingParams(temperature=0.0),
    )
    assert res.codes.shape == (1, 9, 6)
    assert int(res.valid_length) == 6
    codes = np.asarray(res.codes)
    assert codes.min() >= 0 and codes.max() < 1024

    # Determinism.
    res2 = engine.generate(
        params, cond, key=jax.random.key(99), max_new_tokens=6,
        sampling_params=SamplingParams(temperature=0.0),
    )
    np.testing.assert_array_equal(codes, np.asarray(res2.codes))


def test_stacked_carry_run_scan_matches_default_path(monkeypatch):
    """The fused-eligible decode run scan (stacked SSM state on the scan
    CARRY, aliased layer-indexed kernel — the pool-serving path) matches
    the default XLA-chain scan bit-for-bit-close on a multi-layer run."""
    import functools

    import zonos_vibes_tpu.models.mamba_backbone as mb
    from zonos_vibes_tpu.ops.pallas import mamba_step as ms

    bb_cfg = BackboneConfig(
        d_model=64,
        n_layer=4,
        d_intermediate=0,
        attn_mlp_d_intermediate=96,
        attn_layer_idx=(2,),  # runs: [0, 1], attn 2, [3]
        ssm_cfg=_freeze({"layer": "Mamba2", "d_state": 16, "headdim": 16,
                         "chunk_size": 8}),
        attn_cfg=_freeze({"num_heads": 4, "num_heads_kv": 2,
                          "rotary_emb_dim": 8}),
        rms_norm=True,
        residual_in_fp32=True,
    )
    bb = HybridBackbone(bb_cfg)
    params = bb.init(jax.random.key(0), jnp.float32)
    B, S = 8, 6
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((B, S, 64)).astype(np.float32) * 0.3)
    cache = bb.allocate_cache(B, 32, jnp.float32)
    lengths0 = jnp.zeros((B,), jnp.int32)
    _, c0 = bb.forward(params, x, cache, jnp.int32(0), lengths0)

    step = jnp.asarray(rng.standard_normal((B, 1, 64)).astype(np.float32) * 0.3)
    y_ref, c_ref = bb.forward(
        params, step, c0, jnp.int32(S), jnp.full((B,), S, jnp.int32)
    )

    monkeypatch.setattr(mb, "_fused_step_eligible", lambda s, b: True)
    monkeypatch.setattr(
        ms, "ssd_gate_step_layered_pallas",
        functools.partial(ms.ssd_gate_step_layered_pallas, interpret=True),
    )
    monkeypatch.setattr(
        mb, "ssd_gate_step_pallas",
        functools.partial(ms.ssd_gate_step_pallas, interpret=True),
    )
    y_new, c_new = bb.forward(
        params, step, c0, jnp.int32(S), jnp.full((B,), S, jnp.int32)
    )
    np.testing.assert_allclose(
        np.asarray(y_new), np.asarray(y_ref), rtol=2e-5, atol=2e-5
    )
    for r in range(len(c_ref["runs"])):
        np.testing.assert_allclose(
            np.asarray(c_new["runs"][r]["ssm"]),
            np.asarray(c_ref["runs"][r]["ssm"]), rtol=2e-5, atol=2e-5,
        )
        np.testing.assert_allclose(
            np.asarray(c_new["runs"][r]["conv"]),
            np.asarray(c_ref["runs"][r]["conv"]), rtol=2e-5, atol=2e-5,
        )
