"""Distributed-layer tests on the spoofed 8-device CPU mesh: DP/TP sharded
generation matches the single-device result; mesh/spec plumbing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zonos_vibes_tpu.config import (
    BackboneConfig,
    MeshConfig,
    PrefixConditionerConfig,
    ZonosConfig,
    _freeze,
)
from zonos_vibes_tpu.engine.generate import DecodeEngine
from zonos_vibes_tpu.models.zonos import ZonosModel
from zonos_vibes_tpu.ops.sampling import SamplingParams
from zonos_vibes_tpu.parallel.engine import ParallelEngine
from zonos_vibes_tpu.parallel.sharding import make_mesh, zonos_param_specs

TINY = ZonosConfig(
    backbone=BackboneConfig(
        d_model=64, n_layer=2, attn_mlp_d_intermediate=128,
        attn_cfg=_freeze({"num_heads": 8, "num_heads_kv": 4}),
    ),
    prefix_conditioner=PrefixConditionerConfig.from_dict(
        {"projection": "linear",
         "conditioners": [{"type": "EspeakPhonemeConditioner", "name": "espeak"}]}
    ),
)


@pytest.fixture(scope="module")
def setup():
    model = ZonosModel(TINY)
    params = model.init(jax.random.key(0), jnp.float32)
    phonemes = jnp.tile(jnp.asarray([[2, 10, 20, 30, 3]]), (4, 1))
    cond = model.prepare_conditioning(params, {"espeak": phonemes})  # [8, 5, 64]
    return model, params, cond


def test_mesh_construction():
    assert jax.device_count() >= 8
    mesh = make_mesh(MeshConfig(data=2, model=4))
    assert mesh.shape == {"data": 2, "model": 4, "pipe": 1, "expert": 1}


def test_param_specs_cover_tree(setup):
    model, params, _ = setup
    specs = zonos_param_specs(params)
    # Tree structure must match exactly.
    jax.tree.map(lambda a, b: None, params, specs)


@pytest.mark.parametrize("mesh_cfg", [
    MeshConfig(data=8, model=1),
    MeshConfig(data=2, model=4),
    MeshConfig(data=1, model=4),
])
def test_sharded_generate_matches_single_device(setup, mesh_cfg):
    model, params, cond = setup
    kwargs = dict(
        key=jax.random.key(7), max_new_tokens=4,
        sampling_params=SamplingParams(temperature=0.0),
    )
    ref = DecodeEngine(model).generate(params, cond, **kwargs)
    par = ParallelEngine(model, mesh_cfg, params).generate(cond, **kwargs)
    np.testing.assert_array_equal(np.asarray(ref.codes), np.asarray(par.codes))
    assert int(ref.valid_length) == int(par.valid_length)


TINY_HYBRID = ZonosConfig(
    backbone=BackboneConfig(
        d_model=64, n_layer=3, d_intermediate=0,
        attn_mlp_d_intermediate=96, attn_layer_idx=(1,),
        ssm_cfg=_freeze({"layer": "Mamba2", "d_state": 16, "headdim": 16,
                         "chunk_size": 8}),
        attn_cfg=_freeze({"num_heads": 4, "num_heads_kv": 2,
                          "rotary_emb_dim": 8}),
        rms_norm=True, residual_in_fp32=True,
    ),
    prefix_conditioner=PrefixConditionerConfig.from_dict(
        {"projection": "linear",
         "conditioners": [{"type": "EspeakPhonemeConditioner", "name": "espeak"}]}
    ),
)


@pytest.mark.parametrize("mesh_cfg", [
    MeshConfig(data=4, model=2),
    MeshConfig(data=1, model=4),
])
def test_hybrid_sharded_generate_matches_single_device(mesh_cfg):
    """BASELINE config 5 serving shape: the hybrid (Mamba-2 + attention)
    backbone sharded DP/TP must reproduce single-device output exactly."""
    model = ZonosModel(TINY_HYBRID)
    params = model.init(jax.random.key(3), jnp.float32)
    phonemes = jnp.tile(jnp.asarray([[2, 10, 20, 30, 3]]), (4, 1))
    cond = model.prepare_conditioning(params, {"espeak": phonemes})
    kwargs = dict(
        key=jax.random.key(7), max_new_tokens=4,
        sampling_params=SamplingParams(temperature=0.0),
    )
    ref = DecodeEngine(model).generate(params, cond, **kwargs)
    par = ParallelEngine(model, mesh_cfg, params).generate(cond, **kwargs)
    np.testing.assert_array_equal(np.asarray(ref.codes), np.asarray(par.codes))


def test_hybrid_param_specs_cover_tree():
    model = ZonosModel(TINY_HYBRID)
    params = model.init(jax.random.key(3), jnp.float32)
    specs = zonos_param_specs(params)
    jax.tree.map(lambda a, b: None, params, specs)  # structure must match


def test_multilingual_heterogeneous_batch(setup):
    """BASELINE config 4 shape: batched decode with left-padded
    heterogeneous-length phoneme prefixes."""
    model, params, _ = setup
    rows = [
        [2, 10, 20, 30, 40, 50, 3],          # long
        [0, 0, 0, 0, 2, 11, 3],              # short, LEFT-padded
        [0, 0, 2, 12, 22, 32, 3],
        [0, 2, 13, 23, 33, 43, 3],
    ]
    cond = model.prepare_conditioning(
        params, {"espeak": jnp.asarray(rows, jnp.int32)}
    )
    res = DecodeEngine(model).generate(
        params, cond, key=jax.random.key(1), max_new_tokens=5,
        sampling_params=SamplingParams(min_p=0.1),
    )
    assert res.codes.shape == (4, 9, 5)
    codes = np.asarray(res.codes)
    assert codes.min() >= 0 and codes.max() < 1024


@pytest.mark.parametrize("cfg_name", ["transformer", "hybrid"])
def test_sharded_generate_grouped_int4_matches_single_device(cfg_name):
    """Grouped-scale int4 (ops/quant, round 4) under TP: the G-batched dot
    + per-group post-dot rescale + group-sum must survive shard_map with
    the contraction sharded on the GROUP axis (partial sums within a
    group commute with the scale) — sharded generation matches the
    single-device grouped-int4 engine exactly."""
    from zonos_vibes_tpu.ops.quant import quantize_zonos_params

    cfg = TINY if cfg_name == "transformer" else TINY_HYBRID
    model = ZonosModel(cfg)
    params = model.init(jax.random.key(0), jnp.float32)
    qparams = quantize_zonos_params(params, bits=4, int4_group=32)
    phonemes = jnp.asarray([[2, 10, 20, 30, 3]])
    cond = model.prepare_conditioning(qparams, {"espeak": phonemes})
    kwargs = dict(
        key=jax.random.key(7), max_new_tokens=4,
        sampling_params=SamplingParams(temperature=0.0),
    )
    ref = DecodeEngine(model).generate(qparams, cond, **kwargs)
    par = ParallelEngine(model, MeshConfig(data=1, model=4), qparams).generate(
        cond, **kwargs)
    np.testing.assert_array_equal(np.asarray(ref.codes), np.asarray(par.codes))
    assert int(ref.valid_length) == int(par.valid_length)
