"""Real-model pipeline parallelism (VERDICT.md round 1, missing #3): the
actual Zonos transformer backbone staged over a pipe>=2 spoofed mesh must
reproduce the single-device engine's codes exactly — per-stage KV caches,
ppermute hidden handoff, microbatched tick schedule, and composition with
data parallelism."""

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
from zonos_vibes_tpu.parallel.engine import PipelineEngine
from zonos_vibes_tpu.parallel.pp_backbone import pp_zonos_param_specs

TINY = ZonosConfig(
    backbone=BackboneConfig(
        d_model=64, n_layer=4, attn_mlp_d_intermediate=128,
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


@pytest.mark.parametrize("mesh_cfg,n_micro", [
    (MeshConfig(data=1, model=1, pipe=2), 1),   # stage-sequential
    (MeshConfig(data=1, model=1, pipe=2), 2),   # microbatched ticks
    (MeshConfig(data=1, model=1, pipe=4), 1),   # one layer per stage
    (MeshConfig(data=1, model=1, pipe=4), 4),   # deep pipeline, full overlap
    (MeshConfig(data=2, model=1, pipe=2), 2),   # pipe x data composition
])
def test_pp_generate_matches_single_device(setup, mesh_cfg, n_micro):
    model, params, cond = setup
    kwargs = dict(
        key=jax.random.key(7), max_new_tokens=4,
        sampling_params=SamplingParams(temperature=0.0),
    )
    ref = DecodeEngine(model).generate(params, cond, **kwargs)
    pp = PipelineEngine(model, mesh_cfg, params, n_micro=n_micro)
    par = pp.generate(cond, **kwargs)
    np.testing.assert_array_equal(np.asarray(ref.codes), np.asarray(par.codes))
    assert int(ref.valid_length) == int(par.valid_length)


def test_pp_stochastic_sampling_matches(setup):
    """Same PRNG keys through the pipelined program: sampled (not greedy)
    codes must match the single-device run exactly."""
    model, params, cond = setup
    kwargs = dict(
        key=jax.random.key(11), max_new_tokens=5,
        sampling_params=SamplingParams(min_p=0.1),
    )
    ref = DecodeEngine(model).generate(params, cond, **kwargs)
    pp = PipelineEngine(model, MeshConfig(data=1, model=1, pipe=2), params,
                        n_micro=2)
    par = pp.generate(cond, **kwargs)
    np.testing.assert_array_equal(np.asarray(ref.codes), np.asarray(par.codes))


def test_pp_param_specs_cover_tree(setup):
    model, params, _ = setup
    specs = pp_zonos_param_specs(params)
    jax.tree.map(lambda a, b: None, params, specs)  # structure must match


def test_pp_requires_pipe_axis(setup):
    model, params, _ = setup
    with pytest.raises(ValueError):
        PipelineEngine(model, MeshConfig(data=2, model=1, pipe=1), params)


def test_pp_kv_cache_is_stage_sharded(setup):
    """Each pipe rank owns exactly its own layers' KV shard."""
    from zonos_vibes_tpu.parallel.pp_backbone import (
        PipelinedTransformerBackbone,
    )
    from zonos_vibes_tpu.parallel.sharding import make_mesh

    mesh = make_mesh(MeshConfig(data=1, model=1, pipe=4))
    bb = PipelinedTransformerBackbone(TINY.backbone, mesh)

    cache = jax.jit(lambda: bb.allocate_cache(2, 32, jnp.float32))()
    shard_shape = cache["k"].sharding.shard_shape(cache["k"].shape)
    assert shard_shape[0] == TINY.backbone.n_layer // 4
