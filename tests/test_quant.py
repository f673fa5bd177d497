"""Int8 weight-only quantization: round-trip accuracy, quant-aware matmul,
end-to-end generation on both backbones, and sharded-spec coverage."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zonos_vibes_tpu.engine.generate import DecodeEngine
from zonos_vibes_tpu.models.zonos import ZonosModel
from zonos_vibes_tpu.ops.quant import (
    dequantize_weight,
    proj_matmul,
    quantize_weight,
    quantize_zonos_params,
)
from zonos_vibes_tpu.ops.sampling import SamplingParams
from tests.test_engine import TINY
from tests.test_parallel import TINY_HYBRID


def test_quantize_roundtrip_error():
    w = jnp.asarray(
        np.random.default_rng(0).standard_normal((64, 128)).astype(np.float32)
    )
    q = quantize_weight(w)
    assert q["weight_int8"].dtype == jnp.int8
    assert q["scale"].shape == (1, 128)
    back = dequantize_weight(q, jnp.float32)
    # Symmetric absmax int8: max error is scale/2 = absmax/254 per column.
    col_absmax = np.abs(np.asarray(w)).max(axis=0)
    err = np.abs(np.asarray(back) - np.asarray(w))
    assert (err <= col_absmax[None, :] / 254 + 1e-6).all()


def test_proj_matmul_both_formats():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 64)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32))
    dense = proj_matmul(x, {"weight": w})
    quant = proj_matmul(x, quantize_weight(w))
    np.testing.assert_allclose(
        np.asarray(quant), np.asarray(dense), rtol=0.05, atol=0.05
    )


@pytest.mark.parametrize("cfg", [TINY, TINY_HYBRID], ids=["transformer", "hybrid"])
def test_quantized_generation(cfg):
    model = ZonosModel(cfg)
    params = model.init(jax.random.key(0), jnp.float32)
    cond = model.prepare_conditioning(
        params, {"espeak": jnp.asarray([[2, 10, 20, 30, 3]])}
    )
    engine = DecodeEngine(model)
    kwargs = dict(
        key=jax.random.key(7), max_new_tokens=6,
        sampling_params=SamplingParams(temperature=0.0), disable_eos=True,
    )
    ref = engine.generate(params, cond, **kwargs)
    qparams = quantize_zonos_params(params)
    qres = engine.generate(qparams, cond, **kwargs)
    # Weight-only int8 on a random-init tiny model: shapes/validity hold and
    # most greedy tokens survive the quantization noise.
    assert qres.codes.shape == ref.codes.shape
    assert int(qres.valid_length) == int(ref.valid_length)
    agree = (np.asarray(qres.codes) == np.asarray(ref.codes)).mean()
    assert agree > 0.5, f"token agreement {agree:.2f}"


def test_quantized_params_shard():
    from zonos_vibes_tpu.config import MeshConfig
    from zonos_vibes_tpu.parallel.sharding import (
        make_mesh, shard_pytree, zonos_param_specs,
    )

    for cfg in (TINY, TINY_HYBRID):
        model = ZonosModel(cfg)
        qparams = quantize_zonos_params(model.init(jax.random.key(0), jnp.float32))
        specs = zonos_param_specs(qparams)
        jax.tree.map(lambda a, b: None, qparams, specs)  # structures match
        mesh = make_mesh(MeshConfig(data=2, model=4))
        shard_pytree(qparams, specs, mesh)
