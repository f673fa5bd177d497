"""Batch scaling sweep: decode step time + aggregate audio-s/s at B=4/8/16.

Weights are read once per step regardless of batch (docs/KERNELS.md), so
aggregate throughput scales until per-row work dominates. Usage:
    python bench/batch_sweep.py [int8]
"""
import sys, time, json
sys.path.insert(0, ".")
import jax, jax.numpy as jnp

from zonos_vibes_tpu.config import ZONOS_V01_TRANSFORMER
from zonos_vibes_tpu.engine.generate import DecodeEngine
from zonos_vibes_tpu.models.zonos import ZonosModel
from zonos_vibes_tpu.ops.sampling import SamplingParams

use_int8 = "int8" in sys.argv
model = ZonosModel(ZONOS_V01_TRANSFORMER)
params = model.init(jax.random.key(0))
if use_int8:
    from zonos_vibes_tpu.ops.quant import quantize_zonos_params
    params = quantize_zonos_params(params)
engine = DecodeEngine(model)
for B in (4, 8, 16):
    phon = jnp.tile(jnp.asarray([[2] + [40] * 58 + [3]]), (B, 1))
    cond = model.prepare_conditioning(params, {"espeak": phon})
    kwargs = dict(max_new_tokens=86, cfg_scale=2.0,
                  sampling_params=SamplingParams(min_p=0.1), disable_eos=True)
    res = engine.generate(params, cond, key=jax.random.key(1), **kwargs)
    jax.device_get(res.codes)
    t0 = time.perf_counter()
    res = engine.generate(params, cond, key=jax.random.key(3), **kwargs)
    jax.device_get(res.codes)
    el = time.perf_counter() - t0
    ms = el / 86 * 1000
    agg = B / 86.1328 / (el / 86)
    print(json.dumps({"batch": B, "int8": use_int8,
                      "ms_per_step": round(ms, 2),
                      "aggregate_audio_s_per_s": round(agg, 2)}))
