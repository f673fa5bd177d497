"""Pooled (continuous-batching) decode throughput at flagship scale.

S requests join the pool at STAGGERED positions — the scenario the pool
exists for (simultaneous arrivals use group batching instead). Usage:
    python bench/pool_bench.py [slots] [int8] [hybrid] [kvint8] [statebf16]

Prints ONE JSON line in the BENCH_SUITE format (aggregate audio-s/s).
"""
import json
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp

from zonos_vibes_tpu.config import ZONOS_V01_HYBRID, ZONOS_V01_TRANSFORMER
from zonos_vibes_tpu.engine import pool as plib
from zonos_vibes_tpu.utils import enable_persistent_compilation_cache

enable_persistent_compilation_cache()
from zonos_vibes_tpu.models.zonos import ZonosModel
from zonos_vibes_tpu.ops.sampling import SamplingParams

S = int(sys.argv[1]) if len(sys.argv) > 1 else 8
hybrid = "hybrid" in sys.argv
model = ZonosModel(ZONOS_V01_HYBRID if hybrid else ZONOS_V01_TRANSFORMER)
params = model.init(jax.random.key(0))
if "int8" in sys.argv:
    from zonos_vibes_tpu.ops.quant import quantize_zonos_params
    params = quantize_zonos_params(params)
kv_int8 = "kvint8" in sys.argv and not hybrid
state_bf16 = "statebf16" in sys.argv and hybrid
PC = plib.PoolConfig(slots=S, max_cond_len=64, max_new_tokens=2580)
SP = SamplingParams(min_p=0.1)
pool = plib.make_pool(model, PC, kv_int8=kv_int8, state_bf16=state_bf16)

phon = jnp.asarray([[2] + [40] * 58 + [3]])
cond = model.prepare_conditioning(params, {"espeak": phon})
# Staggered joins: advance a few steps between each join (disable_eos not
# plumbed; rows sample freely — row EOS may stop early, fine for timing).
for slot in range(S):
    req, knobs = plib.prefill_request(model, params, cond,
                                      jax.random.key(slot), 2580, 2.0, SP,
                                      kv_int8=kv_int8, state_bf16=state_bf16)
    pool = plib.join(pool, req, slot, cond.shape[1], slot, knobs)
    pool = plib.pool_steps_jit(model, params, pool, jax.random.key(9), 3,
                               sorted_sampler=False)
jax.device_get(pool["pos"])
if "deep" in sys.argv:
    # Late-generation operating point: bump every row's position by ~20 s
    # of audio WITHOUT decoding there (the skipped cache region holds
    # zeros — dequantizing zero scales/values is well-defined — so step
    # timing sees exactly the deep-cache HBM traffic). This is where the
    # pooled KV read rivals the weight read and int8 KV pays off.
    DEPTH = 1720
    pool = {**pool,
            "pos": pool["pos"] + DEPTH,
            "step": pool["step"] + DEPTH,
            "flush_base": pool["flush_base"] + DEPTH}
# Warm the timed program (n_steps is static).
pool = plib.pool_steps_jit(model, params, pool, jax.random.key(9), 86,
                           sorted_sampler=False)
jax.device_get(pool["pos"])

t0 = time.perf_counter()
pool = plib.pool_steps_jit(model, params, pool, jax.random.key(10), 86,
                           sorted_sampler=False)
jax.device_get(pool["pos"])
el = time.perf_counter() - t0
ms = el / 86 * 1000
agg = S / 86.1328 / (el / 86)
mode = ("_hybrid" if hybrid else "") + ("_int8" if "int8" in sys.argv else "") \
    + ("_kvint8" if kv_int8 else "") + ("_statebf16" if state_bf16 else "") \
    + ("_deep" if "deep" in sys.argv else "")
print(json.dumps({
    "metric": f"aggregate_rtf_pooled{S}_staggered{mode}",
    "value": round(agg, 4),
    "unit": "audio_s_per_s",
    "vs_baseline": round(agg / 2.0, 4),
    "ms_per_step": round(ms, 2),
}))
