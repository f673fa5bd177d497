"""Probe: compile + run ONLY the quantized pooled-staged decode kernel at
flagship pool shapes (no engine, no while-loop). Separates Mosaic kernel
compile/runtime behavior from the full pooled program when diagnosing
slow compiles or hangs. Prints wall timings as JSON lines."""
import json
import sys, time
sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from zonos_vibes_tpu.config import ZONOS_V01_TRANSFORMER as CFG
from zonos_vibes_tpu.ops.pallas.decode_attention import (
    decode_attention_pallas_pooled_staged_q,
)

S = int(sys.argv[1]) if len(sys.argv) > 1 else 8
bb = CFG.backbone
L = bb.n_layer
Hq = bb.attn_cfg_dict["num_heads"]
Hkv = bb.attn_cfg_dict["num_heads_kv"]
D = bb.head_dim
B = 2 * S
T = 3072
STAGE = 128
print(json.dumps({"L": L, "B": B, "Hq": Hq, "Hkv": Hkv, "D": D, "T": T}))

key = jax.random.key(0)
q = jax.random.normal(key, (B, 1, Hq, D), jnp.bfloat16)
kc = jnp.zeros((L, B, Hkv, D, T), jnp.int8)
vc = jnp.zeros((L, B, Hkv, D, T), jnp.int8)
ks = jnp.ones((L, B, Hkv, T), jnp.float32)
vs = jnp.ones((L, B, Hkv, T), jnp.float32)
kst = jnp.zeros((L, B, STAGE, Hkv * D), jnp.bfloat16)
vst = jnp.zeros((L, B, STAGE, Hkv * D), jnp.bfloat16)
kcur = jax.random.normal(key, (B, Hkv, D, 1), jnp.bfloat16)
vcur = kcur
bases = jnp.full((B,), 1790, jnp.int32)
lens = jnp.full((B,), 5, jnp.int32)

t0 = time.perf_counter()
out = decode_attention_pallas_pooled_staged_q(
    q, kc, vc, ks, vs, kst, vst, kcur, vcur, bases, lens, jnp.int32(0)
)
jax.device_get(out)
print(json.dumps({"compile_plus_first_run_s": round(time.perf_counter() - t0, 2)}))

t0 = time.perf_counter()
N = 20
for i in range(N):
    out = decode_attention_pallas_pooled_staged_q(
        q, kc, vc, ks, vs, kst, vst, kcur, vcur, bases, lens, jnp.int32(i % L)
    )
jax.device_get(out)
el = (time.perf_counter() - t0) / N
print(json.dumps({"per_call_ms": round(el * 1000, 3)}))
