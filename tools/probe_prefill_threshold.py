"""Probe: Pallas flash-prefill vs XLA dense prefill at small chunk lengths,
flagship attention shapes (B=2 CFG, Hq=32, Hkv=8, D=64). Informs the
``_PALLAS_PREFILL_MIN_S`` dispatch threshold in ops/attention.py (the pool
admission path prefills solo at conditioning lengths ~64-300, below the
old 512 gate). Prints one JSON line per (S, T) with both timings.

Usage: python tools/probe_prefill_threshold.py [reps]
"""
import json
import sys, time
sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from zonos_vibes_tpu.ops.attention import prefill_attention
from zonos_vibes_tpu.ops.pallas.prefill_attention import prefill_attention_pallas

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 30
B, Hq, Hkv, D = 2, 32, 8, 64
key = jax.random.key(0)

dense = jax.jit(prefill_attention, static_argnames=("chunk_len",))
kernel = jax.jit(prefill_attention_pallas)


def bench(fn, *args, **kw):
    out = fn(*args, **kw)
    jax.device_get(out)  # tunnel-safe barrier (CLAUDE.md)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args, **kw)
    jax.device_get(out)
    return (time.perf_counter() - t0) / REPS * 1e3


for T in (1024, 3072):
    for S in (64, 128, 256, 384, 512):
        if S > T:
            continue
        q = jax.random.normal(key, (B, S, Hq, D), jnp.bfloat16)
        kc = jax.random.normal(key, (B, Hkv, D, T), jnp.bfloat16)
        vc = jax.random.normal(key, (B, Hkv, D, T), jnp.bfloat16)
        off = jnp.asarray(T - S - 8, jnp.int32)
        d_ms = bench(dense, q, kc, vc, off, chunk_len=S)
        k_ms = bench(kernel, q, kc, vc, off)
        print(json.dumps({"S": S, "T": T, "dense_ms": round(d_ms, 3),
                          "pallas_ms": round(k_ms, 3),
                          "speedup": round(d_ms / k_ms, 2)}))
