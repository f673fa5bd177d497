"""Microbench: Pallas int8 weight-streaming matmul vs XLA's convert-fused
dot at the flagship decode shapes (B=2 CFG rows). The chain is a
lax.scan over STACKED weights [DEPTH, in, out] — the same structure as
the scan-stacked backbone — so one dispatch covers DEPTH matmuls and the
weight stream is real.

Usage: python tools/probe_qmm_kernel.py [iters] [shapes...]
"""
import sys, time
sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp
from zonos_vibes_tpu.utils import enable_persistent_compilation_cache
enable_persistent_compilation_cache()
from zonos_vibes_tpu.ops.pallas.qmm import qmm_int8_pallas
from zonos_vibes_tpu.ops.quant import quantize_weight

args = sys.argv[1:]
ITERS = int(args[0]) if args and args[0].isdigit() else 10
ONLY = [a for a in args if not a.isdigit()]
SHAPES = {
    "qkv":  (2048, 4096, 64),
    "out":  (2048, 2048, 64),
    "fc1":  (2048, 16384, 48),
    "fc2":  (8192, 2048, 48),
}
B = 2
rng = np.random.default_rng(0)

def make_chain(fn):
    @jax.jit
    def chain(x, wq, sc):
        def body(acc, p):
            y = fn(x, p[0], p[1])
            return acc + y.astype(jnp.float32).sum(), 0
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), (wq, sc))
        return acc
    return chain

xla_chain = make_chain(
    lambda x, w, s: (x @ w.astype(x.dtype)) * s.astype(x.dtype))
pls_chain = make_chain(lambda x, w, s: qmm_int8_pallas(x, w, s))

def bench(fn, x, wq, sc, depth):
    jax.device_get(fn(x, wq, sc))
    t0 = time.perf_counter()
    r = fn(x, wq, sc)
    for _ in range(ITERS - 1):
        r = fn(x, wq, sc)
    jax.device_get(r)
    return (time.perf_counter() - t0) / ITERS / depth

for name, (din, dout, depth) in SHAPES.items():
    if ONLY and name not in ONLY:
        continue
    w = rng.standard_normal((depth, din, dout)).astype(np.float32) * 0.02
    q = quantize_weight(jnp.asarray(w))
    wq, sc = q["weight_int8"], q["scale"]
    x = jnp.asarray(rng.standard_normal((B, din)).astype(np.float32)).astype(jnp.bfloat16)
    roof_us = din * dout / 819e9 * 1e6
    t_x = bench(xla_chain, x, wq, sc, depth) * 1e6
    t_p = bench(pls_chain, x, wq, sc, depth) * 1e6
    print(f"{name}: XLA {t_x:7.2f}us  Pallas {t_p:7.2f}us  roofline {roof_us:6.2f}us  "
          f"effX {roof_us/t_x*100:5.1f}%  effP {roof_us/t_p*100:5.1f}%", flush=True)
