"""Probe: Mamba-run stepping formulations at flagship pool shapes.

The hybrid decode scans each contiguous Mamba run with stacked layer params
riding scan xs (models/mamba_backbone.py). xprof shows a
``constant_dynamic-slice`` fusion of ~24 us per layer-iteration: lax.scan
materializes each iteration's weight slab as a copy before the matmul reads
it — weights cross HBM twice. This probe times one 7-layer run-equivalent
(norm + in_proj + ssd_step + out_proj per layer) three ways:

  scan_xs   — params in scan xs (current formulation)
  scan_idx  — params closed over, dynamic_index_in_dim inside the body
  unrolled  — python loop, STATIC w[i] views into the same stacked arrays

Usage: python tools/probe_run_scan.py [batch] [reps]
Prints one JSON line per formulation.
"""
import json
import sys, time
sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from zonos_vibes_tpu.ops.mamba import ssd_step

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 20
R, D = 7, 2048
H, P, N = 64, 64, 128          # flagship ssm: nheads, headdim, d_state
D_IN = 2 * H * P + 2 * N + H   # z ‖ xBC-ish ‖ dt (shape-faithful enough)
key = jax.random.key(0)

params = {
    "w_in": jax.random.normal(key, (R, D, D_IN), jnp.bfloat16) * 0.02,
    "w_out": jax.random.normal(key, (R, H * P, D), jnp.bfloat16) * 0.02,
    "A": -jnp.ones((R, H), jnp.float32),
    "Dp": jnp.ones((R, H), jnp.float32),
}
state0 = jnp.zeros((R, B, H, P, N), jnp.float32)
x0 = jax.random.normal(key, (B, 1, D), jnp.bfloat16)


def layer(lp, x, ssm):
    zxd = (x @ lp["w_in"]).astype(jnp.bfloat16)  # [B,1,D_IN]
    z, xbc, dt = jnp.split(zxd, [H * P, 2 * H * P + 2 * N], axis=-1)
    xs = xbc[:, 0, : H * P].reshape(B, H, P)
    Bm = xbc[:, 0, H * P : H * P + N].reshape(B, 1, N)
    Cm = xbc[:, 0, H * P + N :].reshape(B, 1, N)
    y, ns = ssd_step(ssm, xs, dt[:, 0, :H].astype(jnp.float32),
                     lp["A"], Bm, Cm, lp["Dp"])
    y = (y.reshape(B, 1, H * P) * jax.nn.silu(z)).astype(jnp.bfloat16)
    return (y @ lp["w_out"]).astype(jnp.bfloat16), ns


@jax.jit
def scan_xs(params, x, states):
    def body(h, xs):
        lp, ssm = xs
        out, ns = layer(lp, h, ssm)
        return out, ns
    h, ns = jax.lax.scan(body, x, (params, states))
    return h, ns


@jax.jit
def scan_idx(params, x, states):
    def body(carry, i):
        h = carry
        lp = jax.tree.map(
            lambda a: jax.lax.dynamic_index_in_dim(a, i, 0, keepdims=False),
            params,
        )
        ssm = jax.lax.dynamic_index_in_dim(states, i, 0, keepdims=False)
        out, ns = layer(lp, h, ssm)
        return out, ns
    h, ns = jax.lax.scan(body, x, jnp.arange(R))
    return h, ns


@jax.jit
def unrolled(params, x, states):
    h, out_states = x, []
    for i in range(R):
        lp = jax.tree.map(lambda a: a[i], params)
        h, ns = layer(lp, h, states[i])
        out_states.append(ns)
    return h, jnp.stack(out_states)


def bench(name, fn):
    t0 = time.perf_counter()
    out = fn(params, x0, state0)
    jax.device_get(out[0])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(params, x0, state0)
    jax.device_get(out[0])
    ms = (time.perf_counter() - t0) / REPS * 1e3
    print(json.dumps({"form": name, "B": B, "ms_per_run": round(ms, 3),
                      "us_per_layer": round(ms / R * 1e3, 1),
                      "compile_s": round(compile_s, 1)}))


bench("scan_xs", scan_xs)
bench("scan_idx", scan_idx)
bench("unrolled", unrolled)
