"""Probe: fused Mamba decode-step core (ops/pallas/mamba_step.py, lane-
transposed [B, N, H*P] state) vs the XLA op chain (ssd_step_t + gate +
rms_norm) at flagship shapes.

Usage: python tools/probe_mamba_step_kernel.py [batch] [f32|bf16] [reps]
Prints JSON lines (compile + per-call timings + numeric agreement).
"""
import json
import sys, time
sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from zonos_vibes_tpu.ops.mamba import _head_to_lanes, ssd_step_t
from zonos_vibes_tpu.ops.norms import rms_norm
from zonos_vibes_tpu.ops.pallas.mamba_step import ssd_gate_step_pallas

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
sdtype = jnp.bfloat16 if "bf16" in sys.argv else jnp.float32
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 50
H, P, N = 64, 64, 128
HP = H * P
key = jax.random.key(0)
ks = jax.random.split(key, 8)

state = (jax.random.normal(ks[0], (B, N, HP), jnp.float32) * 0.1).astype(sdtype)
xs = jax.random.normal(ks[1], (B, HP), jnp.bfloat16)
dt = jax.nn.softplus(jax.random.normal(ks[2], (B, H), jnp.float32))
A = -jnp.exp(jax.random.normal(ks[3], (H,), jnp.float32))
Bm = jax.random.normal(ks[4], (B, 1, N), jnp.float32) * 0.5
Cm = jax.random.normal(ks[5], (B, 1, N), jnp.float32) * 0.5
D = jax.random.normal(ks[6], (H,), jnp.float32)
z = jax.random.normal(ks[7], (B, HP), jnp.bfloat16)
w = jnp.ones((HP,), jnp.bfloat16)


@jax.jit
def chain(state, xs, dt, z):
    y, ns = ssd_step_t(state, xs, dt, A, Bm, Cm, D, H)
    g = rms_norm(y.astype(jnp.float32) * jax.nn.silu(z.astype(jnp.float32)), w)
    return g.astype(jnp.bfloat16), ns.astype(state.dtype)


@jax.jit
def fused(state, xs, dt, z):
    dt_l = _head_to_lanes(dt, P)[:, None, :]
    decay_l = _head_to_lanes(jnp.exp(dt * A[None, :]), P)[:, None, :]
    d_l = jnp.broadcast_to(D[:, None], (H, P)).reshape(1, HP)
    y, ns = ssd_gate_step_pallas(
        state, xs[:, None, :], dt_l, decay_l,
        Bm[:, 0, :, None], Cm[:, 0, :, None], z[:, None, :],
        d_l, w.reshape(1, HP),
    )
    return y[:, 0], ns


def bench(name, fn):
    t0 = time.perf_counter()
    out = fn(state, xs, dt, z)
    jax.device_get(out[0])
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(state, xs, dt, z)
    jax.device_get(out[0])
    ms = (time.perf_counter() - t0) / REPS * 1e3
    print(json.dumps({"form": name, "B": B, "state": str(sdtype.__name__),
                      "us_per_call": round(ms * 1e3, 1),
                      "compile_s": round(c, 1)}))
    return out


o1 = bench("xla_chain", chain)
o2 = bench("fused_pallas", fused)
err_y = float(jnp.max(jnp.abs(o1[0].astype(jnp.float32) - o2[0].astype(jnp.float32))))
err_s = float(jnp.max(jnp.abs(o1[1].astype(jnp.float32) - o2[1].astype(jnp.float32))))
print(json.dumps({"max_abs_err_y": err_y, "max_abs_err_state": err_s}))
