"""Fused Mamba-2 decode-step core: SSM state update + C·h readout + D skip
+ silu(z) gate + gated RMSNorm in ONE Pallas kernel.

Reference behavior: the recurrent half of mamba-ssm's selective-state
update plus Mamba2's ``norm_before_gate=False`` gated RMSNorm
(/root/reference/zonos/backbone/_mamba_ssm.py:9-57 delegates all of it to
the mamba_ssm CUDA package; the JAX spec is ops/mamba.ssd_step +
ops/norms.rms_norm as used by models/mamba_backbone._mamba_mixer).

Why a kernel: xprof of the hybrid pooled step (docs/KERNELS.md) shows the
XLA lowering splits this chain into two big fusions (~72 us/layer at 16
rows, bf16 state) plus ~47 us/layer of small-op gap time between the
conv/gate/state ops — the step is LATENCY-bound, not HBM-bound. Fusing the
chain keeps the state in VMEM across update→readout→gate→norm and removes
the inter-op gaps; the only HBM traffic left is one state read + one state
write + the small vectors.

Layout: blocks keep the cache's native ``[B, H, P, N]`` shape (no reshape
between the state buffer and the pallas_call — a reshape there can
materialize a full copy per call, CLAUDE.md). Work shape per batch row is
``[H, P, N]``: d_state N on lanes (=array dim, legal at any N), headdim P
on sublanes (multiple of 8 at real configs). Per-head scalars arrive
``[B, H, 1, 1]`` and broadcast in-kernel — no transposes or lane-crossing
relayouts. ngroups == 1 only (the flagship layout); the caller falls back
to the XLA chain otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    state_ref,  # VMEM [1, H, P, N] storage dtype
    xs_ref,     # VMEM [1, H, P, 1]
    dt_ref,     # VMEM [1, H, 1, 1] f32 (softplus(dt + bias))
    decay_ref,  # VMEM [1, H, 1, 1] f32 (exp(dt * A))
    bm_ref,     # VMEM [1, 1, 1, N]
    cm_ref,     # VMEM [1, 1, 1, N]
    d_ref,      # VMEM [1, H, 1, 1] f32 (D skip)
    z_ref,      # VMEM [1, H, P, 1]
    w_ref,      # VMEM [H, P, 1] gated-RMSNorm weight (d_inner, head-major)
    y_ref,      # out VMEM [1, H, P, 1]
    ns_ref,     # out VMEM [1, H, P, N] storage dtype
    *,
    eps: float,
):
    state = state_ref[0].astype(jnp.float32)          # [H, P, N]
    xs = xs_ref[0].astype(jnp.float32)                # [H, P, 1]
    dt = dt_ref[0]                                    # [H, 1, 1]
    decay = decay_ref[0]
    bm = bm_ref[0].astype(jnp.float32)                # [1, 1, N]
    cm = cm_ref[0].astype(jnp.float32)

    new_state = state * decay + (dt * xs) * bm        # [H, P, N]
    ns_ref[0] = new_state.astype(ns_ref.dtype)

    y = jnp.sum(new_state * cm, axis=2, keepdims=True)  # [H, P, 1]
    y = y + d_ref[0] * xs

    z = z_ref[0].astype(jnp.float32)
    g = y * (z * jax.nn.sigmoid(z))                   # y * silu(z)
    ms = jnp.mean(g * g)                              # rmsnorm over d_inner
    g = g * jax.lax.rsqrt(ms + eps)
    y_ref[0] = (g * w_ref[...].astype(jnp.float32)).astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def ssd_gate_step_pallas(
    state: jnp.ndarray,   # [B, H, P, N] storage dtype (f32 or bf16)
    xs: jnp.ndarray,      # [B, H, P, 1]
    dt: jnp.ndarray,      # [B, H, 1, 1] f32
    decay: jnp.ndarray,   # [B, H, 1, 1] f32
    bm: jnp.ndarray,      # [B, 1, 1, N]
    cm: jnp.ndarray,      # [B, 1, 1, N]
    d_skip: jnp.ndarray,  # [B, H, 1, 1] f32
    z: jnp.ndarray,       # [B, H, P, 1]
    norm_w: jnp.ndarray,  # [H, P, 1]
    eps: float = 1e-5,
    interpret: bool = False,
):
    """Returns ``(y_gated [B, H, P, 1], new_state [B, H, P, N])``."""
    B, H, P, N = state.shape
    row = lambda b: (b, 0, 0, 0)  # noqa: E731
    vspec = lambda shape: pl.BlockSpec(shape, row, memory_space=pltpu.VMEM)  # noqa: E731
    return pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        grid=(B,),
        in_specs=[
            vspec((1, H, P, N)),
            vspec((1, H, P, 1)),
            vspec((1, H, 1, 1)),
            vspec((1, H, 1, 1)),
            vspec((1, 1, 1, N)),
            vspec((1, 1, 1, N)),
            vspec((1, H, 1, 1)),
            vspec((1, H, P, 1)),
            pl.BlockSpec((H, P, 1), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            vspec((1, H, P, 1)),
            vspec((1, H, P, N)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, P, 1), z.dtype),
            jax.ShapeDtypeStruct((B, H, P, N), state.dtype),
        ],
        interpret=interpret,
    )(state, xs, dt, decay, bm, cm, d_skip, z, norm_w)
