"""Fused Mamba-2 decode-step core: SSM state update + C·h readout + D skip
+ silu(z) gate + gated RMSNorm in ONE Pallas kernel, on the LANE-TRANSPOSED
state layout ``[B, N, H*P]``.

Reference behavior: the recurrent half of mamba-ssm's selective-state
update plus Mamba2's ``norm_before_gate=False`` gated RMSNorm
(/root/reference/zonos/backbone/_mamba_ssm.py:9-57 delegates all of it to
the mamba_ssm CUDA package; the JAX spec is ops/mamba.ssd_step_t +
ops/norms.rms_norm as used by models/mamba_backbone._mamba_mixer).

Why a kernel: xprof of the hybrid pooled step (docs/KERNELS.md) shows the
XLA lowering splits this chain into two big fusions plus ~47 us/layer of
small-op gap time — the step is LATENCY-bound. Fusing the chain keeps the
state in VMEM across update→readout→gate→norm and removes the inter-op
gaps; the only HBM traffic left is one state read + one state write + the
small vectors.

Why THIS layout (attempt 1 post-mortem, docs/KERNELS.md): in the old
``[B, H, P, N]`` layout the readout's lane-axis reduction left everything
downstream on ``[H, P, 1]`` — one of 128 lanes — and the gate/norm VPU
crawl made the fused step SLOWER (11.5 → 19.6 ms at 8 slots). Transposed:

* the state block is ``[N, H*P]`` — d_state N on sublanes, the flat
  d_inner axis on lanes;
* decay / dt / D / xs / z are ``[1, H*P]`` LANE vectors (per-head values
  pre-expanded over each head's P contiguous lanes by the caller);
* B/C are ``[N, 1]`` SUBLANE vectors (ngroups == 1 — the flagship layout;
  the caller falls back to the XLA chain otherwise);
* the update broadcasts lane×sublane — full-width VPU;
* the readout is a SUBLANE reduction landing ``y`` as a ``[1, H*P]`` lane
  vector, so D-skip, silu gate and the gated RMSNorm (a full lane
  reduction + lane-parallel scale) stay full-width.

Blocks keep the state buffer's native shape (no reshape between the cache
and the pallas_call — a reshape there can materialize a full copy per
call, CLAUDE.md); every block dim equals its array dim, which Mosaic
accepts at any size.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    state_ref,  # VMEM [1, N, HP] storage dtype
    xs_ref,     # VMEM [1, 1, HP] activation dtype
    dt_ref,     # VMEM [1, 1, HP] f32 (softplus(dt + bias), per-head -> lanes)
    decay_ref,  # VMEM [1, 1, HP] f32 (exp(dt * A), per-head -> lanes)
    bm_ref,     # VMEM [1, N, 1] f32
    cm_ref,     # VMEM [1, N, 1] f32
    z_ref,      # VMEM [1, 1, HP] activation dtype
    d_ref,      # VMEM [1, HP] f32 (D skip, per-head -> lanes; shared)
    w_ref,      # VMEM [1, HP] gated-RMSNorm weight (shared)
    y_ref,      # out VMEM [1, 1, HP]
    ns_ref,     # out VMEM [1, N, HP] storage dtype
    *,
    eps: float,
):
    state = state_ref[0].astype(jnp.float32)          # [N, HP]
    xs = xs_ref[0].astype(jnp.float32)                # [1, HP]
    dtxs = dt_ref[0] * xs                             # [1, HP]

    # Update: decay broadcasts over sublanes, B over lanes — full VPU width.
    new_state = state * decay_ref[0] + bm_ref[0] * dtxs   # [N, HP]
    ns_ref[0] = new_state.astype(ns_ref.dtype)

    # Readout: sublane reduction -> [1, HP] lane vector.
    y = jnp.sum(cm_ref[0] * new_state, axis=0, keepdims=True)
    y = y + d_ref[...] * xs

    # Gate + gated RMSNorm over d_inner (= the lane axis), all lane-parallel.
    z = z_ref[0].astype(jnp.float32)
    g = y * (z * jax.nn.sigmoid(z))                   # y * silu(z)
    ms = jnp.mean(g * g)
    g = g * jax.lax.rsqrt(ms + eps)
    y_ref[0] = (g * w_ref[...].astype(jnp.float32)).astype(y_ref.dtype)


def _layered_kernel(
    layer_ref,  # scalar-prefetch [1] int32
    state_ref,  # VMEM [1, 1, N, HP] — this layer's plane of the stacked state
    xs_ref,     # VMEM [1, 1, HP]
    dt_ref,     # VMEM [1, 1, HP] f32
    decay_ref,  # VMEM [1, 1, HP] f32
    bm_ref,     # VMEM [1, N, 1] f32
    cm_ref,     # VMEM [1, N, 1] f32
    z_ref,      # VMEM [1, 1, HP]
    d_ref,      # VMEM [1, HP] f32
    w_ref,      # VMEM [1, HP]
    y_ref,      # out VMEM [1, 1, HP]
    ns_ref,     # out VMEM [1, 1, N, HP] — ALIASED with state_ref's buffer
    *,
    eps: float,
):
    state = state_ref[0, 0].astype(jnp.float32)       # [N, HP]
    xs = xs_ref[0].astype(jnp.float32)                # [1, HP]
    dtxs = dt_ref[0] * xs
    new_state = state * decay_ref[0] + bm_ref[0] * dtxs
    ns_ref[0, 0] = new_state.astype(ns_ref.dtype)
    y = jnp.sum(cm_ref[0] * new_state, axis=0, keepdims=True)
    y = y + d_ref[...] * xs
    z = z_ref[0].astype(jnp.float32)
    g = y * (z * jax.nn.sigmoid(z))
    ms = jnp.mean(g * g)
    g = g * jax.lax.rsqrt(ms + eps)
    y_ref[0] = (g * w_ref[...].astype(jnp.float32)).astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def ssd_gate_step_layered_pallas(
    states: jnp.ndarray,  # [R, B, N, HP] FULL stacked run state (aliased)
    layer: jnp.ndarray,   # scalar int32 — which plane to update
    xs: jnp.ndarray,      # [B, 1, HP]
    dt: jnp.ndarray,      # [B, 1, HP] f32
    decay: jnp.ndarray,   # [B, 1, HP] f32
    bm: jnp.ndarray,      # [B, N, 1] f32
    cm: jnp.ndarray,      # [B, N, 1] f32
    z: jnp.ndarray,       # [B, 1, HP]
    d_skip: jnp.ndarray,  # [1, HP] f32
    norm_w: jnp.ndarray,  # [1, HP]
    eps: float = 1e-5,
    interpret: bool = False,
):
    """Layer-indexed IN-PLACE variant for the decode run scan: updates
    plane ``layer`` of the stacked ``[R, B, N, HP]`` state buffer via
    ``input_output_aliases`` and returns ``(y_gated [B, 1, HP],
    states)`` with ``states`` the SAME buffer.

    Why: threading run states through ``lax.scan`` xs/ys makes XLA copy
    the whole stacked state (1.4 GB at 16-slot flagship hybrid) into the
    enclosing decode while-carry every step — traced as ~4.3 ms/step of
    ``copy`` at 16 slots, dwarfing the 93.7 us/call kernel itself (87%
    of the state-bytes roofline; docs/KERNELS.md round-5 trace). With
    the stacked buffer riding the scan CARRY and this kernel splicing
    one plane in place (the ``stage_write.py`` pattern), the only state
    HBM traffic left is the kernel's own read + write."""
    R, B, N, HP = states.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, N, HP), lambda b, l: (l[0], b, 0, 0)),
            pl.BlockSpec((1, 1, HP), lambda b, l: (b, 0, 0)),
            pl.BlockSpec((1, 1, HP), lambda b, l: (b, 0, 0)),
            pl.BlockSpec((1, 1, HP), lambda b, l: (b, 0, 0)),
            pl.BlockSpec((1, N, 1), lambda b, l: (b, 0, 0)),
            pl.BlockSpec((1, N, 1), lambda b, l: (b, 0, 0)),
            pl.BlockSpec((1, 1, HP), lambda b, l: (b, 0, 0)),
            pl.BlockSpec((1, HP), lambda b, l: (0, 0)),
            pl.BlockSpec((1, HP), lambda b, l: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, HP), lambda b, l: (b, 0, 0)),
            pl.BlockSpec((1, 1, N, HP), lambda b, l: (l[0], b, 0, 0)),
        ],
    )
    y, new_states = pl.pallas_call(
        functools.partial(_layered_kernel, eps=eps),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, HP), z.dtype),
            jax.ShapeDtypeStruct((R, B, N, HP), states.dtype),
        ],
        input_output_aliases={1: 1},  # states buffer updated in place
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), states, xs, dt, decay,
      bm, cm, z, d_skip, norm_w)
    return y, new_states


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def ssd_gate_step_pallas(
    state_t: jnp.ndarray,  # [B, N, HP] storage dtype (f32 or bf16)
    xs: jnp.ndarray,      # [B, 1, HP]
    dt: jnp.ndarray,      # [B, 1, HP] f32 (per-head, expanded to lanes)
    decay: jnp.ndarray,   # [B, 1, HP] f32 (per-head, expanded to lanes)
    bm: jnp.ndarray,      # [B, N, 1] f32
    cm: jnp.ndarray,      # [B, N, 1] f32
    z: jnp.ndarray,       # [B, 1, HP]
    d_skip: jnp.ndarray,  # [1, HP] f32 (shared across rows)
    norm_w: jnp.ndarray,  # [1, HP] (shared across rows)
    eps: float = 1e-5,
    interpret: bool = False,
):
    """Returns ``(y_gated [B, 1, HP], new_state [B, N, HP])``.

    ``new_state`` ALIASES the ``state_t`` buffer (``input_output_aliases``):
    without it, every solo-unrolled layer's fresh state output gets a
    materialized copy back into the decode while-carry slot — traced at
    ~102 us × ~37 layers ≈ 3.7 ms/step at the 16-slot flagship hybrid
    pool (docs/KERNELS.md round-5), dwarfing the kernel's own
    state-roofline read+write. Callers must treat the input state as
    consumed (XLA inserts a protective copy if it has other uses)."""
    B, N, HP = state_t.shape
    row = lambda b: (b, 0, 0)  # noqa: E731
    vspec = lambda shape: pl.BlockSpec(shape, row, memory_space=pltpu.VMEM)  # noqa: E731
    shared = pl.BlockSpec((1, HP), lambda b: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        grid=(B,),
        in_specs=[
            vspec((1, N, HP)),
            vspec((1, 1, HP)),
            vspec((1, 1, HP)),
            vspec((1, 1, HP)),
            vspec((1, N, 1)),
            vspec((1, N, 1)),
            vspec((1, 1, HP)),
            shared,
            shared,
        ],
        out_specs=[
            vspec((1, 1, HP)),
            vspec((1, N, HP)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, HP), z.dtype),
            jax.ShapeDtypeStruct((B, N, HP), state_t.dtype),
        ],
        input_output_aliases={0: 1},  # state updated in place
        interpret=interpret,
    )(state_t, xs, dt, decay, bm, cm, z, d_skip, norm_w)
