"""Pallas TPU kernel: int8 weight-streaming matmul for the decode hot path.

Single-stream decode is WEIGHT-read bound (docs/KERNELS.md byte budget:
~1.6 GB of int8 weights per step at flagship scale). XLA's
convert-fused dot runs the big projection reads at ~85-90% of the HBM
roofline (xprof, round 4: fc1 45.7 us vs 41 us bound, fc2 23.6 vs 20.5);
this kernel exists to close that last 10-15%: a grid over output blocks
where each step DMAs one ``[in, BLOCK]`` int8 slab, converts in VMEM, and
runs the skinny ``[B, in] @ [in, BLOCK]`` dot on the MXU — Mosaic
double-buffers the next slab's DMA under the current block's
convert+dot, so the weight stream sets the pace.

Dequant: per-out-channel scale applies POST-dot to the fp32 accumulator
(the scale commutes with the contraction — ops/quant.py layout). The
activation row block (``[B, in]``) stays resident in VMEM across all
grid steps (constant index map).

Reference semantics: plain ``x @ W`` projections
(/root/reference/zonos/backbone/_torch.py:113-152); quantization is our
TPU-side serving design.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _qmm_kernel(x_ref, w_ref, s_ref, out_ref, *, out_dtype):
    x = x_ref[...]  # [B, in] activation dtype
    w = w_ref[...].astype(x.dtype)  # [in, BLOCK] int8 -> act dtype (VPU)
    y = jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, BLOCK] f32
    out_ref[...] = (y * s_ref[...]).astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("block_out", "interpret")
)
def qmm_int8_pallas(
    x: jnp.ndarray,  # [B, in] activations (bf16/f32)
    w_q: jnp.ndarray,  # [in, out] int8
    scale: jnp.ndarray,  # [1, out] f32 per-out-channel
    block_out: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    B, d_in = x.shape
    _, d_out = w_q.shape
    if d_out % block_out:
        block_out = d_out  # single block == array dim is always legal
    grid = (d_out // block_out,)
    out = pl.pallas_call(
        functools.partial(_qmm_kernel, out_dtype=x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, d_in), lambda o: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d_in, block_out), lambda o: (0, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_out), lambda o: (0, o),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, block_out), lambda o: (0, o),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, d_out), x.dtype),
        interpret=interpret,
    )(x, w_q, scale.astype(jnp.float32))
    return out
