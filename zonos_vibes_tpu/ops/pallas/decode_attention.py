"""Pallas TPU kernel: single-query GQA flash-decode over the KV cache.

The decode hot path calls attention once per generated frame with a single
query token against a long preallocated cache (SURVEY.md §2.9 N1). This
kernel is the bandwidth-bound analogue of flash-decoding:

* grid ``(B, Hkv, nT)`` with the time dim fastest; K/V arrive as
  auto-pipelined ``[D, BLOCK]`` VMEM blocks, so Mosaic overlaps the next
  block's HBM->VMEM DMA with the current block's compute (double-buffered by
  the pipeline, no manual semaphores).
* **dynamic early stop without dynamic grids**: ``seq_end`` is a
  scalar-prefetch arg; the K/V index maps CLAMP the time-block index to the
  last valid block, so iterations past ``ceil(seq_end/BLOCK)`` re-reference
  the same block — Pallas skips the re-fetch (same index => no DMA) and
  ``pl.when`` skips the compute. The padded cache tail is never read.
* cache layout is **time-minor** ``[B, Hkv, D, T]``: head_dim (64) is under
  the 128-lane tile, so time must be minor for lane-aligned slabs; it also
  makes ``q @ K`` and ``p @ V^T`` direct MXU contractions.
* online softmax (flash recurrence) in fp32 VMEM scratch, carried across the
  sequential time iterations of each (batch, head) program.

The G = Hq/Hkv grouped-query heads ride along as rows of the ``[G, D]`` q
block; the XLA fallback lives in ops/attention.decode_attention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK = 512
NEG_INF = -1e30


def _kernel(
    seq_end_ref,  # SMEM [1]
    q_ref,  # VMEM [1, 1, G, D]
    k_ref,  # VMEM [1, 1, D, BLOCK]
    v_ref,  # VMEM [1, 1, D, BLOCK]
    out_ref,  # VMEM [1, 1, G, D]
    acc_ref,  # VMEM [G, D] f32
    m_ref,  # VMEM [G, 128] f32 (running max; lane 0 used)
    l_ref,  # VMEM [G, 128] f32 (running denominator)
    *,
    block: int,
    scale: float,
):
    t = pl.program_id(2)
    seq_end = seq_end_ref[0]
    nblocks = pl.cdiv(seq_end, block)
    G = q_ref.shape[2]

    @pl.when(t == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(t < nblocks)
    def _():
        q = q_ref[0, 0].astype(jnp.float32) * scale  # [G, D]
        k = k_ref[0, 0].astype(jnp.float32)  # [D, BLOCK]
        v = v_ref[0, 0].astype(jnp.float32)
        scores = jax.lax.dot_general(
            q, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [G, BLOCK]
        pos = t * block + jax.lax.broadcasted_iota(jnp.int32, (G, block), 1)
        scores = jnp.where(pos < seq_end, scores, NEG_INF)

        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)
        l_ref[:, :1] = l_ref[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        m_ref[:, :1] = m_new
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(t == pl.num_programs(2) - 1)
    def _():
        out_ref[0, 0] = (acc_ref[:] / l_ref[:, :1]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def decode_attention_pallas(
    q: jnp.ndarray,  # [B, 1, Hq, D]
    k_cache: jnp.ndarray,  # [B, Hkv, D, T]
    v_cache: jnp.ndarray,  # [B, Hkv, D, T]
    seq_end: jnp.ndarray,  # scalar int32
    block: int = DEFAULT_BLOCK,
    interpret: bool = False,
) -> jnp.ndarray:
    B, S, Hq, D = q.shape
    assert S == 1
    _, Hkv, _, T = k_cache.shape
    G = Hq // Hkv
    block = min(block, T)
    nt = pl.cdiv(T, block)
    scale = 1.0 / (D ** 0.5)

    qg = q.reshape(B, Hkv, G, D)
    seq_end_arr = jnp.asarray(seq_end, jnp.int32).reshape(1)

    def kv_index(b, h, t, se_ref):
        # Clamp past the last valid block: same index => DMA skipped.
        last = jax.lax.max(pl.cdiv(se_ref[0], block) - 1, 0)
        return (b, h, 0, jax.lax.min(t, last))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, Hkv, nt),
        in_specs=[
            pl.BlockSpec(
                (1, 1, G, D), lambda b, h, t, se: (b, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, 1, D, block), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D, block), kv_index, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, G, D), lambda b, h, t, se: (b, h, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((G, D), jnp.float32),
            pltpu.VMEM((G, 128), jnp.float32),
            pltpu.VMEM((G, 128), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, block=block, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, D), q.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(seq_end_arr, qg, k_cache, v_cache)
    return out.reshape(B, 1, Hq, D)
