"""Pallas TPU kernel: causal GQA flash-attention for the prefill chunk.

The prefill path runs the full (conditioning + audio-prefix) sequence through
attention once per utterance (SURVEY.md §2.9 N1 names a causal prefill kernel
alongside flash-decode). For short text-only prefills (~70 tokens) the XLA
dense path is fine; this kernel is for LONG prefills — audio-prefix
continuation, where S reaches thousands of frames — where the dense
``[S, T]`` score materialization goes quadratic in HBM traffic.

Design (classic flash-attention shaped for this cache):

* grid ``(B, Hq, nQ, nK)`` with the key-block axis fastest; online-softmax
  scratch ``(acc, m, l)`` carried across the k iterations of each
  ``(b, h, qb)`` program.
* KV streams from the decode engine's time-minor cache ``[B, Hkv, D, T]``
  (see ops/attention.update_kv_cache): each block is a lane-aligned
  ``[D, BK]`` slab; queries ride as ``[BQ, D]`` tiles, so the score dot
  ``[BQ, D] @ [D, BK]`` and the value dot ``p @ [BK, D]^T`` are single MXU
  calls per block pair. The G = Hq/Hkv grouped heads share one kv head via
  the ``h // G`` index map — consecutive h re-reference the same block and
  Pallas skips the re-fetch.
* **causal block pruning without a dynamic grid**: query position ``i`` of
  block ``qb`` is absolute ``offset + qb*BQ + i``; key blocks wholly above
  the diagonal are never needed. The kv index map clamps the key-block index
  to the last needed block for the current ``qb`` (same index => DMA
  skipped) and ``pl.when`` skips the compute — ~2x FLOP/DMA saving, same
  trick as the decode kernel's early stop.
* fp32 softmax state; output cast back to the query dtype.

``offset`` (chunk start in the cache) arrives via scalar prefetch so one
compiled kernel serves any chunk placement.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 1024


def _kernel(
    off_ref,  # SMEM [1] — chunk start offset
    q_ref,  # VMEM [1, 1, BQ, D]
    k_ref,  # VMEM [1, 1, D, BK]
    v_ref,  # VMEM [1, 1, D, BK]
    out_ref,  # VMEM [1, 1, BQ, D]
    acc_ref,  # VMEM [BQ, D] f32
    m_ref,  # VMEM [BQ, 128] f32 (running max; lane 0)
    l_ref,  # VMEM [BQ, 128] f32 (running denominator)
    *,
    block_q: int,
    block_k: int,
    scale: float,
):
    qb = pl.program_id(2)
    kb = pl.program_id(3)
    off = off_ref[0]

    @pl.when(kb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    # Last key block that intersects the causal triangle of this q block:
    # max absolute query position is off + (qb+1)*BQ - 1.
    last_kb = jax.lax.div(off + (qb + 1) * block_q - 1, block_k)

    @pl.when(kb <= last_kb)
    def _():
        q = q_ref[0, 0].astype(jnp.float32) * scale  # [BQ, D]
        k = k_ref[0, 0].astype(jnp.float32)  # [D, BK]
        scores = jax.lax.dot_general(
            q, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BQ, BK]
        qry_pos = off + qb * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0
        )
        key_pos = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        scores = jnp.where(key_pos <= qry_pos, scores, NEG_INF)

        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)  # [BQ, BK]
        l_ref[:, :1] = l_ref[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        m_ref[:, :1] = m_new
        v = v_ref[0, 0].astype(jnp.float32)  # [D, BK]
        pv = jax.lax.dot_general(
            p, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BQ, D]
        acc_ref[:] = acc_ref[:] * alpha + pv

    @pl.when(kb == pl.num_programs(3) - 1)
    def _():
        out_ref[0, 0] = (acc_ref[:] / l_ref[:, :1]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def prefill_attention_pallas(
    q: jnp.ndarray,  # [B, S, Hq, D] (RoPE applied)
    k_cache: jnp.ndarray,  # [B, Hkv, D, T] (chunk written at [offset:offset+S])
    v_cache: jnp.ndarray,  # [B, Hkv, D, T]
    offset: jnp.ndarray,  # scalar int32 — absolute chunk start
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
) -> jnp.ndarray:
    """Flash causal prefill; semantics identical to
    ops/attention.prefill_attention (query ``offset+i`` attends to cache
    ``[0, offset+i]``)."""
    B, S, Hq, D = q.shape
    _, Hkv, _, T = k_cache.shape
    G = Hq // Hkv
    block_q = min(block_q, max(8, S))
    block_k = min(block_k, T)
    s_pad = pl.cdiv(S, block_q) * block_q
    nq = s_pad // block_q
    nk = pl.cdiv(T, block_k)
    scale = 1.0 / (D ** 0.5)

    qh = jnp.swapaxes(q, 1, 2)  # [B, Hq, S, D]
    if s_pad != S:
        qh = jnp.pad(qh, ((0, 0), (0, 0), (0, s_pad - S), (0, 0)))
    off_arr = jnp.asarray(offset, jnp.int32).reshape(1)

    def kv_index(b, h, qb, kb, off_ref):
        # Clamp to the last causally-needed block: same index => DMA skipped.
        last = jax.lax.div(off_ref[0] + (qb + 1) * block_q - 1, block_k)
        return (b, jax.lax.div(h, G), 0, jax.lax.min(kb, last))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, Hq, nq, nk),
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_q, D), lambda b, h, qb, kb, off: (b, h, qb, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, 1, D, block_k), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D, block_k), kv_index, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, D), lambda b, h, qb, kb, off: (b, h, qb, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, D), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel, block_q=block_q, block_k=block_k, scale=scale
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hq, s_pad, D), q.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(off_arr, qh, k_cache, v_cache)
    return jnp.swapaxes(out[:, :, :S], 1, 2)
