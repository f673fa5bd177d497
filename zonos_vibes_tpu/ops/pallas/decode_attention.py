"""Pallas TPU kernel: single-query GQA flash-decode over the KV cache.

The decode hot path calls attention once per generated frame with a single
query token against a long preallocated cache (SURVEY.md §2.9 N1). This
kernel is the bandwidth-bound analogue of flash-decoding, tuned so the HBM
DMA engine — not per-iteration overhead — sets the speed:

* grid ``(B, nT)`` with time fastest. Each K/V block carries ALL kv heads of
  one batch row (``[Hkv*D, BLOCK]``, ~1-2 MB in bf16), so one auto-pipelined
  DMA amortizes over ``Hkv`` per-head dots; Mosaic double-buffers the next
  block's fetch under the current block's compute.
* **dynamic early stop without dynamic grids**: ``seq_end`` arrives via
  scalar prefetch; the K/V index maps CLAMP the time-block index to the last
  valid block, so iterations past ``ceil(seq_end/BLOCK)`` re-reference the
  same block — Pallas skips the re-fetch (same index => no DMA) and
  ``pl.when`` skips the compute. The padded cache tail is never read
  (the XLA fallback always reads the full padded cache).
* cache layout is **time-minor** ``[B, Hkv, D, T]``: head_dim (64) is under
  the 128-lane tile, so time must be minor for lane-aligned slabs; the
  kernel views it as ``[B, Hkv*D, T]`` and statically slices each head's
  ``[D, BLOCK]`` sub-slab (64-row slices are sublane-aligned for bf16/f32).
* online softmax (flash recurrence) in fp32 VMEM scratch carried across the
  sequential time iterations of each batch row's program.

The G = Hq/Hkv grouped-query heads ride along as rows of each head's
``[G, D]`` q block; the XLA fallback lives in ops/attention.decode_attention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK = 1024
NEG_INF = -1e30


def _kernel(
    seq_end_ref,  # SMEM [1]
    q_ref,  # VMEM [1, Hq, D]
    k_ref,  # VMEM [1, Hkv*D, BLOCK]
    v_ref,  # VMEM [1, Hkv*D, BLOCK]
    out_ref,  # VMEM [1, Hq, D]
    acc_ref,  # VMEM [Hq, D] f32
    m_ref,  # VMEM [Hq, 128] f32 (running max; lane 0 used)
    l_ref,  # VMEM [Hq, 128] f32 (running denominator)
    *,
    block: int,
    scale: float,
    n_kv_heads: int,
    head_dim: int,
):
    t = pl.program_id(1)
    seq_end = seq_end_ref[0]
    nblocks = pl.cdiv(seq_end, block)
    Hq = q_ref.shape[1]
    G = Hq // n_kv_heads
    D = head_dim

    @pl.when(t == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(t < nblocks)
    def _():
        # Block-diagonal GQA trick: place each query head's [G, D] block at
        # its kv head's column offset of a [Hq, Hkv*D] matrix; a SINGLE
        # [Hq, Hkv*D] @ [Hkv*D, BLOCK] dot then yields exactly the grouped
        # scores (cross-head terms hit zero rows). 8x redundant MACs, but the
        # kernel is bandwidth-bound and one big MXU dot beats 8 tiny ones.
        row_head = jax.lax.broadcasted_iota(jnp.int32, (Hq, n_kv_heads * D), 0) // G
        col_head = jax.lax.broadcasted_iota(jnp.int32, (Hq, n_kv_heads * D), 1) // D
        diag = row_head == col_head  # [Hq, Hkv*D]
        q_full = jnp.tile(q_ref[0].astype(jnp.float32) * scale, (1, n_kv_heads))
        q_diag = jnp.where(diag, q_full, 0.0)

        k = k_ref[0].astype(jnp.float32)  # [Hkv*D, BLOCK]
        v = v_ref[0].astype(jnp.float32)
        scores = jax.lax.dot_general(
            q_diag, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Hq, BLOCK]
        pos = t * block + jax.lax.broadcasted_iota(jnp.int32, (Hq, block), 1)
        scores = jnp.where(pos < seq_end, scores, NEG_INF)

        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)  # [Hq, BLOCK]
        l_ref[:, :1] = l_ref[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        m_ref[:, :1] = m_new
        # p @ V^T gives [Hq, Hkv*D]; select each row's own head block.
        pv = jax.lax.dot_general(
            p, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        pvm = jnp.where(diag, pv, 0.0)
        # Lane-space fold without reshape (Mosaic-friendly): masked blocks
        # are zero, so summing the Hkv column slices selects each row's own.
        own = pvm[:, :D]
        for h in range(1, n_kv_heads):
            own = own + pvm[:, h * D : (h + 1) * D]
        acc_ref[:] = acc_ref[:] * alpha + own

    @pl.when(t == pl.num_programs(1) - 1)
    def _():
        out_ref[0] = (acc_ref[:] / l_ref[:, :1]).astype(out_ref.dtype)


def _kernel_layered(
    scalars_ref,  # SMEM [3]: (flushed_end, stage_len, layer)
    q_ref,  # VMEM [1, Hq, D]
    k_ref,  # VMEM [1, 1, Hkv*D, BLOCK]
    v_ref,  # VMEM [1, 1, Hkv*D, BLOCK]
    ks_ref,  # VMEM [1, 1, STAGE, Hkv*D]  time-major stage (unflushed tail)
    vs_ref,  # VMEM [1, 1, STAGE, Hkv*D]
    kc_ref,  # VMEM [1, 1, Hkv*D]  current token's key column
    vc_ref,  # VMEM [1, 1, Hkv*D]  current token's value column
    out_ref,  # VMEM [1, Hq, D]
    acc_ref,  # VMEM [Hq, D] f32
    m_ref,  # VMEM [Hq, 128] f32
    l_ref,  # VMEM [Hq, 128] f32
    *,
    block: int,
    scale: float,
    n_kv_heads: int,
    head_dim: int,
):
    """Layer-indexed flash-decode over a THREE-part key/value stream:

    1. the flushed prefix ``[0, flushed_end)`` of the FULL stacked
       ``[L, B, Hkv*D, T]`` cache (layer picked by the scalar-prefetched
       index — no per-layer slab is ever materialized by the caller);
    2. a small TIME-MAJOR stage ``[STAGE, Hkv*D]`` holding the most recent
       ``stage_len`` tokens (cache positions ``[flushed_end, flushed_end +
       stage_len)``) — time-major makes the per-step column write cheap
       (the strided write into the time-minor cache is the expensive op
       this design amortizes into one flush per STAGE steps);
    3. the CURRENT token's k/v column.

    The stage dots are oriented so Mosaic needs no large transposes: scores
    come out ``[STAGE, Hq]`` via ``k_s @ q_diagT`` (q_diagT is built
    transposed from the start) and fold back through ``p_sT^T @ v_s``.
    """
    t = pl.program_id(1)
    seq_end = scalars_ref[0]
    nblocks = pl.cdiv(seq_end, block)
    Hq = q_ref.shape[1]
    G = Hq // n_kv_heads
    D = head_dim

    row_head = jax.lax.broadcasted_iota(jnp.int32, (Hq, n_kv_heads * D), 0) // G
    col_head = jax.lax.broadcasted_iota(jnp.int32, (Hq, n_kv_heads * D), 1) // D
    diag = row_head == col_head  # [Hq, Hkv*D]
    q_full = jnp.tile(q_ref[0].astype(jnp.float32) * scale, (1, n_kv_heads))
    q_diag = jnp.where(diag, q_full, 0.0)

    @pl.when(t == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(t < nblocks)
    def _():
        k = k_ref[0, 0].astype(jnp.float32)  # [Hkv*D, BLOCK]
        v = v_ref[0, 0].astype(jnp.float32)
        scores = jax.lax.dot_general(
            q_diag, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Hq, BLOCK]
        pos = t * block + jax.lax.broadcasted_iota(jnp.int32, (Hq, block), 1)
        scores = jnp.where(pos < seq_end, scores, NEG_INF)

        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)
        l_ref[:, :1] = l_ref[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        m_ref[:, :1] = m_new
        pv = jax.lax.dot_general(
            p, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        pvm = jnp.where(diag, pv, 0.0)
        own = pvm[:, :D]
        for h in range(1, n_kv_heads):
            own = own + pvm[:, h * D : (h + 1) * D]
        acc_ref[:] = acc_ref[:] * alpha + own

    @pl.when(t == pl.num_programs(1) - 1)
    def _():
        stage_len = scalars_ref[1]
        STAGE = ks_ref.shape[2]

        # q_diagT [Hkv*D, Hq] built transposed from the start (only a tiny
        # [Hq, D] -> [D, Hq] transpose), so both stage dots are in the
        # MXU's native orientation.
        qT = jnp.transpose(q_ref[0].astype(jnp.float32) * scale)  # [D, Hq]
        qT_full = jnp.concatenate([qT] * n_kv_heads, axis=0)  # [Hkv*D, Hq]
        # diag transposed, built from iotas (Mosaic cannot transpose i1).
        rowT = jax.lax.broadcasted_iota(jnp.int32, (n_kv_heads * D, Hq), 0) // D
        colT = jax.lax.broadcasted_iota(jnp.int32, (n_kv_heads * D, Hq), 1) // G
        diagT = rowT == colT
        qT_diag = jnp.where(diagT, qT_full, 0.0)

        k_s = ks_ref[0, 0].astype(jnp.float32)  # [STAGE, Hkv*D]
        v_s = vs_ref[0, 0].astype(jnp.float32)
        scores_sT = jax.lax.dot_general(
            k_s, qT_diag, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [STAGE, Hq]
        srow = jax.lax.broadcasted_iota(jnp.int32, (STAGE, Hq), 0)
        scores_sT = jnp.where(srow < stage_len, scores_sT, NEG_INF)

        # Current token's scores, same [*, Hq] orientation (row 0).
        kc = kc_ref[0, 0].astype(jnp.float32)  # [Hkv*D]
        vc = vc_ref[0, 0].astype(jnp.float32)
        s_curT = jnp.sum(qT_diag * kc[:, None], axis=0, keepdims=True)  # [1, Hq]

        tail_max = jnp.maximum(jnp.max(scores_sT, axis=0, keepdims=True), s_curT)
        m_prevT = jnp.transpose(m_ref[:, :1])  # [1, Hq]
        m_finT = jnp.maximum(m_prevT, tail_max)
        p_sT = jnp.exp(scores_sT - m_finT)  # [STAGE, Hq]
        p_curT = jnp.exp(s_curT - m_finT)  # [1, Hq]
        alphaT = jnp.exp(m_prevT - m_finT)  # [1, Hq]

        pv_s = jax.lax.dot_general(
            p_sT, v_s, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Hq, Hkv*D]
        vm = jnp.where(diag, jnp.broadcast_to(vc[None, :], diag.shape), 0.0)
        tail = jnp.where(diag, pv_s, 0.0) + jnp.transpose(p_curT) * vm
        own = tail[:, :D]
        for h in range(1, n_kv_heads):
            own = own + tail[:, h * D : (h + 1) * D]

        alpha = jnp.transpose(alphaT)  # [Hq, 1]
        l_fin = l_ref[:, :1] * alpha + jnp.transpose(
            jnp.sum(p_sT, axis=0, keepdims=True) + p_curT
        )
        acc = acc_ref[:] * alpha + own
        out_ref[0] = (acc / l_fin).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def decode_attention_pallas_layered(
    q: jnp.ndarray,  # [B, 1, Hq, D]
    k_cache: jnp.ndarray,  # [L, B, Hkv, D, T] (read-only flushed prefix)
    v_cache: jnp.ndarray,  # [L, B, Hkv, D, T]
    k_stage: jnp.ndarray,  # [L, B, STAGE, Hkv*D] time-major unflushed tail
    v_stage: jnp.ndarray,  # [L, B, STAGE, Hkv*D]
    k_cur: jnp.ndarray,  # [B, Hkv, D, 1]
    v_cur: jnp.ndarray,  # [B, Hkv, D, 1]
    flushed_end: jnp.ndarray,  # scalar int32: flushed prefix length
    stage_len: jnp.ndarray,  # scalar int32: valid stage rows (excl. cur)
    layer: jnp.ndarray,  # scalar int32 layer index
    block: int = DEFAULT_BLOCK,
    interpret: bool = False,
) -> jnp.ndarray:
    B, S, Hq, D = q.shape
    assert S == 1
    L, _, Hkv, _, T = k_cache.shape
    STAGE = k_stage.shape[2]
    block = min(block, T)
    if T % block:
        block = T  # single block == array dim (always a legal Mosaic block)
    nt = pl.cdiv(T, block)
    scale = 1.0 / (D ** 0.5)

    qg = q.reshape(B, Hq, D)
    kcv = k_cache.reshape(L, B, Hkv * D, T)
    vcv = v_cache.reshape(L, B, Hkv * D, T)
    ksv = k_stage  # already [L, B, STAGE, Hkv*D] — no reshape, no layout copy
    vsv = v_stage
    kcur = k_cur.reshape(B, 1, Hkv * D)
    vcur = v_cur.reshape(B, 1, Hkv * D)
    scalars = jnp.stack(
        [
            jnp.asarray(flushed_end, jnp.int32),
            jnp.asarray(stage_len, jnp.int32),
            jnp.asarray(layer, jnp.int32),
        ]
    )

    def kv_index(b, t, sc_ref):
        last = jax.lax.max(pl.cdiv(sc_ref[0], block) - 1, 0)
        return (sc_ref[2], b, 0, jax.lax.min(t, last))

    def stage_index(b, t, sc_ref):
        return (sc_ref[2], b, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec(
                (1, Hq, D), lambda b, t, sc: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, 1, Hkv * D, block), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Hkv * D, block), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, STAGE, Hkv * D), stage_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, STAGE, Hkv * D), stage_index, memory_space=pltpu.VMEM),
            # [B, 1, Hkv*D] so the block's last two dims (1, Hkv*D) equal
            # the array dims (Mosaic's sub-8 second-minor dim constraint).
            pl.BlockSpec((1, 1, Hkv * D), lambda b, t, sc: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Hkv * D), lambda b, t, sc: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, Hq, D), lambda b, t, sc: (b, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((Hq, D), jnp.float32),
            pltpu.VMEM((Hq, 128), jnp.float32),
            pltpu.VMEM((Hq, 128), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel_layered, block=block, scale=scale,
            n_kv_heads=Hkv, head_dim=D,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hq, D), q.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(scalars, qg, kcv, vcv, ksv, vsv, kcur, vcur)
    return out.reshape(B, 1, Hq, D)


def _kernel_layered_q(
    scalars_ref,  # SMEM [3]: (flushed_end, stage_len, layer)
    q_ref,  # VMEM [1, Hq, D]
    k_ref,  # VMEM [1, 1, Hkv*D, BLOCK] int8 flushed prefix
    v_ref,  # VMEM [1, 1, Hkv*D, BLOCK] int8
    ksc_ref,  # VMEM [1, 1, Hkv, BLOCK] f32 per-(head, token) key scales
    vsc_ref,  # VMEM [1, 1, Hkv, BLOCK] f32 value scales
    ks_ref,  # VMEM [1, 1, STAGE, Hkv*D] bf16 time-major stage (exact)
    vs_ref,  # VMEM [1, 1, STAGE, Hkv*D]
    kc_ref,  # VMEM [1, 1, Hkv*D] bf16 current column (exact)
    vc_ref,  # VMEM [1, 1, Hkv*D]
    out_ref,  # VMEM [1, Hq, D]
    acc_ref,  # VMEM [Hq, D] f32
    m_ref,  # VMEM [Hq, 128] f32
    l_ref,  # VMEM [Hq, 128] f32
    *,
    block: int,
    scale: float,
    n_kv_heads: int,
    head_dim: int,
):
    """int8-KV variant of :func:`_kernel_layered` (int8 phase 2, VERDICT r1
    next #7): the FLUSHED prefix crosses HBM as int8 + per-(head, token)
    f32 scales — half the cache traffic of the bf16 kernel. Dequant rides
    the operand read (int8 -> f32 convert) plus two cheap rank-expanded
    multiplies: key scales fold into the scores AFTER the q.k dot (scores
    of head h, column t scale by ks[h, t]); value scales fold into the
    probabilities BEFORE the p.v dot (each probability is multiplied by
    its column's value scale — legal because GQA row h only consumes its
    own head's value block). The recent tail stays EXACT: the time-major
    stage and the current column are bf16, quantization happens once per
    stage flush (models/backbone.flush_kv_stage), never per step."""
    t = pl.program_id(1)
    seq_end = scalars_ref[0]
    nblocks = pl.cdiv(seq_end, block)
    Hq = q_ref.shape[1]
    G = Hq // n_kv_heads
    D = head_dim

    row_head = jax.lax.broadcasted_iota(jnp.int32, (Hq, n_kv_heads * D), 0) // G
    col_head = jax.lax.broadcasted_iota(jnp.int32, (Hq, n_kv_heads * D), 1) // D
    diag = row_head == col_head
    q_full = jnp.tile(q_ref[0].astype(jnp.float32) * scale, (1, n_kv_heads))
    q_diag = jnp.where(diag, q_full, 0.0)

    @pl.when(t == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(t < nblocks)
    def _():
        k = k_ref[0, 0].astype(jnp.float32)  # int8 -> f32 in operand read
        v = v_ref[0, 0].astype(jnp.float32)
        # Per-head scale rows expanded to q rows (row h uses kv head h//G):
        # a static sublane broadcast per kv head — no gather, no transpose.
        ksc = ksc_ref[0, 0]  # [Hkv, BLOCK] f32
        vsc = vsc_ref[0, 0]
        ks_rows = jnp.concatenate(
            [jnp.broadcast_to(ksc[h : h + 1], (G, block))
             for h in range(n_kv_heads)], axis=0,
        )  # [Hq, BLOCK]
        vs_rows = jnp.concatenate(
            [jnp.broadcast_to(vsc[h : h + 1], (G, block))
             for h in range(n_kv_heads)], axis=0,
        )
        scores = jax.lax.dot_general(
            q_diag, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * ks_rows
        pos = t * block + jax.lax.broadcasted_iota(jnp.int32, (Hq, block), 1)
        scores = jnp.where(pos < seq_end, scores, NEG_INF)

        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)
        l_ref[:, :1] = l_ref[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        m_ref[:, :1] = m_new
        pv = jax.lax.dot_general(
            p * vs_rows, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        pvm = jnp.where(diag, pv, 0.0)
        own = pvm[:, :D]
        for h in range(1, n_kv_heads):
            own = own + pvm[:, h * D : (h + 1) * D]
        acc_ref[:] = acc_ref[:] * alpha + own

    @pl.when(t == pl.num_programs(1) - 1)
    def _():
        # Identical bf16 stage/current epilogue as _kernel_layered.
        stage_len = scalars_ref[1]
        STAGE = ks_ref.shape[2]
        qT = jnp.transpose(q_ref[0].astype(jnp.float32) * scale)
        qT_full = jnp.concatenate([qT] * n_kv_heads, axis=0)
        rowT = jax.lax.broadcasted_iota(jnp.int32, (n_kv_heads * D, Hq), 0) // D
        colT = jax.lax.broadcasted_iota(jnp.int32, (n_kv_heads * D, Hq), 1) // G
        diagT = rowT == colT
        qT_diag = jnp.where(diagT, qT_full, 0.0)

        k_s = ks_ref[0, 0].astype(jnp.float32)
        v_s = vs_ref[0, 0].astype(jnp.float32)
        scores_sT = jax.lax.dot_general(
            k_s, qT_diag, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        srow = jax.lax.broadcasted_iota(jnp.int32, (STAGE, Hq), 0)
        scores_sT = jnp.where(srow < stage_len, scores_sT, NEG_INF)

        kc = kc_ref[0, 0].astype(jnp.float32)
        vc = vc_ref[0, 0].astype(jnp.float32)
        s_curT = jnp.sum(qT_diag * kc[:, None], axis=0, keepdims=True)

        tail_max = jnp.maximum(jnp.max(scores_sT, axis=0, keepdims=True), s_curT)
        m_prevT = jnp.transpose(m_ref[:, :1])
        m_finT = jnp.maximum(m_prevT, tail_max)
        p_sT = jnp.exp(scores_sT - m_finT)
        p_curT = jnp.exp(s_curT - m_finT)
        alphaT = jnp.exp(m_prevT - m_finT)

        pv_s = jax.lax.dot_general(
            p_sT, v_s, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        vm = jnp.where(diag, jnp.broadcast_to(vc[None, :], diag.shape), 0.0)
        tail = jnp.where(diag, pv_s, 0.0) + jnp.transpose(p_curT) * vm
        own = tail[:, :D]
        for h in range(1, n_kv_heads):
            own = own + tail[:, h * D : (h + 1) * D]

        alpha = jnp.transpose(alphaT)
        l_fin = l_ref[:, :1] * alpha + jnp.transpose(
            jnp.sum(p_sT, axis=0, keepdims=True) + p_curT
        )
        acc = acc_ref[:] * alpha + own
        out_ref[0] = (acc / l_fin).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def decode_attention_pallas_layered_q(
    q: jnp.ndarray,  # [B, 1, Hq, D]
    k_cache: jnp.ndarray,  # [L, B, Hkv, D, T] int8 flushed prefix
    v_cache: jnp.ndarray,  # [L, B, Hkv, D, T] int8
    k_scale: jnp.ndarray,  # [L, B, Hkv, T] f32
    v_scale: jnp.ndarray,  # [L, B, Hkv, T] f32
    k_stage: jnp.ndarray,  # [L, B, STAGE, Hkv*D] bf16 (exact tail)
    v_stage: jnp.ndarray,  # [L, B, STAGE, Hkv*D]
    k_cur: jnp.ndarray,  # [B, Hkv, D, 1] bf16
    v_cur: jnp.ndarray,  # [B, Hkv, D, 1]
    flushed_end: jnp.ndarray,
    stage_len: jnp.ndarray,
    layer: jnp.ndarray,
    block: int = DEFAULT_BLOCK,
    interpret: bool = False,
) -> jnp.ndarray:
    B, S, Hq, D = q.shape
    assert S == 1
    assert k_cache.dtype == jnp.int8
    L, _, Hkv, _, T = k_cache.shape
    STAGE = k_stage.shape[2]
    block = min(block, T)
    if T % block:
        block = T
    nt = pl.cdiv(T, block)
    scale = 1.0 / (D ** 0.5)

    qg = q.reshape(B, Hq, D)
    kcv = k_cache.reshape(L, B, Hkv * D, T)
    vcv = v_cache.reshape(L, B, Hkv * D, T)
    kcur = k_cur.reshape(B, 1, Hkv * D)
    vcur = v_cur.reshape(B, 1, Hkv * D)
    scalars = jnp.stack([
        jnp.asarray(flushed_end, jnp.int32),
        jnp.asarray(stage_len, jnp.int32),
        jnp.asarray(layer, jnp.int32),
    ])

    def kv_index(b, t, sc_ref):
        last = jax.lax.max(pl.cdiv(sc_ref[0], block) - 1, 0)
        return (sc_ref[2], b, 0, jax.lax.min(t, last))

    def stage_index(b, t, sc_ref):
        return (sc_ref[2], b, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec((1, Hq, D), lambda b, t, sc: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Hkv * D, block), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Hkv * D, block), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Hkv, block), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Hkv, block), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, STAGE, Hkv * D), stage_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, STAGE, Hkv * D), stage_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Hkv * D), lambda b, t, sc: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Hkv * D), lambda b, t, sc: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Hq, D), lambda b, t, sc: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((Hq, D), jnp.float32),
            pltpu.VMEM((Hq, 128), jnp.float32),
            pltpu.VMEM((Hq, 128), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel_layered_q, block=block, scale=scale,
            n_kv_heads=Hkv, head_dim=D,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hq, D), q.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(scalars, qg, kcv, vcv, k_scale, v_scale, k_stage, v_stage, kcur, vcur)
    return out.reshape(B, 1, Hq, D)


def _kernel_pooled(
    scalars_ref,  # SMEM [1 + B]: (layer, prefix_end_0, ..., prefix_end_{B-1})
    q_ref,  # VMEM [1, Hq, D]
    k_ref,  # VMEM [1, 1, Hkv*D, BLOCK]
    v_ref,  # VMEM [1, 1, Hkv*D, BLOCK]
    kc_ref,  # VMEM [1, 1, Hkv*D]
    vc_ref,  # VMEM [1, 1, Hkv*D]
    out_ref,  # VMEM [1, Hq, D]
    acc_ref,  # VMEM [Hq, D] f32
    m_ref,  # VMEM [Hq, 128] f32
    l_ref,  # VMEM [Hq, 128] f32
    *,
    block: int,
    scale: float,
    n_kv_heads: int,
    head_dim: int,
):
    """Pooled (continuous-batching) flash-decode: like the layered kernel
    but every batch row sits at its OWN cache position — ``prefix_end`` is
    a per-row scalar-prefetch vector, so rows of one pooled step can be at
    step 3 and step 2000 simultaneously. No stage (pool mode splices
    columns directly); the current token folds in the epilogue."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    seq_end = scalars_ref[1 + b]
    nblocks = pl.cdiv(seq_end, block)
    Hq = q_ref.shape[1]
    G = Hq // n_kv_heads
    D = head_dim

    def make_q_diag():
        # Built inside the active pl.when bodies only: with per-row early
        # stop, most (b, t) programs are no-ops and must not pay the
        # iota/mask build (grid is B * nT programs at pool batch sizes).
        row_head = jax.lax.broadcasted_iota(
            jnp.int32, (Hq, n_kv_heads * D), 0) // G
        col_head = jax.lax.broadcasted_iota(
            jnp.int32, (Hq, n_kv_heads * D), 1) // D
        diag = row_head == col_head
        q_full = jnp.tile(q_ref[0].astype(jnp.float32) * scale,
                          (1, n_kv_heads))
        return diag, jnp.where(diag, q_full, 0.0)

    @pl.when(t == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(t < nblocks)
    def _():
        diag, q_diag = make_q_diag()
        k = k_ref[0, 0].astype(jnp.float32)
        v = v_ref[0, 0].astype(jnp.float32)
        scores = jax.lax.dot_general(
            q_diag, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        pos = t * block + jax.lax.broadcasted_iota(jnp.int32, (Hq, block), 1)
        scores = jnp.where(pos < seq_end, scores, NEG_INF)

        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        pr = jnp.exp(scores - m_new)
        l_ref[:, :1] = l_ref[:, :1] * alpha + jnp.sum(pr, axis=-1, keepdims=True)
        m_ref[:, :1] = m_new
        pv = jax.lax.dot_general(
            pr, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        pvm = jnp.where(diag, pv, 0.0)
        own = pvm[:, :D]
        for h in range(1, n_kv_heads):
            own = own + pvm[:, h * D : (h + 1) * D]
        acc_ref[:] = acc_ref[:] * alpha + own

    @pl.when(t == pl.num_programs(1) - 1)
    def _():
        diag, q_diag = make_q_diag()
        kc = kc_ref[0, 0].astype(jnp.float32)
        vc = vc_ref[0, 0].astype(jnp.float32)
        s_cur = jnp.sum(q_diag * kc[None, :], axis=-1, keepdims=True)
        m_prev = m_ref[:, :1]
        m_fin = jnp.maximum(m_prev, s_cur)
        alpha = jnp.exp(m_prev - m_fin)
        p_cur = jnp.exp(s_cur - m_fin)
        vm = jnp.where(diag, jnp.broadcast_to(vc[None, :], diag.shape), 0.0)
        v_own = vm[:, :D]
        for h in range(1, n_kv_heads):
            v_own = v_own + vm[:, h * D : (h + 1) * D]
        l_fin = l_ref[:, :1] * alpha + p_cur
        acc = acc_ref[:] * alpha + p_cur * v_own
        out_ref[0] = (acc / l_fin).astype(out_ref.dtype)


def _kernel_pooled_staged(
    scalars_ref,  # SMEM [1+2B]: (layer, base_0..base_{B-1}, len_0..len_{B-1})
    q_ref,  # VMEM [1, Hq, D]
    k_ref,  # VMEM [1, 1, Hkv*D, BLOCK]
    v_ref,  # VMEM [1, 1, Hkv*D, BLOCK]
    ks_ref,  # VMEM [1, 1, STAGE, Hkv*D] per-row time-major ring stage
    vs_ref,  # VMEM [1, 1, STAGE, Hkv*D]
    kc_ref,  # VMEM [1, 1, Hkv*D]
    vc_ref,  # VMEM [1, 1, Hkv*D]
    out_ref,  # VMEM [1, Hq, D]
    acc_ref,  # VMEM [Hq, D] f32
    m_ref,  # VMEM [Hq, 128] f32
    l_ref,  # VMEM [Hq, 128] f32
    *,
    block: int,
    scale: float,
    n_kv_heads: int,
    head_dim: int,
    n_rows: int,
    q_dtype_min_blocks: int = 0,  # unused; keeps signature future-proof
):
    """Pooled flash-decode with PER-ROW ring stages (VERDICT r1, next #2):
    row b attends its flushed prefix ``[0, base_b)`` from the time-minor
    cache, its ring window (``len_b`` time-major stage rows holding
    positions ``[base_b, base_b + len_b)``), and the current column.
    Replaces the per-step per-row time-minor column splice (~1.4 ms/step
    at 16 rows — tile read-modify-writes across every (layer, head)
    regardless of T) with cheap time-major ring writes; the strided splice
    happens ONCE per scheduler segment (engine/pool.py flush)."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    base = scalars_ref[1 + b]
    stage_len = scalars_ref[1 + n_rows + b]
    nblocks = pl.cdiv(base, block)
    Hq = q_ref.shape[1]
    G = Hq // n_kv_heads
    D = head_dim

    def make_diag():
        row_head = jax.lax.broadcasted_iota(
            jnp.int32, (Hq, n_kv_heads * D), 0) // G
        col_head = jax.lax.broadcasted_iota(
            jnp.int32, (Hq, n_kv_heads * D), 1) // D
        return row_head == col_head

    @pl.when(t == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(t < nblocks)
    def _():
        diag = make_diag()
        q_full = jnp.tile(q_ref[0].astype(jnp.float32) * scale,
                          (1, n_kv_heads))
        q_diag = jnp.where(diag, q_full, 0.0)
        k = k_ref[0, 0].astype(jnp.float32)
        v = v_ref[0, 0].astype(jnp.float32)
        scores = jax.lax.dot_general(
            q_diag, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        pos = t * block + jax.lax.broadcasted_iota(jnp.int32, (Hq, block), 1)
        scores = jnp.where(pos < base, scores, NEG_INF)

        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)
        l_ref[:, :1] = l_ref[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        m_ref[:, :1] = m_new
        pv = jax.lax.dot_general(
            p, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        pvm = jnp.where(diag, pv, 0.0)
        own = pvm[:, :D]
        for h in range(1, n_kv_heads):
            own = own + pvm[:, h * D : (h + 1) * D]
        acc_ref[:] = acc_ref[:] * alpha + own

    @pl.when(t == pl.num_programs(1) - 1)
    def _():
        # Ring stage + current column epilogue (same dataflow as the
        # layered kernel's, with per-row scalars).
        diag = make_diag()
        STAGE = ks_ref.shape[2]
        qT = jnp.transpose(q_ref[0].astype(jnp.float32) * scale)
        qT_full = jnp.concatenate([qT] * n_kv_heads, axis=0)
        rowT = jax.lax.broadcasted_iota(jnp.int32, (n_kv_heads * D, Hq), 0) // D
        colT = jax.lax.broadcasted_iota(jnp.int32, (n_kv_heads * D, Hq), 1) // G
        diagT = rowT == colT
        qT_diag = jnp.where(diagT, qT_full, 0.0)

        k_s = ks_ref[0, 0].astype(jnp.float32)
        v_s = vs_ref[0, 0].astype(jnp.float32)
        scores_sT = jax.lax.dot_general(
            k_s, qT_diag, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        srow = jax.lax.broadcasted_iota(jnp.int32, (STAGE, Hq), 0)
        scores_sT = jnp.where(srow < stage_len, scores_sT, NEG_INF)

        kc = kc_ref[0, 0].astype(jnp.float32)
        vc = vc_ref[0, 0].astype(jnp.float32)
        s_curT = jnp.sum(qT_diag * kc[:, None], axis=0, keepdims=True)

        tail_max = jnp.maximum(jnp.max(scores_sT, axis=0, keepdims=True),
                               s_curT)
        m_prevT = jnp.transpose(m_ref[:, :1])
        m_finT = jnp.maximum(m_prevT, tail_max)
        p_sT = jnp.exp(scores_sT - m_finT)
        p_curT = jnp.exp(s_curT - m_finT)
        alphaT = jnp.exp(m_prevT - m_finT)

        pv_s = jax.lax.dot_general(
            p_sT, v_s, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        vm = jnp.where(diag, jnp.broadcast_to(vc[None, :], diag.shape), 0.0)
        tail = jnp.where(diag, pv_s, 0.0) + jnp.transpose(p_curT) * vm
        own = tail[:, :D]
        for h in range(1, n_kv_heads):
            own = own + tail[:, h * D : (h + 1) * D]

        alpha = jnp.transpose(alphaT)
        l_fin = l_ref[:, :1] * alpha + jnp.transpose(
            jnp.sum(p_sT, axis=0, keepdims=True) + p_curT
        )
        acc = acc_ref[:] * alpha + own
        out_ref[0] = (acc / l_fin).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def decode_attention_pallas_pooled_staged(
    q: jnp.ndarray,  # [B, 1, Hq, D]
    k_cache: jnp.ndarray,  # [L, B, Hkv, D, T] flushed prefixes (read-only)
    v_cache: jnp.ndarray,
    k_stage: jnp.ndarray,  # [L, B, STAGE, Hkv*D] per-row ring stages
    v_stage: jnp.ndarray,
    k_cur: jnp.ndarray,  # [B, Hkv, D, 1]
    v_cur: jnp.ndarray,
    bases: jnp.ndarray,  # [B] int32 per-row flushed watermark
    stage_lens: jnp.ndarray,  # [B] int32 per-row valid ring rows (excl. cur)
    layer: jnp.ndarray,
    block: int = DEFAULT_BLOCK,
    interpret: bool = False,
) -> jnp.ndarray:
    B, S, Hq, D = q.shape
    assert S == 1
    L, _, Hkv, _, T = k_cache.shape
    STAGE = k_stage.shape[2]
    block = min(block, T)
    if T % block:
        block = T
    nt = pl.cdiv(T, block)
    scale = 1.0 / (D ** 0.5)

    qg = q.reshape(B, Hq, D)
    kcv = k_cache.reshape(L, B, Hkv * D, T)
    vcv = v_cache.reshape(L, B, Hkv * D, T)
    kcur = k_cur.reshape(B, 1, Hkv * D)
    vcur = v_cur.reshape(B, 1, Hkv * D)
    scalars = jnp.concatenate([
        jnp.asarray(layer, jnp.int32).reshape(1),
        jnp.asarray(bases, jnp.int32).reshape(B),
        jnp.asarray(stage_lens, jnp.int32).reshape(B),
    ])

    def kv_index(b, t, sc_ref):
        last = jax.lax.max(pl.cdiv(sc_ref[1 + b], block) - 1, 0)
        return (sc_ref[0], b, 0, jax.lax.min(t, last))

    def stage_index(b, t, sc_ref):
        return (sc_ref[0], b, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec((1, Hq, D), lambda b, t, sc: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Hkv * D, block), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Hkv * D, block), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, STAGE, Hkv * D), stage_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, STAGE, Hkv * D), stage_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Hkv * D), lambda b, t, sc: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Hkv * D), lambda b, t, sc: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Hq, D), lambda b, t, sc: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((Hq, D), jnp.float32),
            pltpu.VMEM((Hq, 128), jnp.float32),
            pltpu.VMEM((Hq, 128), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel_pooled_staged, block=block, scale=scale,
            n_kv_heads=Hkv, head_dim=D, n_rows=B,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hq, D), q.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(scalars, qg, kcv, vcv, k_stage, v_stage, kcur, vcur)
    return out.reshape(B, 1, Hq, D)


def _kernel_pooled_staged_q(
    scalars_ref,  # SMEM [1+2B]: (layer, base_0..base_{B-1}, len_0..len_{B-1})
    q_ref,  # VMEM [1, Hq, D]
    k_ref,  # VMEM [1, 1, Hkv*D, BLOCK] int8 flushed prefix
    v_ref,  # VMEM [1, 1, Hkv*D, BLOCK] int8
    ksc_ref,  # VMEM [1, 1, Hkv, BLOCK] f32 per-(head, token) key scales
    vsc_ref,  # VMEM [1, 1, Hkv, BLOCK] f32 value scales
    ks_ref,  # VMEM [1, 1, STAGE, Hkv*D] per-row ring stage (exact bf16)
    vs_ref,  # VMEM [1, 1, STAGE, Hkv*D]
    kc_ref,  # VMEM [1, 1, Hkv*D] current column (exact)
    vc_ref,  # VMEM [1, 1, Hkv*D]
    out_ref,  # VMEM [1, Hq, D]
    acc_ref,  # VMEM [Hq, D] f32
    m_ref,  # VMEM [Hq, 128] f32
    l_ref,  # VMEM [Hq, 128] f32
    *,
    block: int,
    scale: float,
    n_kv_heads: int,
    head_dim: int,
    n_rows: int,
):
    """int8-KV pooled-staged flash-decode: the per-row flushed prefix
    crosses HBM as int8 + per-(head, token) f32 scales (half the cache
    traffic — at pool scale the KV read is ~100 KB/token/request and
    rivals the int8 weight read late in generation), the ring window and
    current column stay exact. Same per-row (base, len) machinery as
    :func:`_kernel_pooled_staged`; same scale folding as
    :func:`_kernel_layered_q` (key scales into the scores after the q.k
    dot, value scales into the probabilities before the p.v dot)."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    base = scalars_ref[1 + b]
    stage_len = scalars_ref[1 + n_rows + b]
    nblocks = pl.cdiv(base, block)
    Hq = q_ref.shape[1]
    G = Hq // n_kv_heads
    D = head_dim

    def make_diag():
        row_head = jax.lax.broadcasted_iota(
            jnp.int32, (Hq, n_kv_heads * D), 0) // G
        col_head = jax.lax.broadcasted_iota(
            jnp.int32, (Hq, n_kv_heads * D), 1) // D
        return row_head == col_head

    @pl.when(t == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(t < nblocks)
    def _():
        diag = make_diag()
        q_full = jnp.tile(q_ref[0].astype(jnp.float32) * scale,
                          (1, n_kv_heads))
        q_diag = jnp.where(diag, q_full, 0.0)
        k = k_ref[0, 0].astype(jnp.float32)  # int8 -> f32 in operand read
        v = v_ref[0, 0].astype(jnp.float32)
        ksc = ksc_ref[0, 0]  # [Hkv, BLOCK] f32
        vsc = vsc_ref[0, 0]
        ks_rows = jnp.concatenate(
            [jnp.broadcast_to(ksc[h : h + 1], (G, block))
             for h in range(n_kv_heads)], axis=0,
        )  # [Hq, BLOCK]
        vs_rows = jnp.concatenate(
            [jnp.broadcast_to(vsc[h : h + 1], (G, block))
             for h in range(n_kv_heads)], axis=0,
        )
        scores = jax.lax.dot_general(
            q_diag, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * ks_rows
        pos = t * block + jax.lax.broadcasted_iota(jnp.int32, (Hq, block), 1)
        scores = jnp.where(pos < base, scores, NEG_INF)

        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)
        l_ref[:, :1] = l_ref[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        m_ref[:, :1] = m_new
        pv = jax.lax.dot_general(
            p * vs_rows, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        pvm = jnp.where(diag, pv, 0.0)
        own = pvm[:, :D]
        for h in range(1, n_kv_heads):
            own = own + pvm[:, h * D : (h + 1) * D]
        acc_ref[:] = acc_ref[:] * alpha + own

    @pl.when(t == pl.num_programs(1) - 1)
    def _():
        # Exact ring stage + current column epilogue — identical to
        # _kernel_pooled_staged's.
        diag = make_diag()
        STAGE = ks_ref.shape[2]
        qT = jnp.transpose(q_ref[0].astype(jnp.float32) * scale)
        qT_full = jnp.concatenate([qT] * n_kv_heads, axis=0)
        rowT = jax.lax.broadcasted_iota(jnp.int32, (n_kv_heads * D, Hq), 0) // D
        colT = jax.lax.broadcasted_iota(jnp.int32, (n_kv_heads * D, Hq), 1) // G
        diagT = rowT == colT
        qT_diag = jnp.where(diagT, qT_full, 0.0)

        k_s = ks_ref[0, 0].astype(jnp.float32)
        v_s = vs_ref[0, 0].astype(jnp.float32)
        scores_sT = jax.lax.dot_general(
            k_s, qT_diag, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        srow = jax.lax.broadcasted_iota(jnp.int32, (STAGE, Hq), 0)
        scores_sT = jnp.where(srow < stage_len, scores_sT, NEG_INF)

        kc = kc_ref[0, 0].astype(jnp.float32)
        vc = vc_ref[0, 0].astype(jnp.float32)
        s_curT = jnp.sum(qT_diag * kc[:, None], axis=0, keepdims=True)

        tail_max = jnp.maximum(jnp.max(scores_sT, axis=0, keepdims=True),
                               s_curT)
        m_prevT = jnp.transpose(m_ref[:, :1])
        m_finT = jnp.maximum(m_prevT, tail_max)
        p_sT = jnp.exp(scores_sT - m_finT)
        p_curT = jnp.exp(s_curT - m_finT)
        alphaT = jnp.exp(m_prevT - m_finT)

        pv_s = jax.lax.dot_general(
            p_sT, v_s, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        vm = jnp.where(diag, jnp.broadcast_to(vc[None, :], diag.shape), 0.0)
        tail = jnp.where(diag, pv_s, 0.0) + jnp.transpose(p_curT) * vm
        own = tail[:, :D]
        for h in range(1, n_kv_heads):
            own = own + tail[:, h * D : (h + 1) * D]

        alpha = jnp.transpose(alphaT)
        l_fin = l_ref[:, :1] * alpha + jnp.transpose(
            jnp.sum(p_sT, axis=0, keepdims=True) + p_curT
        )
        acc = acc_ref[:] * alpha + own
        out_ref[0] = (acc / l_fin).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def decode_attention_pallas_pooled_staged_q(
    q: jnp.ndarray,  # [B, 1, Hq, D]
    k_cache: jnp.ndarray,  # [L, B, Hkv, D, T] int8 flushed prefixes
    v_cache: jnp.ndarray,  # int8
    k_scale: jnp.ndarray,  # [L, B, Hkv, T] f32
    v_scale: jnp.ndarray,  # [L, B, Hkv, T] f32
    k_stage: jnp.ndarray,  # [L, B, STAGE, Hkv*D] per-row ring stages (exact)
    v_stage: jnp.ndarray,
    k_cur: jnp.ndarray,  # [B, Hkv, D, 1]
    v_cur: jnp.ndarray,
    bases: jnp.ndarray,  # [B] int32 per-row flushed watermark
    stage_lens: jnp.ndarray,  # [B] int32 per-row valid ring rows (excl. cur)
    layer: jnp.ndarray,
    block: int = DEFAULT_BLOCK,
    interpret: bool = False,
) -> jnp.ndarray:
    B, S, Hq, D = q.shape
    assert S == 1
    assert k_cache.dtype == jnp.int8
    L, _, Hkv, _, T = k_cache.shape
    STAGE = k_stage.shape[2]
    block = min(block, T)
    if T % block:
        block = T
    nt = pl.cdiv(T, block)
    scale = 1.0 / (D ** 0.5)

    qg = q.reshape(B, Hq, D)
    kcv = k_cache.reshape(L, B, Hkv * D, T)
    vcv = v_cache.reshape(L, B, Hkv * D, T)
    kcur = k_cur.reshape(B, 1, Hkv * D)
    vcur = v_cur.reshape(B, 1, Hkv * D)
    scalars = jnp.concatenate([
        jnp.asarray(layer, jnp.int32).reshape(1),
        jnp.asarray(bases, jnp.int32).reshape(B),
        jnp.asarray(stage_lens, jnp.int32).reshape(B),
    ])

    def kv_index(b, t, sc_ref):
        last = jax.lax.max(pl.cdiv(sc_ref[1 + b], block) - 1, 0)
        return (sc_ref[0], b, 0, jax.lax.min(t, last))

    def stage_index(b, t, sc_ref):
        return (sc_ref[0], b, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec((1, Hq, D), lambda b, t, sc: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Hkv * D, block), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Hkv * D, block), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Hkv, block), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Hkv, block), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, STAGE, Hkv * D), stage_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, STAGE, Hkv * D), stage_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Hkv * D), lambda b, t, sc: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Hkv * D), lambda b, t, sc: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Hq, D), lambda b, t, sc: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((Hq, D), jnp.float32),
            pltpu.VMEM((Hq, 128), jnp.float32),
            pltpu.VMEM((Hq, 128), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel_pooled_staged_q, block=block, scale=scale,
            n_kv_heads=Hkv, head_dim=D, n_rows=B,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hq, D), q.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(scalars, qg, kcv, vcv, k_scale, v_scale, k_stage, v_stage, kcur, vcur)
    return out.reshape(B, 1, Hq, D)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def decode_attention_pallas_pooled(
    q: jnp.ndarray,  # [B, 1, Hq, D]
    k_cache: jnp.ndarray,  # [L, B, Hkv, D, T] (read-only; cur col absent)
    v_cache: jnp.ndarray,  # [L, B, Hkv, D, T]
    k_cur: jnp.ndarray,  # [B, Hkv, D, 1]
    v_cur: jnp.ndarray,  # [B, Hkv, D, 1]
    prefix_ends: jnp.ndarray,  # [B] int32 per-row valid prefix (excl. cur)
    layer: jnp.ndarray,  # scalar int32
    block: int = DEFAULT_BLOCK,
    interpret: bool = False,
) -> jnp.ndarray:
    B, S, Hq, D = q.shape
    assert S == 1
    L, _, Hkv, _, T = k_cache.shape
    block = min(block, T)
    if T % block:
        block = T
    nt = pl.cdiv(T, block)
    scale = 1.0 / (D ** 0.5)

    qg = q.reshape(B, Hq, D)
    kcv = k_cache.reshape(L, B, Hkv * D, T)
    vcv = v_cache.reshape(L, B, Hkv * D, T)
    kcur = k_cur.reshape(B, 1, Hkv * D)
    vcur = v_cur.reshape(B, 1, Hkv * D)
    scalars = jnp.concatenate([
        jnp.asarray(layer, jnp.int32).reshape(1),
        jnp.asarray(prefix_ends, jnp.int32).reshape(B),
    ])

    def kv_index(b, t, sc_ref):
        last = jax.lax.max(pl.cdiv(sc_ref[1 + b], block) - 1, 0)
        return (sc_ref[0], b, 0, jax.lax.min(t, last))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec((1, Hq, D), lambda b, t, sc: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Hkv * D, block), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Hkv * D, block), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Hkv * D), lambda b, t, sc: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Hkv * D), lambda b, t, sc: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Hq, D), lambda b, t, sc: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((Hq, D), jnp.float32),
            pltpu.VMEM((Hq, 128), jnp.float32),
            pltpu.VMEM((Hq, 128), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel_pooled, block=block, scale=scale,
            n_kv_heads=Hkv, head_dim=D,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hq, D), q.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(scalars, qg, kcv, vcv, kcur, vcur)
    return out.reshape(B, 1, Hq, D)


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
    block = min(block, T)
    if T % block:
        block = T  # single block == array dim (always a legal Mosaic block)
    nt = pl.cdiv(T, block)
    scale = 1.0 / (D ** 0.5)

    qg = q.reshape(B, Hq, D)
    kcv = k_cache.reshape(B, Hkv * D, T)
    vcv = v_cache.reshape(B, Hkv * D, T)
    seq_end_arr = jnp.asarray(seq_end, jnp.int32).reshape(1)

    def kv_index(b, t, se_ref):
        # Clamp past the last valid block: same index => DMA skipped.
        last = jax.lax.max(pl.cdiv(se_ref[0], block) - 1, 0)
        return (b, 0, jax.lax.min(t, last))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec(
                (1, Hq, D), lambda b, t, se: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, Hkv * D, block), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hkv * D, block), kv_index, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, Hq, D), lambda b, t, se: (b, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((Hq, D), jnp.float32),
            pltpu.VMEM((Hq, 128), jnp.float32),
            pltpu.VMEM((Hq, 128), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel, block=block, scale=scale,
            n_kv_heads=Hkv, head_dim=D,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hq, D), q.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(seq_end_arr, qg, kcv, vcv)
    return out.reshape(B, 1, Hq, D)
