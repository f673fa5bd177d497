"""Sequence-parallel prefill: ring attention (CP) and Ulysses all-to-all.

SURVEY.md §5.7: the reference has no long-context path (hard 30 s ceiling,
full KV preallocated). For long audio-prefix continuation and future >30 s
checkpoints the prefill gets two sequence-parallel strategies, both built as
``shard_map`` collectives over a named mesh axis (no hand-written
transport — SURVEY.md §5.8):

* **Ring attention** (`ring_attention_prefill`): queries stay put; K/V
  blocks hop around the ring via ``ppermute`` (ICI neighbor exchange),
  with blockwise online-softmax accumulation. Causality across chunks is
  block-triangular: chunk j contributes to chunk i fully when j < i,
  causal-within when j == i, not at all when j > i — so the mask never
  depends on data, only on ring positions.
* **Ulysses** (`ulysses_prefill`): ``all_to_all`` reshards sequence->heads,
  each device runs ordinary causal attention on the FULL sequence for its
  head subset, and a second ``all_to_all`` reshards back. Preferred when
  head count >= SP degree and the sequence is long enough that duplicate
  KV traffic beats ring latency.

Both compute q/k/v chunk-local (RoPE already applied with global positions)
and return outputs sharded exactly like the queries, so they are drop-in
inside a sequence-sharded backbone prefill.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e30


def _block_attend(q, k, v, scale, mask):
    """Scores for one (q-chunk, kv-chunk) pair with optional causal mask.
    q [B,S,Hq,D], k/v [B,S,Hkv,D] -> (scores_max, exp_scores@v, exp_sums)."""
    B, S, Hq, D = q.shape
    Hkv = k.shape[2]
    G = Hq // Hkv
    qg = q.reshape(B, S, Hkv, G, D).astype(jnp.float32) * scale
    scores = jnp.einsum("bikgd,bjkd->bkgij", qg, k.astype(jnp.float32))
    if mask is not None:
        scores = jnp.where(mask, scores, NEG_INF)
    return scores  # [B, Hkv, G, Sq, Skv]


def _online_update(m, l, acc, scores, v):
    """Fold one KV block into the online-softmax state."""
    B, Hkv, G, Sq, Skv = scores.shape
    m_blk = jnp.max(scores, axis=-1, keepdims=True)  # [B,Hkv,G,Sq,1]
    m_new = jnp.maximum(m, m_blk)
    alpha = jnp.exp(m - m_new)
    p = jnp.exp(scores - m_new)
    pv = jnp.einsum("bkgij,bjkd->bkgid", p, v.astype(jnp.float32))
    l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_new = acc * alpha[..., 0][..., None] + pv
    return m_new, l_new, acc_new


def _ring_body(q, k, v, axis_name: str):
    """Per-device ring attention (runs inside shard_map)."""
    B, S, Hq, D = q.shape
    Hkv = k.shape[2]
    G = Hq // Hkv
    n = jax.lax.axis_size(axis_name)
    my = jax.lax.axis_index(axis_name)
    scale = 1.0 / (D ** 0.5)

    m = jnp.full((B, Hkv, G, S, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((B, Hkv, G, S, 1), jnp.float32)
    acc = jnp.zeros((B, Hkv, G, S, D), jnp.float32)

    ii = jnp.arange(S)
    intra = (ii[:, None] >= ii[None, :])[None, None, None]  # causal in-chunk

    def step(carry, r):
        k_blk, v_blk, m, l, acc = carry
        src_chunk = (my - r) % n  # which chunk this K/V block came from

        def attend(args):
            m, l, acc = args
            mask = jnp.where(src_chunk == my, intra, True)
            scores = _block_attend(q, k_blk, v_blk, scale, mask)
            return _online_update(m, l, acc, scores, v_blk)

        m, l, acc = jax.lax.cond(
            src_chunk <= my, attend, lambda args: args, (m, l, acc)
        )
        # Pass K/V to the next device (ring over ICI).
        perm = [(i, (i + 1) % n) for i in range(n)]
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        return (k_blk, v_blk, m, l, acc), None

    (k, v, m, l, acc), _ = jax.lax.scan(
        step, (k, v, m, l, acc), jnp.arange(n)
    )
    out = acc / jnp.maximum(l, 1e-30)
    # [B,Hkv,G,S,D] -> [B,S,Hq,D]
    return out.transpose(0, 3, 1, 2, 4).reshape(B, S, Hq, D).astype(q.dtype)


def ring_attention_prefill(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    mesh: Mesh, axis_name: str = "model",
) -> jnp.ndarray:
    """Causal prefill attention with sequence sharded over ``axis_name``.

    Args: q ``[B, S, Hq, D]``, k/v ``[B, S, Hkv, D]`` — global shapes; S must
    divide by the axis size and chunks are contiguous (device i holds
    positions ``[i*S/n, (i+1)*S/n)``).
    """
    spec = P(None, axis_name, None, None)
    fn = shard_map(
        functools.partial(_ring_body, axis_name=axis_name),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return fn(q, k, v)


def _ulysses_body(q, k, v, axis_name: str):
    """Sequence->head reshard, full-seq causal attention, reshard back."""
    B, S_loc, Hq, D = q.shape
    Hkv = k.shape[2]
    n = jax.lax.axis_size(axis_name)
    G = Hq // Hkv

    # all_to_all: gather full sequence, scatter heads.
    qh = jax.lax.all_to_all(q, axis_name, split_axis=2, concat_axis=1, tiled=True)
    kh = jax.lax.all_to_all(k, axis_name, split_axis=2, concat_axis=1, tiled=True)
    vh = jax.lax.all_to_all(v, axis_name, split_axis=2, concat_axis=1, tiled=True)
    # qh: [B, S, Hq/n, D]
    S = S_loc * n
    Hq_l, Hkv_l = Hq // n, Hkv // n
    scale = 1.0 / (D ** 0.5)
    qg = qh.reshape(B, S, Hkv_l, Hq_l // Hkv_l, D).astype(jnp.float32) * scale
    scores = jnp.einsum("bikgd,bjkd->bkgij", qg, kh.astype(jnp.float32))
    ii = jnp.arange(S)
    mask = (ii[:, None] >= ii[None, :])[None, None, None]
    scores = jnp.where(mask, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bkgij,bjkd->bikgd", probs, vh.astype(jnp.float32))
    out = out.reshape(B, S, Hq_l, D).astype(q.dtype)
    # Scatter sequence back, gather heads.
    return jax.lax.all_to_all(out, axis_name, split_axis=1, concat_axis=2, tiled=True)


def ulysses_prefill(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    mesh: Mesh, axis_name: str = "model",
) -> jnp.ndarray:
    """Ulysses-style sequence-parallel causal attention. Requires
    ``Hkv % axis_size == 0``."""
    spec = P(None, axis_name, None, None)
    fn = shard_map(
        functools.partial(_ulysses_body, axis_name=axis_name),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return fn(q, k, v)


def _sp_decode_body(q, k_loc, v_loc, seq_end, axis_name: str):
    """Partial single-query attention over the local KV time-shard, then one
    max-shifted (numerator, denominator) psum — flash-decoding over ICI
    (SURVEY.md §5.7: each chip attends to the KV it produced)."""
    B, S, Hq, D = q.shape
    Hkv = k_loc.shape[1]
    T_loc = k_loc.shape[3]
    G = Hq // Hkv
    idx = jax.lax.axis_index(axis_name)

    qg = q.reshape(B, S, Hkv, G, D)
    scores = jnp.einsum(
        "bskgd,bkdt->bkgst", qg, k_loc, preferred_element_type=jnp.float32
    ) * (1.0 / jnp.sqrt(jnp.asarray(D, jnp.float32)))  # [B,Hkv,G,1,T_loc]
    pos = idx * T_loc + jnp.arange(T_loc, dtype=jnp.int32)
    valid = pos[None, None, None, None, :] < seq_end
    scores = jnp.where(valid, scores, NEG_INF)

    m_loc = jnp.max(scores, axis=-1, keepdims=True)
    m_glob = jax.lax.pmax(m_loc, axis_name)
    p = jnp.exp(scores - m_glob)  # fully-masked shards -> all zeros
    num = jnp.einsum(
        "bkgst,bkdt->bkgsd", p.astype(v_loc.dtype), v_loc,
        preferred_element_type=jnp.float32,
    )
    den = jnp.sum(p, axis=-1, keepdims=True)  # [B,Hkv,G,1,1]
    num = jax.lax.psum(num, axis_name)
    den = jax.lax.psum(den, axis_name)
    out = num / den  # [B,Hkv,G,1,D]
    return out.transpose(0, 3, 1, 2, 4).reshape(B, S, Hq, D).astype(q.dtype)


def sp_decode_attention(
    q: jnp.ndarray,  # [B, 1, Hq, D] (replicated)
    k_cache: jnp.ndarray,  # [B, Hkv, D, T] — TIME-sharded over axis_name
    v_cache: jnp.ndarray,
    seq_end,  # scalar int32: global valid length
    mesh: Mesh,
    axis_name: str = "model",
) -> jnp.ndarray:
    """Sequence-sharded single-query decode attention: the KV cache stays
    split along time (each device keeps the shard its prefill produced —
    no all-gather), and the softmax combines across devices with one
    ``pmax`` + two ``psum``s. Semantics identical to
    ops/attention.decode_attention on the gathered cache."""
    kv_spec = P(None, None, None, axis_name)
    rep = P(None, None, None, None)
    fn = shard_map(
        functools.partial(_sp_decode_body, axis_name=axis_name),
        mesh=mesh,
        in_specs=(rep, kv_spec, kv_spec, P()),
        out_specs=rep,
        check_vma=False,
    )
    return fn(q, k_cache, v_cache, jnp.asarray(seq_end, jnp.int32))
