"""Rotary position embeddings, interleaved-pair convention.

Matches the reference math (zonos/backbone/_torch.py:9-30): the head dim is
viewed as ``head_dim/2`` complex pairs laid out *interleaved* —
``x[..., 2i]`` is the real part and ``x[..., 2i+1]`` the imaginary part of
pair ``i`` (``reshape(..., -1, 2)``), with the rotation table built from
``theta = 10000`` via ``polar``.

Per-row positions: batched rows with different prefix lengths get correct RoPE
by offsetting ``arange(seqlen)`` with a per-row length counter
(reference _torch.py:74-75); we take explicit position indices instead.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_ROPE_BASE = 10000.0
# Reference precomputes the table for 16384 positions (_torch.py:67).
DEFAULT_MAX_POSITIONS = 16384


def rope_table(
    head_dim: int,
    max_positions: int = DEFAULT_MAX_POSITIONS,
    base: float = DEFAULT_ROPE_BASE,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """``[max_positions, head_dim/2, 2]`` (cos, sin) table."""
    freqs = 1.0 / (
        base ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    t = jnp.arange(max_positions, dtype=jnp.float32)
    angles = jnp.outer(t, freqs)  # [P, head_dim/2]
    return jnp.stack([jnp.cos(angles), jnp.sin(angles)], axis=-1).astype(dtype)


def expand_rope_table(table: jnp.ndarray) -> jnp.ndarray:
    """Pre-expand a ``[P, D/2, 2]`` table into the lane-native ``[P, 2, D]``
    form :func:`apply_rope` consumes without any per-step data formatting.

    ``out[p, 0, d] = cos[p, d//2]`` (each cos duplicated over its pair) and
    ``out[p, 1, 2i] = -sin[p, i]``, ``out[p, 1, 2i+1] = +sin[p, i]`` (the
    rotation signs folded into the table). With these, the interleaved-pair
    rotation is two elementwise multiplies plus a pair-swap — no reshape to
    ``[..., D/2, 2]`` ever touches the (large) activations.
    """
    P = table.shape[0]
    cos, sin = table[:, :, 0], table[:, :, 1]
    cos_dup = jnp.repeat(cos, 2, axis=-1)  # [P, D]
    sin_signed = jnp.stack([-sin, sin], axis=-1).reshape(P, -1)
    return jnp.stack([cos_dup, sin_signed], axis=1)  # [P, 2, D]


@functools.lru_cache(maxsize=8)
def _pair_swap_matrix(D: int):
    """[D, D] permutation: ``(x @ M)[2i] = x[2i+1]``, ``(x @ M)[2i+1] = x[2i]``.

    The pair swap runs as one tiny MXU dot instead of strided slices — on
    decode steps the slice/stack formulation cost four per-layer layout
    copies plus a reshape (~140 us/step measured via xprof); the matmul
    fuses into the surrounding elementwise work. Exact in fp32: one
    nonzero (1.0) per output column.
    """
    m = np.zeros((D, D), np.float32)
    even = np.arange(0, D, 2)
    m[even + 1, even] = 1.0
    m[even, even + 1] = 1.0
    return m  # numpy (a cached jnp array would leak tracers across traces)


def apply_rope(x: jnp.ndarray, positions: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
    """Rotate ``x`` by per-position angles.

    Args:
      x: ``[B, S, H, D]`` queries or keys.
      positions: ``[B, S]`` int32 absolute positions.
      table: :func:`rope_table` ``[P, D/2, 2]`` or its pre-expanded
        :func:`expand_rope_table` form ``[P, 2, D]`` (expanded on the fly
        otherwise — the expansion is loop-invariant, XLA hoists it).

    Returns ``[B, S, H, D]`` in ``x.dtype`` (rotation computed in fp32,
    matching the reference which casts ``freqs_cis`` against bf16
    activations). Bit-identical to the slice/stack formulation: per output
    element the same two fp32 products and one add/subtract.
    """
    B, S, H, D = x.shape
    if table.ndim == 3 and table.shape[1] == D // 2 and table.shape[2] == 2:
        table = expand_rope_table(table)
    cs = table[positions]  # [B, S, 2, D]
    cos = cs[:, :, None, 0, :]  # [B, S, 1, D]
    sin = cs[:, :, None, 1, :]
    xf = x.astype(jnp.float32)
    swapped = jax.lax.dot_general(
        xf, _pair_swap_matrix(D), (((3,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )
    out = xf * cos + swapped * sin
    return out.astype(x.dtype)
