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

import jax.numpy as jnp

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


def apply_rope(x: jnp.ndarray, positions: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
    """Rotate ``x`` by per-position angles.

    Args:
      x: ``[B, S, H, D]`` queries or keys.
      positions: ``[B, S]`` int32 absolute positions.
      table: output of :func:`rope_table` ``[P, D/2, 2]``.

    Returns ``[B, S, H, D]`` in ``x.dtype`` (rotation computed in fp32,
    matching the reference which casts ``freqs_cis`` against bf16 activations).
    """
    B, S, H, D = x.shape
    cs = table[positions]  # [B, S, D/2, 2]
    cos = cs[..., 0][:, :, None, :]  # [B, S, 1, D/2]
    sin = cs[..., 1][:, :, None, :]
    xf = x.astype(jnp.float32).reshape(B, S, H, D // 2, 2)
    xr, xi = xf[..., 0], xf[..., 1]
    out_r = xr * cos - xi * sin
    out_i = xr * sin + xi * cos
    out = jnp.stack([out_r, out_i], axis=-1).reshape(B, S, H, D)
    return out.astype(x.dtype)
