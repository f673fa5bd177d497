"""Delay codebook pattern as pure jnp (reference: zonos/codebook_pattern.py:5-12).

Semantics: the 9-codebook code grid ``[B, K, T]`` is padded with ``K`` columns
of MASK on the right and codebook ``k`` is shifted right by ``k + 1`` — frame
``t`` of codebook ``k`` lands at delayed column ``t + k + 1``. Each decode step
then emits one token per codebook with codebook ``k`` lagging ``k`` steps
behind codebook 0 (EOS cascades diagonally across codebooks).

These run on static shapes so they fuse freely under jit; the revert is pure
slicing so it compiles to views.
"""

from __future__ import annotations

import jax.numpy as jnp


def apply_delay_pattern(codes: jnp.ndarray, mask_token: int) -> jnp.ndarray:
    """``[B, K, T] -> [B, K, T + K]`` with codebook k rolled right by k+1.

    Positions that come "from the pad" (the first ``k + 1`` columns of row
    ``k`` and the trailing ones) carry ``mask_token``.
    """
    B, K, T = codes.shape
    padded = jnp.concatenate(
        [codes, jnp.full((B, K, K), mask_token, dtype=codes.dtype)], axis=-1
    )
    rows = []
    for k in range(K):
        rows.append(jnp.roll(padded[:, k, :], shift=k + 1, axis=-1))
    out = jnp.stack(rows, axis=1)
    # jnp.roll wraps values around; the wrapped-in prefix must be MASK.
    col = jnp.arange(T + K)[None, None, :]
    cb = jnp.arange(K)[None, :, None]
    return jnp.where(col <= cb, jnp.asarray(mask_token, codes.dtype), out)


def revert_delay_pattern(delayed: jnp.ndarray) -> jnp.ndarray:
    """``[B, K, T + K] -> [B, K, T]``: undo :func:`apply_delay_pattern`.

    Reference slice semantics (codebook_pattern.py:10-12):
    ``codes[:, k, k+1 : T_delayed - K + k + 1]``.
    """
    B, K, Td = delayed.shape
    T = Td - K
    rows = [delayed[:, k, k + 1 : Td - K + k + 1] for k in range(K)]
    return jnp.stack(rows, axis=1).reshape(B, K, T)
