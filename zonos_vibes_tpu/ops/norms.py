"""Normalization layers (functional, fp32 accumulation).

The transformer backbone uses plain LayerNorm (not RMS) pre-norm
(reference _torch.py:61-62,88-89); the hybrid backbone optionally uses
RMSNorm with fused residual-add (reference _mamba_ssm.py:49-57). Both are
implemented here as pure functions over explicit param dicts so XLA fuses
them into neighbouring matmuls.
"""

from __future__ import annotations

import jax.numpy as jnp


def layer_norm(x: jnp.ndarray, weight, bias, eps: float = 1e-5) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def rms_norm(x: jnp.ndarray, weight, eps: float = 1e-5) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    ms = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    y = xf * jnp.reciprocal(jnp.sqrt(ms + eps))
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    return y.astype(x.dtype)


def add_norm(
    x: jnp.ndarray,
    residual,
    weight,
    bias,
    eps: float = 1e-5,
    use_rms: bool = False,
    residual_in_fp32: bool = False,
):
    """Fused residual-add + norm (hybrid-backbone semantics,
    reference _mamba_ssm.py:44-57): returns ``(normed, new_residual)``
    where ``new_residual = x + residual``.
    """
    res = x if residual is None else x + residual
    if residual_in_fp32:
        res = res.astype(jnp.float32)
    if use_rms:
        normed = rms_norm(res.astype(x.dtype), weight, eps)
    else:
        normed = layer_norm(res.astype(x.dtype), weight, bias, eps)
    return normed, res
