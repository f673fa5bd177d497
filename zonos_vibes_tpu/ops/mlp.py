"""Gated-SiLU ("SwiGLU") feed-forward (reference _torch.py:144-152).

``fc1: d_model -> 2*d_ff`` (no bias), chunk into ``(y, gate)``,
``out = fc2(y * silu(gate))``. Pure function over a param dict; weights are
stored ``[in, out]`` so the forward is a plain ``x @ W`` that XLA maps
straight onto the MXU in bf16.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def swiglu(x: jnp.ndarray, fc1_w: jnp.ndarray, fc2_w: jnp.ndarray) -> jnp.ndarray:
    h = x @ fc1_w  # [..., 2*F]
    y, gate = jnp.split(h, 2, axis=-1)
    return (y * jax.nn.silu(gate)) @ fc2_w


def swiglu_mid(x: jnp.ndarray, fc1: dict) -> jnp.ndarray:
    """fc1 + gate only — the fc2 INPUT ``y * silu(gate)``. Split out so
    quantization calibration can observe the fc2 input distribution
    (ops/quant.awq_fold) without re-deriving the gate math."""
    from .quant import proj_matmul

    h = proj_matmul(x, fc1)
    y, gate = jnp.split(h, 2, axis=-1)
    return y * jax.nn.silu(gate)


def swiglu_p(x: jnp.ndarray, fc1: dict, fc2: dict) -> jnp.ndarray:
    """Param-dict variant supporting int8 weight-only leaves (ops/quant)."""
    from .quant import proj_matmul

    return proj_matmul(swiglu_mid(x, fc1), fc2)
