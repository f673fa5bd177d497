"""Conditioner zoo + PrefixConditioner — device-side, functional.

Behavioral spec: reference zonos/conditioning.py:11-51,219-313. Design split
for TPU: everything string-shaped (normalization, espeak, tokenization) runs
host-side in ``frontend/``; this module consumes only numeric arrays, so the
whole conditioning forward jits into one XLA program.

Each conditioner is (init_params, apply) with shared wrapper semantics:

* optional projection ``none | linear | mlp`` (mlp = Linear->SiLU->Linear,
  biases present — torch ``nn.Linear`` defaults);
* optional *learned unconditional vector* (zeros-init ``[output_dim]``)
  returned as ``[1, 1, D]`` when the cond input is absent;
* ``PrefixConditioner`` runs every conditioner (uncond vector when its key is
  missing), broadcasts batch to the max batch size, concatenates along the
  sequence dim, then ``LayerNorm(project(cat))``. ``required_keys`` are the
  conditioners without an uncond vector.

Weights are stored ``[in, out]`` (checkpoint loader transposes torch's
``[out, in]``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PrefixConditionerConfig
from ..frontend.text import VOCAB_SIZE as PHONEME_VOCAB_SIZE
from ..ops.norms import layer_norm


def _init_linear(key, d_in, d_out, dtype):
    kw, kb = jax.random.split(key)
    lim = 1.0 / np.sqrt(d_in)
    return {
        "weight": jax.random.uniform(kw, (d_in, d_out), jnp.float32, -lim, lim).astype(dtype),
        "bias": jax.random.uniform(kb, (d_out,), jnp.float32, -lim, lim).astype(dtype),
    }


def _apply_linear(p, x):
    return x @ p["weight"] + p["bias"]


def _init_projection(key, projection, cond_dim, output_dim, dtype):
    if projection == "linear":
        return {"linear": _init_linear(key, cond_dim, output_dim, dtype)}
    if projection == "mlp":
        k1, k2 = jax.random.split(key)
        return {
            "mlp0": _init_linear(k1, cond_dim, output_dim, dtype),
            "mlp2": _init_linear(k2, output_dim, output_dim, dtype),
        }
    return {}


def _apply_projection(p, x):
    if "linear" in p:
        return _apply_linear(p["linear"], x)
    if "mlp0" in p:
        return _apply_linear(p["mlp2"], jax.nn.silu(_apply_linear(p["mlp0"], x)))
    return x


class ConditionerSpec:
    """Static (hashable) description of one conditioner, parsed from the
    checkpoint config dict (type + kwargs)."""

    def __init__(self, cfg: dict, output_dim: int):
        self.type = cfg["type"]
        self.name = cfg.get("name", self.type)
        self.output_dim = output_dim
        self.cond_dim = cfg.get("cond_dim") or output_dim
        self.projection = cfg.get("projection", "none")
        self.uncond_type = cfg.get("uncond_type", "none")
        self.input_dim = cfg.get("input_dim", 1)
        self.std = cfg.get("std", 1.0)
        self.min_val = cfg.get("min_val", 0.0)
        self.max_val = cfg.get("max_val", 1.0)

    @property
    def has_uncond(self) -> bool:
        return self.uncond_type == "learned"


def init_conditioner(key, spec: ConditionerSpec, dtype=jnp.bfloat16) -> dict:
    k_proj, k_body = jax.random.split(key)
    params = {
        "project": _init_projection(
            k_proj, spec.projection, spec.cond_dim, spec.output_dim, dtype
        )
    }
    if spec.has_uncond:
        params["uncond_vector"] = jnp.zeros((spec.output_dim,), dtype)
    if spec.type == "EspeakPhonemeConditioner":
        params["phoneme_embedder"] = {
            "weight": (
                jax.random.normal(k_body, (PHONEME_VOCAB_SIZE, spec.output_dim))
            ).astype(dtype)
        }
    elif spec.type == "FourierConditioner":
        # Fixed random projection buffer [D/2, input_dim] ~ N(0, std^2),
        # never trained (conditioning.py:252).
        params["weight"] = (
            jax.random.normal(k_body, (spec.output_dim // 2, spec.input_dim))
            * spec.std
        ).astype(jnp.float32)
    elif spec.type == "IntegerConditioner":
        n = int(spec.max_val) - int(spec.min_val) + 1
        params["int_embedder"] = {
            "weight": jax.random.normal(k_body, (n, spec.output_dim)).astype(dtype)
        }
    elif spec.type == "PassthroughConditioner":
        pass
    else:
        raise ValueError(f"Unknown conditioner type {spec.type}")
    return params


def apply_conditioner(params: dict, spec: ConditionerSpec, value) -> jnp.ndarray:
    """``value=None`` -> learned uncond vector ``[1,1,D]``; else
    ``project(apply_cond(value))``. Numeric values are ``[B, S, dim]``."""
    if value is None:
        if "uncond_vector" not in params:
            raise ValueError(f"Conditioner {spec.name} has no uncond vector")
        return params["uncond_vector"].reshape(1, 1, -1)

    if spec.type == "EspeakPhonemeConditioner":
        # value: int32 phoneme ids [B, L] (host-tokenized)
        cond = params["phoneme_embedder"]["weight"][value]
    elif spec.type == "FourierConditioner":
        x = (value.astype(jnp.float32) - spec.min_val) / (spec.max_val - spec.min_val)
        f = 2.0 * jnp.pi * (x @ params["weight"].T)
        cond = jnp.concatenate([jnp.cos(f), jnp.sin(f)], axis=-1)
    elif spec.type == "IntegerConditioner":
        idx = value[..., 0].astype(jnp.int32) - int(spec.min_val)
        cond = params["int_embedder"]["weight"][idx]
    elif spec.type == "PassthroughConditioner":
        cond = value
    else:
        raise ValueError(spec.type)
    return _apply_projection(params["project"], cond)


class PrefixConditioner:
    """Static spec + functional apply for the full conditioner stack
    (conditioning.py:297-313)."""

    def __init__(self, config: PrefixConditionerConfig, output_dim: int):
        self.config = config
        self.output_dim = output_dim
        self.specs = [
            ConditionerSpec(c, output_dim) for c in config.conditioners_list
        ]
        self.required_keys = {s.name for s in self.specs if not s.has_uncond}

    def init(self, key, dtype=jnp.bfloat16) -> dict:
        keys = jax.random.split(key, len(self.specs) + 2)
        params = {
            "conditioners": {
                s.name: init_conditioner(k, s, dtype)
                for s, k in zip(self.specs, keys[:-2])
            },
            "project": _init_projection(
                keys[-2], self.config.projection, self.output_dim,
                self.output_dim, dtype,
            ),
            "norm": {
                "weight": jnp.ones((self.output_dim,), dtype),
                "bias": jnp.zeros((self.output_dim,), dtype),
            },
        }
        return params

    def apply(self, params: dict, cond_dict: dict) -> jnp.ndarray:
        missing = self.required_keys - set(cond_dict)
        if missing:
            raise ValueError(f"Missing required keys: {missing}")
        conds = []
        for spec in self.specs:
            conds.append(
                apply_conditioner(
                    params["conditioners"][spec.name], spec,
                    cond_dict.get(spec.name),
                )
            )
        max_b = max(c.shape[0] for c in conds)
        assert all(c.shape[0] in (max_b, 1) for c in conds)
        dtype = params["norm"]["weight"].dtype
        conds = [
            jnp.broadcast_to(c, (max_b,) + c.shape[1:]).astype(dtype) for c in conds
        ]
        cat = jnp.concatenate(conds, axis=-2)
        out = _apply_projection(params["project"], cat)
        return layer_norm(out, params["norm"]["weight"], params["norm"]["bias"])
