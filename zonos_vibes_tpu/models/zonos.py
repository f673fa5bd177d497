"""Zonos model core: code embeddings, output heads, conditioning prep.

Behavioral spec: reference zonos/model.py:22-116. TPU-first engineering:

* the 9 per-codebook embedding tables / output heads are *stacked* along a
  leading codebook axis so embed/heads are single gathers/einsums (the
  reference loops over ``nn.ModuleList``, model.py:97-101);
* head weights are stored ``[K, d_model, vocab]`` so ``apply_heads`` is one
  MXU einsum producing ``[B, K, V]`` fp32 logits;
* vocab padding quirk reproduced exactly (zonos/utils.py:12-27): embedding
  tables pad only when ``d_model % 8 != 0`` (never for shipped checkpoints,
  so they stay 1026 rows); head out-dims pad ``1025 -> 1026``; logits
  ``[..., >= 1025]`` are forced to -inf (model.py:115) so the pad slot and
  MASK can never be sampled.

Everything here is functional: ``params`` pytrees in, arrays out. The decode
loop lives in ``engine/generate.py``.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..config import ZonosConfig
from ..ops.attention import NEG_INF
from .conditioners import PrefixConditioner
from .registry import backbone_for_config


@dataclass(frozen=True)
class ZonosModel:
    """Static model wrapper: config + conditioner specs. Parameters travel
    separately as a pytree (functional style — jit/pjit friendly)."""

    config: ZonosConfig
    backbone_name: str | None = None  # None = route by ssm_cfg (model.py:73-77)

    @property
    def backbone(self):
        return backbone_for_config(self.config.backbone, self.backbone_name)

    @property
    def prefix_conditioner(self) -> PrefixConditioner:
        return PrefixConditioner(
            self.config.prefix_conditioner, self.config.backbone.d_model
        )

    # -- init ---------------------------------------------------------------

    def init(self, key: jax.Array, dtype=jnp.bfloat16) -> dict:
        cfg = self.config
        D = cfg.backbone.d_model
        K = cfg.num_codebooks
        emb_v = cfg.vocab_size  # 1026
        head_v = self.head_out_dim
        k_emb, k_head, k_bb, k_cond = jax.random.split(key, 4)
        params = {
            "embeddings": {
                "weight": jax.random.normal(k_emb, (K, emb_v, D)).astype(dtype)
            },
            "heads": {
                "weight": (
                    jax.random.normal(k_head, (K, D, head_v)) / jnp.sqrt(D)
                ).astype(dtype)
            },
            "backbone": self.backbone.init(k_bb, dtype),
            "prefix_conditioner": self.prefix_conditioner.init(k_cond, dtype),
        }
        return params

    @property
    def head_out_dim(self) -> int:
        """Head vocab (1025) padded up to the MXU lane width — 1152 by
        default (config.head_pad_to_multiple). Pad slots are -inf-masked."""
        m = self.config.head_pad_to_multiple
        n = self.config.head_vocab_size
        return n if n % m == 0 else n + m - (n % m)

    # -- forward pieces -----------------------------------------------------

    def embed_codes(self, params: dict, codes: jnp.ndarray) -> jnp.ndarray:
        """``[B, K, S] int -> [B, S, D]``: sum of per-codebook embeddings
        (model.py:97-98). Supports int8 tables (ops/quant: per-channel
        scale [K, 1, D]) — the gather reads int8 rows, dequant applies to
        the K gathered rows only."""
        e = params["embeddings"]
        K = (e["weight_int8"] if "weight_int8" in e else e["weight"]).shape[0]
        idx = jnp.arange(K)[None, :, None]
        if "weight_int8" in e:
            rows = e["weight_int8"][idx, codes].astype(jnp.float32)
            rows = rows * e["scale"][None]  # [K,1,D] -> [1,K,1,D] bcast
            # "act_dtype" marker (zero-size) records the activation dtype the
            # bf16 table would have produced.
            return rows.sum(axis=1).astype(e["act_dtype"].dtype)
        gathered = e["weight"][idx, codes]  # [B, K, S, D]
        return gathered.sum(axis=1)

    def apply_heads(self, params: dict, hidden: jnp.ndarray) -> jnp.ndarray:
        """``[B, S, D] -> [B, K, S, V]`` fp32 logits (model.py:100-101).
        Supports int8 head weights (per-out-channel scale [K, 1, V]): the
        int8->activation convert fuses into the einsum operand read, the
        scale applies to the fp32 logits."""
        h = params["heads"]
        if "weight_int8" in h:
            y = jnp.einsum(
                "bsd,kdv->bksv",
                hidden,
                h["weight_int8"].astype(hidden.dtype),
                preferred_element_type=jnp.float32,
            )
            return y * h["scale"][None]  # [K,1,V] -> [1,K,1,V]
        return jnp.einsum(
            "bsd,kdv->bksv",
            hidden,
            h["weight"],
            preferred_element_type=jnp.float32,
        )

    def backbone_forward(self, params, hidden, cache, offset, lengths, rope=None,
                         stage_base=None, pooled=False, pool_base=None,
                         capture_fc2=False):
        kw = {}
        if stage_base is not None:
            kw["stage_base"] = stage_base
        if pooled:
            kw["pooled"] = True
        if pool_base is not None:
            kw["pool_base"] = pool_base
        if capture_fc2:  # transformer-only quantization calibration tap
            kw["capture_fc2"] = True
        return self.backbone.forward(
            params["backbone"], hidden, cache, offset, lengths, rope, **kw
        )

    def compute_logits(
        self,
        params: dict,
        hidden: jnp.ndarray,
        cache: dict,
        offset: jnp.ndarray,
        lengths: jnp.ndarray,
        cfg_scale: float,
        rope=None,
        stage_base=None,
        pooled=False,
        pool_base=None,
    ):
        """Backbone -> last position -> heads -> CFG mix -> pad mask.
        (model.py:103-116). ``hidden`` is the CFG-doubled ``[2B, S, D]``
        batch; returns ``([B, K, V] logits, new_cache)``."""
        out, new_cache = self.backbone_forward(
            params, hidden, cache, offset, lengths, rope,
            stage_base=stage_base, pooled=pooled, pool_base=pool_base,
        )
        last = out[:, -1:, :]
        logits = self.apply_heads(params, last)[:, :, 0, :]  # [2B, K, V]
        if not isinstance(cfg_scale, (int, float)):
            # Per-row runtime CFG (continuous-batching pools): [B] scales.
            # A row at scale exactly 1.0 reduces to its cond logits.
            cond, uncond = jnp.split(logits, 2, axis=0)
            scale = jnp.asarray(cfg_scale, jnp.float32)[:, None, None]
            logits = uncond + (cond - uncond) * scale
        elif cfg_scale != 1.0:
            cond, uncond = jnp.split(logits, 2, axis=0)
            logits = uncond + (cond - uncond) * cfg_scale
        # Mask MASK token + pad slots (everything >= 1025).
        V = logits.shape[-1]
        mask_from = self.config.head_vocab_size  # 1025
        col = jnp.arange(V)
        logits = jnp.where(col[None, None, :] >= mask_from, NEG_INF, logits)
        return logits, new_cache

    def allocate_cache(self, batch_size: int, max_seqlen: int,
                       dtype=jnp.bfloat16, kv_int8: bool = False,
                       state_bf16: bool = False, pool_ring: bool = False):
        kw = {}
        if kv_int8:
            # Transformer-only (int8 phase 2): loud TypeError on backbones
            # without the quantized-cache path.
            kw["kv_int8"] = True
        if state_bf16:
            # Hybrid-only: bf16 SSM-state storage (fp32 compute) for pooled
            # serving; loud TypeError on backbones without SSM state.
            kw["state_dtype"] = jnp.bfloat16
        if pool_ring and self.config.backbone.is_hybrid:
            # Hybrid pools: per-attn-layer ring stages (the transformer
            # cache always carries its stage).
            kw["pool_ring"] = True
        return self.backbone.allocate_cache(batch_size, max_seqlen, dtype,
                                            **kw)

    # -- conditioning -------------------------------------------------------

    def prepare_conditioning(
        self, params: dict, cond_dict: dict, uncond_dict: dict | None = None
    ) -> jnp.ndarray:
        """``[cond; uncond]`` stacked on batch — CFG doubling happens here,
        before generation (model.py:204-212)."""
        pc = self.prefix_conditioner
        missing = pc.required_keys - set(cond_dict)
        if missing:
            raise ValueError(f"Missing required keys: {missing}")
        if uncond_dict is None:
            uncond_dict = {k: cond_dict[k] for k in pc.required_keys}
        p = params["prefix_conditioner"]
        return jnp.concatenate(
            [pc.apply(p, cond_dict), pc.apply(p, uncond_dict)], axis=0
        )
