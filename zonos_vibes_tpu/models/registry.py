"""Backbone registry (reference: zonos/backbone/__init__.py:1-12).

The reference registers ``mamba_ssm`` (when importable) and always
``torch``, routing transformer checkpoints to the pure-torch backbone
(model.py:73-77). Ours are both always available — the hybrid backbone has
no CUDA dependency — and routing is by checkpoint architecture:
``ssm_cfg`` empty -> transformer, else hybrid.
"""

from __future__ import annotations

from ..config import BackboneConfig
from .backbone import TransformerBackbone
from .mamba_backbone import HybridBackbone

BACKBONES = {
    "transformer": TransformerBackbone,
    "hybrid": HybridBackbone,
}


def backbone_for_config(cfg: BackboneConfig, name: str | None = None):
    if name is not None:
        return BACKBONES[name](cfg)
    return (HybridBackbone if cfg.is_hybrid else TransformerBackbone)(cfg)
