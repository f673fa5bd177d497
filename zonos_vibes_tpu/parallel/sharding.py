"""Mesh + sharding layer — the distributed-communication backend.

The reference has NO distributed layer (SURVEY.md §2.10, §5.8: no
torch.distributed anywhere — one replica, one device). This module is the
TPU-native equivalent built as a first-class component: a named
``jax.sharding.Mesh`` plus PartitionSpec tables per parameter/activation,
with GSPMD/pjit inserting the ICI collectives (psum after row-parallel
matmuls, all-gathers on resharding) — no hand-written transport.

Axes (config.MeshConfig):

* ``data``  — utterance-batch DP (primary scale-out; also carries the CFG
  cond/uncond pair when ``data >= 2``, the cheapest 2x decode win).
* ``model`` — megatron-style TP: qkv/fc1 column-parallel, out_proj/fc2
  row-parallel, output heads vocab-sharded.
* ``pipe``, ``expert`` — PP/EP scaffold axes (size 1 for the shipped dense
  checkpoints; kept in the mesh so the layer map supports them).

Everything is host-count-agnostic: tested on a spoofed 8-device CPU mesh
(tests/conftest.py) and dry-run compiled by the driver via
``__graft_entry__.dryrun_multichip``.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MeshConfig

DATA, MODEL, PIPE, EXPERT = "data", "model", "pipe", "expert"


def make_mesh(cfg: MeshConfig, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    n = cfg.num_devices
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(cfg.shape)
    return Mesh(arr, cfg.axis_names)


def _proj_spec(leaf: dict, wspec: P) -> dict:
    """Spec for a projection leaf in either format: bf16 ``{"weight"}`` or
    int8 weight-only ``{"weight_int8", "scale"}`` (ops/quant). The scale is
    per-output-channel ``[..., 1, out]`` — same layout as the weight, so it
    takes the same spec."""
    wkey = next((k for k in ("weight_int8", "weight_int4") if k in leaf), None)
    if wkey is not None:
        if leaf[wkey].ndim == len(wspec) + 1:
            # Grouped int4 layout [..., G, group, out] (scale
            # [..., G, 1, out]): the contraction sharding axis moves to
            # the GROUP axis (>=32 rows, divisible by any TP degree; G
            # can be tiny) — the per-group post-dot scale commutes with
            # partial sums WITHIN a group, so row-parallel psum stays
            # correct. Scale's group axis is size 1 -> unsharded there.
            axes = list(wspec)
            return {
                wkey: P(*axes[:-2], None, axes[-2], axes[-1]),
                "scale": P(*axes[:-2], None, None, axes[-1]),
            }
        # Scale is [..., 1, out]: its contraction axis is size 1, so that
        # axis must stay unsharded even for row-parallel weights.
        axes = list(wspec)
        if len(axes) >= 2:
            axes[-2] = None
        return {wkey: wspec, "scale": P(*axes)}
    return {"weight": wspec}


def backbone_param_specs(bb_params: dict) -> dict:
    """PartitionSpecs matching ``init_transformer_backbone``'s tree.
    Layer tensors carry a leading ``n_layer`` axis (sharded on ``pipe`` when
    PP is active; P stages slice layers contiguously via GSPMD)."""
    layers = bb_params["layers"]
    return {
        "layers": {
            "norm1": {"weight": P(), "bias": P()},
            "in_proj": _proj_spec(layers["in_proj"], P(None, None, MODEL)),
            "out_proj": _proj_spec(layers["out_proj"], P(None, MODEL, None)),
            "norm2": {"weight": P(), "bias": P()},
            "fc1": _proj_spec(layers["fc1"], P(None, None, MODEL)),
            "fc2": _proj_spec(layers["fc2"], P(None, MODEL, None)),
        },
        "norm_f": {"weight": P(), "bias": P()},
    }


def _conditioner_specs(params: dict) -> dict:
    # Conditioner params are tiny — replicate everything.
    return jax.tree.map(lambda _: P(), params)


def _hybrid_layer_specs(layer: dict) -> dict:
    """Per-layer specs for the hybrid backbone (mamba_backbone.init):
    the big projections are megatron-sharded; Mamba's small per-head
    tensors (conv, dt, A, D, ssm norm) are replicated. The Mamba in_proj
    output axis mixes z|xBC|dt segments — sharding it is still CORRECT
    under GSPMD (the logical tensor is unchanged; the segment split right
    after induces resharding), it just leaves some gather traffic on the
    table vs a segment-aligned layout."""
    spec: dict = {
        "norm": jax.tree.map(lambda _: P(), layer["norm"]),
        "in_proj": _proj_spec(layer["in_proj"], P(None, MODEL)),   # column
        "out_proj": _proj_spec(layer["out_proj"], P(MODEL, None)),  # row
    }
    if "conv1d" in layer:  # Mamba-2 mixer
        spec.update({
            "conv1d": {"weight": P(), "bias": P()},
            "dt_bias": P(), "A_log": P(), "D": P(),
            "ssm_norm": {"weight": P()},
        })
    if "fc1" in layer:
        spec["norm2"] = jax.tree.map(lambda _: P(), layer["norm2"])
        spec["fc1"] = _proj_spec(layer["fc1"], P(None, MODEL))
        spec["fc2"] = _proj_spec(layer["fc2"], P(MODEL, None))
    return spec


def hybrid_backbone_param_specs(backbone_params: dict) -> dict:
    """Specs mirroring the hybrid backbone's per-layer list tree."""
    return {
        "layers": [_hybrid_layer_specs(l) for l in backbone_params["layers"]],
        "norm_f": jax.tree.map(lambda _: P(), backbone_params["norm_f"]),
    }


def zonos_param_specs(params: dict) -> dict:
    """Full-model PartitionSpec pytree mirroring ``ZonosModel.init``.
    Backbone family inferred from the tree shape: the transformer stacks
    layers on a leading axis (one dict of [L, ...] tensors); the hybrid
    keeps a per-layer list (heterogeneous attn/mamba structures)."""
    bb = params["backbone"]
    backbone = (
        hybrid_backbone_param_specs(bb)
        if isinstance(bb["layers"], (list, tuple))
        else backbone_param_specs(bb)
    )
    return {
        # Embedding tables replicate (gathered rows, tiny reads); int8
        # leaves ({"weight_int8","scale","act_dtype"}) replicate the same.
        "embeddings": jax.tree.map(lambda _: P(), params["embeddings"]),
        # Output heads vocab-sharded (bf16 or int8+scale).
        "heads": _proj_spec(params["heads"], P(None, None, MODEL)),
        "backbone": backbone,
        "prefix_conditioner": _conditioner_specs(params["prefix_conditioner"]),
    }


def kv_cache_specs() -> dict:
    """KV cache ``[L, B, Hkv, Dh, T]`` (+ time-major decode stage
    ``[L, B, STAGE, Hkv, Dh]``): batch on data, kv heads on model."""
    return {
        "k": P(None, DATA, MODEL, None, None),
        "v": P(None, DATA, MODEL, None, None),
        # Stage [L, B, STAGE, Hkv*Dh]: the flattened head axis shards on
        # model (contiguous chunks == whole heads when Hkv % n_model == 0).
        "k_stage": P(None, DATA, None, MODEL),
        "v_stage": P(None, DATA, None, MODEL),
        # int8-KV scales [L, B, Hkv, T] follow the head sharding.
        "k_scale": P(None, DATA, MODEL, None),
        "v_scale": P(None, DATA, MODEL, None),
    }


def activation_spec() -> P:
    """Hidden states ``[B, S, D]``: batch on data, replicated on model."""
    return P(DATA, None, None)


def shard_pytree(tree: dict, specs: dict, mesh: Mesh) -> dict:
    """Place every leaf with its NamedSharding (host->device transfer)."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs
    )
