"""Checkpoint conversion: torch/safetensors reference weights -> JAX pytrees.

The reference loads HF-hub safetensors by name into torch modules
(zonos/model.py:57-88); auxiliary models (DAC, speaker encoder) ship as HF /
torch ``.pt`` checkpoints. This module converts each into the exact pytree
layouts our functional models expect, applying the layout changes our
TPU-first designs made:

* torch ``nn.Linear`` stores ``[out, in]`` -> ours ``[in, out]`` (transpose);
* per-layer backbone tensors -> stacked ``[n_layer, ...]`` (lax.scan layout);
* output heads: 1025-row torch heads -> ``[d_model, head_out_dim]`` with
  zero pad columns up to the MXU-friendly padded vocab (mask handles them);
* conv1d ``[Cout, Cin, k]`` -> ``[k, Cin, Cout]``; transposed conv
  ``[Cin, Cout, k]`` -> kernel-flipped ``[k, Cin, Cout]``;
* weight-normalized convs (``weight_g``/``weight_v`` or parametrizations)
  are fused into plain weights;
* Snake ``alpha [1, C, 1]`` -> ``[C]``.

Converted pytrees can be cached to disk as a flat ``.npz`` for fast reload
(SURVEY.md §5.4).
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ZonosConfig


def _t(x) -> np.ndarray:
    """torch tensor -> numpy (via .float() only for unusual dtypes)."""
    import torch

    if isinstance(x, torch.Tensor):
        if x.dtype == torch.bfloat16:
            return x.detach().to(torch.float32).cpu().numpy()
        return x.detach().cpu().numpy()
    return np.asarray(x)


def _linear_w(sd: dict, key: str) -> np.ndarray:
    return _t(sd[key]).T  # [out, in] -> [in, out]


def _conv_w(sd: dict, key: str) -> np.ndarray:
    """Fuse weight norm if present; [Cout, Cin, k] -> [k, Cin, Cout]."""
    if key + ".weight" in sd:
        w = _t(sd[key + ".weight"])
    else:  # torch >= 2.1 parametrized weight norm
        g = _t(sd[key + ".parametrizations.weight.original0"])
        v = _t(sd[key + ".parametrizations.weight.original1"])
        norm = np.sqrt((v ** 2).sum(axis=(1, 2), keepdims=True))
        w = g * v / np.maximum(norm, 1e-12)
    return np.transpose(w, (2, 1, 0))


def _conv_t_w(sd: dict, key: str) -> np.ndarray:
    """ConvTranspose1d [Cin, Cout, k] -> flipped plain-conv [k, Cin, Cout]."""
    if key + ".weight" in sd:
        w = _t(sd[key + ".weight"])
    else:
        g = _t(sd[key + ".parametrizations.weight.original0"])
        v = _t(sd[key + ".parametrizations.weight.original1"])
        norm = np.sqrt((v ** 2).sum(axis=(1, 2), keepdims=True))
        w = g * v / np.maximum(norm, 1e-12)
    return np.transpose(w[:, :, ::-1], (2, 0, 1))


# ---------------------------------------------------------------------------
# Zonos core model
# ---------------------------------------------------------------------------

def load_zonos_config(config_path: str) -> ZonosConfig:
    with open(config_path) as f:
        return ZonosConfig.from_dict(json.load(f))


def convert_zonos_state_dict(
    sd: dict, config: ZonosConfig, dtype=jnp.bfloat16
) -> dict:
    """Reference safetensors tensor dict -> ``ZonosModel.init``-shaped pytree.

    Name map (reference module tree, model.py:22-47):
      embeddings.{k}.weight            [1026, D]
      heads.{k}.weight                 [1025, D]
      backbone.layers.{i}.norm{,2}.*   LayerNorm weight/bias
      backbone.layers.{i}.mixer.{in,out}_proj.weight
      backbone.layers.{i}.mlp.fc{1,2}.weight
      backbone.norm_f.*
      prefix_conditioner.conditioners.{j}.*  (by config order)
      prefix_conditioner.{norm,project}.*
    """
    bb = config.backbone
    L, D = bb.n_layer, bb.d_model
    K = config.num_codebooks

    def cast(x):
        return jnp.asarray(x, dtype)

    # -- embeddings / heads -------------------------------------------------
    emb = np.stack([_t(sd[f"embeddings.{k}.weight"]) for k in range(K)])
    m = config.head_pad_to_multiple
    hv = config.head_vocab_size
    head_pad = (0 if hv % m == 0 else m - hv % m)
    heads = np.stack(
        [
            np.pad(_t(sd[f"heads.{k}.weight"]).T, ((0, 0), (0, head_pad)))
            for k in range(K)
        ]
    )  # [K, D, head_out_dim]

    # -- backbone (stacked for scan) ---------------------------------------
    def stack(fmt, transform=_t):
        return np.stack([transform(sd[fmt.format(i=i)]) for i in range(L)])

    def stack_lin(fmt):
        return np.stack([_t(sd[fmt.format(i=i)]).T for i in range(L)])

    # Stacked norm vectors load as fp32 (layer_norm computes in fp32; bf16
    # storage costs a per-layer slice+convert in the decode loop — see
    # models/backbone.py init note). Exact: bf16 -> fp32 widening.
    def cast32(x):
        return jnp.asarray(x, jnp.float32)

    backbone = {
        "layers": {
            "norm1": {
                "weight": cast32(stack("backbone.layers.{i}.norm.weight")),
                "bias": cast32(stack("backbone.layers.{i}.norm.bias")),
            },
            "in_proj": {
                "weight": cast(stack_lin("backbone.layers.{i}.mixer.in_proj.weight"))
            },
            "out_proj": {
                "weight": cast(stack_lin("backbone.layers.{i}.mixer.out_proj.weight"))
            },
            "norm2": {
                "weight": cast32(stack("backbone.layers.{i}.norm2.weight")),
                "bias": cast32(stack("backbone.layers.{i}.norm2.bias")),
            },
            "fc1": {
                "weight": cast(stack_lin("backbone.layers.{i}.mlp.fc1.weight"))
            },
            "fc2": {
                "weight": cast(stack_lin("backbone.layers.{i}.mlp.fc2.weight"))
            },
        },
        "norm_f": {
            "weight": cast(_t(sd["backbone.norm_f.weight"])),
            "bias": cast(_t(sd["backbone.norm_f.bias"])),
        },
    }

    # -- prefix conditioner -------------------------------------------------
    conds = {}
    for j, cdict in enumerate(config.prefix_conditioner.conditioners_list):
        name = cdict.get("name", cdict["type"])
        base = f"prefix_conditioner.conditioners.{j}"
        p: dict = {"project": {}}
        if f"{base}.project.weight" in sd:
            p["project"]["linear"] = {
                "weight": cast(_linear_w(sd, f"{base}.project.weight")),
                "bias": cast(_t(sd[f"{base}.project.bias"])),
            }
        elif f"{base}.project.0.weight" in sd:
            p["project"]["mlp0"] = {
                "weight": cast(_linear_w(sd, f"{base}.project.0.weight")),
                "bias": cast(_t(sd[f"{base}.project.0.bias"])),
            }
            p["project"]["mlp2"] = {
                "weight": cast(_linear_w(sd, f"{base}.project.2.weight")),
                "bias": cast(_t(sd[f"{base}.project.2.bias"])),
            }
        if f"{base}.uncond_vector" in sd:
            p["uncond_vector"] = cast(_t(sd[f"{base}.uncond_vector"]))
        if f"{base}.phoneme_embedder.weight" in sd:
            p["phoneme_embedder"] = {
                "weight": cast(_t(sd[f"{base}.phoneme_embedder.weight"]))
            }
        if f"{base}.int_embedder.weight" in sd:
            p["int_embedder"] = {
                "weight": cast(_t(sd[f"{base}.int_embedder.weight"]))
            }
        if f"{base}.weight" in sd:  # Fourier buffer (fp32, never trained)
            p["weight"] = jnp.asarray(_t(sd[f"{base}.weight"]), jnp.float32)
        conds[name] = p

    prefix = {
        "conditioners": conds,
        "project": {},
        "norm": {
            "weight": cast(_t(sd["prefix_conditioner.norm.weight"])),
            "bias": cast(_t(sd["prefix_conditioner.norm.bias"])),
        },
    }
    if "prefix_conditioner.project.weight" in sd:
        prefix["project"]["linear"] = {
            "weight": cast(_linear_w(sd, "prefix_conditioner.project.weight")),
            "bias": cast(_t(sd["prefix_conditioner.project.bias"])),
        }
    elif "prefix_conditioner.project.0.weight" in sd:
        prefix["project"]["mlp0"] = {
            "weight": cast(_linear_w(sd, "prefix_conditioner.project.0.weight")),
            "bias": cast(_t(sd["prefix_conditioner.project.0.bias"])),
        }
        prefix["project"]["mlp2"] = {
            "weight": cast(_linear_w(sd, "prefix_conditioner.project.2.weight")),
            "bias": cast(_t(sd["prefix_conditioner.project.2.bias"])),
        }

    return {
        "embeddings": {"weight": cast(emb)},
        "heads": {"weight": cast(heads)},
        "backbone": backbone,
        "prefix_conditioner": prefix,
    }


def load_zonos_checkpoint(
    config_path: str, model_path: str, dtype=jnp.bfloat16
) -> tuple[ZonosConfig, dict]:
    """safetensors file -> (config, params)."""
    import safetensors.numpy

    config = load_zonos_config(config_path)
    sd = safetensors.numpy.load_file(model_path)
    return config, convert_zonos_state_dict(sd, config, dtype)


# ---------------------------------------------------------------------------
# Disk cache: converted pytrees as flat .npz (SURVEY.md §5.4 — one-time
# conversion, fast reloads, no torch needed afterwards)
# ---------------------------------------------------------------------------

_SEP = "::"


def flatten_pytree(tree, prefix: str = "") -> dict:
    """Nested dicts/lists of arrays -> flat ``{"a::b::0": array}``."""
    out = {}
    if isinstance(tree, dict):
        if not tree:  # keep empty nodes (e.g. projection-less conditioners)
            return {prefix + "@emptydict": np.zeros((), np.int8)}
        items = tree.items()
    elif isinstance(tree, (list, tuple)):
        if not tree:
            return {prefix + "@emptylist": np.zeros((), np.int8)}
        items = ((str(i), v) for i, v in enumerate(tree))
    else:
        return {prefix: np.asarray(tree)}
    for k, v in items:
        key = f"{prefix}{_SEP}{k}" if prefix else str(k)
        out.update(flatten_pytree(v, key))
    return out


def unflatten_pytree(flat: dict) -> dict:
    """Inverse of :func:`flatten_pytree`. All-integer-keyed levels become
    lists (restoring per-layer cache/param lists)."""
    nested: dict = {}
    for key, value in flat.items():
        if key.endswith("@emptydict"):
            key, value = key[: -len("@emptydict")], {}
        elif key.endswith("@emptylist"):
            key, value = key[: -len("@emptylist")], []
        parts = key.split(_SEP)
        node = nested
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    def listify(node):
        if not isinstance(node, dict):
            return node
        node = {k: listify(v) for k, v in node.items()}
        if node and all(k.isdigit() for k in node):
            return [node[str(i)] for i in range(len(node))]
        return node

    return listify(nested)


def save_params_cache(path: str, params: dict) -> None:
    # bf16/int4 have no native numpy dtype on save: bf16 views as uint16,
    # int4 (grouped/experimental weights) widens to int8 — each with a
    # marker suffix so load restores the exact device form (int4 reloads
    # through _to_device_int4, which re-pins the packed s4 layout).
    out = {}
    for k, v in flatten_pytree(params).items():
        if v.dtype == jnp.int4:
            # Widen via an input-format-pinned program: an eager astype is
            # a fresh consumer whose layout assignment may differ from the
            # creation-pinned packed s4 layout (axon relayout recursion,
            # ADVICE r4).
            from ..ops.quant import widen_device_int4

            out[k + "@s4"] = np.asarray(jax.device_get(widen_device_int4(v)))
            continue
        v = np.asarray(v)
        if v.dtype == jnp.bfloat16:
            out[k + "@bf16"] = v.view(np.uint16)
        else:
            out[k] = v
    np.savez(path, **out)


def load_params_cache(path: str) -> dict:
    data = np.load(path)
    flat = {}
    for k in data.files:
        v = data[k]
        if k.endswith("@bf16"):
            flat[k[: -len("@bf16")]] = jnp.asarray(
                v.view(jnp.bfloat16)
            )
        elif k.endswith("@s4"):
            from ..ops.quant import _to_device_int4

            flat[k[: -len("@s4")]] = _to_device_int4(v)
        else:
            flat[k] = jnp.asarray(v)
    return unflatten_pytree(flat)


# ---------------------------------------------------------------------------
# DAC codec
# ---------------------------------------------------------------------------

def convert_dac_state_dict(sd: dict, config, dtype=jnp.float32) -> dict:
    """HF ``transformers`` DacModel state dict -> ``DACModel.init`` pytree.

    transformers module tree: encoder.conv1/2, encoder.block.{i}.res_unit{1..3}
    .{snake1,conv1,snake2,conv2} + .snake1 + .conv1 (downsampling);
    decoder.conv1, decoder.block.{i}.{snake1,conv_t1,res_unit1..3},
    decoder.snake1, decoder.conv2; quantizer.quantizers.{i}.{in_proj,out_proj,
    codebook}.
    """
    def cast(x):
        return jnp.asarray(x, dtype)

    def snake_a(key):
        return cast(_t(sd[key]).reshape(-1))

    def conv(key):
        return {
            "weight": cast(_conv_w(sd, key)),
            "bias": cast(_t(sd[key + ".bias"])),
        }

    def conv_t(key):
        return {
            "weight": cast(_conv_t_w(sd, key)),
            "bias": cast(_t(sd[key + ".bias"])),
        }

    def res_unit(base):
        return {
            "snake1": snake_a(f"{base}.snake1.alpha"),
            "conv1": conv(f"{base}.conv1"),
            "snake2": snake_a(f"{base}.snake2.alpha"),
            "conv2": conv(f"{base}.conv2"),
        }

    n_down = len(config.downsampling_ratios)
    enc_blocks = [
        {
            "res1": res_unit(f"encoder.block.{i}.res_unit1"),
            "res2": res_unit(f"encoder.block.{i}.res_unit2"),
            "res3": res_unit(f"encoder.block.{i}.res_unit3"),
            "snake": snake_a(f"encoder.block.{i}.snake1.alpha"),
            "conv": conv(f"encoder.block.{i}.conv1"),
        }
        for i in range(n_down)
    ]
    dec_blocks = [
        {
            "snake": snake_a(f"decoder.block.{i}.snake1.alpha"),
            "conv_t": conv_t(f"decoder.block.{i}.conv_t1"),
            "res1": res_unit(f"decoder.block.{i}.res_unit1"),
            "res2": res_unit(f"decoder.block.{i}.res_unit2"),
            "res3": res_unit(f"decoder.block.{i}.res_unit3"),
        }
        for i in range(n_down)
    ]
    quantizers = [
        {
            "in_proj": conv(f"quantizer.quantizers.{i}.in_proj"),
            "out_proj": conv(f"quantizer.quantizers.{i}.out_proj"),
            "codebook": cast(_t(sd[f"quantizer.quantizers.{i}.codebook.weight"])),
        }
        for i in range(config.n_codebooks)
    ]
    return {
        "encoder": {
            "conv1": conv("encoder.conv1"),
            "blocks": enc_blocks,
            "snake": snake_a("encoder.snake1.alpha"),
            "conv2": conv("encoder.conv2"),
        },
        "quantizers": quantizers,
        "decoder": {
            "conv1": conv("decoder.conv1"),
            "blocks": dec_blocks,
            "snake": snake_a("decoder.snake1.alpha"),
            "conv2": conv("decoder.conv2"),
        },
    }
