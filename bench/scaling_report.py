"""Simulated scaling report on the spoofed 8-device CPU mesh (VERDICT r1,
next #8; BASELINE.md asks for audio-s/s at 1 chip / 1 host / N>=2 hosts).

Real multi-chip hardware is unavailable in this environment, and wall-clock
on a SPOOFED mesh is physically meaningless (all 8 virtual devices share the
same host cores). What CAN be measured honestly in simulation:

* **per-device work division** — XLA cost analysis of the compiled sharded
  decode step: per-device FLOPs and bytes must divide by the mesh degree
  (this is what determines real-hardware scaling for a weight-bound decode);
* **communication structure** — the collectives GSPMD inserted (count by
  kind from the compiled HLO), i.e. what rides the ICI;
* **projected audio-s/s** — the measured single-chip RTF scaled by the
  measured per-device work ratio, labeled a projection.

The wall-clock curve on real N>=2 hosts runs with bench/launch_multihost.sh
(same code path — the mesh is the only input).

Prints ONE JSON line; also writes SCALING_SIM.json.
"""

from __future__ import annotations

import json
import os
import re
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from zonos_vibes_tpu.config import (  # noqa: E402
    BackboneConfig,
    MeshConfig,
    PrefixConditionerConfig,
    ZonosConfig,
    _freeze,
)
from zonos_vibes_tpu.models.zonos import ZonosModel  # noqa: E402
from zonos_vibes_tpu.ops.rope import rope_table  # noqa: E402
from zonos_vibes_tpu.parallel.sharding import (  # noqa: E402
    DATA,
    kv_cache_specs,
    make_mesh,
    shard_pytree,
    zonos_param_specs,
)

# Mid-size stand-in (the flagship shape pattern at ~1/6 width so 8 fp32
# device copies fit host RAM; per-device RATIOS are width-independent).
CFG = ZonosConfig(
    backbone=BackboneConfig(
        d_model=512, n_layer=8, attn_mlp_d_intermediate=1536,
        attn_cfg=_freeze({"num_heads": 8, "num_heads_kv": 4}),
    ),
    prefix_conditioner=PrefixConditionerConfig.from_dict(
        {"projection": "linear",
         "conditioners": [{"type": "EspeakPhonemeConditioner",
                           "name": "espeak"}]}
    ),
)

COLLECTIVE_KINDS = ("all-reduce", "all-gather", "reduce-scatter",
                    "collective-permute", "all-to-all")


def _decode_step_compiled(mesh_cfg: MeshConfig, batch_rows: int):
    """Compile ONE sharded decode step (embed -> backbone -> heads -> CFG
    mix) — the op that runs 86x per generated audio-second."""
    mesh = make_mesh(mesh_cfg)
    model = ZonosModel(CFG)
    params = model.init(jax.random.key(0), jnp.float32)
    params = shard_pytree(params, zonos_param_specs(params), mesh)
    two_b = 2 * batch_rows
    cache = model.allocate_cache(two_b, 1024, jnp.float32)
    cache = shard_pytree(
        cache, {k: kv_cache_specs()[k] for k in cache}, mesh
    )
    rope = rope_table(CFG.backbone.head_dim)
    frame = jax.device_put(
        jnp.zeros((batch_rows, CFG.num_codebooks, 1), jnp.int32),
        NamedSharding(mesh, P(DATA, None, None)),
    )

    def step(params, frame, cache):
        emb = model.embed_codes(params, frame)
        emb = jnp.concatenate([emb, emb], axis=0)
        lengths = jnp.full((two_b,), 512, jnp.int32)
        logits, cache = model.compute_logits(
            params, emb, cache, jnp.int32(512), lengths, 2.0, rope,
        )
        return logits, cache

    with jax.sharding.set_mesh(mesh):
        lowered = jax.jit(step).lower(params, frame, cache)
        compiled = lowered.compile()
    return compiled


def _analyze(compiled) -> dict:
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    hlo = compiled.as_text()
    colls = {
        kind: len(re.findall(rf"\b{kind}(?:-start|-done)?\(", hlo))
        or hlo.count(kind + "(") or hlo.count(kind)
        for kind in COLLECTIVE_KINDS
    }
    return {
        "flops_per_device": float(cost.get("flops", -1)),
        "bytes_per_device": float(cost.get("bytes accessed", -1)),
        "collectives": {k: v for k, v in colls.items() if v},
    }


def main():
    # Measured single-chip RTF anchor for the projection column.
    rtf1 = 2.33  # BENCH_r01 headline (bf16, one v5e chip)
    try:
        with open(os.path.join(os.path.dirname(__file__), "..",
                               "BENCH_SUITE.json")) as f:
            for entry in json.load(f):
                r = entry.get("result") or {}
                if entry.get("config") == "config1_sample_path" and r:
                    rtf1 = float(r.get("value", rtf1))
    except (OSError, json.JSONDecodeError, ValueError):
        pass

    meshes = [
        ("dp1", MeshConfig(data=1, model=1), 1),
        ("dp2", MeshConfig(data=2, model=1), 2),
        ("dp4", MeshConfig(data=4, model=1), 4),
        ("dp8", MeshConfig(data=8, model=1), 8),
        ("tp2", MeshConfig(data=1, model=2), 1),
        ("tp4", MeshConfig(data=1, model=4), 1),
        ("dp2tp4", MeshConfig(data=2, model=4), 2),
    ]
    base = None
    rows = []
    for name, mc, rows_per in meshes:
        compiled = _decode_step_compiled(mc, batch_rows=rows_per)
        a = _analyze(compiled)
        n_dev = mc.num_devices
        if base is None:
            base = a  # dp1: one device does everything
        # Projection: decode is HBM-bound, so per-device bytes set the step
        # time — throughput = rows * anchor / (bytes_dev / bytes_base).
        # Weak-scaling DP keeps bytes/device ~flat (rows ride free shards);
        # TP divides them by the degree (ICI collective cost not modeled —
        # that is exactly what the real-hardware run measures).
        byte_speedup = base["bytes_per_device"] / max(a["bytes_per_device"], 1)
        rows.append({
            "mesh": name,
            "devices": n_dev,
            "batch_rows": rows_per,
            "flops_per_device": a["flops_per_device"],
            "bytes_per_device": a["bytes_per_device"],
            "collectives": a["collectives"],
            "projected_audio_s_per_s": round(rtf1 * rows_per * byte_speedup, 2),
        })
    out = {
        "metric": "scaling_sim",
        "value": len(rows),
        "unit": "mesh-points",
        "vs_baseline": None,
        "note": ("per-device FLOPs/bytes + GSPMD collectives on the spoofed "
                 "8-device mesh; audio-s/s column is a projection anchored "
                 f"to the measured single-chip RTF {rtf1}; real wall-clock "
                 "scaling runs via bench/launch_multihost.sh"),
        "anchor_rtf_1chip": rtf1,
        "points": rows,
    }
    with open(os.path.join(os.path.dirname(__file__), "..",
                           "SCALING_SIM.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
