"""Populate the persistent XLA compile cache for a target serving geometry.

The quantized pooled decode program costs ~25 min of cold compile over the
remote-TPU tunnel (the per-row quantized staged kernel alone ~130 s of
Mosaic compile — docs/KERNELS.md). Production rollout therefore runs this
tool ONCE per (model, geometry) at deploy time; every server start after
that hits the persistent cache (zonos_vibes_tpu.utils.
enable_persistent_compilation_cache) and reaches its first pooled step in
minutes.

Usage:
    python tools/precompile.py [--model transformer|hybrid|both]
        [--slots 8] [--segment-steps 43] [--cond-buckets 64,128]
        [--mnt-buckets 215,430,860,1290,2580] [--modes int8,int8+kvint8]

Compiles (AOT .lower().compile(), no execution):
  * the pooled decode step (pool_steps_jit) per mode,
  * the dyn-knob join prefill (prefill_dyn_jit) per cond bucket x mnt
    bucket (runtime sampling knobs never add programs — that is the point
    of the dyn path).
Prints one JSON line per program with its compile wall time.
"""

import argparse
import json
import sys, time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from zonos_vibes_tpu.utils import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

from zonos_vibes_tpu.config import ZONOS_V01_HYBRID, ZONOS_V01_TRANSFORMER  # noqa: E402
from zonos_vibes_tpu.engine import pool as plib  # noqa: E402
from zonos_vibes_tpu.engine.generate import prefill_dyn_jit  # noqa: E402
from zonos_vibes_tpu.models.zonos import ZonosModel  # noqa: E402
from zonos_vibes_tpu.ops.sampling import SamplingParams, knobs_from_params  # noqa: E402


def log(**kw):
    print(json.dumps(kw), flush=True)


def precompile_model(name: str, cfg, args) -> None:
    model = ZonosModel(cfg)
    params = model.init(jax.random.key(0))
    modes = args.modes.split(",")
    hybrid = cfg.backbone.is_hybrid
    for mode in modes:
        mp = params
        if "int8" in mode:
            from zonos_vibes_tpu.ops.quant import quantize_zonos_params

            mp = quantize_zonos_params(params)
        kv_int8 = "kvint8" in mode and not hybrid
        state_bf16 = "statebf16" in mode and hybrid
        pc = plib.PoolConfig(slots=args.slots,
                             max_cond_len=max(args.cond_buckets),
                             max_new_tokens=max(args.mnt_buckets))
        pool = plib.make_pool(model, pc, kv_int8=kv_int8,
                              state_bf16=state_bf16)
        t0 = time.perf_counter()
        plib.pool_steps_jit.lower(
            model, mp, pool, jax.random.key(0), args.segment_steps
        ).compile()
        log(model=name, program="pool_steps", mode=mode, slots=args.slots,
            segment_steps=args.segment_steps,
            compile_s=round(time.perf_counter() - t0, 1))
        del pool

        knobs = knobs_from_params(SamplingParams(min_p=0.1), 2.0)
        for cb in args.cond_buckets:
            cond = jnp.zeros((2, cb, cfg.backbone.d_model), jnp.bfloat16)
            prefix = jnp.zeros((1, cfg.num_codebooks, 0), jnp.int32)
            for mnt in args.mnt_buckets:
                t0 = time.perf_counter()
                prefill_dyn_jit.lower(
                    model, mp, cond, prefix, jax.random.key(0), 0, mnt,
                    knobs, kv_int8, state_bf16,
                ).compile()
                log(model=name, program="prefill_dyn", mode=mode,
                    cond_bucket=cb, mnt=mnt,
                    compile_s=round(time.perf_counter() - t0, 1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="transformer",
                    choices=["transformer", "hybrid", "both"])
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--segment-steps", type=int, default=43)
    ap.add_argument("--cond-buckets", default="64",
                    type=lambda s: [int(x) for x in s.split(",")])
    ap.add_argument("--mnt-buckets", default="2580",
                    type=lambda s: [int(x) for x in s.split(",")])
    ap.add_argument("--modes", default="int8")
    args = ap.parse_args()

    t0 = time.perf_counter()
    if args.model in ("transformer", "both"):
        precompile_model("transformer", ZONOS_V01_TRANSFORMER, args)
    if args.model in ("hybrid", "both"):
        precompile_model("hybrid", ZONOS_V01_HYBRID, args)
    log(total_wall_s=round(time.perf_counter() - t0, 1))


if __name__ == "__main__":
    main()
