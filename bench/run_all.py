"""Run the full BASELINE.json config suite; collect one JSON line each into
BENCH_SUITE.json. Each config runs in its own interpreter (clean compile
cache, isolated HBM). Usage:

    python bench/run_all.py [--quick] [--only name1,name2]

--quick shrinks step counts ~8x for smoke runs.
--only runs a subset and MERGES the rows into the existing BENCH_SUITE.json
(other rows kept) instead of overwriting the whole file.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

CONFIGS = [
    # (name, script, full args, --quick args)
    ("headline_int8", "bench.py", ["430", "int8"], ["54", "int8"]),
    ("headline_bf16", "bench.py", ["430", "bf16"], ["54", "bf16"]),
    ("config1_sample_path", None, ["430"], ["54"]),
    ("config2_voice_clone", None, ["1290"], ["160"]),
    ("config3_prefix_continuation", None, ["860"], ["108"]),
    ("config4_multilingual_batch", None, ["430", "8"], ["54", "8"]),
    ("config5_hybrid_longform", None, ["5160"], ["645"]),
    ("config5_hybrid_longform_int8", None, ["5160", "int8"], ["645", "int8"]),
    # Continuous-batching pool: STAGGERED requests share one compiled step.
    ("pool8_staggered", "bench/pool_bench.py", ["8"], ["8"]),
    ("pool8_staggered_int8", "bench/pool_bench.py", ["8", "int8"], ["8", "int8"]),
    ("pool16_staggered_int8", "bench/pool_bench.py", ["16", "int8"], ["16", "int8"]),
    ("pool8_hybrid_int8", "bench/pool_bench.py", ["8", "int8", "hybrid"], ["8", "int8", "hybrid"]),
    # bf16 SSM-state storage: the fp32 state read+write dominates the
    # hybrid pooled step (docs/KERNELS.md); bf16 storage halves it.
    ("pool8_hybrid_int8_statebf16", "bench/pool_bench.py",
     ["8", "int8", "hybrid", "statebf16"], ["8", "int8", "hybrid", "statebf16"]),
    # 16-slot hybrid: the state stream doubles but the weight read still
    # amortizes — the lane-transposed fused step keeps it HBM-bound.
    ("pool16_hybrid_int8_statebf16", "bench/pool_bench.py",
     ["16", "int8", "hybrid", "statebf16"],
     ["16", "int8", "hybrid", "statebf16"]),
    # Late-generation operating point (rows ~20 s deep): the pooled KV read
    # rivals the weight read — int8 KV (quantized ring flush) pays here.
    ("pool8_int8_deep", "bench/pool_bench.py", ["8", "int8", "deep"], ["8", "int8", "deep"]),
    ("pool8_int8_kvint8_deep", "bench/pool_bench.py",
     ["8", "int8", "kvint8", "deep"], ["8", "int8", "kvint8", "deep"]),
    # Deep single-stream operating point: 30 s generations (the reference's
    # max, model.py:223) — the KV read share at depth, not the shallow
    # 5 s headline.
    ("deep30s_bf16", "bench.py", ["2580", "bf16"], ["430", "bf16"]),
    ("deep30s_int8", "bench.py", ["2580", "int8"], ["430", "int8"]),
    # int4 weight-only (phase 3): MLP at grouped-scale s4, attention/heads
    # int8 — measured with the quality gate (tools/quality_quant.py +
    # tests/test_quant.py). int4FULL is demoted to experimental and OFF
    # the default suite: its own gate shows the highest TVD, and the
    # all-int4 program's layout assignment for the grouped 4D s4 inputs
    # conflicts with the creation-pinned packed layout on the remote-TPU
    # platform (device_put relayout recursion, round-4 suite stderr).
    ("headline_int4", "bench.py", ["430", "int4"], ["54", "int4"]),
    # Mixed point (round 5): fc1-only s4, fc2 stays int8 — the quality
    # dial that actually moves TVD (5.8% vs int4-MLP's 7.2%; calibration-
    # aware rounding measured FLAT at random init, docs/KERNELS.md).
    ("headline_int4fc1", "bench.py", ["430", "int4fc1"], ["54", "int4fc1"]),
    # Streaming latency: wall to the first ~0.5 s waveform chunk.
    ("latency_ttfa", "bench/latency_ttfa.py", [], []),
    # Pooled streaming (VERDICT r2 #2): staggered streams share the pool.
    ("ttfa_pooled_stream4_int8", "bench/pool_stream_ttfa.py",
     ["4", "int8"], ["4", "int8"]),
    # Simulated scaling (spoofed CPU mesh — forces its own platform/devices;
    # per-device work + collectives, projection anchored to config1's RTF).
    ("scaling_report", None, [], []),
]


def main():
    quick = "--quick" in sys.argv
    only = None
    for i, a in enumerate(sys.argv):
        if a == "--only" and i + 1 < len(sys.argv):
            only = set(sys.argv[i + 1].split(","))
    configs = [c for c in CONFIGS if only is None or c[0] in only]
    results = []
    for name, script, args, quick_args in configs:
        if script is None:
            base = name.removesuffix("_int8")
            script = f"bench/{base}.py"
        argv = [sys.executable, script] + (quick_args if quick else args)
        t0 = time.time()
        proc = subprocess.run(
            argv, capture_output=True, text=True, timeout=3600
        )
        line = None
        for out_line in proc.stdout.strip().splitlines():
            try:
                line = json.loads(out_line)
            except json.JSONDecodeError:
                continue
        entry = {
            "config": name,
            "wall_s": round(time.time() - t0, 1),
            "result": line,
        }
        if proc.returncode != 0 or line is None:
            entry["error"] = (proc.stderr or proc.stdout)[-2000:]
        results.append(entry)
        print(json.dumps(entry))
    if only is not None:
        try:
            with open("BENCH_SUITE.json") as f:
                existing = json.load(f)
        except (OSError, json.JSONDecodeError):
            existing = []
        ran = {r["config"] for r in results}
        results = [r for r in existing if r["config"] not in ran] + results
    with open("BENCH_SUITE.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
