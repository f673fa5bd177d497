#!/usr/bin/env bash
# Real multi-host scaling run (BASELINE.md: audio-s/s at 1 chip / 1 host /
# N>=2 hosts). This environment has one tunneled chip, so this script is the
# STAGED launch path: run it once per host of a TPU pod slice (e.g. via
# `gcloud compute tpus tpu-vm ssh --worker=all --command=...`).
#
# The code path is identical to the simulated one (bench/scaling_report.py
# and tests/test_parallel.py) — the mesh is the only input:
#   * jax.distributed.initialize() picks up coordinator/world from the env
#     below (zonos_vibes_tpu/parallel/multihost.py::initialize_runtime);
#   * MESH_DATA x MESH_MODEL must equal the GLOBAL device count;
#   * each host feeds its local batch rows; GSPMD owns the collectives.
#
# Usage (host i of N, coordinator = host 0's address):
#   JAX_COORDINATOR_ADDRESS=10.0.0.2:8476 JAX_NUM_PROCESSES=N \
#   JAX_PROCESS_ID=i MESH_DATA=<dp> MESH_MODEL=<tp> \
#   bash bench/launch_multihost.sh [steps]
set -euo pipefail
cd "$(dirname "$0")/.."

STEPS="${1:-430}"
MESH_DATA="${MESH_DATA:-$(python -c 'import jax; print(jax.device_count())')}"
MESH_MODEL="${MESH_MODEL:-1}"

python - "$STEPS" "$MESH_DATA" "$MESH_MODEL" <<'PY'
import json
import sys
import time

import jax

from zonos_vibes_tpu.parallel.multihost import initialize_runtime

multi = initialize_runtime()  # env-driven; no-op single-process
steps, dp, tp = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from zonos_vibes_tpu.config import MeshConfig, ZONOS_V01_TRANSFORMER
from zonos_vibes_tpu.models.zonos import ZonosModel
from zonos_vibes_tpu.ops.sampling import SamplingParams
from zonos_vibes_tpu.parallel.engine import ParallelEngine

mesh_cfg = MeshConfig(data=dp, model=tp)
model = ZonosModel(ZONOS_V01_TRANSFORMER)
params = model.init(jax.random.key(0))  # random-init: no artifacts staged
eng = ParallelEngine(model, mesh_cfg, params)

batch = dp  # one utterance row per DP shard
phonemes = jnp.tile(jnp.asarray([[2, 10, 20, 30, 40, 50, 3]]), (batch, 1))
cond = model.prepare_conditioning(eng.params, {"espeak": phonemes})

kwargs = dict(key=jax.random.key(7), max_new_tokens=steps,
              sampling_params=SamplingParams(min_p=0.1), disable_eos=True)
eng.generate(cond, **kwargs)  # compile
t0 = time.time()
res = eng.generate(cond, **kwargs)
jax.device_get(res.codes)  # barrier (block_until_ready lies on axon)
dt = time.time() - t0

audio_s = batch * steps / 86.13
if jax.process_index() == 0:
    print(json.dumps({
        "metric": "multihost_scaling", "value": round(audio_s / dt, 2),
        "unit": "audio-s/s aggregate",
        "mesh": {"data": dp, "model": tp},
        "hosts": jax.process_count(), "devices": jax.device_count(),
        "steps": steps, "wall_s": round(dt, 2),
    }))
PY
