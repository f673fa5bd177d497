"""Headline benchmark: real-time factor (audio-seconds generated per wall
second) of the flagship Zonos-v0.1-transformer-scale decode on one chip,
in the production serving configuration (int8 weight-only + int8-KV;
pass "bf16" for exact weights).

Prints ONE JSON line:
  {"metric": "rtf_per_chip_int8", "value": N, "unit": "audio_s_per_s",
   "vs_baseline": N / 2.0}

Baseline: the reference reports ~2x real-time on an RTX 4090
(reference README.md:84; BASELINE.md). DAC frame rate 86.13 Hz
(44100 / 512, autoencoder.py:19).

Method: random-init flagship params (no checkpoint egress in this
environment — topology identical to the real config), full jitted generate
(prefill + while-loop decode, CFG batch doubling, min-p sampling,
EOS disabled so the run length is fixed). One warmup call compiles; the
timed call measures steady-state. RTF = frames / 86.1328 / elapsed.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

FRAME_RATE = 44100 / 512  # 86.1328 Hz


def main() -> None:
    from zonos_vibes_tpu.config import ZONOS_V01_TRANSFORMER
    from zonos_vibes_tpu.utils import enable_persistent_compilation_cache

    # Timing is post-warmup steady state; the persistent cache only skips
    # recompiling the same program on reruns (first compile over the remote
    # tunnel is minutes).
    enable_persistent_compilation_cache()
    from zonos_vibes_tpu.engine.generate import DecodeEngine
    from zonos_vibes_tpu.models.zonos import ZonosModel
    from zonos_vibes_tpu.ops.sampling import SamplingParams

    modes = {"bf16", "int8", "int4", "int4fc1", "int4full"}
    args = [a for a in sys.argv[1:] if a not in modes]
    steps = int(args[0]) if args else 430  # 5 s of audio
    # Default mode is int8 weight-only + int8-KV — the production serving
    # configuration (parity-tested: tests/test_quant.py; greedy-code match
    # on early frames, documented tolerance after). Pass "bf16" for the
    # exact-weights number (BENCH_SUITE config1 reports it e2e).
    mode = next((a for a in sys.argv[1:] if a in modes), "int8")

    model = ZonosModel(ZONOS_V01_TRANSFORMER)
    params = model.init(jax.random.key(0))
    if mode != "bf16":
        # int8 phase 2: backbone projections + output heads as int8
        # weights, and the flushed KV prefix as int8 + per-(head, token)
        # scales (kv_int8 engine mode; stage/current stay exact bf16).
        # int4 phase 3 (experimental): "int4" = MLP weights s4 (attention/
        # heads int8); "int4fc1" = fc1-only s4, fc2 int8 (the quality-
        # gated mixed point — fc2 is 1/3 of MLP bytes but its int4 noise
        # sits right before the residual add); "int4full" = every
        # backbone projection s4.
        from zonos_vibes_tpu.ops.quant import quantize_zonos_params

        bits = 4 if mode == "int4full" else 8
        mlp_bits = 4 if mode.startswith("int4") else None
        fc2_bits = 8 if mode == "int4fc1" else None
        params = quantize_zonos_params(params, heads=True, bits=bits,
                                       mlp_bits=mlp_bits, fc2_bits=fc2_bits)
    engine = DecodeEngine(model, kv_int8=mode != "bf16")

    # Conditioning prefix: typical phonemized-sentence length (~60 tokens).
    phonemes = jnp.concatenate(
        [jnp.asarray([[2]]), jnp.full((1, 58), 40, jnp.int32), jnp.asarray([[3]])],
        axis=1,
    )
    cond = model.prepare_conditioning(params, {"espeak": phonemes})
    jax.block_until_ready(cond)

    kwargs = dict(
        max_new_tokens=steps,
        cfg_scale=2.0,
        sampling_params=SamplingParams(min_p=0.1),
        disable_eos=True,
    )

    # Warmup / compile. NOTE: use device_get (not block_until_ready) to
    # synchronize — the experimental remote-TPU platform's block_until_ready
    # returns before execution finishes; a host transfer is a true barrier.
    res = engine.generate(params, cond, key=jax.random.key(1), **kwargs)
    jax.device_get(res.codes)

    # Steady-state serving throughput: N back-to-back generates with ONE
    # batched barrier. A device_get per call would charge the tunnel
    # roundtrip (~40-150 ms, absent on a directly-attached chip) to every
    # utterance — ~5% of a 430-step run (CLAUDE.md).
    reps = 3
    t0 = time.perf_counter()
    results = [
        engine.generate(params, cond, key=jax.random.key(2 + i), **kwargs)
        for i in range(reps)
    ]
    jax.device_get([r.codes for r in results])
    elapsed = (time.perf_counter() - t0) / reps

    frames = int(results[-1].valid_length)
    audio_s = frames / FRAME_RATE
    rtf = audio_s / elapsed
    print(
        json.dumps(
            {
                "metric": "rtf_per_chip" if mode == "bf16"
                          else f"rtf_per_chip_{mode}",
                "value": round(rtf, 4),
                "unit": "audio_s_per_s",
                "vs_baseline": round(rtf / 2.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
