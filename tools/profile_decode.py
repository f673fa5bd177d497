"""Capture an xprof trace of the decode hot path (SURVEY.md §5.1).

Runs a short flagship-topology generation under ``jax.profiler.trace`` so
the per-step breakdown (backbone matmuls, attention kernel, sampling tail,
cache updates) is inspectable in XProf/TensorBoard. Phases are annotated
via utils/tracing (TraceAnnotation wrappers around phonemize / conditioning
/ generate / vocode).

Usage:
    python tools/profile_decode.py [steps] [--logdir DIR] [--int8] [--hybrid]
        [--pool SLOTS] [--kv-int8] [--state-bf16] [--deep]
Prints the logdir; open with `tensorboard --logdir DIR` or xprof.
``--pool``: trace one pooled segment (continuous-batching step) instead of
solo generate; ``--deep`` bumps row positions ~20 s (late-generation KV
traffic); ``--kv-int8`` uses the quantized pooled cache.
"""

import sys

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    steps = int(args[0]) if args else 86
    logdir = "/tmp/zvt-xprof"
    if "--logdir" in sys.argv:
        logdir = sys.argv[sys.argv.index("--logdir") + 1]

    from zonos_vibes_tpu.config import ZONOS_V01_HYBRID, ZONOS_V01_TRANSFORMER
    from zonos_vibes_tpu.engine.generate import DecodeEngine
    from zonos_vibes_tpu.models.zonos import ZonosModel
    from zonos_vibes_tpu.ops.sampling import SamplingParams
    from zonos_vibes_tpu.utils import tracing

    model = ZonosModel(
        ZONOS_V01_HYBRID if "--hybrid" in sys.argv else ZONOS_V01_TRANSFORMER
    )
    params = model.init(jax.random.key(0))
    if "--int8" in sys.argv:
        from zonos_vibes_tpu.ops.quant import quantize_zonos_params

        params = quantize_zonos_params(params)

    if "--pool" in sys.argv:
        _profile_pool(model, params, steps, logdir)
        return
    engine = DecodeEngine(model)
    cond = model.prepare_conditioning(
        params, {"espeak": jnp.asarray([[2] + [40] * 58 + [3]])}
    )
    kwargs = dict(
        max_new_tokens=steps, cfg_scale=2.0,
        sampling_params=SamplingParams(min_p=0.1), disable_eos=True,
    )

    # Compile outside the trace window.
    res = engine.generate(params, cond, key=jax.random.key(1), **kwargs)
    jax.device_get(res.codes)

    tracing.start_trace(logdir)
    with tracing.phase("generate"):
        res = engine.generate(params, cond, key=jax.random.key(2), **kwargs)
        jax.device_get(res.codes)
    tracing.stop_trace()
    print(f"trace written to {logdir} ({steps} steps)")


def _profile_pool(model, params, steps, logdir):
    """Trace one pooled segment at a chosen operating point (slots joined
    staggered; --deep bumps positions ~20 s so the per-step KV read is the
    late-generation one)."""
    from zonos_vibes_tpu.engine import pool as plib
    from zonos_vibes_tpu.ops.sampling import SamplingParams
    from zonos_vibes_tpu.utils import tracing

    S = int(sys.argv[sys.argv.index("--pool") + 1])
    kv_int8 = "--kv-int8" in sys.argv and "--hybrid" not in sys.argv
    state_bf16 = "--state-bf16" in sys.argv and "--hybrid" in sys.argv
    pc = plib.PoolConfig(slots=S, max_cond_len=64, max_new_tokens=2580)
    sp = SamplingParams(min_p=0.1)
    pool = plib.make_pool(model, pc, kv_int8=kv_int8, state_bf16=state_bf16)
    cond = model.prepare_conditioning(
        params, {"espeak": jnp.asarray([[2] + [40] * 58 + [3]])}
    )
    for slot in range(S):
        req, knobs = plib.prefill_request(
            model, params, cond, jax.random.key(slot), 2580, 2.0, sp,
            kv_int8=kv_int8, state_bf16=state_bf16,
        )
        pool = plib.join(pool, req, slot, cond.shape[1], slot, knobs)
        pool = plib.pool_steps_jit(model, params, pool, jax.random.key(9), 3,
                               sorted_sampler=False)
    jax.device_get(pool["pos"])
    if "--deep" in sys.argv:
        DEPTH = 1720
        pool = {**pool, "pos": pool["pos"] + DEPTH,
                "step": pool["step"] + DEPTH,
                "flush_base": pool["flush_base"] + DEPTH}
    pool = plib.pool_steps_jit(model, params, pool, jax.random.key(9),
                               steps, sorted_sampler=False)  # compile outside the trace
    jax.device_get(pool["pos"])
    tracing.start_trace(logdir)
    with tracing.phase("pool_segment"):
        pool = plib.pool_steps_jit(model, params, pool, jax.random.key(10),
                                   steps, sorted_sampler=False)
        jax.device_get(pool["pos"])
    tracing.stop_trace()
    print(f"pool trace written to {logdir} ({S} slots, {steps} steps)")


if __name__ == "__main__":
    main()
