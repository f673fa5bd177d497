"""Capture an xprof trace of the decode hot path (SURVEY.md §5.1).

Runs a short flagship-topology generation under ``jax.profiler.trace`` so
the per-step breakdown (backbone matmuls, attention kernel, sampling tail,
cache updates) is inspectable in XProf/TensorBoard. Phases are annotated
via utils/tracing (TraceAnnotation wrappers around phonemize / conditioning
/ generate / vocode).

Usage:
    python tools/profile_decode.py [steps] [--logdir DIR] [--int8]
Prints the logdir; open with `tensorboard --logdir DIR` or xprof.
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

    from zonos_vibes_tpu.config import ZONOS_V01_TRANSFORMER
    from zonos_vibes_tpu.engine.generate import DecodeEngine
    from zonos_vibes_tpu.models.zonos import ZonosModel
    from zonos_vibes_tpu.ops.sampling import SamplingParams
    from zonos_vibes_tpu.utils import tracing

    model = ZonosModel(ZONOS_V01_TRANSFORMER)
    params = model.init(jax.random.key(0))
    if "--int8" in sys.argv:
        from zonos_vibes_tpu.ops.quant import quantize_zonos_params

        params = quantize_zonos_params(params)
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


if __name__ == "__main__":
    main()
