"""BASELINE config 5: hybrid (Mamba-2 + attention) backbone, long-form 60 s.

The hybrid's SSM state is O(1) in sequence length, so long-form decode does
not grow attention reads for the 42 Mamba layers (only the 6 attention
layers touch the KV cache). Reports decode RTF for a 60 s generation —
double the reference's 30 s ceiling (model.py:223), which the engine
supports by sizing the cache to the request.
"""

import sys

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench.common import FRAME_RATE, REF_RTF, phoneme_batch, report, timed  # noqa: E402


def main():
    from zonos_vibes_tpu.config import ZONOS_V01_HYBRID
    from zonos_vibes_tpu.engine.generate import DecodeEngine
    from zonos_vibes_tpu.models.zonos import ZonosModel
    from zonos_vibes_tpu.ops.sampling import SamplingParams

    args = [a for a in sys.argv[1:] if a != "int8"]
    steps = int(args[0]) if args else 86 * 60  # 60 s
    use_int8 = "int8" in sys.argv[1:]

    model = ZonosModel(ZONOS_V01_HYBRID)
    params = model.init(jax.random.key(0))
    if use_int8:
        from zonos_vibes_tpu.ops.quant import quantize_zonos_params

        params = quantize_zonos_params(params, heads=True)
    engine = DecodeEngine(model)
    cond = model.prepare_conditioning(
        params, {"espeak": jnp.asarray(phoneme_batch([64]))}
    )

    def run():
        res = engine.generate(
            params, cond, key=jax.random.key(4), max_new_tokens=steps,
            cfg_scale=2.0, sampling_params=SamplingParams(min_p=0.1),
            disable_eos=True,
        )
        return res.codes

    sec_per_call, codes = timed(run, warmup=1, iters=1)
    rtf = steps / FRAME_RATE / sec_per_call
    name = "rtf_hybrid_60s_int8" if use_int8 else "rtf_hybrid_60s"
    report(name, rtf, "audio_s_per_s", rtf / REF_RTF)


if __name__ == "__main__":
    main()
