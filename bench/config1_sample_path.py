"""BASELINE config 1: the canonical sample.py path, end to end.

Short en-us sentence -> phonemize -> conditioning -> generate (CFG 2,
min-p sampling per reference model.py:226) -> DAC decode -> waveform.
Reports END-TO-END RTF including the vocoder (bench.py reports decode-loop
RTF only). Reference path: sample.py:1-22.
"""

import sys

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench.common import FRAME_RATE, REF_RTF, report, timed  # noqa: E402


def main():
    from zonos_vibes_tpu.config import ZONOS_V01_TRANSFORMER
    from zonos_vibes_tpu.models.autoencoder import DACAutoencoder
    from zonos_vibes_tpu.pipeline import ZonosPipeline
    from zonos_vibes_tpu.ops.sampling import SamplingParams

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 430  # ~5 s of audio

    pipe = ZonosPipeline.from_config(
        ZONOS_V01_TRANSFORMER, key=jax.random.key(0),
        dac=DACAutoencoder(),
    )
    cond = pipe.make_cond_dict(
        text="Hello, world! This is a test of the text to speech system.",
        language="en-us",
    )

    def run():
        res = pipe.generate(
            cond, key=jax.random.key(421),
            max_new_tokens=steps, cfg_scale=2.0,
            sampling_params=SamplingParams(min_p=0.1), disable_eos=True,
        )
        wav = pipe.decode_audio(res)
        return jnp.asarray(wav)

    sec_per_call, wav = timed(run, warmup=1, iters=3)
    audio_s = wav.shape[-1] / 44100
    rtf = audio_s / sec_per_call
    report("e2e_rtf_sample_path", rtf, "audio_s_per_s", rtf / REF_RTF)


if __name__ == "__main__":
    main()
