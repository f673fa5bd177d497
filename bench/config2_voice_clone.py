"""BASELINE config 2: zero-shot voice clone.

20 s reference wav -> ResNet293+ASP+LDA speaker embedding -> 15 s utterance
at CFG scale 2. Reports end-to-end RTF over (embedding + generation + DAC
decode). Reference path: model.make_speaker_embedding (model.py:90-95) +
generate.
"""

import sys

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from bench.common import REF_RTF, report, timed  # noqa: E402


def main():
    from zonos_vibes_tpu.config import ZONOS_V01_TRANSFORMER
    from zonos_vibes_tpu.models.autoencoder import DACAutoencoder
    from zonos_vibes_tpu.pipeline import ZonosPipeline
    from zonos_vibes_tpu.ops.sampling import SamplingParams

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 1290  # 15 s

    pipe = ZonosPipeline.from_config(
        ZONOS_V01_TRANSFORMER, key=jax.random.key(0),
        dac=DACAutoencoder(),
    )
    rng = np.random.default_rng(7)
    ref_wav = rng.standard_normal(20 * 16000).astype(np.float32) * 0.1

    def run():
        spk = pipe.make_speaker_embedding(ref_wav, 16000)
        cond = pipe.make_cond_dict(
            text="Cloning this voice for a fifteen second utterance, "
                 "with the default emotion and speaking rate settings.",
            speaker=spk,
        )
        res = pipe.generate(
            cond, key=jax.random.key(0), max_new_tokens=steps,
            cfg_scale=2.0, sampling_params=SamplingParams(min_p=0.1),
            disable_eos=True,
        )
        return jnp.asarray(pipe.decode_audio(res))

    sec_per_call, wav = timed(run, warmup=1, iters=2)
    audio_s = wav.shape[-1] / 44100
    rtf = audio_s / sec_per_call
    report("e2e_rtf_voice_clone", rtf, "audio_s_per_s", rtf / REF_RTF)


if __name__ == "__main__":
    main()
