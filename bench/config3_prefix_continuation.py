"""BASELINE config 3: audio-prefix continuation + conditioning knob sweep.

5 s audio prefix -> DAC encode -> continue 10 s with emotion/pitch/rate
knobs set (CONDITIONING_README ranges). The long prefill crosses the Pallas
flash-prefill path when eligible. Reference path: gradio_interface.py:153-179.
"""

import sys

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from bench.common import REF_RTF, report, timed  # noqa: E402

KNOBS = [
    dict(emotion=[0.6, 0.05, 0.05, 0.05, 0.05, 0.05, 0.05, 0.1],
         pitch_std=45.0, speaking_rate=10.0),
    dict(emotion=[0.05, 0.6, 0.05, 0.05, 0.05, 0.05, 0.05, 0.1],
         pitch_std=20.0, speaking_rate=20.0),
    dict(emotion=[0.1, 0.05, 0.05, 0.05, 0.05, 0.5, 0.05, 0.15],
         pitch_std=120.0, speaking_rate=30.0, fmax=12000.0),
]


def main():
    from zonos_vibes_tpu.config import ZONOS_V01_TRANSFORMER
    from zonos_vibes_tpu.models.autoencoder import DACAutoencoder
    from zonos_vibes_tpu.pipeline import ZonosPipeline
    from zonos_vibes_tpu.ops.sampling import SamplingParams

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 860  # 10 s continuation

    pipe = ZonosPipeline.from_config(
        ZONOS_V01_TRANSFORMER, key=jax.random.key(0),
        dac=DACAutoencoder(),
    )
    rng = np.random.default_rng(3)
    prefix_wav = rng.standard_normal(5 * 44100).astype(np.float32) * 0.1
    prefix_codes = pipe.encode_audio(prefix_wav, 44100)

    def run_one(knobs):
        cond = pipe.make_cond_dict(
            text="Continuing the provided audio in the same style.", **knobs
        )
        res = pipe.generate(
            cond, prefix_codes, key=jax.random.key(1), max_new_tokens=steps,
            cfg_scale=2.0, sampling_params=SamplingParams(min_p=0.1),
            disable_eos=True,
        )
        return jnp.asarray(pipe.decode_audio(res))

    # Warm every knob combo once (each emotion/pitch combo shares the same
    # compiled program — knob values are runtime tensors, not shapes).
    sec_per_call, wav = timed(lambda: run_one(KNOBS[0]), warmup=1, iters=1)
    total = 0.0
    for k in KNOBS[1:]:
        s, wav = timed(lambda: run_one(k), warmup=0, iters=1)
        total += s
    sec_per_call = (sec_per_call + total) / len(KNOBS)
    # RTF over newly generated audio only (prefix replayed, not generated).
    new_audio_s = steps / (44100 / 512)
    rtf = new_audio_s / sec_per_call
    report("e2e_rtf_prefix_continuation", rtf, "audio_s_per_s", rtf / REF_RTF)


if __name__ == "__main__":
    main()
