"""BASELINE config 4: multilingual batch, heterogeneous lengths, min-p.

Batch of 8 utterances (en/ja/cmn/fr-fr/de phoneme streams of different
lengths, LEFT-padded per reference conditioning.py:163-168) decoded in ONE
CFG-doubled call. Reports AGGREGATE audio-seconds per second — the DP win
the reference cannot express (it serves one utterance at a time).
"""

import sys

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench.common import FRAME_RATE, REF_RTF, phoneme_batch, report, timed  # noqa: E402


def main():
    from zonos_vibes_tpu.config import ZONOS_V01_TRANSFORMER
    from zonos_vibes_tpu.engine.generate import DecodeEngine
    from zonos_vibes_tpu.models.zonos import ZonosModel
    from zonos_vibes_tpu.ops.sampling import SamplingParams

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 430  # 5 s each
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    model = ZonosModel(ZONOS_V01_TRANSFORMER)
    params = model.init(jax.random.key(0))
    engine = DecodeEngine(model)

    # Heterogeneous phoneme lengths (short ja sentence .. long en paragraph)
    # + per-row language ids, mirroring pipeline.make_batch_cond_dict.
    lengths = [24, 40, 56, 64, 80, 96, 112, 120][:batch]
    phonemes = jnp.asarray(phoneme_batch(lengths))
    lang_ids = jnp.asarray(
        [[[i % 5]] for i in range(batch)], jnp.float32
    )  # en/ja/cmn/fr/de id slots
    cond = model.prepare_conditioning(
        params, {"espeak": phonemes, "language_id": lang_ids}
    )

    def run():
        res = engine.generate(
            params, cond, key=jax.random.key(2), max_new_tokens=steps,
            cfg_scale=2.0, sampling_params=SamplingParams(min_p=0.1),
            disable_eos=True,
        )
        return res.codes

    sec_per_call, codes = timed(run, warmup=1, iters=3)
    aggregate = batch * steps / FRAME_RATE / sec_per_call
    report(
        f"aggregate_rtf_batch{batch}_multilingual", aggregate,
        "audio_s_per_s", aggregate / REF_RTF,
    )


if __name__ == "__main__":
    main()
