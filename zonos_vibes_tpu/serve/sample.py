"""Minimal end-to-end script (mirrors reference sample.py:1-22):
model -> speaker embedding -> cond dict -> generate -> DAC decode -> WAV.

With no checkpoint available the pipeline random-inits (same topology); pass
--config/--weights to load a converted reference checkpoint.
"""

from __future__ import annotations

import argparse

import jax
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None, help="checkpoint config.json")
    ap.add_argument("--weights", default=None, help="model.safetensors")
    ap.add_argument("--text", default="Hello, world!")
    ap.add_argument("--language", default="en-us")
    ap.add_argument("--speaker-wav", default=None)
    ap.add_argument("--seed", type=int, default=421)  # reference sample.py:13
    ap.add_argument("--out", default="sample.wav")
    ap.add_argument("--max-seconds", type=float, default=10.0)
    args = ap.parse_args()

    from zonos_vibes_tpu.pipeline import ZonosPipeline
    from zonos_vibes_tpu.serve.server import read_wav, wav_bytes

    if args.config and args.weights:
        pipe = ZonosPipeline.from_local(args.config, args.weights)
    else:
        from zonos_vibes_tpu.config import ZONOS_V01_TRANSFORMER

        pipe = ZonosPipeline.from_config(ZONOS_V01_TRANSFORMER)

    speaker = None
    if args.speaker_wav:
        wav, sr = read_wav(args.speaker_wav)
        speaker = pipe.make_speaker_embedding(wav, sr)

    cond = pipe.make_cond_dict(
        text=args.text, language=args.language, speaker=speaker
    )
    result = pipe.generate(
        cond, key=jax.random.key(args.seed),
        max_new_tokens=int(86 * args.max_seconds),
    )
    wav = pipe.decode_audio(result)[0]
    with open(args.out, "wb") as f:
        f.write(wav_bytes(np.asarray(wav), pipe.dac.sampling_rate))
    print(f"wrote {args.out}: {wav.shape[-1] / pipe.dac.sampling_rate:.2f}s")


if __name__ == "__main__":
    main()
