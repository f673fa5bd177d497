"""Golden-capture tool: run the PyTorch reference and dump per-stage tensors
for allclose parity testing (SURVEY.md build order P0).

Two modes:

1. **Checkpoint mode** (default; needs a reference-capable machine with
   network + espeak): loads the real HF checkpoint via the reference's
   ``Zonos.from_pretrained`` and captures every stage.

2. **``--random-init`` mode** (fully offline; runs in THIS environment):
   instantiates the reference's actual model code from ``/root/reference``
   with seeded random weights on CPU — missing deps (torchaudio, phonemizer,
   inflect, kanjize, sudachipy) are stubbed at import time, and the two HF
   downloads (Zonos checkpoint, descript/dac_44khz) are replaced by seeded
   random-init modules whose weights are ALSO saved into the capture dir.
   The parity statement is then: our JAX framework, loading the exact same
   weights, reproduces the reference *code*'s conditioning, greedy decode
   loop (CFG mix, delay pattern, EOS bias, logit masking — model.py:218-315)
   and DAC vocoding. Phoneme text->IPA parity still needs real espeak, so
   the phoneme stage is marked fake and its test skips.

Usage (offline, this environment):
  python tools/capture_reference.py --reference /root/reference \
      --random-init --out /tmp/golden
  ZVT_GOLDEN_DIR=/tmp/golden python -m pytest tests/test_golden_reference.py

Captured files:
  config.json            Zonos config (both sides parse this)
  model.safetensors      Zonos weights (torch layout, unpadded heads)
  dac_config.json        DAC topology (transformers DacConfig kwargs)
  dac_model.safetensors  DAC weights (torch layout, weight-norm raw)
  phonemes.json          text -> phoneme strings + token ids
  conditioning.npz       cond inputs + prefix_conditioner output
  decode_codes.npz       greedy (temperature=0) generated code grid
  dac_wav.npz            DAC decode of the code grid
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import types


def _install_stubs() -> None:
    """Stub modules the reference imports but this image lacks. Only code
    paths we don't exercise touch them (JP normalization, espeak, audio IO).
    """

    import importlib.machinery

    def mod(name: str, **attrs):
        m = types.ModuleType(name)
        m.__spec__ = importlib.machinery.ModuleSpec(name, None)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        return m

    def need(name: str) -> bool:
        try:
            __import__(name)
            return False
        except ImportError:
            return True

    if need("torchaudio"):
        ta = mod("torchaudio")
        ta.functional = mod("torchaudio.functional")
        ta.transforms = mod("torchaudio.transforms")

    if need("inflect"):
        class _Engine:
            def __getattr__(self, name):
                raise RuntimeError("inflect stub: number normalization "
                                   "unavailable in random-init capture")

        mod("inflect", engine=lambda: _Engine())

    if need("kanjize"):
        mod("kanjize", number2kanji=lambda n: str(n))

    if need("phonemizer"):
        pb = mod("phonemizer")
        pb.backend = mod("phonemizer.backend", EspeakBackend=object)

    if need("sudachipy"):
        # Dictionary(dict="full").create() runs at conditioning.py import
        # time (JP tokenizer default arg) — stub must survive that.
        class _Dictionary:
            def __init__(self, *a, **k):
                pass

            def create(self):
                return None

        mod("sudachipy", Dictionary=_Dictionary,
            SplitMode=types.SimpleNamespace(A=0, B=1, C=2))


# The small-but-real transformer topology used for random-init captures:
# same structure as Zonos-v0.1-transformer (conditioner roster, GQA, SwiGLU,
# vocab), scaled down so the CPU reference run takes seconds.
RANDOM_INIT_CONFIG = {
    "backbone": {
        "d_model": 512,
        "d_intermediate": 0,
        "attn_mlp_d_intermediate": 1536,
        "n_layer": 4,
        "ssm_cfg": {},
        "attn_layer_idx": [],
        "attn_cfg": {"num_heads": 8, "num_heads_kv": 2},
        "rms_norm": False,
        "residual_in_fp32": False,
        "norm_epsilon": 1e-5,
    },
    "prefix_conditioner": {
        "projection": "linear",
        "conditioners": [
            {"type": "EspeakPhonemeConditioner", "name": "espeak"},
            {"type": "PassthroughConditioner", "name": "speaker",
             "cond_dim": 128, "projection": "linear",
             "uncond_type": "learned"},
            {"type": "FourierConditioner", "name": "emotion",
             "input_dim": 8, "uncond_type": "learned"},
            {"type": "FourierConditioner", "name": "fmax", "min_val": 0,
             "max_val": 24000, "uncond_type": "learned"},
            {"type": "FourierConditioner", "name": "pitch_std",
             "min_val": 0, "max_val": 400, "uncond_type": "learned"},
            {"type": "FourierConditioner", "name": "speaking_rate",
             "min_val": 0, "max_val": 40, "uncond_type": "learned"},
            {"type": "IntegerConditioner", "name": "language_id",
             "min_val": -1, "max_val": 126, "uncond_type": "learned"},
        ],
    },
    "eos_token_id": 1024,
    "masked_token_id": 1025,
    "pad_vocab_to_multiple_of": 8,
}

# descript/dac_44khz topology with shrunken channel widths (hop stays 512,
# 9x1024 codebooks stay real so the code vocab matches the backbone).
RANDOM_INIT_DAC_CONFIG = {
    "encoder_hidden_size": 32,
    "downsampling_ratios": [2, 4, 8, 8],
    "decoder_hidden_size": 128,
    "n_codebooks": 9,
    "codebook_size": 1024,
    "codebook_dim": 8,
    "sampling_rate": 44100,
}


def capture_stages(model, out: str, text: str, language: str,
                   steps: int, fake_phonemes: bool) -> None:
    """Shared stage capture: phonemes, conditioning, greedy codes, DAC wav."""
    import numpy as np
    import torch

    from zonos.conditioning import make_cond_dict, phonemize, tokenize_phonemes

    # Stage 1: phonemes
    phonemes = phonemize([text], [language])
    ids, lengths = tokenize_phonemes(phonemes)
    with open(os.path.join(out, "phonemes.json"), "w") as f:
        json.dump({"text": text, "language": language,
                   "phonemes": phonemes, "token_ids": ids.tolist(),
                   "lengths": lengths, "fake_backend": fake_phonemes}, f)

    # Stage 2: conditioning
    cond_dict = make_cond_dict(text=text, language=language,
                               speaker=None, device="cpu")
    with torch.inference_mode():
        cond = model.prepare_conditioning(cond_dict)
    # Numeric cond inputs under cond_* (espeak as the stage-1 token ids) so
    # tests/test_golden_reference.py can replay the same conditioning.
    cond_inputs = {"cond_espeak": ids.numpy()}
    for name, value in cond_dict.items():
        if name == "espeak":
            continue
        if hasattr(value, "cpu"):
            cond_inputs[f"cond_{name}"] = value.float().cpu().numpy()
    np.savez(os.path.join(out, "conditioning.npz"),
             prefix=cond.float().numpy(), **cond_inputs)

    # Stage 3+4: greedy decode + codes (CFG 2.0, no torch.compile).
    # Record the FIRST sampling call's input — the CFG-mixed prefill logits
    # (model.py:258-264) — as a numeric target for bf16-tolerance parity
    # (real checkpoints run bf16; fp32 exact-code parity alone can't grade
    # the bf16 path).
    import zonos.model as zmodel

    first_logits: dict = {}
    orig_sample = zmodel.sample_from_logits

    def recording_sample(logits, *a, **k):
        if "logits" not in first_logits:
            first_logits["logits"] = logits.float().cpu().numpy()
        return orig_sample(logits, *a, **k)

    zmodel.sample_from_logits = recording_sample
    try:
        with torch.inference_mode():
            codes = model.generate(
                cond, max_new_tokens=steps, batch_size=1,
                sampling_params=dict(temperature=0.0), progress_bar=False,
                disable_torch_compile=True,
            )
    finally:
        zmodel.sample_from_logits = orig_sample
    np.savez(os.path.join(out, "prefill_logits.npz"),
             logits=first_logits["logits"], **cond_inputs)
    codes_np = codes.cpu().numpy()
    if codes_np.shape[-1] != steps:
        raise SystemExit(
            f"reference greedy decode stopped early ({codes_np.shape[-1]}/"
            f"{steps} frames — random weights hit EOS); re-run with a "
            "different --seed"
        )
    np.savez(os.path.join(out, "decode_codes.npz"),
             codes=codes_np, **cond_inputs)

    # Stage 5: DAC decode
    with torch.inference_mode():
        wav = model.autoencoder.decode(codes).cpu().float().numpy()
    np.savez(os.path.join(out, "dac_wav.npz"), wav=wav, codes=codes_np)

    print(f"captured {steps}-step golden set into {out}/")


def capture_random_init(args) -> None:
    # Import transformers BEFORE stubbing: its import-time availability scan
    # chokes on spec-less stub modules.
    from transformers.models.dac import DacConfig, DacModel

    _install_stubs()
    import torch
    from safetensors.torch import save_file

    torch.manual_seed(args.seed)

    # Seeded random DAC standing in for the descript/dac_44khz download.
    dac_model = DacModel(DacConfig(**RANDOM_INIT_DAC_CONFIG)).eval()
    dac_model.requires_grad_(False)

    import zonos.autoencoder as zae

    class _FakeDacModelFactory:
        @staticmethod
        def from_pretrained(_name):
            return dac_model

    zae.DacModel = _FakeDacModelFactory

    # Deterministic phonemizer stand-in (no espeak here): the raw text IS
    # the phoneme string — the symbol table covers ASCII letters/punct, so
    # this exercises tokenize + embedding with stable ids on both sides.
    import zonos.conditioning as zc
    zc.phonemize = lambda texts, languages: [t.lower() for t in texts]

    from zonos.config import ZonosConfig
    from zonos.model import Zonos

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "config.json"), "w") as f:
        json.dump(RANDOM_INIT_CONFIG, f, indent=1)
    with open(os.path.join(args.out, "dac_config.json"), "w") as f:
        json.dump(RANDOM_INIT_DAC_CONFIG, f, indent=1)

    torch.manual_seed(args.seed + 1)
    model = Zonos(ZonosConfig.from_dict(RANDOM_INIT_CONFIG)).eval()  # fp32 CPU
    model.requires_grad_(False)

    # The capture runs fp32 end-to-end for tight tolerances, but setup_cache
    # hardcodes a bf16 KV cache (model.py:198) for the bf16 production model
    # — pin it to fp32 to match the fp32 weights.
    _setup_cache = model.setup_cache
    model.setup_cache = (
        lambda batch_size, max_seqlen, dtype=torch.float32:
        _setup_cache(batch_size, max_seqlen, torch.float32)
    )

    # Zonos weights exactly as a HF checkpoint ships them (unpadded heads —
    # the pad hook only fires on load_state_dict, model.py:46-51).
    save_file({k: v.contiguous() for k, v in model.state_dict().items()},
              os.path.join(args.out, "model.safetensors"))
    # transformers keeps conv weight-norm as parametrizations; state_dict
    # already exposes original0/original1 leaves our converter fuses.
    save_file({k: v.contiguous() for k, v in dac_model.state_dict().items()},
              os.path.join(args.out, "dac_model.safetensors"))

    capture_stages(model, args.out, args.text, args.language, args.steps,
                   fake_phonemes=True)
    capture_speaker_tower(args)


# Shrunken speaker tower (reference speaker_cloning.py:153-224 structure:
# SimAM ResNet -> ASP -> bottleneck, plus the LDA head): same code, smaller
# width/depths so the CPU run is fast. The mel frontend needs torchaudio, so
# the capture feeds precomputed log-fbank features (featCal=Identity) — our
# side enters at the same point (SpeakerEncoder.embed_with_lda).
RANDOM_INIT_SPEAKER_CONFIG = {
    "in_planes": 8,
    "embd_dim": 32,
    "acoustic_dim": 80,
    "lda_dim": 16,
    "depths": [2, 2, 2, 2],
}


def capture_speaker_tower(args) -> None:
    import numpy as np
    import torch
    from safetensors.torch import save_file

    import zonos.speaker_cloning as zsc

    cfg = RANDOM_INIT_SPEAKER_CONFIG
    torch.manual_seed(args.seed + 2)

    orig = zsc.ResNet293
    zsc.ResNet293 = lambda in_planes, **kw: zsc.ResNet(
        in_planes, zsc.SimAMBasicBlock, list(cfg["depths"]), **kw
    )
    try:
        tower = zsc.ResNet293_based(
            in_planes=cfg["in_planes"], embd_dim=cfg["embd_dim"],
            acoustic_dim=cfg["acoustic_dim"], featCal=torch.nn.Identity(),
        ).eval()
    finally:
        zsc.ResNet293 = orig
    tower.requires_grad_(False)
    # Randomize BN running stats — fresh BNs are (0, 1), which would make
    # conversion-time BN folding trivially correct.
    for m in tower.modules():
        if isinstance(m, torch.nn.modules.batchnorm._BatchNorm):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 2.0)
    lda = torch.nn.Linear(cfg["embd_dim"], cfg["lda_dim"]).eval()
    lda.requires_grad_(False)

    fbank = torch.randn(1, cfg["acoustic_dim"], 50) * 2.0  # log-mel scale
    with torch.inference_mode():
        emb = tower(fbank).float()
        lda_emb = lda(emb)

    save_file({k: v.contiguous() for k, v in tower.state_dict().items()},
              os.path.join(args.out, "speaker_model.safetensors"))
    save_file({k: v.contiguous() for k, v in lda.state_dict().items()},
              os.path.join(args.out, "speaker_lda.safetensors"))
    with open(os.path.join(args.out, "speaker_config.json"), "w") as f:
        json.dump(cfg, f)
    np.savez(os.path.join(args.out, "speaker_golden.npz"),
             fbank=fbank.numpy(), emb=emb.numpy(), lda=lda_emb.numpy())


def capture_checkpoint(args) -> None:
    import torch

    from zonos.model import Zonos

    os.makedirs(args.out, exist_ok=True)
    torch.manual_seed(421)
    model = Zonos.from_pretrained(args.model, device="cpu")
    capture_stages(model, args.out, args.text, args.language, args.steps,
                   fake_phonemes=False)


def capture_local(args) -> None:
    """Capture from a LOCAL checkpoint pair (``config.json`` +
    ``model.safetensors`` in ``--local-dir``) — the golden half of
    ``tools/verify_checkpoint.py``. Fully offline: optional deps stub in
    only when absent; without espeak the deterministic phonemizer stand-in
    runs and the capture is marked ``fake_phonemes``. DAC weights beside
    the checkpoint (``dac_model.safetensors`` + ``dac_config.json``) are
    used when present; otherwise a seeded random DAC still exercises the
    vocode path with shared weights."""
    import shutil

    from transformers.models.dac import DacConfig, DacModel

    _install_stubs()
    import torch
    from safetensors.torch import load_file, save_file

    src = args.local_dir
    with open(os.path.join(src, "config.json")) as f:
        cfg_dict = json.load(f)

    dac_cfg_path = os.path.join(src, "dac_config.json")
    dac_w_path = os.path.join(src, "dac_model.safetensors")
    if os.path.exists(dac_cfg_path) and os.path.exists(dac_w_path):
        with open(dac_cfg_path) as f:
            dac_cfg = json.load(f)
        dac_model = DacModel(DacConfig(**dac_cfg)).eval()
        dac_model.load_state_dict(load_file(dac_w_path))
    else:
        torch.manual_seed(args.seed)
        dac_cfg = RANDOM_INIT_DAC_CONFIG
        dac_model = DacModel(DacConfig(**dac_cfg)).eval()
    dac_model.requires_grad_(False)

    import zonos.autoencoder as zae

    class _LocalDacFactory:
        @staticmethod
        def from_pretrained(_name):
            return dac_model

    zae.DacModel = _LocalDacFactory

    # Real espeak if the phonemizer stack is live; stand-in otherwise.
    fake_phonemes = True
    try:
        from phonemizer.backend import EspeakBackend
        fake_phonemes = EspeakBackend is object  # our stub
    except Exception:
        pass
    if fake_phonemes:
        import zonos.conditioning as zc
        zc.phonemize = lambda texts, languages: [t.lower() for t in texts]

    from zonos.config import ZonosConfig
    from zonos.model import Zonos

    os.makedirs(args.out, exist_ok=True)
    model = Zonos(ZonosConfig.from_dict(cfg_dict)).eval()
    sd = load_file(os.path.join(src, "model.safetensors"))
    model.load_state_dict(sd)  # pad hook fires here (model.py:46-51)
    model.requires_grad_(False)
    if next(iter(sd.values())).dtype == torch.float32:
        # fp32 artifacts need the KV cache pinned to fp32 (setup_cache
        # hardcodes bf16 for the production model, model.py:198).
        _setup_cache = model.setup_cache
        model.setup_cache = (
            lambda batch_size, max_seqlen, dtype=torch.float32:
            _setup_cache(batch_size, max_seqlen, torch.float32)
        )

    with open(os.path.join(args.out, "config.json"), "w") as f:
        json.dump(cfg_dict, f, indent=1)
    with open(os.path.join(args.out, "dac_config.json"), "w") as f:
        json.dump(dac_cfg, f, indent=1)
    # Ship the SOURCE weights verbatim (the in-memory state_dict now carries
    # padded heads, which the converter treats as a fresh-checkpoint pad).
    if os.path.abspath(src) != os.path.abspath(args.out):
        shutil.copy(os.path.join(src, "model.safetensors"),
                    os.path.join(args.out, "model.safetensors"))
    save_file({k: v.contiguous() for k, v in dac_model.state_dict().items()},
              os.path.join(args.out, "dac_model.safetensors"))

    capture_stages(model, args.out, args.text, args.language, args.steps,
                   fake_phonemes=fake_phonemes)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", required=True)
    ap.add_argument("--model", default="Zyphra/Zonos-v0.1-transformer")
    ap.add_argument("--out", default="golden")
    ap.add_argument("--text", default="It would be nice to have time for testing, indeed.")
    ap.add_argument("--language", default="en-us")
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--seed", type=int, default=421)
    ap.add_argument("--random-init", action="store_true",
                    help="offline mode: seeded random weights through the "
                         "reference code instead of the HF checkpoint")
    ap.add_argument("--local-dir", default=None,
                    help="offline mode: capture from a local checkpoint "
                         "pair (config.json + model.safetensors) in DIR")
    args = ap.parse_args()

    sys.path.insert(0, args.reference)
    if args.random_init:
        capture_random_init(args)
    elif args.local_dir:
        capture_local(args)
    else:
        capture_checkpoint(args)


if __name__ == "__main__":
    main()
