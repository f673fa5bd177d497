"""Golden-parity vs the PyTorch reference (SURVEY.md §4, BASELINE north
star: waveform-allclose).

Capture sources, in priority order:

1. ``ZVT_GOLDEN_DIR`` — a directory produced by
   ``tools/capture_reference.py`` (real-checkpoint captures from a
   reference-capable machine, or a pre-built random-init capture).
2. **Auto-capture**: when the reference repo is on disk
   (``ZVT_REFERENCE_DIR``, default ``/root/reference``), the reference's
   own PyTorch code is run once per tool version with seeded random
   weights (``--random-init``; CPU, fully offline) and the capture is
   cached under the system temp dir. This makes reference parity part of
   the normal suite: conditioning, the greedy decode loop (CFG mix, delay
   pattern, EOS bias, masked_scatter fill) and DAC vocoding are checked
   against the reference *implementation*, not our reimplementation of it.

Skipped only when neither source is available.
"""

import hashlib
import json
import os
import subprocess
import sys
import tempfile

import numpy as np
import pytest

_REFERENCE = os.environ.get("ZVT_REFERENCE_DIR", "/root/reference")
_TOOL = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "tools",
                 "capture_reference.py")
)


def _auto_capture() -> str | None:
    """Run the reference (random-init, offline) once; cache per tool hash."""
    if not os.path.isdir(os.path.join(_REFERENCE, "zonos")):
        return None
    if not os.path.exists(_TOOL):
        return None
    with open(_TOOL, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:12]
    out = os.path.join(tempfile.gettempdir(), f"zvt-golden-{tag}")
    marker = os.path.join(out, ".complete")
    if not os.path.exists(marker):
        r = subprocess.run(
            [sys.executable, _TOOL, "--reference", _REFERENCE,
             "--random-init", "--out", out],
            capture_output=True, text=True, timeout=900,
            env={**os.environ, "JAX_PLATFORMS": "cpu"},
        )
        if r.returncode != 0:
            return None
        with open(marker, "w") as f:
            f.write("ok")
    return out


GOLDEN = os.environ.get("ZVT_GOLDEN_DIR") or _auto_capture()

pytestmark = pytest.mark.skipif(
    not GOLDEN or not os.path.isdir(GOLDEN),
    reason="no golden captures: ZVT_GOLDEN_DIR unset and no reference repo "
           "for auto-capture",
)


@pytest.fixture(scope="module")
def pipe():
    import dataclasses

    import jax.numpy as jnp

    from zonos_vibes_tpu.pipeline import ZonosPipeline

    kwargs = {}
    dac_path = os.path.join(GOLDEN, "dac_model.safetensors")
    if os.path.exists(dac_path):
        # Captures from --random-init mode ship the DAC weights the
        # reference run actually used; load them for waveform parity.
        import safetensors.numpy

        from zonos_vibes_tpu.models.autoencoder import DACAutoencoder
        from zonos_vibes_tpu.models.dac import DACConfig
        from zonos_vibes_tpu.utils.checkpoint import convert_dac_state_dict

        with open(os.path.join(GOLDEN, "dac_config.json")) as f:
            dc = json.load(f)
        fields = {f.name for f in dataclasses.fields(DACConfig)}
        cfg = DACConfig(**{
            k: tuple(v) if isinstance(v, list) else v
            for k, v in dc.items() if k in fields
        })
        dac = DACAutoencoder(cfg)
        sd = safetensors.numpy.load_file(dac_path)
        kwargs["dac"] = dac
        kwargs["dac_params"] = convert_dac_state_dict(sd, cfg, jnp.float32)

    return ZonosPipeline.from_local(
        os.path.join(GOLDEN, "config.json"),
        os.path.join(GOLDEN, "model.safetensors"),
        dtype=jnp.float32,  # parity runs want fp32 + highest matmul precision
        **kwargs,
    )


def test_phoneme_parity(pipe):
    from zonos_vibes_tpu.frontend.phonemize import backend_name, phonemize
    from zonos_vibes_tpu.frontend.text import tokenize_phonemes

    if backend_name() == "fallback":
        pytest.skip("espeak not installed — phoneme parity needs the C tier")
    with open(os.path.join(GOLDEN, "phonemes.json")) as f:
        ref = json.load(f)
    if ref.get("fake_backend"):
        pytest.skip("capture used the random-init fake phonemizer")
    ours = phonemize([ref["text"]], [ref["language"]])
    assert ours[0] == ref["phonemes"][0]
    ids, _ = tokenize_phonemes(ours)
    assert ids[0] == ref["token_ids"][0]


def test_conditioning_parity(pipe):
    import jax.numpy as jnp

    d = np.load(os.path.join(GOLDEN, "conditioning.npz"))
    cond_dict = {
        k[5:]: jnp.asarray(d[k]) for k in d.files if k.startswith("cond_")
    }
    ours = np.asarray(pipe.prepare_conditioning(cond_dict), np.float32)
    np.testing.assert_allclose(ours, d["prefix"], rtol=2e-3, atol=2e-3)


def test_greedy_codes_parity(pipe):
    import jax
    import jax.numpy as jnp

    from zonos_vibes_tpu.ops.sampling import SamplingParams

    d = np.load(os.path.join(GOLDEN, "decode_codes.npz"))
    cond_dict = {
        k[5:]: jnp.asarray(d[k]) for k in d.files if k.startswith("cond_")
    }
    steps = int(d["codes"].shape[-1])
    res = pipe.generate(
        cond_dict, key=jax.random.key(0), max_new_tokens=steps,
        sampling_params=SamplingParams(temperature=0.0), disable_eos=True,
    )
    ours = np.asarray(res.codes)[..., :steps]
    agree = (ours == d["codes"]).mean()
    # Greedy decode is argmax-chained: tiny numeric diffs can flip late
    # steps, but early steps must match exactly. (Random-init fp32 captures
    # measure 1.0 here, including the final-8-column masked_scatter shift —
    # engine/generate.py::_masked_scatter_frame.)
    np.testing.assert_array_equal(ours[..., :16], d["codes"][..., :16])
    assert agree > 0.9, f"greedy code agreement {agree:.3f}"


def test_speaker_tower_parity():
    """Our SimAM-ResNet+ASP+LDA (BN-folded at conversion) vs the reference's
    own speaker_cloning.py classes run with the same random weights."""
    path = os.path.join(GOLDEN, "speaker_golden.npz")
    if not os.path.exists(path):
        pytest.skip("capture has no speaker stage")
    import jax.numpy as jnp
    import safetensors.numpy

    from zonos_vibes_tpu.models.speaker import (
        SpeakerEncoder,
        convert_speaker_state_dict,
    )

    with open(os.path.join(GOLDEN, "speaker_config.json")) as f:
        cfg = json.load(f)
    enc = SpeakerEncoder(
        in_planes=cfg["in_planes"], embd_dim=cfg["embd_dim"],
        acoustic_dim=cfg["acoustic_dim"], lda_dim=cfg["lda_dim"],
        depths=tuple(cfg["depths"]),
    )
    sd = safetensors.numpy.load_file(
        os.path.join(GOLDEN, "speaker_model.safetensors")
    )
    lda_sd = safetensors.numpy.load_file(
        os.path.join(GOLDEN, "speaker_lda.safetensors")
    )
    params = convert_speaker_state_dict(
        sd, lda_sd, depths=tuple(cfg["depths"])
    )
    d = np.load(path)
    emb, lda = enc.embed_with_lda(params, jnp.asarray(d["fbank"]))
    np.testing.assert_allclose(np.asarray(emb), d["emb"], rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(lda), d["lda"], rtol=2e-3, atol=2e-4)


def test_waveform_parity(pipe):
    import jax.numpy as jnp

    d = np.load(os.path.join(GOLDEN, "dac_wav.npz"))
    wav = pipe.decode_audio(jnp.asarray(d["codes"]))
    ref = d["wav"].reshape(wav.shape)
    np.testing.assert_allclose(wav, ref, rtol=5e-3, atol=5e-3)

# ---------------------------------------------------------------------------
# bf16 tolerances (VERDICT r1, missing #1): real checkpoints run bf16; these
# grade the bf16 path against the reference's fp32 capture with documented
# tolerances (fp32 exact-code parity above cannot see bf16-only bugs).
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def pipe_bf16():
    import jax.numpy as jnp

    from zonos_vibes_tpu.pipeline import ZonosPipeline

    return ZonosPipeline.from_local(
        os.path.join(GOLDEN, "config.json"),
        os.path.join(GOLDEN, "model.safetensors"),
        dtype=jnp.bfloat16,
    )


def test_bf16_conditioning_tolerance(pipe_bf16):
    import jax.numpy as jnp

    d = np.load(os.path.join(GOLDEN, "conditioning.npz"))
    cond_dict = {
        k[5:]: jnp.asarray(d[k]) for k in d.files if k.startswith("cond_")
    }
    ours = np.asarray(
        pipe_bf16.prepare_conditioning(cond_dict), np.float32
    )
    # bf16 has ~3 decimal digits; conditioning values are O(1).
    np.testing.assert_allclose(ours, d["prefix"], rtol=2e-2, atol=2e-2)


def test_bf16_prefill_logits_tolerance(pipe):
    """Our bf16 prefill logits (CFG-mixed, the exact tensor the first
    sampling call sees, model.py:258-264) vs the reference's recorded fp32
    logits; also requires greedy argmax agreement on every codebook.

    On TPU this runs the real bf16 program. XLA:CPU cannot execute the
    bf16 x bf16 -> f32 dots the logit path uses, so there the test grades
    bf16 WEIGHT STORAGE (params round-tripped through bf16 into an fp32
    program) — the dominant bf16 error source for weight-bound inference."""
    import jax
    import jax.numpy as jnp

    from zonos_vibes_tpu.engine.generate import UNKNOWN_TOKEN
    from zonos_vibes_tpu.ops.delay_pattern import apply_delay_pattern
    from zonos_vibes_tpu.ops.rope import rope_table

    path = os.path.join(GOLDEN, "prefill_logits.npz")
    if not os.path.exists(path):
        pytest.skip("capture predates prefill-logits recording")
    d = np.load(path)
    cond_dict = {
        k[5:]: jnp.asarray(d[k]) for k in d.files if k.startswith("cond_")
    }
    on_tpu = jax.default_backend() == "tpu"
    model = pipe.model
    cfg = model.config
    K = cfg.num_codebooks
    if on_tpu:
        from zonos_vibes_tpu.pipeline import ZonosPipeline

        p = ZonosPipeline.from_local(
            os.path.join(GOLDEN, "config.json"),
            os.path.join(GOLDEN, "model.safetensors"),
            dtype=jnp.bfloat16,
        )
        params, act_dtype, cache_dtype = p.params, jnp.bfloat16, jnp.bfloat16
        cond = p.prepare_conditioning(cond_dict)
    else:
        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16).astype(jnp.float32)
            if jnp.issubdtype(x.dtype, jnp.floating) else x,
            pipe.params,
        )
        act_dtype, cache_dtype = jnp.float32, jnp.float32
        cond = model.prepare_conditioning(params, cond_dict)

    codes = jnp.full((1, K, 8), UNKNOWN_TOKEN, jnp.int32)
    delayed = apply_delay_pattern(codes, cfg.masked_token_id)
    emb = model.embed_codes(params, delayed[..., :1])
    emb = jnp.concatenate([emb, emb], axis=0)
    hidden = jnp.concatenate([cond.astype(act_dtype), emb.astype(act_dtype)],
                             axis=1)
    cache = model.allocate_cache(2, 64, cache_dtype)
    logits, _ = model.compute_logits(
        params, hidden, cache, jnp.int32(0), jnp.zeros((2,), jnp.int32),
        2.0, rope_table(cfg.backbone.head_dim),
    )
    ours = np.asarray(logits, np.float32)[..., :1025]
    ref = d["logits"][..., :1025]
    # Logit-scale tolerance: bf16 params (and on TPU, activations) through
    # the full stack.
    scale = np.abs(ref).max()
    np.testing.assert_allclose(ours, ref, atol=0.05 * scale, rtol=0.05)
    np.testing.assert_array_equal(ours.argmax(-1), ref.argmax(-1))
