"""Golden-parity vs the PyTorch reference (SURVEY.md §4, BASELINE north
star: waveform-allclose).

Runs only when ``ZVT_GOLDEN_DIR`` points at a directory produced by
``tools/capture_reference.py`` on a reference-capable machine, containing
the captured stage tensors PLUS the checkpoint pair (config.json +
model.safetensors). Skipped otherwise (this environment has no checkpoint
egress).
"""

import json
import os

import numpy as np
import pytest

GOLDEN = os.environ.get("ZVT_GOLDEN_DIR")

pytestmark = pytest.mark.skipif(
    not GOLDEN or not os.path.isdir(GOLDEN),
    reason="ZVT_GOLDEN_DIR with reference captures + checkpoint not set",
)


@pytest.fixture(scope="module")
def pipe():
    import jax.numpy as jnp

    from zonos_vibes_tpu.pipeline import ZonosPipeline

    return ZonosPipeline.from_local(
        os.path.join(GOLDEN, "config.json"),
        os.path.join(GOLDEN, "model.safetensors"),
        dtype=jnp.float32,  # parity runs want fp32 + highest matmul precision
    )


def test_phoneme_parity(pipe):
    from zonos_vibes_tpu.frontend.phonemize import backend_name, phonemize
    from zonos_vibes_tpu.frontend.text import tokenize_phonemes

    if backend_name() == "fallback":
        pytest.skip("espeak not installed — phoneme parity needs the C tier")
    with open(os.path.join(GOLDEN, "phonemes.json")) as f:
        ref = json.load(f)
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
    # steps, but early steps must match exactly.
    np.testing.assert_array_equal(ours[..., :8], d["codes"][..., :8])
    assert agree > 0.9, f"greedy code agreement {agree:.3f}"


def test_waveform_parity(pipe):
    import jax.numpy as jnp

    d = np.load(os.path.join(GOLDEN, "dac_wav.npz"))
    wav = pipe.decode_audio(jnp.asarray(d["codes"]))
    ref = d["wav"].reshape(wav.shape)
    np.testing.assert_allclose(wav, ref, rtol=5e-3, atol=5e-3)
