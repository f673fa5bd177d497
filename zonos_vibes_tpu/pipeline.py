"""User-facing pipeline: the reference ``Zonos`` surface rebuilt TPU-native.

Mirrors the reference API (zonos/model.py:22-315, zonos/conditioning.py:330-
405) so a reference user can switch with minimal changes:

  pipe = ZonosPipeline.from_local(config_path, model_path)   # or .from_config
  spk = pipe.make_speaker_embedding(wav, sr)
  cond = pipe.make_cond_dict(text="...", speaker=spk, language="en-us")
  codes = pipe.generate(cond, key=jax.random.key(0))
  wav44k = pipe.decode_audio(codes)

Host/device split: text normalization + phonemization + tokenization run on
host (frontend/), everything numeric runs jitted on device. PRNG is explicit
JAX keys (replacing torch.manual_seed).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .config import ZonosConfig
from .engine.generate import DecodeEngine, GenerateResult
from .frontend.phonemize import phonemize
from .frontend.text import tokenize_phonemes
from .models.autoencoder import DACAutoencoder
from .models.speaker import SpeakerEncoder
from .models.zonos import ZonosModel
from .ops.sampling import SamplingParams
from .utils import tracing

# 108 eSpeak language codes (reference conditioning.py:316-327).
supported_language_codes = [
    'af', 'am', 'an', 'ar', 'as', 'az', 'ba', 'bg', 'bn', 'bpy', 'bs', 'ca', 'cmn',
    'cs', 'cy', 'da', 'de', 'el', 'en-029', 'en-gb', 'en-gb-scotland', 'en-gb-x-gbclan',
    'en-gb-x-gbcwmd', 'en-gb-x-rp', 'en-us', 'eo', 'es', 'es-419', 'et', 'eu', 'fa',
    'fa-latn', 'fi', 'fr-be', 'fr-ch', 'fr-fr', 'ga', 'gd', 'gn', 'grc', 'gu', 'hak',
    'hi', 'hr', 'ht', 'hu', 'hy', 'hyw', 'ia', 'id', 'is', 'it', 'ja', 'jbo', 'ka',
    'kk', 'kl', 'kn', 'ko', 'kok', 'ku', 'ky', 'la', 'lfn', 'lt', 'lv', 'mi', 'mk',
    'ml', 'mr', 'ms', 'mt', 'my', 'nb', 'nci', 'ne', 'nl', 'om', 'or', 'pa', 'pap',
    'pl', 'pt', 'pt-br', 'py', 'quc', 'ro', 'ru', 'ru-lv', 'sd', 'shn', 'si', 'sk',
    'sl', 'sq', 'sr', 'sv', 'sw', 'ta', 'te', 'tn', 'tr', 'tt', 'ur', 'uz', 'vi',
    'vi-vn-x-central', 'vi-vn-x-south', 'yue',
]
_LANGUAGE_TO_ID = {lang: i for i, lang in enumerate(supported_language_codes)}

DEFAULT_EMOTION = [0.3077, 0.0256, 0.0256, 0.0256, 0.0256, 0.0256, 0.2564, 0.3077]


@dataclass
class ZonosPipeline:
    model: ZonosModel
    params: dict
    dac: DACAutoencoder = field(default_factory=DACAutoencoder)
    dac_params: dict | None = None
    speaker_encoder: SpeakerEncoder | None = None
    speaker_params: dict | None = None

    def __post_init__(self):
        self.engine = DecodeEngine(self.model)
        self._decode_jit = jax.jit(self.dac.model.decode)
        self._encode_jit = jax.jit(self.dac.model.encode)
        # Jitted per cond-dict structure/shape (the server buckets phoneme
        # lengths, so this compiles a handful of variants); unjitted this
        # ran tens of eager dispatches per request on remote-TPU setups.
        self._prepare_jit = jax.jit(self.model.prepare_conditioning)

    # -- constructors -------------------------------------------------------

    @classmethod
    def from_local(
        cls, config_path: str, model_path: str, dtype=jnp.bfloat16, **kwargs
    ) -> "ZonosPipeline":
        """Load a reference checkpoint pair (config.json + model.safetensors)
        (reference from_local, model.py:65-88)."""
        from .utils.checkpoint import load_zonos_checkpoint

        config, params = load_zonos_checkpoint(config_path, model_path, dtype)
        return cls(model=ZonosModel(config), params=params, **kwargs)

    @classmethod
    def from_pretrained(
        cls, repo_id: str, dtype=jnp.bfloat16, revision: str | None = None,
        **kwargs,
    ) -> "ZonosPipeline":
        """Download ``config.json`` + ``model.safetensors`` from the HF hub
        and load (reference from_pretrained, model.py:57-63). Requires
        network access + ``huggingface_hub``; in offline environments use
        :meth:`from_local` with pre-downloaded files — converted params are
        disk-cached either way (utils/checkpoint.py)."""
        try:
            from huggingface_hub import hf_hub_download
        except ImportError as e:  # pragma: no cover - env without hub
            raise RuntimeError(
                "from_pretrained needs huggingface_hub; use from_local with "
                "downloaded config.json/model.safetensors instead"
            ) from e
        config_path = hf_hub_download(
            repo_id=repo_id, filename="config.json", revision=revision
        )
        model_path = hf_hub_download(
            repo_id=repo_id, filename="model.safetensors", revision=revision
        )
        return cls.from_local(config_path, model_path, dtype=dtype, **kwargs)

    @classmethod
    def from_config(
        cls, config: ZonosConfig, key: jax.Array | None = None,
        dtype=jnp.bfloat16, init_dac: bool = True, **kwargs
    ) -> "ZonosPipeline":
        """Random-init pipeline (for environments without checkpoints)."""
        key = key if key is not None else jax.random.key(0)
        k1, k2 = jax.random.split(key)
        model = ZonosModel(config)
        pipe = cls(model=model, params=model.init(k1, dtype), **kwargs)
        if init_dac and pipe.dac_params is None:
            pipe.dac_params = pipe.dac.init(k2)
        return pipe

    # -- speaker cloning ----------------------------------------------------

    def make_speaker_embedding(self, wav, sr: int) -> jnp.ndarray:
        """``[C, T] or [T]`` reference audio -> ``[1, 1, 128]`` bf16 LDA
        embedding (reference model.py:90-95)."""
        if self.speaker_encoder is None:
            self.speaker_encoder = SpeakerEncoder()
        if self.speaker_params is None:
            self.speaker_params = self.speaker_encoder.init(jax.random.key(0))
        _, lda = self.speaker_encoder(self.speaker_params, jnp.asarray(wav), sr)
        return lda.reshape(1, 1, -1).astype(jnp.bfloat16)

    # -- conditioning -------------------------------------------------------

    def make_cond_dict(
        self,
        text: str = "It would be nice to have time for testing, indeed.",
        language: str = "en-us",
        speaker: jnp.ndarray | None = None,
        emotion: list[float] | None = None,
        fmax: float = 22050.0,
        pitch_std: float = 20.0,
        speaking_rate: float = 15.0,
        vqscore_8: list[float] | None = None,
        ctc_loss: float = 0.0,
        dnsmos_ovrl: float = 4.0,
        speaker_noised: bool = False,
        unconditional_keys: Any = frozenset({"vqscore_8", "dnsmos_ovrl"}),
        _phoneme_ids: list | None = None,  # precomputed (batch path)
    ) -> dict:
        """Build the numeric cond dict (reference conditioning.py:330-405).
        Host-side phonemization happens here; the result contains only
        arrays, so ``prepare_conditioning`` is pure device math."""
        language = language.lower()
        if language not in _LANGUAGE_TO_ID:
            raise ValueError(f"Unsupported language: {language}")
        emotion = emotion if emotion is not None else list(DEFAULT_EMOTION)
        vqscore_8 = vqscore_8 if vqscore_8 is not None else [0.78] * 8

        if _phoneme_ids is not None:
            phoneme_ids = _phoneme_ids
        else:
            with tracing.phase("phonemize"):
                phonemes = phonemize([text], [language])
                phoneme_ids, _ = tokenize_phonemes(phonemes)

        cond: dict[str, Any] = {
            "espeak": jnp.asarray(phoneme_ids, jnp.int32),
            "speaker": speaker,
            "emotion": emotion,
            "fmax": fmax,
            "pitch_std": pitch_std,
            "speaking_rate": speaking_rate,
            "language_id": _LANGUAGE_TO_ID[language],
            "vqscore_8": vqscore_8,
            "ctc_loss": ctc_loss,
            "dnsmos_ovrl": dnsmos_ovrl,
            "speaker_noised": int(speaker_noised),
        }
        for k in unconditional_keys:
            cond.pop(k, None)

        out = {}
        present = {s.name for s in self.model.prefix_conditioner.specs}
        for k, v in cond.items():
            if v is None:
                continue
            if k == "espeak":
                out[k] = v  # int32 phoneme ids, consumed by the embedder
            elif k in present:
                arr = jnp.asarray(v, jnp.float32).reshape(1, 1, -1)
                if k == "emotion":
                    arr = arr / arr.sum(axis=-1, keepdims=True)
                out[k] = arr
        return out

    def make_batch_cond_dict(
        self,
        texts: list[str],
        languages: list[str] | str = "en-us",
        speaker: jnp.ndarray | None = None,
        **kwargs,
    ) -> dict:
        """Batched, heterogeneous-length conditioning (BASELINE config 4:
        multilingual batch). Phoneme sequences are LEFT-padded to the batch
        max (reference tokenize_phonemes semantics, conditioning.py:163-168);
        per-utterance scalars broadcast or stack along batch."""
        if isinstance(languages, str):
            languages = [languages] * len(texts)
        if len(texts) != len(languages):
            raise ValueError("texts and languages length mismatch")
        languages = [lang.lower() for lang in languages]
        for lang in languages:
            if lang not in _LANGUAGE_TO_ID:
                raise ValueError(f"Unsupported language: {lang}")
        phonemes = phonemize(texts, languages)
        phoneme_ids, _ = tokenize_phonemes(phonemes)
        base = self.make_cond_dict(
            text=texts[0], language=languages[0], speaker=speaker,
            _phoneme_ids=[phoneme_ids[0]], **kwargs
        )
        base["espeak"] = jnp.asarray(phoneme_ids, jnp.int32)
        if "language_id" in base:
            ids = jnp.asarray(
                [[[_LANGUAGE_TO_ID[lang]]] for lang in languages], jnp.float32
            )
            base["language_id"] = ids  # [B, 1, 1]
        return base

    def quantize_int8(self) -> "ZonosPipeline":
        """Switch the backbone projections to int8 weight-only storage
        (ops/quant): halves the HBM weight traffic that bounds single-stream
        decode. Embeddings/heads/conditioners/DAC stay bf16. Returns self."""
        from .ops.quant import quantize_zonos_params

        self.params = quantize_zonos_params(self.params)
        return self

    def quantize_int4(self, mixed: bool = True) -> "ZonosPipeline":
        """int4 phase 3 (experimental): backbone MLP weights as s4 (packed
        two-per-byte in HBM; the MLP is ~83% of layer weight bytes).
        ``mixed=True`` keeps attention/Mamba projections and heads at int8;
        ``mixed=False`` stores every backbone projection at int4. int4's
        ~14% per-weight noise is audible territory on a real checkpoint —
        this is a bandwidth/quality dial, not the default."""
        from .ops.quant import quantize_zonos_params

        self.params = quantize_zonos_params(
            self.params, bits=8 if mixed else 4, mlp_bits=4)
        return self

    def speaker_shape(self) -> tuple:
        """Shape of a speaker embedding cond entry ``[1, 1, cond_dim]``
        (128 for the shipped checkpoints, model.py:95) — used by server
        warmup to build dummy conditioning with the right key set."""
        for s in self.model.prefix_conditioner.specs:
            if s.name == "speaker":
                return (1, 1, s.cond_dim)
        raise ValueError("model has no speaker conditioner")

    @staticmethod
    def merge_cond_dicts(conds: list[dict], pad_len: int | None = None) -> dict:
        """Merge per-request cond dicts (each batch 1) into one batched dict
        for server-side batching. All dicts must share the same key set
        (group requests by unconditional-key pattern first). Phoneme ids are
        LEFT-padded (reference conditioning.py:167 semantics) to the longest
        row, optionally rounded up to ``pad_len`` (compile-cache bucketing).
        """
        keys = set(conds[0])
        for c in conds[1:]:
            if set(c) != keys:
                raise ValueError("cond dicts have mismatched keys")
        out = {}
        ph = [np.asarray(c["espeak"]) for c in conds]
        longest = max(p.shape[1] for p in ph)
        if pad_len is not None:
            longest = max(longest, pad_len)
        rows = [np.pad(p[0], (longest - p.shape[1], 0)) for p in ph]
        out["espeak"] = jnp.asarray(np.stack(rows), jnp.int32)
        for k in keys - {"espeak"}:
            out[k] = jnp.concatenate([jnp.asarray(c[k]) for c in conds], axis=0)
        return out

    def prepare_conditioning(self, cond_dict: dict, uncond_dict: dict | None = None):
        return self._prepare_jit(self.params, cond_dict, uncond_dict)

    # -- generation ---------------------------------------------------------

    def generate(
        self,
        cond_dict: dict,
        audio_prefix_codes: jnp.ndarray | None = None,
        *,
        key: jax.Array,
        max_new_tokens: int = 86 * 30,
        cfg_scale: float = 2.0,
        sampling_params: SamplingParams | dict | None = None,
        disable_eos: bool = False,
        callback=None,  # (frames_done, step, max_steps) -> bool; False aborts
        callback_interval: int = 43,
    ) -> GenerateResult:
        """Generate DAC codes. ``callback`` mirrors the reference's abort
        hook (model.py:229,306-307) without per-step host sync: it fires
        every ``callback_interval`` decode steps between compiled segments;
        returning False stops generation and returns what exists so far."""
        with tracing.phase("conditioning"):
            prefix = self.prepare_conditioning(cond_dict)
        with tracing.phase("generate"):
            if callback is None:
                result = self.engine.generate(
                    self.params, prefix, audio_prefix_codes,
                    key=key, max_new_tokens=max_new_tokens,
                    cfg_scale=cfg_scale, sampling_params=sampling_params,
                    disable_eos=disable_eos,
                )
            else:
                result = None
                step = 0
                for result in self.engine.generate_stream(
                    self.params, prefix, audio_prefix_codes,
                    key=key, max_new_tokens=max_new_tokens,
                    cfg_scale=cfg_scale, sampling_params=sampling_params,
                    disable_eos=disable_eos, chunk_steps=callback_interval,
                ):
                    step = min(step + callback_interval, max_new_tokens)
                    if callback(int(result.valid_length), step,
                                max_new_tokens) is False:
                        break
            jax.block_until_ready(result.codes)
        tracing.add_counter(
            "audio_seconds", float(result.valid_length) / 86.1328
        )
        return result

    def generate_stream(
        self,
        cond_dict: dict,
        audio_prefix_codes: jnp.ndarray | None = None,
        *,
        key: jax.Array,
        max_new_tokens: int = 86 * 30,
        cfg_scale: float = 2.0,
        sampling_params: SamplingParams | dict | None = None,
        chunk_frames: int = 43,  # ~0.5 s of audio per yield
        margin_frames: int = 32,
    ):
        """Streaming synthesis: yields ``[B, samples]`` float32 waveform
        chunks as decoding progresses; the concatenation equals the
        one-shot :meth:`generate` + :meth:`decode_audio` output for the
        same key (codes are identical — engine test_streaming — and each
        emitted span is vocoded with ``margin_frames`` of code context on
        BOTH sides, then trimmed, so conv edge effects never reach emitted
        samples).

        The DAC decoder is non-causal (symmetric conv padding; half
        receptive field ≈9 code frames for the 44 kHz topology, larger for
        coarser test configs), so the last ``margin_frames`` decoded
        frames are withheld until more context arrives; the final chunk
        flushes them against the true sequence end. ``margin_frames`` must
        exceed the decoder's half receptive field in code frames for
        exactness.
        """
        if self.dac_params is None:
            raise RuntimeError("DAC params not loaded")
        prefix = self.prepare_conditioning(cond_dict)
        hop = self.dac.hop
        emitted = 0  # frames whose samples have been yielded

        def vocode_span(codes_all, start, end, avail):
            # Decode [start-m, min(avail, end+m)) and trim both contexts:
            # every emitted sample sits >= margin from a synthetic edge
            # (window edges coinciding with the true sequence edge are the
            # same edges the one-shot decode has).
            c0 = max(0, start - margin_frames)
            c1 = min(avail, end + margin_frames)
            # Quantize the window length to 8-frame steps by extending the
            # LEFT context (always correctness-neutral): bounds the number
            # of distinct compiled vocoder shapes per stream to ~W/8
            # instead of one per ragged final chunk.
            c0 = max(0, c1 - (-(c0 - c1) + 7) // 8 * 8)
            wav = self._decode_jit(self.dac_params, codes_all[:, :, c0:c1])
            wav = np.asarray(wav[:, 0, :], np.float32)
            off = (start - c0) * hop
            return wav[:, off: off + (end - start) * hop]

        last = None
        for res in self.engine.generate_stream(
            self.params, prefix, audio_prefix_codes, key=key,
            max_new_tokens=max_new_tokens, cfg_scale=cfg_scale,
            sampling_params=sampling_params, chunk_steps=chunk_frames,
        ):
            last = res
            valid = int(res.valid_length)
            stable = max(0, valid - margin_frames)  # right margin withheld
            if stable > emitted:
                yield vocode_span(res.codes, emitted, stable, valid)
                emitted = stable
        if last is not None:
            valid = int(last.valid_length)
            if valid > emitted:
                yield vocode_span(last.codes, emitted, valid, valid)

    # -- audio codec --------------------------------------------------------

    def decode_audio(self, result: GenerateResult | jnp.ndarray) -> np.ndarray:
        """codes -> ``[B, samples]`` float32 waveform at 44.1 kHz."""
        if self.dac_params is None:
            raise RuntimeError("DAC params not loaded")
        codes = result.codes if isinstance(result, GenerateResult) else result
        with tracing.phase("vocode"):
            wav = self._decode_jit(self.dac_params, codes)
        wav = np.asarray(wav[:, 0, :], np.float32)
        if isinstance(result, GenerateResult):
            wav = wav[:, : int(result.valid_length) * self.dac.hop]
        return wav

    def encode_audio(self, wav, sr: int) -> jnp.ndarray:
        """Audio-prefix path (gradio_interface.py:153-159): mono mix ->
        preprocess -> encode -> ``[1, 9, T']`` codes."""
        if self.dac_params is None:
            raise RuntimeError("DAC params not loaded")
        wav = jnp.asarray(wav, jnp.float32)
        if wav.ndim == 2:
            wav = wav.mean(axis=0)
        wav = self.dac.preprocess(wav[None, :], sr)
        return self._encode_jit(self.dac_params, wav[:, None, :])
