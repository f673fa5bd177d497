"""Speaker-cloning stack: ResNet293 + SimAM + ASP + LDA in JAX.

Behavioral spec: reference zonos/speaker_cloning.py:13-224,356-412 — a
speaker-verification embedder over 16 kHz log-mel features:

  wav -> mono mix -> resample 16 kHz -> log-mel (80 bins, 25 ms / 10 ms)
      -> ResNet293 (2D, SimAM blocks, depths [10, 20, 64, 3], width 64)
      -> attentive statistics pooling -> 256-d bottleneck -> LDA -> 128-d

The 128-d LDA output is what the Zonos model consumes
(model.py:90-95: ``lda_emb.unsqueeze(0).bfloat16()``).

TPU-first engineering: NHWC layout; inference-mode BatchNorm folded into the
preceding conv at conversion time (utils.checkpoint-style fold in
``convert_speaker_state_dict`` below), so blocks are conv+bias only; each
ResNet stage's homogeneous tail (all blocks after the strided one) runs as a
single ``lax.scan`` over stacked weights — ResNet293 is 97 blocks deep and
scanning keeps compile time flat.

SimAM (parameter-free attention, speaker_cloning.py:90-96):
``E_inv = d / (4 (v + lambda)) + 0.5`` with per-channel spatial variance,
sigmoid-gated.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.dsp import log_fbank, resample

_LAMBDA_P = 1e-4
_DEPTHS = (10, 20, 64, 3)


def _conv2d(x, w, stride: int = 1, padding: int = 1):
    """NHWC conv, weight ``[kh, kw, cin, cout]``."""
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _simam(x: jnp.ndarray) -> jnp.ndarray:
    """Parameter-free SimAM attention over spatial dims of NHWC."""
    n = x.shape[1] * x.shape[2] - 1
    d = jnp.square(x - x.mean(axis=(1, 2), keepdims=True))
    v = d.sum(axis=(1, 2), keepdims=True) / n
    e_inv = d / (4.0 * (v + _LAMBDA_P)) + 0.5
    return x * jax.nn.sigmoid(e_inv)


def _block(p: dict, x: jnp.ndarray, stride: int) -> jnp.ndarray:
    """SimAMBasicBlock (speaker_cloning.py:64-96), BN pre-folded."""
    out = jax.nn.relu(_conv2d(x, p["conv1"]["weight"], stride) + p["conv1"]["bias"])
    out = _conv2d(out, p["conv2"]["weight"], 1) + p["conv2"]["bias"]
    out = _simam(out)
    if "downsample" in p:
        x = _conv2d(x, p["downsample"]["weight"], stride, padding=0) + p["downsample"]["bias"]
    out = out + x
    return jax.nn.relu(out)


def _stage(p: dict, x: jnp.ndarray, stride: int) -> jnp.ndarray:
    """One ResNet stage: strided head block + scanned homogeneous tail."""
    x = _block(p["head"], x, stride)
    if "tail" not in p:
        return x

    def body(h, blk):
        return _block(blk, h, 1), None

    x, _ = jax.lax.scan(body, x, p["tail"])
    return x


class SpeakerEncoder:
    """Static wrapper; params pytree from :func:`init` or
    :func:`convert_speaker_state_dict`."""

    def __init__(self, in_planes: int = 64, embd_dim: int = 256,
                 acoustic_dim: int = 80, lda_dim: int = 128,
                 depths: tuple = _DEPTHS):
        self.in_planes = in_planes
        self.depths = depths
        self.embd_dim = embd_dim
        self.acoustic_dim = acoustic_dim
        self.lda_dim = lda_dim
        # ASP input channels: in_planes*8 * ceil(acoustic_dim/8)
        self.asp_channels = in_planes * 8 * (acoustic_dim // 8)

    # -- init (random; real weights come from the converter) ---------------

    def init(self, key: jax.Array, dtype=jnp.float32) -> dict:
        ks = iter(jax.random.split(key, 512))

        def conv(kh, kw, cin, cout, pad0=False):
            w = jax.random.normal(next(ks), (kh, kw, cin, cout)) * (
                1.0 / np.sqrt(kh * kw * cin)
            )
            return {"weight": w.astype(dtype), "bias": jnp.zeros((cout,), dtype)}

        def block(cin, cout, downsample):
            p = {"conv1": conv(3, 3, cin, cout), "conv2": conv(3, 3, cout, cout)}
            if downsample:
                p["downsample"] = conv(1, 1, cin, cout)
            return p

        def stage(cin, cout, depth, stride):
            head = block(cin, cout, downsample=(stride != 1 or cin != cout))
            tail_blocks = [block(cout, cout, False) for _ in range(depth - 1)]
            p = {"head": head}
            if tail_blocks:
                p["tail"] = jax.tree.map(
                    lambda *xs: jnp.stack(xs), *tail_blocks
                )
            return p

        ip = self.in_planes
        return {
            "conv1": conv(3, 3, 1, ip),
            "layer1": stage(ip, ip, self.depths[0], 1),
            "layer2": stage(ip, ip * 2, self.depths[1], 2),
            "layer3": stage(ip * 2, ip * 4, self.depths[2], 2),
            "layer4": stage(ip * 4, ip * 8, self.depths[3], 2),
            "asp": {
                "conv1": {
                    "weight": (jax.random.normal(next(ks), (self.asp_channels, 128))
                               * 0.02).astype(dtype),
                    "bias": jnp.zeros((128,), dtype),
                },
                "bn": {"scale": jnp.ones((128,), dtype),
                       "shift": jnp.zeros((128,), dtype)},
                "conv2": {
                    "weight": (jax.random.normal(next(ks), (128, self.asp_channels))
                               * 0.02).astype(dtype),
                    "bias": jnp.zeros((self.asp_channels,), dtype),
                },
            },
            "bottleneck": {
                "weight": (jax.random.normal(
                    next(ks), (2 * self.asp_channels, self.embd_dim)) * 0.01
                ).astype(dtype),
                "bias": jnp.zeros((self.embd_dim,), dtype),
            },
            "lda": {
                "weight": (jax.random.normal(
                    next(ks), (self.embd_dim, self.lda_dim)) * 0.01
                ).astype(jnp.float32),
                "bias": jnp.zeros((self.lda_dim,), jnp.float32),
            },
        }

    # -- forward ------------------------------------------------------------

    def resnet_forward(self, params: dict, mel: jnp.ndarray) -> jnp.ndarray:
        """``[B, 80, T] -> [B, C, T']`` flattened freq-channel features."""
        # NHWC with H=freq(80), W=time (torch runs NCHW [B, 1, 80, T]).
        x = mel[:, :, :, None]  # [B, 80, T, 1]
        x = jax.nn.relu(_conv2d(x, params["conv1"]["weight"]) + params["conv1"]["bias"])
        x = _stage(params["layer1"], x, 1)
        x = _stage(params["layer2"], x, 2)
        x = _stage(params["layer3"], x, 2)
        x = _stage(params["layer4"], x, 2)
        # x: [B, F'=10, T', 512] -> flatten (C * F') matching torch's
        # reshape(B, C*F', T') where torch layout is [B, C, F', T'].
        B, Fr, T, C = x.shape
        x = x.transpose(0, 3, 1, 2).reshape(B, C * Fr, T)
        return x

    def asp_forward(self, params: dict, x: jnp.ndarray) -> jnp.ndarray:
        """Attentive statistics pooling (speaker_cloning.py:38-61):
        ``[B, C, T] -> [B, 2C]``."""
        p = params["asp"]
        h = jnp.einsum("bct,cd->bdt", x, p["conv1"]["weight"]) + p["conv1"]["bias"][None, :, None]
        h = jax.nn.relu(h)
        h = h * p["bn"]["scale"][None, :, None] + p["bn"]["shift"][None, :, None]
        h = jnp.einsum("bdt,dc->bct", h, p["conv2"]["weight"]) + p["conv2"]["bias"][None, :, None]
        w = jax.nn.softmax(h, axis=-1)
        mu = jnp.sum(x * w, axis=-1)
        sg = jnp.sqrt(jnp.maximum(jnp.sum(jnp.square(x) * w, axis=-1) - jnp.square(mu), 1e-5))
        return jnp.concatenate([mu, sg], axis=1)

    def embed(self, params: dict, mel: jnp.ndarray) -> jnp.ndarray:
        """``[B, 80, T] -> [B, 256]`` speaker embedding."""
        x = self.resnet_forward(params, mel)
        x = self.asp_forward(params, x)
        return x @ params["bottleneck"]["weight"] + params["bottleneck"]["bias"]

    def embed_with_lda(self, params: dict, mel: jnp.ndarray):
        """``[B, 80, T] mel -> (emb_256, lda_128)`` (LDA in fp32,
        speaker_cloning.py:405-412). Jitted per mel length — the ~100-block
        ResNet runs as one compiled program, not op-by-op dispatches
        (compiles once per distinct reference-audio length; embeddings are
        cached by path in the server anyway)."""
        if not hasattr(self, "_embed_jit"):
            def _run(p, m):
                emb = self.embed(p, m).astype(jnp.float32)
                lda = emb @ p["lda"]["weight"] + p["lda"]["bias"]
                return emb, lda

            self._embed_jit = jax.jit(_run)
        return self._embed_jit(params, mel)

    def __call__(self, params: dict, wav: jnp.ndarray, sample_rate: int):
        """Full path (speaker_cloning.py:376-412): ``wav [C, T] or [T]`` ->
        ``(emb_256, lda_128)``; the model consumes the 128-d LDA output.

        Preprocessing (mono mix -> 16 kHz resample -> log-mel) runs through
        the native C++ DSP library when built (frontend/native_dsp.py),
        else the JAX DSP path.
        """
        from ..frontend import native_dsp

        wav = jnp.asarray(wav, jnp.float32)
        if wav.ndim == 2:
            wav = wav.mean(axis=0)
        # The mel frontend reflect-pads n_fft/2 = 256 samples per side;
        # inputs shorter than that read out of bounds (native) or fail
        # (jnp.pad reflect). Clips under ~32 ms are degenerate speaker
        # references anyway — zero-pad to one full frame.
        MIN_16K = 512

        if native_dsp.available():
            import numpy as np

            mono = np.asarray(wav, np.float32)
            wav16 = native_dsp.resample(mono, sample_rate, 16_000)
            if wav16.shape[-1] < MIN_16K:
                wav16 = np.pad(wav16, (0, MIN_16K - wav16.shape[-1]))
            mel = jnp.asarray(native_dsp.log_mel_16k(wav16))[None]
        else:
            wav16 = resample(wav[None, :], sample_rate, 16_000)
            if wav16.shape[-1] < MIN_16K:
                wav16 = jnp.pad(
                    wav16, ((0, 0), (0, MIN_16K - wav16.shape[-1]))
                )
            mel = log_fbank(wav16)
        return self.embed_with_lda(params, mel)


# ---------------------------------------------------------------------------
# Conversion from the reference torch checkpoints
# ---------------------------------------------------------------------------

def _fold_bn(conv_w: np.ndarray, bn: dict, eps: float = 1e-5):
    """Fold inference BatchNorm into the preceding conv.
    conv_w: torch ``[cout, cin, kh, kw]``; returns (HWIO weight, bias)."""
    gamma, beta = bn["weight"], bn["bias"]
    mean, var = bn["running_mean"], bn["running_var"]
    scale = gamma / np.sqrt(var + eps)
    w = conv_w * scale[:, None, None, None]
    b = beta - mean * scale
    return np.transpose(w, (2, 3, 1, 0)), b


def convert_speaker_state_dict(
    resnet_sd: dict, lda_sd: dict, dtype=jnp.float32, depths: tuple = _DEPTHS
) -> dict:
    """torch ``ResNet293_based`` + LDA state dicts -> params pytree."""

    def t(x):
        import torch

        if isinstance(x, torch.Tensor):
            return x.detach().to(torch.float32).cpu().numpy()
        return np.asarray(x)

    sd = {k: t(v) for k, v in resnet_sd.items()}

    def bn(base):
        return {
            "weight": sd[f"{base}.weight"], "bias": sd[f"{base}.bias"],
            "running_mean": sd[f"{base}.running_mean"],
            "running_var": sd[f"{base}.running_var"],
        }

    def folded(conv_key, bn_key):
        w, b = _fold_bn(sd[conv_key + ".weight"], bn(bn_key))
        return {"weight": jnp.asarray(w, dtype), "bias": jnp.asarray(b, dtype)}

    def block(base, has_down):
        p = {
            "conv1": folded(f"{base}.conv1", f"{base}.bn1"),
            "conv2": folded(f"{base}.conv2", f"{base}.bn2"),
        }
        if has_down:
            p["downsample"] = folded(f"{base}.downsample.0", f"{base}.downsample.1")
        return p

    def stage(idx, depth, first_has_down):
        base = f"front.layer{idx}"
        head = block(f"{base}.0", first_has_down)
        tail = [block(f"{base}.{i}", False) for i in range(1, depth)]
        p = {"head": head}
        if tail:
            p["tail"] = jax.tree.map(lambda *xs: jnp.stack(xs), *tail)
        return p

    params = {
        "conv1": folded("front.conv1", "front.bn1"),
        "layer1": stage(1, depths[0], False),
        "layer2": stage(2, depths[1], True),
        "layer3": stage(3, depths[2], True),
        "layer4": stage(4, depths[3], True),
        "asp": {
            "conv1": {
                "weight": jnp.asarray(sd["pooling.attention.0.weight"][:, :, 0].T, dtype),
                "bias": jnp.asarray(sd["pooling.attention.0.bias"], dtype),
            },
            "bn": {
                "scale": jnp.asarray(
                    sd["pooling.attention.2.weight"]
                    / np.sqrt(sd["pooling.attention.2.running_var"] + 1e-5),
                    dtype,
                ),
                "shift": jnp.asarray(
                    sd["pooling.attention.2.bias"]
                    - sd["pooling.attention.2.running_mean"]
                    * sd["pooling.attention.2.weight"]
                    / np.sqrt(sd["pooling.attention.2.running_var"] + 1e-5),
                    dtype,
                ),
            },
            "conv2": {
                "weight": jnp.asarray(sd["pooling.attention.3.weight"][:, :, 0].T, dtype),
                "bias": jnp.asarray(sd["pooling.attention.3.bias"], dtype),
            },
        },
        "bottleneck": {
            "weight": jnp.asarray(sd["bottleneck.weight"].T, dtype),
            "bias": jnp.asarray(sd["bottleneck.bias"], dtype),
        },
        "lda": {
            "weight": jnp.asarray(t(lda_sd["weight"]).T, jnp.float32),
            "bias": jnp.asarray(t(lda_sd["bias"]), jnp.float32),
        },
    }
    return params
