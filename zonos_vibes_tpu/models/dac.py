"""DAC audio codec (descript/dac_44khz) — native JAX implementation.

The reference wraps HF ``transformers.models.dac.DacModel``
(zonos/autoencoder.py:11-27) and never implements the network itself; the
TPU build provides the full codec natively (SURVEY.md §2.9 N7):

* **Encoder**: Conv1d(1->64, k7) -> 4 blocks (3 dilated residual units
  [dilation 1/3/9, k7 + k1 pointwise, Snake activations] + Snake + strided
  downsampling conv k=2s) doubling channels per block (strides 2,4,8,8) ->
  Snake -> Conv1d(1024->1024, k3). Hop = 512 => 86.13 Hz frame rate.
* **RVQ**: 9 residual stages; each stage: 1x1 in_proj (1024->8), nearest
  neighbour in l2-normalized 8-d space (ViT-VQGAN factorized codes) against
  a 1024x8 codebook, 1x1 out_proj (8->1024).
* **Decoder**: Conv1d(1024->1536, k7) -> 4 blocks (Snake -> ConvTranspose1d
  k=2s stride s halving channels, strides 8,8,4,2 -> 3 dilated residual
  units) -> Snake -> Conv1d(96->1, k7) -> tanh.

TPU-first engineering: channels-last ``[B, T, C]`` layout throughout (lane
dim = channels maps onto the VPU/MXU cleanly), transposed convs expressed as
input-dilated convolutions (XLA lowers these well on TPU; a dedicated Pallas
kernel is the further optimization target named in BASELINE.json), Snake
fused by XLA into neighbouring convs. Weight-normalized torch convs are
materialized to plain weights at conversion time (utils/checkpoint.py).

Snake activation: ``x + (1/(alpha + 1e-9)) * sin(alpha * x)^2`` with a
learned per-channel alpha.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class DACConfig:
    encoder_hidden_size: int = 64
    downsampling_ratios: tuple = (2, 4, 8, 8)
    decoder_hidden_size: int = 1536
    n_codebooks: int = 9
    codebook_size: int = 1024
    codebook_dim: int = 8
    sampling_rate: int = 44100

    @property
    def upsampling_ratios(self) -> tuple:
        return tuple(reversed(self.downsampling_ratios))

    @property
    def hidden_size(self) -> int:
        return self.encoder_hidden_size * (2 ** len(self.downsampling_ratios))

    @property
    def hop_length(self) -> int:
        n = 1
        for r in self.downsampling_ratios:
            n *= r
        return n


# ---------------------------------------------------------------------------
# Functional building blocks. Conv weights are [k, Cin, Cout]; bias [Cout].
# ---------------------------------------------------------------------------

_DN = ("NWC", "WIO", "NWC")


def snake(x: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Snake1d: periodic activation; alpha is per-channel ``[C]``."""
    a = alpha[None, None, :]
    return x + jnp.square(jnp.sin(a * x)) / (a + 1e-9)


def conv1d(x, w, b, stride: int = 1, padding: int = 0, dilation: int = 1):
    y = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=_DN,
    )
    return y + b[None, None, :]


def conv_transpose1d(x, w, b, stride: int, padding: int):
    """torch ConvTranspose1d semantics. ``w`` is stored pre-flipped as a
    plain conv kernel ``[k, Cin, Cout]`` (converter flips torch's
    ``[Cin, Cout, k]``).

    Fast path (the DAC decoder case: even stride s, k = 2s, pad = s/2):
    every output sample mixes exactly TWO input frames, so the transposed
    conv is two dense matmuls — ``[T, 2Cin] @ [2Cin, (s/2)·Cout]`` for the
    low phases on (x[q-1], x[q]) and the high phases on (x[q], x[q+1]) —
    which XLA maps straight onto the MXU (input-dilated convs don't tile
    nearly as well; this is the "DAC conv-transpose at speed-of-light"
    reformulation, BASELINE.md). Exact same math; parity-tested against
    torch in tests/test_dac.py.
    """
    k = w.shape[0]
    if stride % 2 == 0 and k == 2 * stride and padding == stride // 2:
        return _conv_transpose1d_matmul(x, w, b, stride)
    y = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(1,),
        padding=[(k - 1 - padding, k - 1 - padding)],
        lhs_dilation=(stride,),
        dimension_numbers=_DN,
    )
    return y + b[None, None, :]


def _conv_transpose1d_matmul(x, w, b, s: int):
    """ConvTranspose1d(k=2s, stride=s, pad=s/2) as two phase matmuls.

    With torch kernel ``Wt[j] = w[k-1-j]`` and output position
    ``t_o = q*s + r``:
      r <  s/2: out = x[q-1] @ Wt[r + 3s/2] + x[q] @ Wt[r + s/2]
      r >= s/2: out = x[q]   @ Wt[r +  s/2] + x[q+1] @ Wt[r - s/2]
    (out-of-range neighbours are zero). The Wt slices are gathered at trace
    time into two ``[2Cin, (s/2)*Cout]`` matrices — constant-folded per
    compile.
    """
    B, T, Cin = x.shape
    k = 2 * s
    Cout = w.shape[2]
    half = s // 2
    wt = w[::-1]  # un-flip: wt[j] == torch W[:, :, j], shape [k, Cin, Cout]

    # Low phases r in [0, s/2): taps (x[q-1], x[q]) with Wt[r+3s/2], Wt[r+s/2]
    w_lo = jnp.concatenate(
        [wt[3 * half : 3 * half + half], wt[half : 2 * half]], axis=1
    )  # [s/2, 2Cin, Cout]
    # High phases r in [s/2, s): taps (x[q], x[q+1]) with Wt[r+s/2], Wt[r-s/2]
    w_hi = jnp.concatenate(
        [wt[2 * half : 3 * half], wt[:half]], axis=1
    )  # [s/2, 2Cin, Cout]
    w_lo = jnp.swapaxes(w_lo, 0, 1).reshape(2 * Cin, half * Cout)
    w_hi = jnp.swapaxes(w_hi, 0, 1).reshape(2 * Cin, half * Cout)

    zeros = jnp.zeros((B, 1, Cin), x.dtype)
    x_prev = jnp.concatenate([zeros, x[:, :-1]], axis=1)
    x_next = jnp.concatenate([x[:, 1:], zeros], axis=1)

    y_lo = jnp.concatenate([x_prev, x], axis=-1) @ w_lo  # [B, T, half*Cout]
    y_hi = jnp.concatenate([x, x_next], axis=-1) @ w_hi
    y = jnp.concatenate(
        [y_lo.reshape(B, T, half, Cout), y_hi.reshape(B, T, half, Cout)],
        axis=2,
    ).reshape(B, T * s, Cout)
    return y + b[None, None, :]


def _init_conv(key, k, cin, cout, dtype):
    kw, kb = jax.random.split(key)
    lim = 1.0 / jnp.sqrt(cin * k)
    return {
        "weight": jax.random.uniform(kw, (k, cin, cout), jnp.float32, -lim, lim).astype(dtype),
        "bias": jax.random.uniform(kb, (cout,), jnp.float32, -lim, lim).astype(dtype),
    }


def _init_res_unit(key, dim, dilation, dtype):
    k1, k2 = jax.random.split(key)
    return {
        "snake1": jnp.ones((dim,), dtype),
        "conv1": _init_conv(k1, 7, dim, dim, dtype),
        "snake2": jnp.ones((dim,), dtype),
        "conv2": _init_conv(k2, 1, dim, dim, dtype),
    }


def _res_unit(p, x, dilation: int):
    pad = ((7 - 1) * dilation) // 2
    y = conv1d(snake(x, p["snake1"]), p["conv1"]["weight"], p["conv1"]["bias"],
               padding=pad, dilation=dilation)
    y = conv1d(snake(y, p["snake2"]), p["conv2"]["weight"], p["conv2"]["bias"])
    return x + y


def _ceil_div(a, b):
    return -(-a // b)


class DACModel:
    """Static config wrapper; params travel as a pytree."""

    def __init__(self, config: DACConfig | None = None):
        self.config = config or DACConfig()

    # -- init ---------------------------------------------------------------

    def init(self, key: jax.Array, dtype=jnp.float32) -> dict:
        cfg = self.config
        keys = iter(jax.random.split(key, 128))
        enc_blocks = []
        for i, s in enumerate(cfg.downsampling_ratios):
            dim = cfg.encoder_hidden_size * (2 ** (i + 1))
            enc_blocks.append({
                "res1": _init_res_unit(next(keys), dim // 2, 1, dtype),
                "res2": _init_res_unit(next(keys), dim // 2, 3, dtype),
                "res3": _init_res_unit(next(keys), dim // 2, 9, dtype),
                "snake": jnp.ones((dim // 2,), dtype),
                "conv": _init_conv(next(keys), 2 * s, dim // 2, dim, dtype),
            })
        final_enc = cfg.encoder_hidden_size * (2 ** len(cfg.downsampling_ratios))
        dec_blocks = []
        for i, s in enumerate(cfg.upsampling_ratios):
            cin = cfg.decoder_hidden_size // (2 ** i)
            cout = cfg.decoder_hidden_size // (2 ** (i + 1))
            dec_blocks.append({
                "snake": jnp.ones((cin,), dtype),
                "conv_t": _init_conv(next(keys), 2 * s, cin, cout, dtype),
                "res1": _init_res_unit(next(keys), cout, 1, dtype),
                "res2": _init_res_unit(next(keys), cout, 3, dtype),
                "res3": _init_res_unit(next(keys), cout, 9, dtype),
            })
        dec_out = cfg.decoder_hidden_size // (2 ** len(cfg.upsampling_ratios))
        quantizers = []
        for _ in range(cfg.n_codebooks):
            quantizers.append({
                "in_proj": _init_conv(next(keys), 1, cfg.hidden_size, cfg.codebook_dim, dtype),
                "out_proj": _init_conv(next(keys), 1, cfg.codebook_dim, cfg.hidden_size, dtype),
                "codebook": jax.random.normal(
                    next(keys), (cfg.codebook_size, cfg.codebook_dim)
                ).astype(dtype),
            })
        return {
            "encoder": {
                "conv1": _init_conv(next(keys), 7, 1, cfg.encoder_hidden_size, dtype),
                "blocks": enc_blocks,
                "snake": jnp.ones((final_enc,), dtype),
                "conv2": _init_conv(next(keys), 3, final_enc, cfg.hidden_size, dtype),
            },
            "quantizers": quantizers,
            "decoder": {
                "conv1": _init_conv(next(keys), 7, cfg.hidden_size, cfg.decoder_hidden_size, dtype),
                "blocks": dec_blocks,
                "snake": jnp.ones((dec_out,), dtype),
                "conv2": _init_conv(next(keys), 7, dec_out, 1, dtype),
            },
        }

    # -- codec --------------------------------------------------------------

    def encoder_forward(self, params: dict, audio: jnp.ndarray) -> jnp.ndarray:
        """``[B, T, 1] -> [B, T/512, 1024]`` continuous latents."""
        cfg = self.config
        p = params["encoder"]
        x = conv1d(audio, p["conv1"]["weight"], p["conv1"]["bias"], padding=3)
        for blk, s in zip(p["blocks"], cfg.downsampling_ratios):
            x = _res_unit(blk["res1"], x, 1)
            x = _res_unit(blk["res2"], x, 3)
            x = _res_unit(blk["res3"], x, 9)
            x = snake(x, blk["snake"])
            x = conv1d(x, blk["conv"]["weight"], blk["conv"]["bias"],
                       stride=s, padding=_ceil_div(s, 2))
        x = snake(x, p["snake"])
        return conv1d(x, p["conv2"]["weight"], p["conv2"]["bias"], padding=1)

    def quantize(self, params: dict, latents: jnp.ndarray) -> jnp.ndarray:
        """RVQ encode: ``[B, T', 1024] -> [B, K, T']`` int32 codes.
        Residual nearest-neighbour in l2-normalized codebook space."""
        residual = latents
        codes = []
        for q in params["quantizers"]:
            z = conv1d(residual, q["in_proj"]["weight"], q["in_proj"]["bias"])
            zn = z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-12)
            cb = q["codebook"]
            cbn = cb / (jnp.linalg.norm(cb, axis=-1, keepdims=True) + 1e-12)
            # max of -(||z||^2 - 2 z.c) + ||c||^2 over codebook entries
            dist = (
                -(jnp.sum(zn * zn, -1, keepdims=True)
                  - 2.0 * (zn @ cbn.T))
                + jnp.sum(cbn * cbn, -1)[None, None, :]
            )
            idx = jnp.argmax(dist, axis=-1)  # [B, T']
            codes.append(idx.astype(jnp.int32))
            zq = cb[idx]  # [B, T', 8]
            residual = residual - conv1d(
                zq, q["out_proj"]["weight"], q["out_proj"]["bias"]
            )
        return jnp.stack(codes, axis=1)

    def from_codes(self, params: dict, codes: jnp.ndarray) -> jnp.ndarray:
        """``[B, K, T'] -> [B, T', 1024]`` summed quantized representation."""
        acc = 0.0
        for i, q in enumerate(params["quantizers"]):
            zq = q["codebook"][codes[:, i, :]]  # [B, T', 8]
            acc = acc + conv1d(zq, q["out_proj"]["weight"], q["out_proj"]["bias"])
        return acc

    def decoder_forward(self, params: dict, latents: jnp.ndarray) -> jnp.ndarray:
        """``[B, T', 1024] -> [B, T' * 512, 1]`` waveform in [-1, 1]."""
        cfg = self.config
        p = params["decoder"]
        x = conv1d(latents, p["conv1"]["weight"], p["conv1"]["bias"], padding=3)
        for blk, s in zip(p["blocks"], cfg.upsampling_ratios):
            x = snake(x, blk["snake"])
            x = conv_transpose1d(
                x, blk["conv_t"]["weight"], blk["conv_t"]["bias"],
                stride=s, padding=_ceil_div(s, 2),
            )
            x = _res_unit(blk["res1"], x, 1)
            x = _res_unit(blk["res2"], x, 3)
            x = _res_unit(blk["res3"], x, 9)
        x = snake(x, p["snake"])
        x = conv1d(x, p["conv2"]["weight"], p["conv2"]["bias"], padding=3)
        return jnp.tanh(x)

    # -- reference-API wrappers (autoencoder.py:17-27) ----------------------

    def encode(self, params: dict, audio: jnp.ndarray) -> jnp.ndarray:
        """``[B, 1, T] float -> [B, K, T/512]`` int codes."""
        latents = self.encoder_forward(params, jnp.swapaxes(audio, 1, 2))
        return self.quantize(params, latents)

    def decode(self, params: dict, codes: jnp.ndarray) -> jnp.ndarray:
        """``[B, K, T'] -> [B, 1, T'*512]`` float waveform."""
        latents = self.from_codes(params, codes)
        wav = self.decoder_forward(params, latents)
        return jnp.swapaxes(wav, 1, 2)
