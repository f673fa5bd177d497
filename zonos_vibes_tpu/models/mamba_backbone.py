"""Hybrid (Mamba-2 + attention) backbone — TPU-native re-design of the
reference's mamba-ssm-based backbone (zonos/backbone/_mamba_ssm.py:9-57).

The reference builds each layer with ``mamba_ssm...create_block``: a Mamba-2
mixer everywhere except ``attn_layer_idx``, which get MHA (+ gated-MLP when
``attn_mlp_d_intermediate > 0``); blocks use fused add+RMSNorm with the
residual stream in fp32, and a final fused norm. Here the same dataflow is
expressed functionally:

  residual = hidden + residual            (fp32 when residual_in_fp32)
  hidden   = Norm(residual)
  hidden   = Mixer(hidden)                 (Mamba2 SSD or MHA)
  [if MLP]  residual = hidden + residual; hidden = Norm2(residual);
            hidden = GatedMLP(hidden)
  ...
  out = NormF(hidden + residual)

Mixers:
* **Mamba2** (ops/mamba.py): fused in_proj -> (z, xBC, dt); short causal
  depthwise conv + SiLU on xBC; SSD chunked scan (prefill) or recurrent step
  (decode) with per-head A/D and softplus dt; gated RMSNorm
  ``rmsnorm(y * silu(z))``; out_proj.
* **MHA**: GQA with mamba-style rotary (rotate-half convention, partial
  ``rotary_emb_dim``), reusing the shared KV-cache attention ops.

Layers are heterogeneous, so the stack is a Python loop (static unroll under
jit) rather than a scan; the cache pytree is a per-layer list of either
``{"conv", "ssm"}`` or ``{"k", "v"}`` states — the analogue of the
reference's ``key_value_memory_dict`` (config.py:8-25).
"""

from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp

from ..config import BackboneConfig
from ..ops.attention import (
    decode_attention_auto,
    decode_attention_pooled_auto,
    decode_attention_pooled_staged_auto,
    prefill_attention_auto,
    update_kv_cache,
)
from ..ops.pallas.mamba_step import ssd_gate_step_pallas

_PALLAS_MAMBA = os.environ.get("ZVT_PALLAS_MAMBA", "auto")


def _fused_step_eligible(s, batch: int) -> bool:
    """Fused decode-core kernel dispatch (ops/pallas/mamba_step.py).

    Default ON for BATCHED decode (pool/group rows): the SSM state is
    stored LANE-TRANSPOSED (``[B, N, H*P]``, ops/mamba.state_to_lanes) so
    the fused update→readout→gate→norm chain runs full-VPU-width (the
    earlier ``[B, H, P, N]``-native kernel was measured SLOWER —
    post-readout work landed on 1 of 128 lanes; docs/KERNELS.md). At
    batch >= 8 CFG rows the kernel runs at the state's HBM roofline
    (35.8 us/layer at 16 rows) and the pooled step dropped 11.2 -> 7.0 ms;
    at batch 2 (single-stream CFG) the same kernel LOST 14% wall
    (3.92 -> 3.37 RTF, config5 int8) — per-call overhead and lost fusion
    with neighbors dominate the tiny DMAs — so small batches keep the XLA
    chain (ssd_step_t) on the same transposed state. ngroups == 1 only
    (the flagship layout)."""
    if _PALLAS_MAMBA == "0":
        return False
    ok = (
        s.ngroups == 1
        and s.d_inner % 128 == 0
        and batch >= 8
        and jax.default_backend() == "tpu"
    )
    return ok if _PALLAS_MAMBA == "auto" else True
from ..ops.mamba import (
    _head_to_lanes,
    causal_conv1d,
    causal_conv1d_step,
    ssd_chunked,
    ssd_step_t,
    state_from_lanes,
    state_to_lanes,
)
from ..ops.mlp import swiglu_p
from ..ops.quant import proj_matmul
from ..ops.norms import rms_norm, layer_norm


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope_half(
    x: jnp.ndarray, positions: jnp.ndarray, rotary_dim: int,
    base: float = 10000.0,
) -> jnp.ndarray:
    """GPT-NeoX-style rotary (mamba-ssm MHA convention, interleaved=False)
    on the first ``rotary_dim`` features of each head."""
    if rotary_dim == 0:
        return x
    B, S, H, D = x.shape
    inv = 1.0 / (base ** (jnp.arange(0, rotary_dim, 2, jnp.float32) / rotary_dim))
    ang = positions.astype(jnp.float32)[..., None] * inv  # [B, S, rd/2]
    # rotate-half operates on (first, second) halves of the rotary slice
    cos = jnp.concatenate([jnp.cos(ang), jnp.cos(ang)], axis=-1)[:, :, None, :]
    sin = jnp.concatenate([jnp.sin(ang), jnp.sin(ang)], axis=-1)[:, :, None, :]
    xr = x[..., :rotary_dim].astype(jnp.float32)
    rotated = xr * cos + _rotate_half(xr) * sin
    return jnp.concatenate(
        [rotated.astype(x.dtype), x[..., rotary_dim:]], axis=-1
    )


class Mamba2Spec:
    """Static geometry from ``ssm_cfg`` (Mamba2 module defaults)."""

    def __init__(self, d_model: int, ssm_cfg: dict):
        self.d_model = d_model
        self.d_state = ssm_cfg.get("d_state", 128)
        self.d_conv = ssm_cfg.get("d_conv", 4)
        self.expand = ssm_cfg.get("expand", 2)
        self.headdim = ssm_cfg.get("headdim", 64)
        self.ngroups = ssm_cfg.get("ngroups", 1)
        self.chunk = ssm_cfg.get("chunk_size", 64)
        self.d_inner = self.expand * d_model
        assert self.d_inner % self.headdim == 0
        self.nheads = self.d_inner // self.headdim
        self.conv_dim = self.d_inner + 2 * self.ngroups * self.d_state
        self.d_in_proj = 2 * self.d_inner + 2 * self.ngroups * self.d_state + self.nheads


class HybridBackbone:
    supported_architectures = ["transformer", "hybrid"]

    def __init__(self, cfg: BackboneConfig):
        self.cfg = cfg
        self.ssm = Mamba2Spec(cfg.d_model, cfg.ssm_cfg_dict)
        acfg = cfg.attn_cfg_dict
        self.attn_idx = set(cfg.attn_layer_idx)
        self.num_heads = acfg.get("num_heads", 16)
        self.num_heads_kv = acfg.get("num_heads_kv", self.num_heads)
        self.head_dim = acfg.get("head_dim", cfg.d_model // self.num_heads)
        self.rotary_dim = acfg.get("rotary_emb_dim", self.head_dim // 2)
        self.mlp_dim = cfg.attn_mlp_d_intermediate
        self.d_intermediate = cfg.d_intermediate

    def _is_attn(self, i: int) -> bool:
        return i in self.attn_idx

    @property
    def _layout(self):
        """Static execution plan: ``("attn", i)`` for attention layers,
        ``("run", r, (i, ...))`` for maximal contiguous runs of MLP-less
        Mamba layers (homogeneous => scannable on the decode path; the
        unrolled 48-layer stack cost ~2 ms/step of small-op overhead with
        the XLA op chain, xprof-measured). Mamba layers WITH an MLP
        (d_intermediate > 0) run solo as ``("solo", i)``.

        ``ZVT_MAMBA_UNROLL`` (default 1) makes EVERY Mamba layer solo
        (per-layer state buffers, static unroll): with the fused
        decode-step kernel the scan's structural costs dominate — per
        layer per step the ys stacking recopies the state the kernel
        already wrote (~28 us), the stacked params cost a dynamic-slice
        (~23 us), and the scan carries ~37 us of gap (xprof, 8-slot pool).
        Unrolled per-layer buffers alias in place in the while carry:
        measured 11.23 -> 7.04 ms/step at the 8-slot int8 pool (+59%
        aggregate). ``=0`` restores the run-scanned layout (fewer live
        buffers, slower step)."""
        if not hasattr(self, "_layout_cache"):
            unroll = os.environ.get("ZVT_MAMBA_UNROLL", "1") == "1"
            elems, run, r = [], [], 0
            for i in range(self.cfg.n_layer):
                if self._is_attn(i) or self.d_intermediate > 0 or unroll:
                    if run:
                        elems.append(("run", r, tuple(run)))
                        r, run = r + 1, []
                    elems.append(("attn", i) if self._is_attn(i)
                                 else ("solo", i))
                else:
                    run.append(i)
            if run:
                elems.append(("run", r, tuple(run)))
            self._layout_cache = tuple(elems)
        return self._layout_cache

    # -- init ---------------------------------------------------------------

    def init(self, key: jax.Array, dtype=jnp.bfloat16) -> dict:
        cfg, s = self.cfg, self.ssm
        D = cfg.d_model
        layers = []
        keys = jax.random.split(key, cfg.n_layer + 1)

        def dense(k, din, dout):
            return (jax.random.normal(k, (din, dout), jnp.float32)
                    / math.sqrt(din)).astype(dtype)

        def norm_params():
            p = {"weight": jnp.ones((D,), dtype)}
            if not cfg.rms_norm:
                p["bias"] = jnp.zeros((D,), dtype)
            return p

        for i in range(cfg.n_layer):
            k = jax.random.split(keys[i], 8)
            if self._is_attn(i):
                qkv_out = (self.num_heads + 2 * self.num_heads_kv) * self.head_dim
                layer = {
                    "norm": norm_params(),
                    "in_proj": {"weight": dense(k[0], D, qkv_out)},
                    "out_proj": {"weight": dense(k[1], self.num_heads * self.head_dim, D)},
                }
                if self.mlp_dim > 0:
                    layer["norm2"] = norm_params()
                    layer["fc1"] = {"weight": dense(k[2], D, 2 * self.mlp_dim)}
                    layer["fc2"] = {"weight": dense(k[3], self.mlp_dim, D)}
            else:
                layer = {
                    "norm": norm_params(),
                    "in_proj": {"weight": dense(k[0], D, s.d_in_proj)},
                    "conv1d": {
                        "weight": (jax.random.normal(k[1], (s.d_conv, s.conv_dim))
                                   * 0.2).astype(dtype),
                        "bias": jnp.zeros((s.conv_dim,), dtype),
                    },
                    "dt_bias": jnp.zeros((s.nheads,), jnp.float32),
                    "A_log": jnp.zeros((s.nheads,), jnp.float32),
                    "D": jnp.ones((s.nheads,), jnp.float32),
                    "ssm_norm": {"weight": jnp.ones((s.d_inner,), dtype)},
                    "out_proj": {"weight": dense(k[2], s.d_inner, D)},
                }
                if self.d_intermediate > 0:
                    layer["norm2"] = norm_params()
                    layer["fc1"] = {"weight": dense(k[3], D, 2 * self.d_intermediate)}
                    layer["fc2"] = {"weight": dense(k[4], self.d_intermediate, D)}
            layers.append(layer)
        return {"layers": layers, "norm_f": {"weight": jnp.ones((D,), dtype),
                                             **({} if cfg.rms_norm else
                                                {"bias": jnp.zeros((D,), dtype)})}}

    # -- cache --------------------------------------------------------------

    def allocate_cache(self, batch: int, max_seqlen: int, dtype=jnp.bfloat16,
                       state_dtype=jnp.float32, pool_ring: bool = False):
        """Cache pytree mirroring ``_layout``: attention KV per layer (keyed
        by layer index as str), Mamba conv/SSM states STACKED per run
        ``[R, ...]`` so the decode scan carries them without per-step
        restacking (the analogue of the reference's per-layer
        ``key_value_memory_dict``, config.py:8-25).

        ``state_dtype``: SSM-state STORAGE dtype. Default fp32 matches the
        reference's mamba-ssm state. ``jnp.bfloat16`` is the batched-serving
        option: the recurrent update still computes in fp32 (upcast on read)
        but the state crosses HBM at half width — at 16 pooled rows the
        fp32 state read+write is ~4.4 ms/step, the dominant term of the
        hybrid pooled step (docs/KERNELS.md).

        SSM states are stored LANE-TRANSPOSED ``[B, d_state, d_inner]``
        (ops/mamba.state_to_lanes): the decode step's per-head scalars
        broadcast as lane vectors, the readout is a sublane reduction, and
        the fused Pallas step (ops/pallas/mamba_step.py) consumes the
        buffer with no reshape.

        ``pool_ring``: continuous-batching pools only — each attention
        layer gains a per-row time-major ring stage ``[B, STAGE, Hkv*Dh]``
        so pooled decode steps never splice the time-minor cache per row
        (the transformer pool's ring design, models/backbone.py KV_STAGE;
        engine/pool.flush_pool_rings splices once per segment)."""
        from .backbone import KV_STAGE

        s = self.ssm
        stage = min(KV_STAGE, max_seqlen)
        attn, runs, solos = {}, [], {}
        for elem in self._layout:
            if elem[0] == "attn":
                shape = (batch, self.num_heads_kv, self.head_dim, max_seqlen)
                attn[str(elem[1])] = {"k": jnp.zeros(shape, dtype),
                                      "v": jnp.zeros(shape, dtype)}
                if pool_ring:
                    attn[str(elem[1])].update({
                        "k_stage": jnp.zeros(
                            (batch, stage, self.num_heads_kv * self.head_dim),
                            dtype),
                        "v_stage": jnp.zeros(
                            (batch, stage, self.num_heads_kv * self.head_dim),
                            dtype),
                    })
            elif elem[0] == "solo":
                solos[str(elem[1])] = {
                    "conv": jnp.zeros((batch, s.d_conv - 1, s.conv_dim), dtype),
                    "ssm": jnp.zeros((batch, s.d_state, s.d_inner),
                                     state_dtype),
                }
            else:
                R = len(elem[2])
                runs.append({
                    "conv": jnp.zeros((R, batch, s.d_conv - 1, s.conv_dim), dtype),
                    "ssm": jnp.zeros((R, batch, s.d_state, s.d_inner),
                                     state_dtype),
                })
        return {"attn": attn, "runs": runs, "solo": solos}

    # -- norms --------------------------------------------------------------

    def _norm(self, p, x):
        if self.cfg.rms_norm:
            return rms_norm(x, p["weight"], self.cfg.norm_epsilon)
        return layer_norm(x, p["weight"], p.get("bias"), self.cfg.norm_epsilon)

    # -- mixers -------------------------------------------------------------

    def _decode_mix_prologue(self, lp, x, conv_cache):
        """Shared decode-step front half: in_proj → (z, xBC, dt) split →
        softplus dt → rolling depthwise conv step + SiLU → (xs, B, C)
        split. Returns ``(z, xs, Bm, Cm, dt0 [B,H] f32, A, conv_state)``."""
        s = self.ssm
        zxbcdt = proj_matmul(x, lp["in_proj"])
        z, xBC, dt = jnp.split(
            zxbcdt, [s.d_inner, 2 * s.d_inner + 2 * s.ngroups * s.d_state],
            axis=-1,
        )
        dt = jax.nn.softplus(dt.astype(jnp.float32) + lp["dt_bias"])
        A = -jnp.exp(lp["A_log"])
        xBC_t, conv_state = causal_conv1d_step(
            xBC[:, 0], lp["conv1d"]["weight"], lp["conv1d"]["bias"],
            conv_cache,
        )
        xBC_t = jax.nn.silu(xBC_t)
        xs, Bm, Cm = jnp.split(
            xBC_t, [s.d_inner, s.d_inner + s.ngroups * s.d_state], axis=-1
        )
        return z, xs, Bm, Cm, dt[:, 0], A, conv_state

    def _fused_kernel_inputs(self, lp, dt0, A):
        """Per-head → per-lane expansions the fused step kernels consume."""
        s = self.ssm
        P = s.headdim
        dt_l = _head_to_lanes(dt0, P)[:, None, :]        # [B,1,HP]
        decay_l = _head_to_lanes(jnp.exp(dt0 * A[None, :]), P)[:, None, :]
        d_l = jnp.broadcast_to(
            lp["D"][:, None], (s.nheads, P)
        ).reshape(1, s.d_inner)
        return dt_l, decay_l, d_l

    def _mamba_mixer_stacked(self, lp, x, conv_cache, ssm_all, layer):
        """Run-scan body variant: the stacked ``[R, B, N, HP]`` SSM state
        rides the scan CARRY and is updated IN PLACE at plane ``layer`` by
        the aliased layer-indexed kernel — never through scan ys (whose
        stacked buffer XLA copies into the decode while-carry every step;
        traced at ~4.3 ms/step for 16-slot flagship hybrid,
        docs/KERNELS.md round-5). Fused-eligible geometries only."""
        from ..ops.pallas.mamba_step import ssd_gate_step_layered_pallas

        z, xs, Bm, Cm, dt0, A, conv_state = self._decode_mix_prologue(
            lp, x, conv_cache
        )
        dt_l, decay_l, d_l = self._fused_kernel_inputs(lp, dt0, A)
        y_g, ssm_all = ssd_gate_step_layered_pallas(
            ssm_all, layer,
            xs[:, None, :], dt_l, decay_l,
            Bm.astype(jnp.float32)[:, :, None],
            Cm.astype(jnp.float32)[:, :, None],
            z,
            d_l,
            lp["ssm_norm"]["weight"].reshape(1, self.ssm.d_inner),
            eps=self.cfg.norm_epsilon,
        )
        out = proj_matmul(y_g, lp["out_proj"])
        return out, conv_state, ssm_all

    def _mamba_mixer(self, lp, x, cache, is_decode: bool):
        s = self.ssm
        B, S, D = x.shape
        if is_decode:
            z, xs, Bm, Cm, dt0, A, conv_state = self._decode_mix_prologue(
                lp, x, cache["conv"]
            )
            if _fused_step_eligible(s, B):
                # Fused Pallas core on the lane-transposed [B, N, H*P]
                # state: update + C·h readout + D skip + silu(z) gate +
                # gated RMSNorm in one kernel, state held in VMEM across
                # the chain (ops/pallas/mamba_step.py); the state buffer is
                # consumed in its storage layout — no reshape between
                # buffer and pallas_call. Everything in the chain is
                # lane-parallel (the readout a sublane reduction).
                dt_l, decay_l, d_l = self._fused_kernel_inputs(lp, dt0, A)
                y_g, ssm_state = ssd_gate_step_pallas(
                    cache["ssm"],
                    xs[:, None, :], dt_l, decay_l,
                    Bm.astype(jnp.float32)[:, :, None],
                    Cm.astype(jnp.float32)[:, :, None],
                    z,
                    d_l,
                    lp["ssm_norm"]["weight"].reshape(1, s.d_inner),
                    eps=self.cfg.norm_epsilon,
                )
                out = proj_matmul(y_g, lp["out_proj"])
                return out, {"conv": conv_state, "ssm": ssm_state}
            # XLA chain in the same transposed layout. State storage may be
            # bf16 (pooled serving); the recurrence itself always runs
            # fp32 — upcast on read, downcast on store.
            y, ssm_state = ssd_step_t(
                cache["ssm"], xs, dt0, A,
                Bm.reshape(B, s.ngroups, s.d_state),
                Cm.reshape(B, s.ngroups, s.d_state),
                lp["D"], s.nheads,
            )
            y = y[:, None, :]
        else:
            zxbcdt = proj_matmul(x, lp["in_proj"])
            z, xBC, dt = jnp.split(
                zxbcdt,
                [s.d_inner, 2 * s.d_inner + 2 * s.ngroups * s.d_state],
                axis=-1,
            )
            dt = jax.nn.softplus(dt.astype(jnp.float32) + lp["dt_bias"])
            A = -jnp.exp(lp["A_log"])
            xBC_c, conv_state = causal_conv1d(
                xBC, lp["conv1d"]["weight"], lp["conv1d"]["bias"], cache["conv"]
            )
            xBC_c = jax.nn.silu(xBC_c)
            xs, Bm, Cm = jnp.split(
                xBC_c, [s.d_inner, s.d_inner + s.ngroups * s.d_state], axis=-1
            )
            # The chunked scan works in the MXU-friendly [B, H, P, N]
            # convention; convert at the boundaries of the lane-transposed
            # storage layout (once per prefill — cheap).
            y, ssm_state = ssd_chunked(
                xs.reshape(B, S, s.nheads, s.headdim),
                dt,
                A,
                Bm.reshape(B, S, s.ngroups, s.d_state),
                Cm.reshape(B, S, s.ngroups, s.d_state),
                lp["D"],
                chunk=s.chunk,
                init_state=state_from_lanes(
                    cache["ssm"].astype(jnp.float32), s.nheads
                ),
            )
            ssm_state = state_to_lanes(ssm_state)
            y = y.reshape(B, S, s.d_inner)

        # Gated RMSNorm: rmsnorm(y * silu(z)) * weight (norm_before_gate=False)
        y = rms_norm(y * jax.nn.silu(z), lp["ssm_norm"]["weight"],
                     self.cfg.norm_epsilon)
        out = proj_matmul(y, lp["out_proj"])
        return out, {"conv": conv_state,
                     "ssm": ssm_state.astype(cache["ssm"].dtype)}

    def _attn_mixer(self, lp, x, cache, offset, positions, is_decode: bool,
                    row_pos=None, ring_base=None):
        B, S, D = x.shape
        Hq, Hkv, Dh = self.num_heads, self.num_heads_kv, self.head_dim
        qkv = proj_matmul(x, lp["in_proj"])
        q, k, v = jnp.split(qkv, [Hq * Dh, (Hq + Hkv) * Dh], axis=-1)
        q = q.reshape(B, S, Hq, Dh)
        k = k.reshape(B, S, Hkv, Dh)
        v = v.reshape(B, S, Hkv, Dh)
        q = apply_rope_half(q, positions, self.rotary_dim)
        k = apply_rope_half(k, positions, self.rotary_dim)
        zero = jnp.zeros((), jnp.int32)
        if row_pos is not None and ring_base is not None and "k_stage" in cache:
            # Pooled RING decode: attention covers each row's flushed
            # prefix [0, base) + ring window [base, pos) + current token;
            # the fresh column lands in the row's time-major ring slot
            # (pos - base) — the strided time-minor splice happens once per
            # segment in engine/pool.flush_pool_rings. Same kernel as the
            # transformer pool, L=1 view ([None] on a leading unit axis is
            # a bitcast, not a copy).
            cdtype = cache["k"].dtype
            k_col = k.astype(cdtype).transpose(0, 2, 3, 1)  # [B,Hkv,Dh,1]
            v_col = v.astype(cdtype).transpose(0, 2, 3, 1)
            ring_len = row_pos - ring_base
            y = decode_attention_pooled_staged_auto(
                q, cache["k"][None], cache["v"][None],
                cache["k_stage"][None], cache["v_stage"][None],
                k_col, v_col, ring_base, ring_len, jnp.int32(0),
            )
            from ..ops.pallas.stage_write import stage_splice_rows_auto

            cols_k = k_col.transpose(0, 3, 1, 2).reshape(B, 1, Hkv * Dh)
            cols_v = v_col.transpose(0, 3, 1, 2).reshape(B, 1, Hkv * Dh)
            # [None] leading unit axis is a bitcast: reuse the [L, ...]
            # aliased splice kernel for the hybrid's per-layer stages.
            nks = stage_splice_rows_auto(
                cache["k_stage"][None], cols_k[None], ring_len
            )[0]
            nvs = stage_splice_rows_auto(
                cache["v_stage"][None], cols_v[None], ring_len
            )[0]
            out = proj_matmul(y.reshape(B, S, Hq * Dh), lp["out_proj"])
            return out, {**cache, "k_stage": nks, "v_stage": nvs}
        if row_pos is not None:
            # Pooled decode without a ring stage (compat path): per-row
            # attention bounds and per-row time-minor column writes.
            cdtype = cache["k"].dtype
            k_col = k.astype(cdtype).transpose(0, 2, 3, 1)  # [B,Hkv,Dh,1]
            v_col = v.astype(cdtype).transpose(0, 2, 3, 1)
            y = decode_attention_pooled_auto(
                q, cache["k"][None], cache["v"][None], k_col, v_col,
                row_pos, jnp.int32(0),
            )
            nk, nv = cache["k"], cache["v"]
            for b in range(B):
                idx = (jnp.int32(b), zero, zero, row_pos[b])
                nk = jax.lax.dynamic_update_slice(nk, k_col[b : b + 1], idx)
                nv = jax.lax.dynamic_update_slice(nv, v_col[b : b + 1], idx)
            out = proj_matmul(y.reshape(B, S, Hq * Dh), lp["out_proj"])
            return out, {**cache, "k": nk, "v": nv}
        k_cache, v_cache = update_kv_cache(cache["k"], cache["v"], k, v, offset)
        if is_decode:
            y = decode_attention_auto(q, k_cache, v_cache, offset + S)
        else:
            y = prefill_attention_auto(q, k_cache, v_cache, offset, S)
        out = proj_matmul(y.reshape(B, S, Hq * Dh), lp["out_proj"])
        return out, {**cache, "k": k_cache, "v": v_cache}

    # -- forward ------------------------------------------------------------

    def forward(
        self,
        params: dict,
        hidden: jnp.ndarray,
        cache: dict,
        offset: jnp.ndarray,
        lengths_per_sample: jnp.ndarray,
        rope=None,  # unused (per-layer rotary); kept for interface parity
        pooled: bool = False,
        pool_base=None,
    ):
        """``pooled``: continuous-batching decode — every row at its OWN
        cache position (``lengths_per_sample``). Mamba conv/SSM recurrent
        state is position-independent, so only the attention layers need
        per-row bounds and writes; the SSM stream is already per-row.
        ``pool_base``: pooled RING mode — [B] per-row flushed watermarks
        (requires a ``pool_ring`` cache); fresh attention columns land in
        per-row ring slots, spliced once per segment by the caller."""
        cfg = self.cfg
        B, S, D = hidden.shape
        positions = (
            jnp.arange(S, dtype=jnp.int32)[None, :]
            + lengths_per_sample.astype(jnp.int32)[:, None]
        )
        is_decode = S == 1
        row_pos = (
            lengths_per_sample.astype(jnp.int32)
            if (pooled and is_decode) else None
        )
        ring_base = (
            jnp.asarray(pool_base, jnp.int32)
            if (pool_base is not None and row_pos is not None) else None
        )
        rdtype = jnp.float32 if cfg.residual_in_fp32 else hidden.dtype
        residual = jnp.zeros_like(hidden, rdtype)  # x + 0 == x

        def layer_prologue(lp, hidden, residual):
            residual = hidden.astype(rdtype) + residual
            normed = self._norm(lp["norm"], residual.astype(hidden.dtype))
            return normed, residual

        new_attn, new_runs, new_solo = {}, [], {}
        layers = params["layers"]
        for elem in self._layout:
            if elem[0] == "attn":
                i = elem[1]
                lp = layers[i]
                normed, residual = layer_prologue(lp, hidden, residual)
                hidden, c = self._attn_mixer(
                    lp, normed, cache["attn"][str(i)], offset, positions,
                    is_decode, row_pos=row_pos, ring_base=ring_base,
                )
                if "fc1" in lp:
                    residual = hidden.astype(rdtype) + residual
                    normed = self._norm(
                        lp["norm2"], residual.astype(hidden.dtype)
                    )
                    hidden = swiglu_p(normed, lp["fc1"], lp["fc2"])
                new_attn[str(i)] = c
            elif elem[0] == "solo":
                i = elem[1]
                lp = layers[i]
                normed, residual = layer_prologue(lp, hidden, residual)
                hidden, c = self._mamba_mixer(
                    lp, normed, cache["solo"][str(i)], is_decode
                )
                if "fc1" in lp:
                    residual = hidden.astype(rdtype) + residual
                    normed = self._norm(
                        lp["norm2"], residual.astype(hidden.dtype)
                    )
                    hidden = swiglu_p(normed, lp["fc1"], lp["fc2"])
                new_solo[str(i)] = c
            else:
                _, r, idxs = elem
                run_cache = cache["runs"][r]
                if is_decode:
                    # Homogeneous Mamba run as ONE scanned block: stacked
                    # layer params (jnp.stack of the per-layer leaves —
                    # loop-invariant, so XLA hoists the stacking out of the
                    # decode while-loop; costs one stacked copy of the run
                    # weights in HBM). Replaces ~20 ops/layer of unrolled
                    # small-op overhead (~2 ms/step at flagship scale,
                    # xprof).
                    stacked = jax.tree.map(
                        lambda *xs: jnp.stack(xs), *[layers[i] for i in idxs]
                    )
                    B_rows = hidden.shape[0]
                    if _fused_step_eligible(self.ssm, B_rows):
                        # Stacked SSM state rides the scan CARRY and is
                        # updated IN PLACE by the aliased layer-indexed
                        # kernel. Emitting new states as scan ys instead
                        # makes XLA copy the whole stacked buffer into
                        # the decode while-carry every step — traced at
                        # ~4.3 ms/step (16-slot flagship hybrid,
                        # docs/KERNELS.md round-5). Conv states stay on
                        # xs/ys (×42 they are ~90 MB total — the copy is
                        # ~0.2 ms — vs 1.4 GB of SSM state).
                        def body(carry, xs):
                            h, res, ssm_all, l = carry
                            lp, conv = xs
                            normed, res = layer_prologue(lp, h, res)
                            mixed, conv_new, ssm_all = \
                                self._mamba_mixer_stacked(
                                    lp, normed, conv, ssm_all, l
                                )
                            return (mixed, res, ssm_all, l + 1), conv_new

                        (hidden, residual, ns, _), nc = jax.lax.scan(
                            body,
                            (hidden, residual, run_cache["ssm"],
                             jnp.int32(0)),
                            (stacked, run_cache["conv"]),
                        )
                        new_runs.append({"conv": nc, "ssm": ns})
                    else:
                        def body(carry, xs):
                            h, res = carry
                            lp, conv, ssm = xs
                            normed, res = layer_prologue(lp, h, res)
                            mixed, c = self._mamba_mixer(
                                lp, normed, {"conv": conv, "ssm": ssm}, True
                            )
                            return (mixed, res), (c["conv"], c["ssm"])

                        (hidden, residual), (nc, ns) = jax.lax.scan(
                            body, (hidden, residual),
                            (stacked, run_cache["conv"], run_cache["ssm"]),
                        )
                        new_runs.append({"conv": nc, "ssm": ns})
                else:
                    # Prefill runs once — unrolled, stacking states at the
                    # end of the run.
                    convs, ssms = [], []
                    for j, i in enumerate(idxs):
                        lp = layers[i]
                        normed, residual = layer_prologue(lp, hidden, residual)
                        hidden, c = self._mamba_mixer(
                            lp, normed,
                            {"conv": run_cache["conv"][j],
                             "ssm": run_cache["ssm"][j]},
                            False,
                        )
                        convs.append(c["conv"])
                        ssms.append(c["ssm"])
                    new_runs.append({"conv": jnp.stack(convs),
                                     "ssm": jnp.stack(ssms)})
        residual = hidden.astype(rdtype) + residual
        out = self._norm(params["norm_f"], residual.astype(hidden.dtype))
        return out, {"attn": new_attn, "runs": new_runs, "solo": new_solo}
