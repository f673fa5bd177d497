"""RoPE + GQA attention parity vs independent torch references.

The torch code here is written from the math in SURVEY.md §2.2 (interleaved
pair rotation, SDPA with GQA) — it serves as an executable spec, not a copy.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from zonos_vibes_tpu.ops.attention import (
    decode_attention,
    prefill_attention,
    update_kv_cache,
)
from zonos_vibes_tpu.ops.rope import apply_rope, rope_table


def torch_rope(x: torch.Tensor, positions: torch.Tensor, base=10000.0):
    """Spec: view head_dim as interleaved (real, imag) pairs, rotate by
    angle pos * base**(-2i/d)."""
    B, S, H, D = x.shape
    freqs = 1.0 / (base ** (torch.arange(0, D, 2).float() / D))
    angles = positions.float()[..., None] * freqs  # [B, S, D/2]
    cos, sin = angles.cos()[:, :, None, :], angles.sin()[:, :, None, :]
    xf = x.float().reshape(B, S, H, D // 2, 2)
    xr, xi = xf[..., 0], xf[..., 1]
    out = torch.stack([xr * cos - xi * sin, xr * sin + xi * cos], dim=-1)
    return out.reshape(B, S, H, D)


def test_rope_matches_torch():
    rng = np.random.default_rng(0)
    B, S, H, D = 2, 7, 4, 16
    x = rng.standard_normal((B, S, H, D)).astype(np.float32)
    pos = rng.integers(0, 1000, size=(B, S)).astype(np.int32)
    table = rope_table(D, max_positions=1024)
    ours = np.asarray(apply_rope(jnp.asarray(x), jnp.asarray(pos), table))
    ref = torch_rope(torch.from_numpy(x), torch.from_numpy(pos)).numpy()
    # fp32 cos/sin of large angles (pos*freq up to ~1e3 rad) differ at the
    # ulp level between XLA and torch libm; 2e-3 abs is the honest bound.
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=2e-3)


def test_prefill_attention_matches_sdpa():
    rng = np.random.default_rng(1)
    B, S, Hq, Hkv, D, T = 2, 9, 8, 2, 16, 24
    q = rng.standard_normal((B, S, Hq, D)).astype(np.float32)
    k = rng.standard_normal((B, S, Hkv, D)).astype(np.float32)
    v = rng.standard_normal((B, S, Hkv, D)).astype(np.float32)

    kc = jnp.zeros((B, Hkv, D, T), jnp.float32)
    vc = jnp.zeros((B, Hkv, D, T), jnp.float32)
    kc, vc = update_kv_cache(kc, vc, jnp.asarray(k), jnp.asarray(v), jnp.int32(0))
    ours = np.asarray(
        prefill_attention(jnp.asarray(q), kc, vc, jnp.int32(0), S)
    )

    qt = torch.from_numpy(q).transpose(1, 2)  # [B, H, S, D]
    kt = torch.from_numpy(k).transpose(1, 2)
    vt = torch.from_numpy(v).transpose(1, 2)
    ref = F.scaled_dot_product_attention(qt, kt, vt, is_causal=True, enable_gqa=True)
    ref = ref.transpose(1, 2).numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-5)


def test_decode_attention_matches_sdpa_full_prefix():
    rng = np.random.default_rng(2)
    B, Hq, Hkv, D, T = 2, 8, 2, 16, 32
    seq_end = 20
    q = rng.standard_normal((B, 1, Hq, D)).astype(np.float32)
    kcache = rng.standard_normal((B, Hkv, D, T)).astype(np.float32)
    vcache = rng.standard_normal((B, Hkv, D, T)).astype(np.float32)

    ours = np.asarray(
        decode_attention(
            jnp.asarray(q), jnp.asarray(kcache), jnp.asarray(vcache),
            jnp.int32(seq_end),
        )
    )
    qt = torch.from_numpy(q).transpose(1, 2)
    kt = torch.from_numpy(kcache[..., :seq_end]).transpose(2, 3)  # [B,H,T,D]
    vt = torch.from_numpy(vcache[..., :seq_end]).transpose(2, 3)
    ref = F.scaled_dot_product_attention(qt, kt, vt, is_causal=False, enable_gqa=True)
    ref = ref.transpose(1, 2).numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-5)


def test_prefill_then_decode_consistency():
    """Decoding token S attends identically to prefilling S+1 tokens."""
    rng = np.random.default_rng(3)
    B, S, Hq, Hkv, D, T = 1, 6, 4, 2, 8, 16
    q = jnp.asarray(rng.standard_normal((B, S + 1, Hq, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, S + 1, Hkv, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, S + 1, Hkv, D)).astype(np.float32))

    kc = jnp.zeros((B, Hkv, D, T), jnp.float32)
    vc = jnp.zeros((B, Hkv, D, T), jnp.float32)
    kc_full, vc_full = update_kv_cache(kc, vc, k, v, jnp.int32(0))
    full = prefill_attention(q, kc_full, vc_full, jnp.int32(0), S + 1)

    kc1, vc1 = update_kv_cache(kc, vc, k[:, :S], v[:, :S], jnp.int32(0))
    kc2, vc2 = update_kv_cache(kc1, vc1, k[:, S:], v[:, S:], jnp.int32(S))
    step = decode_attention(q[:, S:], kc2, vc2, jnp.int32(S + 1))
    np.testing.assert_allclose(
        np.asarray(full[:, -1:]), np.asarray(step), rtol=1e-5, atol=1e-5
    )


def test_rope_expanded_table_bit_exact():
    """The pre-expanded [P, 2, D] table (expand_rope_table) and the raw
    [P, D/2, 2] table produce BIT-identical rotations, and the swap-matmul
    formulation matches the slice/stack spec exactly in fp32 (the swap
    matrix has one 1.0 per column — no rounding)."""
    from zonos_vibes_tpu.ops.rope import expand_rope_table

    rng = np.random.default_rng(7)
    for B, S, H, D in [(2, 1, 32, 64), (1, 5, 4, 8)]:
        x = jnp.asarray(
            rng.standard_normal((B, S, H, D)).astype(np.float32)
        ).astype(jnp.bfloat16)
        pos = jnp.asarray(rng.integers(0, 1000, (B, S)).astype(np.int32))
        table = rope_table(D, max_positions=1024)
        raw = np.asarray(apply_rope(x, pos, table)).view(np.uint16)
        exp = np.asarray(
            apply_rope(x, pos, expand_rope_table(table))
        ).view(np.uint16)
        assert np.array_equal(raw, exp)

        # Slice/stack executable spec (the pre-rewrite formulation).
        cs = table[pos]
        cos = cs[..., 0][:, :, None, :]
        sin = cs[..., 1][:, :, None, :]
        xf = x.astype(jnp.float32).reshape(B, S, H, D // 2, 2)
        xr, xi = xf[..., 0], xf[..., 1]
        spec = jnp.stack(
            [xr * cos - xi * sin, xr * sin + xi * cos], axis=-1
        ).reshape(B, S, H, D).astype(x.dtype)
        assert np.array_equal(np.asarray(spec).view(np.uint16), raw)
