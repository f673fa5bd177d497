"""Pallas flash-decode kernel vs the XLA reference (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from zonos_vibes_tpu.ops.attention import decode_attention
from zonos_vibes_tpu.ops.pallas.decode_attention import decode_attention_pallas


@pytest.mark.parametrize("seq_end", [1, 60, 128, 200])
def test_matches_xla_reference(seq_end):
    rng = np.random.default_rng(0)
    B, Hq, Hkv, D, T = 2, 8, 2, 64, 256
    q = jnp.asarray(rng.standard_normal((B, 1, Hq, D)).astype(np.float32))
    kc = jnp.asarray(rng.standard_normal((B, Hkv, D, T)).astype(np.float32))
    vc = jnp.asarray(rng.standard_normal((B, Hkv, D, T)).astype(np.float32))

    ref = decode_attention(q, kc, vc, jnp.int32(seq_end))
    out = decode_attention_pallas(
        q, kc, vc, jnp.int32(seq_end), block=128, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_bf16_inputs():
    rng = np.random.default_rng(1)
    B, Hq, Hkv, D, T = 1, 4, 4, 64, 128
    q = jnp.asarray(rng.standard_normal((B, 1, Hq, D)), jnp.bfloat16)
    kc = jnp.asarray(rng.standard_normal((B, Hkv, D, T)), jnp.bfloat16)
    vc = jnp.asarray(rng.standard_normal((B, Hkv, D, T)), jnp.bfloat16)
    ref = decode_attention(q, kc, vc, jnp.int32(77))
    out = decode_attention_pallas(q, kc, vc, jnp.int32(77), block=128,
                                  interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=3e-2, atol=3e-2,
    )


def _staged_ref(q, kc, vc, ks, vs, k_cur, v_cur, flushed_end, stage_len, layer):
    """Dense reference: splice stage window + current column into the slab.
    Stage is the flat kernel layout ``[L, B, STAGE, Hkv*D]``."""
    _, B, Hkv, D, _ = kc.shape
    slab_k, slab_v = np.array(kc[layer]), np.array(vc[layer])
    ks_r = np.asarray(ks[layer]).reshape(B, -1, Hkv, D)
    vs_r = np.asarray(vs[layer]).reshape(B, -1, Hkv, D)
    for s in range(stage_len):
        slab_k[:, :, :, flushed_end + s] = ks_r[:, s]
        slab_v[:, :, :, flushed_end + s] = vs_r[:, s]
    cur = flushed_end + stage_len
    slab_k[:, :, :, cur] = np.asarray(k_cur[..., 0])
    slab_v[:, :, :, cur] = np.asarray(v_cur[..., 0])
    return decode_attention(
        q, jnp.asarray(slab_k), jnp.asarray(slab_v), jnp.int32(cur + 1)
    )


def _rand_staged(rng, L, B, Hq, Hkv, D, T, STAGE=16):
    f = lambda *sh: jnp.asarray(rng.standard_normal(sh).astype(np.float32))
    return (
        f(B, 1, Hq, D), f(L, B, Hkv, D, T), f(L, B, Hkv, D, T),
        f(L, B, STAGE, Hkv * D), f(L, B, STAGE, Hkv * D),
        f(B, Hkv, D, 1), f(B, Hkv, D, 1),
    )


@pytest.mark.parametrize("flushed_end,stage_len", [(0, 0), (1, 0), (60, 5),
                                                   (128, 15), (200, 9)])
@pytest.mark.parametrize("layer", [0, 2])
def test_layered_matches_xla_reference(flushed_end, stage_len, layer):
    """Layer-indexed kernel (full stacked cache + time-major stage tail +
    separate current column) vs the dense slab reference."""
    from zonos_vibes_tpu.ops.pallas.decode_attention import (
        decode_attention_pallas_layered,
    )

    rng = np.random.default_rng(2)
    L, B, Hq, Hkv, D, T = 3, 2, 8, 2, 64, 256
    q, kc, vc, ks, vs, k_cur, v_cur = _rand_staged(rng, L, B, Hq, Hkv, D, T)
    ref = _staged_ref(q, kc, vc, ks, vs, k_cur, v_cur, flushed_end,
                      stage_len, layer)
    out = decode_attention_pallas_layered(
        q, kc, vc, ks, vs, k_cur, v_cur, jnp.int32(flushed_end),
        jnp.int32(stage_len), jnp.int32(layer), block=128, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_layered_single_block_unaligned_T():
    """Short serving caches (T rounded to 8, not 512) run as ONE block whose
    size equals T — the Mosaic-legal single-block case the dispatcher now
    accepts instead of falling back to the slab path."""
    from zonos_vibes_tpu.ops.pallas.decode_attention import (
        decode_attention_pallas_layered,
    )

    rng = np.random.default_rng(5)
    L, B, Hq, Hkv, D, T = 2, 3, 8, 2, 64, 176
    q, kc, vc, ks, vs, k_cur, v_cur = _rand_staged(rng, L, B, Hq, Hkv, D, T)
    flushed_end, stage_len, layer = 104, 7, 1
    ref = _staged_ref(q, kc, vc, ks, vs, k_cur, v_cur, flushed_end,
                      stage_len, layer)
    out = decode_attention_pallas_layered(
        q, kc, vc, ks, vs, k_cur, v_cur, jnp.int32(flushed_end),
        jnp.int32(stage_len), jnp.int32(layer), block=512, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_staged_fallback_matches_dense():
    """The XLA fallback in decode_attention_layered_auto (CPU path) must
    reproduce the same staged semantics, including a stage window spliced
    near the END of the cache (pad-splice-trim, no index clamping)."""
    from zonos_vibes_tpu.ops.attention import decode_attention_layered_auto

    rng = np.random.default_rng(7)
    L, B, Hq, Hkv, D, T = 2, 2, 8, 2, 64, 64
    STAGE = 16
    q, kc, vc, ks, vs, k_cur, v_cur = _rand_staged(
        rng, L, B, Hq, Hkv, D, T, STAGE=STAGE
    )
    # flushed_end near the end: full-STAGE splice would overflow T=64.
    flushed_end, stage_len, layer = 56, 4, 1
    ref = _staged_ref(q, kc, vc, ks, vs, k_cur, v_cur, flushed_end,
                      stage_len, layer)
    out = decode_attention_layered_auto(
        q, kc, vc, ks, vs, k_cur, v_cur, jnp.int32(flushed_end),
        jnp.int32(stage_len), jnp.int32(layer),
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_pooled_per_row_prefix_matches_dense():
    """Pooled kernel: every row attends to its OWN prefix length (+ its
    current token) — the continuous-batching primitive."""
    from zonos_vibes_tpu.ops.pallas.decode_attention import (
        decode_attention_pallas_pooled,
    )

    rng = np.random.default_rng(11)
    L, B, Hq, Hkv, D, T = 2, 4, 8, 2, 64, 256
    f = lambda *sh: jnp.asarray(rng.standard_normal(sh).astype(np.float32))
    q = f(B, 1, Hq, D)
    kc, vc = f(L, B, Hkv, D, T), f(L, B, Hkv, D, T)
    k_cur, v_cur = f(B, Hkv, D, 1), f(B, Hkv, D, 1)
    prefix_ends = jnp.asarray([0, 7, 130, 255], jnp.int32)
    layer = 1

    # Dense per-row reference.
    refs = []
    for b in range(B):
        pe = int(prefix_ends[b])
        slab_k = np.array(kc[layer, b]);  slab_k[:, :, pe] = np.asarray(k_cur[b, ..., 0])
        slab_v = np.array(vc[layer, b]);  slab_v[:, :, pe] = np.asarray(v_cur[b, ..., 0])
        r = decode_attention(
            q[b : b + 1], jnp.asarray(slab_k)[None], jnp.asarray(slab_v)[None],
            jnp.int32(pe + 1),
        )
        refs.append(np.asarray(r[0]))
    ref = np.stack(refs)

    out = decode_attention_pallas_pooled(
        q, kc, vc, k_cur, v_cur, prefix_ends, jnp.int32(layer),
        block=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)

    # XLA fallback agrees too.
    from zonos_vibes_tpu.ops.attention import decode_attention_pooled_auto

    out2 = decode_attention_pooled_auto(
        q, kc, vc, k_cur, v_cur, prefix_ends, jnp.int32(layer)
    )
    np.testing.assert_allclose(np.asarray(out2), ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("flushed_end,stage_len,layer",
                         [(60, 5, 0), (128, 15, 2), (200, 0, 1)])
def test_layered_q_int8_kernel_matches_exact(flushed_end, stage_len, layer):
    """int8-KV layered kernel (int8 phase 2): quantized flushed prefix +
    exact bf16 stage/current vs the dense reference running the DEQUANTIZED
    cache — the kernel's in-read dequant must match the mathematical
    dequant exactly (same numbers, only the HBM representation differs)."""
    from zonos_vibes_tpu.ops.pallas.decode_attention import (
        decode_attention_pallas_layered_q,
    )
    from zonos_vibes_tpu.ops.quant import quantize_kv

    rng = np.random.default_rng(9)
    L, B, Hq, Hkv, D, T = 3, 2, 8, 2, 64, 256
    q, kc, vc, ks, vs, k_cur, v_cur = _rand_staged(rng, L, B, Hq, Hkv, D, T)
    qk, sk = quantize_kv(kc, dh_axis=3)
    qv, sv = quantize_kv(vc, dh_axis=3)
    # Reference: dense attention over the dequantized slab.
    deq_k = (qk.astype(jnp.float32) * sk[:, :, :, None, :])
    deq_v = (qv.astype(jnp.float32) * sv[:, :, :, None, :])
    ref = _staged_ref(q, deq_k, deq_v, ks, vs, k_cur, v_cur, flushed_end,
                      stage_len, layer)
    out = decode_attention_pallas_layered_q(
        q, qk, qv, sk, sv, ks, vs, k_cur, v_cur, jnp.int32(flushed_end),
        jnp.int32(stage_len), jnp.int32(layer), block=128, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_layered_q_fallback_matches_kernel():
    """The XLA fallback of decode_attention_layered_q_auto reproduces the
    quantized-kernel semantics on CPU."""
    from zonos_vibes_tpu.ops.attention import decode_attention_layered_q_auto
    from zonos_vibes_tpu.ops.pallas.decode_attention import (
        decode_attention_pallas_layered_q,
    )
    from zonos_vibes_tpu.ops.quant import quantize_kv

    rng = np.random.default_rng(11)
    L, B, Hq, Hkv, D, T = 2, 2, 8, 2, 64, 256
    q, kc, vc, ks, vs, k_cur, v_cur = _rand_staged(rng, L, B, Hq, Hkv, D, T)
    qk, sk = quantize_kv(kc, dh_axis=3)
    qv, sv = quantize_kv(vc, dh_axis=3)
    args = (q, qk, qv, sk, sv, ks, vs, k_cur, v_cur,
            jnp.int32(100), jnp.int32(6), jnp.int32(1))
    out_fb = decode_attention_layered_q_auto(*args)
    out_kn = decode_attention_pallas_layered_q(*args, block=128,
                                               interpret=True)
    np.testing.assert_allclose(np.asarray(out_fb), np.asarray(out_kn),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("layer", [0, 1])
def test_pooled_staged_ring_matches_dense(layer):
    """Pooled ring-stage kernel: row b covers flushed prefix [0, base_b) +
    ring window [base_b, base_b+len_b) + current column, each row at its
    own phase — vs a dense per-row spliced reference."""
    from zonos_vibes_tpu.ops.pallas.decode_attention import (
        decode_attention_pallas_pooled_staged,
    )

    rng = np.random.default_rng(13)
    L, B, Hq, Hkv, D, T, STAGE = 2, 3, 8, 2, 64, 256, 16
    q, kc, vc, ks, vs, k_cur, v_cur = _rand_staged(rng, L, B, Hq, Hkv, D, T,
                                                   STAGE=STAGE)
    bases = np.asarray([40, 0, 201], np.int32)
    lens = np.asarray([5, 0, 14], np.int32)

    # Dense reference: splice each row's ring window + current column.
    slab_k, slab_v = np.array(kc[layer]), np.array(vc[layer])
    ks_r = np.asarray(ks[layer]).reshape(B, STAGE, Hkv, D)
    vs_r = np.asarray(vs[layer]).reshape(B, STAGE, Hkv, D)
    outs = []
    for b in range(B):
        for s in range(int(lens[b])):
            slab_k[b, :, :, bases[b] + s] = ks_r[b, s]
            slab_v[b, :, :, bases[b] + s] = vs_r[b, s]
        cur = int(bases[b] + lens[b])
        slab_k[b, :, :, cur] = np.asarray(k_cur[b, ..., 0])
        slab_v[b, :, :, cur] = np.asarray(v_cur[b, ..., 0])
        outs.append(decode_attention(
            q[b : b + 1], jnp.asarray(slab_k[b : b + 1]),
            jnp.asarray(slab_v[b : b + 1]), jnp.int32(cur + 1),
        ))
    ref = jnp.concatenate(outs, axis=0)

    out = decode_attention_pallas_pooled_staged(
        q, kc, vc, ks, vs, k_cur, v_cur, jnp.asarray(bases),
        jnp.asarray(lens), jnp.int32(layer), block=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_pooled_staged_fallback_matches_kernel():
    from zonos_vibes_tpu.ops.attention import (
        decode_attention_pooled_staged_auto,
    )
    from zonos_vibes_tpu.ops.pallas.decode_attention import (
        decode_attention_pallas_pooled_staged,
    )

    rng = np.random.default_rng(17)
    L, B, Hq, Hkv, D, T, STAGE = 2, 2, 8, 2, 64, 256, 16
    q, kc, vc, ks, vs, k_cur, v_cur = _rand_staged(rng, L, B, Hq, Hkv, D, T,
                                                   STAGE=STAGE)
    bases = jnp.asarray([64, 130], jnp.int32)
    lens = jnp.asarray([7, 0], jnp.int32)
    args = (q, kc, vc, ks, vs, k_cur, v_cur, bases, lens, jnp.int32(1))
    out_fb = decode_attention_pooled_staged_auto(*args)
    out_kn = decode_attention_pallas_pooled_staged(*args, block=128,
                                                   interpret=True)
    np.testing.assert_allclose(np.asarray(out_fb), np.asarray(out_kn),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("layer", [0, 1])
def test_pooled_staged_q_kernel_matches_dense(layer):
    """int8-KV pooled ring-stage kernel: quantized flushed prefix
    [0, base_b) + exact ring window + exact current column, per-row phases —
    vs a dense per-row reference over the DEQUANTIZED slab (the kernel's
    in-read dequant + scale folding must match mathematical dequant)."""
    from zonos_vibes_tpu.ops.pallas.decode_attention import (
        decode_attention_pallas_pooled_staged_q,
    )
    from zonos_vibes_tpu.ops.quant import quantize_kv

    rng = np.random.default_rng(19)
    L, B, Hq, Hkv, D, T, STAGE = 2, 3, 8, 2, 64, 256, 16
    q, kc, vc, ks, vs, k_cur, v_cur = _rand_staged(rng, L, B, Hq, Hkv, D, T,
                                                   STAGE=STAGE)
    qk, sk = quantize_kv(kc, dh_axis=3)
    qv, sv = quantize_kv(vc, dh_axis=3)
    deq_k = qk.astype(jnp.float32) * sk[:, :, :, None, :]
    deq_v = qv.astype(jnp.float32) * sv[:, :, :, None, :]
    bases = np.asarray([40, 0, 201], np.int32)
    lens = np.asarray([5, 0, 14], np.int32)

    slab_k, slab_v = np.array(deq_k[layer]), np.array(deq_v[layer])
    ks_r = np.asarray(ks[layer]).reshape(B, STAGE, Hkv, D)
    vs_r = np.asarray(vs[layer]).reshape(B, STAGE, Hkv, D)
    outs = []
    for b in range(B):
        for s in range(int(lens[b])):
            slab_k[b, :, :, bases[b] + s] = ks_r[b, s]
            slab_v[b, :, :, bases[b] + s] = vs_r[b, s]
        cur = int(bases[b] + lens[b])
        slab_k[b, :, :, cur] = np.asarray(k_cur[b, ..., 0])
        slab_v[b, :, :, cur] = np.asarray(v_cur[b, ..., 0])
        outs.append(decode_attention(
            q[b : b + 1], jnp.asarray(slab_k[b : b + 1]),
            jnp.asarray(slab_v[b : b + 1]), jnp.int32(cur + 1),
        ))
    ref = jnp.concatenate(outs, axis=0)

    out = decode_attention_pallas_pooled_staged_q(
        q, qk, qv, sk, sv, ks, vs, k_cur, v_cur, jnp.asarray(bases),
        jnp.asarray(lens), jnp.int32(layer), block=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_pooled_staged_q_fallback_matches_kernel():
    from zonos_vibes_tpu.ops.attention import (
        decode_attention_pooled_staged_q_auto,
    )
    from zonos_vibes_tpu.ops.pallas.decode_attention import (
        decode_attention_pallas_pooled_staged_q,
    )
    from zonos_vibes_tpu.ops.quant import quantize_kv

    rng = np.random.default_rng(23)
    L, B, Hq, Hkv, D, T, STAGE = 2, 2, 8, 2, 64, 256, 16
    q, kc, vc, ks, vs, k_cur, v_cur = _rand_staged(rng, L, B, Hq, Hkv, D, T,
                                                   STAGE=STAGE)
    qk, sk = quantize_kv(kc, dh_axis=3)
    qv, sv = quantize_kv(vc, dh_axis=3)
    bases = jnp.asarray([64, 130], jnp.int32)
    lens = jnp.asarray([7, 0], jnp.int32)
    args = (q, qk, qv, sk, sv, ks, vs, k_cur, v_cur, bases, lens,
            jnp.int32(1))
    out_fb = decode_attention_pooled_staged_q_auto(*args)
    out_kn = decode_attention_pallas_pooled_staged_q(*args, block=128,
                                                     interpret=True)
    np.testing.assert_allclose(np.asarray(out_fb), np.asarray(out_kn),
                               rtol=2e-4, atol=2e-4)
