"""Sampling suite tests: filter transforms vs independent torch references,
distributional checks for the Gumbel multinomial."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from zonos_vibes_tpu.ops.sampling import (
    SamplingParams,
    apply_min_p,
    apply_repetition_penalty,
    apply_top_k,
    apply_top_p,
    apply_unified,
    gumbel_multinomial,
    sample_from_logits,
)


def _rand_probs(shape, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.random(shape).astype(np.float32) + 1e-3
    return x / x.sum(-1, keepdims=True)


def test_top_k():
    probs = _rand_probs((2, 3, 50))
    ours = np.asarray(apply_top_k(jnp.asarray(probs), 5))
    t = torch.from_numpy(probs)
    pivot = torch.topk(t, 5)[0][..., -1:]
    ref = torch.where(t < pivot, torch.zeros(()), t)
    ref = (ref / ref.sum(-1, keepdim=True)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-7)


def test_top_p():
    probs = _rand_probs((2, 3, 50), seed=1)
    p = 0.7
    ours = np.asarray(apply_top_p(jnp.asarray(probs), p))
    t = torch.from_numpy(probs)
    sort_p, idx = torch.sort(t, dim=-1, descending=True)
    cum = sort_p.cumsum(-1)
    keep = ~(cum - sort_p > p)
    sort_p = sort_p * keep.float()
    ref = torch.zeros_like(t).scatter(-1, idx, sort_p)
    ref = (ref / ref.sum(-1, keepdim=True)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-7)


def test_min_p():
    probs = _rand_probs((4, 60), seed=2)
    ours = np.asarray(apply_min_p(jnp.asarray(probs), 0.05))
    t = torch.from_numpy(probs)
    ref = torch.where(t < 0.05 * t.max(-1, keepdim=True)[0], torch.zeros(()), t)
    ref = (ref / ref.sum(-1, keepdim=True)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-7)


def test_unified():
    probs = _rand_probs((2, 40), seed=3)
    linear, conf, quad = 0.5, 0.4, 0.1
    ours = np.asarray(apply_unified(jnp.asarray(probs), linear, conf, quad))
    t = torch.from_numpy(probs)
    logp = torch.log(t.clamp_min(1e-20))
    ent = -(t * logp).sum(-1, keepdim=True)
    raw = logp * (linear + ent * conf) - logp**2 * quad
    ref = raw.softmax(-1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)


def test_repetition_penalty():
    rng = np.random.default_rng(4)
    logits = rng.standard_normal((2, 9, 30)).astype(np.float32)
    gen = rng.integers(0, 35, size=(2, 9, 6)).astype(np.int32)  # incl. >V ids
    ours = np.asarray(
        apply_repetition_penalty(jnp.asarray(logits), jnp.asarray(gen), 3.0, 2)
    )
    lt = torch.from_numpy(logits)
    gt = torch.from_numpy(gen)[..., -2:].clamp_max(29).long()
    rp = torch.full_like(lt, 3.0)
    factors = torch.ones_like(lt).scatter_reduce(2, gt, rp, reduce="prod")
    ref = torch.where(lt <= 0, lt * factors, lt / factors).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_greedy():
    logits = jnp.asarray(np.random.default_rng(5).standard_normal((2, 9, 40)))
    tok = sample_from_logits(
        jax.random.key(0), logits, SamplingParams(temperature=0.0)
    )
    np.testing.assert_array_equal(np.asarray(tok), np.argmax(np.asarray(logits), -1))
    assert tok.shape == (2, 9)


def test_gumbel_multinomial_distribution():
    probs = jnp.asarray([[0.5, 0.3, 0.2, 0.0]])
    keys = jax.random.split(jax.random.key(42), 4000)
    draws = jax.vmap(lambda k: gumbel_multinomial(k, probs))(keys)
    counts = np.bincount(np.asarray(draws).ravel(), minlength=4) / 4000.0
    assert counts[3] == 0.0  # zero-prob token never sampled
    np.testing.assert_allclose(counts[:3], [0.5, 0.3, 0.2], atol=0.04)


def test_min_p_restricts_support():
    rng = np.random.default_rng(6)
    logits = jnp.asarray(rng.standard_normal((3, 9, 100)).astype(np.float32) * 3)
    params = SamplingParams(temperature=1.0, min_p=0.2)
    probs = jax.nn.softmax(np.asarray(logits), axis=-1)
    allowed = probs >= 0.2 * probs.max(-1, keepdims=True)
    for i in range(20):
        tok = np.asarray(
            sample_from_logits(jax.random.key(i), logits, params)
        )
        picked = np.take_along_axis(allowed, tok[..., None], axis=-1)
        assert picked.all()
