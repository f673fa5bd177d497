"""Distributional parity of the FULL sampling pipeline vs the reference
(VERDICT.md round 1, next #6; SURVEY.md §7 hard part 2).

The unit tests in test_sampling.py pin each filter transform; this suite
pins the *sampled-token distribution*: >=10k draws from our
``sample_from_logits`` per knob setting are chi-square-tested against the
exact post-filter categorical distribution computed by executing the
reference's OWN torch pipeline (/root/reference/zonos/sampling.py,
imported directly — the same legitimate golden-use pattern as
tools/capture_reference.py). One setting additionally two-sample-tests our
draws against the reference's own ``multinomial`` (exponential-race) draws.

Deterministic: fixed PRNG keys / torch generator seeds, significance
thresholds at ~1e-4 via the Wilson-Hilferty chi-square approximation.
"""

import importlib.util
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from zonos_vibes_tpu.ops.sampling import SamplingParams, sample_from_logits

N_DRAWS = 20_000
V = 64  # small vocab keeps every kept bin well above the chi-square minimum


def _load_reference_sampling():
    spec = importlib.util.spec_from_file_location(
        "ref_sampling", "/root/reference/zonos/sampling.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_sampling"] = mod
    spec.loader.exec_module(mod)
    return mod


REF = _load_reference_sampling()


def _reference_probs(logits_t: torch.Tensor, sp: SamplingParams,
                     gen_tokens: torch.Tensor | None) -> np.ndarray:
    """Run the reference pipeline's filter stages (sampling.py:117-182,
    everything before the final multinomial) to get the exact categorical
    distribution the reference samples from."""
    lg = logits_t.clone()
    if sp.repetition_penalty != 1.0 and gen_tokens is not None:
        lg = REF.modify_logit_for_repetition_penalty(
            lg, gen_tokens, sp.repetition_penalty,
            sp.repetition_penalty_window,
        )
    probs = torch.softmax(lg / sp.temperature, dim=-1)
    if sp.linear > 0.0:
        probs = REF.apply_unified(probs, sp.linear, sp.conf, sp.quad)
    if sp.top_p > 0:
        probs = REF.apply_top_p(probs, sp.top_p)
    if sp.top_k > 0:
        probs = REF.apply_top_k(probs, sp.top_k)
    if sp.min_p > 0:
        probs = REF.apply_min_p(probs, sp.min_p)
    return probs.double().numpy()


def _our_draws(logits: np.ndarray, sp: SamplingParams,
               gen_tokens: np.ndarray | None, n: int = N_DRAWS) -> np.ndarray:
    """[n, B, K] token draws from our pipeline under n distinct keys."""
    keys = jax.random.split(jax.random.key(1234), n)
    lj = jnp.asarray(logits)
    gw = None if gen_tokens is None else jnp.asarray(gen_tokens)
    fn = jax.jit(jax.vmap(
        lambda k: sample_from_logits(k, lj, sp, gw)
    ))
    return np.asarray(fn(keys))


def _chi2_crit(df: int, z: float = 3.72) -> float:
    """Wilson-Hilferty upper quantile (z=3.72 ~ p=1e-4)."""
    a = 2.0 / (9.0 * df)
    return df * (1.0 - a + z * np.sqrt(a)) ** 3


def _assert_matches(draws_row: np.ndarray, probs_row: np.ndarray):
    """Chi-square goodness of fit of draws against the reference
    distribution; bins with expected count < 5 merge into one tail bin."""
    n = draws_row.shape[0]
    counts = np.bincount(draws_row, minlength=V).astype(np.float64)
    expected = probs_row * n
    big = expected >= 5.0
    # Any draw landing on a zero-probability token is an outright failure
    # (the reference can never sample it).
    zero = probs_row <= 1e-12
    assert counts[zero].sum() == 0, "sampled a token the reference filters out"
    obs = np.concatenate([counts[big], [counts[~big].sum()]])
    exp = np.concatenate([expected[big], [expected[~big].sum()]])
    keep = exp > 0
    obs, exp = obs[keep], exp[keep]
    stat = np.sum((obs - exp) ** 2 / exp)
    df = len(exp) - 1
    crit = _chi2_crit(max(df, 1))
    assert stat < crit, f"chi2 {stat:.1f} >= crit {crit:.1f} (df {df})"


def _logits(seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    # Two codebook rows with different shapes: one peaked, one flat-ish.
    row0 = rng.standard_normal(V) * 2.0
    row1 = rng.standard_normal(V) * 0.5
    return np.stack([row0, row1])[None].astype(np.float32)  # [1, 2, V]


CASES = [
    ("unified_defaults", SamplingParams(
        linear=0.5, conf=0.4, quad=0.0, repetition_penalty=1.0), False),
    ("unified_quad", SamplingParams(
        linear=0.3, conf=-0.2, quad=0.5, repetition_penalty=1.0), False),
    ("top_p", SamplingParams(top_p=0.8, repetition_penalty=1.0), False),
    ("top_k", SamplingParams(top_k=8, repetition_penalty=1.0), False),
    ("min_p", SamplingParams(min_p=0.1, repetition_penalty=1.0), False),
    ("plain_temperature", SamplingParams(
        temperature=1.3, repetition_penalty=1.0), False),
    ("repetition_penalty", SamplingParams(
        repetition_penalty=3.0, repetition_penalty_window=4), True),
    ("combined", SamplingParams(
        linear=0.5, conf=0.4, min_p=0.05, repetition_penalty=2.0,
        repetition_penalty_window=4), True),
]


@pytest.mark.parametrize("name,sp,with_window", CASES,
                         ids=[c[0] for c in CASES])
def test_sampled_distribution_matches_reference(name, sp, with_window):
    logits = _logits(seed=7)
    gen = None
    gen_t = None
    if with_window:
        # A window with repeats: token 3 twice, 11 once, MASK-like id V-1.
        gen = np.asarray([[[3, 3, 11, V - 1],
                           [5, 5, 5, 2]]], np.int32)  # [1, 2, 4]
        gen_t = torch.asarray(gen).long()
    probs_ref = _reference_probs(torch.asarray(logits), sp, gen_t)  # [1,2,V]
    draws = _our_draws(logits, sp, gen)  # [n, 1, 2]
    for k in range(2):
        _assert_matches(draws[:, 0, k], probs_ref[0, k])


def test_two_sample_vs_reference_multinomial():
    """Our Gumbel/exponential-race sampler against the reference's own
    ``multinomial`` draws (sampling.py:19-21): two-sample chi-square on
    10k+10k draws from the same filtered distribution."""
    sp = SamplingParams(min_p=0.1, repetition_penalty=1.0)
    logits = _logits(seed=11)
    probs_ref = _reference_probs(torch.asarray(logits), sp, None)

    ours = _our_draws(logits, sp, None)[:, 0, 0]  # row (0, 0)
    g = torch.Generator().manual_seed(99)
    pt = torch.asarray(probs_ref[0, 0]).float().expand(N_DRAWS, V)
    theirs = REF.multinomial(pt.contiguous(), 1, generator=g)[:, 0].numpy()

    c_ours = np.bincount(ours, minlength=V).astype(np.float64)
    c_ref = np.bincount(theirs, minlength=V).astype(np.float64)
    tot = c_ours + c_ref
    big = tot >= 10
    o = np.concatenate([c_ours[big], [c_ours[~big].sum()]])
    r = np.concatenate([c_ref[big], [c_ref[~big].sum()]])
    keep = (o + r) > 0
    o, r = o[keep], r[keep]
    # Standard two-sample chi-square with equal sample sizes.
    stat = np.sum((o - r) ** 2 / (o + r))
    df = len(o) - 1
    assert stat < _chi2_crit(max(df, 1)), (stat, df)
