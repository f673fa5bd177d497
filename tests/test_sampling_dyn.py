"""Runtime-knob sampler parity: sample_from_logits_dyn must be BIT-identical
to the static pipeline for the equivalent SamplingParams — that is what lets
rows with different sampling configs share one compiled pooled step while
still matching their solo-engine outputs exactly (VERDICT r2 #3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zonos_vibes_tpu.ops.sampling import (
    SamplingParams,
    knobs_from_params,
    sample_from_logits,
    sample_from_logits_dyn,
)

CASES = [
    SamplingParams(),  # defaults: rep penalty 3.0 window 2
    SamplingParams(min_p=0.1),  # the reference default config
    SamplingParams(temperature=0.0),  # greedy
    SamplingParams(temperature=0.8, top_p=0.9, repetition_penalty=1.0),
    SamplingParams(top_k=12),
    SamplingParams(linear=0.6, conf=0.2, quad=0.1),
    SamplingParams(temperature=1.3, top_p=0.85, top_k=50, min_p=0.05,
                   repetition_penalty=2.0, repetition_penalty_window=4),
]

WMAX = 8  # static window bound the pooled step compiles with


@pytest.mark.parametrize("sp", CASES, ids=[repr(c) for c in CASES])
def test_dyn_matches_static_bitexact(sp):
    rng = np.random.default_rng(3)
    B, K, V = 2, 9, 1025
    logits = jnp.asarray(rng.standard_normal((B, K, V)).astype(np.float32) * 4)
    # Window: static path gets exactly sp.repetition_penalty_window columns;
    # dyn gets the padded WMAX window whose LAST w columns are the same.
    gen_wmax = jnp.asarray(rng.integers(0, 1200, (B, K, WMAX)), jnp.int32)
    gen_w = gen_wmax[..., WMAX - sp.repetition_penalty_window:]

    for trial in range(5):
        key = jax.random.key(trial)
        ref = sample_from_logits(key, logits, sp, gen_w)
        dyn = sample_from_logits_dyn(
            key, logits, knobs_from_params(sp, 2.0), gen_wmax
        )
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(dyn))


def test_dyn_rows_vmap_heterogeneous():
    """Distinct knob rows under one vmap: each row matches its own static
    pipeline draw — the pooled-step usage pattern."""
    rng = np.random.default_rng(7)
    K, V = 9, 513
    rows = [SamplingParams(min_p=0.1), SamplingParams(temperature=0.0),
            SamplingParams(temperature=0.7, top_p=0.8, top_k=20)]
    logits = jnp.asarray(
        rng.standard_normal((len(rows), K, V)).astype(np.float32) * 3
    )
    gen = jnp.asarray(rng.integers(0, V, (len(rows), K, WMAX)), jnp.int32)
    knob_rows = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[knobs_from_params(sp, 2.0) for sp in rows],
    )
    keys = jax.random.split(jax.random.key(0), len(rows))

    dyn = jax.vmap(
        lambda k, lg, gw, kn: sample_from_logits_dyn(
            k, lg[None], kn, gw[None]
        )[0]
    )(keys, logits, gen, knob_rows)

    for i, sp in enumerate(rows):
        w = sp.repetition_penalty_window
        ref = sample_from_logits(
            keys[i], logits[i][None], sp, gen[i][None, :, WMAX - w:]
        )[0]
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(dyn[i]))


SORT_FREE_CASES = [
    SamplingParams(min_p=0.1),
    SamplingParams(temperature=0.0),
    SamplingParams(linear=0.5, conf=0.4),  # the server default
    SamplingParams(temperature=0.8, repetition_penalty=2.0),
]


@pytest.mark.parametrize("sp", SORT_FREE_CASES,
                         ids=[repr(c) for c in SORT_FREE_CASES])
def test_sort_free_variant_matches_static(sp):
    """sorted_stages=False (the pool's hot variant — XLA:TPU sorts cost
    ~2 ms/step at 8 slots) is bit-identical to the static pipeline for
    every knob set with top_p == top_k == 0."""
    rng = np.random.default_rng(9)
    B, K, V = 2, 9, 1025
    logits = jnp.asarray(rng.standard_normal((B, K, V)).astype(np.float32) * 4)
    gen_wmax = jnp.asarray(rng.integers(0, 1200, (B, K, WMAX)), jnp.int32)
    gen_w = gen_wmax[..., WMAX - sp.repetition_penalty_window:]
    for trial in range(3):
        key = jax.random.key(trial)
        ref = sample_from_logits(key, logits, sp, gen_w)
        dyn = sample_from_logits_dyn(
            key, logits, knobs_from_params(sp, 2.0), gen_wmax,
            sorted_stages=False,
        )
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(dyn))
