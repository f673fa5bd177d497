"""Streaming decode: chunked segments must reproduce the one-shot result
exactly (same PRNG path), support early abort, and report progress."""

import jax
import jax.numpy as jnp
import numpy as np

from zonos_vibes_tpu.engine.generate import DecodeEngine
from zonos_vibes_tpu.models.zonos import ZonosModel
from zonos_vibes_tpu.ops.sampling import SamplingParams
from tests.test_engine import TINY


def _setup():
    model = ZonosModel(TINY)
    params = model.init(jax.random.key(0), jnp.float32)
    cond = model.prepare_conditioning(
        params, {"espeak": jnp.asarray([[2, 10, 20, 30, 3]])}
    )
    return model, params, cond


def test_stream_matches_oneshot():
    model, params, cond = _setup()
    engine = DecodeEngine(model)
    kwargs = dict(
        key=jax.random.key(5), max_new_tokens=12,
        sampling_params=SamplingParams(min_p=0.1),
    )
    ref = engine.generate(params, cond, **kwargs)
    chunks = list(engine.generate_stream(params, cond, chunk_steps=5, **kwargs))
    assert len(chunks) >= 2
    final = chunks[-1]
    np.testing.assert_array_equal(np.asarray(ref.codes), np.asarray(final.codes))
    assert int(ref.valid_length) == int(final.valid_length)
    # Progress is monotonic and cumulative results agree on their prefix.
    prev = 0
    for c in chunks:
        v = int(c.valid_length)
        assert v >= prev
        np.testing.assert_array_equal(
            np.asarray(c.codes[..., :prev]), np.asarray(final.codes[..., :prev])
        )
        prev = v


def test_stream_abort():
    model, params, cond = _setup()
    engine = DecodeEngine(model)
    it = engine.generate_stream(
        params, cond, key=jax.random.key(6), max_new_tokens=20,
        sampling_params=SamplingParams(temperature=0.0), chunk_steps=4,
    )
    first = next(it)
    assert int(first.valid_length) <= 20
    it.close()  # abort: no error, no further compute
