"""PP stage runner and EP dispatch scaffolds vs sequential references."""

import jax
import jax.numpy as jnp
import numpy as np

from zonos_vibes_tpu.config import MeshConfig
from zonos_vibes_tpu.parallel.expert_parallel import expert_dispatch
from zonos_vibes_tpu.parallel.pipeline_parallel import pipeline_apply
from zonos_vibes_tpu.parallel.sharding import make_mesh


def _stage_fn(params, x):
    return jnp.tanh(x @ params["w"] + params["b"])


def test_pipeline_matches_sequential():
    n_stages, n_micro, B, D = 4, 6, 3, 8
    mesh = make_mesh(MeshConfig(data=1, model=1, pipe=n_stages))
    rng = np.random.default_rng(0)
    params = {
        "w": jnp.asarray(rng.standard_normal((n_stages, D, D)).astype(np.float32) * 0.5),
        "b": jnp.asarray(rng.standard_normal((n_stages, D)).astype(np.float32) * 0.1),
    }
    x = jnp.asarray(rng.standard_normal((n_micro, B, D)).astype(np.float32))

    out = pipeline_apply(_stage_fn, params, x, mesh, axis_name="pipe")

    ref = x
    for s in range(n_stages):
        ref = _stage_fn({"w": params["w"][s], "b": params["b"][s]}, ref)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_expert_dispatch_matches_dense():
    n_exp, T, D = 4, 24, 8
    mesh = make_mesh(MeshConfig(data=1, model=1, expert=n_exp))
    rng = np.random.default_rng(1)
    params = {
        "w": jnp.asarray(rng.standard_normal((n_exp, D, D)).astype(np.float32) * 0.5)
    }
    tokens = jnp.asarray(rng.standard_normal((T, D)).astype(np.float32))
    router = jnp.asarray(rng.standard_normal((T, n_exp)).astype(np.float32))

    def expert_fn(p, x):
        return x @ p["w"]

    out = expert_dispatch(
        expert_fn, params, tokens, router, mesh, capacity=T
    )
    choice = np.argmax(np.asarray(router), axis=-1)
    ref = np.stack(
        [np.asarray(tokens)[t] @ np.asarray(params["w"])[choice[t]]
         for t in range(T)]
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_expert_capacity_overflow_passthrough():
    n_exp, T, D = 2, 8, 4
    mesh = make_mesh(MeshConfig(data=1, model=1, expert=n_exp))
    params = {"w": jnp.zeros((n_exp, D, D))}  # experts output zeros
    tokens = jnp.ones((T, D))
    router = jnp.tile(jnp.asarray([[10.0, 0.0]]), (T, 1))  # all to expert 0
    out = expert_dispatch(
        lambda p, x: x @ p["w"], params, tokens, router, mesh, capacity=4
    )
    out = np.asarray(out)
    # capacity 4 over 2 source ranks = 2 slots each -> 4 tokens transformed
    # (to zero), 4 overflow tokens pass through.
    assert (out.sum(-1) == 0).sum() == 4
    assert (out.sum(-1) == D).sum() == T - 4


def test_expert_dispatch_uneven_tokens():
    """T not divisible by the expert-axis size: padding rows are invisible."""
    n_exp, T, D = 4, 22, 8
    mesh = make_mesh(MeshConfig(data=1, model=1, expert=n_exp))
    rng = np.random.default_rng(3)
    params = {
        "w": jnp.asarray(rng.standard_normal((n_exp, D, D)).astype(np.float32) * 0.5)
    }
    tokens = jnp.asarray(rng.standard_normal((T, D)).astype(np.float32))
    router = jnp.asarray(rng.standard_normal((T, n_exp)).astype(np.float32))
    out = expert_dispatch(
        lambda p, x: x @ p["w"], params, tokens, router, mesh, capacity=4 * T
    )
    choice = np.argmax(np.asarray(router), axis=-1)
    ref = np.stack(
        [np.asarray(tokens)[t] @ np.asarray(params["w"])[choice[t]]
         for t in range(T)]
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_expert_dispatch_lowers_to_all_to_all():
    """The exchange is a real all_to_all, not a psum broadcast
    (VERDICT.md round 1, missing #5)."""
    n_exp, T, D = 4, 16, 8
    mesh = make_mesh(MeshConfig(data=1, model=1, expert=n_exp))
    params = {"w": jnp.zeros((n_exp, D, D), jnp.float32)}
    tokens = jnp.zeros((T, D), jnp.float32)
    router = jnp.zeros((T, n_exp), jnp.float32)

    def run(p, t, r):
        return expert_dispatch(lambda pp, x: x @ pp["w"], p, t, r, mesh,
                               capacity=T)

    text = jax.jit(run).lower(params, tokens, router).as_text()
    assert "all_to_all" in text
    # No full-buffer broadcast combine on the expert axis.
    body = text[text.index("all_to_all"):]
    assert "psum" not in body
