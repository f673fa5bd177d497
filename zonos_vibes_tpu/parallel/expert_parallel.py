"""Expert-parallel (EP) dispatch scaffold.

SURVEY.md §2.10: Zonos has no MoE — the shipped checkpoints never exercise
this — but the layer map carries an ``expert`` mesh axis and this dispatch
scaffold so an MoE backbone drops in without reworking the parallel layer.

Top-1 token routing with fixed expert capacity: tokens pick an expert by
router argmax, are packed into per-expert capacity slots (overflow drops,
standard Switch-style), exchanged to the expert's rank via ``all_to_all``
over the ``expert`` axis, transformed, exchanged back, and unpacked.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def _dispatch_body(expert_params, tokens, router_logits, *, axis: str,
                   expert_fn: Callable, capacity: int):
    """tokens [T, D] (replicated), router_logits [T, E]; each rank holds ONE
    expert's params (leading expert axis stripped)."""
    expert_params = jax.tree.map(lambda x: x[0], expert_params)
    e = jax.lax.axis_index(axis)
    n = jax.lax.axis_size(axis)
    T, D = tokens.shape

    choice = jnp.argmax(router_logits, axis=-1)  # [T]
    # Position of each token within its expert's capacity buffer.
    onehot = jax.nn.one_hot(choice, n, dtype=jnp.int32)  # [T, E]
    pos = jnp.cumsum(onehot, axis=0) * onehot - 1  # [T, E], -1 if not routed
    my_pos = jnp.take_along_axis(pos, choice[:, None], axis=1)[:, 0]
    keep = my_pos < capacity

    # Pack: buffer [E, capacity, D] built locally (same on every rank).
    buf = jnp.zeros((n, capacity, D), tokens.dtype)
    idx_e = jnp.where(keep, choice, 0)
    idx_c = jnp.where(keep, my_pos, 0)
    buf = buf.at[idx_e, idx_c].add(
        jnp.where(keep[:, None], tokens, 0.0)
    )
    # Keep only my expert's slice and transform.
    mine = jax.lax.dynamic_index_in_dim(buf, e, axis=0, keepdims=False)
    out = expert_fn(expert_params, mine)  # [capacity, D]
    # Share results: every rank contributes its expert's outputs.
    all_out = jnp.zeros((n, capacity, D), out.dtype)
    all_out = jax.lax.dynamic_update_index_in_dim(all_out, out, e, axis=0)
    all_out = jax.lax.psum(all_out, axis)

    # Unpack back to token order; dropped tokens pass through unchanged.
    gathered = all_out[idx_e, idx_c]
    return jnp.where(keep[:, None], gathered, tokens)


def expert_dispatch(
    expert_fn: Callable,
    expert_params,
    tokens: jnp.ndarray,
    router_logits: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "expert",
    capacity: int | None = None,
) -> jnp.ndarray:
    """Route ``tokens [T, D]`` through experts sharded over ``axis_name``.

    ``expert_params`` leaves carry a leading ``n_experts`` axis. Returns
    ``[T, D]`` with each token transformed by its top-1 expert (identity for
    capacity-dropped tokens)."""
    n_experts = mesh.shape[axis_name]
    T = tokens.shape[0]
    if capacity is None:
        capacity = max(1, (2 * T) // n_experts)
    params_spec = jax.tree.map(lambda _: P(axis_name), expert_params)
    fn = shard_map(
        functools.partial(
            _dispatch_body, axis=axis_name, expert_fn=expert_fn,
            capacity=capacity,
        ),
        mesh=mesh,
        in_specs=(params_spec, P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(expert_params, tokens, router_logits)
