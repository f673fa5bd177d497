"""Expert-parallel (EP) dispatch over the ``expert`` mesh axis.

SURVEY.md §2.10: Zonos has no MoE — the shipped checkpoints never exercise
this — but the layer map carries an ``expert`` mesh axis and this dispatch
layer so an MoE backbone drops in without reworking the parallel stack.

Top-1 token routing with fixed expert capacity, exchanged with real
``all_to_all`` collectives (per-rank comm O(capacity·D), not a broadcast):

* tokens are sharded over the expert axis ([T/n, D] per rank);
* each rank packs its local tokens into a per-destination-expert buffer
  ``[E, cap_local, D]`` (Switch-style: overflow beyond capacity drops and
  passes through untransformed);
* one ``all_to_all`` swaps destination-major for source-major — each rank
  now holds the tokens routed to ITS expert from every source rank;
* the expert transforms its ``[n · cap_local, D]`` slab;
* a second ``all_to_all`` (its own inverse) returns outputs to the token's
  home rank, where they are unpacked back into token order.

Capacity is enforced per (source rank, expert) at ``capacity // n`` slots —
the standard data-sharded Switch enforcement granularity.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def _dispatch_body(expert_params, tokens, router_logits, *, axis: str,
                   expert_fn: Callable, cap_local: int, t_valid: int):
    """tokens [T/n, D] (sharded over ``axis``), router_logits [T/n, E];
    each rank holds ONE expert's params (leading expert axis stripped)."""
    expert_params = jax.tree.map(lambda x: x[0], expert_params)
    r = jax.lax.axis_index(axis)
    n = jax.lax.axis_size(axis)
    t_local, d = tokens.shape

    # Padding rows (wrapper pads T to a multiple of n) never claim capacity.
    valid = (r * t_local + jnp.arange(t_local)) < t_valid  # [T/n]

    choice = jnp.argmax(router_logits, axis=-1)  # [T/n]
    onehot = jax.nn.one_hot(choice, n, dtype=jnp.int32) * valid[:, None]
    # Position of each token within its (source rank, expert) capacity slots.
    pos = jnp.cumsum(onehot, axis=0) * onehot - 1  # [T/n, E], -1 if unrouted
    my_pos = jnp.take_along_axis(pos, choice[:, None], axis=1)[:, 0]
    keep = (my_pos >= 0) & (my_pos < cap_local)

    # Pack local tokens destination-major: buf[e, c] = c-th local token
    # routed to expert e.
    buf = jnp.zeros((n, cap_local, d), tokens.dtype)
    idx_e = jnp.where(keep, choice, 0)
    idx_c = jnp.where(keep, my_pos, 0)
    buf = buf.at[idx_e, idx_c].add(jnp.where(keep[:, None], tokens, 0.0))

    # all_to_all #1: destination-major -> source-major. After this, row i of
    # the local buffer holds rank i's tokens routed to MY expert.
    mine = jax.lax.all_to_all(buf, axis, split_axis=0, concat_axis=0,
                              tiled=True)  # [n, cap_local, D]
    out = expert_fn(expert_params, mine.reshape(n * cap_local, d))
    out = out.reshape(n, cap_local, d)

    # all_to_all #2 (self-inverse): outputs return to each token's home rank,
    # destination-major again: back[e, c] = output of my c-th token sent to e.
    back = jax.lax.all_to_all(out, axis, split_axis=0, concat_axis=0,
                              tiled=True)

    # Unpack to token order; dropped/padding tokens pass through unchanged.
    gathered = back[idx_e, idx_c]
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
    capacity-dropped tokens). ``capacity`` is the per-expert token budget,
    enforced at ``capacity // n`` per source rank.
    """
    n = mesh.shape[axis_name]
    t = tokens.shape[0]
    if capacity is None:
        capacity = max(n, (2 * t) // n)
    cap_local = max(1, capacity // n)

    # Pad T to a multiple of n so the token shard is even; padding rows are
    # masked out of routing inside the body and sliced off here.
    t_pad = (-t) % n
    if t_pad:
        tokens_in = jnp.pad(tokens, ((0, t_pad), (0, 0)))
        router_in = jnp.pad(router_logits, ((0, t_pad), (0, 0)))
    else:
        tokens_in, router_in = tokens, router_logits

    params_spec = jax.tree.map(lambda _: P(axis_name), expert_params)
    fn = shard_map(
        functools.partial(
            _dispatch_body, axis=axis_name, expert_fn=expert_fn,
            cap_local=cap_local, t_valid=t,
        ),
        mesh=mesh,
        in_specs=(params_spec, P(axis_name), P(axis_name)),
        out_specs=P(axis_name),
        check_vma=False,
    )
    out = fn(expert_params, tokens_in, router_in)
    return out[:t] if t_pad else out
