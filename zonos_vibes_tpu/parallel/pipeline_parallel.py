"""Pipeline-parallel stage runner (PP) — generic GPipe-style microbatching.

SURVEY.md §2.10: PP is marginal for a ~1.6B model on one v5e chip but must
exist as a strategy. This is the generic runner: the backbone's layer stack
is cut into ``n_stages`` contiguous stages, each stage's params live on one
rank of the ``pipe`` mesh axis, and microbatches flow stage-to-stage over
ICI via ``ppermute``. The schedule is the standard inference pipeline:
``n_micro + n_stages - 1`` ticks, bubble at fill/drain.

Implementation notes (idiomatic JAX, no hand-rolled transport):
* runs inside ``shard_map`` over the ``pipe`` axis; every rank executes the
  same program (SPMD), with ``axis_index`` selecting its stage params;
* per-tick: rank 0 injects the next microbatch, every rank applies its
  stage, outputs shift right by one rank; the last rank accumulates results;
* emission is a psum-mask (only the last rank contributes), which keeps
  ``out_specs`` replicated and the runner shape-agnostic.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def _pp_body(stage_params, microbatches, *, axis: str, stage_fn: Callable,
             n_micro: int):
    """stage_params: this rank's stage params (leading stage axis stripped by
    shard_map); microbatches: [n_micro, ...] full input (replicated)."""
    s = jax.lax.axis_index(axis)
    n = jax.lax.axis_size(axis)
    # shard_map leaves a size-1 stage axis on the local params; strip it.
    stage_params = jax.tree.map(lambda x: x[0], stage_params)
    x_shape = microbatches.shape[1:]

    state = jnp.zeros(x_shape, microbatches.dtype)  # input buffer of this rank
    outputs = jnp.zeros((n_micro,) + x_shape, microbatches.dtype)

    def tick(carry, t):
        state, outputs = carry
        # Rank 0 injects microbatch t (clamped; masked later).
        mb_idx = jnp.minimum(t, n_micro - 1)
        injected = jax.lax.dynamic_index_in_dim(
            microbatches, mb_idx, axis=0, keepdims=False
        )
        x_in = jnp.where(s == 0, injected, state)
        y = stage_fn(stage_params, x_in)
        # Emit on the last rank for ticks >= n-1.
        out_idx = jnp.clip(t - (n - 1), 0, n_micro - 1)
        emit = (s == n - 1) & (t >= n - 1)
        cur = jax.lax.dynamic_index_in_dim(outputs, out_idx, 0, keepdims=False)
        outputs = jax.lax.dynamic_update_index_in_dim(
            outputs, jnp.where(emit, y, cur), out_idx, 0
        )
        # Shift stage outputs to the next rank (open chain, not a ring).
        state = jax.lax.ppermute(
            y, axis, [(i, i + 1) for i in range(n - 1)]
        )
        return (state, outputs), None

    (_, outputs), _ = jax.lax.scan(
        tick, (state, outputs), jnp.arange(n_micro + n - 1)
    )
    # Only the last rank holds real outputs; replicate via masked psum.
    outputs = jnp.where(s == n - 1, outputs, 0)
    return jax.lax.psum(outputs, axis)


def pipeline_apply(
    stage_fn: Callable,
    stage_params,
    microbatches: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "pipe",
) -> jnp.ndarray:
    """Run ``microbatches [n_micro, ...]`` through ``n_stages`` stages.

    ``stage_params`` is a pytree whose leaves have a leading ``n_stages``
    axis (stage i's slice lives on pipe rank i); ``stage_fn(params_i, x)``
    must be shape-preserving (classic transformer stage contract).
    """
    n_micro = microbatches.shape[0]
    params_spec = jax.tree.map(lambda _: P(axis_name), stage_params)
    fn = shard_map(
        functools.partial(
            _pp_body, axis=axis_name, stage_fn=stage_fn, n_micro=n_micro
        ),
        mesh=mesh,
        in_specs=(params_spec, P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(stage_params, microbatches)
