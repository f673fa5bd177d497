"""Pipeline parallelism wired to the real Zonos transformer backbone.

SURVEY.md §2.10 PP row ("microbatched prefill; decode pipelining with
per-stage KV"); the reference has no PP at all. The generic shape-preserving
runner lives in ``pipeline_parallel.py``; this module cuts the ACTUAL
backbone layer stack into contiguous stages over the ``pipe`` mesh axis:

* layer params (stacked ``[L, ...]``) shard their leading axis over
  ``pipe`` — rank r owns layers ``[r·L/n, (r+1)·L/n)``, a contiguous stage;
* the KV cache shards the SAME way (``[L, B, Hkv, Dh, T]`` → ``P(pipe,
  data)``), so each stage owns exactly its own layers' cache — per-stage KV.
  The engine-level stage flush (:func:`..models.backbone.flush_kv_stage`)
  is layer-pointwise, so GSPMD partitions it over ``pipe`` with no comm;
* hidden states flow rank→rank+1 over ICI via ``ppermute`` (open chain);
* the tick schedule microbatches over BATCH rows: with ``n_micro``
  microbatches, tick t has rank r processing microbatch ``t − r`` —
  ``n_micro + n_stages − 1`` ticks total, the standard inference pipeline
  (GPipe fill/drain bubble). ``n_micro = 1`` degenerates to stage-sequential
  (exact single-request semantics, no overlap); ``n_micro ≥ n_stages``
  approaches ``n_stages×`` throughput on both prefill chunks and decode
  steps.

Everything embed/heads/sampling stays OUTSIDE the shard_map in the ordinary
engine program (replicated over ``pipe``), so the same ``generate_jit``
while-loop drives a pipelined backbone unchanged — only
``ZonosModel.backbone`` is swapped (:class:`PipelinedZonosModel`).

Known layout cost (documented, acceptable for a strategy that cannot run on
this environment's single real chip): with ``n_micro > 1`` each tick slices
the local cache's batch dim for its microbatch and splices it back — on a
real slice the cache would be allocated microbatch-major so the slice is a
leading-axis view. Parity tests pin exact codes vs the single-device engine
(tests/test_pp_model.py).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import BackboneConfig
from ..models.backbone import (
    _stack_forward,
    allocate_kv_cache,
    init_transformer_backbone,
)
from ..models.zonos import ZonosModel
from ..ops.norms import layer_norm
from ..ops.rope import expand_rope_table, rope_table
from .sharding import DATA, PIPE, _proj_spec


def _pp_body(layers, hidden, cache, offset, lengths, rope, stage_base,
             *, cfg: BackboneConfig, axis: str, n_micro: int, staged: bool,
             pooled: bool):
    """shard_map body: local views — ``layers`` [L/n, ...], ``hidden``
    [B_loc, S, D] (replicated over pipe, sharded over data), ``cache``
    leaves [L/n, B_loc, ...]."""
    r = jax.lax.axis_index(axis)
    n = jax.lax.axis_size(axis)
    b_loc = hidden.shape[0]
    bm = b_loc // n_micro
    sb = stage_base if staged else None

    def apply_stage(x, c, lens):
        return _stack_forward(
            layers, None, cfg, x, c, offset, lens, rope,
            stage_base=sb, pooled=pooled,
        )

    outputs = jnp.zeros_like(hidden)
    carry = jnp.zeros((bm,) + hidden.shape[1:], hidden.dtype)

    for t in range(n_micro + n - 1):
        mb = jnp.clip(t - r, 0, n_micro - 1)
        real = (t - r >= 0) & (t - r < n_micro)
        row0 = mb * bm
        inj = jax.lax.dynamic_slice_in_dim(hidden, row0, bm, axis=0)
        x_in = jnp.where(r == 0, inj, carry)
        lens = jax.lax.dynamic_slice_in_dim(lengths, row0, bm, axis=0)

        if n_micro == 1:
            def run(ops):
                x, c = ops
                return apply_stage(x, c, lens)
        else:
            def run(ops):
                x, c = ops
                c_mb = jax.tree.map(
                    lambda a: jax.lax.dynamic_slice_in_dim(a, row0, bm, axis=1),
                    c,
                )
                y, c_mb = apply_stage(x, c_mb, lens)
                c = jax.tree.map(
                    lambda a, u: jax.lax.dynamic_update_slice_in_dim(
                        a, u, row0, axis=1
                    ),
                    c, c_mb,
                )
                return y, c

        y, cache = jax.lax.cond(real, run, lambda ops: ops, (x_in, cache))

        # Last rank emits microbatch t-(n-1) into the output buffer.
        ob = jnp.clip(t - (n - 1), 0, n_micro - 1) * bm
        emit = (r == n - 1) & real
        cur = jax.lax.dynamic_slice_in_dim(outputs, ob, bm, axis=0)
        outputs = jax.lax.dynamic_update_slice_in_dim(
            outputs, jnp.where(emit, y, cur), ob, axis=0
        )
        # Hand this tick's output to the next stage (open chain).
        carry = jax.lax.ppermute(y, axis, [(i, i + 1) for i in range(n - 1)])

    # Only the last rank holds real outputs; replicate over pipe.
    outputs = jnp.where(r == n - 1, outputs, 0)
    return jax.lax.psum(outputs, axis), cache


class PipelinedTransformerBackbone:
    """Transformer backbone with its layer stack staged over ``pipe``.

    Drop-in for :class:`..models.backbone.TransformerBackbone`: same
    ``init/allocate_cache/forward`` surface, so :class:`PipelinedZonosModel`
    routes the unchanged decode engine through it.
    """

    supported_architectures = ["transformer"]

    def __init__(self, cfg: BackboneConfig, mesh: Mesh, n_micro: int = 1,
                 axis_name: str = PIPE):
        assert not cfg.is_hybrid, "PP backbone requires empty ssm_cfg"
        n = mesh.shape[axis_name]
        assert cfg.n_layer % n == 0, (
            f"n_layer {cfg.n_layer} must divide over {n} pipe stages"
        )
        self.cfg = cfg
        self.mesh = mesh
        self.axis_name = axis_name
        self.n_stages = n
        self.n_micro = n_micro

    def init(self, key, dtype=jnp.bfloat16) -> dict:
        return init_transformer_backbone(key, self.cfg, dtype)

    def _cache_spec(self) -> dict:
        return {
            "k": P(PIPE, DATA), "v": P(PIPE, DATA),
            "k_stage": P(PIPE, DATA), "v_stage": P(PIPE, DATA),
            "k_scale": P(PIPE, DATA), "v_scale": P(PIPE, DATA),
        }

    def allocate_cache(self, batch: int, max_seqlen: int, dtype=jnp.bfloat16,
                       kv_int8: bool = False):
        cache = allocate_kv_cache(self.cfg, batch, max_seqlen, dtype,
                                  kv_int8=kv_int8)
        # Pin per-stage KV placement from birth so the while-loop carry
        # never gathers the cache.
        return {
            k: jax.lax.with_sharding_constraint(
                v, NamedSharding(self.mesh, self._cache_spec()[k])
            )
            for k, v in cache.items()
        }

    def forward(self, params, hidden, cache, offset, lengths, rope=None,
                stage_base=None, pooled=False):
        cfg = self.cfg
        if rope is None:
            rope = expand_rope_table(rope_table(cfg.head_dim))
        staged = stage_base is not None
        sb = stage_base if staged else jnp.int32(0)
        layer_specs = jax.tree.map(lambda _: P(PIPE), params["layers"])
        cache_spec = {k: self._cache_spec()[k] for k in cache}
        fn = shard_map(
            functools.partial(
                _pp_body, cfg=cfg, axis=self.axis_name, n_micro=self.n_micro,
                staged=staged, pooled=pooled,
            ),
            mesh=self.mesh,
            in_specs=(layer_specs, P(DATA), cache_spec, P(), P(DATA),
                      P(), P()),
            out_specs=(P(DATA), cache_spec),
            check_vma=False,
        )
        out, new_cache = fn(
            params["layers"], hidden, cache, jnp.asarray(offset, jnp.int32),
            lengths, rope, jnp.asarray(sb, jnp.int32),
        )
        out = layer_norm(
            out, params["norm_f"]["weight"], params["norm_f"]["bias"],
            cfg.norm_epsilon,
        )
        return out, new_cache


@dataclass(frozen=True)
class PipelinedZonosModel(ZonosModel):
    """ZonosModel whose backbone runs pipeline-staged over ``pipe``.

    A frozen dataclass (hashable → valid jit static arg), so the SAME
    compiled ``generate_jit`` / ``decode_segment_jit`` entry points drive
    the pipelined stack — only the backbone routing changes.
    """

    pipe_micro: int = 1
    pp_mesh: Mesh | None = None

    @property
    def backbone(self):
        return PipelinedTransformerBackbone(
            self.config.backbone, self.pp_mesh, self.pipe_micro
        )


def pp_zonos_param_specs(params: dict) -> dict:
    """PartitionSpecs for the PP engine: backbone layer tensors shard their
    leading layer axis over ``pipe``; everything else (embeddings, heads,
    final norm, conditioners) replicates — those run outside the pipe."""
    layers = params["backbone"]["layers"]
    layer_specs = {
        "norm1": {"weight": P(PIPE), "bias": P(PIPE)},
        "in_proj": _proj_spec(layers["in_proj"], P(PIPE, None, None)),
        "out_proj": _proj_spec(layers["out_proj"], P(PIPE, None, None)),
        "norm2": {"weight": P(PIPE), "bias": P(PIPE)},
        "fc1": _proj_spec(layers["fc1"], P(PIPE, None, None)),
        "fc2": _proj_spec(layers["fc2"], P(PIPE, None, None)),
    }
    return {
        "embeddings": {"weight": P()},
        "heads": {"weight": P()},
        "backbone": {
            "layers": layer_specs,
            "norm_f": {"weight": P(), "bias": P()},
        },
        "prefix_conditioner": jax.tree.map(
            lambda _: P(), params["prefix_conditioner"]
        ),
    }
