"""ParallelEngine: sharded generation over a device mesh.

The distributed serving path (SURVEY.md §2.10, §5.8): parameters live on the
mesh with megatron-style TP specs, utterance batches shard over ``data``
(carrying the CFG cond/uncond pair with them), and GSPMD inserts the ICI
collectives — psum after the row-parallel projections, gathers for the
vocab-sharded heads. The decode loop itself is the same single jitted
``generate_jit`` program; sharding is carried entirely by the input
shardings (params + conditioning), so one code path serves 1 chip or N.

Host-count-agnostic: on a multi-host pod slice, call
``jax.distributed.initialize()`` first and pass the global mesh; tested on a
spoofed 8-device CPU mesh (tests/test_parallel.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..config import MeshConfig
from ..engine.generate import GenerateResult, generate_jit
from ..models.zonos import ZonosModel
from ..ops.sampling import SamplingParams
from .pp_backbone import PipelinedZonosModel, pp_zonos_param_specs
from .sharding import DATA, make_mesh, shard_pytree, zonos_param_specs


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> None:
    """Multi-host runtime bring-up (jax.distributed). No-op if already
    initialized or single-process."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError:
        pass  # already initialized


class ParallelEngine:
    """Generation over a named mesh. ``mesh_config.data * model * ...`` must
    divide the available device count.

    ``sp_prefill``: "ring" | "ulysses" | None — route LONG prefills
    (cond + audio prefix >= ``sp_threshold`` positions) through the
    sequence-parallel prefill (parallel/sp_generate.py): the prefill pass
    shards the sequence over the ``model`` axis, writes the standard decode
    cache, and decode proceeds unchanged (SURVEY.md §5.7 long-context).
    Transformer backbones only; short prefills keep the dense path."""

    def __init__(self, model: ZonosModel, mesh_config: MeshConfig, params: dict,
                 sp_prefill: str | None = None, sp_threshold: int = 512):
        self.model = model
        self.mesh = make_mesh(mesh_config)
        self.mesh_config = mesh_config
        self.params = shard_pytree(params, zonos_param_specs(params), self.mesh)
        if sp_prefill is not None:
            if model.config.backbone.is_hybrid:
                raise ValueError("sp_prefill supports transformer backbones")
            if mesh_config.model < 2:
                raise ValueError("sp_prefill shards over the model axis "
                                 "(needs model >= 2)")
            if "weight" not in params["backbone"]["layers"]["in_proj"]:
                # int8 AND int4/grouped trees lack the dense "weight" leaf.
                raise ValueError("sp_prefill is a bf16 prefill path "
                                 "(quantized decode still applies after a "
                                 "dense prefill)")
        self.sp_prefill = sp_prefill
        self.sp_threshold = sp_threshold

    @property
    def data_parallelism(self) -> int:
        return self.mesh_config.data

    def shard_batch(self, prefix_conditioning: jnp.ndarray) -> jnp.ndarray:
        """Place ``[2B, Lc, D]`` conditioning with batch rows over ``data``.
        2B must be divisible by the data axis; the cond/uncond halves land on
        complementary shards, so the CFG pair is evaluated in parallel."""
        return jax.device_put(
            prefix_conditioning,
            NamedSharding(self.mesh, P(DATA, None, None)),
        )

    def generate(
        self,
        prefix_conditioning: jnp.ndarray,
        audio_prefix_codes: jnp.ndarray | None = None,
        *,
        key: jax.Array,
        max_new_tokens: int = 86 * 30,
        cfg_scale: float = 2.0,
        sampling_params: SamplingParams | dict | None = None,
        disable_eos: bool = False,
    ) -> GenerateResult:
        if sampling_params is None:
            sampling_params = SamplingParams(min_p=0.1)
        elif isinstance(sampling_params, dict):
            sampling_params = SamplingParams.from_dict(sampling_params)
        K = self.model.config.num_codebooks
        if audio_prefix_codes is None:
            b = prefix_conditioning.shape[0] // 2
            audio_prefix_codes = jnp.zeros((b, K, 0), jnp.int32)
        cond = self.shard_batch(prefix_conditioning)
        prefill_len = (
            prefix_conditioning.shape[1] + audio_prefix_codes.shape[-1] + 1
        )
        if self.sp_prefill is not None and prefill_len >= self.sp_threshold:
            from .sp_generate import sp_generate_jit

            with jax.sharding.set_mesh(self.mesh):
                codes, valid, valid_rows = sp_generate_jit(
                    self.model, self.params, cond, audio_prefix_codes, key,
                    int(audio_prefix_codes.shape[-1]), int(max_new_tokens),
                    float(cfg_scale), sampling_params, disable_eos,
                    self.mesh, "model", self.sp_prefill,
                )
            return GenerateResult(
                codes=codes, valid_length=valid, valid_lengths=valid_rows
            )
        with jax.sharding.set_mesh(self.mesh):
            codes, valid, valid_rows = generate_jit(
                self.model,
                self.params,
                cond,
                audio_prefix_codes,
                key,
                int(audio_prefix_codes.shape[-1]),
                int(max_new_tokens),
                float(cfg_scale),
                sampling_params,
                disable_eos,
            )
        return GenerateResult(
            codes=codes, valid_length=valid, valid_lengths=valid_rows
        )


class PipelineEngine(ParallelEngine):
    """Generation with the backbone layer stack pipeline-staged over the
    ``pipe`` mesh axis (real-model PP: per-stage KV shards, ppermute hidden
    handoff, microbatch tick schedule — parallel/pp_backbone.py). Composes
    with ``data`` for DP; ``model`` must be 1 (TP inside a pipe stage is a
    separate spec table, future work)."""

    def __init__(self, model: ZonosModel, mesh_config: MeshConfig,
                 params: dict, n_micro: int = 1):
        if mesh_config.pipe < 2:
            raise ValueError("PipelineEngine needs a pipe axis >= 2")
        if mesh_config.model != 1:
            raise ValueError("PipelineEngine composes pipe x data only")
        self.mesh = make_mesh(mesh_config)
        self.mesh_config = mesh_config
        self.sp_prefill = None  # SP prefill composes with TP/DP, not PP
        self.sp_threshold = 0
        self.model = PipelinedZonosModel(
            config=model.config,
            backbone_name=model.backbone_name,
            pipe_micro=n_micro,
            pp_mesh=self.mesh,
        )
        self.params = shard_pytree(
            params, pp_zonos_param_specs(params), self.mesh
        )
