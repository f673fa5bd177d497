"""In-place time-major stage column splice.

The staged decode path writes each step's fresh K/V columns into the
time-major stage ``[L, B, STAGE, Hkv*Dh]`` at slot ``offset -
stage_base`` with a ``dynamic_update_slice``. Inside the decode
while-loop the stage is also read by the attention custom-calls earlier
in the same step, and XLA's copy insertion around custom-calls is
conservative: the carry buffer gets a full materialized copy every step
(~17 us per 13.6 MB stage at the HBM roofline — docs/KERNELS.md "Known
headroom") even though the update touches one row.

This kernel performs the same splice with ``input_output_aliases``: the
output IS the input buffer, and the only traffic is one 8-row sublane
tile read-modify-write per (L, B) plane. A pooled variant splices each
row at its OWN ring slot (per-row scalar-prefetched slots), replacing
the unrolled per-row dynamic_update_slice chain.

Pure data movement — no reference counterpart (the reference rebuilds
contiguous KV tensors per step inside torch's SDPA path,
/root/reference/zonos/backbone/_torch.py:80-98); the staging scheme is
a TPU-side design, see docs/KERNELS.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _splice_kernel(slot_ref, cols_ref, stage_ref, out_ref):
    sub = slot_ref[0] % 8
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 8, 1), 2)
    out_ref[...] = jnp.where(rows == sub, cols_ref[...], stage_ref[...])


@functools.partial(jax.jit, static_argnames=("interpret",))
def stage_splice_pallas(
    stage: jnp.ndarray,  # [L, B, STAGE, W]
    cols: jnp.ndarray,  # [L, B, 1, W] fresh columns
    slot: jnp.ndarray,  # scalar int32, 0 <= slot < STAGE
    interpret: bool = False,
) -> jnp.ndarray:
    """``stage[:, :, slot, :] = cols[:, :, 0, :]`` in place (aliased).

    Small batches run the whole splice as ONE grid cell (all (L, B)
    planes in VMEM). Large CFG batches would blow the ~16 MB scoped VMEM
    with that block (measured: [26, 16, 8, 512] bf16 stage-in + aliased
    out + cols OOMed at batch-8 serving) — those block over the layer
    axis instead; same bytes, 26 double-buffered mini-DMAs."""
    L, B, S, W = stage.shape
    # Mosaic's real scoped-VMEM need runs ~2.7x this naive block estimate
    # (double buffering + stack temps: the batch-16 OOM reported 19.5M
    # scoped for a 7.2M estimate against the 16M limit) — 4M keeps the
    # proven single-cell form for small batches with ~3x headroom.
    block_bytes = (2 * L * B * 8 * W + L * B * W) * stage.dtype.itemsize
    if block_bytes <= 4 * 1024 * 1024:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[
                pl.BlockSpec((L, B, 1, W), lambda i, slot: (0, 0, 0, 0)),
                pl.BlockSpec(
                    (L, B, 8, W), lambda i, slot: (0, 0, slot[0] // 8, 0)
                ),
            ],
            out_specs=pl.BlockSpec(
                (L, B, 8, W), lambda i, slot: (0, 0, slot[0] // 8, 0)
            ),
        )
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(L,),
            in_specs=[
                pl.BlockSpec((1, B, 1, W), lambda l, slot: (l, 0, 0, 0)),
                pl.BlockSpec(
                    (1, B, 8, W), lambda l, slot: (l, 0, slot[0] // 8, 0)
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, B, 8, W), lambda l, slot: (l, 0, slot[0] // 8, 0)
            ),
        )
    return pl.pallas_call(
        _splice_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(stage.shape, stage.dtype),
        input_output_aliases={2: 0},
        interpret=interpret,
    )(jnp.asarray(slot, jnp.int32).reshape(1), cols, stage)


def _splice_rows_kernel(slots_ref, cols_ref, stage_ref, out_ref):
    b = pl.program_id(0)
    sub = slots_ref[b] % 8
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 8, 1), 2)
    out_ref[...] = jnp.where(rows == sub, cols_ref[...], stage_ref[...])


@functools.partial(jax.jit, static_argnames=("interpret",))
def stage_splice_rows_pallas(
    stage: jnp.ndarray,  # [L, B, STAGE, W]
    cols: jnp.ndarray,  # [L, B, 1, W]
    slots: jnp.ndarray,  # [B] int32 per-row slots (pool ring positions)
    interpret: bool = False,
) -> jnp.ndarray:
    """``stage[:, b, slots[b], :] = cols[:, b, 0, :]`` for every row b."""
    L, B, S, W = stage.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((L, 1, 1, W), lambda b, slots: (0, b, 0, 0)),
            pl.BlockSpec((L, 1, 8, W), lambda b, slots: (0, b, slots[b] // 8, 0)),
        ],
        out_specs=pl.BlockSpec(
            (L, 1, 8, W), lambda b, slots: (0, b, slots[b] // 8, 0)
        ),
    )
    return pl.pallas_call(
        _splice_rows_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(stage.shape, stage.dtype),
        input_output_aliases={2: 0},
        interpret=interpret,
    )(jnp.asarray(slots, jnp.int32), cols, stage)


def _eligible(stage: jnp.ndarray) -> bool:
    L, B, S, W = stage.shape
    return S % 8 == 0 and W % 128 == 0 and jax.default_backend() == "tpu"


def stage_splice_auto(stage, cols, slot) -> jnp.ndarray:
    """Dispatch: aliased Pallas splice on TPU, dynamic_update_slice
    elsewhere (CPU tests / non-tile-aligned stages).

    PRECONDITION: ``0 <= slot < STAGE``. The DUS fallback clamps an
    out-of-range slot, but the Pallas path does NOT — an OOB block index
    in the index_map is unspecified and ``slot % 8`` would then write the
    wrong sublane. Callers (engine/generate.py segment scheduler,
    engine/pool.py ring) guarantee it by construction (``n_steps <=
    stage_depth`` asserts + per-segment flushes); keep that invariant if
    the segment scheduler changes."""
    if _eligible(stage):
        return stage_splice_pallas(stage, cols, slot)
    zero = jnp.zeros((), jnp.int32)
    return jax.lax.dynamic_update_slice(
        stage, cols, (zero, zero, jnp.asarray(slot, jnp.int32), zero)
    )


def stage_splice_rows_auto(stage, cols, slots) -> jnp.ndarray:
    """Per-row variant dispatch (pool ring stages).

    PRECONDITION: ``0 <= slots[b] < STAGE`` for every row — see
    ``stage_splice_auto``; the pool ring keeps slots in range by
    construction (modulo ring arithmetic in engine/pool.py)."""
    if _eligible(stage):
        return stage_splice_rows_pallas(stage, cols, slots)
    zero = jnp.zeros((), jnp.int32)
    out = stage
    for b in range(stage.shape[1]):
        out = jax.lax.dynamic_update_slice(
            out,
            cols[:, b : b + 1],
            (zero, jnp.int32(b), jnp.asarray(slots[b], jnp.int32), zero),
        )
    return out
