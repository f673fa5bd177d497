"""Aliased stage-splice kernel vs dynamic_update_slice (interpret on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zonos_vibes_tpu.ops.pallas.stage_write import (
    stage_splice_pallas,
    stage_splice_rows_pallas,
)

L, B, STAGE, W = 4, 2, 32, 256


@pytest.mark.parametrize("slot", [0, 1, 7, 8, 15, 31])
def test_stage_splice_matches_dus(slot):
    key = jax.random.key(slot)
    k1, k2 = jax.random.split(key)
    stage = jax.random.normal(k1, (L, B, STAGE, W), jnp.float32)
    cols = jax.random.normal(k2, (L, B, 1, W), jnp.float32)
    want = jax.lax.dynamic_update_slice(
        stage, cols, (0, 0, jnp.int32(slot), 0)
    )
    got = stage_splice_pallas(stage, cols, jnp.int32(slot), interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_stage_splice_rows_matches_per_row_dus():
    key = jax.random.key(0)
    k1, k2, k3 = jax.random.split(key, 3)
    stage = jax.random.normal(k1, (L, B, STAGE, W), jnp.float32)
    cols = jax.random.normal(k2, (L, B, 1, W), jnp.float32)
    slots = jax.random.randint(k3, (B,), 0, STAGE, jnp.int32)
    want = stage
    for b in range(B):
        want = jax.lax.dynamic_update_slice(
            want, cols[:, b : b + 1], (0, b, slots[b], 0)
        )
    got = stage_splice_rows_pallas(stage, cols, slots, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("slot", [0, 5, 9, 127])
def test_stage_splice_large_batch_layer_blocked(slot):
    """CFG batch 16 at flagship W/stage: the single-cell block OOMs scoped
    VMEM (measured, batch-8 serving config) — the layer-blocked grid path
    must produce identical results."""
    Lb, Bb, Sb, Wb = 26, 16, 128, 512
    key = jax.random.key(slot + 100)
    k1, k2 = jax.random.split(key)
    stage = jax.random.normal(k1, (Lb, Bb, Sb, Wb), jnp.float32)
    cols = jax.random.normal(k2, (Lb, Bb, 1, Wb), jnp.float32)
    # Shape-dispatch precondition: this geometry takes the layer grid.
    assert (2 * Lb * Bb * 8 * Wb + Lb * Bb * Wb) * 4 > 8 * 1024 * 1024
    want = jax.lax.dynamic_update_slice(
        stage, cols, (0, 0, jnp.int32(slot), 0)
    )
    got = stage_splice_pallas(stage, cols, jnp.int32(slot), interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
