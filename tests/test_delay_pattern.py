"""Delay codebook pattern unit tests (reference semantics:
zonos/codebook_pattern.py:5-12)."""

import jax.numpy as jnp
import numpy as np

from zonos_vibes_tpu.ops.delay_pattern import apply_delay_pattern, revert_delay_pattern

MASK = 1025


def _torch_style_reference(codes: np.ndarray, mask_token: int) -> np.ndarray:
    """Independent numpy model of the reference behavior: pad K columns of
    MASK on the right, roll codebook k right by k+1."""
    B, K, T = codes.shape
    padded = np.concatenate(
        [codes, np.full((B, K, K), mask_token, dtype=codes.dtype)], axis=-1
    )
    out = np.stack(
        [np.roll(padded[:, k], k + 1, axis=-1) for k in range(K)], axis=1
    )
    return out


def test_apply_matches_reference_semantics():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 1024, size=(2, 9, 17)).astype(np.int32)
    ours = np.asarray(apply_delay_pattern(jnp.asarray(codes), MASK))
    ref = _torch_style_reference(codes, MASK)
    # The roll wraps real values into the first k+1 slots; the reference's
    # padding guarantees those wrapped values are MASK already (they come from
    # the pad region) only for k < K; emulate by masking the wrapped region.
    B, K, T = codes.shape
    col = np.arange(T + K)[None, None, :]
    cb = np.arange(K)[None, :, None]
    ref = np.where(col <= cb, MASK, ref)
    np.testing.assert_array_equal(ours, ref)


def test_roundtrip():
    rng = np.random.default_rng(1)
    for B, K, T in [(1, 9, 1), (3, 9, 30), (2, 4, 7)]:
        codes = rng.integers(0, 1024, size=(B, K, T)).astype(np.int32)
        delayed = apply_delay_pattern(jnp.asarray(codes), MASK)
        assert delayed.shape == (B, K, T + K)
        back = revert_delay_pattern(delayed)
        np.testing.assert_array_equal(np.asarray(back), codes)


def test_diagonal_structure():
    # Frame t of codebook k lands at delayed column t + k + 1.
    codes = jnp.arange(9 * 5, dtype=jnp.int32).reshape(1, 9, 5)
    delayed = np.asarray(apply_delay_pattern(codes, MASK))
    for k in range(9):
        for t in range(5):
            assert delayed[0, k, t + k + 1] == k * 5 + t
    # Leading positions are MASK.
    for k in range(9):
        assert (delayed[0, k, : k + 1] == MASK).all()
