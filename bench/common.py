"""Shared harness for the per-config benchmark suite (BASELINE.json configs).

Every bench prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}
(the bench.py contract). Baseline for RTF-like metrics is the reference's
~2x real-time on an RTX 4090 (reference README.md:84).

All benches random-init flagship-topology weights (no checkpoint egress in
this environment); compute shapes and code paths are identical to a real
checkpoint run. Synchronization uses jax.device_get — on the remote-TPU
platform block_until_ready can return before execution finishes; a host
transfer is a true barrier.
"""

from __future__ import annotations

import json
import time

import jax
import numpy as np

FRAME_RATE = 44100 / 512  # 86.1328 Hz DAC frame rate (autoencoder.py:19)
REF_RTF = 2.0  # reference README.md:84

# Benches time post-warmup steady state, so compile time never lands in a
# measurement — reuse compiled programs across suite runs (each config is
# its own interpreter; first compile over the tunnel is minutes).
from zonos_vibes_tpu.utils import enable_persistent_compilation_cache  # noqa: E402

enable_persistent_compilation_cache()


def sync(x):
    return jax.device_get(x)


def timed(fn, *, warmup: int = 1, iters: int = 1) -> tuple[float, object]:
    """Returns (seconds per call, last result). ``fn`` must return a jax
    array (or pytree) — we device_get it to barrier."""
    out = None
    for _ in range(warmup):
        out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters, out


def report(metric: str, value: float, unit: str, vs_baseline: float) -> None:
    print(json.dumps({
        "metric": metric,
        "value": round(float(value), 4),
        "unit": unit,
        "vs_baseline": round(float(vs_baseline), 4),
    }))


def phoneme_batch(lengths: list[int]) -> "np.ndarray":
    """Synthetic left-padded phoneme id batch (BOS ... EOS), reference
    tokenize_phonemes semantics (conditioning.py:163-168)."""
    longest = max(lengths)
    rows = []
    rng = np.random.default_rng(0)
    for n in lengths:
        ids = [2] + list(rng.integers(10, 100, size=n - 2)) + [3]
        rows.append([0] * (longest - n) + ids)
    return np.asarray(rows, np.int32)
