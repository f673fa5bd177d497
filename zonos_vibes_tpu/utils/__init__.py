"""Utility tier: checkpoint IO, host DSP, tracing, compilation cache."""

from __future__ import annotations

import jax


def enable_persistent_compilation_cache(
    cache_dir: str = "~/.cache/zonos_vibes_tpu/xla",
    min_compile_time_secs: float = 1.0,
) -> None:
    """Persist XLA compilations to disk so server restarts skip recompiles
    (pairs with ``TTSServer.warmup``; the decode while_loop at flagship
    scale costs minutes to compile). Uses JAX's built-in compilation cache —
    safe to call multiple times."""
    import os

    path = os.path.expanduser(cache_dir)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_time_secs)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
