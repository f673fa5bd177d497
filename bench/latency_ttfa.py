"""Time-to-first-audio (TTFA): wall seconds from request submission to the
first playable waveform chunk leaving the streaming pipeline (conditioning
build -> prefill -> first ~0.5 s decode segment -> vocode of that span).

The reference has no streaming path at all — it serves only complete
utterances (reference server.py:120-161), so its TTFA equals its full
generation wall (~2.5 s for a 5 s utterance at RTF 2). Ours is the first
chunk of the segment scheduler's stream. Usage:

    python bench/latency_ttfa.py [int8]

Prints ONE JSON line; vs_baseline = reference-5s-utterance TTFA (2.5 s)
divided by ours (higher is better).
"""
import json
import sys, time
sys.path.insert(0, ".")
import jax

from zonos_vibes_tpu.config import ZONOS_V01_TRANSFORMER
from zonos_vibes_tpu.utils import enable_persistent_compilation_cache

enable_persistent_compilation_cache()
from zonos_vibes_tpu.pipeline import ZonosPipeline

TEXT = "The quick brown fox jumps over the lazy dog, and keeps running."
REFERENCE_TTFA_S = 2.5  # 5 s utterance / RTF 2.0, serve-to-completion


def first_chunk(pipe, seed: int) -> float:
    """Submit one request; return wall seconds to the first waveform chunk."""
    t0 = time.perf_counter()
    cond = pipe.make_cond_dict(text=TEXT, language="en-us")
    stream = pipe.generate_stream(
        cond, key=jax.random.key(seed), max_new_tokens=430,
        sampling_params={"min_p": 0.1},
    )
    wav = next(stream)
    # device_get is the execution barrier on the remote-TPU platform
    # (block_until_ready returns early through the tunnel — CLAUDE.md).
    import numpy as np

    np.asarray(wav)
    el = time.perf_counter() - t0
    stream.close()  # abort the rest (the reference callback's return False)
    return el


def main() -> None:
    pipe = ZonosPipeline.from_config(ZONOS_V01_TRANSFORMER)
    if "int8" in sys.argv:
        pipe = pipe.quantize_int8()
    # Warmup compiles conditioning/prefill/segment/vocoder programs.
    first_chunk(pipe, 0)
    runs = [first_chunk(pipe, 1 + i) for i in range(3)]
    ttfa = min(runs)  # steady-state; min filters tunnel noise spikes
    mode = "_int8" if "int8" in sys.argv else ""
    print(json.dumps({
        "metric": f"ttfa_streaming{mode}",
        "value": round(ttfa, 4),
        "unit": "s_to_first_audio",
        "vs_baseline": round(REFERENCE_TTFA_S / ttfa, 4),
    }))


if __name__ == "__main__":
    main()
