"""Tracing / profiling subsystem (SURVEY.md §5.1 — the reference has none,
only tqdm progress).

* ``phase(name)`` — context-manager wall-clock timers aggregated into a
  process-global registry (phonemize / prefill / decode / vocode, ...).
* ``annotate(name)`` — ``jax.profiler.TraceAnnotation`` wrapper so phases and
  Pallas kernels show up in xprof/tensorboard traces.
* ``start_trace(logdir)`` / ``stop_trace`` — jax.profiler capture.
* ``rtf_report()`` — audio-seconds vs compute-seconds per phase.

Structured logging: ``log_event`` emits one JSON line per event to stderr —
greppable, machine-parseable (SURVEY.md §5.5).
"""

from __future__ import annotations

import contextlib
import json
import sys
import threading
import time
from collections import defaultdict

import jax

_LOCK = threading.Lock()
_TIMINGS: dict[str, list[float]] = defaultdict(list)
_COUNTERS: dict[str, float] = defaultdict(float)


@contextlib.contextmanager
def phase(name: str, annotate_trace: bool = True):
    """Time a pipeline phase; nest freely."""
    ctx = (
        jax.profiler.TraceAnnotation(name)
        if annotate_trace else contextlib.nullcontext()
    )
    t0 = time.perf_counter()
    with ctx:
        yield
    dt = time.perf_counter() - t0
    with _LOCK:
        _TIMINGS[name].append(dt)


def add_counter(name: str, value: float) -> None:
    with _LOCK:
        _COUNTERS[name] += value


def timings_snapshot() -> dict:
    with _LOCK:
        return {
            name: {
                "count": len(v),
                "total_s": round(sum(v), 4),
                "mean_s": round(sum(v) / len(v), 4) if v else 0.0,
                "last_s": round(v[-1], 4) if v else 0.0,
            }
            for name, v in _TIMINGS.items()
        }


def counters_snapshot() -> dict:
    with _LOCK:
        return dict(_COUNTERS)


def rtf_report() -> dict:
    """Audio-seconds per compute-second, overall and per phase."""
    snap = timings_snapshot()
    audio_s = counters_snapshot().get("audio_seconds", 0.0)
    compute_s = sum(p["total_s"] for p in snap.values())
    return {
        "audio_seconds": round(audio_s, 3),
        "compute_seconds": round(compute_s, 3),
        "rtf": round(audio_s / compute_s, 3) if compute_s else 0.0,
        "phases": snap,
    }


def reset() -> None:
    with _LOCK:
        _TIMINGS.clear()
        _COUNTERS.clear()


def log_event(event: str, **fields) -> None:
    """One JSON line per event to stderr (structured logging)."""
    rec = {"ts": round(time.time(), 3), "event": event, **fields}
    print(json.dumps(rec), file=sys.stderr, flush=True)


def start_trace(logdir: str) -> None:
    jax.profiler.start_trace(logdir)


def stop_trace() -> None:
    jax.profiler.stop_trace()
