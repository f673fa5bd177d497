"""Pooled-streaming TTFA under STAGGERED load: N concurrent streaming
requests share the continuous-batching pool (VERDICT r2 #2 — before this,
streaming requests forfeited weight-read amortization entirely), and each
stream's time-to-first-audio is measured end-to-end over HTTP.

Usage: python bench/pool_stream_ttfa.py [streams] [int8]

Prints ONE JSON line: value = median per-stream TTFA (s), worst also
reported; vs_baseline = the reference's serve-to-completion TTFA for a 5 s
utterance (2.5 s) over ours.
"""
import http.client
import json
import sys, threading, time
sys.path.insert(0, ".")
import jax

from zonos_vibes_tpu.config import ZONOS_V01_TRANSFORMER
from zonos_vibes_tpu.utils import enable_persistent_compilation_cache

enable_persistent_compilation_cache()
from zonos_vibes_tpu.pipeline import ZonosPipeline
from zonos_vibes_tpu.serve.server import TTSServer, wav_stream_header

N = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 4
INT8 = "int8" in sys.argv
PORT = 5110
TEXT = "The quick brown fox jumps over the lazy dog, and keeps running."
REFERENCE_TTFA_S = 2.5


def stream_ttfa(seed: int, drain: bool = False) -> float:
    """POST a streaming request; wall seconds to the first PCM chunk byte
    (after the WAV stream header, which the server writes eagerly).
    ``drain``: read the stream to completion instead of aborting — the
    warmup pass uses this so the row-finish programs (final flush,
    release) compile during warmup, not inside a measured stream's
    scheduler slice."""
    body = json.dumps({
        "text": TEXT, "language": "en-us", "stream": True, "seed": seed,
        "max_new_tokens": 430, "sampling": {"min_p": 0.1},
        "emotion": [0.3, 0.03, 0.03, 0.03, 0.03, 0.03, 0.25, 0.3],
    })
    t0 = time.perf_counter()
    conn = http.client.HTTPConnection("127.0.0.1", PORT, timeout=1800)
    conn.request("POST", "/tts", body,
                 {"Content-Type": "application/json"})
    resp = conn.getresponse()
    assert resp.status == 200, resp.status
    hdr = len(wav_stream_header(44100))
    got = 0
    el = None
    while got < hdr + 2:  # header + first PCM bytes
        data = resp.read(hdr + 2 - got)
        if not data:
            break
        got += len(data)
    el = time.perf_counter() - t0
    if drain:
        while resp.read(65536):
            pass
    conn.close()  # abort whatever remains of the stream
    return el


def main() -> None:
    pipe = ZonosPipeline.from_config(ZONOS_V01_TRANSFORMER)
    if INT8:
        pipe = pipe.quantize_int8()
    # Latency-tuned serving config: margin 12 covers the 44.1 kHz DAC
    # decoder's measured 9.02-frame half receptive field (pinned < 12 by
    # tests/test_dac.py — chunks stay sample-exact vs one-shot), and a
    # 24-step segment then emits a row's FIRST chunk at the end of its
    # first segment (join step ~2 + 24 steps -> valid 16 > margin; at
    # margin 16 the first segment yielded stable = 0 and TTFA paid a
    # whole extra segment).
    srv = TTSServer(pipe, host="127.0.0.1", port=PORT,
                    request_timeout_s=1800, pooled=True,
                    pool_slots=max(4, N), segment_steps=24,
                    stream_margin=12)
    srv.start_background()
    try:
        # Warmup: compiles prefill / pooled step / fused emit AND (via
        # drain) the row-finish + release programs; a second aborted
        # stream covers the cancel->release path.
        stream_ttfa(0, drain=True)
        stream_ttfa(0)
        time.sleep(2.0)  # let the aborted row's release land pre-measure
        ttfas = {}

        def run(i):
            ttfas[i] = stream_ttfa(1 + i)

        threads = []
        for i in range(N):
            t = threading.Thread(target=run, args=(i,))
            t.start()
            threads.append(t)
            time.sleep(0.3)  # staggered arrivals
        for t in threads:
            t.join(timeout=1800)
        snap = srv.metrics.snapshot()
        vals = sorted(ttfas.values())
        med = vals[len(vals) // 2]
        mode = "_int8" if INT8 else ""
        print(json.dumps({
            "metric": f"ttfa_pooled_stream{N}{mode}",
            "value": round(med, 4),
            "unit": "s_to_first_audio",
            "vs_baseline": round(REFERENCE_TTFA_S / med, 4),
            "worst": round(vals[-1], 4),
            # Streams abort after the first chunk (TTFA purity), so they
            # count as ADMITTED pool rows, not finished pooled_requests.
            "pool_admitted": snap["pool_admitted"],
            "pooled_requests": snap["pooled_requests"],
            "pool_admit_failures": snap["pool_admit_failures"],
        }))
    finally:
        srv.shutdown()


if __name__ == "__main__":
    main()
