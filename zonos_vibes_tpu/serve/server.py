"""HTTP TTS server — same ``POST /tts`` contract as the reference Flask app
(reference server.py:59-91: JSON ``{text, speaker_audio_path, speaking_rate,
language?}`` -> ``audio/wav``), re-engineered for production serving:

* **stdlib only** (ThreadingHTTPServer) — no Flask dependency;
* **single-owner model state**: HTTP threads only enqueue; one worker thread
  owns the pipeline and drains a request queue, eliminating the reference's
  unlocked global-model race (server.py:22-23,55; SURVEY.md §5.2);
* **request batching**: the worker drains up to ``max_batch`` queued requests
  with equal-length conditioning buckets per decode call (the reference
  serves strictly one request at a time, §3.3);
* per-request deadline + JSON errors (400/404/500, reference
  server.py:72-91,163-170) and a ``GET /healthz`` + ``GET /metrics``
  surface (tokens/s, RTF, queue depth — SURVEY.md §5.3/5.5);
* speaker-embedding cache keyed by file path (reference server.py:38-57),
  guarded by a lock;
* deterministic per-request PRNG: fixed base seed (reference uses
  torch.manual_seed(420), server.py:19,100-107) folded with a request
  counter.
"""

from __future__ import annotations

import base64
import hashlib
import io
import json
import queue
import threading
import time
import wave
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.sampling import SamplingParams
from ..utils import tracing

DEFAULT_SEED = 420  # reference server.py:19
DEFAULT_UNCONDITIONAL = [
    "emotion", "vqscore_8", "fmax", "pitch_std", "dnsmos_ovrl", "speaker_noised",
]  # reference server.py:111-119
DEFAULT_SAMPLING = SamplingParams(linear=0.5, conf=0.4)  # server.py:130


def wav_bytes(wav: np.ndarray, sample_rate: int) -> bytes:
    """float [-1,1] mono -> 16-bit PCM WAV bytes (reference server.py:134-152
    clips then scales by 32767)."""
    pcm = (np.clip(wav, -1.0, 1.0) * 32767.0).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def read_wav(path) -> tuple[np.ndarray, int]:
    """Load a WAV file (path or file-like) to float32 ``[C, T]`` + sample
    rate (stdlib)."""
    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(n)
    if width == 2:
        data = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        data = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    elif width == 1:
        data = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"Unsupported WAV sample width: {width}")
    return data.reshape(-1, ch).T, sr


def wav_stream_header(sample_rate: int) -> bytes:
    """WAV header for a stream of unknown length (RIFF/data sizes maxed —
    the accepted convention for live PCM streams)."""
    import struct

    return (
        b"RIFF" + struct.pack("<I", 0xFFFFFFFF) + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16)
        + b"data" + struct.pack("<I", 0xFFFFFFFF)
    )


@dataclass
class _Request:
    payload: dict
    done: threading.Event = field(default_factory=threading.Event)
    response: tuple[int, str, bytes] | None = None  # (status, ctype, body)
    enqueued_at: float = field(default_factory=time.monotonic)
    retries: int = 0
    # Streaming requests get a chunk queue instead of a one-shot response:
    # items are PCM bytes, ("error", response_tuple), or None (end).
    stream_q: "queue.Queue | None" = None
    # Set by the HTTP thread when the client goes away; the worker stops
    # generating at the next segment boundary.
    cancelled: threading.Event = field(default_factory=threading.Event)


class Metrics:
    def __init__(self):
        self.lock = threading.Lock()
        self.requests_total = 0
        self.errors_total = 0
        self.batched_requests = 0
        self.replayed_requests = 0
        self.audio_seconds_total = 0.0
        self.compute_seconds_total = 0.0
        self.queue_depth = 0
        self.pooled_requests = 0  # rows that FINISHED in a pool
        self.pool_admitted = 0  # rows that JOINED a pool (aborted streams
        # count here but not in pooled_requests)
        self.pool_admit_failures = 0  # admit EXCEPTIONS (fell to job path).
        # Pool-full/ineligible fallbacks are normal and not counted; a
        # nonzero value means the b621369 class (admit crash -> silent job
        # path) is back — benches assert this stays 0.

    def snapshot(self) -> dict:
        with self.lock:
            rtf = (
                self.audio_seconds_total / self.compute_seconds_total
                if self.compute_seconds_total > 0 else 0.0
            )
            return {
                "requests_total": self.requests_total,
                "errors_total": self.errors_total,
                "audio_seconds_total": round(self.audio_seconds_total, 3),
                "compute_seconds_total": round(self.compute_seconds_total, 3),
                "rtf": round(rtf, 3),
                "batched_requests": self.batched_requests,
                "replayed_requests": self.replayed_requests,
                "queue_depth": self.queue_depth,
                "pooled_requests": self.pooled_requests,
                "pool_admitted": self.pool_admitted,
                "pool_admit_failures": self.pool_admit_failures,
            }


class TTSServer:
    def __init__(
        self,
        pipeline,
        host: str = "0.0.0.0",
        port: int = 5000,
        max_batch: int = 8,
        batch_window_s: float = 0.05,
        request_timeout_s: float = 120.0,
        seed: int = DEFAULT_SEED,
        monitor=None,  # parallel.multihost.HeartbeatMonitor | None
        max_retries: int = 1,
        extra_pipelines: dict | None = None,
        max_active_jobs: int = 4,
        segment_steps: int = 43,  # ~0.5 s of audio per scheduling slice —
        # matches the streaming chunk so streaming and non-streaming jobs
        # (and warmup) share ONE compiled segment program family
        pooled: bool = False,
        pool_slots: int = 4,
        pool_kv_int8: bool = False,
        pool_state_bf16: bool = False,
        stream_margin: int = 32,  # withheld right-margin code frames for
        # streaming rows; must cover the DAC decoder's half receptive
        # field in FRAMES (~9 for the 44.1 kHz topology -> 16 is a safe
        # latency-tuned value there; coarse tiny test DACs need ~19-24,
        # hence the conservative default). Smaller margin = earlier first
        # chunk (TTFA) at identical sample-exactness while the margin
        # still covers the half-RF.
    ):
        self.pipeline = pipeline
        # Multi-model serving (the reference gradio's model selector,
        # gradio_interface.py:206-217): named pipelines share the request
        # queue; requests pick one via the "model" payload key.
        self.pipelines = {"default": pipeline}
        if extra_pipelines:
            self.pipelines.update(extra_pipelines)
        self.host, self.port = host, port
        self.max_batch = max_batch
        self.batch_window_s = batch_window_s
        self.request_timeout_s = request_timeout_s
        self.seed = seed
        # Failure handling (SURVEY.md §5.3): heartbeat monitor drives
        # /healthz; failed decode groups are re-enqueued (reload + replay
        # semantics — inference has no training state to restore).
        self.monitor = monitor
        self.max_retries = max_retries
        self.max_active_jobs = max_active_jobs
        self.segment_steps = segment_steps
        # Continuous batching (engine/pool.py): staggered pool-eligible
        # requests share one compiled step's weight reads instead of each
        # paying full bandwidth as interleaved solo jobs.
        self.pooled = pooled
        self.pool_slots = pool_slots
        # int8 KV cache for pool rows (transformer pipelines only): halves
        # the pooled cache read — the dominant HBM stream late in
        # generation at 8-16 rows (engine/pool.make_pool).
        self.pool_kv_int8 = pool_kv_int8
        # bf16 SSM-state storage for hybrid pool rows (fp32 compute):
        # halves the state read+write, the dominant HBM stream of the
        # hybrid pooled step at 8-16 rows (engine/pool.make_pool).
        self.pool_state_bf16 = pool_state_bf16
        self.stream_margin = int(stream_margin)
        if pooled:
            # Guard the pooled vocoder's fixed-window invariants (ADVICE r4):
            # emit_cap = VOCODE_WIN - 2*margin must stay positive or
            # _PoolJob._vocode_span never advances and the single scheduler
            # thread spins forever, stalling ALL pooled serving. Require at
            # least one 8-frame step of progress per window. The LOWER bound
            # (margin >= the DAC decoder's half receptive field in code
            # frames, ~9 for the 44.1 kHz topology — empirically pinned in
            # tests/test_dac.py) is a sample-exactness contract the server
            # cannot check without running the decoder; it is asserted by
            # the pin test instead.
            emit_cap = _PoolJob.VOCODE_WIN - 2 * self.stream_margin
            if self.stream_margin <= 0 or emit_cap < 8:
                raise ValueError(
                    f"stream_margin={self.stream_margin} breaks pooled "
                    f"streaming: need 0 < margin <= "
                    f"{(_PoolJob.VOCODE_WIN - 8) // 2} so each "
                    f"{_PoolJob.VOCODE_WIN}-frame vocoder window emits "
                    f">= 8 frames (emit_cap={emit_cap})"
                )
        self._pool_jobs: dict = {}  # model name -> lazy _PoolJob
        self.queue: "queue.Queue[_Request]" = queue.Queue()
        self.metrics = Metrics()
        from collections import OrderedDict

        self._spk_cache: "OrderedDict[tuple, Any]" = OrderedDict()
        self._spk_lock = threading.Lock()
        self._req_counter = 0
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._worker_loop, daemon=True)

    # -- speaker cache (reference server.py:38-57) --------------------------

    SPK_CACHE_MAX = 256  # LRU bound: one [1,1,128] array per entry
    PREFIX_CACHE_MAX = 64  # LRU bound: one [1, 9, Lp] int32 array per entry

    def _cached(self, key: tuple, compute):
        """Shared LRU for speaker embeddings and prefix codes. One combined
        bound: both insertion paths must enforce the same limit, or one
        path evicts the other's entries far below its intended budget."""
        with self._spk_lock:
            if key in self._spk_cache:
                self._spk_cache.move_to_end(key)
                return self._spk_cache[key]
        val = compute()
        with self._spk_lock:
            self._spk_cache[key] = val
            while len(self._spk_cache) > self.SPK_CACHE_MAX + self.PREFIX_CACHE_MAX:
                self._spk_cache.popitem(last=False)
        return val

    def _speaker_embedding(self, src, model: str = "default"):
        """``src``: a server-side path (reference server.py:66-70 contract)
        or uploaded WAV ``bytes`` (the reference Gradio UI accepts uploads,
        gradio_interface.py:240-244) — upload entries cache by content
        digest."""
        if isinstance(src, bytes):
            key = (model, "spk-b64", hashlib.sha1(src).hexdigest())
            load = lambda: read_wav(io.BytesIO(src))
        else:
            key = (model, src)
            load = lambda: read_wav(src)

        def compute():
            wav, sr = load()
            return self.pipelines[model].make_speaker_embedding(wav, sr)

        return self._cached(key, compute)

    # -- audio-prefix cache (reference gradio_interface.py:153-159) ---------

    def _prefix_codes(self, src, model: str = "default"):
        """DAC-encode audio (server-side path or uploaded WAV bytes) for
        continuation. Cached like the speaker cache; each distinct prefix
        LENGTH compiles a fresh decode program (lengths are static shapes),
        so callers should reuse a stable set of prefix files."""
        if isinstance(src, bytes):
            key = ("prefix", model, "b64", hashlib.sha1(src).hexdigest())
            load = lambda: read_wav(io.BytesIO(src))
        else:
            key = ("prefix", model, src)
            load = lambda: read_wav(src)

        def compute():
            wav, sr = load()
            return self.pipelines[model].encode_audio(wav, sr)

        return self._cached(key, compute)

    # -- request processing (single-owner worker) ---------------------------

    def _parse(self, p: dict):
        """Payload -> parsed request dict, or an error response tuple."""
        text = p.get("text")
        if not text:
            return 400, "application/json", json.dumps(
                {"error": "Missing required field: text"}
            ).encode()
        model = p.get("model", "default")
        if model not in self.pipelines:
            return 400, "application/json", json.dumps(
                {"error": f"Unknown model: {model}",
                 "available": sorted(self.pipelines)}
            ).encode()
        speaker_path = p.get("speaker_audio_path")
        speaker_b64 = p.get("speaker_audio")  # base64 WAV upload
        # The reference /tts requires a speaker path (server.py:66-70); the
        # extended UI payload may omit it to use the learned uncond speaker
        # or carry the audio inline (upload parity with the reference Gradio
        # UI, gradio_interface.py:240-244).
        speaker = None
        if speaker_path:
            try:
                speaker = self._speaker_embedding(speaker_path, model)
            except FileNotFoundError:
                return 404, "application/json", json.dumps(
                    {"error": f"Speaker audio not found: {speaker_path}"}
                ).encode()
        elif speaker_b64:
            try:
                raw = base64.b64decode(speaker_b64, validate=True)
                speaker = self._speaker_embedding(raw, model)
                speaker_path = "b64:" + hashlib.sha1(raw).hexdigest()
            except Exception:
                return 400, "application/json", json.dumps(
                    {"error": "Invalid speaker_audio (expect base64 WAV)"}
                ).encode()
        elif not p.get(
            "allow_unconditional_speaker",
            # UI payloads may omit the speaker (the learned uncond speaker
            # vector serves). Keyed on the explicit ``ui`` marker the web
            # UI always sends (ADVICE r4: gating ``emotion`` out of the
            # payload for emotion-less models must not re-require a
            # speaker); ``emotion`` presence stays a legacy marker for
            # pre-marker clients.
            bool(p.get("ui")) or "emotion" in p,
        ):
            # Bare reference-contract request without a speaker -> 400, same
            # as the reference (server.py:66-70).
            return 400, "application/json", json.dumps(
                {"error": "Missing required field: speaker_audio_path"}
            ).encode()

        prefix_path = p.get("prefix_audio_path")
        prefix_b64 = p.get("prefix_audio")  # base64 WAV upload
        prefix_codes = None
        if prefix_path:
            try:
                prefix_codes = self._prefix_codes(prefix_path, model)
            except FileNotFoundError:
                return 404, "application/json", json.dumps(
                    {"error": f"Prefix audio not found: {prefix_path}"}
                ).encode()
        elif prefix_b64:
            try:
                raw = base64.b64decode(prefix_b64, validate=True)
                prefix_codes = self._prefix_codes(raw, model)
                prefix_path = "b64:" + hashlib.sha1(raw).hexdigest()
            except Exception:
                return 400, "application/json", json.dumps(
                    {"error": "Invalid prefix_audio (expect base64 WAV)"}
                ).encode()

        uncond = tuple(sorted(p.get("unconditional_keys", DEFAULT_UNCONDITIONAL)))
        cond_kwargs: dict = {
            "text": text,
            "language": p.get("language", "en-us"),
            "speaker": speaker,
            "speaking_rate": float(p.get("speaking_rate", 15.0)),
            "unconditional_keys": uncond,
        }
        for k in ("emotion", "vqscore_8"):
            if p.get(k) is not None:
                cond_kwargs[k] = [float(x) for x in p[k]]
        for k in ("fmax", "pitch_std", "dnsmos_ovrl", "ctc_loss"):
            if p.get(k) is not None:
                cond_kwargs[k] = float(p[k])
        if p.get("speaker_noised") is not None:
            cond_kwargs["speaker_noised"] = bool(p["speaker_noised"])

        sampling = DEFAULT_SAMPLING
        if isinstance(p.get("sampling"), dict):
            _int_knobs = ("top_k", "repetition_penalty_window")
            sampling = SamplingParams.from_dict(
                {k: (int(v) if k in _int_knobs else float(v))
                 for k, v in p["sampling"].items()}
            )
        mnt = int(p.get("max_new_tokens", 86 * 30))
        return {
            "cond_kwargs": cond_kwargs,
            "sampling": sampling,
            "cfg_scale": float(p.get("cfg_scale", 2.0)),
            "max_new_tokens": mnt,
            "stream": bool(p.get("stream", False)),
            "model": model,
            "seed": int(p.get("seed", self.seed)),
            "prefix_codes": prefix_codes,
            # Batching compatibility key: requests in one decode call must
            # share model / uncond pattern / speaker presence / sampling /
            # cfg. An EXPLICIT seed also isolates the group — the batch
            # shares one PRNG key, so reproducibility only holds when the
            # seeded request decodes alone (or with same-seed peers).
            # A prefix-audio path also keys the group: rows of one decode
            # share the prefix shape, so only same-prefix requests batch.
            "group": (model, uncond, speaker is not None, sampling,
                      float(p.get("cfg_scale", 2.0)),
                      int(p["seed"]) if "seed" in p else None,
                      prefix_path or None),
        }

    @staticmethod
    def _bucket(n: int, buckets=(215, 430, 860, 1290, 2580)) -> int:
        for b in buckets:
            if n <= b:
                return b
        return n

    @staticmethod
    def _cond_bucket(n: int, buckets=(32, 64, 128, 256, 512)) -> int:
        """Phoneme-length bucket. The decode loop is compiled per
        conditioning length — without bucketing, every distinct text length
        costs a full recompile. LEFT-padding with PAD to the bucket matches
        the reference's own batching semantics (conditioning.py:163-168:
        items are left-padded to the batch max and pads are attended to)."""
        for b in buckets:
            if n <= b:
                return b
        return n

    def _start_decode_job(self, reqs: list[_Request], parsed: list[dict]):
        """Prepare a non-streaming group as a segment-advanceable job
        (reference serves one request at a time AND to completion,
        SURVEY.md §3.3; batching is the DP win, segment interleaving the
        latency win — a 30 s generation no longer head-of-line-blocks
        short requests for its full duration)."""
        pipe = self.pipelines[parsed[0]["model"]]
        conds = [pipe.make_cond_dict(**r["cond_kwargs"]) for r in parsed]
        pad_len = self._cond_bucket(
            max(int(c["espeak"].shape[1]) for c in conds)
        )
        cond = pipe.merge_cond_dicts(conds, pad_len=pad_len)
        mnt = self._bucket(max(r["max_new_tokens"] for r in parsed))
        self._req_counter += 1
        key = jax.random.fold_in(
            jax.random.key(parsed[0]["seed"]), self._req_counter
        )
        prefix = parsed[0]["prefix_codes"]
        if prefix is not None and len(reqs) > 1:
            prefix = jnp.tile(prefix, (len(reqs), 1, 1))
        t0 = time.monotonic()
        with tracing.phase("conditioning"):
            prefix_cond = pipe.prepare_conditioning(cond)
        it = pipe.engine.generate_stream(
            pipe.params, prefix_cond, prefix, key=key,
            max_new_tokens=mnt, cfg_scale=parsed[0]["cfg_scale"],
            sampling_params=parsed[0]["sampling"],
            chunk_steps=self.segment_steps,
        )
        return _DecodeJob(self, reqs, parsed, pipe, it, prefix,
                          time.monotonic() - t0)

    def _finish_decode_job(self, job: "_DecodeJob") -> None:
        """Vocode the finished group and respond per row (per-row EOS
        trim; valid frames cover replayed prefix + continuation)."""
        pipe, reqs, parsed = job.pipe, job.reqs, job.parsed
        t0 = time.monotonic()
        result = job.result
        wavs = pipe.decode_audio(result)  # [B, samples]
        job.compute_s += time.monotonic() - t0
        valid_rows = (
            [int(v) for v in result.valid_lengths]
            if result.valid_lengths is not None
            else [int(result.valid_length)] * len(reqs)
        )
        sr = pipe.dac.sampling_rate
        hop = pipe.dac.hop
        audio_total = 0.0
        delivered_frames = []
        prefix_frames = (
            int(job.prefix.shape[-1]) if job.prefix is not None else 0
        )
        for i, (req, r) in enumerate(zip(reqs, parsed)):
            frames = min(valid_rows[i], r["max_new_tokens"] + prefix_frames)
            delivered_frames.append(frames)
            wav = wavs[i, : frames * hop]
            audio_total += wav.shape[-1] / sr
            req.response = (200, "audio/wav", wav_bytes(wav, sr))
            req.done.set()
        with self.metrics.lock:
            self.metrics.audio_seconds_total += audio_total
            self.metrics.compute_seconds_total += job.compute_s
            self.metrics.batched_requests += len(reqs) - 1 if len(reqs) > 1 else 0
        tracing.add_counter("audio_seconds", audio_total)
        tracing.log_event(
            "tts_group_done", batch=len(reqs), frames=delivered_frames,
            compute_s=round(job.compute_s, 3), audio_s=round(audio_total, 3),
        )

    def warmup(self, combos: list[tuple] | None = None) -> int:
        """Precompile decode programs for representative request shapes
        before serving (the TPU-native stand-in for the reference's CUDA
        Graph warmup, model.py:145-179: XLA compiles once per static
        signature; here we pay that cost at startup, not on the first
        request). Each combo is ``(batch, cond_bucket, mnt_bucket,
        with_speaker)``; a combo runs one real generate on dummy
        conditioning, so cost = compile + one decode. Pair with
        :func:`enable_persistent_compilation_cache` so restarts reuse the
        compiled programs from disk. Returns the number of combos run."""
        if combos is None:
            # Match the DEFAULT request: mnt 86*30 -> bucket 2580, typical
            # sentence -> cond bucket 64, with + without a speaker path.
            combos = [(1, 64, self._bucket(86 * 30), True),
                      (1, 64, self._bucket(86 * 30), False)]
        uncond = tuple(sorted(DEFAULT_UNCONDITIONAL))
        n = 0
        for pipe in self.pipelines.values():
            has_speaker = any(
                sp.name == "speaker"
                for sp in pipe.model.prefix_conditioner.specs
            )
            for batch, cond_len, mnt, with_speaker in combos:
                if with_speaker and not has_speaker:
                    continue
                speaker = (
                    jnp.zeros(pipe.speaker_shape(), jnp.bfloat16)
                    if with_speaker else None
                )
                conds = [
                    pipe.make_cond_dict(
                        text="warm", speaker=speaker,
                        unconditional_keys=uncond,
                    )
                    for _ in range(batch)
                ]
                cond = pipe.merge_cond_dicts(conds, pad_len=cond_len)
                # Warm the SEGMENT path (prefill_jit + decode_segment_jit)
                # — what the scheduler actually runs — by generating via
                # the between-segments callback hook.
                pipe.generate(
                    cond, key=jax.random.key(0), cfg_scale=2.0,
                    max_new_tokens=mnt, sampling_params=DEFAULT_SAMPLING,
                    callback=lambda *a: True,
                    callback_interval=self.segment_steps,
                )
                n += 1
        return n

    def _start_stream_job(self, req: _Request, r: dict) -> "_StreamJob":
        """Streaming request as a job: each scheduler slice vocodes and
        ships one chunk; pacing is the caller's playback clock."""
        assert req.stream_q is not None
        pipe = self.pipelines[r["model"]]
        conds = [pipe.make_cond_dict(**r["cond_kwargs"])]
        pad_len = self._cond_bucket(int(conds[0]["espeak"].shape[1]))
        cond = pipe.merge_cond_dicts(conds, pad_len=pad_len)
        mnt = self._bucket(r["max_new_tokens"])
        self._req_counter += 1
        key = jax.random.fold_in(
            jax.random.key(r["seed"]), self._req_counter
        )
        hop = pipe.dac.hop
        prefix = r["prefix_codes"]
        prefix_frames = int(prefix.shape[-1]) if prefix is not None else 0
        budget = (r["max_new_tokens"] + prefix_frames) * hop
        gen = pipe.generate_stream(
            cond, prefix, key=key, cfg_scale=r["cfg_scale"],
            max_new_tokens=mnt, sampling_params=r["sampling"],
            chunk_frames=self.segment_steps,
            margin_frames=self.stream_margin,
        )
        return _StreamJob(self, req, pipe, gen, budget)

    def _drain_batch(self, block: bool = True) -> list[_Request]:
        """Gather up to max_batch queued requests. When ``block`` (worker
        idle) wait for the first request then hold a short batching window;
        when jobs are active, poll without delaying the scheduler."""
        try:
            first = self.queue.get(timeout=0.2 if block else 0.0)
        except queue.Empty:
            return []
        batch = [first]
        if not block:
            while len(batch) < self.max_batch:
                try:
                    batch.append(self.queue.get_nowait())
                except queue.Empty:
                    break
            return batch
        deadline = time.monotonic() + self.batch_window_s
        while len(batch) < self.max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                batch.append(self.queue.get(timeout=remaining))
            except queue.Empty:
                break
        return batch

    def _admit(self, jobs: list) -> None:
        """Parse + group queued requests into new jobs (bounded by
        max_active_jobs)."""
        with self.metrics.lock:
            self.metrics.queue_depth = self.queue.qsize()
        if len(jobs) >= self.max_active_jobs:
            return
        batch = self._drain_batch(block=not jobs)
        if not batch:
            return

        live: list[_Request] = []
        parsed: list[dict] = []
        for req in batch:
            if time.monotonic() - req.enqueued_at > self.request_timeout_s:
                timed_out = (503, "application/json",
                             json.dumps({"error": "Request timed out in queue"}).encode())
                if req.stream_q is not None:
                    req.stream_q.put(("error", timed_out))
                    req.stream_q.put(None)
                else:
                    req.response = timed_out
                    req.done.set()
                continue
            try:
                out = self._parse(req.payload)
            except Exception as e:  # noqa: BLE001 — boundary
                out = (500, "application/json",
                       json.dumps({"error": f"Bad request: {e}"}).encode())
            if isinstance(out, tuple):
                if req.stream_q is not None:
                    req.stream_q.put(("error", out))
                    req.stream_q.put(None)
                else:
                    req.response = out
                    req.done.set()
            elif req.stream_q is not None:
                # Streaming requests join the pool too (VERDICT r2 #2):
                # a pooled row emits incremental chunks from the shared
                # step, so staggered streams amortize the weight read
                # instead of each paying it solo. Pool-full or ineligible
                # falls back to the solo stream job.
                admitted = False
                if self.pooled and self._pool_eligible(out):
                    try:
                        admitted = self._pool_admit(req, out, jobs)
                    except Exception as e:  # noqa: BLE001 — boundary
                        tracing.log_event("pool_admit_failed",
                                          error=repr(e)[:120])
                        with self.metrics.lock:
                            self.metrics.pool_admit_failures += 1
                        admitted = False
                if admitted:
                    continue
                try:
                    jobs.append(self._start_stream_job(req, out))
                except Exception as e:  # noqa: BLE001 — boundary
                    req.stream_q.put(("error", (500, "application/json",
                                     json.dumps({"error": f"TTS stream failed: {e}"}).encode())))
                    req.stream_q.put(None)
            else:
                live.append(req)
                parsed.append(out)

        if self.pooled:
            leftover_live, leftover_parsed = [], []
            for req, r in zip(live, parsed):
                try:
                    admitted = self._pool_eligible(r) and self._pool_admit(
                        req, r, jobs
                    )
                except Exception as e:  # noqa: BLE001 — boundary: job path works
                    tracing.log_event("pool_admit_failed", error=repr(e)[:120])
                    with self.metrics.lock:
                        self.metrics.pool_admit_failures += 1
                    admitted = False
                if not admitted:
                    leftover_live.append(req)
                    leftover_parsed.append(r)
            live, parsed = leftover_live, leftover_parsed

        groups: dict[tuple, list[int]] = {}
        for i, r in enumerate(parsed):
            groups.setdefault(r["group"], []).append(i)
        for idxs in groups.values():
            reqs_g = [live[i] for i in idxs]
            if len(jobs) >= self.max_active_jobs:
                # Drained more distinct groups than job slots: back to the
                # queue (enqueued_at is preserved, so queue timeouts still
                # apply) — max_active_jobs is a hard concurrency/HBM bound.
                for req in reqs_g:
                    self.queue.put(req)
                continue
            parsed_g = [parsed[i] for i in idxs]
            try:
                jobs.append(self._start_decode_job(reqs_g, parsed_g))
            except Exception as e:  # noqa: BLE001 — boundary
                self._replay_or_fail(reqs_g, e)

    def _replay_or_fail(self, reqs: list[_Request], e: Exception) -> None:
        """Reference loses a mid-generation request (SURVEY.md §5.3);
        re-enqueue for a fresh decode up to max_retries, then 500."""
        for req in reqs:
            if req.retries < self.max_retries:
                req.retries += 1
                with self.metrics.lock:
                    self.metrics.replayed_requests += 1
                self.queue.put(req)
            else:
                with self.metrics.lock:
                    self.metrics.errors_total += 1
                req.response = (500, "application/json",
                                json.dumps({"error": f"TTS generation failed: {e}"}).encode())
                req.done.set()

    def _worker_loop(self):
        """Single-owner scheduler: admit queued requests as jobs, then
        round-robin — each slice advances ONE job by one compiled decode
        segment (~segment_steps frames). Short requests finish in a few
        slices even while a 30 s generation is in flight (the reference,
        and a naive queue, would block them for its full duration)."""
        jobs: list = []
        while not self._stop.is_set():
            self._admit(jobs)
            if not jobs:
                continue
            job = jobs.pop(0)
            try:
                done = job.advance()
            except Exception as e:  # noqa: BLE001 — boundary: replay/500
                job.fail(e)
                continue
            if done:
                try:
                    job.finish()
                except Exception as e:  # noqa: BLE001 — boundary
                    job.fail(e)
            else:
                jobs.append(job)

    # -- continuous-batching pool (engine/pool.py) --------------------------

    def _pool_eligible(self, r: dict) -> bool:
        """Sampling/cfg knobs are per-row RUNTIME values in the pooled step
        (ops/sampling.sample_from_logits_dyn), so any cfg_scale and any
        sampling config whose repetition window fits the compiled bound is
        admissible, audio-prefix continuations included (the prefix only
        shifts the row's join position). Any served model qualifies — each
        pipeline (transformer or hybrid) gets its own pool; streaming rows
        emit incremental chunks from the shared step. Only over-ceiling
        generations and over-window knobs take the regular job path."""
        from ..engine.pool import PoolConfig

        prefix_frames = (
            int(r["prefix_codes"].shape[-1])
            if r["prefix_codes"] is not None else 0
        )
        return (
            r["model"] in self.pipelines
            and r["sampling"].repetition_penalty_window
            <= PoolConfig.max_rep_window
            and prefix_frames + r["max_new_tokens"]
            <= PoolConfig.max_new_tokens
        )

    def _pool_admit(self, req: _Request, r: dict, jobs: list) -> bool:
        """Prefill + join into a free slot of the request's model's pool;
        returns False when that pool is full (caller falls back to the job
        path)."""
        name = r["model"]
        if name not in self._pool_jobs:
            self._pool_jobs[name] = _PoolJob(self, name)
        return self._pool_jobs[name].admit(req, r, jobs)

    # -- HTTP plumbing ------------------------------------------------------

    def handle_tts(self, payload: dict) -> tuple[int, str, bytes]:
        req = _Request(payload)
        with self.metrics.lock:
            self.metrics.requests_total += 1
        self.queue.put(req)
        if not req.done.wait(self.request_timeout_s + 5):
            return 504, "application/json", json.dumps(
                {"error": "Deadline exceeded"}
            ).encode()
        return req.response

    def handle_tts_stream(self, payload: dict) -> _Request:
        req = _Request(payload, stream_q=queue.Queue())
        with self.metrics.lock:
            self.metrics.requests_total += 1
        self.queue.put(req)
        return req

    def make_handler(server_self):
        class Handler(BaseHTTPRequestHandler):
            # Chunked transfer (streaming /tts) is only defined for
            # HTTP/1.1; the BaseHTTPRequestHandler default is 1.0, under
            # which conforming clients would read chunk framing as PCM.
            protocol_version = "HTTP/1.1"

            def log_message(self, fmt, *args):  # quiet
                pass

            def _send(self, status, ctype, body: bytes):
                self.send_response(status)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path in ("/", "/index.html"):
                    from .webui import index_html

                    self._send(200, "text/html; charset=utf-8", index_html())
                elif self.path == "/model-info":
                    # Conditioner roster for the UI's dynamic show/hide
                    # (reference update_ui, gradio_interface.py:31-82) +
                    # the model selector list (gradio_interface.py:206-217).
                    info = {
                        "models": sorted(server_self.pipelines),
                        "conditioners": [
                            s.name for s in server_self.pipeline
                            .model.prefix_conditioner.specs
                        ],
                        "conditioners_by_model": {
                            name: [s.name for s in
                                   p.model.prefix_conditioner.specs]
                            for name, p in server_self.pipelines.items()
                        },
                    }
                    self._send(200, "application/json",
                               json.dumps(info).encode())
                elif self.path == "/healthz":
                    mon = server_self.monitor
                    if mon is not None and not mon.healthy:
                        self._send(503, "application/json",
                                   b'{"status":"unhealthy","reason":"heartbeat failed"}')
                    else:
                        self._send(200, "application/json", b'{"status":"ok"}')
                elif self.path == "/metrics":
                    snap = server_self.metrics.snapshot()
                    snap["phases"] = tracing.timings_snapshot()
                    self._send(200, "application/json",
                               json.dumps(snap).encode())
                else:
                    self._send(404, "application/json", b'{"error":"not found"}')

            def _send_chunk(self, data: bytes):
                self.wfile.write(f"{len(data):X}\r\n".encode())
                self.wfile.write(data)
                self.wfile.write(b"\r\n")

            def _stream(self, req):
                """Chunked-transfer WAV stream; aborting the connection
                stops consumption (the reference callback's return-False
                abort, model.py:306-307)."""
                timeout = server_self.request_timeout_s + 5
                try:
                    first = req.stream_q.get(timeout=timeout)
                except queue.Empty:
                    req.cancelled.set()  # never generate for a dead client
                    self._send(504, "application/json",
                               b'{"error":"Deadline exceeded"}')
                    return
                if isinstance(first, tuple) and first and first[0] == "error":
                    self._send(*first[1])
                    return
                if first is None:
                    self._send(500, "application/json", b'{"error":"empty stream"}')
                    return
                self.send_response(200)
                self.send_header("Content-Type", "audio/wav")
                self.send_header("Transfer-Encoding", "chunked")
                self.end_headers()
                sr = server_self.pipeline.dac.sampling_rate
                try:
                    self._send_chunk(wav_stream_header(sr))
                    item = first
                    while item is not None:
                        if isinstance(item, bytes):
                            self._send_chunk(item)
                        item = req.stream_q.get(timeout=timeout)
                    self.wfile.write(b"0\r\n\r\n")
                except (BrokenPipeError, ConnectionResetError, queue.Empty):
                    req.cancelled.set()  # stop the worker's decode

            def do_POST(self):
                if self.path != "/tts":
                    self._send(404, "application/json", b'{"error":"not found"}')
                    return
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    payload = json.loads(self.rfile.read(n) or b"{}")
                except (ValueError, json.JSONDecodeError):
                    self._send(400, "application/json", b'{"error":"invalid JSON"}')
                    return
                if payload.get("stream"):
                    self._stream(server_self.handle_tts_stream(payload))
                    return
                status, ctype, body = server_self.handle_tts(payload)
                self._send(status, ctype, body)

        return Handler

    def serve_forever(self):
        self._worker.start()
        httpd = ThreadingHTTPServer((self.host, self.port), self.make_handler())
        self._httpd = httpd
        httpd.serve_forever()

    def start_background(self):
        self._worker.start()
        httpd = ThreadingHTTPServer((self.host, self.port), self.make_handler())
        self._httpd = httpd
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        return t

    def shutdown(self, join_timeout_s: float = 120.0):
        self._stop.set()
        if hasattr(self, "_httpd"):
            self._httpd.shutdown()
            self._httpd.server_close()  # release the listening socket
            # (shutdown() alone leaves it open — port collisions for the
            # next server on the same port in one process, e.g. tests)
        # JOIN the scheduler thread before returning: a daemon thread still
        # blocked inside a device call (axon RPC) at interpreter teardown
        # dies by pthread cancellation inside the C++ runtime —
        # "terminate called ... FATAL: exception not rethrown" at exit
        # (observed in the round-3 pooled-TTFA bench stderr). The worker
        # polls the queue at <=0.2 s, so it exits within one job segment.
        if self._worker.is_alive():
            self._worker.join(timeout=join_timeout_s)


def main() -> None:
    """Production server entrypoint (reference runs Flask dev server,
    server.py:176). Random-inits flagship topology when no checkpoint is
    given, so the full serving stack is drivable anywhere."""
    import argparse

    ap = argparse.ArgumentParser(description="zonos-tpu TTS server")
    ap.add_argument("--config", default=None, help="checkpoint config.json")
    ap.add_argument("--weights", default=None, help="model.safetensors")
    ap.add_argument("--hybrid-config", default=None,
                    help="optional second checkpoint served as model=hybrid")
    ap.add_argument("--hybrid-weights", default=None)
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=5000)
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument("--batch-window-ms", type=float, default=50.0)
    ap.add_argument("--warmup", action="store_true",
                    help="precompile default request shapes before serving")
    ap.add_argument("--int8", action="store_true",
                    help="int8 weight-only backbone (1.6x decode speedup)")
    ap.add_argument("--int4-mlp", action="store_true",
                    help="experimental: MLP weights as int4 (attention and "
                         "heads stay int8) — more decode bandwidth headroom "
                         "at a measurable quality cost")
    ap.add_argument("--compilation-cache", default=None, metavar="DIR",
                    help="persistent XLA compilation cache directory")
    ap.add_argument("--heartbeat-interval-s", type=float, default=0.0,
                    help="enable mesh heartbeat monitor (0 = off)")
    ap.add_argument("--pooled", action="store_true",
                    help="continuous batching: staggered default-config "
                         "requests share one decode pool (engine/pool.py)")
    ap.add_argument("--pool-slots", type=int, default=4)
    ap.add_argument("--pool-kv-int8", action="store_true",
                    help="store pooled KV prefixes as int8 + per-token "
                         "scales (transformer pools; halves the cache read)")
    ap.add_argument("--pool-state-bf16", action="store_true",
                    help="store pooled Mamba SSM state as bf16, fp32 "
                         "compute (hybrid pools; halves the state "
                         "read+write — the dominant pooled-step stream)")
    args = ap.parse_args()

    from ..pipeline import ZonosPipeline
    from ..utils import enable_persistent_compilation_cache

    if args.compilation_cache:
        enable_persistent_compilation_cache(args.compilation_cache)

    if args.config and args.weights:
        pipeline = ZonosPipeline.from_local(args.config, args.weights)
    else:
        from ..config import ZONOS_V01_TRANSFORMER

        tracing.log_event("server_random_init",
                          reason="no checkpoint given")
        pipeline = ZonosPipeline.from_config(ZONOS_V01_TRANSFORMER)
    extra = None
    if args.hybrid_config and args.hybrid_weights:
        extra = {"hybrid": ZonosPipeline.from_local(
            args.hybrid_config, args.hybrid_weights)}
    if args.int4_mlp:
        pipeline.quantize_int4(mixed=True)
        for p in (extra or {}).values():
            p.quantize_int4(mixed=True)
    elif args.int8:
        pipeline.quantize_int8()
        for p in (extra or {}).values():
            p.quantize_int8()

    monitor = None
    if args.heartbeat_interval_s > 0:
        from ..config import MeshConfig
        from ..parallel.multihost import Heartbeat, HeartbeatMonitor
        from ..parallel.sharding import make_mesh

        mesh = make_mesh(MeshConfig(data=len(jax.devices())))
        monitor = HeartbeatMonitor(
            Heartbeat(mesh).probe, interval_s=args.heartbeat_interval_s,
            on_failure=lambda r: tracing.log_event("heartbeat_failure",
                                                   reason=r),
        ).start()

    srv = TTSServer(
        pipeline, host=args.host, port=args.port, max_batch=args.max_batch,
        batch_window_s=args.batch_window_ms / 1000.0, monitor=monitor,
        extra_pipelines=extra, pooled=args.pooled, pool_slots=args.pool_slots,
        pool_kv_int8=args.pool_kv_int8,
        pool_state_bf16=args.pool_state_bf16,
    )
    if args.warmup:
        tracing.log_event("warmup_start")
        n = srv.warmup()
        tracing.log_event("warmup_done", combos=n)
    tracing.log_event("server_listening", host=args.host, port=args.port)
    srv.serve_forever()


if __name__ == "__main__":
    main()

class _DecodeJob:
    """Non-streaming group: one engine segment per advance; vocode +
    respond at finish."""

    def __init__(self, srv, reqs, parsed, pipe, it, prefix, setup_s):
        self.srv, self.reqs, self.parsed = srv, reqs, parsed
        self.pipe, self.it, self.prefix = pipe, it, prefix
        self.result = None
        self.compute_s = setup_s

    def advance(self) -> bool:
        t0 = time.monotonic()
        try:
            with tracing.phase("generate"):
                self.result = next(self.it)
            return False
        except StopIteration:
            return True
        finally:
            self.compute_s += time.monotonic() - t0

    def finish(self) -> None:
        self.srv._finish_decode_job(self)

    def fail(self, e: Exception) -> None:
        self.srv._replay_or_fail(self.reqs, e)


class _StreamJob:
    """Streaming request: one vocoded chunk per advance, shipped to the
    HTTP thread's chunk queue; budget-trimmed; ends with a None sentinel."""

    def __init__(self, srv, req, pipe, gen, budget):
        self.srv, self.req, self.pipe = srv, req, pipe
        self.gen, self.budget, self.sent = gen, budget, 0

    def advance(self) -> bool:
        if self.req.cancelled.is_set():
            return True  # client went away — stop decoding
        t0 = time.monotonic()
        try:
            chunk = next(self.gen)
        except StopIteration:
            return True
        finally:
            with self.srv.metrics.lock:
                self.srv.metrics.compute_seconds_total += time.monotonic() - t0
        pcm = chunk[0]
        take = min(self.budget - self.sent, pcm.shape[-1])
        if take <= 0:
            return True
        data = (np.clip(pcm[:take], -1.0, 1.0) * 32767.0).astype(np.int16)
        self.req.stream_q.put(data.tobytes())
        self.sent += take
        return False

    def finish(self) -> None:
        with self.srv.metrics.lock:
            self.srv.metrics.audio_seconds_total += (
                self.sent / self.pipe.dac.sampling_rate
            )
        self.req.stream_q.put(None)

    def fail(self, e: Exception) -> None:
        with self.srv.metrics.lock:
            self.srv.metrics.errors_total += 1
        self.req.stream_q.put(("error", (500, "application/json",
                              json.dumps({"error": f"TTS stream failed: {e}"}).encode())))
        self.req.stream_q.put(None)



class _PoolJob:
    """Continuous-batching pool as a perpetual scheduler job: admitted
    requests prefill solo and join a slot; every advance() steps the pool
    one segment and finalizes rows whose EOS cascade completed. Stays in
    the job list while any row is active, so it round-robins with regular
    jobs."""

    def __init__(self, srv: TTSServer, model_name: str = "default"):
        from ..engine import pool as plib

        self.srv = srv
        self.plib = plib
        self.pipe = srv.pipelines[model_name]
        self.pc = plib.PoolConfig(slots=srv.pool_slots)
        # int8 KV is a transformer-cache feature; hybrid pipelines keep
        # exact caches (their Mamba state has no quantized path).
        self.kv_int8 = bool(
            srv.pool_kv_int8 and not self.pipe.model.config.backbone.is_hybrid
        )
        # bf16 SSM state is the hybrid-cache analogue of int8 KV.
        self.state_bf16 = bool(
            srv.pool_state_bf16 and self.pipe.model.config.backbone.is_hybrid
        )
        self.pool = self._fresh_pool()
        self.base_key = jax.random.key(srv.seed)
        self.rows: dict[int, tuple] = {}  # slot -> (req, parsed, t0)
        self.scheduled = False
        self._emit_fn = None  # lazy jitted make_pool_emit program

    def _fresh_pool(self):
        # Cache dtype follows the ACTIVATION dtype (bf16 for real
        # checkpoints, fp32 in CPU tests). Derive it from the
        # prefix-conditioner subtree — the whole-params first leaf is an
        # fp32 quantization SCALE on int8/int4 pipelines, which allocated
        # an fp32 pool no bf16 request cache could splice into (every
        # admit failed -> jobs path, pooled_requests stayed 0).
        emb0 = jax.tree_util.tree_leaves(
            self.pipe.params["prefix_conditioner"]
        )[0]
        return self.plib.make_pool(self.pipe.model, self.pc, emb0.dtype,
                                   kv_int8=self.kv_int8,
                                   state_bf16=self.state_bf16)

    def admit(self, req: _Request, r: dict, jobs: list) -> bool:
        slot = next(
            (i for i in range(self.pc.slots) if i not in self.rows), None
        )
        if slot is None:
            return False
        t0 = time.monotonic()
        queue_wait = t0 - req.enqueued_at
        pipe = self.pipe
        cd = pipe.make_cond_dict(**r["cond_kwargs"])
        pad_len = self.srv._cond_bucket(int(cd["espeak"].shape[1]))
        if pad_len > self.pc.max_cond_len:
            return False  # longer than the pool geometry -> job path
        cond = pipe.merge_cond_dicts([cd], pad_len=pad_len)
        t1 = time.monotonic()
        prefix_cond = pipe.prepare_conditioning(cond)
        t2 = time.monotonic()
        self.srv._req_counter += 1
        key = jax.random.fold_in(
            jax.random.key(r["seed"]), self.srv._req_counter
        )
        prefix = r["prefix_codes"]
        prefix_frames = int(prefix.shape[-1]) if prefix is not None else 0
        # Prefill with the REQUEST's (bucketed) budget so short requests
        # free their slot early instead of decoding to the pool ceiling.
        mnt = min(self.srv._bucket(r["max_new_tokens"]),
                  self.pc.max_new_tokens - prefix_frames)
        req_state, knobs = self.plib.prefill_request(
            pipe.model, pipe.params, prefix_cond, key,
            mnt, r["cfg_scale"], r["sampling"],
            kv_int8=self.kv_int8, state_bf16=self.state_bf16,
            audio_prefix_codes=prefix,
        )
        t3 = time.monotonic()
        row_seed = (r["seed"] * 1000003 + self.srv._req_counter) % (2 ** 31)
        self.pool = self.plib.join(
            self.pool, req_state, slot, prefix_cond.shape[1], row_seed, knobs
        )
        t4 = time.monotonic()
        self.rows[slot] = {"req": req, "r": r, "t0": t0,
                           "emitted": 0, "sent": 0}
        with self.srv.metrics.lock:
            self.srv.metrics.pool_admitted += 1
        # TTFA budget instrumentation (VERDICT r4 #1): every admission
        # phase is an ASYNC dispatch (no device_get) — nonzero times here
        # are host work (phonemize) + per-program dispatch RPCs on the
        # remote-TPU tunnel, not device compute.
        tracing.log_event(
            "pool_admit_budget", slot=slot,
            queue_wait_ms=round(queue_wait * 1000, 1),
            cond_ms=round((t1 - t0) * 1000, 1),
            prep_dispatch_ms=round((t2 - t1) * 1000, 1),
            prefill_dispatch_ms=round((t3 - t2) * 1000, 1),
            join_dispatch_ms=round((t4 - t3) * 1000, 1),
        )
        if not self.scheduled:
            jobs.append(self)
            self.scheduled = True
        return True

    # Withheld right-margin frames for streaming rows (matches
    # pipeline.generate_stream: the DAC decoder is non-causal, so emitted
    # samples always sit >= margin code frames from a synthetic edge —
    # concatenated chunks equal the one-shot vocode of the same codes).
    # Server-configurable (TTSServer stream_margin); class attr is the
    # conservative default.
    STREAM_MARGIN = 32

    @property
    def _margin(self) -> int:
        return getattr(self.srv, "stream_margin", self.STREAM_MARGIN)
    # ONE compiled vocoder shape for pooled streaming. The previous
    # variable-size windows compiled a NEW DAC program per window length
    # (~2.4 s each over the remote-TPU tunnel) during every stream's
    # ramp-up — serialized in the single-owner scheduler, those compiles
    # were the dominant term of multi-stream pooled TTFA (round-3/4 bench).
    # Must satisfy VOCODE_WIN >= segment_steps + 2 * STREAM_MARGIN.
    VOCODE_WIN = 128

    def _vocode_span(self, codes, start: int, end: int, avail: int):
        """Vocode code frames [start, end) with >= STREAM_MARGIN frames of
        context on both sides, using FIXED-size windows (zero-code padded
        past ``avail`` — identical to the one-shot path's bucket zero-pad,
        so streamed chunks still concatenate to the one-shot vocode of the
        same codes away from the final margin). Spans longer than one
        window's emit capacity loop over several fixed windows."""
        hop = self.pipe.dac.hop
        m = self._margin
        W = self.VOCODE_WIN
        emit_cap = W - 2 * m
        out = []
        s = start
        while s < end:
            e = min(end, s + emit_cap)
            c1 = min(avail, e + m)
            c0 = max(0, c1 - W)
            win = np.zeros((codes.shape[0], W), np.int32)
            win[:, : c1 - c0] = np.asarray(codes[:, c0:c1])
            wav = self.pipe._decode_jit(
                self.pipe.dac_params, jnp.asarray(win[None])
            )
            wav = np.asarray(wav[0, 0, :], np.float32)
            off = (s - c0) * hop
            out.append(wav[off: off + (e - s) * hop])
            s = e
        return out[0] if len(out) == 1 else np.concatenate(out)

    def _stream_progress(self, slot: int, final: bool, pre=None) -> None:
        """Emit a streaming row's newly-final frames as a PCM chunk (host
        fallback path — steady-state emission rides the fused device emit
        program in :meth:`advance`; this covers final spans longer than one
        emit window). ``pre``: (codes, valid) prefetched by advance()'s
        batched barrier; codes may be None when the caller knows no vocode
        is needed (valid already emitted)."""
        row = self.rows[slot]
        req, r = row["req"], row["r"]
        codes, valid = (
            pre if pre is not None
            else self.plib.extract_row(self.pipe.model, self.pool, slot)
        )
        prefix_frames = (
            int(r["prefix_codes"].shape[-1])
            if r["prefix_codes"] is not None else 0
        )
        valid = min(valid, r["max_new_tokens"] + prefix_frames)
        stable = valid if final else max(0, valid - self._margin)
        if stable > row["emitted"]:
            if codes is None:  # pre carried only the counter
                codes, _ = self.plib.extract_row(
                    self.pipe.model, self.pool, slot
                )
            pcm = self._vocode_span(codes, row["emitted"], stable, valid)
            data = (np.clip(pcm, -1.0, 1.0) * 32767.0).astype(np.int16)
            req.stream_q.put(data.tobytes())
            row["emitted"] = stable
            row["sent"] += pcm.shape[-1]

    @property
    def _emit(self):
        """Jitted fused emit program (engine/pool.make_pool_emit),
        compiled once per pool job (margin and window are fixed per
        server)."""
        if self._emit_fn is None:
            self._emit_fn = jax.jit(self.plib.make_pool_emit(
                self.pipe.model, self.pipe.dac.model, self._margin,
                self.VOCODE_WIN,
            ))
        return self._emit_fn

    def advance(self) -> bool:
        t0 = time.monotonic()
        # Sort-bearing sampling stages (top-p/top-k) compile into the step
        # only while some active row needs them (~2 ms/step of XLA sort at
        # 8 slots otherwise); both variants hit the jit cache after their
        # first segment.
        needs_sort = any(
            row["r"]["sampling"].top_p > 0 or row["r"]["sampling"].top_k > 0
            for row in self.rows.values()
        )
        self.pool = self.plib.pool_steps_jit(
            self.pipe.model, self.pipe.params, self.pool, self.base_key,
            self.srv.segment_steps, sorted_sampler=needs_sort,
        )
        t_dispatch = time.monotonic() - t0
        # Client-cancelled streaming rows free their slot before the
        # barrier (never decode for a dead client).
        stream_slots = []
        for slot, row in list(self.rows.items()):
            if row["req"].stream_q is None:
                continue
            if row["req"].cancelled.is_set():
                self.rows.pop(slot)
                self.pool = self.plib.release_row(self.pool, slot)
            else:
                stream_slots.append(slot)
        # ONE host readback per segment: when streaming rows exist, the
        # fused emit program decodes every row's newly-stable span to
        # ready-to-ship int16 PCM on device, so the barrier device_get
        # carries chunks + counters together. The previous shape (barrier
        # fetch + a vocoder dispatch + fetch per streaming row) paid a
        # full tunnel roundtrip (~0.1-0.15 s) per stream per segment —
        # the dominant term of the round-4 pooled-TTFA budget.
        # (block_until_ready is not a reliable barrier on the remote-TPU
        # platform, CLAUDE.md — device_get is.)
        t1 = time.monotonic()
        out = None
        if stream_slots:
            S = self.pc.slots
            emitted = np.zeros((S,), np.int32)
            mnt_cap = np.full((S,), self.pc.max_new_tokens, np.int32)
            for slot, row in self.rows.items():
                emitted[slot] = row["emitted"]
                pf = (int(row["r"]["prefix_codes"].shape[-1])
                      if row["r"]["prefix_codes"] is not None else 0)
                mnt_cap[slot] = row["r"]["max_new_tokens"] + pf
            out = jax.device_get(self._emit(
                self.pipe.dac_params, self.pool,
                jnp.asarray(emitted), jnp.asarray(mnt_cap),
            ))
            active, remaining = out["active"], out["remaining"]
        else:
            active, remaining = jax.device_get(
                (self.pool["active"], self.pool["remaining"])
            )
        t_barrier = time.monotonic() - t1
        with self.srv.metrics.lock:
            self.srv.metrics.compute_seconds_total += time.monotonic() - t0

        hop = self.pipe.dac.hop
        now = time.monotonic()
        for slot in stream_slots:
            row = self.rows[slot]
            take = int(out["new_emitted"][slot]) - row["emitted"]
            if take > 0:
                row["req"].stream_q.put(
                    out["pcm"][slot, : take * hop].tobytes()
                )
                if not row.get("ttfa_logged"):
                    row["ttfa_logged"] = True
                    tracing.log_event(
                        "pool_first_chunk", slot=slot,
                        ttfa_s=round(now - row["req"].enqueued_at, 3),
                        since_admit_s=round(now - row["t0"], 3),
                    )
                row["emitted"] += take
                row["sent"] += take * hop

        # Rows whose EOS cascade completed this segment. Full code grids
        # are fetched in ONE extra device_get, only on segments where a
        # row actually needs one (non-streaming finishes; streaming final
        # spans longer than one emit window).
        done_slots = [
            s for s in list(self.rows) if active[s] and remaining[s] <= 0
        ]
        pre: dict = {}
        need_grid = []
        for s in done_slots:
            streaming = self.rows[s]["req"].stream_q is not None
            if (out is not None and streaming
                    and self.rows[s]["emitted"] >= int(out["valid"][s])):
                pre[s] = (None, int(out["valid"][s]))  # fully flushed
            else:
                need_grid.append(s)
        if need_grid:
            extracts = jax.device_get({
                s: self.plib._extract_row_device(
                    self.pipe.model, self.pool, s
                )
                for s in need_grid
            })
            pre.update({
                s: self.plib.finalize_extract(self.pipe.model, *extracts[s])
                for s in need_grid
            })
        for slot in done_slots:
            self._finish_row(slot, pre=pre.get(slot))

        tracing.log_event(
            "pool_segment_budget",
            dispatch_ms=round(t_dispatch * 1000, 1),
            barrier_ms=round(t_barrier * 1000, 1),
            host_ms=round((time.monotonic() - t1 - t_barrier) * 1000, 1),
            streams=len(stream_slots), finished=len(done_slots),
            rows=len(self.rows),
        )
        if not self.rows:
            self.scheduled = False
            return True  # leave the job list until the next admit
        return False

    def _finish_row(self, slot: int, pre=None) -> None:
        # Row stays in self.rows until the response is built, so a vocode
        # failure still replays this request via fail().
        row = self.rows[slot]
        req, r, t0 = row["req"], row["r"], row["t0"]
        sr = self.pipe.dac.sampling_rate
        if req.stream_q is not None:
            # Streaming row: flush the withheld tail, then the end sentinel.
            self._stream_progress(slot, final=True, pre=pre)
            with self.srv.metrics.lock:
                self.srv.metrics.audio_seconds_total += row["sent"] / sr
                self.srv.metrics.pooled_requests += 1
            req.stream_q.put(None)
            self.rows.pop(slot)
            self.pool = self.plib.release_row(self.pool, slot)
            tracing.log_event(
                "tts_pool_stream_done", slot=slot, frames=row["emitted"],
                wall_s=round(time.monotonic() - t0, 3),
            )
            return
        codes, valid = (
            pre if pre is not None
            else self.plib.extract_row(self.pipe.model, self.pool, slot)
        )
        prefix_frames = (
            int(r["prefix_codes"].shape[-1])
            if r["prefix_codes"] is not None else 0
        )
        # Same accounting as the solo path (_finish_decode_job): valid
        # frames cover replayed prefix + continuation.
        frames = min(valid, r["max_new_tokens"] + prefix_frames)
        if frames > 0:
            # Vocode at a BUCKETED static length (a handful of compiled
            # vocoder shapes) and trim samples — a per-valid-length slice
            # would recompile the DAC decoder per utterance.
            vlen = self.srv._bucket(frames)
            padded = np.zeros((codes.shape[0], vlen), np.int32)
            padded[:, :frames] = np.asarray(codes[:, :frames])
            wav = self.pipe.decode_audio(jnp.asarray(padded)[None, :, :])[0]
            wav = wav[: frames * self.pipe.dac.hop]
        else:
            wav = np.zeros((self.pipe.dac.hop,), np.float32)
        # Metrics BEFORE done.set(): the client thread unblocks on done and
        # may read /metrics immediately.
        with self.srv.metrics.lock:
            self.srv.metrics.audio_seconds_total += wav.shape[-1] / sr
            self.srv.metrics.pooled_requests += 1
        req.response = (200, "audio/wav", wav_bytes(wav, sr))
        req.done.set()
        self.rows.pop(slot)
        self.pool = self.plib.release_row(self.pool, slot)
        tracing.log_event(
            "tts_pool_row_done", slot=slot, frames=frames,
            wall_s=round(time.monotonic() - t0, 3),
        )

    def fail(self, e: Exception) -> None:
        rows = list(self.rows.values())
        self.rows.clear()
        self.scheduled = False
        self.pool = self._fresh_pool()
        # Streaming rows can't replay transparently (chunks already shipped):
        # surface the error on their stream; non-streaming rows replay.
        err = (500, "application/json",
               json.dumps({"error": f"TTS stream failed: {e}"}).encode())
        solo = []
        for row in rows:
            req = row["req"]
            if req.stream_q is not None:
                with self.srv.metrics.lock:
                    self.srv.metrics.errors_total += 1
                req.stream_q.put(("error", err))
                req.stream_q.put(None)
            else:
                solo.append(req)
        if solo:
            self.srv._replay_or_fail(solo, e)

    def finish(self) -> None:
        pass  # nothing to do: rows finalize inside advance()
