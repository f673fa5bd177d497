"""End-to-end pipeline + HTTP server integration tests (tiny model, CPU).

The server test mirrors the reference integration test's checks
(test_server.py:39-81): HTTP 200, Content-Type audio/wav, non-empty body,
parses with the stdlib ``wave`` module — but self-hosted, no LAN URL.
"""

import json
import tempfile
import threading
import time
import urllib.request
import wave as wave_mod
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zonos_vibes_tpu.config import (
    BackboneConfig,
    PrefixConditionerConfig,
    ZonosConfig,
    _freeze,
)
from zonos_vibes_tpu.models.dac import DACConfig
from zonos_vibes_tpu.models.autoencoder import DACAutoencoder
from zonos_vibes_tpu.models.speaker import SpeakerEncoder
from zonos_vibes_tpu.pipeline import ZonosPipeline
from zonos_vibes_tpu.serve.server import TTSServer, read_wav, wav_bytes

TINY_DAC = DACConfig(
    encoder_hidden_size=8, downsampling_ratios=(2, 4), decoder_hidden_size=32,
    n_codebooks=9, codebook_size=1024, codebook_dim=4,
)

TINY_CFG = ZonosConfig(
    backbone=BackboneConfig(
        d_model=64, n_layer=2, attn_mlp_d_intermediate=128,
        attn_cfg=_freeze({"num_heads": 4, "num_heads_kv": 2}),
    ),
    prefix_conditioner=PrefixConditionerConfig.from_dict(
        {
            "projection": "linear",
            "conditioners": [
                {"type": "EspeakPhonemeConditioner", "name": "espeak"},
                {"type": "PassthroughConditioner", "name": "speaker",
                 "cond_dim": 16, "projection": "linear",
                 "uncond_type": "learned"},
                {"type": "FourierConditioner", "name": "speaking_rate",
                 "min_val": 0, "max_val": 40, "uncond_type": "learned"},
                {"type": "IntegerConditioner", "name": "language_id",
                 "min_val": -1, "max_val": 126, "uncond_type": "learned"},
            ],
        }
    ),
)


@pytest.fixture(scope="module")
def pipe():
    p = ZonosPipeline.from_config(
        TINY_CFG, key=jax.random.key(0), dtype=jnp.float32,
        dac=DACAutoencoder(TINY_DAC),
    )
    p.speaker_encoder = SpeakerEncoder(
        in_planes=4, embd_dim=24, lda_dim=16, depths=(1, 1, 1, 1)
    )
    p.speaker_params = p.speaker_encoder.init(jax.random.key(1))
    return p


def test_pipeline_end_to_end(pipe):
    cond = pipe.make_cond_dict(text="Hi there!", language="en-us",
                               speaking_rate=14.0)
    assert "espeak" in cond and cond["espeak"].dtype == jnp.int32
    res = pipe.generate(cond, key=jax.random.key(2), max_new_tokens=6)
    wav = pipe.decode_audio(res)
    # tiny DAC hop = 8 samples/frame
    assert wav.shape == (1, int(res.valid_length) * 8)
    assert np.abs(wav).max() <= 1.0


def test_audio_prefix_roundtrip(pipe):
    sr = pipe.dac.sampling_rate
    audio = np.sin(np.linspace(0, 100, sr // 100)).astype(np.float32)
    codes = pipe.encode_audio(audio, sr)
    assert codes.shape[0] == 1 and codes.shape[1] == 9
    cond = pipe.make_cond_dict(text="continue")
    res = pipe.generate(cond, codes, key=jax.random.key(3), max_new_tokens=4)
    np.testing.assert_array_equal(
        np.asarray(res.codes[..., : codes.shape[-1]]), np.asarray(codes)
    )


@pytest.fixture(scope="module")
def server(pipe):
    srv = TTSServer(pipe, host="127.0.0.1", port=5099, request_timeout_s=300)
    srv.start_background()
    yield srv
    srv.shutdown()


def _post(url, payload, timeout=240):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        resp = urllib.request.urlopen(req, timeout=timeout)
        return resp.status, resp.headers.get("Content-Type"), resp.read()
    except urllib.error.HTTPError as e:
        return e.code, e.headers.get("Content-Type"), e.read()


def test_server_tts_contract(server, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("spk")
    spk_path = str(tmp / "spk.wav")
    sr = 16000
    wav = (0.1 * np.sin(np.linspace(0, 880 * np.pi, sr))).astype(np.float32)
    with open(spk_path, "wb") as f:
        f.write(wav_bytes(wav, sr))

    status, ctype, body = _post(
        "http://127.0.0.1:5099/tts",
        {"text": "Hello from the test.", "speaker_audio_path": spk_path,
         "speaking_rate": 14.0, "max_new_tokens": 6},
    )
    assert status == 200, body[:200]
    assert ctype == "audio/wav"
    assert len(body) > 0
    import io

    with wave_mod.open(io.BytesIO(body)) as w:
        assert w.getnchannels() == 1
        assert w.getframerate() == server.pipeline.dac.sampling_rate
        assert w.getnframes() > 0

    # Speaker cache hit on second request.
    status2, _, _ = _post(
        "http://127.0.0.1:5099/tts",
        {"text": "Second request.", "speaker_audio_path": spk_path,
         "max_new_tokens": 6},
    )
    assert status2 == 200
    assert ("default", spk_path) in server._spk_cache


def test_server_errors(server):
    status, ctype, body = _post("http://127.0.0.1:5099/tts", {"text": ""})
    assert status == 400 and b"text" in body
    status, _, body = _post(
        "http://127.0.0.1:5099/tts",
        {"text": "x", "speaker_audio_path": "/does/not/exist.wav"},
    )
    assert status == 404


def test_server_health_metrics(server):
    with urllib.request.urlopen("http://127.0.0.1:5099/healthz", timeout=10) as r:
        assert json.loads(r.read())["status"] == "ok"
    with urllib.request.urlopen("http://127.0.0.1:5099/metrics", timeout=10) as r:
        m = json.loads(r.read())
    assert m["requests_total"] >= 1
    assert "rtf" in m


def test_merge_cond_dicts(pipe):
    c1 = pipe.make_cond_dict(text="Hi!", speaking_rate=14.0)
    c2 = pipe.make_cond_dict(text="A much longer sentence here.", speaking_rate=12.0)
    merged = ZonosPipeline.merge_cond_dicts([c1, c2])
    longest = max(c1["espeak"].shape[1], c2["espeak"].shape[1])
    assert merged["espeak"].shape == (2, longest)
    # LEFT-padded: shorter row's ids sit at the right edge.
    short = np.asarray(c1["espeak"][0])
    np.testing.assert_array_equal(
        np.asarray(merged["espeak"][0, -short.shape[0]:]), short
    )
    assert (np.asarray(merged["espeak"][0, : longest - short.shape[0]]) == 0).all()
    assert merged["speaking_rate"].shape[0] == 2
    # Mismatched key sets rejected.
    c3 = dict(c1)
    c3.pop("speaking_rate")
    with pytest.raises(ValueError):
        ZonosPipeline.merge_cond_dicts([c1, c3])


def test_server_request_batching(pipe):
    """Concurrent compatible requests share one decode call (the reference
    serves strictly one request at a time, SURVEY.md §3.3)."""
    srv = TTSServer(pipe, host="127.0.0.1", port=5098, max_batch=4,
                    batch_window_s=2.0, request_timeout_s=300)
    srv.start_background()
    try:
        results = {}

        def post(name, text):
            results[name] = _post(
                "http://127.0.0.1:5098/tts",
                {"text": text, "max_new_tokens": 6,
                 "emotion": [0.3, 0.03, 0.03, 0.03, 0.03, 0.03, 0.25, 0.3]},
            )

        threads = [
            threading.Thread(target=post, args=("a", "Short one.")),
            threading.Thread(target=post, args=("b", "This is a somewhat longer request text.")),
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(300)
        for name in ("a", "b"):
            status, ctype, body = results[name]
            assert status == 200, body[:200]
            assert ctype == "audio/wav" and len(body) > 0
        assert srv.metrics.snapshot()["batched_requests"] >= 1
    finally:
        srv.shutdown()


def test_server_replay_and_healthz(pipe):
    """A failed decode group is re-enqueued once (replay, SURVEY.md §5.3);
    an unhealthy heartbeat monitor flips /healthz to 503."""
    from zonos_vibes_tpu.parallel.multihost import HeartbeatMonitor

    mon = HeartbeatMonitor(lambda: True, interval_s=999)
    srv = TTSServer(pipe, host="127.0.0.1", port=5097, request_timeout_s=300,
                    monitor=mon, max_retries=1)

    # Inject the failure where the scheduler actually decodes: the
    # engine's segment iterator (jobs advance one compiled segment per
    # scheduler slice).
    real_stream = srv.pipeline.engine.generate_stream
    calls = {"n": 0}

    def flaky_stream(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected device failure")
        return real_stream(*a, **kw)

    srv.pipeline = _FlakyPipeline(pipe, flaky_stream)
    srv.pipelines["default"] = srv.pipeline
    srv.start_background()
    try:
        status, ctype, body = _post(
            "http://127.0.0.1:5097/tts",
            {"text": "Replay me.", "max_new_tokens": 6,
             "emotion": [0.3, 0.03, 0.03, 0.03, 0.03, 0.03, 0.25, 0.3]},
        )
        assert status == 200, body[:200]
        assert calls["n"] == 2
        assert srv.metrics.snapshot()["replayed_requests"] == 1

        with urllib.request.urlopen("http://127.0.0.1:5097/healthz", timeout=10) as r:
            assert r.status == 200
        mon.healthy = False
        try:
            urllib.request.urlopen("http://127.0.0.1:5097/healthz", timeout=10)
            raise AssertionError("expected 503")
        except urllib.error.HTTPError as e:
            assert e.code == 503
    finally:
        srv.shutdown()


class _FlakyEngine:
    """Engine proxy whose generate_stream is injectable."""

    def __init__(self, inner, stream):
        self._inner = inner
        self._stream = stream

    def generate_stream(self, *a, **kw):
        return self._stream(*a, **kw)

    def __getattr__(self, name):
        return getattr(self._inner, name)


class _FlakyPipeline:
    """Pipeline proxy whose engine segment iterator is injectable
    (failure simulation at the scheduler's decode boundary)."""

    def __init__(self, inner, stream):
        self._inner = inner
        self.engine = _FlakyEngine(inner.engine, stream)

    def __getattr__(self, name):
        return getattr(self._inner, name)


def test_cond_bucketing_stabilizes_shapes(pipe):
    """Different text lengths inside one bucket must yield identical
    conditioning shapes (one compiled decode program per bucket, not per
    text length)."""
    c1 = pipe.make_cond_dict(text="Two sentences in the same bucket.")
    c2 = pipe.make_cond_dict(text="A rather different and longer text.")
    b = TTSServer._cond_bucket
    assert b(int(c1["espeak"].shape[1])) == b(int(c2["espeak"].shape[1])) == 64
    assert int(c1["espeak"].shape[1]) != int(c2["espeak"].shape[1])
    m1 = ZonosPipeline.merge_cond_dicts([c1], pad_len=64)
    m2 = ZonosPipeline.merge_cond_dicts([c2], pad_len=64)
    p1 = pipe.prepare_conditioning(m1)
    p2 = pipe.prepare_conditioning(m2)
    assert p1.shape == p2.shape


def test_server_warmup(pipe):
    srv = TTSServer(pipe, host="127.0.0.1", port=5096, request_timeout_s=300)
    n = srv.warmup([(1, 32, 6, True), (2, 32, 6, False)])
    assert n == 2
    assert pipe.speaker_shape() == (1, 1, 16)


def test_persistent_compilation_cache(tmp_path):
    from zonos_vibes_tpu.utils import enable_persistent_compilation_cache

    cache = tmp_path / "xla-cache"
    enable_persistent_compilation_cache(str(cache), min_compile_time_secs=0.0)
    try:
        f = jax.jit(lambda x: (x @ x.T).sum())
        f(jnp.ones((64, 64))).block_until_ready()
        assert any(cache.iterdir())
    finally:
        jax.config.update("jax_compilation_cache_dir", None)


def test_server_concurrent_load(pipe):
    """Race-detection surrogate (SURVEY.md §5.2): hammer the server with
    mixed valid/invalid concurrent requests; every request must get exactly
    one response and metrics must stay consistent. The reference's global
    model + caches are mutated from handlers without locks — this test is
    why ours is single-owner."""
    srv = TTSServer(pipe, host="127.0.0.1", port=5095, max_batch=4,
                    batch_window_s=0.2, request_timeout_s=300)
    srv.start_background()
    try:
        results = {}

        def post(i):
            if i % 3 == 2:
                payload = {"text": ""}  # invalid -> 400
            else:
                payload = {
                    "text": f"Concurrent request number {i}.",
                    "max_new_tokens": 6,
                    "emotion": [0.3, 0.03, 0.03, 0.03, 0.03, 0.03, 0.25, 0.3],
                }
            results[i] = _post("http://127.0.0.1:5095/tts", payload)

        threads = [threading.Thread(target=post, args=(i,)) for i in range(9)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(300)
        assert len(results) == 9
        for i, (status, ctype, body) in results.items():
            if i % 3 == 2:
                assert status == 400, (i, body[:100])
            else:
                assert status == 200, (i, body[:200])
                assert ctype == "audio/wav" and len(body) > 44
        m = srv.metrics.snapshot()
        assert m["requests_total"] == 9
        assert m["errors_total"] == 0  # 400s are client errors, not failures
        assert m["batched_requests"] >= 1  # at least one shared decode
    finally:
        srv.shutdown()


def test_server_multi_model(pipe):
    """Model selector parity (gradio_interface.py:206-217): named pipelines
    share the queue; requests pick one via "model"."""
    from tests.test_parallel import TINY_HYBRID

    hybrid = ZonosPipeline.from_config(
        TINY_HYBRID, key=jax.random.key(5), dtype=jnp.float32,
        dac=DACAutoencoder(TINY_DAC),
    )
    srv = TTSServer(pipe, host="127.0.0.1", port=5093, request_timeout_s=300,
                    extra_pipelines={"hybrid": hybrid})
    srv.start_background()
    try:
        with urllib.request.urlopen("http://127.0.0.1:5093/model-info",
                                    timeout=10) as r:
            info = json.loads(r.read())
        assert info["models"] == ["default", "hybrid"]
        assert "espeak" in info["conditioners_by_model"]["hybrid"]

        status, ctype, body = _post(
            "http://127.0.0.1:5093/tts",
            {"text": "Hybrid please.", "model": "hybrid", "max_new_tokens": 6,
             "emotion": [0.3, 0.03, 0.03, 0.03, 0.03, 0.03, 0.25, 0.3]},
        )
        assert status == 200, body[:200]
        assert ctype == "audio/wav"

        status, _, body = _post(
            "http://127.0.0.1:5093/tts", {"text": "x", "model": "nope"},
        )
        assert status == 400 and b"Unknown model" in body
    finally:
        srv.shutdown()


def test_wav_roundtrip(tmp_path):
    sr = 8000
    wav = (0.5 * np.sin(np.linspace(0, 100, 800))).astype(np.float32)
    path = str(tmp_path / "x.wav")
    with open(path, "wb") as f:
        f.write(wav_bytes(wav, sr))
    back, sr2 = read_wav(path)
    assert sr2 == sr and back.shape == (1, 800)
    np.testing.assert_allclose(back[0], wav, atol=1e-3)


def test_model_info_endpoint(server):
    with urllib.request.urlopen("http://127.0.0.1:5099/model-info", timeout=10) as r:
        info = json.loads(r.read())
    assert "espeak" in info["conditioners"]
    assert "speaker" in info["conditioners"]
    assert "dnsmos_ovrl" not in info["conditioners"]  # tiny cfg lacks it


def test_webui_served(server):
    with urllib.request.urlopen("http://127.0.0.1:5099/", timeout=10) as r:
        body = r.read().decode()
    assert "zonos-tpu" in body and "speaking_rate" in body and "en-us" in body


def test_extended_ui_payload(server):
    """Gradio-equivalent payload: full knob surface, no speaker path."""
    status, ctype, body = _post(
        "http://127.0.0.1:5099/tts",
        {
            "text": "Full controls.",
            "language": "en-us",
            "emotion": [0.3, 0.03, 0.03, 0.03, 0.03, 0.03, 0.25, 0.3],
            "vqscore_8": [0.78] * 8,
            "fmax": 22050, "pitch_std": 30, "speaking_rate": 14,
            "dnsmos_ovrl": 4.0, "speaker_noised": False,
            "cfg_scale": 2.0, "seed": 123,
            "sampling": {"linear": 0.5, "conf": 0.4, "quad": 0.0,
                         "top_p": 0, "top_k": 0, "min_p": 0},
            "max_new_tokens": 6,
            "unconditional_keys": ["vqscore_8", "dnsmos_ovrl"],
        },
    )
    assert status == 200, body[:300]
    assert ctype == "audio/wav"


def test_language_case_insensitive(pipe):
    """Mixed-case language codes must work, not KeyError (review finding)."""
    cond = pipe.make_cond_dict(text="Hi", language="EN-US")
    assert "espeak" in cond
    with pytest.raises(ValueError):
        pipe.make_cond_dict(text="Hi", language="xx-zz")


def test_short_speaker_audio(pipe):
    """Speaker clips shorter than the mel reflect pad must not crash
    (review finding: OOB read in native DSP / jnp.pad failure)."""
    for n in (50, 300, 1000):
        wav = np.random.default_rng(n).standard_normal(n).astype(np.float32)
        emb = pipe.make_speaker_embedding(wav, 16000)
        assert emb.shape == (1, 1, 16)
        assert np.isfinite(np.asarray(emb, np.float32)).all()


def test_explicit_seed_isolates_batch_group(pipe):
    """Explicit seeds opt out of cross-seed batching (the group shares one
    PRNG key, so reproducibility requires isolation)."""
    srv = TTSServer(pipe, host="127.0.0.1", port=1)  # never started
    base = {"text": "x", "emotion": [0.3] * 8, "max_new_tokens": 6}
    g_none_a = srv._parse(dict(base))["group"]
    g_none_b = srv._parse(dict(base))["group"]
    g_s1 = srv._parse({**base, "seed": 1})["group"]
    g_s2 = srv._parse({**base, "seed": 2})["group"]
    assert g_none_a == g_none_b        # unseeded requests batch freely
    assert g_s1 != g_s2 != g_none_a    # explicit seeds isolate


def test_server_prefix_audio_continuation(server, tmp_path_factory):
    """Audio-prefix continuation through the HTTP surface (reference
    gradio_interface.py:153-159,240-244: prefix wav -> DAC encode ->
    continuation). Output must cover prefix + continuation frames."""
    tmp = tmp_path_factory.mktemp("prefix")
    pre_path = str(tmp / "prefix.wav")
    sr = 44100
    wav = (0.1 * np.sin(np.linspace(0, 440 * np.pi, sr // 5))).astype(np.float32)
    with open(pre_path, "wb") as f:
        f.write(wav_bytes(wav, sr))

    status, ctype, body = _post(
        "http://127.0.0.1:5099/tts",
        {"text": "Continue the sound.", "emotion": [0.125] * 8,
         "prefix_audio_path": pre_path, "max_new_tokens": 6},
    )
    assert status == 200, body[:200]
    assert ctype == "audio/wav"
    import io

    with wave_mod.open(io.BytesIO(body)) as w:
        # Prefix frames replayed + continuation: strictly more audio than a
        # prefixless request of the same step count could produce.
        assert w.getnframes() > 6 * server.pipeline.dac.hop
    assert ("prefix", "default", pre_path) in server._spk_cache

    # Unknown prefix path -> 404 (mirrors the speaker-path contract).
    status, _, body = _post(
        "http://127.0.0.1:5099/tts",
        {"text": "x", "emotion": [0.125] * 8,
         "prefix_audio_path": "/nonexistent/prefix.wav"},
    )
    assert status == 404


def test_segment_interleaving_no_head_of_line_blocking(pipe):
    """A short request posted while a long generation is in flight must
    complete long before the long one: the scheduler round-robins jobs one
    compiled decode segment at a time (the reference — and a naive queue —
    would serve the long request to completion first)."""
    srv = TTSServer(pipe, host="127.0.0.1", port=5092,
                    request_timeout_s=300, segment_steps=8)
    srv.start_background()
    done_at = {}

    def post(name, mnt):
        status, _, _ = _post(
            "http://127.0.0.1:5092/tts",
            {"text": f"{name} request.", "max_new_tokens": mnt,
             "emotion": [0.3, 0.03, 0.03, 0.03, 0.03, 0.03, 0.25, 0.3],
             # distinct explicit seeds keep them in separate decode groups
             "seed": 1 if name == "long" else 2},
        )
        done_at[name] = time.monotonic()
        assert status == 200

    try:
        # Warm both shapes so scheduling (not compiles) dominates timing.
        post("long", 256)
        post("short", 8)
        done_at.clear()

        t_long = threading.Thread(target=post, args=("long", 256))
        t_long.start()
        time.sleep(0.3)  # long job underway
        t_short = threading.Thread(target=post, args=("short", 8))
        t_short.start()
        t_short.join(timeout=240)
        t_long.join(timeout=240)
        assert "short" in done_at and "long" in done_at
        assert done_at["short"] < done_at["long"], (
            "short request should finish while the long one is still decoding"
        )
    finally:
        srv.shutdown()


def test_pooled_server_staggered_requests(pipe):
    """Continuous-batching server mode: staggered pool-eligible requests
    share the decode pool (pooled_requests metric) and all complete."""
    srv = TTSServer(pipe, host="127.0.0.1", port=5091, request_timeout_s=300,
                    pooled=True, pool_slots=2, segment_steps=6)
    srv.start_background()
    results = {}

    def post(name, text):
        status, ctype, body = _post(
            "http://127.0.0.1:5091/tts",
            {"text": text, "max_new_tokens": 10,
             "emotion": [0.3, 0.03, 0.03, 0.03, 0.03, 0.03, 0.25, 0.3]},
        )
        results[name] = (status, ctype, len(body))

    try:
        t1 = threading.Thread(target=post, args=("a", "First pooled request."))
        t1.start()
        time.sleep(0.5)  # staggered join
        t2 = threading.Thread(target=post, args=("b", "Second pooled one."))
        t2.start()
        t1.join(timeout=240); t2.join(timeout=240)
        assert results["a"][0] == 200 and results["b"][0] == 200
        assert results["a"][1] == "audio/wav"
        assert srv.metrics.snapshot()["pooled_requests"] == 2

        # Custom sampling knobs are per-row RUNTIME values in the pooled
        # step (VERDICT r2 #3) — this request pools too.
        status, _, _ = _post(
            "http://127.0.0.1:5091/tts",
            {"text": "Custom knobs request.", "max_new_tokens": 6,
             "sampling": {"min_p": 0.2}, "cfg_scale": 3.0,
             "emotion": [0.3, 0.03, 0.03, 0.03, 0.03, 0.03, 0.25, 0.3]},
        )
        assert status == 200
        assert srv.metrics.snapshot()["pooled_requests"] == 3

        # A pool-INeligible request (streaming is the remaining exclusion)
        # still serves via the job path — covered by the streaming tests;
        # here check the over-window knob fallback: a repetition window
        # wider than the pool's compiled bound takes the job path.
        status, _, _ = _post(
            "http://127.0.0.1:5091/tts",
            {"text": "Job path request.", "max_new_tokens": 6,
             "sampling": {"repetition_penalty_window": 64},
             "emotion": [0.3, 0.03, 0.03, 0.03, 0.03, 0.03, 0.25, 0.3]},
        )
        assert status == 200
        assert srv.metrics.snapshot()["pooled_requests"] == 3
    finally:
        srv.shutdown()

def test_pooled_server_hybrid_requests(pipe):
    """The hybrid pipeline is pool-capable (VERDICT r1, missing #4): pooled
    mode admits staggered model=hybrid requests into the hybrid pipeline's
    own decode pool; per-model pools coexist."""
    from tests.test_parallel import TINY_HYBRID

    hybrid = ZonosPipeline.from_config(
        TINY_HYBRID, key=jax.random.key(5), dtype=jnp.float32,
        dac=DACAutoencoder(TINY_DAC),
    )
    srv = TTSServer(pipe, host="127.0.0.1", port=5094, request_timeout_s=300,
                    extra_pipelines={"hybrid": hybrid},
                    pooled=True, pool_slots=2, segment_steps=6)
    srv.start_background()
    results = {}

    def post(name, text, model):
        status, ctype, body = _post(
            "http://127.0.0.1:5094/tts",
            {"text": text, "model": model, "max_new_tokens": 10,
             "emotion": [0.3, 0.03, 0.03, 0.03, 0.03, 0.03, 0.25, 0.3]},
        )
        results[name] = (status, ctype, len(body))

    try:
        t1 = threading.Thread(
            target=post, args=("a", "First hybrid pooled.", "hybrid"))
        t1.start()
        time.sleep(0.5)  # staggered join
        t2 = threading.Thread(
            target=post, args=("b", "Second hybrid pooled.", "hybrid"))
        t2.start()
        # A default-model request rides the DEFAULT pipeline's pool.
        t3 = threading.Thread(
            target=post, args=("c", "Transformer pooled.", "default"))
        t3.start()
        t1.join(timeout=240); t2.join(timeout=240); t3.join(timeout=240)
        for name in ("a", "b", "c"):
            assert results[name][0] == 200, (name, results[name])
            assert results[name][1] == "audio/wav"
        assert srv.metrics.snapshot()["pooled_requests"] == 3

        # Hybrid STREAMING rides the hybrid pool too (its attention ring
        # stages + per-row SSM state under incremental extraction).
        req = urllib.request.Request(
            "http://127.0.0.1:5094/tts",
            data=json.dumps({
                "text": "Hybrid pooled stream.", "model": "hybrid",
                "stream": True, "max_new_tokens": 10,
                "emotion": [0.3, 0.03, 0.03, 0.03, 0.03, 0.03, 0.25, 0.3],
            }).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=240) as resp:
            assert resp.status == 200
            body = resp.read()
        assert body.startswith(b"RIFF") and len(body) > 44
        assert srv.metrics.snapshot()["pooled_requests"] == 4
    finally:
        srv.shutdown()

def test_server_base64_audio_upload(server):
    """Upload parity with the reference Gradio UI
    (gradio_interface.py:240-244): speaker and prefix audio travel inline
    as base64 WAV in the /tts payload — no server-side file needed."""
    import base64

    sr = 16000
    wav = (0.1 * np.sin(np.linspace(0, 880 * np.pi, sr))).astype(np.float32)
    b64 = base64.b64encode(wav_bytes(wav, sr)).decode()

    status, ctype, body = _post(
        "http://127.0.0.1:5099/tts",
        {"text": "Uploaded speaker.", "speaker_audio": b64,
         "max_new_tokens": 6},
    )
    assert status == 200, body[:200]
    assert ctype == "audio/wav" and len(body) > 44

    # Same bytes again -> content-digest cache hit (one embed compute).
    status2, _, _ = _post(
        "http://127.0.0.1:5099/tts",
        {"text": "Again.", "speaker_audio": b64, "max_new_tokens": 6},
    )
    assert status2 == 200
    spk_keys = [k for k in server._spk_cache if "spk-b64" in k]
    assert len(spk_keys) == 1

    # Prefix upload: short DAC-encodable clip.
    status3, _, body3 = _post(
        "http://127.0.0.1:5099/tts",
        {"text": "Continue this.", "prefix_audio": b64,
         "emotion": [0.3, 0.03, 0.03, 0.03, 0.03, 0.03, 0.25, 0.3],
         "max_new_tokens": 6},
    )
    assert status3 == 200, body3[:200]

    # Garbage base64 -> 400, not a crash.
    status4, _, body4 = _post(
        "http://127.0.0.1:5099/tts",
        {"text": "x", "speaker_audio": "!!!not-base64!!!"},
    )
    assert status4 == 400 and b"speaker_audio" in body4


def test_pooled_server_kv_int8(pipe):
    """--pool-kv-int8: the transformer pool stores int8 flushed prefixes
    (cache dtype int8 + scale leaves) and serves requests end-to-end; a
    hybrid pipeline's pool ignores the flag (no quantized Mamba-state
    path)."""
    from tests.test_parallel import TINY_HYBRID

    hybrid = ZonosPipeline.from_config(
        TINY_HYBRID, key=jax.random.key(5), dtype=jnp.float32,
        dac=DACAutoencoder(TINY_DAC),
    )
    srv = TTSServer(pipe, host="127.0.0.1", port=5089, request_timeout_s=300,
                    extra_pipelines={"hybrid": hybrid},
                    pooled=True, pool_slots=2, segment_steps=6,
                    pool_kv_int8=True)
    srv.start_background()
    try:
        status, ctype, body = _post(
            "http://127.0.0.1:5089/tts",
            {"text": "Quantized pool request.", "max_new_tokens": 10,
             "emotion": [0.3, 0.03, 0.03, 0.03, 0.03, 0.03, 0.25, 0.3]},
        )
        assert status == 200 and ctype == "audio/wav" and len(body) > 44
        assert srv.metrics.snapshot()["pooled_requests"] == 1
        job = srv._pool_jobs["default"]
        assert job.kv_int8
        assert job.pool["cache"]["k"].dtype == jnp.int8
        assert "k_scale" in job.pool["cache"]

        status, _, _ = _post(
            "http://127.0.0.1:5089/tts",
            {"text": "Hybrid exact pool.", "model": "hybrid",
             "max_new_tokens": 10,
             "emotion": [0.3, 0.03, 0.03, 0.03, 0.03, 0.03, 0.25, 0.3]},
        )
        assert status == 200
        hjob = srv._pool_jobs["hybrid"]
        assert not hjob.kv_int8
        assert "k_scale" not in hjob.pool["cache"].get("attn", {}).get(
            next(iter(hjob.pool["cache"]["attn"]), ""), {}
        )
    finally:
        srv.shutdown()


def test_pooled_server_state_bf16(pipe):
    """--pool-state-bf16: a hybrid pipeline's pool stores bf16 SSM state
    (run/solo ssm leaves) and serves end-to-end; the transformer pool
    ignores the flag (no SSM state)."""
    from tests.test_parallel import TINY_HYBRID

    hybrid = ZonosPipeline.from_config(
        TINY_HYBRID, key=jax.random.key(5), dtype=jnp.float32,
        dac=DACAutoencoder(TINY_DAC),
    )
    srv = TTSServer(pipe, host="127.0.0.1", port=5090, request_timeout_s=300,
                    extra_pipelines={"hybrid": hybrid},
                    pooled=True, pool_slots=2, segment_steps=6,
                    pool_state_bf16=True)
    srv.start_background()
    try:
        status, ctype, body = _post(
            "http://127.0.0.1:5090/tts",
            {"text": "Compact state pool.", "model": "hybrid",
             "max_new_tokens": 10,
             "emotion": [0.3, 0.03, 0.03, 0.03, 0.03, 0.03, 0.25, 0.3]},
        )
        assert status == 200 and ctype == "audio/wav" and len(body) > 44
        hjob = srv._pool_jobs["hybrid"]
        assert hjob.state_bf16
        for run in hjob.pool["cache"]["runs"]:
            assert run["ssm"].dtype == jnp.bfloat16

        status, _, _ = _post(
            "http://127.0.0.1:5090/tts",
            {"text": "Transformer ignores the flag.", "max_new_tokens": 10,
             "emotion": [0.3, 0.03, 0.03, 0.03, 0.03, 0.03, 0.25, 0.3]},
        )
        assert status == 200
        job = srv._pool_jobs["default"]
        assert not job.state_bf16
        assert job.pool["cache"]["k"].dtype == jnp.float32
    finally:
        srv.shutdown()


def test_pooled_server_quantized_bf16_pipeline_admits():
    """Regression (round 3, caught on the real chip): on a QUANTIZED
    pipeline the first whole-params tree leaf is an fp32 quantization
    scale, and deriving the pool's cache dtype from it allocated an fp32
    pool that no bf16 request cache could splice into — every admit
    raised a dtype mismatch and fell back to the job path
    (pooled_requests stayed 0). CPU fixtures are all-fp32, which masked
    it; this builds the production combination: bf16 activations + int8
    weights + pooled serving."""
    from zonos_vibes_tpu.engine import pool as plib
    from zonos_vibes_tpu.ops.sampling import SamplingParams
    from zonos_vibes_tpu.serve.server import _PoolJob

    p = ZonosPipeline.from_config(
        TINY_CFG, key=jax.random.key(0), dtype=jnp.bfloat16,
        dac=DACAutoencoder(TINY_DAC),
    ).quantize_int8()
    # Whole-tree first leaf IS an fp32 scale on this pipeline — the trap.
    assert jax.tree_util.tree_leaves(p.params)[0].dtype == jnp.float32

    srv = TTSServer(p, host="127.0.0.1", port=5085, request_timeout_s=300,
                    pooled=True, pool_slots=2, segment_steps=6)
    job = _PoolJob(srv, "default")
    assert job.pool["cache"]["k"].dtype == jnp.bfloat16  # NOT fp32

    # The admit-path splice itself: bf16 request cache rows join the pool
    # without a dtype mismatch, and a pooled segment steps. (No HTTP
    # round-trip: CPU XLA cannot execute the bf16 VOCODER dot —
    # "Unsupported element type for DotThunk" — which is unrelated.)
    cd = p.make_cond_dict(text="Quantized bf16 pooled request.")
    cond = p.prepare_conditioning(p.merge_cond_dicts([cd], pad_len=32))
    state, knobs = plib.prefill_request(
        p.model, p.params, cond, jax.random.key(0), 8, 2.0, SamplingParams()
    )
    pool = plib.join(job.pool, state, 0, cond.shape[1], 7, knobs)
    stepped = plib.pool_steps_jit(p.model, p.params, pool, jax.random.key(1), 6)
    assert stepped["pos"].shape[0] == 2  # both slots advanced the program


def test_stream_margin_validation(pipe):
    """ADVICE r4 (medium): a pooled server whose stream_margin leaves the
    fixed vocoder window no emit capacity must be rejected at construction
    — at runtime it would spin the single scheduler thread forever."""
    import pytest

    from zonos_vibes_tpu.serve.server import _PoolJob

    for bad in (0, -3, _PoolJob.VOCODE_WIN // 2, _PoolJob.VOCODE_WIN):
        with pytest.raises(ValueError, match="stream_margin"):
            TTSServer(pipe, port=5083, pooled=True, stream_margin=bad)
    # Legal margins construct fine; non-pooled servers skip the window
    # check entirely (solo streaming has no fixed-window constraint).
    TTSServer(pipe, port=5083, pooled=True, stream_margin=12)
    TTSServer(pipe, port=5083, pooled=False, stream_margin=200)
