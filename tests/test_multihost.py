"""Multi-host runtime subsystem tests on the spoofed 8-device CPU mesh:
heartbeat-as-collective, failure monitor, replay buffer, and the server's
healthz/replay integration (SURVEY.md §5.3, §5.8)."""

import time

import jax
import numpy as np
import pytest

from zonos_vibes_tpu.config import MeshConfig
from zonos_vibes_tpu.parallel.multihost import (
    Heartbeat,
    HeartbeatMonitor,
    ReplayBuffer,
    initialize_runtime,
    is_coordinator,
)
from zonos_vibes_tpu.parallel.sharding import make_mesh


def test_initialize_runtime_single_process_noop(monkeypatch):
    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES", "JAX_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    assert initialize_runtime() is False
    assert is_coordinator()


def test_heartbeat_probe_full_world():
    mesh = make_mesh(MeshConfig(data=4, model=2))
    hb = Heartbeat(mesh, timeout_s=30.0)
    assert hb.world == 8
    assert hb.probe() is True


def test_heartbeat_detects_hang():
    mesh = make_mesh(MeshConfig(data=2))
    hb = Heartbeat(mesh, timeout_s=0.2)

    def hang(x):
        time.sleep(2.0)
        return x

    hb._fn = hang  # simulate a stalled collective
    assert hb.probe() is False


def test_heartbeat_wedged_probe_does_not_leak_threads():
    """A wedged device call must not accumulate a thread per probe
    (VERDICT.md round 1, weak #7): repeated probes against a stalled
    collective return False immediately on the single persistent worker,
    and the worker recovers once the wedge clears."""
    import threading

    mesh = make_mesh(MeshConfig(data=2))
    hb = Heartbeat(mesh, timeout_s=0.1)
    release = threading.Event()
    real_call = hb._device_call

    def wedged():
        release.wait()
        return real_call()

    hb._device_call = wedged
    assert hb.probe() is False  # times out
    n_threads = threading.active_count()
    for _ in range(10):  # wedged: immediate False, no new threads
        assert hb.probe() is False
    assert threading.active_count() == n_threads
    release.set()
    hb._device_call = real_call
    deadline = time.monotonic() + 5.0
    ok = False
    while time.monotonic() < deadline and not ok:
        ok = hb.probe()  # stale wedged result drained, then healthy again
    assert ok


def test_heartbeat_detects_short_world():
    mesh = make_mesh(MeshConfig(data=2))
    hb = Heartbeat(mesh, timeout_s=5.0)
    hb.world = 999  # as if devices went missing
    assert hb.probe() is False


def test_monitor_fires_once_and_recovers():
    state = {"ok": False, "failures": []}

    def probe():
        return state["ok"]

    mon = HeartbeatMonitor(
        probe, interval_s=0.02, on_failure=state["failures"].append
    ).start()
    try:
        deadline = time.monotonic() + 2.0
        while mon.healthy and time.monotonic() < deadline:
            time.sleep(0.01)
        assert not mon.healthy
        time.sleep(0.1)  # further failed probes must not re-fire
        assert state["failures"] == ["heartbeat probe failed"]
        state["ok"] = True
        deadline = time.monotonic() + 2.0
        while not mon.healthy and time.monotonic() < deadline:
            time.sleep(0.01)
        assert mon.healthy
    finally:
        mon.stop()


def test_replay_buffer_orders_unacked():
    rb = ReplayBuffer()
    t1 = rb.checkout("a")
    t2 = rb.checkout("b")
    t3 = rb.checkout("c")
    rb.ack(t2)
    assert rb.pending() == 2
    assert rb.drain() == ["a", "c"]
    assert rb.pending() == 0
    assert rb.replayed_total == 2
    rb.ack(t1)  # acking a drained token is a no-op
    assert rb.drain() == []
