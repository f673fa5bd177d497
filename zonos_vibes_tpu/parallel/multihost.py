"""Multi-host runtime: process-group init, heartbeat failure detection,
and re-dispatch of in-flight work (SURVEY.md §5.3, §5.8).

The reference is strictly single-process — a mid-generation failure loses
the request (SURVEY.md §5.3). This layer adds what production serving on a
pod slice needs, with the JAX runtime as the comm backend (no hand-written
transport):

* :func:`initialize_runtime` — ``jax.distributed.initialize`` when launched
  multi-process (coordinator env/args), no-op single-process. After init,
  every host sees the global device set and participates in collectives
  over ICI (in-slice) / DCN (cross-slice).
* :class:`Heartbeat` — liveness probe AS a collective: a tiny ``psum`` of
  ones over all devices must return the world size within a deadline. A
  hung/failed host stalls the collective -> timeout -> unhealthy. This is
  the TPU-native analogue of NCCL watchdogs: the collective IS the health
  check, so it exercises exactly the path real steps use.
* :class:`HeartbeatMonitor` — daemon thread probing every ``interval_s``;
  flips ``healthy`` and fires ``on_failure`` once on first failure. The
  server surfaces this via ``/healthz`` (503 when unhealthy).
* :class:`ReplayBuffer` — utterance batches checked out by a generation
  step; inference recovery = reload + replay (no training state): on
  failure the un-acked batches are handed back for re-dispatch to the
  surviving mesh.

Host-count-agnostic: everything below works on 1 process with N spoofed
devices (tests/conftest.py) — the driver's ``dryrun_multichip`` and the
test suite exercise the same code paths that run on a real slice.
"""

from __future__ import annotations

import os
import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_runtime(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize the multi-process JAX runtime if configured; returns True
    when running multi-process.

    Resolution order: explicit args > env (``JAX_COORDINATOR_ADDRESS``,
    ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``) > single-process no-op.
    TPU pods auto-discover via the TPU metadata when args are omitted but
    the env marks multi-process intent.
    """
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = num_processes if num_processes is not None else int(
        os.environ.get("JAX_NUM_PROCESSES", "0") or 0
    )
    pid = process_id if process_id is not None else int(
        os.environ.get("JAX_PROCESS_ID", "-1") or -1
    )
    if not addr and nproc <= 1:
        return False
    kwargs: dict[str, Any] = {}
    if addr:
        kwargs["coordinator_address"] = addr
    if nproc > 1:
        kwargs["num_processes"] = nproc
    if pid >= 0:
        kwargs["process_id"] = pid
    jax.distributed.initialize(**kwargs)
    return True


def is_coordinator() -> bool:
    return jax.process_index() == 0


# ---------------------------------------------------------------------------
# Heartbeat: liveness as a collective
# ---------------------------------------------------------------------------

class Heartbeat:
    """One-collective liveness probe over a mesh axis.

    ``probe()`` runs ``psum(1)`` over every device of ``mesh`` and checks
    the result equals the device count — executed on device, so it fails
    (or hangs) iff real collectives would. Runs are jitted once; each probe
    is one tiny program launch.

    Device calls run on ONE persistent daemon worker (not a thread per
    probe): if a probe wedges on a stalled collective, subsequent
    ``probe()`` calls return False immediately without stacking more
    threads onto the dead device; the worker resumes serving probes if the
    wedged call ever completes, discarding its stale result.
    """

    def __init__(self, mesh: Mesh, timeout_s: float = 10.0):
        self.mesh = mesh
        self.timeout_s = timeout_s
        axes = tuple(mesh.axis_names)
        spec = P(axes)

        n = int(np.prod(mesh.devices.shape))
        ones = jnp.ones((n,), jnp.int32)
        sharded = jax.device_put(ones, NamedSharding(mesh, spec))

        def _probe(x):
            return jnp.sum(x)  # GSPMD lowers to an all-reduce over the mesh

        self._fn = jax.jit(_probe, out_shardings=NamedSharding(mesh, P()))
        self._arg = sharded
        self.world = n
        self._req: queue.Queue[None] = queue.Queue()
        self._resp: queue.Queue[int | None] = queue.Queue()
        self._inflight = 0  # submitted minus consumed/discarded responses
        self._worker = threading.Thread(target=self._serve, daemon=True)
        self._worker.start()

    def _device_call(self) -> int:
        """The blocking device round-trip; injectable for wedge tests."""
        return int(jax.device_get(self._fn(self._arg)))

    def _serve(self):
        while True:
            self._req.get()
            try:
                val: int | None = self._device_call()
            except BaseException:  # noqa: BLE001 — device failure boundary
                val = None
            self._resp.put(val)

    def probe(self) -> bool:
        """True iff the collective completed in time with the full world."""
        # Discard responses of probes that previously timed out.
        while self._inflight:
            try:
                self._resp.get_nowait()
                self._inflight -= 1
            except queue.Empty:
                break
        if self._inflight:
            # A prior probe is still wedged on the device — unhealthy, and
            # no point queueing more work behind it.
            return False
        self._req.put(None)
        self._inflight += 1
        try:
            val = self._resp.get(timeout=self.timeout_s)
        except queue.Empty:
            return False
        self._inflight -= 1
        return val == self.world


class HeartbeatMonitor:
    """Daemon thread probing liveness every ``interval_s``; sets
    ``healthy`` and fires ``on_failure(reason)`` once on the first failed
    probe. ``probe_fn`` defaults to a :class:`Heartbeat`; injectable for
    tests / custom checks."""

    def __init__(
        self,
        probe_fn: Callable[[], bool],
        interval_s: float = 5.0,
        on_failure: Callable[[str], None] | None = None,
    ):
        self.probe_fn = probe_fn
        self.interval_s = interval_s
        self.on_failure = on_failure
        self.healthy = True
        self.last_probe_at: float | None = None
        self.probes_total = 0
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)

    def start(self):
        self._thread.start()
        return self

    def stop(self):
        self._stop.set()
        self._thread.join(self.interval_s + 1.0)

    def _loop(self):
        while not self._stop.is_set():
            ok = False
            try:
                ok = self.probe_fn()
            except Exception:  # noqa: BLE001 — probe failure == unhealthy
                ok = False
            self.probes_total += 1
            self.last_probe_at = time.monotonic()
            if not ok and self.healthy:
                self.healthy = False
                if self.on_failure is not None:
                    self.on_failure("heartbeat probe failed")
            elif ok:
                self.healthy = True
            self._stop.wait(self.interval_s)


# ---------------------------------------------------------------------------
# Replay: inference recovery = reload + replay
# ---------------------------------------------------------------------------

@dataclass
class _InFlight:
    token: int
    payload: Any
    checked_out_at: float = field(default_factory=time.monotonic)


class ReplayBuffer:
    """Tracks utterance batches between dispatch and completion.

    ``checkout(payload) -> token`` before running a generation step;
    ``ack(token)`` after results are safely returned. On a detected failure
    ``drain()`` hands back every un-acked payload (oldest first) for
    re-dispatch on the rebuilt mesh. Thread-safe; the server's single-owner
    worker and the heartbeat monitor may touch it concurrently.
    """

    def __init__(self):
        self._lock = threading.Lock()
        self._next = 0
        self._inflight: dict[int, _InFlight] = {}
        self.replayed_total = 0

    def checkout(self, payload: Any) -> int:
        with self._lock:
            token = self._next
            self._next += 1
            self._inflight[token] = _InFlight(token, payload)
            return token

    def ack(self, token: int) -> None:
        with self._lock:
            self._inflight.pop(token, None)

    def pending(self) -> int:
        with self._lock:
            return len(self._inflight)

    def drain(self) -> list[Any]:
        with self._lock:
            items = sorted(self._inflight.values(), key=lambda x: x.token)
            self._inflight.clear()
            self.replayed_total += len(items)
            return [i.payload for i in items]
