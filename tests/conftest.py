"""Test harness: run everything on a simulated 8-device CPU mesh.

Standard JAX practice for testing pjit/shard_map/collectives on one host
(SURVEY.md §4). Two quirks of this environment:

* a sitecustomize hook registers a remote-TPU ("axon") PJRT plugin in every
  interpreter and pins the platform, so ``JAX_PLATFORMS=cpu`` in the env is
  not enough — we must override via ``jax.config`` after import;
* ``XLA_FLAGS`` must carry the host-device-count before the CPU client is
  first created (lazily), which conftest import time guarantees.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
