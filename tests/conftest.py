"""Test harness config: force CPU with 8 virtual devices so sharding/pjit
tests run without TPU hardware (SURVEY.md §4 test strategy)."""

import os

# Must be set before jax is imported anywhere in the test session.
# Hard override: the surrounding environment pins JAX_PLATFORMS to the real
# TPU (axon tunnel); tests must run on the local CPU with a virtual 8-device
# mesh regardless.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # XLA:CPU kills the process when a cross-device rendezvous waits > 40 s
    # for stragglers ("Termination timeout ... Exiting to ensure a
    # consistent program state"). On this ONE-core box the 8 partition
    # threads of a heavy shard_map program (the fused-DS step runs a full
    # Mask R-CNN per device) get scheduled far enough apart to trip that
    # routinely — a host artifact, not a hang. Give stragglers 20 minutes.
    flags += (
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
        " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
    )
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

# The jaxtyping pytest plugin imports jax before this conftest runs, so the
# env var alone may be too late; the backend itself initializes lazily, so
# forcing the platform through the config still works.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache — in a CPU-ONLY directory. The big jitted
# programs (train-step scan, fused DS step, Mask R-CNN) dominate suite
# wall-clock on this 1-core box. Tests must NOT share /tmp/mdn_jax_cache
# with the TPU CLIs: XLA:CPU entries are AOT executables stamped with the
# compiling process's detected machine features, and entries written under
# the axon TPU-client env trip the loader's "different machine — may
# SIGILL" warning when reloaded here. A separate directory keeps every CPU
# entry self-consistent. (The round-3 mid-suite abort initially blamed on
# this was actually a GSPMD collective rendezvous timeout — fixed in
# training.loss_from_batch — but the mixed-cache warning is real.)
from mdn_sfm_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache("/tmp/mdn_jax_cache_cpu")
