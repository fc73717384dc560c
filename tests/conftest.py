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
os.environ["XLA_FLAGS"] = flags

# Shared recipe (collective-timeout flags for the 1-core host, CPU-only
# compilation cache, platform config override) — one copy for conftest /
# dryrun_multichip / audit_sharding lives in utils.force_virtual_cpu.
from mdn_sfm_tpu.utils import force_virtual_cpu  # noqa: E402

force_virtual_cpu()  # device count already forced via XLA_FLAGS above

import jax  # noqa: E402

# The jaxtyping pytest plugin imports jax before this conftest runs, so the
# env var alone may be too late; the backend itself initializes lazily, so
# forcing the platform through the config still works.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
