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
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The jaxtyping pytest plugin imports jax before this conftest runs, so the
# env var alone may be too late; the backend itself initializes lazily, so
# forcing the platform through the config still works.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: the big jitted programs (train-step scan,
# fused DS step, Mask R-CNN) dominate suite wall-clock on this 1-core box;
# cache entries are keyed on platform+HLO so CPU test entries coexist with
# the TPU CLI entries.
from mdn_sfm_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
