"""Small runtime utilities."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    """Turn on JAX's persistent compilation cache.

    Tracing+compiling the fused train step takes minutes on small hosts; the
    cache makes every CLI re-run (train/bench/eval) start hot."""
    import jax

    cache_dir = path or os.environ.get(
        "MDN_COMPILATION_CACHE", os.path.join("/tmp", "mdn_jax_cache")
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax — cache flags unavailable


def force_virtual_cpu(
    n_devices: int | None = None,
    cache_dir: str | None = "/tmp/mdn_jax_cache_cpu",
) -> None:
    """Point JAX at the host CPU with an ``n_devices``-wide virtual mesh.

    The one shared copy of the virtual-mesh environment recipe (used by
    tests/conftest.py, ``__graft_entry__.dryrun_multichip`` and
    tools/audit_sharding — tune the magic values HERE only):

    * The axon sitecustomize pins ``JAX_PLATFORMS`` to the TPU tunnel in
      every interpreter; env vars cannot move JAX off it — only the config
      update (before first backend use) works.
    * XLA:CPU aborts the whole process when a collective rendezvous waits
      >40 s for straggler partitions ("Termination timeout ... Exiting to
      ensure a consistent program state"). On a 1-core host the partition
      threads of a heavy shard_map program are routinely scheduled that far
      apart — a host artifact, not a hang — so raise warn/terminate to
      120 s / 1200 s.
    * XLA:CPU cache entries are AOT executables stamped with the compiling
      host's machine features — keep them in a CPU-only cache dir, never
      mixed with the axon/TPU-client cache (the loader warns "different
      machine — may SIGILL" on reload otherwise).

    Must run before JAX initializes a backend; after that it silently leaves
    whatever devices exist.
    """
    import jax

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags
            + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
            + " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
        ).strip()
    try:
        jax.config.update("jax_platforms", "cpu")
        # Only after the platform override took: pointing an already-live
        # axon/TPU session at the CPU-only cache dir is exactly the
        # TPU/CPU cache mixing the docstring warns about.
        if cache_dir:
            enable_compilation_cache(cache_dir)
        if n_devices is not None and "xla_force_host_platform_device_count" not in flags:
            jax.config.update("jax_num_cpu_devices", n_devices)
    except Exception:
        pass  # backend already initialized — use whatever devices exist


def eval_chunks(n: int, batch_size: int):
    """Yield (indices, n_valid) for batched eval over ``n`` samples.

    ``indices`` always has length ``batch_size`` — the final chunk pads by
    repeating the last index so every jitted dispatch sees one static shape
    (one compile); callers use only the first ``n_valid`` results. The
    reference evaluates per-sample (eval_utils.py); batching changes
    throughput, not results."""
    bs = max(1, batch_size)
    for start in range(0, n, bs):
        idxs = list(range(start, min(start + bs, n)))
        n_valid = len(idxs)
        idxs += [idxs[-1]] * (bs - n_valid)
        yield idxs, n_valid
