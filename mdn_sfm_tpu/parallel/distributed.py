"""Multi-host initialization (the reference is single-process; SURVEY.md §5
defines the TPU-native equivalent: jax.distributed over DCN + per-host data
shards + one global Mesh('data'))."""

from __future__ import annotations

import os


def maybe_initialize_distributed() -> bool:
    """Initialize the JAX global runtime when launched as one process per
    host (standard TPU pod env vars or explicit MDN_COORDINATOR).

    Returns True if multi-host mode is active. Safe no-op on a single host.
    """
    import jax

    coordinator = os.environ.get("MDN_COORDINATOR")
    num_processes = int(os.environ.get("MDN_NUM_PROCESSES", "0"))
    process_id = int(os.environ.get("MDN_PROCESS_ID", "-1"))

    if coordinator and num_processes > 1 and process_id >= 0:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True

    # TPU pods provide discovery through the runtime: initialize() with no
    # args when the env advertises multiple processes.
    if os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",") >= 1:
        try:
            jax.distributed.initialize()
            return True
        except Exception:
            return False
    return False


def barrier(name: str, timeout_ms: int = 1_200_000) -> None:
    """Rendezvous all processes through the coordination service (NOT a
    device collective — works before any communicator exists).

    Needed because cross-host communicator setup has short handshake
    timeouts (Gloo's KV exchange on CPU is ~30 s), while the first train-step
    compile can take minutes and skew across hosts; hosts must align their
    first collective dispatch, not just their process start. No-op on a
    single process."""
    import jax

    if jax.process_count() <= 1:
        return
    from jax._src import distributed  # no public barrier API as of jax 0.9

    client = distributed.global_state.client
    if client is not None:
        client.wait_at_barrier(name, timeout_ms)
