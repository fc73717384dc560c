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
