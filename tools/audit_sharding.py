"""Sharding / collective audit for the data-parallel train step.

Compiles the full train step over an N-device Mesh('data') and reports what
XLA SPMD actually emitted: every collective in the optimized HLO (kind,
occurrence count, total bytes moved per step) plus the compiled program's
memory analysis. This is the ground truth for the framework's scaling story
— data parallelism here is "annotate shardings, let XLA insert the
collectives" (SURVEY.md §5; no reference analog: the reference is single
process, single GPU, no distributed backend at all — trainer.py:35).

Expected shape of the result (the shard_map production path,
training.make_train_step(mesh=...)): a gradient all-reduce family
totalling ≈ the trainable-parameter bytes (the mobile decoder, plus
flow/pose when --fine_tune) plus the scalar loss-metric pmeans — and
NOTHING else. Every collective is one the step wrote explicitly; any
all-to-all / collective-permute / all-gather here is a regression.

--gspmd audits the legacy jit+GSPMD path instead (make_train_step without
a mesh, operands sharded). Round-3 finding: the partitioner invents
resharding collectives there — an all-to-all of the images into the
2B frame-stack forward before the interleaved layout fix, decoder-backward
collective-permutes, RPN top_k all-gathers (232 collective ops with the DS
provider fused; still ~85 after the layout fix). On the 1-core CPU test
mesh those rendezvous serialize and can trip XLA's 40 s collective
termination timeout (process abort); on a real pod they'd burn ICI for
nothing. That is WHY the production path is shard_map.

Runs anywhere: real chips or a virtual CPU mesh (default; no TPU needed).

Usage:
    python tools/audit_sharding.py [--n 8] [--mode TG] [--height 64
        --width 96] [--fine_tune] [--provider maskrcnn]
"""

from __future__ import annotations

import argparse
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
}

_COLLECTIVES = (
    "all-reduce", "all-gather", "reduce-scatter", "collective-permute",
    "all-to-all", "collective-broadcast",
)


def _shape_bytes(shape_str: str) -> int:
    """Total bytes of one HLO shape string, e.g. 'f32[3,3,16,32]{...}' or a
    tuple '(f32[4]{0}, u32[])'. Layout/tiling annotations are ignored."""
    total = 0
    for m in re.finditer(r"(\w+)\[([0-9,]*)\]", shape_str):
        dt, dims = m.group(1), m.group(2)
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def collect_collectives(hlo_text: str) -> dict[str, dict]:
    """Aggregate collective ops in optimized HLO: {kind: {count, bytes}}."""
    stats: dict[str, dict] = defaultdict(lambda: {"count": 0, "bytes": 0})
    for line in hlo_text.splitlines():
        line = line.strip()
        if " = " not in line:
            continue
        # '%name = <shape> all-reduce(...)' — shape may be a TUPLE with
        # spaces, '(f32[8]{0}, u32[])', so lazily consume up to the lowercase
        # op token right before its open paren (operand references inside the
        # shape never look like 'word(')
        m = re.match(r"(.*?)\s([a-z][\w\-]*)\(", line.split(" = ", 1)[1])
        if not m:
            continue
        shape_str, op = m.groups()
        # sync form: result shape = bytes moved. async pairs: count the
        # '-done' (its result shape is the true output; the '-start' tuple
        # carries (operand, result) and would double-count)
        kind = next((c for c in _COLLECTIVES if op == c or op == c + "-done"), None)
        if kind is None:
            continue
        stats[kind]["count"] += 1
        stats[kind]["bytes"] += _shape_bytes(shape_str)
    return dict(stats)


def audit(n: int, mode_name: str, height: int, width: int, batch: int,
          fine_tune: bool, provider: str, verbose: bool = True,
          gspmd: bool = False) -> dict:
    """Compile the sharded step and return
    {'collectives': {...}, 'param_bytes': N, 'memory': {...}}."""
    import jax

    if jax.local_device_count() < n:
        raise SystemExit(
            f"need {n} devices, have {jax.local_device_count()} — run with "
            f"JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count={n}"
        )
    import jax.numpy as jnp
    import numpy as np

    from mdn_sfm_tpu import training as T
    from mdn_sfm_tpu.config import Config, Mode
    from mdn_sfm_tpu.data.synthetic import synthetic_batch
    from mdn_sfm_tpu.parallel import make_mesh, replicate, shard_batch

    extra = {}
    if provider == "maskrcnn":
        extra = dict(mask_provider="maskrcnn", d2_allow_random_weights=True,
                     d2_max_instances=8)
    cfg = Config(
        height=height, width=width, batch_size=batch,
        mode=Mode(mode_name), w_d2_sim=0.0, compute_dtype="bfloat16",
        fine_tune_flow_motion=fine_tune, donate_state=False, **extra,
    ).validate()

    models = T.build_models(cfg)
    variables = T.init_variables(cfg, models, jax.random.PRNGKey(0))
    tx = T.make_optimizer(cfg, steps_per_epoch=100)
    state, frozen = T.create_train_state(cfg, models, variables, tx)
    mask_fn = None
    if provider == "maskrcnn":
        from mdn_sfm_tpu.masks import build_mask_provider

        prov = build_mask_provider(cfg)
        frozen = dict(frozen)
        frozen["maskrcnn"] = prov.variables
        mask_fn = prov.union_fn

    mesh = make_mesh(n)
    step = T.make_train_step(
        cfg, models, tx, mask_fn=mask_fn, mesh=None if gspmd else mesh
    )
    state = replicate(mesh, state)
    frozen = replicate(mesh, frozen)
    colors, K = synthetic_batch(batch, height, width, seed=0)
    sbatch = shard_batch(mesh, {"colors_u8": jnp.asarray(colors), "K": jnp.asarray(K)})
    rng = jax.random.PRNGKey(1)

    compiled = step.lower(state, frozen, sbatch, rng).compile()
    hlo = compiled.as_text()
    stats = collect_collectives(hlo)
    param_bytes = sum(
        np.prod(l.shape) * l.dtype.itemsize
        for l in jax.tree.leaves(jax.device_get(state.params))
    )
    mem = {}
    try:
        ma = compiled.memory_analysis()
        mem = {
            "argument_bytes": int(ma.argument_size_in_bytes),
            "output_bytes": int(ma.output_size_in_bytes),
            "temp_bytes": int(ma.temp_size_in_bytes),
            "peak_bytes": int(getattr(ma, "peak_memory_in_bytes", 0)),
        }
    except Exception:
        pass

    if verbose:
        print(f"mesh: {n}×'data' | mode {mode_name} | {height}×{width} bs{batch}"
              f"{' fine_tune' if fine_tune else ''}"
              f"{' +maskrcnn' if provider == 'maskrcnn' else ''}"
              f" | {'jit+GSPMD (legacy)' if gspmd else 'shard_map'}")
        print(f"trainable params: {param_bytes / 1e6:.2f} MB")
        if not stats:
            print("NO collectives emitted — the step is not actually sharded!")
        for kind, s in sorted(stats.items()):
            print(f"  {kind:<22} ×{s['count']:<3} {s['bytes'] / 1e6:8.2f} MB/step")
        for k, v in mem.items():
            print(f"  {k:<22} {v / 1e6:10.2f} MB")
        ar = stats.get("all-reduce", {"bytes": 0})
        if ar["bytes"]:
            print(f"  grad all-reduce / param bytes: {ar['bytes'] / param_bytes:.2f}×"
                  " (≈1 expected for pure DP; ≈2 with apply_if_finite's extra"
                  " finiteness reduction and loss-metric means)")
    return {"collectives": stats, "param_bytes": int(param_bytes), "memory": mem}


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=8)
    p.add_argument("--mode", default="TG")
    p.add_argument("--height", type=int, default=64)
    p.add_argument("--width", type=int, default=96)
    p.add_argument("--batch", type=int, default=0, help="global batch (default n)")
    p.add_argument("--fine_tune", action="store_true")
    p.add_argument("--provider", default="none")
    p.add_argument("--gspmd", action="store_true",
                   help="audit the legacy jit+GSPMD path instead of shard_map")
    args = p.parse_args()

    # virtual CPU mesh when real chips can't provide n devices (shared
    # recipe with conftest/dryrun_multichip — must run before backend init)
    from mdn_sfm_tpu.utils import force_virtual_cpu

    force_virtual_cpu(args.n)
    audit(args.n, args.mode, args.height, args.width, args.batch or args.n,
          args.fine_tune, args.provider, gspmd=args.gspmd)


if __name__ == "__main__":
    main()
