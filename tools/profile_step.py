"""Capture a device profile of the train step and print the hottest ops.

Runs the same 640×192 bs4 TG-mode K-step dispatch as bench.py under
``jax.profiler.trace``, then parses the written ``.xplane.pb`` directly
(tensorflow.tsl xplane proto — the tensorboard profile plugin's converter
is broken against this TF build) and aggregates XEvent durations by op
name on the device planes.

Usage:
    python tools/profile_step.py [--height 192 --width 640 --batch 4 \
        --k 8 --mode TG --top 40] [--provider maskrcnn]

Prints one line per op: total ms across the dispatch, % of device time,
occurrence count — the ground truth for deciding what to optimize next
(PARITY.md perf log).
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(args) -> str:
    from mdn_sfm_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from mdn_sfm_tpu import training as T
    from mdn_sfm_tpu.config import Config, Mode
    from mdn_sfm_tpu.data.synthetic import synthetic_batch

    cfg = Config(
        height=args.height,
        width=args.width,
        batch_size=args.batch,
        mode=Mode(args.mode),
        threshold=9.22,
        w_d2_sim=0.05 if args.mode in ("DS", "DC") else 0.0,
        mask_provider=args.provider,
        d2_allow_random_weights=True,  # profiling tool: compute shape matters, weights do not
        compute_dtype="bfloat16",
    ).validate()

    models = T.build_models(cfg)
    variables = T.init_variables(cfg, models, jax.random.PRNGKey(0))
    tx = T.make_optimizer(cfg, steps_per_epoch=1000)
    state, frozen = T.create_train_state(cfg, models, variables, tx)

    mask_fn = None
    if args.provider == "maskrcnn":
        from mdn_sfm_tpu.masks.maskrcnn import MaskRCNNProvider

        prov = MaskRCNNProvider(cfg)
        frozen = dict(frozen)
        frozen["maskrcnn"] = prov.variables
        mask_fn = prov.union_fn

    kstep = T.make_multi_train_step(cfg, models, tx, mask_fn=mask_fn)

    colors, K = synthetic_batch(args.batch * args.k, args.height, args.width, seed=0)
    batches = {
        "colors_u8": jnp.asarray(colors.reshape(args.k, args.batch, *colors.shape[1:])),
        "K": jnp.asarray(K.reshape(args.k, args.batch, 4, 4)),
    }
    rng = jax.random.PRNGKey(1)

    # warmup/compile, synced by host transfer (tunnel: block_until_ready lies)
    state, frozen, metrics, _ = kstep(state, frozen, batches, rng)
    print(f"warmup loss={float(jax.device_get(metrics['loss'])):.5f}", file=sys.stderr)

    os.makedirs(args.trace_dir, exist_ok=True)
    jax.profiler.start_trace(args.trace_dir)
    state, frozen, metrics, _ = kstep(state, frozen, batches, rng)
    float(jax.device_get(metrics["loss"]))
    jax.profiler.stop_trace()
    return args.trace_dir


def report(trace_dir: str, top: int, k_steps: int) -> None:
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        print(f"no .xplane.pb under {trace_dir}", file=sys.stderr)
        sys.exit(1)

    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())

    def category(name: str) -> str:
        if "convolution" in name or name.startswith("%cudnn"):
            return "convolution"
        for tag in ("copy-start", "copy-done", "slice-start", "slice-done",
                    "dynamic-update-slice-start", "dynamic-update-slice-done"):
            if tag in name:
                return "async copy/slice (DMA)"
        if name.startswith("%copy"):
            return "copy"
        if "fusion" in name:
            return "fusion"
        if "all-reduce" in name or "all-gather" in name:
            return "collective"
        return "other"

    # device planes: '/device:TPU:0'; the 'XLA Ops' line holds the flat leaf
    # ops, other lines (XLA Modules, Steps) hold enclosing events — keep them
    # separate or everything triple-counts
    for plane in space.planes:
        if not plane.name.startswith("/device:"):
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            totals: dict[str, float] = defaultdict(float)
            counts: dict[str, int] = defaultdict(int)
            cats: dict[str, float] = defaultdict(float)
            line_total = 0.0
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                ms = ev.duration_ps / 1e9
                totals[name] += ms
                counts[name] += 1
                cats[category(name)] += ms
                line_total += ms
            if not totals:
                continue
            print(f"\n== {plane.name} / line '{line.name}' — {line_total:.2f} ms "
                  f"({line_total / max(k_steps, 1):.2f} ms/step over {k_steps} steps) ==")
            if line.name != "XLA Ops":
                for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:5]:
                    print(f"{ms:9.3f} {counts[name]:6d}  {name[:100]}")
                continue
            print("-- categories --")
            for c, ms in sorted(cats.items(), key=lambda kv: -kv[1]):
                print(f"{ms:9.3f} {100 * ms / line_total:6.2f}  {c}")
            print(f"-- top ops --\n{'total ms':>9} {'%':>6} {'count':>6}  op")
            for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:top]:
                print(f"{ms:9.3f} {100 * ms / line_total:6.2f} {counts[name]:6d}  {name[:110]}")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=192)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--k", type=int, default=8)
    p.add_argument("--mode", default="TG")
    p.add_argument("--provider", default="none")
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--trace_dir", default="/tmp/mdn_profile")
    p.add_argument("--report_only", action="store_true",
                   help="skip capture; parse an existing trace_dir")
    args = p.parse_args()
    if not args.report_only:
        capture(args)
    report(args.trace_dir, args.top, args.k)


if __name__ == "__main__":
    main()
