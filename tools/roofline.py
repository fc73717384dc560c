"""Roofline analysis of the train step: XLA cost model vs measured time.

Compiles the bench-shaped train step, reads the executable's own cost
analysis (FLOPs + HBM bytes accessed), measures the per-step wall time the
way bench.py does (K-step scan, synced via device_get), and reports
utilization against the chip's peak compute and HBM bandwidth. The larger
of the two utilizations says how close the step is to its roofline — and
which wall it sits against.

Usage:
  python tools/roofline.py [--mode TG] [--height 192 --width 640 --batch 4]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# peak numbers per chip, by platform version (marketing peaks; bf16 MXU)
PEAKS = {
    # name: (TFLOP/s bf16, HBM GB/s)
    "v5e": (197.0, 819.0),
    "v4": (275.0, 1228.0),
    "v5p": (459.0, 2765.0),
    "v6e": (918.0, 1640.0),
    "cpu": (0.1, 10.0),  # meaningless, debug only
}


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mode", default="TG")
    p.add_argument("--height", type=int, default=192)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--k_steps", type=int, default=16)
    p.add_argument("--chip", default="v5e", choices=sorted(PEAKS))
    args = p.parse_args()

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
        mode=Mode[args.mode],
        threshold=9.22,
        w_d2_sim=0.0,
        compute_dtype="bfloat16",
    ).validate()

    models = T.build_models(cfg)
    variables = T.init_variables(cfg, models, jax.random.PRNGKey(0))
    tx = T.make_optimizer(cfg, steps_per_epoch=1000)
    state, frozen = T.create_train_state(cfg, models, variables, tx)
    step = T.make_multi_train_step(cfg, models, tx)

    k = args.k_steps
    colors, K = synthetic_batch(cfg.batch_size, cfg.height, cfg.width, seed=0)
    batches = {
        "colors_u8": jnp.broadcast_to(jnp.asarray(colors), (k,) + colors.shape),
        "K": jnp.broadcast_to(jnp.asarray(K), (k,) + K.shape),
    }
    rng = jax.random.PRNGKey(1)

    lowered = step.lower(state, frozen, batches, rng)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns one dict per device
        cost = cost[0]
    flops = float(cost.get("flops", 0.0)) / k  # per optimizer step
    bytes_hbm = float(cost.get("bytes accessed", 0.0)) / k

    # timed run, bench.py-style: device_get on the loss forces completion
    # through the axon tunnel (block_until_ready lies there)
    state2, frozen2, metrics, _ = compiled(state, frozen, batches, rng)
    float(jax.device_get(metrics["loss"]))
    rounds = 3
    t0 = time.perf_counter()
    for _ in range(rounds):
        state2, frozen2, metrics, _ = compiled(state2, frozen2, batches, rng)
        float(jax.device_get(metrics["loss"]))
    dt = (time.perf_counter() - t0) / (rounds * k)  # s per optimizer step

    peak_tflops, peak_gbs = PEAKS[args.chip]
    achieved_tflops = flops / dt / 1e12
    achieved_gbs = bytes_hbm / dt / 1e9
    util_compute = achieved_tflops / peak_tflops
    util_bw = achieved_gbs / peak_gbs

    print(
        json.dumps(
            {
                "mode": args.mode,
                "shape": f"{args.height}x{args.width} bs{args.batch}",
                "step_ms": round(dt * 1e3, 3),
                "frames_per_s": round(args.batch / dt, 1),
                "gflops_per_step": round(flops / 1e9, 2),
                "hbm_mb_per_step": round(bytes_hbm / 1e6, 1),
                "achieved_tflops": round(achieved_tflops, 2),
                "achieved_hbm_gbs": round(achieved_gbs, 1),
                "chip": args.chip,
                "util_compute": round(util_compute, 4),
                "util_bandwidth": round(util_bw, 4),
                "bound": "compute" if util_compute > util_bw else "bandwidth",
                "roofline_fraction": round(max(util_compute, util_bw), 4),
            }
        )
    )


if __name__ == "__main__":
    main()
