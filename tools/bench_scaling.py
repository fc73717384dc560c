"""Batch-size / remat scaling study on the real chip.

For each (batch_size, remat) combination: compile the train step, report the
compiled HBM footprint (XLA ``memory_analysis``: temp = activations +
workspace, arguments = params/opt/batch), then time K-step scan dispatches
and report frames/s/chip.

The reference is single-GPU batch-4 only (trainer.py:69-71); production TPU
training picks the largest batch that fits HBM. ``--remat``
(config.remat → jax.checkpoint around the stacked-frame forward,
training.py::loss_from_batch) trades one forward of FLOPs for activation
memory — this tool measures both sides of that trade.

Usage:
    python tools/bench_scaling.py [--bs 4,8,16,32] [--remat off,on]
        [--mode TG] [--fine_tune] [--height 192] [--width 640] [--k 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def _fmt_bytes(n) -> str:
    if n is None:
        return "n/a"
    for unit in ("B", "KB", "MB", "GB"):
        if abs(n) < 1024 or unit == "GB":
            return f"{n:.2f} {unit}" if unit != "B" else f"{int(n)} B"
        n /= 1024
    return f"{n:.2f} GB"


def _memory_analysis(compiled):
    """Best-effort XLA memory analysis → dict of byte sizes (or None)."""
    try:
        ma = compiled.memory_analysis()
    except Exception:
        return None
    if ma is None:
        return None
    out = {}
    for k in (
        "temp_size_in_bytes",
        "argument_size_in_bytes",
        "output_size_in_bytes",
        "alias_size_in_bytes",
        "generated_code_size_in_bytes",
    ):
        out[k] = getattr(ma, k, None)
    return out


def run_one(mode_name: str, bs: int, remat: bool, fine_tune: bool,
            height: int, width: int, k_steps: int, rounds: int,
            accum: int = 1) -> dict:
    import jax
    import jax.numpy as jnp

    from mdn_sfm_tpu import training as T
    from mdn_sfm_tpu.config import Config, Mode
    from mdn_sfm_tpu.data.synthetic import synthetic_batch

    mode = Mode[mode_name]
    extra = {}
    if mode in (Mode.DS, Mode.DC):
        extra = dict(mask_provider="maskrcnn", d2_allow_random_weights=True,
                     d2_max_instances=32)
    cfg = Config(
        height=height, width=width, batch_size=bs, mode=mode, threshold=9.22,
        w_d2_sim=0.0, compute_dtype="bfloat16", remat=remat, accum_steps=accum,
        fine_tune_flow_motion=fine_tune, **extra,
    ).validate()

    models = T.build_models(cfg)
    variables = T.init_variables(cfg, models, jax.random.PRNGKey(0))
    tx = T.make_optimizer(cfg, steps_per_epoch=1000)
    state, frozen = T.create_train_state(cfg, models, variables, tx)
    mask_fn = None
    if cfg.mask_provider == "maskrcnn":
        from mdn_sfm_tpu.masks import build_mask_provider

        provider = build_mask_provider(cfg)
        frozen = dict(frozen)
        frozen["maskrcnn"] = provider.variables
        mask_fn = provider.union_fn

    kstep = T.make_multi_train_step(cfg, models, tx, unroll=1, mask_fn=mask_fn)

    colors, K = synthetic_batch(bs * k_steps, height, width, seed=0)
    colors = colors.reshape(k_steps, bs, *colors.shape[1:])
    K = K.reshape(k_steps, bs, 4, 4)
    batches = {"colors_u8": jnp.asarray(colors), "K": jnp.asarray(K)}
    rng = jax.random.PRNGKey(1)

    # compile via AOT lower so memory analysis is available pre-execution
    lowered = kstep.lower(state, frozen, batches, rng)
    compiled = lowered.compile()
    mem = _memory_analysis(compiled)

    # warmup dispatch, then timed rounds; sync with a real host transfer
    # (block_until_ready can return early through the axon tunnel)
    state, frozen, metrics, _ = kstep(state, frozen, batches, rng)
    float(jax.device_get(metrics["loss"]))
    t0 = time.perf_counter()
    for _ in range(rounds):
        state, frozen, metrics, _ = kstep(state, frozen, batches, rng)
    float(jax.device_get(metrics["loss"]))
    dt = time.perf_counter() - t0

    fps = bs * k_steps * rounds / dt
    row = {
        "mode": mode_name, "bs": bs, "remat": remat, "accum": accum,
        "fine_tune": fine_tune,
        "frames_per_s": round(fps, 1),
        "ms_per_step": round(1e3 * dt / (k_steps * rounds), 2),
    }
    if mem:
        row["hbm_temp"] = mem.get("temp_size_in_bytes")
        row["hbm_args"] = mem.get("argument_size_in_bytes")
        row["hbm_out"] = mem.get("output_size_in_bytes")
    return row


def main() -> None:
    from mdn_sfm_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    p = argparse.ArgumentParser()
    p.add_argument("--bs", default="4,8,16,32")
    p.add_argument("--remat", default="off", help="comma list of off/on")
    p.add_argument("--accum", default="1", help="comma list of accum_steps")
    p.add_argument("--mode", default="TG")
    p.add_argument("--fine_tune", action="store_true")
    p.add_argument("--height", type=int, default=192)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--k", type=int, default=8, help="steps per dispatch")
    p.add_argument("--rounds", type=int, default=3)
    args = p.parse_args()

    bss = [int(b) for b in args.bs.split(",")]
    remats = [r.strip() == "on" for r in args.remat.split(",")]
    accums = [int(a) for a in args.accum.split(",")]

    rows = []
    for bs in bss:
        for remat in remats:
            for accum in accums:
                try:
                    row = run_one(args.mode, bs, remat, args.fine_tune,
                                  args.height, args.width, args.k, args.rounds,
                                  accum=accum)
                except Exception as e:  # OOM at some batch size is a data point
                    row = {"mode": args.mode, "bs": bs, "remat": remat,
                           "accum": accum, "fine_tune": args.fine_tune,
                           "error": f"{type(e).__name__}: {str(e)[:200]}"}
                rows.append(row)
                print(json.dumps(row), flush=True)

    print(f"\n{args.mode} {args.height}x{args.width} K={args.k}"
          f"{' fine_tune' if args.fine_tune else ''}")
    print(f"{'bs':>4} {'remat':>6} {'accum':>6} {'f/s':>8} {'ms/step':>8} "
          f"{'HBM temp':>10} {'HBM args':>10}")
    for r in rows:
        if "error" in r:
            print(f"{r['bs']:>4} {str(r['remat']):>6} {r.get('accum', 1):>6}  {r['error']}")
        else:
            print(f"{r['bs']:>4} {str(r['remat']):>6} {r.get('accum', 1):>6} "
                  f"{r['frames_per_s']:>8} "
                  f"{r['ms_per_step']:>8} {_fmt_bytes(r.get('hbm_temp')):>10} "
                  f"{_fmt_bytes(r.get('hbm_args')):>10}")


if __name__ == "__main__":
    main()
