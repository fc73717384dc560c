"""End-to-end sustained-throughput bench: the REAL train loop, input included.

``bench.py`` measures the device step on synthetic in-memory batches;
``tools/bench_loader.py`` measures host decode alone. Neither answers the
production question: what does the full `Trainer` loop sustain when the input
pipeline (HostLoader native C++ decode of full-res 375x1242 PNGs -> resize ->
device placement -> K-step scan dispatch) actually has to keep the chip fed?
(Reference analog: the 12-worker DataLoader budget, options.py:175-178 —
the reference hides decode cost behind worker processes; we measure it.)

Protocol: write N synthetic full-res KITTI PNG triplets to disk (same
``make_raw_drive`` fixture as bench_loader.py, so numbers are comparable),
point the real ``Trainer`` at them via a temporary split manifest, run one
warm-up epoch (compile + page cache), then time whole epochs until a window
is filled. Reported frames/s is wall-clock inclusive of decode, host->device
transfer and dispatch. Alongside it: the same dataset's loader-only
triplets/s in this process, and the implied host-core requirement to feed
one chip at the compute-only rate (bench.py's number, passed via
``--compute_fps``).

Usage: python tools/bench_e2e.py [--n_items 200] [--window 60]
                                 [--workers 4] [--compute_fps 262]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import tempfile
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n_items", type=int, default=200,
                   help="synthetic full-res triplets on disk")
    p.add_argument("--window", type=float, default=60.0,
                   help="timed window in seconds (whole epochs)")
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--steps_per_dispatch", type=int, default=16)
    p.add_argument("--height", type=int, default=192)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--mode", default="TG")
    p.add_argument("--compute_fps", type=float, default=262.0,
                   help="compute-only frames/s from `python bench.py` on the "
                        "same chip/shape, for the implied-core calculation")
    p.add_argument("--cache", action="store_true",
                   help="enable the decoded-sample disk cache "
                        "(--cache_decoded); the warm-up epoch fills it, the "
                        "timed window measures the memmap read path")
    args = p.parse_args()

    from mdn_sfm_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import jax
    from fixtures import make_raw_drive

    from mdn_sfm_tpu.config import Config, Mode
    from mdn_sfm_tpu.data.loader import HostLoader
    from mdn_sfm_tpu.trainer import Trainer

    split_name = "_bench_e2e_tmp"
    split_dir = os.path.join(_ROOT, "splits", split_name)
    data_root = tempfile.mkdtemp(prefix="mdn_bench_e2e_")
    log_dir = tempfile.mkdtemp(prefix="mdn_bench_e2e_log_")
    try:
        print(f"writing {args.n_items} synthetic 375x1242 PNG triplets...")
        lines = make_raw_drive(data_root, n_frames=args.n_items + 2, h=375, w=1242)
        os.makedirs(split_dir, exist_ok=True)
        with open(os.path.join(split_dir, "train_files.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")

        cfg = Config(
            data_path=data_root,
            data_root=data_root,  # no data_scene_flow inside -> no val set
            log_dir=log_dir,
            split=split_name,
            height=args.height,
            width=args.width,
            batch_size=args.batch_size,
            mode=Mode[args.mode],
            steps_per_dispatch=args.steps_per_dispatch,
            num_workers=args.workers,
            num_epochs=10_000,          # epochs are driven manually below
            save_frequency=10**9,       # no mid-window checkpoint writes
            log_frequency=10**9,
            v_save="bench_e2e",
            cache_decoded=os.path.join(data_root, "_cache") if args.cache else "",
        )
        trainer = Trainer(cfg)

        # loader-only throughput on the identical dataset, in this process
        # (the e2e loop below overlaps this with device work via the worker
        # threads; reporting it separately shows which side binds)
        loader = HostLoader(trainer.train_loader.dataset, args.batch_size,
                            shuffle=False, num_workers=args.workers,
                            drop_last=True)
        next(iter(loader))  # warm the .so / page cache
        t0 = time.perf_counter()
        n_rows = sum(a[0].shape[0] for (a, _i) in loader)
        loader_fps = n_rows / (time.perf_counter() - t0)
        print(f"loader-only: {loader_fps:.1f} triplets/s "
              f"({args.workers} worker threads, this host"
              f"{', cache cold fill' if args.cache else ''})")
        if args.cache:
            # second pass reads the now-warm memmap cache — the steady-state
            # epoch-2+ input rate the timed window below actually sees
            t0 = time.perf_counter()
            n_rows = sum(a[0].shape[0] for (a, _i) in loader)
            loader_fps = n_rows / (time.perf_counter() - t0)
            print(f"loader-only (cache warm): {loader_fps:.1f} triplets/s")

        # manual train() preamble: epoch loop without signal handlers/saves
        trainer.epoch = 0
        trainer.step = trainer.start_step
        trainer.idx_save = trainer.start_idx_save
        trainer.start_time = time.time()
        trainer._skip_batches = 0

        print("warm-up epoch (compile + caches)...")
        trainer.run_epoch()
        # sync: pull the step counter THROUGH the last dispatch's result
        # (jax.block_until_ready can return early through the axon tunnel)
        int(jax.device_get(trainer.state.step))

        print(f"timed window (>= {args.window:.0f}s of whole epochs)...")
        step0 = trainer.step
        epochs = 0
        t0 = time.perf_counter()
        while True:
            trainer.epoch += 1
            trainer.run_epoch()
            int(jax.device_get(trainer.state.step))
            epochs += 1
            dt = time.perf_counter() - t0
            if dt >= args.window:
                break
        steps = trainer.step - step0
        frames = steps * args.batch_size
        e2e_fps = frames / dt

        implied_cores = args.compute_fps / max(loader_fps, 1e-9)
        result = {
            "metric": "e2e_train_frames_per_s",
            "value": round(e2e_fps, 2),
            "unit": "frames/s",
            "loader_only_triplets_per_s": round(loader_fps, 2),
            "compute_only_frames_per_s": args.compute_fps,
            "implied_host_cores_to_feed_chip": math.ceil(implied_cores * 10) / 10,
            "host_cores": os.cpu_count(),
            "steps": steps,
            "epochs": epochs,
            "window_s": round(dt, 2),
            "shape": f"{args.height}x{args.width} bs{args.batch_size} "
                     f"{args.mode} K={args.steps_per_dispatch}",
            "workers": args.workers,
            "cache": args.cache,
        }
        print(json.dumps(result))
    finally:
        shutil.rmtree(split_dir, ignore_errors=True)
        shutil.rmtree(data_root, ignore_errors=True)
        shutil.rmtree(log_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
