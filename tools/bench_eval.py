"""Eval-CLI throughput bench: evaluate_mix samples/sec at a given
--eval_batch_size on a synthetic KITTI-2015 fixture world.

The reference evaluates one sample at a time with dozens of eager ops per
sample (evaluate_mix.py:58-85); our eval path batches eval_batch_size
samples into ONE jitted dispatch. On tunnel-attached TPUs (per-dispatch RTT
~10 ms) the batching win is mostly dispatch amortization; on a local host
it is device utilization. A/B with:

    python tools/bench_eval.py --n 32 --eval_batch_size 1
    python tools/bench_eval.py --n 32 --eval_batch_size 8
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=32)
    ap.add_argument("--height", type=int, default=192)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--eval_batch_size", type=int, default=8)
    args = ap.parse_args()

    from mdn_sfm_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import numpy as np

    from fixtures import make_gt_masks, make_kitti2015

    from mdn_sfm_tpu import checkpoints as ckpt
    from mdn_sfm_tpu import training as T
    from mdn_sfm_tpu.config import Config

    import evaluate_mix

    tmp = tempfile.mkdtemp(prefix="mdn_bench_eval_")
    root = os.path.join(tmp, "kitti")
    gt_dir = os.path.join(tmp, "gt")
    log_dir = os.path.join(tmp, "log")
    make_kitti2015(root, n=args.n, h=args.height, w=args.width)
    make_gt_masks(gt_dir, n=args.n, h=args.height, w=args.width)

    cfg = Config(
        height=args.height, width=args.width, data_root=root, log_dir=log_dir,
        gt_mask_path=gt_dir, eval_out_dir=os.path.join(tmp, "out"),
        eval_num_samples=args.n, eval_batch_size=args.eval_batch_size,
        load_weights_folder=ckpt.weights_folder(log_dir, "v0", 0),
        version="v1", idx=0, w_d2_sim=0.0,
    ).validate()

    # random checkpoints in the reference layout (throughput only)
    models = T.build_models(cfg)
    variables = T.init_variables(cfg, models, jax.random.PRNGKey(0))
    ckpt.save_checkpoint(
        ckpt.weights_folder(log_dir, "v0", 0), variables,
        models_to_save=("flownet", "posenet"))
    ckpt.save_checkpoint(
        ckpt.weights_folder(log_dir, "v1", 0), variables,
        models_to_save=("mobile_decoder",))

    result = evaluate_mix.evaluate(cfg)  # warm-up (compile)
    assert np.all(np.isfinite(result)), result
    t0 = time.perf_counter()
    evaluate_mix.evaluate(cfg)
    dt = time.perf_counter() - t0
    print(f"evaluate_mix: {args.n} samples in {dt:.1f}s (warm) = "
          f"{args.n / dt:.2f} samples/s at eval_batch_size={args.eval_batch_size}")


if __name__ == "__main__":
    main()
