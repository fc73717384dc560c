"""Throughput of the train-split mask-precompute device paths.

Compares, at the production 1024-edge input shape on synthetic 375x1242
street frames (random weights — identical compute graph):

  predict       per-image dispatch, f32 padded input (24 MB) up, max_det
                full-res instance masks (~15 MB) down   [the GT-tooling API]
  union-batch   predict_union_batch: vmapped batch, uint8 resized input
                (~3.8 MB) up, one union mask (~0.5 MB) down per image
                [what tools/precompute_masks.py uses]

Prints one JSON line {"predict_s_per_img": ..., "union_batch_s_per_img":
..., "speedup": ...}. On tunnel-attached chips the transfer dominates; on
PCIe hosts the gap narrows but the union path still moves ~40x less data.

Usage: python tools/bench_precompute.py [--n 16] [--batch 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=16)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--max_det", type=int, default=32)
    args = p.parse_args()

    from mdn_sfm_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import numpy as np
    from fixtures import make_street_scene

    from mdn_sfm_tpu.masks.maskrcnn import MaskRCNNBackend

    backend = MaskRCNNBackend(max_det=args.max_det)
    # trim to a batch multiple: a trailing partial batch would jit a fresh
    # specialization INSIDE the timed region and corrupt the comparison
    args.n -= args.n % args.batch
    imgs = [make_street_scene(375, 1242, seed=i)[0] for i in range(args.n)]

    # warm both programs (compile)
    backend.predict(imgs[0])
    backend.predict_union_batch(imgs[: args.batch])

    t0 = time.perf_counter()
    for im in imgs:
        backend.predict(im)
    t_predict = (time.perf_counter() - t0) / args.n

    t0 = time.perf_counter()
    for i in range(0, args.n, args.batch):
        backend.predict_union_batch(imgs[i : i + args.batch])
    t_union = (time.perf_counter() - t0) / args.n

    print(json.dumps({
        "n": args.n,
        "batch": args.batch,
        "predict_s_per_img": round(t_predict, 4),
        "union_batch_s_per_img": round(t_union, 4),
        "speedup": round(t_predict / t_union, 2),
    }))


if __name__ == "__main__":
    main()
