"""Precompute reference-fidelity DS/DC union masks for a TRAINING split.

The reference supervises DS/DC with LIVE detectron2 inference on every
batch at shortest-edge-1024 resolution (reference: trainer.py:278-279,
utils.py:53-74). Our live ``MaskRCNNProvider`` instead runs at
``d2_infer_scale``x the training resolution for speed, and its union masks
measurably deviate from the 1024-edge pipeline (union-IoU 0.79 @ scale 2 —
tools/quantify_d2_scale.py; PARITY.md "d2 inference resolution"). This tool
makes the STRICT workflow real: walk a split manifest, run the 1024-edge
``MaskRCNNBackend`` (the exact pipeline the GT tooling uses) over every
TARGET frame, and write ``{mask_dir}/{key}.png`` union masks under the
trainer's canonical key scheme (``data/splits.py::sample_key``), ready for

    python train.py --mode DS --mask_provider precomputed \
        --mask_dir <mask_dir> --disable_augment ...

Train with ``--disable_augment``: precomputed masks cannot follow the
on-device flip/zoom-crop (the live fused provider sees the augmented frame;
the trade-off is documented in PARITY.md's quirk table).

Resumable: existing mask files are skipped unless ``--overwrite``; shard a
big split across machines with ``--shard_index/--shard_count``.

Usage:
  python tools/precompute_masks.py --data_path /data/kitti_raw \
      --weights log/model_final_detectron2.pth [--split eigen_zhou]
      [--subset train] [--mask_dir output/prediction/detectron2/pred_masks]
      [--spatial_shards N] [--limit N] [--shard_index I --shard_count C]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from typing import Iterable

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mdn_sfm_tpu.data.splits import (  # noqa: E402
    read_split_lines,
    sample_key,
    split_path,
)


def manifest_items(
    data_path: str, lines, img_ext: str = ".jpg"
) -> list[tuple[str, str]]:
    """Deduped, sorted (trainer-sample-key, target-frame-path) pairs for a
    split manifest — the exact key scheme the trainer's mask provider looks
    up (data/splits.py::sample_key, trainer.py::_initialize_dataset)."""
    from mdn_sfm_tpu.data.kitti import SIDE_MAP

    seen: dict[str, str] = {}
    for ln in lines:
        key = sample_key(ln)
        if key in seen:
            continue
        seen[key] = os.path.join(
            data_path, ln.folder,
            f"image_0{SIDE_MAP[ln.side]}/data",
            f"{ln.frame_index:010d}{img_ext}",
        )
    return sorted(seen.items())


def precompute_masks(
    backend,
    items: Iterable[tuple[str, "str | np.ndarray"]],
    mask_dir: str,
    overwrite: bool = False,
    log_every: int = 25,
    batch: int = 1,
) -> dict:
    """Run the backend over ``items`` of (key, image-path-or-RGB-array) and
    write ``{mask_dir}/{key}.png`` binary union masks (0/255, mode L).

    ``batch`` > 1 groups consecutive SAME-SIZE images into one vmapped
    device dispatch (``MaskRCNNBackend.predict_batch``) — the per-image
    dispatch/transfer otherwise dominates a 22k-frame sweep. KITTI raw
    drives have a handful of distinct frame sizes; consecutive sorted keys
    share a drive, so groups flush rarely.

    Shared by the CLI below and the fixture-world e2e test — the test proves
    the written files round-trip through PrecomputedMaskProvider with the
    trainer's keys. Returns {"written", "skipped", "failed", "empty"}.
    """
    from PIL import Image

    os.makedirs(mask_dir, exist_ok=True)
    stats = {"written": 0, "skipped": 0, "failed": 0, "empty": 0}
    t0 = time.time()
    # the union-only / u8-input program moves ~40× less data per image than
    # predict() (no per-instance full-res masks, no f32 padded input) —
    # always preferred when the backend has it (spatial-mesh backends don't)
    use_union = getattr(backend, "_run_union_u8_batch", None) is not None
    pending: list[tuple[str, np.ndarray, str]] = []  # (key, img, out_path)

    def flush():
        if not pending:
            return
        if use_union:
            unions = backend.predict_union_batch([p[1] for p in pending])
        else:
            unions = [
                np.any(m != 0, axis=0) if len(m) else
                np.zeros(p[1].shape[:2], np.uint8)
                for p, (m, _, _, _) in
                zip(pending, (backend.predict(p[1]) for p in pending))
            ]
        for (key, img, out_path), union in zip(pending, unions):
            union = np.asarray(union, np.uint8)
            if not union.any():
                stats["empty"] += 1
            Image.fromarray(union * np.uint8(255), mode="L").save(out_path)
            stats["written"] += 1
            if log_every and stats["written"] % log_every == 0:
                rate = stats["written"] / max(time.time() - t0, 1e-9)
                print(f"written={stats['written']} ({rate:.2f} masks/s)",
                      file=sys.stderr, flush=True)
        pending.clear()

    for key, src in items:
        out_path = os.path.join(mask_dir, f"{key}.png")
        if not overwrite and os.path.exists(out_path):
            stats["skipped"] += 1
            continue
        if isinstance(src, str):
            if not os.path.exists(src):
                print(f"MISSING image for {key}: {src}", file=sys.stderr)
                stats["failed"] += 1
                continue
            with Image.open(src) as im:
                img = np.asarray(im.convert("RGB"))
        else:
            img = np.asarray(src)
        if pending and (
            len(pending) >= max(batch, 1)
            or pending[0][1].shape != img.shape
        ):
            flush()
        pending.append((key, img, out_path))
    flush()
    return stats


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_path", required=True, help="KITTI raw root")
    p.add_argument("--split", default="eigen_zhou",
                   help="split name under splits/ (or an absolute split dir)")
    p.add_argument("--subset", default="train", choices=["train", "val"])
    p.add_argument("--mask_dir", default="output/prediction/detectron2/pred_masks",
                   help="output dir — must match the training run's --mask_dir")
    p.add_argument("--weights", default="",
                   help="detectron2 .pth (model_final_detectron2.pth)")
    p.add_argument("--allow_random_weights", action="store_true",
                   help="proceed without weights (RANDOM masks — tests only)")
    p.add_argument("--img_ext", default=".jpg", help=".jpg or .png raw frames")
    p.add_argument("--limit", type=int, default=0, help="stop after N keys")
    p.add_argument("--shard_index", type=int, default=0)
    p.add_argument("--shard_count", type=int, default=1,
                   help="process keys [shard_index::shard_count] (fan out "
                        "across machines; output files are disjoint)")
    p.add_argument("--overwrite", action="store_true")
    p.add_argument("--batch", type=int, default=8,
                   help="same-size images per vmapped device dispatch "
                        "(1 = per-image; incompatible with --spatial_shards)")
    p.add_argument("--max_det", type=int, default=32)
    p.add_argument("--score_thresh", type=float, default=0.3,
                   help="reference cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST "
                        "(trainer.py:175)")
    p.add_argument("--spatial_shards", type=int, default=0,
                   help="shard the full-res backbone spatially over N chips "
                        "(parallel.make_spatial_mesh; 0 = single device)")
    p.add_argument("--input_hw", default="",
                   help="static backend input 'H,W' override (default: the "
                        "1024-edge KITTI shape 640,2048)")
    args = p.parse_args()

    if not args.weights and not args.allow_random_weights:
        raise SystemExit(
            "refusing to precompute DS/DC supervision masks with RANDOM "
            "Mask R-CNN weights — pass --weights model_final_detectron2.pth "
            "(or --allow_random_weights for tests)"
        )

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    lines = read_split_lines(split_path(repo_root, args.split, args.subset))
    items = manifest_items(args.data_path, lines, args.img_ext)[
        args.shard_index::args.shard_count
    ]
    if args.limit:
        items = items[: args.limit]
    print(f"{len(items)} unique target frames to mask "
          f"(shard {args.shard_index}/{args.shard_count})", file=sys.stderr)

    from mdn_sfm_tpu.masks.maskrcnn import MaskRCNNBackend

    mesh = None
    if args.spatial_shards > 1:
        from mdn_sfm_tpu.parallel import make_spatial_mesh

        mesh = make_spatial_mesh(args.spatial_shards)
    input_hw = None
    if args.input_hw:
        input_hw = tuple(int(v) for v in args.input_hw.split(","))
    backend = MaskRCNNBackend(
        weights_path=args.weights or None, max_det=args.max_det,
        score_thresh=args.score_thresh, input_hw=input_hw, mesh=mesh,
    )
    stats = precompute_masks(backend, items, args.mask_dir,
                             overwrite=args.overwrite,
                             batch=1 if mesh is not None else args.batch)
    print(json.dumps({"mask_dir": args.mask_dir, **stats}))


if __name__ == "__main__":
    main()
