"""Mobile-object ground-truth mask tooling
(reference: generate_mobile_gt_d2.py:39-198).

Two phases:
1. ``predict``: run the instance-segmentation model over the 200 KITTI
   semantics images and dump per-instance mask PNGs to
   ``{pred_output}/{sample}/{instance}.png``. Driven by the configured mask
   backend (our Mask R-CNN port); with ``--from_semantic_gt`` the instances
   come directly from the KITTI semantic instance maps (no model needed).
2. ``generate_masks``: union the manually chosen moving-instance ids listed
   in ``{gt_output}/instance_numbers.txt`` into binary GT masks
   ``{gt_output}/{n}.png`` (reference :173-197).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mdn_sfm_tpu.labels import kitti_decode  # noqa: E402
from mdn_sfm_tpu.native import mask_union  # noqa: E402


def get_argparser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", type=str, default="kitti/data_semantics/training/image_2",
                        help="directory of images to predict instances on")
    parser.add_argument("--instance_dir", type=str, default="kitti/data_semantics/training/instance",
                        help="KITTI semantic instance maps (for --from_semantic_gt)")
    parser.add_argument("--pred_output", type=str,
                        default="output/prediction/detectron2/pred_masks",
                        help="where per-instance mask PNGs are dumped")
    parser.add_argument("--gt_output", type=str,
                        default="output/mobile_objects_ground_truth",
                        help="where the final GT masks are written")
    parser.add_argument("--phase", choices=["predict", "generate_masks"],
                        default="generate_masks")
    parser.add_argument("--from_semantic_gt", action="store_true",
                        help="derive per-instance masks from the KITTI semantic "
                             "instance maps instead of a model")
    parser.add_argument("--n_samples", type=int, default=200)
    parser.add_argument("--weights", type=str, default="",
                        help="detectron2 .pth for the predict phase")
    parser.add_argument("--spatial_shards", type=int, default=0,
                        help="shard the full-res Mask R-CNN input spatially "
                             "(image width) over this many chips — cuts "
                             "single-image latency when >1 chip is attached "
                             "(0 = single device)")
    return parser


def _imwrite(path: str, arr: np.ndarray) -> None:
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr.astype(np.uint8)).save(path)


def predict_from_semantic_gt(args) -> None:
    """Dump one PNG per thing-class instance from the KITTI instance maps —
    a model-free stand-in for the reference's detectron2 ``predict`` phase
    (generate_mobile_gt_d2.py:130-170); the manual selection step is the same.
    """
    from PIL import Image

    files = sorted(
        f for f in os.listdir(args.instance_dir) if f.endswith("_10.png")
    )[: args.n_samples]
    for n, fname in enumerate(files):
        with Image.open(os.path.join(args.instance_dir, fname)) as im:
            inst = np.asarray(im)
        i = 0
        for label in np.unique(inst):
            if kitti_decode(int(label)) in (0, 255):
                continue
            mask = np.where(inst == label, 255, 0).astype(np.uint8)
            _imwrite(os.path.join(args.pred_output, str(n), f"{i}.png"),
                     np.repeat(mask[..., None], 3, -1))
            i += 1
        print(f"{n}: {i} instances")


def predict_with_model(args) -> None:
    """Run the mask backend over the input images (reference phase 1)."""
    from mdn_sfm_tpu.masks.maskrcnn import MaskRCNNBackend  # lazy: heavy

    mesh = None
    if args.spatial_shards > 1:
        from mdn_sfm_tpu.parallel import make_spatial_mesh

        mesh = make_spatial_mesh(args.spatial_shards)
    if not args.weights:
        print("WARNING: no --weights given — predicting with RANDOM Mask R-CNN "
              "weights; the dumped instance masks will be garbage.", flush=True)
    backend = MaskRCNNBackend(weights_path=args.weights or None, mesh=mesh)
    files = sorted(
        os.path.join(args.input, f)
        for f in os.listdir(args.input)
        if f.lower().endswith((".png", ".jpg", ".jpeg"))
    )[: args.n_samples]
    print(f"There are {len(files)} images to predict.")
    from PIL import Image

    for n, path in enumerate(files):
        with Image.open(path) as im:
            img = np.asarray(im.convert("RGB"))
        masks, boxes, classes, scores = backend.predict(img)
        for i, mask in enumerate(masks):
            _imwrite(os.path.join(args.pred_output, str(n), f"{i}.png"),
                     np.repeat((mask * 255)[..., None], 3, -1))


def generate_masks(args) -> None:
    """(reference: generate_mobile_gt_d2.py:173-197)"""
    from PIL import Image

    numbers_file = os.path.join(args.gt_output, "instance_numbers.txt")
    with open(numbers_file) as f:
        instance_numbers = [line.split() for line in f.readlines()]
    assert len(instance_numbers) == args.n_samples, "Invalid instance numbers input!"

    for n in range(args.n_samples):
        masks = []
        for num in instance_numbers[n]:
            p = os.path.join(args.pred_output, str(n), f"{num}.png")
            with Image.open(p) as im:
                masks.append(np.asarray(im.convert("L")))
        if masks:
            gt = mask_union(np.stack(masks)) * 255
        else:
            gt = np.zeros((1, 1), np.uint8)
        _imwrite(os.path.join(args.gt_output, f"{n}.png"), gt)
    print(f"Wrote {args.n_samples} GT masks to {args.gt_output}")


if __name__ == "__main__":
    args = get_argparser().parse_args()
    if args.phase == "predict":
        if args.from_semantic_gt:
            predict_from_semantic_gt(args)
        else:
            predict_with_model(args)
    else:
        generate_masks(args)
