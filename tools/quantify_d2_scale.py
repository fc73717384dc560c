"""Quantify the live provider's `d2_infer_scale` resolution deviation.

The training-time ``MaskRCNNProvider`` infers at ``d2_infer_scale`` x the
training resolution (default 2x = 384x1280), while the reference upsamples
every frame to 375x1242 and runs detectron2 at shortest-edge-1024
(mono_dataset.py:111, utils.py:53-74; our GT-tooling ``MaskRCNNBackend``
keeps that 1024-edge pipeline). This tool measures how much the resulting
UNION MASKS — the actual DS/DC supervision signal — differ between the three
paths, with identical weights.

Real trained weights are not on this box, so the measurement uses the
crafted scale-covariant brightness detector (tests/fixtures.py::
craft_brightness_detector): its features are local mean brightness at every
resolution, so any disagreement is the PIPELINE's (anchor coverage at the
reduced res, FAST_BUDGET proposal pruning, bf16 ROIAlign, 28x28 mask
resolution, paste quantization) — the exact mechanisms that would shift
DS/DC supervision under the real weights.

Reports per-image and mean: union-mask IoU (provider@scale vs 1024-edge
backend, both binarized at training res) and detection-count deltas.
One JSON line at the end; paste the numbers into PARITY.md.

Usage: python tools/quantify_d2_scale.py [--n_images 6] [--scales 1 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n_images", type=int, default=6)
    p.add_argument("--scales", type=int, nargs="+", default=[1, 2])
    p.add_argument("--height", type=int, default=192)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--max_det", type=int, default=32)
    args = p.parse_args()

    from mdn_sfm_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import cv2
    import jax
    import jax.numpy as jnp
    import numpy as np
    from fixtures import craft_brightness_detector, make_street_scene

    import mdn_sfm_tpu.masks.maskrcnn as M
    from mdn_sfm_tpu.config import Config, Mode

    h, w = args.height, args.width

    # one crafted tree serves every consumer (param shapes are input-res
    # independent); built from shapes only — no real init forward needed
    template_model = M.MaskRCNN(max_det=args.max_det)
    shapes = jax.eval_shape(
        template_model.init, jax.random.PRNGKey(0),
        jnp.zeros((64, 64, 3)), jnp.array(64.0), jnp.array(64.0),
    )
    crafted = jax.tree.map(jnp.asarray, craft_brightness_detector(shapes))

    print("building 1024-edge backend (reference-res pipeline)...")
    backend = M.MaskRCNNBackend(max_det=args.max_det)
    backend.variables = crafted

    providers = {}
    for s in args.scales:
        cfg = Config(
            height=h, width=w, mode=Mode.DS, mask_provider="maskrcnn",
            d2_max_instances=args.max_det, d2_infer_scale=s,
            d2_allow_random_weights=True,
        ).validate()
        print(f"building provider @ scale {s} ({h * s}x{w * s})...")
        providers[s] = M.MaskRCNNProvider(cfg)
        providers[s].variables = crafted

    def provider_count(prov, img_u8, scale):
        """Detections the provider's model finds (its union_fn only returns
        the mask, so re-run its exact preprocessing + model here)."""
        from mdn_sfm_tpu.geometry import resize_bilinear

        ih, iw = h * scale, w * scale
        x = resize_bilinear(jnp.asarray(img_u8, jnp.float32)[None], ih, iw)[0]
        x = x[..., ::-1] - jnp.asarray(M.PIXEL_MEAN_BGR, jnp.float32)
        det = jax.jit(prov.model.apply)(
            prov.variables, x, jnp.float32(ih), jnp.float32(iw))
        return int(jax.device_get(det.valid).sum())

    rows = []
    for i in range(args.n_images):
        img, gt = make_street_scene(h=375, w=1242, n_objects=3, seed=i)
        masks, _boxes, _cls, _scores = backend.predict(img)
        n_backend = masks.shape[0]
        union_full = masks.any(axis=0).astype(np.float32)
        # training-res comparison grid (the DS/DC loss consumes this res)
        ref = cv2.resize(union_full, (w, h), interpolation=cv2.INTER_AREA) > 0.5
        gt_small = cv2.resize(gt.astype(np.float32), (w, h),
                              interpolation=cv2.INTER_AREA) > 0.5

        row = {"image": i, "n_backend": n_backend,
               "backend_iou_vs_gt": _iou(ref, gt_small)}
        for s, prov in providers.items():
            u = np.asarray(prov.union_masks_from_images(img[None], h, w))[0] > 0.5
            row[f"iou_s{s}"] = _iou(u, ref)
            row[f"n_s{s}"] = provider_count(prov, img, s)
        rows.append(row)
        print(row)

    summary = {
        "metric": "d2_infer_scale_union_mask_iou_vs_1024edge",
        "n_images": args.n_images,
        "mean_backend_iou_vs_gt": round(
            float(np.mean([r["backend_iou_vs_gt"] for r in rows])), 4),
        "mean_n_backend": round(float(np.mean([r["n_backend"] for r in rows])), 2),
    }
    for s in args.scales:
        summary[f"mean_iou_scale{s}"] = round(
            float(np.mean([r[f"iou_s{s}"] for r in rows])), 4)
        summary[f"mean_n_scale{s}"] = round(
            float(np.mean([r[f"n_s{s}"] for r in rows])), 2)
    print(json.dumps(summary))


def _iou(a, b) -> float:
    import numpy as np

    a = np.asarray(a, bool)
    b = np.asarray(b, bool)
    union = (a | b).sum()
    return round(float((a & b).sum() / max(union, 1)), 4)


if __name__ == "__main__":
    main()
