"""Mobile-mask evaluation against Detectron2-derived GT masks — THE metric
path behind the README table (reference: evaluate_mix.py:21-111;
metric: eval_utils.py:278-292).

Per KITTI-2015 sample: run flow/pose/mobile nets (+ instance-mask provider),
binarize the mobile map, score accuracy/precision/recall/F1/Dice against the
GT masks produced by tools/generate_mobile_gt.py, print the mean row.

    python evaluate_mix.py --data_root kitti --version v1 --idx 0 \
        --gt_mask_path output/mobile_objects_ground_truth --binary_threshold 0.18
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from mdn_sfm_tpu.config import add_eval_args, from_args
from mdn_sfm_tpu.metrics import binary_image, get_quantitative_results


def evaluate(cfg, thresholds: list[float] | None = None) -> np.ndarray:
    """Run the metric path; returns the mean [acc, prec, recall, f1, dice]
    row at ``cfg.binary_threshold``.

    ``thresholds``: optional extra binarization thresholds to score in the
    same pass (one decode/forward, many binarizations) — the self-calibration
    sweep for the documented resolution quirk (PARITY.md: upsampling the
    prediction to GT res can shift the published per-mode thresholds by
    ±0.02). When given, returns (row, {threshold: row})."""
    import jax
    import jax.numpy as jnp

    from mdn_sfm_tpu import checkpoints as ckpt
    from mdn_sfm_tpu import training as T
    from mdn_sfm_tpu.data.eval_datasets import KittiSegDataset
    from mdn_sfm_tpu.geometry import scale_factor
    from mdn_sfm_tpu.losses import epipolar_loss_terms

    models = T.build_models(cfg)
    variables = T.init_variables(cfg, models, jax.random.PRNGKey(0))
    # frozen flow/pose from load_weights_folder; mobile from version/idx
    variables, _, _ = ckpt.load_checkpoint(
        cfg.load_weights_folder, variables, models_to_load=("flownet", "posenet")
    )
    mobile_folder = ckpt.weights_folder(cfg.log_dir, cfg.version, cfg.idx)
    variables, _, _ = ckpt.load_checkpoint(
        mobile_folder, variables, models_to_load=("mobile_decoder",)
    )
    print(f"-> Loading weights from\n{cfg.load_weights_folder}\n{mobile_folder}")

    fwd = T.make_eval_forward(cfg, models)
    dataset = KittiSegDataset(cfg.data_root, cfg.height, cfg.width, n=cfg.eval_num_samples)
    out_dir = os.path.join(cfg.eval_out_dir, "mobile", f"masks_{cfg.version}_{cfg.idx}")
    if cfg.save_pred_masks:
        os.makedirs(out_dir, exist_ok=True)

    print(f"-> Computing predictions with size {cfg.width}x{cfg.height}")
    print("-> Evaluating\n   Mono evaluation - using median scaling")

    sf = scale_factor(cfg.height, cfg.width)

    # the reference's eval path always uses SN post-processing for the
    # epipolar viz maps (LossModule.epipolar_loss, loss_functions.py:124)
    import dataclasses

    from mdn_sfm_tpu.config import Mode
    from mdn_sfm_tpu.utils import eval_chunks

    viz_cfg = dataclasses.replace(cfg, mode=Mode.SN, w_d2_sim=0.0)

    @jax.jit
    def step(variables, tgt, ref, inv_K):
        """Batched net-res eval: forward + SN epipolar viz maps, one dispatch
        per eval_batch_size samples (the reference loops per sample with
        dozens of eager ops each, evaluate_mix.py:58-85)."""
        flows, mobiles, aa, t, cam = fwd(variables, tgt, ref)
        mobile_mask = mobiles[0]  # (B, H, W, 1)
        full_flow = flows[0] * sf
        _, post_epip, ori_epip = epipolar_loss_terms(
            viz_cfg, full_flow, mobile_mask, inv_K, cam[:, :3, :3], cam[:, :3, 3], None, None
        )
        return mobile_mask, post_epip, ori_epip

    metrics = []
    sweep: dict[float, list] = {t: [] for t in (thresholds or [])}
    for idxs, n_valid in eval_chunks(len(dataset), cfg.eval_batch_size):
        batch_inputs = [dataset[j] for j in idxs[:n_valid]]
        pad = [batch_inputs[-1]] * (len(idxs) - n_valid)
        stacked = batch_inputs + pad
        tgt = jnp.stack([jnp.asarray(x[("color", 0)]) for x in stacked])
        ref = jnp.stack([jnp.asarray(x[("color", 1)]) for x in stacked])
        inv_K = jnp.stack([jnp.asarray(x["inv_K"]) for x in stacked])
        mobile_b, post_b, ori_b = step(variables, tgt, ref, inv_K)
        mobile_b, post_b, ori_b = jax.device_get((mobile_b, post_b, ori_b))

        for bi in range(n_valid):
            j = idxs[bi]
            inputs = batch_inputs[bi]
            mobile_mask = mobile_b[bi : bi + 1]
            post_epip = post_b[bi : bi + 1]
            ori_epip = ori_b[bi : bi + 1]
            _score_and_viz(
                cfg, j, inputs, mobile_mask, post_epip, ori_epip, metrics, out_dir,
                sweep,
            )

    if cfg.save_pred_masks:
        print("Evaluation save to --> ", out_dir)
    result = np.mean(np.array(metrics), axis=0, keepdims=True)
    print(result)
    print("\n-> Done!")
    if thresholds:
        rows = {t: np.mean(np.array(v), axis=0, keepdims=True) for t, v in sweep.items()}
        return result, rows
    return result


def _score_and_viz(cfg, j, inputs, mobile_mask, post_epip, ori_epip, metrics, out_dir,
                   sweep=None):
    """Per-sample host-side scoring + panel writing (unchanged semantics from
    the per-sample loop; reference evaluate_mix.py:82-105)."""
    import jax
    import jax.numpy as jnp

    from mdn_sfm_tpu.viz import imwrite, load_as_float, normalize_image

    gt_path = os.path.join(cfg.gt_mask_path, f"{j}.png")
    if not os.path.exists(gt_path):
        return  # reference skips the sample entirely (no metric, no panel)
    gt_mask = load_as_float(gt_path) / 255.0
    if gt_mask.ndim == 3:
        gt_mask = gt_mask[..., 0]

    pred = np.asarray(mobile_mask)[0, ..., 0]
    if pred.shape != gt_mask.shape:
        # GT masks are at the original resolution; compare there like the
        # reference (it scores full-res GT vs net-res mask expanded — we
        # upsample the prediction to GT resolution)
        pred = np.asarray(
            jax.image.resize(jnp.asarray(pred), gt_mask.shape, method="linear")
        )
    metrics.append(
        get_quantitative_results(binary_image(pred, cfg.binary_threshold), gt_mask)
    )
    for t, rows in (sweep or {}).items():
        rows.append(get_quantitative_results(binary_image(pred, t), gt_mask))

    if cfg.save_pred_masks:
        # stacked panel like the reference (evaluate_mix.py:87-99):
        # [instance boxes | binary mask | mobile | post epip | ori epip]
        from mdn_sfm_tpu.data.kitti import _resize_u8
        from mdn_sfm_tpu.labels import TRAINID2LABEL
        from mdn_sfm_tpu.viz import draw_boxes_rgb

        inst = np.clip(inputs["instance_img"], 0, 255).astype(np.uint8)
        anns = inputs["annotations"]
        boxes, colors = [], []
        for a in anns:
            x1, y1, x2, y2 = a["bbox"]
            boxes.append([x1, y1, x2, y2])
            colors.append(TRAINID2LABEL[a["category_id"] + 1].color)
        seg_img = draw_boxes_rgb(inst, np.array(boxes).reshape(-1, 4), colors)
        seg_small = _resize_u8(seg_img, cfg.height, cfg.width)

        m = np.asarray(mobile_mask)[0, ..., 0]
        expand = lambda g: np.repeat(g[..., None], 3, -1)  # noqa: E731
        viz = np.hstack(
            [
                seg_small,
                255 * expand(binary_image(m, cfg.binary_threshold)),
                255 * expand(m),
                255 * expand(normalize_image(np.asarray(post_epip)[0, ..., 0])),
                255 * expand(normalize_image(np.asarray(ori_epip)[0, ..., 0])),
            ]
        ).astype(np.uint8)
        imwrite(os.path.join(out_dir, f"{j}.png"), viz)


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="MDN-SfM TPU evaluate_mix")
    add_eval_args(parser)
    evaluate(from_args(parser.parse_args()))
