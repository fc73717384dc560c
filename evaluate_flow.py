"""Flow evaluation: predicted vs GT epipolar maps + flow EPE (occ/noc) +
flow/error visualizations (reference: evaluate_flow.py:27-177).

    python evaluate_flow.py --raw_dataset_dir kitti/data_scene_flow_root --pred_errors
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from mdn_sfm_tpu.config import add_eval_args, from_args


def evaluate(cfg) -> None:
    import jax
    import jax.numpy as jnp

    from mdn_sfm_tpu import checkpoints as ckpt
    from mdn_sfm_tpu import training as T
    from mdn_sfm_tpu.data.eval_datasets import ValidationFlow, prepare_pair
    from mdn_sfm_tpu.data.kitti import _resize_u8
    from mdn_sfm_tpu.geometry import (
        epipolar_residual,
        gauss_distance_weight,
        scale_factor,
        transformation_from_parameters,
    )
    from mdn_sfm_tpu.metrics import compute_epe
    from mdn_sfm_tpu.viz import (
        flow_to_image,
        get_flow_error_image,
        imwrite,
        normalize_image,
        write_result,
    )

    models = T.build_models(cfg)
    variables = T.init_variables(cfg, models, jax.random.PRNGKey(0))
    variables, _, _ = ckpt.load_checkpoint(
        cfg.load_weights_folder, variables, models_to_load=("flownet", "posenet")
    )

    out_dir = os.path.join(cfg.eval_out_dir, "flow", cfg.eval_name)
    os.makedirs(out_dir, exist_ok=True)

    H, W = cfg.height, cfg.width
    sf = scale_factor(H, W)
    gauss_w = gauss_distance_weight(H, W, 1, cfg.gauss_sigma1, cfg.gauss_sigma2)[0]
    framework = ValidationFlow(cfg.raw_dataset_dir, n=cfg.eval_num_samples)
    fwd = T.make_eval_forward(cfg, models)

    print(f"-> Computing predictions with size {W}x{H}")
    print("-> Evaluating\n   Mono evaluation - using median scaling")

    errors_full = []
    for j in range(len(framework)):
        sample = framework[j]
        h, w = sample["tgt"].shape[:2]
        zoom_x, zoom_y = W / w, H / h

        intrinsics = sample["intrinsics"].copy()
        intrinsics[0] *= zoom_x
        intrinsics[1] *= zoom_y
        K = np.eye(4, dtype=np.float32)
        K[:3, :3] = intrinsics
        inv_K = np.linalg.inv(K)[None, :3, :3]

        tgt, ref = prepare_pair(sample["tgt"], sample["next_tgt"], H, W)
        flows, _, aa, t, cam = fwd(variables, jnp.asarray(tgt), jnp.asarray(ref))
        full_flow = np.asarray(flows[0] * sf)  # (1, H, W, 2) pixels

        # predicted epipolar map (TG-style weighting for the viz,
        # evaluate_flow.py:107-113)
        epip = np.abs(
            np.asarray(
                epipolar_residual(
                    jnp.asarray(full_flow), jnp.asarray(inv_K), cam[:, :3, :3], cam[:, :3, 3]
                )
            )
        )[0]
        post_epip = (epip / np.asarray(gauss_w)) ** 2
        post_epip /= max(post_epip.max(), 1e-12)
        epip_n = epip / max(epip.max(), 1e-12)

        # GT epipolar map from GT flow + stereo baseline transform
        # (evaluate_flow.py:116-127)
        gt_flow = sample["gt_flow_occ"]
        # bilinear resize GT flow to net resolution and rescale components
        gt_small = np.array(  # writable copy (device arrays are read-only)
            jax.image.resize(jnp.asarray(gt_flow[..., :2]), (H, W, 2), method="linear")
        )
        gt_small[..., 0] *= zoom_x
        gt_small[..., 1] *= zoom_y
        M = sample["gt_transformation"]
        gt_epip = np.abs(
            np.asarray(
                epipolar_residual(
                    jnp.asarray(gt_small)[None],
                    jnp.asarray(inv_K),
                    jnp.asarray(M[None, :3, :3]),
                    jnp.asarray(M[None, :3, 3]),
                )
            )
        )[0]
        gt_epip /= max(gt_epip.max(), 1e-12)

        # flow EPE at original resolution (evaluate_flow.py:129-143).
        # NOTE: the reference resizes with swapped axes — (img_width,
        # img_height) where skimage expects (rows, cols)
        # (evaluate_flow.py:117,131); fixed here.
        full_zoomed = np.array(
            jax.image.resize(jnp.asarray(full_flow[0]), (h, w, 2), method="linear")
        )
        full_zoomed[..., 0] /= zoom_x
        full_zoomed[..., 1] /= zoom_y
        noc_mask = sample["gt_flow_noc"][..., 2]
        if cfg.pred_errors:
            errors_full.append(
                [
                    compute_epe(gt_flow, full_zoomed, gt_flow[..., 2]),
                    compute_epe(gt_flow, full_zoomed, noc_mask),
                ]
            )

        if cfg.save_pred_motions:
            err_img = get_flow_error_image(
                gt_flow[..., :2], gt_flow[..., 2] > 0, noc_mask > 0, full_zoomed
            )
            tgt_small = _resize_u8(np.clip(sample["tgt"], 0, 255).astype(np.uint8), H, W)
            f_img = flow_to_image(full_flow[0])
            fe = np.asarray(
                jax.image.resize(jnp.asarray(err_img), (H, W, 3), method="linear")
            )
            expand = lambda m: 255 * np.repeat(m[..., None], 3, -1)  # noqa: E731
            viz = np.hstack(
                [tgt_small, f_img, fe, expand(epip_n), expand(gt_epip), expand(post_epip)]
            ).astype(np.uint8)
            imwrite(os.path.join(out_dir, f"{j}.png"), viz)

    if cfg.pred_errors:
        mean_errors = np.array(errors_full).mean(0)
        print("\n  " + ("{:>8} | " * 2).format("epe_all", "epe_noc"))
        print(("&{: 8.3f}  " * 2).format(*mean_errors.tolist()) + "\\\\")
        with open(os.path.join(out_dir, "result.txt"), "w") as f:
            write_result(f, mean_errors, ["epe_all", "epe_noc"])
        print("\n-> Done!")

    if cfg.save_pred_motions:
        print("Evaluation save to --> ", out_dir)


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="MDN-SfM TPU evaluate_flow")
    add_eval_args(parser)
    evaluate(from_args(parser.parse_args()))
