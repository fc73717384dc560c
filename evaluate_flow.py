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

    from mdn_sfm_tpu.utils import eval_chunks

    gauss_w_j = jnp.asarray(gauss_w)

    @jax.jit
    def step(variables, tgt, ref, inv_K, gt_small, M_R, M_t):
        """Batched net-res flow eval: forward, predicted + GT epipolar maps,
        per-sample max-normalizations — one dispatch per eval_batch_size
        samples (the reference loops per sample, evaluate_flow.py:99-127)."""
        flows, _, aa, t, cam = fwd(variables, tgt, ref)
        full_flow = flows[0] * sf  # (B, H, W, 2) pixels

        def nmax(x):  # per-sample max over spatial axes
            return jnp.maximum(x.max(axis=tuple(range(1, x.ndim)), keepdims=True), 1e-12)

        # predicted epipolar map (TG-style weighting for the viz,
        # evaluate_flow.py:107-113)
        epip = jnp.abs(epipolar_residual(full_flow, inv_K, cam[:, :3, :3], cam[:, :3, 3]))
        post_epip = (epip / gauss_w_j[None]) ** 2
        post_epip = post_epip / nmax(post_epip)
        epip_n = epip / nmax(epip)

        # GT epipolar map from GT flow + stereo baseline transform
        # (evaluate_flow.py:116-127)
        gt_epip = jnp.abs(epipolar_residual(gt_small, inv_K, M_R, M_t))
        gt_epip = gt_epip / nmax(gt_epip)
        return full_flow, epip_n, post_epip, gt_epip

    errors_full = []
    for idxs, n_valid in eval_chunks(len(framework), cfg.eval_batch_size):
        samples = [framework[j] for j in idxs[:n_valid]]
        samples += [samples[-1]] * (len(idxs) - n_valid)

        inv_Ks, gt_smalls, pairs, zooms = [], [], [], []
        for sample in samples:
            h, w = sample["tgt"].shape[:2]
            zoom_x, zoom_y = W / w, H / h
            zooms.append((zoom_x, zoom_y))
            intrinsics = sample["intrinsics"].copy()
            intrinsics[0] *= zoom_x
            intrinsics[1] *= zoom_y
            K = np.eye(4, dtype=np.float32)
            K[:3, :3] = intrinsics
            inv_Ks.append(np.linalg.inv(K)[:3, :3])
            # bilinear resize GT flow to net resolution, rescale components
            gt_small = np.array(  # writable copy (device arrays read-only)
                jax.image.resize(
                    jnp.asarray(sample["gt_flow_occ"][..., :2]), (H, W, 2), method="linear"
                )
            )
            gt_small[..., 0] *= zoom_x
            gt_small[..., 1] *= zoom_y
            gt_smalls.append(gt_small)
            pairs.append(prepare_pair(sample["tgt"], sample["next_tgt"], H, W))

        tgt = jnp.concatenate([jnp.asarray(t) for t, _ in pairs])
        ref = jnp.concatenate([jnp.asarray(r) for _, r in pairs])
        M = np.stack([s["gt_transformation"] for s in samples])
        full_b, epipn_b, post_b, gtep_b = step(
            variables, tgt, ref,
            jnp.asarray(np.stack(inv_Ks)), jnp.asarray(np.stack(gt_smalls)),
            jnp.asarray(M[:, :3, :3]), jnp.asarray(M[:, :3, 3]),
        )
        full_b, epipn_b, post_b, gtep_b = map(
            np.asarray, jax.device_get((full_b, epipn_b, post_b, gtep_b))
        )

        for bi in range(n_valid):
            j = idxs[bi]
            sample = samples[bi]
            h, w = sample["tgt"].shape[:2]
            zoom_x, zoom_y = zooms[bi]
            full_flow = full_b[bi : bi + 1]
            epip_n, post_epip, gt_epip = epipn_b[bi], post_b[bi], gtep_b[bi]

            # flow EPE at original resolution (evaluate_flow.py:129-143).
            # NOTE: the reference resizes with swapped axes — (img_width,
            # img_height) where skimage expects (rows, cols)
            # (evaluate_flow.py:117,131); fixed here.
            gt_flow = sample["gt_flow_occ"]
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
