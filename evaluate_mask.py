"""Mobile-mask visualization over KITTI-2015 pairs
(reference: evaluate_mask.py:17-98): run frozen flow/pose + mobile decoder,
save stacked viz PNGs (image / probability / binary mask).

    python evaluate_mask.py --raw_dataset_dir kitti --version v1 --idx 0 --save_pred_masks
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
    from mdn_sfm_tpu.data.eval_datasets import ValidationMobileMask, prepare_pair
    from mdn_sfm_tpu.data.kitti import _resize_u8
    from mdn_sfm_tpu.metrics import binary_image
    from mdn_sfm_tpu.viz import imwrite

    models = T.build_models(cfg)
    variables = T.init_variables(cfg, models, jax.random.PRNGKey(0))
    variables, _, _ = ckpt.load_checkpoint(
        cfg.load_weights_folder, variables, models_to_load=("flownet", "posenet")
    )
    mobile_folder = ckpt.weights_folder(cfg.log_dir, cfg.version, cfg.idx)
    variables, _, _ = ckpt.load_checkpoint(
        mobile_folder, variables, models_to_load=("mobile_decoder",)
    )
    print(f"-> Loading weights from\n{cfg.load_weights_folder}\n{mobile_folder}")

    out_dir = os.path.join(mobile_folder, "predictions", "mobile", cfg.eval_name)
    os.makedirs(out_dir, exist_ok=True)

    fwd = T.make_eval_forward(cfg, models)
    framework = ValidationMobileMask(cfg.raw_dataset_dir, n=cfg.eval_num_samples)
    print(f"-> Computing predictions with size {cfg.width}x{cfg.height}")
    print("-> Evaluating:  Mono evaluation - using median scaling")

    from mdn_sfm_tpu.utils import eval_chunks

    # batched dispatch: eval_batch_size samples per jitted call (identical
    # per-sample results; the reference loops one sample at a time)
    for idxs, n_valid in eval_chunks(len(framework), cfg.eval_batch_size):
        samples = [framework[j] for j in idxs[:n_valid]]
        samples += [samples[-1]] * (len(idxs) - n_valid)
        pairs = [
            prepare_pair(tgt_img, next_img, cfg.height, cfg.width)
            for tgt_img, next_img in samples
        ]
        tgt = jnp.concatenate([jnp.asarray(t) for t, _ in pairs])
        ref = jnp.concatenate([jnp.asarray(r) for _, r in pairs])
        _, mobiles, _, _, _ = fwd(variables, tgt, ref)
        masks = np.asarray(mobiles[0])[..., 0]

        for bi in range(n_valid):
            j = idxs[bi]
            mask = masks[bi]
            if cfg.save_pred_masks:
                tgt_small = _resize_u8(
                    np.clip(samples[bi][0], 0, 255).astype(np.uint8),
                    cfg.height, cfg.width,
                )
                m3 = np.repeat(mask[..., None], 3, axis=-1)
                viz = np.vstack(
                    [tgt_small, 255 * m3,
                     255 * np.repeat(binary_image(mask)[..., None], 3, -1)]
                ).astype(np.uint8)
                imwrite(os.path.join(out_dir, f"{j}.png"), viz)

    print("\n-> Done!")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="MDN-SfM TPU evaluate_mask")
    add_eval_args(parser)
    evaluate(from_args(parser.parse_args()))
