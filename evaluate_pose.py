"""Odometry evaluation on KITTI sequences 09/10: chain pairwise PoseNet
predictions into global trajectories, score ATE/RE against GT
(reference: evaluate_pose.py:19-108).

    python evaluate_pose.py --raw_dataset_dir kitti --save_pred_poses
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from mdn_sfm_tpu.config import add_eval_args, from_args


def evaluate(cfg) -> tuple[np.ndarray, np.ndarray]:
    import jax
    import jax.numpy as jnp

    from mdn_sfm_tpu import checkpoints as ckpt
    from mdn_sfm_tpu import training as T
    from mdn_sfm_tpu.data.eval_datasets import OdometryFramework, prepare_pair
    from mdn_sfm_tpu.geometry import transformation_from_parameters
    from mdn_sfm_tpu.metrics import compute_pose_error
    from mdn_sfm_tpu.viz import write_result

    models = T.build_models(cfg)
    variables = T.init_variables(cfg, models, jax.random.PRNGKey(0))
    variables, _, _ = ckpt.load_checkpoint(
        cfg.load_weights_folder, variables, models_to_load=("posenet",)
    )
    print(f"-> Loading weights from {cfg.load_weights_folder}")

    @jax.jit
    def pose_fwd(variables, tgt, ref):
        aa, t = models.pose.apply(variables["posenet"], tgt, ref)
        return transformation_from_parameters(aa, t)

    dataset_dir = os.path.join(cfg.raw_dataset_dir, "odometry_data")
    framework = OdometryFramework(dataset_dir, ["09", "10"], cfg.sequence_length)
    print(f"-> Computing predictions with size {cfg.width}x{cfg.height}")
    print("-> Evaluating")

    n = len(framework)
    predictions = np.zeros((n, cfg.sequence_length, 3, 4))
    errors = np.zeros((n, 2), np.float32)

    from mdn_sfm_tpu.utils import eval_chunks

    # every pairwise PoseNet forward is independent — batch
    # eval_batch_size·(sequence_length-1) pairs per jitted dispatch; only the
    # global-pose chaining (a cumulative matrix product) stays host-side
    L = cfg.sequence_length
    for idxs, n_valid in eval_chunks(n, cfg.eval_batch_size):
        samples = [framework[j] for j in idxs[:n_valid]]
        samples += [samples[-1]] * (len(idxs) - n_valid)
        pairs = [
            prepare_pair(s["imgs"][it], s["imgs"][it + 1], cfg.height, cfg.width)
            for s in samples
            for it in range(L - 1)
        ]
        tgt = jnp.concatenate([jnp.asarray(t) for t, _ in pairs])
        ref = jnp.concatenate([jnp.asarray(r) for _, r in pairs])
        pose_mats = np.asarray(pose_fwd(variables, tgt, ref)).reshape(-1, L - 1, 4, 4)

        for bi in range(n_valid):
            j = idxs[bi]
            sample = samples[bi]
            global_pose = np.eye(4)
            poses = [global_pose[:3, :].copy()]
            # chain: global ← global · inv(pairwise) (evaluate_pose.py:70-77)
            for it in range(L - 1):
                global_pose = global_pose @ np.linalg.inv(pose_mats[bi, it])
                poses.append(global_pose[:3, :].copy())

            final_poses = np.stack(poses)
            predictions[j] = final_poses
            errors[j] = compute_pose_error(sample["poses"], final_poses)

    out_dir = os.path.join(cfg.eval_out_dir, "pose")
    os.makedirs(out_dir, exist_ok=True)
    if cfg.save_pred_poses:
        np.save(os.path.join(out_dir, "poses.npy"), predictions)
        print("-> Saving predicted poses to", out_dir)

    mean_errors, std_errors = errors.mean(0), errors.std(0)
    print("\nResults")
    print("\t {:>10}, {:>10}".format("ATE", "RE"))
    print("mean \t {:10.4f}, {:10.4f}".format(*mean_errors))
    print("std \t {:10.4f}, {:10.4f}".format(*std_errors))
    with open(os.path.join(out_dir, "result.txt"), "w") as f:
        write_result(f, mean_errors, ["ATE", "RE"])
    return mean_errors, std_errors


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="MDN-SfM TPU evaluate_pose")
    add_eval_args(parser)
    evaluate(from_args(parser.parse_args()))
