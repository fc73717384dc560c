"""End-to-end integration tests for the evaluation suite on synthetic KITTI
fixtures: checkpoints saved → every evaluate() CLI entry runs and produces
its outputs (SURVEY.md §4: offline eval scripts as integration tests)."""

import os

import jax
import numpy as np
import pytest

from fixtures import make_gt_masks, make_kitti2015, make_odometry, make_raw_drive

from mdn_sfm_tpu import checkpoints as ckpt
from mdn_sfm_tpu import training as T
from mdn_sfm_tpu.config import Config, Mode

H, W = 32, 96  # tiny but /32-divisible


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    """Fixture world: KITTI dirs + saved checkpoints in the reference layout."""
    root = str(tmp_path_factory.mktemp("kitti"))
    log_dir = str(tmp_path_factory.mktemp("log"))
    out_dir = str(tmp_path_factory.mktemp("out"))
    gt_dir = os.path.join(out_dir, "gt_masks")

    make_kitti2015(root, n=2, h=48, w=96)
    make_gt_masks(gt_dir, n=2, h=48, w=96)
    make_odometry(root, "09", n_frames=5)
    make_odometry(root, "10", n_frames=4)

    cfg = Config(
        height=H,
        width=W,
        data_root=root,
        raw_dataset_dir=root,
        log_dir=log_dir,
        eval_out_dir=out_dir,
        gt_mask_path=gt_dir,
        load_weights_folder=ckpt.weights_folder(log_dir, "v0", 0),
        version="v1",
        idx=0,
        eval_num_samples=2,
        sequence_length=3,
        compute_dtype="float32",
        pred_errors=True,
        save_pred_masks=True,
        save_pred_motions=True,
        save_pred_poses=True,
    ).validate()

    models = T.build_models(cfg)
    variables = T.init_variables(cfg, models, jax.random.PRNGKey(0))
    ckpt.save_checkpoint(ckpt.weights_folder(log_dir, "v0", 0), variables)
    ckpt.save_checkpoint(
        ckpt.weights_folder(log_dir, "v1", 0), variables, models_to_save=("mobile_decoder",)
    )
    return cfg


class TestEvaluateMix:
    def test_produces_metric_row(self, world):
        from evaluate_mix import evaluate

        result = evaluate(world)
        assert result.shape == (1, 5)  # acc/prec/recall/f1/dice
        acc = result[0, 0]
        assert 0.0 <= acc <= 1.0
        # viz PNGs written
        out = os.path.join(world.eval_out_dir, "mobile", "masks_v1_0")
        assert os.path.exists(os.path.join(out, "0.png"))


class TestBatchedEvalEquivalence:
    def test_batched_dispatch_matches_per_sample(self, world):
        """evaluate_mix with eval_batch_size=8 (one padded dispatch) must
        produce the same metric rows as eval_batch_size=1 (per-sample
        dispatches) — the batching is a throughput change only (PARITY.md
        round-3 #3)."""
        import dataclasses

        from evaluate_mix import evaluate

        r_batched = evaluate(world)  # default eval_batch_size=8, n=2 → padded
        r_single = evaluate(dataclasses.replace(world, eval_batch_size=1))
        assert r_batched.shape == r_single.shape
        np.testing.assert_allclose(r_single, r_batched, atol=1e-6)


class TestReproduceReadmeTable:
    def test_runs_end_to_end_on_fixture_world(self, world, capsys):
        """The one-command README-table reproduction harness
        (tools/reproduce_readme_table.py) runs against the synthetic fixture
        world: loads per-mode checkpoints, evaluates, prints the
        measured-vs-published table. Guards the script against bit-rot until
        real KITTI data + reference checkpoints are available."""
        import sys

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
        import reproduce_readme_table as rrt

        rc = rrt.main(
            [
                "--data_root", world.data_root,
                "--log_dir", world.log_dir,
                "--gt_mask_path", world.gt_mask_path,
                "--frozen_folder", world.load_weights_folder,
                "--height", str(world.height),
                "--width", str(world.width),
                "--eval_out_dir", world.eval_out_dir,
                "--mode_versions", "SN=v1:0", "TG=v1:0",
                "--eval_num_samples", "2",
            ]
        )
        assert rc == 0
        out = capsys.readouterr().out
        assert "| SN |" in out and "| TG |" in out

    def test_threshold_sweep_reports_best_dice(self, world, capsys):
        """--sweep scores published±0.02 thresholds in the SAME eval pass and
        reports the best-Dice operating point — the self-calibration for the
        documented resolution quirk (prediction upsampled to GT res can shift
        the published thresholds by ±0.02, PARITY.md quirk table)."""
        import sys

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
        import reproduce_readme_table as rrt

        rc = rrt.main(
            [
                "--data_root", world.data_root,
                "--log_dir", world.log_dir,
                "--gt_mask_path", world.gt_mask_path,
                "--frozen_folder", world.load_weights_folder,
                "--height", str(world.height),
                "--width", str(world.width),
                "--eval_out_dir", world.eval_out_dir,
                "--mode_versions", "SN=v1:0",
                "--eval_num_samples", "2",
                "--sweep", "0.02",
            ]
        )
        assert rc == 0
        out = capsys.readouterr().out
        assert "Best-Dice operating point" in out
        # the published threshold itself is inside the sweep, so the best
        # Dice can never be worse than the headline row's
        import re

        headline = float(re.search(r"\| SN \|.*?\| ([\d.]+) \(18.58\)", out).group(1))
        best = float(re.search(r"\| SN \| [\d.]+ \(0.18\) \| ([\d.]+) ", out).group(1))
        assert best >= headline - 1e-9


class TestEvaluateMask:
    def test_writes_viz(self, world):
        from evaluate_mask import evaluate

        evaluate(world)
        out = os.path.join(
            ckpt.weights_folder(world.log_dir, "v1", 0), "predictions", "mobile",
            world.eval_name,
        )
        assert os.path.exists(os.path.join(out, "0.png"))
        assert os.path.exists(os.path.join(out, "1.png"))


class TestEvaluateFlow:
    def test_epe_and_result_txt(self, world):
        from evaluate_flow import evaluate

        evaluate(world)
        out = os.path.join(world.eval_out_dir, "flow", world.eval_name)
        assert os.path.exists(os.path.join(out, "result.txt"))
        assert os.path.exists(os.path.join(out, "0.png"))
        with open(os.path.join(out, "result.txt")) as f:
            text = f.read()
        assert "epe_all" in text


class TestEvaluatePose:
    def test_ate_re(self, world):
        from evaluate_pose import evaluate

        mean_errors, std_errors = evaluate(world)
        assert np.isfinite(mean_errors).all()
        assert mean_errors[0] >= 0  # ATE
        out = os.path.join(world.eval_out_dir, "pose")
        assert os.path.exists(os.path.join(out, "poses.npy"))
        preds = np.load(os.path.join(out, "poses.npy"))
        # 3 snippets from seq 09 (5 frames) + 2 from seq 10 (4 frames)
        assert preds.shape == (5, world.sequence_length, 3, 4)


class TestSegDatasetOnFixtures:
    def test_annotations_from_instance_map(self, world):
        from mdn_sfm_tpu.data.eval_datasets import KittiSegDataset

        ds = KittiSegDataset(world.data_root, H, W, n=2)
        item = ds[0]
        assert item[("color", 0)].shape == (H, W, 3)
        assert item["instance_img"].shape == (375, 1242, 3)
        anns = item["annotations"]
        assert len(anns) == 1  # one car instance in the fixture
        assert anns[0]["category_id"] == 3  # car trainId 4 − 1
        from mdn_sfm_tpu.native import rle_decode

        mask = rle_decode(anns[0]["segmentation"])
        x1, y1, x2, y2 = anns[0]["bbox"]
        assert mask[y1:y2, x1:x2].sum() == mask.sum() > 0


class TestTrainerOnRawFixture:
    def test_kitti_raw_reader(self, tmp_path):
        from mdn_sfm_tpu.data.kitti import KittiRawDataset
        from mdn_sfm_tpu.data.splits import SplitLine

        root = str(tmp_path)
        lines = [SplitLine.parse(s) for s in make_raw_drive(root)]
        ds = KittiRawDataset(root, lines, H, W)
        colors, K = ds[0]
        assert colors.shape == (3, H, W, 3)
        assert colors.dtype == np.uint8
        assert K.shape == (4, 4)
        # intrinsics rescaled to model resolution: fx = 0.9·w_orig·(W/w_orig)
        assert K[0, 0] == pytest.approx(0.9 * W, rel=1e-5)
