"""Metric tests with hand-crafted masks (SURVEY.md §4: metric tests
reproducing get_quantitative_results on crafted masks)."""

import numpy as np
import pytest

from mdn_sfm_tpu.metrics import (
    binary_image,
    compute_epe,
    compute_pose_error,
    get_quantitative_results,
)


class TestQuantitative:
    def test_perfect_prediction(self):
        gt = np.zeros((10, 10))
        gt[2:5, 2:5] = 1
        acc, prec, rec, f1, dice = get_quantitative_results(gt.copy(), gt)
        assert acc == prec == rec == f1 == dice == 1.0

    def test_crafted_confusion(self):
        """2 TP, 1 FP, 1 FN, 12 TN on a 4×4 grid — values by hand."""
        gt = np.zeros((4, 4))
        gt[0, 0] = gt[0, 1] = gt[0, 2] = 1  # 3 positives
        pred = np.zeros((4, 4))
        pred[0, 0] = pred[0, 1] = 1  # 2 TP
        pred[1, 0] = 1  # 1 FP
        acc, prec, rec, f1, dice = get_quantitative_results(pred, gt)
        assert acc == pytest.approx((2 + 12) / 16)
        assert prec == pytest.approx(2 / 3)
        assert rec == pytest.approx(2 / 3)
        assert f1 == pytest.approx(2 / 3)
        assert dice == pytest.approx(2 * 2 / (2 * 2 + 1 + 1))

    def test_empty_prediction_nan_precision(self):
        """Reference divides by zero silently (eval_utils.py:287-289)."""
        gt = np.zeros((4, 4))
        gt[0, 0] = 1
        acc, prec, rec, f1, dice = get_quantitative_results(np.zeros((4, 4)), gt)
        assert np.isnan(prec)
        assert rec == 0.0

    def test_binary_image_threshold(self):
        x = np.array([0.1, 0.5, 0.9])
        np.testing.assert_array_equal(binary_image(x, 0.5), [0, 1, 1])
        np.testing.assert_array_equal(binary_image(x, 0.95), [0, 0, 0])


class TestEPE:
    def test_zero_error(self):
        f = np.random.default_rng(0).normal(size=(4, 6, 2))
        assert compute_epe(f, f, np.ones((4, 6))) == 0.0

    def test_known_offset(self):
        gt = np.zeros((4, 6, 2))
        pred = np.zeros((4, 6, 2))
        pred[..., 0] = 3.0
        pred[..., 1] = 4.0
        assert compute_epe(gt, pred, np.ones((4, 6))) == pytest.approx(5.0)

    def test_mask_restricts(self):
        gt = np.zeros((2, 2, 2))
        pred = np.zeros((2, 2, 2))
        pred[0, 0, 0] = 10.0
        mask = np.zeros((2, 2))
        mask[1, 1] = 1
        assert compute_epe(gt, pred, mask) == 0.0


class TestPoseError:
    def test_identical_poses(self):
        rng = np.random.default_rng(0)
        poses = np.tile(np.eye(3, 4), (3, 1, 1))
        poses[:, :, 3] = rng.normal(size=(3, 3))
        ate, re = compute_pose_error(poses, poses.copy())
        assert ate == pytest.approx(0.0, abs=1e-9)
        assert re == pytest.approx(0.0, abs=1e-6)

    def test_scale_invariance_of_ate(self):
        """ATE uses least-squares scale alignment: a uniformly scaled
        trajectory scores ~0 (eval_utils.py:409-410)."""
        rng = np.random.default_rng(1)
        poses = np.tile(np.eye(3, 4), (4, 1, 1))
        poses[:, :, 3] = rng.normal(size=(4, 3))
        scaled = poses.copy()
        scaled[:, :, 3] *= 3.7
        ate, re = compute_pose_error(poses, scaled)
        assert ate == pytest.approx(0.0, abs=1e-9)

    def test_rotation_error(self):
        """90° z-rotation on every pose → RE = π/2 per pose."""
        gt = np.tile(np.eye(3, 4), (2, 1, 1))
        Rz = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], float)
        pred = gt.copy()
        pred[:, :, :3] = Rz
        pred[:, :, 3] = gt[:, :, 3] + 1e-9  # avoid 0/0 in scale factor
        _, re = compute_pose_error(gt, pred)
        assert re == pytest.approx(np.pi / 2, rel=1e-6)
