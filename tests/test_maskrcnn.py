"""Tests for the JAX Mask R-CNN port (static-shape replacement for the
reference's frozen detectron2 model, trainer.py:165-179)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdn_sfm_tpu.masks import maskrcnn as M


class TestBoxUtils:
    def test_decode_identity(self):
        anchors = jnp.array([[10.0, 20.0, 30.0, 60.0]])
        out = M.decode_boxes(anchors, jnp.zeros((1, 4)))
        np.testing.assert_allclose(np.asarray(out), [[10, 20, 30, 60]], atol=1e-5)

    def test_decode_shift_and_scale(self):
        """dx=0.5 shifts by half a width; dw=ln2 doubles the width."""
        anchors = jnp.array([[0.0, 0.0, 10.0, 10.0]])
        deltas = jnp.array([[0.5, 0.0, np.log(2.0), 0.0]])
        out = np.asarray(M.decode_boxes(anchors, deltas))[0]
        np.testing.assert_allclose(out, [0.0, 0.0, 20.0, 10.0], atol=1e-4)

    def test_iou_matrix(self):
        a = jnp.array([[0.0, 0, 10, 10], [0, 0, 5, 5]])
        got = np.asarray(M.iou_matrix(a, a))
        np.testing.assert_allclose(got, [[1.0, 0.25], [0.25, 1.0]], atol=1e-6)

    def test_nms_matches_native(self):
        """The JAX static-shape NMS keeps the same boxes as the C++ greedy
        NMS (host path)."""
        from mdn_sfm_tpu.native import nms as cpp_nms

        rng = np.random.default_rng(0)
        centers = rng.uniform(20, 80, (40, 2))
        sizes = rng.uniform(5, 25, (40, 2))
        boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2], -1).astype(np.float32)
        scores = rng.random(40).astype(np.float32)

        keep, valid = M.nms_fixed(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 40)
        jax_keep = np.asarray(keep)[np.asarray(valid)]
        ref_keep = cpp_nms(boxes, scores, 0.5)
        np.testing.assert_array_equal(np.sort(jax_keep), np.sort(ref_keep))

    def test_anchor_grid(self):
        a = M.anchors_for_level(2, 3, stride=4, size=32)
        assert a.shape == (2 * 3 * 3, 4)
        # first cell's ratio-1 anchor is centered at (0, 0) with side 32
        sq = a[1]
        np.testing.assert_allclose(sq, [-16, -16, 16, 16], atol=1e-4)

    def test_fpn_level_assignment(self):
        boxes = jnp.array(
            [[0, 0, 32, 32], [0, 0, 112, 112], [0, 0, 224, 224], [0, 0, 1000, 1000]],
            jnp.float32,
        )
        lvl = np.asarray(M.assign_fpn_level(boxes))
        assert lvl[0] == 2  # small → P2
        assert lvl[2] == 4  # 224 → P4
        assert lvl[3] == 5  # huge → clamped P5


class TestRoiAlign:
    def test_constant_feature(self):
        feat = jnp.full((16, 16, 3), 2.5)
        boxes = jnp.array([[1.0, 1.0, 9.0, 9.0]])
        out = M.roi_align(feat, boxes, 7, stride=1.0)
        np.testing.assert_allclose(np.asarray(out), 2.5, atol=1e-5)

    def test_linear_ramp_interpolation(self):
        """A feature that's linear in x pools to the bin-center x values."""
        xs = np.arange(32, dtype=np.float32)
        feat = jnp.asarray(np.broadcast_to(xs[None, :, None], (32, 32, 1)).copy())
        boxes = jnp.array([[4.0, 4.0, 12.0, 12.0]])
        out = np.asarray(M.roi_align(feat, boxes, 4, stride=1.0))[0, 0, :, 0]
        # bin centers at x = 4 + (i + .5) * 2 − .5... sampled at sub-bin centers
        expected = 4 + (np.arange(4) + 0.5) * 2 - 0.5
        np.testing.assert_allclose(out, expected, atol=1e-4)

    def test_stride_scaling(self):
        feat = jnp.asarray(np.random.default_rng(0).normal(size=(8, 8, 2)).astype(np.float32))
        b1 = M.roi_align(feat, jnp.array([[0.0, 0, 32, 32]]), 4, stride=4.0)
        b2 = M.roi_align(feat, jnp.array([[0.0, 0, 8, 8]]), 4, stride=1.0)
        np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), atol=1e-5)


class TestPaste:
    def test_full_canvas_box(self):
        mask = jnp.ones((1, M.MASK_RES, M.MASK_RES))
        boxes = jnp.array([[0.0, 0.0, 16.0, 16.0]])
        out = np.asarray(M.paste_masks(mask, boxes, 16, 16))
        assert out.shape == (1, 16, 16)
        assert (out[0, 4:12, 4:12] > 0.99).all()
        # outside the box → 0
        out2 = np.asarray(M.paste_masks(mask, jnp.array([[0.0, 0.0, 8.0, 8.0]]), 16, 16))
        assert (out2[0, 12:, 12:] == 0).all()


class TestEndToEnd:
    @pytest.fixture(scope="class")
    def model_and_vars(self):
        model = M.MaskRCNN(max_det=4, pre_nms_topk=64, post_nms_topk=32, box_candidates=64,
                           dtype=jnp.float32)
        img = jnp.zeros((128, 256, 3))
        variables = model.init(
            jax.random.PRNGKey(0), img, jnp.array(128.0), jnp.array(256.0)
        )
        return model, variables

    def test_static_shapes_and_finite(self, model_and_vars):
        model, variables = model_and_vars
        rng = np.random.default_rng(1)
        img = jnp.asarray(rng.normal(scale=50, size=(128, 256, 3)).astype(np.float32))
        det = model.apply(variables, img, jnp.array(100.0), jnp.array(200.0))
        assert det.boxes.shape == (4, 4)
        assert det.scores.shape == (4,)
        assert det.classes.shape == (4,)
        assert det.masks28.shape == (4, M.MASK_RES, M.MASK_RES)
        assert det.valid.shape == (4,)
        for leaf in (det.boxes, det.scores, det.masks28):
            assert np.isfinite(np.asarray(leaf)).all()
        # boxes clipped to the true image size
        b = np.asarray(det.boxes)
        assert (b[:, [0, 2]] <= 200.0 + 1e-3).all()
        assert (b[:, [1, 3]] <= 100.0 + 1e-3).all()

    def test_jit_compiles_once(self, model_and_vars):
        model, variables = model_and_vars
        fn = jax.jit(model.apply)
        img = jnp.zeros((128, 256, 3))
        d1 = fn(variables, img, jnp.array(128.0), jnp.array(256.0))
        d2 = fn(variables, img + 1, jnp.array(96.0), jnp.array(192.0))
        assert d1.boxes.shape == d2.boxes.shape


class TestD2KeyMapping:
    def test_spotchecks(self):
        f = M.torch_d2_key_to_flax
        assert f("backbone.bottom_up.stem.conv1.weight") == (
            "params", ("bottom_up", "stem_conv1", "kernel"), "conv")
        assert f("backbone.bottom_up.stem.conv1.norm.running_mean") == (
            "batch_stats", ("bottom_up", "stem_bn1", "mean"), "bn")
        assert f("backbone.bottom_up.res2.0.shortcut.weight") == (
            "params", ("bottom_up", "res2_0", "downsample_conv", "kernel"), "conv")
        assert f("backbone.bottom_up.res3.2.conv2.norm.weight") == (
            "params", ("bottom_up", "res3_2", "bn2", "scale"), "bn")
        assert f("backbone.fpn_lateral2.bias") == (
            "params", ("fpn", "fpn_lateral2", "bias"), "bias")
        assert f("proposal_generator.rpn_head.anchor_deltas.weight") == (
            "params", ("rpn_head", "anchor_deltas", "kernel"), "conv")
        assert f("roi_heads.box_head.fc1.weight") == (
            "params", ("box_head", "fc1", "kernel"), "fc")
        assert f("roi_heads.box_predictor.cls_score.bias") == (
            "params", ("box_head", "cls_score", "bias"), "bias")
        assert f("roi_heads.mask_head.deconv.weight") == (
            "params", ("mask_head", "deconv", "kernel"), "convT")
        assert f("roi_heads.mask_head.predictor.weight") == (
            "params", ("mask_head", "predictor", "kernel"), "conv")
        assert f("pixel_mean") is None

    def test_mapping_covers_model_tree(self):
        """Every conv/fc/bn leaf in the Flax tree is reachable from some
        detectron2 key (no orphans that would stay random after import)."""
        model = M.MaskRCNN(max_det=4, pre_nms_topk=16, post_nms_topk=8, box_candidates=16,
                           dtype=jnp.float32)
        img = jnp.zeros((64, 128, 3))
        variables = model.init(jax.random.PRNGKey(0), img, jnp.array(64.0), jnp.array(128.0))

        from mdn_sfm_tpu.checkpoints import _flatten

        ours = set(_flatten(jax.device_get(variables)).keys())

        # enumerate plausible d2 keys and collect the flax paths they map to
        covered = set()
        keys = ["backbone.bottom_up.stem.conv1.weight"]
        for leaf in ("weight", "bias", "running_mean", "running_var"):
            keys.append(f"backbone.bottom_up.stem.conv1.norm.{leaf}")
        stages = {"res2": 3, "res3": 4, "res4": 6, "res5": 3}
        for st, n in stages.items():
            for b in range(n):
                keys.append(f"backbone.bottom_up.{st}.{b}.shortcut.weight")
                for leaf in ("weight", "bias", "running_mean", "running_var"):
                    keys.append(f"backbone.bottom_up.{st}.{b}.shortcut.norm.{leaf}")
                for c in (1, 2, 3):
                    keys.append(f"backbone.bottom_up.{st}.{b}.conv{c}.weight")
                    for leaf in ("weight", "bias", "running_mean", "running_var"):
                        keys.append(f"backbone.bottom_up.{st}.{b}.conv{c}.norm.{leaf}")
        for i in range(2, 6):
            for leaf in ("weight", "bias"):
                keys.append(f"backbone.fpn_lateral{i}.{leaf}")
                keys.append(f"backbone.fpn_output{i}.{leaf}")
        for name in ("conv", "objectness_logits", "anchor_deltas"):
            for leaf in ("weight", "bias"):
                keys.append(f"proposal_generator.rpn_head.{name}.{leaf}")
        for name in ("fc1", "fc2"):
            for leaf in ("weight", "bias"):
                keys.append(f"roi_heads.box_head.{name}.{leaf}")
        for name in ("cls_score", "bbox_pred"):
            for leaf in ("weight", "bias"):
                keys.append(f"roi_heads.box_predictor.{name}.{leaf}")
        for name in ("mask_fcn1", "mask_fcn2", "mask_fcn3", "mask_fcn4", "deconv", "predictor"):
            for leaf in ("weight", "bias"):
                keys.append(f"roi_heads.mask_head.{name}.{leaf}")

        for k in keys:
            mapped = M.torch_d2_key_to_flax(k)
            if mapped:
                coll, path, _ = mapped
                covered.add((coll,) + path)

        missing = ours - covered
        assert not missing, f"unmapped flax leaves: {sorted(missing)[:8]}"
