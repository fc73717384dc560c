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


class TestMultilevelDenseParity:
    def test_dense_matches_gather(self):
        """The separable-matmul multilevel ROIAlign (the hot-path form) must
        reproduce the gather formulation exactly: same taps, same clips,
        same sub-bin means — including degenerate all-zero boxes (invalid
        proposals), boxes hanging off the image, and boxes on every FPN
        level."""
        rng = np.random.default_rng(7)
        h, w = 32, 48
        feats = [
            jnp.asarray(rng.normal(size=(h // 2**i, w // 2**i, 8)).astype(np.float32))
            for i in range(4)
        ]
        boxes = jnp.asarray(
            np.array(
                [
                    [0.0, 0.0, 0.0, 0.0],          # degenerate (invalid slot)
                    [4.0, 4.0, 40.0, 30.0],        # P2-sized
                    [-10.0, -10.0, 60.0, 50.0],    # off-image → clipped taps
                    [0.0, 0.0, 500.0, 400.0],      # huge → clamped to P5
                    [3.0, 5.0, 90.0, 70.0],
                    [10.0, 2.0, 360.0, 250.0],
                ],
                np.float32,
            )
        )
        for out_size in (7, 14):
            dense = np.asarray(M.multilevel_roi_align(feats, boxes, out_size))
            gather = np.asarray(M.multilevel_roi_align_gather(feats, boxes, out_size))
            np.testing.assert_allclose(dense, gather, rtol=1e-5, atol=1e-5)


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


def _torchify(path: tuple, arr: np.ndarray) -> np.ndarray:
    """Inverse of import_detectron2_state_dict's layout transforms: flax
    template leaf → the torch-layout array a detectron2 checkpoint stores."""
    leaf = path[-1]
    if leaf == "kernel" and arr.ndim == 4:
        if "deconv" in path:
            # flax HWIO (flipped) ← torch (in, out, kh, kw)
            return np.ascontiguousarray(arr[::-1, ::-1].transpose(2, 3, 0, 1))
        return np.ascontiguousarray(arr.transpose(3, 2, 0, 1))  # OIHW
    if leaf == "kernel" and arr.ndim == 2:
        return np.ascontiguousarray(arr.T)  # (out, in)
    return np.asarray(arr)


def _fake_d2_state_dict(variables) -> dict:
    """Build a real-shaped detectron2 R50-FPN state dict whose values are the
    torch-layout images of the given flax variables (so a correct import is
    an exact round-trip)."""
    from mdn_sfm_tpu.checkpoints import _flatten

    # flax path → d2 key (reverse the forward mapping by enumeration)
    keys = ["backbone.bottom_up.stem.conv1.weight"]
    for leaf in ("weight", "bias", "running_mean", "running_var"):
        keys.append(f"backbone.bottom_up.stem.conv1.norm.{leaf}")
    for st, n in {"res2": 3, "res3": 4, "res4": 6, "res5": 3}.items():
        for b in range(n):
            if b == 0:
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

    flat = _flatten(jax.device_get(variables))
    sd = {}
    for k in keys:
        coll, path, _kind = M.torch_d2_key_to_flax(k)
        sd[k] = _torchify(path, np.asarray(flat[(coll,) + path], np.float32))
    # training-only / rebuilt-constant keys that must be ignored, not fatal
    sd["pixel_mean"] = np.zeros(3, np.float32)
    sd["pixel_std"] = np.ones(3, np.float32)
    for i in range(5):
        sd[f"proposal_generator.anchor_generator.cell_anchors.{i}"] = np.zeros((3, 4), np.float32)
    return sd


class TestD2Import:
    def test_fabricated_pth_roundtrip(self):
        """A real-shaped R50-FPN state dict loads with zero unmapped keys and
        zero unfilled leaves, and the imported tree equals the source."""
        sh, sw = M.static_input_shape()
        model = M.MaskRCNN(max_det=4, pre_nms_topk=16, post_nms_topk=8, box_candidates=16)
        shapes = jax.eval_shape(
            model.init, jax.random.PRNGKey(3), jnp.zeros((sh, sw, 3)),
            jnp.array(float(sh)), jnp.array(float(sw)),
        )
        rng = np.random.default_rng(3)
        variables = jax.tree.map(
            lambda s: jnp.asarray(rng.normal(size=s.shape).astype(np.float32)), shapes
        )
        sd = _fake_d2_state_dict(variables)
        merged = M.import_detectron2_state_dict(sd, model, strict=True)

        src = jax.device_get(variables)
        got = jax.device_get(merged)
        for a, b in zip(jax.tree.leaves(src), jax.tree.leaves(got)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_unknown_key_raises(self):
        model = M.MaskRCNN(max_det=4, pre_nms_topk=16, post_nms_topk=8, box_candidates=16)
        shapes = jax.eval_shape(
            model.init, jax.random.PRNGKey(3), jnp.zeros((64, 128, 3)),
            jnp.array(64.0), jnp.array(128.0),
        )
        variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
        sd = _fake_d2_state_dict(variables)
        sd["roi_heads.unexpected.weight"] = np.zeros((4, 4), np.float32)
        with pytest.raises(ValueError, match="unmapped"):
            M.import_detectron2_state_dict(sd, model, strict=True)

    def test_missing_leaf_raises(self):
        model = M.MaskRCNN(max_det=4, pre_nms_topk=16, post_nms_topk=8, box_candidates=16)
        shapes = jax.eval_shape(
            model.init, jax.random.PRNGKey(3), jnp.zeros((64, 128, 3)),
            jnp.array(64.0), jnp.array(128.0),
        )
        variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
        sd = _fake_d2_state_dict(variables)
        del sd["roi_heads.mask_head.deconv.weight"]
        with pytest.raises(ValueError, match="unfilled|fills"):
            M.import_detectron2_state_dict(sd, model, strict=True)

    def test_deconv_layout_matches_torch(self):
        """torch ConvTranspose2d(256,256,2,stride=2) == flax ConvTranspose
        with the imported (transposed + spatially flipped) kernel — resolves
        the round-1 'IOHW?' uncertainty numerically."""
        torch = pytest.importorskip("torch")
        import flax.linen as nn

        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 5, 5, 16)).astype(np.float32)
        w = rng.normal(size=(16, 16, 2, 2)).astype(np.float32)  # (in, out, kh, kw)
        b = rng.normal(size=(16,)).astype(np.float32)

        tconv = torch.nn.ConvTranspose2d(16, 16, 2, stride=2)
        with torch.no_grad():
            tconv.weight.copy_(torch.from_numpy(w))
            tconv.bias.copy_(torch.from_numpy(b))
            ty = tconv(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)

        kernel = np.ascontiguousarray(w.transpose(2, 3, 0, 1)[::-1, ::-1])  # import transform
        mod = nn.ConvTranspose(16, (2, 2), strides=(2, 2))
        jy = mod.apply(
            {"params": {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(b)}}, jnp.asarray(x)
        )
        np.testing.assert_allclose(np.asarray(jy), ty, atol=1e-4)

    def test_box_head_flatten_matches_torch(self):
        """detectron2 flattens NCHW before fc1; our BoxHead transposes to
        match — verified against a torch Linear on the same weights."""
        torch = pytest.importorskip("torch")

        rng = np.random.default_rng(1)
        x = rng.normal(size=(3, 7, 7, 8)).astype(np.float32)  # (R, 7, 7, C) NHWC
        w = rng.normal(size=(5, 8 * 49)).astype(np.float32)   # torch (out, in)
        b = rng.normal(size=(5,)).astype(np.float32)

        t_in = torch.from_numpy(x.transpose(0, 3, 1, 2)).reshape(3, -1)
        ty = (t_in @ torch.from_numpy(w).T + torch.from_numpy(b)).numpy()

        j_in = jnp.asarray(x).transpose(0, 3, 1, 2).reshape(3, -1)  # BoxHead's flatten
        jy = j_in @ jnp.asarray(w.T) + jnp.asarray(b)               # fc import transform
        np.testing.assert_allclose(np.asarray(jy), ty, atol=1e-4)


class TestPerLevelNMS:
    def test_level_offset_prevents_cross_level_suppression(self):
        """Two identical boxes on different FPN levels must BOTH survive
        (detectron2 find_top_rpn_proposals runs NMS per level); the level
        offset encoding makes the joint static NMS behave that way."""
        boxes = jnp.array([[10.0, 10, 50, 50], [10, 10, 50, 50], [12, 12, 52, 52]])
        scores = jnp.array([0.9, 0.8, 0.7])
        lvls = jnp.array([0.0, 1.0, 0.0])  # box 0 and 2 same level, box 1 other
        off = lvls[:, None] * (M.MAX_SIZE_TEST * 2.0)
        keep, valid = M.nms_fixed(boxes + off, scores, 0.5, 3)
        kept = set(np.asarray(keep)[np.asarray(valid)].tolist())
        assert kept == {0, 1}, "same-level overlap suppressed, cross-level kept"


class TestMaskRCNNProvider:
    @pytest.fixture(scope="class")
    def provider(self):
        from mdn_sfm_tpu.config import Config, Mode

        cfg = Config(height=64, width=96, batch_size=2, mode=Mode.DS,
                     mask_provider="maskrcnn", d2_max_instances=4,
                     d2_infer_scale=2, compute_dtype="float32",
                     d2_allow_random_weights=True).validate()
        return M.MaskRCNNProvider(cfg), cfg

    def test_batched_union_masks(self, provider):
        prov, cfg = provider
        rng = np.random.default_rng(0)
        imgs = rng.integers(0, 255, size=(2, cfg.height, cfg.width, 3), dtype=np.uint8)
        out = np.asarray(prov.union_masks_from_images(imgs, cfg.height, cfg.width))
        assert out.shape == (2, cfg.height, cfg.width)
        assert out.dtype == np.float32
        assert set(np.unique(out)).issubset({0.0, 1.0})

    def test_keyed_lookup_raises(self, provider):
        prov, cfg = provider
        with pytest.raises(RuntimeError, match="union_masks_from_images"):
            prov.union_masks(["a", "b"], cfg.height, cfg.width)

    def test_missing_weights_fail_fast(self, tmp_path):
        """Without d2_allow_random_weights, a log_dir lacking
        model_final_detectron2.pth must refuse to build the provider —
        DS/DC supervised by random weights is silent garbage."""
        from mdn_sfm_tpu.config import Config, Mode

        cfg = Config(height=64, width=96, batch_size=1, mode=Mode.DS,
                     mask_provider="maskrcnn", d2_max_instances=2,
                     log_dir=str(tmp_path), compute_dtype="float32").validate()
        with pytest.raises(FileNotFoundError, match="model_final_detectron2"):
            M.MaskRCNNProvider(cfg)

    def test_roi_dtype_split(self, provider):
        """The provider pools ROIs in bf16 (perf); the GT-tooling backend
        keeps detectron2-exact f32 even with the fast proposal budget."""
        prov, _ = provider
        assert prov.model.roi_dtype == jnp.bfloat16
        assert "roi_dtype" not in M.FAST_BUDGET
        fast_backend_model = M.MaskRCNN(max_det=2, **M.FAST_BUDGET)
        assert fast_backend_model.roi_dtype == jnp.float32


class TestFusedProviderStep:
    """cfg.d2_fuse_step: the live provider fused INTO the jitted train step
    (training.py::_batch_instance_mask) must reproduce a host-driven provider
    fed the same augmented target frame exactly."""

    @pytest.fixture(scope="class")
    def provider(self):
        from mdn_sfm_tpu.config import Config, Mode

        cfg = Config(height=64, width=96, batch_size=2, mode=Mode.DS,
                     mask_provider="maskrcnn", d2_max_instances=4,
                     d2_infer_scale=2, compute_dtype="float32",
                     d2_allow_random_weights=True).validate()
        return M.MaskRCNNProvider(cfg), cfg

    def test_fused_step_matches_host_masks(self, provider):
        import dataclasses

        from mdn_sfm_tpu import training as T
        from mdn_sfm_tpu.data.augment import augment_batch
        from mdn_sfm_tpu.data.synthetic import synthetic_batch

        prov, cfg0 = provider
        cfg = dataclasses.replace(cfg0, donate_state=False)
        models = T.build_models(cfg)
        variables = T.init_variables(cfg, models, jax.random.PRNGKey(0))
        tx = T.make_optimizer(cfg, steps_per_epoch=10)
        state, frozen = T.create_train_state(cfg, models, variables, tx)
        colors, K = synthetic_batch(cfg.batch_size, cfg.height, cfg.width, seed=3)
        batch = {"colors_u8": jnp.asarray(colors), "K": jnp.asarray(K)}
        rng = jax.random.PRNGKey(1)

        frozen_f = dict(frozen)
        frozen_f["maskrcnn"] = prov.variables
        fused = T.make_train_step(cfg, models, tx, mask_fn=prov.union_fn)
        _, _, m_fused, _ = fused(state, frozen_f, batch, rng)

        # host path: recompute the step's augmented target with the same rng
        # stream, run the provider standalone, feed the masks precomputed
        step_rng = jax.random.fold_in(rng, state.step)
        _, _, raw0 = augment_batch(cfg, batch["colors_u8"], batch["K"], step_rng, train=True)
        masks = prov.union_masks_from_images(raw0 * 255.0, cfg.height, cfg.width)
        plain = T.make_train_step(cfg, models, tx)
        _, _, m_host, _ = plain(
            state, frozen, {**batch, "instance_mask": jnp.asarray(masks)}, rng
        )
        assert float(m_fused["loss"]) == pytest.approx(
            float(m_host["loss"]), rel=1e-6, abs=1e-7
        )

    @pytest.mark.slow  # ~4 min: fused Mask R-CNN step over the 8-dev mesh
    def test_fused_step_data_parallel(self, provider):
        """The fused provider must shard over Mesh('data') like the rest of
        the step: per-device batch slices run the Mask R-CNN vmap locally,
        grads all-reduce via SPMD — same loss as single-device."""
        import dataclasses

        from mdn_sfm_tpu import training as T
        from mdn_sfm_tpu.data.synthetic import synthetic_batch
        from mdn_sfm_tpu.parallel import make_mesh, replicate, shard_batch

        prov, cfg0 = provider
        cfg = dataclasses.replace(cfg0, donate_state=False, batch_size=8)
        models = T.build_models(cfg)
        variables = T.init_variables(cfg, models, jax.random.PRNGKey(0))
        tx = T.make_optimizer(cfg, steps_per_epoch=10)
        state, frozen = T.create_train_state(cfg, models, variables, tx)
        frozen = dict(frozen)
        frozen["maskrcnn"] = prov.variables
        step = T.make_train_step(cfg, models, tx, mask_fn=prov.union_fn)

        colors, K = synthetic_batch(cfg.batch_size, cfg.height, cfg.width, seed=5)
        batch = {"colors_u8": jnp.asarray(colors), "K": jnp.asarray(K)}
        rng = jax.random.PRNGKey(2)

        _, _, m_single, _ = step(state, frozen, batch, rng)

        mesh = make_mesh(8)
        step_dp = T.make_train_step(cfg, models, tx, mask_fn=prov.union_fn, mesh=mesh)
        _, _, m_shard, _ = step_dp(
            replicate(mesh, state), replicate(mesh, frozen), shard_batch(mesh, batch), rng
        )
        assert float(m_shard["loss"]) == pytest.approx(float(m_single["loss"]), rel=1e-4)


class TestTorchPipelineParity:
    """End-to-end validation of the whole port against an INDEPENDENT torch
    twin (tests/torch_d2_twin.py): a real torch-serialized .pth in the
    detectron2 key layout goes through import_detectron2_pth, and the
    JAX detections must match the twin's — convs, frozen BN, FPN, RPN
    proposal selection, ROIAlign, NMS, box regression, mask head."""

    BUDGET = dict(max_det=8, pre_nms_topk=64, post_nms_topk=32,
                  box_candidates=64, score_thresh=0.05)

    def test_full_pipeline_matches_torch_twin(self, tmp_path):
        import torch

        from torch_d2_twin import random_twin

        twin = random_twin(seed=3, **self.BUDGET)
        pth = str(tmp_path / "model_final_detectron2.pth")
        torch.save(twin.state_dict(), pth)

        model = M.MaskRCNN(dtype=jnp.float32, roi_dtype=jnp.float32, **self.BUDGET)
        variables = M.import_detectron2_pth(pth, model)

        rng = np.random.default_rng(11)
        img = rng.uniform(0, 255, size=(128, 256, 3)).astype(np.float32)
        img -= np.array(M.PIXEL_MEAN_BGR, np.float32)

        det = jax.device_get(
            jax.jit(model.apply)(
                variables, jnp.asarray(img), jnp.float32(120.0), jnp.float32(250.0)
            )
        )
        tb, ts, tc, tm, tv = twin(
            torch.from_numpy(img).permute(2, 0, 1), 120.0, 250.0
        )

        np.testing.assert_array_equal(np.asarray(det.valid), tv.numpy())
        assert det.valid.any(), "no valid detections — test would be vacuous"
        v = np.asarray(det.valid)
        np.testing.assert_array_equal(np.asarray(det.classes)[v], tc.numpy()[v])
        np.testing.assert_allclose(np.asarray(det.scores)[v], ts.numpy()[v],
                                   atol=5e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(det.boxes)[v], tb.numpy()[v],
                                   atol=0.1, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(det.masks28)[v], tm.numpy()[v],
                                   atol=2e-3)

    def test_paste_matches_torch_grid_sample(self):
        """The separable-matmul paste equals torch grid_sample
        (align_corners=False, zeros padding) — the canonical detectron2
        paste_masks_in_image op."""
        import torch

        from torch_d2_twin import paste_masks_t

        rng = np.random.default_rng(5)
        masks = rng.uniform(size=(6, 28, 28)).astype(np.float32)
        boxes = np.stack([
            rng.uniform(0, 40, 6), rng.uniform(0, 30, 6),
            rng.uniform(50, 95, 6), rng.uniform(40, 62, 6),
        ], axis=-1).astype(np.float32)
        ours = np.asarray(M.paste_masks(jnp.asarray(masks), jnp.asarray(boxes), 64, 96))
        ref = paste_masks_t(torch.from_numpy(masks), torch.from_numpy(boxes), 64, 96)
        np.testing.assert_allclose(ours, ref.numpy(), atol=1e-5)


class TestSpatialSharding:
    @pytest.mark.slow  # ~90 s: 8-shard spatial mesh vs single device
    def test_spatial_mesh_matches_single_device(self):
        """The width-sharded backend (image spatially partitioned over an
        8-device 'spatial' mesh, conv halos inserted by GSPMD) must reproduce
        the single-device pipeline end to end."""
        from mdn_sfm_tpu.parallel import make_spatial_mesh

        hw = (128, 512)
        single = M.MaskRCNNBackend(max_det=4, fast=True, input_hw=hw)
        sharded = M.MaskRCNNBackend(
            max_det=4, fast=True, input_hw=hw, mesh=make_spatial_mesh(8)
        )
        # identical init keys → identical random weights
        chex = jax.tree_util.tree_all(
            jax.tree.map(lambda a, b: bool(jnp.all(a == b)),
                         single.variables, sharded.variables)
        )
        assert chex

        rng = np.random.default_rng(7)
        img = rng.integers(0, 255, size=(120, 500, 3), dtype=np.uint8)
        padded, scale, nh, nw = M.preprocess_np(img, hw)
        args = (jnp.asarray(padded), jnp.array(float(nh)), jnp.array(float(nw)),
                jnp.array(scale, jnp.float32))
        m1, b1, c1, s1, v1 = jax.device_get(
            single._run(single.variables, *args, 120, 500))
        m2, b2, c2, s2, v2 = jax.device_get(
            sharded._run(sharded.variables, *args, 120, 500))
        np.testing.assert_array_equal(v1, v2)
        np.testing.assert_array_equal(c1, c2)
        np.testing.assert_allclose(s1, s2, atol=1e-3)
        np.testing.assert_allclose(b1, b2, atol=0.5)  # px-scale box agreement
        # binarized masks: near-total pixel agreement (float-order effects
        # only flip pixels sitting exactly on the 0.5 paste threshold)
        disagree = np.mean(m1.astype(np.int32) != m2.astype(np.int32))
        assert disagree < 1e-3


class TestScoreThreshWiring:
    def test_d2_score_thresh_reaches_the_model(self):
        """Regression: --d2_score_thresh was parsed but never read — the
        model used the hardcoded ROI_SCORE_THRESH."""
        from mdn_sfm_tpu.config import Config, Mode

        cfg = Config(height=64, width=96, batch_size=1, mode=Mode.DS,
                     mask_provider="maskrcnn", d2_max_instances=2,
                     d2_score_thresh=0.7, compute_dtype="float32",
                     d2_allow_random_weights=True).validate()
        prov = M.MaskRCNNProvider(cfg)
        assert prov.model.score_thresh == 0.7
        assert prov.model.pre_nms_topk == M.FAST_BUDGET["pre_nms_topk"]


class TestInferScaleDeviation:
    """Pins the d2_infer_scale resolution quirk (PARITY.md quirk table): the
    training-time provider infers at a reduced resolution while the reference
    pipeline (our GT-tooling backend) runs shortest-edge-1024. With the
    crafted scale-covariant brightness detector (tests/fixtures.py) the union
    masks must agree up to pipeline discretization — this test pins that
    agreement at small shapes; tools/quantify_d2_scale.py measures it at the
    real 375x1242 / 1024-edge sizes on TPU."""

    @pytest.mark.slow  # ~70 s: three full pipelines at different scales
    def test_provider_scales_agree_with_backend(self):
        import cv2
        from fixtures import craft_brightness_detector, make_street_scene

        from mdn_sfm_tpu.config import Config, Mode

        h, w = 64, 128          # training res; street "full res" = 2x
        fh, fw = 128, 256
        shapes = jax.eval_shape(
            M.MaskRCNN(max_det=8).init, jax.random.PRNGKey(0),
            jnp.zeros((64, 64, 3)), jnp.array(64.0), jnp.array(64.0),
        )
        crafted = jax.tree.map(jnp.asarray, craft_brightness_detector(shapes))

        backend = M.MaskRCNNBackend(max_det=8, fast=True, input_hw=(fh, fw))
        backend.variables = crafted

        ious = {}
        for scale in (1, 2):
            cfg = Config(height=h, width=w, mode=Mode.DS,
                         mask_provider="maskrcnn", d2_max_instances=8,
                         d2_infer_scale=scale,
                         d2_allow_random_weights=True).validate()
            prov = M.MaskRCNNProvider(cfg)
            prov.variables = crafted

            vals = []
            for seed in (0, 1):
                img, gt = make_street_scene(h=fh, w=fw, n_objects=2, seed=seed)
                masks, _b, _c, _s = backend.predict(img)
                assert masks.shape[0] >= 1, "backend found nothing — vacuous"
                ref_full = masks.any(axis=0).astype(np.float32)
                ref = cv2.resize(ref_full, (w, h),
                                 interpolation=cv2.INTER_AREA) > 0.5
                # backend union must track the bright GT objects at all
                gt_small = cv2.resize(gt.astype(np.float32), (w, h),
                                      interpolation=cv2.INTER_AREA) > 0.5
                assert _mask_iou(ref, gt_small) > 0.2

                u = np.asarray(
                    prov.union_masks_from_images(img[None], h, w))[0] > 0.5
                vals.append(_mask_iou(u, ref))
            ious[scale] = float(np.mean(vals))

        # Measured (this exact setup): scale2 IoU 0.926/0.956, scale1
        # 0.167/0.461. Scale 2 sees the backend's exact pixels (fh x fw) —
        # the remaining ~5% gap is FAST_BUDGET pruning + bf16 ROIAlign +
        # paste quantization. Scale 1 halves the pixels: these miniature
        # objects (8-18 px) drop below P2 anchor coverage — the real
        # deviation mechanism this test pins. At production sizes
        # (tools/quantify_d2_scale.py: 375x1242 scenes, 1024-edge backend vs
        # 192x640-training providers) the ordering is the same; measured
        # numbers live in PARITY.md's quirk discussion.
        assert ious[2] > 0.85, ious
        assert ious[1] > 0.2, ious
        assert ious[2] > ious[1], ious


def _mask_iou(a: np.ndarray, b: np.ndarray) -> float:
    a, b = np.asarray(a, bool), np.asarray(b, bool)
    return float((a & b).sum() / max((a | b).sum(), 1))
