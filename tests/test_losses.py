"""Unit + golden-value tests for mdn_sfm_tpu.losses (reference semantics from
loss_functions.py / loss_utils.py, values re-derived independently)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mdn_sfm_tpu import losses as L
from mdn_sfm_tpu.config import Config, Mode


def _rng(seed=0):
    return np.random.default_rng(seed)


class TestSmoothLoss:
    def test_constant_mask_zero(self):
        img = jnp.asarray(_rng().normal(size=(2, 8, 8, 3)).astype(np.float32))
        mob = jnp.full((2, 8, 8, 1), 0.5)
        assert float(L.smooth_loss(img, mob)) == pytest.approx(0.0, abs=1e-7)

    def test_golden_small(self):
        """Hand-computed value on a 2×2 image."""
        # x-gradients: rows [|0.2-0.6|, |1.0-1.0|] = [0.4, 0]; mobile x-grads [1, 0]
        # y-gradients: cols [|0.2-1.0|, |0.6-1.0|] = [0.8, 0.4]; mobile y-grads [1, 0]
        img = jnp.array([[[[0.2], [0.6]], [[1.0], [1.0]]]])  # (1,2,2,1)
        mob = jnp.array([[[[1.0], [0.0]], [[0.0], [0.0]]]])
        expected_x = (1.0 * np.exp(-0.4) + 0.0) / 2
        expected_y = (1.0 * np.exp(-0.8) + 0.0) / 2
        got = float(L.smooth_loss(img, mob))
        assert got == pytest.approx(expected_x + expected_y, rel=1e-5)

    def test_edge_aware(self):
        """Mask gradients across strong image edges are penalized less."""
        mob = jnp.zeros((1, 8, 8, 1)).at[:, :, 4:].set(1.0)
        flat = jnp.zeros((1, 8, 8, 3))
        edged = jnp.zeros((1, 8, 8, 3)).at[:, :, 4:].set(10.0)
        assert float(L.smooth_loss(edged, mob)) < float(L.smooth_loss(flat, mob))


class TestConsistency:
    def test_equal_masks_zero(self):
        m = jnp.asarray(_rng().uniform(size=(2, 4, 4, 1)).astype(np.float32))
        assert float(jnp.mean(L.derivable_consistency_loss(m, m))) == 0.0

    def test_golden(self):
        # sigmoid(20*(1-0.5))=sigmoid(10); sigmoid(20*(0-0.5))=sigmoid(-10)
        m1 = jnp.array([[[[1.0]]]])
        m2 = jnp.array([[[[0.0]]]])
        s10 = 1 / (1 + np.exp(-10.0))
        expected = (s10 - (1 - s10)) ** 2
        got = float(L.derivable_consistency_loss(m1, m2)[0, 0, 0, 0])
        assert got == pytest.approx(expected, rel=1e-5)


class TestBCE:
    def test_golden(self):
        mobile = jnp.full((1, 2, 2, 1), 0.7)
        mask = jnp.ones((1, 2, 2))
        expected = -np.log(0.7 + 1e-10)
        got = float(jnp.mean(L.instance_similarity_bce(mobile, mask)))
        assert got == pytest.approx(expected, rel=1e-3)  # f32 log precision

    def test_resizes_mask(self):
        mobile = jnp.full((1, 4, 4, 1), 0.5)
        mask = jnp.ones((1, 8, 8))  # different resolution
        out = L.instance_similarity_bce(mobile, mask)
        assert out.shape == (1, 4, 4, 1)


class TestSSIM:
    def test_identical_images(self):
        img = jnp.asarray(_rng().uniform(size=(1, 8, 8, 3)).astype(np.float32))
        assert float(jnp.mean(L.ssim(img, img))) == pytest.approx(0.0, abs=1e-5)

    def test_range(self):
        x = jnp.asarray(_rng(1).uniform(size=(1, 8, 8, 3)).astype(np.float32))
        y = jnp.asarray(_rng(2).uniform(size=(1, 8, 8, 3)).astype(np.float32))
        v = np.asarray(L.ssim(x, y))
        assert (v >= 0).all() and (v <= 1).all()


class TestPostProcess:
    def test_sn_normalize_square_and_ori_aliasing(self):
        """SN: post = (map/max)²; logged 'ori' is the NORMALIZED map,
        reproducing the reference's in-place quirk (loss_utils.py:92-99)."""
        m = jnp.array([[[[1.0], [2.0]], [[3.0], [4.0]]]])  # (1,2,2,1)
        post, ori = L.post_process_epipolar(Mode.SN, m)
        np.testing.assert_allclose(np.asarray(post)[0, ..., 0], [[1 / 16, 4 / 16], [9 / 16, 1.0]], rtol=1e-6)
        np.testing.assert_allclose(np.asarray(ori)[0, ..., 0], [[0.25, 0.5], [0.75, 1.0]], rtol=1e-6)

    def test_t_threshold(self):
        m = jnp.full((1, 2, 2, 1), 4.61)
        post, ori = L.post_process_epipolar(Mode.T, m, threshold=9.22)
        np.testing.assert_allclose(np.asarray(post), (4.61 / 9.22) ** 2, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(ori), 4.61)

    def test_tg_gauss_weight(self):
        m = jnp.ones((1, 4, 8, 1))
        w = jnp.full((4, 8), 2.0)
        post, _ = L.post_process_epipolar(Mode.TG, m, threshold=1.0, gauss_weight=w)
        np.testing.assert_allclose(np.asarray(post), 0.25, rtol=1e-6)

    def test_ds_mask_multiply_no_square(self):
        m = jnp.full((1, 4, 4, 1), 3.0)
        mask = jnp.zeros((1, 4, 4)).at[:, :2].set(1.0)
        post, ori = L.post_process_epipolar(Mode.DS, m, instance_mask=mask)
        np.testing.assert_allclose(np.asarray(post)[0, 0, 0, 0], 3.0, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(post)[0, 3, 0, 0], 0.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ori), 3.0)

    def test_dc_same_postproc_as_sn(self):
        m = jnp.asarray(_rng().uniform(1, 5, size=(2, 4, 4, 1)).astype(np.float32))
        p1, o1 = L.post_process_epipolar(Mode.SN, m)
        p2, o2 = L.post_process_epipolar(Mode.DC, m)
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2))


def _make_inputs(cfg, seed=0, b=2):
    rng = _rng(seed)
    colors, inv_Ks, flows, mobiles = {}, {}, {}, {}
    K = np.array(
        [[0.58 * cfg.width, 0, 0.5 * cfg.width], [0, 1.92 * cfg.height, 0.5 * cfg.height], [0, 0, 1]],
        np.float32,
    )
    for s in cfg.scales:
        hs, ws = cfg.height // 2**s, cfg.width // 2**s
        for i in cfg.frame_ids:
            colors[(i, s)] = jnp.asarray(rng.normal(size=(b, hs, ws, 3)).astype(np.float32))
        Ks = K.copy()
        Ks[0] /= 2**s
        Ks[1] /= 2**s
        inv_Ks[s] = jnp.broadcast_to(jnp.asarray(np.linalg.inv(Ks)), (b, 3, 3))
        for i in cfg.ref_frame_ids:
            flows[(i, s)] = jnp.asarray(rng.normal(size=(b, hs, ws, 2)).astype(np.float32) * 0.01)
            mobiles[(i, s)] = jnp.asarray(rng.uniform(0.05, 0.95, size=(b, hs, ws, 1)).astype(np.float32))
    cam_T_cams = {}
    for i in cfg.ref_frame_ids:
        aa = jnp.asarray(rng.normal(size=(b, 1, 1, 3)).astype(np.float32) * 0.01)
        t = jnp.asarray(rng.normal(size=(b, 1, 1, 3)).astype(np.float32) * 0.01)
        from mdn_sfm_tpu.geometry import transformation_from_parameters

        cam_T_cams[i] = transformation_from_parameters(aa, t)
    return colors, inv_Ks, flows, mobiles, cam_T_cams


class TestComputeLosses:
    @pytest.mark.parametrize("mode", list(Mode))
    def test_all_modes_finite(self, mode):
        cfg = Config(height=32, width=64, mode=mode, w_d2_sim=0.05).validate()
        colors, inv_Ks, flows, mobiles, cams = _make_inputs(cfg)
        mask = jnp.zeros((2, 32, 64)).at[:, 10:20, 20:40].set(1.0)
        losses, aux = L.compute_losses(cfg, colors, inv_Ks, flows, mobiles, cams, mask)
        for k in ("loss", "epip", "smooth", "consis"):
            assert np.isfinite(float(losses[k])), k
        assert set(aux.epipolars) == {(-1, 0), (1, 0)}
        assert aux.min_mobiles[0].shape == (2, 32, 64, 1)

    def test_total_is_weighted_sum(self):
        cfg = Config(height=32, width=64, w_e=2.0, w_s=3.0, w_c=0.25, w_d2_sim=0.0).validate()
        colors, inv_Ks, flows, mobiles, cams = _make_inputs(cfg)
        losses, _ = L.compute_losses(cfg, colors, inv_Ks, flows, mobiles, cams, None)
        expected = 2.0 * losses["epip"] + 3.0 * losses["smooth"] + 0.25 * losses["consis"]
        assert float(losses["loss"]) == pytest.approx(float(expected), rel=1e-6)

    def test_scale_averaging(self):
        """Scale-s terms are divided by 2**s: restricting to scale 0 vs scale 1
        on identical per-scale inputs halves the consis term."""
        cfg0 = Config(height=32, width=64, scales=(0,), w_d2_sim=0.0).validate()
        colors, inv_Ks, flows, mobiles, cams = _make_inputs(cfg0)
        l0, _ = L.compute_losses(cfg0, colors, inv_Ks, flows, mobiles, cams, None)

        cfg1 = Config(height=32, width=64, scales=(1,), w_d2_sim=0.0).validate()
        # duplicate scale-0 tensors into the scale-1 slots
        colors2 = {(i, 1): colors[(i, 0)] for i in (0, -1, 1)}
        inv_Ks2 = {1: inv_Ks[0]}
        flows2 = {(i, 1): flows[(i, 0)] for i in (-1, 1)}
        mobiles2 = {(i, 1): mobiles[(i, 0)] for i in (-1, 1)}
        l1, _ = L.compute_losses(cfg1, colors2, inv_Ks2, flows2, mobiles2, cams, None)
        assert float(l1["consis"]) == pytest.approx(float(l0["consis"]) / 2, rel=1e-5)
        assert float(l1["smooth"]) == pytest.approx(float(l0["smooth"]) / 2, rel=1e-5)

    def test_min_fusion(self):
        """With min fusion, the mask used is the pixel-min of both frames
        (loss_functions.py:176-178)."""
        cfg = Config(height=32, width=64, w_d2_sim=0.0).validate()
        colors, inv_Ks, flows, mobiles, cams = _make_inputs(cfg)
        _, aux = L.compute_losses(cfg, colors, inv_Ks, flows, mobiles, cams, None)
        expected = np.minimum(np.asarray(mobiles[(-1, 0)]), np.asarray(mobiles[(1, 0)]))
        np.testing.assert_allclose(np.asarray(aux.min_mobiles[0]), expected)

    def test_disable_flags(self):
        cfg = Config(
            height=32, width=64, disable_smoothloss=True, disable_consisloss=True, w_d2_sim=0.0
        ).validate()
        colors, inv_Ks, flows, mobiles, cams = _make_inputs(cfg)
        losses, _ = L.compute_losses(cfg, colors, inv_Ks, flows, mobiles, cams, None)
        assert float(losses["smooth"]) == 0.0
        assert float(losses["consis"]) == 0.0

    def test_photometric_term_flag_gated(self):
        """disable_photoloss=False adds a finite 'photo' term weighted by w_p
        (reference loss_functions.py:48-50, disconnected there, wired here)."""
        cfg = Config(
            height=32, width=64, scales=(0,), w_d2_sim=0.0,
            disable_photoloss=False, no_ssim=False, w_p=2.0,
        ).validate()
        colors, inv_Ks, flows, mobiles, cams = _make_inputs(cfg)
        losses, _ = L.compute_losses(cfg, colors, inv_Ks, flows, mobiles, cams, None)
        assert "photo" in losses and np.isfinite(float(losses["photo"]))
        base = (
            cfg.w_e * losses["epip"] + cfg.w_s * losses["smooth"] + cfg.w_c * losses["consis"]
        )
        assert float(losses["loss"]) == pytest.approx(
            float(base + 2.0 * losses["photo"]), rel=1e-6
        )

    def test_grad_flows_to_mobile(self):
        import jax

        cfg = Config(height=32, width=64, scales=(0,), w_d2_sim=0.0).validate()
        colors, inv_Ks, flows, mobiles, cams = _make_inputs(cfg)

        def f(m):
            mob = {(-1, 0): m, (1, 0): mobiles[(1, 0)]}
            losses, _ = L.compute_losses(cfg, colors, inv_Ks, flows, mob, cams, None)
            return losses["loss"]

        g = jax.grad(f)(mobiles[(-1, 0)])
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0

    def test_rigid_scene_low_epipolar(self):
        """A perfectly rigid scene (flow consistent with the pose) drives the
        epipolar term to ~0 for background pixels — the core SfM supervision
        signal (SURVEY.md §0)."""
        cfg = Config(height=32, width=64, scales=(0,), w_d2_sim=0.0, mode=Mode.T, threshold=1.0).validate()
        b, h, w = 1, 32, 64
        K = np.array([[40.0, 0, 32.0], [0, 40.0, 16.0], [0, 0, 1]], np.float32)
        inv_K = jnp.asarray(np.linalg.inv(K))[None]

        # forward translation, radial flow (exactly epipolar-consistent)
        from mdn_sfm_tpu.geometry import pixel_coords

        pc = np.asarray(pixel_coords(h, w))
        radial = 0.02 * (pc - np.array([32.0, 16.0]))[None]
        sf = np.array([w, h], np.float32)
        flows = {(i, 0): jnp.asarray(radial / sf) for i in (-1, 1)}

        T = np.eye(4, dtype=np.float32)[None].copy()
        T[:, 2, 3] = 1.0
        cams = {i: jnp.asarray(T) for i in (-1, 1)}

        colors = {(0, 0): jnp.zeros((b, h, w, 3))}
        inv_Ks = {0: inv_K}
        mobiles = {(i, 0): jnp.full((b, h, w, 1), 0.5) for i in (-1, 1)}
        losses, _ = L.compute_losses(cfg, colors, inv_Ks, flows, mobiles, cams, None)
        assert float(losses["epip"]) < cfg.alpha * np.abs(0.5 * np.log(0.5 + 1e-5)) * 2 * 1.01
        # epip term ≈ alpha·nontrivial only (the residual part ~0)


class TestBceActivation:
    """BCE similarity-term semantics: DC's defining term (fail-fast without a
    mask), active in the reference's checked-in SN+DC combined head
    (loss_functions.py:124+132 both live), NOT implied for DS/T/TG."""

    def _loss(self, cfg, mask):
        colors, inv_Ks, flows, mobiles, cams = _make_inputs(cfg)
        losses, _ = L.compute_losses(cfg, colors, inv_Ks, flows, mobiles, cams, mask)
        return float(losses["loss"])

    def test_dc_without_mask_raises(self):
        cfg = Config(height=32, width=64, mode=Mode.DC, w_d2_sim=0.05).validate()
        colors, inv_Ks, flows, mobiles, cams = _make_inputs(cfg)
        with pytest.raises(ValueError, match="mode=DC requires"):
            L.compute_losses(cfg, colors, inv_Ks, flows, mobiles, cams, None)

    def test_ds_without_mask_raises(self):
        cfg = Config(height=32, width=64, mode=Mode.DS, w_d2_sim=0.0).validate()
        colors, inv_Ks, flows, mobiles, cams = _make_inputs(cfg)
        with pytest.raises(ValueError, match="mode=DS requires"):
            L.compute_losses(cfg, colors, inv_Ks, flows, mobiles, cams, None)

    def test_ds_is_pure_mask_times_map(self):
        """Default w_d2_sim must NOT add the BCE term in DS mode."""
        mask = jnp.zeros((2, 32, 64)).at[:, 10:20, 20:40].set(1.0)
        l1 = self._loss(Config(height=32, width=64, mode=Mode.DS, w_d2_sim=0.05).validate(), mask)
        l2 = self._loss(Config(height=32, width=64, mode=Mode.DS, w_d2_sim=0.0).validate(), mask)
        assert l1 == pytest.approx(l2, rel=1e-6)

    def test_ds_similarity_term_opt_in(self):
        """ds_similarity_term=True makes DS also add the w_d2_sim BCE term
        (the alternative reading of the reference head, where enabling
        post_process_epipolar_2 leaves loss_functions.py:132-133 live)."""
        mask = jnp.zeros((2, 32, 64)).at[:, 10:20, 20:40].set(1.0)
        base = Config(height=32, width=64, mode=Mode.DS, w_d2_sim=0.05).validate()
        opt = Config(height=32, width=64, mode=Mode.DS, w_d2_sim=0.05,
                     ds_similarity_term=True).validate()
        l_base = self._loss(base, mask)
        l_opt = self._loss(opt, mask)
        assert abs(l_opt - l_base) > 1e-7
        # and the opt-in still scales with w_d2_sim (0 weight == default)
        opt0 = Config(height=32, width=64, mode=Mode.DS, w_d2_sim=0.0,
                      ds_similarity_term=True).validate()
        assert self._loss(opt0, mask) == pytest.approx(l_base, rel=1e-6)

    def test_sn_plus_dc_combined_head(self):
        """SN with w_d2_sim>0 and a mask present adds the BCE term."""
        mask = jnp.zeros((2, 32, 64)).at[:, 10:20, 20:40].set(1.0)
        l1 = self._loss(Config(height=32, width=64, mode=Mode.SN, w_d2_sim=0.05).validate(), mask)
        l2 = self._loss(Config(height=32, width=64, mode=Mode.SN, w_d2_sim=0.0).validate(), mask)
        assert abs(l1 - l2) > 1e-7
