"""Unit tests for mdn_sfm_tpu.geometry against independently derived values.

Golden values come from hand-derived math (Rodrigues' formula, epipolar
algebra), NOT from running the reference — per SURVEY.md §4 these are the
riskiest numerics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdn_sfm_tpu import geometry as G


def _np_rodrigues(vec):
    """Independent numpy Rodrigues: R = I + sinθ·K + (1-cosθ)·K²."""
    theta = np.linalg.norm(vec)
    if theta < 1e-12:
        return np.eye(3)
    k = vec / theta
    K = np.array(
        [[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]], dtype=np.float64
    )
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)


class TestRotations:
    def test_identity_at_zero(self):
        R = G.rot_from_axisangle(jnp.zeros((1, 3)))
        np.testing.assert_allclose(R[0], np.eye(3), atol=1e-5)

    def test_quarter_turn_z(self):
        vec = np.array([[0.0, 0.0, np.pi / 2]])
        R = np.asarray(G.rot_from_axisangle(jnp.asarray(vec)))[0]
        expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float64)
        np.testing.assert_allclose(R, expected, atol=1e-6)

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_rodrigues(self, seed):
        rng = np.random.default_rng(seed)
        vecs = rng.normal(size=(4, 3)).astype(np.float32) * 0.5
        R = np.asarray(G.rot_from_axisangle(jnp.asarray(vecs)))
        for b in range(4):
            np.testing.assert_allclose(R[b], _np_rodrigues(vecs[b]), atol=1e-5)

    def test_orthonormal(self):
        rng = np.random.default_rng(7)
        vecs = rng.normal(size=(8, 3)).astype(np.float32)
        R = np.asarray(G.rot_from_axisangle(jnp.asarray(vecs)))
        eye = np.broadcast_to(np.eye(3), (8, 3, 3))
        np.testing.assert_allclose(R @ R.transpose(0, 2, 1), eye, atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), np.ones(8), atol=1e-5)

    def test_grad_finite_at_zero(self):
        """The naive ‖vec‖ has a 0/0 gradient at vec = 0 — with a trainable
        pose head that emits an exact zero (zero-init bias, relu dead zone),
        that NaN reaches EVERY parameter via global grad-clipping. The
        gradient-safe form must return a finite (zero) gradient there and
        stay correct nearby."""
        g = jax.grad(lambda v: jnp.sum(G.rot_from_axisangle(v) ** 2))(
            jnp.zeros((2, 3))
        )
        assert np.all(np.isfinite(np.asarray(g)))

        vecs = jnp.asarray([[1e-4, -2e-4, 3e-4], [0.3, -0.2, 0.1]], jnp.float32)
        g = jax.grad(lambda v: jnp.sum(jnp.sin(G.rot_from_axisangle(v))))(vecs)
        assert np.all(np.isfinite(np.asarray(g)))


class TestTransformation:
    def test_layout(self):
        """T(t)·R layout: rotation block top-left, translation last column
        (reference semantics networks/layers.py:16-40: M = T @ R)."""
        aa = jnp.array([[[[0.0, 0.0, 0.3]]]])
        t = jnp.array([[[[1.0, 2.0, 3.0]]]])
        M = np.asarray(G.transformation_from_parameters(aa, t))
        R = np.asarray(G.rot_from_axisangle(jnp.array([[0.0, 0.0, 0.3]])))[0]
        np.testing.assert_allclose(M[0, :3, :3], R, atol=1e-6)
        np.testing.assert_allclose(M[0, :3, 3], [1, 2, 3], atol=1e-6)
        np.testing.assert_allclose(M[0, 3], [0, 0, 0, 1], atol=1e-6)

    def test_invert_is_inverse(self):
        rng = np.random.default_rng(3)
        aa = jnp.asarray(rng.normal(size=(4, 1, 1, 3)).astype(np.float32) * 0.2)
        t = jnp.asarray(rng.normal(size=(4, 1, 1, 3)).astype(np.float32))
        M = np.asarray(G.transformation_from_parameters(aa, t))
        Minv = np.asarray(G.transformation_from_parameters(aa, t, invert=True))
        eye = np.broadcast_to(np.eye(4), (4, 4, 4))
        np.testing.assert_allclose(M @ Minv, eye, atol=1e-5)


class TestEpipolar:
    def test_skew_cross_product(self):
        rng = np.random.default_rng(0)
        t = rng.normal(size=(3, 3)).astype(np.float32)
        v = rng.normal(size=(3, 3)).astype(np.float32)
        S = np.asarray(G.skew(jnp.asarray(t)))
        for b in range(3):
            np.testing.assert_allclose(S[b] @ v[b], np.cross(t[b], v[b]), atol=1e-6)

    def test_pure_rigid_motion_gives_zero_residual(self):
        """Flow induced by a pure camera rotation must satisfy the epipolar
        constraint... for rotation-only motion E=skew(t)R is 0; instead use a
        translation-only motion with flow along epipolar lines."""
        h, w = 16, 32
        K = np.array([[20.0, 0, w / 2], [0, 20.0, h / 2], [0, 0, 1]], dtype=np.float32)
        inv_K = np.linalg.inv(K)[None]
        R = np.eye(3, dtype=np.float32)[None]
        t = np.array([[0.0, 0.0, 1.0]], dtype=np.float32)  # forward motion

        # Forward translation ⇒ flow radiates from the focus of expansion at
        # the principal point: flow ∝ (p - c). Any such radial flow satisfies
        # the epipolar constraint exactly.
        pc = np.asarray(G.pixel_coords(h, w))
        center = np.array([w / 2, h / 2], dtype=np.float32)
        flow = 0.05 * (pc - center)[None]  # (1, H, W, 2)

        resid = np.asarray(
            G.epipolar_residual(jnp.asarray(flow), jnp.asarray(inv_K), jnp.asarray(R), jnp.asarray(t))
        )
        # f32 noise is amplified near the focus of expansion where the
        # epipolar-line norm → 0; bound the worst pixel loosely and the
        # bulk tightly
        assert np.abs(resid).max() < 5e-3
        assert np.median(np.abs(resid)) < 1e-5

    def test_nonrigid_flow_gives_nonzero_residual(self):
        h, w = 16, 32
        K = np.array([[20.0, 0, w / 2], [0, 20.0, h / 2], [0, 0, 1]], dtype=np.float32)
        inv_K = np.linalg.inv(K)[None]
        R = np.eye(3, dtype=np.float32)[None]
        t = np.array([[0.0, 0.0, 1.0]], dtype=np.float32)

        rng = np.random.default_rng(0)
        flow = rng.normal(size=(1, h, w, 2)).astype(np.float32) * 3.0
        resid = np.asarray(
            G.epipolar_residual(jnp.asarray(flow), jnp.asarray(inv_K), jnp.asarray(R), jnp.asarray(t))
        )
        assert np.abs(resid).mean() > 1e-3

    def test_matches_dense_formulation(self):
        """The fused residual equals the explicit p1/p2 matrix formulation
        (reference algebra loss_utils.py:39-69, recomputed in numpy)."""
        rng = np.random.default_rng(5)
        b, h, w = 2, 8, 12
        flow = rng.normal(size=(b, h, w, 2)).astype(np.float32)
        K = np.array([[15.0, 0, 6.0], [0, 14.0, 4.0], [0, 0, 1]], dtype=np.float32)
        inv_K = np.broadcast_to(np.linalg.inv(K), (b, 3, 3)).copy()
        aa = rng.normal(size=(b, 3)).astype(np.float32) * 0.1
        R = np.asarray(G.rot_from_axisangle(jnp.asarray(aa)))
        t = rng.normal(size=(b, 3)).astype(np.float32)

        got = np.asarray(
            G.epipolar_residual(jnp.asarray(flow), jnp.asarray(inv_K), jnp.asarray(R), jnp.asarray(t))
        )

        # dense numpy version
        xs, ys = np.meshgrid(np.arange(w), np.arange(h), indexing="xy")
        ones = np.ones_like(xs, dtype=np.float32)
        p1 = np.stack([xs, ys, ones], 0).reshape(3, -1).astype(np.float32)  # (3, N)
        for i in range(b):
            tx = np.array(
                [[0, -t[i, 2], t[i, 1]], [t[i, 2], 0, -t[i, 0]], [-t[i, 1], t[i, 0], 0]],
                dtype=np.float32,
            )
            F = inv_K[i].T @ (tx @ R[i]) @ inv_K[i]
            p2 = p1.copy()
            p2[0] += flow[i, ..., 0].reshape(-1)
            p2[1] += flow[i, ..., 1].reshape(-1)
            Fp1 = F @ p1
            num = (Fp1 * p2).sum(0)
            den = np.sqrt((Fp1[:2] ** 2).sum(0) + 1e-10) + 1e-10
            expected = (num / den).reshape(h, w)
            np.testing.assert_allclose(got[i], expected, atol=2e-4, rtol=1e-4)


class TestSampling:
    def test_bilinear_identity(self):
        rng = np.random.default_rng(0)
        img = rng.normal(size=(2, 6, 7, 3)).astype(np.float32)
        coords = np.broadcast_to(np.asarray(G.pixel_coords(6, 7)), (2, 6, 7, 2))
        out = np.asarray(G.bilinear_sample(jnp.asarray(img), jnp.asarray(coords)))
        np.testing.assert_allclose(out, img, atol=1e-6)

    def test_bilinear_interp_midpoint(self):
        img = np.zeros((1, 2, 2, 1), np.float32)
        img[0, :, :, 0] = [[0.0, 1.0], [2.0, 3.0]]
        coords = np.array([[[[0.5, 0.5]]]], np.float32)
        out = np.asarray(G.bilinear_sample(jnp.asarray(img), jnp.asarray(coords)))
        np.testing.assert_allclose(out[0, 0, 0, 0], 1.5, atol=1e-6)

    def test_zeros_padding(self):
        img = np.ones((1, 4, 4, 1), np.float32)
        coords = np.array([[[[-2.0, -2.0], [10.0, 10.0]]]], np.float32)
        out = np.asarray(G.bilinear_sample(jnp.asarray(img), jnp.asarray(coords)))
        np.testing.assert_allclose(out, 0.0, atol=1e-6)

    def test_inverse_warp_zero_flow(self):
        rng = np.random.default_rng(1)
        img = rng.normal(size=(1, 8, 8, 3)).astype(np.float32)
        warped, valid = G.inverse_warp(jnp.asarray(img), jnp.zeros((1, 8, 8, 2)))
        np.testing.assert_allclose(np.asarray(warped), img, atol=1e-6)
        np.testing.assert_allclose(np.asarray(valid), 1.0)

    def test_inverse_warp_shift(self):
        """Flow of +1 in x samples the pixel to the right."""
        img = np.arange(8, dtype=np.float32).reshape(1, 1, 8, 1)
        img = np.broadcast_to(img, (1, 4, 8, 1)).copy()
        flow = np.zeros((1, 4, 8, 2), np.float32)
        flow[..., 0] = 1.0
        warped, valid = G.inverse_warp(jnp.asarray(img), jnp.asarray(flow))
        np.testing.assert_allclose(np.asarray(warped)[0, :, :-1, 0], img[0, :, 1:, 0], atol=1e-6)
        assert np.asarray(valid)[0, 0, -1, 0] == 0.0  # out of bounds


class TestMisc:
    def test_upsample_nearest(self):
        x = jnp.arange(4.0).reshape(1, 2, 2, 1)
        y = np.asarray(G.upsample_nearest_2x(x))
        assert y.shape == (1, 4, 4, 1)
        expected = np.array(
            [[0, 0, 1, 1], [0, 0, 1, 1], [2, 2, 3, 3], [2, 2, 3, 3]], np.float32
        )
        np.testing.assert_allclose(y[0, :, :, 0], expected)

    def test_scale_factor(self):
        np.testing.assert_allclose(np.asarray(G.scale_factor(128, 416)), [416.0, 128.0])

    def test_gauss_weight_scale_consistency(self):
        """Pixels at the same relative position share weights across scales
        (reference: utils.py:355-379 docstring contract)."""
        ws = G.gauss_distance_weight(128, 416, 2)
        w0, w1 = np.asarray(ws[0]), np.asarray(ws[1])
        assert w0.shape == (128, 416) and w1.shape == (64, 208)
        np.testing.assert_allclose(w0[::2, ::2], w1, rtol=1e-4)
        assert w0.min() >= 5.0  # offset floor

    def test_gauss_weight_center_is_min(self):
        w = np.asarray(G.gauss_distance_weight(64, 128, 1)[0])
        assert w[32, 64] == w.min()


class TestResizeTorchParity:
    """resize_bilinear must match torch F.interpolate(bilinear,
    align_corners=False, antialias=False) — the reference's tensor-mode
    torchvision Resize — in BOTH directions (downsampling previously went
    through jax.image.resize, which antialiases)."""

    @pytest.mark.parametrize("dst", [(4, 8), (16, 32), (6, 40)])
    def test_matches_torch(self, dst):
        import torch
        import torch.nn.functional as F

        from mdn_sfm_tpu.geometry import resize_bilinear

        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 8, 16, 3)).astype(np.float32)
        ours = np.asarray(resize_bilinear(jnp.asarray(x), *dst))
        theirs = (
            F.interpolate(
                torch.from_numpy(x).permute(0, 3, 1, 2), size=dst,
                mode="bilinear", align_corners=False, antialias=False,
            )
            .permute(0, 2, 3, 1)
            .numpy()
        )
        np.testing.assert_allclose(ours, theirs, atol=2e-6)
