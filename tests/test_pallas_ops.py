"""Pallas kernel tests (interpret mode on CPU; the compiled path is exercised
on real TPU by bench/train)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdn_sfm_tpu.geometry import epipolar_residual, rot_from_axisangle
from mdn_sfm_tpu.ops.pallas_epipolar import epipolar_abs_residual_pallas


class TestEpipolarKernel:
    @pytest.mark.parametrize("shape", [(2, 16, 128), (1, 24, 80)])
    def test_matches_jnp_path(self, shape):
        b, h, w = shape
        rng = np.random.default_rng(0)
        flow = jnp.asarray(rng.normal(size=(b, h, w, 2)).astype(np.float32) * 2)
        K = np.array([[0.6 * w, 0, w / 2], [0, 1.9 * h, h / 2], [0, 0, 1]], np.float32)
        inv_K = jnp.broadcast_to(jnp.asarray(np.linalg.inv(K)), (b, 3, 3))
        aa = jnp.asarray(rng.normal(size=(b, 3)).astype(np.float32) * 0.05)
        R = rot_from_axisangle(aa)
        t = jnp.asarray(rng.normal(size=(b, 3)).astype(np.float32) * 0.1)

        got = epipolar_abs_residual_pallas(flow, inv_K, R, t, interpret=True)
        want = jnp.abs(epipolar_residual(flow, inv_K, R, t))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)

    def test_tile_coordinates_continuous(self):
        """Row coordinates must be global (tile offset applied): a residual
        that depends linearly on y has no tile-boundary discontinuities."""
        b, h, w = 1, 32, 128
        flow = jnp.zeros((b, h, w, 2))
        inv_K = jnp.broadcast_to(jnp.eye(3), (b, 3, 3))
        R = jnp.broadcast_to(jnp.eye(3), (b, 3, 3))
        t = jnp.asarray([[1.0, 0.5, 0.25]])
        got = np.asarray(epipolar_abs_residual_pallas(flow, inv_K, R, t, interpret=True))
        want = np.asarray(jnp.abs(epipolar_residual(flow, inv_K, R, t)))
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
