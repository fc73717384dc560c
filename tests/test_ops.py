"""Tests for the fused ops — the fused upsample+conv must be EXACTLY equal
to the reference pattern upsample(×2 nearest) → reflect-pad → 3×3 conv."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdn_sfm_tpu.geometry import upsample_nearest_2x
from mdn_sfm_tpu.models.layers import ConvBlock
from mdn_sfm_tpu.ops import FusedUpConvBlock, upsample2x_conv3x3


def _reference(x, kernel, bias):
    """Unfused reference: upsample → reflect pad → VALID 3×3 conv."""
    up = upsample_nearest_2x(x)
    up = jnp.pad(up, ((0, 0), (1, 1), (1, 1), (0, 0)), "reflect")
    dn = jax.lax.conv_dimension_numbers(up.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(up, kernel, (1, 1), "VALID", dimension_numbers=dn)
    return y + bias


class TestFusedUpConv:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_exact_equality(self, seed):
        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.normal(size=(2, 6, 10, 5)).astype(np.float32))
        kernel = jnp.asarray(rng.normal(size=(3, 3, 5, 7)).astype(np.float32) * 0.1)
        bias = jnp.asarray(rng.normal(size=(7,)).astype(np.float32))
        got = upsample2x_conv3x3(x, kernel, bias)
        want = _reference(x, kernel, bias)
        assert got.shape == (2, 12, 20, 7)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5)

    def test_gradients_match(self):
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(1, 4, 4, 3)).astype(np.float32))
        kernel = jnp.asarray(rng.normal(size=(3, 3, 3, 2)).astype(np.float32) * 0.1)
        bias = jnp.zeros((2,))
        g1 = jax.grad(lambda k: jnp.sum(upsample2x_conv3x3(x, k, bias) ** 2))(kernel)
        g2 = jax.grad(lambda k: jnp.sum(_reference(x, k, bias) ** 2))(kernel)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4, rtol=1e-4)

    def test_module_param_tree_matches_convblock(self):
        """FusedUpConvBlock exposes the same …/conv/conv/{kernel,bias} path as
        ConvBlock, so checkpoints are interchangeable."""
        x = jnp.zeros((1, 4, 4, 3))
        fused = FusedUpConvBlock(8, dtype=jnp.float32)
        fvars = fused.init(jax.random.PRNGKey(0), x)
        unfused = ConvBlock(8, dtype=jnp.float32)
        uvars = unfused.init(jax.random.PRNGKey(0), upsample_nearest_2x(x))
        fpaths = jax.tree_util.tree_structure(fvars)
        upaths = jax.tree_util.tree_structure(uvars)
        assert fpaths == upaths

    def test_module_equals_reference_composition(self):
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.normal(size=(2, 4, 6, 3)).astype(np.float32))
        fused = FusedUpConvBlock(4, use_elu=True, dtype=jnp.float32)
        variables = fused.init(jax.random.PRNGKey(1), x)
        got = fused.apply(variables, x)

        unfused = ConvBlock(4, use_elu=True, dtype=jnp.float32)
        want = unfused.apply(variables, upsample_nearest_2x(x))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5)
