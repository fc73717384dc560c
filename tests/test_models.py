"""Shape/contract tests for the Flax models (SURVEY.md §7 step 2).

The critical contract: FlowNet's decoder feature list [16,32,64,128,256,512]ch
must match MobileDecoder's expectations
(reference: networks/flow_net_v1.py:70-85 ↔ mobile_decoder.py:23-24).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdn_sfm_tpu.models import FlowNet, MobileDecoder, PoseNet, ResNetEncoder

H, W = 64, 128  # small but /32-divisible for fast CPU tests


@pytest.fixture(scope="module")
def imgs():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(2, H, W, 3)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(2, H, W, 3)).astype(np.float32))
    return a, b


@pytest.fixture(scope="module")
def flow_apply(imgs):
    a, b = imgs
    net = FlowNet(dtype=jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), a, b)
    return net, variables


class TestResNetEncoder:
    def test_pyramid_shapes(self, imgs):
        a, b = imgs
        enc = ResNetEncoder(num_layers=18, num_input_images=2, dtype=jnp.float32)
        variables = enc.init(jax.random.PRNGKey(0), jnp.concatenate([a, b], -1))
        feats = enc.apply(variables, jnp.concatenate([a, b], -1))
        chs = [64, 64, 128, 256, 512]
        for lvl, (f, c) in enumerate(zip(feats, chs)):
            stride = 2 ** (lvl + 1)
            assert f.shape == (2, H // stride, W // stride, c), lvl

    @pytest.mark.parametrize("depth,chs", [(50, (64, 256, 512, 1024, 2048)),
                                           (101, (64, 256, 512, 1024, 2048))])
    def test_bottleneck_depths(self, depth, chs):
        """Reference supports 18/34/50/101/152 (resnet_encoder.py:70-77);
        101/152 are pure stage-count variants of the bottleneck trunk."""
        enc = ResNetEncoder(num_layers=depth, num_input_images=2, dtype=jnp.float32)
        assert enc.num_ch_enc == chs
        x = jnp.zeros((1, 32, 32, 6), jnp.float32)
        feats = jax.eval_shape(
            lambda v: enc.apply(v, x),
            enc.init(jax.random.PRNGKey(0), x),
        )
        for lvl, (f, c) in enumerate(zip(feats, chs)):
            stride = 2 ** (lvl + 1)
            assert f.shape == (1, 32 // stride, 32 // stride, c), lvl

    def test_has_batch_stats(self, imgs):
        a, b = imgs
        enc = ResNetEncoder(num_layers=18, dtype=jnp.float32)
        variables = enc.init(jax.random.PRNGKey(0), jnp.concatenate([a, b], -1))
        assert "batch_stats" in variables


class TestFlowNet:
    def test_output_contract(self, flow_apply, imgs):
        net, variables = flow_apply
        a, b = imgs
        flows, feats = net.apply(variables, a, b)
        # flow pyramid at scales 0..3
        for s in range(4):
            assert flows[s].shape == (2, H // 2**s, W // 2**s, 2)
        # decoder features [d0..d4, enc4] with 16..512 channels
        chs = [16, 32, 64, 128, 256, 512]
        strides = [1, 2, 4, 8, 16, 32]
        assert len(feats) == 6
        for f, c, st in zip(feats, chs, strides):
            assert f.shape == (2, H // st, W // st, c)

    def test_flow_scale_bound(self, flow_apply, imgs):
        """Flow is scaled by 0.1 (SCALE_FLOW) — normalized units stay small
        (flow_net_v1.py:8,67,82)."""
        net, variables = flow_apply
        a, b = imgs
        flows, _ = net.apply(variables, a, b)
        assert float(jnp.abs(flows[0]).max()) < 10.0  # sanity: not pixel-scale


class TestFlowNetRigidInputs:
    def test_n_ch_extras(self, imgs):
        """use_rigid path: n_ch extra channels concatenated into conv1
        (reference: flow_net_v1.py:103-107)."""
        a, b = imgs
        net = FlowNet(n_ch=6, dtype=jnp.float32)
        extras = [a, b]  # 6 extra channels
        variables = net.init(jax.random.PRNGKey(0), a, b, extras)
        flows, feats = net.apply(variables, a, b, extras)
        assert flows[0].shape == (2, H, W, 2)
        k = variables["params"]["encoder"]["conv1"]["kernel"]
        assert k.shape[2] == 12  # 6 (two frames) + 6 extra


class TestPoseNet:
    def test_output_shapes_and_scale(self, imgs):
        a, b = imgs
        net = PoseNet(dtype=jnp.float32)
        variables = net.init(jax.random.PRNGKey(0), a, b)
        aa, t = net.apply(variables, a, b)
        assert aa.shape == (2, 1, 1, 3)
        assert t.shape == (2, 1, 1, 3)
        # ×0.01 output scaling keeps the pose small at init (pose_net_v3.py:58-62)
        assert float(jnp.abs(aa).max()) < 1.0
        assert float(jnp.abs(t).max()) < 1.0


class TestMobileDecoder:
    def test_consumes_flow_features(self, flow_apply, imgs):
        net, variables = flow_apply
        a, b = imgs
        _, feats = net.apply(variables, a, b)

        dec = MobileDecoder(dtype=jnp.float32)
        aa = jnp.zeros((2, 1, 1, 3))
        t = jnp.zeros((2, 1, 1, 3))
        dvars = dec.init(jax.random.PRNGKey(1), feats, aa, t)
        out = dec.apply(dvars, feats, aa, t)
        for s in range(4):
            assert out[s].shape == (2, H // 2**s, W // 2**s, 1)
            v = np.asarray(out[s])
            assert (v > 0).all() and (v < 1).all()  # sigmoid output

    def test_pose_conditioning_changes_output(self, flow_apply, imgs):
        net, variables = flow_apply
        a, b = imgs
        _, feats = net.apply(variables, a, b)
        dec = MobileDecoder(dtype=jnp.float32)
        zero = jnp.zeros((2, 1, 1, 3))
        dvars = dec.init(jax.random.PRNGKey(1), feats, zero, zero)
        out0 = dec.apply(dvars, feats, zero, zero)
        out1 = dec.apply(dvars, feats, zero + 0.5, zero - 0.5)
        assert np.abs(np.asarray(out0[0]) - np.asarray(out1[0])).max() > 1e-6
