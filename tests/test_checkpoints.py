"""Checkpoint tests: reference folder layout, msgpack round-trip, and the
.pth ↔ flax mapping round-trip (SURVEY.md §5 checkpoint/resume)."""

import os
import tempfile

import jax
import numpy as np
import pytest

from mdn_sfm_tpu import checkpoints as C
from mdn_sfm_tpu import training as T
from mdn_sfm_tpu.config import Config


@pytest.fixture(scope="module")
def variables():
    cfg = Config(height=64, width=96, compute_dtype="float32").validate()
    models = T.build_models(cfg)
    return T.init_variables(cfg, models, jax.random.PRNGKey(0))


def _trees_equal(a, b, atol=0):
    fa, fb = C._flatten(a), C._flatten(b)
    assert set(fa) == set(fb)
    for k in fa:
        np.testing.assert_allclose(np.asarray(fa[k]), np.asarray(fb[k]), atol=atol, err_msg=str(k))


class TestNative:
    def test_roundtrip_and_layout(self, variables):
        with tempfile.TemporaryDirectory() as d:
            folder = C.weights_folder(d, "v0", 0)
            assert folder == os.path.join(d, "v0", "models", "weights_0")
            C.save_checkpoint(folder, variables, opt_state=None, step=7)
            for n in ("flownet", "posenet", "mobile_decoder"):
                assert os.path.exists(os.path.join(folder, f"{n}.msgpack"))
            loaded, _, step = C.load_checkpoint(folder, jax.tree.map(np.zeros_like, variables))
            assert step == 7
            _trees_equal(loaded, variables)

    def test_atomic_save_no_tmp_residue(self, variables):
        with tempfile.TemporaryDirectory() as d:
            folder = C.weights_folder(d, "v0", 0)
            C.save_checkpoint(folder, variables, opt_state=None, step=1)
            assert not [f for f in os.listdir(folder) if f.endswith(".tmp")]
            assert os.path.exists(os.path.join(folder, "meta.json"))

    def test_auto_resume_skips_half_saved_checkpoint(self, variables):
        """A preemption mid-save leaves a folder without the meta.json commit
        marker (written last); latest_weights_idx must fall back to the last
        complete checkpoint instead of loading truncated files."""
        with tempfile.TemporaryDirectory() as d:
            C.save_checkpoint(C.weights_folder(d, "v0", 4), variables, step=40)
            # simulate the interrupted save: model file (possibly truncated)
            # present, no commit marker
            half = C.weights_folder(d, "v0", 5)
            os.makedirs(half)
            with open(os.path.join(half, "mobile_decoder.msgpack"), "wb") as f:
                f.write(b"\x00trunc")
            assert C.latest_weights_idx(d, "v0") == 4
            # reference-layout .pth folders carry no marker and still count
            pth = C.weights_folder(d, "v0", 6)
            os.makedirs(pth)
            with open(os.path.join(pth, "mobile_decoder.pth"), "wb") as f:
                f.write(b"x")
            assert C.latest_weights_idx(d, "v0") == 6

    def test_partial_load_key_intersection(self, variables):
        """Leaves missing from the file keep their initialized values
        (reference: trainer.py:159-163)."""
        target = {"a": np.zeros(3), "b": {"c": np.zeros(2), "d": np.zeros(1)}}
        loaded = {"a": np.ones(3), "b": {"c": np.ones(5)}}  # c has wrong shape
        merged = C.merge_partial(target, loaded)
        np.testing.assert_array_equal(merged["a"], 1)
        np.testing.assert_array_equal(merged["b"]["c"], 0)  # shape mismatch kept
        np.testing.assert_array_equal(merged["b"]["d"], 0)  # missing kept


class TestPthInterop:
    def test_key_mapping_spotcheck(self):
        coll, path, is_conv = C.torch_key_to_flax("flownet", "encoder.encoder.conv1.weight")
        assert (coll, path, is_conv) == ("params", ("encoder", "conv1", "kernel"), True)
        coll, path, _ = C.torch_key_to_flax("flownet", "encoder.encoder.layer2.1.bn2.running_mean")
        assert coll == "batch_stats" and path == ("encoder", "layer2_1", "bn2", "mean")
        coll, path, _ = C.torch_key_to_flax("flownet", "encoder.encoder.layer2.0.downsample.0.weight")
        assert path == ("encoder", "layer2_0", "downsample_conv", "kernel")
        coll, path, _ = C.torch_key_to_flax("flownet", "decoder.flow_net.0.conv.conv.weight")
        assert path == ("decoder", "upconv_4_0", "conv", "conv", "kernel")
        coll, path, _ = C.torch_key_to_flax("flownet", "decoder.flow_net.13.conv.bias")
        assert path == ("decoder", "pred_flow_3", "conv", "bias")
        coll, path, _ = C.torch_key_to_flax("posenet", "decoder.pose_net.0.weight")
        assert path == ("decoder", "squeeze", "kernel")
        coll, path, _ = C.torch_key_to_flax("mobile_decoder", "mobile_net.9.conv.conv.bias")
        assert path == ("upconv_0_1", "conv", "conv", "bias")
        assert C.torch_key_to_flax("flownet", "encoder.encoder.fc.weight") is None
        assert C.torch_key_to_flax("flownet", "encoder.encoder.bn1.num_batches_tracked") is None

    @pytest.mark.parametrize("model", ["flownet", "posenet", "mobile_decoder"])
    def test_pth_roundtrip(self, variables, model):
        """export_pth → import_pth reproduces every leaf of our tree (the
        flow_scale scalar is non-trainable and excluded)."""
        torch = pytest.importorskip("torch")
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, f"{model}.pth")
            C.export_pth(path, model, variables[model])
            tree = C.import_pth(path, model)
            ours = C._flatten(jax.device_get(variables[model]))
            theirs = C._flatten(tree)
            missing = set(ours) - set(theirs)
            assert not missing, f"leaves lost in .pth roundtrip: {sorted(missing)[:5]}"
            for k in theirs:
                np.testing.assert_allclose(
                    np.asarray(theirs[k]), np.asarray(ours[k]), atol=1e-6, err_msg=str(k)
                )

    def test_load_checkpoint_reads_pth(self, variables):
        torch = pytest.importorskip("torch")
        with tempfile.TemporaryDirectory() as d:
            folder = C.weights_folder(d, "v0", 0)
            os.makedirs(folder)
            for n in ("flownet", "posenet", "mobile_decoder"):
                C.export_pth(os.path.join(folder, f"{n}.pth"), n, variables[n])
            zeroed = jax.tree.map(np.zeros_like, variables)
            loaded, _, _ = C.load_checkpoint(folder, zeroed)
            # conv kernels restored from the .pth files
            k = loaded["flownet"]["params"]["encoder"]["conv1"]["kernel"]
            expect = variables["flownet"]["params"]["encoder"]["conv1"]["kernel"]
            np.testing.assert_allclose(np.asarray(k), np.asarray(expect), atol=1e-6)


class TestExportedArtifact:
    def test_stablehlo_export_roundtrip(self):
        """tools/export_model.py: the serialized StableHLO artifact must be
        loadable without model code and reproduce the live forward."""
        import sys

        import jax
        import jax.numpy as jnp
        import numpy as np
        from jax import export as jexport

        from mdn_sfm_tpu import training as T
        from mdn_sfm_tpu.config import Config

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
        from export_model import build_forward, export_model

        cfg = Config(height=32, width=64, batch_size=1, compute_dtype="float32").validate()
        models = T.build_models(cfg)
        variables = T.init_variables(cfg, models, jax.random.PRNGKey(0))
        blob = export_model(cfg, variables, 1, ["cpu"])

        rng = np.random.default_rng(0)
        tgt = jnp.asarray(rng.normal(size=(1, 32, 64, 3)), jnp.float32)
        ref = jnp.asarray(rng.normal(size=(1, 32, 64, 3)), jnp.float32)
        live = build_forward(cfg, variables)(tgt, ref)
        loaded = jexport.deserialize(blob).call(tgt, ref)
        assert len(loaded) == 4
        for a, b in zip(loaded, live):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
