"""Tests for the data pipeline: on-device augmentation semantics, split
parsing, synthetic data, host loader."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdn_sfm_tpu.config import Config
from mdn_sfm_tpu.data import augment as A
from mdn_sfm_tpu.data.loader import HostLoader
from mdn_sfm_tpu.data.splits import SplitLine, read_split_lines, shard_for_host
from mdn_sfm_tpu.data.synthetic import SyntheticDataset, synthetic_batch
from mdn_sfm_tpu.geometry import invert_intrinsics


def cfg(**kw):
    base = dict(height=64, width=96, batch_size=2)
    base.update(kw)
    return Config(**base).validate()


def _batch(c, seed=0):
    colors, K = synthetic_batch(c.batch_size, c.height, c.width, seed=seed)
    return jnp.asarray(colors), jnp.asarray(K)


class TestAugment:
    def test_eval_path_deterministic_and_normalized(self):
        c = cfg()
        colors, K = _batch(c)
        out, inv_Ks, raw = A.augment_batch(c, colors, K, jax.random.PRNGKey(0), train=False)
        # normalization: (x/255 - .45)/.225
        raw = np.asarray(colors[:, 0]).astype(np.float32) / 255.0
        expected = (raw - 0.45) / 0.225
        np.testing.assert_allclose(np.asarray(out[(0, 0)]), expected, atol=1e-5)

    def test_pyramid_shapes_and_intrinsics(self):
        c = cfg()
        colors, K = _batch(c)
        out, inv_Ks, raw = A.augment_batch(c, colors, K, jax.random.PRNGKey(0), train=False)
        for s in range(4):
            hs, ws = c.height // 2**s, c.width // 2**s
            for i in c.frame_ids:
                assert out[(i, s)].shape == (c.batch_size, hs, ws, 3)
            # inv_K corresponds to K/2^s
            Ks = np.asarray(K).copy()
            Ks[:, 0] /= 2**s
            Ks[:, 1] /= 2**s
            np.testing.assert_allclose(
                np.asarray(inv_Ks[s]),
                np.asarray(invert_intrinsics(jnp.asarray(Ks))),
                atol=1e-5,
            )

    def test_train_path_shapes(self):
        c = cfg()
        colors, K = _batch(c)
        out, inv_Ks, raw = A.augment_batch(c, colors, K, jax.random.PRNGKey(0), train=True)
        assert out[(0, 0)].shape == (c.batch_size, c.height, c.width, 3)
        assert raw.shape == (c.batch_size, c.height, c.width, 3)
        assert np.isfinite(np.asarray(out[(0, 0)])).all()

    def test_flip_updates_cx(self):
        """Run many seeds; whenever the image is flipped, cx must become
        W − cx (custom_transforms.py:39-40)."""
        c = cfg()
        colors, K = _batch(c)
        # make flips detectable: asymmetric image
        colors = np.array(colors)  # writable copy
        colors[:, :, :, : c.width // 2] = 0
        colors = jnp.asarray(colors)

        out, inv_Ks, raw = A.augment_batch(c, colors, K, jax.random.PRNGKey(7), train=True)
        # reconstruct K from inv_K at scale 0
        invK = np.asarray(inv_Ks[0])
        K_rec = np.linalg.inv(invK)
        cx0 = float(np.asarray(K)[0, 0, 2])
        for b in range(c.batch_size):
            cx = K_rec[b, 0, 2]
            fx = K_rec[b, 0, 0]
            sx = fx / float(np.asarray(K)[0, 0, 0])  # zoom factor
            # cx is either ~sx·cx0−ox or ~sx·(W−cx0)−ox with ox∈[0, (sx−1)·W]
            w = c.width
            lo_f, hi_f = sx * (w - cx0) - (sx - 1) * w - 1e-3, sx * (w - cx0) + 1e-3
            lo_n, hi_n = sx * cx0 - (sx - 1) * w - 1e-3, sx * cx0 + 1e-3
            assert (lo_f <= cx <= hi_f) or (lo_n <= cx <= hi_n)

    def test_zoom_crop_consistency(self):
        """A constant image stays constant through zoom-crop; K scales move
        fx/fy up by the zoom (custom_transforms.py:66-69)."""
        c = cfg()
        colors = jnp.full((2, 3, c.height, c.width, 3), 128, jnp.uint8)
        _, K = _batch(c)
        out, inv_Ks, raw = A.augment_batch(c, colors, K, jax.random.PRNGKey(3), train=True)
        v = np.asarray(out[(0, 0)])
        np.testing.assert_allclose(v, v.flat[0], atol=1e-4)
        K_rec = np.linalg.inv(np.asarray(inv_Ks[0]))
        fx0 = float(np.asarray(K)[0, 0, 0])
        assert (K_rec[:, 0, 0] >= fx0 - 1e-3).all()
        assert (K_rec[:, 0, 0] <= fx0 * 1.15 + 1e-3).all()

    def test_jitter_disabled_by_default(self):
        """ColorJitter is a no-op as shipped (custom_transforms.py:83-94):
        default path must not jitter colors."""
        c = cfg()
        colors = jnp.full((1, 3, c.height, c.width, 3), 100, jnp.uint8)
        _, K = _batch(cfg(batch_size=1))
        out, _, _ = A.augment_batch(c, colors, K, jax.random.PRNGKey(0), train=True)
        v = np.asarray(out[(0, 0)])
        expected = (100 / 255.0 - 0.45) / 0.225
        np.testing.assert_allclose(v, expected, atol=1e-4)


class TestSplits:
    def test_parse(self):
        line = SplitLine.parse("2011_09_26/2011_09_26_drive_0101_sync 667 r")
        assert line.folder.endswith("0101_sync")
        assert line.frame_index == 667
        assert line.side == "r"

    def test_sample_key_canonicalizes_side_aliases(self):
        """'2'/'3' camera-id side tokens (data/kitti.py::SIDE_MAP aliases)
        must key identically to 'l'/'r' — otherwise a mixed-alias manifest
        silently misses precomputed masks for half its lines."""
        from mdn_sfm_tpu.data.splits import sample_key

        assert sample_key(SplitLine.parse("d/x 3 l")) == \
            sample_key(SplitLine.parse("d/x 3 2"))
        assert sample_key(SplitLine.parse("d/x 3 r")) == \
            sample_key(SplitLine.parse("d/x 3 3"))
        assert sample_key(SplitLine.parse("d/x 3 l")) != \
            sample_key(SplitLine.parse("d/x 3 r"))
        assert sample_key(SplitLine.parse("a/b 7 l")) == "a_b_7_l"

    def test_read_and_shard(self):
        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "train_files.txt")
            with open(p, "w") as f:
                for i in range(10):
                    f.write(f"drive/x {i} l\n")
            lines = read_split_lines(p)
            assert len(lines) == 10
            s0 = shard_for_host(lines, 0, 4)
            s1 = shard_for_host(lines, 1, 4)
            # every host truncated to the common 10//4 = 2 so all hosts
            # compute identical steps_per_epoch (an extra line on one host
            # would dispatch an extra collective step and deadlock the rest)
            assert len(s0) == 2 and len(s1) == 2
            assert {l.frame_index for l in s0} == {0, 4}
            assert {l.frame_index for l in s1} == {1, 5}

    def test_real_eigen_zhou_manifest(self):
        """The vendored eigen_zhou manifests parse cleanly (39,810 train /
        4,424 val lines — SURVEY.md §1 L1)."""
        from mdn_sfm_tpu.data.splits import split_path

        root = os.path.join(os.path.dirname(__file__), "..")
        train = read_split_lines(split_path(root, "eigen_zhou", "train"))
        val = read_split_lines(split_path(root, "eigen_zhou", "val"))
        assert len(train) == 39810
        assert len(val) == 4424
        assert train[0].side in ("l", "r")


class TestLoader:
    def test_batches_and_shapes(self):
        ds = SyntheticDataset(10, 64, 96)
        loader = HostLoader(ds, batch_size=4, num_workers=2, seed=1)
        batches = list(iter(loader))
        assert len(batches) == 2  # drop_last
        (colors, K), idxs = batches[0]
        assert len(idxs) == 4
        assert colors.shape == (4, 3, 64, 96, 3)
        assert K.shape == (4, 4, 4)

    def test_shuffle_changes_across_epochs(self):
        ds = SyntheticDataset(8, 64, 96)
        loader = HostLoader(ds, batch_size=8, num_workers=1, seed=1)
        b1 = next(iter(loader))[0][0]
        b2 = next(iter(loader))[0][0]
        assert not np.array_equal(b1, b2)

    def test_deterministic_given_seed(self):
        ds = SyntheticDataset(8, 64, 96)
        l1 = HostLoader(ds, batch_size=4, num_workers=2, seed=5)
        l2 = HostLoader(ds, batch_size=4, num_workers=2, seed=5)
        np.testing.assert_array_equal(next(iter(l1))[0][0], next(iter(l2))[0][0])


class TestDecodedCache:
    """data/cache.py: decoded-sample disk cache (PARITY: e2e throughput —
    sound because augmentation is on-device, so host output per item is a
    pure function of (bytes, H, W))."""

    def _kitti(self, root, h=48, w=96):
        from fixtures import make_raw_drive
        from mdn_sfm_tpu.data.kitti import KittiRawDataset

        lines = [SplitLine.parse(s) for s in make_raw_drive(root, h=h, w=w, n_frames=6)]
        return KittiRawDataset(root, lines, h, w)

    def test_roundtrip_bitexact_and_persistent(self):
        from mdn_sfm_tpu.data.cache import DecodedCache

        with tempfile.TemporaryDirectory() as root, \
                tempfile.TemporaryDirectory() as cdir:
            base = self._kitti(root)
            ref = [base[i] for i in range(len(base))]

            cache = DecodedCache(base, cdir)
            assert len(cache) == len(base)
            for i in range(len(cache)):   # fill pass
                got = cache[i]
                for a, b in zip(got, ref[i]):
                    np.testing.assert_array_equal(a, b)
            assert cache.hit_fraction == 1.0

            # a FRESH instance must serve every item from disk: poison the
            # base reader so any decode attempt fails loudly
            base2 = self._kitti(root)
            base2.__dict__["data_path"] = "/nonexistent"
            reopened = DecodedCache(self._kitti(root), cdir)  # probe item ok
            reopened.dataset = base2
            for i in range(len(reopened)):
                got = reopened[i]
                for a, b in zip(got, ref[i]):
                    np.testing.assert_array_equal(a, b)

    def test_fingerprint_separates_configs(self):
        from mdn_sfm_tpu.data.cache import DecodedCache

        with tempfile.TemporaryDirectory() as root, \
                tempfile.TemporaryDirectory() as cdir:
            c1 = DecodedCache(self._kitti(root, h=48, w=96), cdir)
            c2 = DecodedCache(self._kitti(root, h=32, w=64), cdir)
            assert c1.path != c2.path  # different resolution, different cache

    def test_under_hostloader_threads(self):
        from mdn_sfm_tpu.data.cache import DecodedCache

        with tempfile.TemporaryDirectory() as root, \
                tempfile.TemporaryDirectory() as cdir:
            base = self._kitti(root)
            cache = DecodedCache(base, cdir)
            plain = list(HostLoader(base, 2, num_workers=4, seed=3))
            cached_cold = list(HostLoader(cache, 2, num_workers=4, seed=3))
            cached_warm = list(HostLoader(cache, 2, num_workers=4, seed=3))
            # HostLoader(seed) restarts its epoch counter, so orders match
            for (a, _), (b, _), (c, _) in zip(plain, cached_cold, cached_warm):
                for x, y, z in zip(a, b, c):
                    np.testing.assert_array_equal(x, y)
                    np.testing.assert_array_equal(x, z)

    def test_requires_identity(self):
        from mdn_sfm_tpu.data.cache import DecodedCache

        with tempfile.TemporaryDirectory() as cdir:
            with pytest.raises(ValueError, match="identity"):
                DecodedCache(SyntheticDataset(4, 32, 48), cdir)
