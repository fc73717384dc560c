"""Tests for the native C++ mask components (RLE codec, bbox, union) —
replacements for pycocotools/cv2 (SURVEY.md §2 native inventory)."""

import numpy as np
import pytest

from mdn_sfm_tpu import native as N


class TestRLE:
    @pytest.mark.parametrize("seed", range(5))
    def test_roundtrip_random(self, seed):
        rng = np.random.default_rng(seed)
        h, w = rng.integers(1, 100, 2)
        mask = (rng.random((h, w)) > 0.6).astype(np.uint8)
        assert np.array_equal(N.rle_decode(N.rle_encode(mask)), mask)

    def test_empty_and_full(self):
        for mask in (np.zeros((7, 9), np.uint8), np.ones((7, 9), np.uint8)):
            assert np.array_equal(N.rle_decode(N.rle_encode(mask)), mask)

    def test_counts_are_coco_varint(self):
        """counts bytes use the COCO 6-bit alphabet (offset 48)."""
        mask = np.zeros((10, 10), np.uint8)
        mask[2:5, 3:7] = 1
        rle = N.rle_encode(mask)
        assert rle["size"] == [10, 10]
        assert all(48 <= b < 48 + 64 for b in rle["counts"])

    def test_known_small_encoding(self):
        """Column-major runs: a single pixel at (y=1, x=0) in a 3×2 mask →
        runs [1, 1, 4]."""
        mask = np.zeros((3, 2), np.uint8)
        mask[1, 0] = 1
        dec = N.rle_decode({"size": [3, 2], "counts": N.rle_encode(mask)["counts"]})
        assert np.array_equal(dec, mask)


class TestBBox:
    def test_matches_nonzero_extent(self):
        rng = np.random.default_rng(3)
        mask = (rng.random((40, 60)) > 0.95).astype(np.uint8)
        ys, xs = np.nonzero(mask)
        assert N.mask_bbox(mask) == [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]

    def test_empty_mask(self):
        assert N.mask_bbox(np.zeros((5, 5), np.uint8)) is None

    def test_single_pixel(self):
        mask = np.zeros((5, 8), np.uint8)
        mask[2, 6] = 1
        assert N.mask_bbox(mask) == [6, 2, 7, 3]


class TestUnion:
    def test_union(self):
        rng = np.random.default_rng(1)
        masks = (rng.random((4, 16, 16)) > 0.8).astype(np.uint8)
        assert np.array_equal(N.mask_union(masks), masks.any(0).astype(np.uint8))


needs_imgio = pytest.mark.skipif(
    not N.imgio_available(), reason="libjpeg/libpng unavailable on this host"
)


@needs_imgio
class TestImgIO:
    """Native fused decode+resize (imgio.cpp) vs the PIL/cv2 reference path
    (reference host pipeline: mono_dataset.py:14-19, :103)."""

    def _png(self, tmp_path, arr, name="a.png"):
        from PIL import Image

        p = str(tmp_path / name)
        Image.fromarray(arr).save(p)
        return p

    def test_png_decode_bit_exact(self, tmp_path):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, (37, 53, 3), np.uint8)
        out, (sw, sh) = N.decode_resize(self._png(tmp_path, img), 37, 53)
        assert (sw, sh) == (53, 37)
        assert np.array_equal(out, img)

    def test_png_gray_and_palette_normalize_to_rgb(self, tmp_path):
        from PIL import Image

        rng = np.random.default_rng(1)
        gray = rng.integers(0, 256, (20, 30), np.uint8)
        p = str(tmp_path / "g.png")
        Image.fromarray(gray, mode="L").save(p)
        out, _ = N.decode_resize(p, 20, 30)
        assert np.array_equal(out, np.repeat(gray[..., None], 3, -1))

        pal = Image.fromarray(rng.integers(0, 256, (20, 30, 3), np.uint8)).convert(
            "P", palette=Image.ADAPTIVE
        )
        p2 = str(tmp_path / "p.png")
        pal.save(p2)
        out2, _ = N.decode_resize(p2, 20, 30)
        assert np.array_equal(out2, np.asarray(pal.convert("RGB")))

    def test_jpeg_decode_matches_pil(self, tmp_path):
        from PIL import Image

        rng = np.random.default_rng(2)
        img = rng.integers(0, 256, (40, 64, 3), np.uint8)
        p = str(tmp_path / "a.jpg")
        Image.fromarray(img).save(p, quality=92)
        out, _ = N.decode_resize(p, 40, 64)
        ref = np.asarray(Image.open(p).convert("RGB"))
        # both decode through libjpeg with the default IDCT — bit-exact
        assert np.array_equal(out, ref)

    def test_resize_matches_cv2_within_1lsb(self):
        import cv2

        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (375, 1242, 3), np.uint8)
        for (h, w) in [(128, 416), (192, 640), (375, 1242), (500, 1500)]:
            ours = N.resize_bilinear_u8(img, h, w)
            ref = cv2.resize(img, (w, h))
            assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1, (h, w)

    def test_batch_matches_single_and_reports_errors(self, tmp_path):
        rng = np.random.default_rng(4)
        imgs = [rng.integers(0, 256, (24, 31, 3), np.uint8) for _ in range(3)]
        paths = [self._png(tmp_path, im, f"{i}.png") for i, im in enumerate(imgs)]
        arr, dims = N.decode_resize_batch(paths, 16, 20, n_threads=2)
        assert arr.shape == (3, 16, 20, 3)
        assert dims.tolist() == [[31, 24]] * 3
        for i, p in enumerate(paths):
            single, _ = N.decode_resize(p, 16, 20)
            assert np.array_equal(arr[i], single)
        with pytest.raises(FileNotFoundError):
            N.decode_resize_batch([paths[0], str(tmp_path / "missing.png")], 8, 8)
        with pytest.raises(ValueError):
            bad = tmp_path / "bad.png"
            bad.write_bytes(b"not an image at all")
            N.decode_resize(str(bad), 8, 8)

    def test_kitti_reader_native_path_matches_pil_path(self, tmp_path):
        from fixtures import make_raw_drive
        from mdn_sfm_tpu.data.kitti import KittiRawDataset
        from mdn_sfm_tpu.data.splits import SplitLine

        root = str(tmp_path)
        lines = [SplitLine.parse(s) for s in make_raw_drive(root, h=48, w=96)]
        # identity size → decode must be bit-exact between the two paths
        ds_n = KittiRawDataset(root, lines, 48, 96, use_native=True)
        ds_p = KittiRawDataset(root, lines, 48, 96, use_native=False)
        fn, kn = ds_n[0]
        fp, kp = ds_p[0]
        assert np.array_equal(fn, fp)
        assert np.allclose(kn, kp)
        # downscale → within cv2's fixed-point rounding of the native f32 path
        ds_n2 = KittiRawDataset(root, lines, 32, 64, use_native=True)
        ds_p2 = KittiRawDataset(root, lines, 32, 64, use_native=False)
        f2n, k2n = ds_n2[1]
        f2p, k2p = ds_p2[1]
        assert np.abs(f2n.astype(int) - f2p.astype(int)).max() <= 1
        assert np.allclose(k2n, k2p)
