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
