"""Tests for visualization/IO utilities (reference: utils.py)."""

import numpy as np
import pytest

from mdn_sfm_tpu import viz as V


class TestFlowColor:
    def test_shape_dtype(self):
        flow = np.random.default_rng(0).normal(size=(16, 24, 2)) * 5
        img = V.flow_to_image(flow)
        assert img.shape == (16, 24, 3)
        assert img.dtype == np.uint8

    def test_zero_flow_is_white_ish(self):
        """rad=0 → col = 1 - 0 = full intensity at the wheel colors blended;
        center of the wheel is white."""
        img = V.flow_to_image(np.zeros((4, 4, 2)))
        assert (img > 200).all()

    def test_unknown_flow_blacked_out(self):
        flow = np.zeros((4, 4, 2))
        flow[0, 0] = 1e8
        img = V.flow_to_image(flow)
        assert (img[0, 0] == 0).all()

    def test_direction_changes_hue(self):
        f1 = np.zeros((2, 2, 2))
        f1[..., 0] = 1.0
        f2 = np.zeros((2, 2, 2))
        f2[..., 0] = -1.0
        assert not np.array_equal(V.flow_to_image(f1), V.flow_to_image(f2))


class TestErrorImage:
    def test_lut_banding(self):
        gt = np.zeros((4, 4, 3))
        gt[..., 0] = 10.0
        flow = np.zeros((4, 4, 2))  # error = 10 → n_err = min(10/3, 20) = 3.33 band
        valid = np.ones((4, 4), bool)
        img = V.get_flow_error_image(gt, valid, valid, flow)
        np.testing.assert_array_equal(img[0, 0], [253, 174, 97])  # band [2, 4)

    def test_invalid_zeroed(self):
        gt = np.ones((2, 2, 3))
        flow = np.zeros((2, 2, 2))
        img = V.get_flow_error_image(gt, np.zeros((2, 2), bool), np.ones((2, 2), bool), flow)
        assert (img == 0).all()


class TestMisc:
    def test_normalize_image(self):
        x = np.array([2.0, 4.0, 6.0])
        np.testing.assert_allclose(V.normalize_image(x), [0, 0.5, 1.0])

    def test_normalize_constant(self):
        x = np.full((3,), 5.0)
        assert np.isfinite(V.normalize_image(x)).all()

    def test_sec_to_hm_str(self):
        assert V.sec_to_hm_str(10239) == "02h50m39s"

    def test_color_wheel_size(self):
        assert V.make_color_wheel().shape == (55, 3)

    def test_draw_boxes(self):
        img = np.zeros((20, 30, 3), np.uint8)
        out = V.draw_boxes_rgb(img, [[5, 5, 15, 15]], colors=[(0, 255, 0)])
        assert (out[5, 5:16] == (0, 255, 0)).all()
        assert (img == 0).all()  # input untouched


class TestFlowPng:
    def test_roundtrip(self, tmp_path):
        """Write a KITTI-format 16-bit flow PNG and read it back."""
        rng = np.random.default_rng(0)
        u = rng.uniform(-20, 20, (8, 10))
        v = rng.uniform(-20, 20, (8, 10))
        valid = (rng.random((8, 10)) > 0.5).astype(np.uint16)
        I = np.stack(
            [
                (u * 64 + 2**15).astype(np.uint16),
                (v * 64 + 2**15).astype(np.uint16),
                valid,
            ],
            axis=-1,
        )
        p = tmp_path / "flow.png"
        # PIL can't write 16-bit RGB PNGs; emit the PNG bytes directly
        import struct
        import zlib

        def write_png16(path, arr):
            h, w, _ = arr.shape
            raw = b"".join(
                b"\x00" + arr[y].astype(">u2").tobytes() for y in range(h)
            )
            def chunk(tag, data):
                c = tag + data
                return struct.pack(">I", len(data)) + c + struct.pack(">I", zlib.crc32(c))
            ihdr = struct.pack(">IIBBBBB", w, h, 16, 2, 0, 0, 0)
            with open(path, "wb") as f:
                f.write(b"\x89PNG\r\n\x1a\n")
                f.write(chunk(b"IHDR", ihdr))
                f.write(chunk(b"IDAT", zlib.compress(raw)))
                f.write(chunk(b"IEND", b""))

        write_png16(str(p), I)
        u2, v2, valid2 = V.flow_read_png(str(p))
        np.testing.assert_allclose(u2, np.round(u * 64) / 64, atol=1 / 64)
        np.testing.assert_allclose(v2, np.round(v * 64) / 64, atol=1 / 64)
        np.testing.assert_array_equal(valid2, valid)
