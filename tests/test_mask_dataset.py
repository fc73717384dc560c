"""Tests for the instance-seg dataset builders and label decoders
(reference: detectron2CustomDataset.py — C15 in PARITY.md)."""

import os

import numpy as np
import pytest
from PIL import Image

from mdn_sfm_tpu import native as N
from mdn_sfm_tpu.labels import (
    THING_CLASSES_8,
    THING_CLASSES_11,
    cityscapes_pm_decode,
    kitti_decode,
    kitti_decode8,
)
from mdn_sfm_tpu.masks.dataset import (
    DATASET_VARIANTS,
    cityscapes_pm_seg_instance,
    create_dataset_dict,
    instances_from_map,
    kitti_seg_instance,
)


class TestDecoders:
    def test_kitti_decode_semantic_times_256(self):
        # car (id 26, trainId 4): instance n of class c stored as c*256+n
        assert kitti_decode(26 * 256 + 0) == 4
        assert kitti_decode(26 * 256 + 7) == 4
        # stuff: road (id 7) → trainId 0; unknown id → 255
        assert kitti_decode(7 * 256) == 0
        assert kitti_decode(200 * 256) == 255

    def test_kitti_decode8_remap(self):
        # reference detectron2CustomDataset.py:148-157: drop trainIds
        # {0,1,7,8}, shift the rest to 1..8
        # person (trainId 2) → 1, car (4) → 3, bus (6) → 5
        assert kitti_decode8(24 * 256) == 1
        assert kitti_decode8(26 * 256) == 3
        assert kitti_decode8(28 * 256) == 5
        # train (trainId 9) → 6, bicycle (11) → 8
        assert kitti_decode8(31 * 256) == 6
        assert kitti_decode8(33 * 256) == 8
        # dropped: dynamic (1), caravan (7), trailer (8), stuff (0)
        for v in (5 * 256, 29 * 256, 30 * 256, 7 * 256):
            assert kitti_decode8(v) == 255

    def test_cityscapes_pm_decode(self):
        # instances: c*1000+n; car id 26 → trainId 4
        assert cityscapes_pm_decode(26000) == 4
        assert cityscapes_pm_decode(26012) == 4
        # pure-semantic pixels store the class id directly (< 1000)
        assert cityscapes_pm_decode(26) == 4
        assert cityscapes_pm_decode(7) == 0  # road → stuff
        # 0/255 pass through unchanged (reference :218-219)
        assert cityscapes_pm_decode(0) == 0
        assert cityscapes_pm_decode(255) == 255

    def test_variant_table(self):
        """The catalog pairs each reference name with its decoder/classes —
        and preserves the quirk that cityscapes_pm registers the KITTI
        walker (reference :228-229)."""
        assert set(DATASET_VARIANTS) == {
            "kitti_seg_instance",
            "kitti_seg_instance8",
            "cityscapes_pm_instance",
        }
        walker, dec, classes = DATASET_VARIANTS["kitti_seg_instance"]
        assert (walker, dec, classes) == (
            kitti_seg_instance, kitti_decode, THING_CLASSES_11)
        walker, dec, classes = DATASET_VARIANTS["kitti_seg_instance8"]
        assert (walker, dec, classes) == (
            kitti_seg_instance, kitti_decode8, THING_CLASSES_8)
        walker, dec, classes = DATASET_VARIANTS["cityscapes_pm_instance"]
        assert walker is kitti_seg_instance  # the quirk
        assert (dec, classes) == (cityscapes_pm_decode, THING_CLASSES_11)


def _kitti_instance_map():
    """24×32 map: two cars, one person, road background."""
    inst = np.full((24, 32), 7 * 256, np.int32)  # road (stuff → skipped)
    inst[2:8, 3:12] = 26 * 256 + 0    # car 0
    inst[10:20, 15:28] = 26 * 256 + 1  # car 1
    inst[4:9, 20:24] = 24 * 256 + 0   # person
    return inst


class TestInstancesFromMap:
    def test_kitti_annotations(self):
        inst = _kitti_instance_map()
        anns = instances_from_map(inst, kitti_decode)
        assert len(anns) == 3
        by_cat = sorted(anns, key=lambda a: (a["category_id"], a["bbox"]))
        # category_id = trainId − 1: person → 1, car → 3
        assert [a["category_id"] for a in by_cat] == [1, 3, 3]
        person, car0, car1 = by_cat
        assert person["bbox"] == [20, 4, 24, 9]
        assert car0["bbox"] == [3, 2, 12, 8]
        assert car1["bbox"] == [15, 10, 28, 20]
        for a, label in ((person, 24 * 256), (car0, 26 * 256), (car1, 26 * 256 + 1)):
            decoded = N.rle_decode(a["segmentation"])
            assert np.array_equal(decoded, (inst == label).astype(np.uint8))
            assert a["bbox_mode"] == "XYXY_ABS"

    def test_stuff_and_ignore_skipped(self):
        inst = np.full((8, 8), 7 * 256, np.int32)  # road only
        inst[0, 0] = 200 * 256  # unknown id → 255 → skipped
        assert instances_from_map(inst, kitti_decode) == []

    def test_cityscapes_convention(self):
        inst = np.zeros((10, 10), np.int32)
        inst[1:4, 1:4] = 26001   # car instance
        inst[6:9, 6:9] = 24      # semantic-only person blob (thing w/o inst id)
        anns = instances_from_map(inst, cityscapes_pm_decode)
        cats = sorted(a["category_id"] for a in anns)
        assert cats == [1, 3]  # person, car


def _write_png16(path, arr):
    Image.fromarray(arr.astype(np.uint16)).save(path)


def _write_rgb(path, h, w):
    Image.fromarray(np.zeros((h, w, 3), np.uint8)).save(path)


@pytest.fixture
def kitti_seg_tree(tmp_path):
    """data_semantics layout: {training,validation}/{instance,image_2}."""
    for sub, n in (("training", 2), ("validation", 1)):
        inst_dir = tmp_path / sub / "instance"
        img_dir = tmp_path / sub / "image_2"
        inst_dir.mkdir(parents=True)
        img_dir.mkdir(parents=True)
        for i in range(n):
            _write_png16(inst_dir / f"{i:06d}_10.png", _kitti_instance_map())
            _write_rgb(img_dir / f"{i:06d}_10.png", 24, 32)
    return tmp_path


@pytest.fixture
def cityscapes_tree(tmp_path):
    """Cityscapes layout: gtFine/{split}/{city}/*_gtFine_instanceIds.png +
    leftImg8bit/{split}/{city}/*_leftImg8bit.png."""
    inst = np.zeros((16, 20), np.int32)
    inst[2:6, 2:10] = 26000
    inst[8:12, 12:18] = 24001
    for split, cities in (("train", ["aachen", "bochum"]), ("val", ["frankfurt"])):
        for city in cities:
            gt = tmp_path / "gtFine" / split / city
            im = tmp_path / "leftImg8bit" / split / city
            gt.mkdir(parents=True)
            im.mkdir(parents=True)
            stem = f"{city}_000000_000019"
            _write_png16(gt / f"{stem}_gtFine_instanceIds.png", inst)
            _write_rgb(im / f"{stem}_leftImg8bit.png", 16, 20)
    return tmp_path


class TestWalkers:
    def test_kitti_walker(self, kitti_seg_tree):
        train = kitti_seg_instance(str(kitti_seg_tree), train=True)
        val = kitti_seg_instance(str(kitti_seg_tree), train=False)
        assert len(train) == 2 and len(val) == 1
        d = train[0]
        assert d["height"] == 24 and d["width"] == 32
        assert d["image_id"] == "000000_10.png"
        assert d["file_name"].endswith(os.path.join("image_2", "000000_10.png"))
        assert len(d["annotations"]) == 3

    def test_kitti_walker_8class(self, kitti_seg_tree):
        d = kitti_seg_instance(str(kitti_seg_tree), train=True,
                               decoder=kitti_decode8)[0]
        # person → 0, cars → 2 under the 8-class remap (category = trainId−1)
        assert sorted(a["category_id"] for a in d["annotations"]) == [0, 2, 2]

    def test_cityscapes_walker(self, cityscapes_tree):
        train = cityscapes_pm_seg_instance(str(cityscapes_tree), train=True)
        val = cityscapes_pm_seg_instance(str(cityscapes_tree), train=False)
        assert len(train) == 2 and len(val) == 1
        # sorted across cities; instance/image pairing is positional
        assert "aachen" in train[0]["file_name"]
        assert "bochum" in train[1]["file_name"]
        for d in train + val:
            assert d["file_name"].endswith("_leftImg8bit.png")
            assert d["height"] == 16 and d["width"] == 20
            assert sorted(a["category_id"] for a in d["annotations"]) == [1, 3]

    def test_create_dataset_dict_roundtrip(self, kitti_seg_tree):
        inst_dir = kitti_seg_tree / "training" / "instance"
        img_dir = kitti_seg_tree / "training" / "image_2"
        insts = sorted(str(p) for p in inst_dir.iterdir())
        imgs = sorted(str(p) for p in img_dir.iterdir())
        ds = create_dataset_dict(insts, imgs, kitti_decode)
        ref = _kitti_instance_map()
        for d in ds:
            union = np.zeros_like(ref, np.uint8)
            for a in d["annotations"]:
                union |= N.rle_decode(a["segmentation"])
            want = ((ref // 256 == 26) | (ref // 256 == 24)).astype(np.uint8)
            assert np.array_equal(union, want)
