"""Instance-segmentation dataset builders (reference:
detectron2CustomDataset.py:13-237).

Produces the same per-image annotation dicts the reference registers with
detectron2 (file_name/image_id/height/width + per-instance bbox, RLE
segmentation, category_id), using the native C++ codec instead of
pycocotools/cv2. These feed Mask R-CNN fine-tuning and the GT tooling.
"""

from __future__ import annotations

import os
from typing import Callable

import numpy as np

from ..labels import (
    THING_CLASSES_8,
    THING_CLASSES_11,
    cityscapes_pm_decode,
    kitti_decode,
    kitti_decode8,
)
from ..native import mask_bbox, rle_encode


def instances_from_map(
    instance_img: np.ndarray, decoder: Callable[[int], int]
) -> list[dict]:
    """Per-instance annotations from one instance-id map
    (reference: create_dataset_dict inner loop, detectron2CustomDataset.py:36-69)."""
    objects = []
    for label in np.unique(instance_img):
        train_id = decoder(int(label))
        if train_id in (0, 255):
            continue
        roi = (instance_img == label).astype(np.uint8)
        bbox = mask_bbox(roi)
        if bbox is None:
            continue
        objects.append(
            {
                "bbox": bbox,
                "bbox_mode": "XYXY_ABS",
                "segmentation": rle_encode(roi),
                "category_id": train_id - 1,
            }
        )
    return objects


def create_dataset_dict(
    instance_files: list[str],
    image_files: list[str],
    decoder: Callable[[int], int] = kitti_decode,
) -> list[dict]:
    """(reference: detectron2CustomDataset.py:13-72)"""
    from PIL import Image

    dataset = []
    for instance_file, image_file in zip(instance_files, image_files):
        with Image.open(instance_file) as im:
            instance_img = np.asarray(im)
        h, w = instance_img.shape[:2]
        dataset.append(
            {
                "file_name": image_file,
                "image_id": os.path.basename(image_file),
                "height": h,
                "width": w,
                "annotations": instances_from_map(instance_img, decoder),
            }
        )
    return dataset


def kitti_seg_instance(
    dataset_dir: str, train: bool = True, decoder: Callable[[int], int] = kitti_decode
) -> list[dict]:
    """KITTI semantics → annotation dicts
    (reference: detectron2CustomDataset.py:79-119)."""
    sub = "training" if train else "validation"
    inst_dir = os.path.join(dataset_dir, sub, "instance")
    img_dir = os.path.join(dataset_dir, sub, "image_2")
    inst = sorted(
        os.path.join(inst_dir, f) for f in os.listdir(inst_dir)
        if os.path.isfile(os.path.join(inst_dir, f))
    )
    imgs = sorted(
        os.path.join(img_dir, f) for f in os.listdir(img_dir)
        if os.path.isfile(os.path.join(img_dir, f))
    )
    return create_dataset_dict(inst, imgs, decoder)


def cityscapes_pm_seg_instance(
    dataset_dir: str,
    train: bool = True,
    decoder: Callable[[int], int] = cityscapes_pm_decode,
) -> list[dict]:
    """Cityscapes gtFine instanceIds → annotation dicts (reference:
    detectron2CustomDataset.py:175-209). Walks the standard Cityscapes tree:
    ``gtFine/{split}/{city}/*_gtFine_instanceIds.png`` paired with
    ``leftImg8bit/{split}/{city}/*_leftImg8bit.png``, sorted."""
    import glob

    sub = "train" if train else "val"
    inst = sorted(
        glob.glob(
            os.path.join(dataset_dir, "gtFine", sub, "*", "*_gtFine_instanceIds.png")
        )
    )
    imgs = sorted(
        glob.glob(
            os.path.join(dataset_dir, "leftImg8bit", sub, "*", "*_leftImg8bit.png")
        )
    )
    return create_dataset_dict(inst, imgs, decoder)


DATASET_VARIANTS = {
    # name → (walker, decoder, thing classes) (reference: :131-169, :226-237).
    # Quirk preserved: the reference's create_cityscapes_pm_dataset registers
    # lambdas that call the KITTI walker with the cityscapes_pm decoder
    # (detectron2CustomDataset.py:228-229) — the cityscapes_pm_seg_instance
    # walker above exists but is never wired into the catalog. We register
    # the same (KITTI-walker) pairing under the reference's catalog name and
    # expose the unused walker separately.
    "kitti_seg_instance": (kitti_seg_instance, kitti_decode, THING_CLASSES_11),
    "kitti_seg_instance8": (kitti_seg_instance, kitti_decode8, THING_CLASSES_8),
    "cityscapes_pm_instance": (
        kitti_seg_instance,
        cityscapes_pm_decode,
        THING_CLASSES_11,
    ),
}
