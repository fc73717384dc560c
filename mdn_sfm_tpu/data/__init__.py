"""Input pipeline: host-side decode + fused on-device augmentation.

The reference runs its whole augmentation stack in 12 CPU DataLoader workers
(datasets/custom_transforms.py, options.py:175-178); here the host only
decodes and resizes images to base resolution — flip, zoom-crop, jitter,
normalization, pyramid generation and intrinsics updates are a single jitted
NHWC program fused into the train step (BASELINE north star: on-device
decode+augment path).
"""

from .augment import augment_batch, eval_preprocess, MEAN, STD
from .cache import DecodedCache
from .splits import read_split_lines, split_path
from .kitti import KittiRawDataset, parse_calib_intrinsics
from .loader import HostLoader, Subset
from .synthetic import synthetic_batch

__all__ = [
    "DecodedCache",
    "Subset",
    "augment_batch",
    "eval_preprocess",
    "MEAN",
    "STD",
    "read_split_lines",
    "split_path",
    "KittiRawDataset",
    "parse_calib_intrinsics",
    "HostLoader",
    "synthetic_batch",
]
