"""Host-side instance-mask providers (reference: detectron2 integration,
trainer.py:278-279 + loss_utils.py:102-124).

A provider maps batch sample identifiers to a fixed-shape float union mask
(B, Hm, Wm) ∈ [0, 1] that rides with the batch into the jitted step — the
static-shape replacement for detectron2's ragged per-image instance lists.
"""

from __future__ import annotations

import os
from typing import Protocol, Sequence

import numpy as np


class MaskProvider(Protocol):
    def union_masks(self, keys: Sequence[str], height: int, width: int) -> np.ndarray:
        """Return (B, height, width) float32 union masks in [0, 1]."""
        ...


class NullMaskProvider:
    """All-zero masks: the BCE term degenerates to a push-to-zero regularizer
    and DS masking zeroes the epipolar term — use with w_d2_sim=0 for pure
    SN/T/TG training."""

    def union_masks(self, keys: Sequence[str], height: int, width: int) -> np.ndarray:
        return np.zeros((len(keys), height, width), np.float32)


class PrecomputedMaskProvider:
    """Loads per-sample union-mask PNGs: ``{mask_dir}/{key}.png`` with any
    nonzero pixel counting as instance (like get_batch_instance_mask's
    ``mask[m != 0] = 1``, loss_utils.py:122-123). Missing files yield zeros.
    """

    def __init__(self, mask_dir: str):
        self.mask_dir = mask_dir
        self._cache: dict[tuple[str, int, int], np.ndarray] = {}

    def _load(self, key: str, height: int, width: int) -> np.ndarray:
        ck = (key, height, width)
        if ck in self._cache:
            return self._cache[ck]
        path = os.path.join(self.mask_dir, f"{key}.png")
        if not os.path.exists(path):
            out = np.zeros((height, width), np.float32)
        else:
            from PIL import Image

            with Image.open(path) as im:
                m = (np.asarray(im.convert("L"), dtype=np.float32) != 0).astype(np.float32)
            if m.shape != (height, width):
                im = Image.fromarray((m * 255).astype(np.uint8))
                m = np.asarray(im.resize((width, height), Image.BILINEAR), np.float32) / 255.0
            out = m
        self._cache[ck] = out
        return out

    def union_masks(self, keys: Sequence[str], height: int, width: int) -> np.ndarray:
        return np.stack([self._load(k, height, width) for k in keys])


def build_mask_provider(cfg) -> MaskProvider | None:
    """Factory from config. Returns None for 'none' (no mask tensor in the
    batch; the loss then skips the BCE term unless mode=DC)."""
    if cfg.mask_provider == "none":
        return None
    if cfg.mask_provider == "precomputed":
        return PrecomputedMaskProvider(cfg.mask_dir)
    if cfg.mask_provider == "maskrcnn":
        from .maskrcnn import MaskRCNNProvider

        return MaskRCNNProvider(cfg)
    raise ValueError(f"unknown mask provider {cfg.mask_provider!r}")
