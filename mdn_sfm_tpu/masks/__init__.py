"""Instance-mask providers for the DS/DC modes.

The reference runs a frozen detectron2 Mask R-CNN on every batch
(trainer.py:165-179,278-279) and unions the per-instance masks into a binary
mask (loss_utils.py:102-124). On TPU the providers are:

- :class:`NullMaskProvider` — all-zero masks (pure self-supervised SN/T/TG).
- :class:`PrecomputedMaskProvider` — per-sample union-mask PNGs from disk
  (the staged strategy in SURVEY.md §7 step 4; files produced by
  ``tools/generate_mobile_gt.py`` or the reference's detectron2 dump).
- Mask R-CNN inference port (``mdn_sfm_tpu.masks.maskrcnn``) — replaces the
  frozen detectron2 model with a JAX implementation (static max-instance
  padding).
"""

from .providers import MaskProvider, NullMaskProvider, PrecomputedMaskProvider, build_mask_provider

__all__ = [
    "MaskProvider",
    "NullMaskProvider",
    "PrecomputedMaskProvider",
    "build_mask_provider",
]
