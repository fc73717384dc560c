"""Synthetic KITTI-shaped data for tests and benchmarks (SURVEY.md §4:
synthetic-data integration tests with known rigid motion).

Generates image triplets + intrinsics without touching disk, so the full
train step can be exercised and benchmarked on any machine.
"""

from __future__ import annotations

import numpy as np


def synthetic_intrinsics(height: int, width: int) -> np.ndarray:
    """KITTI-like intrinsics already rescaled to (width, height) — the
    normalized form fx≈0.58·W, fy≈1.92·H (reference comment
    datasets/kitti_dataset.py:30-38)."""
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = 0.58 * width
    K[1, 1] = 1.92 * height
    K[0, 2] = 0.5 * width
    K[1, 2] = 0.5 * height
    return K


def synthetic_batch(
    batch_size: int,
    height: int,
    width: int,
    num_frames: int = 3,
    seed: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """Random smooth image triplets + intrinsics.

    Returns:
        colors_u8 (B, F, H, W, 3) uint8, K (B, 4, 4) float32.
    Frames are shifted copies of a random low-frequency pattern so optical
    flow between them is non-degenerate.
    """
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 255, size=(batch_size, height // 8, width // 8, 3))
    # upsample to full res with numpy repeat (cheap, smooth enough)
    base = base.repeat(8, axis=1).repeat(8, axis=2)

    frames = []
    for f in range(num_frames):
        shift = 2 * f
        frames.append(np.roll(base, shift, axis=2))
    colors = np.stack(frames, axis=1).astype(np.uint8)  # (B, F, H, W, 3)

    K = np.broadcast_to(synthetic_intrinsics(height, width), (batch_size, 4, 4)).copy()
    return colors, K


def _smooth_texture(
    rng: np.random.Generator, height: int, width: int,
    lo: float = 0.0, hi: float = 255.0,
) -> np.ndarray:
    """Low-frequency RGB texture in [lo, hi] with non-zero gradients
    everywhere (bilinear upsample of coarse noise — piecewise-constant
    textures give the photometric loss no gradient inside each block)."""
    import cv2

    low = rng.uniform(lo, hi, size=(max(height // 8, 2), max(width // 8, 2), 3))
    return cv2.resize(low.astype(np.float32), (width, height), interpolation=cv2.INTER_LINEAR)


def moving_object_batch(
    batch_size: int,
    height: int,
    width: int,
    num_frames: int = 3,
    seed: int = 0,
    bg_shift: int = 2,
    obj_shift: int = 3,
    obj_size: int | None = None,
    bright_object: bool = False,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, list[int]]:
    """Synthetic world with a KNOWN moving object, for end-to-end validation
    of the two-stage protocol (photometric flow training → epipolar mobile
    supervision; reference workflow: frozen flow/pose from log/v0,
    trainer.py:146-156, then mobile training).

    Geometry: the background is a fronto-parallel textured plane observed by
    a camera translating along x — uniform horizontal flow ``t·bg_shift`` px
    per frame offset t, exactly consistent with cam_T_cam = (R=I,
    translation=(c, 0, 0)) for any c (epipolar lines are horizontal). A
    square textured patch moves VERTICALLY by ``t·obj_shift`` px — it
    violates that epipolar constraint, so a correctly-trained mobile decoder
    must light up exactly on the patch.

    Frames are ordered like ``cfg.frame_ids`` = (0, -1, 1): target first.

    Returns:
        colors_u8: (B, F, H, W, 3) uint8
        K:         (B, 4, 4) float32
        gt_mask:   (B, H, W) float32 — moving-object mask in the target frame
        gt_flows:  (B, F, H, W, 2) float32 — PIXEL flow target→frame f
                   (background rows: (t·bg_shift, 0); patch rows:
                   (0, t·obj_shift); frame 0 is all-zero)
        times:     frame offsets per frame index (0, -1, 1)
    """
    if obj_size is None:
        obj_size = height // 3
    times = [0, -1, 1][:num_frames]
    margin = abs(obj_shift) * (max(abs(t) for t in times)) + 2

    rng = np.random.default_rng(seed)
    colors = np.zeros((batch_size, num_frames, height, width, 3), np.uint8)
    gt_mask = np.zeros((batch_size, height, width), np.float32)
    gt_flows = np.zeros((batch_size, num_frames, height, width, 2), np.float32)

    for b in range(batch_size):
        # bright_object: dark background + bright patch — makes the moving
        # object detectable by the crafted brightness Mask R-CNN
        # (tests/fixtures.py::craft_brightness_detector) so the DS/DC
        # provider paths can be rehearsed end-to-end on this world.
        # Background spans 10-110 (not 10-60): photometric flow training
        # needs texture contrast, and a 50-level band starves its gradients
        # — measured round 5: lo/hi 10/60 diverged phase-1 flow (photo loss
        # → exact 0.0 = every warp sample out of bounds). 110 stays safely
        # below every crafted-detector threshold (objectness fires at raw
        # brightness ≳185, mask head ≳185, box scores ≳155).
        if bright_object:
            base = _smooth_texture(rng, height, width, lo=10, hi=110)
            patch = _smooth_texture(rng, obj_size, obj_size, lo=200, hi=255)
        else:
            base = _smooth_texture(rng, height, width)
            patch = _smooth_texture(rng, obj_size, obj_size)
        # keep the patch clear of image borders at every frame offset
        y0 = int(rng.integers(margin, height - obj_size - margin))
        x0 = int(
            rng.integers(
                abs(bg_shift) + 2, width - obj_size - abs(bg_shift) - 2
            )
        )
        gt_mask[b, y0 : y0 + obj_size, x0 : x0 + obj_size] = 1.0

        for f, t in enumerate(times):
            frame = np.roll(base, t * bg_shift, axis=1)  # camera translation
            oy = y0 + t * obj_shift
            frame[oy : oy + obj_size, x0 : x0 + obj_size] = patch
            colors[b, f] = np.clip(frame, 0, 255).astype(np.uint8)

            gt_flows[b, f, :, :, 0] = t * bg_shift
            gt_flows[b, f, :, :, 1] = 0.0
            on = gt_mask[b] > 0
            gt_flows[b, f, :, :, 0][on] = 0.0
            gt_flows[b, f, :, :, 1][on] = t * obj_shift

    K = np.broadcast_to(synthetic_intrinsics(height, width), (batch_size, 4, 4)).copy()
    return colors, K, gt_mask, gt_flows, times


class SyntheticDataset:
    """Map-style dataset facade over :func:`synthetic_batch` items."""

    def __init__(self, n: int, height: int, width: int, num_frames: int = 3):
        self.n = n
        self.height = height
        self.width = width
        self.num_frames = num_frames

    def __len__(self) -> int:
        return self.n

    def __getitem__(self, index: int) -> tuple[np.ndarray, np.ndarray]:
        colors, K = synthetic_batch(1, self.height, self.width, self.num_frames, seed=index)
        return colors[0], K[0]
