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
