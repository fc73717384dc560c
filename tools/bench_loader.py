"""Host input-pipeline micro-bench: native C++ decode vs the PIL/cv2 path.

Builds a synthetic KITTI raw drive at full resolution (375×1242 PNG, the
real KITTI raw frame size), then times triplet assembly through
``KittiRawDataset`` with ``use_native`` on and off, and the end-to-end
``HostLoader`` items/s on top of each.

The reference hides this cost behind 12 DataLoader worker processes
(trainer.py:69-71); at TPU training rates (bench.py: ≥260 f/s/chip at
640×192) the host must decode ≥87 triplets/s/chip, so per-image decode cost
is the real bound on sustained utilization once the device step is this
fast.

Usage: python tools/bench_loader.py [n_items] [height] [width]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))


def main() -> None:
    n_items = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    height = int(sys.argv[2]) if len(sys.argv) > 2 else 192
    width = int(sys.argv[3]) if len(sys.argv) > 3 else 640

    from fixtures import make_raw_drive

    from mdn_sfm_tpu import native
    from mdn_sfm_tpu.data.kitti import KittiRawDataset
    from mdn_sfm_tpu.data.loader import HostLoader
    from mdn_sfm_tpu.data.splits import SplitLine

    if not native.imgio_available():
        print("native imgio unavailable (libjpeg/libpng missing) — nothing to compare")
        return

    with tempfile.TemporaryDirectory() as root:
        lines = [
            SplitLine.parse(s)
            for s in make_raw_drive(root, n_frames=n_items + 2, h=375, w=1242)
        ]
        print(f"{len(lines)} triplets of 375×1242 PNG → {height}×{width}")

        for use_native, label in [(False, "PIL+cv2"), (True, "native C++")]:
            ds = KittiRawDataset(root, lines, height, width, use_native=use_native)
            ds[0]  # touch (warms the .so build / PIL imports / page cache)
            t0 = time.perf_counter()
            for i in range(len(lines)):
                ds[i]
            dt = time.perf_counter() - t0
            per = dt / len(lines)
            print(
                f"  {label:>10} __getitem__: {per * 1e3:7.1f} ms/triplet "
                f"({3 / per:6.1f} images/s, {1 / per:6.1f} triplets/s)"
            )

            loader = HostLoader(ds, batch_size=4, shuffle=False, num_workers=4,
                                drop_last=True, prefetch=2)
            t0 = time.perf_counter()
            nb = 0
            for (cols, _idx) in loader:
                nb += 1
            dt = time.perf_counter() - t0
            bs = 4 * nb / dt
            print(f"  {label:>10} HostLoader(4 workers): {bs:6.1f} triplets/s")


if __name__ == "__main__":
    main()
