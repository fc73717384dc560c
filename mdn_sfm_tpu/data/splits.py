"""Split manifest reading (reference: utils.py:318-323, splits/eigen_zhou/).

Manifest lines are ``"<drive_dir> <frame_idx> <l|r>"`` — 39,810 train /
4,424 val lines in eigen_zhou (SURVEY.md §1 L1). Adds deterministic host
sharding so each host feeds its own slice of the manifest (one data shard per
host over DCN — SURVEY.md §5)."""

from __future__ import annotations

import os
from typing import NamedTuple


class SplitLine(NamedTuple):
    folder: str
    frame_index: int
    side: str  # 'l' | 'r'

    @classmethod
    def parse(cls, line: str) -> "SplitLine":
        parts = line.split()
        folder = parts[0]
        frame_index = int(parts[1]) if len(parts) >= 2 else 0
        side = parts[2] if len(parts) >= 3 else "l"
        return cls(folder, frame_index, side)


# manifest side tokens: eigen_zhou uses l/r; KITTI camera ids 2/3 are
# accepted aliases (data/kitti.py::SIDE_MAP) — canonicalize so aliased
# manifests resolve to the SAME mask key
_CANONICAL_SIDE = {"l": "l", "2": "l", "r": "r", "3": "r"}


def sample_key(line: SplitLine) -> str:
    """Canonical per-sample key shared by the trainer's mask-provider lookup
    and ``tools/precompute_masks.py`` mask filenames:
    ``{folder with / -> _}_{frame_index}_{canonical side l|r}``.

    The side IS part of the key: eigen_zhou pairs l/r manifest lines for
    17,930 (folder, frame) combinations and the two cameras see different
    scenes — a side-less key would serve one camera's precomputed mask to
    the other (the pre-round-5 scheme did exactly that). Side tokens are
    canonicalized ('2' ≡ 'l', '3' ≡ 'r') so a mixed-alias manifest can't
    silently miss precomputed masks."""
    side = _CANONICAL_SIDE.get(line.side, line.side)
    return f"{line.folder.replace('/', '_')}_{line.frame_index}_{side}"


def split_path(repo_root: str, split: str, subset: str) -> str:
    """Path to ``splits/<split>/<subset>_files.txt`` (trainer.py:59-60).

    ``split`` may also be an ABSOLUTE directory containing the manifest
    files — custom splits outside the repo (and test fixtures) train without
    writing into ``splits/``. Manifests are vendored gzip-compressed (they
    are dataset file lists); the .gz variant is returned when the plain file
    is absent."""
    base = split if os.path.isabs(split) else os.path.join(repo_root, "splits", split)
    plain = os.path.join(base, f"{subset}_files.txt")
    return plain if os.path.exists(plain) else plain + ".gz"


def read_split_lines(path: str) -> list[SplitLine]:
    if path.endswith(".gz"):
        import gzip

        with gzip.open(path, "rt") as f:
            text = f.read()
    else:
        with open(path) as f:
            text = f.read()
    return [SplitLine.parse(ln) for ln in text.splitlines() if ln.strip()]


def shard_for_host(
    lines: list[SplitLine], host_id: int | None = None, host_count: int | None = None
) -> list[SplitLine]:
    """Static per-host shard of the manifest (strided so drives interleave).

    Every host's shard is truncated to the common length
    ``len(lines) // host_count`` so all hosts compute the identical
    steps_per_epoch — otherwise a host whose strided slice is one line longer
    would dispatch one extra collective step and deadlock the others
    (at most host_count-1 lines are dropped per epoch)."""
    if host_id is None:
        import jax

        host_id = jax.process_index()
        host_count = jax.process_count()
    per_host = len(lines) // host_count
    return lines[host_id::host_count][:per_host]
