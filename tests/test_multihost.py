"""Multi-host execution tests: 2 real OS processes over jax.distributed
(CPU backend, Gloo collectives — the same JAX multi-process runtime a TPU pod
uses over DCN).

The reference is strictly single-process (/root/reference/trainer.py:35);
SURVEY.md §5 defines the multi-host contract this suite enforces. The heavy
end-to-end run lives in tools/multihost_dryrun.py (spawn 2 workers, train,
restart, resume) so it doubles as an operator tool; the test launches it and
asserts every contract check.
"""

import json
import os
import subprocess
import sys

import pytest

from mdn_sfm_tpu.data.splits import SplitLine, shard_for_host

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")


class TestShardForHost:
    def test_disjoint_and_complete(self):
        lines = [SplitLine(f"d{i % 7}", i, "l") for i in range(1001)]
        for host_count in (1, 2, 3, 4):
            shards = [shard_for_host(lines, h, host_count) for h in range(host_count)]
            union = set().union(*(set(s) for s in shards))
            assert sum(len(s) for s in shards) == len(union), "shards overlap"
            dropped = len(lines) - len(union)
            assert 0 <= dropped < host_count
            # equal lengths → identical steps_per_epoch on every host (a
            # longer host would dispatch an extra collective step: deadlock)
            assert len({len(s) for s in shards}) == 1

    def test_single_host_is_identity(self):
        lines = [SplitLine("d", i, "l") for i in range(10)]
        assert shard_for_host(lines, 0, 1) == lines


class TestTwoProcessTraining:
    @pytest.mark.slow  # ~6 min: 2 OS processes + 2 Gloo handshakes
    def test_dryrun_end_to_end(self, tmp_path):
        """Full 2-process contract: disjoint host shards feed a 4-device
        global mesh, post-training params are BITWISE identical on both
        processes, only process 0 writes checkpoints, and --resume auto works
        across a complete 2-process restart."""
        out = subprocess.run(
            [sys.executable, os.path.join(TOOLS, "multihost_dryrun.py"),
             "--work_dir", str(tmp_path)],
            capture_output=True, text=True, timeout=1800,
        )
        assert out.returncode == 0, f"dryrun failed:\n{out.stdout}\n{out.stderr}"
        result = json.loads(out.stdout.strip().splitlines()[-1])
        assert result["ok"], result
        for name, passed in result["checks"].items():
            assert passed, f"multi-host contract check failed: {name}"
