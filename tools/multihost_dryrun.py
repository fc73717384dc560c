"""Multi-host validation harness: N real OS processes over jax.distributed.

The reference is strictly single-process (one CUDA device,
/root/reference/trainer.py:35); SURVEY.md §5 defines the TPU-native
replacement as one process per host over DCN — ``jax.distributed.initialize``
+ a global Mesh('data') + per-host manifest shards. Everything in that
contract except the actual process launch is covered by the single-process
test suite; THIS tool covers the launch: it spawns N workers on the CPU
backend (localhost coordinator, Gloo collectives — the same JAX multi-process
runtime a TPU pod uses over DCN), runs the real ``Trainer`` end to end twice
(fresh + ``--resume auto`` restart), and asserts the multi-host contract:

  (a) per-host manifest shards are disjoint and cover the split
      (``shard_for_host``),
  (b) post-training params are BITWISE identical on every process
      (the explicit-pmean shard_map step keeps replication exact),
  (c) only process 0 writes checkpoints (shared-FS race guard,
      trainer.save_model),
  (d) ``--resume auto`` across a full N-process restart re-enters at the
      interrupted step and completes the run.

Usage:
    python tools/multihost_dryrun.py                  # 2 procs × 2 devices
    python tools/multihost_dryrun.py --num_processes 2 --local_devices 2

Prints one JSON result line; exit code 0 iff every assertion holds.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import socket
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# --------------------------------------------------------------------- worker


def worker_main(args) -> None:
    # Platform override must precede first backend use (the axon
    # sitecustomize pins JAX_PLATFORMS; only the config update works).
    sys.path.insert(0, REPO)
    from mdn_sfm_tpu.utils import force_virtual_cpu

    force_virtual_cpu(n_devices=args.local_devices)

    from mdn_sfm_tpu.parallel import maybe_initialize_distributed

    if not maybe_initialize_distributed():
        raise SystemExit("worker launched without MDN_COORDINATOR env")

    import jax

    pid = jax.process_index()
    nproc = jax.process_count()
    print(
        f"[worker {pid}] processes={nproc} global_devices={len(jax.devices())} "
        f"local={len(jax.local_devices())}",
        flush=True,
    )

    # count checkpoint writes per process — assertion (c)
    import mdn_sfm_tpu.checkpoints as ckpt

    writes: list[str] = []
    real_save = ckpt.save_checkpoint

    def counting_save(folder, *a, **kw):
        writes.append(os.path.basename(folder))
        return real_save(folder, *a, **kw)

    ckpt.save_checkpoint = counting_save

    from mdn_sfm_tpu.config import Config
    from mdn_sfm_tpu.trainer import Trainer

    cfg = Config(
        height=args.height,
        width=args.width,
        batch_size=args.global_batch,
        num_epochs=args.num_epochs,
        limit_train_samples=args.num_samples,
        num_workers=1,
        save_frequency=10_000,  # only the end-of-train checkpoint
        log_frequency=1000,
        compute_dtype="float32",
        donate_state=False,
        resume="auto" if args.resume else "",
        log_dir=os.path.join(args.work_dir, "log"),
        other_files_path=os.path.join(args.work_dir, "files"),
        v_save="mh",
        w_d2_sim=0.0,
    ).validate()

    trainer = Trainer(cfg, synthetic=True)
    trainer.train()

    params = jax.device_get(trainer.state.params)
    digest = hashlib.sha256()
    for path, leaf in sorted(
        jax.tree_util.tree_flatten_with_path(params)[0], key=lambda kv: str(kv[0])
    ):
        digest.update(str(path).encode())
        import numpy as np

        digest.update(np.ascontiguousarray(leaf).tobytes())

    result = {
        "process_index": pid,
        "process_count": nproc,
        "global_devices": len(jax.devices()),
        "mesh_size": int(trainer.mesh.size),
        "steps_per_epoch": trainer.steps_per_epoch,
        "start_step": trainer.start_step,
        "final_step": int(jax.device_get(trainer.state.step)),
        "params_sha256": digest.hexdigest(),
        "checkpoint_writes": writes,
        "local_dataset_len": len(trainer.train_loader.dataset),
    }
    out = os.path.join(args.work_dir, f"result_{args.phase}_{pid}.json")
    with open(out, "w") as f:
        json.dump(result, f)
    print(f"[worker {pid}] done: {result}", flush=True)


# ------------------------------------------------------------------- launcher


def check_manifest_sharding(host_count: int) -> dict:
    """Assertion (a): per-host shards are disjoint and cover the manifest
    (up to the <host_count dropped tail lines that equalize steps_per_epoch)."""
    from mdn_sfm_tpu.data.splits import read_split_lines, shard_for_host, split_path

    lines = read_split_lines(split_path(REPO, "eigen_zhou", "train"))
    shards = [shard_for_host(lines, h, host_count) for h in range(host_count)]
    as_sets = [set(s) for s in shards]
    union = set().union(*as_sets)
    total = sum(len(s) for s in shards)
    assert len(union) == total, "host shards overlap"
    dropped = len(set(lines)) - len(union)
    assert 0 <= dropped < host_count, f"host shards dropped {dropped} lines"
    lens = {len(s) for s in shards}
    assert len(lens) == 1, f"unequal host shard lengths {lens} would desync steps"
    return {"manifest_lines": len(lines), "per_host": len(shards[0]), "dropped": dropped}


def launch_phase(args, phase: str, num_epochs: int, resume: bool, work_dir: str) -> list[dict]:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    procs = []
    for pid in range(args.num_processes):
        env = dict(os.environ)
        # a parent test session exports its own virtual-device count (e.g.
        # conftest's 8) — strip it so the worker's --local_devices wins
        import re

        env["XLA_FLAGS"] = re.sub(
            r"--xla_force_host_platform_device_count=\d+", "",
            env.get("XLA_FLAGS", ""),
        ).strip()
        env.update(
            MDN_COORDINATOR=f"localhost:{port}",
            MDN_NUM_PROCESSES=str(args.num_processes),
            MDN_PROCESS_ID=str(pid),
        )
        cmd = [
            sys.executable, os.path.abspath(__file__), "--worker",
            "--phase", phase,
            "--work_dir", work_dir,
            "--local_devices", str(args.local_devices),
            "--global_batch", str(args.global_batch),
            "--num_samples", str(args.num_samples),
            "--num_epochs", str(num_epochs),
            "--height", str(args.height),
            "--width", str(args.width),
        ] + (["--resume"] if resume else [])
        log = open(os.path.join(work_dir, f"worker_{phase}_{pid}.log"), "w")
        procs.append((subprocess.Popen(cmd, env=env, stdout=log, stderr=log), log))
    results = []
    for pid, (p, log) in enumerate(procs):
        rc = p.wait(timeout=args.timeout)
        log.close()
        if rc != 0:
            tail = open(os.path.join(work_dir, f"worker_{phase}_{pid}.log")).read()[-4000:]
            raise RuntimeError(f"worker {pid} phase {phase} exited {rc}:\n{tail}")
        with open(os.path.join(work_dir, f"result_{phase}_{pid}.json")) as f:
            results.append(json.load(f))
    return sorted(results, key=lambda r: r["process_index"])


def launcher_main(args) -> None:
    sys.path.insert(0, REPO)
    work_dir = args.work_dir or tempfile.mkdtemp(prefix="mdn_multihost_")
    os.makedirs(work_dir, exist_ok=True)

    manifest = check_manifest_sharding(args.num_processes)

    # Phase A: fresh 1-epoch run — every process trains, process 0 checkpoints.
    a = launch_phase(args, "fresh", num_epochs=1, resume=False, work_dir=work_dir)
    # Phase B: full process restart with --resume auto and a longer schedule —
    # must re-enter at phase A's final step and train the remaining epoch.
    b = launch_phase(args, "resume", num_epochs=2, resume=True, work_dir=work_dir)

    steps = a[0]["steps_per_epoch"]
    checks = {
        "manifest_disjoint_complete": True,
        "params_bitwise_identical_fresh": len({r["params_sha256"] for r in a}) == 1,
        "params_bitwise_identical_resume": len({r["params_sha256"] for r in b}) == 1,
        "only_process0_writes": all(
            (len(r["checkpoint_writes"]) > 0) == (r["process_index"] == 0)
            for r in a + b
        ),
        "resume_reentered_at_step": b[0]["start_step"] == steps,
        "resume_completed": b[0]["final_step"] == 2 * steps,
        "fresh_completed": a[0]["final_step"] == steps,
        "mesh_spans_all_devices": all(
            r["mesh_size"] == args.num_processes * args.local_devices for r in a + b
        ),
        "hosts_fed_disjoint_slices": all(
            r["local_dataset_len"] == args.num_samples // args.num_processes
            for r in a + b
        ),
    }
    ok = all(checks.values())
    print(json.dumps({
        "ok": ok,
        "num_processes": args.num_processes,
        "local_devices": args.local_devices,
        "global_batch": args.global_batch,
        "steps_per_epoch": steps,
        "checks": checks,
        "manifest": manifest,
        "work_dir": work_dir,
    }))
    raise SystemExit(0 if ok else 1)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--phase", default="fresh")
    ap.add_argument("--work_dir", default="")
    ap.add_argument("--num_processes", type=int, default=2)
    ap.add_argument("--local_devices", type=int, default=2)
    ap.add_argument("--global_batch", type=int, default=4)
    ap.add_argument("--num_samples", type=int, default=16)
    ap.add_argument("--num_epochs", type=int, default=1)
    ap.add_argument("--height", type=int, default=32)
    ap.add_argument("--width", type=int, default=64)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--timeout", type=int, default=1200)
    args = ap.parse_args()
    if args.worker:
        worker_main(args)
    else:
        launcher_main(args)


if __name__ == "__main__":
    main()
