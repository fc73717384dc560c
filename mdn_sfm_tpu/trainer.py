"""Training driver (reference: trainer.py:31-562).

Owns IO and orchestration only — all math lives in the jitted functional core
(:mod:`mdn_sfm_tpu.training`): epoch loop, TensorBoard logging, checkpoint
save/load with the reference layout, inline validation, the epipolar
percentile tool and the hyperparameter grid search.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from . import checkpoints as ckpt
from . import training as T
from .config import Config, Mode
from .data import HostLoader, KittiRawDataset, read_split_lines, split_path
from .data.splits import sample_key, shard_for_host
from .data.synthetic import SyntheticDataset
from .masks import build_mask_provider
from .parallel import make_mesh, replicate, shard_batch
from .viz import flow_to_image, normalize_image, sec_to_hm_str


class Trainer:
    """End-to-end training pipeline (reference: Trainer, trainer.py:31-254)."""

    def __init__(self, cfg: Config, synthetic: bool = False, debug_nans: bool = False):
        self.cfg = cfg.validate()
        self.synthetic = synthetic
        self.save_path = os.path.join(cfg.log_dir, cfg.v_save)

        if debug_nans:
            # NaN tripwire — the TPU analog of the reference's per-backward
            # autograd anomaly mode (trainer.py:234), opt-in because it
            # forces sync on every op
            jax.config.update("jax_debug_nans", True)
        if cfg.profile_dir:
            os.makedirs(cfg.profile_dir, exist_ok=True)

        self.writers = self._make_writers()
        self._stop_requested = False
        self._initialize_dataset()
        self._initialize_models()

        print(f"{jax.devices()[0].platform}: training model {cfg.v_save} (mode={cfg.mode.value})")
        print(f"Models and tensorboard files save to: {cfg.log_dir}/{cfg.v_save}\n")
        self.save_opts()

    # ------------------------------------------------------------ setup

    def _make_writers(self):
        if jax.process_index() != 0:
            return None  # multi-host: only process 0 logs (shared-FS race)
        try:
            from torch.utils.tensorboard import SummaryWriter

            return {
                "train": SummaryWriter(os.path.join(self.save_path, "tb_train")),
                "val": SummaryWriter(os.path.join(self.save_path, "tb_val")),
            }
        except Exception:  # tensorboard optional
            return None

    def _initialize_dataset(self):
        cfg = self.cfg
        # cfg.batch_size is the GLOBAL batch; each host's loader feeds its
        # own slice (one manifest shard per host over DCN — SURVEY.md §5)
        n_proc = jax.process_count()
        if n_proc > 1 and cfg.batch_size % n_proc != 0:
            raise ValueError(
                f"global batch {cfg.batch_size} must divide by process count {n_proc}"
            )
        self.local_batch = cfg.batch_size // n_proc
        if self.synthetic:
            n = cfg.limit_train_samples or max(cfg.batch_size * 8, 64)
            dataset = SyntheticDataset(n, cfg.height, cfg.width)
            keys = [str(i) for i in range(len(dataset))]
            if n_proc > 1:
                from .data import Subset

                idxs = shard_for_host(list(range(n)))
                dataset = Subset(dataset, idxs)
                keys = [keys[i] for i in idxs]
            self.sample_keys = keys
        else:
            repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            lines = read_split_lines(split_path(repo_root, cfg.split, "train"))
            if cfg.limit_train_samples:
                lines = lines[: cfg.limit_train_samples]
            lines = shard_for_host(lines)
            img_ext = ".png" if cfg.png else ".jpg"
            dataset = KittiRawDataset(
                cfg.data_path, lines, cfg.height, cfg.width, cfg.frame_ids, img_ext
            )
            if cfg.cache_decoded:
                from .data.cache import DecodedCache

                # sound because augmentation is on-device: the host output
                # per item is a pure function of (bytes, H, W) — see
                # data/cache.py. Each host caches only its manifest shard.
                dataset = DecodedCache(dataset, cfg.cache_decoded)
            # canonical mask-lookup keys (shared with tools/precompute_masks.py)
            self.sample_keys = [sample_key(l) for l in lines]

        self.train_loader = HostLoader(
            dataset,
            self.local_batch,
            shuffle=True,
            seed=cfg.seed,
            num_workers=cfg.num_workers,
            drop_last=True,
        )
        self.steps_per_epoch = len(self.train_loader)
        self.num_total_steps = self.steps_per_epoch * cfg.num_epochs
        self.mask_provider = build_mask_provider(cfg)
        # PrecomputedMaskProvider serves ZEROS for missing files (by design —
        # partial coverage is fine), so a mask_dir/key-scheme mismatch would
        # silently train DS/DC against all-zero masks. Check ALL keys (cheap
        # os.path.exists sweep, <1 s even for eigen_zhou's 40k lines): fail
        # fast when NOTHING matches, report the coverage otherwise.
        if cfg.mask_provider == "precomputed" and self.sample_keys:
            hits = sum(
                os.path.exists(os.path.join(cfg.mask_dir, f"{k}.png"))
                for k in self.sample_keys
            )
            n = len(self.sample_keys)
            if hits == 0:
                raise FileNotFoundError(
                    f"mask_provider=precomputed found 0/{n} sample keys in "
                    f"{cfg.mask_dir!r} (e.g. {self.sample_keys[0]}.png) — every "
                    "mask would load as zeros. Generate masks with "
                    "tools/precompute_masks.py (the key scheme is "
                    "data/splits.py::sample_key)."
                )
            print(f"precomputed masks: {hits}/{n} sample keys covered "
                  f"({hits / n:.1%}); missing keys train with all-zero masks")

        # inline validation set (reference: trainer.py:76-80) — KITTI-2015
        # scene-flow pairs; skipped when the data isn't on disk
        self.val_dataset = None
        self._val_idx = 0
        if not self.synthetic and os.path.isdir(os.path.join(cfg.data_root, "data_scene_flow")):
            from .data.eval_datasets import KittiSegDataset

            self.val_dataset = KittiSegDataset(cfg.data_root, cfg.height, cfg.width)
        n_val = len(self.val_dataset) if self.val_dataset else 0
        print(f"\n{len(dataset):d} training items and {n_val:d} validation items\n")

    def _initialize_models(self):
        cfg = self.cfg
        self.models = T.build_models(cfg)
        variables = T.init_variables(cfg, self.models, jax.random.PRNGKey(cfg.seed))

        # load frozen flow/pose (reference: always from v0/weights_0,
        # trainer.py:146-156) and optionally the mobile decoder
        folder = ckpt.weights_folder(cfg.log_dir, "v0", 0)
        to_load = tuple(n for n in cfg.models_to_load if n != "mobile_decoder")
        if os.path.isdir(folder) and to_load:
            variables, _, _ = ckpt.load_checkpoint(folder, variables, models_to_load=to_load)
            print(f"Loaded {to_load} from {folder}")
        else:
            print("WARNING: no pretrained flow/pose checkpoint found — training "
                  f"against randomly initialized supervision ({folder})")

        self.start_step = 0
        self.start_idx_save = 0
        resume_folder = None
        if cfg.resume == "auto":
            # preemption-safe restart: continue v_save from its own latest
            # checkpoint (params + Adam + step); falls through to a fresh
            # start when none exists yet
            latest = ckpt.latest_weights_idx(cfg.log_dir, cfg.v_save)
            if latest is not None:
                resume_folder = ckpt.weights_folder(cfg.log_dir, cfg.v_save, latest)
                names = (
                    ("flownet", "posenet", "mobile_decoder")
                    if cfg.fine_tune_flow_motion
                    else ("mobile_decoder",)
                )
                variables, _, self.start_step = ckpt.load_checkpoint(
                    resume_folder, variables, models_to_load=names
                )
                self.start_idx_save = latest + 1
                print(f"Auto-resume: {resume_folder} (step {self.start_step})")
        self._resumed_auto = resume_folder is not None
        if (
            resume_folder is None
            and (cfg.fine_tune_flow_motion or cfg.load_adam)
            and "mobile_decoder" in cfg.models_to_load
        ):
            mfolder = ckpt.weights_folder(cfg.log_dir, cfg.v_load, cfg.idx_load)
            if os.path.isdir(mfolder):
                variables, _, self.start_step = ckpt.load_checkpoint(
                    mfolder, variables, models_to_load=("mobile_decoder",)
                )
                print(f"Loaded mobile_decoder from {mfolder}")
        # The step counter is inherited across fine-tune stages (a --v_load
        # run continues its base checkpoint's count), so THIS run's progress
        # is step - base_step. A fresh run's base is wherever the counter
        # starts; an auto-resumed run inherits the interrupted run's base
        # from its meta.json.
        if resume_folder is not None:
            meta = ckpt.read_meta(resume_folder)
            self.base_step = meta.get("base_step", 0)
            if "base_step" not in meta and self.start_step > 0:
                # pre-upgrade checkpoint: its inherited fine-tune counter is
                # indistinguishable from this run's progress — resume may
                # mis-position or no-op; make that diagnosable
                print(
                    "WARNING: resumed meta.json has no base_step (written by an "
                    f"older build) — treating step {self.start_step} entirely as "
                    "this run's progress. A resumed fine-tune stage may "
                    "mis-position or exit as already complete; restart with a "
                    "fresh --v_save if so."
                )
        else:
            self.base_step = self.start_step

        self.tx = T.make_optimizer(cfg, self.steps_per_epoch)
        self.state, self.frozen = T.create_train_state(cfg, self.models, variables, self.tx)
        if cfg.load_adam or resume_folder is not None:
            mfolder = resume_folder or ckpt.weights_folder(cfg.log_dir, cfg.v_load, cfg.idx_load)
            adam = os.path.join(mfolder, "adam.msgpack")
            if os.path.exists(adam):
                opt_state = ckpt.load_variables(adam, jax.device_get(self.state.opt_state))
                self.state = self.state._replace(opt_state=opt_state)
                print("Loading Adam state...")
            else:
                print("Cannot find Adam weights so Adam is randomly initialized")
        if self.start_step:
            # keep the in-step counter (augment RNG fold, LR for fresh Adam)
            # consistent with the restored position
            self.state = self.state._replace(
                step=jnp.asarray(self.start_step, jnp.int32)
            )

        # fuse a live Mask R-CNN provider into the step: its variables ride
        # the frozen tree, inference happens inside the same XLA program
        # (training.py::_batch_instance_mask) — one dispatch/step in DS/DC
        # mode and the K-step scan stays a single dispatch
        self._fused_masks = (
            cfg.d2_fuse_step
            and self.mask_provider is not None
            and hasattr(self.mask_provider, "union_fn")
        )
        mask_fn = self.mask_provider.union_fn if self._fused_masks else None
        if self._fused_masks:
            self.frozen = dict(self.frozen)
            self.frozen["maskrcnn"] = self.mask_provider.variables

        # data-parallel placement: shrink the data axis to the largest
        # divisor of the batch when the batch doesn't fill every device
        n_dev = cfg.num_data_shards or len(jax.devices())
        if jax.process_count() > 1:
            # multi-host: the mesh must span every process's chips (each host
            # feeds its own rows) — shrinking would leave hosts meshless
            n_dev = len(jax.devices())
            if cfg.batch_size % n_dev != 0:
                raise ValueError(
                    f"multi-host runs need global batch {cfg.batch_size} "
                    f"divisible by the global device count {n_dev}"
                )
        while n_dev > 1 and cfg.batch_size % n_dev != 0:
            n_dev -= 1
        self.mesh = make_mesh(n_dev)
        if n_dev > 1:
            self.state = replicate(self.mesh, self.state)
            self.frozen = replicate(self.mesh, self.frozen)
        if n_dev != (cfg.num_data_shards or len(jax.devices())):
            print(f"NOTE: data mesh shrunk to {n_dev} devices (batch {cfg.batch_size})")

        step_mesh = self.mesh if n_dev > 1 else None
        self.step_fn = T.make_train_step(
            cfg, self.models, self.tx, mask_fn=mask_fn, mesh=step_mesh
        )
        self.kstep_fn = (
            T.make_multi_train_step(cfg, self.models, self.tx, mask_fn=mask_fn, mesh=step_mesh)
            if cfg.steps_per_dispatch > 1
            else None
        )
        self.eval_fn = T.make_eval_forward(cfg, self.models)
        self.rng = jax.random.PRNGKey(cfg.seed)

    # ----------------------------------------------------------- running

    def save_opts(self):
        """(reference: trainer.py:97-106)"""
        if jax.process_index() != 0:
            return  # multi-host: one writer per shared log dir
        self.cfg.save(os.path.join(self.save_path, "models", "opt.json"))

    def save_model(self, idx_save: int, async_write: bool = False):
        """(reference: trainer.py:108-131)

        Multi-host: params are replicated across hosts, so only process 0
        writes (every host writing the same folder over a shared FS is a
        race). With ``async_write`` (the mid-epoch save_frequency saves) the
        file write runs on a background thread — the device→host pull is
        synchronous (a consistent snapshot), but serialization + disk IO
        overlap the next training dispatches; ``_join_pending_save`` orders
        writes and train() joins before returning. The default is a
        synchronous write (reference semantics: files exist on return)."""
        self._join_pending_save()
        if jax.process_index() != 0:
            return
        folder = ckpt.weights_folder(self.cfg.log_dir, self.cfg.v_save, idx_save)
        state = jax.device_get(self.state)
        # the fused provider's maskrcnn tree is frozen detectron2 weights —
        # not part of the reference checkpoint layout, never saved
        nets = {k: v for k, v in self.frozen.items() if k != "maskrcnn"}
        variables = dict(jax.device_get(nets))
        # re-attach trainable params into full variable trees
        variables["mobile_decoder"] = {"params": state.params["mobile_decoder"]}
        if self.cfg.fine_tune_flow_motion:
            for n in ("flownet", "posenet"):
                variables[n] = dict(variables[n])
                variables[n]["params"] = state.params[n]
            names = ("flownet", "posenet", "mobile_decoder")
        else:
            names = ("mobile_decoder",)

        if not async_write:
            ckpt.save_checkpoint(
                folder, variables, state.opt_state, int(state.step), names,
                base_step=self.base_step,
            )
            return
        import threading

        def _write():
            try:
                ckpt.save_checkpoint(
                    folder, variables, state.opt_state, int(state.step), names,
                    base_step=self.base_step,
                )
            except BaseException as e:
                # surfaced (and re-raised) by _join_pending_save — every
                # save/exit path joins, so a failed write can never be
                # silently swallowed by the dying thread
                self._pending_save_error = e

        self._pending_save = threading.Thread(target=_write, daemon=False)
        self._pending_save.start()

    def _join_pending_save(self):
        """Block until the last async checkpoint write finishes (called
        before starting a new save and before load/exit paths). A failure in
        the background write (disk full, serialization error) re-raises HERE
        so it cannot be silently swallowed by the dying thread."""
        t = getattr(self, "_pending_save", None)
        if t is not None:
            t.join()
            self._pending_save = None
        err = getattr(self, "_pending_save_error", None)
        if err is not None:
            self._pending_save_error = None
            raise RuntimeError("async checkpoint write failed") from err

    def _device_batch(self, arrays: tuple, keys: list[str]) -> dict:
        colors, K = arrays
        # keep host numpy until placement: shard_batch assembles the global
        # array from each host's local rows (multi-host) or device_puts the
        # sharded batch; the single-device path places directly below
        batch = {"colors_u8": colors, "K": K}
        if self.mask_provider is not None and not self._fused_masks:
            if hasattr(self.mask_provider, "union_masks_from_images"):
                # non-fused fallback: live Mask R-CNN on the RAW target frame.
                # Deviation: the reference's instance_img is built from the
                # AUGMENTED color tensor (mono_dataset.py:111) — only the
                # fused path (d2_fuse_step, the default) reproduces that,
                # because augmentation happens inside the jitted step.
                masks = self.mask_provider.union_masks_from_images(
                    colors[:, 0], self.cfg.height, self.cfg.width
                )
            else:
                masks = self.mask_provider.union_masks(keys, self.cfg.height, self.cfg.width)
            batch["instance_mask"] = masks
        n_dev = int(np.prod(self.mesh.devices.shape))
        if n_dev > 1:
            return shard_batch(self.mesh, batch)
        return {k: jnp.asarray(v) for k, v in batch.items()}

    def _warm_start(self):
        """Multi-host only: AOT-compile the step(s) on shape-matched dummy
        operands, then rendezvous every host before the first dispatch.

        Cross-host communicator setup (Gloo on CPU, ~30 s handshake; ICI
        contexts on pods) must not absorb compile-time skew between hosts —
        a host that compiles minutes faster would time out waiting for the
        others' first collective. AOT compile populates the persistent
        compilation cache, so the post-barrier jit call is a fast cache
        hit on every host."""
        if jax.process_count() <= 1:
            return
        from .parallel import barrier

        cfg = self.cfg
        F = len(cfg.frame_ids)
        from .data.synthetic import synthetic_intrinsics

        colors = np.zeros((self.local_batch, F, cfg.height, cfg.width, 3), np.uint8)
        K = np.tile(synthetic_intrinsics(cfg.height, cfg.width), (self.local_batch, 1, 1))
        keys = self.sample_keys[: self.local_batch]
        batch = self._device_batch((colors, K), keys)
        self.step_fn.lower(self.state, self.frozen, batch, self.rng).compile()
        if self.kstep_fn is not None:
            K_steps = cfg.steps_per_dispatch
            stacked = jax.tree.map(
                lambda x: jnp.broadcast_to(x, (K_steps,) + x.shape), batch
            )
            self.kstep_fn.lower(self.state, self.frozen, stacked, self.rng).compile()
        barrier(f"mdn_warm_start_{self.start_step}")

    def train(self):
        """(reference: trainer.py:213-254)

        SIGTERM/SIGINT during the epoch loop checkpoint the current state at
        the next batch boundary and exit cleanly — preemption safety pairing
        with ``--resume auto`` (the reference loses up to save_frequency
        steps on any interruption, trainer.py:253-254)."""
        import signal

        cfg = self.cfg
        self.epoch = 0
        self.step = self.start_step
        self.idx_save = self.start_idx_save
        self.start_time = time.time()
        self._stop_requested = False

        # Exact mid-epoch resume (auto only — a manual --v_load/--idx_load
        # fine-tune keeps the reference semantics of a fresh num_epochs run):
        # re-enter the interrupted epoch and skip its consumed batches, so an
        # interrupted-then-resumed run consumes the identical batch sequence
        # as an uninterrupted one (the per-epoch shuffle depends only on
        # (seed, epoch) and the augment RNG only on the step counter).
        self._warm_start()
        start_epoch, self._skip_batches = 0, 0
        already_complete = False
        if self._resumed_auto and self.steps_per_epoch > 0:
            # progress of THIS run = step - base_step (the counter itself is
            # inherited across fine-tune stages; see _initialize_models)
            start_epoch, self._skip_batches = divmod(
                self.start_step - self.base_step, self.steps_per_epoch
            )
            if start_epoch >= cfg.num_epochs:
                already_complete = True
                print(f"Auto-resume: run already complete at step {self.start_step}")

        def _request_stop(signum, frame):
            print(f"signal {signum}: checkpointing at the next batch boundary")
            self._stop_requested = True

        prev = {}
        try:
            for sig in (signal.SIGTERM, signal.SIGINT):
                prev[sig] = signal.signal(sig, _request_stop)
        except ValueError:
            prev = {}  # not the main thread (tests) — no handler, flag still works
        try:
            for self.epoch in range(start_epoch, cfg.num_epochs):
                self.run_epoch()
                if self._stop_requested:
                    break
            if not already_complete:
                # restarting an already-finished run must be a no-op, not a
                # fresh duplicate checkpoint per restart (crash-loop safety)
                self.save_model(self.idx_save)
        finally:
            # restore handlers even when the pending-save join raises (an
            # async write failure must not leave _request_stop installed on
            # a dead Trainer for the rest of the process)
            try:
                self._join_pending_save()  # train() returns with the files on disk
            finally:
                for sig, h in prev.items():
                    signal.signal(sig, h)

    def run_epoch(self):
        # pin the shuffle to the trainer's epoch (not the loader's own
        # iteration count) so resumed processes see identical epoch orders
        self.train_loader.epoch = self.epoch
        skip = getattr(self, "_skip_batches", 0)
        self._skip_batches = 0  # only the re-entered epoch skips
        if self.cfg.steps_per_dispatch > 1:
            self._run_epoch_multi(skip)
        else:
            self._run_epoch_single(skip)
        hit = getattr(self.train_loader.dataset, "hit_fraction", None)
        if hit is not None and hit < 1.0:
            # --cache_decoded diagnostic: < 1.0 after an epoch means the
            # fill is still in progress (resumed mid-epoch run, or items
            # skipped by drop_last)
            print(f"decoded cache: {hit:.1%} of items cached")

    def _run_epoch_single(self, skip: int = 0):
        cfg = self.cfg
        for batch_idx, (arrays, idxs) in enumerate(
            self.train_loader.iter_batches(skip), start=skip
        ):
            if self._stop_requested:
                return
            if cfg.profile_dir and self.step == 10:
                jax.profiler.start_trace(cfg.profile_dir)
            if cfg.profile_dir and self.step == 15:
                jax.profiler.stop_trace()
            before = time.time()
            keys = [self.sample_keys[int(i)] for i in idxs]
            batch = self._device_batch(arrays, keys)
            self.state, self.frozen, metrics, aux = self.step_fn(
                self.state, self.frozen, batch, self.rng
            )

            early = batch_idx % cfg.log_frequency == 0 and self.step < 2000
            late = self.step % 1000 == 0
            if early or late:
                loss = float(metrics["loss"])  # sync point only on log steps
                self.log_time(batch_idx, time.time() - before, loss)
            if batch_idx % 50 == 0:
                self.log(metrics, aux, log_image=early or late)
                self.val()

            self.step += 1
            if self.step % cfg.save_frequency == 0:
                self.save_model(self.idx_save, async_write=True)
                self.idx_save += 1

    def _run_epoch_multi(self, skip: int = 0):
        """K optimizer steps per device dispatch (lax.scan) — amortizes
        host→device latency; scalar logging is per dispatch (K-step means),
        image logging uses the scan's carried last-step aux. Epoch-tail
        batches that don't fill a K-window flush through the single-step
        path, so items/epoch is identical to steps_per_dispatch=1."""
        cfg = self.cfg
        K = cfg.steps_per_dispatch
        pend: list = []
        dispatch_idx = 0
        for arrays, idxs in self.train_loader.iter_batches(skip):
            if self._stop_requested:
                break
            keys = [self.sample_keys[int(i)] for i in idxs]
            pend.append(self._device_batch(arrays, keys))
            if len(pend) < K:
                continue
            before = time.time()
            stacked = {
                k: jnp.stack([b[k] for b in pend]) for k in pend[0]
            }
            pend = []
            self.state, self.frozen, metrics, aux = self.kstep_fn(
                self.state, self.frozen, stacked, self.rng
            )

            if dispatch_idx % max(cfg.log_frequency // K, 1) == 0:
                loss = float(metrics["loss"])
                self.log_time(dispatch_idx * K, (time.time() - before) / K, loss)
                self.log(metrics, aux, log_image=True)
                self.val()

            self.step += K
            dispatch_idx += 1
            if self.step // cfg.save_frequency > (self.step - K) // cfg.save_frequency:
                self.save_model(self.idx_save, async_write=True)
                self.idx_save += 1

        # flush the epoch tail (< K buffered batches) one step at a time —
        # unless a stop was requested: the handler promises a checkpoint at
        # the NEXT batch boundary, and un-stepped buffered batches are
        # re-consumed on resume (position derives from the step counter)
        for batch in pend:
            if self._stop_requested:
                break
            self.state, self.frozen, metrics, _ = self.step_fn(
                self.state, self.frozen, batch, self.rng
            )
            self.step += 1
            if self.step % cfg.save_frequency == 0:
                self.save_model(self.idx_save, async_write=True)
                self.idx_save += 1

    def log_time(self, batch_idx: int, duration: float, loss: float):
        """(reference: trainer.py:333-341)"""
        samples_per_sec = self.cfg.batch_size / max(duration, 1e-9)
        sofar = time.time() - self.start_time
        left = (self.num_total_steps / (self.step + 1) - 1.0) * sofar
        print(
            f"epoch {self.epoch} | batch {batch_idx:>6} | loss: {loss:.5f} | "
            f"examples/s: {samples_per_sec:5.1f} | elapsed: {sec_to_hm_str(sofar)} | "
            f"left: {sec_to_hm_str(left)}"
        )

    def log(self, metrics: dict, aux, log_image: bool = False, num: int = 4):
        """TensorBoard scalars + image panels (reference: trainer.py:343-382)."""
        # the photometric loss has a DEGENERATE optimum: flow that warps
        # every sample out of bounds makes the valid-masked mean EXACTLY 0
        # with zero gradient (measured: a hard world diverges flow to
        # EPE ~1e7 px and training silently continues on garbage flow).
        # Exact 0.0 never occurs in healthy training — warn loudly once.
        if (
            "photo" in metrics
            and float(metrics["photo"]) == 0.0
            and self.step > 0
            and not getattr(self, "_warned_photo_zero", False)
        ):
            self._warned_photo_zero = True
            print(
                f"WARNING: photometric loss is EXACTLY 0 at step {self.step} — "
                "the flow net has likely diverged to the all-invalid-warp "
                "degenerate optimum (every sample out of bounds; no gradient). "
                "Check flow EPE; lower the learning rate or raise texture "
                "contrast.",
                flush=True,
            )
        if self.writers is None:
            return
        w = self.writers["train"]
        for k in ("loss", "epip", "smooth", "consis", "grad_norm"):
            w.add_scalar(k, float(metrics[k]), self.step)
        if "photo" in metrics:
            w.add_scalar("photo", float(metrics["photo"]), self.step)
        if not log_image:
            return
        from .parallel import host_local

        frame_ids = self.cfg.ref_frame_ids
        # multi-host: aux is batch-sharded (P(data)) — read this host's rows
        min_mob = host_local(aux.min_mobiles[0])
        n = min(num, min_mob.shape[0])
        for j in range(n):
            epip = np.hstack(
                [normalize_image(host_local(aux.epipolars[(i, 0)])[j, ..., 0]) for i in frame_ids]
            )
            epip_ori = np.hstack(
                [normalize_image(host_local(aux.epipolar_ori[(i, 0)])[j, ..., 0]) for i in frame_ids]
            )
            flows = np.vstack(
                [flow_to_image(host_local(aux.flows[(i, 0)])[j]) for i in frame_ids]
            )
            w.add_image(f"{j}/epip", epip[None], self.step)
            w.add_image(f"{j}/epip_ori", epip_ori[None], self.step)
            w.add_image(f"{j}/mobile_min", min_mob[j].transpose(2, 0, 1), self.step)
            w.add_image(
                f"{j}/mobile_min_bi", (min_mob[j] >= 0.4).astype(np.float32).transpose(2, 0, 1), self.step
            )
            w.add_image(f"{j}/flow", flows, self.step, dataformats="HWC")

    def _current_variables(self) -> dict:
        """Reassemble full variable trees from (frozen, trainable) for eval."""
        variables = {
            k: dict(v) for k, v in self.frozen.items() if k != "maskrcnn"
        }
        variables["mobile_decoder"] = {"params": self.state.params["mobile_decoder"]}
        if self.cfg.fine_tune_flow_motion:
            variables["flownet"]["params"] = self.state.params["flownet"]
            variables["posenet"]["params"] = self.state.params["posenet"]
        return variables

    def val(self):
        """Validate on one KITTI-2015 pair + log images
        (reference: trainer.py:289-331)."""
        if self.val_dataset is None or self.writers is None:
            return
        from .geometry import gauss_distance_weight, scale_factor
        from .losses import epipolar_loss_terms
        from .metrics import binary_image

        cfg = self.cfg
        inputs = self.val_dataset[self._val_idx % len(self.val_dataset)]
        self._val_idx += 1

        variables = self._current_variables()
        tgt = jnp.asarray(inputs[("color", 0)])[None]
        ref = jnp.asarray(inputs[("color", 1)])[None]
        flows, mobiles, aa, t, cam = self.eval_fn(variables, tgt, ref)

        gw = (
            gauss_distance_weight(cfg.height, cfg.width, 1, cfg.gauss_sigma1, cfg.gauss_sigma2)[0]
            if cfg.mode == Mode.TG
            else None
        )
        # live union mask for the loss/panel (reference val runs detectron2
        # on the val frame, trainer.py:289-331)
        union = None
        if self.mask_provider is not None and hasattr(
            self.mask_provider, "union_masks_from_images"
        ):
            tgt_u8 = np.clip((np.asarray(tgt) * 0.225 + 0.45) * 255.0, 0, 255).astype(np.uint8)
            # when fused, the provider's own variable copy may have been
            # donated away — use the live frozen tree
            union = np.asarray(
                self.mask_provider.union_masks_from_images(
                    tgt_u8, cfg.height, cfg.width,
                    variables=self.frozen.get("maskrcnn"),
                )
            )
        viz_cfg = cfg
        inst = jnp.asarray(union) if union is not None else None
        if inst is None and cfg.mode in (Mode.DS, Mode.DC):
            # DS/DC post-processing needs a mask the val path can't supply
            # (keyed/absent provider) — log SN-style maps instead of crashing
            import dataclasses

            viz_cfg = dataclasses.replace(cfg, mode=Mode.SN, w_d2_sim=0.0)
        flow_px = flows[0] * scale_factor(cfg.height, cfg.width)
        epip_loss, epip_map, epip_ori = epipolar_loss_terms(
            viz_cfg, flow_px, mobiles[0], jnp.asarray(inputs["inv_K"])[None],
            cam[:, :3, :3], cam[:, :3, 3], inst, gw,
        )

        w = self.writers["val"]
        w.add_scalar("epipolar loss", float(epip_loss), self.step)
        mob = np.asarray(mobiles[0])[0, ..., 0]
        w.add_image("0/target", normalize_image(np.asarray(tgt)[0]).transpose(2, 0, 1), self.step)
        w.add_image("0/epip", normalize_image(np.asarray(epip_map)[0, ..., 0])[None], self.step)
        w.add_image("0/epip_ori", normalize_image(np.asarray(epip_ori)[0, ..., 0])[None], self.step)
        w.add_image("0/mobile", mob[None], self.step)
        w.add_image("0/mobile_bi", binary_image(mob, 0.4)[None], self.step)

        # instance panel (reference val logs the detectron2 box panel,
        # trainer.py:317-328): boxes from the val annotations, plus the live
        # provider's union mask when one is configured
        anns = inputs.get("annotations")
        if anns and "instance_img" in inputs:
            from .viz import draw_boxes_rgb

            inst = np.clip(np.asarray(inputs["instance_img"]), 0, 255).astype(np.uint8)
            boxes = np.array([a["bbox"] for a in anns], np.float32).reshape(-1, 4)
            w.add_image(
                "0/instances", draw_boxes_rgb(inst, boxes, None), self.step,
                dataformats="HWC",
            )
        if union is not None:
            w.add_image("0/instance_union", union[0][None], self.step)

    # ------------------------------------------------------------- tools

    def epipolar_statics(self, num_quantile: int = 1000, max_batches: int | None = None):
        """Epipolar percentile statistics over the training set — regenerates
        the --threshold calibration (reference: trainer.py:521-562, source of
        the magic 9.22, options.py:84-87)."""
        cfg = self.cfg
        from .data.augment import augment_batch
        from .geometry import scale_factor, epipolar_residual

        percentage = jnp.linspace(0.0, 1.0, num_quantile)

        from .geometry import transformation_from_parameters

        @jax.jit
        def quantiles(frozen, batch):
            colors, inv_Ks, _ = augment_batch(cfg, batch["colors_u8"], batch["K"],
                                           jax.random.PRNGKey(0), train=False)
            tgt = colors[(0, 0)]
            res = {}
            for i in cfg.ref_frame_ids:  # no mobile decoder needed
                flows, _ = self.models.flow.apply(frozen["flownet"], tgt, colors[(i, 0)])
                aa, t = self.models.pose.apply(frozen["posenet"], tgt, colors[(i, 0)])
                cam = transformation_from_parameters(aa, t)
                f_px = flows[0] * scale_factor(cfg.height, cfg.width)
                e = jnp.abs(
                    epipolar_residual(f_px, inv_Ks[0], cam[:, :3, :3], cam[:, :3, 3])
                )
                res[i] = jnp.quantile(e.reshape(e.shape[0], -1), percentage, axis=1)
            return res

        all_q = {i: [] for i in cfg.ref_frame_ids}
        for bi, (arrays, _idxs) in enumerate(self.train_loader):
            if max_batches is not None and bi >= max_batches:
                break
            batch = self._device_batch(arrays, [])
            q = quantiles(self.frozen, {k: batch[k] for k in ("colors_u8", "K")})
            for i in cfg.ref_frame_ids:
                all_q[i].append(np.asarray(q[i]))

        percentiles = np.stack(
            [np.concatenate(all_q[i], axis=1) for i in cfg.ref_frame_ids]
        )  # (2, num_quantile, N)
        os.makedirs(cfg.other_files_path, exist_ok=True)
        np.save(os.path.join(cfg.other_files_path, f"{cfg.split}_percentiles.npy"), percentiles)
        thresholds = np.percentile(percentiles.reshape(-1), [80, 85, 88, 90, 92, 95, 98, 99])
        np.savetxt(os.path.join(cfg.other_files_path, f"{cfg.split}_thresholds"), thresholds)
        return thresholds

    def hyperparameter_try(self, name: str, values: list[float], batches_per_value: int = 200):
        """Grid search over one hyperparameter (reference: trainer.py:384-441).
        Re-jits per value (the config is static) and logs per-value curves."""
        import dataclasses

        results = {}
        for turn, v in enumerate(values):
            print(f"\nEpoch {turn} | {name}={v}:")
            new_cfg = dataclasses.replace(self.cfg, **{name: v}).validate()
            tx = T.make_optimizer(new_cfg, self.steps_per_epoch)
            variables = T.init_variables(new_cfg, self.models, jax.random.PRNGKey(new_cfg.seed))
            state, _ = T.create_train_state(new_cfg, self.models, variables, tx)
            # keep the loaded frozen nets — as a fresh per-turn COPY, because
            # the step donates its frozen argument (donate_argnums) and must
            # not invalidate self.frozen across grid turns
            frozen = jax.tree.map(jnp.copy, self.frozen)
            mask_fn = self.mask_provider.union_fn if self._fused_masks else None
            step_fn = T.make_train_step(
                new_cfg, self.models, tx, mask_fn=mask_fn,
                mesh=self.mesh if self.mesh.size > 1 else None,
            )

            last = None
            for bi, (arrays, idxs) in enumerate(self.train_loader):
                if bi >= batches_per_value:
                    break
                keys = [self.sample_keys[int(i)] for i in idxs]
                batch = self._device_batch(arrays, keys)
                state, frozen, metrics, _ = step_fn(state, frozen, batch, self.rng)
                if self.writers and bi % 50 == 0:
                    for k in ("loss", "epip", "smooth", "consis"):
                        self.writers["train"].add_scalar(f"{v}/{k}", float(metrics[k]), bi)
                last = float(metrics["loss"])
            results[v] = last
        return results
