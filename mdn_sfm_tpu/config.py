"""Configuration for MDN-SfM TPU.

One dataclass-based config with train/eval profiles, replacing the reference's
two divergent argparse classes (reference: options.py:12-236, options_eval.py:10-327).
The training mode — which in the reference is selected *by editing code*
(reference: README.md:5, loss_functions.py:124-133) — is a first-class enum here.

Public flag names are kept for CLI parity (``--data_path``, ``--w_e`` ...), see
:func:`add_train_args` / :func:`add_eval_args`.
"""

from __future__ import annotations

import argparse
import dataclasses
import enum
import json
import os
import sys
from dataclasses import dataclass, field
from typing import Sequence

# one-shot guard for the DS/DC live-provider fidelity warning in validate()
_WARNED_D2_SCALE = False


class Mode(str, enum.Enum):
    """Epipolar-map post-processing / supervision mode (reference: README.md:5).

    SN — normalized + squared epipolar map          (loss_utils.py:92-99)
    T  — truncated (threshold-divided, squared)     (loss_utils.py:81-89)
    TG — truncated + gaussian distance-weighted     (loss_utils.py:81-89 + utils.py:355-379)
    DS — instance-mask × epipolar map               (loss_utils.py:127-138)
    DC — SN post-processing + BCE similarity to the instance-union mask
         (loss_utils.py:72-78; loss_functions.py:132-133). The reference's
         checked-in head is effectively SN + DC simultaneously
         (loss_functions.py:124 and :132-133 both active); set
         ``w_d2_sim > 0`` with mode=SN to reproduce it exactly.
    """

    SN = "SN"
    T = "T"
    TG = "TG"
    DS = "DS"
    DC = "DC"


@dataclass
class Config:
    """Unified train/eval configuration.

    Field names mirror the reference argparse destinations where one exists
    (reference: options.py:12-236), plus TPU-specific knobs.
    """

    # PATHS (options.py:17-32)
    data_path: str = "kitti/raw_data"
    data_root: str = "kitti"
    log_dir: str = "log"
    other_files_path: str = "files"

    # TRAINING (options.py:35-109)
    split: str = "eigen_zhou"
    num_layers: int = 18
    use_elu: bool = True
    dataset: str = "kitti"
    png: bool = True
    height: int = 128
    width: int = 416
    w_p: float = 1.0          # photometric loss weight (dead in reference default head)
    w_e: float = 1.0          # epipolar loss weight
    w_s: float = 1.0          # smoothness loss weight
    w_c: float = 0.5          # consistency loss weight
    w_d2_sim: float = 0.05    # instance-mask BCE similarity weight (DC term)
    ds_similarity_term: bool = False  # DS also adds the w_d2_sim BCE term.
    # The reference head is ambiguous: enabling DS (uncommenting
    # post_process_epipolar_2 at loss_functions.py:125) leaves the
    # unconditional BCE add at :132-133 live, so reference-DS plausibly
    # trained with BCE too. Default off = pure mask×map (the README treats
    # the modes as separate experiments); set True for the alternative
    # reading without editing code.
    threshold: float = 9.22   # 95th-percentile epipolar threshold (options.py:84-87)
    alpha: float = 0.55       # non-trivial term weight (options.py:88-91)
    scales: tuple[int, ...] = (0, 1, 2, 3)
    frame_ids: tuple[int, ...] = (0, -1, 1)
    seed: int = 42            # CONSUMED here (the reference's --seed is dead, options.py:102-105)
    clip_grad: float = 1.0
    skip_nonfinite_updates: bool = False  # optax.apply_if_finite around the
    # optimizer: NaN/Inf-gradient steps become no-ops instead of poisoning
    # params — production counterpart of the reference's anomaly detection
    # (trainer.py:234), which only crashes after the fact

    # MODE — first-class here; the reference hardcodes SN(+DC) (loss_functions.py:124,132-133)
    mode: Mode = Mode.SN
    # gauss weight params for TG (utils.py:355-379)
    gauss_sigma1: float = 30.0
    gauss_sigma2: float = 120.0

    # OPTIMIZATION (options.py:112-142)
    fine_tune_flow_motion: bool = False
    batch_size: int = 4
    learning_rate: float = 1e-4
    num_epochs: int = 20
    momentum: float = 0.9     # adam beta1
    beta: float = 0.999       # adam beta2
    weight_decay: float = 0.0
    scheduler_step_size: float = 0.5
    # The reference steps CosineAnnealingLR(T_max=0.5) with fractional epochs,
    # making LR oscillate 1→0→1 every epoch (trainer.py:87,238 + options.py:139-142).
    # Default here is a proper cosine over total steps; set legacy_lr_schedule
    # to reproduce the oscillation.
    legacy_lr_schedule: bool = False

    # ABLATION (options.py:145-169)
    no_ssim: bool = True
    weights_init: str = "scratch"
    pose_model_input: str = "pairs"
    disable_photoloss: bool = True   # photometric term is disconnected in the reference head (loss_functions.py:48-50)
    disable_consisloss: bool = False
    disable_min: bool = False
    disable_smoothloss: bool = False
    disable_augment: bool = False    # identity augmentation (no flip/zoom-crop;
    # normalization/pyramid only). No reference flag; needed whenever
    # PRECOMPUTED instance masks supervise DS/DC — augmentation happens
    # on-device inside the step, so host-side masks can't follow the
    # flip/crop (the fused live provider doesn't have this problem)

    # SYSTEM (options.py:172-178)
    num_workers: int = 4
    limit_train_samples: int = 0  # >0: truncate the train set (smoke runs /
                                  # quick experiments; no reference analog)
    cache_decoded: str = ""  # directory for the decoded-sample disk cache
    # (data/cache.py): epoch 1 decodes and memoizes, epoch 2+ reads memmaps.
    # Sound because augmentation is on-device — the host output per item is
    # deterministic. ~1.1 MB/triplet at 192x640 (44 GB for eigen_zhou); the
    # reference instead burns 12 DataLoader worker processes every epoch
    # (options.py:175-178). No reference flag.

    # LOADING (options.py:181-196)
    models_to_load: tuple[str, ...] = ("flownet", "posenet", "mobile_decoder")
    load_adam: bool = False
    v_load: str = "v0"
    idx_load: int = 0

    # LOGGING (options.py:199-210)
    log_frequency: int = 100
    save_frequency: int = 1000
    v_save: str = "v"

    # EVALUATION (options.py:213-232 + options_eval.py)
    data_eval_dir: str = "kitti/data_semantics"
    idx_eval: int = 0
    raw_dataset_dir: str = "kitti"
    load_weights_folder: str = "log/v0/models/weights_0"
    version: str = "v3"        # mobile-decoder version to load at eval (options_eval.py:263-266)
    idx: int = 14              # mobile-decoder weights index (options_eval.py:267-270)
    eval_out_dir: str = "output/prediction"
    gt_mask_path: str = "output/mobile_objects_ground_truth"
    eval_name: str = "mobile_masks"
    sequence_length: int = 3
    save_pred_masks: bool = False
    save_pred_motions: bool = False
    save_pred_poses: bool = False
    pred_errors: bool = False
    binary_threshold: float = 0.5   # mobile-mask binarization (per-mode values: README.md:27-33)
    eval_num_samples: int = 200     # KITTI-2015 eval set size (eval_utils.py:27)
    eval_batch_size: int = 8        # samples per jitted eval dispatch (the
    # reference evaluates one sample at a time, eval_utils.py; batching is a
    # TPU-side throughput win with identical per-sample results — the last
    # chunk pads by repetition so jitted shapes stay static)

    # INSTANCE MASKS — how the DS/DC modes get instance-union masks.
    #   "none":        all-zero masks (pure self-supervised SN/T/TG training)
    #   "precomputed": load per-sample mask PNGs from mask_dir
    #   "maskrcnn":    on-device Mask R-CNN inference (replaces frozen detectron2,
    #                  trainer.py:165-179)
    mask_provider: str = "none"
    mask_dir: str = "output/prediction/detectron2/pred_masks"
    d2_score_thresh: float = 0.3    # cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST (trainer.py:175)
    d2_max_instances: int = 32      # static padding for TPU shapes
    d2_infer_scale: int = 2         # live-provider inference res = scale × training res
    # (deviation from the reference's shortest-edge-1024 resize — see
    #  masks/maskrcnn.py::MaskRCNNProvider)
    d2_allow_random_weights: bool = False  # let mask_provider=maskrcnn run with
    # randomly initialized weights when log_dir/model_final_detectron2.pth is
    # absent. Default off: training DS/DC against garbage masks is silent data
    # corruption, so the provider fails fast instead (the reference crashes on
    # the missing .pth too, trainer.py:170-179). Tests/tooling opt in.
    d2_fuse_step: bool = True       # fuse live Mask R-CNN inference INTO the jitted
    # train step (its variables ride the frozen tree) — one dispatch per step
    # instead of provider-dispatch + step-dispatch, and K-step scan dispatch
    # works in DS/DC mode. False = separate host-driven provider call per batch.

    # TPU-NATIVE knobs (no reference equivalent)
    compute_dtype: str = "bfloat16"   # conv compute dtype; params and losses stay fp32
    use_pallas_epipolar: bool = True  # Pallas kernel for the epipolar map when
    # it carries no gradient (flow/pose frozen); jnp fallback otherwise
    num_data_shards: int = 0          # 0 = use all visible devices on axis 'data'
    bn_frozen_eval: bool = True       # run frozen flow/pose BatchNorm with running stats.
    # (The reference calls set_train() on frozen models too, so their BN uses
    #  batch stats during training — trainer.py:201-205,226. Set False to mimic.)
    donate_state: bool = True
    remat: bool = False               # rematerialize the stacked-frame forward
    # (jax.checkpoint): backward recomputes the flow/pose/mobile forward
    # instead of keeping its activations in HBM — trades ~1 extra forward of
    # FLOPs for activation memory, raising the max per-chip batch (the
    # gradient math is identical; tested bitwise). Worth it only when HBM-
    # bound: large batch/resolution or fine_tune_flow_motion.
    accum_steps: int = 1              # microbatch gradient accumulation: split
    # the per-device batch into A microbatches, lax.scan the forward/backward
    # over them accumulating gradients, apply ONE optimizer update on the
    # average. Only one microbatch's activations are live at a time, so peak
    # HBM drops ~A× on the activation side — the lever (with --remat) for
    # effective batches past per-chip HBM. Per-sample augmentation draws are
    # position-stable, so the loss/grad math equals the full-batch step up to
    # f32 summation order (tested: loss rel ≤1e-6, post-Adam params ≤2e-5).
    # Per-device batch must divide by A.
    resume: str = ""                  # "auto" = continue v_save from its latest
    # weights_{idx} (params + Adam + step) — preemption-safe restart for
    # production runs. The reference can only resume via manual
    # --v_load/--idx_load (options.py:186-196); "" keeps that behavior.
    profile_dir: str = ""             # if set, jax.profiler traces are written here
    steps_per_dispatch: int = 1       # optimizer steps fused per device dispatch
    # (lax.scan; amortizes host→device latency — essential on tunnel-attached
    #  chips; logging granularity becomes one record per dispatch)

    # ------------------------------------------------------------------ utils

    @property
    def num_scales(self) -> int:
        return len(self.scales)

    @property
    def ref_frame_ids(self) -> tuple[int, ...]:
        """Reference frames (frame_ids without the target 0)."""
        return tuple(i for i in self.frame_ids if i != 0)

    def validate(self) -> "Config":
        # reference runtime asserts (trainer.py:38-40)
        assert self.height % 32 == 0, "'height' must be a multiple of 32"
        assert self.width % 32 == 0, "'width' must be a multiple of 32"
        assert self.frame_ids[0] == 0, "frame_ids must start with 0"
        assert self.mode in Mode
        assert self.accum_steps >= 1, "'accum_steps' must be >= 1"
        # DS/DC + live provider below the reference's shortest-edge-1024
        # inference res trains on measurably different union masks
        # (union-IoU 0.79 @ scale 2, 0.56 when max_det saturates —
        # tools/quantify_d2_scale.py; PARITY.md "d2 inference resolution").
        # Warn once so a README-comparison run is never silently off-spec.
        ref_equiv_scale = 1024 / min(self.height, self.width)
        if (
            self.mode in (Mode.DS, Mode.DC)
            and self.mask_provider == "maskrcnn"
            and self.d2_infer_scale < ref_equiv_scale
        ):
            global _WARNED_D2_SCALE
            if not _WARNED_D2_SCALE:
                _WARNED_D2_SCALE = True
                print(
                    f"WARNING: mode={self.mode.value} with the live maskrcnn provider at "
                    f"d2_infer_scale={self.d2_infer_scale} (< reference-equivalent "
                    f"{ref_equiv_scale:.1f} for {self.height}x{self.width}) trains on union "
                    "masks that deviate from the reference's 1024-edge pipeline (measured "
                    "union-IoU 0.79 @ scale 2 — tools/quantify_d2_scale.py). For strict "
                    "DS/DC reproduction precompute 1024-edge masks with "
                    "tools/precompute_masks.py and use mask_provider=precomputed.",
                    file=sys.stderr,
                )
        return self

    def to_json(self) -> str:
        d = dataclasses.asdict(self)
        d["mode"] = self.mode.value
        return json.dumps(d, indent=2)

    def save(self, path: str) -> None:
        """Dump options like the reference's opt.json (trainer.py:97-106)."""
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            f.write(self.to_json())

    @classmethod
    def load(cls, path: str) -> "Config":
        with open(path) as f:
            d = json.load(f)
        known = {f.name for f in dataclasses.fields(cls)}
        d = {k: v for k, v in d.items() if k in known}
        if "mode" in d:
            d["mode"] = Mode(d["mode"])
        for k in ("scales", "frame_ids", "models_to_load"):
            if k in d:
                d[k] = tuple(d[k])
        return cls(**d).validate()


# --------------------------------------------------------------------- CLI

_BOOL_FLAGS_TRAIN = [
    # action="store_true" flags from options.py
    "fine_tune_flow_motion", "no_ssim", "disable_photoloss", "disable_consisloss",
    "disable_min", "disable_smoothloss", "load_adam", "legacy_lr_schedule",
    "skip_nonfinite_updates", "remat",
]

_BOOL_FLAGS_EVAL = [
    "save_pred_masks", "save_pred_motions", "save_pred_poses", "pred_errors",
]


def _add_fields(parser: argparse.ArgumentParser, names: Sequence[str], bool_flags: Sequence[str]) -> None:
    default = Config()
    for name in names:
        f = {f.name: f for f in dataclasses.fields(Config)}[name]
        cur = getattr(default, name)
        if name in bool_flags:
            parser.add_argument(f"--{name}", action="store_true", default=cur)
        elif f.type in ("tuple[int, ...]",) or isinstance(cur, tuple) and cur and isinstance(cur[0], int):
            parser.add_argument(f"--{name}", nargs="+", type=int, default=list(cur))
        elif isinstance(cur, tuple):
            parser.add_argument(f"--{name}", nargs="+", type=str, default=list(cur))
        elif isinstance(cur, Mode):
            parser.add_argument(f"--{name}", type=str, choices=[m.value for m in Mode], default=cur.value)
        elif isinstance(cur, bool):
            parser.add_argument(f"--{name}", type=lambda s: s.lower() in ("1", "true", "yes"), default=cur)
        else:
            parser.add_argument(f"--{name}", type=type(cur), default=cur)


_TRAIN_FIELDS = [
    "data_path", "data_root", "log_dir", "other_files_path",
    "split", "num_layers", "use_elu", "dataset", "png", "height", "width",
    "w_p", "w_e", "w_s", "w_c", "w_d2_sim", "ds_similarity_term", "threshold", "alpha",
    "scales", "frame_ids", "seed", "clip_grad", "skip_nonfinite_updates", "mode",
    "gauss_sigma1", "gauss_sigma2",
    "fine_tune_flow_motion", "batch_size", "learning_rate", "num_epochs",
    "momentum", "beta", "weight_decay", "scheduler_step_size", "legacy_lr_schedule",
    "no_ssim", "weights_init", "pose_model_input",
    "disable_photoloss", "disable_consisloss", "disable_min", "disable_smoothloss",
    "disable_augment",
    "num_workers", "limit_train_samples", "cache_decoded",
    "models_to_load", "load_adam", "v_load", "idx_load", "resume",
    "log_frequency", "save_frequency", "v_save",
    "mask_provider", "mask_dir", "d2_score_thresh", "d2_max_instances",
    "d2_infer_scale", "d2_fuse_step", "d2_allow_random_weights",
    "compute_dtype", "num_data_shards", "bn_frozen_eval", "profile_dir",
    "steps_per_dispatch", "remat", "accum_steps",
]

_EVAL_FIELDS = [
    "data_root", "log_dir", "raw_dataset_dir", "height", "width",
    "num_layers", "threshold", "alpha", "scales", "batch_size", "num_workers",
    "weights_init", "mode", "gauss_sigma1", "gauss_sigma2", "w_d2_sim",
    "load_weights_folder", "version", "idx", "eval_name", "eval_out_dir",
    "gt_mask_path", "sequence_length", "binary_threshold", "eval_num_samples",
    "eval_batch_size",
    "save_pred_masks", "save_pred_motions", "save_pred_poses", "pred_errors",
    "mask_provider", "mask_dir", "d2_score_thresh", "d2_max_instances",
    "d2_infer_scale", "d2_allow_random_weights", "compute_dtype",
]


def add_train_args(parser: argparse.ArgumentParser) -> None:
    """CLI-parity train options (reference: options.py:12-236)."""
    _add_fields(parser, _TRAIN_FIELDS, _BOOL_FLAGS_TRAIN)


def add_eval_args(parser: argparse.ArgumentParser) -> None:
    """CLI-parity eval options (reference: options_eval.py:10-327).

    Note the reference's eval defaults diverge from its train defaults
    (threshold 9.22 vs 0.8625, alpha 0.55 vs 0.1 — options.py:84-91 vs
    options_eval.py:55-62); we keep ONE set of defaults and expose the flags.
    """
    _add_fields(parser, _EVAL_FIELDS, _BOOL_FLAGS_EVAL)


def from_args(args: argparse.Namespace) -> Config:
    known = {f.name for f in dataclasses.fields(Config)}
    d = {k: v for k, v in vars(args).items() if k in known}
    if "mode" in d and not isinstance(d["mode"], Mode):
        d["mode"] = Mode(d["mode"])
    for k in ("scales", "frame_ids", "models_to_load"):
        if k in d and d[k] is not None:
            d[k] = tuple(d[k])
    return Config(**d).validate()


def parse_train_config(argv: Sequence[str] | None = None) -> Config:
    parser = argparse.ArgumentParser(description="MDN-SfM TPU train options")
    add_train_args(parser)
    return from_args(parser.parse_args(argv))


def parse_eval_config(argv: Sequence[str] | None = None) -> Config:
    parser = argparse.ArgumentParser(description="MDN-SfM TPU eval options")
    add_eval_args(parser)
    return from_args(parser.parse_args(argv))
