"""End-to-end validation of the two-stage MDN-SfM protocol on a synthetic
moving-object world with KNOWN ground truth.

The reference trains the mobile decoder against FROZEN flow/pose nets that
come from a previous training run (trainer.py:146-156 loads them from
log/v0/models/weights_0); this tool reproduces that whole workflow
self-contained, with no KITTI data and no pretrained weights:

  phase 1  train FlowNet with the (flag-gated) photometric loss on the
           synthetic world (`moving_object_batch`): background = camera
           translating along x (uniform horizontal flow), plus a square
           patch moving vertically. PoseNet is replaced by an ORACLE
           (pose_2 kernel zeroed, bias set so the head outputs the exact
           camera motion R=I, t=(1,0,0) — the same "frozen pretrained
           pose" role it has in the reference). Saved in the reference
           checkpoint layout.

  calib    epipolar percentile statistics with the trained flow + oracle
           pose over the synthetic train stream — the reference's
           `epipolar_statics` protocol (trainer.py:521-562, the derivation
           behind the magic --threshold 9.22) re-run on THIS world; the
           95th percentile becomes the T/TG truncation threshold.

  phase 2  load flow/pose frozen from the phase-1 folder (the v0 protocol),
           train a fresh MobileDecoder ONCE PER MODE in {SN, T, TG, DS, DC}
           (--modes). The patch violates the horizontal-epipolar-line
           constraint, the background satisfies it, so the learned mobile
           map must segment the patch in every mode. DS/DC consume an
           instance-union supervision source selected by --ds_providers
           (one training run per (mode, provider) pair):
             semantic_gt   the world's ground-truth patch mask (the
                           generate_mobile_gt --from_semantic_gt analog;
                           default, round-4 behavior)
             maskrcnn@N    the LIVE fused MaskRCNNProvider at
                           d2_infer_scale=N with the crafted brightness
                           detector (tests/fixtures.py) — requires
                           --bright_world so the patch is detectable.
                           N = 1024/height is the reference's shortest-
                           edge-1024 resolution; smaller N measures how
                           much metric the reduced-res live path loses
                           (round-4 VERDICT item 3; the mask-IoU
                           deviation itself is quantify_d2_scale.py)
           All DS/DC rows train with identity augmentation
           (cfg.disable_augment) so rows are comparable.

  eval     flow EPE vs ground truth (before/after phase 1) and, per mode,
           mask accuracy/precision/recall/F1/Dice vs the known patch mask —
           the same get_quantitative_results the evaluate_mix CLI scores the
           README table with (eval_utils.py:278-292) — plus the best-F1
           operating point from a threshold sweep.

Usage:
  python tools/synthetic_e2e.py                  # full demo (TPU-sized)
  python tools/synthetic_e2e.py --modes SN       # single-mode (round-3 form)
  python tools/synthetic_e2e.py --height 32 --width 64 --steps1 200 ...

Prints one JSON line with all metrics.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import numpy as np  # noqa: E402


def pose_oracle_variables(variables: dict) -> dict:
    """Overwrite the PoseNet head so it outputs the exact world camera
    motion: axisangle = 0, translation = (1, 0, 0). The last conv's kernel
    is zeroed and its bias set to the pre-scale values (out × 0.01 scale,
    models/pose_net.py), so the output is input-independent — a crafted
    'pretrained' pose net for the synthetic world."""
    import jax

    variables = jax.device_get(variables)
    head = variables["posenet"]["params"]["decoder"]["pose_2"]
    head["kernel"] = np.zeros_like(np.asarray(head["kernel"]))
    # mean over spatial then ×0.01: bias (6,) = [aa, t] pre-scale
    head["bias"] = np.array([0, 0, 0, 100.0, 0, 0], np.float32)
    return variables


_FWD_CACHE: dict = {}


def _forward(models, variables, colors):
    """Clean (un-augmented) forward of both reference frames at scale 0.
    Returns ({t: flow_px}, {t: mobile}, axisangle, translation).

    Jitted and cached per ``models`` object: the eager path dispatches
    every op through the ~10 ms tunnel RTT (hundreds of ops × 2 frames ≈
    MINUTES per call — measured as the mystery multi-minute stall before
    each run's first phase-1 print), and a fresh ``jax.jit`` per call
    would still retrace the three networks every time."""
    import jax
    import jax.numpy as jnp

    fwd = _FWD_CACHE.get(id(models))
    if fwd is None:

        @jax.jit
        def fwd(variables, tgt, ref):
            flows, feats = models.flow.apply(variables["flownet"], tgt, ref)
            aa, tr = models.pose.apply(variables["posenet"], tgt, ref)
            mob = models.mobile.apply(
                {"params": variables["mobile_decoder"]["params"]}, feats, aa, tr
            )
            return flows[0].astype(jnp.float32), mob[0].astype(jnp.float32)

        _FWD_CACHE[id(models)] = fwd

    flows_px, mobiles = {}, {}
    tgt = colors[(0, 0)]
    h, w = tgt.shape[1:3]
    for t in (-1, 1):
        flow0, mob0 = jax.device_get(fwd(variables, tgt, colors[(t, 0)]))
        flows_px[t] = np.asarray(flow0) * np.array([w, h], np.float32)
        mobiles[t] = np.asarray(mob0)
    return flows_px, mobiles


def run(args) -> dict:
    from mdn_sfm_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from mdn_sfm_tpu import checkpoints as ckpt
    from mdn_sfm_tpu import training as T
    from mdn_sfm_tpu.config import Config, Mode
    from mdn_sfm_tpu.data.augment import augment_batch
    from mdn_sfm_tpu.data.synthetic import moving_object_batch
    from mdn_sfm_tpu.metrics import compute_epe, get_quantitative_results

    h, w, bs = args.height, args.width, args.batch_size
    results: dict = {}

    # validate the run spec BEFORE the expensive phase-1 training: a typo'd
    # --ds_providers entry must not crash (or silently alias to the
    # semantic-GT path) after tens of minutes of flow training
    modes = [m.strip().upper() for m in args.modes.split(",") if m.strip()]
    ds_providers = [p.strip() for p in args.ds_providers.split(",") if p.strip()]
    for spec in ds_providers:
        if spec == "semantic_gt":
            continue
        if spec.startswith("maskrcnn@"):
            try:
                scale = int(spec.split("@", 1)[1])
            except ValueError:
                raise SystemExit(f"--ds_providers: bad scale in {spec!r}")
            if (h * scale) % 64 or (w * scale) % 64:
                raise SystemExit(
                    f"--ds_providers {spec!r}: inference shape "
                    f"{h * scale}x{w * scale} must be divisible by 64 (FPN)"
                )
            continue
        raise SystemExit(
            f"--ds_providers: unknown spec {spec!r} (use semantic_gt or "
            "maskrcnn@N)"
        )
    if any(m in ("DS", "DC") for m in modes) and any(
        p != "semantic_gt" for p in ds_providers
    ) and not args.bright_world:
        raise SystemExit(
            "--ds_providers maskrcnn@N needs --bright_world: the crafted "
            "brightness detector only sees bright-on-dark objects"
        )

    # world geometry knobs: the default obj_shift=3 px violation is only
    # ~1.3x this world's p95 threshold, which is BELOW TG's operating
    # envelope — the gauss division (/5..13.8) then puts the whole TG
    # supervision map under the sigmoid's non-triviality equilibrium
    # (m* ~ e/2alpha) and no training budget recovers it (measured round 5:
    # 6000 steps @ 3x lr -> all-zero map). KITTI's envelope has violations
    # >~5x the p95 (README threshold 9.22, object residuals tens of px);
    # --obj_shift 12 reproduces that ratio on this world.
    world_kw = dict(
        bg_shift=args.bg_shift, obj_shift=args.obj_shift,
        obj_size=args.obj_size or None, bright_object=args.bright_world,
    )

    # one fixed eval world + a stream of training worlds
    ev_colors, ev_K, ev_mask, ev_flows, times = moving_object_batch(
        args.eval_batch, h, w, seed=10_000, **world_kw
    )

    def make_batches(k: int, step: int, with_masks: bool = False):
        """(K, B, F, H, W, 3) uint8 + (K, B, 4, 4) — fresh worlds per step.
        ``with_masks``: also carry the worlds' GT patch masks as the
        instance-union supervision for DS/DC (the semantic-GT mask path)."""
        cs, ks, ms = [], [], []
        for i in range(k):
            c, K, m, _, _ = moving_object_batch(bs, h, w, seed=step + i, **world_kw)
            cs.append(c)
            ks.append(K)
            ms.append(m)
        out = {"colors_u8": jnp.asarray(np.stack(cs)), "K": jnp.asarray(np.stack(ks))}
        if with_masks:
            out["instance_mask"] = jnp.asarray(
                np.stack(ms).astype(np.float32)
            )
        return out

    def eval_colors(cfg):
        colors, _, _ = augment_batch(
            cfg, jnp.asarray(ev_colors), jnp.asarray(ev_K), jax.random.PRNGKey(0),
            train=False,
        )
        return colors

    def flow_epe(flows_px):
        """Mean EPE over both reference frames, plus background/object split
        for the +1 frame."""
        frame_of_t = {t: f for f, t in enumerate(times)}
        per, bg, obj = [], None, None
        for t, pred in flows_px.items():
            gt = ev_flows[:, frame_of_t[t]]
            ones = np.ones(gt.shape[:3], np.float32)
            per.append(
                np.mean([compute_epe(gt[b], pred[b], ones[b]) for b in range(len(gt))])
            )
            if t == 1:
                bg = np.mean(
                    [compute_epe(gt[b], pred[b], 1.0 - ev_mask[b]) for b in range(len(gt))]
                )
                obj = np.mean(
                    [compute_epe(gt[b], pred[b], ev_mask[b]) for b in range(len(gt))]
                )
        return float(np.mean(per)), float(bg), float(obj)

    # ---------------------------------------------------------------- phase 1
    cfg1 = Config(
        height=h,
        width=w,
        batch_size=bs,
        mode=Mode.T,  # threshold post-proc: no max-normalization divide
        threshold=9.22,
        fine_tune_flow_motion=True,
        disable_photoloss=False,
        no_ssim=True,
        w_p=1.0,
        w_e=0.0,  # phase 1 is photometric-only: no epipolar pressure on flow
        w_s=0.0,
        w_c=0.0,
        w_d2_sim=0.0,
        learning_rate=args.lr1,
        compute_dtype="bfloat16",
        donate_state=False,  # `variables` is read back after training
        log_dir=args.log_dir,
        v_save="e2e_v0",
    ).validate()

    models = T.build_models(cfg1)
    variables = T.init_variables(cfg1, models, jax.random.PRNGKey(args.seed))
    variables = jax.tree.map(jnp.asarray, pose_oracle_variables(variables))

    colors0 = eval_colors(cfg1)
    f0, _ = _forward(models, variables, colors0)
    results["epe_init"], _, _ = flow_epe(f0)

    tx1 = T.make_optimizer(cfg1, steps_per_epoch=max(args.steps1, 1))
    state, frozen = T.create_train_state(cfg1, models, variables, tx1)
    step1 = T.make_multi_train_step(cfg1, models, tx1)

    k = args.k_steps
    rng = jax.random.PRNGKey(args.seed + 1)
    loss1 = None
    for d in range(max(args.steps1 // k, 1)):
        batches = make_batches(k, step=d * k)
        state, frozen, metrics, _ = step1(state, frozen, batches, rng)
        loss1 = float(metrics["photo"])
        if args.verbose:
            print(f"phase1 dispatch {d}: photo={loss1:.4f}", file=sys.stderr)
        # photometric loss has a DEGENERATE optimum: push every warp sample
        # out of bounds and the valid-masked mean is exactly 0 with zero
        # gradient (measured round 5: a too-hard world diverges flow to
        # EPE ~1e7 px within 200 steps and every phase-2 row is garbage).
        # Fail fast instead of silently training 2 h on broken flow.
        if loss1 == 0.0 and d >= 1:
            raise SystemExit(
                f"phase-1 photometric loss hit exactly 0 at dispatch {d}: "
                "flow warped every sample out of bounds (degenerate optimum)."
                " The world is too hard for this lr/budget — reduce "
                "--obj_shift, raise texture contrast, or lower --lr1."
            )
    results["photo_final"] = loss1

    # phase-1 weights back into a full variables tree, saved in the reference
    # layout → phase 2 consumes them exactly like the reference's log/v0
    trained = dict(jax.device_get(variables))
    trained["flownet"] = dict(trained["flownet"])
    trained["flownet"]["params"] = jax.device_get(state.params["flownet"])
    trained["posenet"] = dict(trained["posenet"])
    trained["posenet"]["params"] = jax.device_get(state.params["posenet"])
    folder = ckpt.weights_folder(args.log_dir, "e2e_v0", 0)
    ckpt.save_checkpoint(folder, trained, models_to_save=("flownet", "posenet"))

    f1_flows, _ = _forward(models, {**trained, "mobile_decoder": variables["mobile_decoder"]}, colors0)
    results["epe_trained"], results["epe_bg"], results["epe_obj"] = flow_epe(f1_flows)

    # ------------------------------------------------- threshold calibration
    # the reference's epipolar_statics protocol (trainer.py:521-562): epipolar
    # residual quantiles with the TRAINED frozen flow + pose over the train
    # stream; the 95th percentile is the T/TG truncation threshold (the same
    # derivation that produced the published --threshold 9.22 on KITTI)
    from mdn_sfm_tpu.geometry import (
        epipolar_residual,
        scale_factor,
        transformation_from_parameters,
    )

    @jax.jit
    def residual_quantiles(batch):
        from mdn_sfm_tpu.data.augment import augment_batch as aug

        colors, inv_Ks, _ = aug(cfg1, batch["colors_u8"], batch["K"],
                                jax.random.PRNGKey(0), train=False)
        tgt = colors[(0, 0)]
        qs = []
        for t in (-1, 1):
            flows, _ = models.flow.apply(trained["flownet"], tgt, colors[(t, 0)])
            aa, tr = models.pose.apply(trained["posenet"], tgt, colors[(t, 0)])
            cam = transformation_from_parameters(aa, tr)
            f_px = flows[0] * scale_factor(h, w)
            e = jnp.abs(epipolar_residual(f_px, inv_Ks[0], cam[:, :3, :3], cam[:, :3, 3]))
            qs.append(jnp.quantile(e.reshape(e.shape[0], -1),
                                   jnp.linspace(0.0, 1.0, 100), axis=1))
        return jnp.stack(qs)

    all_q = [np.asarray(residual_quantiles(
        {k2: v[0] for k2, v in make_batches(1, step=50_000 + i).items()}
    )) for i in range(8)]
    calibrated = float(np.percentile(np.stack(all_q).reshape(-1), 95))
    results["calibrated_threshold_p95"] = round(calibrated, 4)

    # ---------------------------------------------------- phase 2 (per mode)
    # crafted brightness Mask R-CNN for the maskrcnn@N provider rows: its
    # features are local mean brightness at EVERY resolution, so the rows
    # measure the PIPELINE's resolution sensitivity, not feature noise
    # (same device as tools/quantify_d2_scale.py)
    need_detector = any(m in ("DS", "DC") for m in modes) and any(
        p.startswith("maskrcnn") for p in ds_providers
    )
    crafted = None
    providers_cache: dict = {}
    if need_detector:
        sys.path.insert(0, os.path.join(_ROOT, "tests"))
        import mdn_sfm_tpu.masks.maskrcnn as M
        from fixtures import craft_brightness_detector

        shapes = jax.eval_shape(
            M.MaskRCNN(max_det=8).init, jax.random.PRNGKey(0),
            jnp.zeros((64, 64, 3)), jnp.array(64.0), jnp.array(64.0),
        )
        crafted = jax.tree.map(jnp.asarray, craft_brightness_detector(shapes))

    def get_provider(scale: int):
        if scale not in providers_cache:
            import mdn_sfm_tpu.masks.maskrcnn as M

            cfgp = Config(
                height=h, width=w, mode=Mode.DS, mask_provider="maskrcnn",
                d2_max_instances=8, d2_infer_scale=scale,
                d2_allow_random_weights=True, log_dir=args.log_dir,
            ).validate()
            prov = M.MaskRCNNProvider(cfgp)
            prov.variables = crafted
            providers_cache[scale] = prov
        return providers_cache[scale]

    jobs: list = []
    for mode_name in modes:
        if mode_name in ("DS", "DC"):
            jobs += [(mode_name, p) for p in ds_providers]
        else:
            jobs.append((mode_name, None))

    per_mode: dict = {}
    for mode_name, provider_spec in jobs:
        is_dsdc = mode_name in ("DS", "DC")
        fused_prov = None
        if is_dsdc and provider_spec.startswith("maskrcnn"):
            fused_prov = get_provider(int(provider_spec.split("@")[1]))
        # semantic_gt rows carry the world GT masks in the batch; maskrcnn@N
        # rows compute masks inside the fused step
        needs_masks = is_dsdc and fused_prov is None
        # TG's gauss division scales the supervision map by 1/dist²
        # (dist ∈ [5, 13.8] on this world ⇒ 25-190× weaker signal than T);
        # at the uniform budget the decoder barely moves within steps2
        # (the reference trains TG ~200k steps on KITTI where this is
        # invisible). Compensate with a larger phase-2 budget: more steps
        # (the honest lever) plus a mild lr boost (Adam's normalization
        # absorbs most of the scale, so lr alone cannot compensate).
        steps2 = args.steps2 * (args.tg_steps_mult if mode_name == "TG" else 1)
        lr2 = args.lr2 * (args.tg_lr_mult if mode_name == "TG" else 1.0)
        cfg2 = Config(
            height=h,
            width=w,
            batch_size=bs,
            mode=Mode(mode_name),
            alpha=0.55,
            w_e=1.0,
            w_s=0.1,
            w_c=0.5,
            # DC adds the BCE similarity term at the reference weight
            # (options.py:80-83); DS stays pure mask×map (PARITY decision)
            w_d2_sim=0.05 if mode_name == "DC" else 0.0,
            threshold=calibrated,
            # TG keeps the reference's RAW sigmas (30, 120 — utils.py:355-379)
            # even though the world is smaller than 128×416: the formula's
            # amplitude factor is 1/(2πσ1σ2), so scaling sigmas spatially
            # inflates the periphery-vs-center suppression (measured: 12×
            # instead of the reference's 2.8× at this world's size), the TG
            # supervision map collapses toward zero and the decoder learns a
            # flat map. Raw sigmas keep the reference's dynamic range; the
            # gauss prior just covers relatively more of the small image.
            gauss_sigma1=30.0,
            gauss_sigma2=120.0,
            # precomputed GT masks can't follow on-device flip/zoom-crop;
            # identity augmentation also keeps the DS/DC provider rows
            # comparable to the semantic-GT rows
            disable_augment=is_dsdc,
            learning_rate=lr2,
            compute_dtype="bfloat16",
            donate_state=False,
            log_dir=args.log_dir,
            load_weights_folder=folder,
            models_to_load=("flownet", "posenet"),
            **(
                dict(mask_provider="maskrcnn",
                     d2_infer_scale=int(provider_spec.split("@")[1]),
                     d2_max_instances=8, d2_allow_random_weights=True)
                if fused_prov is not None else {}
            ),
        ).validate()

        models2 = T.build_models(cfg2)
        variables2 = T.init_variables(cfg2, models2, jax.random.PRNGKey(args.seed + 2))
        variables2, _, _ = ckpt.load_checkpoint(
            folder, variables2, models_to_load=("flownet", "posenet")
        )

        tx2 = T.make_optimizer(cfg2, steps_per_epoch=max(steps2, 1))
        state2, frozen2 = T.create_train_state(cfg2, models2, variables2, tx2)
        mask_fn = None
        if fused_prov is not None:
            frozen2 = dict(frozen2)
            frozen2["maskrcnn"] = fused_prov.variables
            mask_fn = fused_prov.union_fn
        step2 = T.make_multi_train_step(cfg2, models2, tx2, mask_fn=mask_fn)

        tag = mode_name if provider_spec in (None, "semantic_gt") \
            else f"{mode_name}@{provider_spec}"
        rng2 = jax.random.PRNGKey(args.seed + 3)
        loss2 = None
        for d in range(max(steps2 // k, 1)):
            batches = make_batches(k, step=100_000 + d * k, with_masks=needs_masks)
            state2, frozen2, metrics, _ = step2(state2, frozen2, batches, rng2)
            loss2 = float(metrics["loss"])
            if args.verbose:
                print(f"[{tag}] phase2 dispatch {d}: loss={loss2:.4f}",
                      file=sys.stderr)

        final_vars = dict(variables2)
        final_vars["mobile_decoder"] = {
            "params": jax.device_get(state2.params["mobile_decoder"])
        }
        _, mobiles = _forward(models2, final_vars, eval_colors(cfg2))
        mobile = np.minimum(mobiles[-1], mobiles[1])[..., 0]  # min-fused, (B, H, W)

        # record the EFFECTIVE phase-2 budget: TG rows carry a compensated
        # steps/lr multiplier (ADVICE r4 — rows are otherwise misread as
        # budget-equivalent)
        row: dict = {"loss_final": loss2, "steps2": steps2, "lr2": lr2}
        if provider_spec is not None:
            row["provider"] = provider_spec
        if fused_prov is not None:
            # supervision quality on the eval worlds: how well do the live
            # provider's union masks themselves match the GT patch?
            sup = np.asarray(fused_prov.union_masks_from_images(
                np.asarray(ev_colors[:, 0]), h, w)) > 0.5
            gt_b = ev_mask > 0
            inter = (sup & gt_b).sum()
            union = (sup | gt_b).sum()
            row["sup_mask_iou"] = float(inter / max(union, 1))
        row["sep"] = float(mobile[ev_mask > 0].mean() - mobile[ev_mask == 0].mean())
        acc, prec, rec, f1s, dice = get_quantitative_results(
            (mobile >= args.binary_threshold).astype(np.float32), ev_mask
        )
        row.update(accuracy=acc, precision=prec, recall=rec, f1=f1s, dice=dice,
                   binary_threshold=args.binary_threshold)
        # per-mode operating points differ (reference README.md:27-33 uses
        # 0.18-0.48); sweep like the README harness would, report the best
        best = (-1.0, None)
        # floor at 0.01: TG's gauss-divided maps legitimately operate well
        # below 0.05 (the reference's own README thresholds go down to 0.18
        # at KITTI scale; this world's maps are smaller still)
        for thr in np.arange(0.01, 0.95, 0.01):
            _, _, _, f1t, _ = get_quantitative_results(
                (mobile >= thr).astype(np.float32), ev_mask
            )
            if np.isfinite(f1t) and f1t > best[0]:
                best = (f1t, float(thr))
        row["best_f1"], row["best_f1_threshold"] = best
        per_mode[tag] = {kk: (round(vv, 4) if isinstance(vv, float) else vv)
                         for kk, vv in row.items()}

    results["modes"] = per_mode
    # round-3 compatible top-level fields = first row
    if per_mode:
        first = per_mode[next(iter(per_mode))]
        results.update({kk: first[kk] for kk in
                        ("sep", "accuracy", "precision", "recall", "f1", "dice",
                         "best_f1", "best_f1_threshold")})
        results["loss2_final"] = first["loss_final"]
    return results


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--height", type=int, default=64)
    p.add_argument("--width", type=int, default=128)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--eval_batch", type=int, default=8)
    p.add_argument("--steps1", type=int, default=2000)
    p.add_argument("--steps2", type=int, default=1000)
    p.add_argument("--k_steps", type=int, default=50)
    p.add_argument("--lr1", type=float, default=3e-4)
    p.add_argument("--lr2", type=float, default=1e-4)
    p.add_argument("--tg_steps_mult", type=int, default=6,
                   help="phase-2 step multiplier for TG (gauss-scaling compensation)")
    p.add_argument("--tg_lr_mult", type=float, default=3.0,
                   help="phase-2 lr multiplier for TG")
    p.add_argument("--binary_threshold", type=float, default=0.5)
    p.add_argument("--modes", default="SN,T,TG,DS,DC",
                   help="comma-separated phase-2 training modes")
    p.add_argument("--ds_providers", default="semantic_gt",
                   help="comma-separated DS/DC supervision sources: "
                        "semantic_gt and/or maskrcnn@N (live fused provider "
                        "at d2_infer_scale=N; needs --bright_world)")
    p.add_argument("--bg_shift", type=int, default=2,
                   help="background (camera) horizontal flow px/frame")
    p.add_argument("--obj_shift", type=int, default=3,
                   help="object vertical flow px/frame = epipolar violation "
                        "magnitude; >=5x the calibrated p95 threshold is "
                        "TG's operating envelope (see world_kw comment)")
    p.add_argument("--obj_size", type=int, default=0,
                   help="patch side px (0 = height//3). Keep the patch area "
                        "under ~5%% of the image or the p95 calibration "
                        "lands ON the object residuals and T/TG weaken")
    p.add_argument("--bright_world", action="store_true",
                   help="dark background + bright patch (detectable by the "
                        "crafted brightness Mask R-CNN)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log_dir", default="/tmp/mdn_e2e_log")
    p.add_argument("--verbose", action="store_true")
    args = p.parse_args()
    print(json.dumps(run(args)))


if __name__ == "__main__":
    main()
