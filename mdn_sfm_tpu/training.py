"""Functional training core: model bundle, optimizer, and the jitted
data-parallel train step.

This is the TPU-native replacement for the reference's imperative
``Trainer.process_batch`` + backward + Adam step (trainer.py:223-287): one
pure function, traced once, fused by XLA, sharded over Mesh('data') — the
gradient all-reduce over ICI is emitted by SPMD partitioning (SURVEY.md §5).

Hot path per step (reference call stack §3.1):
  on-device augment → for each reference frame: flownet + posenet +
  mobile-decoder forward → epipolar/smooth/consistency losses over 4 scales
  → grads on the mobile decoder (and flow/pose iff fine_tune_flow_motion) →
  global-norm clip → Adam → cosine LR.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from .config import Config
from .data.augment import augment_batch
from .geometry import transformation_from_parameters
from .losses import LossAux, compute_losses
from .models import FlowNet, MobileDecoder, PoseNet

Array = jax.Array


class ModelBundle(NamedTuple):
    """Static module definitions (reference: trainer.py:139-143)."""

    flow: FlowNet
    pose: PoseNet
    mobile: MobileDecoder


class TrainState(NamedTuple):
    """Trainable state. ``params`` always holds 'mobile_decoder' and, when
    fine-tuning, 'flownet'/'posenet' too (reference: trainer.py:182-189)."""

    params: dict
    opt_state: Any
    step: Array


def _dtype(cfg: Config):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[cfg.compute_dtype]


def build_models(cfg: Config) -> ModelBundle:
    dt = _dtype(cfg)
    return ModelBundle(
        flow=FlowNet(
            num_layers=18,  # FlowNet_v1 hardcodes resnet18 (flow_net_v1.py:90)
            use_elu=cfg.use_elu,
            scales=tuple(cfg.scales),
            dtype=dt,
        ),
        pose=PoseNet(num_layers=cfg.num_layers, use_elu=False, dtype=dt),
        mobile=MobileDecoder(scales=tuple(cfg.scales), use_elu=cfg.use_elu, dtype=dt),
    )


def init_variables(cfg: Config, models: ModelBundle, rng: Array) -> dict:
    """Initialize all model variables (params + batch_stats) with dummy data.

    Returns {'flownet': vars, 'posenet': vars, 'mobile_decoder': vars}.
    """
    k1, k2, k3 = jax.random.split(rng, 3)
    img = jnp.zeros((1, cfg.height, cfg.width, 3), jnp.float32)
    flow_vars = models.flow.init(k1, img, img)
    pose_vars = models.pose.init(k2, img, img)
    _, feats = models.flow.apply(flow_vars, img, img)
    aa = jnp.zeros((1, 1, 1, 3))
    mobile_vars = models.mobile.init(k3, feats, aa, aa)
    return {"flownet": flow_vars, "posenet": pose_vars, "mobile_decoder": mobile_vars}


def split_trainable(cfg: Config, variables: dict) -> tuple[dict, dict]:
    """Split variables into (trainable params, frozen rest).

    Default: only the mobile decoder trains; flow/pose are frozen pretrained
    nets (reference: trainer.py:182-189). With fine_tune_flow_motion their
    params join the optimizer (batch stats stay frozen running averages).
    """
    trainable = {"mobile_decoder": variables["mobile_decoder"]["params"]}
    frozen = {
        "flownet": dict(variables["flownet"]),
        "posenet": dict(variables["posenet"]),
    }
    if cfg.fine_tune_flow_motion:
        trainable["flownet"] = frozen["flownet"].pop("params")
        trainable["posenet"] = frozen["posenet"].pop("params")
    return trainable, frozen


def lr_schedule(cfg: Config, steps_per_epoch: int) -> optax.Schedule:
    """Cosine LR.

    Default: single cosine decay over the full run. Legacy: the reference's
    CosineAnnealingLR(T_max=0.5) stepped with fractional epochs oscillates
    η₀→0→η₀ every epoch (trainer.py:87,238; options.py:139-142) —
    η(t) = η₀·(1+cos(2π·t))/2 with t in epochs.
    """
    if steps_per_epoch <= 0:
        return optax.constant_schedule(cfg.learning_rate)
    if cfg.legacy_lr_schedule:
        def sched(step):
            t = step / steps_per_epoch
            return cfg.learning_rate * 0.5 * (1.0 + jnp.cos(2.0 * jnp.pi * t))
        return sched
    total = steps_per_epoch * cfg.num_epochs
    return optax.cosine_decay_schedule(cfg.learning_rate, decay_steps=max(total, 1))


def make_optimizer(cfg: Config, steps_per_epoch: int) -> optax.GradientTransformation:
    """clip-by-global-norm → Adam(β₁=momentum, β₂=beta) (trainer.py:189,236).

    With ``cfg.skip_nonfinite_updates`` the whole chain is wrapped in
    ``optax.apply_if_finite``: a step whose gradients contain NaN/Inf
    becomes a no-op (params and inner optimizer state untouched) instead of
    poisoning the run — the production-training counterpart of the
    reference's per-backward anomaly detection (trainer.py:234), which can
    only crash after the fact. Stays on the hot path for free (one
    all-finite reduction, no host sync)."""
    sched = lr_schedule(cfg, steps_per_epoch)
    adam = (
        optax.adamw(sched, b1=cfg.momentum, b2=cfg.beta, weight_decay=cfg.weight_decay)
        if cfg.weight_decay > 0
        else optax.adam(sched, b1=cfg.momentum, b2=cfg.beta)
    )
    tx = optax.chain(optax.clip_by_global_norm(cfg.clip_grad), adam)
    if cfg.skip_nonfinite_updates:
        tx = optax.apply_if_finite(tx, max_consecutive_errors=100)
    return tx


def create_train_state(
    cfg: Config, models: ModelBundle, variables: dict, tx: optax.GradientTransformation
) -> tuple[TrainState, dict]:
    trainable, frozen = split_trainable(cfg, variables)
    opt_state = tx.init(trainable)
    return TrainState(trainable, opt_state, jnp.zeros((), jnp.int32)), frozen


# ------------------------------------------------------------- forward pass


def forward_frame(
    cfg: Config,
    models: ModelBundle,
    params: dict,
    frozen: dict,
    tgt: Array,
    ref: Array,
) -> tuple[dict, dict, Array, Array, Array, dict]:
    """One target/reference pair through flow + pose + mobile
    (reference: trainer.py:266-276).

    Returns (flows {scale: (B,Hs,Ws,2)}, mobiles {scale: ...}, axisangle,
    translation, cam_T_cam, new_frozen).

    BatchNorm regimes (reference: set_train() keeps the frozen flow/pose in
    train mode, trainer.py:201-205,226 — their BN normalizes with BATCH
    statistics every step and updates the running averages used at val time):

    * ``bn_frozen_eval=True`` (default): eval-mode BN — running averages,
      ``new_frozen is frozen`` unchanged.
    * ``bn_frozen_eval=False``: train-mode BN — batch statistics, and the
      updated running stats are carried in ``new_frozen`` (reference parity).
      Documented deviation: the reference runs one B-sized forward per
      reference frame; we stack the frames into a single 2B forward, so the
      batch statistics are computed over 2B samples per step.
    """
    flow_vars = dict(frozen["flownet"])
    pose_vars = dict(frozen["posenet"])
    if "flownet" in params:
        flow_vars["params"] = params["flownet"]
        pose_vars["params"] = params["posenet"]
    bn_train = not cfg.bn_frozen_eval

    new_frozen = frozen
    if bn_train:
        (flows, feats), fmut = models.flow.apply(
            flow_vars, tgt, ref, train=True, mutable=["batch_stats"]
        )
        (aa, t), pmut = models.pose.apply(
            pose_vars, tgt, ref, train=True, mutable=["batch_stats"]
        )
        new_frozen = dict(frozen)
        new_frozen["flownet"] = dict(frozen["flownet"])
        new_frozen["posenet"] = dict(frozen["posenet"])
        new_frozen["flownet"]["batch_stats"] = jax.lax.stop_gradient(fmut["batch_stats"])
        new_frozen["posenet"]["batch_stats"] = jax.lax.stop_gradient(pmut["batch_stats"])
    else:
        flows, feats = models.flow.apply(flow_vars, tgt, ref, train=False)
        aa, t = models.pose.apply(pose_vars, tgt, ref, train=False)

    if "flownet" not in params:
        # frozen supervision signal — cut any residual graph
        flows = jax.lax.stop_gradient(flows)
        feats = jax.lax.stop_gradient(feats)
        aa = jax.lax.stop_gradient(aa)
        t = jax.lax.stop_gradient(t)

    mobiles = models.mobile.apply({"params": params["mobile_decoder"]}, feats, aa, t)
    cam = transformation_from_parameters(aa, t)
    return flows, mobiles, aa, t, cam, new_frozen


def loss_from_batch(
    cfg: Config,
    models: ModelBundle,
    params: dict,
    frozen: dict,
    colors: dict,
    inv_Ks: dict,
    instance_mask: Optional[Array],
) -> tuple[Array, tuple[dict, LossAux, dict]]:
    """Forward both reference frames and compute the full loss.

    The reference runs one (tgt, ref) pair per call in a python loop
    (trainer.py:266-276); here the F reference frames are stacked into ONE
    2B-batch forward — identical math, double the MXU occupancy at the
    small per-chip batch sizes this model trains with.

    Sharding: the frames interleave WITHIN each sample's slot —
    ``stack(axis=1).reshape(B·F, …)``, sample b's frames at rows
    [b·F, (b+1)·F) — so a batch sharded over Mesh('data') stays local:
    each device's shard maps to a contiguous row block and GSPMD partitions
    the reshape with zero communication. (The obvious
    ``concatenate(axis=0)`` + static re-slice layout puts sample b's frames
    B rows apart, which forces an all-to-all of the images into the forward
    and collective-permutes out of every re-slice — measured 232 collective
    ops in the 8-device HLO, and a rendezvous-abort on the CPU test mesh.)
    """
    tgt = colors[(0, 0)]
    frame_ids = cfg.ref_frame_ids
    nf = len(frame_ids)
    b = tgt.shape[0]

    def _interleave(frames):  # nf × (B, …) → (B·nf, …), frame-minor
        return jnp.stack(frames, axis=1).reshape((b * nf,) + frames[0].shape[1:])

    def _deinterleave(x, fi):  # (B·nf, …) → (B, …), frame fi
        return x.reshape((b, nf) + x.shape[1:])[:, fi]

    tgt_rep = _interleave([tgt] * nf)
    refs = _interleave([colors[(i, 0)] for i in frame_ids])

    if cfg.remat:
        # jax.checkpoint: keep only this call's inputs/outputs for backward
        # and replay the flow/pose/mobile forward during it — activation HBM
        # for one extra forward of FLOPs (same math; grads are bitwise
        # identical, tested). With bn_frozen_eval the untouched frozen tree
        # stays OUT of the checkpointed outputs — no point routing a
        # pass-through constant through the rematerialized region. (The
        # BN-sync/donation decisions in _step_body key on the static
        # cfg.bn_frozen_eval flag, not on pytree identity, which would not
        # survive the jax.grad aux round-trip anyway.)
        if cfg.bn_frozen_eval:
            @jax.checkpoint
            def _fwd(params, frozen, tgt_rep, refs):
                return forward_frame(cfg, models, params, frozen, tgt_rep, refs)[:5]

            f_all, m_all, aa, t, cam_all = _fwd(params, frozen, tgt_rep, refs)
            new_frozen = frozen
        else:
            f_all, m_all, aa, t, cam_all, new_frozen = jax.checkpoint(
                lambda p, fr, a, b: forward_frame(cfg, models, p, fr, a, b)
            )(params, frozen, tgt_rep, refs)
    else:
        f_all, m_all, aa, t, cam_all, new_frozen = forward_frame(
            cfg, models, params, frozen, tgt_rep, refs
        )

    flows, mobiles, cams = {}, {}, {}
    for fi, i in enumerate(frame_ids):
        for s in cfg.scales:
            flows[(i, s)] = _deinterleave(f_all[s], fi)
            mobiles[(i, s)] = _deinterleave(m_all[s], fi)
        cams[i] = _deinterleave(cam_all, fi)

    losses, aux = compute_losses(cfg, colors, inv_Ks, flows, mobiles, cams, instance_mask)
    return losses["loss"], (losses, aux, new_frozen)


# --------------------------------------------------------------- train step


def _batch_instance_mask(batch: dict, frozen: dict, mask_fn, raw0: Array) -> Optional[Array]:
    """Instance-union masks for the DS/DC loss terms: precomputed in the
    batch, or — when a live provider is FUSED into the step (cfg.d2_fuse_step)
    — inferred here with the Mask R-CNN variables riding
    ``frozen['maskrcnn']``. Fusing replaces the reference's separate
    per-batch detectron2 call (trainer.py:278-279) with inference inside the
    same XLA program as the train step: no extra dispatch, and the K-step
    scan path stays a single dispatch in DS/DC mode.

    ``raw0`` is the AUGMENTED unnormalized [0,1] target frame — reference
    parity: detectron2 sees instance_img = 255 × the post-transform color
    tensor (mono_dataset.py:111), so the masks track the flip/zoom-crop.
    (The non-fused host-driven provider path sees the raw frame instead — a
    documented deviation it cannot avoid, since augmentation happens inside
    the jitted step.)"""
    instance_mask = batch.get("instance_mask")
    if instance_mask is None and mask_fn is not None:
        instance_mask = jax.lax.stop_gradient(
            mask_fn(frozen["maskrcnn"], raw0 * 255.0)
        )
    return instance_mask


def _microbatch_grads(
    cfg: Config,
    models: ModelBundle,
    mask_fn,
    params: dict,
    frozen: dict,
    batch: dict,
    rng: Array,
    sample_offset,
):
    """Augment + forward + backward on one (micro)batch. Returns
    (grads, (losses, aux, new_frozen))."""
    colors, inv_Ks, raw0 = augment_batch(
        cfg, batch["colors_u8"], batch["K"], rng, train=True, sample_offset=sample_offset
    )
    instance_mask = _batch_instance_mask(batch, frozen, mask_fn, raw0)

    def loss_fn(p):
        return loss_from_batch(cfg, models, p, frozen, colors, inv_Ks, instance_mask)

    return jax.grad(loss_fn, has_aux=True)(params)


def _step_body(
    cfg: Config,
    models: ModelBundle,
    tx: optax.GradientTransformation,
    mask_fn,
    state: TrainState,
    frozen: dict,
    batch: dict,
    rng: Array,
    axis: Optional[str],
) -> tuple[TrainState, dict, dict, LossAux]:
    """One optimizer step on (the local shard of) a batch.

    ``axis``: None for a single-program step; a mesh axis name when running
    inside shard_map — per-sample work is then purely local and the ONLY
    collectives are the explicit pmeans below (grads, scalar losses, BN
    stats). Augmentation draws use the GLOBAL sample position
    (axis_index·local_B + i), so the sharded step computes bit-identical
    per-sample math to the single-device step.

    ``cfg.accum_steps`` > 1 scans the forward/backward over that many
    microbatches of the local shard, accumulating gradients, and applies ONE
    optimizer update on the average — only one microbatch's activations are
    live at a time, so peak activation HBM drops ~A×. Every loss term is a
    per-sample mean, so the averaged gradient equals the full-batch gradient
    up to f32 summation order; augmentation offsets stay position-stable, so
    each sample sees identical draws either way. With
    ``bn_frozen_eval=False`` the frozen BN running stats update once per
    microbatch, sequentially (batch statistics — which is what train-mode BN
    normalizes with — are then per-microbatch, a documented deviation like
    the 2B stacking one in :func:`forward_frame`).
    """
    rng = jax.random.fold_in(rng, state.step)
    local_b = batch["colors_u8"].shape[0]
    offset = jax.lax.axis_index(axis) * local_b if axis else 0
    n_micro = cfg.accum_steps
    bn_train = not cfg.bn_frozen_eval  # static: the ONLY frozen-tree mutation

    if n_micro <= 1:
        grads, (losses, aux, new_frozen) = _microbatch_grads(
            cfg, models, mask_fn, state.params, frozen, batch, rng, offset
        )
        if not bn_train:
            # eval-mode BN never touches the frozen tree; returning the input
            # object keeps the donation alias and skips the BN-stats pmean
            # below (pytree identity does NOT survive the jax.grad aux
            # round-trip, so without this reassignment the guard would fire
            # every step)
            new_frozen = frozen
    else:
        assert local_b % n_micro == 0, (
            f"per-device batch {local_b} must divide by accum_steps {n_micro}"
        )
        mb = local_b // n_micro
        micro = jax.tree.map(
            lambda x: x.reshape((n_micro, mb) + x.shape[1:]), batch
        )

        def scan_body(carry, xs):
            g_acc, fro = carry
            mbatch, a = xs
            grads, (losses, aux, new_fro) = _microbatch_grads(
                cfg, models, mask_fn, state.params, fro, mbatch, rng, offset + a * mb
            )
            if not bn_train:
                new_fro = fro  # pass the carry through untouched
            return (jax.tree.map(jnp.add, g_acc, grads), new_fro), (losses, aux)

        g0 = jax.tree.map(jnp.zeros_like, state.params)
        (g_sum, fro_end), (losses_a, aux_a) = jax.lax.scan(
            scan_body, (g0, frozen), (micro, jnp.arange(n_micro))
        )
        grads = jax.tree.map(lambda g: g / n_micro, g_sum)
        losses = jax.tree.map(jnp.mean, losses_a)
        # microbatch auxes restack to the full local batch, so logging and
        # the P(axis) out_spec see the same shapes as the plain step
        aux = jax.tree.map(
            lambda x: x.reshape((local_b,) + x.shape[2:]), aux_a
        )
        new_frozen = fro_end if bn_train else frozen
    if axis is not None:
        grads = jax.lax.pmean(grads, axis)
        losses = jax.lax.pmean(losses, axis)
        if bn_train:  # bn_frozen_eval=False: sync updated BN batch stats
            for name in ("flownet", "posenet"):
                new_frozen[name]["batch_stats"] = jax.lax.pmean(
                    new_frozen[name]["batch_stats"], axis
                )
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)

    metrics = {k: v for k, v in losses.items()}
    metrics["grad_norm"] = optax.global_norm(grads)
    new_state = TrainState(params, opt_state, state.step + 1)
    return new_state, new_frozen, metrics, aux


def _data_specs(mesh):
    """shard_map specs for (state, frozen, batch, rng) → (state, frozen,
    metrics, aux): batch and per-sample aux shard their leading axis over the
    data axis; params/opt/frozen/metrics are replicated (kept exactly
    replicated by the explicit pmeans in :func:`_step_body`)."""
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]
    return (P(), P(), P(axis), P()), (P(), P(), P(), P(axis)), axis


def make_train_step(
    cfg: Config,
    models: ModelBundle,
    tx: optax.GradientTransformation,
    mask_fn=None,
    mesh=None,
):
    """Build the jitted train step.

    batch: {'colors_u8': (B, F, H, W, 3) uint8, 'K': (B, 4, 4) float32,
            optional 'instance_mask': (B, Hm, Wm) float32}

    ``mesh``: a Mesh(('data',)) for multi-device data parallelism. The step
    is then shard_map'd over it: the batch's leading axis splits across
    devices, params/frozen stay replicated, and gradients/metrics pmean over
    the axis — the ONLY collectives in the program are these explicit ones.
    (Round-3 lesson: jit+GSPMD on the same shardings invents resharding
    collectives — an all-to-all of the images into the stacked-frame
    forward, collective-permutes in the decoder backward, top_k all-gathers;
    232 collective ops total. On the CPU test mesh those rendezvous
    serialize and can hit XLA's 40 s termination timeout; on a real pod they
    would ride ICI for nothing. shard_map makes the partitioning manual and
    the cost model exact — scaling-book recipe.) Callers shard/replicate
    the operands with parallel.shard_batch/replicate as before.

    ``mask_fn(variables, images_u8) -> (B, H, W)`` fuses a live instance-mask
    provider into the step (see :func:`_batch_instance_mask`); its variables
    must be present as ``frozen['maskrcnn']``.

    Returns (state, frozen, metrics, aux) — ``frozen`` carries updated BN
    running stats when ``bn_frozen_eval=False`` (else passes through
    unchanged; see :func:`forward_frame`).
    """

    # frozen is returned (BN stats may update) — donating lets the unchanged
    # pass-through alias instead of copy; callers must reassign it each call
    donate = (0, 1) if cfg.donate_state else ()

    if mesh is None or mesh.size == 1:
        def step(state, frozen, batch, rng):
            return _step_body(cfg, models, tx, mask_fn, state, frozen, batch, rng, None)

        return jax.jit(step, donate_argnums=donate)

    in_specs, out_specs, axis = _data_specs(mesh)

    def local_step(state, frozen, batch, rng):
        return _step_body(cfg, models, tx, mask_fn, state, frozen, batch, rng, axis)

    # check_vma=True: the static varying-mask checker verifies every P()
    # output really is replicated (i.e. a pmean can't silently be dropped).
    # The one construct it used to reject — NMS fori_loop carries starting
    # as constants — now derives its initial carries from the varying scores
    # (maskrcnn.py::nms_fixed), so the checker stays on for the whole step.
    step = jax.shard_map(
        local_step, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=True
    )
    return jax.jit(step, donate_argnums=donate)


def make_multi_train_step(
    cfg: Config,
    models: ModelBundle,
    tx: optax.GradientTransformation,
    unroll: int = 1,
    mask_fn=None,
    mesh=None,
):
    """Build a jitted K-step train function: one device dispatch executes K
    sequential optimizer steps via ``lax.scan``.

    Amortizes host→device dispatch latency (the dominant cost on
    tunnel-attached TPUs) and lets XLA overlap the steps' host-independent
    work. The per-step math is identical to :func:`make_train_step`.

    batch: same dict as make_train_step but with a leading K axis:
        {'colors_u8': (K, B, F, H, W, 3), 'K': (K, B, 4, 4),
         optional 'instance_mask': (K, B, Hm, Wm)}
    Returns (state, frozen, metrics, aux): metrics averaged over the K steps,
    aux from the LAST step (carried through the scan so image logging works
    without a separate single-step dispatch), frozen with updated BN stats
    when ``bn_frozen_eval=False``.
    """

    def _make_k_steps(axis: Optional[str]):
        def one_step(carry, batch_k):
            state, frozen, rng, _last_aux = carry
            new_state, new_frozen, metrics, aux = _step_body(
                cfg, models, tx, mask_fn, state, frozen, batch_k, rng, axis
            )
            return (new_state, new_frozen, rng, aux), metrics

        def _aux_only(state, frozen, batch_k, rng):
            """Trace-only twin of one_step's loss pass, used to shape the aux
            carry slot via jax.eval_shape (no compilation, no FLOPs)."""
            step_rng = jax.random.fold_in(rng, state.step)
            colors, inv_Ks, raw0 = augment_batch(
                cfg, batch_k["colors_u8"], batch_k["K"], step_rng, train=True
            )
            _, (_, aux, _) = loss_from_batch(
                cfg, models, state.params, frozen, colors, inv_Ks,
                _batch_instance_mask(batch_k, frozen, mask_fn, raw0),
            )
            return aux

        def k_steps(state: TrainState, frozen: dict, batches: dict, rng: Array):
            batch0 = jax.tree.map(lambda x: x[0], batches)
            aux_shapes = jax.eval_shape(_aux_only, state, frozen, batch0, rng)
            aux0 = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), aux_shapes)
            if axis is not None:
                # the scan carries aux (last step's batch-derived images),
                # which is device-varying; a replicated zeros init would
                # fail check_vma's carry-type match — mark it varying
                aux0 = jax.tree.map(
                    lambda z: jax.lax.pcast(z, axis, to="varying"), aux0
                )
            (state, frozen, _, aux), metrics = jax.lax.scan(
                one_step, (state, frozen, rng, aux0), batches, unroll=unroll
            )
            return state, frozen, jax.tree.map(jnp.mean, metrics), aux

        return k_steps

    donate = (0, 1) if cfg.donate_state else ()
    if mesh is None or mesh.size == 1:
        return jax.jit(_make_k_steps(None), donate_argnums=donate)

    from jax.sharding import PartitionSpec as P

    _, out_specs, axis = _data_specs(mesh)
    # batches carry a leading K axis; the batch axis is second
    k_steps = jax.shard_map(
        _make_k_steps(axis),
        mesh=mesh,
        in_specs=(P(), P(), P(None, axis), P()),
        out_specs=out_specs,
        check_vma=True,  # see make_train_step
    )
    return jax.jit(k_steps, donate_argnums=donate)


def make_eval_forward(cfg: Config, models: ModelBundle):
    """Jitted eval forward on a normalized image pair
    (reference: trainer.py:289-314 val / evaluate_mix.py:58-72).

    Returns (flows, mobiles, axisangle, translation, cam_T_cam)."""

    def fwd(variables: dict, tgt: Array, ref: Array):
        flows, feats = models.flow.apply(variables["flownet"], tgt, ref)
        aa, t = models.pose.apply(variables["posenet"], tgt, ref)
        mobiles = models.mobile.apply(variables["mobile_decoder"], feats, aa, t)
        cam = transformation_from_parameters(aa, t)
        return flows, mobiles, aa, t, cam

    return jax.jit(fwd)
