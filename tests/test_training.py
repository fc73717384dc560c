"""End-to-end train-step tests: loss decreases, only intended params update,
and the data-parallel step runs on a multi-device CPU mesh (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdn_sfm_tpu import training as T
from mdn_sfm_tpu.config import Config, Mode
from mdn_sfm_tpu.data.synthetic import synthetic_batch
from mdn_sfm_tpu.parallel import make_mesh, replicate, shard_batch


def tiny_cfg(**kw):
    base = dict(
        height=64,
        width=96,  # /32-divisible
        batch_size=2,
        mode=Mode.SN,
        w_d2_sim=0.0,
        compute_dtype="float32",
        donate_state=False,
    )
    base.update(kw)
    return Config(**base).validate()


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    models = T.build_models(cfg)
    variables = T.init_variables(cfg, models, jax.random.PRNGKey(0))
    return cfg, models, variables


def _batch(cfg, seed=0):
    colors, K = synthetic_batch(cfg.batch_size, cfg.height, cfg.width, seed=seed)
    return {"colors_u8": jnp.asarray(colors), "K": jnp.asarray(K)}


class TestTrainStep:
    def test_runs_and_metrics_finite(self, setup):
        cfg, models, variables = setup
        tx = T.make_optimizer(cfg, steps_per_epoch=10)
        state, frozen = T.create_train_state(cfg, models, variables, tx)
        step = T.make_train_step(cfg, models, tx)
        state, frozen, metrics, aux = step(state, frozen, _batch(cfg), jax.random.PRNGKey(1))
        for k in ("loss", "epip", "smooth", "consis", "grad_norm"):
            assert np.isfinite(float(metrics[k])), k
        assert int(state.step) == 1
        assert aux.min_mobiles[0].shape == (cfg.batch_size, cfg.height, cfg.width, 1)

    def test_skip_nonfinite_updates_guards_params(self):
        """cfg.skip_nonfinite_updates: a NaN-gradient step is a no-op on
        params and inner Adam state; a finite step applies normally."""
        import dataclasses

        import optax

        cfg = Config(height=32, width=64, skip_nonfinite_updates=True).validate()
        tx = T.make_optimizer(cfg, steps_per_epoch=10)
        params = {"w": jnp.ones((4,), jnp.float32)}
        opt_state = tx.init(params)

        bad = {"w": jnp.full((4,), jnp.nan, jnp.float32)}
        upd, new_state = tx.update(bad, opt_state, params)
        np.testing.assert_array_equal(np.asarray(upd["w"]), np.zeros(4))
        assert int(new_state.notfinite_count) == 1

        good = {"w": jnp.ones((4,), jnp.float32)}
        upd2, _ = tx.update(good, new_state, params)
        assert np.all(np.isfinite(np.asarray(upd2["w"])))
        assert float(np.abs(np.asarray(upd2["w"])).sum()) > 0

        # default config stays the plain chain (checkpointed adam.msgpack
        # layouts unchanged unless the flag is set)
        cfg0 = dataclasses.replace(cfg, skip_nonfinite_updates=False)
        tx0 = T.make_optimizer(cfg0, steps_per_epoch=10)
        assert not isinstance(tx0.init(params), optax.ApplyIfFiniteState)

    def test_only_mobile_params_train(self, setup):
        cfg, models, variables = setup
        tx = T.make_optimizer(cfg, steps_per_epoch=10)
        state, frozen = T.create_train_state(cfg, models, variables, tx)
        assert set(state.params) == {"mobile_decoder"}
        step = T.make_train_step(cfg, models, tx)
        new_state, _, _, _ = step(state, frozen, _batch(cfg), jax.random.PRNGKey(1))
        # params actually moved
        delta = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()), state.params, new_state.params
        )
        assert max(jax.tree.leaves(delta)) > 0

    def test_fine_tune_includes_flow_pose(self, setup):
        cfg0, models, variables = setup
        cfg = tiny_cfg(fine_tune_flow_motion=True)
        trainable, frozen = T.split_trainable(cfg, variables)
        assert set(trainable) == {"mobile_decoder", "flownet", "posenet"}
        assert "params" not in frozen["flownet"]
        assert "batch_stats" in frozen["flownet"]

    def test_loss_decreases(self, setup):
        cfg, models, variables = setup
        tx = T.make_optimizer(cfg, steps_per_epoch=0)  # constant LR
        state, frozen = T.create_train_state(cfg, models, variables, tx)
        step = T.make_train_step(cfg, models, tx)
        batch = _batch(cfg)
        rng = jax.random.PRNGKey(2)
        first = None
        for i in range(8):
            state, frozen, metrics, _ = step(state, frozen, batch, rng)
            if first is None:
                first = float(metrics["loss"])
        assert float(metrics["loss"]) < first

    def test_mask_learns_where_residual_is_high(self):
        """The scientific mechanism end-to-end: the epipolar objective
        (reference loss_functions.py:117-138) moves the mobile mask UP where
        the post-processed residual is large relative to everywhere else —
        mean(background·epip) pulls the mask toward high-residual pixels
        while the α non-triviality term pushes it down globally.

        With frozen random flow/pose the residual map q is arbitrary but
        deterministic. Measured dynamics on this exact setup (48 Adam steps,
        lr 3e-4): the mask mean drops from ~0.6 toward the sparse
        equilibrium, but the drop is ~0.05 SMALLER on top-decile-q pixels
        than on bottom-half-q pixels. That per-pixel differential is the
        supervision signal; a sign error anywhere in the loss would invert
        it. (Long high-lr training instead saturates the sigmoid to an
        all-zero mask — a measured trap, not a usable assertion.)"""
        cfg = tiny_cfg(height=32, width=64, batch_size=1, learning_rate=3e-4)
        models = T.build_models(cfg)
        variables = T.init_variables(cfg, models, jax.random.PRNGKey(0))
        tx = T.make_optimizer(cfg, steps_per_epoch=0)  # constant LR
        state, frozen = T.create_train_state(cfg, models, variables, tx)
        batch = _batch(cfg)

        def probe(state, frozen):
            """(mean residual over frames, min-fused mask) at scale 0 on the
            un-augmented batch (train=False: normalize only)."""
            colors, inv_Ks, _ = T.augment_batch(
                cfg, batch["colors_u8"], batch["K"], jax.random.PRNGKey(9), train=False
            )
            _, (_, aux, _) = T.loss_from_batch(
                cfg, models, state.params, frozen, colors, inv_Ks, None
            )
            q = np.stack(
                [np.asarray(aux.epipolars[(f, 0)]).ravel() for f in cfg.ref_frame_ids]
            ).mean(0)
            return q, np.asarray(aux.min_mobiles[0]).ravel()

        q, m0 = probe(state, frozen)
        kstep = T.make_multi_train_step(cfg, models, tx)
        batches = jax.tree.map(lambda x: jnp.stack([x] * 8), batch)
        for r in range(6):  # 48 steps on the same fixed batch
            state, frozen, metrics, _ = kstep(
                state, frozen, batches, jax.random.PRNGKey(3 + r)
            )
        assert np.isfinite(float(metrics["loss"]))
        _, m1 = probe(state, frozen)
        assert 0.01 < m1.mean() < 0.99, f"mask saturated: mean {m1.mean()}"
        d = m1 - m0
        hi = q >= np.quantile(q, 0.9)
        lo = q <= np.quantile(q, 0.5)
        dsep = d[hi].mean() - d[lo].mean()
        # measured 0.054 on this setup; 0.02 leaves ~2.5× margin. A broken
        # residual→mask coupling gives ≈0, a sign flip gives ≈−0.05.
        assert dsep > 0.02, (dsep, float(m1.mean()))

    def test_mask_learns_where_tg_map_is_high(self):
        """TG variant of the learning-dynamics check (round-4 VERDICT item 1):
        the gauss-divided truncated map (reference utils.py:355-379 +
        loss_utils.py:81-89) must still move the mobile mask up more on its
        high pixels than on its low ones — i.e. TG's supervision signal
        survives the distance division and trains through our stack.

        TG's operating envelope requires residuals well above threshold x
        gauss-weight (PARITY.md round-5 TG note: below it, the whole map sits
        under the non-triviality equilibrium m* ~ e/2alpha and the mask
        saturates to zero). The threshold is therefore CALIBRATED to this
        batch's raw residual distribution — the analog of the reference
        deriving 9.22 from epipolar_statics rather than guessing."""
        from mdn_sfm_tpu.geometry import (
            epipolar_residual,
            scale_factor,
            transformation_from_parameters,
        )

        cfg0 = tiny_cfg(height=32, width=64, batch_size=1, learning_rate=3e-4)
        models = T.build_models(cfg0)
        variables = T.init_variables(cfg0, models, jax.random.PRNGKey(0))
        batch = _batch(cfg0)

        # raw residual of the frozen random flow/pose on this batch → pick a
        # threshold that puts the top-decile pixels INSIDE TG's envelope:
        # (q90 / (thr * w_med))^2 ≈ 0.5 with the gauss weight median ≈ 9
        colors, inv_Ks, _ = T.augment_batch(
            cfg0, batch["colors_u8"], batch["K"], jax.random.PRNGKey(9), train=False
        )
        tgt = colors[(0, 0)]
        q_raw = []
        for f in cfg0.ref_frame_ids:
            flows, _ = models.flow.apply(variables["flownet"], tgt, colors[(f, 0)])
            aa, tr = models.pose.apply(variables["posenet"], tgt, colors[(f, 0)])
            cam = transformation_from_parameters(aa, tr)
            f_px = flows[0] * scale_factor(cfg0.height, cfg0.width)
            q_raw.append(np.abs(np.asarray(
                epipolar_residual(f_px, inv_Ks[0], cam[:, :3, :3], cam[:, :3, 3])
            )))
        thr = float(np.quantile(np.stack(q_raw), 0.9) / 6.3)

        import dataclasses

        cfg = dataclasses.replace(
            cfg0, mode=Mode.TG, threshold=thr,
            gauss_sigma1=30.0, gauss_sigma2=120.0,  # reference raw sigmas
        ).validate()
        tx = T.make_optimizer(cfg, steps_per_epoch=0)  # constant LR
        state, frozen = T.create_train_state(cfg, models, variables, tx)

        def probe(state, frozen):
            _, (_, aux, _) = T.loss_from_batch(
                cfg, models, state.params, frozen, colors, inv_Ks, None
            )
            q = np.stack(
                [np.asarray(aux.epipolars[(f, 0)]).ravel() for f in cfg.ref_frame_ids]
            ).mean(0)
            return q, np.asarray(aux.min_mobiles[0]).ravel()

        q, m0 = probe(state, frozen)
        assert np.quantile(q, 0.9) > 0.05, (
            f"TG map has no dynamic range (p90 {np.quantile(q, 0.9):.4f}) — "
            "threshold calibration off"
        )
        kstep = T.make_multi_train_step(cfg, models, tx)
        batches = jax.tree.map(lambda x: jnp.stack([x] * 8), batch)
        for r in range(6):  # 48 steps on the same fixed batch
            state, frozen, metrics, _ = kstep(
                state, frozen, batches, jax.random.PRNGKey(3 + r)
            )
        assert np.isfinite(float(metrics["loss"]))
        _, m1 = probe(state, frozen)
        assert 0.01 < m1.mean() < 0.99, f"mask saturated: mean {m1.mean()}"
        d = m1 - m0
        hi = q >= np.quantile(q, 0.9)
        lo = q <= np.quantile(q, 0.5)
        dsep = d[hi].mean() - d[lo].mean()
        assert dsep > 0.02, (dsep, float(m1.mean()))

    def test_grad_clipping(self, setup):
        cfg, models, variables = setup
        tx = T.make_optimizer(cfg, steps_per_epoch=10)
        state, frozen = T.create_train_state(cfg, models, variables, tx)
        step = T.make_train_step(cfg, models, tx)
        _, _, metrics, _ = step(state, frozen, _batch(cfg), jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["grad_norm"]))


class TestMultiStep:
    def test_k_steps_match_sequential(self, setup):
        """One scan dispatch of K steps lands on the same params as K
        sequential single-step calls on the same batches."""
        cfg, models, variables = setup
        tx = T.make_optimizer(cfg, steps_per_epoch=0)
        state, frozen = T.create_train_state(cfg, models, variables, tx)
        step = T.make_train_step(cfg, models, tx)
        kstep = T.make_multi_train_step(cfg, models, tx)

        K = 3
        batches = [_batch(cfg, seed=s) for s in range(K)]
        stacked = {
            k: jnp.stack([b[k] for b in batches]) for k in batches[0]
        }
        rng = jax.random.PRNGKey(9)

        s_seq = state
        _aux_last = None
        for b in batches:
            s_seq, frozen, m_seq, _aux_last = step(s_seq, frozen, b, rng)

        s_k, _, m_k, aux_k = kstep(state, frozen, stacked, rng)
        assert int(s_k.step) == K
        # last-step aux is carried out of the scan for image logging
        assert aux_k.min_mobiles[0].shape == (cfg.batch_size, cfg.height, cfg.width, 1)
        np.testing.assert_allclose(
            np.asarray(aux_k.min_mobiles[0]), np.asarray(_aux_last.min_mobiles[0]), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(jax.tree.leaves(s_k.params)[0]),
            np.asarray(jax.tree.leaves(s_seq.params)[0]),
            atol=1e-6,
        )


class TestLrSchedule:
    def test_default_cosine_decays(self):
        cfg = tiny_cfg(num_epochs=2)
        sched = T.lr_schedule(cfg, steps_per_epoch=100)
        assert float(sched(0)) == pytest.approx(cfg.learning_rate)
        assert float(sched(199)) < float(sched(0)) * 0.01 + 1e-9

    def test_legacy_oscillates_per_epoch(self):
        """The reference quirk: LR returns to η₀ at each epoch boundary and
        hits 0 mid-epoch (trainer.py:238 + options.py:139-142)."""
        cfg = tiny_cfg(legacy_lr_schedule=True)
        sched = T.lr_schedule(cfg, steps_per_epoch=100)
        assert float(sched(0)) == pytest.approx(cfg.learning_rate)
        assert float(sched(50)) == pytest.approx(0.0, abs=1e-9)
        assert float(sched(100)) == pytest.approx(cfg.learning_rate, rel=1e-6)


class TestDataParallel:
    def test_sharded_step_matches_single_device(self, setup):
        """The shard_map'd step produces the same loss as the single-device
        run: per-sample math is identical (position-stable augment RNG) and
        grads pmean over the mesh."""
        cfg, models, variables = setup
        devices = jax.devices()
        assert len(devices) >= 8, "conftest must provide 8 virtual CPU devices"

        cfg8 = tiny_cfg(batch_size=8)
        tx = T.make_optimizer(cfg8, steps_per_epoch=10)
        state, frozen = T.create_train_state(cfg8, models, variables, tx)
        step = T.make_train_step(cfg8, models, tx)
        batch = _batch(cfg8)

        # single device
        _, _, m_single, _ = step(state, frozen, batch, jax.random.PRNGKey(3))

        # 8-way data parallel
        mesh = make_mesh(8)
        step_dp = T.make_train_step(cfg8, models, tx, mesh=mesh)
        state_r = replicate(mesh, state)
        frozen_r = replicate(mesh, frozen)
        batch_s = shard_batch(mesh, batch)
        _, _, m_sharded, _ = step_dp(state_r, frozen_r, batch_s, jax.random.PRNGKey(3))

        assert float(m_sharded["loss"]) == pytest.approx(float(m_single["loss"]), rel=1e-4)

    def test_sharded_accum_matches_single_device(self, setup):
        """accum_steps composes with the shard_map mesh: the global sample
        position is axis_index·local_B + microbatch·mb + i, so every sample
        draws the same augmentation whether the batch is split across
        devices, microbatches, both, or neither."""
        import dataclasses

        cfg, models, variables = setup
        assert len(jax.devices()) >= 8

        cfg8 = tiny_cfg(batch_size=8)
        tx = T.make_optimizer(cfg8, steps_per_epoch=10)
        state, frozen = T.create_train_state(cfg8, models, variables, tx)
        batch, rng = _batch(cfg8), jax.random.PRNGKey(3)

        _, _, m_single, _ = T.make_train_step(cfg8, models, tx)(state, frozen, batch, rng)

        # 4-way data parallel × 2 microbatches: local shard of 2 splits in two
        cfg_a = dataclasses.replace(cfg8, accum_steps=2)
        mesh = make_mesh(4)
        step_dp = T.make_train_step(cfg_a, models, tx, mesh=mesh)
        _, _, m_sharded, aux = step_dp(
            replicate(mesh, state), replicate(mesh, frozen), shard_batch(mesh, batch), rng
        )
        assert float(m_sharded["loss"]) == pytest.approx(float(m_single["loss"]), rel=1e-4)
        # aux restacks to the full local batch before the out_spec concat
        assert jax.tree.leaves(aux.epipolars)[0].shape[0] == cfg8.batch_size


class TestBatchNormRegimes:
    """Reference parity: set_train() keeps the frozen flow/pose in train mode,
    so their BN normalizes with batch stats and updates the running averages
    (reference: trainer.py:201-205,226). bn_frozen_eval=False mimics that;
    the default (True) uses eval-mode running averages."""

    def test_bn_train_mode_runs_and_updates_stats(self, setup):
        _, models0, variables = setup
        cfg = tiny_cfg(bn_frozen_eval=False)
        models = T.build_models(cfg)
        tx = T.make_optimizer(cfg, steps_per_epoch=10)
        state, frozen = T.create_train_state(cfg, models, variables, tx)
        step = T.make_train_step(cfg, models, tx)
        batch = _batch(cfg, seed=7)
        state, new_frozen, metrics, _ = step(state, frozen, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))
        # running stats moved (momentum EMA toward the batch statistics)
        before = jax.tree.leaves(frozen["flownet"]["batch_stats"])
        after = jax.tree.leaves(new_frozen["flownet"]["batch_stats"])
        deltas = [float(jnp.abs(a - b).max()) for a, b in zip(after, before)]
        assert max(deltas) > 0, "train-mode BN must update running stats"

    def test_bn_regimes_differ(self, setup):
        _, _, variables = setup
        losses = {}
        for flag in (True, False):
            cfg = tiny_cfg(bn_frozen_eval=flag)
            models = T.build_models(cfg)
            tx = T.make_optimizer(cfg, steps_per_epoch=10)
            state, frozen = T.create_train_state(cfg, models, variables, tx)
            step = T.make_train_step(cfg, models, tx)
            _, _, metrics, _ = step(state, frozen, _batch(cfg, seed=7), jax.random.PRNGKey(1))
            losses[flag] = float(metrics["loss"])
        assert losses[True] != losses[False], "batch-stat vs running-stat BN must differ"

    def test_bn_frozen_eval_passthrough(self, setup):
        """Default regime: frozen passes through the step unchanged."""
        cfg, models, variables = setup
        tx = T.make_optimizer(cfg, steps_per_epoch=10)
        state, frozen = T.create_train_state(cfg, models, variables, tx)
        step = T.make_train_step(cfg, models, tx)
        _, new_frozen, _, _ = step(state, frozen, _batch(cfg), jax.random.PRNGKey(1))
        a = jax.tree.leaves(frozen["flownet"]["batch_stats"])[0]
        b = jax.tree.leaves(new_frozen["flownet"]["batch_stats"])[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_remat_step_matches_plain(self, setup):
        """cfg.remat (jax.checkpoint around the stacked-frame forward) must
        not change the math — same loss, same updated params."""
        import dataclasses

        cfg, models, variables = setup
        tx = T.make_optimizer(cfg, steps_per_epoch=10)
        state, frozen = T.create_train_state(cfg, models, variables, tx)
        batch, rng = _batch(cfg, seed=3), jax.random.PRNGKey(1)

        s0, f0, m0, _ = T.make_train_step(cfg, models, tx)(state, frozen, batch, rng)
        cfg_r = dataclasses.replace(cfg, remat=True)
        s1, f1, m1, _ = T.make_train_step(cfg_r, models, tx)(state, frozen, batch, rng)

        np.testing.assert_allclose(float(m0["loss"]), float(m1["loss"]), rtol=1e-6)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=0, atol=1e-7
            ),
            s0.params,
            s1.params,
        )
        # default regime: frozen passes through by identity under remat too
        # (the checkpoint wraps only the compute, not the pass-through tree)
        a = jax.tree.leaves(f1["flownet"]["batch_stats"])[0]
        b = jax.tree.leaves(frozen["flownet"]["batch_stats"])[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_remat_bn_train_mode_carries_stats(self, setup):
        """remat composes with bn_frozen_eval=False: the replayed forward
        still emits updated running stats."""
        _, _, variables = setup
        cfg = tiny_cfg(remat=True, bn_frozen_eval=False)
        models = T.build_models(cfg)
        tx = T.make_optimizer(cfg, steps_per_epoch=10)
        state, frozen = T.create_train_state(cfg, models, variables, tx)
        step = T.make_train_step(cfg, models, tx)
        state, new_frozen, metrics, _ = step(state, frozen, _batch(cfg, seed=7), jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))
        before = jax.tree.leaves(frozen["flownet"]["batch_stats"])
        after = jax.tree.leaves(new_frozen["flownet"]["batch_stats"])
        assert max(float(jnp.abs(a - b).max()) for a, b in zip(after, before)) > 0

    def test_accum_steps_matches_plain(self, setup):
        """cfg.accum_steps: scanning the backward over microbatches and
        averaging gradients must reproduce the full-batch step (per-sample
        augmentation draws are position-stable; every loss term is a
        per-sample mean) up to f32 summation order."""
        import dataclasses

        cfg, models, variables = setup
        tx = T.make_optimizer(cfg, steps_per_epoch=10)
        state, frozen = T.create_train_state(cfg, models, variables, tx)
        batch, rng = _batch(cfg, seed=3), jax.random.PRNGKey(1)

        s0, f0, m0, aux0 = T.make_train_step(cfg, models, tx)(state, frozen, batch, rng)
        cfg_a = dataclasses.replace(cfg, accum_steps=2)
        s1, f1, m1, aux1 = T.make_train_step(cfg_a, models, tx)(state, frozen, batch, rng)

        np.testing.assert_allclose(float(m0["loss"]), float(m1["loss"]), rtol=1e-6)
        # Adam's first-step g/(sqrt(v)+eps) amplifies f32 summation-order
        # noise in the accumulated gradient (measured: 2/294912 elements at
        # 1.3e-6 abs, 5e-5 rel); a real math bug shows up orders louder.
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=0, atol=2e-5
            ),
            s0.params,
            s1.params,
        )
        # aux restacks to full-batch shapes (logging + P(axis) spec parity)
        def _same_shape(a, b):
            assert a.shape == b.shape, (a.shape, b.shape)

        jax.tree.map(_same_shape, aux0, aux1)
        # per-sample aux math matches (same augment draws per sample); XLA
        # picks different conv blockings at the microbatch shape, so allow
        # few-ULP drift (measured ≤2e-6 abs on ~0.25-scale maps)
        a0 = jax.tree.leaves(aux0.epipolars)[0]
        a1 = jax.tree.leaves(aux1.epipolars)[0]
        np.testing.assert_allclose(np.asarray(a0), np.asarray(a1), atol=1e-5)
        # frozen passes through by identity in the default BN regime
        b0 = jax.tree.leaves(f1["flownet"]["batch_stats"])[0]
        b1 = jax.tree.leaves(frozen["flownet"]["batch_stats"])[0]
        np.testing.assert_array_equal(np.asarray(b0), np.asarray(b1))

    def test_accum_bn_train_mode_carries_stats(self, setup):
        """accum_steps composes with bn_frozen_eval=False: running stats
        update sequentially per microbatch and come out of the step."""
        _, _, variables = setup
        cfg = tiny_cfg(accum_steps=2, bn_frozen_eval=False)
        models = T.build_models(cfg)
        tx = T.make_optimizer(cfg, steps_per_epoch=10)
        state, frozen = T.create_train_state(cfg, models, variables, tx)
        step = T.make_train_step(cfg, models, tx)
        state, new_frozen, metrics, _ = step(
            state, frozen, _batch(cfg, seed=7), jax.random.PRNGKey(1)
        )
        assert np.isfinite(float(metrics["loss"]))
        before = jax.tree.leaves(frozen["flownet"]["batch_stats"])
        after = jax.tree.leaves(new_frozen["flownet"]["batch_stats"])
        assert max(float(jnp.abs(a - b).max()) for a, b in zip(after, before)) > 0

    def test_kstep_carries_bn_stats(self, setup):
        _, _, variables = setup
        cfg = tiny_cfg(bn_frozen_eval=False)
        models = T.build_models(cfg)
        tx = T.make_optimizer(cfg, steps_per_epoch=0)
        state, frozen = T.create_train_state(cfg, models, variables, tx)
        step = T.make_train_step(cfg, models, tx)
        kstep = T.make_multi_train_step(cfg, models, tx)
        K = 2
        batches = [_batch(cfg, seed=s) for s in range(K)]
        stacked = {k: jnp.stack([b[k] for b in batches]) for k in batches[0]}
        rng = jax.random.PRNGKey(9)

        s_seq, f_seq = state, frozen
        for b in batches:
            s_seq, f_seq, _, _ = step(s_seq, f_seq, b, rng)
        s_k, f_k, _, _ = kstep(state, frozen, stacked, rng)

        np.testing.assert_allclose(
            np.asarray(jax.tree.leaves(f_k["flownet"]["batch_stats"])[0]),
            np.asarray(jax.tree.leaves(f_seq["flownet"]["batch_stats"])[0]),
            atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(jax.tree.leaves(s_k.params)[0]),
            np.asarray(jax.tree.leaves(s_seq.params)[0]),
            atol=1e-6,
        )
