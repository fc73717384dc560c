"""Trainer orchestration tests on synthetic data: epoch loop, checkpoint
layout, resume, the epipolar-statics tool and the hyperparameter grid
(reference behaviors: trainer.py:213-254, 384-441, 521-562)."""

import os

import numpy as np
import pytest

from mdn_sfm_tpu.config import Config, Mode
from mdn_sfm_tpu.trainer import Trainer


def make_cfg(tmp, **kw):
    base = dict(
        height=32,
        width=64,
        batch_size=2,
        num_epochs=1,
        num_workers=1,
        save_frequency=4,
        log_frequency=100,
        compute_dtype="float32",
        donate_state=False,
        log_dir=os.path.join(tmp, "log"),
        other_files_path=os.path.join(tmp, "files"),
        v_save="vtest",
        w_d2_sim=0.0,
    )
    base.update(kw)
    return Config(**base).validate()


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("trainer"))
    cfg = make_cfg(tmp)
    trainer = Trainer(cfg, synthetic=True)
    trainer.train()
    return tmp, cfg, trainer


class TestTrainLoop:
    def test_checkpoints_written_in_reference_layout(self, trained):
        tmp, cfg, trainer = trained
        models_dir = os.path.join(cfg.log_dir, "vtest", "models")
        assert os.path.exists(os.path.join(models_dir, "opt.json"))
        weights = [d for d in os.listdir(models_dir) if d.startswith("weights_")]
        assert weights, "no weights_{idx} folders saved"
        w0 = os.path.join(models_dir, sorted(weights)[0])
        assert os.path.exists(os.path.join(w0, "mobile_decoder.msgpack"))
        assert os.path.exists(os.path.join(w0, "adam.msgpack"))

    def test_opt_json_loads_back(self, trained):
        tmp, cfg, trainer = trained
        loaded = Config.load(os.path.join(cfg.log_dir, "vtest", "models", "opt.json"))
        assert loaded.height == cfg.height
        assert loaded.mode == cfg.mode

    def test_steps_advanced(self, trained):
        tmp, cfg, trainer = trained
        import jax

        assert int(jax.device_get(trainer.state.step)) > 0

    def test_resume_with_load_adam(self, trained):
        """Resume path: load_adam restores the saved mobile decoder + Adam
        state (reference: trainer.py:146-199)."""
        tmp, cfg, trainer = trained
        import dataclasses

        models_dir = os.path.join(cfg.log_dir, "vtest", "models")
        idxs = sorted(int(d.split("_")[1]) for d in os.listdir(models_dir) if d.startswith("weights_"))
        cfg2 = dataclasses.replace(cfg, load_adam=True, v_load="vtest", idx_load=idxs[-1])
        t2 = Trainer(cfg2, synthetic=True)
        assert t2.start_step > 0

        import jax

        a = jax.device_get(trainer.state.params["mobile_decoder"])
        b = jax.device_get(t2.state.params["mobile_decoder"])
        leaves_a = jax.tree.leaves(a)
        leaves_b = jax.tree.leaves(b)
        np.testing.assert_allclose(np.asarray(leaves_a[0]), np.asarray(leaves_b[0]))


class TestAutoResume:
    def test_auto_resume_continues_from_latest(self, trained):
        """--resume auto: finds the latest weights_{idx} of v_save, restores
        params + Adam + step, and continues idx_save past it (preemption
        recovery; no reference analog — its resume is manual flags only)."""
        tmp, cfg, trainer = trained
        import dataclasses

        import jax

        models_dir = os.path.join(cfg.log_dir, "vtest", "models")
        idxs = sorted(
            int(d.split("_")[1]) for d in os.listdir(models_dir) if d.startswith("weights_")
        )
        cfg2 = dataclasses.replace(cfg, resume="auto")
        t2 = Trainer(cfg2, synthetic=True)
        assert t2.start_step > 0
        assert t2.start_idx_save == idxs[-1] + 1
        assert int(jax.device_get(t2.state.step)) == t2.start_step

        a = jax.tree.leaves(jax.device_get(trainer.state.params["mobile_decoder"]))
        b = jax.tree.leaves(jax.device_get(t2.state.params["mobile_decoder"]))
        np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]))
        # Adam restored too (mu for the same leaf matches the saved state)
        ma = jax.tree.leaves(jax.device_get(trainer.state.opt_state))
        mb = jax.tree.leaves(jax.device_get(t2.state.opt_state))
        assert len(ma) == len(mb)

    def test_auto_resume_fresh_start_when_no_checkpoint(self, tmp_path):
        cfg = make_cfg(str(tmp_path), resume="auto", v_save="vfresh")
        t = Trainer(cfg, synthetic=True)
        assert t.start_step == 0 and t.start_idx_save == 0

    def test_interrupted_resume_matches_uninterrupted(self, tmp_path):
        """Exact preemption recovery: interrupt mid-epoch, auto-resume, and
        land on BITWISE-identical params to an uninterrupted run — the
        resumed process re-enters the interrupted epoch (same (seed, epoch)
        shuffle), skips the consumed batches, and the augment RNG folds the
        step counter, so the two trajectories are the same computation."""
        import dataclasses

        import jax

        # uninterrupted baseline: 2 epochs end-to-end (8 samples → 4
        # batches/epoch keeps three Trainer runs CI-cheap)
        kw = dict(num_epochs=2, save_frequency=10**6, limit_train_samples=8)
        cfgA = make_cfg(str(tmp_path / "a"), **kw)
        tA = Trainer(cfgA, synthetic=True)
        tA.train()
        stepsA = int(jax.device_get(tA.state.step))
        assert stepsA == 2 * tA.steps_per_epoch

        # same run, interrupted after 3 optimizer steps (mid-epoch 0)
        cfgB = make_cfg(str(tmp_path / "b"), **kw)
        tB = Trainer(cfgB, synthetic=True)
        assert 0 < 3 < tB.steps_per_epoch
        orig_step_fn, n_calls = tB.step_fn, [0]

        def counting_step(*args):
            out = orig_step_fn(*args)
            n_calls[0] += 1
            if n_calls[0] == 3:
                tB._stop_requested = True  # what the SIGTERM handler sets
            return out

        tB.step_fn = counting_step
        tB.train()  # checkpoints at the interruption point
        assert int(jax.device_get(tB.state.step)) == 3

        # resumed process finishes the run
        cfgB2 = dataclasses.replace(cfgB, resume="auto")
        tB2 = Trainer(cfgB2, synthetic=True)
        assert tB2.start_step == 3
        tB2.train()
        assert int(jax.device_get(tB2.state.step)) == stepsA

        pa = jax.tree.leaves(jax.device_get(tA.state.params))
        pb = jax.tree.leaves(jax.device_get(tB2.state.params))
        assert len(pa) == len(pb)
        for a, b in zip(pa, pb):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_sigterm_checkpoints_and_exits(self, tmp_path):
        """SIGTERM mid-epoch: the handler flags a stop, the loop exits at the
        next batch boundary, and train() writes a final checkpoint — so
        --resume auto can continue a preempted run."""
        import signal

        cfg = make_cfg(str(tmp_path), v_save="vsig", num_epochs=5,
                       save_frequency=10_000)
        t = Trainer(cfg, synthetic=True)
        orig = t.step_fn
        calls = []

        def step_then_sigterm(*a):
            calls.append(1)
            if len(calls) == 2:
                signal.raise_signal(signal.SIGTERM)
            return orig(*a)

        t.step_fn = step_then_sigterm
        t.train()  # must RETURN (not die) and save
        assert len(calls) == 2, "loop did not stop at the next batch boundary"
        import jax

        from mdn_sfm_tpu import checkpoints as ckpt

        latest = ckpt.latest_weights_idx(cfg.log_dir, "vsig")
        assert latest is not None
        folder = ckpt.weights_folder(cfg.log_dir, "vsig", latest)
        import json

        with open(os.path.join(folder, "meta.json")) as f:
            assert json.load(f)["step"] == 2
        assert int(jax.device_get(t.state.step)) == 2

    def test_auto_resume_after_fine_tune_inherits_base_step(self, tmp_path):
        """Stage-2 fine-tune runs inherit the step COUNTER from their base
        checkpoint (--load_adam continues the count), so auto-resume must
        position itself by step - base_step, not the raw counter — which
        would land in the wrong epoch or declare the run already complete."""
        import dataclasses

        import jax

        from mdn_sfm_tpu import checkpoints as ckpt

        kw = dict(num_epochs=2, save_frequency=10**6, limit_train_samples=8)
        cfg1 = make_cfg(str(tmp_path), v_save="vs1", **kw)
        t1 = Trainer(cfg1, synthetic=True)
        t1.train()
        base = int(jax.device_get(t1.state.step))
        assert base == 2 * t1.steps_per_epoch

        # stage 2 continues the counter; interrupt after 3 of its OWN steps
        idx1 = ckpt.latest_weights_idx(cfg1.log_dir, "vs1")
        cfg2 = make_cfg(str(tmp_path), v_save="vs2", load_adam=True,
                        v_load="vs1", idx_load=idx1, **kw)
        t2 = Trainer(cfg2, synthetic=True)
        assert t2.start_step == base and t2.base_step == base
        orig, n = t2.step_fn, [0]

        def stepper(*a):
            out = orig(*a)
            n[0] += 1
            if n[0] == 3:
                t2._stop_requested = True
            return out

        t2.step_fn = stepper
        t2.train()

        # resume must re-enter stage 2's epoch 0 at batch 3 and finish it
        cfg3 = dataclasses.replace(cfg2, resume="auto")
        t3 = Trainer(cfg3, synthetic=True)
        assert t3.start_step == base + 3 and t3.base_step == base
        t3.train()
        assert int(jax.device_get(t3.state.step)) == base + 2 * t3.steps_per_epoch

    def test_restart_of_complete_run_is_noop(self, tmp_path):
        """Crash-loop safety: restarting a finished run with --resume auto
        must not write a fresh duplicate checkpoint per restart."""
        import dataclasses

        cfg = make_cfg(str(tmp_path), v_save="vdone", num_epochs=1,
                       save_frequency=10**6, limit_train_samples=8)
        Trainer(cfg, synthetic=True).train()
        models_dir = os.path.join(cfg.log_dir, "vdone", "models")

        def weights():
            return sorted(d for d in os.listdir(models_dir) if d.startswith("weights_"))

        before = weights()
        t = Trainer(dataclasses.replace(cfg, resume="auto"), synthetic=True)
        t.train()
        assert weights() == before, "restart of a complete run wrote a duplicate"

    def test_async_save_failure_surfaces(self, trained, monkeypatch):
        """A failed background checkpoint write (disk full, serialization
        error) must raise at the next join, not vanish with the thread."""
        tmp, cfg, trainer = trained
        from mdn_sfm_tpu import checkpoints as ckpt

        def boom(*a, **k):
            raise OSError("disk full")

        monkeypatch.setattr(ckpt, "save_checkpoint", boom)
        trainer.save_model(99, async_write=True)
        with pytest.raises(RuntimeError, match="async checkpoint write failed"):
            trainer._join_pending_save()
        trainer._join_pending_save()  # error is consumed; trainer stays usable

    def test_async_save_ordered_and_complete(self, tmp_path):
        """save_model writes on a background thread; back-to-back saves must
        serialize (the second joins the first) and train() must return with
        the final checkpoint fully on disk (the SIGTERM test and auto-resume
        depend on that)."""
        from mdn_sfm_tpu import checkpoints as ckpt

        cfg = make_cfg(str(tmp_path), v_save="vasync", num_epochs=1)
        t = Trainer(cfg, synthetic=True)
        t.train()
        # overlapping manual saves: 2 then 3, join, both complete
        t.save_model(2)
        t.save_model(3)
        t._join_pending_save()
        for idx in (2, 3):
            folder = ckpt.weights_folder(cfg.log_dir, "vasync", idx)
            assert os.path.exists(os.path.join(folder, "mobile_decoder.msgpack"))
            assert os.path.exists(os.path.join(folder, "adam.msgpack"))
            assert os.path.exists(os.path.join(folder, "meta.json"))


class TestMultiDispatch:
    def test_k_steps_per_dispatch_trains_and_saves(self, tmp_path):
        cfg = make_cfg(str(tmp_path), steps_per_dispatch=4, save_frequency=8,
                       v_save="vk")
        trainer = Trainer(cfg, synthetic=True)
        trainer.train()
        import jax

        assert int(jax.device_get(trainer.state.step)) >= 8
        models_dir = os.path.join(cfg.log_dir, "vk", "models")
        assert any(d.startswith("weights_") for d in os.listdir(models_dir))

    def test_tail_flush_respects_stop_request(self, tmp_path):
        """A stop (SIGTERM) arriving during the epoch-tail flush must halt at
        the next batch boundary — not run the remaining buffered batches —
        so the preemption checkpoint happens inside the grace window. The
        un-stepped batches are re-consumed on resume (position derives from
        the step counter)."""
        import jax

        # 12 samples / batch 2 = 6 batches: one K=4 dispatch + a 2-batch tail
        cfg = make_cfg(str(tmp_path), steps_per_dispatch=4, v_save="vkstop",
                       num_epochs=1, save_frequency=10**6,
                       limit_train_samples=12)
        t = Trainer(cfg, synthetic=True)
        orig = t.step_fn

        def stop_after_first(*a):
            out = orig(*a)
            t._stop_requested = True  # what the SIGTERM handler sets
            return out

        t.step_fn = stop_after_first
        t.train()
        # 4 scanned + 1 flushed; the second tail batch must NOT have run
        assert int(jax.device_get(t.state.step)) == 5


class TestTools:
    def test_epipolar_statics(self, trained):
        """Percentile tool: 8 thresholds out, percentiles file written
        (reference: trainer.py:521-562, source of --threshold 9.22)."""
        tmp, cfg, trainer = trained
        thresholds = trainer.epipolar_statics(num_quantile=50, max_batches=2)
        assert thresholds.shape == (8,)
        assert np.all(np.diff(thresholds) >= 0)  # monotone percentiles
        assert os.path.exists(os.path.join(cfg.other_files_path, "eigen_zhou_percentiles.npy"))

    def test_hyperparameter_try(self, trained):
        tmp, cfg, trainer = trained
        results = trainer.hyperparameter_try("alpha", [0.1, 0.9], batches_per_value=2)
        assert set(results) == {0.1, 0.9}
        for v in results.values():
            assert np.isfinite(v)


class TestFusedMaskProvider:
    def test_trainer_wiring_and_checkpoint_exclusion(self, tmp_path):
        """d2_fuse_step wiring: maskrcnn variables ride the frozen tree, the
        host batch carries no instance_mask, one fused DS step runs, and the
        frozen detectron2 weights never enter the checkpoint layout."""
        cfg = make_cfg(
            str(tmp_path), mode=Mode.DS, mask_provider="maskrcnn",
            d2_max_instances=4, d2_allow_random_weights=True,
        )
        trainer = Trainer(cfg, synthetic=True)
        assert trainer._fused_masks
        assert "maskrcnn" in trainer.frozen

        arrays, idxs = next(iter(trainer.train_loader))
        batch = trainer._device_batch(arrays, [trainer.sample_keys[int(i)] for i in idxs])
        assert "instance_mask" not in batch
        trainer.state, trainer.frozen, metrics, _ = trainer.step_fn(
            trainer.state, trainer.frozen, batch, trainer.rng
        )
        assert np.isfinite(float(metrics["loss"]))

        trainer.save_model(0)
        w0 = os.path.join(cfg.log_dir, "vtest", "models", "weights_0")
        assert os.path.exists(os.path.join(w0, "mobile_decoder.msgpack"))
        assert not os.path.exists(os.path.join(w0, "maskrcnn.msgpack"))


class TestHyperGridDonation:
    def test_hyperparameter_try_survives_donation_and_reuses_frozen(self, tmp_path):
        """Regression: with donate_state=True the grid search donated
        self.frozen's buffers on the first step and crashed on the next
        grid turn ('Array has been deleted'); it now copies the frozen tree
        per turn."""
        cfg = make_cfg(str(tmp_path), donate_state=True)
        trainer = Trainer(cfg, synthetic=True)
        res = trainer.hyperparameter_try("w_s", [0.1, 0.2], batches_per_value=2)
        assert set(res) == {0.1, 0.2}
        assert all(np.isfinite(v) for v in res.values())
        # self.frozen must still be alive and usable afterwards
        arrays, idxs = next(iter(trainer.train_loader))
        batch = trainer._device_batch(arrays, [])
        trainer.state, trainer.frozen, metrics, _ = trainer.step_fn(
            trainer.state, trainer.frozen, batch, trainer.rng
        )
        assert np.isfinite(float(metrics["loss"]))
