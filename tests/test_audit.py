"""Sharding audit tool test: the compiled data-parallel step must emit a
gradient all-reduce (and nothing exotic) on the 8-device virtual mesh —
turning "XLA SPMD inserts the collectives" from a claim into an assertion."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import audit_sharding


class TestAuditSharding:
    def test_dp_step_emits_grad_allreduce_only(self):
        out = audit_sharding.audit(
            n=8, mode_name="TG", height=32, width=64, batch=8,
            fine_tune=False, provider="none", verbose=False,
        )
        stats = out["collectives"]
        assert "all-reduce" in stats, f"no gradient all-reduce emitted: {stats}"
        ar = stats["all-reduce"]
        # grads are all-reduced exactly once (+ small metric/finiteness
        # reductions); bytes must cover the params but not blow past 3×
        assert ar["bytes"] >= out["param_bytes"], (ar, out["param_bytes"])
        assert ar["bytes"] <= 3 * out["param_bytes"], (ar, out["param_bytes"])
        # shard_map path: every collective is an explicit pmean — the
        # partitioner must not have invented ANY resharding collective
        # (all-to-all / collective-permute / all-gather were the round-3
        # GSPMD failure mode; see tools/audit_sharding.py docstring)
        other = {k: s for k, s in stats.items() if k != "all-reduce"}
        assert not other, f"partitioner-invented collectives: {other}"

    def test_ds_fused_step_emits_grad_allreduce_only(self):
        # the round-3 GSPMD failure mode was PROVIDER-dependent (232 invented
        # collectives with the DS Mask R-CNN fused into the step); pin the
        # fused path's collective set too so a future edit can't silently
        # reintroduce resharding collectives through the mask branch
        # (round-4 VERDICT item 5)
        out = audit_sharding.audit(
            n=8, mode_name="DS", height=32, width=64, batch=8,
            fine_tune=False, provider="maskrcnn", verbose=False,
        )
        stats = out["collectives"]
        assert "all-reduce" in stats, f"no gradient all-reduce emitted: {stats}"
        ar = stats["all-reduce"]
        assert ar["bytes"] >= out["param_bytes"], (ar, out["param_bytes"])
        assert ar["bytes"] <= 3 * out["param_bytes"], (ar, out["param_bytes"])
        other = {k: s for k, s in stats.items() if k != "all-reduce"}
        assert not other, f"partitioner-invented collectives: {other}"

    def test_collective_parser(self):
        hlo = """
  %ar = f32[1024]{0} all-reduce(f32[1024]{0} %x), replica_groups={}
  %arv = (f32[1024]{0}, f32[1024]{0:T(8)}) all-reduce(%a, %b), replica_groups={}
  %ars = (f32[512]{0}, f32[512]{0}) all-reduce-start(f32[512]{0} %w)
  %ard = f32[512]{0} all-reduce-done(%ars)
  %ag.1 = bf16[2,128]{1,0} all-gather(bf16[1,128]{1,0} %y), dimensions={0}
  %fusion.1 = f32[4]{0} fusion(f32[4]{0} %z), kind=kLoop, calls=%all-reduce-like
  ROOT %t = (f32[2]{0}) tuple(%ar)
"""
        stats = audit_sharding.collect_collectives(hlo)
        # sync scalar + sync variadic tuple + async done (start not counted)
        assert stats["all-reduce"] == {"count": 3, "bytes": 4096 + 8192 + 2048}
        assert stats["all-gather"] == {"count": 1, "bytes": 512}
        assert "fusion" not in str(stats)
