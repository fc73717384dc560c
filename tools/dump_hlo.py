"""Dump the optimized HLO of the TG K-step train program and attribute the
pure layout-copy ops to their JAX source locations.

The profile (tools/profile_step.py) reports ~2.9 ms/step of `%copy.NNN` ops
— layout-assignment conversions between {2,1,3,0}-family and {3,0,2,1}
(conv-preferred) activation layouts. This tool compiles the same program,
prints every `copy` instruction in the optimized module together with its
operand's producing instruction and both ops' `metadata.op_name` (the JAX
jaxpr path XLA carries through compilation), so each copy can be tied to a
model-code boundary for a `with_layout_constraint` experiment (round-4
VERDICT item 8 — the experiment's outcome is recorded in PARITY.md's
"measured dead ends").

Usage: python tools/dump_hlo.py [--height 192 --width 640 --batch 4 --k 8
                                 --mode TG] [--out /tmp/kstep.hlo.txt]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=192)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--mode", default="TG")
    ap.add_argument("--out", default="/tmp/kstep.hlo.txt")
    args = ap.parse_args()

    from mdn_sfm_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from mdn_sfm_tpu import training as T
    from mdn_sfm_tpu.config import Config, Mode
    from mdn_sfm_tpu.data.synthetic import synthetic_batch

    cfg = Config(
        height=args.height,
        width=args.width,
        batch_size=args.batch,
        mode=Mode(args.mode),
        threshold=9.22,
        compute_dtype="bfloat16",
    ).validate()

    models = T.build_models(cfg)
    variables = T.init_variables(cfg, models, jax.random.PRNGKey(0))
    tx = T.make_optimizer(cfg, steps_per_epoch=1000)
    state, frozen = T.create_train_state(cfg, models, variables, tx)
    kstep = T.make_multi_train_step(cfg, models, tx, mask_fn=None)

    colors, K = synthetic_batch(args.batch * args.k, args.height, args.width, seed=0)
    batches = {
        "colors_u8": jnp.asarray(colors.reshape(args.k, args.batch, *colors.shape[1:])),
        "K": jnp.asarray(K.reshape(args.k, args.batch, 4, 4)),
    }
    rng = jax.random.PRNGKey(1)

    compiled = kstep.lower(state, frozen, batches, rng).compile()
    modules = compiled.runtime_executable().hlo_modules()
    # some backends (plausibly the axon tunnel) return no HLO modules from
    # the runtime executable; fall back to the pre-backend as_text (ADVICE r4)
    text = modules[0].to_string() if modules else compiled.as_text()
    with open(args.out, "w") as f:
        f.write(text)
    print(f"wrote {len(text.splitlines())} HLO lines to {args.out}", file=sys.stderr)

    # index: instruction name -> its full line
    producer: dict[str, str] = {}
    for line in text.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?([\w.-]+) = ", line)
        if m:
            producer[m.group(1)] = line.strip()

    def op_name(line: str) -> str:
        m = re.search(r'op_name="([^"]*)"', line)
        return m.group(1) if m else "?"

    n = 0
    for line in text.splitlines():
        s = line.strip()
        m = re.match(r"%?(copy[\w.]*) = (\S+) copy\(", s)
        if not m:
            continue
        name, shape = m.group(1), m.group(2)
        ops = re.findall(r"%([\w.-]+)", s.split("copy(", 1)[1])
        src = producer.get(ops[0], "") if ops else ""
        src_shape = re.match(r"%?[\w.-]+ = (\S+)", src)
        print(f"\n{name}: {src_shape.group(1) if src_shape else '?'} -> {shape}")
        print(f"  copy   op_name: {op_name(s)}")
        print(f"  source op_name: {op_name(src)}  ({ops[0] if ops else '?'})")
        n += 1
    print(f"\n{n} copy instructions total", file=sys.stderr)


if __name__ == "__main__":
    main()
