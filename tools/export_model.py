"""Export the inference forward as a portable StableHLO artifact (jax.export).

Serving story for the framework (the reference has none — deployment there
means carrying the whole torch code tree). Here the flow+pose+mobile forward
is serialized to a self-contained artifact that any JAX runtime can load and
run WITHOUT the model code, versioned against StableHLO's compatibility
guarantees:

    # export (weights from the reference checkpoint layout)
    python tools/export_model.py --out model.shlo --height 192 --width 640 \
        --log_dir log --version v1 --idx 0

    # load + serve anywhere:
    from jax import export
    fn = export.deserialize(open("model.shlo", "rb").read()).call
    flow, mobile, axisangle, translation = fn(tgt, ref)   # jit-compatible

The exported signature is (tgt, ref) → (flow0, mobile0, axisangle,
translation) at a fixed batch/resolution — static shapes, the TPU-idiomatic
serving contract. Weights are baked into the artifact as constants.

``--check`` round-trips the artifact against the live forward before
writing.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_forward(cfg, variables):
    import jax

    from mdn_sfm_tpu import training as T

    models = T.build_models(cfg)

    def forward(tgt, ref):
        flows, feats = models.flow.apply(variables["flownet"], tgt, ref)
        aa, t = models.pose.apply(variables["posenet"], tgt, ref)
        mobiles = models.mobile.apply(variables["mobile_decoder"], feats, aa, t)
        return flows[0], mobiles[0], aa, t

    return jax.jit(forward)


def export_model(cfg, variables, batch: int, platforms) -> bytes:
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    fwd = build_forward(cfg, variables)
    spec = jax.ShapeDtypeStruct((batch, cfg.height, cfg.width, 3), jnp.float32)
    exported = jexport.export(fwd, platforms=list(platforms))(spec, spec)
    return exported.serialize()


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="model.shlo")
    p.add_argument("--height", type=int, default=192)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--log_dir", default="log")
    p.add_argument("--weights_version", default="v0")
    p.add_argument("--idx", type=int, default=0)
    p.add_argument("--version", default="",
                   help="mobile-decoder checkpoint version (default: same folder)")
    p.add_argument("--platforms", nargs="+", default=["cpu", "tpu"])
    p.add_argument("--check", action="store_true",
                   help="round-trip the artifact against the live forward")
    args = p.parse_args()

    import jax
    import numpy as np

    from mdn_sfm_tpu import checkpoints as ckpt
    from mdn_sfm_tpu import training as T
    from mdn_sfm_tpu.config import Config

    cfg = Config(height=args.height, width=args.width, batch_size=args.batch,
                 compute_dtype="bfloat16").validate()
    models = T.build_models(cfg)
    variables = T.init_variables(cfg, models, jax.random.PRNGKey(0))
    folder = ckpt.weights_folder(args.log_dir, args.weights_version, args.idx)
    if os.path.isdir(folder):
        variables, _, _ = ckpt.load_checkpoint(
            folder, variables, models_to_load=("flownet", "posenet", "mobile_decoder")
        )
        print(f"loaded weights from {folder}")
        if args.version:
            mfolder = ckpt.weights_folder(args.log_dir, args.version, args.idx)
            variables, _, _ = ckpt.load_checkpoint(
                mfolder, variables, models_to_load=("mobile_decoder",)
            )
            print(f"loaded mobile_decoder from {mfolder}")
    else:
        print(f"WARNING: {folder} not found — exporting randomly initialized weights")

    blob = export_model(cfg, variables, args.batch, args.platforms)

    if args.check:
        from jax import export as jexport
        import jax.numpy as jnp

        rng = np.random.default_rng(0)
        tgt = jnp.asarray(rng.normal(size=(args.batch, cfg.height, cfg.width, 3)), jnp.float32)
        ref = jnp.asarray(rng.normal(size=tgt.shape), jnp.float32)
        live = build_forward(cfg, variables)(tgt, ref)
        loaded = jexport.deserialize(blob).call(tgt, ref)
        for a, b in zip(loaded, live):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
        print("round-trip check ok")

    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"wrote {args.out} ({len(blob) / 1e6:.1f} MB, platforms={args.platforms})")


if __name__ == "__main__":
    main()
