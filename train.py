"""Train entry point (reference: train.py:7-22).

    python train.py --data_path kitti/raw_data --v_save v1
    python train.py --synthetic          # smoke run without KITTI on disk
    python train.py --epipolar_statics   # regenerate the --threshold calibration
    python train.py --hyper w_d2_sim --hyper_values 0.01 0.05 0.1
"""

from __future__ import annotations

import argparse

from mdn_sfm_tpu.config import add_train_args, from_args
from mdn_sfm_tpu.trainer import Trainer


def main() -> None:
    from mdn_sfm_tpu.parallel import maybe_initialize_distributed
    from mdn_sfm_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    maybe_initialize_distributed()

    parser = argparse.ArgumentParser(description="MDN-SfM TPU train")
    add_train_args(parser)
    parser.add_argument("--synthetic", action="store_true",
                        help="train on synthetic data (smoke test, no KITTI needed)")
    parser.add_argument("--epipolar_statics", action="store_true",
                        help="compute epipolar percentile thresholds instead of training "
                             "(reference: trainer.py:521-562)")
    parser.add_argument("--hyper", type=str, default="",
                        help="hyperparameter grid search over this config field "
                             "(reference: trainer.py:384-441)")
    parser.add_argument("--hyper_values", nargs="+", type=float, default=[])
    parser.add_argument("--debug_nans", action="store_true",
                        help="per-op NaN checks (the reference's autograd "
                             "anomaly-mode analog, trainer.py:234)")
    args = parser.parse_args()
    cfg = from_args(args)

    trainer = Trainer(cfg, synthetic=args.synthetic, debug_nans=args.debug_nans)
    if args.epipolar_statics:
        thresholds = trainer.epipolar_statics()
        print("Thresholds are :", thresholds)
    elif args.hyper:
        print(trainer.hyperparameter_try(args.hyper, args.hyper_values))
    else:
        trainer.train()


if __name__ == "__main__":
    main()
