"""MDN-SfM TPU — a TPU-native (JAX/XLA/Pallas/pjit) rebuild of chenluchu/MDN_SfM.

A self-/semi-supervised pipeline that learns a pixel-level dynamic-object
("mobile") probability map on KITTI from structure-from-motion signals: a
frozen optical-flow net and pose net generate per-pixel epipolar-violation
maps that supervise a trainable mobile decoder, in five modes
(SN/T/TG self-supervised epipolar variants; DS/DC semi-supervised fusion
with instance masks).

Layout
------
- :mod:`mdn_sfm_tpu.config`    — dataclass config + mode enum (reference: options.py / options_eval.py)
- :mod:`mdn_sfm_tpu.geometry`  — pure-JAX SE(3)/epipolar geometry (reference: networks/layers.py, loss_utils.py)
- :mod:`mdn_sfm_tpu.losses`    — loss orchestration (reference: loss_functions.py)
- :mod:`mdn_sfm_tpu.models`    — Flax models (reference: networks/)
- :mod:`mdn_sfm_tpu.data`      — input pipeline with on-device augmentation (reference: datasets/)
- :mod:`mdn_sfm_tpu.masks`     — instance-mask providers (reference: detectron2 integration)
- :mod:`mdn_sfm_tpu.ops`       — Pallas kernels + fused XLA ops
- :mod:`mdn_sfm_tpu.parallel`  — mesh / sharding helpers (data parallelism over ICI)
- :mod:`mdn_sfm_tpu.native`    — C++ components (RLE codec, mask bbox)

All image tensors are NHWC (TPU-native layout); the reference is NCHW.
"""

__version__ = "0.1.0"
