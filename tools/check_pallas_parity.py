"""On-device (compiled, NOT interpret-mode) parity check for the Pallas
epipolar kernel at real training shapes.

tests/test_pallas_ops.py exercises the kernel in interpreter mode on CPU;
this script is the verify-recipe companion that runs the COMPILED kernel on
the actual TPU and asserts it matches the jnp reference — so a Mosaic
regression can't hide behind bench noise.

    python tools/check_pallas_parity.py            # 192x640 and 128x416
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from mdn_sfm_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from mdn_sfm_tpu.geometry import epipolar_residual, transformation_from_parameters  # noqa: E402
from mdn_sfm_tpu.ops import epipolar_abs_residual_pallas  # noqa: E402


def check(h: int, w: int, b: int = 4, tol: float = 1e-5) -> float:
    rng = np.random.default_rng(0)
    flow = jnp.asarray(rng.normal(scale=3.0, size=(b, h, w, 2)).astype(np.float32))
    aa = jnp.asarray(rng.normal(scale=0.01, size=(b, 1, 1, 3)).astype(np.float32))
    t = jnp.asarray(rng.normal(scale=0.05, size=(b, 1, 1, 3)).astype(np.float32))
    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[1, 1], K[0, 2], K[1, 2] = 0.58 * w, 1.92 * h, 0.5 * w, 0.5 * h
    inv_K = jnp.asarray(np.linalg.inv(K)[None].repeat(b, 0))
    cam = transformation_from_parameters(aa, t)
    R, tr = cam[:, :3, :3], cam[:, :3, 3]

    ref = jax.jit(lambda f: jnp.abs(epipolar_residual(f, inv_K, R, tr)))(flow)
    got = jax.jit(lambda f: epipolar_abs_residual_pallas(f, inv_K, R, tr))(flow)
    err = float(jnp.max(jnp.abs(got - ref)) / (jnp.max(jnp.abs(ref)) + 1e-12))
    status = "ok" if err <= tol else "FAIL"
    print(f"pallas epipolar parity @ {h}x{w} bs{b}: rel err {err:.2e} [{status}]")
    return err


def main() -> int:
    backend = jax.default_backend()
    if backend not in ("tpu", "axon"):
        print(f"WARNING: running on {backend}, not TPU — compiled-TPU parity not exercised")
    worst = max(check(192, 640), check(128, 416))
    return 0 if worst <= 1e-5 else 1


if __name__ == "__main__":
    raise SystemExit(main())
