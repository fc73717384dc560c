"""1-D data-parallel mesh over all TPU chips.

Design (SURVEY.md §5): Mesh(('data',)) across every visible device; inputs
sharded on the batch axis, params/frozen weights replicated. ``jax.jit`` with
these shardings makes XLA SPMD insert the gradient all-reduce over ICI
automatically — the model (a few M params) needs no TP/PP.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def make_mesh(num_data_shards: int = 0, devices: list | None = None) -> Mesh:
    """Build the 1-D data mesh.

    Args:
        num_data_shards: number of devices on the 'data' axis; 0 = all
            visible devices.
        devices: explicit device list (tests pass CPU devices here).
    """
    devices = devices if devices is not None else jax.devices()
    n = num_data_shards or len(devices)
    return Mesh(np.array(devices[:n]), (DATA_AXIS,))


def make_spatial_mesh(num_shards: int = 0, devices: list | None = None) -> Mesh:
    """1-D mesh over the 'spatial' axis — image-width sharding for single
    large-image inference (the full-res Mask R-CNN GT tooling), where there
    is no batch to split. Convolutions partition with XLA-inserted halo
    exchanges over ICI; the tiny ROI stages all-gather.

    No reference analog (detectron2 runs one image per GPU); this is the
    TPU-native way to cut full-res latency below one chip's worth."""
    devices = devices if devices is not None else jax.devices()
    n = num_shards or len(devices)
    return Mesh(np.array(devices[:n]), (SPATIAL_AXIS,))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a batch with its leading axis sharded over the mesh.

    Single process: ``batch`` is the global batch; the per-device slice rides
    to its chip (the host-sharded analog of the reference's pin_memory H2D
    copies, trainer.py:69-71). Multi-process (one process per host over DCN,
    SURVEY.md §5): each host passes its LOCAL slice — global batch size
    ``local · process_count``, assembled positionally (process p's rows land
    on its own chips; no cross-host data movement)."""
    s = data_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(s, np.asarray(x)), batch
        )
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Replicate a pytree (params, frozen weights) on every device.

    Multi-process: every host passes the identical host-local tree (same
    seed → same init; same checkpoint files → same load) and provides the
    copies for its own chips."""
    s = replicated(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(s, np.asarray(x)), tree
        )
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def host_local(x: Any) -> np.ndarray:
    """This host's rows of a batch-sharded global array (np.asarray raises on
    non-fully-addressable arrays). Fully-addressable inputs pass through."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        shards = sorted(
            x.addressable_shards, key=lambda sh: sh.index[0].start or 0
        )
        return np.concatenate([np.asarray(sh.data) for sh in shards], axis=0)
    return np.asarray(x)


def global_batch_to_device(mesh: Mesh, batch: Any) -> Any:
    """Alias kept for call sites that only have a single device."""
    if np.prod(mesh.devices.shape) == 1:
        return jax.tree.map(jax.device_put, batch)
    return shard_batch(mesh, batch)
