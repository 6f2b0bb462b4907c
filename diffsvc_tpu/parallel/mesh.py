"""Device mesh + sharding rules.

The TPU-native replacement for the reference's DP/DDP/NCCL stack
(SURVEY.md §2.10, §5.8): one ``jax.sharding.Mesh`` whose ``data`` axis
shards the batch; parameters and optimizer state are replicated
(``NamedSharding(P())``); gradient averaging is the global-batch mean inside
the jitted step — XLA lowers the cross-device reduction to ICI collectives.

The mesh is built with room for more axes: ``model`` (tensor parallel over
channel dims) and ``seq`` (mel-time sharding with halo exchange for the
dilated convs) slot in here without touching the training loop.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axes: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = [n] + [1] * (len(axes) - 1)
    assert int(np.prod(shape)) == n, (shape, n)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axes))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis split over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Place numpy batch dict on the mesh with batch-axis sharding."""
    bs = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if hasattr(v, "ndim") and v.ndim >= 1:
            out[k] = jax.device_put(v, bs)
        else:
            out[k] = v
    return out


def data_parallel_world_size(mesh: Optional[Mesh]) -> int:
    if mesh is None:
        return 1
    return mesh.shape.get("data", 1)
