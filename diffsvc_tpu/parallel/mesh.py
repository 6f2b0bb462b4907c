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


# ----------------------------------------------------------------------
# Multi-host (multi-process JAX). The reference's NCCL process group
# (training/task/base_task.py:254-268, MASTER_ADDR/PORT env) maps to
# jax.distributed.initialize(): every host runs the same single-controller
# program over the global device set; XLA lowers the data-axis gradient
# mean to ICI (intra-slice) / DCN (multi-slice) collectives.

_dist_initialized = False


def maybe_initialize_distributed(hp=None) -> bool:
    """Initialize multi-process JAX when a coordinator is configured.

    Trigger: ``distributed: true`` in the config, or the standard JAX env
    (``JAX_COORDINATOR_ADDRESS`` [+ ``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID``],
    which ``jax.distributed.initialize()`` reads itself; on TPU pods the
    coordinator is auto-detected from the metadata server).
    Returns True when running multi-process. Safe to call more than once.
    """
    global _dist_initialized
    import os

    if _dist_initialized:
        return jax.process_count() > 1
    want = bool(hp.get("distributed")) if hp else False
    want = want or bool(os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if not want:
        # do NOT query jax.process_count() here — that would initialize the
        # backend and make a later in-process distributed init impossible
        return False
    # jax.distributed.initialize() reads JAX_COORDINATOR_ADDRESS itself but
    # NOT num_processes/process_id (those only come from Slurm/OMPI/TPU-pod
    # auto-detection) — pass them explicitly when the plain env vars are set
    # so a hand-launched multi-process run (the reference's MASTER_ADDR/PORT
    # analogue, training/task/base_task.py:254-268) works.
    kwargs = {}
    if os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
    if os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)
    _dist_initialized = True
    print(f"| jax.distributed: process {jax.process_index()}"
          f"/{jax.process_count()}, {len(jax.local_devices())} local"
          f" / {len(jax.devices())} global devices")
    return jax.process_count() > 1


def sync_resume_state(state, epoch: int, global_step: int, best, mesh):
    """Multi-host resume consistency (used by Trainer.fit; no-op when
    single-process): checkpoints are written by process 0 only, so on a
    non-shared filesystem other hosts may have restored nothing (or an
    older step). Broadcast process 0's state/counters to everyone before
    replicating globally — otherwise make_global_tree would silently
    assemble "replicated" arrays with divergent per-host shards and the
    step counters would desync (proc 0 exits at max_updates while the rest
    hang in collectives). Returns (state, epoch, global_step, best)."""
    if jax.process_count() <= 1 or mesh is None:
        return state, epoch, global_step, best
    from jax.experimental import multihost_utils

    state = multihost_utils.broadcast_one_to_all(state)
    meta = np.asarray(
        [epoch, global_step, np.nan if best is None else float(best)],
        np.float64)
    meta = np.asarray(multihost_utils.broadcast_one_to_all(meta))
    epoch, global_step = int(meta[0]), int(meta[1])
    best = None if np.isnan(meta[2]) else float(meta[2])
    state["step"] = np.asarray(global_step, np.int32)
    state = make_global_tree(state, mesh)
    return state, epoch, global_step, best


def make_global_batch(batch: dict, shardings: dict, force: bool = False) -> dict:
    """Assemble global jax.Arrays from the host-local numpy batch.

    Single-process (and not ``force``): returns the batch unchanged — the
    jitted step's ``in_shardings`` place it. Multi-process: every host
    builds the SAME global batch (the bucketing RNG is seeded identically
    on all hosts, mirroring the reference's rank-symmetric sampler,
    training/task/tts.py:85-88), and each host's devices pull the slices
    they own via ``jax.make_array_from_callback``.

    Scaling note: the callback only materializes on-device the shards a
    host's devices own (no cross-host transfer), but each host still
    collates the full global batch on CPU. For this model family the
    binary dataset is pre-featurized, so collation is pad+copy and the
    prefetch thread hides it; if host CPU ever bottlenecks at pod scale,
    switch to per-host collation of a row slice +
    ``jax.make_array_from_process_local_data``.
    """
    if jax.process_count() == 1 and not force:
        return batch
    out = {}
    for k, v in batch.items():
        sh = shardings.get(k)
        if sh is None or not hasattr(v, "shape"):
            out[k] = v
        else:
            arr = np.asarray(v)
            out[k] = jax.make_array_from_callback(
                arr.shape, sh, lambda idx, a=arr: a[idx])
    return out


def make_global_tree(tree, mesh: Mesh, force: bool = False):
    """Replicate a host-local pytree (params/opt state) onto the global
    mesh. Every host must hold identical values (same PRNG seed / same
    checkpoint file) — the callback serves the full array to each device."""
    if jax.process_count() == 1 and not force:
        return tree
    repl = replicated(mesh)

    def _globalize(a):
        arr = np.asarray(a)
        return jax.make_array_from_callback(arr.shape, repl,
                                            lambda idx, x=arr: x[idx])

    return jax.tree.map(_globalize, tree)
