"""Device mesh + sharding helpers — the TPU-native replacement for the
reference's ``nn.DataParallel`` wrap (CVC-YOLOv3/train.py:193-195).

The reference's only parallelism is single-process data parallelism
(replicate → scatter → gather each step). Here DP is expressed the XLA way:
a 1-D ``Mesh`` over all chips, batch arrays sharded on the ``data`` axis,
params/state replicated, and ONE ``jax.jit`` of the whole train step — XLA
inserts the gradient all-reduce over ICI itself (psum on the backward pass),
overlapping it with computation. No other parallelism axes are introduced:
the models are small CNNs and capability parity requires exactly DP
(SURVEY.md §2.5).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over ICI. ``n_devices`` defaults to all."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place a host batch pytree with the leading axis sharded over the mesh."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def replicate(mesh: Mesh, tree):
    """Replicate params/state across the mesh."""
    r = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, r), tree)


def pad_batch_to_devices(arr, n_devices: int, mode: str = "repeat"):
    """Pad the leading axis to a multiple of the mesh size so the last
    partial batch keeps the compiled shape. Returns (padded, n_real).

    mode="repeat" (default) wraps around onto real samples — zero padding
    would poison the YOLO loss (an all-zero target row decodes to a
    log(1e-16) wh target at cell (0,0)); repeating merely over-weights a
    few samples in the one partial batch per epoch.
    """
    n = arr.shape[0]
    rem = (-n) % n_devices
    if rem == 0:
        return arr, n
    if mode == "repeat":
        idx = np.arange(rem) % n
        pad = np.asarray(arr)[idx]
    else:
        pad = np.zeros((rem,) + arr.shape[1:], dtype=arr.dtype)
    return np.concatenate([np.asarray(arr), pad], axis=0), n
