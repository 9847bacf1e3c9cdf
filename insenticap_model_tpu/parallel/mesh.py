"""Device mesh + sharding utilities.

The reference is single-GPU (SURVEY.md §2.6) — this layer is new capability,
designed the JAX way: a 1-D ``data`` mesh over ICI, batch axes sharded with
NamedSharding, parameters replicated, and gradient reduction left to XLA's
collectives (jit with sharded inputs inserts the psum — no hand-written
NCCL-style code). Model parallelism is intentionally out of scope at this
model scale (<100M params); the mesh abstraction still accepts extra axes so
larger meshes compile (dryrun_multichip exercises it).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DEFAULT_AXIS_NAMES = ("data", "model", "pipe", "expert")


def make_mesh(shape: Optional[Sequence[int]] = None,
              axis_names: Optional[Sequence[str]] = None,
              devices=None) -> Mesh:
    """shape None/() -> 1-D mesh over all devices; any explicit shape
    (including (1,)) is honored. Extra dimensions get default axis names
    (data, model, pipe, expert, axis4, ...)."""
    devices = devices if devices is not None else jax.devices()
    if not shape:
        shape = (len(devices),)
    if axis_names is None:
        axis_names = list(DEFAULT_AXIS_NAMES)
        while len(axis_names) < len(shape):
            axis_names.append(f"axis{len(axis_names)}")
    if len(axis_names) < len(shape):
        raise ValueError(f"{len(shape)}-d mesh needs {len(shape)} axis "
                         f"names, got {axis_names}")
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh shape {shape} needs {n} devices, "
                         f"have {len(devices)}")
    dev_array = np.array(devices[:n]).reshape(shape)
    return Mesh(dev_array, axis_names=tuple(axis_names[:len(shape)]))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch pytree with the batch axis sharded over `data`.
    Batch sizes must divide the mesh's data-axis size (fixed-shape batching
    guarantees this)."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree):
    s = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)
