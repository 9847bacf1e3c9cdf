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


def make_mesh(shape: Optional[Sequence[int]] = None,
              axis_names: Sequence[str] = ("data",),
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices),)
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
