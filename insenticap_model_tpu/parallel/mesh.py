"""Device mesh + sharding utilities.

The reference is single-GPU (SURVEY.md §2.6) — this layer is new capability,
designed the JAX way: meshes over ICI, batch axes sharded with
NamedSharding, and every collective left to XLA's GSPMD partitioner (jit
with sharded operands inserts the psum/all-gather — no hand-written
NCCL-style code).

Two populated sharding stories:

- ``data`` (the production default): batch sharded, parameters replicated,
  gradient reduction by XLA. Right for this model scale (<100M params).
- ``data x model`` (2-D): additionally shards the VOCAB dimension of the
  captioner's embedding + classifier over the ``model`` axis
  (captioner_shardings) — the two parameter tensors that dominate memory
  at production vocab (~10k x hid). Purely annotation-driven: the train
  steps and the beam decoder are unchanged; GSPMD partitions the
  log_softmax/argmax reductions. dryrun_multichip and the sharding tests
  assert both stories match single-device numerics.
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


def captioner_shardings(mesh: Mesh, params):
    """NamedSharding pytree for captioner params with the vocab dimension
    sharded over the ``model`` mesh axis; everything else replicated.

    Sharded tensors (the vocab-sized ones — together ~95% of captioner
    parameters at the production 10k vocab, reference opts.py settings):
      - word_embed.table [V, E]   -> P('model', None)
      - classifier.w     [H, V]   -> P(None, 'model')
      - classifier.b     [V]      -> P('model')
    The model-axis size must divide V. Use with a ("data", "model") mesh
    from make_mesh((dp, tp)).
    """
    rep = replicated(mesh)

    def rule(path, x):
        names = {getattr(p, "key", None) for p in path}
        if "classifier" in names:
            if x.ndim == 2:
                return NamedSharding(mesh, P(None, "model"))
            return NamedSharding(mesh, P("model"))
        if "word_embed" in names and x.ndim == 2:
            return NamedSharding(mesh, P("model", None))
        return rep

    return jax.tree_util.tree_map_with_path(rule, params)


def place(tree, shardings):
    """device_put every leaf according to a matching sharding pytree."""
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), tree, shardings)
