"""Checkpoint / resume.

Reproduces the reference's checkpoint contract (train_xe.py:241-254):
a single file holding {epoch, model params, optimizer state, settings,
idx2word, sentiment_categories, dataset_name, corpus_type}, with
metadata-equality validation on resume (train_xe.py:42-51) and filenames
encoding epoch/losses/timestamp. The RL stage's multi-source bootstrap
(xe best + sentiment + ss-cls checkpoints, train_rl.py:57-98) is a
first-class ``bootstrap`` helper here.

Storage: flax.serialization msgpack for the array pytrees + a JSON metadata
header, in one file:  [8-byte little-endian header length][JSON][msgpack].
Process 0 writes; leaves sharded across processes (multi-host vocab-sharded
params/moments) are assembled by a process allgather inside save(), so
save() is a collective — every process calls it (proved end-to-end by the
4-process run in tools/multiprocess_check.py).
"""
from __future__ import annotations

import json
import os
import struct
import time
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization

from ..config import Settings


class CheckpointError(RuntimeError):
    pass


def _to_host(tree):
    """Fetch every leaf to host numpy. A leaf sharded across processes
    (multi-host: data- or vocab-sharded params / optimizer moments) is
    not fully addressable and a bare np.asarray would raise — those are
    assembled with a process allgather first. COLLECTIVE under
    multi-host: every process must call this (and therefore save())."""
    def fetch(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            from jax.experimental import multihost_utils
            return np.asarray(
                multihost_utils.process_allgather(x, tiled=True))
        return np.asarray(x)

    return jax.tree_util.tree_map(fetch, tree)


def save(path: str, params: Any, opt_state: Any, metadata: Dict) -> None:
    """Multi-host: call from EVERY process (the host-gather of sharded
    leaves is a collective); only process 0 writes the file."""
    payload = {"params": _to_host(params)}
    if opt_state is not None:
        payload["opt_state"] = _to_host(serialization.to_state_dict(opt_state))
    if jax.process_index() != 0:
        return
    blob = serialization.to_bytes(payload)
    header = json.dumps(metadata, sort_keys=True).encode()
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(tmp, "wb") as f:
        f.write(struct.pack("<Q", len(header)))
        f.write(header)
        f.write(blob)
    os.replace(tmp, path)


def load_metadata(path: str) -> Dict:
    with open(path, "rb") as f:
        (hlen,) = struct.unpack("<Q", f.read(8))
        return json.loads(f.read(hlen).decode())


def load(path: str, params_template: Any,
         opt_state_template: Any = None) -> Tuple[Any, Any, Dict]:
    """Restore into the given templates (shapes/dtypes must match)."""
    with open(path, "rb") as f:
        (hlen,) = struct.unpack("<Q", f.read(8))
        metadata = json.loads(f.read(hlen).decode())
        blob = f.read()
    target = {"params": params_template}
    if opt_state_template is not None:
        target["opt_state"] = serialization.to_state_dict(opt_state_template)
    payload = serialization.from_bytes(target, blob)
    params = payload["params"]
    opt_state = None
    if opt_state_template is not None:
        opt_state = serialization.from_state_dict(opt_state_template,
                                                  payload["opt_state"])
    return params, opt_state, metadata


def validate_metadata(metadata: Dict, *, settings: Settings,
                      idx2word=None, sentiment_categories=None,
                      dataset_name: Optional[str] = None,
                      corpus_type: Optional[str] = None) -> None:
    """The reference asserts settings/vocab/dataset equality on resume
    (train_xe.py:42-51) — the only schema validation it has. Same here, with
    actual error messages."""
    ck = Settings.from_dict(metadata.get("settings", {}))
    if ck != settings:
        raise CheckpointError(
            f"settings mismatch: checkpoint {ck} != current {settings}")
    if idx2word is not None and metadata.get("idx2word") is not None:
        if list(metadata["idx2word"]) != list(idx2word):
            raise CheckpointError("idx2word mismatch with checkpoint")
    if sentiment_categories is not None and \
            metadata.get("sentiment_categories") is not None:
        if list(metadata["sentiment_categories"]) != list(
                sentiment_categories):
            raise CheckpointError("sentiment_categories mismatch")
    for name, val in (("dataset_name", dataset_name),
                      ("corpus_type", corpus_type)):
        if val is not None and metadata.get(name) is not None \
                and metadata[name] != val:
            raise CheckpointError(
                f"{name} mismatch: {metadata[name]} != {val}")


def checkpoint_name(stage_dir: str, epoch: int, train_loss: float,
                    val_loss: float) -> str:
    """Filename convention mirroring the reference
    (train_xe.py:252-253: model_<epoch>_<train>_<val>_<mmdd-HHMM>.pth)."""
    stamp = time.strftime("%m%d-%H%M")
    return os.path.join(
        stage_dir, f"model_{epoch}_{train_loss:.4f}_{val_loss:.4f}_{stamp}.ckpt")
