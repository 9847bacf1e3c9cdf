"""Encode stage: batched image->features + concept top-k.

Extracted from serving_daemon.py (VERDICT r4 next #7); see that module's
docstring for the two-stage pipeline design this batcher is the front
half of.
"""
from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from .batching import (DEFAULT_ENCODE_BUCKETS, _BatcherBase, _RequestBase,
                       _require_mesh_multiples)

_FC_KEY = "fc"   # stats bucket label for feature-mode concept-only rows


class _EncodeRequest(_RequestBase):
    __slots__ = ("img", "fc", "key")

    def __init__(self, img, fc, key):
        super().__init__()
        self.img = img       # uint8 [H, W, 3] (image mode) or None
        self.fc = fc         # float32 [Ff] (feature mode) or None
        self.key = key       # "{H}x{W}" or _FC_KEY — the grouping key


class EncodeBatcher(_BatcherBase):
    """Coalesce image-encode (+ concept top-k) requests into batched
    device calls (VERDICT r3 weak #2: the encoder must never run bs=1
    under concurrent load — bs=1 is ~4x off the batched rate,
    tools/bench_encoder.py).

    Requests group by RESIZE BUCKET (only same-shape images can stack;
    serve.py resizes to ``preprocessing.DEFAULT_BUCKET_SHAPES`` first),
    pad up the ``batch_buckets`` ladder, and run one
    ``encoder.forward_raw_batch`` per shape group. Concept top-k rides
    the SAME padded batch — zero extra queuing stages. Feature-mode
    requests (fc already known, only top-k needed) form their own group
    on the same ladder, so feature-mode concept detection batches too.

    Parameters
    ----------
    enc_apply : jitted ``imgs_u8 [B,H,W,3] -> (fc [B,Ff], att [B,a,a,Fa])``
        with encoder params bound, or None (feature-only daemon: image
        submissions raise upstream).
    cpt_apply : jitted ``fc [B,Ff] -> top [B,K]`` concept top-k with
        detector params bound.
    shape_buckets : the resize ladder; images MUST arrive already
        resized to one of these (static-shape discipline — an unknown
        shape would silently compile a new multi-minute program).
    batch_buckets : ascending batch ladder shared by all shape groups
        (and the feature-mode group). One compile per (shape, batch)
        pair.
    mesh : optional jax.sharding.Mesh — multi-chip encode: batches shard
        over the mesh's `data` axis (the encoder is pure-XLA conv, so
        plain GSPMD partitions it — no shard_map needed, unlike the
        decode program's pallas kernels). enc_apply/cpt_apply must close
        over params REPLICATED on the same mesh (parallel.mesh.replicate)
        and every batch bucket must be a multiple of the data-axis size
        (default_encode_buckets(mesh) rounds the default ladder).
    """

    def __init__(self, enc_apply: Optional[Callable],
                 cpt_apply: Callable, *,
                 fc_dim: int,
                 shape_buckets: Sequence[Tuple[int, int]],
                 batch_buckets: Sequence[int] = DEFAULT_ENCODE_BUCKETS,
                 max_wait_s: float = 0.005, max_queue: int = 1024,
                 mesh=None):
        if list(batch_buckets) != sorted(set(batch_buckets)):
            raise ValueError(f"batch_buckets must be ascending/unique: "
                             f"{batch_buckets}")
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            _require_mesh_multiples(batch_buckets, mesh,
                                    "default_encode_buckets(mesh)")
            self._batch_sharding = NamedSharding(mesh, P("data"))
        self._enc_apply = enc_apply
        self._cpt_apply = cpt_apply
        self._fc_dim = int(fc_dim)
        self._shapes = tuple((int(h), int(w)) for h, w in shape_buckets)
        self._batch_buckets = tuple(int(b) for b in batch_buckets)
        keys = [f"{h}x{w}" for h, w in self._shapes] + [_FC_KEY]
        super().__init__(cap_n=self._batch_buckets[-1],
                         max_wait_s=max_wait_s, max_queue=max_queue,
                         bucket_keys=keys, name="isc-encode")

    # -- public API -------------------------------------------------------

    def submit_image(self, img_u8, timeout: Optional[float] = None,
                     enqueue_timeout: Optional[float] = None):
        """Encode one bucket-shaped uint8 RGB image. Blocks until its
        batch completes. Returns (fc [Ff] f32, att [a,a,Fa] f32,
        top [K] int concept indices)."""
        if self._closed:
            raise RuntimeError("batcher is closed")
        if self._enc_apply is None:
            raise ValueError("image mode needs an encoder "
                             "(--resnet101_ckpt)")
        img_u8 = np.asarray(img_u8)
        if (img_u8.dtype != np.uint8 or img_u8.ndim != 3
                or tuple(img_u8.shape[:2]) not in self._shapes
                or img_u8.shape[2] != 3):
            raise ValueError(
                f"image shape {img_u8.shape}/{img_u8.dtype} is not a "
                f"uint8 RGB resize bucket {self._shapes} — resize host-"
                f"side first (the ladder's programs are static-shaped)")
        h, w = img_u8.shape[:2]
        r = _EncodeRequest(img_u8, None, f"{h}x{w}")
        return self._enqueue_and_wait(r, timeout, enqueue_timeout)

    def submit_fc(self, fc, timeout: Optional[float] = None,
                  enqueue_timeout: Optional[float] = None):
        """Concept top-k for an already-extracted fc row (feature-mode
        requests batch their top-k here instead of running bs=1).
        Returns top [K] int concept indices."""
        if self._closed:
            raise RuntimeError("batcher is closed")
        fc = np.asarray(fc, np.float32)
        if fc.shape != (self._fc_dim,):
            raise ValueError(f"fc shape {fc.shape} != ({self._fc_dim},)")
        r = _EncodeRequest(None, fc, _FC_KEY)
        return self._enqueue_and_wait(r, timeout, enqueue_timeout)

    # -- dispatch/finish --------------------------------------------------

    def _dispatch(self, batch: List[_EncodeRequest]) -> None:
        """Group rows by shape key, pad each group up the batch ladder,
        launch one encoder (+top-k) program per group. All groups of one
        collect() launch together as one _fq item (they shipped
        back-to-back; double buffering stays batch-level)."""
        groups: Dict[str, List[_EncodeRequest]] = {}
        for r in batch:
            groups.setdefault(r.key, []).append(r)
        launched = []
        for key, rs in groups.items():
            n = len(rs)
            bucket = next(b for b in self._batch_buckets if b >= n)
            pad = bucket - n
            if key == _FC_KEY:
                fcs = np.stack([r.fc for r in rs]
                               + [rs[-1].fc] * pad)
                top = self._cpt_apply(self._stage(fcs))
                launched.append((rs, key, pad, None, None, top))
            else:
                imgs = np.stack([r.img for r in rs]
                                + [rs[-1].img] * pad)
                fc, att = self._enc_apply(self._stage(imgs))
                top = self._cpt_apply(fc)
                launched.append((rs, key, pad, fc, att, top))
        self._fq.put(launched)

    def _finish(self, launched) -> None:
        for rs, key, pad, fc, att, top in launched:
            try:
                top = np.asarray(top)
                if fc is not None:
                    fc = np.asarray(fc, np.float32)
                    att = np.asarray(att, np.float32)
            except BaseException as e:
                self._fail_batch(rs, e)
                continue
            self._record_batch(rs, key, pad)
            for i, r in enumerate(rs):
                r.result = top[i] if fc is None \
                    else (fc[i], att[i], top[i])
                r.done.set()

    # -- warmup -----------------------------------------------------------

    def warm(self, batch_buckets: Optional[Sequence[int]] = None) -> None:
        """Pre-compile every (shape, batch) encoder program plus the
        feature-mode top-k ladder. The encode programs are the expensive
        compiles (full ResNet trunk) — pass a sub-ladder to trim startup
        time at the cost of one live compile per untouched bucket."""
        for b in (batch_buckets or self._batch_buckets):
            # _stage, not jnp.asarray: jit caches per input SHARDING, so
            # in mesh mode an unsharded warmup would compile programs
            # real traffic never reuses
            if self._enc_apply is not None:
                for h, w in self._shapes:
                    fc, _ = self._enc_apply(
                        self._stage(np.zeros((b, h, w, 3), np.uint8)))
                    np.asarray(self._cpt_apply(fc)).sum()  # sync (scalar)
            top = self._cpt_apply(
                self._stage(np.zeros((b, self._fc_dim), np.float32)))
            np.asarray(top).sum()
