"""Multi-HOST serving control plane (lockstep dispatch mirroring).

Extracted from serving_daemon.py (VERDICT r4 next #7). When a
``DynamicBatcher``'s mesh spans ``jax.process_count() > 1`` processes,
multi-controller JAX requires every process to issue identical
programs: process 0 owns HTTP + batching; before each device dispatch
it broadcasts a fixed-shape control vector [opcode, bucket, run_detect]
and then the host batch arrays (shapes derivable from the control
vector on every process), and every other process mirrors the dispatch
from ``follower_loop`` — stage its stripe, run the identical sharded
programs, allgather results — keeping all Gloo/ICI collectives in one
global order. In this mode dispatch is SYNCHRONOUS (compute + allgather
complete on the dispatch thread): the double-buffer pipeline would
interleave two batches' collectives across processes.

The functions here take the batcher as first argument (its jitted
programs, shardings, and shapes live there); ``DynamicBatcher`` exposes
them as thin methods so its call sites and the multi-host tests
(tools/multihost_daemon_check.py, tests/test_multiprocess.py) are
unchanged by the split. Proved token-exact vs single-process with 2 and
4 real processes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .batching import AUTO

MP_EXEC, MP_STOP = 0, 1


def mp_dispatch(b, bucket, fc_h, att_h, sentis_h, forced_h, run_detect):
    """Process 0 side: announce the step, ship the host batch to every
    process, run the lockstep execution."""
    from jax.experimental import multihost_utils as mhu
    ctrl = np.asarray([MP_EXEC, bucket, int(run_detect)], np.int32)
    mhu.broadcast_one_to_all(ctrl)
    fc_h = np.asarray(mhu.broadcast_one_to_all(fc_h))
    att_h = np.asarray(mhu.broadcast_one_to_all(att_h))
    sentis_h = np.asarray(mhu.broadcast_one_to_all(sentis_h))
    forced_h = np.asarray(mhu.broadcast_one_to_all(forced_h))
    return mp_exec(b, fc_h, att_h, sentis_h, forced_h, run_detect)


def mp_exec(b, fc_h, att_h, sentis_h, forced_h, run_detect):
    """Every process: stage its stripe of the (identical) host batch as
    global data-sharded arrays, run the sharded programs, allgather full
    results to the host. Collective order is fixed:
    [detect?] -> serve -> 3x allgather."""
    from jax.experimental import multihost_utils as mhu
    sh = b._batch_sharding

    def mk(v):
        # every process holds the full host batch; each provides the
        # blocks for ITS addressable devices (handles any device ->
        # process layout)
        return jax.make_array_from_callback(
            v.shape, sh, lambda idx: v[idx])

    fc, att = mk(fc_h), mk(att_h)
    sentis, forced = mk(sentis_h), mk(forced_h)
    if run_detect:
        detected = b._detect(b._senti_params, att)
        labels = jnp.where(forced == AUTO, detected, forced)
    else:
        labels = forced
    seqs, scores = b._serve(b._cap_params, fc, att, sentis, labels)
    seqs = np.asarray(mhu.process_allgather(seqs, tiled=True))
    scores = np.asarray(mhu.process_allgather(scores, tiled=True),
                        np.float32)
    labels = np.asarray(mhu.process_allgather(labels, tiled=True))
    return seqs, scores, labels


def follower_loop(b) -> None:
    """Run on every process with jax.process_index() != 0: mirror
    process 0's dispatches until it closes. The daemon's HTTP side never
    runs here — this thread only keeps the collectives lockstep."""
    from jax.experimental import multihost_utils as mhu
    assert b._mp and jax.process_index() != 0, \
        "follower_loop is for non-zero processes of a multi-host mesh"
    fdt = np.dtype(b._feat_dtype)
    while True:
        ctrl = np.asarray(mhu.broadcast_one_to_all(
            np.zeros((3,), np.int32)))
        if int(ctrl[0]) == MP_STOP:
            break
        bucket = int(ctrl[1])
        run_detect = bool(ctrl[2])
        fc_h = np.asarray(mhu.broadcast_one_to_all(
            np.zeros((bucket,) + b._fc_shape, fdt)))
        att_h = np.asarray(mhu.broadcast_one_to_all(
            np.zeros((bucket,) + b._att_shape, fdt)))
        sentis_h = np.asarray(mhu.broadcast_one_to_all(
            np.zeros((bucket, b._m), np.int32)))
        forced_h = np.asarray(mhu.broadcast_one_to_all(
            np.zeros((bucket,), np.int32)))
        mp_exec(b, fc_h, att_h, sentis_h, forced_h, run_detect)
    b.close()


def mp_stop() -> None:
    """Process 0, once, at close(): release followers from
    follower_loop."""
    from jax.experimental import multihost_utils as mhu
    mhu.broadcast_one_to_all(np.asarray([MP_STOP, 0, 0], np.int32))
