"""Multi-HOST serving daemon check: the DynamicBatcher control plane
across real `jax.distributed` processes.

Round 3 proved the sharded serving PROGRAM across processes by driving
it from a lockstep script (tools/multiprocess_check.py). This check
proves the DAEMON around it: process 0 runs the dynamic batcher
(concurrent submits, bucket padding, AUTO+forced mixing) while process 1
sits in ``DynamicBatcher.follower_loop()`` mirroring every dispatch —
the mode serve.py enters on non-zero processes of a multi-host mesh.

  * worker mode — nprocs processes, one CPU device each, global (n,)
    data mesh. All construct the identical batcher; p0 warms (lockstep
    compiles), submits AUTO + forced requests from concurrent threads,
    closes (STOP broadcast); followers mirror. p0 writes results JSON.
  * single mode — same mesh shape on one process with n virtual
    devices, same batcher (non-mp mesh path), same requests.

Identical tokens/scores/labels prove the broadcast/stage/allgather
control plane adds nothing and loses nothing. Driven by
tests/test_multiprocess.py (slow tier); by hand:

    python tools/multihost_daemon_check.py launch
"""
import json
import os
import subprocess
import sys
import threading

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

V, T, M = 30, 8, 6


def _nreq(nprocs: int) -> int:
    """> the (nprocs,) bucket -> at least two dispatches at any width."""
    return 2 * nprocs


def _free_port() -> int:
    import socket
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _requests(settings, nreq: int):
    import numpy as np
    g = np.random.default_rng(3)
    reqs = []
    for i in range(nreq):
        reqs.append((
            g.normal(size=(settings.fc_feat_dim,)).astype(np.float32),
            g.normal(size=(14, 14, settings.att_feat_dim)).astype(
                np.float32),
            g.integers(4, V, size=(M,)).astype(np.int32),
            -1 if i % 2 == 0 else i % 3,      # AUTO / forced mix
        ))
    return reqs


def _run(nprocs: int, out_path: str, distributed: bool, pid: int = 0,
         port: int = 0):
    import jax
    if distributed:
        jax.distributed.initialize(
            coordinator_address=f"localhost:{port}",
            num_processes=nprocs, process_id=pid)
    import numpy as np
    from insenticap_model_tpu import serving_daemon
    from insenticap_model_tpu.config import Settings
    from insenticap_model_tpu.models import captioner as cap
    from insenticap_model_tpu.models import sentiment_detector as sd
    from insenticap_model_tpu.parallel import mesh as pmesh

    settings = Settings(word_emb_dim=16, fc_feat_dim=32, att_feat_dim=32,
                        feat_emb_dim=16, rnn_hid_dim=16, att_hid_dim=16,
                        concept_mid_dim=24)
    ids = cap.TokenIds(pad=0, unk=1, sos=2, eos=3, neutral=2)
    mesh = pmesh.make_mesh((nprocs,))
    b = serving_daemon.DynamicBatcher(
        cap.init_params(jax.random.PRNGKey(0), V, 3, settings),
        sd.init_params(jax.random.PRNGKey(1), 3, settings),
        settings=settings, ids=ids, beam_size=2, max_seq_len=T,
        bucket_sizes=(nprocs,), max_wait_s=0.25, num_sentiments=M,
        mesh=mesh)

    if distributed and jax.process_index() != 0:
        b.follower_loop()          # returns after p0's STOP broadcast
        return

    b.warm()
    nreq = _nreq(nprocs)
    reqs = _requests(settings, nreq)
    out = [None] * nreq
    ts = [threading.Thread(
        target=lambda i=i: out.__setitem__(
            i, b.submit(reqs[i][0], reqs[i][1], reqs[i][2],
                        forced_label=int(reqs[i][3]), timeout=300)))
        for i in range(nreq)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    st = b.stats()
    b.close()

    result = {
        # per request: [beam, T] token ids and [beam] scores
        "tokens": [np.asarray(o[0]).astype(int).tolist() for o in out],
        "scores": [round(float(np.asarray(o[1], np.float64).sum()), 5)
                   for o in out],
        "labels": [int(o[2]) for o in out],
        "batches": st["batches"],
        "process_count": jax.process_count(),
    }
    with open(out_path, "w") as f:
        json.dump(result, f)
    print("wrote", out_path, result["labels"], flush=True)


def launch(tmpdir: str = "/tmp/isc_mh_daemon", nprocs: int = 2) -> dict:
    os.makedirs(tmpdir, exist_ok=True)
    here = os.path.abspath(__file__)
    root = os.path.dirname(os.path.dirname(here))

    def env(ndev):
        e = dict(os.environ)
        e["PYTHONPATH"] = root
        e["JAX_PLATFORMS"] = "cpu"
        e["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={ndev}"
        return e

    mp_out = os.path.join(tmpdir, f"mp_daemon{nprocs}.json")
    sp_out = os.path.join(tmpdir, f"sp_daemon{nprocs}.json")

    def one_attempt():
        for p in (mp_out, sp_out):
            if os.path.exists(p):
                os.remove(p)
        port = _free_port()
        procs = [subprocess.Popen(
            [sys.executable, here, "worker", str(pid), mp_out, str(port),
             str(nprocs)], env=env(1)) for pid in range(nprocs)]
        procs.append(subprocess.Popen(
            [sys.executable, here, "single", sp_out, str(nprocs)],
            env=env(nprocs)))
        try:
            rcs = [p.wait(timeout=600) for p in procs]
        finally:
            for p in procs:
                if p.poll() is None:
                    p.kill()
                    p.wait()
        assert all(rc == 0 for rc in rcs), f"subprocess failed rcs={rcs}"

    try:
        one_attempt()
    except (AssertionError, subprocess.TimeoutExpired):
        one_attempt()          # retry once on a fresh coordinator port
    with open(mp_out) as f:
        mp = json.load(f)
    with open(sp_out) as f:
        sp = json.load(f)
    return {"multiprocess": mp, "single": sp}


def compare(res: dict, nprocs: int) -> None:
    mp, sp = res["multiprocess"], res["single"]
    assert mp["process_count"] == nprocs
    assert mp["tokens"] == sp["tokens"], (mp["tokens"], sp["tokens"])
    assert mp["labels"] == sp["labels"]
    for a, b in zip(mp["scores"], sp["scores"]):
        assert abs(a - b) < 1e-4, (a, b)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "launch"
    if mode == "worker":
        # argv: worker <pid> <out_path> <port> <nprocs>
        _run(int(sys.argv[5]), sys.argv[3], distributed=True,
             pid=int(sys.argv[2]), port=int(sys.argv[4]))
    elif mode == "single":
        _run(int(sys.argv[3]), sys.argv[2], distributed=False)
    else:
        res = launch()
        compare(res, 2)
        print("OK: 2-process multi-host daemon == single-process "
              "(tokens/labels exact)", flush=True)


if __name__ == "__main__":
    main()
