"""End-to-end CLI pipeline on tiny synthetic artifacts: every stage of the
reference DAG (SURVEY.md §1) runs through the real entry points against a
fabricated ./data tree — concept training → concept detection → sentiment
detector → sentence classifier → XE → RL → eval_cls — asserting the
artifact/checkpoint/result-file contracts hold between stages."""
import glob
import json
import os
import shutil

import h5py
import numpy as np
import pytest

from insenticap_model_tpu import synthetic
from insenticap_model_tpu.config import Opts, Settings
from insenticap_model_tpu.synthetic import (CONCEPTS, N_IMG, N_SENTI_IMG,
                                            WORDS)

pytestmark = pytest.mark.slow  # excluded from the fast gate


def _tiny_settings():
    return Settings(word_emb_dim=16, fc_feat_dim=32, att_feat_dim=32,
                    feat_emb_dim=16, rnn_hid_dim=16, att_hid_dim=16,
                    concept_mid_dim=24)


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    """Fabricated ./data tree with the reference's artifact schemas
    (shared generator: insenticap_model_tpu/synthetic.py — the metrics
    anchor builds the SAME corpus)."""
    root = tmp_path_factory.mktemp("cli_e2e")
    cwd = os.getcwd()
    os.chdir(root)
    synthetic.build_tree(str(root), _tiny_settings(), seed=0)
    yield root
    os.chdir(cwd)


def _opts(**kw):
    return Opts(settings=_tiny_settings(), num_concepts=3,
                max_seq_len=8, seed=0, **kw)


def _epoch_of(path):
    return int(os.path.basename(path).split("_")[1].split(".")[0])


def _promote_best(stage_dir):
    ckpts = sorted(glob.glob(os.path.join(stage_dir, "model_*.ckpt")),
                   key=_epoch_of)
    assert ckpts, f"no checkpoints in {stage_dir}"
    shutil.copy(ckpts[-1], os.path.join(stage_dir, "model-best.ckpt"))


def test_a_concept_stage(workdir):
    from insenticap_model_tpu.cli import detect_concepts, test_cpt, train_cpt
    train_cpt.train(_opts(concept_epochs=2, concept_bs=8))
    ck = glob.glob("checkpoint/concept/coco/model_*.ckpt")
    assert ck

    # batch concept detection writes img_det_concepts.json for ALL images
    detect_concepts.run(_opts(eval_model=sorted(ck, key=_epoch_of)[-1]))
    det = json.load(open("data/captions/coco/img_det_concepts.json"))
    n_expected = sum(N_IMG.values()) + sum(N_SENTI_IMG.values())
    assert len(det) == n_expected
    assert all(len(v) == 3 for v in det.values())
    assert all(w in CONCEPTS for v in det.values() for w in v)

    # single-image smoke test prints a wrong rate
    test_cpt.run(_opts(test_model=sorted(ck, key=_epoch_of)[-1]))


def test_b_senti_detector_stage(workdir):
    from insenticap_model_tpu.cli import train_senti
    train_senti.train(_opts(senti_epochs=2, senti_bs=4,
                            img_senti_labels="data/captions/"
                            "img_senti_labels.json"))
    ck = glob.glob("checkpoint/sentiment/model_*.ckpt")
    assert ck


def test_c_sent_senti_cls_stage(workdir):
    from insenticap_model_tpu.cli import train_sent_senti_cls_rnn as tcls
    # cap epochs: monkey-free — run the module train loop only 30 epochs is
    # too slow; drive via its builder + 2 manual epochs is already covered
    # by unit tests, so here run the real train() but stop early by
    # patching range via epochs in Opts is not exposed (reference hardcodes
    # 30); instead temporarily shrink by subclassing is overkill — run with
    # the corpus this small an epoch is ~1s, so do the full 30.
    tcls.train(_opts())
    stage = "checkpoint/sent_senti_cls/coco/part"
    _promote_best(stage)
    assert os.path.exists(os.path.join(stage, "model-best.ckpt"))


def test_d_xe_stage(workdir):
    from insenticap_model_tpu.cli import train_xe
    train_xe.train(_opts(xe_epochs=1, xe_bs=6, beam_size=2))
    stage = "checkpoint/xe/coco/part"
    _promote_best(stage)
    res = json.load(open("result/xe/coco/part/result_0.json"))
    assert len(res) == N_IMG["test"]
    assert all("image_id" in r and isinstance(r["caption"], str)
               for r in res)


def test_e_rl_stage(workdir):
    from insenticap_model_tpu.cli import train_rl
    # det_sentiments artifact is produced by preprocessing in the real
    # pipeline; fabricate from sentiment words here
    det = json.load(open("data/captions/coco/img_det_concepts.json"))
    sentis = {fn: ["happy", "sad"] for fn in det}
    with open("data/captions/coco/part/img_det_sentiments.json", "w") as f:
        json.dump(sentis, f)
    os.makedirs("data/corpus/part", exist_ok=True)
    with open("data/corpus/part/sentiment_words.json", "w") as f:
        json.dump({"positive": {"happy": 1.0}, "negative": {"sad": 1.0}}, f)

    senti_ck = sorted(glob.glob("checkpoint/sentiment/model_*.ckpt"),
                      key=_epoch_of)[-1]
    train_rl.train(_opts(rl_epochs=1, rl_bs=6, beam_size=2,
                         rl_senti_resume=senti_ck, rl_senti_times=1,
                         img_senti_labels="data/captions/"
                         "img_senti_labels.json"))
    assert glob.glob("checkpoint/rl/coco/part/model_0.ckpt")
    # per-sentiment result files in the reference formats
    senti_jsons = glob.glob("result/rl/coco/part/result_0_*_fact.json")
    assert senti_jsons
    id_txts = glob.glob("result/rl/coco/part/result_0_*_fact.txt")
    w_txts = glob.glob("result/rl/coco/part/result_0_*_fact_w.txt")
    assert id_txts and w_txts
    # id-form file contract: ints per line ending with EOS id
    with open(sorted(id_txts)[0]) as f:
        line = f.readline().split()
    assert all(t.isdigit() for t in line)


def test_f_eval_cls(workdir, capsys):
    from insenticap_model_tpu.cli import eval_cls_rnn
    prefix = "result/rl/coco/part/result_0"
    # eval_cls expects files for all three sentiments; the tiny RL test run
    # may not emit every sentiment — fabricate any missing ones from an
    # existing file
    existing = glob.glob(f"{prefix}_*_fact.txt")
    assert existing
    for senti in ("positive", "negative", "neutral"):
        p = f"{prefix}_{senti}_fact.txt"
        if not os.path.exists(p):
            shutil.copy(existing[0], p)
    acc = eval_cls_rnn.compute_cls(prefix, "fact",
                                   checkpoint_dir="./checkpoint")
    assert set(acc) == {"all", "positive", "negative", "neutral"}
    assert all(0.0 <= v <= 1.0 for v in acc.values())


def test_g_reproduce_table(workdir, capsys):
    """The paper-table harness (cli/reproduce_table) end-to-end on the
    synthetic tree: converted-composite load -> serving dump -> metrics /
    cls / ppl -> §6-format table (VERDICT r2 missing #1). LMs are trained
    with the in-tree isclm so the ppl column is exercised too."""
    from insenticap_model_tpu import preprocessing as pp
    from insenticap_model_tpu.cli import reproduce_table

    # anno ground truth (word-form, the eval_metrics input contract)
    img_captions = json.load(open("data/captions/coco/img_captions.json"))
    anno = {fn: [" ".join(c) for c in caps]
            for split in img_captions for fn, caps in
            img_captions[split].items()}
    with open("data/captions/coco/anno_captions.json", "w") as f:
        json.dump(anno, f)

    # per-sentiment trigram LMs (isclm; built by conftest)
    pp.get_lm_sents("./data/captions", ["coco"], "part")

    table = reproduce_table.reproduce(
        _opts(rl_bs=6, beam_size=2,
              img_senti_labels="data/captions/img_senti_labels.json"),
        "checkpoint/rl/coco/part/model_0.ckpt", tag="repro",
        anno_file="data/captions/coco/anno_captions.json",
        out="result/repro_table.json")

    assert os.path.exists("result/repro_table.json")
    assert 0.0 <= table["det_sentis_wrong_rate"] <= 1.0
    assert set(table["splits"]) == {"fact", "senti"}
    q = table["splits"]["fact"]["quality"]
    assert q, "no quality rows for the fact split"
    for senti, row in q.items():
        assert 0.0 <= row["Bleu-1"] <= 100.0
        assert row["CIDEr-D"] >= 0.0
    # ppl exercised via isclm-trained LMs (positive values when computed)
    ppl = table["splits"]["fact"]["ppl"]
    if ppl is not None:
        assert all(v > 0 for v in ppl.values())
    out = capsys.readouterr().out
    assert "§6 table [fact split]" in out


def test_h_eval_senti(workdir, capsys):
    """eval_senti CLI: the sentiment-detector threshold sweep over a
    hand-labeled subset (reference eval_senti.py — accuracy per sentiment
    per threshold 0..1, then precision per predicted class)."""
    from insenticap_model_tpu.cli import eval_senti

    fns = sorted(json.load(open(
        "data/captions/coco/img_captions.json"))["test"])
    os.makedirs("data/labeled_data", exist_ok=True)
    labeled = {"positive": fns[:2], "negative": fns[2:4],
               "neutral": fns[4:6]}
    with open("data/labeled_data/at_most_one_disagree.json", "w") as f:
        json.dump(labeled, f)

    senti_ck = sorted(glob.glob("checkpoint/sentiment/model_*.ckpt"),
                      key=_epoch_of)[-1]
    eval_senti.run(_opts(rl_senti_resume=senti_ck))
    out = capsys.readouterr().out
    assert out.count("THRESHOLD:") == 21          # 11 accuracy + 10 precision
    assert "all accuracy:" in out and "all precision:" in out
    # every accuracy value parses to [0, 1]
    for line in out.splitlines():
        if "accuracy:" in line:
            assert 0.0 <= float(line.rsplit(":", 1)[1]) <= 1.0


def test_i_reproduce_table_from_reference_pth(workdir, capsys):
    """The reference-user switchover path end-to-end: build a REAL
    reference Detector (imported from /root/reference), torch.save its
    composite checkpoint in the reference's blob format
    (train_rl.py:311-325), and run the reproduction harness on the raw
    .pth — in-memory conversion, serving dump, metrics."""
    REF = "/root/reference"
    if not os.path.isdir(REF):
        pytest.skip("reference tree not available")
    import sys
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import torch
    from models.decoder import Detector
    from insenticap_model_tpu.cli import reproduce_table

    idx2word = json.load(open("data/captions/coco/part/idx2word.json"))
    cats = ["positive", "negative", "neutral"]
    s = _tiny_settings()
    ref_settings = {
        "word_emb_dim": s.word_emb_dim, "fc_feat_dim": s.fc_feat_dim,
        "att_feat_dim": s.att_feat_dim, "feat_emb_dim": s.feat_emb_dim,
        "dropout_p": 0.5, "rnn_hid_dim": s.rnn_hid_dim,
        "att_hid_dim": s.att_hid_dim, "concept_mid_him": s.concept_mid_dim,
        "sentiment_convs_num": 2, "sentiment_fcs_num": 2,
    }
    torch.manual_seed(3)
    det = Detector(idx2word, 8, cats, {"cap_lr": 4e-4}, ref_settings)
    torch.save({
        "model": det.state_dict(), "settings": ref_settings,
        "idx2word": idx2word, "sentiment_categories": cats,
        "dataset_name": "coco", "corpus_type": "part",
        "max_seq_len": 8, "epoch": 0,
    }, "ref_detector.pth")

    table = reproduce_table.reproduce(
        _opts(rl_bs=6, beam_size=2,
              img_senti_labels="data/captions/img_senti_labels.json"),
        "ref_detector.pth", tag="refpth",
        anno_file="data/captions/coco/anno_captions.json")
    assert table["splits"]["fact"]["quality"], "no fact-split metrics"
    assert glob.glob("result/rl/coco/part/result_refpth_*_fact.json")
    out = capsys.readouterr().out
    assert "§6 table [fact split]" in out


def test_j_serve_daemon_http(workdir):
    """The dynamic-batching HTTP daemon (cli/serve.py) end-to-end on the
    synthetic tree: real socket, concurrent feature-mode requests (one
    auto-detected, one forced sentiment) coalescing in the batcher, plus
    stats/health endpoints and a 400 on malformed input."""
    import http.client
    import socket
    import threading

    import numpy as np

    from insenticap_model_tpu.cli import serve as serve_cli

    # noun -> [senti_word, score] table (reference preprocess.py:200-213
    # schema); the fixture's concepts are WORDS[:8]
    with open("data/corpus/part/sentiment_detector.json", "w") as f:
        json.dump({w: [["happy", 1.0], ["sad", 0.5]] for w in CONCEPTS}, f)

    rl_ck = "checkpoint/rl/coco/part/model_0.ckpt"
    cpt_ck = sorted(glob.glob("checkpoint/concept/coco/model_*.ckpt"))[-1]
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    a = serve_cli.build_parser().parse_args([
        "--rl_model", rl_ck, "--concept_model", cpt_ck,
        "--sentiment_detector_json",
        "data/corpus/part/sentiment_detector.json",
        "--port", str(port), "--bucket_sizes", "[2,4]",
        "--max_wait_ms", "250", "--beam_size", "2", "--max_seq_len", "8",
        "--num_concepts", "3"])
    srv = serve_cli.make_server(a)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        s = srv.app.settings
        g = np.random.default_rng(7)

        def post(payload):
            c = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
            c.request("POST", "/caption", json.dumps(payload),
                      {"Content-Type": "application/json"})
            r = c.getresponse()
            body = json.loads(r.read())
            c.close()
            return r.status, body

        def req(sentiment):
            return {"fc": g.normal(size=(s.fc_feat_dim,)).tolist(),
                    "att": g.normal(
                        size=(14, 14, s.att_feat_dim)).tolist(),
                    "sentiment": sentiment}

        out = [None, None]
        payloads = [req("auto"), req("positive")]
        ts = [threading.Thread(
            target=lambda i=i: out.__setitem__(i, post(payloads[i])))
            for i in range(2)]
        for th in ts:
            th.start()
        for th in ts:
            th.join()
        for status, body in out:
            assert status == 200, body
            assert body["caption"] and isinstance(body["caption"], str)
            assert body["concepts"]
        assert out[1][1]["sentiment"] == "positive"   # forced row-wise
        assert out[0][1]["sentiment"] in ("positive", "negative",
                                          "neutral")

        c = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        c.request("GET", "/healthz")
        assert json.loads(c.getresponse().read()) == {"ok": True}
        c.request("GET", "/stats")
        stats = json.loads(c.getresponse().read())
        c.request("GET", "/metrics")
        r = c.getresponse()
        ctype, metrics = r.getheader("Content-Type"), r.read().decode()
        c.close()
        assert stats["requests"] == 2
        assert stats["batches"] >= 1
        assert ctype.startswith("text/plain")
        assert 'isc_requests_total{stage="decode"} 2' in metrics
        assert 'isc_stalled_seconds{stage="encode"}' in metrics

        status, body = post({"att": [[0.0]]})        # malformed: no fc
        assert status == 400 and "error" in body
    finally:
        srv.shutdown()
        srv.app.close()
        srv.server_close()
        t.join(timeout=30)


def test_j2_serve_daemon_image_mode(workdir, monkeypatch):
    """Image mode over HTTP: image_b64 and --image_root-confined
    image_path both ride the EncodeBatcher (batched encoder + concept
    top-k — VERDICT r3 #2), path escapes get a uniform 400, disabled
    path mode gets 400, and oversized bodies get 413 before the read.
    The encoder is a settings-matched fake behind serve_cli's
    _load_encoder seam (the real ResNet-101 is dimensioned for
    fc/att=2048 production checkpoints, not this fixture)."""
    import base64
    import http.client
    import io
    import socket
    import threading

    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from insenticap_model_tpu.cli import serve as serve_cli
    from insenticap_model_tpu.training import checkpoint as tckpt

    with open("data/corpus/part/sentiment_detector.json", "w") as f:
        json.dump({w: [["happy", 1.0], ["sad", 0.5]] for w in CONCEPTS}, f)

    rl_ck = "checkpoint/rl/coco/part/model_0.ckpt"
    cpt_ck = sorted(glob.glob("checkpoint/concept/coco/model_*.ckpt"))[-1]
    s = Settings.from_dict(tckpt.load_metadata(rl_ck)["settings"])

    def fake_enc(x):
        # deterministic per-row features with the fixture's dims
        x = jnp.asarray(x, jnp.float32) / 255.0
        b = x.shape[0]
        base = x.reshape(b, -1)
        fc = jnp.stack([jnp.resize(base[i], (s.fc_feat_dim,))
                        for i in range(b)])
        att = jnp.stack([jnp.resize(base[i], (14, 14, s.att_feat_dim))
                         for i in range(b)])
        return fc, att

    monkeypatch.setattr(serve_cli, "_load_encoder",
                        lambda ck, dt, mesh=None: fake_enc)

    imgs_dir = "data/serve_imgs"
    os.makedirs(imgs_dir, exist_ok=True)
    g = np.random.default_rng(11)
    arr = g.integers(0, 256, size=(20, 18, 3)).astype(np.uint8)
    Image.fromarray(arr).save(f"{imgs_dir}/ok.png")
    with open("outside.png", "wb") as f:   # exists, but outside the root
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        f.write(buf.getvalue())

    with socket.socket() as sk:
        sk.bind(("127.0.0.1", 0))
        port = sk.getsockname()[1]
    a = serve_cli.build_parser().parse_args([
        "--rl_model", rl_ck, "--concept_model", cpt_ck,
        "--sentiment_detector_json",
        "data/corpus/part/sentiment_detector.json",
        "--resnet101_ckpt", "fake.ckpt", "--image_root", imgs_dir,
        "--image_buckets", "[[16,16],[12,16],[16,12]]",
        "--port", str(port), "--bucket_sizes", "[2,4]",
        "--enc_bucket_sizes", "[2,4]",
        "--max_wait_ms", "250", "--beam_size", "2", "--max_seq_len", "8",
        "--num_concepts", "3", "--max_body_mb", "0.2"])
    srv = serve_cli.make_server(a)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        def post(payload, raw=None):
            c = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
            c.request("POST", "/caption", raw or json.dumps(payload),
                      {"Content-Type": "application/json"})
            r = c.getresponse()
            body = json.loads(r.read())
            c.close()
            return r.status, body

        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        b64 = base64.b64encode(buf.getvalue()).decode()

        # concurrent image_b64 + image_path coalesce in the EncodeBatcher
        out = [None, None]
        payloads = [{"image_b64": b64, "sentiment": "positive"},
                    {"image_path": f"{imgs_dir}/ok.png",
                     "sentiment": "auto"}]
        ts = [threading.Thread(
            target=lambda i=i: out.__setitem__(i, post(payloads[i])))
            for i in range(2)]
        for th in ts:
            th.start()
        for th in ts:
            th.join()
        for status, body in out:
            assert status == 200, body
            assert body["caption"] and body["concepts"]
        assert out[0][1]["sentiment"] == "positive"
        # same pixels -> same features -> identical caption both modes
        assert out[0][1]["concepts"] == out[1][1]["concepts"]

        c = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        c.request("GET", "/stats")
        stats = json.loads(c.getresponse().read())
        c.close()
        assert stats["encode"]["requests"] == 2
        assert stats["encode"]["by_bucket"]["16x16"] >= 1
        assert stats["encode"]["latency_by_bucket"]

        # path confinement: uniform 400, no filesystem detail leaked
        status, body = post({"image_path": "outside.png"})
        assert status == 400 and "outside --image_root" in body["error"]
        status, body = post({"image_path": "/etc/passwd"})
        assert status == 400 and "outside --image_root" in body["error"]
        # junk bytes behind valid base64 -> clean 400
        status, body = post({"image_b64":
                             base64.b64encode(b"nonsense").decode()})
        assert status == 400 and "image_b64" in body["error"]
        # oversized body sheds with 413 BEFORE the read
        status, body = post(None, raw="x" * 300_000)
        assert status == 413

        # with image_root unset, path mode is disabled outright
        monkeypatch.setattr(srv.app, "image_root", None)
        status, body = post({"image_path": f"{imgs_dir}/ok.png"})
        assert status == 400 and "disabled" in body["error"]
    finally:
        srv.shutdown()
        srv.app.close()
        srv.server_close()
        t.join(timeout=30)


def test_j3_serve_sigterm_drains_and_exits(workdir):
    """SIGTERM on the real serve.py process: stop accepting, drain, exit
    0 with the drain markers (production rollouts depend on graceful
    termination, not kill -9)."""
    import signal
    import socket
    import subprocess
    import sys
    import time
    import urllib.request

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rl_ck = "checkpoint/rl/coco/part/model_0.ckpt"
    cpt_ck = sorted(glob.glob("checkpoint/concept/coco/model_*.ckpt"))[-1]
    with socket.socket() as sk:
        sk.bind(("127.0.0.1", 0))
        port = sk.getsockname()[1]
    p = subprocess.Popen(
        [sys.executable, os.path.join(repo, "serve.py"),
         "--rl_model", rl_ck, "--concept_model", cpt_ck,
         "--sentiment_detector_json",
         "data/corpus/part/sentiment_detector.json",
         "--port", str(port), "--bucket_sizes", "[2]",
         "--beam_size", "2", "--max_seq_len", "8"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    try:
        deadline = time.monotonic() + 120
        up = False
        while time.monotonic() < deadline:
            try:
                with urllib.request.urlopen(
                        f"http://127.0.0.1:{port}/healthz",
                        timeout=5) as r:
                    up = r.status == 200
                    break
            except Exception:
                if p.poll() is not None:
                    break
                time.sleep(0.25)
        assert up, f"daemon never came up (rc={p.poll()})"
        p.send_signal(signal.SIGTERM)
        out, _ = p.communicate(timeout=60)
        assert p.returncode == 0, out
        assert "draining" in out and "drained, exiting" in out
    finally:
        if p.poll() is None:
            p.kill()


def test_k_serve_cli_mesh_wiring(workdir):
    """serve.py --mesh_shape wiring: multi-axis shapes are rejected
    before any model load, and a 1-D mesh adapts the DEFAULT bucket
    ladder to data-axis multiples (bucket 1 can't shard 8 ways)."""
    import pytest

    from insenticap_model_tpu.cli import serve as serve_cli

    rl_ck = "checkpoint/rl/coco/part/model_0.ckpt"
    cpt_ck = sorted(glob.glob("checkpoint/concept/coco/model_*.ckpt"))[-1]
    base = ["--rl_model", rl_ck, "--concept_model", cpt_ck,
            "--sentiment_detector_json",
            "data/corpus/part/sentiment_detector.json"]

    a = serve_cli.build_parser().parse_args(base + ["--mesh_shape", "[2,2]"])
    with pytest.raises(SystemExit, match="must be 1-D"):
        serve_cli.ServeApp(a)

    a = serve_cli.build_parser().parse_args(base + ["--mesh_shape", "[8]"])
    app = serve_cli.ServeApp(a)
    try:
        assert app.batcher._buckets == (8, 32, 128, 384)
    finally:
        app.close()
