"""Dynamic-batching serving daemon: coalescing, bucket padding, row-wise
auto/forced sentiment, error delivery, shutdown. Correctness baseline is
the direct (unbatched) serving programs — padding/coalescing must be
invisible in the outputs (per-row independence of the batched beam
search, proved independently by test_inference's sweep parity)."""
import threading
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from insenticap_model_tpu import inference, serving_daemon
from insenticap_model_tpu.config import Settings
from insenticap_model_tpu.models import captioner as cap
from insenticap_model_tpu.models import sentiment_detector as senti_det
from insenticap_model_tpu.serving_daemon import AUTO, DynamicBatcher

V, M, T = 40, 6, 8
IDS = cap.TokenIds(pad=0, unk=1, sos=2, eos=3, neutral=2)


@pytest.fixture(scope="module")
def settings():
    return Settings(word_emb_dim=16, fc_feat_dim=24, att_feat_dim=24,
                    feat_emb_dim=16, rnn_hid_dim=16, att_hid_dim=16,
                    concept_mid_dim=24)


@pytest.fixture(scope="module")
def params(settings):
    return (cap.init_params(jax.random.PRNGKey(0), V, 3, settings),
            senti_det.init_params(jax.random.PRNGKey(1), 3, settings))


def _reqs(settings, n, seed=0):
    g = np.random.default_rng(seed)
    return [(g.normal(size=(settings.fc_feat_dim,)).astype(np.float32),
             g.normal(size=(7, 7, settings.att_feat_dim)).astype(
                 np.float32),
             g.integers(4, V, size=(M,)).astype(np.int32))
            for _ in range(n)]


def _batcher(params, settings, **kw):
    cp, sp = params
    kw.setdefault("bucket_sizes", (2, 4, 8))
    kw.setdefault("max_wait_s", 0.25)
    return DynamicBatcher(cp, sp, settings=settings, ids=IDS, beam_size=2,
                          max_seq_len=T, num_sentiments=M, att_hw=(7, 7),
                          **kw)


def _direct(params, settings, reqs, labels):
    """Unbatched ground truth: one forced-decode call per request."""
    cp, _ = params
    fn = inference.make_forced_serving_fn(settings, IDS, 2, T)
    out = []
    for (fc, att, sentis), lab in zip(reqs, labels):
        seqs, scores = fn(cp, fc[None], att[None], sentis[None],
                          jnp.full((1,), lab, jnp.int32))
        out.append((np.asarray(seqs)[0], np.asarray(scores)[0]))
    return out


def test_auto_detection_with_full_detector_variant(settings):
    """A checkpoint trained with the full detector variant
    (Settings.num_kernels_per_sentiment > 0) serves through the daemon:
    the AUTO path's detect program routes via sentiment_detector
    .module_for, and labels match the variant's own sample()."""
    import dataclasses
    from insenticap_model_tpu.models import sentiment_detector_full as sdf

    s_full = dataclasses.replace(settings, num_kernels_per_sentiment=2)
    cp = cap.init_params(jax.random.PRNGKey(0), V, 3, s_full)
    sp = sdf.init_params(jax.random.PRNGKey(1), 3, s_full)
    reqs = _reqs(s_full, 3, seed=7)
    with DynamicBatcher(cp, sp, settings=s_full, ids=IDS, beam_size=2,
                        max_seq_len=T, num_sentiments=M, att_hw=(7, 7),
                        bucket_sizes=(4,), max_wait_s=0.05) as b:
        outs = [b.submit(fc, att, sentis) for fc, att, sentis in reqs]
    att_all = np.stack([r[1] for r in reqs])
    want, _, _ = sdf.sample(sp, jnp.asarray(att_all),
                            inference.SENTI_THRESHOLD, IDS.neutral)
    assert [lab for _, _, lab in outs] == list(np.asarray(want))
    for seqs, scores, _ in outs:
        assert seqs.shape == (2, T) and np.isfinite(scores).all()


def test_host_params_device_staged_once(params, settings):
    """checkpoint.load hands the daemon HOST numpy params; the batcher
    must device-stage them at construction — host params passed as jit
    ARGUMENTS re-transfer on every dispatch (measured 13,881 -> 340
    captions/s through the tunnel in bench.py's trained-regime leg)."""
    cp, sp = params
    host = (jax.tree_util.tree_map(np.asarray, cp),
            jax.tree_util.tree_map(np.asarray, sp))
    with _batcher(host, settings) as b:
        for tree in (b._cap_params, b._senti_params):
            for leaf in jax.tree_util.tree_leaves(tree):
                assert isinstance(leaf, jax.Array), type(leaf)
        # and the staged copies still serve correctly
        fc, att, sentis = _reqs(settings, 1)[0]
        seqs, scores, lab = b.submit(fc, att, sentis, forced_label=1)
        assert seqs.shape == (2, T) and lab == 1


def test_concurrent_requests_coalesce_and_match_direct(params, settings):
    reqs = _reqs(settings, 8)
    labels = [i % 3 for i in range(8)]
    want = _direct(params, settings, reqs, labels)

    with _batcher(params, settings) as b:
        results = [None] * 8

        def worker(i):
            fc, att, sentis = reqs[i]
            results[i] = b.submit(fc, att, sentis, forced_label=labels[i],
                                  timeout=300)

        ts = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        st = b.stats()

    assert st["requests"] == 8
    # coalescing happened: strictly fewer dispatches than requests (the
    # generous max_wait_s lets co-riders pile up even on a 1-CPU host)
    assert st["batches"] < 8
    for i in range(8):
        seqs, scores, lab = results[i]
        assert lab == labels[i]
        np.testing.assert_array_equal(seqs, want[i][0])
        np.testing.assert_allclose(scores, want[i][1], rtol=2e-5,
                                   atol=2e-5)


def test_partial_batch_pads_up_bucket_without_output_effect(params,
                                                            settings):
    reqs = _reqs(settings, 3, seed=1)
    want = _direct(params, settings, reqs, [0, 1, 2])
    with _batcher(params, settings) as b:
        results = [None] * 3

        def worker(i):
            fc, att, sentis = reqs[i]
            results[i] = b.submit(fc, att, sentis, forced_label=i,
                                  timeout=300)

        ts = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        st = b.stats()

    # 3 requests can only ride 4- or 8-buckets (or split across several
    # dispatches); padded rows are recorded and results are exact
    assert st["padded_rows"] >= 1
    for i in range(3):
        np.testing.assert_array_equal(results[i][0], want[i][0])


def test_auto_rows_use_detector_and_mix_with_forced(params, settings):
    cp, sp = params
    reqs = _reqs(settings, 2, seed=2)
    att_all = np.stack([r[1] for r in reqs])
    det = np.asarray(senti_det.sample(
        sp, jnp.asarray(att_all), inference.SENTI_THRESHOLD,
        IDS.neutral)[0])
    want = _direct(params, settings, reqs, [int(det[0]), 1])

    with _batcher(params, settings) as b:
        results = [None] * 2

        def worker(i, forced):
            fc, att, sentis = reqs[i]
            results[i] = b.submit(fc, att, sentis, forced_label=forced,
                                  timeout=300)

        ts = [threading.Thread(target=worker, args=(0, AUTO)),
              threading.Thread(target=worker, args=(1, 1))]
        for t in ts:
            t.start()
        for t in ts:
            t.join()

    assert results[0][2] == int(det[0])      # detector's label
    assert results[1][2] == 1                # forced wins row-wise
    np.testing.assert_array_equal(results[0][0], want[0][0])
    np.testing.assert_array_equal(results[1][0], want[1][0])


def test_submit_validates_shapes_and_labels(params, settings):
    with _batcher(params, settings) as b:
        fc, att, sentis = _reqs(settings, 1)[0]
        with pytest.raises(ValueError, match="static-shaped"):
            b.submit(fc[:-1], att, sentis)
        with pytest.raises(ValueError, match="static-shaped"):
            b.submit(fc, att, np.zeros((M + 1,), np.int32))
        with pytest.raises(ValueError, match="forced_label"):
            b.submit(fc, att, sentis, forced_label=7)


def test_dispatch_errors_are_delivered_not_fatal(params, settings):
    cp, sp = params
    b = _batcher(params, settings)
    try:
        # poison the serve fn AFTER construction: the dispatch thread
        # must deliver the exception to the waiter and keep running
        ok_req = _reqs(settings, 1)[0]
        b._serve = None  # type: ignore[assignment]
        with pytest.raises(TypeError):
            b.submit(*ok_req, forced_label=0, timeout=300)
        b._serve = inference.make_forced_serving_fn(settings, IDS, 2, T)
        seqs, scores, lab = b.submit(*ok_req, forced_label=0, timeout=300)
        assert seqs.shape == (2, T)
    finally:
        b.close()


def test_close_drains_then_rejects(params, settings):
    b = _batcher(params, settings)
    fc, att, sentis = _reqs(settings, 1)[0]
    r = b.submit(fc, att, sentis, forced_label=0, timeout=300)
    assert r[0].shape == (2, T)
    b.close()
    with pytest.raises(RuntimeError, match="closed"):
        b.submit(fc, att, sentis)
    b.close()      # idempotent


def test_warm_compiles_every_bucket(params, settings):
    with _batcher(params, settings, bucket_sizes=(2, 4)) as b:
        b.warm()   # would raise on any shape mismatch in the ladder
        fc, att, sentis = _reqs(settings, 1)[0]
        seqs, _, _ = b.submit(fc, att, sentis, forced_label=0, timeout=300)
        assert seqs.shape == (2, T)


def test_bfloat16_policy_serves_valid_captions(params, settings):
    """compute_dtype='bfloat16' (the measured TPU serving policy) casts
    params once and features host-side; tokens must stay valid ids and
    the label path must still work. (Not bit-equal to f32 by nature.)"""
    with _batcher(params, settings, compute_dtype="bfloat16") as b:
        fc, att, sentis = _reqs(settings, 1, seed=3)[0]
        seqs, scores, lab = b.submit(fc, att, sentis, forced_label=1,
                                     timeout=300)
        assert seqs.shape == (2, T) and seqs.dtype == np.int32
        assert ((seqs >= 0) & (seqs < V)).all()
        assert np.isfinite(scores).all()
        assert lab == 1


def test_failed_batches_show_in_stats(params, settings):
    """Failed traffic must still be visible to /stats (review finding:
    an operator watching a daemon that receives-and-fails load must not
    see flat counters)."""
    b = _batcher(params, settings)
    try:
        ok_req = _reqs(settings, 1, seed=4)[0]
        b._serve = None  # type: ignore[assignment]
        with pytest.raises(TypeError):
            b.submit(*ok_req, forced_label=0, timeout=300)
        st = b.stats()
        assert st["failed_requests"] == 1
        assert st["failed_batches"] == 1
        assert st["requests"] == 0      # successes counted separately
    finally:
        b.close()


def test_saturation_sheds_load_with_saturated(params, settings):
    """When the queue is full past enqueue_timeout, submit raises
    Saturated (HTTP 503 upstream) instead of blocking forever; blocked
    requests complete once the pipeline unblocks. Dispatch is frozen by
    an Event inside a poisoned serve fn, so saturation is deterministic."""
    import time as _time

    cp, sp = params
    b = _batcher(params, settings, bucket_sizes=(1,), max_queue=1)
    real_serve = b._serve
    gate = threading.Event()

    def slow_serve(*a):
        gate.wait(60)
        return real_serve(*a)

    b._serve = slow_serve
    reqs = _reqs(settings, 3, seed=5)
    results = [None] * 2
    try:
        # r0 occupies the dispatch thread (blocked in slow_serve);
        # give it a moment to leave the queue, then r1 fills the queue
        ts = [threading.Thread(
            target=lambda i=i: results.__setitem__(
                i, b.submit(*reqs[i], forced_label=0, timeout=300)))
            for i in range(2)]
        ts[0].start()
        deadline = _time.time() + 10
        while b._q.qsize() > 0 and _time.time() < deadline:
            _time.sleep(0.01)
        ts[1].start()
        deadline = _time.time() + 10
        while b._q.qsize() < 1 and _time.time() < deadline:
            _time.sleep(0.01)

        with pytest.raises(serving_daemon.Saturated):
            b.submit(*reqs[2], forced_label=0, enqueue_timeout=0.05)

        gate.set()                      # unblock; queued work completes
        for t in ts:
            t.join(timeout=120)
        assert results[0] is not None and results[1] is not None
    finally:
        gate.set()
        b.close()


def test_mesh_mode_matches_single_device(params, settings):
    """mesh= routes the daemon through the shard_map data-parallel
    programs (params replicated, batches sharded over `data`): outputs
    must be token-identical to the unsharded daemon, auto and forced
    rows alike."""
    from insenticap_model_tpu.parallel import mesh as pmesh

    mesh = pmesh.make_mesh((4,))
    reqs = _reqs(settings, 4, seed=6)
    forced = [AUTO, 0, 1, 2]

    def run(**kw):
        out = [None] * 4
        with _batcher(params, settings, bucket_sizes=(4,), **kw) as b:
            ts = [threading.Thread(
                target=lambda i=i: out.__setitem__(
                    i, b.submit(*reqs[i], forced_label=forced[i],
                                timeout=300)))
                for i in range(4)]
            for t in ts:
                t.start()
            for t in ts:
                t.join()
        return out

    plain = run()
    sharded = run(mesh=mesh)
    for p1, p2 in zip(plain, sharded):
        np.testing.assert_array_equal(p1[0], p2[0])       # tokens
        np.testing.assert_allclose(p1[1], p2[1], rtol=2e-5, atol=2e-5)
        assert p1[2] == p2[2]                             # labels


def test_mesh_mode_rejects_indivisible_buckets(params, settings):
    from insenticap_model_tpu.parallel import mesh as pmesh
    mesh = pmesh.make_mesh((4,))
    with pytest.raises(ValueError, match="not multiples of the mesh"):
        _batcher(params, settings, bucket_sizes=(2, 4), mesh=mesh)


def test_default_buckets_round_up_under_mesh(params, settings):
    """bucket_sizes=None adapts the default ladder to the mesh: every
    bucket rounds UP to a multiple of the data-axis size, deduped — so
    --mesh_shape works without a manual --bucket_sizes override."""
    from insenticap_model_tpu.parallel import mesh as pmesh

    assert serving_daemon.default_buckets(None) == (1, 8, 32, 128, 384)
    mesh = pmesh.make_mesh((8,))
    assert serving_daemon.default_buckets(mesh) == (8, 32, 128, 384)
    b = _batcher(params, settings, bucket_sizes=None, mesh=mesh)
    try:
        assert b._buckets == (8, 32, 128, 384)
    finally:
        b.close()


def test_mesh_warm_compiles_the_production_signature(params, settings):
    """warm() must stage its dummy inputs with the SAME sharding as
    _dispatch: jit caches one executable per input-sharding signature,
    so an unsharded warmup would leave the first real request paying the
    full compile anyway (the exact cost --warm exists to hide)."""
    from insenticap_model_tpu.parallel import mesh as pmesh

    mesh = pmesh.make_mesh((4,))
    reqs = _reqs(settings, 4, seed=7)
    with _batcher(params, settings, bucket_sizes=(4,), mesh=mesh) as b:
        b.warm()
        n_serve = b._serve._cache_size()
        n_detect = b._detect._cache_size()
        out = [None] * 4
        ts = [threading.Thread(
            target=lambda i=i: out.__setitem__(
                i, b.submit(*reqs[i], forced_label=AUTO, timeout=300)))
            for i in range(4)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert all(o is not None for o in out)
        # no new executable: production traffic hit the warmed programs
        assert b._serve._cache_size() == n_serve
        assert b._detect._cache_size() == n_detect


# ---------------------------------------------------------------------------
# EncodeBatcher: batched image->features + concept top-k (VERDICT r3 #2)
# ---------------------------------------------------------------------------

class _FakeEncode:
    """Deterministic stand-in for the jitted encoder apply: row values
    depend only on the row's pixels, so batching/padding must be
    invisible. Records every batch size it was called with."""

    def __init__(self, fc_dim=24, att_hw=(7, 7), att_dim=24):
        self.fc_dim, self.att_hw, self.att_dim = fc_dim, att_hw, att_dim
        self.calls = []

    def __call__(self, imgs):
        imgs = np.asarray(imgs)
        self.calls.append(imgs.shape)
        b = imgs.shape[0]
        base = imgs.reshape(b, -1).astype(np.float32)
        fc = np.stack([np.resize(r, (self.fc_dim,)) for r in base])
        att = np.stack([np.resize(r, self.att_hw + (self.att_dim,))
                        for r in base])
        return jnp.asarray(fc), jnp.asarray(att)


class _FakeTopK:
    def __init__(self, k=3):
        self.k = k
        self.calls = []

    def __call__(self, fc):
        fc = np.asarray(fc, np.float32)
        self.calls.append(fc.shape)
        return jnp.asarray(np.argsort(-fc, axis=-1)[:, :self.k]
                           .astype(np.int32))


SHAPES = ((16, 16), (12, 16), (16, 12))


def _enc_batcher(**kw):
    enc = kw.pop("enc", _FakeEncode())
    cpt = kw.pop("cpt", _FakeTopK())
    kw.setdefault("batch_buckets", (1, 2, 4))
    kw.setdefault("max_wait_s", 0.25)
    b = serving_daemon.EncodeBatcher(enc, cpt, fc_dim=24,
                                     shape_buckets=SHAPES, **kw)
    return b, enc, cpt


def test_encode_batcher_coalesces_and_matches_direct():
    """Concurrent same-shape images ride ONE batched encoder call (no
    bs=1 forwards under load) and each row's result equals the direct
    per-row computation."""
    g = np.random.default_rng(0)
    imgs = [g.integers(0, 256, size=(16, 16, 3)).astype(np.uint8)
            for _ in range(4)]
    b, enc, cpt = _enc_batcher()
    try:
        out = [None] * 4
        ts = [threading.Thread(
            target=lambda i=i: out.__setitem__(
                i, b.submit_image(imgs[i], timeout=300)))
            for i in range(4)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        direct_enc = _FakeEncode()
        direct_cpt = _FakeTopK()
        for i in range(4):
            fc, att, top = out[i]
            fce, atte = direct_enc(imgs[i][None])
            np.testing.assert_array_equal(fc, np.asarray(fce)[0])
            np.testing.assert_array_equal(att, np.asarray(atte)[0])
            np.testing.assert_array_equal(
                top, np.asarray(direct_cpt(fce))[0])
        # all four coalesced: no call smaller than the 4-bucket
        assert all(s[0] == 4 for s in enc.calls)
        st = b.stats()
        assert st["requests"] == 4 and st["by_bucket"]["16x16"] >= 1
        assert "16x16" in st["latency_by_bucket"]
        lat = st["latency_by_bucket"]["16x16"]
        assert lat["n"] == 4 and lat["p50_ms"] <= lat["p99_ms"]
    finally:
        b.close()


def test_encode_batcher_groups_by_shape_and_pads():
    """Mixed-shape batches split into per-shape encoder calls, each
    padded up the batch ladder; feature-mode rows form their own top-k
    group in the same collect window."""
    g = np.random.default_rng(1)
    img_sq = g.integers(0, 256, size=(16, 16, 3)).astype(np.uint8)
    img_ls = g.integers(0, 256, size=(12, 16, 3)).astype(np.uint8)
    fc_row = g.normal(size=(24,)).astype(np.float32)
    b, enc, cpt = _enc_batcher()
    try:
        out = [None] * 3
        ts = [threading.Thread(target=lambda i=i, f=f: out.__setitem__(
            i, f())) for i, f in enumerate([
                lambda: b.submit_image(img_sq, timeout=300),
                lambda: b.submit_image(img_ls, timeout=300),
                lambda: b.submit_fc(fc_row, timeout=300)])]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        # shapes grouped: one encoder call per shape, padded to bucket 1
        assert sorted(s[1:3] for s in enc.calls) == [(12, 16), (16, 16)]
        # feature-mode top-k batched through the same ladder
        np.testing.assert_array_equal(
            out[2], np.asarray(_FakeTopK()(fc_row[None]))[0])
        st = b.stats()
        assert st["by_bucket"]["fc"] == 1
    finally:
        b.close()


def test_encode_batcher_validates_and_gates_image_mode():
    b, enc, cpt = _enc_batcher()
    try:
        with pytest.raises(ValueError, match="resize bucket"):
            b.submit_image(np.zeros((9, 9, 3), np.uint8))
        with pytest.raises(ValueError, match="resize bucket"):
            b.submit_image(np.zeros((16, 16, 3), np.float32))
        with pytest.raises(ValueError, match="fc shape"):
            b.submit_fc(np.zeros((7,), np.float32))
    finally:
        b.close()
    # feature-only daemon: no encoder -> image submissions refused
    b2 = serving_daemon.EncodeBatcher(None, _FakeTopK(), fc_dim=24,
                                      shape_buckets=SHAPES)
    try:
        with pytest.raises(ValueError, match="image mode needs"):
            b2.submit_image(np.zeros((16, 16, 3), np.uint8))
        np.testing.assert_array_equal(
            b2.submit_fc(np.zeros((24,), np.float32), timeout=300),
            np.asarray(_FakeTopK()(np.zeros((1, 24), np.float32)))[0])
    finally:
        b2.close()


def test_encode_batcher_warm_precompiles_ladder():
    b, enc, cpt = _enc_batcher()
    try:
        b.warm()
        # every (shape, batch-bucket) pair touched once
        seen = {(s[0], s[1:3]) for s in enc.calls}
        assert seen == {(n, hw) for n in (1, 2, 4) for hw in SHAPES}
    finally:
        b.close()


def test_encode_batcher_mesh_mode_matches_single_device():
    """mesh= shards encode batches over the data axis via plain GSPMD
    (the encoder is pure-XLA conv — no shard_map needed): per-row
    results must equal the unsharded batcher, warm() must stage the
    production sharding signature, and the ladder must be data-axis
    multiples (default_encode_buckets rounds the default ladder)."""
    from insenticap_model_tpu.parallel import mesh as pmesh
    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 devices")
    mesh = pmesh.make_mesh((4,))
    w = np.asarray(jax.random.normal(jax.random.PRNGKey(0),
                                     (3, 3, 3, 24)), np.float32)

    def make_apply(wp):
        def f(x):
            h = jax.lax.conv_general_dilated(
                x.astype(jnp.float32) / 255.0, wp, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return h.mean((1, 2)), h[:, :7, :7, :]
        return jax.jit(f)

    cpt = jax.jit(
        lambda fc: jnp.argsort(-fc, axis=-1)[:, :3].astype(jnp.int32))
    g = np.random.default_rng(3)
    imgs = [g.integers(0, 256, size=(16, 16, 3)).astype(np.uint8)
            for _ in range(8)]

    def run(mesh_arg, wp):
        b = serving_daemon.EncodeBatcher(
            make_apply(wp), cpt, fc_dim=24, shape_buckets=((16, 16),),
            batch_buckets=(4, 8), max_wait_s=0.25, mesh=mesh_arg)
        try:
            b.warm()
            out = [None] * 8
            ts = [threading.Thread(
                target=lambda i=i: out.__setitem__(
                    i, b.submit_image(imgs[i], timeout=300)))
                for i in range(8)]
            for t in ts:
                t.start()
            for t in ts:
                t.join()
            return out
        finally:
            b.close()

    sharded = run(mesh, pmesh.replicate(mesh, jnp.asarray(w)))
    plain = run(None, jnp.asarray(w))
    for (fc_s, att_s, top_s), (fc_p, att_p, top_p) in zip(sharded, plain):
        np.testing.assert_allclose(fc_s, fc_p, rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(att_s, att_p, rtol=1e-6, atol=1e-6)
        np.testing.assert_array_equal(top_s, top_p)

    with pytest.raises(ValueError, match="not multiples of the mesh"):
        serving_daemon.EncodeBatcher(
            make_apply(w), cpt, fc_dim=24, shape_buckets=((16, 16),),
            batch_buckets=(1, 2), mesh=mesh)
    assert serving_daemon.default_encode_buckets(mesh) == (4, 16, 32)
    assert serving_daemon.default_encode_buckets(None) == (1, 4, 16, 32)


def test_stall_watchdog_reports_wedged_device_step():
    """stalled_for() ages while a dispatch step is wedged on the device
    (what a dead backend link does to block_until_ready/transfers) and
    drops back to 0 once it completes — the /healthz 503 signal."""
    release = threading.Event()

    class Wedged(_FakeEncode):
        def __call__(self, imgs):
            release.wait(30)
            return super().__call__(imgs)

    b, enc, cpt = _enc_batcher(enc=Wedged())
    try:
        assert b.stalled_for() == 0.0 and b.healthy(0.05)
        out = {}
        t = threading.Thread(target=lambda: out.setdefault(
            "r", b.submit_image(np.zeros((16, 16, 3), np.uint8),
                                timeout=60)))
        t.start()
        deadline = time.monotonic() + 10
        while b.stalled_for() < 0.1 and time.monotonic() < deadline:
            time.sleep(0.01)
        assert b.stalled_for() >= 0.1 and not b.healthy(0.05)
        release.set()
        t.join(timeout=30)
        assert "r" in out
        assert b.stalled_for() == 0.0 and b.healthy(0.05)
    finally:
        release.set()
        b.close()


def test_encode_batcher_errors_delivered_not_fatal():
    class Boom(_FakeEncode):
        def __call__(self, imgs):
            raise RuntimeError("device on fire")

    b, enc, cpt = _enc_batcher(enc=Boom())
    try:
        with pytest.raises(RuntimeError, match="device on fire"):
            b.submit_image(np.zeros((16, 16, 3), np.uint8), timeout=300)
        st = b.stats()
        assert st["failed_requests"] == 1 and st["failed_batches"] == 1
        # fc path unaffected (separate group, same machinery)
        b.submit_fc(np.zeros((24,), np.float32), timeout=300)
    finally:
        b.close()


def test_submit_blocks_on_condition_not_poll(params, settings):
    """Saturation backpressure wakes via the dispatch thread's Condition
    notify (advisor r3: no 1 kHz poll): a submit blocked on a FULL queue
    with enqueue_timeout=None must complete once the queue drains."""
    g = np.random.default_rng(2)
    imgs = [g.integers(0, 256, size=(16, 16, 3)).astype(np.uint8)
            for _ in range(4)]

    class Slow(_FakeEncode):
        def __init__(self, gate):
            super().__init__()
            self.gate = gate

        def __call__(self, x):
            self.gate.wait(30)
            return super().__call__(x)

    gate = threading.Event()
    b, enc, cpt = _enc_batcher(enc=Slow(gate), batch_buckets=(1,),
                               max_wait_s=0.0, max_queue=1)
    try:
        out = []
        ts = [threading.Thread(
            target=lambda i=i: out.append(
                b.submit_image(imgs[i], timeout=300)))
            for i in range(4)]
        for t in ts:
            t.start()
        gate.set()                       # release the encoder
        for t in ts:
            t.join(60)
        assert len(out) == 4
    finally:
        b.close()


def test_prometheus_metrics_rendering():
    """prometheus_metrics renders stats() dicts as valid text exposition:
    counters per stage, per-bucket batch counts, latency quantiles with
    a _count line, stall gauges, and escaped label values."""
    from insenticap_model_tpu.serving_daemon import prometheus_metrics
    decode = {"requests": 7, "batches": 3, "padded_rows": 2,
              "failed_requests": 1, "failed_batches": 1,
              "by_bucket": {1: 1, 384: 2},
              "latency_by_bucket": {
                  384: {"n": 6, "p50_ms": 12.5, "p99_ms": 40.0}}}
    encode = {"requests": 4, "batches": 2, "padded_rows": 0,
              "failed_requests": 0, "failed_batches": 0,
              "by_bucket": {((448, 448), 32): 2},
              "latency_by_bucket": {}}
    text = prometheus_metrics({"decode": decode, "encode": encode},
                              {"decode": 0.0, "encode": 1.5})
    assert text.endswith("\n")
    lines = text.splitlines()
    assert 'isc_requests_total{stage="decode"} 7' in lines
    assert 'isc_requests_total{stage="encode"} 4' in lines
    assert 'isc_failed_batches_total{stage="decode"} 1' in lines
    assert ('isc_batches_by_bucket_total{stage="decode",bucket="384"} 2'
            in lines)
    # tuple bucket keys stringify into the label value
    assert any(l.startswith('isc_batches_by_bucket_total{stage="encode"')
               and l.endswith(" 2") for l in lines)
    assert ('isc_request_latency_ms{stage="decode",bucket="384",'
            'quantile="0.5"} 12.5' in lines)
    assert ('isc_request_latency_ms_count{stage="decode",bucket="384"} 6'
            in lines)
    assert 'isc_stalled_seconds{stage="encode"} 1.500' in lines
    # every non-comment line is 'name{labels} value'
    for line in lines:
        if line.startswith("#"):
            continue
        name_labels, value = line.rsplit(" ", 1)
        float(value)
        assert name_labels.startswith("isc_")
        if "{" in name_labels:
            assert name_labels.endswith("}")
    # label values must not contain raw quotes (escaping)
    text2 = prometheus_metrics(
        {"decode": {"requests": 0, "by_bucket": {'a"b': 1},
                    "latency_by_bucket": {}}})
    assert 'bucket="a\\"b"' in text2


@pytest.mark.slow
def test_soak_tool_sustained_load():
    """tools/soak_daemon.py end to end at CPU scale: sustained
    closed-loop load, RSS/watchdog/percentile sampling, drain under
    load — the tool must exit 0 and print SOAK OK (the chip record in
    DESIGN.md round-4 is the same tool at production dims)."""
    import os
    import subprocess
    import sys
    root = os.path.join(os.path.dirname(__file__), "..")
    p = subprocess.run(
        [sys.executable, os.path.join(root, "tools", "soak_daemon.py"),
         "--secs", "8", "--bucket", "4", "--threads", "4"],
        capture_output=True, text=True, timeout=300, cwd=root)
    assert p.returncode == 0, p.stdout + p.stderr
    assert "SOAK OK" in p.stdout, p.stdout + p.stderr
