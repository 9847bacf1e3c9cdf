"""Serving-path tests: detect_and_decode, greedy decode, sentiment sweep."""
import numpy as np

import jax
import jax.numpy as jnp

from insenticap_model_tpu import inference
from insenticap_model_tpu.models import captioner as cap
from insenticap_model_tpu.models import sentiment_detector as senti_det

IDS = cap.TokenIds(pad=0, unk=1, sos=2, eos=3, neutral=2)
V = 40


def _params(settings):
    return inference.ServingParams(
        captioner=cap.init_params(jax.random.PRNGKey(0), V, 3, settings),
        senti_detector=senti_det.init_params(jax.random.PRNGKey(1), 3,
                                             settings))


def test_detect_and_decode_shapes(settings):
    g = np.random.default_rng(0)
    bs, T = 4, 8
    p = _params(settings)
    fc = jnp.asarray(g.normal(size=(bs, settings.fc_feat_dim)), jnp.float32)
    att = jnp.asarray(g.normal(size=(bs, 14, 14, settings.att_feat_dim)),
                      jnp.float32)
    sentis = jnp.asarray(g.integers(4, V, size=(bs, 6)), jnp.int32)
    fn = inference.make_serving_fn(settings, IDS, beam_size=3, max_seq_len=T)
    seqs, scores, labels = fn(p, fc, att, sentis)
    assert seqs.shape == (bs, 3, T)
    assert scores.shape == (bs, 3)
    assert labels.shape == (bs,)
    # scores sorted descending per image
    s = np.asarray(scores)
    assert (np.diff(s, axis=1) <= 1e-5).all()
    # token ids in range, no PAD/SOS/UNK generated
    sq = np.asarray(seqs)
    assert sq.min() >= 0 and sq.max() < V
    assert not np.isin(sq, [IDS.pad, IDS.sos, IDS.unk]).any()


def test_serving_with_full_detector_variant(settings):
    """Settings.num_kernels_per_sentiment > 0 routes the serving path's
    image-sentiment detection through the full variant
    (models/sentiment_detector_full.py) with no API change."""
    import dataclasses
    from insenticap_model_tpu.models import sentiment_detector_full as sdf

    s_full = dataclasses.replace(settings, num_kernels_per_sentiment=2)
    g = np.random.default_rng(5)
    bs, T = 4, 8
    p = inference.ServingParams(
        captioner=cap.init_params(jax.random.PRNGKey(0), V, 3, s_full),
        senti_detector=sdf.init_params(jax.random.PRNGKey(1), 3, s_full))
    fc = jnp.asarray(g.normal(size=(bs, s_full.fc_feat_dim)), jnp.float32)
    att = jnp.asarray(g.normal(size=(bs, 14, 14, s_full.att_feat_dim)),
                      jnp.float32)
    sentis = jnp.asarray(g.integers(4, V, size=(bs, 6)), jnp.int32)
    fn = inference.make_serving_fn(s_full, IDS, beam_size=2, max_seq_len=T)
    seqs, scores, labels = fn(p, fc, att, sentis)
    assert seqs.shape == (bs, 2, T) and labels.shape == (bs,)
    # labels equal the variant's own sample() on the same inputs
    ref_labels, _, _ = sdf.sample(p.senti_detector, att,
                                  inference.SENTI_THRESHOLD, IDS.neutral)
    np.testing.assert_array_equal(np.asarray(labels),
                                  np.asarray(ref_labels))


def test_greedy_decode(settings):
    g = np.random.default_rng(1)
    bs, T = 4, 8
    p = _params(settings)
    fc = jnp.asarray(g.normal(size=(bs, settings.fc_feat_dim)), jnp.float32)
    att = jnp.asarray(g.normal(size=(bs, 9, settings.att_feat_dim)),
                      jnp.float32)
    sentis = jnp.asarray(g.integers(4, V, size=(bs, 6)), jnp.int32)
    labels = jnp.asarray(g.integers(0, 3, size=(bs,)), jnp.int32)
    seqs, masks = inference.decode_greedy(p.captioner, fc, att, sentis,
                                          labels, settings=settings,
                                          ids=IDS, max_seq_len=T)
    assert seqs.shape == (bs, T) and masks.shape == (bs, T)
    # deterministic: same inputs -> same outputs
    seqs2, _ = inference.decode_greedy(p.captioner, fc, att, sentis, labels,
                                       settings=settings, ids=IDS,
                                       max_seq_len=T)
    np.testing.assert_array_equal(np.asarray(seqs), np.asarray(seqs2))


def test_sweep_sentiments(settings):
    g = np.random.default_rng(2)
    bs, T = 3, 8
    p = _params(settings)
    fc = jnp.asarray(g.normal(size=(bs, settings.fc_feat_dim)), jnp.float32)
    att = jnp.asarray(g.normal(size=(bs, 9, settings.att_feat_dim)),
                      jnp.float32)
    sentis = jnp.asarray(g.integers(4, V, size=(3, bs, 6)), jnp.int32)
    seqs, scores = inference.sweep_sentiments(
        p.captioner, fc, att, sentis, settings=settings, ids=IDS,
        beam_size=2, max_seq_len=T)
    assert seqs.shape == (3, bs, 2, T)
    assert scores.shape == (3, bs, 2)
    # different sentiment labels generally produce different captions for
    # at least one image (senti label embedding feeds every step)
    sq = np.asarray(seqs)
    assert not np.array_equal(sq[0], sq[1]) or not np.array_equal(
        sq[1], sq[2])

    # exact parity with a standalone per-label decode: the fold-into-batch
    # sweep must not couple rows (the docstring's equality claim)
    from insenticap_model_tpu.ops import beam
    for lab in (0, 2):
        ctx, _ = cap.build_visual_context(
            p.captioner, fc, att, settings.dropout_p, jax.random.PRNGKey(0),
            True, senti_words=sentis[lab],
            senti_labels=jnp.full((bs,), lab, jnp.int32), pad_id=IDS.pad)
        s1, sc1 = beam.beam_search_batched(
            p.captioner, ctx, settings=settings, ids=IDS, beam_size=2,
            max_seq_len=T, mode="rl")
        np.testing.assert_array_equal(sq[lab], np.asarray(s1))
        np.testing.assert_allclose(np.asarray(scores[lab]),
                                   np.asarray(sc1), rtol=1e-5)


def test_beam_early_exit_matches_scan(settings):
    """early_exit while_loop and the scan path must be bit-identical, both
    for never-ending (random) and immediately-ending (EOS-biased) models."""
    from insenticap_model_tpu.ops import beam
    g = np.random.default_rng(3)
    bs, T = 4, 8
    p = cap.init_params(jax.random.PRNGKey(0), V, 3, settings)
    fc = jnp.asarray(g.normal(size=(bs, settings.fc_feat_dim)), jnp.float32)
    att = jnp.asarray(g.normal(size=(bs, 9, settings.att_feat_dim)),
                      jnp.float32)
    sentis = jnp.asarray(g.integers(4, V, size=(bs, 5)), jnp.int32)
    labels = jnp.asarray(g.integers(0, 3, size=(bs,)), jnp.int32)
    ctx, _ = cap.build_visual_context(
        p, fc, att, settings.dropout_p, jax.random.PRNGKey(0), True,
        senti_words=sentis, senti_labels=labels, pad_id=0)
    p_eos = dict(p)
    p_eos["classifier"] = dict(p["classifier"])
    p_eos["classifier"]["b"] = p["classifier"]["b"].at[IDS.eos].set(50.0)
    for params in (p, p_eos):
        s1, v1 = beam.beam_search_batched(
            params, ctx, settings=settings, ids=IDS, beam_size=3,
            max_seq_len=T, mode="rl", early_exit=True)
        s2, v2 = beam.beam_search_batched(
            params, ctx, settings=settings, ids=IDS, beam_size=3,
            max_seq_len=T, mode="rl", early_exit=False)
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                                   atol=1e-6)


def test_return_weights(settings):
    """Optional decode-time attention weights (SURVEY.md §8.14): same
    seqs/scores as the plain path, correct shapes, rows softmax-normalized,
    and the returned weights follow each candidate's ACTUAL path — checked
    against a manual stepwise re-decode of the top candidate."""
    from insenticap_model_tpu.models.captioner import (DecodeState,
                                                       decode_step)
    g = np.random.default_rng(5)
    bs, T, M = 4, 8, 6
    p = _params(settings)
    fc = jnp.asarray(g.normal(size=(bs, settings.fc_feat_dim)), jnp.float32)
    att = jnp.asarray(g.normal(size=(bs, 14, 14, settings.att_feat_dim)),
                      jnp.float32)
    sentis = jnp.asarray(g.integers(4, V, size=(bs, M)), jnp.int32)

    fn = inference.make_serving_fn(settings, IDS, beam_size=3, max_seq_len=T)
    fnw = inference.make_serving_fn(settings, IDS, beam_size=3,
                                    max_seq_len=T, return_weights=True)
    seqs, scores, labels = fn(p, fc, att, sentis)
    seqs_w, scores_w, labels_w, weights = fnw(p, fc, att, sentis)
    np.testing.assert_array_equal(np.asarray(seqs), np.asarray(seqs_w))
    np.testing.assert_allclose(np.asarray(scores), np.asarray(scores_w),
                               atol=1e-5)

    assert set(weights) == {"cont", "senti", "fuse"}
    assert weights["cont"].shape == (bs, 3, T, 14 * 14)
    assert weights["senti"].shape == (bs, 3, T, M + 1)  # +1: PAD null slot
    assert weights["fuse"].shape == (bs, 3, T, 1)
    cont = np.asarray(weights["cont"])
    np.testing.assert_allclose(cont.sum(-1), 1.0, atol=1e-5)

    # path correctness: re-decode the top candidate token-by-token with
    # teacher-forced decode_step; its weights must equal the returned ones
    ctx, _ = cap.build_visual_context(
        p.captioner, fc, att, settings.dropout_p, jax.random.PRNGKey(0),
        True, senti_words=sentis, senti_labels=labels, pad_id=IDS.pad)
    H = settings.rnn_hid_dim
    z = jnp.zeros((bs, H), jnp.float32)
    state = DecodeState(z, z, z, z)
    it = jnp.full((bs,), IDS.sos, jnp.int32)
    top = np.asarray(seqs)[:, 0]                          # [bs, T]
    for t in range(T):
        _, state, w = decode_step(p.captioner, ctx, state, it, mode="rl",
                                  dropout_p=0.0,
                                  drop_key=jax.random.PRNGKey(0),
                                  deterministic=True)
        np.testing.assert_allclose(np.asarray(w["cont"]),
                                   cont[:, 0, t], atol=1e-5)
        it = jnp.asarray(top[:, t])


def test_sharded_serving_matches_single(settings):
    """make_sharded_serving_fn (shard_map over the data axis — the
    multi-chip path that keeps the pallas kernels legal per-device) must
    reproduce the single-chip detect_and_decode exactly."""
    from insenticap_model_tpu.parallel import mesh as pmesh
    g = np.random.default_rng(5)
    bs, T = 16, 8
    p = _params(settings)
    fc = jnp.asarray(g.normal(size=(bs, settings.fc_feat_dim)), jnp.float32)
    att = jnp.asarray(g.normal(size=(bs, 14, 14, settings.att_feat_dim)),
                      jnp.float32)
    sentis = jnp.asarray(g.integers(4, V, size=(bs, 6)), jnp.int32)

    ref_fn = inference.make_serving_fn(settings, IDS, beam_size=3,
                                       max_seq_len=T)
    seqs1, scores1, labels1 = ref_fn(p, fc, att, sentis)

    m = pmesh.make_mesh((8,))
    fn = inference.make_sharded_serving_fn(m, settings, IDS, beam_size=3,
                                           max_seq_len=T)
    ps = pmesh.replicate(m, p)
    sb = pmesh.shard_batch(m, {"fc": fc, "att": att, "sentis": sentis})
    seqs8, scores8, labels8 = fn(ps, sb["fc"], sb["att"], sb["sentis"])
    np.testing.assert_array_equal(np.asarray(seqs8), np.asarray(seqs1))
    np.testing.assert_allclose(np.asarray(scores8), np.asarray(scores1),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(labels8), np.asarray(labels1))
