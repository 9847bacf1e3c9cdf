"""Collate parity: our static-shape batch assembly vs the reference's
7 collate closures (/root/reference/dataloader.py:9-149).

The reference sorts each batch by caption length and pads to the batch
max; we keep input order and pad to static shapes. Feeding our collate the
reference-sorted item order must then reproduce the reference tensors
exactly on the overlapping width, with pure pad_id beyond it, and
identical lengths (len-1 quirk, SURVEY.md §8.3) / concepts / sentiment
words / ground-truth dicts.
"""
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree not available")
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

from dataloader import create_collate_fn  # noqa: E402

from insenticap_model_tpu.data import collate  # noqa: E402

PAD = 0
MAX_SEQ_LEN = 16  # reference opts.py:60; factories pass max_seq_len+1
NUM_CPTS, NUM_SENTIS = 5, 10


class FakeStore:
    def __init__(self, data):
        self.data = data

    def batch(self, fns):
        return np.stack([self.data[fn] for fn in fns])


def _caps_for(g, n, lmin=4, lmax=18):
    """id caption: sos + words + eos, variable length (some > max_seq_len
    to exercise truncation)."""
    out = []
    for _ in range(n):
        L = int(g.integers(lmin, lmax))
        out.append([2] + [int(x) for x in g.integers(4, 40, size=L)] + [3])
    return out


def _assert_caps_equal(ref_caps, ref_lengths, ours):
    ref_caps = ref_caps.numpy()
    W = ref_caps.shape[1]
    np.testing.assert_array_equal(ours["caps"][:, :W], ref_caps)
    assert (ours["caps"][:, W:] == PAD).all()
    np.testing.assert_array_equal(ours["lengths"], np.asarray(ref_lengths))


def test_caption_collate_parity():
    g = np.random.default_rng(0)
    fc = {f"i{k}": g.normal(size=(8,)).astype(np.float32) for k in range(3)}
    att = {f"i{k}": g.normal(size=(4, 8)).astype(np.float32)
           for k in range(3)}
    items = [(f"i{k}", fc[f"i{k}"], att[f"i{k}"], _caps_for(g, 5),
              [int(x) for x in g.integers(4, 40, size=int(g.integers(2, 7)))])
             for k in range(3)]

    fn = create_collate_fn("caption", PAD, MAX_SEQ_LEN + 1, NUM_CPTS)
    rfns, rfc, ratt, (rcaps, rlens), rcpts = fn(
        [list(it) for it in items])

    # ours consumes flattened (fn, cap, cpt) rows; apply the reference's
    # ordering (flatten 5 caps/image, stable sort by len desc)
    flat = [(f, cap, cpt) for f, _, _, caps, cpt in items for cap in caps]
    flat.sort(key=lambda p: len(p[1]), reverse=True)
    ours = collate.caption_batch(flat, MAX_SEQ_LEN, NUM_CPTS, PAD,
                                 FakeStore(fc), FakeStore(att))
    assert ours["fns"] == list(rfns)
    np.testing.assert_array_equal(ours["fc"], rfc.numpy())
    np.testing.assert_array_equal(ours["att"], ratt.numpy())
    _assert_caps_equal(rcaps, rlens, ours)
    np.testing.assert_array_equal(ours["cpts"], rcpts.numpy())


def test_scs_collate_parity():
    g = np.random.default_rng(1)
    items = [(_caps_for(g, 1)[0],
              [int(x) for x in g.integers(4, 40, size=3)],
              [int(x) for x in g.integers(4, 40, size=int(g.integers(2, 13)))],
              int(g.integers(0, 3))) for _ in range(6)]
    fn = create_collate_fn("senti_corpus_with_sentis", PAD, MAX_SEQ_LEN + 1,
                           NUM_CPTS, NUM_SENTIS)
    (rcaps, rlens), rcpts, rsentis, rids = fn([list(it) for it in items])

    srt = sorted(items, key=lambda p: len(p[0]), reverse=True)
    ours = collate.scs_batch(srt, MAX_SEQ_LEN, NUM_CPTS, NUM_SENTIS, PAD)
    _assert_caps_equal(rcaps, rlens, ours)
    np.testing.assert_array_equal(ours["cpts"], rcpts.numpy())
    np.testing.assert_array_equal(ours["sentis"], rsentis.numpy())
    np.testing.assert_array_equal(ours["senti_labels"], rids.numpy())


def test_rl_fact_collate_parity():
    g = np.random.default_rng(2)
    fc = {f"i{k}": g.normal(size=(8,)).astype(np.float32) for k in range(5)}
    att = {f"i{k}": g.normal(size=(4, 8)).astype(np.float32)
           for k in range(5)}
    # single caption per image so the reference's random.sample and our
    # rng pick the same caption deterministically
    items = [(f"i{k}", _caps_for(g, 1),
              [int(x) for x in g.integers(4, 40, size=4)],
              [int(x) for x in g.integers(4, 40, size=7)])
             for k in range(5)]

    fn = create_collate_fn("rl_fact", PAD, MAX_SEQ_LEN + 1, NUM_CPTS,
                           NUM_SENTIS)
    ref_in = [[f, caps, fc[f], att[f], cpts, sw]
              for f, caps, cpts, sw in items]
    rfns, rfc, ratt, (rcaps, rlens), rcpts, rsentis, rgt = fn(ref_in)

    srt = sorted(items, key=lambda p: len(p[1][0]), reverse=True)
    ours = collate.rl_fact_batch(srt, MAX_SEQ_LEN, NUM_CPTS, NUM_SENTIS,
                                 PAD, FakeStore(fc), FakeStore(att),
                                 np.random.default_rng(0))
    assert ours["fns"] == list(rfns)
    np.testing.assert_array_equal(ours["fc"], rfc.numpy())
    _assert_caps_equal(rcaps, rlens, ours)
    np.testing.assert_array_equal(ours["cpts"], rcpts.numpy())
    np.testing.assert_array_equal(ours["sentis"], rsentis.numpy())
    assert set(ours["ground_truth"]) == set(rgt)
    for k in rgt:
        assert [list(c) for c in ours["ground_truth"][k]] == \
            [list(c) for c in rgt[k]]


def test_rl_senti_collate_parity():
    g = np.random.default_rng(3)
    fc = {f"i{k}": g.normal(size=(8,)).astype(np.float32) for k in range(4)}
    att = {f"i{k}": g.normal(size=(4, 8)).astype(np.float32)
           for k in range(4)}
    items = [(f"i{k}", [int(x) for x in g.integers(4, 40, size=3)],
              [int(x) for x in g.integers(4, 40, size=12)],
              int(g.integers(0, 3))) for k in range(4)]
    fn = create_collate_fn("rl_senti", PAD, MAX_SEQ_LEN + 1, NUM_CPTS,
                           NUM_SENTIS)
    ref_in = [[f, fc[f], att[f], cpts, sw, lab]
              for f, cpts, sw, lab in items]
    rfns, rfc, ratt, rcpts, rsentis, rlabels = fn(ref_in)
    ours = collate.rl_senti_batch(items, NUM_CPTS, NUM_SENTIS, PAD,
                                  FakeStore(fc), FakeStore(att))
    assert ours["fns"] == list(rfns)
    np.testing.assert_array_equal(ours["cpts"], rcpts.numpy())
    np.testing.assert_array_equal(ours["sentis"], rsentis.numpy())
    np.testing.assert_array_equal(ours["senti_labels"], rlabels.numpy())


def test_senti_sents_collate_parity():
    g = np.random.default_rng(4)
    # sentences: ids + eos, no SOS; collate gets plain max_seq_len (no +1)
    items = [(int(g.integers(0, 3)),
              [int(x) for x in g.integers(4, 40,
                                          size=int(g.integers(3, 20)))] + [3])
             for _ in range(6)]
    fn = create_collate_fn("senti_sents", PAD, MAX_SEQ_LEN)
    rlabels, (rcaps, rlens) = fn([list(it) for it in items])

    srt = sorted(items, key=lambda p: len(p[1]), reverse=True)
    ours = collate.senti_sents_batch(srt, MAX_SEQ_LEN, PAD)
    rcaps = rcaps.numpy()
    W = rcaps.shape[1]
    np.testing.assert_array_equal(ours["caps"][:, :W], rcaps)
    assert (ours["caps"][:, W:] == PAD).all()
    # quirk preserved: senti_sents lengths are NOT decremented
    np.testing.assert_array_equal(ours["lengths"], np.asarray(rlens))
    np.testing.assert_array_equal(ours["labels"], rlabels.numpy())
