"""METEOR-lite: exact + Porter-stem matching METEOR.

The paper's results table reports METEOR (SURVEY.md §6) but the reference
repo contains no METEOR implementation — its numbers came from the external
coco-caption toolkit (Meteor 1.5). This implementation uses Meteor 1.5's
'en'-task parameters (α=0.85, β=0.2, γ=0.6) with the exact (weight 1.0) and
Porter-stem (weight 0.6) match stages; the synonym/paraphrase stages need
WordNet/paraphrase data unavailable offline, and the function-word
discount (δ) needs a function-word list, so both are omitted. Labeled
METEOR* in output: directionally comparable to coco-caption METEOR but NOT
numerically interchangeable — treat it as an internal tracking metric.

Formula: P = m_w/|hyp|, R = m_w/|ref| (m_w = weighted matches),
Fmean = P·R / (α·P + (1−α)·R), penalty = γ·(chunks/m)^β over unweighted
matches, score = Fmean·(1−penalty). Multiple references: max per-reference
score (coco-caption convention).
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

ALPHA = 0.85   # Meteor 1.5 'en' task
BETA = 0.2
GAMMA = 0.6
W_EXACT = 1.0  # per-stage match weights
W_STEM = 0.6


try:
    from nltk.stem.porter import PorterStemmer
    _STEMMER = PorterStemmer()
except Exception:  # pragma: no cover - nltk is baked into this image
    _STEMMER = None


def _stem(w: str) -> str:
    return _STEMMER.stem(w) if _STEMMER is not None else w


def _align(hyp: Sequence[str], ref: Sequence[str],
           hyp_stems: Sequence[str], ref_stems: Sequence[str]
           ) -> Tuple[int, float, int]:
    """Greedy two-stage alignment (exact first, then stems). Returns
    (matches, weighted_matches, chunks). Each hyp/ref token is used at most
    once; chunks are maximal contiguous-and-monotone alignment runs."""
    ref_used = [False] * len(ref)
    hyp_matched: List = [None] * len(hyp)
    weighted = 0.0

    def stage(hkeys, rkeys, weight):
        nonlocal weighted
        for i, hk in enumerate(hkeys):
            if hyp_matched[i] is not None:
                continue
            for j, rk in enumerate(rkeys):
                if not ref_used[j] and rk == hk:
                    ref_used[j] = True
                    hyp_matched[i] = j
                    weighted += weight
                    break

    stage(hyp, ref, W_EXACT)
    stage(hyp_stems, ref_stems, W_STEM)

    align = [(i, j) for i, j in enumerate(hyp_matched) if j is not None]
    m = len(align)
    if m == 0:
        return 0, 0.0, 0
    chunks = 1
    for (i0, j0), (i1, j1) in zip(align, align[1:]):
        if not (i1 == i0 + 1 and j1 == j0 + 1):
            chunks += 1
    return m, weighted, chunks


def score_sentence(hyp: Sequence[str], refs: List[Sequence[str]]) -> float:
    hyp = list(hyp)
    hyp_stems = [_stem(w) for w in hyp]  # stem once, not per pair
    best = 0.0
    for ref in refs:
        ref = list(ref)
        if not hyp or not ref:
            continue
        m, mw, chunks = _align(hyp, ref, hyp_stems,
                               [_stem(w) for w in ref])
        if m == 0:
            continue
        p = mw / len(hyp)
        r = mw / len(ref)
        fmean = p * r / (ALPHA * p + (1 - ALPHA) * r)
        penalty = GAMMA * (chunks / m) ** BETA
        best = max(best, fmean * (1.0 - penalty))
    return best


class Meteor:
    """coco-caption-shaped API: compute_score(gts, res) -> (mean, scores)."""

    def compute_score(self, gts: Dict, res: List[Dict]):
        scores = [score_sentence(item["caption"][0],
                                 gts[item["image_id"]]) for item in res]
        mean = sum(scores) / max(len(scores), 1)
        return mean, scores
