"""METEOR-lite: exact + Porter-stem matching METEOR.

The paper's results table reports METEOR (SURVEY.md §6) but the reference
repo contains no METEOR implementation — its numbers came from the external
coco-caption toolkit, whose Java METEOR uses exact/stem/synonym/paraphrase
stages. Synonym and paraphrase matching require WordNet / paraphrase-table
data that is unavailable offline, so this implementation runs the exact and
stem stages only and is labeled METEOR-lite; scores are comparable but
systematically slightly lower than full METEOR (unmatched synonyms).

Formula (Denkowski & Lavie defaults for the 'en' task as used by
coco-caption): P = m/|hyp|, R = m/|ref|, Fmean = P·R / (α·P + (1−α)·R) with
α=0.9, penalty = γ·(chunks/m)^β with γ=0.5, β=3, score = Fmean·(1−penalty).
Multiple references: max per-reference score (coco-caption convention).
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

ALPHA = 0.9
BETA = 3.0
GAMMA = 0.5


try:
    from nltk.stem.porter import PorterStemmer
    _STEMMER = PorterStemmer()
except Exception:  # pragma: no cover - nltk is baked into this image
    _STEMMER = None


def _stem(w: str) -> str:
    return _STEMMER.stem(w) if _STEMMER is not None else w


def _align(hyp: Sequence[str], ref: Sequence[str]) -> Tuple[int, int]:
    """Greedy two-stage alignment (exact first, then stems). Returns
    (matches, chunks). Each hyp/ref token is used at most once; chunks are
    maximal runs of alignments contiguous and monotone in both strings."""
    ref_used = [False] * len(ref)
    align: List[Tuple[int, int]] = []  # (hyp_idx, ref_idx)
    hyp_matched = [None] * len(hyp)

    def stage(key):
        for i, hw in enumerate(hyp):
            if hyp_matched[i] is not None:
                continue
            hk = key(hw)
            for j, rw in enumerate(ref):
                if not ref_used[j] and key(rw) == hk:
                    ref_used[j] = True
                    hyp_matched[i] = j
                    break

    stage(lambda w: w)
    stage(_stem)

    align = [(i, j) for i, j in enumerate(hyp_matched) if j is not None]
    m = len(align)
    if m == 0:
        return 0, 0
    chunks = 1
    for (i0, j0), (i1, j1) in zip(align, align[1:]):
        if not (i1 == i0 + 1 and j1 == j0 + 1):
            chunks += 1
    return m, chunks


def score_sentence(hyp: Sequence[str], refs: List[Sequence[str]]) -> float:
    best = 0.0
    for ref in refs:
        if not hyp or not ref:
            continue
        m, chunks = _align(list(hyp), list(ref))
        if m == 0:
            continue
        p = m / len(hyp)
        r = m / len(ref)
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
