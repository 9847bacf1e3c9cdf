"""On-device per-sentiment ARPA trigram LM scoring for the RL LM reward.

The reference keeps a (disabled) kenlm-based LM reward wired to the RL
stage: per-sentiment id-form ARPA models injected via ``Detector.set_lms``
(/root/reference/train_rl.py:212-216) and scored on host per sentence
(self_critical/utils.py:86-100). A host round-trip would break this
framework's single-jit-region RL step, so the ARPA tables are flattened
into device-resident arrays — dense unigrams per sentiment plus dual-hash
sorted tables for bigrams/trigrams (same hashing scheme as
ops/ciderd_device.py) — and full-backoff scoring runs vectorized inside
the jit region.

Scoring convention matches rewards.rewards.ArpaTrigramLM (the host twin,
kenlm-style): total log10 prob of ``<s> seq </s>`` where seq = rollout
words + the explicit EOS id; OOV tokens use the ARPA's <unk> entry when
present, else a -99 floor. Parity device == host is asserted in
tests/test_lm_device.py.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..rewards.rewards import ArpaTrigramLM
from .ciderd_device import M1, M2, PROBE, S1, S2, canonicalize

OOV_LP = -99.0


class LMTables(NamedTuple):
    """Device-resident per-sentiment trigram LMs. Token space is
    [0, V+1]: raw vocab ids, then EOS* = V (</s>) and SOS* = V+1 (<s>)."""
    uni_lp: jnp.ndarray   # [S, V+2] float32 (OOV-filled)
    uni_bo: jnp.ndarray   # [S, V+2] float32
    bi_h1: jnp.ndarray    # [B] uint32 sorted
    bi_h2: jnp.ndarray    # [B] uint32
    bi_lp: jnp.ndarray    # [B] float32
    bi_bo: jnp.ndarray    # [B] float32
    tri_h1: jnp.ndarray   # [T] uint32 sorted
    tri_h2: jnp.ndarray   # [T] uint32
    tri_lp: jnp.ndarray   # [T] float32
    vocab_size: int       # V (static)


def _host_hash(parts) -> tuple:
    h1 = np.uint32(S1)
    h2 = np.uint32(S2)
    with np.errstate(over="ignore"):
        for p in parts:
            t = np.uint32(p + 1)
            h1 = (h1 ^ t) * M1
            h2 = (h2 ^ t) * M2
    return int(h1), int(h2)


def _sorted_table(entries, n_vals: int):
    """entries: [(h1, h2, *vals)] -> sorted uint32/float32 arrays; checks
    the probe window and dual-hash uniqueness like ciderd_device."""
    if not entries:
        entries = [(0, 0) + (0.0,) * n_vals]
    entries.sort()
    h1s = np.array([e[0] for e in entries], np.uint32)
    h2s = np.array([e[1] for e in entries], np.uint32)
    vals = [np.array([e[2 + i] for e in entries], np.float32)
            for i in range(n_vals)]
    if len(h1s) > 1:
        change = np.flatnonzero(np.diff(h1s) != 0)
        bounds = np.concatenate([[-1], change, [len(h1s) - 1]])
        if int(np.diff(bounds).max()) > PROBE:
            raise RuntimeError("LM table duplicate-key run exceeds probe")
    pair = h1s.astype(np.uint64) << np.uint64(32) | h2s.astype(np.uint64)
    if len(pair) != len(np.unique(pair)):
        raise RuntimeError("dual-hash collision in LM table")
    return h1s, h2s, vals


def build_lm_tables(arpa_paths: Sequence[str], vocab_size: int) -> LMTables:
    """arpa_paths[senti_id] -> id-form ARPA file (preprocessing
    get_lm_sents writes {senti}_id.sri). Token strings are integer ids
    plus <s>/</s> (/<unk>)."""
    V = vocab_size
    EOS_STAR, SOS_STAR = V, V + 1
    S = len(arpa_paths)

    def tok_id(t: str) -> int:
        if t == ArpaTrigramLM.BOS:
            return SOS_STAR
        if t == ArpaTrigramLM.EOS:
            return EOS_STAR
        if t == "<unk>":
            return -1
        i = int(t)
        if not 0 <= i < V:
            raise ValueError(f"LM token id {i} outside vocab {V}")
        return i

    uni_lp = np.full((S, V + 2), OOV_LP, np.float32)
    uni_bo = np.zeros((S, V + 2), np.float32)
    bi, tri = [], []
    for s, path in enumerate(arpa_paths):
        lm = ArpaTrigramLM(path)
        unk_lp = lm.lp[0].get(("<unk>",))
        if unk_lp is not None:
            uni_lp[s, :] = unk_lp  # kenlm-style OOV fill
        for (w,), lp in lm.lp[0].items():
            i = tok_id(w)
            if i >= 0:
                uni_lp[s, i] = lp
        for (w,), bo in lm.bo[0].items():
            i = tok_id(w)
            if i >= 0:
                uni_bo[s, i] = bo
        for (a, b), lp in lm.lp[1].items():
            ia, ib = tok_id(a), tok_id(b)
            if ia < 0 or ib < 0:
                continue
            bo = lm.bo[1].get((a, b), 0.0)
            bi.append(_host_hash((s, ia, ib)) + (lp, bo))
        for (a, b, c), lp in lm.lp[2].items():
            ia, ib, ic = tok_id(a), tok_id(b), tok_id(c)
            if ia < 0 or ib < 0 or ic < 0:
                continue
            tri.append(_host_hash((s, ia, ib, ic)) + (lp,))

    bh1, bh2, (blp, bbo) = _sorted_table(bi, 2)
    th1, th2, (tlp,) = _sorted_table(tri, 1)
    return LMTables(
        uni_lp=jnp.asarray(uni_lp), uni_bo=jnp.asarray(uni_bo),
        bi_h1=jnp.asarray(bh1), bi_h2=jnp.asarray(bh2),
        bi_lp=jnp.asarray(blp), bi_bo=jnp.asarray(bbo),
        tri_h1=jnp.asarray(th1), tri_h2=jnp.asarray(th2),
        tri_lp=jnp.asarray(tlp), vocab_size=V)


def _dev_hash(parts):
    """Device dual hash over stacked int parts (each array-like [.,])."""
    h1 = jnp.full(parts[0].shape, S1, jnp.uint32)
    h2 = jnp.full(parts[0].shape, S2, jnp.uint32)
    for p in parts:
        t = (p + 1).astype(jnp.uint32)
        h1 = (h1 ^ t) * jnp.uint32(M1)
        h2 = (h2 ^ t) * jnp.uint32(M2)
    return h1, h2


def _lookup(h1s, h2s, vals, h1, h2):
    """searchsorted + probe; returns (hit mask, val per vals array)."""
    pos = jnp.searchsorted(h1s, h1)
    D = h1s.shape[0]
    hit = jnp.zeros(h1.shape, jnp.bool_)
    outs = [jnp.zeros(h1.shape, jnp.float32) for _ in vals]
    for d in range(PROBE):
        p = jnp.minimum(pos + d, D - 1)
        m = (h1s[p] == h1) & (h2s[p] == h2)
        hit = hit | m
        outs = [jnp.where(m, v[p], o) for v, o in zip(vals, outs)]
    return hit, outs


def score_batch(tables: LMTables, seqs, senti_labels, eos: int):
    """Total log10 prob per row of <s> seq </s> (seq = rollout words +
    explicit EOS id, extracted by canonicalize). seqs [bs, T] raw rollout
    ids, senti_labels [bs]. Returns [bs] float32."""
    V = tables.vocab_size
    T = seqs.shape[1]
    Tc = T + 1  # canonical width (room for appended EOS id)

    def one(seq, s):
        c, L = canonicalize(seq, eos, Tc)
        idx = jnp.arange(Tc + 2)
        # e = [<s>, c_0 .. c_{Tc-1}, pad]; </s> overwrites position L+1
        e = jnp.concatenate([jnp.array([V + 1], jnp.int32),
                             jnp.maximum(c, 0),
                             jnp.array([0], jnp.int32)])
        e = jnp.where(idx == L + 1, V, e)

        w = e[1:]                       # predicted token per position j>=1
        c1 = e[:-1]
        c2 = jnp.concatenate([jnp.array([0], jnp.int32), e[:-2]])
        sv = jnp.full(w.shape, s, jnp.int32)

        lp1 = tables.uni_lp[s, w]
        bo1 = tables.uni_bo[s, c1]
        bh1, bh2 = _dev_hash((sv, c1, w))
        hit2, (lp2, _) = _lookup(tables.bi_h1, tables.bi_h2,
                                 (tables.bi_lp, tables.bi_bo), bh1, bh2)
        ch1, ch2 = _dev_hash((sv, c2, c1))
        hitc, (_, bo2) = _lookup(tables.bi_h1, tables.bi_h2,
                                 (tables.bi_lp, tables.bi_bo), ch1, ch2)
        th1, th2 = _dev_hash((sv, c2, c1, w))
        hit3, (lp3,) = _lookup(tables.tri_h1, tables.tri_h2,
                               (tables.tri_lp,), th1, th2)

        p2 = jnp.where(hit2, lp2, bo1 + lp1)
        p3 = jnp.where(hit3, lp3, jnp.where(hitc, bo2, 0.0) + p2)
        j = jnp.arange(1, Tc + 2)
        p = jnp.where(j == 1, p2, p3)
        valid = j <= L + 1
        return jnp.sum(jnp.where(valid, p, 0.0))

    return jax.vmap(one)(seqs, senti_labels.astype(jnp.int32))


def lm_reward(tables: LMTables, sample_seq, greedy_seq, senti_labels,
              eos: int):
    """sign(lm(greedy) - lm(sample)) broadcast over timesteps — the
    reference get_lm_reward (self_critical/utils.py:86-100), on device."""
    T = sample_seq.shape[1]
    ss = score_batch(tables, sample_seq, senti_labels, eos)
    sg = score_batch(tables, greedy_seq, senti_labels, eos)
    return jnp.repeat(jnp.sign(sg - ss)[:, None], T, axis=1)
