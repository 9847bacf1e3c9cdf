"""On-device CIDEr-D (SURVEY.md §7 hard part 1).

The reference computes SCST rewards by copying both rollouts to the host,
converting ids to strings, and running pure-Python CIDEr-D per batch
(self_critical/utils.py:56-83 + ciderD_scorer.py:120-197) — the main
throughput sink of the RL stage. Here the scorer runs inside the jit region:

  * n-grams (n=1..4) become dual 32-bit rolling hashes computed by a scan
    over shifted id arrays — no strings, no dicts;
  * corpus document frequencies live in HBM as a sorted hash table
    (built once from rewards/ciderd.py's scorer); lookups are vectorized
    binary searches (jnp.searchsorted) + a tiny linear probe window to
    resolve first-key duplicates;
  * term frequencies within a caption come from all-pairs hash equality
    (T<=17, so [T, T] comparisons are trivial VPU work);
  * per-image reference captions sit in a device-resident id table
    [num_images, R, T] gathered by image index, so the whole SCST reward
    needs zero host round-trips.

Numerics match the host scorer exactly (same tf-idf, clipped cosine, the
reference's bigram-count length quirk, Gaussian penalty sigma=6); verified in
tests/test_ciderd_device.py against rewards/ciderd.py which is itself
parity-tested against the reference.
"""
from __future__ import annotations

import os
from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..rewards.ciderd import CiderD

NGRAM_N = 4
SIGMA = 6.0

# dual 32-bit multiplicative hashing (odd constants)
M1 = np.uint32(0x9E3779B1)
M2 = np.uint32(0x85EBCA77)
S1 = np.uint32(0x165667B1)
S2 = np.uint32(0x27D4EB2F)
PROBE = 8  # linear-probe window for duplicate first keys


class CiderTables(NamedTuple):
    """Device-resident scorer state. The per-reference n-gram statistics
    (hashes, validity, vector norms, bigram counts) are PRECOMPUTED at
    build time — references never change, and recomputing their stats
    (incl. the df-table binary searches) inside every RL step was the
    single largest stage of the train-step profile (5.1 ms standalone at
    bs=40, more than either rollout — tools/profile_train.py, DESIGN.md
    r3)."""
    df_h1: jnp.ndarray      # [D] uint32, sorted (primary key)
    df_h2: jnp.ndarray      # [D] uint32 (secondary key)
    df_val: jnp.ndarray     # [D] float32 document frequencies
    ref_len: jnp.ndarray    # scalar float32: log(#corpus images)
    gts_len: jnp.ndarray    # [num_images, R] int32 (0 = absent ref)
    gts_count: jnp.ndarray  # [num_images] int32 actual ref counts
    ref_h1: jnp.ndarray     # [num_images, R, N, T] uint32 ngram hashes
    ref_h2: jnp.ndarray     # [num_images, R, N, T] uint32
    ref_valid: jnp.ndarray  # [num_images, R, N, T] bool
    ref_norm: jnp.ndarray   # [num_images, R, N] float32 tf-idf norms
    ref_blen: jnp.ndarray   # [num_images, R] float32 bigram counts


def _host_hash_pair(ngram) -> tuple:
    h1 = np.uint32(S1)
    h2 = np.uint32(S2)
    with np.errstate(over="ignore"):
        for tok in ngram:
            t = np.uint32(tok + 1)
            h1 = (h1 ^ t) * M1
            h2 = (h2 ^ t) * M2
    return int(h1), int(h2)


def build_tables(scorer: CiderD, gts: Dict[str, list], image_order: list,
                 max_seq_len: int, sos: int, eos: int) -> tuple:
    """Build device tables from the host scorer + tokenized ground truth.

    gts: {fn: [caption ids (with sos/eos), ...]} — captions are truncated to
    max_seq_len + 1 ids as the reference's rl_fact collate does
    (dataloader.py:64) before canonicalization.
    image_order: fn list defining row indices; returns (tables, fn2row).
    """
    from ..rewards.ciderd import seq_from_ids

    items = []
    for ngram, df in scorer.document_frequency.items():
        h1, h2 = _host_hash_pair(ngram)
        items.append((h1, h2, df))
    items.sort()
    h1s = np.array([a for a, _, _ in items], np.uint32)
    h2s = np.array([b for _, b, _ in items], np.uint32)
    dfs = np.array([c for _, _, c in items], np.float32)
    # duplicate-primary-key runs must fit the probe window (vectorized:
    # max run of equal consecutive h1 = max gap between change points)
    if len(h1s) > 1:
        change = np.flatnonzero(np.diff(h1s) != 0)
        bounds = np.concatenate([[-1], change, [len(h1s) - 1]])
        max_run = int(np.diff(bounds).max())
        if max_run > PROBE:
            raise RuntimeError(
                f"df table duplicate-key run {max_run} exceeds probe window")
    # exact duplicate (h1,h2) pairs would silently merge dfs
    pair = h1s.astype(np.uint64) << np.uint64(32) | h2s.astype(np.uint64)
    if len(pair) != len(np.unique(pair)):
        raise RuntimeError("dual-hash collision in corpus df table")

    T = max_seq_len + 1
    R = max(len(caps) for caps in gts.values())
    n = len(image_order)
    gts_len = np.zeros((n, R), np.int32)
    gts_count = np.zeros((n,), np.int32)
    ref_h1 = np.zeros((n, R, NGRAM_N, T), np.uint32)
    ref_h2 = np.zeros((n, R, NGRAM_N, T), np.uint32)
    ref_valid = np.zeros((n, R, NGRAM_N, T), np.bool_)
    ref_norm = np.zeros((n, R, NGRAM_N), np.float32)
    ref_blen = np.zeros((n, R), np.float32)
    log_ref_len = float(scorer.ref_len)
    df_dict = scorer.document_frequency
    for row, fn in enumerate(image_order):
        caps = gts[fn]
        gts_count[row] = len(caps)
        for r, cap in enumerate(caps[:R]):
            seq = seq_from_ids(list(cap)[:max_seq_len + 1], sos, eos)
            L = min(len(seq), T)
            gts_len[row, r] = L
            h1, h2, valid, norm, blen = _host_ref_stats(
                seq[:L], L, T, df_dict, log_ref_len)
            ref_h1[row, r] = h1
            ref_h2[row, r] = h2
            ref_valid[row, r] = valid
            ref_norm[row, r] = norm
            ref_blen[row, r] = blen

    tables = CiderTables(
        df_h1=jnp.asarray(h1s), df_h2=jnp.asarray(h2s),
        df_val=jnp.asarray(dfs),
        ref_len=jnp.asarray(scorer.ref_len, jnp.float32),
        gts_len=jnp.asarray(gts_len),
        gts_count=jnp.asarray(gts_count),
        ref_h1=jnp.asarray(ref_h1), ref_h2=jnp.asarray(ref_h2),
        ref_valid=jnp.asarray(ref_valid),
        ref_norm=jnp.asarray(ref_norm),
        ref_blen=jnp.asarray(ref_blen))
    fn2row = {fn: i for i, fn in enumerate(image_order)}
    return tables, fn2row


def _host_ref_stats(seq, L: int, T: int, df_dict, log_ref_len: float):
    """Reference-side n-gram statistics, computed once on the host with
    the SAME uint32 hash arithmetic and f32 norm accumulation order as
    the device `_vec_stats` (position-major sum of squares per order) so
    precomputed values match what the device used to compute."""
    ids = np.full((T,), -1, np.int64)
    ids[:L] = seq
    tok = (ids + 1).astype(np.uint32)
    pos = np.arange(T)
    h1 = np.full((T,), S1, np.uint32)
    h2 = np.full((T,), S2, np.uint32)
    h1s, h2s, valids, norms = [], [], [], []
    with np.errstate(over="ignore"):
        for k in range(NGRAM_N):
            shifted = np.roll(tok, -k)
            h1 = (h1 ^ shifted) * M1
            h2 = (h2 ^ shifted) * M2
            h1s.append(h1.copy())
            h2s.append(h2.copy())
            valids.append(pos + k < L)
    h1a, h2a = np.stack(h1s), np.stack(h2s)
    valid = np.stack(valids)
    # vectorized same-ngram matrix (the device _vec_stats math in numpy —
    # per-ref Python loops would take hours over a real COCO corpus)
    same = ((h1a[:, :, None] == h1a[:, None, :])
            & (h2a[:, :, None] == h2a[:, None, :])
            & valid[:, None, :] & valid[:, :, None])
    tf = same.sum(-1).astype(np.float32)                # [N, T]
    tri = np.tril(np.ones((T, T), np.bool_), -1)
    first = valid & ~(same & tri[None]).any(-1)
    for k in range(NGRAM_N):
        w2_sum = np.float32(0.0)
        for i in np.flatnonzero(first[k]):
            gram = tuple(int(x) for x in ids[i:i + k + 1])
            df = np.float32(df_dict.get(gram, 0.0))
            idf = np.float32(log_ref_len) - np.float32(
                np.log(max(np.float32(1.0), df)))
            w = tf[k, i] * idf
            w2_sum = np.float32(w2_sum + np.float32(w * w))
        norms.append(np.sqrt(w2_sum))
    blen = np.float32(valid[1].sum())
    return h1a, h2a, valid, np.array(norms, np.float32), blen


# ---------------------------------------------------------------------------
# Device-side scoring
# ---------------------------------------------------------------------------

def canonicalize(seq, eos: int, T_out: int):
    """[T] sampled ids (0-padded after EOS, EOS may be absent) ->
    ([T_out] ids with guaranteed trailing EOS, length). Mirrors
    rewards.ciderd.seq_from_ids for rollout outputs (no leading SOS)."""
    T = seq.shape[0]
    is_eos = seq == eos
    has_eos = jnp.any(is_eos)
    first_eos = jnp.argmax(is_eos)                # valid only if has_eos
    L_body = jnp.where(has_eos, first_eos, T)     # tokens before EOS
    L = L_body + 1
    t = jnp.arange(T_out)
    out = jnp.where(t < L_body, jnp.pad(seq, (0, T_out - T))[:T_out], -1)
    out = jnp.where(t == L_body, eos, out)
    return out.astype(jnp.int32), L.astype(jnp.int32)


def _ngram_hashes(ids, L):
    """ids [T] int32 (−1 sentinel past L). Returns h1, h2 [N, T] uint32 and
    valid [N, T] bool (position i holds the hash of ids[i:i+k+1])."""
    T = ids.shape[0]
    tok = (ids + 1).astype(jnp.uint32)
    pos = jnp.arange(T)

    h1s, h2s, valids = [], [], []
    h1 = jnp.full((T,), S1, jnp.uint32)
    h2 = jnp.full((T,), S2, jnp.uint32)
    for k in range(NGRAM_N):
        shifted = jnp.roll(tok, -k)
        h1 = (h1 ^ shifted) * M1
        h2 = (h2 ^ shifted) * M2
        h1s.append(h1)
        h2s.append(h2)
        valids.append(pos + k < L)
    return jnp.stack(h1s), jnp.stack(h2s), jnp.stack(valids)


def _df_lookup(tables: CiderTables, h1, h2):
    """Vectorized df lookup with linear probe over duplicate primary keys."""
    pos = jnp.searchsorted(tables.df_h1, h1)
    df = jnp.zeros(h1.shape, jnp.float32)
    D = tables.df_h1.shape[0]
    for d in range(PROBE):
        p = jnp.minimum(pos + d, D - 1)
        hit = (tables.df_h1[p] == h1) & (tables.df_h2[p] == h2)
        df = jnp.where(hit, tables.df_val[p], df)
    return df


def _vec_stats(tables: CiderTables, ids, L):
    """tf-idf statistics for one canonical sequence.

    Returns per-order dicts of arrays over positions [N, T]:
      w      — tf*idf at first-occurrence positions (0 elsewhere/invalid)
      tf     — ngram count within the sequence (at every valid position)
      h1, h2 — hashes
      first  — first-occurrence mask
      norm   — [N] vector norms
      blen   — scalar bigram count (the reference's length quirk)
    """
    h1, h2, valid = _ngram_hashes(ids, L)
    same = (h1[:, :, None] == h1[:, None, :]) & \
           (h2[:, :, None] == h2[:, None, :]) & \
           valid[:, None, :] & valid[:, :, None]
    tf = same.sum(-1).astype(jnp.float32)               # [N, T]
    T = ids.shape[0]
    tri = jnp.tril(jnp.ones((T, T), jnp.bool_), -1)     # j < i
    earlier = (same & tri[None]).any(-1)
    first = valid & ~earlier

    df = _df_lookup(tables, h1, h2)
    idf = tables.ref_len - jnp.log(jnp.maximum(1.0, df))
    w = jnp.where(first, tf * idf, 0.0)                 # [N, T]
    norm = jnp.sqrt((w * w).sum(-1))                    # [N]
    blen = valid[1].sum().astype(jnp.float32)
    return {"h1": h1, "h2": h2, "valid": valid, "first": first,
            "tf": tf, "idf": idf, "w": w, "norm": norm, "blen": blen}


def _sim(hyp, ref):
    """Clipped cosine per order + Gaussian length penalty
    (ciderD_scorer.py:147-173)."""
    # count of each hyp ngram in the ref: match hyp positions against ref
    match = (hyp["h1"][:, :, None] == ref["h1"][:, None, :]) & \
            (hyp["h2"][:, :, None] == ref["h2"][:, None, :]) & \
            hyp["valid"][:, :, None] & ref["valid"][:, None, :]
    ref_tf = match.sum(-1).astype(jnp.float32)          # [N, T]
    ref_w = ref_tf * hyp["idf"]                         # same global idf
    hyp_w = hyp["tf"] * hyp["idf"]
    prod = jnp.minimum(hyp_w, ref_w) * ref_w
    val = jnp.where(hyp["first"], prod, 0.0).sum(-1)    # [N]
    denom = hyp["norm"] * ref["norm"]
    val = jnp.where(denom != 0, val / jnp.where(denom != 0, denom, 1.0), val)
    delta = hyp["blen"] - ref["blen"]
    return val * jnp.exp(-(delta ** 2) / (2 * SIGMA ** 2))


def cider_d(tables: CiderTables, hyp_ids, hyp_len, img_rows):
    """Score a batch of canonical hypothesis sequences against their images'
    references. hyp_ids [bs, T], hyp_len [bs], img_rows [bs] int32 indices
    into the gts tables. Returns scores [bs] (x10, mean over orders,
    averaged over actual refs).

    Only the HYPOTHESIS side computes statistics (df-table binary
    searches included) — the reference side reads the precomputed
    per-ref hashes/norms/blen from the tables (build_tables), which cut
    the per-step cost ~2x at rl_bs=40 (DESIGN.md r3)."""
    def one(ids, L, row):
        hyp = _vec_stats(tables, ids, L)

        def ref_score(rh1, rh2, rvalid, rnorm, rblen, rl):
            ref = {"h1": rh1, "h2": rh2, "valid": rvalid,
                   "norm": rnorm, "blen": rblen}
            s = _sim(hyp, ref)                          # [N]
            return jnp.where(rl > 0, s.mean(), 0.0)

        total = jax.vmap(ref_score)(
            tables.ref_h1[row], tables.ref_h2[row], tables.ref_valid[row],
            tables.ref_norm[row], tables.ref_blen[row],
            tables.gts_len[row]).sum()
        return total / tables.gts_count[row].astype(jnp.float32) * 10.0

    return jax.vmap(one)(hyp_ids, hyp_len, img_rows)


def self_critical_reward(tables: CiderTables, sample_seq, greedy_seq,
                         img_rows, eos: int):
    """Full SCST advantage on device: score(sample) - score(greedy),
    broadcast over timesteps (reference self_critical/utils.py:56-83).

    Both rollouts score in ONE cider_d call over [2bs] rows (the
    reference scores them in one compute_score call too,
    utils.py:68-74): the scorer is a composition of many tiny [N,T,T]
    VPU ops, so one [2bs] program halves the op count vs two [bs]
    programs. Row-wise numerics are identical either way (vmap);
    ISC_CIDERD_MERGED=0 restores the two-call form for A/B
    (tools/ab_ciderd_merge.py; trace-time knob like ISC_SCAN_UNROLL)."""
    T = sample_seq.shape[1]
    bs = sample_seq.shape[0]
    if os.environ.get("ISC_CIDERD_MERGED", "1") != "0":
        both = jnp.concatenate([sample_seq, greedy_seq], axis=0)
        cb, lb = jax.vmap(lambda s: canonicalize(s, eos, T + 1))(both)
        scores = cider_d(tables, cb, lb,
                         jnp.concatenate([img_rows, img_rows], axis=0))
        adv = scores[:bs] - scores[bs:]
    else:
        cs, ls = jax.vmap(lambda s: canonicalize(s, eos, T + 1))(sample_seq)
        cg, lg = jax.vmap(lambda s: canonicalize(s, eos, T + 1))(greedy_seq)
        adv = (cider_d(tables, cs, ls, img_rows)
               - cider_d(tables, cg, lg, img_rows))
    return jnp.repeat(adv[:, None], T, axis=1)
