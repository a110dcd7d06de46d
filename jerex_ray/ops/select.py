"""Training-data subset selection operators.

Two published selection strategies over a document corpus, both
expressed Ray-Data-first and both deterministic enough to be replayed
bit-for-bit by a SQL oracle:

* ``coverage_select`` — greedy maximum-coverage selection (Nemhauser,
  Wolsey & Fisher '78: the greedy algorithm is a (1-1/e)-approximation
  for monotone submodular maximization; coverage of a hashed n-gram
  space is the classic instance). Used in data curation to pick a
  small, diverse "seed" subset that covers the corpus vocabulary.
* ``dsir_scores`` — Data Selection with Importance Resampling (Xie et
  al. '23, arXiv:2302.03169): score every raw-corpus document by the
  log importance weight of a hashed unigram bag-of-words model of a
  target corpus versus the raw corpus.  The log-probability ratios are
  quantized to integer micro-nats (``floor(x * 1e6)``) so per-document
  scores are INTEGER sums — order-independent, overflow-safe, and
  bit-identical in SQL.

Dataflow shape (designed for a corpus that does not fit anywhere):

* Per-document gram/bucket structure is complete inside one
  ``map_batches`` row (a doc's text is one row), so signature building
  needs NO shuffle.
* ``coverage_select`` materializes the per-doc bucket-set table once
  (rows are ``(doc_id, sorted unique bucket list)`` — bounded by the
  bucket-space size, NOT by document length) and then runs k cheap
  streaming passes: each round ships only the current covered bitmap
  (``buckets`` bits) out and one candidate row per block back.  The
  driver never sees anything corpus-sized.
* ``dsir_scores`` is two vocabulary-bounded combiner passes (bucket
  counts per side; at most ``buckets`` rows per batch reach the
  reduce), one broadcast of the integer ratio table, and one streaming
  scoring pass with per-block top-k — the merge sees ``k`` rows per
  block, nothing more.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from jerex_ray.util import md5_hash64_batch


def _doc_bucket_sets(batch: pd.DataFrame, *, n: int, buckets: int,
                     col: str = "text") -> pd.DataFrame:
    """One row per doc: sorted unique hashed word-n-gram buckets."""
    ids, sets_ = [], []
    for doc_id, text in zip(batch["doc_id"], batch[col].fillna("")):
        ws = text.lower().split()
        if len(ws) < n:
            continue
        grams = list({" ".join(ws[i:i + n])
                      for i in range(len(ws) - n + 1)})
        b = (md5_hash64_batch(
            np.array(["cov|" + g for g in grams], dtype=object))
            % np.uint64(buckets)).astype(np.int64)
        ids.append(doc_id)
        sets_.append(np.unique(b))
    return pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                         "bkts": pd.Series(sets_, dtype="object")})


def coverage_select(ds, *, k: int = 8, n: int = 3,
                    buckets: int = 4096, col: str = "text",
                    batch_size: int = 4096) -> pd.DataFrame:
    """Greedy max-coverage over the hashed word-n-gram space.

    Each round picks the document with the most not-yet-covered
    buckets (ties: smallest doc_id) and adds its buckets to the
    covered set; stops early when the best marginal gain is 0.
    Returns ``(sel_rank, doc_id, gain, covered_total)`` — gains are
    non-increasing (submodularity), which the tests assert.
    """
    sig = ds.map_batches(_doc_bucket_sets, batch_format="pandas",
                         batch_size=batch_size,
                         fn_kwargs={"n": n, "buckets": buckets,
                                    "col": col}).materialize()
    covered = np.zeros(buckets, dtype=bool)
    rows = []
    for r in range(k):
        ref = ray.put(covered.copy())

        def block_best(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty:
                return pd.DataFrame({
                    "doc_id": pd.Series(dtype="int64"),
                    "gain": pd.Series(dtype="int64"),
                    "new": pd.Series(dtype="object")})
            cov = ray.get(ref)
            lens = df["bkts"].map(len).to_numpy(np.int64)
            flat = np.concatenate(list(df["bkts"])) if lens.sum() \
                else np.empty(0, dtype=np.int64)
            fresh = ~cov[flat]
            offs = np.zeros(len(df), dtype=np.int64)
            np.cumsum(lens[:-1], out=offs[1:])
            gains = np.add.reduceat(fresh.astype(np.int64), offs) \
                if len(flat) else np.zeros(len(df), dtype=np.int64)
            gains[lens == 0] = 0
            ids = df["doc_id"].to_numpy(np.int64)
            best = np.lexsort((ids, -gains))[0]
            new = df["bkts"].iloc[best]
            return pd.DataFrame({
                "doc_id": [np.int64(ids[best])],
                "gain": [np.int64(gains[best])],
                "new": [np.asarray(new)[~cov[np.asarray(new)]]]})

        cand = sig.map_batches(block_best, batch_format="pandas",
                               batch_size=batch_size).to_pandas()
        if cand.empty:
            break
        cand = cand.sort_values(["gain", "doc_id"],
                                ascending=[False, True])
        top = cand.iloc[0]
        if int(top["gain"]) <= 0:
            break
        covered[np.asarray(top["new"], dtype=np.int64)] = True
        rows.append((np.int64(r + 1), np.int64(top["doc_id"]),
                     np.int64(top["gain"]),
                     np.int64(int(covered.sum()))))
    return pd.DataFrame(rows, columns=["sel_rank", "doc_id", "gain",
                                       "covered_total"]) \
        .astype({"sel_rank": "int64", "doc_id": "int64",
                 "gain": "int64", "covered_total": "int64"})


def dsir_scores(ds, *, target_col: str = "lang",
                target_value: str = "en", buckets: int = 1024,
                top_k: int = 50, col: str = "text",
                batch_size: int = 4096) -> pd.DataFrame:
    """DSIR importance scores: rank raw-corpus docs by how much more
    likely their hashed unigram bag is under the target corpus's
    add-one-smoothed bucket distribution than under the raw corpus's.

    ``score_micro = Σ_tokens floor(1e6 * (ln p_t(b) - ln p_r(b)))`` —
    an integer per token, so the per-doc sum is exact in any
    accumulation order and the SQL oracle reproduces it bit-for-bit
    (both engines use the platform ``ln`` on identical doubles).
    Returns the global top-k raw docs as ``(sel_rank, doc_id,
    score_micro)`` with ties broken by smallest doc_id.
    """

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        tgt = np.zeros(buckets, dtype=np.int64)
        raw = np.zeros(buckets, dtype=np.int64)
        for is_t, text in zip(df[target_col] == target_value,
                              df[col].fillna("")):
            ws = text.lower().split()
            if not ws:
                continue
            b = (md5_hash64_batch(
                np.array(["dsir|" + w for w in ws], dtype=object))
                % np.uint64(buckets)).astype(np.int64)
            np.add.at(tgt if is_t else raw, b, 1)
        nz = np.flatnonzero(tgt | raw)
        return pd.DataFrame({"b": nz, "ct": tgt[nz], "cr": raw[nz]})

    from jerex_ray.functions.aggregate import grouped_aggregate
    counts = grouped_aggregate(
        ds.map_batches(count_partial, batch_format="pandas",
                       batch_size=batch_size),
        ["b"], {"ct": ("ct", "sum"), "cr": ("cr", "sum")},
        result_hint="small").to_pandas()
    ct = np.zeros(buckets, dtype=np.int64)
    cr = np.zeros(buckets, dtype=np.int64)
    if len(counts):
        ct[counts["b"].to_numpy(np.int64)] = counts["ct"]
        cr[counts["b"].to_numpy(np.int64)] = counts["cr"]
    t_tot, r_tot = int(ct.sum()), int(cr.sum())
    m = np.floor(1e6 * (np.log((ct + 1.0) / (t_tot + buckets))
                        - np.log((cr + 1.0) / (r_tot + buckets)))) \
        .astype(np.int64)
    ref = ray.put(m)

    def score_block(df: pd.DataFrame) -> pd.DataFrame:
        mm = ray.get(ref)
        d = df[df[target_col] != target_value]
        ids, scores = [], []
        for doc_id, text in zip(d["doc_id"], d[col].fillna("")):
            ws = text.lower().split()
            if not ws:
                continue
            b = (md5_hash64_batch(
                np.array(["dsir|" + w for w in ws], dtype=object))
                % np.uint64(buckets)).astype(np.int64)
            ids.append(doc_id)
            scores.append(int(mm[b].sum()))
        out = pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                            "score_micro": pd.Series(scores,
                                                     dtype="int64")})
        return out.sort_values(["score_micro", "doc_id"],
                               ascending=[False, True]).head(top_k)

    cand = ds.map_batches(score_block, batch_format="pandas",
                          batch_size=batch_size).to_pandas()
    if cand.empty:
        return pd.DataFrame({"sel_rank": pd.Series(dtype="int64"),
                             "doc_id": pd.Series(dtype="int64"),
                             "score_micro": pd.Series(dtype="int64")})
    cand = cand.sort_values(["score_micro", "doc_id"],
                            ascending=[False, True]).head(top_k) \
        .reset_index(drop=True)
    cand.insert(0, "sel_rank",
                np.arange(1, len(cand) + 1, dtype=np.int64))
    return cand
