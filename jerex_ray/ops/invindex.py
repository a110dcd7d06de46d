"""Inverted-index build + index-backed BM25.

``build_inverted_index`` materializes the corpus as term-bucketed
postings parquet — the classic search-engine artifact, built in ONE
streaming explode pass plus a bucket-keyed shuffle of the (term,
doc_id, tf, dl) rows (postings are a fraction of the raw text bytes;
the documents themselves never ride the shuffle). Document length is
denormalized onto each posting so scoring never needs a second join.

``bm25_from_index`` then answers queries by reading ONLY the buckets
containing query terms (hash-pruned file read + a term filter pushed
to the parquet scan) — at 100 TB the query touches kilobytes of
postings instead of the corpus. Scores are identical to the direct
``ops/bm25.bm25_scores`` pass (same idf/tf math; parity-tested and
served by the same SQL oracle).

Layout:
    out_dir/bucket=<k>/postings.parquet   (term, doc_id, tf, dl)
    out_dir/_stats.json                   {n_docs, total_len}
"""

from __future__ import annotations

import json
import math
import os

import numpy as np
import pandas as pd

from jerex_ray.util import stable_hash64


def _explode_postings(batch: pd.DataFrame, num_buckets: int) -> pd.DataFrame:
    words = batch["text"].fillna("").str.lower().str.split()
    lens = words.str.len().fillna(0).to_numpy(np.int64)
    stats = pd.DataFrame({
        "bucket": [-1], "term": [" stats"],
        "doc_id": [len(batch)], "tf": [int(lens.sum())], "dl": [0]})
    if lens.sum() == 0:
        return stats
    ids = batch["doc_id"].astype("int64").to_numpy()
    flat = pd.DataFrame({
        "doc": np.repeat(np.arange(len(batch)), lens),
        "term": np.concatenate([w for w in words.to_numpy() if w])})
    tf = flat.groupby(["doc", "term"], sort=False).size() \
        .reset_index(name="tf")
    d = tf["doc"].to_numpy()
    terms = tf["term"].to_numpy()
    uniq, inv = np.unique(terms, return_inverse=True)
    buckets = np.fromiter((stable_hash64(t) % num_buckets for t in uniq),
                          dtype=np.int64, count=len(uniq))[inv]
    out = pd.DataFrame({"bucket": buckets, "term": terms,
                        "doc_id": ids[d],
                        "tf": tf["tf"].to_numpy(np.int64),
                        "dl": lens[d]})
    return pd.concat([out, stats], ignore_index=True)


def build_inverted_index(docs_ds, out_dir: str, *,
                         num_buckets: int = 32) -> dict:
    """Materialize term-bucketed postings; returns the corpus stats."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.runtime import shuffle_partitions

    os.makedirs(out_dir, exist_ok=True)
    rows = docs_ds.map_batches(_explode_postings, batch_format="pandas",
                               batch_size=8192,
                               fn_kwargs={"num_buckets": num_buckets})

    def write_bucket(block: pd.DataFrame) -> pd.DataFrame:
        stats = block[block["bucket"] < 0]
        frames = []
        if len(stats):
            frames.append(pd.DataFrame(
                {"bucket": [-1], "n_rows": [int(stats["doc_id"].sum())],
                 "total_len": [int(stats["tf"].sum())]}))
        posts = block[block["bucket"] >= 0]
        for bk, sub in posts.groupby("bucket", sort=False):
            path = os.path.join(out_dir, f"bucket={int(bk)}")
            os.makedirs(path, exist_ok=True)
            sub = sub[["term", "doc_id", "tf", "dl"]] \
                .sort_values(["term", "doc_id"])
            sub.to_parquet(os.path.join(path, "postings.parquet"),
                           index=False)
            frames.append(pd.DataFrame({"bucket": [int(bk)],
                                        "n_rows": [len(sub)],
                                        "total_len": [0]}))
        if not frames:
            return pd.DataFrame({"bucket": pd.Series(dtype="int64"),
                                 "n_rows": pd.Series(dtype="int64"),
                                 "total_len": pd.Series(dtype="int64")})
        return pd.concat(frames, ignore_index=True)

    meta = grouped_apply(rows, ["bucket"], write_bucket,
                         num_partitions=shuffle_partitions(
                             min(num_buckets, 16))).to_pandas()
    n_docs = total_len = 0
    if "bucket" in meta.columns:
        s = meta[meta["bucket"] < 0]
        n_docs = int(s["n_rows"].sum())
        total_len = int(s["total_len"].sum())
    stats = {"n_docs": n_docs, "total_len": total_len,
             "num_buckets": num_buckets}
    with open(os.path.join(out_dir, "_stats.json"), "w") as f:
        json.dump(stats, f)
    return stats


def bm25_from_index(index_dir: str, queries: list[str], *,
                    k1: float = 1.2, b: float = 0.75) -> pd.DataFrame:
    """BM25 scores served from the materialized postings: reads ONLY
    the buckets of the query terms, filters to those terms at the
    parquet scan, computes df from the postings themselves."""
    with open(os.path.join(index_dir, "_stats.json")) as f:
        stats = json.load(f)
    n_docs, total_len = stats["n_docs"], stats["total_len"]
    nb = stats["num_buckets"]
    q_terms = [sorted(set(q.lower().split())) for q in queries]
    vocab = sorted({t for ts in q_terms for t in ts})
    empty = pd.DataFrame({"query_idx": pd.Series(dtype="int64"),
                          "doc_id": pd.Series(dtype="int64"),
                          "score": pd.Series(dtype="float64")})
    if n_docs == 0 or not vocab:
        return empty
    buckets = sorted({stable_hash64(t) % nb for t in vocab})
    paths = [os.path.join(index_dir, f"bucket={k}", "postings.parquet")
             for k in buckets]
    paths = [p for p in paths if os.path.exists(p)]
    if not paths:
        return empty
    import pyarrow.compute as pc

    from jerex_ray.runtime import read_parquet_sized
    posts = read_parquet_sized(
        paths, filter=pc.field("term").isin(vocab)).to_pandas()
    if posts.empty:
        return empty
    avgdl = total_len / n_docs
    df_t = posts.groupby("term")["doc_id"].nunique()
    idf = {t: math.log(1.0 + (n_docs - int(df_t.get(t, 0)) + 0.5)
                       / (int(df_t.get(t, 0)) + 0.5)) for t in vocab}
    rows = []
    for qi, terms in enumerate(q_terms):
        sub = posts[posts["term"].isin(terms)]
        if sub.empty:
            continue
        tf = sub["tf"].to_numpy(np.float64)
        dl = sub["dl"].to_numpy(np.int64)
        denom = k1 * (1.0 - b + b * (dl / avgdl))
        s = sub["term"].map(idf).to_numpy(np.float64) \
            * (tf * (k1 + 1.0)) / (tf + denom)
        agg = pd.DataFrame({"doc_id": sub["doc_id"].to_numpy(),
                            "score": s}).groupby("doc_id", sort=True) \
            .sum().reset_index()
        agg.insert(0, "query_idx", qi)
        rows.append(agg)
    if not rows:
        return empty
    return pd.concat(rows, ignore_index=True).astype(
        {"query_idx": "int64", "doc_id": "int64", "score": "float64"})


def phrase_search(docs_ds, phrase: str, *, col: str = "text",
                  num_partitions: int | None = None) -> pd.DataFrame:
    """Positional phrase query — the adjacency predicate over a
    positional postings list (Manning/Raghavan/Schütze IR ch.2): a
    document matches where the phrase's terms occur at consecutive
    word positions. One vectorized postings explode (within-doc
    positions from a cumsum-offset arange, no per-row loop), pruned to
    the phrase's terms BEFORE the shuffle (the broadcast term set is
    the pushdown), one doc co-location, then a per-block sorted-array
    adjacency intersection. Returns (doc_id, n_matches ≥ 1)."""
    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply

    terms = [t for t in phrase.lower().split() if t]
    if not terms:
        raise ValueError("empty phrase")
    L = len(terms)

    def postings(batch: pd.DataFrame) -> pd.DataFrame:
        words = batch[col].fillna("").str.lower().str.split()
        lens = words.str.len().fillna(0).to_numpy(np.int64)
        empty = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                              "term_idx": pd.Series(dtype="int64"),
                              "pos": pd.Series(dtype="int64")})
        if lens.sum() == 0:
            return empty
        flat = np.concatenate([w for w in words.to_numpy() if w])
        doc = np.repeat(batch["doc_id"].to_numpy(), lens)
        starts = np.repeat(np.cumsum(lens) - lens, lens)
        pos = np.arange(len(flat), dtype=np.int64) - starts
        # one vectorized select per phrase slot (L is tiny); repeated
        # terms get one posting per slot they can fill
        frames = []
        for i, t in enumerate(terms):
            m = flat == t
            if m.any():
                frames.append(pd.DataFrame({
                    "doc_id": doc[m],
                    "term_idx": np.int64(i),
                    "pos": pos[m]}))
        if not frames:
            return empty
        return pd.concat(frames, ignore_index=True)

    posts = docs_ds.map_batches(postings, batch_format="pandas",
                                batch_size=4096)

    def match_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "c": pd.Series(dtype="int64")})
        # a phrase start at (doc, p) needs term i at p+i for all i:
        # shift every posting back by its term index and count how
        # many DISTINCT terms land on each (doc, start) anchor
        anchor = df["pos"].to_numpy(np.int64) \
            - df["term_idx"].to_numpy(np.int64)
        keep = anchor >= 0
        g = pd.DataFrame({"doc_id": df["doc_id"].to_numpy()[keep],
                          "anchor": anchor[keep],
                          "term_idx": df["term_idx"].to_numpy()[keep]}) \
            .drop_duplicates()
        full = g.groupby(["doc_id", "anchor"], sort=False).size()
        hits = full[full == L].reset_index()
        if hits.empty:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "c": pd.Series(dtype="int64")})
        out = hits.groupby("doc_id", sort=False).size() \
            .reset_index(name="c")
        out["c"] = out["c"].astype("int64")
        return out

    matched = grouped_apply(posts, ["doc_id"], match_block,
                            num_partitions=num_partitions)
    out = grouped_aggregate(matched, ["doc_id"],
                            {"n_matches": ("c", "sum")},
                            num_partitions=num_partitions).to_pandas()
    if out.empty or "doc_id" not in out.columns:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "n_matches": pd.Series(dtype="int64")})
    out["doc_id"] = out["doc_id"].astype("int64")
    out["n_matches"] = out["n_matches"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)
