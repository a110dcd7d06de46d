"""Sparse all-pairs document similarity over TF-IDF vectors — the
inverted-index self-join (Elsayed, Lin & Oard, ACL '08 "Pairwise
Document Similarity in Large Collections with MapReduce"; Bayardo et
al. WWW '07 all-pairs).

cosine(a, b) = Σ_t ŵ_a(t)·ŵ_b(t) over the shared vocabulary, with
ŵ = w/‖w‖ and w(t) = tf(t)·idf(t) (sklearn-smoothed
idf = ln((1+N)/(1+df)) + 1, tf = count/len — the same weighting as
``ops/textstats.tfidf_top_terms``).

Dataflow, scale-shaped end to end:

* ONE document-frequency combiner pass (vocabulary-sized result, the
  corpus never moves) → the idf/df table broadcasts once via
  ``ray.put``.
* ONE streaming pass computes each document's weights and L2 norm
  doc-locally (norms never ride a shuffle) and emits normalized
  postings ``(term, doc_id, wn)`` — ONLY for terms that can actually
  produce a pair (2 ≤ df ≤ max_df).
* Terms co-locate via one hash shuffle; each block self-merges its
  postings (the wedge pattern of ``ops/graph.bipartite_jaccard``)
  into pair PARTIAL products, pre-reduced per block before the final
  (doc_a, doc_b) combiner sum.
* The classic all-pairs scale lever is explicit: terms with
  df > ``max_df`` are stop-words for similarity purposes — a df-d
  term emits O(d²) wedges, so hubs are pruned from the VECTOR SPACE
  (weights, norms, and postings all exclude them, keeping cosine a
  true cosine over the pruned vocabulary) and the drop is logged.

The reference has no similarity joins (SURVEY.md §2.7); engine
extension for the LLM-data charter. Oracled: the SQL twin recomputes
weights, norms and the self-join pair sum; both sides round to 6
decimals (pair-sum order differs in the last float bits) and filter
on the ROUNDED cosine so the threshold cannot flip an edge.
"""

from __future__ import annotations

import logging
import math

import numpy as np
import pandas as pd

logger = logging.getLogger(__name__)

_EMPTY_PAIRS = {
    "doc_a": pd.Series(dtype="int64"),
    "doc_b": pd.Series(dtype="int64"),
    "cosine": pd.Series(dtype="float64"),
}


def tfidf_cosine_pairs(docs_ds, *, threshold: float = 0.3,
                       max_df: int = 100,
                       num_partitions: int | None = None):
    """All document pairs with TF-IDF cosine ≥ ``threshold`` (after
    6-decimal rounding) over the df-pruned vocabulary; returns a
    Dataset of ``(doc_a, doc_b, cosine)``, doc_a < doc_b."""
    import ray

    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply

    def doc_term_df(batch: pd.DataFrame) -> pd.DataFrame:
        """Distinct-doc counts per term + a doc-count sentinel row."""
        words = batch["text"].fillna("").str.lower().str.split()
        lens = words.str.len().fillna(0).to_numpy(np.int64)
        sentinel = pd.DataFrame({"term": [""], "c": [len(batch)]})
        if lens.sum() == 0:
            return sentinel
        flat = pd.DataFrame({
            "doc": np.repeat(np.arange(len(batch)), lens),
            "term": np.concatenate([w for w in words.to_numpy() if w])})
        out = (flat.drop_duplicates()
               .groupby("term", sort=False).size().reset_index(name="c"))
        return pd.concat([out, sentinel], ignore_index=True)

    df_tbl = grouped_aggregate(
        docs_ds.map_batches(doc_term_df, batch_format="pandas",
                            batch_size=8192),
        ["term"], {"df": ("c", "sum")},
        num_partitions=num_partitions).to_pandas()
    if df_tbl.empty or "df" not in df_tbl.columns:
        return ray.data.from_pandas(pd.DataFrame(_EMPTY_PAIRS))
    n_docs = int(df_tbl.loc[df_tbl["term"] == "", "df"].sum())
    vocab = df_tbl[df_tbl["term"] != ""]
    kept = vocab[vocab["df"] <= max_df]
    n_pruned = len(vocab) - len(kept)
    if n_pruned:
        logger.warning(
            "tfidf_cosine_pairs: pruned %d/%d terms with df > %d from "
            "the vector space (all-pairs hub cap)",
            n_pruned, len(vocab), max_df)
    # math.log = glibc, the libm DuckDB's ln binds — idf matches the
    # oracle bit-for-bit
    idf = {t: math.log((1.0 + n_docs) / (1.0 + d)) + 1.0
           for t, d in zip(kept["term"], kept["df"].astype(int))}
    pairable = set(kept.loc[kept["df"].astype(int) >= 2, "term"])
    ref = ray.put((idf, pairable))

    empty_post = pd.DataFrame({"term": pd.Series(dtype="object"),
                               "doc_id": pd.Series(dtype="int64"),
                               "wn": pd.Series(dtype="float64")})

    def postings(batch: pd.DataFrame) -> pd.DataFrame:
        idf_t, pair_t = ray.get(ref)
        words = batch["text"].fillna("").str.lower().str.split()
        lens = words.str.len().fillna(0).to_numpy(np.int64)
        if lens.sum() == 0:
            return empty_post.copy()
        ids = batch["doc_id"].astype("int64").to_numpy()
        flat = pd.DataFrame({
            "doc": np.repeat(np.arange(len(batch)), lens),
            "term": np.concatenate([w for w in words.to_numpy() if w])})
        tf = (flat.groupby(["doc", "term"], sort=False)
              .size().reset_index(name="cnt"))
        iv = tf["term"].map(idf_t)
        tf = tf[iv.notna()]
        if tf.empty:
            return empty_post.copy()
        w = (tf["cnt"].to_numpy(np.float64)
             / lens[tf["doc"].to_numpy()]) \
            * iv.dropna().to_numpy(np.float64)
        tf = tf.assign(w=w)
        # doc-local L2 norm over the KEPT vocabulary
        norm = np.sqrt(tf.groupby("doc", sort=False)["w"]
                       .transform(lambda s: np.sum(s.to_numpy() ** 2))
                       .to_numpy(np.float64))
        tf = tf.assign(wn=tf["w"].to_numpy() / norm)
        tf = tf[tf["term"].isin(pair_t)]
        return pd.DataFrame({"term": tf["term"].to_numpy(),
                             "doc_id": ids[tf["doc"].to_numpy()],
                             "wn": tf["wn"].to_numpy(np.float64)})

    post = docs_ds.map_batches(postings, batch_format="pandas",
                               batch_size=8192)

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                                 "doc_b": pd.Series(dtype="int64"),
                                 "p": pd.Series(dtype="float64")})
        m = df.merge(df, on="term")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        m = m.assign(p=m["wn_x"].to_numpy() * m["wn_y"].to_numpy())
        g = (m.groupby(["doc_id_x", "doc_id_y"], sort=False)["p"]
             .sum().reset_index())
        return g.rename(columns={"doc_id_x": "doc_a",
                                 "doc_id_y": "doc_b"})

    sums = grouped_aggregate(
        grouped_apply(post, ["term"], wedges,
                      num_partitions=num_partitions),
        ["doc_a", "doc_b"], {"cosine": ("p", "sum")},
        num_partitions=num_partitions)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "cosine" not in df.columns:
            return pd.DataFrame(_EMPTY_PAIRS)
        df = df.assign(cosine=df["cosine"].round(6))
        df = df[df["cosine"] >= threshold]
        return df[["doc_a", "doc_b", "cosine"]].astype(
            {"doc_a": "int64", "doc_b": "int64"})

    return sums.map_batches(finish, batch_format="pandas")
