"""BM25 relevance scoring of a document corpus against a small query
set (Robertson & Walker '94; the Okapi BM25 formulation with the
ln(1 + (N-df+0.5)/(df+0.5)) idf).

Scale shape: one combiner stats pass (per-term document frequencies +
corpus length totals — vocabulary-sized result), the per-query-term
idf table broadcasts once via ``ray.put`` (queries are few and short;
only THEIR terms ship), then ONE streaming ``map_batches`` scores
every document against every query — a flat word explode, an isin
against the query vocabulary, and one bincount per query. Documents
never ride a shuffle; global top-k (if wanted) is a driver-side sort
of per-batch candidates.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def _tokenize(text_col: pd.Series):
    words = text_col.fillna("").str.lower().str.split()
    lens = words.str.len().fillna(0).to_numpy(np.int64)
    flat = (np.concatenate([w for w in words.to_numpy() if w])
            if lens.sum() else np.asarray([], dtype=object))
    return flat, lens


def corpus_stats(docs_ds, terms: set[str], *,
                 num_partitions: int | None = None):
    """(N_docs, total_len, df-per-term-of-interest) in one combiner
    pass. Only ``terms`` document frequencies are kept (query
    vocabulary — broadcast-sized by construction)."""
    from jerex_ray.functions.aggregate import grouped_aggregate

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        flat, lens = _tokenize(batch["text"])
        # sentinel keys contain a space — str.split() can never emit one
        rows = {"term": [" docs", " len"],
                "c": [len(batch), int(lens.sum())]}
        if len(flat):
            doc_idx = np.repeat(np.arange(len(batch)), lens)
            keep = np.isin(flat, list(terms))
            if keep.any():
                sub = pd.DataFrame({"d": doc_idx[keep],
                                    "t": flat[keep]}).drop_duplicates()
                vc = sub.groupby("t", sort=False).size()
                rows["term"] = rows["term"] + list(vc.index)
                rows["c"] = rows["c"] + [int(v) for v in vc.to_numpy()]
        return pd.DataFrame(rows)

    agg = grouped_aggregate(
        docs_ds.map_batches(partial, batch_format="pandas",
                            batch_size=8192),
        ["term"], {"n": ("c", "sum")},
        num_partitions=num_partitions).to_pandas()
    if agg.empty or "n" not in agg.columns:
        return 0, 0, {}
    by = dict(zip(agg["term"], agg["n"].astype(int)))
    n_docs = by.pop(" docs", 0)
    total_len = by.pop(" len", 0)
    return n_docs, total_len, by


def bm25_scores(docs_ds, queries: list[str], *, k1: float = 1.2,
                b: float = 0.75, num_partitions: int | None = None):
    """Dataset of (query_idx, doc_id, score) for every document with a
    positive BM25 score against each query."""
    import ray

    # distinct terms per query (classic BM25 without the query-tf
    # component), sorted so the per-doc sum order is deterministic
    q_terms = [sorted(set(q.lower().split())) for q in queries]
    vocab = {t for ts in q_terms for t in ts}
    n_docs, total_len, df = corpus_stats(docs_ds, vocab,
                                         num_partitions=num_partitions)
    if n_docs == 0:
        import ray.data as rd
        return rd.from_pandas(pd.DataFrame({
            "query_idx": pd.Series(dtype="int64"),
            "doc_id": pd.Series(dtype="int64"),
            "score": pd.Series(dtype="float64")}))
    avgdl = total_len / n_docs
    idf = {t: math.log(1.0 + (n_docs - df.get(t, 0) + 0.5)
                       / (df.get(t, 0) + 0.5)) for t in vocab}
    ref = ray.put((q_terms, idf, avgdl))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        qt, idf_t, ad = ray.get(ref)
        flat, lens = _tokenize(batch["text"])
        ids = batch["doc_id"].astype("int64").to_numpy()
        n = len(batch)
        out = {"query_idx": [], "doc_id": [], "score": []}
        if len(flat):
            doc_idx = np.repeat(np.arange(n), lens)
            denom_norm = k1 * (1.0 - b + b * (lens / ad))
            for qi, terms in enumerate(qt):
                s = np.zeros(n, np.float64)
                for t in terms:
                    tf = np.bincount(doc_idx[flat == t], minlength=n) \
                        .astype(np.float64)
                    s += idf_t[t] * (tf * (k1 + 1.0)) / (tf + denom_norm)
                nz = s > 0
                out["query_idx"].extend([qi] * int(nz.sum()))
                out["doc_id"].extend(ids[nz])
                out["score"].extend(s[nz])
        return pd.DataFrame(out).astype({"query_idx": "int64",
                                         "doc_id": "int64",
                                         "score": "float64"})

    return docs_ds.map_batches(score, batch_format="pandas",
                               batch_size=8192)


def bm25_topk(docs_ds, queries: list[str], *, k: int = 10,
              k1: float = 1.2, b: float = 0.75) -> pd.DataFrame:
    """Global top-k docs per query (score desc, doc_id asc ties)."""
    scores = bm25_scores(docs_ds, queries, k1=k1, b=b)

    def local_topk(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(["query_idx", "score", "doc_id"],
                                 ascending=[True, False, True]) \
            .groupby("query_idx", sort=False).head(k)

    cand = scores.map_batches(local_topk,
                              batch_format="pandas").to_pandas()
    if cand.empty:
        return cand
    return (cand.sort_values(["query_idx", "score", "doc_id"],
                             ascending=[True, False, True])
            .groupby("query_idx", sort=False).head(k)
            .reset_index(drop=True))


def dirichlet_ql_scores(docs_ds, queries: list[str], *, mu: float = 100.0,
                        num_partitions: int | None = None):
    """Dirichlet-smoothed query-likelihood retrieval scores (Zhai &
    Lafferty '01 — the language-modeling alternative to BM25):

        score(q, d) = Σ_t ln( (c(t,d) + μ·(ctf(t)/|C|)) / (|d| + μ) )

    over each query's sorted distinct terms; ctf is the CORPUS term
    frequency (collection model), so every document scores against
    every query — the smoothing never zeroes. Query terms absent from
    the corpus are dropped (their collection probability is 0; the
    BM25 sibling handles them with a 0 idf term instead).

    Same scale shape as ``bm25_scores``: one combiner stats pass
    (query-vocabulary ctf + corpus length), one ``ray.put``
    broadcast, one streaming scoring pass; documents never ride a
    shuffle."""
    import ray

    from jerex_ray.functions.aggregate import grouped_aggregate

    q_terms = [sorted(set(q.lower().split())) for q in queries]
    vocab = {t for ts in q_terms for t in ts}

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        flat, lens = _tokenize(batch["text"])
        rows = {"term": [" len"], "c": [int(lens.sum())]}
        if len(flat):
            keep = np.isin(flat, list(vocab))
            if keep.any():
                vc = pd.Series(flat[keep]).value_counts()
                rows["term"] = rows["term"] + list(vc.index)
                rows["c"] = rows["c"] + [int(v) for v in vc.to_numpy()]
        return pd.DataFrame(rows)

    agg = grouped_aggregate(
        docs_ds.map_batches(partial, batch_format="pandas",
                            batch_size=8192),
        ["term"], {"n": ("c", "sum")},
        num_partitions=num_partitions).to_pandas()
    EMPTY = pd.DataFrame({"query_idx": pd.Series(dtype="int64"),
                          "doc_id": pd.Series(dtype="int64"),
                          "score": pd.Series(dtype="float64")})
    if agg.empty or "n" not in agg.columns:
        import ray.data as rd
        return rd.from_pandas(EMPTY)
    by = dict(zip(agg["term"], agg["n"].astype(int)))
    total_len = by.pop(" len", 0)
    # drop OOV terms; keep each query's sorted in-corpus term list
    q_eff = [[t for t in ts if by.get(t, 0) > 0] for ts in q_terms]
    ref = ray.put((q_eff, by, float(total_len)))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        qt, ctf, L = ray.get(ref)
        flat, lens = _tokenize(batch["text"])
        ids = batch["doc_id"].astype("int64").to_numpy()
        n = len(batch)
        dl = lens.astype(np.float64)
        frames = []
        doc_idx = np.repeat(np.arange(n), lens) if len(flat) else None
        for qi, terms in enumerate(qt):
            if not terms:
                continue
            s = np.zeros(n, dtype=np.float64)
            for t in terms:
                cd = np.zeros(n, dtype=np.float64)
                if doc_idx is not None:
                    hit = flat == t
                    if hit.any():
                        cd = np.bincount(doc_idx[hit],
                                         minlength=n).astype(np.float64)
                s = s + np.log((cd + mu * (ctf[t] / L)) / (dl + mu))
            frames.append(pd.DataFrame({"query_idx": np.int64(qi),
                                        "doc_id": ids, "score": s}))
        if not frames:
            return EMPTY
        return pd.concat(frames, ignore_index=True)

    return docs_ds.map_batches(score, batch_format="pandas",
                               batch_size=8192)
