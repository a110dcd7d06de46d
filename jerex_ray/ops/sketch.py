"""Streaming frequency sketches over document text.

``heavy_hitters`` finds every word whose corpus-wide count exceeds
``total/k`` EXACTLY, in two streaming passes and with no corpus-sized
shuffle — the classic "sketch candidates, then verify exactly" shape:

pass 1 (one ``map_batches``): each batch summarizes its words with a
    Misra–Gries sketch of capacity ``capacity`` (Misra & Gries '82,
    "Finding repeated elements"). The union of per-batch survivor sets
    is a guaranteed SUPERSET of the true heavy hitters: if a word w has
    global count C(w) > N/(capacity+1) = Σ_b n_b/(capacity+1), then by
    averaging there is a batch b with c_b(w) > n_b/(capacity+1), and a
    batch-local MG with that capacity always retains such a word.
    Batch totals ride along, so the pass also yields N exactly.
pass 2 (one ``map_batches`` + a vocabulary-sized combiner groupby):
    exact counts of the candidate words only (candidate set broadcast
    once via ``ray.put`` — bounded by capacity × batches, in practice
    ≪ vocabulary), then the integer threshold test ``count * k >
    total`` — no float arithmetic anywhere, so the result is
    bit-reproducible and SQL-oracled exactly.

At 100 TB the candidate set after the combiner is ≤ capacity ×
#batches rows (deduplicated to ≤ vocabulary), and nothing pair- or
corpus-sized ever reaches the driver: the only collected object is the
candidate-count table, which is candidate-bounded by construction.

The reference has no sketches anywhere (SURVEY.md §2.7); this is an
engine extension for the LLM-data-pipeline charter.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def misra_gries(words: np.ndarray, capacity: int) -> pd.DataFrame:
    """One Misra–Gries summary of ``words`` (any 1-d array of strings).

    Vectorized: exact per-batch counts first (cheap — a batch is
    bounded), then keep the ``capacity`` largest after subtracting the
    (capacity+1)-th largest count, which is exactly the MG decrement
    semantics applied in bulk (Agarwal et al. '12, "Mergeable summaries",
    §3 — count-based MG merge)."""
    if len(words) == 0:
        return pd.DataFrame({"term": pd.Series(dtype="object"),
                             "mg_count": pd.Series(dtype="int64")})
    uniq, counts = np.unique(words, return_counts=True)
    if len(uniq) > capacity:
        # subtract the (capacity+1)-th largest count from everything,
        # drop non-positive — the bulk form of MG's decrement loop
        kth = np.partition(counts, len(counts) - capacity - 1)[
            len(counts) - capacity - 1]
        keep = counts > kth
        uniq, counts = uniq[keep], counts[keep] - kth
    return pd.DataFrame({"term": uniq,
                         "mg_count": counts.astype("int64")})


def _batch_words(batch: pd.DataFrame, column: str) -> np.ndarray:
    words = batch[column].fillna("").str.lower().str.split()
    nonempty = [w for w in words.to_numpy() if w]
    if not nonempty:
        return np.asarray([], dtype=object)
    return np.concatenate(nonempty)


def heavy_hitters(docs_ds, *, column: str = "text", k: int = 40,
                  capacity: int = 256,
                  num_partitions: int | None = None) -> pd.DataFrame:
    """All words with corpus count strictly greater than ``total/k``
    (integer test ``count * k > total``), exactly.

    Requires ``capacity + 1 >= k`` so the MG superset guarantee covers
    the output threshold."""
    if capacity + 1 < k:
        raise ValueError(f"capacity+1={capacity + 1} must be >= k={k} "
                         "for the candidate superset guarantee")
    import ray

    from jerex_ray.functions.aggregate import grouped_aggregate

    def sketch(batch: pd.DataFrame) -> pd.DataFrame:
        flat = _batch_words(batch, column)
        out = misra_gries(flat, capacity)
        # ride the exact batch word total along (term="" never collides
        # with a real word: empty tokens are filtered out of the split)
        return pd.concat(
            [out, pd.DataFrame({"term": [""],
                                "mg_count": [np.int64(len(flat))]})],
            ignore_index=True)

    summaries = grouped_aggregate(
        docs_ds.map_batches(sketch, batch_format="pandas",
                            batch_size=8192),
        ["term"], {"c": ("mg_count", "sum")},
        num_partitions=num_partitions).to_pandas()
    empty = pd.DataFrame({"term": pd.Series(dtype="object"),
                          "n_occurrences": pd.Series(dtype="int64")})
    if summaries.empty or "c" not in summaries.columns:
        return empty
    total = int(summaries.loc[summaries["term"] == "", "c"].sum())
    candidates = summaries.loc[summaries["term"] != "", "term"]
    if total == 0 or candidates.empty:
        return empty
    cand_ref = ray.put(set(candidates))

    def exact_counts(batch: pd.DataFrame) -> pd.DataFrame:
        cand = ray.get(cand_ref)
        flat = _batch_words(batch, column)
        if len(flat) == 0:
            return pd.DataFrame({"term": pd.Series(dtype="object"),
                                 "c": pd.Series(dtype="int64")})
        s = pd.Series(flat)
        s = s[s.isin(cand)]
        out = s.value_counts()
        return pd.DataFrame({"term": out.index.to_numpy(),
                             "c": out.to_numpy(np.int64)})

    counts = grouped_aggregate(
        docs_ds.map_batches(exact_counts, batch_format="pandas",
                            batch_size=8192),
        ["term"], {"n_occurrences": ("c", "sum")},
        num_partitions=num_partitions).to_pandas()
    if counts.empty or "n_occurrences" not in counts.columns:
        return empty
    counts["n_occurrences"] = counts["n_occurrences"].astype("int64")
    hot = counts[counts["n_occurrences"] * k > total]
    return hot.sort_values(["n_occurrences", "term"],
                           ascending=[False, True]).reset_index(drop=True)
