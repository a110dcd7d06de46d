"""Benchmark decontamination: flag (and drop) training documents that
share a word n-gram with an evaluation/benchmark set — the standard
n-gram-overlap rule of large-LM data pipelines (GPT-3 appendix C uses
13-grams; the n is a parameter here).

Dataflow, designed for the real-world shape (train corpus = huge,
eval set = small by construction):

* the eval side's DISTINCT n-grams are computed distributedly
  (per-doc dedup inside ``map_batches``, global dedup via the hash
  shuffle) and then — being eval-set-sized, not corpus-sized —
  broadcast once with ``ray.put``;
* the train side is ONE streaming ``map_batches`` pass: per-doc
  distinct grams (a doc's text lives in one row, so its distinct-gram
  set is complete within its batch — no shuffle), a vectorized
  ``isin`` against the broadcast set, and a per-batch groupby that is
  already final per doc. Nothing pair-sized or corpus-sized ever
  aggregates.

For an eval set too large to broadcast, ``broadcast=False`` switches
the membership test to a distributed semi-join: train grams hash-join
eval grams on the gram key, then re-aggregate per doc — two shuffles
of (doc_id, gram) rows, no driver-side set (mirrors the minhash
verifier's scale path, ``ops/dedup.py``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray


def _doc_distinct_ngrams(batch: pd.DataFrame, *, n: int,
                         col: str = "text") -> pd.DataFrame:
    """(doc_id, gram) rows, distinct per doc; lowercased whitespace
    words joined with single spaces (matching the SQL oracle's
    ``array_to_string(ws[i:i+n-1], ' ')``)."""
    ids, grams = [], []
    for doc_id, text in zip(batch["doc_id"], batch[col].fillna("")):
        ws = text.lower().split()
        if len(ws) < n:
            continue
        seen = {" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)}
        ids.extend([doc_id] * len(seen))
        grams.extend(seen)
    return pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                         "gram": pd.Series(grams, dtype="object")})


def eval_ngram_set(eval_ds, *, n: int = 8, col: str = "text") -> set:
    """Distinct n-grams of the eval corpus, collected to the driver
    (eval-set-sized by contract — benchmarks are thousands of docs,
    not billions; use ``decontaminate(..., broadcast=False)`` when
    that contract breaks)."""
    grams = eval_ds.map_batches(
        _doc_distinct_ngrams, batch_format="pandas", batch_size=4096,
        fn_kwargs={"n": n, "col": col})
    return set(grams.unique("gram"))


def contaminated_docs(train_ds, eval_ds, *, n: int = 8,
                      col: str = "text", broadcast: bool = True,
                      num_partitions: int | None = None):
    """(doc_id, n_hits) for every train doc sharing ≥1 word n-gram
    with the eval set; n_hits = its count of distinct shared grams."""
    if broadcast:
        ref = ray.put(eval_ngram_set(eval_ds, n=n, col=col))

        def hits(batch: pd.DataFrame) -> pd.DataFrame:
            g = _doc_distinct_ngrams(batch, n=n, col=col)
            g = g[g["gram"].isin(ray.get(ref))]
            out = g.groupby("doc_id", sort=False).size() \
                .reset_index(name="n_hits")
            out["n_hits"] = out["n_hits"].astype("int64")
            return out

        # per-doc grams are complete within the doc's batch, so the
        # per-batch groupby is already final — no shuffle at all
        return train_ds.map_batches(hits, batch_format="pandas",
                                    batch_size=4096)

    # scale path: distributed semi-join on the gram key
    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply

    tg = train_ds.map_batches(_doc_distinct_ngrams, batch_format="pandas",
                              batch_size=4096,
                              fn_kwargs={"n": n, "col": col})
    eg = eval_ds.map_batches(
        lambda b: _doc_distinct_ngrams(b, n=n, col=col)[["gram"]]
        .drop_duplicates(),
        batch_format="pandas", batch_size=4096)

    def mark(block: pd.DataFrame) -> pd.DataFrame:
        # a co-located block holds every row of each gram it sees:
        # train rows (doc_id >= 0) survive iff the gram also has an
        # eval row (doc_id == -1)
        hit = set(block.loc[block["doc_id"] < 0, "gram"])
        keep = block[(block["doc_id"] >= 0) & block["gram"].isin(hit)]
        return keep[["doc_id"]]

    # .to_numpy(): b carries drop_duplicates' sparse index, and a dict-
    # of-Series DataFrame build would align on it (NaN marker rows)
    tagged_eval = eg.map_batches(
        lambda b: pd.DataFrame({
            "doc_id": np.full(len(b), -1, dtype=np.int64),
            "gram": b["gram"].to_numpy()}),
        batch_format="pandas")
    both = tg.union(tagged_eval)
    hits = grouped_apply(both, ["gram"], mark,
                         num_partitions=num_partitions)
    return grouped_aggregate(hits, ["doc_id"],
                             {"n_hits": (None, "count")},
                             num_partitions=num_partitions,
                             result_hint="large")


def decontaminate(train_ds, eval_ds, *, n: int = 8, col: str = "text",
                  broadcast: bool = True):
    """Drop contaminated docs from the train Dataset (anti-join of the
    flagged ids, broadcast — the flagged set is dup-bounded)."""
    from jerex_ray.functions.join import broadcast_anti_join

    flagged = contaminated_docs(train_ds, eval_ds, n=n, col=col,
                                broadcast=broadcast)
    bad = set(pd.Series(flagged.to_pandas()["doc_id"]).tolist())
    return broadcast_anti_join(train_ds, bad, on="doc_id")


def contaminated_docs_bloom(train_ds, eval_ds, *, n: int = 8,
                            col: str = "text", m_bits: int = 1 << 20,
                            k: int = 4):
    """Bloom-filter membership variant of ``contaminated_docs`` — the
    middle scale regime: the eval gram SET is too big to broadcast as
    Python strings, but its BITS fit every worker (10 bits/gram at
    1e-2 FPR vs ~60 bytes/gram of set). One-sided error: every truly
    contaminated doc is flagged (no false negatives, guaranteed by the
    filter); a clean doc is flagged with probability ≤ its distinct
    grams × the per-probe FPR ≈ (1 − e^{−k·n_eval/m})^k. n_hits may
    therefore over-count by false-positive grams; use the exact paths
    when the output feeds deletion without review."""
    from jerex_ray.ops.sketch import bloom_build, bloom_contains

    eg = eval_ds.map_batches(
        lambda b: _doc_distinct_ngrams(b, n=n, col=col)[["gram"]]
        .drop_duplicates(),
        batch_format="pandas", batch_size=4096)
    bits = bloom_build(eg, column="gram", m_bits=m_bits, k=k)
    ref = ray.put(bits)

    def hits(batch: pd.DataFrame) -> pd.DataFrame:
        g = _doc_distinct_ngrams(batch, n=n, col=col)
        if g.empty:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "n_hits": pd.Series(dtype="int64")})
        mask = bloom_contains(ray.get(ref), g["gram"].to_numpy(), k=k)
        out = g[mask].groupby("doc_id", sort=False).size() \
            .reset_index(name="n_hits")
        out["n_hits"] = out["n_hits"].astype("int64")
        return out

    return train_ds.map_batches(hits, batch_format="pandas",
                                batch_size=4096)
