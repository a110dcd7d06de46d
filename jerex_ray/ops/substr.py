"""Cross-document duplicate-substring spans (substring-level dedup).

Document-level dedup (exact / MinHash / SimHash — ``ops/dedup.py``)
misses the dominant duplication mode in web corpora: long VERBATIM
passages embedded in otherwise-distinct documents (boilerplate,
licenses, quoted posts). Lee et al. '22 ("Deduplicating Training Data
Makes Language Models Better") remove any substring duplicated across
the corpus; this module computes those spans as a dataflow:

1. One ``map_batches`` explodes each document into its rolling word
   ``n``-grams as ``(doc_id, pos, h)`` rows, ``h`` the md5-derived
   64-bit gram hash (``util.md5_hash64``) — per-doc numpy work, no
   corpus-sized Python state.
2. The combiner ``grouped_aggregate`` counts occurrences per hash;
   grams with ``count >= min_count`` are the duplicated set. Hot grams
   (a boilerplate line in a billion docs) contribute one partial row
   per batch, not a billion shuffled rows.
3. Hit positions flow back through a broadcast membership filter when
   the duplicated-gram set is small (``<= broadcast_threshold``), else
   a hash-partitioned ``Dataset.join`` semi-join — same two-regime
   switch as MinHash verification (``ops/dedup.py``).
4. A per-doc gaps-and-islands merge (hash-partitioned by doc_id, fully
   vectorized inside each block) folds overlapping/adjacent gram
   intervals ``[pos, pos+n)`` into maximal spans.

Output: ``(doc_id, start, end)`` word-coordinate spans (0-based,
end-exclusive). Exact up to md5-64 gram-hash collisions (probability
~G²/2⁶⁵ for G distinct grams — negligible below ~10¹² grams; a
collision could only ADD a false span, never drop a real one).

SQL parity: the ``doc_dup_spans`` oracle recomputes grams with a
lateral ``range`` unnest, the duplicate filter with HAVING, and the
island merge with window functions — bit-exact (integer coordinates).

The reference has nothing substring-level (SURVEY.md §2.7); engine
extension for the LLM-data-pipeline charter.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _gram_rows_fn(n: int):
    from jerex_ray.util import md5_hash64_batch

    def gram_rows(batch: pd.DataFrame) -> pd.DataFrame:
        words = batch["text"].fillna("").str.lower().str.split()
        docs, poss, hs = [], [], []
        for doc, ws in zip(batch["doc_id"].to_numpy(), words.to_numpy()):
            if ws is None or len(ws) < n:
                continue
            grams = [" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)]
            docs.append(np.full(len(grams), doc, dtype=np.int64))
            poss.append(np.arange(len(grams), dtype=np.int64))
            hs.append(md5_hash64_batch(grams))
        if not docs:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "pos": pd.Series(dtype="int64"),
                                 "h": pd.Series(dtype="uint64")})
        return pd.DataFrame({"doc_id": np.concatenate(docs),
                             "pos": np.concatenate(poss),
                             "h": np.concatenate(hs)})

    return gram_rows


def _islands_fn(n: int):
    def islands(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "start": pd.Series(dtype="int64"),
                                 "end": pd.Series(dtype="int64")})
        df = df.sort_values(["doc_id", "pos"])
        doc = df["doc_id"].to_numpy(np.int64)
        pos = df["pos"].to_numpy(np.int64)
        brk = np.ones(len(df), dtype=bool)
        if len(df) > 1:
            same = doc[1:] == doc[:-1]
            brk[1:] = ~same | (pos[1:] - pos[:-1] > n)
        grp = np.cumsum(brk) - 1
        g = pd.DataFrame({"doc_id": doc, "grp": grp, "pos": pos}) \
            .groupby(["doc_id", "grp"], sort=False)["pos"].agg(["min", "max"])
        out = g.reset_index()
        return pd.DataFrame({"doc_id": out["doc_id"].to_numpy(np.int64),
                             "start": out["min"].to_numpy(np.int64),
                             "end": out["max"].to_numpy(np.int64) + n})

    return islands


def duplicate_spans(docs_ds, *, n: int = 8, min_count: int = 2,
                    broadcast_threshold: int = 2_000_000,
                    num_partitions: int | None = None):
    """Maximal word spans covered by ``n``-grams occurring at least
    ``min_count`` times corpus-wide. Returns a Dataset of
    ``(doc_id, start, end)``."""
    import ray

    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply

    grams = docs_ds.map_batches(_gram_rows_fn(n), batch_format="pandas",
                                batch_size=4096).materialize()
    counts = grouped_aggregate(grams, ["h"], {"c": (None, "count")},
                               num_partitions=num_partitions)
    # materialize once: count(), the broadcast collect, and the join
    # path would otherwise each re-run the whole gram+aggregate lineage
    dup = counts.filter(expr=f"c >= {int(min_count)}").materialize()

    n_dup = dup.count()
    if n_dup == 0:
        import pyarrow as pa
        return ray.data.from_arrow(pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "start": pa.array([], pa.int64()),
             "end": pa.array([], pa.int64())}))
    if n_dup <= broadcast_threshold:
        dup_ref = ray.put(set(dup.to_pandas()["h"].tolist()))

        def member(df: pd.DataFrame) -> pd.DataFrame:
            keep = df["h"].isin(ray.get(dup_ref))
            return df.loc[keep, ["doc_id", "pos"]]

        hits = grams.map_batches(member, batch_format="pandas")
    else:
        hits = grams.join(
            dup.select_columns(["h"]).materialize(), join_type="inner",
            num_partitions=8, on=("h",), right_on=("h",)) \
            .select_columns(["doc_id", "pos"])

    return grouped_apply(hits, ["doc_id"], _islands_fn(n),
                         num_partitions=num_partitions)


def duplicate_ratio(docs_ds, spans_ds) -> pd.DataFrame:
    """Per-doc fraction of words covered by duplicate spans — the
    quality-filter signal derived from ``duplicate_spans``. Small
    helper over already-reduced span rows."""
    from jerex_ray.functions.aggregate import grouped_aggregate

    def lens(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "covered": (df["end"] - df["start"]).to_numpy(np.int64)})

    cov = grouped_aggregate(spans_ds.map_batches(lens, batch_format="pandas"),
                            ["doc_id"], {"covered": ("covered", "sum")}) \
        .to_pandas()

    def nwords(df: pd.DataFrame) -> pd.DataFrame:
        ws = df["text"].fillna("").str.lower().str.split()
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(np.int64),
                             "n_words": ws.str.len().fillna(0)
                             .to_numpy(np.int64)})

    total = grouped_aggregate(
        docs_ds.map_batches(nwords, batch_format="pandas"),
        ["doc_id"], {"n_words": ("n_words", "sum")}).to_pandas()
    out = total.merge(cov, on="doc_id", how="left")
    out["covered"] = out["covered"].fillna(0).astype("int64")
    out["dup_ratio"] = (out["covered"]
                        / out["n_words"].clip(lower=1)).round(6)
    return out.sort_values("doc_id").reset_index(drop=True)
