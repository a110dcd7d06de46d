"""The composed pretraining-data pipeline as a reusable library
function (the `doc_pretrain_corpus` query and the ``pretrain`` CLI
subcommand share it):

  near-dup survivors (exact-Jaccard edges → connected components →
  keep smallest doc_id) → train split (md5 bucket < 0.9) → 8-gram
  decontamination against the test split → P90 unigram-quality filter
  (scores over the FULL corpus, standalone-op semantics) →
  token-budget sequence packing per source.

Scale shape: the loser and contaminated id sets are broadcast-sized by
construction; quality scores attach via a hash-partitioned
``Dataset.join``; the split predicate is stateless md5; packing is the
distributed keyed prefix sum. The corpus streams through one filter
chain — nothing corpus-sized is collected. Verified end-to-end by ONE
chained SQL statement (``queries._pretrain_corpus_oracle_sql``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def pretrain_corpus(docs_ds, *, pack_budget: int = 512,
                    jaccard_threshold: float = 0.7,
                    decontam_n: int = 8,
                    quality_quantile: float = 0.9):
    """documents Dataset (doc_id, text, source) → packed eligible rows
    (doc_id, source, n_tokens, pack_id, pack_offset) as a Dataset."""
    import ray

    from jerex_ray.functions.components import connected_components
    from jerex_ray.ops.decontam import contaminated_docs
    from jerex_ray.ops.dedup import jaccard_edges_exact
    from jerex_ray.ops.pack import pack_documents
    from jerex_ray.ops.quantiles import distributed_quantiles
    from jerex_ray.ops.split import hash_split
    from jerex_ray.ops.textstats import unigram_logppl
    from jerex_ray.runtime import configure_data_context
    configure_data_context(ds=docs_ds)

    dt = docs_ds.map_batches(lambda b: b[["doc_id", "text"]],
                             batch_format="pandas")

    # 1. near-dup losers (broadcast-sized: only near-dup non-minima)
    edges = jaccard_edges_exact(dt, threshold=jaccard_threshold)
    comp = connected_components(
        edges.map_batches(
            lambda b: b.rename(columns={"doc_a": "src", "doc_b": "dst"})
            [["src", "dst"]] if "doc_a" in b.columns else
            pd.DataFrame({"src": pd.Series(dtype="int64"),
                          "dst": pd.Series(dtype="int64")}),
            batch_format="pandas"))
    losers = set(comp.loc[comp["node"] != comp["component"], "node"]
                 .astype("int64")) if len(comp) else set()

    # 2+3. md5 split and decontamination of train vs test grams
    split = hash_split(dt)
    train = split.map_batches(
        lambda b: b.loc[b["split"] != "test", ["doc_id", "text"]],
        batch_format="pandas")
    evald = split.map_batches(
        lambda b: b.loc[b["split"] == "test", ["doc_id", "text"]],
        batch_format="pandas")
    contam_df = contaminated_docs(train, evald, n=decontam_n).to_pandas()
    contam = set(contam_df["doc_id"].astype("int64")) \
        if "doc_id" in contam_df.columns else set()

    # 4. quality threshold over the FULL corpus (scores rounded to 6
    # decimals BEFORE the quantile — standalone-op semantics)
    scored = unigram_logppl(dt).map_batches(
        lambda df: df.assign(logppl=df["logppl"].round(6))
        [["doc_id", "logppl"]],
        batch_format="pandas").materialize()
    p_cut = distributed_quantiles(scored, "logppl",
                                  [quality_quantile])[0]

    # 5. one streaming filter chain over the corpus, then packing
    joined = docs_ds.join(scored, join_type="inner", num_partitions=8,
                          on=("doc_id",), right_on=("doc_id",))
    losers_ref, contam_ref = ray.put(losers), ray.put(contam)

    def eligible(df: pd.DataFrame) -> pd.DataFrame:
        from jerex_ray.util import md5_hash64_batch
        b = md5_hash64_batch(df["doc_id"].astype(str)) \
            % np.uint64(1_000_000)
        keep = (b < 900_000) \
            & ~df["doc_id"].isin(ray.get(losers_ref)) \
            & ~df["doc_id"].isin(ray.get(contam_ref)) \
            & (df["logppl"].to_numpy() <= p_cut)
        return df.loc[keep, ["doc_id", "text", "source"]]

    return pack_documents(joined.map_batches(eligible,
                                             batch_format="pandas"),
                          budget=pack_budget)
