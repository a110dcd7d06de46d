"""Token-budget sequence packing — the concat-and-chunk step every
pretraining data pipeline runs between cleaning and tensorization:
documents are concatenated in a stable order within each stream key
(here ``source``) and cut into fixed token-budget packs; each document
gets the pack id and intra-pack offset where its first token lands
(documents may straddle pack boundaries, as in GPT-style packing).

The primitive underneath is a DISTRIBUTED KEYED EXCLUSIVE PREFIX SUM
over an ordered column — built shuffle-light for 100 TB:

1. one metadata-only projection pass computes ``n_tokens`` per doc
   (text never leaves this stage);
2. per-(key, chunk) token totals — ``chunk = order // chunk_size`` —
   reduce through the combiner ``grouped_aggregate``; the totals table
   is ``n_docs / chunk_size`` rows (metadata-sized), so the driver can
   compute the exclusive prefix of every chunk and broadcast it via
   ``ray.put`` — the classic two-level scan (Blelloch '90);
3. one hash co-location of the (tiny, text-free) token rows on
   (key, chunk) finishes the scan: block-local sorted cumsum + the
   broadcast chunk base. Group sizes are bounded by ``chunk_size``
   regardless of corpus size, so no reducer ever sees more than
   ``chunk_size`` rows per group.

Nothing document-sized crosses a shuffle; the only all-to-all moves
three integer columns plus the key.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray


def _token_rows(batch: pd.DataFrame, *, key: str,
                order: str) -> pd.DataFrame:
    """Metadata projection: (order, key, n_tokens, chunk). Token rule =
    whitespace split, matching ``textstats.token_stats``."""
    texts = batch["text"].fillna("")
    return pd.DataFrame({
        order: batch[order].astype("int64"),
        key: batch[key],
        "n_tokens": texts.str.split().str.len().fillna(0).astype("int64"),
    })


def pack_documents(docs_ds, *, budget: int = 512, key: str = "source",
                   order: str = "doc_id", chunk_size: int = 4096,
                   num_partitions: int | None = None):
    """Assign ``(pack_id, pack_offset)`` to every document: packs of
    ``budget`` tokens over the ``order``-sorted concatenation of each
    ``key`` group's documents.

    Returns a Dataset ``(order, key, n_tokens, pack_id, pack_offset)``.
    """
    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply

    tok = docs_ds.map_batches(_token_rows, batch_format="pandas",
                              batch_size=8192,
                              fn_kwargs={"key": key, "order": order})
    # materialize the metadata projection once (3 int cols + key —
    # object-store-sized even at 10^9 docs) so the text is decoded a
    # single time for both the totals pass and the finish pass
    tok = tok.materialize()

    def add_chunk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["chunk"] = df[order] // chunk_size
        return df

    tok = tok.map_batches(add_chunk, batch_format="pandas")

    totals = grouped_aggregate(
        tok, [key, "chunk"], {"tok_sum": ("n_tokens", "sum")},
        num_partitions=num_partitions).to_pandas()
    # driver-side exclusive scan over the (metadata-sized) chunk grid
    totals = totals.sort_values([key, "chunk"]).reset_index(drop=True)
    csum = totals.groupby(key, sort=False)["tok_sum"].cumsum()
    totals["base"] = (csum - totals["tok_sum"]).astype("int64")
    base_ref = ray.put(totals[[key, "chunk", "base"]])

    def finish(block: pd.DataFrame) -> pd.DataFrame:
        if block.empty:
            return pd.DataFrame({order: pd.Series(dtype="int64"),
                                 key: pd.Series(dtype="object"),
                                 "n_tokens": pd.Series(dtype="int64"),
                                 "pack_id": pd.Series(dtype="int64"),
                                 "pack_offset": pd.Series(dtype="int64")})
        base = ray.get(base_ref)
        block = block.sort_values([key, "chunk", order]) \
            .reset_index(drop=True)
        local = (block.groupby([key, "chunk"], sort=False)["n_tokens"]
                 .cumsum() - block["n_tokens"])
        block = block.merge(base, on=[key, "chunk"], how="left")
        off = (block["base"].fillna(0).astype("int64")
               + local.to_numpy())
        block["pack_id"] = (off // budget).astype("int64")
        block["pack_offset"] = (off % budget).astype("int64")
        return block[[order, key, "n_tokens", "pack_id", "pack_offset"]]

    return grouped_apply(tok, [key, "chunk"], finish,
                         num_partitions=num_partitions)


def keyed_prefix_sum(ds, *, value: str, key: str, order: str,
                     chunk_size: int = 4096,
                     num_partitions: int | None = None):
    """The bare primitive: exclusive running sum of ``value`` in
    ``order`` within each ``key`` group, as a new column
    ``{value}_before``. Same two-level scan as ``pack_documents``."""
    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply

    def add_chunk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__chunk"] = df[order] // chunk_size
        return df

    withc = ds.map_batches(add_chunk, batch_format="pandas")
    totals = grouped_aggregate(
        withc, [key, "__chunk"], {"__sum": (value, "sum")},
        num_partitions=num_partitions).to_pandas()
    totals = totals.sort_values([key, "__chunk"]).reset_index(drop=True)
    csum = totals.groupby(key, sort=False)["__sum"].cumsum()
    totals["__base"] = (csum - totals["__sum"]).astype("int64")
    base_ref = ray.put(totals[[key, "__chunk", "__base"]])
    out_col = f"{value}_before"

    def finish(block: pd.DataFrame) -> pd.DataFrame:
        if block.empty:
            return block.assign(**{out_col: pd.Series(dtype="int64")}) \
                .drop(columns=["__chunk"], errors="ignore")
        base = ray.get(base_ref)
        block = block.sort_values([key, "__chunk", order]) \
            .reset_index(drop=True)
        local = (block.groupby([key, "__chunk"], sort=False)[value]
                 .cumsum() - block[value])
        block = block.merge(base, on=[key, "__chunk"], how="left")
        block[out_col] = (block["__base"].fillna(0).astype("int64")
                          + np.asarray(local, dtype="int64"))
        return block.drop(columns=["__chunk", "__base"])

    return grouped_apply(withc, [key, "__chunk"], finish,
                         num_partitions=num_partitions)
