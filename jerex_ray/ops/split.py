"""Deterministic dataset splitting and stratified sampling — the
train/val/test plumbing of a large-scale training-data pipeline.

Both operators are pure vectorized ``map_batches`` (split) or a
map + per-group top-k (stratified sample) keyed on the md5-derived
64-bit hash (``jerex_ray.util.md5_hash64``), chosen so an ANSI-SQL
oracle recomputes the exact assignment:
``CAST('0x' || substr(md5(key), 1, 16) AS UBIGINT)``. Hash-based
splits are the standard at corpus scale: no shuffle, no global state,
stable under resharding/reruns, and a document keeps its split when
the corpus grows (unlike fraction-of-row-count splits).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from jerex_ray.util import md5_hash64_batch


def assign_split(batch: pd.DataFrame, *, key: str = "doc_id",
                 fractions: tuple = (0.8, 0.1, 0.1),
                 names: tuple = ("train", "valid", "test"),
                 buckets: int = 1_000_000) -> pd.DataFrame:
    """Add a ``split`` column from the md5 hash of ``key`` modulo
    ``buckets``: the first ``fractions[0]`` share of bucket space is
    ``names[0]``, and so on. Fractions are resolved to integer bucket
    boundaries (floor of the cumulative share)."""
    if len(fractions) != len(names):
        raise ValueError("fractions and names must align")
    bounds = np.floor(np.cumsum(fractions) * buckets).astype(np.int64)
    bounds[-1] = buckets                       # close the last interval
    h = md5_hash64_batch(batch[key].astype(str)) % np.uint64(buckets)
    idx = np.searchsorted(bounds, h.astype(np.int64), side="right")
    out = batch.copy()
    out["split"] = np.asarray(names, dtype=object)[np.minimum(
        idx, len(names) - 1)]
    return out


def hash_split(docs_ds, *, key: str = "doc_id",
               fractions: tuple = (0.8, 0.1, 0.1),
               names: tuple = ("train", "valid", "test")):
    """documents → documents + ``split`` column (no shuffle)."""
    return docs_ds.map_batches(
        assign_split, batch_format="pandas", batch_size=8192,
        fn_kwargs={"key": key, "fractions": fractions, "names": names})


def stratified_sample(ds, *, group: str, n_per_group: int,
                      key: str = "doc_id",
                      num_partitions: int | None = None):
    """Keep the ``n_per_group`` rows with the smallest md5 key hash in
    every ``group`` value — a deterministic stratified sample
    (hash-ordering ≈ uniform random, but stable across runs and
    resharding). Per-batch top-k pre-reduction bounds the shuffle to
    ``n_per_group × #groups`` rows per batch before the co-located
    final top-k — a hot group never ships more than its quota."""
    from jerex_ray.functions.aggregate import grouped_apply

    def partial_topk(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch.copy()
        # arrow-friendly int64 column whose ORDER matches the unsigned
        # hash: flip the sign bit (order-preserving uint64 → int64)
        h = md5_hash64_batch(b[key].astype(str))
        b["__h"] = (h ^ np.uint64(1 << 63)).view(np.int64)
        return (b.sort_values([group, "__h"])
                 .groupby(group, sort=False).head(n_per_group))

    def final_topk(block: pd.DataFrame) -> pd.DataFrame:
        if block.empty or "__h" not in block.columns:
            return block
        out = (block.sort_values([group, "__h"])
                    .groupby(group, sort=False).head(n_per_group))
        return out.drop(columns=["__h"])

    partial = ds.map_batches(partial_topk, batch_format="pandas",
                             batch_size=8192)
    return grouped_apply(partial, [group], final_topk,
                         num_partitions=num_partitions)


def mixture_sample(docs_ds, *, weights: dict, default: float = 1.0,
                   key: str = "doc_id", source_col: str = "source",
                   buckets: int = 1_000_000):
    """Deterministic data mixing (the pretraining-recipe step that
    up/down-samples sources to target proportions): a doc with source
    weight ``w`` is emitted ``floor(w)`` times, plus one more iff its
    md5 bucket falls under the fractional remainder — so an epoch of
    the mixture contains each source at exactly its weight in
    expectation, reproducibly (no RNG state, stable under resharding
    and reruns, a doc keeps its fate when the corpus grows). Output
    rows carry ``copy_idx`` (0-based) so downstream packing can
    distinguish repeats. One stateless vectorized pass; SQL-oracled
    via the same md5-bucket predicate + ``unnest(range(n))``."""
    wts = dict(weights)

    def expand(batch: pd.DataFrame) -> pd.DataFrame:
        w = batch[source_col].map(wts).fillna(default) \
            .to_numpy(np.float64)
        base = np.floor(w)
        h = md5_hash64_batch(batch[key].astype(str)) % np.uint64(buckets)
        frac = (w - base) * buckets
        n = (base + (h.astype(np.float64) < frac)).astype(np.int64)
        keep = n > 0
        idx = np.repeat(np.arange(len(batch))[keep], n[keep])
        out = batch.iloc[idx].reset_index(drop=True)
        copy_idx = np.concatenate(
            [np.arange(c, dtype=np.int64) for c in n[keep]]) \
            if keep.any() else np.empty(0, dtype=np.int64)
        out["copy_idx"] = copy_idx
        return out

    return docs_ds.map_batches(expand, batch_format="pandas",
                               batch_size=8192)


def weighted_sample(docs_ds, *, k: int, weights: dict | None = None,
                    default: float = 1.0, key: str = "doc_id",
                    source_col: str = "source",
                    buckets: int = 1_000_000):
    """Weighted sampling WITHOUT replacement (Efraimidis & Spirakis
    '06, "Weighted random sampling with a reservoir"): each row gets
    priority u^(1/w) with u a deterministic md5-derived uniform — the
    top-k priorities are exactly a weighted sample. Distributed as a
    top-k combiner: each batch keeps only its local top-k, one
    single-block merge finishes; deterministic (no RNG state), stable
    under resharding, SQL-oracled via ``pow(u, 1/w) ORDER BY``."""
    wts = weights or {}

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        h = md5_hash64_batch(batch[key].astype(str)) % np.uint64(buckets)
        u = (h.astype(np.float64) + 0.5) / buckets
        w = batch[source_col].map(wts).fillna(default) \
            .to_numpy(np.float64) if source_col in batch.columns \
            else np.full(len(batch), default)
        out = batch.copy()
        out["__prio"] = u ** (1.0 / np.maximum(w, 1e-12))
        return out.sort_values(["__prio", key],
                               ascending=[False, True]).head(k)

    top = docs_ds.map_batches(partial, batch_format="pandas",
                              batch_size=65536) \
        .repartition(1) \
        .map_batches(lambda df: df.sort_values(["__prio", key],
                                               ascending=[False, True])
                     .head(k).drop(columns=["__prio"]),
                     batch_format="pandas", batch_size=None)
    return top
