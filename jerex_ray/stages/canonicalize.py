"""Canonicalization: surface normalization, stable entity ids, and the
distributed entity-dedup aggregation.

North-rule requirement: emitted mentions/clusters/relations are
canonicalized (string-normalized surface forms + cluster-representative
linking). Reference analogue: the cluster representative phrase is the
first mention's phrase (``/root/reference/jerex/datasets.py:126-128``);
normalization and global entity identity are new (SURVEY.md §2.6).

Scale design:

* Canonical entity ids are a **pure function** of the normalized
  surface (stable 64-bit content hash) — annotating a trillion triples
  needs NO join and NO shared index, just a vectorized map_batches.
* The canonical entity **table** (id → representative surface, type,
  occurrence count) is built with a two-phase partial/final aggregate:
  per-batch pandas groupby collapses each batch to one row per key
  (this is what absorbs hot keys — "Acme Corp" in millions of convs
  becomes one partial row per batch), then a single small
  ``groupby(entity_id).map_groups`` merges partials. This is the
  salted-shuffle equivalent for aggregation: the pre-combine bounds
  any key's shuffle fan-in to #batches, not #occurrences.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from jerex_ray.util import md5_hash64_batch, normalize_surface

_PUNCT_TABLE = str.maketrans(
    {c: " " for c in ".,;:!?\"'`()[]{}<>|/\\-_=+*&^%$#@~"})


def _normalize_series(s: pd.Series) -> pd.Series:
    """Vectorized normalize_surface over a string Series."""
    return (s.str.lower()
             .str.translate(_PUNCT_TABLE)
             .str.split()
             .str.join(" "))


def _hash_keys(norm: pd.Series) -> np.ndarray:
    """md5-derived canonical id (the §2.6 convention shared with the
    doc-entity path) — SQL-replicable as
    ``CAST('0x' || substr(md5(norm), 1, 16) AS UBIGINT) % 2^63`` so
    the entity/provenance oracles can recompute ids exactly."""
    return (md5_hash64_batch(norm.to_numpy(dtype=object))
            % np.uint64(1 << 63)).astype(np.int64)


def canonicalize_triples(batch: pd.DataFrame) -> pd.DataFrame:
    """Annotate triples with normalized surfaces + canonical ids."""
    batch = batch.copy()
    batch["subj_norm"] = _normalize_series(batch["subj"])
    batch["obj_norm"] = _normalize_series(batch["obj"])
    batch["subj_id"] = _hash_keys(batch["subj_norm"])
    batch["obj_id"] = _hash_keys(batch["obj_norm"])
    return batch


def entity_partials(batch: pd.DataFrame) -> pd.DataFrame:
    """Phase 1 (combiner): collapse a triple batch to per-key partial
    rows over both subj and obj occurrences."""
    subj = batch[["subj_id", "subj_norm", "subj", "subj_type"]].rename(
        columns={"subj_id": "entity_id", "subj_norm": "norm",
                 "subj": "surface", "subj_type": "entity_type"})
    obj = batch[["obj_id", "obj_norm", "obj", "obj_type"]].rename(
        columns={"obj_id": "entity_id", "obj_norm": "norm",
                 "obj": "surface", "obj_type": "entity_type"})
    both = pd.concat([subj, obj], ignore_index=True)
    part = (both.groupby(["entity_id", "norm", "surface", "entity_type"],
                         sort=False)
                .size().reset_index(name="n"))
    return part


def entity_final_block(block: pd.DataFrame) -> pd.DataFrame:
    """Phase 2 (final merge), vectorized over a block of co-located
    entity_id groups: sum partial counts, pick the most frequent
    surface/type per entity (ties → lexicographically smallest —
    stable across re-sharding)."""
    if block.empty:
        return pd.DataFrame({
            "entity_id": pd.Series(dtype="int64"),
            "norm": pd.Series(dtype="object"),
            "surface": pd.Series(dtype="object"),
            "entity_type": pd.Series(dtype="object"),
            "n_occurrences": pd.Series(dtype="int64")})
    sums = (block.groupby(["entity_id", "norm", "surface", "entity_type"],
                          sort=False)["n"].sum().reset_index())
    totals = sums.groupby("entity_id", sort=False)["n"].sum() \
                 .rename("n_occurrences").reset_index()
    top = sums.sort_values(["entity_id", "n", "surface", "entity_type"],
                           ascending=[True, False, True, True]) \
              .drop_duplicates("entity_id")
    out = top.merge(totals, on="entity_id")
    out["n_occurrences"] = out["n_occurrences"].astype("int64")
    return out[["entity_id", "norm", "surface", "entity_type",
                "n_occurrences"]]


def build_entity_table(triples_ds):
    """triples Dataset → canonical entity Dataset via the two-phase
    partial/final aggregate described in the module docstring."""
    from jerex_ray.functions.aggregate import grouped_apply
    partials = triples_ds.map_batches(
        entity_partials, batch_format="pandas", batch_size=65536)
    return grouped_apply(partials, ["entity_id"], entity_final_block)


def dedup_triples(group: pd.DataFrame) -> pd.DataFrame:
    """Exact dedup on (conv_id, subj_id, pred, obj_id), keeping max
    score — the G6 'duplicates count once' rule
    (``/root/reference/jerex/evaluation/scoring.py:16-23``) applied at
    the conversation level (chunked long convs can re-emit a triple).
    Score ties break on the EARLIEST evidence turn so the surviving
    row is deterministic under any block arrival order."""
    ordered = group.sort_values(["score", "evidence"],
                                ascending=[False, True], kind="stable")
    out = ordered.drop_duplicates(["conv_id", "subj_id", "pred",
                                   "obj_id"])
    return out.sort_index()
