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

from jerex_ray.util import normalize_surface, stable_hash64

_PUNCT_TABLE = str.maketrans(
    {c: " " for c in ".,;:!?\"'`()[]{}<>|/\\-_=+*&^%$#@~"})


def _normalize_series(s: pd.Series) -> pd.Series:
    """Vectorized normalize_surface over a string Series."""
    return (s.str.lower()
             .str.translate(_PUNCT_TABLE)
             .str.split()
             .str.join(" "))


def _hash_keys(norm: pd.Series) -> np.ndarray:
    uniq = norm.unique()
    mapping = {u: np.int64(stable_hash64(u) % (1 << 63)) for u in uniq}
    return norm.map(mapping).to_numpy(dtype=np.int64)


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


def entity_final(group: pd.DataFrame) -> pd.DataFrame:
    """Phase 2 (final merge) for one entity_id group: pick the most
    frequent surface/type (ties → lexicographically smallest — stable
    across re-sharding)."""
    sums = group.groupby(["surface", "entity_type"], sort=False)["n"].sum()
    sums = sums.reset_index().sort_values(
        ["n", "surface", "entity_type"], ascending=[False, True, True])
    top = sums.iloc[0]
    return pd.DataFrame({
        "entity_id": [group["entity_id"].iloc[0]],
        "norm": [group["norm"].iloc[0]],
        "surface": [top["surface"]],
        "entity_type": [top["entity_type"]],
        "n_occurrences": [int(group["n"].sum())],
    })


def build_entity_table(triples_ds):
    """triples Dataset → canonical entity Dataset via the two-phase
    partial/final aggregate described in the module docstring."""
    from jerex_ray.runtime import shuffle_partitions
    partials = triples_ds.map_batches(
        entity_partials, batch_format="pandas", batch_size=65536)
    return partials.groupby(
        "entity_id", num_partitions=shuffle_partitions()).map_groups(
        entity_final, batch_format="pandas")


def dedup_triples(group: pd.DataFrame) -> pd.DataFrame:
    """Exact dedup on (conv_id, subj_id, pred, obj_id), keeping max
    score — the G6 'duplicates count once' rule
    (``/root/reference/jerex/evaluation/scoring.py:16-23``) applied at
    the conversation level (chunked long convs can re-emit a triple)."""
    idx = group.groupby(["conv_id", "subj_id", "pred", "obj_id"],
                        sort=False)["score"].idxmax()
    return group.loc[idx.sort_values()]
