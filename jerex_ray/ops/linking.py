"""Entity linking: attach canonical-entity rows to a knowledge base.

North-rule stage ("triple extraction, entity linking, canonicalization,
graph materialize"): after canonicalization produces the corpus entity
table (``stages/canonicalize.py``), linking resolves each canonical
entity against a KB of known entities — exact on the normalized
surface first, then fuzzy (bounded Levenshtein) for near-misses
(typos, inflections). The reference has no KB; linking is an engine
extension of the canonicalization join (SURVEY.md §2.6).

Scale design:

* The KB is a **dimension table** (bounded at any corpus scale — it is
  curated, not extracted), so it broadcasts: one ``ray.put`` of the
  id/norm arrays, read by every ``map_batches`` task. The corpus
  entity stream never shuffles for linking.
* Exact matching is one vectorized pandas merge per batch.
* Fuzzy matching runs ONLY on the batch rows exact missed, against
  ONLY the KB rows inside the Levenshtein length band
  (|len(a) − len(b)| ≤ max_dist is a lower bound of the distance, so
  the prefilter is lossless), with all surviving pairs scored in ONE
  batched numpy DP (``util.edit_distances_batch``) — no Python loop
  per pair.
* Tie-break is total and deterministic: (distance, kb_norm, kb_id)
  ascending — the SQL oracle (DuckDB ``levenshtein``, verified
  digit-for-digit against the numpy DP) uses the identical
  ``ROW_NUMBER`` ordering.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def link_entities(entities_ds, kb: pd.DataFrame, *, max_dist: int = 2,
                  norm_col: str = "norm", id_col: str = "entity_id",
                  batch_size: int = 65536):
    """Link each entity row to its best KB entry.

    ``kb`` needs columns (kb_id, kb_norm); rows whose ``norm_col`` has
    no KB entry within ``max_dist`` edits are dropped (unlinked).
    Returns a Dataset with (entity_id, norm, kb_id, kb_norm,
    dist:int64, method:'exact'|'fuzzy').
    """
    import ray

    # duplicate kb_norm rows: smallest kb_id wins — the SAME tie-break
    # the fuzzy path applies ((dist, kb_norm, kb_id) ascending), so the
    # linked id never depends on KB row order
    kb = kb[["kb_id", "kb_norm"]].sort_values(["kb_norm", "kb_id"]) \
        .drop_duplicates("kb_norm").reset_index(drop=True)
    # the length-sorted view is a pure function of the KB: compute it
    # ONCE here and broadcast it alongside, not per batch (a 1M-entry
    # KB would otherwise pay an O(m log m) argsort in every task)
    _kn_all = kb["kb_norm"].to_numpy()
    _lk_all = np.char.str_len(_kn_all.astype(str))
    _order = np.argsort(_lk_all, kind="stable")
    kb_ref = ray.put((kb, _kn_all[_order], kb["kb_id"].to_numpy()[_order],
                      _lk_all[_order]))

    def link(batch: pd.DataFrame) -> pd.DataFrame:
        from jerex_ray.util import edit_distances_batch

        kbl, kn, kb_ids_sorted, lk = ray.get(kb_ref)
        out_cols = ["entity_id", "norm", "kb_id", "kb_norm", "dist",
                    "method"]
        if batch.empty or kbl.empty:
            return pd.DataFrame({
                "entity_id": pd.Series(dtype="int64"),
                "norm": pd.Series(dtype="object"),
                "kb_id": pd.Series(dtype="int64"),
                "kb_norm": pd.Series(dtype="object"),
                "dist": pd.Series(dtype="int64"),
                "method": pd.Series(dtype="object")})
        b = pd.DataFrame({"entity_id": batch[id_col].to_numpy(),
                          "norm": batch[norm_col].astype(str).to_numpy()})
        exact = b.merge(kbl, left_on="norm", right_on="kb_norm")
        exact["dist"] = np.int64(0)
        exact["method"] = "exact"

        miss = b[~b["norm"].isin(kbl["kb_norm"])]
        frames = [exact[out_cols]]
        if len(miss):
            un = miss["norm"].to_numpy()
            # length band via searchsorted over the broadcast
            # length-sorted KB — O(n log m + candidates), never an
            # n×m matrix (a 65k-row batch against a 1M-entry KB would
            # otherwise allocate 65 GB of band booleans)
            lu = np.char.str_len(un.astype(str))
            lo = np.searchsorted(lk, lu - max_dist, side="left")
            hi = np.searchsorted(lk, lu + max_dist, side="right")
            counts = np.maximum(hi - lo, 0)
            ui = np.repeat(np.arange(len(un)), counts)
            offs = np.concatenate(([0], np.cumsum(counts)[:-1]))
            ki = np.arange(counts.sum(), dtype=np.int64) \
                - np.repeat(offs, counts) + np.repeat(lo, counts)
            if len(ui):
                dists = edit_distances_batch(
                    list(zip(un[ui].tolist(), kn[ki].tolist())))
                cand = pd.DataFrame({
                    "entity_id": miss["entity_id"].to_numpy()[ui],
                    "norm": un[ui],
                    "kb_id": kb_ids_sorted[ki],
                    "kb_norm": kn[ki],
                    "dist": dists.astype(np.int64)})
                cand = cand[cand["dist"] <= max_dist]
                cand = cand.sort_values(["entity_id", "dist", "kb_norm",
                                         "kb_id"]) \
                    .drop_duplicates("entity_id")
                cand["method"] = "fuzzy"
                frames.append(cand[out_cols])
        out = pd.concat(frames, ignore_index=True)
        out["entity_id"] = out["entity_id"].astype("int64")
        out["kb_id"] = out["kb_id"].astype("int64")
        out["dist"] = out["dist"].astype("int64")
        return out

    return entities_ds.map_batches(link, batch_format="pandas",
                                   batch_size=batch_size)
