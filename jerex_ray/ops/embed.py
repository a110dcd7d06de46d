"""Embedding-column analytics: grouped centroids and distributed
k-means (Lloyd '82). These are the training half of the IVF ANN path
(``ops/ann.py``) made first-class.

Scale shape: vectors NEVER ride a shuffle. Each pass is one streaming
``map_batches`` that reduces a batch to (groups × dims) partial sums —
a metadata-sized block — and the only aggregation is over those
partials. Centroids broadcast once per iteration via ``ray.put``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _matrix(col) -> np.ndarray:
    return np.asarray([np.asarray(v, dtype=np.float64) for v in col])


def label_centroids(emb_ds, *, label_col: str = "label",
                    vec_col: str = "embedding",
                    decimals: int = 6) -> pd.DataFrame:
    """Mean vector per label, flattened to (label, dim, centroid) rows.

    One ``map_batches`` emits per-batch partial sums and counts as flat
    (label, dim, s, c) rows — bounded by labels × dims per batch — and
    a driver-side groupby over that tiny frame finishes. Rounded to
    ``decimals`` on both engine and oracle sides: distributed summation
    order makes the last float bits non-deterministic."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        labels = batch[label_col].to_numpy()
        mat = _matrix(batch[vec_col])
        if mat.size == 0:
            return pd.DataFrame({"label": pd.Series(dtype="int64"),
                                 "dim": pd.Series(dtype="int64"),
                                 "s": pd.Series(dtype="float64"),
                                 "c": pd.Series(dtype="int64")})
        uniq, inv = np.unique(labels, return_inverse=True)
        dims = mat.shape[1]
        sums = np.zeros((len(uniq), dims), dtype=np.float64)
        np.add.at(sums, inv, mat)
        counts = np.bincount(inv, minlength=len(uniq))
        return pd.DataFrame({
            "label": np.repeat(uniq.astype(np.int64), dims),
            "dim": np.tile(np.arange(dims, dtype=np.int64), len(uniq)),
            "s": sums.ravel(),
            "c": np.repeat(counts.astype(np.int64), dims)})

    parts = emb_ds.map_batches(partial, batch_format="pandas",
                               batch_size=4096).to_pandas()
    if parts.empty:
        return pd.DataFrame({"label": pd.Series(dtype="int64"),
                             "dim": pd.Series(dtype="int64"),
                             "centroid": pd.Series(dtype="float64")})
    agg = parts.groupby(["label", "dim"], sort=True).agg(
        s=("s", "sum"), c=("c", "sum")).reset_index()
    agg["centroid"] = (agg["s"] / agg["c"]).round(decimals)
    return agg[["label", "dim", "centroid"]].reset_index(drop=True)


def kmeans(emb_ds, *, k: int = 8, iters: int = 10,
           vec_col: str = "embedding", id_col: str = "vec_id"):
    """Distributed Lloyd's k-means over an embedding column.

    Deterministic: initial centroids are the vectors of the ``k``
    smallest ``id_col`` values (collected via a metadata-cheap sorted
    ``limit(k)``), iterations are exact data-parallel reduces. Each
    iteration is ONE streaming pass: assign each batch's vectors to the
    nearest broadcast centroid (one matmul), emit per-cluster partial
    sums (k × dims rows per batch) plus the batch inertia; the driver
    folds the partials — O(k·d·#batches) — and re-broadcasts. Empty
    clusters keep their previous centroid (standard Lloyd treatment).

    Returns ``(assign_ds, history)``: a Dataset of (vec_id, cluster)
    produced by one final streaming pass, and the per-iteration
    inertia list (monotonically non-increasing — the Lloyd invariant,
    pytest-gated)."""
    import ray

    first = emb_ds.sort(id_col).limit(k).to_pandas()
    cents = _matrix(first[vec_col])
    if len(cents) == 0:
        raise ValueError("kmeans on an empty dataset")
    history: list[float] = []

    for _ in range(iters):
        ref = ray.put(cents)

        def partial(batch: pd.DataFrame, _ref=ref) -> pd.DataFrame:
            C = ray.get(_ref)
            mat = _matrix(batch[vec_col])
            if mat.size == 0:
                return pd.DataFrame({"cluster": pd.Series(dtype="int64"),
                                     "dim": pd.Series(dtype="int64"),
                                     "s": pd.Series(dtype="float64"),
                                     "c": pd.Series(dtype="int64"),
                                     "inertia": pd.Series(dtype="float64")})
            # ||x-c||² = ||x||² - 2x·c + ||c||²; argmin over c
            d2 = (np.einsum("ij,ij->i", mat, mat)[:, None]
                  - 2.0 * (mat @ C.T)
                  + np.einsum("ij,ij->i", C, C)[None, :])
            a = d2.argmin(axis=1)
            inertia = float(np.maximum(d2[np.arange(len(mat)), a], 0).sum())
            dims = mat.shape[1]
            sums = np.zeros((len(C), dims), dtype=np.float64)
            np.add.at(sums, a, mat)
            counts = np.bincount(a, minlength=len(C))
            out = pd.DataFrame({
                "cluster": np.repeat(np.arange(len(C), dtype=np.int64),
                                     dims),
                "dim": np.tile(np.arange(dims, dtype=np.int64), len(C)),
                "s": sums.ravel(),
                "c": np.repeat(counts.astype(np.int64), dims),
                "inertia": np.zeros(len(C) * dims)})
            out.loc[0, "inertia"] = inertia
            return out

        parts = emb_ds.map_batches(partial, batch_format="pandas",
                                   batch_size=4096).to_pandas()
        history.append(float(parts["inertia"].sum()))
        agg = parts.groupby(["cluster", "dim"], sort=True).agg(
            s=("s", "sum"), c=("c", "sum")).reset_index()
        grid = agg.pivot(index="cluster", columns="dim")
        sums = grid["s"].to_numpy(np.float64)
        counts = grid["c"].to_numpy(np.int64)[:, 0]
        nonempty = counts > 0
        cents = cents.copy()
        cents[nonempty] = sums[nonempty] / counts[nonempty, None]

    final_ref = ray.put(cents)

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        C = ray.get(final_ref)
        mat = _matrix(batch[vec_col])
        if mat.size == 0:
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "cluster": pd.Series(dtype="int64")})
        d2 = (np.einsum("ij,ij->i", mat, mat)[:, None]
              - 2.0 * (mat @ C.T)
              + np.einsum("ij,ij->i", C, C)[None, :])
        return pd.DataFrame({
            id_col: batch[id_col].astype("int64").to_numpy(),
            "cluster": d2.argmin(axis=1).astype(np.int64)})

    assign_ds = emb_ds.map_batches(assign, batch_format="pandas",
                                   batch_size=4096)
    return assign_ds, history
