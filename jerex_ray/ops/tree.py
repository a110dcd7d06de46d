"""Histogram-based decision-stump split finding — the inner primitive
of gradient-boosted trees (LightGBM/XGBoost histogram method: Ke et
al. '17 §2.1, Chen & Guestrin '16 §3.3) and of CART root splits.

Given a numeric feature and a binary label, find the threshold t
maximizing the Gini gain of the partition x ≤ t | x > t.

Dataflow, scale-shaped: ONE combiner pass reduces the corpus to a
per-distinct-value histogram ``(value, n, pos)`` — the classic
histogram trick: the driver-side candidate scan is bounded by the
FEATURE GRID (here the 2-decimal value lattice), never by row count;
a continuous feature at 100 TB gets quantile-BUCKETED first (see
``ops/quantiles``) so the grid stays bounded. Prefix sums + the
vectorized gain scan run on the grid only.

Parity-by-construction: histogram counts are exact integers; the gain
expression is sequenced IDENTICALLY here and in the SQL oracle
(explicit x*x, same subtraction order), so every candidate's gain is
bit-identical IEEE double in both engines and the argmax (gain DESC,
value ASC) cannot flip. Output rounds to 6 decimals for display only.

The reference has no tree learners (SURVEY.md §2.7); engine extension
for the LLM-data charter.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_EMPTY = pd.DataFrame({
    "threshold": pd.Series(dtype="float64"),
    "gain": pd.Series(dtype="float64"),
    "gini_parent": pd.Series(dtype="float64"),
    "n_left": pd.Series(dtype="int64"),
    "n_right": pd.Series(dtype="int64"),
    "pos_left": pd.Series(dtype="int64"),
    "pos_right": pd.Series(dtype="int64"),
})


def best_stump_split(ds, *, feature: str, label_fn,
                     num_partitions: int | None = None) -> pd.DataFrame:
    """Best binary split of ``feature`` for the 0/1 label produced by
    ``label_fn(batch) -> np.ndarray``; returns a one-row frame
    (threshold, gain, gini_parent, n_left, n_right, pos_left,
    pos_right). Candidates are "x <= v" for every distinct value v
    with a non-empty right side."""
    from jerex_ray.functions.aggregate import grouped_aggregate

    def partials(batch: pd.DataFrame) -> pd.DataFrame:
        y = np.asarray(label_fn(batch), dtype=np.int64)
        v = batch[feature].to_numpy(np.float64)
        g = (pd.DataFrame({"v": v, "y": y})
             .groupby("v", sort=False)["y"].agg(["count", "sum"])
             .reset_index())
        return pd.DataFrame({"v": g["v"], "n": g["count"].astype(np.int64),
                             "pos": g["sum"].astype(np.int64)})

    hist = grouped_aggregate(
        ds.map_batches(partials, batch_format="pandas", batch_size=8192),
        ["v"], {"n": ("n", "sum"), "pos": ("pos", "sum")},
        num_partitions=num_partitions).to_pandas()
    if hist.empty or "v" not in hist.columns:
        return _EMPTY.copy()
    hist = hist.sort_values("v").reset_index(drop=True)
    n_tot = float(hist["n"].sum())
    pos_tot = float(hist["pos"].sum())

    def gini(pos: np.ndarray, n: np.ndarray) -> np.ndarray:
        # identical expression tree to the SQL oracle: explicit x*x,
        # 1 - a - b subtraction order
        p = pos / n
        q = (n - pos) / n
        return 1.0 - p * p - q * q

    gp = float(gini(np.array([pos_tot]), np.array([n_tot]))[0])
    nl = np.cumsum(hist["n"].to_numpy(np.float64))
    posl = np.cumsum(hist["pos"].to_numpy(np.float64))
    keep = nl < n_tot                     # right side must be non-empty
    v = hist["v"].to_numpy(np.float64)[keep]
    nl, posl = nl[keep], posl[keep]
    if v.size == 0:
        return _EMPTY.copy()
    nr, posr = n_tot - nl, pos_tot - posl
    gain = gp - (nl / n_tot) * gini(posl, nl) \
        - (nr / n_tot) * gini(posr, nr)
    best = np.lexsort((v, -gain))[0]      # gain DESC, value ASC
    return pd.DataFrame({
        "threshold": [v[best]],
        "gain": [round(float(gain[best]), 6)],
        "gini_parent": [round(gp, 6)],
        "n_left": [np.int64(nl[best])],
        "n_right": [np.int64(nr[best])],
        "pos_left": [np.int64(posl[best])],
        "pos_right": [np.int64(posr[best])]})


def _hist_best_split(hist: pd.DataFrame, feat_cols: list[str]):
    """Best (gain DESC, feature ASC, threshold ASC) split of a joint
    label histogram (columns ``feat_cols`` + n + pos). Returns
    (feature, threshold, gain, nl, posl, nr, posr) or None. The gain
    expression tree matches ``best_stump_split`` (and the SQL oracle)
    term for term."""
    n_tot = float(hist["n"].sum())
    pos_tot = float(hist["pos"].sum())
    if n_tot == 0:
        return None

    def gini(pos, n):
        p = pos / n
        q = (n - pos) / n
        return 1.0 - p * p - q * q

    gp = float(gini(np.array([pos_tot]), np.array([n_tot]))[0])
    best = None
    for f in sorted(feat_cols):
        a = hist.groupby(f, sort=True)[["n", "pos"]].sum() \
            .reset_index()
        nl = np.cumsum(a["n"].to_numpy(np.float64))
        posl = np.cumsum(a["pos"].to_numpy(np.float64))
        keep = nl < n_tot
        v = a[f].to_numpy(np.float64)[keep]
        nl, posl = nl[keep], posl[keep]
        if v.size == 0:
            continue
        nr, posr = n_tot - nl, pos_tot - posl
        gain = gp - (nl / n_tot) * gini(posl, nl) \
            - (nr / n_tot) * gini(posr, nr)
        for i in range(len(v)):
            cand = (-gain[i], f, v[i], nl[i], posl[i], nr[i],
                    posr[i])
            if best is None or cand[:3] < best[:3]:
                best = cand
    if best is None:
        return None
    g, f, thr, nl, posl, nr, posr = (-best[0], best[1], best[2],
                                     best[3], best[4], best[5],
                                     best[6])
    return (f, float(thr), float(g), int(nl), int(posl), int(nr),
            int(posr))


def depth2_tree_from_hist(hist: pd.DataFrame,
                          feat_cols: list[str]) -> pd.DataFrame:
    """Greedy depth-2 CART tree (Breiman et al. '84) from ONE joint
    (features × label) histogram: because every candidate split of
    every node is a marginal of the same table, the root AND both
    children come from a single combiner pass — the histogram-method
    GBDT trick one level deeper than ``best_stump_split``. Pick rule
    (gain DESC, feature ASC, threshold ASC) is bit-stable: counts
    are exact integers and the gain expression is sequenced
    identically to the SQL oracle. Returns rows (node, feature,
    threshold, gain, n, pos, gini)."""
    def gini_s(pos: float, n: float) -> float:
        p = pos / n
        q = (n - pos) / n
        return 1.0 - p * p - q * q

    rows = []

    def emit(node: str, h: pd.DataFrame):
        n = int(h["n"].sum())
        pos = int(h["pos"].sum())
        g = gini_s(float(pos), float(n)) if n else 0.0
        b = _hist_best_split(h, feat_cols) if n else None
        if b is None:
            rows.append((node, "none", 0.0, 0.0, n, pos,
                         round(g, 6)))
            return None
        f, thr, gain, *_ = b
        rows.append((node, f, thr, round(gain, 6), n, pos,
                     round(g, 6)))
        return f, thr

    root = emit("root", hist)
    if root is not None:
        f, thr = root
        left = hist[hist[f].to_numpy(np.float64) <= thr]
        right = hist[hist[f].to_numpy(np.float64) > thr]
        emit("left", left)
        emit("right", right)
    out = pd.DataFrame(rows, columns=["node", "feature", "threshold",
                                      "gain", "n", "pos", "gini"])
    return out.astype({"n": "int64", "pos": "int64"})
