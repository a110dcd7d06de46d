"""Distributed model-evaluation metrics over (score, label) columns.

``auc_mann_whitney``: exact ROC-AUC via the Mann-Whitney rank-sum
identity (Mann & Whitney '47; Hanley & McNeil '82 for the
AUC = U / (n_pos · n_neg) equivalence) with midrank tie handling —
the standard eval for a bounded-vocabulary score (a quantile bucket,
an integer feature, a discretized model score).

Scale shape: ONE combiner pass reduces the corpus to per-distinct-
score (n_pos, n_neg) counts — the only state is score-vocabulary-
bounded (the caller's contract: discretize first; a raw float score
column should be bucketed upstream, exactly like the histogram
sketch). The rank-sum then closes on the driver over the tiny counts
table with INTEGER arithmetic only: ties contribute half-ranks, so
everything is carried as 2·U to stay integer-exact, and the single
float divide at the end is bit-reproducible on any engine.
"""
from __future__ import annotations

import numpy as np
import pandas as pd


def auc_mann_whitney(pairs_ds, *, score_col: str = "s",
                     pos_col: str = "pos",
                     num_partitions: int | None = None) -> pd.DataFrame:
    """``pairs_ds`` rows carry an integer score and a 0/1 label.
    Returns ONE row (n_pos, n_neg, u2, auc): u2 = 2·U where
    U = Σ_v n_pos(v) · (n_neg_below(v) + n_neg_at(v)/2) — the
    probability a random positive outscores a random negative, ties
    counting half. AUC is the one float divide u2 / (2·n_pos·n_neg)."""
    from jerex_ray.functions.aggregate import grouped_aggregate

    g = grouped_aggregate(
        pairs_ds, [score_col],
        {"np_": (pos_col, "sum"), "n": (None, "count")},
        num_partitions=num_partitions).to_pandas()
    if g.empty or score_col not in g.columns:
        return pd.DataFrame([{"n_pos": 0, "n_neg": 0, "u2": 0,
                              "auc": 0.0}])
    g = g.sort_values(score_col).reset_index(drop=True)
    npos = g["np_"].to_numpy(np.int64)
    nneg = g["n"].to_numpy(np.int64) - npos
    cum_below = np.concatenate([[0], np.cumsum(nneg)[:-1]])
    u2 = int((npos * (2 * cum_below + nneg)).sum())
    tp, tn = int(npos.sum()), int(nneg.sum())
    auc = u2 / (2.0 * tp * tn) if tp and tn else 0.0
    return pd.DataFrame([{"n_pos": tp, "n_neg": tn, "u2": u2,
                          "auc": auc}])
