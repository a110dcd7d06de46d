"""Distributed logistic regression by full-batch gradient descent —
the fasttext-style quality/language classifier shape for corpus
filtering (Joulin et al. '16 train a linear classifier over text
features; CCNet and the Llama data pipeline filter with exactly this
kind of model).

Dataflow: every epoch is ONE streaming pass — the current weight
vector rides the object store (``ray.put``, read per task, never
re-shipped per batch), each batch emits a (d+2)-float partial row
(gradient components, log-loss sum, count) from one matmul, and the
driver adds block partials and takes the step. Nothing row-sized ever
reaches the driver; epochs × one-pass is the exact cost. Full-batch
GD (not SGD) keeps the run bit-deterministic under any block order —
partials are added driver-side in block order, but the float sums are
order-robust at 6-decimal oracle tolerance.

Features come from ``textstats.quality_stats`` (punct ratio, mean
token length, stopword ratio) so the SQL oracle can recompute them
exactly; the label is the document's ``lang`` column (English vs
rest). The two-epoch gradient is SQL-oracled (the oracle replays
w₀ = 0 → g₀ → w₁ → g₁ in chained CTEs); convergence and a
finite-difference gradient check are pytest-gated.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

FEATURES = ["punct_ratio", "mean_token_len", "stopword_ratio"]


def _prep(batch: pd.DataFrame) -> pd.DataFrame:
    from jerex_ray.ops.textstats import quality_stats
    q = quality_stats(batch)
    out = q[["doc_id"] + FEATURES].copy()
    out["y"] = (batch["lang"].to_numpy() == "en").astype(np.float64)
    return out


def feature_table(docs_ds):
    """(doc_id, x…, y) feature Dataset — one vectorized pass."""
    return docs_ds.map_batches(_prep, batch_format="pandas",
                               batch_size=8192)


def _design(df: pd.DataFrame):
    X = np.column_stack([np.ones(len(df))]
                        + [df[c].to_numpy(np.float64) for c in FEATURES])
    return X, df["y"].to_numpy(np.float64)


def _sigmoid(z: np.ndarray) -> np.ndarray:
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    e = np.exp(z[~pos])
    out[~pos] = e / (1.0 + e)
    return out


def epoch_pass(feats_ds, w: np.ndarray):
    """One full-batch pass: mean gradient, mean log-loss, n."""
    import ray
    ref = ray.put(np.asarray(w, np.float64))
    d = len(w)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({f"g{j}": [0.0] for j in range(d)}
                                | {"loss": [0.0], "n": [0]})
        X, y = _design(df)
        p = _sigmoid(X @ ray.get(ref))
        g = X.T @ (p - y)
        eps = 1e-12
        loss = -(y * np.log(p + eps)
                 + (1 - y) * np.log(1 - p + eps)).sum()
        row = {f"g{j}": [g[j]] for j in range(d)}
        row["loss"] = [loss]
        row["n"] = [len(df)]
        return pd.DataFrame(row)

    parts = feats_ds.map_batches(partial,
                                 batch_format="pandas").to_pandas()
    # an all-empty Dataset surfaces schema-less (known Ray edge)
    n = int(parts["n"].sum()) if "n" in parts.columns else 0
    if n == 0:
        return np.zeros(d), 0.0, 0
    grad = np.array([parts[f"g{j}"].sum() for j in range(d)]) / n
    return grad, float(parts["loss"].sum()) / n, n


def train_logreg(feats_ds, *, epochs: int = 30, lr: float = 2.0):
    """Full-batch GD from w=0. The feature Dataset is materialized
    once (epochs re-stream the same blocks — no re-read, no
    re-tokenize). Returns (w, history DataFrame[epoch, loss, grad_norm])."""
    feats = feats_ds.materialize()
    w = np.zeros(1 + len(FEATURES))
    hist = []
    for e in range(epochs):
        grad, loss, n = epoch_pass(feats, w)
        hist.append((e, loss, float(np.linalg.norm(grad))))
        w = w - lr * grad
    return w, pd.DataFrame(hist, columns=["epoch", "loss", "grad_norm"])


def accuracy(feats_ds, w: np.ndarray) -> float:
    """Streaming training accuracy at weights ``w``."""
    import ray
    ref = ray.put(np.asarray(w, np.float64))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"ok": [0], "n": [0]})
        X, y = _design(df)
        pred = (X @ ray.get(ref)) > 0
        return pd.DataFrame({"ok": [int((pred == (y > 0.5)).sum())],
                             "n": [len(df)]})

    parts = feats_ds.map_batches(partial,
                                 batch_format="pandas").to_pandas()
    n = int(parts["n"].sum()) if "n" in parts.columns else 0
    return float(parts["ok"].sum()) / n if n else 0.0


def standardize(feats_ds):
    """Z-score the feature columns from ONE streaming moments pass
    (per-block n/Σx/Σx² partials, driver closes μ and σ, broadcast
    scale pass) — the conditioning step that makes fixed-lr GD stable
    regardless of raw feature magnitudes. Returns (scaled_ds, mu, sd);
    zero-variance features scale by 1 (stay centered)."""
    import ray

    def mom(df: pd.DataFrame) -> pd.DataFrame:
        row = {"n": [len(df)]}
        for c in FEATURES:
            x = df[c].to_numpy(np.float64) if len(df) else \
                np.zeros(0, np.float64)
            row[f"s_{c}"] = [x.sum()]
            row[f"q_{c}"] = [(x * x).sum()]
        return pd.DataFrame(row)

    parts = feats_ds.map_batches(mom, batch_format="pandas").to_pandas()
    n = max(int(parts["n"].sum()), 1)
    mu = np.array([parts[f"s_{c}"].sum() / n for c in FEATURES])
    var = np.array([parts[f"q_{c}"].sum() / n for c in FEATURES]) \
        - mu ** 2
    sd = np.sqrt(np.maximum(var, 0.0))
    sd = np.where(sd < 1e-12, 1.0, sd)
    ref = ray.put((mu, sd))

    def scale(df: pd.DataFrame) -> pd.DataFrame:
        m, s = ray.get(ref)
        df = df.copy()
        for j, c in enumerate(FEATURES):
            df[c] = (df[c].to_numpy(np.float64) - m[j]) / s[j]
        return df

    return (feats_ds.map_batches(scale, batch_format="pandas"),
            mu, sd)
