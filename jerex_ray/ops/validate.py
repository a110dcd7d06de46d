"""Data-quality validation and snapshot diffing — the guardrail ops a
production ingest pipeline runs before anything expensive.

``column_expectations`` computes per-column null counts, min/max and
range-violation counts in ONE combiner pass (each batch reduces to a
handful of scalars per column — associative merges, no shuffle).

``snapshot_diff`` compares two corpus versions by key: added / removed
/ changed (same key, different content fingerprint) — the
change-data-capture primitive for incremental reprocessing. Both
sides reduce to (key, fingerprint) and meet in a hash-partitioned
full-outer join; nothing content-sized crosses the wire.

The reference has no validation surface (its parse raises KeyError on
malformed docs, SURVEY.md §1.2); engine extension for the
LLM-data-pipeline charter.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def column_expectations(ds, specs: dict,
                        *, count_col_hint: str | None = None) -> pd.DataFrame:
    """``specs``: {column: (lo, hi) or None}. Returns one row per
    column: (column, n_rows, n_null, vmin, vmax, n_out_of_range) —
    numeric columns only for min/max/range; lo/hi may be None for
    open-ended bounds."""
    cols = list(specs)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        n = len(batch)
        for c in cols:
            s = batch[c]
            null = int(s.isna().sum())
            v = s.dropna().to_numpy()
            numeric = v.dtype.kind in "iuf" and v.size > 0
            vmin = float(v.min()) if numeric else np.nan
            vmax = float(v.max()) if numeric else np.nan
            oor = 0
            bounds = specs[c]
            if bounds is not None and numeric:
                lo, hi = bounds
                bad = np.zeros(v.size, dtype=bool)
                if lo is not None:
                    bad |= v < lo
                if hi is not None:
                    bad |= v > hi
                oor = int(bad.sum())
            rows.append((c, n, null, vmin, vmax, oor))
        return pd.DataFrame(rows, columns=["column", "n_rows", "n_null",
                                           "vmin", "vmax",
                                           "n_out_of_range"])

    parts = ds.map_batches(partial, batch_format="pandas",
                           batch_size=65536).to_pandas()
    if parts.empty:
        return pd.DataFrame({"column": pd.Series(dtype="object"),
                             "n_rows": pd.Series(dtype="int64"),
                             "n_null": pd.Series(dtype="int64"),
                             "vmin": pd.Series(dtype="float64"),
                             "vmax": pd.Series(dtype="float64"),
                             "n_out_of_range": pd.Series(dtype="int64")})
    agg = parts.groupby("column", sort=True).agg(
        n_rows=("n_rows", "sum"), n_null=("n_null", "sum"),
        vmin=("vmin", "min"), vmax=("vmax", "max"),
        n_out_of_range=("n_out_of_range", "sum")).reset_index()
    for c in ("n_rows", "n_null", "n_out_of_range"):
        agg[c] = agg[c].astype("int64")
    return agg


def snapshot_diff(old_ds, new_ds, *, key: str = "doc_id",
                  content_col: str = "text"):
    """(key, status) for every key in either snapshot: ``added`` (new
    only), ``removed`` (old only), ``changed`` (both, different
    normalized-content fingerprint). Unchanged keys are dropped —
    the output is delta-sized, the inputs stream."""
    from jerex_ray.ops.dedup import add_fingerprint

    def fp(batch: pd.DataFrame) -> pd.DataFrame:
        out = add_fingerprint(batch, col=content_col)
        return out[[key, "fp"]]

    old_fp = old_ds.map_batches(fp, batch_format="pandas",
                                batch_size=8192).materialize()
    new_fp = new_ds.map_batches(fp, batch_format="pandas",
                                batch_size=8192).materialize()
    joined = old_fp.join(new_fp, join_type="full_outer",
                         num_partitions=8, on=(key,), right_on=(key,),
                         left_suffix="_old", right_suffix="_new")

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        cols = df.columns
        fp_old = df["fp_old"] if "fp_old" in cols else df["fp"]
        fp_new = df["fp_new"] if "fp_new" in cols else df["fp"]
        old_miss = fp_old.isna()
        new_miss = fp_new.isna()
        status = np.where(old_miss, "added",
                          np.where(new_miss, "removed",
                                   np.where(fp_old != fp_new,
                                            "changed", "unchanged")))
        out = pd.DataFrame({key: df[key].to_numpy(), "status": status})
        return out[out["status"] != "unchanged"]

    return joined.map_batches(classify, batch_format="pandas")
