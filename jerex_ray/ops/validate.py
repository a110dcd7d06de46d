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


def benford_digits(ds, col: str, *, scale: int = 100,
                   num_partitions: int | None = None) -> pd.DataFrame:
    """First-significant-digit distribution vs Benford's law — the
    classic bulk-numeric data-quality probe (Benford '38; Nigrini's
    audit usage). The digit is taken from the EXACT integer rendering
    of round(value·scale) (fixed-point money), never from log10 —
    float log at power-of-ten boundaries is the one place two engines
    can round a digit differently. One combiner pass; 9-row result."""
    from jerex_ray.functions.aggregate import grouped_aggregate

    def digits(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].to_numpy(np.float64)
        v = v[np.isfinite(v) & (v > 0)]
        if not len(v):
            return pd.DataFrame({"digit": pd.Series(dtype="int64"),
                                 "c": pd.Series(dtype="int64")})
        ints = np.rint(v * scale).astype(np.int64)
        d = pd.Series(ints.astype(str)).str[0].astype(np.int64)
        g = d.value_counts()
        return pd.DataFrame({"digit": g.index.to_numpy(np.int64),
                             "c": g.to_numpy(np.int64)})

    out = grouped_aggregate(
        ds.map_batches(digits, batch_format="pandas", batch_size=8192),
        ["digit"], {"n": ("c", "sum")},
        num_partitions=num_partitions).to_pandas()
    if out.empty or "digit" not in out.columns:
        return pd.DataFrame({"digit": pd.Series(dtype="int64"),
                             "n": pd.Series(dtype="int64"),
                             "share": pd.Series(dtype="float64"),
                             "benford_p": pd.Series(dtype="float64")})
    out["n"] = out["n"].astype("int64")
    out["digit"] = out["digit"].astype("int64")
    total = int(out["n"].sum())
    out["share"] = (out["n"] / total).round(6)
    out["benford_p"] = np.log10(
        1.0 + 1.0 / out["digit"].to_numpy(np.float64)).round(6)
    return out.sort_values("digit").reset_index(drop=True)


def profile_columns(ds, cols: list[str],
                    num_partitions: int | None = None) -> pd.DataFrame:
    """Schema-profiling pass: per column, row count, exact distinct
    count, and min/max (rendered as strings; int/str columns render
    injectively — floats belong in the moments/quantile operators).
    ONE explode to (column, value) rows + ONE shuffle serves every
    column: the distinct table per column is what min/max and the
    distinct count both read."""
    from jerex_ray.functions.aggregate import grouped_aggregate

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for c in cols:
            frames.append(pd.DataFrame({
                "column": c,
                "val": df[c].astype(str).to_numpy(),
                "c": np.int64(1)}))
        return pd.concat(frames, ignore_index=True)

    dv = grouped_aggregate(
        ds.map_batches(explode, batch_format="pandas", batch_size=8192),
        ["column", "val"], {"n": ("c", "sum")},
        num_partitions=num_partitions)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"column": pd.Series(dtype="object"),
                                 "n": pd.Series(dtype="int64"),
                                 "n_distinct": pd.Series(dtype="int64"),
                                 "min_val": pd.Series(dtype="object"),
                                 "max_val": pd.Series(dtype="object")})
        g = df.groupby("column", sort=False)
        return pd.DataFrame({
            "column": g.size().index.to_numpy(),
            "n": g["n"].sum().to_numpy(np.int64),
            "n_distinct": g.size().to_numpy(np.int64),
            "min_val": g["val"].min().to_numpy(),
            "max_val": g["val"].max().to_numpy()})

    parts = dv.map_batches(fold, batch_format="pandas",
                           batch_size=None).to_pandas()
    if parts.empty:
        return parts
    g = parts.groupby("column", sort=False)
    out = pd.DataFrame({
        "column": g.size().index.to_numpy(),
        "n": g["n"].sum().to_numpy(np.int64),
        "n_distinct": g["n_distinct"].sum().to_numpy(np.int64),
        "min_val": g["min_val"].min().to_numpy(),
        "max_val": g["max_val"].max().to_numpy()})
    return out.sort_values("column").reset_index(drop=True)
