"""Exact distributed quantiles by pivot-grid selection.

Ray Data has no exact-quantile operator and a full ``sort`` is an
all-to-all shuffle just to read a handful of order statistics. This
operator computes EXACT interpolated quantiles (type-7 / numpy /
DuckDB ``quantile_cont`` convention) in three cheap passes, none of
which shuffles:

1. sample ~``sample_size`` values (one pass) → a pivot grid;
2. one vectorized counting pass: per batch, ``np.searchsorted`` of the
   batch against the pivot grid on both sides → global
   ``count(< p)`` / ``count(<= p)`` per pivot (a tiny combiner
   aggregate). Each target rank is now either resolved exactly (it
   falls inside a pivot's duplicate run) or bracketed between two
   adjacent pivots;
3. one filtered collect of the values strictly inside the unresolved
   brackets (expected ≈ n / sample_size rows per bracket) → exact
   order statistics by local sort.

Wall-clock is three streaming passes; driver memory is pivots +
bracket contents. A skew-degenerate bracket (mass of duplicates)
costs nothing extra — duplicate runs resolve in step 2.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray


def _type7_positions(n: int, qs: list[float]) -> list[tuple[int, int, float]]:
    """(lo_rank, hi_rank, fraction) per quantile, 0-indexed ranks."""
    out = []
    for q in qs:
        pos = q * (n - 1)
        lo = int(np.floor(pos))
        hi = int(np.ceil(pos))
        out.append((lo, hi, pos - lo))
    return out


def distributed_quantiles(ds, col: str, qs: list[float], *,
                          sample_size: int = 8192,
                          seed: int = 17) -> list[float]:
    """Exact type-7 quantiles of ``ds[col]`` (see module docstring).
    NaN/NULL values are ignored, matching DuckDB ``quantile_cont`` —
    they would otherwise break the sorted-rank invariants."""
    def _count_valid(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch[col].to_numpy(dtype=np.float64)
        return pd.DataFrame({"n": [int(np.count_nonzero(~np.isnan(v)))],
                             "rows": [len(batch)]})

    counts = ds.map_batches(_count_valid, batch_format="pandas",
                            batch_size=65536).to_pandas()
    n = int(counts["n"].sum())
    total_rows = int(counts["rows"].sum())
    if n == 0:
        return [float("nan")] * len(qs)

    # pass 1: pivot grid from a sample. The fraction is sized by TOTAL
    # rows (random_sample draws from all rows): scaling by the
    # NaN-excluded count would collect a huge share of a NaN-sparse
    # dataset to the driver; fewer valid pivots merely widens the
    # pass-3 brackets, which the small valid count bounds anyway
    frac = min(1.0, sample_size / max(total_rows, 1))
    sample = ds.random_sample(frac, seed=seed).to_pandas()
    pivots = np.unique(sample[col].dropna().to_numpy(dtype=np.float64)) \
        if len(sample) else np.empty(0)

    # pass 2: exact global ranks of every pivot (vectorized per batch)
    piv_ref = ray.put(pivots)

    def rank_counts(batch: pd.DataFrame) -> pd.DataFrame:
        p = ray.get(piv_ref)
        v = batch[col].to_numpy(dtype=np.float64)
        v = np.sort(v[~np.isnan(v)])
        lt = np.searchsorted(v, p, side="left")
        le = np.searchsorted(v, p, side="right")
        return pd.DataFrame({"idx": np.arange(p.size),
                             "lt": lt.astype(np.int64),
                             "le": le.astype(np.int64)})

    parts = ds.map_batches(rank_counts, batch_format="pandas",
                           batch_size=65536).to_pandas()
    if pivots.size:
        agg = parts.groupby("idx").sum().sort_index()
        cnt_lt = agg["lt"].to_numpy()
        cnt_le = agg["le"].to_numpy()
    else:
        cnt_lt = cnt_le = np.empty(0, dtype=np.int64)

    # resolve each needed rank: exact on a duplicate run, else bracket
    needed = sorted({r for lo, hi, _ in _type7_positions(n, qs)
                     for r in (lo, hi)})
    resolved: dict[int, float] = {}
    brackets: dict[int, tuple[float, float]] = {}
    for r in needed:
        j = np.searchsorted(cnt_le, r, side="right") if pivots.size else 0
        # pivots[j] is the first pivot with cnt_le > r
        if j < pivots.size and cnt_lt[j] <= r:
            resolved[r] = float(pivots[j])
        else:
            lo_v = float(pivots[j - 1]) if j > 0 else -np.inf
            hi_v = float(pivots[j]) if j < pivots.size else np.inf
            brackets[r] = (lo_v, hi_v)

    if brackets:
        # pass 3: collect bracket interiors only
        iv = sorted(set(brackets.values()))
        iv_ref = ray.put(iv)

        def in_brackets(batch: pd.DataFrame) -> pd.DataFrame:
            vs = batch[col].to_numpy(dtype=np.float64)
            keep = np.zeros(vs.size, dtype=bool)
            for lo_v, hi_v in ray.get(iv_ref):
                keep |= (vs > lo_v) & (vs < hi_v)
            return pd.DataFrame({col: vs[keep]})

        inside = ds.map_batches(in_brackets, batch_format="pandas",
                                batch_size=65536).to_pandas()
        vals = np.sort(inside[col].to_numpy(dtype=np.float64)) \
            if len(inside) else np.empty(0)
        for r, (lo_v, hi_v) in brackets.items():
            base = int(cnt_le[np.searchsorted(pivots, lo_v)]) \
                if np.isfinite(lo_v) else 0
            seg = vals[(vals > lo_v) & (vals < hi_v)]
            resolved[r] = float(seg[r - base])

    out = []
    for lo, hi, f in _type7_positions(n, qs):
        v_lo, v_hi = resolved[lo], resolved[hi]
        out.append(v_lo + (v_hi - v_lo) * f)
    return out
