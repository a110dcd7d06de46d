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


def grouped_quantiles(ds, key: str, col: str, qs: list[float], *,
                      sample_size: int = 8192,
                      seed: int = 17) -> pd.DataFrame:
    """Exact type-7 quantiles of ``col`` PER ``key`` group, in the same
    three shuffle-free passes as ``distributed_quantiles`` — every
    group rides the same pass, so the pass count stays three no matter
    how many groups there are (vs. one full scan per group if the
    scalar operator were looped).

    Per-pass state is (groups × pivots) rank counts and (groups ×
    brackets) interiors — both tiny for categorical keys. NaN values
    are ignored per group (``quantile_cont`` NULL semantics). Returns a
    DataFrame (key, q, value) sorted by (key, q)."""
    def valid_counts(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch[col].to_numpy(dtype=np.float64)
        g = batch[key]
        ok = ~np.isnan(v)
        out = pd.DataFrame({key: g[ok]}).groupby(key, sort=False) \
            .size().reset_index(name="n")
        out["rows"] = 0
        return pd.concat(
            [out, pd.DataFrame({key: [None], "n": [0],
                                "rows": [len(batch)]})], ignore_index=True)

    counts = ds.map_batches(valid_counts, batch_format="pandas",
                            batch_size=65536).to_pandas()
    total_rows = int(counts["rows"].sum())
    n_by = counts[counts[key].notna()].groupby(key)["n"].sum()
    groups = sorted(n_by.index)
    if not groups:
        return pd.DataFrame({key: [], "q": [], "value": []})

    # pass 1: per-group pivot grids from one shared sample
    frac = min(1.0, sample_size / max(total_rows, 1))
    sample = ds.random_sample(frac, seed=seed).to_pandas()
    pivots = {}
    for g in groups:
        sub = sample.loc[sample[key] == g, col].dropna() \
            if len(sample) else pd.Series(dtype=np.float64)
        pivots[g] = np.unique(sub.to_numpy(dtype=np.float64))
    piv_ref = ray.put(pivots)

    # pass 2: per-(group, pivot) exact global rank counts
    def rank_counts(batch: pd.DataFrame) -> pd.DataFrame:
        pv = ray.get(piv_ref)
        frames = []
        for g, sub in batch.groupby(key, sort=False):
            p = pv.get(g)
            if p is None or not p.size:
                continue
            v = sub[col].to_numpy(dtype=np.float64)
            v = np.sort(v[~np.isnan(v)])
            frames.append(pd.DataFrame({
                key: g, "idx": np.arange(p.size),
                "lt": np.searchsorted(v, p, "left").astype(np.int64),
                "le": np.searchsorted(v, p, "right").astype(np.int64)}))
        if not frames:
            return pd.DataFrame({key: pd.Series(dtype="object"),
                                 "idx": pd.Series(dtype="int64"),
                                 "lt": pd.Series(dtype="int64"),
                                 "le": pd.Series(dtype="int64")})
        return pd.concat(frames, ignore_index=True)

    parts = ds.map_batches(rank_counts, batch_format="pandas",
                           batch_size=65536).to_pandas()
    resolved: dict[tuple, float] = {}
    brackets: dict[tuple, tuple[float, float]] = {}
    ranks = {g: _type7_positions(int(n_by[g]), qs) for g in groups}
    cnts = {}
    for g in groups:
        p = pivots[g]
        if p.size and len(parts):
            agg = parts[parts[key] == g].groupby("idx")[["lt", "le"]] \
                .sum().sort_index()
            cnt_lt, cnt_le = agg["lt"].to_numpy(), agg["le"].to_numpy()
        else:
            cnt_lt = cnt_le = np.empty(0, dtype=np.int64)
        cnts[g] = (cnt_lt, cnt_le)
        for r in sorted({r for lo, hi, _ in ranks[g] for r in (lo, hi)}):
            j = np.searchsorted(cnt_le, r, "right") if p.size else 0
            if j < p.size and cnt_lt[j] <= r:
                resolved[(g, r)] = float(p[j])
            else:
                brackets[(g, r)] = (float(p[j - 1]) if j > 0 else -np.inf,
                                    float(p[j]) if j < p.size else np.inf)

    if brackets:
        by_group: dict = {}
        for (g, r), iv in brackets.items():
            by_group.setdefault(g, set()).add(iv)
        br_ref = ray.put({g: sorted(v) for g, v in by_group.items()})

        def in_brackets(batch: pd.DataFrame) -> pd.DataFrame:
            bv = ray.get(br_ref)
            frames = []
            for g, sub in batch.groupby(key, sort=False):
                ivs = bv.get(g)
                if not ivs:
                    continue
                vs = sub[col].to_numpy(dtype=np.float64)
                keep = np.zeros(vs.size, dtype=bool)
                for lo_v, hi_v in ivs:
                    keep |= (vs > lo_v) & (vs < hi_v)
                frames.append(pd.DataFrame({key: g, col: vs[keep]}))
            if not frames:
                return pd.DataFrame({key: pd.Series(dtype="object"),
                                     col: pd.Series(dtype="float64")})
            return pd.concat(frames, ignore_index=True)

        inside = ds.map_batches(in_brackets, batch_format="pandas",
                                batch_size=65536).to_pandas()
        for (g, r), (lo_v, hi_v) in brackets.items():
            p = pivots[g]
            cnt_lt, cnt_le = cnts[g]
            base = int(cnt_le[np.searchsorted(p, lo_v)]) \
                if np.isfinite(lo_v) else 0
            sub = inside[inside[key] == g][col].to_numpy(np.float64) \
                if len(inside) else np.empty(0)
            seg = np.sort(sub[(sub > lo_v) & (sub < hi_v)])
            resolved[(g, r)] = float(seg[r - base])

    rows = []
    for g in groups:
        for q, (lo, hi, f) in zip(qs, ranks[g]):
            v_lo, v_hi = resolved[(g, lo)], resolved[(g, hi)]
            rows.append((g, q, v_lo + (v_hi - v_lo) * f))
    return pd.DataFrame(rows, columns=[key, "q", "value"])


def grouped_quantile_buckets(ds, key: str, col: str,
                             qs: list[float] | None = None, *,
                             decimals: int = 6):
    """Assign every row its per-group quantile bucket (1..len(qs)+1) —
    the scale-safe NTILE analogue: boundaries come from ONE
    ``grouped_quantiles`` pass (value-based, deterministic under ties,
    unlike row-rank NTILE), broadcast once, and the corpus streams
    through a single vectorized searchsorted. Boundaries are rounded
    to ``decimals`` on BOTH engine and oracle sides so the comparison
    is reproducible across interpolation ULPs. Returns a Dataset."""
    import ray

    qs = qs or [0.25, 0.5, 0.75]
    bounds = grouped_quantiles(ds, key, col, qs)
    table = {g: np.sort(sub["value"].to_numpy(np.float64).round(decimals))
             for g, sub in bounds.groupby(key)}
    ref = ray.put(table)

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        t = ray.get(ref)
        out = batch.copy()
        vals = batch[col].to_numpy(np.float64)
        bucket = np.ones(len(batch), dtype=np.int64)
        for g, idx in batch.groupby(key).indices.items():
            b = t.get(g)
            if b is None:
                continue
            # bucket = 1 + number of boundaries strictly below value
            # (value <= b_k -> bucket k+1), i.e. searchsorted left
            bucket[idx] = 1 + np.searchsorted(b, vals[idx], side="left")
        out["bucket"] = bucket
        return out

    return ds.map_batches(assign, batch_format="pandas",
                          batch_size=65536)


def approx_quantiles_histogram(ds, col: str, qs: list[float], *,
                               nbins: int = 2048,
                               num_partitions: int | None = None):
    """Approximate quantiles from a fixed uniform histogram — the
    mergeable one-number-per-bin sketch (the equi-width tier of
    Greenwald-Khanna-style summaries; what query engines use for
    NDV-cheap percentile estimates). Two passes, both combiner-shaped:
    global (min, max, n), then bin counts (grid-bounded regardless of
    corpus size; bin partials are ADDITIVE, so shards merge by
    summing). The driver walks the cumulative histogram and answers
    each quantile with the bin's upper edge, giving the deterministic
    guarantee |approx − v_(⌊q(n−1)⌋)| ≤ (max − min)/nbins against the
    rank-floor order statistic (pytest-gated against the exact
    selector). NaNs are ignored, matching ``distributed_quantiles``."""
    from jerex_ray.functions.aggregate import grouped_aggregate

    stats = grouped_aggregate(
        ds.map_batches(lambda df: pd.DataFrame({
            "__all": [0],
            "mn": [float(np.nanmin(df[col].to_numpy(np.float64)))
                   if df[col].notna().any() else np.inf],
            "mx": [float(np.nanmax(df[col].to_numpy(np.float64)))
                   if df[col].notna().any() else -np.inf],
            "n": [int(df[col].notna().sum())]}),
            batch_format="pandas", batch_size=65536),
        ["__all"], {"mn": ("mn", "min"), "mx": ("mx", "max"),
                    "n": ("n", "sum")},
        num_partitions=num_partitions).to_pandas()
    if stats.empty or int(stats["n"].iloc[0]) == 0:
        return [float("nan")] * len(qs)
    lo, hi = float(stats["mn"].iloc[0]), float(stats["mx"].iloc[0])
    n = int(stats["n"].iloc[0])
    if hi == lo:
        return [lo] * len(qs)
    width = (hi - lo) / nbins

    def bin_counts(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].to_numpy(np.float64)
        v = v[~np.isnan(v)]
        b = np.minimum(((v - lo) / width).astype(np.int64), nbins - 1)
        g = pd.Series(b).value_counts()
        return pd.DataFrame({"bin": g.index.to_numpy(np.int64),
                             "c": g.to_numpy(np.int64)})

    counts = grouped_aggregate(
        ds.map_batches(bin_counts, batch_format="pandas",
                       batch_size=65536),
        ["bin"], {"c": ("c", "sum")},
        num_partitions=num_partitions).to_pandas()
    full = np.zeros(nbins, dtype=np.int64)
    full[counts["bin"].to_numpy(np.int64)] = counts["c"].to_numpy(
        np.int64)
    cum = np.cumsum(full)
    out = []
    for q in qs:
        rank = q * (n - 1)  # type-7 target rank
        b = int(np.searchsorted(cum, np.floor(rank) + 1, side="left"))
        out.append(lo + (min(b, nbins - 1) + 1) * width)
    return out
