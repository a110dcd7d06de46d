"""Split of the query registry: ``events_b`` part (mechanically derived from the original queries.py by scripts/split_queries.py; unit order and source text preserved)."""

from __future__ import annotations
import re
import numpy as np
import pandas as pd
from jerex_ray.config import PipelineConfig
from jerex_ray.runtime import configure_data_context
from jerex_ray.pipelines.queries._shared import ORACLE_REGISTRY
from jerex_ray.pipelines.queries._shared import _round_half_away  # noqa: E501

def q_events_psi(sf_dir: str, *, n_buckets: int = 10):
    """Population Stability Index between the reference half
    (event_id % 2 = 0) and the current half of the value stream — the
    standard drift monitor for feature pipelines. Bucket boundaries
    are the reference half's exact type-7 deciles (the shuffle-free
    quantile selection), rounded half-away to 4 dp on BOTH engines so
    every 2-dp value compares identically against them; shares are
    Laplace-smoothed so empty current buckets stay finite.

    Scale shape: three quantile passes + two counting passes, all
    combiner-reduced; only (buckets × 2) counts reach the driver."""
    import ray

    from jerex_ray.ops.quantiles import distributed_quantiles
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "value"])
    ref = ds.map_batches(
        lambda df: df.loc[df["event_id"] % 2 == 0, ["value"]],
        batch_format="pandas")
    qs = [i / n_buckets for i in range(1, n_buckets)]
    pivots = _round_half_away(distributed_quantiles(ref, "value", qs), 4)
    piv_ref = ray.put(np.asarray(pivots, dtype=np.float64))

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        p = ray.get(piv_ref)
        half = (df["event_id"].to_numpy() % 2).astype(np.int64)
        b = np.searchsorted(p, df["value"].to_numpy(np.float64),
                            side="left").astype(np.int64)
        g = pd.DataFrame({"half": half, "bucket": b}) \
            .groupby(["half", "bucket"], as_index=False).size()
        return g.rename(columns={"size": "n"})

    from jerex_ray.functions.aggregate import grouped_aggregate
    c = grouped_aggregate(ds.map_batches(counts, batch_format="pandas"),
                          ["half", "bucket"], {"n": ("n", "sum")}) \
        .to_pandas()
    full = pd.MultiIndex.from_product(
        [[0, 1], range(n_buckets)], names=["half", "bucket"]).to_frame(
        index=False)
    c = full.merge(c, on=["half", "bucket"], how="left").fillna(0)
    piv = c.pivot(index="bucket", columns="half", values="n") \
        .sort_index()
    n0, n1 = float(piv[0].sum()), float(piv[1].sum())
    p = (piv[0].to_numpy(np.float64) + 0.5) / (n0 + 0.5 * n_buckets)
    q = (piv[1].to_numpy(np.float64) + 0.5) / (n1 + 0.5 * n_buckets)
    psi = float(((p - q) * np.log(p / q)).sum())
    return pd.DataFrame({
        "psi": [float(_round_half_away(psi, 6))],
        "n_ref": pd.Series([int(n0)], dtype="int64"),
        "n_cur": pd.Series([int(n1)], dtype="int64")})

def q_events_debounce(sf_dir: str, *, gap_minutes: int = 5):
    """Debounce: drop events repeating the same (user, type) within
    ``gap_minutes`` of the PREVIOUS KEPT event (the sensor/telemetry
    dedup that exact-key dedup can't express) — per key the serial
    rule "keep iff ts − last_kept_ts > gap". Hash co-location per
    user + in-block vectorized group scan; integer-microsecond
    comparisons are engine-exact. Note the chained semantics: a burst
    A,B,C at 3-minute spacing keeps only A (B is dropped, so C
    compares against A) — the oracle replays this with a recursive
    CTE, not a lag filter."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id",
                                     "event_type", "ts"])
    gap_us = np.int64(gap_minutes) * 60_000_000

    def keep(block: pd.DataFrame) -> pd.DataFrame:
        if block.empty:
            return pd.DataFrame({"event_id": pd.Series(dtype="int64")})
        b = block.sort_values(["user_id", "event_type", "ts",
                               "event_id"])
        t = b["ts"].astype("int64").to_numpy()
        out = []
        # serial scan per (user, type) run — runs are short (events
        # per user-type), the heavy lifting was the co-location
        uid = b["user_id"].to_numpy()
        ety = b["event_type"].to_numpy()
        new_run = np.ones(len(b), dtype=bool)
        new_run[1:] = (uid[1:] != uid[:-1]) | (ety[1:] != ety[:-1])
        bounds = np.append(np.flatnonzero(new_run), len(b))
        eid = b["event_id"].to_numpy()
        for s, e in zip(bounds[:-1], bounds[1:]):
            last = None
            for i in range(s, e):
                if last is None or t[i] - last > gap_us:
                    out.append(eid[i])
                    last = t[i]
        return pd.DataFrame({"event_id": np.asarray(out,
                                                    dtype=np.int64)})

    out = grouped_apply(ds, ["user_id"], keep).to_pandas()
    out["event_id"] = out["event_id"].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)

def q_events_moments(sf_dir: str):
    """Sample skewness and excess kurtosis of event value per type —
    the higher-moment distribution profile (G1/G2 with the standard
    bias adjustments, matching DuckDB/SciPy). Numerically it is the
    TWO-PASS shape: pass 1 reduces to per-type means (combiner), the
    broadcast means recenter pass 2's central-power sums Σ(v−μ)^{2,3,4}
    — raw-power sums would cancel catastrophically at corpus scale.
    Only #types rows ever reach the driver."""
    import ray

    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_type", "value"])

    st = grouped_aggregate(ds, ["event_type"],
                           {"n": (None, "count"),
                            "s": ("value", "sum")}).to_pandas()
    mu = dict(zip(st["event_type"],
                  st["s"].to_numpy(np.float64)
                  / st["n"].to_numpy(np.float64)))
    mu_ref = ray.put(mu)

    def central(df: pd.DataFrame) -> pd.DataFrame:
        mean = ray.get(mu_ref)
        v = df["value"].to_numpy(np.float64)
        c = v - df["event_type"].map(mean).to_numpy(np.float64)
        g = pd.DataFrame({"event_type": df["event_type"],
                          "c2": c * c, "c3": c ** 3, "c4": c ** 4}) \
            .groupby("event_type", sort=False).sum()
        return g.reset_index()

    cs = grouped_aggregate(ds.map_batches(central, batch_format="pandas"),
                           ["event_type"],
                           {"c2": ("c2", "sum"), "c3": ("c3", "sum"),
                            "c4": ("c4", "sum")}).to_pandas()
    cs = cs.merge(st[["event_type", "n"]], on="event_type")
    n = cs["n"].to_numpy(np.float64)
    m2 = cs["c2"].to_numpy(np.float64) / n
    m3 = cs["c3"].to_numpy(np.float64) / n
    m4 = cs["c4"].to_numpy(np.float64) / n
    skew = (m3 / m2 ** 1.5) * np.sqrt(n * (n - 1)) / (n - 2)
    g2 = m4 / (m2 * m2) - 3.0
    kurt = ((n + 1) * g2 + 6) * (n - 1) / ((n - 2) * (n - 3))
    out = pd.DataFrame({"event_type": cs["event_type"],
                        "n": cs["n"].astype("int64"),
                        "skew": np.round(skew, 6),
                        "kurt": np.round(kurt, 6)})
    return out.sort_values("event_type").reset_index(drop=True)

def q_events_holt(sf_dir: str, *, alpha: float = 0.2, gamma: float = 0.1):
    """Holt double-exponential smoothing (level + trend) of event value
    per user in (ts, id) order — the forecasting-feature counterpart of
    ``q_events_ewma``. Emits each user's FINAL level and trend.

    Scale shape: users co-locate in ONE hash shuffle; each block runs
    the coupled two-state recursion rank-stepped — one vectorized
    update per within-user rank across ALL the block's users (the loop
    is over max series length, not rows). Update order is bit-identical
    to the oracle's recursive CTE:
      l_t = α·v_t + (1−α)·(l_{t−1} + b_{t−1})
      b_t = γ·(l_t − l_{t−1}) + (1−γ)·b_{t−1}
    seeded l_1 = v_1, b_1 = 0."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts",
                                     "value"])

    def holt(block: pd.DataFrame) -> pd.DataFrame:
        if block.empty:
            return pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64"),
                                 "level": pd.Series(dtype="float64"),
                                 "trend": pd.Series(dtype="float64")})
        b = block.sort_values(["user_id", "ts", "event_id"])
        v = b["value"].to_numpy(np.float64)
        uid = b["user_id"].to_numpy()
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        starts = np.flatnonzero(new_user)
        lens = np.diff(np.r_[starts, len(v)])
        rn = np.arange(len(v)) - np.repeat(starts, lens)
        lev = v.copy()
        tr = np.zeros_like(v)
        for r in range(1, int(rn.max()) + 1 if len(rn) else 0):
            idx = np.flatnonzero(rn == r)
            prev_l = lev[idx - 1]
            prev_b = tr[idx - 1]
            lev[idx] = alpha * v[idx] + (1.0 - alpha) * (prev_l + prev_b)
            tr[idx] = gamma * (lev[idx] - prev_l) + (1.0 - gamma) * prev_b
        last = starts + lens - 1
        # DuckDB round() is half-away-from-zero; mirror it
        rl = np.copysign(np.floor(np.abs(lev[last]) * 1e6 + 0.5),
                         lev[last]) / 1e6
        rt = np.copysign(np.floor(np.abs(tr[last]) * 1e6 + 0.5),
                         tr[last]) / 1e6
        return pd.DataFrame({"user_id": uid[last],
                             "n": lens.astype("int64"),
                             "level": rl, "trend": rt})

    out = grouped_apply(ds, ["user_id"], holt).to_pandas()
    out["user_id"] = out["user_id"].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)

def q_events_interpolate(sf_dir: str):
    """Per-user hourly gap filling with linear interpolation — the
    time-series regularization step before any windowed model: observed
    hours carry their mean value, missing hours between a user's first
    and last observation interpolate linearly between the neighboring
    observed hours. Users co-locate in ONE hash shuffle; each block
    builds the hour spines vectorized (searchsorted against the
    observed hours — no per-hour loop), with the interpolation
    expression bit-matching the oracle's window-function arithmetic."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "value"])

    def interp(block: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                            "hour": pd.Series(dtype="int64"),
                            "value": pd.Series(dtype="float64"),
                            "observed": pd.Series(dtype="int64")})
        if block.empty:
            return out
        b = block.copy()
        b["hour"] = b["ts"].dt.floor("h") \
            .astype("datetime64[us]").astype("int64") // 3_600_000_000
        obs = b.groupby(["user_id", "hour"], sort=True)["value"] \
            .mean().reset_index()
        parts = []
        for uid, g in obs.groupby("user_id", sort=False):
            oh = g["hour"].to_numpy(np.int64)
            ov = g["value"].to_numpy(np.float64)
            h = np.arange(oh[0], oh[-1] + 1, dtype=np.int64)
            idx = np.searchsorted(oh, h, side="right") - 1
            seen = oh[idx] == h
            nxt = np.minimum(idx + 1, len(oh) - 1)
            frac = (h - oh[idx]).astype(np.float64) \
                / np.maximum(oh[nxt] - oh[idx], 1).astype(np.float64)
            v = np.where(seen, ov[idx],
                         ov[idx] + (ov[nxt] - ov[idx]) * frac)
            parts.append(pd.DataFrame(
                {"user_id": np.full(len(h), uid, dtype=np.int64),
                 "hour": h,
                 "value": np.copysign(np.floor(np.abs(v) * 1e6 + 0.5),
                                      v) / 1e6,
                 "observed": seen.astype(np.int64)}))
        return pd.concat(parts, ignore_index=True)

    out = grouped_apply(ds, ["user_id"], interp).to_pandas()
    out = out.astype({"user_id": "int64", "hour": "int64",
                      "observed": "int64"})
    return out.sort_values(["user_id", "hour"]).reset_index(drop=True)

def q_events_auc(sf_dir: str):
    """Exact ROC AUC of event value as a score for 'is this a purchase'
    — the Mann-Whitney U statistic with full tie handling (average
    ranks), the model-eval primitive computed WITHOUT a global sort:
    ``relational.global_rank`` assigns exact ranks through quantile
    range buckets, equal scores then co-locate so each value group
    reduces to (n, n_pos, min-rank, max-rank); the tie-averaged rank is
    (min+max)/2 and only three scalars reach the driver."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.relational import global_rank
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "event_type", "value"])

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_id": df["event_id"],
            "value": df["value"].astype("float64"),
            "pos": (df["event_type"] == "purchase").astype("int64")})

    ranked = global_rank(ds.map_batches(flag, batch_format="pandas"),
                         value_col="value", id_col="event_id")
    g = grouped_aggregate(ranked, ["value"],
                          {"n": (None, "count"), "np": ("pos", "sum"),
                           "rmin": ("rnk", "min"),
                           "rmax": ("rnk", "max")},
                          result_hint="large")

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "np" not in df.columns:
            return pd.DataFrame({"__all": pd.Series(dtype="int64"),
                                 "s": pd.Series(dtype="float64"),
                                 "p": pd.Series(dtype="int64"),
                                 "t": pd.Series(dtype="int64")})
        ar = (df["rmin"].to_numpy(np.float64)
              + df["rmax"].to_numpy(np.float64)) / 2.0 + 1.0
        return pd.DataFrame({"__all": [np.int64(0)],
                             "s": [(df["np"].to_numpy(np.float64)
                                    * ar).sum()],
                             "p": [np.int64(df["np"].sum())],
                             "t": [np.int64(df["n"].sum())]})

    m = grouped_aggregate(g.map_batches(partials, batch_format="pandas",
                                        batch_size=None),
                          ["__all"], {"s": ("s", "sum"),
                                      "p": ("p", "sum"),
                                      "t": ("t", "sum")}).to_pandas()
    P = float(m["p"][0])
    N = float(m["t"][0]) - P
    auc = (float(m["s"][0]) - P * (P + 1.0) / 2.0) / (P * N)
    return pd.DataFrame({"n_pos": [np.int64(P)], "n_neg": [np.int64(N)],
                         "auc": [round(auc, 6)]})

def q_events_decayed_sum(sf_dir: str, *, tau_days: float = 1.0):
    """Exponentially time-decayed per-user value sum as of the stream's
    end (w = exp(−Δt/τ), τ = 1 day) — the standard recency-weighted
    engagement feature. One combiner pass: the global max timestamp is
    a scalar pre-pass, every batch weights locally in integer
    microseconds (no float epoch drift), per-user partials reduce."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "value"])
    tmax = int(ds.map_batches(
        lambda b: pd.DataFrame({"t_us": b["ts"]
                                .astype("datetime64[us]")
                                .astype("int64")}),
        batch_format="pandas").max("t_us"))
    scale = tau_days * 86400.0 * 1e6

    def weigh(df: pd.DataFrame) -> pd.DataFrame:
        t = df["ts"].astype("datetime64[us]").astype("int64") \
            .to_numpy()
        w = np.exp(-((tmax - t).astype(np.float64) / scale))
        g = pd.DataFrame({"user_id": df["user_id"].to_numpy(),
                          "wsum": w * df["value"].to_numpy(np.float64),
                          "wtot": w})
        return g.groupby("user_id", sort=False, as_index=False).sum()

    out = grouped_aggregate(
        ds.map_batches(weigh, batch_format="pandas"),
        ["user_id"], {"wsum": ("wsum", "sum"),
                      "wtot": ("wtot", "sum")}).to_pandas()
    out["user_id"] = out["user_id"].astype("int64")
    out["wsum"] = out["wsum"].round(6)
    out["wtot"] = out["wtot"].round(6)
    return out.sort_values("user_id").reset_index(drop=True)

def q_events_winsorized_mean(sf_dir: str, *, lo: float = 0.05,
                             hi: float = 0.95):
    """Winsorized mean of event value per type (values clamped to the
    exact type-7 [p05, p95] before averaging) — the robust-mean sibling
    of the trimmed mean, keeping every row's vote but bounding
    influence. The per-group bounds come from the shuffle-free exact
    grouped-quantile selector (three passes for ALL groups at once);
    clamping and the mean are then one more combiner pass."""
    import ray

    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.ops.quantiles import grouped_quantiles
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_type", "value"])
    qdf = grouped_quantiles(ds, "event_type", "value", [lo, hi])
    bounds = {}
    for t, g in qdf.groupby("event_type"):
        v = g.sort_values("q")["value"].to_numpy(np.float64)
        bounds[t] = (v[0], v[-1])
    b_ref = ray.put(bounds)

    def clamp(df: pd.DataFrame) -> pd.DataFrame:
        bl = ray.get(b_ref)
        lo_v = df["event_type"].map({k: v[0] for k, v in bl.items()}) \
            .to_numpy(np.float64)
        hi_v = df["event_type"].map({k: v[1] for k, v in bl.items()}) \
            .to_numpy(np.float64)
        v = np.clip(df["value"].to_numpy(np.float64), lo_v, hi_v)
        g = pd.DataFrame({"event_type": df["event_type"].to_numpy(),
                          "n": 1, "s": v})
        return g.groupby("event_type", sort=False, as_index=False) \
            .sum()

    m = grouped_aggregate(
        ds.map_batches(clamp, batch_format="pandas"),
        ["event_type"], {"n": ("n", "sum"),
                         "s": ("s", "sum")}).to_pandas()
    out = pd.DataFrame({
        "event_type": m["event_type"],
        "n": m["n"].astype("int64"),
        "winsorized_mean": (m["s"].to_numpy(np.float64)
                            / m["n"].to_numpy(np.float64)).round(6)})
    return out.sort_values("event_type").reset_index(drop=True)

def q_events_dp_counts(sf_dir: str, *, epsilon: float = 1.0):
    """Differentially-private count release per event type (Laplace
    mechanism, sensitivity 1): noise is SEEDED — the md5 of the type
    maps to a uniform in (0,1), inverted through the Laplace CDF — so
    the release is reproducible, auditable, and the SQL oracle replays
    the identical noise bit-for-bit. The aggregate is one combiner
    count; the noise adds per released row (|types|-bounded), which is
    exactly where DP noise belongs at scale — never per record."""
    import hashlib

    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_type"])
    m = grouped_aggregate(ds, ["event_type"],
                          {"n": (None, "count")}).to_pandas()

    def laplace(t: str) -> float:
        h = hashlib.md5(f"dp|{t}".encode()).hexdigest()[:13]
        u = (int(h, 16) % 1000000007) / 1000000007.0 - 0.5
        # inverse CDF: -b*sign(u)*ln(1-2|u|), b = 1/eps
        return -(1.0 / epsilon) * np.sign(u) * np.log(1.0 - 2.0 * abs(u))

    noise = np.array([laplace(t) for t in m["event_type"]])
    out = pd.DataFrame({
        "event_type": m["event_type"],
        "true_n": m["n"].astype("int64"),
        "dp_n": (m["n"].to_numpy(np.float64) + noise).round(6)})
    return out.sort_values("event_type").reset_index(drop=True)

def q_events_entropy_rate(sf_dir: str):
    """Per-user Markov entropy rate of the event-type sequence:
    H = −Σᵢ p(i) Σⱼ p(j|i) log₂ p(j|i) over the user's observed
    transitions — how predictable a user's behavior is (0 =
    deterministic cycling). Transition counts come from the same
    co-located shifted-view pair pass as the transition matrix; the
    entropy closes over per-user |types|²-bounded tables. Oracled by
    the LEAD-based SQL transition counts and the identical closed
    form."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts",
                                     "event_type"])

    def entropy(block: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                            "n_transitions": pd.Series(dtype="int64"),
                            "entropy_rate": pd.Series(dtype="float64")})
        if block.empty:
            return out
        b = block.sort_values(["user_id", "ts", "event_id"])
        uid = b["user_id"].to_numpy()
        et = b["event_type"].to_numpy()
        same = uid[1:] == uid[:-1]
        pairs = pd.DataFrame({"user_id": uid[:-1][same],
                              "a": et[:-1][same], "b": et[1:][same]})
        if pairs.empty:
            return out
        c = pairs.groupby(["user_id", "a", "b"], sort=False) \
            .size().reset_index(name="n")
        rows = []
        for u, g in c.groupby("user_id", sort=False):
            n = g["n"].to_numpy(np.float64)
            tot = n.sum()
            ca = g.groupby("a")["n"].transform("sum") \
                .to_numpy(np.float64)
            # Σ_ij (n_ij/tot) * log2(n_ij / c_a)  (p(i)·p(j|i) form)
            h = -np.sum((n / tot) * (np.log2(n) - np.log2(ca)))
            rows.append((u, int(tot), h))
        r = pd.DataFrame(rows, columns=["user_id", "n_transitions",
                                        "entropy_rate"])
        r["entropy_rate"] = np.round(r["entropy_rate"], 6)
        return r

    out = grouped_apply(ds, ["user_id"], entropy).to_pandas()
    out = out.astype({"user_id": "int64", "n_transitions": "int64"})
    return out.sort_values("user_id").reset_index(drop=True)

def q_events_peak_hours(sf_dir: str):
    """Diurnal profile per event type: the peak hour-of-day (mode,
    ties → smallest hour) and its traffic share — the load-shaping /
    anomaly-baseline primitive. One combiner pass over (type, hour)
    cells; the 24-row-per-type table closes on the driver."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_type", "ts"])

    def cells(df: pd.DataFrame) -> pd.DataFrame:
        h = (df["ts"].astype("datetime64[us]").astype("int64")
             // 3_600_000_000) % 24
        g = pd.DataFrame({"event_type": df["event_type"].to_numpy(),
                          "hour": h.to_numpy(np.int64)}) \
            .groupby(["event_type", "hour"], sort=False).size() \
            .reset_index(name="n")
        return g

    m = grouped_aggregate(ds.map_batches(cells, batch_format="pandas"),
                          ["event_type", "hour"],
                          {"n": ("n", "sum")}).to_pandas()
    tot = m.groupby("event_type")["n"].transform("sum")
    m = m.assign(tot=tot).sort_values(["event_type", "n", "hour"],
                                      ascending=[True, False, True])
    top = m.drop_duplicates("event_type")
    share = top["n"].to_numpy(np.float64) / top["tot"].to_numpy(np.float64)
    out = pd.DataFrame({
        "event_type": top["event_type"],
        "peak_hour": top["hour"].astype("int64"),
        "peak_n": top["n"].astype("int64"),
        "peak_share": np.copysign(np.floor(np.abs(share) * 1e6 + 0.5),
                                  share) / 1e6})
    return out.sort_values("event_type").reset_index(drop=True)

def q_events_type_drift(sf_dir: str):
    """Categorical drift between the even- and odd-event_id halves of
    the stream (deterministic A/B standing in for two ingestion
    epochs): per-type share in each half plus the per-type absolute
    share gap whose half-sum is the total-variation distance — the
    schema-free companion to the value-based PSI monitor. One combiner
    pass over (type, half) cells; |types|×2 rows close on the
    driver."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "event_type"])

    def cells(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({"event_type": df["event_type"].to_numpy(),
                          "half": (df["event_id"].to_numpy(np.int64)
                                   % 2)}) \
            .groupby(["event_type", "half"], sort=False).size() \
            .reset_index(name="n")
        return g

    m = grouped_aggregate(ds.map_batches(cells, batch_format="pandas"),
                          ["event_type", "half"],
                          {"n": ("n", "sum")}).to_pandas()
    tot = m.groupby("half")["n"].sum()
    piv = m.pivot_table(index="event_type", columns="half", values="n",
                        fill_value=0, aggfunc="sum")
    a = piv.get(0, pd.Series(0, index=piv.index)) \
        .to_numpy(np.float64) / float(tot.get(0, 1))
    b = piv.get(1, pd.Series(0, index=piv.index)) \
        .to_numpy(np.float64) / float(tot.get(1, 1))
    half_away = lambda x: np.copysign(
        np.floor(np.abs(x) * 1e6 + 0.5), x) / 1e6
    out = pd.DataFrame({"event_type": piv.index,
                        "share_even": half_away(a),
                        "share_odd": half_away(b),
                        "abs_gap": half_away(np.abs(a - b))})
    return out.sort_values("event_type").reset_index(drop=True)

def q_events_burstiness(sf_dir: str):
    """Fano factor (index of dispersion) of hourly event counts per
    type — variance/mean of the hour-bucket counts over the stream's
    OBSERVED span: ≈1 is Poisson traffic, ≫1 is bursty. Hour cells
    reduce in one combiner pass; unobserved hours inside the global
    span count as ZERO (both engines build the same dense span), so
    the statistic is well-defined and not survivorship-biased."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_type", "ts"])

    def cells(df: pd.DataFrame) -> pd.DataFrame:
        h = df["ts"].astype("datetime64[us]").astype("int64") \
            // 3_600_000_000
        return pd.DataFrame({"event_type": df["event_type"].to_numpy(),
                             "hour": h.to_numpy(np.int64)}) \
            .groupby(["event_type", "hour"], sort=False).size() \
            .reset_index(name="n")

    m = grouped_aggregate(ds.map_batches(cells, batch_format="pandas"),
                          ["event_type", "hour"],
                          {"n": ("n", "sum")}).to_pandas()
    span = int(m["hour"].max() - m["hour"].min() + 1)
    rows = []
    for t, g in m.groupby("event_type"):
        n = g["n"].to_numpy(np.float64)
        total = n.sum()
        # dense span: zeros for unobserved hours
        mean = total / span
        # var over span hours: Σ(n−μ)² = Σn² − 2μΣn + span·μ²
        var = (np.sum(n * n) - 2.0 * mean * total
               + span * mean * mean) / span
        rows.append((t, int(total), round(float(mean), 6),
                     round(float(var / mean), 6)))
    out = pd.DataFrame(rows, columns=["event_type", "n_events",
                                      "mean_per_hour", "fano"])
    return out.sort_values("event_type").reset_index(drop=True)

def q_events_runs_test(sf_dir: str):
    """Wald-Wolfowitz runs test per event type: is the above/below-
    global-median sequence of values (in (ts, id) order) random?
    Emits runs count and the z statistic
    z = (R − μ_R)/σ_R, μ_R = 2·n₊·n₋/n + 1 — the randomness audit for
    suspected autocorrelated or batched telemetry. The global median
    comes from the shuffle-free exact-quantile selector; runs count
    per type from co-located islands (values equal to the median drop,
    the classical convention)."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.ops.quantiles import distributed_quantiles
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "event_type", "ts",
                                     "value"])
    med = float(distributed_quantiles(ds, "value", [0.5])[0])

    def runs(block: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"event_type": pd.Series(dtype="object"),
                            "n_pos": pd.Series(dtype="int64"),
                            "n_neg": pd.Series(dtype="int64"),
                            "n_runs": pd.Series(dtype="int64"),
                            "z": pd.Series(dtype="float64")})
        if block.empty:
            return out
        b = block[block["value"] != med] \
            .sort_values(["event_type", "ts", "event_id"])
        if b.empty:
            return out
        et = b["event_type"].to_numpy()
        up = (b["value"].to_numpy(np.float64) > med)
        new_t = np.r_[True, et[1:] != et[:-1]]
        flip = np.r_[True, up[1:] != up[:-1]]
        run_start = new_t | flip
        rows = []
        df = pd.DataFrame({"t": et, "up": up, "rs": run_start})
        for t, g in df.groupby("t", sort=False):
            npos = int(g["up"].sum())
            nneg = int((~g["up"]).sum())
            r = int(g["rs"].sum())
            n = float(npos + nneg)
            mu = 2.0 * npos * nneg / n + 1.0
            var = (2.0 * npos * nneg
                   * (2.0 * npos * nneg - n)) / (n * n * (n - 1.0))
            z = (r - mu) / np.sqrt(var)
            rows.append((t, npos, nneg, r, round(float(z), 6)))
        return pd.DataFrame(rows, columns=["event_type", "n_pos",
                                           "n_neg", "n_runs", "z"])

    out = grouped_apply(ds, ["event_type"], runs).to_pandas()
    out = out.astype({"n_pos": "int64", "n_neg": "int64",
                      "n_runs": "int64"})
    return out.sort_values("event_type").reset_index(drop=True)

def q_events_best_split(sf_dir: str):
    """Best decision-stump split of `value` for the conversion label
    (event_type ∈ {click, purchase}) — the histogram-method GBDT
    primitive (``ops/tree.best_stump_split``): one combiner pass to a
    feature-grid-bounded histogram, vectorized prefix-sum Gini scan.
    Integer-exact counts + an identically-sequenced gain expression
    make the argmax bit-stable against the SQL window oracle."""
    from jerex_ray.ops.tree import best_stump_split
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_type", "value"])

    def label(batch: pd.DataFrame) -> np.ndarray:
        return batch["event_type"].isin(["click", "purchase"]) \
            .to_numpy(np.int64)

    return best_stump_split(ds, feature="value", label_fn=label)

def q_events_ks_test(sf_dir: str):
    """Two-sample Kolmogorov–Smirnov drift test between the `value`
    distributions of click vs error events: one combiner pass reduces
    the corpus to a value-grid-bounded (v, n_click, n_error)
    histogram, then a vectorized prefix-sum CDF scan finds
    D = max|F₁−F₂|. The gap expression is sequenced identically to
    the SQL window oracle (exact-integer counts, single divisions),
    so the argmax location is bit-stable; the one-term Kolmogorov
    p ≈ 2·exp(−2·m·D²) uses math.exp = glibc = DuckDB's exp."""
    import math

    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_type", "value"])

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"].isin(["click", "error"])]
        if df.empty:
            return pd.DataFrame({"v": pd.Series(dtype="float64"),
                                 "na": pd.Series(dtype="int64"),
                                 "nb": pd.Series(dtype="int64")})
        g = (pd.DataFrame({
            "v": df["value"].to_numpy(np.float64),
            "na": (df["event_type"] == "click").to_numpy(np.int64),
            "nb": (df["event_type"] == "error").to_numpy(np.int64)})
            .groupby("v", sort=False).sum().reset_index())
        return g

    hist = grouped_aggregate(
        ds.map_batches(partials, batch_format="pandas", batch_size=8192),
        ["v"], {"na": ("na", "sum"), "nb": ("nb", "sum")}).to_pandas()
    hist = hist.sort_values("v").reset_index(drop=True)
    na = float(hist["na"].sum())
    nb = float(hist["nb"].sum())
    ca = np.cumsum(hist["na"].to_numpy(np.float64))
    cb = np.cumsum(hist["nb"].to_numpy(np.float64))
    dv = np.abs(ca / na - cb / nb)
    v = hist["v"].to_numpy(np.float64)
    best = np.lexsort((v, -dv))[0]        # dv DESC, v ASC
    d = float(dv[best])
    m = na * nb / (na + nb)
    p = 2.0 * math.exp(-2.0 * m * d * d)
    return pd.DataFrame({"n_a": [np.int64(na)], "n_b": [np.int64(nb)],
                         "d_stat": [round(d, 6)],
                         "at_value": [v[best]],
                         "p_approx": [round(p, 6)]})

def q_events_attribution(sf_dir: str):
    """Linear multi-touch attribution: every purchase splits one unit
    of credit equally across the SAME user's non-purchase events in
    the preceding 24 h window; credit totals per touching event type.
    Users co-locate once; inside each block the window memberships
    come from two searchsorted bounds per purchase and the per-touch
    credits from an interval-add difference array (np.add.at +
    cumsum) — no pair materialization, per-user cost is events +
    purchases, not their product. The SQL oracle materializes the
    pair join; both sides round the float credit sums to 6."""
    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type", "ts"])
    win = np.timedelta64(24, "h").astype("timedelta64[us]").astype(
        np.int64)

    def per_block(block: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"event_type": pd.Series(dtype="object"),
                              "touches": pd.Series(dtype="int64"),
                              "credit": pd.Series(dtype="float64")})
        if block.empty:
            return empty
        d = block.sort_values(["user_id", "ts"], kind="mergesort")
        ts = d["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        uid = d["user_id"].to_numpy()
        is_p = (d["event_type"] == "purchase").to_numpy()
        # touches keep their within-user ordinal + a block-global
        # segment base, so one diff-array pass serves every user
        t = pd.DataFrame({"user_id": uid[~is_p], "t": ts[~is_p],
                          "et": d["event_type"].to_numpy()[~is_p]})
        p = pd.DataFrame({"user_id": uid[is_p], "t": ts[is_p]})
        if t.empty or p.empty:
            return empty
        t["idx"] = t.groupby("user_id", sort=False).cumcount() + 1
        seg_sizes = t.groupby("user_id", sort=False).size()
        seg_base = dict(zip(seg_sizes.index,
                            np.r_[0, np.cumsum(seg_sizes.to_numpy())[:-1]]))
        t_sorted = t.sort_values("t", kind="mergesort")

        def count_before(keys: pd.DataFrame, col: str) -> np.ndarray:
            """#touches of the same user with ts strictly < keys[col]."""
            m = pd.merge_asof(
                keys.sort_values(col, kind="mergesort"),
                t_sorted[["user_id", "t", "idx"]],
                left_on=col, right_on="t", by="user_id",
                direction="backward", allow_exact_matches=False)
            return (m.set_index("__row")["idx"].fillna(0)
                    .astype(np.int64).sort_index().to_numpy())

        p = p.reset_index(drop=True)
        p["__row"] = p.index
        p["lo_key"] = p["t"] - win
        hi = count_before(p[["user_id", "t", "__row"]].copy(), "t")
        lo = count_before(p[["user_id", "lo_key", "__row"]].copy(),
                          "lo_key")
        k = (hi - lo).astype(np.float64)
        ok = k > 0
        if not ok.any():
            return empty
        base = p["user_id"].map(seg_base).to_numpy(np.int64)[ok]
        lo_g, hi_g = base + lo[ok], base + hi[ok]
        diff = np.zeros(len(t) + 1)
        np.add.at(diff, lo_g, 1.0 / k[ok])
        np.add.at(diff, hi_g, -(1.0 / k[ok]))
        cred = np.cumsum(diff[:-1])
        diffc = np.zeros(len(t) + 1)
        np.add.at(diffc, lo_g, 1.0)
        np.add.at(diffc, hi_g, -1.0)
        cover = np.rint(np.cumsum(diffc[:-1])).astype(np.int64)
        touched = cover > 0
        agg = (pd.DataFrame({"event_type": t["et"].to_numpy()[touched],
                             "credit": cred[touched],
                             "touches": cover[touched]})
               .groupby("event_type", sort=False)
               .agg(touches=("touches", "sum"), credit=("credit", "sum"))
               .reset_index())
        return pd.DataFrame({"event_type": agg["event_type"],
                             "touches": agg["touches"].astype(np.int64),
                             "credit": agg["credit"]})

    out = grouped_aggregate(
        grouped_apply(ds, ["user_id"], per_block),
        ["event_type"], {"touches": ("touches", "sum"),
                         "credit": ("credit", "sum")}).to_pandas()
    out["touches"] = out["touches"].astype("int64")
    out["credit"] = out["credit"].round(6)
    return out.sort_values("event_type").reset_index(drop=True)

def q_events_woe_iv(sf_dir: str):
    """Weight-of-evidence / information-value profile of `value`
    against the conversion label — the credit-scoring feature audit
    (Siddiqi '06): exact decile edges from the shuffle-free quantile
    selector, ONE combiner pass to per-bucket (n, pos), then
    WOE_i = ln((pos_i/pos)/(neg_i/neg)) and its IV term. Bucket
    membership is '# edges strictly below v' (searchsorted-left ==
    the SQL v > e count, boundary-stable); counts are integer-exact
    and ln is glibc on both sides; floats round to 6."""
    import math

    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.ops.quantiles import distributed_quantiles
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_type", "value"])
    qs = [i / 10 for i in range(1, 10)]
    edges = np.asarray(distributed_quantiles(ds, "value", qs),
                       dtype=np.float64)

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value"].to_numpy(np.float64)
        y = df["event_type"].isin(["click", "purchase"]) \
            .to_numpy(np.int64)
        b = np.searchsorted(edges, v, side="left").astype(np.int64)
        g = (pd.DataFrame({"bucket": b, "n": 1, "pos": y})
             .groupby("bucket", sort=False).sum().reset_index())
        return g

    h = grouped_aggregate(
        ds.map_batches(partials, batch_format="pandas",
                       batch_size=8192),
        ["bucket"], {"n": ("n", "sum"), "pos": ("pos", "sum")}) \
        .to_pandas().sort_values("bucket").reset_index(drop=True)
    pos_t = float(h["pos"].sum())
    neg_t = float((h["n"] - h["pos"]).sum())
    rows = []
    for _, r in h.iterrows():
        pos_i, neg_i = float(r["pos"]), float(r["n"] - r["pos"])
        if pos_i == 0.0 or neg_i == 0.0:
            continue
        ps, ns = pos_i / pos_t, neg_i / neg_t
        woe = math.log(ps / ns)
        rows.append((int(r["bucket"]), int(r["n"]), int(r["pos"]),
                     round(woe, 6), round((ps - ns) * woe, 6)))
    return pd.DataFrame(rows, columns=["bucket", "n", "pos", "woe",
                                       "iv_term"])

def q_events_isotonic(sf_dir: str):
    """Isotonic (monotone non-decreasing) calibration of the
    conversion rate against `value` — pool-adjacent-violators
    (Barlow et al. '72), the classic probability-calibration step.
    ONE combiner pass reduces the corpus to an integer-bucket
    histogram (⌊value⌋, n, pos) — grid-bounded like the stump/WOE
    ops — then the driver runs the linear PAV stack over ≤ a few
    hundred buckets with EXACT integer cross-multiplication
    comparisons (no float-compare drift). Each pool's fit is one
    division of two exact integers, so it matches the SQL oracle —
    which recomputes the fit through Barlow's minimax identity
    fit(i) = max_{s≤i} min_{t≥i} avg(s..t) in O(buckets²) — before
    the shared 6-decimal rounding."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_type", "value"])

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        b = np.floor(df["value"].to_numpy(np.float64)).astype(np.int64)
        y = df["event_type"].isin(["click", "purchase"]) \
            .to_numpy(np.int64)
        return (pd.DataFrame({"bucket": b, "n": 1, "pos": y})
                .groupby("bucket", sort=False).sum().reset_index())

    h = grouped_aggregate(
        ds.map_batches(partials, batch_format="pandas",
                       batch_size=8192),
        ["bucket"], {"n": ("n", "sum"), "pos": ("pos", "sum")}) \
        .to_pandas().sort_values("bucket").reset_index(drop=True)
    # PAV stack: pools of (weight, pos, #buckets); exact integer
    # cross-multiplication keeps merges float-drift-free
    pools: list[list[int]] = []
    for _, r in h.iterrows():
        w, p, c = int(r["n"]), int(r["pos"]), 1
        while pools and pools[-1][1] * w >= p * pools[-1][0]:
            pw, pp, pc = pools.pop()
            w, p, c = w + pw, p + pp, c + pc
        pools.append([w, p, c])
    fit = np.concatenate([np.full(c, float(p) / float(w))
                          for w, p, c in pools])
    return pd.DataFrame({"bucket": h["bucket"].astype("int64"),
                         "n": h["n"].astype("int64"),
                         "pos": h["pos"].astype("int64"),
                         "fit": np.round(fit, 6)})

def q_events_rate_limit(sf_dir: str, *, cap: float = 2.0,
                        refill_per_min: float = 0.005):
    """Per-user token-bucket rate limiting replayed over the event
    log (capacity 2, 0.005 token/min continuous refill, 1 token per
    event) — the standard admission-control audit ("which historical
    events WOULD have been throttled"). Users co-locate in one hash
    shuffle; each block runs the rank-stepped vectorized recursion
    (loop over max series length, not rows) with the SAME float64
    expression sequence as the oracle's recursive CTE —
    least(cap, prev + Δµs/6e7) — so admit branches and token levels
    are bit-identical; the half-away mirror rounds token levels."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts"])

    def bucket(block: pd.DataFrame) -> pd.DataFrame:
        if block.empty:
            return pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                                 "admitted": pd.Series(dtype="int64"),
                                 "tokens": pd.Series(dtype="float64")})
        b = block.sort_values(["user_id", "ts", "event_id"])
        t = b["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        uid = b["user_id"].to_numpy()
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        starts = np.flatnonzero(new_user)
        lens = np.diff(np.r_[starts, len(t)])
        rn = np.arange(len(t)) - np.repeat(starts, lens)
        tokens = np.empty(len(t))
        admitted = np.empty(len(t), dtype=np.int64)
        first = rn == 0
        # first event: full bucket, always admitted (cap >= 1)
        tokens[first] = cap - 1.0
        admitted[first] = 1
        for r in range(1, int(rn.max()) + 1 if len(rn) else 0):
            idx = np.flatnonzero(rn == r)
            before = np.minimum(
                cap, tokens[idx - 1]
                + (t[idx] - t[idx - 1]) / 60000000.0 * refill_per_min)
            adm = before >= 1.0
            tokens[idx] = np.where(adm, before - 1.0, before)
            admitted[idx] = adm.astype(np.int64)
        rt = np.copysign(np.floor(np.abs(tokens) * 1e6 + 0.5),
                         tokens) / 1e6
        return pd.DataFrame({"event_id": b["event_id"].to_numpy(),
                             "admitted": admitted,
                             "tokens": rt})

    out = grouped_apply(ds, ["user_id"], bucket).to_pandas()
    out["event_id"] = out["event_id"].astype("int64")
    out["admitted"] = out["admitted"].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)

def q_events_ohlc(sf_dir: str):
    """Hourly OHLC bars of event value (open/high/low/close + count)
    — the classic time-bar compaction. Open/close are argmin/argmax
    by (ts, event_id) inside each hour: every batch emits ONE
    candidate row per hour it sees (partial argmin/argmax + min/max/
    count), and a bucket-bounded merge pass picks winners — the
    corpus streams once, only hour-bucket rows shuffle. SQL-oracled
    via window row_number first/last."""
    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({
                "hour": pd.Series(dtype="int64"),
                "o_ts": pd.Series(dtype="int64"),
                "o_id": pd.Series(dtype="int64"),
                "open": pd.Series(dtype="float64"),
                "c_ts": pd.Series(dtype="int64"),
                "c_id": pd.Series(dtype="int64"),
                "close": pd.Series(dtype="float64"),
                "high": pd.Series(dtype="float64"),
                "low": pd.Series(dtype="float64"),
                "n": pd.Series(dtype="int64")})
        t = df["ts"].astype("datetime64[us]").astype("int64")
        d = pd.DataFrame({"hour": t // 3_600_000_000, "t": t,
                          "id": df["event_id"].astype("int64"),
                          "v": df["value"].to_numpy(np.float64)})
        d = d.sort_values(["hour", "t", "id"])
        g = d.groupby("hour", sort=False)
        first, last = g.head(1), g.tail(1)
        agg = g["v"].agg(["max", "min", "count"]).reset_index()
        out = agg.rename(columns={"max": "high", "min": "low",
                                  "count": "n"})
        out = out.merge(first.rename(columns={
            "t": "o_ts", "id": "o_id", "v": "open"}), on="hour") \
            .merge(last.rename(columns={
                "t": "c_ts", "id": "c_id", "v": "close"}), on="hour")
        out["n"] = out["n"].astype(np.int64)
        return out[["hour", "o_ts", "o_id", "open", "c_ts", "c_id",
                    "close", "high", "low", "n"]]

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "hour" not in df.columns:
            return pd.DataFrame({
                "hour": pd.Series(dtype="int64"),
                "open": pd.Series(dtype="float64"),
                "high": pd.Series(dtype="float64"),
                "low": pd.Series(dtype="float64"),
                "close": pd.Series(dtype="float64"),
                "n": pd.Series(dtype="int64")})
        d = df.sort_values(["hour", "o_ts", "o_id"])
        opens = d.groupby("hour", sort=False).head(1)[["hour", "open"]]
        d2 = df.sort_values(["hour", "c_ts", "c_id"])
        closes = d2.groupby("hour", sort=False).tail(1)[["hour",
                                                         "close"]]
        agg = (df.groupby("hour")
               .agg(high=("high", "max"), low=("low", "min"),
                    n=("n", "sum")).reset_index())
        out = agg.merge(opens, on="hour").merge(closes, on="hour")
        out["hour"] = out["hour"].astype("int64")
        out["n"] = out["n"].astype("int64")
        return out[["hour", "open", "high", "low", "close", "n"]]

    out = grouped_apply(
        ds.map_batches(partial, batch_format="pandas",
                       batch_size=8192),
        ["hour"], merge).to_pandas()
    return out.sort_values("hour").reset_index(drop=True)

def q_events_partition_plan(sf_dir: str, *, n_partitions: int = 8):
    """Skew-aware co-location plan for user_id over the event log
    (``ops/layout.plan_partitions``, Graham '69 LPT): one combiner
    pass to per-key counts, driver-side greedy assignment with exact
    integer loads. The recursive-CTE oracle replays the greedy scan
    state (one load column per partition) key by key — integer-exact,
    so assignment parity is bitwise."""
    from jerex_ray.ops.layout import plan_partitions
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id"])
    out = plan_partitions(ds, key="user_id",
                          n_partitions=n_partitions)
    out["user_id"] = out["user_id"].astype("int64")
    return out

def _partition_plan_oracle_sql(m: int = 8) -> str:
    """Generated recursive-CTE replay of the LPT greedy scan: state =
    m integer load columns; pick = lowest index reaching least(l…)."""
    least_r = "least(" + ", ".join(f"r.l{k}" for k in range(m)) + ")"
    pick = "CASE " + " ".join(
        f"WHEN r.l{k} = {least_r} THEN {k}" for k in range(m)) + " END"
    first_loads = ", ".join(
        ("CAST(n_rows AS BIGINT) AS l0" if k == 0
         else f"CAST(0 AS BIGINT) AS l{k}") for k in range(m))
    upd = ", ".join(
        f"r.l{k} + CASE WHEN ({pick}) = {k} THEN s.n_rows ELSE 0 END"
        f" AS l{k}" for k in range(m))
    return f"""
        WITH RECURSIVE counts AS MATERIALIZED (
            SELECT user_id, count(*) AS n_rows
            FROM events GROUP BY user_id),
        seq AS MATERIALIZED (
            SELECT user_id, n_rows,
                   row_number() OVER (ORDER BY n_rows DESC,
                                      user_id ASC) AS rk
            FROM counts),
        rec AS (
            SELECT rk, user_id, n_rows, 0 AS "partition",
                   {first_loads}
            FROM seq WHERE rk = 1
            UNION ALL
            SELECT s.rk, s.user_id, s.n_rows, ({pick}) AS "partition",
                   {upd}
            FROM rec r JOIN seq s ON s.rk = r.rk + 1)
        SELECT user_id, CAST(n_rows AS BIGINT) AS n_rows,
               CAST("partition" AS BIGINT) AS "partition"
        FROM rec ORDER BY user_id
    """

def _bootstrap_ci_oracle_sql(reps: int = 32) -> str:
    """Replays the Poisson bootstrap bit-for-bit: same md5-uniform,
    same threshold literals (repr round-trips to the identical
    double), same replicate means and type-7 percentiles."""
    thr = _poisson1_thresholds()
    case = "CASE " + " ".join(
        f"WHEN u < {t!r} THEN {k}" for k, t in enumerate(thr)) \
        + f" ELSE {len(thr)} END"
    return f"""
        WITH reps AS (SELECT unnest(range(0, {reps})) AS rep),
        r AS (
            SELECT reps.rep, CAST(e.value AS DOUBLE) AS v,
                   CAST(CAST('0x' || substr(md5('boot|'
                       || CAST(e.event_id AS VARCHAR) || '|'
                       || CAST(reps.rep AS VARCHAR)), 1, 16)
                       AS UBIGINT) AS DOUBLE)
                   / 18446744073709551616.0 AS u
            FROM events e, reps),
        w AS (SELECT rep, v, ({case}) AS w FROM r),
        mu AS (SELECT rep, sum(w * v) / sum(w) AS m
               FROM w GROUP BY rep),
        q AS (SELECT quantile_cont(m, 0.025) AS lo,
                     quantile_cont(m, 0.975) AS hi
              FROM mu),
        t AS (SELECT count(*) AS n,
                     sum(CAST(value AS DOUBLE)) / count(*) AS mean
              FROM events)
        SELECT CAST(t.n AS BIGINT) AS n,
               round(t.mean, 6) AS mean,
               round(q.lo, 6) AS ci_lo,
               round(q.hi, 6) AS ci_hi
        FROM t, q
    """

_POISSON1_CDF = None

def _poisson1_thresholds(kmax: int = 9) -> list:
    """P(X ≤ k) for Poisson(1), k = 0..kmax−1 — shared literals
    between the engine kernel and the SQL oracle."""
    global _POISSON1_CDF
    if _POISSON1_CDF is None:
        import math
        term, cdf, out = math.exp(-1.0), 0.0, []
        for k in range(kmax):
            if k > 0:
                term = term / k
            cdf += term
            out.append(cdf)
        _POISSON1_CDF = out
    return _POISSON1_CDF

def q_events_bootstrap_ci(sf_dir: str, *, reps: int = 32):
    """95 % bootstrap CI for the mean event value via the POISSON
    bootstrap (Chamandy et al. '12, "Estimating uncertainty for
    massive data streams") — the resampling scheme that works in one
    streaming pass: each row gets an independent Poisson(1) weight
    per replicate from a seeded md5-uniform, so no replicate ever
    materializes and the corpus is read ONCE. Per batch only 2·B
    partial sums (Σw, Σw·v per replicate) leave; replicate means and
    the type-7 percentile CI finish on the driver. Deterministic
    md5 weights mean the SQL oracle replays the identical resample
    bit-for-bit (same thresholds literals, same u); half-away mirror
    rounding on the float outputs."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    from jerex_ray.util import md5_hash64
    configure_data_context()
    thr = np.array(_poisson1_thresholds(), dtype=np.float64)
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "value"])

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["event_id"].astype("int64").to_numpy()
        v = df["value"].to_numpy(np.float64)
        rows = []
        for b in range(reps):
            h = np.fromiter(
                (md5_hash64(f"boot|{i}|{b}") for i in ids),
                dtype=np.uint64, count=len(ids))
            u = h.astype(np.float64) / 18446744073709551616.0
            w = np.searchsorted(thr, u, side="right").astype(
                np.float64)
            rows.append((b, float(w.sum()), float((w * v).sum()),
                         np.int64(len(v)), float(v.sum())))
        return pd.DataFrame(rows, columns=["rep", "sw", "swv", "n",
                                           "sv"])

    agg = grouped_aggregate(
        ds.map_batches(partials, batch_format="pandas",
                       batch_size=8192),
        ["rep"], {"sw": ("sw", "sum"), "swv": ("swv", "sum"),
                  "n": ("n", "sum"), "sv": ("sv", "sum")}).to_pandas()
    mu = (agg["swv"] / agg["sw"]).to_numpy(np.float64)
    n = int(agg["n"].iloc[0])
    mean = float(agg["sv"].iloc[0]) / n
    lo = float(np.quantile(mu, 0.025))
    hi = float(np.quantile(mu, 0.975))

    def mirror(x: float) -> float:
        return float(np.copysign(np.floor(abs(x) * 1e6 + 0.5), x)
                     / 1e6)

    return pd.DataFrame({"n": [np.int64(n)], "mean": [mirror(mean)],
                         "ci_lo": [mirror(lo)], "ci_hi": [mirror(hi)]})

def q_events_quantile_sketch(sf_dir: str):
    """Approximate value quantiles from the mergeable equi-width
    histogram sketch (``ops/quantiles.approx_quantiles_histogram``,
    2048 bins) next to their exact twins — the deliberately-
    approximate sibling of ``q_events_value_quantiles`` (which IS the
    oracle-checked exact path). Rows-only: the sketch's answer is an
    upper bin edge, not a SQL-recomputable statistic; the
    (max−min)/nbins error bound vs the rank-floor order statistic is
    pytest-gated (tests/test_relational_extra.py)."""
    from jerex_ray.ops.quantiles import (approx_quantiles_histogram,
                                         distributed_quantiles)
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["value"])
    qs = [0.25, 0.5, 0.75, 0.99]
    approx = approx_quantiles_histogram(ds, "value", qs)
    exact = distributed_quantiles(ds, "value", qs)
    return pd.DataFrame({"q": qs,
                         "approx": np.round(approx, 6),
                         "exact": np.round(exact, 6)})

def q_events_theilsen(sf_dir: str):
    """Theil–Sen robust trend of hourly mean event value (median of
    all pairwise bucket slopes — 29.4 % breakdown vs OLS's 0): one
    combiner pass reduces the corpus to the hour-bucket mean series
    (grid-bounded), the O(buckets²) pairwise-slope median runs
    vectorized on the driver. Slopes are identical divisions on both
    sides; the median interpolates type-7 like quantile_cont; the
    OLS slope rides along for the robustness contrast."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["ts", "value"])

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        h = df["ts"].astype("datetime64[us]").astype("int64") \
            // 3_600_000_000
        g = (pd.DataFrame({"hour": h.to_numpy(np.int64),
                           "s": df["value"].to_numpy(np.float64),
                           "n": 1})
             .groupby("hour", sort=False).sum().reset_index())
        return g

    m = grouped_aggregate(
        ds.map_batches(partials, batch_format="pandas",
                       batch_size=8192),
        ["hour"], {"s": ("s", "sum"), "n": ("n", "sum")}) \
        .to_pandas().sort_values("hour").reset_index(drop=True)
    hr = m["hour"].to_numpy(np.float64)
    mu = m["s"].to_numpy(np.float64) / m["n"].to_numpy(np.float64)
    i, j = np.triu_indices(len(hr), k=1)
    slopes = (mu[j] - mu[i]) / (hr[j] - hr[i])
    ts_slope = float(np.quantile(slopes, 0.5))
    # OLS on the same buckets for contrast (two-pass centered)
    xc, yc = hr - hr.mean(), mu - mu.mean()
    ols = float((xc * yc).sum() / (xc * xc).sum())

    def mirror(x: float) -> float:
        return float(np.copysign(np.floor(abs(x) * 1e6 + 0.5), x)
                     / 1e6)

    return pd.DataFrame({"n_buckets": [np.int64(len(hr))],
                         "n_pairs": [np.int64(len(slopes))],
                         "theilsen_slope": [mirror(ts_slope)],
                         "ols_slope": [mirror(ols)]})

def q_events_kanonymity(sf_dir: str, *, k: int = 5):
    """k-anonymity audit of the event log under the quasi-identifier
    (user-id bucket, hour-of-day, event_type) — Sweeney '02: what
    share of rows sit in equivalence classes smaller than k (the
    re-identifiable tail a release would need to suppress or
    generalize)? One combiner pass to class counts (QI-vocabulary
    bounded), then a class-size rollup. Integer-exact; SQL-oracled."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_type"])

    def qi(df: pd.DataFrame) -> pd.DataFrame:
        hod = (df["ts"].astype("datetime64[us]").astype("int64")
               // 3_600_000_000) % 24
        return pd.DataFrame({
            "ubucket": df["user_id"].to_numpy(np.int64) // 10,
            "hod": hod.to_numpy(np.int64),
            "event_type": df["event_type"].to_numpy(),
            "n": 1}).groupby(["ubucket", "hod", "event_type"],
                             sort=False).sum().reset_index()

    cls = grouped_aggregate(
        ds.map_batches(qi, batch_format="pandas", batch_size=8192),
        ["ubucket", "hod", "event_type"], {"n": ("n", "sum")},
        result_hint="large").to_pandas()
    n_rows = int(cls["n"].sum())
    small = cls[cls["n"] < k]
    return pd.DataFrame({
        "n_rows": [np.int64(n_rows)],
        "n_classes": [np.int64(len(cls))],
        "n_small_classes": [np.int64(len(small))],
        "rows_at_risk": [np.int64(small["n"].sum())],
        "risk_share": [round(float(small["n"].sum()) / n_rows, 6)],
        "min_class": [np.int64(cls["n"].min())]})

def beta_prob_b_beats_a(aa: int, ba: int, ab_: int, bb: int) -> float:
    """Exact P(θ_B > θ_A) for θ_A ~ Beta(aa, ba), θ_B ~ Beta(ab_, bb)
    with INTEGER parameters, via the closed-form sum
    h = Σ_{i<ab_} B(aa+i, ba+bb) / ((bb+i)·B(1+i, bb)·B(aa, ba))
    (Cook '05 / the standard Bayesian A/B formula) evaluated through
    its rational term recurrence so the ONLY float operations are
    IEEE +,×,÷ in a fixed order — no lgamma (libm lgamma differs by
    1–2 ulp between DuckDB and CPython, measured), hence the DuckDB
    recursive-CTE oracle replays every step bit-for-bit:

      phase 1 (j = 0..bb-1):   t ← t · (ba+j) / (aa+ba+j)
        (builds term_0 = B(aa, ba+bb)/B(aa, ba) as a product)
      phase 2 (i = 0..ab_-1):  acc ← acc + t;
                               t ← t · (aa+i)(bb+i) / ((aa+ba+bb+i)(1+i))
        (the B(1+i,bb) and 1/(bb+i) factors cancel to this ratio).

    O(ab_ + bb) sequential steps on four scalars."""
    t = 1.0
    for j in range(bb):
        t = t * (ba + j) / (aa + ba + j)
    acc = 0.0
    for i in range(ab_):
        acc = acc + t
        t = t * (aa + i) * (bb + i) / ((aa + ba + bb + i) * (1.0 + i))
    return acc

def q_events_bayes_ab(sf_dir: str):
    """Exact Bayesian A/B conversion analysis (Beta-Binomial, uniform
    Beta(1,1) priors): users bucket into arms by the platform's
    md5('ab|user') parity, convert iff they ever made a purchase with
    value ≥ 150, and the decision output is the EXACT posterior
    P(θ_B > θ_A) — the number a Bayesian experimentation platform
    ships instead of a p-value — plus both posterior means. ONE
    combiner pass over events reduces to the user-bounded conversion
    grid; arm assignment + the O(n_B) rational-recurrence sum run on
    the 2-row arm table driver-side (see ``beta_prob_b_beats_a`` —
    all-IEEE arithmetic, so the recursive-CTE oracle is bit-for-bit).
    Scale note: the term count is n_B+2; at 10⁹-user scale swap arms
    to sum over the smaller side or switch to the Gaussian posterior
    approximation — the dataflow (events → user grid → 2 rows) is
    unchanged."""
    import hashlib

    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type", "value"])

    def conv(df: pd.DataFrame) -> pd.DataFrame:
        c = ((df["event_type"] == "purchase")
             & (df["value"] >= 150.0)).astype("int64")
        return pd.DataFrame({"user_id": df["user_id"], "conv": c})

    users = grouped_aggregate(ds.map_batches(conv, batch_format="pandas"),
                              ["user_id"],
                              {"conv": ("conv", "max")}).to_pandas()
    arm = np.array([
        int.from_bytes(hashlib.md5(f"ab|{u}".encode()).digest()[:8],
                       "big") % 2
        for u in users["user_id"]], dtype=np.int64)
    n_a = int((arm == 0).sum())
    s_a = int(users["conv"].to_numpy()[arm == 0].sum())
    n_b = int((arm == 1).sum())
    s_b = int(users["conv"].to_numpy()[arm == 1].sum())
    aa, ba = 1 + s_a, 1 + n_a - s_a
    ab_, bb = 1 + s_b, 1 + n_b - s_b
    p = beta_prob_b_beats_a(aa, ba, ab_, bb)
    return pd.DataFrame({
        "n_a": [np.int64(n_a)], "s_a": [np.int64(s_a)],
        "n_b": [np.int64(n_b)], "s_b": [np.int64(s_b)],
        "mean_a": [round(aa / (n_a + 2.0), 6)],
        "mean_b": [round(ab_ / (n_b + 2.0), 6)],
        "p_b_beats_a": [round(p, 6)]})

QUERIES = {
    'q_events_moments': q_events_moments,
    'q_events_holt': q_events_holt,
    'q_events_interpolate': q_events_interpolate,
    'q_events_auc': q_events_auc,
    'q_events_decayed_sum': q_events_decayed_sum,
    'q_events_winsorized_mean': q_events_winsorized_mean,
    'q_events_dp_counts': q_events_dp_counts,
    'q_events_entropy_rate': q_events_entropy_rate,
    'q_events_peak_hours': q_events_peak_hours,
    'q_events_type_drift': q_events_type_drift,
    'q_events_burstiness': q_events_burstiness,
    'q_events_runs_test': q_events_runs_test,
    'q_events_best_split': q_events_best_split,
    'q_events_ks_test': q_events_ks_test,
    'q_events_attribution': q_events_attribution,
    'q_events_woe_iv': q_events_woe_iv,
    'q_events_isotonic': q_events_isotonic,
    'q_events_rate_limit': q_events_rate_limit,
    'q_events_ohlc': q_events_ohlc,
    'q_events_partition_plan': q_events_partition_plan,
    'q_events_bootstrap_ci': q_events_bootstrap_ci,
    'q_events_quantile_sketch': q_events_quantile_sketch,
    'q_events_theilsen': q_events_theilsen,
    'q_events_kanonymity': q_events_kanonymity,
    'q_events_bayes_ab': q_events_bayes_ab,
    'q_events_psi': q_events_psi,
    'q_events_debounce': q_events_debounce,
}

ORACLES = {
    'q_events_burstiness': """
            WITH h AS (
                SELECT event_type,
                       CAST(epoch_us(ts) AS BIGINT) // 3600000000
                           AS hour
                FROM events),
            c AS (SELECT event_type, hour, count(*) AS n
                  FROM h GROUP BY event_type, hour),
            sp AS (SELECT max(hour) - min(hour) + 1 AS span FROM c),
            a AS (
                SELECT event_type, sum(n) AS total,
                       sum(CAST(n AS DOUBLE) * n) AS ss
                FROM c GROUP BY event_type),
            a2 AS (
                SELECT event_type, total, ss,
                       total / (SELECT CAST(span AS DOUBLE) FROM sp)
                           AS mu
                FROM a)
            SELECT event_type, CAST(total AS BIGINT) AS n_events,
                   round(mu, 6) AS mean_per_hour,
                   round(((ss - 2.0 * mu * total
                           + (SELECT span FROM sp) * mu * mu)
                          / (SELECT span FROM sp)) / mu, 6) AS fano
            FROM a2 ORDER BY event_type
        """,
    'q_events_runs_test': """
            WITH m AS (
                SELECT quantile_cont(CAST(value AS DOUBLE), 0.5)
                    AS med
                FROM events),
            u AS (
                SELECT event_type, ts, event_id,
                       CASE WHEN CAST(value AS DOUBLE)
                                > (SELECT med FROM m)
                            THEN 1 ELSE 0 END AS up
                FROM events
                WHERE CAST(value AS DOUBLE) <> (SELECT med FROM m)),
            f AS (
                SELECT event_type, up,
                       CASE WHEN lag(up) OVER w IS NULL
                                 OR up <> lag(up) OVER w
                            THEN 1 ELSE 0 END AS rs
                FROM u WINDOW w AS (PARTITION BY event_type
                                    ORDER BY ts, event_id)),
            agg AS (
                SELECT event_type, sum(up) AS npos,
                       sum(1 - up) AS nneg, sum(rs) AS r
                FROM f GROUP BY event_type)
            SELECT event_type, CAST(npos AS BIGINT) AS n_pos,
                   CAST(nneg AS BIGINT) AS n_neg,
                   CAST(r AS BIGINT) AS n_runs,
                   round((r - (2.0 * npos * nneg / (npos + nneg)
                               + 1.0))
                         / sqrt((2.0 * npos * nneg
                                 * (2.0 * npos * nneg
                                    - (npos + nneg)))
                                / (CAST(npos + nneg AS DOUBLE)
                                   * (npos + nneg)
                                   * (npos + nneg - 1.0))), 6) AS z
            FROM agg ORDER BY event_type
        """,
    'q_events_ohlc': """
            WITH b AS (
                SELECT CAST(epoch_us(ts) AS BIGINT) // 3600000000
                           AS hour,
                       ts, event_id, CAST(value AS DOUBLE) AS v,
                       row_number() OVER (
                           PARTITION BY CAST(epoch_us(ts) AS BIGINT)
                                        // 3600000000
                           ORDER BY ts, event_id) AS rn_a,
                       row_number() OVER (
                           PARTITION BY CAST(epoch_us(ts) AS BIGINT)
                                        // 3600000000
                           ORDER BY ts DESC, event_id DESC) AS rn_d
                FROM events)
            SELECT hour,
                   max(CASE WHEN rn_a = 1 THEN v END) AS open,
                   max(v) AS high, min(v) AS low,
                   max(CASE WHEN rn_d = 1 THEN v END) AS close,
                   count(*) AS n
            FROM b GROUP BY hour ORDER BY hour
        """,
    'q_events_rate_limit': """
            WITH RECURSIVE seq AS MATERIALIZED (
                SELECT event_id, user_id,
                       CAST(epoch_us(ts) AS BIGINT) AS t,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)
                           AS rn
                FROM events),
            rec AS (
                SELECT event_id, user_id, rn, t,
                       CAST(1 AS DOUBLE) AS tokens, 1 AS admitted
                FROM seq WHERE rn = 1
                UNION ALL
                SELECT s.event_id, s.user_id, s.rn, s.t,
                       CASE WHEN least(CAST(2 AS DOUBLE), r.tokens
                                 + (s.t - r.t) / 60000000.0 * 0.005)
                                >= 1.0
                            THEN least(CAST(2 AS DOUBLE), r.tokens
                                 + (s.t - r.t) / 60000000.0 * 0.005)
                                 - 1.0
                            ELSE least(CAST(2 AS DOUBLE), r.tokens
                                 + (s.t - r.t) / 60000000.0 * 0.005)
                            END,
                       CASE WHEN least(CAST(2 AS DOUBLE), r.tokens
                                 + (s.t - r.t) / 60000000.0 * 0.005)
                                >= 1.0
                            THEN 1 ELSE 0 END
                FROM rec r JOIN seq s
                     ON s.user_id = r.user_id AND s.rn = r.rn + 1)
            SELECT event_id, CAST(admitted AS BIGINT) AS admitted,
                   round(tokens, 6) AS tokens
            FROM rec ORDER BY event_id
        """,
    'q_events_isotonic': """
            WITH lab AS (
                SELECT CAST(floor(CAST(value AS DOUBLE)) AS BIGINT)
                           AS b,
                       CASE WHEN event_type IN ('click', 'purchase')
                            THEN 1 ELSE 0 END AS y
                FROM events),
            h AS (SELECT b, count(*) AS n, sum(y) AS pos
                  FROM lab GROUP BY b),
            base AS MATERIALIZED (
                SELECT b, n, pos,
                       row_number() OVER (ORDER BY b) AS i,
                       CAST(sum(n) OVER (ORDER BY b) AS DOUBLE) AS cw,
                       CAST(sum(pos) OVER (ORDER BY b) AS DOUBLE)
                           AS cp
                FROM h),
            pairs AS MATERIALIZED (
                -- avg(s..t) over the block [s, t]
                SELECT s.i AS s, t.i AS t,
                       (t.cp - (s.cp - s.pos))
                       / (t.cw - (s.cw - s.n)) AS a
                FROM base s JOIN base t ON s.i <= t.i),
            m AS MATERIALIZED (
                -- m(s, i) = min over t >= i of avg(s..t)
                SELECT s, t AS i,
                       min(a) OVER (PARTITION BY s
                                    ORDER BY t DESC) AS mn
                FROM pairs),
            fit AS (
                -- Barlow minimax: fit(i) = max over s <= i of m(s,i)
                SELECT i, max(mn) AS fitv FROM m GROUP BY i)
            SELECT base.b AS bucket, CAST(base.n AS BIGINT) AS n,
                   CAST(base.pos AS BIGINT) AS pos,
                   round(fit.fitv, 6) AS fit
            FROM base JOIN fit USING (i)
            ORDER BY bucket
        """,
    'q_events_woe_iv': """
            WITH lab AS (
                SELECT CAST(value AS DOUBLE) AS v,
                       CASE WHEN event_type IN ('click', 'purchase')
                            THEN 1 ELSE 0 END AS y
                FROM events),
            ed AS (
                SELECT quantile_cont(v, 0.1) AS e1,
                       quantile_cont(v, 0.2) AS e2,
                       quantile_cont(v, 0.3) AS e3,
                       quantile_cont(v, 0.4) AS e4,
                       quantile_cont(v, 0.5) AS e5,
                       quantile_cont(v, 0.6) AS e6,
                       quantile_cont(v, 0.7) AS e7,
                       quantile_cont(v, 0.8) AS e8,
                       quantile_cont(v, 0.9) AS e9
                FROM lab),
            b AS (
                SELECT (CASE WHEN v > e1 THEN 1 ELSE 0 END)
                     + (CASE WHEN v > e2 THEN 1 ELSE 0 END)
                     + (CASE WHEN v > e3 THEN 1 ELSE 0 END)
                     + (CASE WHEN v > e4 THEN 1 ELSE 0 END)
                     + (CASE WHEN v > e5 THEN 1 ELSE 0 END)
                     + (CASE WHEN v > e6 THEN 1 ELSE 0 END)
                     + (CASE WHEN v > e7 THEN 1 ELSE 0 END)
                     + (CASE WHEN v > e8 THEN 1 ELSE 0 END)
                     + (CASE WHEN v > e9 THEN 1 ELSE 0 END) AS bucket,
                       y
                FROM lab, ed),
            h AS (SELECT bucket, count(*) AS n, sum(y) AS pos
                  FROM b GROUP BY bucket),
            tot AS (SELECT CAST(sum(pos) AS DOUBLE) AS pos_t,
                           CAST(sum(n - pos) AS DOUBLE) AS neg_t
                    FROM h)
            SELECT bucket, CAST(n AS BIGINT) AS n,
                   CAST(pos AS BIGINT) AS pos,
                   round(ln((pos / (SELECT pos_t FROM tot))
                            / ((n - pos) / (SELECT neg_t FROM tot))),
                         6) AS woe,
                   round(((pos / (SELECT pos_t FROM tot))
                          - ((n - pos) / (SELECT neg_t FROM tot)))
                         * ln((pos / (SELECT pos_t FROM tot))
                              / ((n - pos)
                                 / (SELECT neg_t FROM tot))), 6)
                       AS iv_term
            FROM h
            WHERE pos > 0 AND n - pos > 0
            ORDER BY bucket
        """,
    'q_events_attribution': """
            WITH p AS (
                SELECT event_id, user_id, ts FROM events
                WHERE event_type = 'purchase'),
            c AS (
                SELECT user_id, ts, event_type FROM events
                WHERE event_type <> 'purchase'),
            pair AS (
                SELECT p.event_id AS pid, p.user_id, c.event_type AS et
                FROM p JOIN c ON p.user_id = c.user_id
                     AND c.ts < p.ts
                     AND c.ts >= p.ts - INTERVAL 24 HOUR),
            k AS (SELECT pid, count(*) AS k FROM pair GROUP BY pid),
            cred AS (
                SELECT pair.et, 1.0 / k.k AS w
                FROM pair JOIN k USING (pid))
            SELECT et AS event_type, count(*) AS touches,
                   round(sum(w), 6) AS credit
            FROM cred GROUP BY et ORDER BY et
        """,
    'q_events_ks_test': """
            WITH s AS (
                SELECT CAST(value AS DOUBLE) AS v,
                       CASE WHEN event_type = 'click' THEN 1 ELSE 0
                           END AS ia,
                       CASE WHEN event_type = 'error' THEN 1 ELSE 0
                           END AS ib
                FROM events
                WHERE event_type IN ('click', 'error')),
            h AS (SELECT v, sum(ia) AS na, sum(ib) AS nb
                  FROM s GROUP BY v),
            tot AS (SELECT CAST(sum(na) AS DOUBLE) AS na,
                           CAST(sum(nb) AS DOUBLE) AS nb
                    FROM h),
            cum AS (
                SELECT v,
                       CAST(sum(na) OVER (ORDER BY v) AS DOUBLE) AS ca,
                       CAST(sum(nb) OVER (ORDER BY v) AS DOUBLE) AS cb
                FROM h),
            d AS (
                SELECT v,
                       abs(ca / (SELECT na FROM tot)
                           - cb / (SELECT nb FROM tot)) AS dv
                FROM cum)
            SELECT CAST((SELECT na FROM tot) AS BIGINT) AS n_a,
                   CAST((SELECT nb FROM tot) AS BIGINT) AS n_b,
                   round(dv, 6) AS d_stat,
                   v AS at_value,
                   round(2.0 * exp(-2.0
                       * ((SELECT na FROM tot) * (SELECT nb FROM tot)
                          / ((SELECT na FROM tot)
                             + (SELECT nb FROM tot)))
                       * dv * dv), 6) AS p_approx
            FROM d ORDER BY dv DESC, v ASC LIMIT 1
        """,
    'q_events_best_split': """
            WITH lab AS (
                SELECT CAST(value AS DOUBLE) AS v,
                       CASE WHEN event_type IN ('click', 'purchase')
                            THEN 1 ELSE 0 END AS y
                FROM events),
            h AS (SELECT v, count(*) AS n, sum(y) AS pos
                  FROM lab GROUP BY v),
            tot AS (SELECT CAST(sum(n) AS DOUBLE) AS n,
                           CAST(sum(pos) AS DOUBLE) AS pos
                    FROM h),
            cum AS (
                SELECT v,
                       CAST(sum(n) OVER (ORDER BY v) AS DOUBLE) AS nl,
                       CAST(sum(pos) OVER (ORDER BY v) AS DOUBLE)
                           AS posl
                FROM h),
            cand AS (
                SELECT v, nl, posl,
                       (SELECT n FROM tot) - nl AS nr,
                       (SELECT pos FROM tot) - posl AS posr
                FROM cum WHERE nl < (SELECT n FROM tot)),
            g AS (
                SELECT v, nl, posl, nr, posr,
                       (1.0 - (pos / n) * (pos / n)
                            - ((n - pos) / n) * ((n - pos) / n)) AS gp,
                       (1.0 - (posl / nl) * (posl / nl)
                            - ((nl - posl) / nl) * ((nl - posl) / nl))
                           AS gl,
                       (1.0 - (posr / nr) * (posr / nr)
                            - ((nr - posr) / nr) * ((nr - posr) / nr))
                           AS gr
                FROM cand, tot),
            sc AS (
                SELECT v, nl, posl, nr, posr, gp,
                       gp - (nl / (SELECT n FROM tot)) * gl
                          - (nr / (SELECT n FROM tot)) * gr AS gain
                FROM g)
            SELECT v AS threshold, round(gain, 6) AS gain,
                   round(gp, 6) AS gini_parent,
                   CAST(nl AS BIGINT) AS n_left,
                   CAST(nr AS BIGINT) AS n_right,
                   CAST(posl AS BIGINT) AS pos_left,
                   CAST(posr AS BIGINT) AS pos_right
            FROM sc ORDER BY gain DESC, v ASC LIMIT 1
        """,
    'q_events_type_drift': """
            WITH c AS (
                SELECT event_type, event_id % 2 AS half,
                       count(*) AS n
                FROM events GROUP BY event_type, event_id % 2),
            t AS (SELECT half, sum(n) AS tot FROM c GROUP BY half),
            p AS (
                SELECT et.event_type,
                       coalesce(e.n, 0)
                           / (SELECT CAST(tot AS DOUBLE) FROM t
                              WHERE half = 0) AS a,
                       coalesce(o.n, 0)
                           / (SELECT CAST(tot AS DOUBLE) FROM t
                              WHERE half = 1) AS b
                FROM (SELECT DISTINCT event_type FROM events) et
                LEFT JOIN c e ON e.event_type = et.event_type
                             AND e.half = 0
                LEFT JOIN c o ON o.event_type = et.event_type
                             AND o.half = 1)
            SELECT event_type, round(a, 6) AS share_even,
                   round(b, 6) AS share_odd,
                   round(abs(a - b), 6) AS abs_gap
            FROM p ORDER BY event_type
        """,
    'q_events_peak_hours': """
            WITH h AS (
                SELECT event_type,
                       (CAST(epoch_us(ts) AS BIGINT) // 3600000000)
                           % 24 AS hour
                FROM events),
            c AS (SELECT event_type, hour, count(*) AS n
                  FROM h GROUP BY event_type, hour),
            t AS (SELECT event_type, sum(n) AS tot
                  FROM c GROUP BY event_type),
            r AS (SELECT c.event_type, c.hour, c.n, t.tot,
                         row_number() OVER (PARTITION BY c.event_type
                             ORDER BY c.n DESC, c.hour) AS rk
                  FROM c JOIN t USING (event_type))
            SELECT event_type, CAST(hour AS BIGINT) AS peak_hour,
                   CAST(n AS BIGINT) AS peak_n,
                   round(CAST(n AS DOUBLE) / tot, 6) AS peak_share
            FROM r WHERE rk = 1 ORDER BY event_type
        """,
    'q_events_entropy_rate': """
            WITH t AS (
                SELECT user_id, event_type AS a,
                       lead(event_type) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS b
                FROM events),
            c AS (SELECT user_id, a, b, count(*) AS n
                  FROM t WHERE b IS NOT NULL
                  GROUP BY user_id, a, b),
            ca AS (SELECT user_id, a, sum(n) AS cn
                   FROM c GROUP BY user_id, a),
            tot AS (SELECT user_id, sum(n) AS tot
                    FROM c GROUP BY user_id)
            SELECT c.user_id, CAST(tot.tot AS BIGINT)
                       AS n_transitions,
                   round(-sum((CAST(c.n AS DOUBLE) / tot.tot)
                              * (log2(CAST(c.n AS DOUBLE))
                                 - log2(CAST(ca.cn AS DOUBLE)))), 6)
                       AS entropy_rate
            FROM c JOIN ca USING (user_id, a)
            JOIN tot USING (user_id)
            GROUP BY c.user_id, tot.tot ORDER BY c.user_id
        """,
    'q_events_dp_counts': """
            WITH c AS (
                SELECT event_type, count(*) AS n
                FROM events GROUP BY event_type),
            u AS (
                SELECT event_type, n,
                       (CAST('0x' || substr(md5('dp|' || event_type),
                                            1, 13) AS UBIGINT)
                        % 1000000007) / 1000000007.0 - 0.5 AS u
                FROM c)
            SELECT event_type, CAST(n AS BIGINT) AS true_n,
                   round(n + (-(1.0 / 1.0) * sign(u)
                              * ln(1.0 - 2.0 * abs(u))), 6) AS dp_n
            FROM u ORDER BY event_type
        """,
    'q_events_decayed_sum': """
            WITH t AS (SELECT max(epoch_us(ts)) AS tmax FROM events),
            w AS (
                SELECT user_id,
                       exp(-(CAST((SELECT tmax FROM t)
                                  - epoch_us(ts) AS DOUBLE)
                             / 86400000000.0)) AS wt,
                       CAST(value AS DOUBLE) AS v
                FROM events)
            SELECT user_id, round(sum(wt * v), 6) AS wsum,
                   round(sum(wt), 6) AS wtot
            FROM w GROUP BY user_id ORDER BY user_id
        """,
    'q_events_winsorized_mean': """
            WITH b AS (
                SELECT event_type,
                       quantile_cont(CAST(value AS DOUBLE), 0.05)
                           AS lo,
                       quantile_cont(CAST(value AS DOUBLE), 0.95)
                           AS hi
                FROM events GROUP BY event_type)
            SELECT e.event_type, CAST(count(*) AS BIGINT) AS n,
                   round(avg(CASE
                       WHEN CAST(value AS DOUBLE) < lo THEN lo
                       WHEN CAST(value AS DOUBLE) > hi THEN hi
                       ELSE CAST(value AS DOUBLE) END), 6)
                       AS winsorized_mean
            FROM events e JOIN b USING (event_type)
            GROUP BY e.event_type ORDER BY e.event_type
        """,
    'q_events_auc': """
            WITH s AS (
                SELECT event_id, CAST(value AS DOUBLE) AS v,
                       CASE WHEN event_type = 'purchase'
                            THEN 1 ELSE 0 END AS pos
                FROM events),
            r AS (SELECT v, pos, row_number() OVER (
                      ORDER BY v, event_id) AS rn FROM s),
            g AS (SELECT v, count(*) AS n, sum(pos) AS np,
                         avg(CAST(rn AS DOUBLE)) AS ar
                  FROM r GROUP BY v),
            agg AS (SELECT sum(np * ar) AS s, sum(np) AS p,
                           sum(n) AS t
                    FROM g)
            SELECT CAST(p AS BIGINT) AS n_pos,
                   CAST(t - p AS BIGINT) AS n_neg,
                   round((s - p * (p + 1.0) / 2.0)
                         / (p * (t - p)), 6) AS auc
            FROM agg
        """,
    'q_events_interpolate': """
            WITH o AS (
                SELECT user_id,
                       CAST(epoch(date_trunc('hour', ts)) AS BIGINT)
                           // 3600 AS h,
                       avg(CAST(value AS DOUBLE)) AS v
                FROM events GROUP BY user_id, 2),
            b AS (SELECT user_id, min(h) AS h0, max(h) AS h1
                  FROM o GROUP BY user_id),
            spine AS (
                SELECT user_id, unnest(generate_series(h0, h1)) AS h
                FROM b),
            j AS (SELECT s.user_id, s.h, o.v
                  FROM spine s LEFT JOIN o
                    ON o.user_id = s.user_id AND o.h = s.h),
            f AS (
                SELECT user_id, h, v,
                       last_value(v IGNORE NULLS) OVER w1 AS pv,
                       last_value(CASE WHEN v IS NOT NULL THEN h END
                                  IGNORE NULLS) OVER w1 AS ph,
                       first_value(v IGNORE NULLS) OVER w2 AS nv,
                       first_value(CASE WHEN v IS NOT NULL THEN h END
                                   IGNORE NULLS) OVER w2 AS nh
                FROM j WINDOW
                    w1 AS (PARTITION BY user_id ORDER BY h
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW),
                    w2 AS (PARTITION BY user_id ORDER BY h
                           ROWS BETWEEN CURRENT ROW
                           AND UNBOUNDED FOLLOWING))
            SELECT user_id, h AS hour,
                   round(CASE WHEN v IS NOT NULL THEN v
                         ELSE pv + (nv - pv)
                              * (CAST(h - ph AS DOUBLE)
                                 / CAST(nh - ph AS DOUBLE)) END,
                         6) AS value,
                   CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END
                       AS observed
            FROM f ORDER BY user_id, hour
        """,
    'q_events_moments': """
            SELECT event_type, count(*) AS n,
                   round(skewness(CAST(value AS DOUBLE)), 6) AS skew,
                   round(kurtosis(CAST(value AS DOUBLE)), 6) AS kurt
            FROM events GROUP BY event_type ORDER BY event_type
        """,
    'q_events_holt': """
            WITH RECURSIVE ord AS MATERIALIZED (
                SELECT user_id, CAST(value AS DOUBLE) AS value,
                       row_number() OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS rn
                FROM events),
            h AS (
                SELECT user_id, rn, value AS lev,
                       CAST(0.0 AS DOUBLE) AS tr
                FROM ord WHERE rn = 1
                UNION ALL
                SELECT o.user_id, o.rn,
                       0.2 * o.value + 0.8 * (h.lev + h.tr),
                       0.1 * ((0.2 * o.value + 0.8 * (h.lev + h.tr))
                              - h.lev) + 0.9 * h.tr
                FROM h JOIN ord o
                  ON o.user_id = h.user_id AND o.rn = h.rn + 1),
            last AS (
                SELECT user_id, max(rn) AS n FROM ord GROUP BY user_id)
            SELECT l.user_id, l.n,
                   round(h.lev, 6) AS level, round(h.tr, 6) AS trend
            FROM last l JOIN h ON h.user_id = l.user_id AND h.rn = l.n
            ORDER BY l.user_id
        """,
    'q_events_kanonymity': """
            WITH cls AS (
                SELECT user_id // 10 AS ubucket,
                       (CAST(epoch_us(ts) AS BIGINT) // 3600000000)
                           % 24 AS hod,
                       event_type, count(*) AS n
                FROM events GROUP BY 1, 2, 3),
            tot AS (SELECT sum(n) AS n_rows, count(*) AS n_classes,
                           min(n) AS mn
                    FROM cls),
            sm AS (SELECT count(*) AS n_small,
                          coalesce(sum(n), 0) AS at_risk
                   FROM cls WHERE n < 5)
            SELECT CAST(tot.n_rows AS BIGINT) AS n_rows,
                   CAST(tot.n_classes AS BIGINT) AS n_classes,
                   CAST(sm.n_small AS BIGINT) AS n_small_classes,
                   CAST(sm.at_risk AS BIGINT) AS rows_at_risk,
                   round(CAST(sm.at_risk AS DOUBLE) / tot.n_rows, 6)
                       AS risk_share,
                   CAST(tot.mn AS BIGINT) AS min_class
            FROM tot, sm
        """,
    'q_events_bayes_ab': """
            WITH u AS (
                SELECT user_id,
                       max(CASE WHEN event_type = 'purchase'
                                 AND value >= 150.0
                                THEN 1 ELSE 0 END) AS conv
                FROM events GROUP BY user_id),
            a AS (
                SELECT CAST(CAST('0x' || substr(md5('ab|'
                           || CAST(user_id AS VARCHAR)), 1, 16)
                           AS UBIGINT) % 2 AS BIGINT) AS arm, conv
                FROM u),
            p AS (
                SELECT CAST(COALESCE(sum(CASE WHEN arm = 0 THEN 1 END),
                                     0) AS BIGINT) AS n_a,
                       CAST(COALESCE(sum(CASE WHEN arm = 0 THEN conv
                                     END), 0) AS BIGINT) AS s_a,
                       CAST(COALESCE(sum(CASE WHEN arm = 1 THEN 1 END),
                                     0) AS BIGINT) AS n_b,
                       CAST(COALESCE(sum(CASE WHEN arm = 1 THEN conv
                                     END), 0) AS BIGINT) AS s_b
                FROM a),
            q AS (
                SELECT n_a, s_a, n_b, s_b,
                       1 + s_a AS aa, 1 + n_a - s_a AS ba,
                       1 + s_b AS ab_, 1 + n_b - s_b AS bb
                FROM p),
            -- rational term recurrence for P(theta_B > theta_A):
            -- IEEE +,*,/ only, identical step order to the engine
            -- (beta_prob_b_beats_a) so the replay is bit-for-bit
            rec AS (
                WITH RECURSIVE r(step, t, acc) AS (
                    SELECT 0, CAST(1 AS DOUBLE), CAST(0 AS DOUBLE)
                    UNION ALL
                    SELECT step + 1,
                           CASE WHEN step < (SELECT bb FROM q)
                                THEN t * ((SELECT ba FROM q) + step)
                                     / ((SELECT aa FROM q)
                                        + (SELECT ba FROM q) + step)
                                ELSE t * ((SELECT aa FROM q)
                                          + (step - (SELECT bb FROM q)))
                                     * ((SELECT bb FROM q)
                                        + (step - (SELECT bb FROM q)))
                                     / (((SELECT aa FROM q)
                                         + (SELECT ba FROM q)
                                         + (SELECT bb FROM q)
                                         + (step - (SELECT bb FROM q)))
                                        * (1.0 + (step
                                           - (SELECT bb FROM q))))
                           END,
                           CASE WHEN step < (SELECT bb FROM q) THEN acc
                                ELSE acc + t END
                    FROM r
                    WHERE step < (SELECT bb FROM q)
                                 + (SELECT ab_ FROM q))
                SELECT acc FROM r ORDER BY step DESC LIMIT 1)
            SELECT q.n_a, q.s_a, q.n_b, q.s_b,
                   round(q.aa / (q.n_a + 2.0), 6) AS mean_a,
                   round(q.ab_ / (q.n_b + 2.0), 6) AS mean_b,
                   round(rec.acc, 6) AS p_b_beats_a
            FROM q, rec
        """,
    'q_events_theilsen': """
            WITH h AS (
                SELECT CAST(epoch_us(ts) AS BIGINT) // 3600000000
                           AS hour,
                       sum(CAST(value AS DOUBLE)) AS s,
                       count(*) AS n
                FROM events GROUP BY hour),
            m AS (SELECT hour, s / n AS mu FROM h),
            p AS (
                SELECT (b.mu - a.mu)
                       / (CAST(b.hour AS DOUBLE) - a.hour) AS slope
                FROM m a JOIN m b ON a.hour < b.hour),
            mx AS (SELECT avg(CAST(hour AS DOUBLE)) AS mh,
                          avg(mu) AS mm
                   FROM m),
            ols AS (
                SELECT sum((hour - mx.mh) * (mu - mx.mm))
                       / sum((hour - mx.mh) * (hour - mx.mh)) AS sl
                FROM m, mx)
            SELECT CAST((SELECT count(*) FROM m) AS BIGINT)
                       AS n_buckets,
                   CAST((SELECT count(*) FROM p) AS BIGINT)
                       AS n_pairs,
                   round((SELECT quantile_cont(slope, 0.5) FROM p), 6)
                       AS theilsen_slope,
                   round((SELECT sl FROM ols), 6) AS ols_slope
        """,
    'q_events_partition_plan': _partition_plan_oracle_sql(),
    'q_events_bootstrap_ci': _bootstrap_ci_oracle_sql(),
    'q_events_psi': """
            WITH pr AS MATERIALIZED (
                SELECT round(unnest(quantile_cont(value,
                    [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])), 4)
                    AS p
                FROM events WHERE event_id % 2 = 0),
            bkt AS MATERIALIZED (
                SELECT event_id % 2 AS half,
                       (SELECT count(*) FROM pr WHERE p < value)
                           AS bucket
                FROM events),
            c AS (SELECT half, bucket, count(*) AS n
                  FROM bkt GROUP BY 1, 2),
            grid AS (SELECT h.half, g.bucket
                     FROM (SELECT unnest([0, 1]) AS half) h,
                          (SELECT unnest(generate_series(0, 9))
                               AS bucket) g),
            f AS (SELECT grid.half, grid.bucket,
                         coalesce(n, 0) AS n
                  FROM grid LEFT JOIN c
                    ON c.half = grid.half AND c.bucket = grid.bucket),
            tot AS (SELECT half, sum(n) AS nt FROM f GROUP BY 1),
            sh AS (SELECT f.bucket,
                          max(CASE WHEN f.half = 0
                              THEN (n + 0.5) / (nt + 5.0) END) AS p,
                          max(CASE WHEN f.half = 1
                              THEN (n + 0.5) / (nt + 5.0) END) AS q
                   FROM f JOIN tot USING (half) GROUP BY 1)
            SELECT round(sum((p - q) * ln(p / q)), 6) AS psi,
                   (SELECT count(*) FROM events
                    WHERE event_id % 2 = 0) AS n_ref,
                   (SELECT count(*) FROM events
                    WHERE event_id % 2 = 1) AS n_cur
            FROM sh
        """,
    'q_events_debounce': """
            WITH RECURSIVE ord AS MATERIALIZED (
                SELECT event_id, user_id, event_type,
                       epoch_us(ts) AS t,
                       row_number() OVER (
                           PARTITION BY user_id, event_type
                           ORDER BY ts, event_id) AS rn
                FROM events),
            k AS (
                SELECT event_id, user_id, event_type, t, rn,
                       t AS last_t, TRUE AS kept
                FROM ord WHERE rn = 1
                UNION ALL
                SELECT o.event_id, o.user_id, o.event_type, o.t, o.rn,
                       CASE WHEN o.t - k.last_t > 300000000
                            THEN o.t ELSE k.last_t END,
                       o.t - k.last_t > 300000000
                FROM k JOIN ord o
                  ON o.user_id = k.user_id
                 AND o.event_type = k.event_type
                 AND o.rn = k.rn + 1)
            SELECT event_id FROM k WHERE kept ORDER BY event_id
        """,
}
ORACLE_REGISTRY.update(ORACLES)
