"""Split of the query registry: ``events_c`` part (mechanically derived from the original queries.py by scripts/split_queries.py; unit order and source text preserved)."""

from __future__ import annotations
import re
import numpy as np
import pandas as pd
from jerex_ray.config import PipelineConfig
from jerex_ray.runtime import configure_data_context
from jerex_ray.pipelines.queries._shared import ORACLE_REGISTRY
from jerex_ray.pipelines.queries._shared import _round_half_away  # noqa: E501

def q_events_fisher(sf_dir: str):
    """Fisher's EXACT test (Fisher '35) of arm × high-value
    conversion on the pinned pilot panel (user_id < 64) — the
    small-sample companion of the chi-square/SRM audits, and exact
    with ZERO libm: every hypergeometric numerator
    N(k) = C(r1,k)·C(r2,c1−k) is an exact integer bounded by the
    Vandermonde identity Σ_k N(k) = C(n,c1) ≤ C(64,32) < 2⁶³, so
    the two-sided p-value's numerator Σ_{N(k) ≤ N(a)} N(k) and
    denominator C(n,c1) are BIGINT-exact on both engines (the
    oracle grows one Pascal row per recursive step — the
    knapsack-LIST convention — instead of factorials, which
    overflow HUGEINT past 33!); the single float is the final
    division, evaluated as float(p_num)/float(denom) to replicate
    DuckDB's CAST-then-divide bit-for-bit. One combiner pass over
    the panel-filtered events to the user grid; O(n) combinatorics
    driver-side. Scale note: the panel is pinned-size by
    construction — a corpus-scale Fisher audit samples its pilot
    panel first, same dataflow."""
    import hashlib
    import math

    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type",
                                     "value"])

    def conv(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["user_id"] < 64]          # vectorized panel filter
        c = ((df["event_type"] == "purchase")
             & (df["value"] >= 150.0)).astype("int64")
        return pd.DataFrame({"user_id": df["user_id"], "conv": c})

    users = grouped_aggregate(ds.map_batches(conv,
                                             batch_format="pandas"),
                              ["user_id"],
                              {"conv": ("conv", "max")}).to_pandas()
    arm = np.array([
        int.from_bytes(hashlib.md5(f"ab|{u}".encode()).digest()[:8],
                       "big") % 2
        for u in users["user_id"]], dtype=np.int64)
    cv = users["conv"].to_numpy(np.int64)
    r1 = int((arm == 0).sum())
    r2 = int((arm == 1).sum())
    c1 = int(cv.sum())
    a = int(cv[arm == 0].sum())
    n = r1 + r2
    na_ = math.comb(r1, a) * math.comb(r2, c1 - a)
    p_num = sum(math.comb(r1, k) * math.comb(r2, c1 - k)
                for k in range(max(0, c1 - r2), min(r1, c1) + 1)
                if math.comb(r1, k) * math.comb(r2, c1 - k) <= na_)
    denom = math.comb(n, c1)
    # float()-then-divide replicates DuckDB CAST-then-divide (a
    # Python int/int true division would round the exact rational
    # instead — 1-ulp hazard on >2^53 numerators)
    p = float(p_num) / float(denom)
    return pd.DataFrame({
        "r1": [np.int64(r1)], "r2": [np.int64(r2)],
        "c1": [np.int64(c1)], "a": [np.int64(a)],
        "p_num": [np.int64(p_num)], "denom": [np.int64(denom)],
        "p_two_sided": [round(p, 6)]})

def q_events_changepoint(sf_dir: str):
    """Single least-squares changepoint of the hourly event-count
    series (the binary-segmentation step, Scott & Knott '74 /
    ruptures' l2 model): argmin over split points of
    SSE_left + SSE_right, each SSE = Σy² − (Σy)²/len from exact
    integer prefix sums — so every candidate's cost is bit-identical
    to the SQL window oracle and the argmin cannot flip (tie →
    earliest hour). One combiner pass to the hour grid; the O(grid)
    scan is vectorized on the driver."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["ts"])

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        h = df["ts"].astype("datetime64[us]").astype("int64") \
            // 3_600_000_000
        g = pd.Series(h.to_numpy()).value_counts()
        return pd.DataFrame({"hour": g.index.to_numpy(np.int64),
                             "c": g.to_numpy(np.int64)})

    m = grouped_aggregate(
        ds.map_batches(partials, batch_format="pandas",
                       batch_size=65536),
        ["hour"], {"c": ("c", "sum")}) \
        .to_pandas().sort_values("hour").reset_index(drop=True)
    y = m["c"].to_numpy(np.float64)
    hr = m["hour"].to_numpy(np.int64)
    n = len(y)
    s = np.cumsum(y)
    s2 = np.cumsum(y * y)
    tot_s, tot_s2 = s[-1], s2[-1]
    k = np.arange(1, n)                  # left segment = [0, k)
    sse_l = s2[k - 1] - (s[k - 1] * s[k - 1]) / k
    sse_r = (tot_s2 - s2[k - 1]) \
        - ((tot_s - s[k - 1]) * (tot_s - s[k - 1])) / (n - k)
    cost = sse_l + sse_r
    best = np.lexsort((hr[k], cost))[0]  # cost ASC, hour ASC
    kb = int(k[best])
    sse_tot = tot_s2 - (tot_s * tot_s) / n
    return pd.DataFrame({
        "split_hour": [np.int64(hr[kb])],
        "n_left": [np.int64(kb)], "n_right": [np.int64(n - kb)],
        "mean_left": [round(float(s[kb - 1] / kb), 6)],
        "mean_right": [round(float((tot_s - s[kb - 1]) / (n - kb)),
                             6)],
        "sse_total": [round(float(sse_tot), 6)],
        "sse_split": [round(float(cost[best]), 6)]})

def q_events_hill_tail(sf_dir: str, *, k: int = 200):
    """Hill estimator of the value distribution's tail index (Hill
    '75) over the top-k order statistics — the heavy-tail audit that
    decides whether means/variances are even finite:
    α̂ = k / Σ ln(x_(i)/x_(k+1)). The top-(k+1) values come from a
    per-block partial top-k + single merge (no global sort); logs
    accumulate with math.log (glibc = DuckDB ln). Deterministic
    ties via value ordering only (order statistics, ids
    irrelevant); 6-decimal rounding."""
    import math

    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["value"])

    def local_top(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value"].to_numpy(np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return pd.DataFrame({"v": pd.Series(dtype="float64")})
        top = np.sort(v)[-(k + 1):]
        return pd.DataFrame({"v": top})

    def merge_top(df: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(df["v"].to_numpy(np.float64))[-(k + 1):]
        return pd.DataFrame({"v": v})

    top = grouped_apply(
        ds.map_batches(local_top, batch_format="pandas",
                       batch_size=65536),
        [], merge_top, single_block=True).to_pandas()
    v = np.sort(top["v"].to_numpy(np.float64))[::-1]
    xk1 = float(v[k])
    logs = [math.log(float(x) / xk1) for x in v[:k]]
    ssum = float(np.sum(logs))
    alpha = k / ssum
    return pd.DataFrame({
        "k": [np.int64(k)],
        "x_k1": [round(xk1, 6)],
        "log_sum": [round(ssum, 6)],
        "alpha": [round(alpha, 6)]})

def q_events_mutual_info(sf_dir: str):
    """Mutual information (nats) between event type and hour-of-day —
    the dependence audit behind 'is traffic mix time-shifted?': one
    combiner pass reduces the corpus to the type × 24-hour joint grid
    (vocabulary-bounded, never more than #types·24 rows leave the
    scan), marginals and MI = Σ p_xy·ln(p_xy/(p_x·p_y)) on the
    driver with math.log (glibc = DuckDB ln). Also H(type), H(hour)
    and the normalized NMI = MI/√(H_x·H_y); 6-decimal rounding
    absorbs the ~200-term summation-order dust."""
    import math

    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["ts", "event_type"])

    def joint(df: pd.DataFrame) -> pd.DataFrame:
        hod = (df["ts"].astype("datetime64[us]").astype("int64")
               // 3_600_000_000) % 24
        return pd.DataFrame({
            "event_type": df["event_type"].to_numpy(),
            "hod": hod.to_numpy(np.int64),
            "n": 1}).groupby(["event_type", "hod"],
                             sort=False).sum().reset_index()

    jt = grouped_aggregate(
        ds.map_batches(joint, batch_format="pandas", batch_size=65536),
        ["event_type", "hod"], {"n": ("n", "sum")}).to_pandas() \
        .sort_values(["event_type", "hod"]).reset_index(drop=True)
    n = float(jt["n"].sum())
    px = jt.groupby("event_type")["n"].sum() / n
    py = jt.groupby("hod")["n"].sum() / n
    mi = 0.0
    for t, h, c in zip(jt["event_type"], jt["hod"], jt["n"]):
        pxy = c / n
        mi += pxy * math.log(pxy / (float(px[t]) * float(py[h])))
    hx = -sum(p * math.log(p) for p in px.sort_index())
    hy = -sum(p * math.log(p) for p in py.sort_index())
    return pd.DataFrame({
        "n": [np.int64(n)],
        "h_type": [round(hx, 6)], "h_hour": [round(hy, 6)],
        "mi": [round(mi, 6)],
        "nmi": [round(mi / math.sqrt(hx * hy), 6)]})

def q_events_drawdown(sf_dir: str):
    """Maximum drawdown of the cumulative hourly net event value —
    the risk/monitoring primitive (how far below its running peak did
    the cumulative series fall, and where). EXACT integer cents
    throughout: one combiner pass to per-hour Σcents (int64), then a
    driver scan of the hour grid — cum/running-max/drawdown are all
    integer comparisons, so peak/trough selection has zero
    float-boundary hazard on either engine. Ties: largest drawdown →
    earliest trough hour; peak = earliest hour ≤ trough attaining the
    running max."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["ts", "value"])

    def hours(df: pd.DataFrame) -> pd.DataFrame:
        hr = (df["ts"].astype("datetime64[us]").astype("int64")
              // 3_600_000_000)
        cents = np.round(df["value"].to_numpy(np.float64)
                         * 100).astype(np.int64)
        return pd.DataFrame({"hour": hr.to_numpy(np.int64),
                             "c": cents}) \
            .groupby("hour", sort=False).sum().reset_index()

    g = grouped_aggregate(
        ds.map_batches(hours, batch_format="pandas", batch_size=65536),
        ["hour"], {"c": ("c", "sum")}).to_pandas() \
        .sort_values("hour").reset_index(drop=True)
    hr = g["hour"].to_numpy(np.int64)
    cum = g["c"].to_numpy(np.int64).cumsum()
    runmax = np.maximum.accumulate(cum)
    dd = runmax - cum
    ti = int(np.lexsort((hr, -dd))[0])      # dd DESC, hour ASC
    peak_cum = int(runmax[ti])
    pi = int(np.flatnonzero(cum[:ti + 1] == peak_cum)[0])
    return pd.DataFrame({
        "peak_hour": [np.int64(hr[pi])],
        "trough_hour": [np.int64(hr[ti])],
        "peak_cum": [round(peak_cum / 100.0, 2)],
        "trough_cum": [round(int(cum[ti]) / 100.0, 2)],
        "max_drawdown": [round(int(dd[ti]) / 100.0, 2)]})

def q_events_kmv_distinct(sf_dir: str, *, k: int = 64):
    """KMV (k-minimum-values) distinct-user estimate per event type
    (Bar-Yossef '02) — the mergeable bottom-k sketch companion to the
    HLL op, with an estimate the oracle can replay EXACTLY: per type
    keep the k smallest distinct md5-64 hashes of user_id; est =
    (k−1)/(h_k/2⁶⁴). h_k/2⁶⁴ is an exponent shift (exact in binary),
    so est is the identical double on both engines; fewer than k
    distinct hashes degrades to the exact count. Per-block partial
    bottom-k through the combiner; only #types·k hashes reach the
    merge."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    from jerex_ray.util import md5_hash64_batch
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_type", "user_id"])

    def local_bottom(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for t, g in df.groupby("event_type", sort=False):
            h = np.unique(md5_hash64_batch(
                g["user_id"].astype(str).to_numpy()))
            out.append(pd.DataFrame({"event_type": t, "h": h[:k]}))
        if not out:
            return pd.DataFrame({"event_type": pd.Series(dtype=object),
                                 "h": pd.Series(dtype="uint64")})
        return pd.concat(out, ignore_index=True)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for t, g in df.groupby("event_type", sort=False):
            h = np.unique(g["h"].to_numpy(np.uint64))
            nk = min(k, len(h))
            frac = float(int(h[nk - 1])) / float(1 << 64)
            est = float(nk) if nk < k else (k - 1) / frac
            rows.append((t, np.int64(nk), round(frac, 6),
                         round(est, 6)))
        return pd.DataFrame(rows, columns=["event_type", "k_used",
                                           "kth_frac", "est_distinct"])

    out = grouped_apply(
        ds.map_batches(local_bottom, batch_format="pandas",
                       batch_size=65536),
        [], merge, single_block=True).to_pandas()
    return out.sort_values("event_type").reset_index(drop=True)

def q_events_xcorr(sf_dir: str, *, max_lag: int = 3):
    """Lagged cross-correlation between the hourly count series of
    the two most frequent event types (lead/lag discovery: does type
    A's traffic predict type B's?). One combiner pass to the two
    types' (hour, count) rows; the driver zero-fills the shared dense
    hour grid (span-bounded) and computes Pearson r of (a[t],
    b[t+lag]) for lag ∈ [−max_lag, max_lag] from integer sums — only
    the final correlate divides floats, and 6-decimal rounding
    absorbs the dust. Type pick: count DESC, name ASC."""
    import math

    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["ts", "event_type"])

    def hours(df: pd.DataFrame) -> pd.DataFrame:
        hr = (df["ts"].astype("datetime64[us]").astype("int64")
              // 3_600_000_000)
        return pd.DataFrame({"event_type": df["event_type"].to_numpy(),
                             "hour": hr.to_numpy(np.int64),
                             "n": 1}) \
            .groupby(["event_type", "hour"], sort=False).sum() \
            .reset_index()

    g = grouped_aggregate(
        ds.map_batches(hours, batch_format="pandas", batch_size=65536),
        ["event_type", "hour"], {"n": ("n", "sum")}).to_pandas()
    tot = g.groupby("event_type")["n"].sum()
    ta, tb = tot.reset_index().sort_values(
        ["n", "event_type"], ascending=[False, True])["event_type"] \
        .head(2).tolist()
    hmin = int(g.loc[g["event_type"].isin([ta, tb]), "hour"].min())
    hmax = int(g.loc[g["event_type"].isin([ta, tb]), "hour"].max())
    span = hmax - hmin + 1
    a = np.zeros(span, dtype=np.int64)
    b = np.zeros(span, dtype=np.int64)
    for arr, t in ((a, ta), (b, tb)):
        sub = g[g["event_type"] == t]
        arr[sub["hour"].to_numpy(np.int64) - hmin] = \
            sub["n"].to_numpy(np.int64)
    rows = []
    for lag in range(-max_lag, max_lag + 1):
        if lag >= 0:
            x, y = a[:span - lag], b[lag:]
        else:
            x, y = a[-lag:], b[:span + lag]
        m = len(x)
        sx, sy = int(x.sum()), int(y.sum())
        sxx = int((x * x).sum())
        syy = int((y * y).sum())
        sxy = int((x.astype(np.int64) * y).sum())
        num = m * sxy - sx * sy
        den = math.sqrt(float(m * sxx - sx * sx)) \
            * math.sqrt(float(m * syy - sy * sy))
        rows.append((np.int64(lag), np.int64(m),
                     round(num / den, 6)))
    return pd.DataFrame(rows, columns=["lag", "n_hours", "r"]) \
        .sort_values("lag").reset_index(drop=True)

def _kleinberg_burst_dp(k: np.ndarray):
    """Forward Viterbi of the 2-state Kleinberg burst automaton over
    an hourly count vector: returns (c0s, c1s, states) — per-step
    min costs ending in each state and the backtracked optimal state
    sequence. Float order matches the SQL recursion exactly (see
    ``q_events_burst_dp``). Brute-force-optimality pytest-gated."""
    import math
    span = len(k)
    total = int(k.sum())
    r0 = total / span
    r1 = 2.0 * r0
    gam = math.log(float(span))
    lr0, lr1 = math.log(r0), math.log(r1)
    c0s = np.empty(span, dtype=np.float64)
    c1s = np.empty(span, dtype=np.float64)
    back0 = np.zeros(span, dtype=np.int8)
    back1 = np.ones(span, dtype=np.int8)
    c0 = r0 - float(k[0]) * lr0
    c1 = gam + (r1 - float(k[0]) * lr1)
    c0s[0], c1s[0] = c0, c1
    for t in range(1, span):
        kt = float(k[t])
        back0[t] = 0 if c0 <= c1 else 1
        back1[t] = 1 if c1 <= c0 + gam else 0
        n0 = (r0 - kt * lr0) + min(c0, c1)
        n1 = (r1 - kt * lr1) + min(c1, c0 + gam)
        c0, c1 = n0, n1
        c0s[t], c1s[t] = c0, c1
    states = np.zeros(span, dtype=np.int8)
    st = 0 if c0 <= c1 else 1
    states[span - 1] = st
    for t in range(span - 1, 0, -1):
        st = back0[t] if st == 0 else back1[t]
        states[t - 1] = st
    return c0s, c1s, states

def _top_type_hour_grid(sf_dir: str):
    """(hmin, zero-filled hourly count vector) of the most frequent
    event type — the shared reduction both burst queries start from
    (one combiner pass; only the span-bounded grid reaches the
    driver)."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["ts", "event_type"])
    tot = grouped_aggregate(
        ds.map_batches(lambda df: pd.DataFrame(
            {"event_type": df["event_type"]}), batch_format="pandas"),
        ["event_type"], {"n": (None, "count")}).to_pandas()
    top = tot.sort_values(["n", "event_type"],
                          ascending=[False, True]).iloc[0]["event_type"]

    def hours(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"] == top]
        hr = (df["ts"].astype("datetime64[us]").astype("int64")
              // 3_600_000_000)
        return pd.DataFrame({"hour": hr.to_numpy(np.int64), "n": 1}) \
            .groupby("hour", sort=False).sum().reset_index()

    g = grouped_aggregate(
        ds.map_batches(hours, batch_format="pandas",
                       batch_size=65536),
        ["hour"], {"n": ("n", "sum")}).to_pandas()
    hmin, hmax = int(g["hour"].min()), int(g["hour"].max())
    k = np.zeros(hmax - hmin + 1, dtype=np.int64)
    k[g["hour"].to_numpy(np.int64) - hmin] = g["n"].to_numpy(np.int64)
    return hmin, k

def q_events_burst_dp(sf_dir: str):
    """Kleinberg 2-state burst-detection DP (Kleinberg '02) over the
    top event type's hourly count series: state costs are Poisson
    negative log-likelihoods with the shared ln(k!) term dropped (it
    cancels in every state comparison), base rate r0 = mean hourly
    count, burst rate r1 = 2·r0, entering the burst state costs
    γ = ln(T). The corpus reduces to the span-bounded hourly grid
    through one combiner pass; the DP recursion itself is inherently
    sequential and runs on the driver over the zero-filled grid
    (span-bounded — the changepoint/Holt contract). Both engines
    execute the IDENTICAL float sequence (the recursion fixes the
    order), so the per-hour cost table matches bit-for-bit before
    the 6-dp output rounding. Backtracked burst intervals:
    ``q_events_burst_states`` (rows-only)."""
    hmin, k = _top_type_hour_grid(sf_dir)
    c0s, c1s, _ = _kleinberg_burst_dp(k)
    return pd.DataFrame({
        "hour": np.arange(hmin, hmin + len(k), dtype=np.int64),
        "k": k,
        "c0": _round_half_away(c0s, 6),
        "c1": _round_half_away(c1s, 6)})

def q_events_burst_states(sf_dir: str):
    """Backtracked Viterbi burst intervals from the
    ``q_events_burst_dp`` cost table: argmin final state, walk the
    stored decisions backwards, emit maximal burst (state-1) islands.
    Rows-only: the backward walk is not SQL-expressible on top of the
    already-oracled forward table without re-deriving it; DP
    optimality is pytest-gated by exhaustive path enumeration."""
    hmin, k = _top_type_hour_grid(sf_dir)
    _, _, states = _kleinberg_burst_dp(k)
    span = len(k)
    # maximal state-1 islands
    rows = []
    t = 0
    while t < span:
        if states[t] == 1:
            s = t
            while t + 1 < span and states[t + 1] == 1:
                t += 1
            rows.append((np.int64(hmin + s), np.int64(hmin + t),
                         np.int64(t - s + 1),
                         np.int64(int(k[s:t + 1].sum()))))
        t += 1
    return pd.DataFrame(rows, columns=["start_hour", "end_hour",
                                       "n_hours", "n_events"]) \
        .astype({"start_hour": "int64", "end_hour": "int64",
                 "n_hours": "int64", "n_events": "int64"})

def q_events_kfold_cv(sf_dir: str, *, folds: int = 5):
    """k-fold cross-validated OLS of event value against time (the
    model-eval loop every feature pipeline runs): deterministic md5
    fold assignment, and BOTH the per-fold fit and its held-out MSE
    close over ONE grouped-moments pass — train moments are
    total − fold (the leave-fold-out identity), test MSE expands to
    the same six sums, so no second corpus scan exists. Time is
    CENTERED at the exact integer midpoint of the corpus (min, max)
    epoch-µs before the moments (conditioning — see
    ``q_events_regression``); the intercept is reported back on the
    1995-01-01 axis via the shift identity. Identical float
    sequencing to the SQL oracle; half-away 6-dp rounding."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "ts", "value"])

    def bounds(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].astype("datetime64[us]").astype("int64")
        return pd.DataFrame({"k": [0], "mn": [int(us.min())],
                             "mx": [int(us.max())]})

    b = grouped_aggregate(
        ds.map_batches(bounds, batch_format="pandas"),
        ["k"], {"mn": ("mn", "min"), "mx": ("mx", "max")},
        result_hint="small").to_pandas()
    center = (int(b["mn"].iloc[0]) + int(b["mx"].iloc[0])) // 2

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        from jerex_ray.util import md5_hash64_batch
        fold = (md5_hash64_batch(
            df["event_id"].astype(str).tolist()) % folds) \
            .astype(np.int64)
        us = df["ts"].astype("datetime64[us]").astype("int64") \
            .to_numpy(np.int64)
        x = (us - center) / 86400000000.0
        y = df["value"].to_numpy(np.float64)
        g = pd.DataFrame({"fold": fold, "n": 1, "sx": x, "sy": y,
                          "sxx": x * x, "sxy": x * y, "syy": y * y})
        return g.groupby("fold", sort=False, as_index=False).sum()

    m = grouped_aggregate(
        ds.map_batches(moments, batch_format="pandas"),
        ["fold"],
        {k: (k, "sum") for k in ("n", "sx", "sy", "sxx", "sxy",
                                 "syy")}).to_pandas() \
        .sort_values("fold").reset_index(drop=True)
    tn = float(m["n"].sum())
    tsx, tsy = float(m["sx"].sum()), float(m["sy"].sum())
    tsxx = float(m["sxx"].sum())
    tsxy = float(m["sxy"].sum())
    n_tr = tn - m["n"].to_numpy(np.float64)
    sx_tr = tsx - m["sx"].to_numpy(np.float64)
    sy_tr = tsy - m["sy"].to_numpy(np.float64)
    sxx_tr = tsxx - m["sxx"].to_numpy(np.float64)
    sxy_tr = tsxy - m["sxy"].to_numpy(np.float64)
    b = (sxy_tr - sx_tr * sy_tr / n_tr) \
        / (sxx_tr - sx_tr * sx_tr / n_tr)
    a = sy_tr / n_tr - b * sx_tr / n_tr      # intercept, shifted axis
    nf = m["n"].to_numpy(np.float64)
    mse = (m["syy"].to_numpy(np.float64)
           - 2 * a * m["sy"].to_numpy(np.float64)
           - 2 * b * m["sxy"].to_numpy(np.float64)
           + nf * a * a
           + 2 * a * b * m["sx"].to_numpy(np.float64)
           + b * b * m["sxx"].to_numpy(np.float64)) / nf
    cdays = (center - 788918400000000) / 86400000000.0
    return pd.DataFrame({
        "fold": m["fold"].astype("int64"),
        "n_test": m["n"].astype("int64"),
        "slope": _round_half_away(b, 6),
        "intercept": _round_half_away(a - b * cdays, 6),
        "mse": _round_half_away(mse, 6)})

def q_events_mantel_haenszel(sf_dir: str):
    """Mantel–Haenszel pooled odds ratio (Mantel & Haenszel '59) of
    arm × high-value conversion stratified by enrollment cohort
    (user_id % 4) — the confounding-adjusted effect estimate the
    stratified A/B analysis ships when cohorts differ in base rate:
    OR_MH = Σᵢ aᵢdᵢ/nᵢ ÷ Σᵢ bᵢcᵢ/nᵢ. EXACT rational arithmetic: with
    P = Πnⱼ both sums scale to integers Σ aᵢdᵢ·(P/nᵢ) (each P/nᵢ an
    exact integer factor — no division error anywhere); the shipped
    pair is the gcd-REDUCED fraction (r_num, s_num) so the hash pins
    it without the ~n⁵ raw-sum magnitude (Python big ints / DuckDB
    HUGEINT; if even the reduced pair exceeds int64 both ship the -2
    sentinel and only the float ratio is compared); the single float
    is the final R/S division. Empty strata are SKIPPED (standard MH
    — an empty stratum contributes nothing to either sum), matching
    the SQL whose GROUP BY never emits them. One combiner pass to
    the user grid, stratum 2×2s and the O(#strata) product
    driver-side. Output: one row per NON-EMPTY stratum with the
    shared pooled columns attached (the SRM-query convention)."""
    import hashlib

    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type",
                                     "value"])

    def conv(df: pd.DataFrame) -> pd.DataFrame:
        c = ((df["event_type"] == "purchase")
             & (df["value"] >= 150.0)).astype("int64")
        return pd.DataFrame({"user_id": df["user_id"], "conv": c})

    users = grouped_aggregate(ds.map_batches(conv,
                                             batch_format="pandas"),
                              ["user_id"],
                              {"conv": ("conv", "max")}).to_pandas()
    uid = users["user_id"].to_numpy(np.int64)
    arm = np.array([
        int.from_bytes(hashlib.md5(f"ab|{u}".encode()).digest()[:8],
                       "big") % 2 for u in uid], dtype=np.int64)
    cv = users["conv"].to_numpy(np.int64)
    st = uid % 4
    rows = []
    for k in range(4):
        m = st == k
        a = int(((arm == 0) & (cv == 1) & m).sum())
        b = int(((arm == 0) & (cv == 0) & m).sum())
        c = int(((arm == 1) & (cv == 1) & m).sum())
        d = int(((arm == 1) & (cv == 0) & m).sum())
        if a + b + c + d > 0:          # standard MH: skip empty strata
            rows.append([k, a, b, c, d, a + b + c + d])
    import math
    ns = [r[5] for r in rows]
    P = math.prod(ns)                  # over non-empty strata only
    r_num = sum(r[1] * r[4] * (P // r[5]) for r in rows)
    s_num = sum(r[2] * r[3] * (P // r[5]) for r in rows)
    or_mh = (-1.0 if s_num == 0
             else float(r_num) / float(s_num))
    gg = math.gcd(r_num, s_num) or 1
    r_red, s_red = r_num // gg, s_num // gg
    if max(r_red, s_red) > (1 << 63) - 1:   # still past int64: sentinel
        r_red = s_red = -2
    out = pd.DataFrame(rows, columns=["stratum", "a", "b", "c",
                                      "d", "n"])
    out["r_num"] = np.int64(r_red)
    out["s_num"] = np.int64(s_red)
    out["or_mh"] = round(or_mh, 6)
    return out.astype({c_: "int64" for c_ in
                       ["stratum", "a", "b", "c", "d", "n",
                        "r_num", "s_num"]})

def hurst_rs_levels(y: np.ndarray, ns=(16, 32, 64, 128)):
    """R/S analysis core (Hurst '51; Mandelbrot & Wallis '69): for
    each window size n, partition the series into full blocks and
    compute the rescaled range — which on the n-scaled integer grid
    collapses to R/S = Rn/√Vn with Rn = max−min of the EXACT
    integers n·prefix_t − t·S and Vn = n·Σx² − S² (the Yule-Walker
    scaling trick), one IEEE sqrt + division per block; constant
    blocks (Vn = 0) are skipped. Per-n block sums accumulate in
    block order (left-assoc — the recursive-CTE contract). Returns
    ([(n, n_blocks, acc)], hurst) where hurst is the 4-point OLS
    slope of ln(avg R/S) on ln n in one fixed expression, or -1.0
    if any level has no usable block."""
    import math

    levels = []
    for n in ns:
        acc, cnt = 0.0, 0
        for b in range(len(y) // n):
            blk = y[b * n:(b + 1) * n]
            s = int(blk.sum())
            s2 = int((blk * blk).sum())
            pref = np.cumsum(blk)
            tl = np.arange(1, n + 1)
            nz = n * pref - tl * s
            rn = int(nz.max() - nz.min())
            vn = n * s2 - s * s
            if vn > 0:
                acc = acc + rn / math.sqrt(float(vn))
                cnt += 1
        levels.append((int(n), cnt, acc))
    if any(cnt == 0 for _, cnt, _ in levels):
        return levels, -1.0
    xs = [math.log(float(n)) for n, _, _ in levels]
    ys = [math.log(acc / cnt) for _, cnt, acc in levels]
    sx = xs[0] + xs[1] + xs[2] + xs[3]
    sy = ys[0] + ys[1] + ys[2] + ys[3]
    sxy = (xs[0] * ys[0] + xs[1] * ys[1] + xs[2] * ys[2]
           + xs[3] * ys[3])
    sxx = (xs[0] * xs[0] + xs[1] * xs[1] + xs[2] * xs[2]
           + xs[3] * xs[3])
    return levels, (4.0 * sxy - sx * sy) / (4.0 * sxx - sx * sx)

def q_events_hurst(sf_dir: str):
    """Hurst exponent by R/S analysis (Hurst '51 — the Nile
    reservoir problem; Mandelbrot & Wallis '69) of the hourly
    event-count series — the long-range-dependence audit completing
    the temporal family beside autocorrelation / periodogram /
    Yule-Walker / matrix profile: H ≈ 0.5 means memoryless traffic,
    H > 0.5 persistent bursts (capacity must be planned on ranges,
    not means — Hurst's original point). SQL-oracled bit-for-bit:
    on the n-scaled grid R/S = Rn/√Vn from two exact integers per
    block (see ``hurst_rs_levels``), block sums replay in order via
    per-level recursive CTEs, and the 4-point log-log OLS slope is
    one fixed float expression. ONE combiner pass to the
    time-bounded hour grid; O(T·#levels) driver arithmetic."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = (df["ts"].astype("datetime64[us]").astype("int64")
             // 3_600_000_000).to_numpy(np.int64)
        g = pd.DataFrame({"h": h, "n": np.int64(1)}) \
            .groupby("h", sort=False, as_index=False).sum()
        return g.astype({"h": "int64", "n": "int64"})

    g = grouped_aggregate(
        ds.map_batches(partial, batch_format="pandas",
                       batch_size=65536),
        ["h"], {"n": ("n", "sum")}, result_hint="small").to_pandas()
    h0 = int(g["h"].min())
    T = int(g["h"].max()) - h0 + 1
    y = np.zeros(T, dtype=np.int64)
    y[g["h"].to_numpy(np.int64) - h0] = g["n"].to_numpy(np.int64)
    levels, hurst = hurst_rs_levels(y)
    out = pd.DataFrame(levels, columns=["n", "n_blocks", "acc"])
    out["avg_rs"] = [
        round(a / c, 6) if c else -1.0
        for a, c in zip(out["acc"], out["n_blocks"])]
    out = out.drop(columns=["acc"])
    out["hurst"] = round(hurst, 6)
    return out.astype({"n": "int64", "n_blocks": "int64"})

def q_events_kendall_w(sf_dir: str):
    """Kendall's coefficient of concordance W (Kendall & Babington
    Smith '39, tie-corrected) of the 7 weekdays ranking the 24
    hours-of-day by traffic — the inter-rater member completing the
    correlation family beside Spearman/Kendall-τ/Cohen-κ: do
    weekdays agree on the daily schedule (W = 1 identical rankings,
    0 no agreement)? Exactness: doubled average ranks 2·lo + t + 1
    are exact integers per judge (the Mann-Whitney convention),
    ΣR₂² and the tie term Σ(t³−t) ship as exact integers, and the
    4-scaled closed form W = 3(ΣR₂² − k²n(n+1)²) /
    (k²n(n²−1) − kΣT) is ONE integer ratio — the only float is the
    final division. Judges partition identically on both engines
    regardless of weekday labeling (pandas Monday-0 vs DuckDB
    Sunday-0 relabels, never repartitions). ONE combiner pass to
    the zero-filled 7×24 grid; O(7·24) driver arithmetic."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = df["ts"].astype("datetime64[us]")
        return pd.DataFrame({
            "dow": t.dt.dayofweek.astype("int64"),
            "hod": t.dt.hour.astype("int64"),
            "n": np.ones(len(df), dtype=np.int64)})

    g = grouped_aggregate(
        ds.map_batches(partial, batch_format="pandas"),
        ["dow", "hod"], {"n": ("n", "sum")}).to_pandas()
    grid = np.zeros((7, 24), dtype=np.int64)
    for r in g.itertuples():
        grid[int(r.dow), int(r.hod)] = int(r.n)
    k, n = 7, 24
    r2 = np.zeros(n, dtype=np.int64)
    tie_term = 0
    for j in range(k):
        v = grid[j]
        lo = (v[None, :] < v[:, None]).sum(axis=1)
        t = (v[None, :] == v[:, None]).sum(axis=1)
        r2 += 2 * lo + t + 1
        _, cnts = np.unique(v, return_counts=True)
        tie_term += int((cnts ** 3 - cnts).sum())
    sum_r2sq = int((r2.astype(object) ** 2).sum())
    num = 3 * (sum_r2sq - k * k * n * (n + 1) * (n + 1))
    den = k * k * n * (n * n - 1) - k * tie_term
    w = -1.0 if den == 0 else float(num) / float(den)
    return pd.DataFrame({
        "k_judges": [np.int64(k)], "n_items": [np.int64(n)],
        "sum_r2sq": [np.int64(sum_r2sq)],
        "tie_term": [np.int64(tie_term)],
        "w": [round(w, 6)]})

def q_events_max_excess_window(sf_dir: str):
    """Maximum excess-load window (Kadane '84 / Bentley's Programming
    Pearls maximum-subarray, in prefix-min form) over the hourly
    series — 'the contiguous stretch most above average load', the
    burst-localization companion of the Kleinberg burst DP and the
    drawdown query: on the T-scaled grid dₜ = T·yₜ − S the best
    window sum is max over t of prefₜ − min(0, pref₍<t₎) — EXACT
    integers end-to-end, expressible with window functions alone
    (no recursion). Ties: (sum DESC, end ASC), start = the EARLIEST
    index achieving the strict prefix minimum (mirrored by the
    strict-< update rule / the mn < 0 guard both sides). The only
    float is the final best_sum/T excess-events division. ONE
    combiner pass to the time-bounded hour grid; O(T) driver scan."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = (df["ts"].astype("datetime64[us]").astype("int64")
             // 3_600_000_000).to_numpy(np.int64)
        g = pd.DataFrame({"h": h, "n": np.int64(1)}) \
            .groupby("h", sort=False, as_index=False).sum()
        return g.astype({"h": "int64", "n": "int64"})

    g = grouped_aggregate(
        ds.map_batches(partial, batch_format="pandas",
                       batch_size=65536),
        ["h"], {"n": ("n", "sum")}, result_hint="small").to_pandas()
    h0 = int(g["h"].min())
    T = int(g["h"].max()) - h0 + 1
    y = np.zeros(T, dtype=np.int64)
    y[g["h"].to_numpy(np.int64) - h0] = g["n"].to_numpy(np.int64)
    S = int(y.sum())
    d = T * y - S
    pref = np.cumsum(d)
    best = None
    minpref, minidx = 0, -1
    for t in range(T):
        cand = (-(int(pref[t]) - minpref), t, minidx + 1)
        if best is None or cand < best:
            best = cand
        if pref[t] < minpref:          # strict: earliest min wins
            minpref, minidx = int(pref[t]), t
    bsum, end, start = -best[0], best[1], best[2]
    return pd.DataFrame({
        "best_sum_scaled": [np.int64(bsum)],
        "start_hour": [np.int64(h0 + start)],
        "end_hour": [np.int64(h0 + end)],
        "window_len": [np.int64(end - start + 1)],
        "excess_events": [round(float(bsum) / float(T), 6)]})

def q_events_control_chart(sf_dir: str):
    """Shewhart control chart with the four Western Electric rules
    (Shewhart '31; Western Electric handbook '56) over the hourly
    event-count series — the SPC alarm census beside CUSUM/EWMA:
    rule 1 = a point beyond ±3σ, rule 2 = 2 of 3 beyond ±2σ same
    side, rule 3 = 4 of 5 beyond ±1σ same side, rule 4 = 8
    consecutive on one side of the mean. ZERO floats: on the
    T-scaled grid dₜ = T·yₜ − S has T·σ = √(T·ΣY²−S²), so every
    σ-band test is an integer comparison d² > k²·(TΣy²−S²) (the
    Yule-Walker scaling trick) and the windowed 2-of-3 / 4-of-5 /
    8-run logic is integer rolling sums — the SQL oracle replays
    every alarm with window functions. ONE combiner pass to the
    time-bounded hour grid; O(T) vectorized driver work. Output:
    per-rule violation count and first alarm hour (−1 = clean)."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = (df["ts"].astype("datetime64[us]").astype("int64")
             // 3_600_000_000).to_numpy(np.int64)
        g = pd.DataFrame({"h": h, "n": np.int64(1)}) \
            .groupby("h", sort=False, as_index=False).sum()
        return g.astype({"h": "int64", "n": "int64"})

    g = grouped_aggregate(
        ds.map_batches(partial, batch_format="pandas",
                       batch_size=65536),
        ["h"], {"n": ("n", "sum")}, result_hint="small").to_pandas()
    h0 = int(g["h"].min())
    T = int(g["h"].max()) - h0 + 1
    y = np.zeros(T, dtype=np.int64)
    y[g["h"].to_numpy(np.int64) - h0] = g["n"].to_numpy(np.int64)
    S = int(y.sum())
    V = T * int((y * y).sum()) - S * S      # (T·σ)² exactly
    d = T * y - S
    d2 = d * d

    def roll(b: np.ndarray, w: int) -> np.ndarray:
        c = np.cumsum(np.r_[0, b.astype(np.int64)])
        out = np.zeros(len(b), dtype=np.int64)
        out[w - 1:] = c[w:] - c[:-w]
        return out

    r1 = d2 > 9 * V
    b2p, b2n = (d > 0) & (d2 > 4 * V), (d < 0) & (d2 > 4 * V)
    r2 = (roll(b2p, 3) >= 2) | (roll(b2n, 3) >= 2)
    b1p, b1n = (d > 0) & (d2 > V), (d < 0) & (d2 > V)
    r3 = (roll(b1p, 5) >= 4) | (roll(b1n, 5) >= 4)
    side = np.sign(d).astype(np.int64)
    ssum = roll(side, 8)
    r4 = (np.abs(ssum) == 8)
    r4[:7] = False
    rows = []
    for rule, flags in ((1, r1), (2, r2), (3, r3), (4, r4)):
        idx = np.nonzero(flags)[0]
        rows.append((rule, int(flags.sum()),
                     int(h0 + idx[0]) if len(idx) else -1))
    return pd.DataFrame(rows, columns=["rule", "n_violations",
                                       "first_hour"]) \
        .astype({"rule": "int64", "n_violations": "int64",
                 "first_hour": "int64"})

def q_events_conformal(sf_dir: str, *, alpha: float = 0.1):
    """Split-conformal prediction interval (Vovk et al. '05;
    Papadopoulos et al. '02) around the seasonal-naive hourly
    forecast ŷ_t = y_{t−24} — the distribution-free uncertainty
    audit an ML-ops pass wraps around ANY point forecaster: the
    first half of the valid hours calibrates the absolute-residual
    quantile q̂ (the ⌈(n+1)(1−α)⌉-th smallest score, an EXACT
    integer order statistic), the second half tests, and marginal
    coverage ≥ 1−α holds by exchangeability with NO model
    assumptions. Everything is exact integers — residuals, q̂, the
    covered-count census — except the single coverage division.
    ONE combiner pass to the time-bounded hour grid; O(T) driver
    work."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = (df["ts"].astype("datetime64[us]").astype("int64")
             // 3_600_000_000).to_numpy(np.int64)
        g = pd.DataFrame({"h": h, "n": np.int64(1)}) \
            .groupby("h", sort=False, as_index=False).sum()
        return g.astype({"h": "int64", "n": "int64"})

    g = grouped_aggregate(
        ds.map_batches(partial, batch_format="pandas",
                       batch_size=65536),
        ["h"], {"n": ("n", "sum")}, result_hint="small").to_pandas()
    h0 = int(g["h"].min())
    T = int(g["h"].max()) - h0 + 1
    y = np.zeros(T, dtype=np.int64)
    y[g["h"].to_numpy(np.int64) - h0] = g["n"].to_numpy(np.int64)
    resid = np.abs(y[24:] - y[:-24])     # scores for t >= 24
    n_valid = len(resid)
    n_cal = n_valid // 2
    cal, test = resid[:n_cal], resid[n_cal:]
    if n_cal == 0 or len(test) == 0:
        # grid spans <= 25 hours: nothing to calibrate/test — the
        # -1 sentinel row (secretary/cindex convention)
        return pd.DataFrame({
            "n_cal": [np.int64(n_cal)],
            "n_test": [np.int64(len(test))],
            "qhat": [np.int64(-1)],
            "n_covered": [np.int64(-1)],
            "coverage": [-1.0]})
    # ceil((n+1)(1-alpha)) as integers: alpha = 1/10
    rank = -(-((n_cal + 1) * 9) // 10)   # ceil via neg-floordiv
    rank = min(rank, n_cal)
    qhat = int(np.sort(cal, kind="stable")[rank - 1])
    n_cov = int((test <= qhat).sum())
    return pd.DataFrame({
        "n_cal": [np.int64(n_cal)],
        "n_test": [np.int64(len(test))],
        "qhat": [np.int64(qhat)],
        "n_covered": [np.int64(n_cov)],
        "coverage": [round(float(n_cov) / float(len(test)), 6)]})

def q_events_gumbel(sf_dir: str):
    """Gumbel extreme-value fit of DAILY-maximum hourly load
    (Gumbel '58; Fisher–Tippett '28 type I) by method of moments —
    the EVT capacity audit beside the Hurst/quantile family: fit
    the block-maxima law and ship the 30-day and 365-day return
    levels ('the hourly peak exceeded once a month / once a year'),
    which is how capacity is planned on extremes rather than means.
    Exactness: 24-hour block maxima, their sum S and square sum S2
    are exact integers from the zero-filled grid; σ̂ = s·√6/π and
    μ̂ = m̄ − γσ̂ (γ = 0.5772156649015329) and the return levels
    μ̂ − σ̂·ln(−ln(1−1/T)) are ONE fixed float expression each
    (sqrt IEEE-exact, ln/pi glibc-identical across engines). ONE
    combiner pass to the time-bounded hour grid; O(T) driver
    arithmetic."""
    import math

    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = (df["ts"].astype("datetime64[us]").astype("int64")
             // 3_600_000_000).to_numpy(np.int64)
        g = pd.DataFrame({"h": h, "n": np.int64(1)}) \
            .groupby("h", sort=False, as_index=False).sum()
        return g.astype({"h": "int64", "n": "int64"})

    g = grouped_aggregate(
        ds.map_batches(partial, batch_format="pandas",
                       batch_size=65536),
        ["h"], {"n": ("n", "sum")}, result_hint="small").to_pandas()
    h0 = int(g["h"].min())
    T = int(g["h"].max()) - h0 + 1
    y = np.zeros(T, dtype=np.int64)
    y[g["h"].to_numpy(np.int64) - h0] = g["n"].to_numpy(np.int64)
    B = T // 24
    mx = y[:B * 24].reshape(B, 24).max(axis=1)
    S = int(mx.sum())
    S2 = int((mx * mx).sum())
    if B < 2:
        # fewer than two complete daily blocks: the method-of-moments
        # variance needs B*(B-1) > 0 — sentinel row (conformal
        # convention)
        return pd.DataFrame({
            "n_days": [np.int64(B)], "s_sum": [np.int64(S)],
            "s2_sum": [np.int64(S2)],
            "max_daily_peak": [np.int64(int(mx.max()) if B else -1)],
            "mu": [-1.0], "sigma": [-1.0],
            "rl_30d": [-1.0], "rl_365d": [-1.0]})
    mbar = float(S) / float(B)
    v = B * S2 - S * S
    s = math.sqrt(float(v) / (B * (B - 1)))
    sigma = s * math.sqrt(6.0) / math.pi
    mu = mbar - 0.5772156649015329 * sigma
    rl30 = mu - sigma * math.log(-math.log(1.0 - 1.0 / 30.0))
    rl365 = mu - sigma * math.log(-math.log(1.0 - 1.0 / 365.0))
    return pd.DataFrame({
        "n_days": [np.int64(B)], "s_sum": [np.int64(S)],
        "s2_sum": [np.int64(S2)],
        "max_daily_peak": [np.int64(int(mx.max()))],
        "mu": [round(mu, 6)], "sigma": [round(sigma, 6)],
        "rl_30d": [round(rl30, 6)], "rl_365d": [round(rl365, 6)]})

def q_events_cochran_armitage(sf_dir: str):
    """Cochran–Armitage trend test (Cochran '54; Armitage '55) of
    high-value conversion across ORDERED purchase-intensity strata
    g = min(n_purchases//5, 3) — the dose-response member of the
    chi-square/Fisher/McNemar/MH testing family (chi-square ignores
    order; CA asks 'does conversion RISE with activity'). Exactness:
    with integer scores w = g, T = Σ w(aN − nA) and
    V2 = N·Σw²n − (Σwn)² are exact integers (Python big ints /
    HUGEINT — T²N exceeds int64 past sf0.1), shipped in the result;
    Z² = T²N / (A(N−A)V2) is ONE CAST-then-divide float, identical
    both engines. One combiner pass to the user grid, a ≤4-row group
    census, O(1) driver arithmetic."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type",
                                     "value"])

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        isp = (df["event_type"] == "purchase")
        return pd.DataFrame({
            "user_id": df["user_id"],
            "n_p": isp.astype("int64"),
            "conv": (isp & (df["value"] >= 150.0)).astype("int64")})

    users = grouped_aggregate(
        ds.map_batches(per_user, batch_format="pandas"),
        ["user_id"],
        {"n_p": ("n_p", "sum"), "conv": ("conv", "max")}).to_pandas()
    g = np.minimum(users["n_p"].to_numpy(np.int64) // 5, 3)
    cv = users["conv"].to_numpy(np.int64)
    rows = [(k, int((g == k).sum()), int(cv[g == k].sum()))
            for k in range(4) if (g == k).any()]
    N = sum(r[1] for r in rows)
    A = sum(r[2] for r in rows)
    T = sum(k * (a * N - n * A) for k, n, a in rows)
    v2 = N * sum(k * k * n for k, n, _ in rows) \
        - sum(k * n for k, n, _ in rows) ** 2
    den = A * (N - A) * v2
    z2 = -1.0 if den == 0 else float(T * T * N) / float(den)
    out = pd.DataFrame(rows, columns=["g", "n", "a"])
    out["t_stat"] = np.int64(T)
    out["v2"] = np.int64(v2)
    out["z2"] = round(z2, 6)
    out["flag"] = np.int64(z2 > 3.841459)
    return out.astype({c: "int64" for c in
                       ["g", "n", "a", "t_stat", "v2", "flag"]})

def q_events_seasonal_naive(sf_dir: str, *, season: int = 168):
    """Seasonal-naive forecast backtest with MASE (Hyndman &
    Koehler '06) over the top event type's hourly series: forecast
    k(t) = k(t−168) (same hour last week), error scaled by the naive
    random-walk error k(t−1) — the standard "is your forecaster
    better than last week's value" gate. All sums are exact integers
    over the zero-filled dense grid (one combiner pass); only the
    final MASE ratio divides floats."""
    hmin, k = _top_type_hour_grid(sf_dir)
    span = len(k)
    sae_s = int(np.abs(k[season:] - k[:-season]).sum()) \
        if span > season else 0
    n_s = max(span - season, 0)
    sae_1 = int(np.abs(k[1:] - k[:-1]).sum()) if span > 1 else 0
    n_1 = max(span - 1, 0)
    mase = (sae_s / n_s) / (sae_1 / n_1) if n_s and sae_1 else 0.0
    return pd.DataFrame({
        "n_eval": [np.int64(n_s)],
        "sae_seasonal": [np.int64(sae_s)],
        "sae_naive1": [np.int64(sae_1)],
        "mase": [_round_half_away(np.float64(mase), 6)]})

def q_events_enrichment(sf_dir: str, *, threshold: float = 50.0):
    """Fisher-exact enrichment of high-value events (value ≥ 50) per
    event type — the GO-enrichment / over-representation test shape:
    right-tail hypergeometric p = Σᵢ exp(lnC(K,i)+lnC(N−K,n−i)
    −lnC(N,n)) via lgamma (bit-identical glibc on both engines), plus
    the ratio (k/n)/(K/N). One combiner pass to per-type (n, k)
    counts; the tail sums run over type-bounded grids."""
    import math

    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_type", "value"])

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        hi = (df["value"].to_numpy(np.float64)
              >= threshold).astype(np.int64)
        return pd.DataFrame({"event_type": df["event_type"]
                             .to_numpy(), "n": np.int64(1), "k": hi}) \
            .groupby("event_type", sort=False, as_index=False).sum()

    m = grouped_aggregate(
        ds.map_batches(partials, batch_format="pandas"),
        ["event_type"], {"n": ("n", "sum"), "k": ("k", "sum")}) \
        .to_pandas().sort_values("event_type").reset_index(drop=True)
    N = int(m["n"].sum())
    K = int(m["k"].sum())

    def lnC(a, b):
        return (math.lgamma(a + 1.0) - math.lgamma(b + 1.0)
                - math.lgamma(a - b + 1.0))

    rows = []
    for r in m.itertuples(index=False):
        n, k = int(r.n), int(r.k)
        hi = min(K, n)
        p = 0.0
        for i in range(k, hi + 1):
            p = p + math.exp(lnC(K, i) + lnC(N - K, n - i)
                             - lnC(N, n))
        ratio = (k / n) / (K / N)
        rows.append((r.event_type, np.int64(n), np.int64(k),
                     float(_round_half_away(ratio, 6)),
                     float(_round_half_away(p, 6))))
    return pd.DataFrame(rows, columns=["event_type", "n", "k",
                                       "ratio", "p_value"])

def q_events_ams_f2(sf_dir: str):
    """AMS second-frequency-moment sketch of the user-id stream
    (Alon–Matias–Szegedy '96, the tug-of-war sketch): 16 ±1-sign
    estimators from independent md5 bits, each Z_j = Σ rows sign_j —
    the classic self-join-size / skew estimator a planner consults
    before committing a join. Median-of-means over 4 groups of 4; the
    only divides are by 4 and 8 (exact binary), so the estimate is the
    identical double in SQL. Exact F2 = Σ_u c_u² from a user-vocab
    bounded combiner pass for the audit column. Cross-cluster state:
    16 integers (plus the user-count table for the exact leg)."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    from jerex_ray.util import md5_hash64_batch
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id"])

    def signs_partial(df: pd.DataFrame) -> pd.DataFrame:
        h = md5_hash64_batch(
            ("ams|" + df["user_id"].astype("int64").astype(str))
            .to_numpy())
        js = np.arange(16, dtype=np.uint64)
        # (B, 16) sign matrix: +1 where bit j of md5 is set, else −1
        bits = ((h[:, None] >> js[None, :]) & np.uint64(1)) \
            .astype(np.int64)
        z = (2 * bits - 1).sum(axis=0)
        return pd.DataFrame({"j": np.arange(16, dtype=np.int64),
                             "z": z, "n": np.int64(len(df))})

    zt = grouped_aggregate(
        ds.map_batches(signs_partial, batch_format="pandas",
                       batch_size=65536),
        ["j"], {"z": ("z", "sum"), "n": ("n", "sum")},
        result_hint="small").to_pandas().sort_values("j")
    z = zt["z"].to_numpy(np.int64)
    n_rows = int(zt["n"].iloc[0])       # same total replicated per j
    # group sums of squares (python ints: overflow-proof)
    s4 = [sum(int(z[4 * g + i]) ** 2 for i in range(4))
          for g in range(4)]
    s4s = sorted(s4)
    est = float(s4s[1] + s4s[2]) / 8.0    # median of means, /4 then /2
    counts = grouped_aggregate(
        ds, ["user_id"], {"c": (None, "count")},
        result_hint="small").to_pandas()
    exact = sum(int(c) ** 2 for c in counts["c"])
    return pd.DataFrame({
        "n_rows": [np.int64(n_rows)],
        "exact_f2": [np.int64(exact)],
        "est_f2": [est],
        "rel_err": [round(abs(est - exact) / exact, 6)]})

def q_events_kmv_overlap(sf_dir: str, *, k: int = 64):
    """KMV set-operation estimates between the top-3 event types'
    user sets (Beyer et al. '07 §4, the mergeable-distinct-sketch
    algebra): per type keep the bottom-k distinct md5-64 user hashes;
    per pair the union sketch is the bottom-k of the merged hash set,
    K∩ counts union-sketch members present in BOTH sides, jaccard_est
    = K∩/k′ and union_est = (k′−1)/frac(h_k′). Exact jaccard rides a
    per-user type-bitmask pass (types are vocabulary-bounded, so the
    bitmask histogram is ≤2^#types rows). Only #types·k hashes and the
    bitmask histogram reach the driver. Type pick: count DESC, name
    ASC; pair order by (rank_a, rank_b)."""
    from jerex_ray.functions.aggregate import grouped_aggregate, \
        grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    from jerex_ray.util import md5_hash64_batch
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_type", "user_id"])

    tc = grouped_aggregate(ds, ["event_type"],
                           {"c": (None, "count")},
                           result_hint="small").to_pandas()
    tc = tc.sort_values(["c", "event_type"],
                        ascending=[False, True]).reset_index(drop=True)
    top = list(tc["event_type"].head(3))

    def local_bottom(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for t, g in df.groupby("event_type", sort=False):
            if t not in top:
                continue
            h = np.unique(md5_hash64_batch(
                g["user_id"].astype("int64").astype(str).to_numpy()))
            out.append(pd.DataFrame({"event_type": t, "h": h[:k]}))
        if not out:
            return pd.DataFrame({"event_type": pd.Series(dtype=object),
                                 "h": pd.Series(dtype="uint64")})
        return pd.concat(out, ignore_index=True)

    def merge_bottom(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for t, g in df.groupby("event_type", sort=False):
            h = np.unique(g["h"].to_numpy(np.uint64))[:k]
            rows.append(pd.DataFrame({"event_type": t, "h": h}))
        return pd.concat(rows, ignore_index=True)

    sk = grouped_apply(
        ds.map_batches(local_bottom, batch_format="pandas",
                       batch_size=65536),
        [], merge_bottom, single_block=True).to_pandas()
    sketches = {t: set(g["h"].tolist())
                for t, g in sk.groupby("event_type")}

    # exact per-pair jaccard via the per-user membership bitmask
    t_index = {t: i for i, t in enumerate(top)}

    def _or_by_user(u: np.ndarray, m: np.ndarray) -> tuple:
        order = np.argsort(u, kind="stable")
        u, m = u[order], m[order]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        return u[starts], np.bitwise_or.reduceat(m, starts)

    def mask_partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["event_type"].isin(top)]
        if not len(d):
            return pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                                 "mask": pd.Series(dtype="int64")})
        m = np.left_shift(
            np.int64(1),
            d["event_type"].map(t_index).to_numpy(np.int64))
        u, masks = _or_by_user(d["user_id"].to_numpy(np.int64), m)
        return pd.DataFrame({"user_id": u, "mask": masks})

    def mask_merge(df: pd.DataFrame) -> pd.DataFrame:
        u, masks = _or_by_user(df["user_id"].to_numpy(np.int64),
                               df["mask"].to_numpy(np.int64))
        vals, cnt = np.unique(masks, return_counts=True)
        return pd.DataFrame({"mask": vals, "n": cnt.astype(np.int64)})

    hist = grouped_apply(
        ds.map_batches(mask_partial, batch_format="pandas",
                       batch_size=65536),
        [], mask_merge, single_block=True).to_pandas()
    mask_n = dict(zip(hist["mask"].astype(int), hist["n"].astype(int)))

    rows = []
    for ia in range(len(top)):
        for ib in range(ia + 1, len(top)):
            a, b = top[ia], top[ib]
            sa, sb = sketches.get(a, set()), sketches.get(b, set())
            uni = np.array(sorted(sa | sb), dtype=np.uint64)[:k]
            kp = len(uni)
            both = set(uni.tolist()) & sa & sb
            j_est = len(both) / kp if kp else 0.0
            frac = float(int(uni[-1])) / float(1 << 64) if kp else 1.0
            u_est = float(kp) if kp < k else (k - 1) / frac
            inter = sum(n for m, n in mask_n.items()
                        if (m >> ia) & 1 and (m >> ib) & 1)
            union = sum(n for m, n in mask_n.items()
                        if (m >> ia) & 1 or (m >> ib) & 1)
            rows.append((a, b, np.int64(kp), np.int64(len(both)),
                         round(j_est, 6), round(u_est, 6),
                         round(inter / union, 6) if union else 0.0))
    return pd.DataFrame(rows, columns=[
        "type_a", "type_b", "k_used", "k_common",
        "jaccard_est", "union_est", "jaccard_exact"])

def _dtw_table(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Integer DTW DP table (Sakoe & Chiba '78): dp[i,j] =
    |a_i − b_j| + min(dp[i−1,j], dp[i,j−1], dp[i−1,j−1]), first
    row/column cumulative. All int64 — no float anywhere."""
    n, m = len(a), len(b)
    cost = np.abs(a[:, None].astype(np.int64)
                  - b[None, :].astype(np.int64))
    dp = np.zeros((n, m), dtype=np.int64)
    dp[0, 0] = cost[0, 0]
    for j in range(1, m):
        dp[0, j] = dp[0, j - 1] + cost[0, j]
    for i in range(1, n):
        dp[i, 0] = dp[i - 1, 0] + cost[i, 0]
        for j in range(1, m):
            dp[i, j] = cost[i, j] + min(
                int(dp[i - 1, j]), int(dp[i, j - 1]),
                int(dp[i - 1, j - 1]))
    return dp

def q_events_dtw(sf_dir: str):
    """Dynamic-time-warping alignment (Sakoe–Chiba '78) between the
    diurnal hour-of-day count profiles of the top-2 event types
    (count DESC, name ASC) — the elastic-series-similarity primitive
    behind profile matching and drift triage. Distributed part: ONE
    vocabulary-bounded combiner pass (≤ #types × 24 rows cross the
    cluster); the 24×24 integer DP grid is metadata-sized and runs on
    the driver. All-integer costs let the generated wavefront oracle
    (one chained CTE per anti-diagonal, three LEFT JOIN predecessors)
    replay the DP bit-for-bit. Output: per row i, type-A's hour count
    and dp[i, 24] (prefix-A-vs-all-B alignment cost); row 24's dp_end
    is the DTW distance."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["ts", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (pd.DataFrame({
            "event_type": df["event_type"],
            "h": df["ts"].dt.hour.astype("int64")})
            .groupby(["event_type", "h"], sort=False)
            .size().reset_index(name="c"))

    counts = grouped_aggregate(
        ds.map_batches(partial, batch_format="pandas",
                       batch_size=65536),
        ["event_type", "h"], {"c": ("c", "sum")},
        result_hint="small").to_pandas()
    tc = counts.groupby("event_type")["c"].sum().reset_index() \
        .sort_values(["c", "event_type"], ascending=[False, True])
    top = list(tc["event_type"].head(2))
    prof = []
    for t in top:
        v = np.zeros(24, dtype=np.int64)
        sub = counts[counts["event_type"] == t]
        v[sub["h"].to_numpy(np.int64)] = sub["c"].to_numpy(np.int64)
        prof.append(v)
    dp = _dtw_table(prof[0], prof[1])
    return pd.DataFrame({"i": np.arange(1, 25, dtype=np.int64),
                         "count_a": prof[0],
                         "dp_end": dp[:, 23]})

def _dtw_oracle_sql(n: int = 24) -> str:
    """Generated anti-diagonal wavefront replay of the DTW DP: w{d}
    holds the cells with i+j=d, each computed from the two previous
    diagonals; missing predecessors coalesce to a +inf sentinel."""
    big = 1 << 40
    stages = []
    for dd in range(3, 2 * n + 1):
        # MATERIALIZED is load-bearing: each w{d} is referenced three
        # times downstream; an inlined CTE would re-evaluate the whole
        # prefix chain exponentially.
        stages.append(f"""w{dd} AS MATERIALIZED (
            SELECT g.i, g.j, g.cost + least(
                coalesce(a.v, {big}), coalesce(bb.v, {big}),
                coalesce(c2.v, {big})) AS v
            FROM grid g
            LEFT JOIN w{dd - 1} a ON a.i = g.i - 1 AND a.j = g.j
            LEFT JOIN w{dd - 1} bb ON bb.i = g.i AND bb.j = g.j - 1
            LEFT JOIN w{dd - 2} c2 ON c2.i = g.i - 1
                                   AND c2.j = g.j - 1
            WHERE g.i + g.j = {dd})""")
    union = "\nUNION ALL ".join(
        f"SELECT i, v FROM w{dd} WHERE j = {n}"
        for dd in range(n + 1, 2 * n + 1))
    return f"""
        WITH tc AS MATERIALIZED (SELECT event_type, count(*) AS c
                    FROM events GROUP BY 1),
        top2 AS MATERIALIZED (SELECT event_type,
                        row_number() OVER (ORDER BY c DESC,
                                           event_type) AS rk
                 FROM tc QUALIFY rk <= 2),
        hrs AS (SELECT unnest(range({n})) AS h),
        ca AS MATERIALIZED (
               SELECT EXTRACT(hour FROM e.ts) AS h, count(*) AS c
               FROM events e JOIN top2 t USING (event_type)
               WHERE t.rk = 1 GROUP BY 1),
        cb AS MATERIALIZED (
               SELECT EXTRACT(hour FROM e.ts) AS h, count(*) AS c
               FROM events e JOIN top2 t USING (event_type)
               WHERE t.rk = 2 GROUP BY 1),
        pa AS MATERIALIZED (
               SELECT hrs.h + 1 AS i, coalesce(ca.c, 0) AS av
               FROM hrs LEFT JOIN ca ON ca.h = hrs.h),
        pb AS MATERIALIZED (
               SELECT hrs.h + 1 AS j, coalesce(cb.c, 0) AS bv
               FROM hrs LEFT JOIN cb ON cb.h = hrs.h),
        grid AS MATERIALIZED (
                 SELECT pa.i, pb.j, abs(pa.av - pb.bv) AS cost
                 FROM pa CROSS JOIN pb),
        w1 AS (SELECT CAST(NULL AS BIGINT) AS i,
                      CAST(NULL AS BIGINT) AS j,
                      CAST(NULL AS BIGINT) AS v WHERE FALSE),
        w2 AS (SELECT i, j, cost AS v FROM grid
               WHERE i = 1 AND j = 1),
        {','.join(stages)}
        SELECT u.i, CAST(pa.av AS BIGINT) AS count_a,
               CAST(u.v AS BIGINT) AS dp_end
        FROM ({union}) u JOIN pa ON pa.i = u.i ORDER BY u.i
    """

def q_events_ldiversity(sf_dir: str, *, el: int = 3):
    """Distinct l-diversity audit (Machanavajjhala et al. '06, the
    k-anonymity successor): under the quasi-identifier (user-id
    bucket, hour-of-day) with event_type as the SENSITIVE attribute,
    how many equivalence classes carry fewer than l distinct sensitive
    values — the homogeneity-attack surface k-anonymity misses. Two
    combiner passes, both QI-vocabulary bounded: class×sensitive
    counts, then per-class (rows, distinct-sensitive, max-sensitive
    run). Integer-exact throughout; the worst single-value share is
    one final divide of exact integers."""
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

    cells = grouped_aggregate(
        ds.map_batches(qi, batch_format="pandas", batch_size=8192),
        ["ubucket", "hod", "event_type"], {"n": ("n", "sum")},
        result_hint="large")
    cls = grouped_aggregate(
        cells, ["ubucket", "hod"],
        {"rows": ("n", "sum"), "n_sens": (None, "count"),
         "max_run": ("n", "max")}, result_hint="small").to_pandas()
    low = cls[cls["n_sens"] < el]
    # worst homogeneity: the class maximizing max_run/rows, ties to
    # the largest max_run then smallest rows — exact integer compare
    # via cross-multiplication is overkill here since we only report
    # the share of ONE class picked by integer sort keys
    worst = cls.sort_values(["max_run", "rows"],
                            ascending=[False, True]).iloc[0]
    return pd.DataFrame({
        "n_classes": [np.int64(len(cls))],
        "n_low_div": [np.int64(len(low))],
        "rows_at_risk": [np.int64(low["rows"].sum())],
        "min_distinct_sens": [np.int64(cls["n_sens"].min())],
        "worst_run": [np.int64(worst["max_run"])],
        "worst_share": [round(float(worst["max_run"])
                              / float(worst["rows"]), 6)]})

def q_events_viterbi(sf_dir: str, *, steps: int = 4):
    """Viterbi decode (Viterbi '67) over the per-user event-type
    Markov chain: the most likely length-4 state sequence under the
    transition-COUNT max-product objective (counts, not normalized
    probabilities — products of exact integers, so the DP has no
    float hazard and the generated SQL stages replay it exactly).
    Distributed part: the |types|²-bounded transition matrix from one
    hash co-location (``ops/windows.transition_matrix``); the
    |types|×steps DP runs on the driver over that metadata-sized
    table. Ties break to the lexicographically smallest predecessor.
    Output: (step, state, best_score, prev_state) for every
    reachable state at every step."""
    from jerex_ray.ops.windows import transition_matrix
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts",
                                     "event_type"])
    tm = transition_matrix(ds, key="user_id", ts_col="ts",
                           id_col="event_id", type_col="event_type")
    states = sorted(set(tm["prev_type"]) | set(tm["next_type"]))
    trans = {(r["prev_type"], r["next_type"]): int(r["cnt"])
             for _, r in tm.iterrows()}
    v = {s: (1, "") for s in states}           # score, backpointer
    rows = [(0, s, 1, "") for s in states]
    for k in range(1, steps):
        nv: dict = {}
        for (s, t), c in trans.items():
            if s not in v:
                continue
            cand = v[s][0] * c
            if t not in nv or cand > nv[t][0] \
                    or (cand == nv[t][0] and s < nv[t][1]):
                nv[t] = (cand, s)
        v = nv
        rows.extend((k, t, sc, bp)
                    for t, (sc, bp) in sorted(v.items()))
    out = pd.DataFrame(rows, columns=["step", "state", "best_score",
                                      "prev_state"])
    return out.astype({"step": "int64", "best_score": "int64"}) \
        .sort_values(["step", "state"]).reset_index(drop=True)

def _viterbi_oracle_sql(steps: int = 4) -> str:
    """Generated DP-stage replay of ``q_events_viterbi``: the LEAD
    transition counts, then one CTE per step taking the row_number-1
    (score DESC, predecessor ASC) candidate per state."""
    sql = """
        WITH seq AS MATERIALIZED (
            SELECT event_type AS s,
                   LEAD(event_type) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id) AS t
            FROM events),
        tm AS MATERIALIZED (
            SELECT s AS prev_type, t AS next_type, count(*) AS cnt
            FROM seq WHERE t IS NOT NULL GROUP BY 1, 2),
        st AS (SELECT DISTINCT prev_type AS state FROM tm
               UNION SELECT DISTINCT next_type FROM tm),
        v0 AS (SELECT state, CAST(1 AS BIGINT) AS s,
                      '' AS bp FROM st)"""
    for k in range(1, steps):
        sql += f""",
        v{k} AS MATERIALIZED (
            SELECT state, s, bp FROM (
                SELECT t.next_type AS state,
                       v.s * t.cnt AS s, v.state AS bp,
                       row_number() OVER (
                           PARTITION BY t.next_type
                           ORDER BY v.s * t.cnt DESC, v.state ASC)
                           AS rn
                FROM v{k - 1} v
                JOIN tm t ON t.prev_type = v.state)
            WHERE rn = 1)"""
    union = "\nUNION ALL ".join(
        f"SELECT CAST({k} AS BIGINT) AS step, state,"
        f" CAST(s AS BIGINT) AS best_score, bp AS prev_state"
        f" FROM v{k}"
        for k in range(steps))
    return sql + f"\nSELECT * FROM ({union}) ORDER BY step, state"

def q_events_butterflies(sf_dir: str):
    """Bipartite butterfly (2×2 biclique) counting on the user ×
    event-type graph (Sanei-Mehri et al. '18, the bipartite
    clustering primitive): per type pair, the common-user count n and
    C(n,2) butterflies. The type vocabulary is bounded, so ONE
    distinct-incidence combiner pass plus a per-user type-bitmask
    histogram (≤2^#types rows) computes every pair exactly — no
    user-pair materialization anywhere. Integer-exact; SQL-oracled
    via the incidence self-join."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type"])
    ut = grouped_aggregate(ds, ["user_id", "event_type"],
                           {"n": (None, "count")},
                           result_hint="large").drop_columns(["n"]) \
        .materialize()
    types = sorted(ut.unique("event_type"))
    t_index = {t: i for i, t in enumerate(types)}

    def mask_partial(df: pd.DataFrame) -> pd.DataFrame:
        m = np.left_shift(
            np.int64(1),
            df["event_type"].map(t_index).to_numpy(np.int64))
        g = (pd.DataFrame({"user_id": df["user_id"], "m": m})
             .groupby("user_id", sort=False)["m"].sum())
        return pd.DataFrame({"user_id": g.index.to_numpy(),
                             "mask": g.to_numpy(np.int64)})

    # the incidence rows are globally DISTINCT, so each (user, type)
    # bit appears in exactly one partial — per-user SUM of partial
    # masks IS the bitwise OR, and grouped_aggregate's sum combiner
    # merges them exactly
    masks = grouped_aggregate(
        ut.map_batches(mask_partial, batch_format="pandas",
                       batch_size=65536),
        ["user_id"], {"mask": ("mask", "sum")},
        result_hint="large")

    def hist_partial(df: pd.DataFrame) -> pd.DataFrame:
        vals, cnt = np.unique(df["mask"].to_numpy(np.int64),
                              return_counts=True)
        return pd.DataFrame({"mask": vals,
                             "n": cnt.astype(np.int64)})

    hist = grouped_aggregate(
        masks.map_batches(hist_partial, batch_format="pandas",
                          batch_size=65536),
        ["mask"], {"n": ("n", "sum")},
        result_hint="small").to_pandas()
    mask_n = dict(zip(hist["mask"].astype(int),
                      hist["n"].astype(int)))
    rows = []
    for ia in range(len(types)):
        for ib in range(ia + 1, len(types)):
            n = sum(c for m, c in mask_n.items()
                    if (m >> ia) & 1 and (m >> ib) & 1)
            if n == 0:
                continue
            rows.append((types[ia], types[ib], np.int64(n),
                         np.int64(n * (n - 1) // 2)))
    return pd.DataFrame(rows, columns=["type_a", "type_b",
                                       "n_common_users",
                                       "butterflies"])

def q_events_bh_fdr(sf_dir: str, *, alpha: float = 0.1):
    """Benjamini–Hochberg FDR control (Benjamini & Hochberg '95 —
    the multiple-testing layer over the per-type Fisher enrichment
    family): rank the 6-dp-rounded enrichment p-values ascending
    (p ASC, type ASC strict ties), k* = max rank with
    p ≤ rank·α/m, reject ranks ≤ k*. The comparison operand
    rank·α/m is one identical double expression on both engines,
    and ranking the ROUNDED p removes any sub-6-dp ordering hazard.
    Distributed work is exactly the enrichment pass (one combiner to
    per-type counts); BH runs driver-side on the type-bounded
    table."""
    enr = q_events_enrichment(sf_dir)
    m = len(enr)
    d = enr.sort_values(["p_value", "event_type"]) \
        .reset_index(drop=True)
    rank = np.arange(1, m + 1, dtype=np.int64)
    crit = rank * alpha / m
    ok = d["p_value"].to_numpy(np.float64) <= crit
    kstar = int(rank[ok].max()) if ok.any() else 0
    d["rank"] = rank
    d["bh_crit"] = np.round(crit, 6)
    d["rejected"] = rank <= kstar
    return d[["event_type", "n", "k", "p_value", "rank",
              "bh_crit", "rejected"]] \
        .sort_values("event_type").reset_index(drop=True)

def _bh_fdr_oracle_sql(alpha: float = 0.1) -> str:
    """BH replay over the embedded enrichment CTE (the nested-WITH
    reuse convention of the kappa oracle)."""
    return f"""
        WITH m AS (
            SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                   CAST(count(*) FILTER (WHERE value >= 50.0)
                        AS BIGINT) AS k
            FROM events GROUP BY event_type),
        t AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
                     CAST(sum(k) AS BIGINT) AS kk FROM m),
        grid AS (
            SELECT m.event_type, m.n, m.k, t.nn, t.kk,
                   unnest(generate_series(
                       m.k, least(t.kk, m.n))) AS i
            FROM m CROSS JOIN t),
        p AS (
            SELECT event_type, sum(exp(
                (lgamma(kk + 1.0) - lgamma(i + 1.0)
                 - lgamma(kk - i + 1.0))
                + (lgamma(nn - kk + 1.0) - lgamma(n - i + 1.0)
                   - lgamma(nn - kk - (n - i) + 1.0))
                - (lgamma(nn + 1.0) - lgamma(n + 1.0)
                   - lgamma(nn - n + 1.0)))) AS pv
            FROM grid GROUP BY event_type),
        e AS (SELECT m.event_type, m.n, m.k,
                     round(p.pv, 6) AS p_value
              FROM m JOIN p USING (event_type)),
        rk AS (SELECT *, row_number() OVER (
                   ORDER BY p_value ASC, event_type ASC) AS rank,
                   (SELECT count(*) FROM e) AS mm
               FROM e),
        ks AS (SELECT coalesce(max(rank), 0) AS kstar
               FROM rk WHERE p_value <= rank * {alpha} / mm)
        SELECT event_type, n, k, p_value, CAST(rank AS BIGINT)
                   AS rank,
               round(rank * {alpha} / mm, 6) AS bh_crit,
               rank <= ks.kstar AS rejected
        FROM rk CROSS JOIN ks ORDER BY event_type"""

_FISHER_ORACLE_SQL = """
    WITH RECURSIVE u AS (
        SELECT user_id,
               CAST(CAST('0x' || substr(md5('ab|'
                    || CAST(user_id AS VARCHAR)), 1, 16)
                    AS UBIGINT) % 2 AS BIGINT) AS arm,
               max(CASE WHEN event_type = 'purchase'
                         AND value >= 150.0 THEN 1 ELSE 0 END) AS conv
        FROM events WHERE user_id < 64 GROUP BY user_id),
    t AS (
        SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS r1,
               CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS r2,
               CAST(sum(conv) AS BIGINT) AS c1,
               CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END)
                    AS BIGINT) AS a,
               CAST(count(*) AS BIGINT) AS n
        FROM u),
    pascal(i, row_) AS (
        SELECT 0, [CAST(1 AS BIGINT)]
        UNION ALL
        SELECT i + 1,
               [CAST(1 AS BIGINT)]
               || list_transform(range(1, len(row_)),
                                 j -> row_[j] + row_[j + 1])
               || [CAST(1 AS BIGINT)]
        FROM pascal WHERE i < (SELECT n FROM t)),
    rows_ AS (
        SELECT (SELECT row_ FROM pascal
                WHERE i = (SELECT r1 FROM t)) AS pr1,
               (SELECT row_ FROM pascal
                WHERE i = (SELECT r2 FROM t)) AS pr2,
               (SELECT row_ FROM pascal
                WHERE i = (SELECT n FROM t)) AS pn),
    terms AS (
        SELECT k,
               rows_.pr1[k + 1]
               * rows_.pr2[(SELECT c1 FROM t) - k + 1] AS nk
        FROM rows_, t,
             (SELECT unnest(range(0, 200)) AS k) ks
        WHERE k >= CASE WHEN t.c1 - t.r2 > 0 THEN t.c1 - t.r2
                        ELSE 0 END
          AND k <= CASE WHEN t.r1 < t.c1 THEN t.r1 ELSE t.c1 END),
    na AS (SELECT nk AS v FROM terms, t WHERE k = t.a),
    agg AS (SELECT CAST(sum(nk) AS BIGINT) AS p_num FROM terms
            WHERE nk <= (SELECT v FROM na))
    SELECT t.r1, t.r2, t.c1, t.a, agg.p_num,
           CAST(rows_.pn[t.c1 + 1] AS BIGINT) AS denom,
           round(CAST(agg.p_num AS DOUBLE)
                 / rows_.pn[t.c1 + 1], 6) AS p_two_sided
    FROM t, agg, rows_"""

_KENDALL_W_ORACLE_SQL = """
    WITH cells AS (
        SELECT d.dow, h.hod FROM
        (SELECT unnest(range(0, 7)) AS dow) d
        CROSS JOIN (SELECT unnest(range(0, 24)) AS hod) h),
    raw AS (
        SELECT dayofweek(ts) AS dow, hour(ts) AS hod,
               count(*) AS n
        FROM events GROUP BY 1, 2),
    grid AS (
        SELECT c.dow, c.hod, coalesce(r.n, 0) AS n
        FROM cells c LEFT JOIN raw r
            ON r.dow = c.dow AND r.hod = c.hod),
    ranked AS (
        SELECT dow, hod, n,
               2 * rank() OVER (PARTITION BY dow ORDER BY n)
               + count(*) OVER (PARTITION BY dow, n) - 1 AS d2
        FROM grid),
    r2 AS (
        SELECT hod, CAST(sum(d2) AS BIGINT) AS r2
        FROM ranked GROUP BY hod),
    ties AS (
        SELECT CAST(sum(c * c * c - c) AS BIGINT) AS tie_term
        FROM (SELECT dow, n, count(*) AS c
              FROM grid GROUP BY dow, n) t),
    agg AS (
        SELECT CAST(sum(r2 * r2) AS BIGINT) AS sum_r2sq FROM r2)
    SELECT CAST(7 AS BIGINT) AS k_judges,
           CAST(24 AS BIGINT) AS n_items,
           agg.sum_r2sq, ties.tie_term,
           CASE WHEN 7 * 7 * 24 * (24 * 24 - 1)
                     - 7 * ties.tie_term = 0 THEN -1.0
                ELSE round(CAST(3 * (agg.sum_r2sq
                                - 7 * 7 * 24 * 25 * 25) AS DOUBLE)
                           / (7 * 7 * 24 * (24 * 24 - 1)
                              - 7 * ties.tie_term), 6)
           END AS w
    FROM agg, ties"""

_KADANE_ORACLE_SQL = """
    WITH b0 AS (
        SELECT min(epoch_us(ts) // 3600000000) AS h0,
               max(epoch_us(ts) // 3600000000) AS h1 FROM events),
    hrs AS (SELECT unnest(range(0, CAST(h1 - h0 + 1 AS BIGINT)))
                   AS h FROM b0),
    raw AS (SELECT epoch_us(ts) // 3600000000
                   - (SELECT h0 FROM b0) AS h, count(*) AS x
            FROM events GROUP BY 1),
    grid AS (SELECT hrs.h, coalesce(raw.x, 0) AS x
             FROM hrs LEFT JOIN raw ON raw.h = hrs.h),
    st AS (SELECT CAST(count(*) AS BIGINT) AS t,
                  CAST(sum(x) AS BIGINT) AS s FROM grid),
    p AS (
        SELECT h,
               sum((SELECT t FROM st) * x - (SELECT s FROM st))
                   OVER (ORDER BY h ROWS BETWEEN UNBOUNDED
                         PRECEDING AND CURRENT ROW) AS pref
        FROM grid),
    c AS (
        SELECT h AS end_t, pref,
               least(CAST(0 AS BIGINT),
                     coalesce(min(pref) OVER (ORDER BY h ROWS
                         BETWEEN UNBOUNDED PRECEDING AND 1
                         PRECEDING), 0)) AS mn
        FROM p),
    bestrow AS (
        SELECT end_t, pref - mn AS bsum, mn
        FROM c ORDER BY bsum DESC, end_t LIMIT 1),
    startrow AS (
        -- the excess window STARTS one past the prefix argmin
        -- (sum = pref[end] - pref[start-1]); min(h)+1 mirrors the
        -- engine's earliest-strict-min rule
        SELECT CAST(coalesce(
            (SELECT min(p2.h) + 1 FROM p p2, bestrow b
             WHERE p2.h < b.end_t AND p2.pref = b.mn
               AND b.mn < 0), 0) AS BIGINT) AS start_t)
    SELECT CAST(b.bsum AS BIGINT) AS best_sum_scaled,
           CAST(s.start_t + (SELECT h0 FROM b0) AS BIGINT)
               AS start_hour,
           CAST(b.end_t + (SELECT h0 FROM b0) AS BIGINT)
               AS end_hour,
           CAST(b.end_t - s.start_t + 1 AS BIGINT) AS window_len,
           round(CAST(b.bsum AS DOUBLE) / (SELECT t FROM st), 6)
               AS excess_events
    FROM bestrow b, startrow s"""

_CONTROL_CHART_ORACLE_SQL = """
    WITH b0 AS (
        SELECT min(epoch_us(ts) // 3600000000) AS h0,
               max(epoch_us(ts) // 3600000000) AS h1 FROM events),
    hrs AS (SELECT unnest(range(0, CAST(h1 - h0 + 1 AS BIGINT)))
                   AS h FROM b0),
    raw AS (SELECT epoch_us(ts) // 3600000000
                   - (SELECT h0 FROM b0) AS h, count(*) AS x
            FROM events GROUP BY 1),
    grid AS (SELECT hrs.h, coalesce(raw.x, 0) AS x
             FROM hrs LEFT JOIN raw ON raw.h = hrs.h),
    st AS (SELECT CAST(count(*) AS BIGINT) AS t,
                  CAST(sum(x) AS BIGINT) AS s,
                  CAST(count(*) * sum(x * x)
                       - sum(x) * sum(x) AS BIGINT) AS v
           FROM grid),
    f AS (
        SELECT h,
               (SELECT t FROM st) * x - (SELECT s FROM st) AS d
        FROM grid),
    flags AS (
        SELECT h, d, d * d AS d2,
               CASE WHEN d > 0 THEN 1 WHEN d < 0 THEN -1 ELSE 0
                   END AS side,
               CASE WHEN d > 0 AND d * d > 4 * (SELECT v FROM st)
                    THEN 1 ELSE 0 END AS b2p,
               CASE WHEN d < 0 AND d * d > 4 * (SELECT v FROM st)
                    THEN 1 ELSE 0 END AS b2n,
               CASE WHEN d > 0 AND d * d > (SELECT v FROM st)
                    THEN 1 ELSE 0 END AS b1p,
               CASE WHEN d < 0 AND d * d > (SELECT v FROM st)
                    THEN 1 ELSE 0 END AS b1n
        FROM f),
    w AS (
        SELECT h,
               CAST(d2 > 9 * (SELECT v FROM st) AS INT) AS r1,
               CASE WHEN h >= 2 AND (
                        sum(b2p) OVER (ORDER BY h ROWS BETWEEN 2
                            PRECEDING AND CURRENT ROW) >= 2
                     OR sum(b2n) OVER (ORDER BY h ROWS BETWEEN 2
                            PRECEDING AND CURRENT ROW) >= 2)
                    THEN 1 ELSE 0 END AS r2,
               CASE WHEN h >= 4 AND (
                        sum(b1p) OVER (ORDER BY h ROWS BETWEEN 4
                            PRECEDING AND CURRENT ROW) >= 4
                     OR sum(b1n) OVER (ORDER BY h ROWS BETWEEN 4
                            PRECEDING AND CURRENT ROW) >= 4)
                    THEN 1 ELSE 0 END AS r3,
               CASE WHEN h >= 7 AND abs(
                        sum(side) OVER (ORDER BY h ROWS BETWEEN 7
                            PRECEDING AND CURRENT ROW)) = 8
                    THEN 1 ELSE 0 END AS r4
        FROM flags),
    per AS (
        SELECT 1 AS rule, CAST(sum(r1) AS BIGINT) AS n_violations,
               CAST(coalesce(min(CASE WHEN r1 = 1 THEN h END), -1
                    - (SELECT h0 FROM b0)) + (SELECT h0 FROM b0)
                    AS BIGINT) AS first_hour FROM w
        UNION ALL
        SELECT 2, CAST(sum(r2) AS BIGINT),
               CAST(coalesce(min(CASE WHEN r2 = 1 THEN h END), -1
                    - (SELECT h0 FROM b0)) + (SELECT h0 FROM b0)
                    AS BIGINT) FROM w
        UNION ALL
        SELECT 3, CAST(sum(r3) AS BIGINT),
               CAST(coalesce(min(CASE WHEN r3 = 1 THEN h END), -1
                    - (SELECT h0 FROM b0)) + (SELECT h0 FROM b0)
                    AS BIGINT) FROM w
        UNION ALL
        SELECT 4, CAST(sum(r4) AS BIGINT),
               CAST(coalesce(min(CASE WHEN r4 = 1 THEN h END), -1
                    - (SELECT h0 FROM b0)) + (SELECT h0 FROM b0)
                    AS BIGINT) FROM w)
    SELECT CAST(rule AS BIGINT) AS rule, n_violations, first_hour
    FROM per ORDER BY rule"""

_CONFORMAL_ORACLE_SQL = """
    WITH b0 AS (
        SELECT min(epoch_us(ts) // 3600000000) AS h0,
               max(epoch_us(ts) // 3600000000) AS h1 FROM events),
    hrs AS (SELECT unnest(range(0, CAST(h1 - h0 + 1 AS BIGINT)))
                   AS h FROM b0),
    raw AS (SELECT epoch_us(ts) // 3600000000
                   - (SELECT h0 FROM b0) AS h, count(*) AS x
            FROM events GROUP BY 1),
    grid AS (SELECT hrs.h, coalesce(raw.x, 0) AS x
             FROM hrs LEFT JOIN raw ON raw.h = hrs.h),
    scored AS (
        SELECT h, abs(x - lag(x, 24) OVER (ORDER BY h)) AS r
        FROM grid QUALIFY lag(x, 24) OVER (ORDER BY h) IS NOT NULL),
    idx AS (
        SELECT h, r, row_number() OVER (ORDER BY h) AS i,
               count(*) OVER () AS nv
        FROM scored),
    split AS (SELECT CAST(coalesce(max(nv), 0) // 2 AS BIGINT)
                         AS n_cal,
                     CAST(coalesce(max(nv), 0)
                          - coalesce(max(nv), 0) // 2 AS BIGINT)
                         AS n_test
              FROM idx),
    rk AS (SELECT CAST(least(
               -((-(((SELECT n_cal FROM split) + 1) * 9)) // 10),
               (SELECT n_cal FROM split)) AS BIGINT) AS rank_),
    q AS (
        SELECT coalesce((
            SELECT CAST(r AS BIGINT) FROM idx
            WHERE i <= (SELECT n_cal FROM split)
            ORDER BY r
            LIMIT 1 OFFSET (SELECT greatest(rank_ - 1, 0) FROM rk)),
            -1) AS qhat),
    cov AS (
        SELECT CAST(coalesce(sum(
                   CASE WHEN r <= (SELECT qhat FROM q)
                        THEN 1 ELSE 0 END), 0) AS BIGINT)
                   AS n_covered
        FROM idx WHERE i > (SELECT n_cal FROM split))
    SELECT split.n_cal, split.n_test,
           CASE WHEN split.n_cal = 0 OR split.n_test = 0
                THEN -1 ELSE q.qhat END AS qhat,
           CASE WHEN split.n_cal = 0 OR split.n_test = 0
                THEN -1 ELSE cov.n_covered END AS n_covered,
           CASE WHEN split.n_cal = 0 OR split.n_test = 0
                THEN -1.0
                ELSE round(CAST(cov.n_covered AS DOUBLE)
                           / split.n_test, 6) END AS coverage
    FROM split, q, cov"""

_GUMBEL_ORACLE_SQL = """
    WITH b0 AS (
        SELECT min(epoch_us(ts) // 3600000000) AS h0,
               max(epoch_us(ts) // 3600000000) AS h1 FROM events),
    hrs AS (SELECT unnest(range(0, CAST(h1 - h0 + 1 AS BIGINT)))
                   AS h FROM b0),
    raw AS (SELECT epoch_us(ts) // 3600000000
                   - (SELECT h0 FROM b0) AS h, count(*) AS x
            FROM events GROUP BY 1),
    grid AS (SELECT hrs.h, coalesce(raw.x, 0) AS x
             FROM hrs LEFT JOIN raw ON raw.h = hrs.h),
    t AS (SELECT CAST(count(*) AS BIGINT) AS t FROM grid),
    mx AS (
        SELECT h // 24 AS d, max(x) AS m
        FROM grid WHERE h < 24 * ((SELECT t FROM t) // 24)
        GROUP BY 1),
    agg AS (
        SELECT CAST(count(*) AS BIGINT) AS b,
               CAST(coalesce(sum(m), 0) AS BIGINT) AS s,
               CAST(coalesce(sum(m * m), 0) AS BIGINT) AS s2,
               CAST(coalesce(max(m), -1) AS BIGINT) AS peak
        FROM mx),
    fit AS (
        SELECT b, s, s2, peak,
               CAST(s AS DOUBLE) / greatest(b, 1) AS mbar,
               CASE WHEN b < 2 THEN -1.0
                    ELSE sqrt(CAST(b * s2 - s * s AS DOUBLE)
                              / (b * (b - 1))) * sqrt(6.0) / pi()
               END AS sigma
        FROM agg)
    SELECT b AS n_days, s AS s_sum, s2 AS s2_sum,
           peak AS max_daily_peak,
           CASE WHEN b < 2 THEN -1.0
                ELSE round(mbar - 0.5772156649015329 * sigma, 6)
           END AS mu,
           CASE WHEN b < 2 THEN -1.0 ELSE round(sigma, 6) END
               AS sigma,
           CASE WHEN b < 2 THEN -1.0
                ELSE round(mbar - 0.5772156649015329 * sigma
                           - sigma * ln(-ln(1.0 - 1.0 / 30.0)), 6)
           END AS rl_30d,
           CASE WHEN b < 2 THEN -1.0
                ELSE round(mbar - 0.5772156649015329 * sigma
                           - sigma * ln(-ln(1.0 - 1.0 / 365.0)), 6)
           END AS rl_365d
    FROM fit"""

_CA_ORACLE_SQL = """
    WITH u AS (
        SELECT user_id,
               sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                   END) AS n_p,
               max(CASE WHEN event_type = 'purchase'
                         AND value >= 150.0 THEN 1 ELSE 0 END)
                   AS conv
        FROM events GROUP BY user_id),
    f AS (
        SELECT CASE WHEN n_p // 5 > 3 THEN 3 ELSE n_p // 5 END AS g,
               conv
        FROM u),
    grp AS (
        SELECT g, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(conv) AS BIGINT) AS a
        FROM f GROUP BY g),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
                   CAST(sum(a) AS BIGINT) AS aa FROM grp),
    stat AS (
        SELECT CAST(sum(g * (a * (SELECT nn FROM tot)
                             - n * (SELECT aa FROM tot)))
                    AS BIGINT) AS t,
               CAST((SELECT nn FROM tot) * sum(g * g * n)
                    - sum(g * n) * sum(g * n) AS BIGINT) AS v2
        FROM grp),
    z AS (
        SELECT t, v2,
               CASE WHEN (SELECT aa FROM tot) = 0
                      OR (SELECT aa FROM tot) = (SELECT nn FROM tot)
                      OR v2 = 0 THEN -1.0
                    ELSE round(
                        CAST(CAST(t AS HUGEINT) * t
                             * (SELECT nn FROM tot) AS DOUBLE)
                        / CAST(CAST((SELECT aa FROM tot) AS HUGEINT)
                               * ((SELECT nn FROM tot)
                                  - (SELECT aa FROM tot)) * v2
                               AS DOUBLE), 6)
               END AS z2
        FROM stat)
    SELECT CAST(grp.g AS BIGINT) AS g, grp.n, grp.a,
           z.t AS t_stat, z.v2, z.z2,
           CAST(CASE WHEN z.z2 > 3.841459 THEN 1 ELSE 0 END
                AS BIGINT) AS flag
    FROM grp, z ORDER BY g"""

_MH_ORACLE_SQL = """
    WITH u AS (
        SELECT user_id % 4 AS stratum,
               CAST(CAST('0x' || substr(md5('ab|'
                    || CAST(user_id AS VARCHAR)), 1, 16)
                    AS UBIGINT) % 2 AS BIGINT) AS arm,
               max(CASE WHEN event_type = 'purchase'
                         AND value >= 150.0 THEN 1 ELSE 0 END)
                   AS conv
        FROM events GROUP BY user_id),
    g AS (
        SELECT stratum,
               CAST(sum(CASE WHEN arm = 0 AND conv = 1 THEN 1
                        ELSE 0 END) AS BIGINT) AS a,
               CAST(sum(CASE WHEN arm = 0 AND conv = 0 THEN 1
                        ELSE 0 END) AS BIGINT) AS b,
               CAST(sum(CASE WHEN arm = 1 AND conv = 1 THEN 1
                        ELSE 0 END) AS BIGINT) AS c,
               CAST(sum(CASE WHEN arm = 1 AND conv = 0 THEN 1
                        ELSE 0 END) AS BIGINT) AS d,
               CAST(count(*) AS BIGINT) AS n
        FROM u GROUP BY stratum),
    p AS (SELECT
            CAST(coalesce(max(CASE WHEN stratum = 0 THEN n END), 1)
                 AS HUGEINT)
            * coalesce(max(CASE WHEN stratum = 1 THEN n END), 1)
            * coalesce(max(CASE WHEN stratum = 2 THEN n END), 1)
            * coalesce(max(CASE WHEN stratum = 3 THEN n END), 1)
                AS pr FROM g),
    mh AS (
        SELECT CAST(sum(CAST(a AS HUGEINT) * d
                        * ((SELECT pr FROM p) // n))
                    AS HUGEINT) AS r_raw,
               CAST(sum(CAST(b AS HUGEINT) * c
                        * ((SELECT pr FROM p) // n))
                    AS HUGEINT) AS s_raw
        FROM g),
    red AS (
        SELECT r_raw, s_raw,
               CASE WHEN r_raw = 0 AND s_raw = 0 THEN 1
                    ELSE gcd(r_raw, s_raw) END AS gg
        FROM mh),
    fin AS (
        SELECT r_raw, s_raw,
               CASE WHEN greatest(r_raw // gg, s_raw // gg)
                         > 9223372036854775807
                    THEN -2 ELSE CAST(r_raw // gg AS BIGINT)
               END AS r_num,
               CASE WHEN greatest(r_raw // gg, s_raw // gg)
                         > 9223372036854775807
                    THEN -2 ELSE CAST(s_raw // gg AS BIGINT)
               END AS s_num
        FROM red)
    SELECT CAST(g.stratum AS BIGINT) AS stratum, g.a, g.b, g.c,
           g.d, g.n, fin.r_num, fin.s_num,
           CASE WHEN fin.s_raw = 0 THEN -1.0
                ELSE round(CAST(fin.r_raw AS DOUBLE)
                           / CAST(fin.s_raw AS DOUBLE), 6)
           END AS or_mh
    FROM g, fin ORDER BY stratum"""

def _hurst_oracle_sql(ns=(16, 32, 64, 128)) -> str:
    """Per-level replay of ``q_events_hurst``: windowed integer
    prefix extremes give Rn and Vn per block, per-level recursive
    CTEs accumulate block R/S = Rn/sqrt(Vn) in order, and the
    4-point log-log OLS slope is one fixed expression."""

    sql = """
WITH RECURSIVE b0 AS (
    SELECT min(epoch_us(ts) // 3600000000) AS h0,
           max(epoch_us(ts) // 3600000000) AS h1 FROM events),
hrs AS (SELECT unnest(range(0, CAST(h1 - h0 + 1 AS BIGINT))) AS h
        FROM b0),
raw AS (SELECT epoch_us(ts) // 3600000000 - (SELECT h0 FROM b0) AS h,
               count(*) AS x
        FROM events GROUP BY 1),
grid AS MATERIALIZED (
    SELECT hrs.h, coalesce(raw.x, 0) AS x
    FROM hrs LEFT JOIN raw ON raw.h = hrs.h),
t AS (SELECT CAST(count(*) AS BIGINT) AS t FROM grid)"""
    finals = []
    for n in ns:
        sql += f""",
rows{n} AS MATERIALIZED (
    SELECT b, rn, vn, row_number() OVER (ORDER BY b) AS j FROM (
        SELECT h // {n} AS b,
               max({n} * pref - tl * s) - min({n} * pref - tl * s)
                   AS rn,
               {n} * max(s2) - max(s) * max(s) AS vn
        FROM (
            SELECT h,
                   sum(x) OVER (PARTITION BY h // {n}
                                ORDER BY h) AS pref,
                   h % {n} + 1 AS tl,
                   sum(x) OVER (PARTITION BY h // {n}) AS s,
                   sum(x * x) OVER (PARTITION BY h // {n}) AS s2
            FROM grid
            WHERE h < {n} * ((SELECT t FROM t) // {n})) q
        GROUP BY b) w
    WHERE vn > 0),
acc{n}(j, acc) AS (
    SELECT CAST(0 AS BIGINT), CAST(0 AS DOUBLE)
    UNION ALL
    SELECT a.j + 1, a.acc + r.rn / sqrt(CAST(r.vn AS DOUBLE))
    FROM acc{n} a JOIN rows{n} r ON r.j = a.j + 1
    WHERE a.j < (SELECT count(*) FROM rows{n})),
lvl{n} AS (
    SELECT CAST({n} AS BIGINT) AS n,
           (SELECT CAST(count(*) AS BIGINT) FROM rows{n})
               AS n_blocks,
           (SELECT acc FROM acc{n} ORDER BY j DESC LIMIT 1) AS acc)"""
        finals.append(f"SELECT * FROM lvl{n}")
    u = " UNION ALL ".join(finals)
    sql += f""",
lv AS ({u}),
pts AS (SELECT n, n_blocks, acc, ln(CAST(n AS DOUBLE)) AS lx,
               ln(acc / n_blocks) AS ly
        FROM lv),
fit AS (
    SELECT
        (SELECT lx FROM pts WHERE n = {ns[0]}) AS x1,
        (SELECT lx FROM pts WHERE n = {ns[1]}) AS x2,
        (SELECT lx FROM pts WHERE n = {ns[2]}) AS x3,
        (SELECT lx FROM pts WHERE n = {ns[3]}) AS x4,
        (SELECT ly FROM pts WHERE n = {ns[0]}) AS y1,
        (SELECT ly FROM pts WHERE n = {ns[1]}) AS y2,
        (SELECT ly FROM pts WHERE n = {ns[2]}) AS y3,
        (SELECT ly FROM pts WHERE n = {ns[3]}) AS y4),
h AS (
    SELECT round(
        (4.0 * (x1 * y1 + x2 * y2 + x3 * y3 + x4 * y4)
         - (x1 + x2 + x3 + x4) * (y1 + y2 + y3 + y4))
        / (4.0 * (x1 * x1 + x2 * x2 + x3 * x3 + x4 * x4)
           - (x1 + x2 + x3 + x4) * (x1 + x2 + x3 + x4)), 6)
        AS hurst
    FROM fit)
SELECT pts.n, pts.n_blocks,
       round(pts.acc / pts.n_blocks, 6) AS avg_rs, h.hurst
FROM pts, h ORDER BY pts.n"""
    return sql

QUERIES = {
    'q_events_mantel_haenszel': q_events_mantel_haenszel,
    'q_events_cochran_armitage': q_events_cochran_armitage,
    'q_events_hurst': q_events_hurst,
    'q_events_gumbel': q_events_gumbel,
    'q_events_conformal': q_events_conformal,
    'q_events_control_chart': q_events_control_chart,
    'q_events_max_excess_window': q_events_max_excess_window,
    'q_events_kendall_w': q_events_kendall_w,
    'q_events_fisher': q_events_fisher,
    'q_events_changepoint': q_events_changepoint,
    'q_events_hill_tail': q_events_hill_tail,
    'q_events_mutual_info': q_events_mutual_info,
    'q_events_drawdown': q_events_drawdown,
    'q_events_kmv_distinct': q_events_kmv_distinct,
    'q_events_kmv_overlap': q_events_kmv_overlap,
    'q_events_ams_f2': q_events_ams_f2,
    'q_events_dtw': q_events_dtw,
    'q_events_ldiversity': q_events_ldiversity,
    'q_events_viterbi': q_events_viterbi,
    'q_events_butterflies': q_events_butterflies,
    'q_events_bh_fdr': q_events_bh_fdr,
    'q_events_xcorr': q_events_xcorr,
    'q_events_burst_dp': q_events_burst_dp,
    'q_events_burst_states': q_events_burst_states,
    'q_events_kfold_cv': q_events_kfold_cv,
    'q_events_seasonal_naive': q_events_seasonal_naive,
    'q_events_enrichment': q_events_enrichment,
}

ORACLES = {
    'q_events_hill_tail': """
            WITH t AS (
                SELECT CAST(value AS DOUBLE) AS v FROM events
                WHERE value IS NOT NULL
                ORDER BY v DESC LIMIT 201),
            r AS (SELECT v, row_number() OVER (ORDER BY v DESC)
                      AS rk
                  FROM t),
            xk AS (SELECT v AS xk1 FROM r WHERE rk = 201),
            s AS (SELECT sum(ln(v / (SELECT xk1 FROM xk))) AS ls
                  FROM r WHERE rk <= 200)
            SELECT CAST(200 AS BIGINT) AS k,
                   round((SELECT xk1 FROM xk), 6) AS x_k1,
                   round(s.ls, 6) AS log_sum,
                   round(200 / s.ls, 6) AS alpha
            FROM s
        """,
    'q_events_mutual_info': """
            WITH j AS (
                SELECT event_type,
                       (CAST(epoch_us(ts) AS BIGINT) // 3600000000)
                           % 24 AS hod,
                       count(*) AS c
                FROM events GROUP BY 1, 2),
            tot AS (SELECT sum(c) AS n FROM j),
            mx AS (SELECT event_type, sum(c) AS cx FROM j GROUP BY 1),
            my AS (SELECT hod, sum(c) AS cy FROM j GROUP BY 1),
            mi AS (
                SELECT sum((j.c / t.n)
                           * ln((j.c / t.n)
                                / ((mx.cx / t.n) * (my.cy / t.n))))
                           AS mi
                FROM j
                CROSS JOIN tot t
                JOIN mx ON j.event_type = mx.event_type
                JOIN my ON j.hod = my.hod),
            hx AS (SELECT -sum((cx / t.n) * ln(cx / t.n)) AS h
                   FROM mx, tot t),
            hy AS (SELECT -sum((cy / t.n) * ln(cy / t.n)) AS h
                   FROM my, tot t)
            SELECT CAST((SELECT n FROM tot) AS BIGINT) AS n,
                   round((SELECT h FROM hx), 6) AS h_type,
                   round((SELECT h FROM hy), 6) AS h_hour,
                   round((SELECT mi FROM mi), 6) AS mi,
                   round((SELECT mi FROM mi)
                         / sqrt((SELECT h FROM hx)
                                * (SELECT h FROM hy)), 6) AS nmi
        """,
    'q_events_drawdown': """
            WITH g AS (
                SELECT CAST(epoch_us(ts) AS BIGINT) // 3600000000
                           AS hour,
                       sum(CAST(round(value * 100, 0) AS BIGINT)) AS c
                FROM events GROUP BY 1),
            o AS (
                SELECT hour,
                       sum(c) OVER (ORDER BY hour) AS cum
                FROM g),
            m AS (
                SELECT hour, cum,
                       max(cum) OVER (ORDER BY hour) AS runmax
                FROM o),
            t AS (
                SELECT hour AS trough_hour, cum AS trough_cum, runmax
                FROM m ORDER BY runmax - cum DESC, hour ASC LIMIT 1)
            SELECT
                (SELECT min(m.hour) FROM m, t
                 WHERE m.cum = t.runmax
                   AND m.hour <= t.trough_hour) AS peak_hour,
                t.trough_hour,
                round(t.runmax / 100.0, 2) AS peak_cum,
                round(t.trough_cum / 100.0, 2) AS trough_cum,
                round((t.runmax - t.trough_cum) / 100.0, 2)
                    AS max_drawdown
            FROM t
        """,
    'q_events_kmv_distinct': """
            WITH h AS (
                SELECT DISTINCT event_type,
                       CAST('0x' || substr(
                           md5(CAST(user_id AS VARCHAR)), 1, 16)
                           AS UBIGINT) AS hash
                FROM events),
            r AS (
                SELECT event_type, hash,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY hash) AS rk,
                       count(*) OVER (PARTITION BY event_type) AS nd
                FROM h),
            kth AS (
                SELECT event_type,
                       CAST(least(nd, 64) AS BIGINT) AS k_used,
                       CAST(hash AS DOUBLE)
                           / 18446744073709551616.0 AS frac,
                       nd
                FROM r WHERE rk = least(nd, 64))
            SELECT event_type, k_used,
                   round(frac, 6) AS kth_frac,
                   round(CASE WHEN k_used < 64
                              THEN CAST(k_used AS DOUBLE)
                              ELSE 63.0 / frac END, 6)
                       AS est_distinct
            FROM kth ORDER BY event_type
        """,
    'q_events_xcorr': """
            WITH g AS (
                SELECT event_type,
                       CAST(epoch_us(ts) AS BIGINT) // 3600000000
                           AS hour,
                       count(*) AS c
                FROM events GROUP BY 1, 2),
            pick AS (
                SELECT event_type,
                       row_number() OVER (ORDER BY sum(c) DESC,
                                          event_type ASC) AS rk
                FROM g GROUP BY event_type),
            span AS (
                SELECT min(hour) AS hmin, max(hour) AS hmax
                FROM g JOIN pick USING (event_type)
                WHERE pick.rk <= 2),
            grid AS (
                SELECT unnest(generate_series(
                    (SELECT hmin FROM span),
                    (SELECT hmax FROM span))) AS hour),
            a AS (
                SELECT grid.hour, coalesce(g.c, 0) AS c
                FROM grid LEFT JOIN
                     (SELECT hour, c FROM g JOIN pick USING (event_type)
                      WHERE pick.rk = 1) g USING (hour)),
            b AS (
                SELECT grid.hour, coalesce(g.c, 0) AS c
                FROM grid LEFT JOIN
                     (SELECT hour, c FROM g JOIN pick USING (event_type)
                      WHERE pick.rk = 2) g USING (hour)),
            lags AS (
                SELECT unnest(generate_series(-3, 3)) AS lag),
            pair AS (
                SELECT l.lag, a.c AS x, b.c AS y
                FROM lags l
                JOIN a ON TRUE
                JOIN b ON b.hour = a.hour + l.lag),
            s AS (
                SELECT lag, count(*) AS m,
                       sum(x) AS sx, sum(y) AS sy,
                       sum(x * x) AS sxx, sum(y * y) AS syy,
                       sum(x * y) AS sxy
                FROM pair GROUP BY lag)
            SELECT CAST(lag AS BIGINT) AS lag,
                   CAST(m AS BIGINT) AS n_hours,
                   round((m * sxy - sx * sy)
                         / (sqrt(CAST(m * sxx - sx * sx AS DOUBLE))
                            * sqrt(CAST(m * syy - sy * sy AS DOUBLE))),
                         6) AS r
            FROM s ORDER BY lag
        """,
    'q_events_changepoint': """
            WITH g AS (
                SELECT CAST(epoch_us(ts) AS BIGINT) // 3600000000
                           AS hour,
                       count(*) AS c
                FROM events GROUP BY 1),
            o AS (
                SELECT hour, CAST(c AS DOUBLE) AS y,
                       row_number() OVER (ORDER BY hour) AS i,
                       sum(CAST(c AS DOUBLE)) OVER (ORDER BY hour)
                           AS s,
                       sum(CAST(c AS DOUBLE) * c) OVER
                           (ORDER BY hour) AS s2
                FROM g),
            tot AS (SELECT max(s) AS ts_, max(s2) AS ts2,
                           max(i) AS n
                    FROM o),
            cand AS (
                SELECT o2.hour AS split_hour, o.i AS k,
                       o.s, o.s2
                FROM o JOIN o o2 ON o2.i = o.i + 1),
            cost AS (
                SELECT split_hour, k,
                       (s2 - (s * s) / k)
                       + (((SELECT ts2 FROM tot) - s2)
                          - (((SELECT ts_ FROM tot) - s)
                             * ((SELECT ts_ FROM tot) - s))
                            / ((SELECT n FROM tot) - k)) AS sse,
                       s
                FROM cand),
            best AS (
                SELECT * FROM cost
                ORDER BY sse ASC, split_hour ASC LIMIT 1)
            SELECT split_hour,
                   CAST(k AS BIGINT) AS n_left,
                   CAST((SELECT n FROM tot) - k AS BIGINT)
                       AS n_right,
                   round(s / k, 6) AS mean_left,
                   round(((SELECT ts_ FROM tot) - s)
                         / ((SELECT n FROM tot) - k), 6)
                       AS mean_right,
                   round((SELECT ts2 FROM tot)
                         - ((SELECT ts_ FROM tot)
                            * (SELECT ts_ FROM tot))
                           / (SELECT n FROM tot), 6) AS sse_total,
                   round(sse, 6) AS sse_split
            FROM best
        """,
    'q_events_enrichment': """
            WITH m AS (
                SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                       CAST(count(*) FILTER (WHERE value >= 50.0)
                            AS BIGINT) AS k
                FROM events GROUP BY event_type),
            t AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
                         CAST(sum(k) AS BIGINT) AS kk FROM m),
            grid AS (
                SELECT m.event_type, m.n, m.k, t.nn, t.kk,
                       unnest(generate_series(
                           m.k, least(t.kk, m.n))) AS i
                FROM m CROSS JOIN t),
            p AS (
                SELECT event_type, sum(exp(
                    (lgamma(kk + 1.0) - lgamma(i + 1.0)
                     - lgamma(kk - i + 1.0))
                    + (lgamma(nn - kk + 1.0) - lgamma(n - i + 1.0)
                       - lgamma(nn - kk - (n - i) + 1.0))
                    - (lgamma(nn + 1.0) - lgamma(n + 1.0)
                       - lgamma(nn - n + 1.0)))) AS pv
                FROM grid GROUP BY event_type)
            SELECT m.event_type, m.n, m.k,
                   round((CAST(m.k AS DOUBLE) / m.n)
                         / (CAST(t.kk AS DOUBLE) / t.nn), 6)
                       AS ratio,
                   round(p.pv, 6) AS p_value
            FROM m CROSS JOIN t JOIN p USING (event_type)
            ORDER BY m.event_type
        """,
    'q_events_seasonal_naive': """
            WITH top1 AS (
                SELECT event_type FROM events GROUP BY event_type
                ORDER BY count(*) DESC, event_type LIMIT 1),
            h AS (
                SELECT CAST(epoch_us(ts) AS BIGINT) // 3600000000
                           AS hr,
                       count(*) AS k
                FROM events
                WHERE event_type = (SELECT event_type FROM top1)
                GROUP BY hr),
            span AS (SELECT min(hr) AS h0, max(hr) AS h1 FROM h),
            grid AS (
                SELECT unnest(generate_series(h0, h1)) AS hr
                FROM span),
            g2 AS MATERIALIZED (
                SELECT grid.hr,
                       CAST(coalesce(h.k, 0) AS BIGINT) AS k
                FROM grid LEFT JOIN h USING (hr)),
            lagged AS (
                SELECT k,
                       lag(k, 168) OVER (ORDER BY hr) AS ks,
                       lag(k, 1) OVER (ORDER BY hr) AS k1
                FROM g2),
            agg AS (
                SELECT CAST(count(ks) AS BIGINT) AS n_eval,
                       CAST(coalesce(sum(abs(k - ks)), 0) AS BIGINT)
                           AS sae_seasonal,
                       CAST(coalesce(sum(abs(k - k1)), 0) AS BIGINT)
                           AS sae_naive1,
                       CAST(count(k1) AS BIGINT) AS n1
                FROM lagged)
            SELECT n_eval, sae_seasonal, sae_naive1,
                   CASE WHEN n_eval > 0 AND sae_naive1 > 0
                        THEN round((CAST(sae_seasonal AS DOUBLE)
                                    / n_eval)
                                   / (CAST(sae_naive1 AS DOUBLE)
                                      / n1), 6)
                        ELSE 0.0 END AS mase
            FROM agg
        """,
    'q_events_kfold_cv': """
            WITH c0 AS (
                SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2
                           AS c
                FROM events),
            e AS (
                SELECT CAST(CAST('0x' || substr(md5(
                           CAST(event_id AS VARCHAR)), 1, 16)
                           AS UBIGINT) % 5 AS BIGINT) AS fold,
                       (epoch_us(ts) - (SELECT c FROM c0))
                           / 86400000000.0 AS x,
                       value AS y
                FROM events),
            m AS (SELECT fold, CAST(count(*) AS DOUBLE) AS n,
                         sum(x) AS sx, sum(y) AS sy,
                         sum(x * x) AS sxx, sum(x * y) AS sxy,
                         sum(y * y) AS syy
                  FROM e GROUP BY fold),
            t AS (SELECT sum(n) AS n, sum(sx) AS sx, sum(sy) AS sy,
                         sum(sxx) AS sxx, sum(sxy) AS sxy
                  FROM m),
            tr AS (SELECT m.fold, m.n, m.sx, m.sy, m.sxx, m.sxy,
                          m.syy,
                          t.n - m.n AS nt, t.sx - m.sx AS sxt,
                          t.sy - m.sy AS syt, t.sxx - m.sxx AS sxxt,
                          t.sxy - m.sxy AS sxyt
                   FROM m CROSS JOIN t),
            fit AS (SELECT fold, n, sx, sy, sxx, sxy, syy,
                           (sxyt - sxt * syt / nt)
                               / (sxxt - sxt * sxt / nt) AS b,
                           syt / nt
                               - (sxyt - sxt * syt / nt)
                                 / (sxxt - sxt * sxt / nt)
                                 * sxt / nt AS a
                    FROM tr)
            SELECT CAST(fold AS BIGINT) AS fold,
                   CAST(n AS BIGINT) AS n_test,
                   round(b, 6) AS slope,
                   round(a - b * (((SELECT c FROM c0)
                                   - 788918400000000)
                                  / 86400000000.0), 6) AS intercept,
                   round((syy - 2 * a * sy - 2 * b * sxy
                          + n * a * a + 2 * a * b * sx
                          + b * b * sxx) / n, 6) AS mse
            FROM fit ORDER BY fold
        """,
    'q_events_burst_dp': """
            WITH RECURSIVE top1 AS (
                SELECT event_type FROM events GROUP BY event_type
                ORDER BY count(*) DESC, event_type LIMIT 1),
            h AS (
                SELECT CAST(epoch_us(ts) AS BIGINT) // 3600000000
                           AS hr,
                       count(*) AS k
                FROM events
                WHERE event_type = (SELECT event_type FROM top1)
                GROUP BY hr),
            span AS (SELECT min(hr) AS h0, max(hr) AS h1 FROM h),
            grid AS (
                SELECT unnest(generate_series(h0, h1)) AS hr
                FROM span),
            g2 AS MATERIALIZED (
                SELECT grid.hr,
                       row_number() OVER (ORDER BY grid.hr) AS rk,
                       CAST(coalesce(h.k, 0) AS BIGINT) AS k
                FROM grid LEFT JOIN h USING (hr)),
            params AS (
                SELECT CAST(sum(k) AS DOUBLE) / count(*) AS r0,
                       2.0 * (CAST(sum(k) AS DOUBLE) / count(*))
                           AS r1,
                       ln(CAST(count(*) AS DOUBLE)) AS gam
                FROM g2),
            dp AS (
                SELECT rk, hr, k,
                       (SELECT r0 FROM params)
                           - k * ln((SELECT r0 FROM params)) AS c0,
                       (SELECT gam FROM params)
                           + ((SELECT r1 FROM params)
                              - k * ln((SELECT r1 FROM params))) AS c1
                FROM g2 WHERE rk = 1
                UNION ALL
                SELECT g2.rk, g2.hr, g2.k,
                       ((SELECT r0 FROM params)
                        - g2.k * ln((SELECT r0 FROM params)))
                           + least(dp.c0, dp.c1),
                       ((SELECT r1 FROM params)
                        - g2.k * ln((SELECT r1 FROM params)))
                           + least(dp.c1,
                                   dp.c0 + (SELECT gam FROM params))
                FROM dp JOIN g2 ON g2.rk = dp.rk + 1)
            SELECT hr AS hour, k, round(c0, 6) AS c0,
                   round(c1, 6) AS c1
            FROM dp ORDER BY hour
        """,
    'q_events_ams_f2': """
            WITH js AS (SELECT unnest(range(16)) AS j),
            h AS (
                SELECT CAST('0x' || substr(
                    md5('ams|' || CAST(user_id AS VARCHAR)), 1, 16)
                    AS UBIGINT) AS h
                FROM events),
            s AS (
                SELECT j,
                       SUM(CASE WHEN (h >> CAST(j AS UBIGINT))
                                     & CAST(1 AS UBIGINT)
                                     = CAST(1 AS UBIGINT)
                                THEN 1 ELSE -1 END) AS z
                FROM h CROSS JOIN js GROUP BY j),
            g AS (SELECT j // 4 AS grp, SUM(z * z) AS s4
                  FROM s GROUP BY 1),
            m AS (SELECT s4, row_number() OVER (ORDER BY s4) AS rk
                  FROM g),
            med AS (SELECT SUM(s4) AS s2 FROM m WHERE rk IN (2, 3)),
            ex AS (SELECT SUM(c * c) AS f2, SUM(c) AS n
                   FROM (SELECT count(*) AS c FROM events
                         GROUP BY user_id))
            SELECT CAST(ex.n AS BIGINT) AS n_rows,
                   CAST(ex.f2 AS BIGINT) AS exact_f2,
                   CAST(med.s2 AS DOUBLE) / 8.0 AS est_f2,
                   round(abs(CAST(med.s2 AS DOUBLE) / 8.0
                             - CAST(ex.f2 AS DOUBLE))
                         / CAST(ex.f2 AS DOUBLE), 6) AS rel_err
            FROM ex, med
        """,
    'q_events_butterflies': """
            WITH ut AS MATERIALIZED (
                SELECT DISTINCT user_id, event_type FROM events)
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   CAST(count(*) AS BIGINT) AS n_common_users,
                   CAST(count(*) * (count(*) - 1) // 2 AS BIGINT)
                       AS butterflies
            FROM ut a JOIN ut b ON a.user_id = b.user_id
                               AND a.event_type < b.event_type
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
    'q_events_ldiversity': """
            WITH cells AS (
                SELECT user_id // 10 AS ubucket,
                       (epoch_us(ts) // 3600000000) % 24 AS hod,
                       event_type, count(*) AS n
                FROM events GROUP BY 1, 2, 3),
            cls AS (
                SELECT ubucket, hod, SUM(n) AS rows_, count(*) AS ns,
                       max(n) AS max_run
                FROM cells GROUP BY 1, 2),
            low AS (SELECT * FROM cls WHERE ns < 3),
            worst AS (SELECT * FROM cls
                      ORDER BY max_run DESC, rows_ ASC LIMIT 1)
            SELECT CAST((SELECT count(*) FROM cls) AS BIGINT)
                       AS n_classes,
                   CAST((SELECT count(*) FROM low) AS BIGINT)
                       AS n_low_div,
                   CAST((SELECT coalesce(SUM(rows_), 0) FROM low)
                        AS BIGINT) AS rows_at_risk,
                   CAST((SELECT min(ns) FROM cls) AS BIGINT)
                       AS min_distinct_sens,
                   CAST(worst.max_run AS BIGINT) AS worst_run,
                   round(CAST(worst.max_run AS DOUBLE) / worst.rows_,
                         6) AS worst_share
            FROM worst
        """,
    'q_events_kmv_overlap': """
            WITH tc AS (
                SELECT event_type, count(*) AS c
                FROM events GROUP BY 1),
            top AS (
                SELECT event_type,
                       row_number() OVER (ORDER BY c DESC,
                                          event_type ASC) AS rk
                FROM tc QUALIFY rk <= 3),
            h AS (
                SELECT DISTINCT t.rk, t.event_type,
                       CAST('0x' || substr(
                           md5(CAST(e.user_id AS VARCHAR)), 1, 16)
                           AS UBIGINT) AS h
                FROM events e JOIN top t USING (event_type)),
            sk AS (
                SELECT rk, event_type, h,
                       row_number() OVER (PARTITION BY rk
                                          ORDER BY h) AS hr
                FROM h QUALIFY hr <= 64),
            pairs AS (
                SELECT a.rk AS ra, b.rk AS rb,
                       a.event_type AS type_a, b.event_type AS type_b
                FROM (SELECT DISTINCT rk, event_type FROM sk) a
                JOIN (SELECT DISTINCT rk, event_type FROM sk) b
                     ON a.rk < b.rk),
            uni0 AS (
                SELECT p.ra, p.rb, s.h,
                       count(DISTINCT s.rk) AS sides
                FROM pairs p JOIN sk s ON s.rk IN (p.ra, p.rb)
                GROUP BY 1, 2, 3),
            uni AS (
                SELECT ra, rb, h, sides,
                       row_number() OVER (PARTITION BY ra, rb
                                          ORDER BY h) AS ur
                FROM uni0 QUALIFY ur <= 64),
            stats AS (
                SELECT ra, rb, count(*) AS kp,
                       sum(CASE WHEN sides = 2 THEN 1 ELSE 0 END)
                           AS kc,
                       max(h) AS maxh
                FROM uni GROUP BY 1, 2),
            eu AS (
                SELECT DISTINCT t.rk, e.user_id
                FROM events e JOIN top t USING (event_type)),
            exj AS (
                SELECT p.ra, p.rb, eu.user_id,
                       count(DISTINCT eu.rk) AS cnt
                FROM pairs p JOIN eu ON eu.rk IN (p.ra, p.rb)
                GROUP BY 1, 2, 3),
            ex AS (
                SELECT ra, rb,
                       sum(CASE WHEN cnt = 2 THEN 1 ELSE 0 END)
                           AS inter,
                       count(*) AS un
                FROM exj GROUP BY 1, 2)
            SELECT p.type_a, p.type_b,
                   CAST(s.kp AS BIGINT) AS k_used,
                   CAST(s.kc AS BIGINT) AS k_common,
                   round(CAST(s.kc AS DOUBLE) / s.kp, 6)
                       AS jaccard_est,
                   round(CASE WHEN s.kp < 64
                              THEN CAST(s.kp AS DOUBLE)
                              ELSE 63.0 / (CAST(s.maxh AS DOUBLE)
                                   / 18446744073709551616.0) END, 6)
                       AS union_est,
                   round(CAST(ex.inter AS DOUBLE) / ex.un, 6)
                       AS jaccard_exact
            FROM pairs p
            JOIN stats s ON s.ra = p.ra AND s.rb = p.rb
            JOIN ex ON ex.ra = p.ra AND ex.rb = p.rb
            ORDER BY p.ra, p.rb
        """,
}
ORACLE_REGISTRY.update(ORACLES)
ORACLES['q_events_dtw'] = ORACLE_REGISTRY['q_events_dtw'] = _dtw_oracle_sql(n=24)
ORACLES['q_events_bh_fdr'] = ORACLE_REGISTRY['q_events_bh_fdr'] = _bh_fdr_oracle_sql(alpha=0.1)
ORACLES['q_events_mantel_haenszel'] = ORACLE_REGISTRY['q_events_mantel_haenszel'] = _MH_ORACLE_SQL
ORACLES['q_events_cochran_armitage'] = ORACLE_REGISTRY['q_events_cochran_armitage'] = _CA_ORACLE_SQL
ORACLES['q_events_hurst'] = ORACLE_REGISTRY['q_events_hurst'] = _hurst_oracle_sql()
ORACLES['q_events_gumbel'] = ORACLE_REGISTRY['q_events_gumbel'] = _GUMBEL_ORACLE_SQL
ORACLES['q_events_conformal'] = ORACLE_REGISTRY['q_events_conformal'] = _CONFORMAL_ORACLE_SQL
ORACLES['q_events_control_chart'] = ORACLE_REGISTRY['q_events_control_chart'] = _CONTROL_CHART_ORACLE_SQL
ORACLES['q_events_max_excess_window'] = ORACLE_REGISTRY['q_events_max_excess_window'] = _KADANE_ORACLE_SQL
ORACLES['q_events_kendall_w'] = ORACLE_REGISTRY['q_events_kendall_w'] = _KENDALL_W_ORACLE_SQL
ORACLES['q_events_fisher'] = ORACLE_REGISTRY['q_events_fisher'] = _FISHER_ORACLE_SQL
ORACLES['q_events_viterbi'] = ORACLE_REGISTRY['q_events_viterbi'] = _viterbi_oracle_sql(steps=4)
