"""Split of the query registry: ``users`` part (mechanically derived from the original queries.py by scripts/split_queries.py; unit order and source text preserved)."""

from __future__ import annotations
import re
import numpy as np
import pandas as pd
from jerex_ray.config import PipelineConfig
from jerex_ray.runtime import configure_data_context
from jerex_ray import relational as R
from jerex_ray.pipelines.queries._shared import ORACLE_REGISTRY
from jerex_ray.pipelines.queries._shared import _round_half_away  # noqa: E501

def q_user_activity_outer(sf_dir: str):
    """FULL OUTER join of two grouped fact aggregates (order totals ⟗
    event totals per user): both sides reduce through the combiner
    first, then a hash-partitioned ``Dataset.join(full_outer)`` —
    missing sides surface as 0/NULL exactly as the SQL."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    orders = read_parquet_sized(f"{sf_dir}/orders.parquet",
                                columns=["o_custkey", "o_totalprice"])
    ev = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id", "value"])
    o_agg = grouped_aggregate(
        orders.map_batches(
            lambda df: df.rename(columns={"o_custkey": "user_id"}),
            batch_format="pandas"),
        ["user_id"],
        {"n_orders": (None, "count"),
         "total_spent": ("o_totalprice", "sum")}).materialize()
    e_agg = grouped_aggregate(
        ev, ["user_id"],
        {"n_events": (None, "count"),
         "sum_value": ("value", "sum")}).materialize()
    out = o_agg.join(e_agg, join_type="full_outer", num_partitions=8,
                     on=("user_id",), right_on=("user_id",)).to_pandas()
    out["user_id"] = out["user_id"].astype("int64")
    for c in ("n_orders", "n_events"):
        out[c] = out[c].fillna(0).astype("int64")
    out["total_spent"] = out["total_spent"].astype("float64").round(2)
    out["sum_value"] = out["sum_value"].astype("float64").round(2)
    cols = ["user_id", "n_orders", "total_spent", "n_events", "sum_value"]
    return out[cols].sort_values("user_id").reset_index(drop=True)

def q_user_event_paths(sf_dir: str):
    """Per-user ordered event-type path string (clickstream
    sequence materialization): one user co-location, vectorized
    in-block sort + join — the feature a sequence-mining or
    next-event model trains on."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "ts", "user_id",
                                     "event_type"])

    def paths(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                                 "path": pd.Series(dtype="object")})
        d = df.sort_values(["user_id", "ts", "event_id"])
        out = d.groupby("user_id", sort=False)["event_type"] \
            .agg(">".join).reset_index(name="path")
        return out

    out = grouped_apply(ds, ["user_id"], paths).to_pandas()
    out["user_id"] = out["user_id"].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)

def q_user_coverage(sf_dir: str):
    """Per-user activity coverage: union of [ts, ts+300 s) intervals
    merged into islands (overlap-merge via running-max of interval
    ends), reporting island count and total covered seconds — the
    interval-union operator behind uptime/abuse-rate metrics."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["ts", "user_id"])
    width_us = 300 * 1_000_000

    def cover(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({
                "user_id": pd.Series(dtype="int64"),
                "n_islands": pd.Series(dtype="int64"),
                "covered_sec": pd.Series(dtype="int64")})
        d = df.sort_values(["user_id", "ts"])
        s = d["ts"].astype("int64").to_numpy()          # µs since epoch
        e = s + width_us
        uid = d["user_id"].to_numpy()
        newu = np.concatenate(([True], uid[1:] != uid[:-1]))
        # running max of e over the user's PREVIOUS intervals: per-user
        # cummax, shifted one row (users are contiguous after the sort,
        # so the global shift only leaks across user boundaries — and
        # those rows are forced open below)
        pmax = pd.Series(e).groupby(pd.Series(uid).values) \
            .cummax().shift().to_numpy()
        pmax[newu] = -np.inf
        island_open = s > pmax
        isl = np.cumsum(island_open)
        g = pd.DataFrame({"user_id": uid, "isl": isl, "s": s, "e": e}) \
            .groupby(["user_id", "isl"], sort=True) \
            .agg(lo=("s", "min"), hi=("e", "max")).reset_index()
        cov = ((g["hi"] - g["lo"]) // 1_000_000).astype("int64")
        out = g.assign(cov=cov).groupby("user_id", sort=True) \
            .agg(n_islands=("isl", "size"), covered_sec=("cov", "sum")) \
            .reset_index()
        return out.astype({"user_id": "int64", "n_islands": "int64",
                           "covered_sec": "int64"})

    out = grouped_apply(ds, ["user_id"], cover).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)

def q_user_twap(sf_dir: str):
    """Per-user time-weighted average value (TWAP): each event's value
    weighted by the exact microseconds until the user's next event
    (last event carries no weight) — the time-series aggregate where
    plain AVG is wrong whenever sampling is irregular. Single-user
    events (no interval) and all-zero spans are excluded on both
    sides."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "ts", "user_id",
                                     "value"])

    def twap(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                              "twap": pd.Series(dtype="float64")})
        if df.empty:
            return empty
        d = df.sort_values(["user_id", "ts", "event_id"])
        t = d["ts"].astype("int64").to_numpy()
        uid = d["user_id"].to_numpy()
        dt = np.concatenate((t[1:] - t[:-1], [0])).astype(np.float64)
        last = np.concatenate((uid[1:] != uid[:-1], [True]))
        dt[last] = 0.0
        w = d["value"].to_numpy(np.float64) * dt
        g = pd.DataFrame({"user_id": uid, "w": w, "dt": dt}) \
            .groupby("user_id", sort=True).sum().reset_index()
        g = g[g["dt"] > 0]
        if g.empty:
            return empty
        return pd.DataFrame({"user_id": g["user_id"].astype("int64"),
                             "twap": (g["w"] / g["dt"]).round(6)})

    out = grouped_apply(ds, ["user_id"], twap).to_pandas()
    out["user_id"] = out["user_id"].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)

def q_user_streaks(sf_dir: str):
    """Longest consecutive-day activity streak per user (plus total
    active days) — the gaps-and-islands idiom on the DATE axis: one
    user co-location, distinct epoch-days, the day−rank island key,
    vectorized run-length reduction."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["ts", "user_id"])

    def streaks(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({
                "user_id": pd.Series(dtype="int64"),
                "max_streak": pd.Series(dtype="int64"),
                "n_active_days": pd.Series(dtype="int64")})
        day = (df["ts"].astype("int64") // 86_400_000_000).to_numpy()
        d = pd.DataFrame({"user_id": df["user_id"].to_numpy(),
                          "day": day}).drop_duplicates() \
            .sort_values(["user_id", "day"])
        u = d["user_id"].to_numpy()
        dy = d["day"].to_numpy()
        rn = d.groupby("user_id", sort=False).cumcount().to_numpy()
        isl = dy - rn                       # constant within a run
        runs = pd.DataFrame({"user_id": u, "isl": isl}) \
            .groupby(["user_id", "isl"], sort=False).size() \
            .reset_index(name="len")
        out = runs.groupby("user_id", sort=True) \
            .agg(max_streak=("len", "max"),
                 n_active_days=("len", "sum")).reset_index()
        return out.astype({"user_id": "int64", "max_streak": "int64",
                           "n_active_days": "int64"})

    out = grouped_apply(ds, ["user_id"], streaks).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)

def q_user_entry_exit(sf_dir: str):
    """Entry/exit analysis: each user's first and last event (type and
    value) under the total (ts, event_id) order — the arg_min/arg_max
    pair per group, one co-location and a vectorized head/tail pick
    per user run."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "ts", "user_id",
                                     "event_type", "value"])

    def firstlast(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({
                "user_id": pd.Series(dtype="int64"),
                "first_type": pd.Series(dtype="object"),
                "first_value": pd.Series(dtype="float64"),
                "last_type": pd.Series(dtype="object"),
                "last_value": pd.Series(dtype="float64")})
        d = df.sort_values(["user_id", "ts", "event_id"])
        g = d.groupby("user_id", sort=True)
        f = g.nth(0)
        l = g.nth(-1)
        return pd.DataFrame({
            "user_id": f["user_id"].to_numpy(np.int64),
            "first_type": f["event_type"].to_numpy(),
            "first_value": f["value"].to_numpy(np.float64),
            "last_type": l["event_type"].to_numpy(),
            "last_value": l["value"].to_numpy(np.float64)})

    out = grouped_apply(ds, ["user_id"], firstlast).to_pandas()
    out["user_id"] = out["user_id"].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)

def q_user_event_type_set(sf_dir: str):
    """Collect-set aggregate (string_agg DISTINCT … ORDER BY): per
    user, the alphabetized comma-joined set of event types seen in
    the first two days. The set is |types|-bounded, so the engine
    builds it VECTORIZED from the pivot booleans (5 numpy selects) —
    never a per-group Python join — after the (user, type) combiner
    count and one hash co-location."""
    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    types = ["click", "error", "purchase", "signup", "view"]
    cutoff = pd.Timestamp("2024-01-03")
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type", "ts"])
    ds = ds.map_batches(
        lambda df: df.loc[df["ts"] < cutoff, ["user_id", "event_type"]],
        batch_format="pandas")
    counts = grouped_aggregate(ds, ["user_id", "event_type"],
                               {"n": (None, "count")})

    def set_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                                 "types": pd.Series(dtype="object")})
        wide = df.pivot_table(index="user_id", columns="event_type",
                              values="n", aggfunc="sum", fill_value=0)
        wide = wide.reindex(columns=types, fill_value=0)
        s = np.full(len(wide), "", dtype=object)
        for t in types:
            m = wide[t].to_numpy() > 0
            s = np.where(m, np.where(s == "", t, s + "," + t), s)
        return pd.DataFrame({"user_id": wide.index.to_numpy(),
                             "types": s})

    out = grouped_apply(counts, ["user_id"], set_block).to_pandas()
    out["user_id"] = out["user_id"].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)

def q_user_als_step(sf_dir: str, *, rank: int = 2, lam: float = 0.1):
    """One exact ALS half-step of a rank-2 matrix factorization over
    the user × event-type count matrix — the collaborative-filtering
    training primitive: item factors are FIXED md5-derived constants
    (so the SQL oracle replays them bit-for-bit), and each user's
    factor solves the ridge normal equations
    x_u = (Σ_i f_i f_iᵀ + λI)⁻¹ Σ_i c_ui f_i over the user's observed
    items, by the closed 2×2 Cramer solve. Dataflow: one combiner pass
    to (user, type) counts, the |types|-bounded factor table broadcasts,
    per-user sums reduce — users never co-reside, no shuffle beyond the
    count aggregate."""
    import hashlib

    import ray

    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type"])
    counts = grouped_aggregate(ds, ["user_id", "event_type"],
                               {"c": (None, "count")},
                               result_hint="large").materialize()

    def factor(t: str, j: int) -> float:
        h = hashlib.md5(f"{t}|{j}".encode()).hexdigest()[:8]
        return (int(h, 16) % 1000000) / 1000000.0 - 0.5

    types = sorted(set(
        counts.map_batches(
            lambda b: pd.DataFrame({"event_type": b["event_type"]
                                    .unique()}),
            batch_format="pandas").to_pandas()["event_type"]))
    fmap = {t: (factor(t, 1), factor(t, 2)) for t in types}
    f_ref = ray.put(fmap)

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        fm = ray.get(f_ref)
        if df.empty or "c" not in df.columns:
            return pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                                 **{k: pd.Series(dtype="float64")
                                    for k in ("a11", "a12", "a22",
                                              "b1", "b2")}})
        f1 = df["event_type"].map({k: v[0] for k, v in fm.items()}) \
            .to_numpy(np.float64)
        f2 = df["event_type"].map({k: v[1] for k, v in fm.items()}) \
            .to_numpy(np.float64)
        c = df["c"].to_numpy(np.float64)
        g = pd.DataFrame({"user_id": df["user_id"].to_numpy(),
                          "a11": f1 * f1, "a12": f1 * f2,
                          "a22": f2 * f2, "b1": c * f1, "b2": c * f2})
        return g.groupby("user_id", sort=False, as_index=False).sum()

    m = grouped_aggregate(
        counts.map_batches(partials, batch_format="pandas"),
        ["user_id"],
        {k: (k, "sum") for k in ("a11", "a12", "a22", "b1", "b2")}) \
        .to_pandas()
    a11 = m["a11"].to_numpy(np.float64) + lam
    a22 = m["a22"].to_numpy(np.float64) + lam
    a12 = m["a12"].to_numpy(np.float64)
    b1 = m["b1"].to_numpy(np.float64)
    b2 = m["b2"].to_numpy(np.float64)
    det = a11 * a22 - a12 * a12
    out = pd.DataFrame({"user_id": m["user_id"].astype("int64"),
                        "x1": ((a22 * b1 - a12 * b2) / det).round(6),
                        "x2": ((a11 * b2 - a12 * b1) / det).round(6)})
    return out.sort_values("user_id").reset_index(drop=True)

def q_user_features(sf_dir: str):
    """Feature-store assembly: one wide per-user training-feature row
    (event count, mean value, distinct event types, active days, span
    days) — the materialization shape every downstream model consumes.
    Everything reduces in ONE combiner pass except distinct types and
    active days, which pre-dedup under (user, key) co-location first
    (the dedup-explode-dedup shape) so no count-distinct state grows
    unbounded."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type", "ts",
                                     "value"])

    def base(df: pd.DataFrame) -> pd.DataFrame:
        d = df["ts"].astype("datetime64[us]").astype("int64") \
            // 86_400_000_000
        g = pd.DataFrame({"user_id": df["user_id"].to_numpy(),
                          "n": 1,
                          "s": df["value"].to_numpy(np.float64),
                          "dmin": d, "dmax": d})
        return g.groupby("user_id", sort=False, as_index=False) \
            .agg(n=("n", "sum"), s=("s", "sum"),
                 dmin=("dmin", "min"), dmax=("dmax", "max"))

    b = grouped_aggregate(ds.map_batches(base, batch_format="pandas"),
                          ["user_id"],
                          {"n": ("n", "sum"), "s": ("s", "sum"),
                           "dmin": ("dmin", "min"),
                           "dmax": ("dmax", "max")}).to_pandas()

    types = grouped_aggregate(ds, ["user_id", "event_type"],
                              {"k": (None, "count")},
                              result_hint="large")
    n_types = grouped_aggregate(types, ["user_id"],
                                {"n_types": (None, "count")}) \
        .to_pandas()

    def day_rows(df: pd.DataFrame) -> pd.DataFrame:
        d = df["ts"].astype("datetime64[us]").astype("int64") \
            // 86_400_000_000
        return pd.DataFrame({"user_id": df["user_id"].to_numpy(),
                             "day": d}).drop_duplicates()

    days = grouped_aggregate(
        ds.map_batches(day_rows, batch_format="pandas"),
        ["user_id", "day"], {"k": (None, "count")},
        result_hint="large")
    n_days = grouped_aggregate(days, ["user_id"],
                               {"n_days": (None, "count")}).to_pandas()

    out = b.merge(n_types, on="user_id").merge(n_days, on="user_id")
    mv = out["s"].to_numpy(np.float64) / out["n"].to_numpy(np.float64)
    res = pd.DataFrame({
        "user_id": out["user_id"].astype("int64"),
        "n_events": out["n"].astype("int64"),
        # half-away mirror: np.round is half-even, DuckDB half-away,
        # and means of 2-decimal values DO land on exact .5 boundaries
        "mean_value": np.copysign(np.floor(np.abs(mv) * 1e6 + 0.5),
                                  mv) / 1e6,
        "n_types": out["n_types"].astype("int64"),
        "active_days": out["n_days"].astype("int64"),
        "span_days": (out["dmax"] - out["dmin"]).astype("int64")})
    return res.sort_values("user_id").reset_index(drop=True)

def q_user_seq_patterns(sf_dir: str):
    """Frequent 2-sequences (GSP tier 2, Srikant & Agrawal '96): for
    every ordered type pair (ant, con), the number of users with some
    ant event strictly before some con event, and its support share.
    The existence test compresses to min-ts(ant) < max-ts(con), so ONE
    (user, type) min/max combiner pass reduces the corpus to a
    users×types table; users co-locate once and each block self-merges
    its per-user type rows (≤ |types|² pairs per user). Counts are
    integer-exact; support is one division, 6-decimal rounded."""
    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type", "ts"])
    mt = grouped_aggregate(ds, ["user_id", "event_type"],
                           {"mn": ("ts", "min"), "mx": ("ts", "max")},
                           result_hint="large").materialize()
    n_users = int(grouped_aggregate(mt, ["user_id"],
                                    {"c": (None, "count")}).count())

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"ant": pd.Series(dtype="object"),
                                 "con": pd.Series(dtype="object")})
        m = df.merge(df, on="user_id")
        m = m[m["mn_x"] < m["mx_y"]]
        return pd.DataFrame({"ant": m["event_type_x"].to_numpy(),
                             "con": m["event_type_y"].to_numpy()})

    cnt = grouped_aggregate(
        grouped_apply(mt, ["user_id"], pairs),
        ["ant", "con"], {"n_users": (None, "count")}).to_pandas()
    cnt["n_users"] = cnt["n_users"].astype("int64")
    cnt["support"] = np.round(
        cnt["n_users"].to_numpy(np.float64) / n_users, 6)
    return cnt.sort_values(["ant", "con"]).reset_index(drop=True)

def q_user_markov_backtest(sf_dir: str):
    """Top-1 next-event backtest of the first-order Markov model:
    predict the most frequent successor of each type (tie → type
    asc) and score it on the SAME transition table — accuracy per
    source state from one distributed count pass
    (``ops/windows.transition_matrix``); no second corpus scan, the
    |types|²-bounded table answers both fit and eval. Integer counts,
    one division, SQL row_number oracle."""
    from jerex_ray.ops.windows import transition_matrix
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts",
                                     "event_type"])
    tm = transition_matrix(ds, key="user_id", ts_col="ts",
                           id_col="event_id", type_col="event_type")
    if tm.empty:
        return pd.DataFrame({"prev": pd.Series(dtype="object")})
    tm = tm.sort_values(["prev_type", "cnt", "next_type"],
                        ascending=[True, False, True])
    best = tm.groupby("prev_type", sort=False).head(1)
    totals = tm.groupby("prev_type")["cnt"].sum()
    out = pd.DataFrame({
        "prev": best["prev_type"].to_numpy(),
        "n_transitions": best["prev_type"].map(totals)
        .to_numpy(np.int64),
        "predicted": best["next_type"].to_numpy(),
        "n_correct": best["cnt"].to_numpy(np.int64)})
    out["accuracy"] = np.round(
        out["n_correct"].to_numpy(np.float64)
        / out["n_transitions"].to_numpy(np.float64), 6)
    return out.sort_values("prev").reset_index(drop=True)

def q_user_ab_assignment(sf_dir: str):
    """Deterministic experiment bucketing + sample-ratio-mismatch
    check (the first audit any A/B platform runs): arm = md5(user)
    parity (the oracle replays the identical hash), per-arm user and
    event counts, and the SRM chi-square (na−nb)²/(na+nb) on USER
    counts with its ~χ²₁ threshold flag. One combiner pass over
    (user → events), arm assignment on the user-bounded table."""
    import hashlib

    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id"])
    users = grouped_aggregate(ds, ["user_id"],
                              {"n_events": (None, "count")}).to_pandas()
    arm = np.array([
        int.from_bytes(hashlib.md5(f"ab|{u}".encode()).digest()[:8],
                       "big") % 2
        for u in users["user_id"]], dtype=np.int64)
    users = users.assign(arm=arm)
    g = users.groupby("arm").agg(n_users=("user_id", "count"),
                                 n_events=("n_events", "sum"))
    na = float(g.loc[0, "n_users"]) if 0 in g.index else 0.0
    nb = float(g.loc[1, "n_users"]) if 1 in g.index else 0.0
    chi2 = (na - nb) * (na - nb) / (na + nb)
    out = g.reset_index()
    out["arm"] = out["arm"].astype("int64")
    out["n_users"] = out["n_users"].astype("int64")
    out["n_events"] = out["n_events"].astype("int64")
    out["srm_chi2"] = round(chi2, 6)
    out["srm_flag"] = np.int64(chi2 > 3.841459)  # chi2_1 at alpha=.05
    return out.sort_values("arm").reset_index(drop=True)

def q_user_km_survival(sf_dir: str):
    """Kaplan–Meier survival curve of inter-purchase times with
    right-censoring (Kaplan & Meier '58) — "how long until a user
    buys again", the churn/retention primitive done properly: the
    gap after each user's LAST purchase is censored at the stream
    horizon instead of dropped. Users co-locate once for the LAG
    pass; (duration, censored) rows reduce through the combiner to a
    distinct-duration grid; at-risk counts are a reverse cumulative
    sum on that grid and S(t) = exp(Σ ln(1−dᵢ/nᵢ)) accumulates with
    math.log/exp (glibc — the same libm DuckDB's ln/exp bind), so
    the window-sum oracle matches at 6 decimals. Scale note: at
    corpus scale quantize durations (seconds/minutes) so the grid
    stays bounded — the estimator is unchanged on the quantized
    grid."""
    import math

    import pyarrow.parquet as _pq

    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts",
                                     "event_type"])
    ts_col = _pq.read_table(f"{sf_dir}/events.parquet",
                            columns=["ts"])["ts"].to_pandas()
    horizon = int(ts_col.astype("datetime64[us]").astype("int64")
                  .max())

    def durations(block: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"dur": pd.Series(dtype="int64"),
                              "cens": pd.Series(dtype="int64"),
                              "n": pd.Series(dtype="int64")})
        b = block[block["event_type"] == "purchase"]
        if b.empty:
            return empty
        b = b.sort_values(["user_id", "ts", "event_id"])
        t = b["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        uid = b["user_id"].to_numpy()
        same = np.r_[uid[1:] == uid[:-1], False]
        dur = np.where(same, np.r_[t[1:], 0] - t, horizon - t)
        cens = (~same).astype(np.int64)
        g = (pd.DataFrame({"dur": dur, "cens": cens, "n": 1})
             .groupby(["dur", "cens"], sort=False).sum().reset_index())
        return g

    grid = grouped_aggregate(
        grouped_apply(ds, ["user_id"], durations),
        ["dur", "cens"], {"n": ("n", "sum")}).to_pandas()
    grid = grid.sort_values("dur").reset_index(drop=True)
    total = int(grid["n"].sum())
    # at-risk just before t = total - (#durations strictly < t)
    by_t = grid.groupby("dur").agg(
        all_n=("n", "sum"),
        d=("n", lambda s: 0)).reset_index()
    dcounts = grid[grid["cens"] == 0].groupby("dur")["n"].sum()
    by_t["d"] = by_t["dur"].map(dcounts).fillna(0).astype(np.int64)
    before = np.r_[0, np.cumsum(by_t["all_n"].to_numpy(np.int64))[:-1]]
    by_t["n_risk"] = total - before
    ev = by_t[by_t["d"] > 0].reset_index(drop=True)
    # terminal grid point may absorb every remaining at-risk row
    # (d == n_risk): S drops to exactly 0 there — guard the log on
    # both engines identically
    logs = [0.0 if int(r["d"]) == int(r["n_risk"])
            else math.log(1.0 - int(r["d"]) / float(r["n_risk"]))
            for _, r in ev.iterrows()]
    cums = np.cumsum(logs) if logs else np.array([])
    surv = [0.0 if int(r["d"]) == int(r["n_risk"])
            else math.exp(c)
            for (_, r), c in zip(ev.iterrows(), cums)]
    return pd.DataFrame({
        "dur_us": ev["dur"].astype("int64"),
        "n_risk": ev["n_risk"].astype("int64"),
        "n_events": ev["d"].astype("int64"),
        "survival": np.round(surv, 6)})

def q_user_logrank(sf_dir: str):
    """Log-rank test (Mantel '66) between the even- and odd-user
    cohorts' inter-purchase survival — "does cohort A churn back to
    purchase faster?", the hypothesis-test companion of
    ``q_user_km_survival``. Same one co-located LAG pass, now with a
    cohort key; per pooled event time the hypergeometric moments
    E₁ = d·n₁/n and V accumulate over the duration grid (driver
    arithmetic, grid-bounded; at corpus scale quantize durations to
    keep the grid bounded). χ² = (Σ(d₁−E₁))²/ΣV. Integer counts +
    identically-sequenced float terms → SQL parity at 6 decimals."""
    import pyarrow.parquet as _pq

    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts",
                                     "event_type"])
    ts_col = _pq.read_table(f"{sf_dir}/events.parquet",
                            columns=["ts"])["ts"].to_pandas()
    horizon = int(ts_col.astype("datetime64[us]").astype("int64")
                  .max())

    def durations(block: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"dur": pd.Series(dtype="int64"),
                              "cens": pd.Series(dtype="int64"),
                              "grp": pd.Series(dtype="int64"),
                              "n": pd.Series(dtype="int64")})
        b = block[block["event_type"] == "purchase"]
        if b.empty:
            return empty
        b = b.sort_values(["user_id", "ts", "event_id"])
        t = b["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        uid = b["user_id"].to_numpy(np.int64)
        same = np.r_[uid[1:] == uid[:-1], False]
        dur = np.where(same, np.r_[t[1:], 0] - t, horizon - t)
        return (pd.DataFrame({"dur": dur,
                              "cens": (~same).astype(np.int64),
                              "grp": uid % 2, "n": 1})
                .groupby(["dur", "cens", "grp"], sort=False)
                .sum().reset_index())

    grid = grouped_aggregate(
        grouped_apply(ds, ["user_id"], durations),
        ["dur", "cens", "grp"], {"n": ("n", "sum")}).to_pandas()
    total = int(grid["n"].sum())
    total1 = int(grid.loc[grid["grp"] == 1, "n"].sum())
    by_t = grid.groupby("dur").agg(all_n=("n", "sum")).reset_index() \
        .sort_values("dur").reset_index(drop=True)
    d_all = grid[grid["cens"] == 0].groupby("dur")["n"].sum()
    d1 = grid[(grid["cens"] == 0) & (grid["grp"] == 1)] \
        .groupby("dur")["n"].sum()
    all1 = grid[grid["grp"] == 1].groupby("dur")["n"].sum()
    by_t["d"] = by_t["dur"].map(d_all).fillna(0).astype(np.int64)
    by_t["d1"] = by_t["dur"].map(d1).fillna(0).astype(np.int64)
    by_t["a1"] = by_t["dur"].map(all1).fillna(0).astype(np.int64)
    before = np.r_[0, np.cumsum(by_t["all_n"].to_numpy(np.int64))[:-1]]
    before1 = np.r_[0, np.cumsum(by_t["a1"].to_numpy(np.int64))[:-1]]
    n_risk = (total - before).astype(np.float64)
    n1_risk = (total1 - before1).astype(np.float64)
    ev = by_t["d"].to_numpy(np.float64)
    ev1 = by_t["d1"].to_numpy(np.float64)
    keep = (ev > 0)
    n, n1, d, dd1 = n_risk[keep], n1_risk[keep], ev[keep], ev1[keep]
    e1 = d * n1 / n
    with np.errstate(invalid="ignore", divide="ignore"):
        v = np.where(n > 1.0,
                     d * (n1 / n) * (1.0 - n1 / n) * (n - d)
                     / (n - 1.0), 0.0)
    omE = float((dd1 - e1).sum())
    V = float(v.sum())
    chi2 = omE * omE / V
    return pd.DataFrame({
        "n_events_1": [np.int64(dd1.sum())],
        "n_events_0": [np.int64((d - dd1).sum())],
        "obs_minus_exp": [round(omE, 6)],
        "variance": [round(V, 6)],
        "chi2": [round(chi2, 6)]})

def q_user_cuped(sf_dir: str):
    """CUPED variance reduction (Deng et al., WSDM '13) on the A/B
    cohorts: per-user post-period mean value adjusted by the
    pre-period covariate, θ = Σx̃ỹ/Σx̃² fitted globally, then per-arm
    variance of Y vs Y_adj — the experimentation-platform op that
    shrinks CIs without touching the treatment. Pre/post split at
    the stream's timestamp midpoint; per-user means through ONE
    combiner pass; θ and the per-arm two-pass variances run on the
    user-bounded table. Same expression sequencing as the SQL
    oracle; 6-decimal rounding absorbs sum-order dust."""
    import pyarrow.parquet as _pq

    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ts_col = _pq.read_table(f"{sf_dir}/events.parquet",
                            columns=["ts"])["ts"].to_pandas() \
        .astype("datetime64[us]").astype("int64")
    mid = (int(ts_col.min()) + int(ts_col.max())) // 2
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "value"])

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        t = df["ts"].astype("datetime64[us]").astype("int64") \
            .to_numpy()
        post = (t > mid).astype(np.int64)
        return (pd.DataFrame({"user_id": df["user_id"].to_numpy(),
                              "period": post,
                              "s": df["value"].to_numpy(np.float64),
                              "n": 1})
                .groupby(["user_id", "period"], sort=False)
                .sum().reset_index())

    m = grouped_aggregate(
        ds.map_batches(partials, batch_format="pandas",
                       batch_size=8192),
        ["user_id", "period"], {"s": ("s", "sum"), "n": ("n", "sum")},
        result_hint="large").to_pandas()
    wide = m.pivot(index="user_id", columns="period",
                   values=["s", "n"])
    both = wide.dropna()
    x = (both[("s", 0)] / both[("n", 0)]).to_numpy(np.float64)
    y = (both[("s", 1)] / both[("n", 1)]).to_numpy(np.float64)
    uid = both.index.to_numpy(np.int64)
    mx, my = x.mean(), y.mean()
    theta = ((x - mx) * (y - my)).sum() / ((x - mx) * (x - mx)).sum()
    yadj = y - theta * (x - mx)
    def mirror(v: float) -> float:
        return float(np.copysign(np.floor(abs(v) * 1e6 + 0.5), v)
                     / 1e6)

    rows = []
    for arm in (0, 1):
        sel = (uid % 2) == arm
        ya, yj = y[sel], yadj[sel]
        va = ((ya - ya.mean()) ** 2).sum() / len(ya)
        vj = ((yj - yj.mean()) ** 2).sum() / len(yj)
        rows.append((arm, len(ya), mirror(float(ya.mean())),
                     mirror(float(yj.mean())), mirror(float(va)),
                     mirror(float(vj)), mirror(float(theta)),
                     mirror(float(1.0 - vj / va))))
    return pd.DataFrame(rows, columns=[
        "arm", "n_users", "mean_y", "mean_y_adj", "var_y",
        "var_y_adj", "theta", "var_reduction"])

def q_user_dbscan(sf_dir: str, *, eps: int = 2, min_pts: int = 3):
    """DBSCAN over per-user behavior points (x = event count,
    y = total spend in 10-dollar units — both exact integers):
    grid-bucketed ε-pair generation, core/border/noise roles, cluster
    = min core id of the density-connected component
    (``ops/dbscan.dbscan_2d``; deterministic min-rule border
    assignment). Integer coordinates + integer ε² predicate mean the
    all-pairs + recursive-closure SQL oracle matches exactly."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.ops.dbscan import dbscan_2d
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id", "value"])

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "n": np.int64(1),
            "cents": np.round(df["value"].to_numpy(np.float64)
                              * 100.0).astype(np.int64)})

    agg = grouped_aggregate(
        ds.map_batches(partials, batch_format="pandas"),
        ["user_id"], {"x": ("n", "sum"), "cents": ("cents", "sum")})

    def to_pts(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"id": pd.Series(dtype="int64"),
                                 "x": pd.Series(dtype="int64"),
                                 "y": pd.Series(dtype="int64")})
        return pd.DataFrame({
            "id": df["user_id"].to_numpy(np.int64),
            "x": df["x"].to_numpy(np.int64),
            "y": np.floor_divide(df["cents"].to_numpy(np.int64),
                                 10000)})

    pts = agg.map_batches(to_pts, batch_format="pandas")
    out = dbscan_2d(pts, id_col="id", x_col="x", y_col="y",
                    eps=eps, min_pts=min_pts)
    return out.rename(columns={"id": "user_id"})

def q_user_jump_resize(sf_dir: str):
    """Jump-consistent-hash shard resize audit (Lamping & Veach '14):
    every user is assigned a shard at S=32 and at S=33 by the
    stateless jump hash, and the output certifies the resize
    contract a fixed-size cluster grows under — the ONLY keys that
    move are the ~1/33 that land in the NEW shard 32 (ballistic
    movement, no ring to rebuild, no table to ship). Bit-exact on
    both engines: the mod-2⁶⁴ LCG replays in SQL via split
    multiplication (the 128-bit product decomposed as
    hi·2³² + lo mod 2⁶⁴, each partial HUGEINT-safe) and the float
    step uses floor() because DuckDB CAST(double AS BIGINT) rounds
    while the paper's C truncates. One combiner pass to the
    user-bounded distinct table, then a stateless vectorized
    map_batches (O(ln S) lane-masked iterations per key — the same
    per-row cost at 10¹² keys). See ``ops/layout.py:
    jump_consistent_hash``."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.ops.layout import jump_consistent_hash
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id"])
    users = grouped_aggregate(ds, ["user_id"],
                              {"n_events": (None, "count")})

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].to_numpy(np.int64)
        s32 = jump_consistent_hash(u, 32)
        s33 = jump_consistent_hash(u, 33)
        return pd.DataFrame({
            "user_id": u, "shard32": s32, "shard33": s33,
            "moved": (s32 != s33).astype(np.int64)})

    out = users.map_batches(assign, batch_format="pandas").to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)

def q_user_wilson_ci(sf_dir: str):
    """Wilson score interval (Wilson '27) for the high-value
    conversion rate — the binomial CI every dashboard should ship
    instead of the Wald interval (which collapses at p̂ near 0/1 and
    small n): center (p̂ + z²/2n)/(1 + z²/n), half-width
    z√(p̂(1−p̂)/n + z²/4n²)/(1 + z²/n), z = 1.959964. Exactness: s
    and n are exact integers from ONE combiner pass; the interval is
    a single fixed float expression evaluated identically on both
    engines (sqrt IEEE-exact, z as a shared literal) — written in
    the n-scaled form lo,hi = (2ns + z²n ∓ z·√(z²n² + 4ns(n−s)·n))
    / (2n(n + z²))… simplified here to the textbook form with p̂ =
    s/n computed once. O(1) driver arithmetic."""
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
    n = len(users)
    s = int(users["conv"].sum())
    import math
    z = 1.959964
    p = float(s) / float(n)
    denom = 1.0 + z * z / n
    center = (p + z * z / (2.0 * n)) / denom
    half = (z * math.sqrt(p * (1.0 - p) / n
                          + z * z / (4.0 * n * n))) / denom
    return pd.DataFrame({
        "n": [np.int64(n)], "s": [np.int64(s)],
        "p_hat": [round(p, 6)],
        "wilson_lo": [round(center - half, 6)],
        "wilson_hi": [round(center + half, 6)]})

def q_user_secretary(sf_dir: str):
    """Secretary-rule replay (the 1/e optimal-stopping law; Lindley
    '61, Dynkin '63): for every user, walk their event-value stream
    in (ts, event_id) order, observe the first ⌊n·367879/10⁶⌋
    values (1/e as an exact integer rational — no float e), then
    accept the FIRST value strictly above the observed prefix
    maximum, or be forced onto the last — did the rule capture the
    user's true maximum? The optimal-stopping audit for any
    commit-now-or-wait decision (cache admission, spot bidding,
    best-offer acceptance). Pure comparisons — no value arithmetic
    — so the SQL window replay agrees on every user; the only float
    is the success-rate division. Per-user replay co-located once
    (grouped_apply), success bits reduce through ONE combiner."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_id", "ts",
                                     "value"])

    def replay(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                              "success": pd.Series(dtype="int64")})
        if df.empty:
            return empty
        d = df.copy()
        d["t"] = d["ts"].astype("datetime64[us]").astype("int64")
        out = []
        for uid, grp in d.groupby("user_id", sort=False):
            v = grp.sort_values(["t", "event_id"])["value"] \
                .to_numpy(np.float64)
            n = len(v)
            c = (n * 367879) // 1000000
            prefmax = v[:c].max() if c else -1.0
            acc = None
            for x in v[c:]:
                if x > prefmax:
                    acc = x
                    break
            if acc is None:
                acc = v[-1]
            out.append((int(uid), int(acc == v.max())))
        return pd.DataFrame(out, columns=["user_id", "success"]) \
            .astype({"user_id": "int64", "success": "int64"})

    res = grouped_apply(ds, ["user_id"], replay).to_pandas()
    n = len(res)
    s = int(res["success"].sum())
    return pd.DataFrame({
        "n_users": [np.int64(n)], "n_success": [np.int64(s)],
        "success_rate": [round(float(s) / float(n), 6)
                         if n else -1.0]})

def q_user_cindex(sf_dir: str):
    """Harrell's concordance index (Harrell et al. '82) of activity
    level as a risk score for time-to-repeat-purchase — the
    discrimination audit completing the survival family beside
    KM / Nelson-Aalen / log-rank: over comparable user pairs (the
    shorter observed time is an EVENT; time ties not comparable),
    C = P(higher risk → earlier event) with ½ credit for score
    ties. Exactness: durations (first→second purchase, censored at
    the stream horizon) are integer microseconds, risk = event
    count, and the doubled numerator 2·conc + ties keeps the census
    in integers — the single float is num2/(2·n_comp). One combiner
    pass each for risks and purchase times; the pair census is
    vectorized on the user-bounded table (corpus scale: the
    O(n log n) BIT-counting concordance, same algebra)."""
    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_id", "ts",
                                     "event_type"])

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "user_id": pd.Series(dtype="int64"),
            "risk": pd.Series(dtype="int64"),
            "t1": pd.Series(dtype="int64"),
            "t2": pd.Series(dtype="int64"),
            "hmax": pd.Series(dtype="int64")})
        if df.empty:
            return empty
        d = df.copy()
        d["t"] = d["ts"].astype("datetime64[us]").astype("int64")
        out = []
        for uid, grp in d.groupby("user_id", sort=False):
            p = grp[grp["event_type"] == "purchase"] \
                .sort_values(["t", "event_id"])
            t1 = int(p["t"].iloc[0]) if len(p) else -1
            t2 = int(p["t"].iloc[1]) if len(p) > 1 else -1
            out.append((int(uid), len(grp), t1, t2,
                        int(grp["t"].max())))
        return pd.DataFrame(out, columns=["user_id", "risk", "t1",
                                          "t2", "hmax"]) \
            .astype({c: "int64" for c in
                     ["user_id", "risk", "t1", "t2", "hmax"]})

    u = grouped_apply(ds, ["user_id"], per_user).to_pandas()
    horizon = int(u["hmax"].max())
    u = u[u["t1"] >= 0]
    dur = np.where(u["t2"] >= 0, u["t2"] - u["t1"],
                   horizon - u["t1"]).astype(np.int64)
    ev = (u["t2"].to_numpy(np.int64) >= 0).astype(np.int64)
    risk = u["risk"].to_numpy(np.int64)
    comp = (dur[:, None] < dur[None, :]) & (ev[:, None] == 1)
    c2 = np.where(comp,
                  2 * (risk[:, None] > risk[None, :])
                  + (risk[:, None] == risk[None, :]), 0)
    n_comp = int(comp.sum())
    num2 = int(c2.sum())
    return pd.DataFrame({
        "n_comp": [np.int64(n_comp)], "num2": [np.int64(num2)],
        "c_index": [round(float(num2) / (2 * n_comp), 6)
                    if n_comp else -1.0]})

_ALLEN_RELATIONS = ["before", "meets", "overlaps", "starts",
                    "during", "finishes", "equals", "after",
                    "met_by", "overlapped_by", "started_by",
                    "contains", "finished_by"]

def _allen_classify(s1, e1, s2, e2) -> np.ndarray:
    """Vectorized Allen's interval algebra (Allen '83): classify
    interval 1 against interval 2 into exactly one of the 13 basic
    relations (pure integer comparisons — the seven forward relations
    and six inverses; 'equals' is its own inverse). Arguments are
    integer arrays; returns an int code indexing
    ``_ALLEN_RELATIONS``."""
    out = np.full(len(np.atleast_1d(s1)), -1, dtype=np.int64)
    s1, e1 = np.atleast_1d(s1), np.atleast_1d(e1)
    s2, e2 = np.atleast_1d(s2), np.atleast_1d(e2)
    rules = [
        (e1 < s2, 0),                                    # before
        (e1 == s2, 1),                                   # meets
        ((s1 < s2) & (e1 > s2) & (e1 < e2), 2),          # overlaps
        ((s1 == s2) & (e1 < e2), 3),                     # starts
        ((s1 > s2) & (e1 < e2), 4),                      # during
        ((s1 > s2) & (s1 < e2) & (e1 == e2), 5),         # finishes
        ((s1 == s2) & (e1 == e2), 6),                    # equals
        (s1 > e2, 7),                                    # after
        (s1 == e2, 8),                                   # met_by
        ((s1 > s2) & (s1 < e2) & (e1 > e2), 9),          # ovlpd_by
        ((s1 == s2) & (e1 > e2), 10),                    # started_by
        ((s1 < s2) & (e1 > e2), 11),                     # contains
        ((s1 < s2) & (e1 == e2), 12),                    # finished_by
    ]
    for cond, code in rules:
        out[(out == -1) & cond] = code
    return out

def q_user_allen_census(sf_dir: str):
    """Allen's interval-algebra census (Allen '83) of user activity
    spans — every ordered user pair (a < b) classified into exactly
    one of the 13 basic temporal relations (before/meets/overlaps/
    starts/during/finishes/equals + inverses): the exhaustive
    temporal-join taxonomy underlying every asof/range/overlap
    operator this engine ships, audited as a corpus census ('how do
    user lifetimes actually relate?'). Spans are [first_ts,
    last_ts + 300 s) in integer microseconds (the coverage-query
    padding), so every classification is a pure integer comparison
    — the SQL oracle's 13-branch CASE agrees on every pair.
    Dataflow: ONE combiner pass to the user-bounded span table,
    broadcast once, each block classifying its rows against all
    higher-id columns and emitting 13-bin partial counts (the
    closest-pair contract). Output: relation → pair count, summing
    to C(n,2)."""
    import ray

    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts"])

    def span(df: pd.DataFrame) -> pd.DataFrame:
        t = df["ts"].astype("datetime64[us]").astype("int64")
        return pd.DataFrame({"user_id": df["user_id"],
                             "lo": t, "hi": t})

    spans = grouped_aggregate(
        ds.map_batches(span, batch_format="pandas"), ["user_id"],
        {"lo": ("lo", "min"), "hi": ("hi", "max")}).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    ids = spans["user_id"].to_numpy(np.int64)
    lo = spans["lo"].to_numpy(np.int64)
    hi = spans["hi"].to_numpy(np.int64) + 300_000_000
    ref = ray.put((ids, lo, hi))
    import ray.data as rd
    sds = rd.from_pandas(spans)

    def census(batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"code": pd.Series(dtype="int64"),
                              "n": pd.Series(dtype="int64")})
        if batch.empty:
            return empty
        ids_all, lo_all, hi_all = ray.get(ref)
        bids = batch["user_id"].to_numpy(np.int64)
        bp = np.searchsorted(ids_all, bids)
        rows = []
        for p in bp:
            mask = ids_all > ids_all[p]
            if not mask.any():
                continue
            codes = _allen_classify(
                np.full(mask.sum(), lo_all[p]),
                np.full(mask.sum(), hi_all[p]),
                lo_all[mask], hi_all[mask])
            cnt = np.bincount(codes, minlength=13)
            rows.append(cnt)
        if not rows:
            return empty
        tot = np.sum(rows, axis=0)
        return pd.DataFrame({"code": np.arange(13, dtype=np.int64),
                             "n": tot.astype(np.int64)})

    g = grouped_aggregate(
        sds.map_batches(census, batch_format="pandas",
                        batch_size=512),
        ["code"], {"n": ("n", "sum")}).to_pandas() \
        .sort_values("code").reset_index(drop=True)
    g["n"] = g["n"].astype("int64")
    g["relation"] = [_ALLEN_RELATIONS[int(c)] for c in g["code"]]
    g = g[g["n"] > 0]
    return g[["relation", "n"]].sort_values("relation") \
        .reset_index(drop=True)

def q_user_randomized_response(sf_dir: str):
    """Warner's randomized response (Warner '65) audit — the
    local-DP member completing the privacy family beside
    k-anonymity / l-diversity / t-closeness / Mondrian / DP counts:
    each user reports their conversion bit truthfully with
    probability p = 3/4, flipped otherwise (derandomized through
    md5('rr|user') % 4 < 3, so the noised telemetry is
    reproducible), and the collector debiases with Warner's
    estimator π̂ = (obs − (1−p))/(2p − 1) = (4·n_yes − N)/(2N) —
    which with integer counts is an EXACT integer ratio: the only
    float is that one division (plus the shipped absolute error vs
    the true rate, same construction). ε = ln(p/(1−p)) = ln 3
    local DP. One combiner pass to the user grid; O(1) driver
    arithmetic."""
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
    cv = users["conv"].to_numpy(np.int64)
    truth = np.array([
        int.from_bytes(hashlib.md5(f"rr|{u}".encode()).digest()[:8],
                       "big") % 4 < 3 for u in uid])
    report = np.where(truth, cv, 1 - cv)
    N = len(uid)
    n_yes = int(report.sum())
    true_cnt = int(cv.sum())
    pi_hat = float(4 * n_yes - N) / float(2 * N)
    true_rate = float(true_cnt) / float(N)
    return pd.DataFrame({
        "n_users": [np.int64(N)],
        "n_reported_yes": [np.int64(n_yes)],
        "n_true_yes": [np.int64(true_cnt)],
        "pi_hat": [round(pi_hat, 6)],
        "true_rate": [round(true_rate, 6)],
        "abs_err": [round(abs(pi_hat - true_rate), 6)]})

def q_user_cuckoo(sf_dir: str):
    """Cuckoo hashing placement audit (Pagh & Rodler '01): users
    insert in id order into two md5-hashed 256-slot tables with
    evict-and-re-place chains — the worst-case-O(1)-lookup layout
    audit completing the placement family beside the Karger ring
    and the jump hash ('does this key set fit two tables at this
    load with bounded displacement?'). Pure md5/integer arithmetic;
    the recursive-CTE oracle replays every placement and every kick
    bit-for-bit (see ``ops/layout.py:cuckoo_place``; per-shard actor
    deployment named there). One combiner pass to the distinct-user
    table; O(n + kicks) sequential replay on the user-bounded set."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.ops.layout import cuckoo_place
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id"])
    users = grouped_aggregate(ds, ["user_id"],
                              {"n": (None, "count")}).to_pandas()
    return cuckoo_place(users["user_id"].to_numpy(np.int64))

def q_user_calibration(sf_dir: str):
    """Reliability diagram with the Murphy ('73) Brier decomposition
    — the calibration audit an ML-ops pass runs on any probabilistic
    scorer: the 'model' is each user's historical purchase share,
    the label is high-value conversion (any purchase ≥ 150, the
    bayes_ab contract), and the output is the per-bin calibration
    table plus reliability/resolution contributions whose sums with
    uncertainty recompose the Brier score. Exactness: predictions
    quantize to integer per-mille pq = (n_p·1000)//n_e and bins to
    (n_p·10)//n_e — PURE integer arithmetic (no float-boundary
    binning hazard); per-bin n, Σpq, Σy and the Brier numerator
    Σ(pq − 1000y)² are exact int64; the only floats are the per-bin
    fixed-order expressions (two divisions, subtract, (n·d)·d).
    Dataflow: one combiner pass events → user grid, one combiner
    pass user grid → ≤10-bin grid — both distributed, nothing
    user-sized on the driver until the bin table."""
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
            "one": np.ones(len(df), dtype=np.int64),
            "n_p": isp.astype("int64"),
            "y": (isp & (df["value"] >= 150.0)).astype("int64")})

    users = grouped_aggregate(
        ds.map_batches(per_user, batch_format="pandas"), ["user_id"],
        {"n_e": ("one", "sum"), "n_p": ("n_p", "sum"),
         "y": ("y", "max")})

    def to_bins(df: pd.DataFrame) -> pd.DataFrame:
        n_e = df["n_e"].to_numpy(np.int64)
        n_p = df["n_p"].to_numpy(np.int64)
        yy = df["y"].to_numpy(np.int64)
        pq = (n_p * 1000) // n_e
        b = np.minimum((n_p * 10) // n_e, 9)
        d = pq - 1000 * yy
        return pd.DataFrame({"bin": b, "one": np.ones_like(b),
                             "pq": pq, "y": yy, "sq": d * d})

    g = grouped_aggregate(
        users.map_batches(to_bins, batch_format="pandas"), ["bin"],
        {"n": ("one", "sum"), "sum_pq": ("pq", "sum"),
         "sum_y": ("y", "sum"), "brier_num": ("sq", "sum")}) \
        .to_pandas().sort_values("bin").reset_index(drop=True)
    for c in ["bin", "n", "sum_pq", "sum_y", "brier_num"]:
        g[c] = g[c].astype("int64")
    n = g["n"].to_numpy(np.float64)
    mean_pred = g["sum_pq"].to_numpy(np.int64) / (1000.0 * n)
    rate = g["sum_y"].to_numpy(np.int64) / n
    base = float(g["sum_y"].sum()) / float(g["n"].sum())
    d_rel = mean_pred - rate
    d_res = rate - base
    g["mean_pred"] = np.round(mean_pred, 6)
    g["rate"] = np.round(rate, 6)
    g["rel_contrib"] = np.round((n * d_rel) * d_rel, 6)
    g["res_contrib"] = np.round((n * d_res) * d_res, 6)
    return g

def q_user_lis(sf_dir: str, *, oracle_levels: int = 30):
    """Longest strictly-increasing subsequence of each user's value
    sequence in (ts, id) order (patience sorting / Schensted '61 —
    the non-contiguous monotone-trend length beside the contiguous
    ``q_user_streaks``): the engagement-escalation audit. Users
    co-locate in ONE hash shuffle; inside each block the patience
    update is RANK-STEPPED across all of the block's users at once
    (the ``q_events_ewma`` convention): at rank r every user's
    insertion slot is the vectorized count of its tails < v (tails
    rows stay sorted by construction), so the loop is over max
    series length, not rows. Value comparisons are exact float64
    order tests — no arithmetic, no accumulation hazard. The oracle
    replays level-by-level: L_k = ends of strictly-increasing
    chains of length k (EXISTS-deduped, so rows per level stay
    n-bounded); lis_len = max populated level. Asserts the corpus
    max fits the oracle's unrolled depth."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts",
                                     "value"])

    def lis_block(block: pd.DataFrame) -> pd.DataFrame:
        if block.empty:
            return pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64"),
                                 "lis_len": pd.Series(dtype="int64")})
        b = block.sort_values(["user_id", "ts", "event_id"])
        v = b["value"].to_numpy(np.float64)
        uid = b["user_id"].to_numpy()
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        starts = np.flatnonzero(new_user)
        lens = np.diff(np.r_[starts, len(v)])
        rn = np.arange(len(v)) - np.repeat(starts, lens)
        U, L = len(starts), int(lens.max())
        tails = np.full((U, L), np.inf)
        urow = np.repeat(np.arange(U), lens)
        for r in range(L):
            idx = np.flatnonzero(rn == r)
            u = urow[idx]
            val = v[idx]
            pos = (tails[u] < val[:, None]).sum(axis=1)
            tails[u, pos] = val
        return pd.DataFrame({
            "user_id": uid[starts],
            "n": lens.astype("int64"),
            "lis_len": np.isfinite(tails).sum(axis=1)
            .astype("int64")})

    out = grouped_apply(ds, ["user_id"], lis_block).to_pandas()
    out["user_id"] = out["user_id"].astype("int64")
    out = out.sort_values("user_id").reset_index(drop=True)
    assert int(out["lis_len"].max()) <= oracle_levels, \
        "LIS exceeds oracle's unrolled depth"
    return out

def _lis_oracle_sql(levels: int = 30) -> str:
    """Level-unrolled chain replay of ``q_user_lis``: L_k holds the
    distinct (user, rank) positions ending a strictly-increasing
    chain of length k."""
    sql = """
        WITH seq AS MATERIALIZED (
            SELECT user_id, value AS v, row_number() OVER (
                PARTITION BY user_id ORDER BY ts, event_id) AS rn
            FROM events),
        l1 AS (SELECT user_id, rn FROM seq)"""
    for k in range(2, levels + 1):
        sql += f""",
        l{k} AS MATERIALIZED (
            SELECT DISTINCT b.user_id, b.rn
            FROM l{k - 1} p
            JOIN seq a ON a.user_id = p.user_id AND a.rn = p.rn
            JOIN seq b ON b.user_id = a.user_id
                      AND b.rn > a.rn AND b.v > a.v)"""
    lens = ["SELECT user_id, 1 AS k FROM l1"]
    lens += [f"SELECT user_id, {k} FROM l{k}"
             for k in range(2, levels + 1)]
    return sql + f""",
        allk AS ({' UNION ALL '.join(lens)}),
        n AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n
              FROM seq GROUP BY user_id)
        SELECT n.user_id, n.n,
               CAST(max(allk.k) AS BIGINT) AS lis_len
        FROM n JOIN allk ON allk.user_id = n.user_id
        GROUP BY n.user_id, n.n ORDER BY n.user_id"""

def q_user_interval_schedule(sf_dir: str):
    """Weighted interval scheduling DP (the Bellman-style classic,
    Kleinberg–Tardos ch. 6) over the heaviest user's event
    intervals: event at t with value v spans [t, t + cents·3.6 ms·
    1000) µs (cents = round(v·100) — spans proportional to value so
    the schedule genuinely conflicts), weight = integer cents.
    Intervals sort under the strict (end, start, id) key; p(i) =
    last interval with end ≤ start_i; opt(i) = max(opt(i−1),
    w_i + opt(p(i))) — all EXACT integers. Output is the full opt
    table (rank, start, end, w, p, opt), so the optimum and every
    DP decision are hash-checked with no backtrack ambiguity.

    Scale shape: the heaviest user comes from a combiner count
    (ties → smallest id); one streaming filtered pass extracts that
    user's rows; the user-bounded DP runs on the driver. The oracle
    carries the growing opt vector as a LIST column through a
    recursive CTE — one list_append per rank."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts",
                                     "value"])
    cnt = grouped_aggregate(ds, ["user_id"],
                            {"n": (None, "count")}).to_pandas()
    cnt = cnt.sort_values(["n", "user_id"],
                          ascending=[False, True])
    top = int(cnt["user_id"].iloc[0])
    ev = ds.filter(expr=f"user_id == {top}").to_pandas()
    ts = ev["ts"].astype("datetime64[us]").astype("int64") \
        .to_numpy(np.int64)
    cents = np.copysign(np.floor(np.abs(
        ev["value"].to_numpy(np.float64)) * 100.0 + 0.5),
        ev["value"].to_numpy(np.float64)).astype(np.int64)
    d = pd.DataFrame({"eid": ev["event_id"].to_numpy(np.int64),
                      "start": ts, "end": ts + cents * 3_600_000,
                      "w": cents})
    d = d.sort_values(["end", "start", "eid"], kind="mergesort") \
        .reset_index(drop=True)
    n = len(d)
    ends = d["end"].to_numpy(np.int64)
    starts = d["start"].to_numpy(np.int64)
    w = d["w"].to_numpy(np.int64)
    p = np.searchsorted(ends, starts, side="right")  # 0 = none
    opt = np.zeros(n + 1, dtype=np.int64)
    for i in range(1, n + 1):
        opt[i] = max(opt[i - 1], w[i - 1] + opt[p[i - 1]])
    return pd.DataFrame({
        "rank": np.arange(1, n + 1, dtype=np.int64),
        "start": starts, "end": ends, "w": w,
        "p": p.astype(np.int64), "opt": opt[1:]})

_INTERVAL_SCHEDULE_ORACLE_SQL = """
    WITH RECURSIVE topu AS (
        SELECT user_id FROM events GROUP BY user_id
        ORDER BY count(*) DESC, user_id ASC LIMIT 1),
    iv AS MATERIALIZED (
        SELECT epoch_us(ts) AS s,
               epoch_us(ts) + CAST(round(value * 100.0, 0)
                                   AS BIGINT) * 3600000 AS e,
               CAST(round(value * 100.0, 0) AS BIGINT) AS w,
               event_id AS eid
        FROM events WHERE user_id = (SELECT user_id FROM topu)),
    rk AS MATERIALIZED (
        SELECT s, e, w, row_number() OVER (
            ORDER BY e, s, eid) AS rank
        FROM iv),
    pp AS MATERIALIZED (
        SELECT rk.rank, rk.s, rk.e, rk.w,
               coalesce((SELECT max(o.rank) FROM rk o
                         WHERE o.e <= rk.s), 0) AS p
        FROM rk),
    dp AS (
        SELECT CAST(0 AS BIGINT) AS i, [CAST(0 AS BIGINT)] AS opts
        UNION ALL
        SELECT dp.i + 1,
               list_append(dp.opts, greatest(
                   dp.opts[CAST(dp.i + 1 AS INT)],
                   pp.w + dp.opts[CAST(pp.p + 1 AS INT)]))
        FROM dp JOIN pp ON pp.rank = dp.i + 1),
    fin AS (SELECT opts FROM dp
            WHERE i = (SELECT count(*) FROM pp))
    SELECT pp.rank, CAST(pp.s AS BIGINT) AS start,
           CAST(pp.e AS BIGINT) AS "end", pp.w,
           CAST(pp.p AS BIGINT) AS p,
           fin.opts[CAST(pp.rank + 1 AS INT)] AS opt
    FROM pp CROSS JOIN fin ORDER BY pp.rank"""

def q_user_nelson_aalen(sf_dir: str):
    """Nelson–Aalen cumulative hazard (Nelson '72 / Aalen '78) of
    the inter-purchase durations with right-censoring — the hazard
    companion of ``q_user_km_survival`` (same one co-located LAG
    pass, same censoring-at-horizon contract): H(t) = Σ_{tᵢ≤t}
    dᵢ/nᵢ accumulated in duration order (np.cumsum ↔ the oracle's
    window prefix sum — identical sequential float order), plus
    the Breslow survival exp(−H). Integer d/n counts from the
    combiner-reduced duration grid; 6-dp mirrored rounding."""
    import math

    import pyarrow.parquet as _pq

    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts",
                                     "event_type"])
    ts_col = _pq.read_table(f"{sf_dir}/events.parquet",
                            columns=["ts"])["ts"].to_pandas()
    horizon = int(ts_col.astype("datetime64[us]").astype("int64")
                  .max())

    def durations(block: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"dur": pd.Series(dtype="int64"),
                              "cens": pd.Series(dtype="int64"),
                              "n": pd.Series(dtype="int64")})
        b = block[block["event_type"] == "purchase"]
        if b.empty:
            return empty
        b = b.sort_values(["user_id", "ts", "event_id"])
        t = b["ts"].astype("datetime64[us]").astype("int64") \
            .to_numpy()
        uid = b["user_id"].to_numpy()
        same = np.r_[uid[1:] == uid[:-1], False]
        dur = np.where(same, np.r_[t[1:], 0] - t, horizon - t)
        cens = (~same).astype(np.int64)
        g = (pd.DataFrame({"dur": dur, "cens": cens, "n": 1})
             .groupby(["dur", "cens"], sort=False).sum()
             .reset_index())
        return g

    grid = grouped_aggregate(
        grouped_apply(ds, ["user_id"], durations),
        ["dur", "cens"], {"n": ("n", "sum")}).to_pandas()
    grid = grid.sort_values("dur").reset_index(drop=True)
    total = int(grid["n"].sum())
    by_t = grid.groupby("dur").agg(all_n=("n", "sum")).reset_index()
    dcounts = grid[grid["cens"] == 0].groupby("dur")["n"].sum()
    by_t["d"] = by_t["dur"].map(dcounts).fillna(0).astype(np.int64)
    before = np.r_[0, np.cumsum(
        by_t["all_n"].to_numpy(np.int64))[:-1]]
    by_t["n_risk"] = total - before
    ev = by_t[by_t["d"] > 0].reset_index(drop=True)
    terms = [int(r["d"]) / float(r["n_risk"])
             for _, r in ev.iterrows()]
    H = np.cumsum(terms) if terms else np.array([])
    return pd.DataFrame({
        "dur_us": ev["dur"].astype("int64"),
        "n_risk": ev["n_risk"].astype("int64"),
        "n_events": ev["d"].astype("int64"),
        "cum_hazard": [_round_half_away(h, 6) for h in H],
        "s_breslow": [_round_half_away(math.exp(-h), 6)
                      for h in H]})

_NELSON_AALEN_ORACLE_SQL = """
    WITH p AS MATERIALIZED (
        SELECT user_id, epoch_us(ts) AS t,
               lead(epoch_us(ts)) OVER (
                   PARTITION BY user_id
                   ORDER BY ts, event_id) AS nxt
        FROM events WHERE event_type = 'purchase'),
    hz AS (SELECT max(epoch_us(ts)) AS h FROM events),
    durs AS MATERIALIZED (
        SELECT CASE WHEN nxt IS NULL
                    THEN (SELECT h FROM hz) - t
                    ELSE nxt - t END AS dur,
               CASE WHEN nxt IS NULL THEN 1 ELSE 0 END AS cens
        FROM p),
    gridt AS MATERIALIZED (
        SELECT dur, count(*) AS all_n,
               count(*) FILTER (WHERE cens = 0) AS d
        FROM durs GROUP BY dur),
    risk AS MATERIALIZED (
        SELECT dur, d,
               (SELECT count(*) FROM durs) -
               coalesce(sum(all_n) OVER (ORDER BY dur
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS n_risk
        FROM gridt),
    ev AS MATERIALIZED (
        SELECT dur, d, n_risk,
               sum(d * 1.0 / n_risk) OVER (ORDER BY dur) AS h
        FROM risk WHERE d > 0)
    SELECT CAST(dur AS BIGINT) AS dur_us,
           CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d AS BIGINT) AS n_events,
           round(h, 6) AS cum_hazard,
           round(exp(-h), 6) AS s_breslow
    FROM ev ORDER BY dur_us"""

_JUMP_RESIZE_ORACLE_SQL = """
    WITH RECURSIVE users AS (
        SELECT DISTINCT user_id FROM events),
    seeds AS (
        SELECT user_id, s FROM users
        CROSS JOIN (SELECT unnest([32, 33]) AS s) t),
    r(user_id, s, key, b, j, step) AS (
        SELECT user_id, s, CAST(user_id AS HUGEINT),
               CAST(-1 AS BIGINT), CAST(0 AS BIGINT), 0
        FROM seeds
        UNION ALL
        SELECT user_id, s, nk, j,
               CAST(floor((j + 1) * (2147483648.0
                    / (CAST(nk // 8589934592 AS DOUBLE) + 1.0)))
                    AS BIGINT),
               step + 1
        FROM (
            SELECT user_id, s, j, step,
                   ((((key % 4294967296) * 666578662) % 4294967296)
                    * 4294967296 + key * 2276503805 + 1)
                   % 18446744073709551616 AS nk
            FROM r WHERE j < s) t),
    fin AS (
        SELECT user_id, s, b,
               row_number() OVER (PARTITION BY user_id, s
                                  ORDER BY step DESC) AS rr
        FROM r)
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(max(CASE WHEN s = 32 THEN b END) AS BIGINT)
               AS shard32,
           CAST(max(CASE WHEN s = 33 THEN b END) AS BIGINT)
               AS shard33,
           CAST(CASE WHEN max(CASE WHEN s = 32 THEN b END)
                       <> max(CASE WHEN s = 33 THEN b END)
                THEN 1 ELSE 0 END AS BIGINT) AS moved
    FROM fin WHERE rr = 1 GROUP BY user_id ORDER BY user_id"""

_WILSON_ORACLE_SQL = """
    WITH u AS (
        SELECT user_id,
               max(CASE WHEN event_type = 'purchase'
                         AND value >= 150.0 THEN 1 ELSE 0 END)
                   AS conv
        FROM events GROUP BY user_id),
    c AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(conv) AS BIGINT) AS s FROM u),
    f AS (
        SELECT n, s, CAST(s AS DOUBLE) / n AS p,
               1.0 + 1.959964 * 1.959964 / n AS denom
        FROM c),
    w AS (
        SELECT n, s, p,
               (p + 1.959964 * 1.959964 / (2.0 * n)) / denom
                   AS center,
               (1.959964 * sqrt(p * (1.0 - p) / n
                    + 1.959964 * 1.959964 / (4.0 * n * n))) / denom
                   AS half
        FROM f)
    SELECT n, s, round(p, 6) AS p_hat,
           round(center - half, 6) AS wilson_lo,
           round(center + half, 6) AS wilson_hi
    FROM w"""

_SECRETARY_ORACLE_SQL = """
    WITH seq AS (
        SELECT user_id, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn,
               count(*) OVER (PARTITION BY user_id) AS n,
               max(value) OVER (PARTITION BY user_id) AS vmax
        FROM events),
    cs AS (
        SELECT user_id, value, rn, n, vmax,
               (n * 367879) // 1000000 AS c
        FROM seq),
    pm AS (
        SELECT user_id,
               coalesce(max(CASE WHEN rn <= c THEN value END), -1.0)
                   AS prefmax
        FROM cs GROUP BY user_id),
    cand AS (
        SELECT cs.user_id, cs.value, cs.rn, cs.n, cs.vmax,
               row_number() OVER (PARTITION BY cs.user_id
                                  ORDER BY cs.rn) AS pick
        FROM cs JOIN pm USING (user_id)
        WHERE cs.rn > cs.c AND cs.value > pm.prefmax),
    accepted AS (
        SELECT s.user_id,
               coalesce(
                   (SELECT c2.value FROM cand c2
                    WHERE c2.user_id = s.user_id AND c2.pick = 1),
                   (SELECT c3.value FROM cs c3
                    WHERE c3.user_id = s.user_id AND c3.rn = c3.n))
                   AS acc,
               max(s.vmax) AS vmax
        FROM cs s GROUP BY s.user_id),
    agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n_users,
               CAST(sum(CASE WHEN acc = vmax THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_success
        FROM accepted)
    SELECT n_users, n_success,
           CASE WHEN n_users = 0 THEN -1.0
                ELSE round(CAST(n_success AS DOUBLE) / n_users, 6)
           END AS success_rate
    FROM agg"""

_CINDEX_ORACLE_SQL = """
    WITH hz AS (SELECT max(epoch_us(ts)) AS h FROM events),
    acts AS (SELECT user_id, count(*) AS risk
             FROM events GROUP BY user_id),
    p AS (
        SELECT user_id, epoch_us(ts) AS t,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events WHERE event_type = 'purchase'),
    u AS (
        SELECT a.user_id,
               coalesce(b.t - a.t, (SELECT h FROM hz) - a.t)
                   AS dur,
               CASE WHEN b.t IS NULL THEN 0 ELSE 1 END AS ev
        FROM (SELECT user_id, t FROM p WHERE rn = 1) a
        LEFT JOIN (SELECT user_id, t FROM p WHERE rn = 2) b
            USING (user_id)),
    j AS (SELECT u.user_id, u.dur, u.ev, acts.risk
          FROM u JOIN acts USING (user_id)),
    pairs AS (
        SELECT CASE WHEN a.risk > b.risk THEN 2
                    WHEN a.risk = b.risk THEN 1 ELSE 0 END AS c2
        FROM j a JOIN j b ON a.user_id <> b.user_id
        WHERE a.dur < b.dur AND a.ev = 1),
    agg AS (SELECT CAST(count(*) AS BIGINT) AS n_comp,
                   CAST(coalesce(sum(c2), 0) AS BIGINT) AS num2
            FROM pairs)
    SELECT n_comp, num2,
           CASE WHEN n_comp = 0 THEN -1.0
                ELSE round(CAST(num2 AS DOUBLE) / (2 * n_comp), 6)
           END AS c_index
    FROM agg"""

_ALLEN_ORACLE_SQL = """
    WITH u AS (
        SELECT user_id, min(epoch_us(ts)) AS lo,
               max(epoch_us(ts)) + 300000000 AS hi
        FROM events GROUP BY user_id),
    p AS (
        SELECT CASE
            WHEN a.hi <  b.lo THEN 'before'
            WHEN a.hi =  b.lo THEN 'meets'
            WHEN a.lo <  b.lo AND a.hi > b.lo AND a.hi < b.hi
                THEN 'overlaps'
            WHEN a.lo =  b.lo AND a.hi < b.hi THEN 'starts'
            WHEN a.lo >  b.lo AND a.hi < b.hi THEN 'during'
            WHEN a.lo >  b.lo AND a.lo < b.hi AND a.hi = b.hi
                THEN 'finishes'
            WHEN a.lo =  b.lo AND a.hi = b.hi THEN 'equals'
            WHEN a.lo >  b.hi THEN 'after'
            WHEN a.lo =  b.hi THEN 'met_by'
            WHEN a.lo >  b.lo AND a.lo < b.hi AND a.hi > b.hi
                THEN 'overlapped_by'
            WHEN a.lo =  b.lo AND a.hi > b.hi THEN 'started_by'
            WHEN a.lo <  b.lo AND a.hi > b.hi THEN 'contains'
            ELSE 'finished_by' END AS relation
        FROM u a JOIN u b ON a.user_id < b.user_id)
    SELECT relation, CAST(count(*) AS BIGINT) AS n
    FROM p GROUP BY relation ORDER BY relation"""

_RR_ORACLE_SQL = """
    WITH u AS (
        SELECT user_id,
               max(CASE WHEN event_type = 'purchase'
                         AND value >= 150.0 THEN 1 ELSE 0 END)
                   AS conv
        FROM events GROUP BY user_id),
    rr AS (
        SELECT conv,
               CASE WHEN CAST(CAST('0x' || substr(md5('rr|'
                         || CAST(user_id AS VARCHAR)), 1, 16)
                         AS UBIGINT) % 4 AS BIGINT) < 3
                    THEN conv ELSE 1 - conv END AS report
        FROM u),
    c AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(report) AS BIGINT) AS n_yes,
               CAST(sum(conv) AS BIGINT) AS n_true
        FROM rr)
    SELECT n AS n_users, n_yes AS n_reported_yes,
           n_true AS n_true_yes,
           round(CAST(4 * n_yes - n AS DOUBLE) / (2 * n), 6)
               AS pi_hat,
           round(CAST(n_true AS DOUBLE) / n, 6) AS true_rate,
           round(abs(CAST(4 * n_yes - n AS DOUBLE) / (2 * n)
                     - CAST(n_true AS DOUBLE) / n), 6) AS abs_err
    FROM c"""

_CUCKOO_ORACLE_SQL = """
WITH RECURSIVE users AS MATERIALIZED (
    SELECT row_number() OVER (ORDER BY user_id) AS i, user_id AS id,
        CAST(CAST('0x' || substr(md5('c1|' || CAST(user_id AS VARCHAR)),
             1, 16) AS UBIGINT) % 256 AS BIGINT) AS h1,
        256 + CAST(CAST('0x' || substr(md5('c2|' || CAST(user_id AS VARCHAR)),
             1, 16) AS UBIGINT) % 256 AS BIGINT) AS h2
    FROM (SELECT DISTINCT user_id FROM events)),
nu AS (SELECT CAST(count(*) AS BIGINT) AS n FROM users),
r(i, init, carry, ck, kicks, occ, done) AS (
    SELECT CAST(1 AS BIGINT),
           (SELECT id FROM users WHERE i = 1),
           (SELECT id FROM users WHERE i = 1),
           (SELECT h1 FROM users WHERE i = 1),
           CAST(0 AS BIGINT),
           CAST([] AS STRUCT(k BIGINT, id BIGINT)[]),
           CAST([] AS STRUCT(id BIGINT, kk BIGINT)[])
    UNION ALL
    SELECT CASE WHEN st.place OR st.fail THEN r.i + 1 ELSE r.i END,
           CASE WHEN st.place OR st.fail THEN nx.id ELSE r.init END,
           CASE WHEN st.place OR st.fail THEN nx.id ELSE st.old END,
           CASE WHEN st.place OR st.fail THEN nx.h1
                WHEN r.ck < 256
                THEN (SELECT h2 FROM users u WHERE u.id = st.old)
                ELSE (SELECT h1 FROM users u WHERE u.id = st.old)
           END,
           CASE WHEN st.place OR st.fail THEN 0
                ELSE r.kicks + 1 END,
           CASE WHEN st.place
                THEN r.occ || [struct_pack(k := r.ck, id := r.carry)]
                WHEN st.fail THEN r.occ
                ELSE list_transform(r.occ, x ->
                    CASE WHEN x.k = r.ck
                         THEN struct_pack(k := r.ck, id := r.carry)
                         ELSE x END)
           END,
           CASE WHEN st.place
                THEN r.done || [struct_pack(id := r.init,
                                            kk := r.kicks)]
                WHEN st.fail
                THEN r.done || [struct_pack(id := r.init,
                                            kk := CAST(-1 AS BIGINT))]
                ELSE r.done END
    FROM r,
    LATERAL (SELECT
        (SELECT u.x.id FROM (SELECT unnest(r.occ) AS x) u
         WHERE u.x.k = r.ck) AS old,
        (SELECT u.x.id FROM (SELECT unnest(r.occ) AS x) u
         WHERE u.x.k = r.ck) IS NULL AS place,
        ((SELECT u.x.id FROM (SELECT unnest(r.occ) AS x) u
          WHERE u.x.k = r.ck) IS NOT NULL AND r.kicks >= 32)
            AS fail) st,
    LATERAL (SELECT
        (SELECT id FROM users WHERE i = r.i + 1) AS id,
        (SELECT h1 FROM users WHERE i = r.i + 1) AS h1) nx
    WHERE r.carry IS NOT NULL),
fin AS (
    SELECT occ, done FROM r ORDER BY i DESC, len(done) DESC LIMIT 1)
SELECT u.id AS user_id,
       CAST(coalesce(o.x.k // 256, -1) AS BIGINT) AS tbl,
       CAST(coalesce(o.x.k % 256, -1) AS BIGINT) AS slot,
       CAST(d.x.kk AS BIGINT) AS chain_kicks
FROM users u
LEFT JOIN (SELECT unnest(occ) AS x FROM fin) o ON o.x.id = u.id
JOIN (SELECT unnest(done) AS x FROM fin) d ON d.x.id = u.id
ORDER BY user_id
"""

_CALIBRATION_ORACLE_SQL = """
    WITH u AS (
      SELECT user_id, count(*) AS n_e,
             sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                 END) AS n_p,
             max(CASE WHEN event_type = 'purchase'
                       AND value >= 150.0 THEN 1 ELSE 0 END) AS y
      FROM events GROUP BY user_id),
    f AS (
      SELECT CASE WHEN (n_p * 10) // n_e > 9 THEN 9
                  ELSE (n_p * 10) // n_e END AS bin,
             (n_p * 1000) // n_e AS pq, y
      FROM u),
    base AS (SELECT CAST(sum(y) AS DOUBLE) / count(*) AS b FROM f),
    g AS (
      SELECT bin, count(*) AS n, sum(pq) AS sum_pq,
             sum(y) AS sum_y,
             sum((pq - 1000 * y) * (pq - 1000 * y)) AS brier_num
      FROM f GROUP BY bin)
    SELECT CAST(bin AS BIGINT) AS bin, CAST(n AS BIGINT) AS n,
           CAST(sum_pq AS BIGINT) AS sum_pq,
           CAST(sum_y AS BIGINT) AS sum_y,
           CAST(brier_num AS BIGINT) AS brier_num,
           round(CAST(sum_pq AS DOUBLE) / (1000.0 * n), 6)
               AS mean_pred,
           round(CAST(sum_y AS DOUBLE) / n, 6) AS rate,
           round(n * (CAST(sum_pq AS DOUBLE) / (1000.0 * n)
                      - CAST(sum_y AS DOUBLE) / n)
                   * (CAST(sum_pq AS DOUBLE) / (1000.0 * n)
                      - CAST(sum_y AS DOUBLE) / n), 6)
               AS rel_contrib,
           round(n * (CAST(sum_y AS DOUBLE) / n
                      - (SELECT b FROM base))
                   * (CAST(sum_y AS DOUBLE) / n
                      - (SELECT b FROM base)), 6) AS res_contrib
    FROM g ORDER BY bin"""

QUERIES = {
    'q_user_als_step': q_user_als_step,
    'q_user_features': q_user_features,
    'q_user_seq_patterns': q_user_seq_patterns,
    'q_user_markov_backtest': q_user_markov_backtest,
    'q_user_ab_assignment': q_user_ab_assignment,
    'q_user_jump_resize': q_user_jump_resize,
    'q_user_calibration': q_user_calibration,
    'q_user_cuckoo': q_user_cuckoo,
    'q_user_randomized_response': q_user_randomized_response,
    'q_user_allen_census': q_user_allen_census,
    'q_user_cindex': q_user_cindex,
    'q_user_secretary': q_user_secretary,
    'q_user_wilson_ci': q_user_wilson_ci,
    'q_user_km_survival': q_user_km_survival,
    'q_user_logrank': q_user_logrank,
    'q_user_cuped': q_user_cuped,
    'q_user_lis': q_user_lis,
    'q_user_interval_schedule': q_user_interval_schedule,
    'q_user_nelson_aalen': q_user_nelson_aalen,
    'q_user_activity_outer': q_user_activity_outer,
    'q_user_presence': R.q_user_presence,
    'q_user_dbscan': q_user_dbscan,
    'q_user_event_type_set': q_user_event_type_set,
    'q_user_event_paths': q_user_event_paths,
    'q_user_coverage': q_user_coverage,
    'q_user_twap': q_user_twap,
    'q_user_streaks': q_user_streaks,
    'q_user_entry_exit': q_user_entry_exit,
}

ORACLES = {
    'q_user_markov_backtest': """
            WITH tr AS (
                SELECT event_type AS prev,
                       lead(event_type) OVER (
                           PARTITION BY user_id
                           ORDER BY ts, event_id) AS nxt
                FROM events),
            c AS (SELECT prev, nxt, count(*) AS n
                  FROM tr WHERE nxt IS NOT NULL GROUP BY prev, nxt),
            p AS (
                SELECT prev, nxt AS predicted, n AS n_correct,
                       row_number() OVER (PARTITION BY prev
                                          ORDER BY n DESC, nxt ASC)
                           AS rk,
                       sum(n) OVER (PARTITION BY prev)
                           AS n_transitions
                FROM c)
            SELECT prev, CAST(n_transitions AS BIGINT)
                       AS n_transitions,
                   predicted, CAST(n_correct AS BIGINT) AS n_correct,
                   round(CAST(n_correct AS DOUBLE) / n_transitions, 6)
                       AS accuracy
            FROM p WHERE rk = 1 ORDER BY prev
        """,
    'q_user_seq_patterns': """
            WITH mt AS (
                SELECT user_id, event_type,
                       min(ts) AS mn, max(ts) AS mx
                FROM events GROUP BY user_id, event_type),
            tot AS (SELECT count(DISTINCT user_id) AS nu FROM events)
            SELECT a.event_type AS ant, b.event_type AS con,
                   count(*) AS n_users,
                   round(CAST(count(*) AS DOUBLE)
                         / (SELECT nu FROM tot), 6) AS support
            FROM mt a JOIN mt b
                 ON a.user_id = b.user_id AND a.mn < b.mx
            GROUP BY a.event_type, b.event_type
            ORDER BY ant, con
        """,
    'q_user_features': """
            WITH d AS (
                SELECT user_id, event_type, CAST(value AS DOUBLE) AS v,
                       CAST(epoch_us(ts) AS BIGINT) // 86400000000
                           AS day
                FROM events)
            SELECT user_id,
                   CAST(count(*) AS BIGINT) AS n_events,
                   round(sum(v) / count(*), 6) AS mean_value,
                   CAST(count(DISTINCT event_type) AS BIGINT)
                       AS n_types,
                   CAST(count(DISTINCT day) AS BIGINT) AS active_days,
                   CAST(max(day) - min(day) AS BIGINT) AS span_days
            FROM d GROUP BY user_id ORDER BY user_id
        """,
    'q_user_als_step': """
            WITH c AS (
                SELECT user_id, event_type, count(*) AS c
                FROM events GROUP BY user_id, event_type),
            f AS (
                SELECT DISTINCT event_type,
                       (CAST('0x' || substr(md5(event_type || '|1'),
                                            1, 8) AS UBIGINT)
                        % 1000000) / 1000000.0 - 0.5 AS f1,
                       (CAST('0x' || substr(md5(event_type || '|2'),
                                            1, 8) AS UBIGINT)
                        % 1000000) / 1000000.0 - 0.5 AS f2
                FROM events),
            p AS (
                SELECT user_id,
                       sum(f1 * f1) AS a11s, sum(f1 * f2) AS a12,
                       sum(f2 * f2) AS a22s,
                       sum(c * f1) AS b1, sum(c * f2) AS b2
                FROM c JOIN f USING (event_type)
                GROUP BY user_id)
            SELECT user_id,
                   round(((a22s + 0.1) * b1 - a12 * b2)
                         / ((a11s + 0.1) * (a22s + 0.1)
                            - a12 * a12), 6) AS x1,
                   round(((a11s + 0.1) * b2 - a12 * b1)
                         / ((a11s + 0.1) * (a22s + 0.1)
                            - a12 * a12), 6) AS x2
            FROM p ORDER BY user_id
        """,
    'q_user_cuped': """
            WITH b AS (
                SELECT min(CAST(epoch_us(ts) AS BIGINT)) AS mn,
                       max(CAST(epoch_us(ts) AS BIGINT)) AS mx
                FROM events),
            per AS (
                SELECT user_id,
                       CASE WHEN CAST(epoch_us(ts) AS BIGINT)
                                 > (SELECT (mn + mx) // 2 FROM b)
                            THEN 1 ELSE 0 END AS period,
                       sum(CAST(value AS DOUBLE)) AS s,
                       count(*) AS n
                FROM events GROUP BY 1, 2),
            w AS (
                SELECT p0.user_id, p0.s / p0.n AS x, p1.s / p1.n AS y
                FROM per p0 JOIN per p1 ON p0.user_id = p1.user_id
                WHERE p0.period = 0 AND p1.period = 1),
            mm AS (SELECT avg(x) AS mx, avg(y) AS my FROM w),
            th AS (
                SELECT sum((x - mm.mx) * (y - mm.my))
                       / sum((x - mm.mx) * (x - mm.mx)) AS theta
                FROM w, mm),
            adj AS (
                SELECT user_id % 2 AS arm, y,
                       y - (SELECT theta FROM th)
                           * (x - (SELECT mx FROM mm)) AS yadj
                FROM w),
            am AS (
                SELECT arm, count(*) AS nu, avg(y) AS mya,
                       avg(yadj) AS myj
                FROM adj GROUP BY arm),
            v AS (
                SELECT adj.arm,
                       sum((adj.y - am.mya) * (adj.y - am.mya))
                           / max(am.nu) AS va,
                       sum((adj.yadj - am.myj) * (adj.yadj - am.myj))
                           / max(am.nu) AS vj
                FROM adj JOIN am ON am.arm = adj.arm
                GROUP BY adj.arm)
            SELECT am.arm, CAST(am.nu AS BIGINT) AS n_users,
                   round(am.mya, 6) AS mean_y,
                   round(am.myj, 6) AS mean_y_adj,
                   round(v.va, 6) AS var_y,
                   round(v.vj, 6) AS var_y_adj,
                   round((SELECT theta FROM th), 6) AS theta,
                   round(1.0 - v.vj / v.va, 6) AS var_reduction
            FROM am JOIN v USING (arm) ORDER BY am.arm
        """,
    'q_user_logrank': """
            WITH pp AS (
                SELECT user_id, event_id, user_id % 2 AS grp,
                       CAST(epoch_us(ts) AS BIGINT) AS t
                FROM events WHERE event_type = 'purchase'),
            h AS (SELECT max(CAST(epoch_us(ts) AS BIGINT)) AS horizon
                  FROM events),
            d AS (
                SELECT grp,
                       CASE WHEN lead(t) OVER w IS NULL
                            THEN (SELECT horizon FROM h) - t
                            ELSE lead(t) OVER w - t END AS dur,
                       CASE WHEN lead(t) OVER w IS NULL
                            THEN 1 ELSE 0 END AS cens
                FROM pp
                WINDOW w AS (PARTITION BY user_id
                             ORDER BY t, event_id)),
            grid AS (
                SELECT dur, count(*) AS all_n, sum(1 - cens) AS dd,
                       sum(CASE WHEN cens = 0 AND grp = 1
                                THEN 1 ELSE 0 END) AS dd1,
                       sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS a1
                FROM d GROUP BY dur),
            tot AS (SELECT sum(all_n) AS total, sum(a1) AS total1
                    FROM grid),
            r AS (
                SELECT dur, dd, dd1,
                       (SELECT total FROM tot)
                       - coalesce(sum(all_n) OVER (
                             ORDER BY dur
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING), 0) AS n,
                       (SELECT total1 FROM tot)
                       - coalesce(sum(a1) OVER (
                             ORDER BY dur
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING), 0) AS n1
                FROM grid),
            terms AS (
                SELECT dd, dd1,
                       CAST(dd1 AS DOUBLE)
                       - CAST(dd AS DOUBLE) * n1 / n AS om,
                       CASE WHEN n > 1
                            THEN CAST(dd AS DOUBLE)
                                 * (CAST(n1 AS DOUBLE) / n)
                                 * (1.0 - CAST(n1 AS DOUBLE) / n)
                                 * (n - dd) / (n - 1.0)
                            ELSE 0.0 END AS v
                FROM r WHERE dd > 0)
            SELECT CAST(sum(dd1) AS BIGINT) AS n_events_1,
                   CAST(sum(dd - dd1) AS BIGINT) AS n_events_0,
                   round(sum(om), 6) AS obs_minus_exp,
                   round(sum(v), 6) AS variance,
                   round(sum(om) * sum(om) / sum(v), 6) AS chi2
            FROM terms
        """,
    'q_user_km_survival': """
            WITH pp AS (
                SELECT user_id, event_id,
                       CAST(epoch_us(ts) AS BIGINT) AS t
                FROM events WHERE event_type = 'purchase'),
            h AS (SELECT max(CAST(epoch_us(ts) AS BIGINT)) AS horizon
                  FROM events),
            d AS (
                SELECT CASE WHEN lead(t) OVER w IS NULL
                            THEN (SELECT horizon FROM h) - t
                            ELSE lead(t) OVER w - t END AS dur,
                       CASE WHEN lead(t) OVER w IS NULL
                            THEN 1 ELSE 0 END AS cens
                FROM pp
                WINDOW w AS (PARTITION BY user_id
                             ORDER BY t, event_id)),
            grid AS (
                SELECT dur, count(*) AS all_n, sum(1 - cens) AS dd
                FROM d GROUP BY dur),
            tot AS (SELECT sum(all_n) AS total FROM grid),
            r AS (
                SELECT dur, dd,
                       (SELECT total FROM tot)
                       - coalesce(sum(all_n) OVER (
                             ORDER BY dur
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING), 0) AS n_risk
                FROM grid),
            e AS (
                SELECT dur, dd, n_risk,
                       sum(CASE WHEN dd = n_risk THEN 0.0
                                ELSE ln(1.0 - CAST(dd AS DOUBLE)
                                        / n_risk) END)
                           OVER (ORDER BY dur) AS ls
                FROM r WHERE dd > 0)
            SELECT dur AS dur_us, CAST(n_risk AS BIGINT) AS n_risk,
                   CAST(dd AS BIGINT) AS n_events,
                   CASE WHEN dd = n_risk THEN 0.0
                        ELSE round(exp(ls), 6) END AS survival
            FROM e ORDER BY dur_us
        """,
    'q_user_ab_assignment': """
            WITH u AS (
                SELECT user_id, count(*) AS n_events
                FROM events GROUP BY user_id),
            a AS (
                SELECT user_id, n_events,
                       CAST(CAST('0x' || substr(md5('ab|'
                           || CAST(user_id AS VARCHAR)), 1, 16)
                           AS UBIGINT) % 2 AS BIGINT) AS arm
                FROM u),
            g AS (
                SELECT arm, count(*) AS n_users,
                       sum(n_events) AS n_events
                FROM a GROUP BY arm),
            s AS (
                SELECT (max(CASE WHEN arm = 0 THEN n_users END)
                        - max(CASE WHEN arm = 1 THEN n_users END))
                       AS d,
                       sum(n_users) AS t
                FROM g)
            SELECT g.arm, CAST(g.n_users AS BIGINT) AS n_users,
                   CAST(g.n_events AS BIGINT) AS n_events,
                   round(CAST(s.d AS DOUBLE) * s.d / s.t, 6)
                       AS srm_chi2,
                   CAST(CASE WHEN CAST(s.d AS DOUBLE) * s.d / s.t
                                  > 3.841459
                             THEN 1 ELSE 0 END AS BIGINT) AS srm_flag
            FROM g, s ORDER BY g.arm
        """,
    'q_user_activity_outer': """
            WITH o AS (SELECT o_custkey AS user_id, count(*) AS n_orders,
                              round(sum(o_totalprice), 2) AS total_spent
                       FROM orders GROUP BY o_custkey),
            e AS (SELECT user_id, count(*) AS n_events,
                         round(sum(value), 2) AS sum_value
                  FROM events GROUP BY user_id)
            SELECT COALESCE(o.user_id, e.user_id) AS user_id,
                   COALESCE(o.n_orders, 0) AS n_orders,
                   o.total_spent,
                   COALESCE(e.n_events, 0) AS n_events,
                   e.sum_value
            FROM o FULL OUTER JOIN e ON o.user_id = e.user_id
            ORDER BY user_id
        """,
    'q_user_dbscan': """
            WITH RECURSIVE pts AS MATERIALIZED (
                SELECT user_id, CAST(count(*) AS BIGINT) AS x,
                       CAST(sum(CAST(round(value * 100) AS BIGINT))
                            // 10000 AS BIGINT) AS y
                FROM events GROUP BY user_id),
            pairs AS MATERIALIZED (
                SELECT a.user_id AS ua, b.user_id AS ub
                FROM pts a JOIN pts b ON a.user_id < b.user_id
                  AND (a.x - b.x) * (a.x - b.x)
                      + (a.y - b.y) * (a.y - b.y) <= 4),
            cnt AS (SELECT u, count(*) + 1 AS n FROM (
                        SELECT ua AS u FROM pairs
                        UNION ALL SELECT ub FROM pairs) GROUP BY u),
            core AS MATERIALIZED (
                SELECT p.user_id FROM pts p
                LEFT JOIN cnt ON cnt.u = p.user_id
                WHERE coalesce(cnt.n, 1) >= 3),
            ce AS MATERIALIZED (
                SELECT ua, ub FROM pairs
                WHERE ua IN (SELECT user_id FROM core)
                  AND ub IN (SELECT user_id FROM core)),
            sym AS MATERIALIZED (
                SELECT ua AS u, ub AS v FROM ce
                UNION ALL SELECT ub, ua FROM ce),
            reach AS (
                SELECT user_id AS a, user_id AS b FROM core
                UNION
                SELECT reach.a, sym.v
                FROM reach JOIN sym ON sym.u = reach.b),
            comp AS MATERIALIZED (
                SELECT a AS user_id, min(b) AS comp
                FROM reach GROUP BY a),
            bj AS (
                SELECT x.u AS user_id, min(comp.comp) AS comp FROM (
                    SELECT ua AS u, ub AS c FROM pairs
                    WHERE ub IN (SELECT user_id FROM core)
                      AND ua NOT IN (SELECT user_id FROM core)
                    UNION ALL
                    SELECT ub, ua FROM pairs
                    WHERE ua IN (SELECT user_id FROM core)
                      AND ub NOT IN (SELECT user_id FROM core)) x
                JOIN comp ON comp.user_id = x.c GROUP BY x.u)
            SELECT p.user_id,
                   CASE WHEN comp.comp IS NOT NULL THEN 'core'
                        WHEN bj.comp IS NOT NULL THEN 'border'
                        ELSE 'noise' END AS role,
                   CAST(coalesce(comp.comp, bj.comp, -1) AS BIGINT)
                       AS cluster
            FROM pts p
            LEFT JOIN comp ON comp.user_id = p.user_id
            LEFT JOIN bj ON bj.user_id = p.user_id
            ORDER BY p.user_id
        """,
    'q_user_presence': """
            WITH eu AS (SELECT DISTINCT user_id FROM events),
                 ou AS (SELECT DISTINCT o_custkey AS user_id FROM orders)
            SELECT user_id, 'both' AS tag
            FROM (SELECT user_id FROM eu INTERSECT SELECT user_id FROM ou)
            UNION ALL
            SELECT user_id, 'events_only'
            FROM (SELECT user_id FROM eu EXCEPT SELECT user_id FROM ou)
            UNION ALL
            SELECT user_id, 'orders_only'
            FROM (SELECT user_id FROM ou EXCEPT SELECT user_id FROM eu)
            ORDER BY user_id, tag
        """,
    'q_user_streaks': """
            WITH d AS (SELECT DISTINCT user_id,
                              CAST(ts AS DATE) AS day FROM events),
            r AS (SELECT user_id, day,
                         row_number() OVER (PARTITION BY user_id
                                            ORDER BY day) AS rn
                  FROM d),
            g AS (SELECT user_id,
                         day - CAST(rn AS INTEGER) AS grp,
                         count(*) AS len
                  FROM r GROUP BY user_id, day - CAST(rn AS INTEGER))
            SELECT user_id, CAST(max(len) AS BIGINT) AS max_streak,
                   CAST(sum(len) AS BIGINT) AS n_active_days
            FROM g GROUP BY user_id ORDER BY user_id
        """,
    'q_user_entry_exit': """
            WITH r AS (
                SELECT user_id, event_type, value,
                       row_number() OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS rn_f,
                       row_number() OVER (PARTITION BY user_id
                           ORDER BY ts DESC, event_id DESC) AS rn_l
                FROM events)
            SELECT f.user_id,
                   f.event_type AS first_type, f.value AS first_value,
                   l.event_type AS last_type, l.value AS last_value
            FROM r f JOIN r l ON f.user_id = l.user_id
            WHERE f.rn_f = 1 AND l.rn_l = 1
            ORDER BY f.user_id
        """,
    'q_user_event_paths': """
            SELECT user_id,
                   string_agg(event_type, '>' ORDER BY ts, event_id)
                       AS path
            FROM events GROUP BY user_id ORDER BY user_id
        """,
    'q_user_coverage': """
            WITH iv AS (SELECT user_id, ts AS s,
                               ts + INTERVAL 300 SECOND AS e
                        FROM events),
            x AS (SELECT user_id, s, e,
                         max(e) OVER (PARTITION BY user_id ORDER BY s, e
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING) AS pmax
                  FROM iv),
            y AS (SELECT *, CASE WHEN pmax IS NULL OR s > pmax
                                 THEN 1 ELSE 0 END AS opens
                  FROM x),
            z AS (SELECT *, sum(opens) OVER (PARTITION BY user_id
                                             ORDER BY s, e
                                             ROWS UNBOUNDED PRECEDING)
                            AS isl
                  FROM y),
            i AS (SELECT user_id, isl,
                         date_diff('microsecond', min(s), max(e))
                             // 1000000 AS cov
                  FROM z GROUP BY user_id, isl)
            SELECT user_id, CAST(count(*) AS BIGINT) AS n_islands,
                   CAST(sum(cov) AS BIGINT) AS covered_sec
            FROM i GROUP BY user_id ORDER BY user_id
        """,
    'q_user_twap': """
            WITH x AS (SELECT user_id, value,
                              CAST(date_diff('microsecond', ts,
                                   lead(ts) OVER (PARTITION BY user_id
                                                  ORDER BY ts, event_id))
                                   AS DOUBLE) AS dt
                       FROM events)
            SELECT user_id,
                   round(sum(value * dt) / sum(dt), 6) AS twap
            FROM x WHERE dt IS NOT NULL
            GROUP BY user_id HAVING sum(dt) > 0
            ORDER BY user_id
        """,
    'q_user_event_type_set': """
            SELECT user_id,
                   string_agg(DISTINCT event_type, ','
                              ORDER BY event_type) AS types
            FROM events WHERE ts < TIMESTAMP '2024-01-03'
            GROUP BY user_id ORDER BY user_id
        """,
}
ORACLE_REGISTRY.update(ORACLES)
ORACLES['q_user_lis'] = ORACLE_REGISTRY['q_user_lis'] = _lis_oracle_sql(levels=30)
ORACLES['q_user_interval_schedule'] = ORACLE_REGISTRY['q_user_interval_schedule'] = _INTERVAL_SCHEDULE_ORACLE_SQL
ORACLES['q_user_jump_resize'] = ORACLE_REGISTRY['q_user_jump_resize'] = _JUMP_RESIZE_ORACLE_SQL
ORACLES['q_user_calibration'] = ORACLE_REGISTRY['q_user_calibration'] = _CALIBRATION_ORACLE_SQL
ORACLES['q_user_cuckoo'] = ORACLE_REGISTRY['q_user_cuckoo'] = _CUCKOO_ORACLE_SQL
ORACLES['q_user_randomized_response'] = ORACLE_REGISTRY['q_user_randomized_response'] = _RR_ORACLE_SQL
ORACLES['q_user_allen_census'] = ORACLE_REGISTRY['q_user_allen_census'] = _ALLEN_ORACLE_SQL
ORACLES['q_user_cindex'] = ORACLE_REGISTRY['q_user_cindex'] = _CINDEX_ORACLE_SQL
ORACLES['q_user_secretary'] = ORACLE_REGISTRY['q_user_secretary'] = _SECRETARY_ORACLE_SQL
ORACLES['q_user_wilson_ci'] = ORACLE_REGISTRY['q_user_wilson_ci'] = _WILSON_ORACLE_SQL
ORACLES['q_user_nelson_aalen'] = ORACLE_REGISTRY['q_user_nelson_aalen'] = _NELSON_AALEN_ORACLE_SQL
