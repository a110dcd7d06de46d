"""Split of the query registry: ``events_a`` part (mechanically derived from the original queries.py by scripts/split_queries.py; unit order and source text preserved)."""

from __future__ import annotations
import re
import numpy as np
import pandas as pd
from jerex_ray.config import PipelineConfig
from jerex_ray.runtime import configure_data_context
from jerex_ray import relational as R
from jerex_ray.pipelines.queries._shared import (ORACLE_REGISTRY,
                                                 _round_half_away)

def q_events_welch_ttest(sf_dir: str):
    """Welch's unequal-variance t statistic of event value, each type
    vs the REST of the stream — the A/B-test primitive. One combiner
    pass reduces the corpus to per-type (n, Σv, Σv²); the complement's
    moments are total-minus-type, so only #types rows reach the
    driver and no second scan happens. Oracled by the identical
    closed form in SQL (round-6 absorbs summation-order float dust)."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_type", "value"])

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value"].to_numpy(np.float64)
        g = df.groupby("event_type", sort=False)
        return pd.DataFrame({
            "event_type": list(g.groups),
            "n": g.size().to_numpy(np.int64),
            "s": g["value"].sum().to_numpy(np.float64),
            "ss": [float((v[ix] ** 2).sum())
                   for ix in (g.indices[k] for k in g.groups)]})

    st = grouped_aggregate(ds.map_batches(moments, batch_format="pandas"),
                           ["event_type"],
                           {"n": ("n", "sum"), "s": ("s", "sum"),
                            "ss": ("ss", "sum")}).to_pandas()
    tn, ts_, tss = st["n"].sum(), st["s"].sum(), st["ss"].sum()
    n1 = st["n"].to_numpy(np.float64)
    s1 = st["s"].to_numpy(np.float64)
    ss1 = st["ss"].to_numpy(np.float64)
    n2, s2, ss2 = tn - n1, ts_ - s1, tss - ss1
    v1 = (ss1 - s1 * s1 / n1) / (n1 - 1)
    v2 = (ss2 - s2 * s2 / n2) / (n2 - 1)
    t = (s1 / n1 - s2 / n2) / np.sqrt(v1 / n1 + v2 / n2)
    out = pd.DataFrame({"event_type": st["event_type"],
                        "n": st["n"].astype("int64"),
                        "t_stat": np.round(t, 6)})
    return out.sort_values("event_type").reset_index(drop=True)

def q_events_hll_users(sf_dir: str):
    """HyperLogLog approximate COUNT(DISTINCT user_id): per-batch
    register partials → tree-reduce max-merge → estimate
    (``ops/sketch.hll_distinct``). ORACLE CAVEAT: parity holds in the
    linear-counting regime (distinct ≲ 2.5·2^p = 10240 at p=12),
    where the estimate depends only on WHICH md5-derived registers
    are hit — which the SQL recomputes exactly. A future fixture with
    ≳10k distinct users would leave that regime and the oracle would
    need the full harmonic-mean estimator; check the regime before
    debugging a mismatch as a dataflow bug."""
    from jerex_ray.ops.sketch import hll_distinct
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id"])
    return hll_distinct(ds, column="user_id", p=12)

def q_events_hll_by_type(sf_dir: str):
    """Grouped HLL: approximate distinct users PER event type from the
    same md5-derived registers (``ops/sketch.hll_distinct_by`` —
    register rows through the combiner, per-group estimate co-located).
    Same linear-counting oracle-parity regime as q_events_hll_users."""
    from jerex_ray.ops.sketch import hll_distinct_by
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_type", "user_id"])
    out = hll_distinct_by(ds, column="user_id", group="event_type", p=12)
    out = out.rename(columns={"g": "event_type"})
    out["registers_set"] = out["registers_set"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)

def q_events_props_agg(sf_dir: str):
    """Semi-structured ETL: extract the integer ``k`` field out of the
    JSON ``props`` column with ONE ``pyarrow.compute.extract_regex``
    kernel per batch (``ops/jsonx.py`` — no per-row ``json.loads``),
    then the combiner group-aggregate per event type. Oracled against
    DuckDB ``json_extract_string`` end to end."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.ops.jsonx import extract_json_int
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_type", "props"])
    ds = ds.map_batches(
        lambda t: extract_json_int(t, json_col="props", key="k",
                                   out="k_val"),
        batch_format="pyarrow")
    out = grouped_aggregate(
        ds, ["event_type"],
        {"n": (None, "count"), "sum_k": ("k_val", "sum"),
         "min_k": ("k_val", "min"), "max_k": ("k_val", "max")}
    ).to_pandas()
    for c in ("n", "sum_k", "min_k", "max_k"):
        out[c] = out[c].astype("int64")
    out["avg_k"] = (out["sum_k"] / out["n"]).round(6)
    return out.sort_values("event_type").reset_index(drop=True)

def q_events_value_quantiles(sf_dir: str):
    """Exact type-7 quantiles via three-pass pivot-grid selection (no
    sort shuffle; see ``ops/quantiles.py``) — oracled against DuckDB
    ``quantile_cont``."""
    from jerex_ray.ops.quantiles import distributed_quantiles
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["value"])
    qs = [0.25, 0.5, 0.75, 0.99]
    vals = distributed_quantiles(ds, "value", qs)
    return pd.DataFrame([{f"q{int(q * 100)}": round(v, 6)
                          for q, v in zip(qs, vals)}])

def q_events_quantiles_by_type(sf_dir: str):
    """Exact per-group type-7 quantiles — every group shares the same
    three shuffle-free passes (``ops/quantiles.grouped_quantiles``)."""
    from jerex_ray.ops.quantiles import grouped_quantiles
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_type", "value"])
    out = grouped_quantiles(ds, "event_type", "value", [0.25, 0.5, 0.75])
    out["value"] = out["value"].round(6)
    return out.sort_values(["event_type", "q"]).reset_index(drop=True)

def q_events_global_rank(sf_dir: str):
    """Global ORDER BY row number over the whole table without a
    single-place sort (``relational.global_rank``): exact-quantile
    range buckets → bucket offsets → co-located in-bucket sort."""
    from jerex_ray.relational import global_rank
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "value"])
    out = global_rank(ds, value_col="value", id_col="event_id") \
        .to_pandas()
    out = out[["event_id", "rnk"]]
    out["event_id"] = out["event_id"].astype("int64")
    out["rnk"] = out["rnk"].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)

def q_events_expectations(sf_dir: str):
    """Data-quality expectations (``ops/validate.column_expectations``):
    per-column null counts, min/max and range-violation counts in one
    combiner pass — the pre-ingest guardrail."""
    from jerex_ray.ops.validate import column_expectations
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id", "value"])
    out = column_expectations(ds, {"value": (0.0, 50.0),
                                   "user_id": (0, None)})
    out["vmin"] = out["vmin"].round(6)
    out["vmax"] = out["vmax"].round(6)
    return out.sort_values("column").reset_index(drop=True)

def q_events_time_since_prev(sf_dir: str):
    """LAG window function: per event, whole seconds since the same
    user's previous event (NULL for each user's first) —
    ``ops/windows.lag_delta``: hash co-location by user, one in-block
    sort + vectorized diff."""
    from jerex_ray.ops.windows import lag_delta
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts"])
    out = lag_delta(ds, key="user_id", ts_col="ts",
                    id_col="event_id").to_pandas()
    out["event_id"] = out["event_id"].astype("int64")
    out["user_id"] = out["user_id"].astype("int64")
    out["delta_s"] = out["delta_s"].astype("float64")
    return out[["event_id", "user_id", "delta_s"]] \
        .sort_values("event_id").reset_index(drop=True)

def q_events_type_pivot(sf_dir: str):
    """Pivot (conditional aggregation): one row per user with a count
    column per event type. The per-(user, type) counts reduce through
    the combiner; the pivot itself is a vectorized per-block reshape
    over co-located users (``grouped_apply``) — never a driver-side
    table."""
    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    types = ["click", "error", "purchase", "signup", "view"]
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type"])
    counts = grouped_aggregate(ds, ["user_id", "event_type"],
                               {"n": (None, "count")})

    def pivot_block(df: pd.DataFrame) -> pd.DataFrame:
        wide = df.pivot_table(index="user_id", columns="event_type",
                              values="n", aggfunc="sum", fill_value=0)
        wide = wide.reindex(columns=types, fill_value=0).reset_index()
        wide.columns = ["user_id"] + [f"n_{t}" for t in types]
        return wide.astype("int64")

    out = grouped_apply(counts, ["user_id"], pivot_block).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)

def q_events_value_buckets(sf_dir: str):
    """Per-group quartile-bucket assignment (the scale-safe NTILE
    analogue: value-based boundaries from one grouped-quantiles pass,
    broadcast, one streaming searchsorted —
    ``ops/quantiles.grouped_quantile_buckets``)."""
    from jerex_ray.ops.quantiles import grouped_quantile_buckets
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "event_type", "value"])
    out = grouped_quantile_buckets(ds, "event_type", "value").to_pandas()
    out = out[["event_id", "event_type", "bucket"]]
    out["event_id"] = out["event_id"].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)

def q_events_sliding(sf_dir: str):
    from jerex_ray.ops.windows import sliding_window
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_type", "ts"])
    out = sliding_window(ds, keys=["event_type"], ts_col="ts",
                         size="2h", slide="1h",
                         specs={"n_events": (None, "count")}).to_pandas()
    out["n_events"] = out["n_events"].astype("int64")
    return out.sort_values(["event_type", "window_start"]) \
        .reset_index(drop=True)

def q_events_sessions(sf_dir: str):
    from jerex_ray.ops.windows import session_windows
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts"])
    out = session_windows(ds, key="user_id", ts_col="ts",
                          gap="30min").to_pandas()
    return out.sort_values(["user_id", "session_start"]) \
        .reset_index(drop=True)

def q_events_outliers(sf_dir: str):
    """Per-type z-score outliers (|value − μ_type| > 3σ_type): the
    two-pass standardization shape — one combiner pass computes
    group moments (group-count-bounded), which broadcast back into a
    vectorized row filter. Returns the outlier event ids."""
    import ray

    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "event_type", "value"])

    def sq(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"event_type": df["event_type"],
                             "v": df["value"],
                             "v2": df["value"] ** 2})

    mom = grouped_aggregate(ds.map_batches(sq, batch_format="pandas"),
                            ["event_type"],
                            {"n": (None, "count"), "s": ("v", "sum"),
                             "s2": ("v2", "sum")}).to_pandas()
    mom["mu"] = mom["s"] / mom["n"]
    # sample stddev (n-1), matching stddev_samp
    mom["sd"] = np.sqrt((mom["s2"] - mom["n"] * mom["mu"] ** 2)
                        / (mom["n"] - 1))
    mu_map = dict(zip(mom["event_type"], mom["mu"]))
    sd_map = dict(zip(mom["event_type"], mom["sd"]))
    ref = ray.put((mu_map, sd_map))

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        mus, sds = ray.get(ref)
        mu = df["event_type"].map(mus).to_numpy(np.float64)
        sd = df["event_type"].map(sds).to_numpy(np.float64)
        keep = np.abs(df["value"].to_numpy() - mu) > 3 * sd
        out = df[keep][["event_id", "event_type"]].copy()
        return out

    out = ds.map_batches(flag, batch_format="pandas").to_pandas()
    if "event_id" not in out.columns:
        out = pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                            "event_type": pd.Series(dtype="object")})
    out["event_id"] = out["event_id"].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)

def q_events_funnel(sf_dir: str):
    """Sequential funnel analysis (view → click ≤24h → purchase
    ≤24h): the ordered-pattern-matching shape — each stage is a
    grouped min over the PREVIOUS stage's anchor timestamps attached
    to the fact stream by a hash join, with a vectorized window
    filter. Per-user state never leaves the cluster; only the three
    stage counts return."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized, shuffle_partitions
    configure_data_context()
    ev = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type", "ts"]) \
        .materialize()
    W = pd.Timedelta("24h")
    np_ = shuffle_partitions(8)

    def typed(t):
        return ev.map_batches(
            lambda df, _t=t: df[df["event_type"] == _t]
            [["user_id", "ts"]], batch_format="pandas")

    t0 = grouped_aggregate(typed("view"), ["user_id"],
                           {"t0": ("ts", "min")}, result_hint="large") \
        .materialize()
    s2 = typed("click").join(t0, join_type="inner", num_partitions=np_,
                             on=("user_id",))
    t1 = grouped_aggregate(
        s2.map_batches(
            lambda df: df[(df["ts"] > df["t0"])
                          & (df["ts"] <= df["t0"] + W)]
            [["user_id", "ts"]], batch_format="pandas"),
        ["user_id"], {"t1": ("ts", "min")}, result_hint="large") \
        .materialize()
    s3 = typed("purchase").join(t1, join_type="inner",
                                num_partitions=np_, on=("user_id",))
    reached = grouped_aggregate(
        s3.map_batches(
            lambda df: df[(df["ts"] > df["t1"])
                          & (df["ts"] <= df["t1"] + W)]
            [["user_id"]], batch_format="pandas"),
        ["user_id"], {"n": (None, "count")}, result_hint="large")
    return pd.DataFrame({
        "stage": ["1_view", "2_click_24h", "3_purchase_24h"],
        "n_users": np.array([t0.count(), t1.count(), reached.count()],
                            dtype="int64")})

def q_events_checksum(sf_dir: str):
    """Order-independent table checksum — the cross-system validation
    primitive for verifying a 100 TB copy/migration without moving the
    data twice: checksum := (Σ over rows of md5_64(key-fields) mod
    2⁶³) mod 2⁶³. Commutative/associative, so per-batch partial sums
    tree-reduce and NO row order, sharding, or engine needs to match;
    the SQL oracle recomputes the identical number from the identical
    definition."""
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id",
                                     "event_type"])
    MOD = 1 << 63

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        from jerex_ray.util import md5_hash64_batch
        if df.empty:
            return pd.DataFrame({"c": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64")})
        keys = (df["event_id"].astype(str) + "|"
                + df["user_id"].astype(str) + "|"
                + df["event_type"].astype(str))
        h = md5_hash64_batch(keys.to_numpy()) % np.uint64(MOD)
        return pd.DataFrame({"c": [np.int64(int(h.sum()) % MOD)],
                             "n": [np.int64(len(df))]})

    parts = ds.map_batches(partial, batch_format="pandas",
                           batch_size=65536).to_pandas()
    # the collected object is #batches rows — exact final mod on the
    # driver (python ints, no overflow)
    total = int(sum(int(x) for x in parts["c"])) % MOD
    return pd.DataFrame({"checksum": [np.int64(total)],
                         "n_rows": [np.int64(parts["n"].sum())]})

def q_events_type_share(sf_dir: str):
    """Share-of-total per event type (grouped sum ÷ grand total): one
    combiner-backed grouped aggregate; the division happens on the
    group-count-bounded result."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_type", "value"])
    g = grouped_aggregate(ds, ["event_type"],
                          {"sum_value": ("value", "sum")}).to_pandas()
    g["share"] = (g["sum_value"] / g["sum_value"].sum()).round(6)
    g["sum_value"] = g["sum_value"].round(2)
    return g.sort_values("event_type").reset_index(drop=True)

def q_events_running_total(sf_dir: str):
    """Per-user running total of event value (cumulative window sum):
    hash co-location by user, one vectorized in-block sort + grouped
    cumsum — the distributed keyed prefix-sum shape (``ops/pack.py``
    uses the same for token budgets). Oracled by
    ``SUM() OVER (PARTITION BY user ORDER BY ts, id)``."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts",
                                     "value"])

    def running(block: pd.DataFrame) -> pd.DataFrame:
        if block.empty:
            return pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                                 "user_id": pd.Series(dtype="int64"),
                                 "running_value": pd.Series(
                                     dtype="float64")})
        b = block.sort_values(["user_id", "ts", "event_id"])
        out = pd.DataFrame({
            "event_id": b["event_id"].to_numpy(),
            "user_id": b["user_id"].to_numpy(),
            "running_value": b.groupby("user_id", sort=False)["value"]
            .cumsum().round(2).to_numpy()})
        return out

    out = grouped_apply(ds, ["user_id"], running).to_pandas()
    out["event_id"] = out["event_id"].astype("int64")
    out["user_id"] = out["user_id"].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)

def q_events_mode_by_user(sf_dir: str):
    """Grouped mode (most frequent event_type per user,
    lexicographic tie-break) — the two-phase partial-count election
    (``functions/aggregate.grouped_mode``), oracled via
    row_number-over-counts SQL."""
    from jerex_ray.functions.aggregate import grouped_mode
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type"])
    out = grouped_mode(ds, ["user_id"], value_col="event_type").to_pandas()
    out["user_id"] = out["user_id"].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)

def q_events_cms_counts(sf_dir: str):
    """Count-min sketch per-type counts (``ops/sketch.cms_counts_by``):
    distributed additive-counter build (tree-reduce SUM of depth×width
    matrices — kilobytes through the object store, never the column),
    point estimates = min over rows. md5-derived buckets make the
    estimate a deterministic function of the data, so the SQL oracle
    recomputes counters AND estimates exactly — including any
    collision inflation (the estimate is one-sided ≥ truth, which the
    pytest property gate also asserts)."""
    from jerex_ray.ops.sketch import cms_counts_by
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_type"])
    out = cms_counts_by(ds, column="event_type", depth=4, width=1024)
    out["cms_count"] = out["cms_count"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)

def q_events_stream_late(sf_dir: str):
    """Streaming-window late-data side channel: per-shard watermarks
    (``id % 8`` partitioned log), arrival = ts + md5-jitter, allowed
    lateness 30 min — events below their shard's watermark at arrival
    are LATE (``ops/streaming.watermark_tag``). The SQL oracle
    recomputes arrival, the per-shard running max over strictly
    earlier arrivals, and the same cutoff."""
    from jerex_ray.ops.streaming import watermark_tag
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "ts"])
    out = watermark_tag(ds, lateness="30min").to_pandas()
    out = out[out["is_late"]][["event_id", "shard", "ts"]]
    out["event_id"] = out["event_id"].astype("int64")
    out["shard"] = out["shard"].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)

def q_events_stream_windows(sf_dir: str):
    """Finalized hourly tumbling windows over the ON-TIME stream (the
    companion of ``q_events_stream_late``): late rows are excluded
    from their window's aggregate, exactly the Beam/Flink
    allowed-lateness drop rule."""
    from jerex_ray.ops.streaming import stream_window_aggregate
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "ts", "value"])
    out = stream_window_aggregate(ds, window="1h",
                                  lateness="30min").to_pandas()
    out["n_events"] = out["n_events"].astype("int64")
    out["sum_value"] = out["sum_value"].round(2)
    return out.sort_values("window_start").reset_index(drop=True)

def q_events_value_mad(sf_dir: str):
    """Robust scale statistics: median + median absolute deviation of
    the event values — TWO passes of the shuffle-free exact-quantile
    selector (``ops/quantiles.distributed_quantiles``): the first
    finds the median, the second runs over |v − median| computed
    vectorized per batch. Oracled against nested quantile_cont."""
    from jerex_ray.ops.quantiles import distributed_quantiles
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["value"])
    med = distributed_quantiles(ds, "value", [0.5])[0]
    dev = ds.map_batches(
        lambda df: pd.DataFrame(
            {"dev": (df["value"] - med).abs()}),
        batch_format="pandas")
    mad = distributed_quantiles(dev, "dev", [0.5])[0]
    return pd.DataFrame({"med": [round(float(med), 6)],
                         "mad": [round(float(mad), 6)]})

def q_events_distinct_users_by_type(sf_dir: str):
    """EXACT distinct users per event type (the exact twin of the
    HLL-sketched ``q_events_hll_by_type``): distinct (type, user)
    pairs via one combiner-backed grouped aggregate, then a count per
    type over the pair-bounded result."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_type", "user_id"])
    pairs = grouped_aggregate(ds, ["event_type", "user_id"],
                              {"n": (None, "count")},
                              result_hint="large")
    out = grouped_aggregate(pairs, ["event_type"],
                            {"n_users": (None, "count")}).to_pandas()
    out["n_users"] = out["n_users"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)

def q_events_percent_rank(sf_dir: str):
    """percent_rank() of each event's value within its event_type —
    the rank window function distributed as one hash co-location per
    type plus a vectorized in-block min-rank ((rank−1)/(n−1) is an
    exact integer division on both sides, so no rounding is
    needed)."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "event_type", "value"])

    def pr_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                                 "event_type": pd.Series(dtype="object"),
                                 "pr": pd.Series(dtype="float64")})
        g = df.groupby("event_type", sort=False)["value"]
        r = g.rank(method="min").to_numpy(np.float64)
        n = g.transform("size").to_numpy(np.float64)
        pr = np.where(n > 1, (r - 1.0) / np.maximum(n - 1.0, 1.0), 0.0)
        return pd.DataFrame({"event_id": df["event_id"].to_numpy(),
                             "event_type": df["event_type"].to_numpy(),
                             "pr": pr})

    out = grouped_apply(ds, ["event_type"], pr_block).to_pandas()
    out["event_id"] = out["event_id"].astype("int64")
    return out[["event_id", "event_type", "pr"]] \
        .sort_values("event_id").reset_index(drop=True)

def q_events_state_intervals(sf_dir: str):
    """SCD-2-style run collapse: per user, consecutive events of the
    same type (ordered by ts, event_id) fold into one validity
    interval (run index, first/last ts, count) — gaps-and-islands via
    one user co-location and a vectorized change-flag cumsum, the
    dimension-history builder of a warehouse load."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "ts", "user_id",
                                     "event_type"])

    def runs_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({
                "user_id": pd.Series(dtype="int64"),
                "run": pd.Series(dtype="int64"),
                "event_type": pd.Series(dtype="object"),
                "first_ts": pd.Series(dtype="datetime64[us]"),
                "last_ts": pd.Series(dtype="datetime64[us]"),
                "n_events": pd.Series(dtype="int64")})
        df = df.sort_values(["user_id", "ts", "event_id"])
        chg = ((df["event_type"] != df["event_type"].shift())
               | (df["user_id"] != df["user_id"].shift())).to_numpy()
        # the cumsum restarts per user: subtract the run count carried
        # in from earlier users (run index is 1-based within user)
        glob = np.cumsum(chg).astype(np.int64)
        d = df.assign(glob=glob)
        base = d.groupby("user_id", sort=False)["glob"] \
            .transform("min").to_numpy()
        d["run"] = d["glob"].to_numpy() - base + 1
        g = d.groupby(["user_id", "run"], sort=True)
        out = g.agg(event_type=("event_type", "first"),
                    first_ts=("ts", "min"), last_ts=("ts", "max"),
                    n_events=("event_id", "size")).reset_index()
        return out

    out = grouped_apply(ds, ["user_id"], runs_block).to_pandas()
    out["user_id"] = out["user_id"].astype("int64")
    out["run"] = out["run"].astype("int64")
    out["n_events"] = out["n_events"].astype("int64")
    return out[["user_id", "run", "event_type", "first_ts", "last_ts",
                "n_events"]] \
        .sort_values(["user_id", "run"]).reset_index(drop=True)

def q_events_chi2(sf_dir: str):
    """Chi-square independence audit of event_type × hour-of-day: ONE
    combiner-reduced grid aggregate is the only pass over the data;
    marginals and the (observed−expected)²/expected contributions are
    computed on the tiny types×24 grid. The corpus-health question
    'does traffic mix shift by hour?' as a single-shuffle operator."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_type", "ts"])

    def hour(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"event_type": df["event_type"],
                             "hr": df["ts"].dt.hour.astype("int64")})

    grid = grouped_aggregate(ds.map_batches(hour, batch_format="pandas"),
                             ["event_type", "hr"],
                             {"obs": (None, "count")}).to_pandas()
    grid["obs"] = grid["obs"].astype("int64")
    r = grid.groupby("event_type")["obs"].transform("sum") \
        .to_numpy(np.float64)
    c = grid.groupby("hr")["obs"].transform("sum").to_numpy(np.float64)
    n = float(grid["obs"].sum())
    e = r * c / n
    o = grid["obs"].to_numpy(np.float64)
    grid["expected"] = np.round(e, 6)
    grid["contrib"] = np.round((o - e) * (o - e) / e, 6)
    return grid[["event_type", "hr", "obs", "expected", "contrib"]] \
        .sort_values(["event_type", "hr"]).reset_index(drop=True)

def q_events_trimmed_mean(sf_dir: str):
    """10–90 % trimmed (winsor-bounded) mean of value per event_type —
    robust central tendency: exact distributed per-group quantiles
    (``ops/quantiles.grouped_quantiles``, three shuffle-free passes)
    give the bounds, then ONE filtered combiner aggregate computes the
    in-bounds mean. No sort, no per-group scan."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.ops.quantiles import grouped_quantiles
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_type", "value"])
    qs = grouped_quantiles(ds, "event_type", "value", [0.1, 0.9])
    lo = qs[qs["q"] == 0.1].set_index("event_type")["value"].to_dict()
    hi = qs[qs["q"] == 0.9].set_index("event_type")["value"].to_dict()

    def inb(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value"].to_numpy(np.float64)
        l = df["event_type"].map(lo).to_numpy(np.float64)
        h = df["event_type"].map(hi).to_numpy(np.float64)
        keep = (v >= l) & (v <= h)
        return df[keep]

    out = grouped_aggregate(
        ds.map_batches(inb, batch_format="pandas"),
        ["event_type"],
        {"n": (None, "count"), "s": ("value", "sum")}).to_pandas()
    out["trimmed_mean"] = (out["s"] / out["n"]).round(6)
    out["n"] = out["n"].astype("int64")
    return out[["event_type", "n", "trimmed_mean"]] \
        .sort_values("event_type").reset_index(drop=True)

def q_events_rolling_median(sf_dir: str):
    """Exact rolling median of value per user over the current + 4
    preceding events — the robust smoother (rank statistics resist the
    spikes a moving average chases). One user co-location, then
    pandas' O(w·log w) rolling-median kernel per block; both sides
    midpoint-interpolate even windows, so the doubles agree
    bit-for-bit before the 6-decimal rounding."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "ts", "user_id",
                                     "value"])

    def med(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                                 "med5": pd.Series(dtype="float64")})
        d = df.sort_values(["user_id", "ts", "event_id"])
        m = d.groupby("user_id", sort=False)["value"] \
            .rolling(5, min_periods=1).median() \
            .reset_index(drop=True).to_numpy()
        return pd.DataFrame({"event_id": d["event_id"].to_numpy(),
                             "med5": np.round(m, 6)})

    out = grouped_apply(ds, ["user_id"], med).to_pandas()
    out["event_id"] = out["event_id"].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)

def q_events_since_anchor(sf_dir: str):
    """Per-event microseconds since the user's most recent 'purchase'
    (at or before the event) — the recency feature of every
    feature-engineering pipeline, computed as a per-user forward fill
    of anchor timestamps after one co-location. Events with no prior
    purchase are excluded on both sides (no NULL rows to hash)."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "ts", "user_id",
                                     "event_type"])

    def since(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                              "user_id": pd.Series(dtype="int64"),
                              "since_us": pd.Series(dtype="int64")})
        if df.empty:
            return empty
        d = df.sort_values(["user_id", "ts", "event_id"])
        t = d["ts"].astype("int64")
        anchor = t.where(d["event_type"].to_numpy() == "purchase") \
            .groupby(d["user_id"].to_numpy()).ffill()
        keep = anchor.notna().to_numpy()
        if not keep.any():
            return empty
        return pd.DataFrame({
            "event_id": d["event_id"].to_numpy()[keep],
            "user_id": d["user_id"].to_numpy()[keep],
            "since_us": (t.to_numpy()[keep]
                         - anchor.to_numpy()[keep].astype(np.int64))})

    out = grouped_apply(ds, ["user_id"], since).to_pandas()
    for c in ("event_id", "user_id", "since_us"):
        out[c] = out[c].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)

def q_events_top_trigrams(sf_dir: str):
    """Sequential pattern mining lite: corpus-wide counts of
    consecutive event-type TRIPLES per user timeline, top 20 with a
    full lexicographic tie-break. One user co-location, vectorized
    shift-explode (no per-row loop), combiner-reduced counts (≤
    |types|³ rows), driver top-k on the tiny result."""
    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "ts", "user_id",
                                     "event_type"])

    def tri(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"t1": pd.Series(dtype="object"),
                              "t2": pd.Series(dtype="object"),
                              "t3": pd.Series(dtype="object")})
        if df.empty:
            return empty
        d = df.sort_values(["user_id", "ts", "event_id"])
        t = d["event_type"].to_numpy()
        u = d["user_id"].to_numpy()
        if len(d) < 3:
            return empty
        same = (u[:-2] == u[1:-1]) & (u[1:-1] == u[2:])
        return pd.DataFrame({"t1": t[:-2][same], "t2": t[1:-1][same],
                             "t3": t[2:][same]})

    tris = grouped_apply(ds, ["user_id"], tri)
    counts = grouped_aggregate(tris, ["t1", "t2", "t3"],
                               {"n": (None, "count")}).to_pandas()
    counts["n"] = counts["n"].astype("int64")
    out = counts.sort_values(["n", "t1", "t2", "t3"],
                             ascending=[False, True, True, True]) \
        .head(20)
    return out[["t1", "t2", "t3", "n"]].reset_index(drop=True)

def q_events_rolling_dau7(sf_dir: str):
    """Trailing-7-day distinct active users per observed day — the
    rolling-DAU dashboard series, windowed-distinct made
    shuffle-friendly: dedup (day, user) once (combiner), EXPLODE each
    active day to the 7 days it contributes to (vectorized repeat),
    dedup (target_day, user) again, count per day, keep observed
    days (broadcast day set — bounded by the calendar)."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["ts", "user_id"])

    def day_user(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "day": (df["ts"].astype("int64")
                    // 86_400_000_000).to_numpy(),
            "user_id": df["user_id"].to_numpy()}).drop_duplicates()

    du = grouped_aggregate(
        ds.map_batches(day_user, batch_format="pandas"),
        ["day", "user_id"], {"n": (None, "count")}).materialize()
    # observed-day filter: calendar-bounded, safe to broadcast
    day_arr = np.sort(grouped_aggregate(
        du, ["day"], {"n": (None, "count")}).to_pandas()["day"]
        .to_numpy(np.int64))

    def explode7(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"day": pd.Series(dtype="int64"),
                                 "user_id": pd.Series(dtype="int64")})
        d = np.repeat(df["day"].to_numpy(np.int64), 7) \
            + np.tile(np.arange(7, dtype=np.int64), len(df))
        u = np.repeat(df["user_id"].to_numpy(np.int64), 7)
        keep = np.isin(d, day_arr)
        return pd.DataFrame({"day": d[keep], "user_id": u[keep]}) \
            .drop_duplicates()

    contrib = grouped_aggregate(
        du.map_batches(explode7, batch_format="pandas"),
        ["day", "user_id"], {"n": (None, "count")})
    out = grouped_aggregate(contrib, ["day"],
                            {"dau7": (None, "count")}).to_pandas()
    out["day"] = pd.to_datetime(out["day"] * 86_400_000_000,
                                unit="us").dt.date.astype(str)
    out["dau7"] = out["dau7"].astype("int64")
    return out.sort_values("day").reset_index(drop=True)

def q_events_hourly_autocorr(sf_dir: str):
    """Lag-1 autocorrelation of the hourly event-count series ('is
    this hour's load predicted by the last?'): the combiner hourly
    aggregate is the only corpus pass; the calendar-bounded series
    shifts and correlates on the driver. Gaps (hours with zero
    events) follow observed-hours semantics on both sides."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["ts"])

    def hour(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"hr": df["ts"].dt.floor("h")})

    h = grouped_aggregate(ds.map_batches(hour, batch_format="pandas"),
                          ["hr"], {"n": (None, "count")}).to_pandas() \
        .sort_values("hr")
    x = h["n"].to_numpy(np.float64)
    n_pairs = max(len(x) - 1, 0)
    if n_pairs < 2:
        r = float("nan")
    else:
        r = float(np.corrcoef(x[1:], x[:-1])[0, 1])
    return pd.DataFrame({"n_pairs": pd.array([n_pairs], dtype="int64"),
                         "autocorr_lag1": [round(r, 6)]})

def q_events_type_lift(sf_dir: str):
    """Market-basket lift between event types over user-day baskets —
    lift(A,B) = P(A,B)/(P(A)·P(B)) — association strength the
    recommender/anomaly teams read. Distinct (user, day, type) via one
    combiner, within-basket pair explode after a basket co-location
    (pairs per basket ≤ |types|²), counts reduced again; the |types|²
    lift table finishes on the driver."""
    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["ts", "user_id", "event_type"])

    def basket(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(),
            "day": (df["ts"].astype("int64")
                    // 86_400_000_000).to_numpy(),
            "t": df["event_type"].to_numpy()}).drop_duplicates()

    b = grouped_aggregate(ds.map_batches(basket, batch_format="pandas"),
                          ["user_id", "day", "t"],
                          {"n": (None, "count")}).materialize()
    n_baskets = int(grouped_aggregate(
        b, ["user_id", "day"], {"n": (None, "count")}).count())
    tcnt = grouped_aggregate(b, ["t"], {"c": (None, "count")}) \
        .to_pandas().set_index("t")["c"].to_dict()

    def mate(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"ta": pd.Series(dtype="object"),
                              "tb": pd.Series(dtype="object")})
        if df.empty or "t" not in df.columns:
            return empty
        d = df[["user_id", "day", "t"]]
        m = d.merge(d, on=["user_id", "day"])
        m = m[m["t_x"] < m["t_y"]]
        if m.empty:
            return empty
        return pd.DataFrame({"ta": m["t_x"].to_numpy(),
                             "tb": m["t_y"].to_numpy()})

    pairs = grouped_apply(b, ["user_id", "day"], mate)
    ab = grouped_aggregate(pairs, ["ta", "tb"],
                           {"n_ab": (None, "count")}).to_pandas()
    if ab.empty or "ta" not in ab.columns:
        return pd.DataFrame({"ta": pd.Series(dtype="object"),
                             "tb": pd.Series(dtype="object"),
                             "n_ab": pd.Series(dtype="int64"),
                             "lift": pd.Series(dtype="float64")})
    na = ab["ta"].map(tcnt).to_numpy(np.float64)
    nb = ab["tb"].map(tcnt).to_numpy(np.float64)
    ab["lift"] = np.round(ab["n_ab"].to_numpy(np.float64) * n_baskets
                          / (na * nb), 6)
    ab["n_ab"] = ab["n_ab"].astype("int64")
    return ab[["ta", "tb", "n_ab", "lift"]] \
        .sort_values(["ta", "tb"]).reset_index(drop=True)

def q_events_unpivot(sf_dir: str):
    """Pivot → UNPIVOT roundtrip: the per-user wide count matrix
    (conditional aggregation) melts back to long form through the
    streaming ``relational.melt`` reshape (row-local, no shuffle).
    Zero cells survive the roundtrip, so the oracle is the users ×
    types cross join with coalesced counts."""
    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply
    from jerex_ray.relational import melt
    from jerex_ray.runtime import read_parquet_sized
    import ray.data as rd
    configure_data_context()
    types = ["click", "error", "purchase", "signup", "view"]
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type"])
    counts = grouped_aggregate(ds, ["user_id", "event_type"],
                               {"n": (None, "count")})

    def pivot_block(df: pd.DataFrame) -> pd.DataFrame:
        wide = df.pivot_table(index="user_id", columns="event_type",
                              values="n", aggfunc="sum", fill_value=0)
        wide = wide.reindex(columns=types, fill_value=0).reset_index()
        wide.columns = ["user_id"] + types
        return wide.astype("int64")

    wide = grouped_apply(counts, ["user_id"], pivot_block)
    out = melt(wide, id_cols=["user_id"], value_cols=types,
               var_name="event_type", value_name="n").to_pandas()
    out["user_id"] = out["user_id"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["user_id", "event_type"]) \
        .reset_index(drop=True)

def q_events_geomean(sf_dir: str):
    """Per-type geometric mean of event value — the log-domain
    aggregate: one combiner pass over (Σln v, n), exp of the mean on
    the |types|-bounded result. Oracled via exp(avg(ln v))."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_type", "value"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["value"] > 0]
        return pd.DataFrame({"event_type": df["event_type"].to_numpy(),
                             "lnv": np.log(df["value"].to_numpy(
                                 np.float64))})

    m = grouped_aggregate(ds.map_batches(prep, batch_format="pandas"),
                          ["event_type"], {"s": ("lnv", "sum"),
                                           "n": (None, "count")}) \
        .to_pandas()
    out = pd.DataFrame({
        "event_type": m["event_type"],
        "n": m["n"].astype("int64"),
        "geomean": np.exp(m["s"].to_numpy(np.float64)
                          / m["n"].to_numpy(np.float64)).round(6)})
    return out.sort_values("event_type").reset_index(drop=True)

def q_events_dod_overlap(sf_dir: str):
    """Day-over-day active-user overlap (the retention-curve
    primitive): per day, |active(d−1) ∩ active(d)| and its Jaccard.
    Users co-locate once; each block walks its users' sorted distinct
    days with one vectorized diff (a consecutive-day hit marks day d)
    — no self-join, nothing user-sized leaves the cluster. Daily
    totals come from the same distinct (day, user) pass."""
    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts"])

    def day(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"user_id": df["user_id"].to_numpy(),
                             "day": df["ts"].dt.floor("D").to_numpy()})

    du = grouped_aggregate(ds.map_batches(day, batch_format="pandas"),
                           ["user_id", "day"], {"n": (None, "count")},
                           result_hint="large").materialize()
    daily = grouped_aggregate(du, ["day"],
                              {"n_active": (None, "count")}).to_pandas()

    def both_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"day": pd.Series(
                dtype="datetime64[us]"),
                "c": pd.Series(dtype="int64")})
        b = df.sort_values(["user_id", "day"])
        u = b["user_id"].to_numpy()
        d = b["day"].to_numpy()
        same = u[1:] == u[:-1]
        consec = (d[1:] - d[:-1]) == np.timedelta64(1, "D")
        hit = d[1:][same & consec]
        if not len(hit):
            return pd.DataFrame({"day": pd.Series(
                dtype="datetime64[us]"),
                "c": pd.Series(dtype="int64")})
        g = pd.Series(hit).value_counts()
        return pd.DataFrame({"day": g.index.to_numpy(),
                             "c": g.to_numpy(np.int64)})

    both = grouped_aggregate(
        grouped_apply(du, ["user_id"], both_block),
        ["day"], {"n_both": ("c", "sum")}).to_pandas()

    daily = daily.sort_values("day").reset_index(drop=True)
    prev = daily.copy()
    prev["day"] = prev["day"] + pd.Timedelta(days=1)
    out = daily.merge(prev, on="day", how="inner",
                      suffixes=("", "_prev"))
    out = out.merge(both, on="day", how="left")
    out["n_both"] = out["n_both"].fillna(0).astype("int64")
    denom = (out["n_active_prev"] + out["n_active"]
             - out["n_both"]).to_numpy(np.float64)
    out["jaccard"] = (out["n_both"] / denom).round(6)
    out["n_active"] = out["n_active"].astype("int64")
    out["n_active_prev"] = out["n_active_prev"].astype("int64")
    return out[["day", "n_active_prev", "n_active", "n_both",
                "jaccard"]].sort_values("day").reset_index(drop=True)

def q_events_regression(sf_dir: str):
    """Per-group ordinary-least-squares fit of event value against
    time (days since 1995-01-01), from ONE combiner pass of grouped
    co-moments (n, Σx, Σy, Σx², Σy², Σxy per event type — five
    scalars per group reduce, never the rows). Slope/intercept/R²
    close over the |types|-bounded table on the driver. Conditioning:
    time is CENTERED per group at the exact integer midpoint of the
    group's (min, max) epoch-µs BEFORE the moments (both sides) —
    raw days-since-1995 magnitudes lose ~3 digits to cancellation in
    Σx²−(Σx)²/n and made the 6-dp round unstable under summation
    order; centered, the dust is ~1e-12 absolute. Intercept is still
    reported on the 1995-01-01 axis (shift identity). Oracled by the
    identical centered-moment algebra in SQL; half-away rounding on
    both engines."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_type", "ts", "value"])

    def bounds(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].astype("datetime64[us]").astype("int64")
        g = pd.DataFrame({"event_type": df["event_type"].to_numpy(),
                          "mn": us, "mx": us})
        return g.groupby("event_type", sort=False, as_index=False) \
            .agg(mn=("mn", "min"), mx=("mx", "max"))

    b = grouped_aggregate(
        ds.map_batches(bounds, batch_format="pandas"),
        ["event_type"], {"mn": ("mn", "min"), "mx": ("mx", "max")},
        result_hint="small").to_pandas()
    centers = {t: (int(mn) + int(mx)) // 2
               for t, mn, mx in zip(b["event_type"], b["mn"], b["mx"])}

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].astype("datetime64[us]").astype("int64") \
            .to_numpy(np.int64)
        c = df["event_type"].map(centers).to_numpy(np.int64)
        x = (us - c) / 86400000000.0
        y = df["value"].to_numpy(np.float64)
        g = pd.DataFrame({"event_type": df["event_type"].to_numpy(),
                          "n": 1, "sx": x, "sy": y, "sxx": x * x,
                          "syy": y * y, "sxy": x * y})
        return g.groupby("event_type", sort=False, as_index=False).sum()

    m = grouped_aggregate(
        ds.map_batches(moments, batch_format="pandas"),
        ["event_type"],
        {k: (k, "sum") for k in ("n", "sx", "sy", "sxx", "syy",
                                 "sxy")}).to_pandas()
    _P95_US = 788918400000000          # µs 1970-01-01 → 1995-01-01
    n = m["n"].to_numpy(np.float64)
    cdays = np.asarray([(centers[t] - _P95_US) / 86400000000.0
                        for t in m["event_type"]])
    vx = m["sxx"] - m["sx"] ** 2 / n
    vy = m["syy"] - m["sy"] ** 2 / n
    cov = m["sxy"] - m["sx"] * m["sy"] / n
    slope = cov / vx
    out = pd.DataFrame({
        "event_type": m["event_type"],
        "n": m["n"].astype("int64"),
        "slope": _round_half_away(slope.to_numpy(np.float64), 6),
        "intercept": _round_half_away(
            ((m["sy"] / n - slope * m["sx"] / n)
             - slope * cdays).to_numpy(np.float64), 6),
        "r2": _round_half_away(
            (cov * cov / (vx * vy)).to_numpy(np.float64), 6)})
    return out.sort_values("event_type").reset_index(drop=True)

def q_events_moving_avg(sf_dir: str):
    """Row-frame window aggregate (ROWS BETWEEN 3 PRECEDING AND
    CURRENT ROW): per-user 4-row moving average of event value in
    (ts, id) order — users co-locate in one hash shuffle, each block
    runs a vectorized grouped rolling mean. Oracled vs the SQL
    window frame."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts",
                                     "value"])

    def mavg(block: pd.DataFrame) -> pd.DataFrame:
        if block.empty:
            return pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                                 "user_id": pd.Series(dtype="int64"),
                                 "mavg": pd.Series(dtype="float64")})
        b = block.sort_values(["user_id", "ts", "event_id"])
        r = b.groupby("user_id", sort=False)["value"] \
            .rolling(4, min_periods=1).mean() \
            .reset_index(level=0, drop=True)
        return pd.DataFrame({"event_id": b["event_id"].to_numpy(),
                             "user_id": b["user_id"].to_numpy(),
                             "mavg": r.to_numpy().round(6)})

    out = grouped_apply(ds, ["user_id"], mavg).to_pandas()
    out["event_id"] = out["event_id"].astype("int64")
    out["user_id"] = out["user_id"].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)

def q_events_markov(sf_dir: str):
    """First-order Markov transition matrix of event types per user
    (``ops/windows.transition_matrix``): one hash shuffle co-locates
    users, per-block sort + shifted-view pair counts reduce through
    the combiner; only the |types|² count table reaches the driver.
    SQL-oracled via LEAD OVER (PARTITION BY user ORDER BY ts, id)."""
    from jerex_ray.ops.windows import transition_matrix
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts",
                                     "event_type"])
    return transition_matrix(ds, key="user_id", ts_col="ts",
                             id_col="event_id", type_col="event_type")

def q_events_ewma(sf_dir: str, *, alpha: float = 0.1):
    """Per-row exponentially-weighted moving average of event value
    per user in (ts, id) order — the standard feature-engineering
    smoother (e_t = α·v_t + (1−α)·e_{t−1}, adjust=False semantics).

    Scale shape: users co-locate in ONE hash shuffle; each block runs
    a rank-stepped recursion — one vectorized ``α·v + (1−α)·e_prev``
    update per within-user rank, across ALL of the block's users at
    once (the loop is over max series length, not rows). The update
    performs bit-identical float64 ops to the oracle's recursive CTE,
    so the round-6 compare is exact, not approximate."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    beta = 1.0 - alpha
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts",
                                     "value"])

    def ewma(block: pd.DataFrame) -> pd.DataFrame:
        if block.empty:
            return pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                                 "ewma": pd.Series(dtype="float64")})
        b = block.sort_values(["user_id", "ts", "event_id"])
        v = b["value"].to_numpy(np.float64)
        uid = b["user_id"].to_numpy()
        # rows of a user are contiguous after the sort → rn is the
        # offset from the user's first row, and idx-1 is the user's
        # previous row wherever rn > 0
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        starts = np.flatnonzero(new_user)
        lens = np.diff(np.r_[starts, len(v)])
        rn = np.arange(len(v)) - np.repeat(starts, lens)
        e = v.copy()
        for r in range(1, int(rn.max()) + 1 if len(rn) else 0):
            idx = np.flatnonzero(rn == r)
            e[idx] = alpha * v[idx] + beta * e[idx - 1]
        # DuckDB round() is half-AWAY-from-zero; np.round is half-even
        # — mirror the oracle's rule so exact .5 boundaries agree
        r = np.copysign(np.floor(np.abs(e) * 1e6 + 0.5), e) / 1e6
        return pd.DataFrame({"event_id": b["event_id"].to_numpy(),
                             "ewma": r})

    out = grouped_apply(ds, ["user_id"], ewma).to_pandas()
    out["event_id"] = out["event_id"].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)

def q_events_max_concurrency(sf_dir: str):
    """Peak concurrent sessions (each event occupies
    [ts, ts + value minutes)): the classic +1/−1 endpoint sweep, made
    distributed — endpoint explode, per-timestamp net delta (combiner
    aggregate), then the EXACT distributed prefix sum over time
    (quantile range buckets → per-bucket totals → broadcast offsets →
    in-bucket cumsum), with the max and its earliest timestamp
    composed from per-bucket (total, best, best_t) partials on the
    driver — 2×#events endpoint rows never collect. Integer deltas
    and integer-microsecond times make every comparison engine-exact.
    The within-timestamp peak always lands on the post-group value
    (ends at t sort before starts only across groups; inside one t the
    running value dips then rises), so per-t grouping is lossless."""
    import ray

    from jerex_ray.functions.aggregate import (grouped_aggregate,
                                               grouped_apply)
    from jerex_ray.ops.quantiles import distributed_quantiles
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["ts", "value"])

    def endpoints(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"t_us": pd.Series(dtype="int64"),
                                 "d": pd.Series(dtype="int64")})
        start = df["ts"].astype("int64").to_numpy()
        # DuckDB CAST(DOUBLE AS BIGINT) rounds half-away-from-zero;
        # numpy astype truncates — mirror the cast (durations > 0)
        dur = np.floor(df["value"].to_numpy(np.float64)
                       * 60000000.0 + 0.5).astype(np.int64)
        return pd.DataFrame({
            "t_us": np.concatenate([start, start + dur]),
            "d": np.concatenate([np.ones(len(df), dtype=np.int64),
                                 -np.ones(len(df), dtype=np.int64)])})

    nd = grouped_aggregate(ds.map_batches(endpoints,
                                          batch_format="pandas"),
                           ["t_us"], {"nd": ("d", "sum")},
                           result_hint="large").materialize()
    qs = [i / 16 for i in range(1, 16)]
    pivots = np.unique(np.asarray(
        distributed_quantiles(nd, "t_us", qs), dtype=np.float64))
    piv_ref = ray.put(pivots)

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["__b"] = np.searchsorted(
            ray.get(piv_ref), df["t_us"].to_numpy(np.float64),
            side="left").astype(np.int64)
        return out

    def bucket_partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for b, g in df.groupby("__b", sort=False):
            g = g.sort_values("t_us")
            cum = g["nd"].to_numpy(np.int64).cumsum()
            i = int(np.argmax(cum))          # first peak in the bucket
            rows.append((int(b), int(cum[-1]), int(cum[i]),
                         int(g["t_us"].to_numpy()[i])))
        return pd.DataFrame(rows, columns=["__b", "total", "best",
                                           "best_t"])

    parts = grouped_apply(nd.map_batches(with_bucket,
                                         batch_format="pandas"),
                          ["__b"], bucket_partial).to_pandas() \
        .sort_values("__b")
    offsets = np.concatenate(
        ([0], parts["total"].to_numpy(np.int64).cumsum()[:-1]))
    cand = offsets + parts["best"].to_numpy(np.int64)
    peak = int(cand.max())
    first = int(np.argmax(cand == peak))     # buckets are time-ordered
    at_us = int(parts["best_t"].to_numpy()[first])
    return pd.DataFrame({
        "max_concurrency": pd.Series([peak], dtype="int64"),
        "at_ts": [pd.Timestamp(at_us, unit="us")]})

def q_events_incremental_hourly(sf_dir: str):
    """Incremental view maintenance of the hourly-by-type rollup:
    the history (event_id % 10 ≠ 0) is folded ONCE into mergeable
    partial states (``functions/aggregate.partial_states``), the
    incoming shard (event_id % 10 = 0) into its own, and
    ``merge_states`` folds state+delta into the final view — the
    invariant (and the oracle) is exact equality with a full
    recompute over all events, including the mean's sum/count state
    split. Cost of an increment scales with |keys| + |delta|, never
    the ingested history."""
    from jerex_ray.functions.aggregate import merge_states, partial_states
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "ts", "event_type",
                                     "value"])

    def prep(which):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            m = (df["event_id"].to_numpy() % 10 == 0)
            if which == "base":
                m = ~m
            d = df.loc[m]
            return pd.DataFrame({
                "event_type": d["event_type"].to_numpy(),
                "hour": d["ts"].dt.floor("h").to_numpy(),
                "value": d["value"].to_numpy(np.float64)})
        return fn

    keys = ["event_type", "hour"]
    specs = {"n_events": (None, "count"),
             "sum_value": ("value", "sum"),
             "avg_value": ("value", "mean")}
    base = partial_states(
        ds.map_batches(prep("base"), batch_format="pandas"), keys, specs) \
        .materialize()                       # the "stored" state
    delta = partial_states(
        ds.map_batches(prep("delta"), batch_format="pandas"), keys, specs)
    out = merge_states([base, delta], keys, specs).to_pandas()
    out["n_events"] = out["n_events"].astype("int64")
    out["sum_value"] = out["sum_value"].round(2)
    out["avg_value"] = out["avg_value"].round(6)
    return out.sort_values(["event_type", "hour"]).reset_index(drop=True)

def q_events_cusum(sf_dir: str):
    """CUSUM change-point detection per event type: the timestamp
    where the cumulative deviation from the type's mean peaks in
    magnitude (the classic level-shift locator). Computed in EXACT
    scaled integers — cusum_k · n = Σ_{i≤k} (n·cents_i) − k·Σcents —
    so the argmax is an integer comparison with zero float-boundary
    hazard on either engine.

    Scale shape: one combiner pass for per-type (n, Σcents), broadcast
    of that tiny frame, then the keyed ordered prefix sum
    (hash co-location by type + in-block sort/cumsum, the
    ``q_events_running_total`` shape). Ties on |cusum| break on
    earliest (ts, event_id)."""
    import ray

    from jerex_ray.functions.aggregate import (grouped_aggregate,
                                               grouped_apply)
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "ts", "event_type",
                                     "value"])

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_id": df["event_id"].to_numpy(),
            "ts": df["ts"].to_numpy(),
            "event_type": df["event_type"].to_numpy(),
            "cents": np.round(df["value"].to_numpy(np.float64)
                              * 100).astype(np.int64)})

    cds = ds.map_batches(cents, batch_format="pandas")
    stats = grouped_aggregate(cds, ["event_type"],
                              {"n": (None, "count"),
                               "s": ("cents", "sum")}).to_pandas()
    st_ref = ray.put({t: (int(n), int(s)) for t, n, s in
                      zip(stats["event_type"], stats["n"], stats["s"])})

    def peak(block: pd.DataFrame) -> pd.DataFrame:
        rows = []
        sm = ray.get(st_ref)
        for t, g in block.groupby("event_type", sort=False):
            n, s = sm[t]
            g = g.sort_values(["ts", "event_id"])
            # n·cusum_k = Σ_{i≤k} n·cents_i − k·s, all int64
            cum = (np.int64(n) * g["cents"].to_numpy(np.int64)).cumsum() \
                - np.arange(1, len(g) + 1, dtype=np.int64) * np.int64(s)
            i = int(np.argmax(np.abs(cum)))   # first peak wins
            v = float(cum[i]) / (n * 100.0)
            # half-away rounding mirrors DuckDB round()
            rows.append((t, int(g["event_id"].to_numpy()[i]),
                         float(np.copysign(
                             np.floor(abs(v) * 1e6 + 0.5), v)) / 1e6))
        return pd.DataFrame(rows, columns=["event_type", "at_event_id",
                                           "peak_cusum"])

    out = grouped_apply(cds, ["event_type"], peak).to_pandas()
    out["at_event_id"] = out["at_event_id"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)

QUERIES = {
    'q_events_welch_ttest': q_events_welch_ttest,
    'q_events_hourly': R.q_events_hourly,
    'q_events_value_quantiles': q_events_value_quantiles,
    'q_events_quantiles_by_type': q_events_quantiles_by_type,
    'q_events_value_buckets': q_events_value_buckets,
    'q_events_time_since_prev': q_events_time_since_prev,
    'q_events_type_pivot': q_events_type_pivot,
    'q_events_global_rank': q_events_global_rank,
    'q_events_expectations': q_events_expectations,
    'q_events_hll_users': q_events_hll_users,
    'q_events_hll_by_type': q_events_hll_by_type,
    'q_events_props_agg': q_events_props_agg,
    'q_events_sliding': q_events_sliding,
    'q_events_sessions': q_events_sessions,
    'q_events_ewma': q_events_ewma,
    'q_events_max_concurrency': q_events_max_concurrency,
    'q_events_incremental_hourly': q_events_incremental_hourly,
    'q_events_cusum': q_events_cusum,
    'q_events_value_mad': q_events_value_mad,
    'q_events_distinct_users_by_type': q_events_distinct_users_by_type,
    'q_events_funnel': q_events_funnel,
    'q_events_outliers': q_events_outliers,
    'q_events_checksum': q_events_checksum,
    'q_events_type_share': q_events_type_share,
    'q_events_running_total': q_events_running_total,
    'q_events_mode_by_user': q_events_mode_by_user,
    'q_events_cms_counts': q_events_cms_counts,
    'q_events_stream_late': q_events_stream_late,
    'q_events_stream_windows': q_events_stream_windows,
    'q_events_markov': q_events_markov,
    'q_events_regression': q_events_regression,
    'q_events_moving_avg': q_events_moving_avg,
    'q_events_unpivot': q_events_unpivot,
    'q_events_percent_rank': q_events_percent_rank,
    'q_events_state_intervals': q_events_state_intervals,
    'q_events_chi2': q_events_chi2,
    'q_events_trimmed_mean': q_events_trimmed_mean,
    'q_events_rolling_median': q_events_rolling_median,
    'q_events_since_anchor': q_events_since_anchor,
    'q_events_top_trigrams': q_events_top_trigrams,
    'q_events_rolling_dau7': q_events_rolling_dau7,
    'q_events_hourly_autocorr': q_events_hourly_autocorr,
    'q_events_geomean': q_events_geomean,
    'q_events_dod_overlap': q_events_dod_overlap,
    'q_events_type_lift': q_events_type_lift,
}

ORACLES = {
    'q_events_hourly': """
            SELECT event_type, date_trunc('hour', ts) AS hour,
                   count(*) AS n_events,
                   round(sum(value), 2) AS sum_value
            FROM events
            GROUP BY event_type, date_trunc('hour', ts)
            ORDER BY event_type, hour
        """,
    'q_events_value_quantiles': """
            SELECT round(quantile_cont(value, 0.25), 6) AS q25,
                   round(quantile_cont(value, 0.50), 6) AS q50,
                   round(quantile_cont(value, 0.75), 6) AS q75,
                   round(quantile_cont(value, 0.99), 6) AS q99
            FROM events
        """,
    'q_events_quantiles_by_type': """
            SELECT event_type, CAST(0.25 AS DOUBLE) AS q,
                   round(quantile_cont(value, 0.25), 6) AS value
            FROM events GROUP BY event_type
            UNION ALL
            SELECT event_type, CAST(0.5 AS DOUBLE) AS q,
                   round(quantile_cont(value, 0.50), 6) AS value
            FROM events GROUP BY event_type
            UNION ALL
            SELECT event_type, CAST(0.75 AS DOUBLE) AS q,
                   round(quantile_cont(value, 0.75), 6) AS value
            FROM events GROUP BY event_type
            ORDER BY event_type, q
        """,
    'q_events_global_rank': """
            SELECT event_id,
                   row_number() OVER (ORDER BY value, event_id) - 1
                       AS rnk
            FROM events ORDER BY event_id
        """,
    'q_events_expectations': """
            SELECT 'user_id' AS "column", count(*) AS n_rows,
                   count(*) FILTER (user_id IS NULL) AS n_null,
                   round(CAST(min(user_id) AS DOUBLE), 6) AS vmin,
                   round(CAST(max(user_id) AS DOUBLE), 6) AS vmax,
                   count(*) FILTER (user_id < 0) AS n_out_of_range
            FROM events
            UNION ALL
            SELECT 'value', count(*),
                   count(*) FILTER (value IS NULL),
                   round(min(value), 6), round(max(value), 6),
                   count(*) FILTER (value < 0.0 OR value > 50.0)
            FROM events
            ORDER BY "column"
        """,
    'q_events_time_since_prev': """
            SELECT event_id, user_id,
                   floor(epoch(ts) - epoch(lag(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id)))
                       AS delta_s
            FROM events ORDER BY event_id
        """,
    'q_events_type_pivot': """
            SELECT user_id,
                   sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                       AS n_click,
                   sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                       AS n_error,
                   sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS n_purchase,
                   sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                       AS n_signup,
                   sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                       AS n_view
            FROM events GROUP BY user_id ORDER BY user_id
        """,
    'q_events_value_buckets': """
            WITH b AS (
                SELECT event_type,
                       round(quantile_cont(value, 0.25), 6) AS b1,
                       round(quantile_cont(value, 0.50), 6) AS b2,
                       round(quantile_cont(value, 0.75), 6) AS b3
                FROM events GROUP BY event_type)
            SELECT e.event_id, e.event_type,
                   CASE WHEN e.value <= b.b1 THEN 1
                        WHEN e.value <= b.b2 THEN 2
                        WHEN e.value <= b.b3 THEN 3
                        ELSE 4 END AS bucket
            FROM events e JOIN b USING (event_type)
            ORDER BY e.event_id
        """,
    'q_events_hll_users': """
            WITH regs AS (
                SELECT DISTINCT
                       CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                           1, 16) AS UBIGINT) >> 52 AS r
                FROM events),
            v AS (SELECT count(*) AS nset FROM regs)
            SELECT round(4096 * ln(4096.0 / (4096 - nset)), 6) AS estimate,
                   CAST(nset AS BIGINT) AS registers_set,
                   CAST(12 AS BIGINT) AS p
            FROM v
        """,
    'q_events_hll_by_type': """
            WITH regs AS (
                SELECT DISTINCT event_type,
                       CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                           1, 16) AS UBIGINT) >> 52 AS r
                FROM events),
            c AS (SELECT event_type, count(*) AS nset
                  FROM regs GROUP BY event_type)
            SELECT event_type,
                   round(4096 * ln(4096.0 / (4096 - nset)), 6) AS estimate,
                   CAST(nset AS BIGINT) AS registers_set
            FROM c ORDER BY event_type
        """,
    'q_events_props_agg': """
            SELECT event_type, count(*) AS n,
                   sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                       AS sum_k,
                   min(CAST(json_extract_string(props, '$.k') AS BIGINT))
                       AS min_k,
                   max(CAST(json_extract_string(props, '$.k') AS BIGINT))
                       AS max_k,
                   round(avg(CAST(json_extract_string(props, '$.k')
                                  AS BIGINT)), 6) AS avg_k
            FROM events GROUP BY event_type ORDER BY event_type
        """,
    'q_events_sliding': """
            SELECT event_type, window_start, count(*) AS n_events FROM (
                SELECT event_type,
                       date_trunc('hour', ts) - k * INTERVAL 1 HOUR AS window_start
                FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k)
            ) GROUP BY event_type, window_start
            ORDER BY event_type, window_start
        """,
    'q_events_sessions': """
            WITH d AS (
                SELECT user_id, ts,
                       CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                                 > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
                FROM events),
            s AS (
                SELECT user_id, ts,
                       sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS sid
                FROM d)
            SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
                   count(*) AS n_events
            FROM s GROUP BY user_id, sid
            ORDER BY user_id, session_start
        """,
    'q_events_cusum': """
            WITH c AS MATERIALIZED (
                SELECT event_id, ts, event_type,
                       CAST(round(value * 100, 0) AS BIGINT) AS cents
                FROM events),
            s AS (SELECT event_type, count(*) AS n, sum(cents) AS sc
                  FROM c GROUP BY 1),
            p AS (
                SELECT c.event_type, event_id, ts, n,
                       sum(n * cents) OVER w
                       - row_number() OVER w * sc AS cum
                FROM c JOIN s USING (event_type)
                WINDOW w AS (PARTITION BY c.event_type
                             ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING))
            SELECT event_type, at_event_id, peak_cusum FROM (
                SELECT event_type, event_id AS at_event_id,
                       round(cum / (n * 100.0), 6) AS peak_cusum,
                       row_number() OVER (PARTITION BY event_type
                           ORDER BY abs(cum) DESC, ts, event_id) AS rk
                FROM p)
            WHERE rk = 1 ORDER BY event_type
        """,
    'q_events_incremental_hourly': """
            SELECT event_type, date_trunc('hour', ts) AS hour,
                   count(*) AS n_events,
                   round(sum(value), 2) AS sum_value,
                   round(avg(value), 6) AS avg_value
            FROM events
            GROUP BY 1, 2
            ORDER BY event_type, hour
        """,
    'q_events_max_concurrency': """
            WITH ep AS (
                SELECT epoch_us(ts) AS t, 1 AS d FROM events
                UNION ALL
                SELECT epoch_us(ts)
                       + CAST(value * 60000000.0 AS BIGINT), -1
                FROM events),
            g AS (SELECT t, sum(d) AS nd FROM ep GROUP BY t),
            c AS (SELECT t,
                         sum(nd) OVER (ORDER BY t) AS cum FROM g)
            SELECT CAST(cum AS BIGINT) AS max_concurrency,
                   make_timestamp(t) AS at_ts
            FROM c ORDER BY cum DESC, t LIMIT 1
        """,
    'q_events_ewma': """
            WITH RECURSIVE ord AS MATERIALIZED (
                SELECT user_id, event_id, CAST(value AS DOUBLE) AS value,
                       row_number() OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS rn
                FROM events),
            e AS (
                SELECT user_id, event_id, rn, value AS ewma
                FROM ord WHERE rn = 1
                UNION ALL
                SELECT o.user_id, o.event_id, o.rn,
                       0.1 * o.value + 0.9 * e.ewma
                FROM e JOIN ord o
                ON o.user_id = e.user_id AND o.rn = e.rn + 1)
            SELECT event_id, round(ewma, 6) AS ewma FROM e
            ORDER BY event_id
        """,
    'q_events_welch_ttest': """
            WITH st AS (
                SELECT event_type, count(*) AS n,
                       sum(CAST(value AS DOUBLE)) AS s,
                       sum(CAST(value AS DOUBLE) * value) AS ss
                FROM events GROUP BY event_type),
            tot AS (
                SELECT sum(n) AS n, sum(s) AS s, sum(ss) AS ss FROM st)
            SELECT event_type, CAST(st.n AS BIGINT) AS n,
                   round((st.s / st.n - (tot.s - st.s) / (tot.n - st.n))
                         / sqrt(((st.ss - st.s * st.s / st.n)
                                 / (st.n - 1)) / st.n
                                + (((tot.ss - st.ss)
                                    - (tot.s - st.s) * (tot.s - st.s)
                                      / (tot.n - st.n))
                                   / (tot.n - st.n - 1))
                                  / (tot.n - st.n)), 6) AS t_stat
            FROM st, tot ORDER BY event_type
        """,
    'q_events_funnel': """
            WITH v AS (
                SELECT user_id, min(ts) AS t0 FROM events
                WHERE event_type = 'view' GROUP BY user_id),
            c AS (
                SELECT v.user_id, min(e.ts) AS t1
                FROM events e JOIN v ON v.user_id = e.user_id
                WHERE e.event_type = 'click' AND e.ts > v.t0
                  AND e.ts <= v.t0 + INTERVAL 24 HOUR
                GROUP BY v.user_id),
            p AS (
                SELECT c.user_id
                FROM events e JOIN c ON c.user_id = e.user_id
                WHERE e.event_type = 'purchase' AND e.ts > c.t1
                  AND e.ts <= c.t1 + INTERVAL 24 HOUR
                GROUP BY c.user_id)
            SELECT '1_view' AS stage,
                   (SELECT count(*) FROM v) AS n_users
            UNION ALL SELECT '2_click_24h', (SELECT count(*) FROM c)
            UNION ALL SELECT '3_purchase_24h', (SELECT count(*) FROM p)
            ORDER BY stage
        """,
    'q_events_outliers': """
            WITH s AS (
                SELECT event_type, avg(value) AS mu,
                       stddev_samp(value) AS sd
                FROM events GROUP BY event_type)
            SELECT e.event_id, e.event_type
            FROM events e JOIN s ON s.event_type = e.event_type
            WHERE abs(e.value - s.mu) > 3 * s.sd
            ORDER BY e.event_id
        """,
    'q_events_checksum': """
            SELECT CAST(sum(CAST(
                       CAST('0x' || substr(md5(
                           CAST(event_id AS VARCHAR) || '|' ||
                           CAST(user_id AS VARCHAR) || '|' ||
                           event_type), 1, 16) AS UBIGINT)
                       % 9223372036854775808 AS HUGEINT))
                   % 9223372036854775808 AS BIGINT) AS checksum,
                   count(*) AS n_rows
            FROM events
        """,
    'q_events_type_share': """
            SELECT event_type,
                   round(sum(value), 2) AS sum_value,
                   round(sum(value) / sum(sum(value)) OVER (), 6)
                       AS share
            FROM events GROUP BY event_type ORDER BY event_type
        """,
    'q_events_running_total': """
            SELECT event_id, user_id,
                   round(sum(value) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id), 2) AS running_value
            FROM events ORDER BY event_id
        """,
    'q_events_mode_by_user': """
            WITH c AS (
                SELECT user_id, event_type, count(*) AS n
                FROM events GROUP BY user_id, event_type),
            r AS (
                SELECT user_id, event_type AS mode_value,
                       CAST(n AS BIGINT) AS mode_count,
                       ROW_NUMBER() OVER (PARTITION BY user_id
                           ORDER BY n DESC, event_type) AS rk
                FROM c)
            SELECT user_id, mode_value, mode_count
            FROM r WHERE rk = 1 ORDER BY user_id
        """,
    'q_events_cms_counts': """
            WITH rows_ AS (SELECT unnest(range(4)) AS j),
            b AS (
                SELECT j, CAST(CAST('0x' || substr(md5(
                           CAST(j AS VARCHAR) || '|' || event_type),
                           1, 16) AS UBIGINT) % 1024 AS BIGINT) AS bucket
                FROM events, rows_),
            counters AS (
                SELECT j, bucket, count(*) AS c
                FROM b GROUP BY j, bucket),
            types AS (SELECT DISTINCT event_type FROM events),
            tb AS (
                SELECT t.event_type, r.j,
                       CAST(CAST('0x' || substr(md5(
                           CAST(r.j AS VARCHAR) || '|' || t.event_type),
                           1, 16) AS UBIGINT) % 1024 AS BIGINT) AS bucket
                FROM types t, rows_ r)
            SELECT tb.event_type, CAST(min(c.c) AS BIGINT) AS cms_count
            FROM tb JOIN counters c ON c.j = tb.j AND c.bucket = tb.bucket
            GROUP BY tb.event_type ORDER BY event_type
        """,
    'q_events_stream_late': """
            WITH a AS (
                SELECT event_id, ts, event_id % 8 AS shard,
                       ts + to_seconds(CAST(
                           CAST('0x' || substr(md5(CAST(event_id AS
                               VARCHAR)), 1, 16) AS UBIGINT) % 3600
                           AS BIGINT)) AS arrival_ts
                FROM events),
            t AS (
                SELECT *, max(ts) OVER (PARTITION BY shard
                           ORDER BY arrival_ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) AS wm
                FROM a)
            SELECT event_id, shard, ts
            FROM t WHERE ts < wm - INTERVAL 30 MINUTE
            ORDER BY event_id
        """,
    'q_events_stream_windows': """
            WITH a AS (
                SELECT event_id, ts, value, event_id % 8 AS shard,
                       ts + to_seconds(CAST(
                           CAST('0x' || substr(md5(CAST(event_id AS
                               VARCHAR)), 1, 16) AS UBIGINT) % 3600
                           AS BIGINT)) AS arrival_ts
                FROM events),
            t AS (
                SELECT *, max(ts) OVER (PARTITION BY shard
                           ORDER BY arrival_ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) AS wm
                FROM a)
            SELECT date_trunc('hour', ts) AS window_start,
                   count(*) AS n_events,
                   round(sum(value), 2) AS sum_value
            FROM t
            WHERE wm IS NULL OR ts >= wm - INTERVAL 30 MINUTE
            GROUP BY 1 ORDER BY 1
        """,
    'q_events_value_mad': """
            SELECT round(quantile_cont(value, 0.5), 6) AS med,
                   round(quantile_cont(abs(value -
                       (SELECT quantile_cont(value, 0.5) FROM events)),
                       0.5), 6) AS mad
            FROM events
        """,
    'q_events_distinct_users_by_type': """
            SELECT event_type,
                   count(DISTINCT user_id) AS n_users
            FROM events GROUP BY event_type ORDER BY event_type
        """,
    'q_events_hourly_autocorr': """
            WITH h AS (SELECT date_trunc('hour', ts) AS hr,
                              count(*) AS n
                       FROM events GROUP BY 1),
            x AS (SELECT CAST(n AS DOUBLE) AS n,
                         lag(CAST(n AS DOUBLE)) OVER (ORDER BY hr)
                             AS prev
                  FROM h)
            SELECT CAST(count(*) AS BIGINT) AS n_pairs,
                   round(corr(n, prev), 6) AS autocorr_lag1
            FROM x WHERE prev IS NOT NULL
        """,
    'q_events_rolling_dau7': """
            WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day,
                               user_id FROM events),
            days AS (SELECT DISTINCT day FROM du)
            SELECT CAST(d.day AS VARCHAR) AS day,
                   CAST(count(DISTINCT u.user_id) AS BIGINT) AS dau7
            FROM days d JOIN du u
              ON u.day BETWEEN d.day - 6 AND d.day
            GROUP BY d.day ORDER BY day
        """,
    'q_events_type_lift': """
            WITH b AS (SELECT DISTINCT user_id,
                              epoch_us(ts) // 86400000000 AS day,
                              event_type AS t
                       FROM events),
            nb AS (SELECT count(*) AS n
                   FROM (SELECT DISTINCT user_id, day FROM b)),
            tc AS (SELECT t, count(*) AS c FROM b GROUP BY t),
            ab AS (SELECT a.t AS ta, b2.t AS tb, count(*) AS n_ab
                   FROM b a JOIN b b2
                     ON a.user_id = b2.user_id AND a.day = b2.day
                        AND a.t < b2.t
                   GROUP BY 1, 2)
            SELECT ta, tb, CAST(n_ab AS BIGINT) AS n_ab,
                   round(CAST(n_ab AS DOUBLE) * (SELECT n FROM nb)
                         / (CAST(ca.c AS DOUBLE) * CAST(cb.c AS DOUBLE)),
                         6) AS lift
            FROM ab JOIN tc ca ON ca.t = ta JOIN tc cb ON cb.t = tb
            ORDER BY ta, tb
        """,
    'q_events_top_trigrams': """
            WITH s AS (
                SELECT user_id, event_type AS t1,
                       lead(event_type, 1) OVER w AS t2,
                       lead(event_type, 2) OVER w AS t3
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
            SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n
            FROM s WHERE t3 IS NOT NULL
            GROUP BY t1, t2, t3
            ORDER BY n DESC, t1, t2, t3
            LIMIT 20
        """,
    'q_events_rolling_median': """
            SELECT event_id,
                   round(median(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6)
                       AS med5
            FROM events ORDER BY event_id
        """,
    'q_events_since_anchor': """
            WITH x AS (
                SELECT event_id, user_id, ts,
                       max(CASE WHEN event_type = 'purchase'
                                THEN ts END) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS anchor
                FROM events)
            SELECT event_id, user_id,
                   date_diff('microsecond', anchor, ts) AS since_us
            FROM x WHERE anchor IS NOT NULL
            ORDER BY event_id
        """,
    'q_events_chi2': """
            WITH o AS (SELECT event_type,
                              CAST(extract(hour FROM ts) AS BIGINT) AS hr,
                              count(*) AS obs
                       FROM events GROUP BY 1, 2),
            rt AS (SELECT event_type, CAST(sum(obs) AS DOUBLE) AS r
                   FROM o GROUP BY 1),
            ct AS (SELECT hr, CAST(sum(obs) AS DOUBLE) AS c
                   FROM o GROUP BY 1),
            n AS (SELECT CAST(sum(obs) AS DOUBLE) AS n FROM o)
            SELECT o.event_type, o.hr, CAST(o.obs AS BIGINT) AS obs,
                   round(rt.r * ct.c / n.n, 6) AS expected,
                   round((o.obs - rt.r * ct.c / n.n)
                         * (o.obs - rt.r * ct.c / n.n)
                         / (rt.r * ct.c / n.n), 6) AS contrib
            FROM o JOIN rt USING (event_type) JOIN ct USING (hr), n
            ORDER BY o.event_type, o.hr
        """,
    'q_events_trimmed_mean': """
            WITH b AS (SELECT event_type,
                              quantile_cont(value, 0.1) AS lo,
                              quantile_cont(value, 0.9) AS hi
                       FROM events GROUP BY event_type)
            SELECT e.event_type, CAST(count(*) AS BIGINT) AS n,
                   round(avg(e.value), 6) AS trimmed_mean
            FROM events e JOIN b USING (event_type)
            WHERE e.value >= b.lo AND e.value <= b.hi
            GROUP BY e.event_type ORDER BY e.event_type
        """,
    'q_events_percent_rank': """
            SELECT event_id, event_type,
                   percent_rank() OVER (PARTITION BY event_type
                                        ORDER BY value) AS pr
            FROM events ORDER BY event_id
        """,
    'q_events_state_intervals': """
            WITH x AS (
                SELECT user_id, event_type, ts, event_id,
                       CASE WHEN lag(event_type) OVER (
                                PARTITION BY user_id
                                ORDER BY ts, event_id)
                            IS DISTINCT FROM event_type
                            THEN 1 ELSE 0 END AS chg
                FROM events),
            y AS (
                SELECT *, sum(chg) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING)
                          AS run
                FROM x)
            SELECT user_id, run, event_type,
                   min(ts) AS first_ts, max(ts) AS last_ts,
                   count(*) AS n_events
            FROM y GROUP BY user_id, run, event_type
            ORDER BY user_id, run
        """,
    'q_events_unpivot': """
            WITH u AS (SELECT DISTINCT user_id FROM events),
            t AS (SELECT unnest(['click','error','purchase','signup',
                                 'view']) AS event_type),
            c AS (SELECT user_id, event_type, count(*) AS n
                  FROM events GROUP BY 1, 2)
            SELECT u.user_id, t.event_type,
                   CAST(coalesce(c.n, 0) AS BIGINT) AS n
            FROM u CROSS JOIN t
            LEFT JOIN c ON c.user_id = u.user_id
                       AND c.event_type = t.event_type
            ORDER BY u.user_id, t.event_type
        """,
    'q_events_geomean': """
            SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                   round(exp(avg(ln(value))), 6) AS geomean
            FROM events WHERE value > 0
            GROUP BY event_type ORDER BY event_type
        """,
    'q_events_dod_overlap': """
            WITH du AS (SELECT DISTINCT user_id,
                               date_trunc('day', ts) AS day
                        FROM events),
            daily AS (SELECT day, count(*) AS n_active FROM du
                      GROUP BY day),
            b AS (SELECT a.day + INTERVAL 1 DAY AS day,
                         count(*) AS n_both
                  FROM du a JOIN du c ON c.user_id = a.user_id
                       AND c.day = a.day + INTERVAL 1 DAY
                  GROUP BY 1)
            SELECT d.day, p.n_active AS n_active_prev, d.n_active,
                   CAST(coalesce(b.n_both, 0) AS BIGINT) AS n_both,
                   round(coalesce(b.n_both, 0) * 1.0
                         / (p.n_active + d.n_active
                            - coalesce(b.n_both, 0)), 6) AS jaccard
            FROM daily d
            JOIN daily p ON p.day = d.day - INTERVAL 1 DAY
            LEFT JOIN b ON b.day = d.day
            ORDER BY d.day
        """,
    'q_events_regression': """
            WITH c AS (
                SELECT event_type,
                       (min(epoch_us(ts)) + max(epoch_us(ts))) // 2
                           AS c
                FROM events GROUP BY event_type),
            e AS (
                SELECT ev.event_type,
                       (epoch_us(ev.ts) - c.c) / 86400000000.0 AS x,
                       ev.value AS y, c.c AS c
                FROM events ev JOIN c USING (event_type)),
            m AS (SELECT event_type, any_value(c) AS c,
                         CAST(count(*) AS DOUBLE) AS n,
                         sum(x) AS sx, sum(y) AS sy,
                         sum(x * x) AS sxx, sum(y * y) AS syy,
                         sum(x * y) AS sxy
                  FROM e GROUP BY event_type),
            f AS (SELECT event_type, n, c, sx, sy,
                         sxx - sx * sx / n AS vx,
                         syy - sy * sy / n AS vy,
                         sxy - sx * sy / n AS cov
                  FROM m)
            SELECT event_type, CAST(n AS BIGINT) AS n,
                   round(cov / vx, 6) AS slope,
                   round((sy / n - (cov / vx) * sx / n)
                         - (cov / vx)
                           * ((c - 788918400000000)
                              / 86400000000.0), 6) AS intercept,
                   round(cov * cov / (vx * vy), 6) AS r2
            FROM f ORDER BY event_type
        """,
    'q_events_moving_avg': """
            SELECT event_id, user_id,
                   round(avg(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6)
                       AS mavg
            FROM events ORDER BY event_id
        """,
    'q_events_markov': """
            WITH seq AS (
                SELECT user_id, event_type,
                       lead(event_type) OVER (
                           PARTITION BY user_id
                           ORDER BY ts, event_id) AS nxt
                FROM events),
            t AS (SELECT event_type AS prev_type, nxt AS next_type,
                         count(*) AS cnt
                  FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2)
            SELECT prev_type, next_type, CAST(cnt AS BIGINT) AS cnt,
                   round(cnt * 1.0 / sum(cnt) OVER
                             (PARTITION BY prev_type), 6) AS prob
            FROM t ORDER BY prev_type, next_type
        """,
}
ORACLE_REGISTRY.update(ORACLES)
