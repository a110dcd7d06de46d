"""Relational pipelines over the driver's TPC-H-ish tables.

These exercise the engine's core relational operators — pruned parquet
reads, vectorized filter/projection, grouped aggregation (the
partial/final combiner in ``jerex_ray.functions.aggregate``), hash and
broadcast joins, semi/anti joins via broadcast key sets,
tumbling-window aggregation, sort/top-k, distinct — each with an exact
DuckDB oracle (see ``__ray_entry__.oracle_sql``). Column names match
the oracle SQL aliases exactly (the driver hashes values under sorted
column names).

Join strategy follows data shape, not test-scale convenience: the
lineitem⋈orders join is a hash-partitioned ``Dataset.join`` (both
sides scale with the fact data), while nation/region/customer joins
broadcast the dimension side (bounded size at any scale).

Money-valued float aggregates are rounded to 2 decimals on BOTH sides:
distributed summation order makes the last float bits
non-deterministic, and the oracle compare is value-exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from jerex_ray.functions.aggregate import grouped_aggregate
from jerex_ray.functions.join import (broadcast_anti_join, broadcast_join,
                                      broadcast_semi_join)
from jerex_ray.runtime import read_parquet_sized, shuffle_partitions


def _read(sf_dir: str, table: str, columns=None):
    return read_parquet_sized(f"{sf_dir}/{table}.parquet", columns=columns)


def _round2(df: pd.DataFrame, cols) -> pd.DataFrame:
    for c in cols:
        df[c] = df[c].round(2)
    return df


# --- Q1-style pricing summary: filter + groupby agg + sort ---

def q1_pricing_summary(sf_dir: str):
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount", "l_shipdate"])
    cutoff = pa.scalar(pd.Timestamp("1998-09-02"), pa.timestamp("us"))

    def prep(t: pa.Table) -> pa.Table:
        # EXACT integer cents: qty/price carry ≤2 decimals, discount
        # exactly 2, so ×100 scaling is integral and the group sums are
        # order-independent integers — float summation order was the
        # one source of last-digit round(…,2) ties (seen at sf0.001).
        # The only floats are the final divide-then-round, identical
        # on both engines.
        t = t.filter(pc.less_equal(t["l_shipdate"], cutoff))
        q100 = pc.cast(pc.round(pc.multiply(t["l_quantity"],
                                            pa.scalar(100.0))),
                       pa.int64())
        p100 = pc.cast(pc.round(pc.multiply(t["l_extendedprice"],
                                            pa.scalar(100.0))),
                       pa.int64())
        d100 = pc.cast(pc.round(pc.multiply(t["l_discount"],
                                            pa.scalar(100.0))),
                       pa.int64())
        disc4 = pc.multiply(p100, pc.subtract(pa.scalar(100,
                                                        pa.int64()),
                                              d100))
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "qty100": q100,
            "price100": p100,
            "disc10000": disc4,
        })

    out = grouped_aggregate(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        {"sum_qty100": ("qty100", "sum"),
         "sum_base100": ("price100", "sum"),
         "sum_disc10000": ("disc10000", "sum"),
         "count_order": (None, "count")})
    df = out.to_pandas().sort_values(["l_returnflag", "l_linestatus"])
    df["count_order"] = df["count_order"].astype("int64")
    df["sum_qty"] = df["sum_qty100"] / 100.0
    df["sum_base_price"] = df["sum_base100"] / 100.0
    # half-cent ties are REAL here (cents × (100-disc) can end in 50):
    # round to cents in INTEGER arithmetic (half away from zero), so
    # numpy-banker's vs SQL-half-away never disagree
    df["sum_disc_price"] = ((df["sum_disc10000"] + 50) // 100) / 100.0
    return df[["l_returnflag", "l_linestatus", "sum_qty",
               "sum_base_price", "sum_disc_price", "count_order"]] \
        .reset_index(drop=True)


# --- fact-fact hash join + dimension broadcast join + agg + top-k ---

def q_top_customer_revenue(sf_dir: str, k: int = 10):
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount"])

    def rev(t: pa.Table) -> pa.Table:
        r = pc.multiply(t["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({"l_orderkey": t["l_orderkey"], "revenue": r})

    li = li.map_batches(rev, batch_format="pyarrow")
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    # both sides scale with the data → hash-partitioned Dataset.join
    j1 = li.join(orders, join_type="inner",
                 num_partitions=shuffle_partitions(8),
                 on=("l_orderkey",), right_on=("o_orderkey",))
    # customer is a dimension → broadcast
    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_name"]).to_pandas()
    j2 = broadcast_join(j1, cust, left_on="o_custkey", right_on="c_custkey")
    agg = grouped_aggregate(j2, ["c_name"], {"revenue": ("revenue", "sum")})
    df = agg.to_pandas()
    df["revenue"] = df["revenue"].round(2)
    df = df.sort_values(["revenue", "c_name"], ascending=[False, True]).head(k)
    return df.reset_index(drop=True)


# --- dimension broadcast join chain + count ---

def q_customers_per_region(sf_dir: str):
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    nation = _read(sf_dir, "nation",
                   ["n_nationkey", "n_regionkey"]).to_pandas()
    region = _read(sf_dir, "region",
                   ["r_regionkey", "r_name"]).to_pandas()
    dim = nation.merge(region, left_on="n_regionkey",
                       right_on="r_regionkey")[["n_nationkey", "r_name"]]
    j = broadcast_join(cust, dim, left_on="c_nationkey",
                       right_on="n_nationkey")
    df = grouped_aggregate(j, ["r_name"],
                           {"n_customers": (None, "count")}).to_pandas()
    df["n_customers"] = df["n_customers"].astype("int64")
    return df.sort_values("r_name").reset_index(drop=True)


# --- tumbling-window aggregate over the events stream table ---

def q_events_hourly(sf_dir: str):
    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["hour"] = df["ts"].dt.floor("h")
        return df[["event_type", "hour", "value"]]

    out = grouped_aggregate(
        ds.map_batches(bucket, batch_format="pandas"),
        ["event_type", "hour"],
        {"n_events": (None, "count"), "sum_value": ("value", "sum")})
    df = out.to_pandas().sort_values(["event_type", "hour"])
    df["n_events"] = df["n_events"].astype("int64")
    df["sum_value"] = df["sum_value"].round(2)
    return df.reset_index(drop=True)


# --- sort + limit (top-k with deterministic ties) ---

def q_priciest_parts(sf_dir: str, k: int = 5):
    ds = _read(sf_dir, "part", ["p_partkey", "p_name", "p_retailprice"])
    df = ds.to_pandas()
    df = df.sort_values(["p_retailprice", "p_partkey"],
                        ascending=[False, True]).head(k)
    return df.reset_index(drop=True)


# --- min/max/count aggregate per group ---

def q_supplier_balance(sf_dir: str):
    ds = _read(sf_dir, "supplier", ["s_nationkey", "s_acctbal"])
    out = grouped_aggregate(ds, ["s_nationkey"],
                            {"n_suppliers": (None, "count"),
                             "min_bal": ("s_acctbal", "min"),
                             "max_bal": ("s_acctbal", "max"),
                             "sum_bal": ("s_acctbal", "sum")})
    df = out.to_pandas().sort_values("s_nationkey")
    df["n_suppliers"] = df["n_suppliers"].astype("int64")
    return _round2(df, ["min_bal", "max_bal", "sum_bal"]).reset_index(drop=True)


# --- mean aggregate (sum/count pair through the combiner) ---

def q_segment_avg_balance(sf_dir: str):
    ds = _read(sf_dir, "customer", ["c_mktsegment", "c_acctbal"])

    def cents(t: pa.Table) -> pa.Table:
        # EXACT integer cents → order-independent sums; the 4-decimal
        # average is then rounded half-away in INTEGER arithmetic, so
        # numpy/SQL rounding modes can never disagree on a tie
        return pa.table({
            "c_mktsegment": t["c_mktsegment"],
            "bal100": pc.cast(pc.round(pc.multiply(
                t["c_acctbal"], pa.scalar(100.0))), pa.int64())})

    out = grouped_aggregate(ds.map_batches(cents, batch_format="pyarrow"),
                            ["c_mktsegment"],
                            {"n_customers": (None, "count"),
                             "sum100": ("bal100", "sum")})
    df = out.to_pandas().sort_values("c_mktsegment")
    n = df["n_customers"].astype("int64")
    s = df["sum100"].astype("int64") * 100          # 1e-4 units × n
    avg4 = np.sign(s) * ((2 * s.abs() + n) // (2 * n))
    df["n_customers"] = n
    df["avg_bal"] = avg4 / 10000.0
    return df[["c_mktsegment", "n_customers", "avg_bal"]] \
        .reset_index(drop=True)


# --- distinct (shuffle dedup) ---

def q_distinct_segments(sf_dir: str):
    ds = _read(sf_dir, "customer", ["c_mktsegment"])
    df = grouped_aggregate(ds, ["c_mktsegment"],
                           {"n": (None, "count")}).to_pandas()
    return pd.DataFrame({"c_mktsegment": sorted(df["c_mktsegment"])})


# --- filter + projection pushed to the read ---

def q_urgent_orders(sf_dir: str):
    ds = read_parquet_sized(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"],
        filter=(pc.field("o_orderpriority") == "1-URGENT"))
    df = ds.to_pandas()
    df["o_totalprice"] = df["o_totalprice"].round(2)
    return df.sort_values("o_orderkey").reset_index(drop=True)


# --- TPC-H Q3 shape: selective dim filter + two-fact hash join + agg ---

def q_building_revenue(sf_dir: str, k: int = 10):
    """Shipping-priority style query: BUILDING-segment orders placed
    before a date, revenue from lineitems shipped after it. Filters
    and projections push to the reads; customer is a broadcast
    dimension (filtered FIRST — only matching custkeys ship), the
    lineitem⋈orders fact join is hash-partitioned."""
    cutoff = pd.Timestamp("1998-06-01")
    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_mktsegment"]).to_pandas()
    building = set(cust.loc[cust["c_mktsegment"] == "BUILDING",
                            "c_custkey"])
    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pc.field("o_orderdate") < pa.scalar(cutoff,
                                                    pa.timestamp("us"))))
    orders = broadcast_semi_join(orders, building, on="o_custkey")
    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_shipdate"],
        filter=(pc.field("l_shipdate") > pa.scalar(cutoff,
                                                   pa.timestamp("us"))))

    def rev(t: pa.Table) -> pa.Table:
        r = pc.multiply(t["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({"l_orderkey": t["l_orderkey"], "revenue": r})

    j = li.map_batches(rev, batch_format="pyarrow").join(
        orders, join_type="inner",
        num_partitions=shuffle_partitions(8),
        on=("l_orderkey",), right_on=("o_orderkey",))
    agg = grouped_aggregate(j, ["l_orderkey", "o_orderdate"],
                            {"revenue": ("revenue", "sum")})
    df = agg.to_pandas()
    df["revenue"] = df["revenue"].round(2)
    df = df.sort_values(["revenue", "l_orderkey"],
                        ascending=[False, True]).head(k)
    return df[["l_orderkey", "o_orderdate", "revenue"]] \
        .reset_index(drop=True)


# --- semi / anti join via broadcast key set (guide §Joins) ---

def _order_custkeys(sf_dir: str) -> set:
    df = grouped_aggregate(_read(sf_dir, "orders", ["o_custkey"]),
                           ["o_custkey"], {"n": (None, "count")}).to_pandas()
    return set(df["o_custkey"])


def q_customers_without_orders(sf_dir: str):
    """Anti join: customers having no orders (broadcast key set)."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    df = broadcast_anti_join(cust, _order_custkeys(sf_dir),
                             on="c_custkey").to_pandas()
    if df.empty:  # empty Dataset → schema-less frame; restore columns
        return pd.DataFrame({"c_custkey": pd.Series(dtype="int64"),
                             "c_name": pd.Series(dtype="object")})
    return df.sort_values("c_custkey").reset_index(drop=True)


def q_customers_with_orders_count(sf_dir: str):
    """Semi join + count: number of customers that placed orders."""
    cust = _read(sf_dir, "customer", ["c_custkey"])
    n = broadcast_semi_join(cust, _order_custkeys(sf_dir),
                            on="c_custkey").count()
    return pd.DataFrame({"n_customers": [n]})


def global_rank(ds, *, value_col: str, id_col: str,
                num_buckets: int = 64,
                num_partitions: int | None = None):
    """Global ORDER BY row number (dense 0-based rank by
    ``(value_col, id_col)``) without ever sorting the corpus in one
    place — the distributed sort-rank shape:

    1. exact quantile pivots of ``value_col`` (the shuffle-free
       three-pass selector, ``ops/quantiles.py``) define range buckets;
    2. one combiner pass counts rows per bucket → bucket offsets
       (driver-side, ``num_buckets`` scalars);
    3. rows hash-co-locate by bucket; each block sorts its complete
       buckets locally and adds the bucket's global offset.

    Equal values always share a bucket (searchsorted on value only),
    so the in-bucket ``(value, id)`` sort makes ranks exact and ties
    deterministic. SQL parity: ``row_number() OVER (ORDER BY value,
    id) - 1``."""
    import ray

    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply
    from jerex_ray.ops.quantiles import distributed_quantiles

    qs = [i / num_buckets for i in range(1, num_buckets)]
    pivots = np.unique(np.asarray(
        distributed_quantiles(ds, value_col, qs), dtype=np.float64))
    piv_ref = ray.put(pivots)

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        p = ray.get(piv_ref)
        out = df.copy()
        out["__bucket"] = np.searchsorted(
            p, df[value_col].to_numpy(np.float64), side="left") \
            .astype(np.int64)
        return out

    bucketed = ds.map_batches(with_bucket, batch_format="pandas",
                              batch_size=65536).materialize()
    counts = grouped_aggregate(bucketed, ["__bucket"],
                               {"n": (None, "count")}).to_pandas()
    counts = counts.sort_values("__bucket")
    offsets = dict(zip(
        counts["__bucket"].astype(int),
        np.concatenate(([0], np.cumsum(counts["n"].to_numpy())[:-1]))
        .astype(np.int64)))
    off_ref = ray.put(offsets)

    def rank_block(block: pd.DataFrame) -> pd.DataFrame:
        offs = ray.get(off_ref)
        parts = []
        for b, sub in block.groupby("__bucket", sort=False):
            sub = sub.sort_values([value_col, id_col])
            sub = sub.drop(columns=["__bucket"])
            sub["rnk"] = offs[int(b)] + np.arange(len(sub),
                                                  dtype=np.int64)
            parts.append(sub)
        return pd.concat(parts, ignore_index=True) if parts \
            else block.drop(columns=["__bucket"]).assign(
                rnk=pd.Series(dtype="int64"))

    return grouped_apply(bucketed, ["__bucket"], rank_block,
                         num_partitions=num_partitions)


# --- TPC-H Q5 shape: 6-table join with a cross-fact equality predicate ---

def q5_regional_supplier_revenue(sf_dir: str, *, region: str = "ASIA",
                                 year: int = 1996):
    """Revenue per nation where the ordering customer and the supplying
    supplier share a nation inside one region (the TPC-H Q5 shape:
    customer ⋈ orders ⋈ lineitem ⋈ supplier ⋈ nation ⋈ region).

    Join strategy by data shape: lineitem⋈orders is the fact-fact
    hash-partitioned join; supplier/customer/nation/region are
    dimensions (bounded at any scale) and broadcast. The
    c_nationkey = s_nationkey predicate is a vectorized post-join
    filter — it cannot prune the fact join (either side alone doesn't
    determine it), exactly like the reference SQL plan. The orders date
    filter prunes at the read side before the wide join."""
    lo = pd.Timestamp(f"{year}-01-01")
    hi = pd.Timestamp(f"{year + 1}-01-01")
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"])
    orders = orders.map_batches(
        lambda df: df[(df["o_orderdate"] >= lo) & (df["o_orderdate"] < hi)]
        [["o_orderkey", "o_custkey"]],
        batch_format="pandas")

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])

    def rev(t: pa.Table) -> pa.Table:
        r = pc.multiply(t["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "l_suppkey": t["l_suppkey"], "revenue": r})

    li = li.map_batches(rev, batch_format="pyarrow")
    j = li.join(orders, join_type="inner",
                num_partitions=shuffle_partitions(8),
                on=("l_orderkey",), right_on=("o_orderkey",))

    # dimension sides: nation⋈region filtered to the target region
    nation = _read(sf_dir, "nation",
                   ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    nat = nation.merge(reg[reg["r_name"] == region], left_on="n_regionkey",
                       right_on="r_regionkey")[["n_nationkey", "n_name"]]
    supp = _read(sf_dir, "supplier",
                 ["s_suppkey", "s_nationkey"]).to_pandas()
    # suppliers restricted to the region up front (semi-join pushdown)
    supp = supp.merge(nat, left_on="s_nationkey", right_on="n_nationkey") \
        [["s_suppkey", "s_nationkey", "n_name"]]
    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey"]).to_pandas()

    j = broadcast_join(j, supp, left_on="l_suppkey", right_on="s_suppkey")
    j = broadcast_join(j, cust, left_on="o_custkey", right_on="c_custkey")
    j = j.map_batches(
        lambda df: df[df["c_nationkey"] == df["s_nationkey"]]
        [["n_name", "revenue"]],
        batch_format="pandas")
    df = grouped_aggregate(j, ["n_name"],
                           {"revenue": ("revenue", "sum")}).to_pandas()
    df = _round2(df, ["revenue"])
    return df.sort_values(["revenue", "n_name"],
                          ascending=[False, True]).reset_index(drop=True)


# --- ROLLUP: multi-level grouped aggregation from the finest level ---

def q_revenue_rollup(sf_dir: str):
    """Order revenue by (region, nation) with ROLLUP totals — the
    (r_name, n_name), (r_name), and grand-total levels in one result,
    NULL levels rendered as 'ALL'.

    Scale shape: only the FINEST level aggregates over the fact table
    (one distributed combiner + shuffle); every coarser level
    re-aggregates the finest RESULT, which is dimension-bounded
    (|regions × nations|), on the driver. This is the standard rollup
    decomposition — no second pass over the data."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey"]).to_pandas()
    nation = _read(sf_dir, "nation",
                   ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    dim = (cust.merge(nation, left_on="c_nationkey", right_on="n_nationkey")
               .merge(reg, left_on="n_regionkey", right_on="r_regionkey")
           [["c_custkey", "n_name", "r_name"]])
    j = broadcast_join(orders, dim, left_on="o_custkey",
                       right_on="c_custkey")
    finest = grouped_aggregate(j, ["r_name", "n_name"],
                               {"revenue": ("o_totalprice", "sum")}) \
        .to_pandas()
    lvl1 = finest.groupby("r_name", as_index=False)["revenue"].sum()
    lvl1["n_name"] = "ALL"
    total = pd.DataFrame({"r_name": ["ALL"], "n_name": ["ALL"],
                          "revenue": [finest["revenue"].sum()]})
    out = pd.concat([finest, lvl1[["r_name", "n_name", "revenue"]], total],
                    ignore_index=True)
    out = _round2(out, ["revenue"])
    return out.sort_values(["r_name", "n_name"]).reset_index(drop=True)


# --- set operations: INTERSECT / EXCEPT via a distributed presence agg ---

def q_user_presence(sf_dir: str):
    """Classify every user id as 'both' / 'events_only' / 'orders_only'
    — the INTERSECT and both EXCEPT directions of the two distinct key
    sets in ONE dataflow: tag each side with presence indicator
    columns, union the (potentially corpus-sized) streams, and take a
    grouped max of the indicators. No driver-side sets, no broadcast —
    set semantics reduce to one combiner-backed groupby."""
    events = _read(sf_dir, "events", ["user_id"])
    orders = _read(sf_dir, "orders", ["o_custkey"])

    def tag(col, e, o):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            u = df[col].drop_duplicates()    # per-batch combiner
            return pd.DataFrame({"user_id": u.to_numpy(),
                                 "e": np.int64(e), "o": np.int64(o)})
        return fn

    tagged = events.map_batches(tag("user_id", 1, 0),
                                batch_format="pandas") \
        .union(orders.map_batches(tag("o_custkey", 0, 1),
                                  batch_format="pandas"))
    agg = grouped_aggregate(tagged, ["user_id"],
                            {"e": ("e", "max"), "o": ("o", "max")})

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        tagv = np.where(df["e"].to_numpy() > 0,
                        np.where(df["o"].to_numpy() > 0,
                                 "both", "events_only"),
                        "orders_only")
        return pd.DataFrame({"user_id": df["user_id"].to_numpy(),
                             "tag": tagv})

    df = agg.map_batches(classify, batch_format="pandas").to_pandas()
    df["user_id"] = df["user_id"].astype("int64")
    return df.sort_values(["user_id", "tag"]).reset_index(drop=True)


# --- TPC-H Q18 shape: HAVING-filtered aggregate joined back to facts ---

def q18_large_volume_orders(sf_dir: str, *, min_qty: float = 250.0):
    """Orders whose total line quantity exceeds ``min_qty``, with the
    ordering customer (the TPC-H Q18 shape: aggregate → HAVING filter
    → join back to the fact and dimension tables).

    Scale shape: the per-order quantity aggregate is combiner-backed
    and stays a Dataset (order count is fact-scale); the HAVING filter
    is a vectorized map, and the surviving keys rejoin ``orders`` via
    a hash-partitioned ``Dataset.join`` — survivor cardinality is
    data-dependent, so no broadcast is assumed. Customer is the one
    dimension broadcast."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
    per_order = grouped_aggregate(li, ["l_orderkey"],
                                  {"sum_qty": ("l_quantity", "sum")},
                                  result_hint="large")
    big = per_order.map_batches(
        lambda df: df[df["sum_qty"] > min_qty], batch_format="pandas")
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_totalprice"])
    j = big.join(orders, join_type="inner",
                 num_partitions=shuffle_partitions(8),
                 on=("l_orderkey",), right_on=("o_orderkey",))
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"]).to_pandas()
    j = broadcast_join(j, cust, left_on="o_custkey", right_on="c_custkey")
    # Dataset.join drops the right-side key column (it equals the left
    # key); surface the surviving l_orderkey under the output name
    df = j.to_pandas().rename(columns={"l_orderkey": "o_orderkey"})
    df = df[["c_name", "o_orderkey", "o_totalprice", "sum_qty"]]
    df = _round2(df, ["o_totalprice", "sum_qty"])
    df["o_orderkey"] = df["o_orderkey"].astype("int64")
    return df.sort_values(["o_totalprice", "o_orderkey"],
                          ascending=[False, True]).reset_index(drop=True)


# --- Q4 shape: EXISTS semi-join with a correlated date predicate ---

def q4_order_priority(sf_dir: str, *, quarter_start: str = "1996-01-01"):
    """Order-priority checking (the TPC-H Q4 shape): count orders per
    priority placed in one quarter that have at least one LATE line
    (shipped > 30 days after the order date). The EXISTS predicate
    correlates with ``o_orderdate``, so it cannot become a broadcast
    key-set semi-join: the quarter's orders hash-join lineitem once,
    the lateness filter is vectorized, and DISTINCT order survivors
    reduce through the key-only combiner before the tiny priority
    count."""
    lo = pd.Timestamp(quarter_start)
    hi = lo + pd.DateOffset(months=3)
    late_after = pd.Timedelta(days=30)
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderdate", "o_orderpriority"])
    orders = orders.map_batches(
        lambda df: df[(df["o_orderdate"] >= lo) & (df["o_orderdate"] < hi)],
        batch_format="pandas")
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    j = orders.join(li, join_type="inner",
                    num_partitions=shuffle_partitions(8),
                    on=("o_orderkey",), right_on=("l_orderkey",))
    j = j.map_batches(
        lambda df: df.loc[df["l_shipdate"] > df["o_orderdate"] + late_after,
                          ["o_orderkey", "o_orderpriority"]],
        batch_format="pandas")
    distinct = grouped_aggregate(j, ["o_orderkey", "o_orderpriority"],
                                 {"n": (None, "count")},
                                 result_hint="large")
    out = grouped_aggregate(distinct, ["o_orderpriority"],
                            {"order_count": (None, "count")}).to_pandas()
    out["order_count"] = out["order_count"].astype("int64")
    return out.sort_values("o_orderpriority").reset_index(drop=True)


# --- Q6 shape: pure filter + scalar aggregate (no shuffle at all) ---

def q6_forecast_revenue(sf_dir: str, *, year: int = 1997):
    """Forecasting-revenue-change (the TPC-H Q6 shape): one pruned
    scan, three vectorized predicates, and a scalar sum — the
    degenerate aggregate where the combiner reduces everything to one
    number per block and the driver adds a handful of partials. No
    shuffle anywhere."""
    lo = pa.scalar(pd.Timestamp(f"{year}-01-01"), pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp(f"{year + 1}-01-01"), pa.timestamp("us"))

    def partial(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.and_(pc.greater_equal(t["l_shipdate"], lo),
                            pc.less(t["l_shipdate"], hi)),
                    pc.and_(pc.and_(pc.greater_equal(t["l_discount"], pa.scalar(0.05)),
                                    pc.less_equal(t["l_discount"], pa.scalar(0.07))),
                            pc.less(t["l_quantity"], pa.scalar(24.0))))
        t = t.filter(m)
        s = pc.sum(pc.multiply(t["l_extendedprice"], t["l_discount"]))
        v = 0.0 if s.as_py() is None else float(s.as_py())
        return pa.table({"part": pa.array([v], pa.float64())})

    ds = _read(sf_dir, "lineitem",
               ["l_shipdate", "l_discount", "l_quantity",
                "l_extendedprice"])
    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return pd.DataFrame({"revenue": [round(float(parts["part"].sum()), 2)]})


# --- Q14 shape: broadcast dimension join + conditional aggregate ---

def q14_promo_revenue(sf_dir: str, *, month_start: str = "1997-03-01"):
    """Promotion-effect (the TPC-H Q14 shape): share of one month's
    revenue from PROMO-type parts. Part is the broadcast dimension
    (only p_partkey/p_type ship); the conditional sum reduces to two
    scalars per block — the whole month collapses without a shuffle."""
    lo = pd.Timestamp(month_start)
    hi = lo + pd.DateOffset(months=1)
    part = _read(sf_dir, "part", ["p_partkey", "p_type"]).to_pandas()
    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_shipdate", "l_extendedprice",
                "l_discount"])
    li = li.map_batches(
        lambda df: df[(df["l_shipdate"] >= lo) & (df["l_shipdate"] < hi)],
        batch_format="pandas")
    j = broadcast_join(li, part, left_on="l_partkey", right_on="p_partkey")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rev = df["l_extendedprice"].to_numpy() \
            * (1.0 - df["l_discount"].to_numpy())
        promo = rev[(df["p_type"] == "PROMO").to_numpy()].sum()
        return pd.DataFrame({"promo": [promo], "total": [rev.sum()]})

    parts = j.map_batches(partial, batch_format="pandas").to_pandas()
    total = float(parts["total"].sum())
    promo = float(parts["promo"].sum())
    share = 0.0 if total == 0 else 100.0 * promo / total
    return pd.DataFrame({"promo_share": [round(share, 6)]})


# --- Q15 shape: aggregate → global argmax (with ties) → join back ---

def q15_top_supplier(sf_dir: str, *, quarter_start: str = "1996-01-01"):
    """Top-supplier (the TPC-H Q15 shape): per-supplier revenue for a
    quarter, then every supplier tied at the maximum. The revenue
    aggregate is combiner-backed; the argmax is a two-scalar reduce
    over block maxima (never a sort), and only the tied survivors
    join the supplier dimension. Revenue rounds to 2 decimals BEFORE
    the max comparison on both engine and oracle sides — float sum
    order must not decide the winner."""
    lo = pd.Timestamp(quarter_start)
    hi = lo + pd.DateOffset(months=3)
    li = _read(sf_dir, "lineitem",
               ["l_suppkey", "l_shipdate", "l_extendedprice",
                "l_discount"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        df = df[(df["l_shipdate"] >= lo) & (df["l_shipdate"] < hi)]
        return pd.DataFrame({
            "l_suppkey": df["l_suppkey"].to_numpy(),
            "rev": df["l_extendedprice"].to_numpy()
            * (1.0 - df["l_discount"].to_numpy())})

    rev = grouped_aggregate(li.map_batches(prep, batch_format="pandas"),
                            ["l_suppkey"], {"total_revenue": ("rev", "sum")})
    rev = rev.map_batches(
        lambda df: df.assign(total_revenue=df["total_revenue"].round(2)),
        batch_format="pandas")
    blocks = rev.map_batches(
        lambda df: pd.DataFrame(
            {"m": [df["total_revenue"].max() if len(df) else float("-inf")]}),
        batch_format="pandas", batch_size=None).to_pandas()
    if blocks.empty:
        return pd.DataFrame({"s_suppkey": pd.Series(dtype="int64"),
                             "s_name": pd.Series(dtype="object"),
                             "total_revenue": pd.Series(dtype="float64")})
    mx = float(blocks["m"].max())
    top = rev.map_batches(
        lambda df: df[df["total_revenue"] == mx], batch_format="pandas")
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_name"]).to_pandas()
    out = broadcast_join(top, supp, left_on="l_suppkey",
                         right_on="s_suppkey").to_pandas()
    out = out.rename(columns={"l_suppkey": "s_suppkey"})
    out["s_suppkey"] = out["s_suppkey"].astype("int64")
    return out[["s_suppkey", "s_name", "total_revenue"]] \
        .sort_values("s_suppkey").reset_index(drop=True)


# --- UNPIVOT: wide → long reshape as a streaming batch transform ---

def melt(ds, *, id_cols: list[str], value_cols: list[str],
         var_name: str = "variable", value_name: str = "value"):
    """UNPIVOT (the inverse of the conditional-aggregation pivot):
    each row explodes into len(value_cols) rows. Purely row-local —
    a vectorized per-batch reshape, no shuffle, streams at any
    scale."""
    def m(df: pd.DataFrame) -> pd.DataFrame:
        return df.melt(id_vars=id_cols, value_vars=value_cols,
                       var_name=var_name, value_name=value_name)

    return ds.map_batches(m, batch_format="pandas")


# --- 2-D skyline (Pareto frontier) ---

def skyline_2d(ds, *, min_col: str, max_col: str) -> pd.DataFrame:
    """2-D skyline: rows no other row dominates (other.min_col ≤ and
    other.max_col ≥ with at least one strict). Börzsönyi et al.'s
    block-nested-loop shape made distributive: dominance is transitive
    and closed under union, so each block first prunes to its OWN
    frontier — sort unique coordinate pairs by (min_col asc, max_col
    desc) and keep points whose max_col strictly beats the running max
    of every earlier point (earlier = weakly better on min_col) — then
    one final identical prune over the unioned survivors. Survivors of
    a random block are O(log n), so the union is driver-safe at any
    block count; the per-block prune is two vectorized sorts, no pair
    loop. Duplicate coordinate pairs all survive (equal points never
    dominate each other); rows with NaN in either column are dropped
    (dominance is undefined against NaN)."""

    def local_skyline(df: pd.DataFrame) -> pd.DataFrame:
        df = df.dropna(subset=[min_col, max_col])
        if df.empty:
            return df
        u = df[[min_col, max_col]].drop_duplicates() \
            .sort_values([min_col, max_col], ascending=[True, False])
        y = u[max_col].to_numpy(dtype=np.float64)
        prev = np.concatenate(([-np.inf],
                               np.maximum.accumulate(y)[:-1]))
        kept = u[y > prev]
        # re-attach every row carrying a surviving coordinate pair
        return df.merge(kept, on=[min_col, max_col], how="inner")

    cand = ds.map_batches(local_skyline, batch_format="pandas") \
        .to_pandas()
    return local_skyline(cand).reset_index(drop=True)


# --- Q10 shape: quarter's returned-item revenue loss per customer ---

def q10_returned_items(sf_dir: str, *, quarter_start: str = "1996-01-01",
                       k: int = 20):
    """Returned-item reporting (the TPC-H Q10 shape): revenue lost to
    'R'-flagged lineitems of one quarter's orders, per customer, top-k.

    Scale shape: both fact reads are pruned AND filtered at the scan
    (returnflag pushdown on lineitem, the quarter window on orders);
    the fact-fact join is hash-partitioned; customer/nation are
    broadcast dimensions attached only to the aggregated per-customer
    rows (customer-cardinality, not fact-cardinality)."""
    lo = pd.Timestamp(quarter_start)
    hi = lo + pd.DateOffset(months=3)
    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"],
        filter=((pc.field("o_orderdate")
                 >= pa.scalar(lo, pa.timestamp("us")))
                & (pc.field("o_orderdate")
                   < pa.scalar(hi, pa.timestamp("us")))))
    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=(pc.field("l_returnflag") == "R"))

    def rev(t: pa.Table) -> pa.Table:
        r = pc.multiply(t["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({"l_orderkey": t["l_orderkey"], "revenue": r})

    j = li.map_batches(rev, batch_format="pyarrow").join(
        orders, join_type="inner",
        num_partitions=shuffle_partitions(8),
        on=("l_orderkey",), right_on=("o_orderkey",))
    per_cust = grouped_aggregate(j, ["o_custkey"],
                                 {"revenue": ("revenue", "sum")})
    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_name", "c_acctbal",
                  "c_nationkey"]).to_pandas()
    nat = _read(sf_dir, "nation",
                ["n_nationkey", "n_name"]).to_pandas()
    cust = cust.merge(nat, left_on="c_nationkey",
                      right_on="n_nationkey")
    df = broadcast_join(per_cust, cust, left_on="o_custkey",
                        right_on="c_custkey").to_pandas()
    df["revenue"] = df["revenue"].round(2)
    df["c_custkey"] = df["o_custkey"].astype("int64")
    df = df.sort_values(["revenue", "c_custkey"],
                        ascending=[False, True]).head(k)
    return df[["c_custkey", "c_name", "revenue", "c_acctbal",
               "n_name"]].reset_index(drop=True)


# --- Q13 shape: order-count distribution incl. zero-order customers ---

def q13_order_distribution(sf_dir: str):
    """Customer distribution (the TPC-H Q13 shape): how many customers
    placed exactly N orders, INCLUDING the zero-order bucket. Order
    counts per customer reduce through the combiner (fact → customer
    cardinality); the second groupby is over tiny count values. The
    zero bucket is the one driver-side scalar: total customers minus
    customers that ordered (two counts, no outer join of the fact
    table against the dimension)."""
    per_cust = grouped_aggregate(
        _read(sf_dir, "orders", ["o_custkey"]),
        ["o_custkey"], {"c_count": (None, "count")},
        result_hint="large")
    dist = grouped_aggregate(per_cust, ["c_count"],
                             {"custdist": (None, "count")}).to_pandas()
    n_customers = _read(sf_dir, "customer", ["c_custkey"]).count()
    n_with = int(dist["custdist"].sum())
    if n_customers > n_with:
        dist = pd.concat([dist, pd.DataFrame(
            {"c_count": [0], "custdist": [n_customers - n_with]})],
            ignore_index=True)
    dist["c_count"] = dist["c_count"].astype("int64")
    dist["custdist"] = dist["custdist"].astype("int64")
    return dist.sort_values(["custdist", "c_count"],
                            ascending=[False, False]) \
        .reset_index(drop=True)


# --- Q7 shape: volume shipping between two nations by year ---

def q7_nation_volume(sf_dir: str, *, nation_a: str = "NATION_3",
                     nation_b: str = "NATION_8",
                     year_lo: int = 1996, year_hi: int = 1997):
    """Volume shipping (the TPC-H Q7 shape): revenue between two
    nations per (supplier nation, customer nation, ship year), both
    directions. Supplier and customer nation lookups are broadcast
    maps restricted to the two nations (their semi-join filters both
    facts BEFORE the hash join); only the pruned, revenue-projected
    lineitem rows and the nation-filtered orders shuffle."""
    lo = pa.scalar(pd.Timestamp(f"{year_lo}-01-01"), pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp(f"{year_hi + 1}-01-01"),
                   pa.timestamp("us"))
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    nat = nat[nat["n_name"].isin([nation_a, nation_b])]
    sup = _read(sf_dir, "supplier",
                ["s_suppkey", "s_nationkey"]).to_pandas()
    sup = sup.merge(nat, left_on="s_nationkey", right_on="n_nationkey")
    sup = sup[["s_suppkey", "n_name"]].rename(
        columns={"n_name": "supp_nation"})
    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey"]).to_pandas()
    cust = cust.merge(nat, left_on="c_nationkey",
                      right_on="n_nationkey")
    cust = cust[["c_custkey", "n_name"]].rename(
        columns={"n_name": "cust_nation"})

    _o_schema = pa.schema([("o_orderkey", pa.int64()),
                           ("cust_nation", pa.string())])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    orders = broadcast_join(orders, cust, left_on="o_custkey",
                            right_on="c_custkey") \
        .select_columns(["o_orderkey", "cust_nation"]) \
        .map_batches(lambda t: t.cast(_o_schema), batch_format="pyarrow")
    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount", "l_shipdate"],
        filter=((pc.field("l_shipdate") >= lo)
                & (pc.field("l_shipdate") < hi)))

    def rev(t: pa.Table) -> pa.Table:
        r = pc.multiply(t["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "l_suppkey": t["l_suppkey"],
                         "l_year": pc.year(t["l_shipdate"]),
                         "revenue": r})

    # cast both join inputs to explicit arrow schemas: the broadcast
    # merge emits pandas object-dtype string columns, and an all-empty
    # block surfaces SCHEMA-LESS through Dataset.join (pyarrow "No
    # match for key field" in aggregator finalize — round-2/3 notes);
    # materialize so the join sees settled, typed blocks
    _l_schema = pa.schema([("l_orderkey", pa.int64()),
                           ("l_suppkey", pa.int64()),
                           ("l_year", pa.int64()),
                           ("revenue", pa.float64()),
                           ("supp_nation", pa.string())])
    li = broadcast_join(li.map_batches(rev, batch_format="pyarrow"),
                        sup, left_on="l_suppkey", right_on="s_suppkey") \
        .map_batches(lambda t: t.cast(_l_schema),
                     batch_format="pyarrow").materialize()
    orders = orders.materialize()
    j = li.join(orders, join_type="inner",
                num_partitions=shuffle_partitions(8),
                on=("l_orderkey",), right_on=("o_orderkey",))
    j = j.map_batches(
        lambda df: df[df["supp_nation"] != df["cust_nation"]],
        batch_format="pandas")
    out = grouped_aggregate(j, ["supp_nation", "cust_nation", "l_year"],
                            {"revenue": ("revenue", "sum")}).to_pandas()
    out["revenue"] = out["revenue"].round(2)
    out["l_year"] = out["l_year"].astype("int64")
    return out.sort_values(["supp_nation", "cust_nation", "l_year"]) \
        .reset_index(drop=True)


# --- Q22 shape: above-average idle balances per nation ---

def q22_idle_balance(sf_dir: str, *, since: str = "2000-01-01"):
    """Global-sales-opportunity (the TPC-H Q22 shape): customers whose
    balance beats the average POSITIVE balance and who placed no order
    since ``since`` (this corpus has no fully order-less customers, so
    the anti-join is windowed to stay non-trivial), counted and summed
    per nation. The average threshold is compared in exact integer
    cents cross-multiplied by the count (balance·n > Σcents), so the
    Ray partial-sum order and the SQL aggregate agree bit-for-bit — no
    float-boundary hazard. The recent-orders key set is the anti-join
    broadcast (distinct custkeys are customer-bounded)."""
    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_acctbal", "c_nationkey"])

    def cents_partial(df: pd.DataFrame) -> pd.DataFrame:
        c = np.round(df["c_acctbal"].to_numpy(np.float64) * 100) \
            .astype(np.int64)
        pos = c[c > 0]
        return pd.DataFrame({"s": [int(pos.sum())],
                             "n": [int(len(pos))]})

    parts = cust.map_batches(cents_partial,
                             batch_format="pandas").to_pandas()
    sum_cents, n_pos = int(parts["s"].sum()), int(parts["n"].sum())

    recent = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"],
        filter=(pc.field("o_orderdate")
                >= pa.scalar(pd.Timestamp(since), pa.timestamp("us"))))
    ordered = set(grouped_aggregate(
        recent, ["o_custkey"],
        {"n": (None, "count")}).to_pandas()["o_custkey"])
    rich = broadcast_anti_join(cust, ordered, on="c_custkey")
    rich = rich.map_batches(
        lambda df: df[np.round(df["c_acctbal"].to_numpy(np.float64)
                               * 100).astype(np.int64) * n_pos
                      > sum_cents],
        batch_format="pandas")
    agg = grouped_aggregate(rich, ["c_nationkey"],
                            {"numcust": (None, "count"),
                             "totacctbal": ("c_acctbal", "sum")}) \
        .to_pandas()
    if agg.empty or "c_nationkey" not in agg.columns:
        return pd.DataFrame({"n_name": pd.Series(dtype="object"),
                             "numcust": pd.Series(dtype="int64"),
                             "totacctbal": pd.Series(dtype="float64")})
    nat = _read(sf_dir, "nation",
                ["n_nationkey", "n_name"]).to_pandas()
    agg = agg.merge(nat, left_on="c_nationkey", right_on="n_nationkey")
    agg["numcust"] = agg["numcust"].astype("int64")
    agg["totacctbal"] = agg["totacctbal"].round(2)
    return agg[["n_name", "numcust", "totacctbal"]] \
        .sort_values("n_name").reset_index(drop=True)


# --- Q3 shape: segment-filtered 3-way join + per-order revenue top-k ---

def q3_shipping_priority(sf_dir: str, *, segment: str = "BUILDING",
                         cutoff: str = "1998-06-01", k: int = 10):
    """Shipping-priority (the TPC-H Q3 shape): unshipped revenue per
    order for one market segment — orders placed before the cutoff
    whose lines ship after it, top-k by revenue.

    Scale shape: the segment's customer keys are a broadcast semi-join
    (customer is dimension-sized), both date filters are vectorized at
    the pruned reads, and the one fact–fact exchange is the
    hash-partitioned orders⋈lineitem join; per-order revenue reduces
    through the combiner before the tiny driver-side head."""
    cut = pd.Timestamp(cutoff)
    seg = _read(sf_dir, "customer",
                ["c_custkey", "c_mktsegment"]).to_pandas()
    seg_keys = set(seg.loc[seg["c_mktsegment"] == segment, "c_custkey"])
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"])
    orders = orders.map_batches(
        lambda df: df[df["o_orderdate"] < cut], batch_format="pandas")
    orders = broadcast_semi_join(orders, seg_keys, on="o_custkey")
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount",
                "l_shipdate"])

    def rev(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_shipdate"],
                                pa.scalar(cut, pa.timestamp("us"))))
        r = pc.multiply(t["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({"l_orderkey": t["l_orderkey"], "revenue": r})

    li = li.map_batches(rev, batch_format="pyarrow")
    j = li.join(orders, join_type="inner",
                num_partitions=shuffle_partitions(8),
                on=("l_orderkey",), right_on=("o_orderkey",))
    agg = grouped_aggregate(j, ["l_orderkey", "o_orderdate"],
                            {"revenue": ("revenue", "sum")},
                            result_hint="large").to_pandas()
    agg = agg.rename(columns={"l_orderkey": "o_orderkey"})
    agg["revenue"] = agg["revenue"].round(2)
    agg["o_orderkey"] = agg["o_orderkey"].astype("int64")
    agg = agg.sort_values(["revenue", "o_orderkey"],
                          ascending=[False, True]).head(k)
    return agg[["o_orderkey", "revenue", "o_orderdate"]] \
        .reset_index(drop=True)


# --- Q8 shape: one nation's market share within a region, by year ---

def q8_market_share(sf_dir: str, *, region: str = "ASIA",
                    nation: str = "NATION_12", ptype: str = "PROMO"):
    """National market share (the TPC-H Q8 shape): for orders from
    customers in one region on parts of one type, the yearly share of
    revenue supplied by one nation.

    Scale shape: every non-fact input (region→nation→customer chain,
    part type keys, supplier→nation flags) broadcasts as key sets /
    dicts; lineitem⋈orders is the single hash-partitioned fact
    exchange; the share is a conditional-sum / sum aggregate reduced
    per year through the combiner, so only (year, 2 floats) partials
    reach the driver."""
    nat = _read(sf_dir, "nation",
                ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region",
                ["r_regionkey", "r_name"]).to_pandas()
    nat = nat.merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    region_nations = set(nat.loc[nat["r_name"] == region, "n_nationkey"])
    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey"]).to_pandas()
    cust_keys = set(
        cust.loc[cust["c_nationkey"].isin(region_nations), "c_custkey"])
    part = _read(sf_dir, "part", ["p_partkey", "p_type"]).to_pandas()
    part_keys = set(part.loc[part["p_type"] == ptype, "p_partkey"])
    supp = _read(sf_dir, "supplier",
                 ["s_suppkey", "s_nationkey"]).to_pandas()
    supp = supp.merge(nat[["n_nationkey", "n_name"]],
                      left_on="s_nationkey", right_on="n_nationkey")
    target_supp = set(supp.loc[supp["n_name"] == nation, "s_suppkey"])

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"])
    orders = broadcast_semi_join(orders, cust_keys, on="o_custkey")
    orders = orders.map_batches(
        lambda df: pd.DataFrame(
            {"o_orderkey": df["o_orderkey"],
             "o_year": df["o_orderdate"].dt.year.astype("int64")}),
        batch_format="pandas")

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_partkey", "l_suppkey",
                "l_extendedprice", "l_discount"])
    li = broadcast_semi_join(li, part_keys, on="l_partkey")
    supp_ref = __import__("ray").put(target_supp)

    def vol(df: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray
        v = (df["l_extendedprice"].to_numpy(np.float64)
             * (1.0 - df["l_discount"].to_numpy(np.float64)))
        hit = df["l_suppkey"].isin(_ray.get(supp_ref)).to_numpy()
        return pd.DataFrame({"l_orderkey": df["l_orderkey"].to_numpy(),
                             "volume": v,
                             "nation_volume": np.where(hit, v, 0.0)})

    li = li.map_batches(vol, batch_format="pandas")
    j = li.join(orders, join_type="inner",
                num_partitions=shuffle_partitions(8),
                on=("l_orderkey",), right_on=("o_orderkey",))
    agg = grouped_aggregate(j, ["o_year"],
                            {"nation_volume": ("nation_volume", "sum"),
                             "volume": ("volume", "sum")}).to_pandas()
    agg["mkt_share"] = (agg["nation_volume"] / agg["volume"]).round(6)
    agg["o_year"] = agg["o_year"].astype("int64")
    return agg[["o_year", "mkt_share"]].sort_values("o_year") \
        .reset_index(drop=True)


# --- Q9 shape: product-line profit by supplier nation and year ---

def q9_product_profit(sf_dir: str, *, color: str = "red"):
    """Product-type profit (the TPC-H Q9 shape, adapted: the driver's
    tables carry no partsupp, so profit is discounted revenue without
    the supplycost term — the join/aggregate topology is Q9's): lines
    on parts whose name contains ``color``, profit rolled up by the
    supplying nation and order year.

    Scale shape: part-name keys and supplier→nation names broadcast;
    lineitem⋈orders hash-partitioned; (nation, year) aggregate is
    combiner-reduced."""
    part = _read(sf_dir, "part", ["p_partkey", "p_name"]).to_pandas()
    part_keys = set(
        part.loc[part["p_name"].str.contains(color), "p_partkey"])
    nat = _read(sf_dir, "nation",
                ["n_nationkey", "n_name"]).to_pandas()
    supp = _read(sf_dir, "supplier",
                 ["s_suppkey", "s_nationkey"]).to_pandas()
    supp = supp.merge(nat, left_on="s_nationkey",
                      right_on="n_nationkey")[["s_suppkey", "n_name"]]

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_partkey", "l_suppkey",
                "l_extendedprice", "l_discount"])
    li = broadcast_semi_join(li, part_keys, on="l_partkey")

    def profit(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"l_orderkey": df["l_orderkey"].to_numpy(),
             "l_suppkey": df["l_suppkey"].to_numpy(),
             "amount": df["l_extendedprice"].to_numpy(np.float64)
             * (1.0 - df["l_discount"].to_numpy(np.float64))})

    li = li.map_batches(profit, batch_format="pandas")
    li = broadcast_join(li, supp, left_on="l_suppkey",
                        right_on="s_suppkey")
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    orders = orders.map_batches(
        lambda df: pd.DataFrame(
            {"o_orderkey": df["o_orderkey"],
             "o_year": df["o_orderdate"].dt.year.astype("int64")}),
        batch_format="pandas")
    j = li.join(orders, join_type="inner",
                num_partitions=shuffle_partitions(8),
                on=("l_orderkey",), right_on=("o_orderkey",))
    agg = grouped_aggregate(j, ["n_name", "o_year"],
                            {"sum_profit": ("amount", "sum")}).to_pandas()
    agg["sum_profit"] = agg["sum_profit"].round(2)
    agg["o_year"] = agg["o_year"].astype("int64")
    return agg.sort_values(["n_name", "o_year"],
                           ascending=[True, False]).reset_index(drop=True)


# --- Q17 shape: correlated per-part average as a filter ---

def q17_small_quantity_revenue(sf_dir: str, *, brand: str = "Brand#1"):
    """Small-quantity-order revenue (the TPC-H Q17 shape): average
    yearly revenue lost if orders below 20% of a part's average
    quantity were not taken, for one brand.

    Scale shape: the brand's part keys broadcast; the correlated
    scalar subquery (per-part avg quantity) is a combiner-backed
    aggregate whose result is brand-bounded (|part|/|brands|) and
    broadcasts back as a dict — the reference Q17 plan's build side;
    the final scalar sum never shuffles."""
    part = _read(sf_dir, "part", ["p_partkey", "p_brand"]).to_pandas()
    part_keys = set(part.loc[part["p_brand"] == brand, "p_partkey"])
    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_quantity", "l_extendedprice"])
    li = broadcast_semi_join(li, part_keys, on="l_partkey")
    avg = grouped_aggregate(li, ["l_partkey"],
                            {"avg_qty": ("l_quantity", "mean")}) \
        .to_pandas()
    thresh = {int(k): 0.2 * v for k, v in
              zip(avg["l_partkey"], avg["avg_qty"])}
    t_ref = __import__("ray").put(thresh)

    def below(df: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray
        lim = df["l_partkey"].map(_ray.get(t_ref)).to_numpy(np.float64)
        keep = df["l_quantity"].to_numpy(np.float64) < lim
        return pd.DataFrame(
            {"l_extendedprice": df["l_extendedprice"].to_numpy()[keep]})

    li = li.map_batches(below, batch_format="pandas")
    total = grouped_aggregate(
        li.map_batches(lambda df: df.assign(g=0), batch_format="pandas"),
        ["g"], {"s": ("l_extendedprice", "sum")}).to_pandas()
    avg_yearly = round(float(total["s"].sum()) / 7.0, 2)
    return pd.DataFrame({"avg_yearly": [avg_yearly]})


# --- Q19 shape: disjunctive multi-clause join predicate ---

def q19_disjunctive_revenue(sf_dir: str):
    """Discounted revenue under OR-of-conjunctions predicates (the
    TPC-H Q19 shape): three (brand, size-range, quantity-range)
    clauses OR-ed across the part⋈lineitem join.

    Scale shape: part attributes broadcast as a (partkey→brand,size)
    frame, the disjunction evaluates as three vectorized boolean
    masks per batch, and the scalar sum never shuffles."""
    clauses = [("Brand#1", 1, 15, 1.0, 30.0),
               ("Brand#2", 10, 30, 5.0, 35.0),
               ("Brand#3", 20, 50, 10.0, 40.0)]
    part = _read(sf_dir, "part",
                 ["p_partkey", "p_brand", "p_size"]).to_pandas()
    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_quantity", "l_extendedprice",
                "l_discount"])
    li = broadcast_join(li, part, left_on="l_partkey",
                        right_on="p_partkey")

    def pred(df: pd.DataFrame) -> pd.DataFrame:
        qty = df["l_quantity"].to_numpy(np.float64)
        size = df["p_size"].to_numpy()
        brand = df["p_brand"].to_numpy()
        keep = np.zeros(len(df), dtype=bool)
        for b, s_lo, s_hi, q_lo, q_hi in clauses:
            keep |= ((brand == b) & (size >= s_lo) & (size <= s_hi)
                     & (qty >= q_lo) & (qty <= q_hi))
        v = (df["l_extendedprice"].to_numpy(np.float64)
             * (1.0 - df["l_discount"].to_numpy(np.float64)))[keep]
        return pd.DataFrame({"g": [0], "revenue": [float(v.sum())],
                             "n": [int(keep.sum())]})

    parts = li.map_batches(pred, batch_format="pandas").to_pandas()
    return pd.DataFrame({"revenue": [round(float(parts["revenue"].sum()),
                                           2)],
                         "n_lines": [int(parts["n"].sum())]})


# --- Q21 shape: sole-late-supplier detection on multi-supplier orders ---

def q21_waiting_suppliers(sf_dir: str, *, late_days: int = 60,
                          k: int = 20):
    """Suppliers who kept orders waiting (the TPC-H Q21 shape, adapted:
    the driver's lineitem has no commit/receipt dates, so "late" is
    shipped more than ``late_days`` after the order date): count, per
    supplier, fulfilled multi-supplier orders where that supplier was
    the ONLY late one.

    Scale shape: Q21's exists/not-exists pair is re-expressed as two
    combiner-backed aggregates — per-(order, supplier) lateness, then
    per-order supplier/late counts — joined back on the order key in
    one hash-partitioned exchange; nothing order-shaped reaches the
    driver until the per-supplier count head."""
    late = pd.Timedelta(days=late_days)
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderstatus", "o_orderdate"])
    orders = orders.map_batches(
        lambda df: df.loc[df["o_orderstatus"] == "F",
                          ["o_orderkey", "o_orderdate"]],
        batch_format="pandas")
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_shipdate"])
    j = li.join(orders, join_type="inner",
                num_partitions=shuffle_partitions(8),
                on=("l_orderkey",), right_on=("o_orderkey",))
    j = j.map_batches(
        lambda df: pd.DataFrame(
            {"l_orderkey": df["l_orderkey"].to_numpy(),
             "l_suppkey": df["l_suppkey"].to_numpy(),
             "is_late": (df["l_shipdate"]
                         > df["o_orderdate"] + late).astype("int64")}),
        batch_format="pandas")
    per_os = grouped_aggregate(j, ["l_orderkey", "l_suppkey"],
                               {"late": ("is_late", "max")},
                               result_hint="large")
    per_o = grouped_aggregate(per_os, ["l_orderkey"],
                              {"n_supp": (None, "count"),
                               "n_late": ("late", "sum")},
                              result_hint="large")
    jj = per_os.join(per_o, join_type="inner",
                     num_partitions=shuffle_partitions(8),
                     on=("l_orderkey",), right_on=("l_orderkey",))
    jj = jj.map_batches(
        lambda df: df.loc[(df["late"] == 1) & (df["n_supp"] > 1)
                          & (df["n_late"] == 1), ["l_suppkey"]],
        batch_format="pandas")
    cnt = grouped_aggregate(jj, ["l_suppkey"],
                            {"numwait": (None, "count")}).to_pandas()
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_name"]).to_pandas()
    cnt = cnt.merge(supp, left_on="l_suppkey", right_on="s_suppkey")
    cnt["numwait"] = cnt["numwait"].astype("int64")
    return cnt.sort_values(["numwait", "s_name"],
                           ascending=[False, True]).head(k) \
        [["s_name", "numwait"]].reset_index(drop=True)


# --- Q2 shape: min-cost supplier per part (correlated MIN + equality) ---

def q2_min_cost_supplier(sf_dir: str, *, region: str = "EUROPE",
                         max_size: int = 5, ptype: str = "LARGE",
                         k: int = 100):
    """Minimum-cost supplier per part (the TPC-H Q2 shape, adapted:
    the driver's tables carry no partsupp, so the supply relation is
    derived from shipping history — per (part, supplier) the minimum
    observed unit price ``l_extendedprice / l_quantity``): for small
    parts of one type, the region's cheapest supplier(s), richest
    accounts first.

    Scale shape: the derived supply relation is a hash-partitioned
    combiner aggregate over the fact table; the region's supplier keys
    broadcast; the correlated per-part MIN is a second combiner
    aggregate whose result is part-bounded and broadcasts back as a
    dict (Q2's scalar-subquery build side); the equality filter runs
    map-side, so nothing fact-shaped reaches the driver. The unit
    price is one IEEE division on both engines, so the MIN-equality
    compares bit-identical doubles."""
    import ray

    nat = _read(sf_dir, "nation",
                ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region",
                ["r_regionkey", "r_name"]).to_pandas()
    nat = nat.merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    supp = _read(sf_dir, "supplier",
                 ["s_suppkey", "s_name", "s_acctbal",
                  "s_nationkey"]).to_pandas()
    supp = supp.merge(nat[["n_nationkey", "n_name", "r_name"]],
                      left_on="s_nationkey", right_on="n_nationkey")
    supp = supp.loc[supp["r_name"] == region,
                    ["s_suppkey", "s_name", "s_acctbal", "n_name"]]
    supp_keys = set(supp["s_suppkey"])

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_extendedprice",
                "l_quantity"])
    li = broadcast_semi_join(li, supp_keys, on="l_suppkey")
    li = li.map_batches(
        lambda df: pd.DataFrame(
            {"l_partkey": df["l_partkey"].to_numpy(),
             "l_suppkey": df["l_suppkey"].to_numpy(),
             "unit": df["l_extendedprice"].to_numpy(np.float64)
             / df["l_quantity"].to_numpy(np.float64)}),
        batch_format="pandas")
    ps = grouped_aggregate(li, ["l_partkey", "l_suppkey"],
                           {"cost": ("unit", "min")},
                           result_hint="large")
    part_min = grouped_aggregate(ps, ["l_partkey"],
                                 {"min_cost": ("cost", "min")}) \
        .to_pandas()
    min_ref = ray.put(dict(zip(part_min["l_partkey"].astype(int),
                               part_min["min_cost"])))

    def at_min(df: pd.DataFrame) -> pd.DataFrame:
        lo = df["l_partkey"].map(ray.get(min_ref)).to_numpy(np.float64)
        return df.loc[df["cost"].to_numpy(np.float64) == lo]

    best = ps.map_batches(at_min, batch_format="pandas").to_pandas()
    part = _read(sf_dir, "part",
                 ["p_partkey", "p_name", "p_size", "p_type"]).to_pandas()
    part = part.loc[(part["p_size"] <= max_size)
                    & (part["p_type"] == ptype),
                    ["p_partkey", "p_name"]]
    out = best.merge(part, left_on="l_partkey", right_on="p_partkey") \
        .merge(supp, left_on="l_suppkey", right_on="s_suppkey")
    # DuckDB round() is half-away-from-zero; numpy is half-even — a
    # unit price landing exactly on a 1e-6 tie must round the same way
    c = out["cost"].to_numpy(np.float64)
    out["cost"] = np.copysign(np.floor(np.abs(c) * 1e6 + 0.5), c) / 1e6
    out = out.sort_values(["s_acctbal", "n_name", "s_name", "p_partkey"],
                          ascending=[False, True, True, True]).head(k)
    return out[["s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
                "cost"]].reset_index(drop=True)


# --- Q11 shape: group value share vs a global scalar threshold ---

def q11_important_parts(sf_dir: str, *, nation: str = "NATION_12",
                        mult: float = 2.0):
    """Important parts in one nation's supply stream (the TPC-H Q11
    shape, adapted: no partsupp, so a part's "value" is its discounted
    revenue from that nation's suppliers): parts whose value exceeds
    ``mult`` × the per-part average value — the HAVING-vs-global-scalar
    pattern.

    Scale shape: the nation's supplier keys broadcast; the per-part
    value is one hash-partitioned combiner aggregate; the global
    threshold is a tiny second-level aggregate over the (part-bounded)
    result, after which the filter is driver-side on a dimension-sized
    frame — nothing fact-shaped ever collects."""
    nat = _read(sf_dir, "nation",
                ["n_nationkey", "n_name"]).to_pandas()
    supp = _read(sf_dir, "supplier",
                 ["s_suppkey", "s_nationkey"]).to_pandas()
    supp = supp.merge(nat, left_on="s_nationkey", right_on="n_nationkey")
    supp_keys = set(supp.loc[supp["n_name"] == nation, "s_suppkey"])

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_extendedprice",
                "l_discount"])
    li = broadcast_semi_join(li, supp_keys, on="l_suppkey")
    li = li.map_batches(
        lambda df: pd.DataFrame(
            {"l_partkey": df["l_partkey"].to_numpy(),
             "value": df["l_extendedprice"].to_numpy(np.float64)
             * (1.0 - df["l_discount"].to_numpy(np.float64))}),
        batch_format="pandas")
    nv = grouped_aggregate(li, ["l_partkey"],
                           {"value": ("value", "sum")},
                           result_hint="large").to_pandas()
    thresh = mult * float(nv["value"].mean())
    out = nv.loc[nv["value"] > thresh].copy()
    out["value"] = out["value"].round(2)
    return out.sort_values(["value", "l_partkey"],
                           ascending=[False, True]).reset_index(drop=True)


# --- Q12 shape: priority CASE-counts per line class after a fact join ---

def q12_priority_lines(sf_dir: str, *, year: int = 1997):
    """Order-priority line counts per return flag (the TPC-H Q12
    shape, adapted: the driver's lineitem has no ship mode, so lines
    group by ``l_returnflag``; "late" commit semantics reduce to the
    ship-year window): per flag, how many lines belong to
    high-priority orders (1-URGENT / 2-HIGH) vs all others.

    Scale shape: the single hash-partitioned fact⋈fact join, then a
    CASE-sum combiner — two int64 partials per flag per batch reach
    the reducer."""
    lo = pd.Timestamp(f"{year}-01-01")
    hi = pd.Timestamp(f"{year + 1}-01-01")
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_returnflag", "l_shipdate"])
    li = li.map_batches(
        lambda df: df.loc[(df["l_shipdate"] >= lo) & (df["l_shipdate"] < hi),
                          ["l_orderkey", "l_returnflag"]],
        batch_format="pandas")
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    j = li.join(orders, join_type="inner",
                num_partitions=shuffle_partitions(8),
                on=("l_orderkey",), right_on=("o_orderkey",))
    j = j.map_batches(
        lambda df: pd.DataFrame(
            {"l_returnflag": df["l_returnflag"].to_numpy(),
             "hi": df["o_orderpriority"]
             .isin(["1-URGENT", "2-HIGH"]).astype("int64").to_numpy()}),
        batch_format="pandas")
    agg = grouped_aggregate(
        j.map_batches(lambda df: df.assign(lo=1 - df["hi"]),
                      batch_format="pandas"),
        ["l_returnflag"],
        {"high_line_count": ("hi", "sum"),
         "low_line_count": ("lo", "sum")}).to_pandas()
    for c in ("high_line_count", "low_line_count"):
        agg[c] = agg[c].astype("int64")
    return agg.sort_values("l_returnflag").reset_index(drop=True)


# --- Q16 shape: distinct-supplier counts per part class, anti-joined ---

def q16_part_supplier_counts(sf_dir: str, *, excl_brand: str = "Brand#1",
                             sizes=(1, 4, 9, 16, 25, 36, 49)):
    """Supplier counts per (brand, type, size) (the TPC-H Q16 shape,
    adapted: the part-supplier relation is derived from shipping
    history, and the "customer complaints" exclusion is suppliers with
    negative account balance): COUNT(DISTINCT supplier) per part
    class, excluding one brand and non-square sizes.

    Scale shape: the distinct (part, supplier) pair set is one
    hash-partitioned combiner aggregate over the fact table; the
    excluded supplier keys anti-join map-side from a broadcast set;
    part attributes broadcast-join; the final count lands on a
    class-bounded frame."""
    supp = _read(sf_dir, "supplier",
                 ["s_suppkey", "s_acctbal"]).to_pandas()
    bad = set(supp.loc[supp["s_acctbal"] < 0, "s_suppkey"])

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    li = broadcast_anti_join(li, bad, on="l_suppkey")
    pairs = grouped_aggregate(li, ["l_partkey", "l_suppkey"],
                              {"n": (None, "count")},
                              result_hint="large")
    part = _read(sf_dir, "part",
                 ["p_partkey", "p_brand", "p_type", "p_size"]).to_pandas()
    part = part.loc[(part["p_brand"] != excl_brand)
                    & (part["p_size"].isin(list(sizes)))]
    pairs = broadcast_join(pairs, part, left_on="l_partkey",
                           right_on="p_partkey")
    # a supplier shipping several parts of one class counts once:
    # dedup (class, supplier) before counting
    class_supp = grouped_aggregate(
        pairs, ["p_brand", "p_type", "p_size", "l_suppkey"],
        {"n": (None, "count")}, result_hint="large")
    cnt = grouped_aggregate(class_supp, ["p_brand", "p_type", "p_size"],
                            {"supplier_cnt": (None, "count")}).to_pandas()
    cnt["supplier_cnt"] = cnt["supplier_cnt"].astype("int64")
    cnt["p_size"] = cnt["p_size"].astype("int64")
    return cnt.sort_values(
        ["supplier_cnt", "p_brand", "p_type", "p_size"],
        ascending=[False, True, True, True]).reset_index(drop=True)


# --- Q20 shape: nested correlated-share threshold → supplier semi-join ---

def q20_dominant_suppliers(sf_dir: str, *, prefix: str = "small",
                           year: int = 1997, share: float = 0.3):
    """Suppliers dominating a part's yearly volume (the TPC-H Q20
    shape, adapted: no partsupp availqty, so "excess stock" becomes
    shipping more than ``share`` of a part's total ``year`` volume):
    distinct suppliers who, for some part named ``prefix``…, shipped
    more than that fraction — Q20's nested IN chain with a correlated
    quantity threshold.

    Scale shape: the prefix part keys broadcast; per-(part, supplier)
    and per-part quantity sums are chained combiner aggregates (the
    second one part-bounded, broadcast back as a dict); the share
    filter runs map-side and only qualifying supplier keys — bounded
    by the supplier dimension — reach the driver. Quantities are
    small integers in doubles, so the threshold compare is exact."""
    import ray

    part = _read(sf_dir, "part", ["p_partkey", "p_name"]).to_pandas()
    part_keys = set(
        part.loc[part["p_name"].str.startswith(prefix), "p_partkey"])
    lo = pd.Timestamp(f"{year}-01-01")
    hi = pd.Timestamp(f"{year + 1}-01-01")
    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"])
    li = broadcast_semi_join(li, part_keys, on="l_partkey")
    li = li.map_batches(
        lambda df: df.loc[(df["l_shipdate"] >= lo) & (df["l_shipdate"] < hi),
                          ["l_partkey", "l_suppkey", "l_quantity"]],
        batch_format="pandas")
    pq_ = grouped_aggregate(li, ["l_partkey", "l_suppkey"],
                            {"qty": ("l_quantity", "sum")},
                            result_hint="large")
    totals = grouped_aggregate(pq_, ["l_partkey"],
                               {"total": ("qty", "sum")}).to_pandas()
    tot_ref = ray.put(dict(zip(totals["l_partkey"].astype(int),
                               totals["total"])))

    def dominant(df: pd.DataFrame) -> pd.DataFrame:
        tot = df["l_partkey"].map(ray.get(tot_ref)).to_numpy(np.float64)
        keep = df["qty"].to_numpy(np.float64) > share * tot
        return df.loc[keep, ["l_suppkey"]]

    winners = pq_.map_batches(dominant, batch_format="pandas").to_pandas()
    supp = _read(sf_dir, "supplier",
                 ["s_suppkey", "s_name", "s_acctbal"]).to_pandas()
    out = supp.loc[supp["s_suppkey"].isin(set(winners["l_suppkey"])),
                   ["s_name", "s_acctbal"]]
    return out.sort_values("s_name").reset_index(drop=True)
