"""Relational pipelines over the driver's TPC-H-ish tables.

These exercise the engine's core relational operators — pruned parquet
reads, vectorized filter/projection, grouped aggregation, multi-way
hash joins, semi/anti joins via broadcast key sets, tumbling-window
aggregation, sort/top-k, distinct — each with an exact DuckDB oracle
(see ``__ray_entry__.oracle_sql``). Column names match the oracle SQL
exactly (the driver hashes values under sorted column names).

Money-valued float aggregates are rounded to 2 decimals on BOTH sides:
distributed summation order makes the last float bits
non-deterministic, and the oracle compare is value-exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

from jerex_ray.runtime import configure_data_context, shuffle_partitions


def _read(sf_dir: str, table: str, columns=None):
    configure_data_context()
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


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
        t = t.filter(pc.less_equal(t["l_shipdate"], cutoff))
        disc = pc.multiply(t["l_extendedprice"],
                           pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "l_quantity": t["l_quantity"],
            "l_extendedprice": t["l_extendedprice"],
            "disc_price": disc,
        })

    out = (ds.map_batches(prep, batch_format="pyarrow")
           .groupby(["l_returnflag", "l_linestatus"],
                    num_partitions=shuffle_partitions())
           .aggregate(Sum("l_quantity", alias_name="sum_qty"),
                      Sum("l_extendedprice", alias_name="sum_base_price"),
                      Sum("disc_price", alias_name="sum_disc_price"),
                      Count(alias_name="count_order")))
    df = out.to_pandas().sort_values(["l_returnflag", "l_linestatus"])
    return _round2(df, ["sum_qty", "sum_base_price", "sum_disc_price"]) \
        .reset_index(drop=True)


# --- 3-way join + groupby + top-k ---

def q_top_customer_revenue(sf_dir: str, k: int = 10):
    np_ = shuffle_partitions()
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount"])

    def rev(t: pa.Table) -> pa.Table:
        r = pc.multiply(t["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({"l_orderkey": t["l_orderkey"], "revenue": r})

    li = li.map_batches(rev, batch_format="pyarrow")
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])

    j1 = li.join(orders, join_type="inner", num_partitions=np_,
                 on=("l_orderkey",), right_on=("o_orderkey",))
    j2 = j1.join(cust, join_type="inner", num_partitions=np_,
                 on=("o_custkey",), right_on=("c_custkey",))
    agg = j2.groupby("c_name", num_partitions=np_) \
            .aggregate(Sum("revenue", alias_name="revenue"))
    df = agg.to_pandas()
    df["revenue"] = df["revenue"].round(2)
    df = df.sort_values(["revenue", "c_name"], ascending=[False, True]).head(k)
    return df.reset_index(drop=True)


# --- dimension join chain + count ---

def q_customers_per_region(sf_dir: str):
    np_ = shuffle_partitions()
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"])
    region = _read(sf_dir, "region", ["r_regionkey", "r_name"])
    j = cust.join(nation, join_type="inner", num_partitions=np_,
                  on=("c_nationkey",), right_on=("n_nationkey",))
    j = j.join(region, join_type="inner", num_partitions=np_,
               on=("n_regionkey",), right_on=("r_regionkey",))
    df = j.groupby("r_name", num_partitions=np_) \
          .aggregate(Count(alias_name="n_customers")).to_pandas()
    return df.sort_values("r_name").reset_index(drop=True)


# --- tumbling-window aggregate over the events stream table ---

def q_events_hourly(sf_dir: str):
    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["hour"] = df["ts"].dt.floor("h")
        return df[["event_type", "hour", "value"]]

    out = (ds.map_batches(bucket, batch_format="pandas")
           .groupby(["event_type", "hour"],
                    num_partitions=shuffle_partitions())
           .aggregate(Count(alias_name="n_events"),
                      Sum("value", alias_name="sum_value")))
    df = out.to_pandas().sort_values(["event_type", "hour"])
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
    out = ds.groupby("s_nationkey", num_partitions=shuffle_partitions()) \
            .aggregate(Count(alias_name="n_suppliers"),
                       Min("s_acctbal", alias_name="min_bal"),
                       Max("s_acctbal", alias_name="max_bal"),
                       Sum("s_acctbal", alias_name="sum_bal"))
    df = out.to_pandas().sort_values("s_nationkey")
    return _round2(df, ["min_bal", "max_bal", "sum_bal"]).reset_index(drop=True)


# --- distinct (shuffle dedup) ---

def q_distinct_segments(sf_dir: str):
    ds = _read(sf_dir, "customer", ["c_mktsegment"])
    vals = ds.unique("c_mktsegment")
    return pd.DataFrame({"c_mktsegment": sorted(vals)})


# --- filter + projection pushed to the read ---

def q_urgent_orders(sf_dir: str):
    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"],
        filter=(pc.field("o_orderpriority") == "1-URGENT"))
    df = ds.to_pandas()
    df["o_totalprice"] = df["o_totalprice"].round(2)
    return df.sort_values("o_orderkey").reset_index(drop=True)


# --- semi / anti join via broadcast key set (guide §Joins) ---

def _order_custkeys(sf_dir: str) -> set:
    keys = _read(sf_dir, "orders", ["o_custkey"]).unique("o_custkey")
    return set(keys)


def q_customers_without_orders(sf_dir: str):
    """Anti join: customers having no orders (broadcast key set)."""
    keys_ref = ray.put(_order_custkeys(sf_dir))
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])

    def anti(df: pd.DataFrame) -> pd.DataFrame:
        keys = ray.get(keys_ref)
        return df[~df["c_custkey"].isin(keys)]

    df = cust.map_batches(anti, batch_format="pandas").to_pandas()
    if df.empty:  # empty Dataset → schema-less frame; restore columns
        return pd.DataFrame({"c_custkey": pd.Series(dtype="int64"),
                             "c_name": pd.Series(dtype="object")})
    return df.sort_values("c_custkey").reset_index(drop=True)


def q_customers_with_orders_count(sf_dir: str):
    """Semi join + count: number of customers that placed orders."""
    keys_ref = ray.put(_order_custkeys(sf_dir))
    cust = _read(sf_dir, "customer", ["c_custkey"])

    def semi(df: pd.DataFrame) -> pd.DataFrame:
        keys = ray.get(keys_ref)
        return df[df["c_custkey"].isin(keys)]

    n = cust.map_batches(semi, batch_format="pandas").count()
    return pd.DataFrame({"n_customers": [n]})
