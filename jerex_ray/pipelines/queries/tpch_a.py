"""Split of the query registry: ``tpch_a`` part (mechanically derived from the original queries.py by scripts/split_queries.py; unit order and source text preserved)."""

from __future__ import annotations
import re
import numpy as np
import pandas as pd
from jerex_ray.config import PipelineConfig
from jerex_ray.runtime import configure_data_context
from jerex_ray import relational as R
from jerex_ray.pipelines.queries._shared import ORACLE_REGISTRY
from jerex_ray.pipelines.queries._shared import _round_half_away  # noqa: E501

def q_distinct_event_users(sf_dir: str):
    """Exact distinct count via the combiner aggregate: per-batch
    partial uniques → groupby(user_id) → count of groups."""
    import pandas as pd
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["user_id"])
    groups = grouped_aggregate(ds, ["user_id"], {"n": (None, "count")})
    return pd.DataFrame({"n_users": [int(groups.count())]})

def q_top_parts_per_brand(sf_dir: str):
    """Exact grouped top-k (``functions/aggregate.grouped_topk``):
    the 3 priciest parts per brand, ties by p_partkey — per-batch
    top-k combiner then co-located finish; oracled by SQL
    row_number() PARTITION BY."""
    from jerex_ray.functions.aggregate import grouped_topk
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/part.parquet",
                            columns=["p_brand", "p_partkey",
                                     "p_retailprice"])
    out = grouped_topk(ds, ["p_brand"], order_by="p_retailprice", k=3,
                       tie_cols=["p_partkey"]).to_pandas()
    out = out[["p_brand", "p_partkey", "p_retailprice"]]
    out["p_partkey"] = out["p_partkey"].astype("int64")
    out["p_retailprice"] = out["p_retailprice"].round(2)
    return out.sort_values(["p_brand", "p_partkey"]) \
        .reset_index(drop=True)

def q_orders_events_window(sf_dir: str):
    """Range join (aggregated): per order, count + sum of the same
    user's events within the 7 days up to the order date — the keyed
    range-join primitive (``ops/windows.range_join_agg``), oracled by
    a correlated-subquery SQL equivalent."""
    from jerex_ray.ops.windows import range_join_agg
    from jerex_ray.runtime import read_parquet_sized
    orders = read_parquet_sized(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_custkey",
                                         "o_orderdate"])
    orders = orders.map_batches(
        lambda df: df.rename(columns={"o_custkey": "user_id"}),
        batch_format="pandas")
    events = read_parquet_sized(f"{sf_dir}/events.parquet",
                                columns=["user_id", "ts", "value"])
    out = range_join_agg(orders, events, key="user_id",
                         left_ts="o_orderdate", right_ts="ts",
                         lower="7D", upper="0D",
                         value_col="value").to_pandas()
    out = out[["o_orderkey", "n_matches", "sum_value"]]
    out["o_orderkey"] = out["o_orderkey"].astype("int64")
    out["n_matches"] = out["n_matches"].astype("int64")
    out["sum_value"] = out["sum_value"].round(2)
    return out.sort_values("o_orderkey").reset_index(drop=True)

def q_orders_last_event(sf_dir: str):
    """As-of join: for each order, the latest event of the same user at
    or before the order date."""
    from jerex_ray.ops.windows import asof_join
    from jerex_ray.runtime import read_parquet_sized
    orders = read_parquet_sized(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_custkey",
                                         "o_orderdate"])
    orders = orders.map_batches(
        lambda df: df.rename(columns={"o_custkey": "user_id"}),
        batch_format="pandas")
    events = read_parquet_sized(f"{sf_dir}/events.parquet",
                                columns=["user_id", "ts", "value"])
    out = asof_join(orders, events, key="user_id", left_ts="o_orderdate",
                    right_ts="ts", right_cols=["value"]).to_pandas()
    out = out[["o_orderkey", "ts_right"]].rename(
        columns={"ts_right": "last_event_ts"})
    # the union path can promote columns to pandas nullable dtypes;
    # pin the driver-facing schema to plain numpy dtypes
    out["o_orderkey"] = out["o_orderkey"].astype("int64")
    out["last_event_ts"] = pd.to_datetime(out["last_event_ts"]) \
        .astype("datetime64[us]")
    return out.sort_values("o_orderkey").reset_index(drop=True)

def q_lineitem_corr(sf_dir: str):
    """Pearson correlation of line quantity vs extended price, from
    ONE combiner pass of co-moments (n, Σx, Σy, Σx², Σy², Σxy) — the
    distributed covariance shape; only six scalars reduce. Oracled
    against DuckDB ``corr`` to 6 decimals."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/lineitem.parquet",
                            columns=["l_quantity", "l_extendedprice"])

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        x = df["l_quantity"].to_numpy(np.float64)
        y = df["l_extendedprice"].to_numpy(np.float64)
        return pd.DataFrame({"__all": [0], "n": [np.int64(len(x))],
                             "sx": [x.sum()], "sy": [y.sum()],
                             "sxx": [(x * x).sum()],
                             "syy": [(y * y).sum()],
                             "sxy": [(x * y).sum()]})

    m = grouped_aggregate(
        ds.map_batches(moments, batch_format="pandas"),
        ["__all"],
        {k: (k, "sum") for k in ("n", "sx", "sy", "sxx", "syy",
                                 "sxy")}).to_pandas().iloc[0]
    n = float(m["n"])
    cov = m["sxy"] - m["sx"] * m["sy"] / n
    vx = m["sxx"] - m["sx"] ** 2 / n
    vy = m["syy"] - m["sy"] ** 2 / n
    r = cov / np.sqrt(vx * vy)
    return pd.DataFrame({"n": [np.int64(n)],
                         "corr_qty_price": [round(float(r), 6)]})

def q_orders_cohort_retention(sf_dir: str):
    """Cohort retention matrix: customers grouped by first-order year
    (cohort), counted once per active year — the derive-a-dimension-
    then-join-back shape: a combiner min per customer builds the
    cohort table (customer-scaled, stays a Dataset), a hash join
    attaches it to the fact stream, and two grouped aggregates
    produce the year×year matrix."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized, shuffle_partitions
    configure_data_context()
    orders = read_parquet_sized(f"{sf_dir}/orders.parquet",
                                columns=["o_custkey", "o_orderdate"])

    def year(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_custkey": df["o_custkey"].to_numpy(),
            "yr": df["o_orderdate"].dt.year.astype("int64")})

    yrs = orders.map_batches(year, batch_format="pandas").materialize()
    first = grouped_aggregate(yrs, ["o_custkey"], {"cohort": ("yr", "min")},
                              result_hint="large")
    j = yrs.join(first, join_type="inner",
                 num_partitions=shuffle_partitions(8), on=("o_custkey",))
    active = grouped_aggregate(j, ["cohort", "yr", "o_custkey"],
                               {"n": (None, "count")},
                               result_hint="large")
    out = grouped_aggregate(active, ["cohort", "yr"],
                            {"n_customers": (None, "count")}).to_pandas()
    out = out.rename(columns={"yr": "active_year"})
    out["cohort"] = out["cohort"].astype("int64")
    out["active_year"] = out["active_year"].astype("int64")
    out["n_customers"] = out["n_customers"].astype("int64")
    return out.sort_values(["cohort", "active_year"]) \
        .reset_index(drop=True)

def q_part_kcore(sf_dir: str):
    """k-core of the part co-purchase graph (k=80): BSP iterative
    peeling (``ops/graph.kcore``) — per round a combiner degree
    aggregate + two hash joins against the surviving-node Dataset.
    Converges in ~5 rounds on this graph; the SQL oracle replays
    exactly max_rounds=8 chained peel CTEs (a converged fixpoint makes
    the extra rounds no-ops on both sides)."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.ops.graph import kcore
    from jerex_ray.runtime import read_parquet_sized
    li = read_parquet_sized(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey"])

    def pairs_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"a": pd.Series(dtype="int64"),
                                 "b": pd.Series(dtype="int64")})
        d = df.drop_duplicates(["l_orderkey", "l_partkey"])
        m = d.merge(d, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        return pd.DataFrame({"a": m["l_partkey_x"].to_numpy(),
                             "b": m["l_partkey_y"].to_numpy()})

    edges = grouped_apply(li, ["l_orderkey"], pairs_block)
    out = kcore(edges, k=80, max_rounds=8).to_pandas()
    if "node" not in out.columns:
        # tiny corpora can peel the whole graph away: an all-empty
        # Dataset collects SCHEMA-LESS — rebuild the typed frame
        out = pd.DataFrame({"node": pd.Series(dtype="int64"),
                            "deg": pd.Series(dtype="int64")})
    out["node"] = out["node"].astype("int64")
    out["deg"] = out["deg"].astype("int64")
    return out.sort_values("node").reset_index(drop=True)

def q_orders_next_event(sf_dir: str):
    """Forward as-of join: for each order, the EARLIEST event of the
    same user at or after the order date (``asof_join`` with
    direction='forward' — same single-shuffle union/co-locate/
    merge_asof dataflow as the backward twin)."""
    from jerex_ray.ops.windows import asof_join
    from jerex_ray.runtime import read_parquet_sized
    orders = read_parquet_sized(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_custkey",
                                         "o_orderdate"])
    orders = orders.map_batches(
        lambda df: df.rename(columns={"o_custkey": "user_id"}),
        batch_format="pandas")
    events = read_parquet_sized(f"{sf_dir}/events.parquet",
                                columns=["user_id", "ts", "value"])
    out = asof_join(orders, events, key="user_id", left_ts="o_orderdate",
                    right_ts="ts", right_cols=["value"],
                    direction="forward").to_pandas()
    out = out[["o_orderkey", "ts_right"]].rename(
        columns={"ts_right": "next_event_ts"})
    out["o_orderkey"] = out["o_orderkey"].astype("int64")
    out["next_event_ts"] = pd.to_datetime(out["next_event_ts"]) \
        .astype("datetime64[us]")
    return out.sort_values("o_orderkey").reset_index(drop=True)

def q_part_triangles(sf_dir: str):
    """Per-node triangle counts over the part co-purchase graph (parts
    are adjacent iff they appear in the same order): the distributed
    degree-ordered wedge-join operator (``ops/graph.triangle_counts``)
    against an exact 3-way self-join SQL oracle. ~116k edges / ~414k
    triangles at sf0.01 — dense enough that the degree orientation
    matters (the apex-quadratic wedge stage sees oriented out-degrees,
    not raw degrees)."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.ops.graph import triangle_counts
    from jerex_ray.runtime import read_parquet_sized
    li = read_parquet_sized(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey"])
    # co-occurrence edges: per-order part pairs (grouped_apply would
    # also work; a per-block self-merge after key co-location is the
    # same shape triangle_counts itself uses for wedges)
    from jerex_ray.functions.aggregate import grouped_apply

    def pairs_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"a": pd.Series(dtype="int64"),
                                 "b": pd.Series(dtype="int64")})
        d = df.drop_duplicates(["l_orderkey", "l_partkey"])
        m = d.merge(d, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        return pd.DataFrame({"a": m["l_partkey_x"].to_numpy(),
                             "b": m["l_partkey_y"].to_numpy()})

    edges = grouped_apply(li, ["l_orderkey"], pairs_block)
    out = triangle_counts(edges, src="a", dst="b").to_pandas()
    out["node"] = out["node"].astype("int64")
    out["n_triangles"] = out["n_triangles"].astype("int64")
    return out.sort_values("node").reset_index(drop=True)

def q_part_skyline(sf_dir: str):
    """2-D Pareto frontier over parts — cheapest-yet-largest
    (minimize p_retailprice, maximize p_size) — via the distributive
    block-local skyline prune (``relational.skyline_2d``). Oracled
    with the textbook NOT EXISTS dominance predicate."""
    from jerex_ray.relational import skyline_2d
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/part.parquet",
                            columns=["p_partkey", "p_retailprice",
                                     "p_size"])
    out = skyline_2d(ds, min_col="p_retailprice", max_col="p_size")
    out["p_partkey"] = out["p_partkey"].astype("int64")
    out["p_size"] = out["p_size"].astype("int64")
    return out[["p_partkey", "p_retailprice", "p_size"]] \
        .sort_values("p_partkey").reset_index(drop=True)

def q_part_bfs(sf_dir: str):
    """Single-source hop distances over the part co-purchase graph
    (parts adjacent iff they share an order) from part 1 —
    frontier-expansion BSP (``ops/graph.bfs_levels``: edges
    hash-partitioned once, per-round traffic frontier-sized, exact
    termination on empty frontier). Oracled by a recursive-CTE BFS
    whose level cap only has to exceed the graph's eccentricity (the
    dense co-purchase graph has diameter ≤ ~4; the Ray side
    terminates naturally)."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.ops.graph import bfs_levels
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    li = read_parquet_sized(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey"])

    def pairs_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"a": pd.Series(dtype="int64"),
                                 "b": pd.Series(dtype="int64")})
        d = df.drop_duplicates(["l_orderkey", "l_partkey"])
        m = d.merge(d, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        return pd.DataFrame({"a": m["l_partkey_x"].to_numpy(),
                             "b": m["l_partkey_y"].to_numpy()})

    edges = grouped_apply(li, ["l_orderkey"], pairs_block)
    out = bfs_levels(edges, 1, src="a", dst="b")
    out["node"] = out["node"].astype("int64")
    out["level"] = out["level"].astype("int64")
    return out

def q_revenue_cube(sf_dir: str):
    """Order revenue by CUBE(region, nation): all four grouping sets
    in one result, 'ALL' marking the collapsed level. Same scale shape
    as the ROLLUP decomposition — one distributed combiner aggregate
    at the finest level, every coarser set re-aggregated from that
    dimension-bounded result."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.functions.join import broadcast_join
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()

    def _read(t, cols):
        return read_parquet_sized(f"{sf_dir}/{t}.parquet", columns=cols)

    orders = _read("orders", ["o_custkey", "o_totalprice"])
    cust = _read("customer", ["c_custkey", "c_nationkey"]).to_pandas()
    nation = _read("nation",
                   ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = _read("region", ["r_regionkey", "r_name"]).to_pandas()
    dim = (cust.merge(nation, left_on="c_nationkey",
                      right_on="n_nationkey")
               .merge(reg, left_on="n_regionkey",
                      right_on="r_regionkey")
           [["c_custkey", "n_name", "r_name"]])
    j = broadcast_join(orders, dim, left_on="o_custkey",
                       right_on="c_custkey")
    finest = grouped_aggregate(j, ["r_name", "n_name"],
                               {"revenue": ("o_totalprice", "sum")}) \
        .to_pandas()
    by_r = finest.groupby("r_name", as_index=False)["revenue"].sum()
    by_r["n_name"] = "ALL"
    by_n = finest.groupby("n_name", as_index=False)["revenue"].sum()
    by_n["r_name"] = "ALL"
    total = pd.DataFrame({"r_name": ["ALL"], "n_name": ["ALL"],
                          "revenue": [finest["revenue"].sum()]})
    out = pd.concat([finest, by_r[["r_name", "n_name", "revenue"]],
                     by_n[["r_name", "n_name", "revenue"]], total],
                    ignore_index=True)
    out["revenue"] = out["revenue"].round(2)
    return out.sort_values(["r_name", "n_name"]).reset_index(drop=True)

def q_referential_integrity(sf_dir: str):
    """Distributed referential-integrity audit, fact-vs-fact (neither
    side broadcastable at scale): tag each table's keyed rows, ONE
    hash co-location per check aggregates (rows_left, rows_right) per
    key, and tiny per-block partials reduce to the orphan counts —
    lineitem rows with no parent order, orders with no lineitems, and
    events whose user is absent from customer."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()

    def _tag(path, col, side):
        ds = read_parquet_sized(path, columns=[col])
        return ds.map_batches(
            lambda df, c=col, s=side: pd.DataFrame(
                {"k": df[c].to_numpy(np.int64),
                 "nl": np.int64(1 if s == "l" else 0),
                 "nr": np.int64(1 if s == "r" else 0)}),
            batch_format="pandas")

    def orphans(left_path, left_col, right_path, right_col):
        tagged = _tag(left_path, left_col, "l") \
            .union(_tag(right_path, right_col, "r"))
        per_key = grouped_aggregate(tagged, ["k"],
                                    {"nl": ("nl", "sum"),
                                     "nr": ("nr", "sum")})
        parts = per_key.map_batches(
            lambda df: pd.DataFrame({
                "lo": [int(df.loc[df["nr"] == 0, "nl"].sum())],
                "ro": [int((df["nl"] == 0).mul(df["nr"] > 0).sum())]}),
            batch_format="pandas").to_pandas()
        return int(parts["lo"].sum()), int(parts["ro"].sum())

    li_orph, ord_childless = orphans(
        f"{sf_dir}/lineitem.parquet", "l_orderkey",
        f"{sf_dir}/orders.parquet", "o_orderkey")
    ev_orph, _ = orphans(f"{sf_dir}/events.parquet", "user_id",
                         f"{sf_dir}/customer.parquet", "c_custkey")
    out = pd.DataFrame({
        "check_name": ["event_user_orphans", "lineitem_orphans",
                       "orders_childless"],
        "n": [ev_orph, li_orph, ord_childless]})
    out["n"] = out["n"].astype("int64")
    return out

def q_part_clustering(sf_dir: str):
    """Local clustering coefficient per node of the co-purchase graph
    — cc(v) = 2·T(v)/(deg(v)·(deg(v)−1)) — composing the
    degree-ordered triangle operator with a distinct-edge degree
    count; nodes in zero triangles keep cc = 0 (left join, not an
    inner join that would silently drop them)."""
    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply
    from jerex_ray.ops.graph import triangle_counts
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    li = read_parquet_sized(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey"])

    def pairs_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"a": pd.Series(dtype="int64"),
                                 "b": pd.Series(dtype="int64")})
        d = df.drop_duplicates(["l_orderkey", "l_partkey"])
        m = d.merge(d, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        return pd.DataFrame({"a": m["l_partkey_x"].to_numpy(),
                             "b": m["l_partkey_y"].to_numpy()})

    raw = grouped_apply(li, ["l_orderkey"], pairs_block)
    edges = grouped_aggregate(raw, ["a", "b"],
                              {"n": (None, "count")}).materialize()

    def endpoints(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "a" not in df.columns:
            return pd.DataFrame({"node": pd.Series(dtype="int64")})
        return pd.DataFrame({"node": np.concatenate(
            [df["a"].to_numpy(np.int64), df["b"].to_numpy(np.int64)])})

    deg = grouped_aggregate(
        edges.map_batches(endpoints, batch_format="pandas"),
        ["node"], {"degree": (None, "count")}).to_pandas()
    tri = triangle_counts(edges, src="a", dst="b").to_pandas()
    out = deg.merge(tri, on="node", how="left")
    out["n_triangles"] = out["n_triangles"].fillna(0).astype("int64")
    out = out[out["degree"] >= 2]
    d = out["degree"].to_numpy(np.float64)
    out["cc"] = np.round(2.0 * out["n_triangles"].to_numpy(np.float64)
                         / (d * (d - 1.0)), 6)
    out["node"] = out["node"].astype("int64")
    out["degree"] = out["degree"].astype("int64")
    return out[["node", "degree", "n_triangles", "cc"]] \
        .sort_values("node").reset_index(drop=True)

def q_part_abc(sf_dir: str):
    """ABC (Pareto 80/15/5) classification of parts by revenue — the
    inventory-policy classic — with the cumulative revenue computed as
    a DISTRIBUTED exclusive prefix sum in EXACT integer cents (2-dp
    money → int64, so Ray's partial-sum order and SQL's window cumsum
    agree bit-for-bit and the 0.80/0.95 thresholds are exact integer
    comparisons, no float-boundary hazard): revenue per part (one
    combiner), exact-quantile range buckets over the per-part table,
    per-bucket sums → offsets, in-bucket sort + cumsum. Descending
    order is the reversed ascending (cents ASC, partkey DESC) order,
    so cum_desc = total − cum_asc_exclusive."""
    import ray

    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply
    from jerex_ray.ops.quantiles import distributed_quantiles
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    li = read_parquet_sized(f"{sf_dir}/lineitem.parquet",
                            columns=["l_partkey", "l_extendedprice"])

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_partkey": df["l_partkey"].to_numpy(np.int64),
            "cents": np.round(df["l_extendedprice"].to_numpy(np.float64)
                              * 100).astype(np.int64)})

    pr = grouped_aggregate(li.map_batches(cents, batch_format="pandas"),
                           ["l_partkey"],
                           {"cents": ("cents", "sum")}).materialize()

    n_buckets = 32
    qs = [i / n_buckets for i in range(1, n_buckets)]
    pivots = np.unique(np.asarray(
        distributed_quantiles(pr, "cents", qs), dtype=np.float64))
    piv_ref = ray.put(pivots)

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        p = ray.get(piv_ref)
        out = df.copy()
        out["__b"] = np.searchsorted(
            p, df["cents"].to_numpy(np.float64), side="left") \
            .astype(np.int64)
        return out

    bucketed = pr.map_batches(with_bucket,
                              batch_format="pandas").materialize()
    bsum = grouped_aggregate(bucketed, ["__b"],
                             {"s": ("cents", "sum")}).to_pandas() \
        .sort_values("__b")
    tot = int(bsum["s"].sum())
    offs = dict(zip(bsum["__b"].astype(int),
                    np.concatenate(([0],
                        np.cumsum(bsum["s"].to_numpy(np.int64))[:-1]))))
    off_ref = ray.put(offs)

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "__b" not in df.columns:
            return pd.DataFrame({
                "l_partkey": pd.Series(dtype="int64"),
                "cents": pd.Series(dtype="int64"),
                "cum_cents": pd.Series(dtype="int64"),
                "abc_class": pd.Series(dtype="object")})
        o = ray.get(off_ref)
        outs = []
        for bk, g in df.groupby("__b", sort=False):
            # ascending = reversed descending: cents ASC, partkey DESC
            g = g.sort_values(["cents", "l_partkey"],
                              ascending=[True, False])
            c = g["cents"].to_numpy(np.int64)
            asc_excl = int(o[int(bk)]) \
                + np.concatenate(([0], np.cumsum(c)[:-1]))
            cum = tot - asc_excl          # inclusive, in DESC order
            cls = np.where(cum * 10 <= tot * 8, "A",
                           np.where(cum * 20 <= tot * 19, "B", "C"))
            outs.append(pd.DataFrame({
                "l_partkey": g["l_partkey"].to_numpy(np.int64),
                "cents": c, "cum_cents": cum, "abc_class": cls}))
        return pd.concat(outs, ignore_index=True)

    out = grouped_apply(bucketed, ["__b"], classify).to_pandas()
    for c in ("l_partkey", "cents", "cum_cents"):
        out[c] = out[c].astype("int64")
    return out.sort_values("l_partkey").reset_index(drop=True)

def q_orders_benford_shares(sf_dir: str):
    """Benford first-digit audit of order totals, share flavor
    (digit share vs the log10(1+1/d) probability; the chi-square
    decomposition lives in ``q_orders_benford``). Digit extracted from the EXACT
    fixed-point integer rendering (never float log10 — the one place
    engines can disagree at power-of-ten boundaries). One combiner
    pass, 9-row result, SQL-oracled."""
    from jerex_ray.ops.validate import benford_digits
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/orders.parquet",
                            columns=["o_totalprice"])
    return benford_digits(ds, "o_totalprice")

def q_orders_profile(sf_dir: str):
    """Schema-profiling pass over orders (row count, exact distinct
    count, min/max per column) from ONE explode + ONE shuffle shared
    by all profiled columns. String/int columns only (floats belong
    in the moments/quantile operators). SQL-oracled per column."""
    from jerex_ray.ops.validate import profile_columns
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    cols = ["o_custkey", "o_orderstatus", "o_orderpriority"]
    ds = read_parquet_sized(f"{sf_dir}/orders.parquet", columns=cols)
    return profile_columns(ds, cols)

def q_customer_rfm(sf_dir: str):
    """RFM segmentation (recency / frequency / monetary tercile
    buckets — classic CRM corpus partitioning): per-customer metrics
    from one combiner aggregate over orders, exact tercile thresholds
    from the three-pass distributed quantile operator (no sort
    shuffle), vectorized bucket assignment against the broadcast
    thresholds, and a 27-cell segment count. Thresholds round to 6 on
    both sides; monetary rounds to 2 before bucketing (float sum
    order must not move a boundary)."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.ops.quantiles import distributed_quantiles
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    import ray.data as rd
    anchor = pd.Timestamp("1998-12-31")
    ds = read_parquet_sized(f"{sf_dir}/orders.parquet",
                            columns=["o_custkey", "o_orderdate",
                                     "o_totalprice"])
    per = grouped_aggregate(ds, ["o_custkey"],
                            {"frequency": (None, "count"),
                             "monetary": ("o_totalprice", "sum"),
                             "last_order": ("o_orderdate", "max")})

    def metrics(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_custkey": df["o_custkey"].to_numpy(),
            "recency": (anchor - df["last_order"])
            .dt.days.to_numpy(np.float64),
            "frequency": df["frequency"].to_numpy(np.float64),
            "monetary": df["monetary"].round(2).to_numpy(np.float64)})

    m = per.map_batches(metrics, batch_format="pandas").materialize()
    qs = [1 / 3, 2 / 3]
    th = {c: [round(v, 6) for v in distributed_quantiles(m, c, qs)]
          for c in ("recency", "frequency", "monetary")}

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = {"o_custkey": df["o_custkey"].to_numpy()}
        for c, (t1, t2) in th.items():
            v = df[c].to_numpy(np.float64)
            out[f"{c[0]}_bucket"] = (1 + (v > t1).astype(np.int64)
                                     + (v > t2).astype(np.int64))
        return pd.DataFrame(out)

    seg = grouped_aggregate(
        m.map_batches(bucket, batch_format="pandas"),
        ["r_bucket", "f_bucket", "m_bucket"],
        {"n_customers": (None, "count")}).to_pandas()
    seg["n_customers"] = seg["n_customers"].astype("int64")
    for c in ("r_bucket", "f_bucket", "m_bucket"):
        seg[c] = seg[c].astype("int64")
    return seg.sort_values(["r_bucket", "f_bucket", "m_bucket"]) \
        .reset_index(drop=True)

def q_supplier_jaccard(sf_dir: str):
    """Link-prediction scores over the supplier–part bipartite graph
    (``ops/graph.bipartite_jaccard``): top-50 supplier pairs by
    part-set Jaccard — per-part wedge self-merge after one hash
    shuffle, combiner-reduced shared counts, broadcast degree join,
    block-local exact head. Oracled via a SQL self-join on shared
    parts with a deterministic (rounded jaccard DESC, pair) order."""
    from jerex_ray.ops.graph import bipartite_jaccard
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/lineitem.parquet",
                            columns=["l_suppkey", "l_partkey"])
    out = bipartite_jaccard(ds, left_col="l_suppkey",
                            right_col="l_partkey", top_k=50)
    out["a"] = out["a"].astype("int64")
    out["b"] = out["b"].astype("int64")
    return out

def q_part_sssp_tiered(sf_dir: str):
    """Weighted single-source shortest paths over the part co-purchase
    graph from part 1, tiered-cost flavor (the md5-weighted
    repeat-copurchase flavor lives in ``q_part_sssp``): edge cost 1
    between strongly-tied parts
    (co-purchased in ≥2 distinct orders), cost 2 for weak ties — the
    weighted sibling of ``q_part_bfs``.

    Scale shape: per-order pair generation is block-local
    (``grouped_apply``), shared-order counts reduce through the
    combiner, and the relaxation runs on the Bellman-Ford BSP grid
    (``ops/graph.sssp_distances``) with per-round traffic bounded by
    the improving frontier. Integer costs make the relaxation
    arithmetic engine-exact; oracled by a recursive-CTE with UNION
    dedup."""
    from jerex_ray.functions.aggregate import (grouped_aggregate,
                                               grouped_apply)
    from jerex_ray.ops.graph import sssp_distances
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    li = read_parquet_sized(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey"])

    def pairs_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"a": pd.Series(dtype="int64"),
                                 "b": pd.Series(dtype="int64")})
        d = df.drop_duplicates(["l_orderkey", "l_partkey"])
        m = d.merge(d, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        return pd.DataFrame({"a": m["l_partkey_x"].to_numpy(),
                             "b": m["l_partkey_y"].to_numpy()})

    pairs = grouped_apply(li, ["l_orderkey"], pairs_block)
    cnt = grouped_aggregate(pairs, ["a", "b"], {"cnt": (None, "count")},
                            result_hint="large")
    weighted = cnt.map_batches(
        lambda df: pd.DataFrame(
            {"a": df["a"].to_numpy(),
             "b": df["b"].to_numpy(),
             "w": np.where(df["cnt"].to_numpy() >= 2, 1.0, 2.0)})
        if not df.empty else pd.DataFrame(
            {"a": pd.Series(dtype="int64"),
             "b": pd.Series(dtype="int64"),
             "w": pd.Series(dtype="float64")}),
        batch_format="pandas")
    out = sssp_distances(weighted, 1, src="a", dst="b", weight="w")
    out["node"] = out["node"].astype("int64")
    out["dist"] = out["dist"].astype("int64")
    return out.reset_index(drop=True)

def q_part_assortativity(sf_dir: str):
    """Newman degree assortativity of the part co-purchase graph
    (``ops/graph.degree_assortativity``): Pearson correlation of
    endpoint degrees over directed stubs, computed with ONE edge-sized
    co-location via stub symmetry (Σx, Σx², Σxy all reduce to
    node-sized sums of deg², deg³, deg·S(u)). Oracled against DuckDB
    ``corr`` over the stub self-join."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.ops.graph import degree_assortativity
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    li = read_parquet_sized(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey"])

    def pairs_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"a": pd.Series(dtype="int64"),
                                 "b": pd.Series(dtype="int64")})
        d = df.drop_duplicates(["l_orderkey", "l_partkey"])
        m = d.merge(d, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        return pd.DataFrame({"a": m["l_partkey_x"].to_numpy(),
                             "b": m["l_partkey_y"].to_numpy()})

    edges = grouped_apply(li, ["l_orderkey"], pairs_block)
    return degree_assortativity(edges)

def q_lineitem_ols2(sf_dir: str):
    """Two-feature grouped OLS (extendedprice ~ quantity + discount per
    returnflag) by the exact normal equations, TWO-PASS for numeric
    parity: pass 1 reduces to per-group means (combiner), the broadcast
    means recenter pass 2's five centered-product sums (Σx̃₁², Σx̃₂²,
    Σx̃₁x̃₂, Σx̃₁ỹ, Σx̃₂ỹ — raw-power sums would cancel catastrophically
    and did flip the 6th decimal at sf0.01), then the 2×2 Cramer solve
    on the |groups|-bounded driver table. The oracle replays the
    identical two-pass arithmetic in SQL (no multivariate regr_*
    exists)."""
    import ray

    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/lineitem.parquet",
                            columns=["l_returnflag", "l_quantity",
                                     "l_discount", "l_extendedprice"])

    st = grouped_aggregate(ds, ["l_returnflag"],
                           {"n": (None, "count"),
                            "s1": ("l_quantity", "sum"),
                            "s2": ("l_discount", "sum"),
                            "sy": ("l_extendedprice", "sum")}) \
        .to_pandas()
    nn = st["n"].to_numpy(np.float64)
    mu = {rf: (s1 / k, s2 / k, sy / k)
          for rf, s1, s2, sy, k in zip(
              st["l_returnflag"], st["s1"].to_numpy(np.float64),
              st["s2"].to_numpy(np.float64),
              st["sy"].to_numpy(np.float64), nn)}
    mu_ref = ray.put(mu)

    def central(df: pd.DataFrame) -> pd.DataFrame:
        means = ray.get(mu_ref)
        m1 = df["l_returnflag"].map({k: v[0] for k, v in means.items()})
        m2 = df["l_returnflag"].map({k: v[1] for k, v in means.items()})
        my = df["l_returnflag"].map({k: v[2] for k, v in means.items()})
        x1 = df["l_quantity"].to_numpy(np.float64) - m1.to_numpy()
        x2 = df["l_discount"].to_numpy(np.float64) - m2.to_numpy()
        y = df["l_extendedprice"].to_numpy(np.float64) - my.to_numpy()
        g = pd.DataFrame({"l_returnflag": df["l_returnflag"].to_numpy(),
                          "c11": x1 * x1, "c22": x2 * x2,
                          "c12": x1 * x2, "c1y": x1 * y,
                          "c2y": x2 * y})
        return g.groupby("l_returnflag", sort=False, as_index=False) \
            .sum()

    m = grouped_aggregate(
        ds.map_batches(central, batch_format="pandas"),
        ["l_returnflag"],
        {k: (k, "sum") for k in ("c11", "c22", "c12", "c1y", "c2y")}) \
        .to_pandas().merge(st, on="l_returnflag")
    n = m["n"].to_numpy(np.float64)
    S11, S22, S12 = m["c11"], m["c22"], m["c12"]
    S1y, S2y = m["c1y"], m["c2y"]
    det = S11 * S22 - S12 * S12
    b1 = (S22 * S1y - S12 * S2y) / det
    b2 = (S11 * S2y - S12 * S1y) / det
    b0 = m["sy"] / n - b1 * m["s1"] / n - b2 * m["s2"] / n
    out = pd.DataFrame({"l_returnflag": m["l_returnflag"],
                        "n": m["n"].astype("int64"),
                        "b_qty": b1.round(6),
                        "b_disc": b2.round(6),
                        "intercept": b0.round(6)})
    return out.sort_values("l_returnflag").reset_index(drop=True)

def q_orders_streak(sf_dir: str):
    """Longest run of strictly-increasing order totals per customer in
    (date, key) order — the gaps-and-islands shape applied to
    monotonicity (streak features feed churn/LTV models). Customers
    co-locate in ONE hash shuffle; each block computes runs vectorized:
    a boolean "rise" vector, island ids by cumulative sum of breaks,
    max island length per customer. Oracled by the SQL islands
    construction (row_number difference over the rise flag)."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/orders.parquet",
                            columns=["o_custkey", "o_orderkey",
                                     "o_orderdate", "o_totalprice"])

    def streaks(block: pd.DataFrame) -> pd.DataFrame:
        if block.empty:
            return pd.DataFrame({"o_custkey": pd.Series(dtype="int64"),
                                 "n_orders": pd.Series(dtype="int64"),
                                 "max_streak": pd.Series(dtype="int64")})
        b = block.sort_values(["o_custkey", "o_orderdate",
                               "o_orderkey"])
        cust = b["o_custkey"].to_numpy()
        price = b["o_totalprice"].to_numpy(np.float64)
        same = np.r_[False, cust[1:] == cust[:-1]]
        rise = np.r_[False, price[1:] > price[:-1]] & same
        # island id increments whenever the run breaks
        island = np.cumsum(~rise)
        runs = pd.DataFrame({"cust": cust, "island": island}) \
            .groupby(["cust", "island"], sort=False).size()
        mx = runs.groupby(level=0).max()
        cnt = pd.Series(cust).value_counts()
        return pd.DataFrame({"o_custkey": mx.index.to_numpy(np.int64),
                             "n_orders": cnt.loc[mx.index]
                             .to_numpy(np.int64),
                             "max_streak": mx.to_numpy(np.int64)})

    out = grouped_apply(ds, ["o_custkey"], streaks).to_pandas()
    out = out.astype({"o_custkey": "int64", "n_orders": "int64",
                      "max_streak": "int64"})
    return out.sort_values("o_custkey").reset_index(drop=True)

def q_orders_interarrival(sf_dir: str):
    """Median days between consecutive orders per customer (orders in
    (date, key) order) — the repurchase-cadence feature. Customers
    co-locate in ONE hash shuffle; each block computes lag diffs and
    the exact type-7 median vectorized per customer. Customers with
    one order have no gaps and are excluded (matching the SQL lag
    semantics)."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/orders.parquet",
                            columns=["o_custkey", "o_orderkey",
                                     "o_orderdate"])

    def gaps(block: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"o_custkey": pd.Series(dtype="int64"),
                            "n_gaps": pd.Series(dtype="int64"),
                            "median_gap_days":
                                pd.Series(dtype="float64")})
        if block.empty:
            return out
        b = block.sort_values(["o_custkey", "o_orderdate",
                               "o_orderkey"])
        cust = b["o_custkey"].to_numpy()
        d = b["o_orderdate"].astype("datetime64[us]").astype("int64") \
            .to_numpy() // 86_400_000_000
        same = cust[1:] == cust[:-1]
        gap = (d[1:] - d[:-1])[same].astype(np.float64)
        who = cust[1:][same]
        if len(gap) == 0:
            return out
        rows = []
        gdf = pd.DataFrame({"c": who, "g": gap})
        for c, g in gdf.groupby("c", sort=False):
            v = np.sort(g["g"].to_numpy(np.float64))
            # type-7 median == quantile_cont(0.5)
            mid = 0.5 * (len(v) - 1)
            lo, hi = int(np.floor(mid)), int(np.ceil(mid))
            med = v[lo] + (v[hi] - v[lo]) * (mid - lo)
            rows.append((c, len(v), round(float(med), 6)))
        return pd.DataFrame(rows, columns=["o_custkey", "n_gaps",
                                           "median_gap_days"])

    out = grouped_apply(ds, ["o_custkey"], gaps).to_pandas()
    out = out.astype({"o_custkey": "int64", "n_gaps": "int64"})
    return out.sort_values("o_custkey").reset_index(drop=True)

def q_part_powerlaw_alpha(sf_dir: str, *, dmin: int = 2):
    """Power-law exponent of the co-purchase degree distribution by the
    continuous MLE (Clauset-Shalizi-Newman '09 eq. 3.1):
    α = 1 + n / Σ ln(d/d_min) over nodes with degree ≥ d_min — the
    scale-free-ness diagnostic for the graphs dedup builds. Degrees
    come from one combiner aggregate over exploded endpoints; the MLE
    reduces to two scalars (n, Σln)."""
    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply
    from jerex_ray.ops.graph import _canonical_edges, _directed_edges
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    li = read_parquet_sized(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey"])

    def pairs_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"a": pd.Series(dtype="int64"),
                                 "b": pd.Series(dtype="int64")})
        d = df.drop_duplicates(["l_orderkey", "l_partkey"])
        m = d.merge(d, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        return pd.DataFrame({"a": m["l_partkey_x"].to_numpy(),
                             "b": m["l_partkey_y"].to_numpy()})

    edges = _canonical_edges(grouped_apply(li, ["l_orderkey"],
                                           pairs_block),
                             src="a", dst="b")
    deg = grouped_aggregate(_directed_edges(edges, src="a", dst="b",
                                            undirected=True),
                            ["u"], {"deg": (None, "count")},
                            result_hint="large")

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "deg" not in df.columns:
            return pd.DataFrame({"__all": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64"),
                                 "slog": pd.Series(dtype="float64")})
        d = df["deg"].to_numpy(np.float64)
        d = d[d >= dmin]
        if len(d) == 0:
            return pd.DataFrame({"__all": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64"),
                                 "slog": pd.Series(dtype="float64")})
        return pd.DataFrame({"__all": [np.int64(0)],
                             "n": [np.int64(len(d))],
                             "slog": [np.sum(np.log(d / float(dmin)))]})

    m = grouped_aggregate(
        deg.map_batches(partials, batch_format="pandas",
                        batch_size=None),
        ["__all"], {"n": ("n", "sum"),
                    "slog": ("slog", "sum")}).to_pandas()
    n = float(m["n"][0])
    alpha = 1.0 + n / float(m["slog"][0])
    return pd.DataFrame({"n_tail_nodes": [np.int64(n)],
                         "alpha": [round(alpha, 6)]})

def q_part_hits(sf_dir: str):
    """HITS hubs (customers) & authorities (parts) over the
    customer–part bipartite purchase graph (``ops/graph.hits``): the
    orders⋈lineitem incidence is a hash-partitioned fact-fact
    ``Dataset.join``; iterations broadcast node-sized score vectors
    and reduce per-destination partials through the combiner.
    Unnormalized iterates are exact integers in float64, so the
    chained-CTE oracle matches bit-for-bit; only the final L1
    normalization rounds."""
    from jerex_ray.ops.graph import hits
    from jerex_ray.runtime import read_parquet_sized, shuffle_partitions
    configure_data_context()
    li = read_parquet_sized(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey"])
    orders = read_parquet_sized(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_custkey"])
    j = li.join(orders, join_type="inner",
                num_partitions=shuffle_partitions(8),
                on=("l_orderkey",), right_on=("o_orderkey",))
    out = hits(j, hub_col="o_custkey", auth_col="l_partkey", iters=4)
    out["node"] = out["node"].astype("int64")
    return out

def q_basket_rules(sf_dir: str):
    """Pair association rules over order baskets
    (``ops/baskets.association_rules``, Apriori's 2-itemset tier):
    distinct (order, part) incidences reduce through the combiner,
    one basket hash shuffle emits vectorized item-pair wedges
    (bounded by basket size²), the item-frequency table broadcasts
    into the streaming score pass. Counts are integer-exact; every
    statistic is one division, matching the SQL self-join oracle
    bit-for-bit before the shared 6-decimal rounding."""
    from jerex_ray.ops.baskets import association_rules
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    li = read_parquet_sized(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey"])
    out = association_rules(li, basket_col="l_orderkey",
                            item_col="l_partkey",
                            min_pair_count=2).to_pandas()
    return out.sort_values(["antecedent", "consequent"]) \
        .reset_index(drop=True)

def q_lineitem_zorder(sf_dir: str):
    """Z-order clustering audit of lineitem on (l_partkey, l_suppkey)
    (``ops/layout``, the Delta/Iceberg Z-ORDER primitive): vectorized
    Morton interleave, exact-integer bucket assignment
    zval·64 // (maxz+1), per-bucket zone-map envelopes through the
    combiner. Everything is integer arithmetic, so the generated SQL
    bit-expression oracle replays it exactly."""
    from jerex_ray.ops.layout import zorder_layout_stats
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/lineitem.parquet",
                            columns=["l_partkey", "l_suppkey"])
    return zorder_layout_stats(ds, cols=["l_partkey", "l_suppkey"],
                               nbuckets=64)

def _zorder_oracle_sql(cols=("l_partkey", "l_suppkey"),
                       nbuckets: int = 64, bits: int = 16) -> str:
    """Generated bit-interleave oracle for ``q_lineitem_zorder``:
    bit i of column j lands at position i·k + j, matching
    ``ops/layout.morton_interleave``."""
    k = len(cols)
    terms = [f"((({c} >> {i}) & 1) << {i * k + j})"
             for j, c in enumerate(cols) for i in range(bits)]
    zexpr = "\n                 + ".join(terms)
    aggs = ",\n                   ".join(
        f"min({c}) AS {c}_min, max({c}) AS {c}_max" for c in cols)
    return f"""
        WITH z AS (
            SELECT {', '.join(cols)},
                   ({zexpr}) AS zval
            FROM lineitem),
        mx AS (SELECT max(zval) AS m FROM z),
        b AS (
            SELECT {', '.join(cols)},
                   (zval * {nbuckets}) // ((SELECT m FROM mx) + 1)
                       AS bucket
            FROM z)
        SELECT bucket, count(*) AS n,
               {aggs}
        FROM b GROUP BY bucket ORDER BY bucket
    """

def q_part_modularity(sf_dir: str):
    """Newman modularity of the BRAND partition over the part
    co-purchase graph — does purchasing cluster along brand lines?
    Per brand: within-community edges e_c, degree mass d_c, and the
    contribution e_c/m − (d_c/2m)² (Q = Σ contributions). Edges are
    the combiner-distinct per-order wedges; the brand map is a
    dimension broadcast; every statistic is an exact-integer count
    with identically-sequenced divisions, so the SQL oracle agrees
    bit-for-bit before rounding."""
    import ray

    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    li = read_parquet_sized(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey"])
    brand = pd.read_parquet(f"{sf_dir}/part.parquet",
                            columns=["p_partkey", "p_brand"])
    bmap = ray.put(dict(zip(brand["p_partkey"], brand["p_brand"])))

    def pairs_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"a": pd.Series(dtype="int64"),
                                 "b": pd.Series(dtype="int64")})
        d = df.drop_duplicates(["l_orderkey", "l_partkey"])
        m = d.merge(d, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        return pd.DataFrame({"a": m["l_partkey_x"].to_numpy(),
                             "b": m["l_partkey_y"].to_numpy()})

    edges = grouped_aggregate(
        grouped_apply(li, ["l_orderkey"], pairs_block),
        ["a", "b"], {"n": (None, "count")}, result_hint="large") \
        .drop_columns(["n"]).materialize()
    n_edges = int(edges.count())

    def within_partial(df: pd.DataFrame) -> pd.DataFrame:
        bm = ray.get(bmap)
        ba = df["a"].map(bm)
        bb = df["b"].map(bm)
        same = ba[ba == bb]
        g = same.value_counts()
        return pd.DataFrame({"brand": g.index.to_numpy(),
                             "ec": g.to_numpy(np.int64)})

    within = grouped_aggregate(
        edges.map_batches(within_partial, batch_format="pandas"),
        ["brand"], {"ec": ("ec", "sum")}).to_pandas()

    def stub_partial(df: pd.DataFrame) -> pd.DataFrame:
        bm = ray.get(bmap)
        s = pd.concat([df["a"].map(bm), df["b"].map(bm)])
        g = s.value_counts()
        return pd.DataFrame({"brand": g.index.to_numpy(),
                             "dc": g.to_numpy(np.int64)})

    dsum = grouped_aggregate(
        edges.map_batches(stub_partial, batch_format="pandas"),
        ["brand"], {"dc": ("dc", "sum")}).to_pandas()
    out = dsum.merge(within, on="brand", how="left")
    out["ec"] = out["ec"].fillna(0).astype("int64")
    out["dc"] = out["dc"].astype("int64")
    m = float(n_edges)
    ec = out["ec"].to_numpy(np.float64)
    dc = out["dc"].to_numpy(np.float64)
    out["contribution"] = np.round(
        ec / m - (dc / (2.0 * m)) * (dc / (2.0 * m)), 6)
    out = out.rename(columns={"ec": "n_within", "dc": "deg_sum"})
    return out[["brand", "n_within", "deg_sum", "contribution"]] \
        .sort_values("brand").reset_index(drop=True)

def q_supplier_hhi(sf_dir: str):
    """Herfindahl–Hirschman revenue-concentration index per nation:
    supplier revenue shares within each nation, HHI = Σ share².
    lineitem streams once (revenue partials per supplier through the
    combiner); the supplier→nation map is a dimension broadcast;
    the nation-level share/square pass is vocabulary-bounded.
    Shares are single divisions of the same sums on both sides;
    6-decimal rounding absorbs summation order."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.functions.join import broadcast_join
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    li = read_parquet_sized(f"{sf_dir}/lineitem.parquet",
                            columns=["l_suppkey", "l_extendedprice",
                                     "l_discount"])

    def rev(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_suppkey": df["l_suppkey"].to_numpy(),
            "revenue": df["l_extendedprice"].to_numpy(np.float64)
            * (1.0 - df["l_discount"].to_numpy(np.float64))})

    per_supp = grouped_aggregate(
        li.map_batches(rev, batch_format="pandas"),
        ["l_suppkey"], {"revenue": ("revenue", "sum")})
    supp = pd.read_parquet(f"{sf_dir}/supplier.parquet",
                           columns=["s_suppkey", "s_nationkey"])
    j = broadcast_join(per_supp, supp, left_on="l_suppkey",
                       right_on="s_suppkey").to_pandas()
    tot = j.groupby("s_nationkey")["revenue"].transform("sum")
    share = j["revenue"].to_numpy(np.float64) / tot.to_numpy(np.float64)
    j = j.assign(sq=share * share)
    out = (j.groupby("s_nationkey")
           .agg(n_suppliers=("l_suppkey", "count"), hhi=("sq", "sum"))
           .reset_index().rename(columns={"s_nationkey": "nationkey"}))
    out["nationkey"] = out["nationkey"].astype("int64")
    out["n_suppliers"] = out["n_suppliers"].astype("int64")
    out["hhi"] = out["hhi"].round(6)
    return out.sort_values("nationkey").reset_index(drop=True)

def q_basket_triples(sf_dir: str):
    """Frequent 3-itemsets over order baskets — Apriori proper
    (``ops/baskets.frequent_triples``): frequent pairs → prefix-join
    candidate generation with (b,c) pruning (anti-monotone, lossless
    at the shared min_count) → one streaming support-count pass with
    block-local membership semi-joins. Integer-exact vs the 3-way
    self-join SQL oracle (which needs no pruning — it IS the ground
    truth the pruned engine must reproduce)."""
    from jerex_ray.ops.baskets import frequent_triples
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    li = read_parquet_sized(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey"])
    return frequent_triples(li, basket_col="l_orderkey",
                            item_col="l_partkey", min_count=2)

def q_join_skew_audit(sf_dir: str):
    """Pre-join skew diagnostic for orders⋈lineitem on orderkey —
    the audit you run BEFORE committing to a hash join at scale:
    per-side key-fanout distribution (n_keys, total, max, exact
    p50/p99 of rows-per-key via the shuffle-free quantile selector
    over the key-cardinality-bounded counts Dataset — never
    collected). A hot key on both sides multiplies; the planner
    (``q_events_partition_plan``) is the mitigation. Integer counts
    + quantile_cont-parity percentiles; SQL-oracled."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.ops.quantiles import distributed_quantiles
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    sides = [
        ("lineitem", read_parquet_sized(
            f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"]),
         "l_orderkey"),
        ("orders", read_parquet_sized(
            f"{sf_dir}/orders.parquet", columns=["o_orderkey"]),
         "o_orderkey"),
    ]
    rows = []
    for name, ds, key in sides:
        counts = grouped_aggregate(ds, [key], {"n": (None, "count")},
                                   result_hint="large").materialize()

        def as_float(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"n": df["n"].to_numpy(np.float64)})

        cf = counts.map_batches(as_float, batch_format="pandas")
        p50, p99 = distributed_quantiles(cf, "n", [0.5, 0.99])
        stats = grouped_aggregate(
            counts.map_batches(
                lambda df: pd.DataFrame(
                    {"__all": [0], "keys": [len(df)],
                     "total": [int(df["n"].sum())],
                     "mx": [int(df["n"].max()) if len(df) else 0]}),
                batch_format="pandas", batch_size=None),
            ["__all"], {"keys": ("keys", "sum"),
                        "total": ("total", "sum"),
                        "mx": ("mx", "max")}).to_pandas().iloc[0]
        rows.append((name, np.int64(stats["keys"]),
                     np.int64(stats["total"]), np.int64(stats["mx"]),
                     round(float(p50), 6), round(float(p99), 6)))
    return pd.DataFrame(rows, columns=["side", "n_keys", "total_rows",
                                       "max_rows", "p50_rows",
                                       "p99_rows"]) \
        .sort_values("side").reset_index(drop=True)

def q_part_harmonic(sf_dir: str, *, n_sources: int = 8):
    """Harmonic centrality (Boldi-Vigna '14) of the ``n_sources``
    smallest parts in the co-purchase graph — the sampled-source
    centrality sweep every graph-health audit runs. ONE
    ``multi_bfs_levels`` grid pass carries all K sources' frontiers
    over a single edge partitioning (K separate BFS runs would
    re-shuffle the edge table K times). Exactness: levels are capped
    at 8 on BOTH engines (the dense co-purchase graph's eccentricity
    is ~3), and the harmonic sum is computed as the INTEGER
    ``h840 = Σ 840/level`` (840 = lcm(1..8), so every term is exact)
    — the float column is just h840/840 rounded, no accumulation-order
    hazard."""
    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply
    from jerex_ray.ops.graph import multi_bfs_levels
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    li = read_parquet_sized(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey"])

    def pairs_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"a": pd.Series(dtype="int64"),
                                 "b": pd.Series(dtype="int64")})
        d = df.drop_duplicates(["l_orderkey", "l_partkey"])
        m = d.merge(d, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        return pd.DataFrame({"a": m["l_partkey_x"].to_numpy(),
                             "b": m["l_partkey_y"].to_numpy()})

    parts = grouped_aggregate(
        li.map_batches(lambda df: df[["l_partkey"]],
                       batch_format="pandas"),
        ["l_partkey"], {"n": (None, "count")}).to_pandas()
    sources = sorted(parts["l_partkey"].astype("int64"))[:n_sources]
    edges = grouped_apply(li, ["l_orderkey"], pairs_block)
    lv = multi_bfs_levels(edges, sources, src="a", dst="b",
                          max_rounds=8)
    lv = lv[lv["level"] > 0]
    g = lv.assign(term=(840 // lv["level"]).astype("int64")) \
        .groupby("source", sort=False) \
        .agg(n_reached=("node", "size"), h840=("term", "sum")) \
        .reindex(sources, fill_value=0).reset_index()
    g["harmonic"] = _round_half_away(
        g["h840"].to_numpy(np.float64) / 840.0, 6)
    return pd.DataFrame({"src": np.asarray(sources, dtype=np.int64),
                         "n_reached": g["n_reached"].astype("int64"),
                         "h840": g["h840"].astype("int64"),
                         "harmonic": g["harmonic"].astype("float64")})

def q_part_wl_colors(sf_dir: str, *, rounds: int = 2):
    """1-WL color refinement (Weisfeiler-Lehman '68 — the graph
    fingerprint GNN expressivity is measured against) over the part
    co-purchase graph: round-0 color = distinct-neighbor degree,
    round r color = md5(own ‖ '|' ‖ comma-joined SORTED neighbor
    colors). Per round: ONE co-location of the symmetric edge table
    by destination (``grouped_apply``), neighbor colors attached from
    the broadcast node→color table (node-vocabulary-bounded — the
    same contract as the HITS/PageRank vectors), new colors collected
    driver-side to refresh the broadcast. Color strings are pure
    ASCII (digits / md5 hex) so Python ``sorted`` = DuckDB binary
    ``ORDER BY`` and the digests match bit-for-bit. Output: the
    color-class histogram after ``rounds`` refinements."""
    import hashlib

    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    li = read_parquet_sized(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey"])

    def pairs_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"u": pd.Series(dtype="int64"),
                                 "v": pd.Series(dtype="int64")})
        d = df.drop_duplicates(["l_orderkey", "l_partkey"])
        m = d.merge(d, on="l_orderkey")
        m = m[m["l_partkey_x"] != m["l_partkey_y"]]
        return pd.DataFrame({"u": m["l_partkey_x"].to_numpy(),
                             "v": m["l_partkey_y"].to_numpy()})

    # symmetric directed edges; (u,v) dupes across orders removed
    # inside each u's co-located block (block-local dedup IS global
    # dedup — all rows of a u land in one block)
    # materialized once: three co-location passes (degree + 2 rounds)
    # consume it; lazy re-execution would re-read and re-shuffle
    sym = grouped_apply(li, ["l_orderkey"], pairs_block).materialize()

    def deg_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"u": pd.Series(dtype="int64"),
                                 "c": pd.Series(dtype="object")})
        d = df.drop_duplicates(["u", "v"]).groupby("u", sort=False) \
            .size().reset_index(name="n")
        return pd.DataFrame({"u": d["u"].to_numpy(),
                             "c": d["n"].astype(str).to_numpy()})

    colors = grouped_apply(sym, ["u"], deg_block).to_pandas()
    cmap = dict(zip(colors["u"].astype("int64"),
                    colors["c"].astype(str)))

    for _ in range(rounds):
        cur = cmap

        def refine_block(df: pd.DataFrame,
                         _cm=cur) -> pd.DataFrame:
            if df.empty:
                return pd.DataFrame({"u": pd.Series(dtype="int64"),
                                     "c": pd.Series(dtype="object")})
            d = df.drop_duplicates(["u", "v"]).copy()
            d["cv"] = d["v"].map(_cm)
            rows = []
            for u, grp in d.groupby("u", sort=False):
                joined = ",".join(sorted(grp["cv"].tolist()))
                rows.append((int(u), hashlib.md5(
                    (_cm[int(u)] + "|" + joined).encode()
                ).hexdigest()))
            return pd.DataFrame(rows, columns=["u", "c"])

        colors = grouped_apply(sym, ["u"], refine_block).to_pandas()
        cmap = dict(zip(colors["u"].astype("int64"),
                        colors["c"].astype(str)))

    hist = colors.groupby("c", sort=False).size() \
        .reset_index(name="n_nodes")
    hist.columns = ["color", "n_nodes"]
    hist["n_nodes"] = hist["n_nodes"].astype("int64")
    return hist.sort_values("color").reset_index(drop=True)

def q_supplier_adamic(sf_dir: str):
    """Adamic-Adar link prediction over the supplier–part bipartite
    graph (``ops/graph.adamic_adar``): top-50 supplier pairs by
    Σ 1/ln(deg(part)) over shared parts — the hub-discounted
    companion of ``q_supplier_jaccard`` on the same incidence. Wedge
    weights are computed inside the part-co-located block (degree =
    local group size), so no degree join is shipped; ranking is
    round-before-rank on the 6-dp score."""
    from jerex_ray.ops.graph import adamic_adar
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/lineitem.parquet",
                            columns=["l_suppkey", "l_partkey"])
    out = adamic_adar(ds, left_col="l_suppkey",
                      right_col="l_partkey", top_k=50)
    return out

def _kcore_oracle_sql(k: int = 80, rounds: int = 8) -> str:
    """Chained-CTE replay of ``q_part_kcore``: the co-purchase edge
    CTE, then one (degree → alive → filtered-edge) CTE triple per peel
    round, finally the surviving nodes with in-core degrees."""
    # AS MATERIALIZED: without it DuckDB inlines every CTE reference,
    # re-opening the parquet once per mention — 8 chained rounds blow
    # the open-file limit and redo the self-join 2^8 times
    sql = """
        WITH e0 AS MATERIALIZED (
            SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
        )"""
    prev = "e0"
    for r in range(1, rounds + 1):
        sql += f""",
        d{r} AS MATERIALIZED (SELECT u, count(*) AS dg FROM (
            SELECT a AS u FROM {prev} UNION ALL SELECT b FROM {prev})
            GROUP BY u),
        a{r} AS MATERIALIZED (SELECT u FROM d{r} WHERE dg >= {k}),
        e{r} AS MATERIALIZED (SELECT a, b FROM {prev}
                 WHERE a IN (SELECT u FROM a{r})
                   AND b IN (SELECT u FROM a{r}))"""
        prev = f"e{r}"
    sql += f"""
        SELECT u AS node, count(*) AS deg FROM (
            SELECT a AS u FROM {prev} UNION ALL SELECT b FROM {prev})
        GROUP BY u ORDER BY node"""
    return sql

def _hits_oracle_sql(iters: int = 4) -> str:
    """Chained-CTE recomputation of ``q_part_hits``: distinct
    customer–part incidences, then one authority CTE and one hub CTE
    per HITS iteration (unnormalized — exact integers — mirroring
    ``ops/graph.hits``), with a single L1 normalization at the end."""
    sql = """
        WITH e AS MATERIALIZED (
            SELECT DISTINCT o_custkey AS u, l_partkey AS v
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        h0 AS (SELECT u, 1.0 AS s FROM (SELECT DISTINCT u FROM e))"""
    prev_h = "h0"
    for k in range(1, iters + 1):
        sql += f""",
        a{k} AS MATERIALIZED (
            SELECT v, sum({prev_h}.s) AS s
            FROM e JOIN {prev_h} USING (u) GROUP BY v),
        h{k} AS MATERIALIZED (
            SELECT u, sum(a{k}.s) AS s
            FROM e JOIN a{k} USING (v) GROUP BY u)"""
        prev_h = f"h{k}"
    last = iters
    sql += f"""
        SELECT side, node, score FROM (
            SELECT 'auth' AS side, v AS node,
                   round(s / (SELECT sum(s) FROM a{last}), 6) AS score
            FROM a{last}
            UNION ALL
            SELECT 'hub', u,
                   round(s / (SELECT sum(s) FROM h{last}), 6)
            FROM h{last})
        ORDER BY side, node"""
    return sql

QUERIES = {
    'q_part_assortativity': q_part_assortativity,
    'q_lineitem_ols2': q_lineitem_ols2,
    'q_orders_streak': q_orders_streak,
    'q_orders_interarrival': q_orders_interarrival,
    'q_part_powerlaw_alpha': q_part_powerlaw_alpha,
    'q_part_hits': q_part_hits,
    'q_basket_rules': q_basket_rules,
    'q_lineitem_zorder': q_lineitem_zorder,
    'q_part_modularity': q_part_modularity,
    'q_supplier_hhi': q_supplier_hhi,
    'q_basket_triples': q_basket_triples,
    'q_join_skew_audit': q_join_skew_audit,
    'q1_pricing_summary': R.q1_pricing_summary,
    'q_top_customer_revenue': R.q_top_customer_revenue,
    'q_building_revenue': R.q_building_revenue,
    'q_customers_per_region': R.q_customers_per_region,
    'q_priciest_parts': R.q_priciest_parts,
    'q_supplier_balance': R.q_supplier_balance,
    'q_segment_avg_balance': R.q_segment_avg_balance,
    'q_distinct_segments': R.q_distinct_segments,
    'q_urgent_orders': R.q_urgent_orders,
    'q_customers_without_orders': R.q_customers_without_orders,
    'q_customers_with_orders_count': R.q_customers_with_orders_count,
    'q_distinct_event_users': q_distinct_event_users,
    'q_top_parts_per_brand': q_top_parts_per_brand,
    'q_orders_events_window': q_orders_events_window,
    'q_orders_last_event': q_orders_last_event,
    'q5_regional_supplier_revenue': R.q5_regional_supplier_revenue,
    'q18_large_volume_orders': R.q18_large_volume_orders,
    'q4_order_priority': R.q4_order_priority,
    'q3_shipping_priority': R.q3_shipping_priority,
    'q8_market_share': R.q8_market_share,
    'q9_product_profit': R.q9_product_profit,
    'q17_small_quantity_revenue': R.q17_small_quantity_revenue,
    'q19_disjunctive_revenue': R.q19_disjunctive_revenue,
    'q21_waiting_suppliers': R.q21_waiting_suppliers,
    'q2_min_cost_supplier': R.q2_min_cost_supplier,
    'q11_important_parts': R.q11_important_parts,
    'q12_priority_lines': R.q12_priority_lines,
    'q16_part_supplier_counts': R.q16_part_supplier_counts,
    'q20_dominant_suppliers': R.q20_dominant_suppliers,
    'q_part_sssp_tiered': q_part_sssp_tiered,
    'q6_forecast_revenue': R.q6_forecast_revenue,
    'q14_promo_revenue': R.q14_promo_revenue,
    'q15_top_supplier': R.q15_top_supplier,
    'q10_returned_items': R.q10_returned_items,
    'q13_order_distribution': R.q13_order_distribution,
    'q7_nation_volume': R.q7_nation_volume,
    'q22_idle_balance': R.q22_idle_balance,
    'q_revenue_rollup': R.q_revenue_rollup,
    'q_part_triangles': q_part_triangles,
    'q_part_kcore': q_part_kcore,
    'q_orders_next_event': q_orders_next_event,
    'q_part_harmonic': q_part_harmonic,
    'q_part_wl_colors': q_part_wl_colors,
    'q_supplier_adamic': q_supplier_adamic,
    'q_lineitem_corr': q_lineitem_corr,
    'q_orders_cohort_retention': q_orders_cohort_retention,
    'q_supplier_jaccard': q_supplier_jaccard,
    'q_customer_rfm': q_customer_rfm,
    'q_part_skyline': q_part_skyline,
    'q_part_bfs': q_part_bfs,
    'q_revenue_cube': q_revenue_cube,
    'q_referential_integrity': q_referential_integrity,
    'q_part_clustering': q_part_clustering,
    'q_orders_benford_shares': q_orders_benford_shares,
    'q_orders_profile': q_orders_profile,
    'q_part_abc': q_part_abc,
}

ORACLES = {
    'q_part_assortativity': """
            WITH e AS (
                SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
                FROM lineitem a JOIN lineitem b
                  ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey),
            stubs AS (
                SELECT a AS u, b AS v FROM e
                UNION ALL SELECT b, a FROM e),
            deg AS (SELECT u, count(*) AS deg FROM stubs GROUP BY u)
            SELECT (SELECT count(*) FROM deg) AS n_nodes,
                   (SELECT count(*) FROM e) AS n_edges,
                   round(corr(CAST(d1.deg AS DOUBLE),
                              CAST(d2.deg AS DOUBLE)), 6) AS r
            FROM stubs s
            JOIN deg d1 ON s.u = d1.u
            JOIN deg d2 ON s.v = d2.u
        """,
    'q_lineitem_ols2': """
            WITH mu AS (
                SELECT l_returnflag, count(*) AS n,
                       sum(CAST(l_quantity AS DOUBLE)) AS s1,
                       sum(CAST(l_discount AS DOUBLE)) AS s2,
                       sum(CAST(l_extendedprice AS DOUBLE)) AS sy,
                       sum(CAST(l_quantity AS DOUBLE)) / count(*)
                           AS m1,
                       sum(CAST(l_discount AS DOUBLE)) / count(*)
                           AS m2,
                       sum(CAST(l_extendedprice AS DOUBLE)) / count(*)
                           AS my
                FROM lineitem GROUP BY l_returnflag),
            c AS (
                SELECT l.l_returnflag, mu.n, mu.s1, mu.s2, mu.sy,
                       sum((CAST(l_quantity AS DOUBLE) - m1)
                           * (CAST(l_quantity AS DOUBLE) - m1))
                           AS c11,
                       sum((CAST(l_discount AS DOUBLE) - m2)
                           * (CAST(l_discount AS DOUBLE) - m2))
                           AS c22,
                       sum((CAST(l_quantity AS DOUBLE) - m1)
                           * (CAST(l_discount AS DOUBLE) - m2))
                           AS c12,
                       sum((CAST(l_quantity AS DOUBLE) - m1)
                           * (CAST(l_extendedprice AS DOUBLE) - my))
                           AS c1y,
                       sum((CAST(l_discount AS DOUBLE) - m2)
                           * (CAST(l_extendedprice AS DOUBLE) - my))
                           AS c2y
                FROM lineitem l JOIN mu
                  ON mu.l_returnflag = l.l_returnflag
                GROUP BY l.l_returnflag, mu.n, mu.s1, mu.s2, mu.sy),
            b AS (
                SELECT l_returnflag, n, s1, s2, sy,
                       (c22 * c1y - c12 * c2y)
                           / (c11 * c22 - c12 * c12) AS b1,
                       (c11 * c2y - c12 * c1y)
                           / (c11 * c22 - c12 * c12) AS b2
                FROM c)
            SELECT l_returnflag, CAST(n AS BIGINT) AS n,
                   round(b1, 6) AS b_qty, round(b2, 6) AS b_disc,
                   round(sy / n - b1 * s1 / n - b2 * s2 / n, 6)
                       AS intercept
            FROM b ORDER BY l_returnflag
        """,
    'q_part_powerlaw_alpha': """
            WITH e AS (
                SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
                FROM lineitem a JOIN lineitem b
                  ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey),
            stubs AS (SELECT a AS u FROM e
                      UNION ALL SELECT b FROM e),
            deg AS (SELECT u, count(*) AS deg FROM stubs GROUP BY u),
            t AS (SELECT CAST(deg AS DOUBLE) AS d
                  FROM deg WHERE deg >= 2)
            SELECT CAST(count(*) AS BIGINT) AS n_tail_nodes,
                   round(1.0 + count(*) / sum(ln(d / 2.0)), 6)
                       AS alpha
            FROM t
        """,
    'q_orders_interarrival': """
            WITH d AS (
                SELECT o_custkey,
                       CAST(epoch_us(CAST(o_orderdate AS TIMESTAMP))
                            AS BIGINT) // 86400000000 AS day,
                       o_orderkey
                FROM orders),
            g AS (
                SELECT o_custkey,
                       day - lag(day) OVER (PARTITION BY o_custkey
                           ORDER BY day, o_orderkey) AS gap
                FROM d)
            SELECT o_custkey, CAST(count(gap) AS BIGINT) AS n_gaps,
                   round(quantile_cont(CAST(gap AS DOUBLE), 0.5), 6)
                       AS median_gap_days
            FROM g WHERE gap IS NOT NULL
            GROUP BY o_custkey ORDER BY o_custkey
        """,
    'q_orders_streak': """
            WITH o AS (
                SELECT o_custkey, o_totalprice,
                       row_number() OVER (PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey) AS rn,
                       CASE WHEN o_totalprice > lag(o_totalprice)
                           OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey)
                           THEN 0 ELSE 1 END AS brk
                FROM orders),
            i AS (
                SELECT o_custkey, rn,
                       sum(brk) OVER (PARTITION BY o_custkey
                                      ORDER BY rn) AS island
                FROM o),
            runs AS (
                SELECT o_custkey, island, count(*) AS len
                FROM i GROUP BY o_custkey, island),
            c AS (SELECT o_custkey, count(*) AS n_orders
                  FROM orders GROUP BY o_custkey)
            SELECT c.o_custkey, CAST(c.n_orders AS BIGINT) AS n_orders,
                   CAST(max(r.len) AS BIGINT) AS max_streak
            FROM runs r JOIN c USING (o_custkey)
            GROUP BY c.o_custkey, c.n_orders ORDER BY c.o_custkey
        """,
    'q_join_skew_audit': """
            WITH lc AS (
                SELECT l_orderkey AS k, count(*) AS n
                FROM lineitem GROUP BY 1),
            oc AS (
                SELECT o_orderkey AS k, count(*) AS n
                FROM orders GROUP BY 1),
            l AS (
                SELECT 'lineitem' AS side, count(*) AS n_keys,
                       sum(n) AS total_rows, max(n) AS max_rows,
                       quantile_cont(CAST(n AS DOUBLE), 0.5) AS p50,
                       quantile_cont(CAST(n AS DOUBLE), 0.99) AS p99
                FROM lc),
            o AS (
                SELECT 'orders' AS side, count(*) AS n_keys,
                       sum(n) AS total_rows, max(n) AS max_rows,
                       quantile_cont(CAST(n AS DOUBLE), 0.5) AS p50,
                       quantile_cont(CAST(n AS DOUBLE), 0.99) AS p99
                FROM oc)
            SELECT side, CAST(n_keys AS BIGINT) AS n_keys,
                   CAST(total_rows AS BIGINT) AS total_rows,
                   CAST(max_rows AS BIGINT) AS max_rows,
                   round(p50, 6) AS p50_rows, round(p99, 6) AS p99_rows
            FROM (SELECT * FROM l UNION ALL SELECT * FROM o)
            ORDER BY side
        """,
    'q_part_modularity': """
            WITH inc AS MATERIALIZED (
                SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                FROM lineitem),
            e AS MATERIALIZED (
                SELECT DISTINCT a.p AS pa, b.p AS pb
                FROM inc a JOIN inc b ON a.o = b.o AND a.p < b.p),
            mm AS (SELECT CAST(count(*) AS DOUBLE) AS m FROM e),
            deg AS (
                SELECT u, count(*) AS d FROM (
                    SELECT pa AS u FROM e
                    UNION ALL SELECT pb FROM e)
                GROUP BY u),
            br AS (SELECT p_partkey, p_brand FROM part),
            w AS (
                SELECT x.p_brand AS brand, count(*) AS ec
                FROM e JOIN br x ON x.p_partkey = e.pa
                       JOIN br y ON y.p_partkey = e.pb
                WHERE x.p_brand = y.p_brand
                GROUP BY x.p_brand),
            ds AS (
                SELECT br.p_brand AS brand, sum(deg.d) AS dc
                FROM deg JOIN br ON br.p_partkey = deg.u
                GROUP BY br.p_brand)
            SELECT ds.brand,
                   CAST(coalesce(w.ec, 0) AS BIGINT) AS n_within,
                   CAST(ds.dc AS BIGINT) AS deg_sum,
                   round(coalesce(w.ec, 0) / (SELECT m FROM mm)
                         - (ds.dc / (2.0 * (SELECT m FROM mm)))
                           * (ds.dc / (2.0 * (SELECT m FROM mm))), 6)
                       AS contribution
            FROM ds LEFT JOIN w USING (brand)
            ORDER BY brand
        """,
    'q_supplier_hhi': """
            WITH r AS (
                SELECT l_suppkey,
                       sum(CAST(l_extendedprice AS DOUBLE)
                           * (1.0 - CAST(l_discount AS DOUBLE)))
                           AS revenue
                FROM lineitem GROUP BY l_suppkey),
            j AS (
                SELECT r.l_suppkey, r.revenue, s.s_nationkey
                FROM r JOIN supplier s ON s.s_suppkey = r.l_suppkey),
            t AS (
                SELECT s_nationkey, sum(revenue) AS tot
                FROM j GROUP BY s_nationkey)
            SELECT CAST(j.s_nationkey AS BIGINT) AS nationkey,
                   count(*) AS n_suppliers,
                   round(sum((j.revenue / t.tot)
                             * (j.revenue / t.tot)), 6) AS hhi
            FROM j JOIN t USING (s_nationkey)
            GROUP BY j.s_nationkey
            ORDER BY nationkey
        """,
    'q1_pricing_summary': """
            SELECT l_returnflag, l_linestatus,
                   sum(CAST(round(l_quantity * 100, 0) AS BIGINT))
                       / 100.0 AS sum_qty,
                   sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                       / 100.0 AS sum_base_price,
                   ((sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                         * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)))
                     + 50) // 100) / 100.0 AS sum_disc_price,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
    'q_top_customer_revenue': """
            SELECT c_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            GROUP BY c_name
            ORDER BY revenue DESC, c_name
            LIMIT 10
        """,
    'q_customers_per_region': """
            SELECT r_name, count(*) AS n_customers
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name ORDER BY r_name
        """,
    'q_priciest_parts': """
            SELECT p_partkey, p_name, p_retailprice FROM part
            ORDER BY p_retailprice DESC, p_partkey LIMIT 5
        """,
    'q_supplier_balance': """
            SELECT s_nationkey, count(*) AS n_suppliers,
                   round(min(s_acctbal), 2) AS min_bal,
                   round(max(s_acctbal), 2) AS max_bal,
                   round(sum(s_acctbal), 2) AS sum_bal
            FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey
        """,
    'q_segment_avg_balance': """
            WITH g AS (
                SELECT c_mktsegment,
                       CAST(count(*) AS BIGINT) AS n_customers,
                       sum(CAST(round(c_acctbal * 100, 0) AS BIGINT))
                           * 100 AS s
                FROM customer GROUP BY c_mktsegment)
            SELECT c_mktsegment, n_customers,
                   (CASE WHEN s >= 0
                         THEN (2 * s + n_customers)
                              // (2 * n_customers)
                         ELSE -((2 * (-s) + n_customers)
                                // (2 * n_customers)) END) / 10000.0
                       AS avg_bal
            FROM g ORDER BY c_mktsegment
        """,
    'q_distinct_segments': """
            SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment
        """,
    'q_urgent_orders': """
            SELECT o_orderkey, o_orderpriority,
                   round(o_totalprice, 2) AS o_totalprice
            FROM orders WHERE o_orderpriority = '1-URGENT'
            ORDER BY o_orderkey
        """,
    'q_building_revenue': """
            SELECT l_orderkey, o_orderdate,
                   round(sum(l_extendedprice * (1.0 - l_discount)), 2)
                       AS revenue
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1998-06-01'
              AND l_shipdate > TIMESTAMP '1998-06-01'
            GROUP BY l_orderkey, o_orderdate
            ORDER BY revenue DESC, l_orderkey
            LIMIT 10
        """,
    'q_customers_without_orders': """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
            ORDER BY c_custkey
        """,
    'q_customers_with_orders_count': """
            SELECT count(*) AS n_customers FROM customer
            WHERE c_custkey IN (SELECT o_custkey FROM orders)
        """,
    'q_distinct_event_users': """
            SELECT count(DISTINCT user_id) AS n_users FROM events
        """,
    'q_top_parts_per_brand': """
            SELECT p_brand, p_partkey, round(p_retailprice, 2)
                       AS p_retailprice
            FROM (SELECT p_brand, p_partkey, p_retailprice,
                         row_number() OVER (
                             PARTITION BY p_brand
                             ORDER BY p_retailprice DESC, p_partkey)
                             AS rn
                  FROM part)
            WHERE rn <= 3 ORDER BY p_brand, p_partkey
        """,
    'q_part_hits': _hits_oracle_sql(),
    'q_lineitem_zorder': _zorder_oracle_sql(),
    'q_basket_triples': """
            WITH inc AS MATERIALIZED (
                SELECT DISTINCT l_orderkey AS o, l_partkey AS i
                FROM lineitem)
            SELECT a.i AS item_a, b.i AS item_b, c.i AS item_c,
                   count(*) AS support_count
            FROM inc a JOIN inc b ON a.o = b.o AND a.i < b.i
                       JOIN inc c ON a.o = c.o AND b.i < c.i
            GROUP BY a.i, b.i, c.i
            HAVING count(*) >= 2
            ORDER BY item_a, item_b, item_c
        """,
    'q_basket_rules': """
            WITH inc AS MATERIALIZED (
                SELECT DISTINCT l_orderkey AS o, l_partkey AS i
                FROM lineitem),
            n AS (SELECT count(DISTINCT o) AS nb FROM inc),
            cnt AS (SELECT i, count(*) AS c FROM inc GROUP BY i),
            pair AS (
                SELECT a.i AS ia, b.i AS ib, count(*) AS cab
                FROM inc a JOIN inc b ON a.o = b.o AND a.i < b.i
                GROUP BY a.i, b.i
                HAVING count(*) >= 2),
            dirs AS (
                SELECT ia AS ant, ib AS con, cab FROM pair
                UNION ALL SELECT ib, ia, cab FROM pair)
            SELECT d.ant AS antecedent, d.con AS consequent,
                   cab AS pair_count,
                   ((2 * CAST(cab AS HUGEINT) * 1000000
                     + (SELECT nb FROM n))
                    // (2 * (SELECT nb FROM n))) / 1000000.0
                       AS support,
                   ((2 * CAST(cab AS HUGEINT) * 1000000 + ca.c)
                    // (2 * ca.c)) / 1000000.0 AS confidence,
                   ((2 * CAST((SELECT nb FROM n) AS HUGEINT) * cab
                       * 1000000 + ca.c * cb.c)
                    // (2 * CAST(ca.c AS HUGEINT) * cb.c)) / 1000000.0
                       AS lift
            FROM dirs d JOIN cnt ca ON ca.i = d.ant
                        JOIN cnt cb ON cb.i = d.con
            ORDER BY antecedent, consequent
        """,
    'q_orders_events_window': """
            SELECT o_orderkey,
                   (SELECT count(*) FROM events e
                    WHERE e.user_id = o.o_custkey
                      AND e.ts BETWEEN o.o_orderdate - INTERVAL 7 DAY
                                   AND o.o_orderdate) AS n_matches,
                   (SELECT round(coalesce(sum(e.value), 0), 2)
                    FROM events e
                    WHERE e.user_id = o.o_custkey
                      AND e.ts BETWEEN o.o_orderdate - INTERVAL 7 DAY
                                   AND o.o_orderdate) AS sum_value
            FROM orders o ORDER BY o_orderkey
        """,
    'q_orders_last_event': """
            SELECT o_orderkey,
                   (SELECT max(e.ts) FROM events e
                    WHERE e.user_id = o.o_custkey AND e.ts <= o.o_orderdate)
                       AS last_event_ts
            FROM orders o ORDER BY o_orderkey
        """,
    'q_supplier_adamic': """
            WITH inc AS MATERIALIZED (
                SELECT DISTINCT l_suppkey AS s, l_partkey AS p
                FROM lineitem),
            deg AS (SELECT p, count(*) AS d FROM inc GROUP BY p),
            w AS (
                SELECT a.s AS a, b.s AS b,
                       count(*) AS shared,
                       sum(1.0 / ln(deg.d)) AS aa
                FROM inc a JOIN inc b ON a.p = b.p AND a.s < b.s
                     JOIN deg ON deg.p = a.p
                GROUP BY a.s, b.s)
            SELECT a, b, CAST(shared AS BIGINT) AS shared,
                   round(aa, 6) AS aa
            FROM w
            ORDER BY round(aa, 6) DESC, a, b LIMIT 50
        """,
    'q_part_harmonic': """
            WITH RECURSIVE inc AS MATERIALIZED (
                SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                FROM lineitem),
            e AS MATERIALIZED (
                SELECT DISTINCT a.p AS pa, b.p AS pb
                FROM inc a JOIN inc b ON a.o = b.o AND a.p < b.p),
            sym AS MATERIALIZED (
                SELECT pa AS u, pb AS v FROM e
                UNION ALL SELECT pb, pa FROM e),
            srcs AS (SELECT DISTINCT p FROM inc ORDER BY p LIMIT 8),
            bfs AS (
                SELECT p AS src, p AS node, 0 AS level FROM srcs
                UNION
                SELECT bfs.src, sym.v, bfs.level + 1
                FROM bfs JOIN sym ON sym.u = bfs.node
                WHERE bfs.level < 8),
            lv AS (SELECT src, node, min(level) AS lvl
                   FROM bfs GROUP BY src, node)
            SELECT src,
                   CAST(count(*) FILTER (WHERE lvl > 0) AS BIGINT)
                       AS n_reached,
                   CAST(coalesce(sum(840 // lvl)
                                 FILTER (WHERE lvl > 0), 0) AS BIGINT)
                       AS h840,
                   round(CAST(coalesce(sum(840 // lvl)
                                       FILTER (WHERE lvl > 0), 0)
                              AS DOUBLE) / 840.0, 6) AS harmonic
            FROM lv GROUP BY src ORDER BY src
        """,
    'q_part_wl_colors': """
            WITH inc AS MATERIALIZED (
                SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                FROM lineitem),
            e AS MATERIALIZED (
                SELECT DISTINCT a.p AS pa, b.p AS pb
                FROM inc a JOIN inc b ON a.o = b.o AND a.p < b.p),
            sym AS MATERIALIZED (
                SELECT pa AS u, pb AS v FROM e
                UNION ALL SELECT pb, pa FROM e),
            c0 AS MATERIALIZED (
                SELECT u, CAST(count(*) AS VARCHAR) AS c
                FROM sym GROUP BY u),
            c1 AS MATERIALIZED (
                SELECT s.u, md5(max(cu.c) || '|' ||
                                string_agg(cv.c, ',' ORDER BY cv.c))
                           AS c
                FROM sym s JOIN c0 cu ON cu.u = s.u
                           JOIN c0 cv ON cv.u = s.v
                GROUP BY s.u),
            c2 AS (
                SELECT s.u, md5(max(cu.c) || '|' ||
                                string_agg(cv.c, ',' ORDER BY cv.c))
                           AS c
                FROM sym s JOIN c1 cu ON cu.u = s.u
                           JOIN c1 cv ON cv.u = s.v
                GROUP BY s.u)
            SELECT c AS color, CAST(count(*) AS BIGINT) AS n_nodes
            FROM c2 GROUP BY c ORDER BY color
        """,
    'q5_regional_supplier_revenue': """
            SELECT n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)
                       AS revenue
            FROM customer, orders, lineitem, supplier, nation, region
            WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
              AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
              AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
              AND r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY n_name ORDER BY revenue DESC, n_name
        """,
    'q3_shipping_priority': """
            SELECT o_orderkey, revenue, o_orderdate FROM (
                SELECT l_orderkey AS o_orderkey, o_orderdate,
                       round(sum(l_extendedprice * (1 - l_discount)), 2)
                           AS revenue
                FROM customer
                JOIN orders ON o_custkey = c_custkey
                JOIN lineitem ON l_orderkey = o_orderkey
                WHERE c_mktsegment = 'BUILDING'
                  AND o_orderdate < DATE '1998-06-01'
                  AND l_shipdate > DATE '1998-06-01'
                GROUP BY l_orderkey, o_orderdate)
            ORDER BY revenue DESC, o_orderkey LIMIT 10
        """,
    'q8_market_share': """
            SELECT o_year, round(nation_volume / volume, 6) AS mkt_share
            FROM (
                SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                       sum(CASE WHEN n2.n_name = 'NATION_12'
                           THEN l_extendedprice * (1 - l_discount)
                           ELSE 0 END) AS nation_volume,
                       sum(l_extendedprice * (1 - l_discount)) AS volume
                FROM lineitem
                JOIN orders ON o_orderkey = l_orderkey
                JOIN customer ON c_custkey = o_custkey
                JOIN nation n1 ON n1.n_nationkey = c_nationkey
                JOIN region ON r_regionkey = n1.n_regionkey
                JOIN part ON p_partkey = l_partkey
                JOIN supplier ON s_suppkey = l_suppkey
                JOIN nation n2 ON n2.n_nationkey = s_nationkey
                WHERE r_name = 'ASIA' AND p_type = 'PROMO'
                GROUP BY 1)
            ORDER BY o_year
        """,
    'q9_product_profit': """
            SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)
                       AS sum_profit
            FROM lineitem
            JOIN part ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation ON n_nationkey = s_nationkey
            JOIN orders ON o_orderkey = l_orderkey
            WHERE p_name LIKE '%red%'
            GROUP BY n_name, 2
            ORDER BY n_name, o_year DESC
        """,
    'q17_small_quantity_revenue': """
            SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
            FROM lineitem
            JOIN part ON p_partkey = l_partkey
            WHERE p_brand = 'Brand#1'
              AND l_quantity < (
                  SELECT 0.2 * avg(l_quantity) FROM lineitem l2
                  WHERE l2.l_partkey = lineitem.l_partkey)
        """,
    'q19_disjunctive_revenue': """
            SELECT round(sum(l_extendedprice * (1 - l_discount)), 2)
                       AS revenue,
                   CAST(count(*) AS BIGINT) AS n_lines
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
                   AND l_quantity BETWEEN 1 AND 30)
               OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
                   AND l_quantity BETWEEN 5 AND 35)
               OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
                   AND l_quantity BETWEEN 10 AND 40)
        """,
    'q21_waiting_suppliers': """
            WITH per_os AS (
                SELECT l_orderkey, l_suppkey,
                       max(CASE WHEN l_shipdate >
                           o_orderdate + INTERVAL 60 DAY
                           THEN 1 ELSE 0 END) AS late
                FROM lineitem JOIN orders ON o_orderkey = l_orderkey
                WHERE o_orderstatus = 'F'
                GROUP BY l_orderkey, l_suppkey),
            per_o AS (
                SELECT l_orderkey, count(*) AS n_supp,
                       sum(late) AS n_late
                FROM per_os GROUP BY l_orderkey)
            SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
            FROM per_os
            JOIN per_o USING (l_orderkey)
            JOIN supplier ON s_suppkey = l_suppkey
            WHERE late = 1 AND n_supp > 1 AND n_late = 1
            GROUP BY s_name
            ORDER BY numwait DESC, s_name LIMIT 20
        """,
    'q_part_sssp_tiered': """
            WITH RECURSIVE pairs AS MATERIALIZED (
                SELECT a.l_partkey AS u, b.l_partkey AS v,
                       CASE WHEN count(DISTINCT a.l_orderkey) >= 2
                            THEN 1 ELSE 2 END AS w
                FROM lineitem a JOIN lineitem b
                  ON a.l_orderkey = b.l_orderkey
                WHERE a.l_partkey <> b.l_partkey
                GROUP BY 1, 2),
            sp(node, dist) AS (
                SELECT CAST(1 AS BIGINT), CAST(0 AS BIGINT)
                UNION
                SELECT p.v, sp.dist + p.w
                FROM sp JOIN pairs p ON p.u = sp.node
                WHERE sp.dist < 24)
            SELECT node, min(dist) AS dist
            FROM sp GROUP BY node ORDER BY node
        """,
    'q2_min_cost_supplier': """
            WITH ps AS MATERIALIZED (
                SELECT l_partkey, l_suppkey,
                       min(l_extendedprice / l_quantity) AS cost
                FROM lineitem
                WHERE l_suppkey IN (
                    SELECT s_suppkey FROM supplier
                    JOIN nation ON n_nationkey = s_nationkey
                    JOIN region ON r_regionkey = n_regionkey
                    WHERE r_name = 'EUROPE')
                GROUP BY 1, 2)
            SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
                   round(cost, 6) AS cost
            FROM ps
            JOIN part ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation ON n_nationkey = s_nationkey
            WHERE p_size <= 5 AND p_type = 'LARGE'
              AND cost = (SELECT min(cost) FROM ps p2
                          WHERE p2.l_partkey = ps.l_partkey)
            ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
            LIMIT 100
        """,
    'q11_important_parts': """
            WITH nv AS MATERIALIZED (
                SELECT l_partkey,
                       sum(l_extendedprice * (1 - l_discount)) AS value
                FROM lineitem
                JOIN supplier ON s_suppkey = l_suppkey
                JOIN nation ON n_nationkey = s_nationkey
                WHERE n_name = 'NATION_12'
                GROUP BY 1)
            SELECT l_partkey, round(value, 2) AS value
            FROM nv
            WHERE value > 2.0 * (SELECT avg(value) FROM nv)
            ORDER BY value DESC, l_partkey
        """,
    'q12_priority_lines': """
            SELECT l_returnflag,
                   sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                       THEN 1 ELSE 0 END) AS high_line_count,
                   sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                       THEN 0 ELSE 1 END) AS low_line_count
            FROM lineitem JOIN orders ON o_orderkey = l_orderkey
            WHERE l_shipdate >= DATE '1997-01-01'
              AND l_shipdate < DATE '1998-01-01'
            GROUP BY l_returnflag
            ORDER BY l_returnflag
        """,
    'q16_part_supplier_counts': """
            SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
                   CAST(count(DISTINCT l_suppkey) AS BIGINT)
                       AS supplier_cnt
            FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
            JOIN part ON p_partkey = l_partkey
            WHERE p_brand <> 'Brand#1'
              AND p_size IN (1, 4, 9, 16, 25, 36, 49)
              AND l_suppkey NOT IN (
                  SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
            GROUP BY 1, 2, 3
            ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        """,
    'q20_dominant_suppliers': """
            WITH pq AS MATERIALIZED (
                SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
                FROM lineitem
                WHERE l_partkey IN (
                    SELECT p_partkey FROM part
                    WHERE p_name LIKE 'small%')
                  AND l_shipdate >= DATE '1997-01-01'
                  AND l_shipdate < DATE '1998-01-01'
                GROUP BY 1, 2),
            pt AS (SELECT l_partkey, sum(qty) AS total
                   FROM pq GROUP BY 1)
            SELECT s_name, s_acctbal
            FROM supplier
            WHERE s_suppkey IN (
                SELECT l_suppkey FROM pq JOIN pt USING (l_partkey)
                WHERE qty > 0.3 * total)
            ORDER BY s_name
        """,
    'q18_large_volume_orders': """
            WITH s AS (
                SELECT l_orderkey, sum(l_quantity) AS sum_qty
                FROM lineitem GROUP BY l_orderkey
                HAVING sum(l_quantity) > 250)
            SELECT c_name, o_orderkey,
                   round(o_totalprice, 2) AS o_totalprice,
                   round(sum_qty, 2) AS sum_qty
            FROM s JOIN orders ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            ORDER BY o_totalprice DESC, o_orderkey
        """,
    'q_revenue_rollup': """
            SELECT coalesce(r_name, 'ALL') AS r_name,
                   coalesce(n_name, 'ALL') AS n_name,
                   round(sum(o_totalprice), 2) AS revenue
            FROM orders
            JOIN customer ON c_custkey = o_custkey
            JOIN nation ON n_nationkey = c_nationkey
            JOIN region ON r_regionkey = n_regionkey
            GROUP BY ROLLUP (r_name, n_name)
            ORDER BY r_name, n_name
        """,
    'q_lineitem_corr': """
            SELECT count(*) AS n,
                   round(corr(l_quantity, l_extendedprice), 6)
                       AS corr_qty_price
            FROM lineitem
        """,
    'q_orders_cohort_retention': """
            WITH f AS (
                SELECT o_custkey,
                       min(year(o_orderdate)) AS cohort
                FROM orders GROUP BY o_custkey)
            SELECT f.cohort, year(o.o_orderdate) AS active_year,
                   count(DISTINCT o.o_custkey) AS n_customers
            FROM orders o JOIN f ON f.o_custkey = o.o_custkey
            GROUP BY f.cohort, active_year
            ORDER BY cohort, active_year
        """,
    'q_orders_next_event': """
            SELECT o_orderkey,
                   (SELECT min(e.ts) FROM events e
                    WHERE e.user_id = o.o_custkey
                      AND e.ts >= o.o_orderdate) AS next_event_ts
            FROM orders o ORDER BY o_orderkey
        """,
    'q_part_kcore': _kcore_oracle_sql(k=80, rounds=8),
    'q_part_triangles': """
            WITH e AS (
                SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
                FROM lineitem a JOIN lineitem b
                  ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey
            ),
            tri AS (
                SELECT e1.a AS x, e1.b AS y, e2.b AS z
                FROM e e1
                JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
                JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b
            ),
            corners AS (
                SELECT x AS node FROM tri
                UNION ALL SELECT y FROM tri
                UNION ALL SELECT z FROM tri
            )
            SELECT node, count(*) AS n_triangles
            FROM corners GROUP BY node ORDER BY node
        """,
    'q_part_clustering': """
            WITH e AS (
                SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
                FROM lineitem a JOIN lineitem b
                  ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey),
            deg AS (
                SELECT node, count(*) AS degree
                FROM (SELECT a AS node FROM e
                      UNION ALL SELECT b FROM e)
                GROUP BY node),
            tri AS (
                SELECT e1.a AS x, e1.b AS y, e2.b AS z
                FROM e e1
                JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
                JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b),
            corners AS (
                SELECT x AS node FROM tri
                UNION ALL SELECT y FROM tri
                UNION ALL SELECT z FROM tri),
            t AS (SELECT node, count(*) AS n_triangles
                  FROM corners GROUP BY node)
            SELECT d.node, CAST(d.degree AS BIGINT) AS degree,
                   CAST(COALESCE(t.n_triangles, 0) AS BIGINT)
                       AS n_triangles,
                   round(2.0 * COALESCE(t.n_triangles, 0)
                         / (d.degree * (d.degree - 1.0)), 6) AS cc
            FROM deg d LEFT JOIN t USING (node)
            WHERE d.degree >= 2
            ORDER BY d.node
        """,
    'q_part_abc': """
            WITH pr AS (
                SELECT l_partkey,
                       CAST(sum(CAST(round(l_extendedprice * 100)
                                     AS BIGINT)) AS BIGINT) AS cents
                FROM lineitem GROUP BY l_partkey),
            c AS (SELECT l_partkey, cents,
                         sum(cents) OVER (
                             ORDER BY cents DESC, l_partkey ASC
                             ROWS UNBOUNDED PRECEDING) AS cum_cents,
                         sum(cents) OVER () AS tot
                  FROM pr)
            SELECT l_partkey, cents,
                   CAST(cum_cents AS BIGINT) AS cum_cents,
                   CASE WHEN cum_cents * 10 <= tot * 8 THEN 'A'
                        WHEN cum_cents * 20 <= tot * 19 THEN 'B'
                        ELSE 'C' END AS abc_class
            FROM c ORDER BY l_partkey
        """,
    'q_referential_integrity': """
            SELECT * FROM (
                SELECT 'event_user_orphans' AS check_name,
                       CAST(count(*) AS BIGINT) AS n
                FROM events e
                WHERE NOT EXISTS (SELECT 1 FROM customer c
                                  WHERE c.c_custkey = e.user_id)
                UNION ALL
                SELECT 'lineitem_orphans',
                       CAST(count(*) AS BIGINT)
                FROM lineitem l
                WHERE NOT EXISTS (SELECT 1 FROM orders o
                                  WHERE o.o_orderkey = l.l_orderkey)
                UNION ALL
                SELECT 'orders_childless',
                       CAST(count(*) AS BIGINT)
                FROM orders o
                WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                                  WHERE l.l_orderkey = o.o_orderkey))
            ORDER BY check_name
        """,
    'q_revenue_cube': """
            SELECT COALESCE(r_name, 'ALL') AS r_name,
                   COALESCE(n_name, 'ALL') AS n_name,
                   round(sum(o_totalprice), 2) AS revenue
            FROM orders o
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n ON n.n_nationkey = c.c_nationkey
            JOIN region r ON r.r_regionkey = n.n_regionkey
            GROUP BY CUBE (r_name, n_name)
            ORDER BY r_name, n_name
        """,
    'q_part_skyline': """
            SELECT p_partkey, p_retailprice,
                   CAST(p_size AS BIGINT) AS p_size
            FROM part p
            WHERE NOT EXISTS (
                SELECT 1 FROM part q
                WHERE q.p_retailprice <= p.p_retailprice
                  AND q.p_size >= p.p_size
                  AND (q.p_retailprice < p.p_retailprice
                       OR q.p_size > p.p_size))
            ORDER BY p_partkey
        """,
    'q_part_bfs': """
            WITH RECURSIVE pairs AS MATERIALIZED (
                SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
                FROM lineitem a JOIN lineitem b
                  ON a.l_orderkey = b.l_orderkey
                WHERE a.l_partkey <> b.l_partkey),
            bfs(node, lvl) AS (
                SELECT CAST(1 AS BIGINT), CAST(0 AS BIGINT)
                UNION
                SELECT p.v, bfs.lvl + 1
                FROM bfs JOIN pairs p ON p.u = bfs.node
                WHERE bfs.lvl < 12)
            SELECT node, min(lvl) AS level
            FROM bfs GROUP BY node ORDER BY node
        """,
    'q_orders_benford_shares': """
            WITH d AS (
                SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100)
                           AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT)
                           AS digit
                FROM orders
                WHERE isfinite(o_totalprice) AND o_totalprice > 0),
            c AS (SELECT digit, count(*) AS n FROM d GROUP BY digit),
            t AS (SELECT sum(n) AS total FROM c)
            SELECT digit, CAST(n AS BIGINT) AS n,
                   round(n * 1.0 / t.total, 6) AS share,
                   round(log10(1.0 + 1.0 / digit), 6) AS benford_p
            FROM c CROSS JOIN t ORDER BY digit
        """,
    'q_orders_profile': """
            WITH v AS (
                SELECT 'o_custkey' AS "column",
                       CAST(o_custkey AS VARCHAR) AS val FROM orders
                UNION ALL
                SELECT 'o_orderstatus', o_orderstatus FROM orders
                UNION ALL
                SELECT 'o_orderpriority', o_orderpriority FROM orders)
            SELECT "column", count(*) AS n,
                   count(DISTINCT val) AS n_distinct,
                   min(val) AS min_val, max(val) AS max_val
            FROM v GROUP BY "column" ORDER BY "column"
        """,
    'q_customer_rfm': """
            WITH per AS (
                SELECT o_custkey,
                       CAST(date_diff('day', max(o_orderdate),
                            DATE '1998-12-31') AS DOUBLE) AS recency,
                       CAST(count(*) AS DOUBLE) AS frequency,
                       round(sum(o_totalprice), 2) AS monetary
                FROM orders GROUP BY o_custkey),
            th AS (
                SELECT round(quantile_cont(recency, 1.0/3), 6) AS r1,
                       round(quantile_cont(recency, 2.0/3), 6) AS r2,
                       round(quantile_cont(frequency, 1.0/3), 6) AS f1,
                       round(quantile_cont(frequency, 2.0/3), 6) AS f2,
                       round(quantile_cont(monetary, 1.0/3), 6) AS m1,
                       round(quantile_cont(monetary, 2.0/3), 6) AS m2
                FROM per)
            SELECT CAST(1 + CAST(recency > r1 AS INT)
                       + CAST(recency > r2 AS INT) AS BIGINT)
                       AS r_bucket,
                   CAST(1 + CAST(frequency > f1 AS INT)
                       + CAST(frequency > f2 AS INT) AS BIGINT)
                       AS f_bucket,
                   CAST(1 + CAST(monetary > m1 AS INT)
                       + CAST(monetary > m2 AS INT) AS BIGINT)
                       AS m_bucket,
                   count(*) AS n_customers
            FROM per CROSS JOIN th
            GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
        """,
    'q4_order_priority': """
            SELECT o_orderpriority, count(*) AS order_count
            FROM orders o
            WHERE o_orderdate >= DATE '1996-01-01'
              AND o_orderdate < DATE '1996-04-01'
              AND EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey
                            AND l.l_shipdate >
                                o.o_orderdate + INTERVAL 30 DAY)
            GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
    'q6_forecast_revenue': """
            SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
            FROM lineitem
            WHERE l_shipdate >= DATE '1997-01-01'
              AND l_shipdate < DATE '1998-01-01'
              AND l_discount BETWEEN 0.05 AND 0.07
              AND l_quantity < 24
        """,
    'q10_returned_items': """
            WITH r AS (
                SELECT o.o_custkey AS c_custkey,
                       round(sum(l.l_extendedprice * (1 - l.l_discount)),
                             2) AS revenue
                FROM lineitem l
                JOIN orders o ON o.o_orderkey = l.l_orderkey
                WHERE l.l_returnflag = 'R'
                  AND o.o_orderdate >= DATE '1996-01-01'
                  AND o.o_orderdate < DATE '1996-04-01'
                GROUP BY 1)
            SELECT r.c_custkey, c.c_name, r.revenue, c.c_acctbal,
                   n.n_name
            FROM r JOIN customer c ON c.c_custkey = r.c_custkey
            JOIN nation n ON n.n_nationkey = c.c_nationkey
            ORDER BY r.revenue DESC, r.c_custkey LIMIT 20
        """,
    'q13_order_distribution': """
            WITH c AS (SELECT c.c_custkey,
                              count(o.o_orderkey) AS c_count
                       FROM customer c
                       LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                       GROUP BY c.c_custkey)
            SELECT CAST(c_count AS BIGINT) AS c_count,
                   CAST(count(*) AS BIGINT) AS custdist
            FROM c GROUP BY c_count
            ORDER BY custdist DESC, c_count DESC
        """,
    'q7_nation_volume': """
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)),
                         2) AS revenue
            FROM lineitem l
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
            JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
            WHERE l.l_shipdate >= DATE '1996-01-01'
              AND l.l_shipdate < DATE '1998-01-01'
              AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
                OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
            GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
        """,
    'q22_idle_balance': """
            WITH pos AS (
                SELECT CAST(round(c_acctbal * 100) AS BIGINT) AS cents
                FROM customer WHERE round(c_acctbal * 100) > 0),
            th AS (SELECT CAST(sum(cents) AS BIGINT) AS s,
                          CAST(count(*) AS BIGINT) AS n FROM pos)
            SELECT n.n_name, CAST(count(*) AS BIGINT) AS numcust,
                   round(sum(c.c_acctbal), 2) AS totacctbal
            FROM customer c
            JOIN nation n ON n.n_nationkey = c.c_nationkey
            WHERE CAST(round(c.c_acctbal * 100) AS BIGINT)
                      * (SELECT n FROM th) > (SELECT s FROM th)
              AND NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_orderdate >= DATE '2000-01-01')
            GROUP BY n.n_name ORDER BY n.n_name
        """,
    'q14_promo_revenue': """
            SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                       THEN l_extendedprice * (1 - l_discount)
                       ELSE 0 END)
                   / sum(l_extendedprice * (1 - l_discount)), 6)
                       AS promo_share
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= DATE '1997-03-01'
              AND l_shipdate < DATE '1997-04-01'
        """,
    'q15_top_supplier': """
            WITH r AS (
                SELECT l_suppkey,
                       round(sum(l_extendedprice * (1 - l_discount)), 2)
                           AS total_revenue
                FROM lineitem
                WHERE l_shipdate >= DATE '1996-01-01'
                  AND l_shipdate < DATE '1996-04-01'
                GROUP BY l_suppkey)
            SELECT s_suppkey, s_name, total_revenue
            FROM r JOIN supplier ON s_suppkey = l_suppkey
            WHERE total_revenue = (SELECT max(total_revenue) FROM r)
            ORDER BY s_suppkey
        """,
    'q_supplier_jaccard': """
            WITH sp AS (SELECT DISTINCT l_suppkey AS s, l_partkey AS p
                        FROM lineitem),
            deg AS (SELECT s, count(*) AS d FROM sp GROUP BY s),
            cn AS (SELECT x.s AS a, y.s AS b, count(*) AS shared
                   FROM sp x JOIN sp y ON x.p = y.p AND x.s < y.s
                   GROUP BY 1, 2)
            SELECT a, b, CAST(shared AS BIGINT) AS shared,
                   round(shared * 1.0 / (da.d + db.d - shared), 6)
                       AS jaccard
            FROM cn JOIN deg da ON da.s = a JOIN deg db ON db.s = b
            ORDER BY jaccard DESC, a, b LIMIT 50
        """,
}
ORACLE_REGISTRY.update(ORACLES)
