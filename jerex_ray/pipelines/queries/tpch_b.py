"""Split of the query registry: ``tpch_b`` part (mechanically derived from the original queries.py by scripts/split_queries.py; unit order and source text preserved)."""

from __future__ import annotations
import re
import numpy as np
import pandas as pd
from jerex_ray.config import PipelineConfig
from jerex_ray.runtime import configure_data_context
from jerex_ray.pipelines.queries._shared import ORACLE_REGISTRY
from jerex_ray.pipelines.queries._shared import _N_TOKENS_SQL, _repeat_copurchase_edges, _round_half_away  # noqa: E501

def q_part_diameter(sf_dir: str):
    """Diameter lower bound of the co-purchase graph by the classic
    double sweep (Magnien-Latapy-Habib '09): BFS from the smallest
    part, hop to the farthest node (tie → smallest id), BFS again —
    the second eccentricity bounds the diameter from below and is
    exact on trees/many real graphs. Two ``bfs_levels`` grid passes;
    every reported quantity is an integer, so the oracle (two chained
    recursive CTEs) matches bit-for-bit. Levels capped at 16 on both
    engines."""
    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply
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

    parts = grouped_aggregate(
        li.map_batches(lambda df: df[["l_partkey"]],
                       batch_format="pandas"),
        ["l_partkey"], {"n": (None, "count")}).to_pandas()
    seed = int(parts["l_partkey"].min())
    edges = grouped_apply(li, ["l_orderkey"], pairs_block).materialize()
    l1 = bfs_levels(edges, seed, src="a", dst="b", max_rounds=16)
    far = l1.sort_values(["level", "node"],
                         ascending=[False, True]).iloc[0]
    l2 = bfs_levels(edges, int(far["node"]), src="a", dst="b",
                    max_rounds=16)
    return pd.DataFrame({
        "seed": [np.int64(seed)],
        "ecc_seed": [np.int64(l1["level"].max())],
        "far_node": [np.int64(far["node"])],
        "diameter_lb": [np.int64(l2["level"].max())],
        "n_reached": [np.int64(len(l2))]})

_FD_SPECS = [
    ("customer", "c_custkey", "c_nationkey"),
    ("customer", "c_nationkey", "c_mktsegment"),
    ("orders", "o_orderkey", "o_custkey"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("nation", "n_nationkey", "n_regionkey"),
]

def q_fd_audit(sf_dir: str):
    """Functional-dependency audit (the profiling step schema
    -inference and normalization tools run): for each candidate
    det→dep column pair, A→B holds iff no A value maps to two
    distinct B values. Per pair: one combiner pass to distinct
    (det, dep) rows, one to per-det distinct-dep counts, then
    block-partial (n_keys, n_violating) scalars — nothing
    key-vocabulary-sized reaches the driver beyond the per-block
    partials. Integer-exact on both engines."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    rows = []
    for tbl, det, dep in _FD_SPECS:
        ds = read_parquet_sized(f"{sf_dir}/{tbl}.parquet",
                                columns=[det, dep])
        distinct = grouped_aggregate(ds, [det, dep],
                                     {"n": (None, "count")}) \
            .drop_columns(["n"])
        per_det = grouped_aggregate(distinct, [det],
                                    {"nd": (None, "count")})

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "k": [np.int64(len(df))],
                "v": [np.int64((df["nd"].to_numpy(np.int64) > 1)
                               .sum()) if len(df) else np.int64(0)]})

        p = per_det.map_batches(partial, batch_format="pandas",
                                batch_size=None).to_pandas()
        n_keys, n_viol = int(p["k"].sum()), int(p["v"].sum())
        rows.append((tbl, det, dep, np.int64(n_keys),
                     np.int64(n_viol),
                     np.int64(1 if n_viol == 0 else 0)))
    out = pd.DataFrame(rows, columns=["tbl", "det", "dep", "n_keys",
                                      "n_violating", "holds"])
    return out.sort_values(["tbl", "det", "dep"]).reset_index(drop=True)

def q_supplier_matching(sf_dir: str):
    """Maximal supplier–part matching by deterministic parallel
    greedy (``ops/graph.greedy_matching``): md5-64 edge priorities,
    per-round local-minima picks — provably identical to sequential
    greedy-by-priority, so the SQL oracle can replay the SAME rounds
    with windowed mins over a chained-CTE cascade. Maximality +
    greedy-prefix equality are pytest-gated."""
    from jerex_ray.ops.graph import greedy_matching
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/lineitem.parquet",
                            columns=["l_suppkey", "l_partkey"])
    out = greedy_matching(ds, left_col="l_suppkey",
                          right_col="l_partkey")
    return out[["l_suppkey", "l_partkey"]]

def q_part_betweenness(sf_dir: str, *, n_sources: int = 4,
                       max_depth: int = 6):
    """Depth-bounded Brandes betweenness centrality (Brandes '01)
    from the ``n_sources`` smallest parts of the repeat co-purchase
    graph (``ops/graph.betweenness_sampled``): one multi-source BFS
    grid pass for levels, σ forward and δ backward as per-level
    streaming passes over the edge Dataset with broadcast node
    tables. σ is integer-exact; δ's fixed-order ratio expressions
    let the unrolled chained-CTE oracle match to 6 dp."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.ops.graph import betweenness_sampled
    configure_data_context()
    edges = _repeat_copurchase_edges(sf_dir).materialize()
    nd = grouped_aggregate(
        edges.map_batches(
            lambda df: pd.DataFrame({"u": np.concatenate(
                [df["a"].to_numpy(np.int64),
                 df["b"].to_numpy(np.int64)])})
            if "a" in df.columns else pd.DataFrame(
                {"u": pd.Series(dtype="int64")}),
            batch_format="pandas"),
        ["u"], {"n": (None, "count")}).to_pandas()
    sources = sorted(int(u) for u in nd["u"])[:n_sources]
    out = betweenness_sampled(edges, sources, max_depth=max_depth)
    out["node"] = out["node"].astype("int64")
    return out

def q_part_ktruss(sf_dir: str, *, k: int = 3, min_cocount: int = 2):
    """k-truss cohesion core (Cohen '08) of the REPEAT co-purchase
    graph (parts sharing ≥ ``min_cocount`` orders — the thresholded
    graph where triangle structure is signal, not density noise):
    iterative support peeling on the BSP wedge-count dataflow
    (``ops/graph.ktruss``), emitting the surviving edges with their
    in-truss triangle support. Pure set arithmetic → the chained-CTE
    oracle replays the identical rounds."""
    import ray

    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply
    from jerex_ray.ops.graph import ktruss
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    li = read_parquet_sized(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey"])

    def pairs_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"a": pd.Series(dtype="int64"),
                                 "b": pd.Series(dtype="int64"),
                                 "c": pd.Series(dtype="int64")})
        d = df.drop_duplicates(["l_orderkey", "l_partkey"])
        m = d.merge(d, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        g = m.groupby(["l_partkey_x", "l_partkey_y"], sort=False) \
            .size().reset_index(name="c")
        return pd.DataFrame({"a": g["l_partkey_x"].to_numpy(),
                             "b": g["l_partkey_y"].to_numpy(),
                             "c": g["c"].to_numpy(np.int64)})

    cnt = grouped_aggregate(
        grouped_apply(li, ["l_orderkey"], pairs_block),
        ["a", "b"], {"n": ("c", "sum")})
    edges = cnt.map_batches(
        lambda df: df[df["n"] >= min_cocount][["a", "b"]]
        if "a" in df.columns else df, batch_format="pandas")
    out = ktruss(edges, k=k)
    out["a"] = out["a"].astype("int64")
    out["b"] = out["b"].astype("int64")
    return out

def q_part_sssp(sf_dir: str, *, oracle_depth: int = 24):
    """Weighted single-source shortest paths over the repeat
    co-purchase graph (synchronized Bellman-Ford relaxation,
    ``ops/graph.bellman_ford_sssp`` — the weighted sibling of the
    BFS/double-sweep family): edge weight = 1 + md5_64("a|b") % 9
    (deterministic and SQL-replayable — the ``md5_hash64`` contract),
    source = the smallest part id in the graph. Distances are exact
    integers, so there is no float accumulation-order hazard anywhere;
    the engine runs to the natural fixpoint and ASSERTS it converged
    within the oracle's fixed replay depth, which makes the
    chained-CTE relax-round oracle land on the identical monotone
    lattice fixpoint."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.ops.graph import bellman_ford_sssp
    from jerex_ray.util import md5_hash64_batch
    configure_data_context()
    edges = _repeat_copurchase_edges(sf_dir)

    def with_w(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "a" not in df.columns:
            return pd.DataFrame({"a": pd.Series(dtype="int64"),
                                 "b": pd.Series(dtype="int64"),
                                 "w": pd.Series(dtype="int64")})
        a = df["a"].to_numpy(np.int64)
        b = df["b"].to_numpy(np.int64)
        w = 1 + (md5_hash64_batch(
            [f"{x}|{y}" for x, y in zip(a, b)]) % 9).astype(np.int64)
        return pd.DataFrame({"a": a, "b": b, "w": w})

    wedges = edges.map_batches(with_w,
                               batch_format="pandas").materialize()
    nd = grouped_aggregate(
        wedges.map_batches(
            lambda df: pd.DataFrame({"u": np.concatenate(
                [df["a"].to_numpy(np.int64),
                 df["b"].to_numpy(np.int64)])})
            if "a" in df.columns else pd.DataFrame(
                {"u": pd.Series(dtype="int64")}),
            batch_format="pandas"),
        ["u"], {"n": (None, "count")}).to_pandas()
    if nd.empty or "u" not in nd.columns:
        return pd.DataFrame({"node": pd.Series(dtype="int64"),
                             "dist": pd.Series(dtype="int64")})
    source = int(nd["u"].min())
    out = bellman_ford_sssp(wedges, source, max_rounds=64)
    rounds = int(out["rounds"].iloc[0]) if len(out) else 0
    assert rounds <= oracle_depth, \
        f"fixpoint at round {rounds} > oracle depth {oracle_depth}"
    return out[["node", "dist"]].reset_index(drop=True)

def q_orders_bloom_semijoin(sf_dir: str):
    """Bloom-filter semi-join pushdown audit (Bloom '70; Mackert &
    Lohman '86 — the runtime filter every distributed engine pushes
    below a join): how well does a 65,536-bit / 3-hash bloom built
    over URGENT orders' keys prune the lineitem probe side, versus the
    exact semi-join? ``ops/bloomjoin.bloom_semijoin_audit``: the only
    cross-cluster state is the m-bit bitmap (bit positions reduce
    through the combiner, vocabulary bounded by m), the probe streams
    once against the broadcast bitmap, and the exact counts come from
    ONE hash co-location of per-key partials — never a pair join.
    md5-derived bit positions make the SQL oracle replay the identical
    bitmap and per-key verdicts; every output is integer-exact except
    the single fp_rate divide."""
    import pyarrow.compute as _pc

    from jerex_ray.ops.bloomjoin import bloom_semijoin_audit
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    keys = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey"],
        filter=_pc.field("o_orderpriority") == "1-URGENT")
    probe = read_parquet_sized(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey"])
    return bloom_semijoin_audit(keys, probe, key_col="o_orderkey",
                                probe_col="l_orderkey")

def q_lineitem_auc(sf_dir: str):
    """Exact ROC-AUC of "quantity predicts a return" — does
    l_quantity separate returned (l_returnflag = 'R') from kept line
    items? Mann-Whitney rank-sum with midrank ties
    (``ops/mleval.auc_mann_whitney``): ONE combiner pass reduces the
    lineitem scan to ≤50 per-quantity (n_pos, n_neg) counts, the rank-sum
    closes on the driver carrying 2·U so everything before the single
    final divide is INTEGER-exact — the SQL window oracle lands on the
    identical bits."""
    from jerex_ray.ops.mleval import auc_mann_whitney
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/lineitem.parquet",
                            columns=["l_quantity", "l_returnflag"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"s": pd.Series(dtype="int64"),
                                 "pos": pd.Series(dtype="int64")})
        return pd.DataFrame({
            "s": np.floor(df["l_quantity"].to_numpy(np.float64)
                          + 0.5).astype(np.int64),
            "pos": (df["l_returnflag"].to_numpy() == "R")
            .astype(np.int64)})

    out = auc_mann_whitney(ds.map_batches(prep, batch_format="pandas"))
    out["auc"] = out["auc"].round(6)
    for c in ("n_pos", "n_neg", "u2"):
        out[c] = out[c].astype("int64")
    return out

def q_orders_benford(sf_dir: str):
    """Benford first-significant-digit audit of order totals (Newcomb
    1881 / Benford '38 — the classic fraud/synthetic-data screen):
    leading digit of the integer cents of o_totalprice vs the Benford
    expectation n·log10(1 + 1/d), with the per-digit chi-square term.
    ONE combiner pass to the 9-row digit histogram; every output float
    is an independent fixed-order expression (no multi-term float
    accumulation), so the SQL oracle matches bit-for-bit before the
    shared 6-decimal rounding."""
    import math

    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/orders.parquet",
                            columns=["o_totalprice"])

    def digits(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"digit": pd.Series(dtype="int64")})
        # mirror DuckDB CAST(x*100 AS BIGINT): half-away (prices > 0)
        cents = np.floor(df["o_totalprice"].to_numpy(np.float64)
                         * 100.0 + 0.5).astype(np.int64)
        first = pd.Series(cents).astype(str).str[0].astype(np.int64)
        return pd.DataFrame({"digit": first})

    g = grouped_aggregate(ds.map_batches(digits, batch_format="pandas"),
                          ["digit"], {"n_obs": (None, "count")}) \
        .to_pandas()
    if g.empty or "digit" not in g.columns:
        return pd.DataFrame({"digit": pd.Series(dtype="int64"),
                             "n_obs": pd.Series(dtype="int64"),
                             "expected": pd.Series(dtype="float64"),
                             "chi2_term": pd.Series(dtype="float64")})
    g = g.sort_values("digit").reset_index(drop=True)
    tot = int(g["n_obs"].sum())
    exp_n = np.array([math.log10(1.0 + 1.0 / int(d)) * tot
                      for d in g["digit"]])
    obs = g["n_obs"].to_numpy(np.float64)
    term = (obs - exp_n) * (obs - exp_n) / exp_n
    return pd.DataFrame({"digit": g["digit"].astype("int64"),
                         "n_obs": g["n_obs"].astype("int64"),
                         "expected": np.round(exp_n, 6),
                         "chi2_term": np.round(term, 6)})

def q_customer_chash(sf_dir: str, *, vnodes: int = 16):
    """Consistent-hashing placement audit (Karger '97): customers
    hash onto an 8-server × 16-vnode md5 ring, then server s8 joins —
    the classic elasticity claim is that only ~1/9 of keys move, all
    TO the new server. One broadcast of the two (tiny) rings, one
    streaming assignment pass, combiner counts per (before, after)
    server pair; reports per-server key counts before/after and the
    moved-out counts. Pure md5/integer arithmetic, bit-replayed by
    the SQL oracle's correlated successor lookup."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.ops.layout import consistent_hash_ring, ring_assign
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/customer.parquet",
                            columns=["c_custkey"])
    r8 = consistent_hash_ring([f"s{i}" for i in range(8)],
                              vnodes=vnodes)
    r9 = consistent_hash_ring([f"s{i}" for i in range(9)],
                              vnodes=vnodes)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        from jerex_ray.util import md5_hash64_batch
        h = md5_hash64_batch(df["c_custkey"].astype(str).tolist())
        s8 = ring_assign(h, *r8)
        s9 = ring_assign(h, *r9)
        g = pd.DataFrame({"s8": s8, "s9": s9, "n": 1}) \
            .groupby(["s8", "s9"], sort=False).sum().reset_index()
        return g

    j = grouped_aggregate(
        ds.map_batches(assign, batch_format="pandas",
                       batch_size=65536),
        ["s8", "s9"], {"n": ("n", "sum")}).to_pandas()
    servers = [f"s{i}" for i in range(9)]
    before = j.groupby("s8")["n"].sum()
    after = j.groupby("s9")["n"].sum()
    moved = j[j["s8"] != j["s9"]].groupby("s8")["n"].sum()
    return pd.DataFrame({
        "server": servers,
        "n_before": [int(before.get(s, 0)) for s in servers],
        "n_after": [int(after.get(s, 0)) for s in servers],
        "moved_out": [int(moved.get(s, 0)) for s in servers]}) \
        .astype({"n_before": "int64", "n_after": "int64",
                 "moved_out": "int64"})

def q_lineitem_price_index(sf_dir: str):
    """Laspeyres, Paasche and Fisher price indices (Laspeyres 1871;
    Paasche 1874; Fisher '22) between the pre- and post-1998 halves
    of the lineitem stream — the econometrics members beside the
    Theil/Gini inequality family: 'how much did the matched basket's
    price level move?'. Exactness: items are parts present in BOTH
    periods; the representative unit price per (part, period) is the
    mirror-rounded CENTS of extendedprice/quantity on the earliest
    (orderkey, linenumber) line (one deterministic quote — avoids
    summing rationals), quantities are exact integers, so all four
    index sums ΣP·Q are exact int64 shipped in the result; L and P
    are single divisions and Fisher = √(L·P) one fixed expression.
    Dataflow: ONE combiner pass per period reduction (first-quote
    via (orderkey, linenumber) argmin + quantity sums co-located by
    part), matched join on the part-bounded table."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_partkey",
                 "l_quantity", "l_extendedprice", "l_shipdate"])
    cut = np.datetime64("1998-01-01")

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "part": pd.Series(dtype="int64"),
            "period": pd.Series(dtype="int64"),
            "price_c": pd.Series(dtype="int64"),
            "qty": pd.Series(dtype="int64")})
        if df.empty:
            return empty
        d = df.copy()
        d["period"] = (d["l_shipdate"].astype("datetime64[us]")
                       >= cut).astype("int64")
        out = []
        for (part, per), grp in d.groupby(
                ["l_partkey", "period"], sort=False):
            g = grp.sort_values(["l_orderkey", "l_linenumber"])
            up = (float(g["l_extendedprice"].iloc[0])
                  / float(g["l_quantity"].iloc[0])) * 100.0
            price_c = int(np.floor(up + 0.5))   # mirror round, >0
            out.append((int(part), int(per), price_c,
                        int(g["l_quantity"].sum())))
        return pd.DataFrame(out, columns=["part", "period",
                                          "price_c", "qty"]) \
            .astype({c: "int64" for c in
                     ["part", "period", "price_c", "qty"]})

    pp = grouped_apply(ds, ["l_partkey"], per_part).to_pandas()
    p0 = pp[pp["period"] == 0].set_index("part")
    p1 = pp[pp["period"] == 1].set_index("part")
    both = p0.index.intersection(p1.index)
    P0 = p0.loc[both, "price_c"].to_numpy(np.int64)
    Q0 = p0.loc[both, "qty"].to_numpy(np.int64)
    P1 = p1.loc[both, "price_c"].to_numpy(np.int64)
    Q1 = p1.loc[both, "qty"].to_numpy(np.int64)
    ln_, ld = int((P1 * Q0).sum()), int((P0 * Q0).sum())
    pn, pd_ = int((P1 * Q1).sum()), int((P0 * Q1).sum())
    import math
    lasp = float(ln_) / float(ld)
    paas = float(pn) / float(pd_)
    fisher = math.sqrt((float(ln_) / float(ld))
                       * (float(pn) / float(pd_)))
    return pd.DataFrame({
        "n_items": [np.int64(len(both))],
        "l_num": [np.int64(ln_)], "l_den": [np.int64(ld)],
        "p_num": [np.int64(pn)], "p_den": [np.int64(pd_)],
        "laspeyres": [round(lasp, 6)],
        "paasche": [round(paas, 6)],
        "fisher": [round(fisher, 6)]})

_ENC_SPECS = [
    ("lineitem", "l_returnflag", "l_orderkey", "l_linenumber"),
    ("lineitem", "l_linestatus", "l_orderkey", "l_linenumber"),
    ("orders", "o_orderpriority", "o_custkey", "o_orderkey"),
    ("customer", "c_mktsegment", "c_nationkey", "c_custkey"),
]

def q_encoding_audit(sf_dir: str):
    """Storage-encoding advisor (the Parquet/ORC encoding-chooser
    audit): for each candidate string column, exact plain-encoding
    bytes, dictionary-encoding bytes (distinct value bytes +
    ⌈n·bitwidth/8⌉, bitwidth = bit_length(d−1)), and the RLE run
    count under the column's natural within-group order (runs reset
    at group boundaries — the row-group model; the value itself is
    the final sort key so order-key ties can't make the run count
    ambiguous). One co-location pass
    per spec for runs + byte partials, one combiner pass for the
    dictionary; all integers, bit-exact vs SQL."""
    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    rows = []
    for tbl, col, grp, ordc in _ENC_SPECS:
        ds = read_parquet_sized(f"{sf_dir}/{tbl}.parquet",
                                columns=[col, grp, ordc])

        def run_block(df: pd.DataFrame, _c=col, _g=grp,
                      _o=ordc) -> pd.DataFrame:
            if df.empty:
                return pd.DataFrame({"n": pd.Series(dtype="int64"),
                                     "runs": pd.Series(dtype="int64"),
                                     "pb": pd.Series(dtype="int64")})
            d = df.sort_values([_g, _o, _c])
            v = d[_c].astype(str)
            new_grp = d[_g].ne(d[_g].shift())
            changed = v.ne(v.shift())
            runs = int((new_grp | changed).sum())
            return pd.DataFrame({
                "n": [np.int64(len(d))],
                "runs": [np.int64(runs)],
                "pb": [np.int64(v.str.len().sum())]})

        part = grouped_apply(ds, [grp], run_block).to_pandas()
        n = int(part["n"].sum())
        runs = int(part["runs"].sum())
        plain = int(part["pb"].sum())
        dv = grouped_aggregate(
            ds.map_batches(lambda df, _c=col: pd.DataFrame(
                {"v": df[_c].astype(str)}), batch_format="pandas"),
            ["v"], {"n": (None, "count")}).to_pandas()
        d = len(dv)
        dict_val_bytes = int(dv["v"].str.len().sum())
        bw = (d - 1).bit_length() if d > 1 else 0
        dict_bytes = dict_val_bytes + (n * bw + 7) // 8
        rows.append((tbl, col, np.int64(n), np.int64(d),
                     np.int64(runs), np.int64(plain),
                     np.int64(dict_bytes)))
    return pd.DataFrame(rows, columns=[
        "tbl", "col", "n", "n_distinct", "n_runs", "plain_bytes",
        "dict_bytes"]).sort_values(["tbl", "col"]) \
        .reset_index(drop=True)

def q_join_cardinality(sf_dir: str):
    """Join-cardinality estimation audit (the System R uniformity
    formula |A⋈B| ≈ |A|·|B|/max(d_A, d_B) vs ground truth): the
    ACTUAL size comes WITHOUT materializing any join — per-key counts
    co-locate once and Σ c_A(k)·c_B(k) reduces through the combiner.
    Reports estimate, actual, and the q-error max(est/act, act/est)
    for three classic equi-joins."""
    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    specs = [("orders", "o_orderkey", "lineitem", "l_orderkey"),
             ("customer", "c_custkey", "orders", "o_custkey"),
             ("part", "p_partkey", "lineitem", "l_partkey")]
    rows = []
    for ta, ka, tb, kb in specs:
        da = read_parquet_sized(f"{sf_dir}/{ta}.parquet",
                                columns=[ka])
        db = read_parquet_sized(f"{sf_dir}/{tb}.parquet",
                                columns=[kb])
        ca = grouped_aggregate(
            da.map_batches(lambda df, _k=ka: pd.DataFrame(
                {"k": df[_k].to_numpy(np.int64)}),
                batch_format="pandas"),
            ["k"], {"n": (None, "count")})
        cb = grouped_aggregate(
            db.map_batches(lambda df, _k=kb: pd.DataFrame(
                {"k": df[_k].to_numpy(np.int64)}),
                batch_format="pandas"),
            ["k"], {"n": (None, "count")})

        def tag(side):
            def f(df: pd.DataFrame) -> pd.DataFrame:
                if df.empty or "k" not in df.columns:
                    return pd.DataFrame(
                        {"k": pd.Series(dtype="int64"),
                         "side": pd.Series(dtype="object"),
                         "n": pd.Series(dtype="int64")})
                return pd.DataFrame({"k": df["k"].to_numpy(np.int64),
                                     "side": side,
                                     "n": df["n"].to_numpy(np.int64)})
            return f

        both = ca.map_batches(tag("a"), batch_format="pandas").union(
            cb.map_batches(tag("b"), batch_format="pandas"))

        def prod_block(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty or "k" not in df.columns:
                return pd.DataFrame({"s": pd.Series(dtype="int64")})
            p = df.pivot_table(index="k", columns="side", values="n",
                               aggfunc="sum", fill_value=0)
            if "a" not in p.columns or "b" not in p.columns:
                return pd.DataFrame({"s": [np.int64(0)]})
            return pd.DataFrame({"s": [np.int64(
                int((p["a"].to_numpy(np.int64)
                     * p["b"].to_numpy(np.int64)).sum()))]})

        actual = int(grouped_apply(both, ["k"], prod_block)
                     .to_pandas()["s"].sum())
        stats_a = ca.map_batches(
            lambda df: pd.DataFrame({"c": [int(df["n"].sum())],
                                     "d": [len(df)]}),
            batch_format="pandas", batch_size=None).to_pandas().sum()
        stats_b = cb.map_batches(
            lambda df: pd.DataFrame({"c": [int(df["n"].sum())],
                                     "d": [len(df)]}),
            batch_format="pandas", batch_size=None).to_pandas().sum()
        na, daa = int(stats_a["c"]), int(stats_a["d"])
        nb, dbb = int(stats_b["c"]), int(stats_b["d"])
        est = na * nb / max(daa, dbb)
        qerr = max(est / actual, actual / est) if actual and est \
            else 0.0
        rows.append((ta, tb, np.int64(na), np.int64(nb),
                     float(_round_half_away(est, 6)),
                     np.int64(actual),
                     float(_round_half_away(qerr, 6))))
    return pd.DataFrame(rows, columns=[
        "tbl_a", "tbl_b", "n_a", "n_b", "est", "actual", "q_error"]) \
        .sort_values(["tbl_a", "tbl_b"]).reset_index(drop=True)

def q_lineitem_hilbert(sf_dir: str):
    """Hilbert-curve clustering audit of lineitem on
    (l_partkey, l_suppkey) — the locality-stronger twin of
    q_lineitem_zorder (consecutive Hilbert codes are always
    grid-adjacent, so bucket envelopes are tighter on average; Moon
    et al. '01). Same dataflow as the Z-order audit: one vectorized
    xy→d pass (16 shift/mask/where steps, no row loop), exact-integer
    bucket assignment d·64 // (maxd+1), per-bucket zone-map envelopes
    through the combiner. Integer-only end to end, so the generated
    16-stage rotate/reflect CTE oracle replays it bit-for-bit."""
    from jerex_ray.ops.layout import hilbert_interleave, \
        zorder_layout_stats
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/lineitem.parquet",
                            columns=["l_partkey", "l_suppkey"])
    return zorder_layout_stats(ds, cols=["l_partkey", "l_suppkey"],
                               nbuckets=64,
                               interleave=hilbert_interleave)

def _hilbert_oracle_sql(cols=("l_partkey", "l_suppkey"),
                        nbuckets: int = 64, bits: int = 16) -> str:
    """Generated unroll of the Hilbert xy→d transform: one CTE per
    bit level carrying (x, y, d) through the rotate/reflect step,
    originals preserved for the zone-map envelopes."""
    cx, cy = cols
    stages = [f"""h0 AS (
        SELECT {cx} AS ox, {cy} AS oy,
               CAST({cx} AS BIGINT) AS x, CAST({cy} AS BIGINT) AS y,
               CAST(0 AS BIGINT) AS d
        FROM lineitem)"""]
    for i in range(bits):
        s = 1 << (bits - 1 - i)
        stages.append(f"""h{i + 1} AS (
            SELECT ox, oy,
                CASE WHEN (y & {s}) = 0
                     THEN CASE WHEN (x & {s}) > 0
                               THEN {s} - 1 - y ELSE y END
                     ELSE x END AS x,
                CASE WHEN (y & {s}) = 0
                     THEN CASE WHEN (x & {s}) > 0
                               THEN {s} - 1 - x ELSE x END
                     ELSE y END AS y,
                d + {s * s} * xor(
                    3 * (CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END),
                    CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END) AS d
            FROM h{i})""")
    return f"""
        WITH {','.join(stages)},
        mx AS (SELECT max(d) AS m FROM h{bits}),
        b AS (SELECT ox, oy,
                     (d * {nbuckets}) // ((SELECT m FROM mx) + 1)
                         AS bucket
              FROM h{bits})
        SELECT bucket, count(*) AS n,
               min(ox) AS {cx}_min, max(ox) AS {cx}_max,
               min(oy) AS {cy}_min, max(oy) AS {cy}_max
        FROM b GROUP BY bucket ORDER BY bucket
    """

def q_customer_linkage_fs(sf_dir: str):
    """Fellegi–Sunter probabilistic record linkage (Fellegi & Sunter
    '69, the decision-theoretic core of every modern ER system) over
    nation-blocked customer pairs. Three comparison fields — market
    segment, 100-unit balance band (exact integer cents, offset
    positive so ``//`` floors identically in numpy and SQL), custkey
    last digit — scored with quantized integer log-weights
    ``wa=floor(1e6·(ln m − ln u))`` / ``wd=floor(1e6·(ln(1−m) −
    ln(1−u)))``, where each field's u-probability is the exact global
    agreement odds Σ c_v(c_v−1)/(N(N−1)) from a vocab-bounded
    histogram pass. Integer pair scores ⇒ the SQL self-join oracle
    reproduces the top-100 bit-for-bit. Dataflow: histogram combiner
    passes for u, ONE hash co-location by blocking key, vectorized
    in-block pair enumeration (triu indices — pairs never cross the
    cluster), per-block top-100 + driver merge."""
    from jerex_ray.functions.aggregate import grouped_aggregate, \
        grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal",
                 "c_mktsegment"])

    def feats(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(df["c_acctbal"].to_numpy(np.float64)
                         * 100).astype(np.int64)
        return pd.DataFrame({
            "id": df["c_custkey"].astype("int64"),
            "nk": df["c_nationkey"].astype("int64"),
            "f1": df["c_mktsegment"].astype(str),
            "f2": (cents + 100000) // 10000,
            "f3": df["c_custkey"].astype("int64") % 10})

    fds = ds.map_batches(feats, batch_format="pandas",
                         batch_size=65536).materialize()
    m_probs = (0.95, 0.9, 0.85)
    wa, wd = [], []
    for f, m in zip(("f1", "f2", "f3"), m_probs):
        h = grouped_aggregate(fds, [f], {"c": (None, "count")},
                              result_hint="small").to_pandas()
        c = h["c"].to_numpy(np.int64)
        n = int(c.sum())
        u = float(int((c * (c - 1)).sum())) / float(n * (n - 1))
        wa.append(int(np.floor(1e6 * (np.log(m) - np.log(u)))))
        wd.append(int(np.floor(1e6 * (np.log(1.0 - m)
                                      - np.log(1.0 - u)))))
    wa_v, wd_v = np.array(wa, dtype=np.int64), \
        np.array(wd, dtype=np.int64)
    empty = pd.DataFrame({
        "id_a": pd.Series(dtype="int64"),
        "id_b": pd.Series(dtype="int64"),
        "agree_seg": pd.Series(dtype="int64"),
        "agree_bal": pd.Series(dtype="int64"),
        "agree_digit": pd.Series(dtype="int64"),
        "score_micro": pd.Series(dtype="int64")})

    def block_pairs(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, g in df.groupby("nk", sort=False):
            g = g.sort_values("id")
            ids = g["id"].to_numpy(np.int64)
            if len(ids) < 2:
                continue
            i, j = np.triu_indices(len(ids), k=1)
            score = np.zeros(len(i), dtype=np.int64)
            agrees = []
            for fi, f in enumerate(("f1", "f2", "f3")):
                v = g[f].to_numpy()
                a = v[i] == v[j]
                agrees.append(a.astype(np.int64))
                score += np.where(a, wa_v[fi], wd_v[fi])
            d = pd.DataFrame({"id_a": ids[i], "id_b": ids[j],
                              "agree_seg": agrees[0],
                              "agree_bal": agrees[1],
                              "agree_digit": agrees[2],
                              "score_micro": score})
            rows.append(d.sort_values(
                ["score_micro", "id_a", "id_b"],
                ascending=[False, True, True]).head(100))
        return pd.concat(rows, ignore_index=True) if rows else empty

    cand = grouped_apply(fds, ["nk"], block_pairs).to_pandas()
    if cand.empty:
        return empty
    out = cand.sort_values(["score_micro", "id_a", "id_b"],
                           ascending=[False, True, True]) \
        .head(100).reset_index(drop=True)
    return out.astype({c: "int64" for c in out.columns})

def q_join_order_dp(sf_dir: str):
    """Cost-based join-order planning (Selinger et al. '79) over the
    nation⋈customer⋈orders⋈lineitem chain — the planner audit an
    engine consults before committing a join tree. Distributed part:
    exact row counts and per-edge distinct-key counts (the System-R
    statistics pass). Driver part: the contiguous-range DP over the
    metadata-sized range table with the classic cardinality model
    |A⋈B| = |A|·|B| / max(d_A, d_B) kept EXACT — one big-int product
    divided once per range (Python ints / SQL HUGEINT, both
    truncating positives), Cout cost = |output| summed over
    intermediates, ties to the smallest split. Everything integer ⇒
    the SQL oracle replays plan costs and split choices bit-for-bit.
    Output: one row per contiguous range (r_from, r_to, est_card,
    best_cost, best_split; singles cost 0 / split 0)."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()

    def _distinct(path: str, col: str) -> int:
        d = read_parquet_sized(path, columns=[col])
        return grouped_aggregate(d, [col], {"c": (None, "count")},
                                 result_hint="small").count()

    paths = {t: f"{sf_dir}/{t}.parquet"
             for t in ("nation", "customer", "orders", "lineitem")}
    rows = [read_parquet_sized(paths[t]).count()
            for t in ("nation", "customer", "orders", "lineitem")]
    # edge k joins relation k and k+1; denominator = max distinct
    dens = [
        max(_distinct(paths["nation"], "n_nationkey"),
            _distinct(paths["customer"], "c_nationkey")),
        max(_distinct(paths["customer"], "c_custkey"),
            _distinct(paths["orders"], "o_custkey")),
        max(_distinct(paths["orders"], "o_orderkey"),
            _distinct(paths["lineitem"], "l_orderkey")),
    ]

    def card(i: int, j: int) -> int:          # 1-indexed inclusive
        num = 1
        for t in range(i, j + 1):
            num *= rows[t - 1]
        den = 1
        for e in range(i, j):
            den *= dens[e - 1]
        return num // den

    cost: dict[tuple, int] = {}
    split: dict[tuple, int] = {}
    for i in range(1, 5):
        cost[(i, i)] = 0
        split[(i, i)] = 0
    for ln in range(2, 5):
        for i in range(1, 6 - ln):
            j = i + ln - 1
            best_c, best_k = None, None
            for k in range(i, j):
                c = cost[(i, k)] + cost[(k + 1, j)]
                if best_c is None or c < best_c:
                    best_c, best_k = c, k
            cost[(i, j)] = best_c + card(i, j)
            split[(i, j)] = best_k
    out = [(i, j, card(i, j) if i != j else rows[i - 1],
            cost[(i, j)], split[(i, j)])
           for i in range(1, 5) for j in range(i, 5)]
    out.sort()
    return pd.DataFrame(out, columns=["r_from", "r_to", "est_card",
                                      "best_cost", "best_split"]) \
        .astype("int64")

def q_lineitem_gains(sf_dir: str):
    """Cumulative gains curve of quantity-predicts-return (the
    marketing "decile lift" table at score-value granularity, which
    sidesteps NTILE tie-splitting entirely): for each quantity value
    scanned best-first, cumulative rows and cumulative positives
    (l_returnflag = 'R'). The score vocabulary is bounded (integer
    quantities), so ONE combiner pass reduces the corpus to ≤50 rows
    and the cumulative sums are exact integers on a driver-side
    table; completes the AUC/ROC eval family with the gains/lift
    view. SQL-oracled via window sums."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/lineitem.parquet",
                            columns=["l_quantity", "l_returnflag"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        q = df["l_quantity"].to_numpy(np.float64).astype(np.int64)
        pos = (df["l_returnflag"] == "R").to_numpy(np.int64)
        return (pd.DataFrame({"quantity": q, "n": 1, "pos": pos})
                .groupby("quantity", sort=False).sum().reset_index())

    h = grouped_aggregate(
        ds.map_batches(partial, batch_format="pandas",
                       batch_size=65536),
        ["quantity"], {"n": ("n", "sum"), "pos": ("pos", "sum")},
        result_hint="small").to_pandas() \
        .sort_values("quantity", ascending=False) \
        .reset_index(drop=True)
    h["cum_n"] = h["n"].cumsum()
    h["cum_pos"] = h["pos"].cumsum()
    tot_pos = int(h["pos"].sum())
    h["gain_share"] = np.round(
        h["cum_pos"].to_numpy(np.float64) / float(tot_pos), 6)
    return h.astype({c: "int64" for c in
                     ("quantity", "n", "pos", "cum_n", "cum_pos")})

def q_part_katz(sf_dir: str):
    """Katz centrality (Katz '53) over the customer–part purchase
    incidence, exact-integer form (``ops/graph.katz_bipartite``):
    α = 1/4 cleared by scaling, so every score is an integer
    walk-count combination and the chained-CTE oracle replays the
    4 SpMV rounds bit-for-bit. Broadcast-SpMV dataflow — incidence
    materializes once, node-sized vectors move per round."""
    from jerex_ray.ops.graph import katz_bipartite
    from jerex_ray.runtime import read_parquet_sized, \
        shuffle_partitions
    configure_data_context()
    li = read_parquet_sized(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey"])
    orders = read_parquet_sized(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_custkey"])
    j = li.join(orders, join_type="inner",
                num_partitions=shuffle_partitions(8),
                on=("l_orderkey",), right_on=("o_orderkey",))
    out = katz_bipartite(j, u_col="o_custkey", v_col="l_partkey",
                         iters=4, alpha_denom=4)
    out["node"] = out["node"].astype("int64")
    return out

def _katz_oracle_sql(iters: int = 4, denom: int = 4) -> str:
    """Chained-CTE replay of ``q_part_katz``: one u-side and one
    v-side SpMV CTE per iteration over the distinct incidence, then
    the integer-weighted sum Σ denom^{K−k}·s_k per node."""
    sql = """
        WITH e AS MATERIALIZED (
            SELECT DISTINCT o_custkey AS u, l_partkey AS v
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        su0 AS (SELECT u, CAST(1 AS BIGINT) AS s
                FROM (SELECT DISTINCT u FROM e)),
        sv0 AS (SELECT v, CAST(1 AS BIGINT) AS s
                FROM (SELECT DISTINCT v FROM e))"""
    for k in range(1, iters + 1):
        sql += f""",
        su{k} AS MATERIALIZED (
            SELECT u, sum(sv{k - 1}.s) AS s
            FROM e JOIN sv{k - 1} USING (v) GROUP BY u),
        sv{k} AS MATERIALIZED (
            SELECT v, sum(su{k - 1}.s) AS s
            FROM e JOIN su{k - 1} USING (u) GROUP BY v)"""
    wu = " + ".join(f"{denom ** (iters - k)} * su{k}.s"
                    for k in range(1, iters + 1))
    wv = " + ".join(f"{denom ** (iters - k)} * sv{k}.s"
                    for k in range(1, iters + 1))
    ju = " ".join(f"JOIN su{k} USING (u)"
                  for k in range(2, iters + 1))
    jv = " ".join(f"JOIN sv{k} USING (v)"
                  for k in range(2, iters + 1))
    sql += f"""
        SELECT side, node, katz_scaled FROM (
            SELECT 'o_custkey' AS side, su1.u AS node,
                   CAST({wu} AS BIGINT) AS katz_scaled
            FROM su1 {ju}
            UNION ALL
            SELECT 'l_partkey', sv1.v, CAST({wv} AS BIGINT)
            FROM sv1 {jv})
        ORDER BY side, node"""
    return sql

def q_part_walks(sf_dir: str):
    """Deterministic DeepWalk corpus (Perozzi et al. '14) over the
    part co-purchase graph: 2 walks × 3 steps from every node, hop s
    = sorted-neighbor rank md5('walk|start|w|s|cur') % deg — the
    md5-seeded twin of the engine's per-doc seeded sampling, so the
    corpus is shard-independent and the generated SQL oracle replays
    every hop bit-for-bit (``ops/graph.deterministic_walks``). Per
    step only node-sized frontier state moves; the pick happens
    against the degree table BEFORE touching adjacency, so no
    neighborhood blow-up materializes."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.ops.graph import deterministic_walks
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
                             "b": m["l_partkey_y"].to_numpy()}) \
            .drop_duplicates()

    edges = grouped_apply(li, ["l_orderkey"], pairs_block)
    return deterministic_walks(edges, src="a", dst="b",
                               walks=2, length=3)

def _walks_oracle_sql(walks: int = 2, length: int = 3) -> str:
    """Generated per-step replay of ``q_part_walks``: ranked sorted
    adjacency via row_number, each step CTE picks rank
    md5-hash % deg exactly as the engine does."""
    sql = """
        WITH inc AS MATERIALIZED (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        ed AS MATERIALIZED (
            SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
            FROM inc a JOIN inc b
                 ON a.l_orderkey = b.l_orderkey
                AND a.l_partkey < b.l_partkey),
        adj AS MATERIALIZED (
            SELECT u, nbr,
                   row_number() OVER (PARTITION BY u ORDER BY nbr)
                       - 1 AS rnk,
                   count(*) OVER (PARTITION BY u) AS deg
            FROM (SELECT a AS u, b AS nbr FROM ed
                  UNION ALL SELECT b, a FROM ed)),
        dg AS MATERIALIZED (SELECT DISTINCT u, deg FROM adj),
        f0 AS MATERIALIZED (
            SELECT n.u AS start, w.w AS walk, n.u AS cur
            FROM (SELECT DISTINCT u FROM adj) n
            CROSS JOIN (SELECT unnest(range(%d)) AS w) w)""" % walks
    for s in range(1, length + 1):
        sql += f""",
        f{s} AS MATERIALIZED (
            SELECT f.start, f.walk, a.nbr AS cur
            FROM f{s - 1} f
            JOIN dg d ON d.u = f.cur
            JOIN adj a ON a.u = f.cur AND a.rnk = CAST(
                CAST('0x' || substr(md5(
                    'walk|' || f.start || '|' || f.walk
                    || '|{s}|' || f.cur), 1, 16) AS UBIGINT)
                % CAST(d.deg AS UBIGINT) AS BIGINT))"""
    union = "\nUNION ALL ".join(
        f"SELECT start, walk, CAST({s} AS BIGINT) AS step,"
        f" cur AS node FROM f{s}"
        for s in range(length + 1))
    return sql + f"""
        SELECT * FROM ({union})
        ORDER BY start, walk, step"""

def q_doc_langid_kappa(sf_dir: str):
    """Cohen's kappa (Cohen '60) between the engine's stopword-profile
    language ID and the corpus's labeled lang column — the standard
    annotator-agreement audit of a labeling pipeline. Exact integers
    end to end: kappa = (N·Σn_kk − Σr_k·c_k)/(N² − Σr_k·c_k) is one
    final divide of exact integer sums from the label-vocabulary-
    bounded confusion matrix (one distributed join + one combiner
    pass). Output also carries the raw agreement and chance terms."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.ops.textstats import run_langid
    from jerex_ray.runtime import read_parquet_sized, \
        shuffle_partitions
    configure_data_context()
    docs = read_parquet_sized(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text", "lang"])
    pred = run_langid(docs.drop_columns(["lang"])).materialize()
    truth = docs.drop_columns(["text"]).materialize()
    j = pred.join(truth, join_type="inner",
                  num_partitions=shuffle_partitions(8),
                  on=("doc_id",))
    conf = grouped_aggregate(j, ["lang", "lang_pred"],
                             {"n": (None, "count")},
                             result_hint="small").to_pandas()
    n_tot = int(conf["n"].sum())
    agree = int(conf.loc[conf["lang"] == conf["lang_pred"],
                         "n"].sum())
    rs = conf.groupby("lang")["n"].sum()
    cs = conf.groupby("lang_pred")["n"].sum()
    labels = sorted(set(rs.index) | set(cs.index))
    chance = sum(int(rs.get(lb, 0)) * int(cs.get(lb, 0))
                 for lb in labels)
    kappa = float(n_tot * agree - chance) \
        / float(n_tot * n_tot - chance)
    return pd.DataFrame({
        "n_docs": [np.int64(n_tot)],
        "n_agree": [np.int64(agree)],
        "chance_cross": [np.int64(chance)],
        "kappa": [round(kappa, 6)]})

def q_part_mst(sf_dir: str, *, oracle_rounds: int = 6,
               min_cocount: int = 2):
    """Minimum spanning forest of the repeat co-purchase graph by
    synchronized Borůvka rounds (Borůvka 1926 / GHS '83 — the
    log-round component-hooking MST every distributed engine runs;
    ``ops/graph.boruvka_mst``). Edge weight = 1 + md5_64("a|b") % 97
    (the SQL-replayable ``md5_hash64`` contract); the effective
    weight is the STRICT total order (w, a, b), so the forest is
    unique and equal to Kruskal's under the same key — pinned by a
    serial-Kruskal pytest AND by the per-round CTE oracle, which
    replays every component's minimum outgoing edge and the
    min-label contraction closure. Per round: one streaming pass
    over the never-moving edge Dataset with the node-bounded label
    map broadcast via ``ray.put``; only (components × blocks)
    lexmin partials reach the driver. Asserts convergence within
    the oracle's unrolled depth (the ``q_part_sssp`` contract)."""
    from jerex_ray.ops.graph import boruvka_mst
    from jerex_ray.util import md5_hash64_batch
    configure_data_context()
    edges = _repeat_copurchase_edges(sf_dir, min_cocount=min_cocount)

    def with_w(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "a" not in df.columns:
            return pd.DataFrame({"a": pd.Series(dtype="int64"),
                                 "b": pd.Series(dtype="int64"),
                                 "w": pd.Series(dtype="int64")})
        a = df["a"].to_numpy(np.int64)
        b = df["b"].to_numpy(np.int64)
        w = 1 + (md5_hash64_batch(
            [f"{x}|{y}" for x, y in zip(a, b)]) % 97).astype(np.int64)
        return pd.DataFrame({"a": a, "b": b, "w": w})

    wedges = edges.map_batches(with_w, batch_format="pandas")
    out = boruvka_mst(wedges, max_rounds=32)
    if len(out):
        rounds = int(out["round"].max())
        assert rounds <= oracle_rounds, \
            f"MST finished at round {rounds} > oracle depth " \
            f"{oracle_rounds}"
    return out

def _mst_oracle_sql(rounds: int = 6, min_cocount: int = 2) -> str:
    """Per-round Borůvka replay of ``q_part_mst``: the thresholded
    co-purchase edge CTE with md5-derived weights, then per round a
    cross-edge CTE under the current labeling, the per-component
    rank-1 pick over both orientations ordered by the strict key
    (w, a, b), the deduped chosen set, and the min-label contraction
    via a recursive reachability closure over the hook edges. Any
    unroll depth ≥ the engine's asserted convergence round yields
    the identical (unique) forest."""
    sql = f"""
        WITH RECURSIVE inc AS MATERIALIZED (
            SELECT DISTINCT l_orderkey AS o, l_partkey AS p
            FROM lineitem),
        e0 AS MATERIALIZED (
            SELECT a.p AS a, b.p AS b
            FROM inc a JOIN inc b ON a.o = b.o AND a.p < b.p
            GROUP BY a.p, b.p HAVING count(*) >= {min_cocount}),
        we AS MATERIALIZED (
            SELECT a, b, CAST(1 + CAST('0x' || substr(md5(
                       CAST(a AS VARCHAR) || '|' || CAST(b AS VARCHAR)),
                       1, 16) AS UBIGINT) % 97 AS BIGINT) AS w
            FROM e0),
        lab1 AS MATERIALIZED (
            SELECT u AS node, u AS c FROM (
                SELECT a AS u FROM we UNION SELECT b FROM we))"""
    for r in range(1, rounds + 1):
        sql += f""",
        x{r} AS MATERIALIZED (
            SELECT e.a, e.b, e.w, la.c AS ca, lb.c AS cb
            FROM we e JOIN lab{r} la ON la.node = e.a
                      JOIN lab{r} lb ON lb.node = e.b
            WHERE la.c <> lb.c),
        pick{r} AS MATERIALIZED (
            SELECT a, b FROM (
                SELECT c, a, b, row_number() OVER (
                        PARTITION BY c ORDER BY w, a, b) AS rn
                FROM (SELECT ca AS c, a, b, w FROM x{r}
                      UNION ALL SELECT cb, a, b, w FROM x{r}))
            WHERE rn = 1),
        ch{r} AS MATERIALIZED (
            SELECT DISTINCT x.a, x.b, x.w, x.ca, x.cb
            FROM x{r} x JOIN (SELECT DISTINCT a, b FROM pick{r}) p
                 ON p.a = x.a AND p.b = x.b),
        hk{r} AS MATERIALIZED (
            SELECT ca AS u, cb AS v FROM ch{r}
            UNION SELECT cb, ca FROM ch{r}),
        rc{r} AS (
            SELECT u AS root, u AS node FROM (
                SELECT DISTINCT u FROM hk{r})
            UNION
            SELECT rc{r}.root, h.v
            FROM rc{r} JOIN hk{r} h ON h.u = rc{r}.node),
        nl{r} AS MATERIALIZED (
            SELECT root AS c, min(node) AS newc
            FROM rc{r} GROUP BY root),
        lab{r + 1} AS MATERIALIZED (
            SELECT l.node, coalesce(n.newc, l.c) AS c
            FROM lab{r} l LEFT JOIN nl{r} n ON n.c = l.c)"""
    parts = [f"""
        SELECT a, b, w, CAST({r} AS BIGINT) AS round FROM ch{r}"""
             for r in range(1, rounds + 1)]
    return sql + "\nSELECT * FROM (" \
        + "\nUNION ALL ".join(parts) + ") ORDER BY a, b"

def q_part_item_cosine(sf_dir: str, *, k: int = 5,
                       min_cocount: int = 2):
    """Item-item cosine kNN (Sarwar et al. '01 — the neighborhood
    collaborative-filtering primitive beside the ALS factor step):
    over the binary part × order incidence, cos(a,b) =
    n_ab / √(d_a·d_b) with n_ab = orders containing both and d =
    the part's distinct-order degree; per part the top-``k``
    neighbors by (cos DESC, neighbor ASC). The ONLY float is the
    single-divide score n²/(d_a·d_b) — one identical expression on
    both engines, so the rank cut is deterministic (the t-closeness
    identical-double convention); the reported cos rounds to 6.

    Scale shape: pair counts come from the per-order co-location
    combiner (the thresholded ``_repeat_copurchase_edges`` pass),
    degrees from a distinct-incidence combiner broadcast as a
    node-bounded map, and the top-k cut is per-block exact after ONE
    hash co-location by center part."""
    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    li = read_parquet_sized(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey"])

    def pairs_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"a": pd.Series(dtype="int64"),
                                 "b": pd.Series(dtype="int64"),
                                 "c": pd.Series(dtype="int64")})
        d = df.drop_duplicates(["l_orderkey", "l_partkey"])
        m = d.merge(d, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        g = m.groupby(["l_partkey_x", "l_partkey_y"], sort=False) \
            .size().reset_index(name="c")
        return pd.DataFrame({"a": g["l_partkey_x"].to_numpy(),
                             "b": g["l_partkey_y"].to_numpy(),
                             "c": g["c"].to_numpy(np.int64)})

    cnt = grouped_aggregate(
        grouped_apply(li, ["l_orderkey"], pairs_block),
        ["a", "b"], {"n": ("c", "sum")})
    edges = cnt.map_batches(
        lambda df: df[df["n"] >= min_cocount]
        if "a" in df.columns else df, batch_format="pandas")

    deg = grouped_aggregate(
        li.map_batches(
            lambda df: df.drop_duplicates(
                ["l_orderkey", "l_partkey"]).rename(
                columns={"l_partkey": "p"})[["p"]],
            batch_format="pandas"),
        ["p"], {"d": (None, "count")}).to_pandas()
    dmap = dict(zip(deg["p"].astype("int64"),
                    deg["d"].astype("int64")))
    import ray
    dref = ray.put(dmap)

    def both_dirs(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "a" not in df.columns:
            return pd.DataFrame({"p": pd.Series(dtype="int64"),
                                 "nbr": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64")})
        a = df["a"].to_numpy(np.int64)
        b = df["b"].to_numpy(np.int64)
        n = df["n"].to_numpy(np.int64)
        return pd.DataFrame({"p": np.r_[a, b], "nbr": np.r_[b, a],
                             "n": np.r_[n, n]})

    def topk_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({
                "p": pd.Series(dtype="int64"),
                "nbr": pd.Series(dtype="int64"),
                "n_common": pd.Series(dtype="int64"),
                "cos": pd.Series(dtype="float64")})
        dm = ray.get(dref)
        da = df["p"].map(dm).to_numpy(np.int64)
        db = df["nbr"].map(dm).to_numpy(np.int64)
        n = df["n"].to_numpy(np.int64)
        score = (n * n) / (da * db)          # the one shared divide
        out = df.assign(score=score)
        out = out.sort_values(["p", "score", "nbr"],
                              ascending=[True, False, True],
                              kind="mergesort")
        out = out.groupby("p", sort=False).head(k)
        return pd.DataFrame({
            "p": out["p"].to_numpy(np.int64),
            "nbr": out["nbr"].to_numpy(np.int64),
            "n_common": out["n"].to_numpy(np.int64),
            "cos": np.round(np.sqrt(out["score"].to_numpy()), 6)})

    out = grouped_apply(edges.map_batches(
        both_dirs, batch_format="pandas"), ["p"], topk_block) \
        .to_pandas()
    if out.empty or "p" not in out.columns:
        return pd.DataFrame({"p": pd.Series(dtype="int64"),
                             "nbr": pd.Series(dtype="int64"),
                             "n_common": pd.Series(dtype="int64"),
                             "cos": pd.Series(dtype="float64")})
    return out.sort_values(["p", "nbr"]).reset_index(drop=True)

def _item_cosine_oracle_sql(k: int = 5, min_cocount: int = 2) -> str:
    return f"""
        WITH inc AS MATERIALIZED (
            SELECT DISTINCT l_orderkey AS o, l_partkey AS p
            FROM lineitem),
        deg AS MATERIALIZED (
            SELECT p, count(*) AS d FROM inc GROUP BY p),
        e0 AS MATERIALIZED (
            SELECT a.p AS a, b.p AS b, count(*) AS n
            FROM inc a JOIN inc b ON a.o = b.o AND a.p < b.p
            GROUP BY a.p, b.p HAVING count(*) >= {min_cocount}),
        bi AS (SELECT a AS p, b AS nbr, n FROM e0
               UNION ALL SELECT b, a, n FROM e0),
        sc AS (SELECT bi.p, bi.nbr, bi.n,
                      (bi.n * bi.n) / (da.d * db.d * 1.0) AS score
               FROM bi JOIN deg da ON da.p = bi.p
                       JOIN deg db ON db.p = bi.nbr),
        rk AS (SELECT p, nbr, n, score, row_number() OVER (
                   PARTITION BY p ORDER BY score DESC, nbr ASC)
                   AS rn
               FROM sc)
        SELECT p, nbr, CAST(n AS BIGINT) AS n_common,
               round(sqrt(score), 6) AS cos
        FROM rk WHERE rn <= {k} ORDER BY p, nbr"""

def q_stable_matching(sf_dir: str, *, n: int = 8,
                      oracle_rounds: int = 16):
    """Gale–Shapley stable matching (Gale & Shapley '62) between
    the top-``n`` customers and top-``n`` suppliers by account
    balance (strict (balance DESC, key ASC) pick): preference ranks
    on both sides come from md5("c|s") / md5("s|c") — the
    SQL-replayable ``md5_hash64`` contract, distinct with
    overwhelming probability and pinned strict by the (hash, id)
    tie key. Runs the ROUND-SYNCHRONOUS proposer variant (all free
    customers propose to their best not-yet-tried supplier; each
    supplier keeps its best suitor) — deterministic and identical
    to classic deferred acceptance's result (the proposer-optimal
    stable matching is unique), which is what the generated
    per-round CTE oracle replays. Stability (no blocking pair) is
    pytest-verified by brute force.

    Scale shape: two combiner top-k passes pick the participants;
    the n×n preference table is metadata-sized and the proposal
    rounds run driver-side (the Selinger/Viterbi convention).
    Asserts convergence within the oracle's unrolled depth."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    from jerex_ray.util import md5_hash64
    configure_data_context()

    def top_keys(table: str, key: str, bal: str) -> list[int]:
        ds = read_parquet_sized(f"{sf_dir}/{table}.parquet",
                                columns=[key, bal])
        t = grouped_aggregate(ds, [key], {"b": (bal, "max")}) \
            .to_pandas()
        t = t.sort_values(["b", key], ascending=[False, True])
        return [int(v) for v in t[key].head(n)]

    cs = top_keys("customer", "c_custkey", "c_acctbal")
    ss = top_keys("supplier", "s_suppkey", "s_acctbal")
    # customer c's preference list: suppliers by md5("c|s") ASC
    pref_c = {c: sorted(ss, key=lambda s: (md5_hash64(f"{c}|{s}"), s))
              for c in cs}
    # supplier s prefers the suitor with smaller md5("s|c")
    srank = {(s, c): (md5_hash64(f"{s}|{c}"), c)
             for s in ss for c in cs}

    nxt = dict.fromkeys(cs, 0)        # next proposal index
    engaged: dict[int, int] = {}      # supplier -> customer
    rounds = 0
    while True:
        rounds += 1
        free = [c for c in cs if c not in engaged.values()
                and nxt[c] < n]
        if not free:
            break
        props: dict[int, list[int]] = {}
        for c in free:
            s = pref_c[c][nxt[c]]
            nxt[c] += 1
            props.setdefault(s, []).append(c)
        for s, suitors in props.items():
            cand = suitors + ([engaged[s]] if s in engaged else [])
            engaged[s] = min(cand, key=lambda c: srank[(s, c)])
        assert rounds <= oracle_rounds, \
            f"GS still running at round {rounds} > {oracle_rounds}"
    return pd.DataFrame(
        sorted((c, s) for s, c in engaged.items()),
        columns=["c_custkey", "s_suppkey"]).astype("int64")

def _stable_matching_oracle_sql(n: int = 8,
                                rounds: int = 16) -> str:
    """Per-round replay of ``q_stable_matching``: the proposal
    state is (customer, tried-count, engaged supplier or NULL);
    each round free customers propose to preference rank
    tried+1, suppliers keep the md5-smallest suitor."""
    h = ("CAST('0x' || substr(md5(CAST({a} AS VARCHAR) || '|' || "
         "CAST({b} AS VARCHAR)), 1, 16) AS UBIGINT)")
    hc = h.format(a="c.c", b="s.s")
    hs = h.format(a="s.s", b="c.c")
    sql = f"""
        WITH cs AS MATERIALIZED (
            SELECT c_custkey AS c FROM customer
            ORDER BY c_acctbal DESC, c_custkey ASC LIMIT {n}),
        ss AS MATERIALIZED (
            SELECT s_suppkey AS s FROM supplier
            ORDER BY s_acctbal DESC, s_suppkey ASC LIMIT {n}),
        pr AS MATERIALIZED (
            SELECT c.c, s.s,
                   row_number() OVER (PARTITION BY c.c
                       ORDER BY {hc}, s.s) AS crk,
                   {hs} AS shash
            FROM cs c CROSS JOIN ss s),
        st0 AS (SELECT c, 0 AS tried, CAST(NULL AS BIGINT) AS eng
                FROM cs)"""
    for r in range(1, rounds + 1):
        p, q = f"st{r - 1}", f"st{r}"
        sql += f""",
        pp{r} AS MATERIALIZED (
            SELECT {p}.c, pr.s, pr.shash
            FROM {p} JOIN pr ON pr.c = {p}.c
                             AND pr.crk = {p}.tried + 1
            WHERE {p}.eng IS NULL AND {p}.tried < {n}),
        win{r} AS MATERIALIZED (
            SELECT s, c FROM (
                SELECT u.s, u.c, row_number() OVER (
                    PARTITION BY u.s ORDER BY u.shash, u.c) AS rn
                FROM (
                    SELECT s, c, shash FROM pp{r}
                    UNION ALL
                    SELECT p0.eng AS s, p0.c,
                           (SELECT shash FROM pr
                            WHERE pr.c = p0.c AND pr.s = p0.eng)
                    FROM {p} p0 WHERE p0.eng IS NOT NULL) u)
            WHERE rn = 1),
        {q} AS MATERIALIZED (
            SELECT {p}.c,
                   {p}.tried + CASE WHEN pp{r}.c IS NOT NULL
                                    THEN 1 ELSE 0 END AS tried,
                   w.s AS eng
            FROM {p}
            LEFT JOIN pp{r} ON pp{r}.c = {p}.c
            LEFT JOIN win{r} w ON w.c = {p}.c)"""
    return sql + f"""
        SELECT c AS c_custkey, eng AS s_suppkey
        FROM st{rounds} WHERE eng IS NOT NULL
        ORDER BY c_custkey"""

def q_doc_token_align(sf_dir: str):
    """Token-level global alignment distance (Needleman–Wunsch '70
    with unit costs = Levenshtein on the token alphabet) between the
    two LONGEST documents (n_tokens DESC, doc_id ASC — the knapsack
    pick): the document-scale sibling of the char-level edit
    distance the canonicalizer uses (M8). The DP row update is
    fully vectorized via the prefix-min identity dp[i][j] = j +
    min_{k≤j}(c_k − k) (one ``np.minimum.accumulate`` per row — no
    inner loop despite the left-cell dependency). The oracle maps
    each distinct token of the pair to one printable ASCII char
    (asserted ≤ 94 — loud, not silent, on vocabulary growth) and
    asks DuckDB's byte-level ``levenshtein`` on the encoded
    strings, which on a 1-byte alphabet IS token-level NW.

    Scale shape: the pair pick is an exact per-block top-k; the
    O(len²) DP runs driver-side on the two-document payload."""
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.split()
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "n": toks.str.len().fillna(0).astype(np.int64),
            "text": df["text"].fillna("")})

    def block_top(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["n", "doc_id"],
                              ascending=[False, True],
                              kind="mergesort").head(2)

    top = ds.map_batches(stats, batch_format="pandas",
                         batch_size=8192) \
        .map_batches(block_top, batch_format="pandas").to_pandas()
    top = top.sort_values(["n", "doc_id"],
                          ascending=[False, True],
                          kind="mergesort").head(2) \
        .reset_index(drop=True)
    da, db_ = int(top["doc_id"].iloc[0]), int(top["doc_id"].iloc[1])
    if da > db_:            # canonical (doc_a < doc_b) output order
        top = top.iloc[[1, 0]].reset_index(drop=True)
        da, db_ = db_, da
    a = [t.lower() for t in top["text"].iloc[0].split()]
    b = [t.lower() for t in top["text"].iloc[1].split()]
    assert len(set(a) | set(b)) <= 94, \
        "pair vocabulary exceeds the oracle's 1-byte alphabet"
    bv = np.array(b, dtype=object)
    prev = np.arange(len(b) + 1, dtype=np.int64)
    for i, ta in enumerate(a, 1):
        sub = (bv != ta).astype(np.int64)
        c = np.minimum(prev[:-1] + sub, prev[1:] + 1)
        cand = np.r_[np.int64(i), c] \
            - np.arange(len(b) + 1, dtype=np.int64)
        prev = np.arange(len(b) + 1, dtype=np.int64) \
            + np.minimum.accumulate(cand)
    d = int(prev[-1])
    la, lb = len(a), len(b)
    return pd.DataFrame({
        "doc_a": np.array([da], dtype=np.int64),
        "doc_b": np.array([db_], dtype=np.int64),
        "len_a": np.array([la], dtype=np.int64),
        "len_b": np.array([lb], dtype=np.int64),
        "edist": np.array([d], dtype=np.int64),
        "sim": [round(1.0 - d / max(la, lb), 6)]})

def _token_align_oracle_sql() -> str:
    return f"""
    WITH it AS MATERIALIZED (
        SELECT doc_id, lower(coalesce(text, '')) AS t,
               {_N_TOKENS_SQL} AS n,
               row_number() OVER (
                   ORDER BY {_N_TOKENS_SQL} DESC, doc_id ASC) AS rk
        FROM documents QUALIFY rk <= 2),
    pair AS (SELECT min(doc_id) AS da, max(doc_id) AS db FROM it),
    tok AS MATERIALIZED (
        SELECT it.doc_id, p.i AS pos,
               list_filter(regexp_split_to_array(it.t, '\\s+'),
                           x -> x <> '')[p.i] AS w
        FROM it, LATERAL (SELECT unnest(range(1,
            array_length(list_filter(regexp_split_to_array(it.t,
                '\\s+'), x -> x <> '')) + 1)) AS i) p),
    dict AS MATERIALIZED (
        SELECT w, chr(32 + CAST(row_number() OVER (ORDER BY w)
                                AS INT)) AS ch
        FROM (SELECT DISTINCT w FROM tok)),
    enc AS MATERIALIZED (
        SELECT tok.doc_id,
               string_agg(dict.ch, '' ORDER BY tok.pos) AS s,
               count(*) AS n
        FROM tok JOIN dict ON dict.w = tok.w
        GROUP BY tok.doc_id),
    d AS (SELECT levenshtein(
              (SELECT s FROM enc, pair WHERE doc_id = pair.da),
              (SELECT s FROM enc, pair WHERE doc_id = pair.db))
              AS dist)
    SELECT pair.da AS doc_a, pair.db AS doc_b,
           CAST((SELECT n FROM enc WHERE doc_id = pair.da)
                AS BIGINT) AS len_a,
           CAST((SELECT n FROM enc WHERE doc_id = pair.db)
                AS BIGINT) AS len_b,
           CAST(d.dist AS BIGINT) AS edist,
           round(1.0 - d.dist / greatest(
               (SELECT n FROM enc WHERE doc_id = pair.da),
               (SELECT n FROM enc WHERE doc_id = pair.db)) * 1.0, 6)
               AS sim
    FROM pair CROSS JOIN d"""  # noqa: E501

def q_part_luby_mis(sf_dir: str, *, oracle_rounds: int = 8,
                    min_cocount: int = 2):
    """Maximal independent set by derandomized Luby rounds (Luby
    '86 — THE parallel-round symmetry-breaking algorithm; md5 node
    priorities replace its coin flips, the engine's seeded-sampling
    convention) over the repeat co-purchase graph: each round every
    still-alive node with a strictly smaller md5 priority than ALL
    alive neighbors joins the MIS, then it and its neighbors leave
    the graph. Pure order tests on distinct-w.h.p. hashes with the
    (priority, node) strict tie key — deterministic,
    shard-independent, and replayed round-by-round by the generated
    CTE oracle. Independence and maximality are pytest-verified.

    Scale shape: per round ONE streaming pass over the never-moving
    edge Dataset with the alive-set broadcast computes per-node min
    neighbor priority partials (combiner); winners and removals are
    node-bounded driver work. Rounds are O(log n) w.h.p.; asserts
    convergence within the oracle's unrolled depth."""
    import ray

    from jerex_ray.util import md5_hash64
    configure_data_context()
    edges = _repeat_copurchase_edges(
        sf_dir, min_cocount=min_cocount).materialize()
    nd = edges.map_batches(
        lambda df: pd.DataFrame({"u": np.unique(np.r_[
            df["a"].to_numpy(np.int64), df["b"].to_numpy(np.int64)])})
        if "a" in df.columns and len(df) else
        pd.DataFrame({"u": pd.Series(dtype="int64")}),
        batch_format="pandas").to_pandas()
    nodes = sorted(int(u) for u in np.unique(nd["u"].to_numpy())) \
        if "u" in nd.columns and len(nd) else []
    prio = {u: (md5_hash64(f"mis|{u}"), u) for u in nodes}
    alive = set(nodes)
    mis: set[int] = set()
    rounds = 0
    while alive:
        rounds += 1
        assert rounds <= oracle_rounds, \
            f"Luby still running at round {rounds} > {oracle_rounds}"
        aref = ray.put(alive)

        def min_nbr(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty or "a" not in df.columns:
                return pd.DataFrame({
                    "u": pd.Series(dtype="int64"),
                    "h": pd.Series(dtype="uint64"),
                    "n": pd.Series(dtype="int64")})
            al = ray.get(aref)
            a = df["a"].to_numpy(np.int64)
            b = df["b"].to_numpy(np.int64)
            keep = np.array([x in al and y in al
                             for x, y in zip(a, b)], dtype=bool)
            a, b = a[keep], b[keep]
            both = pd.DataFrame({
                "u": np.r_[a, b],
                "h": np.array([prio[int(v)][0] for v in
                               np.r_[b, a]], dtype=np.uint64),
                "n": np.r_[b, a]})
            both = both.sort_values(["u", "h", "n"],
                                    kind="mergesort")
            return both.drop_duplicates("u")

        partials = edges.map_batches(
            min_nbr, batch_format="pandas").to_pandas()
        best: dict[int, tuple] = {}
        if "u" in partials.columns:
            for r in partials.itertuples():
                k = (np.uint64(r.h), int(r.n))
                u = int(r.u)
                if u not in best or k < best[u]:
                    best[u] = k
        winners = {u for u in alive
                   if u not in best
                   or (prio[u][0], u) < (int(best[u][0]),
                                         int(best[u][1]))}
        mis |= winners
        # second streaming pass: ALL alive neighbors of winners
        # leave (not just nodes whose MIN-priority neighbor won)
        wref = ray.put(winners)

        def nbr_of_winner(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty or "a" not in df.columns:
                return pd.DataFrame({"u": pd.Series(dtype="int64")})
            w = ray.get(wref)
            al = ray.get(aref)
            a = df["a"].to_numpy(np.int64)
            b = df["b"].to_numpy(np.int64)
            out = [int(x) for x, y in zip(a, b)
                   if int(x) in al and int(y) in w]
            out += [int(y) for x, y in zip(a, b)
                    if int(y) in al and int(x) in w]
            return pd.DataFrame({"u": np.unique(
                np.array(out, dtype=np.int64))})

        rem = edges.map_batches(nbr_of_winner,
                                batch_format="pandas").to_pandas()
        removed = set(winners)
        if "u" in rem.columns:
            removed |= {int(u) for u in rem["u"]}
        alive -= removed
    return pd.DataFrame({"node": sorted(mis)}).astype("int64")

def _luby_mis_oracle_sql(rounds: int = 8,
                         min_cocount: int = 2) -> str:
    """Per-round Luby replay: alive edges under the current set,
    per-node strict-key min neighbor priority, winners, and the
    winner+neighbor removal."""
    h = ("CAST('0x' || substr(md5('mis|' || CAST({x} AS VARCHAR)), "
         "1, 16) AS UBIGINT)")
    sql = f"""
        WITH inc AS MATERIALIZED (
            SELECT DISTINCT l_orderkey AS o, l_partkey AS p
            FROM lineitem),
        e0 AS MATERIALIZED (
            SELECT a.p AS a, b.p AS b
            FROM inc a JOIN inc b ON a.o = b.o AND a.p < b.p
            GROUP BY a.p, b.p HAVING count(*) >= {min_cocount}),
        sym AS MATERIALIZED (
            SELECT a AS u, b AS v FROM e0
            UNION ALL SELECT b, a FROM e0),
        alive1 AS (SELECT DISTINCT u FROM sym)"""
    for r in range(1, rounds + 1):
        sql += f""",
        mn{r} AS MATERIALIZED (
            SELECT s.u, min(struct_pack(
                       h := {h.format(x='s.v')}, n := s.v)) AS k
            FROM sym s
            JOIN alive{r} x ON x.u = s.u
            JOIN alive{r} y ON y.u = s.v
            GROUP BY s.u),
        win{r} AS MATERIALIZED (
            SELECT a.u FROM alive{r} a LEFT JOIN mn{r} m
                 ON m.u = a.u
            WHERE m.u IS NULL
               OR struct_pack(h := {h.format(x='a.u')}, n := a.u)
                  < m.k),
        alive{r + 1} AS MATERIALIZED (
            SELECT a.u FROM alive{r} a
            WHERE a.u NOT IN (SELECT u FROM win{r})
              AND a.u NOT IN (
                  SELECT s.u FROM sym s
                  JOIN win{r} w ON w.u = s.v
                  JOIN alive{r} x ON x.u = s.u))"""
    parts = [f"SELECT u FROM win{r}" for r in range(1, rounds + 1)]
    return sql + "\nSELECT CAST(u AS BIGINT) AS node FROM (" \
        + "\nUNION ALL ".join(parts) + ") ORDER BY node"

def q_part_rich_club(sf_dir: str, *, min_cocount: int = 2):
    """Rich-club coefficient curve (Zhou & Mondragón '04 — do the
    hubs preferentially connect to each other?) of the repeat
    co-purchase graph: for every degree threshold k in the degree
    vocabulary, φ(k) = 2·E_k / (N_k·(N_k−1)) over the subgraph of
    nodes with degree > k. Both censuses are EXACT integers via the
    suffix trick — an edge belongs to every level below
    min(deg_a, deg_b), a node to every level below its degree, so
    one histogram + reverse cumulative per side replaces any
    per-level subgraph pass; the single divide is the identical
    double on both engines. Degrees come from one combiner pass and
    broadcast as the node-bounded map; edge min-degrees from one
    streaming pass."""
    import ray

    from jerex_ray.functions.aggregate import grouped_aggregate
    configure_data_context()
    edges = _repeat_copurchase_edges(
        sf_dir, min_cocount=min_cocount).materialize()
    deg_df = grouped_aggregate(
        edges.map_batches(
            lambda df: pd.DataFrame({"u": np.r_[
                df["a"].to_numpy(np.int64),
                df["b"].to_numpy(np.int64)]})
            if "a" in df.columns and len(df) else
            pd.DataFrame({"u": pd.Series(dtype="int64")}),
            batch_format="pandas"),
        ["u"], {"d": (None, "count")}).to_pandas()
    dmap = dict(zip(deg_df["u"].astype("int64"),
                    deg_df["d"].astype("int64")))
    dref = ray.put(dmap)

    def edge_mindeg(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "a" not in df.columns:
            return pd.DataFrame({"md": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64")})
        dm = ray.get(dref)
        md = np.minimum(df["a"].map(dm).to_numpy(np.int64),
                        df["b"].map(dm).to_numpy(np.int64))
        u, c = np.unique(md, return_counts=True)
        return pd.DataFrame({"md": u, "n": c.astype(np.int64)})

    eh = grouped_aggregate(
        edges.map_batches(edge_mindeg, batch_format="pandas"),
        ["md"], {"n": ("n", "sum")},
        result_hint="small").to_pandas()
    degs = np.sort(deg_df["d"].to_numpy(np.int64))
    ks = np.unique(degs)[:-1]            # top level has N_k <= 1
    rows = []
    e_md = dict(zip(eh["md"].astype(int), eh["n"].astype(int)))
    for k in ks:
        Nk = int((degs > k).sum())
        if Nk < 2:
            continue
        Ek = sum(n for md, n in e_md.items() if md > k)
        rows.append((int(k), Nk, Ek,
                     _round_half_away(2.0 * Ek / (Nk * (Nk - 1)),
                                      6)))
    return pd.DataFrame(rows, columns=["k", "n_nodes", "n_edges",
                                       "phi"]).astype(
        {"k": "int64", "n_nodes": "int64", "n_edges": "int64"})

def _rich_club_oracle_sql(min_cocount: int = 2) -> str:
    return f"""
        WITH inc AS MATERIALIZED (
            SELECT DISTINCT l_orderkey AS o, l_partkey AS p
            FROM lineitem),
        e0 AS MATERIALIZED (
            SELECT a.p AS a, b.p AS b
            FROM inc a JOIN inc b ON a.o = b.o AND a.p < b.p
            GROUP BY a.p, b.p HAVING count(*) >= {min_cocount}),
        deg AS MATERIALIZED (
            SELECT u, count(*) AS d FROM (
                SELECT a AS u FROM e0
                UNION ALL SELECT b FROM e0)
            GROUP BY u),
        ks AS (SELECT DISTINCT d AS k FROM deg
               WHERE d < (SELECT max(d) FROM deg)),
        lv AS MATERIALIZED (
            SELECT ks.k,
                   (SELECT count(*) FROM deg
                    WHERE deg.d > ks.k) AS n_nodes,
                   (SELECT count(*) FROM e0
                    JOIN deg da ON da.u = e0.a
                    JOIN deg db ON db.u = e0.b
                    WHERE least(da.d, db.d) > ks.k) AS n_edges
            FROM ks)
        SELECT CAST(k AS BIGINT) AS k,
               CAST(n_nodes AS BIGINT) AS n_nodes,
               CAST(n_edges AS BIGINT) AS n_edges,
               round(2.0 * n_edges / (n_nodes * (n_nodes - 1)), 6)
                   AS phi
        FROM lv WHERE n_nodes >= 2 ORDER BY k"""

def q_part_eigenvector(sf_dir: str, *, iters: int = 4,
                       scale: int = 1_000_000, min_cocount: int = 2):
    """Eigenvector centrality (Bonacich '72) by EXACT-INTEGER power
    iteration (the von Mises power method) over the repeat
    co-purchase graph — the spectral member of the centrality family
    beside degree / Katz / PageRank / HITS / harmonic / betweenness.
    Derandomized exactness: x₀ = ``scale`` for every node; each round
    y = A·x is an integer SpMV (int64 sums — order-free, zero float
    hazard), then the max-rescale x ← (y·scale) // max(y) is exact
    integer division (all values positive, so truncation = floor on
    both engines), making every round bit-replayable: the generated
    per-round CTE oracle matches bit-for-bit, and each round's argmax
    node sits at exactly ``scale``.

    Scale shape: per round ONE streaming pass over the never-moving
    edge Dataset with the node-bounded score vector broadcast via
    ``ray.put`` emits per-node partial sums (combiner); the max and
    rescale are node-bounded driver work. Overflow guard: y·scale
    must stay under 2⁶³ (asserted each round)."""
    import ray
    configure_data_context()
    edges = _repeat_copurchase_edges(
        sf_dir, min_cocount=min_cocount).materialize()
    nd = edges.map_batches(
        lambda df: pd.DataFrame({"u": np.unique(np.r_[
            df["a"].to_numpy(np.int64), df["b"].to_numpy(np.int64)])})
        if "a" in df.columns and len(df) else
        pd.DataFrame({"u": pd.Series(dtype="int64")}),
        batch_format="pandas").to_pandas()
    nodes = sorted(int(u) for u in np.unique(nd["u"].to_numpy())) \
        if "u" in nd.columns and len(nd) else []
    if not nodes:
        return pd.DataFrame({"node": pd.Series(dtype="int64"),
                             "score": pd.Series(dtype="int64")})
    x = {u: scale for u in nodes}
    for _ in range(iters):
        xref = ray.put(x)

        def spmv(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty or "a" not in df.columns:
                return pd.DataFrame({"u": pd.Series(dtype="int64"),
                                     "s": pd.Series(dtype="int64")})
            xv = ray.get(xref)
            a = df["a"].to_numpy(np.int64)
            b = df["b"].to_numpy(np.int64)
            part = pd.DataFrame({
                "u": np.r_[a, b],
                "s": np.array([xv[int(v)] for v in np.r_[b, a]],
                              dtype=np.int64)})
            g = part.groupby("u", sort=False)["s"].sum()
            return pd.DataFrame({"u": g.index.to_numpy(np.int64),
                                 "s": g.to_numpy(np.int64)})

        partials = edges.map_batches(
            spmv, batch_format="pandas").to_pandas()
        y = {u: 0 for u in nodes}
        if "u" in partials.columns:
            for r in partials.itertuples():
                y[int(r.u)] += int(r.s)
        m = max(y.values())
        assert 0 < m and m * scale < 2 ** 63, \
            "eigenvector: rescale overflow"
        x = {u: (y[u] * scale) // m for u in nodes}
    return pd.DataFrame({"node": np.array(nodes, dtype=np.int64),
                         "score": np.array([x[u] for u in nodes],
                                           dtype=np.int64)})

def _eigenvector_oracle_sql(iters: int = 4, scale: int = 1_000_000,
                            min_cocount: int = 2) -> str:
    """Per-round replay of ``q_part_eigenvector``: integer SpMV over
    the symmetric edge CTE, then the exact integer max-rescale."""
    sql = f"""
        WITH inc AS MATERIALIZED (
            SELECT DISTINCT l_orderkey AS o, l_partkey AS p
            FROM lineitem),
        e0 AS MATERIALIZED (
            SELECT a.p AS a, b.p AS b
            FROM inc a JOIN inc b ON a.o = b.o AND a.p < b.p
            GROUP BY a.p, b.p HAVING count(*) >= {min_cocount}),
        sym AS MATERIALIZED (
            SELECT a AS u, b AS v FROM e0
            UNION ALL SELECT b, a FROM e0),
        x0 AS (SELECT u, CAST({scale} AS BIGINT) AS x
               FROM (SELECT DISTINCT u FROM sym))"""
    for k in range(1, iters + 1):
        sql += f""",
        y{k} AS MATERIALIZED (
            SELECT s.u, CAST(sum(p.x) AS BIGINT) AS y
            FROM sym s JOIN x{k - 1} p ON p.u = s.v
            GROUP BY s.u),
        x{k} AS MATERIALIZED (
            SELECT u, CAST((y * {scale}) //
                (SELECT max(y) FROM y{k}) AS BIGINT) AS x
            FROM y{k})"""
    return sql + f"""
        SELECT CAST(u AS BIGINT) AS node, x AS score
        FROM x{iters} ORDER BY node"""

_PRICE_INDEX_ORACLE_SQL = """
    WITH li AS (
        SELECT l_partkey AS part, l_orderkey, l_linenumber,
               l_quantity, l_extendedprice,
               CASE WHEN l_shipdate >= TIMESTAMP '1998-01-01'
                    THEN 1 ELSE 0 END AS period
        FROM lineitem),
    quote AS (
        SELECT part, period,
               CAST(round(CAST(l_extendedprice AS DOUBLE)
                          / l_quantity * 100.0, 0) AS BIGINT)
                   AS price_c
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY part, period
                  ORDER BY l_orderkey, l_linenumber) AS rn
              FROM li) t
        WHERE rn = 1),
    qty AS (
        SELECT part, period,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
                   AS qty
        FROM li GROUP BY part, period),
    pp AS (
        SELECT q.part, q.period, q.price_c, y.qty
        FROM quote q JOIN qty y USING (part, period)),
    m AS (
        SELECT a.part, a.price_c AS p0, a.qty AS q0,
               b.price_c AS p1, b.qty AS q1
        FROM pp a JOIN pp b ON a.part = b.part
        WHERE a.period = 0 AND b.period = 1),
    agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n_items,
               CAST(sum(p1 * q0) AS BIGINT) AS l_num,
               CAST(sum(p0 * q0) AS BIGINT) AS l_den,
               CAST(sum(p1 * q1) AS BIGINT) AS p_num,
               CAST(sum(p0 * q1) AS BIGINT) AS p_den
        FROM m)
    SELECT n_items, l_num, l_den, p_num, p_den,
           round(CAST(l_num AS DOUBLE) / l_den, 6) AS laspeyres,
           round(CAST(p_num AS DOUBLE) / p_den, 6) AS paasche,
           round(sqrt((CAST(l_num AS DOUBLE) / l_den)
                      * (CAST(p_num AS DOUBLE) / p_den)), 6)
               AS fisher
    FROM agg"""

def _matching_oracle_sql(rounds: int = 16) -> str:
    """Chained-CTE replay of ``q_supplier_matching``'s parallel
    greedy rounds: per round, windowed per-endpoint priority minima
    pick the local-minimum edges, and a NOT IN filter removes every
    edge touching a matched node. ``rounds`` only has to exceed the
    actual convergence round count (O(log E) expected; pytest pins
    maximality, so an unconverged oracle would mismatch the gate)."""
    sql = """
        WITH a0 AS MATERIALIZED (
            SELECT s, p, CAST('0x' || substr(md5(
                       CAST(s AS VARCHAR) || '|'
                       || CAST(p AS VARCHAR)), 1, 16) AS UBIGINT)
                   AS pr
            FROM (SELECT DISTINCT l_suppkey AS s, l_partkey AS p
                  FROM lineitem))"""
    parts = []
    prev = "a0"
    for r in range(1, rounds + 1):
        sql += f""",
        w{r} AS MATERIALIZED (
            SELECT s, p, pr,
                   min(pr) OVER (PARTITION BY s) AS ms,
                   min(pr) OVER (PARTITION BY p) AS mp
            FROM {prev}),
        m{r} AS MATERIALIZED (
            SELECT s, p FROM w{r} WHERE pr = ms AND pr = mp),
        a{r} AS MATERIALIZED (
            SELECT s, p, pr FROM w{r}
            WHERE s NOT IN (SELECT s FROM m{r})
              AND p NOT IN (SELECT p FROM m{r}))"""
        parts.append(f"SELECT s, p FROM m{r}")
        prev = f"a{r}"
    sql += f"""
        SELECT CAST(s AS BIGINT) AS l_suppkey,
               CAST(p AS BIGINT) AS l_partkey
        FROM ({" UNION ALL ".join(parts)})
        ORDER BY l_suppkey, l_partkey"""
    return sql

def _ktruss_oracle_sql(k: int = 3, min_cocount: int = 2,
                       rounds: int = 6) -> str:
    """Chained-CTE replay of ``q_part_ktruss``: thresholded
    co-purchase edges, then per round a wedge self-join counts each
    surviving edge's common neighbors and the support filter drops
    weak edges. ``rounds`` only has to exceed the convergence round
    (the Ray side terminates naturally and RAISES past its cap)."""
    thr = k - 2
    sql = f"""
        WITH inc AS MATERIALIZED (
            SELECT DISTINCT l_orderkey AS o, l_partkey AS p
            FROM lineitem),
        e0 AS MATERIALIZED (
            SELECT a.p AS a, b.p AS b
            FROM inc a JOIN inc b ON a.o = b.o AND a.p < b.p
            GROUP BY a.p, b.p HAVING count(*) >= {min_cocount})"""
    prev = "e0"
    last_sup = None
    for r in range(1, rounds + 1):
        sql += f""",
        sym{r} AS (SELECT a AS u, b AS v FROM {prev}
                   UNION ALL SELECT b, a FROM {prev}),
        sup{r} AS MATERIALIZED (
            SELECT w.a, w.b, count(*) AS c FROM (
                SELECT s1.v AS a, s2.v AS b
                FROM sym{r} s1 JOIN sym{r} s2
                  ON s1.u = s2.u AND s1.v < s2.v) w
            JOIN {prev} ee ON ee.a = w.a AND ee.b = w.b
            GROUP BY w.a, w.b),
        e{r} AS MATERIALIZED (
            SELECT a, b FROM sup{r} WHERE c >= {thr})"""
        prev = f"e{r}"
        last_sup = f"sup{r}"
    sql += f"""
        SELECT a, b, CAST(c AS BIGINT) AS support
        FROM {last_sup} WHERE c >= {thr} ORDER BY a, b"""
    return sql

def _sssp_oracle_sql(rounds: int = 24, min_cocount: int = 2) -> str:
    """Chained-CTE replay of ``q_part_sssp``: the thresholded
    co-purchase edge CTE, md5-derived integer weights, undirected
    explode, then one synchronized Bellman-Ford relax round per CTE
    (min over the previous table ∪ one-hop extensions). The lattice
    is monotone, so any depth ≥ the engine's asserted convergence
    round lands on the identical integer fixpoint."""
    sql = f"""
        WITH inc AS MATERIALIZED (
            SELECT DISTINCT l_orderkey AS o, l_partkey AS p
            FROM lineitem),
        e0 AS MATERIALIZED (
            SELECT a.p AS a, b.p AS b
            FROM inc a JOIN inc b ON a.o = b.o AND a.p < b.p
            GROUP BY a.p, b.p HAVING count(*) >= {min_cocount}),
        we AS MATERIALIZED (
            SELECT a, b, CAST(1 + CAST('0x' || substr(md5(
                       CAST(a AS VARCHAR) || '|' || CAST(b AS VARCHAR)),
                       1, 16) AS UBIGINT) % 9 AS BIGINT) AS w
            FROM e0),
        dir AS MATERIALIZED (
            SELECT a AS u, b AS v, w FROM we
            UNION ALL SELECT b, a, w FROM we),
        d0 AS (SELECT (SELECT min(u) FROM dir) AS node,
                      CAST(0 AS BIGINT) AS dist)"""
    prev = "d0"
    for k in range(1, rounds + 1):
        sql += f""",
        d{k} AS MATERIALIZED (
            SELECT node, min(dist) AS dist FROM (
                SELECT node, dist FROM {prev}
                UNION ALL
                SELECT dir.v AS node, {prev}.dist + dir.w AS dist
                FROM dir JOIN {prev} ON {prev}.node = dir.u) t
            GROUP BY node)"""
        prev = f"d{k}"
    sql += f"""
        SELECT node, dist FROM {prev} ORDER BY node"""
    return sql

def _betweenness_oracle_sql(n_sources: int = 4, max_depth: int = 6,
                            min_cocount: int = 2) -> str:
    """Unrolled Brandes replay for ``q_part_betweenness``: recursive
    BFS levels, one σ CTE per forward level (integer path counts),
    one δ CTE per backward level (correlated successor-dependency
    sums with the identical ratio expression), summed over sources."""
    L = max_depth
    sql = f"""
        WITH RECURSIVE inc AS MATERIALIZED (
            SELECT DISTINCT l_orderkey AS o, l_partkey AS p
            FROM lineitem),
        e0 AS MATERIALIZED (
            SELECT a.p AS a, b.p AS b
            FROM inc a JOIN inc b ON a.o = b.o AND a.p < b.p
            GROUP BY a.p, b.p HAVING count(*) >= {min_cocount}),
        sym AS MATERIALIZED (
            SELECT a AS u, b AS v FROM e0
            UNION ALL SELECT b, a FROM e0),
        nodes AS (SELECT DISTINCT u FROM sym),
        srcs AS (SELECT u FROM nodes ORDER BY u LIMIT {n_sources}),
        bfs AS (
            SELECT u AS src, u AS node, 0 AS lvl FROM srcs
            UNION
            SELECT bfs.src, sym.v, bfs.lvl + 1
            FROM bfs JOIN sym ON sym.u = bfs.node
            WHERE bfs.lvl < {L}),
        lv AS MATERIALIZED (
            SELECT src, node, min(lvl) AS lvl FROM bfs
            GROUP BY src, node),
        sig0 AS (SELECT u AS src, u AS node,
                        CAST(1 AS BIGINT) AS sigma FROM srcs)"""
    for l in range(1, L + 1):
        sql += f""",
        sig{l} AS MATERIALIZED (
            SELECT v.src, v.node, CAST(sum(p.sigma) AS BIGINT)
                       AS sigma
            FROM lv v JOIN sym e ON e.v = v.node
                 JOIN sig{l - 1} p ON p.src = v.src
                                  AND p.node = e.u
            WHERE v.lvl = {l}
            GROUP BY v.src, v.node)"""
    sql += f""",
        del{L} AS (SELECT src, node, 0.0 AS delta FROM sig{L})"""
    for l in range(L - 1, 0, -1):
        sql += f""",
        del{l} AS MATERIALIZED (
            SELECT su.src, su.node,
                   coalesce((SELECT sum(su.sigma / sw.sigma
                                        * (1.0 + dw.delta))
                             FROM sym e
                             JOIN sig{l + 1} sw ON sw.src = su.src
                                               AND sw.node = e.v
                             JOIN del{l + 1} dw ON dw.src = su.src
                                               AND dw.node = e.v
                             WHERE e.u = su.node), 0.0) AS delta
            FROM sig{l} su)"""
    union = " UNION ALL ".join(
        f"SELECT node, delta FROM del{l}" for l in range(1, L + 1))
    sql += f""",
        bc AS (SELECT node, sum(delta) AS s
               FROM ({union}) GROUP BY node)
        SELECT nodes.u AS node, round(coalesce(bc.s, 0.0), 6) AS bc
        FROM nodes LEFT JOIN bc ON bc.node = nodes.u
        ORDER BY node"""
    return sql

QUERIES = {
    'q_lineitem_price_index': q_lineitem_price_index,
    'q_lineitem_hilbert': q_lineitem_hilbert,
    'q_customer_linkage_fs': q_customer_linkage_fs,
    'q_join_order_dp': q_join_order_dp,
    'q_lineitem_gains': q_lineitem_gains,
    'q_part_katz': q_part_katz,
    'q_part_walks': q_part_walks,
    'q_doc_langid_kappa': q_doc_langid_kappa,
    'q_part_mst': q_part_mst,
    'q_part_item_cosine': q_part_item_cosine,
    'q_stable_matching': q_stable_matching,
    'q_doc_token_align': q_doc_token_align,
    'q_part_luby_mis': q_part_luby_mis,
    'q_part_rich_club': q_part_rich_club,
    'q_part_eigenvector': q_part_eigenvector,
    'q_part_diameter': q_part_diameter,
    'q_fd_audit': q_fd_audit,
    'q_supplier_matching': q_supplier_matching,
    'q_part_ktruss': q_part_ktruss,
    'q_part_sssp': q_part_sssp,
    'q_orders_bloom_semijoin': q_orders_bloom_semijoin,
    'q_lineitem_auc': q_lineitem_auc,
    'q_orders_benford': q_orders_benford,
    'q_customer_chash': q_customer_chash,
    'q_part_betweenness': q_part_betweenness,
    'q_encoding_audit': q_encoding_audit,
    'q_join_cardinality': q_join_cardinality,
}

ORACLES = {
    'q_encoding_audit': """
            WITH s1 AS (
                SELECT 'lineitem' AS tbl, 'l_returnflag' AS col,
                       CAST(count(*) AS BIGINT) AS n,
                       CAST(count(DISTINCT l_returnflag) AS BIGINT)
                           AS n_distinct,
                       CAST((SELECT count(*) FROM (
                            SELECT CASE WHEN lag(l_returnflag) OVER w
                                        IS NULL
                                     OR lag(l_returnflag) OVER w
                                        <> l_returnflag
                                     OR lag(l_orderkey) OVER w2
                                        IS DISTINCT FROM l_orderkey
                                        THEN 1 ELSE 0 END AS st
                            FROM lineitem
                            WINDOW w AS (PARTITION BY l_orderkey
                                         ORDER BY l_linenumber,
                                                  l_returnflag),
                                   w2 AS (PARTITION BY l_orderkey
                                          ORDER BY l_linenumber,
                                                   l_returnflag)
                            ) WHERE st = 1) AS BIGINT) AS n_runs,
                       CAST(sum(length(l_returnflag)) AS BIGINT)
                           AS plain_bytes,
                       CAST((SELECT sum(length(v)) FROM (
                                SELECT DISTINCT l_returnflag AS v
                                FROM lineitem))
                            + (count(*) * (CASE
                                WHEN count(DISTINCT l_returnflag) = 1
                                THEN 0
                                ELSE length(format('{:b}',
                                    count(DISTINCT l_returnflag) - 1))
                                END) + 7) // 8 AS BIGINT)
                           AS dict_bytes
                FROM lineitem),
            s2 AS (
                SELECT 'lineitem', 'l_linestatus',
                       CAST(count(*) AS BIGINT),
                       CAST(count(DISTINCT l_linestatus) AS BIGINT),
                       CAST((SELECT count(*) FROM (
                            SELECT CASE WHEN lag(l_linestatus) OVER w
                                        IS NULL
                                     OR lag(l_linestatus) OVER w
                                        <> l_linestatus
                                        THEN 1 ELSE 0 END AS st
                            FROM lineitem
                            WINDOW w AS (PARTITION BY l_orderkey
                                         ORDER BY l_linenumber,
                                                  l_linestatus)
                            ) WHERE st = 1) AS BIGINT),
                       CAST(sum(length(l_linestatus)) AS BIGINT),
                       CAST((SELECT sum(length(v)) FROM (
                                SELECT DISTINCT l_linestatus AS v
                                FROM lineitem))
                            + (count(*) * (CASE
                                WHEN count(DISTINCT l_linestatus) = 1
                                THEN 0
                                ELSE length(format('{:b}',
                                    count(DISTINCT l_linestatus) - 1))
                                END) + 7) // 8 AS BIGINT)
                FROM lineitem),
            s3 AS (
                SELECT 'orders', 'o_orderpriority',
                       CAST(count(*) AS BIGINT),
                       CAST(count(DISTINCT o_orderpriority)
                            AS BIGINT),
                       CAST((SELECT count(*) FROM (
                            SELECT CASE WHEN lag(o_orderpriority)
                                        OVER w IS NULL
                                     OR lag(o_orderpriority) OVER w
                                        <> o_orderpriority
                                        THEN 1 ELSE 0 END AS st
                            FROM orders
                            WINDOW w AS (PARTITION BY o_custkey
                                         ORDER BY o_orderkey,
                                                  o_orderpriority)
                            ) WHERE st = 1) AS BIGINT),
                       CAST(sum(length(o_orderpriority)) AS BIGINT),
                       CAST((SELECT sum(length(v)) FROM (
                                SELECT DISTINCT o_orderpriority AS v
                                FROM orders))
                            + (count(*) * (CASE
                                WHEN count(DISTINCT o_orderpriority)
                                     = 1 THEN 0
                                ELSE length(format('{:b}',
                                    count(DISTINCT o_orderpriority)
                                    - 1)) END) + 7) // 8 AS BIGINT)
                FROM orders),
            s4 AS (
                SELECT 'customer', 'c_mktsegment',
                       CAST(count(*) AS BIGINT),
                       CAST(count(DISTINCT c_mktsegment) AS BIGINT),
                       CAST((SELECT count(*) FROM (
                            SELECT CASE WHEN lag(c_mktsegment) OVER w
                                        IS NULL
                                     OR lag(c_mktsegment) OVER w
                                        <> c_mktsegment
                                        THEN 1 ELSE 0 END AS st
                            FROM customer
                            WINDOW w AS (PARTITION BY c_nationkey
                                         ORDER BY c_custkey,
                                                  c_mktsegment)
                            ) WHERE st = 1) AS BIGINT),
                       CAST(sum(length(c_mktsegment)) AS BIGINT),
                       CAST((SELECT sum(length(v)) FROM (
                                SELECT DISTINCT c_mktsegment AS v
                                FROM customer))
                            + (count(*) * (CASE
                                WHEN count(DISTINCT c_mktsegment) = 1
                                THEN 0
                                ELSE length(format('{:b}',
                                    count(DISTINCT c_mktsegment)
                                    - 1)) END) + 7) // 8 AS BIGINT)
                FROM customer)
            SELECT * FROM (
                SELECT * FROM s1 UNION ALL SELECT * FROM s2
                UNION ALL SELECT * FROM s3 UNION ALL SELECT * FROM s4
            ) ORDER BY tbl, col
        """,
    'q_join_cardinality': """
            WITH j1 AS (
                SELECT 'orders' AS tbl_a, 'lineitem' AS tbl_b,
                       (SELECT count(*) FROM orders) AS n_a,
                       (SELECT count(*) FROM lineitem) AS n_b,
                       (SELECT count(DISTINCT o_orderkey)
                        FROM orders) AS d_a,
                       (SELECT count(DISTINCT l_orderkey)
                        FROM lineitem) AS d_b,
                       (SELECT count(*) FROM orders
                        JOIN lineitem ON o_orderkey = l_orderkey)
                           AS actual),
            j2 AS (
                SELECT 'customer', 'orders',
                       (SELECT count(*) FROM customer),
                       (SELECT count(*) FROM orders),
                       (SELECT count(DISTINCT c_custkey)
                        FROM customer),
                       (SELECT count(DISTINCT o_custkey)
                        FROM orders),
                       (SELECT count(*) FROM customer
                        JOIN orders ON c_custkey = o_custkey)),
            j3 AS (
                SELECT 'part', 'lineitem',
                       (SELECT count(*) FROM part),
                       (SELECT count(*) FROM lineitem),
                       (SELECT count(DISTINCT p_partkey) FROM part),
                       (SELECT count(DISTINCT l_partkey)
                        FROM lineitem),
                       (SELECT count(*) FROM part
                        JOIN lineitem ON p_partkey = l_partkey))
            SELECT tbl_a, tbl_b,
                   CAST(n_a AS BIGINT) AS n_a,
                   CAST(n_b AS BIGINT) AS n_b,
                   round(CAST(n_a AS DOUBLE) * n_b
                         / greatest(d_a, d_b), 6) AS est,
                   CAST(actual AS BIGINT) AS actual,
                   round(greatest(
                       (CAST(n_a AS DOUBLE) * n_b
                        / greatest(d_a, d_b)) / actual,
                       actual / (CAST(n_a AS DOUBLE) * n_b
                                 / greatest(d_a, d_b))), 6)
                       AS q_error
            FROM (SELECT * FROM j1 UNION ALL SELECT * FROM j2
                  UNION ALL SELECT * FROM j3)
            ORDER BY tbl_a, tbl_b
        """,
    'q_customer_chash': """
            WITH r8 AS (
                SELECT 's' || CAST(s AS VARCHAR) AS server,
                       CAST('0x' || substr(md5(
                           's' || CAST(s AS VARCHAR) || '#'
                           || CAST(v AS VARCHAR)), 1, 16) AS UBIGINT)
                           AS pos
                FROM range(8) t(s), range(16) u(v)),
            r9 AS (
                SELECT 's' || CAST(s AS VARCHAR) AS server,
                       CAST('0x' || substr(md5(
                           's' || CAST(s AS VARCHAR) || '#'
                           || CAST(v AS VARCHAR)), 1, 16) AS UBIGINT)
                           AS pos
                FROM range(9) t(s), range(16) u(v)),
            k AS (SELECT c_custkey AS key,
                         CAST('0x' || substr(md5(
                             CAST(c_custkey AS VARCHAR)), 1, 16)
                             AS UBIGINT) AS pos
                  FROM customer),
            a8 AS (SELECT k.key, coalesce(
                       (SELECT r.server FROM r8 r
                        WHERE r.pos >= k.pos
                        ORDER BY r.pos, r.server LIMIT 1),
                       (SELECT r.server FROM r8 r
                        ORDER BY r.pos, r.server LIMIT 1)) AS s8
                   FROM k),
            a9 AS (SELECT k.key, coalesce(
                       (SELECT r.server FROM r9 r
                        WHERE r.pos >= k.pos
                        ORDER BY r.pos, r.server LIMIT 1),
                       (SELECT r.server FROM r9 r
                        ORDER BY r.pos, r.server LIMIT 1)) AS s9
                   FROM k),
            j AS (SELECT a8.key, a8.s8, a9.s9
                  FROM a8 JOIN a9 USING (key)),
            srv AS (SELECT 's' || CAST(s AS VARCHAR) AS server
                    FROM range(9) t(s))
            SELECT srv.server,
                   CAST(coalesce(b.n, 0) AS BIGINT) AS n_before,
                   CAST(coalesce(a.n, 0) AS BIGINT) AS n_after,
                   CAST(coalesce(m.n, 0) AS BIGINT) AS moved_out
            FROM srv
            LEFT JOIN (SELECT s8 AS server, count(*) AS n
                       FROM j GROUP BY s8) b USING (server)
            LEFT JOIN (SELECT s9, count(*) AS n FROM j GROUP BY s9) a
                   ON a.s9 = srv.server
            LEFT JOIN (SELECT s8, count(*) AS n FROM j
                       WHERE s8 <> s9 GROUP BY s8) m
                   ON m.s8 = srv.server
            ORDER BY server
        """,
    'q_part_diameter': """
            WITH RECURSIVE inc AS MATERIALIZED (
                SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                FROM lineitem),
            e AS MATERIALIZED (
                SELECT DISTINCT a.p AS pa, b.p AS pb
                FROM inc a JOIN inc b ON a.o = b.o AND a.p < b.p),
            sym AS MATERIALIZED (
                SELECT pa AS u, pb AS v FROM e
                UNION ALL SELECT pb, pa FROM e),
            seed AS (SELECT min(p) AS s FROM inc),
            b1 AS (
                SELECT (SELECT s FROM seed) AS node, 0 AS level
                UNION
                SELECT sym.v, b1.level + 1
                FROM b1 JOIN sym ON sym.u = b1.node
                WHERE b1.level < 16),
            l1 AS (SELECT node, min(level) AS lvl FROM b1
                   GROUP BY node),
            far AS (SELECT node, lvl FROM l1
                    ORDER BY lvl DESC, node LIMIT 1),
            b2 AS (
                SELECT (SELECT node FROM far) AS node, 0 AS level
                UNION
                SELECT sym.v, b2.level + 1
                FROM b2 JOIN sym ON sym.u = b2.node
                WHERE b2.level < 16),
            l2 AS (SELECT node, min(level) AS lvl FROM b2
                   GROUP BY node)
            SELECT CAST((SELECT s FROM seed) AS BIGINT) AS seed,
                   CAST((SELECT max(lvl) FROM l1) AS BIGINT)
                       AS ecc_seed,
                   CAST((SELECT node FROM far) AS BIGINT) AS far_node,
                   CAST((SELECT max(lvl) FROM l2) AS BIGINT)
                       AS diameter_lb,
                   CAST((SELECT count(*) FROM l2) AS BIGINT)
                       AS n_reached
        """,
    'q_fd_audit': """
            SELECT * FROM (
                SELECT 'customer' AS tbl, 'c_custkey' AS det,
                       'c_nationkey' AS dep,
                       CAST(count(*) AS BIGINT) AS n_keys,
                       CAST(count(*) FILTER (WHERE nd > 1) AS BIGINT)
                           AS n_violating,
                       CAST(CASE WHEN count(*) FILTER (WHERE nd > 1)
                                      = 0 THEN 1 ELSE 0 END AS BIGINT)
                           AS holds
                FROM (SELECT c_custkey,
                             count(DISTINCT c_nationkey) AS nd
                      FROM customer GROUP BY c_custkey)
                UNION ALL
                SELECT 'customer', 'c_nationkey', 'c_mktsegment',
                       CAST(count(*) AS BIGINT),
                       CAST(count(*) FILTER (WHERE nd > 1) AS BIGINT),
                       CAST(CASE WHEN count(*) FILTER (WHERE nd > 1)
                                      = 0 THEN 1 ELSE 0 END AS BIGINT)
                FROM (SELECT c_nationkey,
                             count(DISTINCT c_mktsegment) AS nd
                      FROM customer GROUP BY c_nationkey)
                UNION ALL
                SELECT 'orders', 'o_orderkey', 'o_custkey',
                       CAST(count(*) AS BIGINT),
                       CAST(count(*) FILTER (WHERE nd > 1) AS BIGINT),
                       CAST(CASE WHEN count(*) FILTER (WHERE nd > 1)
                                      = 0 THEN 1 ELSE 0 END AS BIGINT)
                FROM (SELECT o_orderkey,
                             count(DISTINCT o_custkey) AS nd
                      FROM orders GROUP BY o_orderkey)
                UNION ALL
                SELECT 'orders', 'o_custkey', 'o_orderpriority',
                       CAST(count(*) AS BIGINT),
                       CAST(count(*) FILTER (WHERE nd > 1) AS BIGINT),
                       CAST(CASE WHEN count(*) FILTER (WHERE nd > 1)
                                      = 0 THEN 1 ELSE 0 END AS BIGINT)
                FROM (SELECT o_custkey,
                             count(DISTINCT o_orderpriority) AS nd
                      FROM orders GROUP BY o_custkey)
                UNION ALL
                SELECT 'nation', 'n_nationkey', 'n_regionkey',
                       CAST(count(*) AS BIGINT),
                       CAST(count(*) FILTER (WHERE nd > 1) AS BIGINT),
                       CAST(CASE WHEN count(*) FILTER (WHERE nd > 1)
                                      = 0 THEN 1 ELSE 0 END AS BIGINT)
                FROM (SELECT n_nationkey,
                             count(DISTINCT n_regionkey) AS nd
                      FROM nation GROUP BY n_nationkey)
            ) ORDER BY tbl, det, dep
        """,
    'q_lineitem_gains': """
            WITH h AS (
                SELECT CAST(l_quantity AS BIGINT) AS quantity,
                       count(*) AS n,
                       SUM(CASE WHEN l_returnflag = 'R'
                                THEN 1 ELSE 0 END) AS pos
                FROM lineitem GROUP BY 1),
            c AS (
                SELECT quantity, n, pos,
                       SUM(n) OVER (ORDER BY quantity DESC) AS cum_n,
                       SUM(pos) OVER (ORDER BY quantity DESC)
                           AS cum_pos
                FROM h)
            SELECT quantity, CAST(n AS BIGINT) AS n,
                   CAST(pos AS BIGINT) AS pos,
                   CAST(cum_n AS BIGINT) AS cum_n,
                   CAST(cum_pos AS BIGINT) AS cum_pos,
                   round(CAST(cum_pos AS DOUBLE)
                         / (SELECT SUM(pos) FROM h), 6) AS gain_share
            FROM c ORDER BY quantity DESC
        """,
    'q_join_order_dp': """
            WITH st AS (SELECT
                (SELECT count(*) FROM nation) AS r1,
                (SELECT count(*) FROM customer) AS r2,
                (SELECT count(*) FROM orders) AS r3,
                (SELECT count(*) FROM lineitem) AS r4,
                greatest(
                    (SELECT count(DISTINCT n_nationkey) FROM nation),
                    (SELECT count(DISTINCT c_nationkey)
                     FROM customer)) AS e1,
                greatest(
                    (SELECT count(DISTINCT c_custkey) FROM customer),
                    (SELECT count(DISTINCT o_custkey)
                     FROM orders)) AS e2,
                greatest(
                    (SELECT count(DISTINCT o_orderkey) FROM orders),
                    (SELECT count(DISTINCT l_orderkey)
                     FROM lineitem)) AS e3),
            c AS (SELECT *,
                CAST(r1 AS HUGEINT) * r2 // e1 AS c12,
                CAST(r2 AS HUGEINT) * r3 // e2 AS c23,
                CAST(r3 AS HUGEINT) * r4 // e3 AS c34,
                CAST(r1 AS HUGEINT) * r2 * r3
                    // (CAST(e1 AS HUGEINT) * e2) AS c13,
                CAST(r2 AS HUGEINT) * r3 * r4
                    // (CAST(e2 AS HUGEINT) * e3) AS c24,
                CAST(r1 AS HUGEINT) * r2 * r3 * r4
                    // (CAST(e1 AS HUGEINT) * e2 * e3) AS c14
                FROM st),
            d AS (SELECT *,
                least(c23, c12) + c13 AS k13,
                least(c34, c23) + c24 AS k24
                FROM c),
            f AS (SELECT *,
                least(k24, c12 + c34, k13) + c14 AS k14,
                CASE WHEN k24 <= c12 + c34 AND k24 <= k13 THEN 1
                     WHEN c12 + c34 <= k13 THEN 2
                     ELSE 3 END AS s14
                FROM d)
            SELECT * FROM (
                SELECT CAST(1 AS BIGINT) AS r_from,
                       CAST(1 AS BIGINT) AS r_to,
                       CAST(r1 AS BIGINT) AS est_card,
                       CAST(0 AS BIGINT) AS best_cost,
                       CAST(0 AS BIGINT) AS best_split FROM f
                UNION ALL SELECT 1, 2, CAST(c12 AS BIGINT),
                       CAST(c12 AS BIGINT), 1 FROM f
                UNION ALL SELECT 1, 3, CAST(c13 AS BIGINT),
                       CAST(k13 AS BIGINT),
                       CASE WHEN c23 <= c12 THEN 1 ELSE 2 END FROM f
                UNION ALL SELECT 1, 4, CAST(c14 AS BIGINT),
                       CAST(k14 AS BIGINT), s14 FROM f
                UNION ALL SELECT 2, 2, CAST(r2 AS BIGINT), 0, 0 FROM f
                UNION ALL SELECT 2, 3, CAST(c23 AS BIGINT),
                       CAST(c23 AS BIGINT), 2 FROM f
                UNION ALL SELECT 2, 4, CAST(c24 AS BIGINT),
                       CAST(k24 AS BIGINT),
                       CASE WHEN c34 <= c23 THEN 2 ELSE 3 END FROM f
                UNION ALL SELECT 3, 3, CAST(r3 AS BIGINT), 0, 0 FROM f
                UNION ALL SELECT 3, 4, CAST(c34 AS BIGINT),
                       CAST(c34 AS BIGINT), 3 FROM f
                UNION ALL SELECT 4, 4, CAST(r4 AS BIGINT), 0, 0 FROM f
            ) ORDER BY r_from, r_to
        """,
    'q_customer_linkage_fs': """
            WITH f AS MATERIALIZED (
                SELECT c_custkey AS id, c_nationkey AS nk,
                       c_mktsegment AS f1,
                       (CAST(round(c_acctbal * 100) AS BIGINT)
                        + 100000) // 10000 AS f2,
                       c_custkey % 10 AS f3
                FROM customer),
            nn AS (SELECT count(*) AS n FROM f),
            u1 AS (SELECT SUM(c * (c - 1)) AS num FROM
                   (SELECT count(*) AS c FROM f GROUP BY f1)),
            u2 AS (SELECT SUM(c * (c - 1)) AS num FROM
                   (SELECT count(*) AS c FROM f GROUP BY f2)),
            u3 AS (SELECT SUM(c * (c - 1)) AS num FROM
                   (SELECT count(*) AS c FROM f GROUP BY f3)),
            w AS (SELECT
                CAST(floor(1e6 * (ln(0.95) - ln(CAST(u1.num AS DOUBLE)
                    / (nn.n * (nn.n - 1))))) AS BIGINT) AS wa1,
                CAST(floor(1e6 * (ln(1.0 - 0.95)
                    - ln(1.0 - CAST(u1.num AS DOUBLE)
                         / (nn.n * (nn.n - 1))))) AS BIGINT) AS wd1,
                CAST(floor(1e6 * (ln(0.9) - ln(CAST(u2.num AS DOUBLE)
                    / (nn.n * (nn.n - 1))))) AS BIGINT) AS wa2,
                CAST(floor(1e6 * (ln(1.0 - 0.9)
                    - ln(1.0 - CAST(u2.num AS DOUBLE)
                         / (nn.n * (nn.n - 1))))) AS BIGINT) AS wd2,
                CAST(floor(1e6 * (ln(0.85) - ln(CAST(u3.num AS DOUBLE)
                    / (nn.n * (nn.n - 1))))) AS BIGINT) AS wa3,
                CAST(floor(1e6 * (ln(1.0 - 0.85)
                    - ln(1.0 - CAST(u3.num AS DOUBLE)
                         / (nn.n * (nn.n - 1))))) AS BIGINT) AS wd3
                FROM u1, u2, u3, nn),
            p AS (
                SELECT a.id AS id_a, b.id AS id_b,
                       CAST(CASE WHEN a.f1 = b.f1
                                 THEN 1 ELSE 0 END AS BIGINT)
                           AS agree_seg,
                       CAST(CASE WHEN a.f2 = b.f2
                                 THEN 1 ELSE 0 END AS BIGINT)
                           AS agree_bal,
                       CAST(CASE WHEN a.f3 = b.f3
                                 THEN 1 ELSE 0 END AS BIGINT)
                           AS agree_digit
                FROM f a JOIN f b ON a.nk = b.nk AND a.id < b.id)
            SELECT id_a, id_b, agree_seg, agree_bal, agree_digit,
                   (CASE WHEN agree_seg = 1 THEN w.wa1 ELSE w.wd1 END
                    + CASE WHEN agree_bal = 1
                           THEN w.wa2 ELSE w.wd2 END
                    + CASE WHEN agree_digit = 1
                           THEN w.wa3 ELSE w.wd3 END) AS score_micro
            FROM p, w
            ORDER BY score_micro DESC, id_a, id_b LIMIT 100
        """,
}
ORACLE_REGISTRY.update(ORACLES)
ORACLES['q_supplier_matching'] = ORACLE_REGISTRY['q_supplier_matching'] = _matching_oracle_sql(rounds=16)
ORACLES['q_part_ktruss'] = ORACLE_REGISTRY['q_part_ktruss'] = _ktruss_oracle_sql(k=3, min_cocount=2,
                                                  rounds=6)
ORACLES['q_part_betweenness'] = ORACLE_REGISTRY['q_part_betweenness'] = _betweenness_oracle_sql(
        n_sources=4, max_depth=6, min_cocount=2)
ORACLES['q_part_sssp'] = ORACLE_REGISTRY['q_part_sssp'] = _sssp_oracle_sql(rounds=24, min_cocount=2)
ORACLES['q_orders_bloom_semijoin'] = ORACLE_REGISTRY['q_orders_bloom_semijoin'] = """
        WITH keys AS (
            SELECT DISTINCT o_orderkey AS k FROM orders
            WHERE o_orderpriority = '1-URGENT'),
        hs AS (SELECT unnest([0, 1, 2]) AS i),
        bits AS (
            SELECT DISTINCT CAST(
                CAST('0x' || substr(md5(CAST(k AS VARCHAR) || '#' ||
                     CAST(i AS VARCHAR)), 1, 16) AS UBIGINT)
                % 65536 AS BIGINT) AS b
            FROM keys CROSS JOIN hs),
        pk AS (SELECT DISTINCT l_orderkey AS k FROM lineitem),
        ph AS (
            SELECT pk.k, CAST(
                CAST('0x' || substr(md5(CAST(pk.k AS VARCHAR) || '#' ||
                     CAST(hs.i AS VARCHAR)), 1, 16) AS UBIGINT)
                % 65536 AS BIGINT) AS b
            FROM pk CROSS JOIN hs),
        pass AS (
            SELECT k FROM ph JOIN bits USING (b)
            GROUP BY k HAVING count(*) = 3),
        agg AS (SELECT
            (SELECT count(*) FROM keys) AS n_keys,
            (SELECT count(*) FROM bits) AS bits_set,
            (SELECT count(*) FROM lineitem) AS n_probe,
            (SELECT count(*) FROM lineitem
             WHERE l_orderkey IN (SELECT k FROM pass)) AS n_pass,
            (SELECT count(*) FROM lineitem
             WHERE l_orderkey IN (SELECT k FROM keys)) AS n_true)
        SELECT CAST(n_keys AS BIGINT) AS n_keys,
               CAST(bits_set AS BIGINT) AS bits_set,
               CAST(n_probe AS BIGINT) AS n_probe,
               CAST(n_pass AS BIGINT) AS n_pass,
               CAST(n_true AS BIGINT) AS n_true,
               CAST(n_pass - n_true AS BIGINT) AS n_false_pos,
               round(CASE WHEN n_probe - n_true > 0
                     THEN CAST(n_pass - n_true AS DOUBLE)
                          / (n_probe - n_true)
                     ELSE 0.0 END, 6) AS fp_rate
        FROM agg"""
ORACLES['q_lineitem_auc'] = ORACLE_REGISTRY['q_lineitem_auc'] = """
        WITH g AS (
            SELECT CAST(l_quantity AS BIGINT) AS s,
                   sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                       AS np_, count(*) AS n
            FROM lineitem GROUP BY 1),
        w AS (
            SELECT s, np_, n - np_ AS nn,
                   coalesce(sum(n - np_) OVER (ORDER BY s
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS below
            FROM g)
        SELECT CAST(sum(np_) AS BIGINT) AS n_pos,
               CAST(sum(nn) AS BIGINT) AS n_neg,
               CAST(sum(np_ * (2 * below + nn)) AS BIGINT) AS u2,
               round(CAST(sum(np_ * (2 * below + nn)) AS DOUBLE)
                     / (2.0 * sum(np_) * sum(nn)), 6) AS auc
        FROM w"""
ORACLES['q_orders_benford'] = ORACLE_REGISTRY['q_orders_benford'] = """
        WITH c AS (SELECT CAST(o_totalprice * 100 AS BIGINT) AS cents
                   FROM orders),
        d AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1)
                          AS BIGINT) AS digit, count(*) AS n_obs
              FROM c GROUP BY 1),
        e AS (SELECT digit, n_obs,
                     log10(1.0 + 1.0 / digit)
                     * (SELECT sum(n_obs) FROM d) AS exp_n
              FROM d)
        SELECT digit, CAST(n_obs AS BIGINT) AS n_obs,
               round(exp_n, 6) AS expected,
               round((n_obs - exp_n) * (n_obs - exp_n) / exp_n, 6)
                   AS chi2_term
        FROM e ORDER BY digit"""
ORACLES['q_part_katz'] = ORACLE_REGISTRY['q_part_katz'] = _katz_oracle_sql(iters=4, denom=4)
ORACLES['q_part_walks'] = ORACLE_REGISTRY['q_part_walks'] = _walks_oracle_sql(walks=2, length=3)
ORACLES['q_part_mst'] = ORACLE_REGISTRY['q_part_mst'] = _mst_oracle_sql(rounds=6, min_cocount=2)
ORACLES['q_part_item_cosine'] = ORACLE_REGISTRY['q_part_item_cosine'] = _item_cosine_oracle_sql(
        k=5, min_cocount=2)
ORACLES['q_stable_matching'] = ORACLE_REGISTRY['q_stable_matching'] = _stable_matching_oracle_sql(
        n=8, rounds=16)
ORACLES['q_doc_token_align'] = ORACLE_REGISTRY['q_doc_token_align'] = _token_align_oracle_sql()
ORACLES['q_lineitem_price_index'] = ORACLE_REGISTRY['q_lineitem_price_index'] = _PRICE_INDEX_ORACLE_SQL
ORACLES['q_part_luby_mis'] = ORACLE_REGISTRY['q_part_luby_mis'] = _luby_mis_oracle_sql(
        rounds=8, min_cocount=2)
ORACLES['q_part_rich_club'] = ORACLE_REGISTRY['q_part_rich_club'] = _rich_club_oracle_sql(min_cocount=2)
ORACLES['q_part_eigenvector'] = ORACLE_REGISTRY['q_part_eigenvector'] = _eigenvector_oracle_sql(
        iters=4, scale=1_000_000, min_cocount=2)
ORACLES['q_doc_langid_kappa'] = ORACLE_REGISTRY['q_doc_langid_kappa'] = f"""
        WITH lp AS MATERIALIZED ({ORACLE_REGISTRY["doc_langid"]}),
        j AS (SELECT d.lang, lp.lang_pred
              FROM documents d JOIN lp USING (doc_id)),
        conf AS (SELECT lang, lang_pred, count(*) AS n
                 FROM j GROUP BY 1, 2),
        agg AS (SELECT SUM(n) AS n_tot,
                       SUM(CASE WHEN lang = lang_pred
                                THEN n ELSE 0 END) AS agree
                FROM conf),
        rs AS (SELECT lang AS lb, SUM(n) AS r FROM conf GROUP BY 1),
        cs AS (SELECT lang_pred AS lb, SUM(n) AS c
               FROM conf GROUP BY 1),
        ch AS (SELECT SUM(coalesce(rs.r, 0) * coalesce(cs.c, 0))
                   AS chance
               FROM rs FULL JOIN cs USING (lb))
        SELECT CAST(agg.n_tot AS BIGINT) AS n_docs,
               CAST(agg.agree AS BIGINT) AS n_agree,
               CAST(ch.chance AS BIGINT) AS chance_cross,
               round(CAST(agg.n_tot * agg.agree - ch.chance
                          AS DOUBLE)
                     / (agg.n_tot * agg.n_tot - ch.chance), 6)
                   AS kappa
        FROM agg, ch"""
ORACLES['q_lineitem_hilbert'] = ORACLE_REGISTRY['q_lineitem_hilbert'] = _hilbert_oracle_sql(
        cols=("l_partkey", "l_suppkey"), nbuckets=64, bits=16)
