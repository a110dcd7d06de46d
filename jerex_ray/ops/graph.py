"""Distributed PageRank over an edge-list Dataset (power iteration).

The near-dup graph that dedup produces (``dedup_jaccard_edges`` /
``dedup_minhash_edges`` → ``dedup_components``) is also the input to
centrality-weighted survivor selection: inside a duplicate cluster the
highest-PageRank document is the best canonical representative (it is
the one most "agreed with" by its near-duplicates). This module scores
it with the standard damped power iteration (Page/Brin/Motwani/
Winograd '99), expressed Ray-Data-first:

* The DIRECTED edge table (each undirected input edge exploded once,
  up front, into both directions) is materialized ONCE and never moves
  again — iterations stream over it with ``map_batches``.
* Per iteration only node-sized state moves:
  rank_{t+1}(v) = (1−d)/N + d · Σ_{u→v} rank_t(u)/deg(u).
* ``mode="broadcast"`` (default): the rank/degree map rides the object
  store via one ``ray.put`` per iteration and each edge batch emits
  per-destination PARTIAL sums (the combiner absorbs hot
  destinations); a tree-reduce ``grouped_aggregate`` finishes the sum.
  Right while the node table fits a worker heap — the common case for
  near-dup graphs, where |V| ≪ corpus and |E| is the big side.
* ``mode="join"``: ranks stay a Dataset; contributions come from a
  hash-partitioned ``Dataset.join`` on the source node, then the same
  grouped sum — unbounded |V|, pays one shuffle per iteration.

Both modes are exact and identical (pytest-gated); the oracled query
``doc_pagerank`` checks 5 iterations against a chained-CTE DuckDB
recomputation, bit-for-bit after 6-decimal rounding.

Semantics note: the graph is restricted to nodes with ≥1 edge, and
undirected exploding guarantees every node has in- AND out-edges, so
there is no dangling-mass redistribution term — the classic
complication PageRank-over-web needs and similarity graphs don't.

The reference has no graph algorithms (SURVEY.md §2.7); engine
extension for the LLM-data-pipeline charter, sharing the BSP shape of
``functions/components.py``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _directed_edges(edges_ds, *, src: str, dst: str, undirected: bool):
    def direct(df: pd.DataFrame) -> pd.DataFrame:
        fwd = pd.DataFrame({"u": df[src].to_numpy(),
                            "v": df[dst].to_numpy()})
        if not undirected:
            return fwd
        rev = pd.DataFrame({"u": df[dst].to_numpy(),
                            "v": df[src].to_numpy()})
        return pd.concat([fwd, rev], ignore_index=True)

    return edges_ds.map_batches(direct, batch_format="pandas")


def pagerank(edges_ds, *, src: str = "doc_a", dst: str = "doc_b",
             damping: float = 0.85, iters: int = 5,
             undirected: bool = True, mode: str = "broadcast",
             num_partitions: int | None = None) -> pd.DataFrame:
    """PageRank over an edge-list Dataset; returns a node-sized pandas
    table ``(node, pr)`` (broadcast mode's contract is precisely that
    node-sized state is small; join mode callers wanting a Dataset can
    wrap the result, which is already reduced)."""
    import ray

    from jerex_ray.functions.aggregate import grouped_aggregate

    if mode not in ("broadcast", "join"):
        raise ValueError(f"unknown mode {mode!r}")
    edges = _directed_edges(edges_ds, src=src, dst=dst,
                            undirected=undirected).materialize()
    deg_df = grouped_aggregate(edges, ["u"], {"deg": (None, "count")},
                               num_partitions=num_partitions).to_pandas()
    if deg_df.empty:
        return pd.DataFrame({"node": pd.Series(dtype="int64"),
                             "pr": pd.Series(dtype="float64")})
    deg_df = deg_df.sort_values("u").reset_index(drop=True)
    n = len(deg_df)
    teleport = (1.0 - damping) / n

    if mode == "broadcast":
        nodes = deg_df["u"].to_numpy()
        deg = deg_df["deg"].to_numpy(np.float64)
        rank = np.full(n, 1.0 / n)
        node_pos = pd.Series(np.arange(n), index=nodes)
        for _ in range(iters):
            ref = ray.put(rank / deg)

            def contrib(df: pd.DataFrame, _ref=ref) -> pd.DataFrame:
                rd = ray.get(_ref)
                w = rd[node_pos.loc[df["u"].to_numpy()].to_numpy()]
                part = (pd.DataFrame({"v": df["v"].to_numpy(), "w": w})
                        .groupby("v", sort=False)["w"].sum())
                return pd.DataFrame({"v": part.index.to_numpy(),
                                     "w": part.to_numpy()})

            sums = grouped_aggregate(
                edges.map_batches(contrib, batch_format="pandas"),
                ["v"], {"s": ("w", "sum")},
                num_partitions=num_partitions).to_pandas()
            s = np.zeros(n)
            s[node_pos.loc[sums["v"].to_numpy()].to_numpy()] = \
                sums["s"].to_numpy(np.float64)
            rank = teleport + damping * s
        return pd.DataFrame({"node": nodes, "pr": rank}) \
            .sort_values("node").reset_index(drop=True)

    # mode="join": node-sized state stays distributed
    deg_ds = ray.data.from_pandas(
        deg_df.assign(pr=1.0 / n)).materialize()
    for _ in range(iters):
        joined = edges.join(deg_ds, join_type="inner", num_partitions=8,
                            on=("u",), right_on=("u",))

        def contrib(df: pd.DataFrame) -> pd.DataFrame:
            w = df["pr"].to_numpy() / df["deg"].to_numpy(np.float64)
            part = (pd.DataFrame({"v": df["v"].to_numpy(), "w": w})
                    .groupby("v", sort=False)["w"].sum())
            return pd.DataFrame({"v": part.index.to_numpy(),
                                 "w": part.to_numpy()})

        sums = grouped_aggregate(
            joined.map_batches(contrib, batch_format="pandas"),
            ["v"], {"s": ("w", "sum")}, num_partitions=num_partitions)

        def finish(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"u": df["v"].to_numpy(),
                                 "pr": teleport
                                 + damping * df["s"].to_numpy(np.float64)})

        new_pr = sums.map_batches(finish, batch_format="pandas")
        # every node of the undirected graph has in-edges, so new_pr
        # covers all nodes; re-attach degrees for the next iteration
        deg_ds = new_pr.join(
            deg_ds.select_columns(["u", "deg"]), join_type="inner",
            num_partitions=8, on=("u",), right_on=("u",)).materialize()
    out = deg_ds.to_pandas()[["u", "pr"]] \
        .rename(columns={"u": "node"})
    return out.sort_values("node").reset_index(drop=True)
