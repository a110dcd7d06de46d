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
             personalize: int | None = None,
             num_partitions: int | None = None) -> pd.DataFrame:
    """PageRank over an edge-list Dataset; returns a node-sized pandas
    table ``(node, pr)`` (broadcast mode's contract is precisely that
    node-sized state is small; join mode callers wanting a Dataset can
    wrap the result, which is already reduced). ``personalize=<node>``
    concentrates ALL teleport mass on one seed (personalized PageRank
    / random walk with restart, Jeh & Widom '03): init rank = 1 at
    the seed, per-step rank = (1−d)·[node=seed] + d·inflow — broadcast
    mode only (the teleport is a vector, not a scalar)."""
    import ray

    from jerex_ray.functions.aggregate import grouped_aggregate

    if mode not in ("broadcast", "join"):
        raise ValueError(f"unknown mode {mode!r}")
    if personalize is not None and mode != "broadcast":
        raise ValueError("personalize requires mode='broadcast'")
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
        if personalize is None:
            tele = np.full(n, teleport)
            rank = np.full(n, 1.0 / n)
        else:
            seed_mask = nodes == personalize
            tele = np.where(seed_mask, 1.0 - damping, 0.0)
            rank = np.where(seed_mask, 1.0, 0.0)
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
            rank = tele + damping * s
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


def triangle_counts(edges_ds, *, src: str = "a", dst: str = "b",
                    num_partitions: int | None = None):
    """Per-node triangle participation counts over an undirected simple
    graph, as a Dataset ``(node, n_triangles)``.

    Degree-ordered wedge-join (Suri & Vassilvitskii WWW'11; Cohen's
    MapReduce graph-twiddling '09): orient every edge from its
    lower-(degree, id) endpoint to the higher one, generate wedges only
    at each node's ORIENTED out-neighborhood (bounded by O(√E) per
    node — the whole point of degree ordering: a celebrity node with
    10⁶ fans creates zero wedges because its fans point AT it), then
    close wedges against the oriented edge table with one
    hash-partitioned join. Every stage is a Dataset transform:

    1. dedup/canonicalize edges (grouped key-only aggregate);
    2. degrees: endpoint explode → grouped count;
    3. orientation: two hash joins attach endpoint degrees, one
       vectorized flip;
    4. wedges: co-locate by wedge apex, per-block self-merge of each
       apex's out-neighborhood (quadratic ONLY in oriented out-degree);
    5. close: wedges ⋈ oriented edges on (lo, hi);
    6. per-node counts: 3-way corner explode → grouped count.

    The reference has no graph algorithms (SURVEY.md §2.7); engine
    extension, same charter as ``pagerank`` above.
    """
    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply
    from jerex_ray.runtime import shuffle_partitions

    np_ = shuffle_partitions(num_partitions)

    edges = _canonical_edges(edges_ds, src=src, dst=dst,
                             num_partitions=num_partitions)
    # a self-loop-only or empty input leaves ZERO canonical edges, and
    # all-empty partitions lose their schema through Dataset.join (the
    # same library edge the wedge sentinel below works around) — an
    # empty graph has no triangles, return the typed empty result
    if edges.count() == 0:
        import ray
        return ray.data.from_pandas(pd.DataFrame(
            {"node": pd.Series(dtype="int64"),
             "n_triangles": pd.Series(dtype="int64")}))

    def endpoints(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": np.concatenate(
            [df["a"].to_numpy(), df["b"].to_numpy()])})

    deg = grouped_aggregate(
        edges.map_batches(endpoints, batch_format="pandas"),
        ["node"], {"deg": (None, "count")},
        num_partitions=num_partitions, result_hint="large").materialize()

    # attach degrees to both endpoints (hash joins — |V| is unbounded,
    # so no broadcast), then orient low→high by (degree, id)
    j = edges.join(deg, join_type="inner", num_partitions=np_,
                   on=("a",), right_on=("node",)) \
        .map_batches(lambda df: df.rename(columns={"deg": "deg_a"})
                     [["a", "b", "deg_a"]], batch_format="pandas")
    j = j.join(deg, join_type="inner", num_partitions=np_,
               on=("b",), right_on=("node",)) \
        .map_batches(lambda df: df.rename(columns={"deg": "deg_b"})
                     [["a", "b", "deg_a", "deg_b"]], batch_format="pandas")

    def orient(df: pd.DataFrame) -> pd.DataFrame:
        a, b = df["a"].to_numpy(), df["b"].to_numpy()
        da = df["deg_a"].to_numpy(np.int64)
        db = df["deg_b"].to_numpy(np.int64)
        fwd = (da < db) | ((da == db) & (a < b))
        return pd.DataFrame({
            "lo": np.where(fwd, a, b), "hi": np.where(fwd, b, a),
            "deg_hi": np.where(fwd, db, da)})

    oriented = j.map_batches(orient, batch_format="pandas").materialize()

    def wedges_block(block: pd.DataFrame) -> pd.DataFrame:
        if block.empty:
            return pd.DataFrame({"lo": pd.Series(dtype="int64"),
                                 "hi": pd.Series(dtype="int64"),
                                 "apex": pd.Series(dtype="int64")})
        # self-merge each apex's out-neighborhood; oriented out-degree
        # is O(√E), so the quadratic blowup is bounded per apex
        nb = block[["lo", "hi", "deg_hi"]]
        m = nb.merge(nb, on="lo")
        first = (m["deg_hi_x"].to_numpy() < m["deg_hi_y"].to_numpy()) | \
            ((m["deg_hi_x"].to_numpy() == m["deg_hi_y"].to_numpy()) &
             (m["hi_x"].to_numpy() < m["hi_y"].to_numpy()))
        m = m[first]
        # wedge (v, w) closes iff oriented edge v→w exists; emit in
        # the SAME (degree, id) orientation as the edge table
        return pd.DataFrame({"lo": m["hi_x"].to_numpy(),
                             "hi": m["hi_y"].to_numpy(),
                             "apex": m["lo"].to_numpy()})

    wedges = grouped_apply(oriented, ["lo"], wedges_block,
                           num_partitions=num_partitions)
    # Ray's hash join drops the schema of all-empty partitions
    # (ArrowInvalid "no match for key field") — a triangle-free graph
    # (star) produces ZERO wedges. Union one sentinel wedge that can
    # never close: oriented edges always have lo ≠ hi (self-loops are
    # dropped), so the (s, s) key matches nothing and the inner join
    # silently discards it.
    import ray

    s = np.int64(-(2 ** 62))
    sentinel = ray.data.from_pandas(pd.DataFrame(
        {"lo": [s], "hi": [s], "apex": [s]}))
    wedges = wedges.union(sentinel)
    closed = wedges.join(
        oriented.map_batches(lambda df: df[["lo", "hi"]],
                             batch_format="pandas"),
        join_type="inner", num_partitions=np_, on=("lo", "hi"))

    def corners(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": np.concatenate(
            [df["apex"].to_numpy(), df["lo"].to_numpy(),
             df["hi"].to_numpy()])})

    return grouped_aggregate(
        closed.map_batches(corners, batch_format="pandas"),
        ["node"], {"n_triangles": (None, "count")},
        num_partitions=num_partitions, result_hint="large")


def _canonical_edges(edges_ds, *, src: str, dst: str,
                     num_partitions: int | None = None):
    """Dedup + canonicalize an undirected edge list: (a<b), self-loops
    dropped, one row per edge — the shared front door of
    ``triangle_counts`` and ``kcore``. Returns a MATERIALIZED Dataset
    (every caller iterates it)."""
    from jerex_ray.functions.aggregate import grouped_aggregate

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        a = df[src].to_numpy()
        b = df[dst].to_numpy()
        keep = a != b
        a, b = a[keep], b[keep]
        return pd.DataFrame({"a": np.minimum(a, b), "b": np.maximum(a, b)})

    return grouped_aggregate(
        edges_ds.map_batches(canon, batch_format="pandas"),
        ["a", "b"], {"n": (None, "count")},
        num_partitions=num_partitions, result_hint="large") \
        .map_batches(lambda df: df[["a", "b"]], batch_format="pandas") \
        .materialize()


def kcore(edges_ds, *, k: int, src: str = "a", dst: str = "b",
          max_rounds: int = 8, num_partitions: int | None = None):
    """Nodes of the k-core (the maximal subgraph where every node has
    degree ≥ k) with their in-core degrees, by iterative peeling
    (Matula & Beck '83): each round drops nodes below k and the edges
    touching them, until a fixpoint or ``max_rounds``.

    BSP shape, same as ``functions/components.py``: per round one
    combiner-backed degree aggregate + two hash joins filter the edge
    Dataset against the surviving-node Dataset — node membership never
    becomes a driver-side set. Rounds materialize their (shrinking)
    edge table; the round count on real graphs is small (the peel
    cascades). An unconverged exit logs a warning (the result is then
    "after max_rounds peels", a superset of the true k-core).

    k-core is the standard near-dup-graph cleaner: spam rings and
    template farms form high-core clusters that survive peeling while
    organic near-dup pairs (core 1) fall out.
    """
    import logging

    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import shuffle_partitions

    np_ = shuffle_partitions(num_partitions)
    edges = _canonical_edges(edges_ds, src=src, dst=dst,
                             num_partitions=num_partitions)

    def endpoints(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": np.concatenate(
            [df["a"].to_numpy(), df["b"].to_numpy()])})

    def empty_result():
        import ray
        return ray.data.from_pandas(pd.DataFrame(
            {"node": pd.Series(dtype="int64"),
             "deg": pd.Series(dtype="int64")}))

    n_edges = edges.count()
    if n_edges == 0:
        return empty_result()
    deg = None
    for rnd in range(max_rounds):
        deg = grouped_aggregate(
            edges.map_batches(endpoints, batch_format="pandas"),
            ["node"], {"deg": (None, "count")},
            num_partitions=num_partitions, result_hint="large")
        alive = deg.map_batches(lambda df: df[df["deg"] >= k][["node"]],
                                batch_format="pandas").materialize()
        if alive.count() == 0:
            return empty_result()
        kept = edges.join(alive, join_type="inner", num_partitions=np_,
                          on=("a",), right_on=("node",)) \
            .join(alive, join_type="inner", num_partitions=np_,
                  on=("b",), right_on=("node",)) \
            .map_batches(lambda df: df[["a", "b"]],
                         batch_format="pandas").materialize()
        n_kept = kept.count()
        if n_kept == n_edges:          # fixpoint: nobody fell below k
            break
        edges, n_edges = kept, n_kept
    else:
        logging.getLogger(__name__).warning(
            "kcore: max_rounds=%d reached without a fixpoint — result "
            "is the %d-round peel (a superset of the true %d-core)",
            max_rounds, max_rounds, k)
    # final degrees over the surviving edges
    return grouped_aggregate(
        edges.map_batches(endpoints, batch_format="pandas"),
        ["node"], {"deg": (None, "count")},
        num_partitions=num_partitions, result_hint="large")


def bipartite_jaccard(pairs_ds, *, left_col: str, right_col: str,
                      top_k: int = 50,
                      num_partitions: int | None = None) -> pd.DataFrame:
    """Jaccard-weighted one-mode projection of a bipartite graph — the
    collaborative-filtering / link-prediction primitive (Liben-Nowell
    & Kleinberg 2003): for every pair of LEFT nodes sharing at least
    one RIGHT neighbor, |N(a)∩N(b)| (shared) and Jaccard
    shared / (|N(a)|+|N(b)|−shared).

    Dataflow: distinct (left,right) incidences reduce through the
    combiner; RIGHT nodes co-locate via one hash shuffle and each
    block emits its per-right-node left-pair wedges from a vectorized
    self-merge; wedge partials reduce to shared counts; left-node
    degree table (node-bounded, dimension-sized) broadcasts into the
    pair stream. Only the top-k rows (ordered by rounded Jaccard DESC,
    then pair — deterministic under ties) reach the caller: per-block
    exact head after the global count, corpus never sorts.

    Skew note: a right node of degree d emits d(d−1)/2 wedges — cap
    hub fan-out upstream (or sample) for power-law right degrees."""
    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply

    inc = grouped_aggregate(pairs_ds, [left_col, right_col],
                            {"n": (None, "count")},
                            num_partitions=num_partitions) \
        .drop_columns(["n"])

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"a": pd.Series(dtype="int64"),
                                 "b": pd.Series(dtype="int64"),
                                 "c": pd.Series(dtype="int64")})
        m = df.merge(df, on=right_col)
        la, lb = f"{left_col}_x", f"{left_col}_y"
        m = m[m[la] < m[lb]]
        g = m.groupby([la, lb], sort=False).size().reset_index(name="c")
        return pd.DataFrame({"a": g[la].to_numpy(),
                             "b": g[lb].to_numpy(),
                             "c": g["c"].to_numpy(np.int64)})

    shared = grouped_aggregate(
        grouped_apply(inc, [right_col], wedges,
                      num_partitions=num_partitions),
        ["a", "b"], {"shared": ("c", "sum")},
        num_partitions=num_partitions)

    deg = grouped_aggregate(inc, [left_col], {"d": (None, "count")},
                            num_partitions=num_partitions).to_pandas()

    from jerex_ray.functions.join import broadcast_join
    out = broadcast_join(shared, deg.rename(
        columns={left_col: "a", "d": "da"}), left_on="a", right_on="a")
    out = broadcast_join(out, deg.rename(
        columns={left_col: "b", "d": "db"}), left_on="b", right_on="b")

    EMPTY = pd.DataFrame({"a": pd.Series(dtype="int64"),
                          "b": pd.Series(dtype="int64"),
                          "shared": pd.Series(dtype="int64"),
                          "jaccard": pd.Series(dtype="float64")})

    def score(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return EMPTY
        df = df.copy()
        df["jaccard"] = (df["shared"] /
                         (df["da"] + df["db"] - df["shared"])).round(6)
        return df[["a", "b", "shared", "jaccard"]]

    def head_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return EMPTY
        return df.sort_values(["jaccard", "a", "b"],
                              ascending=[False, True, True]).head(top_k)

    final = out.map_batches(score, batch_format="pandas") \
        .map_batches(head_block, batch_format="pandas",
                     batch_size=None) \
        .repartition(1) \
        .map_batches(head_block, batch_format="pandas",
                     batch_size=None).to_pandas()
    if final.empty or "a" not in final.columns:
        return pd.DataFrame({"a": pd.Series(dtype="int64"),
                             "b": pd.Series(dtype="int64"),
                             "shared": pd.Series(dtype="int64"),
                             "jaccard": pd.Series(dtype="float64")})
    final["shared"] = final["shared"].astype("int64")
    return final.sort_values(["jaccard", "a", "b"],
                             ascending=[False, True, True]) \
        .head(top_k).reset_index(drop=True)


def adamic_adar(pairs_ds, *, left_col: str, right_col: str,
                top_k: int = 50,
                num_partitions: int | None = None) -> pd.DataFrame:
    """Adamic-Adar link-prediction scores over a bipartite graph
    (Adamic & Adar '03): for LEFT pairs sharing right neighbors,
    AA(a,b) = Σ_z 1/ln(deg(z)) — rare shared neighbors count more
    than hubs. Same dataflow as ``bipartite_jaccard`` (one combiner
    pass to distinct incidences, right-node co-location, vectorized
    wedge self-merge) except each z's wedges carry the weight
    1/ln(deg(z)) computed IN the co-located block (deg(z) is the
    local group size — no degree join needed for the weight), and
    partial (count, weight) sums reduce per pair. ln on integer
    degrees is glibc on both engines; the ranking orders by the
    ROUNDED score (round-before-rank) so top-k membership can't flip
    on accumulation-order dust. Hub caution as for Jaccard: degree-d
    right nodes emit d(d−1)/2 wedges — cap or sample hubs upstream
    for power-law graphs."""
    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply

    inc = grouped_aggregate(pairs_ds, [left_col, right_col],
                            {"n": (None, "count")},
                            num_partitions=num_partitions) \
        .drop_columns(["n"])

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"a": pd.Series(dtype="int64"),
                              "b": pd.Series(dtype="int64"),
                              "c": pd.Series(dtype="int64"),
                              "w": pd.Series(dtype="float64")})
        if df.empty:
            return empty
        deg = df.groupby(right_col, sort=False)[left_col] \
            .transform("size")
        d = df.assign(__w=1.0 / np.log(deg.to_numpy(np.float64)))
        m = d.merge(d[[left_col, right_col]], on=right_col)
        la, lb = f"{left_col}_x", f"{left_col}_y"
        m = m[m[la] < m[lb]]
        if m.empty:
            return empty
        g = m.groupby([la, lb], sort=False)["__w"] \
            .agg(["size", "sum"]).reset_index()
        return pd.DataFrame({"a": g[la].to_numpy(),
                             "b": g[lb].to_numpy(),
                             "c": g["size"].to_numpy(np.int64),
                             "w": g["sum"].to_numpy(np.float64)})

    scored = grouped_aggregate(
        grouped_apply(inc, [right_col], wedges,
                      num_partitions=num_partitions),
        ["a", "b"], {"shared": ("c", "sum"), "aa": ("w", "sum")},
        num_partitions=num_partitions)

    EMPTY = pd.DataFrame({"a": pd.Series(dtype="int64"),
                          "b": pd.Series(dtype="int64"),
                          "shared": pd.Series(dtype="int64"),
                          "aa": pd.Series(dtype="float64")})

    def head_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "a" not in df.columns:
            return EMPTY
        df = df.copy()
        df["aa"] = df["aa"].round(6)
        return df.sort_values(["aa", "a", "b"],
                              ascending=[False, True, True]).head(top_k)

    final = scored.map_batches(head_block, batch_format="pandas",
                               batch_size=None) \
        .repartition(1) \
        .map_batches(head_block, batch_format="pandas",
                     batch_size=None).to_pandas()
    if final.empty or "a" not in final.columns:
        return EMPTY
    final["shared"] = final["shared"].astype("int64")
    final["a"] = final["a"].astype("int64")
    final["b"] = final["b"].astype("int64")
    return final.sort_values(["aa", "a", "b"],
                             ascending=[False, True, True]) \
        .head(top_k).reset_index(drop=True)


def greedy_matching(pairs_ds, *, left_col: str, right_col: str,
                    max_rounds: int = 32,
                    num_partitions: int | None = None) -> pd.DataFrame:
    """Maximal bipartite matching by deterministic parallel greedy:
    every edge gets a distinct md5-64 priority, and each round keeps
    the edges that are the priority-minimum at BOTH endpoints (the
    local-minima rule). With distinct priorities this converges to
    EXACTLY the matching sequential greedy-by-priority produces (the
    lexicographically-first MIS of the conflict graph — round order
    can't change it), in O(log E) expected rounds (Blelloch et al.
    '12). Dataflow per round: two combiner passes to per-node min
    priorities (node-vocabulary-bounded tables — the same broadcast
    contract as HITS/PageRank), a broadcast filter picks winners, a
    broadcast anti-filter drops every edge touching a matched node.
    The matched set (≤ min(|L|,|R|) rows) is the only driver-side
    accumulation."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.util import md5_hash64_batch

    EMPTY = pd.DataFrame({"s": pd.Series(dtype="int64"),
                          "p": pd.Series(dtype="int64"),
                          "pr": pd.Series(dtype="uint64")})

    inc = grouped_aggregate(pairs_ds, [left_col, right_col],
                            {"n": (None, "count")},
                            num_partitions=num_partitions) \
        .drop_columns(["n"])

    def with_pr(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return EMPTY
        pr = md5_hash64_batch(
            (df[left_col].astype(str) + "|"
             + df[right_col].astype(str)).tolist())
        return pd.DataFrame({"s": df[left_col].to_numpy(),
                             "p": df[right_col].to_numpy(),
                             "pr": pr}) \
            .astype({"s": "int64", "p": "int64", "pr": "uint64"})

    alive = inc.map_batches(with_pr,
                            batch_format="pandas").materialize()
    matched: list[pd.DataFrame] = []
    for _ in range(max_rounds):
        if alive.count() == 0:
            break
        ms = grouped_aggregate(alive, ["s"],
                               {"m": ("pr", "min")}).to_pandas()
        mp = grouped_aggregate(alive, ["p"],
                               {"m": ("pr", "min")}).to_pandas()
        ms_d = dict(zip(ms["s"].astype("int64"),
                        ms["m"].astype("uint64")))
        mp_d = dict(zip(mp["p"].astype("int64"),
                        mp["m"].astype("uint64")))

        def pick(df: pd.DataFrame, _ms=ms_d, _mp=mp_d) -> pd.DataFrame:
            if df.empty:
                return EMPTY
            pr = df["pr"].to_numpy(np.uint64)
            keep = ((pr == df["s"].map(_ms).to_numpy(np.uint64))
                    & (pr == df["p"].map(_mp).to_numpy(np.uint64)))
            return df[keep]

        m = alive.map_batches(pick, batch_format="pandas").to_pandas()
        if m.empty or "s" not in m.columns:
            break
        matched.append(m)
        sset, pset = set(m["s"]), set(m["p"])

        def drop(df: pd.DataFrame, _s=sset, _p=pset) -> pd.DataFrame:
            if df.empty:
                return EMPTY
            return df[~df["s"].isin(_s) & ~df["p"].isin(_p)]

        alive = alive.map_batches(drop,
                                  batch_format="pandas").materialize()
    if not matched:
        return EMPTY.rename(columns={"s": left_col, "p": right_col})
    out = pd.concat(matched, ignore_index=True) \
        .rename(columns={"s": left_col, "p": right_col})
    return out.sort_values([left_col, right_col]) \
        .reset_index(drop=True)


def ktruss(edges_ds, *, k: int = 3, src: str = "a", dst: str = "b",
           max_rounds: int = 8,
           num_partitions: int | None = None) -> pd.DataFrame:
    """k-truss decomposition (Cohen '08): iteratively drop every edge
    supported by fewer than k−2 triangles until stable; the surviving
    subgraph is the densest cohesion core one level below cliques.
    Per round: adjacency explodes to (node, nbr) and co-locates by
    node, each block emits its node's neighbor-pair wedges, wedge
    counts reduce per pair, and the pair∩edge semi-join (broadcast —
    edge-bounded; swap to a distributed join past driver scale) gives
    per-edge support. Deterministic (pure set arithmetic), so a
    chained-CTE SQL oracle replays the identical rounds. Returns the
    truss edges with their in-truss support."""
    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply

    EMPTY = pd.DataFrame({"a": pd.Series(dtype="int64"),
                          "b": pd.Series(dtype="int64"),
                          "support": pd.Series(dtype="int64")})
    thr = k - 2

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return EMPTY[["a", "b"]]
        a = df[src].to_numpy(np.int64)
        b = df[dst].to_numpy(np.int64)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        out = pd.DataFrame({"a": lo, "b": hi})
        return out[out["a"] != out["b"]].drop_duplicates()

    edges = edges_ds.map_batches(canon, batch_format="pandas") \
        .materialize()

    def support_table(cur) -> "pd.DataFrame":
        """(a, b, support) for every current edge (0-support edges
        absent)."""
        import ray.data as rd

        def explode_adj(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty or "a" not in df.columns:
                return pd.DataFrame({"z": pd.Series(dtype="int64"),
                                     "n": pd.Series(dtype="int64")})
            return pd.DataFrame({
                "z": np.concatenate([df["a"].to_numpy(np.int64),
                                     df["b"].to_numpy(np.int64)]),
                "n": np.concatenate([df["b"].to_numpy(np.int64),
                                     df["a"].to_numpy(np.int64)])})

        def wedge_block(df: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame({"a": pd.Series(dtype="int64"),
                                  "b": pd.Series(dtype="int64")})
            if df.empty:
                return empty
            outs = []
            for _, g in df.groupby("z", sort=False):
                ns = np.unique(g["n"].to_numpy(np.int64))
                if len(ns) < 2:
                    continue
                iu, jv = np.triu_indices(len(ns), 1)
                outs.append(pd.DataFrame({"a": ns[iu], "b": ns[jv]}))
            if not outs:
                return empty
            return pd.concat(outs, ignore_index=True)

        wedges = grouped_apply(
            cur.map_batches(explode_adj, batch_format="pandas"),
            ["z"], wedge_block, num_partitions=num_partitions)
        cnt = grouped_aggregate(wedges, ["a", "b"],
                                {"support": (None, "count")},
                                num_partitions=num_partitions)
        eset = set(map(tuple, cur.to_pandas()[["a", "b"]].values))

        def only_edges(df: pd.DataFrame, _e=eset) -> pd.DataFrame:
            if df.empty or "a" not in df.columns:
                return EMPTY
            keep = [(x, y) in _e for x, y in zip(df["a"], df["b"])]
            return df[np.asarray(keep, dtype=bool)]

        return cnt.map_batches(only_edges,
                               batch_format="pandas").to_pandas()

    import ray.data as rd
    n_edges = edges.count()
    for _ in range(max_rounds):
        if n_edges == 0:
            return EMPTY
        sup = support_table(edges)
        if sup.empty or "a" not in sup.columns:
            return EMPTY
        keep = sup[sup["support"] >= thr][["a", "b"]]
        if len(keep) == n_edges:
            out = sup[["a", "b", "support"]].copy()
            out["support"] = out["support"].astype("int64")
            return out.sort_values(["a", "b"]).reset_index(drop=True)
        n_edges = len(keep)
        edges = rd.from_pandas(keep.reset_index(drop=True)) \
            .materialize() if n_edges else rd.from_pandas(
            EMPTY[["a", "b"]])
    raise RuntimeError(
        f"ktruss: no fixed point within {max_rounds} rounds — "
        "raise max_rounds (the SQL oracle replays a fixed cascade)")


def betweenness_sampled(edges_ds, sources: list[int], *,
                        src_col: str = "a", dst_col: str = "b",
                        max_depth: int = 6,
                        num_partitions: int | None = None) -> pd.DataFrame:
    """Depth-bounded Brandes betweenness (Brandes '01) from K sampled
    sources: one ``multi_bfs_levels`` grid pass gives every source's
    BFS levels, then the σ (shortest-path counts) sweep forward and
    the δ (dependency) sweep backward each run as ``max_depth``
    streaming passes over the SAME edge Dataset with the
    (K × nodes)-bounded σ/δ tables broadcast per level — the
    HITS/PageRank node-vector contract, level by level. σ stays
    integer-exact; δ ratios are fixed-order float expressions, so a
    chained-CTE SQL oracle reproduces the result to 6 dp. Depths
    beyond ``max_depth`` are truncated on BOTH engines (document as
    k-hop betweenness; exact when max_depth ≥ the sources'
    eccentricity). Input contract: DISTINCT undirected edges (one
    canonical row per pair) — duplicate or mirrored rows inflate σ."""
    from jerex_ray.functions.aggregate import grouped_aggregate

    sources = sorted({int(s) for s in sources})
    lv = multi_bfs_levels(edges_ds, sources, src=src_col, dst=dst_col,
                          max_rounds=max_depth,
                          num_partitions=num_partitions)
    level = {(int(r.source), int(r.node)): int(r.level)
             for r in lv.itertuples(index=False)}

    def sym_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or src_col not in df.columns:
            return pd.DataFrame({"u": pd.Series(dtype="int64"),
                                 "v": pd.Series(dtype="int64")})
        a = df[src_col].to_numpy(np.int64)
        b = df[dst_col].to_numpy(np.int64)
        return pd.DataFrame({"u": np.concatenate([a, b]),
                             "v": np.concatenate([b, a])}) \
            .drop_duplicates()

    sym = edges_ds.map_batches(sym_block,
                               batch_format="pandas").materialize()

    # per-source lookup tables (K × nodes bounded — broadcast-sized)
    lv_by_s = {s: {} for s in sources}
    for (s, n), l in level.items():
        lv_by_s[s][n] = l

    # forward σ sweep: level-(l−1) σ flows along edges into level-l
    sigma_by_s = {s: {s: 1} for s in sources}
    for l in range(1, max_depth + 1):
        cur = {s: {n: sg for n, sg in sigma_by_s[s].items()
                   if lv_by_s[s].get(n) == l - 1} for s in sources}

        def fwd(df: pd.DataFrame, _sig=cur, _lv=lv_by_s,
                _l=l) -> pd.DataFrame:
            empty = pd.DataFrame({"src": pd.Series(dtype="int64"),
                                  "node": pd.Series(dtype="int64"),
                                  "s": pd.Series(dtype="int64")})
            if df.empty:
                return empty
            u = df["u"]
            v = df["v"]
            frames = []
            for s in sources:
                su = u.map(_sig[s])
                lvv = v.map(_lv[s])
                keep = (su.notna() & (lvv == _l)).to_numpy()
                if keep.any():
                    frames.append(pd.DataFrame({
                        "src": np.int64(s),
                        "node": v.to_numpy(np.int64)[keep],
                        "s": su.to_numpy(np.float64)[keep]
                        .astype(np.int64)}))
            if not frames:
                return empty
            return pd.concat(frames, ignore_index=True) \
                .groupby(["src", "node"], sort=False).sum() \
                .reset_index()

        agg = grouped_aggregate(
            sym.map_batches(fwd, batch_format="pandas"),
            ["src", "node"], {"s": ("s", "sum")},
            num_partitions=num_partitions).to_pandas()
        if agg.empty or "src" not in agg.columns or not len(agg):
            break
        for r in agg.itertuples(index=False):
            sigma_by_s[int(r.src)][int(r.node)] = int(r.s)

    # backward δ sweep: successor dependencies flow down the levels
    delta_by_s = {s: {n: 0.0 for n in sigma_by_s[s]} for s in sources}
    for l in range(max_depth - 1, -1, -1):
        snap = {s: dict(delta_by_s[s]) for s in sources}

        def bwd(df: pd.DataFrame, _sig=sigma_by_s, _del=snap,
                _lv=lv_by_s, _l=l) -> pd.DataFrame:
            empty = pd.DataFrame({"src": pd.Series(dtype="int64"),
                                  "node": pd.Series(dtype="int64"),
                                  "d": pd.Series(dtype="float64")})
            if df.empty:
                return empty
            u = df["u"]
            v = df["v"]
            frames = []
            for s in sources:
                lvu = u.map(_lv[s])
                lvv = v.map(_lv[s])
                keep = ((lvu == _l) & (lvv == _l + 1)).to_numpy()
                if not keep.any():
                    continue
                su = u.map(_sig[s]).to_numpy(np.float64)[keep]
                sw = v.map(_sig[s]).to_numpy(np.float64)[keep]
                dw = v.map(_del[s]).to_numpy(np.float64)[keep]
                frames.append(pd.DataFrame({
                    "src": np.int64(s),
                    "node": u.to_numpy(np.int64)[keep],
                    "d": su / sw * (1.0 + dw)}))
            if not frames:
                return empty
            return pd.concat(frames, ignore_index=True) \
                .groupby(["src", "node"], sort=False).sum() \
                .reset_index()

        agg = grouped_aggregate(
            sym.map_batches(bwd, batch_format="pandas"),
            ["src", "node"], {"d": ("d", "sum")},
            num_partitions=num_partitions).to_pandas()
        upd = {s: {} for s in sources}
        if not agg.empty and "src" in agg.columns:
            for r in agg.itertuples(index=False):
                upd[int(r.src)][int(r.node)] = float(r.d)
        for s in sources:
            for n in delta_by_s[s]:
                if lv_by_s[s].get(n) == l:
                    delta_by_s[s][n] = upd[s].get(n, 0.0)

    bc = {}
    for s in sources:
        for v, d in delta_by_s[s].items():
            if v != s:
                bc[v] = bc.get(v, 0.0) + d
    node_df = grouped_aggregate(sym, ["u"], {"n": (None, "count")},
                                num_partitions=num_partitions) \
        .to_pandas()
    nodes = sorted(int(n) for n in node_df["u"])
    return pd.DataFrame({
        "node": np.asarray(nodes, dtype=np.int64),
        "bc": np.asarray([round(bc.get(n, 0.0), 6) for n in nodes],
                         dtype=np.float64)})


# --- single-source BFS levels (hop distance) ---

def bfs_levels(edges_ds, source: int, *, src: str = "a", dst: str = "b",
               undirected: bool = True, max_rounds: int = 32,
               num_partitions: int | None = None) -> pd.DataFrame:
    """Single-source BFS: (node, level) for every node reachable from
    ``source``, level = hop distance. Frontier-expansion BSP over the
    same raw-task grid as ``functions/components.py`` (and for the
    same reason — an iterative algorithm re-shuffling bounded state):

    * edges are directed (both directions when ``undirected``) and
      hash-partitioned ONCE by source endpoint ``u``;
    * the level table lives as P ``(node, level)`` blocks co-partitioned
      with the edges by ``hash(node)``, never on the driver during the
      loop;
    * round r: each partition joins its CURRENT frontier against its
      local out-edges, routes the neighbor candidates to their owners,
      and the owner absorbs only unseen nodes at level r — the new
      frontier. Empty global frontier = exact termination (every
      reachable node is labeled with its true hop distance; no level
      cap can truncate semantics below ``max_rounds``, which only
      guards pathological path graphs).

    Per-round traffic is frontier-sized, not graph-sized; the static
    edge partitions bound the join side. The driver-facing return is
    the node-count-bounded level table sorted by node (the source
    alone when it has no edges)."""
    import ray

    from jerex_ray.functions.components import (_as_returns, _part_of,
                                                _split_by)

    P = num_partitions or 8
    source = int(source)

    def _empty() -> pd.DataFrame:
        return pd.DataFrame({"node": pd.Series(dtype="int64"),
                             "level": pd.Series(dtype="int64")})

    @ray.remote
    def route_out(block: pd.DataFrame):
        e = pd.DataFrame({"u": pd.Series(dtype="int64"),
                          "v": pd.Series(dtype="int64")})
        if not block.empty and src in block.columns:
            a = block[[src, dst]].rename(columns={src: "u", dst: "v"})
            frames = [a]
            if undirected:
                frames.append(block[[dst, src]]
                              .rename(columns={dst: "u", src: "v"}))
            e = pd.concat(frames, ignore_index=True) \
                .astype({"u": "int64", "v": "int64"}).drop_duplicates()
        return _as_returns(_split_by(e, "u", P), P)

    @ray.remote
    def concat_edges(*shards):
        return pd.concat(list(shards), ignore_index=True) \
            .drop_duplicates()

    @ray.remote
    def expand(edge_part: pd.DataFrame, frontier: pd.DataFrame):
        """Frontier nodes owned here ⋈ local out-edges → neighbor
        candidates routed to their owners."""
        if frontier.empty or edge_part.empty:
            msgs = pd.DataFrame({"node": pd.Series(dtype="int64")})
        else:
            m = edge_part.merge(frontier[["node"]].drop_duplicates(),
                                left_on="u", right_on="node")
            msgs = pd.DataFrame({"node": pd.unique(m["v"])}) \
                .astype({"node": "int64"})
        return _as_returns(_split_by(msgs, "node", P), P)

    @ray.remote(num_returns=2)
    def absorb(level_part: pd.DataFrame, level: int, *msg_shards):
        """Keep only unseen candidates; they join the level table at
        ``level`` and form this partition's next frontier."""
        cand = pd.concat(list(msg_shards), ignore_index=True) \
            .drop_duplicates()
        new = cand[~cand["node"].isin(level_part["node"])]
        fresh = pd.DataFrame({"node": new["node"].to_numpy(),
                              "level": np.int64(level)}) \
            .astype({"node": "int64", "level": "int64"})
        return (pd.concat([level_part, fresh], ignore_index=True),
                fresh)

    @ray.remote
    def nrows(df: pd.DataFrame) -> int:
        return len(df)

    blocks = edges_ds.to_pandas_refs()
    routed = [route_out.options(num_returns=P).remote(b) for b in blocks]
    if P == 1:
        routed = [[r] for r in routed]
    edge_parts = [concat_edges.remote(*[r[p] for r in routed])
                  for p in range(P)]

    owner = int(_part_of(np.array([source], dtype=np.int64), P)[0])
    seed = pd.DataFrame({"node": [source], "level": [0]}) \
        .astype({"node": "int64", "level": "int64"})
    levels = [ray.put(seed if p == owner else _empty()) for p in range(P)]
    frontier = [ray.put(seed if p == owner else _empty())
                for p in range(P)]

    for r in range(1, max_rounds + 1):
        msgs = [expand.options(num_returns=P)
                .remote(edge_parts[p], frontier[p]) for p in range(P)]
        if P == 1:
            msgs = [[m] for m in msgs]
        pairs = [absorb.remote(levels[q], r,
                               *[msgs[p][q] for p in range(P)])
                 for q in range(P)]
        levels = [pr[0] for pr in pairs]
        frontier = [pr[1] for pr in pairs]
        grew = sum(ray.get([nrows.remote(f) for f in frontier]))
        if grew == 0:
            break
    else:
        import logging
        logging.getLogger(__name__).warning(
            "bfs_levels: %d rounds exhausted with a non-empty frontier "
            "— levels beyond the cap are MISSING; raise max_rounds",
            max_rounds)

    out = pd.concat(ray.get(levels), ignore_index=True)
    return out.sort_values("node").reset_index(drop=True)


def multi_bfs_levels(edges_ds, sources: list[int], *, src: str = "a",
                     dst: str = "b", undirected: bool = True,
                     max_rounds: int = 32,
                     num_partitions: int | None = None) -> pd.DataFrame:
    """K-source BFS in ONE grid pass: (source, node, level) for every
    node reachable from each of ``sources``. Same frontier-expansion
    BSP as ``bfs_levels`` — edges hash-partitioned once by ``u``,
    level state co-partitioned by ``hash(node)`` — but the frontier
    rows carry a ``source`` lane, so K centrality-style sweeps share
    one edge partitioning instead of K full reruns (the multi-source
    trick behind harmonic/closeness centrality sampling). Per-round
    traffic is (sum of K frontiers)-sized; per-partition state is
    bounded by K × nodes-owned, never on the driver during the loop."""
    import ray

    from jerex_ray.functions.components import (_as_returns, _part_of,
                                                _split_by)

    P = num_partitions or 8
    sources = sorted({int(s) for s in sources})

    def _empty() -> pd.DataFrame:
        return pd.DataFrame({"source": pd.Series(dtype="int64"),
                             "node": pd.Series(dtype="int64"),
                             "level": pd.Series(dtype="int64")})

    @ray.remote
    def route_out(block: pd.DataFrame):
        e = pd.DataFrame({"u": pd.Series(dtype="int64"),
                          "v": pd.Series(dtype="int64")})
        if not block.empty and src in block.columns:
            a = block[[src, dst]].rename(columns={src: "u", dst: "v"})
            frames = [a]
            if undirected:
                frames.append(block[[dst, src]]
                              .rename(columns={dst: "u", src: "v"}))
            e = pd.concat(frames, ignore_index=True) \
                .astype({"u": "int64", "v": "int64"}).drop_duplicates()
        return _as_returns(_split_by(e, "u", P), P)

    @ray.remote
    def concat_edges(*shards):
        return pd.concat(list(shards), ignore_index=True) \
            .drop_duplicates()

    @ray.remote
    def expand(edge_part: pd.DataFrame, frontier: pd.DataFrame):
        if frontier.empty or edge_part.empty:
            msgs = pd.DataFrame({"source": pd.Series(dtype="int64"),
                                 "node": pd.Series(dtype="int64")})
        else:
            m = edge_part.merge(
                frontier[["source", "node"]].drop_duplicates(),
                left_on="u", right_on="node")
            msgs = m[["source", "v"]].rename(columns={"v": "node"}) \
                .drop_duplicates().astype({"source": "int64",
                                           "node": "int64"})
        return _as_returns(_split_by(msgs, "node", P), P)

    @ray.remote(num_returns=2)
    def absorb(level_part: pd.DataFrame, level: int, *msg_shards):
        cand = pd.concat(list(msg_shards), ignore_index=True) \
            .drop_duplicates()
        if cand.empty:
            fresh = _empty()
        else:
            seen = cand.merge(level_part[["source", "node"]],
                              on=["source", "node"], how="left",
                              indicator=True)
            new = seen[seen["_merge"] == "left_only"]
            fresh = pd.DataFrame({"source": new["source"].to_numpy(),
                                  "node": new["node"].to_numpy(),
                                  "level": np.int64(level)}) \
                .astype({"source": "int64", "node": "int64",
                         "level": "int64"})
        return (pd.concat([level_part, fresh], ignore_index=True),
                fresh)

    @ray.remote
    def nrows(df: pd.DataFrame) -> int:
        return len(df)

    blocks = edges_ds.to_pandas_refs()
    routed = [route_out.options(num_returns=P).remote(b) for b in blocks]
    if P == 1:
        routed = [[r] for r in routed]
    edge_parts = [concat_edges.remote(*[r[p] for r in routed])
                  for p in range(P)]

    seed_all = pd.DataFrame({"source": sources, "node": sources,
                             "level": np.int64(0)}) \
        .astype({"source": "int64", "node": "int64", "level": "int64"})
    owners = _part_of(seed_all["node"].to_numpy(np.int64), P)
    levels = [ray.put(seed_all[owners == p].reset_index(drop=True))
              for p in range(P)]
    frontier = [ray.put(seed_all[owners == p].reset_index(drop=True))
                for p in range(P)]

    for r in range(1, max_rounds + 1):
        msgs = [expand.options(num_returns=P)
                .remote(edge_parts[p], frontier[p]) for p in range(P)]
        if P == 1:
            msgs = [[m] for m in msgs]
        pairs = [absorb.remote(levels[q], r,
                               *[msgs[p][q] for p in range(P)])
                 for q in range(P)]
        levels = [pr[0] for pr in pairs]
        frontier = [pr[1] for pr in pairs]
        grew = sum(ray.get([nrows.remote(f) for f in frontier]))
        if grew == 0:
            break
    else:
        import logging
        logging.getLogger(__name__).warning(
            "multi_bfs_levels: %d rounds exhausted with a non-empty "
            "frontier — levels beyond the cap are MISSING", max_rounds)

    out = pd.concat(ray.get(levels), ignore_index=True)
    return out.sort_values(["source", "node"]).reset_index(drop=True)


def sssp_distances(edges_ds, source: int, *, src: str = "a",
                   dst: str = "b", weight: str = "w",
                   undirected: bool = True, max_rounds: int = 64,
                   num_partitions: int | None = None) -> pd.DataFrame:
    """Single-source shortest paths with non-negative edge weights:
    (node, dist) for every node reachable from ``source``. The
    Bellman-Ford frontier relaxation on the same raw-task BSP grid as
    ``bfs_levels`` (an iterative algorithm re-shuffling bounded
    node-sized state — exactly what the Dataset API can't express):

    * weighted edges hash-partitioned ONCE by source endpoint, with
      parallel edges collapsed to their minimum weight;
    * the distance table lives as P ``(node, dist)`` blocks
      co-partitioned by ``hash(node)``;
    * round r: frontier ⋈ local out-edges → tentative ``dist + w``
      per neighbor, pre-reduced to the per-neighbor MIN inside the
      sender (the combiner pattern) before routing to the owner; the
      owner absorbs only strict improvements — the new frontier.
      No improvement anywhere = exact termination (Bellman-Ford
      fixpoint; every reachable node carries its true shortest
      distance).

    Per-round traffic is frontier-neighborhood-sized; with integer (or
    identically-derived float) weights the relaxation arithmetic is
    engine-exact, so results compare bit-for-bit with a recursive-CTE
    oracle. ``max_rounds`` only guards adversarial long-path graphs
    (#rounds ≤ longest shortest-path edge count) and WARNS when it
    truncates. No counterpart in the reference (SURVEY.md §2.7):
    engine extension, weighted sibling of ``bfs_levels``."""
    import ray

    from jerex_ray.functions.components import (_as_returns, _part_of,
                                                _split_by)
    P = num_partitions or 8
    source = int(source)

    def _empty() -> pd.DataFrame:
        return pd.DataFrame({"node": pd.Series(dtype="int64"),
                             "dist": pd.Series(dtype="float64")})

    @ray.remote
    def route_out(block: pd.DataFrame):
        e = pd.DataFrame({"u": pd.Series(dtype="int64"),
                          "v": pd.Series(dtype="int64"),
                          "w": pd.Series(dtype="float64")})
        if not block.empty and src in block.columns:
            a = block[[src, dst, weight]].rename(
                columns={src: "u", dst: "v", weight: "w"})
            frames = [a]
            if undirected:
                frames.append(block[[dst, src, weight]].rename(
                    columns={dst: "u", src: "v", weight: "w"}))
            e = pd.concat(frames, ignore_index=True) \
                .astype({"u": "int64", "v": "int64", "w": "float64"})
            e = e.groupby(["u", "v"], as_index=False)["w"].min()
        return _as_returns(_split_by(e, "u", P), P)

    @ray.remote
    def concat_edges(*shards):
        df = pd.concat(list(shards), ignore_index=True)
        if df.empty:
            return df
        return df.groupby(["u", "v"], as_index=False)["w"].min()

    @ray.remote
    def relax(edge_part: pd.DataFrame, frontier: pd.DataFrame):
        """Frontier ⋈ local out-edges → per-neighbor min tentative
        distance, routed to the neighbor's owner."""
        if frontier.empty or edge_part.empty:
            msgs = _empty()
        else:
            m = edge_part.merge(frontier, left_on="u", right_on="node")
            cand = pd.DataFrame({"node": m["v"].to_numpy(),
                                 "dist": m["dist"].to_numpy()
                                 + m["w"].to_numpy()})
            msgs = cand.groupby("node", as_index=False)["dist"].min() \
                .astype({"node": "int64"})
        return _as_returns(_split_by(msgs, "node", P), P)

    @ray.remote(num_returns=2)
    def absorb(dist_part: pd.DataFrame, *msg_shards):
        """Keep strict improvements; they update the distance table
        and form this partition's next frontier."""
        cand = pd.concat(list(msg_shards), ignore_index=True)
        if cand.empty:
            return dist_part, _empty()
        cand = cand.groupby("node", as_index=False)["dist"].min()
        m = cand.merge(dist_part, on="node", how="left",
                       suffixes=("", "_cur"))
        better = m["dist_cur"].isna() | (m["dist"] < m["dist_cur"])
        fresh = m.loc[better, ["node", "dist"]] \
            .astype({"node": "int64", "dist": "float64"})
        if fresh.empty:
            return dist_part, _empty()
        keep = dist_part[~dist_part["node"].isin(fresh["node"])]
        return (pd.concat([keep, fresh], ignore_index=True), fresh)

    @ray.remote
    def nrows(df: pd.DataFrame) -> int:
        return len(df)

    blocks = edges_ds.to_pandas_refs()
    routed = [route_out.options(num_returns=P).remote(b) for b in blocks]
    if P == 1:
        routed = [[r] for r in routed]
    edge_parts = [concat_edges.remote(*[r[p] for r in routed])
                  for p in range(P)]

    owner = int(_part_of(np.array([source], dtype=np.int64), P)[0])
    seed = pd.DataFrame({"node": [source], "dist": [0.0]}) \
        .astype({"node": "int64", "dist": "float64"})
    dists = [ray.put(seed if p == owner else _empty()) for p in range(P)]
    frontier = [ray.put(seed if p == owner else _empty())
                for p in range(P)]

    for _ in range(max_rounds):
        msgs = [relax.options(num_returns=P)
                .remote(edge_parts[p], frontier[p]) for p in range(P)]
        if P == 1:
            msgs = [[m] for m in msgs]
        pairs = [absorb.remote(dists[q], *[msgs[p][q] for p in range(P)])
                 for q in range(P)]
        dists = [pr[0] for pr in pairs]
        frontier = [pr[1] for pr in pairs]
        improved = sum(ray.get([nrows.remote(f) for f in frontier]))
        if improved == 0:
            break
    else:
        import logging
        logging.getLogger(__name__).warning(
            "sssp_distances: %d rounds exhausted while distances were "
            "still improving — result may be non-minimal; raise "
            "max_rounds", max_rounds)

    out = pd.concat(ray.get(dists), ignore_index=True)
    return out.sort_values("node").reset_index(drop=True)


def degree_assortativity(edges_ds, *, src: str = "a", dst: str = "b",
                         num_partitions: int | None = None) -> pd.DataFrame:
    """Newman degree assortativity (Newman '02, PRL 89.208701): the
    Pearson correlation of endpoint degrees over the DIRECTED STUBS of
    the undirected simple graph — positive r means hubs link to hubs
    (social-network shape), negative means hubs link to leaves
    (web/biology shape). A one-number corpus-health diagnostic for the
    near-dup graphs this engine builds.

    Scale shape — the naive plan joins degrees onto every edge TWICE;
    this one needs a single edge-sized co-location by exploiting stub
    symmetry. Over stubs (u,v): x = deg(u), y = deg(v), and
      Σx = Σy = Σ_u deg(u)²           (node u appears deg(u) times)
      Σx² = Σy² = Σ_u deg(u)³
      Σxy = Σ_u deg(u) · S(u),  S(u) = Σ_{v∈N(u)} deg(v)
    so the only edge-sized exchange computes S(u): stubs co-locate
    with the degree table on the NEIGHBOR endpoint, reduce to per-u
    sums. Everything after is node-sized, finishing in combiner
    partial sums — six scalars reach the driver.

    Returns one row: (n_nodes, n_edges, r) with r rounded to 6
    decimals (NaN → None when the graph is degree-regular).
    """
    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply

    edges = _canonical_edges(edges_ds, src=src, dst=dst,
                             num_partitions=num_partitions)
    stubs = _directed_edges(edges, src="a", dst="b", undirected=True)
    deg = grouped_aggregate(stubs, ["u"], {"deg": (None, "count")},
                            num_partitions=num_partitions,
                            result_hint="large").materialize()

    # one edge-sized co-location on the neighbor endpoint: stubs keyed
    # by v pick up deg(v), reduce immediately to per-u partial sums
    stub_tagged = stubs.map_batches(
        lambda b: pd.DataFrame({"node": b["v"], "u": b["u"],
                                "deg": np.int64(-1)}),
        batch_format="pandas")
    deg_tagged = deg.map_batches(
        lambda b: pd.DataFrame({"node": b["u"], "u": np.int64(-1),
                                "deg": b["deg"].astype("int64")})
        if "u" in b.columns else
        pd.DataFrame({"node": pd.Series(dtype="int64"),
                      "u": pd.Series(dtype="int64"),
                      "deg": pd.Series(dtype="int64")}),
        batch_format="pandas")

    def nbr_deg_block(block: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"u": pd.Series(dtype="int64"),
                            "s_nbr": pd.Series(dtype="float64")})
        if block.empty or "node" not in block.columns:
            return out
        d = block.loc[block["u"] == -1, ["node", "deg"]]
        s = block[block["u"] != -1]
        if s.empty or d.empty:
            return out
        m = s[["node", "u"]].merge(d, on="node")
        g = m.groupby("u", sort=False)["deg"].sum()
        return pd.DataFrame({"u": g.index.to_numpy(np.int64),
                             "s_nbr": g.to_numpy(np.float64)})

    s_nbr = grouped_apply(stub_tagged.union(deg_tagged), ["node"],
                          nbr_deg_block, num_partitions=num_partitions)
    s_nbr = grouped_aggregate(s_nbr, ["u"], {"s_nbr": ("s_nbr", "sum")},
                              num_partitions=num_partitions,
                              result_hint="large").materialize()

    # node-sized: co-locate deg(u) with S(u), emit scalar partials
    def scalar_partials(block: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"__all": pd.Series(dtype="int64"),
                            "n": pd.Series(dtype="float64"),
                            "sx": pd.Series(dtype="float64"),
                            "sxx": pd.Series(dtype="float64"),
                            "sxy": pd.Series(dtype="float64")})
        if block.empty or "u" not in block.columns:
            return out
        d = block.loc[block["s_nbr"].isna(), ["u", "deg"]]
        s = block.loc[block["s_nbr"].notna(), ["u", "s_nbr"]]
        if d.empty:
            return out
        m = d.merge(s, on="u", how="left")
        dv = m["deg"].to_numpy(np.float64)
        sn = m["s_nbr"].fillna(0.0).to_numpy(np.float64)
        return pd.DataFrame({"__all": [np.int64(0)],
                             "n": [dv.sum()],
                             "sx": [(dv * dv).sum()],
                             "sxx": [(dv ** 3).sum()],
                             "sxy": [(dv * sn).sum()]})

    deg_u = deg.map_batches(
        lambda b: pd.DataFrame({"u": b["u"],
                                "deg": b["deg"].astype("int64"),
                                "s_nbr": np.float64(np.nan)})
        if "u" in b.columns else
        pd.DataFrame({"u": pd.Series(dtype="int64"),
                      "deg": pd.Series(dtype="int64"),
                      "s_nbr": pd.Series(dtype="float64")}),
        batch_format="pandas")
    s_u = s_nbr.map_batches(
        lambda b: pd.DataFrame({"u": b["u"], "deg": np.int64(-1),
                                "s_nbr": b["s_nbr"].astype("float64")})
        if "u" in b.columns else
        pd.DataFrame({"u": pd.Series(dtype="int64"),
                      "deg": pd.Series(dtype="int64"),
                      "s_nbr": pd.Series(dtype="float64")}),
        batch_format="pandas")

    joined = grouped_apply(deg_u.union(s_u), ["u"],
                           lambda b: b, num_partitions=num_partitions)
    m = grouped_aggregate(
        joined.map_batches(scalar_partials, batch_format="pandas",
                           batch_size=None),
        ["__all"],
        {k: (k, "sum") for k in ("n", "sx", "sxx", "sxy")}).to_pandas()
    n_edges = int(edges.count())
    n_nodes = int(deg.count())
    if m.empty:
        return pd.DataFrame({"n_nodes": [0], "n_edges": [0],
                             "r": [None]})
    row = m.iloc[0]
    n = float(row["n"])                     # #stubs = 2·#edges
    cov = row["sxy"] - row["sx"] * row["sx"] / n
    var = row["sxx"] - row["sx"] ** 2 / n   # Σx²−(Σx)²/n, x and y alike
    r = cov / var if var > 0 else float("nan")
    return pd.DataFrame({"n_nodes": [np.int64(n_nodes)],
                         "n_edges": [np.int64(n_edges)],
                         "r": [None if np.isnan(r)
                               else round(float(r), 6)]})


def hits(pairs_ds, *, hub_col: str, auth_col: str, iters: int = 4,
         num_partitions: int | None = None) -> pd.DataFrame:
    """HITS hubs & authorities (Kleinberg '99) over a bipartite
    incidence Dataset — which customers are broad buyers (hubs) and
    which items are broadly bought (authorities).

    Power iteration of A·Aᵀ expressed Ray-Data-first, same shape as
    :func:`pagerank`'s broadcast mode: the distinct incidence table
    materializes ONCE (combiner-reduced), each half-step broadcasts
    the node-sized score vector via ``ray.put`` and streams the edges
    through ``map_batches`` emitting per-destination PARTIAL sums that
    a grouped combiner finishes — per iteration only node-sized state
    moves.

    Parity-by-construction: iterations run UNNORMALIZED (scale factors
    out of the power direction), so with h₀ = 1 every intermediate
    score is an exact INTEGER in float64 — the SQL chained-CTE oracle
    reproduces them bit-for-bit regardless of summation order — and
    only the FINAL L1 normalization divides (both sides round to 6
    decimals). The op guards the 2⁵³ exact-integer ceiling and raises
    rather than silently losing parity on deeper iterations.

    The reference has no graph algorithms (SURVEY.md §2.7); engine
    extension for the LLM-data charter.
    """
    import ray

    from jerex_ray.functions.aggregate import grouped_aggregate

    edges = grouped_aggregate(pairs_ds, [hub_col, auth_col],
                              {"n": (None, "count")},
                              num_partitions=num_partitions) \
        .drop_columns(["n"]).materialize()

    EMPTY = pd.DataFrame({"side": pd.Series(dtype="object"),
                          "node": pd.Series(dtype="int64"),
                          "score": pd.Series(dtype="float64")})
    hubs_df = grouped_aggregate(edges, [hub_col],
                                {"d": (None, "count")},
                                num_partitions=num_partitions).to_pandas()
    if hubs_df.empty or hub_col not in hubs_df.columns:
        return EMPTY

    def half_step(scores: dict, src: str, dst: str) -> dict:
        """dst_score(v) = Σ_{(u,v)∈E} src_score(u), distributed."""
        ref = ray.put(scores)

        def contrib(df: pd.DataFrame) -> pd.DataFrame:
            sc = ray.get(ref)
            w = df[src].map(sc).to_numpy(np.float64)
            part = (pd.DataFrame({"v": df[dst].to_numpy(), "w": w})
                    .groupby("v", sort=False)["w"].sum())
            return pd.DataFrame({"v": part.index.to_numpy(),
                                 "w": part.to_numpy()})

        out = grouped_aggregate(
            edges.map_batches(contrib, batch_format="pandas"),
            ["v"], {"s": ("w", "sum")},
            num_partitions=num_partitions).to_pandas()
        vals = out["s"].to_numpy(np.float64)
        if vals.size and np.max(vals) >= 2.0 ** 53:
            raise OverflowError(
                "hits: unnormalized scores left the exact-integer "
                "float64 range; reduce iters")
        return dict(zip(out["v"], vals))

    h = dict.fromkeys(hubs_df[hub_col], 1.0)
    a: dict = {}
    for _ in range(iters):
        a = half_step(h, hub_col, auth_col)
        h = half_step(a, auth_col, hub_col)

    def norm_rows(scores: dict, side: str) -> pd.DataFrame:
        nodes = np.array(sorted(scores))
        vals = np.array([scores[n] for n in nodes], dtype=np.float64)
        return pd.DataFrame({"side": side, "node": nodes,
                             "score": np.round(vals / vals.sum(), 6)})

    out = pd.concat([norm_rows(a, "auth"), norm_rows(h, "hub")],
                    ignore_index=True)
    return out.sort_values(["side", "node"]).reset_index(drop=True)


def bellman_ford_sssp(edges_ds, source: int, *, src: str = "a",
                      dst: str = "b", weight: str = "w",
                      undirected: bool = True, max_rounds: int = 64,
                      num_partitions: int | None = None) -> pd.DataFrame:
    """Single-source shortest paths with non-negative INTEGER edge
    weights (Bellman-Ford, synchronized-relaxation form — the
    weighted sibling of ``bfs_levels``): (node, dist) for every node
    reachable from ``source``, dist = exact integer weight of the
    cheapest path. Same BSP grid as ``bfs_levels``:

    * weighted edges hash-partitioned ONCE by source endpoint ``u``
      (both directions when ``undirected``);
    * the dist table lives as P (node, dist) blocks co-partitioned by
      ``hash(node)``, never on the driver during the loop;
    * round r: nodes IMPROVED last round join their local out-edges,
      candidate (v, dist_u + w) rows route to their owners, the owner
      keeps per-node minima and absorbs only strict improvements —
      the next frontier. Empty global frontier = fixpoint (exact
      distances; the monotone lattice makes the result independent of
      round count past convergence, which is what lets a fixed-depth
      SQL replay oracle match it).

    Per-round traffic is (improved frontier × out-degree)-sized.
    Integer dist arithmetic ⇒ no float accumulation-order hazard.
    Raises past ``max_rounds`` (an unconverged dist table is NOT a
    shortest-path table — the loud-cap contract of ``ktruss``).
    Returns the node-bounded (node, dist) table sorted by node, and
    the convergence round count as an attribute column ``rounds``
    (constant — handy for oracle-depth assertions)."""
    import ray

    from jerex_ray.functions.components import (_as_returns, _part_of,
                                                _split_by)

    P = num_partitions or 8
    source = int(source)

    def _empty() -> pd.DataFrame:
        return pd.DataFrame({"node": pd.Series(dtype="int64"),
                             "dist": pd.Series(dtype="int64")})

    @ray.remote
    def route_out(block: pd.DataFrame):
        e = pd.DataFrame({"u": pd.Series(dtype="int64"),
                          "v": pd.Series(dtype="int64"),
                          "w": pd.Series(dtype="int64")})
        if not block.empty and src in block.columns:
            a = block[[src, dst, weight]].rename(
                columns={src: "u", dst: "v", weight: "w"})
            frames = [a]
            if undirected:
                frames.append(block[[dst, src, weight]].rename(
                    columns={dst: "u", src: "v", weight: "w"}))
            e = pd.concat(frames, ignore_index=True).astype(
                {"u": "int64", "v": "int64", "w": "int64"})
            # parallel edges: only the lightest can ever relax
            e = e.groupby(["u", "v"], sort=False, as_index=False)["w"].min()
        return _as_returns(_split_by(e, "u", P), P)

    @ray.remote
    def concat_edges(*shards):
        df = pd.concat(list(shards), ignore_index=True)
        if df.empty:
            return df
        return df.groupby(["u", "v"], sort=False, as_index=False)["w"].min()

    @ray.remote
    def relax(edge_part: pd.DataFrame, frontier: pd.DataFrame):
        """Improved nodes owned here ⋈ local out-edges → candidate
        (v, dist_u + w) routed to owners, pre-min'd per target."""
        if frontier.empty or edge_part.empty:
            msgs = pd.DataFrame({"node": pd.Series(dtype="int64"),
                                 "dist": pd.Series(dtype="int64")})
        else:
            m = edge_part.merge(frontier, left_on="u", right_on="node")
            cand = pd.DataFrame({"node": m["v"].to_numpy(np.int64),
                                 "dist": (m["dist"] + m["w"])
                                 .to_numpy(np.int64)})
            msgs = cand.groupby("node", sort=False,
                                as_index=False)["dist"].min()
        return _as_returns(_split_by(msgs, "node", P), P)

    @ray.remote(num_returns=2)
    def absorb(dist_part: pd.DataFrame, *msg_shards):
        """Keep strict improvements; they update the dist table and
        form this partition's next frontier."""
        cand = pd.concat(list(msg_shards), ignore_index=True)
        if cand.empty:
            return dist_part, _empty()
        cand = cand.groupby("node", sort=False,
                            as_index=False)["dist"].min()
        m = cand.merge(dist_part, on="node", how="left",
                       suffixes=("", "_old"))
        better = m["dist_old"].isna() | (m["dist"] < m["dist_old"])
        fresh = m.loc[better, ["node", "dist"]].astype(
            {"node": "int64", "dist": "int64"})
        if fresh.empty:
            return dist_part, _empty()
        keep = dist_part[~dist_part["node"].isin(fresh["node"])]
        return (pd.concat([keep, fresh], ignore_index=True),
                fresh)

    @ray.remote
    def nrows(df: pd.DataFrame) -> int:
        return len(df)

    blocks = edges_ds.to_pandas_refs()
    routed = [route_out.options(num_returns=P).remote(b) for b in blocks]
    if P == 1:
        routed = [[r] for r in routed]
    edge_parts = [concat_edges.remote(*[r[p] for r in routed])
                  for p in range(P)]

    owner = int(_part_of(np.array([source], dtype=np.int64), P)[0])
    seed = pd.DataFrame({"node": [source], "dist": [0]}).astype(
        {"node": "int64", "dist": "int64"})
    dists = [ray.put(seed if p == owner else _empty()) for p in range(P)]
    frontier = [ray.put(seed if p == owner else _empty())
                for p in range(P)]

    converged_round = None
    for r in range(1, max_rounds + 1):
        msgs = [relax.options(num_returns=P)
                .remote(edge_parts[p], frontier[p]) for p in range(P)]
        if P == 1:
            msgs = [[m] for m in msgs]
        pairs = [absorb.remote(dists[q], *[msgs[p][q] for p in range(P)])
                 for q in range(P)]
        dists = [pr[0] for pr in pairs]
        frontier = [pr[1] for pr in pairs]
        grew = sum(ray.get([nrows.remote(f) for f in frontier]))
        if grew == 0:
            converged_round = r
            break
    if converged_round is None:
        raise RuntimeError(
            f"bellman_ford_sssp: no fixpoint within {max_rounds} rounds "
            "— distances are NOT shortest paths; raise max_rounds")

    out = pd.concat(ray.get(dists), ignore_index=True)
    out = out.sort_values("node").reset_index(drop=True)
    out["rounds"] = np.int64(converged_round)
    return out


def katz_bipartite(pairs_ds, *, u_col: str, v_col: str,
                   iters: int = 4, alpha_denom: int = 4,
                   num_partitions: int | None = None) -> pd.DataFrame:
    """Katz centrality (Katz '53) on the undirected bipartite
    incidence graph, kept EXACT: with attenuation α = 1/alpha_denom,
    clearing denominators gives katz_scaled(i) = Σ_{k=1..K}
    alpha_denom^{K−k} · (A^k 1)_i — integer walk counts times integer
    weights, so summation order never matters and the chained-CTE SQL
    oracle matches bit-for-bit. Same broadcast-SpMV dataflow as
    :func:`hits`: the distinct incidence materializes once
    (combiner-reduced); each iteration broadcasts the node-sized
    score vector via ``ray.put`` and streams the edges once per
    direction, combiner-reducing per-destination partials — only
    node-sized state moves per round. Guards the 2^53 exact-integer
    float64 ceiling. Returns (side, node, katz_scaled) for every
    node, side ∈ {u_col, v_col}."""
    import ray

    from jerex_ray.functions.aggregate import grouped_aggregate

    edges = grouped_aggregate(pairs_ds, [u_col, v_col],
                              {"n": (None, "count")},
                              num_partitions=num_partitions) \
        .drop_columns(["n"]).materialize()
    EMPTY = pd.DataFrame({"side": pd.Series(dtype="object"),
                          "node": pd.Series(dtype="int64"),
                          "katz_scaled": pd.Series(dtype="int64")})
    u_nodes = grouped_aggregate(edges, [u_col],
                                {"d": (None, "count")},
                                num_partitions=num_partitions) \
        .to_pandas()
    if u_nodes.empty or u_col not in u_nodes.columns:
        return EMPTY
    v_nodes = grouped_aggregate(edges, [v_col],
                                {"d": (None, "count")},
                                num_partitions=num_partitions) \
        .to_pandas()

    def half_step(scores: dict, src: str, dst: str) -> dict:
        ref = ray.put(scores)

        def contrib(df: pd.DataFrame) -> pd.DataFrame:
            sc = ray.get(ref)
            w = df[src].map(sc).to_numpy(np.float64)
            part = (pd.DataFrame({"v": df[dst].to_numpy(), "w": w})
                    .groupby("v", sort=False)["w"].sum())
            return pd.DataFrame({"v": part.index.to_numpy(),
                                 "w": part.to_numpy()})

        out = grouped_aggregate(
            edges.map_batches(contrib, batch_format="pandas"),
            ["v"], {"s": ("w", "sum")},
            num_partitions=num_partitions).to_pandas()
        vals = out["s"].to_numpy(np.float64)
        if vals.size and np.max(vals) >= 2.0 ** 53:
            raise OverflowError(
                "katz: walk counts left the exact-integer float64 "
                "range; reduce iters or raise alpha_denom")
        return dict(zip(out["v"], vals))

    su = dict.fromkeys(u_nodes[u_col], 1.0)
    sv = dict.fromkeys(v_nodes[v_col], 1.0)
    acc_u = dict.fromkeys(su, 0.0)
    acc_v = dict.fromkeys(sv, 0.0)
    for k in range(1, iters + 1):
        new_u = half_step(sv, v_col, u_col)
        new_v = half_step(su, u_col, v_col)
        su, sv = new_u, new_v
        w = float(alpha_denom ** (iters - k))
        for n, s in su.items():
            acc_u[n] += w * s
        for n, s in sv.items():
            acc_v[n] += w * s
        if max(max(acc_u.values(), default=0.0),
               max(acc_v.values(), default=0.0)) >= 2.0 ** 53:
            raise OverflowError("katz: accumulated scores left the "
                                "exact-integer float64 range")

    def rows(acc: dict, side: str) -> pd.DataFrame:
        nodes = np.array(sorted(acc))
        return pd.DataFrame({
            "side": side, "node": nodes,
            "katz_scaled": np.array([acc[n] for n in nodes],
                                    dtype=np.float64)
            .astype(np.int64)})

    out = pd.concat([rows(acc_u, u_col), rows(acc_v, v_col)],
                    ignore_index=True)
    return out.sort_values(["side", "node"]).reset_index(drop=True)


def deterministic_walks(edges_ds, *, src: str = "a", dst: str = "b",
                        walks: int = 2, length: int = 3,
                        seed_prefix: str = "walk",
                        num_partitions: int | None = None) -> pd.DataFrame:
    """DeepWalk-style random-walk corpus (Perozzi et al. '14) with
    DERANDOMIZED hops: from every graph node, ``walks`` walks of
    ``length`` steps where step s picks neighbor rank
    md5(prefix|start|walk|s|cur) % deg(cur) over the
    sorted-ascending adjacency — deterministic, shard-independent,
    and exactly replayable by a SQL oracle (the md5-seeded twin of
    the engine's seeded-sampling convention, SURVEY.md §2.5).

    Dataflow: undirected adjacency with per-node neighbor ranks and
    degrees builds once via a hash co-location; each step joins the
    node-sized frontier to the degree table (computes the pick), then
    equi-joins (cur, pick)=(u, rank) into the adjacency — no
    neighborhood blow-up ever materializes. Per step only
    frontier-sized state moves. Returns (start, walk, step, node)
    rows for steps 0..length."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.runtime import shuffle_partitions
    from jerex_ray.util import md5_hash64_batch

    def both(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "u": np.r_[df[src].to_numpy(np.int64),
                       df[dst].to_numpy(np.int64)],
            "nbr": np.r_[df[dst].to_numpy(np.int64),
                         df[src].to_numpy(np.int64)]})

    def rank_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({
                "u": pd.Series(dtype="int64"),
                "nbr": pd.Series(dtype="int64"),
                "rank": pd.Series(dtype="int64"),
                "deg": pd.Series(dtype="int64")})
        d = df.sort_values(["u", "nbr"]).drop_duplicates()
        g = d.groupby("u", sort=False)["nbr"]
        return pd.DataFrame({
            "u": d["u"].to_numpy(np.int64),
            "nbr": d["nbr"].to_numpy(np.int64),
            "rank": g.cumcount().to_numpy(np.int64),
            "deg": g.transform("size").to_numpy(np.int64)})

    adj = grouped_apply(edges_ds.map_batches(
        both, batch_format="pandas", batch_size=65536),
        ["u"], rank_block,
        num_partitions=num_partitions).materialize()
    deg = adj.map_batches(
        lambda df: df.loc[df["rank"] == 0, ["u", "deg"]],
        batch_format="pandas").materialize()

    starts = deg.map_batches(
        lambda df: pd.DataFrame({
            "start": np.repeat(df["u"].to_numpy(np.int64), walks),
            "walk": np.tile(np.arange(walks, dtype=np.int64),
                            len(df)),
        }).assign(cur=lambda x: x["start"]),
        batch_format="pandas").materialize()

    out_steps = [starts.to_pandas().assign(step=np.int64(0))]
    frontier = starts
    np_ = shuffle_partitions(num_partitions or 8)
    for step in range(1, length + 1):
        with_deg = frontier.join(
            deg, join_type="inner", num_partitions=np_,
            on=("cur",), right_on=("u",)).materialize()

        def pick(df: pd.DataFrame, *, _s=step) -> pd.DataFrame:
            key = (seed_prefix + "|"
                   + df["start"].astype("int64").astype(str)
                   + "|" + df["walk"].astype("int64").astype(str)
                   + f"|{_s}|"
                   + df["cur"].astype("int64").astype(str))
            h = md5_hash64_batch(key.to_numpy())
            dg = df["deg"].to_numpy(np.int64).astype(np.uint64)
            return pd.DataFrame({
                "start": df["start"].astype("int64"),
                "walk": df["walk"].astype("int64"),
                "cur": df["cur"].astype("int64"),
                "pick": (h % dg).astype(np.int64)})

        picked = with_deg.map_batches(
            pick, batch_format="pandas").materialize()
        stepped = picked.join(
            adj, join_type="inner", num_partitions=np_,
            on=("cur", "pick"), right_on=("u", "rank")).materialize()
        frontier = stepped.map_batches(
            lambda df: pd.DataFrame({
                "start": df["start"].astype("int64"),
                "walk": df["walk"].astype("int64"),
                "cur": df["nbr"].astype("int64")}),
            batch_format="pandas").materialize()
        out_steps.append(frontier.to_pandas()
                         .assign(step=np.int64(step)))

    out = pd.concat(out_steps, ignore_index=True) \
        .rename(columns={"cur": "node"})
    out = out[["start", "walk", "step", "node"]] \
        .astype("int64")
    return out.sort_values(["start", "walk", "step"]) \
        .reset_index(drop=True)


def boruvka_mst(edges_ds, *, src: str = "a", dst: str = "b",
                weight: str = "w",
                max_rounds: int = 8) -> pd.DataFrame:
    """Minimum spanning forest by synchronized Borůvka rounds
    (Borůvka 1926 — the log-round component-hooking MST algorithm
    that parallel/distributed engines actually run, cf. GHS '83).
    The effective edge weight is the lexicographic key
    ``(w, a, b)`` — a strict total order, so the MSF is UNIQUE and
    equal to Kruskal's under the same key (classic distinct-weights
    uniqueness argument), which is what lets both a serial-Kruskal
    pytest and a round-replay SQL oracle pin the exact edge set.

    Dataflow per round (≤ ⌈log₂ n⌉ rounds total):

    * the node-bounded component labeling rides the object store via
      one ``ray.put``; ONE streaming pass over the (never-moving)
      edge Dataset maps endpoints to components, keeps cross edges,
      and emits per-component lexmin PARTIALS per block — the
      combiner shape, nothing edge-sized ever reaches the driver;
    * the driver reduces the (components × blocks)-bounded partials
      to each component's true minimum outgoing edge, dedupes the
      chosen set (an edge picked from both sides joins once), and
      contracts: hook edges between components close under a
      min-label union-find on the component-bounded table;
    * chosen edges are recorded with their round — the round replay
      is part of the oracle contract.

    Empty cross-edge set = the forest is complete. Raises past
    ``max_rounds`` (an unfinished contraction is NOT a spanning
    forest — the loud-cap contract of ``ktruss``). Returns
    (a, b, w, round) sorted by (a, b); per component the edge count
    is n_nodes − 1 (pytest-pinned)."""
    import ray

    cols = [src, dst, weight]
    EMPTY = pd.DataFrame({"a": pd.Series(dtype="int64"),
                          "b": pd.Series(dtype="int64"),
                          "w": pd.Series(dtype="int64"),
                          "round": pd.Series(dtype="int64")})

    edges = edges_ds.materialize()
    nodes_df = edges.map_batches(
        lambda df: pd.DataFrame({"u": np.unique(np.r_[
            df[src].to_numpy(np.int64), df[dst].to_numpy(np.int64)])})
        if src in df.columns and len(df) else
        pd.DataFrame({"u": pd.Series(dtype="int64")}),
        batch_format="pandas").to_pandas()
    if nodes_df.empty or "u" not in nodes_df.columns:
        return EMPTY
    nodes = np.unique(nodes_df["u"].to_numpy(np.int64))
    comp = dict(zip((int(u) for u in nodes), (int(u) for u in nodes)))

    chosen_rounds: list[pd.DataFrame] = []
    converged = None
    for rnd in range(1, max_rounds + 1):
        ref = ray.put(comp)

        def partial_min(df: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame({
                "c": pd.Series(dtype="int64"),
                "w": pd.Series(dtype="int64"),
                "a": pd.Series(dtype="int64"),
                "b": pd.Series(dtype="int64"),
                "ca": pd.Series(dtype="int64"),
                "cb": pd.Series(dtype="int64")})
            if df.empty or src not in df.columns:
                return empty
            lab = ray.get(ref)
            a = df[src].to_numpy(np.int64)
            b = df[dst].to_numpy(np.int64)
            w = df[weight].to_numpy(np.int64)
            ca = pd.Series(a).map(lab).to_numpy(np.int64)
            cb = pd.Series(b).map(lab).to_numpy(np.int64)
            keep = ca != cb
            if not keep.any():
                return empty
            base = pd.DataFrame({"w": w[keep], "a": a[keep],
                                 "b": b[keep], "ca": ca[keep],
                                 "cb": cb[keep]})
            both = pd.concat([base.assign(c=base["ca"]),
                              base.assign(c=base["cb"])],
                             ignore_index=True)
            both = both.sort_values(["c", "w", "a", "b"],
                                    kind="mergesort")
            return both.drop_duplicates("c")[
                ["c", "w", "a", "b", "ca", "cb"]].reset_index(drop=True)

        partials = edges.map_batches(
            partial_min, batch_format="pandas").to_pandas()
        if partials.empty or "c" not in partials.columns or \
                not len(partials):
            converged = rnd
            break
        best = partials.sort_values(["c", "w", "a", "b"],
                                    kind="mergesort") \
            .drop_duplicates("c")
        chosen = best.drop_duplicates(["a", "b"]) \
            .sort_values(["a", "b"]).reset_index(drop=True)
        chosen_rounds.append(
            chosen[["a", "b", "w"]].assign(round=np.int64(rnd)))

        # contract: min-label union-find over the hook edges
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:
                parent[x], x = r, parent[x]
            return r

        for ca_, cb_ in zip(chosen["ca"], chosen["cb"]):
            ra, rb = find(int(ca_)), find(int(cb_))
            if ra != rb:            # min label becomes the root
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        remap = {c: find(c) for c in set(parent)}
        comp = {n: remap.get(c, c) for n, c in comp.items()}

    if converged is None:
        raise RuntimeError(
            f"boruvka_mst: contraction incomplete after {max_rounds} "
            "rounds — the edge set is NOT a spanning forest; raise "
            "max_rounds")
    if not chosen_rounds:
        return EMPTY
    out = pd.concat(chosen_rounds, ignore_index=True) \
        .astype({"a": "int64", "b": "int64", "w": "int64",
                 "round": "int64"})
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def scc_condensation(nodes, edges) -> pd.DataFrame:
    """Strongly connected components + condensation layering of a
    directed graph (iterative Tarjan '72). Driver-side by design —
    callers feed it VOCABULARY-BOUNDED graphs (event-type flows,
    state machines) whose node count is metadata-sized; corpus-scale
    component problems go through the BSP grid in
    ``functions/components.py`` instead.

    Returns DataFrame[node, scc_id, scc_size, layer] sorted by node:
    ``scc_id`` = lexicographically smallest member (deterministic),
    ``layer`` = length of the longest condensation-DAG path ENDING
    at the node's SCC (sources are 0) — computed in the reverse
    topological order Tarjan emits for free."""
    nodes = sorted(nodes)
    adj: dict = {t: [] for t in nodes}
    for u, v in edges:
        adj[u].append(v)

    index: dict = {}
    low: dict = {}
    on_stack: set = set()
    stack: list = []
    sccs: list[list] = []
    counter = [0]

    def strongconnect(root) -> None:
        work = [(root, 0)]
        while work:
            v, pi = work.pop()
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            recurse = False
            nbrs = adj[v]
            for i in range(pi, len(nbrs)):
                w = nbrs[i]
                if w not in index:
                    work.append((v, i + 1))
                    work.append((w, 0))
                    recurse = True
                    break
                if w in on_stack:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                sccs.append(comp)
            if work:
                u = work[-1][0]
                low[u] = min(low[u], low[v])

    for t in nodes:
        if t not in index:
            strongconnect(t)

    scc_of = {t: min(comp) for comp in sccs for t in comp}
    size_of = {min(comp): len(comp) for comp in sccs}
    cedges: set = set()
    for u in nodes:
        for v in adj[u]:
            if scc_of[u] != scc_of[v]:
                cedges.add((scc_of[u], scc_of[v]))
    # Tarjan emits SCCs in REVERSE topological order of the
    # condensation, so the forward sweep below sees every
    # predecessor's final layer before extending it.
    layer = {min(comp): 0 for comp in sccs}
    for comp in reversed(sccs):
        c = min(comp)
        for (u, v) in cedges:
            if u == c:
                layer[v] = max(layer[v], layer[c] + 1)
    return pd.DataFrame({
        "node": nodes,
        "scc_id": [scc_of[t] for t in nodes],
        "scc_size": np.array([size_of[scc_of[t]] for t in nodes],
                             dtype=np.int64),
        "layer": np.array([layer[scc_of[t]] for t in nodes],
                          dtype=np.int64),
    }).sort_values("node").reset_index(drop=True)


def greedy_coloring(edges: pd.DataFrame, *, src: str = "a",
                    dst: str = "b") -> pd.DataFrame:
    """Greedy sequential graph coloring in Welsh–Powell order
    (Welsh & Powell '67): nodes ranked (degree DESC, node ASC), each
    assigned the smallest color absent from its already-colored
    neighbors (mex). Guarantees ≤ Δ+1 colors; fully deterministic —
    pure integer structure, zero arithmetic, so a per-step SQL
    recursion replays every pick. Runs on a DRIVER-SIDE edge frame
    (the thresholded/metadata-sized graph contract of the
    bridges/articulation audits); corpus-scale graphs take the
    BSP/Luby-MIS family instead."""
    if edges.empty:
        return pd.DataFrame({"node": pd.Series(dtype="int64"),
                             "color": pd.Series(dtype="int64")})
    adj: dict[int, set[int]] = {}
    for a, b in zip(edges[src], edges[dst]):
        a, b = int(a), int(b)
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    order = sorted(adj, key=lambda v: (-len(adj[v]), v))
    color: dict[int, int] = {}
    for v in order:
        used = {color[u] for u in adj[v] if u in color}
        c = 0
        while c in used:
            c += 1
        color[v] = c
    out = pd.DataFrame(sorted(color.items()),
                       columns=["node", "color"])
    return out.astype({"node": "int64", "color": "int64"})


def simrank_fixed_point(edges: pd.DataFrame, *, rounds: int = 3,
                        scale: int = 1_000_000, src: str = "a",
                        dst: str = "b") -> pd.DataFrame:
    """SimRank (Jeh & Widom '02) on an undirected graph in EXACT
    integer fixed-point arithmetic — "two objects are similar if
    their neighbors are similar", the structural-similarity
    companion of Adamic-Adar (which only sees distance-2): with
    C = 4/5 and scores scaled by ``scale``, every round is

        S' = (4 · A·S·Aᵀ) // (5 · deg_a · deg_b),   S'(a,a) = scale

    — an integer matrix product, an integer floor division and a
    diagonal reset, so every round replays bit-for-bit in the
    generated per-round SQL oracle (int64 sums are order-free; no
    float appears until the final display division). Floor-quantized
    SimRank underestimates the real-valued fixed point by < rounds /
    scale per entry. Returns pairs a < b with nonzero similarity.

    Scale shape: the graph arrives metadata-sized from the
    ≥ min_cocount streaming combiner; the O(rounds · n · m) matrix
    recursion is driver-side by design (SimRank state is inherently
    O(n²) — corpus-scale graphs take the sampled random-walk
    estimator instead)."""
    cols = {"node_a": "int64", "node_b": "int64",
            "simrank_fp": "int64", "simrank": "float64"}
    if edges.empty or src not in edges.columns:
        return pd.DataFrame({c: pd.Series(dtype=t)
                             for c, t in cols.items()})
    a = edges[src].to_numpy(np.int64)
    b = edges[dst].to_numpy(np.int64)
    nodes = np.unique(np.r_[a, b])
    n = len(nodes)
    pos = {int(u): i for i, u in enumerate(nodes)}
    A = np.zeros((n, n), dtype=np.int64)
    for u, v in zip(a, b):
        A[pos[int(u)], pos[int(v)]] = 1
        A[pos[int(v)], pos[int(u)]] = 1
    deg = A.sum(axis=1)
    if int(deg.max()) ** 2 * scale * 4 >= 2 ** 63:
        # hard error (not assert: must survive python -O) — the int64
        # matmul would silently wrap past this bound
        raise ValueError("simrank: fixed-point overflow "
                         f"(max degree {int(deg.max())}, scale {scale})")
    dd = 5 * np.outer(deg, deg)
    S = np.zeros((n, n), dtype=np.int64)
    np.fill_diagonal(S, scale)
    for _ in range(rounds):
        S = (4 * (A @ S @ A)) // dd
        np.fill_diagonal(S, scale)
    iu, ju = np.triu_indices(n, k=1)
    keep = S[iu, ju] > 0
    iu, ju = iu[keep], ju[keep]
    s = S[iu, ju]
    out = pd.DataFrame({
        "node_a": nodes[iu], "node_b": nodes[ju],
        "simrank_fp": s, "simrank": np.round(s / float(scale), 6)})
    return out.sort_values(["node_a", "node_b"]) \
        .reset_index(drop=True).astype(cols)
