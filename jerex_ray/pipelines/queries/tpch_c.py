"""Split of the query registry: ``tpch_c`` part (mechanically derived from the original queries.py by scripts/split_queries.py; unit order and source text preserved)."""

from __future__ import annotations
import re
import numpy as np
import pandas as pd
from jerex_ray.config import PipelineConfig
from jerex_ray.runtime import configure_data_context
from jerex_ray.pipelines.queries._shared import ORACLE_REGISTRY
from jerex_ray.pipelines.queries._shared import _repeat_copurchase_edges, _round_half_away  # noqa: E501

_ADABOOST_CANDS: list[tuple[int, int, int, int]] = [
    (cid + 1, feat, thr, pol)
    for cid, (feat, thr, pol) in enumerate(
        (f, t, p)
        for f, thrs in ((1, (10, 20, 30, 40, 50)),
                        (2, (2, 4, 6, 8, 10)))
        for t in thrs for p in (1, -1))]

def q_lineitem_adaboost(sf_dir: str, *, rounds: int = 3):
    """AdaBoost over decision stumps (Freund & Schapire '97) —
    the boosting completion of the ensemble family beside the
    single ``q_events_best_split`` stump — predicting returned
    lineitems (y = +1 iff l_returnflag = 'R') from quantity and
    discount-cent thresholds, kept BIT-DETERMINISTIC by the
    correctness-class trick: after t−1 rounds every row's weight is
    one of 2^{t−1} class scalars w_c = Π exp(±αₛ) (c = the
    correct/wrong bitmask), so each candidate stump's weighted error
    is an EXPLICIT fixed-order expression
    (w₀·nw₀ + w₁·nw₁ + …) / (w₀·n₀ + …) of exact integer counts —
    the identical float64 tree on both engines, making every argmin
    pick (err ASC, cand ASC) and every αₜ = ½·ln((1−e)/e)
    bit-replayable by the generated per-round CTE oracle.

    Scale shape: ONE combiner pass per round — per-block
    (cand × class) wrong/total integer partials (stateless
    class-bitmask recompute under the broadcast picked stumps, the
    Gonzalez convention); the candidate-grid argmin and α update are
    metadata-sized driver work. Nothing row-sized ever collects."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_discount", "l_returnflag"])
    picked: list[tuple[int, int, int, int, float, float]] = []
    for t in range(1, rounds + 1):
        prior = [(f, th, pl, al)
                 for (_, f, th, pl, _, al) in picked]

        def counts(df: pd.DataFrame,
                   _prior=tuple(prior)) -> pd.DataFrame:
            cols = {"cand": pd.Series(dtype="int64"),
                    "cls": pd.Series(dtype="int64"),
                    "n": pd.Series(dtype="int64")}
            if df.empty:
                return pd.DataFrame(cols)
            q = df["l_quantity"].to_numpy(np.float64) \
                .astype(np.int64)
            d = np.floor(np.abs(df["l_discount"]
                                .to_numpy(np.float64))
                         * 100.0 + 0.5).astype(np.int64)
            y = np.where(df["l_returnflag"].to_numpy() == "R",
                         1, -1).astype(np.int64)
            c = np.zeros(len(q), dtype=np.int64)
            for s, (f, th, pl, _) in enumerate(_prior):
                fv = q if f == 1 else d
                pred = np.where(fv <= th, pl, -pl)
                c += (pred == y).astype(np.int64) << s
            rows = []
            cls_u, n_u = np.unique(c, return_counts=True)
            rows += [(0, int(cc), int(nn))
                     for cc, nn in zip(cls_u, n_u)]
            for (ci, f, th, pl) in _ADABOOST_CANDS:
                fv = q if f == 1 else d
                pred = np.where(fv <= th, pl, -pl)
                cw, nw = np.unique(c[pred != y],
                                   return_counts=True)
                rows += [(ci, int(cc), int(nn))
                         for cc, nn in zip(cw, nw)]
            return pd.DataFrame(rows,
                                columns=["cand", "cls", "n"])

        agg = grouped_aggregate(
            ds.map_batches(counts, batch_format="pandas"),
            ["cand", "cls"], {"n": ("n", "sum")},
            result_hint="small").to_pandas()
        ncls = 1 << (t - 1)
        n_c = {int(r.cls): int(r.n)
               for r in agg[agg["cand"] == 0].itertuples()}
        # class weights, multiplied in round order (left-assoc —
        # the oracle's literal product replays the same tree)
        w = []
        for c in range(ncls):
            wc = 1.0
            for s, (_, _, _, al) in enumerate(prior):
                wc = wc * float(np.exp(
                    -al if (c >> s) & 1 else al))
            w.append(wc)
        best = None
        for (ci, f, th, pl) in _ADABOOST_CANDS:
            sub = agg[agg["cand"] == ci]
            nw_c = {int(r.cls): int(r.n)
                    for r in sub.itertuples()}
            num, den = 0.0, 0.0
            for c in range(ncls):  # ascending-class left-assoc sum
                num = num + w[c] * float(nw_c.get(c, 0))
                den = den + w[c] * float(n_c.get(c, 0))
            err = num / den
            key = (err, ci)
            if best is None or key < best[0]:
                best = (key, ci, f, th, pl, err)
        _, ci, f, th, pl, err = best
        assert 0.0 < err < 1.0, "adaboost: degenerate stump error"
        alpha = 0.5 * float(np.log((1.0 - err) / err))
        picked.append((ci, f, th, pl, err, alpha))
    return pd.DataFrame(
        [(t + 1, ci, f, th, pl,
          float(_round_half_away(err, 6)),
          float(_round_half_away(al, 6)))
         for t, (ci, f, th, pl, err, al) in enumerate(picked)],
        columns=["round", "cand_id", "feature", "thr", "pol",
                 "err", "alpha"]) \
        .astype({"round": "int64", "cand_id": "int64",
                 "feature": "int64", "thr": "int64",
                 "pol": "int64"})

def _adaboost_oracle_sql(rounds: int = 3) -> str:
    """Generated per-round replay of ``q_lineitem_adaboost``:
    conditional-aggregation (cand × class) integer counts, the
    identical left-assoc weighted-error expression, the strict
    (err, cand) pick, and the α update."""
    vals = ", ".join(f"({ci}, {f}, {th}, {pl})"
                     for (ci, f, th, pl) in _ADABOOST_CANDS)
    sql = f"""
        WITH base AS MATERIALIZED (
            SELECT CAST(l_quantity AS BIGINT) AS q,
                   CAST(round(l_discount * 100, 0) AS BIGINT) AS d,
                   CASE WHEN l_returnflag = 'R' THEN 1 ELSE -1 END
                       AS y
            FROM lineitem),
        cands(cand_id, feature, thr, pol) AS (VALUES {vals})"""

    def pred(alias: str) -> str:
        return (f"CASE WHEN (CASE WHEN {alias}.feature = 1 "
                f"THEN x.q ELSE x.d END) <= {alias}.thr "
                f"THEN {alias}.pol ELSE -{alias}.pol END")

    for t in range(1, rounds + 1):
        ncls = 1 << (t - 1)
        cls_terms = " + ".join(
            f"(CASE WHEN {pred(f'a{s}')} = x.y THEN 1 ELSE 0 END)"
            f" * {1 << (s - 1)}" for s in range(1, t)) or "0"
        joins = "".join(f", a{s}" for s in range(1, t))
        nw_cols = ", ".join(
            f"sum(CASE WHEN x.cls = {c} AND {pred('c')} <> x.y "
            f"THEN 1 ELSE 0 END) AS nw{c}" for c in range(ncls))
        n_cols = ", ".join(
            f"sum(CASE WHEN cls = {c} THEN 1 ELSE 0 END) AS n{c}"
            for c in range(ncls))

        def wexpr(c: int) -> str:
            terms = ["CAST(1.0 AS DOUBLE)"]
            for s in range(1, t):
                sign = "-" if (c >> (s - 1)) & 1 else ""
                terms.append(
                    f"exp({sign}(SELECT alpha FROM a{s}))")
            return " * ".join(terms)

        num = " + ".join(f"({wexpr(c)}) * nw{c}"
                         for c in range(ncls))
        den = " + ".join(f"({wexpr(c)}) * n{c}"
                         for c in range(ncls))
        sql += f""",
        cls{t} AS MATERIALIZED (
            SELECT x.q, x.d, x.y, {cls_terms} AS cls
            FROM base x{joins}),
        counts{t} AS MATERIALIZED (
            SELECT c.cand_id, c.feature, c.thr, c.pol, {nw_cols}
            FROM cands c CROSS JOIN cls{t} x
            GROUP BY c.cand_id, c.feature, c.thr, c.pol),
        tot{t} AS (SELECT {n_cols} FROM cls{t}),
        pick{t} AS (
            SELECT cand_id, feature, thr, pol,
                   ({num}) / ({den}) AS err
            FROM counts{t}, tot{t}
            ORDER BY err, cand_id LIMIT 1),
        a{t} AS (SELECT cand_id, feature, thr, pol, err,
                        0.5 * ln((1.0 - err) / err) AS alpha
                 FROM pick{t})"""
    parts = [f"""
        SELECT CAST({t} AS BIGINT) AS round,
               CAST(cand_id AS BIGINT) AS cand_id,
               CAST(feature AS BIGINT) AS feature,
               CAST(thr AS BIGINT) AS thr,
               CAST(pol AS BIGINT) AS pol,
               round(err, 6) AS err, round(alpha, 6) AS alpha
        FROM a{t}""" for t in range(1, rounds + 1)]
    return sql + "\nSELECT * FROM (" \
        + "\nUNION ALL ".join(parts) + ") ORDER BY round"

def q_lineitem_price_hull(sf_dir: str):
    """Quantity–price efficient frontier: the UPPER CONVEX HULL
    (Andrew's monotone chain '79) of the (quantity, max extended
    price cents) grid — the convexity audit of the pricing curve and
    the economics sibling of the Pareto ``q_part_skyline``. Every
    coordinate is an exact integer (quantities are integral,
    prices mirror-round to cents), every monotone-chain pop is the
    integer cross-product test, and collinear mid-points drop under
    the strict-turn convention — so the hull is bit-deterministic
    and the oracle verifies it through the independent all-chords
    vertex characterization: p is a frontier vertex iff it lies
    STRICTLY above every chord of grid points spanning its quantity
    (cross-multiplied integer inequality, no division).

    Scale shape: ONE combiner pass reduces the corpus to the
    ≤50-row quantity grid (per-block max partials); the chain runs
    driver-side on that metadata-sized table."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/lineitem.parquet",
                            columns=["l_quantity",
                                     "l_extendedprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"q": pd.Series(dtype="int64"),
                                 "y": pd.Series(dtype="int64")})
        q = df["l_quantity"].to_numpy(np.float64).astype(np.int64)
        p = df["l_extendedprice"].to_numpy(np.float64)
        cents = np.floor(np.abs(p) * 100.0 + 0.5).astype(np.int64)
        g = pd.DataFrame({"q": q, "y": cents}) \
            .groupby("q", as_index=False)["y"].max()
        return g.astype("int64")

    grid = grouped_aggregate(
        ds.map_batches(partial, batch_format="pandas"),
        ["q"], {"y": ("y", "max")},
        result_hint="small").to_pandas() \
        .sort_values("q").reset_index(drop=True)
    pts = [(int(r.q), int(r.y)) for r in grid.itertuples()]
    hull: list[tuple[int, int]] = []
    for p in pts:  # ascending q; pop non-strict (clockwise) turns
        while len(hull) >= 2:
            (x1, y1), (x2, y2) = hull[-2], hull[-1]
            # cross of (p - h[-2]) vs (h[-1] - h[-2]): keep only
            # strictly-right turns for the upper hull
            if (x2 - x1) * (p[1] - y1) - (y2 - y1) * (p[0] - x1) \
                    >= 0:
                hull.pop()
            else:
                break
        hull.append(p)
    return pd.DataFrame(hull, columns=["q", "y"]).astype("int64")

_PRICE_HULL_ORACLE_SQL = """
    WITH g AS MATERIALIZED (
        SELECT CAST(l_quantity AS BIGINT) AS q,
               max(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                   AS y
        FROM lineitem GROUP BY 1)
    SELECT p.q, p.y FROM g p
    WHERE NOT EXISTS (
        SELECT 1 FROM g a, g b
        WHERE a.q < p.q AND p.q < b.q
          AND (b.q - a.q) * p.y
              <= a.y * (b.q - p.q) + b.y * (p.q - a.q))
    ORDER BY p.q"""

def q_part_bridges(sf_dir: str, *, min_cocount: int = 3):
    """Bridge edges (Tarjan '74 low-link) of the thresholded repeat
    co-purchase graph — the cut-edge audit completing the robustness
    family beside k-core/k-truss/components: a bridge is an edge
    whose removal disconnects its endpoints, i.e. supply-chain
    single points of failure in the co-purchase topology. The
    ≥ ``min_cocount`` threshold keeps the graph metadata-sized, so
    after the streaming pair-count combiner the iterative low-link
    DFS runs driver-side (the Tarjan-SCC convention; corpus-scale
    graphs take the BSP components/k-truss path instead). Exact:
    pure integer graph structure, no arithmetic at all. The oracle
    verifies each edge INDEPENDENTLY of DFS theory: (a,b) is a
    bridge iff b is unreachable from a in G∖{(a,b)} — a per-edge
    exclusion recursive closure."""
    configure_data_context()
    edges = _repeat_copurchase_edges(
        sf_dir, min_cocount=min_cocount).to_pandas()
    if edges.empty or "a" not in edges.columns:
        return pd.DataFrame({"a": pd.Series(dtype="int64"),
                             "b": pd.Series(dtype="int64")})
    E = sorted({(int(a), int(b))
                for a, b in zip(edges["a"], edges["b"])})
    adj: dict[int, list[tuple[int, int]]] = {}
    for i, (a, b) in enumerate(E):
        adj.setdefault(a, []).append((b, i))
        adj.setdefault(b, []).append((a, i))
    disc: dict[int, int] = {}
    low: dict[int, int] = {}
    bridges: list[tuple[int, int]] = []
    timer = 0
    for root in sorted(adj):
        if root in disc:
            continue
        stack = [(root, -1, 0)]
        disc[root] = low[root] = timer
        timer += 1
        while stack:
            u, pe, i = stack.pop()
            if i < len(adj[u]):
                stack.append((u, pe, i + 1))
                v, ei = adj[u][i]
                if ei == pe:
                    continue
                if v not in disc:
                    disc[v] = low[v] = timer
                    timer += 1
                    stack.append((v, ei, 0))
                else:
                    low[u] = min(low[u], disc[v])
            elif pe != -1:
                a, b = E[pe]
                p = a if b == u else b
                low[p] = min(low[p], low[u])
                if low[u] > disc[p]:
                    bridges.append(E[pe])
    return pd.DataFrame(sorted(bridges), columns=["a", "b"]) \
        .astype("int64")

def _bridges_oracle_sql(min_cocount: int = 3) -> str:
    """Per-edge exclusion closure: (a,b) is a bridge iff b is
    unreachable from a without using that edge."""
    return f"""
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
        r AS (
            SELECT e.a AS ea, e.b AS eb, e.a AS node FROM e0 e
            UNION
            SELECT r.ea, r.eb, s.v
            FROM r JOIN sym s ON s.u = r.node
            WHERE NOT (least(s.u, s.v) = r.ea
                       AND greatest(s.u, s.v) = r.eb))
        SELECT CAST(e.a AS BIGINT) AS a, CAST(e.b AS BIGINT) AS b
        FROM e0 e
        WHERE NOT EXISTS (
            SELECT 1 FROM r
            WHERE r.ea = e.a AND r.eb = e.b AND r.node = e.b)
        ORDER BY a, b"""

def q_part_articulation(sf_dir: str, *, min_cocount: int = 3):
    """Articulation points (Hopcroft & Tarjan '73) of the
    thresholded repeat co-purchase graph — the cut-VERTEX sibling of
    ``q_part_bridges``: nodes whose removal disconnects their
    component (the hub single points of failure, where bridges are
    the link ones). Same shape: streaming pair-count combiner to the
    metadata-sized graph, iterative low-link DFS driver-side (root
    rule: ≥ 2 DFS children; non-root: some child with
    low ≥ disc), pure integer structure. The oracle verifies each
    node independently of DFS theory: v is an articulation point iff
    the closure from its component's smallest OTHER node, never
    entering v, misses some third node of the component."""
    configure_data_context()
    edges = _repeat_copurchase_edges(
        sf_dir, min_cocount=min_cocount).to_pandas()
    if edges.empty or "a" not in edges.columns:
        return pd.DataFrame({"node": pd.Series(dtype="int64")})
    E = sorted({(int(a), int(b))
                for a, b in zip(edges["a"], edges["b"])})
    adj: dict[int, list[tuple[int, int]]] = {}
    for i, (a, b) in enumerate(E):
        adj.setdefault(a, []).append((b, i))
        adj.setdefault(b, []).append((a, i))
    disc: dict[int, int] = {}
    low: dict[int, int] = {}
    children: dict[int, int] = {}
    arts: set[int] = set()
    timer = 0
    for root in sorted(adj):
        if root in disc:
            continue
        disc[root] = low[root] = timer
        timer += 1
        children[root] = 0
        stack = [(root, -1, 0)]
        while stack:
            u, pe, i = stack.pop()
            if i < len(adj[u]):
                stack.append((u, pe, i + 1))
                v, ei = adj[u][i]
                if ei == pe:
                    continue
                if v not in disc:
                    disc[v] = low[v] = timer
                    timer += 1
                    children[u] = children.get(u, 0) + 1
                    stack.append((v, ei, 0))
                else:
                    low[u] = min(low[u], disc[v])
            elif pe != -1:
                a, b = E[pe]
                p = a if b == u else b
                low[p] = min(low[p], low[u])
                if p != root and low[u] >= disc[p]:
                    arts.add(p)
        if children[root] >= 2:
            arts.add(root)
    return pd.DataFrame({"node": np.array(sorted(arts),
                                          dtype=np.int64)})

def _articulation_oracle_sql(min_cocount: int = 3) -> str:
    """Per-node exclusion closure: v is an articulation point iff
    the walk from its component's min other node, barred from v,
    reaches fewer than |comp| − 1 nodes."""
    return f"""
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
        cl AS (
            SELECT u AS s, u AS node FROM nodes
            UNION
            SELECT cl.s, sym.v FROM cl
            JOIN sym ON sym.u = cl.node),
        comp AS (SELECT s AS u, min(node) AS c
                 FROM cl GROUP BY s),
        csz AS (SELECT c, count(*) AS n FROM comp GROUP BY c),
        seed AS (
            SELECT v.u AS ex, min(o.u) AS start
            FROM comp v JOIN comp o
                 ON o.c = v.c AND o.u <> v.u
            GROUP BY v.u),
        r AS (
            SELECT ex, start AS node FROM seed
            UNION
            SELECT r.ex, s.v FROM r
            JOIN sym s ON s.u = r.node
            WHERE s.v <> r.ex),
        reached AS (SELECT ex, count(*) AS nr FROM r GROUP BY ex)
        SELECT CAST(v.u AS BIGINT) AS node
        FROM comp v
        JOIN csz ON csz.c = v.c
        JOIN reached re ON re.ex = v.u
        WHERE re.nr < csz.n - 1
        ORDER BY node"""

def q_part_attack_curve(sf_dir: str, *, steps: int = 8,
                        min_cocount: int = 3):
    """Targeted-attack robustness curve (Albert, Jeong & Barabási
    '00) of the thresholded repeat co-purchase graph: remove the
    top-j degree hubs (strict (degree DESC, node ASC) rank) for
    j = 0..``steps`` and census the fragmentation — surviving
    nodes/edges, component count (isolated survivors count), and
    giant-component size. Pure integer structure end-to-end; every
    removal set is deterministic under the strict rank, so the
    generated per-step closure oracle replays the whole curve
    exactly. Completes the robustness family: bridges/articulation
    name the single points of failure, this measures what their
    loss actually costs.

    Scale shape: streaming pair-count combiner to the
    metadata-sized graph; the ≤ steps+1 censuses run driver-side.
    (Corpus-scale graphs would re-run the BSP components grid per
    step instead.)"""
    configure_data_context()
    edges = _repeat_copurchase_edges(
        sf_dir, min_cocount=min_cocount).to_pandas()
    if edges.empty or "a" not in edges.columns:
        return pd.DataFrame({c: pd.Series(dtype="int64")
                             for c in ("j", "n_nodes", "n_edges",
                                       "n_components", "giant")})
    E = sorted({(int(a), int(b))
                for a, b in zip(edges["a"], edges["b"])})
    deg: dict[int, int] = {}
    for a, b in E:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    rank = sorted(deg, key=lambda v: (-deg[v], v))
    rows = []
    for j in range(steps + 1):
        removed = set(rank[:j])
        ns = [v for v in deg if v not in removed]
        es = [e for e in E
              if e[0] not in removed and e[1] not in removed]
        adj = {v: [] for v in ns}
        for a, b in es:
            adj[a].append(b)
            adj[b].append(a)
        seen: set[int] = set()
        ncomp, giant = 0, 0
        for s in ns:
            if s in seen:
                continue
            ncomp += 1
            size, st = 0, [s]
            seen.add(s)
            while st:
                u = st.pop()
                size += 1
                for v in adj[u]:
                    if v not in seen:
                        seen.add(v)
                        st.append(v)
            giant = max(giant, size)
        rows.append((j, len(ns), len(es), ncomp, giant))
    return pd.DataFrame(rows, columns=["j", "n_nodes", "n_edges",
                                       "n_components", "giant"]) \
        .astype("int64")

def _attack_curve_oracle_sql(steps: int = 8,
                             min_cocount: int = 3) -> str:
    """Per-step replay of ``q_part_attack_curve``: strict degree
    rank, per-step surviving subgraph, closure census."""
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
        dg AS MATERIALIZED (
            SELECT u, count(*) AS d FROM sym GROUP BY u),
        rk AS MATERIALIZED (
            SELECT u, row_number()
                       OVER (ORDER BY d DESC, u ASC) AS r
            FROM dg)"""
    selects = []
    for j in range(steps + 1):
        sql += f""",
        sv{j} AS (SELECT u FROM rk WHERE r > {j}),
        se{j} AS (SELECT e.a, e.b FROM e0 e
                  JOIN sv{j} x ON x.u = e.a
                  JOIN sv{j} y ON y.u = e.b),
        cl{j} AS (
            SELECT u AS s, u AS node FROM sv{j}
            UNION
            SELECT c.s, z.v FROM cl{j} c
            JOIN (SELECT a AS u, b AS v FROM se{j}
                  UNION ALL SELECT b, a FROM se{j}) z
                 ON z.u = c.node),
        cp{j} AS (SELECT s, min(node) AS c FROM cl{j} GROUP BY s),
        cs{j} AS (SELECT c, count(*) AS n FROM cp{j} GROUP BY c)"""
        selects.append(f"""
        SELECT CAST({j} AS BIGINT) AS j,
               (SELECT count(*) FROM sv{j}) AS n_nodes,
               (SELECT count(*) FROM se{j}) AS n_edges,
               (SELECT count(*) FROM cs{j}) AS n_components,
               (SELECT coalesce(max(n), 0) FROM cs{j}) AS giant""")
    return sql + "\nSELECT * FROM (" \
        + "\nUNION ALL ".join(selects) + ") ORDER BY j"

def q_part_coloring(sf_dir: str, *, min_cocount: int = 3):
    """Greedy graph coloring in Welsh–Powell order (Welsh & Powell
    '67) of the thresholded repeat co-purchase graph — the
    conflict-partitioning audit beside the Luby-MIS query (each
    color class is an independent set: parts that never share a
    repeat basket, e.g. safe parallel batches for exclusive
    processing). Bit-determinism: pure integer structure — the
    (degree DESC, node ASC) rank and the smallest-absent-color
    (mex) rule replay exactly; the oracle is ONE recursive CTE
    carrying the growing (node, color) assignment as a LIST column
    (the knapsack-oracle convention), one recursion step per node.

    Scale shape: the ≥ ``min_cocount`` threshold keeps the graph
    metadata-sized after the streaming pair-count combiner
    (`_repeat_copurchase_edges`); the sequential mex walk is
    driver-side by design — corpus-scale graphs take the BSP
    components / Luby-MIS path."""
    from jerex_ray.ops.graph import greedy_coloring
    configure_data_context()
    edges = _repeat_copurchase_edges(
        sf_dir, min_cocount=min_cocount).to_pandas()
    if edges.empty or "a" not in edges.columns:
        return pd.DataFrame({"node": pd.Series(dtype="int64"),
                             "color": pd.Series(dtype="int64")})
    return greedy_coloring(edges)

def _coloring_oracle_sql(min_cocount: int = 3) -> str:
    return f"""
    WITH RECURSIVE inc AS MATERIALIZED (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        FROM lineitem),
    e AS MATERIALIZED (
        SELECT a.p AS a, b.p AS b
        FROM inc a JOIN inc b ON a.o = b.o AND a.p < b.p
        GROUP BY 1, 2 HAVING count(*) >= {min_cocount}),
    sym AS MATERIALIZED (
        SELECT a, b FROM e UNION ALL SELECT b AS a, a AS b FROM e),
    deg AS (SELECT a AS node, count(*) AS d FROM sym GROUP BY 1),
    ranked AS MATERIALIZED (
        SELECT node, d, row_number() OVER (ORDER BY d DESC, node)
                   AS rk
        FROM deg),
    steps AS (
        SELECT 0 AS k,
               CAST([] AS STRUCT(node BIGINT, color BIGINT)[]) AS acc
        UNION ALL
        SELECT k + 1, list_append(acc, struct_pack(
            node := (SELECT r.node FROM ranked r WHERE r.rk = k + 1),
            color := (
                SELECT min(c.col)
                FROM (SELECT unnest(range(0, k + 2)) AS col) c
                WHERE c.col NOT IN (
                    SELECT u.s.color
                    FROM (SELECT unnest(acc) AS s) u
                    JOIN sym ON sym.a = (SELECT r2.node FROM ranked r2
                                         WHERE r2.rk = k + 1)
                           AND sym.b = u.s.node))))
        FROM steps WHERE k < (SELECT count(*) FROM ranked))
    SELECT u.s.node AS node, u.s.color AS color
    FROM (SELECT unnest(acc) AS s FROM steps
          WHERE k = (SELECT count(*) FROM ranked)) u
    ORDER BY node"""

def q_part_simrank(sf_dir: str, *, rounds: int = 3,
                   scale: int = 1_000_000, min_cocount: int = 3):
    """SimRank (Jeh & Widom '02) over the thresholded repeat
    co-purchase graph — 'two parts are similar if their co-purchase
    neighborhoods are similar', the recursive structural-similarity
    completion of the Adamic-Adar / item-item-cosine pair: with
    C = 4/5 in exact integer fixed-point (see
    ``ops/graph.py:simrank_fixed_point``) every round is an integer
    matrix product + floor division + diagonal reset, bit-replayed
    by the generated per-round CTE oracle; the only float anywhere
    is the final display division. Streaming pair-count combiner to
    the metadata-sized graph; O(rounds·n·m) integer recursion
    driver-side (SimRank state is inherently O(n²) — corpus-scale
    graphs take the sampled random-walk estimator instead)."""
    from jerex_ray.ops.graph import simrank_fixed_point
    configure_data_context()
    edges = _repeat_copurchase_edges(
        sf_dir, min_cocount=min_cocount).to_pandas()
    return simrank_fixed_point(edges, rounds=rounds, scale=scale)

def _simrank_oracle_sql(rounds: int = 3, scale: int = 1_000_000,
                        min_cocount: int = 3) -> str:
    """Per-round replay of ``q_part_simrank``: only pairs reachable
    through ≥1 neighbor pair are materialized per round (absent =
    0, exactly the engine's zero entries); int64 sums are
    order-free and `//` on nonnegative ints truncates identically
    on both engines."""
    sql = f"""
    WITH inc AS MATERIALIZED (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        FROM lineitem),
    e AS MATERIALIZED (
        SELECT a.p AS a, b.p AS b
        FROM inc a JOIN inc b ON a.o = b.o AND a.p < b.p
        GROUP BY 1, 2 HAVING count(*) >= {min_cocount}),
    sym AS MATERIALIZED (
        SELECT a AS u, b AS v FROM e
        UNION ALL SELECT b, a FROM e),
    deg AS MATERIALIZED (
        SELECT u, count(*) AS d FROM sym GROUP BY u),
    s0 AS MATERIALIZED (
        SELECT u AS a, u AS b, CAST({scale} AS BIGINT) AS s
        FROM deg)"""
    for k in range(1, rounds + 1):
        sql += f""",
    s{k} AS MATERIALIZED (
        SELECT p.a, p.b,
               CASE WHEN p.a = p.b THEN CAST({scale} AS BIGINT)
                    ELSE (4 * p.m) // (5 * d1.d * d2.d) END AS s
        FROM (
            SELECT sa.u AS a, sb.u AS b, sum(pp.s) AS m
            FROM sym sa
            JOIN s{k - 1} pp ON pp.a = sa.v
            JOIN sym sb ON pp.b = sb.v
            GROUP BY sa.u, sb.u) p
        JOIN deg d1 ON d1.u = p.a
        JOIN deg d2 ON d2.u = p.b)"""
    return sql + f"""
    SELECT CAST(a AS BIGINT) AS node_a, CAST(b AS BIGINT) AS node_b,
           CAST(s AS BIGINT) AS simrank_fp,
           round(s / {scale}.0, 6) AS simrank
    FROM s{rounds} WHERE a < b AND s > 0 ORDER BY node_a, node_b"""

QUERIES = {
    'q_part_coloring': q_part_coloring,
    'q_part_simrank': q_part_simrank,
    'q_lineitem_adaboost': q_lineitem_adaboost,
    'q_lineitem_price_hull': q_lineitem_price_hull,
    'q_part_bridges': q_part_bridges,
    'q_part_articulation': q_part_articulation,
    'q_part_attack_curve': q_part_attack_curve,
}

ORACLES = {
}
ORACLE_REGISTRY.update(ORACLES)
ORACLES['q_part_simrank'] = ORACLE_REGISTRY['q_part_simrank'] = _simrank_oracle_sql(
        rounds=3, scale=1_000_000, min_cocount=3)
ORACLES['q_part_coloring'] = ORACLE_REGISTRY['q_part_coloring'] = _coloring_oracle_sql(min_cocount=3)
ORACLES['q_lineitem_adaboost'] = ORACLE_REGISTRY['q_lineitem_adaboost'] = _adaboost_oracle_sql(rounds=3)
ORACLES['q_lineitem_price_hull'] = ORACLE_REGISTRY['q_lineitem_price_hull'] = _PRICE_HULL_ORACLE_SQL
ORACLES['q_part_bridges'] = ORACLE_REGISTRY['q_part_bridges'] = _bridges_oracle_sql(min_cocount=3)
ORACLES['q_part_articulation'] = ORACLE_REGISTRY['q_part_articulation'] = _articulation_oracle_sql(
        min_cocount=3)
ORACLES['q_part_attack_curve'] = ORACLE_REGISTRY['q_part_attack_curve'] = _attack_curve_oracle_sql(
        steps=8, min_cocount=3)
