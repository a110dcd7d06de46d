"""Split of the query registry: ``events_d`` part (mechanically derived from the original queries.py by scripts/split_queries.py; unit order and source text preserved)."""

from __future__ import annotations
import re
import numpy as np
import pandas as pd
from jerex_ray.config import PipelineConfig
from jerex_ray.runtime import configure_data_context
from jerex_ray.pipelines.queries._shared import ORACLE_REGISTRY
from jerex_ray.pipelines.queries._shared import _round_half_away  # noqa: E501

def q_events_shapley(sf_dir: str):
    """EXACT Shapley-value reach attribution (Shapley '53; the
    game-theoretic attribution modern marketing/feature-importance
    stacks approximate by sampling): channels = event types, reach
    game v(S) = #users touched by at least one type in S, and each
    type's Shapley value φ_i = Σ_{S∌i} |S|!(n−|S|−1)!/n! · (v(S∪i) −
    v(S)) splits total reach exactly (Σφ = v(N), efficiency — the
    pytest invariant). The user-side reduces to the per-user
    type-bitmask HISTOGRAM (≤2ⁿ rows) via the distinct-incidence
    sum-is-OR combiner trick, so v(S) for all 2ⁿ coalitions — and the
    full exact Shapley sum — is driver-side arithmetic over a
    metadata-sized table; everything stays integer by scaling with n!
    (one final divide for the share). SQL-oracled bit-for-bit via
    range(64) subset enumeration + bit_count (needs #types ≤ 6;
    fixtures have 5)."""
    import math

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
    n = len(types)
    t_index = {t: i for i, t in enumerate(types)}

    def mask_partial(df: pd.DataFrame) -> pd.DataFrame:
        m = np.left_shift(
            np.int64(1),
            df["event_type"].map(t_index).to_numpy(np.int64))
        g = (pd.DataFrame({"user_id": df["user_id"], "m": m})
             .groupby("user_id", sort=False)["m"].sum())
        return pd.DataFrame({"user_id": g.index.to_numpy(),
                             "mask": g.to_numpy(np.int64)})

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

    def v(S: int) -> int:
        return sum(c for m, c in mask_n.items() if m & S)

    vs = [v(S) for S in range(1 << n)]
    phi = []
    for i in range(n):
        acc = 0
        for S in range(1 << n):
            if S & (1 << i):
                continue
            size = bin(S).count("1")
            w = math.factorial(size) * math.factorial(n - size - 1)
            acc += w * (vs[S | (1 << i)] - vs[S])
        phi.append(acc)
    tot = sum(phi)                       # = n! · v(N) (efficiency)
    return pd.DataFrame({
        "channel": types,
        "shapley_scaled": np.array(phi, dtype=np.int64),
        "share": [round(float(p) / float(tot), 6) for p in phi]})

def q_events_tcloseness(sf_dir: str, *, top: int = 10):
    """t-closeness audit (Li et al. '07, completing the k-anonymity /
    l-diversity privacy triad): per QI class (user-bucket, hour), the
    variational distance between the class's sensitive (event_type)
    distribution and the global one, kept EXACT — tvd_num =
    Σ_v |cnt_cv·N − cnt_gv·n_c| is an integer (cross-multiplied
    common denominator), tvd = tvd_num / (2·n_c·N) is one final
    divide. Reports the ``top`` worst classes ordered by the
    identical double (num/n_c) on both engines, ties to (ubucket,
    hod). Two QI-vocabulary-bounded combiner passes; the class ×
    sensitive grid is metadata-sized on the driver."""
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
        result_hint="large").to_pandas()
    glob = cells.groupby("event_type")["n"].sum()
    types = sorted(glob.index)
    g_vec = glob[types].to_numpy(np.int64)
    n_tot = int(g_vec.sum())
    piv = cells.pivot_table(index=["ubucket", "hod"],
                            columns="event_type", values="n",
                            aggfunc="sum", fill_value=0) \
        .reindex(columns=types, fill_value=0)
    cnt = piv.to_numpy(np.int64)
    n_c = cnt.sum(axis=1)
    tvd_num = np.abs(cnt * n_tot - g_vec[None, :] * n_c[:, None]) \
        .sum(axis=1)
    out = pd.DataFrame({
        "ubucket": piv.index.get_level_values(0).astype("int64"),
        "hod": piv.index.get_level_values(1).astype("int64"),
        "n_rows": n_c, "tvd_num": tvd_num,
        "key": tvd_num.astype(np.float64) / n_c.astype(np.float64)})
    out = out.sort_values(["key", "ubucket", "hod"],
                          ascending=[False, True, True]).head(top)
    out["tvd"] = np.round(
        out["tvd_num"].to_numpy(np.float64)
        / (2.0 * out["n_rows"].to_numpy(np.float64) * float(n_tot)),
        6)
    return out.drop(columns=["key"]) \
        .astype({"ubucket": "int64", "hod": "int64",
                 "n_rows": "int64", "tvd_num": "int64"}) \
        .reset_index(drop=True)

def q_events_mondrian(sf_dir: str, *, levels: int = 3):
    """Mondrian multidimensional k-anonymization (LeFevre et al.
    '06) over the (user-bucket, hour-of-day) QI space — the actual
    GENERALIZATION operator, not just the audit: recursive
    median-split partitioning, at each level splitting every region
    with ≥ 2k rows on its widest dimension (ties → user-bucket) at
    the weighted lower median, keeping the split only if both halves
    hold ≥ k rows. k = N//16 + 1 (data-proportional, computed
    identically on both engines). Both QI dims are vocabulary-bounded
    so ONE combiner pass reduces the corpus to the joint histogram
    and the whole recursion is exact integer arithmetic on that
    metadata-sized table; the generated per-level SQL oracle replays
    every split decision bit-for-bit. Output: final regions with
    row counts and generalized ranges."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts"])

    def qi(df: pd.DataFrame) -> pd.DataFrame:
        hod = (df["ts"].astype("datetime64[us]").astype("int64")
               // 3_600_000_000) % 24
        return pd.DataFrame({
            "ub": df["user_id"].to_numpy(np.int64) // 10,
            "hod": hod.to_numpy(np.int64),
            "w": 1}).groupby(["ub", "hod"],
                             sort=False).sum().reset_index()

    hist = grouped_aggregate(
        ds.map_batches(qi, batch_format="pandas", batch_size=8192),
        ["ub", "hod"], {"w": ("w", "sum")},
        result_hint="small").to_pandas().reset_index(drop=True)
    n_total = int(hist["w"].sum())
    k = n_total // 16 + 1
    region = np.zeros(len(hist), dtype=np.int64)
    for _ in range(levels):
        new_region = region * 2
        for r in np.unique(region):
            idx = np.flatnonzero(region == r)
            sub = hist.iloc[idx]
            n = int(sub["w"].sum())
            if n < 2 * k:
                continue
            rng_ub = int(sub["ub"].max()) - int(sub["ub"].min())
            rng_hod = int(sub["hod"].max()) - int(sub["hod"].min())
            dim = "ub" if rng_ub >= rng_hod else "hod"
            marg = sub.groupby(dim)["w"].sum().sort_index()
            cw = marg.cumsum().to_numpy()
            med = int(marg.index[int(np.argmax(cw >= (n + 1) // 2))])
            right = sub[dim].to_numpy(np.int64) > med
            nl = n - int(sub["w"].to_numpy(np.int64)[right].sum())
            if nl >= k and n - nl >= k:
                new_region[idx] = r * 2 + right.astype(np.int64)
        region = new_region
    hist = hist.assign(region=region)
    out = hist.groupby("region").agg(
        n=("w", "sum"), ub_min=("ub", "min"), ub_max=("ub", "max"),
        hod_min=("hod", "min"), hod_max=("hod", "max")) \
        .reset_index().sort_values("region").reset_index(drop=True)
    # every surviving region honors k-anonymity
    assert (out["n"] >= k).all()
    return out.astype("int64")

def _mondrian_oracle_sql(levels: int = 3) -> str:
    """Generated per-level replay of ``q_events_mondrian``: h{l}
    carries (ub, hod, w, r); each level derives per-region ranges,
    weighted lower medians of both dims, the widest-dim choice, the
    both-halves-≥k gate, and the child region codes."""
    sql = """
        WITH h0 AS MATERIALIZED (
            SELECT user_id // 10 AS ub,
                   (epoch_us(ts) // 3600000000) % 24 AS hod,
                   count(*) AS w, CAST(0 AS BIGINT) AS r
            FROM events GROUP BY 1, 2),
        kk AS (SELECT SUM(w) // 16 + 1 AS k FROM h0)"""
    for lv in range(levels):
        sql += f""",
        t{lv} AS MATERIALIZED (
            SELECT r, SUM(w) AS n, max(ub) - min(ub) AS rub,
                   max(hod) - min(hod) AS rhd
            FROM h{lv} GROUP BY r),
        cu{lv} AS (SELECT r, ub AS v, SUM(w) AS wv
                   FROM h{lv} GROUP BY r, ub),
        cc{lv} AS (SELECT r, v, SUM(wv) OVER (
                       PARTITION BY r ORDER BY v) AS cw
                   FROM cu{lv}),
        mu{lv} AS (SELECT cc.r, min(v) AS med
                   FROM cc{lv} cc JOIN t{lv} t ON t.r = cc.r
                   WHERE cc.cw >= (t.n + 1) // 2 GROUP BY cc.r),
        du{lv} AS (SELECT r, hod AS v, SUM(w) AS wv
                   FROM h{lv} GROUP BY r, hod),
        dc{lv} AS (SELECT r, v, SUM(wv) OVER (
                       PARTITION BY r ORDER BY v) AS cw
                   FROM du{lv}),
        mh{lv} AS (SELECT dc.r, min(v) AS med
                   FROM dc{lv} dc JOIN t{lv} t ON t.r = dc.r
                   WHERE dc.cw >= (t.n + 1) // 2 GROUP BY dc.r),
        d{lv} AS MATERIALIZED (
            SELECT t.r, t.n,
                   CASE WHEN t.rub >= t.rhd THEN 0 ELSE 1 END AS dim,
                   CASE WHEN t.rub >= t.rhd
                        THEN mu.med ELSE mh.med END AS med
            FROM t{lv} t
            JOIN mu{lv} mu ON mu.r = t.r
            JOIN mh{lv} mh ON mh.r = t.r),
        nl{lv} AS (SELECT h.r, SUM(h.w) AS nl
                   FROM h{lv} h JOIN d{lv} d ON d.r = h.r
                   WHERE (d.dim = 0 AND h.ub <= d.med)
                      OR (d.dim = 1 AND h.hod <= d.med)
                   GROUP BY h.r),
        s{lv} AS MATERIALIZED (
            SELECT d.r, d.dim, d.med,
                   (d.n >= 2 * (SELECT k FROM kk)
                    AND nl.nl >= (SELECT k FROM kk)
                    AND d.n - nl.nl >= (SELECT k FROM kk)) AS split
            FROM d{lv} d JOIN nl{lv} nl ON nl.r = d.r),
        h{lv + 1} AS MATERIALIZED (
            SELECT h.ub, h.hod, h.w,
                   h.r * 2 + CASE WHEN s.split AND (
                       (s.dim = 0 AND h.ub > s.med)
                       OR (s.dim = 1 AND h.hod > s.med))
                       THEN 1 ELSE 0 END AS r
            FROM h{lv} h JOIN s{lv} s ON s.r = h.r)"""
    return sql + f"""
        SELECT r AS region, CAST(SUM(w) AS BIGINT) AS n,
               min(ub) AS ub_min, max(ub) AS ub_max,
               min(hod) AS hod_min, max(hod) AS hod_max
        FROM h{levels} GROUP BY r ORDER BY r"""

def q_events_voptimal(sf_dir: str, *, buckets: int = 4):
    """V-optimal-style histogram construction (Jagadish et al. '98's
    DP shape — the optimizer-statistics bucketing primitive):
    partition the 24-point hour-of-day count series into 4 contiguous
    buckets minimizing the COUNT-WEIGHTED SSE, scaled integer form
    len·Σy² − (Σy)² per segment so the whole DP is exact integer
    arithmetic (no float compare anywhere); ties take the smallest
    split. ONE vocabulary-bounded combiner pass reduces the corpus to
    24 rows; the B×24 DP runs on the driver and the generated SQL
    stage oracle replays costs, argmins, and the backtracked bucket
    boundaries bit-for-bit."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        hod = (df["ts"].astype("datetime64[us]").astype("int64")
               // 3_600_000_000) % 24
        v, c = np.unique(hod.to_numpy(np.int64), return_counts=True)
        return pd.DataFrame({"hod": v, "y": c.astype(np.int64)})

    h = grouped_aggregate(
        ds.map_batches(partial, batch_format="pandas",
                       batch_size=65536),
        ["hod"], {"y": ("y", "sum")},
        result_hint="small").to_pandas().sort_values("hod")
    y = np.zeros(24, dtype=object)
    y[h["hod"].to_numpy(np.int64)] = [int(v) for v in h["y"]]
    ps = np.concatenate([[0], np.cumsum(y)])          # prefix sums
    ps2 = np.concatenate([[0], np.cumsum([v * v for v in y])])

    def seg(i: int, j: int) -> int:                  # 1-indexed incl
        n = j - i + 1
        s = int(ps[j] - ps[i - 1])
        ss = int(ps2[j] - ps2[i - 1])
        return n * ss - s * s

    INF = 1 << 62
    cost = [[INF] * 25 for _ in range(buckets + 1)]
    best = [[0] * 25 for _ in range(buckets + 1)]
    for i in range(1, 25):
        cost[1][i] = seg(1, i)
    for b in range(2, buckets + 1):
        for i in range(b, 25):
            bc, bj = INF, 0
            for j in range(b - 1, i):
                c = cost[b - 1][j] + seg(j + 1, i)
                if c < bc:
                    bc, bj = c, j
            cost[b][i], best[b][i] = bc, bj
    bounds = [24]
    for b in range(buckets, 1, -1):
        bounds.append(best[b][bounds[-1]])
    bounds.append(0)
    bounds = bounds[::-1]                            # 0, j1, .., 24
    rows = []
    for b in range(buckets):
        i, j = bounds[b] + 1, bounds[b + 1]
        rows.append((b + 1, i - 1, j - 1, j - i + 1, seg(i, j)))
    return pd.DataFrame(rows, columns=[
        "bucket", "h_start", "h_end", "n_hours", "sse_scaled"]) \
        .astype("int64")

def _voptimal_oracle_sql(buckets: int = 4) -> str:
    """Generated DP replay of ``q_events_voptimal``: prefix sums over
    the padded 24-hour grid, seg cost as a pure integer expression,
    one CTE per bucket level keeping the (cost ASC, split ASC)
    row_number-1 candidate per endpoint, then backtracked bounds."""
    sql = """
        WITH hrs AS (SELECT unnest(range(24)) AS h),
        raw AS (SELECT (epoch_us(ts) // 3600000000) % 24 AS h,
                       count(*) AS y
                FROM events GROUP BY 1),
        grid AS MATERIALIZED (
            SELECT hrs.h + 1 AS i, coalesce(raw.y, 0) AS y
            FROM hrs LEFT JOIN raw ON raw.h = hrs.h),
        pre AS MATERIALIZED (
            SELECT i, y,
                   SUM(y) OVER (ORDER BY i) AS s,
                   SUM(y * y) OVER (ORDER BY i) AS s2
            FROM grid),
        pre0 AS MATERIALIZED (
            SELECT i, s, s2 FROM pre
            UNION ALL SELECT 0, 0, 0),
        segc AS MATERIALIZED (
            SELECT lo.i + 1 AS i, hi.i AS j,
                   (hi.i - lo.i) * (hi.s2 - lo.s2)
                   - (hi.s - lo.s) * (hi.s - lo.s) AS c
            FROM pre0 lo JOIN pre0 hi ON lo.i < hi.i),
        c1 AS MATERIALIZED (
            SELECT j AS i, c AS cost, 0 AS bj
            FROM segc WHERE i = 1)"""
    for b in range(2, buckets + 1):
        sql += f""",
        c{b} AS MATERIALIZED (
            SELECT i, cost, bj FROM (
                SELECT s.j AS i, p.cost + s.c AS cost, p.i AS bj,
                       row_number() OVER (
                           PARTITION BY s.j
                           ORDER BY p.cost + s.c ASC, p.i ASC) AS rn
                FROM c{b - 1} p JOIN segc s ON s.i = p.i + 1
                WHERE p.i >= {b - 1})
            WHERE rn = 1)"""
    # backtrack the bounds b{buckets}..b1 (b{k} = end of bucket k)
    sql += f""",
        bt{buckets} AS (SELECT CAST(24 AS BIGINT) AS e)"""
    for b in range(buckets, 1, -1):
        sql += f""",
        bt{b - 1} AS (SELECT c{b}.bj AS e
                      FROM c{b}, bt{b} WHERE c{b}.i = bt{b}.e)"""
    sql += """,
        bt0 AS (SELECT CAST(0 AS BIGINT) AS e)"""
    parts = []
    for b in range(1, buckets + 1):
        parts.append(f"""
            SELECT CAST({b} AS BIGINT) AS bucket,
                   CAST(lo.e AS BIGINT) AS h_start,
                   CAST(hi.e - 1 AS BIGINT) AS h_end,
                   CAST(hi.e - lo.e AS BIGINT) AS n_hours,
                   CAST(s.c AS BIGINT) AS sse_scaled
            FROM bt{b - 1} lo CROSS JOIN bt{b} hi
            JOIN segc s ON s.i = lo.e + 1 AND s.j = hi.e""")
    return sql + "\nSELECT * FROM (" \
        + "\nUNION ALL ".join(parts) + ") ORDER BY bucket"

def q_events_scc(sf_dir: str):
    """Strongly connected components and condensation depth of the
    DOMINANT-FLOW event-type graph (Tarjan '72 — the directed-graph
    decomposition the rest of the graph family lacks): directed edge
    u→v iff strictly more users transition u→v than v→u (ties and
    self-loops drop, so the graph is an orientation of the type
    tournament and SCCs are its dominance cycles). ONE per-user
    co-location pass reduces the corpus to the |types|² transition
    count table (``ops/windows.transition_matrix``'s combiner); the
    SCC recursion and the condensation longest-path layering both
    run driver-side on that metadata-sized table — the Viterbi/DTW
    convention. Returns (etype, scc_id = lexicographically smallest
    member, scc_size, layer = longest condensation path ENDING at
    the SCC), all deterministic; the oracle replays reachability
    with a recursive closure and mutual-reach min, and the layers
    with a recursive path-length walk over the condensation DAG."""
    from jerex_ray.ops.windows import transition_matrix
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts",
                                     "event_type"])
    from jerex_ray.ops.graph import scc_condensation
    tm = transition_matrix(ds, key="user_id", ts_col="ts",
                           id_col="event_id", type_col="event_type")
    types = sorted(set(tm["prev_type"]) | set(tm["next_type"]))
    cnt = {(p, n): int(c) for p, n, c in
           zip(tm["prev_type"], tm["next_type"], tm["cnt"])}
    edges = [(p, n) for (p, n), c in cnt.items()
             if p != n and c > cnt.get((n, p), 0)]
    out = scc_condensation(types, edges)
    return out.rename(columns={"node": "etype"})

_SCC_ORACLE_SQL = """
    WITH RECURSIVE seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (
                   PARTITION BY user_id
                   ORDER BY ts, event_id) AS nxt
        FROM events),
    t AS MATERIALIZED (
        SELECT event_type AS p, nxt AS n, count(*) AS c
        FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2),
    nodes AS MATERIALIZED (
        SELECT p AS t FROM t UNION SELECT n FROM t),
    dom AS MATERIALIZED (
        SELECT a.p AS u, a.n AS v
        FROM t a LEFT JOIN t b ON b.p = a.n AND b.n = a.p
        WHERE a.p <> a.n AND a.c > coalesce(b.c, 0)),
    reach AS (
        SELECT t AS src, t AS dst FROM nodes
        UNION
        SELECT reach.src, dom.v
        FROM reach JOIN dom ON dom.u = reach.dst),
    scc AS MATERIALIZED (
        SELECT a.src AS t, min(a.dst) AS scc_id
        FROM reach a JOIN reach b
             ON a.dst = b.src AND b.dst = a.src
        GROUP BY a.src),
    sz AS (SELECT scc_id, count(*) AS scc_size
           FROM scc GROUP BY scc_id),
    ced AS MATERIALIZED (
        SELECT DISTINCT su.scc_id AS u, sv.scc_id AS v
        FROM dom JOIN scc su ON su.t = dom.u
                 JOIN scc sv ON sv.t = dom.v
        WHERE su.scc_id <> sv.scc_id),
    lp AS (
        SELECT scc_id AS c, 0 AS l FROM sz
        UNION
        SELECT ced.v, lp.l + 1
        FROM lp JOIN ced ON ced.u = lp.c),
    lay AS (SELECT c, max(l) AS layer FROM lp GROUP BY c)
    SELECT scc.t AS etype, scc.scc_id,
           CAST(sz.scc_size AS BIGINT) AS scc_size,
           CAST(lay.layer AS BIGINT) AS layer
    FROM scc JOIN sz ON sz.scc_id = scc.scc_id
             JOIN lay ON lay.c = scc.scc_id
    ORDER BY etype"""

def q_events_matrix_profile(sf_dir: str, *, m: int = 24):
    """Matrix profile of the hourly event-count series (Yeh et al.
    '16's all-pairs-similarity-search shape, kept EXACT): for every
    length-``m`` window the nearest other window under the
    UNNORMALIZED squared Euclidean distance — integer counts make
    every distance an exact integer, so argmin decisions carry no
    float hazard and the SQL oracle lands bit-for-bit. The standard
    trivial-match exclusion zone |i−j| < m applies; ties take the
    smallest neighbor index. Discord (max) and motif (min) rows of
    this table are the anomaly/repetition audit.

    Scale shape: ONE time-bounded combiner pass reduces the corpus
    to the zero-filled hour grid; the O(n·m) distance work runs
    driver-side on that metadata-sized series via one integer
    Gram matmul of the sliding-window matrix (dist² = ssq_i + ssq_j
    − 2·W_i·W_j) — the DTW/burst-DP convention."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = (df["ts"].astype("datetime64[us]").astype("int64")
             // 3_600_000_000)
        v, c = np.unique(h.to_numpy(np.int64), return_counts=True)
        return pd.DataFrame({"h": v, "y": c.astype(np.int64)})

    g = grouped_aggregate(
        ds.map_batches(partial, batch_format="pandas",
                       batch_size=65536),
        ["h"], {"y": ("y", "sum")}, result_hint="small").to_pandas()
    empty = pd.DataFrame({"w_start": pd.Series(dtype="int64"),
                          "nn_start": pd.Series(dtype="int64"),
                          "dist2": pd.Series(dtype="int64")})
    if g.empty or "h" not in g.columns:
        return empty
    h0 = int(g["h"].min())
    T = int(g["h"].max()) - h0 + 1
    y = np.zeros(T, dtype=np.int64)
    y[g["h"].to_numpy(np.int64) - h0] = g["y"].to_numpy(np.int64)
    n = T - m + 1
    if n < m + 1:            # no window has a non-trivial neighbor
        return empty
    W = np.lib.stride_tricks.sliding_window_view(y, m).astype(np.int64)
    ssq = (W * W).sum(axis=1)
    D = ssq[:, None] + ssq[None, :] - 2 * (W @ W.T)
    ii = np.arange(n)
    D[np.abs(ii[:, None] - ii[None, :]) < m] = np.iinfo(np.int64).max
    nn = D.argmin(axis=1)          # first minimum = smallest j tie
    return pd.DataFrame({
        "w_start": ii.astype(np.int64),
        "nn_start": nn.astype(np.int64),
        "dist2": D[ii, nn].astype(np.int64)})

def _matrix_profile_oracle_sql(m: int = 24) -> str:
    """Replay of ``q_events_matrix_profile``: the zero-filled hour
    grid, a starts × starts × k three-way join summing the exact
    integer squared differences outside the |i−j| < m exclusion
    zone, then the (dist2, j) rank-1 neighbor per window."""
    return f"""
        WITH b AS (SELECT min(epoch_us(ts) // 3600000000) AS h0,
                          max(epoch_us(ts) // 3600000000) AS h1
                   FROM events),
        hrs AS (SELECT unnest(range(0, CAST(h1 - h0 + 1 AS BIGINT)))
                       AS h FROM b),
        raw AS (SELECT epoch_us(ts) // 3600000000
                       - (SELECT h0 FROM b) AS h, count(*) AS y
                FROM events GROUP BY 1),
        grid AS MATERIALIZED (
            SELECT hrs.h, coalesce(raw.y, 0) AS y
            FROM hrs LEFT JOIN raw ON raw.h = hrs.h),
        starts AS (SELECT h AS i FROM grid
                   WHERE h <= (SELECT max(h) FROM grid) - {m - 1}),
        d AS MATERIALIZED (
            SELECT s1.i, s2.i AS j,
                   sum((g1.y - g2.y) * (g1.y - g2.y)) AS d2
            FROM starts s1 JOIN starts s2
                 ON abs(s1.i - s2.i) >= {m}
                 JOIN grid g1 ON g1.h >= s1.i AND g1.h < s1.i + {m}
                 JOIN grid g2 ON g2.h = s2.i + (g1.h - s1.i)
            GROUP BY s1.i, s2.i)
        SELECT CAST(i AS BIGINT) AS w_start,
               CAST(j AS BIGINT) AS nn_start,
               CAST(d2 AS BIGINT) AS dist2
        FROM (SELECT i, j, d2, row_number() OVER (
                  PARTITION BY i ORDER BY d2, j) AS rn FROM d)
        WHERE rn = 1 ORDER BY w_start"""

def q_events_emd(sf_dir: str):
    """1-D Wasserstein / earth-mover's distance (Monge 1781; the
    optimal-transport drift metric completing the KL/PSI/TVD/KS
    distance family) between the hour-of-day profiles of the top-2
    event types (count DESC, name ASC — the DTW pick): on the line
    with unit bin spacing EMD = Σ_h |CDF_A(h) − CDF_B(h)|, kept
    EXACT by cross-multiplying the integer cumulative counts
    (Σ_h |cumA·n_B − cumB·n_A|, one final divide by n_A·n_B). ONE
    vocabulary-bounded combiner pass crosses the cluster; the 24-bin
    arithmetic runs on the driver."""
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
    tot = counts.groupby("event_type")["c"].sum().reset_index()
    tot = tot.sort_values(["c", "event_type"],
                          ascending=[False, True])
    ta, tb = str(tot["event_type"].iloc[0]), \
        str(tot["event_type"].iloc[1])

    def profile(t: str) -> np.ndarray:
        g = counts[counts["event_type"] == t]
        y = np.zeros(24, dtype=np.int64)
        y[g["h"].to_numpy(np.int64)] = g["c"].to_numpy(np.int64)
        return y

    a, b = profile(ta), profile(tb)
    na, nb = int(a.sum()), int(b.sum())
    ca, cb = np.cumsum(a), np.cumsum(b)
    emd_scaled = int(np.abs(ca * nb - cb * na).sum())
    return pd.DataFrame({
        "type_a": [ta], "type_b": [tb],
        "n_a": np.array([na], dtype=np.int64),
        "n_b": np.array([nb], dtype=np.int64),
        "emd_scaled": np.array([emd_scaled], dtype=np.int64),
        "emd": [round(emd_scaled / (na * nb), 6)]})

_EMD_ORACLE_SQL = """
    WITH hc AS MATERIALIZED (
        SELECT event_type, CAST(hour(ts) AS BIGINT) AS h,
               count(*) AS c
        FROM events GROUP BY 1, 2),
    top2 AS (SELECT event_type,
                    row_number() OVER (ORDER BY sum(c) DESC,
                                       event_type ASC) AS rk
             FROM hc GROUP BY event_type QUALIFY rk <= 2),
    hrs AS (SELECT unnest(range(24)) AS h),
    grid AS MATERIALIZED (
        SELECT t.rk, hrs.h, coalesce(hc.c, 0) AS c
        FROM top2 t CROSS JOIN hrs
        LEFT JOIN hc ON hc.event_type = t.event_type
                    AND hc.h = hrs.h),
    cum AS MATERIALIZED (
        SELECT rk, h, SUM(c) OVER (PARTITION BY rk ORDER BY h)
                      AS cs
        FROM grid),
    n AS (SELECT sum(CASE WHEN rk = 1 THEN c END) AS na,
                 sum(CASE WHEN rk = 2 THEN c END) AS nb
          FROM grid),
    e AS (SELECT sum(abs(a.cs * n.nb - b.cs * n.na)) AS emd_scaled
          FROM cum a JOIN cum b ON a.h = b.h
                     AND a.rk = 1 AND b.rk = 2
          CROSS JOIN n)
    SELECT (SELECT event_type FROM top2 WHERE rk = 1) AS type_a,
           (SELECT event_type FROM top2 WHERE rk = 2) AS type_b,
           CAST(n.na AS BIGINT) AS n_a,
           CAST(n.nb AS BIGINT) AS n_b,
           CAST(e.emd_scaled AS BIGINT) AS emd_scaled,
           round(e.emd_scaled / (n.na * n.nb * 1.0), 6) AS emd
    FROM n CROSS JOIN e"""

def q_events_huffman(sf_dir: str, *, oracle_merges: int = 4):
    """Huffman code lengths (Huffman '52 — the optimal-prefix-code
    source-coding audit beside the front-coding/varint dictionary
    family) over the event-type frequency table: greedy merge of the
    two smallest trees under the STRICT key (weight, min-member
    symbol), new tree id = min member — fully deterministic, so the
    generated per-merge CTE oracle replays every pick bit-for-bit.
    ONE vocabulary-bounded combiner pass crosses the cluster; the
    |types|−1 merge loop runs driver-side on that metadata-sized
    table. Returns (etype, cnt, code_len, bits = cnt·code_len);
    Kraft equality Σ 2^−len = 1 and the Shannon H ≤ L̄ < H+1 bound
    are pytest-pinned. Asserts the type count matches the oracle's
    unrolled merge depth (the ``q_part_mst`` contract)."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_type"])
    cnt = grouped_aggregate(
        ds, ["event_type"], {"cnt": (None, "count")},
        result_hint="small").to_pandas().sort_values("event_type")
    types = [str(t) for t in cnt["event_type"]]
    ws = {t: int(c) for t, c in zip(types, cnt["cnt"])}
    assert len(types) == oracle_merges + 1, \
        f"{len(types)} types != oracle merge depth {oracle_merges}+1"

    # greedy merges under the strict (weight, id) key
    active = {t: ws[t] for t in types}          # id -> weight
    depth = dict.fromkeys(types, 0)             # symbol -> code len
    members = {t: [t] for t in types}           # id -> symbols
    while len(active) > 1:
        (i1, w1), (i2, w2) = sorted(
            active.items(), key=lambda kv: (kv[1], kv[0]))[:2]
        for s in members[i1] + members[i2]:
            depth[s] += 1
        nid = min(i1, i2)
        members[nid] = members.pop(i1) + members.pop(i2)
        del active[i1], active[i2]
        active[nid] = w1 + w2
    return pd.DataFrame({
        "etype": types,
        "cnt": np.array([ws[t] for t in types], dtype=np.int64),
        "code_len": np.array([depth[t] for t in types],
                             dtype=np.int64),
        "bits": np.array([ws[t] * depth[t] for t in types],
                         dtype=np.int64)})

def _huffman_oracle_sql(merges: int = 4) -> str:
    """Per-merge replay of ``q_events_huffman``: rank the active
    trees by the strict (weight, id) key, merge ranks 1–2 into a
    tree keyed by the smaller id, and bump the merged members'
    depths — one CTE triple per merge."""
    sql = """
        WITH a1 AS MATERIALIZED (
            SELECT event_type AS id, count(*) AS w
            FROM events GROUP BY 1),
        mb1 AS MATERIALIZED (
            SELECT id AS owner, id AS sym, 0 AS d FROM a1)"""
    for r in range(1, merges + 1):
        sql += f""",
        rk{r} AS MATERIALIZED (
            SELECT id, w, row_number() OVER (ORDER BY w, id) AS rn
            FROM a{r}),
        a{r + 1} AS MATERIALIZED (
            SELECT id, w FROM rk{r} WHERE rn > 2
            UNION ALL
            SELECT min(id), sum(w) FROM rk{r} WHERE rn <= 2),
        mb{r + 1} AS MATERIALIZED (
            SELECT CASE WHEN m.owner IN (
                       SELECT id FROM rk{r} WHERE rn <= 2)
                   THEN (SELECT min(id) FROM rk{r} WHERE rn <= 2)
                   ELSE m.owner END AS owner,
                   m.sym,
                   m.d + CASE WHEN m.owner IN (
                       SELECT id FROM rk{r} WHERE rn <= 2)
                   THEN 1 ELSE 0 END AS d
            FROM mb{r} m)"""
    return sql + f"""
        SELECT m.sym AS etype, CAST(a.w AS BIGINT) AS cnt,
               CAST(m.d AS BIGINT) AS code_len,
               CAST(a.w * m.d AS BIGINT) AS bits
        FROM mb{merges + 1} m JOIN a1 a ON a.id = m.sym
        ORDER BY etype"""

def q_events_holt_winters(sf_dir: str, *, alpha: float = 0.2,
                          beta: float = 0.1, gamma: float = 0.3,
                          period: int = 24):
    """Holt-Winters additive triple-exponential smoothing (Winters
    '60 — the seasonal completion of ``q_events_holt``) of the
    zero-filled hourly count series, with the classic two-season
    seed: l = mean(season 1), b = (mean(season 2) − mean(season 1))
    / period, s_i = y_i − l. Every update is performed in the exact
    float64 expression order the generated recursive-CTE oracle
    replays — the seasonal state rides the recursion as ``period``
    explicit slot columns, one CASE per slot — so final level,
    trend, and all 24 seasonal components land bit-for-bit after
    mirrored 6-dp rounding (the ``q_events_holt`` convention).

    Scale shape: ONE time-bounded combiner pass reduces the corpus
    to the hour grid; the O(T) three-state recursion runs
    driver-side on that metadata-sized series."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = (df["ts"].astype("datetime64[us]").astype("int64")
             // 3_600_000_000)
        v, c = np.unique(h.to_numpy(np.int64), return_counts=True)
        return pd.DataFrame({"h": v, "y": c.astype(np.int64)})

    g = grouped_aggregate(
        ds.map_batches(partial, batch_format="pandas",
                       batch_size=65536),
        ["h"], {"y": ("y", "sum")}, result_hint="small").to_pandas()
    h0 = int(g["h"].min())
    T = int(g["h"].max()) - h0 + 1
    y = np.zeros(T, dtype=np.int64)
    y[g["h"].to_numpy(np.int64) - h0] = g["y"].to_numpy(np.int64)
    assert T >= 2 * period, "need two full seasons to seed"

    lev = float(int(y[:period].sum()) / float(period))
    tr = float((int(y[period:2 * period].sum()) / float(period)
                - int(y[:period].sum()) / float(period)) / period)
    seas = [float(y[i]) - lev for i in range(period)]
    for t in range(period, T):
        slot = t % period
        l_new = (alpha * (float(y[t]) - seas[slot])
                 + (1.0 - alpha) * (lev + tr))
        tr = beta * (l_new - lev) + (1.0 - beta) * tr
        seas[slot] = (gamma * (float(y[t]) - l_new)
                      + (1.0 - gamma) * seas[slot])
        lev = l_new

    def r6(x: float) -> float:
        return float(np.copysign(np.floor(abs(x) * 1e6 + 0.5), x)
                     / 1e6)

    return pd.DataFrame({
        "slot": np.arange(period, dtype=np.int64),
        "seasonal": [r6(s) for s in seas],
        "level": [r6(lev)] * period,
        "trend": [r6(tr)] * period})

def _holt_winters_oracle_sql(alpha: float = 0.2, beta: float = 0.1,
                             gamma: float = 0.3,
                             period: int = 24) -> str:
    """Recursive-CTE replay of ``q_events_holt_winters``: the
    seasonal state rides as ``period`` explicit slot columns; the
    inlined l_new expression reproduces the engine's float64 op
    order exactly."""
    P, a, b_, c = period, alpha, beta, gamma
    scols = ", ".join(
        f"CAST((SELECT y FROM grid WHERE t = {i}) AS DOUBLE) "
        f"- (SELECT sum(y) FROM grid WHERE t < {P}) / {float(P)} "
        f"AS s{i}"
        for i in range(P))
    slot_ref = "CASE (rec.t + 1) % " + str(P) + " " + " ".join(
        f"WHEN {i} THEN rec.s{i}" for i in range(P)) + " END"
    l_new = (f"{a} * (CAST(g.y AS DOUBLE) - ({slot_ref})) "
             f"+ {1.0 - a} * (rec.l + rec.b)")
    supd = ", ".join(
        f"CASE WHEN (rec.t + 1) % {P} = {i} THEN "
        f"{c} * (CAST(g.y AS DOUBLE) - ({l_new})) "
        f"+ {1.0 - c} * rec.s{i} ELSE rec.s{i} END AS s{i}"
        for i in range(P))
    return f"""
        WITH RECURSIVE bnd AS (
            SELECT min(epoch_us(ts) // 3600000000) AS h0,
                   max(epoch_us(ts) // 3600000000) AS h1
            FROM events),
        hrs AS (SELECT unnest(range(0, CAST(h1 - h0 + 1 AS BIGINT)))
                       AS t FROM bnd),
        raw AS (SELECT epoch_us(ts) // 3600000000
                       - (SELECT h0 FROM bnd) AS t, count(*) AS y
                FROM events GROUP BY 1),
        grid AS MATERIALIZED (
            SELECT hrs.t, coalesce(raw.y, 0) AS y
            FROM hrs LEFT JOIN raw ON raw.t = hrs.t),
        rec AS (
            SELECT CAST({P - 1} AS BIGINT) AS t,
                   (SELECT sum(y) FROM grid WHERE t < {P})
                       / {float(P)} AS l,
                   ((SELECT sum(y) FROM grid
                     WHERE t >= {P} AND t < {2 * P}) / {float(P)}
                    - (SELECT sum(y) FROM grid WHERE t < {P})
                      / {float(P)}) / {float(P)} AS b,
                   {scols}
            UNION ALL
            SELECT rec.t + 1,
                   {l_new} AS l,
                   {b_} * (({l_new}) - rec.l) + {1.0 - b_} * rec.b
                       AS b,
                   {supd}
            FROM rec JOIN grid g ON g.t = rec.t + 1),
        fin AS (SELECT * FROM rec
                WHERE t = (SELECT max(t) FROM grid))
        SELECT CAST(u.slot AS BIGINT) AS slot,
               round(CASE u.slot {' '.join(
                   f'WHEN {i} THEN fin.s{i}' for i in range(P))}
                     END, 6) AS seasonal,
               round(fin.l, 6) AS level,
               round(fin.b, 6) AS trend
        FROM fin, (SELECT unnest(range({P})) AS slot) u
        ORDER BY slot"""

def q_events_did(sf_dir: str):
    """Difference-in-differences estimate (the Card–Krueger '94
    two-period design, completing the SRM/CUPED experimentation
    family): arms from the md5("ab|user") parity bucketing the A/B
    family shares, periods split at the stream's integer timestamp
    midpoint, metric = mean event value. All four cell aggregates
    stay EXACT integers (event counts + value cents); the four
    means and DiD = (T̄post − T̄pre) − (C̄post − C̄pre) are computed
    in one identical expression order on both engines, rounded to
    6. ONE combiner pass over (arm, period) partials — the corpus
    never moves."""
    import pyarrow.parquet as _pq

    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    from jerex_ray.util import md5_hash64_batch
    configure_data_context()
    ts = _pq.read_table(f"{sf_dir}/events.parquet",
                        columns=["ts"])["ts"].to_pandas() \
        .astype("datetime64[us]").astype("int64")
    mid = (int(ts.min()) + int(ts.max())) // 2
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        arm = (md5_hash64_batch(
            [f"ab|{u}" for u in df["user_id"]]) % 2).astype(np.int64)
        post = (df["ts"].astype("datetime64[us]").astype("int64")
                .to_numpy() > mid).astype(np.int64)
        v = df["value"].to_numpy(np.float64)
        cents = np.copysign(np.floor(np.abs(v) * 100.0 + 0.5), v) \
            .astype(np.int64)
        g = pd.DataFrame({"arm": arm, "post": post, "c": cents,
                          "n": np.int64(1)}) \
            .groupby(["arm", "post"], sort=False, as_index=False) \
            .sum()
        return g.astype({"arm": "int64", "post": "int64",
                         "c": "int64", "n": "int64"})

    cells = grouped_aggregate(
        ds.map_batches(partial, batch_format="pandas",
                       batch_size=65536),
        ["arm", "post"], {"sum_cents": ("c", "sum"),
                          "n": ("n", "sum")},
        result_hint="small").to_pandas() \
        .sort_values(["arm", "post"]).reset_index(drop=True)

    def mean(arm: int, post: int) -> float:
        r = cells[(cells["arm"] == arm) & (cells["post"] == post)]
        return float(int(r["sum_cents"].iloc[0])
                     / (int(r["n"].iloc[0]) * 100.0))

    did = (mean(1, 1) - mean(1, 0)) - (mean(0, 1) - mean(0, 0))
    cells["mean_value"] = [
        _round_half_away(mean(int(a), int(p)), 6)
        for a, p in zip(cells["arm"], cells["post"])]
    cells["did"] = _round_half_away(did, 6)
    return cells[["arm", "post", "n", "sum_cents", "mean_value",
                  "did"]]

_DID_ORACLE_SQL = """
    WITH b AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2
                   AS mid FROM events),
    cells AS MATERIALIZED (
        SELECT CAST('0x' || substr(md5('ab|' ||
                   CAST(user_id AS VARCHAR)), 1, 16) AS UBIGINT)
                   % 2 AS arm,
               CASE WHEN epoch_us(ts) > (SELECT mid FROM b)
                    THEN 1 ELSE 0 END AS post,
               CAST(sum(CAST(round(value * 100.0, 0) AS BIGINT))
                    AS BIGINT) AS sum_cents,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2),
    m AS (SELECT
        (SELECT sum_cents / (n * 100.0) FROM cells
         WHERE arm = 1 AND post = 1) AS t1,
        (SELECT sum_cents / (n * 100.0) FROM cells
         WHERE arm = 1 AND post = 0) AS t0,
        (SELECT sum_cents / (n * 100.0) FROM cells
         WHERE arm = 0 AND post = 1) AS c1,
        (SELECT sum_cents / (n * 100.0) FROM cells
         WHERE arm = 0 AND post = 0) AS c0)
    SELECT CAST(cells.arm AS BIGINT) AS arm,
           CAST(cells.post AS BIGINT) AS post, cells.n,
           cells.sum_cents,
           round(cells.sum_cents / (cells.n * 100.0), 6)
               AS mean_value,
           round((m.t1 - m.t0) - (m.c1 - m.c0), 6) AS did
    FROM cells CROSS JOIN m ORDER BY arm, post"""

def q_events_lincount(sf_dir: str, *, m: int = 4096):
    """Linear-counting distinct estimate (Whang et al. '90 — the
    load-factor sketch completing the HLL/KMV/AMS/CMS/Bloom family)
    of the distinct event users: bitmap position md5("lc|u") % m,
    estimate = m·ln(m/(m−occupied)). The ONLY cross-cluster state
    is the position table (≤ m rows through the combiner — the
    Bloom-bitmap contract); the exact distinct count rides the same
    pass for the error column. ln is glibc on both engines; one
    final expression, rounded to 6."""
    import math

    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    from jerex_ray.util import md5_hash64_batch
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id"])
    users = grouped_aggregate(ds, ["user_id"],
                              {"n": (None, "count")})
    exact = users.count()

    def pos(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "user_id" not in df.columns:
            return pd.DataFrame({"p": pd.Series(dtype="int64")})
        h = (md5_hash64_batch([f"lc|{u}" for u in df["user_id"]])
             % m).astype(np.int64)
        return pd.DataFrame({"p": np.unique(h)})

    occ = grouped_aggregate(users.map_batches(
        pos, batch_format="pandas"), ["p"],
        {"n": (None, "count")}).count()
    est = m * math.log(m / float(m - occ))
    return pd.DataFrame({
        "m": np.array([m], dtype=np.int64),
        "occupied": np.array([occ], dtype=np.int64),
        "exact_distinct": np.array([exact], dtype=np.int64),
        "estimate": [_round_half_away(est, 6)],
        "rel_err": [_round_half_away(est / exact - 1.0, 6)]})

def _lincount_oracle_sql(m: int = 4096) -> str:
    return f"""
        WITH u AS (SELECT DISTINCT user_id FROM events),
        p AS (SELECT DISTINCT CAST('0x' || substr(md5('lc|' ||
                  CAST(user_id AS VARCHAR)), 1, 16) AS UBIGINT)
                  % {m} AS p
              FROM u),
        s AS (SELECT (SELECT count(*) FROM p) AS occ,
                     (SELECT count(*) FROM u) AS ex)
        SELECT CAST({m} AS BIGINT) AS m,
               CAST(occ AS BIGINT) AS occupied,
               CAST(ex AS BIGINT) AS exact_distinct,
               round({m} * ln({m} / CAST({m} - occ AS DOUBLE)), 6)
                   AS estimate,
               round({m} * ln({m} / CAST({m} - occ AS DOUBLE)) / ex
                     - 1.0, 6) AS rel_err
        FROM s"""

def q_events_mann_kendall(sf_dir: str):
    """Mann–Kendall trend test (Mann '45 / Kendall '75 — the
    nonparametric significance twin of the Theil–Sen slope) on the
    zero-filled hourly count series: S = Σ_{i<j} sign(y_j − y_i)
    and the tie-corrected variance Var(S) = [n(n−1)(2n+5) −
    Σ_t t(t−1)(2t+5)]/18 are EXACT INTEGERS (variance carried ×18),
    so the only floats are the final continuity-corrected
    Z = (S∓1)/√Var — one identical expression on both engines.
    ONE time-bounded combiner pass reduces the corpus to the hour
    grid; the O(T²) sign count is one vectorized comparison matrix
    driver-side on that metadata-sized series."""
    import math

    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = (df["ts"].astype("datetime64[us]").astype("int64")
             // 3_600_000_000)
        v, c = np.unique(h.to_numpy(np.int64), return_counts=True)
        return pd.DataFrame({"h": v, "y": c.astype(np.int64)})

    g = grouped_aggregate(
        ds.map_batches(partial, batch_format="pandas",
                       batch_size=65536),
        ["h"], {"y": ("y", "sum")}, result_hint="small").to_pandas()
    h0 = int(g["h"].min())
    T = int(g["h"].max()) - h0 + 1
    y = np.zeros(T, dtype=np.int64)
    y[g["h"].to_numpy(np.int64) - h0] = g["y"].to_numpy(np.int64)
    diff = np.sign(y[None, :] - y[:, None])
    S = int(np.triu(diff, 1).sum())
    _, tie = np.unique(y, return_counts=True)
    var18 = int(T) * (T - 1) * (2 * T + 5) \
        - int(sum(int(t) * (t - 1) * (2 * t + 5) for t in tie))
    var = var18 / 18.0
    z = ((S - 1) / math.sqrt(var) if S > 0
         else (S + 1) / math.sqrt(var) if S < 0 else 0.0)
    return pd.DataFrame({
        "n": np.array([T], dtype=np.int64),
        "s": np.array([S], dtype=np.int64),
        "var18": np.array([var18], dtype=np.int64),
        "z": [_round_half_away(z, 6)]})

_MANN_KENDALL_ORACLE_SQL = """
    WITH b AS (SELECT min(epoch_us(ts) // 3600000000) AS h0,
                      max(epoch_us(ts) // 3600000000) AS h1
               FROM events),
    hrs AS (SELECT unnest(range(0, CAST(h1 - h0 + 1 AS BIGINT)))
                   AS h FROM b),
    raw AS (SELECT epoch_us(ts) // 3600000000
                   - (SELECT h0 FROM b) AS h, count(*) AS y
            FROM events GROUP BY 1),
    grid AS MATERIALIZED (
        SELECT hrs.h, coalesce(raw.y, 0) AS y
        FROM hrs LEFT JOIN raw ON raw.h = hrs.h),
    s AS (SELECT CAST(sum(CASE WHEN b.y > a.y THEN 1
                               WHEN b.y < a.y THEN -1
                               ELSE 0 END) AS BIGINT) AS s
          FROM grid a JOIN grid b ON a.h < b.h),
    n AS (SELECT count(*) AS n FROM grid),
    ties AS (SELECT CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0)
                         AS BIGINT) AS tt
             FROM (SELECT count(*) AS t FROM grid GROUP BY y)),
    v AS (SELECT CAST(n.n * (n.n - 1) * (2 * n.n + 5) - ties.tt
                      AS BIGINT) AS var18
          FROM n CROSS JOIN ties)
    SELECT CAST(n.n AS BIGINT) AS n, s.s, v.var18,
           round(CASE WHEN s.s > 0
                      THEN (s.s - 1) / sqrt(v.var18 / 18.0)
                      WHEN s.s < 0
                      THEN (s.s + 1) / sqrt(v.var18 / 18.0)
                      ELSE 0.0 END, 6) AS z
    FROM n CROSS JOIN s CROSS JOIN v"""

def q_events_kendall_tau(sf_dir: str):
    """Kendall τ-b rank correlation (Kendall '45, the tie-corrected
    form) between the hourly event COUNT and the hourly total VALUE
    in integer cents — the ordinal companion of the Pearson
    correlation and Theil–Sen queries: concordant/discordant pair
    counts and both tie terms are EXACT INTEGERS (vectorized sign
    matrices over the time-bounded grid), the only float is the
    final τ = (C−D)/√((n0−n1)(n0−n2)) expression, identical on
    both engines. ONE combiner pass reduces the corpus to the hour
    grid; the O(T²) pair census is two sign matmuls driver-side."""
    import math

    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = (df["ts"].astype("datetime64[us]").astype("int64")
             // 3_600_000_000).to_numpy(np.int64)
        v = df["value"].to_numpy(np.float64)
        cents = np.copysign(np.floor(np.abs(v) * 100.0 + 0.5), v) \
            .astype(np.int64)
        g = pd.DataFrame({"h": h, "n": np.int64(1), "c": cents}) \
            .groupby("h", sort=False, as_index=False).sum()
        return g.astype({"h": "int64", "n": "int64", "c": "int64"})

    g = grouped_aggregate(
        ds.map_batches(partial, batch_format="pandas",
                       batch_size=65536),
        ["h"], {"n": ("n", "sum"), "c": ("c", "sum")},
        result_hint="small").to_pandas()
    h0 = int(g["h"].min())
    T = int(g["h"].max()) - h0 + 1
    x = np.zeros(T, dtype=np.int64)
    y = np.zeros(T, dtype=np.int64)
    idx = g["h"].to_numpy(np.int64) - h0
    x[idx] = g["n"].to_numpy(np.int64)
    y[idx] = g["c"].to_numpy(np.int64)
    sx = np.sign(x[None, :] - x[:, None])
    sy = np.sign(y[None, :] - y[:, None])
    prod = np.triu(sx * sy, 1)
    C = int((prod == 1).sum())
    D = int((prod == -1).sum())
    n0 = T * (T - 1) // 2
    _, tx = np.unique(x, return_counts=True)
    _, ty = np.unique(y, return_counts=True)
    n1 = int(sum(int(t) * (t - 1) // 2 for t in tx))
    n2 = int(sum(int(t) * (t - 1) // 2 for t in ty))
    tau = (C - D) / math.sqrt(float((n0 - n1)) * (n0 - n2))
    return pd.DataFrame({
        "n": np.array([T], dtype=np.int64),
        "concordant": np.array([C], dtype=np.int64),
        "discordant": np.array([D], dtype=np.int64),
        "ties_x": np.array([n1], dtype=np.int64),
        "ties_y": np.array([n2], dtype=np.int64),
        "tau_b": [_round_half_away(tau, 6)]})

_KENDALL_TAU_ORACLE_SQL = """
    WITH b AS (SELECT min(epoch_us(ts) // 3600000000) AS h0,
                      max(epoch_us(ts) // 3600000000) AS h1
               FROM events),
    hrs AS (SELECT unnest(range(0, CAST(h1 - h0 + 1 AS BIGINT)))
                   AS h FROM b),
    raw AS (SELECT epoch_us(ts) // 3600000000
                   - (SELECT h0 FROM b) AS h,
                   count(*) AS n,
                   sum(CAST(round(value * 100.0, 0) AS BIGINT))
                       AS c
            FROM events GROUP BY 1),
    grid AS MATERIALIZED (
        SELECT hrs.h, coalesce(raw.n, 0) AS x,
               coalesce(raw.c, 0) AS y
        FROM hrs LEFT JOIN raw ON raw.h = hrs.h),
    pairs AS (
        SELECT CAST(count(*) FILTER (WHERE
                   (b.x - a.x) * (b.y - a.y) > 0) AS BIGINT) AS c,
               CAST(count(*) FILTER (WHERE
                   (b.x - a.x) * (b.y - a.y) < 0) AS BIGINT) AS d
        FROM grid a JOIN grid b ON a.h < b.h),
    n AS (SELECT count(*) AS n FROM grid),
    tx AS (SELECT CAST(coalesce(sum(t * (t - 1) // 2), 0)
                       AS BIGINT) AS n1
           FROM (SELECT count(*) AS t FROM grid GROUP BY x)),
    ty AS (SELECT CAST(coalesce(sum(t * (t - 1) // 2), 0)
                       AS BIGINT) AS n2
           FROM (SELECT count(*) AS t FROM grid GROUP BY y))
    SELECT CAST(n.n AS BIGINT) AS n, pairs.c AS concordant,
           pairs.d AS discordant, tx.n1 AS ties_x, ty.n2 AS ties_y,
           round((pairs.c - pairs.d) / sqrt(
               CAST(n.n * (n.n - 1) // 2 - tx.n1 AS DOUBLE)
               * (n.n * (n.n - 1) // 2 - ty.n2)), 6) AS tau_b
    FROM n CROSS JOIN pairs CROSS JOIN tx CROSS JOIN ty"""

def q_events_perm_test(sf_dir: str, *, n_perms: int = 20):
    """Derandomized permutation test (Fisher '35 exact-resampling
    logic, md5-seeded — the resampling member of the
    Welch/chi²/KS/logrank testing family): does mean event value
    differ between the md5("ab|u") arms? Each pseudo-permutation k
    reassigns users by md5("perm{k}|u") parity; the mean
    difference comparison |diff_k| ≥ |diff_obs| is decided EXACTLY
    by cross-multiplied integer cents (|s1·n0 − s0·n1| terms scaled
    by the other side's n1·n0 — Python big ints here, HUGEINT in
    the oracle), so the p-value (more_extreme+1)/(K+1) carries zero
    float hazard. ONE combiner pass computes all K+1 labelings'
    (arm, sum, n) cells at once; the K-bounded comparison table is
    driver-side."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    from jerex_ray.util import md5_hash64_batch
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id", "value"])

    salts = ["ab"] + [f"perm{k}" for k in range(n_perms)]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value"].to_numpy(np.float64)
        cents = np.copysign(np.floor(np.abs(v) * 100.0 + 0.5), v) \
            .astype(np.int64)
        users = df["user_id"].to_numpy()
        frames = []
        for ki, salt in enumerate(salts):
            arm = (md5_hash64_batch(
                [f"{salt}|{u}" for u in users]) % 2).astype(np.int64)
            g = pd.DataFrame({"k": np.int64(ki), "arm": arm,
                              "s": cents, "n": np.int64(1)}) \
                .groupby(["k", "arm"], sort=False, as_index=False) \
                .sum()
            frames.append(g)
        return pd.concat(frames, ignore_index=True).astype(
            {"k": "int64", "arm": "int64", "s": "int64",
             "n": "int64"})

    cells = grouped_aggregate(
        ds.map_batches(partial, batch_format="pandas",
                       batch_size=65536),
        ["k", "arm"], {"s": ("s", "sum"), "n": ("n", "sum")},
        result_hint="small").to_pandas()

    def stat(ki: int) -> tuple[int, int]:
        """(|s1·n0 − s0·n1|, n1·n0) as exact Python ints."""
        c = cells[cells["k"] == ki]
        r0 = c[c["arm"] == 0].iloc[0]
        r1 = c[c["arm"] == 1].iloc[0]
        num = abs(int(r1["s"]) * int(r0["n"])
                  - int(r0["s"]) * int(r1["n"]))
        return num, int(r1["n"]) * int(r0["n"])

    num_o, den_o = stat(0)
    more = sum(1 for ki in range(1, n_perms + 1)
               if stat(ki)[0] * den_o >= num_o * stat(ki)[1])
    p = (more + 1) / (n_perms + 1)
    return pd.DataFrame({
        "n_perms": np.array([n_perms], dtype=np.int64),
        "more_extreme": np.array([more], dtype=np.int64),
        "diff_obs": [_round_half_away(num_o / den_o / 100.0
                                      if den_o else 0.0, 6)],
        "p_value": [_round_half_away(p, 6)]})

def _perm_test_oracle_sql(n_perms: int = 20) -> str:
    return f"""
        WITH salts AS (
            SELECT 0 AS k, 'ab' AS salt
            UNION ALL
            SELECT i + 1, 'perm' || CAST(i AS VARCHAR)
            FROM (SELECT unnest(range({n_perms})) AS i)),
        cells AS MATERIALIZED (
            SELECT s.k,
                   CAST('0x' || substr(md5(s.salt || '|' ||
                       CAST(e.user_id AS VARCHAR)), 1, 16)
                       AS UBIGINT) % 2 AS arm,
                   CAST(sum(CAST(round(e.value * 100.0, 0)
                                 AS BIGINT)) AS HUGEINT) AS sm,
                   CAST(count(*) AS HUGEINT) AS n
            FROM events e CROSS JOIN salts s
            GROUP BY 1, 2),
        st AS MATERIALIZED (
            SELECT a.k, abs(b.sm * a.n - a.sm * b.n) AS num,
                   b.n * a.n AS den
            FROM cells a JOIN cells b ON a.k = b.k
            WHERE a.arm = 0 AND b.arm = 1),
        obs AS (SELECT num, den FROM st WHERE k = 0),
        cmp AS (SELECT CAST(count(*) FILTER (
                    WHERE st.num * obs.den >= obs.num * st.den)
                    AS BIGINT) AS more
                FROM st CROSS JOIN obs WHERE st.k > 0)
        SELECT CAST({n_perms} AS BIGINT) AS n_perms,
               cmp.more AS more_extreme,
               round(CAST(obs.num AS DOUBLE) / CAST(obs.den
                     AS DOUBLE) / 100.0, 6) AS diff_obs,
               round((cmp.more + 1) / ({n_perms} + 1.0), 6)
                   AS p_value
        FROM cmp CROSS JOIN obs"""

def q_events_median_polish(sf_dir: str, *, iters: int = 2):
    """Tukey median polish (Tukey '77 EDA ch. 10 — the robust
    two-way decomposition beside the mean-based rollups) of the
    day-of-week × hour-of-day count grid: ``iters`` alternating
    row/column median sweeps split each cell into row effect +
    column effect + residual. Worked in 16×-SCALED integers: cell
    values start as multiples of 16 and each median (average of two
    middles) at worst halves the granularity, so four sweeps stay
    EXACT integers end-to-end — no float anywhere, and the unrolled
    window-median SQL replays every sweep bit-for-bit. ONE
    vocabulary-bounded combiner pass (≤168 cells) crosses the
    cluster; the sweeps run driver-side on that grid."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].astype("datetime64[us]").astype("int64")
        days = us // 86_400_000_000
        dow = ((days + 4) % 7).astype(np.int64)   # 1970-01-01 = Thu
        hod = ((us // 3_600_000_000) % 24).astype(np.int64)
        g = pd.DataFrame({"dow": dow, "hod": hod}) \
            .groupby(["dow", "hod"], sort=False).size() \
            .reset_index(name="c")
        return g.astype({"dow": "int64", "hod": "int64",
                         "c": "int64"})

    g = grouped_aggregate(
        ds.map_batches(partial, batch_format="pandas",
                       batch_size=65536),
        ["dow", "hod"], {"c": ("c", "sum")},
        result_hint="small").to_pandas()
    M = np.zeros((7, 24), dtype=np.int64)
    M[g["dow"].to_numpy(np.int64), g["hod"].to_numpy(np.int64)] = \
        g["c"].to_numpy(np.int64)
    R = M * 16                      # scaled residuals
    row_eff = np.zeros(7, dtype=np.int64)
    col_eff = np.zeros(24, dtype=np.int64)
    for _ in range(iters):
        rm = np.median(R, axis=1).astype(np.int64)
        R = R - rm[:, None]
        row_eff = row_eff + rm
        cm = np.median(R, axis=0).astype(np.int64)
        R = R - cm[None, :]
        col_eff = col_eff + cm
    dows = np.repeat(np.arange(7, dtype=np.int64), 24)
    hods = np.tile(np.arange(24, dtype=np.int64), 7)
    return pd.DataFrame({
        "dow": dows, "hod": hods,
        "y": M[dows, hods],
        "row_eff16": row_eff[dows],
        "col_eff16": col_eff[hods],
        "resid16": R[dows, hods]})

def _median_polish_oracle_sql(iters: int = 2) -> str:
    sql = """
        WITH dows AS (SELECT unnest(range(7)) AS dow),
        hods AS (SELECT unnest(range(24)) AS hod),
        raw AS (SELECT ((epoch_us(ts) // 86400000000) + 4) % 7
                           AS dow,
                       (epoch_us(ts) // 3600000000) % 24 AS hod,
                       count(*) AS c
                FROM events GROUP BY 1, 2),
        m0 AS MATERIALIZED (
            SELECT dows.dow, hods.hod,
                   coalesce(raw.c, 0) AS y,
                   coalesce(raw.c, 0) * 16 AS v
            FROM dows CROSS JOIN hods
            LEFT JOIN raw ON raw.dow = dows.dow
                         AND raw.hod = hods.hod)"""
    prev, step = "m0", 0
    reff = []
    ceff = []
    for _ in range(iters):
        step += 1
        sql += f""",
        rm{step} AS (SELECT dow, CAST(median(v) AS BIGINT) AS m
                     FROM {prev} GROUP BY dow),
        mr{step} AS MATERIALIZED (
            SELECT p.dow, p.hod, p.y, p.v - r.m AS v
            FROM {prev} p JOIN rm{step} r ON r.dow = p.dow)"""
        reff.append(f"rm{step}")
        prev = f"mr{step}"
        sql += f""",
        cm{step} AS (SELECT hod, CAST(median(v) AS BIGINT) AS m
                     FROM {prev} GROUP BY hod),
        mc{step} AS MATERIALIZED (
            SELECT p.dow, p.hod, p.y, p.v - c.m AS v
            FROM {prev} p JOIN cm{step} c ON c.hod = p.hod)"""
        ceff.append(f"cm{step}")
        prev = f"mc{step}"
    rsum = " + ".join(f"(SELECT m FROM {t} WHERE {t}.dow = f.dow)"
                      for t in reff)
    csum = " + ".join(f"(SELECT m FROM {t} WHERE {t}.hod = f.hod)"
                      for t in ceff)
    return sql + f"""
        SELECT CAST(f.dow AS BIGINT) AS dow,
               CAST(f.hod AS BIGINT) AS hod,
               CAST(f.y AS BIGINT) AS y,
               CAST({rsum} AS BIGINT) AS row_eff16,
               CAST({csum} AS BIGINT) AS col_eff16,
               CAST(f.v AS BIGINT) AS resid16
        FROM {prev} f ORDER BY dow, hod"""

def q_events_ransac(sf_dir: str, *, k: int = 32, eps: int = 5):
    """Derandomized RANSAC line fit (Fischler & Bolles '81 — the
    outlier-immune model-fitting loop, md5-seeded like every
    sampling op here) on the hourly (t, count) points: candidate
    c picks the two DISTINCT support points with md5("ransac|c|0/1")
    ranks over the hour grid, and a point is an inlier iff its
    vertical distance to the candidate line is ≤ ``eps`` — decided
    EXACTLY by the cross-multiplied integer test
    |y·Δt − y₁·Δt − Δy·(t−t₁)| ≤ eps·|Δt| (no division anywhere).
    Best candidate by (inliers DESC, candidate ASC). ONE combiner
    pass to the grid; the k×T inlier census is one vectorized
    integer matrix driver-side; the oracle replays every candidate
    via a grid × candidates lateral."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    from jerex_ray.util import md5_hash64
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = (df["ts"].astype("datetime64[us]").astype("int64")
             // 3_600_000_000)
        v, c = np.unique(h.to_numpy(np.int64), return_counts=True)
        return pd.DataFrame({"h": v, "y": c.astype(np.int64)})

    g = grouped_aggregate(
        ds.map_batches(partial, batch_format="pandas",
                       batch_size=65536),
        ["h"], {"y": ("y", "sum")}, result_hint="small").to_pandas()
    h0 = int(g["h"].min())
    T = int(g["h"].max()) - h0 + 1
    y = np.zeros(T, dtype=np.int64)
    y[g["h"].to_numpy(np.int64) - h0] = g["y"].to_numpy(np.int64)
    t = np.arange(T, dtype=np.int64)
    rows = []
    for c in range(k):
        i = md5_hash64(f"ransac|{c}|0") % T
        j = md5_hash64(f"ransac|{c}|1") % (T - 1)
        j = j + (j >= i)                # distinct second pick
        t1, y1 = int(t[i]), int(y[i])
        dt, dy = int(t[j]) - t1, int(y[j]) - y1
        lhs = np.abs(y * dt - y1 * dt - dy * (t - t1))
        inl = int((lhs <= eps * abs(dt)).sum())
        rows.append((c, t1, int(t[j]), inl))
    rows.sort(key=lambda r: (-r[3], r[0]))
    best = rows[0]
    out = pd.DataFrame(rows, columns=["cand", "t1", "t2",
                                      "inliers"]).astype("int64")
    out["best_cand"] = np.int64(best[0])
    out["best_inliers"] = np.int64(best[3])
    return out.sort_values("cand").reset_index(drop=True)

def _ransac_oracle_sql(k: int = 32, eps: int = 5) -> str:
    h = ("CAST('0x' || substr(md5('ransac|' || CAST(c.c AS VARCHAR)"
         " || '|{b}'), 1, 16) AS UBIGINT)")
    return f"""
        WITH b AS (SELECT min(epoch_us(ts) // 3600000000) AS h0,
                          max(epoch_us(ts) // 3600000000) AS h1
                   FROM events),
        hrs AS (SELECT unnest(range(0,
                    CAST(h1 - h0 + 1 AS BIGINT))) AS t FROM b),
        raw AS (SELECT epoch_us(ts) // 3600000000
                       - (SELECT h0 FROM b) AS t, count(*) AS y
                FROM events GROUP BY 1),
        grid AS MATERIALIZED (
            SELECT hrs.t, coalesce(raw.y, 0) AS y
            FROM hrs LEFT JOIN raw ON raw.t = hrs.t),
        n AS (SELECT count(*) AS t FROM grid),
        cand AS MATERIALIZED (
            SELECT c.c,
                   CAST({h.format(b='0')} % n.t AS BIGINT) AS i,
                   CAST({h.format(b='1')} % (n.t - 1) AS BIGINT)
                       AS j0
            FROM (SELECT unnest(range({k})) AS c) c CROSS JOIN n),
        picks AS MATERIALIZED (
            SELECT c, i AS t1,
                   CASE WHEN j0 >= i THEN j0 + 1 ELSE j0 END AS t2
            FROM cand),
        lines AS MATERIALIZED (
            SELECT p.c, p.t1, p.t2, g1.y AS y1,
                   p.t2 - p.t1 AS dt, g2.y - g1.y AS dy
            FROM picks p JOIN grid g1 ON g1.t = p.t1
                         JOIN grid g2 ON g2.t = p.t2),
        census AS MATERIALIZED (
            SELECT l.c, l.t1, l.t2,
                   CAST(count(*) FILTER (WHERE
                       abs(g.y * l.dt - l.y1 * l.dt
                           - l.dy * (g.t - l.t1))
                       <= {eps} * abs(l.dt)) AS BIGINT) AS inliers
            FROM lines l CROSS JOIN grid g
            GROUP BY l.c, l.t1, l.t2),
        best AS (SELECT c AS bc, inliers AS bi FROM census
                 ORDER BY inliers DESC, c ASC LIMIT 1)
        SELECT CAST(c AS BIGINT) AS cand, CAST(t1 AS BIGINT) AS t1,
               CAST(t2 AS BIGINT) AS t2, inliers,
               CAST(best.bc AS BIGINT) AS best_cand,
               CAST(best.bi AS BIGINT) AS best_inliers
        FROM census CROSS JOIN best ORDER BY cand"""

def q_events_concurrency_histogram(sf_dir: str):
    """Time-at-concurrency histogram — for every concurrency level
    k, the total microseconds the system spent with exactly k
    sessions active (each event occupies [ts, ts + value minutes)):
    the full sweep-line distribution whose max row is
    ``q_events_max_concurrency`` and whose Σ k·dur / horizon is
    Little's-law L. Same distributed exact-prefix-sum machinery:
    endpoint explode → per-timestamp net delta (combiner) →
    quantile range buckets → per-bucket LOCAL level histograms and
    boundary metadata → driver shifts each bucket's histogram by
    its offset and adds the bucket-spanning gaps. Level keys and
    integer-µs durations are exact; nothing endpoint-sized
    collects (per-bucket histograms are level-bounded)."""
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
        dur = np.floor(df["value"].to_numpy(np.float64)
                       * 60000000.0 + 0.5).astype(np.int64)
        return pd.DataFrame({
            "t_us": np.concatenate([start, start + dur]),
            "d": np.concatenate([np.ones(len(df), dtype=np.int64),
                                 -np.ones(len(df),
                                          dtype=np.int64)])})

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
            t = g["t_us"].to_numpy(np.int64)
            cum = g["nd"].to_numpy(np.int64).cumsum()
            # in-bucket gaps at local level cum[i]
            if len(t) > 1:
                gaps = t[1:] - t[:-1]
                hist = pd.DataFrame({"lvl": cum[:-1], "dur": gaps}) \
                    .groupby("lvl")["dur"].sum()
                for lvl, dur in hist.items():
                    rows.append((int(b), 0, int(lvl), int(dur)))
            # boundary metadata row (kind=1)
            rows.append((int(b), 1, int(cum[-1]),
                         int(t[0])))
            rows.append((int(b), 2, int(t[-1]), 0))
        return pd.DataFrame(rows, columns=["__b", "kind", "a", "b2"])

    parts = grouped_apply(nd.map_batches(with_bucket,
                                         batch_format="pandas"),
                          ["__b"], bucket_partial).to_pandas()
    parts = parts.sort_values(["__b", "kind", "a"])
    buckets = sorted(int(b) for b in parts["__b"].unique())
    hist: dict[int, int] = {}
    offset = 0
    prev_last_t = None
    for b in buckets:
        pb = parts[parts["__b"] == b]
        first_t = int(pb[pb["kind"] == 1]["b2"].iloc[0])
        total = int(pb[pb["kind"] == 1]["a"].iloc[0])
        last_t = int(pb[pb["kind"] == 2]["a"].iloc[0])
        if prev_last_t is not None and first_t > prev_last_t:
            hist[offset] = hist.get(offset, 0) \
                + (first_t - prev_last_t)
        for r in pb[pb["kind"] == 0].itertuples():
            lvl = offset + int(r.a)
            hist[lvl] = hist.get(lvl, 0) + int(r.b2)
        offset += total
        prev_last_t = last_t
    out = pd.DataFrame(sorted(hist.items()),
                       columns=["level", "total_us"]) \
        .astype("int64")
    return out[out["total_us"] > 0].reset_index(drop=True)

_CONCURRENCY_HIST_ORACLE_SQL = """
    WITH ep AS (
        SELECT epoch_us(ts) AS t, 1 AS d FROM events
        UNION ALL
        SELECT epoch_us(ts)
               + CAST(value * 60000000.0 AS BIGINT), -1
        FROM events),
    nd AS MATERIALIZED (
        SELECT t, sum(d) AS nd FROM ep GROUP BY t),
    lv AS MATERIALIZED (
        SELECT t, SUM(nd) OVER (ORDER BY t) AS lvl,
               lead(t) OVER (ORDER BY t) AS nxt
        FROM nd)
    SELECT CAST(lvl AS BIGINT) AS level,
           CAST(sum(nxt - t) AS BIGINT) AS total_us
    FROM lv WHERE nxt IS NOT NULL
    GROUP BY lvl HAVING sum(nxt - t) > 0 ORDER BY level"""

def q_events_sprt_srm(sf_dir: str, *, p1: float = 0.55):
    """Wald's sequential probability ratio test (Wald '45) run as a
    SEQUENTIAL sample-ratio-mismatch monitor — the always-valid
    companion of the fixed-horizon ``q_events_srm`` chi-square:
    H₀ p = 0.5 vs H₁ p = ``p1`` over the md5("ab|user") treatment
    indicator stream in global (ts, event_id) order, stopping at the
    first n where LLRₙ = k·ln(p1/0.5) + (n−k)·ln((1−p1)/0.5) leaves
    (−ln 19, ln 19) (α = β = 0.05). The LLR is one identical
    float64 expression of the exact integer prefix pair (n, k) on
    both engines, so every crossing decision is bit-deterministic
    and the window-cumsum oracle replays the stopped state exactly.

    Scale shape: the prefix-sum decomposition — exact-quantile time
    buckets, ONE combiner pass for per-bucket (n, k) totals, driver
    prefix offsets over the bucket-bounded table, then one
    co-located pass finds each bucket's earliest in-bucket crossing
    under its broadcast offset; the driver reduces the ≤ #buckets
    candidate rows. Nothing event-sized ever collects."""
    import ray

    from jerex_ray.functions.aggregate import (grouped_aggregate,
                                               grouped_apply)
    from jerex_ray.ops.quantiles import distributed_quantiles
    from jerex_ray.runtime import read_parquet_sized
    from jerex_ray.util import md5_hash64_batch
    configure_data_context()
    c1 = float(np.log(p1 / 0.5))
    c0 = float(np.log((1.0 - p1) / 0.5))
    bound = float(np.log(0.95 / 0.05))
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts"])

    def obs(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"t": pd.Series(dtype="int64"),
                                 "e": pd.Series(dtype="int64"),
                                 "x": pd.Series(dtype="int64")})
        t = df["ts"].astype("datetime64[us]").astype("int64") \
            .to_numpy()
        x = (md5_hash64_batch([f"ab|{u}" for u in df["user_id"]])
             % 2).astype(np.int64)
        return pd.DataFrame({"t": t,
                             "e": df["event_id"].to_numpy(np.int64),
                             "x": x})

    o = ds.map_batches(obs, batch_format="pandas").materialize()
    qs = [i / 16 for i in range(1, 16)]
    pivots = np.unique(np.asarray(
        distributed_quantiles(o, "t", qs), dtype=np.float64))
    piv_ref = ray.put(pivots)

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["__b"] = np.searchsorted(
            ray.get(piv_ref), df["t"].to_numpy(np.float64),
            side="left").astype(np.int64)
        return out

    ob = o.map_batches(with_bucket,
                       batch_format="pandas").materialize()

    def tot_partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"__b": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64"),
                                 "k": pd.Series(dtype="int64")})
        g = df.groupby("__b", as_index=False) \
            .agg(n=("x", "size"), k=("x", "sum"))
        return g.astype("int64")

    tot = grouped_aggregate(
        ob.map_batches(tot_partial, batch_format="pandas"),
        ["__b"], {"n": ("n", "sum"), "k": ("k", "sum")},
        result_hint="small").to_pandas() \
        .sort_values("__b").reset_index(drop=True)
    tot["N0"] = tot["n"].cumsum() - tot["n"]
    tot["K0"] = tot["k"].cumsum() - tot["k"]
    off_ref = ray.put(tot[["__b", "N0", "K0"]]
                      .set_index("__b"))

    def bucket_cross(block: pd.DataFrame) -> pd.DataFrame:
        cols = {"n": pd.Series(dtype="int64"),
                "k": pd.Series(dtype="int64"),
                "llr": pd.Series(dtype="float64")}
        if block.empty or "__b" not in block.columns:
            return pd.DataFrame(cols)
        off = ray.get(off_ref)
        rows = []
        for bb, g in block.groupby("__b", sort=False):
            g = g.sort_values(["t", "e"])
            n0 = int(off.loc[int(bb), "N0"])
            k0 = int(off.loc[int(bb), "K0"])
            k = k0 + g["x"].to_numpy(np.int64).cumsum()
            n = n0 + np.arange(1, len(g) + 1, dtype=np.int64)
            llr = k * c1 + (n - k) * c0
            hit = np.flatnonzero((llr >= bound) | (llr <= -bound))
            if len(hit):
                i = int(hit[0])
                rows.append((int(n[i]), int(k[i]), float(llr[i])))
        return pd.DataFrame(rows, columns=["n", "k", "llr"]) \
            if rows else pd.DataFrame(cols)

    hits = grouped_apply(ob, ["__b"], bucket_cross).to_pandas()
    n_tot, k_tot = int(tot["n"].sum()), int(tot["k"].sum())
    if len(hits) and "n" in hits.columns:
        hits = hits.sort_values("n")
        n_, k_ = int(hits["n"].iloc[0]), int(hits["k"].iloc[0])
        llr_ = float(hits["llr"].iloc[0])
        decision = "h1" if llr_ > 0 else "h0"
    else:
        n_, k_ = n_tot, k_tot
        llr_ = k_ * c1 + (n_ - k_) * c0
        decision = "continue"
    return pd.DataFrame({
        "decision": [decision],
        "n_obs": np.array([n_], dtype=np.int64),
        "k_treat": np.array([k_], dtype=np.int64),
        "llr": [float(_round_half_away(llr_, 6))]})

def _sprt_srm_oracle_sql(p1: float = 0.55) -> str:
    """Window-cumsum replay of ``q_events_sprt_srm``: exact integer
    (n, k) prefixes in (ts, event_id) order, the identical LLR
    expression, earliest boundary crossing else the final state."""
    return f"""
        WITH obs AS (
            SELECT epoch_us(ts) AS t, event_id,
                   CAST(CAST('0x' || substr(md5('ab|' ||
                        CAST(user_id AS VARCHAR)), 1, 16) AS UBIGINT)
                        % 2 AS BIGINT) AS x
            FROM events),
        w AS (
            SELECT row_number() OVER (ORDER BY t, event_id) AS n,
                   SUM(x) OVER (ORDER BY t, event_id
                                ROWS UNBOUNDED PRECEDING) AS k
            FROM obs),
        l AS (
            SELECT n, k,
                   k * ln({p1} / 0.5)
                   + (n - k) * ln({1.0 - p1} / 0.5) AS llr
            FROM w),
        c AS (
            SELECT * FROM l
            WHERE llr >= ln(0.95 / 0.05) OR llr <= -ln(0.95 / 0.05)
            ORDER BY n LIMIT 1),
        fin AS (SELECT * FROM l ORDER BY n DESC LIMIT 1)
        SELECT decision, CAST(n AS BIGINT) AS n_obs,
               CAST(k AS BIGINT) AS k_treat, round(llr, 6) AS llr
        FROM (
            SELECT CASE WHEN llr > 0 THEN 'h1' ELSE 'h0' END
                       AS decision, n, k, llr
            FROM c
            UNION ALL
            SELECT 'continue', n, k, llr FROM fin
            WHERE (SELECT count(*) FROM c) = 0)"""

def q_events_periodogram(sf_dir: str, *, harmonics: int = 4):
    """Schuster periodogram (Schuster 1898 — the original
    hidden-periodicity detector) of the hour-of-day event-count
    profile: DFT power P_k = C_k² + S_k² at diurnal harmonics
    k = 1..``harmonics``, where C_k = Σ_h y_h·cos(2πkh/24) and
    S_k the sine twin — the spectral companion of the
    autocorrelation / seasonal-naive / Holt-Winters family.
    Bit-determinism: the 24 cosine/sine terms are accumulated in
    ascending-hour left-assoc order with the identical angle
    expression ``2·π·(k·h)/24.0`` on both engines (exact integer
    counts, libm cos/sin of identical doubles), so C, S, and P are
    the same float64 on both sides; mirrored 6-dp rounding.

    Scale shape: ONE vocabulary-bounded combiner pass reduces the
    corpus to the 24-slot grid; the O(harmonics·24) sum runs
    driver-side on that metadata-sized table."""
    import math

    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"hod": pd.Series(dtype="int64"),
                                 "c": pd.Series(dtype="int64")})
        us = df["ts"].astype("datetime64[us]").astype("int64") \
            .to_numpy()
        hod = ((us // 3_600_000_000) % 24).astype(np.int64)
        g = pd.DataFrame({"hod": hod}).groupby("hod", sort=False) \
            .size().reset_index(name="c")
        return g.astype("int64")

    grid = grouped_aggregate(
        ds.map_batches(partial, batch_format="pandas"),
        ["hod"], {"c": ("c", "sum")},
        result_hint="small").to_pandas()
    y = np.zeros(24, dtype=np.int64)
    if "hod" in grid.columns and len(grid):
        y[grid["hod"].to_numpy(np.int64)] = \
            grid["c"].to_numpy(np.int64)
    rows = []
    for k in range(1, harmonics + 1):
        c, s = 0.0, 0.0
        for h in range(24):  # ascending-hour left-assoc, as in SQL
            ang = 2 * math.pi * (k * h) / 24.0
            c = c + float(y[h]) * math.cos(ang)
            s = s + float(y[h]) * math.sin(ang)
        rows.append((k, float(_round_half_away(c, 6)),
                     float(_round_half_away(s, 6)),
                     float(_round_half_away(c * c + s * s, 6))))
    return pd.DataFrame(rows, columns=["k", "c_k", "s_k", "power"]) \
        .astype({"k": "int64"})

def _periodogram_oracle_sql(harmonics: int = 4) -> str:
    """Literal 24-term replay of ``q_events_periodogram``: the
    pivoted hour grid and the identical ascending-hour sums."""
    ys = ", ".join(
        f"count(*) FILTER (WHERE hod = {h}) AS y{h}"
        for h in range(24))
    sql = f"""
        WITH g AS MATERIALIZED (
            SELECT {ys}
            FROM (SELECT (epoch_us(ts) // 3600000000) % 24 AS hod
                  FROM events))"""
    parts = []
    for k in range(1, harmonics + 1):
        c = " + ".join(
            f"y{h} * cos(2 * pi() * {k * h} / 24.0)"
            for h in range(24))
        s = " + ".join(
            f"y{h} * sin(2 * pi() * {k * h} / 24.0)"
            for h in range(24))
        parts.append(f"""
        SELECT CAST({k} AS BIGINT) AS k,
               round({c}, 6) AS c_k,
               round({s}, 6) AS s_k,
               round(({c}) * ({c}) + ({s}) * ({s}), 6) AS power
        FROM g""")
    return sql + "\nSELECT * FROM (" \
        + "\nUNION ALL ".join(parts) + ") ORDER BY k"

def q_events_mannwhitney(sf_dir: str):
    """Mann–Whitney U rank-sum test (Mann & Whitney '47, tie-corrected
    normal approximation) of event value between the md5("ab|user")
    arms — the nonparametric companion of the Welch t / permutation
    tests on the SAME arm bucketing. Bit-determinism: the rank
    machinery is EXACT INTEGERS throughout — per-(cents, arm) counts
    from one combiner pass, doubled average ranks 2·lo + t + 1 (a
    tied run of length t spanning positions lo+1..lo+t has average
    rank lo + (t+1)/2; doubling clears the half), rank sum R1×2,
    U1×2 = R1×2 − n1(n1+1), and the tie term Σ(t³−t). The ONLY float
    is the final z = (U1 − n0·n1/2)/σ_ties, one identical expression
    on both engines (round 6).

    Scale shape: ONE combiner pass reduces the corpus to the
    value-vocabulary-bounded (cents, arm) grid — the stream never
    moves; the cumulative-rank walk runs driver-side on that
    metadata-sized table. (Output counts are int64; a >2^31-row arm
    would promote the tie term to int128/HUGEINT on both engines.)"""
    import math

    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    from jerex_ray.util import md5_hash64_batch
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        arm = (md5_hash64_batch(
            [f"ab|{u}" for u in df["user_id"]]) % 2).astype(np.int64)
        v = df["value"].to_numpy(np.float64)
        cents = np.copysign(np.floor(np.abs(v) * 100.0 + 0.5), v) \
            .astype(np.int64)
        g = pd.DataFrame({"c": cents, "arm": arm, "n": np.int64(1)}) \
            .groupby(["c", "arm"], sort=False, as_index=False).sum()
        return g.astype({"c": "int64", "arm": "int64", "n": "int64"})

    grid = grouped_aggregate(
        ds.map_batches(partial, batch_format="pandas",
                       batch_size=65536),
        ["c", "arm"], {"n": ("n", "sum")},
        result_hint="small").to_pandas()
    piv = grid.pivot_table(index="c", columns="arm", values="n",
                           aggfunc="sum", fill_value=0) \
        .reindex(columns=[0, 1], fill_value=0).sort_index()
    c0 = piv[0].to_numpy(np.int64)
    c1 = piv[1].to_numpy(np.int64)
    t = c0 + c1
    lo = np.concatenate(([0], np.cumsum(t)[:-1]))
    dr = 2 * lo + t + 1                      # doubled average rank
    n0, n1 = int(c0.sum()), int(c1.sum())
    n = n0 + n1
    r1_x2 = int((c1 * dr).sum())
    u1_x2 = r1_x2 - n1 * (n1 + 1)
    tie_term = int((t.astype(object) ** 3 - t).sum())
    z = ((u1_x2 / 2.0 - (n1 * n0) / 2.0)
         / math.sqrt((n1 * n0) / 12.0
                     * ((n + 1) - tie_term / (n * (n - 1.0)))))
    return pd.DataFrame({
        "n0": np.array([n0], dtype=np.int64),
        "n1": np.array([n1], dtype=np.int64),
        "u1_x2": np.array([u1_x2], dtype=np.int64),
        "tie_term": np.array([tie_term], dtype=np.int64),
        "z": [_round_half_away(z, 6)]})

_MANNWHITNEY_ORACLE_SQL = """
    WITH grid AS MATERIALIZED (
        SELECT CAST(round(value * 100.0, 0) AS BIGINT) AS c,
               CAST(count(*) FILTER (WHERE
                   CAST('0x' || substr(md5('ab|' ||
                       CAST(user_id AS VARCHAR)), 1, 16) AS UBIGINT)
                   % 2 = 0) AS BIGINT) AS c0,
               CAST(count(*) FILTER (WHERE
                   CAST('0x' || substr(md5('ab|' ||
                       CAST(user_id AS VARCHAR)), 1, 16) AS UBIGINT)
                   % 2 = 1) AS BIGINT) AS c1
        FROM events GROUP BY 1),
    ranked AS (
        SELECT c0, c1, c0 + c1 AS t,
               coalesce(sum(c0 + c1) OVER (ORDER BY c
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS lo
        FROM grid),
    agg AS (
        SELECT CAST(sum(c0) AS BIGINT) AS n0,
               CAST(sum(c1) AS BIGINT) AS n1,
               CAST(sum(c1 * (2 * lo + t + 1)) AS BIGINT) AS r1_x2,
               CAST(sum(t * t * t - t) AS BIGINT) AS tie_term
        FROM ranked)
    SELECT n0, n1,
           r1_x2 - n1 * (n1 + 1) AS u1_x2,
           tie_term,
           round(((r1_x2 - n1 * (n1 + 1)) / 2.0 - (n1 * n0) / 2.0)
                 / sqrt((n1 * n0) / 12.0
                        * ((n0 + n1 + 1) - tie_term
                           / ((n0 + n1) * (n0 + n1 - 1.0)))), 6) AS z
    FROM agg"""

def q_events_spearman(sf_dir: str):
    """Spearman rank correlation ρ (Spearman '04, tie-handled via
    average ranks) between the hourly event COUNT and the hourly
    total VALUE in integer cents — closing the correlation triple
    beside Pearson (`q_events_regression`) and Kendall τ-b on the
    same zero-filled hour grid. Bit-determinism: doubled average
    ranks r×2 = #less + #≤ + 1 are EXACT INTEGERS, all five moment
    sums (Σrx, Σry, Σrx², Σry², Σrx·ry) stay exact (Python big ints
    here, HUGEINT in SQL), and ρ = (T·Sxy − Sx·Sy) /
    √((T·Sxx − Sx²)·(T·Syy − Sy²)) is ONE identical float
    expression on both engines (round 6).

    Scale shape: ONE combiner pass reduces the corpus to the
    time-bounded hour grid; ranking and the moment sums run
    driver-side on that metadata-sized table."""
    import math

    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = (df["ts"].astype("datetime64[us]").astype("int64")
             // 3_600_000_000).to_numpy(np.int64)
        v = df["value"].to_numpy(np.float64)
        cents = np.copysign(np.floor(np.abs(v) * 100.0 + 0.5), v) \
            .astype(np.int64)
        g = pd.DataFrame({"h": h, "n": np.int64(1), "c": cents}) \
            .groupby("h", sort=False, as_index=False).sum()
        return g.astype({"h": "int64", "n": "int64", "c": "int64"})

    g = grouped_aggregate(
        ds.map_batches(partial, batch_format="pandas",
                       batch_size=65536),
        ["h"], {"n": ("n", "sum"), "c": ("c", "sum")},
        result_hint="small").to_pandas()
    h0 = int(g["h"].min())
    T = int(g["h"].max()) - h0 + 1
    x = np.zeros(T, dtype=np.int64)
    y = np.zeros(T, dtype=np.int64)
    idx = g["h"].to_numpy(np.int64) - h0
    x[idx] = g["n"].to_numpy(np.int64)
    y[idx] = g["c"].to_numpy(np.int64)

    def dranks(a: np.ndarray) -> np.ndarray:
        srt = np.sort(a)
        return (np.searchsorted(srt, a, side="left")
                + np.searchsorted(srt, a, side="right") + 1)

    rx = [int(v) for v in dranks(x)]
    ry = [int(v) for v in dranks(y)]
    sx, sy = sum(rx), sum(ry)
    sxx = sum(v * v for v in rx)
    syy = sum(v * v for v in ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    num = T * sxy - sx * sy
    d1 = T * sxx - sx * sx
    d2 = T * syy - sy * sy
    rho = float(num) / math.sqrt(float(d1) * float(d2))
    return pd.DataFrame({
        "n": np.array([T], dtype=np.int64),
        "num": np.array([num], dtype=np.int64),
        "den_x": np.array([d1], dtype=np.int64),
        "den_y": np.array([d2], dtype=np.int64),
        "rho": [_round_half_away(rho, 6)]})

_SPEARMAN_ORACLE_SQL = """
    WITH b AS (SELECT min(epoch_us(ts) // 3600000000) AS h0,
                      max(epoch_us(ts) // 3600000000) AS h1
               FROM events),
    hrs AS (SELECT unnest(range(0, CAST(h1 - h0 + 1 AS BIGINT)))
                   AS h FROM b),
    raw AS (SELECT epoch_us(ts) // 3600000000
                   - (SELECT h0 FROM b) AS h,
                   count(*) AS n,
                   sum(CAST(round(value * 100.0, 0) AS BIGINT)) AS c
            FROM events GROUP BY 1),
    grid AS MATERIALIZED (
        SELECT hrs.h, coalesce(raw.n, 0) AS x,
               coalesce(raw.c, 0) AS y
        FROM hrs LEFT JOIN raw ON raw.h = hrs.h),
    ranked AS (
        -- doubled average rank = #less + #<= + 1 = rank + cume-count
        SELECT (rank() OVER (ORDER BY x)
                + count(*) OVER (ORDER BY x)) AS rx,
               (rank() OVER (ORDER BY y)
                + count(*) OVER (ORDER BY y)) AS ry
        FROM grid),
    m AS (SELECT count(*) AS t, sum(rx) AS sx, sum(ry) AS sy,
                 sum(rx * rx) AS sxx, sum(ry * ry) AS syy,
                 sum(rx * ry) AS sxy
          FROM ranked)
    SELECT CAST(t AS BIGINT) AS n,
           CAST(t * sxy - sx * sy AS BIGINT) AS num,
           CAST(t * sxx - sx * sx AS BIGINT) AS den_x,
           CAST(t * syy - sy * sy AS BIGINT) AS den_y,
           round(CAST(t * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(t * sxx - sx * sx AS DOUBLE)
                        * CAST(t * syy - sy * sy AS DOUBLE)), 6)
               AS rho
    FROM m"""

def q_events_kruskal(sf_dir: str):
    """Kruskal–Wallis H test (Kruskal & Wallis '52, tie-corrected)
    of event value across FOUR md5("arm4|user") assignment arms —
    the k-group generalization of the Mann–Whitney query (the
    multi-variant experiment's rank analysis). The arm count is
    FIXED at 4 so the float Σ R_g²/n_g is an explicit 4-term
    left-assoc expression in arm order — no engine-dependent float
    summation order anywhere. Everything else is EXACT INTEGERS
    from one combiner pass over the (cents, arm) grid: doubled
    average ranks, per-arm rank sums R_g×2, and the tie term
    Σ(t³−t); H and the tie-corrected H_c are identical float64
    expressions on both engines (round 6).

    Scale shape: ONE combiner pass to the value-vocabulary-bounded
    grid; the cumulative-rank walk is driver-side metadata work."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    from jerex_ray.util import md5_hash64_batch
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        arm = (md5_hash64_batch(
            [f"arm4|{u}" for u in df["user_id"]]) % 4) \
            .astype(np.int64)
        v = df["value"].to_numpy(np.float64)
        cents = np.copysign(np.floor(np.abs(v) * 100.0 + 0.5), v) \
            .astype(np.int64)
        g = pd.DataFrame({"c": cents, "arm": arm, "n": np.int64(1)}) \
            .groupby(["c", "arm"], sort=False, as_index=False).sum()
        return g.astype({"c": "int64", "arm": "int64", "n": "int64"})

    grid = grouped_aggregate(
        ds.map_batches(partial, batch_format="pandas",
                       batch_size=65536),
        ["c", "arm"], {"n": ("n", "sum")},
        result_hint="small").to_pandas()
    piv = grid.pivot_table(index="c", columns="arm", values="n",
                           aggfunc="sum", fill_value=0) \
        .reindex(columns=[0, 1, 2, 3], fill_value=0).sort_index()
    cg = [piv[a].to_numpy(np.int64) for a in range(4)]
    t = cg[0] + cg[1] + cg[2] + cg[3]
    lo = np.concatenate(([0], np.cumsum(t)[:-1]))
    dr = 2 * lo + t + 1
    ng = [int(c.sum()) for c in cg]
    rg = [int((c * dr).sum()) for c in cg]
    tie = int((t.astype(object) ** 3 - t).sum())
    n = sum(ng)
    inner = ((rg[0] / 2.0) * (rg[0] / 2.0) / ng[0]
             + (rg[1] / 2.0) * (rg[1] / 2.0) / ng[1]
             + (rg[2] / 2.0) * (rg[2] / 2.0) / ng[2]
             + (rg[3] / 2.0) * (rg[3] / 2.0) / ng[3])
    h = 12.0 / (n * (n + 1.0)) * inner - 3 * (n + 1.0)
    c_adj = 1.0 - tie / ((n * 1.0) * n * n - n)
    return pd.DataFrame({
        "n": np.array([n], dtype=np.int64),
        "n0": np.array([ng[0]], dtype=np.int64),
        "n1": np.array([ng[1]], dtype=np.int64),
        "n2": np.array([ng[2]], dtype=np.int64),
        "n3": np.array([ng[3]], dtype=np.int64),
        "r0_x2": np.array([rg[0]], dtype=np.int64),
        "r1_x2": np.array([rg[1]], dtype=np.int64),
        "r2_x2": np.array([rg[2]], dtype=np.int64),
        "r3_x2": np.array([rg[3]], dtype=np.int64),
        "tie_term": np.array([tie], dtype=np.int64),
        "h": [_round_half_away(h, 6)],
        "h_c": [_round_half_away(h / c_adj, 6)]})

def _kruskal_oracle_sql() -> str:
    arm = ("CAST('0x' || substr(md5('arm4|' || "
           "CAST(user_id AS VARCHAR)), 1, 16) AS UBIGINT) % 4")
    cols = ",\n               ".join(
        f"CAST(count(*) FILTER (WHERE {arm} = {a}) AS BIGINT) AS c{a}"
        for a in range(4))
    rsums = ", ".join(
        f"CAST(sum(c{a} * (2 * lo + t + 1)) AS BIGINT) AS r{a}"
        for a in range(4))
    nsums = ", ".join(
        f"CAST(sum(c{a}) AS BIGINT) AS n{a}" for a in range(4))
    inner = " + ".join(
        f"(r{a} / 2.0) * (r{a} / 2.0) / n{a}" for a in range(4))
    return f"""
    WITH grid AS MATERIALIZED (
        SELECT CAST(round(value * 100.0, 0) AS BIGINT) AS c,
               {cols}
        FROM events GROUP BY 1),
    ranked AS (
        SELECT c0, c1, c2, c3, c0 + c1 + c2 + c3 AS t,
               coalesce(sum(c0 + c1 + c2 + c3) OVER (ORDER BY c
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS lo
        FROM grid),
    agg AS (
        SELECT {nsums}, {rsums},
               CAST(sum(t * t * t - t) AS BIGINT) AS tie_term
        FROM ranked),
    f AS (SELECT *, n0 + n1 + n2 + n3 AS n FROM agg)
    SELECT n, n0, n1, n2, n3, r0 AS r0_x2, r1 AS r1_x2,
           r2 AS r2_x2, r3 AS r3_x2, tie_term,
           round(12.0 / (n * (n + 1.0)) * ({inner})
                 - 3 * (n + 1.0), 6) AS h,
           round((12.0 / (n * (n + 1.0)) * ({inner})
                  - 3 * (n + 1.0))
                 / (1.0 - tie_term / ((n * 1.0) * n * n - n)), 6)
               AS h_c
    FROM f"""

def q_events_hodges_lehmann(sf_dir: str):
    """Hodges–Lehmann location estimator (Hodges & Lehmann '63) of
    the hourly event count: the median of all Walsh averages
    (x_i + x_j)/2 over i ≤ j — the robust location companion of the
    rank tests (it is the estimator the Wilcoxon test inverts, with
    ~0.955 efficiency at the normal and 29% breakdown). Exactness:
    pair sums x_i + x_j are EXACT INTEGERS; the median picks the two
    middle order statistics W_lo, W_hi (equal when the pair count m
    is odd) and HL = (W_lo + W_hi)/4 is the only — exactly
    representable — float. Scale shape: ONE combiner pass reduces
    the corpus to the time-bounded hour grid; the O(T²) Walsh-sum
    census is one vectorized outer add driver-side on that
    metadata-sized series (same budget as the Kendall-τ pair
    census)."""
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
    x = np.zeros(T, dtype=np.int64)
    x[g["h"].to_numpy(np.int64) - h0] = g["n"].to_numpy(np.int64)
    s = np.add.outer(x, x)
    iu = np.triu_indices(T)
    w = np.sort(s[iu], kind="stable")
    m = len(w)
    w_lo, w_hi = int(w[(m - 1) // 2]), int(w[m // 2])
    return pd.DataFrame({
        "t": np.array([T], dtype=np.int64),
        "m": np.array([m], dtype=np.int64),
        "w_lo": np.array([w_lo], dtype=np.int64),
        "w_hi": np.array([w_hi], dtype=np.int64),
        "hl": [_round_half_away((w_lo + w_hi) / 4.0, 6)]})

_HODGES_LEHMANN_ORACLE_SQL = """
    WITH b AS (SELECT min(epoch_us(ts) // 3600000000) AS h0,
                      max(epoch_us(ts) // 3600000000) AS h1
               FROM events),
    hrs AS (SELECT unnest(range(0, CAST(h1 - h0 + 1 AS BIGINT)))
                   AS h FROM b),
    raw AS (SELECT epoch_us(ts) // 3600000000
                   - (SELECT h0 FROM b) AS h, count(*) AS n
            FROM events GROUP BY 1),
    grid AS MATERIALIZED (
        SELECT hrs.h, coalesce(raw.n, 0) AS x
        FROM hrs LEFT JOIN raw ON raw.h = hrs.h),
    walsh AS (
        SELECT a.x + b.x AS s,
               row_number() OVER (ORDER BY a.x + b.x) AS rn
        FROM grid a JOIN grid b ON a.h <= b.h),
    m AS (SELECT count(*) AS m,
                 (SELECT count(*) FROM grid) AS t
          FROM walsh)
    SELECT CAST(m.t AS BIGINT) AS t, CAST(m.m AS BIGINT) AS m,
           (SELECT CAST(s AS BIGINT) FROM walsh
            WHERE rn = (m.m - 1) // 2 + 1) AS w_lo,
           (SELECT CAST(s AS BIGINT) FROM walsh
            WHERE rn = m.m // 2 + 1) AS w_hi,
           round(((SELECT s FROM walsh WHERE rn = (m.m - 1) // 2 + 1)
                  + (SELECT s FROM walsh WHERE rn = m.m // 2 + 1))
                 / 4.0, 6) AS hl
    FROM m"""

def q_events_yule_walker(sf_dir: str):
    """Yule–Walker AR(2) fit (Yule '27 / Walker '31 — the original
    autoregression, built to find periodicity in sunspot numbers) of
    the hourly event-count series: φ₁, φ₂ solving the order-2 normal
    equations on the biased autocovariances — the parametric
    companion of the autocorrelation/periodogram queries. Exactness:
    with S = Σx and A_k = Σ_t (T·x_t − S)(T·x_{t+k} − S) (the
    T²-scaled centered lag products — EXACT INTEGERS), Cramer's rule
    gives φ₁ = A₁(A₀−A₂)/(A₀²−A₁²) and φ₂ = (A₂A₀−A₁²)/(A₀²−A₁²):
    exact integer numerators and denominator (Python big ints here,
    HUGEINT in SQL), ONE float division each (round 6).

    Scale shape: ONE combiner pass reduces the corpus to the
    time-bounded hour grid; the three lag products run driver-side
    on that metadata-sized series."""
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
    x = np.zeros(T, dtype=np.int64)
    x[g["h"].to_numpy(np.int64) - h0] = g["n"].to_numpy(np.int64)
    S = int(x.sum())
    c = [int(T) * int(v) - S for v in x]      # exact big ints

    def lag(k: int) -> int:
        return sum(c[t] * c[t + k] for t in range(T - k))

    a0, a1, a2 = lag(0), lag(1), lag(2)
    den = a0 * a0 - a1 * a1
    phi1 = float(a1 * (a0 - a2)) / float(den)
    phi2 = float(a2 * a0 - a1 * a1) / float(den)
    return pd.DataFrame({
        "t": np.array([T], dtype=np.int64),
        "a0": np.array([a0], dtype=np.int64),
        "a1": np.array([a1], dtype=np.int64),
        "a2": np.array([a2], dtype=np.int64),
        "phi1": [_round_half_away(phi1, 6)],
        "phi2": [_round_half_away(phi2, 6)]})

_YULE_WALKER_ORACLE_SQL = """
    WITH b AS (SELECT min(epoch_us(ts) // 3600000000) AS h0,
                      max(epoch_us(ts) // 3600000000) AS h1
               FROM events),
    hrs AS (SELECT unnest(range(0, CAST(h1 - h0 + 1 AS BIGINT)))
                   AS h FROM b),
    raw AS (SELECT epoch_us(ts) // 3600000000
                   - (SELECT h0 FROM b) AS h, count(*) AS n
            FROM events GROUP BY 1),
    grid AS MATERIALIZED (
        SELECT hrs.h, coalesce(raw.n, 0) AS x
        FROM hrs LEFT JOIN raw ON raw.h = hrs.h),
    s AS (SELECT count(*) AS t, sum(x) AS sx FROM grid),
    lags AS (
        SELECT
            (SELECT sum((s.t * a.x - s.sx) * (s.t * a.x - s.sx))
             FROM grid a) AS a0,
            (SELECT sum((s.t * a.x - s.sx) * (s.t * b.x - s.sx))
             FROM grid a JOIN grid b ON b.h = a.h + 1) AS a1,
            (SELECT sum((s.t * a.x - s.sx) * (s.t * b.x - s.sx))
             FROM grid a JOIN grid b ON b.h = a.h + 2) AS a2,
            s.t AS t
        FROM s)
    SELECT CAST(t AS BIGINT) AS t,
           CAST(a0 AS BIGINT) AS a0, CAST(a1 AS BIGINT) AS a1,
           CAST(a2 AS BIGINT) AS a2,
           round(CAST(a1 * (a0 - a2) AS DOUBLE)
                 / CAST(a0 * a0 - a1 * a1 AS DOUBLE), 6) AS phi1,
           round(CAST(a2 * a0 - a1 * a1 AS DOUBLE)
                 / CAST(a0 * a0 - a1 * a1 AS DOUBLE), 6) AS phi2
    FROM lags"""

_UCB_REPLAY_ORACLE_SQL = """
    WITH RECURSIVE stream AS MATERIALIZED (
        SELECT row_number() OVER (ORDER BY ts, event_id) AS j,
               CAST(CAST('0x' || substr(md5('ucb|'
                    || CAST(event_id AS VARCHAR)), 1, 16)
                    AS UBIGINT) % 2 AS BIGINT) AS arm,
               CASE WHEN event_type = 'purchase'
                     AND value >= 150.0 THEN 1 ELSE 0 END AS r
        FROM events WHERE user_id < 16),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS t FROM stream),
    rep(j, n0, s0, n1, s1, m) AS (
        SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT),
               CAST(0 AS BIGINT), CAST(0 AS BIGINT),
               CAST(0 AS BIGINT), CAST(0 AS BIGINT)
        UNION ALL
        SELECT rep.j + 1,
               rep.n0 + CASE WHEN ch.c = 0 AND ev.arm = 0
                             THEN 1 ELSE 0 END,
               rep.s0 + CASE WHEN ch.c = 0 AND ev.arm = 0
                             THEN ev.r ELSE 0 END,
               rep.n1 + CASE WHEN ch.c = 1 AND ev.arm = 1
                             THEN 1 ELSE 0 END,
               rep.s1 + CASE WHEN ch.c = 1 AND ev.arm = 1
                             THEN ev.r ELSE 0 END,
               rep.m + CASE WHEN ch.c = ev.arm THEN 1 ELSE 0 END
        FROM rep
        JOIN stream ev ON ev.j = rep.j + 1,
        LATERAL (SELECT CASE
            WHEN rep.n0 = 0 THEN 0
            WHEN rep.n1 = 0 THEN 1
            WHEN CAST(rep.s0 AS DOUBLE) / greatest(rep.n0, 1)
                 + sqrt(2.0 * ln(CAST(greatest(rep.n0 + rep.n1, 2)
                                      AS DOUBLE))
                        / greatest(rep.n0, 1))
                 >= CAST(rep.s1 AS DOUBLE) / greatest(rep.n1, 1)
                 + sqrt(2.0 * ln(CAST(greatest(rep.n0 + rep.n1, 2)
                                      AS DOUBLE))
                        / greatest(rep.n1, 1))
            THEN 0 ELSE 1 END AS c) ch
        WHERE rep.j < (SELECT t FROM nn))
    SELECT (SELECT t FROM nn) AS t_stream, m AS matched,
           n0, s0, n1, s1,
           round(CAST(s0 AS DOUBLE) / greatest(n0, 1)
                 + sqrt(2.0 * ln(CAST(greatest(n0 + n1, 2)
                                      AS DOUBLE))
                        / greatest(n0, 1)), 6) AS ucb0,
           round(CAST(s1 AS DOUBLE) / greatest(n1, 1)
                 + sqrt(2.0 * ln(CAST(greatest(n0 + n1, 2)
                                      AS DOUBLE))
                        / greatest(n1, 1)), 6) AS ucb1
    FROM rep ORDER BY j DESC LIMIT 1"""

_MCNEMAR_ORACLE_SQL = """
    WITH b AS (
        SELECT (CAST(min(epoch_us(ts)) AS BIGINT)
                + CAST(max(epoch_us(ts)) AS BIGINT)) // 2 AS mid
        FROM events),
    u AS (
        SELECT user_id,
               max(CASE WHEN event_type = 'purchase'
                         AND value >= 150.0
                         AND epoch_us(ts) <= (SELECT mid FROM b)
                        THEN 1 ELSE 0 END) AS pre,
               max(CASE WHEN event_type = 'purchase'
                         AND value >= 150.0
                         AND epoch_us(ts) > (SELECT mid FROM b)
                        THEN 1 ELSE 0 END) AS post
        FROM events GROUP BY user_id),
    c AS (
        SELECT CAST(sum(CASE WHEN pre = 1 AND post = 1 THEN 1
                        ELSE 0 END) AS BIGINT) AS n_both,
               CAST(sum(CASE WHEN pre = 0 AND post = 0 THEN 1
                        ELSE 0 END) AS BIGINT) AS n_neither,
               CAST(sum(CASE WHEN pre = 1 AND post = 0 THEN 1
                        ELSE 0 END) AS BIGINT) AS b_lapsed,
               CAST(sum(CASE WHEN pre = 0 AND post = 1 THEN 1
                        ELSE 0 END) AS BIGINT) AS c_new
        FROM u)
    SELECT n_both, n_neither, b_lapsed, c_new,
           CASE WHEN b_lapsed + c_new = 0 THEN 0.0
                ELSE round(CAST((b_lapsed - c_new)
                                * (b_lapsed - c_new) AS DOUBLE)
                           / (b_lapsed + c_new), 6) END AS chi2,
           CAST(CASE WHEN b_lapsed + c_new > 0
                      AND CAST((b_lapsed - c_new)
                               * (b_lapsed - c_new) AS DOUBLE)
                          / (b_lapsed + c_new) > 3.841459
                THEN 1 ELSE 0 END AS BIGINT) AS flag
    FROM c"""

def q_events_sax(sf_dir: str, *, word: int = 16):
    """SAX symbolization (Lin, Keogh et al. '03 — Symbolic Aggregate
    approXimation) of the hourly event-count series: PAA segment
    means discretized to a 4-letter alphabet — the symbolic front
    end of motif/discord mining and the lossy twin of the matrix
    profile query. This variant uses EMPIRICAL QUARTILE breakpoints
    (exact order statistics of the hourly counts — integers) instead
    of the Gaussian table, so EVERYTHING is exact integer
    arithmetic: segment id (h·W)//T, segment (sum, len), and the
    symbol = Σ_b [sum > b·len] decided by cross-multiplied integer
    comparisons — zero float anywhere.

    Scale shape: ONE combiner pass to the time-bounded hour grid;
    segmentation and the W-row symbol table are driver-side
    metadata work."""
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
    x = np.zeros(T, dtype=np.int64)
    x[g["h"].to_numpy(np.int64) - h0] = g["n"].to_numpy(np.int64)
    srt = np.sort(x)
    b = [int(srt[T // 4]), int(srt[T // 2]), int(srt[3 * T // 4])]
    seg = (np.arange(T, dtype=np.int64) * word) // T
    rows = []
    for i in range(word):
        m = seg == i
        ssum, slen = int(x[m].sum()), int(m.sum())
        sym = sum(1 for bp in b if ssum > bp * slen)
        rows.append((i, ssum, slen, sym))
    out = pd.DataFrame(rows, columns=["seg", "seg_sum", "seg_len",
                                      "symbol"])
    out["b1"], out["b2"], out["b3"] = b
    return out.astype("int64")

def _sax_oracle_sql(word: int = 16) -> str:
    return f"""
    WITH b AS (SELECT min(epoch_us(ts) // 3600000000) AS h0,
                      max(epoch_us(ts) // 3600000000) AS h1
               FROM events),
    hrs AS (SELECT unnest(range(0, CAST(h1 - h0 + 1 AS BIGINT)))
                   AS h FROM b),
    raw AS (SELECT epoch_us(ts) // 3600000000
                   - (SELECT h0 FROM b) AS h, count(*) AS n
            FROM events GROUP BY 1),
    grid AS MATERIALIZED (
        SELECT hrs.h, coalesce(raw.n, 0) AS x
        FROM hrs LEFT JOIN raw ON raw.h = hrs.h),
    t AS (SELECT count(*) AS t FROM grid),
    ranked AS (SELECT x, row_number() OVER (ORDER BY x) AS rn
               FROM grid),
    bps AS (SELECT
        (SELECT x FROM ranked, t WHERE rn = t.t // 4 + 1) AS b1,
        (SELECT x FROM ranked, t WHERE rn = t.t // 2 + 1) AS b2,
        (SELECT x FROM ranked, t WHERE rn = 3 * t.t // 4 + 1) AS b3),
    segs AS (SELECT (g.h * {word}) // t.t AS seg,
                    sum(g.x) AS seg_sum, count(*) AS seg_len
             FROM grid g, t GROUP BY 1)
    SELECT CAST(seg AS BIGINT) AS seg,
           CAST(seg_sum AS BIGINT) AS seg_sum,
           CAST(seg_len AS BIGINT) AS seg_len,
           CAST((CASE WHEN seg_sum > b1 * seg_len THEN 1 ELSE 0 END
               + CASE WHEN seg_sum > b2 * seg_len THEN 1 ELSE 0 END
               + CASE WHEN seg_sum > b3 * seg_len THEN 1 ELSE 0 END)
               AS BIGINT) AS symbol,
           CAST(b1 AS BIGINT) AS b1, CAST(b2 AS BIGINT) AS b2,
           CAST(b3 AS BIGINT) AS b3
    FROM segs, bps ORDER BY seg"""

def q_events_kalman(sf_dir: str, *, q_var: float = 1.0,
                    r_var: float = 4.0):
    """Kalman filter, local-level model (Kalman '60; the state-space
    completion of the EWMA/Holt/Holt-Winters smoothing family — EWMA
    is this filter's steady state) over the hourly event-count
    series: x̂ₜ = x̂ + K(yₜ − x̂) with K = P⁻/(P⁻ + R), P⁻ = P + Q,
    seeded x̂₁ = y₁, P₁ = 1. Bit-determinism: every update is
    performed in the EXACT float64 expression order the recursive-CTE
    oracle replays (the Holt-Winters convention) — gain, state,
    covariance, and the prediction-error sum Σ(yₜ − x̂⁻)² all use the
    previous row's values on both engines; mirrored 6-dp rounding.

    Scale shape: ONE combiner pass to the time-bounded hour grid;
    the O(T) three-state recursion is driver-side metadata work."""
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
    x, p, sse, k = float(y[0]), 1.0, 0.0, 0.0
    for t in range(1, T):
        yv = float(y[t])
        k = (p + q_var) / ((p + q_var) + r_var)
        sse = sse + (yv - x) * (yv - x)
        x = x + k * (yv - x)
        p = (1.0 - k) * (p + q_var)
    return pd.DataFrame({
        "t": np.array([T], dtype=np.int64),
        "level": [_round_half_away(x, 6)],
        "p_cov": [_round_half_away(p, 6)],
        "gain": [_round_half_away(k, 6)],
        "sse": [_round_half_away(sse, 6)]})

def _kalman_oracle_sql(q_var: float = 1.0, r_var: float = 4.0) -> str:
    kq = f"((s.p + {q_var}) / ((s.p + {q_var}) + {r_var}))"
    return f"""
    WITH RECURSIVE b AS (
        SELECT min(epoch_us(ts) // 3600000000) AS h0,
               max(epoch_us(ts) // 3600000000) AS h1 FROM events),
    hrs AS (SELECT unnest(range(0, CAST(h1 - h0 + 1 AS BIGINT)))
                   AS h FROM b),
    raw AS (SELECT epoch_us(ts) // 3600000000
                   - (SELECT h0 FROM b) AS h, count(*) AS n
            FROM events GROUP BY 1),
    grid AS MATERIALIZED (
        SELECT hrs.h, coalesce(raw.n, 0) AS x
        FROM hrs LEFT JOIN raw ON raw.h = hrs.h),
    t AS (SELECT count(*) AS t FROM grid),
    steps AS (
        SELECT 1 AS i,
               (SELECT CAST(x AS DOUBLE) FROM grid WHERE h = 0)
                   AS xf,
               CAST(1.0 AS DOUBLE) AS p,
               CAST(0.0 AS DOUBLE) AS sse,
               CAST(0.0 AS DOUBLE) AS k
        UNION ALL
        SELECT i + 1,
               s.xf + {kq} * (g.x - s.xf),
               (1.0 - {kq}) * (s.p + {q_var}),
               s.sse + (g.x - s.xf) * (g.x - s.xf),
               {kq}
        FROM steps s JOIN grid g ON g.h = s.i
        WHERE s.i < (SELECT t FROM t))
    SELECT CAST((SELECT t FROM t) AS BIGINT) AS t,
           round(xf, 6) AS level, round(p, 6) AS p_cov,
           round(k, 6) AS gain, round(sse, 6) AS sse
    FROM steps WHERE i = (SELECT t FROM t)"""

def q_events_croston(sf_dir: str, *, alpha: float = 0.125):
    """Croston's method (Croston '72, with the Syntetos–Boylan '05
    bias correction) over the hourly PURCHASE-count series — the
    intermittent-demand member completing the forecasting family
    beside EWMA/Holt/Holt-Winters/Kalman: most hours sell nothing,
    so naive SES drags toward zero; Croston smooths nonzero demand
    SIZES (z) and inter-demand INTERVALS (p) separately and
    forecasts z/p per hour. Exactness: α = 0.125 is a dyadic
    literal; both updates z += α(y−z), p += α(i−p) run in the exact
    float64 expression order the recursive-CTE oracle replays from
    the previous row (the Kalman convention), seeds z₁ = y₁,
    p₁ = 1.0; croston = z/p and sba = 0.9375·(z/p) are identical
    expressions; mirrored 6-dp rounding, intervals exact integers.

    Scale shape: ONE combiner pass to the time-bounded demand grid;
    the O(D) two-state recursion is driver-side metadata work."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["ts", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"] == "purchase"]
        h = (df["ts"].astype("datetime64[us]").astype("int64")
             // 3_600_000_000).to_numpy(np.int64)
        g = pd.DataFrame({"h": h, "n": np.int64(1)}) \
            .groupby("h", sort=False, as_index=False).sum()
        return g.astype({"h": "int64", "n": "int64"})

    g = grouped_aggregate(
        ds.map_batches(partial, batch_format="pandas",
                       batch_size=65536),
        ["h"], {"n": ("n", "sum")}, result_hint="small").to_pandas() \
        .sort_values("h").reset_index(drop=True)
    if g.empty:
        return pd.DataFrame({c: pd.Series(dtype=t) for c, t in [
            ("k", "int64"), ("hour", "int64"), ("y", "int64"),
            ("interval", "int64"), ("z", "float64"),
            ("p", "float64"), ("croston", "float64"),
            ("sba", "float64")]})
    hrs = g["h"].to_numpy(np.int64)
    ys = g["n"].to_numpy(np.int64)
    rows = []
    z, p = float(ys[0]), 1.0
    rows.append((1, int(hrs[0]), int(ys[0]), 0, z, p))
    for k in range(1, len(hrs)):
        yv = float(ys[k])
        iv = int(hrs[k] - hrs[k - 1])
        z = z + alpha * (yv - z)
        p = p + alpha * (float(iv) - p)
        rows.append((k + 1, int(hrs[k]), int(ys[k]), iv, z, p))
    out = pd.DataFrame(rows, columns=["k", "hour", "y", "interval",
                                      "z", "p"])
    out["croston"] = out["z"] / out["p"]
    out["sba"] = 0.9375 * (out["z"] / out["p"])
    for c in ["z", "p", "croston", "sba"]:
        out[c] = out[c].map(lambda v: _round_half_away(v, 6))
    return out.astype({"k": "int64", "hour": "int64", "y": "int64",
                       "interval": "int64"})

def _dgim_oracle_sql(window: int = 2048) -> str:
    """Recursive replay of ``q_events_dgim``: each recursion is ONE
    discrete event of the algorithm — either a 1-bit arrival
    (expire-then-append) or a single merge of the two oldest buckets
    of the smallest tripled size — over a LIST<STRUCT(e, sz)> state
    kept end-ascending by list_sort (struct comparison is
    lexicographic and ends are unique). The final census and the
    integer estimate Σsz − oldest + oldest//2 mirror the engine."""
    return f"""
    WITH RECURSIVE stream AS MATERIALIZED (
        SELECT row_number() OVER (ORDER BY ts, event_id) AS p,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                   AS bit
        FROM events),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM stream),
    ones AS MATERIALIZED (
        SELECT row_number() OVER (ORDER BY p) AS j, p
        FROM stream WHERE bit = 1),
    nb AS (SELECT CAST(count(*) AS BIGINT) AS b FROM ones),
    r(j, b) AS (
        SELECT CAST(0 AS BIGINT),
               CAST([] AS STRUCT(e BIGINT, sz BIGINT)[])
        UNION ALL
        SELECT CASE WHEN s3.v IS NOT NULL THEN j ELSE j + 1 END,
               CASE WHEN s3.v IS NOT NULL THEN
                   list_sort(
                       list_filter(b, x -> NOT (x.sz = s3.v
                           AND (x.e = olds.e1 OR x.e = olds.e2)))
                       || [struct_pack(e := olds.e2,
                                       sz := 2 * s3.v)])
               ELSE
                   list_sort(
                       list_filter(b, x -> x.e > nxt.p - {window})
                       || [struct_pack(e := nxt.p,
                                       sz := CAST(1 AS BIGINT))])
               END
        FROM r,
        LATERAL (SELECT (
            SELECT min(sz) FROM (
                SELECT u.x.sz AS sz
                FROM (SELECT unnest(b) AS x) u
                GROUP BY 1 HAVING count(*) >= 3)) AS v) s3,
        LATERAL (SELECT
            (SELECT min(u.x.e) FROM (SELECT unnest(b) AS x) u
             WHERE u.x.sz = s3.v) AS e1,
            (SELECT min(u.x.e) FROM (SELECT unnest(b) AS x) u
             WHERE u.x.sz = s3.v
               AND u.x.e > (SELECT min(u2.x.e)
                            FROM (SELECT unnest(b) AS x) u2
                            WHERE u2.x.sz = s3.v)) AS e2) olds,
        LATERAL (SELECT p FROM ones WHERE ones.j = r.j + 1
                 UNION ALL SELECT NULL WHERE NOT EXISTS
                     (SELECT 1 FROM ones WHERE ones.j = r.j + 1)
                 LIMIT 1) nxt
        WHERE s3.v IS NOT NULL OR j < (SELECT b FROM nb)),
    fin AS (
        SELECT b FROM r
        ORDER BY j DESC, len(b) ASC LIMIT 1),
    live AS (
        SELECT u.x.e AS e, u.x.sz AS sz
        FROM (SELECT unnest(b) AS x FROM fin) u, n
        WHERE u.x.e > n.n - {window}),
    census AS (
        SELECT CAST(count(*) AS BIGINT) AS n_buckets,
               CAST(coalesce(sum(sz), 0) AS BIGINT) AS total,
               CAST(coalesce(max(sz), 0) AS BIGINT) AS largest,
               CAST(coalesce((SELECT sz FROM live
                              ORDER BY e LIMIT 1), 0) AS BIGINT)
                   AS oldest
        FROM live),
    exact AS (
        SELECT CAST(count(*) AS BIGINT) AS ones_in_window
        FROM ones, n WHERE p > n.n - {window})
    SELECT n.n AS n_stream, CAST({window} AS BIGINT) AS window_w,
           exact.ones_in_window,
           census.total - census.oldest + census.oldest // 2
               AS estimate,
           census.n_buckets, census.largest,
           abs(census.total - census.oldest + census.oldest // 2
               - exact.ones_in_window) AS abs_error
    FROM n, exact, census"""

def _croston_oracle_sql(alpha: float = 0.125) -> str:
    return f"""
    WITH RECURSIVE d AS (
        SELECT epoch_us(ts) // 3600000000 AS h, count(*) AS n
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
    seq AS MATERIALIZED (
        SELECT row_number() OVER (ORDER BY h) AS k, h, n,
               coalesce(h - lag(h) OVER (ORDER BY h), 0) AS iv
        FROM d),
    steps AS (
        SELECT 1 AS k,
               (SELECT CAST(n AS DOUBLE) FROM seq WHERE k = 1) AS z,
               CAST(1.0 AS DOUBLE) AS p
        UNION ALL
        SELECT s.k + 1,
               s.z + {alpha} * (q.n - s.z),
               s.p + {alpha} * (CAST(q.iv AS DOUBLE) - s.p)
        FROM steps s JOIN seq q ON q.k = s.k + 1
        WHERE s.k < (SELECT max(k) FROM seq))
    SELECT CAST(q.k AS BIGINT) AS k, CAST(q.h AS BIGINT) AS hour,
           CAST(q.n AS BIGINT) AS y, CAST(q.iv AS BIGINT)
               AS interval,
           round(s.z, 6) AS z, round(s.p, 6) AS p,
           round(s.z / s.p, 6) AS croston,
           round(0.9375 * (s.z / s.p), 6) AS sba
    FROM steps s JOIN seq q ON q.k = s.k ORDER BY k"""

def q_events_ucb_replay(sf_dir: str):
    """UCB1 offline policy replay (Auer, Cesa-Bianchi & Fischer '02
    policy; Li et al. '11 replay evaluation) over the pinned pilot
    panel's logged event stream — the bandit counterpart of the
    fixed-split A/B family: walk the log in global (ts, event_id)
    order, let UCB1 choose an arm from ITS OWN counters
    (untried-arm-first, then argmax s/n + √(2·ln T / n), ties → arm
    0), and consume an event only when the policy's choice matches
    the logged md5 arm — the standard unbiased offline evaluator.
    Bit-determinism: counters are exact integers; the UCB comparison
    uses ln (glibc — measured bit-identical to DuckDB's) and sqrt
    (IEEE-exact) in one fixed expression, so every choice and the
    whole replay is reproduced by the recursive-CTE oracle (whose
    CASE arms are eagerness-guarded with greatest() — DuckDB
    evaluates untaken branches). Panel-bounded stream collect
    (user_id < 16 by construction), O(T) scalar recursion."""
    import hashlib

    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_id", "ts",
                                     "event_type", "value"])

    def panel(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["user_id"] < 16]
        r = ((df["event_type"] == "purchase")
             & (df["value"] >= 150.0)).astype("int64")
        return pd.DataFrame({
            "event_id": df["event_id"],
            "t": df["ts"].astype("datetime64[us]").astype("int64"),
            "r": r})

    log = ds.map_batches(panel, batch_format="pandas").to_pandas() \
        .sort_values(["t", "event_id"]).reset_index(drop=True)
    import math
    n = [0, 0]
    s = [0, 0]
    matched = 0
    for e, r in zip(log["event_id"], log["r"]):
        a = int.from_bytes(
            hashlib.md5(f"ucb|{e}".encode()).digest()[:8],
            "big") % 2
        if n[0] == 0:
            ch = 0
        elif n[1] == 0:
            ch = 1
        else:
            t = float(n[0] + n[1])
            u0 = s[0] / n[0] + math.sqrt(2.0 * math.log(t) / n[0])
            u1 = s[1] / n[1] + math.sqrt(2.0 * math.log(t) / n[1])
            ch = 0 if u0 >= u1 else 1
        if ch == a:
            n[ch] += 1
            s[ch] += int(r)
            matched += 1
    t = float(max(n[0] + n[1], 2))
    u0 = (s[0] / max(n[0], 1)
          + math.sqrt(2.0 * math.log(t) / max(n[0], 1)))
    u1 = (s[1] / max(n[1], 1)
          + math.sqrt(2.0 * math.log(t) / max(n[1], 1)))
    return pd.DataFrame({
        "t_stream": [np.int64(len(log))],
        "matched": [np.int64(matched)],
        "n0": [np.int64(n[0])], "s0": [np.int64(s[0])],
        "n1": [np.int64(n[1])], "s1": [np.int64(s[1])],
        "ucb0": [round(u0, 6)], "ucb1": [round(u1, 6)]})

def q_events_mcnemar(sf_dir: str):
    """McNemar's test (McNemar '47) of paired per-user conversion
    between the first and second half of the observation window —
    the PAIRED companion of the chi-square/Fisher audits (each user
    is their own control, so stable converters cancel out and only
    the discordant pairs b = lapsed, c = newly-converted carry
    signal): χ² = (b−c)²/(b+c) ~ χ²₁. Exactness: the halfway
    boundary is integer microseconds (min+max)//2, the 2×2 paired
    census is exact integers from ONE combiner pass, and the only
    float is the single (d·d)/n division (identical both sides).
    Scale: user-bounded grid, O(1) driver arithmetic."""
    import pyarrow.parquet as _pq

    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ts = _pq.read_table(f"{sf_dir}/events.parquet",
                        columns=["ts"])["ts"].to_pandas() \
        .astype("datetime64[us]").astype("int64")
    mid = (int(ts.min()) + int(ts.max())) // 2
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type",
                                     "value", "ts"])

    def halves(df: pd.DataFrame) -> pd.DataFrame:
        conv = ((df["event_type"] == "purchase")
                & (df["value"] >= 150.0))
        t = df["ts"].astype("datetime64[us]").astype("int64")
        return pd.DataFrame({
            "user_id": df["user_id"],
            "pre": (conv & (t <= mid)).astype("int64"),
            "post": (conv & (t > mid)).astype("int64")})

    users = grouped_aggregate(
        ds.map_batches(halves, batch_format="pandas"), ["user_id"],
        {"pre": ("pre", "max"), "post": ("post", "max")}).to_pandas()
    pre = users["pre"].to_numpy(np.int64)
    post = users["post"].to_numpy(np.int64)
    n11 = int(((pre == 1) & (post == 1)).sum())
    n00 = int(((pre == 0) & (post == 0)).sum())
    b = int(((pre == 1) & (post == 0)).sum())
    c = int(((pre == 0) & (post == 1)).sum())
    d = b - c
    chi2 = 0.0 if b + c == 0 else float(d * d) / float(b + c)
    return pd.DataFrame({
        "n_both": [np.int64(n11)], "n_neither": [np.int64(n00)],
        "b_lapsed": [np.int64(b)], "c_new": [np.int64(c)],
        "chi2": [round(chi2, 6)],
        "flag": [np.int64(chi2 > 3.841459)]})

def q_events_dgim(sf_dir: str, *, window: int = 2048):
    """DGIM sliding-window bit counting (Datar–Gionis–Indyk–Motwani
    '02): 'how many purchases in the last 2048 events' from O(log²W)
    bucket state with the ≤50% guarantee — the canonical
    single-consumer streaming sketch completing the Misra-Gries /
    CMS / AMS / HLL / KMV family, replayed EXACTLY (see
    ``ops/streaming.py:dgim_replay``; the recursive-CTE oracle steps
    one arrival or one merge at a time over the same integer bucket
    algebra). Stream order is global (ts, event_id); 1-bit positions
    come from the prefix-sum decomposition — per-hour co-located
    local ranks plus broadcast hour-bucket offsets (the SPRT
    convention, nothing event-sized collects except the ones-bounded
    position list that SIMULATES the stream; in production the
    sketch lives per key/shard inside a stateful actor)."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.ops.streaming import dgim_replay
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["ts", "event_id",
                                     "event_type"])

    def local_ranks(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"h": pd.Series(dtype="int64"),
                              "total": pd.Series(dtype="int64"),
                              "lrank": pd.Series(dtype="int64")})
        if df.empty:
            return empty
        d = df.copy()
        d["h"] = (d["ts"].astype("datetime64[us]").astype("int64")
                  // 3_600_000_000)
        out = []
        for h, grp in d.groupby("h", sort=True):
            g = grp.sort_values(["ts", "event_id"],
                                kind="mergesort")
            pos = np.arange(1, len(g) + 1, dtype=np.int64)
            ones = pos[(g["event_type"] == "purchase")
                       .to_numpy()]
            out.append(pd.DataFrame({
                "h": np.full(len(ones), h, dtype=np.int64),
                "total": np.full(len(ones), len(g),
                                 dtype=np.int64),
                "lrank": ones}))
            if not len(ones):
                out.append(pd.DataFrame({
                    "h": [np.int64(h)],
                    "total": [np.int64(len(g))],
                    "lrank": [np.int64(0)]}))   # count-carrier row
        return pd.concat(out, ignore_index=True) if out else empty

    def add_h(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["hb"] = (df["ts"].astype("datetime64[us]")
                    .astype("int64") // 3_600_000_000)
        return df

    ranks = grouped_apply(ds.map_batches(add_h,
                                         batch_format="pandas"),
                          ["hb"], local_ranks).to_pandas()
    if ranks.empty or "h" not in ranks.columns:
        return pd.DataFrame({c: pd.Series(dtype="int64") for c in [
            "n_stream", "window_w", "ones_in_window", "estimate",
            "n_buckets", "largest", "abs_error"]})
    # bucket-bounded offsets: prefix sums of per-hour totals
    per_h = ranks.groupby("h", sort=True)["total"].first()
    offsets = per_h.cumsum().shift(fill_value=0)
    n_stream = int(per_h.sum())
    ones = ranks[ranks["lrank"] > 0]
    pos = (ones["h"].map(offsets).to_numpy(np.int64)
           + ones["lrank"].to_numpy(np.int64))
    pos.sort()
    res = dgim_replay(pos, n_stream, window)
    return pd.DataFrame({k: [np.int64(v)] for k, v in res.items()})

def q_events_tree2(sf_dir: str):
    """Greedy depth-2 CART decision tree (Breiman et al. '84) for
    the conversion label (event_type ∈ {click, purchase}) over TWO
    features — hour-of-day and value — one level deeper than
    ``q_events_best_split``, and the same histogram-method trick:
    every candidate split of every node is a marginal of ONE joint
    (hod, value) label histogram, so root and both children come
    from a single combiner pass (no second scan after the root
    pick). Counts are exact integers; the Gini gain expression is
    sequenced identically on both engines and the
    (gain DESC, feature ASC, threshold ASC) pick is bit-stable
    (the stump convention). Output: one row per node (root, left,
    right) with its chosen split and class census."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.ops.tree import depth2_tree_from_hist
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_type", "ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        hod = ((df["ts"].astype("datetime64[us]").astype("int64")
                // 3_600_000_000) % 24).to_numpy(np.float64)
        y = df["event_type"].isin(["click", "purchase"]) \
            .to_numpy(np.int64)
        g = pd.DataFrame({"hod": hod,
                          "v": df["value"].to_numpy(np.float64),
                          "n": np.int64(1), "pos": y}) \
            .groupby(["hod", "v"], sort=False, as_index=False).sum()
        return g.astype({"n": "int64", "pos": "int64"})

    hist = grouped_aggregate(
        ds.map_batches(partial, batch_format="pandas",
                       batch_size=65536),
        ["hod", "v"], {"n": ("n", "sum"), "pos": ("pos", "sum")},
        result_hint="small").to_pandas()
    return depth2_tree_from_hist(hist, ["hod", "v"]) \
        .sort_values("node").reset_index(drop=True)

def _tree2_oracle_sql() -> str:
    def gini(pos: str, n: str) -> str:
        return (f"(1.0 - ({pos}/{n})*({pos}/{n}) "
                f"- (({n}-{pos})/{n})*(({n}-{pos})/{n}))")

    gain = (f"{gini('pt', 'nt')} "
            f"- (nl/nt)*{gini('posl', 'nl')} "
            f"- ((nt-nl)/nt)*"
            + gini("(pt-posl)", "(nt-nl)"))

    def block(name: str, cond: str) -> str:
        return f"""
    {name}_base AS MATERIALIZED (SELECT * FROM jh WHERE {cond}),
    {name}_tot AS (SELECT CAST(sum(n) AS DOUBLE) AS nt,
                          CAST(sum(pos) AS DOUBLE) AS pt
                   FROM {name}_base),
    {name}_cand AS (
        SELECT * FROM (
            SELECT 'hod' AS feature, hod AS thr,
                   CAST(sum(sum(n)) OVER (ORDER BY hod)
                        AS DOUBLE) AS nl,
                   CAST(sum(sum(pos)) OVER (ORDER BY hod)
                        AS DOUBLE) AS posl
            FROM {name}_base GROUP BY hod)
        UNION ALL
        SELECT * FROM (
            SELECT 'v' AS feature, v AS thr,
                   CAST(sum(sum(n)) OVER (ORDER BY v)
                        AS DOUBLE) AS nl,
                   CAST(sum(sum(pos)) OVER (ORDER BY v)
                        AS DOUBLE) AS posl
            FROM {name}_base GROUP BY v)),
    {name}_pick AS (
        SELECT feature, thr, {gain} AS gain
        FROM {name}_cand, {name}_tot WHERE nl < nt
        ORDER BY gain DESC, feature ASC, thr ASC LIMIT 1),
    {name}_row AS (
        SELECT '{name}' AS node,
               coalesce((SELECT feature FROM {name}_pick), 'none')
                   AS feature,
               coalesce((SELECT thr FROM {name}_pick), 0.0)
                   AS threshold,
               coalesce((SELECT round(gain, 6) FROM {name}_pick),
                        0.0) AS gain,
               CAST(t.nt AS BIGINT) AS n, CAST(t.pt AS BIGINT)
                   AS pos,
               round({gini('t.pt', 't.nt')}, 6) AS gini
        FROM {name}_tot t)"""

    rf = "(SELECT feature FROM root_pick)"
    rt = "(SELECT thr FROM root_pick)"
    lcond = (f"(({rf}) = 'hod' AND hod <= ({rt})) "
             f"OR (({rf}) = 'v' AND v <= ({rt}))")
    rcond = (f"(({rf}) = 'hod' AND hod > ({rt})) "
             f"OR (({rf}) = 'v' AND v > ({rt}))")
    return f"""
    WITH jh AS MATERIALIZED (
        SELECT CAST((epoch_us(ts) // 3600000000) % 24 AS DOUBLE)
                   AS hod,
               value AS v, count(*) AS n,
               sum(CASE WHEN event_type IN ('click', 'purchase')
                        THEN 1 ELSE 0 END) AS pos
        FROM events GROUP BY 1, 2),
    {block('root', 'TRUE')},
    {block('left', lcond)},
    {block('right', rcond)}
    SELECT * FROM (
        SELECT * FROM root_row
        UNION ALL SELECT * FROM left_row
        UNION ALL SELECT * FROM right_row)
    ORDER BY node"""

QUERIES = {
    'q_events_mannwhitney': q_events_mannwhitney,
    'q_events_spearman': q_events_spearman,
    'q_events_kruskal': q_events_kruskal,
    'q_events_hodges_lehmann': q_events_hodges_lehmann,
    'q_events_yule_walker': q_events_yule_walker,
    'q_events_sax': q_events_sax,
    'q_events_kalman': q_events_kalman,
    'q_events_tree2': q_events_tree2,
    'q_events_croston': q_events_croston,
    'q_events_dgim': q_events_dgim,
    'q_events_mcnemar': q_events_mcnemar,
    'q_events_ucb_replay': q_events_ucb_replay,
    'q_events_shapley': q_events_shapley,
    'q_events_tcloseness': q_events_tcloseness,
    'q_events_mondrian': q_events_mondrian,
    'q_events_voptimal': q_events_voptimal,
    'q_events_scc': q_events_scc,
    'q_events_matrix_profile': q_events_matrix_profile,
    'q_events_emd': q_events_emd,
    'q_events_huffman': q_events_huffman,
    'q_events_holt_winters': q_events_holt_winters,
    'q_events_did': q_events_did,
    'q_events_lincount': q_events_lincount,
    'q_events_mann_kendall': q_events_mann_kendall,
    'q_events_kendall_tau': q_events_kendall_tau,
    'q_events_perm_test': q_events_perm_test,
    'q_events_median_polish': q_events_median_polish,
    'q_events_sprt_srm': q_events_sprt_srm,
    'q_events_periodogram': q_events_periodogram,
    'q_events_ransac': q_events_ransac,
    'q_events_concurrency_histogram': q_events_concurrency_histogram,
}

ORACLES = {
    'q_events_shapley': """
            WITH ut AS MATERIALIZED (
                SELECT DISTINCT user_id, event_type FROM events),
            ty AS MATERIALIZED (
                SELECT event_type,
                       CAST(row_number() OVER (ORDER BY event_type)
                            - 1 AS BIGINT) AS idx
                FROM (SELECT DISTINCT event_type FROM ut)),
            nch AS (SELECT count(*) AS n FROM ty),
            um AS (
                SELECT user_id, SUM(1 << ty.idx) AS mask
                FROM ut JOIN ty USING (event_type)
                GROUP BY user_id),
            hist AS MATERIALIZED (
                SELECT mask, count(*) AS c FROM um GROUP BY mask),
            subs AS (SELECT unnest(range(64)) AS s),
            vs AS MATERIALIZED (
                SELECT s.s,
                       coalesce(SUM(CASE WHEN (h.mask & s.s) <> 0
                                         THEN h.c ELSE 0 END), 0)
                           AS v
                FROM subs s CROSS JOIN hist h
                WHERE s.s < (1 << (SELECT n FROM nch))
                GROUP BY s.s),
            phi AS (
                SELECT t.event_type AS channel,
                    SUM(CAST(factorial(CAST(bit_count(
                            CAST(v0.s AS BIGINT)) AS INTEGER))
                            AS BIGINT)
                        * CAST(factorial(CAST((SELECT n FROM nch)
                            - bit_count(CAST(v0.s AS BIGINT)) - 1
                            AS INTEGER)) AS BIGINT)
                        * (v1.v - v0.v)) AS phi
                FROM ty t
                JOIN vs v0 ON (v0.s & (1 << t.idx)) = 0
                JOIN vs v1 ON v1.s = (v0.s | (1 << t.idx))
                GROUP BY t.event_type)
            SELECT channel, CAST(phi AS BIGINT) AS shapley_scaled,
                   round(CAST(phi AS DOUBLE)
                         / (SELECT SUM(phi) FROM phi), 6) AS share
            FROM phi ORDER BY channel
        """,
}
ORACLE_REGISTRY.update(ORACLES)
ORACLES['q_events_mondrian'] = ORACLE_REGISTRY['q_events_mondrian'] = _mondrian_oracle_sql(levels=3)
ORACLES['q_events_voptimal'] = ORACLE_REGISTRY['q_events_voptimal'] = _voptimal_oracle_sql(buckets=4)
ORACLES['q_events_scc'] = ORACLE_REGISTRY['q_events_scc'] = _SCC_ORACLE_SQL
ORACLES['q_events_matrix_profile'] = ORACLE_REGISTRY['q_events_matrix_profile'] = _matrix_profile_oracle_sql(m=24)
ORACLES['q_events_emd'] = ORACLE_REGISTRY['q_events_emd'] = _EMD_ORACLE_SQL
ORACLES['q_events_huffman'] = ORACLE_REGISTRY['q_events_huffman'] = _huffman_oracle_sql(merges=4)
ORACLES['q_events_holt_winters'] = ORACLE_REGISTRY['q_events_holt_winters'] = _holt_winters_oracle_sql()
ORACLES['q_events_did'] = ORACLE_REGISTRY['q_events_did'] = _DID_ORACLE_SQL
ORACLES['q_events_lincount'] = ORACLE_REGISTRY['q_events_lincount'] = _lincount_oracle_sql(m=4096)
ORACLES['q_events_mann_kendall'] = ORACLE_REGISTRY['q_events_mann_kendall'] = _MANN_KENDALL_ORACLE_SQL
ORACLES['q_events_kendall_tau'] = ORACLE_REGISTRY['q_events_kendall_tau'] = _KENDALL_TAU_ORACLE_SQL
ORACLES['q_events_mannwhitney'] = ORACLE_REGISTRY['q_events_mannwhitney'] = _MANNWHITNEY_ORACLE_SQL
ORACLES['q_events_spearman'] = ORACLE_REGISTRY['q_events_spearman'] = _SPEARMAN_ORACLE_SQL
ORACLES['q_events_kruskal'] = ORACLE_REGISTRY['q_events_kruskal'] = _kruskal_oracle_sql()
ORACLES['q_events_hodges_lehmann'] = ORACLE_REGISTRY['q_events_hodges_lehmann'] = _HODGES_LEHMANN_ORACLE_SQL
ORACLES['q_events_yule_walker'] = ORACLE_REGISTRY['q_events_yule_walker'] = _YULE_WALKER_ORACLE_SQL
ORACLES['q_events_croston'] = ORACLE_REGISTRY['q_events_croston'] = _croston_oracle_sql(alpha=0.125)
ORACLES['q_events_dgim'] = ORACLE_REGISTRY['q_events_dgim'] = _dgim_oracle_sql(window=2048)
ORACLES['q_events_mcnemar'] = ORACLE_REGISTRY['q_events_mcnemar'] = _MCNEMAR_ORACLE_SQL
ORACLES['q_events_ucb_replay'] = ORACLE_REGISTRY['q_events_ucb_replay'] = _UCB_REPLAY_ORACLE_SQL
ORACLES['q_events_sax'] = ORACLE_REGISTRY['q_events_sax'] = _sax_oracle_sql(word=16)
ORACLES['q_events_kalman'] = ORACLE_REGISTRY['q_events_kalman'] = _kalman_oracle_sql(q_var=1.0,
                                                    r_var=4.0)
ORACLES['q_events_tree2'] = ORACLE_REGISTRY['q_events_tree2'] = _tree2_oracle_sql()
ORACLES['q_events_perm_test'] = ORACLE_REGISTRY['q_events_perm_test'] = _perm_test_oracle_sql(n_perms=20)
ORACLES['q_events_median_polish'] = ORACLE_REGISTRY['q_events_median_polish'] = _median_polish_oracle_sql(
        iters=2)
ORACLES['q_events_sprt_srm'] = ORACLE_REGISTRY['q_events_sprt_srm'] = _sprt_srm_oracle_sql(p1=0.55)
ORACLES['q_events_periodogram'] = ORACLE_REGISTRY['q_events_periodogram'] = _periodogram_oracle_sql(
        harmonics=4)
ORACLES['q_events_ransac'] = ORACLE_REGISTRY['q_events_ransac'] = _ransac_oracle_sql(k=32, eps=5)
ORACLES['q_events_concurrency_histogram'] = ORACLE_REGISTRY['q_events_concurrency_histogram'] = _CONCURRENCY_HIST_ORACLE_SQL
ORACLES['q_events_tcloseness'] = ORACLE_REGISTRY['q_events_tcloseness'] = """
        WITH cells AS MATERIALIZED (
            SELECT user_id // 10 AS ubucket,
                   (epoch_us(ts) // 3600000000) % 24 AS hod,
                   event_type, count(*) AS n
            FROM events GROUP BY 1, 2, 3),
        g AS MATERIALIZED (
            SELECT event_type, SUM(n) AS gn FROM cells GROUP BY 1),
        nt AS (SELECT SUM(gn) AS n_tot FROM g),
        cls AS MATERIALIZED (
            SELECT ubucket, hod, SUM(n) AS n_c
            FROM cells GROUP BY 1, 2),
        grid AS (
            SELECT cls.ubucket, cls.hod, cls.n_c, g.gn,
                   coalesce(c.n, 0) AS n
            FROM cls CROSS JOIN g
            LEFT JOIN cells c ON c.ubucket = cls.ubucket
                             AND c.hod = cls.hod
                             AND c.event_type = g.event_type),
        tv AS (
            SELECT ubucket, hod, any_value(n_c) AS n_c,
                   SUM(abs(n * (SELECT n_tot FROM nt) - gn * n_c))
                       AS tvd_num
            FROM grid GROUP BY 1, 2)
        SELECT ubucket, hod, CAST(n_c AS BIGINT) AS n_rows,
               CAST(tvd_num AS BIGINT) AS tvd_num,
               round(CAST(tvd_num AS DOUBLE)
                     / (2.0 * n_c * (SELECT n_tot FROM nt)), 6)
                   AS tvd
        FROM tv
        ORDER BY CAST(tvd_num AS DOUBLE) / n_c DESC, ubucket, hod
        LIMIT 10"""
