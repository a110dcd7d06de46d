"""Tests for the graph (PageRank), HLL sketch, and JSON-extraction ops."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from jerex_ray.ops.graph import pagerank
from jerex_ray.ops.jsonx import extract_json_int, extract_json_string
from jerex_ray.ops.sketch import (hll_distinct, hll_estimate,
                                  hll_partial_registers)


def _dense_pagerank(edges, damping=0.85, iters=5):
    """In-memory reference: same semantics (undirected, subgraph of
    nodes with >=1 edge, no dangling term)."""
    nodes = sorted({u for e in edges for u in e})
    pos = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for a, b in edges:
        deg[pos[a]] += 1
        deg[pos[b]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        s = np.zeros(n)
        for a, b in edges:
            s[pos[b]] += r[pos[a]] / deg[pos[a]]
            s[pos[a]] += r[pos[b]] / deg[pos[b]]
        r = (1.0 - damping) / n + damping * s
    return pd.DataFrame({"node": nodes, "pr": r})


def _edge_ds(edges):
    return rd.from_pandas(pd.DataFrame(
        {"doc_a": [a for a, _ in edges], "doc_b": [b for _, b in edges]}))


def test_pagerank_matches_dense_reference():
    rng = np.random.default_rng(7)
    edges = sorted({(int(a), int(b)) for a, b in
                    rng.integers(0, 30, size=(60, 2)) if a < b})
    ref = _dense_pagerank(edges)
    got = pagerank(_edge_ds(edges), iters=5)
    assert list(got["node"]) == list(ref["node"])
    np.testing.assert_allclose(got["pr"], ref["pr"], rtol=0, atol=1e-12)
    # ranks are a probability distribution over the subgraph
    assert abs(got["pr"].sum() - 1.0) < 1e-9


def test_pagerank_join_mode_matches_broadcast():
    rng = np.random.default_rng(11)
    edges = sorted({(int(a), int(b)) for a, b in
                    rng.integers(0, 20, size=(40, 2)) if a < b})
    b = pagerank(_edge_ds(edges), iters=3, mode="broadcast")
    j = pagerank(_edge_ds(edges), iters=3, mode="join")
    assert list(b["node"]) == list(j["node"])
    np.testing.assert_allclose(b["pr"], j["pr"], rtol=0, atol=1e-12)


def test_pagerank_empty_edges():
    out = pagerank(_edge_ds([]), iters=3)
    assert len(out) == 0 and list(out.columns) == ["node", "pr"]


def test_hll_accuracy_and_merge():
    # single-shot accuracy: 1.04/sqrt(4096) ~ 1.6% std error; gate at 4 sigma
    vals = np.array([f"user-{i}" for i in range(20000)], dtype=object)
    regs = hll_partial_registers(vals, 12)
    est, _ = hll_estimate(regs)
    assert abs(est - 20000) / 20000 < 0.065
    # mergeability: max-merge of disjoint halves == one-shot registers
    r1 = hll_partial_registers(vals[:9000], 12)
    r2 = hll_partial_registers(vals[9000:], 12)
    np.testing.assert_array_equal(np.maximum(r1, r2), regs)
    # duplicates never change the sketch
    r3 = hll_partial_registers(np.concatenate([vals, vals[:5000]]), 12)
    np.testing.assert_array_equal(r3, regs)


def test_hll_distinct_linear_counting_exactish():
    # small cardinality -> linear counting, estimate within 2%
    df = pd.DataFrame({"user_id": np.arange(4000) % 120})
    out = hll_distinct(rd.from_pandas(df), column="user_id", p=12)
    assert int(out["registers_set"].iloc[0]) <= 120
    assert abs(out["estimate"].iloc[0] - 120) / 120 < 0.02


def test_extract_json_int_and_string():
    t = pa.table({"props": ['{"k": 69}', '{"k":-3, "s": "x y"}',
                            '{"other": 1}', None, '{ "k" : 12 }']})
    out = extract_json_int(t, json_col="props", key="k", out="k_val")
    assert out["k_val"].to_pylist() == [69, -3, None, None, 12]
    out2 = extract_json_string(t, json_col="props", key="s", out="s_val")
    assert out2["s_val"].to_pylist() == [None, "x y", None, None, None]


def test_hll_distinct_by_group():
    from jerex_ray.ops.sketch import hll_distinct_by
    rng = np.random.default_rng(3)
    # group "big" exits the linear-counting regime; "small" stays in it
    big = pd.DataFrame({"g": "big",
                        "u": rng.integers(0, 15000, size=60000)})
    small = pd.DataFrame({"g": "small", "u": rng.integers(0, 80, size=500)})
    df = pd.concat([big, small], ignore_index=True)
    out = hll_distinct_by(rd.from_pandas(df), column="u", group="g", p=12) \
        .set_index("g")
    exact = df.groupby("g")["u"].nunique()
    for g in ("big", "small"):
        err = abs(out.loc[g, "estimate"] - exact[g]) / exact[g]
        assert err < 0.08, (g, out.loc[g, "estimate"], exact[g])
    assert abs(out.loc["small", "estimate"] - exact["small"]) < 2


def test_build_vocab_ranking_and_ties():
    from jerex_ray.ops.textstats import build_vocab
    docs = rd.from_pandas(pd.DataFrame({
        "text": ["b a a", "c b a", "", None]}))
    out = build_vocab(docs, top=2)
    # a:3 b:2 c:1 -> top 2; token ids dense from 0
    assert list(out["word"]) == ["a", "b"]
    assert list(out["token_id"]) == [0, 1]
    assert list(out["cnt"]) == [3, 2]
    # tie broken by word ascending
    tie = build_vocab(rd.from_pandas(pd.DataFrame(
        {"text": ["z y", "y z"]})), top=5)
    assert list(tie["word"]) == ["y", "z"]


def test_hll_distinct_empty_input():
    from jerex_ray.ops.sketch import hll_distinct
    out = hll_distinct(rd.from_pandas(
        pd.DataFrame({"user_id": pd.Series(dtype="int64")})),
        column="user_id", p=12)
    assert out["estimate"].iloc[0] == 0.0
    assert int(out["registers_set"].iloc[0]) == 0


def test_new_ops_deterministic_under_resharding():
    """Partitioning must never change results: HLL registers (max-merge
    is commutative), duplicate spans (integer coordinates), PageRank
    (float sums agree to 1e-12 across shard layouts)."""
    from jerex_ray.ops.sketch import hll_distinct
    from jerex_ray.ops.substr import duplicate_spans
    rng = np.random.default_rng(31)
    texts = [" ".join(map(str, rng.integers(0, 30, size=20)))
             for _ in range(40)]
    texts += texts[:6]          # planted duplicates
    docs = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                         "text": texts})
    ev = pd.DataFrame({"user_id": rng.integers(0, 500, size=3000)})

    outs = []
    for parts in (1, 7):
        d = rd.from_pandas(docs).repartition(parts)
        spans = duplicate_spans(d, n=8, min_count=2).to_pandas()
        spans = sorted(map(tuple, spans.values)) if len(spans) else []
        h = hll_distinct(rd.from_pandas(ev).repartition(parts),
                         column="user_id", p=12)
        outs.append((spans, float(h["estimate"].iloc[0]),
                     int(h["registers_set"].iloc[0])))
    assert outs[0] == outs[1]

    edges = sorted({(int(a), int(b)) for a, b in
                    rng.integers(0, 25, size=(50, 2)) if a < b})
    prs = []
    for parts in (1, 5):
        e = rd.from_pandas(pd.DataFrame(
            {"doc_a": [a for a, _ in edges],
             "doc_b": [b for _, b in edges]})).repartition(parts)
        prs.append(pagerank(e, iters=4))
    assert list(prs[0]["node"]) == list(prs[1]["node"])
    np.testing.assert_allclose(prs[0]["pr"], prs[1]["pr"], atol=1e-12)


def test_mixture_sample_weights_and_determinism():
    from jerex_ray.ops.split import mixture_sample
    n = 3000
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                       "source": np.where(np.arange(n) % 2 == 0,
                                          "a", "b")})
    ds = rd.from_pandas(df)
    out = mixture_sample(ds, weights={"a": 2.5, "b": 0.25}) \
        .to_pandas()
    a = out[out["source"] == "a"]
    b = out[out["source"] == "b"]
    # expectation: a emitted ~2.5x (1500*2.5=3750), b ~0.25x (375)
    assert abs(len(a) - 3750) < 150 and abs(len(b) - 375) < 80
    # every 'a' doc appears at least floor(2.5)=2 times, at most 3
    per = a.groupby("doc_id").size()
    assert per.min() == 2 and per.max() == 3 and len(per) == 1500
    # copy_idx dense from 0 per doc
    assert (a.groupby("doc_id")["copy_idx"].min() == 0).all()
    assert (a.groupby("doc_id")["copy_idx"].max() == per - 1).all()
    # deterministic under resharding
    out2 = mixture_sample(ds.repartition(7),
                          weights={"a": 2.5, "b": 0.25}).to_pandas()
    k = ["doc_id", "copy_idx"]
    assert sorted(map(tuple, out[k].values)) \
        == sorted(map(tuple, out2[k].values))


def test_weighted_sample_determinism_and_bias():
    from jerex_ray.ops.split import weighted_sample
    n = 4000
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                       "source": np.where(np.arange(n) % 2 == 0,
                                          "hot", "cold")})
    ds = rd.from_pandas(df)
    out = weighted_sample(ds, k=400,
                          weights={"hot": 8.0, "cold": 1.0}).to_pandas()
    assert len(out) == 400 and out["doc_id"].is_unique
    # heavy weight dominates the sample (hot inclusion prob >> cold)
    frac_hot = (out["source"] == "hot").mean()
    assert frac_hot > 0.75, frac_hot
    # deterministic under resharding
    out2 = weighted_sample(ds.repartition(7), k=400,
                           weights={"hot": 8.0, "cold": 1.0}).to_pandas()
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])


def test_chunk_documents_edges():
    from jerex_ray.ops.textstats import chunk_documents
    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": [" ".join(f"w{i}" for i in range(n))
                 for n in (5, 8, 9, 0)]}))
    out = chunk_documents(docs, chunk_words=8, overlap=3).to_pandas()
    got = {d: sorted(map(tuple, sub[["chunk_idx", "start", "end"]]
                         .values))
           for d, sub in out.groupby("doc_id")}
    assert got[0] == [(0, 0, 5)]                 # short doc: one chunk
    assert got[1] == [(0, 0, 8)]                 # exact fit: one chunk
    assert got[2] == [(0, 0, 8), (1, 5, 9)]      # one extra clipped
    assert 3 not in got                          # empty doc: no chunks
    # chunks cover the doc and overlap by exactly `overlap`
    sub = out[out["doc_id"] == 2].sort_values("chunk_idx")
    assert sub.iloc[0]["end"] - sub.iloc[1]["start"] == 3
    # reconstructed text matches the original words
    row = sub.iloc[1]
    assert row["chunk_text"] == " ".join(f"w{i}" for i in range(5, 9))


def test_column_expectations_and_snapshot_diff():
    from jerex_ray.ops.validate import column_expectations, snapshot_diff
    df = pd.DataFrame({"id": np.arange(10, dtype=np.int64),
                       "v": [1.0, 2.0, np.nan, -5.0, 99.0,
                             3.0, 4.0, np.nan, 5.0, 6.0]})
    out = column_expectations(rd.from_pandas(df).repartition(3),
                              {"v": (0.0, 10.0)}).set_index("column")
    assert out.loc["v", "n_rows"] == 10
    assert out.loc["v", "n_null"] == 2
    assert out.loc["v", "vmin"] == -5.0 and out.loc["v", "vmax"] == 99.0
    assert out.loc["v", "n_out_of_range"] == 2   # -5 and 99

    old = rd.from_pandas(pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": ["a", "b", "c"]}))
    new = rd.from_pandas(pd.DataFrame(
        {"doc_id": [2, 3, 4], "text": ["b", "C CHANGED", "d"]}))
    diff = snapshot_diff(old, new).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(map(tuple, diff.values)) == [
        (1, "removed"), (3, "changed"), (4, "added")]


# ---------- triangle counting ----------

def _brute_triangles(edges):
    """Per-node triangle counts by brute force over canonical edges."""
    es = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    nodes = sorted({u for e in es for u in e})
    from collections import Counter
    cnt = Counter()
    import itertools
    for x, y, z in itertools.combinations(nodes, 3):
        if (x, y) in es and (x, z) in es and (y, z) in es:
            cnt[x] += 1
            cnt[y] += 1
            cnt[z] += 1
    return pd.DataFrame(
        {"node": sorted(cnt), "n_triangles": [cnt[n] for n in sorted(cnt)]})


def test_triangle_counts_match_brute_force():
    from jerex_ray.ops.graph import triangle_counts
    rng = np.random.default_rng(11)
    edges = [tuple(rng.integers(0, 30, 2)) for _ in range(150)]
    # include duplicates and reversed duplicates: the op canonicalizes
    edges += [(b, a) for a, b in edges[:20]]
    got = triangle_counts(
        rd.from_pandas(pd.DataFrame({"a": [a for a, _ in edges],
                                     "b": [b for _, b in edges]})),
        src="a", dst="b").to_pandas()
    got = got.sort_values("node").reset_index(drop=True)
    got["node"] = got["node"].astype("int64")
    got["n_triangles"] = got["n_triangles"].astype("int64")
    want = _brute_triangles(edges)
    pd.testing.assert_frame_equal(got, want.astype(
        {"node": "int64", "n_triangles": "int64"}))


def test_triangle_counts_star_has_none_clique_has_all():
    from jerex_ray.ops.graph import triangle_counts
    # star K1,5: no triangles at all → empty result
    star = pd.DataFrame({"a": [0] * 5, "b": [1, 2, 3, 4, 5]})
    out = triangle_counts(rd.from_pandas(star), src="a", dst="b") \
        .to_pandas()
    assert len(out) == 0
    # K5: every node in C(4,2)=6 triangles
    import itertools
    k5 = list(itertools.combinations(range(5), 2))
    out = triangle_counts(
        rd.from_pandas(pd.DataFrame({"a": [a for a, _ in k5],
                                     "b": [b for _, b in k5]})),
        src="a", dst="b").to_pandas().sort_values("node")
    assert list(out["node"]) == [0, 1, 2, 3, 4]
    assert list(out["n_triangles"].astype(int)) == [6] * 5


# ---------- count-min sketch ----------

def test_cms_is_one_sided_and_exact_without_collisions():
    from jerex_ray.ops.sketch import cms_build, cms_query

    rng = np.random.default_rng(5)
    vals = np.array([f"v{i}" for i in rng.integers(0, 20, 5000)])
    ds = rd.from_pandas(pd.DataFrame({"x": vals}))
    # wide sketch: 20 distinct values over 4×4096 buckets — collisions
    # vanishingly unlikely, estimates must be EXACT
    counters = cms_build(ds, column="x", depth=4, width=4096)
    uniq, true = np.unique(vals, return_counts=True)
    est = cms_query(counters, uniq)
    assert (est == true).all()
    # narrow sketch: collisions possible, estimate NEVER below truth
    counters = cms_build(ds, column="x", depth=2, width=8)
    est = cms_query(counters, uniq)
    assert (est >= true).all()


def test_cms_partials_merge_by_addition():
    from jerex_ray.ops.sketch import cms_partial, cms_query

    a = np.array(["x", "y", "x"])
    b = np.array(["y", "z"])
    whole = cms_partial(np.concatenate([a, b]), depth=3, width=64)
    merged = cms_partial(a, depth=3, width=64) \
        + cms_partial(b, depth=3, width=64)
    assert (whole == merged).all()
    assert list(cms_query(merged, np.array(["x", "y", "z", "w"]))) \
        == [2, 2, 1, 0]


def test_triangle_counts_self_loops_only_is_empty():
    from jerex_ray.ops.graph import triangle_counts
    out = triangle_counts(
        rd.from_pandas(pd.DataFrame({"a": [1, 2], "b": [1, 2]})),
        src="a", dst="b").to_pandas()
    # schema may be dropped by the empty-Dataset collect (library
    # edge, documented in the verify notes) — the contract is "no
    # rows, no crash"
    assert len(out) == 0


# ---------- k-core ----------

def _brute_kcore(edges, k):
    es = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    while True:
        from collections import Counter
        deg = Counter()
        for a, b in es:
            deg[a] += 1
            deg[b] += 1
        drop = {u for u, d in deg.items() if d < k}
        if not drop:
            return {u: d for u, d in deg.items()}
        es = {(a, b) for a, b in es if a not in drop and b not in drop}


def test_kcore_matches_brute_force():
    from jerex_ray.ops.graph import kcore

    rng = np.random.default_rng(23)
    edges = [tuple(rng.integers(0, 25, 2)) for _ in range(120)]
    got = kcore(rd.from_pandas(pd.DataFrame(
        {"a": [a for a, _ in edges], "b": [b for _, b in edges]})),
        k=4, max_rounds=30).to_pandas()
    want = _brute_kcore(edges, 4)
    assert dict(zip(got["node"].astype(int),
                    got["deg"].astype(int))) == want


def test_kcore_cascade_peels_chain_to_nothing():
    from jerex_ray.ops.graph import kcore

    # a path graph has empty 2-core: every peel removes the endpoints
    chain = pd.DataFrame({"a": range(9), "b": range(1, 10)})
    out = kcore(rd.from_pandas(chain), k=2, max_rounds=10).to_pandas()
    assert len(out) == 0
    # a cycle IS its own 2-core (fixpoint in one round)
    cyc = pd.DataFrame({"a": list(range(10)),
                        "b": [(i + 1) % 10 for i in range(10)]})
    out = kcore(rd.from_pandas(cyc), k=2, max_rounds=10).to_pandas()
    assert len(out) == 10 and (out["deg"] == 2).all()


def test_triangles_and_kcore_deterministic_under_resharding():
    from jerex_ray.ops.graph import kcore, triangle_counts
    rng = np.random.default_rng(41)
    edges = pd.DataFrame(rng.integers(0, 40, size=(300, 2)),
                         columns=["a", "b"])
    outs = []
    for parts in (1, 9):
        e = rd.from_pandas(edges).repartition(parts)
        t = triangle_counts(e, src="a", dst="b").to_pandas() \
            .sort_values("node").reset_index(drop=True)
        kc = kcore(rd.from_pandas(edges).repartition(parts),
                   k=5, max_rounds=20).to_pandas() \
            .sort_values("node").reset_index(drop=True)
        outs.append((t, kc))
    pd.testing.assert_frame_equal(outs[0][0], outs[1][0])
    pd.testing.assert_frame_equal(outs[0][1], outs[1][1])


def test_bipartite_jaccard_vs_bruteforce():
    import itertools
    import ray.data as rd
    from jerex_ray.ops.graph import bipartite_jaccard
    rng = np.random.default_rng(11)
    rows = pd.DataFrame({
        "s": rng.integers(0, 12, 300),
        "p": rng.integers(0, 25, 300)})
    out = bipartite_jaccard(rd.from_pandas(rows), left_col="s",
                            right_col="p", top_k=10)
    nbrs = {s: set(g["p"]) for s, g in rows.groupby("s")}
    exp = []
    for a, b in itertools.combinations(sorted(nbrs), 2):
        sh = len(nbrs[a] & nbrs[b])
        if sh:
            exp.append((a, b, sh,
                        round(sh / len(nbrs[a] | nbrs[b]), 6)))
    exp.sort(key=lambda r: (-r[3], r[0], r[1]))
    exp = exp[:10]
    got = list(map(tuple, out[["a", "b", "shared", "jaccard"]]
                   .itertuples(index=False)))
    assert got == exp


def test_bipartite_jaccard_empty_and_disjoint():
    import ray.data as rd
    from jerex_ray.ops.graph import bipartite_jaccard
    disjoint = pd.DataFrame({"s": [1, 2, 3], "p": [10, 20, 30]})
    out = bipartite_jaccard(rd.from_pandas(disjoint), left_col="s",
                            right_col="p", top_k=5)
    assert out.empty


def test_bfs_levels_matches_bruteforce():
    import collections
    import ray.data as rd
    from jerex_ray.ops.graph import bfs_levels
    rng = np.random.default_rng(7)
    edges = pd.DataFrame({"a": rng.integers(0, 40, 120),
                          "b": rng.integers(0, 40, 120)})
    edges = edges[edges["a"] != edges["b"]].reset_index(drop=True)
    got = bfs_levels(rd.from_pandas(edges).repartition(4), 0,
                     num_partitions=3)
    adj = collections.defaultdict(set)
    for a, b in edges.itertuples(index=False):
        adj[a].add(b); adj[b].add(a)
    exp, frontier, lvl = {0: 0}, {0}, 0
    while frontier:
        lvl += 1
        frontier = {v for u in frontier for v in adj[u]
                    if v not in exp}
        for v in frontier:
            exp[v] = lvl
    assert dict(zip(got["node"], got["level"])) == exp


def test_bfs_levels_chain_and_isolated():
    import ray.data as rd
    from jerex_ray.ops.graph import bfs_levels
    chain = pd.DataFrame({"a": [0, 1, 2, 10], "b": [1, 2, 3, 11]})
    got = bfs_levels(rd.from_pandas(chain), 0, num_partitions=2)
    # disconnected 10-11 never reached; chain levels exact
    assert dict(zip(got["node"], got["level"])) == {0: 0, 1: 1,
                                                    2: 2, 3: 3}
    # a source with no edges is level 0 alone
    alone = bfs_levels(rd.from_pandas(chain), 99, num_partitions=2)
    assert dict(zip(alone["node"], alone["level"])) == {99: 0}
    # directed mode never walks an edge backwards
    fwd = bfs_levels(rd.from_pandas(chain), 3, undirected=False,
                     num_partitions=2)
    assert dict(zip(fwd["node"], fwd["level"])) == {3: 0}


def test_skyline_2d_matches_bruteforce():
    import ray.data as rd
    from jerex_ray.relational import skyline_2d
    rng = np.random.default_rng(3)
    df = pd.DataFrame({"id": np.arange(400),
                       "x": rng.integers(0, 25, 400).astype(float),
                       "y": rng.integers(0, 25, 400).astype(float)})
    # plant an exact duplicate of an extreme point (ties must BOTH
    # survive) and a NaN row (must be dropped, not dominate)
    df.loc[0, ["x", "y"]] = [0.0, 24.0]
    df.loc[1, ["x", "y"]] = [0.0, 24.0]
    df.loc[2, "y"] = np.nan
    got = skyline_2d(rd.from_pandas(df).repartition(5),
                     min_col="x", max_col="y")
    pts = df.dropna(subset=["x", "y"])
    def dominated(p):
        return bool(((pts["x"] <= p.x) & (pts["y"] >= p.y)
                     & ((pts["x"] < p.x) | (pts["y"] > p.y))).any())
    exp = sorted(p.id for p in pts.itertuples() if not dominated(p))
    assert sorted(got["id"]) == exp
    assert {0, 1} <= set(got["id"])


def test_part_clustering_identities():
    from jerex_ray.pipelines.queries import q_part_clustering
    out = q_part_clustering("/root/testdata/sf0.001")
    # cc bounded in [0,1]; triangle-free nodes carry cc=0, and any
    # node with a triangle needs degree >= 2
    assert ((out["cc"] >= 0) & (out["cc"] <= 1)).all()
    z = out[out["n_triangles"] == 0]
    assert (z["cc"] == 0).all()
    assert (out.loc[out["n_triangles"] > 0, "degree"] >= 2).all()
    # hand-check one node against networkx-free brute force
    import duckdb
    con = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    e = con.sql(f"""SELECT DISTINCT a.l_partkey a, b.l_partkey b
        FROM '{sf}/lineitem.parquet' a JOIN '{sf}/lineitem.parquet' b
        ON a.l_orderkey=b.l_orderkey AND a.l_partkey<b.l_partkey""") \
        .df()
    adj = {}
    for a, b in e.itertuples(index=False):
        adj.setdefault(a, set()).add(b); adj.setdefault(b, set()).add(a)
    node = int(out.iloc[0]["node"])
    nb = sorted(adj[node])
    t = sum(1 for i, u in enumerate(nb) for v in nb[i + 1:]
            if v in adj[u])
    d = len(nb)
    assert int(out.iloc[0]["n_triangles"]) == t
    assert abs(out.iloc[0]["cc"] - round(2 * t / (d * (d - 1)), 6)) \
        < 1e-9


def test_source_vocab_jaccard_bruteforce():
    import pyarrow.parquet as pq
    from jerex_ray.pipelines.queries import doc_source_vocab_jaccard
    out = doc_source_vocab_jaccard("/root/testdata/sf0.001")
    df = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                       columns=["source", "text"]).to_pandas()
    vocab = {s: set(w for t in g["text"].fillna("")
                    for w in t.lower().split())
             for s, g in df.groupby("source")}
    for r in out.itertuples():
        a, b = vocab[r.source_a], vocab[r.source_b]
        assert r.shared == len(a & b)
        assert abs(r.jaccard - round(len(a & b) / len(a | b), 6)) < 1e-9


def test_user_entry_exit_bruteforce():
    import pyarrow.parquet as pq
    from jerex_ray.pipelines.queries import q_user_entry_exit
    out = q_user_entry_exit("/root/testdata/sf0.001")
    ev = pq.read_table("/root/testdata/sf0.001/events.parquet").to_pandas()
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    g = ev.groupby("user_id")
    f, l = g.head(1).set_index("user_id"), g.tail(1).set_index("user_id")
    assert len(out) == ev["user_id"].nunique()
    for r in out.itertuples():
        assert r.first_type == f.loc[r.user_id, "event_type"]
        assert r.last_type == l.loc[r.user_id, "event_type"]
        assert r.first_value == f.loc[r.user_id, "value"]
        assert r.last_value == l.loc[r.user_id, "value"]


def test_events_type_lift_bruteforce():
    import pyarrow.parquet as pq
    from jerex_ray.pipelines.queries import q_events_type_lift
    out = q_events_type_lift("/root/testdata/sf0.001")
    ev = pq.read_table("/root/testdata/sf0.001/events.parquet",
                       columns=["ts", "user_id", "event_type"]).to_pandas()
    ev["day"] = ev["ts"].astype("int64") // 86_400_000_000
    b = ev[["user_id", "day", "event_type"]].drop_duplicates()
    n_baskets = len(b[["user_id", "day"]].drop_duplicates())
    tcnt = b["event_type"].value_counts().to_dict()
    # lifts self-consistent and pairs symmetric-ordered
    assert (out["ta"] < out["tb"]).all()
    for r in out.itertuples():
        got = round(r.n_ab * n_baskets / (tcnt[r.ta] * tcnt[r.tb]), 6)
        assert abs(r.lift - got) < 1e-9
    # spot-check one pair count by brute force
    r0 = out.iloc[0]
    sa = b[b["event_type"] == r0["ta"]].set_index(["user_id", "day"]).index
    sb = b[b["event_type"] == r0["tb"]].set_index(["user_id", "day"]).index
    assert r0["n_ab"] == len(set(sa) & set(sb))


def test_part_abc_invariants():
    import numpy as np
    import pyarrow.parquet as pq
    from jerex_ray.pipelines.queries import q_part_abc
    out = q_part_abc("/root/testdata/sf0.001")
    li = pq.read_table("/root/testdata/sf0.001/lineitem.parquet",
                       columns=["l_partkey", "l_extendedprice"]).to_pandas()
    cents = (np.round(li["l_extendedprice"].to_numpy(np.float64) * 100)
             .astype(np.int64))
    per = (li.assign(c=cents).groupby("l_partkey")["c"].sum()
           .astype("int64"))
    tot = int(per.sum())
    assert len(out) == len(per)
    assert int(out["cents"].sum()) == tot
    # exact per-part cents and the inclusive descending-cumsum parity
    d = out.sort_values(["cents", "l_partkey"],
                        ascending=[False, True]).reset_index(drop=True)
    assert (d["cum_cents"].to_numpy() ==
            np.cumsum(d["cents"].to_numpy())).all()
    cum = d["cum_cents"].to_numpy(np.int64)
    cls = np.where(cum * 10 <= tot * 8, "A",
                   np.where(cum * 20 <= tot * 19, "B", "C"))
    assert (d["abc_class"].to_numpy() == cls).all()
    for r in out.itertuples():
        assert per.loc[r.l_partkey] == r.cents


def _dense_hits(edges, iters=4):
    """In-memory HITS reference: unnormalized alternation, final L1."""
    hubs = sorted({u for u, _ in edges})
    auths = sorted({v for _, v in edges})
    hp = {u: i for i, u in enumerate(hubs)}
    ap = {v: i for i, v in enumerate(auths)}
    A = np.zeros((len(hubs), len(auths)))
    for u, v in edges:
        A[hp[u], ap[v]] = 1.0
    h = np.ones(len(hubs))
    for _ in range(iters):
        a = A.T @ h
        h = A @ a
    return dict(zip(auths, a / a.sum())), dict(zip(hubs, h / h.sum()))


def test_hits_matches_dense_reference():
    from jerex_ray.ops.graph import hits
    rng = np.random.default_rng(7)
    edges = sorted({(int(rng.integers(0, 12)), int(rng.integers(100, 120)))
                    for _ in range(80)})
    dup = edges + edges[:10]  # duplicate incidences must collapse
    ds = rd.from_pandas(pd.DataFrame(dup, columns=["cust", "part"]))
    out = hits(ds, hub_col="cust", auth_col="part", iters=4)
    a_ref, h_ref = _dense_hits(edges)
    got_a = out[out["side"] == "auth"].set_index("node")["score"]
    got_h = out[out["side"] == "hub"].set_index("node")["score"]
    assert set(got_a.index) == set(a_ref) and set(got_h.index) == set(h_ref)
    for v, s in a_ref.items():
        assert abs(got_a.loc[v] - round(s, 6)) < 2e-6
    for u, s in h_ref.items():
        assert abs(got_h.loc[u] - round(s, 6)) < 2e-6
    assert abs(got_a.sum() - 1.0) < 1e-4 and abs(got_h.sum() - 1.0) < 1e-4


def test_hits_empty_input_returns_typed_empty():
    from jerex_ray.ops.graph import hits
    ds = rd.from_pandas(pd.DataFrame({"cust": pd.Series(dtype="int64"),
                                      "part": pd.Series(dtype="int64")}))
    out = hits(ds, hub_col="cust", auth_col="part")
    assert out.empty and list(out.columns) == ["side", "node", "score"]


def test_multi_bfs_levels_matches_single_source_runs():
    from jerex_ray.ops.graph import bfs_levels, multi_bfs_levels
    rng = np.random.default_rng(19)
    edges = pd.DataFrame({"a": rng.integers(0, 50, 140),
                          "b": rng.integers(0, 50, 140)})
    edges = edges[edges["a"] != edges["b"]].reset_index(drop=True)
    sources = [0, 3, 7, 99]  # 99 has no edges
    multi = multi_bfs_levels(rd.from_pandas(edges).repartition(3),
                             sources, num_partitions=3)
    for s in sources:
        single = bfs_levels(rd.from_pandas(edges).repartition(3), s,
                            num_partitions=3)
        sub = multi[multi["source"] == s]
        assert dict(zip(sub["node"], sub["level"])) == \
            dict(zip(single["node"], single["level"])), s


def test_q_part_harmonic_serial_parity():
    import collections
    import pyarrow.parquet as pq
    from jerex_ray.pipelines.queries import q_part_harmonic
    sf = "/root/testdata/sf0.001"
    out = q_part_harmonic(sf)
    li = pq.read_table(f"{sf}/lineitem.parquet",
                       columns=["l_orderkey", "l_partkey"]).to_pandas()
    inc = li.drop_duplicates()
    adj = collections.defaultdict(set)
    for _, grp in inc.groupby("l_orderkey"):
        ps = sorted(grp["l_partkey"])
        for i, x in enumerate(ps):
            for y in ps[i + 1:]:
                adj[x].add(y)
                adj[y].add(x)
    sources = sorted(inc["l_partkey"].unique())[:8]
    assert list(out["src"]) == [int(s) for s in sources]
    for _, row in out.iterrows():
        seen, frontier, lvl = {row["src"]: 0}, {row["src"]}, 0
        while frontier and lvl < 8:
            lvl += 1
            frontier = {v for u in frontier for v in adj[u]
                        if v not in seen}
            for v in frontier:
                seen[v] = lvl
        h840 = sum(840 // d for d in seen.values() if d > 0)
        assert int(row["n_reached"]) == sum(1 for d in seen.values()
                                            if d > 0)
        assert int(row["h840"]) == h840


def test_q_part_wl_colors_serial_parity():
    import collections
    import hashlib
    import pyarrow.parquet as pq
    from jerex_ray.pipelines.queries import q_part_wl_colors
    sf = "/root/testdata/sf0.001"
    out = q_part_wl_colors(sf, rounds=2)
    li = pq.read_table(f"{sf}/lineitem.parquet",
                       columns=["l_orderkey", "l_partkey"]).to_pandas()
    inc = li.drop_duplicates()
    adj = collections.defaultdict(set)
    for _, grp in inc.groupby("l_orderkey"):
        ps = sorted(grp["l_partkey"])
        for i, x in enumerate(ps):
            for y in ps[i + 1:]:
                adj[x].add(y)
                adj[y].add(x)
    colors = {u: str(len(vs)) for u, vs in adj.items()}
    for _ in range(2):
        colors = {u: hashlib.md5(
            (colors[u] + "|"
             + ",".join(sorted(colors[v] for v in vs))).encode()
        ).hexdigest() for u, vs in adj.items()}
    hist = collections.Counter(colors.values())
    got = dict(zip(out["color"], out["n_nodes"]))
    assert got == {c: n for c, n in hist.items()}
    assert int(out["n_nodes"].sum()) == len(adj)


def test_adamic_adar_matches_bruteforce():
    import collections
    import math
    from jerex_ray.ops.graph import adamic_adar
    rng = np.random.default_rng(31)
    df = pd.DataFrame({"L": rng.integers(0, 12, 300),
                       "R": rng.integers(0, 25, 300)})
    got = adamic_adar(rd.from_pandas(df).repartition(4),
                      left_col="L", right_col="R", top_k=100)
    inc = df.drop_duplicates()
    nbrs = collections.defaultdict(set)
    rdeg = inc.groupby("R").size().to_dict()
    for l, r in inc.itertuples(index=False):
        nbrs[l].add(r)
    exp = {}
    ls = sorted(nbrs)
    for i, a in enumerate(ls):
        for b in ls[i + 1:]:
            sh = nbrs[a] & nbrs[b]
            if sh:
                exp[(a, b)] = (len(sh),
                               round(sum(1.0 / math.log(rdeg[z])
                                         for z in sh), 6))
    assert len(got) == min(100, len(exp))
    for _, row in got.iterrows():
        e = exp[(row["a"], row["b"])]
        assert int(row["shared"]) == e[0]
        assert abs(row["aa"] - e[1]) < 2e-6, (row["a"], row["b"])


def test_q_part_diameter_and_fd_audit_serial():
    import collections
    import pyarrow.parquet as pq
    from jerex_ray.pipelines.queries import q_fd_audit, q_part_diameter
    sf = "/root/testdata/sf0.001"
    out = q_part_diameter(sf)
    li = pq.read_table(f"{sf}/lineitem.parquet",
                       columns=["l_orderkey", "l_partkey"]).to_pandas()
    inc = li.drop_duplicates()
    adj = collections.defaultdict(set)
    for _, grp in inc.groupby("l_orderkey"):
        ps = sorted(grp["l_partkey"])
        for i, x in enumerate(ps):
            for y in ps[i + 1:]:
                adj[x].add(y)
                adj[y].add(x)

    def bfs(s):
        seen, frontier, lvl = {s: 0}, {s}, 0
        while frontier:
            lvl += 1
            frontier = {v for u in frontier for v in adj[u]
                        if v not in seen}
            for v in frontier:
                seen[v] = lvl
        return seen

    seed = int(inc["l_partkey"].min())
    l1 = bfs(seed)
    ecc = max(l1.values())
    far = min(n for n, d in l1.items() if d == ecc)
    l2 = bfs(far)
    row = out.iloc[0]
    assert (int(row["seed"]), int(row["ecc_seed"]),
            int(row["far_node"]), int(row["diameter_lb"]),
            int(row["n_reached"])) == \
        (seed, ecc, far, max(l2.values()), len(l2))

    fd = q_fd_audit(sf)
    cust = pq.read_table(f"{sf}/customer.parquet").to_pandas()
    nd = cust.groupby("c_nationkey")["c_mktsegment"].nunique()
    r = fd[(fd["det"] == "c_nationkey")].iloc[0]
    assert int(r["n_keys"]) == len(nd)
    assert int(r["n_violating"]) == int((nd > 1).sum())
    # key columns are genuine FDs
    assert int(fd[fd["det"] == "o_orderkey"]["holds"].iloc[0]) == 1
    assert int(fd[fd["det"] == "c_custkey"]["holds"].iloc[0]) == 1
    assert int(fd[fd["det"] == "n_nationkey"]["holds"].iloc[0]) == 1


def test_greedy_matching_equals_sequential_greedy():
    from jerex_ray.ops.graph import greedy_matching
    from jerex_ray.util import md5_hash64
    rng = np.random.default_rng(41)
    df = pd.DataFrame({"L": rng.integers(0, 30, 400),
                       "R": rng.integers(0, 40, 400)})
    got = greedy_matching(rd.from_pandas(df).repartition(4),
                          left_col="L", right_col="R")
    inc = df.drop_duplicates().reset_index(drop=True)
    inc["pr"] = [md5_hash64(f"{l}|{r}")
                 for l, r in zip(inc["L"], inc["R"])]
    taken_l, taken_r, seq = set(), set(), []
    for _, row in inc.sort_values(["pr", "L", "R"]).iterrows():
        if row["L"] not in taken_l and row["R"] not in taken_r:
            taken_l.add(row["L"])
            taken_r.add(row["R"])
            seq.append((row["L"], row["R"]))
    assert set(map(tuple, got[["L", "R"]].values)) == set(seq)
    # maximality: every original edge touches a matched node
    ml, mr = set(got["L"]), set(got["R"])
    assert all(l in ml or r in mr
               for l, r in inc[["L", "R"]].itertuples(index=False))


def test_kleinberg_burst_dp_is_optimal_and_backtrack_consistent():
    import itertools
    import math
    from jerex_ray.pipelines.queries import _kleinberg_burst_dp
    k = np.array([1, 0, 2, 9, 11, 10, 1, 0, 1, 8, 9, 0], dtype=np.int64)
    c0s, c1s, states = _kleinberg_burst_dp(k)
    span = len(k)
    r0 = int(k.sum()) / span
    r1 = 2.0 * r0
    gam = math.log(float(span))

    def path_cost(path):
        cost = gam if path[0] == 1 else 0.0
        for t, st in enumerate(path):
            r = r1 if st else r0
            cost += r - float(k[t]) * math.log(r)
            if t and st == 1 and path[t - 1] == 0:
                cost += gam
        return cost

    best = min(path_cost(p)
               for p in itertools.product([0, 1], repeat=span))
    assert abs(min(c0s[-1], c1s[-1]) - best) < 1e-9
    assert abs(path_cost(tuple(states)) - best) < 1e-9
    # the planted high-count stretches are flagged as bursts
    assert states[3] == states[4] == states[5] == 1
    assert states[9] == states[10] == 1
    assert states[1] == 0 and states[7] == 0


def test_dbscan_2d_matches_bruteforce():
    from jerex_ray.ops.dbscan import dbscan_2d
    rng = np.random.default_rng(53)
    # three planted blobs + scattered noise, integer coords
    blobs = [(10, 10), (30, 12), (18, 40)]
    xs, ys = [], []
    for bx, by in blobs:
        xs += list(bx + rng.integers(-2, 3, 12))
        ys += list(by + rng.integers(-2, 3, 12))
    xs += list(rng.integers(0, 60, 10))
    ys += list(rng.integers(0, 60, 10))
    pts = pd.DataFrame({"id": np.arange(len(xs), dtype=np.int64),
                        "x": np.asarray(xs, dtype=np.int64),
                        "y": np.asarray(ys, dtype=np.int64)})
    eps, minp = 3, 4
    got = dbscan_2d(rd.from_pandas(pts).repartition(3),
                    id_col="id", x_col="x", y_col="y",
                    eps=eps, min_pts=minp)

    # serial reference with the same deterministic rules
    n = len(pts)
    X = pts[["x", "y"]].to_numpy(np.int64)
    d2 = ((X[:, None, :] - X[None, :, :]) ** 2).sum(axis=2)
    nbr = (d2 <= eps * eps) & ~np.eye(n, dtype=bool)
    is_core = nbr.sum(axis=1) + 1 >= minp
    # components over core-core adjacency, label = min id
    comp = {}
    for i in np.where(is_core)[0]:
        if i in comp:
            continue
        stack, seen = [i], {int(i)}
        while stack:
            u = stack.pop()
            for v in np.where(nbr[u] & is_core)[0]:
                if int(v) not in seen:
                    seen.add(int(v))
                    stack.append(v)
        lab = min(seen)
        for u in seen:
            comp[u] = lab
    exp = {}
    for i in range(n):
        if is_core[i]:
            exp[i] = ("core", comp[int(i)])
        else:
            cores = [comp[int(j)] for j in np.where(nbr[i])[0]
                     if is_core[j]]
            exp[i] = ("border", min(cores)) if cores else ("noise", -1)
    got_map = {int(r["id"]): (r["role"], int(r["cluster"]))
               for _, r in got.iterrows()}
    assert got_map == exp
    assert sum(1 for r, _ in exp.values() if r == "core") > 20
    assert any(r == "noise" for r, _ in exp.values())


def test_personalized_pagerank_matches_dense_recompute():
    from jerex_ray.ops.graph import pagerank
    edges = pd.DataFrame({"doc_a": [1, 2, 3, 3, 10],
                          "doc_b": [2, 3, 4, 5, 11]})
    got = pagerank(rd.from_pandas(edges), damping=0.85, iters=5,
                   personalize=1)
    nodes = sorted(set(edges["doc_a"]) | set(edges["doc_b"]))
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    A = np.zeros((n, n))
    for a, b in edges.itertuples(index=False):
        A[idx[a], idx[b]] = A[idx[b], idx[a]] = 1.0
    P = A / A.sum(axis=1, keepdims=True)
    r = np.zeros(n)
    r[idx[1]] = 1.0
    tele = np.zeros(n)
    tele[idx[1]] = 0.15
    for _ in range(5):
        r = tele + 0.85 * (P.T @ r)
    exp = dict(zip(nodes, r))
    for _, row in got.iterrows():
        assert abs(row["pr"] - exp[row["node"]]) < 1e-9
    # mass never reaches the disconnected 10-11 component
    assert exp[10] == exp[11] == 0.0


def test_emb_label_prop_invariants():
    import pyarrow.parquet as pq
    from jerex_ray.pipelines.queries import emb_label_prop
    sf = "/root/testdata/sf0.001"
    out = emb_label_prop(sf)
    emb = pq.read_table(f"{sf}/embeddings.parquet",
                        columns=["vec_id", "label"]).to_pandas()
    truth = dict(zip(emb["vec_id"].astype("int64"),
                     emb["label"].astype("int64")))
    got = dict(zip(out["vec_id"], out["label_pred"]))
    # seeds are clamped
    for v, l in truth.items():
        if v % 2 == 0:
            assert got[v] == l
    # full serial recompute of the 2-round vote over the exact kNN
    # graph (the fixture's labels are random w.r.t. the vectors, so
    # parity — not accuracy — is the correctness statement)
    full = pq.read_table(f"{sf}/embeddings.parquet").to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    M = np.stack(full["embedding"].to_numpy()).astype(np.float64)
    ids = full["vec_id"].to_numpy(np.int64)
    S = M @ M.T / (np.linalg.norm(M, axis=1)[:, None]
                   * np.linalg.norm(M, axis=1)[None, :])
    nbrs = {}
    for i, v in enumerate(ids):
        order = sorted(range(len(ids)),
                       key=lambda j: (-S[i, j], ids[j]))
        nbrs[int(v)] = [int(ids[j]) for j in order
                        if ids[j] != v][:5]
    seed = {int(v): int(l) for v, l in zip(ids, full["label"])
            if v % 2 == 0}
    lab = {int(v): seed.get(int(v), -1) for v in ids}
    for _ in range(2):
        new = {}
        for v in lab:
            if v in seed:
                new[v] = seed[v]
                continue
            votes = [lab[u] for u in nbrs[v] if lab[u] != -1]
            if votes:
                cnt = pd.Series(votes).value_counts()
                best = cnt.max()
                new[v] = min(int(l) for l, c in cnt.items()
                             if c == best)
            else:
                new[v] = -1
        lab = new
    assert got == lab


def test_ktruss_matches_serial_peeling():
    from jerex_ray.ops.graph import ktruss
    rng = np.random.default_rng(61)
    df = pd.DataFrame({"a": rng.integers(0, 25, 200),
                       "b": rng.integers(0, 25, 200)})
    df = df[df["a"] != df["b"]]
    got = ktruss(rd.from_pandas(df).repartition(3), k=4)
    # serial reference
    edges = {(min(a, b), max(a, b))
             for a, b in df.itertuples(index=False)}
    while True:
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        sup = {(a, b): len(adj[a] & adj[b]) for a, b in edges}
        drop = [e for e, s in sup.items() if s < 2]
        if not drop:
            break
        edges -= set(drop)
    exp = {e: s for e, s in sup.items() if e in edges}
    got_map = {(int(r["a"]), int(r["b"])): int(r["support"])
               for _, r in got.iterrows()}
    assert got_map == exp
    assert len(exp) > 0  # the random graph actually has a 4-truss


def test_kfold_cv_matches_lstsq():
    import pyarrow.parquet as pq
    from jerex_ray.pipelines.queries import q_events_kfold_cv
    from jerex_ray.util import md5_hash64
    sf = "/root/testdata/sf0.001"
    out = q_events_kfold_cv(sf)
    ev = pq.read_table(f"{sf}/events.parquet",
                       columns=["event_id", "ts", "value"]).to_pandas()
    x = ((ev["ts"] - pd.Timestamp("1995-01-01"))
         / pd.Timedelta(days=1)).to_numpy(np.float64)
    y = ev["value"].to_numpy(np.float64)
    fold = np.array([md5_hash64(str(i)) % 5 for i in ev["event_id"]])
    assert list(out["fold"]) == [0, 1, 2, 3, 4]
    for f in range(5):
        tr, te = fold != f, fold == f
        A = np.stack([x[tr], np.ones(tr.sum())], axis=1)
        coef, *_ = np.linalg.lstsq(A, y[tr], rcond=None)
        row = out[out["fold"] == f].iloc[0]
        assert int(row["n_test"]) == int(te.sum())
        assert abs(row["slope"] - coef[0]) < 1e-5
        assert abs(row["intercept"] - coef[1]) < 1e-3
        pred = coef[0] * x[te] + coef[1]
        assert abs(row["mse"] - ((y[te] - pred) ** 2).mean()) < 1e-3


def test_consistent_hash_ring_properties():
    from jerex_ray.ops.layout import consistent_hash_ring, ring_assign
    from jerex_ray.util import md5_hash64
    servers8 = [f"s{i}" for i in range(8)]
    r8 = consistent_hash_ring(servers8, vnodes=16)
    r9 = consistent_hash_ring(servers8 + ["s8"], vnodes=16)
    keys = np.array([md5_hash64(str(i)) for i in range(5000)],
                    dtype=np.uint64)
    a8 = ring_assign(keys.copy(), *r8)
    a9 = ring_assign(keys.copy(), *r9)
    moved = a8 != a9
    # monotonicity: adding a server only steals keys FOR itself
    assert set(a9[moved]) == {"s8"}
    # movement fraction near the 16/(9*16) = 1/9 ideal
    frac = moved.mean()
    assert 0.04 < frac < 0.22, frac
    # brute-force successor lookup agrees
    pos, owner = r8
    for h in keys[:200]:
        ge = [p for p in pos if p >= h]
        exp = owner[list(pos).index(min(ge))] if ge \
            else owner[int(np.argmin(pos))]
        assert exp == a8[list(keys).index(h)]


def test_betweenness_sampled_matches_serial_brandes():
    import collections
    from jerex_ray.ops.graph import betweenness_sampled
    rng = np.random.default_rng(71)
    raw = pd.DataFrame({"a": rng.integers(0, 30, 90),
                        "b": rng.integers(0, 30, 90)})
    raw = raw[raw["a"] != raw["b"]]
    # the op's contract: distinct undirected edges
    df = pd.DataFrame({"a": np.minimum(raw["a"], raw["b"]),
                       "b": np.maximum(raw["a"], raw["b"])}) \
        .drop_duplicates().reset_index(drop=True)
    sources = [0, 1, 2, 3]
    got = betweenness_sampled(rd.from_pandas(df).repartition(3),
                              sources, max_depth=6)
    adj = collections.defaultdict(set)
    for a, b in df.itertuples(index=False):
        adj[int(a)].add(int(b))
        adj[int(b)].add(int(a))
    bc = collections.defaultdict(float)
    for s in sources:
        # BFS levels (depth-capped like the op)
        lvl = {s: 0}
        frontier, d = {s}, 0
        order = [s]
        while frontier and d < 6:
            d += 1
            frontier = {v for u in frontier for v in adj[u]
                        if v not in lvl}
            for v in sorted(frontier):
                lvl[v] = d
                order.append(v)
        sigma = collections.defaultdict(int)
        sigma[s] = 1
        for v in order[1:]:
            sigma[v] = sum(sigma[u] for u in adj[v]
                           if lvl.get(u) == lvl[v] - 1)
        delta = collections.defaultdict(float)
        for v in reversed(order):
            for u in adj[v]:
                if lvl.get(u) == lvl[v] - 1:
                    delta[u] += sigma[u] / sigma[v] * (1.0 + delta[v])
        for v, dv in delta.items():
            if v != s:
                bc[v] += dv
    for _, row in got.iterrows():
        assert abs(row["bc"] - bc.get(int(row["node"]), 0.0)) < 1e-6
    assert got["bc"].sum() > 0


def test_bellman_ford_matches_dijkstra():
    from jerex_ray.ops.graph import bellman_ford_sssp
    rng = np.random.default_rng(19)
    n = 40
    edges = set()
    while len(edges) < 120:
        a, b = rng.integers(0, n, 2)
        if a != b:
            edges.add((int(min(a, b)), int(max(a, b))))
    edges = sorted(edges)
    w = rng.integers(1, 10, len(edges))
    ds = rd.from_pandas(pd.DataFrame(
        {"a": [a for a, _ in edges], "b": [b for _, b in edges],
         "w": w}))
    src = min(min(e) for e in edges)
    got = bellman_ford_sssp(ds, src, max_rounds=64)

    # serial Dijkstra
    import heapq
    adj = {}
    for (a, b), ww in zip(edges, w):
        adj.setdefault(a, []).append((b, int(ww)))
        adj.setdefault(b, []).append((a, int(ww)))
    dist = {src: 0}
    pq = [(0, src)]
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist.get(u, 1 << 60):
            continue
        for v, ww in adj.get(u, []):
            nd = d + ww
            if nd < dist.get(v, 1 << 60):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    ref = pd.DataFrame(sorted(dist.items()), columns=["node", "dist"])
    pd.testing.assert_frame_equal(
        got[["node", "dist"]].reset_index(drop=True),
        ref.astype({"node": "int64", "dist": "int64"}))


def test_bellman_ford_parallel_edges_and_unreachable():
    from jerex_ray.ops.graph import bellman_ford_sssp
    # parallel edges keep the min weight; node 99 is disconnected
    df = pd.DataFrame({"a": [0, 0, 1, 99], "b": [1, 1, 2, 98],
                       "w": [7, 3, 2, 5]})
    got = bellman_ford_sssp(rd.from_pandas(df), 0)
    assert dict(zip(got["node"], got["dist"])) == {0: 0, 1: 3, 2: 5}


def test_jump_consistent_hash_reference_parity_and_resize_contract():
    import numpy as np

    from jerex_ray.ops.layout import jump_consistent_hash

    # scalar translation of the paper's C loop as the reference
    def ref(key: int, s: int) -> int:
        b, j = -1, 0
        while j < s:
            b = j
            key = (key * 2862933555777941757 + 1) & ((1 << 64) - 1)
            j = int((b + 1) * (2147483648.0 / ((key >> 33) + 1)))
        return b

    rng = np.random.default_rng(11)
    keys = np.concatenate([
        np.arange(200, dtype=np.int64),
        rng.integers(0, 2**62, 300, dtype=np.int64)])
    for s in (1, 2, 7, 32, 33, 100):
        got = jump_consistent_hash(keys, s)
        assert (got == np.array([ref(int(k), s)
                                 for k in keys])).all()
        assert got.min() >= 0 and got.max() < s

    # resize contract: S -> S+1 moves keys ONLY into the new bucket
    big = rng.integers(0, 2**62, 20000, dtype=np.int64)
    a = jump_consistent_hash(big, 32)
    b = jump_consistent_hash(big, 33)
    moved = a != b
    assert (b[moved] == 32).all()
    # expected movement fraction 1/33 ~ 3%; generous 4-sigma band
    frac = moved.mean()
    assert 0.01 < frac < 0.06
    # balance: every shard within 3x of the uniform share
    counts = np.bincount(a, minlength=32)
    assert counts.min() > 0 and counts.max() < 3 * len(big) / 32

    # empty input
    assert len(jump_consistent_hash(np.array([], dtype=np.int64),
                                    32)) == 0


def test_simrank_textbook_parity_symmetry_and_locality():
    import numpy as np
    import pandas as pd

    from jerex_ray.ops.graph import simrank_fixed_point

    # richer crafted graph: two triangles sharing a bridge + a tail
    edges = pd.DataFrame({
        "a": [1, 1, 2, 4, 4, 5, 3, 6, 7],
        "b": [2, 3, 3, 5, 6, 6, 4, 7, 8]})
    scale = 1_000_000
    out = simrank_fixed_point(edges, rounds=3, scale=scale)

    # textbook float SimRank (C=0.8) as the independent reference
    nodes = sorted(set(edges["a"]) | set(edges["b"]))
    pos = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    A = np.zeros((n, n))
    for u, v in zip(edges["a"], edges["b"]):
        A[pos[u], pos[v]] = A[pos[v], pos[u]] = 1
    deg = A.sum(1)
    S = np.eye(n)
    for _ in range(3):
        S = 0.8 * (A @ S @ A) / np.outer(deg, deg)
        np.fill_diagonal(S, 1.0)
    got = {(r.node_a, r.node_b): r.simrank_fp / scale
           for r in out.itertuples()}
    for i in range(n):
        for j in range(i + 1, n):
            ref = S[i, j]
            fp = got.get((nodes[i], nodes[j]), 0.0)
            # floor quantization loses < rounds/scale per entry,
            # amplified by at most C sums each round
            assert fp <= ref + 1e-12
            assert ref - fp < 2e-5, (nodes[i], nodes[j], ref, fp)
    # pairs at odd distance with no even-length meeting walk stay 0
    assert (1, 4) not in got or got[(1, 4)] > 0  # bridge-linked
    # range and output contract
    assert (out["simrank_fp"] > 0).all()
    assert (out["simrank_fp"] <= scale).all()
    assert (out["node_a"] < out["node_b"]).all()

    # empty graph
    assert len(simrank_fixed_point(
        pd.DataFrame({"a": [], "b": []}))) == 0


def test_cuckoo_place_invariants_chains_and_failure():
    import numpy as np

    from jerex_ray.ops.layout import cuckoo_place
    from jerex_ray.util import md5_hash64

    rng = np.random.default_rng(9)
    ids = rng.choice(100000, 300, replace=False).astype(np.int64)
    out = cuckoo_place(ids, b=256)
    placed = out[out["tbl"] >= 0]
    # every item placed (load 300/512 < 0.59 — cuckoo holds here)
    assert len(placed) == len(out)
    # no slot collision
    key = placed["tbl"] * 256 + placed["slot"]
    assert key.is_unique
    # every item sits at one of ITS two hash slots
    for r in placed.itertuples():
        h1 = md5_hash64(f"c1|{r.user_id}") % 256
        h2 = md5_hash64(f"c2|{r.user_id}") % 256
        assert (r.tbl, r.slot) in ((0, h1), (1, h2))
    # kicks happened at this load but stayed bounded
    assert out["chain_kicks"].max() >= 1
    assert out["chain_kicks"].max() <= 32

    # forced failure: b=1 gives 2 total slots; a third id must stash
    tiny = cuckoo_place(np.array([1, 2, 3], dtype=np.int64), b=1)
    assert (tiny["tbl"] == -1).sum() >= 1
    assert (tiny["chain_kicks"] == -1).sum() >= 1

    # insertion-order canonicalization: shuffled input, same output
    out2 = cuckoo_place(ids[rng.permutation(300)], b=256)
    assert out.reset_index(drop=True).equals(
        out2.reset_index(drop=True))
