"""Sketch (Misra–Gries heavy hitters) and embedding-analytics ops."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from jerex_ray.ops.embed import kmeans, label_centroids
from jerex_ray.ops.sketch import heavy_hitters, misra_gries

RNG = np.random.default_rng(11)


def _zipf_corpus(n_docs=200, planted=("alpha", 10), vocab=40):
    """Synthetic docs from a skewed vocabulary + one planted rare-ish
    word (~``planted[1]`` occurrences total — below any heavy
    threshold coarser than total/planted[1])."""
    words = [f"w{i}" for i in range(vocab)]
    p = 1.0 / np.arange(1, vocab + 1)
    p /= p.sum()
    docs = []
    step = max(1, n_docs // planted[1])
    for i in range(n_docs):
        ws = list(RNG.choice(words, size=30, p=p))
        if i % step == 0:
            ws.append(planted[0])
        docs.append(" ".join(ws))
    return pd.DataFrame({"doc_id": np.arange(n_docs, dtype="int64"),
                         "text": docs})


def _exact_heavy(df: pd.DataFrame, k: int) -> pd.DataFrame:
    flat = np.concatenate(df["text"].str.lower().str.split().to_numpy())
    vc = pd.Series(flat).value_counts()
    hot = vc[vc * k > len(flat)]
    return (pd.DataFrame({"term": hot.index, "n_occurrences": hot.values})
            .sort_values(["n_occurrences", "term"],
                         ascending=[False, True]).reset_index(drop=True))


def test_misra_gries_capacity_and_guarantee():
    words = np.array(["a"] * 50 + ["b"] * 30 + [f"x{i}" for i in range(100)])
    RNG.shuffle(words)
    out = misra_gries(words, capacity=8)
    assert len(out) <= 8
    # any word with count > n/(capacity+1) = 20 must survive
    assert {"a", "b"} <= set(out["term"])


def test_heavy_hitters_matches_exact_counts():
    df = _zipf_corpus()
    got = heavy_hitters(rd.from_pandas(df), k=25, capacity=64)
    want = _exact_heavy(df, k=25)
    pd.testing.assert_frame_equal(got, want)
    assert "alpha" not in set(got["term"])  # planted word is sub-threshold
    low_k = heavy_hitters(rd.from_pandas(df), k=1000, capacity=1024)
    assert "alpha" in set(low_k["term"])


def test_heavy_hitters_batch_boundary_independence():
    df = _zipf_corpus(n_docs=97)
    a = heavy_hitters(rd.from_pandas(df), k=25, capacity=64)
    b = heavy_hitters(rd.from_pandas(df).repartition(7), k=25, capacity=64)
    pd.testing.assert_frame_equal(a, b)


def test_heavy_hitters_capacity_guard_and_empty():
    with pytest.raises(ValueError):
        heavy_hitters(rd.from_pandas(_zipf_corpus(5)), k=40, capacity=8)
    empty = heavy_hitters(
        rd.from_pandas(pd.DataFrame({"doc_id": [1], "text": [""]})), k=10)
    assert len(empty) == 0


def test_label_centroids_match_numpy_groupby_mean():
    n, d = 120, 8
    vecs = RNG.normal(size=(n, d)).astype(np.float32)
    labels = RNG.integers(0, 4, size=n).astype(np.int32)
    df = pd.DataFrame({"label": labels, "embedding": list(vecs)})
    got = label_centroids(rd.from_pandas(df).repartition(5))
    for lab in np.unique(labels):
        want = vecs[labels == lab].astype(np.float64).mean(axis=0)
        sub = got[got["label"] == lab].sort_values("dim")
        np.testing.assert_allclose(sub["centroid"].to_numpy(), want,
                                   atol=5e-7)


def test_kmeans_monotone_inertia_and_blob_recovery():
    # two well-separated blobs -> k=2 must split them exactly
    a = RNG.normal(loc=0.0, scale=0.05, size=(40, 4))
    b = RNG.normal(loc=5.0, scale=0.05, size=(40, 4))
    vecs = np.vstack([a, b]).astype(np.float32)
    ids = np.arange(80, dtype="int64")
    df = pd.DataFrame({"vec_id": ids, "embedding": list(vecs)})
    assign, hist = kmeans(rd.from_pandas(df).repartition(4), k=2, iters=6)
    assert all(later <= earlier + 1e-9
               for earlier, later in zip(hist, hist[1:]))
    out = assign.to_pandas().sort_values("vec_id")
    first, second = (out["cluster"].to_numpy()[:40],
                     out["cluster"].to_numpy()[40:])
    assert len(set(first)) == 1 and len(set(second)) == 1
    assert first[0] != second[0]


def test_kmeans_deterministic_across_partitionings():
    vecs = RNG.normal(size=(60, 6)).astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(60, dtype="int64"),
                       "embedding": list(vecs)})
    a, ha = kmeans(rd.from_pandas(df), k=4, iters=4)
    b, hb = kmeans(rd.from_pandas(df).repartition(6), k=4, iters=4)
    pd.testing.assert_frame_equal(
        a.to_pandas().sort_values("vec_id").reset_index(drop=True),
        b.to_pandas().sort_values("vec_id").reset_index(drop=True))
    np.testing.assert_allclose(ha, hb, rtol=1e-12)


def test_tfidf_top_terms_matches_brute_force():
    import math

    from jerex_ray.ops.textstats import tfidf_top_terms

    df = _zipf_corpus(n_docs=40)
    got = tfidf_top_terms(rd.from_pandas(df).repartition(3), top=3) \
        .to_pandas().sort_values(["doc_id", "rank"]).reset_index(drop=True)

    split = df["text"].str.lower().str.split()
    n_docs = len(df)
    dfreq = pd.Series(np.concatenate(
        [list(set(w)) for w in split])).value_counts()
    rows = []
    for did, ws in zip(df["doc_id"], split):
        vc = pd.Series(ws).value_counts()
        scored = sorted(
            ((-(vc[t] / len(ws)) * (math.log((1 + n_docs) / (1 + dfreq[t]))
                                    + 1.0), t) for t in vc.index))
        for r, (_, t) in enumerate(scored[:3], start=1):
            rows.append((did, t, int(vc[t]), int(dfreq[t]), r))
    want = pd.DataFrame(rows, columns=["doc_id", "term", "tf_count",
                                       "doc_freq", "rank"]) \
        .astype({"doc_id": "int64", "tf_count": "int64",
                 "doc_freq": "int64", "rank": "int64"})
    pd.testing.assert_frame_equal(got, want)


def test_bm25_matches_brute_force():
    import math

    from jerex_ray.ops.bm25 import bm25_scores, bm25_topk

    df = _zipf_corpus(n_docs=60)
    queries = ["w0 w5 alpha", "w12"]
    got = bm25_scores(rd.from_pandas(df).repartition(4), queries) \
        .to_pandas().sort_values(["query_idx", "doc_id"]) \
        .reset_index(drop=True)

    split = df["text"].str.lower().str.split()
    n = len(df)
    lens = split.str.len()
    avgdl = lens.sum() / n
    dfreq = pd.Series(np.concatenate(
        [list(set(w)) for w in split])).value_counts()
    k1, b = 1.2, 0.75
    rows = []
    for qi, q in enumerate(queries):
        terms = sorted(set(q.split()))
        for did, ws in zip(df["doc_id"], split):
            s = 0.0
            for t in terms:
                tf = ws.count(t)
                if tf == 0:
                    continue
                idf = math.log(1 + (n - dfreq.get(t, 0) + 0.5)
                               / (dfreq.get(t, 0) + 0.5))
                s += idf * (tf * (k1 + 1)) / (
                    tf + k1 * (1 - b + b * (len(ws) / avgdl)))
            if s > 0:
                rows.append((qi, did, s))
    want = pd.DataFrame(rows, columns=["query_idx", "doc_id", "score"]) \
        .astype({"query_idx": "int64", "doc_id": "int64"})
    pd.testing.assert_frame_equal(got, want, rtol=1e-12)

    top = bm25_topk(rd.from_pandas(df), queries, k=5)
    assert (top.groupby("query_idx").size() <= 5).all()
    w0 = want[want["query_idx"] == 0].sort_values(
        ["score", "doc_id"], ascending=[False, True]).head(5)
    assert list(top[top["query_idx"] == 0]["doc_id"]) == list(w0["doc_id"])


def test_inverted_index_bm25_matches_direct(tmp_path):
    from jerex_ray.ops.bm25 import bm25_scores
    from jerex_ray.ops.invindex import bm25_from_index, build_inverted_index

    df = _zipf_corpus(n_docs=80)
    queries = ["w0 w3 alpha", "w7"]
    direct = bm25_scores(rd.from_pandas(df).repartition(3), queries) \
        .to_pandas().sort_values(["query_idx", "doc_id"]) \
        .reset_index(drop=True)
    stats = build_inverted_index(rd.from_pandas(df).repartition(3),
                                 str(tmp_path / "idx"), num_buckets=8)
    assert stats["n_docs"] == 80
    got = bm25_from_index(str(tmp_path / "idx"), queries) \
        .sort_values(["query_idx", "doc_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, direct, rtol=1e-12)
    # pruned read: only the query-term buckets exist on disk AND only
    # a subset is touched — every bucket dir written must be ≤ 8
    import os
    assert len([d for d in os.listdir(tmp_path / "idx")
                if d.startswith("bucket=")]) <= 8


def test_pca_invariants_match_inmemory():
    import ray.data as rd

    from jerex_ray.ops.embed import dim_stats, pca_fit, pca_project
    rng = np.random.default_rng(5)
    # anisotropic data: variance concentrated along a planted direction
    d, n = 16, 400
    base = rng.standard_normal((n, d))
    planted = rng.standard_normal(d)
    planted /= np.linalg.norm(planted)
    mat = base + 4.0 * np.outer(rng.standard_normal(n), planted)
    df = pd.DataFrame({"vec_id": np.arange(n),
                       "embedding": [v.astype(np.float32) for v in mat]})
    ds = rd.from_pandas(df)

    mean, comps, ev = pca_fit(ds, k=4)
    # orthonormal rows, descending explained variance
    np.testing.assert_allclose(comps @ comps.T, np.eye(4), atol=1e-9)
    assert np.all(np.diff(ev) <= 1e-9)
    # top component aligns with the planted direction
    assert abs(comps[0] @ planted) > 0.99
    # matches in-memory PCA on the same float32-rounded data
    m64 = np.asarray([np.asarray(v, np.float64) for v in df["embedding"]])
    cov = np.cov(m64, rowvar=False)
    w, v = np.linalg.eigh(cov)
    ref = v[:, np.argsort(w)[::-1][:4]].T
    for i in range(4):
        assert min(np.linalg.norm(comps[i] - ref[i]),
                   np.linalg.norm(comps[i] + ref[i])) < 1e-6
    # projection is centered: column means of projections ~ 0
    proj = pca_project(ds, mean, comps).to_pandas()
    pm = np.stack([np.asarray(p) for p in proj["proj"]])
    np.testing.assert_allclose(pm.mean(axis=0), 0, atol=1e-5)
    # dim_stats agrees with numpy moments
    st = dim_stats(ds)
    np.testing.assert_allclose(st["mean"], np.round(m64.mean(axis=0), 6),
                               atol=1e-9)
    np.testing.assert_allclose(st["var"],
                               np.round(m64.var(axis=0, ddof=1), 6),
                               atol=1e-9)


def test_semdedup_prunes_planted_duplicates():
    import ray.data as rd

    from jerex_ray.ops.embed import semdedup
    rng = np.random.default_rng(6)
    centers = rng.standard_normal((4, 16)) * 4
    base = np.concatenate([
        centers[i] + 2.0 * rng.standard_normal((30, 16))
        for i in range(4)]).astype(np.float32)
    # planted semantic dups: near-copies of vectors 5 and 40
    dups = np.stack([base[5] + 1e-4, base[40] + 1e-4]).astype(np.float32)
    vecs = np.concatenate([base, dups])
    ds = rd.from_pandas(pd.DataFrame({
        "vec_id": np.arange(len(vecs), dtype=np.int64),
        "embedding": list(vecs)}))
    out = semdedup(ds, k=4, threshold=0.99).to_pandas()
    kept = set(out["vec_id"])
    # the planted copies (ids 120, 121) lose to their smaller-id twins
    assert 120 not in kept and 121 not in kept
    # most of the corpus stays
    assert len(kept) >= 100
    # exact parity with a brute-force within-cluster prune over the
    # assignment semdedup itself used (out carries the cluster column;
    # dropped rows rejoin their cluster via their surviving twin's)
    nv = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    # recover each id's cluster: survivors carry it; losers must share
    # their cluster with SOME survivor >= 0.99 similar — check instead
    # that every kept set is exactly the brute-force prune per cluster
    for cl, sub in out.groupby("cluster"):
        ids = np.sort(sub["vec_id"].to_numpy())
        sims = nv[ids] @ nv[ids].T
        assert not np.triu(sims >= 0.99, k=1).any(), \
            f"cluster {cl} kept a >=0.99 pair"
    # no false drops: every dropped id has a smaller-id >=0.99 neighbor
    dropped = sorted(set(range(len(vecs))) - kept)
    for d in dropped:
        assert (nv[:d] @ nv[d] >= 0.99).any(), d


def test_procrustes_recovers_planted_rotation():
    from jerex_ray.pipelines.queries import (_householder_rotation,
                                             emb_procrustes)
    out = emb_procrustes("/root/testdata/sf0.001")
    d = int(out["i"].max()) + 1
    r = out["r"].to_numpy().reshape(d, d)
    h = _householder_rotation(d)
    # noise is 1e-3 → recovered rotation within a loose noise bound
    assert np.abs(r - h).max() < 1e-2
    # orthogonality of the recovered matrix (r is rounded to 6dp)
    assert np.abs(r @ r.T - np.eye(d)).max() < 1e-4
    assert out.attrs["residual_sq"] >= -1e-6


def test_procrustes_exact_on_noiseless_rotation():
    import ray.data as rd
    from jerex_ray.ops.embed import procrustes_align
    from jerex_ray.pipelines.queries import _householder_rotation
    rng = np.random.default_rng(3)
    x = rng.normal(size=(200, 16))
    h = _householder_rotation(16)
    ds = rd.from_pandas(pd.DataFrame({"x": list(x), "y": list(x @ h)}))
    r, residual, n = procrustes_align(ds)
    assert n == 200
    assert np.abs(r - h).max() < 1e-9
    assert abs(residual) < 1e-6


def test_mrr_matches_serial_ranking():
    from jerex_ray.pipelines.queries import emb_mrr
    sf = "/root/testdata/sf0.001"
    out = emb_mrr(sf).set_index("label")
    import pyarrow.parquet as pq
    df = pq.read_table(f"{sf}/embeddings.parquet").to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    x = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    sims = x @ x.T
    labels = df["label"].to_numpy()
    ids = df["vec_id"].to_numpy()
    rrs = {}
    for i in range(len(df)):
        order = np.lexsort((ids, -sims[i]))
        order = order[ids[order] != ids[i]][:10]
        match = np.flatnonzero(labels[order] == labels[i])
        rr = 1.0 / (match[0] + 1) if match.size else 0.0
        rrs.setdefault(labels[i], []).append(rr)
    for lab, vals in rrs.items():
        assert out.loc[lab, "n_queries"] == len(vals)
        assert abs(out.loc[lab, "mrr"]
                   - round(sum(vals) / len(vals), 6)) < 2e-6
    assert (out["mrr"] > 0).any()


def test_ndcg_matches_serial_ranking():
    import math
    from jerex_ray.pipelines.queries import emb_ndcg
    sf = "/root/testdata/sf0.001"
    out = emb_ndcg(sf).set_index("label")
    import pyarrow.parquet as pq
    df = pq.read_table(f"{sf}/embeddings.parquet").to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    x = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    sims = x @ x.T
    labels = df["label"].astype(int).to_numpy()
    ids = df["vec_id"].to_numpy()
    sizes = pd.Series(labels).value_counts().to_dict()
    vals = {}
    for i in range(len(df)):
        order = np.lexsort((ids, -sims[i]))
        order = order[ids[order] != ids[i]][:10]
        dcg = sum(1.0 / math.log2(r + 2)
                  for r, j in enumerate(order)
                  if labels[j] == labels[i])
        rmax = min(10, sizes[labels[i]] - 1)
        idcg = sum(1.0 / math.log2(r + 1) for r in range(1, rmax + 1))
        vals.setdefault(labels[i], []).append(dcg / idcg)
    for lab, vs in vals.items():
        assert out.loc[lab, "n_queries"] == len(vs)
        assert abs(out.loc[lab, "ndcg"] - sum(vs) / len(vs)) < 2e-6
    assert ((out["ndcg"] >= 0) & (out["ndcg"] <= 1 + 1e-9)).all()


def test_ivf_recall_curve_monotone_and_high_at_full_probe():
    from jerex_ray.pipelines.queries import emb_ivf_recall
    out = emb_ivf_recall("/root/testdata/sf0.001")
    assert list(out["n_probe"]) == [1, 2, 4, 16]
    r = out["recall_at_10"].to_numpy()
    # probing more cells can only help (same index, same queries)
    assert (np.diff(r) >= -1e-9).all()
    # probing every cell degenerates to brute force -> exact recall
    assert r[-1] >= 1.0 - 1e-9
    assert (out["n_queries"] > 0).all()


def test_principal_direction_serial_parity_and_rayleigh():
    import pyarrow.parquet as pq
    from jerex_ray.pipelines.queries import emb_principal_direction
    SF = "/root/testdata/sf0.001"
    out = emb_principal_direction(SF)
    emb = pq.read_table(f"{SF}/embeddings.parquet",
                        columns=["embedding"]).to_pandas()
    X = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    Q = np.copysign(np.floor(np.abs(X) * 1000.0 + 0.5), X) \
        .astype(object)
    G = Q.T @ Q  # exact big-int Gram
    d = G.shape[0]
    Gf = np.array([[float(G[j][k]) for k in range(d)]
                   for j in range(d)])

    def rayleigh(v):
        v = np.asarray(v, dtype=np.float64)
        return float(v @ Gf @ v / (v @ v))

    w = [10_000] * d
    r_prev = rayleigh(w)
    for _ in range(16):
        y = [sum(int(G[j][k]) * w[k] for k in range(d))
             for j in range(d)]
        m = max(abs(v) for v in y)
        w = [(abs(v) * 10_000) // m * (1 if v >= 0 else -1)
             for v in y]
    assert out["score"].astype(int).tolist() == w
    assert out["dim_idx"].tolist() == list(range(1, d + 1))
    s_ = out["score"].to_numpy(np.float64)
    assert int(np.abs(s_).max()) == 10_000
    # power iteration on a PSD matrix drives the Rayleigh quotient
    # toward lambda_max: after 16 rounds it must reach >= 0.9 of it
    # and strictly beat the all-ones start
    lam_max = float(np.linalg.eigvalsh(Gf)[-1])
    r_final = rayleigh(w)
    assert r_final > r_prev
    assert r_final >= 0.9 * lam_max, (r_final, lam_max)


def test_cka_matches_float_reference_and_self_similarity():
    import pyarrow.parquet as pq
    from jerex_ray.pipelines.queries import emb_cka
    SF = "/root/testdata/sf0.001"
    out = emb_cka(SF).iloc[0]
    emb = pq.read_table(f"{SF}/embeddings.parquet",
                        columns=["embedding"]).to_pandas()
    M = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    Q = np.copysign(np.floor(np.abs(M) * 1000.0 + 0.5), M)
    d = Q.shape[1]
    X, Y = Q[:, :d // 2], Q[:, d // 2:]

    def cka(a, b):
        ac = a - a.mean(axis=0)
        bc = b - b.mean(axis=0)
        num = np.linalg.norm(ac.T @ bc, "fro") ** 2
        return num / (np.linalg.norm(ac.T @ ac, "fro")
                      * np.linalg.norm(bc.T @ bc, "fro"))

    ref = cka(X, Y)
    assert abs(float(out["cka"]) - ref) < 1e-6
    assert 0.0 <= float(out["cka"]) <= 1.0
    # self-similarity sanity of the reference implementation the
    # engine is checked against: CKA(X, X) = 1 exactly
    assert abs(cka(X, X) - 1.0) < 1e-12
    # the exact-integer Frobenius blocks reproduce the ratio
    import math
    a, b, c = (float(out["a_frob"]), float(out["b_frob"]),
               float(out["c_frob"]))
    assert abs(a / math.sqrt(b * c) - ref) < 1e-9


def test_closest_pair_brute_force_and_planted_pair():
    import ray.data as rd
    from jerex_ray.ops.embed import closest_pair_sq

    # brute force parity on random cloud
    pts = RNG.normal(size=(80, 8)).astype(np.float32)
    ds = rd.from_pandas(pd.DataFrame({
        "vec_id": np.arange(80, dtype=np.int64),
        "embedding": list(pts)}))
    out = closest_pair_sq(ds)
    q = np.copysign(np.floor(np.abs(pts.astype(np.float64))
                             * 1000.0 + 0.5), pts).astype(np.int64)
    best = None
    for i in range(80):
        for j in range(i + 1, 80):
            d = int(((q[i] - q[j]) ** 2).sum())
            cand = (d, i, j)
            best = cand if best is None or cand < best else best
    assert (int(out["dist_sq"].iloc[0]), int(out["vec_a"].iloc[0]),
            int(out["vec_b"].iloc[0])) == best

    # planted near-identical pair must win
    pts2 = RNG.normal(size=(60, 8)).astype(np.float32) * 10
    pts2[41] = pts2[7] + 1e-4
    ds2 = rd.from_pandas(pd.DataFrame({
        "vec_id": np.arange(60, dtype=np.int64),
        "embedding": list(pts2)}))
    out2 = closest_pair_sq(ds2)
    assert (int(out2["vec_a"].iloc[0]),
            int(out2["vec_b"].iloc[0])) == (7, 41)

    # degenerate inputs: <2 rows → empty result
    ds1 = rd.from_pandas(pd.DataFrame({
        "vec_id": np.array([0], dtype=np.int64),
        "embedding": [pts[0]]}))
    assert len(closest_pair_sq(ds1)) == 0


def test_jl_distortion_serial_parity_and_concentration():
    import hashlib
    import pyarrow.parquet as pq
    from jerex_ray.pipelines.queries import emb_jl_distortion
    SF = "/root/testdata/sf0.001"
    K = 8
    out = emb_jl_distortion(SF, k=K)
    emb = pq.read_table(f"{SF}/embeddings.parquet",
                        columns=["vec_id", "embedding"]).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    M = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    Q = np.copysign(np.floor(np.abs(M) * 1000.0 + 0.5), M) \
        .astype(np.int64)
    d = Q.shape[1]
    signs = np.array([[1 if int.from_bytes(hashlib.md5(
        f"jl|{i}|{j}".encode()).digest()[:8], "big") % 2 == 0
        else -1 for j in range(K)] for i in range(d)],
        dtype=np.int64)
    ids = emb["vec_id"].to_numpy(np.int64)
    idx = {int(v): i for i, v in enumerate(ids)}
    for r in out.itertuples():
        a, b = idx[int(r.vec_a)], idx[int(r.vec_b)]
        diff = Q[a] - Q[b]
        d2o = int((diff * diff).sum())
        z = diff @ signs
        d2p = int((z * z).sum())
        assert int(r.d2_orig) == d2o and int(r.d2_proj) == d2p
        assert abs(float(r.jl_ratio) - d2p / (K * d2o)) < 1e-6
    # JL concentration: the mean ratio over pairs is near 1 and no
    # ratio is wildly off (k=8 gives heavy but bounded tails)
    ratios = out["jl_ratio"].to_numpy(np.float64)
    assert 0.7 < ratios.mean() < 1.3
    assert (ratios > 0.02).all() and (ratios < 6.0).all()
    # pairing covers consecutive ids only
    assert ((out["vec_b"] - out["vec_a"]) == 1).all()


def test_lof_brute_force_parity_outlier_and_duplicates():
    from fractions import Fraction

    import ray.data as rd

    from jerex_ray.ops.embed import lof_scores

    # random cloud + one planted far outlier
    pts = RNG.normal(size=(50, 8)).astype(np.float32)
    pts[37] = 25.0  # isolated corner point
    ds = rd.from_pandas(pd.DataFrame({
        "vec_id": np.arange(50, dtype=np.int64),
        "embedding": list(pts)}))
    out = lof_scores(ds, k=3).set_index("vec_id")

    # independent exact-rational LOF (textbook lrd formulation)
    q = np.copysign(np.floor(np.abs(pts.astype(np.float64))
                             * 1000.0 + 0.5), pts).astype(np.int64)
    n = len(q)
    d2 = ((q[:, None, :] - q[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.iinfo(np.int64).max)
    nbr = {i: sorted(range(n), key=lambda j: (d2[i, j], j))[:3]
           for i in range(n)}
    kdist = {i: int(d2[i, nbr[i][2]]) for i in range(n)}
    lrd = {i: Fraction(3, sum(max(kdist[o], int(d2[i, o]))
                              for o in nbr[i])) for i in range(n)}
    for i in range(n):
        terms = [lrd[o] / lrd[i] for o in nbr[i]]
        # same fixed neighbor-rank order as the engine
        lof_ref = (float(terms[0]) + float(terms[1])
                   + float(terms[2])) / 3.0
        # engine output is round-6; reference is unrounded
        assert abs(float(out.loc[i, "lof"]) - lof_ref) < 6e-7
        assert list(out.loc[i, ["n1", "n2", "n3"]]) == nbr[i]
        assert int(out.loc[i, "kdist_sq"]) == kdist[i]
    # the planted outlier dominates and reads as anomalous
    assert out["lof"].idxmax() == 37
    assert float(out.loc[37, "lof"]) > 2.0
    # the bulk of the cloud sits near density 1
    assert float(out.drop(37)["lof"].median()) < 1.3

    # duplicate cluster (>= k+1 coincident points): convention LOF=1
    dup = np.zeros((6, 4), dtype=np.float32)
    dup[4] = [5, 5, 5, 5]
    dup[5] = [5, 5, 5, 6]
    ds2 = rd.from_pandas(pd.DataFrame({
        "vec_id": np.arange(6, dtype=np.int64),
        "embedding": list(dup)}))
    out2 = lof_scores(ds2, k=3).set_index("vec_id")
    for i in range(4):          # coincident points: rsum = 0
        assert int(out2.loc[i, "rsum"]) == 0
        assert float(out2.loc[i, "lof"]) == 1.0
    # points whose neighbors are all duplicates also take 1.0
    assert float(out2.loc[4, "lof"]) == 1.0

    # <= k rows → empty
    assert len(lof_scores(rd.from_pandas(pd.DataFrame({
        "vec_id": np.arange(3, dtype=np.int64),
        "embedding": list(pts[:3])})), k=3)) == 0


def test_kmedoids_membership_optimality_and_robust_fixture():
    import ray.data as rd

    from jerex_ray.ops.embed import kmedoids_voronoi

    # crafted: two tight blobs + one extreme outlier; k=2 medoids
    # must be blob MEMBERS (robustness — a mean would be dragged)
    pts = np.zeros((21, 4), dtype=np.float32)
    pts[0:10] = RNG.normal(0, 0.05, (10, 4)) + [0, 0, 0, 0]
    pts[10:20] = RNG.normal(0, 0.05, (10, 4)) + [5, 5, 5, 5]
    pts[20] = [500, 500, 500, 500]
    ds = rd.from_pandas(pd.DataFrame({
        "vec_id": np.arange(21, dtype=np.int64),
        "embedding": list(pts)}))
    out = kmedoids_voronoi(ds, k=3, iters=4).set_index("vec_id")
    meds = set(out["medoid"])
    # medoids are data points (robustness: a mean would sit between)
    assert meds <= set(range(21))
    # each blob resolves to a single medoid INSIDE that blob; the
    # outlier is its own singleton cluster
    blob0 = out.loc[0:9, "medoid"]
    blob1 = out.loc[10:19, "medoid"]
    assert blob0.nunique() == 1 and int(blob0.iloc[0]) in range(0, 10)
    assert blob1.nunique() == 1 and int(blob1.iloc[0]) in range(10, 20)
    assert int(out.loc[20, "medoid"]) == 20
    assert int(out.loc[20, "d2"]) == 0

    # real data: assignment optimality + medoid membership
    from jerex_ray.runtime import read_parquet_sized
    eds = read_parquet_sized(
        "/root/testdata/sf0.001/embeddings.parquet",
        columns=["vec_id", "embedding"])
    full = eds.to_pandas().sort_values("vec_id")
    ids = full["vec_id"].to_numpy(np.int64)
    m = np.stack(full["embedding"].to_numpy()).astype(np.float64)
    q = np.copysign(np.floor(np.abs(m) * 1000.0 + 0.5), m) \
        .astype(np.int64)
    res = kmedoids_voronoi(eds, k=4, iters=4)
    meds = np.sort(res["medoid"].unique())
    assert set(meds) <= set(ids.tolist())
    pos = {int(u): i for i, u in enumerate(ids)}
    mp = np.array([pos[int(u)] for u in meds])
    sq = (q * q).sum(1)
    dall = sq[:, None] + sq[mp][None, :] - 2 * (q @ q[mp].T)
    # every point sits with its closest medoid (smallest-id ties)
    best = np.argmin(dall, axis=1)
    got = res.sort_values("vec_id")["medoid"].to_numpy()
    assert (got == meds[best]).all()
    assert (res.sort_values("vec_id")["d2"].to_numpy()
            == dall[np.arange(len(ids)), best]).all()

    # Voronoi iteration cost is non-increasing round over round
    costs = []
    for it in range(1, 5):
        r = kmedoids_voronoi(eds, k=4, iters=it)
        costs.append(int(r["d2"].sum()))
    assert all(b <= a for a, b in zip(costs, costs[1:])), costs

    # < k rows → empty
    tiny = rd.from_pandas(pd.DataFrame({
        "vec_id": np.arange(2, dtype=np.int64),
        "embedding": list(pts[:2])}))
    assert len(kmedoids_voronoi(tiny, k=4)) == 0
