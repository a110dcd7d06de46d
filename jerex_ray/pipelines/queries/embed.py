"""Split of the query registry: ``embed`` part (mechanically derived from the original queries.py by scripts/split_queries.py; unit order and source text preserved)."""

from __future__ import annotations
import re
import numpy as np
import pandas as pd
from jerex_ray.config import PipelineConfig
from jerex_ray.runtime import configure_data_context
from jerex_ray.pipelines.queries._shared import ORACLE_REGISTRY
from jerex_ray.pipelines.queries._shared import _query_vectors, _round_half_away  # noqa: E501

def emb_label_centroids(sf_dir: str):
    """Mean embedding per label as flat (label, dim, centroid) rows —
    partial sums reduce per batch, vectors never ride a shuffle;
    rounded to 6 decimals on both sides (summation order)."""
    from jerex_ray.ops.embed import label_centroids
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["label", "embedding"])
    return label_centroids(ds)

def emb_kmeans(sf_dir: str):
    """Distributed Lloyd's k-means (deterministic smallest-id init,
    per-iteration broadcast + partial-sum reduce). Iterative model
    fitting — not SQL-expressible; rows-only for the driver, with the
    monotone-inertia Lloyd invariant pytest-gated
    (tests/test_embed.py)."""
    from jerex_ray.ops.embed import kmeans
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    assign, history = kmeans(ds, k=8, iters=5)
    out = assign.to_pandas().sort_values("vec_id").reset_index(drop=True)
    assert all(b <= a + 1e-9 for a, b in zip(history, history[1:])), \
        "Lloyd inertia must be non-increasing"
    return out

def emb_dim_stats(sf_dir: str):
    """Per-dimension mean/variance of the embedding table from ONE
    streaming moments pass (``ops/embed.dim_stats`` — each batch
    reduces to (n, Σx, XᵀX)); oracled against DuckDB avg/var_samp
    over lateral-unnested vector elements, 6-decimal rounding."""
    from jerex_ray.ops.embed import dim_stats
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["embedding"])
    return dim_stats(ds)

def emb_pca(sf_dir: str):
    """Distributed PCA: covariance from the same one-pass moments,
    d×d eigendecomposition on the driver (d = embedding width),
    deterministic sign convention, then a streaming projection pass.
    Rows-only (eigendecomposition is not SQL-expressible); the
    orthonormality/variance-ordering/centering invariants are
    pytest-gated (test_sketch_embed.py)."""
    from jerex_ray.ops.embed import pca_fit, pca_project
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    mean, comps, _ = pca_fit(ds, k=8)
    proj = pca_project(ds, mean, comps).to_pandas()
    out = pd.DataFrame({
        "vec_id": np.repeat(proj["vec_id"].to_numpy(np.int64),
                            comps.shape[0]),
        "component": np.tile(np.arange(comps.shape[0], dtype=np.int64),
                             len(proj)),
        "value": np.concatenate([np.asarray(p) for p in proj["proj"]]),
    })
    return out.sort_values(["vec_id", "component"]).reset_index(drop=True)

def emb_knn_predict(sf_dir: str):
    """kNN label prediction: exact cosine top-5 neighbors per query
    vector (excluding the query row itself), majority label with
    smallest-label tie-break — the distributed exact-kNN classifier
    (brute-force partial top-k per block + label vote on the
    k-bounded result). Oracled by a row_number + count window SQL."""
    from jerex_ray.ops.ann import brute_force_topk
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    queries, qids = _query_vectors(sf_dir)
    # k+1 then drop self: the query rows are corpus members
    top = brute_force_topk(ds, queries, k=6)
    top["query_idx"] = qids[top["query_idx"].to_numpy()]
    top = top[top["query_idx"] != top["vec_id"]]
    top = top.sort_values(["query_idx", "cosine", "vec_id"],
                          ascending=[True, False, True]) \
        .groupby("query_idx", sort=False).head(5)
    labels = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "label"]).to_pandas()
    j = top.merge(labels, on="vec_id")
    votes = j.groupby(["query_idx", "label"]).size() \
        .reset_index(name="n")
    votes = votes.sort_values(["query_idx", "n", "label"],
                              ascending=[True, False, True]) \
        .drop_duplicates("query_idx")
    out = votes.rename(columns={"label": "pred_label",
                                "n": "n_votes"})
    out["query_idx"] = out["query_idx"].astype("int64")
    out["pred_label"] = out["pred_label"].astype("int64")
    out["n_votes"] = out["n_votes"].astype("int64")
    return out[["query_idx", "pred_label", "n_votes"]] \
        .sort_values("query_idx").reset_index(drop=True)

def emb_pq_topk(sf_dir: str):
    """Product-quantization ANN (``ops/ann.pq_train/pq_encode/
    pq_topk``): sample-trained subspace codebooks, uint8 codes, ADC
    search. Rows-only (approximate by design — same status as
    ann_ivf_topk); recall vs brute force is pytest-gated
    (test_ops.py::test_pq_recall_and_determinism)."""
    from jerex_ray.ops.ann import pq_encode, pq_topk, pq_train
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    queries, qids = _query_vectors(sf_dir)
    books = pq_train(ds, m=8, k=64)
    codes = pq_encode(ds, books).materialize()
    out = pq_topk(codes, books, queries, k=5)
    out["query_idx"] = qids[out["query_idx"].to_numpy()]
    return out[["query_idx", "vec_id"]].astype("int64") \
        .sort_values(["query_idx", "vec_id"]).reset_index(drop=True)

def emb_semdedup(sf_dir: str):
    """SemDeDup survivors (``ops/embed.semdedup``): k-means buckets
    the space, only within-cluster cosine pairs are checked. Rows-only
    (k-means bucketing is approximate by design — a cross-cluster
    near-dup pair survives, exactly as in the paper); the exact
    all-pairs twin ``emb_near_dups`` IS oracled, and the planted-dup
    behavior is pytest-gated."""
    from jerex_ray.ops.embed import semdedup
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    out = semdedup(ds, k=8, threshold=0.95).to_pandas()
    if "vec_id" not in out.columns or out.empty:
        return pd.DataFrame({"vec_id": pd.Series(dtype="int64"),
                             "cluster": pd.Series(dtype="int64")})
    out["vec_id"] = out["vec_id"].astype("int64")
    out["cluster"] = out["cluster"].astype("int64")
    return out.sort_values("vec_id").reset_index(drop=True)

def emb_label_counts(sf_dir: str):
    from ray.data.aggregate import Count
    from jerex_ray.runtime import read_parquet_sized, shuffle_partitions
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet", columns=["label"])
    out = ds.groupby("label", num_partitions=shuffle_partitions()) \
            .aggregate(Count(alias_name="n"))
    return out.to_pandas().sort_values("label").reset_index(drop=True)

def emb_near_dups(sf_dir: str):
    """EXACT all-pairs cosine ≥ 0.95 (oracle-checked); the multi-table
    LSH variant (``embedding_near_dups``) is the 100 TB scale path,
    exercised by ``emb_near_dups_lsh`` and a planted-recall test."""
    from jerex_ray.ops.dedup import embedding_near_dups_exact
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    out = embedding_near_dups_exact(ds, threshold=0.95)
    return out[["vec_a", "vec_b"]].astype("int64") \
        .sort_values(["vec_a", "vec_b"]).reset_index(drop=True)

def emb_near_dups_lsh(sf_dir: str):
    """Multi-table LSH near-dups (approximate-recall scale path;
    rows-only by design — the exact variant above is oracled)."""
    from jerex_ray.ops.dedup import embedding_near_dups
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    out = embedding_near_dups(ds, threshold=0.95)
    return out[["vec_a", "vec_b"]].astype("int64") \
        .sort_values(["vec_a", "vec_b"]).reset_index(drop=True)

def emb_mmr_select(sf_dir: str):
    """Maximal Marginal Relevance diverse top-10 (λ=0.7) against the
    vec-0 query — k streaming argmax passes, selected set broadcast,
    winner's vector carried back with the block partial. Rows-only:
    the greedy recurrence is sequential by definition (like BPE
    merges); brute-force parity is pytest-gated
    (test_mmr_matches_bruteforce)."""
    from jerex_ray.ops.ann import mmr_select
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    emb = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"]) \
        .materialize()
    qrow = emb.map_batches(
        lambda df: df[df["vec_id"] == 0], batch_format="pandas") \
        .to_pandas()
    q = np.asarray(list(qrow["embedding"].iloc[0]), np.float64)
    return mmr_select(emb, q, k=10, lam=0.7)

def emb_knn_graph(sf_dir: str, *, k: int = 5):
    """Exact cosine k-NN graph over the whole embedding corpus (the
    primitive under SemDeDup clustering and graph-ANN index builds):
    each vector's top-k neighbors excluding itself.

    Scale shape: the corpus matrix broadcasts ONCE (``ray.put`` inside
    ``brute_force_topk``) and every block scores its rows against it
    with one float matmul — exact boundary/tie handling is the
    oracle-proven partial-top-k kernel (``ops/ann.brute_force_topk``).
    The all-pairs scan is quadratic by definition; the documented
    100 TB path is the IVF variant (``ann_ivf_topk``) per shard.
    Oracled by the cross-join row_number SQL."""
    from jerex_ray.ops.ann import brute_force_topk
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    df = ds.to_pandas()
    order = np.argsort(df["vec_id"].to_numpy())
    ids = df["vec_id"].to_numpy()[order]
    mat = np.stack(df["embedding"].to_numpy()[order])
    # k+1 then drop self: every query row is a corpus member
    top = brute_force_topk(ds, mat, k=k + 1)
    top["src"] = ids[top["query_idx"].to_numpy()]
    top = top[top["src"] != top["vec_id"]]
    top = top.sort_values(["src", "cosine", "vec_id"],
                          ascending=[True, False, True]) \
        .groupby("src", sort=False).head(k)
    return pd.DataFrame({"src": top["src"].to_numpy().astype("int64"),
                         "dst": top["vec_id"].to_numpy().astype("int64")}) \
        .sort_values(["src", "dst"]).reset_index(drop=True)

def emb_hard_negatives(sf_dir: str, *, k: int = 5):
    """Contrastive hard-negative mining: for every anchor vector, the
    k most cosine-similar vectors carrying a DIFFERENT label — the
    batch-construction primitive for contrastive/metric training
    (hardest negatives dominate the gradient signal).

    Scale shape: one broadcast of the anchor matrix + labels, one
    streaming pass over the corpus with a label-masked variant of the
    oracle-proven partial-top-k kernel (``ops/ann.brute_force_topk``)
    — the mask is one boolean compare per batch, so hard-negative
    mining costs exactly what the kNN graph costs. Oracled by the
    label-inequality cross-join row_number SQL."""
    from jerex_ray.ops.ann import brute_force_topk
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding", "label"])
    df = ds.to_pandas()
    order = np.argsort(df["vec_id"].to_numpy())
    ids = df["vec_id"].to_numpy()[order]
    labels = df["label"].to_numpy()[order]
    mat = np.stack(df["embedding"].to_numpy()[order])
    top = brute_force_topk(ds, mat, k=k, query_labels=labels)
    top["src"] = ids[top["query_idx"].to_numpy()]
    return pd.DataFrame({"src": top["src"].to_numpy().astype("int64"),
                         "dst": top["vec_id"].to_numpy().astype("int64")}) \
        .sort_values(["src", "dst"]).reset_index(drop=True)

def emb_label_outliers(sf_dir: str, *, frac: float = 0.05):
    """Label-conditional outlier flagging (the data-cleaning pass that
    catches mislabeled / off-distribution examples): the ``frac``
    least-typical vectors per label, by cosine similarity to their own
    label's centroid — a rank cutoff, not a score threshold, so the
    decision is count-exact and immune to float-boundary flakiness.

    Scale shape: centroids come from the oracle-proven partial-sum
    pass (``ops/embed.label_centroids``, round-6 parity) and broadcast
    as one tiny matrix; similarities are one vectorized pass; the
    per-label rank cutoff is a ``grouped_apply`` over (vec_id, label,
    cos) rows — 3 scalar columns, never the vectors — with the
    per-label take bounded by ``frac`` × label size."""
    import ray

    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.ops.embed import label_centroids
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding", "label"])
    cdf = label_centroids(ds)
    cents = {int(lab): g.sort_values("dim")["centroid"]
             .to_numpy(np.float64)
             for lab, g in cdf.groupby("label")}
    c_ref = ray.put(cents)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        cmap = ray.get(c_ref)
        if batch.empty:
            return pd.DataFrame({"vec_id": pd.Series(dtype="int64"),
                                 "label": pd.Series(dtype="int64"),
                                 "cos_sim": pd.Series(dtype="float64")})
        mat = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        labels = batch["label"].to_numpy()
        cos = np.empty(len(batch), dtype=np.float64)
        for lab in np.unique(labels):
            m = labels == lab
            c = cmap[int(lab)]
            v = mat[m]
            # dot / (|v|·|c|) — the same op order as the oracle's
            # list_cosine_similarity, so parity holds to summation
            # noise (≪ the round-6 output grid and any rank gap)
            cos[m] = (v @ c) / (np.linalg.norm(v, axis=1)
                                * np.linalg.norm(c))
        return pd.DataFrame({"vec_id": batch["vec_id"].to_numpy(),
                             "label": labels.astype("int64"),
                             "cos_sim": cos})

    scored = ds.map_batches(score, batch_format="pandas")

    def cutoff(df: pd.DataFrame) -> pd.DataFrame:
        # a block holds one or more WHOLE label groups — cut per label
        return df.sort_values(["cos_sim", "vec_id"]) \
            .groupby("label", sort=False, group_keys=False) \
            .apply(lambda g: g.head(int(np.ceil(frac * len(g)))))

    out = grouped_apply(scored, ["label"], cutoff).to_pandas()
    out["cos_sim"] = out["cos_sim"].round(6)
    out["label"] = out["label"].astype("int64")
    out["vec_id"] = out["vec_id"].astype("int64")
    return out[["label", "vec_id", "cos_sim"]] \
        .sort_values(["label", "vec_id"]).reset_index(drop=True)

def emb_triplets(sf_dir: str):
    """Training-triplet construction for metric learning: per anchor,
    one deterministic pseudo-random SAME-label positive (smallest
    md5("anchor:candidate") — reproducible across runs and replayable
    by the SQL oracle) and the HARDEST different-label negative (the
    label-masked top-1 cosine kernel). (anchor, pos, neg) feeds a
    triplet/InfoNCE loss directly.

    Scale shape: positives are label-co-located pair ranking inside
    ``grouped_apply`` blocks (quadratic in LABEL size — fine for
    classed corpora; document sharding for web-scale labels);
    negatives are the one-pass broadcast-matrix scan shared with
    ``emb_hard_negatives``."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.ops.ann import brute_force_topk
    from jerex_ray.runtime import read_parquet_sized
    from jerex_ray.util import md5_hash64_batch
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding", "label"])
    df = ds.to_pandas()
    order = np.argsort(df["vec_id"].to_numpy())
    ids = df["vec_id"].to_numpy()[order]
    labels = df["label"].to_numpy()[order]
    mat = np.stack(df["embedding"].to_numpy()[order])

    def positives(block: pd.DataFrame) -> pd.DataFrame:
        out_a, out_p = [], []
        for _, g in block.groupby("label", sort=False):
            gid = g["vec_id"].to_numpy(np.int64)
            n = len(gid)
            if n < 2:
                continue
            a = np.repeat(gid, n)
            p = np.tile(gid, n)
            keep = a != p
            a, p = a[keep], p[keep]
            h = md5_hash64_batch(
                [f"{x}:{y}" for x, y in zip(a, p)]).astype(np.uint64)
            pick = pd.DataFrame({"a": a, "p": p, "h": h}) \
                .sort_values(["a", "h", "p"]) \
                .groupby("a", sort=False).head(1)
            out_a.append(pick["a"].to_numpy())
            out_p.append(pick["p"].to_numpy())
        if not out_a:
            return pd.DataFrame({"anchor": pd.Series(dtype="int64"),
                                 "pos": pd.Series(dtype="int64")})
        return pd.DataFrame({"anchor": np.concatenate(out_a),
                             "pos": np.concatenate(out_p)})

    pos = grouped_apply(
        ds.map_batches(lambda d: d[["vec_id", "label"]],
                       batch_format="pandas"),
        ["label"], positives).to_pandas()
    top = brute_force_topk(ds, mat, k=1, query_labels=labels)
    neg = pd.DataFrame({"anchor": ids[top["query_idx"].to_numpy()],
                        "neg": top["vec_id"].to_numpy()})
    out = pos.merge(neg, on="anchor")
    for c in ("anchor", "pos", "neg"):
        out[c] = out[c].astype("int64")
    return out.sort_values("anchor").reset_index(drop=True)

def emb_mutual_nn(sf_dir: str):
    """Mutual nearest-neighbor pairs (reciprocal top-1 cosine) — the
    high-precision pairing primitive under bitext mining and
    dedup canonicalization: (a, b) kept iff a is b's single nearest
    neighbor AND b is a's. Reuses the oracle-proven partial-top-k
    kernel for the top-1 scan, then one pair-keyed combiner count
    keeps the pairs seen from BOTH directions."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.ops.ann import brute_force_topk
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    df = ds.to_pandas()
    order = np.argsort(df["vec_id"].to_numpy())
    ids = df["vec_id"].to_numpy()[order]
    mat = np.stack(df["embedding"].to_numpy()[order])
    top = brute_force_topk(ds, mat, k=2)
    top["src"] = ids[top["query_idx"].to_numpy(np.int64)]
    top = top[top["src"] != top["vec_id"]]
    nn1 = top.sort_values(["src", "cosine", "vec_id"],
                          ascending=[True, False, True]) \
        .drop_duplicates("src")
    lo = np.minimum(nn1["src"].to_numpy(np.int64),
                    nn1["vec_id"].to_numpy(np.int64))
    hi = np.maximum(nn1["src"].to_numpy(np.int64),
                    nn1["vec_id"].to_numpy(np.int64))
    g = pd.DataFrame({"lo": lo, "hi": hi}) \
        .groupby(["lo", "hi"]).size().reset_index(name="k")
    m = g[g["k"] == 2]
    return pd.DataFrame({"vec_a": m["lo"].to_numpy(np.int64),
                         "vec_b": m["hi"].to_numpy(np.int64)}) \
        .sort_values("vec_a").reset_index(drop=True)

def emb_centroid_drift(sf_dir: str):
    """Embedding drift monitor: per label, the cosine between the
    centroid of the even-vec_id half and the odd-vec_id half (a
    deterministic A/B split standing in for two ingestion epochs) —
    cosine ≈ 1 means the embedding distribution is stable. One
    combiner pass reduces to per-(label, half) dimension sums +
    counts; the |labels|×2×dim table closes on the driver."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding", "label"])

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        lab = df["label"].to_numpy()
        half = (df["vec_id"].to_numpy(np.int64) % 2)
        rows = []
        for (l, h) in {(l, h) for l, h in zip(lab, half)}:
            m = (lab == l) & (half == h)
            s = mat[m].sum(axis=0)
            rows.append({"label": l, "half": int(h),
                         "n": int(m.sum()),
                         **{f"d{i}": s[i] for i in range(mat.shape[1])}})
        return pd.DataFrame(rows)

    first = ds.take_batch(1, batch_format="pandas")
    dim = len(first["embedding"].iloc[0])
    m = grouped_aggregate(
        ds.map_batches(partials, batch_format="pandas",
                       batch_size=8192),
        ["label", "half"],
        {"n": ("n", "sum"),
         **{f"d{i}": (f"d{i}", "sum") for i in range(dim)}}) \
        .to_pandas()
    dcols = [f"d{i}" for i in range(dim)]
    rows = []
    for l, g in m.groupby("label"):
        g = g.sort_values("half")
        if len(g) != 2:
            continue
        a = g.iloc[0][dcols].to_numpy(np.float64) / g.iloc[0]["n"]
        b = g.iloc[1][dcols].to_numpy(np.float64) / g.iloc[1]["n"]
        cos = float(a @ b / np.sqrt((a @ a) * (b @ b)))
        rows.append((int(l), int(g.iloc[0]["n"]), int(g.iloc[1]["n"]),
                     round(cos, 6)))
    out = pd.DataFrame(rows, columns=["label", "n_even", "n_odd",
                                      "centroid_cosine"])
    return out.sort_values("label").reset_index(drop=True)

def emb_quantization_error(sf_dir: str):
    """Int8 scalar-quantization audit per label: vectors quantize to
    round(v / scale · 127) with a GLOBAL per-corpus scale (max |v|
    over all dims — one combiner max), and the per-label mean squared
    reconstruction error says which regions of the space the
    quantizer hurts — the deploy-time embedding-compression
    diagnostic. Rounding uses the half-away rule in BOTH engines (the
    numpy default would silently flip .5 boundaries vs SQL)."""
    import ray

    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["embedding", "label"])

    def absmax(df: pd.DataFrame) -> pd.DataFrame:
        mat = np.abs(np.stack(df["embedding"].to_numpy())
                     .astype(np.float64))
        return pd.DataFrame({"__all": [np.int64(0)],
                             "mx": [float(mat.max())]})

    scale = float(grouped_aggregate(
        ds.map_batches(absmax, batch_format="pandas"),
        ["__all"], {"mx": ("mx", "max")}).to_pandas()["mx"][0])
    s_ref = ray.put(scale)

    def sqerr(df: pd.DataFrame) -> pd.DataFrame:
        sc = ray.get(s_ref)
        mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        z = mat / sc * 127.0
        q = np.copysign(np.floor(np.abs(z) + 0.5), z)  # half-away
        rec = q / 127.0 * sc
        se = ((mat - rec) ** 2).sum(axis=1)
        g = pd.DataFrame({"label": df["label"].to_numpy(),
                          "n": 1, "se": se, "d": mat.shape[1]})
        return g.groupby("label", sort=False, as_index=False) \
            .agg(n=("n", "sum"), se=("se", "sum"), d=("d", "max"))

    m = grouped_aggregate(
        ds.map_batches(sqerr, batch_format="pandas", batch_size=8192),
        ["label"], {"n": ("n", "sum"), "se": ("se", "sum"),
                    "d": ("d", "max")}).to_pandas()
    mse = m["se"].to_numpy(np.float64) \
        / (m["n"].to_numpy(np.float64) * m["d"].to_numpy(np.float64))
    out = pd.DataFrame({"label": m["label"].astype("int64"),
                        "n": m["n"].astype("int64"),
                        "mse": np.round(mse, 12)})
    return out.sort_values("label").reset_index(drop=True)

def emb_procrustes(sf_dir: str):
    """Orthogonal Procrustes alignment between the embedding table
    and a deterministically rotated + perturbed copy of itself
    (fixed Householder rotation, seeded sin-grid noise): the
    distributed one-pass (n, XᵀY, ‖X‖², ‖Y‖²) reduction feeds the
    d×d driver SVD (``ops/embed.procrustes_align``). Emits the
    recovered rotation as flat (i, j, r) rows plus an
    ``alignment`` row block with the residual. Rows-only: SVD is not
    SQL-expressible; planted-rotation recovery is pytest-gated
    (tests/test_sketch_embed.py)."""
    from jerex_ray.ops.embed import procrustes_align
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])

    def add_pair(df: pd.DataFrame) -> pd.DataFrame:
        x = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        d = x.shape[1]
        h = _householder_rotation(d)
        ids = df["vec_id"].to_numpy(np.int64)
        noise = 1e-3 * np.sin(
            ids[:, None] * d + np.arange(d)[None, :])
        y = x @ h + noise
        return pd.DataFrame({"x": list(x), "y": list(y)})

    r, residual, n = procrustes_align(
        ds.map_batches(add_pair, batch_format="pandas"))
    d = r.shape[0]
    ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
    out = pd.DataFrame({"i": ii.ravel().astype(np.int64),
                        "j": jj.ravel().astype(np.int64),
                        "r": np.round(r.ravel(), 6)})
    out.attrs["residual_sq"] = residual
    out.attrs["n"] = n
    return out

def _householder_rotation(d: int) -> np.ndarray:
    """Fixed orthogonal matrix H = I − 2uuᵀ from a deterministic unit
    vector (no RNG — resume-safe)."""
    u = np.sin(np.arange(d, dtype=np.float64) + 1.0)
    u /= np.linalg.norm(u)
    return np.eye(d) - 2.0 * np.outer(u, u)

def emb_mrr(sf_dir: str, *, k: int = 10):
    """Retrieval-quality eval: MRR@10 per label with same-label
    relevance — every vector queries the corpus (the oracle-proven
    ``brute_force_topk`` kernel: one broadcast matrix, deterministic
    cosine/vec_id ordering), self excluded; a query scores 1/rank of
    its first same-label neighbor, 0 if none in the top-k. The
    per-label mean uses the half-away mirror; ranks are
    integer-exact so the SQL row_number oracle agrees on every
    reciprocal. Scale note: eval queries are a BOUNDED set by
    contract (here the labeled table itself) — at corpus scale you
    sample the query side; the corpus side already streams."""
    import pyarrow.parquet as _pq

    from jerex_ray.ops.ann import brute_force_topk
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    tbl = _pq.read_table(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding", "label"])
    qdf = tbl.to_pandas().sort_values("vec_id").reset_index(drop=True)
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    top = brute_force_topk(ds, np.stack(qdf["embedding"].to_numpy()),
                           k=k + 1)
    qid = qdf["vec_id"].to_numpy()
    labels = dict(zip(qdf["vec_id"], qdf["label"].astype(int)))
    t = top.copy()
    t["qvec"] = qid[t["query_idx"].to_numpy()]
    t = t[t["vec_id"] != t["qvec"]]
    t["rk"] = t.groupby("qvec", sort=False).cumcount() + 1
    t = t[t["rk"] <= k]
    t["match"] = (t["vec_id"].map(labels).to_numpy()
                  == t["qvec"].map(labels).to_numpy())
    first = (t[t["match"]].groupby("qvec")["rk"].min())
    rr = pd.Series(0.0, index=qid)
    rr.loc[first.index] = 1.0 / first
    lab = pd.Series({v: labels[v] for v in qid})
    grp = pd.DataFrame({"label": lab, "rr": rr}).groupby("label")["rr"]
    mrr = grp.sum() / grp.count()
    out = pd.DataFrame({
        "label": mrr.index.astype("int64"),
        "n_queries": grp.count().to_numpy(np.int64),
        "mrr": [float(np.copysign(np.floor(abs(x) * 1e6 + 0.5), x)
                      / 1e6) for x in mrr.to_numpy()]})
    return out.sort_values("label").reset_index(drop=True)

def emb_ndcg(sf_dir: str, *, k: int = 10):
    """NDCG@10 per label with binary same-label relevance — the
    graded companion of ``emb_mrr`` over the same oracle-proven
    exact top-k kernel: DCG = Σ rel_r/log2(r+1) over each query's
    top-k (self excluded), IDCG from the label's achievable ideal
    (min(k, label size − 1)); math.log2 = glibc = DuckDB log2, so
    every discount matches bit-for-bit; per-label means mirror-
    rounded. Eval queries are a bounded set by contract (sample the
    query side at corpus scale)."""
    import math

    import pyarrow.parquet as _pq

    from jerex_ray.ops.ann import brute_force_topk
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    qdf = _pq.read_table(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding", "label"]) \
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    top = brute_force_topk(ds, np.stack(qdf["embedding"].to_numpy()),
                           k=k + 1)
    qid = qdf["vec_id"].to_numpy()
    labels = dict(zip(qdf["vec_id"], qdf["label"].astype(int)))
    lab_sizes = qdf["label"].astype(int).value_counts().to_dict()
    disc = {r: 1.0 / math.log2(r + 1.0) for r in range(1, k + 1)}
    t = top.copy()
    t["qvec"] = qid[t["query_idx"].to_numpy()]
    t = t[t["vec_id"] != t["qvec"]]
    t["rk"] = t.groupby("qvec", sort=False).cumcount() + 1
    t = t[t["rk"] <= k]
    t["rel"] = (t["vec_id"].map(labels).to_numpy()
                == t["qvec"].map(labels).to_numpy())
    dcg = (t[t["rel"]].assign(d=lambda d: d["rk"].map(disc))
           .groupby("qvec")["d"].sum())
    rows = {}
    for v in qid:
        lab = labels[v]
        r_max = min(k, lab_sizes[lab] - 1)
        idcg = sum(disc[r] for r in range(1, r_max + 1))
        nd = float(dcg.get(v, 0.0)) / idcg
        rows.setdefault(lab, []).append(nd)
    out = pd.DataFrame(
        [(lab, len(vals),
          float(np.copysign(np.floor(abs(np.sum(vals) / len(vals))
                                     * 1e6 + 0.5),
                            np.sum(vals) / len(vals)) / 1e6))
         for lab, vals in sorted(rows.items())],
        columns=["label", "n_queries", "ndcg"])
    out["label"] = out["label"].astype("int64")
    out["n_queries"] = out["n_queries"].astype("int64")
    return out

def emb_ivf_recall(sf_dir: str, *, k: int = 10):
    """Recall@10 of the IVF index against exact brute force as a
    function of n_probe — the accuracy/cost curve every ANN
    deployment tunes, surfaced as a first-class result instead of a
    hidden pytest number. One exact pass (the oracle-proven kernel)
    + one IVF pass per probe setting over the SAME fixed query set;
    recall = |ivf ∩ exact| / k averaged over queries. Rows-only
    (approximate by design); monotone-recall and floor invariants
    are pytest-gated."""
    import pyarrow.parquet as _pq

    from jerex_ray.ops.ann import brute_force_topk, ivf_topk
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    qdf = _pq.read_table(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"]) \
        .to_pandas().sort_values("vec_id").head(64) \
        .reset_index(drop=True)
    queries = np.stack(qdf["embedding"].to_numpy())
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    exact = brute_force_topk(ds, queries, k=k)
    truth = {qi: set(g["vec_id"]) for qi, g in
             exact.groupby("query_idx")}
    rows = []
    for n_probe in (1, 2, 4, 16):   # 16 = n_cells: full probe == exact
        approx = ivf_topk(ds, queries, k=k, n_probe=n_probe)
        got = {qi: set(g["vec_id"]) for qi, g in
               approx.groupby("query_idx")}
        rec = np.mean([len(got.get(qi, set()) & t) / len(t)
                       for qi, t in truth.items()])
        rows.append((n_probe, len(truth), round(float(rec), 6)))
    return pd.DataFrame(rows, columns=["n_probe", "n_queries",
                                       "recall_at_10"])

def emb_label_prop(sf_dir: str, *, k: int = 5, rounds: int = 2):
    """Semi-supervised label propagation (Zhu & Ghahramani '02) over
    the exact cosine k-NN graph: even vec_ids are labeled seeds, odd
    ones start unlabeled; each round every non-seed takes the
    majority label of its k nearest neighbors' CURRENT labels
    (unlabeled neighbors abstain; ties break to the smallest label;
    seeds are clamped). Deterministic, so fully SQL-oracled via the
    row_number kNN CTE plus one vote CTE per round. The graph comes
    from the oracle-proven broadcast-matmul top-k kernel; per-round
    votes are a grouped count over the edge Dataset with the
    node-bounded label table broadcast."""
    import ray

    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding", "label"])
    df = ds.to_pandas()
    edges = emb_knn_graph(sf_dir, k=k)
    edges_ds = ray.data.from_pandas(edges).materialize()
    ids = df["vec_id"].astype("int64")
    seed = {int(v): int(l) for v, l in zip(ids, df["label"])
            if int(v) % 2 == 0}
    labels = {int(v): seed.get(int(v), -1) for v in ids}

    for _ in range(rounds):
        cur = labels

        def vote_block(b: pd.DataFrame, _l=cur) -> pd.DataFrame:
            empty = pd.DataFrame({"src": pd.Series(dtype="int64"),
                                  "lab": pd.Series(dtype="int64")})
            if b.empty:
                return empty
            b = b.copy()
            b["lab"] = b["dst"].map(_l)
            b = b[b["lab"] != -1]
            if b.empty:
                return empty
            cnt = b.groupby(["src", "lab"], sort=False).size() \
                .reset_index(name="c")
            top = cnt.sort_values(["src", "c", "lab"],
                                  ascending=[True, False, True]) \
                .groupby("src", sort=False).head(1)
            return pd.DataFrame({
                "src": top["src"].to_numpy(np.int64),
                "lab": top["lab"].to_numpy(np.int64)})

        votes = grouped_apply(edges_ds, ["src"], vote_block) \
            .to_pandas()
        vmap = dict(zip(votes["src"].astype("int64"),
                        votes["lab"].astype("int64"))) \
            if not votes.empty and "src" in votes.columns else {}
        labels = {v: (seed[v] if v in seed else vmap.get(v, -1))
                  for v in labels}

    out = pd.DataFrame(sorted(labels.items()),
                       columns=["vec_id", "label_pred"])
    return out.astype({"vec_id": "int64", "label_pred": "int64"})

def emb_map10(sf_dir: str, *, k: int = 10):
    """MAP@10 per label (mean average precision — the third classic
    retrieval eval next to ``emb_mrr`` / ``emb_ndcg``, over the SAME
    oracle-proven exact top-k kernel): every vector queries the
    corpus, self excluded, relevance = same label; AP@10 normalizes by
    min(R, 10) with R the query's relevant-count.

    Integer-exact signature: precision terms hit_idx/rk are scaled by
    LCM(1..10) = 2520 and the per-query normalization by 2520 again,
    so EVERY sum is integer (``ap_num`` lands bit-for-bit) and the
    single float divide per label happens after all accumulation —
    no float-ordering hazard anywhere, unlike a naive Σ P@i mean."""
    import pyarrow.parquet as _pq

    from jerex_ray.ops.ann import brute_force_topk
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    tbl = _pq.read_table(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding", "label"])
    qdf = tbl.to_pandas().sort_values("vec_id").reset_index(drop=True)
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    top = brute_force_topk(ds, np.stack(qdf["embedding"].to_numpy()),
                           k=k + 1)
    qid = qdf["vec_id"].to_numpy()
    labels = dict(zip(qdf["vec_id"], qdf["label"].astype(int)))
    lab_n = qdf["label"].astype(int).value_counts().to_dict()
    t = top.copy()
    t["qvec"] = qid[t["query_idx"].to_numpy()]
    t = t[t["vec_id"] != t["qvec"]]
    t["rk"] = t.groupby("qvec", sort=False).cumcount() + 1
    t = t[t["rk"] <= k]
    hits = t[t["vec_id"].map(labels).to_numpy()
             == t["qvec"].map(labels).to_numpy()].copy()
    hits["hit_idx"] = hits.groupby("qvec", sort=False).cumcount() + 1
    hits["term"] = (hits["hit_idx"].to_numpy(np.int64)
                    * (2520 // hits["rk"].to_numpy(np.int64)))
    sc = hits.groupby("qvec")["term"].sum()
    rows = []
    for v in qid:
        ql = labels[v]
        r = lab_n[ql] - 1
        if r <= 0:
            continue
        qsc = int(sc.get(v, 0)) * (2520 // min(r, k))
        rows.append((ql, qsc))
    per = pd.DataFrame(rows, columns=["label", "qsc"])
    g = per.groupby("label")["qsc"]
    total = g.sum().astype("int64")
    n_q = g.count().astype("int64")
    map10 = total.to_numpy(np.float64) / (2520.0 * 2520.0
                                          * n_q.to_numpy(np.float64))
    out = pd.DataFrame({
        "label": total.index.astype("int64"),
        "n_queries": n_q.to_numpy(np.int64),
        "ap_num": total.to_numpy(np.int64),
        "map10": np.copysign(np.floor(np.abs(map10) * 1e6 + 0.5),
                             map10) / 1e6})
    return out.sort_values("label").reset_index(drop=True)

def emb_hamming_topk(sf_dir: str):
    """Binary-quantization vector search (sign-bit signatures →
    Hamming shortlist → exact cosine rerank, the 1-bit compression
    modern vector stores run before rerank;
    ``ops/ann.binary_hamming_topk``): top-5 per query from a
    Hamming-top-50 shortlist. The shortlist cut is integer-exact with
    (hamming, vec_id) ties, so the SQL oracle replays the identical
    candidate set; the rerank inherits ``ann_topk``'s established
    cosine-order parity. Output carries the integer hamming distance;
    the same fixed query set (vec_id < 3) as the ANN family."""
    from jerex_ray.ops.ann import binary_hamming_topk
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    queries, qids = _query_vectors(sf_dir)
    out = binary_hamming_topk(ds, queries, k=5, shortlist=50)
    out["query_idx"] = qids[out["query_idx"].to_numpy()]
    return out[["query_idx", "vec_id", "hamming"]].astype("int64") \
        .sort_values(["query_idx", "vec_id"]).reset_index(drop=True)

def emb_kcenter_select(sf_dir: str, *, k: int = 6):
    """Farthest-first-traversal k-center coreset selection (Gonzalez
    '85 — the 2-approximation diverse-subset primitive beside MMR
    and SemDeDup in the curation family): seed at the smallest
    vec_id, then ``k``−1 rounds each selecting the point FARTHEST
    from the chosen set. Distances are squared Euclidean over the
    3-decimal-quantized embedding grid (mirror-rounded float32 →
    int), so every distance is an EXACT INTEGER and the argmax cut
    (dist DESC, vec_id ASC) carries zero float hazard — the
    integer-cents convention applied to vectors.

    Scale shape: the ≤k selected centers broadcast per round; ONE
    streaming pass over the embeddings recomputes each point's
    min-distance-to-set (stateless k× recompute beats carrying a
    distributed min table at k this small) and emits per-block
    argmax partials; the driver reduces the block-bounded partials.
    Returns the selection order with each center's selection
    distance — the covering-radius curve."""
    import pyarrow.parquet as _pq

    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"]) \
        .materialize()

    def quant(m: np.ndarray) -> np.ndarray:
        return np.copysign(np.floor(np.abs(m.astype(np.float64))
                                    * 1000.0 + 0.5), m) \
            .astype(np.int64)

    first = int(ds.map_batches(
        lambda df: pd.DataFrame(
            {"m": [df["vec_id"].min()]}),
        batch_format="pandas").to_pandas()["m"].min())
    tbl = _pq.read_table(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"],
                         filters=[("vec_id", "==", first)])
    import ray
    sel = [(1, first, 0)]
    cents = [quant(np.stack(tbl["embedding"].to_pandas()
                            .to_numpy())[0])]
    for r in range(2, k + 1):
        cref = ray.put(np.stack(cents))

        def block_argmax(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty:
                return pd.DataFrame({"vec_id": pd.Series(dtype="int64"),
                                     "d2": pd.Series(dtype="int64")})
            C = ray.get(cref)
            Q = quant(np.stack(df["embedding"].to_numpy()))
            # (n, c) exact-integer squared distances
            d2 = ((Q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2) \
                .min(axis=1)
            vid = df["vec_id"].to_numpy(np.int64)
            o = np.lexsort((vid, -d2))[0]
            return pd.DataFrame({"vec_id": [int(vid[o])],
                                 "d2": [int(d2[o])]})

        part = ds.map_batches(block_argmax,
                              batch_format="pandas").to_pandas()
        part = part.sort_values(["d2", "vec_id"],
                                ascending=[False, True])
        vid, d2 = int(part["vec_id"].iloc[0]), int(part["d2"].iloc[0])
        sel.append((r, vid, d2))
        t = _pq.read_table(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"],
                           filters=[("vec_id", "==", vid)])
        cents.append(quant(np.stack(
            t["embedding"].to_pandas().to_numpy())[0]))
    return pd.DataFrame(sel, columns=["sel_rank", "vec_id", "d2"]) \
        .astype("int64")

def _kcenter_oracle_sql(k: int = 6, dim: int = 64) -> str:
    """Per-round replay of ``emb_kcenter_select``: quantized integer
    vectors, a correlated exact-integer distance sum per candidate,
    running least() min-distance, and the strict (d2 DESC, vec_id)
    pick."""
    sql = f"""
        WITH q AS MATERIALIZED (
            SELECT vec_id, list_transform(embedding,
                x -> CAST(round(CAST(x AS DOUBLE) * 1000.0, 0)
                          AS BIGINT)) AS v
            FROM embeddings),
        idx AS (SELECT unnest(range(1, {dim + 1})) AS i),
        p1 AS (SELECT min(vec_id) AS cid FROM q),
        m1 AS MATERIALIZED (
            SELECT q.vec_id,
                   (SELECT sum((q.v[idx.i] - c.v[idx.i])
                               * (q.v[idx.i] - c.v[idx.i]))
                    FROM idx) AS d2
            FROM q JOIN q c ON c.vec_id = (SELECT cid FROM p1))"""
    for r in range(2, k + 1):
        sql += f""",
        p{r} AS (SELECT vec_id AS cid, d2 FROM m{r - 1}
                 ORDER BY d2 DESC, vec_id ASC LIMIT 1),
        m{r} AS MATERIALIZED (
            SELECT m.vec_id, least(m.d2,
                   (SELECT sum((q.v[idx.i] - c.v[idx.i])
                               * (q.v[idx.i] - c.v[idx.i]))
                    FROM idx)) AS d2
            FROM m{r - 1} m JOIN q ON q.vec_id = m.vec_id
                 JOIN q c ON c.vec_id = (SELECT cid FROM p{r}))"""
    parts = ["""
        SELECT CAST(1 AS BIGINT) AS sel_rank,
               (SELECT cid FROM p1) AS vec_id,
               CAST(0 AS BIGINT) AS d2"""]
    for r in range(2, k + 1):
        parts.append(f"""
        SELECT CAST({r} AS BIGINT), cid, CAST(d2 AS BIGINT)
        FROM p{r}""")
    return sql + "\nSELECT * FROM (" \
        + "\nUNION ALL ".join(parts) + ") ORDER BY sel_rank"

def emb_principal_direction(sf_dir: str, *, iters: int = 16,
                            scale: int = 10_000):
    """Top principal direction of the embedding cloud by
    EXACT-INTEGER power iteration on the d×d Gram matrix
    G = Σᵢ qᵢqᵢᵀ (Pearson 1901 / Hotelling '33 PCA's first
    component; the von Mises power method) — the SQL-oracled
    companion of the rows-only full ``emb_pca``. Vectors quantize to
    the 3-decimal mirror-rounded integer grid (the ``emb_kcenter``
    convention), so G is exact int64 from ONE distributed combiner
    pass; the ``iters`` power-iteration rounds then run driver-side
    on the d²-bounded (metadata-sized) G with Python big ints:
    y = G·w, then the mirror-truncating max-rescale
    w ← sign(y)·((|y|·scale) // max|y|) — exact integer division on
    both engines (HUGEINT in the oracle), bit-replayable with zero
    float hazard. w₀ = ones fixes the sign convention.

    Scale shape: distributed cost is ONE streaming pass regardless
    of rounds — per-block d² partial Gram sums (order-free int64)
    reduce through the combiner; nothing row-sized leaves the
    blocks. The d×d driver DP is independent of corpus size."""
    configure_data_context()
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["embedding"])

    def quant(m: np.ndarray) -> np.ndarray:
        return np.copysign(np.floor(np.abs(m.astype(np.float64))
                                    * 1000.0 + 0.5), m) \
            .astype(np.int64)

    def gram_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"j": pd.Series(dtype="int64"),
                                 "k": pd.Series(dtype="int64"),
                                 "g": pd.Series(dtype="int64")})
        Q = quant(np.stack(df["embedding"].to_numpy()))
        G = Q.T @ Q  # exact: |q| ≤ ~32k ⇒ block sums fit int64
        d = G.shape[0]
        jj, kk = np.meshgrid(np.arange(d), np.arange(d),
                             indexing="ij")
        return pd.DataFrame({"j": jj.ravel(), "k": kk.ravel(),
                             "g": G.ravel()})

    parts = ds.map_batches(gram_block,
                           batch_format="pandas").to_pandas()
    if parts.empty or "j" not in parts.columns:
        return pd.DataFrame({"dim_idx": pd.Series(dtype="int64"),
                             "score": pd.Series(dtype="int64")})
    gd = parts.groupby(["j", "k"], sort=True)["g"].sum()
    d = int(parts["j"].max()) + 1
    G = [[int(gd.loc[(j, k)]) for k in range(d)] for j in range(d)]
    w = [scale] * d
    for _ in range(iters):
        y = [sum(G[j][k] * w[k] for k in range(d)) for j in range(d)]
        m = max(abs(v) for v in y)
        assert m > 0, "principal direction: zero Gram product"
        w = [(abs(v) * scale) // m * (1 if v >= 0 else -1)
             for v in y]
    return pd.DataFrame({"dim_idx": np.arange(1, d + 1,
                                              dtype=np.int64),
                         "score": np.array(w, dtype=np.int64)})

def _principal_direction_oracle_sql(iters: int = 16,
                                    scale: int = 10_000,
                                    dim: int = 64) -> str:
    """Per-round replay of ``emb_principal_direction``: quantized
    integer Gram via an explode-group pass, then HUGEINT SpMV +
    mirror-truncating max-rescale per round."""
    sql = f"""
        WITH q AS MATERIALIZED (
            SELECT vec_id, list_transform(embedding,
                x -> CAST(round(CAST(x AS DOUBLE) * 1000.0, 0)
                          AS BIGINT)) AS v
            FROM embeddings),
        idx AS (SELECT unnest(range(1, {dim + 1})) AS i),
        g AS MATERIALIZED (
            SELECT a.i AS j, b.i AS k,
                   CAST(sum(q.v[a.i] * q.v[b.i]) AS HUGEINT) AS gv
            FROM q, idx a, idx b GROUP BY a.i, b.i),
        w0 AS (SELECT i, CAST({scale} AS HUGEINT) AS w FROM idx)"""
    for r in range(1, iters + 1):
        sql += f""",
        y{r} AS MATERIALIZED (
            SELECT g.j AS i, sum(g.gv * p.w) AS y
            FROM g JOIN w{r - 1} p ON p.i = g.k GROUP BY g.j),
        m{r} AS (SELECT max(abs(y)) AS m FROM y{r}),
        w{r} AS MATERIALIZED (
            SELECT i, CASE WHEN y >= 0
                THEN (y * {scale}) // (SELECT m FROM m{r})
                ELSE -((-y * {scale}) // (SELECT m FROM m{r}))
                END AS w
            FROM y{r})"""
    return sql + f"""
        SELECT CAST(i AS BIGINT) AS dim_idx, CAST(w AS BIGINT) AS score
        FROM w{iters} ORDER BY dim_idx"""

def emb_cka(sf_dir: str):
    """Linear CKA representation-similarity (Kornblith et al. '19,
    'Similarity of Neural Network Representations Revisited')
    between the embedding table's two DIMENSION-HALVES — the
    redundancy audit: CKA ≈ 1 means the second half of every vector
    restates the first (wasted bytes at 100 TB), CKA ≈ 0 means
    complementary subspaces. CKA = ‖Cxy‖²_F/(‖Cxx‖_F·‖Cyy‖_F) over
    centered cross-covariances; the n factors cancel, so with
    M = n·Σxyᵀ − SxSyᵀ on the 3-decimal quantized integer grid every
    M entry and all three Frobenius sums A = ‖Mxy‖²_F, B = ‖Mxx‖²_F,
    C = ‖Myy‖²_F are EXACT INTEGERS (Python big ints / HUGEINT);
    CKA = A/√(B·C) is ONE identical float expression. A, B, C ship
    as deterministically-cast doubles (both engines round-to-nearest
    the same exact integer).

    Scale shape: ONE streaming combiner pass emits per-block d²
    Gram + d sum + count partials (the ``emb_principal_direction``
    pass shape — the full 64×64 Gram contains all three blocks);
    the d²-bounded driver work is corpus-size-independent."""
    import math

    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["embedding"])

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"j": pd.Series(dtype="int64"),
                                 "k": pd.Series(dtype="int64"),
                                 "g": pd.Series(dtype="int64")})
        M = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        Q = np.copysign(np.floor(np.abs(M) * 1000.0 + 0.5), M) \
            .astype(np.int64)
        d = Q.shape[1]
        G = Q.T @ Q
        jj, kk = np.meshgrid(np.arange(d), np.arange(d),
                             indexing="ij")
        rows = pd.DataFrame({"j": jj.ravel(), "k": kk.ravel(),
                             "g": G.ravel()})
        sums = pd.DataFrame({"j": np.arange(d),
                             "k": np.full(d, -1, dtype=np.int64),
                             "g": Q.sum(axis=0)})
        cnt = pd.DataFrame({"j": [-1], "k": [-1],
                            "g": [np.int64(len(Q))]})
        return pd.concat([rows, sums, cnt], ignore_index=True) \
            .astype({"j": "int64", "k": "int64", "g": "int64"})

    agg = grouped_aggregate(
        ds.map_batches(partials, batch_format="pandas"),
        ["j", "k"], {"g": ("g", "sum")},
        result_hint="small").to_pandas()
    n = int(agg.loc[(agg["j"] == -1) & (agg["k"] == -1),
                    "g"].iloc[0])
    srow = agg[(agg["k"] == -1) & (agg["j"] >= 0)] \
        .sort_values("j")
    s = [int(v) for v in srow["g"]]
    d = len(s)
    half = d // 2
    gm = {(int(r.j), int(r.k)): int(r.g)
          for r in agg[agg["k"] >= 0].itertuples()}
    A = B = C = 0
    for j in range(d):
        for k in range(d):
            m = n * gm[(j, k)] - s[j] * s[k]
            if j < half and k >= half:
                A += m * m
            elif j < half and k < half:
                B += m * m
            elif j >= half and k >= half:
                C += m * m
    cka = float(A) / math.sqrt(float(B) * float(C))
    return pd.DataFrame({
        "n": np.array([n], dtype=np.int64),
        "d": np.array([d], dtype=np.int64),
        "a_frob": [float(A)],
        "b_frob": [float(B)],
        "c_frob": [float(C)],
        "cka": [_round_half_away(cka, 6)]})

def _cka_oracle_sql(dim: int = 64) -> str:
    half = dim // 2
    return f"""
    WITH q AS MATERIALIZED (
        SELECT list_transform(embedding,
            x -> CAST(round(CAST(x AS DOUBLE) * 1000.0, 0)
                      AS BIGINT)) AS v
        FROM embeddings),
    idx AS (SELECT unnest(range(1, {dim + 1})) AS i),
    cnt AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM q),
    s AS MATERIALIZED (
        SELECT i, CAST(sum(q.v[i]) AS HUGEINT) AS sv
        FROM q, idx GROUP BY i),
    g AS MATERIALIZED (
        SELECT a.i AS j, b.i AS k,
               CAST(sum(q.v[a.i] * q.v[b.i]) AS HUGEINT) AS gv
        FROM q, idx a, idx b GROUP BY a.i, b.i),
    m AS (SELECT g.j, g.k,
                 (SELECT n FROM cnt) * g.gv - sj.sv * sk.sv AS mv
          FROM g JOIN s sj ON sj.i = g.j JOIN s sk ON sk.i = g.k),
    f AS (SELECT
        sum(mv * mv) FILTER (WHERE j <= {half} AND k > {half}) AS a,
        sum(mv * mv) FILTER (WHERE j <= {half} AND k <= {half}) AS b,
        sum(mv * mv) FILTER (WHERE j > {half} AND k > {half}) AS c
        FROM m)
    SELECT CAST((SELECT n FROM cnt) AS BIGINT) AS n,
           CAST({dim} AS BIGINT) AS d,
           CAST(a AS DOUBLE) AS a_frob,
           CAST(b AS DOUBLE) AS b_frob,
           CAST(c AS DOUBLE) AS c_frob,
           round(CAST(a AS DOUBLE)
                 / sqrt(CAST(b AS DOUBLE) * CAST(c AS DOUBLE)), 6)
               AS cka
    FROM f"""

def emb_closest_pair(sf_dir: str):
    """Exact closest pair of the embedding cloud (the classic
    computational-geometry primitive, Shamos & Hoey '75, in its
    blocked all-pairs form): squared Euclidean distance on the
    3-decimal quantized integer grid so every distance is an EXACT
    int64 and the (dist, vec_a, vec_b) argmin is bit-deterministic.
    The dual of the farthest-first k-center pick — the pair a
    dedup/merge pass would fuse first. See
    ``ops/embed.py:closest_pair_sq`` for the dataflow (broadcast
    matrix, per-block half-matrix champions, #blocks-bounded driver
    reduce) and the LSH-bucket scale path."""
    from jerex_ray.ops.embed import closest_pair_sq
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    return closest_pair_sq(ds)

def emb_kmedoids(sf_dir: str, *, k: int = 4, iters: int = 4):
    """k-medoids (Gonzalez seeding + Park–Jun '09 Voronoi iteration,
    squared Euclidean on the 3-decimal quantized integer grid) — the
    robust clustering member beside kmeans whose centers are real
    data points; EXACT int64 costs and (value, id) tie rules make
    seeding, every assignment and every medoid update bit-replayable
    in the generated per-iteration SQL oracle. See
    ``ops/embed.py:kmedoids_voronoi`` for the blocked-pass dataflow
    and the sample/ANN/LSH corpus-scale path."""
    from jerex_ray.ops.embed import kmedoids_voronoi
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    return kmedoids_voronoi(ds, k=k, iters=iters)

def _kmedoids_oracle_sql(k: int = 4, iters: int = 4) -> str:
    """Per-step replay of ``emb_kmedoids``: one MATERIALIZED
    all-pairs integer distance table (self-pairs included, d2=0),
    Gonzalez seeding as k−1 argmax CTEs, then per iteration an
    assignment CTE (row_number over (d2, medoid)) and a same-cluster
    within-sum CTE with (within, id) argmin medoid updates
    (COALESCE keeps an old medoid if its cluster empties — the
    engine's degenerate guard)."""
    sql = """
    WITH q AS MATERIALIZED (
        SELECT vec_id, list_transform(embedding,
            x -> CAST(round(CAST(x AS DOUBLE) * 1000.0, 0)
                      AS BIGINT)) AS v
        FROM embeddings),
    idx AS (SELECT unnest(range(1, 65)) AS i),
    p AS MATERIALIZED (
        SELECT a.vec_id AS pa, b.vec_id AS pb,
               (SELECT sum((a.v[i] - b.v[i]) * (a.v[i] - b.v[i]))
                FROM idx) AS d2
        FROM q a JOIN q b ON TRUE),
    m1 AS (SELECT min(vec_id) AS id FROM q),
    dm1 AS (SELECT pa AS vec_id, d2 AS dm FROM p
            WHERE pb = (SELECT id FROM m1))"""
    prev = "dm1"
    for j in range(2, k + 1):
        sql += f""",
    m{j} AS (SELECT vec_id AS id FROM {prev}
             ORDER BY dm DESC, vec_id LIMIT 1),
    dm{j} AS (SELECT d.vec_id,
                     CASE WHEN p.d2 < d.dm THEN p.d2 ELSE d.dm END
                         AS dm
              FROM {prev} d JOIN p ON p.pa = d.vec_id
                   AND p.pb = (SELECT id FROM m{j}))"""
        prev = f"dm{j}"
    meds = " UNION ALL ".join(
        f"SELECT id FROM m{j}" for j in range(1, k + 1))
    sql += f""",
    meds0 AS MATERIALIZED (SELECT id FROM ({meds}) t)"""
    cur = "meds0"
    for r in range(1, iters + 1):
        sql += f""",
    a{r} AS MATERIALIZED (
        SELECT vec_id, med, d2 FROM (
            SELECT p.pa AS vec_id, m.id AS med, p.d2,
                   row_number() OVER (PARTITION BY p.pa
                                      ORDER BY p.d2, m.id) AS rn
            FROM p JOIN {cur} m ON p.pb = m.id) t
        WHERE rn = 1),
    w{r} AS MATERIALIZED (
        SELECT x.vec_id, x.med, sum(p.d2) AS w
        FROM a{r} x JOIN a{r} y ON x.med = y.med
        JOIN p ON p.pa = x.vec_id AND p.pb = y.vec_id
        GROUP BY x.vec_id, x.med),
    meds{r} AS MATERIALIZED (
        SELECT COALESCE(
            (SELECT vec_id FROM w{r}
             WHERE w{r}.med = m.id
             ORDER BY w, vec_id LIMIT 1), m.id) AS id
        FROM {cur} m)"""
        cur = f"meds{r}"
    return sql + f"""
    SELECT vec_id, CAST(med AS BIGINT) AS medoid,
           CAST(d2 AS BIGINT) AS d2
    FROM (
        SELECT p.pa AS vec_id, m.id AS med, p.d2,
               row_number() OVER (PARTITION BY p.pa
                                  ORDER BY p.d2, m.id) AS rn
        FROM p JOIN {cur} m ON p.pb = m.id) t
    WHERE rn = 1 ORDER BY vec_id"""

def emb_lof(sf_dir: str):
    """Local Outlier Factor (Breunig et al. '00, k=3) of every
    embedding — density-based anomaly scoring on the 3-decimal
    quantized integer grid so distances, k-distances, reachability
    sums are exact int64 and LOF = (Σ rsum_p/rsum_o)/k is a
    fixed-order sum of single int/int divisions, bit-identical in
    the all-pairs SQL oracle. See ``ops/embed.py:lof_scores`` for
    the dataflow (broadcast matrix + blocked kNN, N-bounded driver
    joins) and the IVF/LSH kNN-graph scale path."""
    from jerex_ray.ops.embed import lof_scores
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    return lof_scores(ds, k=3)

_CLOSEST_PAIR_ORACLE_SQL = """
    WITH q AS MATERIALIZED (
        SELECT vec_id, list_transform(embedding,
            x -> CAST(round(CAST(x AS DOUBLE) * 1000.0, 0)
                      AS BIGINT)) AS v
        FROM embeddings),
    idx AS (SELECT unnest(range(1, 65)) AS i),
    p AS (SELECT a.vec_id AS va, b.vec_id AS vb,
                 (SELECT sum((a.v[i] - b.v[i]) * (a.v[i] - b.v[i]))
                  FROM idx) AS d2
          FROM q a JOIN q b ON a.vec_id < b.vec_id)
    SELECT CAST(va AS BIGINT) AS vec_a, CAST(vb AS BIGINT) AS vec_b,
           CAST(d2 AS BIGINT) AS dist_sq
    FROM p ORDER BY d2, va, vb LIMIT 1"""

_LOF_ORACLE_SQL = """
    WITH q AS MATERIALIZED (
        SELECT vec_id, list_transform(embedding,
            x -> CAST(round(CAST(x AS DOUBLE) * 1000.0, 0)
                      AS BIGINT)) AS v
        FROM embeddings),
    idx AS (SELECT unnest(range(1, 65)) AS i),
    p AS (SELECT a.vec_id AS pa, b.vec_id AS pb,
                 (SELECT sum((a.v[i] - b.v[i]) * (a.v[i] - b.v[i]))
                  FROM idx) AS d2
          FROM q a JOIN q b ON a.vec_id <> b.vec_id),
    rn AS (SELECT pa, pb, d2,
                  row_number() OVER (PARTITION BY pa
                                     ORDER BY d2, pb) AS r
           FROM p),
    knn AS (SELECT * FROM rn WHERE r <= 3),
    kd AS (SELECT pa AS v, max(CASE WHEN r = 3 THEN d2 END) AS kdist
           FROM knn GROUP BY pa),
    reach AS (SELECT k.pa, k.pb, k.r,
                     CASE WHEN kd.kdist > k.d2 THEN kd.kdist
                          ELSE k.d2 END AS rd
              FROM knn k JOIN kd ON kd.v = k.pb),
    rs AS (SELECT pa, sum(rd) AS rsum,
                  max(CASE WHEN r = 1 THEN pb END) AS n1,
                  max(CASE WHEN r = 2 THEN pb END) AS n2,
                  max(CASE WHEN r = 3 THEN pb END) AS n3
           FROM reach GROUP BY pa),
    j AS (SELECT rs.pa, rs.n1, rs.n2, rs.n3, kd.kdist,
                 CAST(rs.rsum AS BIGINT) AS rsum,
                 r1.rsum AS ro1, r2.rsum AS ro2, r3.rsum AS ro3
          FROM rs JOIN kd ON kd.v = rs.pa
          JOIN rs r1 ON r1.pa = rs.n1
          JOIN rs r2 ON r2.pa = rs.n2
          JOIN rs r3 ON r3.pa = rs.n3)
    SELECT CAST(pa AS BIGINT) AS vec_id, CAST(n1 AS BIGINT) AS n1,
           CAST(n2 AS BIGINT) AS n2, CAST(n3 AS BIGINT) AS n3,
           CAST(kdist AS BIGINT) AS kdist_sq, rsum,
           CASE WHEN rsum = 0 OR ro1 = 0 OR ro2 = 0 OR ro3 = 0
                THEN 1.0
                ELSE round((CAST(rsum AS DOUBLE) / ro1
                            + CAST(rsum AS DOUBLE) / ro2
                            + CAST(rsum AS DOUBLE) / ro3) / 3.0, 6)
           END AS lof
    FROM j ORDER BY vec_id"""

def emb_jl_distortion(sf_dir: str, *, k: int = 8):
    """Johnson–Lindenstrauss distance-preservation audit with
    DERANDOMIZED Achlioptas ±1 projections (JL '84; Achlioptas '03
    showed dense ±1 entries suffice): project each quantized vector
    to ``k`` dims via signs md5("jl|i|j") — the md5-seeded-sampling
    convention — and report, for every consecutive vec-id pair
    (2m, 2m+1), the original and projected squared distances plus
    the JL ratio ‖(qa−qb)R‖²/(k·‖qa−qb‖²) whose expectation is 1.
    Exactness: the sign matrix, the projected difference, and BOTH
    squared distances are EXACT int64 on the 3-decimal quantized
    grid; the per-pair ratio is the only float (one identical
    int/int division, round 6) — no cross-pair float aggregation
    anywhere (the audit ships the pair table).

    Scale shape: ONE pair-key co-location (`grouped_apply` on
    vec_id // 2); each block projects with the 64×k broadcast sign
    matrix and emits its pairs — nothing pair-squared, nothing
    driver-sized."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    from jerex_ray.util import md5_hash64
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])

    def add_pair(df: pd.DataFrame) -> pd.DataFrame:
        # vectors ship as float32 BYTES through the hash shuffle
        # (object-ndarray columns break shuffle finalize on empty
        # blocks — the round-3 gotcha)
        if df.empty:
            return pd.DataFrame({"vec_id": pd.Series(dtype="int64"),
                                 "pair": pd.Series(dtype="int64"),
                                 "vb": pd.Series(dtype="object")})
        return pd.DataFrame({
            "vec_id": df["vec_id"].to_numpy(np.int64),
            "pair": df["vec_id"].to_numpy(np.int64) // 2,
            "vb": [np.asarray(v, dtype=np.float32).tobytes()
                   for v in df["embedding"]]})

    d = 64
    signs = np.array(
        [[1 if md5_hash64(f"jl|{i}|{j}") % 2 == 0 else -1
          for j in range(k)] for i in range(d)], dtype=np.int64)

    def pair_block(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"vec_a": pd.Series(dtype="int64"),
                "vec_b": pd.Series(dtype="int64"),
                "d2_orig": pd.Series(dtype="int64"),
                "d2_proj": pd.Series(dtype="int64"),
                "jl_ratio": pd.Series(dtype="float64")}
        if df.empty:
            return pd.DataFrame(cols)
        df = df.sort_values("vec_id")
        g = df.groupby(df["vec_id"].to_numpy(np.int64) // 2)
        rows = []
        for _, grp in g:
            if len(grp) != 2:
                continue
            m = np.stack([np.frombuffer(b, dtype=np.float32)
                          for b in grp["vb"]]).astype(np.float64)
            q = np.copysign(np.floor(np.abs(m) * 1000.0 + 0.5), m) \
                .astype(np.int64)
            diff = q[0] - q[1]
            d2o = int((diff * diff).sum())
            z = diff @ signs
            d2p = int((z * z).sum())
            ratio = 0.0 if d2o == 0 else d2p / (k * d2o)
            rows.append((int(grp["vec_id"].iloc[0]),
                         int(grp["vec_id"].iloc[1]), d2o, d2p,
                         _round_half_away(ratio, 6)))
        if not rows:
            return pd.DataFrame(cols)
        out = pd.DataFrame(rows, columns=["vec_a", "vec_b",
                                          "d2_orig", "d2_proj",
                                          "jl_ratio"])
        return out.astype({"vec_a": "int64", "vec_b": "int64",
                           "d2_orig": "int64", "d2_proj": "int64"})

    out = grouped_apply(ds.map_batches(add_pair,
                                       batch_format="pandas"),
                        ["pair"], pair_block).to_pandas()
    return out.sort_values("vec_a").reset_index(drop=True)

def _jl_distortion_oracle_sql(k: int = 8, dim: int = 64) -> str:
    return f"""
    WITH q AS MATERIALIZED (
        SELECT vec_id, list_transform(embedding,
            x -> CAST(round(CAST(x AS DOUBLE) * 1000.0, 0)
                      AS BIGINT)) AS v
        FROM embeddings),
    idx AS (SELECT unnest(range(1, {dim + 1})) AS i),
    jdx AS (SELECT unnest(range(1, {k + 1})) AS j),
    r AS MATERIALIZED (
        SELECT i.i, j.j,
               CASE WHEN CAST('0x' || substr(md5(
                   'jl|' || CAST(i.i - 1 AS VARCHAR) || '|'
                   || CAST(j.j - 1 AS VARCHAR)), 1, 16) AS UBIGINT)
                   % 2 = 0 THEN 1 ELSE -1 END AS s
        FROM idx i, jdx j),
    pairs AS MATERIALIZED (
        SELECT a.vec_id AS va, b.vec_id AS vb, a.v AS qa, b.v AS qb
        FROM q a JOIN q b
          ON b.vec_id = a.vec_id + 1 AND a.vec_id % 2 = 0),
    dd AS (SELECT va, vb,
               (SELECT sum((qa[i] - qb[i]) * (qa[i] - qb[i]))
                FROM idx) AS d2o,
               (SELECT sum(zj * zj) FROM (
                   SELECT r.j, sum((qa[r.i] - qb[r.i]) * r.s) AS zj
                   FROM r GROUP BY r.j)) AS d2p
           FROM pairs)
    SELECT CAST(va AS BIGINT) AS vec_a, CAST(vb AS BIGINT) AS vec_b,
           CAST(d2o AS BIGINT) AS d2_orig,
           CAST(d2p AS BIGINT) AS d2_proj,
           CASE WHEN d2o = 0 THEN 0.0
                ELSE round(d2p / ({k} * d2o), 6) END AS jl_ratio
    FROM dd ORDER BY vec_a"""

QUERIES = {
    'emb_cka': emb_cka,
    'emb_closest_pair': emb_closest_pair,
    'emb_lof': emb_lof,
    'emb_kmedoids': emb_kmedoids,
    'emb_jl_distortion': emb_jl_distortion,
    'emb_label_centroids': emb_label_centroids,
    'emb_kmeans': emb_kmeans,
    'emb_mutual_nn': emb_mutual_nn,
    'emb_centroid_drift': emb_centroid_drift,
    'emb_quantization_error': emb_quantization_error,
    'emb_procrustes': emb_procrustes,
    'emb_mrr': emb_mrr,
    'emb_kcenter_select': emb_kcenter_select,
    'emb_principal_direction': emb_principal_direction,
    'emb_ndcg': emb_ndcg,
    'emb_ivf_recall': emb_ivf_recall,
    'emb_knn_predict': emb_knn_predict,
    'emb_pq_topk': emb_pq_topk,
    'emb_near_dups': emb_near_dups,
    'emb_near_dups_lsh': emb_near_dups_lsh,
    'emb_semdedup': emb_semdedup,
    'emb_label_counts': emb_label_counts,
    'emb_dim_stats': emb_dim_stats,
    'emb_pca': emb_pca,
    'emb_knn_graph': emb_knn_graph,
    'emb_hard_negatives': emb_hard_negatives,
    'emb_label_outliers': emb_label_outliers,
    'emb_triplets': emb_triplets,
    'emb_label_prop': emb_label_prop,
    'emb_hamming_topk': emb_hamming_topk,
    'emb_map10': emb_map10,
    'emb_mmr_select': emb_mmr_select,
}

ORACLES = {
    'emb_label_centroids': """
            WITH e AS (
                SELECT label, unnest(embedding) AS v,
                       generate_subscripts(embedding, 1) - 1 AS dim
                FROM embeddings
            )
            SELECT CAST(label AS BIGINT) AS label,
                   CAST(dim AS BIGINT) AS dim,
                   round(avg(CAST(v AS DOUBLE)), 6) AS centroid
            FROM e GROUP BY 1, 2 ORDER BY 1, 2
        """,
    'emb_quantization_error': """
            WITH s AS (
                SELECT max(list_aggregate(list_transform(embedding,
                    x -> abs(CAST(x AS DOUBLE))), 'max')) AS sc
                FROM embeddings),
            r AS (
                SELECT label, len(embedding) AS d,
                       list_sum(list_transform(embedding, x ->
                           pow(CAST(x AS DOUBLE)
                               - round(CAST(x AS DOUBLE)
                                       / sc * 127.0)
                                 / 127.0 * sc,
                               2))) AS se
                FROM embeddings, s)
            SELECT CAST(label AS BIGINT) AS label,
                   CAST(count(*) AS BIGINT) AS n,
                   round(sum(se) / (count(*) * max(d)), 12) AS mse
            FROM r GROUP BY label ORDER BY label
        """,
    'emb_centroid_drift': """
            WITH d AS (
                SELECT label, vec_id % 2 AS half, i,
                       avg(embedding[i]) AS mu
                FROM embeddings,
                     LATERAL (SELECT unnest(range(1,
                         len(embedding) + 1)) AS i) t
                GROUP BY label, vec_id % 2, i),
            n AS (
                SELECT label, vec_id % 2 AS half, count(*) AS n
                FROM embeddings GROUP BY label, vec_id % 2),
            p AS (
                SELECT a.label,
                       sum(a.mu * b.mu) AS ab,
                       sum(a.mu * a.mu) AS aa,
                       sum(b.mu * b.mu) AS bb
                FROM d a JOIN d b
                  ON a.label = b.label AND a.i = b.i
                 AND a.half = 0 AND b.half = 1
                GROUP BY a.label)
            SELECT p.label,
                   CAST(ne.n AS BIGINT) AS n_even,
                   CAST(no.n AS BIGINT) AS n_odd,
                   round(ab / sqrt(aa * bb), 6) AS centroid_cosine
            FROM p
            JOIN n ne ON ne.label = p.label AND ne.half = 0
            JOIN n no ON no.label = p.label AND no.half = 1
            ORDER BY p.label
        """,
    'emb_mutual_nn': """
            WITH nn AS (
                SELECT src, dst FROM (
                    SELECT q.vec_id AS src, e.vec_id AS dst,
                           row_number() OVER (
                               PARTITION BY q.vec_id
                               ORDER BY list_cosine_similarity(
                                   e.embedding, q.embedding) DESC,
                                        e.vec_id) AS rk
                    FROM embeddings q CROSS JOIN embeddings e
                    WHERE e.vec_id <> q.vec_id
                ) WHERE rk = 1)
            SELECT a.src AS vec_a, a.dst AS vec_b
            FROM nn a JOIN nn b
              ON b.src = a.dst AND b.dst = a.src
            WHERE a.src < a.dst
            ORDER BY vec_a
        """,
    'emb_near_dups': """
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.95
            ORDER BY vec_a, vec_b
        """,
    'emb_ndcg': """
            WITH nn AS (
                SELECT q.vec_id AS qv, q.label AS ql,
                       e.label AS el,
                       row_number() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY list_cosine_similarity(
                               e.embedding, q.embedding) DESC,
                                    e.vec_id) AS rk
                FROM embeddings q JOIN embeddings e
                     ON e.vec_id <> q.vec_id),
            dcg AS (
                SELECT qv,
                       sum(CASE WHEN el = ql
                                THEN 1.0 / log2(CAST(rk AS DOUBLE)
                                                + 1.0)
                                ELSE 0.0 END) AS dcg
                FROM nn WHERE rk <= 10 GROUP BY qv),
            labcnt AS (
                SELECT label, count(*) AS c
                FROM embeddings GROUP BY label),
            idcg AS (
                SELECT l.label,
                       sum(1.0 / log2(CAST(r.g AS DOUBLE) + 1.0))
                           AS idcg
                FROM labcnt l,
                     LATERAL (SELECT unnest(range(1,
                         CAST(least(10, l.c - 1) AS BIGINT) + 1))
                         AS g) r
                GROUP BY l.label),
            nd AS (
                SELECT a.label,
                       coalesce(dcg.dcg, 0.0) / idcg.idcg AS ndcg
                FROM embeddings a
                LEFT JOIN dcg ON dcg.qv = a.vec_id
                JOIN idcg ON idcg.label = a.label)
            SELECT CAST(label AS BIGINT) AS label,
                   count(*) AS n_queries,
                   round(sum(ndcg) / count(*), 6) AS ndcg
            FROM nd GROUP BY label ORDER BY label
        """,
    'emb_mrr': """
            WITH nn AS (
                SELECT q.vec_id AS qv, q.label AS ql,
                       e.label AS el,
                       row_number() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY list_cosine_similarity(
                               e.embedding, q.embedding) DESC,
                                    e.vec_id) AS rk
                FROM embeddings q JOIN embeddings e
                     ON e.vec_id <> q.vec_id),
            hit AS (
                SELECT qv, min(rk) AS mrk
                FROM nn WHERE rk <= 10 AND el = ql GROUP BY qv),
            rr AS (
                SELECT a.label AS ql,
                       coalesce(CAST(1 AS DOUBLE) / hit.mrk,
                                CAST(0 AS DOUBLE)) AS rr
                FROM embeddings a LEFT JOIN hit ON hit.qv = a.vec_id)
            SELECT CAST(ql AS BIGINT) AS label,
                   count(*) AS n_queries,
                   round(sum(rr) / count(*), 6) AS mrr
            FROM rr GROUP BY ql ORDER BY label
        """,
    'emb_knn_predict': """
            WITH nn AS (
                SELECT query_idx, vec_id FROM (
                    SELECT q.vec_id AS query_idx, e.vec_id AS vec_id,
                           row_number() OVER (
                               PARTITION BY q.vec_id
                               ORDER BY list_cosine_similarity(
                                   e.embedding, q.embedding) DESC,
                                        e.vec_id) AS rk
                    FROM embeddings q CROSS JOIN embeddings e
                    WHERE q.vec_id < 3 AND e.vec_id <> q.vec_id
                ) WHERE rk <= 5),
            votes AS (
                SELECT nn.query_idx, e.label, count(*) AS n
                FROM nn JOIN embeddings e ON e.vec_id = nn.vec_id
                GROUP BY nn.query_idx, e.label),
            best AS (
                SELECT query_idx, label AS pred_label,
                       CAST(n AS BIGINT) AS n_votes,
                       row_number() OVER (PARTITION BY query_idx
                           ORDER BY n DESC, label) AS rk
                FROM votes)
            SELECT query_idx, pred_label, n_votes
            FROM best WHERE rk = 1 ORDER BY query_idx
        """,
    'emb_label_counts': """
            SELECT label, count(*) AS n FROM embeddings
            GROUP BY label ORDER BY label
        """,
    'emb_dim_stats': """
            SELECT i - 1 AS dim,
                   round(avg(embedding[i]), 6) AS mean,
                   round(var_samp(embedding[i]), 6) AS var
            FROM embeddings,
                 LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS i) t
            GROUP BY i ORDER BY dim
        """,
    'emb_label_prop': """
            WITH knn AS MATERIALIZED (
                SELECT src, dst FROM (
                    SELECT q.vec_id AS src, e.vec_id AS dst,
                           row_number() OVER (
                               PARTITION BY q.vec_id
                               ORDER BY list_cosine_similarity(
                                   e.embedding, q.embedding) DESC,
                                        e.vec_id) AS rk
                    FROM embeddings q CROSS JOIN embeddings e
                    WHERE e.vec_id <> q.vec_id
                ) WHERE rk <= 5),
            s0 AS (SELECT vec_id, CAST(label AS BIGINT) AS lab
                   FROM embeddings WHERE vec_id % 2 = 0),
            allv AS (SELECT vec_id FROM embeddings),
            v1 AS (SELECT k.src, s0.lab, count(*) AS c
                   FROM knn k JOIN s0 ON s0.vec_id = k.dst
                   GROUP BY k.src, s0.lab),
            p1 AS (SELECT src, lab FROM (
                       SELECT src, lab, row_number() OVER (
                           PARTITION BY src
                           ORDER BY c DESC, lab) AS rk FROM v1)
                   WHERE rk = 1),
            l1 AS (SELECT a.vec_id,
                          coalesce(s0.lab, p1.lab, -1) AS lab
                   FROM allv a
                   LEFT JOIN s0 ON s0.vec_id = a.vec_id
                   LEFT JOIN p1 ON p1.src = a.vec_id),
            v2 AS (SELECT k.src, l1.lab, count(*) AS c
                   FROM knn k JOIN l1 ON l1.vec_id = k.dst
                   WHERE l1.lab <> -1
                   GROUP BY k.src, l1.lab),
            p2 AS (SELECT src, lab FROM (
                       SELECT src, lab, row_number() OVER (
                           PARTITION BY src
                           ORDER BY c DESC, lab) AS rk FROM v2)
                   WHERE rk = 1)
            SELECT a.vec_id,
                   CAST(coalesce(s0.lab, p2.lab, -1) AS BIGINT)
                       AS label_pred
            FROM allv a
            LEFT JOIN s0 ON s0.vec_id = a.vec_id
            LEFT JOIN p2 ON p2.src = a.vec_id
            ORDER BY a.vec_id
        """,
    'emb_triplets': """
            WITH pos AS MATERIALIZED (
                SELECT anchor, pos FROM (
                    SELECT a.vec_id AS anchor, p.vec_id AS pos,
                           row_number() OVER (
                               PARTITION BY a.vec_id
                               ORDER BY CAST('0x' || substr(md5(
                                   a.vec_id || ':' || p.vec_id), 1, 16)
                                   AS UBIGINT), p.vec_id) AS rk
                    FROM embeddings a JOIN embeddings p
                      ON p.label = a.label AND p.vec_id <> a.vec_id)
                WHERE rk = 1),
            neg AS MATERIALIZED (
                SELECT anchor, neg FROM (
                    SELECT q.vec_id AS anchor, e.vec_id AS neg,
                           row_number() OVER (
                               PARTITION BY q.vec_id
                               ORDER BY list_cosine_similarity(
                                   e.embedding, q.embedding) DESC,
                                        e.vec_id) AS rk
                    FROM embeddings q JOIN embeddings e
                      ON e.label <> q.label)
                WHERE rk = 1)
            SELECT anchor, pos, neg
            FROM pos JOIN neg USING (anchor)
            ORDER BY anchor
        """,
    'emb_hard_negatives': """
            SELECT src, dst FROM (
                SELECT q.vec_id AS src, e.vec_id AS dst,
                       row_number() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY list_cosine_similarity(
                               e.embedding, q.embedding) DESC,
                                    e.vec_id) AS rk
                FROM embeddings q JOIN embeddings e
                  ON e.label <> q.label
            ) WHERE rk <= 5 ORDER BY src, dst
        """,
    'emb_label_outliers': """
            WITH e AS (
                SELECT label, unnest(embedding) AS v,
                       generate_subscripts(embedding, 1) - 1 AS dim
                FROM embeddings),
            c AS MATERIALIZED (
                SELECT label, list(round(av, 6) ORDER BY dim)
                           AS centroid
                FROM (SELECT label, dim, avg(CAST(v AS DOUBLE)) AS av
                      FROM e GROUP BY 1, 2)
                GROUP BY label),
            d AS MATERIALIZED (
                SELECT vec_id, emb.label,
                       list_cosine_similarity(
                           CAST(embedding AS DOUBLE[]), centroid)
                           AS cos_sim,
                       count(*) OVER (PARTITION BY emb.label) AS n,
                       row_number() OVER (PARTITION BY emb.label
                           ORDER BY list_cosine_similarity(
                               CAST(embedding AS DOUBLE[]), centroid),
                                    vec_id) AS rk
                FROM embeddings emb JOIN c USING (label))
            SELECT CAST(label AS BIGINT) AS label, vec_id,
                   round(cos_sim, 6) AS cos_sim
            FROM d WHERE rk <= ceil(0.05 * n)
            ORDER BY label, vec_id
        """,
    'emb_knn_graph': """
            SELECT src, dst FROM (
                SELECT q.vec_id AS src, e.vec_id AS dst,
                       row_number() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY list_cosine_similarity(
                               e.embedding, q.embedding) DESC,
                                    e.vec_id) AS rk
                FROM embeddings q CROSS JOIN embeddings e
                WHERE e.vec_id <> q.vec_id
            ) WHERE rk <= 5 ORDER BY src, dst
        """,
}
ORACLE_REGISTRY.update(ORACLES)
ORACLES['emb_map10'] = ORACLE_REGISTRY['emb_map10'] = """
        WITH nn AS (
            SELECT q.vec_id AS qv, q.label AS ql, e.label AS el,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_cosine_similarity(
                           e.embedding, q.embedding) DESC,
                                e.vec_id) AS rk
            FROM embeddings q JOIN embeddings e
                 ON e.vec_id <> q.vec_id),
        h AS (
            SELECT qv, rk,
                   row_number() OVER (
                       PARTITION BY qv ORDER BY rk) AS hit_idx
            FROM nn WHERE rk <= 10 AND el = ql),
        s AS (
            SELECT qv, sum(hit_idx * (2520 // rk)) AS sc
            FROM h GROUP BY qv),
        rel AS (SELECT label, count(*) AS n
                FROM embeddings GROUP BY label),
        perq AS (
            SELECT a.label AS ql,
                   coalesce(s.sc, 0)
                   * (2520 // least(rel.n - 1, 10)) AS qsc
            FROM embeddings a JOIN rel ON rel.label = a.label
            LEFT JOIN s ON s.qv = a.vec_id
            WHERE rel.n > 1)
        SELECT CAST(ql AS BIGINT) AS label,
               count(*) AS n_queries,
               CAST(sum(qsc) AS BIGINT) AS ap_num,
               round(CAST(sum(qsc) AS DOUBLE)
                     / (2520.0 * 2520.0 * count(*)), 6) AS map10
        FROM perq GROUP BY ql ORDER BY label"""
ORACLES['emb_hamming_topk'] = ORACLE_REGISTRY['emb_hamming_topk'] = """
        WITH q AS (SELECT vec_id AS qid, embedding AS qe
                   FROM embeddings WHERE vec_id < 3),
        ham AS (
            SELECT q.qid, e.vec_id,
                   len(list_filter(range(1, 65),
                       i -> (q.qe[i] > 0) <> (e.embedding[i] > 0)))
                       AS hamming,
                   list_cosine_similarity(e.embedding, q.qe) AS cos
            FROM q CROSS JOIN embeddings e),
        short AS (
            SELECT *, row_number() OVER (
                PARTITION BY qid ORDER BY hamming, vec_id) AS hrk
            FROM ham),
        rer AS (
            SELECT qid, vec_id, hamming, row_number() OVER (
                PARTITION BY qid ORDER BY cos DESC, vec_id) AS rk
            FROM short WHERE hrk <= 50)
        SELECT CAST(qid AS BIGINT) AS query_idx,
               CAST(vec_id AS BIGINT) AS vec_id,
               CAST(hamming AS BIGINT) AS hamming
        FROM rer WHERE rk <= 5 ORDER BY query_idx, vec_id"""
ORACLES['emb_kcenter_select'] = ORACLE_REGISTRY['emb_kcenter_select'] = _kcenter_oracle_sql(k=6, dim=64)
ORACLES['emb_cka'] = ORACLE_REGISTRY['emb_cka'] = _cka_oracle_sql(dim=64)
ORACLES['emb_closest_pair'] = ORACLE_REGISTRY['emb_closest_pair'] = _CLOSEST_PAIR_ORACLE_SQL
ORACLES['emb_lof'] = ORACLE_REGISTRY['emb_lof'] = _LOF_ORACLE_SQL
ORACLES['emb_kmedoids'] = ORACLE_REGISTRY['emb_kmedoids'] = _kmedoids_oracle_sql(k=4, iters=4)
ORACLES['emb_jl_distortion'] = ORACLE_REGISTRY['emb_jl_distortion'] = _jl_distortion_oracle_sql(
        k=8, dim=64)
ORACLES['emb_principal_direction'] = ORACLE_REGISTRY['emb_principal_direction'] = _principal_direction_oracle_sql(iters=16, scale=10_000,
                                        dim=64)
