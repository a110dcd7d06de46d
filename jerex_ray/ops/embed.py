"""Embedding-column analytics: grouped centroids and distributed
k-means (Lloyd '82). These are the training half of the IVF ANN path
(``ops/ann.py``) made first-class.

Scale shape: vectors NEVER ride a shuffle. Each pass is one streaming
``map_batches`` that reduces a batch to (groups × dims) partial sums —
a metadata-sized block — and the only aggregation is over those
partials. Centroids broadcast once per iteration via ``ray.put``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _matrix(col) -> np.ndarray:
    return np.asarray([np.asarray(v, dtype=np.float64) for v in col])


def label_centroids(emb_ds, *, label_col: str = "label",
                    vec_col: str = "embedding",
                    decimals: int = 6) -> pd.DataFrame:
    """Mean vector per label, flattened to (label, dim, centroid) rows.

    One ``map_batches`` emits per-batch partial sums and counts as flat
    (label, dim, s, c) rows — bounded by labels × dims per batch — and
    a driver-side groupby over that tiny frame finishes. Rounded to
    ``decimals`` on both engine and oracle sides: distributed summation
    order makes the last float bits non-deterministic."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        labels = batch[label_col].to_numpy()
        mat = _matrix(batch[vec_col])
        if mat.size == 0:
            return pd.DataFrame({"label": pd.Series(dtype="int64"),
                                 "dim": pd.Series(dtype="int64"),
                                 "s": pd.Series(dtype="float64"),
                                 "c": pd.Series(dtype="int64")})
        uniq, inv = np.unique(labels, return_inverse=True)
        dims = mat.shape[1]
        sums = np.zeros((len(uniq), dims), dtype=np.float64)
        np.add.at(sums, inv, mat)
        counts = np.bincount(inv, minlength=len(uniq))
        return pd.DataFrame({
            "label": np.repeat(uniq.astype(np.int64), dims),
            "dim": np.tile(np.arange(dims, dtype=np.int64), len(uniq)),
            "s": sums.ravel(),
            "c": np.repeat(counts.astype(np.int64), dims)})

    parts = emb_ds.map_batches(partial, batch_format="pandas",
                               batch_size=4096).to_pandas()
    if parts.empty:
        return pd.DataFrame({"label": pd.Series(dtype="int64"),
                             "dim": pd.Series(dtype="int64"),
                             "centroid": pd.Series(dtype="float64")})
    agg = parts.groupby(["label", "dim"], sort=True).agg(
        s=("s", "sum"), c=("c", "sum")).reset_index()
    agg["centroid"] = (agg["s"] / agg["c"]).round(decimals)
    return agg[["label", "dim", "centroid"]].reset_index(drop=True)


def kmeans(emb_ds, *, k: int = 8, iters: int = 10,
           vec_col: str = "embedding", id_col: str = "vec_id"):
    """Distributed Lloyd's k-means over an embedding column.

    Deterministic: initial centroids are the vectors of the ``k``
    smallest ``id_col`` values (collected via a metadata-cheap sorted
    ``limit(k)``), iterations are exact data-parallel reduces. Each
    iteration is ONE streaming pass: assign each batch's vectors to the
    nearest broadcast centroid (one matmul), emit per-cluster partial
    sums (k × dims rows per batch) plus the batch inertia; the driver
    folds the partials — O(k·d·#batches) — and re-broadcasts. Empty
    clusters keep their previous centroid (standard Lloyd treatment).

    Returns ``(assign_ds, history)``: a Dataset of (vec_id, cluster)
    produced by one final streaming pass, and the per-iteration
    inertia list (monotonically non-increasing — the Lloyd invariant,
    pytest-gated)."""
    import ray

    first = emb_ds.sort(id_col).limit(k).to_pandas()
    cents = _matrix(first[vec_col])
    if len(cents) == 0:
        raise ValueError("kmeans on an empty dataset")
    history: list[float] = []

    for _ in range(iters):
        ref = ray.put(cents)

        def partial(batch: pd.DataFrame, _ref=ref) -> pd.DataFrame:
            C = ray.get(_ref)
            mat = _matrix(batch[vec_col])
            if mat.size == 0:
                return pd.DataFrame({"cluster": pd.Series(dtype="int64"),
                                     "dim": pd.Series(dtype="int64"),
                                     "s": pd.Series(dtype="float64"),
                                     "c": pd.Series(dtype="int64"),
                                     "inertia": pd.Series(dtype="float64")})
            # ||x-c||² = ||x||² - 2x·c + ||c||²; argmin over c
            d2 = (np.einsum("ij,ij->i", mat, mat)[:, None]
                  - 2.0 * (mat @ C.T)
                  + np.einsum("ij,ij->i", C, C)[None, :])
            a = d2.argmin(axis=1)
            inertia = float(np.maximum(d2[np.arange(len(mat)), a], 0).sum())
            dims = mat.shape[1]
            sums = np.zeros((len(C), dims), dtype=np.float64)
            np.add.at(sums, a, mat)
            counts = np.bincount(a, minlength=len(C))
            out = pd.DataFrame({
                "cluster": np.repeat(np.arange(len(C), dtype=np.int64),
                                     dims),
                "dim": np.tile(np.arange(dims, dtype=np.int64), len(C)),
                "s": sums.ravel(),
                "c": np.repeat(counts.astype(np.int64), dims),
                "inertia": np.zeros(len(C) * dims)})
            out.loc[0, "inertia"] = inertia
            return out

        parts = emb_ds.map_batches(partial, batch_format="pandas",
                                   batch_size=4096).to_pandas()
        history.append(float(parts["inertia"].sum()))
        agg = parts.groupby(["cluster", "dim"], sort=True).agg(
            s=("s", "sum"), c=("c", "sum")).reset_index()
        grid = agg.pivot(index="cluster", columns="dim")
        sums = grid["s"].to_numpy(np.float64)
        counts = grid["c"].to_numpy(np.int64)[:, 0]
        nonempty = counts > 0
        cents = cents.copy()
        cents[nonempty] = sums[nonempty] / counts[nonempty, None]

    final_ref = ray.put(cents)

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        C = ray.get(final_ref)
        mat = _matrix(batch[vec_col])
        if mat.size == 0:
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "cluster": pd.Series(dtype="int64")})
        d2 = (np.einsum("ij,ij->i", mat, mat)[:, None]
              - 2.0 * (mat @ C.T)
              + np.einsum("ij,ij->i", C, C)[None, :])
        return pd.DataFrame({
            id_col: batch[id_col].astype("int64").to_numpy(),
            "cluster": d2.argmin(axis=1).astype(np.int64)})

    assign_ds = emb_ds.map_batches(assign, batch_format="pandas",
                                   batch_size=4096)
    return assign_ds, history


# --- distributed moments + PCA ---

def _moment_partials(emb_ds, vec_col: str):
    """One streaming pass reducing each batch to (n, Σx, XᵀX) — the
    sufficient statistics for mean/covariance/PCA. Partials are
    (1 + d + d²) floats per batch regardless of batch size, so a
    100 TB embedding table reduces to a driver-sized frame."""
    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        mat = _matrix(batch[vec_col])
        if mat.size == 0:
            return pd.DataFrame({"n": pd.Series(dtype="int64"),
                                 "s": pd.Series(dtype="object"),
                                 "xtx": pd.Series(dtype="object")})
        return pd.DataFrame({"n": [np.int64(mat.shape[0])],
                             "s": [mat.sum(axis=0)],
                             "xtx": [(mat.T @ mat).ravel()]})

    parts = emb_ds.map_batches(partial, batch_format="pandas",
                               batch_size=4096).to_pandas()
    if parts.empty:
        return 0, None, None
    n = int(parts["n"].sum())
    s = np.sum([np.asarray(v) for v in parts["s"]], axis=0)
    xtx_flat = np.sum([np.asarray(v) for v in parts["xtx"]], axis=0)
    d = s.size
    return n, s, xtx_flat.reshape(d, d)


def dim_stats(emb_ds, *, vec_col: str = "embedding",
              decimals: int = 6) -> pd.DataFrame:
    """Per-dimension mean and sample variance from the one-pass
    sufficient statistics — SQL-oracled against DuckDB
    avg/var_samp over the unnested vector elements."""
    n, s, xtx = _moment_partials(emb_ds, vec_col)
    if n == 0:
        return pd.DataFrame({"dim": pd.Series(dtype="int64"),
                             "mean": pd.Series(dtype="float64"),
                             "var": pd.Series(dtype="float64")})
    mean = s / n
    var = (np.diag(xtx) - n * mean * mean) / max(n - 1, 1)
    return pd.DataFrame({"dim": np.arange(s.size, dtype=np.int64),
                         "mean": np.round(mean, decimals),
                         "var": np.round(var, decimals)})


def pca_fit(emb_ds, *, k: int = 8, vec_col: str = "embedding"):
    """Principal components from the same one-pass moments: the d×d
    covariance eigendecomposition runs on the driver (d is the
    embedding width — tiny), mirroring how k-means keeps centroids
    driver-side while vectors stream. Eigenvector signs are fixed so
    each component's largest-|coefficient| entry is positive
    (deterministic across LAPACK builds). Returns (mean, components
    [k×d], explained_variance [k])."""
    n, s, xtx = _moment_partials(emb_ds, vec_col)
    if n == 0:
        raise ValueError("pca_fit: empty dataset")
    mean = s / n
    cov = (xtx - n * np.outer(mean, mean)) / max(n - 1, 1)
    w, v = np.linalg.eigh(cov)          # ascending eigenvalues
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T               # (k, d)
    flip = np.sign(comps[np.arange(len(comps)),
                         np.abs(comps).argmax(axis=1)])
    comps = comps * flip[:, None]
    return mean, comps, w[order]


def pca_project(emb_ds, mean: np.ndarray, comps: np.ndarray, *,
                id_col: str = "vec_id", vec_col: str = "embedding",
                decimals: int = 6):
    """Project every vector onto the fitted components in one
    streaming ``map_batches`` (mean/components ride the closure →
    object store once, not per batch). Returns a Dataset of
    (id, proj list<double>)."""
    def project(batch: pd.DataFrame) -> pd.DataFrame:
        mat = _matrix(batch[vec_col])
        if mat.size == 0:
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "proj": pd.Series(dtype="object")})
        proj = np.round((mat - mean) @ comps.T, decimals)
        return pd.DataFrame({id_col: batch[id_col].to_numpy(),
                             "proj": list(proj)})

    return emb_ds.map_batches(project, batch_format="pandas",
                              batch_size=4096)


def semdedup(emb_ds, *, k: int = 8, threshold: float = 0.95,
             iters: int = 6, vec_col: str = "embedding",
             id_col: str = "vec_id",
             num_partitions: int | None = None):
    """SemDeDup (Abbas et al. '23, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): k-means clusters
    the embedding space, then ONLY within-cluster cosine pairs are
    checked — all-pairs work drops from O(N²) to Σ|cluster|², the
    paper's entire point. Losers (cosine ≥ threshold to a
    smaller-id cluster-mate) are dropped; returns the surviving ids
    as a Dataset of (vec_id, cluster).

    Dataflow: the existing distributed Lloyd's assigns clusters; the
    (id, cluster, normalized vector) rows hash-co-locate by cluster;
    each cluster resolves its survivors with one vectorized gram
    matrix. Partitioning assumption (documented, standard for
    SemDeDup): a single semantic cluster fits one worker's memory —
    at web scale k is chosen ~N/50k to bound cluster sizes."""
    from jerex_ray.functions.aggregate import grouped_apply

    assign_ds, _ = kmeans(emb_ds, k=k, iters=iters,
                          vec_col=vec_col, id_col=id_col)
    # attach the normalized vector to its assignment (co-located join
    # on vec_id; both sides corpus-sized)
    import ray

    def norm_rows(batch: pd.DataFrame) -> pd.DataFrame:
        mat = _matrix(batch[vec_col])
        if mat.size:
            mat = mat / np.clip(np.linalg.norm(mat, axis=1,
                                               keepdims=True),
                                1e-12, None)
        return pd.DataFrame({id_col: batch[id_col].to_numpy(),
                             "nvec": [v.astype(np.float32).tobytes()
                                      for v in mat]})

    vec_rows = emb_ds.map_batches(norm_rows, batch_format="pandas",
                                  batch_size=4096).materialize()
    joined = assign_ds.materialize().join(
        vec_rows, join_type="inner", num_partitions=8,
        on=(id_col,), right_on=(id_col,))

    def prune(block: pd.DataFrame) -> pd.DataFrame:
        out_ids, out_cl = [], []
        for cl, sub in block.groupby("cluster", sort=False):
            sub = sub.sort_values(id_col)
            ids = sub[id_col].to_numpy()
            mat = np.stack([np.frombuffer(b, dtype=np.float32)
                            for b in sub["nvec"]]).astype(np.float64)
            sims = mat @ mat.T
            # loser: similar (>= threshold) to ANY smaller-id mate
            tri = np.triu(sims >= threshold, k=1)
            loser = tri.any(axis=0)
            out_ids.append(ids[~loser])
            out_cl.append(np.full((~loser).sum(), cl, dtype=np.int64))
        if not out_ids:
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "cluster": pd.Series(dtype="int64")})
        return pd.DataFrame({id_col: np.concatenate(out_ids),
                             "cluster": np.concatenate(out_cl)})

    return grouped_apply(joined, ["cluster"], prune,
                         num_partitions=num_partitions)


def procrustes_align(pairs_ds, *, x_col: str = "x", y_col: str = "y"):
    """Orthogonal Procrustes alignment (Schönemann '66): the rotation
    R = argmin_{RᵀR=I} ‖XR − Y‖_F between two PAIRED embedding
    spaces — the classic cross-model / cross-lingual embedding
    alignment step (Smith et al. '17 use exactly this SVD solution).

    Scale shape mirrors ``_moment_partials``: ONE streaming pass
    reduces each batch to (n, XᵀY, ‖X‖², ‖Y‖²) — d² + 2 floats per
    batch regardless of rows — the driver runs the d×d SVD (d = the
    embedding width, tiny) and R = UVᵀ. Returns
    (R, residual_sq, n) where residual_sq = ‖X‖² + ‖Y‖² − 2Σσᵢ is the
    optimal squared alignment error.
    """
    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        x = _matrix(batch[x_col])
        y = _matrix(batch[y_col])
        if x.size == 0:
            return pd.DataFrame({"n": pd.Series(dtype="int64"),
                                 "xty": pd.Series(dtype="object"),
                                 "ssx": pd.Series(dtype="float64"),
                                 "ssy": pd.Series(dtype="float64")})
        return pd.DataFrame({"n": [np.int64(x.shape[0])],
                             "xty": [(x.T @ y).ravel()],
                             "ssx": [float((x * x).sum())],
                             "ssy": [float((y * y).sum())]})

    parts = pairs_ds.map_batches(partial, batch_format="pandas",
                                 batch_size=4096).to_pandas()
    if parts.empty or int(parts["n"].sum()) == 0:
        return None, 0.0, 0
    n = int(parts["n"].sum())
    xty = np.sum([np.asarray(v) for v in parts["xty"]], axis=0)
    d = int(round(np.sqrt(xty.size)))
    u, s, vt = np.linalg.svd(xty.reshape(d, d))
    r = u @ vt
    residual = float(parts["ssx"].sum() + parts["ssy"].sum()
                     - 2.0 * s.sum())
    return r, residual, n


def closest_pair_sq(emb_ds, *, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> pd.DataFrame:
    """EXACT closest pair of the embedding cloud under squared
    Euclidean distance on the 3-decimal mirror-rounded integer grid
    (the ``emb_kcenter`` quantization) — the all-pairs-similarity
    certificate: every distance is an EXACT int64, so the
    (dist, vec_a, vec_b) argmin carries zero float hazard.

    Dataflow: the quantized matrix is broadcast ONCE (``ray.put``,
    the ann/brute-force contract); each block matmuls its rows
    against the columns with larger vec_id (id-ordered half-matrix,
    no duplicate pairs) and emits ONE per-block champion row; the
    driver reduces the #blocks-bounded partials under the same
    lexicographic rule. Exact closest pair is inherently all-pairs
    O(N²/2) compares — at corpus scale run it on LSH/semdedup
    candidate buckets (the scale path this repo ships); this is the
    exact small-side primitive those pipelines are verified against.
    """
    import ray

    full = emb_ds.to_pandas()
    if len(full) < 2:
        return pd.DataFrame({"vec_a": pd.Series(dtype="int64"),
                             "vec_b": pd.Series(dtype="int64"),
                             "dist_sq": pd.Series(dtype="int64")})
    ids = full[id_col].to_numpy(np.int64)
    m = np.stack(full[vec_col].to_numpy()).astype(np.float64)
    q = np.copysign(np.floor(np.abs(m) * 1000.0 + 0.5), m) \
        .astype(np.int64)
    ref = ray.put((ids, q))

    def block(batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"vec_a": pd.Series(dtype="int64"),
                              "vec_b": pd.Series(dtype="int64"),
                              "dist_sq": pd.Series(dtype="int64")})
        if batch.empty:
            return empty
        ids_all, q_all = ray.get(ref)
        mb = np.stack(batch[vec_col].to_numpy()).astype(np.float64)
        qb = np.copysign(np.floor(np.abs(mb) * 1000.0 + 0.5), mb) \
            .astype(np.int64)
        idb = batch[id_col].to_numpy(np.int64)
        aa = (qb * qb).sum(axis=1)[:, None]
        bb = (q_all * q_all).sum(axis=1)[None, :]
        d2 = aa + bb - 2 * (qb @ q_all.T)
        mask = idb[:, None] < ids_all[None, :]
        if not mask.any():
            return empty
        d2m = np.where(mask, d2, np.iinfo(np.int64).max)
        md = int(d2m.min())
        ii, jj = np.nonzero(d2m == md)
        va, vb = min(zip(idb[ii].tolist(), ids_all[jj].tolist()))
        return pd.DataFrame({"vec_a": np.array([va], dtype=np.int64),
                             "vec_b": np.array([vb], dtype=np.int64),
                             "dist_sq": np.array([md],
                                                 dtype=np.int64)})

    parts = emb_ds.map_batches(block, batch_format="pandas",
                               batch_size=4096).to_pandas()
    best = parts.sort_values(["dist_sq", "vec_a", "vec_b"]) \
        .reset_index(drop=True).iloc[[0]]
    return best[["vec_a", "vec_b", "dist_sq"]].reset_index(drop=True)


def lof_scores(emb_ds, *, k: int = 3, id_col: str = "vec_id",
               vec_col: str = "embedding") -> pd.DataFrame:
    """Local Outlier Factor (Breunig, Kriegel, Ng & Sander '00) of
    every vector under squared Euclidean distance on the 3-decimal
    mirror-rounded integer grid (the ``closest_pair_sq``
    quantization) — density-based outlier scoring, the anomaly audit
    an embedding-quality pass runs before training: LOF ≈ 1 means
    the point sits at its neighbors' density, LOF ≫ 1 flags an
    isolated (mis-embedded / contaminated) point.

    Exactness: distances, k-distances, reachability distances
    reach(p,o) = max(kdist(o), d²(p,o)) and their sums Σreach are
    ALL exact int64 on the grid; LOF_p = (Σ_o lrd_o/lrd_p)/k
    simplifies to (Σ_o rsum_p/rsum_o)/k, evaluated as the fixed-order
    k-term sum of single int/int divisions — bit-identical in the
    SQL oracle. Degenerate duplicate clusters (any Σreach = 0, i.e.
    ≥ k+1 coincident points) take LOF = 1.0 by convention on both
    engines.

    Dataflow: the quantized matrix broadcasts once (``ray.put``, the
    ann/brute-force contract); each block computes its rows' k
    nearest under the (d², id) lexicographic rule (stable argsort
    over id-ordered columns) and emits one kNN row per point; the
    reach/rsum/LOF joins run on the vector-count-bounded driver
    table. At corpus scale swap the brute-force kNN for the IVF/LSH
    kNN-graph path — the LOF algebra downstream is unchanged."""
    import ray

    cols = [f"n{i + 1}" for i in range(k)]
    empty = pd.DataFrame({
        "vec_id": pd.Series(dtype="int64"),
        **{c: pd.Series(dtype="int64") for c in cols},
        "kdist_sq": pd.Series(dtype="int64"),
        "rsum": pd.Series(dtype="int64"),
        "lof": pd.Series(dtype="float64")})
    full = emb_ds.to_pandas()
    if len(full) <= k:
        return empty
    full = full.sort_values(id_col).reset_index(drop=True)
    ids = full[id_col].to_numpy(np.int64)
    m = np.stack(full[vec_col].to_numpy()).astype(np.float64)
    q = np.copysign(np.floor(np.abs(m) * 1000.0 + 0.5), m) \
        .astype(np.int64)
    ref = ray.put((ids, q))

    def block(batch: pd.DataFrame) -> pd.DataFrame:
        if batch.empty:
            return empty[["vec_id", *cols, "kdist_sq"]].assign(
                **{f"d{i + 1}": pd.Series(dtype="int64")
                   for i in range(k)})
        ids_all, q_all = ray.get(ref)
        mb = np.stack(batch[vec_col].to_numpy()).astype(np.float64)
        qb = np.copysign(np.floor(np.abs(mb) * 1000.0 + 0.5), mb) \
            .astype(np.int64)
        idb = batch[id_col].to_numpy(np.int64)
        aa = (qb * qb).sum(axis=1)[:, None]
        bb = (q_all * q_all).sum(axis=1)[None, :]
        d2 = aa + bb - 2 * (qb @ q_all.T)
        d2[idb[:, None] == ids_all[None, :]] = np.iinfo(np.int64).max
        # columns are id-ascending ⇒ stable argsort = (d², id) lex
        nn = np.argsort(d2, axis=1, kind="stable")[:, :k]
        nd = np.take_along_axis(d2, nn, axis=1)
        out = {"vec_id": idb}
        for i in range(k):
            out[cols[i]] = ids_all[nn[:, i]]
            out[f"d{i + 1}"] = nd[:, i]
        out["kdist_sq"] = nd[:, k - 1]
        return pd.DataFrame(out)

    knn = emb_ds.map_batches(block, batch_format="pandas",
                             batch_size=2048).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    # N-bounded driver joins: reach(p,o) = max(kdist_o, d²_po)
    kdist = knn.set_index("vec_id")["kdist_sq"]
    rsum = np.zeros(len(knn), dtype=np.int64)
    for i in range(k):
        kd_o = kdist.reindex(knn[cols[i]]).to_numpy(np.int64)
        rsum += np.maximum(kd_o, knn[f"d{i + 1}"].to_numpy(np.int64))
    rs = pd.Series(rsum, index=knn["vec_id"].to_numpy())
    ro = np.stack([rs.reindex(knn[c]).to_numpy(np.int64)
                   for c in cols], axis=1)
    deg = (rsum == 0) | (ro == 0).any(axis=1)
    safe = np.where(ro == 0, 1, ro)
    acc = rsum / safe[:, 0]
    for i in range(1, k):
        acc = acc + rsum / safe[:, i]
    lof = np.where(deg, 1.0, acc / float(k))
    out = knn[["vec_id", *cols, "kdist_sq"]].copy()
    out["rsum"] = rsum
    out["lof"] = np.round(lof, 6)
    return out.reset_index(drop=True)


def kmedoids_voronoi(emb_ds, *, k: int = 4, iters: int = 4,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> pd.DataFrame:
    """k-medoids by Gonzalez farthest-first seeding + the Park–Jun
    ('09) Voronoi iteration, under squared Euclidean distance on the
    3-decimal mirror-rounded integer grid — the ROBUST clustering
    member beside ``kmeans`` (centers are real data points, so the
    result survives the outliers LOF flags, and the medoid is the
    natural cluster exemplar for curation). Exactness: every
    distance, within-cluster cost and argmin/argmax cut is EXACT
    int64 with (value, id) lexicographic tie rules — zero float
    anywhere — so a generated per-iteration SQL oracle replays
    seeding, every assignment and every medoid update bit-for-bit.

    Dataflow: quantized matrix broadcast once; each Voronoi
    iteration is ONE blocked map_batches pass in which a block
    assigns its rows AND accumulates their same-cluster distance
    sums against all columns (the closest-pair contract); the
    per-cluster (within, id) argmin is N-bounded driver work.
    Fixed ``iters`` rounds (cost is non-increasing; pytest-pinned).
    At corpus scale: seed on a uniform sample, assign via the
    ANN index, update medoids per LSH bucket — the algebra here is
    the exact small-side primitive those paths verify against."""
    import ray

    cols = {"vec_id": "int64", "medoid": "int64", "d2": "int64"}
    full = emb_ds.to_pandas()
    if len(full) < k:
        return pd.DataFrame({c: pd.Series(dtype=t)
                             for c, t in cols.items()})
    full = full.sort_values(id_col).reset_index(drop=True)
    ids = full[id_col].to_numpy(np.int64)
    m = np.stack(full[vec_col].to_numpy()).astype(np.float64)
    q = np.copysign(np.floor(np.abs(m) * 1000.0 + 0.5), m) \
        .astype(np.int64)
    sq = (q * q).sum(axis=1)

    def d2_to(j: int) -> np.ndarray:
        return sq + sq[j] - 2 * (q @ q[j])

    # Gonzalez seeding from the smallest id (ids ascending, so
    # argmax/argmin first-hit = smallest-id tie rule)
    med_pos = [0]
    dmin = d2_to(0)
    for _ in range(k - 1):
        nxt = int(np.argmax(dmin))
        med_pos.append(nxt)
        dmin = np.minimum(dmin, d2_to(nxt))
    med_ids = np.sort(ids[med_pos])

    pos_of = {int(u): i for i, u in enumerate(ids)}
    for _ in range(iters):
        ref = ray.put((ids, q, sq, med_ids))

        def passes(batch: pd.DataFrame) -> pd.DataFrame:
            if batch.empty:
                return pd.DataFrame({
                    "vec_id": pd.Series(dtype="int64"),
                    "medoid": pd.Series(dtype="int64"),
                    "within": pd.Series(dtype="int64")})
            ids_all, q_all, sq_all, meds = ray.get(ref)
            mp = np.searchsorted(ids_all, meds)
            dall = (sq_all[:, None] + sq_all[mp][None, :]
                    - 2 * (q_all @ q_all[mp].T))
            clu = np.argmin(dall, axis=1)      # first-min = smallest
            bids = batch["vec_id"].to_numpy(np.int64)
            bp = np.searchsorted(ids_all, bids)
            mb = q_all[bp]
            d2b = (sq_all[bp][:, None] + sq_all[None, :]
                   - 2 * (mb @ q_all.T))
            same = clu[bp][:, None] == clu[None, :]
            within = np.where(same, d2b, 0).sum(axis=1)
            return pd.DataFrame({
                "vec_id": bids, "medoid": meds[clu[bp]],
                "within": within})

        w = emb_ds.map_batches(passes, batch_format="pandas",
                               batch_size=2048).to_pandas() \
            .sort_values("vec_id").reset_index(drop=True)
        new = []
        for mid in med_ids:
            members = w[w["medoid"] == mid]
            if members.empty:          # degenerate: keep old medoid
                new.append(int(mid))
            else:
                best = members.sort_values(["within", "vec_id"]) \
                    .iloc[0]
                new.append(int(best["vec_id"]))
        med_ids = np.sort(np.array(new, dtype=np.int64))

    # final assignment from the converged medoids (N-bounded)
    mp = np.searchsorted(ids, med_ids)
    dall = sq[:, None] + sq[mp][None, :] - 2 * (q @ q[mp].T)
    clu = np.argmin(dall, axis=1)
    out = pd.DataFrame({
        "vec_id": ids, "medoid": med_ids[clu],
        "d2": dall[np.arange(len(ids)), clu]})
    return out.astype(cols)
