"""Similarity search over an embedding column (``list<float>``).

* ``brute_force_topk`` — exact cosine top-k: the query matrix is
  broadcast once (``ray.put``), each batch does one numpy matmul and
  emits only its local top-k per query (partial top-k combiner);
  the final reduce merges tiny partials. This is the baseline and the
  verification oracle.
* ``ivf_topk`` — the scale path: k-means-lite (hash-seeded centroids,
  a few Lloyd iterations on a sample) partitions vectors into coarse
  cells; queries probe the ``n_probe`` nearest cells only. Same
  interface, approximate recall.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import ray


def _as_matrix(col) -> np.ndarray:
    return np.stack(col.to_numpy()).astype(np.float32)


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.clip(np.linalg.norm(m, axis=1, keepdims=True), 1e-12, None)


def brute_force_topk(emb_ds, queries: np.ndarray, k: int = 10, *,
                     query_labels: np.ndarray | None = None) -> pd.DataFrame:
    """Exact cosine top-k of each query against the whole dataset.

    Returns (query_idx, vec_id, cosine) with k rows per query, ordered
    by descending cosine then vec_id (deterministic ties).

    ``query_labels`` (one int per query row) switches on hard-negative
    mining: dataset rows whose ``label`` equals the query's label are
    excluded from that query's candidates (contrastive-negative
    selection) — the mask costs one broadcast int vector and one
    boolean compare per batch, the scan stays a single pass."""
    qn = _normalize(np.asarray(queries, dtype=np.float32))
    q_ref = ray.put(qn)
    ql_ref = (ray.put(np.asarray(query_labels))
              if query_labels is not None else None)

    def local_topk(batch: pd.DataFrame) -> pd.DataFrame:
        q = ray.get(q_ref)
        vecs = _normalize(_as_matrix(batch["embedding"]))
        ids = batch["vec_id"].to_numpy()
        sims = q @ vecs.T                      # (Q, B)
        if ql_ref is not None:
            qlab = ray.get(ql_ref)
            blab = batch["label"].to_numpy()
            # same-label candidates sort past every real cosine (≥ -1)
            sims = np.where(qlab[:, None] == blab[None, :],
                            np.float32(-2.0), sims)
        kk = min(k, sims.shape[1])
        rows_q, rows_v, rows_c = [], [], []
        for qi in range(q.shape[0]):
            s = sims[qi]
            # exact boundary handling: find the k-th largest cosine,
            # take EVERY candidate at-or-above it (however many tie),
            # then resolve ties by (-cosine, vec_id) lexsort — the
            # globally-correct smallest-id winner always survives
            kth = np.partition(s, s.size - kk)[s.size - kk]
            ci = np.flatnonzero(s >= kth)
            order = np.lexsort((ids[ci], -s[ci]))[:kk]
            sel = ci[order]
            rows_q.append(np.full(kk, qi))
            rows_v.append(ids[sel])
            rows_c.append(s[sel].astype(np.float64))
        return pd.DataFrame({
            "query_idx": np.concatenate(rows_q),
            "vec_id": np.concatenate(rows_v),
            "cosine": np.concatenate(rows_c),
        })

    partials = emb_ds.map_batches(local_topk, batch_format="pandas",
                                  batch_size=4096).to_pandas()
    if ql_ref is not None:
        # a batch with fewer than k valid candidates pads with the
        # -2 sentinel; drop those before the final merge
        partials = partials[partials["cosine"] > -1.5]
    out = []
    for qi, g in partials.groupby("query_idx"):
        top = heapq.nsmallest(k, g.itertuples(index=False),
                              key=lambda r: (-r.cosine, r.vec_id))
        out.extend(top)
    res = pd.DataFrame(out, columns=["query_idx", "vec_id", "cosine"])
    return res.sort_values(["query_idx", "cosine", "vec_id"],
                           ascending=[True, False, True]).reset_index(drop=True)


def ivf_topk(emb_ds, queries: np.ndarray, k: int = 10, *,
             n_cells: int = 16, n_probe: int = 4, seed: int = 5,
             num_partitions: int | None = None) -> pd.DataFrame:
    """IVF-style approximate top-k: cluster vectors into coarse cells
    (trained on a sample), search only the n_probe closest cells."""
    from jerex_ray.runtime import shuffle_partitions

    sample = emb_ds.random_sample(
        min(1.0, 4096 / max(1, emb_ds.count())), seed=seed).to_pandas()
    if len(sample) == 0:
        return pd.DataFrame(columns=["query_idx", "vec_id", "cosine"])
    m = _normalize(_as_matrix(sample["embedding"]))
    rng = np.random.default_rng(seed)
    n_cells = min(n_cells, len(m))
    centroids = m[rng.choice(len(m), size=n_cells, replace=False)]
    for _ in range(5):                       # Lloyd iterations
        assign = (m @ centroids.T).argmax(axis=1)
        for c in range(n_cells):
            members = m[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = _normalize(centroids)
    cent_ref = ray.put(centroids)

    qn = _normalize(np.asarray(queries, dtype=np.float32))
    probe = np.argsort(-(qn @ centroids.T), axis=1)[:, :n_probe]   # (Q, P)
    probe_cells = [set(row) for row in probe]
    q_ref = ray.put((qn, probe_cells))

    def local(batch: pd.DataFrame) -> pd.DataFrame:
        cents = ray.get(cent_ref)
        q, cells_per_query = ray.get(q_ref)
        vecs = _normalize(_as_matrix(batch["embedding"]))
        ids = batch["vec_id"].to_numpy()
        cell = (vecs @ cents.T).argmax(axis=1)
        frames = []
        for qi in range(q.shape[0]):
            mask = np.isin(cell, list(cells_per_query[qi]))
            if not mask.any():
                continue
            sims = vecs[mask] @ q[qi]
            kk = min(k, sims.shape[0])
            idx = np.argpartition(-sims, kk - 1)[:kk]
            frames.append(pd.DataFrame({
                "query_idx": qi,
                "vec_id": ids[mask][idx],
                "cosine": sims[idx].astype(np.float64)}))
        if not frames:
            return pd.DataFrame({"query_idx": pd.Series(dtype="int64"),
                                 "vec_id": pd.Series(dtype="int64"),
                                 "cosine": pd.Series(dtype="float64")})
        return pd.concat(frames, ignore_index=True)

    partials = emb_ds.map_batches(local, batch_format="pandas",
                                  batch_size=4096).to_pandas()
    out = []
    for qi, g in partials.groupby("query_idx"):
        top = heapq.nsmallest(k, g.itertuples(index=False),
                              key=lambda r: (-r.cosine, r.vec_id))
        out.extend(top)
    res = pd.DataFrame(out, columns=["query_idx", "vec_id", "cosine"])
    return res.sort_values(["query_idx", "cosine", "vec_id"],
                           ascending=[True, False, True]).reset_index(drop=True)


# --- product quantization (Jégou/Douze/Schmid '11, "Product
# quantization for nearest neighbor search") ---
#
# The memory-scale path past IVF: vectors compress to m uint8 codes
# (64 float32 dims -> 8 bytes at m=8), so a 100 TB float corpus fits a
# ~3 TB code table that co-locates with the search tasks. Training
# runs Lloyd per subspace on a driver-side SAMPLE (standard PQ
# practice — codebooks are k·d floats, sample-trained); encoding and
# asymmetric-distance (ADC) search are streaming map_batches passes:
# each query precomputes an (m, k) lookup table once, a batch's
# distances are m gathers + a sum, and only per-block top-k partials
# reduce. Cosine ranking is preserved by normalizing both sides and
# searching squared L2 (monotone in cosine on the unit sphere).


def _lloyd(mat: np.ndarray, k: int, iters: int, rng) -> np.ndarray:
    cents = mat[rng.choice(len(mat), size=min(k, len(mat)),
                           replace=False)].copy()
    if len(cents) < k:     # tiny sample: pad with jittered repeats
        reps = cents[rng.integers(0, len(cents), size=k - len(cents))]
        cents = np.vstack([cents, reps + 1e-6 * rng.standard_normal(
            (k - len(cents), mat.shape[1]))])
    for _ in range(iters):
        d = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for j in range(k):
            sel = assign == j
            if sel.any():
                cents[j] = mat[sel].mean(axis=0)
    return cents


def pq_train(emb_ds, *, m: int = 8, k: int = 16, sample: int = 20000,
             iters: int = 10, seed: int = 7,
             vec_col: str = "embedding") -> np.ndarray:
    """Codebooks (m, k, d/m) from Lloyd per subspace over a sample.
    Vectors are normalized first (cosine contract)."""
    df = emb_ds.limit(sample).to_pandas()
    mat = _normalize(_as_matrix(df[vec_col]).astype(np.float64))
    d = mat.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    rng = np.random.default_rng(seed)
    return np.stack([_lloyd(mat[:, j * sub:(j + 1) * sub], k, iters, rng)
                     for j in range(m)])


def pq_encode(emb_ds, codebooks: np.ndarray, *, id_col: str = "vec_id",
              vec_col: str = "embedding"):
    """(id, codes uint8[m]) per vector — one streaming pass; the
    codebooks ride the closure into the object store once."""
    m, k, sub = codebooks.shape

    def encode(batch: pd.DataFrame) -> pd.DataFrame:
        mat = _normalize(_as_matrix(batch[vec_col]).astype(np.float64))
        codes = np.empty((len(mat), m), dtype=np.uint8)
        for j in range(m):
            x = mat[:, j * sub:(j + 1) * sub]
            d = ((x[:, None, :] - codebooks[j][None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = d.argmin(axis=1).astype(np.uint8)
        return pd.DataFrame({id_col: batch[id_col].to_numpy(),
                             "codes": list(codes)})

    return emb_ds.map_batches(encode, batch_format="pandas",
                              batch_size=4096)


def pq_topk(codes_ds, codebooks: np.ndarray, queries: np.ndarray,
            *, k: int = 10, id_col: str = "vec_id") -> pd.DataFrame:
    """ADC top-k: per-query (m, kc) LUT of squared subspace distances,
    batch distance = sum of m LUT gathers, per-block partial top-k,
    tiny final merge. Returns (query_idx, vec_id, adc_dist) ascending
    distance, ties by vec_id."""
    import heapq

    m, kc, sub = codebooks.shape
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    # LUT[q, j, c] = ||q_j - codebook[j, c]||²
    luts = np.stack([
        ((qn[:, j * sub:(j + 1) * sub][:, None, :]
          - codebooks[j][None, :, :]) ** 2).sum(axis=2)
        for j in range(m)], axis=1)                    # (Q, m, kc)
    lut_ref = ray.put(luts)

    def local_topk(batch: pd.DataFrame) -> pd.DataFrame:
        lut = ray.get(lut_ref)
        codes = np.stack(batch["codes"].to_numpy()).astype(np.int64)
        ids = batch[id_col].to_numpy()
        rows_q, rows_v, rows_d = [], [], []
        for qi in range(lut.shape[0]):
            dist = lut[qi][np.arange(m)[None, :], codes].sum(axis=1)
            kk = min(k, dist.size)
            kth = np.partition(dist, kk - 1)[kk - 1]
            ci = np.flatnonzero(dist <= kth)
            order = np.lexsort((ids[ci], dist[ci]))[:kk]
            sel = ci[order]
            rows_q.append(np.full(kk, qi))
            rows_v.append(ids[sel])
            rows_d.append(dist[sel])
        return pd.DataFrame({"query_idx": np.concatenate(rows_q),
                             "vec_id": np.concatenate(rows_v),
                             "adc_dist": np.concatenate(rows_d)})

    partials = codes_ds.map_batches(local_topk, batch_format="pandas",
                                    batch_size=8192).to_pandas()
    out = []
    for qi, g in partials.groupby("query_idx"):
        top = heapq.nsmallest(k, g.itertuples(index=False),
                              key=lambda r: (r.adc_dist, r.vec_id))
        out.extend(top)
    res = pd.DataFrame(out)
    return res.sort_values(["query_idx", "adc_dist", "vec_id"]) \
        .reset_index(drop=True)


# --- IVF-PQ with exact re-rank (Jégou et al. '11 §V: IVFADC) ---
#
# The composition the billion-scale systems actually deploy: a coarse
# IVF quantizer prunes the corpus to n_probe cells, PQ codes of the
# RESIDUAL (v − centroid(cell)) give 8-byte vectors inside cells, ADC
# scans the probed cells' codes, and the top candidate pool is
# re-ranked with exact cosine on the original vectors. Memory story at
# 100 TB: the float corpus is read ONCE to encode; search touches only
# the code table (~3 TB at m=8) plus a candidate-bounded exact gather.


def ivfpq_encode(emb_ds, *, n_cells: int = 16, m: int = 8, kc: int = 16,
                 sample: int = 20000, iters: int = 8, seed: int = 7,
                 id_col: str = "vec_id", vec_col: str = "embedding"):
    """Train coarse centroids + residual PQ codebooks on a sample,
    then one streaming encode pass. Returns (codes_ds, centroids,
    codebooks); codes_ds rows are (id, cell:int32, codes:uint8[m])."""
    df = emb_ds.limit(sample).to_pandas()
    mat = _normalize(_as_matrix(df[vec_col]).astype(np.float64))
    rng = np.random.default_rng(seed)
    n_cells = min(n_cells, len(mat))
    cents = _normalize(_lloyd(mat, n_cells, iters, rng))
    d = mat.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    resid = mat - cents[(mat @ cents.T).argmax(axis=1)]
    books = np.stack([_lloyd(resid[:, j * sub:(j + 1) * sub], kc,
                             iters, rng) for j in range(m)])
    cents_ref = ray.put(cents)
    books_ref = ray.put(books)

    def encode(batch: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(cents_ref)
        b = ray.get(books_ref)
        vecs = _normalize(_as_matrix(batch[vec_col]).astype(np.float64))
        cell = (vecs @ c.T).argmax(axis=1)
        r = vecs - c[cell]
        codes = np.empty((len(vecs), m), dtype=np.uint8)
        for j in range(m):
            x = r[:, j * sub:(j + 1) * sub]
            dj = ((x[:, None, :] - b[j][None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = dj.argmin(axis=1).astype(np.uint8)
        return pd.DataFrame({id_col: batch[id_col].to_numpy(),
                             "cell": cell.astype(np.int32),
                             "codes": list(codes)})

    codes_ds = emb_ds.map_batches(encode, batch_format="pandas",
                                  batch_size=4096)
    return codes_ds, cents, books


def ivfpq_topk(emb_ds, queries: np.ndarray, *, k: int = 10,
               n_cells: int = 16, n_probe: int = 4, m: int = 8,
               kc: int = 16, rerank: int = 4, seed: int = 7,
               id_col: str = "vec_id", vec_col: str = "embedding"
               ) -> pd.DataFrame:
    """IVF-ADC search + exact re-rank: probe the n_probe nearest
    cells, ADC-scan their codes (per-cell residual LUTs), pool
    ``k * rerank`` candidates per query, then ONE broadcast-filter
    pass gathers the candidates' float vectors for an exact cosine
    re-rank. Returns (query_idx, vec_id, cosine) — the cosines are
    exact; only recall is approximate."""
    import heapq

    codes_ds, cents, books = ivfpq_encode(
        emb_ds, n_cells=n_cells, m=m, kc=kc, seed=seed,
        id_col=id_col, vec_col=vec_col)
    codes_ds = codes_ds.materialize()     # encoded once, scanned once
    n_cells = len(cents)
    sub = books.shape[2]
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    probe = np.argsort(-(qn @ cents.T), axis=1)[:, :min(n_probe, n_cells)]
    # residual LUT per (query, probed cell): ||(q − c)_j − cb[j,·]||²
    Q, P = probe.shape
    luts = np.empty((Q, P, books.shape[0], kc))
    for qi in range(Q):
        for pi in range(P):
            r = qn[qi] - cents[probe[qi, pi]]
            for j in range(books.shape[0]):
                luts[qi, pi, j] = ((r[j * sub:(j + 1) * sub][None, :]
                                    - books[j]) ** 2).sum(axis=1)
    search_ref = ray.put((probe, luts))
    pool = k * rerank

    def local(batch: pd.DataFrame) -> pd.DataFrame:
        pr, lt = ray.get(search_ref)
        codes = np.stack(batch["codes"].to_numpy()).astype(np.int64)
        cell = batch["cell"].to_numpy()
        ids = batch[id_col].to_numpy()
        mm = codes.shape[1]
        rows_q, rows_v, rows_d = [], [], []
        for qi in range(pr.shape[0]):
            for pi, c in enumerate(pr[qi]):
                sel = np.flatnonzero(cell == c)
                if not sel.size:
                    continue
                dist = lt[qi, pi][np.arange(mm)[None, :],
                                  codes[sel]].sum(axis=1)
                kk = min(pool, dist.size)
                idx = np.argpartition(dist, kk - 1)[:kk]
                rows_q.append(np.full(kk, qi))
                rows_v.append(ids[sel][idx])
                rows_d.append(dist[idx])
        if not rows_q:
            return pd.DataFrame({"query_idx": pd.Series(dtype="int64"),
                                 "vec_id": pd.Series(dtype="int64"),
                                 "adc_dist": pd.Series(dtype="float64")})
        return pd.DataFrame({"query_idx": np.concatenate(rows_q),
                             "vec_id": np.concatenate(rows_v),
                             "adc_dist": np.concatenate(rows_d)})

    partials = codes_ds.map_batches(local, batch_format="pandas",
                                    batch_size=8192).to_pandas()
    cand: dict[int, set] = {}
    for qi, g in partials.groupby("query_idx"):
        top = heapq.nsmallest(pool, g.itertuples(index=False),
                              key=lambda r: (r.adc_dist, r.vec_id))
        cand[int(qi)] = {int(t.vec_id) for t in top}
    all_ids = set().union(*cand.values()) if cand else set()
    ids_ref = ray.put(all_ids)

    # exact re-rank: one broadcast-filter pass gathers candidate
    # vectors (candidate-bounded: ≤ Q·k·rerank rows)
    def gather(batch: pd.DataFrame) -> pd.DataFrame:
        want = ray.get(ids_ref)
        sel = batch[batch[id_col].isin(want)]
        if sel.empty:
            # batches holding none of the ≤Q·k·rerank candidates are
            # the NORM at scale (candidates are corpus-rare rows)
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "vec": pd.Series(dtype="object")})
        return pd.DataFrame({id_col: sel[id_col].to_numpy(),
                             "vec": list(_normalize(
                                 _as_matrix(sel[vec_col])))})

    got = emb_ds.map_batches(gather, batch_format="pandas",
                             batch_size=4096).to_pandas()
    if got.empty:
        return pd.DataFrame(columns=["query_idx", "vec_id", "cosine"])
    vec_by_id = dict(zip(got[id_col], got["vec"]))
    out = []
    for qi, ids_set in sorted(cand.items()):
        ids_l = sorted(ids_set)
        mat = np.stack([vec_by_id[i] for i in ids_l])
        sims = mat @ qn[qi]
        order = np.lexsort((ids_l, -sims))[:k]
        for oi in order:
            out.append((qi, ids_l[oi], float(sims[oi])))
    res = pd.DataFrame(out, columns=["query_idx", "vec_id", "cosine"])
    return res.sort_values(["query_idx", "cosine", "vec_id"],
                           ascending=[True, False, True]) \
        .reset_index(drop=True)


def mmr_select(emb_ds, query: np.ndarray, *, k: int = 10,
               lam: float = 0.7) -> pd.DataFrame:
    """Maximal Marginal Relevance selection (Carbonell & Goldstein
    SIGIR'98): greedily pick k vectors maximizing
    λ·cos(v,q) − (1−λ)·max_{s∈selected} cos(v,s) — the diversity
    re-ranker behind RAG context packing and dedup-aware retrieval.

    Each round is one streaming pass: the query and the ≤k selected
    vectors broadcast (tiny), every block emits its best candidate
    (score, vec_id) — float64 math, ties to the smallest vec_id — and
    the driver reduces block winners. k passes total; nothing
    corpus-sized leaves the cluster. The selection recurrence is
    inherently sequential (same contract as BPE merges), so rows-only:
    parity vs a brute-force reference is pytest-gated."""
    import ray

    qn = np.asarray(query, np.float64)
    qn = qn / np.linalg.norm(qn)
    sel_ids: list[int] = []
    sel_vecs: list[np.ndarray] = []
    sel_scores: list[float] = []

    for _ in range(k):
        ref = ray.put((qn, np.array(sel_vecs) if sel_vecs else None,
                       set(sel_ids), lam))

        def best(df: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame({"vec_id": pd.Series(dtype="int64"),
                                  "score": pd.Series(dtype="float64"),
                                  "vec": pd.Series(dtype="object")})
            if df.empty or "embedding" not in df.columns:
                return empty
            q, S, taken, lmb = ray.get(ref)
            ids = df["vec_id"].to_numpy()
            keep = ~pd.Series(ids).isin(taken).to_numpy()
            if not keep.any():
                return empty
            m = np.stack([np.asarray(v, np.float64)
                          for v in df["embedding"].to_numpy()])[keep]
            ids = ids[keep]
            m = m / np.linalg.norm(m, axis=1, keepdims=True)
            rel = m @ q
            if S is None:
                score = lmb * rel
            else:
                score = lmb * rel - (1.0 - lmb) * (m @ S.T).max(axis=1)
            order = np.lexsort((ids, -score))[0]
            return pd.DataFrame({"vec_id": [int(ids[order])],
                                 "score": [float(score[order])],
                                 "vec": [m[order].tolist()]})

        winners = emb_ds.map_batches(best, batch_format="pandas",
                                     batch_size=4096).to_pandas()
        if winners.empty or "vec_id" not in winners.columns:
            break
        winners = winners.sort_values(["score", "vec_id"],
                                      ascending=[False, True])
        wid = int(winners["vec_id"].iloc[0])
        sel_ids.append(wid)
        sel_scores.append(float(winners["score"].iloc[0]))
        # winner's (already normalized) vector rides back with the
        # block partial — no second scan per round
        sel_vecs.append(np.asarray(winners["vec"].iloc[0], np.float64))

    return pd.DataFrame({"rank": np.arange(len(sel_ids), dtype=np.int64),
                         "vec_id": np.array(sel_ids, dtype=np.int64),
                         "mmr_score": np.round(sel_scores, 6)})


def binary_hamming_topk(emb_ds, queries: np.ndarray, *, k: int = 10,
                        shortlist: int = 50) -> pd.DataFrame:
    """Binary-quantization search (the 1-bit-per-dim scheme modern
    vector stores use to shrink the scan 32×): sign-bit signatures
    (``dim > 0``), a Hamming-distance shortlist, then an EXACT cosine
    rerank of the shortlist only.

    Returns (query_idx, vec_id, hamming, cosine): the k rerank winners
    per query, ordered by (cosine desc, vec_id). The shortlist cut is
    INTEGER-exact and fully deterministic — (hamming asc, vec_id asc),
    with the same take-all-at-boundary-then-lexsort handling as
    ``brute_force_topk`` — so a SQL oracle replays the identical
    candidate set; the rerank inherits the established cosine-order
    parity of the exact kernel.

    Scale shape: one streaming pass; each block emits at most
    ``shortlist`` candidate rows per query (signatures never
    materialize corpus-wide), the driver merges the L-bounded
    partials. Queries are a bounded broadcast set by contract."""
    q = np.asarray(queries, dtype=np.float32)
    qn = _normalize(q)
    qsig = q > 0                                     # (Q, d)
    q_ref = ray.put((qn, qsig))
    L = shortlist

    def local_short(batch: pd.DataFrame) -> pd.DataFrame:
        qn_, qs_ = ray.get(q_ref)
        raw = _as_matrix(batch["embedding"])
        vsig = raw > 0                               # (B, d)
        vn = _normalize(raw)
        ids = batch["vec_id"].to_numpy()
        ham = (qs_[:, None, :] != vsig[None, :, :]).sum(-1)  # (Q, B)
        cos = qn_ @ vn.T
        rows = []
        for qi in range(qs_.shape[0]):
            h = ham[qi]
            ll = min(L, h.size)
            kth = np.partition(h, ll - 1)[ll - 1]
            ci = np.flatnonzero(h <= kth)
            order = np.lexsort((ids[ci], h[ci]))[:ll]
            sel = ci[order]
            rows.append(pd.DataFrame({
                "query_idx": np.full(len(sel), qi),
                "vec_id": ids[sel],
                "hamming": h[sel].astype(np.int64),
                "cosine": cos[qi, sel].astype(np.float64)}))
        return pd.concat(rows, ignore_index=True) if rows else \
            pd.DataFrame({"query_idx": pd.Series(dtype="int64"),
                          "vec_id": pd.Series(dtype="int64"),
                          "hamming": pd.Series(dtype="int64"),
                          "cosine": pd.Series(dtype="float64")})

    partials = emb_ds.map_batches(local_short, batch_format="pandas",
                                  batch_size=4096).to_pandas()
    if partials.empty:
        return partials
    out = []
    for qi, g in partials.groupby("query_idx"):
        cand = g.sort_values(["hamming", "vec_id"]).head(L)
        top = cand.sort_values(["cosine", "vec_id"],
                               ascending=[False, True]).head(k)
        out.append(top)
    res = pd.concat(out, ignore_index=True)
    return res.sort_values(["query_idx", "cosine", "vec_id"],
                           ascending=[True, False, True]) \
        .reset_index(drop=True)


class HnswIndex:
    """Hierarchical Navigable Small World graph (Malkov & Yashunin
    '16) over normalized vectors with cosine similarity — the
    graph-based ANN completing the scale family beside IVF / PQ /
    IVFADC / LSH: O(log N) expected hops per query, no training
    pass, incremental inserts. Determinism: insertion order is
    vec_id ascending and the level draw is derandomized through the
    md5-uniform l = ⌊−ln(u)·mL⌋ (u from md5('hnsw|id'), the repo's
    derandomization convention), so two builds over the same rows
    are identical — batch-order independence falls out.

    Neighbor selection is the paper's simple closest-M rule (§4,
    SELECT-NEIGHBORS-SIMPLE) with Mmax = M on upper layers and 2M on
    layer 0; search is the standard best-first beam with an
    ``ef``-bounded result heap. All candidate scoring is one numpy
    gather + matmul per hop (vectorized over the frontier's
    adjacency), not per-edge Python.

    Scale shape: the index is STATE FOR AN ACTOR POOL — build once
    per actor in ``__init__`` (or shard per partition and route, the
    distributed deployment), stream query batches through
    ``map_batches``; this class is the exact in-actor primitive."""

    def __init__(self, ids: np.ndarray, vecs: np.ndarray, *,
                 m: int = 8, ef_construction: int = 64):
        from jerex_ray.util import md5_hash64

        if int(m) < 2:
            raise ValueError(
                f"HnswIndex: m must be >= 2 (got {m}) — the level "
                "scale 1/log(m) is undefined at m=1")
        self.ids = np.asarray(ids, dtype=np.int64)
        order = np.argsort(self.ids, kind="stable")
        self.ids = self.ids[order]
        self.vecs = _normalize(np.asarray(vecs,
                                          dtype=np.float32))[order]
        self.m = int(m)
        self.ef_c = int(ef_construction)
        n = len(self.ids)
        ml = 1.0 / np.log(self.m)
        u = np.array([(md5_hash64(f"hnsw|{int(i)}") + 1)
                      / float(2 ** 64) for i in self.ids])
        self.levels = np.floor(-np.log(u) * ml).astype(np.int64)
        self.max_level = -1
        self.entry = -1
        # adjacency: per level, list of int lists
        self.adj: list[list[list[int]]] = []
        for i in range(n):
            self._insert(i)

    def _dist(self, q: np.ndarray, cand: np.ndarray) -> np.ndarray:
        return -(self.vecs[cand] @ q)

    def _search_layer(self, q: np.ndarray, eps: list[int], ef: int,
                      layer: int) -> list[tuple[float, int]]:
        import heapq as hq
        adj = self.adj[layer]
        visited = set(eps)
        d0 = self._dist(q, np.array(eps, dtype=np.int64))
        cand = [(float(d), e) for d, e in zip(d0, eps)]
        hq.heapify(cand)
        best = [(-float(d), e) for d, e in zip(d0, eps)]
        hq.heapify(best)
        while cand:
            d, c = hq.heappop(cand)
            if d > -best[0][0]:
                break
            nbrs = [x for x in adj[c] if x not in visited]
            if not nbrs:
                continue
            visited.update(nbrs)
            nd = self._dist(q, np.array(nbrs, dtype=np.int64))
            for dd, x in zip(nd, nbrs):
                dd = float(dd)
                if len(best) < ef or dd < -best[0][0]:
                    hq.heappush(cand, (dd, x))
                    hq.heappush(best, (-dd, x))
                    if len(best) > ef:
                        hq.heappop(best)
        out = sorted(((-d, x) for d, x in best))
        return out

    def _insert(self, i: int) -> None:
        lvl = int(self.levels[i])
        q = self.vecs[i]
        while len(self.adj) <= lvl:
            self.adj.append([[] for _ in range(len(self.ids))])
        if self.entry < 0:
            self.entry, self.max_level = i, lvl
            return
        ep = [self.entry]
        for layer in range(self.max_level, lvl, -1):
            ep = [self._search_layer(q, ep, 1, layer)[0][1]]
        for layer in range(min(self.max_level, lvl), -1, -1):
            found = self._search_layer(q, ep, self.ef_c, layer)
            mmax = self.m * 2 if layer == 0 else self.m
            sel = [x for _, x in found[:self.m]]
            adj = self.adj[layer]
            adj[i] = list(sel)
            for x in sel:
                adj[x].append(i)
                if len(adj[x]) > mmax:   # prune to closest mmax
                    arr = np.array(adj[x], dtype=np.int64)
                    d = self._dist(self.vecs[x], arr)
                    keep = np.argsort(d, kind="stable")[:mmax]
                    adj[x] = arr[keep].tolist()
            ep = [x for _, x in found]
        if lvl > self.max_level:
            self.max_level, self.entry = lvl, i

    def search(self, queries: np.ndarray, k: int = 10, *,
               ef_search: int = 64) -> tuple[np.ndarray, np.ndarray]:
        """Returns (ids (Q,k), cosines (Q,k)); rows padded with
        (-1, -2) when the graph holds fewer than k nodes."""
        qn = _normalize(np.asarray(queries, dtype=np.float32))
        out_i = np.full((len(qn), k), -1, dtype=np.int64)
        out_c = np.full((len(qn), k), -2.0, dtype=np.float32)
        for qi, q in enumerate(qn):
            ep = [self.entry]
            for layer in range(self.max_level, 0, -1):
                ep = [self._search_layer(q, ep, 1, layer)[0][1]]
            found = self._search_layer(q, ep, max(ef_search, k), 0)
            found = found[:k]
            for j, (d, x) in enumerate(found):
                out_i[qi, j] = self.ids[x]
                out_c[qi, j] = -d
        return out_i, out_c


def hnsw_topk(emb_ds, queries: np.ndarray, k: int = 10, *,
              m: int = 8, ef_construction: int = 64,
              ef_search: int = 64, id_col: str = "vec_id",
              vec_col: str = "embedding") -> pd.DataFrame:
    """HNSW approximate cosine top-k with the brute-force interface:
    build the graph once (actor-state contract — here once on the
    collected vector table, the same broadcast-side bound as every
    ANN index build in this module), then answer all queries.
    Returns (query_idx, vec_id, cosine) sorted by (query_idx,
    -cosine, vec_id). Recall is pytest-gated, not oracled (rows-only
    by design, like IVF)."""
    full = emb_ds.to_pandas()
    if full.empty:
        return pd.DataFrame({"query_idx": pd.Series(dtype="int64"),
                             "vec_id": pd.Series(dtype="int64"),
                             "cosine": pd.Series(dtype="float32")})
    idx = HnswIndex(full[id_col].to_numpy(np.int64),
                    _as_matrix(full[vec_col]), m=m,
                    ef_construction=ef_construction)
    ids, cos = idx.search(np.asarray(queries, dtype=np.float32),
                          k=k, ef_search=ef_search)
    rows = []
    for qi in range(ids.shape[0]):
        for j in range(ids.shape[1]):
            if ids[qi, j] >= 0:
                rows.append((qi, int(ids[qi, j]),
                             float(cos[qi, j])))
    out = pd.DataFrame(rows, columns=["query_idx", "vec_id",
                                      "cosine"])
    return out.astype({"query_idx": "int64", "vec_id": "int64",
                       "cosine": "float32"}) \
        .sort_values(["query_idx", "cosine", "vec_id"],
                     ascending=[True, False, True]) \
        .reset_index(drop=True)
