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


def brute_force_topk(emb_ds, queries: np.ndarray, k: int = 10) -> pd.DataFrame:
    """Exact cosine top-k of each query against the whole dataset.

    Returns (query_idx, vec_id, cosine) with k rows per query, ordered
    by descending cosine then vec_id (deterministic ties)."""
    qn = _normalize(np.asarray(queries, dtype=np.float32))
    q_ref = ray.put(qn)

    def local_topk(batch: pd.DataFrame) -> pd.DataFrame:
        q = ray.get(q_ref)
        vecs = _normalize(_as_matrix(batch["embedding"]))
        ids = batch["vec_id"].to_numpy()
        sims = q @ vecs.T                      # (Q, B)
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
