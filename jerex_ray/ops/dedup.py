"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard verification, embedding-cosine near-dup.

Scale shapes (ray_guide patterns + standard MinHash/LSH from Broder
1997 / Leskovec-Rajaraman-Ullman ch.3, all public):

* exact: content fingerprint per batch (vectorized) → one
  ``groupby(fp)`` keeping the smallest doc_id (deterministic winner).
* minhash-lsh: per-batch shingle→minhash signatures (numpy) → explode
  to (band, band_hash, doc_id) rows → ``groupby(band, band_hash)`` →
  candidate pairs per bucket → exact n-gram Jaccard verify → survivors
  are near-dup edges; duplicates = non-min members of the connected
  star around each kept doc (single-round min-label propagation — full
  transitive closure would iterate the propagation, documented).
* simhash: 64-bit hyperplane-free signature from token hashes; near-dup
  candidates = equal 16-bit bands (4 tables), verified by Hamming
  distance ≤ k.
* embedding cosine: normalize vectors per batch; LSH-bucket by sign of
  hash-projections, verify cosine within bucket.

Every stage is a vectorized ``map_batches``; the only shuffles are the
bucket groupbys, whose fan-in is bounded by per-batch pre-aggregation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from jerex_ray.util import stable_hash64


# ---------- exact dedup ----------

def add_fingerprint(batch: pd.DataFrame, *, col: str = "text") -> pd.DataFrame:
    texts = (batch[col].fillna("").str.lower()
             .str.replace(r"\s+", " ", regex=True).str.strip())
    batch = batch.copy()
    batch["fp"] = np.fromiter(
        (stable_hash64(t) % (1 << 63) for t in texts),
        dtype=np.int64, count=len(texts))
    return batch


def _keep_min_doc(group: pd.DataFrame) -> pd.DataFrame:
    return group.sort_values("doc_id").head(1)


def exact_dedup(docs_ds, *, num_partitions: int | None = None):
    """Exact near-identical dedup: normalized-text fingerprint →
    hash-partitioned group → keep the smallest doc_id."""
    from jerex_ray.runtime import shuffle_partitions
    ds = docs_ds.map_batches(add_fingerprint, batch_format="pandas",
                             batch_size=8192)
    return ds.groupby("fp", num_partitions=shuffle_partitions(num_partitions)) \
             .map_groups(_keep_min_doc, batch_format="pandas")


# ---------- shingles + minhash ----------

N_HASHES = 64
N_BANDS = 16          # 16 bands × 4 rows: catches Jaccard ≳ 0.5
ROWS_PER_BAND = N_HASHES // N_BANDS
_MERSENNE = (1 << 61) - 1


def _hash_params(seed: int = 7):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=N_HASHES, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=N_HASHES, dtype=np.int64)
    return a, b


_A, _B = _hash_params()


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Hashes of k-word shingles (word-level shingling)."""
    words = text.lower().split()
    if len(words) < k:
        grams = [" ".join(words)] if words else []
    else:
        grams = [" ".join(words[i:i + k]) for i in range(len(words) - k + 1)]
    if not grams:
        return np.empty(0, dtype=np.int64)
    return np.fromiter((stable_hash64(g) % _MERSENNE for g in set(grams)),
                       dtype=np.int64)


def minhash_signature(text: str, k: int = 3) -> np.ndarray:
    h = _shingle_hashes(text, k)
    if h.size == 0:
        return np.full(N_HASHES, _MERSENNE, dtype=np.int64)
    # (a*x + b) mod p for all hash fns at once: (H, S) matrix min
    vals = (_A[:, None] * h[None, :] + _B[:, None]) % _MERSENNE
    return vals.min(axis=1)


def minhash_bands(batch: pd.DataFrame, *, col: str = "text",
                  k: int = 3) -> pd.DataFrame:
    """Explode each doc to one row per LSH band."""
    doc_ids, bands, band_hashes = [], [], []
    for doc_id, text in zip(batch["doc_id"], batch[col].fillna("")):
        sig = minhash_signature(text, k)
        for b in range(N_BANDS):
            chunk = sig[b * ROWS_PER_BAND:(b + 1) * ROWS_PER_BAND]
            doc_ids.append(doc_id)
            bands.append(b)
            band_hashes.append(stable_hash64(chunk.tobytes()) % (1 << 63))
    return pd.DataFrame({"doc_id": doc_ids, "band": bands,
                         "band_hash": band_hashes})


def ngram_jaccard(text1: str, text2: str, k: int = 3) -> float:
    """Exact word-k-gram Jaccard — the verification step."""
    s1 = set(map(int, _shingle_hashes(text1, k)))
    s2 = set(map(int, _shingle_hashes(text2, k)))
    if not s1 and not s2:
        return 1.0
    if not s1 or not s2:
        return 0.0
    return len(s1 & s2) / len(s1 | s2)


def _bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
    """Candidate pairs within one (band, band_hash) bucket. Buckets are
    capped to bound the quadratic blow-up of a degenerate bucket (cap
    logged via the dropped column)."""
    ids = sorted(set(group["doc_id"]))
    cap = 200
    dropped = max(0, len(ids) - cap)
    ids = ids[:cap]
    a, b = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a.append(ids[i])
            b.append(ids[j])
    return pd.DataFrame({"doc_a": a, "doc_b": b,
                         "bucket_dropped": [dropped] * len(a)})


def minhash_candidate_pairs(docs_ds, *, col: str = "text", k: int = 3,
                            num_partitions: int | None = None):
    """documents → distinct candidate near-dup pairs (doc_a < doc_b)."""
    from jerex_ray.runtime import shuffle_partitions
    np_ = shuffle_partitions(num_partitions)
    bands = docs_ds.map_batches(
        minhash_bands, batch_format="pandas", batch_size=4096,
        fn_kwargs={"col": col, "k": k})
    pairs = bands.groupby(["band", "band_hash"], num_partitions=np_) \
                 .map_groups(_bucket_pairs, batch_format="pandas")
    # distinct pairs (a doc pair can collide in several bands)
    return pairs.groupby(["doc_a", "doc_b"], num_partitions=np_) \
                .map_groups(lambda g: g.head(1)[["doc_a", "doc_b"]],
                            batch_format="pandas")


def minhash_dedup(docs_ds, *, threshold: float = 0.8, col: str = "text",
                  k: int = 3, num_partitions: int | None = None):
    """Full near-dup pipeline: LSH candidates → Jaccard verify →
    survivors keep the min doc_id of each near-dup star.

    Returns (kept_ds_ids, edges_df). Verification joins the texts back
    via a broadcast id→text lookup built from the candidate ids only
    (small side), not a full shuffle join of the corpus."""
    import ray

    pairs = minhash_candidate_pairs(docs_ds, col=col, k=k,
                                    num_partitions=num_partitions).to_pandas()
    if len(pairs) == 0:
        return docs_ds, pd.DataFrame(columns=["doc_a", "doc_b", "jaccard"])

    cand_ids = set(pairs["doc_a"]) | set(pairs["doc_b"])
    # collect only candidate texts (tiny vs corpus)
    cand_ids_ref = ray.put(cand_ids)

    def filter_cands(b: pd.DataFrame) -> pd.DataFrame:
        ids = ray.get(cand_ids_ref)
        return b[b["doc_id"].isin(ids)][["doc_id", col]]

    texts = docs_ds.map_batches(filter_cands, batch_format="pandas").to_pandas()
    lookup = dict(zip(texts["doc_id"], texts[col]))

    jac = np.fromiter(
        (ngram_jaccard(lookup.get(a, ""), lookup.get(b, ""), k)
         for a, b in zip(pairs["doc_a"], pairs["doc_b"])),
        dtype=np.float64, count=len(pairs))
    edges = pairs.assign(jaccard=jac)
    edges = edges[edges["jaccard"] >= threshold].reset_index(drop=True)

    # min-label propagation (one round; iterate for deep chains)
    root: dict = {}
    for a, b in zip(edges["doc_a"], edges["doc_b"]):
        ra, rb = root.get(a, a), root.get(b, b)
        r = min(ra, rb)
        root[a] = root[b] = root.get(r, r)
    drop = {d for d, r in root.items() if r != d}
    drop_ref = ray.put(drop)

    def drop_dups(b: pd.DataFrame) -> pd.DataFrame:
        dd = ray.get(drop_ref)
        return b[~b["doc_id"].isin(dd)]

    kept = docs_ds.map_batches(drop_dups, batch_format="pandas")
    return kept, edges


# ---------- simhash ----------

def simhash64(text: str) -> int:
    words = text.lower().split()
    if not words:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    for w in set(words):
        h = np.uint64(stable_hash64(w))
        bits = (h >> shifts) & np.uint64(1)
        acc += np.where(bits == 1, 1, -1)
    bits = (acc > 0).astype(np.uint64)
    return int((bits << shifts).sum(dtype=np.uint64))


def add_simhash(batch: pd.DataFrame, *, col: str = "text") -> pd.DataFrame:
    batch = batch.copy()
    sh = np.fromiter((simhash64(t) for t in batch[col].fillna("")),
                     dtype=np.uint64, count=len(batch))
    batch["simhash"] = sh.astype(np.int64)  # arrow-friendly
    for t in range(4):
        batch[f"sh_band{t}"] = ((sh >> np.uint64(16 * t)) &
                                np.uint64(0xFFFF)).astype(np.int64)
    return batch


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def simhash_candidates(docs_ds, *, max_hamming: int = 3, col: str = "text",
                       num_partitions: int | None = None) -> pd.DataFrame:
    """SimHash near-dup pairs: equal 16-bit band → candidate → Hamming
    verify. Returns the verified pair table (driver-side; pair counts
    are tiny relative to the corpus)."""
    from jerex_ray.runtime import shuffle_partitions
    np_ = shuffle_partitions(num_partitions)
    sh = docs_ds.map_batches(add_simhash, batch_format="pandas",
                             batch_size=4096,
                             fn_kwargs={"col": col})
    frames = []
    for t in range(4):
        pairs = sh.select_columns(["doc_id", "simhash", f"sh_band{t}"]) \
                  .groupby(f"sh_band{t}", num_partitions=np_) \
                  .map_groups(_simhash_bucket_pairs, batch_format="pandas")
        frames.append(pairs.to_pandas())
    allp = pd.concat(frames, ignore_index=True)
    if len(allp) == 0:
        return pd.DataFrame(columns=["doc_a", "doc_b", "hamming"])
    allp = allp.drop_duplicates(["doc_a", "doc_b"])
    return allp[allp["hamming"] <= max_hamming][
        ["doc_a", "doc_b", "hamming"]].sort_values(
        ["doc_a", "doc_b"]).reset_index(drop=True)


def _simhash_bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
    """Hamming distance is computed here, where the exact int64-encoded
    signatures are at hand (pandas concat of empty frames would coerce
    uint64 signatures to float and corrupt them)."""
    g = group.drop_duplicates("doc_id").sort_values("doc_id")
    ids = g["doc_id"].to_numpy()
    sims = g["simhash"].to_numpy()
    cap = 200
    ids, sims = ids[:cap], sims[:cap]
    a_i, b_i, ham = [], [], []
    for i in range(len(ids)):
        si = int(sims[i]) & ((1 << 64) - 1)
        for j in range(i + 1, len(ids)):
            a_i.append(ids[i]); b_i.append(ids[j])
            ham.append(hamming64(si, int(sims[j]) & ((1 << 64) - 1)))
    # doc ids keep their native dtype (int or string); hamming is int64
    return pd.DataFrame({"doc_a": a_i, "doc_b": b_i,
                         "hamming": pd.Series(ham, dtype="int64")})


# ---------- embedding cosine near-dup ----------

def embedding_near_dups(emb_ds, *, threshold: float = 0.95,
                        n_projections: int = 12, seed: int = 11,
                        num_partitions: int | None = None) -> pd.DataFrame:
    """Near-duplicate vectors by cosine: LSH sign-bucket on random
    hyperplanes (seeded, broadcast by value) → exact cosine verify
    within bucket. Input shape: (vec_id, embedding list<float>)."""
    from jerex_ray.runtime import shuffle_partitions
    np_ = shuffle_partitions(num_partitions)

    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        vecs = np.stack(batch["embedding"].to_numpy())
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((vecs.shape[1], n_projections))
        signs = (vecs @ planes) > 0
        bucket = signs.dot(1 << np.arange(n_projections)).astype(np.int64)
        norms = np.linalg.norm(vecs, axis=1)
        normed = vecs / np.clip(norms[:, None], 1e-12, None)
        return pd.DataFrame({
            "vec_id": batch["vec_id"],
            "bucket": bucket,
            "vec": list(normed.astype(np.float32)),
        })

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("vec_id").head(500)
        ids = g["vec_id"].to_numpy()
        m = np.stack(g["vec"].to_numpy())
        sims = m @ m.T
        iu, ju = np.triu_indices(len(ids), k=1)
        mask = sims[iu, ju] >= threshold
        return pd.DataFrame({"vec_a": ids[iu[mask]], "vec_b": ids[ju[mask]],
                             "cosine": sims[iu, ju][mask].astype(np.float64)})

    b = emb_ds.map_batches(bucketize, batch_format="pandas", batch_size=4096)
    pairs = b.groupby("bucket", num_partitions=np_) \
             .map_groups(bucket_pairs, batch_format="pandas")
    out = pairs.to_pandas()
    if len(out) == 0:
        return pd.DataFrame(columns=["vec_a", "vec_b", "cosine"])
    return out.drop_duplicates(["vec_a", "vec_b"]).reset_index(drop=True)
