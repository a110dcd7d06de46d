"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard verification, embedding-cosine near-dup.

Scale shapes (ray_guide patterns + standard MinHash/LSH from Broder
1997 / Leskovec-Rajaraman-Ullman ch.3, all public):

* exact: content fingerprint per batch (vectorized, hashed once per
  UNIQUE normalized text) → one ``groupby(fp)`` keeping the smallest
  doc_id (deterministic winner).
* minhash-lsh: per-batch shingle→minhash signatures (numpy) → explode
  to (band, band_hash, doc_id) rows → ``groupby(band, band_hash)`` →
  candidate pairs per bucket → DISTRIBUTED exact n-gram Jaccard verify:
  ONE shingle pass over candidate docs emits (doc_id, gram, count)
  rows with each doc's gram count carried along → co-locate by gram →
  per-pair intersection partials (carrying both counts) →
  ``groupby(pair).sum`` → jaccard finalized from the carried counts —
  no pair, shingle, or count table ever materializes on the driver.
  Candidate filtering broadcasts an id set only while the doc count
  bounds it; past ``broadcast_threshold`` it switches to a distributed
  doc⋉id semi-join (dup-HEAVY corpora). Duplicates = non-min members
  of each near-dup star (or full transitive closure via the
  distributed connected-components operator).
* simhash: 64-bit signature from md5-derived word hashes (md5 so a SQL
  oracle can recompute it bit-for-bit); near-dup candidates = equal
  16-bit bands (4 tables), verified by vectorized Hamming distance ≤ k.
* embedding cosine: multi-table sign-projection LSH (OR-construction
  across tables for high recall at θ≈0.95). The bucket shuffle moves
  ONLY (vec_id, table, bucket) rows — never T×-replicated vectors;
  exact-cosine verification attaches candidate vectors once
  (broadcast when small, two co-located 1× joins when not). Plus an
  exact all-pairs baseline (``embedding_near_dups_exact``) used as
  the oracle-checked query.

Every stage is a vectorized ``map_batches``; the only shuffles are the
bucket/gram groupbys, whose fan-in is bounded by per-batch
pre-aggregation and the candidate-doc restriction.
"""

from __future__ import annotations

import logging
from functools import lru_cache as _lru_cache

import numpy as np
import pandas as pd

from jerex_ray.util import md5_hash64_batch, stable_hash64, stable_hash64_batch

logger = logging.getLogger(__name__)


# ---------- exact dedup ----------

def add_fingerprint(batch: pd.DataFrame, *, col: str = "text") -> pd.DataFrame:
    texts = (batch[col].fillna("").str.lower()
             .str.replace(r"\s+", " ", regex=True).str.strip())
    batch = batch.copy()
    # unique-then-scatter: dup-heavy corpora hash each distinct text once
    batch["fp"] = (stable_hash64_batch(texts) % np.uint64(1 << 63)) \
        .astype(np.int64)
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


_POLY_B = np.int64(0x5DEECE66D)      # odd multiplier; int64 wraparound
                                      # polynomial over word hashes


def _gram_hashes_from_words(wh: np.ndarray, k: int) -> np.ndarray:
    """Distinct k-gram hashes from per-word hashes: a vectorized
    wraparound polynomial over k-word windows (deterministic gram id;
    grams are compared by identity only, so the polynomial replaces
    hashing each joined gram string — ~k× fewer digest calls and the
    window combine is pure numpy)."""
    if wh.size == 0:
        return np.empty(0, dtype=np.int64)
    # the polynomial intentionally wraps mod 2^64 — silence the
    # overflow warning (and survive np.seterr(over='raise') hosts)
    with np.errstate(over="ignore"):
        if wh.size < k:
            acc = wh[0]
            for j in range(1, wh.size):
                acc = acc * _POLY_B + wh[j]
            return np.unique(np.asarray([acc % _MERSENNE], dtype=np.int64))
        acc = wh[: wh.size - k + 1].copy()
        for j in range(1, k):
            acc = acc * _POLY_B + wh[j: wh.size - k + 1 + j]
        return np.unique(acc % _MERSENNE)


def _doc_shingle_arrays(texts, k: int = 3) -> list[np.ndarray]:
    """Per-doc distinct shingle-hash arrays for a whole batch: every
    UNIQUE word across the batch is digested once (unique-then-scatter),
    gram hashes come from the vectorized polynomial."""
    doc_words = [t.lower().split() for t in texts]
    flat = [w for ws in doc_words for w in ws]
    if flat:
        uniq, inv = np.unique(np.asarray(flat, dtype=object),
                              return_inverse=True)
        hu = np.fromiter((stable_hash64(u) % _MERSENNE for u in uniq),
                         dtype=np.int64, count=len(uniq))
        flat_h = hu[inv]
    else:
        flat_h = np.empty(0, dtype=np.int64)
    out, off = [], 0
    for ws in doc_words:
        wh = flat_h[off:off + len(ws)]
        off += len(ws)
        out.append(_gram_hashes_from_words(wh, k))
    return out


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Hashes of the distinct k-word shingles of one text."""
    return _doc_shingle_arrays([text], k)[0]


def minhash_signature(text: str, k: int = 3) -> np.ndarray:
    h = _shingle_hashes(text, k)
    if h.size == 0:
        return np.full(N_HASHES, _MERSENNE, dtype=np.int64)
    # (a*x + b) mod p for all hash fns at once: (H, S) matrix min
    vals = (_A[:, None] * h[None, :] + _B[:, None]) % _MERSENNE
    return vals.min(axis=1)


def minhash_bands(batch: pd.DataFrame, *, col: str = "text",
                  k: int = 3) -> pd.DataFrame:
    """Explode each doc to one row per LSH band. Batch-vectorized:
    unique words across the batch digest once; signatures and band
    hashes come from numpy matrix ops per doc."""
    gram_arrays = _doc_shingle_arrays(batch[col].fillna(""), k)
    n = len(gram_arrays)
    sigs = np.empty((n, N_HASHES), dtype=np.int64)
    for i, h in enumerate(gram_arrays):
        if h.size == 0:
            sigs[i] = _MERSENNE
        else:
            sigs[i] = ((_A[:, None] * h[None, :] + _B[:, None])
                       % _MERSENNE).min(axis=1)
    # band hash: wraparound polynomial over each band's rows — one
    # vectorized pass, no per-band digest calls
    rows = sigs.reshape(n, N_BANDS, ROWS_PER_BAND)
    with np.errstate(over="ignore"):      # intended mod-2^64 wraparound
        acc = rows[:, :, 0].copy()
        for j in range(1, ROWS_PER_BAND):
            acc = acc * _POLY_B + rows[:, :, j]
        band_hash = (acc % np.int64((1 << 63) - 1)) \
            & np.int64(0x7FFFFFFFFFFFFFFF)
    return pd.DataFrame({
        "doc_id": np.repeat(np.asarray(batch["doc_id"]), N_BANDS),
        "band": np.tile(np.arange(N_BANDS, dtype=np.int64), n),
        "band_hash": band_hash.ravel(),
    })


def ngram_jaccard(text1: str, text2: str, k: int = 3) -> float:
    """Exact word-k-gram Jaccard — the (scalar) verification kernel;
    the distributed pipeline computes the same value via
    explode-join-aggregate (``minhash_dedup``)."""
    s1 = set(map(int, _shingle_hashes(text1, k)))
    s2 = set(map(int, _shingle_hashes(text2, k)))
    if not s1 and not s2:
        return 1.0
    if not s1 or not s2:
        return 0.0
    return len(s1 & s2) / len(s1 | s2)


def _bucket_pairs_block(block: pd.DataFrame, cap: int = 200) -> pd.DataFrame:
    """Candidate pairs from all (band, band_hash) buckets in a block.
    Vectorized pre-filter: only buckets with ≥2 docs enter the Python
    pair loop; each bucket is capped to bound a degenerate bucket's
    quadratic blow-up. Truncations are logged with the dropped-doc
    count (a capped bucket of identical docs still keeps its pairs
    transitively linked through the ``cap`` retained members)."""
    dup_mask = block.duplicated(["band", "band_hash"], keep=False)
    hot = block[dup_mask]
    a, b = [], []
    dropped = 0
    for _, g in hot.groupby(["band", "band_hash"], sort=False):
        ids = sorted(set(g["doc_id"]))
        if len(ids) > cap:
            dropped += len(ids) - cap
            ids = ids[:cap]
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
    if dropped:
        logger.warning("minhash LSH bucket cap=%d truncated %d docs "
                       "(their pairs beyond the cap were dropped)",
                       cap, dropped)
    return pd.DataFrame({"doc_a": a, "doc_b": b})


def minhash_candidate_pairs(docs_ds, *, col: str = "text", k: int = 3,
                            num_partitions: int | None = None,
                            distinct: bool = True,
                            small: bool = False):
    """documents → candidate near-dup pairs (doc_a < doc_b). Stays a
    Dataset: global dedup is a hash-co-located block dedup, never a
    driver collect. ``distinct=False`` skips that dedup shuffle for
    consumers that tolerate a pair appearing once per colliding band
    (the verification pipeline aggregates per pair anyway).
    ``small=True`` (caller KNOWS the corpus is small, e.g. from parquet
    row counts) swaps each hash shuffle for a single-block concat."""
    from jerex_ray.functions.aggregate import grouped_apply
    bands = docs_ds.map_batches(
        minhash_bands, batch_format="pandas", batch_size=4096,
        fn_kwargs={"col": col, "k": k})
    pairs = grouped_apply(bands, ["band", "band_hash"], _bucket_pairs_block,
                          num_partitions=num_partitions or 8,
                          single_block=small)
    if not distinct:
        return pairs
    # global distinct: co-locate by pair key, vectorized per-block dedup
    return grouped_apply(pairs, ["doc_a", "doc_b"],
                         lambda b: b.drop_duplicates(["doc_a", "doc_b"]),
                         num_partitions=num_partitions or 8,
                         single_block=small)


def _gram_rows(batch: pd.DataFrame, *, col: str, k: int,
               id_filter=None, with_counts: bool = False) -> pd.DataFrame:
    """Explode docs to (doc_id, gram-hash) rows, distinct per doc.
    ``with_counts=True`` carries each doc's distinct-gram count ``c``
    on every row (so jaccard can be computed fully distributed, no
    broadcast count dict) and emits one sentinel row (g=-1, c=0) for
    an empty doc (two empty candidate docs meet in the sentinel gram
    group and get jaccard 1.0 downstream)."""
    ids_out, grams_out, c_out = [], [], []
    rows = batch[["doc_id", col]]
    if id_filter is not None:
        rows = rows[rows["doc_id"].isin(id_filter)]
    gram_arrays = _doc_shingle_arrays(rows[col].fillna(""), k)
    for doc_id, g in zip(rows["doc_id"], gram_arrays):
        if g.size == 0 and with_counts:
            ids_out.append(np.asarray([doc_id], dtype=np.int64))
            grams_out.append(np.asarray([-1], dtype=np.int64))
            c_out.append(np.zeros(1, dtype=np.int64))
            continue
        ids_out.append(np.full(g.size, doc_id, dtype=np.int64))
        grams_out.append(g)
        if with_counts:
            c_out.append(np.full(g.size, g.size, dtype=np.int64))
    cols = {"doc_id": pd.Series(dtype="int64"),
            "g": pd.Series(dtype="int64")}
    if with_counts:
        cols["c"] = pd.Series(dtype="int64")
    if not ids_out:
        return pd.DataFrame(cols)
    out = {"doc_id": np.concatenate(ids_out), "g": np.concatenate(grams_out)}
    if with_counts:
        out["c"] = np.concatenate(c_out)
    return pd.DataFrame(out)


def _gram_pair_counts_block(block: pd.DataFrame,
                            cap: int = 2000) -> pd.DataFrame:
    """Per co-located gram block: partial pair-intersection counts,
    each pair row carrying both docs' total gram counts (ca, cb) so
    the jaccard finalize needs no broadcast lookup. For each gram,
    every ordered doc pair sharing it contributes 1. A gram shared by
    > ``cap`` candidate docs (a boilerplate phrase in a dup-heavy
    corpus) would emit C(m,2) pairs — it is truncated to the ``cap``
    smallest doc ids with a logged drop count (pairs among the
    retained docs keep their exact counts; pairs involving only
    dropped docs lose this gram's vote, biasing their jaccard DOWN —
    never creating false edges)."""
    a_out, b_out, ca_out, cb_out = [], [], [], []
    hot = block[block.duplicated("g", keep=False)]
    dropped = 0
    for _, grp in hot.groupby("g", sort=False):
        # grams are distinct per doc ⇒ each doc appears once per gram
        ids = grp["doc_id"].to_numpy()
        cs = grp["c"].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids, cs = ids[order], cs[order]
        if ids.size < 2:
            continue
        if ids.size > cap:
            dropped += ids.size - cap
            ids, cs = ids[:cap], cs[:cap]
        iu, ju = np.triu_indices(ids.size, k=1)
        a_out.append(ids[iu])
        b_out.append(ids[ju])
        ca_out.append(cs[iu])
        cb_out.append(cs[ju])
    if dropped:
        logger.warning("gram-pair cap=%d truncated %d docs on hot grams",
                       cap, dropped)
    if not a_out:
        return pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                             "doc_b": pd.Series(dtype="int64"),
                             "n": pd.Series(dtype="int64"),
                             "ca": pd.Series(dtype="int64"),
                             "cb": pd.Series(dtype="int64")})
    df = pd.DataFrame({"doc_a": np.concatenate(a_out),
                       "doc_b": np.concatenate(b_out),
                       "ca": np.concatenate(ca_out),
                       "cb": np.concatenate(cb_out)})
    return df.groupby(["doc_a", "doc_b", "ca", "cb"], sort=False) \
             .size().reset_index(name="n")


def _candidate_docs_semijoin(docs_ds, ids_ds, *, col: str, nparts: int):
    """Distributed semi-join: keep only doc rows whose doc_id appears
    in the candidate-id Dataset, by co-locating docs and ids on doc_id
    (one doc-table shuffle; nothing id- or doc-sized touches the
    driver). The scale path for dup-HEAVY corpora whose candidate set
    approaches the corpus size."""
    from jerex_ray.functions.aggregate import grouped_apply

    docs_tagged = docs_ds.map_batches(
        lambda b: b[["doc_id", col]].assign(__m=np.int8(0)),
        batch_format="pandas")
    ids_tagged = ids_ds.map_batches(
        lambda b: pd.DataFrame({"doc_id": b["doc_id"],
                                col: "", "__m": np.int8(1)})
        if "doc_id" in b.columns else
        pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                      col: pd.Series(dtype="object"),
                      "__m": pd.Series(dtype="int8")}),
        batch_format="pandas")

    def keep_marked(block: pd.DataFrame) -> pd.DataFrame:
        if block.empty or "__m" not in block.columns:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 col: pd.Series(dtype="object")})
        marked = block.loc[block["__m"] == 1, "doc_id"]
        out = block[(block["__m"] == 0) & block["doc_id"].isin(marked)]
        return out[["doc_id", col]]

    return grouped_apply(docs_tagged.union(ids_tagged), ["doc_id"],
                         keep_marked, num_partitions=nparts)


_SINGLE_BLOCK_DOCS = 20_000      # bands table ≤ 16×docs rows: concat-able
_SINGLE_BLOCK_CANDS = 5_000      # gram table ≤ cands×grams/doc rows


def minhash_verified_edges(docs_ds, *, threshold: float = 0.8,
                           col: str = "text", k: int = 3,
                           num_partitions: int | None = None,
                           broadcast_threshold: int = 200_000):
    """LSH candidates → DISTRIBUTED exact Jaccard verification.

    Returns a Dataset of (doc_a, doc_b, jaccard) edges with
    jaccard ≥ threshold. Dataflow — nothing pair-, shingle-, or
    count-sized ever reaches the driver:

    1. LSH candidate pairs (distributed, §above).
    2. candidate doc ids, distinct via a hash-co-located dedup.
       ≤ ``broadcast_threshold`` ids: broadcast once as a set
       (``ray.put``) and filter map-side. Above it (dup-HEAVY corpus,
       candidate set approaching corpus size): a distributed semi-join
       of the doc table against the id Dataset — no driver set/dict.
    3. ONE shingle pass over candidate docs emits (doc_id, g, c) gram
       rows with the doc's distinct-gram count carried on every row
       (empty docs emit a g=-1 sentinel with c=0).
    4. co-locate by gram → per-pair partial intersection counts
       (combiner per block, carrying ca/cb) → ``groupby(pair)`` sum.
    5. jaccard = n / (ca + cb − n), computed from the carried counts —
       no broadcast lookup. Pairs of two EMPTY docs (ca = cb = 0) get
       jaccard 1.0, matching ``ngram_jaccard``.
    """
    import ray

    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply

    nparts = num_partitions or 8
    # small-vs-large decision BEFORE anything id-sized can reach the
    # driver. First gate: total doc count (metadata-cheap for parquet
    # sources, an upper bound on candidate ids). Only past it, pay one
    # materialized pass to bound the candidate-id count by 2×pairs.
    n_docs = docs_ds.count()
    small = n_docs <= broadcast_threshold
    # distinct=False: pair multiplicity across bands is harmless here
    # (candidate ids are set-reduced; verified edges come from the
    # per-pair aggregate, not this table) — saves a dedup shuffle
    pairs = minhash_candidate_pairs(docs_ds, col=col, k=k,
                                    num_partitions=nparts, distinct=False,
                                    small=n_docs <= _SINGLE_BLOCK_DOCS)
    if not small:
        pairs = pairs.materialize()
        n_pairs = pairs.count()
        if n_pairs == 0:
            import ray.data as rd
            return rd.from_pandas(pd.DataFrame(
                {"doc_a": pd.Series(dtype="int64"),
                 "doc_b": pd.Series(dtype="int64"),
                 "jaccard": pd.Series(dtype="float64")}))
        small = 2 * n_pairs <= broadcast_threshold

    if small:
        # small path: per-batch unique → one bounded driver set union
        ids_df = pairs.map_batches(
            lambda b: pd.DataFrame(
                {"doc_id": pd.unique(pd.concat([b["doc_a"], b["doc_b"]]))})
            if "doc_a" in b.columns else
            pd.DataFrame({"doc_id": pd.Series(dtype="int64")}),
            batch_format="pandas").to_pandas()
        cand_set = (set(ids_df["doc_id"].tolist())
                    if "doc_id" in ids_df.columns else set())
        if not cand_set:
            import ray.data as rd
            return rd.from_pandas(pd.DataFrame(
                {"doc_a": pd.Series(dtype="int64"),
                 "doc_b": pd.Series(dtype="int64"),
                 "jaccard": pd.Series(dtype="float64")}))
        cand_ref = ray.put(cand_set)
        grams = docs_ds.map_batches(
            lambda b: _gram_rows(b, col=col, k=k,
                                 id_filter=ray.get(cand_ref),
                                 with_counts=True),
            batch_format="pandas", batch_size=4096)
    else:
        # dup-heavy path: distinct ids as a DATASET (hash-co-located
        # dedup of the id table) + doc semi-join — driver never holds
        # an id set or count dict
        ids_ds = grouped_apply(
            pairs.map_batches(
                lambda b: pd.DataFrame(
                    {"doc_id": pd.unique(pd.concat([b["doc_a"],
                                                    b["doc_b"]]))})
                if "doc_a" in b.columns else
                pd.DataFrame({"doc_id": pd.Series(dtype="int64")}),
                batch_format="pandas"),
            ["doc_id"],
            lambda b: (b.drop_duplicates("doc_id")
                       if "doc_id" in b.columns else b),
            num_partitions=nparts)
        cand_docs = _candidate_docs_semijoin(docs_ds, ids_ds, col=col,
                                             nparts=nparts)
        grams = cand_docs.map_batches(
            lambda b: _gram_rows(b, col=col, k=k, with_counts=True)
            if col in b.columns else
            pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                          "g": pd.Series(dtype="int64"),
                          "c": pd.Series(dtype="int64")}),
            batch_format="pandas", batch_size=4096)

    # short-circuit: cand_set exists only on the small path
    few_cands = small and len(cand_set) <= _SINGLE_BLOCK_CANDS
    return _jaccard_edges_from_grams(grams, threshold=threshold,
                                     nparts=nparts,
                                     single_block=few_cands)


def _attach_jaccard(b: pd.DataFrame, *, threshold: float) -> pd.DataFrame:
    """Finalize per-pair intersection counts into jaccard edges
    (``n / (ca + cb − n)``; two empty docs ⇒ 1.0 per ``ngram_jaccard``)."""
    if b.empty or "doc_a" not in b.columns:
        return pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                             "doc_b": pd.Series(dtype="int64"),
                             "jaccard": pd.Series(dtype="float64")})
    ca = b["ca"].to_numpy(dtype=np.float64)
    cb = b["cb"].to_numpy(dtype=np.float64)
    n = b["n"].to_numpy(dtype=np.float64)
    both_empty = (ca == 0) & (cb == 0)
    with np.errstate(divide="ignore", invalid="ignore"):
        j = np.where(both_empty, 1.0, n / (ca + cb - n))
    out = b.assign(jaccard=j)
    out = out[out["jaccard"] >= threshold]
    return out[["doc_a", "doc_b", "jaccard"]]


def _jaccard_edges_from_grams(grams, *, threshold: float, nparts: int,
                              single_block: bool = False):
    """(doc_id, g, c) gram rows → (doc_a, doc_b, jaccard) edge Dataset:
    co-locate by gram → per-block partial pair-intersection counts
    (combiner, carrying ca/cb) → ``groupby(pair)`` sum → jaccard
    filter. Shared tail of the LSH-verified and exact paths."""
    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply

    inter_partial = grouped_apply(grams, ["g"], _gram_pair_counts_block,
                                  num_partitions=nparts,
                                  single_block=single_block)
    # tree reduce (result_hint small): the pair-intersection table is
    # bounded by the near-dup pair count, not the corpus — callers with
    # pathologically dup-heavy corpora can switch to "large"
    inter = grouped_aggregate(inter_partial, ["doc_a", "doc_b"],
                              {"n": ("n", "sum"), "ca": ("ca", "max"),
                               "cb": ("cb", "max")},
                              num_partitions=nparts)
    return inter.map_batches(_attach_jaccard, batch_format="pandas",
                             fn_kwargs={"threshold": threshold})


def jaccard_edges_exact(docs_ds, *, threshold: float = 0.7,
                        col: str = "text", k: int = 3,
                        num_partitions: int | None = None):
    """EXACT n-gram Jaccard near-dup edges — no LSH prefilter.

    Guaranteed-recall twin of ``minhash_verified_edges``: any pair with
    jaccard ≥ threshold > 0 shares at least one word k-gram, so scoring
    every gram-sharing pair (one gram-hash co-location shuffle, partial
    pair counts per gram group, one pair aggregate) finds ALL edges.
    The trade: without the LSH filter every gram-sharing pair is
    scored, so hot grams (boilerplate) dominate — the per-gram doc cap
    in ``_gram_pair_counts_block`` bounds that with logged drops
    (bias DOWN only). Use minhash for recall ≈ 0.99 at a fraction of
    the pairs; use this when exactness is the contract."""
    nparts = num_partitions or 8
    n_docs = docs_ds.count()
    grams = docs_ds.map_batches(
        lambda b: _gram_rows(b, col=col, k=k, with_counts=True),
        batch_format="pandas", batch_size=4096)
    return _jaccard_edges_from_grams(grams, threshold=threshold,
                                     nparts=nparts,
                                     single_block=n_docs <= _SINGLE_BLOCK_CANDS)


def minhash_dedup(docs_ds, *, threshold: float = 0.8, col: str = "text",
                  k: int = 3, num_partitions: int | None = None,
                  transitive: bool = False):
    """Full near-dup pipeline: LSH candidates → distributed Jaccard
    verify → survivors keep the min doc_id of each near-dup star.

    Returns (kept_ds, edges_df). Candidates and verification stay
    distributed end-to-end (``minhash_verified_edges``); only the final
    VERIFIED edge table — inherently small next to the corpus — is
    collected to pick the drop set. ``transitive=True`` routes the drop
    decision through the distributed connected-components operator
    instead (deep duplicate chains)."""
    import ray

    edges_ds = minhash_verified_edges(docs_ds, threshold=threshold, col=col,
                                      k=k, num_partitions=num_partitions)

    def _edges_pdf() -> pd.DataFrame:
        pdf = edges_ds.to_pandas()
        if "doc_a" not in pdf.columns:   # schema-less all-empty Dataset
            pdf = pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                                "doc_b": pd.Series(dtype="int64"),
                                "jaccard": pd.Series(dtype="float64")})
        return pdf

    if transitive:
        from jerex_ray.functions.components import connected_components
        comp = connected_components(
            edges_ds.map_batches(
                lambda b: b.rename(
                    columns={"doc_a": "src", "doc_b": "dst"})[["src", "dst"]]
                if "doc_a" in b.columns else
                pd.DataFrame({"src": pd.Series(dtype="int64"),
                              "dst": pd.Series(dtype="int64")}),
                batch_format="pandas"),
            num_partitions=num_partitions)
        drop = set(comp[comp["node"] != comp["component"]]["node"])
        edges = _edges_pdf()
    else:
        edges = _edges_pdf()
        # single-round min-label star collapse (verified edge sets are
        # small; catches direct duplicates, not deep chains). Edges are
        # sorted FIRST: the drop set must not depend on block arrival
        # order (determinism under re-sharding)
        edges = edges.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
        root: dict = {}
        for a, b in zip(edges["doc_a"], edges["doc_b"]):
            ra, rb = root.get(a, a), root.get(b, b)
            r = min(ra, rb)
            root[a] = root[b] = root.get(r, r)
        drop = {d for d, r in root.items() if r != d}
    if len(edges):
        edges = edges.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    drop_ref = ray.put(drop)

    def drop_dups(b: pd.DataFrame) -> pd.DataFrame:
        dd = ray.get(drop_ref)
        return b[~b["doc_id"].isin(dd)]

    kept = docs_ds.map_batches(drop_dups, batch_format="pandas")
    return kept, edges


# ---------- simhash ----------

def simhash64(text: str) -> int:
    """Single-doc SimHash from md5-derived word hashes (md5 so DuckDB
    can recompute the identical signature:
    ``CAST('0x' || substr(md5(w), 1, 16) AS UBIGINT)``)."""
    words = sorted(set(text.lower().split()))
    if not words:
        return 0
    hashes = md5_hash64_batch(words)
    shifts = np.arange(64, dtype=np.uint64)
    bits = (hashes[:, None] >> shifts[None, :]) & np.uint64(1)
    acc = np.where(bits == 1, 1, -1).sum(axis=0)
    out = (acc > 0).astype(np.uint64)
    return int((out << shifts).sum(dtype=np.uint64))


def add_simhash(batch: pd.DataFrame, *, col: str = "text") -> pd.DataFrame:
    """Batch-vectorized SimHash: hash each distinct word once across
    the whole batch (md5-derived, SQL-replicable), unpack its 64 bits,
    and scatter-add ±1 votes into per-doc accumulators with
    ``np.add.at``."""
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
        hashes = md5_hash64_batch(uniq)
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


def _simhash_block_pairs(block: pd.DataFrame, max_hamming: int,
                         cap: int = 2000) -> pd.DataFrame:
    """Vectorized per-bucket pairwise Hamming: XOR matrix → uint8 view
    → unpackbits popcount. Only buckets with ≥2 docs are touched. A
    degenerate bucket (> ``cap`` docs sharing one 16-bit band value) is
    truncated with a logged dropped-doc count."""
    dup = block[block.duplicated(["band", "band_val"], keep=False)]
    a_out, b_out, h_out = [], [], []
    dropped = 0
    for _, g in dup.groupby(["band", "band_val"], sort=False):
        g = g.drop_duplicates("doc_id").sort_values("doc_id")
        if len(g) > cap:
            dropped += len(g) - cap
            g = g.head(cap)
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
    if dropped:
        logger.warning("simhash bucket cap=%d truncated %d docs",
                       cap, dropped)
    if not a_out:
        return pd.DataFrame({"doc_a": [], "doc_b": [],
                             "hamming": pd.Series(dtype="int64")})
    return pd.DataFrame({
        "doc_a": np.concatenate(a_out),
        "doc_b": np.concatenate(b_out),
        "hamming": pd.Series(np.concatenate(h_out), dtype="int64")})


def simhash_candidates_ds(docs_ds, *, max_hamming: int = 3,
                          col: str = "text",
                          num_partitions: int | None = None):
    """SimHash near-dup pairs as a DATASET — the scale path: equal
    16-bit band (4 bands, exploded into one shuffle) → vectorized
    in-bucket Hamming verify → global dedup by pair-key co-location.
    Pairs never materialize on the driver (a near-dup-heavy corpus
    makes the pair table corpus-sized)."""
    from jerex_ray.functions.aggregate import grouped_apply
    bands = docs_ds.map_batches(_explode_simhash_bands, batch_format="pandas",
                                batch_size=4096, fn_kwargs={"col": col})
    pairs = grouped_apply(bands, ["band", "band_val"],
                          lambda b: _simhash_block_pairs(b, max_hamming),
                          num_partitions=num_partitions or 8)
    return grouped_apply(pairs, ["doc_a", "doc_b"],
                         lambda b: b.drop_duplicates(["doc_a", "doc_b"])
                         if "doc_a" in b.columns else b,
                         num_partitions=num_partitions or 8)


def simhash_candidates(docs_ds, *, max_hamming: int = 3, col: str = "text",
                       num_partitions: int | None = None) -> pd.DataFrame:
    """Driver-facing wrapper over ``simhash_candidates_ds`` (use the
    Dataset variant when the pair table can be large)."""
    allp = simhash_candidates_ds(docs_ds, max_hamming=max_hamming, col=col,
                                 num_partitions=num_partitions).to_pandas()
    if len(allp) == 0:
        return pd.DataFrame(columns=["doc_a", "doc_b", "hamming"])
    return allp[["doc_a", "doc_b", "hamming"]].sort_values(
        ["doc_a", "doc_b"]).reset_index(drop=True)


# ---------- embedding cosine near-dup ----------

@_lru_cache(maxsize=8)
def _lsh_planes(seed: int, dim: int, n_planes: int) -> np.ndarray:
    """Projection planes, generated once per worker process (seeded ⇒
    identical everywhere) instead of once per batch."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((dim, n_planes))


def embedding_near_dups(emb_ds, *, threshold: float = 0.95,
                        n_projections: int = 10, n_tables: int = 12,
                        seed: int = 11, cap: int = 2000,
                        num_partitions: int | None = None,
                        broadcast_threshold: int = 200_000) -> pd.DataFrame:
    """Near-duplicate vectors by cosine — the 100 TB scale path.

    Multi-table sign-projection LSH (OR-construction): a pair at cosine
    θ matches one table's bucket with p(θ)^P (p = 1 − arccos(θ)/π);
    with T tables recall = 1 − (1 − p^P)^T. Defaults (P=10, T=12) give
    ≈ 0.994 recall at θ = 0.95.

    Dataflow (the bucket shuffle moves ONLY (vec_id, table, bucket)
    rows — vectors are never replicated through the T-table explode,
    which would be T× the corpus's vector bytes through one
    all-to-all):

    1. bucketize: T bucket-id rows per vector, no vector payload;
    2. co-locate by (table, bucket) → candidate pairs (id-only, capped
       per bucket with logged drops);
    3. dedup pairs by pair key;
    4. exact-cosine verify: candidate vectors are attached once —
       broadcast id→row matrix when the candidate set is small
       (bounded by the near-dup vec count), else two co-located joins
       of the pair table against the (1×) vector table.
    Input shape: (vec_id, embedding list<float>)."""
    from jerex_ray.functions.aggregate import grouped_apply

    n_vecs = emb_ds.count()
    small = n_vecs <= _SINGLE_BLOCK_DOCS

    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        vecs = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        planes = _lsh_planes(seed, vecs.shape[1], n_tables * n_projections)
        signs = (vecs @ planes) > 0
        weights = 1 << np.arange(n_projections)
        n = len(batch)
        buckets = np.empty((n, n_tables), dtype=np.int64)
        for t in range(n_tables):
            block = signs[:, t * n_projections:(t + 1) * n_projections]
            buckets[:, t] = block.dot(weights)
        return pd.DataFrame({
            "vec_id": np.repeat(batch["vec_id"].to_numpy(), n_tables),
            "table": np.tile(np.arange(n_tables, dtype=np.int64), n),
            "bucket": buckets.ravel(),
        })

    def bucket_pairs_block(block: pd.DataFrame) -> pd.DataFrame:
        a_out, b_out = [], []
        dup = block[block.duplicated(["table", "bucket"], keep=False)]
        dropped = 0
        for _, g in dup.groupby(["table", "bucket"], sort=False):
            ids = np.sort(g["vec_id"].unique())
            if ids.size > cap:
                dropped += ids.size - cap
                ids = ids[:cap]
            if ids.size < 2:
                continue
            iu, ju = np.triu_indices(ids.size, k=1)
            a_out.append(ids[iu])
            b_out.append(ids[ju])
        if dropped:
            logger.warning("embedding LSH bucket cap=%d truncated %d vecs",
                           cap, dropped)
        if not a_out:
            return pd.DataFrame({"vec_a": pd.Series(dtype="int64"),
                                 "vec_b": pd.Series(dtype="int64")})
        return pd.DataFrame({"vec_a": np.concatenate(a_out),
                             "vec_b": np.concatenate(b_out)})

    b = emb_ds.map_batches(bucketize, batch_format="pandas",
                           batch_size=4096)
    pairs = grouped_apply(b, ["table", "bucket"], bucket_pairs_block,
                          num_partitions=num_partitions,
                          single_block=small)
    pairs = grouped_apply(pairs, ["vec_a", "vec_b"],
                          lambda d: (d.drop_duplicates(["vec_a", "vec_b"])
                                     if "vec_a" in d.columns else d),
                          num_partitions=num_partitions,
                          single_block=small)

    if n_vecs <= broadcast_threshold:
        out = _verify_pairs_broadcast(emb_ds, pairs, threshold)
    else:
        out = _verify_pairs_joined(emb_ds, pairs, threshold,
                                   num_partitions=num_partitions)
    if len(out) == 0:
        return pd.DataFrame(columns=["vec_a", "vec_b", "cosine"])
    return out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)


def _normed_matrix(batch: pd.DataFrame, id_filter=None):
    rows = batch
    if id_filter is not None:
        rows = rows[rows["vec_id"].isin(id_filter)]
    if not len(rows):
        return None
    vecs = np.stack(rows["embedding"].to_numpy()).astype(np.float64)
    vecs /= np.clip(np.linalg.norm(vecs, axis=1, keepdims=True),
                    1e-12, None)
    return rows["vec_id"].to_numpy(), vecs.astype(np.float32)


def _verify_pairs_broadcast(emb_ds, pairs_ds, threshold: float) -> pd.DataFrame:
    """Exact-cosine verify with the CANDIDATE vectors broadcast once
    (bounded by the near-dup candidate count, not the corpus)."""
    import ray

    ids_df = pairs_ds.map_batches(
        lambda b: pd.DataFrame(
            {"vec_id": pd.unique(pd.concat([b["vec_a"], b["vec_b"]]))})
        if "vec_a" in b.columns else
        pd.DataFrame({"vec_id": pd.Series(dtype="int64")}),
        batch_format="pandas").to_pandas()
    cand = (set(ids_df["vec_id"].tolist())
            if "vec_id" in ids_df.columns else set())
    if not cand:
        return pd.DataFrame(columns=["vec_a", "vec_b", "cosine"])
    cand_ref = ray.put(cand)
    mats = emb_ds.map_batches(
        lambda b: (lambda m: pd.DataFrame(
            {"vec_id": m[0], "vec": list(m[1])}) if m is not None else
            pd.DataFrame({"vec_id": pd.Series(dtype="int64"),
                          "vec": pd.Series(dtype="object")}))(
            _normed_matrix(b, ray.get(cand_ref))),
        batch_format="pandas").to_pandas()
    lookup_ids = mats["vec_id"].to_numpy()
    lookup = np.stack(mats["vec"].to_numpy()) if len(mats) else np.empty((0, 1))
    order = np.argsort(lookup_ids)
    lookup_ids, lookup = lookup_ids[order], lookup[order]
    mat_ref = ray.put((lookup_ids, lookup))

    def verify(b: pd.DataFrame) -> pd.DataFrame:
        if b.empty or "vec_a" not in b.columns:
            return pd.DataFrame({"vec_a": pd.Series(dtype="int64"),
                                 "vec_b": pd.Series(dtype="int64"),
                                 "cosine": pd.Series(dtype="float64")})
        ids, m = ray.get(mat_ref)
        ia = np.searchsorted(ids, b["vec_a"].to_numpy())
        ib = np.searchsorted(ids, b["vec_b"].to_numpy())
        cos = np.einsum("ij,ij->i", m[ia].astype(np.float64),
                        m[ib].astype(np.float64))
        out = b.assign(cosine=cos)
        return out[out["cosine"] >= threshold][["vec_a", "vec_b", "cosine"]]

    return pairs_ds.map_batches(verify, batch_format="pandas").to_pandas()


def _verify_pairs_joined(emb_ds, pairs_ds, threshold: float, *,
                         num_partitions: int | None = None) -> pd.DataFrame:
    """Exact-cosine verify for candidate sets too large to broadcast:
    two co-located joins attach each side's normalized vector (the
    vector table crosses each shuffle exactly once — never T×). Union
    rows keep int64 keys via -1 sentinels (never NaN-promoted floats),
    with ``__m`` marking vector rows; vectors travel as float32 BYTES
    (a plain binary column shuffles cleanly where arrow tensor
    extension types choke on empty blocks)."""
    from jerex_ray.functions.aggregate import grouped_apply

    _EMPTY_VEC = b""

    def vec_rows(b: pd.DataFrame) -> pd.DataFrame:
        m = _normed_matrix(b)
        if m is None:
            return pd.DataFrame({"vec_id": pd.Series(dtype="int64"),
                                 "vec": pd.Series(dtype="object")})
        return pd.DataFrame({"vec_id": m[0],
                             "vec": [row.tobytes() for row in m[1]]})

    vec_rows_ds = emb_ds.map_batches(vec_rows, batch_format="pandas",
                                     batch_size=4096)

    def attach(side: str, pairs, carry: list[str]):
        """One co-located join round: key on ``side``, append that
        side's vector as a new object column ``v_<side>``."""
        vcol = "v_" + side

        def tag_pairs(b: pd.DataFrame) -> pd.DataFrame:
            if b.empty or side not in b.columns:
                return pd.DataFrame(
                    {"key": pd.Series(dtype="int64"),
                     **{c: pd.Series(dtype="int64") for c in
                        ("vec_a", "vec_b")},
                     **{c: pd.Series(dtype="object") for c in carry},
                     "vec": pd.Series(dtype="object"),
                     "__m": pd.Series(dtype="int8")})
            out = b.copy()
            out["key"] = out[side]
            out["vec"] = [_EMPTY_VEC] * len(out)
            out["__m"] = np.int8(0)
            return out[["key", "vec_a", "vec_b", *carry, "vec", "__m"]]

        def tag_vecs(b: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({"key": b["vec_id"]})
            out["vec_a"] = np.int64(-1)
            out["vec_b"] = np.int64(-1)
            for c in carry:
                out[c] = [_EMPTY_VEC] * len(out)
            out["vec"] = b["vec"].to_numpy()
            out["__m"] = np.int8(1)
            return out

        def join_block(block: pd.DataFrame) -> pd.DataFrame:
            cols = ["vec_a", "vec_b", *carry, vcol]
            if block.empty or "__m" not in block.columns:
                return pd.DataFrame(
                    {c: pd.Series(dtype="object" if c in carry
                                  or c == vcol else "int64")
                     for c in cols})
            vrows = block[block["__m"] == 1]
            lookup = dict(zip(vrows["key"].to_numpy(),
                              vrows["vec"].to_numpy()))
            prows = block[block["__m"] == 0]
            keep = prows["key"].isin(lookup)
            prows = prows[keep]
            out = prows[["vec_a", "vec_b", *carry]].copy()
            out[vcol] = [lookup[k] for k in prows["key"].to_numpy()]
            return out

        return grouped_apply(
            pairs.map_batches(tag_pairs, batch_format="pandas")
                 .union(vec_rows_ds.map_batches(tag_vecs,
                                                batch_format="pandas")),
            ["key"], join_block, num_partitions=num_partitions)

    with_a = attach("vec_a", pairs_ds, carry=[])
    with_b = attach("vec_b", with_a, carry=["v_vec_a"])

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        if b.empty or "v_vec_a" not in b.columns \
                or "v_vec_b" not in b.columns:
            return pd.DataFrame({"vec_a": pd.Series(dtype="int64"),
                                 "vec_b": pd.Series(dtype="int64"),
                                 "cosine": pd.Series(dtype="float64")})
        va = np.stack([np.frombuffer(x, dtype=np.float32)
                       for x in b["v_vec_a"]]).astype(np.float64)
        vb = np.stack([np.frombuffer(x, dtype=np.float32)
                       for x in b["v_vec_b"]]).astype(np.float64)
        cos = np.einsum("ij,ij->i", va, vb)
        out = b.assign(cosine=cos)
        return out[out["cosine"] >= threshold][["vec_a", "vec_b", "cosine"]]

    return with_b.map_batches(finish, batch_format="pandas").to_pandas()


def embedding_near_dups_exact(emb_ds, *, threshold: float = 0.95) -> pd.DataFrame:
    """EXACT all-pairs cosine near-dups — the oracle-checked baseline.

    The (normalized) embedding matrix is broadcast once via ``ray.put``
    and every batch matmuls its rows against it, keeping only
    (vec_a < vec_b, cosine ≥ threshold). Exact but O(N²) compares and
    O(N·d) broadcast memory — use the LSH variant above when the table
    doesn't fit the object store as one matrix."""
    import ray

    full = emb_ds.to_pandas()
    if len(full) == 0:
        return pd.DataFrame(columns=["vec_a", "vec_b", "cosine"])
    all_ids = full["vec_id"].to_numpy()
    mat = np.stack(full["embedding"].to_numpy()).astype(np.float64)
    mat = mat / np.clip(np.linalg.norm(mat, axis=1, keepdims=True),
                        1e-12, None)
    ref = ray.put((all_ids, mat))

    def block(batch: pd.DataFrame) -> pd.DataFrame:
        ids_all, m_all = ray.get(ref)
        vecs = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        vecs = vecs / np.clip(np.linalg.norm(vecs, axis=1, keepdims=True),
                              1e-12, None)
        ids = batch["vec_id"].to_numpy()
        sims = vecs @ m_all.T
        mask = (sims >= threshold) & (ids[:, None] < ids_all[None, :])
        ii, jj = np.nonzero(mask)
        return pd.DataFrame({"vec_a": ids[ii], "vec_b": ids_all[jj],
                             "cosine": sims[ii, jj].astype(np.float64)})

    out = emb_ds.map_batches(block, batch_format="pandas",
                             batch_size=4096).to_pandas()
    if len(out) == 0:
        return pd.DataFrame(columns=["vec_a", "vec_b", "cosine"])
    return out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)


def incremental_exact_dedup(incoming_ds, base_ds, *,
                            broadcast_threshold: int = 5_000_000,
                            num_partitions: int | None = None):
    """Exact dedup of an INCOMING shard against an already-ingested
    BASE corpus plus itself — the streaming-ingest production shape:
    the base is consulted only through its (distinct) normalized-text
    fingerprint index, never rescanned per incoming doc.

    * base index: one streaming pass → per-batch distinct fingerprints
      → global distinct through the combiner (fingerprint-sized, not
      corpus-sized when dup-heavy).
    * incoming: fingerprint per doc; drop docs whose fingerprint is in
      the base index (broadcast set under ``broadcast_threshold``,
      hash ``left_anti`` Dataset.join above it); among the remainder,
      the existing keep-smallest-doc_id reduce dedups within the shard.

    Returns the surviving incoming docs (doc_id + fingerprint)."""
    import ray

    from jerex_ray.functions.aggregate import grouped_apply

    base_fp = base_ds.map_batches(
        lambda b: add_fingerprint(b)[["fp"]].drop_duplicates(),
        batch_format="pandas", batch_size=8192).materialize()
    inc = incoming_ds.map_batches(add_fingerprint,
                                  batch_format="pandas",
                                  batch_size=8192)
    n_base = base_fp.count()
    if n_base == 0:
        fresh = inc
    elif n_base <= broadcast_threshold:
        ref = ray.put(set(base_fp.to_pandas()["fp"].tolist()))

        def drop_known(df: pd.DataFrame) -> pd.DataFrame:
            return df[~df["fp"].isin(ray.get(ref))]

        fresh = inc.map_batches(drop_known, batch_format="pandas")
    else:
        fresh = inc.join(base_fp.map_batches(
            lambda b: b.drop_duplicates("fp"), batch_format="pandas",
            batch_size=None).materialize(),
            join_type="left_anti", num_partitions=8,
            on=("fp",), right_on=("fp",))
    return grouped_apply(fresh, ["fp"], _keep_min_doc_block,
                         num_partitions=num_partitions)


def jaccard_edges_prefix(docs_ds, *, threshold: float = 0.7,
                         col: str = "text", k: int = 3,
                         num_partitions: int | None = None):
    """EXACT n-gram Jaccard near-dup edges via PREFIX FILTERING
    (Chaudhuri/Ganti/Kaushik '06, Xiao et al. '08 PPJoin family) — the
    third exact algorithm next to the all-gram-pairs scorer
    (``jaccard_edges_exact``) and the probabilistic LSH path.

    The filter: order every doc's distinct grams by ascending global
    document frequency (rarest first, ties on gram hash); with
    m distinct grams, any pair with jaccard ≥ t must overlap in
    ≥ ⌈t·m⌉ grams, so the first ``m − ⌈t·m⌉ + 1`` grams (the PREFIX)
    of BOTH docs must intersect. Candidates therefore come only from
    prefix-gram co-location — boilerplate grams are frequent, land
    LAST in the ordering, and never generate pairs; the classic
    all-pairs blow-up on hot grams disappears instead of being capped.

    Dataflow (nothing pair- or gram-sized on the driver):
      1. one shingle pass → (doc_id, g, c) distinct-gram rows;
      2. gram document frequencies: one combiner aggregate;
      3. df joins back to gram rows by gram co-location (union +
         grouped_apply — the engine's join-without-Dataset.join);
      4. per-doc prefix selection after doc co-location;
      5. prefix-gram co-location → candidate pairs (doc_a < doc_b);
      6. exact verify: candidate pairs explode to both endpoints,
         join each side's FULL gram set by doc co-location, then the
         shared (pair, gram) rows reduce to intersection counts and
         jaccard = n / (ca + cb − n).

    Returns (doc_a, doc_b, jaccard) with jaccard ≥ threshold; agrees
    with ``jaccard_edges_exact`` on any corpus (both exact; pinned by
    test and by sharing the all-pairs SQL oracle). Empty docs have no
    grams, hence no prefix, hence no edges — matching the exact path's
    treatment of ja=1.0 only for empty-empty pairs, which carry no
    content and are dropped here (documented divergence: the exact
    path emits them only when both docs are empty AND candidates —
    impossible without grams — so behavior is identical)."""
    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply

    # None → shuffle_partitions() sizes each exchange to the cluster.
    # This DAG chains ~8 hash shuffles; a hardcoded partition count
    # multiplies live aggregator-actor demand (ops × parts × 0.125 CPU)
    # and starves a small cluster outright.
    nparts = num_partitions
    grams = docs_ds.map_batches(
        lambda b: _gram_rows(b, col=col, k=k, with_counts=True),
        batch_format="pandas", batch_size=4096).map_batches(
        lambda b: b[b["g"] != -1],           # drop empty-doc sentinels
        batch_format="pandas").materialize()

    df_ds = grouped_aggregate(grams, ["g"], {"df": (None, "count")},
                              result_hint="large")

    # --- step 3: attach df to every (doc, gram) row, keyed by gram ---
    g_tagged = grams.map_batches(
        lambda b: pd.DataFrame({"g": b["g"], "doc_id": b["doc_id"],
                                "c": b["c"], "df": np.int64(-1)}),
        batch_format="pandas")
    d_tagged = df_ds.map_batches(
        lambda b: pd.DataFrame({"g": b["g"],
                                "doc_id": np.int64(-1),
                                "c": np.int64(-1),
                                "df": b["df"].astype("int64")})
        if "g" in b.columns else
        pd.DataFrame({"g": pd.Series(dtype="int64"),
                      "doc_id": pd.Series(dtype="int64"),
                      "c": pd.Series(dtype="int64"),
                      "df": pd.Series(dtype="int64")}),
        batch_format="pandas")

    def attach_df(block: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                            "g": pd.Series(dtype="int64"),
                            "c": pd.Series(dtype="int64"),
                            "df": pd.Series(dtype="int64")})
        if block.empty or "df" not in block.columns:
            return out
        dfs = block.loc[block["doc_id"] == -1, ["g", "df"]]
        rows = block[block["doc_id"] != -1]
        if rows.empty:
            return out
        m = rows.merge(dfs, on="g", suffixes=("_x", ""))
        return m[["doc_id", "g", "c", "df"]]

    # Materialization barriers between exchanges: Ray 2.49's streaming
    # executor livelocks when ~8 hash-shuffle ops are alive in ONE
    # topology (aggregator pools all parked waiting on each other —
    # observed directly: 9 idle HashShuffleAggregators, 96% idle CPU).
    # Each barrier keeps ≤2 concurrent exchanges per execution and the
    # blocks live in the (spillable) object store, never the driver.
    # Bonus: `pairs` and `grams` are consumed twice below — the
    # barrier also prevents recomputing their upstream shuffles.
    with_df = grouped_apply(g_tagged.union(d_tagged), ["g"], attach_df,
                            num_partitions=nparts).materialize()

    # --- step 4: per-doc prefix (rarest grams first) ---
    def prefix_block(block: pd.DataFrame) -> pd.DataFrame:
        if block.empty:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "g": pd.Series(dtype="int64")})
        b = block.sort_values(["doc_id", "df", "g"])
        m = b["c"].to_numpy(np.int64)
        rank = b.groupby("doc_id", sort=False).cumcount().to_numpy()
        plen = m - np.ceil(threshold * m).astype(np.int64) + 1
        keep = rank < plen
        return b.loc[keep, ["doc_id", "g"]]

    prefix = grouped_apply(with_df, ["doc_id"], prefix_block,
                           num_partitions=nparts).materialize()

    # --- step 5: candidate pairs from prefix-gram co-location ---
    def pair_block(block: pd.DataFrame) -> pd.DataFrame:
        a_out, b_out = [], []
        hot = block[block.duplicated("g", keep=False)]
        for _, grp in hot.groupby("g", sort=False):
            ids = np.sort(grp["doc_id"].to_numpy(np.int64))
            iu, ju = np.triu_indices(ids.size, k=1)
            a_out.append(ids[iu])
            b_out.append(ids[ju])
        if not a_out:
            return pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                                 "doc_b": pd.Series(dtype="int64")})
        return pd.DataFrame({"doc_a": np.concatenate(a_out),
                             "doc_b": np.concatenate(b_out)}) \
            .drop_duplicates()

    pairs = grouped_apply(prefix, ["g"], pair_block,
                          num_partitions=nparts)
    pairs = grouped_apply(pairs, ["doc_a", "doc_b"],
                          lambda b: b.drop_duplicates()
                          if not b.empty else b,
                          num_partitions=nparts).materialize()

    # --- step 6: exact verify via pair-endpoint gram joins ---
    def side_rows(which: str):
        key = "doc_a" if which == "a" else "doc_b"

        def fn(b: pd.DataFrame) -> pd.DataFrame:
            if b.empty or "doc_a" not in b.columns:
                return pd.DataFrame(
                    {"doc_id": pd.Series(dtype="int64"),
                     "doc_a": pd.Series(dtype="int64"),
                     "doc_b": pd.Series(dtype="int64"),
                     "g": pd.Series(dtype="int64"),
                     "c": pd.Series(dtype="int64")})
            return pd.DataFrame({"doc_id": b[key].astype("int64"),
                                 "doc_a": b["doc_a"].astype("int64"),
                                 "doc_b": b["doc_b"].astype("int64"),
                                 "g": np.int64(-1), "c": np.int64(-1)})
        return fn

    def expand_side(block: pd.DataFrame) -> pd.DataFrame:
        """Co-located by doc_id: pair stubs (g=-1) pick up EVERY gram
        of their endpoint doc."""
        out = pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                            "doc_b": pd.Series(dtype="int64"),
                            "g": pd.Series(dtype="int64"),
                            "c": pd.Series(dtype="int64")})
        if block.empty or "doc_a" not in block.columns:
            return out
        stubs = block[block["g"] == -1]
        doc_grams = block[block["g"] != -1]
        if stubs.empty or doc_grams.empty:
            return out
        m = stubs[["doc_id", "doc_a", "doc_b"]].merge(
            doc_grams[["doc_id", "g", "c"]], on="doc_id")
        return m[["doc_a", "doc_b", "g", "c"]]

    gram_rows_tagged = grams.map_batches(
        lambda b: pd.DataFrame({"doc_id": b["doc_id"],
                                "doc_a": np.int64(-1),
                                "doc_b": np.int64(-1),
                                "g": b["g"], "c": b["c"]}),
        batch_format="pandas")
    sides = []
    for which in ("a", "b"):
        stub = pairs.map_batches(side_rows(which), batch_format="pandas")
        side = grouped_apply(stub.union(gram_rows_tagged), ["doc_id"],
                             expand_side, num_partitions=nparts)
        sides.append(side.map_batches(
            lambda b, w=which: b.rename(columns={"c": f"c_{w}"})
            .assign(**{f"c_{'b' if w == 'a' else 'a'}": np.int64(-1)}),
            batch_format="pandas").materialize())

    def reduce_pair_gram(block: pd.DataFrame) -> pd.DataFrame:
        """Co-located by (pair, gram): a gram with BOTH sides present
        is one intersection vote; ca/cb ride along."""
        out = pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                            "doc_b": pd.Series(dtype="int64"),
                            "n": pd.Series(dtype="int64"),
                            "ca": pd.Series(dtype="int64"),
                            "cb": pd.Series(dtype="int64")})
        if block.empty or "doc_a" not in block.columns:
            return out
        g = block.groupby(["doc_a", "doc_b", "g"], sort=False).agg(
            ca=("c_a", "max"), cb=("c_b", "max"),
            cnt=("g", "size")).reset_index()
        both = g[g["cnt"] >= 2]
        if both.empty:
            return out
        agg = both.groupby(["doc_a", "doc_b"], sort=False).agg(
            n=("g", "size"), ca=("ca", "max"),
            cb=("cb", "max")).reset_index()
        return agg[["doc_a", "doc_b", "n", "ca", "cb"]]

    pair_grams = grouped_apply(sides[0].union(sides[1]),
                               ["doc_a", "doc_b", "g"],
                               reduce_pair_gram, num_partitions=nparts)

    def finalize(block: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                            "doc_b": pd.Series(dtype="int64"),
                            "jaccard": pd.Series(dtype="float64")})
        if block.empty or "doc_a" not in block.columns:
            return out
        agg = block.groupby(["doc_a", "doc_b"], sort=False).agg(
            n=("n", "sum"), ca=("ca", "max"),
            cb=("cb", "max")).reset_index()
        ja = agg["n"].to_numpy(np.float64) / (
            agg["ca"].to_numpy(np.float64)
            + agg["cb"].to_numpy(np.float64)
            - agg["n"].to_numpy(np.float64))
        keep = ja >= threshold
        return pd.DataFrame({"doc_a": agg["doc_a"].to_numpy()[keep],
                             "doc_b": agg["doc_b"].to_numpy()[keep],
                             "jaccard": ja[keep]})

    return grouped_apply(pair_grams, ["doc_a", "doc_b"], finalize,
                         num_partitions=nparts)


def sorted_neighborhood_pairs(docs_ds, *, window: int = 3,
                              key_chars: int = 24,
                              num_buckets: int = 64,
                              num_partitions: int | None = None):
    """Sorted-neighborhood blocking (Hernández & Stolfo '95): order the
    corpus by a normalized key (first ``key_chars`` lowercased chars)
    and emit every pair within ``window`` positions — the classic
    low-tech candidate generator that catches prefix-similar records
    LSH misses and costs exactly window × corpus pairs.

    Distributed rank without a global sort (the ``global_rank`` shape,
    generalized to STRING keys): the key's first 6 UTF-8 bytes pack
    big-endian into a float64 — order-consistent with the full
    lexicographic key, so exact-quantile range buckets on the number
    put every full-key tie in one bucket; each co-located bucket sorts
    locally by (key, doc_id) and adds its global offset. Pairing ships
    each ranked row to its own anchor plus the ``window`` anchors
    above; each anchor group pairs its self row with the buddies.
    Nothing corpus-sized touches the driver (``num_buckets`` scalars).
    """
    import ray

    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply
    from jerex_ray.ops.quantiles import distributed_quantiles

    def with_key(df: pd.DataFrame) -> pd.DataFrame:
        key = df["text"].fillna("").str.lower().str.slice(0, key_chars)
        # UTF-8 byte order == code-point order, so the 6-byte prefix
        # is order-consistent with the full key for any input
        pre = np.asarray(key.str.encode("utf-8").to_numpy(),
                         dtype="S6") \
            .view(np.uint8).reshape(-1, 6).astype(np.float64)
        keynum = pre @ (256.0 ** np.arange(5, -1, -1))
        return pd.DataFrame({"doc_id": df["doc_id"], "key": key,
                             "keynum": keynum})

    keyed = docs_ds.map_batches(with_key, batch_format="pandas",
                                batch_size=65536)

    qs = [i / num_buckets for i in range(1, num_buckets)]
    pivots = np.unique(np.asarray(
        distributed_quantiles(keyed, "keynum", qs), dtype=np.float64))
    piv_ref = ray.put(pivots)

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        p = ray.get(piv_ref)
        out = df.copy()
        out["__bucket"] = np.searchsorted(
            p, df["keynum"].to_numpy(np.float64), side="left") \
            .astype(np.int64)
        return out

    bucketed = keyed.map_batches(with_bucket, batch_format="pandas",
                                 batch_size=65536).materialize()
    counts = grouped_aggregate(bucketed, ["__bucket"],
                               {"n": (None, "count")}).to_pandas()
    counts = counts.sort_values("__bucket")
    offsets = dict(zip(
        counts["__bucket"].astype(int),
        np.concatenate(([0], np.cumsum(counts["n"].to_numpy())[:-1]))
        .astype(np.int64)))
    off_ref = ray.put(offsets)

    def rank_block(block: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                            "rnk": pd.Series(dtype="int64")})
        if block.empty or "doc_id" not in block.columns:
            return out
        offs = ray.get(off_ref)
        parts = []
        for bk, sub in block.groupby("__bucket", sort=False):
            s = sub.sort_values(["key", "doc_id"])
            parts.append(pd.DataFrame(
                {"doc_id": s["doc_id"].to_numpy(),
                 "rnk": offs[int(bk)]
                 + np.arange(len(s), dtype=np.int64)}))
        return pd.concat(parts, ignore_index=True)

    ranked = grouped_apply(bucketed, ["__bucket"], rank_block,
                           num_partitions=num_partitions).materialize()

    def to_anchors(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "rnk" not in df.columns:
            return pd.DataFrame({"anchor": pd.Series(dtype="int64"),
                                 "rnk": pd.Series(dtype="int64"),
                                 "doc_id": pd.Series(dtype="int64")})
        r = df["rnk"].to_numpy(np.int64)
        d = df["doc_id"].to_numpy(np.int64)
        reps = window + 1
        anchor = np.repeat(r, reps) + np.tile(
            np.arange(reps, dtype=np.int64), len(r))
        return pd.DataFrame({"anchor": anchor,
                             "rnk": np.repeat(r, reps),
                             "doc_id": np.repeat(d, reps)})

    def pair_block(block: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                            "doc_b": pd.Series(dtype="int64"),
                            "rank_gap": pd.Series(dtype="int64")})
        if block.empty or "anchor" not in block.columns:
            return out
        selfs = block[block["rnk"] == block["anchor"]]
        buddies = block[block["rnk"] < block["anchor"]]
        if selfs.empty or buddies.empty:
            return out
        m = buddies.merge(selfs[["anchor", "doc_id"]], on="anchor",
                          suffixes=("_lo", "_hi"))
        return pd.DataFrame(
            {"doc_a": m["doc_id_lo"].to_numpy(np.int64),
             "doc_b": m["doc_id_hi"].to_numpy(np.int64),
             "rank_gap": (m["anchor"] - m["rnk"]).to_numpy(np.int64)})

    return grouped_apply(
        ranked.map_batches(to_anchors, batch_format="pandas"),
        ["anchor"], pair_block, num_partitions=num_partitions)
