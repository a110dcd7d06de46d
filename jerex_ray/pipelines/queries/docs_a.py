"""Split of the query registry: ``docs_a`` part (mechanically derived from the original queries.py by scripts/split_queries.py; unit order and source text preserved)."""

from __future__ import annotations
import re
import numpy as np
import pandas as pd
from jerex_ray.config import PipelineConfig
from jerex_ray.runtime import configure_data_context
from jerex_ray.pipelines.queries._shared import ORACLE_REGISTRY
from jerex_ray.pipelines.queries._shared import _BM25_QUERIES, _CapMentionStage, _EXACT_JACCARD_EDGES_SQL, _N_TOKENS_SQL, _canonical_entities_sql, _doc_mentions_sql, _query_vectors  # noqa: E501

def doc_normalize_text(sf_dir: str):
    """Canonical text normalization (the step before any
    hashing/dedup in a multilingual corpus): unicode NFC + lowercase
    + whitespace collapse + trim, vectorized per batch. Parity with
    DuckDB's ``nfc_normalize`` verified character-for-character."""
    import unicodedata

    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def norm(df: pd.DataFrame) -> pd.DataFrame:
        t = df["text"].fillna("").map(
            lambda s: unicodedata.normalize("NFC", s))
        t = t.str.lower().str.split().str.join(" ")
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(),
                             "norm_text": t.to_numpy()})

    out = ds.map_batches(norm, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)

def doc_corpus_stats(sf_dir: str):
    """The release-card summary every published dataset ships: doc
    count, token totals/mean, exact p50/p95 token counts (shuffle-free
    quantile selector), and distinct language count — one combiner
    aggregate + one quantile pass over a single pruned read, one row
    out."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.ops.quantiles import distributed_quantiles
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text", "lang"])

    def tok_counts(df: pd.DataFrame) -> pd.DataFrame:
        n = df["text"].fillna("").str.split().str.len()
        return pd.DataFrame({"n_tokens": n.astype("float64"),
                             "lang": df["lang"]})

    toks = ds.map_batches(tok_counts, batch_format="pandas") \
        .materialize()
    agg = grouped_aggregate(toks, ["lang"],
                            {"n_docs": (None, "count"),
                             "n_tokens": ("n_tokens", "sum")}).to_pandas()
    p50, p95 = distributed_quantiles(toks, "n_tokens", [0.5, 0.95])
    n_docs = int(agg["n_docs"].sum())
    total = float(agg["n_tokens"].sum())
    return pd.DataFrame({
        "n_docs": [np.int64(n_docs)],
        "total_tokens": [np.int64(total)],
        "mean_tokens": [round(total / max(n_docs, 1), 6)],
        "p50_tokens": [round(float(p50), 6)],
        "p95_tokens": [round(float(p95), 6)],
        "n_langs": [np.int64(len(agg))]})

def doc_redact_persons(sf_dir: str):
    """PII scrubbing: every PER-typed rule mention replaced by
    ``[NAME]`` (``_RedactStage`` actor pool; tokens re-joined with
    single spaces — the canonical reassembly). The SQL oracle rebuilds
    the identical redacted string from the shared mention-runs CTE
    plus a per-position PER-run membership join."""
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    out = ds.map_batches(_RedactStage, batch_format="pandas",
                         batch_size=4096, concurrency=(1, 4)).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)

def doc_shuffle_order(sf_dir: str, *, seed: int = 42):
    """Reproducible global training-order shuffle: every doc gets a
    deterministic position 0..N−1 by ranking an md5(seed-salted id)
    key — the epoch-shuffle a pretraining loader needs, stable under
    resharding and restart (unlike ``random_shuffle``, the order is a
    pure function of ids + seed, so a resumed job replays it).

    Scale shape: the rank is ``relational.global_rank`` — exact
    quantile pivots bucket the key space, one combiner pass counts
    buckets, blocks sort only their own buckets and add broadcast
    offsets; the corpus is never sorted in one place. A new epoch is
    a new seed. Oracled by the SQL row_number over the identical
    md5-derived key."""
    from jerex_ray.relational import global_rank
    from jerex_ray.runtime import read_parquet_sized
    from jerex_ray.util import md5_hash64_batch
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id"])

    def key(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy()
        h = md5_hash64_batch(f"{i}:{seed}" for i in ids)
        # ranking key as float64, mirrored by the oracle's CAST(...
        # AS DOUBLE): >2^53 hashes collide in float — the (key, id)
        # in-bucket sort breaks those ties identically on both sides
        return pd.DataFrame({"doc_id": ids.astype("int64"),
                             "shuffle_key": h.astype(np.float64)})

    ranked = global_rank(ds.map_batches(key, batch_format="pandas"),
                         value_col="shuffle_key", id_col="doc_id")
    out = ranked.to_pandas()[["doc_id", "rnk"]] \
        .rename(columns={"rnk": "pos"})
    out["doc_id"] = out["doc_id"].astype("int64")
    out["pos"] = out["pos"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)

class _RedactStage:
    """Actor-pool PII scrubber: run the rule mention localizer (same
    capitalized-token convention as ``_CapMentionStage``), then
    replace every token of a PER-typed mention with ``[NAME]`` in the
    ORIGINAL token stream and re-join with single spaces (the
    canonical reassembly the SQL oracle reproduces). The anonymization
    pass every shared-corpus pipeline needs before release."""

    def __init__(self):
        from jerex_ray.stages.scorer import RuleScorer
        self.scorer = RuleScorer(PipelineConfig())

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from jerex_ray.lexicon import entity_type_of

        ids, reds, n_redacted = [], [], []
        for doc_id, text in zip(batch["doc_id"], batch["text"].fillna("")):
            orig = text.split()
            toks = [t[0].upper() + t[1:] for t in orig]
            n = 0
            if toks:
                ms, _, _, _, _ = self.scorer._score_doc(
                    toks, np.zeros(len(toks), dtype=np.int32),
                    np.asarray([0, len(toks)], dtype=np.int32))
                for s, e, _sent in ms:
                    if entity_type_of(toks[s:e]) == "PER":
                        for i in range(s, e):
                            orig[i] = "[NAME]"
                        n += 1
            ids.append(doc_id)
            reds.append(" ".join(orig))
            n_redacted.append(n)
        return pd.DataFrame({
            "doc_id": pd.Series(ids, dtype="int64"),
            "redacted": pd.Series(reds, dtype="object"),
            "n_redacted": pd.Series(n_redacted, dtype="int64")})

def doc_token_stats(sf_dir: str):
    from jerex_ray.ops.textstats import run_token_stats
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return run_token_stats(ds).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)

def doc_quality(sf_dir: str):
    from jerex_ray.ops.textstats import run_quality_stats
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return run_quality_stats(ds).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)

def doc_exact_dedup(sf_dir: str):
    from jerex_ray.ops.dedup import exact_dedup
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    kept = exact_dedup(ds).to_pandas()
    return kept[["doc_id"]].sort_values("doc_id").reset_index(drop=True)

def doc_langid(sf_dir: str):
    from jerex_ray.ops.textstats import run_langid
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return run_langid(ds).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)

def doc_name_mentions(sf_dir: str):
    """Rule mention localization (M1 candidate spans + the maximal
    name-token-run rule of ``RuleScorer._score_mentions``) run over the
    documents table with each token's first character uppercased — a
    deterministic SQL-reconstructible casing, so a gaps-and-islands
    oracle verifies the mention operator exactly: maximal runs of
    name-shaped tokens (regex + stopword breaks) of width ≤ 10."""
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    out = ds.map_batches(_CapMentionStage, batch_format="pandas",
                         batch_size=4096, concurrency=(1, 4),
                         fn_constructor_kwargs={"mode": "spans"}).to_pandas()
    return out.sort_values(["doc_id", "m_start"]).reset_index(drop=True)

def doc_entity_canonical(sf_dir: str):
    """Canonical entity table (the §2.6 canonicalization join + J7-rule
    entity typing) built from the rule-localized mentions of the
    documents table: per-batch partial counts → hash-co-located final
    merge picking the most frequent surface per canonical id
    (``stages/canonicalize.entity_final_block``, ties lexicographic).
    Entity ids use the md5-derived hash so the SQL oracle recomputes
    the whole table — ids, surface election, types, counts — exactly."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    from jerex_ray.stages.canonicalize import entity_final_block

    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    partials = ds.map_batches(_CapMentionStage, batch_format="pandas",
                              batch_size=4096, concurrency=(1, 4),
                              fn_constructor_kwargs={"mode": "partials"})
    ents = grouped_apply(partials, ["entity_id"],
                         entity_final_block).to_pandas()
    ents["n_occurrences"] = ents["n_occurrences"].astype("int64")
    return ents.sort_values("norm").reset_index(drop=True)

def doc_split(sf_dir: str):
    """Deterministic hash-based train/valid/test split (md5-derived so
    the SQL oracle reproduces the exact assignment): no shuffle, no
    global state, stable under resharding and corpus growth."""
    from jerex_ray.ops.split import hash_split
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id"])
    out = hash_split(ds).to_pandas()
    return out[["doc_id", "split"]].sort_values("doc_id") \
        .reset_index(drop=True)

def doc_stratified_sample(sf_dir: str):
    """Deterministic stratified sample: the 20 smallest-md5-hash docs
    per language — per-batch top-k pre-reduction bounds the shuffle to
    each group's quota (a hot group never ships more than n rows per
    batch)."""
    from jerex_ray.ops.split import stratified_sample
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "lang"])
    out = stratified_sample(ds, group="lang", n_per_group=20).to_pandas()
    return out[["doc_id", "lang"]].sort_values("doc_id") \
        .reset_index(drop=True)

def doc_fingerprint(sf_dir: str):
    """md5-derived 64-bit normalized-text fingerprints (SQL-replicable
    hash — the oracle recomputes them bit-for-bit)."""
    from jerex_ray.ops.textstats import fingerprint
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    out = ds.map_batches(
        lambda b: fingerprint(b, algo="md5")[["doc_id", "fp"]],
        batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)

def doc_mixture_sample(sf_dir: str):
    """Deterministic data mixing (``ops/split.mixture_sample``):
    src0 upsampled 2.25×, src1 downsampled to 0.5×, everything else
    kept 1× — each doc's copy count is a pure function of its md5
    bucket, so the mixture is reproducible and SQL-oracled exactly."""
    from jerex_ray.ops.split import mixture_sample
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "source"])
    out = mixture_sample(ds, weights={"src0": 2.25, "src1": 0.5}) \
        .to_pandas()
    out = out[["doc_id", "source", "copy_idx"]]
    out["doc_id"] = out["doc_id"].astype("int64")
    out["copy_idx"] = out["copy_idx"].astype("int64")
    return out.sort_values(["doc_id", "copy_idx"]).reset_index(drop=True)

def doc_chunks(sf_dir: str):
    """Fixed-size word-window chunking with overlap
    (``ops/textstats.chunk_documents``, 24-word chunks / 8 overlap so
    the ~30-word fixture docs split): one streaming pass, integer
    coordinates + joined word slices, oracled bit-exactly."""
    from jerex_ray.ops.textstats import chunk_documents
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    out = chunk_documents(ds, chunk_words=24, overlap=8).to_pandas()
    for c in ("doc_id", "chunk_idx", "start", "end"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["doc_id", "chunk_idx"]) \
        .reset_index(drop=True)

def doc_weighted_sample(sf_dir: str):
    """Weighted sampling without replacement (Efraimidis–Spirakis
    priorities over deterministic md5 uniforms, ``ops/split.
    weighted_sample``): 50 docs, src0 weighted 4×, src1 0.5×."""
    from jerex_ray.ops.split import weighted_sample
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "source"])
    out = weighted_sample(ds, k=50,
                          weights={"src0": 4.0, "src1": 0.5}) \
        .to_pandas()
    out = out[["doc_id", "source"]]
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)

def doc_top_bigrams(sf_dir: str):
    from jerex_ray.ops.textstats import top_ngrams
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return top_ngrams(ds, n=2, k=10)

def doc_winnowing(sf_dir: str):
    """Winnowing (MOSS) rolling-hash fingerprints — rows-only (the
    selection rule is pytest-gated against a brute-force reference;
    a rolling polynomial mod 2^64 isn't SQL-expressible)."""
    from jerex_ray.ops.textstats import run_winnowing
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    out = run_winnowing(ds).to_pandas()
    return out.sort_values(["doc_id", "position"]).reset_index(drop=True)

def doc_winnowing_md5(sf_dir: str):
    """Winnowing with md5-derived character-k-gram hashes — the
    SQL-oracled twin of ``doc_winnowing`` (the oracle recomputes each
    gram hash via ``substr(md5(substr(t, i+1, 8)), 1, 16)`` and the
    rightmost-min-per-window selection via a windows×grams join).
    The rolling-hash variant stays the scale path."""
    from jerex_ray.ops.textstats import run_winnowing_md5
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    out = run_winnowing_md5(ds).to_pandas()
    return out.sort_values(["doc_id", "position"]).reset_index(drop=True)

def doc_pack_batches(sf_dir: str):
    """Token-budget sequence packing (concat-and-chunk over the
    doc_id-ordered stream per source) via the distributed keyed
    exclusive prefix sum of ``ops/pack.py`` — oracled by a SQL window
    running sum."""
    from jerex_ray.ops.pack import pack_documents
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text", "source"])
    out = pack_documents(ds, budget=512).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)

def doc_decontaminate(sf_dir: str):
    """Benchmark decontamination: train-split docs sharing a word
    8-gram with the test split (md5 hash split), with the count of
    distinct shared grams. One broadcast + one streaming pass."""
    from jerex_ray.ops.decontam import contaminated_docs
    from jerex_ray.ops.split import hash_split
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    split = hash_split(ds)
    train = split.map_batches(
        lambda b: b.loc[b["split"] != "test", ["doc_id", "text"]],
        batch_format="pandas")
    evald = split.map_batches(
        lambda b: b.loc[b["split"] == "test", ["doc_id", "text"]],
        batch_format="pandas")
    out = contaminated_docs(train, evald, n=8).to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)

def doc_decontaminate_bloom(sf_dir: str):
    """Bloom-filter variant of doc_decontaminate — the middle scale
    regime (eval gram bits broadcast instead of a Python set). ORACLE
    CAVEAT: the filter is one-sided (no false negatives); with the
    query's m=2^20 bits, k=4 and the fixture's eval-gram count the
    false-positive probability per distinct gram is ~1e-13, so parity
    with the exact SQL oracle is expected for any realistic fixture —
    a mismatch showing EXTRA rows/hits is an unlucky false positive,
    not a dataflow bug (missing rows WOULD be a bug)."""
    from jerex_ray.ops.decontam import contaminated_docs_bloom
    from jerex_ray.ops.split import hash_split
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    split = hash_split(ds)
    train = split.map_batches(
        lambda b: b.loc[b["split"] != "test", ["doc_id", "text"]],
        batch_format="pandas")
    evald = split.map_batches(
        lambda b: b.loc[b["split"] == "test", ["doc_id", "text"]],
        batch_format="pandas")
    out = contaminated_docs_bloom(train, evald, n=8).to_pandas()
    if "doc_id" not in out.columns or out.empty:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "n_hits": pd.Series(dtype="int64")})
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)

def doc_unigram_logppl(sf_dir: str):
    """CCNet-style unigram-LM quality score: per-doc mean −log2 word
    probability under the corpus unigram distribution; rounded to 6
    decimals on both sides (summation order differs between the
    distributed mean and SQL avg in the last float bits)."""
    from jerex_ray.ops.textstats import unigram_logppl
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    out = unigram_logppl(ds).to_pandas()
    out["logppl"] = out["logppl"].round(6)
    return out.sort_values("doc_id").reset_index(drop=True)

def doc_repetition(sf_dir: str):
    """Gopher-style repetition quality signals (duplicate-word
    fraction, top-bigram share) — vectorized explode, SQL-oracled."""
    from jerex_ray.ops.textstats import run_repetition_stats
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return run_repetition_stats(ds).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)

def doc_quality_filter(sf_dir: str):
    """Percentile-based corpus filter (CCNet keeps the best LM-scored
    fraction): docs whose unigram logppl is at or below the corpus
    P90. Composition of three scale-shaped ops — the scoring pass, the
    exact three-pass quantile over the (metadata-sized, materialized)
    per-doc score table, and one broadcast-threshold filter. Scores
    are rounded to 6 decimals BEFORE the quantile on both sides so the
    threshold comparison is reproducible."""
    import ray.data as rd

    from jerex_ray.ops.quantiles import distributed_quantiles
    from jerex_ray.ops.textstats import unigram_logppl
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    scored = unigram_logppl(ds).map_batches(
        lambda df: df.assign(logppl=df["logppl"].round(6))
        [["doc_id", "logppl"]],
        batch_format="pandas").materialize()  # per-doc metadata table
    p90 = distributed_quantiles(scored, "logppl", [0.9])[0]
    kept = scored.map_batches(
        lambda df: df.loc[df["logppl"] <= p90, ["doc_id"]],
        batch_format="pandas").to_pandas()
    if "doc_id" not in kept.columns:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64")})
    return kept.astype("int64").sort_values("doc_id") \
        .reset_index(drop=True)

def doc_heavy_hitters(sf_dir: str):
    """Exact corpus heavy hitters (count·k > total) via a Misra–Gries
    candidate pass + an exact verify pass — integer-only output, so
    the SQL oracle matches bit-for-bit."""
    from jerex_ray.ops.sketch import heavy_hitters
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return heavy_hitters(ds, k=40, capacity=256)

def doc_tfidf_top(sf_dir: str):
    """Per-doc top-3 terms by smoothed tf-idf; output carries only
    integers/strings (ranking floats are transient, ties break on the
    term) so the oracle compare is exact."""
    from jerex_ray.ops.textstats import tfidf_top_terms
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    out = tfidf_top_terms(ds, top=3).to_pandas()
    return out.sort_values(["doc_id", "rank"]).reset_index(drop=True)

def doc_bm25_scores(sf_dir: str):
    """Okapi BM25 of every doc against three fixed queries — one
    combiner stats pass + broadcast idf + one streaming scoring pass;
    scores rounded to 6 decimals on both sides (per-doc term-sum
    order differs between engines in the last float bits)."""
    from jerex_ray.ops.bm25 import bm25_scores
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    out = bm25_scores(ds, _BM25_QUERIES).to_pandas()
    out["score"] = out["score"].round(6)
    return out.sort_values(["query_idx", "doc_id"]).reset_index(drop=True)

def doc_bm25_indexed(sf_dir: str):
    """BM25 served from a MATERIALIZED term-bucketed inverted index
    (build: one explode + bucket shuffle; query: hash-pruned postings
    read only). Must equal the direct-pass ``doc_bm25_scores`` — both
    share one SQL oracle."""
    import hashlib
    import shutil

    from jerex_ray.ops.invindex import bm25_from_index, build_inverted_index
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    out_dir = "/tmp/jerex_invindex_" + hashlib.md5(
        sf_dir.encode()).hexdigest()[:8]
    shutil.rmtree(out_dir, ignore_errors=True)
    build_inverted_index(ds, out_dir, num_buckets=16)
    out = bm25_from_index(out_dir, _BM25_QUERIES)
    out["score"] = out["score"].round(6)
    return out.sort_values(["query_idx", "doc_id"]).reset_index(drop=True)

def doc_pagerank(sf_dir: str):
    """PageRank centrality over the exact-Jaccard near-dup graph
    (``ops/graph.pagerank``, broadcast mode, d=0.85, 5 iterations) —
    the centrality-weighted canonical-pick input for dedup survivor
    selection. Oracled by a chained-CTE DuckDB recomputation of the
    same 5 power iterations over the same (deterministic, exact — no
    LSH caveat) edge set, 6-decimal rounding on both sides."""
    import ray

    from jerex_ray.ops.dedup import jaccard_edges_exact
    from jerex_ray.ops.graph import pagerank
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    edges = jaccard_edges_exact(ds, threshold=0.7).to_pandas()
    if "doc_a" not in edges.columns or edges.empty:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "pr": pd.Series(dtype="float64")})
    pr = pagerank(ray.data.from_pandas(edges[["doc_a", "doc_b"]]),
                  damping=0.85, iters=5)
    pr["pr"] = pr["pr"].round(6)
    pr = pr.rename(columns={"node": "doc_id"})
    pr["doc_id"] = pr["doc_id"].astype("int64")
    return pr.sort_values("doc_id").reset_index(drop=True)

def doc_vocab(sf_dir: str):
    """Frequency-ranked vocabulary over the documents table
    (``ops/textstats.build_vocab``): combiner word counts →
    block-local exact top-k → deterministic (count DESC, word ASC)
    token-id assignment. Oracled via SQL row_number()."""
    from jerex_ray.ops.textstats import build_vocab
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["text"])
    return build_vocab(ds, top=200)

def doc_pretrain_corpus(sf_dir: str):
    """END-TO-END pretraining-data pipeline, composed from the
    individually-verified pieces and verified as a whole by ONE
    composed SQL oracle:

      near-dup survivors (exact-Jaccard edges → connected components →
      keep smallest doc_id) → train split (md5 bucket < 0.9) → 8-gram
      decontamination against the test split → P90 unigram-quality
      filter (scores over the FULL corpus, as the standalone op) →
      token-budget sequence packing (512/pack, per source).

    Dataflow: see ``pipelines/pretrain.pretrain_corpus`` (shared with
    the ``pretrain`` CLI subcommand) — the loser/contaminated id sets
    are broadcast-sized by construction, quality scores attach via a
    hash-partitioned Dataset.join, the split predicate is stateless
    md5, packing is the distributed keyed prefix sum; nothing
    corpus-sized is ever collected."""
    from jerex_ray.pipelines.pretrain import pretrain_corpus
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    docs = read_parquet_sized(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text", "source"])
    out = pretrain_corpus(docs).to_pandas()
    if "doc_id" not in out.columns or out.empty:
        return pd.DataFrame({
            "doc_id": pd.Series(dtype="int64"),
            "source": pd.Series(dtype="object"),
            "n_tokens": pd.Series(dtype="int64"),
            "pack_id": pd.Series(dtype="int64"),
            "pack_offset": pd.Series(dtype="int64")})
    return out.sort_values("doc_id").reset_index(drop=True)

def doc_dup_spans(sf_dir: str):
    """Substring-level dedup (Lee et al. '22): maximal word spans
    covered by 8-grams occurring ≥2 times corpus-wide
    (``ops/substr.duplicate_spans``) — gram explode → combiner count →
    membership filter → per-doc gaps-and-islands merge. Oracled by a
    lateral-unnest + HAVING + window-function SQL recomputation
    (integer coordinates, bit-exact)."""
    from jerex_ray.ops.substr import duplicate_spans
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    out = duplicate_spans(ds, n=8, min_count=2).to_pandas()
    if "doc_id" not in out.columns or out.empty:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "start": pd.Series(dtype="int64"),
                             "end": pd.Series(dtype="int64")})
    for c in ("doc_id", "start", "end"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["doc_id", "start"]).reset_index(drop=True)

def doc_dup_ratio(sf_dir: str):
    """Per-doc fraction of words covered by cross-corpus duplicate
    8-gram spans — the substring-dedup quality signal
    (``ops/substr.duplicate_ratio``)."""
    from jerex_ray.ops.substr import duplicate_ratio, duplicate_spans
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    spans = duplicate_spans(ds, n=8, min_count=2)
    out = duplicate_ratio(ds, spans)
    return out[["doc_id", "n_words", "covered", "dup_ratio"]]

def doc_snapshot_diff(sf_dir: str):
    """Change-data-capture (``ops/validate.snapshot_diff``): the OLD
    snapshot is doc_id < 450, the NEW is doc_id >= 50 with every
    doc_id % 7 == 0 text suffixed ' v2' (a deterministic simulated
    edit) — output is the delta: added / removed / changed keys."""
    from jerex_ray.ops.validate import snapshot_diff
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    old = ds.map_batches(lambda b: b[b["doc_id"] < 450],
                         batch_format="pandas")

    def as_new(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["doc_id"] >= 50].copy()
        edit = b["doc_id"] % 7 == 0
        b.loc[edit, "text"] = b.loc[edit, "text"] + " v2"
        return b

    new = ds.map_batches(as_new, batch_format="pandas")
    out = snapshot_diff(old, new).to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)

def dedup_minhash_edges(sf_dir: str):
    """ORACLE CAVEAT (shared with dedup_components): the SQL oracle is
    exact all-pairs Jaccard, while this pipeline's recall is
    LSH-bounded — 16 bands × 4 rows miss a jaccard-0.7 pair that never
    enters the candidate set with probability ≈ (1 − 0.7⁴)¹⁶ ≈ 1%.
    Parity is deterministic for the driver's fixture corpus (verified
    every round); a FUTURE fixture change that fails this oracle is
    most likely an unlucky LSH miss, not a verification bug — check
    recall before debugging the dataflow."""
    from jerex_ray.ops.dedup import minhash_dedup
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    _, edges = minhash_dedup(ds, threshold=0.7)
    out = edges[["doc_a", "doc_b"]].sort_values(["doc_a", "doc_b"])
    return out.reset_index(drop=True)

def dedup_jaccard_edges(sf_dir: str):
    """EXACT n-gram Jaccard near-dup edges (no LSH prefilter) — the
    guaranteed-recall twin of ``dedup_minhash_edges``. Unlike the
    minhash query, parity with the all-pairs SQL oracle is
    deterministic for ANY corpus (no probabilistic-recall caveat)."""
    from jerex_ray.ops.dedup import jaccard_edges_exact
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    edges = jaccard_edges_exact(ds, threshold=0.7).to_pandas()
    if "doc_a" not in edges.columns:
        return pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                             "doc_b": pd.Series(dtype="int64")})
    out = edges[["doc_a", "doc_b"]].sort_values(["doc_a", "doc_b"])
    return out.reset_index(drop=True)

def dedup_jaccard_prefix(sf_dir: str):
    """EXACT n-gram Jaccard near-dup edges via PREFIX FILTERING
    (``ops/dedup.jaccard_edges_prefix``, the PPJoin-family scale path:
    candidates only from rarest-gram co-location, hot boilerplate
    grams never pair) — third algorithm for the same contract; shares
    the all-pairs SQL oracle with ``dedup_jaccard_edges`` and is
    pinned equal to it by pytest."""
    from jerex_ray.ops.dedup import jaccard_edges_prefix
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    edges = jaccard_edges_prefix(ds, threshold=0.7).to_pandas()
    if "doc_a" not in edges.columns:
        return pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                             "doc_b": pd.Series(dtype="int64")})
    out = edges[["doc_a", "doc_b"]].astype("int64") \
        .sort_values(["doc_a", "doc_b"])
    return out.reset_index(drop=True)

def dedup_components(sf_dir: str):
    """Distributed connected components (BSP min-label propagation +
    pointer jumping over raw Ray task grids) over the exact-Jaccard
    near-dup edges — oracled by a recursive-CTE transitive closure in
    SQL. Inherits the LSH probabilistic-recall caveat documented on
    ``dedup_minhash_edges`` (a missed edge can split a component)."""
    from jerex_ray.functions.components import connected_components
    from jerex_ray.ops.dedup import minhash_verified_edges
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    edges = minhash_verified_edges(ds, threshold=0.7)
    comp = connected_components(
        edges.map_batches(
            lambda b: b.rename(columns={"doc_a": "src", "doc_b": "dst"})
            [["src", "dst"]] if "doc_a" in b.columns else
            pd.DataFrame({"src": pd.Series(dtype="int64"),
                          "dst": pd.Series(dtype="int64")}),
            batch_format="pandas"))
    return comp.astype("int64").sort_values("node").reset_index(drop=True)

def dedup_survivors(sf_dir: str):
    """The production artifact of the near-dup pipeline: which docs
    REMAIN after MinHash→verify→connected-components clustering with a
    keep-smallest-doc_id policy. The loser set (near-dup docs that are
    not their component's minimum) is broadcast-sized by construction —
    the corpus itself streams through one anti-join filter."""
    from jerex_ray.functions.components import connected_components
    from jerex_ray.functions.join import broadcast_anti_join
    from jerex_ray.ops.dedup import minhash_verified_edges
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    edges = minhash_verified_edges(ds, threshold=0.7)
    comp = connected_components(
        edges.map_batches(
            lambda b: b.rename(columns={"doc_a": "src", "doc_b": "dst"})
            [["src", "dst"]] if "doc_a" in b.columns else
            pd.DataFrame({"src": pd.Series(dtype="int64"),
                          "dst": pd.Series(dtype="int64")}),
            batch_format="pandas"))
    losers = set(comp.loc[comp["node"] != comp["component"], "node"]
                 .astype("int64")) if len(comp) else set()
    ids = read_parquet_sized(f"{sf_dir}/documents.parquet",
                             columns=["doc_id"])
    out = broadcast_anti_join(ids, losers, on="doc_id").to_pandas()
    if "doc_id" not in out.columns:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64")})
    return out.astype("int64").sort_values("doc_id") \
        .reset_index(drop=True)

def dedup_incremental(sf_dir: str):
    """Streaming-ingest dedup (``ops/dedup.incremental_exact_dedup``):
    the md5-lower half of the corpus plays the already-ingested BASE,
    the upper half the INCOMING shard; incoming docs survive iff their
    normalized text is new to the base AND they are their shard's
    smallest-doc_id holder of it. The base is consulted only through
    its fingerprint index."""
    from jerex_ray.ops.dedup import incremental_exact_dedup
    from jerex_ray.ops.split import assign_split
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    halves = ds.map_batches(
        assign_split, batch_format="pandas",
        fn_kwargs={"fractions": (0.5, 0.5), "names": ("base", "inc")})
    base = halves.map_batches(
        lambda b: b.loc[b["split"] == "base", ["doc_id", "text"]],
        batch_format="pandas")
    inc = halves.map_batches(
        lambda b: b.loc[b["split"] == "inc", ["doc_id", "text"]],
        batch_format="pandas")
    out = incremental_exact_dedup(inc, base).to_pandas()
    if "doc_id" not in out.columns or out.empty:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64")})
    return out[["doc_id"]].astype("int64").sort_values("doc_id") \
        .reset_index(drop=True)

def dedup_simhash_pairs(sf_dir: str):
    from jerex_ray.ops.dedup import simhash_candidates
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return simhash_candidates(ds, max_hamming=3)

def ann_topk(sf_dir: str):
    from jerex_ray.ops.ann import brute_force_topk
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    queries, qids = _query_vectors(sf_dir)
    out = brute_force_topk(ds, queries, k=5)
    out["query_idx"] = qids[out["query_idx"].to_numpy()]
    return out[["query_idx", "vec_id"]].astype("int64") \
        .sort_values(["query_idx", "vec_id"]).reset_index(drop=True)

def ann_ivf_topk(sf_dir: str):
    """Approximate IVF top-k (rows-only: recall < 1 by design; the
    exact brute-force variant is the oracle-checked one)."""
    from jerex_ray.ops.ann import ivf_topk
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    queries, qids = _query_vectors(sf_dir)
    out = ivf_topk(ds, queries, k=5)
    out["query_idx"] = qids[out["query_idx"].to_numpy()]
    return out[["query_idx", "vec_id"]].astype("int64") \
        .sort_values(["query_idx", "vec_id"]).reset_index(drop=True)

def ann_hnsw_topk(sf_dir: str):
    """HNSW graph ANN (Malkov & Yashunin '16) — the modern
    navigable-small-world scale path completing the similarity
    family beside brute force / IVF / IVFADC / PQ / LSH: O(log N)
    expected hops per query, incremental inserts, no training pass.
    Rows-only (recall < 1 by design; the recall floor, build
    determinism and insertion-order independence are pytest-gated —
    the exact brute-force twin is the oracle-checked one). See
    ``ops/ann.py:HnswIndex`` for the derandomized level draw and the
    actor-pool deployment contract."""
    from jerex_ray.ops.ann import hnsw_topk
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    queries, qids = _query_vectors(sf_dir)
    out = hnsw_topk(ds, queries, k=5)
    if out.empty:
        return pd.DataFrame({"query_idx": pd.Series(dtype="int64"),
                             "vec_id": pd.Series(dtype="int64")})
    out["query_idx"] = qids[out["query_idx"].to_numpy()]
    return out[["query_idx", "vec_id"]].astype("int64") \
        .sort_values(["query_idx", "vec_id"]).reset_index(drop=True)

def ann_ivfpq_topk(sf_dir: str):
    """IVF-PQ with exact re-rank (IVFADC, Jégou '11 §V) — the
    composed billion-scale ANN path: coarse cells prune, residual PQ
    codes scan, a candidate-bounded exact pass re-ranks. Rows-only
    (recall < 1 by design; returned cosines are exact and the recall
    floor is pytest-gated, test_ivfpq_topk_recall_and_exact_cosines)."""
    from jerex_ray.ops.ann import ivfpq_topk
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    queries, qids = _query_vectors(sf_dir)
    out = ivfpq_topk(ds, queries, k=5, m=8)
    if out.empty:      # graceful-empty contract (object-dtype frame)
        return pd.DataFrame({"query_idx": pd.Series(dtype="int64"),
                             "vec_id": pd.Series(dtype="int64")})
    out["query_idx"] = qids[out["query_idx"].to_numpy()]
    return out[["query_idx", "vec_id"]].astype("int64") \
        .sort_values(["query_idx", "vec_id"]).reset_index(drop=True)

def doc_word_entropy(sf_dir: str):
    """Shannon entropy of each document's word distribution (nats,
    rounded to 6) — the repetitiveness/quality signal: low-entropy
    docs are boilerplate or keyword stuffing. One vectorized pass:
    per-doc value_counts → −Σ p ln p."""
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def ent(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        # vectorized explode → per-(doc, word) counts → segment sums;
        # no Python loop over rows (same shape as the langid kernel)
        ex = df["text"].fillna("").str.lower().str.split().explode()
        ex = ex[ex.notna() & (ex != "")]
        ent_col = np.zeros(len(df))
        if len(ex):
            c = (pd.DataFrame({"i": ex.index.to_numpy(),
                               "w": ex.to_numpy()})
                 .groupby(["i", "w"], sort=False).size()
                 .reset_index(name="n"))
            t = c.groupby("i", sort=False)["n"].transform("sum") \
                .to_numpy(np.float64)
            p = c["n"].to_numpy(np.float64) / t
            h = pd.Series(-(p * np.log(p))).groupby(
                c["i"].to_numpy(), sort=False).sum()
            ent_col[h.index.to_numpy()] = h.to_numpy()
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(),
                             "entropy": np.round(ent_col, 6)})

    out = ds.map_batches(ent, batch_format="pandas").to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)

def doc_phrase_search(sf_dir: str):
    """Positional phrase query 'key order' over the corpus
    (``ops/invindex.phrase_search``): postings explode with within-doc
    positions, term-set pushdown before the shuffle, per-block anchor
    intersection (posting shifted by its phrase slot). Oracled via a
    positional self-join in SQL."""
    from jerex_ray.ops.invindex import phrase_search
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return phrase_search(ds, "key order")

def dedup_component_sizes(sf_dir: str):
    """Near-dup cluster-size histogram — the release-audit view of the
    dedup graph (how much of the corpus sits in 2-clusters vs one
    giant blob): component sizes from the BSP closure, then a
    two-level count-of-counts. Inherits dedup_components' LSH recall
    caveat."""
    comp = dedup_components(sf_dir)
    if comp.empty:
        return pd.DataFrame({"size": pd.Series(dtype="int64"),
                             "n_components": pd.Series(dtype="int64")})
    sizes = comp.groupby("component").size()
    out = sizes.value_counts().sort_index().reset_index()
    out.columns = ["size", "n_components"]
    return out.astype({"size": "int64", "n_components": "int64"}) \
        .reset_index(drop=True)

def doc_source_gini(sf_dir: str):
    """Per-source Gini coefficient of document token counts — the
    concentration audit ('is one source's length distribution
    dominated by a few giants?') — via the rank formula
    G = 2·Σ i·x₍ᵢ₎ / (n·Σx) − (n+1)/n. Sources are bounded, so one
    hash co-location puts each source's lengths in one block; runs of
    equal lengths make the formula order-invariant within ties."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["source", "text"])

    def lengths(df: pd.DataFrame) -> pd.DataFrame:
        n = df["text"].fillna("").str.split().str.len() \
            .to_numpy(np.int64)
        return pd.DataFrame({"source": df["source"], "x": n})

    def gini(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"source": pd.Series(dtype="object"),
                                 "gini": pd.Series(dtype="float64")})
        rows = []
        for src, g in df.groupby("source", sort=False):
            x = np.sort(g["x"].to_numpy(np.float64))
            n = len(x)
            s = x.sum()
            val = 0.0 if s == 0 or n == 0 else \
                2.0 * float(np.arange(1, n + 1) @ x) / (n * s) \
                - (n + 1.0) / n
            rows.append((src, round(val, 6)))
        return pd.DataFrame(rows, columns=["source", "gini"])

    out = grouped_apply(ds.map_batches(lengths, batch_format="pandas"),
                        ["source"], gini).to_pandas()
    return out.sort_values("source").reset_index(drop=True)

def doc_source_vocab_jaccard(sf_dir: str):
    """Pairwise vocabulary Jaccard between sources — the corpus
    comparison behind domain-mixing decisions ('how lexically close
    are these two crawls?'). Distinct (source, word) via one combiner
    aggregate, per-word source-pair explode after a word co-location
    (pairs per word are bounded by |sources|²), pair counts reduced by
    a second combiner; vocabulary sizes join on the driver
    (|sources| rows)."""
    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["source", "text"])

    def words(df: pd.DataFrame) -> pd.DataFrame:
        w = df["text"].fillna("").str.lower().str.split()
        lens = w.str.len().fillna(0).to_numpy(np.int64)
        if lens.sum() == 0:
            return pd.DataFrame({"source": pd.Series(dtype="object"),
                                 "w": pd.Series(dtype="object")})
        flat = np.concatenate([v for v in w.to_numpy() if v])
        src = np.repeat(df["source"].to_numpy(), lens)
        return pd.DataFrame({"source": src, "w": flat}) \
            .drop_duplicates()

    ws = grouped_aggregate(ds.map_batches(words, batch_format="pandas"),
                           ["source", "w"],
                           {"n": (None, "count")}).materialize()
    vocab = grouped_aggregate(ws, ["source"],
                              {"c": (None, "count")}).to_pandas() \
        .set_index("source")["c"].to_dict()

    def mate(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"source_a": pd.Series(dtype="object"),
                              "source_b": pd.Series(dtype="object")})
        if df.empty or "w" not in df.columns:
            return empty
        d = df[["source", "w"]]
        m = d.merge(d, on="w")
        m = m[m["source_x"] < m["source_y"]]
        if m.empty:
            return empty
        return pd.DataFrame({"source_a": m["source_x"].to_numpy(),
                             "source_b": m["source_y"].to_numpy()})

    pairs = grouped_apply(ws, ["w"], mate)
    inter = grouped_aggregate(pairs, ["source_a", "source_b"],
                              {"shared": (None, "count")}).to_pandas()
    if inter.empty or "source_a" not in inter.columns:
        return pd.DataFrame({"source_a": pd.Series(dtype="object"),
                             "source_b": pd.Series(dtype="object"),
                             "shared": pd.Series(dtype="int64"),
                             "jaccard": pd.Series(dtype="float64")})
    i = inter["shared"].to_numpy(np.float64)
    ca = inter["source_a"].map(vocab).to_numpy(np.float64)
    cb = inter["source_b"].map(vocab).to_numpy(np.float64)
    inter["jaccard"] = np.round(i / (ca + cb - i), 6)
    inter["shared"] = inter["shared"].astype("int64")
    return inter[["source_a", "source_b", "shared", "jaccard"]] \
        .sort_values(["source_a", "source_b"]).reset_index(drop=True)

def doc_source_kl(sf_dir: str):
    """Per-source KL divergence (bits) from each source's smoothed
    unigram distribution to the corpus distribution — mixture-health
    scan. Engine uses the closed-form missing-mass identity (no
    source×vocab cross product); the oracle brute-forces the full
    grid in SQL. Both exact; 6-decimal parity."""
    from jerex_ray.ops.textstats import source_kl
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["source", "text"])
    return source_kl(ds)

def doc_hybrid_rrf(sf_dir: str):
    """Hybrid retrieval by reciprocal-rank fusion (Cormack, Clarke &
    Buettcher SIGIR'09): BM25 lexical ranks fused with dense cosine
    ranks as Σ 1/(60+r), top-10. The retrievers run distributed
    (combiner BM25 stats + one scoring pass; broadcast query vector +
    per-block float64 matmul), each reduced by block-local →
    single-block exact top-100 on (ROUNDED score DESC, id) — rounding
    BEFORE ranking makes the cut deterministic across engines (both
    sides agree at 6 decimals, so rounded ties break by id
    identically). Only the two 100-row lists reach the driver. The
    synthetic tables pair row-wise (vec_id ≡ doc_id). Rank 0 encodes
    'absent from that retriever's top-100'."""
    from jerex_ray.ops.bm25 import bm25_scores
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    L, K, topn = 100, 60, 10
    docs = read_parquet_sized(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text"])
    emb = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"])

    def lex_head(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "s": pd.Series(dtype="float64")})
        if "score" in df.columns:
            out = pd.DataFrame({"doc_id": df["doc_id"].to_numpy(),
                                "s": df["score"].round(6).to_numpy()})
        else:
            out = df
        return out.sort_values(["s", "doc_id"],
                               ascending=[False, True]).head(L)

    lex = bm25_scores(docs, ["spark join fast"]) \
        .map_batches(lex_head, batch_format="pandas", batch_size=None) \
        .repartition(1) \
        .map_batches(lex_head, batch_format="pandas",
                     batch_size=None).to_pandas()

    qrow = emb.map_batches(
        lambda df: df[df["vec_id"] == 0], batch_format="pandas") \
        .to_pandas()
    qv = np.asarray(list(qrow["embedding"].iloc[0]), np.float64)
    qv = qv / np.linalg.norm(qv)
    import ray
    qref = ray.put(qv)

    def dense_head(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "s": pd.Series(dtype="float64")})
        if "embedding" in df.columns:
            m = np.stack([np.asarray(v, np.float64)
                          for v in df["embedding"].to_numpy()])
            m = m / np.linalg.norm(m, axis=1, keepdims=True)
            s = (m @ ray.get(qref)).round(6)
            out = pd.DataFrame({"doc_id": df["vec_id"].to_numpy(), "s": s})
        else:
            out = df
        return out.sort_values(["s", "doc_id"],
                               ascending=[False, True]).head(L)

    dense = emb.map_batches(dense_head, batch_format="pandas",
                            batch_size=4096) \
        .repartition(1) \
        .map_batches(dense_head, batch_format="pandas",
                     batch_size=None).to_pandas()

    for df in (lex, dense):
        df.sort_values(["s", "doc_id"], ascending=[False, True],
                       inplace=True)
        df["r"] = np.arange(1, len(df) + 1)
    fused = lex[["doc_id", "r"]].rename(columns={"r": "r_lex"}) \
        .merge(dense[["doc_id", "r"]].rename(columns={"r": "r_dense"}),
               on="doc_id", how="outer")
    fused = fused.fillna(0).astype({"r_lex": "int64",
                                    "r_dense": "int64",
                                    "doc_id": "int64"})
    contrib = np.where(fused["r_lex"] > 0,
                       1.0 / (K + fused["r_lex"]), 0.0) \
        + np.where(fused["r_dense"] > 0,
                   1.0 / (K + fused["r_dense"]), 0.0)
    fused["rrf"] = np.round(contrib, 6)
    return fused.sort_values(["rrf", "doc_id"],
                             ascending=[False, True]).head(topn) \
        [["doc_id", "r_lex", "r_dense", "rrf"]].reset_index(drop=True)

def _pagerank_oracle_sql(iters: int = 5, damping: float = 0.85) -> str:
    """Chained-CTE recomputation of ``doc_pagerank``: the exact-Jaccard
    edge CTE, undirected explode, degree table, then one CTE per power
    iteration — the SQL mirror of ``ops/graph.pagerank``."""
    sql = f"""
        WITH edges AS ({_EXACT_JACCARD_EDGES_SQL}),
        dir AS (SELECT doc_a AS u, doc_b AS v FROM edges
                UNION ALL SELECT doc_b, doc_a FROM edges),
        deg AS (SELECT u, CAST(count(*) AS DOUBLE) AS dg
                FROM dir GROUP BY u),
        r0 AS (SELECT u AS node, 1.0 / (SELECT count(*) FROM deg) AS pr
               FROM deg)"""
    prev = "r0"
    for k in range(1, iters + 1):
        sql += f""",
        r{k} AS (SELECT dir.v AS node,
                        (1.0 - {damping}) / (SELECT count(*) FROM deg)
                        + {damping} * sum({prev}.pr / deg.dg) AS pr
                 FROM dir JOIN {prev} ON {prev}.node = dir.u
                          JOIN deg ON deg.u = dir.u
                 GROUP BY dir.v)"""
        prev = f"r{k}"
    sql += f"""
        SELECT node AS doc_id, round(pr, 6) AS pr
        FROM {prev} ORDER BY doc_id"""
    return sql

def _dup_islands_cte(n: int = 8, min_count: int = 2) -> str:
    """Shared CTE chain for the substring-dedup oracles: rolling word
    n-grams (lateral unnest), duplicate filter, gaps-and-islands span
    merge. Positions are 1-indexed inside; the final selects convert
    to the engine's 0-based end-exclusive coordinates."""
    return f"""
        words AS (
            SELECT doc_id, list_filter(
                regexp_split_to_array(lower(text), '\\s+'),
                x -> x <> '') AS ws
            FROM documents),
        grams AS (
            SELECT doc_id, i AS pos,
                   array_to_string(ws[i:i+{n - 1}], ' ') AS g
            FROM words,
                 LATERAL (SELECT unnest(range(1, len(ws) - {n} + 2)) AS i) t
        ),
        dup AS (SELECT g FROM grams GROUP BY g
                HAVING count(*) >= {min_count}),
        hits AS (SELECT doc_id, pos FROM grams JOIN dup USING (g)),
        flagged AS (
            SELECT doc_id, pos,
                   CASE WHEN pos - lag(pos) OVER
                            (PARTITION BY doc_id ORDER BY pos) <= {n}
                        THEN 0 ELSE 1 END AS brk
            FROM hits),
        isl AS (
            SELECT doc_id, pos,
                   sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
            FROM flagged),
        spans AS (
            SELECT doc_id, min(pos) - 1 AS s, max(pos) + {n} - 1 AS e
            FROM isl GROUP BY doc_id, grp)"""

def _pretrain_corpus_oracle_sql() -> str:
    """ONE SQL statement recomputing the whole composed pipeline of
    ``doc_pretrain_corpus``: exact-Jaccard components (recursive CTE) →
    md5 split → 8-gram decontamination → P90 unigram-quality filter →
    per-source packing window. Each CTE chain mirrors the standalone
    query's oracle; the composition is their intersection feeding the
    pack window."""
    return """
        WITH RECURSIVE
        jw AS (SELECT doc_id, list_filter(
                   regexp_split_to_array(lower(text), '\\s+'),
                   x -> x <> '') AS ws
               FROM documents),
        jg AS (SELECT doc_id,
                      CASE WHEN len(ws) < 3
                           THEN [array_to_string(ws, ' ')]
                           ELSE [array_to_string(ws[i:i+2], ' ')
                                 for i in range(1, len(ws) - 1)]
                      END AS gs
               FROM jw WHERE len(ws) > 0),
        jdg AS (SELECT doc_id, unnest(list_distinct(gs)) AS g FROM jg),
        jcnt AS (SELECT doc_id, count(*) AS c FROM jdg GROUP BY doc_id),
        jinter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                          count(*) AS i
                   FROM jdg a JOIN jdg b
                        ON a.g = b.g AND a.doc_id < b.doc_id
                   GROUP BY a.doc_id, b.doc_id),
        jedges AS (SELECT doc_a, doc_b FROM jinter
                   JOIN jcnt ca ON ca.doc_id = doc_a
                   JOIN jcnt cb ON cb.doc_id = doc_b
                   WHERE CAST(i AS DOUBLE) / (ca.c + cb.c - i) >= 0.7),
        sym AS (SELECT doc_a AS a, doc_b AS b FROM jedges
                UNION ALL SELECT doc_b, doc_a FROM jedges),
        reach(a, b) AS (SELECT a, b FROM sym
                        UNION
                        SELECT r.a, s.b FROM reach r
                        JOIN sym s ON r.b = s.a),
        losers AS (SELECT a FROM (
                       SELECT a, least(a, min(b)) AS comp
                       FROM reach GROUP BY a) WHERE comp < a),
        spl AS (SELECT doc_id,
                       CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                           1, 16) AS UBIGINT)
                           % 1000000 AS b
                FROM documents),
        eg AS (SELECT DISTINCT
                      unnest([array_to_string(ws[i:i+7], ' ')
                              for i in range(1, len(ws) - 6)]) AS g
               FROM jw JOIN spl USING (doc_id)
               WHERE b >= 900000 AND len(ws) >= 8),
        tg AS (SELECT jw.doc_id,
                      unnest(list_distinct(
                          [array_to_string(ws[i:i+7], ' ')
                           for i in range(1, len(ws) - 6)])) AS g
               FROM jw JOIN spl USING (doc_id)
               WHERE b < 900000 AND len(ws) >= 8),
        contam AS (SELECT DISTINCT doc_id FROM tg
                   WHERE g IN (SELECT g FROM eg)),
        qw AS (SELECT doc_id, unnest(ws) AS w FROM jw),
        qc AS (SELECT w, count(*) AS c FROM qw GROUP BY w),
        qt AS (SELECT sum(c) AS t FROM qc),
        qlp AS (SELECT w, -log2(CAST(c AS DOUBLE) / t) AS l
                FROM qc CROSS JOIN qt),
        per AS (SELECT qw.doc_id, round(avg(qlp.l), 6) AS logppl
                FROM qw JOIN qlp ON qw.w = qlp.w GROUP BY qw.doc_id),
        scores AS (SELECT d.doc_id, COALESCE(per.logppl, 0.0) AS logppl
                   FROM documents d
                   LEFT JOIN per ON d.doc_id = per.doc_id),
        thr AS (SELECT quantile_cont(logppl, 0.9) AS t FROM scores),
        elig AS (
            SELECT d.doc_id, d.source,
                   array_length(list_filter(
                       regexp_split_to_array(d.text, '\\s+'),
                       x -> x <> '')) AS n_tokens
            FROM documents d
            JOIN spl ON spl.doc_id = d.doc_id
            JOIN scores ON scores.doc_id = d.doc_id, thr
            WHERE spl.b < 900000
              AND d.doc_id NOT IN (SELECT a FROM losers)
              AND d.doc_id NOT IN (SELECT doc_id FROM contam)
              AND scores.logppl <= thr.t),
        s AS (
            SELECT doc_id, source, n_tokens,
                   COALESCE(SUM(n_tokens) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS off
            FROM elig)
        SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(off // 512 AS BIGINT) AS pack_id,
               CAST(off % 512 AS BIGINT) AS pack_offset
        FROM s ORDER BY doc_id
    """

QUERIES = {
    'doc_token_stats': doc_token_stats,
    'doc_quality': doc_quality,
    'doc_exact_dedup': doc_exact_dedup,
    'doc_langid': doc_langid,
    'doc_name_mentions': doc_name_mentions,
    'doc_entity_canonical': doc_entity_canonical,
    'doc_fingerprint': doc_fingerprint,
    'doc_split': doc_split,
    'doc_stratified_sample': doc_stratified_sample,
    'doc_mixture_sample': doc_mixture_sample,
    'doc_weighted_sample': doc_weighted_sample,
    'doc_chunks': doc_chunks,
    'doc_top_bigrams': doc_top_bigrams,
    'doc_winnowing': doc_winnowing,
    'doc_winnowing_md5': doc_winnowing_md5,
    'doc_pack_batches': doc_pack_batches,
    'doc_decontaminate': doc_decontaminate,
    'doc_decontaminate_bloom': doc_decontaminate_bloom,
    'doc_repetition': doc_repetition,
    'doc_unigram_logppl': doc_unigram_logppl,
    'doc_quality_filter': doc_quality_filter,
    'doc_heavy_hitters': doc_heavy_hitters,
    'doc_tfidf_top': doc_tfidf_top,
    'doc_bm25_scores': doc_bm25_scores,
    'doc_bm25_indexed': doc_bm25_indexed,
    'dedup_minhash_edges': dedup_minhash_edges,
    'dedup_jaccard_edges': dedup_jaccard_edges,
    'dedup_jaccard_prefix': dedup_jaccard_prefix,
    'dedup_components': dedup_components,
    'dedup_survivors': dedup_survivors,
    'dedup_incremental': dedup_incremental,
    'dedup_simhash_pairs': dedup_simhash_pairs,
    'ann_topk': ann_topk,
    'ann_ivf_topk': ann_ivf_topk,
    'ann_ivfpq_topk': ann_ivfpq_topk,
    'ann_hnsw_topk': ann_hnsw_topk,
    'doc_snapshot_diff': doc_snapshot_diff,
    'doc_pagerank': doc_pagerank,
    'doc_dup_spans': doc_dup_spans,
    'doc_dup_ratio': doc_dup_ratio,
    'doc_pretrain_corpus': doc_pretrain_corpus,
    'doc_vocab': doc_vocab,
    'doc_shuffle_order': doc_shuffle_order,
    'doc_normalize_text': doc_normalize_text,
    'doc_corpus_stats': doc_corpus_stats,
    'doc_redact_persons': doc_redact_persons,
    'doc_word_entropy': doc_word_entropy,
    'doc_hybrid_rrf': doc_hybrid_rrf,
    'doc_source_kl': doc_source_kl,
    'doc_phrase_search': doc_phrase_search,
    'dedup_component_sizes': dedup_component_sizes,
    'doc_source_gini': doc_source_gini,
    'doc_source_vocab_jaccard': doc_source_vocab_jaccard,
}

ORACLES = {
    'doc_token_stats': f"""
            SELECT doc_id,
                   {_N_TOKENS_SQL} AS n_tokens,
                   array_length(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS n_pieces
            FROM documents ORDER BY doc_id
        """,
    'doc_quality': f"""
            SELECT doc_id,
                   length(text) AS n_chars,
                   {_N_TOKENS_SQL} AS n_tokens,
                   CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS DOUBLE)
                       / greatest(length(text), 1) AS punct_ratio,
                   CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS DOUBLE)
                       / greatest(length(text), 1) AS upper_ratio,
                   CASE WHEN {_N_TOKENS_SQL} > 0 THEN
                       CAST(length(text) - (length(text) - length(regexp_replace(text, '\\s', '', 'g'))) AS DOUBLE)
                           / greatest({_N_TOKENS_SQL}, 1)
                   ELSE 0.0 END AS mean_token_len,
                   CAST(len(list_filter(
                            list_filter(regexp_split_to_array(text, '\\s+'),
                                        x -> x <> ''),
                            x -> lower(x) IN ('the','and','of','to','a',
                                              'in','is','it','that','was')))
                        AS DOUBLE) / greatest({_N_TOKENS_SQL}, 1)
                       AS stopword_ratio
            FROM documents ORDER BY doc_id
        """,
    'doc_exact_dedup': """
            SELECT min(doc_id) AS doc_id FROM documents
            GROUP BY regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')
            ORDER BY doc_id
        """,
    'doc_langid': """
            WITH w AS (
                SELECT doc_id,
                       unnest(list_distinct(
                           regexp_extract_all(lower(text), '[a-zà-ÿ]+'))) AS w
                FROM documents
            ),
            s AS (
                SELECT doc_id,
                       count(*) FILTER (WHERE w IN ('der','die','und','das',
                           'ist','nicht','ein','mit','zu')) AS de,
                       count(*) FILTER (WHERE w IN ('the','and','of','to','a',
                           'in','is','it','that','was')) AS en,
                       count(*) FILTER (WHERE w IN ('el','la','de','que','los',
                           'una','es','por','con')) AS es,
                       count(*) FILTER (WHERE w IN ('le','la','et','les','des',
                           'est','une','dans','que')) AS fr
                FROM w GROUP BY doc_id
            )
            SELECT d.doc_id,
                   CASE WHEN s.doc_id IS NULL
                             OR greatest(de, en, es, fr) = 0 THEN 'und'
                        WHEN de = greatest(de, en, es, fr) THEN 'de'
                        WHEN en = greatest(de, en, es, fr) THEN 'en'
                        WHEN es = greatest(de, en, es, fr) THEN 'es'
                        ELSE 'fr' END AS lang_pred
            FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
            ORDER BY d.doc_id
        """,
    'doc_name_mentions': """
            WITH w AS (
                SELECT doc_id, list_filter(
                    regexp_split_to_array(text, '\\s+'), x -> x <> '') AS ws
                FROM documents
            ),
            t AS (
                SELECT doc_id, unnest(ws) AS tok,
                       unnest(range(len(ws))) AS pos
                FROM w
            ),
            f AS (
                SELECT doc_id, pos,
                       (regexp_matches(upper(substr(tok, 1, 1)) ||
                                       substr(tok, 2),
                                       '^[A-Z][A-Za-z0-9]*$')
                        AND upper(substr(tok, 1, 1)) || substr(tok, 2)
                            NOT IN ('The','A','An','It','He','She','They',
                                    'We','I','You','This','That','These',
                                    'Those','There','Here','What','Where',
                                    'When','Who','Why','How','Yes','No',
                                    'Ok','Okay','Please','Thanks','Hello',
                                    'Hi')) AS isname
                FROM t
            ),
            g AS (
                SELECT doc_id, pos, isname,
                       pos - ROW_NUMBER() OVER (
                           PARTITION BY doc_id, isname ORDER BY pos) AS grp
                FROM f
            )
            SELECT doc_id, CAST(min(pos) AS BIGINT) AS m_start,
                   CAST(max(pos) + 1 AS BIGINT) AS m_end
            FROM g WHERE isname
            GROUP BY doc_id, grp
            HAVING count(*) <= 10
            ORDER BY doc_id, m_start
        """,
    'doc_entity_canonical': _canonical_entities_sql()
        + " ORDER BY norm",
    'doc_split': """
            WITH h AS (
                SELECT doc_id,
                       CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                           1, 16) AS UBIGINT)
                       % 1000000 AS b
                FROM documents)
            SELECT doc_id,
                   CASE WHEN b < 800000 THEN 'train'
                        WHEN b < 900000 THEN 'valid'
                        ELSE 'test' END AS split
            FROM h ORDER BY doc_id
        """,
    'doc_stratified_sample': """
            WITH h AS (
                SELECT doc_id, lang,
                       CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                           1, 16) AS UBIGINT) AS hv
                FROM documents),
            r AS (
                SELECT doc_id, lang,
                       ROW_NUMBER() OVER (PARTITION BY lang
                                          ORDER BY hv, doc_id) AS rk
                FROM h)
            SELECT doc_id, lang FROM r WHERE rk <= 20 ORDER BY doc_id
        """,
    'doc_fingerprint': """
            SELECT doc_id,
                   CAST(CAST('0x' || substr(md5(regexp_replace(
                            trim(lower(text)), '\\s+', ' ', 'g')), 1, 16)
                         AS UBIGINT) % 9223372036854775808 AS BIGINT) AS fp
            FROM documents ORDER BY doc_id
        """,
    'doc_top_bigrams': """
            WITH words AS (
                SELECT list_filter(regexp_split_to_array(lower(text),
                                                         '\\s+'),
                                   x -> x <> '') AS ws
                FROM documents
            ),
            grams AS (
                SELECT unnest([array_to_string(ws[i:i+1], ' ')
                               for i in range(1, len(ws))]) AS ngram
                FROM words WHERE len(ws) >= 2
            )
            SELECT ngram, count(*) AS n_occurrences
            FROM grams GROUP BY ngram
            ORDER BY n_occurrences DESC, ngram LIMIT 10
        """,
    'doc_winnowing_md5': """
            WITH d AS (
                SELECT doc_id, lower(text) AS t,
                       length(lower(text)) - 8 + 1 AS n
                FROM documents WHERE length(lower(text)) >= 8
            ),
            g AS (
                SELECT doc_id, unnest(range(n)) AS position, t FROM d
            ),
            h AS (
                SELECT doc_id, position,
                       CAST(CAST('0x' || substr(md5(substr(
                                t, CAST(position + 1 AS INTEGER), 8)), 1, 16)
                            AS UBIGINT) % 9223372036854775808 AS BIGINT) AS fp
                FROM g
            ),
            w AS (
                SELECT doc_id, unnest(range(greatest(n - 3, 1))) AS s FROM d
            ),
            p AS (
                SELECT h.doc_id, w.s, h.position, h.fp
                FROM h JOIN w ON h.doc_id = w.doc_id
                 AND h.position >= w.s AND h.position < w.s + 4
            ),
            wm AS (SELECT doc_id, s, min(fp) AS mfp
                   FROM p GROUP BY doc_id, s),
            sel AS (
                SELECT p.doc_id, max(p.position) AS position
                FROM p JOIN wm ON p.doc_id = wm.doc_id AND p.s = wm.s
                              AND p.fp = wm.mfp
                GROUP BY p.doc_id, p.s
            )
            SELECT DISTINCT h.doc_id, h.fp AS fingerprint, h.position
            FROM sel JOIN h ON h.doc_id = sel.doc_id
                           AND h.position = sel.position
            ORDER BY h.doc_id, h.position
        """,
    'doc_pack_batches': f"""
            WITH t AS (
                SELECT doc_id, source, {_N_TOKENS_SQL} AS n_tokens
                FROM documents
            ),
            s AS (
                SELECT doc_id, source, n_tokens,
                       COALESCE(SUM(n_tokens) OVER (
                           PARTITION BY source ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING), 0) AS off
                FROM t
            )
            SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
                   CAST(off // 512 AS BIGINT) AS pack_id,
                   CAST(off % 512 AS BIGINT) AS pack_offset
            FROM s ORDER BY doc_id
        """,
    'doc_decontaminate': """
            WITH h AS (
                SELECT doc_id,
                       CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                           1, 16) AS UBIGINT)
                           % 1000000 AS b,
                       list_filter(regexp_split_to_array(lower(text),
                                                         '\\s+'),
                                   x -> x <> '') AS ws
                FROM documents
            ),
            eg AS (
                SELECT DISTINCT unnest([array_to_string(ws[i:i+7], ' ')
                                        for i in range(1, len(ws) - 6)])
                           AS g
                FROM h WHERE b >= 900000 AND len(ws) >= 8
            ),
            tg AS (
                SELECT doc_id,
                       unnest(list_distinct(
                           [array_to_string(ws[i:i+7], ' ')
                            for i in range(1, len(ws) - 6)])) AS g
                FROM h WHERE b < 900000 AND len(ws) >= 8
            )
            SELECT doc_id, count(*) AS n_hits
            FROM tg WHERE g IN (SELECT g FROM eg)
            GROUP BY doc_id ORDER BY doc_id
        """,
    'doc_quality_filter': """
            WITH w AS (
                SELECT doc_id,
                       unnest(list_filter(regexp_split_to_array(
                           lower(text), '\\s+'), x -> x <> '')) AS w
                FROM documents
            ),
            cnt AS (SELECT w, count(*) AS c FROM w GROUP BY w),
            tot AS (SELECT sum(c) AS t FROM cnt),
            lp AS (
                SELECT w, -log2(CAST(c AS DOUBLE) / t) AS l
                FROM cnt CROSS JOIN tot
            ),
            per AS (
                SELECT w.doc_id, round(avg(lp.l), 6) AS logppl
                FROM w JOIN lp ON w.w = lp.w GROUP BY w.doc_id
            ),
            scores AS (
                SELECT d.doc_id, COALESCE(per.logppl, 0.0) AS logppl
                FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
            ),
            thr AS (SELECT quantile_cont(logppl, 0.9) AS t FROM scores)
            SELECT doc_id FROM scores, thr WHERE logppl <= t
            ORDER BY doc_id
        """,
    'doc_heavy_hitters': """
            WITH w AS (
                SELECT unnest(list_filter(regexp_split_to_array(
                    lower(text), '\\s+'), x -> x <> '')) AS term
                FROM documents
            ),
            cnt AS (SELECT term, count(*) AS n_occurrences
                    FROM w GROUP BY 1),
            tot AS (SELECT sum(n_occurrences) AS n FROM cnt)
            SELECT term, n_occurrences FROM cnt, tot
            WHERE n_occurrences * 40 > n
            ORDER BY n_occurrences DESC, term
        """,
    'doc_tfidf_top': """
            WITH w AS (
                SELECT doc_id, unnest(list_filter(regexp_split_to_array(
                    lower(text), '\\s+'), x -> x <> '')) AS term
                FROM documents
            ),
            tf AS (SELECT doc_id, term, count(*) AS tfc
                   FROM w GROUP BY 1, 2),
            dl AS (SELECT doc_id, count(*) AS len FROM w GROUP BY 1),
            df AS (SELECT term, count(DISTINCT doc_id) AS dfc
                   FROM w GROUP BY 1),
            nd AS (SELECT count(*) AS n FROM documents),
            s AS (
                SELECT tf.doc_id, tf.term, tf.tfc, df.dfc,
                       (CAST(tf.tfc AS DOUBLE) / dl.len)
                       * (ln((1.0 + nd.n) / (1.0 + df.dfc)) + 1.0) AS sc
                FROM tf JOIN dl USING (doc_id) JOIN df USING (term)
                CROSS JOIN nd
            )
            SELECT doc_id, term, tfc AS tf_count, dfc AS doc_freq,
                   CAST(row_number() OVER (
                       PARTITION BY doc_id
                       ORDER BY sc DESC, term) AS BIGINT) AS rank
            FROM s QUALIFY rank <= 3 ORDER BY doc_id, rank
        """,
    'doc_bm25_scores': """
            WITH q(query_idx, term) AS (VALUES
                (0, 'spark'), (0, 'join'), (0, 'fast'),
                (1, 'dup'),
                (2, 'window'), (2, 'stream'), (2, 'query'), (2, 'sort')),
            w AS (
                SELECT doc_id, unnest(list_filter(regexp_split_to_array(
                    lower(text), '\\s+'), x -> x <> '')) AS term
                FROM documents
            ),
            dl AS (SELECT doc_id, count(*) AS len FROM w GROUP BY 1),
            nd AS (SELECT (SELECT count(*) FROM documents) AS n,
                          (SELECT count(*) FROM w) AS total),
            df AS (SELECT term, count(DISTINCT doc_id) AS dfc FROM w
                   WHERE term IN (SELECT term FROM q) GROUP BY 1),
            tf AS (SELECT doc_id, term, count(*) AS tfc FROM w
                   WHERE term IN (SELECT term FROM q) GROUP BY 1, 2)
            SELECT q.query_idx, tf.doc_id,
                   round(sum(
                       ln(1.0 + (nd.n - COALESCE(df.dfc, 0) + 0.5)
                                / (COALESCE(df.dfc, 0) + 0.5))
                       * (tf.tfc * (1.2 + 1.0))
                       / (tf.tfc + 1.2 * (1.0 - 0.75
                          + 0.75 * (dl.len
                                    / (CAST(nd.total AS DOUBLE) / nd.n))))
                   ), 6) AS score
            FROM q JOIN tf USING (term)
                 JOIN dl ON tf.doc_id = dl.doc_id
                 LEFT JOIN df ON df.term = q.term
                 CROSS JOIN nd
            GROUP BY q.query_idx, tf.doc_id
            ORDER BY q.query_idx, tf.doc_id
        """,
    'doc_unigram_logppl': """
            WITH w AS (
                SELECT doc_id,
                       unnest(list_filter(regexp_split_to_array(
                           lower(text), '\\s+'), x -> x <> '')) AS w
                FROM documents
            ),
            cnt AS (SELECT w, count(*) AS c FROM w GROUP BY w),
            tot AS (SELECT sum(c) AS t FROM cnt),
            lp AS (
                SELECT w, -log2(CAST(c AS DOUBLE) / t) AS l
                FROM cnt CROSS JOIN tot
            ),
            per AS (
                SELECT w.doc_id, count(*) AS n_tokens,
                       round(avg(lp.l), 6) AS logppl
                FROM w JOIN lp ON w.w = lp.w
                GROUP BY w.doc_id
            )
            SELECT d.doc_id,
                   CAST(COALESCE(per.n_tokens, 0) AS BIGINT) AS n_tokens,
                   COALESCE(per.logppl, 0.0) AS logppl
            FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
            ORDER BY d.doc_id
        """,
    'doc_repetition': """
            WITH w AS (
                SELECT doc_id, list_filter(
                    regexp_split_to_array(lower(text), '\\s+'),
                    x -> x <> '') AS ws
                FROM documents
            ),
            tok AS (
                SELECT doc_id, len(ws) AS n_tokens,
                       len(list_distinct(ws)) AS n_distinct
                FROM w
            ),
            bg AS (
                SELECT doc_id, unnest([array_to_string(ws[i:i+1], ' ')
                                       for i in range(1, len(ws))]) AS g
                FROM w WHERE len(ws) >= 2
            ),
            bgc AS (
                SELECT doc_id, g, count(*) AS c FROM bg
                GROUP BY doc_id, g
            ),
            top AS (
                SELECT doc_id, max(c) AS top_c, sum(c) AS total
                FROM bgc GROUP BY doc_id
            )
            SELECT t.doc_id, CAST(t.n_tokens AS BIGINT) AS n_tokens,
                   1.0 - CAST(t.n_distinct AS DOUBLE)
                       / greatest(t.n_tokens, 1) AS dup_word_frac,
                   COALESCE(CAST(top.top_c AS DOUBLE) / top.total, 0.0)
                       AS top_bigram_frac
            FROM tok t LEFT JOIN top ON t.doc_id = top.doc_id
            ORDER BY t.doc_id
        """,
    'dedup_minhash_edges': _EXACT_JACCARD_EDGES_SQL,
    'dedup_jaccard_edges': _EXACT_JACCARD_EDGES_SQL,
    'dedup_jaccard_prefix': _EXACT_JACCARD_EDGES_SQL,
    'dedup_components': """
            WITH RECURSIVE words AS (
                SELECT doc_id, list_filter(
                    regexp_split_to_array(lower(text), '\\s+'),
                    x -> x <> '') AS ws
                FROM documents
            ),
            grams AS (
                SELECT doc_id,
                       CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
                            ELSE [array_to_string(ws[i:i+2], ' ')
                                  for i in range(1, len(ws) - 1)] END AS gs
                FROM words WHERE len(ws) > 0
            ),
            dg AS (SELECT doc_id, unnest(list_distinct(gs)) AS g FROM grams),
            cnt AS (SELECT doc_id, count(*) AS c FROM dg GROUP BY doc_id),
            inter AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
                FROM dg a JOIN dg b ON a.g = b.g AND a.doc_id < b.doc_id
                GROUP BY a.doc_id, b.doc_id
            ),
            edges AS (
                SELECT doc_a, doc_b
                FROM inter
                JOIN cnt ca ON ca.doc_id = doc_a
                JOIN cnt cb ON cb.doc_id = doc_b
                WHERE CAST(i AS DOUBLE) / (ca.c + cb.c - i) >= 0.7
            ),
            sym AS (
                SELECT doc_a AS a, doc_b AS b FROM edges
                UNION ALL
                SELECT doc_b AS a, doc_a AS b FROM edges
            ),
            reach(a, b) AS (
                SELECT a, b FROM sym
                UNION
                SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
            )
            SELECT a AS node, least(a, min(b)) AS component
            FROM reach GROUP BY a ORDER BY node
        """,
    'dedup_survivors': """
            WITH RECURSIVE words AS (
                SELECT doc_id, list_filter(
                    regexp_split_to_array(lower(text), '\\s+'),
                    x -> x <> '') AS ws
                FROM documents
            ),
            grams AS (
                SELECT doc_id,
                       CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
                            ELSE [array_to_string(ws[i:i+2], ' ')
                                  for i in range(1, len(ws) - 1)] END AS gs
                FROM words WHERE len(ws) > 0
            ),
            dg AS (SELECT doc_id, unnest(list_distinct(gs)) AS g FROM grams),
            cnt AS (SELECT doc_id, count(*) AS c FROM dg GROUP BY doc_id),
            inter AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
                FROM dg a JOIN dg b ON a.g = b.g AND a.doc_id < b.doc_id
                GROUP BY a.doc_id, b.doc_id
            ),
            edges AS (
                SELECT doc_a, doc_b
                FROM inter
                JOIN cnt ca ON ca.doc_id = doc_a
                JOIN cnt cb ON cb.doc_id = doc_b
                WHERE CAST(i AS DOUBLE) / (ca.c + cb.c - i) >= 0.7
            ),
            sym AS (
                SELECT doc_a AS a, doc_b AS b FROM edges
                UNION ALL
                SELECT doc_b AS a, doc_a AS b FROM edges
            ),
            reach(a, b) AS (
                SELECT a, b FROM sym
                UNION
                SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
            ),
            losers AS (
                SELECT a FROM (
                    SELECT a, least(a, min(b)) AS comp
                    FROM reach GROUP BY a
                ) WHERE comp < a
            )
            SELECT doc_id FROM documents
            WHERE doc_id NOT IN (SELECT a FROM losers)
            ORDER BY doc_id
        """,
    'dedup_simhash_pairs': """
            WITH w AS (
                SELECT doc_id, unnest(list_distinct(list_filter(
                    regexp_split_to_array(lower(text), '\\s+'),
                    x -> x <> ''))) AS w
                FROM documents
            ),
            h AS (
                SELECT doc_id,
                       CAST('0x' || substr(md5(w), 1, 16) AS UBIGINT) AS h
                FROM w
            ),
            v AS (
                SELECT doc_id, b.bit,
                       sum(CASE WHEN (h >> b.bit) & 1 = 1
                                THEN 1 ELSE -1 END) AS vote
                FROM h CROSS JOIN (SELECT unnest(range(64)) AS bit) b
                GROUP BY doc_id, b.bit
            ),
            sim AS (
                SELECT doc_id,
                       CAST(sum(CASE WHEN vote > 0
                                     THEN 1::UBIGINT << bit
                                     ELSE 0 END) AS UBIGINT) AS sh
                FROM v GROUP BY doc_id
            ),
            all_docs AS (
                SELECT d.doc_id, coalesce(s.sh, 0::UBIGINT) AS sh
                FROM documents d LEFT JOIN sim s ON d.doc_id = s.doc_id
            )
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
            FROM all_docs a JOIN all_docs b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.sh, b.sh)) <= 3
              AND ((a.sh >> 0) & 65535 = (b.sh >> 0) & 65535
                OR (a.sh >> 16) & 65535 = (b.sh >> 16) & 65535
                OR (a.sh >> 32) & 65535 = (b.sh >> 32) & 65535
                OR (a.sh >> 48) & 65535 = (b.sh >> 48) & 65535)
            ORDER BY doc_a, doc_b
        """,
    'ann_topk': """
            SELECT query_idx, vec_id FROM (
                SELECT q.vec_id AS query_idx, e.vec_id AS vec_id,
                       row_number() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY list_cosine_similarity(e.embedding, q.embedding) DESC,
                                    e.vec_id) AS rk
                FROM embeddings q CROSS JOIN embeddings e
                WHERE q.vec_id < 3
            ) WHERE rk <= 5 ORDER BY query_idx, vec_id
        """,
    'doc_chunks': """
            WITH w AS (
                SELECT doc_id, list_filter(
                    regexp_split_to_array(lower(text), '\\s+'),
                    x -> x <> '') AS ws
                FROM documents),
            k AS (
                SELECT doc_id, ws, len(ws) AS n,
                       CASE WHEN len(ws) <= 24 THEN 1
                            ELSE (len(ws) - 24 + 16 - 1) // 16 + 1
                       END AS n_chunks
                FROM w WHERE len(ws) > 0)
            SELECT doc_id, i AS chunk_idx,
                   i * 16 AS start,
                   least(i * 16 + 24, n) AS "end",
                   array_to_string(
                       ws[i * 16 + 1 : least(i * 16 + 24, n)], ' ')
                       AS chunk_text
            FROM k, LATERAL (SELECT unnest(range(0, n_chunks)) AS i) t
            ORDER BY doc_id, chunk_idx
        """,
    'doc_weighted_sample': """
            WITH u AS (
                SELECT doc_id, source,
                       (CAST(CAST('0x' || substr(md5(CAST(doc_id AS
                            VARCHAR)), 1, 16) AS UBIGINT) % 1000000
                            AS DOUBLE) + 0.5) / 1000000 AS uu,
                       CASE source WHEN 'src0' THEN 4.0
                                   WHEN 'src1' THEN 0.5
                                   ELSE 1.0 END AS wt
                FROM documents)
            SELECT doc_id, source FROM u
            ORDER BY pow(uu, 1.0 / wt) DESC, doc_id
            LIMIT 50
        """,
    'doc_mixture_sample': """
            WITH w AS (
                SELECT doc_id, source,
                       CASE source WHEN 'src0' THEN 2.25
                                   WHEN 'src1' THEN 0.5
                                   ELSE 1.0 END AS wt,
                       CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                           1, 16) AS UBIGINT)
                           % 1000000 AS b
                FROM documents),
            n AS (SELECT doc_id, source,
                         CAST(floor(wt)
                              + CASE WHEN b < (wt - floor(wt)) * 1000000
                                     THEN 1 ELSE 0 END AS BIGINT)
                             AS n_copies
                  FROM w)
            SELECT doc_id, source, unnest(range(n_copies)) AS copy_idx
            FROM n WHERE n_copies > 0
            ORDER BY doc_id, copy_idx
        """,
    'dedup_incremental': """
            WITH h AS (
                SELECT doc_id,
                       CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                           1, 16) AS UBIGINT)
                           % 1000000 AS b,
                       regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')
                           AS k
                FROM documents),
            base AS (SELECT DISTINCT k FROM h WHERE b < 500000),
            inc AS (SELECT doc_id, k FROM h WHERE b >= 500000)
            SELECT min(doc_id) AS doc_id FROM inc
            WHERE k NOT IN (SELECT k FROM base)
            GROUP BY k ORDER BY doc_id
        """,
    'doc_snapshot_diff': """
            WITH old AS (
                SELECT doc_id,
                       regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')
                           AS k
                FROM documents WHERE doc_id < 450),
            new AS (
                SELECT doc_id,
                       regexp_replace(trim(lower(
                           CASE WHEN doc_id % 7 = 0
                                THEN text || ' v2' ELSE text END)),
                           '\\s+', ' ', 'g') AS k
                FROM documents WHERE doc_id >= 50)
            SELECT COALESCE(old.doc_id, new.doc_id) AS doc_id,
                   CASE WHEN old.doc_id IS NULL THEN 'added'
                        WHEN new.doc_id IS NULL THEN 'removed'
                        ELSE 'changed' END AS status
            FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id
            WHERE old.doc_id IS NULL OR new.doc_id IS NULL
               OR old.k <> new.k
            ORDER BY doc_id
        """,
    'doc_pagerank': _pagerank_oracle_sql(),
    'doc_vocab': """
            WITH w AS (
                SELECT unnest(list_filter(
                    regexp_split_to_array(lower(text), '\\s+'),
                    x -> x <> '')) AS word
                FROM documents),
            c AS (SELECT word, count(*) AS cnt FROM w GROUP BY word),
            r AS (SELECT word, cnt,
                         row_number() OVER (ORDER BY cnt DESC, word) - 1
                             AS token_id
                  FROM c)
            SELECT token_id, word, cnt FROM r
            WHERE token_id < 200 ORDER BY token_id
        """,
    'doc_normalize_text': """
            SELECT doc_id,
                   array_to_string(list_filter(
                       regexp_split_to_array(
                           lower(nfc_normalize(coalesce(text, ''))),
                           '\\s+'),
                       x -> x <> ''), ' ') AS norm_text
            FROM documents ORDER BY doc_id
        """,
    'doc_corpus_stats': """
            WITH n AS (
                SELECT CAST({_N_TOKENS_SQL} AS DOUBLE) AS n_tokens,
                       lang
                FROM documents)
            SELECT count(*) AS n_docs,
                   CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
                   round(sum(n_tokens) / count(*), 6) AS mean_tokens,
                   round(quantile_cont(n_tokens, 0.5), 6) AS p50_tokens,
                   round(quantile_cont(n_tokens, 0.95), 6) AS p95_tokens,
                   count(DISTINCT lang) AS n_langs
            FROM n
        """.replace("{_N_TOKENS_SQL}", _N_TOKENS_SQL),
    'doc_redact_persons': f"""
            WITH dm AS ({_doc_mentions_sql()}),
            per AS (SELECT doc_id, m_start, m_end FROM dm
                    WHERE entity_type = 'PER'),
            w AS (
                SELECT doc_id, list_filter(
                    regexp_split_to_array(text, '\\s+'),
                    x -> x <> '') AS ws
                FROM documents
            ),
            t AS (
                SELECT doc_id, unnest(ws) AS tok,
                       unnest(range(len(ws))) AS pos
                FROM w
            ),
            cover AS (
                SELECT DISTINCT doc_id, unnest(range(m_start, m_end))
                       AS pos
                FROM per
            ),
            red AS (
                SELECT t.doc_id, t.pos,
                       CASE WHEN c.pos IS NOT NULL THEN '[NAME]'
                            ELSE t.tok END AS tok2
                FROM t LEFT JOIN cover c
                  ON t.doc_id = c.doc_id AND t.pos = c.pos
            ),
            cnt AS (
                SELECT doc_id, count(*) AS n_redacted FROM per
                GROUP BY doc_id
            )
            SELECT d.doc_id,
                   coalesce(r.redacted, '') AS redacted,
                   CAST(coalesce(cnt.n_redacted, 0) AS BIGINT)
                       AS n_redacted
            FROM documents d
            LEFT JOIN (SELECT doc_id,
                              string_agg(tok2, ' ' ORDER BY pos)
                                  AS redacted
                       FROM red GROUP BY doc_id) r
              ON r.doc_id = d.doc_id
            LEFT JOIN cnt ON cnt.doc_id = d.doc_id
            ORDER BY d.doc_id
        """,
    'doc_source_gini': f"""
            WITH d AS (SELECT source,
                              CAST({_N_TOKENS_SQL} AS DOUBLE) AS x
                       FROM documents),
            r AS (SELECT source, x,
                         row_number() OVER (PARTITION BY source
                                            ORDER BY x) AS i,
                         count(*) OVER (PARTITION BY source) AS n,
                         sum(x) OVER (PARTITION BY source) AS s
                  FROM d)
            SELECT source,
                   round(2.0 * sum(i * x) / (max(n) * max(s))
                         - (max(n) + 1.0) / max(n), 6) AS gini
            FROM r GROUP BY source ORDER BY source
        """,
    'doc_shuffle_order': """
            SELECT doc_id,
                   row_number() OVER (
                       ORDER BY CAST(CAST('0x' || substr(
                           md5(doc_id || ':42'), 1, 16) AS UBIGINT)
                           AS DOUBLE), doc_id) - 1 AS pos
            FROM documents ORDER BY doc_id
        """,
    'doc_word_entropy': """
            WITH words AS (
                SELECT doc_id, unnest(list_filter(
                    regexp_split_to_array(lower(text), '\\s+'),
                    x -> x <> '')) AS w
                FROM documents),
            c AS (SELECT doc_id, w, count(*) AS n
                  FROM words GROUP BY doc_id, w),
            tot AS (SELECT doc_id, sum(n) AS t FROM c GROUP BY doc_id),
            h AS (SELECT c.doc_id,
                         round(-sum((n / t) * ln(n / t)), 6) AS entropy
                  FROM c JOIN tot ON tot.doc_id = c.doc_id
                  GROUP BY c.doc_id)
            SELECT d.doc_id, coalesce(h.entropy, 0.0) AS entropy
            FROM documents d LEFT JOIN h ON h.doc_id = d.doc_id
            ORDER BY d.doc_id
        """,
    'doc_source_vocab_jaccard': """
            WITH ws AS (
                SELECT DISTINCT source,
                       unnest(list_filter(
                           regexp_split_to_array(lower(text), '\\s+'),
                           x -> x <> '')) AS w
                FROM documents),
            cnt AS (SELECT source, count(*) AS c
                    FROM ws GROUP BY source),
            inter AS (
                SELECT a.source AS source_a, b.source AS source_b,
                       count(*) AS i
                FROM ws a JOIN ws b
                  ON a.w = b.w AND a.source < b.source
                GROUP BY 1, 2)
            SELECT source_a, source_b, CAST(i AS BIGINT) AS shared,
                   round(CAST(i AS DOUBLE) / (ca.c + cb.c - i), 6)
                       AS jaccard
            FROM inter
            JOIN cnt ca ON ca.source = source_a
            JOIN cnt cb ON cb.source = source_b
            ORDER BY source_a, source_b
        """,
    'doc_phrase_search': """
            WITH d AS (
                SELECT doc_id, list_filter(
                    regexp_split_to_array(lower(text), '\\s+'),
                    x -> x <> '') AS ws
                FROM documents),
            p AS (SELECT doc_id, unnest(ws) AS word,
                         generate_subscripts(ws, 1) AS pos
                  FROM d),
            a AS (SELECT doc_id, pos FROM p WHERE word = 'key'),
            b AS (SELECT doc_id, pos FROM p WHERE word = 'order')
            SELECT a.doc_id, count(*) AS n_matches
            FROM a JOIN b ON b.doc_id = a.doc_id
                         AND b.pos = a.pos + 1
            GROUP BY a.doc_id ORDER BY a.doc_id
        """,
    'doc_source_kl': """
            WITH w AS (
                SELECT source, unnest(list_filter(
                    regexp_split_to_array(lower(text), '\\s+'),
                    x -> x <> '')) AS word
                FROM documents),
            cw AS (SELECT word, count(*) AS cq FROM w GROUP BY 1),
            tot AS (SELECT (SELECT count(*) FROM w) AS n,
                           (SELECT count(*) FROM cw) AS v),
            sw AS (SELECT source, word, count(*) AS cp FROM w
                   GROUP BY 1, 2),
            st AS (SELECT source, count(*) AS ns FROM w GROUP BY 1),
            grid AS (
                SELECT st.source, cw.cq, coalesce(sw.cp, 0) AS cp,
                       st.ns
                FROM st CROSS JOIN cw
                LEFT JOIN sw ON sw.source = st.source
                            AND sw.word = cw.word),
            terms AS (
                SELECT source,
                       ((cp + 0.5) / (ns + 0.5 * t.v))
                       * log2(((cp + 0.5) / (ns + 0.5 * t.v))
                              / ((cq + 0.5) / (t.n + 0.5 * t.v)))
                           AS term
                FROM grid CROSS JOIN tot t)
            SELECT source, round(sum(term), 6) AS kl_bits
            FROM terms GROUP BY source ORDER BY source
        """,
    'doc_hybrid_rrf': """
            WITH w AS (
                SELECT doc_id, unnest(list_filter(
                    regexp_split_to_array(lower(text), '\\s+'),
                    x -> x <> '')) AS term
                FROM documents),
            dl AS (SELECT doc_id, count(*) AS len FROM w GROUP BY 1),
            nd AS (SELECT (SELECT count(*) FROM documents) AS n,
                          (SELECT count(*) FROM w) AS total),
            q(term) AS (VALUES ('spark'), ('join'), ('fast')),
            df AS (SELECT term, count(DISTINCT doc_id) AS dfc FROM w
                   WHERE term IN (SELECT term FROM q) GROUP BY 1),
            tf AS (SELECT doc_id, term, count(*) AS tfc FROM w
                   WHERE term IN (SELECT term FROM q) GROUP BY 1, 2),
            s_lex AS (
                SELECT tf.doc_id,
                       round(sum(
                           ln(1.0 + (nd.n - COALESCE(df.dfc, 0) + 0.5)
                                    / (COALESCE(df.dfc, 0) + 0.5))
                           * (tf.tfc * (1.2 + 1.0))
                           / (tf.tfc + 1.2 * (1.0 - 0.75
                              + 0.75 * (dl.len
                                 / (CAST(nd.total AS DOUBLE) / nd.n))))
                       ), 6) AS s
                FROM q JOIN tf USING (term)
                     JOIN dl ON tf.doc_id = dl.doc_id
                     LEFT JOIN df ON df.term = q.term
                     CROSS JOIN nd
                GROUP BY tf.doc_id),
            lexr AS (SELECT doc_id, r FROM (
                SELECT doc_id, row_number() OVER
                    (ORDER BY s DESC, doc_id) AS r FROM s_lex)
                WHERE r <= 100),
            dn AS (SELECT vec_id AS doc_id,
                          round(list_cosine_similarity(
                              CAST(embedding AS DOUBLE[]),
                              (SELECT CAST(embedding AS DOUBLE[])
                               FROM embeddings WHERE vec_id = 0)), 6)
                              AS s
                   FROM embeddings),
            denser AS (SELECT doc_id, r FROM (
                SELECT doc_id, row_number() OVER
                    (ORDER BY s DESC, doc_id) AS r FROM dn)
                WHERE r <= 100),
            fused AS (
                SELECT coalesce(l.doc_id, d.doc_id) AS doc_id,
                       coalesce(l.r, 0) AS r_lex,
                       coalesce(d.r, 0) AS r_dense,
                       round(coalesce(1.0 / (60 + l.r), 0)
                             + coalesce(1.0 / (60 + d.r), 0), 6)
                           AS rrf
                FROM lexr l FULL OUTER JOIN denser d
                     ON d.doc_id = l.doc_id)
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(r_lex AS BIGINT) AS r_lex,
                   CAST(r_dense AS BIGINT) AS r_dense, rrf
            FROM fused ORDER BY rrf DESC, doc_id LIMIT 10
        """,
}
ORACLE_REGISTRY.update(ORACLES)
ORACLES['doc_pretrain_corpus'] = ORACLE_REGISTRY['doc_pretrain_corpus'] = _pretrain_corpus_oracle_sql()
ORACLES['doc_decontaminate_bloom'] = ORACLE_REGISTRY['doc_decontaminate_bloom'] = ORACLE_REGISTRY["doc_decontaminate"]
ORACLES['doc_dup_spans'] = ORACLE_REGISTRY['doc_dup_spans'] = f"""
        WITH {_dup_islands_cte()}
        SELECT doc_id, s AS start, e AS "end"
        FROM spans ORDER BY doc_id, s"""
ORACLES['doc_dup_ratio'] = ORACLE_REGISTRY['doc_dup_ratio'] = f"""
        WITH {_dup_islands_cte()},
        cov AS (SELECT doc_id, sum(e - s) AS covered
                FROM spans GROUP BY doc_id),
        tot AS (SELECT doc_id, len(ws) AS n_words FROM words)
        SELECT tot.doc_id, tot.n_words,
               CAST(coalesce(cov.covered, 0) AS BIGINT) AS covered,
               round(CAST(coalesce(cov.covered, 0) AS DOUBLE)
                     / greatest(tot.n_words, 1), 6) AS dup_ratio
        FROM tot LEFT JOIN cov ON cov.doc_id = tot.doc_id
        ORDER BY tot.doc_id"""
ORACLES['doc_bm25_indexed'] = ORACLE_REGISTRY['doc_bm25_indexed'] = ORACLE_REGISTRY["doc_bm25_scores"]
ORACLES['dedup_component_sizes'] = ORACLE_REGISTRY['dedup_component_sizes'] = f"""
        WITH sizes AS (
            SELECT component, count(*) AS sz
            FROM ({ORACLE_REGISTRY["dedup_components"]}) GROUP BY component)
        SELECT CAST(sz AS BIGINT) AS size,
               CAST(count(*) AS BIGINT) AS n_components
        FROM sizes GROUP BY sz ORDER BY size"""
