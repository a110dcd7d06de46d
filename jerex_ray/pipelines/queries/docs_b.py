"""Split of the query registry: ``docs_b`` part (mechanically derived from the original queries.py by scripts/split_queries.py; unit order and source text preserved)."""

from __future__ import annotations
import re
import numpy as np
import pandas as pd
from jerex_ray.config import PipelineConfig
from jerex_ray.runtime import configure_data_context
from jerex_ray.pipelines.queries._shared import ORACLE_REGISTRY
from jerex_ray.pipelines.queries._shared import _BM25_QUERIES, _EXACT_JACCARD_EDGES_SQL, _N_TOKENS_SQL, _round_half_away  # noqa: E501

def doc_logreg_grad2(sf_dir: str):
    """Two-epoch gradient parity for the distributed logistic
    regression (``ops/logreg``): w₀=0 → one full-batch pass → step
    (lr=2) → second pass; returns the second mean gradient. Each pass
    is one streaming map_batches emitting (d+2)-float partials — the
    SQL oracle replays the same two rounds in chained CTEs with
    exp()."""
    from jerex_ray.ops.logreg import epoch_pass, feature_table
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text", "lang"])
    feats = feature_table(ds).materialize()
    g0, _, _ = epoch_pass(feats, np.zeros(4))
    g1, _, _ = epoch_pass(feats, -2.0 * g0)
    return pd.DataFrame({
        "g_bias": [round(float(g1[0]), 6)],
        "g_punct_ratio": [round(float(g1[1]), 6)],
        "g_mean_token_len": [round(float(g1[2]), 6)],
        "g_stopword_ratio": [round(float(g1[3]), 6)]})

def doc_quality_logreg(sf_dir: str):
    """Train the English-vs-rest quality classifier to convergence
    (30 full-batch GD epochs, one streaming pass each, feature blocks
    materialized once). Rows-only: the iterated exp/step recurrence
    isn't practical SQL past two rounds (the two-round prefix IS
    oracled via ``doc_logreg_grad2``); monotone loss decrease and a
    finite-difference gradient check are pytest-gated
    (test_logreg.py). Features are z-scored by a one-pass streaming
    moments stage first (fixed-lr GD is then stable by construction).
    The synthetic ``lang`` label carries only weak text signal, so
    the honest outcome is accuracy slightly above the majority base
    rate — the query demonstrates the training dataflow, not a
    separable task. Returns weights (standardized space), final
    loss, train accuracy."""
    from jerex_ray.ops.logreg import (FEATURES, accuracy, feature_table,
                                      standardize, train_logreg)
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text", "lang"])
    feats, _, _ = standardize(feature_table(ds))
    feats = feats.materialize()
    w, hist = train_logreg(feats, epochs=30, lr=1.0)
    row = {"w_bias": [round(float(w[0]), 6)]}
    for j, c in enumerate(FEATURES):
        row[f"w_{c}"] = [round(float(w[j + 1]), 6)]
    row["final_loss"] = [round(float(hist["loss"].iloc[-1]), 6)]
    row["train_acc"] = [round(accuracy(feats, w), 6)]
    return pd.DataFrame(row)

def doc_bigram_logppl(sf_dir: str):
    """Add-k smoothed bigram-LM quality score (the CCNet shape one
    order above ``doc_unigram_logppl``): per-doc mean −log2 P(w|prev)
    with P = (c(w₁w₂)+k)/(c(w₁·)+kV), k=0.5. Bigram counts reduce
    through the combiner; the vocabulary²-bounded table broadcasts
    once; one streaming pass scores. Oracled against the identical
    formula in SQL (positions via a char... word-index lateral)."""
    from jerex_ray.ops.textstats import bigram_logppl
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    out = bigram_logppl(ds).to_pandas()
    out["logppl"] = out["logppl"].round(6)
    out["n_bigrams"] = out["n_bigrams"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)

def doc_bpe_pair_counts(sf_dir: str):
    """First-round BPE pair statistics (Sennrich et al. 2016),
    fully distributed: combiner word-frequency aggregate → per-block
    vectorized char-pair partials (NUL-joined codepoint array, two
    shifted views — no per-word loop) → grouped sum. SQL-oracled via
    a words × char-position lateral in DuckDB."""
    from jerex_ray.ops.bpe import pair_counts
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["text"])
    return pair_counts(ds)

def doc_bpe_merges(sf_dir: str):
    """Learned BPE merge list (40 merges, min pair freq 2): the
    distributed word-frequency count feeds the driver-side greedy
    merge loop (inherently sequential; input is vocabulary-bounded,
    not corpus-bounded). Rows-only: the iterative merge recurrence
    is not SQL-expressible (DuckDB replace() has different overlap
    semantics than left-to-right BPE merging); parity vs an
    independent full-recount reference trainer is pytest-gated
    (test_bpe.py)."""
    from jerex_ray.ops.bpe import train_bpe, word_freqs
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["text"])
    wf = word_freqs(ds).to_pandas()
    return train_bpe(wf, num_merges=40)

def doc_bpe_tokens(sf_dir: str):
    """Tokenize the corpus with the learned merges: broadcast-apply
    actor stage (ranks built once per actor, per-actor word memo) →
    per-doc word/token/distinct-token counts. Rows-only (encoding is
    the same non-SQL recurrence); losslessness and the GPT-2 merge
    convention are pytest-gated."""
    from jerex_ray.ops.bpe import apply_bpe, train_bpe, word_freqs
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    wf = word_freqs(ds).to_pandas()
    merges = train_bpe(wf, num_merges=40)
    out = apply_bpe(ds, merges).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)

def doc_feature_hash(sf_dir: str, *, n_buckets: int = 32):
    """Hashing-trick bag-of-words featurization of every document
    (``ops/textstats.feature_hash``): md5 bucket + independent md5
    sign bit, nonzero (doc, bucket, feat) rows. One streaming pass,
    no vocabulary, no shuffle; oracled bit-for-bit via the md5-replay
    SQL."""
    from jerex_ray.ops.textstats import feature_hash
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    out = feature_hash(ds, n_buckets=n_buckets).to_pandas()
    for c in ("doc_id", "bucket", "feat"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["doc_id", "bucket"]).reset_index(drop=True)

def doc_nb_model(sf_dir: str, *, top_k: int = 20):
    """Multinomial naive-Bayes training over the documents table
    (class = lang, features = whitespace words, Laplace α = 1): the
    classic distributed text-classifier fit — ONE combiner pass to
    (lang, word) counts, node-sized class totals, vocabulary size from
    a distinct count. Emits the top-``top_k`` highest-count words per
    class with their smoothed log-likelihoods log((c+1)/(N_c+V)) and
    the class log-prior (ties on count break word-ascending, exactly
    reproducible in SQL)."""
    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_topk
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text", "lang"])

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        words = batch["text"].fillna("").str.lower().str.split()
        lens = words.str.len().fillna(0).to_numpy(dtype=np.int64)
        if lens.sum() == 0:
            return pd.DataFrame({"lang": pd.Series(dtype="object"),
                                 "w": pd.Series(dtype="object"),
                                 "c": pd.Series(dtype="int64")})
        flat = np.concatenate([w for w in words.to_numpy() if w])
        lang = np.repeat(batch["lang"].to_numpy(), lens)
        g = pd.DataFrame({"lang": lang, "w": flat}) \
            .groupby(["lang", "w"], sort=False).size() \
            .reset_index(name="c")
        g["c"] = g["c"].astype("int64")
        return g

    counts = grouped_aggregate(
        ds.map_batches(explode, batch_format="pandas", batch_size=8192),
        ["lang", "w"], {"n": ("c", "sum")}, result_hint="large") \
        .materialize()
    vocab_v = grouped_aggregate(counts, ["w"],
                                {"k": (None, "count")},
                                result_hint="large").count()
    cls = grouped_aggregate(counts, ["lang"],
                            {"tok": ("n", "sum"),
                             "types": (None, "count")}).to_pandas()
    ndocs = grouped_aggregate(ds, ["lang"],
                              {"docs": (None, "count")}).to_pandas()
    total_docs = int(ndocs["docs"].sum())

    top = grouped_topk(counts, ["lang"], order_by="n", k=top_k,
                       tie_cols=["w"]).to_pandas()
    top = top.merge(cls[["lang", "tok"]], on="lang") \
        .merge(ndocs, on="lang")
    loglik = np.log(top["n"].to_numpy(np.float64) + 1.0) \
        - np.log(top["tok"].to_numpy(np.float64) + float(vocab_v))
    logprior = np.log(top["docs"].to_numpy(np.float64)) \
        - np.log(float(total_docs))
    out = pd.DataFrame({"lang": top["lang"], "word": top["w"],
                        "n": top["n"].astype("int64"),
                        "loglik": np.round(loglik, 6),
                        "logprior": np.round(logprior, 6)})
    return out.sort_values(["lang", "n", "word"],
                           ascending=[True, False, True]) \
        .reset_index(drop=True)

def doc_sorted_neighborhood(sf_dir: str, *, window: int = 3,
                            key_chars: int = 24):
    """Sorted-neighborhood blocking (Hernández & Stolfo '95) — the
    third candidate-generation strategy next to LSH and prefix
    filtering: docs sort by a normalized key (first ``key_chars``
    lowercased characters), and every pair within ``window`` positions
    becomes a candidate (doc_a, doc_b, rank_gap).

    Scale shape: the global rank comes from ONE key-ordered exchange
    (per-block sort + block-offset scan — no driver data); pair
    generation then ships each row to its own rank-anchor plus the
    ``window`` anchors above it, so pairs materialize co-located,
    bounded by window × corpus. Oracled by the row_number self-join."""
    from jerex_ray.ops.dedup import sorted_neighborhood_pairs
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    out = sorted_neighborhood_pairs(ds, window=window,
                                    key_chars=key_chars).to_pandas()
    if "doc_a" not in out.columns:
        return pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                             "doc_b": pd.Series(dtype="int64"),
                             "rank_gap": pd.Series(dtype="int64")})
    out = out.astype({"doc_a": "int64", "doc_b": "int64",
                      "rank_gap": "int64"})
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)

def doc_nb_predict(sf_dir: str):
    """Naive-Bayes inference chained on the ``doc_nb_model`` fit: every
    document classified by argmax over classes of
    logprior + Σ_w cnt·log((n_{c,w}+1)/(N_c+V)), OOV words contributing
    the smoothed floor −log(N_c+V). The model (full (lang, word) count
    table) broadcasts ONCE — vocabulary-bounded like the unigram-LM
    table — and each batch classifies vectorized: word→row index map,
    one (words × classes) gather, one ``np.add.at`` scatter per class
    column. Ties break lang-ascending (both engines)."""
    import ray

    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text", "lang"])

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        words = batch["text"].fillna("").str.lower().str.split()
        lens = words.str.len().fillna(0).to_numpy(dtype=np.int64)
        if lens.sum() == 0:
            return pd.DataFrame({"lang": pd.Series(dtype="object"),
                                 "w": pd.Series(dtype="object"),
                                 "c": pd.Series(dtype="int64")})
        flat = np.concatenate([w for w in words.to_numpy() if w])
        lang = np.repeat(batch["lang"].to_numpy(), lens)
        g = pd.DataFrame({"lang": lang, "w": flat}) \
            .groupby(["lang", "w"], sort=False).size() \
            .reset_index(name="c")
        g["c"] = g["c"].astype("int64")
        return g

    counts = grouped_aggregate(
        ds.map_batches(explode, batch_format="pandas", batch_size=8192),
        ["lang", "w"], {"n": ("c", "sum")}, result_hint="large") \
        .to_pandas()
    ndocs = grouped_aggregate(ds, ["lang"],
                              {"docs": (None, "count")}).to_pandas()
    langs = sorted(ndocs["lang"])
    lidx = {l: i for i, l in enumerate(langs)}
    total_docs = float(ndocs["docs"].sum())
    logprior = np.full(len(langs), -np.inf)
    for l, d in zip(ndocs["lang"], ndocs["docs"]):
        logprior[lidx[l]] = np.log(float(d)) - np.log(total_docs)
    vocab = sorted(set(counts["w"])) if len(counts) else []
    widx = {w: i for i, w in enumerate(vocab)}
    V = float(len(vocab))
    tok = counts.groupby("lang")["n"].sum()
    denom = np.array([np.log(float(tok.get(l, 0)) + V) for l in langs])
    # loglik matrix (V+1 rows; last row = OOV floor log(1)−log(N_c+V))
    L = np.tile(-denom, (len(vocab) + 1, 1))
    if len(counts):
        r = counts["w"].map(widx).to_numpy(np.int64)
        cidx = counts["lang"].map(lidx).to_numpy(np.int64)
        L[r, cidx] = np.log(counts["n"].to_numpy(np.float64) + 1.0) \
            - denom[cidx]
    model = ray.put((widx, L, logprior, langs))

    def classify(batch: pd.DataFrame) -> pd.DataFrame:
        wmap, mat, prior, cls = ray.get(model)
        words = batch["text"].fillna("").str.lower().str.split()
        lens = words.str.len().fillna(0).to_numpy(dtype=np.int64)
        scores = np.tile(prior, (len(batch), 1))
        if lens.sum() > 0:
            flat = np.concatenate(
                [w if w else [] for w in words.to_numpy()])
            owner = np.repeat(np.arange(len(batch)), lens)
            rows = pd.Series(flat).map(wmap) \
                .fillna(len(mat) - 1).to_numpy(np.int64)
            np.add.at(scores, owner, mat[rows])
        best = np.argmin(  # argmax score, ties → smallest lang index
            np.where(scores == scores.max(axis=1, keepdims=True),
                     np.arange(len(cls)), len(cls)), axis=1)
        s = scores[np.arange(len(batch)), best]
        return pd.DataFrame(
            {"doc_id": batch["doc_id"],
             "pred_lang": np.asarray(cls, dtype=object)[best],
             "score": np.copysign(np.floor(np.abs(s) * 1e6 + 0.5),
                                  s) / 1e6})

    out = ds.map_batches(classify, batch_format="pandas",
                         batch_size=4096).to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)

def doc_hapax(sf_dir: str):
    """Per-source hapax-legomenon profile (vocabulary size, words
    occurring exactly once, hapax ratio) — the corpus-maturity
    diagnostic (a shrinking hapax share signals saturation/duplication).
    One combiner pass to (source, word) counts, then a vocab-bounded
    aggregate of count==1 indicators per source."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["source", "text"])

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        words = batch["text"].fillna("").str.lower().str.split()
        lens = words.str.len().fillna(0).to_numpy(dtype=np.int64)
        if lens.sum() == 0:
            return pd.DataFrame({"source": pd.Series(dtype="object"),
                                 "w": pd.Series(dtype="object"),
                                 "c": pd.Series(dtype="int64")})
        flat = np.concatenate([w for w in words.to_numpy() if w])
        src = np.repeat(batch["source"].to_numpy(), lens)
        g = pd.DataFrame({"source": src, "w": flat}) \
            .groupby(["source", "w"], sort=False).size() \
            .reset_index(name="c")
        g["c"] = g["c"].astype("int64")
        return g

    counts = grouped_aggregate(
        ds.map_batches(explode, batch_format="pandas", batch_size=8192),
        ["source", "w"], {"n": ("c", "sum")}, result_hint="large")

    def flags(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "n" not in df.columns:
            return pd.DataFrame({"source": pd.Series(dtype="object"),
                                 "vocab": pd.Series(dtype="int64"),
                                 "hapax": pd.Series(dtype="int64")})
        g = df.assign(one=(df["n"] == 1).astype("int64")) \
            .groupby("source", sort=False) \
            .agg(vocab=("n", "size"), hapax=("one", "sum"))
        return g.reset_index()

    out = grouped_aggregate(
        counts.map_batches(flags, batch_format="pandas"),
        ["source"], {"vocab": ("vocab", "sum"),
                     "hapax": ("hapax", "sum")}).to_pandas()
    out["vocab"] = out["vocab"].astype("int64")
    out["hapax"] = out["hapax"].astype("int64")
    out["hapax_ratio"] = (out["hapax"] / out["vocab"]).round(6)
    return out.sort_values("source").reset_index(drop=True)

def doc_zipf_slope(sf_dir: str, *, top_k: int = 1000):
    """Zipf's-law fit per source: OLS slope of ln(frequency) against
    ln(rank) over the top-``top_k`` words (natural text ≈ −1; flatter
    slopes flag templated/duplicated corpora). Combiner word counts →
    exact distributed top-k (the ≤ k×keys-shuffle combiner) → per-source
    co-located rank assignment and OLS co-moment partials; slopes close
    over the |sources|-bounded driver table, same centered arithmetic
    as DuckDB regr_slope (the oracle)."""
    from jerex_ray.functions.aggregate import (grouped_aggregate,
                                               grouped_apply,
                                               grouped_topk)
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["source", "text"])

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        words = batch["text"].fillna("").str.lower().str.split()
        lens = words.str.len().fillna(0).to_numpy(dtype=np.int64)
        if lens.sum() == 0:
            return pd.DataFrame({"source": pd.Series(dtype="object"),
                                 "w": pd.Series(dtype="object"),
                                 "c": pd.Series(dtype="int64")})
        flat = np.concatenate([w for w in words.to_numpy() if w])
        src = np.repeat(batch["source"].to_numpy(), lens)
        g = pd.DataFrame({"source": src, "w": flat}) \
            .groupby(["source", "w"], sort=False).size() \
            .reset_index(name="c")
        g["c"] = g["c"].astype("int64")
        return g

    counts = grouped_aggregate(
        ds.map_batches(explode, batch_format="pandas", batch_size=8192),
        ["source", "w"], {"n": ("c", "sum")}, result_hint="large")
    top = grouped_topk(counts, ["source"], order_by="n", k=top_k,
                       tie_cols=["w"])

    def ols_partials(block: pd.DataFrame) -> pd.DataFrame:
        cols = {"source": pd.Series(dtype="object"),
                "n": pd.Series(dtype="int64"),
                "sx": pd.Series(dtype="float64"),
                "sy": pd.Series(dtype="float64"),
                "sxx": pd.Series(dtype="float64"),
                "sxy": pd.Series(dtype="float64")}
        if block.empty or "source" not in block.columns:
            return pd.DataFrame(cols)
        parts = []
        for src, g in block.groupby("source", sort=False):
            s = g.sort_values(["n", "w"], ascending=[False, True])
            x = np.log(np.arange(1, len(s) + 1, dtype=np.float64))
            y = np.log(s["n"].to_numpy(np.float64))
            parts.append(pd.DataFrame(
                {"source": [src], "n": [np.int64(len(s))],
                 "sx": [x.sum()], "sy": [y.sum()],
                 "sxx": [(x * x).sum()], "sxy": [(x * y).sum()]}))
        return pd.concat(parts, ignore_index=True)

    m = grouped_apply(top, ["source"], ols_partials).to_pandas()
    n = m["n"].to_numpy(np.float64)
    vx = m["sxx"] - m["sx"] ** 2 / n
    cov = m["sxy"] - m["sx"] * m["sy"] / n
    slope = cov / vx
    out = pd.DataFrame({"source": m["source"],
                        "n_terms": m["n"].astype("int64"),
                        "slope": slope.round(6),
                        "intercept": (m["sy"] / n
                                      - slope * m["sx"] / n).round(6)})
    return out.sort_values("source").reset_index(drop=True)

def doc_sentence_stats(sf_dir: str):
    """Per-document sentence segmentation profile (sentence count,
    mean and max words per sentence) by the deterministic [.!?]+ rule
    — the readability-style quality signal upstream models filter on.
    Fully vectorized: one regex split per batch, explode, two grouped
    reductions; oracled by the identical regexp split in SQL."""
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def stats(batch: pd.DataFrame) -> pd.DataFrame:
        sents = batch["text"].fillna("").str.split(r"[.!?]+", regex=True)
        ids = batch["doc_id"].to_numpy()
        lens = sents.str.len().fillna(0).to_numpy(np.int64)
        flat = [s for lst in sents.to_numpy() for s in lst]
        owner = np.repeat(np.arange(len(batch)), lens)
        words = pd.Series(flat).str.split().str.len() \
            .fillna(0).to_numpy(np.int64)
        keep = words > 0
        owner, words = owner[keep], words[keep]
        g = pd.DataFrame({"i": owner, "w": words}).groupby("i")["w"] \
            .agg(["size", "mean", "max"])
        n = np.zeros(len(batch), dtype=np.int64)
        mean = np.zeros(len(batch), dtype=np.float64)
        mx = np.zeros(len(batch), dtype=np.int64)
        n[g.index] = g["size"].to_numpy(np.int64)
        mean[g.index] = g["mean"].to_numpy(np.float64)
        mx[g.index] = g["max"].to_numpy(np.int64)
        # DuckDB round() is half-away-from-zero; mirror it
        mean_r = np.copysign(np.floor(np.abs(mean) * 1e6 + 0.5),
                             mean) / 1e6
        return pd.DataFrame({"doc_id": ids, "n_sentences": n,
                             "mean_words": mean_r,
                             "max_words": mx})

    out = ds.map_batches(stats, batch_format="pandas",
                         batch_size=4096).to_pandas()
    out = out.astype({"doc_id": "int64", "n_sentences": "int64",
                      "max_words": "int64"})
    return out.sort_values("doc_id").reset_index(drop=True)

def doc_simpson_diversity(sf_dir: str):
    """Simpson lexical diversity per source, 1 − Σ p(w)² (the
    probability two random tokens differ) — the repetition-sensitive
    corpus-health twin of word entropy. One combiner pass to (source,
    word) counts, a vocab-bounded Σc² reduce, |sources| scalars out."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["source", "text"])

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        words = batch["text"].fillna("").str.lower().str.split()
        lens = words.str.len().fillna(0).to_numpy(dtype=np.int64)
        if lens.sum() == 0:
            return pd.DataFrame({"source": pd.Series(dtype="object"),
                                 "w": pd.Series(dtype="object"),
                                 "c": pd.Series(dtype="int64")})
        flat = np.concatenate([w for w in words.to_numpy() if w])
        src = np.repeat(batch["source"].to_numpy(), lens)
        g = pd.DataFrame({"source": src, "w": flat}) \
            .groupby(["source", "w"], sort=False).size() \
            .reset_index(name="c")
        g["c"] = g["c"].astype("int64")
        return g

    counts = grouped_aggregate(
        ds.map_batches(explode, batch_format="pandas", batch_size=8192),
        ["source", "w"], {"n": ("c", "sum")}, result_hint="large")

    def sq(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "n" not in df.columns:
            return pd.DataFrame({"source": pd.Series(dtype="object"),
                                 "tok": pd.Series(dtype="int64"),
                                 "sq": pd.Series(dtype="float64")})
        c = df["n"].to_numpy(np.float64)
        g = pd.DataFrame({"source": df["source"].to_numpy(),
                          "tok": df["n"].to_numpy(np.int64),
                          "sq": c * c}) \
            .groupby("source", sort=False, as_index=False).sum()
        return g

    m = grouped_aggregate(counts.map_batches(sq, batch_format="pandas"),
                          ["source"], {"tok": ("tok", "sum"),
                                       "sq": ("sq", "sum")}).to_pandas()
    tok = m["tok"].to_numpy(np.float64)
    out = pd.DataFrame({
        "source": m["source"],
        "n_tokens": m["tok"].astype("int64"),
        "simpson": (1.0 - m["sq"].to_numpy(np.float64)
                    / (tok * tok)).round(6)})
    return out.sort_values("source").reset_index(drop=True)

def doc_readability(sf_dir: str):
    """Flesch reading-ease per document with a DETERMINISTIC syllable
    rule (count of [aeiouy]+ runs per word — reproducible in SQL, no
    dictionary): 206.835 − 1.015·(words/sentences) −
    84.6·(syllables/words). Sentences split on [.!?]+, empty sentences
    dropped; docs with no words emit NULL. Fully vectorized — one
    regex pass per batch for each of the three counts."""
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        txt = batch["text"].fillna("").str.lower()
        words = txt.str.count(r"\S+").to_numpy(np.float64)
        sylls = txt.str.count(r"[aeiouy]+").to_numpy(np.float64)
        sents = txt.str.split(r"[.!?]+", regex=True) \
            .map(lambda ss: sum(1 for s in ss if s.split())) \
            .to_numpy(np.float64)
        ok = (words > 0) & (sents > 0)
        f = 206.835 \
            - 1.015 * (words / np.maximum(sents, 1.0)) \
            - 84.6 * (sylls / np.maximum(words, 1.0))
        f_r = np.copysign(np.floor(np.abs(f) * 1e6 + 0.5), f) / 1e6
        # docs with no words/sentences are dropped (SQL WHERE parity —
        # avoids NaN-vs-NULL hash ambiguity in the compare)
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "n_words": words.astype(np.int64),
            "n_syllables": sylls.astype(np.int64),
            "n_sentences": sents.astype(np.int64),
            "flesch": f_r})[ok]

    out = ds.map_batches(score, batch_format="pandas",
                         batch_size=4096).to_pandas()
    out = out.astype({"doc_id": "int64", "n_words": "int64",
                      "n_syllables": "int64", "n_sentences": "int64"})
    return out.sort_values("doc_id").reset_index(drop=True)

_RAKE_STOPWORDS = ("the", "and", "of", "to", "a", "in", "is", "it",
                   "for", "on", "with", "as", "at", "by", "an")

def doc_rake_keywords(sf_dir: str, *, top_k: int = 10):
    """RAKE keyword extraction per source (Rose et al. '10): phrases
    are maximal runs of non-stopword words within sentences; each
    word scores degree/frequency (degree = Σ length of phrases it
    appears in), a phrase scores the sum of its words' scores, and the
    top-``top_k`` phrases per source surface (score desc — ROUNDED
    before ranking so float dust can't flip ranks across engines —
    then phrase asc).

    Dataflow: phrase assembly is doc-local (one vectorized double
    explode + island ids per batch, NO shuffle); word degree/frequency
    reduce through one (source, word) combiner; the vocab-bounded
    score table broadcasts back; identical phrases aggregate under
    (source, phrase) co-location and the exact top-k combiner
    finishes."""
    import ray

    from jerex_ray.functions.aggregate import (grouped_aggregate,
                                               grouped_topk)
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text", "source"])
    stops = set(_RAKE_STOPWORDS)

    def word_rows(batch: pd.DataFrame) -> pd.DataFrame:
        """Vectorized islands pass: one row per phrase WORD with the
        phrase's island id and length — no per-token Python loop."""
        empty = pd.DataFrame({"source": pd.Series(dtype="object"),
                              "island": pd.Series(dtype="int64"),
                              "w": pd.Series(dtype="object"),
                              "plen": pd.Series(dtype="int64")})
        txt = batch["text"].fillna("").str.lower()
        sents = txt.str.split(r"[.!?]+", regex=True)
        slens = sents.str.len().fillna(0).to_numpy(np.int64)
        if slens.sum() == 0:
            return empty
        src_s = np.repeat(batch["source"].to_numpy(), slens)
        flat_s = [s for lst in sents.to_numpy() for s in lst]
        words = pd.Series(flat_s, dtype="object").str.split()
        wlens = words.str.len().fillna(0).to_numpy(np.int64)
        if wlens.sum() == 0:
            return empty
        sent_idx = np.repeat(np.arange(len(flat_s)), wlens)
        src_w = np.repeat(src_s, wlens)
        flat_w = np.concatenate([w for w in words.to_numpy() if w])
        stop = pd.Series(flat_w).isin(stops).to_numpy()
        new_sent = np.r_[True, sent_idx[1:] != sent_idx[:-1]]
        island = np.cumsum(stop | new_sent)
        keep = ~stop
        if not keep.any():
            return empty
        df = pd.DataFrame({"source": src_w[keep],
                           "island": island[keep].astype(np.int64),
                           "w": flat_w[keep]})
        df["plen"] = df.groupby("island", sort=False)["w"] \
            .transform("size").astype("int64")
        return df

    def word_stats(batch: pd.DataFrame) -> pd.DataFrame:
        df = word_rows(batch)
        if df.empty:
            return pd.DataFrame({"source": pd.Series(dtype="object"),
                                 "w": pd.Series(dtype="object"),
                                 "freq": pd.Series(dtype="int64"),
                                 "deg": pd.Series(dtype="int64")})
        g = df.groupby(["source", "w"], sort=False) \
            .agg(freq=("plen", "size"), deg=("plen", "sum")) \
            .reset_index()
        return g.astype({"freq": "int64", "deg": "int64"})

    stats = grouped_aggregate(
        ds.map_batches(word_stats, batch_format="pandas",
                       batch_size=4096),
        ["source", "w"], {"freq": ("freq", "sum"),
                          "deg": ("deg", "sum")},
        result_hint="large").to_pandas()
    score_map = {(s, w): d / f for s, w, f, d in zip(
        stats["source"], stats["w"],
        stats["freq"].to_numpy(np.float64),
        stats["deg"].to_numpy(np.float64))}
    sm_ref = ray.put(score_map)

    def phrase_scores(batch: pd.DataFrame) -> pd.DataFrame:
        sm = ray.get(sm_ref)
        df = word_rows(batch)
        if df.empty:
            return pd.DataFrame({"source": pd.Series(dtype="object"),
                                 "phrase": pd.Series(dtype="object"),
                                 "n": pd.Series(dtype="int64"),
                                 "score": pd.Series(dtype="float64")})
        df["ws"] = pd.Series(
            list(zip(df["source"], df["w"]))).map(sm).to_numpy()
        g = df.groupby(["source", "island"], sort=False) \
            .agg(phrase=("w", " ".join), score=("ws", "sum")) \
            .reset_index()
        # round BEFORE the (source, phrase) aggregate and the rank so
        # float summation dust can't flip ranks across engines
        g["score"] = g["score"].round(6)
        out = g.groupby(["source", "phrase"], sort=False) \
            .agg(n=("score", "size"), score=("score", "max")) \
            .reset_index()
        return out.astype({"n": "int64"})

    agg = grouped_aggregate(
        ds.map_batches(phrase_scores, batch_format="pandas",
                       batch_size=4096),
        ["source", "phrase"], {"n": ("n", "sum"),
                               "score": ("score", "max")},
        result_hint="large")
    top = grouped_topk(agg, ["source"], order_by="score", k=top_k,
                       tie_cols=["phrase"]).to_pandas()
    out = top[["source", "phrase", "n", "score"]] \
        .astype({"n": "int64"})
    return out.sort_values(["source", "score", "phrase"],
                           ascending=[True, False, True]) \
        .reset_index(drop=True)

def doc_ttr(sf_dir: str):
    """Per-document type-token ratio (distinct words / total words) —
    the oldest lexical-richness signal, cheap enough to run on every
    ingest batch. Fully doc-local and vectorized (one explode +
    nunique per doc); docs with no words are dropped (SQL WHERE
    parity)."""
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def ttr(batch: pd.DataFrame) -> pd.DataFrame:
        words = batch["text"].fillna("").str.lower().str.split()
        lens = words.str.len().fillna(0).to_numpy(np.int64)
        empty = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                              "n_tokens": pd.Series(dtype="int64"),
                              "n_types": pd.Series(dtype="int64"),
                              "ttr": pd.Series(dtype="float64")})
        if lens.sum() == 0:
            return empty
        flat = np.concatenate([w for w in words.to_numpy() if w])
        owner = np.repeat(batch["doc_id"].to_numpy(), lens)
        g = pd.DataFrame({"doc_id": owner, "w": flat}) \
            .groupby("doc_id")["w"].agg(["size", "nunique"])
        ratio = g["nunique"].to_numpy(np.float64) \
            / g["size"].to_numpy(np.float64)
        return pd.DataFrame({
            "doc_id": g.index.to_numpy(np.int64),
            "n_tokens": g["size"].to_numpy(np.int64),
            "n_types": g["nunique"].to_numpy(np.int64),
            "ttr": np.copysign(np.floor(np.abs(ratio) * 1e6 + 0.5),
                               ratio) / 1e6})

    out = ds.map_batches(ttr, batch_format="pandas",
                         batch_size=4096).to_pandas()
    out = out.astype({"doc_id": "int64", "n_tokens": "int64",
                      "n_types": "int64"})
    return out.sort_values("doc_id").reset_index(drop=True)

def doc_pair_similarity(sf_dir: str):
    """All-pairs TF-IDF cosine similarity ≥ 0.8 via the inverted-index
    self-join (``ops/simjoin.tfidf_cosine_pairs``, Elsayed et al.
    '08): one df combiner pass, broadcast idf, doc-local norms, one
    term hash shuffle with block-local wedge partial products, final
    pair combiner. Hubs (df > ⌊0.9·N⌋) are pruned from the vector
    space — the explicit all-pairs scale lever, mirrored in the
    oracle. Both sides round to 6 decimals and threshold on the
    ROUNDED cosine."""
    import math

    import pyarrow.parquet as _pq

    from jerex_ray.ops.simjoin import tfidf_cosine_pairs
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    n_docs = _pq.ParquetFile(f"{sf_dir}/documents.parquet") \
        .metadata.num_rows
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    out = tfidf_cosine_pairs(ds, threshold=0.8,
                             max_df=int(math.floor(0.9 * n_docs))) \
        .to_pandas()
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)

def doc_compression_ratio(sf_dir: str):
    """Per-document zlib compressibility (level 6) — the classic
    cheap quality/repetition signal web-corpus pipelines filter on
    (highly compressible ⇒ boilerplate or repetition; cf. Gopher's
    repetition rules): ratio = deflated bytes / raw utf-8 bytes.
    One streaming pass; zlib does the per-row work in C. Rows-only:
    DEFLATE output is not SQL-reproducible; determinism and a
    hand-recompute parity check are pytest-gated."""
    import zlib

    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def ratios(df: pd.DataFrame) -> pd.DataFrame:
        raw = [t.encode("utf-8") for t in df["text"].fillna("")]
        rb = np.array([len(b) for b in raw], dtype=np.int64)
        cb = np.array([len(zlib.compress(b, 6)) for b in raw],
                      dtype=np.int64)
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "raw_bytes": rb, "gz_bytes": cb,
            "ratio": np.round(np.where(rb > 0, cb / np.maximum(rb, 1),
                                       np.nan), 6)})

    out = ds.map_batches(ratios, batch_format="pandas",
                         batch_size=8192).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)

def doc_postings_size(sf_dir: str):
    """Inverted-index size estimation under delta + varint coding
    (the storage model of every posting-list format since VByte,
    Williams & Zobel '99): per term, raw 8-byte postings vs
    gap-encoded varint bytes. One distinct (term, doc) explode, one
    term hash shuffle; gaps and byte classes are vectorized per
    block. Integer-exact end to end — the SQL LAG oracle agrees on
    every byte."""
    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        words = df["text"].fillna("").str.lower().str.split()
        lens = words.str.len().fillna(0).to_numpy(np.int64)
        if lens.sum() == 0:
            return pd.DataFrame({"term": pd.Series(dtype="object"),
                                 "doc_id": pd.Series(dtype="int64")})
        ids = df["doc_id"].astype("int64").to_numpy()
        flat = pd.DataFrame({
            "doc_id": np.repeat(ids, lens),
            "term": np.concatenate([w for w in words.to_numpy() if w])})
        return flat.drop_duplicates()[["term", "doc_id"]]

    inc = grouped_aggregate(
        ds.map_batches(explode, batch_format="pandas",
                       batch_size=8192),
        ["term", "doc_id"], {"n": (None, "count")},
        result_hint="large").drop_columns(["n"])

    def sizes(block: pd.DataFrame) -> pd.DataFrame:
        if block.empty:
            return pd.DataFrame({
                "term": pd.Series(dtype="object"),
                "df": pd.Series(dtype="int64"),
                "raw_bytes": pd.Series(dtype="int64"),
                "varint_bytes": pd.Series(dtype="int64"),
                "ratio": pd.Series(dtype="float64")})
        b = block.sort_values(["term", "doc_id"])
        ids = b["doc_id"].to_numpy(np.int64)
        terms = b["term"].to_numpy()
        new_t = np.r_[True, terms[1:] != terms[:-1]]
        gaps = np.diff(np.r_[np.int64(0), ids])
        gaps[new_t] = ids[new_t]        # first posting: absolute id
        vb = np.select([gaps < 128, gaps < 16384, gaps < 2097152,
                        gaps < 268435456], [1, 2, 3, 4], 5)
        g = pd.DataFrame({"term": terms, "vb": vb}) \
            .groupby("term", sort=False)["vb"].agg(["count", "sum"]) \
            .reset_index()
        df_ = g["count"].to_numpy(np.int64)
        vbytes = g["sum"].to_numpy(np.int64)
        return pd.DataFrame({
            "term": g["term"], "df": df_, "raw_bytes": df_ * 8,
            "varint_bytes": vbytes,
            "ratio": np.round(vbytes / (df_ * 8.0), 6)})

    out = grouped_apply(inc, ["term"], sizes).to_pandas()
    for c in ("df", "raw_bytes", "varint_bytes"):
        out[c] = out[c].astype("int64")
    return out.sort_values("term").reset_index(drop=True)

def doc_ppr(sf_dir: str, *, damping: float = 0.85, iters: int = 5):
    """Personalized PageRank / random walk with restart (Jeh & Widom
    '03) from the smallest doc in the exact-Jaccard near-dup graph:
    all teleport mass on the seed, so scores measure similarity-graph
    proximity TO that doc (the "more like this" primitive). Same
    broadcast power iteration as ``doc_pagerank`` with a teleport
    VECTOR; oracled by a chained-CTE replay whose per-round LEFT JOIN
    keeps zero-rank nodes alive."""
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
    seed = int(min(edges["doc_a"].min(), edges["doc_b"].min()))
    pr = pagerank(ray.data.from_pandas(edges[["doc_a", "doc_b"]]),
                  damping=damping, iters=iters, personalize=seed)
    pr["pr"] = pr["pr"].round(6)
    pr = pr.rename(columns={"node": "doc_id"})
    pr["doc_id"] = pr["doc_id"].astype("int64")
    return pr.sort_values("doc_id").reset_index(drop=True)

def doc_kn_logppl(sf_dir: str):
    """Interpolated Kneser-Ney bigram quality score
    (``ops/textstats.kneser_ney_logppl``): per-doc mean −ln P with
    the continuation-count smoothing (D = 0.75) — the LM-quality
    signal one smoothing class above the add-k scorer
    ``doc_bigram_logppl``. One combiner pass fits; one broadcast
    pass scores; SQL-oracled with the identically-sequenced
    probability expression."""
    from jerex_ray.ops.textstats import kneser_ney_logppl
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    out = kneser_ney_logppl(ds).to_pandas()
    out["logppl"] = out["logppl"].round(6)
    out["n_bigrams"] = out["n_bigrams"].astype("int64")
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)

def doc_dirichlet_ql(sf_dir: str):
    """Dirichlet-smoothed query-likelihood scores of every doc
    against the three fixed BM25 queries (Zhai & Lafferty '01,
    ``ops/bm25.dirichlet_ql_scores``, μ=100) — the language-modeling
    retrieval twin of ``doc_bm25_scores`` over the identical query
    set; every doc scores against every query because the collection
    model never zeroes. 6-dp rounding absorbs per-doc term-sum order
    differences."""
    from jerex_ray.ops.bm25 import dirichlet_ql_scores
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    out = dirichlet_ql_scores(ds, _BM25_QUERIES, mu=100.0).to_pandas()
    out["score"] = out["score"].round(6)
    out["query_idx"] = out["query_idx"].astype("int64")
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values(["query_idx", "doc_id"]) \
        .reset_index(drop=True)

def doc_rice_param(sf_dir: str):
    """Golomb–Rice parameter selection audit (Golomb '66; Rice '79)
    for the delta-coded postings of the documents index — the tuning
    pass next to ``doc_postings_size``'s varint estimate: with Rice
    parameter k a gap g costs (g >> k) + 1 + k bits (unary quotient,
    stop bit, k remainder bits), so the per-k corpus totals are PURE
    integer sums and the optimal k* is an exact argmin (ties to the
    smaller k). Dataflow: the shared distinct (term, doc) explode,
    gaps per term co-located once, then per-block vectorized
    Σ(g>>k) partials for all eight k's reduce through ONE combiner
    to the 8-row grid. Output: one row per k with total_bits and
    the k_star flag."""
    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        words = df["text"].fillna("").str.lower().str.split()
        lens = words.str.len().fillna(0).to_numpy(np.int64)
        if lens.sum() == 0:
            return pd.DataFrame({"term": pd.Series(dtype="object"),
                                 "doc_id": pd.Series(dtype="int64")})
        ids = df["doc_id"].astype("int64").to_numpy()
        flat = pd.DataFrame({
            "doc_id": np.repeat(ids, lens),
            "term": np.concatenate(
                [w for w in words.to_numpy() if w])})
        return flat.drop_duplicates()[["term", "doc_id"]]

    inc = grouped_aggregate(
        ds.map_batches(explode, batch_format="pandas",
                       batch_size=8192),
        ["term", "doc_id"], {"n": (None, "count")},
        result_hint="large").drop_columns(["n"])

    def rice_partials(block: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"k": pd.Series(dtype="int64"),
                              "qsum": pd.Series(dtype="int64"),
                              "n": pd.Series(dtype="int64")})
        if block.empty or "term" not in block.columns:
            return empty
        b = block.sort_values(["term", "doc_id"])
        ids = b["doc_id"].to_numpy(np.int64)
        terms = b["term"].to_numpy()
        new_t = np.r_[True, terms[1:] != terms[:-1]]
        gaps = np.diff(np.r_[np.int64(0), ids])
        gaps[new_t] = ids[new_t]      # first posting: gap = doc_id
        rows = [(k, int((gaps >> k).sum()), len(gaps))
                for k in range(8)]
        return pd.DataFrame(rows, columns=["k", "qsum", "n"]) \
            .astype({"k": "int64", "qsum": "int64", "n": "int64"})

    g = grouped_aggregate(
        grouped_apply(inc, ["term"], rice_partials),
        ["k"], {"qsum": ("qsum", "sum"), "n": ("n", "sum")}) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    for c in ["k", "qsum", "n"]:
        g[c] = g[c].astype("int64")
    g["total_bits"] = g["qsum"] + g["n"] * (1 + g["k"])
    best = int(g.loc[g["total_bits"].idxmin(), "k"])  # ties: first
    g["k_star"] = (g["k"] == best).astype("int64")
    return g[["k", "n", "total_bits", "k_star"]]

def doc_front_coding(sf_dir: str):
    """Front-coding dictionary audit (Witten-Moffat-Bell: store each
    sorted word as (lcp with predecessor, suffix)) over the corpus
    vocabulary — the term-dictionary compression every inverted index
    uses. One combiner pass to the distinct-word table (vocabulary-
    bounded driver close, the BPE/vocab contract), sorted ascending,
    suffix bytes = len − lcp(prev). Integer-exact."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["text"])

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        words = df["text"].fillna("").str.lower().str.split()
        flat = [w for ws in words.to_numpy() if ws for w in ws]
        if not flat:
            return pd.DataFrame({"w": pd.Series(dtype="object")})
        return pd.DataFrame({"w": pd.unique(np.asarray(flat,
                                                       dtype=object))})

    vocab = grouped_aggregate(
        ds.map_batches(explode, batch_format="pandas",
                       batch_size=8192),
        ["w"], {"n": (None, "count")}).to_pandas()
    ws = sorted(str(w) for w in vocab["w"])
    raw = sum(len(w) for w in ws)
    front = 0
    prev = ""
    for w in ws:
        l = 0
        for a, b in zip(prev, w):
            if a != b:
                break
            l += 1
        front += len(w) - l
        prev = w
    return pd.DataFrame({
        "n_words": [np.int64(len(ws))],
        "raw_bytes": [np.int64(raw)],
        "front_bytes": [np.int64(front)]})

def doc_select_coverage(sf_dir: str):
    """Greedy max-coverage training-data selection (Nemhauser, Wolsey
    & Fisher '78: the submodular greedy's (1-1/e) guarantee; coverage
    of a hashed word-trigram space is the classic instance — the
    "pick a diverse seed subset" curation op). 8 rounds over 4096 md5
    buckets: per-doc bucket sets materialize once (no shuffle — a doc
    is one row), then each round ships one 4096-bit covered bitmap out
    and ONE candidate row per block back; integer gains with doc_id
    tie-break make the scan deterministic, so the generated
    chained-CTE oracle replays the identical greedy selection."""
    from jerex_ray.ops.select import coverage_select
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return coverage_select(ds, k=8, n=3, buckets=4096)

def doc_dsir_select(sf_dir: str):
    """DSIR data selection (Xie et al. '23, arXiv:2302.03169):
    importance-resampling scores of raw docs (lang<>'en') under
    hashed-unigram bag models of the target (lang='en') vs raw corpus.
    Log-probability ratios are quantized to integer micro-nats
    (floor(1e6·Δln), add-one smoothing over 1024 buckets), so each
    doc's score is an INTEGER sum — order-independent and bit-exact in
    SQL. Dataflow: one vocab-bounded combiner pass for both sides'
    bucket counts, one broadcast of the 1024-int ratio table, one
    streaming scoring pass with per-block top-50 + driver merge."""
    from jerex_ray.ops.select import dsir_scores
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text", "lang"])
    return dsir_scores(ds, buckets=1024, top_k=50)

def _coverage_oracle_sql(k: int = 8, buckets: int = 4096) -> str:
    """Generated chained-CTE replay of the greedy max-coverage scan:
    stage s{r} re-derives round r's argmax (count of not-yet-covered
    buckets, ties to smallest doc_id), c{r} accumulates the covered
    set — the same integer recurrence the engine runs."""
    head = """t AS (
        SELECT doc_id, list_filter(regexp_split_to_array(lower(text),
            '\\s+'), x -> x <> '') AS ws FROM documents),
    g AS (
        SELECT DISTINCT doc_id,
               CAST(CAST('0x' || substr(md5('cov|' || g), 1, 16)
                    AS UBIGINT) %% %d AS BIGINT) AS b
        FROM (SELECT doc_id,
                     unnest([array_to_string(ws[i:i+2], ' ')
                             for i in range(1, len(ws) - 1)]) AS g
              FROM t WHERE len(ws) >= 3)),
    c0 AS (SELECT CAST(NULL AS BIGINT) AS b WHERE FALSE)""" % buckets
    parts = [head]
    for r in range(1, k + 1):
        parts.append(f"""s{r} AS (
            SELECT doc_id, count(*) AS gain FROM g
            WHERE b NOT IN (SELECT b FROM c{r - 1})
            GROUP BY doc_id ORDER BY gain DESC, doc_id LIMIT 1),
        c{r} AS (SELECT b FROM c{r - 1}
                 UNION SELECT g.b FROM g JOIN s{r} USING (doc_id))""")
    sel = "\nUNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS sel_rank, doc_id,"
        f" CAST(gain AS BIGINT) AS gain,"
        f" (SELECT count(*) FROM c{r}) AS covered_total FROM s{r}"
        for r in range(1, k + 1))
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT * FROM ({sel}) ORDER BY sel_rank")

def doc_vocab_coverage(sf_dir: str):
    """Species-richness and coverage estimators over the corpus
    vocabulary: Chao1 richness (Chao '84, bias-corrected form
    S + f1·(f1−1)/(2·(f2+1)) — defined even with no doubletons) and
    Good-Turing unseen-mass estimate f1/N (Good '53) — the 'how much
    vocabulary haven't we crawled yet' audit for corpus growth.
    f1/f2 are singleton/doubleton counts from ONE distributed
    word-count combiner pass; everything after is exact integer
    arithmetic plus two final divides (identical expressions on both
    engines)."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["text"])

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        words = batch["text"].fillna("").str.lower().str.split()
        lens = words.str.len().fillna(0).to_numpy(dtype=np.int64)
        if lens.sum() == 0:
            return pd.DataFrame({"w": pd.Series(dtype="object"),
                                 "c": pd.Series(dtype="int64")})
        flat = np.concatenate([w for w in words.to_numpy() if w])
        u, c = np.unique(flat, return_counts=True)
        return pd.DataFrame({"w": u, "c": c.astype(np.int64)})

    wc = grouped_aggregate(
        ds.map_batches(explode, batch_format="pandas",
                       batch_size=4096),
        ["w"], {"n": ("c", "sum")}).to_pandas()
    n = wc["n"].to_numpy(np.int64)
    N = int(n.sum())
    S = int(len(n))
    f1 = int((n == 1).sum())
    f2 = int((n == 2).sum())
    return pd.DataFrame({
        "n_tokens": np.array([N], dtype=np.int64),
        "vocab": np.array([S], dtype=np.int64),
        "f1": np.array([f1], dtype=np.int64),
        "f2": np.array([f2], dtype=np.int64),
        "chao1": [round(S + f1 * (f1 - 1) / (2.0 * (f2 + 1)), 6)],
        "gt_unseen_mass": [round(f1 / (N * 1.0), 6)]})

_VOCAB_COVERAGE_ORACLE_SQL = """
    WITH w AS (
        SELECT unnest(list_filter(
            regexp_split_to_array(lower(coalesce(text, '')), '\\s+'),
            x -> x <> '')) AS word
        FROM documents),
    c AS (SELECT word, count(*) AS n FROM w GROUP BY word),
    s AS (SELECT CAST(sum(n) AS BIGINT) AS n_tokens,
                 CAST(count(*) AS BIGINT) AS vocab,
                 CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS f1,
                 CAST(sum(CASE WHEN n = 2 THEN 1 ELSE 0 END)
                      AS BIGINT) AS f2
          FROM c)
    SELECT n_tokens, vocab, f1, f2,
           round(vocab + f1 * (f1 - 1) / (2.0 * (f2 + 1)), 6)
               AS chao1,
           round(f1 / (n_tokens * 1.0), 6) AS gt_unseen_mass
    FROM s"""

def doc_budget_knapsack(sf_dir: str, *, n_items: int = 12):
    """0/1-knapsack value function (Bellman '57 DP) for
    budget-constrained corpus selection: over the ``n_items``
    longest documents (n_tokens DESC, doc_id ASC — strict order),
    maximize total DISTINCT-WORD count (the diversity payoff) under
    a token budget B = ⌊Σ weights / 2⌋. Everything is exact integer
    arithmetic; the result is the full value function (budget,
    best_value) for budget 0..B — the selection frontier a curator
    reads the knee from, with no backtrack-ambiguity surface.

    Scale shape: per-doc (tokens, distinct words) come from the
    vectorized per-doc stats pass; the item list is a per-block
    top-k reduced on the driver (k-bounded), and the
    items × budget DP runs driver-side on that metadata-sized
    table — the V-optimal/Viterbi convention. The generated oracle
    replays the DP with one CTE per item."""
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.split()
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(),
            "w": toks.str.len().fillna(0).astype(np.int64),
            "v": np.array([len(set(x.lower() for x in t))
                           for t in toks], dtype=np.int64)})

    def block_top(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["w", "doc_id"],
                              ascending=[False, True],
                              kind="mergesort").head(n_items)

    per_block = ds.map_batches(stats, batch_format="pandas",
                               batch_size=8192) \
        .map_batches(block_top, batch_format="pandas").to_pandas()
    items = per_block.sort_values(["w", "doc_id"],
                                  ascending=[False, True],
                                  kind="mergesort").head(n_items)
    ws = items["w"].to_numpy(np.int64)
    vs = items["v"].to_numpy(np.int64)
    B = int(ws.sum()) // 2
    best = np.zeros(B + 1, dtype=np.int64)
    for wi, vi in zip(ws, vs):
        if wi <= B:
            upd = best[:B + 1 - wi] + vi
            best[wi:] = np.maximum(best[wi:], upd)
    return pd.DataFrame({
        "budget": np.arange(B + 1, dtype=np.int64),
        "best_value": best})

def _knapsack_oracle_sql(n_items: int = 12) -> str:
    """Per-item DP replay of ``doc_budget_knapsack``: the strict
    (n_tokens DESC, doc_id ASC) item ranking, B = Σw // 2, a budget
    spine CTE, then one max(skip, take) CTE per item."""
    val = ("array_length(list_distinct(list_filter("
           "regexp_split_to_array(lower(coalesce(text, '')), "
           "'\\s+'), x -> x <> '')))")
    sql = f"""
        WITH it AS MATERIALIZED (
            SELECT doc_id, {_N_TOKENS_SQL} AS w, {val} AS v,
                   row_number() OVER (
                       ORDER BY {_N_TOKENS_SQL} DESC, doc_id ASC)
                       AS rk
            FROM documents QUALIFY rk <= {n_items}),
        bmax AS (SELECT CAST(sum(w) // 2 AS BIGINT) AS b FROM it),
        caps AS (SELECT unnest(range(0, b + 1)) AS cap FROM bmax),
        k0 AS (SELECT cap, CAST(0 AS BIGINT) AS best FROM caps)"""
    for i in range(1, n_items + 1):
        sql += f""",
        k{i} AS MATERIALIZED (
            SELECT p.cap, greatest(p.best,
                       coalesce(t.best + (SELECT v FROM it
                                          WHERE rk = {i}), 0))
                       AS best
            FROM k{i - 1} p
            LEFT JOIN k{i - 1} t
                 ON t.cap = p.cap - (SELECT w FROM it WHERE rk = {i}))"""
    return sql + f"""
        SELECT cap AS budget, best AS best_value
        FROM k{n_items} ORDER BY budget"""

def doc_heaps_law(sf_dir: str, *, checkpoints: int = 10):
    """Heaps'-law vocabulary growth fit V = K·N^β (Heaps '78 — the
    growth-curve companion of the Chao1/Good-Turing coverage audit
    and the Zipf slope): at ``checkpoints`` equal doc-id range cuts,
    the cumulative token count N and cumulative vocabulary V, plus
    the log-log OLS slope β and intercept ln K over those points.
    The prefix trick keeps it ONE-pass distributed: V(t) = #words
    whose MIN doc_id ≤ t (a word-min combiner), N(t) = Σ tokens of
    docs with doc_id ≤ t (a per-doc-stats combiner) — no sequential
    corpus scan anywhere. The checkpoint table is exact integers;
    the 10-point OLS runs in the identical expression order on both
    engines (glibc ln), rounded to 6 dp."""
    import math

    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        words = batch["text"].fillna("").str.lower().str.split()
        lens = words.str.len().fillna(0).to_numpy(dtype=np.int64)
        ids = batch["doc_id"].to_numpy(np.int64)
        if lens.sum() == 0:
            return pd.DataFrame({"w": pd.Series(dtype="object"),
                                 "d": pd.Series(dtype="int64")})
        flat = np.concatenate([w for w in words.to_numpy() if w])
        docs = np.repeat(ids, lens)
        g = pd.DataFrame({"w": flat, "d": docs}) \
            .groupby("w", sort=False)["d"].min().reset_index()
        return g

    wmin = grouped_aggregate(
        ds.map_batches(explode, batch_format="pandas",
                       batch_size=4096),
        ["w"], {"d": ("d", "min")})

    # doc-id bounds: one metadata-sized combiner pass
    bounds = ds.map_batches(
        lambda df: pd.DataFrame({"lo": [df["doc_id"].min()],
                                 "hi": [df["doc_id"].max()]}),
        batch_format="pandas").to_pandas()
    lo, hi = int(bounds["lo"].min()), int(bounds["hi"].max())
    ths = np.array([lo + (hi - lo + 1) * i // checkpoints - 1
                    for i in range(1, checkpoints + 1)],
                   dtype=np.int64)

    # bucket histograms: neither the vocabulary nor the per-doc
    # table ever reaches the driver — only #checkpoint rows do
    def word_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "d" not in df.columns:
            return pd.DataFrame({"bkt": pd.Series(dtype="int64"),
                                 "v": pd.Series(dtype="int64")})
        b = np.searchsorted(ths, df["d"].to_numpy(np.int64),
                            side="left")
        u, c = np.unique(b, return_counts=True)
        return pd.DataFrame({"bkt": u.astype(np.int64),
                             "v": c.astype(np.int64)})

    vh = grouped_aggregate(
        wmin.map_batches(word_bucket, batch_format="pandas"),
        ["bkt"], {"v": ("v", "sum")},
        result_hint="small").to_pandas()

    def tok_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        words = batch["text"].fillna("").str.split()
        n = words.str.len().fillna(0).to_numpy(np.int64)
        b = np.searchsorted(ths, batch["doc_id"].to_numpy(np.int64),
                            side="left")
        g = pd.DataFrame({"bkt": b, "n": n}) \
            .groupby("bkt", sort=False)["n"].sum().reset_index()
        return g.astype({"bkt": "int64", "n": "int64"})

    nh = grouped_aggregate(
        ds.map_batches(tok_bucket, batch_format="pandas",
                       batch_size=8192),
        ["bkt"], {"n": ("n", "sum")},
        result_hint="small").to_pandas()
    vcum = np.zeros(checkpoints, dtype=np.int64)
    ncum = np.zeros(checkpoints, dtype=np.int64)
    vcum[vh["bkt"].to_numpy(np.int64)] = vh["v"].to_numpy(np.int64)
    ncum[nh["bkt"].to_numpy(np.int64)] = nh["n"].to_numpy(np.int64)
    vcum, ncum = np.cumsum(vcum), np.cumsum(ncum)
    rows = [(np.int64(i + 1), np.int64(ths[i]), np.int64(ncum[i]),
             np.int64(vcum[i])) for i in range(checkpoints)]
    pts = [(math.log(float(N)), math.log(float(V)))
           for _, _, N, V in rows]
    n = float(len(pts))
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxx = sum(p[0] * p[0] for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    lnk = (sy - beta * sx) / n
    out = pd.DataFrame(rows, columns=["checkpoint", "max_doc_id",
                                      "n_tokens", "vocab"])
    out["beta"] = _round_half_away(beta, 6)
    out["ln_k"] = _round_half_away(lnk, 6)
    return out

_HEAPS_ORACLE_SQL = """
    WITH w AS (
        SELECT doc_id, unnest(list_filter(
            regexp_split_to_array(lower(coalesce(text, '')), '\\s+'),
            x -> x <> '')) AS word
        FROM documents),
    wmin AS MATERIALIZED (
        SELECT word, min(doc_id) AS d FROM w GROUP BY word),
    dt AS MATERIALIZED (
        SELECT doc_id, count(*) AS n FROM w GROUP BY doc_id),
    b AS (SELECT min(doc_id) AS lo, max(doc_id) AS hi
          FROM documents),
    th AS (SELECT i, lo + ((hi - lo + 1) * i) // 10 - 1 AS t
           FROM b, (SELECT unnest(range(1, 11)) AS i)),
    cp AS MATERIALIZED (
        SELECT th.i AS checkpoint, th.t AS max_doc_id,
               (SELECT CAST(coalesce(sum(n), 0) AS BIGINT)
                FROM dt WHERE doc_id <= th.t) AS n_tokens,
               (SELECT CAST(count(*) AS BIGINT)
                FROM wmin WHERE d <= th.t) AS vocab
        FROM th),
    s AS (SELECT count(*) * 1.0 AS n,
                 sum(ln(n_tokens * 1.0)) AS sx,
                 sum(ln(vocab * 1.0)) AS sy,
                 sum(ln(n_tokens * 1.0) * ln(n_tokens * 1.0)) AS sxx,
                 sum(ln(n_tokens * 1.0) * ln(vocab * 1.0)) AS sxy
          FROM cp),
    f AS (SELECT (n * sxy - sx * sy) / (n * sxx - sx * sx) AS beta,
                 sx, sy, n FROM s)
    SELECT cp.checkpoint, cp.max_doc_id, cp.n_tokens, cp.vocab,
           round(f.beta, 6) AS beta,
           round((f.sy - f.beta * f.sx) / f.n, 6) AS ln_k
    FROM cp CROSS JOIN f ORDER BY cp.checkpoint"""

def _cdc_chunks(text: str, k: int, divisor: int,
                hash_batch) -> list[str]:
    """Content-defined chunk strings of ``text``: a cut after char
    i+k−1 wherever md5_64(text[i:i+k]) % divisor == 0 (gram hashes
    md5-derived — the ``winnowing_md5`` SQL-replay convention), plus
    the forced tail cut. Chunk boundaries move with content, not
    offsets, so insertions only reshape neighboring chunks — the
    LBFS property."""
    t = text.lower()
    n = len(t) - k + 1
    if n < 1:
        return [t] if t else []
    grams = [t[i:i + k] for i in range(n)]
    h = hash_batch(grams) % np.uint64(divisor)
    cuts = (np.flatnonzero(h == 0) + k).tolist()
    if not cuts or cuts[-1] != len(t):
        cuts.append(len(t))
    out, prev = [], 0
    for c in cuts:
        if c > prev:
            out.append(t[prev:c])
            prev = c
    return out

def doc_cdc_chunks(sf_dir: str, *, k: int = 8, divisor: int = 64):
    """Content-defined chunking audit (LBFS, Muthitacharoen et al.
    '01 — the Rabin-cut storage-dedup primitive beside the
    winnowing fingerprints): per document, the chunk count and how
    many of its DISTINCT chunk hashes are shared with at least one
    other document (the dedup win a content-addressed store would
    realize). Cuts derive from md5 char-``k``-gram hashes
    (% ``divisor`` == 0), so the SQL oracle replays every boundary
    and chunk hash bit-for-bit.

    Scale shape: pass 1 emits distinct (doc, chunk-hash) rows and
    reduces them through the combiner to per-hash doc counts; only
    hashes with ≥2 docs (bounded by the cross-doc duplicate volume,
    the MinHash-family broadcast contract) reach the driver and
    broadcast; pass 2 recomputes each doc's chunks and counts
    membership — no corpus-sized join, no chunk text ever
    shuffled."""
    import ray

    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    from jerex_ray.util import md5_hash64_batch
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def hash_rows(batch: pd.DataFrame) -> pd.DataFrame:
        ids, hs = [], []
        for did, txt in zip(batch["doc_id"], batch["text"].fillna("")):
            ch = _cdc_chunks(txt, k, divisor, md5_hash64_batch)
            if not ch:
                continue
            hh = np.unique((md5_hash64_batch(ch)
                            % np.uint64(1 << 63)).astype(np.int64))
            ids.extend([int(did)] * len(hh))
            hs.extend(int(v) for v in hh)
        return pd.DataFrame({"doc_id": np.array(ids, dtype=np.int64),
                             "chash": np.array(hs, dtype=np.int64)})

    counts = grouped_aggregate(
        ds.map_batches(hash_rows, batch_format="pandas",
                       batch_size=1024),
        ["chash"], {"n_docs": (None, "count")})
    shared_df = counts.map_batches(
        lambda df: df[df["n_docs"] >= 2][["chash"]]
        if "chash" in df.columns else df,
        batch_format="pandas").to_pandas()
    shared = set(int(v) for v in shared_df["chash"]) \
        if "chash" in shared_df.columns else set()
    sref = ray.put(shared)

    def per_doc(batch: pd.DataFrame) -> pd.DataFrame:
        sh = ray.get(sref)
        rows = []
        for did, txt in zip(batch["doc_id"], batch["text"].fillna("")):
            ch = _cdc_chunks(txt, k, divisor, md5_hash64_batch)
            hh = set(int(v) for v in (md5_hash64_batch(ch)
                                      % np.uint64(1 << 63))) \
                if ch else set()
            rows.append((int(did), len(txt), len(ch), len(hh),
                         sum(1 for v in hh if v in sh)))
        return pd.DataFrame(rows, columns=[
            "doc_id", "n_chars", "n_chunks", "uniq_chunks",
            "shared_chunks"]).astype("int64")

    out = ds.map_batches(per_doc, batch_format="pandas",
                         batch_size=1024).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)

def _cdc_oracle_sql(k: int = 8, divisor: int = 64) -> str:
    return f"""
        WITH d AS MATERIALIZED (
            SELECT doc_id, lower(coalesce(text, '')) AS t
            FROM documents),
        g AS MATERIALIZED (
            SELECT d.doc_id, p.i,
                   CAST('0x' || substr(md5(substr(d.t, p.i, {k})),
                        1, 16) AS UBIGINT) % {divisor} AS hmod
            FROM d, LATERAL (SELECT unnest(range(1,
                greatest(length(d.t) - {k} + 1, 0) + 1)) AS i) p),
        cuts AS MATERIALIZED (
            SELECT doc_id, i + {k} - 1 AS c FROM g WHERE hmod = 0
            UNION
            SELECT doc_id, length(t) FROM d WHERE length(t) > 0),
        ch AS MATERIALIZED (
            SELECT doc_id, substr((SELECT t FROM d
                                   WHERE d.doc_id = cuts.doc_id),
                       coalesce(lag(c) OVER (PARTITION BY doc_id
                                             ORDER BY c), 0) + 1,
                       c - coalesce(lag(c) OVER (PARTITION BY doc_id
                                                 ORDER BY c), 0))
                       AS chunk
            FROM cuts),
        chh AS MATERIALIZED (
            SELECT DISTINCT doc_id,
                   CAST(CAST('0x' || substr(md5(chunk), 1, 16)
                        AS UBIGINT) % 9223372036854775808
                        AS BIGINT) AS chash
            FROM ch WHERE chunk <> ''),
        nd AS (SELECT chash, count(*) AS n_docs
               FROM chh GROUP BY chash),
        stats AS (
            SELECT d.doc_id, length(d.t) AS n_chars,
                   (SELECT count(*) FROM ch
                    WHERE ch.doc_id = d.doc_id
                      AND ch.chunk <> '') AS n_chunks,
                   (SELECT count(*) FROM chh
                    WHERE chh.doc_id = d.doc_id) AS uniq_chunks,
                   (SELECT count(*) FROM chh JOIN nd USING (chash)
                    WHERE chh.doc_id = d.doc_id
                      AND nd.n_docs >= 2) AS shared_chunks
            FROM d)
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               CAST(n_chars AS BIGINT) AS n_chars,
               CAST(n_chunks AS BIGINT) AS n_chunks,
               CAST(uniq_chunks AS BIGINT) AS uniq_chunks,
               CAST(shared_chunks AS BIGINT) AS shared_chunks
        FROM stats ORDER BY doc_id"""

_RICE_ORACLE_SQL = """
    WITH tok AS (
        SELECT DISTINCT doc_id,
               unnest(list_filter(
                   regexp_split_to_array(lower(text), '\\s+'),
                   x -> x <> '')) AS term
        FROM documents),
    g AS (
        SELECT term, doc_id,
               doc_id - lag(doc_id) OVER (
                   PARTITION BY term ORDER BY doc_id) AS gap
        FROM tok),
    b AS (SELECT term, coalesce(gap, doc_id) AS gp FROM g),
    ks AS (SELECT unnest(range(0, 8)) AS k),
    tot AS (
        SELECT k, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(gp >> k) + count(*) * (1 + k) AS BIGINT)
                   AS total_bits
        FROM b CROSS JOIN ks GROUP BY k),
    best AS (SELECT k AS bk FROM tot
             ORDER BY total_bits, k LIMIT 1)
    SELECT CAST(k AS BIGINT) AS k, n, total_bits,
           CAST(CASE WHEN k = (SELECT bk FROM best) THEN 1 ELSE 0
                END AS BIGINT) AS k_star
    FROM tot ORDER BY k"""

def _ppr_oracle_sql(iters: int = 5, damping: float = 0.85) -> str:
    """Chained-CTE replay of ``doc_ppr``: same edge CTE and power
    iteration as the PageRank oracle, but teleport mass sits entirely
    on the min-id seed and a per-round LEFT JOIN against the node
    table keeps zero-rank nodes in play."""
    sql = f"""
        WITH edges AS ({_EXACT_JACCARD_EDGES_SQL}),
        dir AS (SELECT doc_a AS u, doc_b AS v FROM edges
                UNION ALL SELECT doc_b, doc_a FROM edges),
        deg AS (SELECT u, CAST(count(*) AS DOUBLE) AS dg
                FROM dir GROUP BY u),
        nodes AS (SELECT u AS node FROM deg),
        seed AS (SELECT min(node) AS s FROM nodes),
        r0 AS (SELECT node,
                      CASE WHEN node = (SELECT s FROM seed)
                           THEN 1.0 ELSE 0.0 END AS pr
               FROM nodes)"""
    prev = "r0"
    for k in range(1, iters + 1):
        sql += f""",
        r{k} AS (SELECT nodes.node,
                        (CASE WHEN nodes.node = (SELECT s FROM seed)
                              THEN {1.0 - damping!r} ELSE 0.0 END)
                        + {damping!r} * coalesce(c.s, 0.0) AS pr
                 FROM nodes LEFT JOIN (
                     SELECT dir.v AS node,
                            sum({prev}.pr / deg.dg) AS s
                     FROM dir JOIN {prev} ON {prev}.node = dir.u
                              JOIN deg ON deg.u = dir.u
                     GROUP BY dir.v) c ON c.node = nodes.node)"""
        prev = f"r{k}"
    sql += f"""
        SELECT node AS doc_id, round(pr, 6) AS pr
        FROM {prev} ORDER BY doc_id"""
    return sql

QUERIES = {
    'doc_sorted_neighborhood': doc_sorted_neighborhood,
    'doc_nb_model': doc_nb_model,
    'doc_nb_predict': doc_nb_predict,
    'doc_hapax': doc_hapax,
    'doc_zipf_slope': doc_zipf_slope,
    'doc_sentence_stats': doc_sentence_stats,
    'doc_simpson_diversity': doc_simpson_diversity,
    'doc_readability': doc_readability,
    'doc_rake_keywords': doc_rake_keywords,
    'doc_ttr': doc_ttr,
    'doc_pair_similarity': doc_pair_similarity,
    'doc_compression_ratio': doc_compression_ratio,
    'doc_postings_size': doc_postings_size,
    'doc_rice_param': doc_rice_param,
    'doc_select_coverage': doc_select_coverage,
    'doc_dsir_select': doc_dsir_select,
    'doc_vocab_coverage': doc_vocab_coverage,
    'doc_budget_knapsack': doc_budget_knapsack,
    'doc_heaps_law': doc_heaps_law,
    'doc_cdc_chunks': doc_cdc_chunks,
    'doc_feature_hash': doc_feature_hash,
    'doc_ppr': doc_ppr,
    'doc_kn_logppl': doc_kn_logppl,
    'doc_dirichlet_ql': doc_dirichlet_ql,
    'doc_front_coding': doc_front_coding,
    'doc_bigram_logppl': doc_bigram_logppl,
    'doc_logreg_grad2': doc_logreg_grad2,
    'doc_quality_logreg': doc_quality_logreg,
    'doc_bpe_pair_counts': doc_bpe_pair_counts,
    'doc_bpe_merges': doc_bpe_merges,
    'doc_bpe_tokens': doc_bpe_tokens,
}

ORACLES = {
    'doc_sorted_neighborhood': """
            WITH r AS (
                SELECT doc_id,
                       row_number() OVER (
                           ORDER BY substr(lower(coalesce(text, '')),
                                           1, 24), doc_id) - 1 AS rnk
                FROM documents)
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   b.rnk - a.rnk AS rank_gap
            FROM r a JOIN r b
              ON b.rnk > a.rnk AND b.rnk <= a.rnk + 3
            ORDER BY doc_a, doc_b
        """,
    'doc_nb_model': """
            WITH w AS (
                SELECT lang, unnest(list_filter(
                    regexp_split_to_array(lower(coalesce(text, '')),
                                          '\\s+'),
                    x -> x <> '')) AS word
                FROM documents),
            c AS (SELECT lang, word, count(*) AS n
                  FROM w GROUP BY lang, word),
            v AS (SELECT count(DISTINCT word) AS vocab FROM c),
            tok AS (SELECT lang, sum(n) AS tok FROM c GROUP BY lang),
            d AS (SELECT lang, count(*) AS docs
                  FROM documents GROUP BY lang),
            tot AS (SELECT sum(docs) AS total FROM d),
            ranked AS (
                SELECT lang, word, n, row_number() OVER (
                    PARTITION BY lang ORDER BY n DESC, word) AS rk
                FROM c)
            SELECT r.lang, r.word, r.n,
                   round(ln(r.n + 1.0)
                         - ln(t.tok + (SELECT vocab FROM v)), 6)
                       AS loglik,
                   round(ln(CAST(d.docs AS DOUBLE))
                         - ln((SELECT total FROM tot)), 6) AS logprior
            FROM ranked r
            JOIN tok t ON t.lang = r.lang
            JOIN d ON d.lang = r.lang
            WHERE r.rk <= 20
            ORDER BY r.lang, r.n DESC, r.word
        """,
    'doc_pair_similarity': """
            WITH words AS (
                SELECT doc_id, list_filter(
                    regexp_split_to_array(lower(text), '\\s+'),
                    x -> x <> '') AS ws
                FROM documents),
            tok AS (
                SELECT doc_id, len(ws) AS dlen, unnest(ws) AS term
                FROM words),
            tf AS (
                SELECT doc_id, term, dlen, count(*) AS cnt
                FROM tok GROUP BY doc_id, term, dlen),
            dfreq AS (
                SELECT term, count(*) AS df FROM tf GROUP BY term),
            nd AS (SELECT count(*) AS n FROM documents),
            w AS (
                SELECT tf.doc_id, tf.term, dfreq.df,
                       (CAST(cnt AS DOUBLE) / dlen)
                       * (ln((1.0 + (SELECT n FROM nd)) / (1.0 + df))
                          + 1.0) AS w
                FROM tf JOIN dfreq USING (term)
                WHERE dfreq.df <= CAST(floor(
                    0.9 * (SELECT n FROM nd)) AS BIGINT)),
            nrm AS (
                SELECT doc_id, sqrt(sum(w * w)) AS nm
                FROM w GROUP BY doc_id),
            p AS (
                SELECT w.doc_id, w.term, w.w / nrm.nm AS wn
                FROM w JOIN nrm USING (doc_id)
                WHERE w.df >= 2),
            pair AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                       round(sum(a.wn * b.wn), 6) AS cosine
                FROM p a JOIN p b
                     ON a.term = b.term AND a.doc_id < b.doc_id
                GROUP BY a.doc_id, b.doc_id)
            SELECT doc_a, doc_b, cosine FROM pair
            WHERE cosine >= 0.8
            ORDER BY doc_a, doc_b
        """,
    'doc_ttr': """
            WITH w AS (
                SELECT doc_id, unnest(list_filter(
                    regexp_split_to_array(lower(coalesce(text, '')),
                                          '\\s+'),
                    x -> x <> '')) AS word
                FROM documents)
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                   CAST(count(DISTINCT word) AS BIGINT) AS n_types,
                   round(count(DISTINCT word)
                         / CAST(count(*) AS DOUBLE), 6) AS ttr
            FROM w GROUP BY doc_id ORDER BY doc_id
        """,
    'doc_rake_keywords': """
            WITH d AS (
                SELECT doc_id, source,
                       regexp_split_to_array(lower(coalesce(text,
                                                            '')),
                                             '[.!?]+') AS sents
                FROM documents),
            s AS (
                SELECT doc_id, source, i AS sent_id,
                       list_filter(regexp_split_to_array(sents[i],
                                                         '\\s+'),
                                   x -> x <> '') AS ws
                FROM d, LATERAL (SELECT unnest(range(1,
                    len(sents) + 1)) AS i) t),
            w AS (
                SELECT doc_id, source, sent_id, j AS pos,
                       ws[j] AS word,
                       CASE WHEN ws[j] IN ('the', 'and', 'of', 'to',
                           'a', 'in', 'is', 'it', 'for', 'on',
                           'with', 'as', 'at', 'by', 'an')
                           THEN 1 ELSE 0 END AS stop
                FROM s, LATERAL (SELECT unnest(range(1,
                    len(ws) + 1)) AS j) u),
            isl AS (
                SELECT *, sum(stop) OVER (PARTITION BY doc_id,
                    sent_id ORDER BY pos) AS grp
                FROM w),
            ph AS (
                SELECT doc_id, source, sent_id, grp,
                       string_agg(word, ' ' ORDER BY pos) AS phrase,
                       count(*) AS plen
                FROM isl WHERE stop = 0
                GROUP BY doc_id, source, sent_id, grp),
            pw AS (
                SELECT i.source, i.word, i.doc_id, i.sent_id, i.grp,
                       p.plen
                FROM isl i JOIN ph p
                  ON p.doc_id = i.doc_id AND p.sent_id = i.sent_id
                 AND p.grp = i.grp
                WHERE i.stop = 0),
            stats AS (
                SELECT source, word, count(*) AS freq,
                       sum(plen) AS deg
                FROM pw GROUP BY source, word),
            inst AS (
                SELECT pw.source, pw.doc_id, pw.sent_id, pw.grp,
                       round(sum(CAST(st.deg AS DOUBLE) / st.freq),
                             6) AS score
                FROM pw JOIN stats st
                  ON st.source = pw.source AND st.word = pw.word
                GROUP BY pw.source, pw.doc_id, pw.sent_id, pw.grp),
            agg AS (
                SELECT i.source, p.phrase, count(*) AS n,
                       max(i.score) AS score
                FROM inst i JOIN ph p
                  ON p.doc_id = i.doc_id AND p.sent_id = i.sent_id
                 AND p.grp = i.grp AND p.source = i.source
                GROUP BY i.source, p.phrase),
            r AS (
                SELECT source, phrase, n, score,
                       row_number() OVER (PARTITION BY source
                           ORDER BY score DESC, phrase) AS rk
                FROM agg)
            SELECT source, phrase, CAST(n AS BIGINT) AS n, score
            FROM r WHERE rk <= 10
            ORDER BY source, score DESC, phrase
        """,
    'doc_readability': """
            WITH s AS (
                SELECT doc_id,
                       len(regexp_extract_all(coalesce(text, ''),
                                              '\\S+'))
                           AS n_words,
                       len(regexp_extract_all(lower(coalesce(text,
                                                             '')),
                                              '[aeiouy]+'))
                           AS n_syllables,
                       len(list_filter(
                           regexp_split_to_array(coalesce(text, ''),
                                                 '[.!?]+'),
                           x -> len(list_filter(
                               regexp_split_to_array(x, '\\s+'),
                               y -> y <> '')) > 0)) AS n_sentences
                FROM documents)
            SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
                   CAST(n_syllables AS BIGINT) AS n_syllables,
                   CAST(n_sentences AS BIGINT) AS n_sentences,
                   round(206.835
                         - 1.015 * (CAST(n_words AS DOUBLE)
                                    / n_sentences)
                         - 84.6 * (CAST(n_syllables AS DOUBLE)
                                   / n_words), 6) AS flesch
            FROM s WHERE n_words > 0 AND n_sentences > 0
            ORDER BY doc_id
        """,
    'doc_simpson_diversity': """
            WITH w AS (
                SELECT source, unnest(list_filter(
                    regexp_split_to_array(lower(coalesce(text, '')),
                                          '\\s+'),
                    x -> x <> '')) AS word
                FROM documents),
            c AS (SELECT source, word, count(*) AS n
                  FROM w GROUP BY source, word)
            SELECT source, CAST(sum(n) AS BIGINT) AS n_tokens,
                   round(1.0 - sum(CAST(n AS DOUBLE) * n)
                         / (CAST(sum(n) AS DOUBLE) * sum(n)), 6)
                       AS simpson
            FROM c GROUP BY source ORDER BY source
        """,
    'doc_sentence_stats': """
            WITH s AS (
                SELECT doc_id, unnest(regexp_split_to_array(
                    coalesce(text, ''), '[.!?]+')) AS sent
                FROM documents),
            w AS (
                SELECT doc_id, len(list_filter(
                    regexp_split_to_array(sent, '\\s+'),
                    x -> x <> '')) AS words
                FROM s),
            k AS (SELECT doc_id, words FROM w WHERE words > 0),
            agg AS (
                SELECT doc_id, count(*) AS n_sentences,
                       round(sum(CAST(words AS DOUBLE)) / count(*), 6)
                           AS mean_words,
                       max(words) AS max_words
                FROM k GROUP BY doc_id)
            SELECT d.doc_id,
                   CAST(coalesce(a.n_sentences, 0) AS BIGINT)
                       AS n_sentences,
                   coalesce(a.mean_words, 0.0) AS mean_words,
                   CAST(coalesce(a.max_words, 0) AS BIGINT)
                       AS max_words
            FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
            ORDER BY d.doc_id
        """,
    'doc_hapax': """
            WITH w AS (
                SELECT source, unnest(list_filter(
                    regexp_split_to_array(lower(coalesce(text, '')),
                                          '\\s+'),
                    x -> x <> '')) AS word
                FROM documents),
            c AS (SELECT source, word, count(*) AS n
                  FROM w GROUP BY source, word)
            SELECT source, CAST(count(*) AS BIGINT) AS vocab,
                   CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS hapax,
                   round(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)
                         / CAST(count(*) AS DOUBLE), 6)
                       AS hapax_ratio
            FROM c GROUP BY source ORDER BY source
        """,
    'doc_zipf_slope': """
            WITH w AS (
                SELECT source, unnest(list_filter(
                    regexp_split_to_array(lower(coalesce(text, '')),
                                          '\\s+'),
                    x -> x <> '')) AS word
                FROM documents),
            c AS (SELECT source, word, count(*) AS n
                  FROM w GROUP BY source, word),
            r AS (SELECT source, n, row_number() OVER (
                      PARTITION BY source
                      ORDER BY n DESC, word) AS rk
                  FROM c)
            SELECT source, CAST(count(*) AS BIGINT) AS n_terms,
                   round(regr_slope(ln(CAST(n AS DOUBLE)),
                                    ln(CAST(rk AS DOUBLE))), 6)
                       AS slope,
                   round(regr_intercept(ln(CAST(n AS DOUBLE)),
                                        ln(CAST(rk AS DOUBLE))), 6)
                       AS intercept
            FROM r WHERE rk <= 1000 GROUP BY source ORDER BY source
        """,
    'doc_nb_predict': """
            WITH wl AS (
                SELECT doc_id, lang, unnest(list_filter(
                    regexp_split_to_array(lower(coalesce(text, '')),
                                          '\\s+'),
                    x -> x <> '')) AS word
                FROM documents),
            wc AS (SELECT doc_id, word, count(*) AS cnt
                   FROM wl GROUP BY doc_id, word),
            c AS (SELECT lang, word, count(*) AS n
                  FROM wl GROUP BY lang, word),
            v AS (SELECT count(DISTINCT word) AS vocab FROM c),
            tok AS (SELECT lang, sum(n) AS tok FROM c GROUP BY lang),
            d AS (SELECT lang, count(*) AS docs
                  FROM documents GROUP BY lang),
            tot AS (SELECT sum(docs) AS total FROM d),
            ws AS (
                SELECT wc.doc_id, t.lang,
                       sum(wc.cnt * (ln(coalesce(c.n, 0) + 1.0)
                           - ln(t.tok + (SELECT vocab FROM v)))) AS s
                FROM wc CROSS JOIN tok t
                LEFT JOIN c ON c.lang = t.lang AND c.word = wc.word
                GROUP BY wc.doc_id, t.lang),
            sc AS (
                SELECT doc.doc_id, d.lang,
                       coalesce(ws.s, 0)
                       + ln(CAST(d.docs AS DOUBLE))
                       - ln((SELECT total FROM tot)) AS score
                FROM documents doc CROSS JOIN d
                LEFT JOIN ws ON ws.doc_id = doc.doc_id
                            AND ws.lang = d.lang),
            r AS (SELECT doc_id, lang, score, row_number() OVER (
                      PARTITION BY doc_id
                      ORDER BY score DESC, lang) AS rk
                  FROM sc)
            SELECT doc_id, lang AS pred_lang,
                   round(score, 6) AS score
            FROM r WHERE rk = 1 ORDER BY doc_id
        """,
    'doc_postings_size': """
            WITH tok AS (
                SELECT DISTINCT doc_id,
                       unnest(list_filter(
                           regexp_split_to_array(lower(text), '\\s+'),
                           x -> x <> '')) AS term
                FROM documents),
            g AS (
                SELECT term, doc_id,
                       doc_id - lag(doc_id) OVER (
                           PARTITION BY term ORDER BY doc_id) AS gap
                FROM tok),
            b AS (SELECT term, coalesce(gap, doc_id) AS gp FROM g),
            sz AS (
                SELECT term, count(*) AS df,
                       sum(CASE WHEN gp < 128 THEN 1
                                WHEN gp < 16384 THEN 2
                                WHEN gp < 2097152 THEN 3
                                WHEN gp < 268435456 THEN 4
                                ELSE 5 END) AS vbytes
                FROM b GROUP BY term)
            SELECT term, CAST(df AS BIGINT) AS df,
                   CAST(df * 8 AS BIGINT) AS raw_bytes,
                   CAST(vbytes AS BIGINT) AS varint_bytes,
                   round(CAST(vbytes AS DOUBLE) / (df * 8), 6)
                       AS ratio
            FROM sz ORDER BY term
        """,
    'doc_front_coding': """
            WITH w AS (
                SELECT DISTINCT unnest(list_filter(
                    regexp_split_to_array(lower(text), '\\s+'),
                    x -> x <> '')) AS w
                FROM documents),
            o AS (SELECT w, lag(w) OVER (ORDER BY w) AS pw FROM w),
            l AS (
                SELECT w, CASE WHEN pw IS NULL THEN 0 ELSE
                    coalesce((SELECT max(i) FROM
                        (SELECT unnest(generate_series(1,
                             least(length(w), length(pw)))) AS i)
                        t(i)
                        WHERE substr(w, 1, i) = substr(pw, 1, i)),
                        0) END AS lcp
                FROM o)
            SELECT CAST(count(*) AS BIGINT) AS n_words,
                   CAST(sum(length(w)) AS BIGINT) AS raw_bytes,
                   CAST(sum(length(w) - lcp) AS BIGINT)
                       AS front_bytes
            FROM l
        """,
    'doc_dirichlet_ql': """
            WITH w AS (
                SELECT doc_id, list_filter(
                    regexp_split_to_array(lower(text), '\\s+'),
                    x -> x <> '') AS ws
                FROM documents),
            tok AS (SELECT doc_id, unnest(ws) AS t FROM w),
            tot AS (SELECT CAST(sum(len(ws)) AS BIGINT) AS l FROM w),
            q(qi, t) AS (VALUES
                (0, 'fast'), (0, 'join'), (0, 'spark'),
                (1, 'dup'),
                (2, 'query'), (2, 'sort'), (2, 'stream'),
                (2, 'window')),
            ctf AS (SELECT t, CAST(count(*) AS BIGINT) AS c
                    FROM tok GROUP BY t),
            qq AS (SELECT q.qi, q.t, ctf.c
                   FROM q JOIN ctf ON ctf.t = q.t),
            ctd AS (SELECT tok.doc_id, tok.t,
                           CAST(count(*) AS BIGINT) AS c
                    FROM tok JOIN (SELECT DISTINCT t FROM qq) s
                         ON s.t = tok.t
                    GROUP BY tok.doc_id, tok.t),
            dl AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl
                   FROM w),
            lp AS (
                SELECT d.doc_id, qq.qi,
                       ln((coalesce(ctd.c, 0)
                           + 100.0 * (qq.c / (SELECT l FROM tot)))
                          / (d.dl + 100.0)) AS l
                FROM dl d CROSS JOIN qq
                LEFT JOIN ctd ON ctd.doc_id = d.doc_id
                             AND ctd.t = qq.t)
            SELECT qi AS query_idx, doc_id,
                   round(sum(l), 6) AS score
            FROM lp GROUP BY qi, doc_id ORDER BY query_idx, doc_id
        """,
    'doc_kn_logppl': """
            WITH w AS (
                SELECT doc_id, list_filter(
                    regexp_split_to_array(lower(text), '\\s+'),
                    x -> x <> '') AS ws
                FROM documents),
            pos AS (
                SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
                FROM w, LATERAL (SELECT unnest(range(1, len(ws)))
                                 AS i) t),
            bg AS (SELECT w1, w2, count(*) AS c2 FROM pos
                   GROUP BY w1, w2),
            ctx AS (SELECT w1, count(*) AS c1 FROM pos GROUP BY w1),
            f AS (SELECT w1, count(*) AS n1f FROM bg GROUP BY w1),
            b AS (SELECT w2, count(*) AS n1b FROM bg GROUP BY w2),
            bt AS (SELECT count(*) AS b FROM bg),
            lp AS (
                SELECT p.doc_id,
                       -ln(greatest(bg.c2 - 0.75, 0) / ctx.c1
                           + 0.75 * f.n1f / ctx.c1
                             * (b.n1b / bt.b)) AS l
                FROM pos p
                JOIN bg ON bg.w1 = p.w1 AND bg.w2 = p.w2
                JOIN ctx ON ctx.w1 = p.w1
                JOIN f ON f.w1 = p.w1
                JOIN b ON b.w2 = p.w2
                CROSS JOIN bt),
            per AS (SELECT doc_id, count(*) AS n_bigrams,
                           round(avg(l), 6) AS logppl
                    FROM lp GROUP BY doc_id)
            SELECT d.doc_id,
                   CAST(coalesce(per.n_bigrams, 0) AS BIGINT)
                       AS n_bigrams,
                   coalesce(per.logppl, 0.0) AS logppl
            FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
            ORDER BY d.doc_id
        """,
    'doc_feature_hash': """
            WITH w AS (
                SELECT doc_id,
                       CAST('0x' || substr(md5(unnest(
                           string_split(lower(text), ' '))), 1, 16)
                           AS UBIGINT) AS h
                FROM documents
            ),
            f AS (
                SELECT doc_id,
                       CAST(h % 32 AS BIGINT) AS bucket,
                       sum(CASE WHEN (h >> 8) % 2 = 1
                           THEN 1 ELSE -1 END) AS feat
                FROM w GROUP BY 1, 2
            )
            SELECT doc_id, bucket, CAST(feat AS BIGINT) AS feat
            FROM f WHERE feat <> 0
            ORDER BY doc_id, bucket
        """,
    'doc_logreg_grad2': f"""
            WITH f AS (
                SELECT CAST(length(text) - length(regexp_replace(text,
                           '[^\\w\\s]', '', 'g')) AS DOUBLE)
                           / greatest(length(text), 1) AS x1,
                       CASE WHEN {_N_TOKENS_SQL} > 0 THEN
                           CAST(length(regexp_replace(text, '\\s', '',
                               'g')) AS DOUBLE)
                               / greatest({_N_TOKENS_SQL}, 1)
                       ELSE 0.0 END AS x2,
                       CAST(len(list_filter(
                            list_filter(regexp_split_to_array(text,
                                '\\s+'), x -> x <> ''),
                            x -> lower(x) IN ('the','and','of','to','a',
                                'in','is','it','that','was')))
                            AS DOUBLE) / greatest({_N_TOKENS_SQL}, 1)
                           AS x3,
                       CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
                FROM documents),
            g0 AS (
                SELECT avg(0.5 - y) AS b, avg(x1 * (0.5 - y)) AS p1,
                       avg(x2 * (0.5 - y)) AS p2,
                       avg(x3 * (0.5 - y)) AS p3
                FROM f),
            s AS (
                SELECT y, x1, x2, x3,
                       1.0 / (1.0 + exp(2.0 * (g0.b + g0.p1 * x1
                           + g0.p2 * x2 + g0.p3 * x3))) AS pr
                FROM f CROSS JOIN g0)
            SELECT round(avg(pr - y), 6) AS g_bias,
                   round(avg(x1 * (pr - y)), 6) AS g_punct_ratio,
                   round(avg(x2 * (pr - y)), 6) AS g_mean_token_len,
                   round(avg(x3 * (pr - y)), 6) AS g_stopword_ratio
            FROM s
        """,
    'doc_bigram_logppl': """
            WITH w AS (
                SELECT doc_id, list_filter(
                    regexp_split_to_array(lower(text), '\\s+'),
                    x -> x <> '') AS ws
                FROM documents),
            pos AS (
                SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
                FROM w, LATERAL (SELECT unnest(range(1, len(ws)))
                                 AS i) t),
            bg AS (SELECT w1, w2, count(*) AS c2 FROM pos
                   GROUP BY w1, w2),
            ctx AS (SELECT w1, count(*) AS c1 FROM pos GROUP BY w1),
            v AS (SELECT count(DISTINCT x) AS nv
                  FROM (SELECT unnest(ws) AS x FROM w)),
            lp AS (
                SELECT p.doc_id,
                       -(log2(bg.c2 + 0.5) - log2(ctx.c1 + 0.5 * v.nv))
                           AS l
                FROM pos p
                JOIN bg ON bg.w1 = p.w1 AND bg.w2 = p.w2
                JOIN ctx ON ctx.w1 = p.w1
                CROSS JOIN v),
            per AS (SELECT doc_id, count(*) AS n_bigrams,
                           round(avg(l), 6) AS logppl
                    FROM lp GROUP BY doc_id)
            SELECT d.doc_id,
                   CAST(coalesce(per.n_bigrams, 0) AS BIGINT)
                       AS n_bigrams,
                   coalesce(per.logppl, 0.0) AS logppl
            FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
            ORDER BY d.doc_id
        """,
    'doc_bpe_pair_counts': """
            WITH w AS (
                SELECT unnest(list_filter(
                    regexp_split_to_array(lower(text), '\\s+'),
                    x -> x <> '')) AS word
                FROM documents),
            wf AS (SELECT word, count(*) AS freq FROM w GROUP BY word),
            p AS (SELECT substr(word, i, 1) AS a,
                         substr(word, i + 1, 1) AS b, freq
                  FROM wf, LATERAL (SELECT unnest(range(1, length(word)))
                                    AS i) t)
            SELECT a, b, CAST(sum(freq) AS BIGINT) AS cnt
            FROM p GROUP BY a, b ORDER BY a, b
        """,
    'doc_dsir_select': """
            WITH w AS (
                SELECT doc_id, lang,
                       unnest(list_filter(regexp_split_to_array(
                           lower(text), '\\s+'), x -> x <> '')) AS w
                FROM documents),
            b AS (
                SELECT doc_id, lang,
                       CAST(CAST('0x' || substr(md5('dsir|' || w),
                                                1, 16) AS UBIGINT)
                            % 1024 AS BIGINT) AS b
                FROM w),
            ct AS (SELECT b, count(*) AS c FROM b
                   WHERE lang = 'en' GROUP BY b),
            cr AS (SELECT b, count(*) AS c FROM b
                   WHERE lang <> 'en' GROUP BY b),
            tot AS (SELECT
                (SELECT count(*) FROM b WHERE lang = 'en') AS t,
                (SELECT count(*) FROM b WHERE lang <> 'en') AS r),
            m AS (
                SELECT bb.b,
                       CAST(floor(1e6 * (
                           ln((coalesce(ct.c, 0) + 1.0)
                              / (tot.t + 1024))
                           - ln((coalesce(cr.c, 0) + 1.0)
                                / (tot.r + 1024)))) AS BIGINT) AS m
                FROM (SELECT unnest(range(1024)) AS b) bb
                LEFT JOIN ct ON ct.b = bb.b
                LEFT JOIN cr ON cr.b = bb.b
                CROSS JOIN tot),
            sc AS (
                SELECT b.doc_id, SUM(m.m) AS score_micro
                FROM b JOIN m ON m.b = b.b WHERE b.lang <> 'en'
                GROUP BY b.doc_id)
            SELECT CAST(row_number() OVER (
                       ORDER BY score_micro DESC, doc_id)
                       AS BIGINT) AS sel_rank,
                   doc_id,
                   CAST(score_micro AS BIGINT) AS score_micro
            FROM sc ORDER BY score_micro DESC, doc_id LIMIT 50
        """,
}
ORACLE_REGISTRY.update(ORACLES)
ORACLES['doc_ppr'] = ORACLE_REGISTRY['doc_ppr'] = _ppr_oracle_sql(iters=5, damping=0.85)
ORACLES['doc_select_coverage'] = ORACLE_REGISTRY['doc_select_coverage'] = _coverage_oracle_sql(k=8,
                                                          buckets=4096)
ORACLES['doc_vocab_coverage'] = ORACLE_REGISTRY['doc_vocab_coverage'] = _VOCAB_COVERAGE_ORACLE_SQL
ORACLES['doc_budget_knapsack'] = ORACLE_REGISTRY['doc_budget_knapsack'] = _knapsack_oracle_sql(n_items=12)
ORACLES['doc_heaps_law'] = ORACLE_REGISTRY['doc_heaps_law'] = _HEAPS_ORACLE_SQL
ORACLES['doc_cdc_chunks'] = ORACLE_REGISTRY['doc_cdc_chunks'] = _cdc_oracle_sql(k=8, divisor=64)
ORACLES['doc_rice_param'] = ORACLE_REGISTRY['doc_rice_param'] = _RICE_ORACLE_SQL
