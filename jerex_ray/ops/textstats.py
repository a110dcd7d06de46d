"""Text-analysis operators over a document table: token counting,
quality scoring, language ID, document fingerprinting.

All are single-pass vectorized ``map_batches`` stages over the
``documents`` table shape ``(doc_id, text, lang, source, n_chars)``.
The language-ID stage is a stateful actor (compiled regexes + stopword
tables built once per actor). These are the first-class training-data
operators the 100 TB pipeline needs alongside the KG stages.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from jerex_ray.util import stable_hash64_batch

_WS_RE = re.compile(r"\s+")
_PUNCT_RE = re.compile(r"[^\w\s]", re.U)
# a BPE-ish word/piece splitter: words, numbers, or single non-space symbols
_BPE_RE = re.compile(r"\w+|[^\w\s]", re.U)


def token_stats(batch: pd.DataFrame) -> pd.DataFrame:
    """Whitespace token count + BPE-ish piece count per document."""
    texts = batch["text"].fillna("")
    batch = batch.copy()
    batch["n_tokens"] = texts.str.split().str.len().fillna(0).astype("int64")
    batch["n_pieces"] = texts.str.count(_BPE_RE).astype("int64")
    return batch[["doc_id", "n_tokens", "n_pieces"]]


# whole-token, case-insensitive English stopword match: a token is a
# maximal non-whitespace run, so boundary lookarounds make the count
# exact (and SQL-replicable via list_filter + lower(x) IN (...))
_EN_STOPWORDS = ("the", "and", "of", "to", "a", "in", "is", "it",
                 "that", "was")
_STOPWORD_RE = re.compile(
    r"(?i)(?:^|(?<=\s))(?:" + "|".join(_EN_STOPWORDS) + r")(?=\s|$)")


def quality_stats(batch: pd.DataFrame) -> pd.DataFrame:
    """Cheap quality signals: length, punctuation ratio, mean word
    length, uppercase ratio, stopword ratio. All vectorized pandas
    str kernels."""
    texts = batch["text"].fillna("")
    n_chars = texts.str.len().astype("int64")
    n_punct = texts.str.count(_PUNCT_RE).astype("int64")
    n_tokens = texts.str.split().str.len().fillna(0).astype("int64")
    n_upper = texts.str.count(r"[A-Z]").astype("int64")
    n_ws = texts.str.count(r"\s").astype("int64")
    n_stop = texts.str.count(_STOPWORD_RE).astype("int64")
    out = pd.DataFrame({
        "doc_id": batch["doc_id"],
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "punct_ratio": (n_punct / n_chars.clip(lower=1)).astype("float64"),
        "upper_ratio": (n_upper / n_chars.clip(lower=1)).astype("float64"),
        "mean_token_len": np.where(
            n_tokens > 0,
            (n_chars - n_ws) / n_tokens.clip(lower=1), 0.0),
        "stopword_ratio": (n_stop / n_tokens.clip(lower=1))
            .astype("float64"),
    })
    return out


class LangId:
    """Stopword-profile language ID (n-gram heuristic) — actor stage.

    Deterministic and tiny: scores each doc against per-language
    stopword sets; ties and empty docs → 'und'."""

    PROFILES = {
        "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "was"},
        "de": {"der", "die", "und", "das", "ist", "nicht", "ein", "mit", "zu"},
        "fr": {"le", "la", "et", "les", "des", "est", "une", "dans", "que"},
        "es": {"el", "la", "de", "que", "los", "una", "es", "por", "con"},
    }

    def __init__(self):
        self.word_re = re.compile(r"[a-zà-ÿ]+")
        self.langs = sorted(self.PROFILES)          # tie-break order
        self.profiles = [frozenset(self.PROFILES[k]) for k in self.langs]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        """Vectorized: explode distinct words per doc once, one
        ``isin`` + bincount per language profile, argmax with the
        first-in-sorted-order tie rule."""
        n = len(batch)
        texts = batch["text"].fillna("").str.lower()
        word_lists = texts.str.findall(self.word_re)
        lens = word_lists.str.len().to_numpy()
        if lens.sum() == 0:
            out = batch[["doc_id"]].copy()
            out["lang_pred"] = "und"
            return out
        doc_idx = np.repeat(np.arange(n), lens)
        flat = pd.DataFrame({"i": doc_idx,
                             "w": np.concatenate(word_lists.to_numpy())})
        flat = flat.drop_duplicates()               # distinct words per doc
        scores = np.zeros((n, len(self.langs)), dtype=np.int64)
        for li, prof in enumerate(self.profiles):
            hits = flat["w"].isin(prof).to_numpy()
            scores[:, li] = np.bincount(flat["i"].to_numpy()[hits],
                                        minlength=n)
        best = scores.argmax(axis=1)                # first max wins ties
        langs = np.asarray(self.langs, dtype=object)[best]
        langs = np.where(scores.max(axis=1) > 0, langs, "und")
        out = batch[["doc_id"]].copy()
        out["lang_pred"] = langs
        return out


def fingerprint(batch: pd.DataFrame, *, normalize: bool = True,
                algo: str = "blake2b") -> pd.DataFrame:
    """64-bit content fingerprint of (optionally normalized) text —
    the key for exact dedup. ``algo='md5'`` uses the SQL-replicable
    md5-derived hash (DuckDB ``substr(md5(x), 1, 16)``) so an oracle
    can recompute identical fingerprints."""
    from jerex_ray.util import md5_hash64_batch
    texts = batch["text"].fillna("")
    if normalize:
        texts = texts.str.lower().str.replace(_WS_RE, " ", regex=True).str.strip()
    # unique-then-scatter: one hash per distinct text
    hash_batch = md5_hash64_batch if algo == "md5" else stable_hash64_batch
    fps = (hash_batch(texts) % np.uint64(1 << 63)).astype(np.int64)
    out = batch.copy()
    out["fp"] = fps
    return out


def repetition_stats(batch: pd.DataFrame) -> pd.DataFrame:
    """Gopher-style repetition quality signals (Rae et al. '21 §A1.1):
    the duplicate-word fraction (1 − distinct/total words) and the
    fraction of the document's bigrams taken by its most frequent
    bigram. High values flag boilerplate / degenerate repetition.

    Vectorized across the batch: one flat (doc, word) explode, one
    drop-duplicates + bincount for distinct words, one flat bigram
    construction + groupby-max for the top-bigram share — no per-doc
    Python loop."""
    n_docs = len(batch)
    texts = batch["text"].fillna("").str.lower()
    word_lists = texts.str.split()
    lens = word_lists.str.len().fillna(0).to_numpy(dtype=np.int64)
    out = pd.DataFrame({
        "doc_id": batch["doc_id"].astype("int64"),
        "n_tokens": lens,
        "dup_word_frac": np.zeros(n_docs, dtype=np.float64),
        "top_bigram_frac": np.zeros(n_docs, dtype=np.float64),
    })
    if lens.sum() == 0:
        return out
    doc_idx = np.repeat(np.arange(n_docs), lens)
    flat = np.concatenate([w for w in word_lists.to_numpy() if w]) \
        if n_docs else np.empty(0, object)
    words = pd.DataFrame({"i": doc_idx, "w": flat})
    n_distinct = np.bincount(words.drop_duplicates()["i"].to_numpy(),
                             minlength=n_docs)
    nz = lens > 0
    out.loc[nz, "dup_word_frac"] = 1.0 - n_distinct[nz] / lens[nz]
    # bigrams: adjacent word pairs within a doc — positions where the
    # next flat element belongs to the same doc
    if len(flat) > 1:
        same = doc_idx[:-1] == doc_idx[1:]
        if same.any():
            bi = pd.DataFrame({
                "i": doc_idx[:-1][same],
                "g": pd.Series(flat[:-1][same]).str.cat(
                    pd.Series(flat[1:][same]), sep=" ").to_numpy(),
            })
            top = bi.groupby(["i", "g"], sort=False).size() \
                .groupby(level=0).max()
            total = np.maximum(lens - 1, 1)
            frac = np.zeros(n_docs, dtype=np.float64)
            frac[top.index.to_numpy()] = top.to_numpy()
            out["top_bigram_frac"] = frac / total
            out.loc[lens < 2, "top_bigram_frac"] = 0.0
    return out


def run_repetition_stats(docs_ds):
    return docs_ds.map_batches(repetition_stats, batch_format="pandas",
                               batch_size=8192)


def top_ngrams(docs_ds, *, n: int = 2, k: int = 10,
               num_partitions: int | None = None) -> pd.DataFrame:
    """Corpus-wide top-k word n-grams by count: per-batch explode +
    partial count (combiner), one small groupby, driver-side top-k on
    the merged counts (result is ≤ distinct-ngram rows, already
    combiner-bounded)."""
    from jerex_ray.functions.aggregate import grouped_aggregate

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        grams = []
        for t in batch["text"].fillna(""):
            ws = t.lower().split()
            grams.extend(" ".join(ws[i:i + n])
                         for i in range(len(ws) - n + 1))
        out = pd.DataFrame({"ngram": grams})
        return out.groupby("ngram", sort=False).size().reset_index(name="c")

    counts = grouped_aggregate(
        docs_ds.map_batches(explode, batch_format="pandas",
                            batch_size=8192),
        ["ngram"], {"n_occurrences": ("c", "sum")},
        num_partitions=num_partitions)
    df = counts.to_pandas()
    if df.empty or "n_occurrences" not in df.columns:
        # empty corpora surface schema-less through the aggregate
        return pd.DataFrame({"ngram": pd.Series(dtype="object"),
                             "n_occurrences": pd.Series(dtype="int64")})
    df["n_occurrences"] = df["n_occurrences"].astype("int64")
    return df.sort_values(["n_occurrences", "ngram"],
                          ascending=[False, True]).head(k) \
             .reset_index(drop=True)


def unigram_logppl(docs_ds, *, num_partitions: int | None = None):
    """CCNet-style LM quality score (Wenzek et al. '19 use a KenLM
    5-gram; the unigram variant keeps the same shape): per document,
    the mean negative log2 probability of its words under the CORPUS
    unigram distribution. Low = typical text, high = atypical/noisy.

    Two passes, both scale-shaped: corpus word counts reduce through
    the combiner ``grouped_aggregate`` (vocabulary-sized result), the
    log-prob table broadcasts once via ``ray.put`` (vocabularies are
    small by Zipf, the correct broadcast side), then ONE streaming
    ``map_batches`` scores every doc — flat word explode, one
    C-speed dict map, one bincount mean. Out-of-vocabulary words (a
    pre-trained LM table, not the corpus-self one) score as a single
    count smoothed over the total."""
    import ray

    from jerex_ray.functions.aggregate import grouped_aggregate

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        words = batch["text"].fillna("").str.lower().str.split()
        lens = words.str.len().fillna(0).to_numpy(dtype=np.int64)
        if lens.sum() == 0:
            return pd.DataFrame({"w": pd.Series(dtype="object"),
                                 "c": pd.Series(dtype="int64")})
        flat = np.concatenate([w for w in words.to_numpy() if w])
        out = pd.DataFrame({"w": flat})
        return out.groupby("w", sort=False).size().reset_index(name="c")

    counts = grouped_aggregate(
        docs_ds.map_batches(explode, batch_format="pandas",
                            batch_size=8192),
        ["w"], {"n": ("c", "sum")},
        num_partitions=num_partitions).to_pandas()
    if counts.empty or "n" not in counts.columns:
        logp = {}
        total = 1
    else:
        total = int(counts["n"].sum())
        logp = dict(zip(counts["w"],
                        -np.log2(counts["n"].to_numpy(np.float64) / total)))
    oov = -np.log2(1.0 / max(total, 1))
    ref = ray.put((logp, oov))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        table, oov_lp = ray.get(ref)
        words = batch["text"].fillna("").str.lower().str.split()
        lens = words.str.len().fillna(0).to_numpy(dtype=np.int64)
        n = len(batch)
        out = pd.DataFrame({"doc_id": batch["doc_id"].astype("int64"),
                            "n_tokens": lens,
                            "logppl": np.zeros(n, dtype=np.float64)})
        if lens.sum() == 0:
            return out
        doc_idx = np.repeat(np.arange(n), lens)
        flat = pd.Series(np.concatenate(
            [w for w in words.to_numpy() if w]))
        vals = flat.map(table).fillna(oov_lp).to_numpy(np.float64)
        sums = np.bincount(doc_idx, weights=vals, minlength=n)
        nz = lens > 0
        out.loc[nz, "logppl"] = sums[nz] / lens[nz]
        return out

    return docs_ds.map_batches(score, batch_format="pandas",
                               batch_size=8192)


def winnowing_fingerprints(batch: pd.DataFrame, *, k: int = 8,
                           window: int = 4,
                           col: str = "text") -> pd.DataFrame:
    """Document fingerprinting by winnowing (Schleimer-Wilkerson-Aiken
    2003, the MOSS algorithm): Rabin-Karp rolling hash over character
    k-grams, then keep the minimum hash of every ``window`` of
    consecutive k-gram hashes (rightmost min on ties), deduplicated.
    Output: one row per (doc_id, fingerprint, position) — a compact,
    alignment-robust signature for plagiarism-style overlap detection.

    Fully vectorized per batch: the rolling hash is a cumulative
    polynomial over the whole concatenated text per doc; window minima
    via a stride-tricks sliding window."""
    _B = np.uint64(1_000_003)
    _POW = _B ** np.uint64(k - 1)
    ids_out, fp_out, pos_out = [], [], []
    for doc_id, text in zip(batch["doc_id"], batch[col].fillna("")):
        t = text.lower()
        if len(t) < k:
            continue
        # operate on raw bytes; k-grams over bytes of the lowercased text
        data = np.frombuffer(t.encode("utf-8", "replace"), dtype=np.uint8)
        n = data.size
        if n < k:
            continue
        h = np.zeros(n - k + 1, dtype=np.uint64)
        # the rolling hash intentionally wraps mod 2^64 — errstate
        # keeps logs clean and survives np.seterr(over='raise') hosts
        with np.errstate(over="ignore"):
            # initial window
            acc = np.uint64(0)
            for i in range(k):
                acc = acc * _B + np.uint64(data[i])
            h[0] = acc
            # rolling update, vectorized via cumulative recurrence:
            # h[i+1] = (h[i] - data[i]*B^(k-1)) * B + data[i+k]
            # (loop is O(n) scalar uint64 ops; numpy's wraparound keeps
            # it exact mod 2^64)
            lead = data[: n - k].astype(np.uint64) * _POW
            tail = data[k:].astype(np.uint64)
            for i in range(n - k):
                acc = (acc - lead[i]) * _B + tail[i]
                h[i + 1] = acc
        if h.size < window:
            sel = np.array([h.argmin()])
        else:
            win = np.lib.stride_tricks.sliding_window_view(h, window)
            # rightmost minimum per window (winnowing tie rule):
            # argmin over the reversed window gives the offset from the
            # window's right edge
            right_off = win[:, ::-1].argmin(axis=1)
            sel = np.unique(np.arange(len(win)) + (window - 1 - right_off))
        ids_out.append(np.full(sel.size, doc_id, dtype=np.int64))
        fp_out.append(h[sel].astype(np.int64) & np.int64(0x7FFFFFFFFFFFFFFF))
        pos_out.append(sel.astype(np.int64))
    if not ids_out:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "fingerprint": pd.Series(dtype="int64"),
                             "position": pd.Series(dtype="int64")})
    return pd.DataFrame({"doc_id": np.concatenate(ids_out),
                         "fingerprint": np.concatenate(fp_out),
                         "position": np.concatenate(pos_out)})


def run_winnowing(docs_ds, *, k: int = 8, window: int = 4):
    return docs_ds.map_batches(
        winnowing_fingerprints, batch_format="pandas", batch_size=4096,
        fn_kwargs={"k": k, "window": window})


def winnowing_fingerprints_md5(batch: pd.DataFrame, *, k: int = 8,
                               window: int = 4,
                               col: str = "text") -> pd.DataFrame:
    """SQL-replicable winnowing variant: the character-k-gram hashes
    are md5-derived (identical to DuckDB ``CAST('0x' ||
    substr(md5(substr(t, i+1, k)), 1, 16) AS UBIGINT) % 2^63``)
    instead of the rolling polynomial, so an ANSI-SQL oracle can
    recompute the selected fingerprints bit-for-bit. Selection rule is
    the same winnowing rule (rightmost minimum per window of
    ``window`` consecutive gram hashes, deduplicated); grams are
    CHARACTER substrings of the lowercased text (matching SQL
    ``substr`` semantics), not UTF-8 bytes. Docs shorter than ``k``
    characters emit no rows; docs with fewer than ``window`` grams
    form a single window over all grams.

    The rolling-hash twin (``winnowing_fingerprints``) stays the scale
    path — O(n) scalar hash updates vs one md5 per distinct gram here.
    All grams in the batch are hashed in ONE unique-then-scatter pass.
    """
    from jerex_ray.util import md5_hash64_batch
    all_grams: list = []
    spans: list = []  # (doc_id, offset into all_grams, n_grams)
    for doc_id, text in zip(batch["doc_id"], batch[col].fillna("")):
        t = text.lower()
        n = len(t) - k + 1
        if n < 1:
            continue
        spans.append((doc_id, len(all_grams), n))
        all_grams.extend(t[i:i + k] for i in range(n))
    if not spans:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "fingerprint": pd.Series(dtype="int64"),
                             "position": pd.Series(dtype="int64")})
    hashes = (md5_hash64_batch(all_grams)
              % np.uint64(1 << 63)).astype(np.int64)
    ids_out, fp_out, pos_out = [], [], []
    for doc_id, off, n in spans:
        h = hashes[off:off + n]
        if n <= window:
            # one window covering every gram; rightmost min
            sel = np.array([n - 1 - int(h[::-1].argmin())])
        else:
            win = np.lib.stride_tricks.sliding_window_view(h, window)
            right_off = win[:, ::-1].argmin(axis=1)
            sel = np.unique(np.arange(len(win)) + (window - 1 - right_off))
        ids_out.append(np.full(sel.size, doc_id, dtype=np.int64))
        fp_out.append(h[sel])
        pos_out.append(sel.astype(np.int64))
    return pd.DataFrame({"doc_id": np.concatenate(ids_out),
                         "fingerprint": np.concatenate(fp_out),
                         "position": np.concatenate(pos_out)})


def run_winnowing_md5(docs_ds, *, k: int = 8, window: int = 4):
    return docs_ds.map_batches(
        winnowing_fingerprints_md5, batch_format="pandas",
        batch_size=1024, fn_kwargs={"k": k, "window": window})


def tfidf_top_terms(docs_ds, *, top: int = 3,
                    num_partitions: int | None = None):
    """Per-document top-``top`` terms by smoothed tf-idf
    (sklearn-style idf = ln((1+N)/(1+df)) + 1; tf = count/len).

    Two passes, both scale-shaped: document frequencies reduce through
    the combiner ``grouped_aggregate`` (one (doc,term)-distinct explode
    per batch → vocabulary-sized result), the idf table broadcasts once
    via ``ray.put``, then ONE streaming ``map_batches`` ranks each
    doc's terms. The output carries only integers and strings
    (tf_count, doc_freq, rank) — the float score exists transiently for
    ordering, with ties broken on term asc, so the result is
    SQL-oracle exact. idf values are computed with ``math.log`` (glibc,
    the same libm DuckDB's ``ln`` binds) so the ordering matches the
    oracle bit-for-bit."""
    import math

    import ray

    from jerex_ray.functions.aggregate import grouped_aggregate

    def doc_terms(batch: pd.DataFrame) -> pd.DataFrame:
        """Per-term distinct-doc counts + a doc-count sentinel row."""
        words = batch["text"].fillna("").str.lower().str.split()
        lens = words.str.len().fillna(0).to_numpy(np.int64)
        sentinel = pd.DataFrame({"term": [""], "c": [len(batch)]})
        if lens.sum() == 0:
            return sentinel
        flat = pd.DataFrame({
            "doc": np.repeat(np.arange(len(batch)), lens),
            "term": np.concatenate([w for w in words.to_numpy() if w])})
        out = (flat.drop_duplicates()
               .groupby("term", sort=False).size().reset_index(name="c"))
        # sentinel: total docs in batch under the never-a-word "" key
        return pd.concat([out, sentinel], ignore_index=True)

    df_counts = grouped_aggregate(
        docs_ds.map_batches(doc_terms, batch_format="pandas",
                            batch_size=8192),
        ["term"], {"df": ("c", "sum")},
        num_partitions=num_partitions).to_pandas()
    empty = pd.DataFrame({
        "doc_id": pd.Series(dtype="int64"),
        "term": pd.Series(dtype="object"),
        "tf_count": pd.Series(dtype="int64"),
        "doc_freq": pd.Series(dtype="int64"),
        "rank": pd.Series(dtype="int64")})
    if df_counts.empty or "df" not in df_counts.columns:
        return ray.data.from_pandas(empty)
    n_docs = int(df_counts.loc[df_counts["term"] == "", "df"].sum())
    vocab = df_counts[df_counts["term"] != ""]
    idf = {t: math.log((1.0 + n_docs) / (1.0 + d)) + 1.0
           for t, d in zip(vocab["term"], vocab["df"].astype(int))}
    dfreq = dict(zip(vocab["term"], vocab["df"].astype(int)))
    ref = ray.put((idf, dfreq))

    def rank_batch(batch: pd.DataFrame) -> pd.DataFrame:
        idf_t, df_t = ray.get(ref)
        words = batch["text"].fillna("").str.lower().str.split()
        lens = words.str.len().fillna(0).to_numpy(np.int64)
        cols = ["doc_id", "term", "tf_count", "doc_freq", "rank"]
        if lens.sum() == 0:
            return empty[cols].copy()
        ids = batch["doc_id"].astype("int64").to_numpy()
        flat = pd.DataFrame({
            "doc": np.repeat(np.arange(len(batch)), lens),
            "term": np.concatenate([w for w in words.to_numpy() if w])})
        tf = (flat.groupby(["doc", "term"], sort=False)
              .size().reset_index(name="tf_count"))
        score = (tf["tf_count"].to_numpy(np.float64)
                 / lens[tf["doc"].to_numpy()]) \
            * tf["term"].map(idf_t).to_numpy(np.float64)
        # score desc, term asc within doc — ties (same tf, same df)
        # are mathematically exact and break on the term
        order = np.lexsort((tf["term"].to_numpy(), -score,
                            tf["doc"].to_numpy()))
        tf = tf.iloc[order]
        tf["rank"] = tf.groupby("doc", sort=False).cumcount() + 1
        tf = tf[tf["rank"] <= top]
        return pd.DataFrame({
            "doc_id": ids[tf["doc"].to_numpy()],
            "term": tf["term"].to_numpy(),
            "tf_count": tf["tf_count"].to_numpy(np.int64),
            "doc_freq": tf["term"].map(df_t).to_numpy(np.int64),
            "rank": tf["rank"].to_numpy(np.int64)})

    return docs_ds.map_batches(rank_batch, batch_format="pandas",
                               batch_size=8192)


def run_token_stats(docs_ds):
    return docs_ds.map_batches(token_stats, batch_format="pandas",
                               batch_size=8192)


def run_quality_stats(docs_ds):
    return docs_ds.map_batches(quality_stats, batch_format="pandas",
                               batch_size=8192)


def run_langid(docs_ds, concurrency=(1, 4)):
    return docs_ds.map_batches(LangId, batch_format="pandas",
                               batch_size=4096, concurrency=concurrency)


def build_vocab(docs_ds, *, top: int = 1000,
                num_partitions: int | None = None) -> pd.DataFrame:
    """Frequency-ranked vocabulary (the word-level analogue of
    tokenizer training): global word counts via the combiner
    aggregate, then deterministic token-id assignment in
    (count DESC, word ASC) order. The full count table stays a
    Dataset; only per-block top-``top`` survivors (already globally
    counted, so block-local head() is exact) reach the single-block
    final ranking — the corpus never sorts. SQL-oracled via
    ``row_number() OVER (ORDER BY cnt DESC, word)``."""
    from jerex_ray.functions.aggregate import grouped_aggregate

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        words = batch["text"].fillna("").str.lower().str.split()
        nonempty = [w for w in words.to_numpy() if w]
        if not nonempty:
            return pd.DataFrame({"word": pd.Series(dtype="object"),
                                 "c": pd.Series(dtype="int64")})
        vc = pd.Series(np.concatenate(nonempty)).value_counts()
        return pd.DataFrame({"word": vc.index.to_numpy(),
                             "c": vc.to_numpy(np.int64)})

    counts = grouped_aggregate(
        docs_ds.map_batches(explode, batch_format="pandas",
                            batch_size=8192),
        ["word"], {"cnt": ("c", "sum")}, num_partitions=num_partitions)

    def partial_top(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["cnt", "word"],
                              ascending=[False, True]).head(top)

    final = counts.map_batches(partial_top, batch_format="pandas",
                               batch_size=None) \
        .repartition(1) \
        .map_batches(partial_top, batch_format="pandas",
                     batch_size=None).to_pandas()
    if final.empty or "word" not in final.columns:
        return pd.DataFrame({"token_id": pd.Series(dtype="int64"),
                             "word": pd.Series(dtype="object"),
                             "cnt": pd.Series(dtype="int64")})
    final = final.sort_values(["cnt", "word"], ascending=[False, True]) \
        .head(top).reset_index(drop=True)
    final["token_id"] = np.arange(len(final), dtype=np.int64)
    final["cnt"] = final["cnt"].astype("int64")
    return final[["token_id", "word", "cnt"]]


def chunk_documents(docs_ds, *, chunk_words: int = 64,
                    overlap: int = 16, col: str = "text",
                    id_col: str = "doc_id"):
    """Fixed-size word-window chunking with overlap (the long-document
    preprocessing step before tokenization/packing): a doc of n words
    yields 1 chunk if n <= chunk_words, else ceil((n-c)/s)+1 chunks at
    stride s = chunk_words - overlap, the last one right-clipped.
    Pure per-doc integer arithmetic in one streaming ``map_batches``
    (no shuffle — a doc's text lives in one row); SQL-oracled
    bit-exactly (integer coordinates + joined word slices)."""
    if not 0 <= overlap < chunk_words:
        raise ValueError("need 0 <= overlap < chunk_words")
    stride = chunk_words - overlap

    def chunks(batch: pd.DataFrame) -> pd.DataFrame:
        words = batch[col].fillna("").str.lower().str.split()
        ids, cidx, starts, ends, texts = [], [], [], [], []
        for doc, ws in zip(batch[id_col].to_numpy(), words.to_numpy()):
            n = len(ws) if ws is not None else 0
            if n == 0:
                continue
            k = 1 if n <= chunk_words else (n - chunk_words
                                            + stride - 1) // stride + 1
            s = np.arange(k, dtype=np.int64) * stride
            e = np.minimum(s + chunk_words, n)
            ids.append(np.full(k, doc, dtype=np.int64))
            cidx.append(np.arange(k, dtype=np.int64))
            starts.append(s)
            ends.append(e)
            texts.extend(" ".join(ws[a:b]) for a, b in zip(s, e))
        if not ids:
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "chunk_idx": pd.Series(dtype="int64"),
                                 "start": pd.Series(dtype="int64"),
                                 "end": pd.Series(dtype="int64"),
                                 "chunk_text": pd.Series(dtype="object")})
        return pd.DataFrame({id_col: np.concatenate(ids),
                             "chunk_idx": np.concatenate(cidx),
                             "start": np.concatenate(starts),
                             "end": np.concatenate(ends),
                             "chunk_text": texts})

    return docs_ds.map_batches(chunks, batch_format="pandas",
                               batch_size=4096)


def _flat_bigrams(batch: pd.DataFrame):
    """(doc_index, prev, cur) arrays for all in-doc word adjacencies
    — shared by the bigram-LM scorers (whitespace tokens, lowercased,
    doc boundaries masked via the repeat-index trick)."""
    words = batch["text"].fillna("").str.lower().str.split()
    lens = words.str.len().fillna(0).to_numpy(dtype=np.int64)
    if lens.sum() < 2:
        return None
    flat = np.concatenate([w for w in words.to_numpy() if w])
    owner = np.repeat(np.arange(len(batch)), lens)
    m = owner[:-1] == owner[1:]
    if not m.any():
        return None
    return owner[:-1][m], flat[:-1][m], flat[1:][m]


def _bigram_counts(docs_ds, num_partitions=None) -> pd.DataFrame:
    """Corpus bigram count table (w1, w2, n) through the combiner —
    vocabulary²-bounded, the fit artifact of both bigram LMs."""
    from jerex_ray.functions.aggregate import grouped_aggregate

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"w1": pd.Series(dtype="object"),
                              "w2": pd.Series(dtype="object"),
                              "c": pd.Series(dtype="int64")})
        got = _flat_bigrams(batch)
        if got is None:
            return empty
        _, prev, cur = got
        g = pd.DataFrame({"w1": prev, "w2": cur}) \
            .groupby(["w1", "w2"], sort=False).size() \
            .reset_index(name="c")
        g["c"] = g["c"].astype("int64")
        return g

    return grouped_aggregate(
        docs_ds.map_batches(explode, batch_format="pandas",
                            batch_size=8192),
        ["w1", "w2"], {"n": ("c", "sum")},
        num_partitions=num_partitions).to_pandas()


def kneser_ney_logppl(docs_ds, *, discount: float = 0.75,
                      num_partitions: int | None = None):
    """Interpolated Kneser-Ney bigram-LM quality score (Kneser & Ney
    '95; Chen & Goodman '96 eq. 4.17) — the smoothing that scores a
    bigram's novelty by how many CONTEXTS its unigram completes, not
    how often it occurs:

        P(w₂|w₁) = max(c(w₁w₂)−D, 0)/c(w₁·)
                   + (D·N₁₊(w₁•)/c(w₁·)) · (N₁₊(•w₂)/B)

    with D = ``discount``, N₁₊ the distinct-continuation counts and
    B the number of distinct bigram types. Per doc: mean −ln P over
    its bigram tokens (self-scoring the fit corpus, so every bigram
    is in the table — scoring foreign text raises rather than
    silently back off).

    Dataflow: ONE combiner pass to the vocabulary²-bounded bigram
    table; all four statistic tables derive from it driver-side and
    broadcast once via ``ray.put``; one streaming pass scores. Every
    probability is a fixed arithmetic expression over integers + D,
    sequenced identically to the SQL oracle."""
    import ray

    counts = _bigram_counts(docs_ds, num_partitions)
    if counts.empty or "w1" not in counts.columns:
        table = {}
    else:
        c1 = counts.groupby("w1", sort=False)["n"].transform("sum") \
            .to_numpy(np.float64)
        n1f = counts.groupby("w1", sort=False)["w2"] \
            .transform("size").to_numpy(np.float64)
        n1b_map = counts.groupby("w2", sort=False).size()
        n1b = counts["w2"].map(n1b_map).to_numpy(np.float64)
        B = float(len(counts))
        c2 = counts["n"].to_numpy(np.float64)
        p = np.maximum(c2 - discount, 0.0) / c1 \
            + (discount * n1f) / c1 * (n1b / B)
        lp = -np.log(p)
        sep = "\x00"
        table = dict(zip(counts["w1"] + sep + counts["w2"], lp))
    ref = ray.put(table)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        tbl = ray.get(ref)
        n_bi = np.zeros(len(batch), dtype=np.int64)
        logppl = np.zeros(len(batch), dtype=np.float64)
        got = _flat_bigrams(batch)
        if got is not None:
            owner, prev, cur = got
            keys = pd.Series(prev, dtype="object") + "\x00" \
                + pd.Series(cur, dtype="object")
            l = keys.map(tbl)
            if l.isna().any():
                raise ValueError(
                    "kneser_ney_logppl scores its own fit corpus; "
                    "unseen bigram encountered")
            l = l.to_numpy(np.float64)
            n_bi = np.bincount(owner, minlength=len(batch)) \
                .astype(np.int64)
            sums = np.bincount(owner, weights=l, minlength=len(batch))
            nz = n_bi > 0
            logppl[nz] = sums[nz] / n_bi[nz]
        return pd.DataFrame({"doc_id": batch["doc_id"].to_numpy(),
                             "n_bigrams": n_bi,
                             "logppl": logppl})

    return docs_ds.map_batches(score, batch_format="pandas",
                               batch_size=8192)


def bigram_logppl(docs_ds, *, k: float = 0.5,
                  num_partitions: int | None = None):
    """Add-k smoothed bigram-LM quality score (Chen & Goodman '96
    additive smoothing; the CCNet scoring shape one order up from
    ``unigram_logppl``): per document, the mean −log2 P(wᵢ | wᵢ₋₁)
    under the corpus bigram distribution,
    P(w₂|w₁) = (c(w₁w₂) + k) / (c(w₁·) + k·V).

    Dataflow: bigram counts reduce through the combiner (one flat
    explode per batch — adjacency masked at doc boundaries via the
    repeat-index trick, no per-row loop); the count table is
    vocabulary²-bounded and broadcasts once via ``ray.put`` (context
    totals derive from it exactly; V from a distinct-unigram count).
    ONE streaming pass then scores every doc with two C-speed dict
    maps. For corpora whose bigram table outgrows a worker heap the
    scale path is a join on the bigram key instead of the broadcast —
    same shape as the minhash verify's joined variant."""
    import ray

    from jerex_ray.functions.aggregate import grouped_aggregate

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"w1": pd.Series(dtype="object"),
                              "w2": pd.Series(dtype="object"),
                              "c": pd.Series(dtype="int64")})
        got = _flat_bigrams(batch)
        if got is None:
            return empty
        _, prev, cur = got
        g = pd.DataFrame({"w1": prev, "w2": cur}) \
            .groupby(["w1", "w2"], sort=False).size().reset_index(name="c")
        g["c"] = g["c"].astype("int64")
        return g

    counts = grouped_aggregate(
        docs_ds.map_batches(explode, batch_format="pandas",
                            batch_size=8192),
        ["w1", "w2"], {"n": ("c", "sum")},
        num_partitions=num_partitions).to_pandas()

    def explode_uni(batch: pd.DataFrame) -> pd.DataFrame:
        words = batch["text"].fillna("").str.lower().str.split()
        nonempty = [w for w in words.to_numpy() if w]
        if not nonempty:
            return pd.DataFrame({"w": pd.Series(dtype="object"),
                                 "c": pd.Series(dtype="int64")})
        vc = pd.Series(np.concatenate(nonempty)).value_counts()
        return pd.DataFrame({"w": vc.index.to_numpy(),
                             "c": vc.to_numpy(np.int64)})

    vocab = grouped_aggregate(
        docs_ds.map_batches(explode_uni, batch_format="pandas",
                            batch_size=8192),
        ["w"], {"n": ("c", "sum")}, num_partitions=num_partitions)
    V = vocab.count()

    if counts.empty or "w1" not in counts.columns:
        bigram_lp, ctx_c = {}, {}
    else:
        ctx = counts.groupby("w1", sort=False)["n"].sum()
        ctx_c = ctx.to_dict()
        denom = counts["w1"].map(ctx).to_numpy(np.float64) + k * V
        lp = -(np.log2(counts["n"].to_numpy(np.float64) + k)
               - np.log2(denom))
        sep = "\x00"
        bigram_lp = dict(zip(counts["w1"] + sep + counts["w2"], lp))
    ref = ray.put((bigram_lp, ctx_c, float(V)))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        table, ctx_counts, v = ray.get(ref)
        n_bi = np.zeros(len(batch), dtype=np.int64)
        logppl = np.zeros(len(batch), dtype=np.float64)
        got = _flat_bigrams(batch)
        if got is not None:
            owner, prev, cur = got
            keys = pd.Series(prev, dtype="object") + "\x00" \
                + pd.Series(cur, dtype="object")
            l = keys.map(table)
            # unseen bigram (scoring off-corpus): smoothed fallback
            if l.isna().any():
                c1 = pd.Series(prev, dtype="object").map(ctx_counts) \
                    .fillna(0.0).to_numpy(np.float64)
                fb = -(np.log2(k) - np.log2(c1 + k * v))
                l = l.to_numpy(np.float64)
                l[np.isnan(l)] = fb[np.isnan(l)]
            else:
                l = l.to_numpy(np.float64)
            n_bi = np.bincount(owner, minlength=len(batch)) \
                .astype(np.int64)
            sums = np.bincount(owner, weights=l, minlength=len(batch))
            nz = n_bi > 0
            logppl[nz] = sums[nz] / n_bi[nz]
        return pd.DataFrame({"doc_id": batch["doc_id"].to_numpy(),
                             "n_bigrams": n_bi,
                             "logppl": logppl})

    return docs_ds.map_batches(score, batch_format="pandas",
                               batch_size=8192)


def source_kl(docs_ds, *, k: float = 0.5,
              num_partitions: int | None = None) -> pd.DataFrame:
    """Per-source KL divergence (bits) from each source's add-k
    smoothed unigram distribution to the corpus-wide one — the
    domain-drift / mixture-health scan (Kullback–Leibler '51;
    smoothing per Chen & Goodman '96).

    Exact WITHOUT the source×vocab cross product: present words
    reduce through one combiner pass; the missing-word mass has the
    closed form p₀·[M·log2 p₀ − (S_all − S_present)] since every
    missing word shares p₀ = k/(n_s+kV) — so only a vocab-bounded
    corpus-count table broadcasts (same contract as
    ``unigram_logppl``) and per-source scalars shuffle."""
    import ray

    from jerex_ray.functions.aggregate import grouped_aggregate

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        words = batch["text"].fillna("").str.lower().str.split()
        lens = words.str.len().fillna(0).to_numpy(np.int64)
        if lens.sum() == 0:
            return pd.DataFrame({"source": pd.Series(dtype="object"),
                                 "word": pd.Series(dtype="object"),
                                 "c": pd.Series(dtype="int64")})
        flat = np.concatenate([w for w in words.to_numpy() if w])
        src = np.repeat(batch["source"].to_numpy(), lens)
        g = pd.DataFrame({"source": src, "word": flat}) \
            .groupby(["source", "word"], sort=False).size() \
            .reset_index(name="c")
        g["c"] = g["c"].astype("int64")
        return g

    sw = grouped_aggregate(
        docs_ds.map_batches(explode, batch_format="pandas",
                            batch_size=8192),
        ["source", "word"], {"n": ("c", "sum")},
        num_partitions=num_partitions).materialize()

    cw = grouped_aggregate(sw, ["word"], {"cq": ("n", "sum")},
                           num_partitions=num_partitions).to_pandas()
    if cw.empty or "word" not in cw.columns:
        return pd.DataFrame({"source": pd.Series(dtype="object"),
                             "kl_bits": pd.Series(dtype="float64")})
    N = int(cw["cq"].sum())
    V = len(cw)
    logq = dict(zip(
        cw["word"],
        np.log2((cw["cq"].to_numpy(np.float64) + k) / (N + k * V))))
    S_all = float(np.sum(np.log2(
        (cw["cq"].to_numpy(np.float64) + k) / (N + k * V))))
    ref = ray.put(logq)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "source": pd.Series(dtype="object"),
            "ns": pd.Series(dtype="int64"),
            "present": pd.Series(dtype="int64"),
            # Σ c·log2 q and Σ c (for p-term) carried per source; the
            # p terms need n_s, so we ship raw (word-count, log q)
            # sums and close on the driver
            "s_logq": pd.Series(dtype="float64"),
            "s_c_sq": pd.Series(dtype="float64"),
            "s_c": pd.Series(dtype="float64")})
        if not len(df):
            return empty
        lq_map = ray.get(ref)
        lq = df["word"].map(lq_map).to_numpy(np.float64)
        c = df["n"].to_numpy(np.float64)
        g = pd.DataFrame({"source": df["source"].to_numpy(),
                          "ns": c.astype(np.int64), "present": 1,
                          "s_logq": lq,
                          # carry Σ(c+k)·log2(c+k) and Σ(c+k)·log2 q
                          "s_c_sq": (c + k) * np.log2(c + k),
                          "s_c": (c + k) * lq})
        return g.groupby("source", sort=False, as_index=False).sum()

    agg = grouped_aggregate(
        sw.map_batches(partial, batch_format="pandas", batch_size=8192),
        ["source"], {"ns": ("ns", "sum"), "present": ("present", "sum"),
                     "s_logq": ("s_logq", "sum"),
                     "s_c_sq": ("s_c_sq", "sum"),
                     "s_c": ("s_c", "sum")},
        num_partitions=num_partitions).to_pandas()

    ns = agg["ns"].to_numpy(np.float64)
    denom = ns + k * V
    # present mass: Σ p·log2(p/q) with p=(c+k)/denom:
    #   (1/denom)·[Σ(c+k)log2(c+k) − Σ(c+k)log2 denom − Σ(c+k)log2 q]
    cpk = agg["s_c"].to_numpy(np.float64)          # Σ(c+k)·log2 q
    csq = agg["s_c_sq"].to_numpy(np.float64)       # Σ(c+k)·log2(c+k)
    present = agg["present"].to_numpy(np.float64)
    sum_cpk = ns + k * present                     # Σ(c+k) present
    present_mass = (csq - sum_cpk * np.log2(denom) - cpk) / denom
    # missing mass: M words at p0=k/denom each
    M = V - present
    p0 = k / denom
    s_present_logq = agg["s_logq"].to_numpy(np.float64)
    missing_mass = p0 * (M * np.log2(p0) - (S_all - s_present_logq))
    out = pd.DataFrame({"source": agg["source"],
                        "kl_bits": (present_mass
                                    + missing_mass).round(6)})
    return out.sort_values("source").reset_index(drop=True)


def feature_hash(ds, *, n_buckets: int = 32, text_col: str = "text",
                 id_col: str = "doc_id"):
    """Hashing-trick featurization (Weinberger et al. '09): every word
    occurrence lands in ``md5(word) % n_buckets`` with a ±1 sign drawn
    from an independent md5 bit, summed per (doc, bucket) — fixed-width
    sparse features with no vocabulary pass and no shuffle (each doc's
    row is complete inside its batch). Emits only nonzero buckets as
    long-form (doc, bucket, feat) rows.

    md5-derived hash and sign mean a SQL oracle can replay the exact
    same buckets/signs (``util.md5_hash64`` ≡ DuckDB
    ``CAST('0x'||substr(md5(w),1,16) AS UBIGINT)``); signs use bit 8 so
    they are independent of the bucket bits for small ``n_buckets``.

    Engine extension (SURVEY.md §2.8 adjacency): the featurizer that
    feeds ``doc_quality_logreg``-style models at corpus scale."""
    from jerex_ray.util import md5_hash64_batch

    def per_batch(batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({id_col: pd.Series(dtype="int64"),
                              "bucket": pd.Series(dtype="int64"),
                              "feat": pd.Series(dtype="int64")})
        if batch.empty:
            return empty
        words = batch[text_col].fillna("").str.lower().str.split()
        lens = words.str.len().fillna(0).astype(int).to_numpy()
        if lens.sum() == 0:
            return empty
        flat = np.concatenate([w for w in words if len(w)])
        doc = np.repeat(batch[id_col].to_numpy(np.int64), lens)
        h = md5_hash64_batch(flat).astype(np.uint64)
        bucket = (h % np.uint64(n_buckets)).astype(np.int64)
        sign = np.where((h >> np.uint64(8)) % np.uint64(2) == 1, 1, -1) \
            .astype(np.int64)
        df = pd.DataFrame({id_col: doc, "bucket": bucket, "sign": sign})
        agg = df.groupby([id_col, "bucket"], as_index=False)["sign"].sum()
        agg = agg[agg["sign"] != 0]
        return pd.DataFrame({id_col: agg[id_col].to_numpy(),
                             "bucket": agg["bucket"].to_numpy(),
                             "feat": agg["sign"].to_numpy()})

    return ds.map_batches(per_batch, batch_format="pandas")
