"""Distributed BPE tokenizer training and application.

Algorithm: Sennrich, Haddow & Birch 2016, "Neural Machine Translation
of Rare Words with Subword Units" (ACL) — greedy byte-pair merges over
a word-frequency table; the openai/GPT-2 encode convention (each
selected pair is merged at ALL its non-overlapping occurrences,
scanning left to right) on the apply side.

Dataflow shape (what distributes and what deliberately doesn't):

* **Word-frequency counting is the corpus-wide stage** — a combiner
  aggregate (per-batch ``value_counts`` partials → hash-shuffled
  group sum), identical in shape to ``textstats.build_vocab``. This
  is the only pass that touches every corpus byte; its output is
  bounded by DISTINCT-word count (~1e7 for natural language),
  independent of corpus size — the same reduction every production
  tokenizer trainer performs before the merge loop.
* **The greedy merge loop runs on the driver** over that
  vocabulary-bounded table. It is inherently sequential (merge *k*
  depends on the pair statistics AFTER merge *k−1*), so there is
  nothing to distribute; the incremental-update implementation below
  touches only words containing the merged pair per round.
* **Encoding is a broadcast-apply actor stage**: the learned merge
  ranks are built once per actor in ``__init__`` and each batch is
  encoded through a per-actor word→tokens memo (words repeat; unique
  words per actor are vocabulary-bounded).

No end-of-word marker is used: merges never cross word boundaries in
either convention, and an in-word-only model keeps the first-round
pair statistics SQL-expressible (oracled via char-position self-pairs
in DuckDB). Documented divergence from Sennrich's ``</w>`` symbol.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_SEP = "\x00"  # never appears in words; guards cross-word pairs


def word_freqs(docs_ds, *, num_partitions: int | None = None):
    """Distributed word-frequency table over ``text`` (lowercased,
    whitespace-split). Returns a Dataset[word, freq] — the bounded
    input to the merge loop. Combiner shape: per-batch value_counts →
    grouped sum (shuffle carries distinct words per block only)."""
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

    return grouped_aggregate(
        docs_ds.map_batches(explode, batch_format="pandas",
                            batch_size=8192),
        ["word"], {"freq": ("c", "sum")}, num_partitions=num_partitions)


def _pair_partial(batch: pd.DataFrame) -> pd.DataFrame:
    """Vectorized adjacent-char pair counts, frequency-weighted, for a
    block of the word-frequency table. No per-word Python loop: the
    block's words are joined with a NUL separator, decoded to a uint32
    codepoint array, and pairs fall out of two shifted views."""
    empty = pd.DataFrame({"a": pd.Series(dtype="object"),
                          "b": pd.Series(dtype="object"),
                          "c": pd.Series(dtype="int64")})
    if not len(batch):
        return empty
    ws = batch["word"].astype(str).to_numpy()
    fs = batch["freq"].to_numpy(np.int64)
    joined = _SEP.join(ws)
    codes = np.frombuffer(joined.encode("utf-32-le"), dtype="<u4")
    if len(codes) < 2:
        return empty
    left, right = codes[:-1], codes[1:]
    mask = (left != 0) & (right != 0)
    if not mask.any():
        return empty
    # word index of each position = number of separators before it
    wid = np.cumsum(codes == 0)
    w_of_pair = wid[:-1][mask]
    key = (left[mask].astype(np.uint64) << np.uint64(32)) \
        | right[mask].astype(np.uint64)
    uk, inv = np.unique(key, return_inverse=True)
    sums = np.zeros(len(uk), dtype=np.int64)
    np.add.at(sums, inv, fs[w_of_pair])
    return pd.DataFrame({
        "a": [chr(int(k >> np.uint64(32))) for k in uk],
        "b": [chr(int(k & np.uint64(0xFFFFFFFF))) for k in uk],
        "c": sums})


def pair_counts(docs_ds, *, num_partitions: int | None = None) -> pd.DataFrame:
    """First-merge-round BPE pair statistics, fully distributed:
    word_freqs → per-block vectorized char-pair partials → grouped
    sum. Exactly the table the merge loop consults in round 1 (and
    the SQL-oracled surface of the trainer)."""
    from jerex_ray.functions.aggregate import grouped_aggregate

    wf = word_freqs(docs_ds, num_partitions=num_partitions)
    parts = wf.map_batches(_pair_partial, batch_format="pandas",
                           batch_size=8192)
    out = grouped_aggregate(parts, ["a", "b"], {"cnt": ("c", "sum")},
                            num_partitions=num_partitions).to_pandas()
    if out.empty or "a" not in out.columns:
        return pd.DataFrame({"a": pd.Series(dtype="object"),
                             "b": pd.Series(dtype="object"),
                             "cnt": pd.Series(dtype="int64")})
    out["cnt"] = out["cnt"].astype("int64")
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def train_bpe(wordfreq: pd.DataFrame, *, num_merges: int,
              min_freq: int = 2) -> pd.DataFrame:
    """Greedy BPE merge learning over a (word, freq) table.

    Deterministic tie-break: highest pair frequency, then (left,
    right) lexicographic. Stops early when the best remaining pair's
    frequency drops below ``min_freq``. Incremental statistics: each
    round touches only the words that contain the merged pair (a
    pair→word-index inverted map), the standard Sennrich-trainer
    optimization — full recounts never happen after initialization.

    Returns DataFrame[rank, left, right, freq] (freq = the pair's
    corpus frequency at the moment it was chosen)."""
    words: list[list[str]] = [list(w) for w in
                              wordfreq["word"].astype(str).to_numpy()]
    freqs = wordfreq["freq"].to_numpy(np.int64)

    stats: dict[tuple[str, str], int] = {}
    index: dict[tuple[str, str], set[int]] = {}

    def add_word(wi: int, sign: int) -> None:
        syms, f = words[wi], int(freqs[wi])
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            stats[p] = stats.get(p, 0) + sign * f
            if sign > 0:
                index.setdefault(p, set()).add(wi)

    for wi in range(len(words)):
        add_word(wi, +1)

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(num_merges):
        best_pair, best_freq = None, 0
        for p, f in stats.items():
            if f > best_freq or (f == best_freq and best_pair is not None
                                 and p < best_pair):
                best_pair, best_freq = p, f
        if best_pair is None or best_freq < min_freq:
            break
        a, b = best_pair
        merged = a + b
        for wi in sorted(index.get(best_pair, ())):
            syms = words[wi]
            if len(syms) < 2:
                continue
            add_word(wi, -1)
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                if p in index:
                    index[p].discard(wi)
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[wi] = out
            add_word(wi, +1)
        stats = {p: f for p, f in stats.items() if f > 0}
        merges.append((rank, a, b, int(best_freq)))

    return pd.DataFrame(merges, columns=["rank", "left", "right", "freq"]) \
        .astype({"rank": "int64", "freq": "int64"})


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode one word with learned merge ranks: repeatedly merge the
    LOWEST-rank adjacent pair present, replacing all its
    non-overlapping occurrences left-to-right (GPT-2 convention)."""
    syms = list(word)
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        a, b = syms[best_i], syms[best_i + 1]
        out, i = [], 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


class BPEEncoder:
    """Actor-pool encode stage: merge ranks built once per actor,
    per-actor word→tokens memo (unique words are vocabulary-bounded).
    Emits per-doc token statistics."""

    def __init__(self, merges: list[tuple[str, str]]):
        self.ranks = {(a, b): r for r, (a, b) in enumerate(merges)}
        self.memo: dict[str, list[str]] = {}

    def _tok(self, word: str) -> list[str]:
        got = self.memo.get(word)
        if got is None:
            got = encode_word(word, self.ranks)
            self.memo[word] = got
        return got

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        words = batch["text"].fillna("").str.lower().str.split()
        n_words = np.empty(len(batch), dtype=np.int64)
        n_tokens = np.empty(len(batch), dtype=np.int64)
        n_distinct = np.empty(len(batch), dtype=np.int64)
        for i, ws in enumerate(words.to_numpy()):
            ws = ws or []
            toks_per = [self._tok(w) for w in ws]
            n_words[i] = len(ws)
            n_tokens[i] = sum(len(t) for t in toks_per)
            n_distinct[i] = len({t for ts in toks_per for t in ts})
        return pd.DataFrame({"doc_id": batch["doc_id"].to_numpy(),
                             "n_words": n_words, "n_tokens": n_tokens,
                             "n_distinct_tokens": n_distinct})


def apply_bpe(docs_ds, merges_df: pd.DataFrame, *, concurrency: int = 4):
    """Broadcast-apply the learned merges: the merge list rides the
    actor constructor (shipped once per actor, not per batch)."""
    merges = list(zip(merges_df["left"].astype(str),
                      merges_df["right"].astype(str)))
    return docs_ds.map_batches(BPEEncoder, fn_constructor_args=(merges,),
                               batch_format="pandas", batch_size=2048,
                               concurrency=concurrency)
