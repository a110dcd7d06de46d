"""Tokenization + sub-word encoding + 700-sub-word chunking.

Mirrors the reference's sentence/token parser
(``/root/reference/jerex/datasets.py:81-108``): each whitespace word is
encoded to one-or-more sub-word ids with running offsets
(``span_start/span_end`` sub-word coordinates, end-exclusive, as in
``entities.py:97-98``), with the ``[UNK]`` fallback for empty
encodings. The sandbox has no HF tokenizer, so the sub-word encoder is
a frozen deterministic one: lowercase the word, split into ≤8-char
pieces, id = stable hash of the piece. A real ``BertTokenizerFast``
drops in behind the same actor interface (swap ``_encode_word``).

This is a stateful actor-pool stage (`map_batches(TokenizeDocs,
concurrency=N)`): the word→sub-word memo cache lives in the actor and
amortizes across batches (Zipfian token distributions make the cache
hit rate very high at scale).

Execution: the batch is tokenized VECTORIZED — Arrow
``utf8_split_whitespace`` for word splitting, ``np.unique`` so each
distinct word in the batch is encoded once, cumulative-sum arithmetic
for every offset column, Arrow ListArray construction from offsets.
Only documents that exceed the 700-sub-word ceiling drop to the
per-document chunking path.

Chunking policy (ours; the reference hard-caps documents at 700
sub-word positions via extended position embeddings,
``models/__init__.py:57-67``): a conversation whose encoding exceeds
``context_size`` is split at turn boundaries into chunks of ≤700
sub-words; ``doc_id`` becomes ``conv_id#<k>``. A single oversized turn
becomes its own chunk (the scorer drops spans past the ceiling).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from jerex_ray.config import PipelineConfig
from jerex_ray.util import stable_hash32

UNK_ID = 1
_VOCAB_SIZE = 120_000
_PIECE_LEN = 8


def _encode_word(word: str) -> list[int]:
    """Frozen deterministic sub-word encoding (stands in for
    ``tokenizer.encode(word, add_special_tokens=False)``)."""
    w = word.lower()
    if not w:
        return [UNK_ID]  # [UNK] fallback, datasets.py:94-95
    pieces = [w[i:i + _PIECE_LEN] for i in range(0, len(w), _PIECE_LEN)]
    return [2 + stable_hash32(p) % _VOCAB_SIZE for p in pieces]


_OUT_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("conv_id", pa.string()),
    ("part_key", pa.int32()),
    ("chunk_idx", pa.int32()),
    ("turn_idx", pa.list_(pa.int32())),
    ("role", pa.list_(pa.string())),
    ("text", pa.list_(pa.string())),
    ("tool", pa.list_(pa.string())),
    ("ts", pa.list_(pa.timestamp("us"))),
    ("tok_phrase", pa.list_(pa.string())),
    ("tok_sent", pa.list_(pa.int32())),
    ("tok_sub_start", pa.list_(pa.int32())),
    ("tok_sub_end", pa.list_(pa.int32())),
    ("sent_tok_off", pa.list_(pa.int32())),
    ("encoding", pa.list_(pa.int32())),
    ("n_subwords", pa.int32()),
])


def _empty_tokenized_table() -> pa.Table:
    return _OUT_SCHEMA.empty_table()


class TokenizeDocs:
    """Actor-pool UDF: assembled docs → tokenized (and chunked) docs."""

    def __init__(self, config: PipelineConfig | None = None):
        self.config = config or PipelineConfig()
        # word → (np int32 ids); bounded so a pathological vocabulary
        # can't OOM the actor
        self._memo: dict[str, np.ndarray] = {}

    def _encode_unique(self, uniq: np.ndarray) -> list[np.ndarray]:
        memo = self._memo
        out = []
        for w in uniq.tolist():
            ids = memo.get(w)
            if ids is None:
                ids = np.asarray(_encode_word(w), dtype=np.int32)
                if len(memo) < 2_000_000:
                    memo[w] = ids
            out.append(ids)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_tokenized_table()
        cfg = self.config
        batch = batch.combine_chunks()

        def _cc(a):
            return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a

        text_col = _cc(batch["text"])
        n_turns = pc.list_value_length(text_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        turn_doc_off = np.concatenate(([0], np.cumsum(n_turns)))
        flat_turns = _cc(pc.list_flatten(text_col))
        tok_lists = _cc(pc.utf8_split_whitespace(flat_turns))
        tok_per_turn = pc.list_value_length(tok_lists).to_numpy(
            zero_copy_only=False).astype(np.int64)
        tokens_np = tok_lists.flatten().to_numpy(zero_copy_only=False)

        if len(tokens_np):
            uniq, inv = np.unique(tokens_np, return_inverse=True)
            uniq_ids = self._encode_unique(uniq)
            uniq_cnt = np.fromiter((len(a) for a in uniq_ids),
                                   dtype=np.int64, count=len(uniq_ids))
            subcnt = uniq_cnt[inv]                # subwords per token
        else:
            inv = np.empty(0, np.int64)
            uniq_ids = []
            subcnt = np.empty(0, np.int64)

        # cumulative structures
        tok_cum = np.concatenate(([0], np.cumsum(tok_per_turn)))   # per turn
        sub_cum = np.concatenate(([0], np.cumsum(subcnt)))         # per token
        # tokens / subwords per doc
        doc_tok_off = tok_cum[turn_doc_off]                        # (n_docs+1)
        doc_sub_off = sub_cum[doc_tok_off]
        doc_subwords = np.diff(doc_sub_off)

        small = doc_subwords <= cfg.context_size
        parts = []
        if small.any():
            parts.append(self._fast_path(
                batch, small, n_turns, turn_doc_off, tok_per_turn, tok_cum,
                tokens_np, inv, uniq_ids, subcnt, sub_cum, doc_tok_off,
                doc_sub_off))
        if (~small).any():
            parts.append(self._chunked_path(batch, np.flatnonzero(~small)))
        return pa.concat_tables(parts) if parts else _empty_tokenized_table()

    # ---- vectorized path for docs within the sub-word ceiling ----

    def _fast_path(self, batch, small, n_turns, turn_doc_off, tok_per_turn,
                   tok_cum, tokens_np, inv, uniq_ids, subcnt, sub_cum,
                   doc_tok_off, doc_sub_off) -> pa.Table:
        n_docs = batch.num_rows
        doc_idx = np.flatnonzero(small)

        # per-token doc index (over ALL docs), then mask to small docs
        tokens_per_doc = np.diff(doc_tok_off)
        token_doc = np.repeat(np.arange(n_docs), tokens_per_doc)
        tok_mask = small[token_doc]

        # token-level columns (global, then masked)
        tok_sub_end_g = sub_cum[1:]
        tok_sub_start_g = sub_cum[:-1]
        doc_sub_base = np.repeat(doc_sub_off[:-1], tokens_per_doc)
        tok_sub_start = (tok_sub_start_g - doc_sub_base)[tok_mask]
        tok_sub_end = (tok_sub_end_g - doc_sub_base)[tok_mask]

        # sentence (turn ordinal within doc) per token
        turn_doc = np.repeat(np.arange(n_docs), n_turns)
        turn_ord = np.arange(len(tok_per_turn)) - turn_doc_off[turn_doc]
        tok_sent = np.repeat(turn_ord, tok_per_turn)[tok_mask]

        # list offsets for the small-doc token columns
        small_tok_counts = tokens_per_doc[doc_idx]
        tok_offs = np.concatenate(
            ([0], np.cumsum(small_tok_counts))).astype(np.int32)

        tok_phrase_vals = pa.array(tokens_np[tok_mask], pa.string())

        # encoding: concatenate per-token id arrays for masked tokens
        if len(inv):
            masked_inv = inv[tok_mask]
            if len(masked_inv):
                enc_vals = np.concatenate(
                    list(map(uniq_ids.__getitem__, masked_inv)))
            else:
                enc_vals = np.empty(0, np.int32)
        else:
            enc_vals = np.empty(0, np.int32)
        small_sub_counts = (doc_sub_off[1:] - doc_sub_off[:-1])[doc_idx]
        enc_offs = np.concatenate(
            ([0], np.cumsum(small_sub_counts))).astype(np.int32)

        # sent_tok_off per doc: [0, c1, c1+c2, ...] (n_turns+1 values)
        sto_vals_parts = []
        for d in doc_idx.tolist():
            a, b = turn_doc_off[d], turn_doc_off[d + 1]
            sto_vals_parts.append(tok_cum[a:b + 1] - tok_cum[a])
        sto_vals = (np.concatenate(sto_vals_parts)
                    if sto_vals_parts else np.empty(0, np.int64))
        sto_offs = np.concatenate(
            ([0], np.cumsum(n_turns[doc_idx] + 1))).astype(np.int32)

        take = pa.array(doc_idx)

        def lst(vals, offs, typ):
            return pa.ListArray.from_arrays(
                pa.array(offs, pa.int32()),
                pa.array(np.asarray(vals, dtype=typ)))

        return pa.table({
            "doc_id": batch["doc_id"].take(take),
            "conv_id": batch["doc_id"].take(take),
            "part_key": batch["part_key"].take(take).cast(pa.int32()),
            "chunk_idx": pa.array(np.zeros(len(doc_idx), np.int32)),
            "turn_idx": batch["turn_idx"].take(take),
            "role": batch["role"].take(take),
            "text": batch["text"].take(take),
            "tool": batch["tool"].take(take),
            "ts": batch["ts"].take(take),
            "tok_phrase": pa.ListArray.from_arrays(
                pa.array(tok_offs, pa.int32()), tok_phrase_vals),
            "tok_sent": lst(tok_sent, tok_offs, np.int32),
            "tok_sub_start": lst(tok_sub_start, tok_offs, np.int32),
            "tok_sub_end": lst(tok_sub_end, tok_offs, np.int32),
            "sent_tok_off": lst(sto_vals, sto_offs, np.int32),
            "encoding": lst(enc_vals, enc_offs, np.int32),
            "n_subwords": pa.array(small_sub_counts.astype(np.int32)),
        }, schema=_OUT_SCHEMA)

    # ---- per-doc path for docs that need chunking ----

    def _chunked_path(self, batch: pa.Table, doc_idx: np.ndarray) -> pa.Table:
        cfg = self.config
        out = {k: [] for k in _OUT_SCHEMA.names}

        sub = batch.take(pa.array(doc_idx))
        doc_ids = sub["doc_id"].to_pylist()
        part_keys = sub["part_key"].to_pylist()
        turn_lists = sub["turn_idx"].to_pylist()
        role_lists = sub["role"].to_pylist()
        text_lists = sub["text"].to_pylist()
        tool_lists = sub["tool"].to_pylist()
        ts_lists = sub["ts"].to_pylist()

        for d in range(len(doc_ids)):
            texts = text_lists[d]
            turn_tok_phrases = [t.split() for t in texts]
            turn_encodings, turn_tok_subcounts, turn_subword_counts = [], [], []
            for toks in turn_tok_phrases:
                enc, subcounts = [], []
                for w in toks:
                    ids = self._memo.get(w)
                    if ids is None:
                        ids = np.asarray(_encode_word(w), dtype=np.int32)
                        if len(self._memo) < 2_000_000:
                            self._memo[w] = ids
                    enc.extend(ids.tolist())
                    subcounts.append(len(ids))
                turn_encodings.append(enc)
                turn_tok_subcounts.append(subcounts)
                turn_subword_counts.append(len(enc))

            chunks: list[list[int]] = [[]]
            acc = 0
            for ti, n_sub in enumerate(turn_subword_counts):
                if chunks[-1] and acc + n_sub > cfg.context_size:
                    chunks.append([])
                    acc = 0
                chunks[-1].append(ti)
                acc += n_sub
            multi = len(chunks) > 1

            for k, turn_sel in enumerate(chunks):
                doc_id = f"{doc_ids[d]}#{k}" if multi else doc_ids[d]
                tok_phrase, tok_sent, tok_ss, tok_se = [], [], [], []
                sent_off = [0]
                encoding = []
                pos = 0
                for local_sidx, ti in enumerate(turn_sel):
                    for w, c in zip(turn_tok_phrases[ti],
                                    turn_tok_subcounts[ti]):
                        tok_phrase.append(w)
                        tok_sent.append(local_sidx)
                        tok_ss.append(pos)
                        tok_se.append(pos + c)
                        pos += c
                    encoding.extend(turn_encodings[ti])
                    sent_off.append(len(tok_phrase))

                out["doc_id"].append(doc_id)
                out["conv_id"].append(doc_ids[d])
                out["part_key"].append(int(part_keys[d]))
                out["chunk_idx"].append(k)
                out["turn_idx"].append([turn_lists[d][ti] for ti in turn_sel])
                out["role"].append([role_lists[d][ti] for ti in turn_sel])
                out["text"].append([texts[ti] for ti in turn_sel])
                out["tool"].append([tool_lists[d][ti] for ti in turn_sel])
                out["ts"].append([ts_lists[d][ti] for ti in turn_sel])
                out["tok_phrase"].append(tok_phrase)
                out["tok_sent"].append(tok_sent)
                out["tok_sub_start"].append(tok_ss)
                out["tok_sub_end"].append(tok_se)
                out["sent_tok_off"].append(sent_off)
                out["encoding"].append(encoding)
                out["n_subwords"].append(len(encoding))

        return pa.table(
            {name: pa.array(out[name], _OUT_SCHEMA.field(name).type)
             for name in _OUT_SCHEMA.names}, schema=_OUT_SCHEMA)


def tokenize_documents(ds, config: PipelineConfig | None = None, *,
                       concurrency=None, batch_size: int = 64):
    """documents Dataset → tokenized/chunked documents Dataset."""
    from jerex_ray.runtime import pool_concurrency
    cfg = config or PipelineConfig()
    return ds.map_batches(
        TokenizeDocs, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency or pool_concurrency(cfg.actor_num_cpus,
                                                    cpu_fraction=0.2),
        num_cpus=cfg.actor_num_cpus,
        fn_constructor_kwargs={"config": cfg})