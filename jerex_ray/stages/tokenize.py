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


class TokenizeDocs:
    """Actor-pool UDF: assembled docs → tokenized (and chunked) docs."""

    def __init__(self, config: PipelineConfig | None = None):
        self.config = config or PipelineConfig()
        self._memo: dict[str, list[int]] = {}

    def _encode_cached(self, word: str) -> list[int]:
        ids = self._memo.get(word)
        if ids is None:
            ids = _encode_word(word)
            # bound the cache so a pathological vocabulary can't OOM the actor
            if len(self._memo) < 2_000_000:
                self._memo[word] = ids
        return ids

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_tokenized_table()
        cfg = self.config
        out = {k: [] for k in (
            "doc_id", "conv_id", "part_key", "chunk_idx",
            "turn_idx", "role", "text", "tool", "ts",
            "tok_phrase", "tok_sent", "tok_sub_start", "tok_sub_end",
            "sent_tok_off", "encoding", "n_subwords")}

        doc_ids = batch["doc_id"].to_pylist()
        part_keys = batch["part_key"].to_numpy(zero_copy_only=False)
        turn_lists = batch["turn_idx"].to_pylist()
        role_lists = batch["role"].to_pylist()
        text_lists = batch["text"].to_pylist()
        tool_lists = batch["tool"].to_pylist()
        ts_lists = batch["ts"].to_pylist()

        for d in range(batch.num_rows):
            texts = text_lists[d]
            # per-turn tokenization + encoding with running offsets
            turn_tok_phrases: list[list[str]] = [t.split() for t in texts]
            turn_subword_counts = []
            turn_encodings = []
            turn_tok_subcounts = []  # per-token subword count, per turn
            for toks in turn_tok_phrases:
                enc = []
                subcounts = []
                for w in toks:
                    ids = self._encode_cached(w)
                    enc.extend(ids)
                    subcounts.append(len(ids))
                turn_encodings.append(enc)
                turn_tok_subcounts.append(subcounts)
                turn_subword_counts.append(len(enc))

            # greedy chunking at turn boundaries
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
                sub_base = 0
                for local_sidx, ti in enumerate(turn_sel):
                    toks = turn_tok_phrases[ti]
                    subcounts = turn_tok_subcounts[ti]
                    pos = sub_base
                    for w, c in zip(toks, subcounts):
                        tok_phrase.append(w)
                        tok_sent.append(local_sidx)
                        tok_ss.append(pos)
                        tok_se.append(pos + c)
                        pos += c
                    encoding.extend(turn_encodings[ti])
                    sub_base = pos
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

        return pa.table({
            "doc_id": pa.array(out["doc_id"], pa.string()),
            "conv_id": pa.array(out["conv_id"], pa.string()),
            "part_key": pa.array(out["part_key"], pa.int32()),
            "chunk_idx": pa.array(out["chunk_idx"], pa.int32()),
            "turn_idx": pa.array(out["turn_idx"], pa.list_(pa.int32())),
            "role": pa.array(out["role"], pa.list_(pa.string())),
            "text": pa.array(out["text"], pa.list_(pa.string())),
            "tool": pa.array(out["tool"], pa.list_(pa.string())),
            "ts": pa.array(out["ts"], pa.list_(pa.timestamp("us"))),
            "tok_phrase": pa.array(out["tok_phrase"], pa.list_(pa.string())),
            "tok_sent": pa.array(out["tok_sent"], pa.list_(pa.int32())),
            "tok_sub_start": pa.array(out["tok_sub_start"], pa.list_(pa.int32())),
            "tok_sub_end": pa.array(out["tok_sub_end"], pa.list_(pa.int32())),
            "sent_tok_off": pa.array(out["sent_tok_off"], pa.list_(pa.int32())),
            "encoding": pa.array(out["encoding"], pa.list_(pa.int32())),
            "n_subwords": pa.array(out["n_subwords"], pa.int32()),
        })


def _empty_tokenized_table() -> pa.Table:
    return pa.table({
        "doc_id": pa.array([], pa.string()),
        "conv_id": pa.array([], pa.string()),
        "part_key": pa.array([], pa.int32()),
        "chunk_idx": pa.array([], pa.int32()),
        "turn_idx": pa.array([], pa.list_(pa.int32())),
        "role": pa.array([], pa.list_(pa.string())),
        "text": pa.array([], pa.list_(pa.string())),
        "tool": pa.array([], pa.list_(pa.string())),
        "ts": pa.array([], pa.list_(pa.timestamp("us"))),
        "tok_phrase": pa.array([], pa.list_(pa.string())),
        "tok_sent": pa.array([], pa.list_(pa.int32())),
        "tok_sub_start": pa.array([], pa.list_(pa.int32())),
        "tok_sub_end": pa.array([], pa.list_(pa.int32())),
        "sent_tok_off": pa.array([], pa.list_(pa.int32())),
        "encoding": pa.array([], pa.list_(pa.int32())),
        "n_subwords": pa.array([], pa.int32()),
    })


def tokenize_documents(ds, config: PipelineConfig | None = None, *,
                       concurrency=None, batch_size: int = 64):
    """documents Dataset → tokenized/chunked documents Dataset."""
    cfg = config or PipelineConfig()
    return ds.map_batches(
        TokenizeDocs, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency or 4, num_cpus=cfg.actor_num_cpus,
        fn_constructor_kwargs={"config": cfg})
