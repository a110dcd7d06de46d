"""JSONL (newline-delimited JSON) transcript source & sink.

Agent-transcript corpora frequently arrive as JSONL exports (one turn
per line) rather than Parquet; this module adapts them to the graft's
authoritative input shape (BASELINE.json ``input_hint``:
conv_id/turn_idx/role/text/tool/ts) so every downstream pipeline —
``run_kg_pipeline`` first — consumes either format identically.

* ``write_transcripts_jsonl``: streams the Dataset through
  ``Dataset.write_json`` (one shard per block — resumable layout,
  never one giant file). Timestamps are serialized as ISO-8601
  microsecond strings EXPLICITLY before the write, so the on-disk
  format is engine-neutral instead of whatever epoch encoding the
  JSON writer defaults to.
* ``read_transcripts_jsonl``: ``ray.data.read_json`` (pyarrow NDJSON
  reader — distributed, file-parallel) followed by one vectorized
  cast batch that parses ts back to timestamp[us] and restores the
  canonical column order/dtypes. Round-trip equality with the
  Parquet path is pytest-gated (tests/test_stages.py).

Reference parity: jerex reads its corpora from JSON documents
(jerex/datasets.py `_parse_dataset` over types.json + documents);
this is the engine's counterpart for the transcript shape.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def write_transcripts_jsonl(ds, path: str) -> None:
    """Write a transcript Dataset as sharded JSONL under ``path``."""
    def stringify_ts(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[_COLS].copy()
        batch["ts"] = batch["ts"].astype("datetime64[us]") \
            .dt.strftime("%Y-%m-%dT%H:%M:%S.%f")
        return batch

    ds.map_batches(stringify_ts, batch_format="pandas") \
        .write_json(path)


def read_transcripts_jsonl(path: str):
    """Read sharded JSONL transcripts back into the canonical arrow
    schema (conv_id:string, turn_idx:int32, role/text/tool:string,
    ts:timestamp[us])."""
    import ray.data as rd

    def cast(batch: pd.DataFrame) -> pa.Table:
        ts = pd.to_datetime(batch["ts"], format="%Y-%m-%dT%H:%M:%S.%f") \
            .astype("datetime64[us]")
        return pa.table({
            "conv_id": pa.array(batch["conv_id"].astype(str), pa.string()),
            "turn_idx": pa.array(
                batch["turn_idx"].to_numpy(np.int64), pa.int32()),
            "role": pa.array(batch["role"].astype(str), pa.string()),
            "text": pa.array(batch["text"].astype(str), pa.string()),
            "tool": pa.array(batch["tool"].astype(str), pa.string()),
            "ts": pa.array(ts, pa.timestamp("us")),
        })

    return rd.read_json(path).map_batches(cast, batch_format="pandas")
