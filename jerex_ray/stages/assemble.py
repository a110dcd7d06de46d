"""Document assembly: transcript rows → one row per conversation.

Ray-Data restatement of the reference's eager whole-file parse
(``/root/reference/jerex/datasets.py:57-79``): a hash repartition on
``conv_id`` co-locates each conversation's turns in one block
(shuffle #1 of SURVEY.md §4), then a single vectorized ``map_batches``
segments every block into per-conversation list rows — no per-group
Python callback, no driver-side loop.

Invariants (north rule): stable turn ordering — turns are sorted by
(turn_idx, ts) within each conversation — and per-turn text equality:
the assembled ``text`` list holds the input turn texts byte-for-byte.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from jerex_ray.util import stable_hash64


def add_part_key(batch: pa.Table, num_partitions: int) -> pa.Table:
    """Deterministic output-partition key: stable hash of conv_id.

    Computed once at ingest and reused by every downstream stage (one
    partitioning key across stages — avoids re-shuffles)."""
    conv = batch["conv_id"].to_numpy(zero_copy_only=False)
    uniq, inv = np.unique(conv, return_inverse=True)
    keys = np.fromiter(
        (stable_hash64(u) % num_partitions for u in uniq),
        dtype=np.int32, count=len(uniq))
    return batch.append_column("part_key", pa.array(keys[inv], pa.int32()))


DOCS_PER_BLOCK = 200  # assembly yields sub-blocks of this many convs so
                      # downstream actor pools get one task per sub-block
                      # (a shuffle partition as one block would cap pool
                      # parallelism at the shuffle width). 200 measured
                      # best for the heavy numpy-scorer stage: with
                      # ~500-doc blocks the longest block straggles the
                      # pool (wall 13.4s vs 8.3s on the same corpus);
                      # the rule scorer is insensitive either way


def _assemble_block(t: pa.Table):
    """Segment a conv_id-co-located block into per-conversation rows,
    yielding sub-blocks of ``DOCS_PER_BLOCK`` conversations."""
    if t.num_rows == 0:
        yield _empty_docs_table()
        return
    t = t.combine_chunks()
    conv = t["conv_id"].to_numpy(zero_copy_only=False)
    turn_idx = t["turn_idx"].to_numpy()
    ts = t["ts"].to_numpy()

    # stable order: conv_id, then turn_idx, then ts as tie-break
    codes_uniq, codes = np.unique(conv, return_inverse=True)
    order = np.lexsort((ts, turn_idx, codes))
    t = t.take(pa.array(order))
    codes = codes[order]

    # group boundaries
    boundaries = np.flatnonzero(codes[1:] != codes[:-1]) + 1
    offsets = np.concatenate(([0], boundaries, [len(codes)])).astype(np.int32)
    doc_ids = t["conv_id"].take(pa.array(offsets[:-1].astype(np.int64)))
    part_key = (t["part_key"].take(pa.array(offsets[:-1].astype(np.int64)))
                if "part_key" in t.column_names else
                pa.array(np.zeros(len(offsets) - 1, dtype=np.int32)))

    off = pa.array(offsets, pa.int32())

    def as_list(col: str) -> pa.ListArray:
        arr = t[col].combine_chunks()
        return pa.ListArray.from_arrays(off, arr)

    full = pa.table({
        "doc_id": doc_ids,
        "part_key": part_key,
        "turn_idx": as_list("turn_idx"),
        "role": as_list("role"),
        "text": as_list("text"),
        "tool": as_list("tool"),
        "ts": as_list("ts"),
    })
    for start in range(0, full.num_rows, DOCS_PER_BLOCK):
        yield full.slice(start, DOCS_PER_BLOCK)


def _empty_docs_table() -> pa.Table:
    return pa.table({
        "doc_id": pa.array([], pa.string()),
        "part_key": pa.array([], pa.int32()),
        "turn_idx": pa.array([], pa.list_(pa.int32())),
        "role": pa.array([], pa.list_(pa.string())),
        "text": pa.array([], pa.list_(pa.string())),
        "tool": pa.array([], pa.list_(pa.string())),
        "ts": pa.array([], pa.list_(pa.timestamp("us"))),
    })


def assemble_documents(ds, *, num_partitions: int | None = None, shuffle_blocks: int | None = None):
    """transcripts Dataset → documents Dataset (one row per conv).

    ``num_partitions`` sets the persistent output ``part_key`` used for
    the triple sink / lineage manifests. ``shuffle_blocks`` controls the
    hash-repartition width (defaults to the current block count)."""
    if num_partitions is not None:
        ds = ds.map_batches(
            add_part_key, batch_format="pyarrow",
            fn_kwargs={"num_partitions": num_partitions})
    from jerex_ray.runtime import shuffle_partitions
    nblocks = shuffle_blocks or shuffle_partitions()
    # sort=False: _assemble_block lexsorts within the block anyway, and
    # skipping the aggregator-side sort avoids re-sorting and a library
    # crash on empty shuffle partitions (pa sort_by on schema-less block)
    ds = ds.repartition(nblocks, keys=["conv_id"], sort=False)
    # num_cpus=0.99: a resource request distinct from downstream actor
    # pools prevents operator fusion — fused, the per-conv sub-block
    # generator collapses into the actor task and caps pool parallelism
    # at the shuffle width
    return ds.map_batches(_assemble_block, batch_format="pyarrow",
                          batch_size=None, zero_copy_batch=True,
                          num_cpus=0.99)
