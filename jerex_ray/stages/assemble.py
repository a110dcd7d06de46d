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
import pyarrow.compute as pc

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


def assemble_documents(ds, *, num_partitions: int | None = None,
                       shuffle_blocks: int | None = None,
                       locality: str = "shuffle",
                       max_cross_broadcast: int = 500_000):
    """transcripts Dataset → documents Dataset (one row per conv).

    ``num_partitions`` sets the persistent output ``part_key`` used for
    the triple sink / lineage manifests. ``shuffle_blocks`` controls the
    hash-repartition width (defaults to the current block count).

    ``locality``:
      - ``"shuffle"`` (default): hash-repartition every turn on
        ``conv_id`` — correct for any input layout.
      - ``"auto"``: locality-aware assembly. Transcript tables are
        normally written conversation-contiguous, so most convs live
        wholly inside one input block; only block-BOUNDARY convs need
        co-location. A metadata-sized spans pass (one row per
        (block, conv), conv_id column only) finds convs spanning >1
        block; those route through the classic hash shuffle (a
        boundary-sized trickle on contiguous layout — ~2 convs per
        block), everything else assembles block-locally with zero
        all-to-all. At 100 TB this turns the pipeline's largest
        shuffle into a near-no-op whenever the storage layout
        cooperates, and degrades safely when it doesn't: if more than
        ``max_cross_broadcast`` convs are cross-block (interleaved /
        shuffled layout) the function falls back to the full-shuffle
        path. Requires re-traversable input (a lazy Dataset plan —
        parquet read or deterministic generator): the input is
        consumed twice (spans + assemble) plus a filtered third pass
        for the boundary convs.
    """
    from jerex_ray.runtime import shuffle_partitions
    nblocks = shuffle_blocks or shuffle_partitions()
    if locality == "auto":
        cross = _cross_block_convs(ds)
        if cross is None or len(cross) > max_cross_broadcast:
            cross = None  # fall back to the always-correct full shuffle
        else:
            return _assemble_locality(ds, cross,
                                      num_partitions=num_partitions,
                                      shuffle_blocks=nblocks)
    if num_partitions is not None:
        ds = ds.map_batches(
            add_part_key, batch_format="pyarrow",
            fn_kwargs={"num_partitions": num_partitions})
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


def _cross_block_convs(ds):
    """conv_ids that appear in more than one input block.

    One conv_id-only traversal (projection pushed to the read for
    parquet sources) emitting ONE row per distinct conv per block —
    metadata-sized — then a combiner groupby; only the >1 slice is
    collected (boundary-sized on contiguous layout). Returns a
    frozenset, or None if the detected cross set is so large the
    caller should fall back (checked against the Dataset count before
    collecting rows to the driver)."""
    import pandas as pd

    from jerex_ray.functions.aggregate import grouped_aggregate

    def spans(t: pa.Table):
        if t.num_rows == 0:
            return pa.table({"conv_id": pa.array([], pa.string()),
                             "p": pa.array([], pa.int64())})
        uniq = pc.unique(t["conv_id"])
        return pa.table({"conv_id": uniq,
                         "p": pa.array(np.ones(len(uniq), np.int64))})

    agg = grouped_aggregate(
        ds.select_columns(["conv_id"])
          .map_batches(spans, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True),
        ["conv_id"], {"n_blocks": ("p", "sum")})
    cross = agg.map_batches(
        lambda df: df.loc[df["n_blocks"] > 1, ["conv_id"]]
        if "n_blocks" in df.columns
        else pd.DataFrame({"conv_id": pd.Series(dtype="object")}),
        batch_format="pandas").materialize()
    if cross.count() > 2_000_000:  # never collect an unbounded set
        return None
    pdf = cross.to_pandas()
    if "conv_id" not in pdf.columns:  # all-empty collects schema-less
        return np.asarray([], dtype=object)
    # sorted array, not a set: batch filters use vectorized np.isin
    return np.sort(pdf["conv_id"].to_numpy(dtype=object))


def _assemble_block_local(t: pa.Table, cross_ref, num_partitions):
    """Assemble every conv in this block EXCEPT the broadcast
    cross-block set, with a completeness guard: a locally-assembled
    conv must hold its full 0..n-1 turn range (the transcript data
    model); a hole means the input plan re-traversed with different
    block boundaries — raise rather than emit a partial document."""
    import ray
    cross = ray.get(cross_ref)
    if t.num_rows:
        conv = t["conv_id"].to_numpy(zero_copy_only=False)
        keep = (~np.isin(conv, cross) if len(cross)
                else np.ones(len(conv), bool))
        t = t.filter(pa.array(keep))
    if num_partitions is not None:
        t = add_part_key(t, num_partitions)
    for sub in _assemble_block(t):
        if sub.num_rows == 0:
            yield sub
            continue
        # full contiguity check: each conv's sorted turn_idx == 0..n-1
        ti = sub["turn_idx"]
        lens = pc.list_value_length(ti).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        flat = pc.list_flatten(ti).to_numpy(zero_copy_only=False)
        starts = np.cumsum(lens) - lens
        expect = np.arange(len(flat)) - np.repeat(starts, lens)
        mism = flat != expect
        bad = np.logical_or.reduceat(mism, starts) if len(flat) else \
            np.zeros(sub.num_rows, bool)
        if bad.any():
            raise ValueError(
                "locality-aware assembly saw an incomplete local conv "
                f"{sub['doc_id'].to_pylist()[int(np.flatnonzero(bad)[0])]!r}"
                " — input plan is not stably re-traversable; use "
                "locality='shuffle'")
        yield sub


def _assemble_locality(ds, cross: np.ndarray, *, num_partitions,
                       shuffle_blocks):
    import ray
    cross_ref = ray.put(cross)
    local_docs = ds.map_batches(
        _assemble_block_local, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True, num_cpus=0.99,
        fn_kwargs={"cross_ref": cross_ref,
                   "num_partitions": num_partitions})
    if len(cross) == 0:
        return local_docs

    def keep_cross(t: pa.Table) -> pa.Table:
        c = ray.get(cross_ref)
        conv = t["conv_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(np.isin(conv, c)))

    boundary = ds.map_batches(keep_cross, batch_format="pyarrow",
                              batch_size=None, zero_copy_batch=True)
    cross_docs = assemble_documents(
        boundary, num_partitions=num_partitions,
        shuffle_blocks=min(shuffle_blocks, max(1, len(cross) // 50 + 1)),
        locality="shuffle")
    return local_docs.union(cross_docs)
