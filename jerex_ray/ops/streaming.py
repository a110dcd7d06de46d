"""Streaming-window semantics over a Dataset: per-shard watermarks,
allowed lateness, and a late-data side channel.

A batch engine replays a stream by processing events in ARRIVAL order;
a streaming engine (Flink/Beam model) must then decide, per event,
whether its window already closed. This module implements that
decision Ray-Data-first:

* The stream is **sharded** (``id % n_shards``), mirroring a
  partitioned log (Kafka): each shard carries its own watermark —
  watermarks are never global, exactly as in a real deployment where
  one slow partition must not hold back (or mark late) the others.
* Within a shard, events are processed in arrival order; the
  **watermark** after processing a prefix is ``max(event ts seen) −
  allowed_lateness``. An event whose own ts is below the watermark of
  the STRICTLY-earlier prefix arrives after its window was finalized
  → it is routed to the late side output instead of the aggregate
  (the Beam "allowed lateness + late data drop/side-output" rule).
* Everything is one ``grouped_apply`` (hash co-location by shard) —
  the per-shard pass is a vectorized sort + shifted cummax, no Python
  loop — plus the engine's standard combiner-backed tumbling window
  aggregate over the on-time rows.

Arrival order: real logs record arrival; the driver's synthetic events
table does not, so ``watermark_tag`` derives a deterministic arrival
time ``ts + (md5(id) % jitter_seconds)`` — an SQL-replicable stand-in
for network/ingest delay (the oracle recomputes it bit-for-bit). Pass
``arrival_col`` to use a real arrival column instead.

The reference has no streaming operators (SURVEY.md §2); engine
extension per the charter's custom-operator list ("a streaming
window").
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def watermark_tag(events_ds, *, id_col: str = "event_id",
                  ts_col: str = "ts", lateness: str = "30min",
                  n_shards: int = 8, jitter_seconds: int = 3600,
                  arrival_col: str | None = None,
                  keep_cols: list[str] | None = None,
                  num_partitions: int | None = None):
    """Tag every event with its shard and an ``is_late`` flag under
    per-shard watermark semantics. Returns a Dataset with
    (id, ts, shard, is_late, *keep_cols).

    Scale note: watermark order is sequential WITHIN a shard (that is
    the semantics, not an implementation detail), and each shard
    co-locates into one block — so ``n_shards`` bounds both the
    parallelism AND the per-block memory, exactly like a Kafka
    topic's partition count. Size it as ``total_rows /
    target_block_rows`` for big replays (the default 8 suits the
    test corpora; a 100 TB replay wants thousands)."""
    from jerex_ray.functions.aggregate import grouped_apply

    late_td = pd.Timedelta(lateness)
    keep = keep_cols or []

    def shard_and_arrival(df: pd.DataFrame) -> pd.DataFrame:
        from jerex_ray.util import md5_hash64_batch

        ids = df[id_col].to_numpy()
        out = pd.DataFrame({id_col: ids, ts_col: df[ts_col].to_numpy()})
        for c in keep:
            out[c] = df[c].to_numpy()
        out["shard"] = (ids % n_shards).astype(np.int64)
        if arrival_col is not None:
            out["__arrival"] = df[arrival_col].to_numpy()
        else:
            jit = (md5_hash64_batch(ids.astype(str))
                   % np.uint64(jitter_seconds)).astype("timedelta64[s]")
            out["__arrival"] = out[ts_col].to_numpy() + jit
        return out

    tagged = events_ds.map_batches(shard_and_arrival,
                                   batch_format="pandas",
                                   batch_size=65536)

    def tag_block(block: pd.DataFrame) -> pd.DataFrame:
        if block.empty:
            out = block.drop(columns=["__arrival"], errors="ignore")
            out["is_late"] = pd.Series(dtype="bool")
            return out
        b = block.sort_values(["shard", "__arrival", id_col])
        ts = b[ts_col].to_numpy()
        # per-shard prefix max of ts over STRICTLY earlier arrivals:
        # grouped cummax, then a global shift(1) — shard rows are
        # contiguous after the sort, so only each shard's FIRST row
        # inherits a foreign value, and those are reset to NaT (no
        # watermark yet → never late)
        shard = b["shard"].to_numpy()
        new_shard = np.concatenate(([True], shard[1:] != shard[:-1]))
        prev = b.groupby("shard", sort=False)[ts_col].cummax() \
            .shift(1).to_numpy()
        prev[new_shard] = np.datetime64("NaT", "us")
        wm = pd.Series(prev) - late_td
        b = b.drop(columns=["__arrival"])
        b["is_late"] = (pd.Series(ts) < wm).to_numpy()
        return b

    return grouped_apply(tagged, ["shard"], tag_block,
                         num_partitions=num_partitions)


def stream_window_aggregate(events_ds, *, id_col: str = "event_id",
                            ts_col: str = "ts", value_col: str = "value",
                            window: str = "1h", lateness: str = "30min",
                            n_shards: int = 8, jitter_seconds: int = 3600,
                            num_partitions: int | None = None):
    """Finalized tumbling windows over the ON-TIME rows (late rows are
    excluded — they arrived after their window closed). Returns a
    Dataset (window_start, n_events, sum_value)."""
    from jerex_ray.functions.aggregate import grouped_aggregate

    tagged = watermark_tag(events_ds, id_col=id_col, ts_col=ts_col,
                           lateness=lateness, n_shards=n_shards,
                           jitter_seconds=jitter_seconds,
                           keep_cols=[value_col],
                           num_partitions=num_partitions)

    def ontime_window(df: pd.DataFrame) -> pd.DataFrame:
        d = df[~df["is_late"]]
        return pd.DataFrame({
            "window_start": d[ts_col].dt.floor(window).to_numpy(),
            value_col: d[value_col].to_numpy()})

    return grouped_aggregate(
        tagged.map_batches(ontime_window, batch_format="pandas"),
        ["window_start"],
        {"n_events": (None, "count"), "sum_value": (value_col, "sum")},
        num_partitions=num_partitions)


def dgim_replay(one_positions: np.ndarray, n_stream: int,
                window: int) -> dict:
    """DGIM sliding-window bit counting (Datar, Gionis, Indyk &
    Motwani '02) — approximate 'how many 1s in the last W stream
    positions' in O(log² W) memory with a ≤50% error guarantee (in
    practice ~2%: the error is at most half the OLDEST bucket). The
    canonical single-consumer streaming sketch completing the family
    beside Misra-Gries / CMS / AMS / HLL / KMV.

    Exact replay semantics (both engines): buckets are (end, size)
    with sizes powers of two, at most TWO of each size; on each
    1-bit arrival expired buckets (end ≤ p−W) drop FIRST, a size-1
    bucket appends, then while any size has three buckets the two
    OLDEST of the smallest such size merge into one of twice the
    size ending at the newer end — each merge is a discrete step the
    SQL oracle replays one recursion at a time. The estimate is
    Σsizes − oldest + oldest//2 (all integer arithmetic).

    Scale shape: the sketch IS the scale story — a DGIM per
    key/shard lives inside a stateful actor consuming its partition
    in order; this function is the exact replay harness those
    actors verify against (inputs are the one-bit POSITIONS only,
    ones-bounded)."""
    from collections import Counter

    buckets: list[tuple[int, int]] = []   # (end, size), end ascending
    n_merges = 0
    for p in one_positions:
        p = int(p)
        buckets = [(e, s) for e, s in buckets if e > p - window]
        buckets.append((p, 1))
        while True:
            c = Counter(s for _, s in buckets)
            cand = [s for s, n in c.items() if n >= 3]
            if not cand:
                break
            s3 = min(cand)
            olds = sorted((e, s) for e, s in buckets
                          if s == s3)[:2]
            buckets = [(e, s) for e, s in buckets
                       if (e, s) not in olds]
            buckets.append((olds[1][0], 2 * s3))
            buckets.sort()
            n_merges += 1
    live = [(e, s) for e, s in buckets if e > n_stream - window]
    total = sum(s for _, s in live)
    oldest = live[0][1] if live else 0
    exact = int((np.asarray(one_positions)
                 > n_stream - window).sum())
    estimate = total - oldest + oldest // 2
    return {"n_stream": int(n_stream), "window_w": int(window),
            "ones_in_window": exact, "estimate": int(estimate),
            "n_buckets": len(live),
            "largest": max((s for _, s in live), default=0),
            "abs_error": abs(int(estimate) - exact)}
