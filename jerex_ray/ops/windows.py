"""Windowed aggregates and time-ordered joins over event tables.

Ray Data has no event-time window/watermark machinery (ray_guide
§Streaming-shaped): windows are expressed as key-partitioned,
vectorized transforms —

* ``tumbling_window``  — one bucket per row (floor to window), then the
  engine's combiner aggregate. Scales like any grouped aggregate.
* ``sliding_window``   — each row exploded into ``size/slide`` window
  assignments (vectorized repeat), then the combiner aggregate.
* ``session_windows``  — gap-based sessions per key: keys co-located
  via hash repartition, then per-block vectorized gaps-and-islands
  (sort, diff > gap, cumsum) — no per-group Python.
* ``asof_join``        — for each left row, the latest right row with
  ``ts_right <= ts_left`` per key: both sides tagged and unioned, keys
  co-located in ONE shuffle, then per-block ``pandas.merge_asof``.
  Ordering contract: within a block both sides are sorted by ts before
  the merge (stated per the guide's as-of pattern).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply


def tumbling_window(events_ds, *, keys: list[str], ts_col: str, every: str,
                    specs: dict, num_partitions: int | None = None):
    """Non-overlapping windows of width ``every`` (pandas offset alias,
    e.g. '1h'); emits one row per (keys..., window_start)."""
    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["window_start"] = df[ts_col].dt.floor(every)
        return df

    return grouped_aggregate(
        events_ds.map_batches(bucket, batch_format="pandas"),
        list(keys) + ["window_start"], specs, num_partitions=num_partitions)


def sliding_window(events_ds, *, keys: list[str], ts_col: str, size: str,
                   slide: str, specs: dict,
                   num_partitions: int | None = None):
    """Overlapping windows of width ``size`` sliding by ``slide``
    (``size`` must be a multiple of ``slide``). Each row is assigned to
    size/slide windows — the window whose start is floor(ts, slide) and
    the k-1 earlier slides."""
    size_td = pd.Timedelta(size)
    slide_td = pd.Timedelta(slide)
    k = int(size_td / slide_td)
    if k * slide_td != size_td:
        raise ValueError("size must be a multiple of slide")

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        base = df[ts_col].dt.floor(slide)
        frames = []
        for i in range(k):
            f = df.copy()
            f["window_start"] = base - i * slide_td
            frames.append(f)
        return pd.concat(frames, ignore_index=True)

    return grouped_aggregate(
        events_ds.map_batches(explode, batch_format="pandas"),
        list(keys) + ["window_start"], specs, num_partitions=num_partitions)


def session_windows(events_ds, *, key: str, ts_col: str, gap: str,
                    num_partitions: int | None = None):
    """Gap-based sessionization: events of one key whose consecutive
    gaps are ≤ ``gap`` share a session. Emits one row per session:
    (key, session_start, session_end, n_events)."""
    gap_td = pd.Timedelta(gap)

    def sessions_block(block: pd.DataFrame) -> pd.DataFrame:
        if block.empty:
            return pd.DataFrame({key: [], "session_start": [],
                                 "session_end": [],
                                 "n_events": pd.Series(dtype="int64")})
        b = block.sort_values([key, ts_col])
        new_key = b[key].ne(b[key].shift())
        gap_break = b[ts_col].diff() > gap_td
        session_id = (new_key | gap_break).cumsum()
        g = b.groupby(session_id, sort=False)
        out = pd.DataFrame({
            key: g[key].first(),
            "session_start": g[ts_col].min(),
            "session_end": g[ts_col].max(),
            "n_events": g.size().astype("int64"),
        })
        return out.reset_index(drop=True)

    return grouped_apply(events_ds, [key], sessions_block,
                         num_partitions=num_partitions)


def asof_join(left_ds, right_ds, *, key: str, left_ts: str, right_ts: str,
              right_cols: list[str], num_partitions: int | None = None,
              direction: str = "backward"):
    """Keyed as-of join: per left row, the latest right row at-or-before
    (``direction="backward"``, default) or the earliest right row
    at-or-after (``direction="forward"``) its timestamp.

    Both sides are reduced to the needed columns, tagged, unioned, and
    co-located by key in one hash repartition; each block runs a
    vectorized ``merge_asof`` over its complete key groups."""
    left_schema = left_ds.schema()
    right_schema = right_ds.schema()
    left_cols = list(left_schema.names)
    all_cols = left_cols + ["__rts"] + right_cols + ["__side"]

    def _typed_null(arrow_type, n):
        import pyarrow.types as pt
        if pt.is_integer(arrow_type):
            return pd.array([pd.NA] * n, dtype="Int64")
        if pt.is_floating(arrow_type):
            import numpy as np
            return np.full(n, np.nan)
        if pt.is_timestamp(arrow_type):
            return pd.Series([pd.NaT] * n, dtype="datetime64[us]")
        if pt.is_boolean(arrow_type):
            return pd.array([pd.NA] * n, dtype="boolean")
        return pd.array([pd.NA] * n, dtype="string")

    left_types = dict(zip(left_schema.names, left_schema.types))
    right_types = dict(zip(right_schema.names, right_schema.types))

    def tag_left(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__rts"] = pd.Series(
            pd.NaT, index=df.index,
            dtype=right_types[right_ts].to_pandas_dtype())
        for c in right_cols:
            df[c] = _typed_null(right_types[c], len(df))
        df["__side"] = "l"
        return df[all_cols]

    def tag_right(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[key, right_ts] + right_cols].rename(
            columns={right_ts: "__rts"})
        for c in left_cols:
            if c not in out.columns:
                out[c] = _typed_null(left_types[c], len(out))
        out["__side"] = "r"
        return out[all_cols]

    left = left_ds.map_batches(tag_left, batch_format="pandas")
    right = right_ds.map_batches(tag_right, batch_format="pandas")
    both = left.union(right)

    def join_block(block: pd.DataFrame) -> pd.DataFrame:
        l = block[block["__side"] == "l"].drop(
            columns=["__side", "__rts"] + right_cols, errors="ignore")
        r = block[block["__side"] == "r"][[key, "__rts"] + right_cols]
        if l.empty:
            return l
        l = l.sort_values(left_ts)
        if r.empty:
            out = l.copy()
            out["__rts"] = pd.NaT
            for c in right_cols:
                out[c] = None
            return out.rename(columns={"__rts": f"{right_ts}_right"})
        r = r.sort_values("__rts")
        out = pd.merge_asof(l, r, left_on=left_ts, right_on="__rts",
                            by=key, direction=direction)
        return out.rename(columns={"__rts": f"{right_ts}_right"})

    return grouped_apply(both, [key], join_block,
                         num_partitions=num_partitions)


def range_join_agg(left_ds, right_ds, *, key: str, left_ts: str,
                   right_ts: str, lower, upper, value_col: str,
                   num_partitions: int | None = None):
    """Keyed RANGE join, aggregated: for every left row, count and sum
    the right rows of the same key whose timestamp falls in
    ``[left_ts - lower, left_ts + upper]`` (inclusive bounds).

    Same single-shuffle shape as ``asof_join``: both sides reduced,
    tagged and co-located by key; each block answers all its left rows
    with two vectorized ``searchsorted`` probes against the key
    group's time-sorted right rows plus a prefix-sum for the value
    aggregate — O((L+R) log R) per group, no pair materialization
    (an emitted pair table is corpus × window sized; the aggregate is
    the scale-sane primitive)."""
    import numpy as np

    lower = pd.to_timedelta(lower)
    upper = pd.to_timedelta(upper)
    left_cols = list(left_ds.schema().names)

    def tag_left(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__rts"] = pd.Series(pd.NaT, index=df.index,
                                dtype="datetime64[us]")
        df["__val"] = np.nan
        df["__side"] = "l"
        return df[left_cols + ["__rts", "__val", "__side"]]

    def tag_right(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[key, right_ts, value_col]].rename(
            columns={right_ts: "__rts", value_col: "__val"})
        for c in left_cols:
            if c not in out.columns:
                out[c] = pd.NA
        out["__side"] = "r"
        return out[left_cols + ["__rts", "__val", "__side"]]

    both = left_ds.map_batches(tag_left, batch_format="pandas").union(
        right_ds.map_batches(tag_right, batch_format="pandas"))

    def join_block(block: pd.DataFrame) -> pd.DataFrame:
        l = block[block["__side"] == "l"].drop(
            columns=["__side", "__rts", "__val"])
        r = block[block["__side"] == "r"][[key, "__rts", "__val"]]
        if l.empty:
            return l.assign(n_matches=pd.Series(dtype="int64"),
                            sum_value=pd.Series(dtype="float64"))
        outs = []
        r_by_key = {k: g for k, g in r.groupby(key, sort=False)}
        for k, g in l.groupby(key, sort=False):
            rg = r_by_key.get(k)
            g = g.copy()
            if rg is None or rg.empty:
                g["n_matches"] = 0
                g["sum_value"] = 0.0
            else:
                rts = rg["__rts"].to_numpy(dtype="datetime64[us]")
                order = np.argsort(rts, kind="stable")
                rts = rts[order]
                vals = rg["__val"].to_numpy(dtype=np.float64)[order]
                # SQL sum semantics: NULL values are ignored (count
                # still counts the row); NaN must not poison the prefix
                vals = np.nan_to_num(vals, nan=0.0)
                csum = np.concatenate(([0.0], np.cumsum(vals)))
                lts = g[left_ts].to_numpy(dtype="datetime64[us]")
                lo = np.searchsorted(rts, lts - lower, side="left")
                hi = np.searchsorted(rts, lts + upper, side="right")
                g["n_matches"] = (hi - lo).astype(np.int64)
                g["sum_value"] = csum[hi] - csum[lo]
            outs.append(g)
        return pd.concat(outs, ignore_index=True)

    from jerex_ray.functions.aggregate import grouped_apply
    return grouped_apply(both, [key], join_block,
                         num_partitions=num_partitions)


def lag_delta(events_ds, *, key: str, ts_col: str, id_col: str,
              num_partitions: int | None = None):
    """Per-key previous-event time delta (the LAG window function):
    rows co-locate by key via the hash shuffle, each block sorts its
    complete key groups once and takes one vectorized diff. Delta is
    in whole seconds (floor), NULL (-1 sentinel avoided: pandas NaT →
    <NA> preserved) for each key's first event."""
    from jerex_ray.functions.aggregate import grouped_apply

    def deltas(block: pd.DataFrame) -> pd.DataFrame:
        if block.empty:
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 key: pd.Series(dtype="int64"),
                                 "delta_s": pd.Series(dtype="float64")})
        b = block.sort_values([key, ts_col, id_col])
        ts = b[ts_col].to_numpy()
        same = np.empty(len(b), dtype=bool)
        same[0] = False
        if len(b) > 1:
            same[1:] = b[key].to_numpy()[1:] == b[key].to_numpy()[:-1]
        delta = np.full(len(b), np.nan)
        if len(b) > 1:
            d = (ts[1:] - ts[:-1]) / np.timedelta64(1, "s")
            delta[1:] = np.where(same[1:], np.floor(d), np.nan)
        return pd.DataFrame({id_col: b[id_col].to_numpy(),
                             key: b[key].to_numpy(),
                             "delta_s": delta})

    return grouped_apply(events_ds, [key], deltas,
                         num_partitions=num_partitions)


def transition_matrix(events_ds, *, key: str, ts_col: str, id_col: str,
                      type_col: str,
                      num_partitions: int | None = None) -> pd.DataFrame:
    """First-order Markov transition matrix over per-key ordered event
    sequences (the LEAD window shape): rows co-locate by key via the
    hash shuffle, each block sorts its complete key groups once and
    counts (state, next-state) pairs from two shifted views; the
    per-block partials reduce through the combiner aggregate. Only the
    |types|²-bounded count table reaches the driver, where row
    probabilities are normalized (cnt / Σ cnt per source state).

    Order within a key is (ts, id) — the id tiebreak makes equal-ts
    sequences deterministic. Returns DataFrame[prev_type, next_type,
    cnt, prob] with prob rounded to 6 decimals (oracle parity)."""

    def partial(block: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"prev_type": pd.Series(dtype="object"),
                              "next_type": pd.Series(dtype="object"),
                              "c": pd.Series(dtype="int64")})
        if block.empty:
            return empty
        b = block.sort_values([key, ts_col, id_col])
        ks = b[key].to_numpy()
        ty = b[type_col].to_numpy()
        if len(b) < 2:
            return empty
        same = ks[1:] == ks[:-1]
        if not same.any():
            return empty
        prev, nxt = ty[:-1][same], ty[1:][same]
        df = pd.DataFrame({"prev_type": prev, "next_type": nxt})
        g = df.value_counts().reset_index(name="c")
        g["c"] = g["c"].astype("int64")
        return g

    counts = grouped_aggregate(
        grouped_apply(events_ds, [key], partial,
                      num_partitions=num_partitions),
        ["prev_type", "next_type"], {"cnt": ("c", "sum")},
        num_partitions=num_partitions).to_pandas()
    if counts.empty or "prev_type" not in counts.columns:
        return pd.DataFrame({"prev_type": pd.Series(dtype="object"),
                             "next_type": pd.Series(dtype="object"),
                             "cnt": pd.Series(dtype="int64"),
                             "prob": pd.Series(dtype="float64")})
    counts["cnt"] = counts["cnt"].astype("int64")
    totals = counts.groupby("prev_type")["cnt"].transform("sum")
    counts["prob"] = (counts["cnt"] / totals).round(6)
    return counts.sort_values(["prev_type", "next_type"]) \
        .reset_index(drop=True)
