"""Two-phase grouped aggregation: the engine's workhorse combiner.

``ray.data``'s built-in ``groupby().aggregate`` finalizes group-by-group
in Python (~10-20 ms per group measured on this Ray build), and every
hash-shuffle spins up one aggregator actor per partition (~1-2 s
startup each) — both dominate medium-sized aggregates. This module
implements the classic combiner/reducer with vectorized pandas kernels
and two reduce strategies:

* ``result_hint="small"`` (default): tree reduce. Per-batch partials →
  coalescing ``repartition`` (block concat, NO shuffle actors) →
  per-block merge → single-block final merge. Exact because the merge
  is associative; right whenever the final result fits one block
  (millions of groups). Zero shuffle actors, zero per-group Python.
* ``result_hint="large"``: hash ``repartition(keys=...)`` co-locates
  keys (verified: one block per key set), then one vectorized
  per-block merge+finalize. Unbounded result size; pays the shuffle.

Phase 1 also absorbs hot keys: a key with a billion occurrences
contributes one partial row per batch, not a billion shuffled rows.

Supported fns: sum, count, min, max, mean (kept as sum/count until the
finalize step, so tree merging stays exact).
"""

from __future__ import annotations

import pandas as pd

from jerex_ray.runtime import shuffle_partitions

_MERGE = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def _partial_cols(specs: dict) -> dict:
    """Internal accumulator columns per output column."""
    cols = {}
    for out, (col, fn) in specs.items():
        if fn == "mean":
            cols[out] = [(out + "__sum", col, "sum"),
                         (out + "__cnt", col, "count")]
        else:
            cols[out] = [(out, col, fn)]
    return cols


def _partial_fn(keys: list[str], specs: dict):
    acc = _partial_cols(specs)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            data = {k: df[k] for k in keys if k in df}
            for outs in acc.values():
                for name, _, _ in outs:
                    data[name] = pd.Series(dtype="float64")
            return pd.DataFrame(data)
        g = df.groupby(keys, sort=False, dropna=False)
        parts = {}
        for outs in acc.values():
            for name, col, fn in outs:
                if fn == "count":
                    parts[name] = g.size() if col is None else g[col].count()
                else:
                    parts[name] = getattr(g[col], fn)()
        return pd.DataFrame(parts).reset_index()
    return partial


def _merge_fn(keys: list[str], specs: dict, finalize: bool):
    acc = _partial_cols(specs)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df
        g = df.groupby(keys, sort=False, dropna=False)
        cols = {}
        for outs in acc.values():
            for name, _, fn in outs:
                m = "sum" if fn in ("count",) else _MERGE.get(fn, "sum")
                cols[name] = getattr(g[name], m)()
        out = pd.DataFrame(cols).reset_index()
        if finalize:
            for o, (col, fn) in specs.items():
                if fn == "mean":
                    out[o] = out[o + "__sum"] / out[o + "__cnt"].clip(lower=1)
                    out = out.drop(columns=[o + "__sum", o + "__cnt"])
        return out
    return merge


def grouped_aggregate(ds, keys: list[str], specs: dict[str, tuple],
                      *, num_partitions: int | None = None,
                      batch_size: int = 65536,
                      result_hint: str = "small",
                      salt_buckets: int = 0):
    """``specs``: {out_col: (in_col_or_None, fn)} with fn in
    sum|count|min|max|mean. Returns a Dataset of one row per key.

    ``salt_buckets > 0`` (only with ``result_hint="large"``) adds an
    explicit salted pre-reduce for pathologically hot keys: partials are
    first reduced under (keys, salt = row_hash % buckets), bounding any
    single reducer's fan-in to ``#batches / buckets`` rows per key,
    then merged under the bare keys. The per-batch combiner already
    bounds fan-in to #batches; salting is for corpora where even that
    is too much for one reducer."""
    from jerex_ray.runtime import configure_data_context
    configure_data_context(ds=ds)
    if isinstance(keys, str):
        keys = [keys]
    partial = ds.map_batches(_partial_fn(keys, specs),
                             batch_format="pandas", batch_size=batch_size)
    if result_hint == "large":
        np_ = shuffle_partitions(num_partitions)
        if salt_buckets > 1:
            def add_salt(df: pd.DataFrame) -> pd.DataFrame:
                df = df.reset_index(drop=True)
                df["__salt"] = df.index.to_numpy() % salt_buckets
                return df

            salted = partial.map_batches(add_salt, batch_format="pandas") \
                .repartition(np_, keys=keys + ["__salt"], sort=False) \
                .map_batches(_merge_fn(keys + ["__salt"], specs,
                                       finalize=False),
                             batch_format="pandas", batch_size=None) \
                .map_batches(lambda df: df.drop(columns=["__salt"]),
                             batch_format="pandas")
            partial = salted
        shuffled = partial.repartition(np_, keys=keys, sort=False)
        return shuffled.map_batches(_merge_fn(keys, specs, finalize=True),
                                    batch_format="pandas", batch_size=None)
    # tree reduce: coalesce → merge → single-block finalize
    fan_in = shuffle_partitions(num_partitions or 8)
    level1 = partial.repartition(fan_in) \
        .map_batches(_merge_fn(keys, specs, finalize=False),
                     batch_format="pandas", batch_size=None)
    return level1.repartition(1) \
        .map_batches(_merge_fn(keys, specs, finalize=True),
                     batch_format="pandas", batch_size=None)


def grouped_apply(ds, keys: list[str], block_fn,
                  *, num_partitions: int | None = None,
                  single_block: bool = False):
    """Hash-co-locate groups, then run a VECTORIZED per-block function
    that sees every row of each key it receives (a faster
    ``groupby().map_groups`` for functions expressible over a whole
    block of complete groups — dedup winners, mode picks, top-1s).

    ``single_block=True`` is the small-side fast path: a plain
    ``repartition(1)`` (block concat, no hash-shuffle aggregator
    actors, whose startup dominates small jobs) trivially co-locates
    every key in the one block. Callers set it from a KNOWN size bound
    (e.g. doc count from parquet metadata), never as a guess."""
    from jerex_ray.runtime import configure_data_context
    configure_data_context(ds=ds)
    if isinstance(keys, str):
        keys = [keys]
    if single_block:
        ds = ds.repartition(1)
    else:
        np_ = shuffle_partitions(num_partitions)
        ds = ds.repartition(np_, keys=keys, sort=False)
    return ds.map_batches(block_fn, batch_format="pandas", batch_size=None)


def grouped_topk(ds, keys: list[str], *, order_by: str, k: int,
                 ascending: bool = False, tie_cols: list[str] | None = None,
                 num_partitions: int | None = None):
    """Exact top-``k`` rows per key group, without a global sort: each
    batch contributes at most k rows per key it sees (the top-k
    combiner), the survivors co-locate by key, and the same vectorized
    sort+head finishes per block. Ties are broken by ``tie_cols``
    ascending (pass the row's unique id for full determinism).
    Shuffle volume is ≤ k × keys-per-batch rows, never the corpus."""
    if isinstance(keys, str):
        keys = [keys]
    tie = tie_cols or []
    by = [order_by] + tie
    asc = [ascending] + [True] * len(tie)

    def topk_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df
        return df.sort_values(by, ascending=asc) \
            .groupby(keys, sort=False).head(k)

    partial = ds.map_batches(topk_block, batch_format="pandas",
                             batch_size=65536)
    return grouped_apply(partial, keys, topk_block,
                         num_partitions=num_partitions)


def grouped_mode(ds, keys: list[str], *, value_col: str,
                 num_partitions: int | None = None):
    """Most frequent ``value_col`` per key group (deterministic ties:
    lexicographically smallest value). Two-phase like every aggregate
    here: per-batch (key, value) partial counts bound a hot value's
    shuffle fan-in to #batches; the final block sums partials and
    elects per key. Returns (keys..., mode_value, mode_count)."""
    if isinstance(keys, str):
        keys = [keys]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(columns=keys + [value_col, "__n"])
        return (df.groupby(keys + [value_col], sort=False)
                  .size().reset_index(name="__n"))

    def elect(block: pd.DataFrame) -> pd.DataFrame:
        if block.empty:
            out = pd.DataFrame(columns=keys + ["mode_value", "mode_count"])
            out["mode_count"] = out["mode_count"].astype("int64")
            return out
        sums = (block.groupby(keys + [value_col], sort=False)["__n"]
                .sum().reset_index())
        top = sums.sort_values(keys + ["__n", value_col],
                               ascending=[True] * len(keys)
                               + [False, True]) \
            .drop_duplicates(keys)
        top = top.rename(columns={value_col: "mode_value",
                                  "__n": "mode_count"})
        top["mode_count"] = top["mode_count"].astype("int64")
        return top[keys + ["mode_value", "mode_count"]]

    partials = ds.map_batches(partial, batch_format="pandas",
                              batch_size=65536)
    return grouped_apply(partials, keys, elect,
                         num_partitions=num_partitions)


def partial_states(ds, keys: list[str], specs: dict[str, tuple],
                   *, num_partitions: int | None = None,
                   batch_size: int = 65536):
    """Grouped aggregation STOPPED at the mergeable partial state —
    the combiner's accumulator columns (mean kept as sum/count), one
    row per key per partition after a hash co-location. The state is a
    plain Dataset: write it to parquet next to the result and the next
    ingest increment never re-reads history (incremental view
    maintenance). Finish or fold increments with ``merge_states``."""
    if isinstance(keys, str):
        keys = [keys]
    from jerex_ray.runtime import configure_data_context
    configure_data_context(ds=ds)
    partial = ds.map_batches(_partial_fn(keys, specs),
                             batch_format="pandas", batch_size=batch_size)
    np_ = shuffle_partitions(num_partitions)
    return partial.repartition(np_, keys=keys, sort=False) \
        .map_batches(_merge_fn(keys, specs, finalize=False),
                     batch_format="pandas", batch_size=None)


def merge_states(states, keys: list[str], specs: dict[str, tuple],
                 *, num_partitions: int | None = None,
                 finalize: bool = True):
    """Fold any number of ``partial_states`` Datasets into one —
    ``finalize=True`` yields the final aggregate (what a full
    recompute over the union of the inputs would return, exactly:
    the merge is associative and commutative), ``finalize=False``
    yields the folded state for the next increment. Union + hash
    co-location + one vectorized per-block merge; cost scales with
    the STATE size (keys), never the ingested history."""
    if isinstance(keys, str):
        keys = [keys]
    states = list(states)
    u = states[0]
    if len(states) > 1:
        u = u.union(*states[1:])
    from jerex_ray.runtime import configure_data_context
    configure_data_context(ds=u)
    np_ = shuffle_partitions(num_partitions)
    return u.repartition(np_, keys=keys, sort=False) \
        .map_batches(_merge_fn(keys, specs, finalize=finalize),
                     batch_format="pandas", batch_size=None)
