"""Z-order (Morton-curve) data-layout primitives — the multi-column
clustering key behind Delta/Iceberg `Z-ORDER BY` and classic
multidimensional indexing (Morton '66, Orenstein & Merrett '84).

Interleaving the bits of several sort keys gives a single integer
whose ranges are small hyper-rectangles in key space: sorting or
bucketing 100 TB by the z-value co-locates rows that are close on
EVERY key at once, so per-file min/max zone maps prune multi-predicate
scans. The ops here are exact and integer-only end to end, so the SQL
oracle replays them bit-for-bit:

* ``add_zvalue``: one streaming ``map_batches`` computing the
  interleaved code with 16 vectorized shift/mask steps per key bit —
  no Python row loops, no shuffle.
* ``zorder_layout_stats``: buckets rows by ``zval·nbuckets // (maxz+1)``
  (exact integer arithmetic; maxz from one scalar aggregate) and
  reduces per-bucket key envelopes (n, min/max per key) through the
  combiner — the zone-map audit showing how tight each bucket's
  rectangle is.

The reference has no storage-layout ops (SURVEY.md §2.8); engine
extension for the LLM-data charter.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_BITS = 16


def morton_interleave(cols: list[np.ndarray]) -> np.ndarray:
    """Bit-interleave k uint arrays (< 2^16 each) into one int64
    z-value: bit i of column j lands at position i*k + j."""
    k = len(cols)
    z = np.zeros(len(cols[0]), dtype=np.int64)
    for j, c in enumerate(cols):
        c = c.astype(np.int64)
        if c.size and (c.min() < 0 or c.max() >= (1 << _BITS)):
            raise ValueError(f"zorder key {j} outside [0, 2^{_BITS})")
        for i in range(_BITS):
            z |= ((c >> i) & 1) << (i * k + j)
    return z


def hilbert_interleave(cols: list[np.ndarray],
                       bits: int = _BITS) -> np.ndarray:
    """Hilbert-curve index of two uint arrays (< 2^bits each) — the
    classic xy→d transform (Hilbert 1891; iterative rotate/reflect
    form as in Warren, Hacker's Delight §16 / the public xy2d
    routine), vectorized: ``bits`` shift/mask/where steps, no row
    loop. Unlike Morton, consecutive Hilbert codes are always
    grid-adjacent (no diagonal jumps), which is why it clusters
    strictly better on average (Moon et al. '01)."""
    if len(cols) != 2:
        raise ValueError("hilbert_interleave needs exactly 2 keys")
    x = cols[0].astype(np.int64).copy()
    y = cols[1].astype(np.int64).copy()
    for j, c in enumerate((x, y)):
        if c.size and (c.min() < 0 or c.max() >= (1 << bits)):
            raise ValueError(f"hilbert key {j} outside [0, 2^{bits})")
    d = np.zeros(len(x), dtype=np.int64)
    s = 1 << (bits - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        swap = ry == 0
        refl = swap & (rx == 1)
        x2 = np.where(refl, s - 1 - x, x)
        y2 = np.where(refl, s - 1 - y, y)
        x, y = np.where(swap, y2, x2), np.where(swap, x2, y2)
        s >>= 1
    return d


def add_zvalue(ds, *, cols: list[str], out_col: str = "zval",
               interleave=morton_interleave):
    """Append the space-filling-curve value of ``cols`` to every row
    (Morton by default; pass ``interleave=hilbert_interleave`` for
    the Hilbert code)."""
    def zmap(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch[out_col] = interleave(
            [batch[c].to_numpy() for c in cols])
        return batch

    return ds.map_batches(zmap, batch_format="pandas", batch_size=8192)


def zorder_layout_stats(ds, *, cols: list[str], nbuckets: int = 64,
                        num_partitions: int | None = None,
                        interleave=morton_interleave) -> pd.DataFrame:
    """Zone-map audit of a space-filling-curve bucketing: per bucket,
    row count and the min/max envelope of every key (bucket-bounded
    result). ``interleave`` picks the curve (Morton default)."""
    from jerex_ray.functions.aggregate import grouped_aggregate

    zds = add_zvalue(ds, cols=cols, interleave=interleave) \
        .materialize()
    mx = grouped_aggregate(
        zds.map_batches(lambda df: pd.DataFrame(
            {"__all": [0], "mz": [np.int64(df["zval"].max())
                                  if len(df) else np.int64(-1)]}),
            batch_format="pandas"),
        ["__all"], {"maxz": ("mz", "max")}).to_pandas()
    if mx.empty or int(mx["maxz"].iloc[0]) < 0:
        cols_out = {"bucket": pd.Series(dtype="int64"),
                    "n": pd.Series(dtype="int64")}
        for c in cols:
            cols_out[f"{c}_min"] = pd.Series(dtype="int64")
            cols_out[f"{c}_max"] = pd.Series(dtype="int64")
        return pd.DataFrame(cols_out)
    maxz = int(mx["maxz"].iloc[0])

    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["bucket"] = (batch["zval"].to_numpy(np.int64)
                           * np.int64(nbuckets)) // np.int64(maxz + 1)
        return batch

    specs = {"n": (None, "count")}
    for c in cols:
        specs[f"{c}_min"] = (c, "min")
        specs[f"{c}_max"] = (c, "max")
    out = grouped_aggregate(
        zds.map_batches(bucketize, batch_format="pandas"),
        ["bucket"], specs, num_partitions=num_partitions).to_pandas()
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("bucket").reset_index(drop=True)


def plan_partitions(ds, *, key: str, n_partitions: int = 8,
                    num_partitions: int | None = None) -> pd.DataFrame:
    """Skew-aware co-location plan: assign each key to one of
    ``n_partitions`` so hot keys don't stack — greedy LPT bin packing
    (Graham '69: process keys by count DESC, key ASC; each goes to
    the least-loaded partition, lowest id on ties), the planner
    behind explicit skew-managed shuffles when hash-mod placement
    would hotspot.

    ONE combiner pass reduces the corpus to per-key counts (the plan
    input is KEY-VOCABULARY bounded — for unbounded key domains feed
    pre-hashed buckets); the greedy scan runs on the driver over that
    bounded table with exact integer loads. Guarantees makespan ≤
    (4/3 − 1/3m)·OPT (Graham's bound, pytest-gated). Returns
    (key, n_rows, partition)."""
    from jerex_ray.functions.aggregate import grouped_aggregate

    counts = grouped_aggregate(ds, [key], {"n_rows": (None, "count")},
                               num_partitions=num_partitions).to_pandas()
    if counts.empty or key not in counts.columns:
        return pd.DataFrame({key: pd.Series(dtype="int64"),
                             "n_rows": pd.Series(dtype="int64"),
                             "partition": pd.Series(dtype="int64")})
    counts = counts.sort_values(["n_rows", key],
                                ascending=[False, True]) \
        .reset_index(drop=True)
    loads = np.zeros(n_partitions, dtype=np.int64)
    assign = np.empty(len(counts), dtype=np.int64)
    cnt = counts["n_rows"].to_numpy(np.int64)
    for i in range(len(counts)):
        p = int(np.argmin(loads))     # first minimal index = lowest id
        assign[i] = p
        loads[p] += cnt[i]
    out = counts.assign(partition=assign)
    out["n_rows"] = out["n_rows"].astype("int64")
    return out.sort_values([key]).reset_index(drop=True)


def consistent_hash_ring(servers: list[str], *, vnodes: int = 16):
    """Karger '97 consistent-hash ring: each server contributes
    ``vnodes`` virtual nodes at md5-64 positions; returns
    (sorted_positions uint64, server_per_position). Tiny by
    construction (servers × vnodes) — broadcast it, never shuffle
    keys to build it."""
    from jerex_ray.util import md5_hash64

    pos, owner = [], []
    for s in servers:
        for v in range(vnodes):
            pos.append(md5_hash64(f"{s}#{v}"))
            owner.append(s)
    order = np.lexsort((np.asarray(owner, dtype=object),
                        np.asarray(pos, dtype=np.uint64)))
    return (np.asarray(pos, dtype=np.uint64)[order],
            np.asarray(owner, dtype=object)[order])


def ring_assign(key_hashes: np.ndarray, ring_pos: np.ndarray,
                ring_owner: np.ndarray) -> np.ndarray:
    """Successor lookup on the ring: owner of the smallest position
    ≥ key hash, wrapping to the globally smallest position."""
    idx = np.searchsorted(ring_pos, key_hashes, side="left")
    idx[idx == len(ring_pos)] = 0
    return ring_owner[idx]


def jump_consistent_hash(keys: np.ndarray, num_buckets: int) -> np.ndarray:
    """Jump consistent hash (Lamping & Veach '14) — the stateless,
    memory-free shard assigner whose resize property a fixed-size
    cluster relies on: growing S → S+1 moves exactly the ~1/(S+1)
    of keys that land in the NEW bucket and no others (no ring, no
    lookup table to rebuild). Bit-exact translation of the paper's
    loop, vectorized with a lane mask:

        key = key * 2862933555777941757 + 1   (mod 2⁶⁴)
        j   = ⌊(b+1) · 2³¹ / ((key >> 33) + 1)⌋

    The mod-2⁶⁴ LCG wraps intentionally (errstate-guarded uint64);
    the float step is one IEEE divide + multiply + truncation, so a
    SQL replay (split-multiply for the 128-bit product, floor() —
    DuckDB CAST(double AS BIGINT) ROUNDS, it does not truncate)
    reproduces every assignment bit-for-bit. O(ln S) expected
    iterations per key, stateless per row — embarrassingly parallel
    inside map_batches at any scale."""
    out = np.full(len(keys), -1, dtype=np.int64)
    if len(keys) == 0:
        return out
    k = keys.astype(np.uint64).copy()
    j = np.zeros(len(keys), dtype=np.int64)
    active = j < num_buckets
    with np.errstate(over="ignore"):
        while active.any():
            out[active] = j[active]
            k[active] = (k[active] * np.uint64(2862933555777941757)
                         + np.uint64(1))
            denom = (k[active] >> np.uint64(33)).astype(np.float64) \
                + 1.0
            j[active] = ((out[active] + 1)
                         * (2147483648.0 / denom)).astype(np.int64)
            active = j < num_buckets
    return out


def cuckoo_place(ids: np.ndarray, *, b: int = 256,
                 max_kicks: int = 32) -> pd.DataFrame:
    """Cuckoo hashing placement audit (Pagh & Rodler '01) — two
    md5 hash tables of ``b`` slots each, insert in id order, evict
    and re-place on collision (the displaced item moves to its
    OTHER table), give up after ``max_kicks`` evictions in one
    chain (the stashed-item rule: the item carried at cutoff is
    dropped and the INITIATOR's chain is marked -1). The
    worst-case-O(1)-lookup layout audit beside the ring and jump
    hash: 'does this key set fit two tables at this load with
    bounded displacement?'. Pure md5/integer arithmetic — the
    recursive-CTE oracle replays every placement and every kick
    bit-for-bit. Returns (id, tbl, slot, chain_kicks) with
    tbl = -1 for stashed items.

    Scale: insertion is inherently sequential per table PAIR — at
    corpus scale shard keys first (jump hash) and run one cuckoo
    pair per shard inside an actor; this is the per-shard
    primitive."""
    from jerex_ray.util import md5_hash64

    ids = np.sort(np.asarray(ids, dtype=np.int64))
    occ: dict[int, int] = {}
    chain: dict[int, int] = {}
    for u in ids:
        u = int(u)
        carry, k, kicks = u, int(md5_hash64(f"c1|{u}") % b), 0
        while True:
            if k not in occ:
                occ[k] = carry
                chain[u] = kicks
                break
            if kicks >= max_kicks:
                chain[u] = -1
                break
            old = occ[k]
            occ[k] = carry
            k = (b + int(md5_hash64(f"c2|{old}") % b)) if k < b \
                else int(md5_hash64(f"c1|{old}") % b)
            carry = old
            kicks += 1
    loc = {v: kk for kk, v in occ.items()}
    rows = [(int(u),
             loc[int(u)] // b if int(u) in loc else -1,
             loc[int(u)] % b if int(u) in loc else -1,
             chain[int(u)]) for u in ids]
    return pd.DataFrame(rows, columns=["user_id", "tbl", "slot",
                                       "chain_kicks"]) \
        .astype({"user_id": "int64", "tbl": "int64",
                 "slot": "int64", "chain_kicks": "int64"})
