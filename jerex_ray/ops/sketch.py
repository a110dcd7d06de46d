"""Streaming frequency sketches over document text.

``heavy_hitters`` finds every word whose corpus-wide count exceeds
``total/k`` EXACTLY, in two streaming passes and with no corpus-sized
shuffle — the classic "sketch candidates, then verify exactly" shape:

pass 1 (one ``map_batches``): each batch summarizes its words with a
    Misra–Gries sketch of capacity ``capacity`` (Misra & Gries '82,
    "Finding repeated elements"). The union of per-batch survivor sets
    is a guaranteed SUPERSET of the true heavy hitters: if a word w has
    global count C(w) > N/(capacity+1) = Σ_b n_b/(capacity+1), then by
    averaging there is a batch b with c_b(w) > n_b/(capacity+1), and a
    batch-local MG with that capacity always retains such a word.
    Batch totals ride along, so the pass also yields N exactly.
pass 2 (one ``map_batches`` + a vocabulary-sized combiner groupby):
    exact counts of the candidate words only (candidate set broadcast
    once via ``ray.put`` — bounded by capacity × batches, in practice
    ≪ vocabulary), then the integer threshold test ``count * k >
    total`` — no float arithmetic anywhere, so the result is
    bit-reproducible and SQL-oracled exactly.

At 100 TB the candidate set after the combiner is ≤ capacity ×
#batches rows (deduplicated to ≤ vocabulary), and nothing pair- or
corpus-sized ever reaches the driver: the only collected object is the
candidate-count table, which is candidate-bounded by construction.

The reference has no sketches anywhere (SURVEY.md §2.7); this is an
engine extension for the LLM-data-pipeline charter.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def misra_gries(words: np.ndarray, capacity: int) -> pd.DataFrame:
    """One Misra–Gries summary of ``words`` (any 1-d array of strings).

    Vectorized: exact per-batch counts first (cheap — a batch is
    bounded), then keep the ``capacity`` largest after subtracting the
    (capacity+1)-th largest count, which is exactly the MG decrement
    semantics applied in bulk (Agarwal et al. '12, "Mergeable summaries",
    §3 — count-based MG merge)."""
    if len(words) == 0:
        return pd.DataFrame({"term": pd.Series(dtype="object"),
                             "mg_count": pd.Series(dtype="int64")})
    uniq, counts = np.unique(words, return_counts=True)
    if len(uniq) > capacity:
        # subtract the (capacity+1)-th largest count from everything,
        # drop non-positive — the bulk form of MG's decrement loop
        kth = np.partition(counts, len(counts) - capacity - 1)[
            len(counts) - capacity - 1]
        keep = counts > kth
        uniq, counts = uniq[keep], counts[keep] - kth
    return pd.DataFrame({"term": uniq,
                         "mg_count": counts.astype("int64")})


def _batch_words(batch: pd.DataFrame, column: str) -> np.ndarray:
    words = batch[column].fillna("").str.lower().str.split()
    nonempty = [w for w in words.to_numpy() if w]
    if not nonempty:
        return np.asarray([], dtype=object)
    return np.concatenate(nonempty)


def heavy_hitters(docs_ds, *, column: str = "text", k: int = 40,
                  capacity: int = 256,
                  num_partitions: int | None = None) -> pd.DataFrame:
    """All words with corpus count strictly greater than ``total/k``
    (integer test ``count * k > total``), exactly.

    Requires ``capacity + 1 >= k`` so the MG superset guarantee covers
    the output threshold."""
    if capacity + 1 < k:
        raise ValueError(f"capacity+1={capacity + 1} must be >= k={k} "
                         "for the candidate superset guarantee")
    import ray

    from jerex_ray.functions.aggregate import grouped_aggregate

    def sketch(batch: pd.DataFrame) -> pd.DataFrame:
        flat = _batch_words(batch, column)
        out = misra_gries(flat, capacity)
        # ride the exact batch word total along (term="" never collides
        # with a real word: empty tokens are filtered out of the split)
        return pd.concat(
            [out, pd.DataFrame({"term": [""],
                                "mg_count": [np.int64(len(flat))]})],
            ignore_index=True)

    summaries = grouped_aggregate(
        docs_ds.map_batches(sketch, batch_format="pandas",
                            batch_size=8192),
        ["term"], {"c": ("mg_count", "sum")},
        num_partitions=num_partitions).to_pandas()
    empty = pd.DataFrame({"term": pd.Series(dtype="object"),
                          "n_occurrences": pd.Series(dtype="int64")})
    if summaries.empty or "c" not in summaries.columns:
        return empty
    total = int(summaries.loc[summaries["term"] == "", "c"].sum())
    candidates = summaries.loc[summaries["term"] != "", "term"]
    if total == 0 or candidates.empty:
        return empty
    cand_ref = ray.put(set(candidates))

    def exact_counts(batch: pd.DataFrame) -> pd.DataFrame:
        cand = ray.get(cand_ref)
        flat = _batch_words(batch, column)
        if len(flat) == 0:
            return pd.DataFrame({"term": pd.Series(dtype="object"),
                                 "c": pd.Series(dtype="int64")})
        s = pd.Series(flat)
        s = s[s.isin(cand)]
        out = s.value_counts()
        return pd.DataFrame({"term": out.index.to_numpy(),
                             "c": out.to_numpy(np.int64)})

    counts = grouped_aggregate(
        docs_ds.map_batches(exact_counts, batch_format="pandas",
                            batch_size=8192),
        ["term"], {"n_occurrences": ("c", "sum")},
        num_partitions=num_partitions).to_pandas()
    if counts.empty or "n_occurrences" not in counts.columns:
        return empty
    counts["n_occurrences"] = counts["n_occurrences"].astype("int64")
    hot = counts[counts["n_occurrences"] * k > total]
    return hot.sort_values(["n_occurrences", "term"],
                           ascending=[False, True]).reset_index(drop=True)


# --- HyperLogLog: mergeable approximate count-distinct ---
#
# Flajolet/Fusy/Gandouet/Meunier '07 ("HyperLogLog: the analysis of a
# near-optimal cardinality estimation algorithm") with the standard
# 64-bit-hash variant: register index = top p bits of the md5-derived
# 64-bit hash, rho = leading-zero run of the remaining 64-p bits + 1.
# Registers are the textbook mergeable sketch: per-batch partials are
# elementwise-max'd in a tree reduce — the ONLY thing that ever moves
# is one 2^p-byte register array per block, so distinct-counting a
# 100 TB column shuffles kilobytes. Estimator: bias-corrected harmonic
# mean with the small-range linear-counting correction (E <= 2.5m and
# V > 0 -> m*ln(m/V)) — in that regime the estimate depends only on
# WHICH registers are hit, which DuckDB can recompute exactly
# (md5-derived register index = `CAST('0x'||substr(md5(x),1,16) AS
# UBIGINT) >> (64-p)`), so `q_events_hll_users` is fully SQL-oracled,
# not rows-only; the general regime is pytest-gated to the published
# ~1.04/sqrt(m) relative-error bound.


def _hll_registers(hashes: np.ndarray, p: int) -> tuple:
    """(register index, rho) per hash — exact 64-bit bit arithmetic
    (bit length via 32-bit halves + frexp, exact below 2^53)."""
    h = hashes.astype(np.uint64)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h << np.uint64(p)          # suffix in the top 64-p bits
    hi = (w >> np.uint64(32)).astype(np.float64)
    lo = (w & np.uint64(0xFFFFFFFF)).astype(np.float64)
    _, e_hi = np.frexp(hi)
    _, e_lo = np.frexp(lo)
    bl = np.where(hi > 0, 32 + e_hi, e_lo)     # bit length of w (0 for 0)
    rho = np.where(w > 0, 64 - bl + 1, 64 - p + 1)
    return idx, rho.astype(np.int64)


def hll_partial_registers(values, p: int) -> np.ndarray:
    """One batch's register array (uint8, length 2^p)."""
    from jerex_ray.util import md5_hash64_batch
    regs = np.zeros(1 << p, dtype=np.uint8)
    vals = np.asarray(values)
    if vals.size == 0:
        return regs
    h = md5_hash64_batch(v if isinstance(v, str) else str(v)
                         for v in vals.tolist())
    idx, rho = _hll_registers(h, p)
    np.maximum.at(regs, idx, np.minimum(rho, 255).astype(np.uint8))
    return regs


def hll_estimate(regs: np.ndarray) -> tuple[float, int]:
    """(cardinality estimate, #registers set). Linear counting in the
    small range, bias-corrected harmonic mean otherwise."""
    regs = np.asarray(regs, dtype=np.float64)
    m = regs.size
    alpha = 0.7213 / (1.0 + 1.079 / m)
    E = alpha * m * m / np.sum(np.exp2(-regs))
    V = int((regs == 0).sum())
    if E <= 2.5 * m and V > 0:
        est = m * np.log(m / V)
    else:
        est = E
    return float(est), m - V


def hll_distinct(ds, *, column: str, p: int = 12) -> pd.DataFrame:
    """Approximate COUNT(DISTINCT column) over a Dataset: per-batch
    register partials -> tree-reduce elementwise max -> estimate.
    Returns one row: (estimate, registers_set, p)."""
    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"regs": [hll_partial_registers(batch[column].to_numpy(), p)]})

    def merge(block: pd.DataFrame) -> pd.DataFrame:
        stacked = np.stack([np.asarray(r, dtype=np.uint8)
                            for r in block["regs"].to_numpy()])
        return pd.DataFrame({"regs": [np.maximum.reduce(stacked)]})

    merged = (ds.map_batches(partial, batch_format="pandas",
                             batch_size=65536)
              .repartition(8).map_batches(merge, batch_format="pandas",
                                          batch_size=None)
              .repartition(1).map_batches(merge, batch_format="pandas",
                                          batch_size=None))
    out = merged.to_pandas()
    if out.empty:          # empty input Dataset → zero registers
        regs = np.zeros(1 << p, dtype=np.uint8)
    else:
        regs = np.asarray(out["regs"].iloc[0], dtype=np.uint8)
    est, nset = hll_estimate(regs)
    return pd.DataFrame({"estimate": [round(est, 6)],
                         "registers_set": [np.int64(nset)],
                         "p": [np.int64(p)]})


def hll_distinct_by(ds, *, column: str, group: str,
                    p: int = 12, num_partitions: int | None = None
                    ) -> pd.DataFrame:
    """Approximate COUNT(DISTINCT column) PER GROUP, composed from the
    same registers: per-batch ``(group, register, rho)`` partials
    (vectorized groupby-max within the batch — the combiner absorbs
    hot groups), one grouped max-merge, then a per-group estimate
    computed co-located (never more than groups × 2^p rows move, and
    only non-zero registers are ever materialized). Same
    linear-counting SQL-parity property as ``hll_distinct``."""
    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply
    from jerex_ray.util import md5_hash64_batch

    m = 1 << p

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        vals = batch[column].to_numpy()
        if len(vals) == 0:
            return pd.DataFrame({"g": pd.Series(dtype=batch[group].dtype),
                                 "idx": pd.Series(dtype="int64"),
                                 "rho": pd.Series(dtype="int64")})
        h = md5_hash64_batch(v if isinstance(v, str) else str(v)
                             for v in vals.tolist())
        idx, rho = _hll_registers(h, p)
        df = pd.DataFrame({"g": batch[group].to_numpy(),
                           "idx": idx, "rho": rho})
        return df.groupby(["g", "idx"], sort=False)["rho"].max() \
            .reset_index()

    merged = grouped_aggregate(
        ds.map_batches(partial, batch_format="pandas", batch_size=65536),
        ["g", "idx"], {"rho": ("rho", "max")},
        num_partitions=num_partitions)

    def estimate_block(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.assign(w=np.exp2(-df["rho"].to_numpy(np.float64))) \
            .groupby("g", sort=False).agg(nset=("idx", "count"),
                                          wsum=("w", "sum")).reset_index()
        nset = agg["nset"].to_numpy(np.int64)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        E = alpha * m * m / (agg["wsum"].to_numpy() + (m - nset))
        V = m - nset
        lin = np.where(V > 0, m * np.log(m / np.maximum(V, 1)), E)
        est = np.where((E <= 2.5 * m) & (V > 0), lin, E)
        return pd.DataFrame({"g": agg["g"],
                             "estimate": np.round(est, 6),
                             "registers_set": nset})

    out = grouped_apply(merged, ["g"], estimate_block,
                        num_partitions=num_partitions).to_pandas()
    return out.sort_values("g").reset_index(drop=True)


# --- Bloom filter: mergeable approximate membership ---
#
# Bloom '70 ("Space/time trade-offs in hash coding with allowable
# errors"). Same mergeable-sketch dataflow as the HLL above: each batch
# reduces its keys to one m-bit array (packed uint64), partials OR-
# merge in a tree reduce, and the final filter broadcasts once via
# ray.put for streaming membership tests. k index functions come from
# double hashing (Kirsch & Mitzenmacher '06: h1 + i*h2 is as good as k
# independent hashes) over the md5-derived 64-bit key hash. One-sided
# error: NO false negatives ever; false-positive rate ~(1-e^{-kn/m})^k,
# pytest-gated. This is the decontamination/membership scale path when
# even the distinct-gram table of the small side is too big to
# broadcast as a Python set but its BITS fit everywhere (a 1e9-gram
# eval set at 10 bits/key is 1.25 GB of filter vs ~60+ GB of set).


def _bloom_positions(hashes: np.ndarray, m_bits: int, k: int):
    """(n, k) bit positions via double hashing; h2 forced odd so the
    stride cycles the full (power-of-two) table."""
    h = hashes.astype(np.uint64)
    h1 = (h & np.uint64(0xFFFFFFFF)).astype(np.int64)
    h2 = ((h >> np.uint64(32)).astype(np.int64) | 1)
    i = np.arange(k, dtype=np.int64)
    return (h1[:, None] + i[None, :] * h2[:, None]) % m_bits


def bloom_partial(values, *, m_bits: int, k: int) -> np.ndarray:
    """One batch's packed filter (uint64[m_bits/64])."""
    from jerex_ray.util import md5_hash64_batch
    words = np.zeros(m_bits // 64, dtype=np.uint64)
    vals = np.asarray(values)
    if vals.size == 0:
        return words
    h = md5_hash64_batch(v if isinstance(v, str) else str(v)
                         for v in vals.tolist())
    pos = _bloom_positions(h, m_bits, k).ravel()
    np.bitwise_or.at(words, pos // 64,
                     np.uint64(1) << (pos % 64).astype(np.uint64))
    return words


def bloom_build(ds, *, column: str, m_bits: int = 1 << 20,
                k: int = 4) -> np.ndarray:
    """Build the filter over a Dataset column: per-batch partials →
    tree-reduce bitwise OR. ``m_bits`` must be a multiple of 64."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"bits": [bloom_partial(
            batch[column].to_numpy(), m_bits=m_bits, k=k)]})

    def merge(block: pd.DataFrame) -> pd.DataFrame:
        stacked = np.stack([np.asarray(b, dtype=np.uint64)
                            for b in block["bits"].to_numpy()])
        return pd.DataFrame({"bits": [np.bitwise_or.reduce(stacked,
                                                           axis=0)]})

    merged = (ds.map_batches(partial, batch_format="pandas",
                             batch_size=65536)
              .repartition(8).map_batches(merge, batch_format="pandas",
                                          batch_size=None)
              .repartition(1).map_batches(merge, batch_format="pandas",
                                          batch_size=None)).to_pandas()
    if merged.empty:
        return np.zeros(m_bits // 64, dtype=np.uint64)
    return np.asarray(merged["bits"].iloc[0], dtype=np.uint64)


def bloom_contains(bits: np.ndarray, values, *, k: int = 4) -> np.ndarray:
    """Vectorized membership test (bool array; may have false
    positives, never false negatives)."""
    from jerex_ray.util import md5_hash64_batch
    vals = np.asarray(values)
    if vals.size == 0:
        return np.zeros(0, dtype=bool)
    m_bits = bits.size * 64
    h = md5_hash64_batch(v if isinstance(v, str) else str(v)
                         for v in vals.tolist())
    pos = _bloom_positions(h, m_bits, k)
    hit = (bits[pos // 64] >> (pos % 64).astype(np.uint64)) \
        & np.uint64(1)
    return hit.astype(bool).all(axis=1)


# ---------- count-min sketch (Cormode & Muthukrishnan '05) ----------
#
# The additive sibling of the HLL registers above: a depth×width
# counter matrix where row j counts values by md5("j|" + value) %
# width. Counters are MERGEABLE BY ADDITION, so a 100 TB column
# reduces to one depth×width int64 matrix per block, tree-summed —
# kilobytes through the object store, never the column. Estimates
# (min over rows at the value's buckets) are one-sided: never below
# the true count, above it only through collisions. The estimate is a
# DETERMINISTIC function of the data (md5-derived buckets), so the
# oracled query recomputes counters AND estimates exactly in SQL —
# same verification pattern as q_events_hll_users.


def _cms_buckets(values: np.ndarray, *, depth: int, width: int
                 ) -> np.ndarray:
    """(n, depth) bucket indices, row j hashing md5(f"{j}|{v}")."""
    from jerex_ray.util import md5_hash64_batch
    n = len(values)
    out = np.empty((n, depth), dtype=np.int64)
    svals = [v if isinstance(v, str) else str(v) for v in values.tolist()]
    for j in range(depth):
        h = md5_hash64_batch(f"{j}|{v}" for v in svals)
        out[:, j] = (h % np.uint64(width)).astype(np.int64)
    return out


def cms_partial(values, *, depth: int = 4, width: int = 1024
                ) -> np.ndarray:
    """One batch's (depth, width) int64 counter matrix."""
    counters = np.zeros((depth, width), dtype=np.int64)
    vals = np.asarray(values)
    if vals.size == 0:
        return counters
    b = _cms_buckets(vals, depth=depth, width=width)
    for j in range(depth):
        np.add.at(counters[j], b[:, j], 1)
    return counters


def cms_query(counters: np.ndarray, values, *, width: int | None = None
              ) -> np.ndarray:
    """Point estimates: min over rows of the value's counters."""
    counters = np.asarray(counters, dtype=np.int64)
    depth, w = counters.shape
    vals = np.asarray(values)
    if vals.size == 0:
        return np.empty(0, dtype=np.int64)
    b = _cms_buckets(vals, depth=depth, width=w)
    ests = np.stack([counters[j][b[:, j]] for j in range(depth)], axis=1)
    return ests.min(axis=1)


def cms_build(ds, *, column: str, depth: int = 4, width: int = 1024
              ) -> np.ndarray:
    """Distributed build: per-batch partials → tree-reduce SUM."""
    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        c = cms_partial(batch[column].to_numpy(), depth=depth, width=width)
        return pd.DataFrame({"c": [c.ravel()]})

    def merge(block: pd.DataFrame) -> pd.DataFrame:
        stacked = np.stack([np.asarray(r, dtype=np.int64)
                            for r in block["c"].to_numpy()])
        return pd.DataFrame({"c": [stacked.sum(axis=0)]})

    merged = (ds.map_batches(partial, batch_format="pandas",
                             batch_size=65536)
              .repartition(8).map_batches(merge, batch_format="pandas",
                                          batch_size=None)
              .repartition(1).map_batches(merge, batch_format="pandas",
                                          batch_size=None))
    out = merged.to_pandas()
    if out.empty:
        return np.zeros((depth, width), dtype=np.int64)
    return np.asarray(out["c"].iloc[0], dtype=np.int64) \
        .reshape(depth, width)


def cms_counts_by(ds, *, column: str, depth: int = 4, width: int = 1024
                  ) -> pd.DataFrame:
    """CMS point estimates for every distinct value of ``column``:
    one distributed counter build + one distinct-values aggregate
    (both combiner-backed; the distinct set is assumed
    dimension-bounded — categorical columns), then a vectorized
    estimate per distinct value. Returns (value, cms_count)."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    counters = cms_build(ds, column=column, depth=depth, width=width)
    distinct = grouped_aggregate(ds, [column], {"n": (None, "count")}) \
        .to_pandas()
    vals = distinct[column].to_numpy()
    return pd.DataFrame({
        column: vals,
        "cms_count": cms_query(counters, vals).astype("int64")})
