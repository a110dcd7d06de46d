"""Bloom-filter semi-join pushdown audit — the runtime-filter
primitive every distributed engine uses to prune a big probe side
before the shuffle (Bloom '70; the "bloom join" of Mackert & Lohman
'86, today's Spark/Presto/DuckDB runtime filters).

The filter itself is the scale trick: no matter how large the build
side's key set, the ONLY state that crosses the cluster is an
``m``-bit bitmap. Build fragments each contribute their local bit
positions, the positions reduce through the combiner (vocabulary
bounded by ``m`` — the driver never sees keys, only set bits), and the
probe side streams once against the broadcast bitmap. The audit also
computes the EXACT semi-join counts via one hash co-location of
``(key, is_key, n_rows)`` partials — never a pair join — so the output
quantifies exactly what the filter would save and what its false
positives cost.

Determinism contract: bit positions are ``md5_64(f"{key}#{i}") % m``
(the repo-wide ``md5_hash64`` replay contract), so a SQL oracle can
recompute the identical bitmap and the identical pass/fail verdict for
every probe key. All outputs are integers except the single final
false-positive-rate divide.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

from jerex_ray.util import md5_hash64_batch

_EMPTY = pd.DataFrame([{
    "n_keys": 0, "bits_set": 0, "n_probe": 0, "n_pass": 0,
    "n_true": 0, "n_false_pos": 0, "fp_rate": 0.0}])


def _positions(vals: np.ndarray, m: int, n_hashes: int) -> np.ndarray:
    """(len(vals), n_hashes) uint64 bit positions for each key."""
    cols = [md5_hash64_batch([f"{v}#{i}" for v in vals]) % np.uint64(m)
            for i in range(n_hashes)]
    return np.stack(cols, axis=1)


def bloom_semijoin_audit(keys_ds, probe_ds, *, key_col: str,
                         probe_col: str, m: int = 65536,
                         n_hashes: int = 3,
                         num_partitions: int | None = None
                         ) -> pd.DataFrame:
    """One audit row: n_keys (distinct build keys), bits_set (of m),
    n_probe (probe rows), n_pass (rows passing the bloom), n_true
    (exact semi-join rows), n_false_pos = n_pass − n_true, and
    fp_rate = n_false_pos / (n_probe − n_true) (share of true
    non-matching rows the filter failed to prune; 0 when nothing to
    prune)."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import configure_data_context
    configure_data_context(ds=keys_ds)

    # -- build side: distinct keys (one combiner pass) ---------------
    dk = grouped_aggregate(keys_ds, [key_col],
                           {"n": (None, "count")}).drop_columns(["n"]) \
        .materialize()
    n_keys = dk.count()
    if n_keys == 0:
        return _EMPTY.copy()

    # -- bit positions: vocabulary bounded by m, reduced distributed -
    def pos_rows(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or key_col not in df.columns:
            return pd.DataFrame({"b": pd.Series(dtype="int64")})
        p = _positions(df[key_col].to_numpy(), m, n_hashes)
        return pd.DataFrame({"b": np.unique(p).astype(np.int64)})

    bits_df = grouped_aggregate(
        dk.map_batches(pos_rows, batch_format="pandas"),
        ["b"], {"n": (None, "count")}).to_pandas()
    bitmap = np.zeros(m, dtype=bool)
    bitmap[bits_df["b"].to_numpy(np.int64)] = True
    bits_set = int(bitmap.sum())

    # -- probe side: one streaming pass against the broadcast bitmap -
    def probe_partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or probe_col not in df.columns:
            return pd.DataFrame({"n": pd.Series(dtype="int64"),
                                 "np_": pd.Series(dtype="int64")})
        vals = df[probe_col].to_numpy()
        uniq, inv = np.unique(vals, return_inverse=True)
        p = _positions(uniq, m, n_hashes)
        ok = bitmap[p.astype(np.int64)].all(axis=1)
        return pd.DataFrame({"n": [len(vals)],
                             "np_": [int(ok[inv].sum())]})

    pp = probe_ds.map_batches(probe_partial,
                              batch_format="pandas").to_pandas()
    n_probe = int(pp["n"].sum()) if "n" in pp.columns else 0
    n_pass = int(pp["np_"].sum()) if "np_" in pp.columns else 0

    # -- exact semi-join count: hash co-location of per-key partials -
    def key_mark(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or key_col not in df.columns:
            return pd.DataFrame({"k": pd.Series(dtype="int64"),
                                 "is_key": pd.Series(dtype="int64"),
                                 "n_li": pd.Series(dtype="int64")})
        return pd.DataFrame({"k": df[key_col].to_numpy(),
                             "is_key": 1, "n_li": 0})

    def probe_mark(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or probe_col not in df.columns:
            return pd.DataFrame({"k": pd.Series(dtype="int64"),
                                 "is_key": pd.Series(dtype="int64"),
                                 "n_li": pd.Series(dtype="int64")})
        g = df.groupby(probe_col, sort=False).size()
        return pd.DataFrame({"k": g.index.to_numpy(),
                             "is_key": 0,
                             "n_li": g.to_numpy(np.int64)})

    both = dk.map_batches(key_mark, batch_format="pandas").union(
        probe_ds.map_batches(probe_mark, batch_format="pandas"))
    per_key = grouped_aggregate(
        both, ["k"], {"has": ("is_key", "max"), "n": ("n_li", "sum")},
        num_partitions=num_partitions, result_hint="large")

    def true_partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "has" not in df.columns:
            return pd.DataFrame({"t": pd.Series(dtype="int64")})
        return pd.DataFrame(
            {"t": [int(df.loc[df["has"] == 1, "n"].sum())]})

    tp = per_key.map_batches(true_partial,
                             batch_format="pandas").to_pandas()
    n_true = int(tp["t"].sum()) if "t" in tp.columns else 0

    n_fp = n_pass - n_true
    denom = n_probe - n_true
    fp_rate = (n_fp / denom) if denom else 0.0
    return pd.DataFrame([{
        "n_keys": int(n_keys), "bits_set": bits_set,
        "n_probe": n_probe, "n_pass": n_pass, "n_true": n_true,
        "n_false_pos": n_fp,
        "fp_rate": float(np.floor(abs(fp_rate) * 1e6 + 0.5) / 1e6)}])
