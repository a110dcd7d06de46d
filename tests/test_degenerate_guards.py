"""Round-4 ADVICE guards: degenerate inputs that previously raised
(empty MH stratum, <=25-hour conformal grid, <2 Gumbel blocks) now
emit sentinel rows matching their DuckDB oracles bit-for-bit; the
simrank overflow guard raises ValueError (survives ``python -O``)
and HnswIndex validates ``m``."""

import duckdb
import numpy as np
import pandas as pd
import pytest


def _tiny_events(user_ids, *, minutes=17):
    n = len(user_ids)
    return pd.DataFrame({
        "ts": (pd.to_datetime("2024-01-01")
               + pd.to_timedelta(np.arange(n) * minutes, unit="m")),
        "user_id": np.asarray(user_ids, dtype=np.int64),
        "event_type": ["view"] * (n - 1) + ["purchase"],
        "value": np.linspace(10, 200, n)})


def _check_vs_oracle(tmp_path, name, fn, events):
    events.to_parquet(str(tmp_path / "events.parquet"))
    from jerex_ray.pipelines.queries import build_oracle_sql
    ours = fn(str(tmp_path)).reset_index(drop=True)
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM read_parquet("
                f"'{tmp_path}/events.parquet')")
    oracle = con.execute(build_oracle_sql()[name]).df() \
        .reset_index(drop=True)
    a = ours[sorted(ours.columns)].astype(str)
    b = oracle[sorted(oracle.columns)].astype(str)
    assert a.equals(b), f"{name}:\n{ours}\nvs oracle\n{oracle}"
    return ours


def test_conformal_short_grid_sentinel(tmp_path):
    from jerex_ray.pipelines.queries import q_events_conformal
    out = _check_vs_oracle(tmp_path, "q_events_conformal",
                           q_events_conformal,
                           _tiny_events(np.arange(10)))
    assert out["qhat"].iloc[0] == -1
    assert out["coverage"].iloc[0] == -1.0


def test_gumbel_single_block_sentinel(tmp_path):
    from jerex_ray.pipelines.queries import q_events_gumbel
    ev = _tiny_events(np.arange(10))
    ev["ts"] = (pd.to_datetime("2024-01-01")
                + pd.to_timedelta(np.arange(10) * 3, unit="h"))
    out = _check_vs_oracle(tmp_path, "q_events_gumbel",
                           q_events_gumbel, ev)
    assert out["n_days"].iloc[0] == 1
    assert out["sigma"].iloc[0] == -1.0
    assert out["max_daily_peak"].iloc[0] >= 1


def test_mantel_haenszel_skips_empty_strata(tmp_path):
    from jerex_ray.pipelines.queries import q_events_mantel_haenszel
    # users only in strata 0/1 of user_id % 4: previously P=0 ->
    # ZeroDivisionError; now the empty strata are skipped like the SQL
    out = _check_vs_oracle(
        tmp_path, "q_events_mantel_haenszel", q_events_mantel_haenszel,
        _tiny_events([0, 1, 4, 5, 8, 9, 12, 13, 16, 17]))
    assert sorted(out["stratum"]) == [0, 1]


def test_simrank_overflow_guard_raises_valueerror():
    from jerex_ray.ops.graph import simrank_fixed_point
    hub = 0
    spokes = np.arange(1, 2000, dtype=np.int64)
    edges = pd.DataFrame({"a": np.full(len(spokes), hub), "b": spokes})
    with pytest.raises(ValueError, match="overflow"):
        simrank_fixed_point(edges, src="a", dst="b", rounds=1,
                            scale=10 ** 12)


def test_hnsw_m_validated():
    from jerex_ray.ops.ann import HnswIndex
    rng = np.random.default_rng(0)
    with pytest.raises(ValueError, match="m must be >= 2"):
        HnswIndex(np.arange(4), rng.normal(size=(4, 8)), m=1)


def test_max_excess_window_midseries_start_engine_matches_oracle(tmp_path):
    """Round-4 oracle bugfix: the Kadane oracle reported the prefix
    ARGMIN as the window start (off by one) whenever the best window
    starts mid-series (prefix min < 0); the sf0.01 gate happened to
    take the min==0 branch and never saw it. Craft a series whose
    burst sits in the middle and pin engine == oracle."""
    from jerex_ray.pipelines.queries import q_events_max_excess_window
    # hours 0-9 quiet (1 event), 10-13 burst (9 events), 14-29 quiet
    counts = [1] * 10 + [9] * 4 + [1] * 16
    ts = []
    for h, c in enumerate(counts):
        for k in range(c):
            ts.append(pd.Timestamp("2024-03-01") + pd.Timedelta(
                hours=h, minutes=k))
    ev = pd.DataFrame({
        "ts": pd.Series(ts).astype("datetime64[us]"),
        "user_id": np.arange(len(ts), dtype=np.int64),
        "event_type": ["view"] * len(ts),
        "value": np.full(len(ts), 10.0)})
    out = _check_vs_oracle(tmp_path, "q_events_max_excess_window",
                           q_events_max_excess_window, ev)
    h0 = int(pd.Timestamp("2024-03-01").value // 10**9 // 3600)
    assert out["start_hour"].iloc[0] == h0 + 10
    assert out["end_hour"].iloc[0] == h0 + 13
    assert out["window_len"].iloc[0] == 4
