"""Window/as-of operator tests against pandas oracles."""

import numpy as np
import pandas as pd
import ray.data as rd

from jerex_ray.ops.windows import (asof_join, session_windows,
                                   sliding_window, tumbling_window)


def _events(n=500, seed=3):
    rng = np.random.default_rng(seed)
    ts = (pd.Timestamp("2026-01-01")
          + pd.to_timedelta(np.sort(rng.integers(0, 7 * 24 * 3600, n)), "s"))
    return pd.DataFrame({
        "user_id": rng.integers(0, 12, n),
        "event_type": rng.choice(["click", "view", "buy"], n),
        "ts": ts,
        "value": rng.random(n).round(3),
    })


def test_tumbling_window_matches_pandas():
    df = _events()
    out = tumbling_window(rd.from_pandas(df), keys=["event_type"],
                          ts_col="ts", every="6h",
                          specs={"n": (None, "count"),
                                 "v": ("value", "sum")}).to_pandas()
    want = (df.assign(window_start=df["ts"].dt.floor("6h"))
            .groupby(["event_type", "window_start"])
            .agg(n=("value", "size"), v=("value", "sum")).reset_index())
    a = out.sort_values(["event_type", "window_start"]).reset_index(drop=True)
    b = want.sort_values(["event_type", "window_start"]).reset_index(drop=True)
    assert len(a) == len(b)
    assert (a["n"].to_numpy() == b["n"].to_numpy()).all()
    assert np.allclose(a["v"], b["v"])


def test_sliding_window_counts():
    df = _events(200)
    out = sliding_window(rd.from_pandas(df), keys=["event_type"],
                         ts_col="ts", size="2h", slide="1h",
                         specs={"n": (None, "count")}).to_pandas()
    # oracle: every event contributes to exactly 2 windows
    assert out["n"].sum() == 2 * len(df)
    # spot-check one window against a brute-force count
    row = out.iloc[0]
    ws = row["window_start"]
    mask = ((df["event_type"] == row["event_type"])
            & (df["ts"] >= ws) & (df["ts"] < ws + pd.Timedelta("2h")))
    assert int(row["n"]) == int(mask.sum())


def test_session_windows_gap_semantics():
    ts = pd.to_datetime([
        "2026-01-01 00:00", "2026-01-01 00:10", "2026-01-01 02:00",
        "2026-01-01 02:30", "2026-01-01 00:05"])
    df = pd.DataFrame({"user_id": [1, 1, 1, 1, 2], "ts": ts})
    out = session_windows(rd.from_pandas(df), key="user_id", ts_col="ts",
                          gap="30min").to_pandas()
    u1 = out[out["user_id"] == 1].sort_values("session_start")
    assert list(u1["n_events"]) == [2, 2]  # gap 00:10→02:00 splits
    assert len(out[out["user_id"] == 2]) == 1


def test_asof_join_matches_merge_asof():
    ev = _events(300, seed=5)
    rng = np.random.default_rng(7)
    left = pd.DataFrame({
        "user_id": rng.integers(0, 12, 80),
        "ts": (pd.Timestamp("2026-01-02")
               + pd.to_timedelta(rng.integers(0, 5 * 24 * 3600, 80), "s")),
        "order_id": np.arange(80),
    })
    out = asof_join(rd.from_pandas(left), rd.from_pandas(ev),
                    key="user_id", left_ts="ts", right_ts="ts",
                    right_cols=["value"]).to_pandas()
    want = pd.merge_asof(left.sort_values("ts"),
                         ev[["user_id", "ts", "value"]].sort_values("ts"),
                         on="ts", by="user_id", direction="backward")
    a = out.sort_values("order_id").reset_index(drop=True)
    b = want.sort_values("order_id").reset_index(drop=True)
    assert len(a) == len(b) == 80
    av, bv = a["value"].astype(float), b["value"].astype(float)
    assert ((av == bv) | (av.isna() & bv.isna())).all()


def test_range_join_agg_matches_pandas():
    """Keyed range join (count+sum in [ts-lower, ts+upper]) vs a
    brute-force pandas reference, including empty-window rows and
    inclusive bounds."""
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from jerex_ray.ops.windows import range_join_agg
    rng = np.random.default_rng(9)
    base = pd.Timestamp("2026-01-01")
    left = pd.DataFrame({
        "k": rng.integers(0, 5, 40),
        "lts": [base + pd.Timedelta(minutes=int(m))
                for m in rng.integers(0, 500, 40)],
        "left_id": range(40)})
    right = pd.DataFrame({
        "k": rng.integers(0, 6, 200),
        "rts": [base + pd.Timedelta(minutes=int(m))
                for m in rng.integers(0, 500, 200)],
        "value": rng.random(200).round(3)})
    got = range_join_agg(rd.from_pandas(left), rd.from_pandas(right),
                         key="k", left_ts="lts", right_ts="rts",
                         lower="30min", upper="10min",
                         value_col="value").to_pandas() \
        .sort_values("left_id").reset_index(drop=True)
    lo, up = pd.Timedelta("30min"), pd.Timedelta("10min")
    for _, row in got.iterrows():
        m = right[(right["k"] == row["k"])
                  & (right["rts"] >= row["lts"] - lo)
                  & (right["rts"] <= row["lts"] + up)]
        assert row["n_matches"] == len(m)
        assert abs(row["sum_value"] - m["value"].sum()) < 1e-9
    assert len(got) == 40
    assert (got["n_matches"] == 0).any()   # some empty windows exist


def test_grouped_quantile_buckets():
    import ray.data as rd

    from jerex_ray.ops.quantiles import grouped_quantile_buckets
    rng = np.random.default_rng(4)
    df = pd.DataFrame({"k": np.repeat(["a", "b"], 200),
                       "v": np.concatenate([rng.normal(0, 1, 200),
                                            rng.normal(5, 2, 200)])})
    out = grouped_quantile_buckets(rd.from_pandas(df), "k", "v") \
        .to_pandas()
    # each group splits ~evenly into 4 buckets
    for g, sub in out.groupby("k"):
        counts = sub["bucket"].value_counts().sort_index()
        assert list(counts.index) == [1, 2, 3, 4]
        assert counts.min() >= 45 and counts.max() <= 55
    # bucket is monotone in value within a group
    for g, sub in out.groupby("k"):
        s = sub.sort_values("v")
        assert (np.diff(s["bucket"].to_numpy()) >= 0).all()


def test_lag_delta_matches_pandas():
    import ray.data as rd

    from jerex_ray.ops.windows import lag_delta
    rng = np.random.default_rng(12)
    n = 400
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 20, n),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 10**6, n), unit="s")})
    out = lag_delta(rd.from_pandas(df).repartition(6), key="user_id",
                    ts_col="ts", id_col="event_id").to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    ref = df.sort_values(["user_id", "ts", "event_id"]).copy()
    ref["delta_s"] = ref.groupby("user_id")["ts"].diff() \
        .dt.total_seconds().apply(np.floor)
    ref = ref.sort_values("event_id").reset_index(drop=True)
    np.testing.assert_allclose(out["delta_s"], ref["delta_s"],
                               equal_nan=True)


# ---------- streaming watermark / late side channel ----------

def test_watermark_tag_late_semantics_hand_case():
    import ray.data as rd

    from jerex_ray.ops.streaming import watermark_tag

    # one shard (n_shards=1); explicit arrival column
    t0 = pd.Timestamp("2024-01-01")
    rows = pd.DataFrame({
        "event_id": [0, 1, 2, 3, 4],
        "ts": [t0, t0 + pd.Timedelta("2h"),
               t0 + pd.Timedelta("1h"),          # 1h behind wm → late
               t0 + pd.Timedelta("90min"),       # exactly wm → on time
               t0 + pd.Timedelta("3h")],
        "arrival": [t0, t0 + pd.Timedelta("2h"),
                    t0 + pd.Timedelta("2h01min"),
                    t0 + pd.Timedelta("2h02min"),
                    t0 + pd.Timedelta("3h")],
    })
    out = watermark_tag(rd.from_pandas(rows), lateness="30min",
                        n_shards=1, arrival_col="arrival").to_pandas()
    out = out.sort_values("event_id")
    # wm after event 1 = 2h - 30min = 90min; event 2 ts=1h < 90min →
    # late; event 3 ts=90min is NOT strictly below → on time; the
    # first event has no watermark → never late
    assert list(out["is_late"]) == [False, False, True, False, False]


def test_watermark_shards_are_independent():
    import ray.data as rd

    from jerex_ray.ops.streaming import watermark_tag

    t0 = pd.Timestamp("2024-01-01")
    # shard 0 (even ids) advances far; shard 1 (odd ids) stays early.
    # The late odd event would be late under a GLOBAL watermark but is
    # on time for its own shard.
    rows = pd.DataFrame({
        "event_id": [0, 2, 1, 3],
        "ts": [t0, t0 + pd.Timedelta("10h"),
               t0, t0 + pd.Timedelta("5min")],
        "arrival": [t0, t0 + pd.Timedelta("10h"),
                    t0 + pd.Timedelta("10h"), t0 + pd.Timedelta("11h")],
    })
    out = watermark_tag(rd.from_pandas(rows), lateness="30min",
                        n_shards=2, arrival_col="arrival").to_pandas()
    assert not out["is_late"].any()


def test_stream_window_aggregate_excludes_late_rows():
    import ray.data as rd

    from jerex_ray.ops.streaming import stream_window_aggregate

    t0 = pd.Timestamp("2024-01-01")
    rows = pd.DataFrame({
        "event_id": [0, 1, 2],
        "ts": [t0 + pd.Timedelta("10min"), t0 + pd.Timedelta("5h"),
               t0 + pd.Timedelta("20min")],   # arrives after wm → late
        "arrival": [t0 + pd.Timedelta("10min"), t0 + pd.Timedelta("5h"),
                    t0 + pd.Timedelta("5h01min")],
        "value": [1.0, 2.0, 100.0],
    })
    from jerex_ray.ops.streaming import watermark_tag
    tagged = watermark_tag(rd.from_pandas(rows), lateness="30min",
                           n_shards=1, arrival_col="arrival",
                           keep_cols=["value"]).to_pandas()
    assert list(tagged.sort_values("event_id")["is_late"]) == \
        [False, False, True]
    # windows via the composed aggregate (md5-jitter path exercised by
    # the oracled query; here just the hand case through tagging)
    d = tagged[~tagged["is_late"]]
    assert d["value"].sum() == 3.0


def test_watermark_tag_matches_sequential_reference_randomized():
    """Randomized parity: the distributed watermark tagger equals a
    per-shard sequential replay (the semantics spec) across 30 random
    event sets with random jitter and shard counts."""
    import ray.data as rd

    from jerex_ray.ops.streaming import watermark_tag

    rng = np.random.default_rng(17)
    t0 = pd.Timestamp("2024-01-01")
    for trial in range(30):
        n = int(rng.integers(1, 60))
        n_shards = int(rng.integers(1, 4))
        ids = np.arange(n)
        ts = t0 + pd.to_timedelta(rng.integers(0, 7200, n), unit="s")
        arrival = ts + pd.to_timedelta(rng.integers(0, 3600, n),
                                       unit="s")
        late_td = pd.Timedelta(minutes=int(rng.integers(1, 90)))
        df = pd.DataFrame({"event_id": ids, "ts": ts,
                           "arrival": arrival})
        got = watermark_tag(rd.from_pandas(df),
                            lateness=str(late_td), n_shards=n_shards,
                            arrival_col="arrival").to_pandas() \
            .sort_values("event_id")["is_late"].to_numpy()
        # sequential replay per shard
        want = np.zeros(n, dtype=bool)
        for s in range(n_shards):
            m = ids % n_shards == s
            sub = df[m].sort_values(["arrival", "event_id"])
            wm = None
            for i, row in sub.iterrows():
                if wm is not None and row["ts"] < wm - late_td:
                    want[row["event_id"]] = True
                wm = row["ts"] if wm is None else max(wm, row["ts"])
        assert (got == want).all(), f"trial {trial}"


def test_asof_join_forward_direction():
    import ray.data as rd

    from jerex_ray.ops.windows import asof_join

    t0 = pd.Timestamp("2024-01-01")
    left = pd.DataFrame({"k": [1, 1, 2], "lt": [t0, t0 + pd.Timedelta("2h"),
                                                t0]})
    right = pd.DataFrame({"k": [1, 1, 2],
                          "rt": [t0 + pd.Timedelta("1h"),
                                 t0 + pd.Timedelta("3h"),
                                 t0 - pd.Timedelta("1h")],
                          "v": [10.0, 20.0, 30.0]})
    out = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                    key="k", left_ts="lt", right_ts="rt",
                    right_cols=["v"], direction="forward").to_pandas()
    out = out.sort_values(["k", "lt"]).reset_index(drop=True)
    # k=1 @t0 → first right at-or-after = 1h (10.0); @2h → 3h (20.0);
    # k=2 @t0 → nothing after → NaN
    assert list(out["v"].fillna(-1)) == [10.0, 20.0, -1]


def test_transition_matrix_counts_and_probs():
    import ray.data as rd
    from jerex_ray.ops.windows import transition_matrix
    ts = pd.to_datetime(["2024-01-01 00:00", "2024-01-01 00:01",
                         "2024-01-01 00:02", "2024-01-01 00:03",
                         "2024-01-01 00:00", "2024-01-01 00:05"])
    df = pd.DataFrame({
        "event_id": [1, 2, 3, 4, 5, 6],
        "user_id": [1, 1, 1, 1, 2, 2],
        "ts": ts,
        "event_type": ["a", "b", "a", "b", "a", "c"]})
    out = transition_matrix(rd.from_pandas(df), key="user_id",
                            ts_col="ts", id_col="event_id",
                            type_col="event_type")
    # user 1: a→b, b→a, a→b ; user 2: a→c
    got = {(r["prev_type"], r["next_type"]): (r["cnt"], r["prob"])
           for _, r in out.iterrows()}
    assert got[("a", "b")] == (2, round(2 / 3, 6))
    assert got[("a", "c")] == (1, round(1 / 3, 6))
    assert got[("b", "a")] == (1, 1.0)
    assert len(got) == 3
    # single-row keys and empty input produce no transitions
    empty = transition_matrix(
        rd.from_pandas(df.head(1)), key="user_id", ts_col="ts",
        id_col="event_id", type_col="event_type")
    assert empty.empty


def test_user_coverage_matches_bruteforce():
    import pyarrow.parquet as pq
    from jerex_ray.pipelines.queries import q_user_coverage
    out = q_user_coverage("/root/testdata/sf0.001")
    df = pq.read_table("/root/testdata/sf0.001/events.parquet",
                       columns=["ts", "user_id"]).to_pandas()
    W = 300 * 1_000_000
    for uid, g in df.groupby("user_id"):
        ivs = sorted((int(t), int(t) + W)
                     for t in g["ts"].astype("int64"))
        merged = []
        for s, e in ivs:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        row = out[out["user_id"] == uid].iloc[0]
        assert row["n_islands"] == len(merged)
        assert row["covered_sec"] == sum((e - s) // 1_000_000
                                         for s, e in merged)


def test_user_twap_matches_bruteforce():
    import pyarrow.parquet as pq
    from jerex_ray.pipelines.queries import q_user_twap
    out = q_user_twap("/root/testdata/sf0.001") \
        .set_index("user_id")["twap"]
    df = pq.read_table("/root/testdata/sf0.001/events.parquet",
                       columns=["event_id", "ts", "user_id", "value"]) \
        .to_pandas()
    for uid, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        t = g["ts"].astype("int64").to_numpy()
        v = g["value"].to_numpy()
        if len(g) < 2:
            assert uid not in out.index
            continue
        dt = (t[1:] - t[:-1]).astype(float)
        if dt.sum() <= 0:
            assert uid not in out.index
            continue
        exp = round(float((v[:-1] * dt).sum() / dt.sum()), 6)
        assert abs(out[uid] - exp) < 1e-9, uid


def test_events_chi2_identities():
    import pyarrow.parquet as pq
    from jerex_ray.pipelines.queries import q_events_chi2
    out = q_events_chi2("/root/testdata/sf0.001")
    df = pq.read_table("/root/testdata/sf0.001/events.parquet",
                       columns=["event_type", "ts"]).to_pandas()
    ct = pd.crosstab(df["event_type"], df["ts"].dt.hour)
    # observed grid matches and expected sums to N per margin
    n = ct.to_numpy().sum()
    assert int(out["obs"].sum()) == n
    assert abs(out["expected"].sum() - n) < 1e-3
    # spot-check one cell's contribution
    r = ct.sum(axis=1); c = ct.sum(axis=0)
    et, hr = out.iloc[0]["event_type"], int(out.iloc[0]["hr"])
    e = r[et] * c[hr] / n
    o = ct.loc[et, hr]
    assert abs(out.iloc[0]["contrib"] - round((o - e) ** 2 / e, 6)) \
        < 1e-9


def test_rolling_median_matches_bruteforce():
    import pyarrow.parquet as pq
    from jerex_ray.pipelines.queries import q_events_rolling_median
    out = q_events_rolling_median("/root/testdata/sf0.001") \
        .set_index("event_id")["med5"]
    df = pq.read_table("/root/testdata/sf0.001/events.parquet",
                       columns=["event_id", "ts", "user_id", "value"]) \
        .to_pandas()
    import statistics
    for uid, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        vals = g["value"].tolist()
        for i, eid in enumerate(g["event_id"]):
            exp = round(statistics.median(vals[max(0, i - 4):i + 1]), 6)
            assert abs(out[eid] - exp) < 1e-9


def test_since_anchor_matches_bruteforce():
    import pyarrow.parquet as pq
    from jerex_ray.pipelines.queries import q_events_since_anchor
    out = q_events_since_anchor("/root/testdata/sf0.001")
    got = dict(zip(out["event_id"], out["since_us"]))
    df = pq.read_table("/root/testdata/sf0.001/events.parquet",
                       columns=["event_id", "ts", "user_id",
                                "event_type"]).to_pandas()
    exp = {}
    for uid, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        anchor = None
        for _, r in g.iterrows():
            t = int(r["ts"].value) // 1000   # ns → µs
            if r["event_type"] == "purchase":
                anchor = t
            if anchor is not None:
                exp[int(r["event_id"])] = t - anchor
    assert got == exp


def test_top_trigrams_matches_bruteforce():
    import collections
    import pyarrow.parquet as pq
    from jerex_ray.pipelines.queries import q_events_top_trigrams
    out = q_events_top_trigrams("/root/testdata/sf0.001")
    df = pq.read_table("/root/testdata/sf0.001/events.parquet",
                       columns=["event_id", "ts", "user_id",
                                "event_type"]).to_pandas()
    cnt = collections.Counter()
    for uid, g in df.groupby("user_id"):
        t = g.sort_values(["ts", "event_id"])["event_type"].tolist()
        for i in range(len(t) - 2):
            cnt[(t[i], t[i + 1], t[i + 2])] += 1
    exp = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [((r.t1, r.t2, r.t3), r.n) for r in out.itertuples()]
    assert got == exp


def test_source_gini_matches_bruteforce():
    import pyarrow.parquet as pq
    from jerex_ray.pipelines.queries import doc_source_gini
    out = doc_source_gini("/root/testdata/sf0.001") \
        .set_index("source")["gini"]
    df = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                       columns=["source", "text"]).to_pandas()
    for src, g in df.groupby("source"):
        x = np.sort([len(t.split()) for t in g["text"].fillna("")])
        n, s = len(x), x.sum()
        exp = round(2.0 * float((np.arange(1, n + 1) * x).sum())
                    / (n * s) - (n + 1.0) / n, 6)
        assert abs(out[src] - exp) < 1e-9


def test_user_streaks_matches_bruteforce():
    import pyarrow.parquet as pq
    from jerex_ray.pipelines.queries import q_user_streaks
    out = q_user_streaks("/root/testdata/sf0.001").set_index("user_id")
    df = pq.read_table("/root/testdata/sf0.001/events.parquet",
                       columns=["ts", "user_id"]).to_pandas()
    for uid, g in df.groupby("user_id"):
        days = sorted({int(t.value // (86_400 * 10**9))
                       for t in g["ts"]})
        best = run = 1
        for a, b in zip(days, days[1:]):
            run = run + 1 if b == a + 1 else 1
            best = max(best, run)
        assert out.loc[uid, "max_streak"] == best
        assert out.loc[uid, "n_active_days"] == len(days)


def test_rolling_dau7_matches_bruteforce():
    import pyarrow.parquet as pq
    from jerex_ray.pipelines.queries import q_events_rolling_dau7
    out = q_events_rolling_dau7("/root/testdata/sf0.001")
    df = pq.read_table("/root/testdata/sf0.001/events.parquet",
                       columns=["ts", "user_id"]).to_pandas()
    df["day"] = df["ts"].astype("int64") // 86_400_000_000
    pairs = df[["day", "user_id"]].drop_duplicates()
    for _, r in out.iterrows():
        d = pd.Timestamp(r["day"]).value // (86_400 * 10**9)
        exp = pairs[(pairs["day"] >= d - 6) & (pairs["day"] <= d)] \
            ["user_id"].nunique()
        assert r["dau7"] == exp


def test_referential_integrity_counts():
    import duckdb
    from jerex_ray.pipelines.queries import q_referential_integrity
    out = q_referential_integrity("/root/testdata/sf0.001") \
        .set_index("check_name")["n"]
    con = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    ev = con.sql(f"""SELECT count(*) FROM '{sf}/events.parquet' e
        WHERE user_id NOT IN (SELECT c_custkey
                              FROM '{sf}/customer.parquet')""").fetchone()[0]
    li = con.sql(f"""SELECT count(*) FROM '{sf}/lineitem.parquet' l
        WHERE l_orderkey NOT IN (SELECT o_orderkey
                                 FROM '{sf}/orders.parquet')""").fetchone()[0]
    oc = con.sql(f"""SELECT count(*) FROM '{sf}/orders.parquet' o
        WHERE o_orderkey NOT IN (SELECT l_orderkey
                                 FROM '{sf}/lineitem.parquet')""").fetchone()[0]
    assert out["event_user_orphans"] == ev
    # the synthetic tables genuinely carry orphans at sf0.001 — the
    # audit must COUNT them, not assume TPC-H's closed-world keys
    assert out["lineitem_orphans"] == li
    assert out["orders_childless"] == oc


def test_dgim_guarantee_structure_and_crafted_streams():
    import numpy as np

    from jerex_ray.ops.streaming import dgim_replay

    # all-ones stream: buckets are the canonical power-of-two
    # staircase; at most two of each size
    n, w = 1000, 256
    res = dgim_replay(np.arange(1, n + 1), n, w)
    assert res["ones_in_window"] == w
    # 50% guarantee: error at most half the oldest bucket <= half
    # the true count
    assert res["abs_error"] * 2 <= res["ones_in_window"]
    assert res["largest"] >= 1

    # sparse stream: all ones in window, far apart -> exact answer
    pos = np.array([100, 300, 500, 700, 900])
    res2 = dgim_replay(pos, 1000, 950)
    assert res2["ones_in_window"] == 5
    # sizes stay 1 (never three of a size within expiry) -> exact
    # except the oldest-half rule on a size-1 bucket
    assert res2["abs_error"] <= 1

    # guarantee over random streams and windows
    rng = np.random.default_rng(3)
    for trial in range(5):
        nn = 4000
        bits = rng.random(nn) < 0.3
        ones = np.nonzero(bits)[0] + 1
        for ww in (64, 512, 2048):
            r = dgim_replay(ones, nn, ww)
            exact = int((ones > nn - ww).sum())
            assert r["ones_in_window"] == exact
            if exact:
                assert r["abs_error"] <= exact * 0.5 + 1
            # memory bound: O(log^2 W) buckets — generous 4x bound
            assert r["n_buckets"] <= 4 * max(
                1, int(np.log2(ww)) ** 2)

    # empty stream
    r0 = dgim_replay(np.array([], dtype=np.int64), 100, 10)
    assert r0["estimate"] == 0 and r0["ones_in_window"] == 0


def test_allen_classify_all_13_relations_and_census_identity():
    import numpy as np

    from jerex_ray.pipelines.queries import (_ALLEN_RELATIONS,
                                             _allen_classify,
                                             q_user_allen_census)

    # one crafted pair per basic relation, checked by name
    cases = {
        "before":        ((0, 2), (5, 9)),
        "meets":         ((0, 5), (5, 9)),
        "overlaps":      ((0, 6), (5, 9)),
        "starts":        ((5, 7), (5, 9)),
        "during":        ((6, 8), (5, 9)),
        "finishes":      ((6, 9), (5, 9)),
        "equals":        ((5, 9), (5, 9)),
        "after":         ((10, 12), (5, 9)),
        "met_by":        ((9, 12), (5, 9)),
        "overlapped_by": ((6, 12), (5, 9)),
        "started_by":    ((5, 12), (5, 9)),
        "contains":      ((4, 12), (5, 9)),
        "finished_by":   ((4, 9), (5, 9)),
    }
    for name, ((s1, e1), (s2, e2)) in cases.items():
        code = int(_allen_classify(
            np.array([s1]), np.array([e1]),
            np.array([s2]), np.array([e2]))[0])
        assert _ALLEN_RELATIONS[code] == name, (name, code)

    # exhaustiveness + mutual exclusivity on random integer pairs
    rng = np.random.default_rng(13)
    s1 = rng.integers(0, 50, 4000)
    d1 = rng.integers(1, 30, 4000)
    s2 = rng.integers(0, 50, 4000)
    d2 = rng.integers(1, 30, 4000)
    codes = _allen_classify(s1, s1 + d1, s2, s2 + d2)
    assert (codes >= 0).all() and (codes <= 12).all()
    # inverse symmetry: swapping the pair maps relation -> inverse
    inv = {0: 7, 1: 8, 2: 9, 3: 10, 4: 11, 5: 12, 6: 6,
           7: 0, 8: 1, 9: 2, 10: 3, 11: 4, 12: 5}
    swapped = _allen_classify(s2, s2 + d2, s1, s1 + d1)
    assert (swapped == np.array([inv[int(c)]
                                 for c in codes])).all()

    # census sums to C(n, 2) over the real data
    out = q_user_allen_census("/root/testdata/sf0.001")
    import pyarrow.parquet as pq
    n = pq.read_table("/root/testdata/sf0.001/events.parquet",
                      columns=["user_id"]).to_pandas() \
        ["user_id"].nunique()
    assert int(out["n"].sum()) == n * (n - 1) // 2
