"""Skew-handling tests: salted aggregation, hot keys, length bucketing."""

import numpy as np
import pandas as pd
import ray.data as rd

from jerex_ray.functions.aggregate import grouped_aggregate
from jerex_ray.stages.bucket import length_bucket


def _skewed(n=50_000, seed=9):
    rng = np.random.default_rng(seed)
    # 90% of rows hit one hot key
    keys = np.where(rng.random(n) < 0.9, "hot",
                    rng.choice([f"k{i}" for i in range(100)], n))
    return pd.DataFrame({"k": keys, "v": np.ones(n)})


def test_salted_large_aggregate_matches_unsalted():
    df = _skewed()
    ds1 = rd.from_pandas(df).repartition(8)
    ds2 = rd.from_pandas(df).repartition(8)
    specs = {"n": (None, "count"), "s": ("v", "sum")}
    plain = grouped_aggregate(ds1, ["k"], specs,
                              result_hint="large").to_pandas()
    salted = grouped_aggregate(ds2, ["k"], specs, result_hint="large",
                               salt_buckets=4).to_pandas()
    a = plain.sort_values("k").reset_index(drop=True)
    b = salted.sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    assert int(a[a["k"] == "hot"]["n"].iloc[0]) == (df["k"] == "hot").sum()


def test_tree_reduce_matches_pandas_on_skew():
    df = _skewed(20_000)
    out = grouped_aggregate(rd.from_pandas(df).repartition(6), ["k"],
                            {"n": (None, "count")}).to_pandas()
    want = df.groupby("k").size()
    got = dict(zip(out["k"], out["n"]))
    assert got == want.to_dict()


def test_length_bucket_sorts_blocks():
    import pyarrow as pa
    t = pa.table({"doc_id": [f"d{i}" for i in range(100)],
                  "n_subwords": pa.array(
                      np.random.default_rng(1).integers(5, 700, 100),
                      pa.int32())})
    out = length_bucket(rd.from_arrow(t))
    for batch in out.iter_batches(batch_size=None, batch_format="pyarrow"):
        lens = batch["n_subwords"].to_numpy()
        assert (np.diff(lens) >= 0).all()


def test_grouped_topk_exact_and_skewed():
    import ray.data as rd

    from jerex_ray.functions.aggregate import grouped_topk
    rng = np.random.default_rng(8)
    # skewed: one hot key with 5000 rows, many cold keys with 3
    hot = pd.DataFrame({"k": "hot", "v": rng.standard_normal(5000),
                        "id": np.arange(5000)})
    cold = pd.DataFrame({"k": [f"c{i}" for i in range(50) for _ in range(3)],
                         "v": rng.standard_normal(150),
                         "id": np.arange(5000, 5150)})
    df = pd.concat([hot, cold], ignore_index=True)
    ds = rd.from_pandas(df).repartition(8)
    out = grouped_topk(ds, ["k"], order_by="v", k=4,
                       tie_cols=["id"]).to_pandas()
    ref = df.sort_values(["v", "id"], ascending=[False, True]) \
        .groupby("k", sort=False).head(4)
    for key, sub in ref.groupby("k"):
        got = out.loc[out["k"] == key].sort_values(
            ["v", "id"], ascending=[False, True])
        assert list(got["id"]) == list(sub["id"]), key
    # cold keys with fewer than k rows keep all rows
    assert (out.groupby("k").size().loc[[f"c{i}" for i in range(50)]]
            == 3).all()


def test_global_rank_with_heavy_value_ties():
    import ray.data as rd

    from jerex_ray.relational import global_rank
    rng = np.random.default_rng(14)
    # heavy ties: only 10 distinct values over 2000 rows, so tied
    # runs straddle many quantile pivots
    df = pd.DataFrame({"id": np.arange(2000, dtype=np.int64),
                       "v": rng.integers(0, 10, 2000).astype(float)})
    out = global_rank(rd.from_pandas(df).repartition(9),
                      value_col="v", id_col="id",
                      num_buckets=16).to_pandas()
    ref = df.sort_values(["v", "id"]).reset_index(drop=True)
    ref["rnk"] = np.arange(len(ref), dtype=np.int64)
    got = out.sort_values("id").reset_index(drop=True)
    want = ref.sort_values("id").reset_index(drop=True)
    np.testing.assert_array_equal(got["rnk"], want["rnk"])
    assert sorted(out["rnk"]) == list(range(2000))


def test_grouped_mode_ties_and_hot_keys():
    import ray.data as rd

    from jerex_ray.functions.aggregate import grouped_mode

    rng = np.random.default_rng(9)
    # hot key 0 with a deliberate tie between 'a' and 'b'
    df = pd.DataFrame({
        "k": np.concatenate([np.zeros(400, dtype=np.int64),
                             rng.integers(1, 20, 300)]),
        "v": (["a"] * 200 + ["b"] * 200
              + [f"v{i}" for i in rng.integers(0, 5, 300)])})
    out = grouped_mode(rd.from_pandas(df), ["k"], value_col="v") \
        .to_pandas().sort_values("k").reset_index(drop=True)
    # tie at key 0: lexicographically smallest wins
    assert out.loc[0, "mode_value"] == "a"
    assert out.loc[0, "mode_count"] == 200
    # parity with a pandas reference on the rest
    want = (df.groupby(["k", "v"]).size().reset_index(name="n")
            .sort_values(["k", "n", "v"], ascending=[True, False, True])
            .drop_duplicates("k").reset_index(drop=True))
    got = out.set_index("k")["mode_value"]
    for k, v in want.set_index("k")["v"].items():
        assert got[k] == v
