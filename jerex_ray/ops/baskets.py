"""Market-basket association rules (Agrawal & Srikant '94, the
pair/2-itemset tier of Apriori) — the classic co-purchase miner, and
the same shape a training-data pipeline uses to mine co-occurring
tags/sources/labels.

For every unordered item pair co-occurring in ≥ ``min_pair_count``
baskets, both directed rules a→b are emitted with
support = c(a,b)/N, confidence = c(a,b)/c(a) and
lift = N·c(a,b)/(c(a)·c(b)).

Dataflow, scale-shaped: the distinct (basket, item) incidence reduces
through the combiner; baskets co-locate via ONE hash shuffle and each
block emits its per-basket item-pair wedges from a vectorized
self-merge (a basket of size s emits s(s−1)/2 wedges — the natural
cap is basket size, not corpus size); wedge partials reduce to pair
counts; the item-frequency table (item-bounded, dimension-sized)
broadcasts into the final streaming score pass. All counts are
integers, every statistic is a single division of exact float64
integers, so the SQL oracle matches bit-for-bit before the shared
6-decimal rounding.

The reference has no frequent-itemset mining (SURVEY.md §2.7); engine
extension for the LLM-data charter.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_EMPTY = {
    "antecedent": pd.Series(dtype="int64"),
    "consequent": pd.Series(dtype="int64"),
    "pair_count": pd.Series(dtype="int64"),
    "support": pd.Series(dtype="float64"),
    "confidence": pd.Series(dtype="float64"),
    "lift": pd.Series(dtype="float64"),
}


def association_rules(pairs_ds, *, basket_col: str, item_col: str,
                      min_pair_count: int = 2,
                      num_partitions: int | None = None):
    """Directed pair association rules over a (basket, item) Dataset;
    returns a Dataset of
    (antecedent, consequent, pair_count, support, confidence, lift)."""
    import ray

    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply

    inc = grouped_aggregate(pairs_ds, [basket_col, item_col],
                            {"n": (None, "count")},
                            num_partitions=num_partitions) \
        .drop_columns(["n"]).materialize()

    item_df = grouped_aggregate(inc, [item_col], {"c": (None, "count")},
                                num_partitions=num_partitions).to_pandas()
    if item_df.empty or item_col not in item_df.columns:
        return ray.data.from_pandas(pd.DataFrame(_EMPTY))
    n_baskets = int(
        grouped_aggregate(inc, [basket_col], {"c": (None, "count")},
                          num_partitions=num_partitions).count())
    item_counts = ray.put(dict(zip(item_df[item_col],
                                   item_df["c"].astype(int))))

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"ia": pd.Series(dtype="int64"),
                                 "ib": pd.Series(dtype="int64"),
                                 "c": pd.Series(dtype="int64")})
        m = df.merge(df, on=basket_col)
        xa, xb = f"{item_col}_x", f"{item_col}_y"
        m = m[m[xa] < m[xb]]
        g = m.groupby([xa, xb], sort=False).size().reset_index(name="c")
        return pd.DataFrame({"ia": g[xa].to_numpy(),
                             "ib": g[xb].to_numpy(),
                             "c": g["c"].to_numpy(np.int64)})

    pair_counts = grouped_aggregate(
        grouped_apply(inc, [basket_col], wedges,
                      num_partitions=num_partitions),
        ["ia", "ib"], {"cab": ("c", "sum")},
        num_partitions=num_partitions)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "cab" not in df.columns:
            return pd.DataFrame(_EMPTY)
        ic = ray.get(item_counts)
        df = df[df["cab"] >= min_pair_count]
        if df.empty:
            return pd.DataFrame(_EMPTY)
        both = pd.concat([
            df.rename(columns={"ia": "antecedent", "ib": "consequent"}),
            df.rename(columns={"ib": "antecedent", "ia": "consequent"})],
            ignore_index=True)
        # all three ratios are EXACT integer rationals, and power-of-2
        # denominators make 6-decimal HALF TIES real (lift×1e6 can be
        # k+0.5 exactly) — round half-away in INTEGER arithmetic
        # (python ints, no overflow at any scale) so numpy-banker's
        # vs SQL-half-away can never disagree
        M = 1_000_000

        def ha6(num: int, den: int) -> float:
            return ((2 * num * M + den) // (2 * den)) / 1e6

        cab = [int(x) for x in both["cab"]]
        ca = [int(ic[a]) for a in both["antecedent"]]
        cb = [int(ic[b]) for b in both["consequent"]]
        nb = int(n_baskets)
        return pd.DataFrame({
            "antecedent": both["antecedent"].astype("int64"),
            "consequent": both["consequent"].astype("int64"),
            "pair_count": both["cab"].astype("int64"),
            "support": [ha6(c, nb) for c in cab],
            "confidence": [ha6(c, a) for c, a in zip(cab, ca)],
            "lift": [ha6(nb * c, a * b)
                     for c, a, b in zip(cab, ca, cb)]})

    return pair_counts.map_batches(score, batch_format="pandas")


def frequent_triples(pairs_ds, *, basket_col: str, item_col: str,
                     min_count: int = 2,
                     num_partitions: int | None = None) -> pd.DataFrame:
    """Apriori level 3 (Agrawal & Srikant '94, with the real
    candidate-generation + pruning step): frequent 3-itemsets over
    baskets.

    1. Frequent pairs from the wedge pass (anti-monotonicity: any
       frequent triple's pairs are at least as frequent, so pruning
       at the SAME min_count is lossless).
    2. Candidate triples joined on a shared prefix — (a,b)+(a,c) →
       (a,b,c) kept only if (b,c) is also frequent — on the driver
       over the PAIR-BOUNDED table.
    3. Support counting streams baskets once: block-local joins of
       (basket, item) rows against the broadcast candidate prefix,
       then two membership semi-joins — never a full 3-way item
       explosion.

    Returns (item_a, item_b, item_c, support_count) with
    support_count ≥ min_count, integer-exact vs the SQL 3-way
    self-join oracle."""
    import ray

    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply

    inc = grouped_aggregate(pairs_ds, [basket_col, item_col],
                            {"n": (None, "count")},
                            num_partitions=num_partitions) \
        .drop_columns(["n"]).materialize()

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"ia": pd.Series(dtype="int64"),
                                 "ib": pd.Series(dtype="int64"),
                                 "c": pd.Series(dtype="int64")})
        m = df.merge(df, on=basket_col)
        xa, xb = f"{item_col}_x", f"{item_col}_y"
        m = m[m[xa] < m[xb]]
        g = m.groupby([xa, xb], sort=False).size().reset_index(name="c")
        return pd.DataFrame({"ia": g[xa].to_numpy(),
                             "ib": g[xb].to_numpy(),
                             "c": g["c"].to_numpy(np.int64)})

    pairs = grouped_aggregate(
        grouped_apply(inc, [basket_col], wedges,
                      num_partitions=num_partitions),
        ["ia", "ib"], {"cab": ("c", "sum")},
        num_partitions=num_partitions).to_pandas()
    EMPTY = pd.DataFrame({"item_a": pd.Series(dtype="int64"),
                          "item_b": pd.Series(dtype="int64"),
                          "item_c": pd.Series(dtype="int64"),
                          "support_count": pd.Series(dtype="int64")})
    if pairs.empty or "cab" not in pairs.columns:
        return EMPTY
    freq = pairs[pairs["cab"] >= min_count][["ia", "ib"]]
    if freq.empty:
        return EMPTY
    # candidate gen: shared first item, then prune on the (b, c) pair
    cand = freq.merge(freq, on="ia")
    cand = cand[cand["ib_x"] < cand["ib_y"]].rename(
        columns={"ib_x": "b", "ib_y": "c", "ia": "a"})
    pairset = set(zip(freq["ia"], freq["ib"]))
    keep = [
        (a, b, c) for a, b, c in zip(cand["a"], cand["b"], cand["c"])
        if (b, c) in pairset]
    if not keep:
        return EMPTY
    cand_df = pd.DataFrame(keep, columns=["a", "b", "c"])
    cand_ref = ray.put(cand_df)

    def count_triples(df: pd.DataFrame) -> pd.DataFrame:
        out_empty = pd.DataFrame({"a": pd.Series(dtype="int64"),
                                  "b": pd.Series(dtype="int64"),
                                  "c": pd.Series(dtype="int64"),
                                  "n": pd.Series(dtype="int64")})
        if df.empty:
            return out_empty
        cd = ray.get(cand_ref)
        items = df.rename(columns={item_col: "item"})
        j = items.merge(cd, left_on="item", right_on="a")
        if j.empty:
            return out_empty
        # membership semi-joins for b and c inside the same basket
        key = items[[basket_col, "item"]]
        j = j.merge(key, left_on=[basket_col, "b"],
                    right_on=[basket_col, "item"],
                    suffixes=("", "_b"))
        if j.empty:
            return out_empty
        j = j.merge(key, left_on=[basket_col, "c"],
                    right_on=[basket_col, "item"],
                    suffixes=("", "_c"))
        if j.empty:
            return out_empty
        g = j.groupby(["a", "b", "c"], sort=False).size() \
            .reset_index(name="n")
        g["n"] = g["n"].astype(np.int64)
        return g

    counts = grouped_aggregate(
        grouped_apply(inc, [basket_col], count_triples,
                      num_partitions=num_partitions),
        ["a", "b", "c"], {"n": ("n", "sum")},
        num_partitions=num_partitions).to_pandas()
    if counts.empty or "n" not in counts.columns:
        return EMPTY
    out = counts[counts["n"] >= min_count].rename(
        columns={"a": "item_a", "b": "item_b", "c": "item_c",
                 "n": "support_count"})
    for col in out.columns:
        out[col] = out[col].astype("int64")
    return out.sort_values(["item_a", "item_b", "item_c"]) \
        .reset_index(drop=True)
