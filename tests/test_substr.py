"""Tests for substring-level dedup (ops/substr.py)."""

import numpy as np
import pandas as pd
import ray.data as rd

from jerex_ray.ops.substr import duplicate_ratio, duplicate_spans


def _docs(texts):
    return rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}))


def _spans(ds, **kw):
    out = duplicate_spans(_docs(ds) if isinstance(ds, list) else ds,
                          **kw).to_pandas()
    if "doc_id" not in out.columns:
        return []
    return sorted(map(tuple, out[["doc_id", "start", "end"]].values))


def test_planted_cross_doc_duplicate():
    boiler = "alpha beta gamma delta epsilon zeta eta theta"  # 8 words
    texts = [f"unique{i} one{i} two{i} three{i} {boiler} "
             f"tail{i} end{i} x{i} y{i} z{i}" for i in range(2)]
    texts.append("completely different words nine ten eleven twelve "
                 "thirteen fourteen fifteen sixteen")
    spans = _spans(texts, n=8, min_count=2)
    # the boilerplate occupies words 4..12 in both docs; doc 2 clean
    assert (0, 4, 12) in spans and (1, 4, 12) in spans
    assert not any(d == 2 for d, _, _ in spans)


def test_within_doc_repetition_counts():
    eight = "a b c d e f g h"
    text = f"{eight} filler1 filler2 filler3 {eight}"
    spans = _spans([text], n=8, min_count=2)
    # both occurrences of the repeated 8-gram are flagged
    assert (0, 0, 8) in spans and (0, 11, 19) in spans


def test_adjacent_intervals_merge():
    # a 10-word duplicated passage yields 3 overlapping 8-grams that
    # must merge into ONE maximal span
    passage = "p1 p2 p3 p4 p5 p6 p7 p8 p9 p10"
    texts = [f"head{i} {passage} tail{i}" for i in range(2)]
    spans = _spans(texts, n=8, min_count=2)
    assert spans == [(0, 1, 11), (1, 1, 11)]


def test_no_duplicates_and_short_docs():
    assert _spans(["one two", "three four"], n=8) == []
    texts = ["w%d x%d y%d z%d a%d b%d c%d d%d e%d" % ((i,) * 9)
             for i in range(3)]
    assert _spans(texts, n=8, min_count=2) == []


def test_join_path_matches_broadcast():
    boiler = "j1 j2 j3 j4 j5 j6 j7 j8 j9"
    texts = [f"pre{i} {boiler} post{i}" for i in range(4)]
    a = _spans(texts, n=8, min_count=2, broadcast_threshold=10**9)
    b = _spans(texts, n=8, min_count=2, broadcast_threshold=0)
    assert a == b and len(a) == 4


def test_duplicate_ratio():
    boiler = "r1 r2 r3 r4 r5 r6 r7 r8"
    texts = [f"{boiler} u{i} v{i}" for i in range(2)] + ["solo doc here"]
    docs = _docs(texts)
    out = duplicate_ratio(docs, duplicate_spans(docs, n=8, min_count=2))
    out = out.set_index("doc_id")
    assert out.loc[0, "covered"] == 8 and out.loc[0, "n_words"] == 10
    assert abs(out.loc[0, "dup_ratio"] - 0.8) < 1e-9
    assert out.loc[2, "covered"] == 0 and out.loc[2, "dup_ratio"] == 0.0


def test_lz78_classic_fixture_and_bounds(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq_
    from jerex_ray.pipelines.queries import doc_lz78

    # Classic LZ78 example: 'aaabbabaabaaabab' parses as
    # a|aa|b|ba|baa|baaa|bab -> wait, replay the rule by hand below.
    def lz78(t):
        d, cur, cnt = set(), "", 0
        for ch in t:
            cand = cur + ch
            if cand in d:
                cur = cand
            else:
                d.add(cand)
                cnt += 1
                cur = ""
        return cnt + (1 if cur else 0), cnt

    cases = {
        1: "aaabbabaabaaabab",
        2: "abababababababab",        # highly repetitive -> few
        3: "abcdefghijklmnop",        # all distinct -> n phrases
    }
    rows = {"doc_id": [], "text": [], "lang": [], "source": [],
            "n_chars": []}
    for i, t in cases.items():
        rows["doc_id"].append(i)
        rows["text"].append(t)
        rows["lang"].append("en")
        rows["source"].append("s")
        rows["n_chars"].append(len(t))
    # make doc 1 the longest so the pick lands on it
    rows["text"][0] = cases[1] * 4
    rows["n_chars"][0] = len(rows["text"][0])
    pq_.write_table(pa.table({
        "doc_id": pa.array(rows["doc_id"], type=pa.int64()),
        "text": rows["text"], "lang": rows["lang"],
        "source": rows["source"],
        "n_chars": pa.array(rows["n_chars"], type=pa.int64())}),
        str(tmp_path / "documents.parquet"))
    out = doc_lz78(str(tmp_path)).iloc[0]
    t = rows["text"][0]
    want_total, want_complete = lz78(t)
    assert int(out["doc_id"]) == 1
    assert int(out["n_chars"]) == len(t)
    assert int(out["n_complete"]) == want_complete
    assert int(out["n_phrases"]) == want_total
    # complexity bounds: every phrase distinct and nonempty means
    # sum of lengths = n with all-distinct lengths possible ->
    # phrases <= n, and >= ceil(sqrt(2n)) - 1 loose lower bound
    n = len(t)
    assert want_total <= n
    assert want_total >= int((2 * n) ** 0.5) - 1
    # repetitive beats all-distinct in phrase count at equal length
    r_total, _ = lz78("ab" * 8)
    d_total, _ = lz78("abcdefghijklmnop")
    assert r_total < d_total


def test_rice_param_bit_census_and_optimality():
    import numpy as np

    from jerex_ray.pipelines.queries import doc_rice_param

    out = doc_rice_param("/root/testdata/sf0.001")
    assert list(out["k"]) == list(range(8))
    # same gap count at every k (the census is over one gap set)
    assert out["n"].nunique() == 1
    # k_star marks the global integer argmin with smallest-k ties
    tb = out["total_bits"].to_numpy()
    star = out.loc[out["k_star"] == 1, "k"]
    assert len(star) == 1
    assert tb[int(star.iloc[0])] == tb.min()
    assert int(star.iloc[0]) == int(np.argmin(tb))

    # closed-form check: geometric-ish gaps of mean ~2^k want k
    rng = np.random.default_rng(6)
    for k_true, lam in ((0, 1.0), (3, 11.0), (5, 45.0)):
        gaps = rng.geometric(1.0 / lam, 50000).astype(np.int64)
        bits = [int((gaps >> k).sum() + len(gaps) * (1 + k))
                for k in range(8)]
        k_opt = int(np.argmin(bits))
        # Rice theory: k* ~ log2(mean gap) within one step
        assert abs(k_opt - k_true) <= 1, (k_true, k_opt)
