"""Tests for sequence packing (distributed keyed prefix sum),
benchmark decontamination, and repetition quality signals."""

import numpy as np
import pandas as pd
import ray.data as rd

from jerex_ray.ops.decontam import contaminated_docs, decontaminate
from jerex_ray.ops.pack import keyed_prefix_sum, pack_documents
from jerex_ray.ops.textstats import repetition_stats, run_repetition_stats


def _docs_df(n=200, seed=3, n_sources=4):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(12)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(0, 40)))
             for _ in range(n)]
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": texts,
        "source": [f"s{i % n_sources}" for i in range(n)],
    })


def _brute_pack(df, budget):
    df = df.copy()
    df["n_tokens"] = df["text"].str.split().str.len().fillna(0) \
        .astype("int64")
    df = df.sort_values(["source", "doc_id"])
    off = df.groupby("source")["n_tokens"].cumsum() - df["n_tokens"]
    df["pack_id"] = (off // budget).astype("int64")
    df["pack_offset"] = (off % budget).astype("int64")
    return df[["doc_id", "source", "n_tokens", "pack_id", "pack_offset"]] \
        .sort_values("doc_id").reset_index(drop=True)


def test_pack_documents_matches_pandas_scan():
    df = _docs_df()
    # chunk_size smaller than the corpus so the two-level scan crosses
    # many chunk boundaries (the code path under test)
    got = pack_documents(rd.from_pandas(df).repartition(7), budget=64,
                         chunk_size=16).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    want = _brute_pack(df, 64)
    pd.testing.assert_frame_equal(
        got[want.columns].astype(want.dtypes.to_dict()), want)


def test_pack_documents_doc_straddles_budget_boundary():
    df = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["a " * 30, "b " * 30, "c " * 30],
        "source": ["s", "s", "s"],
    })
    out = pack_documents(rd.from_pandas(df), budget=50,
                         chunk_size=2).to_pandas().sort_values("doc_id")
    # doc 1 starts at token 30 inside pack 0; doc 2 at 60 => pack 1
    assert out["pack_id"].tolist() == [0, 0, 1]
    assert out["pack_offset"].tolist() == [0, 30, 10]


def test_keyed_prefix_sum_primitive():
    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "k": rng.choice(["a", "b"], size=100),
        "o": np.arange(100, dtype=np.int64),
        "v": rng.integers(0, 50, size=100).astype("int64"),
    })
    got = keyed_prefix_sum(rd.from_pandas(df).repartition(5), value="v",
                           key="k", order="o", chunk_size=8).to_pandas() \
        .sort_values("o").reset_index(drop=True)
    want = df.sort_values(["k", "o"])
    exp = (want.groupby("k")["v"].cumsum() - want["v"]).astype("int64")
    want = want.assign(v_before=exp).sort_values("o") \
        .reset_index(drop=True)
    assert got["v_before"].tolist() == want["v_before"].tolist()


def test_contaminated_docs_planted_overlap():
    eval_texts = ["alpha beta gamma delta epsilon zeta eta theta iota",
                  "one two three four five six seven eight nine ten"]
    train_texts = [
        # shares the 8-gram "alpha ... theta"
        "x alpha beta gamma delta epsilon zeta eta theta y",
        "totally clean document with none of those words here at all",
        # shares two distinct 8-grams from eval doc 1
        "one two three four five six seven eight nine extra",
    ]
    train = rd.from_pandas(pd.DataFrame(
        {"doc_id": [10, 11, 12], "text": train_texts}))
    evald = rd.from_pandas(pd.DataFrame(
        {"doc_id": [0, 1], "text": eval_texts}))
    out = contaminated_docs(train, evald, n=8).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == [10, 12]
    assert out.loc[out["doc_id"] == 10, "n_hits"].item() == 1
    assert out.loc[out["doc_id"] == 12, "n_hits"].item() == 2

    clean = decontaminate(train, evald, n=8).to_pandas()
    assert clean["doc_id"].tolist() == [11]


def test_contaminated_docs_semijoin_matches_broadcast():
    df = _docs_df(n=120, seed=5)
    train = rd.from_pandas(df[df.doc_id % 5 != 0][["doc_id", "text"]])
    evald = rd.from_pandas(df[df.doc_id % 5 == 0][["doc_id", "text"]])
    a = contaminated_docs(train, evald, n=3, broadcast=True).to_pandas()
    b = contaminated_docs(train, evald, n=3, broadcast=False).to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert a["n_hits"].astype(int).tolist() == \
        b["n_hits"].astype(int).tolist()
    assert len(a) > 0          # the tiny vocab guarantees overlap


def test_repetition_stats_vs_bruteforce():
    texts = ["a a a a", "a b c d", "x y x y x y", "", "solo",
             "p q p q r r r"]
    batch = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    out = repetition_stats(batch)
    for i, t in enumerate(texts):
        ws = t.lower().split()
        row = out.iloc[i]
        assert row["n_tokens"] == len(ws)
        if ws:
            assert row["dup_word_frac"] == \
                1.0 - len(set(ws)) / len(ws)
        else:
            assert row["dup_word_frac"] == 0.0
        bigrams = [" ".join(ws[j:j + 2]) for j in range(len(ws) - 1)]
        if bigrams:
            top = max(pd.Series(bigrams).value_counts())
            assert np.isclose(row["top_bigram_frac"], top / len(bigrams))
        else:
            assert row["top_bigram_frac"] == 0.0


def test_unigram_logppl_vs_bruteforce():
    from collections import Counter

    from jerex_ray.ops.textstats import unigram_logppl

    texts = ["a a b c", "b b b", "", "c d d a"]
    ds = rd.from_pandas(pd.DataFrame({"doc_id": range(4), "text": texts}))
    out = unigram_logppl(ds).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    cnt = Counter(w for t in texts for w in t.split())
    total = sum(cnt.values())
    for i, t in enumerate(texts):
        ws = t.split()
        want = (np.mean([-np.log2(cnt[w] / total) for w in ws])
                if ws else 0.0)
        assert np.isclose(out.loc[i, "logppl"], want)
        assert out.loc[i, "n_tokens"] == len(ws)


def test_repetition_stats_dataset_and_empty():
    out = run_repetition_stats(rd.from_pandas(pd.DataFrame({
        "doc_id": [0, 1], "text": ["a a b", None]}))).to_pandas()
    assert len(out) == 2
    assert np.isclose(out.loc[0, "dup_word_frac"], 1 / 3)
    assert out.loc[1, "n_tokens"] == 0


def test_bloom_decontamination_matches_exact():
    import ray.data as rd

    from jerex_ray.ops.decontam import (contaminated_docs,
                                        contaminated_docs_bloom)
    eval_texts = ["the quick brown fox jumps over the lazy dog today",
                  "benchmark answer alpha beta gamma delta epsilon zeta"]
    train_texts = [
        "prefix words the quick brown fox jumps over the lazy dog today end",
        "totally unrelated content one two three four five six seven eight",
        "benchmark answer alpha beta gamma delta epsilon zeta trailing",
    ] + [f"clean doc {i} filler{i} a{i} b{i} c{i} d{i} e{i} f{i} g{i}"
         for i in range(30)]
    train = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(len(train_texts), dtype=np.int64),
         "text": train_texts}))
    evald = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(len(eval_texts), dtype=np.int64),
         "text": eval_texts}))
    exact = contaminated_docs(train, evald, n=8).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    bloom = contaminated_docs_bloom(train, evald, n=8).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # at this eval size the FPR is ~1e-14: bloom must equal exact,
    # and the no-false-negative guarantee must hold structurally
    pd.testing.assert_frame_equal(exact, bloom)
    assert set(exact["doc_id"]) == {0, 2}


def test_bloom_filter_no_false_negatives_and_fpr():
    import ray.data as rd

    from jerex_ray.ops.sketch import bloom_build, bloom_contains
    keys = pd.DataFrame({"k": [f"key-{i}" for i in range(5000)]})
    bits = bloom_build(rd.from_pandas(keys), column="k",
                       m_bits=1 << 16, k=4)
    # every inserted key must test positive
    assert bloom_contains(bits, keys["k"].to_numpy(), k=4).all()
    # FPR near the analytic bound: n=5000, m=65536, k=4 -> ~2.4%
    probe = np.array([f"other-{i}" for i in range(20000)], dtype=object)
    fpr = bloom_contains(bits, probe, k=4).mean()
    assert fpr < 0.06, fpr
