"""End-to-end composed pretraining-pipeline test: planted near-dups,
planted contamination, full parity with the composed SQL oracle on a
synthetic corpus (independent of the driver's fixtures)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _synth_docs(tmp_path):
    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(40)]
    texts, sources = [], []
    for i in range(60):
        words = list(rng.choice(vocab, size=30))
        texts.append(" ".join(words))
        sources.append(f"src{i % 3}")
    # planted near-dup pair: doc 60 ~ doc 61 (share most 3-grams)
    base = list(np.random.default_rng(9).choice(vocab, size=30))
    texts.append(" ".join(base))
    texts.append(" ".join(base[:27] + ["zz1", "zz2", "zz3"]))
    sources += ["src0", "src1"]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts, "source": sources})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    return df


def test_pretrain_corpus_matches_composed_oracle(tmp_path):
    import duckdb

    from jerex_ray.pipelines.queries import (_pretrain_corpus_oracle_sql,
                                             doc_pretrain_corpus)
    df = _synth_docs(tmp_path)
    ours = doc_pretrain_corpus(str(tmp_path))

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    oracle = con.execute(_pretrain_corpus_oracle_sql()).df()
    oracle["source"] = oracle["source"].astype(object)

    a = ours.sort_values("doc_id").reset_index(drop=True)
    b = oracle.sort_values("doc_id").reset_index(drop=True)
    assert list(a.columns) == ["doc_id", "source", "n_tokens",
                               "pack_id", "pack_offset"]
    pd.testing.assert_frame_equal(
        a, b[a.columns].astype(a.dtypes.to_dict()))

    # structural invariants: within each source, offsets are the
    # running sum of token counts in doc_id order
    for _, g in a.groupby("source"):
        g = g.sort_values("doc_id")
        off = (g["pack_id"] * 512 + g["pack_offset"]).to_numpy()
        expect = np.concatenate(
            ([0], np.cumsum(g["n_tokens"].to_numpy())[:-1]))
        np.testing.assert_array_equal(off, expect)
    # the planted near-dup loser (doc 61) is never in the output
    assert 61 not in set(a["doc_id"])
    # output is a subset of the input corpus
    assert set(a["doc_id"]) <= set(df["doc_id"])
