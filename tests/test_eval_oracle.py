"""The KG eval join is now SQL-oracled (round-4 item 1): these tests
pin the DuckDB replicas in ``eval/side_tables.py`` against the engine's
metric functions on IMPERFECT predictions (fp/fn > 0, type errors,
wrong evidence) — the sf corpora score P/R = 1.0, so the driver gate
alone never exercises the miss arithmetic."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from jerex_ray.eval.scoring import (TRIPLE_KEY, TRIPLE_KEY_NEC,
                                    evaluate_triples,
                                    evaluate_triples_evidence,
                                    score_documents_macro,
                                    score_documents_micro)
from jerex_ray.eval import side_tables as st


@pytest.fixture(autouse=True)
def _redirect_side_dir(tmp_path, monkeypatch):
    monkeypatch.setattr(st, "ORACLE_SIDE_DIR", str(tmp_path))


def _sql(query_sql):
    return duckdb.connect().execute(query_sql).df()


def test_triple_eval_oracle_matches_engine_on_misses():
    pred = pd.DataFrame({
        "conv_id": ["c1", "c1", "c1", "c2", "c2"],
        "subj": ["A", "A", "B", "X", "X"],
        "subj_type": ["person", "person", "org", "person", "person"],
        "pred": ["works_at", "works_at", "uses", "works_at", "works_at"],
        "obj": ["O", "O", "T", "Y", "Z"],
        "obj_type": ["org", "org", "tool", "org", "org"]})
    gt = pd.DataFrame({
        "conv_id": ["c1", "c2", "c3"],
        "subj": ["A", "X", "Q"],
        "subj_type": ["person", "robot", "person"],
        "pred": ["works_at", "works_at", "uses"],
        "obj": ["O", "Y", "T"],
        "obj_type": ["org", "org", "tool"]})
    for strict, key in ((False, TRIPLE_KEY), (True, TRIPLE_KEY_NEC)):
        name = "t_strict" if strict else "t_plain"
        st.write_side_table(name, "pred", pred[key])
        st.write_side_table(name, "gt", gt[key])
        m = evaluate_triples(pred, gt, strict_types=strict)
        out = _sql(st.triple_eval_oracle_sql(name, key)).iloc[0]
        for k in ("tp", "fp", "fn"):
            assert int(out[k]) == m[k], (strict, k)
        for k in ("precision", "recall", "f1"):
            assert float(out[k]) == m[k], (strict, k)
    # sanity: the strict variant must actually lose the c2 TP
    assert evaluate_triples(pred, gt)["tp"] == 2
    assert evaluate_triples(pred, gt, strict_types=True)["tp"] == 1


def test_evidence_eval_oracle_matches_engine():
    pred = pd.DataFrame({
        "conv_id": ["c", "c", "c"],
        "subj": ["A", "A", "B"],
        "pred": ["works_at", "uses", "uses"],
        "obj": ["O", "T", "T"],
        "evidence": [3, 9, 1]})
    gt = pd.DataFrame({
        "conv_id": ["c", "c"],
        "subj": ["A", "A"],
        "pred": ["works_at", "uses"],
        "obj": ["O", "T"],
        "evidence": [[3, 7], [2]]})
    m = evaluate_triples_evidence(pred, gt)
    assert m["tp"] == 1 and m["fp"] == 2 and m["fn"] == 1
    pred_d = pred.drop_duplicates(TRIPLE_KEY, keep="first")
    st.write_side_table("t_ev", "pred",
                        pred_d[TRIPLE_KEY + ["evidence"]])
    st.write_side_table("t_ev", "gt",
                        gt[TRIPLE_KEY + ["evidence"]]
                        .explode("evidence")
                        .assign(evidence=lambda d:
                                d["evidence"].astype("int64")))
    out = _sql(st.evidence_eval_oracle_sql("t_ev")).iloc[0]
    for k in ("tp", "fp", "fn"):
        assert int(out[k]) == m[k], k
    for k in ("precision", "recall", "f1"):
        assert float(out[k]) == m[k], k


def test_joint_metrics_oracle_matches_engine_formulas():
    # hand-built per-conv tuple lists with misses at every level
    convs = ["c1", "c2"]
    m1, m2, m3 = (0, 1, 3), (2, 0, 2), (5, 4, 6)
    cl_a, cl_b = frozenset({m1, m2}), frozenset({m3})
    cl_wrong = frozenset({m1})
    levels = {
        "mention": ([[m1, m2, m3], [m1]], [[m1, m2], [m1, m2]]),
        "coref": ([[cl_a, cl_b], [cl_b]], [[cl_a, cl_wrong], [cl_b]]),
        "entity": ([[(cl_a, "person"), (cl_b, "org")], []],
                   [[(cl_a, "person"), (cl_b, "tool")],
                    [(cl_wrong, "person")]]),
        "relation": ([[(cl_a, cl_b, "works_at")], []],
                     [[(cl_a, cl_b, "works_at"),
                       (cl_b, cl_a, "uses")], []]),
        "rel_nec": ([[(cl_a, "person", cl_b, "org", "works_at")], []],
                    [[(cl_a, "person", cl_b, "tool", "works_at")],
                     []]),
    }
    gt_df, pred_df = st.joint_side_tables(convs, levels)
    st.write_side_table("t_joint", "gt", gt_df)
    st.write_side_table("t_joint", "pred", pred_df)
    out = _sql(st.joint_metrics_oracle_sql("t_joint"))
    out = out.set_index(["level", "average"])

    type_of = {"entity": lambda e: e[1], "relation": lambda r: r[2]}
    for level, (g, p) in levels.items():
        mi = score_documents_micro(g, p)
        row = out.loc[(level, "micro")]
        for k in ("tp", "fp", "fn"):
            assert int(row[k]) == mi[k], (level, k)
        for k in ("precision", "recall", "f1"):
            assert float(row[k]) == round(mi[k], 6), (level, k)
        if level in type_of:
            ma = score_documents_macro(g, p, type_of=type_of[level])
            row = out.loc[(level, "macro")]
            for k in ("precision", "recall", "f1"):
                assert float(row[k]) == round(ma[k], 6), (level, k)
            assert int(row["tp"]) == -1
    # 5 micro + 2 macro rows
    assert len(out) == 7


def test_distributed_eval_matches_driver_on_misses(tmp_path):
    """The corpus-scale eval join (pred AND GT as Datasets, three
    counters to the driver) must agree with the driver-side set eval
    on imperfect predictions — and the Dataset GT source must equal
    the driver GT table."""
    import ray.data as rd

    from jerex_ray.eval.scoring import (evaluate_triples,
                                        evaluate_triples_distributed)
    from jerex_ray.sources.transcripts import (
        ground_truth_triples, read_ground_truth_triples)

    gt_tbl = ground_truth_triples(40)
    gt_pdf = gt_tbl.to_pandas()
    # Dataset GT source == driver GT table (row-order-insensitive)
    ds_pdf = read_ground_truth_triples(40).to_pandas()
    key = ["conv_id", "subj", "pred", "obj"]
    assert (set(map(tuple, ds_pdf[key].values))
            == set(map(tuple, gt_pdf[key].values)))

    # imperfect predictions: drop 5 GT rows, add 3 junk rows
    pred = gt_pdf.drop(columns=["evidence"]).iloc[5:].copy()
    junk = pd.DataFrame({
        "conv_id": ["conv-junk"] * 3,
        "subj": ["A", "B", "C"], "subj_type": ["person"] * 3,
        "pred": ["works_at"] * 3,
        "obj": ["X", "Y", "Z"], "obj_type": ["org"] * 3})
    pred = pd.concat([pred, junk], ignore_index=True)

    for strict in (False, True):
        m_drv = evaluate_triples(pred, gt_pdf, strict_types=strict)
        m_dst = evaluate_triples_distributed(
            rd.from_pandas(pred), read_ground_truth_triples(40),
            strict_types=strict)
        for k in ("tp", "fp", "fn", "precision", "recall", "f1"):
            assert m_dst[k] == m_drv[k], (strict, k)
        assert m_drv["fp"] >= 3 and m_drv["fn"] >= 5
