"""Tests for the evaluation harness (G5/G6 semantics)."""

import pandas as pd
import ray.data as rd

from jerex_ray.eval.scoring import (evaluate_triples,
                                    evaluate_triples_distributed,
                                    score_documents_macro,
                                    score_documents_micro)
from jerex_ray.pipelines.kg import extract_triples
from jerex_ray.config import PipelineConfig
from jerex_ray.sources.transcripts import (generate_transcripts_table,
                                           ground_truth_triples)


def test_micro_dedup_union_semantics():
    # duplicates count once (scoring.py:16-23 / README.md:62)
    gt = [[("a",), ("a",), ("b",)]]
    pred = [[("a",), ("c",), ("c",)]]
    m = score_documents_micro(gt, pred)
    assert (m["tp"], m["fp"], m["fn"]) == (1, 1, 1)
    assert m["precision"] == 0.5 and m["recall"] == 0.5


def test_micro_empty_docs():
    m = score_documents_micro([[], []], [[], []])
    assert m == {"precision": 0.0, "recall": 0.0, "f1": 0.0,
                 "tp": 0, "fp": 0, "fn": 0}


def test_macro_per_type_average():
    gt = [[("x", "T1"), ("y", "T2")]]
    pred = [[("x", "T1")]]
    m = score_documents_macro(gt, pred, type_of=lambda t: t[1])
    # T1 perfect, T2 zero → macro P/R/F1 = 0.5
    assert m["precision"] == 0.5 and m["recall"] == 0.5 and m["f1"] == 0.5


def test_evaluate_triples_driver_and_distributed_agree():
    pred_tbl = extract_triples(
        rd.from_arrow(generate_transcripts_table(60)),
        PipelineConfig().scaled_for_tests(), shuffle_blocks=2).to_pandas()
    gt_tbl = ground_truth_triples(60).to_pandas()

    local = evaluate_triples(pred_tbl, gt_tbl)
    dist = evaluate_triples_distributed(
        rd.from_pandas(pred_tbl), rd.from_pandas(gt_tbl))
    for k in ("tp", "fp", "fn"):
        assert local[k] == dist[k], (k, local, dist)
    assert local["precision"] >= 0.95 and local["recall"] >= 0.95


def test_strict_type_variant():
    pred = pd.DataFrame({
        "conv_id": ["c"], "subj": ["A"], "subj_type": ["PER"],
        "pred": ["works_at"], "obj": ["B"], "obj_type": ["ORG"]})
    gt_wrongtype = pred.assign(subj_type=["ORG"])
    assert evaluate_triples(pred, gt_wrongtype)["tp"] == 1
    assert evaluate_triples(pred, gt_wrongtype, strict_types=True)["tp"] == 0


def test_evidence_eval_perfect_on_planted_turns():
    """The scorer's evidence (earliest same-sentence mention pair,
    mapped chunk→conv turn) must hit the planted turn for every
    triple; 200 convs include chunked long convs whose duplicate
    plant exercises the GT evidence union and the dedup tie-break."""
    from jerex_ray.eval.scoring import evaluate_triples_evidence
    from jerex_ray.stages.canonicalize import dedup_triples
    pred = dedup_triples(extract_triples(
        rd.from_arrow(generate_transcripts_table(200)),
        PipelineConfig().scaled_for_tests(), shuffle_blocks=2).to_pandas())
    gt = ground_truth_triples(200).to_pandas()
    m = evaluate_triples_evidence(pred, gt)
    assert m["precision"] == 1.0 and m["recall"] == 1.0, m


def test_evidence_eval_rejects_wrong_turn():
    pred = pd.DataFrame({
        "conv_id": ["c", "c"], "subj": ["A", "A"],
        "pred": ["works_at", "uses_tool"], "obj": ["B", "T"],
        "evidence": [3, 9]})
    gt = pd.DataFrame({
        "conv_id": ["c", "c"], "subj": ["A", "A"],
        "pred": ["works_at", "uses_tool"], "obj": ["B", "T"],
        "evidence": [[3, 7], [2]]})
    from jerex_ray.eval.scoring import evaluate_triples_evidence
    m = evaluate_triples_evidence(pred, gt)
    assert m["tp"] == 1 and m["fp"] == 1 and m["fn"] == 1


def test_joint_metrics_all_levels_perfect_on_synthetic_corpus():
    """The reference's four-level joint eval (mention/coref/entity/
    relation + rel_nec) over 300 convs, incl. chunked long convs
    whose clusters must close across chunks via the canonical-
    representative link."""
    from jerex_ray.pipelines.queries import kg_joint_metrics
    import os
    m = kg_joint_metrics("/root/testdata/sf0.001")
    assert set(m["level"]) == {"mention", "coref", "entity",
                               "relation", "rel_nec"}
    assert (m["f1"] == 1.0).all(), m.to_string()
    micro = m[m["average"] == "micro"]
    assert (micro["tp"] > 0).all() and (micro["fp"] == 0).all() \
        and (micro["fn"] == 0).all()


def test_joint_metrics_rounds_half_away_like_duckdb():
    """Round-5 (ADVICE): P/R/F1 are exact rationals, so 6-decimal
    ties are real (power-of-2 denominators). DuckDB round() is
    half-away-from-zero; Python round() is banker's — the engine must
    mirror DuckDB (1/128 = 0.0078125 → 0.007813, not 0.007812)."""
    from jerex_ray.eval.scoring import _round_half_away

    assert _round_half_away(1 / 128) == 0.007813
    assert round(1 / 128, 6) == 0.007812          # the banker's trap
    assert _round_half_away(-1 / 128) == -0.007813
    assert _round_half_away(0.25, 1) == 0.3
    assert _round_half_away(1 / 3) == 0.333333
