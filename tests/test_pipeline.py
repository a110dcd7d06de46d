"""End-to-end pipeline tests: P/R vs planted ground truth, dedup,
canonicalization, resumability (kill/resume → identical output)."""

import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from jerex_ray.config import PipelineConfig
from jerex_ray.pipelines.kg import extract_triples, run_kg_pipeline
from jerex_ray.sinks.parquet_sink import completed_partitions, read_triples
from jerex_ray.sources.transcripts import (generate_transcripts_table,
                                           ground_truth_triples)
from jerex_ray.stages.canonicalize import build_entity_table

N_CONVS = 150
CFG = PipelineConfig().scaled_for_tests()


def _triple_keys(df: pd.DataFrame) -> set:
    return set(map(tuple, df[["conv_id", "subj", "pred", "obj"]].values))


@pytest.fixture(scope="module")
def pipeline_output(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("kg_out"))
    ds = rd.from_arrow(generate_transcripts_table(N_CONVS))
    metrics = run_kg_pipeline(ds, out, CFG, shuffle_blocks=2)
    return out, metrics


def test_triple_pr_vs_ground_truth(pipeline_output):
    """The P/R≥0.95 gate (BASELINE.json) against planted extractions."""
    out, _ = pipeline_output
    pred = read_triples(out).to_pandas()
    gt = ground_truth_triples(N_CONVS).to_pandas()
    pk, gk = _triple_keys(pred), _triple_keys(gt)
    tp = len(pk & gk)
    precision = tp / max(1, len(pk))
    recall = tp / max(1, len(gk))
    assert precision >= 0.95, f"precision {precision}"
    assert recall >= 0.95, f"recall {recall}"


def test_output_deduplicated_and_typed(pipeline_output):
    out, _ = pipeline_output
    pred = read_triples(out).to_pandas()
    # duplicates count once (scoring.py:16-23 / README.md:62)
    key_cols = ["conv_id", "subj_id", "pred", "obj_id"]
    assert not pred.duplicated(key_cols).any()
    assert set(pred["pred"]) <= {"works_at", "located_in", "uses_tool"}
    assert (pred["score"] >= CFG.rel_threshold).all()
    # canonical ids are pure functions of the normalized surface
    sub = pred.groupby("subj_norm")["subj_id"].nunique()
    assert (sub == 1).all()


def test_manifests_match_partitions(pipeline_output):
    out, metrics = pipeline_output
    done = completed_partitions(out)
    assert done == set(metrics["part_key"])
    pred = read_triples(out).to_pandas()
    assert len(pred) == metrics["n_triples"].sum()


def test_resume_skips_completed_and_is_identical(pipeline_output, tmp_path):
    """Kill/resume semantics: drop some partition outputs, rerun with
    resume=True → missing partitions are recomputed, finished ones are
    untouched, and the final output equals a fresh full run."""
    out, _ = pipeline_output
    ref = read_triples(out).to_pandas().sort_values(
        ["conv_id", "subj", "pred", "obj"]).reset_index(drop=True)

    # simulate a crash that lost partitions 0 and 2
    out2 = str(tmp_path / "resumed")
    shutil.copytree(out, out2)
    for k in (0, 2):
        shutil.rmtree(f"{out2}/part_key={k}", ignore_errors=True)
        import os
        mp = f"{out2}/_manifest/part-{k}.json"
        if os.path.exists(mp):
            os.unlink(mp)

    assert completed_partitions(out2) == {1, 3}
    ds = rd.from_arrow(generate_transcripts_table(N_CONVS))
    metrics2 = run_kg_pipeline(ds, out2, CFG, resume=True, shuffle_blocks=2)
    # only the two missing partitions were recomputed
    assert set(metrics2["part_key"]) == {0, 2}

    got = read_triples(out2).to_pandas().sort_values(
        ["conv_id", "subj", "pred", "obj"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, ref)


def test_extract_triples_streaming_no_sink():
    ds = rd.from_arrow(generate_transcripts_table(40))
    t = extract_triples(ds, CFG, shuffle_blocks=2).to_pandas()
    assert len(t) > 0
    assert {"conv_id", "subj", "pred", "obj", "subj_id", "obj_id",
            "subj_norm", "obj_norm"} <= set(t.columns)


def test_entity_table_two_phase_aggregate():
    ds = rd.from_arrow(generate_transcripts_table(100))
    triples = extract_triples(ds, CFG, shuffle_blocks=2)
    ents = build_entity_table(triples).to_pandas()
    assert ents["entity_id"].is_unique
    # the hot entity (Acme Corp, planted in ~1/7 of convs) dominates
    hot = ents.sort_values("n_occurrences", ascending=False).iloc[0]
    assert hot["surface"] == "Acme Corp"
    assert hot["entity_type"] == "ORG"
    assert hot["norm"] == "acme corp"


def test_determinism_across_runs():
    ds1 = rd.from_arrow(generate_transcripts_table(40))
    ds2 = rd.from_arrow(generate_transcripts_table(40))
    a = extract_triples(ds1, CFG, shuffle_blocks=2).to_pandas()
    b = extract_triples(ds2, CFG, shuffle_blocks=3).to_pandas()
    cols = ["conv_id", "subj", "subj_type", "pred", "obj", "obj_type"]
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_stage_and_model_registry_assembly():
    """§2.10 extension surface: the same KG dataflow assembled from
    the string-keyed stage registry matches extract_triples, and the
    model registry mirrors the reference's model_type lookup."""
    import pandas as pd
    import ray.data as rd
    from jerex_ray.config import PipelineConfig
    from jerex_ray.pipelines.kg import extract_triples
    from jerex_ray.registry import build_pipeline, resolve_model
    from jerex_ray.sources.transcripts import generate_transcripts_table
    from jerex_ray.stages.numpy_scorer import NumpyScorer
    from jerex_ray.stages.scorer import RuleScorer

    cls, kw = resolve_model("joint_global")
    assert cls is NumpyScorer and kw == {"variant": "global"}
    assert resolve_model("rule")[0] is RuleScorer
    import pytest
    with pytest.raises(KeyError):
        resolve_model("nope")

    cfg = PipelineConfig().scaled_for_tests()
    tbl = generate_transcripts_table(12)
    spec = ["part_key", "assemble", "tokenize", "length_bucket",
            "score:rule", "triples", "canonicalize"]
    via_registry = build_pipeline(rd.from_arrow(tbl), spec, cfg).to_pandas()
    direct = extract_triples(rd.from_arrow(tbl), cfg).to_pandas()
    cols = ["conv_id", "subj", "pred", "obj"]
    a = via_registry[cols].sort_values(cols).reset_index(drop=True)
    b = direct[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_registry_document_cleaning_pipeline():
    """The stage registry composes a document-cleaning DAG from names:
    exact dedup → langid → split, driven purely by config strings."""
    import pandas as pd

    from jerex_ray.registry import build_pipeline
    docs = pd.DataFrame({
        "doc_id": range(6),
        "text": ["the cat sat on the mat and it was good"] * 2
        + ["der hund ist nicht in der stadt und das ist gut",
           "the dog ran through the yard all day long",
           "els gats i els gossos corren pel parc cada dia",
           "the cat sat on the mat and it was good"]})
    out = build_pipeline(rd.from_pandas(docs),
                         ["dedup:exact", "langid", "split"]).to_pandas()
    assert sorted(out["doc_id"]) == [0, 2, 3, 4]   # dups 1 and 5 dropped
    assert {"lang_pred", "split"} <= set(out.columns)
    assert set(out["split"]) <= {"train", "valid", "test"}


def test_graph_tables_support_counts(tmp_path):
    import ray.data as rd

    from jerex_ray.pipelines.kg import graph_tables, materialize_graph

    triples = pd.DataFrame({
        # last row duplicates c1's triple — a chunked long conv
        # re-emitting it; n_support must still count c1 ONCE
        "conv_id": ["c1", "c2", "c3", "c1", "c1"],
        "subj": ["Alice Chen", "Alice Chen", "Bob", "Bob",
                 "Alice Chen"],
        "subj_type": ["PER"] * 5,
        "subj_norm": ["alice chen", "alice chen", "bob", "bob",
                      "alice chen"],
        "subj_id": [1, 1, 2, 2, 1],
        "pred": ["works_at", "works_at", "lives_in", "lives_in",
                 "works_at"],
        "obj": ["Acme Corp", "Acme Corp", "Berlin", "Paris",
                "Acme Corp"],
        "obj_type": ["ORG", "ORG", "LOC", "LOC", "ORG"],
        "obj_norm": ["acme corp", "acme corp", "berlin", "paris",
                     "acme corp"],
        "obj_id": [5, 5, 6, 7, 5],
        "score": [0.9, 0.8, 0.7, 0.6, 0.85],
    })
    nodes, edges = graph_tables(rd.from_pandas(triples))
    ndf = nodes.to_pandas().sort_values("entity_id").reset_index(drop=True)
    edf = edges.to_pandas().sort_values(
        ["subj_id", "pred", "obj_id"]).reset_index(drop=True)
    # nodes: unique per canonical id, both subj and obj sides counted
    assert list(ndf["entity_id"]) == [1, 2, 5, 6, 7]
    assert ndf.set_index("entity_id")["n_occurrences"].to_dict() == \
        {1: 3, 2: 2, 5: 3, 6: 1, 7: 1}
    # edges: (1, works_at, 5) supported twice with max score 0.9
    assert len(edf) == 3
    top = edf[(edf["subj_id"] == 1)].iloc[0]
    assert top["n_support"] == 2 and abs(top["score_max"] - 0.9) < 1e-12
    # writer produces readable parquet dirs
    n_nodes, n_edges = materialize_graph(rd.from_pandas(triples),
                                         str(tmp_path))
    assert (n_nodes, n_edges) == (5, 3)
    back = rd.read_parquet(str(tmp_path / "edges")).to_pandas()
    assert len(back) == 3


def test_corrupt_manifest_recomputes_only_that_partition(
        pipeline_output, tmp_path):
    """A truncated/garbage manifest must invalidate exactly its own
    partition: the rerun recomputes it (and nothing else) and the
    final output is identical."""
    import os

    out, _ = pipeline_output
    ref = read_triples(out).to_pandas().sort_values(
        ["conv_id", "subj", "pred", "obj"]).reset_index(drop=True)

    out2 = str(tmp_path / "corrupted")
    shutil.copytree(out, out2)
    with open(f"{out2}/_manifest/part-1.json", "w") as f:
        f.write("{ not json !!")
    assert completed_partitions(out2) == {0, 2, 3}

    ds = rd.from_arrow(generate_transcripts_table(N_CONVS))
    metrics2 = run_kg_pipeline(ds, out2, CFG, resume=True,
                               shuffle_blocks=2)
    assert set(metrics2["part_key"]) == {1}
    got = read_triples(out2).to_pandas().sort_values(
        ["conv_id", "subj", "pred", "obj"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, ref)


def test_kg_quality_audits_match_pandas_recompute():
    from jerex_ray.pipelines.queries import (kg_functional_conflicts,
                                             kg_provenance,
                                             kg_type_signatures,
                                             kg_triples)
    sf = "/root/testdata/sf0.001"
    tri = kg_triples(sf)  # deduped triple table for the reference calc
    # provenance parity (per-conv distinct is exactly the dedup grain)
    prov = kg_provenance(sf)
    ref = (tri.groupby(["subj_norm", "pred", "obj_norm"])["conv_id"]
           .nunique().reset_index(name="n_convs"))
    got = prov[["subj_norm", "pred", "obj_norm", "n_convs"]]
    merged = ref.merge(got, on=["subj_norm", "pred", "obj_norm"],
                       suffixes=("_ref", ""))
    assert len(merged) == len(ref) == len(prov) > 0
    assert (merged["n_convs_ref"] == merged["n_convs"]).all()
    assert (prov["n_mentions"] >= prov["n_convs"]).all()
    # type signatures: shares sum to 1 per pred, dominant unique-max
    sig = kg_type_signatures(sf)
    sums = sig.groupby("pred")["share"].sum()
    assert ((sums - 1.0).abs() < 1e-4).all()
    assert (sig.groupby("pred")["dominant"].sum() >= 1).all()
    # functional conflicts: n_multi consistent with a direct recount
    fc = kg_functional_conflicts(sf).set_index("pred")
    per = (tri.drop_duplicates(["pred", "subj_norm", "obj_norm"])
           .groupby(["pred", "subj_norm"])["obj_norm"].nunique())
    for pred, grp in per.groupby(level=0):
        assert fc.loc[pred, "n_subjects"] == len(grp)
        assert fc.loc[pred, "n_multi"] == int((grp > 1).sum())
        assert fc.loc[pred, "max_objects"] == int(grp.max())


def test_graphml_export_roundtrip(tmp_path):
    import ray.data as rd
    from jerex_ray.pipelines.kg import extract_triples, graph_tables
    from jerex_ray.config import PipelineConfig
    from jerex_ray.sinks.graphml import read_graphml_counts, write_graphml
    from jerex_ray.sources.transcripts import generate_transcripts_table
    tri = extract_triples(rd.from_arrow(generate_transcripts_table(25)),
                          PipelineConfig().scaled_for_tests())
    nodes, edges = graph_tables(tri)
    ndf = nodes.to_pandas()
    edf = edges.to_pandas()
    path = str(tmp_path / "kg.graphml")
    write_graphml(ndf, edf, path)
    n, e = read_graphml_counts(path)
    assert n == len(ndf) > 0 and e == len(edf) > 0
    # escaping: no raw ampersands/brackets leak from surfaces
    import xml.etree.ElementTree as ET
    ET.parse(path)  # must be well-formed XML


def test_pr_curve_threshold_invariants():
    from jerex_ray.pipelines.queries import kg_pr_curve
    out = kg_pr_curve("/root/testdata/sf0.001")
    assert len(out) == 9
    # tighter thresholds can only shrink the prediction set
    assert (np.diff(out["n_pred"]) <= 0).all()
    assert (np.diff(out["tp"]) <= 0).all()
    # recall is monotone non-increasing in the threshold
    assert (np.diff(out["recall"]) <= 1e-9).all()
    assert out["n_pred"].iloc[0] > 0
    assert ((out["precision"] >= 0) & (out["precision"] <= 1)).all()
