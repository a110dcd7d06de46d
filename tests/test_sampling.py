"""Training-sampler tests (T1–T10 semantics + determinism)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from jerex_ray.config import PipelineConfig
from jerex_ray.pipelines.kg import _with_part_key
from jerex_ray.stages.assemble import assemble_documents
from jerex_ray.stages.sampling import sample_document, sample_training_data
from jerex_ray.stages.tokenize import tokenize_documents
from jerex_ray.sources.docred import docred_to_transcripts

DOC = {
    "title": "conv-x",
    "sents": [["Alice", "Chen", "joined", "Acme", "Corp", "."],
              ["Chen", "lives", "in", "Berlin", "."]],
}
GT_MENTIONS = [(0, 0, 0, 2), (0, 1, 0, 1), (1, 0, 3, 5), (2, 1, 3, 4)]
GT_RELATIONS = [(0, 1, "works_at"), (0, 2, "located_in")]
REL_TYPES = ["works_at", "located_in", "uses_tool"]


def _doc_arrays():
    phrases = [t for s in DOC["sents"] for t in s]
    tok_sent = np.array([0] * 6 + [1] * 5, dtype=np.int32)
    sent_off = np.array([0, 6, 11], dtype=np.int32)
    return phrases, tok_sent, sent_off


def test_sampler_semantics():
    phrases, tok_sent, sent_off = _doc_arrays()
    s = sample_document(conv_id="conv-x", phrases=phrases, tok_sent=tok_sent,
                        sent_tok_off=sent_off, gt_mentions=GT_MENTIONS,
                        gt_relations=GT_RELATIONS, relation_types=REL_TYPES)
    # T1: GT spans in doc coordinates
    assert s["pos_mentions"] == [(0, 2), (6, 7), (3, 5), (9, 10)]
    # T2: negatives never collide with positives, quota respected
    assert set(s["neg_mentions"]).isdisjoint(set(s["pos_mentions"]))
    assert len(s["neg_mentions"]) <= 200
    # overlap negatives exist ("Alice" alone is inside "Alice Chen")
    assert (0, 1) in s["neg_mentions"]
    # T3: positive pairs = both orders of the two coref mentions
    assert set(s["pos_coref"]) == {(0, 1), (1, 0)}
    # ed("Alice Chen", "Chen") symmetric
    assert s["pos_coref_eds"][0] == s["pos_coref_eds"][1] > 0
    # negative pairs are cross-cluster only
    for i, j in s["neg_coref"]:
        assert (i in (0, 1)) != (j in (0, 1)) or (i >= 2 and j >= 2)
    # T5/T7: clusters and positive relations with one-hot labels
    assert s["entities"] == [[0, 1], [2], [3]]
    assert s["pos_rel_pairs"] == [(0, 1), (0, 2)]
    assert s["pos_rel_labels"][0] == [1, 0, 0]
    assert s["pos_rel_labels"][1] == [0, 1, 0]
    # T8: negatives exclude related pairs
    assert set(s["neg_rel_pairs"]).isdisjoint(set(s["pos_rel_pairs"]))


def test_sampler_deterministic_per_conv():
    phrases, tok_sent, sent_off = _doc_arrays()
    kw = dict(phrases=phrases, tok_sent=tok_sent, sent_tok_off=sent_off,
              gt_mentions=GT_MENTIONS, gt_relations=GT_RELATIONS,
              relation_types=REL_TYPES)
    a = sample_document(conv_id="conv-x", **kw)
    b = sample_document(conv_id="conv-x", **kw)
    assert a == b                      # reproducible
    # with a quota below the population, different convs draw different
    # samples (per-doc seeds, not a global random state)
    a3 = sample_document(conv_id="conv-x", neg_mention_count=3, **kw)
    c3 = sample_document(conv_id="conv-y", neg_mention_count=3, **kw)
    assert len(a3["neg_mentions"]) == len(c3["neg_mentions"]) == 3
    assert a3["neg_mentions"] != c3["neg_mentions"]


def test_distributed_sampling_stage():
    cfg = PipelineConfig().scaled_for_tests()
    transcripts = rd.from_arrow(docred_to_transcripts([DOC]))
    tok = tokenize_documents(
        assemble_documents(_with_part_key(transcripts, cfg)), cfg,
        concurrency=(1, 2))
    gt_m = pa.table({
        "conv_id": pa.array(["conv-x"] * 4),
        "cluster": pa.array([m[0] for m in GT_MENTIONS], pa.int32()),
        "sent_id": pa.array([m[1] for m in GT_MENTIONS], pa.int32()),
        "start": pa.array([m[2] for m in GT_MENTIONS], pa.int32()),
        "end": pa.array([m[3] for m in GT_MENTIONS], pa.int32()),
    })
    gt_r = pa.table({
        "conv_id": pa.array(["conv-x"] * 2),
        "head": pa.array([r[0] for r in GT_RELATIONS], pa.int32()),
        "tail": pa.array([r[1] for r in GT_RELATIONS], pa.int32()),
        "pred": pa.array([r[2] for r in GT_RELATIONS]),
    })
    out = sample_training_data(tok, gt_m, gt_r, REL_TYPES).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    # mentions arrive in stable (sent, start, end) order
    assert list(row["pos_mention_start"]) == [0, 3, 6, 9]
    assert list(row["pos_rel_head"]) == [0, 0]
    assert len(row["neg_mention_start"]) > 0
