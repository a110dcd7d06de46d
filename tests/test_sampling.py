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


# ---- T4 / T9 / T10 ----

def _sample_full(gt_mentions, gt_relations):
    phrases, tok_sent, sent_off = _doc_arrays()
    return sample_document(conv_id="conv-x", phrases=phrases,
                           tok_sent=tok_sent, sent_tok_off=sent_off,
                           gt_mentions=gt_mentions, gt_relations=gt_relations,
                           relation_types=REL_TYPES)


def test_t4_coref_candidates_all_ordered_gt_pairs():
    s = _sample_full(GT_MENTIONS, GT_RELATIONS)
    n = len(s["pos_mentions"])
    assert len(s["coref_candidates"]) == n * (n - 1)
    assert all(i != j for i, j in s["coref_candidates"])
    # symmetric ED values for mirrored pairs
    ed = dict(zip(s["coref_candidates"], s["coref_candidate_eds"]))
    for (i, j), v in ed.items():
        assert ed[(j, i)] == v


def test_t9_mention_pair_structures():
    s = _sample_full(GT_MENTIONS, GT_RELATIONS)
    mi = s["rel_mi"]
    pairs = s["pos_rel_pairs"] + s["neg_rel_pairs"]
    # one index-map row per entity pair; cross-product sizes
    assert len(mi["rel_entity_pair_mp"]) == len(pairs)
    for k, (hi, ti) in enumerate(pairs):
        expect = len(s["entities"][hi]) * len(s["entities"][ti])
        assert len(mi["rel_entity_pair_mp"][k]) == expect
    # the flat maps are consistent: ep_mp lists index rel_mention_pairs
    # rows whose rel_mention_pair_ep points back at the entity pair
    for k, rows in enumerate(mi["rel_entity_pair_mp"]):
        for r in rows:
            assert mi["rel_mention_pair_ep"][r] == k
    # pair (0,1) = cluster {Alice Chen, Chen} x {Acme Corp}: mention
    # pair (0, 2) has the context interval between subword spans 2..3
    # ("joined") and token distance 2
    first = mi["rel_entity_pair_mp"][0][0]
    assert mi["rel_mention_pairs"][first] == (0, 2)
    assert mi["rel_ctx_intervals"][first] == (2, 3)
    assert mi["rel_token_distances"][first] == 2
    assert mi["rel_sentence_distances"][first] == 0


def test_t10_placeholder_rows_empty_document():
    """No mentions at all: every site gets its all-zero-sample-mask
    placeholder row (sampling_common.py:345-507 six sites)."""
    from jerex_ray.stages.sampling import tensorize_document
    s = _sample_full([], [])
    # no GT mentions -> no positives; negatives still sampled from
    # candidate spans, so force the fully-empty corner by clearing them
    s = dict(s, neg_mentions=[], neg_coref=[], neg_coref_eds=[],
             neg_rel_pairs=[])
    t = tensorize_document(s, ctx_size=700, n_relation_types=3)
    assert t["mention_spans"].tolist() == [[0, 0]]
    assert not t["mention_sample_masks"].any()
    assert t["coref_mention_pairs"].tolist() == [[0, 0]]
    assert not t["coref_sample_masks"].any()
    assert t["entities"].tolist() == [[0]]
    assert t["entity_masks"].tolist() == [[True]]   # masks are ONES here
    assert not t["entity_sample_masks"].any()
    assert t["rel_entity_pairs"].tolist() == [[0, 0]]
    assert t["rel_types"].shape == (1, 3) and not t["rel_types"].any()
    assert not t["rel_sample_masks"].any()
    assert t["rel_pair_masks"].tolist() == [[False]]
    assert t["rel_ctx_intervals"].tolist() == [[0, 700]]  # all-ones mask


def test_t10_one_mention_document():
    """Single mention: mentions real, coref/relations placeholder."""
    from jerex_ray.stages.sampling import tensorize_document
    s = _sample_full([(0, 0, 0, 2)], [])
    s = dict(s, neg_mentions=[], neg_coref=[], neg_coref_eds=[],
             neg_rel_pairs=[])
    t = tensorize_document(s, ctx_size=700, n_relation_types=3)
    assert t["mention_sample_masks"].all()
    assert t["mention_spans"].tolist() == [[0, 2]]
    assert not t["coref_sample_masks"].any()         # no pairs possible
    assert t["entity_sample_masks"].all()            # one singleton cluster
    assert not t["rel_sample_masks"].any()           # no entity pairs


def test_t10_no_relation_document():
    """Clusters but no relations: entity sites real, both relation
    sites placeholder (with negatives cleared)."""
    from jerex_ray.stages.sampling import tensorize_document
    s = _sample_full(GT_MENTIONS, [])
    s = dict(s, neg_rel_pairs=[], rel_mi={k: [] for k in s["rel_mi"]})
    t = tensorize_document(s, ctx_size=700, n_relation_types=3)
    assert t["entity_sample_masks"].all()
    assert not t["rel_sample_masks"].any()
    assert t["rel_mention_pairs"].tolist() == [[0, 0]]
    assert t["rel_token_distances"].tolist() == [0]


def test_t10_full_document_roundtrip():
    from jerex_ray.stages.sampling import tensorize_document
    s = _sample_full(GT_MENTIONS, GT_RELATIONS)
    t = tensorize_document(s, ctx_size=700, n_relation_types=3)
    n_m = len(s["pos_mentions"]) + len(s["neg_mentions"])
    assert t["mention_spans"].shape == (n_m, 2)
    assert t["mention_sample_masks"].all()
    assert t["mention_types"].sum() == len(s["pos_mentions"])
    n_p = len(s["pos_rel_pairs"]) + len(s["neg_rel_pairs"])
    assert t["rel_entity_pairs"].shape == (n_p, 2)
    assert t["rel_pair_masks"].shape[0] == n_p
    # padded index-map rows gather real mention-pair rows
    assert t["rel_mention_pairs"].shape[0] == len(
        s["rel_mi"]["rel_mention_pairs"])


def test_sample_document_epoch_reseeds_negatives():
    """epoch k>0 draws DIFFERENT negative samples (the reference's
    per-epoch dataset re-sampling analogue); epoch 0 reproduces the
    historical draws bit-for-bit."""
    import numpy as np

    from jerex_ray.stages.sampling import sample_document
    kwargs = dict(
        conv_id="conv-ep", phrases=["Alice", "Chen", "joined", "Acme",
                                    "Corp", "today", "and", "then",
                                    "left", "again"],
        tok_sent=np.zeros(10, np.int32),
        sent_tok_off=np.array([0, 10], np.int32),
        gt_mentions=[(0, 0, 0, 2), (1, 0, 3, 5)],
        gt_relations=[(0, 1, "works_at")],
        relation_types=["works_at", "located_in"],
        neg_mention_count=5)     # quota < candidates ⇒ draws are random
    base = sample_document(**kwargs)
    again = sample_document(**kwargs, epoch=0)
    assert base["neg_mentions"] == again["neg_mentions"]
    other = sample_document(**kwargs, epoch=1)
    assert base["pos_mentions"] == other["pos_mentions"]  # GT unchanged
    assert base["neg_mentions"] != other["neg_mentions"]
