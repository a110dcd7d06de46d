"""NumpyScorer: chunk-cap parity, determinism, global variant, and
pipeline integration.

The reference chunks J1/J4/J9 by max_spans / max_coref_pairs /
max_rel_pairs purely to bound memory (mention_representation.py:16-22,
coreference_resolution.py:26-32,
relation_classification_multi_instance.py:32-51) — caps must change
memory, never output. These tests pin that contract."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from jerex_ray.config import PipelineConfig
from jerex_ray.sources.transcripts import generate_transcripts_table
from jerex_ray.stages.assemble import add_part_key, assemble_documents
from jerex_ray.stages.numpy_scorer import NumpyScorer
from jerex_ray.stages.tokenize import tokenize_documents


def _cfg(**caps) -> PipelineConfig:
    # reference-default thresholds (0.85/0.85/0.6): the scorer's
    # frozen weights are calibrated so these produce realistic volumes
    return PipelineConfig(**caps)


_TOK_CACHE = {}


def _tokenized_batch(n_convs: int = 12) -> pa.Table:
    if n_convs not in _TOK_CACHE:
        ds = rd.from_arrow(generate_transcripts_table(n_convs)).map_batches(
            add_part_key, batch_format="pyarrow",
            fn_kwargs={"num_partitions": 2})
        docs = assemble_documents(ds, shuffle_blocks=2)
        tok = tokenize_documents(docs, PipelineConfig(), concurrency=2)
        _TOK_CACHE[n_convs] = pa.Table.from_pandas(
            tok.to_pandas().sort_values("doc_id").reset_index(drop=True),
            preserve_index=False)
    return _TOK_CACHE[n_convs]


def _score(batch, cfg, **kw) -> pd.DataFrame:
    out = NumpyScorer(cfg, **kw)(batch).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def test_chunk_caps_change_memory_not_output():
    batch = _tokenized_batch()
    base = _score(batch, _cfg())
    # model must produce non-trivial structure for the parity to mean
    # anything
    assert base["m_start"].str.len().sum() > 0
    assert base["r_type"].str.len().sum() > 0
    assert any(len(c) and max(c) > 0 for c in base["m_cluster"])
    for caps in ({"max_spans": 1}, {"max_spans": 3},
                 {"max_coref_pairs": 1}, {"max_coref_pairs": 5},
                 {"max_rel_pairs": 1}, {"max_rel_pairs": 7},
                 {"max_spans": 2, "max_coref_pairs": 3,
                  "max_rel_pairs": 4}):
        capped = _score(batch, _cfg(**caps))
        pd.testing.assert_frame_equal(base, capped)


def test_global_variant_runs_and_caps_hold():
    batch = _tokenized_batch()
    base = _score(batch, _cfg(), variant="global")
    assert base["r_type"].str.len().sum() > 0
    assert all(ev == -1 for evs in base["r_evidence"] for ev in evs)
    capped = _score(batch, _cfg(max_spans=2, max_coref_pairs=3),
                    variant="global")
    pd.testing.assert_frame_equal(base, capped)


def test_deterministic_across_instances():
    batch = _tokenized_batch()
    a = _score(batch, _cfg())
    b = _score(batch, _cfg())
    pd.testing.assert_frame_equal(a, b)


def test_mi_and_global_share_upstream_stages():
    """Mention/coref/entity outputs are variant-independent (the two
    reference models share _forward_inference_common)."""
    batch = _tokenized_batch()
    mi = _score(batch, _cfg())
    gl = _score(batch, _cfg(), variant="global")
    shared = ["doc_id", "m_start", "m_end", "m_sent", "m_cluster",
              "cl_rep", "cl_type", "cl_size"]
    pd.testing.assert_frame_equal(mi[shared], gl[shared])


def test_pipeline_integration_numpy_scorer():
    """score_documents(scorer_cls=NumpyScorer) runs distributed and
    matches the in-process actor output."""
    from jerex_ray.stages.scorer import score_documents
    batch = _tokenized_batch()
    cfg = _cfg()
    local = _score(batch, cfg)
    ds = score_documents(rd.from_arrow(batch), cfg,
                         concurrency=2, scorer_cls=NumpyScorer)
    dist = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(local, dist)


def test_decoded_phrase_is_lowercased_detokenization():
    sc = NumpyScorer(_cfg())
    assert sc._decode_phrase(["Alice", "SMITH"], 0, 2) == "alice smith"


def test_checkpoint_roundtrip(tmp_path):
    """S10: save weights once, actors load the checkpoint path in
    __init__ and reproduce the saver's outputs exactly; a
    different-seed model without the checkpoint differs."""
    import numpy as np
    batch = _tokenized_batch()
    cfg = _cfg()
    src = NumpyScorer(cfg, seed=13)
    ckpt = str(tmp_path / "model.npz")
    src.save_checkpoint(ckpt)

    loaded = _score(batch, cfg, seed=99, checkpoint_path=ckpt)
    pd.testing.assert_frame_equal(loaded, _score(batch, cfg, seed=13))
    other = _score(batch, cfg, seed=99)
    assert not other.equals(loaded)

    # distributed: the pool loads the shared checkpoint once per actor
    from jerex_ray.stages.scorer import score_documents
    ds = score_documents(rd.from_arrow(batch), cfg, concurrency=2,
                         scorer_cls=NumpyScorer,
                         scorer_kwargs={"seed": 99,
                                        "checkpoint_path": ckpt})
    dist = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(dist, loaded)


# ---- train path: T10 tensors -> forward_train -> joint loss ----

def _train_doc():
    """The docred fixture doc through sample_document."""
    from jerex_ray.stages.sampling import sample_document
    phrases = ["Alice", "Chen", "joined", "Acme", "Corp", ".",
               "Chen", "lives", "in", "Berlin", "."]
    tok_sent = np.array([0] * 6 + [1] * 5, dtype=np.int32)
    sent_off = np.array([0, 6, 11], dtype=np.int32)
    gt_mentions = [(0, 0, 0, 2), (0, 1, 0, 1), (1, 0, 3, 5), (2, 1, 3, 4)]
    gt_relations = [(0, 1, "works_at"), (0, 2, "located_in")]
    sample = sample_document(
        conv_id="conv-x", phrases=phrases, tok_sent=tok_sent,
        sent_tok_off=sent_off, gt_mentions=gt_mentions,
        gt_relations=gt_relations,
        relation_types=["works_at", "located_in", "uses_tool"])
    # stub tokenizer: every word here is one sub-word
    n = len(phrases)
    enc = np.arange(2, 2 + n, dtype=np.int32)
    sub_start = np.arange(n, dtype=np.int64)
    sub_end = sub_start + 1
    entity_types = [0, 1, 2]        # PER, ORG, LOC (DEFAULT_TYPES order)
    return sample, enc, sub_start, sub_end, entity_types


def test_training_step_produces_reference_objective():
    from jerex_ray.stages.numpy_scorer import training_step
    sample, enc, ss, se, et = _train_doc()
    sc = NumpyScorer(_cfg())
    out = training_step(sc, encoding=enc, sub_start=ss, sub_end=se,
                        sample=sample, entity_type_targets=et)
    assert np.isfinite(out["loss"]) and out["loss"] > 0
    for k in ("mention_loss", "coref_loss", "entity_loss", "rel_loss"):
        assert k in out and np.isfinite(out[k])
    # joint weighting (1, 1, 0.25, 1)
    expect = (out["mention_loss"] + out["coref_loss"]
              + 0.25 * out["entity_loss"] + out["rel_loss"])
    assert abs(out["loss"] - expect) < 1e-12


def test_training_forward_chunk_cap_parity():
    from jerex_ray.stages.numpy_scorer import forward_train
    from jerex_ray.stages.sampling import tensorize_document
    sample, enc, ss, se, et = _train_doc()
    t = tensorize_document(sample, ctx_size=700, n_relation_types=3)
    base = forward_train(NumpyScorer(_cfg()), encoding=enc, sub_start=ss,
                         sub_end=se, tensors=t, entity_type_targets=et)
    capped = forward_train(
        NumpyScorer(_cfg(max_spans=2, max_coref_pairs=3, max_rel_pairs=4)),
        encoding=enc, sub_start=ss, sub_end=se, tensors=t,
        entity_type_targets=et)
    for k in base:
        # chunked BLAS matmuls differ in the last float bit (summation
        # order), exactly like the reference's torch chunking — outputs
        # must agree to full float64 precision, not bit-identity
        np.testing.assert_allclose(base[k], capped[k], rtol=1e-10,
                                   atol=1e-10)


def test_training_step_empty_document_zero_loss():
    """Placeholder rows (all-zero sample masks) contribute nothing."""
    from jerex_ray.stages.numpy_scorer import training_step
    from jerex_ray.stages.sampling import sample_document
    sample = sample_document(
        conv_id="conv-e", phrases=["just", "plain", "words"],
        tok_sent=np.zeros(3, np.int32),
        sent_tok_off=np.array([0, 3], np.int32),
        gt_mentions=[], gt_relations=[],
        relation_types=["works_at", "located_in", "uses_tool"])
    sample = dict(sample, neg_mentions=[], neg_coref=[], neg_coref_eds=[],
                  neg_rel_pairs=[])
    sc = NumpyScorer(_cfg())
    out = training_step(sc, encoding=np.arange(2, 5, dtype=np.int32),
                        sub_start=np.arange(3), sub_end=np.arange(1, 4),
                        sample=sample, entity_type_targets=[])
    assert out["loss"] == 0.0


# ---- analytic backward pass vs finite differences ----

def _loss_of(sc, sample, enc, ss, se, et):
    from jerex_ray.stages.numpy_scorer import training_step
    return training_step(sc, encoding=enc, sub_start=ss, sub_end=se,
                         sample=sample, entity_type_targets=et)["loss"]


def _gradient_check(variant):
    from jerex_ray.stages.numpy_scorer import (TRAINABLE,
                                               training_step_grads)
    sample, enc, ss, se, et = _train_doc()
    sc = NumpyScorer(_cfg(), variant=variant)
    _, grads = training_step_grads(sc, encoding=enc, sub_start=ss,
                                   sub_end=se, sample=sample,
                                   entity_type_targets=et)
    rng = np.random.default_rng(0)
    eps = 1e-6
    checked = 0
    for name in TRAINABLE:
        flat = getattr(sc, name).reshape(-1)
        for i in rng.choice(flat.size, size=min(3, flat.size),
                            replace=False):
            orig = flat[i]
            flat[i] = orig + eps
            lp = _loss_of(sc, sample, enc, ss, se, et)
            flat[i] = orig - eps
            lm = _loss_of(sc, sample, enc, ss, se, et)
            flat[i] = orig
            num = (lp - lm) / (2 * eps)
            ana = grads[name].reshape(-1)[i]
            assert abs(num - ana) < 1e-6 + 1e-4 * abs(ana), \
                f"{name}[{i}]: numeric {num} vs analytic {ana}"
            checked += 1
    assert checked >= 60


def test_backward_matches_finite_differences_multi_instance():
    """Every trainable head parameter's analytic gradient matches a
    central finite difference of the joint masked loss."""
    _gradient_check("multi_instance")


def test_backward_matches_finite_differences_global():
    _gradient_check("global")


def test_adamw_linear_schedule():
    """AdamW warmup/decay factors follow the reference schedule
    (transformers get_linear_schedule_with_warmup) and decoupled decay
    skips bias parameters."""
    from jerex_ray.functions.optim import AdamW, linear_warmup_lr
    assert linear_warmup_lr(0, base_lr=1.0, warmup=2, total=10) == 0.0
    assert linear_warmup_lr(1, base_lr=1.0, warmup=2, total=10) == 0.5
    assert linear_warmup_lr(2, base_lr=1.0, warmup=2, total=10) == 1.0
    assert linear_warmup_lr(6, base_lr=1.0, warmup=2, total=10) == 0.5
    assert linear_warmup_lr(10, base_lr=1.0, warmup=2, total=10) == 0.0

    params = {"W_x": np.ones(3), "b_x": np.ones(3)}
    opt = AdamW(params, lr=0.1, weight_decay=0.5)
    opt.step({"W_x": np.zeros(3), "b_x": np.zeros(3)})
    # zero gradient: only decoupled decay moves W, never the bias
    assert np.all(params["W_x"] < 1.0)
    assert np.all(params["b_x"] == 1.0)


def test_sparse_table_range_max_matches_bruteforce():
    """The O(1) range-max structure behind J1/J9 pooling: every query
    == the direct slice max; empty and out-of-range intervals give
    zero rows."""
    from jerex_ray.stages.numpy_scorer import _range_max, _sparse_max_table
    rng = np.random.default_rng(11)
    h = rng.standard_normal((97, 5))
    st = _sparse_max_table(h)
    a = rng.integers(0, 120, size=400)
    b = rng.integers(-5, 130, size=400)
    out = _range_max(st, a, b, 5)
    for k in range(400):
        lo, hi = int(np.clip(a[k], 0, 97)), int(np.clip(b[k], 0, 97))
        want = h[lo:hi].max(axis=0) if hi > lo else np.zeros(5)
        np.testing.assert_array_equal(out[k], want)


def test_proj_blocks_cache_invalidates_on_weight_mutation():
    """Round-5 (ADVICE): the block-projection cache keys on an
    explicit weights-version counter — id()-based keys can alias when
    CPython reuses a freed array's address. Every mutation path
    (set_weights, load_checkpoint, HF head mapping) must bump it and
    change the projected blocks."""
    import numpy as np

    from jerex_ray.config import PipelineConfig
    from jerex_ray.stages.numpy_scorer import NumpyScorer
    from jerex_ray.stages.scorer import load_head_weights_from_state_dict

    sc = NumpyScorer(PipelineConfig().scaled_for_tests())
    sc._proj_blocks()
    v0, wm0 = sc._weights_version, sc._Wm_r.copy()

    sc.set_weights({"W_ml1": sc.W_ml1 * 2.0})
    assert sc._weights_version == v0 + 1
    sc._proj_blocks()
    assert np.allclose(sc._Wm_r, 2.0 * wm0)

    n = load_head_weights_from_state_dict(
        sc, {"mention_localization.linear.weight": sc.W_ml1.T * 0.5})
    assert n == 1 and sc._weights_version == v0 + 2
    sc._proj_blocks()
    assert np.allclose(sc._Wm_r, wm0)
