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
