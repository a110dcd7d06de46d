"""Prediction → tuple conversion and triple explosion (M5–M7).

Mirrors ``/root/reference/jerex/evaluation/conversion.py``: mentions
are identified by word-level orig spans (``conversion.py:20-25``),
clusters by their mention sets, relations by (head cluster, tail
cluster, type) — here flattened to the engine's canonical output, a
flat ``(conv_id, subj, subj_type, pred, obj, obj_type, score)`` triple
table (FIXTURES.md §5). All explosions are vectorized with pyarrow
list offsets + numpy repeats — no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _list_lengths(col: pa.ChunkedArray) -> np.ndarray:
    return pc.list_value_length(col).to_numpy(zero_copy_only=False).astype(np.int64)


def _flat_values(col: pa.ChunkedArray) -> pa.Array:
    return pc.list_flatten(col).combine_chunks()


def explode_triples(batch: pa.Table) -> pa.Table:
    """Scored docs → flat triple rows. ``subj``/``obj`` are the cluster
    representative phrases (first-mention analogue, ``datasets.py:126-128``);
    canonicalization happens downstream."""
    n_rel = _list_lengths(batch["r_head"])
    if n_rel.sum() == 0:
        return _empty_triples_table()

    # per-doc cluster array base offsets (to index flattened cl_* arrays)
    n_cl = _list_lengths(batch["cl_rep"])
    cl_base = np.concatenate(([0], np.cumsum(n_cl)))[:-1]

    doc_index = np.repeat(np.arange(batch.num_rows), n_rel)
    head = _flat_values(batch["r_head"]).to_numpy().astype(np.int64)
    tail = _flat_values(batch["r_tail"]).to_numpy().astype(np.int64)
    base = cl_base[doc_index]

    cl_rep = _flat_values(batch["cl_rep"])
    cl_type = _flat_values(batch["cl_type"])
    subj = cl_rep.take(pa.array(base + head))
    obj = cl_rep.take(pa.array(base + tail))
    subj_type = cl_type.take(pa.array(base + head))
    obj_type = cl_type.take(pa.array(base + tail))

    conv = batch["conv_id"].take(pa.array(doc_index))
    part = batch["part_key"].take(pa.array(doc_index))
    return pa.table({
        "conv_id": conv,
        "part_key": part,
        "subj": subj,
        "subj_type": subj_type,
        "pred": _flat_values(batch["r_type"]),
        "obj": obj,
        "obj_type": obj_type,
        "score": _flat_values(batch["r_score"]),
        "evidence": _flat_values(batch["r_evidence_turn"]),
    })


def _empty_triples_table() -> pa.Table:
    return pa.table({
        "conv_id": pa.array([], pa.string()),
        "part_key": pa.array([], pa.int32()),
        "subj": pa.array([], pa.string()),
        "subj_type": pa.array([], pa.string()),
        "pred": pa.array([], pa.string()),
        "obj": pa.array([], pa.string()),
        "obj_type": pa.array([], pa.string()),
        "score": pa.array([], pa.float32()),
        "evidence": pa.array([], pa.int32()),
    })


def explode_codalab(batch: pa.Table) -> pa.Table:
    """DocRED sub-task prediction rows (S11): ``{title, h_idx, t_idx,
    r, evidence}`` per predicted relation (reference
    ``classification_evaluator.py:220-231``)."""
    n_rel = _list_lengths(batch["r_head"])
    doc_index = np.repeat(np.arange(batch.num_rows), n_rel)
    idx = pa.array(doc_index)
    return pa.table({
        "title": batch["conv_id"].take(idx),
        "h_idx": _flat_values(batch["r_head"]),
        "t_idx": _flat_values(batch["r_tail"]),
        "r": _flat_values(batch["r_type"]),
        "evidence": _flat_values(batch["r_evidence"]),
    })


def explode_mentions(batch: pa.Table) -> pa.Table:
    """Scored docs → flat mention rows (M5 analogue; word-level orig
    spans are the identity, ``conversion.py:20-25``)."""
    n_m = _list_lengths(batch["m_start"])
    doc_index = np.repeat(np.arange(batch.num_rows), n_m)
    idx = pa.array(doc_index)
    return pa.table({
        "doc_id": batch["doc_id"].take(idx),
        "conv_id": batch["conv_id"].take(idx),
        "start": _flat_values(batch["m_start"]),
        "end": _flat_values(batch["m_end"]),
        "sent_idx": _flat_values(batch["m_sent"]),
        "cluster": _flat_values(batch["m_cluster"]),
    })


def explode_entities(batch: pa.Table) -> pa.Table:
    """Scored docs → flat entity (cluster) rows (M6 analogue)."""
    n_cl = _list_lengths(batch["cl_rep"])
    doc_index = np.repeat(np.arange(batch.num_rows), n_cl)
    idx = pa.array(doc_index)
    cluster_idx = np.concatenate(
        [np.arange(k) for k in n_cl]) if len(n_cl) else np.empty(0, np.int64)
    return pa.table({
        "doc_id": batch["doc_id"].take(idx),
        "conv_id": batch["conv_id"].take(idx),
        "cluster": pa.array(cluster_idx, pa.int32()),
        "phrase": _flat_values(batch["cl_rep"]),
        "entity_type": _flat_values(batch["cl_type"]),
        "n_mentions": _flat_values(batch["cl_size"]),
    })
