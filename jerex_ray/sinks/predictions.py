"""Per-document predictions sink (S7).

Reference analogue: the ``predictions.json`` writer
(``/root/reference/jerex/evaluation/joint_evaluator.py:111-135``) emits
one record per document with tokens, mentions, entities (mention index
lists + type) and relations (head/tail entity index + type). Here the
scored-document Dataset already carries exactly that structure as Arrow
list columns, so the sink is a partitioned parquet write of the scored
schema (plus an optional JSON mirror for small outputs).
"""

from __future__ import annotations


PREDICTION_COLUMNS = [
    "doc_id", "conv_id", "part_key",
    "m_start", "m_end", "m_sent", "m_cluster",
    "cl_rep", "cl_type", "cl_size",
    "r_head", "r_tail", "r_type", "r_score", "r_evidence",
]


def write_predictions(scored_ds, out_dir: str, *, as_json: bool = False):
    """Scored docs → partitioned predictions output.

    Parquet is the canonical format (one directory, partitioned by
    ``part_key``); ``as_json=True`` additionally writes newline JSON —
    only sensible for small fixture outputs."""
    ds = scored_ds.select_columns(PREDICTION_COLUMNS)
    ds.write_parquet(out_dir, partition_cols=["part_key"])
    if as_json:
        ds.write_json(out_dir + "_json")
    return out_dir
