"""SQL-oracle side tables for the KG evaluation joins.

The model forward is not SQL-expressible, but the EVAL JOIN is
(reference semantics ``/root/reference/jerex/evaluation/scoring.py:8-73``
— dedup-union per document, flatten, micro/macro P/R/F1). To make the
flagship eval queries driver-verifiable, each eval query writes its
comparison inputs (predicted and ground-truth tuple tables) to a FIXED
parquet path under ``/tmp/jerex_ray_oracle/<query>/``, and the query's
``oracle_sql()`` entry recomputes TP/FP/FN and the P/R/F1 arithmetic
from those files in one DuckDB statement. The driver (like
``scripts/check_oracle.py``) runs the Ray leg first, so the side
tables exist when the oracle executes.

Tuple serialization is injective: a mention is ``turn.start.end``, a
cluster the ``|``-join of its sorted mention keys, typed/relational
tuples join their parts with the ASCII unit separators ``\\x1d-\\x1f``
(never produced by the tokenizer), so set cardinalities — and hence
every metric — are preserved exactly.
"""

from __future__ import annotations

import os

import pandas as pd

ORACLE_SIDE_DIR = "/tmp/jerex_ray_oracle"


def side_path(query: str, name: str) -> str:
    return os.path.join(ORACLE_SIDE_DIR, query, f"{name}.parquet")


def write_side_table(query: str, name: str, df: pd.DataFrame) -> str:
    path = side_path(query, name)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    df.to_parquet(tmp, index=False)
    os.replace(tmp, path)
    return path


def span_key(sp) -> str:
    ti, s, e = sp
    return f"{int(ti)}.{int(s)}.{int(e)}"


def cluster_key(fs) -> str:
    return "|".join(sorted(span_key(sp) for sp in fs))


def _tuple_key(level: str, t) -> tuple[str, str]:
    """Serialize one level tuple → (key, type)."""
    if level == "mention":
        return span_key(t), ""
    if level == "coref":
        return cluster_key(t), ""
    if level == "entity":
        fs, ty = t
        return cluster_key(fs) + "\x1e" + ty, ty
    if level == "relation":
        h, tl, r = t
        return cluster_key(h) + "\x1d" + cluster_key(tl) + "\x1e" + r, r
    if level == "rel_nec":
        h, ht, tl, tt, r = t
        return (cluster_key(h) + "\x1f" + ht + "\x1d"
                + cluster_key(tl) + "\x1f" + tt + "\x1e" + r), r
    raise ValueError(level)


def joint_side_tables(convs: list, levels: dict) -> tuple[pd.DataFrame,
                                                          pd.DataFrame]:
    """``joint_level_tuples`` output → (gt_df, pred_df) flat tables
    ``(level, conv_id, key, type)``, one row per DISTINCT per-doc tuple
    (the dedup-union semantics of ``score_documents_micro``)."""
    rows_g: list[tuple] = []
    rows_p: list[tuple] = []
    for level, (g_docs, p_docs) in levels.items():
        for conv, g, p in zip(convs, g_docs, p_docs):
            for t in set(g):
                k, ty = _tuple_key(level, t)
                rows_g.append((level, conv, k, ty))
            for t in set(p):
                k, ty = _tuple_key(level, t)
                rows_p.append((level, conv, k, ty))
    cols = ["level", "conv_id", "key", "type"]
    return (pd.DataFrame(rows_g, columns=cols),
            pd.DataFrame(rows_p, columns=cols))


def _prf_sql(tp: str, np_: str, ng: str) -> str:
    """SQL fragment computing the same float sequence as ``_prf``:
    precision = tp/(tp+fp) = tp/n_pred, recall = tp/n_gt,
    f1 = 2*p*r/(p+r) — integer/integer division in DuckDB yields the
    identical IEEE double."""
    p = (f"CASE WHEN {np_} > 0 THEN CAST({tp} AS DOUBLE) / {np_} "
         "ELSE 0.0 END")
    r = (f"CASE WHEN {ng} > 0 THEN CAST({tp} AS DOUBLE) / {ng} "
         "ELSE 0.0 END")
    f = (f"CASE WHEN ({p}) + ({r}) > 0 THEN "
         f"2 * ({p}) * ({r}) / (({p}) + ({r})) ELSE 0.0 END")
    return p, r, f


def triple_eval_oracle_sql(query: str, key_cols: list[str]) -> str:
    """One-statement DuckDB replica of ``evaluate_triples``: distinct
    key sets on both sides, inner-join count = TP, unrounded P/R/F1."""
    pred = side_path(query, "pred")
    gt = side_path(query, "gt")
    keys = ", ".join(key_cols)
    p, r, f = _prf_sql("tp", "np_", "ng")
    return f"""
    WITH p AS (SELECT DISTINCT {keys}
               FROM read_parquet('{pred}')),
    g AS (SELECT DISTINCT {keys}
          FROM read_parquet('{gt}')),
    c AS (SELECT
        CAST((SELECT count(*) FROM p JOIN g USING ({keys}))
             AS BIGINT) AS tp,
        CAST((SELECT count(*) FROM p) AS BIGINT) AS np_,
        CAST((SELECT count(*) FROM g) AS BIGINT) AS ng)
    SELECT tp, np_ - tp AS fp, ng - tp AS fn,
           {p} AS precision, {r} AS recall, {f} AS f1
    FROM c"""


def evidence_eval_oracle_sql(query: str) -> str:
    """Replica of ``evaluate_triples_evidence``: the Python side writes
    the FIRST-occurrence-deduplicated predictions (key + scalar
    evidence) and the exploded GT (key + each admissible evidence
    turn); TP = pred rows whose (key, evidence) hits the GT explode."""
    pred = side_path(query, "pred")
    gt = side_path(query, "gt")
    keys = "conv_id, subj, pred, obj"
    p, r, f = _prf_sql("tp", "np_", "ng")
    return f"""
    WITH p AS (SELECT {keys}, evidence
               FROM read_parquet('{pred}')),
    ge AS (SELECT DISTINCT {keys}, evidence
           FROM read_parquet('{gt}')),
    gk AS (SELECT DISTINCT {keys} FROM ge),
    c AS (SELECT
        CAST((SELECT count(*) FROM p
              JOIN ge USING ({keys}, evidence)) AS BIGINT) AS tp,
        CAST((SELECT count(*) FROM p) AS BIGINT) AS np_,
        CAST((SELECT count(*) FROM gk) AS BIGINT) AS ng)
    SELECT tp, np_ - tp AS fp, ng - tp AS fn,
           {p} AS precision, {r} AS recall, {f} AS f1
    FROM c"""


def joint_metrics_oracle_sql(query: str) -> str:
    """Replica of ``joint_metrics``: micro P/R/F1 per level from the
    flat (level, conv_id, key) tables; per-type macro for the typed
    levels with the SAME left-fold-over-sorted-types summation
    (``list_sum(list(x ORDER BY type))``) Python uses, so the float
    dust matches; macro rows carry the -1 count sentinel."""
    pred = side_path(query, "pred")
    gt = side_path(query, "gt")
    p6, r6, f6 = _prf_sql("tp", "np_", "ng")
    pt, rt, ft = _prf_sql("tp", "np_", "ng")
    return f"""
    WITH p AS (SELECT DISTINCT level, conv_id, key, type
               FROM read_parquet('{pred}')),
    g AS (SELECT DISTINCT level, conv_id, key, type
          FROM read_parquet('{gt}')),
    lv AS (SELECT unnest(['mention', 'coref', 'entity', 'relation',
                          'rel_nec']) AS level),
    j AS (SELECT level, count(*) AS tp FROM p
          JOIN g USING (level, conv_id, key) GROUP BY level),
    np AS (SELECT level, count(*) AS n FROM p GROUP BY level),
    ng AS (SELECT level, count(*) AS n FROM g GROUP BY level),
    micro AS (
        SELECT lv.level, 'micro' AS average,
               CAST(coalesce(j.tp, 0) AS BIGINT) AS tp,
               CAST(coalesce(np.n, 0) AS BIGINT) AS np_,
               CAST(coalesce(ng.n, 0) AS BIGINT) AS ng
        FROM lv LEFT JOIN j ON j.level = lv.level
        LEFT JOIN np ON np.level = lv.level
        LEFT JOIN ng ON ng.level = lv.level),
    micro_out AS (
        SELECT level, average,
               round({p6}, 6) AS precision, round({r6}, 6) AS recall,
               round({f6}, 6) AS f1,
               tp, np_ - tp AS fp, ng - tp AS fn
        FROM micro),
    tt AS (SELECT DISTINCT level, type FROM (
               SELECT level, type FROM p
               UNION ALL SELECT level, type FROM g)
           WHERE level IN ('entity', 'relation')),
    jt AS (SELECT p.level, p.type, count(*) AS tp FROM p
           JOIN g USING (level, conv_id, key)
           WHERE p.level IN ('entity', 'relation')
           GROUP BY p.level, p.type),
    npt AS (SELECT level, type, count(*) AS n FROM p
            WHERE level IN ('entity', 'relation')
            GROUP BY level, type),
    ngt AS (SELECT level, type, count(*) AS n FROM g
            WHERE level IN ('entity', 'relation')
            GROUP BY level, type),
    per_type AS (
        SELECT tt.level, tt.type,
               CAST(coalesce(jt.tp, 0) AS BIGINT) AS tp,
               CAST(coalesce(npt.n, 0) AS BIGINT) AS np_,
               CAST(coalesce(ngt.n, 0) AS BIGINT) AS ng
        FROM tt LEFT JOIN jt ON jt.level = tt.level
                            AND jt.type = tt.type
        LEFT JOIN npt ON npt.level = tt.level AND npt.type = tt.type
        LEFT JOIN ngt ON ngt.level = tt.level AND ngt.type = tt.type),
    per_type_prf AS (
        SELECT level, type, {pt} AS prec, {rt} AS rec, {ft} AS f1
        FROM per_type),
    macro_out AS (
        SELECT level, 'macro' AS average,
               round(list_sum(list(prec ORDER BY type)) / count(*), 6)
                   AS precision,
               round(list_sum(list(rec ORDER BY type)) / count(*), 6)
                   AS recall,
               round(list_sum(list(f1 ORDER BY type)) / count(*), 6)
                   AS f1,
               CAST(-1 AS BIGINT) AS tp, CAST(-1 AS BIGINT) AS fp,
               CAST(-1 AS BIGINT) AS fn
        FROM per_type_prf GROUP BY level)
    SELECT * FROM micro_out
    UNION ALL SELECT * FROM macro_out
    ORDER BY level, average"""
