"""Driver contract for the graft builder (Ray Data target).

The driver initialises Ray itself before importing this module: nothing
here (or in jerex_ray) calls ``ray.init``/``ray.shutdown``.

* ``entry()`` — flagship KG pipeline on sf0.001-scale synthetic
  transcripts (the graft input shape from BASELINE.json), returning the
  canonicalized triple table.
* ``queries()`` — every implemented operator/pipeline, one callable per
  SURVEY.md §2 entry (KG stages, dedup family, similarity search, text
  analysis, relational operators).
* ``oracle_sql()`` — exact DuckDB equivalents for the SQL-expressible
  queries. The flagship EVAL JOINS (kg_eval / kg_eval_strict /
  kg_eval_evidence / kg_joint_metrics) are oracled via parquet side
  tables the Ray leg writes first (run order: query, then its oracle
  — the driver and scripts/check_oracle.py both do this); only the
  model forwards, codecs and recall-gated ANN twins remain rows-only
  by nature.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from jerex_ray.pipelines.queries import build_oracle_sql, build_queries


def entry() -> Any:
    """Flagship pipeline on sf0.001-scale input; driver checks rows>=0."""
    from jerex_ray.pipelines.queries import kg_triples
    return kg_triples("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return build_queries()


def oracle_sql() -> dict[str, str]:
    return build_oracle_sql()
