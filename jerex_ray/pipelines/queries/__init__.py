"""The engine's query registry: every operator/pipeline exposed as a
``(sf_dir) -> result`` callable, plus DuckDB oracle SQL where the
semantics are SQL-expressible (driver contract, ``__ray_entry__.py``).

KG-construction queries run over the engine's own deterministic
synthetic transcripts (the graft input shape has no driver-provided
table; size scales with the sf directory). They are rows-only checks
(non-SQL-expressible model inference). All relational / text / vector
queries run over the driver's parquet tables with exact SQL oracles —
column names match the SQL aliases exactly.
"""

from . import _shared, kg, docs_a, docs_b, docs_c, events_a, events_b, events_c, events_d, users, embed, tpch_a, tpch_b, tpch_c  # noqa: E501

_PARTS = [_shared, kg, docs_a, docs_b, docs_c, events_a, events_b, events_c, events_d, users, embed, tpch_a, tpch_b, tpch_c]

# flat namespace: every public AND underscore name of every part is
# importable from jerex_ray.pipelines.queries, exactly as before the
# split (tests import private helpers by name)
for _m in _PARTS:
    for _n in dir(_m):
        if not _n.startswith("__") and _n not in globals():
            globals()[_n] = getattr(_m, _n)
del _m, _n


def build_queries() -> dict:
    out = {}
    for _p in _PARTS:
        out.update(_p.QUERIES)
    return out


def build_oracle_sql() -> dict:
    out = {}
    for _p in _PARTS:
        out.update(_p.ORACLES)
    return out


# compat: the monolith exposed the literal-dict builder by this name
_build_oracle_sql_literal = build_oracle_sql

