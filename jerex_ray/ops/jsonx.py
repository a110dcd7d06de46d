"""Vectorized JSON field extraction over Arrow string columns.

Semi-structured payload columns (event properties, API responses,
tool-call arguments) are pervasive in transcript corpora; at 100 TB a
per-row ``json.loads`` is the classic hot-path Python loop this engine
bans. This module extracts scalar fields with ONE
``pyarrow.compute.extract_regex`` kernel call per batch — zero-copy
Arrow in and out, no Python per row — which is exact for the flat
``"key": value`` shapes these columns carry (a full JSON parser only
becomes necessary for nested/escaped payloads; the kernel's miss rows
surface as nulls rather than wrong values, so the fallback is visible).

SQL parity: DuckDB ``CAST(json_extract_string(col, '$.key') AS
BIGINT)`` — the oracled query ``q_events_props_agg`` checks the whole
extract → group → aggregate pipeline bit-for-bit.

The reference has no semi-structured columns anywhere (its input is
fully parsed DocRED JSON, SURVEY.md §1.2); this is an engine extension
for the LLM-data-pipeline charter.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def extract_json_int(batch: pa.Table, *, json_col: str, key: str,
                     out: str) -> pa.Table:
    """Append ``out``: the integer value of ``"key": N`` inside the
    JSON string column ``json_col`` (null where the key is absent).
    One compiled-regex kernel per batch; no Python per row."""
    pat = f'"{key}"\\s*:\\s*(?P<v>-?\\d+)'
    res = pc.extract_regex(batch[json_col], pattern=pat)
    vals = pc.cast(pc.struct_field(res, "v"), pa.int64())
    return batch.append_column(out, vals)


def extract_json_string(batch: pa.Table, *, json_col: str, key: str,
                        out: str) -> pa.Table:
    """Append ``out``: the (unescaped-free) string value of
    ``"key": "..."`` — exact for values without embedded quotes."""
    pat = f'"{key}"\\s*:\\s*"(?P<v>[^"]*)"'
    res = pc.extract_regex(batch[json_col], pattern=pat)
    return batch.append_column(out, pc.struct_field(res, "v"))
