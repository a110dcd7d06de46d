"""Split of the query registry: ``_shared`` part (mechanically derived from the original queries.py by scripts/split_queries.py; unit order and source text preserved)."""

from __future__ import annotations
import re
import numpy as np
import pandas as pd
from jerex_ray.config import PipelineConfig
from jerex_ray.runtime import configure_data_context

# cross-part oracle interpolation registry
ORACLE_REGISTRY: dict = {}

class _CapMentionStage:
    """Actor-pool UDF shared by the two mention-derived oracled queries:
    first-char-uppercase each token (the SQL-reconstructible casing),
    run the REAL rule mention localizer (``RuleScorer._score_doc``),
    and emit either raw spans (``mode='spans'``) or canonical-entity
    partial counts (``mode='partials'``). The scorer lives in the
    actor so its memo caches amortize across batches."""

    def __init__(self, *, mode: str):
        from jerex_ray.stages.scorer import RuleScorer
        self.mode = mode
        self.scorer = RuleScorer(PipelineConfig())

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from jerex_ray.lexicon import entity_type_of
        from jerex_ray.util import md5_hash64_batch

        ids, starts, ends = [], [], []
        norms, surfaces, etypes = [], [], []
        for doc_id, text in zip(batch["doc_id"], batch["text"].fillna("")):
            toks = [t[0].upper() + t[1:] for t in text.split()]
            if not toks:
                continue
            ms, _, _, _, _ = self.scorer._score_doc(
                toks, np.zeros(len(toks), dtype=np.int32),
                np.asarray([0, len(toks)], dtype=np.int32))
            for s, e, _sent in ms:
                if self.mode == "spans":
                    ids.append(doc_id)
                    starts.append(s)
                    ends.append(e)
                else:
                    surface = " ".join(toks[s:e])
                    ids.append(doc_id)
                    surfaces.append(surface)
                    norms.append(surface.lower())
                    etypes.append(entity_type_of(toks[s:e]))
        if self.mode == "doc_norms":
            # per-doc typed mentions (distant supervision / per-doc
            # entity sets); dedup happens downstream
            return pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "norm": pd.Series(norms, dtype="object"),
                "entity_type": pd.Series(etypes, dtype="object")})
        if self.mode == "spans":
            return pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                                 "m_start": pd.Series(starts, dtype="int64"),
                                 "m_end": pd.Series(ends, dtype="int64")})
        if not norms:
            return pd.DataFrame({
                "entity_id": pd.Series(dtype="int64"),
                "norm": pd.Series(dtype="object"),
                "surface": pd.Series(dtype="object"),
                "entity_type": pd.Series(dtype="object"),
                "n": pd.Series(dtype="int64")})
        df = pd.DataFrame({
            "entity_id": (md5_hash64_batch(norms)
                          % np.uint64(1 << 63)).astype(np.int64),
            "norm": norms, "surface": surfaces, "entity_type": etypes})
        return df.groupby(["entity_id", "norm", "surface", "entity_type"],
                          sort=False).size().reset_index(name="n")

_BM25_QUERIES = ["spark join fast", "dup", "window stream query sort"]

def _query_vectors(sf_dir: str):
    """The same predicate the oracle uses (``q.vec_id < 3``): query
    vectors selected by value, their actual vec_id kept as query_idx —
    never positional indices (non-contiguous ids stay in sync)."""
    import pyarrow.parquet as pq
    qdf = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    qdf = qdf[qdf["vec_id"] < 3].sort_values("vec_id")
    return np.stack(qdf["embedding"].to_numpy()), qdf["vec_id"].to_numpy()

# canonical definition lives in eval.scoring (imported there by the
# metric arithmetic); re-exported here for the query registry
from jerex_ray.eval.scoring import _round_half_away  # noqa: E402,F401

def _repeat_copurchase_edges(sf_dir: str, min_cocount: int = 2):
    """Thresholded co-purchase edge Dataset (a, b): part pairs sharing
    ≥ ``min_cocount`` orders — the sparse graph where triangle/path
    structure is signal rather than density noise. One per-order
    co-location pass + one pair-count combiner."""
    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    li = read_parquet_sized(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey"])

    def pairs_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"a": pd.Series(dtype="int64"),
                                 "b": pd.Series(dtype="int64"),
                                 "c": pd.Series(dtype="int64")})
        d = df.drop_duplicates(["l_orderkey", "l_partkey"])
        m = d.merge(d, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        g = m.groupby(["l_partkey_x", "l_partkey_y"], sort=False) \
            .size().reset_index(name="c")
        return pd.DataFrame({"a": g["l_partkey_x"].to_numpy(),
                             "b": g["l_partkey_y"].to_numpy(),
                             "c": g["c"].to_numpy(np.int64)})

    cnt = grouped_aggregate(
        grouped_apply(li, ["l_orderkey"], pairs_block),
        ["a", "b"], {"n": ("c", "sum")})
    return cnt.map_batches(
        lambda df: df[df["n"] >= min_cocount][["a", "b"]]
        if "a" in df.columns else df, batch_format="pandas")

_N_TOKENS_SQL = ("array_length(list_filter(regexp_split_to_array(text, '\\s+'), "
                 "x -> x <> ''))")

_EXACT_JACCARD_EDGES_SQL = """
    WITH words AS (
        SELECT doc_id, list_filter(
            regexp_split_to_array(lower(text), '\\s+'),
            x -> x <> '') AS ws
        FROM documents
    ),
    grams AS (
        SELECT doc_id,
               CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
                    ELSE [array_to_string(ws[i:i+2], ' ')
                          for i in range(1, len(ws) - 1)] END AS gs
        FROM words WHERE len(ws) > 0
    ),
    dg AS (SELECT doc_id, unnest(list_distinct(gs)) AS g FROM grams),
    cnt AS (SELECT doc_id, count(*) AS c FROM dg GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
        FROM dg a JOIN dg b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b
    FROM inter
    JOIN cnt ca ON ca.doc_id = doc_a
    JOIN cnt cb ON cb.doc_id = doc_b
    WHERE CAST(i AS DOUBLE) / (ca.c + cb.c - i) >= 0.7
    ORDER BY doc_a, doc_b
"""

def _doc_mentions_sql(where: str = "TRUE") -> str:
    """Per-document mention runs over ``documents`` rows matching
    ``where``: the gaps-and-islands reconstruction of the rule mention
    localizer, one row per mention with its typed normalized surface —
    (doc_id, surface, norm, entity_type). The shared base of the
    canonicalization, entity-linking, and distant-supervision
    oracles."""
    return f"""
            WITH w AS (
                SELECT doc_id, list_filter(
                    regexp_split_to_array(text, '\\s+'), x -> x <> '') AS ws
                FROM documents WHERE {where}
            ),
            t AS (
                SELECT doc_id, unnest(ws) AS tok,
                       unnest(range(len(ws))) AS pos
                FROM w
            ),
            c AS (
                SELECT doc_id, pos,
                       upper(substr(tok, 1, 1)) || substr(tok, 2) AS cap
                FROM t
            ),
            f AS (
                SELECT doc_id, pos, cap,
                       (regexp_matches(cap, '^[A-Z][A-Za-z0-9]*$')
                        AND cap NOT IN ('The','A','An','It','He','She',
                            'They','We','I','You','This','That','These',
                            'Those','There','Here','What','Where','When',
                            'Who','Why','How','Yes','No','Ok','Okay',
                            'Please','Thanks','Hello','Hi')) AS isname
                FROM c
            ),
            g AS (
                SELECT doc_id, pos, cap, isname,
                       pos - ROW_NUMBER() OVER (
                           PARTITION BY doc_id, isname ORDER BY pos) AS grp
                FROM f
            ),
            runs AS (
                SELECT doc_id, grp,
                       min(pos) AS m_start, max(pos) + 1 AS m_end,
                       string_agg(cap, ' ' ORDER BY pos) AS surface,
                       arg_max(cap, pos) AS last_tok,
                       count(*) AS n_toks
                FROM g WHERE isname GROUP BY doc_id, grp
                HAVING count(*) <= 10
            ),
            m AS (
                SELECT doc_id, m_start, m_end, surface,
                       lower(surface) AS norm,
                       CASE WHEN last_tok IN ('Corp','Inc','Labs',
                                'Systems','Group','Ltd') THEN 'ORG'
                            WHEN last_tok LIKE '%Tool' THEN 'TOOL'
                            WHEN n_toks = 1 AND surface IN ('Berlin',
                                'Paris','London','Tokyo','Osaka','Madrid',
                                'Rome','Vienna','Zurich','Geneva','Oslo',
                                'Stockholm','Helsinki','Lisbon','Dublin',
                                'Prague','Warsaw','Budapest','Athens',
                                'Seoul','Taipei','Singapore','Sydney',
                                'Auckland','Toronto','Montreal','Chicago',
                                'Boston','Seattle','Austin','Denver',
                                'Portland','Atlanta','Dallas','Houston',
                                'Phoenix','Miami','Nairobi','Cairo',
                                'Lagos','Mumbai','Delhi','Jakarta')
                                THEN 'LOC'
                            ELSE 'PER' END AS entity_type
                FROM runs
            )
            SELECT doc_id, m_start, m_end, surface, norm, entity_type
            FROM m
    """

def _canonical_entities_sql(where: str = "TRUE") -> str:
    """SQL reconstruction of the canonical entity table
    (``doc_entity_canonical``) over ``documents`` rows matching
    ``where`` — shared by the canonicalization oracle and the entity
    linking oracle (which builds its KB from a doc shard). Emits
    (entity_id, norm, surface, entity_type, n_occurrences), unordered
    (callers append ORDER BY)."""
    return f"""
            WITH m AS ({_doc_mentions_sql(where)}),
            counts AS (
                SELECT CAST(CAST('0x' || substr(md5(norm), 1, 16)
                            AS UBIGINT) % 9223372036854775808 AS BIGINT)
                           AS entity_id,
                       norm, surface, entity_type, count(*) AS n
                FROM m GROUP BY entity_id, norm, surface, entity_type
            ),
            tot AS (
                SELECT entity_id, CAST(sum(n) AS BIGINT) AS n_occurrences
                FROM counts GROUP BY entity_id
            ),
            top AS (
                SELECT entity_id, norm, surface, entity_type,
                       ROW_NUMBER() OVER (PARTITION BY entity_id
                           ORDER BY n DESC, surface, entity_type) AS rk
                FROM counts
            )
            SELECT top.entity_id, top.norm, top.surface, top.entity_type,
                   tot.n_occurrences
            FROM top JOIN tot USING (entity_id) WHERE rk = 1
    """

QUERIES = {}

ORACLES = {
}
