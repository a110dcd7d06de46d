"""Split of the query registry: ``kg`` part (mechanically derived from the original queries.py by scripts/split_queries.py; unit order and source text preserved)."""

from __future__ import annotations
import re
import numpy as np
import pandas as pd
from jerex_ray.config import PipelineConfig
from jerex_ray.runtime import configure_data_context
from jerex_ray.eval.scoring import TRIPLE_KEY, TRIPLE_KEY_NEC
from jerex_ray.eval.side_tables import (evidence_eval_oracle_sql,
                                            joint_metrics_oracle_sql,
                                            triple_eval_oracle_sql)
from jerex_ray.pipelines.queries._shared import ORACLE_REGISTRY
from jerex_ray.pipelines.queries._shared import _CapMentionStage, _canonical_entities_sql, _doc_mentions_sql, _round_half_away  # noqa: E501

def _sf_value(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.01

def _sf_convs(sf_dir: str) -> int:
    # ~100 convs at sf0.001, 800 at sf0.01, 8000 at sf0.1
    return max(100, int(_sf_value(sf_dir) * 80_000))

def _kg_config() -> PipelineConfig:
    return PipelineConfig(num_output_partitions=8)

# the rule-pipeline oracles (kg_mentions / kg_triples / kg_entities)
# read a deterministic token side table; the extra tokenize pass that
# writes it only runs at driver-contract corpus sizes so the BENCH
# timings of the same queries stay pure pipeline. Above the bound the
# stale side dir is removed so an out-of-scale oracle run fails loudly
# (missing file) instead of comparing against old tokens.
_RULE_TOKEN_SIDE_MAX_CONVS = 2000


def _token_rows_batch(batch):
    """Tokenized docs → one row per token (doc_id, conv_id, sent_idx,
    doc-word pos, tok) — the deterministic input the rule-pipeline SQL
    oracles replay span/coref/relation logic over."""
    import pyarrow as pa
    import pyarrow.compute as pc
    n_tok = pc.list_value_length(batch["tok_phrase"]) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    idx = pa.array(np.repeat(np.arange(batch.num_rows), n_tok))
    pos = (np.arange(int(n_tok.sum()), dtype=np.int64)
           - np.repeat(np.concatenate(([0], np.cumsum(n_tok)[:-1])),
                       n_tok))
    return pa.table({
        "doc_id": batch["doc_id"].take(idx),
        "conv_id": batch["conv_id"].take(idx),
        "sent_idx": pc.list_flatten(batch["tok_sent"]).cast(pa.int64()),
        "pos": pa.array(pos),
        "tok": pc.list_flatten(batch["tok_phrase"])})


def _write_rule_tokens_side(query: str, tok_ds) -> None:
    from jerex_ray.eval.side_tables import write_side_table
    write_side_table(query, "tokens",
                     tok_ds.map_batches(_token_rows_batch,
                                        batch_format="pyarrow").to_pandas())


def _maybe_write_rule_tokens(query: str, sf_dir: str, cfg) -> None:
    """Side-table write for the rule-pipeline oracles, gated to
    driver-contract scale (see _RULE_TOKEN_SIDE_MAX_CONVS)."""
    import shutil

    from jerex_ray.eval.side_tables import ORACLE_SIDE_DIR
    from jerex_ray.pipelines.kg import _with_part_key
    from jerex_ray.sources.transcripts import read_synthetic_transcripts
    from jerex_ray.stages.assemble import assemble_documents
    from jerex_ray.stages.tokenize import tokenize_documents
    configure_data_context()   # BEFORE any dataset is created
    n = _sf_convs(sf_dir)
    if n > _RULE_TOKEN_SIDE_MAX_CONVS:
        shutil.rmtree(f"{ORACLE_SIDE_DIR}/{query}", ignore_errors=True)
        return
    docs = assemble_documents(
        _with_part_key(read_synthetic_transcripts(n), cfg))
    _write_rule_tokens_side(query, tokenize_documents(docs, cfg))


def kg_triples(sf_dir: str):
    """Flagship RuleScorer extraction — SQL-ORACLED end-to-end: the
    oracle replays the ENTIRE frozen-rule pipeline (M1 span islands →
    J3/J4 coref rules incl. levenshtein → J5 complete-linkage greedy
    replay as a recursive CTE with the reference's (dist, ca, cb)
    tie-break → J6/J7 typing → J8/J9 between-context cue relations)
    over the deterministic token side table."""
    from jerex_ray.pipelines.kg import extract_triples
    from jerex_ray.sources.transcripts import read_synthetic_transcripts
    configure_data_context()
    cfg = _kg_config()
    _maybe_write_rule_tokens("kg_triples", sf_dir, cfg)
    ds = read_synthetic_transcripts(_sf_convs(sf_dir))
    t = extract_triples(ds, cfg).to_pandas()
    cols = ["conv_id", "subj", "subj_type", "pred", "obj", "obj_type",
            "subj_norm", "obj_norm"]
    return t[cols].drop_duplicates().sort_values(cols).reset_index(drop=True)

def _kg_triples_with_scorer(sf_dir: str, scorer_cls, **scorer_kwargs):
    from jerex_ray.pipelines.kg import extract_triples
    from jerex_ray.sources.transcripts import read_synthetic_transcripts
    configure_data_context()
    # full rule-scorer corpus: the chunk interiors are vectorized
    # (reduceat segment-max + one matmul per chunk), so the head-math
    # model runs the same conv count as kg_triples
    ds = read_synthetic_transcripts(_sf_convs(sf_dir))
    t = extract_triples(ds, _kg_config(), scorer_cls=scorer_cls,
                        scorer_kwargs=scorer_kwargs).to_pandas()
    cols = ["conv_id", "subj", "subj_type", "pred", "obj", "obj_type",
            "subj_norm", "obj_norm"]
    return t[cols].drop_duplicates().sort_values(cols).reset_index(drop=True)

def kg_triples_numpy(sf_dir: str):
    """J1–J9 frozen-random head-math model (rows-only: model
    inference; chunk-cap parity is pytest-gated)."""
    from jerex_ray.stages.numpy_scorer import NumpyScorer
    return _kg_triples_with_scorer(sf_dir, NumpyScorer)

def kg_triples_global(sf_dir: str):
    """J10 global relation variant (reference JointGlobalModel)."""
    from jerex_ray.stages.numpy_scorer import NumpyScorer
    return _kg_triples_with_scorer(sf_dir, NumpyScorer, variant="global")

def kg_train_loss(sf_dir: str):
    """Full reference train path (T1–T10 sampling → J-head forward →
    G4 joint masked loss) as a streaming pipeline over silver GT
    distilled from the rule scorer. Rows-only: one corpus-mean loss
    row (float means are batch-order sensitive in the last bits)."""
    from jerex_ray.pipelines.train import (silver_gt_from_rule_scorer,
                                           training_objective)
    from jerex_ray.sources.transcripts import read_synthetic_transcripts
    configure_data_context()
    cfg = _kg_config()
    n = max(50, _sf_convs(sf_dir) // 8)
    gt_m, gt_r, tok = silver_gt_from_rule_scorer(
        read_synthetic_transcripts(n), cfg, return_tokenized=True)
    _, mean = training_objective(tok, gt_m, gt_r, config=cfg)
    return mean.round(6)

def kg_train_step(sf_dir: str):
    """Synchronous data-parallel AdamW training of the head parameters
    (analytic numpy backward, reference schedule model.py:188-204):
    three epochs over silver GT; returns the per-epoch corpus-mean
    loss history. Rows-only: model training is not SQL-expressible;
    the gradient itself is finite-difference-checked in pytest and the
    loss must decrease across epochs (asserted here)."""
    from jerex_ray.pipelines.train import (silver_gt_from_rule_scorer,
                                           train_epochs)
    from jerex_ray.sources.transcripts import read_synthetic_transcripts
    configure_data_context()
    cfg = _kg_config()
    n = max(50, _sf_convs(sf_dir) // 16)
    gt_m, gt_r, tok = silver_gt_from_rule_scorer(
        read_synthetic_transcripts(n), cfg, return_tokenized=True)
    # fixed samples across epochs: the monotonic-decrease assertion
    # must not depend on per-epoch negative re-draws (the resampling
    # path is pytest-covered)
    hist, _ = train_epochs(tok, gt_m, gt_r, epochs=3, lr=5e-3,
                           warmup_ratio=0.0, config=cfg,
                           resample_per_epoch=False)
    losses = hist["loss"].to_numpy()
    assert (np.diff(losses) < 0).all(), f"loss not decreasing: {losses}"
    return hist[["epoch", "n_docs", "loss", "lr"]].round(6)

def media_image_features(sf_dir: str):
    """Actor-pool image decode (REAL pure-python PPM/BMP codecs) →
    resize → per-channel mean features over a deterministic synthetic
    media table (no media parquet in the driver's tables). Rows-only:
    binary codecs are not SQL-expressible; round-trip exactness is
    pytest-gated (test_multimodal_codec_roundtrips)."""
    import ray.data as rd

    from jerex_ray.ops.multimodal import image_features, synth_media_table
    configure_data_context()
    n = max(50, _sf_convs(sf_dir) // 4)
    media = rd.from_arrow(synth_media_table(n, kind="image"))
    out = image_features(media).to_pandas()
    assert out["decode_ok"].all()
    return out.drop(columns=["decode_ok"]) \
        .sort_values("media_id").reset_index(drop=True)

def media_image_resize(sf_dir: str):
    """Actor-pool decode → nearest-neighbor resize to 16×16 →
    re-encode PPM (``ops/multimodal.image_resize``) — the
    fixed-shape stage before tensor batching. Rows-only (binary
    codecs are not SQL-expressible); pixel-exactness of the resize is
    pytest-gated (test_image_resize_roundtrip_and_bad_payload)."""
    import ray.data as rd

    from jerex_ray.ops.multimodal import image_resize, synth_media_table
    configure_data_context()
    n = max(50, _sf_convs(sf_dir) // 4)
    media = rd.from_arrow(synth_media_table(n, kind="image"))
    out = image_resize(media, target_h=16, target_w=16).to_pandas()
    assert out["decode_ok"].all()
    out["payload_len"] = out["payload"].str.len().astype("int64")
    return out[["media_id", "height", "width", "payload_len"]]         .sort_values("media_id").reset_index(drop=True)

def media_audio_frames(sf_dir: str):
    """Actor-pool WAV decode (stdlib wave) → per-second RMS energy
    frames (flat_map-shaped). Rows-only, pytest-gated like the image
    path."""
    import ray.data as rd

    from jerex_ray.ops.multimodal import audio_frames, synth_media_table
    configure_data_context()
    n = max(50, _sf_convs(sf_dir) // 8)
    media = rd.from_arrow(synth_media_table(n, kind="audio"))
    out = audio_frames(media).to_pandas()
    assert out["decode_ok"].all()
    return out.drop(columns=["decode_ok"]) \
        .sort_values(["media_id", "frame_idx"]).reset_index(drop=True)

def media_video_frames(sf_dir: str):
    """Actor-pool video frame-sample over netpbm PPM streams
    (concatenated P6 frames — real decode): every 2nd frame's channel
    means. Rows-only; codec round-trips are pytest-gated."""
    import ray.data as rd

    from jerex_ray.ops.multimodal import synth_media_table, video_frame_sample
    configure_data_context()
    n = max(50, _sf_convs(sf_dir) // 16)
    media = rd.from_arrow(synth_media_table(n, kind="video"))
    out = video_frame_sample(media, stride=2).to_pandas()
    assert out["decode_ok"].all()
    return out.drop(columns=["decode_ok"]) \
        .sort_values(["media_id", "frame_idx"]).reset_index(drop=True)

def kg_entities(sf_dir: str):
    """Canonical entity table over the flagship extraction —
    SQL-ORACLED end-to-end (same full rule-pipeline replay as the
    ``kg_triples`` oracle, then the md5-id canonical aggregation of
    ``_canonical_entities_sql``)."""
    from jerex_ray.pipelines.kg import extract_triples
    from jerex_ray.sources.transcripts import read_synthetic_transcripts
    from jerex_ray.stages.canonicalize import build_entity_table
    configure_data_context()
    cfg = _kg_config()
    _maybe_write_rule_tokens("kg_entities", sf_dir, cfg)
    ds = read_synthetic_transcripts(_sf_convs(sf_dir))
    ents = build_entity_table(extract_triples(ds, cfg)).to_pandas()
    return ents.sort_values("norm").reset_index(drop=True)

def kg_mentions(sf_dir: str):
    """Flagship mention stage (M1 candidate enumeration + the rule
    mention localizer's maximal-name-run thresholding, reference
    ``sampling_common.py:77-98`` + ``conversion.py:20-25`` identity) —
    SQL-ORACLED via the side-table pattern: the deterministic token
    stream (doc_id, sent, pos, tok) is written to parquet and the
    oracle replays the span logic as gaps-and-islands SQL. Mention
    identity is the word-level orig span; the cluster assignment is a
    separate (clustering-dependent) stage and not part of this
    query."""
    from jerex_ray.sources.transcripts import read_synthetic_transcripts
    from jerex_ray.stages.assemble import assemble_documents
    from jerex_ray.stages.convert import explode_mentions
    from jerex_ray.stages.scorer import score_documents
    from jerex_ray.stages.tokenize import tokenize_documents
    configure_data_context()
    cfg = _kg_config()
    n = _sf_convs(sf_dir)
    ds = read_synthetic_transcripts(n)
    from jerex_ray.pipelines.kg import _with_part_key
    docs = assemble_documents(_with_part_key(ds, cfg))
    tok = tokenize_documents(docs, cfg)
    if n <= _RULE_TOKEN_SIDE_MAX_CONVS:
        # oracle support at driver-contract scale only (same gate as
        # _maybe_write_rule_tokens); materialize so the side-table
        # pass and scoring share one tokenization
        tok = tok.materialize()
        _write_rule_tokens_side("kg_mentions", tok)
    else:
        import shutil

        from jerex_ray.eval.side_tables import ORACLE_SIDE_DIR
        shutil.rmtree(f"{ORACLE_SIDE_DIR}/kg_mentions",
                      ignore_errors=True)
    scored = score_documents(tok, cfg)
    m = scored.map_batches(explode_mentions, batch_format="pyarrow") \
        .to_pandas().drop(columns=["cluster"])
    for c in ("start", "end", "sent_idx"):
        m[c] = m[c].astype("int64")
    return m.sort_values(["conv_id", "doc_id", "start", "end"]) \
            .reset_index(drop=True)

def _doc_entity_sets(sf_dir: str):
    """Distinct (doc_id, norm, entity_type) Dataset over ``documents``
    — ONE rule-mention actor pass + one combiner aggregate,
    MATERIALIZED so every consumer (distant-supervision positives and
    negatives, PMI, the KB shard) reuses it instead of re-running the
    scorer (the most expensive stage)."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized

    rows = read_parquet_sized(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"]).map_batches(
        _CapMentionStage, batch_format="pandas", batch_size=4096,
        concurrency=(1, 4), fn_constructor_kwargs={"mode": "doc_norms"})
    return grouped_aggregate(rows, ["doc_id", "norm", "entity_type"],
                             {"n": (None, "count")},
                             result_hint="large").materialize()

def _per_org_pairs_block(df: pd.DataFrame) -> pd.DataFrame:
    """Within-document PER×ORG pair generation (vectorized self-merge
    on doc_id) — shared by the distant-supervision and PMI queries."""
    if df.empty:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "subj_norm": pd.Series(dtype="object"),
                             "obj_norm": pd.Series(dtype="object")})
    per = df[df["entity_type"] == "PER"][["doc_id", "norm"]]
    org = df[df["entity_type"] == "ORG"][["doc_id", "norm"]]
    m = per.merge(org, on="doc_id", suffixes=("_s", "_o"))
    return pd.DataFrame({"doc_id": m["doc_id"].to_numpy(),
                         "subj_norm": m["norm_s"].to_numpy(),
                         "obj_norm": m["norm_o"].to_numpy()})

def _kb_pair_set(de_ds) -> set:
    """KB = the PER×ORG co-occurrence pairs of the ``doc_id % 3 == 0``
    shard, FILTERED from the already-computed corpus entity sets (the
    scorer never runs twice)."""
    kb = de_ds.map_batches(lambda df: df[df["doc_id"] % 3 == 0],
                           batch_format="pandas").to_pandas()
    if "doc_id" not in kb.columns:
        return set()
    return set(map(tuple, _per_org_pairs_block(kb)
                   [["subj_norm", "obj_norm"]].values))

def kg_distant_supervision(sf_dir: str):
    """Distant-supervision relation labeling (Mintz et al. ACL'09):
    entity pairs co-occurring in a corpus document are labeled with
    the relation a KB asserts for them — here the KB is the PER×ORG
    co-occurrence pairs of the ``doc_id % 3 == 0`` shard. The classic
    silver-training-data generator for relation extractors. Dataflow:
    the SHARED materialized doc-entity pass (``_doc_entity_sets``) →
    per-doc pair generation (co-located self-merge) → broadcast
    semi-join against the KB pair set (KB-bounded). The SQL oracle
    rebuilds both sides from the shared mention-runs CTE."""
    import ray

    from jerex_ray.functions.aggregate import grouped_apply

    de = _doc_entity_sets(sf_dir)
    kb_ref = ray.put(_kb_pair_set(de))
    cand = grouped_apply(de, ["doc_id"], _per_org_pairs_block)

    def against_kb(df: pd.DataFrame) -> pd.DataFrame:
        pairs = ray.get(kb_ref)
        keep = [(s, o) in pairs for s, o in
                zip(df["subj_norm"], df["obj_norm"])]
        out = df[np.asarray(keep, dtype=bool)].copy() if len(df) else df
        out["rel"] = "works_at"
        return out

    out = cand.map_batches(against_kb, batch_format="pandas").to_pandas()
    if "doc_id" not in out.columns:
        out = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                            "subj_norm": pd.Series(dtype="object"),
                            "obj_norm": pd.Series(dtype="object"),
                            "rel": pd.Series(dtype="object")})
    out = out.drop_duplicates(["doc_id", "subj_norm", "obj_norm"])
    out["doc_id"] = out["doc_id"].astype("int64")
    return out[["doc_id", "subj_norm", "obj_norm", "rel"]] \
        .sort_values(["doc_id", "subj_norm", "obj_norm"]) \
        .reset_index(drop=True)

def kg_distant_negatives(sf_dir: str):
    """The negative half of the distant-supervision training set
    (Mintz '09 §4): co-occurring PER×ORG pairs the KB does NOT
    assert, capped at 2 per document by a deterministic md5 priority
    (negative sampling must be reproducible across reruns and
    shards — no RNG). Same shared dataflow as
    ``kg_distant_supervision`` with the broadcast set flipped to an
    anti-join + a vectorized per-doc top-k."""
    import ray

    from jerex_ray.functions.aggregate import grouped_apply

    de = _doc_entity_sets(sf_dir)
    kb_ref = ray.put(_kb_pair_set(de))

    def negatives_block(df: pd.DataFrame) -> pd.DataFrame:
        from jerex_ray.util import md5_hash64_batch
        pairs = _per_org_pairs_block(df).drop_duplicates(
            ["doc_id", "subj_norm", "obj_norm"])
        if pairs.empty:
            pairs["priority"] = pd.Series(dtype="uint64")
            return pairs
        known = ray.get(kb_ref)
        keep = [(s, o) not in known for s, o in
                zip(pairs["subj_norm"], pairs["obj_norm"])]
        neg = pairs[np.asarray(keep, dtype=bool)].copy()
        if neg.empty:
            neg["priority"] = pd.Series(dtype="uint64")
            return neg
        neg["priority"] = md5_hash64_batch(
            neg["doc_id"].astype(str) + "|" + neg["subj_norm"]
            + "|" + neg["obj_norm"])
        neg = neg.sort_values(["doc_id", "priority", "subj_norm",
                               "obj_norm"])
        return neg.groupby("doc_id", sort=False).head(2)

    out = grouped_apply(de, ["doc_id"], negatives_block).to_pandas()
    if "doc_id" not in out.columns:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "subj_norm": pd.Series(dtype="object"),
                             "obj_norm": pd.Series(dtype="object")})
    out["doc_id"] = out["doc_id"].astype("int64")
    return out[["doc_id", "subj_norm", "obj_norm"]] \
        .sort_values(["doc_id", "subj_norm", "obj_norm"]) \
        .reset_index(drop=True)

def kg_pair_pmi(sf_dir: str):
    """Pointwise mutual information of PER×ORG document co-occurrence
    — the classic association score for ranking candidate KG edges
    (Church & Hanks '90): pmi = ln(N·c(s,o) / (df(s)·df(o))) over
    per-document entity sets. Document frequency is per NORM across
    all entity types — count of distinct docs, exactly the oracle's
    count(DISTINCT doc_id) — from two combiner aggregates over the
    SHARED doc-entity pass; the vocabulary-bounded df table
    broadcasts into the final vectorized score pass."""
    import ray

    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply
    from jerex_ray.runtime import read_parquet_sized

    n_docs = read_parquet_sized(f"{sf_dir}/documents.parquet",
                                columns=["doc_id"]).count()
    de = _doc_entity_sets(sf_dir)

    # df(norm) = #distinct docs mentioning the norm under ANY type:
    # collapse (doc, norm) first, then count per norm
    dn = grouped_aggregate(
        de.map_batches(lambda df: df[["doc_id", "norm"]],
                       batch_format="pandas"),
        ["doc_id", "norm"], {"n": (None, "count")}, result_hint="large")
    df_tbl = grouped_aggregate(dn, ["norm"],
                               {"df": (None, "count")}).to_pandas()
    df_ref = ray.put(dict(zip(df_tbl["norm"], df_tbl["df"].astype(int))))

    pair_counts = grouped_aggregate(
        grouped_apply(de, ["doc_id"], _per_org_pairs_block)
        .map_batches(lambda df: df[["subj_norm", "obj_norm"]]
                     if "subj_norm" in df.columns else df,
                     batch_format="pandas"),
        ["subj_norm", "obj_norm"], {"n_ab": (None, "count")},
        result_hint="large")

    def score(df: pd.DataFrame) -> pd.DataFrame:
        dfm = ray.get(df_ref)
        if df.empty:
            out = df.copy()
            out["pmi"] = pd.Series(dtype="float64")
            return out
        s = df["subj_norm"].map(dfm).to_numpy(np.float64)
        o = df["obj_norm"].map(dfm).to_numpy(np.float64)
        out = df.copy()
        out["pmi"] = np.round(np.log(
            n_docs * df["n_ab"].to_numpy(np.float64) / (s * o)), 6)
        return out

    out = pair_counts.map_batches(score, batch_format="pandas") \
        .to_pandas()
    out["n_ab"] = out["n_ab"].astype("int64")
    return out.sort_values(["subj_norm", "obj_norm"]) \
        .reset_index(drop=True)

def kg_comention_paths(sf_dir: str):
    """2-hop entity paths over the co-mention graph — the KG
    link-prediction feature table (A and C never co-mentioned may
    still be related through B; `best_width` = the strongest
    bottleneck min(w₁,w₂) over middles is the classic path-strength
    score, `has_direct` marks pairs where the 2-hop evidence merely
    corroborates an existing edge). Entities are the rule-localized
    canonical ids (md5 of norm — the §2.6 convention, so the oracle
    rebuilds the whole graph from ``documents`` exactly); weights =
    co-mention doc counts. ALL columns are exact integers.

    Dataflow: the SHARED doc-entity pass (one scorer actor pass +
    combiner), per-doc pair explode co-located by doc_id, a combiner
    count to the metadata-sized edge table, then the 2-hop
    middle-node join driver-side (at corpus scale: hash-partition
    edges by middle node and join co-located — same algebra)."""
    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply
    from jerex_ray.util import md5_hash64_batch

    de = _doc_entity_sets(sf_dir)

    def to_eid(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                              "eid": pd.Series(dtype="int64")})
        if df.empty or "norm" not in df.columns:
            return empty
        d = df[["doc_id", "norm"]].drop_duplicates()
        eid = (md5_hash64_batch(d["norm"].tolist())
               % np.uint64(1 << 63)).astype(np.int64)
        return pd.DataFrame({"doc_id": d["doc_id"]
                             .to_numpy(np.int64), "eid": eid})

    dn = grouped_aggregate(
        de.map_batches(to_eid, batch_format="pandas"),
        ["doc_id", "eid"], {"n": (None, "count")},
        result_hint="large")

    def pairs_block(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"ea": pd.Series(dtype="int64"),
                              "eb": pd.Series(dtype="int64")})
        if df.empty or "eid" not in df.columns:
            return empty
        d = df[["doc_id", "eid"]]
        m = d.merge(d, on="doc_id", suffixes=("_a", "_b"))
        m = m[m["eid_a"] < m["eid_b"]]
        return pd.DataFrame({"ea": m["eid_a"].to_numpy(np.int64),
                             "eb": m["eid_b"].to_numpy(np.int64)})

    edges = grouped_aggregate(
        grouped_apply(dn, ["doc_id"], pairs_block),
        ["ea", "eb"], {"w": (None, "count")}).to_pandas()
    cols = {"ent_a": "int64", "ent_c": "int64", "n_paths": "int64",
            "best_width": "int64", "has_direct": "int64"}
    if edges.empty or "ea" not in edges.columns:
        return pd.DataFrame({c: pd.Series(dtype=t)
                             for c, t in cols.items()})
    edges["w"] = edges["w"].astype("int64")
    sym = pd.concat([
        edges.rename(columns={"ea": "u", "eb": "v"}),
        edges.rename(columns={"ea": "v", "eb": "u"})])
    m = sym.merge(sym, left_on="v", right_on="u",
                  suffixes=("_1", "_2"))
    m = m[m["u_1"] < m["v_2"]]
    width = np.minimum(m["w_1"].to_numpy(np.int64),
                       m["w_2"].to_numpy(np.int64))
    paths = pd.DataFrame({"ent_a": m["u_1"].to_numpy(np.int64),
                          "ent_c": m["v_2"].to_numpy(np.int64),
                          "width": width})
    g = paths.groupby(["ent_a", "ent_c"], as_index=False) \
        .agg(n_paths=("width", "size"), best_width=("width", "max"))
    direct = set(zip(edges["ea"], edges["eb"]))
    g["has_direct"] = [
        np.int64(1) if (a, c) in direct else np.int64(0)
        for a, c in zip(g["ent_a"], g["ent_c"])]
    return g.sort_values(["ent_a", "ent_c"]) \
        .reset_index(drop=True).astype(cols)

def kg_fuzzy_name_pairs(sf_dir: str):
    """Blocked fuzzy self-join (record linkage, Fellegi-Sunter-style
    blocking): distinct PER surface norms, blocked by first token
    (surname-variant candidates share it by construction), all
    within-block pairs scored with ONE batched Levenshtein DP, kept
    at distance ≤ 3. The blocking key bounds the quadratic stage to
    each block's name-group size — the classic candidate-generation
    trade every linkage system makes (vs. the broadcast-KB linking of
    ``kg_entity_link``, this one is corpus×corpus)."""
    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply
    from jerex_ray.runtime import read_parquet_sized

    rows = read_parquet_sized(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"]).map_batches(
        _CapMentionStage, batch_format="pandas", batch_size=4096,
        concurrency=(1, 4), fn_constructor_kwargs={"mode": "doc_norms"})
    names = grouped_aggregate(
        rows.map_batches(
            lambda df: df[df["entity_type"] == "PER"][["norm"]],
            batch_format="pandas"),
        ["norm"], {"n": (None, "count")}, result_hint="large")

    def block_pairs(df: pd.DataFrame) -> pd.DataFrame:
        from jerex_ray.util import edit_distances_batch
        empty = pd.DataFrame({"norm_a": pd.Series(dtype="object"),
                              "norm_b": pd.Series(dtype="object"),
                              "dist": pd.Series(dtype="int64")})
        if df.empty:
            return empty
        d = df[["norm", "__blk"]]
        m = d.merge(d, on="__blk")
        m = m[m["norm_x"] < m["norm_y"]]
        if m.empty:
            return empty
        dists = edit_distances_batch(
            list(zip(m["norm_x"].tolist(), m["norm_y"].tolist())))
        keep = dists <= 3
        return pd.DataFrame({"norm_a": m["norm_x"].to_numpy()[keep],
                             "norm_b": m["norm_y"].to_numpy()[keep],
                             "dist": dists[keep].astype("int64")})

    blocked = names.map_batches(
        lambda df: df.assign(
            __blk=df["norm"].str.split().str[0].fillna("")),
        batch_format="pandas")
    out = grouped_apply(blocked, ["__blk"], block_pairs).to_pandas()
    if "norm_a" not in out.columns:
        return pd.DataFrame({"norm_a": pd.Series(dtype="object"),
                             "norm_b": pd.Series(dtype="object"),
                             "dist": pd.Series(dtype="int64")})
    out["dist"] = out["dist"].astype("int64")
    return out.sort_values(["norm_a", "norm_b"]).reset_index(drop=True)

def kg_graph_edges(sf_dir: str):
    """The materialized KG edge table (north rule "graph materialize"):
    distinct (subj_id, pred, obj_id) with conversation support counts
    and max score — the global aggregate over the canonicalized triple
    stream (``pipelines/kg.graph_tables``). SQL-ORACLED via the full
    rule-pipeline replay (token side table) + the per-conv-distinct →
    edge rollup in SQL; edge grouping also pytest-gated
    (test_graph_tables_support_counts)."""
    from jerex_ray.pipelines.kg import extract_triples, graph_tables
    from jerex_ray.sources.transcripts import read_synthetic_transcripts
    configure_data_context()
    cfg = _kg_config()
    _maybe_write_rule_tokens("kg_graph_edges", sf_dir, cfg)
    triples = extract_triples(read_synthetic_transcripts(
        _sf_convs(sf_dir)), cfg)
    _, edges = graph_tables(triples)
    out = edges.to_pandas()
    out["n_support"] = out["n_support"].astype("int64")
    # float32 scores can't represent 0.95 — widen BEFORE rounding so
    # the value equals the oracle's double literal
    out["score_max"] = _round_half_away(
        out["score_max"].astype("float64"), 6)
    return out.sort_values(["subj_id", "pred", "obj_id"])         .reset_index(drop=True)

def kg_graph_pagerank(sf_dir: str):
    """Entity centrality over the materialized KG: UNDIRECTED
    PageRank on the (subj_id, obj_id) edge table from
    ``graph_tables`` — co-occurrence centrality, deliberately
    symmetric: a subject asserting many facts and an object asserted
    by many both rank high (and the similarity-graph PageRank's
    no-dangling-mass invariant holds, ``ops/graph.py`` module notes —
    a directed KG run would silently lose the mass of sink-only
    entities). SQL-ORACLED: the full rule-pipeline replay derives the
    same edge multiset, then one CTE per power iteration (the
    ``doc_pagerank`` oracle pattern)."""
    from jerex_ray.ops.graph import pagerank
    from jerex_ray.pipelines.kg import extract_triples, graph_tables
    from jerex_ray.sources.transcripts import read_synthetic_transcripts
    configure_data_context()
    cfg = _kg_config()
    _maybe_write_rule_tokens("kg_graph_pagerank", sf_dir, cfg)
    triples = extract_triples(read_synthetic_transcripts(
        _sf_convs(sf_dir)), cfg)
    _, edges = graph_tables(triples)
    out = pagerank(edges, src="subj_id", dst="obj_id", iters=5)
    out["pr"] = _round_half_away(out["pr"], 6)
    out["node"] = out["node"].astype("int64")
    return out.sort_values("node").reset_index(drop=True)

def kg_transe(sf_dir: str):
    """TransE knowledge-graph embeddings (Bordes '13) trained over the
    materialized KG edge table — the canonical downstream consumer of
    a kg_construct engine (link prediction). Three epochs of
    margin-ranking SGD with md5-deterministic corrupted tails; per
    epoch ONE streaming gradient pass over the edge Dataset with the
    (vocab × d) matrices broadcast via ray.put and gradients reduced
    by the combiner. Returns the per-epoch loss history with the
    post-training tail-prediction metrics (train-set protocol, raw
    optimistic ranks — integer-exact) as constant columns. Rows-only:
    embedding training is not SQL-expressible; the gradient math is
    parity-tested against a serial recompute and the planted-structure
    rank gain is pytest-gated."""
    from jerex_ray.ops.kge import transe_link_prediction, transe_train
    from jerex_ray.pipelines.kg import extract_triples, graph_tables
    from jerex_ray.sources.transcripts import read_synthetic_transcripts
    configure_data_context()
    cfg = _kg_config()
    triples = extract_triples(read_synthetic_transcripts(
        _sf_convs(sf_dir)), cfg)
    _, edges = graph_tables(triples)
    loss_df, ent_emb, rel_emb = transe_train(edges, dim=16, epochs=3)
    losses = loss_df["loss"].to_numpy()
    assert (np.diff(losses) < 0).all(), f"loss not decreasing: {losses}"
    lp = transe_link_prediction(edges, ent_emb, rel_emb)
    out = loss_df.copy()
    out["loss"] = out["loss"].round(6)
    for c in ("n_edges", "n_entities", "sum_rank"):
        out[c] = int(lp[c].iloc[0])
    out["mean_rank"] = round(float(lp["mean_rank"].iloc[0]), 6)
    out["hits_at_10"] = round(float(lp["hits_at_10"].iloc[0]), 6)
    return out

def kg_eval(sf_dir: str):
    """Triple P/R vs the planted reference extractions (the ≥0.95
    gate). The model forward is rows-only, but the EVAL JOIN is not:
    predictions + GT are written as parquet side tables and the
    ``oracle_sql`` entry recomputes TP/FP/FN/P/R/F1 from them in one
    DuckDB statement (reference ``evaluation/scoring.py:8-73``), so
    the flagship output is driver-verifiable end-to-end."""
    from jerex_ray.eval.scoring import TRIPLE_KEY, evaluate_triples
    from jerex_ray.eval.side_tables import write_side_table
    from jerex_ray.sources.transcripts import ground_truth_triples
    pred = kg_triples(sf_dir)
    gt = ground_truth_triples(_sf_convs(sf_dir)).to_pandas()
    write_side_table("kg_eval", "pred", pred[TRIPLE_KEY])
    write_side_table("kg_eval", "gt", gt[TRIPLE_KEY])
    m = evaluate_triples(pred, gt)
    return pd.DataFrame([{k: m[k] for k in
                          ("tp", "fp", "fn", "precision", "recall", "f1")}])

def kg_eval_strict(sf_dir: str):
    """rel_nec variant: both entity types must also match
    (reference ``joint_evaluator.py:100-105``). SQL-oracled via side
    tables like ``kg_eval``."""
    from jerex_ray.eval.scoring import TRIPLE_KEY_NEC, evaluate_triples
    from jerex_ray.eval.side_tables import write_side_table
    from jerex_ray.sources.transcripts import ground_truth_triples
    pred = kg_triples(sf_dir)
    gt = ground_truth_triples(_sf_convs(sf_dir)).to_pandas()
    write_side_table("kg_eval_strict", "pred", pred[TRIPLE_KEY_NEC])
    write_side_table("kg_eval_strict", "gt", gt[TRIPLE_KEY_NEC])
    m = evaluate_triples(pred, gt, strict_types=True)
    return pd.DataFrame([{k: m[k] for k in
                          ("tp", "fp", "fn", "precision", "recall", "f1")}])

def kg_joint_metrics(sf_dir: str):
    """The reference's FULL joint evaluation (``joint_evaluator.py``
    tables — the north-star's 'mention, coref, entity, relation F1
    from its joint eval tests'): micro P/R/F1 at all four levels plus
    entity/relation macro and the strict rel_nec variant, over the
    synthetic corpus with conv-level structural ground truth
    (``ground_truth_structures``). Mention identity is the
    chunk-invariant (turn, within-turn word span); chunked long convs
    close clusters across chunks by canonical representative.
    The model forward stays rows-only, but the EVAL JOIN is SQL: the
    per-level distinct tuple tables (injectively serialized spans /
    clusters / typed relations) are written as parquet side tables
    and the oracle recomputes all seven micro/macro P/R/F1 rows from
    them in one DuckDB statement; the values stay pinned by pytest."""
    from jerex_ray.eval.scoring import joint_level_tuples, joint_metrics
    from jerex_ray.eval.side_tables import (joint_side_tables,
                                            write_side_table)
    from jerex_ray.sources.transcripts import (ground_truth_structures,
                                               read_synthetic_transcripts)
    from jerex_ray.stages.assemble import assemble_documents
    from jerex_ray.stages.scorer import score_documents
    from jerex_ray.stages.tokenize import tokenize_documents
    configure_data_context()
    cfg = _kg_config()
    n = _sf_convs(sf_dir)
    from jerex_ray.pipelines.kg import _with_part_key
    docs = assemble_documents(_with_part_key(
        read_synthetic_transcripts(n), cfg))
    scored = score_documents(tokenize_documents(docs, cfg), cfg) \
        .to_pandas()
    gt = ground_truth_structures(n)
    convs, levels = joint_level_tuples(scored, gt)
    gt_df, pred_df = joint_side_tables(convs, levels)
    write_side_table("kg_joint_metrics", "gt", gt_df)
    write_side_table("kg_joint_metrics", "pred", pred_df)
    return joint_metrics(scored, gt) \
        .sort_values(["level", "average"]).reset_index(drop=True)

def kg_eval_evidence(sf_dir: str):
    """Evidence-aware triple P/R: TP requires the predicted evidence
    turn to be one of the turns that express the relation (the scorer
    emits the max-pooled mention pair's sentence mapped to its global
    turn; chunked long convs exercise the chunk→conv turn mapping and
    the duplicate-plant evidence union). SQL-oracled via side tables:
    the first-occurrence-deduplicated predictions (key + scalar
    evidence) and the exploded GT evidence turns are written as
    parquet; the oracle joins them in one statement."""
    from jerex_ray.eval.scoring import (TRIPLE_KEY,
                                        evaluate_triples_evidence)
    from jerex_ray.eval.side_tables import write_side_table
    from jerex_ray.pipelines.kg import extract_triples
    from jerex_ray.sources.transcripts import (ground_truth_triples,
                                               read_synthetic_transcripts)
    from jerex_ray.stages.canonicalize import dedup_triples
    configure_data_context()
    ds = read_synthetic_transcripts(_sf_convs(sf_dir))
    pred = dedup_triples(extract_triples(ds, _kg_config()).to_pandas())
    gt = ground_truth_triples(_sf_convs(sf_dir)).to_pandas()
    pred_d = pred.drop_duplicates(TRIPLE_KEY, keep="first")
    pred_d = pred_d[TRIPLE_KEY + ["evidence"]].assign(
        evidence=lambda d: d["evidence"].astype("int64"))
    gt_e = gt[TRIPLE_KEY + ["evidence"]].explode("evidence")
    gt_e = gt_e.assign(evidence=lambda d: d["evidence"].astype("int64"))
    write_side_table("kg_eval_evidence", "pred", pred_d)
    write_side_table("kg_eval_evidence", "gt", gt_e)
    m = evaluate_triples_evidence(pred, gt)
    return pd.DataFrame([{k: m[k] for k in
                          ("tp", "fp", "fn", "precision", "recall", "f1")}])

def kg_entity_link(sf_dir: str):
    """Entity linking (north-rule stage): canonical corpus entities
    resolved against a KB — here the canonical entity table of the
    ``doc_id % 10 == 0`` document shard (a deterministic stand-in for
    a curated KB) — exact on normalized surface, then best
    Levenshtein ≤ 2 for the misses (``ops/linking.link_entities``).
    The SQL oracle recomputes BOTH tables from scratch and links with
    DuckDB's ``levenshtein`` under the identical (dist, kb_norm,
    kb_id) tie-break."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.ops.linking import link_entities
    from jerex_ray.runtime import read_parquet_sized
    from jerex_ray.stages.canonicalize import entity_final_block

    def canon_entities(docs):
        partials = docs.map_batches(
            _CapMentionStage, batch_format="pandas", batch_size=4096,
            concurrency=(1, 4), fn_constructor_kwargs={"mode": "partials"})
        return grouped_apply(partials, ["entity_id"], entity_final_block)

    corpus = canon_entities(read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]))
    kb_docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"]).map_batches(
        lambda df: df[df["doc_id"] % 10 == 0], batch_format="pandas")
    kb = canon_entities(kb_docs).to_pandas() \
        .rename(columns={"entity_id": "kb_id", "norm": "kb_norm"})
    out = link_entities(corpus, kb, max_dist=2).to_pandas()
    return out.sort_values(["norm", "kb_norm"]).reset_index(drop=True)

def kg_name_components(sf_dir: str):
    """Entity resolution closure: the blocked fuzzy name pairs
    (``kg_fuzzy_name_pairs``) become an undirected graph and each PER
    surface resolves to the lexicographically smallest name in its
    connected component — name→dense-id by sorted rank (so min id IS
    min name), then the BSP component operator
    (``functions/components.py``), then the id→name join back. The
    name vocabulary is bounded (distinct surfaces, not corpus rows),
    so the rank table broadcasts. Oracled by a recursive-CTE closure
    over the same levenshtein-blocked pairs."""
    import ray.data as rd

    from jerex_ray.functions.components import connected_components
    configure_data_context()
    pairs = kg_fuzzy_name_pairs(sf_dir)
    if pairs.empty:
        return pd.DataFrame({"norm": pd.Series(dtype="object"),
                             "canonical": pd.Series(dtype="object")})
    names = sorted(set(pairs["norm_a"]) | set(pairs["norm_b"]))
    rank = {nm: i for i, nm in enumerate(names)}
    edges = pd.DataFrame({
        "src": pairs["norm_a"].map(rank).astype("int64"),
        "dst": pairs["norm_b"].map(rank).astype("int64")})
    comp = connected_components(rd.from_pandas(edges))
    inv = np.array(names, dtype=object)
    out = pd.DataFrame({"norm": inv[comp["node"].to_numpy()],
                        "canonical": inv[comp["component"].to_numpy()]})
    return out.sort_values("norm").reset_index(drop=True)

def kg_coworker_pairs(sf_dir: str):
    """Graph-pattern (motif) join over the distant-supervision KG:
    (PER a)-[works_at]->(ORG)<-[works_at]-(PER b) — co-worker pairs
    with the count of shared ORGs. The wedge join is one ORG
    co-location with a within-block self-merge (the same
    apex-quadratic shape as ``triangle_counts``' wedge stage), then a
    combiner count per pair; distinct edges first, so a pair counts
    each shared ORG once regardless of mention frequency."""
    import ray.data as rd

    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply
    configure_data_context()
    sup = kg_distant_supervision(sf_dir)
    empty = pd.DataFrame({"per_a": pd.Series(dtype="object"),
                          "per_b": pd.Series(dtype="object"),
                          "n_orgs": pd.Series(dtype="int64")})
    if sup.empty:
        return empty
    edges = sup[["subj_norm", "obj_norm"]].drop_duplicates()

    def mate(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"per_a": pd.Series(dtype="object"),
                                 "per_b": pd.Series(dtype="object")})
        m = df.merge(df, on="obj_norm")
        m = m[m["subj_norm_x"] < m["subj_norm_y"]]
        return pd.DataFrame({"per_a": m["subj_norm_x"].to_numpy(),
                             "per_b": m["subj_norm_y"].to_numpy()})

    wedges = grouped_apply(rd.from_pandas(edges), ["obj_norm"], mate)
    out = grouped_aggregate(wedges, ["per_a", "per_b"],
                            {"n_orgs": (None, "count")}).to_pandas()
    if out.empty or "per_a" not in out.columns:
        return empty
    out["n_orgs"] = out["n_orgs"].astype("int64")
    return out[["per_a", "per_b", "n_orgs"]] \
        .sort_values(["per_a", "per_b"]).reset_index(drop=True)

def _kg_triples_ds(sf_dir: str):
    from jerex_ray.pipelines.kg import extract_triples
    from jerex_ray.sources.transcripts import read_synthetic_transcripts
    configure_data_context()
    return extract_triples(read_synthetic_transcripts(_sf_convs(sf_dir)),
                           _kg_config())

def kg_type_signatures(sf_dir: str):
    """Relation type-signature audit (schema induction over the
    emitted KG): per predicate, the distribution over
    (subj_type, obj_type) pairs with each signature's share and a
    dominant flag — the standard KG-quality check that a predicate's
    argument types are coherent. Streams the triple Dataset through
    two combiner aggregates (signature counts, then per-pred totals
    broadcast); the result is signature-bounded. SQL-ORACLED via the
    full rule-pipeline replay over the token side table."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    _maybe_write_rule_tokens("kg_type_signatures", sf_dir, _kg_config())
    tri = _kg_triples_ds(sf_dir)
    sig = grouped_aggregate(
        tri.map_batches(
            lambda df: df[["pred", "subj_type", "obj_type"]],
            batch_format="pandas"),
        ["pred", "subj_type", "obj_type"],
        {"n": (None, "count")}).to_pandas()
    if sig.empty:
        return pd.DataFrame({"pred": pd.Series(dtype="object")})
    tot = sig.groupby("pred")["n"].transform("sum")
    mx = sig.groupby("pred")["n"].transform("max")
    out = sig.assign(share=_round_half_away(sig["n"] / tot, 6),
                     dominant=(sig["n"] == mx).astype(np.int64))
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["pred", "subj_type", "obj_type"]) \
        .reset_index(drop=True)

def kg_functional_conflicts(sf_dir: str):
    """Functional-predicate violation audit: per predicate, how many
    subjects assert MORE THAN ONE distinct object (a works_at subject
    with two employers is either polysemy, a coref merge error, or a
    genuine multi-value predicate). Two chained combiner aggregates —
    (pred, subj, obj)-distinct → per-(pred, subj) object counts →
    per-pred rollup — nothing bigger than the entity vocabulary ever
    reduces to the driver. SQL-ORACLED via the full rule-pipeline
    replay over the token side table."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    _maybe_write_rule_tokens("kg_functional_conflicts", sf_dir,
                             _kg_config())
    tri = _kg_triples_ds(sf_dir)
    per_subj = grouped_aggregate(
        grouped_aggregate(
            tri.map_batches(
                lambda df: df[["pred", "subj_norm", "obj_norm"]],
                batch_format="pandas"),
            ["pred", "subj_norm", "obj_norm"], {"n": (None, "count")},
            result_hint="large"),
        ["pred", "subj_norm"], {"n_obj": (None, "count")},
        result_hint="large")

    def roll(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "pred" not in df.columns:
            return pd.DataFrame({
                "pred": pd.Series(dtype="object"),
                "n_subjects": pd.Series(dtype="int64"),
                "n_multi": pd.Series(dtype="int64"),
                "max_objects": pd.Series(dtype="int64")})
        g = (df.groupby("pred")
             .agg(n_subjects=("subj_norm", "count"),
                  n_multi=("n_obj", lambda s: int((s > 1).sum())),
                  max_objects=("n_obj", "max")).reset_index())
        return g

    out = grouped_aggregate(
        per_subj.map_batches(roll, batch_format="pandas"),
        ["pred"], {"n_subjects": ("n_subjects", "sum"),
                   "n_multi": ("n_multi", "sum"),
                   "max_objects": ("max_objects", "max")}).to_pandas()
    for c in ("n_subjects", "n_multi", "max_objects"):
        out[c] = out[c].astype("int64")
    # integer-ratio 6-decimal ties are real — half-away like DuckDB
    out["multi_share"] = _round_half_away(
        out["n_multi"] / out["n_subjects"], 6)
    return out.sort_values("pred").reset_index(drop=True)

def kg_provenance(sf_dir: str):
    """Provenance rollup of the emitted KG: per canonical triple
    (subj_norm, pred, obj_norm), the number of distinct supporting
    conversations and total mention count — the evidence-strength
    table a downstream curator ranks by. Two combiner aggregates
    ((triple, conv)-distinct → triple rollup). SQL-ORACLED via the
    full rule-pipeline replay over the token side table."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    _maybe_write_rule_tokens("kg_provenance", sf_dir, _kg_config())
    tri = _kg_triples_ds(sf_dir)
    per_conv = grouped_aggregate(
        tri.map_batches(
            lambda df: df[["subj_norm", "pred", "obj_norm", "conv_id"]],
            batch_format="pandas"),
        ["subj_norm", "pred", "obj_norm", "conv_id"],
        {"n_mentions": (None, "count")}, result_hint="large")
    out = grouped_aggregate(
        per_conv, ["subj_norm", "pred", "obj_norm"],
        {"n_convs": (None, "count"),
         "n_mentions": ("n_mentions", "sum")}).to_pandas()
    out["n_convs"] = out["n_convs"].astype("int64")
    out["n_mentions"] = out["n_mentions"].astype("int64")
    return out.sort_values(["subj_norm", "pred", "obj_norm"]) \
        .reset_index(drop=True)

def kg_pr_curve(sf_dir: str):
    """Precision/recall/F1 threshold sweep of the head-math model
    (NumpyScorer) against the planted reference triples — the
    operating-point curve behind the single-point ``kg_eval`` gate:
    ONE model pass over the corpus, then the sweep re-thresholds the
    scored triple table (score is per-triple max over supporting
    extractions) without touching the corpus again. Rows-only
    (model inference); monotone-recall and count invariants are
    pytest-gated."""
    from jerex_ray.eval.scoring import evaluate_triples
    from jerex_ray.pipelines.kg import extract_triples
    from jerex_ray.sources.transcripts import (ground_truth_triples,
                                               read_synthetic_transcripts)
    from jerex_ray.stages.numpy_scorer import NumpyScorer
    configure_data_context()
    n = _sf_convs(sf_dir)
    t = extract_triples(read_synthetic_transcripts(n), _kg_config(),
                        scorer_cls=NumpyScorer).to_pandas()
    scored = t.assign(score=t.groupby(
        ["conv_id", "subj_norm", "pred", "obj_norm"])["score"]
        .transform("max"))
    gt = ground_truth_triples(n).to_pandas()
    rows = []
    for thr in [0.40, 0.45, 0.50, 0.55, 0.60, 0.65, 0.70, 0.75,
                0.80]:
        keep = scored[scored["score"] >= thr]
        m = evaluate_triples(keep, gt)
        rows.append((thr, int(m["tp"] + m["fp"]), int(m["tp"]),
                     round(m["precision"], 6), round(m["recall"], 6),
                     round(m["f1"], 6)))
    return pd.DataFrame(rows, columns=["threshold", "n_pred", "tp",
                                       "precision", "recall", "f1"])

def kg_jw_name_pairs(sf_dir: str, *, threshold: float = 0.88):
    """Jaro-Winkler record-linkage candidates over distinct PER
    surface norms (Winkler '90 — the similarity the census linkage
    literature standardized on): first-token blocking bounds the
    quadratic stage to each given-name group, one vectorized
    ``jaro_winkler_batch`` call scores every within-block pair, kept
    at sim ≥ threshold. The float expressions mirror DuckDB's
    ``jaro_winkler_similarity`` bit-for-bit (verified on 51k pairs),
    so the ≥ comparison can't flip at the boundary; the reported
    score is rounded half-away to 6. Companion of the Levenshtein
    variant ``kg_fuzzy_name_pairs`` — same blocking, graded metric."""
    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply
    from jerex_ray.runtime import read_parquet_sized

    rows = read_parquet_sized(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"]).map_batches(
        _CapMentionStage, batch_format="pandas", batch_size=4096,
        concurrency=(1, 4), fn_constructor_kwargs={"mode": "doc_norms"})
    names = grouped_aggregate(
        rows.map_batches(
            lambda df: df[df["entity_type"] == "PER"][["norm"]],
            batch_format="pandas"),
        ["norm"], {"n": (None, "count")}, result_hint="large")

    def block_pairs(df: pd.DataFrame) -> pd.DataFrame:
        from jerex_ray.util import jaro_winkler_batch
        empty = pd.DataFrame({"norm_a": pd.Series(dtype="object"),
                              "norm_b": pd.Series(dtype="object"),
                              "jw": pd.Series(dtype="float64")})
        if df.empty:
            return empty
        d = df[["norm", "__blk"]]
        m = d.merge(d, on="__blk")
        m = m[m["norm_x"] < m["norm_y"]]
        if m.empty:
            return empty
        sims = jaro_winkler_batch(
            list(zip(m["norm_x"].tolist(), m["norm_y"].tolist())))
        keep = sims >= threshold
        return pd.DataFrame({"norm_a": m["norm_x"].to_numpy()[keep],
                             "norm_b": m["norm_y"].to_numpy()[keep],
                             "jw": _round_half_away(sims[keep], 6)})

    blocked = names.map_batches(
        lambda df: df.assign(
            __blk=df["norm"].str.split().str[0].fillna("")),
        batch_format="pandas")
    out = grouped_apply(blocked, ["__blk"], block_pairs).to_pandas()
    if "norm_a" not in out.columns:
        return pd.DataFrame({"norm_a": pd.Series(dtype="object"),
                             "norm_b": pd.Series(dtype="object"),
                             "jw": pd.Series(dtype="float64")})
    out["jw"] = out["jw"].astype("float64")
    return out.sort_values(["norm_a", "norm_b"]).reset_index(drop=True)

QUERIES = {
    'kg_triples': kg_triples,
    'kg_triples_numpy': kg_triples_numpy,
    'kg_triples_global': kg_triples_global,
    'kg_train_loss': kg_train_loss,
    'kg_train_step': kg_train_step,
    'media_image_features': media_image_features,
    'media_audio_frames': media_audio_frames,
    'media_video_frames': media_video_frames,
    'kg_entities': kg_entities,
    'kg_mentions': kg_mentions,
    'kg_eval': kg_eval,
    'kg_eval_strict': kg_eval_strict,
    'kg_eval_evidence': kg_eval_evidence,
    'kg_joint_metrics': kg_joint_metrics,
    'kg_type_signatures': kg_type_signatures,
    'kg_functional_conflicts': kg_functional_conflicts,
    'kg_provenance': kg_provenance,
    'kg_pr_curve': kg_pr_curve,
    'kg_entity_link': kg_entity_link,
    'kg_distant_supervision': kg_distant_supervision,
    'kg_pair_pmi': kg_pair_pmi,
    'kg_comention_paths': kg_comention_paths,
    'kg_fuzzy_name_pairs': kg_fuzzy_name_pairs,
    'kg_jw_name_pairs': kg_jw_name_pairs,
    'kg_distant_negatives': kg_distant_negatives,
    'kg_graph_edges': kg_graph_edges,
    'kg_graph_pagerank': kg_graph_pagerank,
    'kg_transe': kg_transe,
    'media_image_resize': media_image_resize,
    'kg_name_components': kg_name_components,
    'kg_coworker_pairs': kg_coworker_pairs,
}

ORACLES = {
    'kg_distant_supervision': f"""
            WITH dm AS ({_doc_mentions_sql()}),
            de AS (SELECT DISTINCT doc_id, norm, entity_type FROM dm),
            kbm AS (SELECT DISTINCT doc_id, norm, entity_type
                    FROM ({_doc_mentions_sql("doc_id % 3 = 0")})),
            kb_pairs AS (
                SELECT DISTINCT p.norm AS subj_norm, o.norm AS obj_norm
                FROM kbm p JOIN kbm o ON p.doc_id = o.doc_id
                WHERE p.entity_type = 'PER' AND o.entity_type = 'ORG'),
            cand AS (
                SELECT d1.doc_id, d1.norm AS subj_norm,
                       d2.norm AS obj_norm
                FROM de d1 JOIN de d2 ON d1.doc_id = d2.doc_id
                WHERE d1.entity_type = 'PER'
                  AND d2.entity_type = 'ORG')
            SELECT DISTINCT c.doc_id, c.subj_norm, c.obj_norm,
                   'works_at' AS rel
            FROM cand c JOIN kb_pairs k
              ON c.subj_norm = k.subj_norm AND c.obj_norm = k.obj_norm
            ORDER BY c.doc_id, c.subj_norm, c.obj_norm
        """,
    'kg_fuzzy_name_pairs': f"""
            WITH dm AS ({_doc_mentions_sql()}),
            names AS (SELECT DISTINCT norm FROM dm
                      WHERE entity_type = 'PER'),
            b AS (SELECT norm, split_part(norm, ' ', 1) AS blk
                  FROM names)
            SELECT a.norm AS norm_a, bb.norm AS norm_b,
                   CAST(levenshtein(a.norm, bb.norm) AS BIGINT) AS dist
            FROM b a JOIN b bb ON a.blk = bb.blk AND a.norm < bb.norm
            WHERE levenshtein(a.norm, bb.norm) <= 3
            ORDER BY norm_a, norm_b
        """,
    'kg_jw_name_pairs': f"""
            WITH dm AS ({_doc_mentions_sql()}),
            names AS (SELECT DISTINCT norm FROM dm
                      WHERE entity_type = 'PER'),
            b AS (SELECT norm, split_part(norm, ' ', 1) AS blk
                  FROM names)
            SELECT a.norm AS norm_a, bb.norm AS norm_b,
                   round(jaro_winkler_similarity(a.norm, bb.norm), 6)
                       AS jw
            FROM b a JOIN b bb ON a.blk = bb.blk AND a.norm < bb.norm
            WHERE jaro_winkler_similarity(a.norm, bb.norm) >= 0.88
            ORDER BY norm_a, norm_b
        """,
    'kg_name_components': f"""
            WITH RECURSIVE dm AS ({_doc_mentions_sql()}),
            names AS (SELECT DISTINCT norm FROM dm
                      WHERE entity_type = 'PER'),
            blk AS (SELECT norm, split_part(norm, ' ', 1) AS b
                    FROM names),
            edges AS MATERIALIZED (
                SELECT x.norm AS na, y.norm AS nb
                FROM blk x JOIN blk y
                  ON x.b = y.b AND x.norm < y.norm
                WHERE levenshtein(x.norm, y.norm) <= 3),
            sym AS MATERIALIZED (
                SELECT na AS a, nb AS b FROM edges
                UNION ALL
                SELECT nb AS a, na AS b FROM edges),
            reach(a, b) AS (
                SELECT a, b FROM sym
                UNION
                SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a)
            SELECT a AS norm, least(a, min(b)) AS canonical
            FROM reach GROUP BY a ORDER BY norm
        """,
    'kg_comention_paths': f"""
            WITH dm AS ({_doc_mentions_sql()}),
            de AS (SELECT DISTINCT doc_id,
                       CAST(CAST('0x' || substr(md5(norm), 1, 16)
                            AS UBIGINT) % 9223372036854775808
                            AS BIGINT) AS eid
                   FROM dm),
            e AS (SELECT a.eid AS ea, b.eid AS eb, count(*) AS w
                  FROM de a JOIN de b
                    ON a.doc_id = b.doc_id AND a.eid < b.eid
                  GROUP BY 1, 2),
            sym AS (SELECT ea AS u, eb AS v, w FROM e
                    UNION ALL SELECT eb, ea, w FROM e),
            paths AS (
                SELECT x.u AS a, y.v AS c,
                       CASE WHEN x.w < y.w THEN x.w ELSE y.w END
                           AS width
                FROM sym x JOIN sym y ON x.v = y.u AND x.u < y.v)
            SELECT a AS ent_a, c AS ent_c,
                   CAST(count(*) AS BIGINT) AS n_paths,
                   CAST(max(width) AS BIGINT) AS best_width,
                   CAST(CASE WHEN EXISTS (
                       SELECT 1 FROM e
                       WHERE e.ea = a AND e.eb = c)
                       THEN 1 ELSE 0 END AS BIGINT) AS has_direct
            FROM paths GROUP BY a, c ORDER BY ent_a, ent_c
        """,
    'kg_pair_pmi': f"""
            WITH dm AS ({_doc_mentions_sql()}),
            de AS (SELECT DISTINCT doc_id, norm, entity_type FROM dm),
            n AS (SELECT count(*) AS n_docs FROM documents),
            dfreq AS (SELECT norm, count(DISTINCT doc_id) AS df
                      FROM de GROUP BY norm),
            pairs AS (
                SELECT d1.norm AS subj_norm, d2.norm AS obj_norm,
                       count(*) AS n_ab
                FROM de d1 JOIN de d2 ON d1.doc_id = d2.doc_id
                WHERE d1.entity_type = 'PER'
                  AND d2.entity_type = 'ORG'
                GROUP BY d1.norm, d2.norm)
            SELECT p.subj_norm, p.obj_norm,
                   CAST(p.n_ab AS BIGINT) AS n_ab,
                   round(ln(n.n_docs * p.n_ab /
                            (ds.df * dobj.df)), 6) AS pmi
            FROM pairs p, n
            JOIN dfreq ds ON ds.norm = p.subj_norm
            JOIN dfreq dobj ON dobj.norm = p.obj_norm
            ORDER BY p.subj_norm, p.obj_norm
        """,
    'kg_distant_negatives': f"""
            WITH dm AS ({_doc_mentions_sql()}),
            de AS (SELECT DISTINCT doc_id, norm, entity_type FROM dm),
            kbm AS (SELECT DISTINCT doc_id, norm, entity_type
                    FROM ({_doc_mentions_sql("doc_id % 3 = 0")})),
            kb_pairs AS (
                SELECT DISTINCT p.norm AS subj_norm, o.norm AS obj_norm
                FROM kbm p JOIN kbm o ON p.doc_id = o.doc_id
                WHERE p.entity_type = 'PER' AND o.entity_type = 'ORG'),
            cand AS (
                SELECT DISTINCT d1.doc_id, d1.norm AS subj_norm,
                       d2.norm AS obj_norm
                FROM de d1 JOIN de d2 ON d1.doc_id = d2.doc_id
                WHERE d1.entity_type = 'PER'
                  AND d2.entity_type = 'ORG'),
            neg AS (
                SELECT c.* FROM cand c
                ANTI JOIN kb_pairs k
                  ON c.subj_norm = k.subj_norm
                 AND c.obj_norm = k.obj_norm),
            ranked AS (
                SELECT doc_id, subj_norm, obj_norm,
                       ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY
                           CAST('0x' || substr(md5(
                               CAST(doc_id AS VARCHAR) || '|' ||
                               subj_norm || '|' || obj_norm), 1, 16)
                               AS UBIGINT),
                           subj_norm, obj_norm) AS rk
                FROM neg)
            SELECT doc_id, subj_norm, obj_norm
            FROM ranked WHERE rk <= 2
            ORDER BY doc_id, subj_norm, obj_norm
        """,
    'kg_entity_link': f"""
            WITH corpus AS ({_canonical_entities_sql()}),
                 kb AS (SELECT entity_id AS kb_id, norm AS kb_norm
                        FROM ({_canonical_entities_sql(
                            "doc_id % 10 = 0")})),
                 exact AS (
                    SELECT c.entity_id, c.norm, k.kb_id, k.kb_norm,
                           0 AS dist, 'exact' AS method
                    FROM corpus c JOIN kb k ON c.norm = k.kb_norm),
                 fz AS (
                    SELECT c.entity_id, c.norm, k.kb_id, k.kb_norm,
                           levenshtein(c.norm, k.kb_norm) AS dist
                    FROM corpus c, kb k
                    WHERE c.norm NOT IN (SELECT kb_norm FROM kb)),
                 best AS (
                    SELECT entity_id, norm, kb_id, kb_norm, dist,
                           'fuzzy' AS method,
                           ROW_NUMBER() OVER (PARTITION BY entity_id
                               ORDER BY dist, kb_norm, kb_id) AS rk
                    FROM fz WHERE dist <= 2)
            SELECT entity_id, norm, kb_id, kb_norm,
                   CAST(dist AS BIGINT) AS dist, method
            FROM (SELECT * FROM exact
                  UNION ALL
                  SELECT entity_id, norm, kb_id, kb_norm, dist, method
                  FROM best WHERE rk = 1)
            ORDER BY norm, kb_norm
        """,
}
ORACLE_REGISTRY.update(ORACLES)
ORACLES['kg_eval'] = ORACLE_REGISTRY['kg_eval'] = triple_eval_oracle_sql("kg_eval", TRIPLE_KEY)
ORACLES['kg_eval_strict'] = ORACLE_REGISTRY['kg_eval_strict'] = triple_eval_oracle_sql(
        "kg_eval_strict", TRIPLE_KEY_NEC)
ORACLES['kg_eval_evidence'] = ORACLE_REGISTRY['kg_eval_evidence'] = evidence_eval_oracle_sql(
        "kg_eval_evidence")
ORACLES['kg_joint_metrics'] = ORACLE_REGISTRY['kg_joint_metrics'] = joint_metrics_oracle_sql(
        "kg_joint_metrics")
def _rule_pipeline_sql(query: str) -> str:
    """The WHOLE frozen-rule extraction as one SQL WITH-chain over the
    ``{query}/tokens.parquet`` side table, ending in a ``trip`` CTE of
    per-chunk triples — shared by the kg_triples and kg_entities
    oracles. Stages replayed (reference semantics in parentheses):

    * M1+M3 mention spans: maximal name-token islands per sentence,
      capped at max_span_size (``sampling_common.py:77-98`` +
      ``lexicon.is_name_token``);
    * J3/J4 coref pair scores: phrase equality 0.98 / surname alias
      0.95 / levenshtein(lower)/maxlen <= 0.2 -> 0.92, else no edge
      (``lexicon.coref_score``) — distances quantized to
      {0.02, 0.05, 0.08};
    * J5 complete-linkage agglomeration (``misc.py:93-158``) as a
      RECURSIVE CTE replaying the greedy merge loop exactly: per doc,
      per iteration, the candidate cluster pair with min complete-link
      distance (every cross mention pair must carry an edge — a
      missing pair is distance 1 ≥ the 0.15 cut), ties broken by
      lowest (ca, cb) cluster-id pair (= the numpy argmin row-major
      tie-break, cluster id = min member mention id);
    * J6/J7 rep + typing: rep = min (start, end, sent) member
      (``datasets.py:126-128``), type by ORG/TOOL suffix, LOC
      gazetteer, PER fallback (``lexicon.entity_type_of``);
    * J8/J9 relations: ordered cluster pairs × same-sentence ordered
      mention pairs, between-context [e1, s2) cue sets gated by the
      (head, tail) types (``lexicon.relation_cue``,
      ``sampling_common.py:324-330``)."""
    return f"""
        WITH RECURSIVE t AS (
            SELECT doc_id, conv_id, sent_idx, pos, tok
            FROM read_parquet(
                '/tmp/jerex_ray_oracle/{query}/tokens.parquet')
        ),
        f AS (
            SELECT doc_id, conv_id, sent_idx, pos, tok,
                   (regexp_matches(tok, '^[A-Z][A-Za-z0-9]*$')
                    AND tok NOT IN ('The','A','An','It','He','She',
                        'They','We','I','You','This','That','These',
                        'Those','There','Here','What','Where','When',
                        'Who','Why','How','Yes','No','Ok','Okay',
                        'Please','Thanks','Hello','Hi')) AS isname
            FROM t
        ),
        g AS (
            SELECT doc_id, conv_id, sent_idx, pos, tok, isname,
                   pos - ROW_NUMBER() OVER (
                       PARTITION BY doc_id, sent_idx, isname
                       ORDER BY pos) AS grp
            FROM f
        ),
        men0 AS (
            SELECT doc_id, any_value(conv_id) AS conv_id, sent_idx,
                   min(pos) AS s, max(pos) + 1 AS e,
                   string_agg(tok, ' ' ORDER BY pos) AS phrase
            FROM g WHERE isname
            GROUP BY doc_id, sent_idx, grp
            HAVING count(*) <= 10
        ),
        m AS (
            SELECT doc_id, conv_id, sent_idx, s, e, phrase,
                   lower(phrase) AS lp,
                   regexp_extract(lower(phrase), '[^ ]+$') AS lw,
                   array_length(string_split(phrase, ' ')) AS nw,
                   ROW_NUMBER() OVER (PARTITION BY doc_id
                                      ORDER BY sent_idx, s, e) - 1 AS mid
            FROM men0
        ),
        edges AS (
            SELECT * FROM (
                SELECT a.doc_id, a.mid AS i, b.mid AS j,
                       CASE WHEN a.lp = b.lp THEN 0.02
                            WHEN a.lw = b.lw AND (a.nw = 1 OR b.nw = 1)
                                THEN 0.05
                            WHEN CAST(levenshtein(a.lp, b.lp) AS DOUBLE)
                                 / greatest(len(a.lp), len(b.lp)) <= 0.2
                                THEN 0.08
                            ELSE NULL END AS d
                FROM m a JOIN m b
                  ON a.doc_id = b.doc_id AND a.mid < b.mid
            ) WHERE d IS NOT NULL
        ),
        minit AS (
            SELECT doc_id, list(mid ORDER BY mid) AS assign
            FROM m GROUP BY doc_id
        ),
        step AS (
            SELECT doc_id, assign, 0 AS it, false AS done FROM minit
            UNION ALL
            SELECT s.doc_id,
                   CASE WHEN mrg.ca IS NULL THEN s.assign
                        ELSE list_transform(s.assign,
                             c -> CASE WHEN c = mrg.cb THEN mrg.ca
                                       ELSE c END)
                   END AS assign,
                   s.it + 1 AS it,
                   mrg.ca IS NULL AS done
            FROM step s LEFT JOIN LATERAL (
                SELECT pd.ca, pd.cb
                FROM (
                    SELECT least(s.assign[e.i + 1],
                                 s.assign[e.j + 1]) AS ca,
                           greatest(s.assign[e.i + 1],
                                    s.assign[e.j + 1]) AS cb,
                           max(e.d) AS dist, count(*) AS ne
                    FROM edges e
                    WHERE e.doc_id = s.doc_id
                      AND s.assign[e.i + 1] <> s.assign[e.j + 1]
                    GROUP BY ca, cb
                ) pd
                WHERE pd.ne = (len(list_filter(s.assign,
                                               c -> c = pd.ca))
                               * len(list_filter(s.assign,
                                                 c -> c = pd.cb)))
                ORDER BY pd.dist, pd.ca, pd.cb
                LIMIT 1
            ) mrg ON true
            WHERE NOT s.done
        ),
        final AS (
            SELECT doc_id, assign
            FROM step
            QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id
                                       ORDER BY it DESC) = 1
        ),
        cmem AS (
            SELECT fr.doc_id, fr.c, fr.mid, m.conv_id, m.sent_idx,
                   m.s, m.e, m.phrase
            FROM (SELECT doc_id, unnest(assign) AS c,
                         unnest(range(len(assign))) AS mid
                  FROM final) fr
            JOIN m USING (doc_id, mid)
        ),
        cinfo AS (
            -- rep = lexicographic min (start, end, sent) member;
            -- ROW_NUMBER, not an integer-packed arg_min key, so no
            -- overflow cliff at large positions
            SELECT doc_id, c, conv_id, phrase AS rep
            FROM cmem
            QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id, c
                                       ORDER BY s, e, sent_idx) = 1
        ),
        ctyped AS (
            SELECT doc_id, c, conv_id, rep,
                   CASE WHEN regexp_extract(rep, '[^ ]+$') IN
                             ('Corp','Inc','Labs','Systems','Group',
                              'Ltd') THEN 'ORG'
                        WHEN regexp_extract(rep, '[^ ]+$') LIKE '%Tool'
                        THEN 'TOOL'
                        WHEN array_length(string_split(rep, ' ')) = 1
                             AND rep IN ('Berlin','Paris','London',
                             'Tokyo','Osaka','Madrid','Rome','Vienna',
                             'Zurich','Geneva','Oslo','Stockholm',
                             'Helsinki','Lisbon','Dublin','Prague',
                             'Warsaw','Budapest','Athens','Seoul',
                             'Taipei','Singapore','Sydney','Auckland',
                             'Toronto','Montreal','Chicago','Boston',
                             'Seattle','Austin','Denver','Portland',
                             'Atlanta','Dallas','Houston','Phoenix',
                             'Miami','Nairobi','Cairo','Lagos','Mumbai',
                             'Delhi','Jakarta')
                        THEN 'LOC'
                        ELSE 'PER' END AS etype
            FROM cinfo
        ),
        mpairs AS (
            SELECT m1.doc_id, m1.c AS ca, m2.c AS cb, m1.sent_idx,
                   m1.e AS b_from, m2.s AS b_to
            FROM cmem m1 JOIN cmem m2
              ON m1.doc_id = m2.doc_id AND m1.c <> m2.c
             AND m1.sent_idx = m2.sent_idx AND m1.e <= m2.s
        ),
        cues AS (
            SELECT mp.doc_id, mp.ca, mp.cb,
                   bool_or(lower(tk.tok) IN ('joined','works','hired'))
                       AS works_cue,
                   bool_or(lower(tk.tok) IN ('headquartered','based',
                       'located','lives','moved')) AS loc_cue,
                   bool_or(lower(tk.tok) = 'in') AS in_cue,
                   bool_or(lower(tk.tok) IN ('uses','ran','invoked',
                       'launched')) AS tool_cue
            FROM mpairs mp JOIN t tk
              ON tk.doc_id = mp.doc_id AND tk.pos >= mp.b_from
             AND tk.pos < mp.b_to
            GROUP BY mp.doc_id, mp.ca, mp.cb, mp.sent_idx,
                     mp.b_from, mp.b_to
        ),
        rels AS (
            SELECT DISTINCT c.doc_id, c.ca, c.cb, r.pred
            FROM cues c
            JOIN ctyped h ON h.doc_id = c.doc_id AND h.c = c.ca
            JOIN ctyped tl ON tl.doc_id = c.doc_id AND tl.c = c.cb,
            LATERAL (
                SELECT unnest([
                    CASE WHEN h.etype = 'PER' AND tl.etype = 'ORG'
                              AND c.works_cue THEN 'works_at' END,
                    CASE WHEN h.etype IN ('PER','ORG')
                              AND tl.etype = 'LOC'
                              AND c.loc_cue AND c.in_cue
                         THEN 'located_in' END,
                    CASE WHEN h.etype = 'PER' AND tl.etype = 'TOOL'
                              AND c.tool_cue THEN 'uses_tool' END])
                    AS pred
            ) r
            WHERE r.pred IS NOT NULL
        ),
        trip AS MATERIALIZED (
            -- MATERIALIZED: consumers reference trip repeatedly
            -- (occurrence unions, per-iteration joins); without it
            -- DuckDB re-inlines the whole recursive chain per
            -- reference and the pagerank oracle blows memory
            SELECT r.doc_id, h.conv_id,
                   h.rep AS subj, h.etype AS subj_type, r.pred,
                   tl.rep AS obj, tl.etype AS obj_type
            FROM rels r
            JOIN ctyped h ON h.doc_id = r.doc_id AND h.c = r.ca
            JOIN ctyped tl ON tl.doc_id = r.doc_id AND tl.c = r.cb
        )
    """


ORACLES['kg_triples'] = ORACLE_REGISTRY['kg_triples'] = \
    _rule_pipeline_sql("kg_triples") + """
        SELECT DISTINCT conv_id, subj, subj_type, pred, obj, obj_type,
               lower(subj) AS subj_norm, lower(obj) AS obj_norm
        FROM trip
        ORDER BY conv_id, subj, subj_type, pred, obj, obj_type
    """

# entity table: md5 canonical ids over the trip occurrences (norm =
# lower(surface) — rule mention surfaces are bare name-token joins, so
# normalize_surface's punctuation strip is the identity on them)
ORACLES['kg_entities'] = ORACLE_REGISTRY['kg_entities'] = \
    _rule_pipeline_sql("kg_entities") + """
        , occ AS (
            SELECT subj AS surface, subj_type AS entity_type FROM trip
            UNION ALL
            SELECT obj AS surface, obj_type AS entity_type FROM trip
        ),
        counts AS (
            SELECT CAST(CAST('0x' || substr(md5(lower(surface)), 1, 16)
                        AS UBIGINT) % 9223372036854775808 AS BIGINT)
                       AS entity_id,
                   lower(surface) AS norm, surface, entity_type,
                   count(*) AS n
            FROM occ GROUP BY entity_id, norm, surface, entity_type
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
        ORDER BY norm
    """

# KG audit/rollup queries over the same full rule-pipeline replay:
# each reads its own token side table and re-derives the triple stream
# in SQL, then applies the query's aggregate. The rule model's
# relation score is the constant 0.95 (lexicon frozen semantics), so
# score_max is the rounded literal.
ORACLES['kg_provenance'] = ORACLE_REGISTRY['kg_provenance'] = \
    _rule_pipeline_sql("kg_provenance") + """
        , pm AS (
            SELECT lower(subj) AS subj_norm, pred,
                   lower(obj) AS obj_norm, conv_id,
                   count(*) AS n_mentions
            FROM trip GROUP BY subj_norm, pred, obj_norm, conv_id
        )
        SELECT subj_norm, pred, obj_norm,
               CAST(count(*) AS BIGINT) AS n_convs,
               CAST(sum(n_mentions) AS BIGINT) AS n_mentions
        FROM pm GROUP BY subj_norm, pred, obj_norm
        ORDER BY subj_norm, pred, obj_norm
    """

ORACLES['kg_graph_edges'] = ORACLE_REGISTRY['kg_graph_edges'] = \
    _rule_pipeline_sql("kg_graph_edges") + """
        , ids AS (
            SELECT conv_id,
                   CAST(CAST('0x' || substr(md5(lower(subj)), 1, 16)
                        AS UBIGINT) % 9223372036854775808 AS BIGINT)
                       AS subj_id,
                   pred,
                   CAST(CAST('0x' || substr(md5(lower(obj)), 1, 16)
                        AS UBIGINT) % 9223372036854775808 AS BIGINT)
                       AS obj_id
            FROM trip
        ),
        per_conv AS (
            SELECT DISTINCT conv_id, subj_id, pred, obj_id FROM ids
        )
        SELECT subj_id, pred, obj_id,
               CAST(count(*) AS BIGINT) AS n_support,
               0.95 AS score_max
        FROM per_conv GROUP BY subj_id, pred, obj_id
        ORDER BY subj_id, pred, obj_id
    """

ORACLES['kg_type_signatures'] = ORACLE_REGISTRY['kg_type_signatures'] = \
    _rule_pipeline_sql("kg_type_signatures") + """
        , sig AS (
            SELECT pred, subj_type, obj_type, count(*) AS n
            FROM trip GROUP BY pred, subj_type, obj_type
        ),
        tot AS (
            SELECT pred, sum(n) AS t, max(n) AS mx
            FROM sig GROUP BY pred
        )
        SELECT s.pred, s.subj_type, s.obj_type,
               CAST(s.n AS BIGINT) AS n,
               round(CAST(s.n AS DOUBLE) / t.t, 6) AS share,
               CAST(CASE WHEN s.n = t.mx THEN 1 ELSE 0 END AS BIGINT)
                   AS dominant
        FROM sig s JOIN tot t USING (pred)
        ORDER BY s.pred, s.subj_type, s.obj_type
    """

ORACLES['kg_functional_conflicts'] = \
    ORACLE_REGISTRY['kg_functional_conflicts'] = \
    _rule_pipeline_sql("kg_functional_conflicts") + """
        , d1 AS (
            SELECT DISTINCT pred, lower(subj) AS subj_norm,
                   lower(obj) AS obj_norm
            FROM trip
        ),
        d2 AS (
            SELECT pred, subj_norm, count(*) AS n_obj
            FROM d1 GROUP BY pred, subj_norm
        )
        SELECT pred, CAST(count(*) AS BIGINT) AS n_subjects,
               CAST(sum(CASE WHEN n_obj > 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_multi,
               CAST(max(n_obj) AS BIGINT) AS max_objects,
               round(CAST(sum(CASE WHEN n_obj > 1 THEN 1 ELSE 0 END)
                          AS DOUBLE) / count(*), 6) AS multi_share
        FROM d2 GROUP BY pred ORDER BY pred
    """

def _kg_pagerank_oracle_sql(iters: int = 5, damping: float = 0.85) -> str:
    """Undirected PageRank over the replayed KG edge table — one CTE
    per power iteration (the ``doc_pagerank`` oracle pattern), edge
    multiset = one row per distinct (subj_id, pred, obj_id) exactly as
    ``graph_tables`` feeds ``ops/graph.pagerank`` (parallel edges from
    different predicates keep their multiplicity)."""
    sql = _rule_pipeline_sql("kg_graph_pagerank") + """
        , ids AS (
            SELECT conv_id,
                   CAST(CAST('0x' || substr(md5(lower(subj)), 1, 16)
                        AS UBIGINT) % 9223372036854775808 AS BIGINT)
                       AS subj_id,
                   pred,
                   CAST(CAST('0x' || substr(md5(lower(obj)), 1, 16)
                        AS UBIGINT) % 9223372036854775808 AS BIGINT)
                       AS obj_id
            FROM trip
        ),
        per_conv AS (
            SELECT DISTINCT conv_id, subj_id, pred, obj_id FROM ids
        ),
        edg AS (
            SELECT subj_id, pred, obj_id FROM per_conv
            GROUP BY subj_id, pred, obj_id
        ),
        dir AS MATERIALIZED (
                SELECT subj_id AS u, obj_id AS v FROM edg
                UNION ALL SELECT obj_id, subj_id FROM edg),
        deg AS MATERIALIZED (
                SELECT u, CAST(count(*) AS DOUBLE) AS dg
                FROM dir GROUP BY u),
        r0 AS (SELECT u AS node, 1.0 / (SELECT count(*) FROM deg) AS pr
               FROM deg)"""
    prev = "r0"
    for k in range(1, iters + 1):
        sql += f""",
        r{k} AS (SELECT dir.v AS node,
                        (1.0 - {damping}) / (SELECT count(*) FROM deg)
                        + {damping} * sum({prev}.pr / deg.dg) AS pr
                 FROM dir JOIN {prev} ON {prev}.node = dir.u
                          JOIN deg ON deg.u = dir.u
                 GROUP BY dir.v)"""
        prev = f"r{k}"
    sql += f"""
        SELECT node, round(pr, 6) AS pr
        FROM {prev} ORDER BY node"""
    return sql


ORACLES['kg_graph_pagerank'] = ORACLE_REGISTRY['kg_graph_pagerank'] = \
    _kg_pagerank_oracle_sql()

# flagship mention stage: replay M1 span enumeration + the rule
# mention localizer (maximal name runs per sentence, <= max_span_size)
# as gaps-and-islands SQL over the engine-written token side table
# (the tokenizer itself is pytest-gated; the SPAN logic is what this
# oracle pins). Mirrors lexicon.is_name_token: NAME_TOKEN_RE +
# CAP_STOPWORDS.
ORACLES['kg_mentions'] = ORACLE_REGISTRY['kg_mentions'] = """
        WITH t AS (
            SELECT doc_id, conv_id, sent_idx, pos, tok
            FROM read_parquet(
                '/tmp/jerex_ray_oracle/kg_mentions/tokens.parquet')
        ),
        f AS (
            SELECT doc_id, conv_id, sent_idx, pos,
                   (regexp_matches(tok, '^[A-Z][A-Za-z0-9]*$')
                    AND tok NOT IN ('The','A','An','It','He','She',
                        'They','We','I','You','This','That','These',
                        'Those','There','Here','What','Where','When',
                        'Who','Why','How','Yes','No','Ok','Okay',
                        'Please','Thanks','Hello','Hi')) AS isname
            FROM t
        ),
        g AS (
            SELECT doc_id, conv_id, sent_idx, pos, isname,
                   pos - ROW_NUMBER() OVER (
                       PARTITION BY doc_id, sent_idx, isname
                       ORDER BY pos) AS grp
            FROM f
        ),
        runs AS (
            SELECT doc_id, conv_id, sent_idx,
                   min(pos) AS m_start, max(pos) + 1 AS m_end
            FROM g WHERE isname
            GROUP BY doc_id, conv_id, sent_idx, grp
            HAVING count(*) <= 10
        )
        SELECT doc_id, conv_id,
               CAST(m_start AS BIGINT) AS "start",
               CAST(m_end AS BIGINT) AS "end",
               CAST(sent_idx AS BIGINT) AS sent_idx
        FROM runs
        ORDER BY conv_id, doc_id, "start", "end"
    """
ORACLES['kg_coworker_pairs'] = ORACLE_REGISTRY['kg_coworker_pairs'] = f"""
        WITH sup AS ({ORACLE_REGISTRY["kg_distant_supervision"]}),
        e AS (SELECT DISTINCT subj_norm, obj_norm FROM sup)
        SELECT a.subj_norm AS per_a, b.subj_norm AS per_b,
               CAST(count(*) AS BIGINT) AS n_orgs
        FROM e a JOIN e b ON a.obj_norm = b.obj_norm
                         AND a.subj_norm < b.subj_norm
        GROUP BY per_a, per_b ORDER BY per_a, per_b"""
