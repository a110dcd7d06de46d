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

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from jerex_ray.config import PipelineConfig
from jerex_ray.runtime import configure_data_context


def _sf_value(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.01


def _sf_convs(sf_dir: str) -> int:
    # ~100 convs at sf0.001, 800 at sf0.01, 8000 at sf0.1
    return max(100, int(_sf_value(sf_dir) * 80_000))


def _kg_config() -> PipelineConfig:
    return PipelineConfig(num_output_partitions=8)


# ---------- KG pipeline queries (rows-only) ----------

def kg_triples(sf_dir: str):
    from jerex_ray.pipelines.kg import extract_triples
    from jerex_ray.sources.transcripts import read_synthetic_transcripts
    configure_data_context()
    ds = read_synthetic_transcripts(_sf_convs(sf_dir))
    t = extract_triples(ds, _kg_config()).to_pandas()
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
    from jerex_ray.pipelines.kg import extract_triples
    from jerex_ray.sources.transcripts import read_synthetic_transcripts
    from jerex_ray.stages.canonicalize import build_entity_table
    configure_data_context()
    ds = read_synthetic_transcripts(_sf_convs(sf_dir))
    ents = build_entity_table(extract_triples(ds, _kg_config())).to_pandas()
    return ents.sort_values("norm").reset_index(drop=True)


def kg_mentions(sf_dir: str):
    from jerex_ray.sources.transcripts import read_synthetic_transcripts
    from jerex_ray.stages.assemble import assemble_documents
    from jerex_ray.stages.convert import explode_mentions
    from jerex_ray.stages.scorer import score_documents
    from jerex_ray.stages.tokenize import tokenize_documents
    configure_data_context()
    cfg = _kg_config()
    ds = read_synthetic_transcripts(_sf_convs(sf_dir))
    from jerex_ray.pipelines.kg import _with_part_key
    docs = assemble_documents(_with_part_key(ds, cfg))
    scored = score_documents(tokenize_documents(docs, cfg), cfg)
    m = scored.map_batches(explode_mentions, batch_format="pyarrow").to_pandas()
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


def doc_normalize_text(sf_dir: str):
    """Canonical text normalization (the step before any
    hashing/dedup in a multilingual corpus): unicode NFC + lowercase
    + whitespace collapse + trim, vectorized per batch. Parity with
    DuckDB's ``nfc_normalize`` verified character-for-character."""
    import unicodedata

    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def norm(df: pd.DataFrame) -> pd.DataFrame:
        t = df["text"].fillna("").map(
            lambda s: unicodedata.normalize("NFC", s))
        t = t.str.lower().str.split().str.join(" ")
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(),
                             "norm_text": t.to_numpy()})

    out = ds.map_batches(norm, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def doc_corpus_stats(sf_dir: str):
    """The release-card summary every published dataset ships: doc
    count, token totals/mean, exact p50/p95 token counts (shuffle-free
    quantile selector), and distinct language count — one combiner
    aggregate + one quantile pass over a single pruned read, one row
    out."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.ops.quantiles import distributed_quantiles
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text", "lang"])

    def tok_counts(df: pd.DataFrame) -> pd.DataFrame:
        n = df["text"].fillna("").str.split().str.len()
        return pd.DataFrame({"n_tokens": n.astype("float64"),
                             "lang": df["lang"]})

    toks = ds.map_batches(tok_counts, batch_format="pandas") \
        .materialize()
    agg = grouped_aggregate(toks, ["lang"],
                            {"n_docs": (None, "count"),
                             "n_tokens": ("n_tokens", "sum")}).to_pandas()
    p50, p95 = distributed_quantiles(toks, "n_tokens", [0.5, 0.95])
    n_docs = int(agg["n_docs"].sum())
    total = float(agg["n_tokens"].sum())
    return pd.DataFrame({
        "n_docs": [np.int64(n_docs)],
        "total_tokens": [np.int64(total)],
        "mean_tokens": [round(total / max(n_docs, 1), 6)],
        "p50_tokens": [round(float(p50), 6)],
        "p95_tokens": [round(float(p95), 6)],
        "n_langs": [np.int64(len(agg))]})


def doc_redact_persons(sf_dir: str):
    """PII scrubbing: every PER-typed rule mention replaced by
    ``[NAME]`` (``_RedactStage`` actor pool; tokens re-joined with
    single spaces — the canonical reassembly). The SQL oracle rebuilds
    the identical redacted string from the shared mention-runs CTE
    plus a per-position PER-run membership join."""
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    out = ds.map_batches(_RedactStage, batch_format="pandas",
                         batch_size=4096, concurrency=(1, 4)).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


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
    stream (``pipelines/kg.graph_tables``). Rows-only: the input is
    the synthetic transcript corpus, not a registered SQL table; edge
    grouping correctness is pytest-gated
    (test_graph_tables_support_counts)."""
    from jerex_ray.pipelines.kg import extract_triples, graph_tables
    from jerex_ray.sources.transcripts import read_synthetic_transcripts
    configure_data_context()
    cfg = _kg_config()
    triples = extract_triples(read_synthetic_transcripts(
        _sf_convs(sf_dir)), cfg)
    _, edges = graph_tables(triples)
    out = edges.to_pandas()
    out["n_support"] = out["n_support"].astype("int64")
    out["score_max"] = out["score_max"].round(6)
    return out.sort_values(["subj_id", "pred", "obj_id"])         .reset_index(drop=True)


def kg_graph_pagerank(sf_dir: str):
    """Entity centrality over the materialized KG: UNDIRECTED
    PageRank on the (subj_id, obj_id) edge table from
    ``graph_tables`` — co-occurrence centrality, deliberately
    symmetric: a subject asserting many facts and an object asserted
    by many both rank high (and the similarity-graph PageRank's
    no-dangling-mass invariant holds, ``ops/graph.py`` module notes —
    a directed KG run would silently lose the mass of sink-only
    entities). Rows-only (synthetic-transcript input); PageRank
    itself is SQL-oracled on the documents graph (``doc_pagerank``)
    and dense-reference-tested."""
    from jerex_ray.ops.graph import pagerank
    from jerex_ray.pipelines.kg import extract_triples, graph_tables
    from jerex_ray.sources.transcripts import read_synthetic_transcripts
    configure_data_context()
    cfg = _kg_config()
    triples = extract_triples(read_synthetic_transcripts(
        _sf_convs(sf_dir)), cfg)
    _, edges = graph_tables(triples)
    out = pagerank(edges, src="subj_id", dst="obj_id", iters=5)
    out["pr"] = out["pr"].round(6)
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
    """Triple P/R vs the planted reference extractions (the ≥0.95 gate)."""
    from jerex_ray.eval.scoring import evaluate_triples
    from jerex_ray.sources.transcripts import ground_truth_triples
    pred = kg_triples(sf_dir)
    gt = ground_truth_triples(_sf_convs(sf_dir)).to_pandas()
    m = evaluate_triples(pred, gt)
    return pd.DataFrame([{k: m[k] for k in
                          ("tp", "fp", "fn", "precision", "recall", "f1")}])


def kg_eval_strict(sf_dir: str):
    """rel_nec variant: both entity types must also match
    (reference ``joint_evaluator.py:100-105``)."""
    from jerex_ray.eval.scoring import evaluate_triples
    from jerex_ray.sources.transcripts import ground_truth_triples
    pred = kg_triples(sf_dir)
    gt = ground_truth_triples(_sf_convs(sf_dir)).to_pandas()
    m = evaluate_triples(pred, gt, strict_types=True)
    return pd.DataFrame([{k: m[k] for k in
                          ("tp", "fp", "fn", "precision", "recall", "f1")}])


def q_events_welch_ttest(sf_dir: str):
    """Welch's unequal-variance t statistic of event value, each type
    vs the REST of the stream — the A/B-test primitive. One combiner
    pass reduces the corpus to per-type (n, Σv, Σv²); the complement's
    moments are total-minus-type, so only #types rows reach the
    driver and no second scan happens. Oracled by the identical
    closed form in SQL (round-6 absorbs summation-order float dust)."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_type", "value"])

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value"].to_numpy(np.float64)
        g = df.groupby("event_type", sort=False)
        return pd.DataFrame({
            "event_type": list(g.groups),
            "n": g.size().to_numpy(np.int64),
            "s": g["value"].sum().to_numpy(np.float64),
            "ss": [float((v[ix] ** 2).sum())
                   for ix in (g.indices[k] for k in g.groups)]})

    st = grouped_aggregate(ds.map_batches(moments, batch_format="pandas"),
                           ["event_type"],
                           {"n": ("n", "sum"), "s": ("s", "sum"),
                            "ss": ("ss", "sum")}).to_pandas()
    tn, ts_, tss = st["n"].sum(), st["s"].sum(), st["ss"].sum()
    n1 = st["n"].to_numpy(np.float64)
    s1 = st["s"].to_numpy(np.float64)
    ss1 = st["ss"].to_numpy(np.float64)
    n2, s2, ss2 = tn - n1, ts_ - s1, tss - ss1
    v1 = (ss1 - s1 * s1 / n1) / (n1 - 1)
    v2 = (ss2 - s2 * s2 / n2) / (n2 - 1)
    t = (s1 / n1 - s2 / n2) / np.sqrt(v1 / n1 + v2 / n2)
    out = pd.DataFrame({"event_type": st["event_type"],
                        "n": st["n"].astype("int64"),
                        "t_stat": np.round(t, 6)})
    return out.sort_values("event_type").reset_index(drop=True)


def kg_joint_metrics(sf_dir: str):
    """The reference's FULL joint evaluation (``joint_evaluator.py``
    tables — the north-star's 'mention, coref, entity, relation F1
    from its joint eval tests'): micro P/R/F1 at all four levels plus
    entity/relation macro and the strict rel_nec variant, over the
    synthetic corpus with conv-level structural ground truth
    (``ground_truth_structures``). Mention identity is the
    chunk-invariant (turn, within-turn word span); chunked long convs
    close clusters across chunks by canonical representative. Rows-only
    (model inference, not SQL); the values are pinned by pytest."""
    from jerex_ray.eval.scoring import joint_metrics
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
    return joint_metrics(scored, ground_truth_structures(n)) \
        .sort_values(["level", "average"]).reset_index(drop=True)


def doc_shuffle_order(sf_dir: str, *, seed: int = 42):
    """Reproducible global training-order shuffle: every doc gets a
    deterministic position 0..N−1 by ranking an md5(seed-salted id)
    key — the epoch-shuffle a pretraining loader needs, stable under
    resharding and restart (unlike ``random_shuffle``, the order is a
    pure function of ids + seed, so a resumed job replays it).

    Scale shape: the rank is ``relational.global_rank`` — exact
    quantile pivots bucket the key space, one combiner pass counts
    buckets, blocks sort only their own buckets and add broadcast
    offsets; the corpus is never sorted in one place. A new epoch is
    a new seed. Oracled by the SQL row_number over the identical
    md5-derived key."""
    from jerex_ray.relational import global_rank
    from jerex_ray.runtime import read_parquet_sized
    from jerex_ray.util import md5_hash64_batch
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id"])

    def key(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy()
        h = md5_hash64_batch(f"{i}:{seed}" for i in ids)
        # ranking key as float64, mirrored by the oracle's CAST(...
        # AS DOUBLE): >2^53 hashes collide in float — the (key, id)
        # in-bucket sort breaks those ties identically on both sides
        return pd.DataFrame({"doc_id": ids.astype("int64"),
                             "shuffle_key": h.astype(np.float64)})

    ranked = global_rank(ds.map_batches(key, batch_format="pandas"),
                         value_col="shuffle_key", id_col="doc_id")
    out = ranked.to_pandas()[["doc_id", "rnk"]] \
        .rename(columns={"rnk": "pos"})
    out["doc_id"] = out["doc_id"].astype("int64")
    out["pos"] = out["pos"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def kg_eval_evidence(sf_dir: str):
    """Evidence-aware triple P/R: TP requires the predicted evidence
    turn to be one of the turns that express the relation (the scorer
    emits the max-pooled mention pair's sentence mapped to its global
    turn; chunked long convs exercise the chunk→conv turn mapping and
    the duplicate-plant evidence union). Rows-only like kg_eval."""
    from jerex_ray.eval.scoring import evaluate_triples_evidence
    from jerex_ray.pipelines.kg import extract_triples
    from jerex_ray.sources.transcripts import (ground_truth_triples,
                                               read_synthetic_transcripts)
    from jerex_ray.stages.canonicalize import dedup_triples
    configure_data_context()
    ds = read_synthetic_transcripts(_sf_convs(sf_dir))
    pred = dedup_triples(extract_triples(ds, _kg_config()).to_pandas())
    gt = ground_truth_triples(_sf_convs(sf_dir)).to_pandas()
    m = evaluate_triples_evidence(pred, gt)
    return pd.DataFrame([{k: m[k] for k in
                          ("tp", "fp", "fn", "precision", "recall", "f1")}])


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


class _RedactStage:
    """Actor-pool PII scrubber: run the rule mention localizer (same
    capitalized-token convention as ``_CapMentionStage``), then
    replace every token of a PER-typed mention with ``[NAME]`` in the
    ORIGINAL token stream and re-join with single spaces (the
    canonical reassembly the SQL oracle reproduces). The anonymization
    pass every shared-corpus pipeline needs before release."""

    def __init__(self):
        from jerex_ray.stages.scorer import RuleScorer
        self.scorer = RuleScorer(PipelineConfig())

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from jerex_ray.lexicon import entity_type_of

        ids, reds, n_redacted = [], [], []
        for doc_id, text in zip(batch["doc_id"], batch["text"].fillna("")):
            orig = text.split()
            toks = [t[0].upper() + t[1:] for t in orig]
            n = 0
            if toks:
                ms, _, _, _, _ = self.scorer._score_doc(
                    toks, np.zeros(len(toks), dtype=np.int32),
                    np.asarray([0, len(toks)], dtype=np.int32))
                for s, e, _sent in ms:
                    if entity_type_of(toks[s:e]) == "PER":
                        for i in range(s, e):
                            orig[i] = "[NAME]"
                        n += 1
            ids.append(doc_id)
            reds.append(" ".join(orig))
            n_redacted.append(n)
        return pd.DataFrame({
            "doc_id": pd.Series(ids, dtype="int64"),
            "redacted": pd.Series(reds, dtype="object"),
            "n_redacted": pd.Series(n_redacted, dtype="int64")})


# ---------- text / dedup / vector queries (SQL oracles) ----------

def doc_token_stats(sf_dir: str):
    from jerex_ray.ops.textstats import run_token_stats
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return run_token_stats(ds).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)


def doc_quality(sf_dir: str):
    from jerex_ray.ops.textstats import run_quality_stats
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return run_quality_stats(ds).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)


def doc_exact_dedup(sf_dir: str):
    from jerex_ray.ops.dedup import exact_dedup
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    kept = exact_dedup(ds).to_pandas()
    return kept[["doc_id"]].sort_values("doc_id").reset_index(drop=True)


def doc_langid(sf_dir: str):
    from jerex_ray.ops.textstats import run_langid
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return run_langid(ds).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)


def doc_name_mentions(sf_dir: str):
    """Rule mention localization (M1 candidate spans + the maximal
    name-token-run rule of ``RuleScorer._score_mentions``) run over the
    documents table with each token's first character uppercased — a
    deterministic SQL-reconstructible casing, so a gaps-and-islands
    oracle verifies the mention operator exactly: maximal runs of
    name-shaped tokens (regex + stopword breaks) of width ≤ 10."""
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    out = ds.map_batches(_CapMentionStage, batch_format="pandas",
                         batch_size=4096, concurrency=(1, 4),
                         fn_constructor_kwargs={"mode": "spans"}).to_pandas()
    return out.sort_values(["doc_id", "m_start"]).reset_index(drop=True)


def doc_entity_canonical(sf_dir: str):
    """Canonical entity table (the §2.6 canonicalization join + J7-rule
    entity typing) built from the rule-localized mentions of the
    documents table: per-batch partial counts → hash-co-located final
    merge picking the most frequent surface per canonical id
    (``stages/canonicalize.entity_final_block``, ties lexicographic).
    Entity ids use the md5-derived hash so the SQL oracle recomputes
    the whole table — ids, surface election, types, counts — exactly."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    from jerex_ray.stages.canonicalize import entity_final_block

    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    partials = ds.map_batches(_CapMentionStage, batch_format="pandas",
                              batch_size=4096, concurrency=(1, 4),
                              fn_constructor_kwargs={"mode": "partials"})
    ents = grouped_apply(partials, ["entity_id"],
                         entity_final_block).to_pandas()
    ents["n_occurrences"] = ents["n_occurrences"].astype("int64")
    return ents.sort_values("norm").reset_index(drop=True)


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


def doc_split(sf_dir: str):
    """Deterministic hash-based train/valid/test split (md5-derived so
    the SQL oracle reproduces the exact assignment): no shuffle, no
    global state, stable under resharding and corpus growth."""
    from jerex_ray.ops.split import hash_split
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id"])
    out = hash_split(ds).to_pandas()
    return out[["doc_id", "split"]].sort_values("doc_id") \
        .reset_index(drop=True)


def doc_stratified_sample(sf_dir: str):
    """Deterministic stratified sample: the 20 smallest-md5-hash docs
    per language — per-batch top-k pre-reduction bounds the shuffle to
    each group's quota (a hot group never ships more than n rows per
    batch)."""
    from jerex_ray.ops.split import stratified_sample
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "lang"])
    out = stratified_sample(ds, group="lang", n_per_group=20).to_pandas()
    return out[["doc_id", "lang"]].sort_values("doc_id") \
        .reset_index(drop=True)


def doc_fingerprint(sf_dir: str):
    """md5-derived 64-bit normalized-text fingerprints (SQL-replicable
    hash — the oracle recomputes them bit-for-bit)."""
    from jerex_ray.ops.textstats import fingerprint
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    out = ds.map_batches(
        lambda b: fingerprint(b, algo="md5")[["doc_id", "fp"]],
        batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def doc_mixture_sample(sf_dir: str):
    """Deterministic data mixing (``ops/split.mixture_sample``):
    src0 upsampled 2.25×, src1 downsampled to 0.5×, everything else
    kept 1× — each doc's copy count is a pure function of its md5
    bucket, so the mixture is reproducible and SQL-oracled exactly."""
    from jerex_ray.ops.split import mixture_sample
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "source"])
    out = mixture_sample(ds, weights={"src0": 2.25, "src1": 0.5}) \
        .to_pandas()
    out = out[["doc_id", "source", "copy_idx"]]
    out["doc_id"] = out["doc_id"].astype("int64")
    out["copy_idx"] = out["copy_idx"].astype("int64")
    return out.sort_values(["doc_id", "copy_idx"]).reset_index(drop=True)


def doc_chunks(sf_dir: str):
    """Fixed-size word-window chunking with overlap
    (``ops/textstats.chunk_documents``, 24-word chunks / 8 overlap so
    the ~30-word fixture docs split): one streaming pass, integer
    coordinates + joined word slices, oracled bit-exactly."""
    from jerex_ray.ops.textstats import chunk_documents
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    out = chunk_documents(ds, chunk_words=24, overlap=8).to_pandas()
    for c in ("doc_id", "chunk_idx", "start", "end"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["doc_id", "chunk_idx"]) \
        .reset_index(drop=True)


def doc_weighted_sample(sf_dir: str):
    """Weighted sampling without replacement (Efraimidis–Spirakis
    priorities over deterministic md5 uniforms, ``ops/split.
    weighted_sample``): 50 docs, src0 weighted 4×, src1 0.5×."""
    from jerex_ray.ops.split import weighted_sample
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "source"])
    out = weighted_sample(ds, k=50,
                          weights={"src0": 4.0, "src1": 0.5}) \
        .to_pandas()
    out = out[["doc_id", "source"]]
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def doc_top_bigrams(sf_dir: str):
    from jerex_ray.ops.textstats import top_ngrams
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return top_ngrams(ds, n=2, k=10)


def doc_winnowing(sf_dir: str):
    """Winnowing (MOSS) rolling-hash fingerprints — rows-only (the
    selection rule is pytest-gated against a brute-force reference;
    a rolling polynomial mod 2^64 isn't SQL-expressible)."""
    from jerex_ray.ops.textstats import run_winnowing
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    out = run_winnowing(ds).to_pandas()
    return out.sort_values(["doc_id", "position"]).reset_index(drop=True)


def doc_winnowing_md5(sf_dir: str):
    """Winnowing with md5-derived character-k-gram hashes — the
    SQL-oracled twin of ``doc_winnowing`` (the oracle recomputes each
    gram hash via ``substr(md5(substr(t, i+1, 8)), 1, 16)`` and the
    rightmost-min-per-window selection via a windows×grams join).
    The rolling-hash variant stays the scale path."""
    from jerex_ray.ops.textstats import run_winnowing_md5
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    out = run_winnowing_md5(ds).to_pandas()
    return out.sort_values(["doc_id", "position"]).reset_index(drop=True)


def doc_pack_batches(sf_dir: str):
    """Token-budget sequence packing (concat-and-chunk over the
    doc_id-ordered stream per source) via the distributed keyed
    exclusive prefix sum of ``ops/pack.py`` — oracled by a SQL window
    running sum."""
    from jerex_ray.ops.pack import pack_documents
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text", "source"])
    out = pack_documents(ds, budget=512).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def doc_decontaminate(sf_dir: str):
    """Benchmark decontamination: train-split docs sharing a word
    8-gram with the test split (md5 hash split), with the count of
    distinct shared grams. One broadcast + one streaming pass."""
    from jerex_ray.ops.decontam import contaminated_docs
    from jerex_ray.ops.split import hash_split
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    split = hash_split(ds)
    train = split.map_batches(
        lambda b: b.loc[b["split"] != "test", ["doc_id", "text"]],
        batch_format="pandas")
    evald = split.map_batches(
        lambda b: b.loc[b["split"] == "test", ["doc_id", "text"]],
        batch_format="pandas")
    out = contaminated_docs(train, evald, n=8).to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def doc_decontaminate_bloom(sf_dir: str):
    """Bloom-filter variant of doc_decontaminate — the middle scale
    regime (eval gram bits broadcast instead of a Python set). ORACLE
    CAVEAT: the filter is one-sided (no false negatives); with the
    query's m=2^20 bits, k=4 and the fixture's eval-gram count the
    false-positive probability per distinct gram is ~1e-13, so parity
    with the exact SQL oracle is expected for any realistic fixture —
    a mismatch showing EXTRA rows/hits is an unlucky false positive,
    not a dataflow bug (missing rows WOULD be a bug)."""
    from jerex_ray.ops.decontam import contaminated_docs_bloom
    from jerex_ray.ops.split import hash_split
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    split = hash_split(ds)
    train = split.map_batches(
        lambda b: b.loc[b["split"] != "test", ["doc_id", "text"]],
        batch_format="pandas")
    evald = split.map_batches(
        lambda b: b.loc[b["split"] == "test", ["doc_id", "text"]],
        batch_format="pandas")
    out = contaminated_docs_bloom(train, evald, n=8).to_pandas()
    if "doc_id" not in out.columns or out.empty:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "n_hits": pd.Series(dtype="int64")})
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def doc_unigram_logppl(sf_dir: str):
    """CCNet-style unigram-LM quality score: per-doc mean −log2 word
    probability under the corpus unigram distribution; rounded to 6
    decimals on both sides (summation order differs between the
    distributed mean and SQL avg in the last float bits)."""
    from jerex_ray.ops.textstats import unigram_logppl
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    out = unigram_logppl(ds).to_pandas()
    out["logppl"] = out["logppl"].round(6)
    return out.sort_values("doc_id").reset_index(drop=True)


def doc_repetition(sf_dir: str):
    """Gopher-style repetition quality signals (duplicate-word
    fraction, top-bigram share) — vectorized explode, SQL-oracled."""
    from jerex_ray.ops.textstats import run_repetition_stats
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return run_repetition_stats(ds).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)


def doc_quality_filter(sf_dir: str):
    """Percentile-based corpus filter (CCNet keeps the best LM-scored
    fraction): docs whose unigram logppl is at or below the corpus
    P90. Composition of three scale-shaped ops — the scoring pass, the
    exact three-pass quantile over the (metadata-sized, materialized)
    per-doc score table, and one broadcast-threshold filter. Scores
    are rounded to 6 decimals BEFORE the quantile on both sides so the
    threshold comparison is reproducible."""
    import ray.data as rd

    from jerex_ray.ops.quantiles import distributed_quantiles
    from jerex_ray.ops.textstats import unigram_logppl
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    scored = unigram_logppl(ds).map_batches(
        lambda df: df.assign(logppl=df["logppl"].round(6))
        [["doc_id", "logppl"]],
        batch_format="pandas").materialize()  # per-doc metadata table
    p90 = distributed_quantiles(scored, "logppl", [0.9])[0]
    kept = scored.map_batches(
        lambda df: df.loc[df["logppl"] <= p90, ["doc_id"]],
        batch_format="pandas").to_pandas()
    if "doc_id" not in kept.columns:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64")})
    return kept.astype("int64").sort_values("doc_id") \
        .reset_index(drop=True)


def doc_heavy_hitters(sf_dir: str):
    """Exact corpus heavy hitters (count·k > total) via a Misra–Gries
    candidate pass + an exact verify pass — integer-only output, so
    the SQL oracle matches bit-for-bit."""
    from jerex_ray.ops.sketch import heavy_hitters
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return heavy_hitters(ds, k=40, capacity=256)


def doc_tfidf_top(sf_dir: str):
    """Per-doc top-3 terms by smoothed tf-idf; output carries only
    integers/strings (ranking floats are transient, ties break on the
    term) so the oracle compare is exact."""
    from jerex_ray.ops.textstats import tfidf_top_terms
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    out = tfidf_top_terms(ds, top=3).to_pandas()
    return out.sort_values(["doc_id", "rank"]).reset_index(drop=True)


def emb_label_centroids(sf_dir: str):
    """Mean embedding per label as flat (label, dim, centroid) rows —
    partial sums reduce per batch, vectors never ride a shuffle;
    rounded to 6 decimals on both sides (summation order)."""
    from jerex_ray.ops.embed import label_centroids
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["label", "embedding"])
    return label_centroids(ds)


def emb_kmeans(sf_dir: str):
    """Distributed Lloyd's k-means (deterministic smallest-id init,
    per-iteration broadcast + partial-sum reduce). Iterative model
    fitting — not SQL-expressible; rows-only for the driver, with the
    monotone-inertia Lloyd invariant pytest-gated
    (tests/test_embed.py)."""
    from jerex_ray.ops.embed import kmeans
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    assign, history = kmeans(ds, k=8, iters=5)
    out = assign.to_pandas().sort_values("vec_id").reset_index(drop=True)
    assert all(b <= a + 1e-9 for a, b in zip(history, history[1:])), \
        "Lloyd inertia must be non-increasing"
    return out


_BM25_QUERIES = ["spark join fast", "dup", "window stream query sort"]


def doc_bm25_scores(sf_dir: str):
    """Okapi BM25 of every doc against three fixed queries — one
    combiner stats pass + broadcast idf + one streaming scoring pass;
    scores rounded to 6 decimals on both sides (per-doc term-sum
    order differs between engines in the last float bits)."""
    from jerex_ray.ops.bm25 import bm25_scores
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    out = bm25_scores(ds, _BM25_QUERIES).to_pandas()
    out["score"] = out["score"].round(6)
    return out.sort_values(["query_idx", "doc_id"]).reset_index(drop=True)


def doc_bm25_indexed(sf_dir: str):
    """BM25 served from a MATERIALIZED term-bucketed inverted index
    (build: one explode + bucket shuffle; query: hash-pruned postings
    read only). Must equal the direct-pass ``doc_bm25_scores`` — both
    share one SQL oracle."""
    import hashlib
    import shutil

    from jerex_ray.ops.invindex import bm25_from_index, build_inverted_index
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    out_dir = "/tmp/jerex_invindex_" + hashlib.md5(
        sf_dir.encode()).hexdigest()[:8]
    shutil.rmtree(out_dir, ignore_errors=True)
    build_inverted_index(ds, out_dir, num_buckets=16)
    out = bm25_from_index(out_dir, _BM25_QUERIES)
    out["score"] = out["score"].round(6)
    return out.sort_values(["query_idx", "doc_id"]).reset_index(drop=True)


def q_distinct_event_users(sf_dir: str):
    """Exact distinct count via the combiner aggregate: per-batch
    partial uniques → groupby(user_id) → count of groups."""
    import pandas as pd
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["user_id"])
    groups = grouped_aggregate(ds, ["user_id"], {"n": (None, "count")})
    return pd.DataFrame({"n_users": [int(groups.count())]})


def q_events_hll_users(sf_dir: str):
    """HyperLogLog approximate COUNT(DISTINCT user_id): per-batch
    register partials → tree-reduce max-merge → estimate
    (``ops/sketch.hll_distinct``). ORACLE CAVEAT: parity holds in the
    linear-counting regime (distinct ≲ 2.5·2^p = 10240 at p=12),
    where the estimate depends only on WHICH md5-derived registers
    are hit — which the SQL recomputes exactly. A future fixture with
    ≳10k distinct users would leave that regime and the oracle would
    need the full harmonic-mean estimator; check the regime before
    debugging a mismatch as a dataflow bug."""
    from jerex_ray.ops.sketch import hll_distinct
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id"])
    return hll_distinct(ds, column="user_id", p=12)


def q_events_hll_by_type(sf_dir: str):
    """Grouped HLL: approximate distinct users PER event type from the
    same md5-derived registers (``ops/sketch.hll_distinct_by`` —
    register rows through the combiner, per-group estimate co-located).
    Same linear-counting oracle-parity regime as q_events_hll_users."""
    from jerex_ray.ops.sketch import hll_distinct_by
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_type", "user_id"])
    out = hll_distinct_by(ds, column="user_id", group="event_type", p=12)
    out = out.rename(columns={"g": "event_type"})
    out["registers_set"] = out["registers_set"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def q_events_props_agg(sf_dir: str):
    """Semi-structured ETL: extract the integer ``k`` field out of the
    JSON ``props`` column with ONE ``pyarrow.compute.extract_regex``
    kernel per batch (``ops/jsonx.py`` — no per-row ``json.loads``),
    then the combiner group-aggregate per event type. Oracled against
    DuckDB ``json_extract_string`` end to end."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.ops.jsonx import extract_json_int
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_type", "props"])
    ds = ds.map_batches(
        lambda t: extract_json_int(t, json_col="props", key="k",
                                   out="k_val"),
        batch_format="pyarrow")
    out = grouped_aggregate(
        ds, ["event_type"],
        {"n": (None, "count"), "sum_k": ("k_val", "sum"),
         "min_k": ("k_val", "min"), "max_k": ("k_val", "max")}
    ).to_pandas()
    for c in ("n", "sum_k", "min_k", "max_k"):
        out[c] = out[c].astype("int64")
    out["avg_k"] = (out["sum_k"] / out["n"]).round(6)
    return out.sort_values("event_type").reset_index(drop=True)


def doc_pagerank(sf_dir: str):
    """PageRank centrality over the exact-Jaccard near-dup graph
    (``ops/graph.pagerank``, broadcast mode, d=0.85, 5 iterations) —
    the centrality-weighted canonical-pick input for dedup survivor
    selection. Oracled by a chained-CTE DuckDB recomputation of the
    same 5 power iterations over the same (deterministic, exact — no
    LSH caveat) edge set, 6-decimal rounding on both sides."""
    import ray

    from jerex_ray.ops.dedup import jaccard_edges_exact
    from jerex_ray.ops.graph import pagerank
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    edges = jaccard_edges_exact(ds, threshold=0.7).to_pandas()
    if "doc_a" not in edges.columns or edges.empty:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "pr": pd.Series(dtype="float64")})
    pr = pagerank(ray.data.from_pandas(edges[["doc_a", "doc_b"]]),
                  damping=0.85, iters=5)
    pr["pr"] = pr["pr"].round(6)
    pr = pr.rename(columns={"node": "doc_id"})
    pr["doc_id"] = pr["doc_id"].astype("int64")
    return pr.sort_values("doc_id").reset_index(drop=True)


def doc_vocab(sf_dir: str):
    """Frequency-ranked vocabulary over the documents table
    (``ops/textstats.build_vocab``): combiner word counts →
    block-local exact top-k → deterministic (count DESC, word ASC)
    token-id assignment. Oracled via SQL row_number()."""
    from jerex_ray.ops.textstats import build_vocab
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["text"])
    return build_vocab(ds, top=200)


def emb_dim_stats(sf_dir: str):
    """Per-dimension mean/variance of the embedding table from ONE
    streaming moments pass (``ops/embed.dim_stats`` — each batch
    reduces to (n, Σx, XᵀX)); oracled against DuckDB avg/var_samp
    over lateral-unnested vector elements, 6-decimal rounding."""
    from jerex_ray.ops.embed import dim_stats
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["embedding"])
    return dim_stats(ds)


def emb_pca(sf_dir: str):
    """Distributed PCA: covariance from the same one-pass moments,
    d×d eigendecomposition on the driver (d = embedding width),
    deterministic sign convention, then a streaming projection pass.
    Rows-only (eigendecomposition is not SQL-expressible); the
    orthonormality/variance-ordering/centering invariants are
    pytest-gated (test_sketch_embed.py)."""
    from jerex_ray.ops.embed import pca_fit, pca_project
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    mean, comps, _ = pca_fit(ds, k=8)
    proj = pca_project(ds, mean, comps).to_pandas()
    out = pd.DataFrame({
        "vec_id": np.repeat(proj["vec_id"].to_numpy(np.int64),
                            comps.shape[0]),
        "component": np.tile(np.arange(comps.shape[0], dtype=np.int64),
                             len(proj)),
        "value": np.concatenate([np.asarray(p) for p in proj["proj"]]),
    })
    return out.sort_values(["vec_id", "component"]).reset_index(drop=True)


def doc_pretrain_corpus(sf_dir: str):
    """END-TO-END pretraining-data pipeline, composed from the
    individually-verified pieces and verified as a whole by ONE
    composed SQL oracle:

      near-dup survivors (exact-Jaccard edges → connected components →
      keep smallest doc_id) → train split (md5 bucket < 0.9) → 8-gram
      decontamination against the test split → P90 unigram-quality
      filter (scores over the FULL corpus, as the standalone op) →
      token-budget sequence packing (512/pack, per source).

    Dataflow: see ``pipelines/pretrain.pretrain_corpus`` (shared with
    the ``pretrain`` CLI subcommand) — the loser/contaminated id sets
    are broadcast-sized by construction, quality scores attach via a
    hash-partitioned Dataset.join, the split predicate is stateless
    md5, packing is the distributed keyed prefix sum; nothing
    corpus-sized is ever collected."""
    from jerex_ray.pipelines.pretrain import pretrain_corpus
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    docs = read_parquet_sized(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text", "source"])
    out = pretrain_corpus(docs).to_pandas()
    if "doc_id" not in out.columns or out.empty:
        return pd.DataFrame({
            "doc_id": pd.Series(dtype="int64"),
            "source": pd.Series(dtype="object"),
            "n_tokens": pd.Series(dtype="int64"),
            "pack_id": pd.Series(dtype="int64"),
            "pack_offset": pd.Series(dtype="int64")})
    return out.sort_values("doc_id").reset_index(drop=True)


def doc_dup_spans(sf_dir: str):
    """Substring-level dedup (Lee et al. '22): maximal word spans
    covered by 8-grams occurring ≥2 times corpus-wide
    (``ops/substr.duplicate_spans``) — gram explode → combiner count →
    membership filter → per-doc gaps-and-islands merge. Oracled by a
    lateral-unnest + HAVING + window-function SQL recomputation
    (integer coordinates, bit-exact)."""
    from jerex_ray.ops.substr import duplicate_spans
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    out = duplicate_spans(ds, n=8, min_count=2).to_pandas()
    if "doc_id" not in out.columns or out.empty:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "start": pd.Series(dtype="int64"),
                             "end": pd.Series(dtype="int64")})
    for c in ("doc_id", "start", "end"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["doc_id", "start"]).reset_index(drop=True)


def doc_dup_ratio(sf_dir: str):
    """Per-doc fraction of words covered by cross-corpus duplicate
    8-gram spans — the substring-dedup quality signal
    (``ops/substr.duplicate_ratio``)."""
    from jerex_ray.ops.substr import duplicate_ratio, duplicate_spans
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    spans = duplicate_spans(ds, n=8, min_count=2)
    out = duplicate_ratio(ds, spans)
    return out[["doc_id", "n_words", "covered", "dup_ratio"]]


def q_events_value_quantiles(sf_dir: str):
    """Exact type-7 quantiles via three-pass pivot-grid selection (no
    sort shuffle; see ``ops/quantiles.py``) — oracled against DuckDB
    ``quantile_cont``."""
    from jerex_ray.ops.quantiles import distributed_quantiles
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["value"])
    qs = [0.25, 0.5, 0.75, 0.99]
    vals = distributed_quantiles(ds, "value", qs)
    return pd.DataFrame([{f"q{int(q * 100)}": round(v, 6)
                          for q, v in zip(qs, vals)}])


def q_events_quantiles_by_type(sf_dir: str):
    """Exact per-group type-7 quantiles — every group shares the same
    three shuffle-free passes (``ops/quantiles.grouped_quantiles``)."""
    from jerex_ray.ops.quantiles import grouped_quantiles
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_type", "value"])
    out = grouped_quantiles(ds, "event_type", "value", [0.25, 0.5, 0.75])
    out["value"] = out["value"].round(6)
    return out.sort_values(["event_type", "q"]).reset_index(drop=True)


def q_events_global_rank(sf_dir: str):
    """Global ORDER BY row number over the whole table without a
    single-place sort (``relational.global_rank``): exact-quantile
    range buckets → bucket offsets → co-located in-bucket sort."""
    from jerex_ray.relational import global_rank
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "value"])
    out = global_rank(ds, value_col="value", id_col="event_id") \
        .to_pandas()
    out = out[["event_id", "rnk"]]
    out["event_id"] = out["event_id"].astype("int64")
    out["rnk"] = out["rnk"].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


def q_events_expectations(sf_dir: str):
    """Data-quality expectations (``ops/validate.column_expectations``):
    per-column null counts, min/max and range-violation counts in one
    combiner pass — the pre-ingest guardrail."""
    from jerex_ray.ops.validate import column_expectations
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id", "value"])
    out = column_expectations(ds, {"value": (0.0, 50.0),
                                   "user_id": (0, None)})
    out["vmin"] = out["vmin"].round(6)
    out["vmax"] = out["vmax"].round(6)
    return out.sort_values("column").reset_index(drop=True)


def doc_snapshot_diff(sf_dir: str):
    """Change-data-capture (``ops/validate.snapshot_diff``): the OLD
    snapshot is doc_id < 450, the NEW is doc_id >= 50 with every
    doc_id % 7 == 0 text suffixed ' v2' (a deterministic simulated
    edit) — output is the delta: added / removed / changed keys."""
    from jerex_ray.ops.validate import snapshot_diff
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    old = ds.map_batches(lambda b: b[b["doc_id"] < 450],
                         batch_format="pandas")

    def as_new(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["doc_id"] >= 50].copy()
        edit = b["doc_id"] % 7 == 0
        b.loc[edit, "text"] = b.loc[edit, "text"] + " v2"
        return b

    new = ds.map_batches(as_new, batch_format="pandas")
    out = snapshot_diff(old, new).to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def q_user_activity_outer(sf_dir: str):
    """FULL OUTER join of two grouped fact aggregates (order totals ⟗
    event totals per user): both sides reduce through the combiner
    first, then a hash-partitioned ``Dataset.join(full_outer)`` —
    missing sides surface as 0/NULL exactly as the SQL."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    orders = read_parquet_sized(f"{sf_dir}/orders.parquet",
                                columns=["o_custkey", "o_totalprice"])
    ev = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id", "value"])
    o_agg = grouped_aggregate(
        orders.map_batches(
            lambda df: df.rename(columns={"o_custkey": "user_id"}),
            batch_format="pandas"),
        ["user_id"],
        {"n_orders": (None, "count"),
         "total_spent": ("o_totalprice", "sum")}).materialize()
    e_agg = grouped_aggregate(
        ev, ["user_id"],
        {"n_events": (None, "count"),
         "sum_value": ("value", "sum")}).materialize()
    out = o_agg.join(e_agg, join_type="full_outer", num_partitions=8,
                     on=("user_id",), right_on=("user_id",)).to_pandas()
    out["user_id"] = out["user_id"].astype("int64")
    for c in ("n_orders", "n_events"):
        out[c] = out[c].fillna(0).astype("int64")
    out["total_spent"] = out["total_spent"].astype("float64").round(2)
    out["sum_value"] = out["sum_value"].astype("float64").round(2)
    cols = ["user_id", "n_orders", "total_spent", "n_events", "sum_value"]
    return out[cols].sort_values("user_id").reset_index(drop=True)


def q_events_time_since_prev(sf_dir: str):
    """LAG window function: per event, whole seconds since the same
    user's previous event (NULL for each user's first) —
    ``ops/windows.lag_delta``: hash co-location by user, one in-block
    sort + vectorized diff."""
    from jerex_ray.ops.windows import lag_delta
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts"])
    out = lag_delta(ds, key="user_id", ts_col="ts",
                    id_col="event_id").to_pandas()
    out["event_id"] = out["event_id"].astype("int64")
    out["user_id"] = out["user_id"].astype("int64")
    out["delta_s"] = out["delta_s"].astype("float64")
    return out[["event_id", "user_id", "delta_s"]] \
        .sort_values("event_id").reset_index(drop=True)


def q_events_type_pivot(sf_dir: str):
    """Pivot (conditional aggregation): one row per user with a count
    column per event type. The per-(user, type) counts reduce through
    the combiner; the pivot itself is a vectorized per-block reshape
    over co-located users (``grouped_apply``) — never a driver-side
    table."""
    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    types = ["click", "error", "purchase", "signup", "view"]
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type"])
    counts = grouped_aggregate(ds, ["user_id", "event_type"],
                               {"n": (None, "count")})

    def pivot_block(df: pd.DataFrame) -> pd.DataFrame:
        wide = df.pivot_table(index="user_id", columns="event_type",
                              values="n", aggfunc="sum", fill_value=0)
        wide = wide.reindex(columns=types, fill_value=0).reset_index()
        wide.columns = ["user_id"] + [f"n_{t}" for t in types]
        return wide.astype("int64")

    out = grouped_apply(counts, ["user_id"], pivot_block).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def q_top_parts_per_brand(sf_dir: str):
    """Exact grouped top-k (``functions/aggregate.grouped_topk``):
    the 3 priciest parts per brand, ties by p_partkey — per-batch
    top-k combiner then co-located finish; oracled by SQL
    row_number() PARTITION BY."""
    from jerex_ray.functions.aggregate import grouped_topk
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/part.parquet",
                            columns=["p_brand", "p_partkey",
                                     "p_retailprice"])
    out = grouped_topk(ds, ["p_brand"], order_by="p_retailprice", k=3,
                       tie_cols=["p_partkey"]).to_pandas()
    out = out[["p_brand", "p_partkey", "p_retailprice"]]
    out["p_partkey"] = out["p_partkey"].astype("int64")
    out["p_retailprice"] = out["p_retailprice"].round(2)
    return out.sort_values(["p_brand", "p_partkey"]) \
        .reset_index(drop=True)


def q_events_value_buckets(sf_dir: str):
    """Per-group quartile-bucket assignment (the scale-safe NTILE
    analogue: value-based boundaries from one grouped-quantiles pass,
    broadcast, one streaming searchsorted —
    ``ops/quantiles.grouped_quantile_buckets``)."""
    from jerex_ray.ops.quantiles import grouped_quantile_buckets
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "event_type", "value"])
    out = grouped_quantile_buckets(ds, "event_type", "value").to_pandas()
    out = out[["event_id", "event_type", "bucket"]]
    out["event_id"] = out["event_id"].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


def q_orders_events_window(sf_dir: str):
    """Range join (aggregated): per order, count + sum of the same
    user's events within the 7 days up to the order date — the keyed
    range-join primitive (``ops/windows.range_join_agg``), oracled by
    a correlated-subquery SQL equivalent."""
    from jerex_ray.ops.windows import range_join_agg
    from jerex_ray.runtime import read_parquet_sized
    orders = read_parquet_sized(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_custkey",
                                         "o_orderdate"])
    orders = orders.map_batches(
        lambda df: df.rename(columns={"o_custkey": "user_id"}),
        batch_format="pandas")
    events = read_parquet_sized(f"{sf_dir}/events.parquet",
                                columns=["user_id", "ts", "value"])
    out = range_join_agg(orders, events, key="user_id",
                         left_ts="o_orderdate", right_ts="ts",
                         lower="7D", upper="0D",
                         value_col="value").to_pandas()
    out = out[["o_orderkey", "n_matches", "sum_value"]]
    out["o_orderkey"] = out["o_orderkey"].astype("int64")
    out["n_matches"] = out["n_matches"].astype("int64")
    out["sum_value"] = out["sum_value"].round(2)
    return out.sort_values("o_orderkey").reset_index(drop=True)


def dedup_minhash_edges(sf_dir: str):
    """ORACLE CAVEAT (shared with dedup_components): the SQL oracle is
    exact all-pairs Jaccard, while this pipeline's recall is
    LSH-bounded — 16 bands × 4 rows miss a jaccard-0.7 pair that never
    enters the candidate set with probability ≈ (1 − 0.7⁴)¹⁶ ≈ 1%.
    Parity is deterministic for the driver's fixture corpus (verified
    every round); a FUTURE fixture change that fails this oracle is
    most likely an unlucky LSH miss, not a verification bug — check
    recall before debugging the dataflow."""
    from jerex_ray.ops.dedup import minhash_dedup
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    _, edges = minhash_dedup(ds, threshold=0.7)
    out = edges[["doc_a", "doc_b"]].sort_values(["doc_a", "doc_b"])
    return out.reset_index(drop=True)


def dedup_jaccard_edges(sf_dir: str):
    """EXACT n-gram Jaccard near-dup edges (no LSH prefilter) — the
    guaranteed-recall twin of ``dedup_minhash_edges``. Unlike the
    minhash query, parity with the all-pairs SQL oracle is
    deterministic for ANY corpus (no probabilistic-recall caveat)."""
    from jerex_ray.ops.dedup import jaccard_edges_exact
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    edges = jaccard_edges_exact(ds, threshold=0.7).to_pandas()
    if "doc_a" not in edges.columns:
        return pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                             "doc_b": pd.Series(dtype="int64")})
    out = edges[["doc_a", "doc_b"]].sort_values(["doc_a", "doc_b"])
    return out.reset_index(drop=True)


def dedup_jaccard_prefix(sf_dir: str):
    """EXACT n-gram Jaccard near-dup edges via PREFIX FILTERING
    (``ops/dedup.jaccard_edges_prefix``, the PPJoin-family scale path:
    candidates only from rarest-gram co-location, hot boilerplate
    grams never pair) — third algorithm for the same contract; shares
    the all-pairs SQL oracle with ``dedup_jaccard_edges`` and is
    pinned equal to it by pytest."""
    from jerex_ray.ops.dedup import jaccard_edges_prefix
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    edges = jaccard_edges_prefix(ds, threshold=0.7).to_pandas()
    if "doc_a" not in edges.columns:
        return pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                             "doc_b": pd.Series(dtype="int64")})
    out = edges[["doc_a", "doc_b"]].astype("int64") \
        .sort_values(["doc_a", "doc_b"])
    return out.reset_index(drop=True)


def dedup_components(sf_dir: str):
    """Distributed connected components (BSP min-label propagation +
    pointer jumping over raw Ray task grids) over the exact-Jaccard
    near-dup edges — oracled by a recursive-CTE transitive closure in
    SQL. Inherits the LSH probabilistic-recall caveat documented on
    ``dedup_minhash_edges`` (a missed edge can split a component)."""
    from jerex_ray.functions.components import connected_components
    from jerex_ray.ops.dedup import minhash_verified_edges
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    edges = minhash_verified_edges(ds, threshold=0.7)
    comp = connected_components(
        edges.map_batches(
            lambda b: b.rename(columns={"doc_a": "src", "doc_b": "dst"})
            [["src", "dst"]] if "doc_a" in b.columns else
            pd.DataFrame({"src": pd.Series(dtype="int64"),
                          "dst": pd.Series(dtype="int64")}),
            batch_format="pandas"))
    return comp.astype("int64").sort_values("node").reset_index(drop=True)


def dedup_survivors(sf_dir: str):
    """The production artifact of the near-dup pipeline: which docs
    REMAIN after MinHash→verify→connected-components clustering with a
    keep-smallest-doc_id policy. The loser set (near-dup docs that are
    not their component's minimum) is broadcast-sized by construction —
    the corpus itself streams through one anti-join filter."""
    from jerex_ray.functions.components import connected_components
    from jerex_ray.functions.join import broadcast_anti_join
    from jerex_ray.ops.dedup import minhash_verified_edges
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    edges = minhash_verified_edges(ds, threshold=0.7)
    comp = connected_components(
        edges.map_batches(
            lambda b: b.rename(columns={"doc_a": "src", "doc_b": "dst"})
            [["src", "dst"]] if "doc_a" in b.columns else
            pd.DataFrame({"src": pd.Series(dtype="int64"),
                          "dst": pd.Series(dtype="int64")}),
            batch_format="pandas"))
    losers = set(comp.loc[comp["node"] != comp["component"], "node"]
                 .astype("int64")) if len(comp) else set()
    ids = read_parquet_sized(f"{sf_dir}/documents.parquet",
                             columns=["doc_id"])
    out = broadcast_anti_join(ids, losers, on="doc_id").to_pandas()
    if "doc_id" not in out.columns:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64")})
    return out.astype("int64").sort_values("doc_id") \
        .reset_index(drop=True)


def dedup_incremental(sf_dir: str):
    """Streaming-ingest dedup (``ops/dedup.incremental_exact_dedup``):
    the md5-lower half of the corpus plays the already-ingested BASE,
    the upper half the INCOMING shard; incoming docs survive iff their
    normalized text is new to the base AND they are their shard's
    smallest-doc_id holder of it. The base is consulted only through
    its fingerprint index."""
    from jerex_ray.ops.dedup import incremental_exact_dedup
    from jerex_ray.ops.split import assign_split
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    halves = ds.map_batches(
        assign_split, batch_format="pandas",
        fn_kwargs={"fractions": (0.5, 0.5), "names": ("base", "inc")})
    base = halves.map_batches(
        lambda b: b.loc[b["split"] == "base", ["doc_id", "text"]],
        batch_format="pandas")
    inc = halves.map_batches(
        lambda b: b.loc[b["split"] == "inc", ["doc_id", "text"]],
        batch_format="pandas")
    out = incremental_exact_dedup(inc, base).to_pandas()
    if "doc_id" not in out.columns or out.empty:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64")})
    return out[["doc_id"]].astype("int64").sort_values("doc_id") \
        .reset_index(drop=True)


def dedup_simhash_pairs(sf_dir: str):
    from jerex_ray.ops.dedup import simhash_candidates
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return simhash_candidates(ds, max_hamming=3)


def _query_vectors(sf_dir: str):
    """The same predicate the oracle uses (``q.vec_id < 3``): query
    vectors selected by value, their actual vec_id kept as query_idx —
    never positional indices (non-contiguous ids stay in sync)."""
    import pyarrow.parquet as pq
    qdf = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    qdf = qdf[qdf["vec_id"] < 3].sort_values("vec_id")
    return np.stack(qdf["embedding"].to_numpy()), qdf["vec_id"].to_numpy()


def ann_topk(sf_dir: str):
    from jerex_ray.ops.ann import brute_force_topk
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    queries, qids = _query_vectors(sf_dir)
    out = brute_force_topk(ds, queries, k=5)
    out["query_idx"] = qids[out["query_idx"].to_numpy()]
    return out[["query_idx", "vec_id"]].astype("int64") \
        .sort_values(["query_idx", "vec_id"]).reset_index(drop=True)


def emb_knn_predict(sf_dir: str):
    """kNN label prediction: exact cosine top-5 neighbors per query
    vector (excluding the query row itself), majority label with
    smallest-label tie-break — the distributed exact-kNN classifier
    (brute-force partial top-k per block + label vote on the
    k-bounded result). Oracled by a row_number + count window SQL."""
    from jerex_ray.ops.ann import brute_force_topk
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    queries, qids = _query_vectors(sf_dir)
    # k+1 then drop self: the query rows are corpus members
    top = brute_force_topk(ds, queries, k=6)
    top["query_idx"] = qids[top["query_idx"].to_numpy()]
    top = top[top["query_idx"] != top["vec_id"]]
    top = top.sort_values(["query_idx", "cosine", "vec_id"],
                          ascending=[True, False, True]) \
        .groupby("query_idx", sort=False).head(5)
    labels = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "label"]).to_pandas()
    j = top.merge(labels, on="vec_id")
    votes = j.groupby(["query_idx", "label"]).size() \
        .reset_index(name="n")
    votes = votes.sort_values(["query_idx", "n", "label"],
                              ascending=[True, False, True]) \
        .drop_duplicates("query_idx")
    out = votes.rename(columns={"label": "pred_label",
                                "n": "n_votes"})
    out["query_idx"] = out["query_idx"].astype("int64")
    out["pred_label"] = out["pred_label"].astype("int64")
    out["n_votes"] = out["n_votes"].astype("int64")
    return out[["query_idx", "pred_label", "n_votes"]] \
        .sort_values("query_idx").reset_index(drop=True)


def emb_pq_topk(sf_dir: str):
    """Product-quantization ANN (``ops/ann.pq_train/pq_encode/
    pq_topk``): sample-trained subspace codebooks, uint8 codes, ADC
    search. Rows-only (approximate by design — same status as
    ann_ivf_topk); recall vs brute force is pytest-gated
    (test_ops.py::test_pq_recall_and_determinism)."""
    from jerex_ray.ops.ann import pq_encode, pq_topk, pq_train
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    queries, qids = _query_vectors(sf_dir)
    books = pq_train(ds, m=8, k=64)
    codes = pq_encode(ds, books).materialize()
    out = pq_topk(codes, books, queries, k=5)
    out["query_idx"] = qids[out["query_idx"].to_numpy()]
    return out[["query_idx", "vec_id"]].astype("int64") \
        .sort_values(["query_idx", "vec_id"]).reset_index(drop=True)


def emb_semdedup(sf_dir: str):
    """SemDeDup survivors (``ops/embed.semdedup``): k-means buckets
    the space, only within-cluster cosine pairs are checked. Rows-only
    (k-means bucketing is approximate by design — a cross-cluster
    near-dup pair survives, exactly as in the paper); the exact
    all-pairs twin ``emb_near_dups`` IS oracled, and the planted-dup
    behavior is pytest-gated."""
    from jerex_ray.ops.embed import semdedup
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    out = semdedup(ds, k=8, threshold=0.95).to_pandas()
    if "vec_id" not in out.columns or out.empty:
        return pd.DataFrame({"vec_id": pd.Series(dtype="int64"),
                             "cluster": pd.Series(dtype="int64")})
    out["vec_id"] = out["vec_id"].astype("int64")
    out["cluster"] = out["cluster"].astype("int64")
    return out.sort_values("vec_id").reset_index(drop=True)


def emb_label_counts(sf_dir: str):
    from ray.data.aggregate import Count
    from jerex_ray.runtime import read_parquet_sized, shuffle_partitions
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet", columns=["label"])
    out = ds.groupby("label", num_partitions=shuffle_partitions()) \
            .aggregate(Count(alias_name="n"))
    return out.to_pandas().sort_values("label").reset_index(drop=True)


def emb_near_dups(sf_dir: str):
    """EXACT all-pairs cosine ≥ 0.95 (oracle-checked); the multi-table
    LSH variant (``embedding_near_dups``) is the 100 TB scale path,
    exercised by ``emb_near_dups_lsh`` and a planted-recall test."""
    from jerex_ray.ops.dedup import embedding_near_dups_exact
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    out = embedding_near_dups_exact(ds, threshold=0.95)
    return out[["vec_a", "vec_b"]].astype("int64") \
        .sort_values(["vec_a", "vec_b"]).reset_index(drop=True)


def emb_near_dups_lsh(sf_dir: str):
    """Multi-table LSH near-dups (approximate-recall scale path;
    rows-only by design — the exact variant above is oracled)."""
    from jerex_ray.ops.dedup import embedding_near_dups
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    out = embedding_near_dups(ds, threshold=0.95)
    return out[["vec_a", "vec_b"]].astype("int64") \
        .sort_values(["vec_a", "vec_b"]).reset_index(drop=True)


def ann_ivf_topk(sf_dir: str):
    """Approximate IVF top-k (rows-only: recall < 1 by design; the
    exact brute-force variant is the oracle-checked one)."""
    from jerex_ray.ops.ann import ivf_topk
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    queries, qids = _query_vectors(sf_dir)
    out = ivf_topk(ds, queries, k=5)
    out["query_idx"] = qids[out["query_idx"].to_numpy()]
    return out[["query_idx", "vec_id"]].astype("int64") \
        .sort_values(["query_idx", "vec_id"]).reset_index(drop=True)


def ann_ivfpq_topk(sf_dir: str):
    """IVF-PQ with exact re-rank (IVFADC, Jégou '11 §V) — the
    composed billion-scale ANN path: coarse cells prune, residual PQ
    codes scan, a candidate-bounded exact pass re-ranks. Rows-only
    (recall < 1 by design; returned cosines are exact and the recall
    floor is pytest-gated, test_ivfpq_topk_recall_and_exact_cosines)."""
    from jerex_ray.ops.ann import ivfpq_topk
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    queries, qids = _query_vectors(sf_dir)
    out = ivfpq_topk(ds, queries, k=5, m=8)
    if out.empty:      # graceful-empty contract (object-dtype frame)
        return pd.DataFrame({"query_idx": pd.Series(dtype="int64"),
                             "vec_id": pd.Series(dtype="int64")})
    out["query_idx"] = qids[out["query_idx"].to_numpy()]
    return out[["query_idx", "vec_id"]].astype("int64") \
        .sort_values(["query_idx", "vec_id"]).reset_index(drop=True)


# ---------- windowed / time-ordered queries ----------

def q_events_sliding(sf_dir: str):
    from jerex_ray.ops.windows import sliding_window
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_type", "ts"])
    out = sliding_window(ds, keys=["event_type"], ts_col="ts",
                         size="2h", slide="1h",
                         specs={"n_events": (None, "count")}).to_pandas()
    out["n_events"] = out["n_events"].astype("int64")
    return out.sort_values(["event_type", "window_start"]) \
        .reset_index(drop=True)


def q_events_sessions(sf_dir: str):
    from jerex_ray.ops.windows import session_windows
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts"])
    out = session_windows(ds, key="user_id", ts_col="ts",
                          gap="30min").to_pandas()
    return out.sort_values(["user_id", "session_start"]) \
        .reset_index(drop=True)


def q_orders_last_event(sf_dir: str):
    """As-of join: for each order, the latest event of the same user at
    or before the order date."""
    from jerex_ray.ops.windows import asof_join
    from jerex_ray.runtime import read_parquet_sized
    orders = read_parquet_sized(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_custkey",
                                         "o_orderdate"])
    orders = orders.map_batches(
        lambda df: df.rename(columns={"o_custkey": "user_id"}),
        batch_format="pandas")
    events = read_parquet_sized(f"{sf_dir}/events.parquet",
                                columns=["user_id", "ts", "value"])
    out = asof_join(orders, events, key="user_id", left_ts="o_orderdate",
                    right_ts="ts", right_cols=["value"]).to_pandas()
    out = out[["o_orderkey", "ts_right"]].rename(
        columns={"ts_right": "last_event_ts"})
    # the union path can promote columns to pandas nullable dtypes;
    # pin the driver-facing schema to plain numpy dtypes
    out["o_orderkey"] = out["o_orderkey"].astype("int64")
    out["last_event_ts"] = pd.to_datetime(out["last_event_ts"]) \
        .astype("datetime64[us]")
    return out.sort_values("o_orderkey").reset_index(drop=True)


def q_events_outliers(sf_dir: str):
    """Per-type z-score outliers (|value − μ_type| > 3σ_type): the
    two-pass standardization shape — one combiner pass computes
    group moments (group-count-bounded), which broadcast back into a
    vectorized row filter. Returns the outlier event ids."""
    import ray

    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "event_type", "value"])

    def sq(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"event_type": df["event_type"],
                             "v": df["value"],
                             "v2": df["value"] ** 2})

    mom = grouped_aggregate(ds.map_batches(sq, batch_format="pandas"),
                            ["event_type"],
                            {"n": (None, "count"), "s": ("v", "sum"),
                             "s2": ("v2", "sum")}).to_pandas()
    mom["mu"] = mom["s"] / mom["n"]
    # sample stddev (n-1), matching stddev_samp
    mom["sd"] = np.sqrt((mom["s2"] - mom["n"] * mom["mu"] ** 2)
                        / (mom["n"] - 1))
    mu_map = dict(zip(mom["event_type"], mom["mu"]))
    sd_map = dict(zip(mom["event_type"], mom["sd"]))
    ref = ray.put((mu_map, sd_map))

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        mus, sds = ray.get(ref)
        mu = df["event_type"].map(mus).to_numpy(np.float64)
        sd = df["event_type"].map(sds).to_numpy(np.float64)
        keep = np.abs(df["value"].to_numpy() - mu) > 3 * sd
        out = df[keep][["event_id", "event_type"]].copy()
        return out

    out = ds.map_batches(flag, batch_format="pandas").to_pandas()
    if "event_id" not in out.columns:
        out = pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                            "event_type": pd.Series(dtype="object")})
    out["event_id"] = out["event_id"].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


def doc_word_entropy(sf_dir: str):
    """Shannon entropy of each document's word distribution (nats,
    rounded to 6) — the repetitiveness/quality signal: low-entropy
    docs are boilerplate or keyword stuffing. One vectorized pass:
    per-doc value_counts → −Σ p ln p."""
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def ent(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        # vectorized explode → per-(doc, word) counts → segment sums;
        # no Python loop over rows (same shape as the langid kernel)
        ex = df["text"].fillna("").str.lower().str.split().explode()
        ex = ex[ex.notna() & (ex != "")]
        ent_col = np.zeros(len(df))
        if len(ex):
            c = (pd.DataFrame({"i": ex.index.to_numpy(),
                               "w": ex.to_numpy()})
                 .groupby(["i", "w"], sort=False).size()
                 .reset_index(name="n"))
            t = c.groupby("i", sort=False)["n"].transform("sum") \
                .to_numpy(np.float64)
            p = c["n"].to_numpy(np.float64) / t
            h = pd.Series(-(p * np.log(p))).groupby(
                c["i"].to_numpy(), sort=False).sum()
            ent_col[h.index.to_numpy()] = h.to_numpy()
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(),
                             "entropy": np.round(ent_col, 6)})

    out = ds.map_batches(ent, batch_format="pandas").to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def q_lineitem_corr(sf_dir: str):
    """Pearson correlation of line quantity vs extended price, from
    ONE combiner pass of co-moments (n, Σx, Σy, Σx², Σy², Σxy) — the
    distributed covariance shape; only six scalars reduce. Oracled
    against DuckDB ``corr`` to 6 decimals."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/lineitem.parquet",
                            columns=["l_quantity", "l_extendedprice"])

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        x = df["l_quantity"].to_numpy(np.float64)
        y = df["l_extendedprice"].to_numpy(np.float64)
        return pd.DataFrame({"__all": [0], "n": [np.int64(len(x))],
                             "sx": [x.sum()], "sy": [y.sum()],
                             "sxx": [(x * x).sum()],
                             "syy": [(y * y).sum()],
                             "sxy": [(x * y).sum()]})

    m = grouped_aggregate(
        ds.map_batches(moments, batch_format="pandas"),
        ["__all"],
        {k: (k, "sum") for k in ("n", "sx", "sy", "sxx", "syy",
                                 "sxy")}).to_pandas().iloc[0]
    n = float(m["n"])
    cov = m["sxy"] - m["sx"] * m["sy"] / n
    vx = m["sxx"] - m["sx"] ** 2 / n
    vy = m["syy"] - m["sy"] ** 2 / n
    r = cov / np.sqrt(vx * vy)
    return pd.DataFrame({"n": [np.int64(n)],
                         "corr_qty_price": [round(float(r), 6)]})


def q_events_funnel(sf_dir: str):
    """Sequential funnel analysis (view → click ≤24h → purchase
    ≤24h): the ordered-pattern-matching shape — each stage is a
    grouped min over the PREVIOUS stage's anchor timestamps attached
    to the fact stream by a hash join, with a vectorized window
    filter. Per-user state never leaves the cluster; only the three
    stage counts return."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized, shuffle_partitions
    configure_data_context()
    ev = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type", "ts"]) \
        .materialize()
    W = pd.Timedelta("24h")
    np_ = shuffle_partitions(8)

    def typed(t):
        return ev.map_batches(
            lambda df, _t=t: df[df["event_type"] == _t]
            [["user_id", "ts"]], batch_format="pandas")

    t0 = grouped_aggregate(typed("view"), ["user_id"],
                           {"t0": ("ts", "min")}, result_hint="large") \
        .materialize()
    s2 = typed("click").join(t0, join_type="inner", num_partitions=np_,
                             on=("user_id",))
    t1 = grouped_aggregate(
        s2.map_batches(
            lambda df: df[(df["ts"] > df["t0"])
                          & (df["ts"] <= df["t0"] + W)]
            [["user_id", "ts"]], batch_format="pandas"),
        ["user_id"], {"t1": ("ts", "min")}, result_hint="large") \
        .materialize()
    s3 = typed("purchase").join(t1, join_type="inner",
                                num_partitions=np_, on=("user_id",))
    reached = grouped_aggregate(
        s3.map_batches(
            lambda df: df[(df["ts"] > df["t1"])
                          & (df["ts"] <= df["t1"] + W)]
            [["user_id"]], batch_format="pandas"),
        ["user_id"], {"n": (None, "count")}, result_hint="large")
    return pd.DataFrame({
        "stage": ["1_view", "2_click_24h", "3_purchase_24h"],
        "n_users": np.array([t0.count(), t1.count(), reached.count()],
                            dtype="int64")})


def q_orders_cohort_retention(sf_dir: str):
    """Cohort retention matrix: customers grouped by first-order year
    (cohort), counted once per active year — the derive-a-dimension-
    then-join-back shape: a combiner min per customer builds the
    cohort table (customer-scaled, stays a Dataset), a hash join
    attaches it to the fact stream, and two grouped aggregates
    produce the year×year matrix."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized, shuffle_partitions
    configure_data_context()
    orders = read_parquet_sized(f"{sf_dir}/orders.parquet",
                                columns=["o_custkey", "o_orderdate"])

    def year(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_custkey": df["o_custkey"].to_numpy(),
            "yr": df["o_orderdate"].dt.year.astype("int64")})

    yrs = orders.map_batches(year, batch_format="pandas").materialize()
    first = grouped_aggregate(yrs, ["o_custkey"], {"cohort": ("yr", "min")},
                              result_hint="large")
    j = yrs.join(first, join_type="inner",
                 num_partitions=shuffle_partitions(8), on=("o_custkey",))
    active = grouped_aggregate(j, ["cohort", "yr", "o_custkey"],
                               {"n": (None, "count")},
                               result_hint="large")
    out = grouped_aggregate(active, ["cohort", "yr"],
                            {"n_customers": (None, "count")}).to_pandas()
    out = out.rename(columns={"yr": "active_year"})
    out["cohort"] = out["cohort"].astype("int64")
    out["active_year"] = out["active_year"].astype("int64")
    out["n_customers"] = out["n_customers"].astype("int64")
    return out.sort_values(["cohort", "active_year"]) \
        .reset_index(drop=True)


def q_events_checksum(sf_dir: str):
    """Order-independent table checksum — the cross-system validation
    primitive for verifying a 100 TB copy/migration without moving the
    data twice: checksum := (Σ over rows of md5_64(key-fields) mod
    2⁶³) mod 2⁶³. Commutative/associative, so per-batch partial sums
    tree-reduce and NO row order, sharding, or engine needs to match;
    the SQL oracle recomputes the identical number from the identical
    definition."""
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id",
                                     "event_type"])
    MOD = 1 << 63

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        from jerex_ray.util import md5_hash64_batch
        if df.empty:
            return pd.DataFrame({"c": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64")})
        keys = (df["event_id"].astype(str) + "|"
                + df["user_id"].astype(str) + "|"
                + df["event_type"].astype(str))
        h = md5_hash64_batch(keys.to_numpy()) % np.uint64(MOD)
        return pd.DataFrame({"c": [np.int64(int(h.sum()) % MOD)],
                             "n": [np.int64(len(df))]})

    parts = ds.map_batches(partial, batch_format="pandas",
                           batch_size=65536).to_pandas()
    # the collected object is #batches rows — exact final mod on the
    # driver (python ints, no overflow)
    total = int(sum(int(x) for x in parts["c"])) % MOD
    return pd.DataFrame({"checksum": [np.int64(total)],
                         "n_rows": [np.int64(parts["n"].sum())]})


def q_events_type_share(sf_dir: str):
    """Share-of-total per event type (grouped sum ÷ grand total): one
    combiner-backed grouped aggregate; the division happens on the
    group-count-bounded result."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_type", "value"])
    g = grouped_aggregate(ds, ["event_type"],
                          {"sum_value": ("value", "sum")}).to_pandas()
    g["share"] = (g["sum_value"] / g["sum_value"].sum()).round(6)
    g["sum_value"] = g["sum_value"].round(2)
    return g.sort_values("event_type").reset_index(drop=True)


def q_events_running_total(sf_dir: str):
    """Per-user running total of event value (cumulative window sum):
    hash co-location by user, one vectorized in-block sort + grouped
    cumsum — the distributed keyed prefix-sum shape (``ops/pack.py``
    uses the same for token budgets). Oracled by
    ``SUM() OVER (PARTITION BY user ORDER BY ts, id)``."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts",
                                     "value"])

    def running(block: pd.DataFrame) -> pd.DataFrame:
        if block.empty:
            return pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                                 "user_id": pd.Series(dtype="int64"),
                                 "running_value": pd.Series(
                                     dtype="float64")})
        b = block.sort_values(["user_id", "ts", "event_id"])
        out = pd.DataFrame({
            "event_id": b["event_id"].to_numpy(),
            "user_id": b["user_id"].to_numpy(),
            "running_value": b.groupby("user_id", sort=False)["value"]
            .cumsum().round(2).to_numpy()})
        return out

    out = grouped_apply(ds, ["user_id"], running).to_pandas()
    out["event_id"] = out["event_id"].astype("int64")
    out["user_id"] = out["user_id"].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


def q_events_mode_by_user(sf_dir: str):
    """Grouped mode (most frequent event_type per user,
    lexicographic tie-break) — the two-phase partial-count election
    (``functions/aggregate.grouped_mode``), oracled via
    row_number-over-counts SQL."""
    from jerex_ray.functions.aggregate import grouped_mode
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type"])
    out = grouped_mode(ds, ["user_id"], value_col="event_type").to_pandas()
    out["user_id"] = out["user_id"].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


def q_events_cms_counts(sf_dir: str):
    """Count-min sketch per-type counts (``ops/sketch.cms_counts_by``):
    distributed additive-counter build (tree-reduce SUM of depth×width
    matrices — kilobytes through the object store, never the column),
    point estimates = min over rows. md5-derived buckets make the
    estimate a deterministic function of the data, so the SQL oracle
    recomputes counters AND estimates exactly — including any
    collision inflation (the estimate is one-sided ≥ truth, which the
    pytest property gate also asserts)."""
    from jerex_ray.ops.sketch import cms_counts_by
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_type"])
    out = cms_counts_by(ds, column="event_type", depth=4, width=1024)
    out["cms_count"] = out["cms_count"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def q_part_kcore(sf_dir: str):
    """k-core of the part co-purchase graph (k=80): BSP iterative
    peeling (``ops/graph.kcore``) — per round a combiner degree
    aggregate + two hash joins against the surviving-node Dataset.
    Converges in ~5 rounds on this graph; the SQL oracle replays
    exactly max_rounds=8 chained peel CTEs (a converged fixpoint makes
    the extra rounds no-ops on both sides)."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.ops.graph import kcore
    from jerex_ray.runtime import read_parquet_sized
    li = read_parquet_sized(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey"])

    def pairs_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"a": pd.Series(dtype="int64"),
                                 "b": pd.Series(dtype="int64")})
        d = df.drop_duplicates(["l_orderkey", "l_partkey"])
        m = d.merge(d, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        return pd.DataFrame({"a": m["l_partkey_x"].to_numpy(),
                             "b": m["l_partkey_y"].to_numpy()})

    edges = grouped_apply(li, ["l_orderkey"], pairs_block)
    out = kcore(edges, k=80, max_rounds=8).to_pandas()
    out["node"] = out["node"].astype("int64")
    out["deg"] = out["deg"].astype("int64")
    return out.sort_values("node").reset_index(drop=True)


def q_events_stream_late(sf_dir: str):
    """Streaming-window late-data side channel: per-shard watermarks
    (``id % 8`` partitioned log), arrival = ts + md5-jitter, allowed
    lateness 30 min — events below their shard's watermark at arrival
    are LATE (``ops/streaming.watermark_tag``). The SQL oracle
    recomputes arrival, the per-shard running max over strictly
    earlier arrivals, and the same cutoff."""
    from jerex_ray.ops.streaming import watermark_tag
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "ts"])
    out = watermark_tag(ds, lateness="30min").to_pandas()
    out = out[out["is_late"]][["event_id", "shard", "ts"]]
    out["event_id"] = out["event_id"].astype("int64")
    out["shard"] = out["shard"].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


def q_events_stream_windows(sf_dir: str):
    """Finalized hourly tumbling windows over the ON-TIME stream (the
    companion of ``q_events_stream_late``): late rows are excluded
    from their window's aggregate, exactly the Beam/Flink
    allowed-lateness drop rule."""
    from jerex_ray.ops.streaming import stream_window_aggregate
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "ts", "value"])
    out = stream_window_aggregate(ds, window="1h",
                                  lateness="30min").to_pandas()
    out["n_events"] = out["n_events"].astype("int64")
    out["sum_value"] = out["sum_value"].round(2)
    return out.sort_values("window_start").reset_index(drop=True)


def q_orders_next_event(sf_dir: str):
    """Forward as-of join: for each order, the EARLIEST event of the
    same user at or after the order date (``asof_join`` with
    direction='forward' — same single-shuffle union/co-locate/
    merge_asof dataflow as the backward twin)."""
    from jerex_ray.ops.windows import asof_join
    from jerex_ray.runtime import read_parquet_sized
    orders = read_parquet_sized(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_custkey",
                                         "o_orderdate"])
    orders = orders.map_batches(
        lambda df: df.rename(columns={"o_custkey": "user_id"}),
        batch_format="pandas")
    events = read_parquet_sized(f"{sf_dir}/events.parquet",
                                columns=["user_id", "ts", "value"])
    out = asof_join(orders, events, key="user_id", left_ts="o_orderdate",
                    right_ts="ts", right_cols=["value"],
                    direction="forward").to_pandas()
    out = out[["o_orderkey", "ts_right"]].rename(
        columns={"ts_right": "next_event_ts"})
    out["o_orderkey"] = out["o_orderkey"].astype("int64")
    out["next_event_ts"] = pd.to_datetime(out["next_event_ts"]) \
        .astype("datetime64[us]")
    return out.sort_values("o_orderkey").reset_index(drop=True)


def q_events_value_mad(sf_dir: str):
    """Robust scale statistics: median + median absolute deviation of
    the event values — TWO passes of the shuffle-free exact-quantile
    selector (``ops/quantiles.distributed_quantiles``): the first
    finds the median, the second runs over |v − median| computed
    vectorized per batch. Oracled against nested quantile_cont."""
    from jerex_ray.ops.quantiles import distributed_quantiles
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["value"])
    med = distributed_quantiles(ds, "value", [0.5])[0]
    dev = ds.map_batches(
        lambda df: pd.DataFrame(
            {"dev": (df["value"] - med).abs()}),
        batch_format="pandas")
    mad = distributed_quantiles(dev, "dev", [0.5])[0]
    return pd.DataFrame({"med": [round(float(med), 6)],
                         "mad": [round(float(mad), 6)]})


def q_events_distinct_users_by_type(sf_dir: str):
    """EXACT distinct users per event type (the exact twin of the
    HLL-sketched ``q_events_hll_by_type``): distinct (type, user)
    pairs via one combiner-backed grouped aggregate, then a count per
    type over the pair-bounded result."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_type", "user_id"])
    pairs = grouped_aggregate(ds, ["event_type", "user_id"],
                              {"n": (None, "count")},
                              result_hint="large")
    out = grouped_aggregate(pairs, ["event_type"],
                            {"n_users": (None, "count")}).to_pandas()
    out["n_users"] = out["n_users"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def q_part_triangles(sf_dir: str):
    """Per-node triangle counts over the part co-purchase graph (parts
    are adjacent iff they appear in the same order): the distributed
    degree-ordered wedge-join operator (``ops/graph.triangle_counts``)
    against an exact 3-way self-join SQL oracle. ~116k edges / ~414k
    triangles at sf0.01 — dense enough that the degree orientation
    matters (the apex-quadratic wedge stage sees oriented out-degrees,
    not raw degrees)."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.ops.graph import triangle_counts
    from jerex_ray.runtime import read_parquet_sized
    li = read_parquet_sized(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey"])
    # co-occurrence edges: per-order part pairs (grouped_apply would
    # also work; a per-block self-merge after key co-location is the
    # same shape triangle_counts itself uses for wedges)
    from jerex_ray.functions.aggregate import grouped_apply

    def pairs_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"a": pd.Series(dtype="int64"),
                                 "b": pd.Series(dtype="int64")})
        d = df.drop_duplicates(["l_orderkey", "l_partkey"])
        m = d.merge(d, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        return pd.DataFrame({"a": m["l_partkey_x"].to_numpy(),
                             "b": m["l_partkey_y"].to_numpy()})

    edges = grouped_apply(li, ["l_orderkey"], pairs_block)
    out = triangle_counts(edges, src="a", dst="b").to_pandas()
    out["node"] = out["node"].astype("int64")
    out["n_triangles"] = out["n_triangles"].astype("int64")
    return out.sort_values("node").reset_index(drop=True)


def doc_phrase_search(sf_dir: str):
    """Positional phrase query 'key order' over the corpus
    (``ops/invindex.phrase_search``): postings explode with within-doc
    positions, term-set pushdown before the shuffle, per-block anchor
    intersection (posting shifted by its phrase slot). Oracled via a
    positional self-join in SQL."""
    from jerex_ray.ops.invindex import phrase_search
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return phrase_search(ds, "key order")


def q_part_skyline(sf_dir: str):
    """2-D Pareto frontier over parts — cheapest-yet-largest
    (minimize p_retailprice, maximize p_size) — via the distributive
    block-local skyline prune (``relational.skyline_2d``). Oracled
    with the textbook NOT EXISTS dominance predicate."""
    from jerex_ray.relational import skyline_2d
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/part.parquet",
                            columns=["p_partkey", "p_retailprice",
                                     "p_size"])
    out = skyline_2d(ds, min_col="p_retailprice", max_col="p_size")
    out["p_partkey"] = out["p_partkey"].astype("int64")
    out["p_size"] = out["p_size"].astype("int64")
    return out[["p_partkey", "p_retailprice", "p_size"]] \
        .sort_values("p_partkey").reset_index(drop=True)


def q_part_bfs(sf_dir: str):
    """Single-source hop distances over the part co-purchase graph
    (parts adjacent iff they share an order) from part 1 —
    frontier-expansion BSP (``ops/graph.bfs_levels``: edges
    hash-partitioned once, per-round traffic frontier-sized, exact
    termination on empty frontier). Oracled by a recursive-CTE BFS
    whose level cap only has to exceed the graph's eccentricity (the
    dense co-purchase graph has diameter ≤ ~4; the Ray side
    terminates naturally)."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.ops.graph import bfs_levels
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    li = read_parquet_sized(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey"])

    def pairs_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"a": pd.Series(dtype="int64"),
                                 "b": pd.Series(dtype="int64")})
        d = df.drop_duplicates(["l_orderkey", "l_partkey"])
        m = d.merge(d, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        return pd.DataFrame({"a": m["l_partkey_x"].to_numpy(),
                             "b": m["l_partkey_y"].to_numpy()})

    edges = grouped_apply(li, ["l_orderkey"], pairs_block)
    out = bfs_levels(edges, 1, src="a", dst="b")
    out["node"] = out["node"].astype("int64")
    out["level"] = out["level"].astype("int64")
    return out


def q_events_percent_rank(sf_dir: str):
    """percent_rank() of each event's value within its event_type —
    the rank window function distributed as one hash co-location per
    type plus a vectorized in-block min-rank ((rank−1)/(n−1) is an
    exact integer division on both sides, so no rounding is
    needed)."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "event_type", "value"])

    def pr_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                                 "event_type": pd.Series(dtype="object"),
                                 "pr": pd.Series(dtype="float64")})
        g = df.groupby("event_type", sort=False)["value"]
        r = g.rank(method="min").to_numpy(np.float64)
        n = g.transform("size").to_numpy(np.float64)
        pr = np.where(n > 1, (r - 1.0) / np.maximum(n - 1.0, 1.0), 0.0)
        return pd.DataFrame({"event_id": df["event_id"].to_numpy(),
                             "event_type": df["event_type"].to_numpy(),
                             "pr": pr})

    out = grouped_apply(ds, ["event_type"], pr_block).to_pandas()
    out["event_id"] = out["event_id"].astype("int64")
    return out[["event_id", "event_type", "pr"]] \
        .sort_values("event_id").reset_index(drop=True)


def q_events_state_intervals(sf_dir: str):
    """SCD-2-style run collapse: per user, consecutive events of the
    same type (ordered by ts, event_id) fold into one validity
    interval (run index, first/last ts, count) — gaps-and-islands via
    one user co-location and a vectorized change-flag cumsum, the
    dimension-history builder of a warehouse load."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "ts", "user_id",
                                     "event_type"])

    def runs_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({
                "user_id": pd.Series(dtype="int64"),
                "run": pd.Series(dtype="int64"),
                "event_type": pd.Series(dtype="object"),
                "first_ts": pd.Series(dtype="datetime64[us]"),
                "last_ts": pd.Series(dtype="datetime64[us]"),
                "n_events": pd.Series(dtype="int64")})
        df = df.sort_values(["user_id", "ts", "event_id"])
        chg = ((df["event_type"] != df["event_type"].shift())
               | (df["user_id"] != df["user_id"].shift())).to_numpy()
        # the cumsum restarts per user: subtract the run count carried
        # in from earlier users (run index is 1-based within user)
        glob = np.cumsum(chg).astype(np.int64)
        d = df.assign(glob=glob)
        base = d.groupby("user_id", sort=False)["glob"] \
            .transform("min").to_numpy()
        d["run"] = d["glob"].to_numpy() - base + 1
        g = d.groupby(["user_id", "run"], sort=True)
        out = g.agg(event_type=("event_type", "first"),
                    first_ts=("ts", "min"), last_ts=("ts", "max"),
                    n_events=("event_id", "size")).reset_index()
        return out

    out = grouped_apply(ds, ["user_id"], runs_block).to_pandas()
    out["user_id"] = out["user_id"].astype("int64")
    out["run"] = out["run"].astype("int64")
    out["n_events"] = out["n_events"].astype("int64")
    return out[["user_id", "run", "event_type", "first_ts", "last_ts",
                "n_events"]] \
        .sort_values(["user_id", "run"]).reset_index(drop=True)


def q_events_chi2(sf_dir: str):
    """Chi-square independence audit of event_type × hour-of-day: ONE
    combiner-reduced grid aggregate is the only pass over the data;
    marginals and the (observed−expected)²/expected contributions are
    computed on the tiny types×24 grid. The corpus-health question
    'does traffic mix shift by hour?' as a single-shuffle operator."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_type", "ts"])

    def hour(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"event_type": df["event_type"],
                             "hr": df["ts"].dt.hour.astype("int64")})

    grid = grouped_aggregate(ds.map_batches(hour, batch_format="pandas"),
                             ["event_type", "hr"],
                             {"obs": (None, "count")}).to_pandas()
    grid["obs"] = grid["obs"].astype("int64")
    r = grid.groupby("event_type")["obs"].transform("sum") \
        .to_numpy(np.float64)
    c = grid.groupby("hr")["obs"].transform("sum").to_numpy(np.float64)
    n = float(grid["obs"].sum())
    e = r * c / n
    o = grid["obs"].to_numpy(np.float64)
    grid["expected"] = np.round(e, 6)
    grid["contrib"] = np.round((o - e) * (o - e) / e, 6)
    return grid[["event_type", "hr", "obs", "expected", "contrib"]] \
        .sort_values(["event_type", "hr"]).reset_index(drop=True)


def q_user_event_paths(sf_dir: str):
    """Per-user ordered event-type path string (clickstream
    sequence materialization): one user co-location, vectorized
    in-block sort + join — the feature a sequence-mining or
    next-event model trains on."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "ts", "user_id",
                                     "event_type"])

    def paths(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                                 "path": pd.Series(dtype="object")})
        d = df.sort_values(["user_id", "ts", "event_id"])
        out = d.groupby("user_id", sort=False)["event_type"] \
            .agg(">".join).reset_index(name="path")
        return out

    out = grouped_apply(ds, ["user_id"], paths).to_pandas()
    out["user_id"] = out["user_id"].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


def q_user_coverage(sf_dir: str):
    """Per-user activity coverage: union of [ts, ts+300 s) intervals
    merged into islands (overlap-merge via running-max of interval
    ends), reporting island count and total covered seconds — the
    interval-union operator behind uptime/abuse-rate metrics."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["ts", "user_id"])
    width_us = 300 * 1_000_000

    def cover(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({
                "user_id": pd.Series(dtype="int64"),
                "n_islands": pd.Series(dtype="int64"),
                "covered_sec": pd.Series(dtype="int64")})
        d = df.sort_values(["user_id", "ts"])
        s = d["ts"].astype("int64").to_numpy()          # µs since epoch
        e = s + width_us
        uid = d["user_id"].to_numpy()
        newu = np.concatenate(([True], uid[1:] != uid[:-1]))
        # running max of e over the user's PREVIOUS intervals: per-user
        # cummax, shifted one row (users are contiguous after the sort,
        # so the global shift only leaks across user boundaries — and
        # those rows are forced open below)
        pmax = pd.Series(e).groupby(pd.Series(uid).values) \
            .cummax().shift().to_numpy()
        pmax[newu] = -np.inf
        island_open = s > pmax
        isl = np.cumsum(island_open)
        g = pd.DataFrame({"user_id": uid, "isl": isl, "s": s, "e": e}) \
            .groupby(["user_id", "isl"], sort=True) \
            .agg(lo=("s", "min"), hi=("e", "max")).reset_index()
        cov = ((g["hi"] - g["lo"]) // 1_000_000).astype("int64")
        out = g.assign(cov=cov).groupby("user_id", sort=True) \
            .agg(n_islands=("isl", "size"), covered_sec=("cov", "sum")) \
            .reset_index()
        return out.astype({"user_id": "int64", "n_islands": "int64",
                           "covered_sec": "int64"})

    out = grouped_apply(ds, ["user_id"], cover).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def q_events_trimmed_mean(sf_dir: str):
    """10–90 % trimmed (winsor-bounded) mean of value per event_type —
    robust central tendency: exact distributed per-group quantiles
    (``ops/quantiles.grouped_quantiles``, three shuffle-free passes)
    give the bounds, then ONE filtered combiner aggregate computes the
    in-bounds mean. No sort, no per-group scan."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.ops.quantiles import grouped_quantiles
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_type", "value"])
    qs = grouped_quantiles(ds, "event_type", "value", [0.1, 0.9])
    lo = qs[qs["q"] == 0.1].set_index("event_type")["value"].to_dict()
    hi = qs[qs["q"] == 0.9].set_index("event_type")["value"].to_dict()

    def inb(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value"].to_numpy(np.float64)
        l = df["event_type"].map(lo).to_numpy(np.float64)
        h = df["event_type"].map(hi).to_numpy(np.float64)
        keep = (v >= l) & (v <= h)
        return df[keep]

    out = grouped_aggregate(
        ds.map_batches(inb, batch_format="pandas"),
        ["event_type"],
        {"n": (None, "count"), "s": ("value", "sum")}).to_pandas()
    out["trimmed_mean"] = (out["s"] / out["n"]).round(6)
    out["n"] = out["n"].astype("int64")
    return out[["event_type", "n", "trimmed_mean"]] \
        .sort_values("event_type").reset_index(drop=True)


def q_user_twap(sf_dir: str):
    """Per-user time-weighted average value (TWAP): each event's value
    weighted by the exact microseconds until the user's next event
    (last event carries no weight) — the time-series aggregate where
    plain AVG is wrong whenever sampling is irregular. Single-user
    events (no interval) and all-zero spans are excluded on both
    sides."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "ts", "user_id",
                                     "value"])

    def twap(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                              "twap": pd.Series(dtype="float64")})
        if df.empty:
            return empty
        d = df.sort_values(["user_id", "ts", "event_id"])
        t = d["ts"].astype("int64").to_numpy()
        uid = d["user_id"].to_numpy()
        dt = np.concatenate((t[1:] - t[:-1], [0])).astype(np.float64)
        last = np.concatenate((uid[1:] != uid[:-1], [True]))
        dt[last] = 0.0
        w = d["value"].to_numpy(np.float64) * dt
        g = pd.DataFrame({"user_id": uid, "w": w, "dt": dt}) \
            .groupby("user_id", sort=True).sum().reset_index()
        g = g[g["dt"] > 0]
        if g.empty:
            return empty
        return pd.DataFrame({"user_id": g["user_id"].astype("int64"),
                             "twap": (g["w"] / g["dt"]).round(6)})

    out = grouped_apply(ds, ["user_id"], twap).to_pandas()
    out["user_id"] = out["user_id"].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


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


def q_events_rolling_median(sf_dir: str):
    """Exact rolling median of value per user over the current + 4
    preceding events — the robust smoother (rank statistics resist the
    spikes a moving average chases). One user co-location, then
    pandas' O(w·log w) rolling-median kernel per block; both sides
    midpoint-interpolate even windows, so the doubles agree
    bit-for-bit before the 6-decimal rounding."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "ts", "user_id",
                                     "value"])

    def med(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                                 "med5": pd.Series(dtype="float64")})
        d = df.sort_values(["user_id", "ts", "event_id"])
        m = d.groupby("user_id", sort=False)["value"] \
            .rolling(5, min_periods=1).median() \
            .reset_index(drop=True).to_numpy()
        return pd.DataFrame({"event_id": d["event_id"].to_numpy(),
                             "med5": np.round(m, 6)})

    out = grouped_apply(ds, ["user_id"], med).to_pandas()
    out["event_id"] = out["event_id"].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


def q_events_since_anchor(sf_dir: str):
    """Per-event microseconds since the user's most recent 'purchase'
    (at or before the event) — the recency feature of every
    feature-engineering pipeline, computed as a per-user forward fill
    of anchor timestamps after one co-location. Events with no prior
    purchase are excluded on both sides (no NULL rows to hash)."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "ts", "user_id",
                                     "event_type"])

    def since(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                              "user_id": pd.Series(dtype="int64"),
                              "since_us": pd.Series(dtype="int64")})
        if df.empty:
            return empty
        d = df.sort_values(["user_id", "ts", "event_id"])
        t = d["ts"].astype("int64")
        anchor = t.where(d["event_type"].to_numpy() == "purchase") \
            .groupby(d["user_id"].to_numpy()).ffill()
        keep = anchor.notna().to_numpy()
        if not keep.any():
            return empty
        return pd.DataFrame({
            "event_id": d["event_id"].to_numpy()[keep],
            "user_id": d["user_id"].to_numpy()[keep],
            "since_us": (t.to_numpy()[keep]
                         - anchor.to_numpy()[keep].astype(np.int64))})

    out = grouped_apply(ds, ["user_id"], since).to_pandas()
    for c in ("event_id", "user_id", "since_us"):
        out[c] = out[c].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


def q_revenue_cube(sf_dir: str):
    """Order revenue by CUBE(region, nation): all four grouping sets
    in one result, 'ALL' marking the collapsed level. Same scale shape
    as the ROLLUP decomposition — one distributed combiner aggregate
    at the finest level, every coarser set re-aggregated from that
    dimension-bounded result."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.functions.join import broadcast_join
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()

    def _read(t, cols):
        return read_parquet_sized(f"{sf_dir}/{t}.parquet", columns=cols)

    orders = _read("orders", ["o_custkey", "o_totalprice"])
    cust = _read("customer", ["c_custkey", "c_nationkey"]).to_pandas()
    nation = _read("nation",
                   ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = _read("region", ["r_regionkey", "r_name"]).to_pandas()
    dim = (cust.merge(nation, left_on="c_nationkey",
                      right_on="n_nationkey")
               .merge(reg, left_on="n_regionkey",
                      right_on="r_regionkey")
           [["c_custkey", "n_name", "r_name"]])
    j = broadcast_join(orders, dim, left_on="o_custkey",
                       right_on="c_custkey")
    finest = grouped_aggregate(j, ["r_name", "n_name"],
                               {"revenue": ("o_totalprice", "sum")}) \
        .to_pandas()
    by_r = finest.groupby("r_name", as_index=False)["revenue"].sum()
    by_r["n_name"] = "ALL"
    by_n = finest.groupby("n_name", as_index=False)["revenue"].sum()
    by_n["r_name"] = "ALL"
    total = pd.DataFrame({"r_name": ["ALL"], "n_name": ["ALL"],
                          "revenue": [finest["revenue"].sum()]})
    out = pd.concat([finest, by_r[["r_name", "n_name", "revenue"]],
                     by_n[["r_name", "n_name", "revenue"]], total],
                    ignore_index=True)
    out["revenue"] = out["revenue"].round(2)
    return out.sort_values(["r_name", "n_name"]).reset_index(drop=True)


def dedup_component_sizes(sf_dir: str):
    """Near-dup cluster-size histogram — the release-audit view of the
    dedup graph (how much of the corpus sits in 2-clusters vs one
    giant blob): component sizes from the BSP closure, then a
    two-level count-of-counts. Inherits dedup_components' LSH recall
    caveat."""
    comp = dedup_components(sf_dir)
    if comp.empty:
        return pd.DataFrame({"size": pd.Series(dtype="int64"),
                             "n_components": pd.Series(dtype="int64")})
    sizes = comp.groupby("component").size()
    out = sizes.value_counts().sort_index().reset_index()
    out.columns = ["size", "n_components"]
    return out.astype({"size": "int64", "n_components": "int64"}) \
        .reset_index(drop=True)


def q_events_top_trigrams(sf_dir: str):
    """Sequential pattern mining lite: corpus-wide counts of
    consecutive event-type TRIPLES per user timeline, top 20 with a
    full lexicographic tie-break. One user co-location, vectorized
    shift-explode (no per-row loop), combiner-reduced counts (≤
    |types|³ rows), driver top-k on the tiny result."""
    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "ts", "user_id",
                                     "event_type"])

    def tri(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"t1": pd.Series(dtype="object"),
                              "t2": pd.Series(dtype="object"),
                              "t3": pd.Series(dtype="object")})
        if df.empty:
            return empty
        d = df.sort_values(["user_id", "ts", "event_id"])
        t = d["event_type"].to_numpy()
        u = d["user_id"].to_numpy()
        if len(d) < 3:
            return empty
        same = (u[:-2] == u[1:-1]) & (u[1:-1] == u[2:])
        return pd.DataFrame({"t1": t[:-2][same], "t2": t[1:-1][same],
                             "t3": t[2:][same]})

    tris = grouped_apply(ds, ["user_id"], tri)
    counts = grouped_aggregate(tris, ["t1", "t2", "t3"],
                               {"n": (None, "count")}).to_pandas()
    counts["n"] = counts["n"].astype("int64")
    out = counts.sort_values(["n", "t1", "t2", "t3"],
                             ascending=[False, True, True, True]) \
        .head(20)
    return out[["t1", "t2", "t3", "n"]].reset_index(drop=True)


def doc_source_gini(sf_dir: str):
    """Per-source Gini coefficient of document token counts — the
    concentration audit ('is one source's length distribution
    dominated by a few giants?') — via the rank formula
    G = 2·Σ i·x₍ᵢ₎ / (n·Σx) − (n+1)/n. Sources are bounded, so one
    hash co-location puts each source's lengths in one block; runs of
    equal lengths make the formula order-invariant within ties."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["source", "text"])

    def lengths(df: pd.DataFrame) -> pd.DataFrame:
        n = df["text"].fillna("").str.split().str.len() \
            .to_numpy(np.int64)
        return pd.DataFrame({"source": df["source"], "x": n})

    def gini(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"source": pd.Series(dtype="object"),
                                 "gini": pd.Series(dtype="float64")})
        rows = []
        for src, g in df.groupby("source", sort=False):
            x = np.sort(g["x"].to_numpy(np.float64))
            n = len(x)
            s = x.sum()
            val = 0.0 if s == 0 or n == 0 else \
                2.0 * float(np.arange(1, n + 1) @ x) / (n * s) \
                - (n + 1.0) / n
            rows.append((src, round(val, 6)))
        return pd.DataFrame(rows, columns=["source", "gini"])

    out = grouped_apply(ds.map_batches(lengths, batch_format="pandas"),
                        ["source"], gini).to_pandas()
    return out.sort_values("source").reset_index(drop=True)


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


def q_user_streaks(sf_dir: str):
    """Longest consecutive-day activity streak per user (plus total
    active days) — the gaps-and-islands idiom on the DATE axis: one
    user co-location, distinct epoch-days, the day−rank island key,
    vectorized run-length reduction."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["ts", "user_id"])

    def streaks(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({
                "user_id": pd.Series(dtype="int64"),
                "max_streak": pd.Series(dtype="int64"),
                "n_active_days": pd.Series(dtype="int64")})
        day = (df["ts"].astype("int64") // 86_400_000_000).to_numpy()
        d = pd.DataFrame({"user_id": df["user_id"].to_numpy(),
                          "day": day}).drop_duplicates() \
            .sort_values(["user_id", "day"])
        u = d["user_id"].to_numpy()
        dy = d["day"].to_numpy()
        rn = d.groupby("user_id", sort=False).cumcount().to_numpy()
        isl = dy - rn                       # constant within a run
        runs = pd.DataFrame({"user_id": u, "isl": isl}) \
            .groupby(["user_id", "isl"], sort=False).size() \
            .reset_index(name="len")
        out = runs.groupby("user_id", sort=True) \
            .agg(max_streak=("len", "max"),
                 n_active_days=("len", "sum")).reset_index()
        return out.astype({"user_id": "int64", "max_streak": "int64",
                           "n_active_days": "int64"})

    out = grouped_apply(ds, ["user_id"], streaks).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def q_events_rolling_dau7(sf_dir: str):
    """Trailing-7-day distinct active users per observed day — the
    rolling-DAU dashboard series, windowed-distinct made
    shuffle-friendly: dedup (day, user) once (combiner), EXPLODE each
    active day to the 7 days it contributes to (vectorized repeat),
    dedup (target_day, user) again, count per day, keep observed
    days (broadcast day set — bounded by the calendar)."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["ts", "user_id"])

    def day_user(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "day": (df["ts"].astype("int64")
                    // 86_400_000_000).to_numpy(),
            "user_id": df["user_id"].to_numpy()}).drop_duplicates()

    du = grouped_aggregate(
        ds.map_batches(day_user, batch_format="pandas"),
        ["day", "user_id"], {"n": (None, "count")}).materialize()
    # observed-day filter: calendar-bounded, safe to broadcast
    day_arr = np.sort(grouped_aggregate(
        du, ["day"], {"n": (None, "count")}).to_pandas()["day"]
        .to_numpy(np.int64))

    def explode7(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"day": pd.Series(dtype="int64"),
                                 "user_id": pd.Series(dtype="int64")})
        d = np.repeat(df["day"].to_numpy(np.int64), 7) \
            + np.tile(np.arange(7, dtype=np.int64), len(df))
        u = np.repeat(df["user_id"].to_numpy(np.int64), 7)
        keep = np.isin(d, day_arr)
        return pd.DataFrame({"day": d[keep], "user_id": u[keep]}) \
            .drop_duplicates()

    contrib = grouped_aggregate(
        du.map_batches(explode7, batch_format="pandas"),
        ["day", "user_id"], {"n": (None, "count")})
    out = grouped_aggregate(contrib, ["day"],
                            {"dau7": (None, "count")}).to_pandas()
    out["day"] = pd.to_datetime(out["day"] * 86_400_000_000,
                                unit="us").dt.date.astype(str)
    out["dau7"] = out["dau7"].astype("int64")
    return out.sort_values("day").reset_index(drop=True)


def q_referential_integrity(sf_dir: str):
    """Distributed referential-integrity audit, fact-vs-fact (neither
    side broadcastable at scale): tag each table's keyed rows, ONE
    hash co-location per check aggregates (rows_left, rows_right) per
    key, and tiny per-block partials reduce to the orphan counts —
    lineitem rows with no parent order, orders with no lineitems, and
    events whose user is absent from customer."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()

    def _tag(path, col, side):
        ds = read_parquet_sized(path, columns=[col])
        return ds.map_batches(
            lambda df, c=col, s=side: pd.DataFrame(
                {"k": df[c].to_numpy(np.int64),
                 "nl": np.int64(1 if s == "l" else 0),
                 "nr": np.int64(1 if s == "r" else 0)}),
            batch_format="pandas")

    def orphans(left_path, left_col, right_path, right_col):
        tagged = _tag(left_path, left_col, "l") \
            .union(_tag(right_path, right_col, "r"))
        per_key = grouped_aggregate(tagged, ["k"],
                                    {"nl": ("nl", "sum"),
                                     "nr": ("nr", "sum")})
        parts = per_key.map_batches(
            lambda df: pd.DataFrame({
                "lo": [int(df.loc[df["nr"] == 0, "nl"].sum())],
                "ro": [int((df["nl"] == 0).mul(df["nr"] > 0).sum())]}),
            batch_format="pandas").to_pandas()
        return int(parts["lo"].sum()), int(parts["ro"].sum())

    li_orph, ord_childless = orphans(
        f"{sf_dir}/lineitem.parquet", "l_orderkey",
        f"{sf_dir}/orders.parquet", "o_orderkey")
    ev_orph, _ = orphans(f"{sf_dir}/events.parquet", "user_id",
                         f"{sf_dir}/customer.parquet", "c_custkey")
    out = pd.DataFrame({
        "check_name": ["event_user_orphans", "lineitem_orphans",
                       "orders_childless"],
        "n": [ev_orph, li_orph, ord_childless]})
    out["n"] = out["n"].astype("int64")
    return out


def q_part_clustering(sf_dir: str):
    """Local clustering coefficient per node of the co-purchase graph
    — cc(v) = 2·T(v)/(deg(v)·(deg(v)−1)) — composing the
    degree-ordered triangle operator with a distinct-edge degree
    count; nodes in zero triangles keep cc = 0 (left join, not an
    inner join that would silently drop them)."""
    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply
    from jerex_ray.ops.graph import triangle_counts
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    li = read_parquet_sized(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey"])

    def pairs_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"a": pd.Series(dtype="int64"),
                                 "b": pd.Series(dtype="int64")})
        d = df.drop_duplicates(["l_orderkey", "l_partkey"])
        m = d.merge(d, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        return pd.DataFrame({"a": m["l_partkey_x"].to_numpy(),
                             "b": m["l_partkey_y"].to_numpy()})

    raw = grouped_apply(li, ["l_orderkey"], pairs_block)
    edges = grouped_aggregate(raw, ["a", "b"],
                              {"n": (None, "count")}).materialize()

    def endpoints(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "a" not in df.columns:
            return pd.DataFrame({"node": pd.Series(dtype="int64")})
        return pd.DataFrame({"node": np.concatenate(
            [df["a"].to_numpy(np.int64), df["b"].to_numpy(np.int64)])})

    deg = grouped_aggregate(
        edges.map_batches(endpoints, batch_format="pandas"),
        ["node"], {"degree": (None, "count")}).to_pandas()
    tri = triangle_counts(edges, src="a", dst="b").to_pandas()
    out = deg.merge(tri, on="node", how="left")
    out["n_triangles"] = out["n_triangles"].fillna(0).astype("int64")
    out = out[out["degree"] >= 2]
    d = out["degree"].to_numpy(np.float64)
    out["cc"] = np.round(2.0 * out["n_triangles"].to_numpy(np.float64)
                         / (d * (d - 1.0)), 6)
    out["node"] = out["node"].astype("int64")
    out["degree"] = out["degree"].astype("int64")
    return out[["node", "degree", "n_triangles", "cc"]] \
        .sort_values("node").reset_index(drop=True)


def q_events_hourly_autocorr(sf_dir: str):
    """Lag-1 autocorrelation of the hourly event-count series ('is
    this hour's load predicted by the last?'): the combiner hourly
    aggregate is the only corpus pass; the calendar-bounded series
    shifts and correlates on the driver. Gaps (hours with zero
    events) follow observed-hours semantics on both sides."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["ts"])

    def hour(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"hr": df["ts"].dt.floor("h")})

    h = grouped_aggregate(ds.map_batches(hour, batch_format="pandas"),
                          ["hr"], {"n": (None, "count")}).to_pandas() \
        .sort_values("hr")
    x = h["n"].to_numpy(np.float64)
    n_pairs = max(len(x) - 1, 0)
    if n_pairs < 2:
        r = float("nan")
    else:
        r = float(np.corrcoef(x[1:], x[:-1])[0, 1])
    return pd.DataFrame({"n_pairs": pd.array([n_pairs], dtype="int64"),
                         "autocorr_lag1": [round(r, 6)]})


def doc_source_vocab_jaccard(sf_dir: str):
    """Pairwise vocabulary Jaccard between sources — the corpus
    comparison behind domain-mixing decisions ('how lexically close
    are these two crawls?'). Distinct (source, word) via one combiner
    aggregate, per-word source-pair explode after a word co-location
    (pairs per word are bounded by |sources|²), pair counts reduced by
    a second combiner; vocabulary sizes join on the driver
    (|sources| rows)."""
    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["source", "text"])

    def words(df: pd.DataFrame) -> pd.DataFrame:
        w = df["text"].fillna("").str.lower().str.split()
        lens = w.str.len().fillna(0).to_numpy(np.int64)
        if lens.sum() == 0:
            return pd.DataFrame({"source": pd.Series(dtype="object"),
                                 "w": pd.Series(dtype="object")})
        flat = np.concatenate([v for v in w.to_numpy() if v])
        src = np.repeat(df["source"].to_numpy(), lens)
        return pd.DataFrame({"source": src, "w": flat}) \
            .drop_duplicates()

    ws = grouped_aggregate(ds.map_batches(words, batch_format="pandas"),
                           ["source", "w"],
                           {"n": (None, "count")}).materialize()
    vocab = grouped_aggregate(ws, ["source"],
                              {"c": (None, "count")}).to_pandas() \
        .set_index("source")["c"].to_dict()

    def mate(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"source_a": pd.Series(dtype="object"),
                              "source_b": pd.Series(dtype="object")})
        if df.empty or "w" not in df.columns:
            return empty
        d = df[["source", "w"]]
        m = d.merge(d, on="w")
        m = m[m["source_x"] < m["source_y"]]
        if m.empty:
            return empty
        return pd.DataFrame({"source_a": m["source_x"].to_numpy(),
                             "source_b": m["source_y"].to_numpy()})

    pairs = grouped_apply(ws, ["w"], mate)
    inter = grouped_aggregate(pairs, ["source_a", "source_b"],
                              {"shared": (None, "count")}).to_pandas()
    if inter.empty or "source_a" not in inter.columns:
        return pd.DataFrame({"source_a": pd.Series(dtype="object"),
                             "source_b": pd.Series(dtype="object"),
                             "shared": pd.Series(dtype="int64"),
                             "jaccard": pd.Series(dtype="float64")})
    i = inter["shared"].to_numpy(np.float64)
    ca = inter["source_a"].map(vocab).to_numpy(np.float64)
    cb = inter["source_b"].map(vocab).to_numpy(np.float64)
    inter["jaccard"] = np.round(i / (ca + cb - i), 6)
    inter["shared"] = inter["shared"].astype("int64")
    return inter[["source_a", "source_b", "shared", "jaccard"]] \
        .sort_values(["source_a", "source_b"]).reset_index(drop=True)


def q_user_entry_exit(sf_dir: str):
    """Entry/exit analysis: each user's first and last event (type and
    value) under the total (ts, event_id) order — the arg_min/arg_max
    pair per group, one co-location and a vectorized head/tail pick
    per user run."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "ts", "user_id",
                                     "event_type", "value"])

    def firstlast(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({
                "user_id": pd.Series(dtype="int64"),
                "first_type": pd.Series(dtype="object"),
                "first_value": pd.Series(dtype="float64"),
                "last_type": pd.Series(dtype="object"),
                "last_value": pd.Series(dtype="float64")})
        d = df.sort_values(["user_id", "ts", "event_id"])
        g = d.groupby("user_id", sort=True)
        f = g.nth(0)
        l = g.nth(-1)
        return pd.DataFrame({
            "user_id": f["user_id"].to_numpy(np.int64),
            "first_type": f["event_type"].to_numpy(),
            "first_value": f["value"].to_numpy(np.float64),
            "last_type": l["event_type"].to_numpy(),
            "last_value": l["value"].to_numpy(np.float64)})

    out = grouped_apply(ds, ["user_id"], firstlast).to_pandas()
    out["user_id"] = out["user_id"].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


def q_events_type_lift(sf_dir: str):
    """Market-basket lift between event types over user-day baskets —
    lift(A,B) = P(A,B)/(P(A)·P(B)) — association strength the
    recommender/anomaly teams read. Distinct (user, day, type) via one
    combiner, within-basket pair explode after a basket co-location
    (pairs per basket ≤ |types|²), counts reduced again; the |types|²
    lift table finishes on the driver."""
    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["ts", "user_id", "event_type"])

    def basket(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(),
            "day": (df["ts"].astype("int64")
                    // 86_400_000_000).to_numpy(),
            "t": df["event_type"].to_numpy()}).drop_duplicates()

    b = grouped_aggregate(ds.map_batches(basket, batch_format="pandas"),
                          ["user_id", "day", "t"],
                          {"n": (None, "count")}).materialize()
    n_baskets = int(grouped_aggregate(
        b, ["user_id", "day"], {"n": (None, "count")}).count())
    tcnt = grouped_aggregate(b, ["t"], {"c": (None, "count")}) \
        .to_pandas().set_index("t")["c"].to_dict()

    def mate(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"ta": pd.Series(dtype="object"),
                              "tb": pd.Series(dtype="object")})
        if df.empty or "t" not in df.columns:
            return empty
        d = df[["user_id", "day", "t"]]
        m = d.merge(d, on=["user_id", "day"])
        m = m[m["t_x"] < m["t_y"]]
        if m.empty:
            return empty
        return pd.DataFrame({"ta": m["t_x"].to_numpy(),
                             "tb": m["t_y"].to_numpy()})

    pairs = grouped_apply(b, ["user_id", "day"], mate)
    ab = grouped_aggregate(pairs, ["ta", "tb"],
                           {"n_ab": (None, "count")}).to_pandas()
    if ab.empty or "ta" not in ab.columns:
        return pd.DataFrame({"ta": pd.Series(dtype="object"),
                             "tb": pd.Series(dtype="object"),
                             "n_ab": pd.Series(dtype="int64"),
                             "lift": pd.Series(dtype="float64")})
    na = ab["ta"].map(tcnt).to_numpy(np.float64)
    nb = ab["tb"].map(tcnt).to_numpy(np.float64)
    ab["lift"] = np.round(ab["n_ab"].to_numpy(np.float64) * n_baskets
                          / (na * nb), 6)
    ab["n_ab"] = ab["n_ab"].astype("int64")
    return ab[["ta", "tb", "n_ab", "lift"]] \
        .sort_values(["ta", "tb"]).reset_index(drop=True)


def q_part_abc(sf_dir: str):
    """ABC (Pareto 80/15/5) classification of parts by revenue — the
    inventory-policy classic — with the cumulative revenue computed as
    a DISTRIBUTED exclusive prefix sum in EXACT integer cents (2-dp
    money → int64, so Ray's partial-sum order and SQL's window cumsum
    agree bit-for-bit and the 0.80/0.95 thresholds are exact integer
    comparisons, no float-boundary hazard): revenue per part (one
    combiner), exact-quantile range buckets over the per-part table,
    per-bucket sums → offsets, in-bucket sort + cumsum. Descending
    order is the reversed ascending (cents ASC, partkey DESC) order,
    so cum_desc = total − cum_asc_exclusive."""
    import ray

    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply
    from jerex_ray.ops.quantiles import distributed_quantiles
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    li = read_parquet_sized(f"{sf_dir}/lineitem.parquet",
                            columns=["l_partkey", "l_extendedprice"])

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_partkey": df["l_partkey"].to_numpy(np.int64),
            "cents": np.round(df["l_extendedprice"].to_numpy(np.float64)
                              * 100).astype(np.int64)})

    pr = grouped_aggregate(li.map_batches(cents, batch_format="pandas"),
                           ["l_partkey"],
                           {"cents": ("cents", "sum")}).materialize()

    n_buckets = 32
    qs = [i / n_buckets for i in range(1, n_buckets)]
    pivots = np.unique(np.asarray(
        distributed_quantiles(pr, "cents", qs), dtype=np.float64))
    piv_ref = ray.put(pivots)

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        p = ray.get(piv_ref)
        out = df.copy()
        out["__b"] = np.searchsorted(
            p, df["cents"].to_numpy(np.float64), side="left") \
            .astype(np.int64)
        return out

    bucketed = pr.map_batches(with_bucket,
                              batch_format="pandas").materialize()
    bsum = grouped_aggregate(bucketed, ["__b"],
                             {"s": ("cents", "sum")}).to_pandas() \
        .sort_values("__b")
    tot = int(bsum["s"].sum())
    offs = dict(zip(bsum["__b"].astype(int),
                    np.concatenate(([0],
                        np.cumsum(bsum["s"].to_numpy(np.int64))[:-1]))))
    off_ref = ray.put(offs)

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "__b" not in df.columns:
            return pd.DataFrame({
                "l_partkey": pd.Series(dtype="int64"),
                "cents": pd.Series(dtype="int64"),
                "cum_cents": pd.Series(dtype="int64"),
                "abc_class": pd.Series(dtype="object")})
        o = ray.get(off_ref)
        outs = []
        for bk, g in df.groupby("__b", sort=False):
            # ascending = reversed descending: cents ASC, partkey DESC
            g = g.sort_values(["cents", "l_partkey"],
                              ascending=[True, False])
            c = g["cents"].to_numpy(np.int64)
            asc_excl = int(o[int(bk)]) \
                + np.concatenate(([0], np.cumsum(c)[:-1]))
            cum = tot - asc_excl          # inclusive, in DESC order
            cls = np.where(cum * 10 <= tot * 8, "A",
                           np.where(cum * 20 <= tot * 19, "B", "C"))
            outs.append(pd.DataFrame({
                "l_partkey": g["l_partkey"].to_numpy(np.int64),
                "cents": c, "cum_cents": cum, "abc_class": cls}))
        return pd.concat(outs, ignore_index=True)

    out = grouped_apply(bucketed, ["__b"], classify).to_pandas()
    for c in ("l_partkey", "cents", "cum_cents"):
        out[c] = out[c].astype("int64")
    return out.sort_values("l_partkey").reset_index(drop=True)


def emb_mmr_select(sf_dir: str):
    """Maximal Marginal Relevance diverse top-10 (λ=0.7) against the
    vec-0 query — k streaming argmax passes, selected set broadcast,
    winner's vector carried back with the block partial. Rows-only:
    the greedy recurrence is sequential by definition (like BPE
    merges); brute-force parity is pytest-gated
    (test_mmr_matches_bruteforce)."""
    from jerex_ray.ops.ann import mmr_select
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    emb = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"]) \
        .materialize()
    qrow = emb.map_batches(
        lambda df: df[df["vec_id"] == 0], batch_format="pandas") \
        .to_pandas()
    q = np.asarray(list(qrow["embedding"].iloc[0]), np.float64)
    return mmr_select(emb, q, k=10, lam=0.7)


def doc_source_kl(sf_dir: str):
    """Per-source KL divergence (bits) from each source's smoothed
    unigram distribution to the corpus distribution — mixture-health
    scan. Engine uses the closed-form missing-mass identity (no
    source×vocab cross product); the oracle brute-forces the full
    grid in SQL. Both exact; 6-decimal parity."""
    from jerex_ray.ops.textstats import source_kl
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["source", "text"])
    return source_kl(ds)


def q_orders_benford_shares(sf_dir: str):
    """Benford first-digit audit of order totals, share flavor
    (digit share vs the log10(1+1/d) probability; the chi-square
    decomposition lives in ``q_orders_benford``). Digit extracted from the EXACT
    fixed-point integer rendering (never float log10 — the one place
    engines can disagree at power-of-ten boundaries). One combiner
    pass, 9-row result, SQL-oracled."""
    from jerex_ray.ops.validate import benford_digits
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/orders.parquet",
                            columns=["o_totalprice"])
    return benford_digits(ds, "o_totalprice")


def q_orders_profile(sf_dir: str):
    """Schema-profiling pass over orders (row count, exact distinct
    count, min/max per column) from ONE explode + ONE shuffle shared
    by all profiled columns. String/int columns only (floats belong
    in the moments/quantile operators). SQL-oracled per column."""
    from jerex_ray.ops.validate import profile_columns
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    cols = ["o_custkey", "o_orderstatus", "o_orderpriority"]
    ds = read_parquet_sized(f"{sf_dir}/orders.parquet", columns=cols)
    return profile_columns(ds, cols)


def doc_hybrid_rrf(sf_dir: str):
    """Hybrid retrieval by reciprocal-rank fusion (Cormack, Clarke &
    Buettcher SIGIR'09): BM25 lexical ranks fused with dense cosine
    ranks as Σ 1/(60+r), top-10. The retrievers run distributed
    (combiner BM25 stats + one scoring pass; broadcast query vector +
    per-block float64 matmul), each reduced by block-local →
    single-block exact top-100 on (ROUNDED score DESC, id) — rounding
    BEFORE ranking makes the cut deterministic across engines (both
    sides agree at 6 decimals, so rounded ties break by id
    identically). Only the two 100-row lists reach the driver. The
    synthetic tables pair row-wise (vec_id ≡ doc_id). Rank 0 encodes
    'absent from that retriever's top-100'."""
    from jerex_ray.ops.bm25 import bm25_scores
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    L, K, topn = 100, 60, 10
    docs = read_parquet_sized(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text"])
    emb = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"])

    def lex_head(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "s": pd.Series(dtype="float64")})
        if "score" in df.columns:
            out = pd.DataFrame({"doc_id": df["doc_id"].to_numpy(),
                                "s": df["score"].round(6).to_numpy()})
        else:
            out = df
        return out.sort_values(["s", "doc_id"],
                               ascending=[False, True]).head(L)

    lex = bm25_scores(docs, ["spark join fast"]) \
        .map_batches(lex_head, batch_format="pandas", batch_size=None) \
        .repartition(1) \
        .map_batches(lex_head, batch_format="pandas",
                     batch_size=None).to_pandas()

    qrow = emb.map_batches(
        lambda df: df[df["vec_id"] == 0], batch_format="pandas") \
        .to_pandas()
    qv = np.asarray(list(qrow["embedding"].iloc[0]), np.float64)
    qv = qv / np.linalg.norm(qv)
    import ray
    qref = ray.put(qv)

    def dense_head(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "s": pd.Series(dtype="float64")})
        if "embedding" in df.columns:
            m = np.stack([np.asarray(v, np.float64)
                          for v in df["embedding"].to_numpy()])
            m = m / np.linalg.norm(m, axis=1, keepdims=True)
            s = (m @ ray.get(qref)).round(6)
            out = pd.DataFrame({"doc_id": df["vec_id"].to_numpy(), "s": s})
        else:
            out = df
        return out.sort_values(["s", "doc_id"],
                               ascending=[False, True]).head(L)

    dense = emb.map_batches(dense_head, batch_format="pandas",
                            batch_size=4096) \
        .repartition(1) \
        .map_batches(dense_head, batch_format="pandas",
                     batch_size=None).to_pandas()

    for df in (lex, dense):
        df.sort_values(["s", "doc_id"], ascending=[False, True],
                       inplace=True)
        df["r"] = np.arange(1, len(df) + 1)
    fused = lex[["doc_id", "r"]].rename(columns={"r": "r_lex"}) \
        .merge(dense[["doc_id", "r"]].rename(columns={"r": "r_dense"}),
               on="doc_id", how="outer")
    fused = fused.fillna(0).astype({"r_lex": "int64",
                                    "r_dense": "int64",
                                    "doc_id": "int64"})
    contrib = np.where(fused["r_lex"] > 0,
                       1.0 / (K + fused["r_lex"]), 0.0) \
        + np.where(fused["r_dense"] > 0,
                   1.0 / (K + fused["r_dense"]), 0.0)
    fused["rrf"] = np.round(contrib, 6)
    return fused.sort_values(["rrf", "doc_id"],
                             ascending=[False, True]).head(topn) \
        [["doc_id", "r_lex", "r_dense", "rrf"]].reset_index(drop=True)


def q_events_unpivot(sf_dir: str):
    """Pivot → UNPIVOT roundtrip: the per-user wide count matrix
    (conditional aggregation) melts back to long form through the
    streaming ``relational.melt`` reshape (row-local, no shuffle).
    Zero cells survive the roundtrip, so the oracle is the users ×
    types cross join with coalesced counts."""
    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply
    from jerex_ray.relational import melt
    from jerex_ray.runtime import read_parquet_sized
    import ray.data as rd
    configure_data_context()
    types = ["click", "error", "purchase", "signup", "view"]
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type"])
    counts = grouped_aggregate(ds, ["user_id", "event_type"],
                               {"n": (None, "count")})

    def pivot_block(df: pd.DataFrame) -> pd.DataFrame:
        wide = df.pivot_table(index="user_id", columns="event_type",
                              values="n", aggfunc="sum", fill_value=0)
        wide = wide.reindex(columns=types, fill_value=0).reset_index()
        wide.columns = ["user_id"] + types
        return wide.astype("int64")

    wide = grouped_apply(counts, ["user_id"], pivot_block)
    out = melt(wide, id_cols=["user_id"], value_cols=types,
               var_name="event_type", value_name="n").to_pandas()
    out["user_id"] = out["user_id"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["user_id", "event_type"]) \
        .reset_index(drop=True)


def q_events_geomean(sf_dir: str):
    """Per-type geometric mean of event value — the log-domain
    aggregate: one combiner pass over (Σln v, n), exp of the mean on
    the |types|-bounded result. Oracled via exp(avg(ln v))."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_type", "value"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["value"] > 0]
        return pd.DataFrame({"event_type": df["event_type"].to_numpy(),
                             "lnv": np.log(df["value"].to_numpy(
                                 np.float64))})

    m = grouped_aggregate(ds.map_batches(prep, batch_format="pandas"),
                          ["event_type"], {"s": ("lnv", "sum"),
                                           "n": (None, "count")}) \
        .to_pandas()
    out = pd.DataFrame({
        "event_type": m["event_type"],
        "n": m["n"].astype("int64"),
        "geomean": np.exp(m["s"].to_numpy(np.float64)
                          / m["n"].to_numpy(np.float64)).round(6)})
    return out.sort_values("event_type").reset_index(drop=True)


def q_events_dod_overlap(sf_dir: str):
    """Day-over-day active-user overlap (the retention-curve
    primitive): per day, |active(d−1) ∩ active(d)| and its Jaccard.
    Users co-locate once; each block walks its users' sorted distinct
    days with one vectorized diff (a consecutive-day hit marks day d)
    — no self-join, nothing user-sized leaves the cluster. Daily
    totals come from the same distinct (day, user) pass."""
    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts"])

    def day(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"user_id": df["user_id"].to_numpy(),
                             "day": df["ts"].dt.floor("D").to_numpy()})

    du = grouped_aggregate(ds.map_batches(day, batch_format="pandas"),
                           ["user_id", "day"], {"n": (None, "count")},
                           result_hint="large").materialize()
    daily = grouped_aggregate(du, ["day"],
                              {"n_active": (None, "count")}).to_pandas()

    def both_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"day": pd.Series(
                dtype="datetime64[us]"),
                "c": pd.Series(dtype="int64")})
        b = df.sort_values(["user_id", "day"])
        u = b["user_id"].to_numpy()
        d = b["day"].to_numpy()
        same = u[1:] == u[:-1]
        consec = (d[1:] - d[:-1]) == np.timedelta64(1, "D")
        hit = d[1:][same & consec]
        if not len(hit):
            return pd.DataFrame({"day": pd.Series(
                dtype="datetime64[us]"),
                "c": pd.Series(dtype="int64")})
        g = pd.Series(hit).value_counts()
        return pd.DataFrame({"day": g.index.to_numpy(),
                             "c": g.to_numpy(np.int64)})

    both = grouped_aggregate(
        grouped_apply(du, ["user_id"], both_block),
        ["day"], {"n_both": ("c", "sum")}).to_pandas()

    daily = daily.sort_values("day").reset_index(drop=True)
    prev = daily.copy()
    prev["day"] = prev["day"] + pd.Timedelta(days=1)
    out = daily.merge(prev, on="day", how="inner",
                      suffixes=("", "_prev"))
    out = out.merge(both, on="day", how="left")
    out["n_both"] = out["n_both"].fillna(0).astype("int64")
    denom = (out["n_active_prev"] + out["n_active"]
             - out["n_both"]).to_numpy(np.float64)
    out["jaccard"] = (out["n_both"] / denom).round(6)
    out["n_active"] = out["n_active"].astype("int64")
    out["n_active_prev"] = out["n_active_prev"].astype("int64")
    return out[["day", "n_active_prev", "n_active", "n_both",
                "jaccard"]].sort_values("day").reset_index(drop=True)


def q_user_event_type_set(sf_dir: str):
    """Collect-set aggregate (string_agg DISTINCT … ORDER BY): per
    user, the alphabetized comma-joined set of event types seen in
    the first two days. The set is |types|-bounded, so the engine
    builds it VECTORIZED from the pivot booleans (5 numpy selects) —
    never a per-group Python join — after the (user, type) combiner
    count and one hash co-location."""
    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    types = ["click", "error", "purchase", "signup", "view"]
    cutoff = pd.Timestamp("2024-01-03")
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type", "ts"])
    ds = ds.map_batches(
        lambda df: df.loc[df["ts"] < cutoff, ["user_id", "event_type"]],
        batch_format="pandas")
    counts = grouped_aggregate(ds, ["user_id", "event_type"],
                               {"n": (None, "count")})

    def set_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                                 "types": pd.Series(dtype="object")})
        wide = df.pivot_table(index="user_id", columns="event_type",
                              values="n", aggfunc="sum", fill_value=0)
        wide = wide.reindex(columns=types, fill_value=0)
        s = np.full(len(wide), "", dtype=object)
        for t in types:
            m = wide[t].to_numpy() > 0
            s = np.where(m, np.where(s == "", t, s + "," + t), s)
        return pd.DataFrame({"user_id": wide.index.to_numpy(),
                             "types": s})

    out = grouped_apply(counts, ["user_id"], set_block).to_pandas()
    out["user_id"] = out["user_id"].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


def q_customer_rfm(sf_dir: str):
    """RFM segmentation (recency / frequency / monetary tercile
    buckets — classic CRM corpus partitioning): per-customer metrics
    from one combiner aggregate over orders, exact tercile thresholds
    from the three-pass distributed quantile operator (no sort
    shuffle), vectorized bucket assignment against the broadcast
    thresholds, and a 27-cell segment count. Thresholds round to 6 on
    both sides; monetary rounds to 2 before bucketing (float sum
    order must not move a boundary)."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.ops.quantiles import distributed_quantiles
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    import ray.data as rd
    anchor = pd.Timestamp("1998-12-31")
    ds = read_parquet_sized(f"{sf_dir}/orders.parquet",
                            columns=["o_custkey", "o_orderdate",
                                     "o_totalprice"])
    per = grouped_aggregate(ds, ["o_custkey"],
                            {"frequency": (None, "count"),
                             "monetary": ("o_totalprice", "sum"),
                             "last_order": ("o_orderdate", "max")})

    def metrics(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_custkey": df["o_custkey"].to_numpy(),
            "recency": (anchor - df["last_order"])
            .dt.days.to_numpy(np.float64),
            "frequency": df["frequency"].to_numpy(np.float64),
            "monetary": df["monetary"].round(2).to_numpy(np.float64)})

    m = per.map_batches(metrics, batch_format="pandas").materialize()
    qs = [1 / 3, 2 / 3]
    th = {c: [round(v, 6) for v in distributed_quantiles(m, c, qs)]
          for c in ("recency", "frequency", "monetary")}

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = {"o_custkey": df["o_custkey"].to_numpy()}
        for c, (t1, t2) in th.items():
            v = df[c].to_numpy(np.float64)
            out[f"{c[0]}_bucket"] = (1 + (v > t1).astype(np.int64)
                                     + (v > t2).astype(np.int64))
        return pd.DataFrame(out)

    seg = grouped_aggregate(
        m.map_batches(bucket, batch_format="pandas"),
        ["r_bucket", "f_bucket", "m_bucket"],
        {"n_customers": (None, "count")}).to_pandas()
    seg["n_customers"] = seg["n_customers"].astype("int64")
    for c in ("r_bucket", "f_bucket", "m_bucket"):
        seg[c] = seg[c].astype("int64")
    return seg.sort_values(["r_bucket", "f_bucket", "m_bucket"]) \
        .reset_index(drop=True)


def doc_logreg_grad2(sf_dir: str):
    """Two-epoch gradient parity for the distributed logistic
    regression (``ops/logreg``): w₀=0 → one full-batch pass → step
    (lr=2) → second pass; returns the second mean gradient. Each pass
    is one streaming map_batches emitting (d+2)-float partials — the
    SQL oracle replays the same two rounds in chained CTEs with
    exp()."""
    from jerex_ray.ops.logreg import epoch_pass, feature_table
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text", "lang"])
    feats = feature_table(ds).materialize()
    g0, _, _ = epoch_pass(feats, np.zeros(4))
    g1, _, _ = epoch_pass(feats, -2.0 * g0)
    return pd.DataFrame({
        "g_bias": [round(float(g1[0]), 6)],
        "g_punct_ratio": [round(float(g1[1]), 6)],
        "g_mean_token_len": [round(float(g1[2]), 6)],
        "g_stopword_ratio": [round(float(g1[3]), 6)]})


def doc_quality_logreg(sf_dir: str):
    """Train the English-vs-rest quality classifier to convergence
    (30 full-batch GD epochs, one streaming pass each, feature blocks
    materialized once). Rows-only: the iterated exp/step recurrence
    isn't practical SQL past two rounds (the two-round prefix IS
    oracled via ``doc_logreg_grad2``); monotone loss decrease and a
    finite-difference gradient check are pytest-gated
    (test_logreg.py). Features are z-scored by a one-pass streaming
    moments stage first (fixed-lr GD is then stable by construction).
    The synthetic ``lang`` label carries only weak text signal, so
    the honest outcome is accuracy slightly above the majority base
    rate — the query demonstrates the training dataflow, not a
    separable task. Returns weights (standardized space), final
    loss, train accuracy."""
    from jerex_ray.ops.logreg import (FEATURES, accuracy, feature_table,
                                      standardize, train_logreg)
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text", "lang"])
    feats, _, _ = standardize(feature_table(ds))
    feats = feats.materialize()
    w, hist = train_logreg(feats, epochs=30, lr=1.0)
    row = {"w_bias": [round(float(w[0]), 6)]}
    for j, c in enumerate(FEATURES):
        row[f"w_{c}"] = [round(float(w[j + 1]), 6)]
    row["final_loss"] = [round(float(hist["loss"].iloc[-1]), 6)]
    row["train_acc"] = [round(accuracy(feats, w), 6)]
    return pd.DataFrame(row)


def doc_bigram_logppl(sf_dir: str):
    """Add-k smoothed bigram-LM quality score (the CCNet shape one
    order above ``doc_unigram_logppl``): per-doc mean −log2 P(w|prev)
    with P = (c(w₁w₂)+k)/(c(w₁·)+kV), k=0.5. Bigram counts reduce
    through the combiner; the vocabulary²-bounded table broadcasts
    once; one streaming pass scores. Oracled against the identical
    formula in SQL (positions via a char... word-index lateral)."""
    from jerex_ray.ops.textstats import bigram_logppl
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    out = bigram_logppl(ds).to_pandas()
    out["logppl"] = out["logppl"].round(6)
    out["n_bigrams"] = out["n_bigrams"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def q_events_regression(sf_dir: str):
    """Per-group ordinary-least-squares fit of event value against
    time (days since 1995-01-01), from ONE combiner pass of grouped
    co-moments (n, Σx, Σy, Σx², Σy², Σxy per event type — five
    scalars per group reduce, never the rows). Slope/intercept/R²
    close over the |types|-bounded table on the driver. Time is
    rescaled to days BEFORE the moments (both sides) so the normal
    equations don't cancel catastrophically at epoch-second
    magnitudes. Oracled vs DuckDB regr_slope/regr_intercept/regr_r2."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_type", "ts", "value"])
    epoch0 = pd.Timestamp("1995-01-01")

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        # resolution-safe (blocks may arrive as datetime64[us] or [ns])
        x = ((df["ts"] - epoch0) / pd.Timedelta(days=1)) \
            .to_numpy(np.float64)
        y = df["value"].to_numpy(np.float64)
        g = pd.DataFrame({"event_type": df["event_type"].to_numpy(),
                          "n": 1, "sx": x, "sy": y, "sxx": x * x,
                          "syy": y * y, "sxy": x * y})
        return g.groupby("event_type", sort=False, as_index=False).sum()

    m = grouped_aggregate(
        ds.map_batches(moments, batch_format="pandas"),
        ["event_type"],
        {k: (k, "sum") for k in ("n", "sx", "sy", "sxx", "syy",
                                 "sxy")}).to_pandas()
    n = m["n"].to_numpy(np.float64)
    vx = m["sxx"] - m["sx"] ** 2 / n
    vy = m["syy"] - m["sy"] ** 2 / n
    cov = m["sxy"] - m["sx"] * m["sy"] / n
    slope = cov / vx
    out = pd.DataFrame({
        "event_type": m["event_type"],
        "n": m["n"].astype("int64"),
        "slope": slope.round(6),
        "intercept": (m["sy"] / n - slope * m["sx"] / n).round(6),
        "r2": (cov * cov / (vx * vy)).round(6)})
    return out.sort_values("event_type").reset_index(drop=True)


def q_events_moving_avg(sf_dir: str):
    """Row-frame window aggregate (ROWS BETWEEN 3 PRECEDING AND
    CURRENT ROW): per-user 4-row moving average of event value in
    (ts, id) order — users co-locate in one hash shuffle, each block
    runs a vectorized grouped rolling mean. Oracled vs the SQL
    window frame."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts",
                                     "value"])

    def mavg(block: pd.DataFrame) -> pd.DataFrame:
        if block.empty:
            return pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                                 "user_id": pd.Series(dtype="int64"),
                                 "mavg": pd.Series(dtype="float64")})
        b = block.sort_values(["user_id", "ts", "event_id"])
        r = b.groupby("user_id", sort=False)["value"] \
            .rolling(4, min_periods=1).mean() \
            .reset_index(level=0, drop=True)
        return pd.DataFrame({"event_id": b["event_id"].to_numpy(),
                             "user_id": b["user_id"].to_numpy(),
                             "mavg": r.to_numpy().round(6)})

    out = grouped_apply(ds, ["user_id"], mavg).to_pandas()
    out["event_id"] = out["event_id"].astype("int64")
    out["user_id"] = out["user_id"].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


def q_supplier_jaccard(sf_dir: str):
    """Link-prediction scores over the supplier–part bipartite graph
    (``ops/graph.bipartite_jaccard``): top-50 supplier pairs by
    part-set Jaccard — per-part wedge self-merge after one hash
    shuffle, combiner-reduced shared counts, broadcast degree join,
    block-local exact head. Oracled via a SQL self-join on shared
    parts with a deterministic (rounded jaccard DESC, pair) order."""
    from jerex_ray.ops.graph import bipartite_jaccard
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/lineitem.parquet",
                            columns=["l_suppkey", "l_partkey"])
    out = bipartite_jaccard(ds, left_col="l_suppkey",
                            right_col="l_partkey", top_k=50)
    out["a"] = out["a"].astype("int64")
    out["b"] = out["b"].astype("int64")
    return out


def q_events_markov(sf_dir: str):
    """First-order Markov transition matrix of event types per user
    (``ops/windows.transition_matrix``): one hash shuffle co-locates
    users, per-block sort + shifted-view pair counts reduce through
    the combiner; only the |types|² count table reaches the driver.
    SQL-oracled via LEAD OVER (PARTITION BY user ORDER BY ts, id)."""
    from jerex_ray.ops.windows import transition_matrix
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts",
                                     "event_type"])
    return transition_matrix(ds, key="user_id", ts_col="ts",
                             id_col="event_id", type_col="event_type")


def doc_bpe_pair_counts(sf_dir: str):
    """First-round BPE pair statistics (Sennrich et al. 2016),
    fully distributed: combiner word-frequency aggregate → per-block
    vectorized char-pair partials (NUL-joined codepoint array, two
    shifted views — no per-word loop) → grouped sum. SQL-oracled via
    a words × char-position lateral in DuckDB."""
    from jerex_ray.ops.bpe import pair_counts
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["text"])
    return pair_counts(ds)


def doc_bpe_merges(sf_dir: str):
    """Learned BPE merge list (40 merges, min pair freq 2): the
    distributed word-frequency count feeds the driver-side greedy
    merge loop (inherently sequential; input is vocabulary-bounded,
    not corpus-bounded). Rows-only: the iterative merge recurrence
    is not SQL-expressible (DuckDB replace() has different overlap
    semantics than left-to-right BPE merging); parity vs an
    independent full-recount reference trainer is pytest-gated
    (test_bpe.py)."""
    from jerex_ray.ops.bpe import train_bpe, word_freqs
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["text"])
    wf = word_freqs(ds).to_pandas()
    return train_bpe(wf, num_merges=40)


def doc_bpe_tokens(sf_dir: str):
    """Tokenize the corpus with the learned merges: broadcast-apply
    actor stage (ranks built once per actor, per-actor word memo) →
    per-doc word/token/distinct-token counts. Rows-only (encoding is
    the same non-SQL recurrence); losslessness and the GPT-2 merge
    convention are pytest-gated."""
    from jerex_ray.ops.bpe import apply_bpe, train_bpe, word_freqs
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    wf = word_freqs(ds).to_pandas()
    merges = train_bpe(wf, num_merges=40)
    out = apply_bpe(ds, merges).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_events_ewma(sf_dir: str, *, alpha: float = 0.1):
    """Per-row exponentially-weighted moving average of event value
    per user in (ts, id) order — the standard feature-engineering
    smoother (e_t = α·v_t + (1−α)·e_{t−1}, adjust=False semantics).

    Scale shape: users co-locate in ONE hash shuffle; each block runs
    a rank-stepped recursion — one vectorized ``α·v + (1−α)·e_prev``
    update per within-user rank, across ALL of the block's users at
    once (the loop is over max series length, not rows). The update
    performs bit-identical float64 ops to the oracle's recursive CTE,
    so the round-6 compare is exact, not approximate."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    beta = 1.0 - alpha
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts",
                                     "value"])

    def ewma(block: pd.DataFrame) -> pd.DataFrame:
        if block.empty:
            return pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                                 "ewma": pd.Series(dtype="float64")})
        b = block.sort_values(["user_id", "ts", "event_id"])
        v = b["value"].to_numpy(np.float64)
        uid = b["user_id"].to_numpy()
        # rows of a user are contiguous after the sort → rn is the
        # offset from the user's first row, and idx-1 is the user's
        # previous row wherever rn > 0
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        starts = np.flatnonzero(new_user)
        lens = np.diff(np.r_[starts, len(v)])
        rn = np.arange(len(v)) - np.repeat(starts, lens)
        e = v.copy()
        for r in range(1, int(rn.max()) + 1 if len(rn) else 0):
            idx = np.flatnonzero(rn == r)
            e[idx] = alpha * v[idx] + beta * e[idx - 1]
        # DuckDB round() is half-AWAY-from-zero; np.round is half-even
        # — mirror the oracle's rule so exact .5 boundaries agree
        r = np.copysign(np.floor(np.abs(e) * 1e6 + 0.5), e) / 1e6
        return pd.DataFrame({"event_id": b["event_id"].to_numpy(),
                             "ewma": r})

    out = grouped_apply(ds, ["user_id"], ewma).to_pandas()
    out["event_id"] = out["event_id"].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


def emb_knn_graph(sf_dir: str, *, k: int = 5):
    """Exact cosine k-NN graph over the whole embedding corpus (the
    primitive under SemDeDup clustering and graph-ANN index builds):
    each vector's top-k neighbors excluding itself.

    Scale shape: the corpus matrix broadcasts ONCE (``ray.put`` inside
    ``brute_force_topk``) and every block scores its rows against it
    with one float matmul — exact boundary/tie handling is the
    oracle-proven partial-top-k kernel (``ops/ann.brute_force_topk``).
    The all-pairs scan is quadratic by definition; the documented
    100 TB path is the IVF variant (``ann_ivf_topk``) per shard.
    Oracled by the cross-join row_number SQL."""
    from jerex_ray.ops.ann import brute_force_topk
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    df = ds.to_pandas()
    order = np.argsort(df["vec_id"].to_numpy())
    ids = df["vec_id"].to_numpy()[order]
    mat = np.stack(df["embedding"].to_numpy()[order])
    # k+1 then drop self: every query row is a corpus member
    top = brute_force_topk(ds, mat, k=k + 1)
    top["src"] = ids[top["query_idx"].to_numpy()]
    top = top[top["src"] != top["vec_id"]]
    top = top.sort_values(["src", "cosine", "vec_id"],
                          ascending=[True, False, True]) \
        .groupby("src", sort=False).head(k)
    return pd.DataFrame({"src": top["src"].to_numpy().astype("int64"),
                         "dst": top["vec_id"].to_numpy().astype("int64")}) \
        .sort_values(["src", "dst"]).reset_index(drop=True)


def emb_hard_negatives(sf_dir: str, *, k: int = 5):
    """Contrastive hard-negative mining: for every anchor vector, the
    k most cosine-similar vectors carrying a DIFFERENT label — the
    batch-construction primitive for contrastive/metric training
    (hardest negatives dominate the gradient signal).

    Scale shape: one broadcast of the anchor matrix + labels, one
    streaming pass over the corpus with a label-masked variant of the
    oracle-proven partial-top-k kernel (``ops/ann.brute_force_topk``)
    — the mask is one boolean compare per batch, so hard-negative
    mining costs exactly what the kNN graph costs. Oracled by the
    label-inequality cross-join row_number SQL."""
    from jerex_ray.ops.ann import brute_force_topk
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding", "label"])
    df = ds.to_pandas()
    order = np.argsort(df["vec_id"].to_numpy())
    ids = df["vec_id"].to_numpy()[order]
    labels = df["label"].to_numpy()[order]
    mat = np.stack(df["embedding"].to_numpy()[order])
    top = brute_force_topk(ds, mat, k=k, query_labels=labels)
    top["src"] = ids[top["query_idx"].to_numpy()]
    return pd.DataFrame({"src": top["src"].to_numpy().astype("int64"),
                         "dst": top["vec_id"].to_numpy().astype("int64")}) \
        .sort_values(["src", "dst"]).reset_index(drop=True)


def emb_label_outliers(sf_dir: str, *, frac: float = 0.05):
    """Label-conditional outlier flagging (the data-cleaning pass that
    catches mislabeled / off-distribution examples): the ``frac``
    least-typical vectors per label, by cosine similarity to their own
    label's centroid — a rank cutoff, not a score threshold, so the
    decision is count-exact and immune to float-boundary flakiness.

    Scale shape: centroids come from the oracle-proven partial-sum
    pass (``ops/embed.label_centroids``, round-6 parity) and broadcast
    as one tiny matrix; similarities are one vectorized pass; the
    per-label rank cutoff is a ``grouped_apply`` over (vec_id, label,
    cos) rows — 3 scalar columns, never the vectors — with the
    per-label take bounded by ``frac`` × label size."""
    import ray

    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.ops.embed import label_centroids
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding", "label"])
    cdf = label_centroids(ds)
    cents = {int(lab): g.sort_values("dim")["centroid"]
             .to_numpy(np.float64)
             for lab, g in cdf.groupby("label")}
    c_ref = ray.put(cents)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        cmap = ray.get(c_ref)
        if batch.empty:
            return pd.DataFrame({"vec_id": pd.Series(dtype="int64"),
                                 "label": pd.Series(dtype="int64"),
                                 "cos_sim": pd.Series(dtype="float64")})
        mat = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        labels = batch["label"].to_numpy()
        cos = np.empty(len(batch), dtype=np.float64)
        for lab in np.unique(labels):
            m = labels == lab
            c = cmap[int(lab)]
            v = mat[m]
            # dot / (|v|·|c|) — the same op order as the oracle's
            # list_cosine_similarity, so parity holds to summation
            # noise (≪ the round-6 output grid and any rank gap)
            cos[m] = (v @ c) / (np.linalg.norm(v, axis=1)
                                * np.linalg.norm(c))
        return pd.DataFrame({"vec_id": batch["vec_id"].to_numpy(),
                             "label": labels.astype("int64"),
                             "cos_sim": cos})

    scored = ds.map_batches(score, batch_format="pandas")

    def cutoff(df: pd.DataFrame) -> pd.DataFrame:
        # a block holds one or more WHOLE label groups — cut per label
        return df.sort_values(["cos_sim", "vec_id"]) \
            .groupby("label", sort=False, group_keys=False) \
            .apply(lambda g: g.head(int(np.ceil(frac * len(g)))))

    out = grouped_apply(scored, ["label"], cutoff).to_pandas()
    out["cos_sim"] = out["cos_sim"].round(6)
    out["label"] = out["label"].astype("int64")
    out["vec_id"] = out["vec_id"].astype("int64")
    return out[["label", "vec_id", "cos_sim"]] \
        .sort_values(["label", "vec_id"]).reset_index(drop=True)


def q_part_sssp_tiered(sf_dir: str):
    """Weighted single-source shortest paths over the part co-purchase
    graph from part 1, tiered-cost flavor (the md5-weighted
    repeat-copurchase flavor lives in ``q_part_sssp``): edge cost 1
    between strongly-tied parts
    (co-purchased in ≥2 distinct orders), cost 2 for weak ties — the
    weighted sibling of ``q_part_bfs``.

    Scale shape: per-order pair generation is block-local
    (``grouped_apply``), shared-order counts reduce through the
    combiner, and the relaxation runs on the Bellman-Ford BSP grid
    (``ops/graph.sssp_distances``) with per-round traffic bounded by
    the improving frontier. Integer costs make the relaxation
    arithmetic engine-exact; oracled by a recursive-CTE with UNION
    dedup."""
    from jerex_ray.functions.aggregate import (grouped_aggregate,
                                               grouped_apply)
    from jerex_ray.ops.graph import sssp_distances
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    li = read_parquet_sized(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey"])

    def pairs_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"a": pd.Series(dtype="int64"),
                                 "b": pd.Series(dtype="int64")})
        d = df.drop_duplicates(["l_orderkey", "l_partkey"])
        m = d.merge(d, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        return pd.DataFrame({"a": m["l_partkey_x"].to_numpy(),
                             "b": m["l_partkey_y"].to_numpy()})

    pairs = grouped_apply(li, ["l_orderkey"], pairs_block)
    cnt = grouped_aggregate(pairs, ["a", "b"], {"cnt": (None, "count")},
                            result_hint="large")
    weighted = cnt.map_batches(
        lambda df: pd.DataFrame(
            {"a": df["a"].to_numpy(),
             "b": df["b"].to_numpy(),
             "w": np.where(df["cnt"].to_numpy() >= 2, 1.0, 2.0)})
        if not df.empty else pd.DataFrame(
            {"a": pd.Series(dtype="int64"),
             "b": pd.Series(dtype="int64"),
             "w": pd.Series(dtype="float64")}),
        batch_format="pandas")
    out = sssp_distances(weighted, 1, src="a", dst="b", weight="w")
    out["node"] = out["node"].astype("int64")
    out["dist"] = out["dist"].astype("int64")
    return out.reset_index(drop=True)


def doc_feature_hash(sf_dir: str, *, n_buckets: int = 32):
    """Hashing-trick bag-of-words featurization of every document
    (``ops/textstats.feature_hash``): md5 bucket + independent md5
    sign bit, nonzero (doc, bucket, feat) rows. One streaming pass,
    no vocabulary, no shuffle; oracled bit-for-bit via the md5-replay
    SQL."""
    from jerex_ray.ops.textstats import feature_hash
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    out = feature_hash(ds, n_buckets=n_buckets).to_pandas()
    for c in ("doc_id", "bucket", "feat"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["doc_id", "bucket"]).reset_index(drop=True)


def q_events_max_concurrency(sf_dir: str):
    """Peak concurrent sessions (each event occupies
    [ts, ts + value minutes)): the classic +1/−1 endpoint sweep, made
    distributed — endpoint explode, per-timestamp net delta (combiner
    aggregate), then the EXACT distributed prefix sum over time
    (quantile range buckets → per-bucket totals → broadcast offsets →
    in-bucket cumsum), with the max and its earliest timestamp
    composed from per-bucket (total, best, best_t) partials on the
    driver — 2×#events endpoint rows never collect. Integer deltas
    and integer-microsecond times make every comparison engine-exact.
    The within-timestamp peak always lands on the post-group value
    (ends at t sort before starts only across groups; inside one t the
    running value dips then rises), so per-t grouping is lossless."""
    import ray

    from jerex_ray.functions.aggregate import (grouped_aggregate,
                                               grouped_apply)
    from jerex_ray.ops.quantiles import distributed_quantiles
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["ts", "value"])

    def endpoints(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"t_us": pd.Series(dtype="int64"),
                                 "d": pd.Series(dtype="int64")})
        start = df["ts"].astype("int64").to_numpy()
        # DuckDB CAST(DOUBLE AS BIGINT) rounds half-away-from-zero;
        # numpy astype truncates — mirror the cast (durations > 0)
        dur = np.floor(df["value"].to_numpy(np.float64)
                       * 60000000.0 + 0.5).astype(np.int64)
        return pd.DataFrame({
            "t_us": np.concatenate([start, start + dur]),
            "d": np.concatenate([np.ones(len(df), dtype=np.int64),
                                 -np.ones(len(df), dtype=np.int64)])})

    nd = grouped_aggregate(ds.map_batches(endpoints,
                                          batch_format="pandas"),
                           ["t_us"], {"nd": ("d", "sum")},
                           result_hint="large").materialize()
    qs = [i / 16 for i in range(1, 16)]
    pivots = np.unique(np.asarray(
        distributed_quantiles(nd, "t_us", qs), dtype=np.float64))
    piv_ref = ray.put(pivots)

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["__b"] = np.searchsorted(
            ray.get(piv_ref), df["t_us"].to_numpy(np.float64),
            side="left").astype(np.int64)
        return out

    def bucket_partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for b, g in df.groupby("__b", sort=False):
            g = g.sort_values("t_us")
            cum = g["nd"].to_numpy(np.int64).cumsum()
            i = int(np.argmax(cum))          # first peak in the bucket
            rows.append((int(b), int(cum[-1]), int(cum[i]),
                         int(g["t_us"].to_numpy()[i])))
        return pd.DataFrame(rows, columns=["__b", "total", "best",
                                           "best_t"])

    parts = grouped_apply(nd.map_batches(with_bucket,
                                         batch_format="pandas"),
                          ["__b"], bucket_partial).to_pandas() \
        .sort_values("__b")
    offsets = np.concatenate(
        ([0], parts["total"].to_numpy(np.int64).cumsum()[:-1]))
    cand = offsets + parts["best"].to_numpy(np.int64)
    peak = int(cand.max())
    first = int(np.argmax(cand == peak))     # buckets are time-ordered
    at_us = int(parts["best_t"].to_numpy()[first])
    return pd.DataFrame({
        "max_concurrency": pd.Series([peak], dtype="int64"),
        "at_ts": [pd.Timestamp(at_us, unit="us")]})


def q_events_incremental_hourly(sf_dir: str):
    """Incremental view maintenance of the hourly-by-type rollup:
    the history (event_id % 10 ≠ 0) is folded ONCE into mergeable
    partial states (``functions/aggregate.partial_states``), the
    incoming shard (event_id % 10 = 0) into its own, and
    ``merge_states`` folds state+delta into the final view — the
    invariant (and the oracle) is exact equality with a full
    recompute over all events, including the mean's sum/count state
    split. Cost of an increment scales with |keys| + |delta|, never
    the ingested history."""
    from jerex_ray.functions.aggregate import merge_states, partial_states
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "ts", "event_type",
                                     "value"])

    def prep(which):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            m = (df["event_id"].to_numpy() % 10 == 0)
            if which == "base":
                m = ~m
            d = df.loc[m]
            return pd.DataFrame({
                "event_type": d["event_type"].to_numpy(),
                "hour": d["ts"].dt.floor("h").to_numpy(),
                "value": d["value"].to_numpy(np.float64)})
        return fn

    keys = ["event_type", "hour"]
    specs = {"n_events": (None, "count"),
             "sum_value": ("value", "sum"),
             "avg_value": ("value", "mean")}
    base = partial_states(
        ds.map_batches(prep("base"), batch_format="pandas"), keys, specs) \
        .materialize()                       # the "stored" state
    delta = partial_states(
        ds.map_batches(prep("delta"), batch_format="pandas"), keys, specs)
    out = merge_states([base, delta], keys, specs).to_pandas()
    out["n_events"] = out["n_events"].astype("int64")
    out["sum_value"] = out["sum_value"].round(2)
    out["avg_value"] = out["avg_value"].round(6)
    return out.sort_values(["event_type", "hour"]).reset_index(drop=True)


def emb_triplets(sf_dir: str):
    """Training-triplet construction for metric learning: per anchor,
    one deterministic pseudo-random SAME-label positive (smallest
    md5("anchor:candidate") — reproducible across runs and replayable
    by the SQL oracle) and the HARDEST different-label negative (the
    label-masked top-1 cosine kernel). (anchor, pos, neg) feeds a
    triplet/InfoNCE loss directly.

    Scale shape: positives are label-co-located pair ranking inside
    ``grouped_apply`` blocks (quadratic in LABEL size — fine for
    classed corpora; document sharding for web-scale labels);
    negatives are the one-pass broadcast-matrix scan shared with
    ``emb_hard_negatives``."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.ops.ann import brute_force_topk
    from jerex_ray.runtime import read_parquet_sized
    from jerex_ray.util import md5_hash64_batch
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding", "label"])
    df = ds.to_pandas()
    order = np.argsort(df["vec_id"].to_numpy())
    ids = df["vec_id"].to_numpy()[order]
    labels = df["label"].to_numpy()[order]
    mat = np.stack(df["embedding"].to_numpy()[order])

    def positives(block: pd.DataFrame) -> pd.DataFrame:
        out_a, out_p = [], []
        for _, g in block.groupby("label", sort=False):
            gid = g["vec_id"].to_numpy(np.int64)
            n = len(gid)
            if n < 2:
                continue
            a = np.repeat(gid, n)
            p = np.tile(gid, n)
            keep = a != p
            a, p = a[keep], p[keep]
            h = md5_hash64_batch(
                [f"{x}:{y}" for x, y in zip(a, p)]).astype(np.uint64)
            pick = pd.DataFrame({"a": a, "p": p, "h": h}) \
                .sort_values(["a", "h", "p"]) \
                .groupby("a", sort=False).head(1)
            out_a.append(pick["a"].to_numpy())
            out_p.append(pick["p"].to_numpy())
        if not out_a:
            return pd.DataFrame({"anchor": pd.Series(dtype="int64"),
                                 "pos": pd.Series(dtype="int64")})
        return pd.DataFrame({"anchor": np.concatenate(out_a),
                             "pos": np.concatenate(out_p)})

    pos = grouped_apply(
        ds.map_batches(lambda d: d[["vec_id", "label"]],
                       batch_format="pandas"),
        ["label"], positives).to_pandas()
    top = brute_force_topk(ds, mat, k=1, query_labels=labels)
    neg = pd.DataFrame({"anchor": ids[top["query_idx"].to_numpy()],
                        "neg": top["vec_id"].to_numpy()})
    out = pos.merge(neg, on="anchor")
    for c in ("anchor", "pos", "neg"):
        out[c] = out[c].astype("int64")
    return out.sort_values("anchor").reset_index(drop=True)


def q_events_cusum(sf_dir: str):
    """CUSUM change-point detection per event type: the timestamp
    where the cumulative deviation from the type's mean peaks in
    magnitude (the classic level-shift locator). Computed in EXACT
    scaled integers — cusum_k · n = Σ_{i≤k} (n·cents_i) − k·Σcents —
    so the argmax is an integer comparison with zero float-boundary
    hazard on either engine.

    Scale shape: one combiner pass for per-type (n, Σcents), broadcast
    of that tiny frame, then the keyed ordered prefix sum
    (hash co-location by type + in-block sort/cumsum, the
    ``q_events_running_total`` shape). Ties on |cusum| break on
    earliest (ts, event_id)."""
    import ray

    from jerex_ray.functions.aggregate import (grouped_aggregate,
                                               grouped_apply)
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "ts", "event_type",
                                     "value"])

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_id": df["event_id"].to_numpy(),
            "ts": df["ts"].to_numpy(),
            "event_type": df["event_type"].to_numpy(),
            "cents": np.round(df["value"].to_numpy(np.float64)
                              * 100).astype(np.int64)})

    cds = ds.map_batches(cents, batch_format="pandas")
    stats = grouped_aggregate(cds, ["event_type"],
                              {"n": (None, "count"),
                               "s": ("cents", "sum")}).to_pandas()
    st_ref = ray.put({t: (int(n), int(s)) for t, n, s in
                      zip(stats["event_type"], stats["n"], stats["s"])})

    def peak(block: pd.DataFrame) -> pd.DataFrame:
        rows = []
        sm = ray.get(st_ref)
        for t, g in block.groupby("event_type", sort=False):
            n, s = sm[t]
            g = g.sort_values(["ts", "event_id"])
            # n·cusum_k = Σ_{i≤k} n·cents_i − k·s, all int64
            cum = (np.int64(n) * g["cents"].to_numpy(np.int64)).cumsum() \
                - np.arange(1, len(g) + 1, dtype=np.int64) * np.int64(s)
            i = int(np.argmax(np.abs(cum)))   # first peak wins
            v = float(cum[i]) / (n * 100.0)
            # half-away rounding mirrors DuckDB round()
            rows.append((t, int(g["event_id"].to_numpy()[i]),
                         float(np.copysign(
                             np.floor(abs(v) * 1e6 + 0.5), v)) / 1e6))
        return pd.DataFrame(rows, columns=["event_type", "at_event_id",
                                           "peak_cusum"])

    out = grouped_apply(cds, ["event_type"], peak).to_pandas()
    out["at_event_id"] = out["at_event_id"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def _round_half_away(x, decimals: int):
    """DuckDB ``round()`` is half-away-from-zero; numpy/python round
    half-even — mirror DuckDB wherever rounded values feed comparisons
    or output hashes."""
    x = np.asarray(x, dtype=np.float64)
    s = 10.0 ** decimals
    return np.copysign(np.floor(np.abs(x) * s + 0.5), x) / s


def q_events_psi(sf_dir: str, *, n_buckets: int = 10):
    """Population Stability Index between the reference half
    (event_id % 2 = 0) and the current half of the value stream — the
    standard drift monitor for feature pipelines. Bucket boundaries
    are the reference half's exact type-7 deciles (the shuffle-free
    quantile selection), rounded half-away to 4 dp on BOTH engines so
    every 2-dp value compares identically against them; shares are
    Laplace-smoothed so empty current buckets stay finite.

    Scale shape: three quantile passes + two counting passes, all
    combiner-reduced; only (buckets × 2) counts reach the driver."""
    import ray

    from jerex_ray.ops.quantiles import distributed_quantiles
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "value"])
    ref = ds.map_batches(
        lambda df: df.loc[df["event_id"] % 2 == 0, ["value"]],
        batch_format="pandas")
    qs = [i / n_buckets for i in range(1, n_buckets)]
    pivots = _round_half_away(distributed_quantiles(ref, "value", qs), 4)
    piv_ref = ray.put(np.asarray(pivots, dtype=np.float64))

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        p = ray.get(piv_ref)
        half = (df["event_id"].to_numpy() % 2).astype(np.int64)
        b = np.searchsorted(p, df["value"].to_numpy(np.float64),
                            side="left").astype(np.int64)
        g = pd.DataFrame({"half": half, "bucket": b}) \
            .groupby(["half", "bucket"], as_index=False).size()
        return g.rename(columns={"size": "n"})

    from jerex_ray.functions.aggregate import grouped_aggregate
    c = grouped_aggregate(ds.map_batches(counts, batch_format="pandas"),
                          ["half", "bucket"], {"n": ("n", "sum")}) \
        .to_pandas()
    full = pd.MultiIndex.from_product(
        [[0, 1], range(n_buckets)], names=["half", "bucket"]).to_frame(
        index=False)
    c = full.merge(c, on=["half", "bucket"], how="left").fillna(0)
    piv = c.pivot(index="bucket", columns="half", values="n") \
        .sort_index()
    n0, n1 = float(piv[0].sum()), float(piv[1].sum())
    p = (piv[0].to_numpy(np.float64) + 0.5) / (n0 + 0.5 * n_buckets)
    q = (piv[1].to_numpy(np.float64) + 0.5) / (n1 + 0.5 * n_buckets)
    psi = float(((p - q) * np.log(p / q)).sum())
    return pd.DataFrame({
        "psi": [float(_round_half_away(psi, 6))],
        "n_ref": pd.Series([int(n0)], dtype="int64"),
        "n_cur": pd.Series([int(n1)], dtype="int64")})


def q_events_debounce(sf_dir: str, *, gap_minutes: int = 5):
    """Debounce: drop events repeating the same (user, type) within
    ``gap_minutes`` of the PREVIOUS KEPT event (the sensor/telemetry
    dedup that exact-key dedup can't express) — per key the serial
    rule "keep iff ts − last_kept_ts > gap". Hash co-location per
    user + in-block vectorized group scan; integer-microsecond
    comparisons are engine-exact. Note the chained semantics: a burst
    A,B,C at 3-minute spacing keeps only A (B is dropped, so C
    compares against A) — the oracle replays this with a recursive
    CTE, not a lag filter."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id",
                                     "event_type", "ts"])
    gap_us = np.int64(gap_minutes) * 60_000_000

    def keep(block: pd.DataFrame) -> pd.DataFrame:
        if block.empty:
            return pd.DataFrame({"event_id": pd.Series(dtype="int64")})
        b = block.sort_values(["user_id", "event_type", "ts",
                               "event_id"])
        t = b["ts"].astype("int64").to_numpy()
        out = []
        # serial scan per (user, type) run — runs are short (events
        # per user-type), the heavy lifting was the co-location
        uid = b["user_id"].to_numpy()
        ety = b["event_type"].to_numpy()
        new_run = np.ones(len(b), dtype=bool)
        new_run[1:] = (uid[1:] != uid[:-1]) | (ety[1:] != ety[:-1])
        bounds = np.append(np.flatnonzero(new_run), len(b))
        eid = b["event_id"].to_numpy()
        for s, e in zip(bounds[:-1], bounds[1:]):
            last = None
            for i in range(s, e):
                if last is None or t[i] - last > gap_us:
                    out.append(eid[i])
                    last = t[i]
        return pd.DataFrame({"event_id": np.asarray(out,
                                                    dtype=np.int64)})

    out = grouped_apply(ds, ["user_id"], keep).to_pandas()
    out["event_id"] = out["event_id"].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


def q_part_assortativity(sf_dir: str):
    """Newman degree assortativity of the part co-purchase graph
    (``ops/graph.degree_assortativity``): Pearson correlation of
    endpoint degrees over directed stubs, computed with ONE edge-sized
    co-location via stub symmetry (Σx, Σx², Σxy all reduce to
    node-sized sums of deg², deg³, deg·S(u)). Oracled against DuckDB
    ``corr`` over the stub self-join."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.ops.graph import degree_assortativity
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    li = read_parquet_sized(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey"])

    def pairs_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"a": pd.Series(dtype="int64"),
                                 "b": pd.Series(dtype="int64")})
        d = df.drop_duplicates(["l_orderkey", "l_partkey"])
        m = d.merge(d, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        return pd.DataFrame({"a": m["l_partkey_x"].to_numpy(),
                             "b": m["l_partkey_y"].to_numpy()})

    edges = grouped_apply(li, ["l_orderkey"], pairs_block)
    return degree_assortativity(edges)


def q_events_moments(sf_dir: str):
    """Sample skewness and excess kurtosis of event value per type —
    the higher-moment distribution profile (G1/G2 with the standard
    bias adjustments, matching DuckDB/SciPy). Numerically it is the
    TWO-PASS shape: pass 1 reduces to per-type means (combiner), the
    broadcast means recenter pass 2's central-power sums Σ(v−μ)^{2,3,4}
    — raw-power sums would cancel catastrophically at corpus scale.
    Only #types rows ever reach the driver."""
    import ray

    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_type", "value"])

    st = grouped_aggregate(ds, ["event_type"],
                           {"n": (None, "count"),
                            "s": ("value", "sum")}).to_pandas()
    mu = dict(zip(st["event_type"],
                  st["s"].to_numpy(np.float64)
                  / st["n"].to_numpy(np.float64)))
    mu_ref = ray.put(mu)

    def central(df: pd.DataFrame) -> pd.DataFrame:
        mean = ray.get(mu_ref)
        v = df["value"].to_numpy(np.float64)
        c = v - df["event_type"].map(mean).to_numpy(np.float64)
        g = pd.DataFrame({"event_type": df["event_type"],
                          "c2": c * c, "c3": c ** 3, "c4": c ** 4}) \
            .groupby("event_type", sort=False).sum()
        return g.reset_index()

    cs = grouped_aggregate(ds.map_batches(central, batch_format="pandas"),
                           ["event_type"],
                           {"c2": ("c2", "sum"), "c3": ("c3", "sum"),
                            "c4": ("c4", "sum")}).to_pandas()
    cs = cs.merge(st[["event_type", "n"]], on="event_type")
    n = cs["n"].to_numpy(np.float64)
    m2 = cs["c2"].to_numpy(np.float64) / n
    m3 = cs["c3"].to_numpy(np.float64) / n
    m4 = cs["c4"].to_numpy(np.float64) / n
    skew = (m3 / m2 ** 1.5) * np.sqrt(n * (n - 1)) / (n - 2)
    g2 = m4 / (m2 * m2) - 3.0
    kurt = ((n + 1) * g2 + 6) * (n - 1) / ((n - 2) * (n - 3))
    out = pd.DataFrame({"event_type": cs["event_type"],
                        "n": cs["n"].astype("int64"),
                        "skew": np.round(skew, 6),
                        "kurt": np.round(kurt, 6)})
    return out.sort_values("event_type").reset_index(drop=True)


def q_events_holt(sf_dir: str, *, alpha: float = 0.2, gamma: float = 0.1):
    """Holt double-exponential smoothing (level + trend) of event value
    per user in (ts, id) order — the forecasting-feature counterpart of
    ``q_events_ewma``. Emits each user's FINAL level and trend.

    Scale shape: users co-locate in ONE hash shuffle; each block runs
    the coupled two-state recursion rank-stepped — one vectorized
    update per within-user rank across ALL the block's users (the loop
    is over max series length, not rows). Update order is bit-identical
    to the oracle's recursive CTE:
      l_t = α·v_t + (1−α)·(l_{t−1} + b_{t−1})
      b_t = γ·(l_t − l_{t−1}) + (1−γ)·b_{t−1}
    seeded l_1 = v_1, b_1 = 0."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts",
                                     "value"])

    def holt(block: pd.DataFrame) -> pd.DataFrame:
        if block.empty:
            return pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64"),
                                 "level": pd.Series(dtype="float64"),
                                 "trend": pd.Series(dtype="float64")})
        b = block.sort_values(["user_id", "ts", "event_id"])
        v = b["value"].to_numpy(np.float64)
        uid = b["user_id"].to_numpy()
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        starts = np.flatnonzero(new_user)
        lens = np.diff(np.r_[starts, len(v)])
        rn = np.arange(len(v)) - np.repeat(starts, lens)
        lev = v.copy()
        tr = np.zeros_like(v)
        for r in range(1, int(rn.max()) + 1 if len(rn) else 0):
            idx = np.flatnonzero(rn == r)
            prev_l = lev[idx - 1]
            prev_b = tr[idx - 1]
            lev[idx] = alpha * v[idx] + (1.0 - alpha) * (prev_l + prev_b)
            tr[idx] = gamma * (lev[idx] - prev_l) + (1.0 - gamma) * prev_b
        last = starts + lens - 1
        # DuckDB round() is half-away-from-zero; mirror it
        rl = np.copysign(np.floor(np.abs(lev[last]) * 1e6 + 0.5),
                         lev[last]) / 1e6
        rt = np.copysign(np.floor(np.abs(tr[last]) * 1e6 + 0.5),
                         tr[last]) / 1e6
        return pd.DataFrame({"user_id": uid[last],
                             "n": lens.astype("int64"),
                             "level": rl, "trend": rt})

    out = grouped_apply(ds, ["user_id"], holt).to_pandas()
    out["user_id"] = out["user_id"].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


def doc_nb_model(sf_dir: str, *, top_k: int = 20):
    """Multinomial naive-Bayes training over the documents table
    (class = lang, features = whitespace words, Laplace α = 1): the
    classic distributed text-classifier fit — ONE combiner pass to
    (lang, word) counts, node-sized class totals, vocabulary size from
    a distinct count. Emits the top-``top_k`` highest-count words per
    class with their smoothed log-likelihoods log((c+1)/(N_c+V)) and
    the class log-prior (ties on count break word-ascending, exactly
    reproducible in SQL)."""
    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_topk
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text", "lang"])

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        words = batch["text"].fillna("").str.lower().str.split()
        lens = words.str.len().fillna(0).to_numpy(dtype=np.int64)
        if lens.sum() == 0:
            return pd.DataFrame({"lang": pd.Series(dtype="object"),
                                 "w": pd.Series(dtype="object"),
                                 "c": pd.Series(dtype="int64")})
        flat = np.concatenate([w for w in words.to_numpy() if w])
        lang = np.repeat(batch["lang"].to_numpy(), lens)
        g = pd.DataFrame({"lang": lang, "w": flat}) \
            .groupby(["lang", "w"], sort=False).size() \
            .reset_index(name="c")
        g["c"] = g["c"].astype("int64")
        return g

    counts = grouped_aggregate(
        ds.map_batches(explode, batch_format="pandas", batch_size=8192),
        ["lang", "w"], {"n": ("c", "sum")}, result_hint="large") \
        .materialize()
    vocab_v = grouped_aggregate(counts, ["w"],
                                {"k": (None, "count")},
                                result_hint="large").count()
    cls = grouped_aggregate(counts, ["lang"],
                            {"tok": ("n", "sum"),
                             "types": (None, "count")}).to_pandas()
    ndocs = grouped_aggregate(ds, ["lang"],
                              {"docs": (None, "count")}).to_pandas()
    total_docs = int(ndocs["docs"].sum())

    top = grouped_topk(counts, ["lang"], order_by="n", k=top_k,
                       tie_cols=["w"]).to_pandas()
    top = top.merge(cls[["lang", "tok"]], on="lang") \
        .merge(ndocs, on="lang")
    loglik = np.log(top["n"].to_numpy(np.float64) + 1.0) \
        - np.log(top["tok"].to_numpy(np.float64) + float(vocab_v))
    logprior = np.log(top["docs"].to_numpy(np.float64)) \
        - np.log(float(total_docs))
    out = pd.DataFrame({"lang": top["lang"], "word": top["w"],
                        "n": top["n"].astype("int64"),
                        "loglik": np.round(loglik, 6),
                        "logprior": np.round(logprior, 6)})
    return out.sort_values(["lang", "n", "word"],
                           ascending=[True, False, True]) \
        .reset_index(drop=True)


def doc_sorted_neighborhood(sf_dir: str, *, window: int = 3,
                            key_chars: int = 24):
    """Sorted-neighborhood blocking (Hernández & Stolfo '95) — the
    third candidate-generation strategy next to LSH and prefix
    filtering: docs sort by a normalized key (first ``key_chars``
    lowercased characters), and every pair within ``window`` positions
    becomes a candidate (doc_a, doc_b, rank_gap).

    Scale shape: the global rank comes from ONE key-ordered exchange
    (per-block sort + block-offset scan — no driver data); pair
    generation then ships each row to its own rank-anchor plus the
    ``window`` anchors above it, so pairs materialize co-located,
    bounded by window × corpus. Oracled by the row_number self-join."""
    from jerex_ray.ops.dedup import sorted_neighborhood_pairs
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    out = sorted_neighborhood_pairs(ds, window=window,
                                    key_chars=key_chars).to_pandas()
    if "doc_a" not in out.columns:
        return pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                             "doc_b": pd.Series(dtype="int64"),
                             "rank_gap": pd.Series(dtype="int64")})
    out = out.astype({"doc_a": "int64", "doc_b": "int64",
                      "rank_gap": "int64"})
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def doc_nb_predict(sf_dir: str):
    """Naive-Bayes inference chained on the ``doc_nb_model`` fit: every
    document classified by argmax over classes of
    logprior + Σ_w cnt·log((n_{c,w}+1)/(N_c+V)), OOV words contributing
    the smoothed floor −log(N_c+V). The model (full (lang, word) count
    table) broadcasts ONCE — vocabulary-bounded like the unigram-LM
    table — and each batch classifies vectorized: word→row index map,
    one (words × classes) gather, one ``np.add.at`` scatter per class
    column. Ties break lang-ascending (both engines)."""
    import ray

    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text", "lang"])

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        words = batch["text"].fillna("").str.lower().str.split()
        lens = words.str.len().fillna(0).to_numpy(dtype=np.int64)
        if lens.sum() == 0:
            return pd.DataFrame({"lang": pd.Series(dtype="object"),
                                 "w": pd.Series(dtype="object"),
                                 "c": pd.Series(dtype="int64")})
        flat = np.concatenate([w for w in words.to_numpy() if w])
        lang = np.repeat(batch["lang"].to_numpy(), lens)
        g = pd.DataFrame({"lang": lang, "w": flat}) \
            .groupby(["lang", "w"], sort=False).size() \
            .reset_index(name="c")
        g["c"] = g["c"].astype("int64")
        return g

    counts = grouped_aggregate(
        ds.map_batches(explode, batch_format="pandas", batch_size=8192),
        ["lang", "w"], {"n": ("c", "sum")}, result_hint="large") \
        .to_pandas()
    ndocs = grouped_aggregate(ds, ["lang"],
                              {"docs": (None, "count")}).to_pandas()
    langs = sorted(ndocs["lang"])
    lidx = {l: i for i, l in enumerate(langs)}
    total_docs = float(ndocs["docs"].sum())
    logprior = np.full(len(langs), -np.inf)
    for l, d in zip(ndocs["lang"], ndocs["docs"]):
        logprior[lidx[l]] = np.log(float(d)) - np.log(total_docs)
    vocab = sorted(set(counts["w"])) if len(counts) else []
    widx = {w: i for i, w in enumerate(vocab)}
    V = float(len(vocab))
    tok = counts.groupby("lang")["n"].sum()
    denom = np.array([np.log(float(tok.get(l, 0)) + V) for l in langs])
    # loglik matrix (V+1 rows; last row = OOV floor log(1)−log(N_c+V))
    L = np.tile(-denom, (len(vocab) + 1, 1))
    if len(counts):
        r = counts["w"].map(widx).to_numpy(np.int64)
        cidx = counts["lang"].map(lidx).to_numpy(np.int64)
        L[r, cidx] = np.log(counts["n"].to_numpy(np.float64) + 1.0) \
            - denom[cidx]
    model = ray.put((widx, L, logprior, langs))

    def classify(batch: pd.DataFrame) -> pd.DataFrame:
        wmap, mat, prior, cls = ray.get(model)
        words = batch["text"].fillna("").str.lower().str.split()
        lens = words.str.len().fillna(0).to_numpy(dtype=np.int64)
        scores = np.tile(prior, (len(batch), 1))
        if lens.sum() > 0:
            flat = np.concatenate(
                [w if w else [] for w in words.to_numpy()])
            owner = np.repeat(np.arange(len(batch)), lens)
            rows = pd.Series(flat).map(wmap) \
                .fillna(len(mat) - 1).to_numpy(np.int64)
            np.add.at(scores, owner, mat[rows])
        best = np.argmin(  # argmax score, ties → smallest lang index
            np.where(scores == scores.max(axis=1, keepdims=True),
                     np.arange(len(cls)), len(cls)), axis=1)
        s = scores[np.arange(len(batch)), best]
        return pd.DataFrame(
            {"doc_id": batch["doc_id"],
             "pred_lang": np.asarray(cls, dtype=object)[best],
             "score": np.copysign(np.floor(np.abs(s) * 1e6 + 0.5),
                                  s) / 1e6})

    out = ds.map_batches(classify, batch_format="pandas",
                         batch_size=4096).to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def emb_mutual_nn(sf_dir: str):
    """Mutual nearest-neighbor pairs (reciprocal top-1 cosine) — the
    high-precision pairing primitive under bitext mining and
    dedup canonicalization: (a, b) kept iff a is b's single nearest
    neighbor AND b is a's. Reuses the oracle-proven partial-top-k
    kernel for the top-1 scan, then one pair-keyed combiner count
    keeps the pairs seen from BOTH directions."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.ops.ann import brute_force_topk
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    df = ds.to_pandas()
    order = np.argsort(df["vec_id"].to_numpy())
    ids = df["vec_id"].to_numpy()[order]
    mat = np.stack(df["embedding"].to_numpy()[order])
    top = brute_force_topk(ds, mat, k=2)
    top["src"] = ids[top["query_idx"].to_numpy(np.int64)]
    top = top[top["src"] != top["vec_id"]]
    nn1 = top.sort_values(["src", "cosine", "vec_id"],
                          ascending=[True, False, True]) \
        .drop_duplicates("src")
    lo = np.minimum(nn1["src"].to_numpy(np.int64),
                    nn1["vec_id"].to_numpy(np.int64))
    hi = np.maximum(nn1["src"].to_numpy(np.int64),
                    nn1["vec_id"].to_numpy(np.int64))
    g = pd.DataFrame({"lo": lo, "hi": hi}) \
        .groupby(["lo", "hi"]).size().reset_index(name="k")
    m = g[g["k"] == 2]
    return pd.DataFrame({"vec_a": m["lo"].to_numpy(np.int64),
                         "vec_b": m["hi"].to_numpy(np.int64)}) \
        .sort_values("vec_a").reset_index(drop=True)


def q_events_interpolate(sf_dir: str):
    """Per-user hourly gap filling with linear interpolation — the
    time-series regularization step before any windowed model: observed
    hours carry their mean value, missing hours between a user's first
    and last observation interpolate linearly between the neighboring
    observed hours. Users co-locate in ONE hash shuffle; each block
    builds the hour spines vectorized (searchsorted against the
    observed hours — no per-hour loop), with the interpolation
    expression bit-matching the oracle's window-function arithmetic."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "value"])

    def interp(block: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                            "hour": pd.Series(dtype="int64"),
                            "value": pd.Series(dtype="float64"),
                            "observed": pd.Series(dtype="int64")})
        if block.empty:
            return out
        b = block.copy()
        b["hour"] = b["ts"].dt.floor("h") \
            .astype("datetime64[us]").astype("int64") // 3_600_000_000
        obs = b.groupby(["user_id", "hour"], sort=True)["value"] \
            .mean().reset_index()
        parts = []
        for uid, g in obs.groupby("user_id", sort=False):
            oh = g["hour"].to_numpy(np.int64)
            ov = g["value"].to_numpy(np.float64)
            h = np.arange(oh[0], oh[-1] + 1, dtype=np.int64)
            idx = np.searchsorted(oh, h, side="right") - 1
            seen = oh[idx] == h
            nxt = np.minimum(idx + 1, len(oh) - 1)
            frac = (h - oh[idx]).astype(np.float64) \
                / np.maximum(oh[nxt] - oh[idx], 1).astype(np.float64)
            v = np.where(seen, ov[idx],
                         ov[idx] + (ov[nxt] - ov[idx]) * frac)
            parts.append(pd.DataFrame(
                {"user_id": np.full(len(h), uid, dtype=np.int64),
                 "hour": h,
                 "value": np.copysign(np.floor(np.abs(v) * 1e6 + 0.5),
                                      v) / 1e6,
                 "observed": seen.astype(np.int64)}))
        return pd.concat(parts, ignore_index=True)

    out = grouped_apply(ds, ["user_id"], interp).to_pandas()
    out = out.astype({"user_id": "int64", "hour": "int64",
                      "observed": "int64"})
    return out.sort_values(["user_id", "hour"]).reset_index(drop=True)


def q_lineitem_ols2(sf_dir: str):
    """Two-feature grouped OLS (extendedprice ~ quantity + discount per
    returnflag) by the exact normal equations, TWO-PASS for numeric
    parity: pass 1 reduces to per-group means (combiner), the broadcast
    means recenter pass 2's five centered-product sums (Σx̃₁², Σx̃₂²,
    Σx̃₁x̃₂, Σx̃₁ỹ, Σx̃₂ỹ — raw-power sums would cancel catastrophically
    and did flip the 6th decimal at sf0.01), then the 2×2 Cramer solve
    on the |groups|-bounded driver table. The oracle replays the
    identical two-pass arithmetic in SQL (no multivariate regr_*
    exists)."""
    import ray

    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/lineitem.parquet",
                            columns=["l_returnflag", "l_quantity",
                                     "l_discount", "l_extendedprice"])

    st = grouped_aggregate(ds, ["l_returnflag"],
                           {"n": (None, "count"),
                            "s1": ("l_quantity", "sum"),
                            "s2": ("l_discount", "sum"),
                            "sy": ("l_extendedprice", "sum")}) \
        .to_pandas()
    nn = st["n"].to_numpy(np.float64)
    mu = {rf: (s1 / k, s2 / k, sy / k)
          for rf, s1, s2, sy, k in zip(
              st["l_returnflag"], st["s1"].to_numpy(np.float64),
              st["s2"].to_numpy(np.float64),
              st["sy"].to_numpy(np.float64), nn)}
    mu_ref = ray.put(mu)

    def central(df: pd.DataFrame) -> pd.DataFrame:
        means = ray.get(mu_ref)
        m1 = df["l_returnflag"].map({k: v[0] for k, v in means.items()})
        m2 = df["l_returnflag"].map({k: v[1] for k, v in means.items()})
        my = df["l_returnflag"].map({k: v[2] for k, v in means.items()})
        x1 = df["l_quantity"].to_numpy(np.float64) - m1.to_numpy()
        x2 = df["l_discount"].to_numpy(np.float64) - m2.to_numpy()
        y = df["l_extendedprice"].to_numpy(np.float64) - my.to_numpy()
        g = pd.DataFrame({"l_returnflag": df["l_returnflag"].to_numpy(),
                          "c11": x1 * x1, "c22": x2 * x2,
                          "c12": x1 * x2, "c1y": x1 * y,
                          "c2y": x2 * y})
        return g.groupby("l_returnflag", sort=False, as_index=False) \
            .sum()

    m = grouped_aggregate(
        ds.map_batches(central, batch_format="pandas"),
        ["l_returnflag"],
        {k: (k, "sum") for k in ("c11", "c22", "c12", "c1y", "c2y")}) \
        .to_pandas().merge(st, on="l_returnflag")
    n = m["n"].to_numpy(np.float64)
    S11, S22, S12 = m["c11"], m["c22"], m["c12"]
    S1y, S2y = m["c1y"], m["c2y"]
    det = S11 * S22 - S12 * S12
    b1 = (S22 * S1y - S12 * S2y) / det
    b2 = (S11 * S2y - S12 * S1y) / det
    b0 = m["sy"] / n - b1 * m["s1"] / n - b2 * m["s2"] / n
    out = pd.DataFrame({"l_returnflag": m["l_returnflag"],
                        "n": m["n"].astype("int64"),
                        "b_qty": b1.round(6),
                        "b_disc": b2.round(6),
                        "intercept": b0.round(6)})
    return out.sort_values("l_returnflag").reset_index(drop=True)


def q_events_auc(sf_dir: str):
    """Exact ROC AUC of event value as a score for 'is this a purchase'
    — the Mann-Whitney U statistic with full tie handling (average
    ranks), the model-eval primitive computed WITHOUT a global sort:
    ``relational.global_rank`` assigns exact ranks through quantile
    range buckets, equal scores then co-locate so each value group
    reduces to (n, n_pos, min-rank, max-rank); the tie-averaged rank is
    (min+max)/2 and only three scalars reach the driver."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.relational import global_rank
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "event_type", "value"])

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_id": df["event_id"],
            "value": df["value"].astype("float64"),
            "pos": (df["event_type"] == "purchase").astype("int64")})

    ranked = global_rank(ds.map_batches(flag, batch_format="pandas"),
                         value_col="value", id_col="event_id")
    g = grouped_aggregate(ranked, ["value"],
                          {"n": (None, "count"), "np": ("pos", "sum"),
                           "rmin": ("rnk", "min"),
                           "rmax": ("rnk", "max")},
                          result_hint="large")

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "np" not in df.columns:
            return pd.DataFrame({"__all": pd.Series(dtype="int64"),
                                 "s": pd.Series(dtype="float64"),
                                 "p": pd.Series(dtype="int64"),
                                 "t": pd.Series(dtype="int64")})
        ar = (df["rmin"].to_numpy(np.float64)
              + df["rmax"].to_numpy(np.float64)) / 2.0 + 1.0
        return pd.DataFrame({"__all": [np.int64(0)],
                             "s": [(df["np"].to_numpy(np.float64)
                                    * ar).sum()],
                             "p": [np.int64(df["np"].sum())],
                             "t": [np.int64(df["n"].sum())]})

    m = grouped_aggregate(g.map_batches(partials, batch_format="pandas",
                                        batch_size=None),
                          ["__all"], {"s": ("s", "sum"),
                                      "p": ("p", "sum"),
                                      "t": ("t", "sum")}).to_pandas()
    P = float(m["p"][0])
    N = float(m["t"][0]) - P
    auc = (float(m["s"][0]) - P * (P + 1.0) / 2.0) / (P * N)
    return pd.DataFrame({"n_pos": [np.int64(P)], "n_neg": [np.int64(N)],
                         "auc": [round(auc, 6)]})


def doc_hapax(sf_dir: str):
    """Per-source hapax-legomenon profile (vocabulary size, words
    occurring exactly once, hapax ratio) — the corpus-maturity
    diagnostic (a shrinking hapax share signals saturation/duplication).
    One combiner pass to (source, word) counts, then a vocab-bounded
    aggregate of count==1 indicators per source."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["source", "text"])

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        words = batch["text"].fillna("").str.lower().str.split()
        lens = words.str.len().fillna(0).to_numpy(dtype=np.int64)
        if lens.sum() == 0:
            return pd.DataFrame({"source": pd.Series(dtype="object"),
                                 "w": pd.Series(dtype="object"),
                                 "c": pd.Series(dtype="int64")})
        flat = np.concatenate([w for w in words.to_numpy() if w])
        src = np.repeat(batch["source"].to_numpy(), lens)
        g = pd.DataFrame({"source": src, "w": flat}) \
            .groupby(["source", "w"], sort=False).size() \
            .reset_index(name="c")
        g["c"] = g["c"].astype("int64")
        return g

    counts = grouped_aggregate(
        ds.map_batches(explode, batch_format="pandas", batch_size=8192),
        ["source", "w"], {"n": ("c", "sum")}, result_hint="large")

    def flags(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "n" not in df.columns:
            return pd.DataFrame({"source": pd.Series(dtype="object"),
                                 "vocab": pd.Series(dtype="int64"),
                                 "hapax": pd.Series(dtype="int64")})
        g = df.assign(one=(df["n"] == 1).astype("int64")) \
            .groupby("source", sort=False) \
            .agg(vocab=("n", "size"), hapax=("one", "sum"))
        return g.reset_index()

    out = grouped_aggregate(
        counts.map_batches(flags, batch_format="pandas"),
        ["source"], {"vocab": ("vocab", "sum"),
                     "hapax": ("hapax", "sum")}).to_pandas()
    out["vocab"] = out["vocab"].astype("int64")
    out["hapax"] = out["hapax"].astype("int64")
    out["hapax_ratio"] = (out["hapax"] / out["vocab"]).round(6)
    return out.sort_values("source").reset_index(drop=True)


def doc_zipf_slope(sf_dir: str, *, top_k: int = 1000):
    """Zipf's-law fit per source: OLS slope of ln(frequency) against
    ln(rank) over the top-``top_k`` words (natural text ≈ −1; flatter
    slopes flag templated/duplicated corpora). Combiner word counts →
    exact distributed top-k (the ≤ k×keys-shuffle combiner) → per-source
    co-located rank assignment and OLS co-moment partials; slopes close
    over the |sources|-bounded driver table, same centered arithmetic
    as DuckDB regr_slope (the oracle)."""
    from jerex_ray.functions.aggregate import (grouped_aggregate,
                                               grouped_apply,
                                               grouped_topk)
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["source", "text"])

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        words = batch["text"].fillna("").str.lower().str.split()
        lens = words.str.len().fillna(0).to_numpy(dtype=np.int64)
        if lens.sum() == 0:
            return pd.DataFrame({"source": pd.Series(dtype="object"),
                                 "w": pd.Series(dtype="object"),
                                 "c": pd.Series(dtype="int64")})
        flat = np.concatenate([w for w in words.to_numpy() if w])
        src = np.repeat(batch["source"].to_numpy(), lens)
        g = pd.DataFrame({"source": src, "w": flat}) \
            .groupby(["source", "w"], sort=False).size() \
            .reset_index(name="c")
        g["c"] = g["c"].astype("int64")
        return g

    counts = grouped_aggregate(
        ds.map_batches(explode, batch_format="pandas", batch_size=8192),
        ["source", "w"], {"n": ("c", "sum")}, result_hint="large")
    top = grouped_topk(counts, ["source"], order_by="n", k=top_k,
                       tie_cols=["w"])

    def ols_partials(block: pd.DataFrame) -> pd.DataFrame:
        cols = {"source": pd.Series(dtype="object"),
                "n": pd.Series(dtype="int64"),
                "sx": pd.Series(dtype="float64"),
                "sy": pd.Series(dtype="float64"),
                "sxx": pd.Series(dtype="float64"),
                "sxy": pd.Series(dtype="float64")}
        if block.empty or "source" not in block.columns:
            return pd.DataFrame(cols)
        parts = []
        for src, g in block.groupby("source", sort=False):
            s = g.sort_values(["n", "w"], ascending=[False, True])
            x = np.log(np.arange(1, len(s) + 1, dtype=np.float64))
            y = np.log(s["n"].to_numpy(np.float64))
            parts.append(pd.DataFrame(
                {"source": [src], "n": [np.int64(len(s))],
                 "sx": [x.sum()], "sy": [y.sum()],
                 "sxx": [(x * x).sum()], "sxy": [(x * y).sum()]}))
        return pd.concat(parts, ignore_index=True)

    m = grouped_apply(top, ["source"], ols_partials).to_pandas()
    n = m["n"].to_numpy(np.float64)
    vx = m["sxx"] - m["sx"] ** 2 / n
    cov = m["sxy"] - m["sx"] * m["sy"] / n
    slope = cov / vx
    out = pd.DataFrame({"source": m["source"],
                        "n_terms": m["n"].astype("int64"),
                        "slope": slope.round(6),
                        "intercept": (m["sy"] / n
                                      - slope * m["sx"] / n).round(6)})
    return out.sort_values("source").reset_index(drop=True)


def q_events_decayed_sum(sf_dir: str, *, tau_days: float = 1.0):
    """Exponentially time-decayed per-user value sum as of the stream's
    end (w = exp(−Δt/τ), τ = 1 day) — the standard recency-weighted
    engagement feature. One combiner pass: the global max timestamp is
    a scalar pre-pass, every batch weights locally in integer
    microseconds (no float epoch drift), per-user partials reduce."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "value"])
    tmax = int(ds.map_batches(
        lambda b: pd.DataFrame({"t_us": b["ts"]
                                .astype("datetime64[us]")
                                .astype("int64")}),
        batch_format="pandas").max("t_us"))
    scale = tau_days * 86400.0 * 1e6

    def weigh(df: pd.DataFrame) -> pd.DataFrame:
        t = df["ts"].astype("datetime64[us]").astype("int64") \
            .to_numpy()
        w = np.exp(-((tmax - t).astype(np.float64) / scale))
        g = pd.DataFrame({"user_id": df["user_id"].to_numpy(),
                          "wsum": w * df["value"].to_numpy(np.float64),
                          "wtot": w})
        return g.groupby("user_id", sort=False, as_index=False).sum()

    out = grouped_aggregate(
        ds.map_batches(weigh, batch_format="pandas"),
        ["user_id"], {"wsum": ("wsum", "sum"),
                      "wtot": ("wtot", "sum")}).to_pandas()
    out["user_id"] = out["user_id"].astype("int64")
    out["wsum"] = out["wsum"].round(6)
    out["wtot"] = out["wtot"].round(6)
    return out.sort_values("user_id").reset_index(drop=True)


def q_events_winsorized_mean(sf_dir: str, *, lo: float = 0.05,
                             hi: float = 0.95):
    """Winsorized mean of event value per type (values clamped to the
    exact type-7 [p05, p95] before averaging) — the robust-mean sibling
    of the trimmed mean, keeping every row's vote but bounding
    influence. The per-group bounds come from the shuffle-free exact
    grouped-quantile selector (three passes for ALL groups at once);
    clamping and the mean are then one more combiner pass."""
    import ray

    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.ops.quantiles import grouped_quantiles
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_type", "value"])
    qdf = grouped_quantiles(ds, "event_type", "value", [lo, hi])
    bounds = {}
    for t, g in qdf.groupby("event_type"):
        v = g.sort_values("q")["value"].to_numpy(np.float64)
        bounds[t] = (v[0], v[-1])
    b_ref = ray.put(bounds)

    def clamp(df: pd.DataFrame) -> pd.DataFrame:
        bl = ray.get(b_ref)
        lo_v = df["event_type"].map({k: v[0] for k, v in bl.items()}) \
            .to_numpy(np.float64)
        hi_v = df["event_type"].map({k: v[1] for k, v in bl.items()}) \
            .to_numpy(np.float64)
        v = np.clip(df["value"].to_numpy(np.float64), lo_v, hi_v)
        g = pd.DataFrame({"event_type": df["event_type"].to_numpy(),
                          "n": 1, "s": v})
        return g.groupby("event_type", sort=False, as_index=False) \
            .sum()

    m = grouped_aggregate(
        ds.map_batches(clamp, batch_format="pandas"),
        ["event_type"], {"n": ("n", "sum"),
                         "s": ("s", "sum")}).to_pandas()
    out = pd.DataFrame({
        "event_type": m["event_type"],
        "n": m["n"].astype("int64"),
        "winsorized_mean": (m["s"].to_numpy(np.float64)
                            / m["n"].to_numpy(np.float64)).round(6)})
    return out.sort_values("event_type").reset_index(drop=True)


def q_user_als_step(sf_dir: str, *, rank: int = 2, lam: float = 0.1):
    """One exact ALS half-step of a rank-2 matrix factorization over
    the user × event-type count matrix — the collaborative-filtering
    training primitive: item factors are FIXED md5-derived constants
    (so the SQL oracle replays them bit-for-bit), and each user's
    factor solves the ridge normal equations
    x_u = (Σ_i f_i f_iᵀ + λI)⁻¹ Σ_i c_ui f_i over the user's observed
    items, by the closed 2×2 Cramer solve. Dataflow: one combiner pass
    to (user, type) counts, the |types|-bounded factor table broadcasts,
    per-user sums reduce — users never co-reside, no shuffle beyond the
    count aggregate."""
    import hashlib

    import ray

    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type"])
    counts = grouped_aggregate(ds, ["user_id", "event_type"],
                               {"c": (None, "count")},
                               result_hint="large").materialize()

    def factor(t: str, j: int) -> float:
        h = hashlib.md5(f"{t}|{j}".encode()).hexdigest()[:8]
        return (int(h, 16) % 1000000) / 1000000.0 - 0.5

    types = sorted(set(
        counts.map_batches(
            lambda b: pd.DataFrame({"event_type": b["event_type"]
                                    .unique()}),
            batch_format="pandas").to_pandas()["event_type"]))
    fmap = {t: (factor(t, 1), factor(t, 2)) for t in types}
    f_ref = ray.put(fmap)

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        fm = ray.get(f_ref)
        if df.empty or "c" not in df.columns:
            return pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                                 **{k: pd.Series(dtype="float64")
                                    for k in ("a11", "a12", "a22",
                                              "b1", "b2")}})
        f1 = df["event_type"].map({k: v[0] for k, v in fm.items()}) \
            .to_numpy(np.float64)
        f2 = df["event_type"].map({k: v[1] for k, v in fm.items()}) \
            .to_numpy(np.float64)
        c = df["c"].to_numpy(np.float64)
        g = pd.DataFrame({"user_id": df["user_id"].to_numpy(),
                          "a11": f1 * f1, "a12": f1 * f2,
                          "a22": f2 * f2, "b1": c * f1, "b2": c * f2})
        return g.groupby("user_id", sort=False, as_index=False).sum()

    m = grouped_aggregate(
        counts.map_batches(partials, batch_format="pandas"),
        ["user_id"],
        {k: (k, "sum") for k in ("a11", "a12", "a22", "b1", "b2")}) \
        .to_pandas()
    a11 = m["a11"].to_numpy(np.float64) + lam
    a22 = m["a22"].to_numpy(np.float64) + lam
    a12 = m["a12"].to_numpy(np.float64)
    b1 = m["b1"].to_numpy(np.float64)
    b2 = m["b2"].to_numpy(np.float64)
    det = a11 * a22 - a12 * a12
    out = pd.DataFrame({"user_id": m["user_id"].astype("int64"),
                        "x1": ((a22 * b1 - a12 * b2) / det).round(6),
                        "x2": ((a11 * b2 - a12 * b1) / det).round(6)})
    return out.sort_values("user_id").reset_index(drop=True)


def q_user_features(sf_dir: str):
    """Feature-store assembly: one wide per-user training-feature row
    (event count, mean value, distinct event types, active days, span
    days) — the materialization shape every downstream model consumes.
    Everything reduces in ONE combiner pass except distinct types and
    active days, which pre-dedup under (user, key) co-location first
    (the dedup-explode-dedup shape) so no count-distinct state grows
    unbounded."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type", "ts",
                                     "value"])

    def base(df: pd.DataFrame) -> pd.DataFrame:
        d = df["ts"].astype("datetime64[us]").astype("int64") \
            // 86_400_000_000
        g = pd.DataFrame({"user_id": df["user_id"].to_numpy(),
                          "n": 1,
                          "s": df["value"].to_numpy(np.float64),
                          "dmin": d, "dmax": d})
        return g.groupby("user_id", sort=False, as_index=False) \
            .agg(n=("n", "sum"), s=("s", "sum"),
                 dmin=("dmin", "min"), dmax=("dmax", "max"))

    b = grouped_aggregate(ds.map_batches(base, batch_format="pandas"),
                          ["user_id"],
                          {"n": ("n", "sum"), "s": ("s", "sum"),
                           "dmin": ("dmin", "min"),
                           "dmax": ("dmax", "max")}).to_pandas()

    types = grouped_aggregate(ds, ["user_id", "event_type"],
                              {"k": (None, "count")},
                              result_hint="large")
    n_types = grouped_aggregate(types, ["user_id"],
                                {"n_types": (None, "count")}) \
        .to_pandas()

    def day_rows(df: pd.DataFrame) -> pd.DataFrame:
        d = df["ts"].astype("datetime64[us]").astype("int64") \
            // 86_400_000_000
        return pd.DataFrame({"user_id": df["user_id"].to_numpy(),
                             "day": d}).drop_duplicates()

    days = grouped_aggregate(
        ds.map_batches(day_rows, batch_format="pandas"),
        ["user_id", "day"], {"k": (None, "count")},
        result_hint="large")
    n_days = grouped_aggregate(days, ["user_id"],
                               {"n_days": (None, "count")}).to_pandas()

    out = b.merge(n_types, on="user_id").merge(n_days, on="user_id")
    mv = out["s"].to_numpy(np.float64) / out["n"].to_numpy(np.float64)
    res = pd.DataFrame({
        "user_id": out["user_id"].astype("int64"),
        "n_events": out["n"].astype("int64"),
        # half-away mirror: np.round is half-even, DuckDB half-away,
        # and means of 2-decimal values DO land on exact .5 boundaries
        "mean_value": np.copysign(np.floor(np.abs(mv) * 1e6 + 0.5),
                                  mv) / 1e6,
        "n_types": out["n_types"].astype("int64"),
        "active_days": out["n_days"].astype("int64"),
        "span_days": (out["dmax"] - out["dmin"]).astype("int64")})
    return res.sort_values("user_id").reset_index(drop=True)


def q_events_dp_counts(sf_dir: str, *, epsilon: float = 1.0):
    """Differentially-private count release per event type (Laplace
    mechanism, sensitivity 1): noise is SEEDED — the md5 of the type
    maps to a uniform in (0,1), inverted through the Laplace CDF — so
    the release is reproducible, auditable, and the SQL oracle replays
    the identical noise bit-for-bit. The aggregate is one combiner
    count; the noise adds per released row (|types|-bounded), which is
    exactly where DP noise belongs at scale — never per record."""
    import hashlib

    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_type"])
    m = grouped_aggregate(ds, ["event_type"],
                          {"n": (None, "count")}).to_pandas()

    def laplace(t: str) -> float:
        h = hashlib.md5(f"dp|{t}".encode()).hexdigest()[:13]
        u = (int(h, 16) % 1000000007) / 1000000007.0 - 0.5
        # inverse CDF: -b*sign(u)*ln(1-2|u|), b = 1/eps
        return -(1.0 / epsilon) * np.sign(u) * np.log(1.0 - 2.0 * abs(u))

    noise = np.array([laplace(t) for t in m["event_type"]])
    out = pd.DataFrame({
        "event_type": m["event_type"],
        "true_n": m["n"].astype("int64"),
        "dp_n": (m["n"].to_numpy(np.float64) + noise).round(6)})
    return out.sort_values("event_type").reset_index(drop=True)


def doc_sentence_stats(sf_dir: str):
    """Per-document sentence segmentation profile (sentence count,
    mean and max words per sentence) by the deterministic [.!?]+ rule
    — the readability-style quality signal upstream models filter on.
    Fully vectorized: one regex split per batch, explode, two grouped
    reductions; oracled by the identical regexp split in SQL."""
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def stats(batch: pd.DataFrame) -> pd.DataFrame:
        sents = batch["text"].fillna("").str.split(r"[.!?]+", regex=True)
        ids = batch["doc_id"].to_numpy()
        lens = sents.str.len().fillna(0).to_numpy(np.int64)
        flat = [s for lst in sents.to_numpy() for s in lst]
        owner = np.repeat(np.arange(len(batch)), lens)
        words = pd.Series(flat).str.split().str.len() \
            .fillna(0).to_numpy(np.int64)
        keep = words > 0
        owner, words = owner[keep], words[keep]
        g = pd.DataFrame({"i": owner, "w": words}).groupby("i")["w"] \
            .agg(["size", "mean", "max"])
        n = np.zeros(len(batch), dtype=np.int64)
        mean = np.zeros(len(batch), dtype=np.float64)
        mx = np.zeros(len(batch), dtype=np.int64)
        n[g.index] = g["size"].to_numpy(np.int64)
        mean[g.index] = g["mean"].to_numpy(np.float64)
        mx[g.index] = g["max"].to_numpy(np.int64)
        # DuckDB round() is half-away-from-zero; mirror it
        mean_r = np.copysign(np.floor(np.abs(mean) * 1e6 + 0.5),
                             mean) / 1e6
        return pd.DataFrame({"doc_id": ids, "n_sentences": n,
                             "mean_words": mean_r,
                             "max_words": mx})

    out = ds.map_batches(stats, batch_format="pandas",
                         batch_size=4096).to_pandas()
    out = out.astype({"doc_id": "int64", "n_sentences": "int64",
                      "max_words": "int64"})
    return out.sort_values("doc_id").reset_index(drop=True)


def q_orders_streak(sf_dir: str):
    """Longest run of strictly-increasing order totals per customer in
    (date, key) order — the gaps-and-islands shape applied to
    monotonicity (streak features feed churn/LTV models). Customers
    co-locate in ONE hash shuffle; each block computes runs vectorized:
    a boolean "rise" vector, island ids by cumulative sum of breaks,
    max island length per customer. Oracled by the SQL islands
    construction (row_number difference over the rise flag)."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/orders.parquet",
                            columns=["o_custkey", "o_orderkey",
                                     "o_orderdate", "o_totalprice"])

    def streaks(block: pd.DataFrame) -> pd.DataFrame:
        if block.empty:
            return pd.DataFrame({"o_custkey": pd.Series(dtype="int64"),
                                 "n_orders": pd.Series(dtype="int64"),
                                 "max_streak": pd.Series(dtype="int64")})
        b = block.sort_values(["o_custkey", "o_orderdate",
                               "o_orderkey"])
        cust = b["o_custkey"].to_numpy()
        price = b["o_totalprice"].to_numpy(np.float64)
        same = np.r_[False, cust[1:] == cust[:-1]]
        rise = np.r_[False, price[1:] > price[:-1]] & same
        # island id increments whenever the run breaks
        island = np.cumsum(~rise)
        runs = pd.DataFrame({"cust": cust, "island": island}) \
            .groupby(["cust", "island"], sort=False).size()
        mx = runs.groupby(level=0).max()
        cnt = pd.Series(cust).value_counts()
        return pd.DataFrame({"o_custkey": mx.index.to_numpy(np.int64),
                             "n_orders": cnt.loc[mx.index]
                             .to_numpy(np.int64),
                             "max_streak": mx.to_numpy(np.int64)})

    out = grouped_apply(ds, ["o_custkey"], streaks).to_pandas()
    out = out.astype({"o_custkey": "int64", "n_orders": "int64",
                      "max_streak": "int64"})
    return out.sort_values("o_custkey").reset_index(drop=True)


def doc_simpson_diversity(sf_dir: str):
    """Simpson lexical diversity per source, 1 − Σ p(w)² (the
    probability two random tokens differ) — the repetition-sensitive
    corpus-health twin of word entropy. One combiner pass to (source,
    word) counts, a vocab-bounded Σc² reduce, |sources| scalars out."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["source", "text"])

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        words = batch["text"].fillna("").str.lower().str.split()
        lens = words.str.len().fillna(0).to_numpy(dtype=np.int64)
        if lens.sum() == 0:
            return pd.DataFrame({"source": pd.Series(dtype="object"),
                                 "w": pd.Series(dtype="object"),
                                 "c": pd.Series(dtype="int64")})
        flat = np.concatenate([w for w in words.to_numpy() if w])
        src = np.repeat(batch["source"].to_numpy(), lens)
        g = pd.DataFrame({"source": src, "w": flat}) \
            .groupby(["source", "w"], sort=False).size() \
            .reset_index(name="c")
        g["c"] = g["c"].astype("int64")
        return g

    counts = grouped_aggregate(
        ds.map_batches(explode, batch_format="pandas", batch_size=8192),
        ["source", "w"], {"n": ("c", "sum")}, result_hint="large")

    def sq(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "n" not in df.columns:
            return pd.DataFrame({"source": pd.Series(dtype="object"),
                                 "tok": pd.Series(dtype="int64"),
                                 "sq": pd.Series(dtype="float64")})
        c = df["n"].to_numpy(np.float64)
        g = pd.DataFrame({"source": df["source"].to_numpy(),
                          "tok": df["n"].to_numpy(np.int64),
                          "sq": c * c}) \
            .groupby("source", sort=False, as_index=False).sum()
        return g

    m = grouped_aggregate(counts.map_batches(sq, batch_format="pandas"),
                          ["source"], {"tok": ("tok", "sum"),
                                       "sq": ("sq", "sum")}).to_pandas()
    tok = m["tok"].to_numpy(np.float64)
    out = pd.DataFrame({
        "source": m["source"],
        "n_tokens": m["tok"].astype("int64"),
        "simpson": (1.0 - m["sq"].to_numpy(np.float64)
                    / (tok * tok)).round(6)})
    return out.sort_values("source").reset_index(drop=True)


def q_events_entropy_rate(sf_dir: str):
    """Per-user Markov entropy rate of the event-type sequence:
    H = −Σᵢ p(i) Σⱼ p(j|i) log₂ p(j|i) over the user's observed
    transitions — how predictable a user's behavior is (0 =
    deterministic cycling). Transition counts come from the same
    co-located shifted-view pair pass as the transition matrix; the
    entropy closes over per-user |types|²-bounded tables. Oracled by
    the LEAD-based SQL transition counts and the identical closed
    form."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts",
                                     "event_type"])

    def entropy(block: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                            "n_transitions": pd.Series(dtype="int64"),
                            "entropy_rate": pd.Series(dtype="float64")})
        if block.empty:
            return out
        b = block.sort_values(["user_id", "ts", "event_id"])
        uid = b["user_id"].to_numpy()
        et = b["event_type"].to_numpy()
        same = uid[1:] == uid[:-1]
        pairs = pd.DataFrame({"user_id": uid[:-1][same],
                              "a": et[:-1][same], "b": et[1:][same]})
        if pairs.empty:
            return out
        c = pairs.groupby(["user_id", "a", "b"], sort=False) \
            .size().reset_index(name="n")
        rows = []
        for u, g in c.groupby("user_id", sort=False):
            n = g["n"].to_numpy(np.float64)
            tot = n.sum()
            ca = g.groupby("a")["n"].transform("sum") \
                .to_numpy(np.float64)
            # Σ_ij (n_ij/tot) * log2(n_ij / c_a)  (p(i)·p(j|i) form)
            h = -np.sum((n / tot) * (np.log2(n) - np.log2(ca)))
            rows.append((u, int(tot), h))
        r = pd.DataFrame(rows, columns=["user_id", "n_transitions",
                                        "entropy_rate"])
        r["entropy_rate"] = np.round(r["entropy_rate"], 6)
        return r

    out = grouped_apply(ds, ["user_id"], entropy).to_pandas()
    out = out.astype({"user_id": "int64", "n_transitions": "int64"})
    return out.sort_values("user_id").reset_index(drop=True)


def q_events_peak_hours(sf_dir: str):
    """Diurnal profile per event type: the peak hour-of-day (mode,
    ties → smallest hour) and its traffic share — the load-shaping /
    anomaly-baseline primitive. One combiner pass over (type, hour)
    cells; the 24-row-per-type table closes on the driver."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_type", "ts"])

    def cells(df: pd.DataFrame) -> pd.DataFrame:
        h = (df["ts"].astype("datetime64[us]").astype("int64")
             // 3_600_000_000) % 24
        g = pd.DataFrame({"event_type": df["event_type"].to_numpy(),
                          "hour": h.to_numpy(np.int64)}) \
            .groupby(["event_type", "hour"], sort=False).size() \
            .reset_index(name="n")
        return g

    m = grouped_aggregate(ds.map_batches(cells, batch_format="pandas"),
                          ["event_type", "hour"],
                          {"n": ("n", "sum")}).to_pandas()
    tot = m.groupby("event_type")["n"].transform("sum")
    m = m.assign(tot=tot).sort_values(["event_type", "n", "hour"],
                                      ascending=[True, False, True])
    top = m.drop_duplicates("event_type")
    share = top["n"].to_numpy(np.float64) / top["tot"].to_numpy(np.float64)
    out = pd.DataFrame({
        "event_type": top["event_type"],
        "peak_hour": top["hour"].astype("int64"),
        "peak_n": top["n"].astype("int64"),
        "peak_share": np.copysign(np.floor(np.abs(share) * 1e6 + 0.5),
                                  share) / 1e6})
    return out.sort_values("event_type").reset_index(drop=True)


def q_orders_interarrival(sf_dir: str):
    """Median days between consecutive orders per customer (orders in
    (date, key) order) — the repurchase-cadence feature. Customers
    co-locate in ONE hash shuffle; each block computes lag diffs and
    the exact type-7 median vectorized per customer. Customers with
    one order have no gaps and are excluded (matching the SQL lag
    semantics)."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/orders.parquet",
                            columns=["o_custkey", "o_orderkey",
                                     "o_orderdate"])

    def gaps(block: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"o_custkey": pd.Series(dtype="int64"),
                            "n_gaps": pd.Series(dtype="int64"),
                            "median_gap_days":
                                pd.Series(dtype="float64")})
        if block.empty:
            return out
        b = block.sort_values(["o_custkey", "o_orderdate",
                               "o_orderkey"])
        cust = b["o_custkey"].to_numpy()
        d = b["o_orderdate"].astype("datetime64[us]").astype("int64") \
            .to_numpy() // 86_400_000_000
        same = cust[1:] == cust[:-1]
        gap = (d[1:] - d[:-1])[same].astype(np.float64)
        who = cust[1:][same]
        if len(gap) == 0:
            return out
        rows = []
        gdf = pd.DataFrame({"c": who, "g": gap})
        for c, g in gdf.groupby("c", sort=False):
            v = np.sort(g["g"].to_numpy(np.float64))
            # type-7 median == quantile_cont(0.5)
            mid = 0.5 * (len(v) - 1)
            lo, hi = int(np.floor(mid)), int(np.ceil(mid))
            med = v[lo] + (v[hi] - v[lo]) * (mid - lo)
            rows.append((c, len(v), round(float(med), 6)))
        return pd.DataFrame(rows, columns=["o_custkey", "n_gaps",
                                           "median_gap_days"])

    out = grouped_apply(ds, ["o_custkey"], gaps).to_pandas()
    out = out.astype({"o_custkey": "int64", "n_gaps": "int64"})
    return out.sort_values("o_custkey").reset_index(drop=True)


def doc_readability(sf_dir: str):
    """Flesch reading-ease per document with a DETERMINISTIC syllable
    rule (count of [aeiouy]+ runs per word — reproducible in SQL, no
    dictionary): 206.835 − 1.015·(words/sentences) −
    84.6·(syllables/words). Sentences split on [.!?]+, empty sentences
    dropped; docs with no words emit NULL. Fully vectorized — one
    regex pass per batch for each of the three counts."""
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        txt = batch["text"].fillna("").str.lower()
        words = txt.str.count(r"\S+").to_numpy(np.float64)
        sylls = txt.str.count(r"[aeiouy]+").to_numpy(np.float64)
        sents = txt.str.split(r"[.!?]+", regex=True) \
            .map(lambda ss: sum(1 for s in ss if s.split())) \
            .to_numpy(np.float64)
        ok = (words > 0) & (sents > 0)
        f = 206.835 \
            - 1.015 * (words / np.maximum(sents, 1.0)) \
            - 84.6 * (sylls / np.maximum(words, 1.0))
        f_r = np.copysign(np.floor(np.abs(f) * 1e6 + 0.5), f) / 1e6
        # docs with no words/sentences are dropped (SQL WHERE parity —
        # avoids NaN-vs-NULL hash ambiguity in the compare)
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "n_words": words.astype(np.int64),
            "n_syllables": sylls.astype(np.int64),
            "n_sentences": sents.astype(np.int64),
            "flesch": f_r})[ok]

    out = ds.map_batches(score, batch_format="pandas",
                         batch_size=4096).to_pandas()
    out = out.astype({"doc_id": "int64", "n_words": "int64",
                      "n_syllables": "int64", "n_sentences": "int64"})
    return out.sort_values("doc_id").reset_index(drop=True)


def emb_centroid_drift(sf_dir: str):
    """Embedding drift monitor: per label, the cosine between the
    centroid of the even-vec_id half and the odd-vec_id half (a
    deterministic A/B split standing in for two ingestion epochs) —
    cosine ≈ 1 means the embedding distribution is stable. One
    combiner pass reduces to per-(label, half) dimension sums +
    counts; the |labels|×2×dim table closes on the driver."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding", "label"])

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        lab = df["label"].to_numpy()
        half = (df["vec_id"].to_numpy(np.int64) % 2)
        rows = []
        for (l, h) in {(l, h) for l, h in zip(lab, half)}:
            m = (lab == l) & (half == h)
            s = mat[m].sum(axis=0)
            rows.append({"label": l, "half": int(h),
                         "n": int(m.sum()),
                         **{f"d{i}": s[i] for i in range(mat.shape[1])}})
        return pd.DataFrame(rows)

    first = ds.take_batch(1, batch_format="pandas")
    dim = len(first["embedding"].iloc[0])
    m = grouped_aggregate(
        ds.map_batches(partials, batch_format="pandas",
                       batch_size=8192),
        ["label", "half"],
        {"n": ("n", "sum"),
         **{f"d{i}": (f"d{i}", "sum") for i in range(dim)}}) \
        .to_pandas()
    dcols = [f"d{i}" for i in range(dim)]
    rows = []
    for l, g in m.groupby("label"):
        g = g.sort_values("half")
        if len(g) != 2:
            continue
        a = g.iloc[0][dcols].to_numpy(np.float64) / g.iloc[0]["n"]
        b = g.iloc[1][dcols].to_numpy(np.float64) / g.iloc[1]["n"]
        cos = float(a @ b / np.sqrt((a @ a) * (b @ b)))
        rows.append((int(l), int(g.iloc[0]["n"]), int(g.iloc[1]["n"]),
                     round(cos, 6)))
    out = pd.DataFrame(rows, columns=["label", "n_even", "n_odd",
                                      "centroid_cosine"])
    return out.sort_values("label").reset_index(drop=True)


def q_part_powerlaw_alpha(sf_dir: str, *, dmin: int = 2):
    """Power-law exponent of the co-purchase degree distribution by the
    continuous MLE (Clauset-Shalizi-Newman '09 eq. 3.1):
    α = 1 + n / Σ ln(d/d_min) over nodes with degree ≥ d_min — the
    scale-free-ness diagnostic for the graphs dedup builds. Degrees
    come from one combiner aggregate over exploded endpoints; the MLE
    reduces to two scalars (n, Σln)."""
    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply
    from jerex_ray.ops.graph import _canonical_edges, _directed_edges
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    li = read_parquet_sized(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey"])

    def pairs_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"a": pd.Series(dtype="int64"),
                                 "b": pd.Series(dtype="int64")})
        d = df.drop_duplicates(["l_orderkey", "l_partkey"])
        m = d.merge(d, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        return pd.DataFrame({"a": m["l_partkey_x"].to_numpy(),
                             "b": m["l_partkey_y"].to_numpy()})

    edges = _canonical_edges(grouped_apply(li, ["l_orderkey"],
                                           pairs_block),
                             src="a", dst="b")
    deg = grouped_aggregate(_directed_edges(edges, src="a", dst="b",
                                            undirected=True),
                            ["u"], {"deg": (None, "count")},
                            result_hint="large")

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "deg" not in df.columns:
            return pd.DataFrame({"__all": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64"),
                                 "slog": pd.Series(dtype="float64")})
        d = df["deg"].to_numpy(np.float64)
        d = d[d >= dmin]
        if len(d) == 0:
            return pd.DataFrame({"__all": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64"),
                                 "slog": pd.Series(dtype="float64")})
        return pd.DataFrame({"__all": [np.int64(0)],
                             "n": [np.int64(len(d))],
                             "slog": [np.sum(np.log(d / float(dmin)))]})

    m = grouped_aggregate(
        deg.map_batches(partials, batch_format="pandas",
                        batch_size=None),
        ["__all"], {"n": ("n", "sum"),
                    "slog": ("slog", "sum")}).to_pandas()
    n = float(m["n"][0])
    alpha = 1.0 + n / float(m["slog"][0])
    return pd.DataFrame({"n_tail_nodes": [np.int64(n)],
                         "alpha": [round(alpha, 6)]})


def emb_quantization_error(sf_dir: str):
    """Int8 scalar-quantization audit per label: vectors quantize to
    round(v / scale · 127) with a GLOBAL per-corpus scale (max |v|
    over all dims — one combiner max), and the per-label mean squared
    reconstruction error says which regions of the space the
    quantizer hurts — the deploy-time embedding-compression
    diagnostic. Rounding uses the half-away rule in BOTH engines (the
    numpy default would silently flip .5 boundaries vs SQL)."""
    import ray

    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["embedding", "label"])

    def absmax(df: pd.DataFrame) -> pd.DataFrame:
        mat = np.abs(np.stack(df["embedding"].to_numpy())
                     .astype(np.float64))
        return pd.DataFrame({"__all": [np.int64(0)],
                             "mx": [float(mat.max())]})

    scale = float(grouped_aggregate(
        ds.map_batches(absmax, batch_format="pandas"),
        ["__all"], {"mx": ("mx", "max")}).to_pandas()["mx"][0])
    s_ref = ray.put(scale)

    def sqerr(df: pd.DataFrame) -> pd.DataFrame:
        sc = ray.get(s_ref)
        mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        z = mat / sc * 127.0
        q = np.copysign(np.floor(np.abs(z) + 0.5), z)  # half-away
        rec = q / 127.0 * sc
        se = ((mat - rec) ** 2).sum(axis=1)
        g = pd.DataFrame({"label": df["label"].to_numpy(),
                          "n": 1, "se": se, "d": mat.shape[1]})
        return g.groupby("label", sort=False, as_index=False) \
            .agg(n=("n", "sum"), se=("se", "sum"), d=("d", "max"))

    m = grouped_aggregate(
        ds.map_batches(sqerr, batch_format="pandas", batch_size=8192),
        ["label"], {"n": ("n", "sum"), "se": ("se", "sum"),
                    "d": ("d", "max")}).to_pandas()
    mse = m["se"].to_numpy(np.float64) \
        / (m["n"].to_numpy(np.float64) * m["d"].to_numpy(np.float64))
    out = pd.DataFrame({"label": m["label"].astype("int64"),
                        "n": m["n"].astype("int64"),
                        "mse": np.round(mse, 12)})
    return out.sort_values("label").reset_index(drop=True)


_RAKE_STOPWORDS = ("the", "and", "of", "to", "a", "in", "is", "it",
                   "for", "on", "with", "as", "at", "by", "an")


def doc_rake_keywords(sf_dir: str, *, top_k: int = 10):
    """RAKE keyword extraction per source (Rose et al. '10): phrases
    are maximal runs of non-stopword words within sentences; each
    word scores degree/frequency (degree = Σ length of phrases it
    appears in), a phrase scores the sum of its words' scores, and the
    top-``top_k`` phrases per source surface (score desc — ROUNDED
    before ranking so float dust can't flip ranks across engines —
    then phrase asc).

    Dataflow: phrase assembly is doc-local (one vectorized double
    explode + island ids per batch, NO shuffle); word degree/frequency
    reduce through one (source, word) combiner; the vocab-bounded
    score table broadcasts back; identical phrases aggregate under
    (source, phrase) co-location and the exact top-k combiner
    finishes."""
    import ray

    from jerex_ray.functions.aggregate import (grouped_aggregate,
                                               grouped_topk)
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text", "source"])
    stops = set(_RAKE_STOPWORDS)

    def word_rows(batch: pd.DataFrame) -> pd.DataFrame:
        """Vectorized islands pass: one row per phrase WORD with the
        phrase's island id and length — no per-token Python loop."""
        empty = pd.DataFrame({"source": pd.Series(dtype="object"),
                              "island": pd.Series(dtype="int64"),
                              "w": pd.Series(dtype="object"),
                              "plen": pd.Series(dtype="int64")})
        txt = batch["text"].fillna("").str.lower()
        sents = txt.str.split(r"[.!?]+", regex=True)
        slens = sents.str.len().fillna(0).to_numpy(np.int64)
        if slens.sum() == 0:
            return empty
        src_s = np.repeat(batch["source"].to_numpy(), slens)
        flat_s = [s for lst in sents.to_numpy() for s in lst]
        words = pd.Series(flat_s, dtype="object").str.split()
        wlens = words.str.len().fillna(0).to_numpy(np.int64)
        if wlens.sum() == 0:
            return empty
        sent_idx = np.repeat(np.arange(len(flat_s)), wlens)
        src_w = np.repeat(src_s, wlens)
        flat_w = np.concatenate([w for w in words.to_numpy() if w])
        stop = pd.Series(flat_w).isin(stops).to_numpy()
        new_sent = np.r_[True, sent_idx[1:] != sent_idx[:-1]]
        island = np.cumsum(stop | new_sent)
        keep = ~stop
        if not keep.any():
            return empty
        df = pd.DataFrame({"source": src_w[keep],
                           "island": island[keep].astype(np.int64),
                           "w": flat_w[keep]})
        df["plen"] = df.groupby("island", sort=False)["w"] \
            .transform("size").astype("int64")
        return df

    def word_stats(batch: pd.DataFrame) -> pd.DataFrame:
        df = word_rows(batch)
        if df.empty:
            return pd.DataFrame({"source": pd.Series(dtype="object"),
                                 "w": pd.Series(dtype="object"),
                                 "freq": pd.Series(dtype="int64"),
                                 "deg": pd.Series(dtype="int64")})
        g = df.groupby(["source", "w"], sort=False) \
            .agg(freq=("plen", "size"), deg=("plen", "sum")) \
            .reset_index()
        return g.astype({"freq": "int64", "deg": "int64"})

    stats = grouped_aggregate(
        ds.map_batches(word_stats, batch_format="pandas",
                       batch_size=4096),
        ["source", "w"], {"freq": ("freq", "sum"),
                          "deg": ("deg", "sum")},
        result_hint="large").to_pandas()
    score_map = {(s, w): d / f for s, w, f, d in zip(
        stats["source"], stats["w"],
        stats["freq"].to_numpy(np.float64),
        stats["deg"].to_numpy(np.float64))}
    sm_ref = ray.put(score_map)

    def phrase_scores(batch: pd.DataFrame) -> pd.DataFrame:
        sm = ray.get(sm_ref)
        df = word_rows(batch)
        if df.empty:
            return pd.DataFrame({"source": pd.Series(dtype="object"),
                                 "phrase": pd.Series(dtype="object"),
                                 "n": pd.Series(dtype="int64"),
                                 "score": pd.Series(dtype="float64")})
        df["ws"] = pd.Series(
            list(zip(df["source"], df["w"]))).map(sm).to_numpy()
        g = df.groupby(["source", "island"], sort=False) \
            .agg(phrase=("w", " ".join), score=("ws", "sum")) \
            .reset_index()
        # round BEFORE the (source, phrase) aggregate and the rank so
        # float summation dust can't flip ranks across engines
        g["score"] = g["score"].round(6)
        out = g.groupby(["source", "phrase"], sort=False) \
            .agg(n=("score", "size"), score=("score", "max")) \
            .reset_index()
        return out.astype({"n": "int64"})

    agg = grouped_aggregate(
        ds.map_batches(phrase_scores, batch_format="pandas",
                       batch_size=4096),
        ["source", "phrase"], {"n": ("n", "sum"),
                               "score": ("score", "max")},
        result_hint="large")
    top = grouped_topk(agg, ["source"], order_by="score", k=top_k,
                       tie_cols=["phrase"]).to_pandas()
    out = top[["source", "phrase", "n", "score"]] \
        .astype({"n": "int64"})
    return out.sort_values(["source", "score", "phrase"],
                           ascending=[True, False, True]) \
        .reset_index(drop=True)


def q_events_type_drift(sf_dir: str):
    """Categorical drift between the even- and odd-event_id halves of
    the stream (deterministic A/B standing in for two ingestion
    epochs): per-type share in each half plus the per-type absolute
    share gap whose half-sum is the total-variation distance — the
    schema-free companion to the value-based PSI monitor. One combiner
    pass over (type, half) cells; |types|×2 rows close on the
    driver."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "event_type"])

    def cells(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({"event_type": df["event_type"].to_numpy(),
                          "half": (df["event_id"].to_numpy(np.int64)
                                   % 2)}) \
            .groupby(["event_type", "half"], sort=False).size() \
            .reset_index(name="n")
        return g

    m = grouped_aggregate(ds.map_batches(cells, batch_format="pandas"),
                          ["event_type", "half"],
                          {"n": ("n", "sum")}).to_pandas()
    tot = m.groupby("half")["n"].sum()
    piv = m.pivot_table(index="event_type", columns="half", values="n",
                        fill_value=0, aggfunc="sum")
    a = piv.get(0, pd.Series(0, index=piv.index)) \
        .to_numpy(np.float64) / float(tot.get(0, 1))
    b = piv.get(1, pd.Series(0, index=piv.index)) \
        .to_numpy(np.float64) / float(tot.get(1, 1))
    half_away = lambda x: np.copysign(
        np.floor(np.abs(x) * 1e6 + 0.5), x) / 1e6
    out = pd.DataFrame({"event_type": piv.index,
                        "share_even": half_away(a),
                        "share_odd": half_away(b),
                        "abs_gap": half_away(np.abs(a - b))})
    return out.sort_values("event_type").reset_index(drop=True)


def doc_ttr(sf_dir: str):
    """Per-document type-token ratio (distinct words / total words) —
    the oldest lexical-richness signal, cheap enough to run on every
    ingest batch. Fully doc-local and vectorized (one explode +
    nunique per doc); docs with no words are dropped (SQL WHERE
    parity)."""
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def ttr(batch: pd.DataFrame) -> pd.DataFrame:
        words = batch["text"].fillna("").str.lower().str.split()
        lens = words.str.len().fillna(0).to_numpy(np.int64)
        empty = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                              "n_tokens": pd.Series(dtype="int64"),
                              "n_types": pd.Series(dtype="int64"),
                              "ttr": pd.Series(dtype="float64")})
        if lens.sum() == 0:
            return empty
        flat = np.concatenate([w for w in words.to_numpy() if w])
        owner = np.repeat(batch["doc_id"].to_numpy(), lens)
        g = pd.DataFrame({"doc_id": owner, "w": flat}) \
            .groupby("doc_id")["w"].agg(["size", "nunique"])
        ratio = g["nunique"].to_numpy(np.float64) \
            / g["size"].to_numpy(np.float64)
        return pd.DataFrame({
            "doc_id": g.index.to_numpy(np.int64),
            "n_tokens": g["size"].to_numpy(np.int64),
            "n_types": g["nunique"].to_numpy(np.int64),
            "ttr": np.copysign(np.floor(np.abs(ratio) * 1e6 + 0.5),
                               ratio) / 1e6})

    out = ds.map_batches(ttr, batch_format="pandas",
                         batch_size=4096).to_pandas()
    out = out.astype({"doc_id": "int64", "n_tokens": "int64",
                      "n_types": "int64"})
    return out.sort_values("doc_id").reset_index(drop=True)


def q_events_burstiness(sf_dir: str):
    """Fano factor (index of dispersion) of hourly event counts per
    type — variance/mean of the hour-bucket counts over the stream's
    OBSERVED span: ≈1 is Poisson traffic, ≫1 is bursty. Hour cells
    reduce in one combiner pass; unobserved hours inside the global
    span count as ZERO (both engines build the same dense span), so
    the statistic is well-defined and not survivorship-biased."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_type", "ts"])

    def cells(df: pd.DataFrame) -> pd.DataFrame:
        h = df["ts"].astype("datetime64[us]").astype("int64") \
            // 3_600_000_000
        return pd.DataFrame({"event_type": df["event_type"].to_numpy(),
                             "hour": h.to_numpy(np.int64)}) \
            .groupby(["event_type", "hour"], sort=False).size() \
            .reset_index(name="n")

    m = grouped_aggregate(ds.map_batches(cells, batch_format="pandas"),
                          ["event_type", "hour"],
                          {"n": ("n", "sum")}).to_pandas()
    span = int(m["hour"].max() - m["hour"].min() + 1)
    rows = []
    for t, g in m.groupby("event_type"):
        n = g["n"].to_numpy(np.float64)
        total = n.sum()
        # dense span: zeros for unobserved hours
        mean = total / span
        # var over span hours: Σ(n−μ)² = Σn² − 2μΣn + span·μ²
        var = (np.sum(n * n) - 2.0 * mean * total
               + span * mean * mean) / span
        rows.append((t, int(total), round(float(mean), 6),
                     round(float(var / mean), 6)))
    out = pd.DataFrame(rows, columns=["event_type", "n_events",
                                      "mean_per_hour", "fano"])
    return out.sort_values("event_type").reset_index(drop=True)


def q_events_runs_test(sf_dir: str):
    """Wald-Wolfowitz runs test per event type: is the above/below-
    global-median sequence of values (in (ts, id) order) random?
    Emits runs count and the z statistic
    z = (R − μ_R)/σ_R, μ_R = 2·n₊·n₋/n + 1 — the randomness audit for
    suspected autocorrelated or batched telemetry. The global median
    comes from the shuffle-free exact-quantile selector; runs count
    per type from co-located islands (values equal to the median drop,
    the classical convention)."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.ops.quantiles import distributed_quantiles
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "event_type", "ts",
                                     "value"])
    med = float(distributed_quantiles(ds, "value", [0.5])[0])

    def runs(block: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"event_type": pd.Series(dtype="object"),
                            "n_pos": pd.Series(dtype="int64"),
                            "n_neg": pd.Series(dtype="int64"),
                            "n_runs": pd.Series(dtype="int64"),
                            "z": pd.Series(dtype="float64")})
        if block.empty:
            return out
        b = block[block["value"] != med] \
            .sort_values(["event_type", "ts", "event_id"])
        if b.empty:
            return out
        et = b["event_type"].to_numpy()
        up = (b["value"].to_numpy(np.float64) > med)
        new_t = np.r_[True, et[1:] != et[:-1]]
        flip = np.r_[True, up[1:] != up[:-1]]
        run_start = new_t | flip
        rows = []
        df = pd.DataFrame({"t": et, "up": up, "rs": run_start})
        for t, g in df.groupby("t", sort=False):
            npos = int(g["up"].sum())
            nneg = int((~g["up"]).sum())
            r = int(g["rs"].sum())
            n = float(npos + nneg)
            mu = 2.0 * npos * nneg / n + 1.0
            var = (2.0 * npos * nneg
                   * (2.0 * npos * nneg - n)) / (n * n * (n - 1.0))
            z = (r - mu) / np.sqrt(var)
            rows.append((t, npos, nneg, r, round(float(z), 6)))
        return pd.DataFrame(rows, columns=["event_type", "n_pos",
                                           "n_neg", "n_runs", "z"])

    out = grouped_apply(ds, ["event_type"], runs).to_pandas()
    out = out.astype({"n_pos": "int64", "n_neg": "int64",
                      "n_runs": "int64"})
    return out.sort_values("event_type").reset_index(drop=True)


def doc_pair_similarity(sf_dir: str):
    """All-pairs TF-IDF cosine similarity ≥ 0.8 via the inverted-index
    self-join (``ops/simjoin.tfidf_cosine_pairs``, Elsayed et al.
    '08): one df combiner pass, broadcast idf, doc-local norms, one
    term hash shuffle with block-local wedge partial products, final
    pair combiner. Hubs (df > ⌊0.9·N⌋) are pruned from the vector
    space — the explicit all-pairs scale lever, mirrored in the
    oracle. Both sides round to 6 decimals and threshold on the
    ROUNDED cosine."""
    import math

    import pyarrow.parquet as _pq

    from jerex_ray.ops.simjoin import tfidf_cosine_pairs
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    n_docs = _pq.ParquetFile(f"{sf_dir}/documents.parquet") \
        .metadata.num_rows
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    out = tfidf_cosine_pairs(ds, threshold=0.8,
                             max_df=int(math.floor(0.9 * n_docs))) \
        .to_pandas()
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def q_part_hits(sf_dir: str):
    """HITS hubs (customers) & authorities (parts) over the
    customer–part bipartite purchase graph (``ops/graph.hits``): the
    orders⋈lineitem incidence is a hash-partitioned fact-fact
    ``Dataset.join``; iterations broadcast node-sized score vectors
    and reduce per-destination partials through the combiner.
    Unnormalized iterates are exact integers in float64, so the
    chained-CTE oracle matches bit-for-bit; only the final L1
    normalization rounds."""
    from jerex_ray.ops.graph import hits
    from jerex_ray.runtime import read_parquet_sized, shuffle_partitions
    configure_data_context()
    li = read_parquet_sized(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey"])
    orders = read_parquet_sized(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_custkey"])
    j = li.join(orders, join_type="inner",
                num_partitions=shuffle_partitions(8),
                on=("l_orderkey",), right_on=("o_orderkey",))
    out = hits(j, hub_col="o_custkey", auth_col="l_partkey", iters=4)
    out["node"] = out["node"].astype("int64")
    return out


def q_basket_rules(sf_dir: str):
    """Pair association rules over order baskets
    (``ops/baskets.association_rules``, Apriori's 2-itemset tier):
    distinct (order, part) incidences reduce through the combiner,
    one basket hash shuffle emits vectorized item-pair wedges
    (bounded by basket size²), the item-frequency table broadcasts
    into the streaming score pass. Counts are integer-exact; every
    statistic is one division, matching the SQL self-join oracle
    bit-for-bit before the shared 6-decimal rounding."""
    from jerex_ray.ops.baskets import association_rules
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    li = read_parquet_sized(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey"])
    out = association_rules(li, basket_col="l_orderkey",
                            item_col="l_partkey",
                            min_pair_count=2).to_pandas()
    return out.sort_values(["antecedent", "consequent"]) \
        .reset_index(drop=True)


def q_events_best_split(sf_dir: str):
    """Best decision-stump split of `value` for the conversion label
    (event_type ∈ {click, purchase}) — the histogram-method GBDT
    primitive (``ops/tree.best_stump_split``): one combiner pass to a
    feature-grid-bounded histogram, vectorized prefix-sum Gini scan.
    Integer-exact counts + an identically-sequenced gain expression
    make the argmax bit-stable against the SQL window oracle."""
    from jerex_ray.ops.tree import best_stump_split
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_type", "value"])

    def label(batch: pd.DataFrame) -> np.ndarray:
        return batch["event_type"].isin(["click", "purchase"]) \
            .to_numpy(np.int64)

    return best_stump_split(ds, feature="value", label_fn=label)


def q_user_seq_patterns(sf_dir: str):
    """Frequent 2-sequences (GSP tier 2, Srikant & Agrawal '96): for
    every ordered type pair (ant, con), the number of users with some
    ant event strictly before some con event, and its support share.
    The existence test compresses to min-ts(ant) < max-ts(con), so ONE
    (user, type) min/max combiner pass reduces the corpus to a
    users×types table; users co-locate once and each block self-merges
    its per-user type rows (≤ |types|² pairs per user). Counts are
    integer-exact; support is one division, 6-decimal rounded."""
    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type", "ts"])
    mt = grouped_aggregate(ds, ["user_id", "event_type"],
                           {"mn": ("ts", "min"), "mx": ("ts", "max")},
                           result_hint="large").materialize()
    n_users = int(grouped_aggregate(mt, ["user_id"],
                                    {"c": (None, "count")}).count())

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"ant": pd.Series(dtype="object"),
                                 "con": pd.Series(dtype="object")})
        m = df.merge(df, on="user_id")
        m = m[m["mn_x"] < m["mx_y"]]
        return pd.DataFrame({"ant": m["event_type_x"].to_numpy(),
                             "con": m["event_type_y"].to_numpy()})

    cnt = grouped_aggregate(
        grouped_apply(mt, ["user_id"], pairs),
        ["ant", "con"], {"n_users": (None, "count")}).to_pandas()
    cnt["n_users"] = cnt["n_users"].astype("int64")
    cnt["support"] = np.round(
        cnt["n_users"].to_numpy(np.float64) / n_users, 6)
    return cnt.sort_values(["ant", "con"]).reset_index(drop=True)


def q_events_ks_test(sf_dir: str):
    """Two-sample Kolmogorov–Smirnov drift test between the `value`
    distributions of click vs error events: one combiner pass reduces
    the corpus to a value-grid-bounded (v, n_click, n_error)
    histogram, then a vectorized prefix-sum CDF scan finds
    D = max|F₁−F₂|. The gap expression is sequenced identically to
    the SQL window oracle (exact-integer counts, single divisions),
    so the argmax location is bit-stable; the one-term Kolmogorov
    p ≈ 2·exp(−2·m·D²) uses math.exp = glibc = DuckDB's exp."""
    import math

    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_type", "value"])

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"].isin(["click", "error"])]
        if df.empty:
            return pd.DataFrame({"v": pd.Series(dtype="float64"),
                                 "na": pd.Series(dtype="int64"),
                                 "nb": pd.Series(dtype="int64")})
        g = (pd.DataFrame({
            "v": df["value"].to_numpy(np.float64),
            "na": (df["event_type"] == "click").to_numpy(np.int64),
            "nb": (df["event_type"] == "error").to_numpy(np.int64)})
            .groupby("v", sort=False).sum().reset_index())
        return g

    hist = grouped_aggregate(
        ds.map_batches(partials, batch_format="pandas", batch_size=8192),
        ["v"], {"na": ("na", "sum"), "nb": ("nb", "sum")}).to_pandas()
    hist = hist.sort_values("v").reset_index(drop=True)
    na = float(hist["na"].sum())
    nb = float(hist["nb"].sum())
    ca = np.cumsum(hist["na"].to_numpy(np.float64))
    cb = np.cumsum(hist["nb"].to_numpy(np.float64))
    dv = np.abs(ca / na - cb / nb)
    v = hist["v"].to_numpy(np.float64)
    best = np.lexsort((v, -dv))[0]        # dv DESC, v ASC
    d = float(dv[best])
    m = na * nb / (na + nb)
    p = 2.0 * math.exp(-2.0 * m * d * d)
    return pd.DataFrame({"n_a": [np.int64(na)], "n_b": [np.int64(nb)],
                         "d_stat": [round(d, 6)],
                         "at_value": [v[best]],
                         "p_approx": [round(p, 6)]})


def q_events_attribution(sf_dir: str):
    """Linear multi-touch attribution: every purchase splits one unit
    of credit equally across the SAME user's non-purchase events in
    the preceding 24 h window; credit totals per touching event type.
    Users co-locate once; inside each block the window memberships
    come from two searchsorted bounds per purchase and the per-touch
    credits from an interval-add difference array (np.add.at +
    cumsum) — no pair materialization, per-user cost is events +
    purchases, not their product. The SQL oracle materializes the
    pair join; both sides round the float credit sums to 6."""
    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type", "ts"])
    win = np.timedelta64(24, "h").astype("timedelta64[us]").astype(
        np.int64)

    def per_block(block: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"event_type": pd.Series(dtype="object"),
                              "touches": pd.Series(dtype="int64"),
                              "credit": pd.Series(dtype="float64")})
        if block.empty:
            return empty
        d = block.sort_values(["user_id", "ts"], kind="mergesort")
        ts = d["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        uid = d["user_id"].to_numpy()
        is_p = (d["event_type"] == "purchase").to_numpy()
        # touches keep their within-user ordinal + a block-global
        # segment base, so one diff-array pass serves every user
        t = pd.DataFrame({"user_id": uid[~is_p], "t": ts[~is_p],
                          "et": d["event_type"].to_numpy()[~is_p]})
        p = pd.DataFrame({"user_id": uid[is_p], "t": ts[is_p]})
        if t.empty or p.empty:
            return empty
        t["idx"] = t.groupby("user_id", sort=False).cumcount() + 1
        seg_sizes = t.groupby("user_id", sort=False).size()
        seg_base = dict(zip(seg_sizes.index,
                            np.r_[0, np.cumsum(seg_sizes.to_numpy())[:-1]]))
        t_sorted = t.sort_values("t", kind="mergesort")

        def count_before(keys: pd.DataFrame, col: str) -> np.ndarray:
            """#touches of the same user with ts strictly < keys[col]."""
            m = pd.merge_asof(
                keys.sort_values(col, kind="mergesort"),
                t_sorted[["user_id", "t", "idx"]],
                left_on=col, right_on="t", by="user_id",
                direction="backward", allow_exact_matches=False)
            return (m.set_index("__row")["idx"].fillna(0)
                    .astype(np.int64).sort_index().to_numpy())

        p = p.reset_index(drop=True)
        p["__row"] = p.index
        p["lo_key"] = p["t"] - win
        hi = count_before(p[["user_id", "t", "__row"]].copy(), "t")
        lo = count_before(p[["user_id", "lo_key", "__row"]].copy(),
                          "lo_key")
        k = (hi - lo).astype(np.float64)
        ok = k > 0
        if not ok.any():
            return empty
        base = p["user_id"].map(seg_base).to_numpy(np.int64)[ok]
        lo_g, hi_g = base + lo[ok], base + hi[ok]
        diff = np.zeros(len(t) + 1)
        np.add.at(diff, lo_g, 1.0 / k[ok])
        np.add.at(diff, hi_g, -(1.0 / k[ok]))
        cred = np.cumsum(diff[:-1])
        diffc = np.zeros(len(t) + 1)
        np.add.at(diffc, lo_g, 1.0)
        np.add.at(diffc, hi_g, -1.0)
        cover = np.rint(np.cumsum(diffc[:-1])).astype(np.int64)
        touched = cover > 0
        agg = (pd.DataFrame({"event_type": t["et"].to_numpy()[touched],
                             "credit": cred[touched],
                             "touches": cover[touched]})
               .groupby("event_type", sort=False)
               .agg(touches=("touches", "sum"), credit=("credit", "sum"))
               .reset_index())
        return pd.DataFrame({"event_type": agg["event_type"],
                             "touches": agg["touches"].astype(np.int64),
                             "credit": agg["credit"]})

    out = grouped_aggregate(
        grouped_apply(ds, ["user_id"], per_block),
        ["event_type"], {"touches": ("touches", "sum"),
                         "credit": ("credit", "sum")}).to_pandas()
    out["touches"] = out["touches"].astype("int64")
    out["credit"] = out["credit"].round(6)
    return out.sort_values("event_type").reset_index(drop=True)


def q_events_woe_iv(sf_dir: str):
    """Weight-of-evidence / information-value profile of `value`
    against the conversion label — the credit-scoring feature audit
    (Siddiqi '06): exact decile edges from the shuffle-free quantile
    selector, ONE combiner pass to per-bucket (n, pos), then
    WOE_i = ln((pos_i/pos)/(neg_i/neg)) and its IV term. Bucket
    membership is '# edges strictly below v' (searchsorted-left ==
    the SQL v > e count, boundary-stable); counts are integer-exact
    and ln is glibc on both sides; floats round to 6."""
    import math

    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.ops.quantiles import distributed_quantiles
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_type", "value"])
    qs = [i / 10 for i in range(1, 10)]
    edges = np.asarray(distributed_quantiles(ds, "value", qs),
                       dtype=np.float64)

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value"].to_numpy(np.float64)
        y = df["event_type"].isin(["click", "purchase"]) \
            .to_numpy(np.int64)
        b = np.searchsorted(edges, v, side="left").astype(np.int64)
        g = (pd.DataFrame({"bucket": b, "n": 1, "pos": y})
             .groupby("bucket", sort=False).sum().reset_index())
        return g

    h = grouped_aggregate(
        ds.map_batches(partials, batch_format="pandas",
                       batch_size=8192),
        ["bucket"], {"n": ("n", "sum"), "pos": ("pos", "sum")}) \
        .to_pandas().sort_values("bucket").reset_index(drop=True)
    pos_t = float(h["pos"].sum())
    neg_t = float((h["n"] - h["pos"]).sum())
    rows = []
    for _, r in h.iterrows():
        pos_i, neg_i = float(r["pos"]), float(r["n"] - r["pos"])
        if pos_i == 0.0 or neg_i == 0.0:
            continue
        ps, ns = pos_i / pos_t, neg_i / neg_t
        woe = math.log(ps / ns)
        rows.append((int(r["bucket"]), int(r["n"]), int(r["pos"]),
                     round(woe, 6), round((ps - ns) * woe, 6)))
    return pd.DataFrame(rows, columns=["bucket", "n", "pos", "woe",
                                       "iv_term"])


def emb_procrustes(sf_dir: str):
    """Orthogonal Procrustes alignment between the embedding table
    and a deterministically rotated + perturbed copy of itself
    (fixed Householder rotation, seeded sin-grid noise): the
    distributed one-pass (n, XᵀY, ‖X‖², ‖Y‖²) reduction feeds the
    d×d driver SVD (``ops/embed.procrustes_align``). Emits the
    recovered rotation as flat (i, j, r) rows plus an
    ``alignment`` row block with the residual. Rows-only: SVD is not
    SQL-expressible; planted-rotation recovery is pytest-gated
    (tests/test_sketch_embed.py)."""
    from jerex_ray.ops.embed import procrustes_align
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])

    def add_pair(df: pd.DataFrame) -> pd.DataFrame:
        x = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        d = x.shape[1]
        h = _householder_rotation(d)
        ids = df["vec_id"].to_numpy(np.int64)
        noise = 1e-3 * np.sin(
            ids[:, None] * d + np.arange(d)[None, :])
        y = x @ h + noise
        return pd.DataFrame({"x": list(x), "y": list(y)})

    r, residual, n = procrustes_align(
        ds.map_batches(add_pair, batch_format="pandas"))
    d = r.shape[0]
    ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
    out = pd.DataFrame({"i": ii.ravel().astype(np.int64),
                        "j": jj.ravel().astype(np.int64),
                        "r": np.round(r.ravel(), 6)})
    out.attrs["residual_sq"] = residual
    out.attrs["n"] = n
    return out


def _householder_rotation(d: int) -> np.ndarray:
    """Fixed orthogonal matrix H = I − 2uuᵀ from a deterministic unit
    vector (no RNG — resume-safe)."""
    u = np.sin(np.arange(d, dtype=np.float64) + 1.0)
    u /= np.linalg.norm(u)
    return np.eye(d) - 2.0 * np.outer(u, u)


def q_events_isotonic(sf_dir: str):
    """Isotonic (monotone non-decreasing) calibration of the
    conversion rate against `value` — pool-adjacent-violators
    (Barlow et al. '72), the classic probability-calibration step.
    ONE combiner pass reduces the corpus to an integer-bucket
    histogram (⌊value⌋, n, pos) — grid-bounded like the stump/WOE
    ops — then the driver runs the linear PAV stack over ≤ a few
    hundred buckets with EXACT integer cross-multiplication
    comparisons (no float-compare drift). Each pool's fit is one
    division of two exact integers, so it matches the SQL oracle —
    which recomputes the fit through Barlow's minimax identity
    fit(i) = max_{s≤i} min_{t≥i} avg(s..t) in O(buckets²) — before
    the shared 6-decimal rounding."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_type", "value"])

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        b = np.floor(df["value"].to_numpy(np.float64)).astype(np.int64)
        y = df["event_type"].isin(["click", "purchase"]) \
            .to_numpy(np.int64)
        return (pd.DataFrame({"bucket": b, "n": 1, "pos": y})
                .groupby("bucket", sort=False).sum().reset_index())

    h = grouped_aggregate(
        ds.map_batches(partials, batch_format="pandas",
                       batch_size=8192),
        ["bucket"], {"n": ("n", "sum"), "pos": ("pos", "sum")}) \
        .to_pandas().sort_values("bucket").reset_index(drop=True)
    # PAV stack: pools of (weight, pos, #buckets); exact integer
    # cross-multiplication keeps merges float-drift-free
    pools: list[list[int]] = []
    for _, r in h.iterrows():
        w, p, c = int(r["n"]), int(r["pos"]), 1
        while pools and pools[-1][1] * w >= p * pools[-1][0]:
            pw, pp, pc = pools.pop()
            w, p, c = w + pw, p + pp, c + pc
        pools.append([w, p, c])
    fit = np.concatenate([np.full(c, float(p) / float(w))
                          for w, p, c in pools])
    return pd.DataFrame({"bucket": h["bucket"].astype("int64"),
                         "n": h["n"].astype("int64"),
                         "pos": h["pos"].astype("int64"),
                         "fit": np.round(fit, 6)})


def q_lineitem_zorder(sf_dir: str):
    """Z-order clustering audit of lineitem on (l_partkey, l_suppkey)
    (``ops/layout``, the Delta/Iceberg Z-ORDER primitive): vectorized
    Morton interleave, exact-integer bucket assignment
    zval·64 // (maxz+1), per-bucket zone-map envelopes through the
    combiner. Everything is integer arithmetic, so the generated SQL
    bit-expression oracle replays it exactly."""
    from jerex_ray.ops.layout import zorder_layout_stats
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/lineitem.parquet",
                            columns=["l_partkey", "l_suppkey"])
    return zorder_layout_stats(ds, cols=["l_partkey", "l_suppkey"],
                               nbuckets=64)


def _zorder_oracle_sql(cols=("l_partkey", "l_suppkey"),
                       nbuckets: int = 64, bits: int = 16) -> str:
    """Generated bit-interleave oracle for ``q_lineitem_zorder``:
    bit i of column j lands at position i·k + j, matching
    ``ops/layout.morton_interleave``."""
    k = len(cols)
    terms = [f"((({c} >> {i}) & 1) << {i * k + j})"
             for j, c in enumerate(cols) for i in range(bits)]
    zexpr = "\n                 + ".join(terms)
    aggs = ",\n                   ".join(
        f"min({c}) AS {c}_min, max({c}) AS {c}_max" for c in cols)
    return f"""
        WITH z AS (
            SELECT {', '.join(cols)},
                   ({zexpr}) AS zval
            FROM lineitem),
        mx AS (SELECT max(zval) AS m FROM z),
        b AS (
            SELECT {', '.join(cols)},
                   (zval * {nbuckets}) // ((SELECT m FROM mx) + 1)
                       AS bucket
            FROM z)
        SELECT bucket, count(*) AS n,
               {aggs}
        FROM b GROUP BY bucket ORDER BY bucket
    """


def q_events_rate_limit(sf_dir: str, *, cap: float = 2.0,
                        refill_per_min: float = 0.005):
    """Per-user token-bucket rate limiting replayed over the event
    log (capacity 2, 0.005 token/min continuous refill, 1 token per
    event) — the standard admission-control audit ("which historical
    events WOULD have been throttled"). Users co-locate in one hash
    shuffle; each block runs the rank-stepped vectorized recursion
    (loop over max series length, not rows) with the SAME float64
    expression sequence as the oracle's recursive CTE —
    least(cap, prev + Δµs/6e7) — so admit branches and token levels
    are bit-identical; the half-away mirror rounds token levels."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts"])

    def bucket(block: pd.DataFrame) -> pd.DataFrame:
        if block.empty:
            return pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                                 "admitted": pd.Series(dtype="int64"),
                                 "tokens": pd.Series(dtype="float64")})
        b = block.sort_values(["user_id", "ts", "event_id"])
        t = b["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        uid = b["user_id"].to_numpy()
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        starts = np.flatnonzero(new_user)
        lens = np.diff(np.r_[starts, len(t)])
        rn = np.arange(len(t)) - np.repeat(starts, lens)
        tokens = np.empty(len(t))
        admitted = np.empty(len(t), dtype=np.int64)
        first = rn == 0
        # first event: full bucket, always admitted (cap >= 1)
        tokens[first] = cap - 1.0
        admitted[first] = 1
        for r in range(1, int(rn.max()) + 1 if len(rn) else 0):
            idx = np.flatnonzero(rn == r)
            before = np.minimum(
                cap, tokens[idx - 1]
                + (t[idx] - t[idx - 1]) / 60000000.0 * refill_per_min)
            adm = before >= 1.0
            tokens[idx] = np.where(adm, before - 1.0, before)
            admitted[idx] = adm.astype(np.int64)
        rt = np.copysign(np.floor(np.abs(tokens) * 1e6 + 0.5),
                         tokens) / 1e6
        return pd.DataFrame({"event_id": b["event_id"].to_numpy(),
                             "admitted": admitted,
                             "tokens": rt})

    out = grouped_apply(ds, ["user_id"], bucket).to_pandas()
    out["event_id"] = out["event_id"].astype("int64")
    out["admitted"] = out["admitted"].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


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
    broadcast); the result is signature-bounded. Rows-only: inputs
    are model extractions, not SQL views; pandas parity is
    pytest-gated."""
    from jerex_ray.functions.aggregate import grouped_aggregate
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
    out = sig.assign(share=np.round(sig["n"] / tot, 6),
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
    reduces to the driver. Rows-only; pandas parity pytest-gated."""
    from jerex_ray.functions.aggregate import grouped_aggregate
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
    out["multi_share"] = np.round(out["n_multi"] / out["n_subjects"], 6)
    return out.sort_values("pred").reset_index(drop=True)


def kg_provenance(sf_dir: str):
    """Provenance rollup of the emitted KG: per canonical triple
    (subj_norm, pred, obj_norm), the number of distinct supporting
    conversations and total mention count — the evidence-strength
    table a downstream curator ranks by. Two combiner aggregates
    ((triple, conv)-distinct → triple rollup). Rows-only; pandas
    parity pytest-gated."""
    from jerex_ray.functions.aggregate import grouped_aggregate
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


def q_events_ohlc(sf_dir: str):
    """Hourly OHLC bars of event value (open/high/low/close + count)
    — the classic time-bar compaction. Open/close are argmin/argmax
    by (ts, event_id) inside each hour: every batch emits ONE
    candidate row per hour it sees (partial argmin/argmax + min/max/
    count), and a bucket-bounded merge pass picks winners — the
    corpus streams once, only hour-bucket rows shuffle. SQL-oracled
    via window row_number first/last."""
    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({
                "hour": pd.Series(dtype="int64"),
                "o_ts": pd.Series(dtype="int64"),
                "o_id": pd.Series(dtype="int64"),
                "open": pd.Series(dtype="float64"),
                "c_ts": pd.Series(dtype="int64"),
                "c_id": pd.Series(dtype="int64"),
                "close": pd.Series(dtype="float64"),
                "high": pd.Series(dtype="float64"),
                "low": pd.Series(dtype="float64"),
                "n": pd.Series(dtype="int64")})
        t = df["ts"].astype("datetime64[us]").astype("int64")
        d = pd.DataFrame({"hour": t // 3_600_000_000, "t": t,
                          "id": df["event_id"].astype("int64"),
                          "v": df["value"].to_numpy(np.float64)})
        d = d.sort_values(["hour", "t", "id"])
        g = d.groupby("hour", sort=False)
        first, last = g.head(1), g.tail(1)
        agg = g["v"].agg(["max", "min", "count"]).reset_index()
        out = agg.rename(columns={"max": "high", "min": "low",
                                  "count": "n"})
        out = out.merge(first.rename(columns={
            "t": "o_ts", "id": "o_id", "v": "open"}), on="hour") \
            .merge(last.rename(columns={
                "t": "c_ts", "id": "c_id", "v": "close"}), on="hour")
        out["n"] = out["n"].astype(np.int64)
        return out[["hour", "o_ts", "o_id", "open", "c_ts", "c_id",
                    "close", "high", "low", "n"]]

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "hour" not in df.columns:
            return pd.DataFrame({
                "hour": pd.Series(dtype="int64"),
                "open": pd.Series(dtype="float64"),
                "high": pd.Series(dtype="float64"),
                "low": pd.Series(dtype="float64"),
                "close": pd.Series(dtype="float64"),
                "n": pd.Series(dtype="int64")})
        d = df.sort_values(["hour", "o_ts", "o_id"])
        opens = d.groupby("hour", sort=False).head(1)[["hour", "open"]]
        d2 = df.sort_values(["hour", "c_ts", "c_id"])
        closes = d2.groupby("hour", sort=False).tail(1)[["hour",
                                                         "close"]]
        agg = (df.groupby("hour")
               .agg(high=("high", "max"), low=("low", "min"),
                    n=("n", "sum")).reset_index())
        out = agg.merge(opens, on="hour").merge(closes, on="hour")
        out["hour"] = out["hour"].astype("int64")
        out["n"] = out["n"].astype("int64")
        return out[["hour", "open", "high", "low", "close", "n"]]

    out = grouped_apply(
        ds.map_batches(partial, batch_format="pandas",
                       batch_size=8192),
        ["hour"], merge).to_pandas()
    return out.sort_values("hour").reset_index(drop=True)


def q_user_markov_backtest(sf_dir: str):
    """Top-1 next-event backtest of the first-order Markov model:
    predict the most frequent successor of each type (tie → type
    asc) and score it on the SAME transition table — accuracy per
    source state from one distributed count pass
    (``ops/windows.transition_matrix``); no second corpus scan, the
    |types|²-bounded table answers both fit and eval. Integer counts,
    one division, SQL row_number oracle."""
    from jerex_ray.ops.windows import transition_matrix
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts",
                                     "event_type"])
    tm = transition_matrix(ds, key="user_id", ts_col="ts",
                           id_col="event_id", type_col="event_type")
    if tm.empty:
        return pd.DataFrame({"prev": pd.Series(dtype="object")})
    tm = tm.sort_values(["prev_type", "cnt", "next_type"],
                        ascending=[True, False, True])
    best = tm.groupby("prev_type", sort=False).head(1)
    totals = tm.groupby("prev_type")["cnt"].sum()
    out = pd.DataFrame({
        "prev": best["prev_type"].to_numpy(),
        "n_transitions": best["prev_type"].map(totals)
        .to_numpy(np.int64),
        "predicted": best["next_type"].to_numpy(),
        "n_correct": best["cnt"].to_numpy(np.int64)})
    out["accuracy"] = np.round(
        out["n_correct"].to_numpy(np.float64)
        / out["n_transitions"].to_numpy(np.float64), 6)
    return out.sort_values("prev").reset_index(drop=True)


def q_events_partition_plan(sf_dir: str, *, n_partitions: int = 8):
    """Skew-aware co-location plan for user_id over the event log
    (``ops/layout.plan_partitions``, Graham '69 LPT): one combiner
    pass to per-key counts, driver-side greedy assignment with exact
    integer loads. The recursive-CTE oracle replays the greedy scan
    state (one load column per partition) key by key — integer-exact,
    so assignment parity is bitwise."""
    from jerex_ray.ops.layout import plan_partitions
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id"])
    out = plan_partitions(ds, key="user_id",
                          n_partitions=n_partitions)
    out["user_id"] = out["user_id"].astype("int64")
    return out


def _partition_plan_oracle_sql(m: int = 8) -> str:
    """Generated recursive-CTE replay of the LPT greedy scan: state =
    m integer load columns; pick = lowest index reaching least(l…)."""
    least_r = "least(" + ", ".join(f"r.l{k}" for k in range(m)) + ")"
    pick = "CASE " + " ".join(
        f"WHEN r.l{k} = {least_r} THEN {k}" for k in range(m)) + " END"
    first_loads = ", ".join(
        ("CAST(n_rows AS BIGINT) AS l0" if k == 0
         else f"CAST(0 AS BIGINT) AS l{k}") for k in range(m))
    upd = ", ".join(
        f"r.l{k} + CASE WHEN ({pick}) = {k} THEN s.n_rows ELSE 0 END"
        f" AS l{k}" for k in range(m))
    return f"""
        WITH RECURSIVE counts AS MATERIALIZED (
            SELECT user_id, count(*) AS n_rows
            FROM events GROUP BY user_id),
        seq AS MATERIALIZED (
            SELECT user_id, n_rows,
                   row_number() OVER (ORDER BY n_rows DESC,
                                      user_id ASC) AS rk
            FROM counts),
        rec AS (
            SELECT rk, user_id, n_rows, 0 AS "partition",
                   {first_loads}
            FROM seq WHERE rk = 1
            UNION ALL
            SELECT s.rk, s.user_id, s.n_rows, ({pick}) AS "partition",
                   {upd}
            FROM rec r JOIN seq s ON s.rk = r.rk + 1)
        SELECT user_id, CAST(n_rows AS BIGINT) AS n_rows,
               CAST("partition" AS BIGINT) AS "partition"
        FROM rec ORDER BY user_id
    """


def _bootstrap_ci_oracle_sql(reps: int = 32) -> str:
    """Replays the Poisson bootstrap bit-for-bit: same md5-uniform,
    same threshold literals (repr round-trips to the identical
    double), same replicate means and type-7 percentiles."""
    thr = _poisson1_thresholds()
    case = "CASE " + " ".join(
        f"WHEN u < {t!r} THEN {k}" for k, t in enumerate(thr)) \
        + f" ELSE {len(thr)} END"
    return f"""
        WITH reps AS (SELECT unnest(range(0, {reps})) AS rep),
        r AS (
            SELECT reps.rep, CAST(e.value AS DOUBLE) AS v,
                   CAST(CAST('0x' || substr(md5('boot|'
                       || CAST(e.event_id AS VARCHAR) || '|'
                       || CAST(reps.rep AS VARCHAR)), 1, 16)
                       AS UBIGINT) AS DOUBLE)
                   / 18446744073709551616.0 AS u
            FROM events e, reps),
        w AS (SELECT rep, v, ({case}) AS w FROM r),
        mu AS (SELECT rep, sum(w * v) / sum(w) AS m
               FROM w GROUP BY rep),
        q AS (SELECT quantile_cont(m, 0.025) AS lo,
                     quantile_cont(m, 0.975) AS hi
              FROM mu),
        t AS (SELECT count(*) AS n,
                     sum(CAST(value AS DOUBLE)) / count(*) AS mean
              FROM events)
        SELECT CAST(t.n AS BIGINT) AS n,
               round(t.mean, 6) AS mean,
               round(q.lo, 6) AS ci_lo,
               round(q.hi, 6) AS ci_hi
        FROM t, q
    """


_POISSON1_CDF = None


def _poisson1_thresholds(kmax: int = 9) -> list:
    """P(X ≤ k) for Poisson(1), k = 0..kmax−1 — shared literals
    between the engine kernel and the SQL oracle."""
    global _POISSON1_CDF
    if _POISSON1_CDF is None:
        import math
        term, cdf, out = math.exp(-1.0), 0.0, []
        for k in range(kmax):
            if k > 0:
                term = term / k
            cdf += term
            out.append(cdf)
        _POISSON1_CDF = out
    return _POISSON1_CDF


def q_events_bootstrap_ci(sf_dir: str, *, reps: int = 32):
    """95 % bootstrap CI for the mean event value via the POISSON
    bootstrap (Chamandy et al. '12, "Estimating uncertainty for
    massive data streams") — the resampling scheme that works in one
    streaming pass: each row gets an independent Poisson(1) weight
    per replicate from a seeded md5-uniform, so no replicate ever
    materializes and the corpus is read ONCE. Per batch only 2·B
    partial sums (Σw, Σw·v per replicate) leave; replicate means and
    the type-7 percentile CI finish on the driver. Deterministic
    md5 weights mean the SQL oracle replays the identical resample
    bit-for-bit (same thresholds literals, same u); half-away mirror
    rounding on the float outputs."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    from jerex_ray.util import md5_hash64
    configure_data_context()
    thr = np.array(_poisson1_thresholds(), dtype=np.float64)
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "value"])

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["event_id"].astype("int64").to_numpy()
        v = df["value"].to_numpy(np.float64)
        rows = []
        for b in range(reps):
            h = np.fromiter(
                (md5_hash64(f"boot|{i}|{b}") for i in ids),
                dtype=np.uint64, count=len(ids))
            u = h.astype(np.float64) / 18446744073709551616.0
            w = np.searchsorted(thr, u, side="right").astype(
                np.float64)
            rows.append((b, float(w.sum()), float((w * v).sum()),
                         np.int64(len(v)), float(v.sum())))
        return pd.DataFrame(rows, columns=["rep", "sw", "swv", "n",
                                           "sv"])

    agg = grouped_aggregate(
        ds.map_batches(partials, batch_format="pandas",
                       batch_size=8192),
        ["rep"], {"sw": ("sw", "sum"), "swv": ("swv", "sum"),
                  "n": ("n", "sum"), "sv": ("sv", "sum")}).to_pandas()
    mu = (agg["swv"] / agg["sw"]).to_numpy(np.float64)
    n = int(agg["n"].iloc[0])
    mean = float(agg["sv"].iloc[0]) / n
    lo = float(np.quantile(mu, 0.025))
    hi = float(np.quantile(mu, 0.975))

    def mirror(x: float) -> float:
        return float(np.copysign(np.floor(abs(x) * 1e6 + 0.5), x)
                     / 1e6)

    return pd.DataFrame({"n": [np.int64(n)], "mean": [mirror(mean)],
                         "ci_lo": [mirror(lo)], "ci_hi": [mirror(hi)]})


def q_events_quantile_sketch(sf_dir: str):
    """Approximate value quantiles from the mergeable equi-width
    histogram sketch (``ops/quantiles.approx_quantiles_histogram``,
    2048 bins) next to their exact twins — the deliberately-
    approximate sibling of ``q_events_value_quantiles`` (which IS the
    oracle-checked exact path). Rows-only: the sketch's answer is an
    upper bin edge, not a SQL-recomputable statistic; the
    (max−min)/nbins error bound vs the rank-floor order statistic is
    pytest-gated (tests/test_relational_extra.py)."""
    from jerex_ray.ops.quantiles import (approx_quantiles_histogram,
                                         distributed_quantiles)
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["value"])
    qs = [0.25, 0.5, 0.75, 0.99]
    approx = approx_quantiles_histogram(ds, "value", qs)
    exact = distributed_quantiles(ds, "value", qs)
    return pd.DataFrame({"q": qs,
                         "approx": np.round(approx, 6),
                         "exact": np.round(exact, 6)})


def emb_mrr(sf_dir: str, *, k: int = 10):
    """Retrieval-quality eval: MRR@10 per label with same-label
    relevance — every vector queries the corpus (the oracle-proven
    ``brute_force_topk`` kernel: one broadcast matrix, deterministic
    cosine/vec_id ordering), self excluded; a query scores 1/rank of
    its first same-label neighbor, 0 if none in the top-k. The
    per-label mean uses the half-away mirror; ranks are
    integer-exact so the SQL row_number oracle agrees on every
    reciprocal. Scale note: eval queries are a BOUNDED set by
    contract (here the labeled table itself) — at corpus scale you
    sample the query side; the corpus side already streams."""
    import pyarrow.parquet as _pq

    from jerex_ray.ops.ann import brute_force_topk
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    tbl = _pq.read_table(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding", "label"])
    qdf = tbl.to_pandas().sort_values("vec_id").reset_index(drop=True)
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    top = brute_force_topk(ds, np.stack(qdf["embedding"].to_numpy()),
                           k=k + 1)
    qid = qdf["vec_id"].to_numpy()
    labels = dict(zip(qdf["vec_id"], qdf["label"].astype(int)))
    t = top.copy()
    t["qvec"] = qid[t["query_idx"].to_numpy()]
    t = t[t["vec_id"] != t["qvec"]]
    t["rk"] = t.groupby("qvec", sort=False).cumcount() + 1
    t = t[t["rk"] <= k]
    t["match"] = (t["vec_id"].map(labels).to_numpy()
                  == t["qvec"].map(labels).to_numpy())
    first = (t[t["match"]].groupby("qvec")["rk"].min())
    rr = pd.Series(0.0, index=qid)
    rr.loc[first.index] = 1.0 / first
    lab = pd.Series({v: labels[v] for v in qid})
    grp = pd.DataFrame({"label": lab, "rr": rr}).groupby("label")["rr"]
    mrr = grp.sum() / grp.count()
    out = pd.DataFrame({
        "label": mrr.index.astype("int64"),
        "n_queries": grp.count().to_numpy(np.int64),
        "mrr": [float(np.copysign(np.floor(abs(x) * 1e6 + 0.5), x)
                      / 1e6) for x in mrr.to_numpy()]})
    return out.sort_values("label").reset_index(drop=True)


def q_events_theilsen(sf_dir: str):
    """Theil–Sen robust trend of hourly mean event value (median of
    all pairwise bucket slopes — 29.4 % breakdown vs OLS's 0): one
    combiner pass reduces the corpus to the hour-bucket mean series
    (grid-bounded), the O(buckets²) pairwise-slope median runs
    vectorized on the driver. Slopes are identical divisions on both
    sides; the median interpolates type-7 like quantile_cont; the
    OLS slope rides along for the robustness contrast."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["ts", "value"])

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        h = df["ts"].astype("datetime64[us]").astype("int64") \
            // 3_600_000_000
        g = (pd.DataFrame({"hour": h.to_numpy(np.int64),
                           "s": df["value"].to_numpy(np.float64),
                           "n": 1})
             .groupby("hour", sort=False).sum().reset_index())
        return g

    m = grouped_aggregate(
        ds.map_batches(partials, batch_format="pandas",
                       batch_size=8192),
        ["hour"], {"s": ("s", "sum"), "n": ("n", "sum")}) \
        .to_pandas().sort_values("hour").reset_index(drop=True)
    hr = m["hour"].to_numpy(np.float64)
    mu = m["s"].to_numpy(np.float64) / m["n"].to_numpy(np.float64)
    i, j = np.triu_indices(len(hr), k=1)
    slopes = (mu[j] - mu[i]) / (hr[j] - hr[i])
    ts_slope = float(np.quantile(slopes, 0.5))
    # OLS on the same buckets for contrast (two-pass centered)
    xc, yc = hr - hr.mean(), mu - mu.mean()
    ols = float((xc * yc).sum() / (xc * xc).sum())

    def mirror(x: float) -> float:
        return float(np.copysign(np.floor(abs(x) * 1e6 + 0.5), x)
                     / 1e6)

    return pd.DataFrame({"n_buckets": [np.int64(len(hr))],
                         "n_pairs": [np.int64(len(slopes))],
                         "theilsen_slope": [mirror(ts_slope)],
                         "ols_slope": [mirror(ols)]})


def q_part_modularity(sf_dir: str):
    """Newman modularity of the BRAND partition over the part
    co-purchase graph — does purchasing cluster along brand lines?
    Per brand: within-community edges e_c, degree mass d_c, and the
    contribution e_c/m − (d_c/2m)² (Q = Σ contributions). Edges are
    the combiner-distinct per-order wedges; the brand map is a
    dimension broadcast; every statistic is an exact-integer count
    with identically-sequenced divisions, so the SQL oracle agrees
    bit-for-bit before rounding."""
    import ray

    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    li = read_parquet_sized(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey"])
    brand = pd.read_parquet(f"{sf_dir}/part.parquet",
                            columns=["p_partkey", "p_brand"])
    bmap = ray.put(dict(zip(brand["p_partkey"], brand["p_brand"])))

    def pairs_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"a": pd.Series(dtype="int64"),
                                 "b": pd.Series(dtype="int64")})
        d = df.drop_duplicates(["l_orderkey", "l_partkey"])
        m = d.merge(d, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        return pd.DataFrame({"a": m["l_partkey_x"].to_numpy(),
                             "b": m["l_partkey_y"].to_numpy()})

    edges = grouped_aggregate(
        grouped_apply(li, ["l_orderkey"], pairs_block),
        ["a", "b"], {"n": (None, "count")}, result_hint="large") \
        .drop_columns(["n"]).materialize()
    n_edges = int(edges.count())

    def within_partial(df: pd.DataFrame) -> pd.DataFrame:
        bm = ray.get(bmap)
        ba = df["a"].map(bm)
        bb = df["b"].map(bm)
        same = ba[ba == bb]
        g = same.value_counts()
        return pd.DataFrame({"brand": g.index.to_numpy(),
                             "ec": g.to_numpy(np.int64)})

    within = grouped_aggregate(
        edges.map_batches(within_partial, batch_format="pandas"),
        ["brand"], {"ec": ("ec", "sum")}).to_pandas()

    def stub_partial(df: pd.DataFrame) -> pd.DataFrame:
        bm = ray.get(bmap)
        s = pd.concat([df["a"].map(bm), df["b"].map(bm)])
        g = s.value_counts()
        return pd.DataFrame({"brand": g.index.to_numpy(),
                             "dc": g.to_numpy(np.int64)})

    dsum = grouped_aggregate(
        edges.map_batches(stub_partial, batch_format="pandas"),
        ["brand"], {"dc": ("dc", "sum")}).to_pandas()
    out = dsum.merge(within, on="brand", how="left")
    out["ec"] = out["ec"].fillna(0).astype("int64")
    out["dc"] = out["dc"].astype("int64")
    m = float(n_edges)
    ec = out["ec"].to_numpy(np.float64)
    dc = out["dc"].to_numpy(np.float64)
    out["contribution"] = np.round(
        ec / m - (dc / (2.0 * m)) * (dc / (2.0 * m)), 6)
    out = out.rename(columns={"ec": "n_within", "dc": "deg_sum"})
    return out[["brand", "n_within", "deg_sum", "contribution"]] \
        .sort_values("brand").reset_index(drop=True)


def q_supplier_hhi(sf_dir: str):
    """Herfindahl–Hirschman revenue-concentration index per nation:
    supplier revenue shares within each nation, HHI = Σ share².
    lineitem streams once (revenue partials per supplier through the
    combiner); the supplier→nation map is a dimension broadcast;
    the nation-level share/square pass is vocabulary-bounded.
    Shares are single divisions of the same sums on both sides;
    6-decimal rounding absorbs summation order."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.functions.join import broadcast_join
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    li = read_parquet_sized(f"{sf_dir}/lineitem.parquet",
                            columns=["l_suppkey", "l_extendedprice",
                                     "l_discount"])

    def rev(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_suppkey": df["l_suppkey"].to_numpy(),
            "revenue": df["l_extendedprice"].to_numpy(np.float64)
            * (1.0 - df["l_discount"].to_numpy(np.float64))})

    per_supp = grouped_aggregate(
        li.map_batches(rev, batch_format="pandas"),
        ["l_suppkey"], {"revenue": ("revenue", "sum")})
    supp = pd.read_parquet(f"{sf_dir}/supplier.parquet",
                           columns=["s_suppkey", "s_nationkey"])
    j = broadcast_join(per_supp, supp, left_on="l_suppkey",
                       right_on="s_suppkey").to_pandas()
    tot = j.groupby("s_nationkey")["revenue"].transform("sum")
    share = j["revenue"].to_numpy(np.float64) / tot.to_numpy(np.float64)
    j = j.assign(sq=share * share)
    out = (j.groupby("s_nationkey")
           .agg(n_suppliers=("l_suppkey", "count"), hhi=("sq", "sum"))
           .reset_index().rename(columns={"s_nationkey": "nationkey"}))
    out["nationkey"] = out["nationkey"].astype("int64")
    out["n_suppliers"] = out["n_suppliers"].astype("int64")
    out["hhi"] = out["hhi"].round(6)
    return out.sort_values("nationkey").reset_index(drop=True)


def doc_compression_ratio(sf_dir: str):
    """Per-document zlib compressibility (level 6) — the classic
    cheap quality/repetition signal web-corpus pipelines filter on
    (highly compressible ⇒ boilerplate or repetition; cf. Gopher's
    repetition rules): ratio = deflated bytes / raw utf-8 bytes.
    One streaming pass; zlib does the per-row work in C. Rows-only:
    DEFLATE output is not SQL-reproducible; determinism and a
    hand-recompute parity check are pytest-gated."""
    import zlib

    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def ratios(df: pd.DataFrame) -> pd.DataFrame:
        raw = [t.encode("utf-8") for t in df["text"].fillna("")]
        rb = np.array([len(b) for b in raw], dtype=np.int64)
        cb = np.array([len(zlib.compress(b, 6)) for b in raw],
                      dtype=np.int64)
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "raw_bytes": rb, "gz_bytes": cb,
            "ratio": np.round(np.where(rb > 0, cb / np.maximum(rb, 1),
                                       np.nan), 6)})

    out = ds.map_batches(ratios, batch_format="pandas",
                         batch_size=8192).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def doc_postings_size(sf_dir: str):
    """Inverted-index size estimation under delta + varint coding
    (the storage model of every posting-list format since VByte,
    Williams & Zobel '99): per term, raw 8-byte postings vs
    gap-encoded varint bytes. One distinct (term, doc) explode, one
    term hash shuffle; gaps and byte classes are vectorized per
    block. Integer-exact end to end — the SQL LAG oracle agrees on
    every byte."""
    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        words = df["text"].fillna("").str.lower().str.split()
        lens = words.str.len().fillna(0).to_numpy(np.int64)
        if lens.sum() == 0:
            return pd.DataFrame({"term": pd.Series(dtype="object"),
                                 "doc_id": pd.Series(dtype="int64")})
        ids = df["doc_id"].astype("int64").to_numpy()
        flat = pd.DataFrame({
            "doc_id": np.repeat(ids, lens),
            "term": np.concatenate([w for w in words.to_numpy() if w])})
        return flat.drop_duplicates()[["term", "doc_id"]]

    inc = grouped_aggregate(
        ds.map_batches(explode, batch_format="pandas",
                       batch_size=8192),
        ["term", "doc_id"], {"n": (None, "count")},
        result_hint="large").drop_columns(["n"])

    def sizes(block: pd.DataFrame) -> pd.DataFrame:
        if block.empty:
            return pd.DataFrame({
                "term": pd.Series(dtype="object"),
                "df": pd.Series(dtype="int64"),
                "raw_bytes": pd.Series(dtype="int64"),
                "varint_bytes": pd.Series(dtype="int64"),
                "ratio": pd.Series(dtype="float64")})
        b = block.sort_values(["term", "doc_id"])
        ids = b["doc_id"].to_numpy(np.int64)
        terms = b["term"].to_numpy()
        new_t = np.r_[True, terms[1:] != terms[:-1]]
        gaps = np.diff(np.r_[np.int64(0), ids])
        gaps[new_t] = ids[new_t]        # first posting: absolute id
        vb = np.select([gaps < 128, gaps < 16384, gaps < 2097152,
                        gaps < 268435456], [1, 2, 3, 4], 5)
        g = pd.DataFrame({"term": terms, "vb": vb}) \
            .groupby("term", sort=False)["vb"].agg(["count", "sum"]) \
            .reset_index()
        df_ = g["count"].to_numpy(np.int64)
        vbytes = g["sum"].to_numpy(np.int64)
        return pd.DataFrame({
            "term": g["term"], "df": df_, "raw_bytes": df_ * 8,
            "varint_bytes": vbytes,
            "ratio": np.round(vbytes / (df_ * 8.0), 6)})

    out = grouped_apply(inc, ["term"], sizes).to_pandas()
    for c in ("df", "raw_bytes", "varint_bytes"):
        out[c] = out[c].astype("int64")
    return out.sort_values("term").reset_index(drop=True)


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


def q_events_kanonymity(sf_dir: str, *, k: int = 5):
    """k-anonymity audit of the event log under the quasi-identifier
    (user-id bucket, hour-of-day, event_type) — Sweeney '02: what
    share of rows sit in equivalence classes smaller than k (the
    re-identifiable tail a release would need to suppress or
    generalize)? One combiner pass to class counts (QI-vocabulary
    bounded), then a class-size rollup. Integer-exact; SQL-oracled."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_type"])

    def qi(df: pd.DataFrame) -> pd.DataFrame:
        hod = (df["ts"].astype("datetime64[us]").astype("int64")
               // 3_600_000_000) % 24
        return pd.DataFrame({
            "ubucket": df["user_id"].to_numpy(np.int64) // 10,
            "hod": hod.to_numpy(np.int64),
            "event_type": df["event_type"].to_numpy(),
            "n": 1}).groupby(["ubucket", "hod", "event_type"],
                             sort=False).sum().reset_index()

    cls = grouped_aggregate(
        ds.map_batches(qi, batch_format="pandas", batch_size=8192),
        ["ubucket", "hod", "event_type"], {"n": ("n", "sum")},
        result_hint="large").to_pandas()
    n_rows = int(cls["n"].sum())
    small = cls[cls["n"] < k]
    return pd.DataFrame({
        "n_rows": [np.int64(n_rows)],
        "n_classes": [np.int64(len(cls))],
        "n_small_classes": [np.int64(len(small))],
        "rows_at_risk": [np.int64(small["n"].sum())],
        "risk_share": [round(float(small["n"].sum()) / n_rows, 6)],
        "min_class": [np.int64(cls["n"].min())]})


def q_user_ab_assignment(sf_dir: str):
    """Deterministic experiment bucketing + sample-ratio-mismatch
    check (the first audit any A/B platform runs): arm = md5(user)
    parity (the oracle replays the identical hash), per-arm user and
    event counts, and the SRM chi-square (na−nb)²/(na+nb) on USER
    counts with its ~χ²₁ threshold flag. One combiner pass over
    (user → events), arm assignment on the user-bounded table."""
    import hashlib

    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id"])
    users = grouped_aggregate(ds, ["user_id"],
                              {"n_events": (None, "count")}).to_pandas()
    arm = np.array([
        int.from_bytes(hashlib.md5(f"ab|{u}".encode()).digest()[:8],
                       "big") % 2
        for u in users["user_id"]], dtype=np.int64)
    users = users.assign(arm=arm)
    g = users.groupby("arm").agg(n_users=("user_id", "count"),
                                 n_events=("n_events", "sum"))
    na = float(g.loc[0, "n_users"]) if 0 in g.index else 0.0
    nb = float(g.loc[1, "n_users"]) if 1 in g.index else 0.0
    chi2 = (na - nb) * (na - nb) / (na + nb)
    out = g.reset_index()
    out["arm"] = out["arm"].astype("int64")
    out["n_users"] = out["n_users"].astype("int64")
    out["n_events"] = out["n_events"].astype("int64")
    out["srm_chi2"] = round(chi2, 6)
    out["srm_flag"] = np.int64(chi2 > 3.841459)  # chi2_1 at alpha=.05
    return out.sort_values("arm").reset_index(drop=True)


def q_user_km_survival(sf_dir: str):
    """Kaplan–Meier survival curve of inter-purchase times with
    right-censoring (Kaplan & Meier '58) — "how long until a user
    buys again", the churn/retention primitive done properly: the
    gap after each user's LAST purchase is censored at the stream
    horizon instead of dropped. Users co-locate once for the LAG
    pass; (duration, censored) rows reduce through the combiner to a
    distinct-duration grid; at-risk counts are a reverse cumulative
    sum on that grid and S(t) = exp(Σ ln(1−dᵢ/nᵢ)) accumulates with
    math.log/exp (glibc — the same libm DuckDB's ln/exp bind), so
    the window-sum oracle matches at 6 decimals. Scale note: at
    corpus scale quantize durations (seconds/minutes) so the grid
    stays bounded — the estimator is unchanged on the quantized
    grid."""
    import math

    import pyarrow.parquet as _pq

    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts",
                                     "event_type"])
    ts_col = _pq.read_table(f"{sf_dir}/events.parquet",
                            columns=["ts"])["ts"].to_pandas()
    horizon = int(ts_col.astype("datetime64[us]").astype("int64")
                  .max())

    def durations(block: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"dur": pd.Series(dtype="int64"),
                              "cens": pd.Series(dtype="int64"),
                              "n": pd.Series(dtype="int64")})
        b = block[block["event_type"] == "purchase"]
        if b.empty:
            return empty
        b = b.sort_values(["user_id", "ts", "event_id"])
        t = b["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        uid = b["user_id"].to_numpy()
        same = np.r_[uid[1:] == uid[:-1], False]
        dur = np.where(same, np.r_[t[1:], 0] - t, horizon - t)
        cens = (~same).astype(np.int64)
        g = (pd.DataFrame({"dur": dur, "cens": cens, "n": 1})
             .groupby(["dur", "cens"], sort=False).sum().reset_index())
        return g

    grid = grouped_aggregate(
        grouped_apply(ds, ["user_id"], durations),
        ["dur", "cens"], {"n": ("n", "sum")}).to_pandas()
    grid = grid.sort_values("dur").reset_index(drop=True)
    total = int(grid["n"].sum())
    # at-risk just before t = total - (#durations strictly < t)
    by_t = grid.groupby("dur").agg(
        all_n=("n", "sum"),
        d=("n", lambda s: 0)).reset_index()
    dcounts = grid[grid["cens"] == 0].groupby("dur")["n"].sum()
    by_t["d"] = by_t["dur"].map(dcounts).fillna(0).astype(np.int64)
    before = np.r_[0, np.cumsum(by_t["all_n"].to_numpy(np.int64))[:-1]]
    by_t["n_risk"] = total - before
    ev = by_t[by_t["d"] > 0].reset_index(drop=True)
    # terminal grid point may absorb every remaining at-risk row
    # (d == n_risk): S drops to exactly 0 there — guard the log on
    # both engines identically
    logs = [0.0 if int(r["d"]) == int(r["n_risk"])
            else math.log(1.0 - int(r["d"]) / float(r["n_risk"]))
            for _, r in ev.iterrows()]
    cums = np.cumsum(logs) if logs else np.array([])
    surv = [0.0 if int(r["d"]) == int(r["n_risk"])
            else math.exp(c)
            for (_, r), c in zip(ev.iterrows(), cums)]
    return pd.DataFrame({
        "dur_us": ev["dur"].astype("int64"),
        "n_risk": ev["n_risk"].astype("int64"),
        "n_events": ev["d"].astype("int64"),
        "survival": np.round(surv, 6)})


def q_user_logrank(sf_dir: str):
    """Log-rank test (Mantel '66) between the even- and odd-user
    cohorts' inter-purchase survival — "does cohort A churn back to
    purchase faster?", the hypothesis-test companion of
    ``q_user_km_survival``. Same one co-located LAG pass, now with a
    cohort key; per pooled event time the hypergeometric moments
    E₁ = d·n₁/n and V accumulate over the duration grid (driver
    arithmetic, grid-bounded; at corpus scale quantize durations to
    keep the grid bounded). χ² = (Σ(d₁−E₁))²/ΣV. Integer counts +
    identically-sequenced float terms → SQL parity at 6 decimals."""
    import pyarrow.parquet as _pq

    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts",
                                     "event_type"])
    ts_col = _pq.read_table(f"{sf_dir}/events.parquet",
                            columns=["ts"])["ts"].to_pandas()
    horizon = int(ts_col.astype("datetime64[us]").astype("int64")
                  .max())

    def durations(block: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"dur": pd.Series(dtype="int64"),
                              "cens": pd.Series(dtype="int64"),
                              "grp": pd.Series(dtype="int64"),
                              "n": pd.Series(dtype="int64")})
        b = block[block["event_type"] == "purchase"]
        if b.empty:
            return empty
        b = b.sort_values(["user_id", "ts", "event_id"])
        t = b["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        uid = b["user_id"].to_numpy(np.int64)
        same = np.r_[uid[1:] == uid[:-1], False]
        dur = np.where(same, np.r_[t[1:], 0] - t, horizon - t)
        return (pd.DataFrame({"dur": dur,
                              "cens": (~same).astype(np.int64),
                              "grp": uid % 2, "n": 1})
                .groupby(["dur", "cens", "grp"], sort=False)
                .sum().reset_index())

    grid = grouped_aggregate(
        grouped_apply(ds, ["user_id"], durations),
        ["dur", "cens", "grp"], {"n": ("n", "sum")}).to_pandas()
    total = int(grid["n"].sum())
    total1 = int(grid.loc[grid["grp"] == 1, "n"].sum())
    by_t = grid.groupby("dur").agg(all_n=("n", "sum")).reset_index() \
        .sort_values("dur").reset_index(drop=True)
    d_all = grid[grid["cens"] == 0].groupby("dur")["n"].sum()
    d1 = grid[(grid["cens"] == 0) & (grid["grp"] == 1)] \
        .groupby("dur")["n"].sum()
    all1 = grid[grid["grp"] == 1].groupby("dur")["n"].sum()
    by_t["d"] = by_t["dur"].map(d_all).fillna(0).astype(np.int64)
    by_t["d1"] = by_t["dur"].map(d1).fillna(0).astype(np.int64)
    by_t["a1"] = by_t["dur"].map(all1).fillna(0).astype(np.int64)
    before = np.r_[0, np.cumsum(by_t["all_n"].to_numpy(np.int64))[:-1]]
    before1 = np.r_[0, np.cumsum(by_t["a1"].to_numpy(np.int64))[:-1]]
    n_risk = (total - before).astype(np.float64)
    n1_risk = (total1 - before1).astype(np.float64)
    ev = by_t["d"].to_numpy(np.float64)
    ev1 = by_t["d1"].to_numpy(np.float64)
    keep = (ev > 0)
    n, n1, d, dd1 = n_risk[keep], n1_risk[keep], ev[keep], ev1[keep]
    e1 = d * n1 / n
    with np.errstate(invalid="ignore", divide="ignore"):
        v = np.where(n > 1.0,
                     d * (n1 / n) * (1.0 - n1 / n) * (n - d)
                     / (n - 1.0), 0.0)
    omE = float((dd1 - e1).sum())
    V = float(v.sum())
    chi2 = omE * omE / V
    return pd.DataFrame({
        "n_events_1": [np.int64(dd1.sum())],
        "n_events_0": [np.int64((d - dd1).sum())],
        "obs_minus_exp": [round(omE, 6)],
        "variance": [round(V, 6)],
        "chi2": [round(chi2, 6)]})


def q_user_cuped(sf_dir: str):
    """CUPED variance reduction (Deng et al., WSDM '13) on the A/B
    cohorts: per-user post-period mean value adjusted by the
    pre-period covariate, θ = Σx̃ỹ/Σx̃² fitted globally, then per-arm
    variance of Y vs Y_adj — the experimentation-platform op that
    shrinks CIs without touching the treatment. Pre/post split at
    the stream's timestamp midpoint; per-user means through ONE
    combiner pass; θ and the per-arm two-pass variances run on the
    user-bounded table. Same expression sequencing as the SQL
    oracle; 6-decimal rounding absorbs sum-order dust."""
    import pyarrow.parquet as _pq

    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ts_col = _pq.read_table(f"{sf_dir}/events.parquet",
                            columns=["ts"])["ts"].to_pandas() \
        .astype("datetime64[us]").astype("int64")
    mid = (int(ts_col.min()) + int(ts_col.max())) // 2
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "value"])

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        t = df["ts"].astype("datetime64[us]").astype("int64") \
            .to_numpy()
        post = (t > mid).astype(np.int64)
        return (pd.DataFrame({"user_id": df["user_id"].to_numpy(),
                              "period": post,
                              "s": df["value"].to_numpy(np.float64),
                              "n": 1})
                .groupby(["user_id", "period"], sort=False)
                .sum().reset_index())

    m = grouped_aggregate(
        ds.map_batches(partials, batch_format="pandas",
                       batch_size=8192),
        ["user_id", "period"], {"s": ("s", "sum"), "n": ("n", "sum")},
        result_hint="large").to_pandas()
    wide = m.pivot(index="user_id", columns="period",
                   values=["s", "n"])
    both = wide.dropna()
    x = (both[("s", 0)] / both[("n", 0)]).to_numpy(np.float64)
    y = (both[("s", 1)] / both[("n", 1)]).to_numpy(np.float64)
    uid = both.index.to_numpy(np.int64)
    mx, my = x.mean(), y.mean()
    theta = ((x - mx) * (y - my)).sum() / ((x - mx) * (x - mx)).sum()
    yadj = y - theta * (x - mx)
    def mirror(v: float) -> float:
        return float(np.copysign(np.floor(abs(v) * 1e6 + 0.5), v)
                     / 1e6)

    rows = []
    for arm in (0, 1):
        sel = (uid % 2) == arm
        ya, yj = y[sel], yadj[sel]
        va = ((ya - ya.mean()) ** 2).sum() / len(ya)
        vj = ((yj - yj.mean()) ** 2).sum() / len(yj)
        rows.append((arm, len(ya), mirror(float(ya.mean())),
                     mirror(float(yj.mean())), mirror(float(va)),
                     mirror(float(vj)), mirror(float(theta)),
                     mirror(float(1.0 - vj / va))))
    return pd.DataFrame(rows, columns=[
        "arm", "n_users", "mean_y", "mean_y_adj", "var_y",
        "var_y_adj", "theta", "var_reduction"])


def q_events_changepoint(sf_dir: str):
    """Single least-squares changepoint of the hourly event-count
    series (the binary-segmentation step, Scott & Knott '74 /
    ruptures' l2 model): argmin over split points of
    SSE_left + SSE_right, each SSE = Σy² − (Σy)²/len from exact
    integer prefix sums — so every candidate's cost is bit-identical
    to the SQL window oracle and the argmin cannot flip (tie →
    earliest hour). One combiner pass to the hour grid; the O(grid)
    scan is vectorized on the driver."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["ts"])

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        h = df["ts"].astype("datetime64[us]").astype("int64") \
            // 3_600_000_000
        g = pd.Series(h.to_numpy()).value_counts()
        return pd.DataFrame({"hour": g.index.to_numpy(np.int64),
                             "c": g.to_numpy(np.int64)})

    m = grouped_aggregate(
        ds.map_batches(partials, batch_format="pandas",
                       batch_size=65536),
        ["hour"], {"c": ("c", "sum")}) \
        .to_pandas().sort_values("hour").reset_index(drop=True)
    y = m["c"].to_numpy(np.float64)
    hr = m["hour"].to_numpy(np.int64)
    n = len(y)
    s = np.cumsum(y)
    s2 = np.cumsum(y * y)
    tot_s, tot_s2 = s[-1], s2[-1]
    k = np.arange(1, n)                  # left segment = [0, k)
    sse_l = s2[k - 1] - (s[k - 1] * s[k - 1]) / k
    sse_r = (tot_s2 - s2[k - 1]) \
        - ((tot_s - s[k - 1]) * (tot_s - s[k - 1])) / (n - k)
    cost = sse_l + sse_r
    best = np.lexsort((hr[k], cost))[0]  # cost ASC, hour ASC
    kb = int(k[best])
    sse_tot = tot_s2 - (tot_s * tot_s) / n
    return pd.DataFrame({
        "split_hour": [np.int64(hr[kb])],
        "n_left": [np.int64(kb)], "n_right": [np.int64(n - kb)],
        "mean_left": [round(float(s[kb - 1] / kb), 6)],
        "mean_right": [round(float((tot_s - s[kb - 1]) / (n - kb)),
                             6)],
        "sse_total": [round(float(sse_tot), 6)],
        "sse_split": [round(float(cost[best]), 6)]})


def q_basket_triples(sf_dir: str):
    """Frequent 3-itemsets over order baskets — Apriori proper
    (``ops/baskets.frequent_triples``): frequent pairs → prefix-join
    candidate generation with (b,c) pruning (anti-monotone, lossless
    at the shared min_count) → one streaming support-count pass with
    block-local membership semi-joins. Integer-exact vs the 3-way
    self-join SQL oracle (which needs no pruning — it IS the ground
    truth the pruned engine must reproduce)."""
    from jerex_ray.ops.baskets import frequent_triples
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    li = read_parquet_sized(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey"])
    return frequent_triples(li, basket_col="l_orderkey",
                            item_col="l_partkey", min_count=2)


def q_events_hill_tail(sf_dir: str, *, k: int = 200):
    """Hill estimator of the value distribution's tail index (Hill
    '75) over the top-k order statistics — the heavy-tail audit that
    decides whether means/variances are even finite:
    α̂ = k / Σ ln(x_(i)/x_(k+1)). The top-(k+1) values come from a
    per-block partial top-k + single merge (no global sort); logs
    accumulate with math.log (glibc = DuckDB ln). Deterministic
    ties via value ordering only (order statistics, ids
    irrelevant); 6-decimal rounding."""
    import math

    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["value"])

    def local_top(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value"].to_numpy(np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return pd.DataFrame({"v": pd.Series(dtype="float64")})
        top = np.sort(v)[-(k + 1):]
        return pd.DataFrame({"v": top})

    def merge_top(df: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(df["v"].to_numpy(np.float64))[-(k + 1):]
        return pd.DataFrame({"v": v})

    top = grouped_apply(
        ds.map_batches(local_top, batch_format="pandas",
                       batch_size=65536),
        [], merge_top, single_block=True).to_pandas()
    v = np.sort(top["v"].to_numpy(np.float64))[::-1]
    xk1 = float(v[k])
    logs = [math.log(float(x) / xk1) for x in v[:k]]
    ssum = float(np.sum(logs))
    alpha = k / ssum
    return pd.DataFrame({
        "k": [np.int64(k)],
        "x_k1": [round(xk1, 6)],
        "log_sum": [round(ssum, 6)],
        "alpha": [round(alpha, 6)]})


def emb_ndcg(sf_dir: str, *, k: int = 10):
    """NDCG@10 per label with binary same-label relevance — the
    graded companion of ``emb_mrr`` over the same oracle-proven
    exact top-k kernel: DCG = Σ rel_r/log2(r+1) over each query's
    top-k (self excluded), IDCG from the label's achievable ideal
    (min(k, label size − 1)); math.log2 = glibc = DuckDB log2, so
    every discount matches bit-for-bit; per-label means mirror-
    rounded. Eval queries are a bounded set by contract (sample the
    query side at corpus scale)."""
    import math

    import pyarrow.parquet as _pq

    from jerex_ray.ops.ann import brute_force_topk
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    qdf = _pq.read_table(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding", "label"]) \
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    top = brute_force_topk(ds, np.stack(qdf["embedding"].to_numpy()),
                           k=k + 1)
    qid = qdf["vec_id"].to_numpy()
    labels = dict(zip(qdf["vec_id"], qdf["label"].astype(int)))
    lab_sizes = qdf["label"].astype(int).value_counts().to_dict()
    disc = {r: 1.0 / math.log2(r + 1.0) for r in range(1, k + 1)}
    t = top.copy()
    t["qvec"] = qid[t["query_idx"].to_numpy()]
    t = t[t["vec_id"] != t["qvec"]]
    t["rk"] = t.groupby("qvec", sort=False).cumcount() + 1
    t = t[t["rk"] <= k]
    t["rel"] = (t["vec_id"].map(labels).to_numpy()
                == t["qvec"].map(labels).to_numpy())
    dcg = (t[t["rel"]].assign(d=lambda d: d["rk"].map(disc))
           .groupby("qvec")["d"].sum())
    rows = {}
    for v in qid:
        lab = labels[v]
        r_max = min(k, lab_sizes[lab] - 1)
        idcg = sum(disc[r] for r in range(1, r_max + 1))
        nd = float(dcg.get(v, 0.0)) / idcg
        rows.setdefault(lab, []).append(nd)
    out = pd.DataFrame(
        [(lab, len(vals),
          float(np.copysign(np.floor(abs(np.sum(vals) / len(vals))
                                     * 1e6 + 0.5),
                            np.sum(vals) / len(vals)) / 1e6))
         for lab, vals in sorted(rows.items())],
        columns=["label", "n_queries", "ndcg"])
    out["label"] = out["label"].astype("int64")
    out["n_queries"] = out["n_queries"].astype("int64")
    return out


def emb_ivf_recall(sf_dir: str, *, k: int = 10):
    """Recall@10 of the IVF index against exact brute force as a
    function of n_probe — the accuracy/cost curve every ANN
    deployment tunes, surfaced as a first-class result instead of a
    hidden pytest number. One exact pass (the oracle-proven kernel)
    + one IVF pass per probe setting over the SAME fixed query set;
    recall = |ivf ∩ exact| / k averaged over queries. Rows-only
    (approximate by design); monotone-recall and floor invariants
    are pytest-gated."""
    import pyarrow.parquet as _pq

    from jerex_ray.ops.ann import brute_force_topk, ivf_topk
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    qdf = _pq.read_table(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"]) \
        .to_pandas().sort_values("vec_id").head(64) \
        .reset_index(drop=True)
    queries = np.stack(qdf["embedding"].to_numpy())
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    exact = brute_force_topk(ds, queries, k=k)
    truth = {qi: set(g["vec_id"]) for qi, g in
             exact.groupby("query_idx")}
    rows = []
    for n_probe in (1, 2, 4, 16):   # 16 = n_cells: full probe == exact
        approx = ivf_topk(ds, queries, k=k, n_probe=n_probe)
        got = {qi: set(g["vec_id"]) for qi, g in
               approx.groupby("query_idx")}
        rec = np.mean([len(got.get(qi, set()) & t) / len(t)
                       for qi, t in truth.items()])
        rows.append((n_probe, len(truth), round(float(rec), 6)))
    return pd.DataFrame(rows, columns=["n_probe", "n_queries",
                                       "recall_at_10"])


def q_join_skew_audit(sf_dir: str):
    """Pre-join skew diagnostic for orders⋈lineitem on orderkey —
    the audit you run BEFORE committing to a hash join at scale:
    per-side key-fanout distribution (n_keys, total, max, exact
    p50/p99 of rows-per-key via the shuffle-free quantile selector
    over the key-cardinality-bounded counts Dataset — never
    collected). A hot key on both sides multiplies; the planner
    (``q_events_partition_plan``) is the mitigation. Integer counts
    + quantile_cont-parity percentiles; SQL-oracled."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.ops.quantiles import distributed_quantiles
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    sides = [
        ("lineitem", read_parquet_sized(
            f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"]),
         "l_orderkey"),
        ("orders", read_parquet_sized(
            f"{sf_dir}/orders.parquet", columns=["o_orderkey"]),
         "o_orderkey"),
    ]
    rows = []
    for name, ds, key in sides:
        counts = grouped_aggregate(ds, [key], {"n": (None, "count")},
                                   result_hint="large").materialize()

        def as_float(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"n": df["n"].to_numpy(np.float64)})

        cf = counts.map_batches(as_float, batch_format="pandas")
        p50, p99 = distributed_quantiles(cf, "n", [0.5, 0.99])
        stats = grouped_aggregate(
            counts.map_batches(
                lambda df: pd.DataFrame(
                    {"__all": [0], "keys": [len(df)],
                     "total": [int(df["n"].sum())],
                     "mx": [int(df["n"].max()) if len(df) else 0]}),
                batch_format="pandas", batch_size=None),
            ["__all"], {"keys": ("keys", "sum"),
                        "total": ("total", "sum"),
                        "mx": ("mx", "max")}).to_pandas().iloc[0]
        rows.append((name, np.int64(stats["keys"]),
                     np.int64(stats["total"]), np.int64(stats["mx"]),
                     round(float(p50), 6), round(float(p99), 6)))
    return pd.DataFrame(rows, columns=["side", "n_keys", "total_rows",
                                       "max_rows", "p50_rows",
                                       "p99_rows"]) \
        .sort_values("side").reset_index(drop=True)


def q_events_mutual_info(sf_dir: str):
    """Mutual information (nats) between event type and hour-of-day —
    the dependence audit behind 'is traffic mix time-shifted?': one
    combiner pass reduces the corpus to the type × 24-hour joint grid
    (vocabulary-bounded, never more than #types·24 rows leave the
    scan), marginals and MI = Σ p_xy·ln(p_xy/(p_x·p_y)) on the
    driver with math.log (glibc = DuckDB ln). Also H(type), H(hour)
    and the normalized NMI = MI/√(H_x·H_y); 6-decimal rounding
    absorbs the ~200-term summation-order dust."""
    import math

    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["ts", "event_type"])

    def joint(df: pd.DataFrame) -> pd.DataFrame:
        hod = (df["ts"].astype("datetime64[us]").astype("int64")
               // 3_600_000_000) % 24
        return pd.DataFrame({
            "event_type": df["event_type"].to_numpy(),
            "hod": hod.to_numpy(np.int64),
            "n": 1}).groupby(["event_type", "hod"],
                             sort=False).sum().reset_index()

    jt = grouped_aggregate(
        ds.map_batches(joint, batch_format="pandas", batch_size=65536),
        ["event_type", "hod"], {"n": ("n", "sum")}).to_pandas() \
        .sort_values(["event_type", "hod"]).reset_index(drop=True)
    n = float(jt["n"].sum())
    px = jt.groupby("event_type")["n"].sum() / n
    py = jt.groupby("hod")["n"].sum() / n
    mi = 0.0
    for t, h, c in zip(jt["event_type"], jt["hod"], jt["n"]):
        pxy = c / n
        mi += pxy * math.log(pxy / (float(px[t]) * float(py[h])))
    hx = -sum(p * math.log(p) for p in px.sort_index())
    hy = -sum(p * math.log(p) for p in py.sort_index())
    return pd.DataFrame({
        "n": [np.int64(n)],
        "h_type": [round(hx, 6)], "h_hour": [round(hy, 6)],
        "mi": [round(mi, 6)],
        "nmi": [round(mi / math.sqrt(hx * hy), 6)]})


def q_events_drawdown(sf_dir: str):
    """Maximum drawdown of the cumulative hourly net event value —
    the risk/monitoring primitive (how far below its running peak did
    the cumulative series fall, and where). EXACT integer cents
    throughout: one combiner pass to per-hour Σcents (int64), then a
    driver scan of the hour grid — cum/running-max/drawdown are all
    integer comparisons, so peak/trough selection has zero
    float-boundary hazard on either engine. Ties: largest drawdown →
    earliest trough hour; peak = earliest hour ≤ trough attaining the
    running max."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["ts", "value"])

    def hours(df: pd.DataFrame) -> pd.DataFrame:
        hr = (df["ts"].astype("datetime64[us]").astype("int64")
              // 3_600_000_000)
        cents = np.round(df["value"].to_numpy(np.float64)
                         * 100).astype(np.int64)
        return pd.DataFrame({"hour": hr.to_numpy(np.int64),
                             "c": cents}) \
            .groupby("hour", sort=False).sum().reset_index()

    g = grouped_aggregate(
        ds.map_batches(hours, batch_format="pandas", batch_size=65536),
        ["hour"], {"c": ("c", "sum")}).to_pandas() \
        .sort_values("hour").reset_index(drop=True)
    hr = g["hour"].to_numpy(np.int64)
    cum = g["c"].to_numpy(np.int64).cumsum()
    runmax = np.maximum.accumulate(cum)
    dd = runmax - cum
    ti = int(np.lexsort((hr, -dd))[0])      # dd DESC, hour ASC
    peak_cum = int(runmax[ti])
    pi = int(np.flatnonzero(cum[:ti + 1] == peak_cum)[0])
    return pd.DataFrame({
        "peak_hour": [np.int64(hr[pi])],
        "trough_hour": [np.int64(hr[ti])],
        "peak_cum": [round(peak_cum / 100.0, 2)],
        "trough_cum": [round(int(cum[ti]) / 100.0, 2)],
        "max_drawdown": [round(int(dd[ti]) / 100.0, 2)]})


def q_events_kmv_distinct(sf_dir: str, *, k: int = 64):
    """KMV (k-minimum-values) distinct-user estimate per event type
    (Bar-Yossef '02) — the mergeable bottom-k sketch companion to the
    HLL op, with an estimate the oracle can replay EXACTLY: per type
    keep the k smallest distinct md5-64 hashes of user_id; est =
    (k−1)/(h_k/2⁶⁴). h_k/2⁶⁴ is an exponent shift (exact in binary),
    so est is the identical double on both engines; fewer than k
    distinct hashes degrades to the exact count. Per-block partial
    bottom-k through the combiner; only #types·k hashes reach the
    merge."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    from jerex_ray.util import md5_hash64_batch
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_type", "user_id"])

    def local_bottom(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for t, g in df.groupby("event_type", sort=False):
            h = np.unique(md5_hash64_batch(
                g["user_id"].astype(str).to_numpy()))
            out.append(pd.DataFrame({"event_type": t, "h": h[:k]}))
        if not out:
            return pd.DataFrame({"event_type": pd.Series(dtype=object),
                                 "h": pd.Series(dtype="uint64")})
        return pd.concat(out, ignore_index=True)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for t, g in df.groupby("event_type", sort=False):
            h = np.unique(g["h"].to_numpy(np.uint64))
            nk = min(k, len(h))
            frac = float(int(h[nk - 1])) / float(1 << 64)
            est = float(nk) if nk < k else (k - 1) / frac
            rows.append((t, np.int64(nk), round(frac, 6),
                         round(est, 6)))
        return pd.DataFrame(rows, columns=["event_type", "k_used",
                                           "kth_frac", "est_distinct"])

    out = grouped_apply(
        ds.map_batches(local_bottom, batch_format="pandas",
                       batch_size=65536),
        [], merge, single_block=True).to_pandas()
    return out.sort_values("event_type").reset_index(drop=True)


def q_events_xcorr(sf_dir: str, *, max_lag: int = 3):
    """Lagged cross-correlation between the hourly count series of
    the two most frequent event types (lead/lag discovery: does type
    A's traffic predict type B's?). One combiner pass to the two
    types' (hour, count) rows; the driver zero-fills the shared dense
    hour grid (span-bounded) and computes Pearson r of (a[t],
    b[t+lag]) for lag ∈ [−max_lag, max_lag] from integer sums — only
    the final correlate divides floats, and 6-decimal rounding
    absorbs the dust. Type pick: count DESC, name ASC."""
    import math

    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["ts", "event_type"])

    def hours(df: pd.DataFrame) -> pd.DataFrame:
        hr = (df["ts"].astype("datetime64[us]").astype("int64")
              // 3_600_000_000)
        return pd.DataFrame({"event_type": df["event_type"].to_numpy(),
                             "hour": hr.to_numpy(np.int64),
                             "n": 1}) \
            .groupby(["event_type", "hour"], sort=False).sum() \
            .reset_index()

    g = grouped_aggregate(
        ds.map_batches(hours, batch_format="pandas", batch_size=65536),
        ["event_type", "hour"], {"n": ("n", "sum")}).to_pandas()
    tot = g.groupby("event_type")["n"].sum()
    ta, tb = tot.reset_index().sort_values(
        ["n", "event_type"], ascending=[False, True])["event_type"] \
        .head(2).tolist()
    hmin = int(g.loc[g["event_type"].isin([ta, tb]), "hour"].min())
    hmax = int(g.loc[g["event_type"].isin([ta, tb]), "hour"].max())
    span = hmax - hmin + 1
    a = np.zeros(span, dtype=np.int64)
    b = np.zeros(span, dtype=np.int64)
    for arr, t in ((a, ta), (b, tb)):
        sub = g[g["event_type"] == t]
        arr[sub["hour"].to_numpy(np.int64) - hmin] = \
            sub["n"].to_numpy(np.int64)
    rows = []
    for lag in range(-max_lag, max_lag + 1):
        if lag >= 0:
            x, y = a[:span - lag], b[lag:]
        else:
            x, y = a[-lag:], b[:span + lag]
        m = len(x)
        sx, sy = int(x.sum()), int(y.sum())
        sxx = int((x * x).sum())
        syy = int((y * y).sum())
        sxy = int((x.astype(np.int64) * y).sum())
        num = m * sxy - sx * sy
        den = math.sqrt(float(m * sxx - sx * sx)) \
            * math.sqrt(float(m * syy - sy * sy))
        rows.append((np.int64(lag), np.int64(m),
                     round(num / den, 6)))
    return pd.DataFrame(rows, columns=["lag", "n_hours", "r"]) \
        .sort_values("lag").reset_index(drop=True)


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


def q_part_harmonic(sf_dir: str, *, n_sources: int = 8):
    """Harmonic centrality (Boldi-Vigna '14) of the ``n_sources``
    smallest parts in the co-purchase graph — the sampled-source
    centrality sweep every graph-health audit runs. ONE
    ``multi_bfs_levels`` grid pass carries all K sources' frontiers
    over a single edge partitioning (K separate BFS runs would
    re-shuffle the edge table K times). Exactness: levels are capped
    at 8 on BOTH engines (the dense co-purchase graph's eccentricity
    is ~3), and the harmonic sum is computed as the INTEGER
    ``h840 = Σ 840/level`` (840 = lcm(1..8), so every term is exact)
    — the float column is just h840/840 rounded, no accumulation-order
    hazard."""
    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply
    from jerex_ray.ops.graph import multi_bfs_levels
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    li = read_parquet_sized(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey"])

    def pairs_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"a": pd.Series(dtype="int64"),
                                 "b": pd.Series(dtype="int64")})
        d = df.drop_duplicates(["l_orderkey", "l_partkey"])
        m = d.merge(d, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        return pd.DataFrame({"a": m["l_partkey_x"].to_numpy(),
                             "b": m["l_partkey_y"].to_numpy()})

    parts = grouped_aggregate(
        li.map_batches(lambda df: df[["l_partkey"]],
                       batch_format="pandas"),
        ["l_partkey"], {"n": (None, "count")}).to_pandas()
    sources = sorted(parts["l_partkey"].astype("int64"))[:n_sources]
    edges = grouped_apply(li, ["l_orderkey"], pairs_block)
    lv = multi_bfs_levels(edges, sources, src="a", dst="b",
                          max_rounds=8)
    lv = lv[lv["level"] > 0]
    g = lv.assign(term=(840 // lv["level"]).astype("int64")) \
        .groupby("source", sort=False) \
        .agg(n_reached=("node", "size"), h840=("term", "sum")) \
        .reindex(sources, fill_value=0).reset_index()
    g["harmonic"] = _round_half_away(
        g["h840"].to_numpy(np.float64) / 840.0, 6)
    return pd.DataFrame({"src": np.asarray(sources, dtype=np.int64),
                         "n_reached": g["n_reached"].astype("int64"),
                         "h840": g["h840"].astype("int64"),
                         "harmonic": g["harmonic"].astype("float64")})


def q_part_wl_colors(sf_dir: str, *, rounds: int = 2):
    """1-WL color refinement (Weisfeiler-Lehman '68 — the graph
    fingerprint GNN expressivity is measured against) over the part
    co-purchase graph: round-0 color = distinct-neighbor degree,
    round r color = md5(own ‖ '|' ‖ comma-joined SORTED neighbor
    colors). Per round: ONE co-location of the symmetric edge table
    by destination (``grouped_apply``), neighbor colors attached from
    the broadcast node→color table (node-vocabulary-bounded — the
    same contract as the HITS/PageRank vectors), new colors collected
    driver-side to refresh the broadcast. Color strings are pure
    ASCII (digits / md5 hex) so Python ``sorted`` = DuckDB binary
    ``ORDER BY`` and the digests match bit-for-bit. Output: the
    color-class histogram after ``rounds`` refinements."""
    import hashlib

    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    li = read_parquet_sized(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey"])

    def pairs_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"u": pd.Series(dtype="int64"),
                                 "v": pd.Series(dtype="int64")})
        d = df.drop_duplicates(["l_orderkey", "l_partkey"])
        m = d.merge(d, on="l_orderkey")
        m = m[m["l_partkey_x"] != m["l_partkey_y"]]
        return pd.DataFrame({"u": m["l_partkey_x"].to_numpy(),
                             "v": m["l_partkey_y"].to_numpy()})

    # symmetric directed edges; (u,v) dupes across orders removed
    # inside each u's co-located block (block-local dedup IS global
    # dedup — all rows of a u land in one block)
    # materialized once: three co-location passes (degree + 2 rounds)
    # consume it; lazy re-execution would re-read and re-shuffle
    sym = grouped_apply(li, ["l_orderkey"], pairs_block).materialize()

    def deg_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"u": pd.Series(dtype="int64"),
                                 "c": pd.Series(dtype="object")})
        d = df.drop_duplicates(["u", "v"]).groupby("u", sort=False) \
            .size().reset_index(name="n")
        return pd.DataFrame({"u": d["u"].to_numpy(),
                             "c": d["n"].astype(str).to_numpy()})

    colors = grouped_apply(sym, ["u"], deg_block).to_pandas()
    cmap = dict(zip(colors["u"].astype("int64"),
                    colors["c"].astype(str)))

    for _ in range(rounds):
        cur = cmap

        def refine_block(df: pd.DataFrame,
                         _cm=cur) -> pd.DataFrame:
            if df.empty:
                return pd.DataFrame({"u": pd.Series(dtype="int64"),
                                     "c": pd.Series(dtype="object")})
            d = df.drop_duplicates(["u", "v"]).copy()
            d["cv"] = d["v"].map(_cm)
            rows = []
            for u, grp in d.groupby("u", sort=False):
                joined = ",".join(sorted(grp["cv"].tolist()))
                rows.append((int(u), hashlib.md5(
                    (_cm[int(u)] + "|" + joined).encode()
                ).hexdigest()))
            return pd.DataFrame(rows, columns=["u", "c"])

        colors = grouped_apply(sym, ["u"], refine_block).to_pandas()
        cmap = dict(zip(colors["u"].astype("int64"),
                        colors["c"].astype(str)))

    hist = colors.groupby("c", sort=False).size() \
        .reset_index(name="n_nodes")
    hist.columns = ["color", "n_nodes"]
    hist["n_nodes"] = hist["n_nodes"].astype("int64")
    return hist.sort_values("color").reset_index(drop=True)


def q_supplier_adamic(sf_dir: str):
    """Adamic-Adar link prediction over the supplier–part bipartite
    graph (``ops/graph.adamic_adar``): top-50 supplier pairs by
    Σ 1/ln(deg(part)) over shared parts — the hub-discounted
    companion of ``q_supplier_jaccard`` on the same incidence. Wedge
    weights are computed inside the part-co-located block (degree =
    local group size), so no degree join is shipped; ranking is
    round-before-rank on the 6-dp score."""
    from jerex_ray.ops.graph import adamic_adar
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/lineitem.parquet",
                            columns=["l_suppkey", "l_partkey"])
    out = adamic_adar(ds, left_col="l_suppkey",
                      right_col="l_partkey", top_k=50)
    return out


def q_part_diameter(sf_dir: str):
    """Diameter lower bound of the co-purchase graph by the classic
    double sweep (Magnien-Latapy-Habib '09): BFS from the smallest
    part, hop to the farthest node (tie → smallest id), BFS again —
    the second eccentricity bounds the diameter from below and is
    exact on trees/many real graphs. Two ``bfs_levels`` grid passes;
    every reported quantity is an integer, so the oracle (two chained
    recursive CTEs) matches bit-for-bit. Levels capped at 16 on both
    engines."""
    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply
    from jerex_ray.ops.graph import bfs_levels
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    li = read_parquet_sized(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey"])

    def pairs_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"a": pd.Series(dtype="int64"),
                                 "b": pd.Series(dtype="int64")})
        d = df.drop_duplicates(["l_orderkey", "l_partkey"])
        m = d.merge(d, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        return pd.DataFrame({"a": m["l_partkey_x"].to_numpy(),
                             "b": m["l_partkey_y"].to_numpy()})

    parts = grouped_aggregate(
        li.map_batches(lambda df: df[["l_partkey"]],
                       batch_format="pandas"),
        ["l_partkey"], {"n": (None, "count")}).to_pandas()
    seed = int(parts["l_partkey"].min())
    edges = grouped_apply(li, ["l_orderkey"], pairs_block).materialize()
    l1 = bfs_levels(edges, seed, src="a", dst="b", max_rounds=16)
    far = l1.sort_values(["level", "node"],
                         ascending=[False, True]).iloc[0]
    l2 = bfs_levels(edges, int(far["node"]), src="a", dst="b",
                    max_rounds=16)
    return pd.DataFrame({
        "seed": [np.int64(seed)],
        "ecc_seed": [np.int64(l1["level"].max())],
        "far_node": [np.int64(far["node"])],
        "diameter_lb": [np.int64(l2["level"].max())],
        "n_reached": [np.int64(len(l2))]})


_FD_SPECS = [
    ("customer", "c_custkey", "c_nationkey"),
    ("customer", "c_nationkey", "c_mktsegment"),
    ("orders", "o_orderkey", "o_custkey"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("nation", "n_nationkey", "n_regionkey"),
]


def q_fd_audit(sf_dir: str):
    """Functional-dependency audit (the profiling step schema
    -inference and normalization tools run): for each candidate
    det→dep column pair, A→B holds iff no A value maps to two
    distinct B values. Per pair: one combiner pass to distinct
    (det, dep) rows, one to per-det distinct-dep counts, then
    block-partial (n_keys, n_violating) scalars — nothing
    key-vocabulary-sized reaches the driver beyond the per-block
    partials. Integer-exact on both engines."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    rows = []
    for tbl, det, dep in _FD_SPECS:
        ds = read_parquet_sized(f"{sf_dir}/{tbl}.parquet",
                                columns=[det, dep])
        distinct = grouped_aggregate(ds, [det, dep],
                                     {"n": (None, "count")}) \
            .drop_columns(["n"])
        per_det = grouped_aggregate(distinct, [det],
                                    {"nd": (None, "count")})

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "k": [np.int64(len(df))],
                "v": [np.int64((df["nd"].to_numpy(np.int64) > 1)
                               .sum()) if len(df) else np.int64(0)]})

        p = per_det.map_batches(partial, batch_format="pandas",
                                batch_size=None).to_pandas()
        n_keys, n_viol = int(p["k"].sum()), int(p["v"].sum())
        rows.append((tbl, det, dep, np.int64(n_keys),
                     np.int64(n_viol),
                     np.int64(1 if n_viol == 0 else 0)))
    out = pd.DataFrame(rows, columns=["tbl", "det", "dep", "n_keys",
                                      "n_violating", "holds"])
    return out.sort_values(["tbl", "det", "dep"]).reset_index(drop=True)


def _kleinberg_burst_dp(k: np.ndarray):
    """Forward Viterbi of the 2-state Kleinberg burst automaton over
    an hourly count vector: returns (c0s, c1s, states) — per-step
    min costs ending in each state and the backtracked optimal state
    sequence. Float order matches the SQL recursion exactly (see
    ``q_events_burst_dp``). Brute-force-optimality pytest-gated."""
    import math
    span = len(k)
    total = int(k.sum())
    r0 = total / span
    r1 = 2.0 * r0
    gam = math.log(float(span))
    lr0, lr1 = math.log(r0), math.log(r1)
    c0s = np.empty(span, dtype=np.float64)
    c1s = np.empty(span, dtype=np.float64)
    back0 = np.zeros(span, dtype=np.int8)
    back1 = np.ones(span, dtype=np.int8)
    c0 = r0 - float(k[0]) * lr0
    c1 = gam + (r1 - float(k[0]) * lr1)
    c0s[0], c1s[0] = c0, c1
    for t in range(1, span):
        kt = float(k[t])
        back0[t] = 0 if c0 <= c1 else 1
        back1[t] = 1 if c1 <= c0 + gam else 0
        n0 = (r0 - kt * lr0) + min(c0, c1)
        n1 = (r1 - kt * lr1) + min(c1, c0 + gam)
        c0, c1 = n0, n1
        c0s[t], c1s[t] = c0, c1
    states = np.zeros(span, dtype=np.int8)
    st = 0 if c0 <= c1 else 1
    states[span - 1] = st
    for t in range(span - 1, 0, -1):
        st = back0[t] if st == 0 else back1[t]
        states[t - 1] = st
    return c0s, c1s, states


def _top_type_hour_grid(sf_dir: str):
    """(hmin, zero-filled hourly count vector) of the most frequent
    event type — the shared reduction both burst queries start from
    (one combiner pass; only the span-bounded grid reaches the
    driver)."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["ts", "event_type"])
    tot = grouped_aggregate(
        ds.map_batches(lambda df: pd.DataFrame(
            {"event_type": df["event_type"]}), batch_format="pandas"),
        ["event_type"], {"n": (None, "count")}).to_pandas()
    top = tot.sort_values(["n", "event_type"],
                          ascending=[False, True]).iloc[0]["event_type"]

    def hours(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"] == top]
        hr = (df["ts"].astype("datetime64[us]").astype("int64")
              // 3_600_000_000)
        return pd.DataFrame({"hour": hr.to_numpy(np.int64), "n": 1}) \
            .groupby("hour", sort=False).sum().reset_index()

    g = grouped_aggregate(
        ds.map_batches(hours, batch_format="pandas",
                       batch_size=65536),
        ["hour"], {"n": ("n", "sum")}).to_pandas()
    hmin, hmax = int(g["hour"].min()), int(g["hour"].max())
    k = np.zeros(hmax - hmin + 1, dtype=np.int64)
    k[g["hour"].to_numpy(np.int64) - hmin] = g["n"].to_numpy(np.int64)
    return hmin, k


def q_supplier_matching(sf_dir: str):
    """Maximal supplier–part matching by deterministic parallel
    greedy (``ops/graph.greedy_matching``): md5-64 edge priorities,
    per-round local-minima picks — provably identical to sequential
    greedy-by-priority, so the SQL oracle can replay the SAME rounds
    with windowed mins over a chained-CTE cascade. Maximality +
    greedy-prefix equality are pytest-gated."""
    from jerex_ray.ops.graph import greedy_matching
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/lineitem.parquet",
                            columns=["l_suppkey", "l_partkey"])
    out = greedy_matching(ds, left_col="l_suppkey",
                          right_col="l_partkey")
    return out[["l_suppkey", "l_partkey"]]


def q_events_burst_dp(sf_dir: str):
    """Kleinberg 2-state burst-detection DP (Kleinberg '02) over the
    top event type's hourly count series: state costs are Poisson
    negative log-likelihoods with the shared ln(k!) term dropped (it
    cancels in every state comparison), base rate r0 = mean hourly
    count, burst rate r1 = 2·r0, entering the burst state costs
    γ = ln(T). The corpus reduces to the span-bounded hourly grid
    through one combiner pass; the DP recursion itself is inherently
    sequential and runs on the driver over the zero-filled grid
    (span-bounded — the changepoint/Holt contract). Both engines
    execute the IDENTICAL float sequence (the recursion fixes the
    order), so the per-hour cost table matches bit-for-bit before
    the 6-dp output rounding. Backtracked burst intervals:
    ``q_events_burst_states`` (rows-only)."""
    hmin, k = _top_type_hour_grid(sf_dir)
    c0s, c1s, _ = _kleinberg_burst_dp(k)
    return pd.DataFrame({
        "hour": np.arange(hmin, hmin + len(k), dtype=np.int64),
        "k": k,
        "c0": _round_half_away(c0s, 6),
        "c1": _round_half_away(c1s, 6)})


def q_events_burst_states(sf_dir: str):
    """Backtracked Viterbi burst intervals from the
    ``q_events_burst_dp`` cost table: argmin final state, walk the
    stored decisions backwards, emit maximal burst (state-1) islands.
    Rows-only: the backward walk is not SQL-expressible on top of the
    already-oracled forward table without re-deriving it; DP
    optimality is pytest-gated by exhaustive path enumeration."""
    hmin, k = _top_type_hour_grid(sf_dir)
    _, _, states = _kleinberg_burst_dp(k)
    span = len(k)
    # maximal state-1 islands
    rows = []
    t = 0
    while t < span:
        if states[t] == 1:
            s = t
            while t + 1 < span and states[t + 1] == 1:
                t += 1
            rows.append((np.int64(hmin + s), np.int64(hmin + t),
                         np.int64(t - s + 1),
                         np.int64(int(k[s:t + 1].sum()))))
        t += 1
    return pd.DataFrame(rows, columns=["start_hour", "end_hour",
                                       "n_hours", "n_events"]) \
        .astype({"start_hour": "int64", "end_hour": "int64",
                 "n_hours": "int64", "n_events": "int64"})


def q_user_dbscan(sf_dir: str, *, eps: int = 2, min_pts: int = 3):
    """DBSCAN over per-user behavior points (x = event count,
    y = total spend in 10-dollar units — both exact integers):
    grid-bucketed ε-pair generation, core/border/noise roles, cluster
    = min core id of the density-connected component
    (``ops/dbscan.dbscan_2d``; deterministic min-rule border
    assignment). Integer coordinates + integer ε² predicate mean the
    all-pairs + recursive-closure SQL oracle matches exactly."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.ops.dbscan import dbscan_2d
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id", "value"])

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "n": np.int64(1),
            "cents": np.round(df["value"].to_numpy(np.float64)
                              * 100.0).astype(np.int64)})

    agg = grouped_aggregate(
        ds.map_batches(partials, batch_format="pandas"),
        ["user_id"], {"x": ("n", "sum"), "cents": ("cents", "sum")})

    def to_pts(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"id": pd.Series(dtype="int64"),
                                 "x": pd.Series(dtype="int64"),
                                 "y": pd.Series(dtype="int64")})
        return pd.DataFrame({
            "id": df["user_id"].to_numpy(np.int64),
            "x": df["x"].to_numpy(np.int64),
            "y": np.floor_divide(df["cents"].to_numpy(np.int64),
                                 10000)})

    pts = agg.map_batches(to_pts, batch_format="pandas")
    out = dbscan_2d(pts, id_col="id", x_col="x", y_col="y",
                    eps=eps, min_pts=min_pts)
    return out.rename(columns={"id": "user_id"})


def doc_ppr(sf_dir: str, *, damping: float = 0.85, iters: int = 5):
    """Personalized PageRank / random walk with restart (Jeh & Widom
    '03) from the smallest doc in the exact-Jaccard near-dup graph:
    all teleport mass on the seed, so scores measure similarity-graph
    proximity TO that doc (the "more like this" primitive). Same
    broadcast power iteration as ``doc_pagerank`` with a teleport
    VECTOR; oracled by a chained-CTE replay whose per-round LEFT JOIN
    keeps zero-rank nodes alive."""
    import ray

    from jerex_ray.ops.dedup import jaccard_edges_exact
    from jerex_ray.ops.graph import pagerank
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    edges = jaccard_edges_exact(ds, threshold=0.7).to_pandas()
    if "doc_a" not in edges.columns or edges.empty:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "pr": pd.Series(dtype="float64")})
    seed = int(min(edges["doc_a"].min(), edges["doc_b"].min()))
    pr = pagerank(ray.data.from_pandas(edges[["doc_a", "doc_b"]]),
                  damping=damping, iters=iters, personalize=seed)
    pr["pr"] = pr["pr"].round(6)
    pr = pr.rename(columns={"node": "doc_id"})
    pr["doc_id"] = pr["doc_id"].astype("int64")
    return pr.sort_values("doc_id").reset_index(drop=True)


def doc_kn_logppl(sf_dir: str):
    """Interpolated Kneser-Ney bigram quality score
    (``ops/textstats.kneser_ney_logppl``): per-doc mean −ln P with
    the continuation-count smoothing (D = 0.75) — the LM-quality
    signal one smoothing class above the add-k scorer
    ``doc_bigram_logppl``. One combiner pass fits; one broadcast
    pass scores; SQL-oracled with the identically-sequenced
    probability expression."""
    from jerex_ray.ops.textstats import kneser_ney_logppl
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    out = kneser_ney_logppl(ds).to_pandas()
    out["logppl"] = out["logppl"].round(6)
    out["n_bigrams"] = out["n_bigrams"].astype("int64")
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def emb_label_prop(sf_dir: str, *, k: int = 5, rounds: int = 2):
    """Semi-supervised label propagation (Zhu & Ghahramani '02) over
    the exact cosine k-NN graph: even vec_ids are labeled seeds, odd
    ones start unlabeled; each round every non-seed takes the
    majority label of its k nearest neighbors' CURRENT labels
    (unlabeled neighbors abstain; ties break to the smallest label;
    seeds are clamped). Deterministic, so fully SQL-oracled via the
    row_number kNN CTE plus one vote CTE per round. The graph comes
    from the oracle-proven broadcast-matmul top-k kernel; per-round
    votes are a grouped count over the edge Dataset with the
    node-bounded label table broadcast."""
    import ray

    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding", "label"])
    df = ds.to_pandas()
    edges = emb_knn_graph(sf_dir, k=k)
    edges_ds = ray.data.from_pandas(edges).materialize()
    ids = df["vec_id"].astype("int64")
    seed = {int(v): int(l) for v, l in zip(ids, df["label"])
            if int(v) % 2 == 0}
    labels = {int(v): seed.get(int(v), -1) for v in ids}

    for _ in range(rounds):
        cur = labels

        def vote_block(b: pd.DataFrame, _l=cur) -> pd.DataFrame:
            empty = pd.DataFrame({"src": pd.Series(dtype="int64"),
                                  "lab": pd.Series(dtype="int64")})
            if b.empty:
                return empty
            b = b.copy()
            b["lab"] = b["dst"].map(_l)
            b = b[b["lab"] != -1]
            if b.empty:
                return empty
            cnt = b.groupby(["src", "lab"], sort=False).size() \
                .reset_index(name="c")
            top = cnt.sort_values(["src", "c", "lab"],
                                  ascending=[True, False, True]) \
                .groupby("src", sort=False).head(1)
            return pd.DataFrame({
                "src": top["src"].to_numpy(np.int64),
                "lab": top["lab"].to_numpy(np.int64)})

        votes = grouped_apply(edges_ds, ["src"], vote_block) \
            .to_pandas()
        vmap = dict(zip(votes["src"].astype("int64"),
                        votes["lab"].astype("int64"))) \
            if not votes.empty and "src" in votes.columns else {}
        labels = {v: (seed[v] if v in seed else vmap.get(v, -1))
                  for v in labels}

    out = pd.DataFrame(sorted(labels.items()),
                       columns=["vec_id", "label_pred"])
    return out.astype({"vec_id": "int64", "label_pred": "int64"})


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


def q_part_betweenness(sf_dir: str, *, n_sources: int = 4,
                       max_depth: int = 6):
    """Depth-bounded Brandes betweenness centrality (Brandes '01)
    from the ``n_sources`` smallest parts of the repeat co-purchase
    graph (``ops/graph.betweenness_sampled``): one multi-source BFS
    grid pass for levels, σ forward and δ backward as per-level
    streaming passes over the edge Dataset with broadcast node
    tables. σ is integer-exact; δ's fixed-order ratio expressions
    let the unrolled chained-CTE oracle match to 6 dp."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.ops.graph import betweenness_sampled
    configure_data_context()
    edges = _repeat_copurchase_edges(sf_dir).materialize()
    nd = grouped_aggregate(
        edges.map_batches(
            lambda df: pd.DataFrame({"u": np.concatenate(
                [df["a"].to_numpy(np.int64),
                 df["b"].to_numpy(np.int64)])})
            if "a" in df.columns else pd.DataFrame(
                {"u": pd.Series(dtype="int64")}),
            batch_format="pandas"),
        ["u"], {"n": (None, "count")}).to_pandas()
    sources = sorted(int(u) for u in nd["u"])[:n_sources]
    out = betweenness_sampled(edges, sources, max_depth=max_depth)
    out["node"] = out["node"].astype("int64")
    return out


def q_part_ktruss(sf_dir: str, *, k: int = 3, min_cocount: int = 2):
    """k-truss cohesion core (Cohen '08) of the REPEAT co-purchase
    graph (parts sharing ≥ ``min_cocount`` orders — the thresholded
    graph where triangle structure is signal, not density noise):
    iterative support peeling on the BSP wedge-count dataflow
    (``ops/graph.ktruss``), emitting the surviving edges with their
    in-truss triangle support. Pure set arithmetic → the chained-CTE
    oracle replays the identical rounds."""
    import ray

    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply
    from jerex_ray.ops.graph import ktruss
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
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
    edges = cnt.map_batches(
        lambda df: df[df["n"] >= min_cocount][["a", "b"]]
        if "a" in df.columns else df, batch_format="pandas")
    out = ktruss(edges, k=k)
    out["a"] = out["a"].astype("int64")
    out["b"] = out["b"].astype("int64")
    return out


def q_part_sssp(sf_dir: str, *, oracle_depth: int = 24):
    """Weighted single-source shortest paths over the repeat
    co-purchase graph (synchronized Bellman-Ford relaxation,
    ``ops/graph.bellman_ford_sssp`` — the weighted sibling of the
    BFS/double-sweep family): edge weight = 1 + md5_64("a|b") % 9
    (deterministic and SQL-replayable — the ``md5_hash64`` contract),
    source = the smallest part id in the graph. Distances are exact
    integers, so there is no float accumulation-order hazard anywhere;
    the engine runs to the natural fixpoint and ASSERTS it converged
    within the oracle's fixed replay depth, which makes the
    chained-CTE relax-round oracle land on the identical monotone
    lattice fixpoint."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.ops.graph import bellman_ford_sssp
    from jerex_ray.util import md5_hash64_batch
    configure_data_context()
    edges = _repeat_copurchase_edges(sf_dir)

    def with_w(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "a" not in df.columns:
            return pd.DataFrame({"a": pd.Series(dtype="int64"),
                                 "b": pd.Series(dtype="int64"),
                                 "w": pd.Series(dtype="int64")})
        a = df["a"].to_numpy(np.int64)
        b = df["b"].to_numpy(np.int64)
        w = 1 + (md5_hash64_batch(
            [f"{x}|{y}" for x, y in zip(a, b)]) % 9).astype(np.int64)
        return pd.DataFrame({"a": a, "b": b, "w": w})

    wedges = edges.map_batches(with_w,
                               batch_format="pandas").materialize()
    nd = grouped_aggregate(
        wedges.map_batches(
            lambda df: pd.DataFrame({"u": np.concatenate(
                [df["a"].to_numpy(np.int64),
                 df["b"].to_numpy(np.int64)])})
            if "a" in df.columns else pd.DataFrame(
                {"u": pd.Series(dtype="int64")}),
            batch_format="pandas"),
        ["u"], {"n": (None, "count")}).to_pandas()
    if nd.empty or "u" not in nd.columns:
        return pd.DataFrame({"node": pd.Series(dtype="int64"),
                             "dist": pd.Series(dtype="int64")})
    source = int(nd["u"].min())
    out = bellman_ford_sssp(wedges, source, max_rounds=64)
    rounds = int(out["rounds"].iloc[0]) if len(out) else 0
    assert rounds <= oracle_depth, \
        f"fixpoint at round {rounds} > oracle depth {oracle_depth}"
    return out[["node", "dist"]].reset_index(drop=True)


def emb_map10(sf_dir: str, *, k: int = 10):
    """MAP@10 per label (mean average precision — the third classic
    retrieval eval next to ``emb_mrr`` / ``emb_ndcg``, over the SAME
    oracle-proven exact top-k kernel): every vector queries the
    corpus, self excluded, relevance = same label; AP@10 normalizes by
    min(R, 10) with R the query's relevant-count.

    Integer-exact signature: precision terms hit_idx/rk are scaled by
    LCM(1..10) = 2520 and the per-query normalization by 2520 again,
    so EVERY sum is integer (``ap_num`` lands bit-for-bit) and the
    single float divide per label happens after all accumulation —
    no float-ordering hazard anywhere, unlike a naive Σ P@i mean."""
    import pyarrow.parquet as _pq

    from jerex_ray.ops.ann import brute_force_topk
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    tbl = _pq.read_table(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding", "label"])
    qdf = tbl.to_pandas().sort_values("vec_id").reset_index(drop=True)
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    top = brute_force_topk(ds, np.stack(qdf["embedding"].to_numpy()),
                           k=k + 1)
    qid = qdf["vec_id"].to_numpy()
    labels = dict(zip(qdf["vec_id"], qdf["label"].astype(int)))
    lab_n = qdf["label"].astype(int).value_counts().to_dict()
    t = top.copy()
    t["qvec"] = qid[t["query_idx"].to_numpy()]
    t = t[t["vec_id"] != t["qvec"]]
    t["rk"] = t.groupby("qvec", sort=False).cumcount() + 1
    t = t[t["rk"] <= k]
    hits = t[t["vec_id"].map(labels).to_numpy()
             == t["qvec"].map(labels).to_numpy()].copy()
    hits["hit_idx"] = hits.groupby("qvec", sort=False).cumcount() + 1
    hits["term"] = (hits["hit_idx"].to_numpy(np.int64)
                    * (2520 // hits["rk"].to_numpy(np.int64)))
    sc = hits.groupby("qvec")["term"].sum()
    rows = []
    for v in qid:
        ql = labels[v]
        r = lab_n[ql] - 1
        if r <= 0:
            continue
        qsc = int(sc.get(v, 0)) * (2520 // min(r, k))
        rows.append((ql, qsc))
    per = pd.DataFrame(rows, columns=["label", "qsc"])
    g = per.groupby("label")["qsc"]
    total = g.sum().astype("int64")
    n_q = g.count().astype("int64")
    map10 = total.to_numpy(np.float64) / (2520.0 * 2520.0
                                          * n_q.to_numpy(np.float64))
    out = pd.DataFrame({
        "label": total.index.astype("int64"),
        "n_queries": n_q.to_numpy(np.int64),
        "ap_num": total.to_numpy(np.int64),
        "map10": np.copysign(np.floor(np.abs(map10) * 1e6 + 0.5),
                             map10) / 1e6})
    return out.sort_values("label").reset_index(drop=True)


def emb_hamming_topk(sf_dir: str):
    """Binary-quantization vector search (sign-bit signatures →
    Hamming shortlist → exact cosine rerank, the 1-bit compression
    modern vector stores run before rerank;
    ``ops/ann.binary_hamming_topk``): top-5 per query from a
    Hamming-top-50 shortlist. The shortlist cut is integer-exact with
    (hamming, vec_id) ties, so the SQL oracle replays the identical
    candidate set; the rerank inherits ``ann_topk``'s established
    cosine-order parity. Output carries the integer hamming distance;
    the same fixed query set (vec_id < 3) as the ANN family."""
    from jerex_ray.ops.ann import binary_hamming_topk
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    queries, qids = _query_vectors(sf_dir)
    out = binary_hamming_topk(ds, queries, k=5, shortlist=50)
    out["query_idx"] = qids[out["query_idx"].to_numpy()]
    return out[["query_idx", "vec_id", "hamming"]].astype("int64") \
        .sort_values(["query_idx", "vec_id"]).reset_index(drop=True)


def q_orders_bloom_semijoin(sf_dir: str):
    """Bloom-filter semi-join pushdown audit (Bloom '70; Mackert &
    Lohman '86 — the runtime filter every distributed engine pushes
    below a join): how well does a 65,536-bit / 3-hash bloom built
    over URGENT orders' keys prune the lineitem probe side, versus the
    exact semi-join? ``ops/bloomjoin.bloom_semijoin_audit``: the only
    cross-cluster state is the m-bit bitmap (bit positions reduce
    through the combiner, vocabulary bounded by m), the probe streams
    once against the broadcast bitmap, and the exact counts come from
    ONE hash co-location of per-key partials — never a pair join.
    md5-derived bit positions make the SQL oracle replay the identical
    bitmap and per-key verdicts; every output is integer-exact except
    the single fp_rate divide."""
    import pyarrow.compute as _pc

    from jerex_ray.ops.bloomjoin import bloom_semijoin_audit
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    keys = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey"],
        filter=_pc.field("o_orderpriority") == "1-URGENT")
    probe = read_parquet_sized(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey"])
    return bloom_semijoin_audit(keys, probe, key_col="o_orderkey",
                                probe_col="l_orderkey")


def q_lineitem_auc(sf_dir: str):
    """Exact ROC-AUC of "quantity predicts a return" — does
    l_quantity separate returned (l_returnflag = 'R') from kept line
    items? Mann-Whitney rank-sum with midrank ties
    (``ops/mleval.auc_mann_whitney``): ONE combiner pass reduces the
    lineitem scan to ≤50 per-quantity (n_pos, n_neg) counts, the rank-sum
    closes on the driver carrying 2·U so everything before the single
    final divide is INTEGER-exact — the SQL window oracle lands on the
    identical bits."""
    from jerex_ray.ops.mleval import auc_mann_whitney
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/lineitem.parquet",
                            columns=["l_quantity", "l_returnflag"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"s": pd.Series(dtype="int64"),
                                 "pos": pd.Series(dtype="int64")})
        return pd.DataFrame({
            "s": np.floor(df["l_quantity"].to_numpy(np.float64)
                          + 0.5).astype(np.int64),
            "pos": (df["l_returnflag"].to_numpy() == "R")
            .astype(np.int64)})

    out = auc_mann_whitney(ds.map_batches(prep, batch_format="pandas"))
    out["auc"] = out["auc"].round(6)
    for c in ("n_pos", "n_neg", "u2"):
        out[c] = out[c].astype("int64")
    return out


def q_orders_benford(sf_dir: str):
    """Benford first-significant-digit audit of order totals (Newcomb
    1881 / Benford '38 — the classic fraud/synthetic-data screen):
    leading digit of the integer cents of o_totalprice vs the Benford
    expectation n·log10(1 + 1/d), with the per-digit chi-square term.
    ONE combiner pass to the 9-row digit histogram; every output float
    is an independent fixed-order expression (no multi-term float
    accumulation), so the SQL oracle matches bit-for-bit before the
    shared 6-decimal rounding."""
    import math

    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/orders.parquet",
                            columns=["o_totalprice"])

    def digits(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"digit": pd.Series(dtype="int64")})
        # mirror DuckDB CAST(x*100 AS BIGINT): half-away (prices > 0)
        cents = np.floor(df["o_totalprice"].to_numpy(np.float64)
                         * 100.0 + 0.5).astype(np.int64)
        first = pd.Series(cents).astype(str).str[0].astype(np.int64)
        return pd.DataFrame({"digit": first})

    g = grouped_aggregate(ds.map_batches(digits, batch_format="pandas"),
                          ["digit"], {"n_obs": (None, "count")}) \
        .to_pandas()
    if g.empty or "digit" not in g.columns:
        return pd.DataFrame({"digit": pd.Series(dtype="int64"),
                             "n_obs": pd.Series(dtype="int64"),
                             "expected": pd.Series(dtype="float64"),
                             "chi2_term": pd.Series(dtype="float64")})
    g = g.sort_values("digit").reset_index(drop=True)
    tot = int(g["n_obs"].sum())
    exp_n = np.array([math.log10(1.0 + 1.0 / int(d)) * tot
                      for d in g["digit"]])
    obs = g["n_obs"].to_numpy(np.float64)
    term = (obs - exp_n) * (obs - exp_n) / exp_n
    return pd.DataFrame({"digit": g["digit"].astype("int64"),
                         "n_obs": g["n_obs"].astype("int64"),
                         "expected": np.round(exp_n, 6),
                         "chi2_term": np.round(term, 6)})


def q_events_kfold_cv(sf_dir: str, *, folds: int = 5):
    """k-fold cross-validated OLS of event value against time (the
    model-eval loop every feature pipeline runs): deterministic md5
    fold assignment, and BOTH the per-fold fit and its held-out MSE
    close over ONE grouped-moments pass — train moments are
    total − fold (the leave-fold-out identity), test MSE expands to
    the same six sums, so no second corpus scan exists. Identical
    float sequencing to the SQL oracle; 6-dp rounding."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "ts", "value"])
    epoch0 = pd.Timestamp("1995-01-01")

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        from jerex_ray.util import md5_hash64_batch
        fold = (md5_hash64_batch(
            df["event_id"].astype(str).tolist()) % folds) \
            .astype(np.int64)
        x = ((df["ts"] - epoch0) / pd.Timedelta(days=1)) \
            .to_numpy(np.float64)
        y = df["value"].to_numpy(np.float64)
        g = pd.DataFrame({"fold": fold, "n": 1, "sx": x, "sy": y,
                          "sxx": x * x, "sxy": x * y, "syy": y * y})
        return g.groupby("fold", sort=False, as_index=False).sum()

    m = grouped_aggregate(
        ds.map_batches(moments, batch_format="pandas"),
        ["fold"],
        {k: (k, "sum") for k in ("n", "sx", "sy", "sxx", "sxy",
                                 "syy")}).to_pandas() \
        .sort_values("fold").reset_index(drop=True)
    tn = float(m["n"].sum())
    tsx, tsy = float(m["sx"].sum()), float(m["sy"].sum())
    tsxx = float(m["sxx"].sum())
    tsxy = float(m["sxy"].sum())
    n_tr = tn - m["n"].to_numpy(np.float64)
    sx_tr = tsx - m["sx"].to_numpy(np.float64)
    sy_tr = tsy - m["sy"].to_numpy(np.float64)
    sxx_tr = tsxx - m["sxx"].to_numpy(np.float64)
    sxy_tr = tsxy - m["sxy"].to_numpy(np.float64)
    b = (sxy_tr - sx_tr * sy_tr / n_tr) \
        / (sxx_tr - sx_tr * sx_tr / n_tr)
    a = sy_tr / n_tr - b * sx_tr / n_tr
    nf = m["n"].to_numpy(np.float64)
    mse = (m["syy"].to_numpy(np.float64)
           - 2 * a * m["sy"].to_numpy(np.float64)
           - 2 * b * m["sxy"].to_numpy(np.float64)
           + nf * a * a
           + 2 * a * b * m["sx"].to_numpy(np.float64)
           + b * b * m["sxx"].to_numpy(np.float64)) / nf
    return pd.DataFrame({
        "fold": m["fold"].astype("int64"),
        "n_test": m["n"].astype("int64"),
        "slope": _round_half_away(b, 6),
        "intercept": _round_half_away(a, 6),
        "mse": _round_half_away(mse, 6)})


def doc_dirichlet_ql(sf_dir: str):
    """Dirichlet-smoothed query-likelihood scores of every doc
    against the three fixed BM25 queries (Zhai & Lafferty '01,
    ``ops/bm25.dirichlet_ql_scores``, μ=100) — the language-modeling
    retrieval twin of ``doc_bm25_scores`` over the identical query
    set; every doc scores against every query because the collection
    model never zeroes. 6-dp rounding absorbs per-doc term-sum order
    differences."""
    from jerex_ray.ops.bm25 import dirichlet_ql_scores
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    out = dirichlet_ql_scores(ds, _BM25_QUERIES, mu=100.0).to_pandas()
    out["score"] = out["score"].round(6)
    out["query_idx"] = out["query_idx"].astype("int64")
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values(["query_idx", "doc_id"]) \
        .reset_index(drop=True)


def q_customer_chash(sf_dir: str, *, vnodes: int = 16):
    """Consistent-hashing placement audit (Karger '97): customers
    hash onto an 8-server × 16-vnode md5 ring, then server s8 joins —
    the classic elasticity claim is that only ~1/9 of keys move, all
    TO the new server. One broadcast of the two (tiny) rings, one
    streaming assignment pass, combiner counts per (before, after)
    server pair; reports per-server key counts before/after and the
    moved-out counts. Pure md5/integer arithmetic, bit-replayed by
    the SQL oracle's correlated successor lookup."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.ops.layout import consistent_hash_ring, ring_assign
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/customer.parquet",
                            columns=["c_custkey"])
    r8 = consistent_hash_ring([f"s{i}" for i in range(8)],
                              vnodes=vnodes)
    r9 = consistent_hash_ring([f"s{i}" for i in range(9)],
                              vnodes=vnodes)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        from jerex_ray.util import md5_hash64_batch
        h = md5_hash64_batch(df["c_custkey"].astype(str).tolist())
        s8 = ring_assign(h, *r8)
        s9 = ring_assign(h, *r9)
        g = pd.DataFrame({"s8": s8, "s9": s9, "n": 1}) \
            .groupby(["s8", "s9"], sort=False).sum().reset_index()
        return g

    j = grouped_aggregate(
        ds.map_batches(assign, batch_format="pandas",
                       batch_size=65536),
        ["s8", "s9"], {"n": ("n", "sum")}).to_pandas()
    servers = [f"s{i}" for i in range(9)]
    before = j.groupby("s8")["n"].sum()
    after = j.groupby("s9")["n"].sum()
    moved = j[j["s8"] != j["s9"]].groupby("s8")["n"].sum()
    return pd.DataFrame({
        "server": servers,
        "n_before": [int(before.get(s, 0)) for s in servers],
        "n_after": [int(after.get(s, 0)) for s in servers],
        "moved_out": [int(moved.get(s, 0)) for s in servers]}) \
        .astype({"n_before": "int64", "n_after": "int64",
                 "moved_out": "int64"})


_ENC_SPECS = [
    ("lineitem", "l_returnflag", "l_orderkey", "l_linenumber"),
    ("lineitem", "l_linestatus", "l_orderkey", "l_linenumber"),
    ("orders", "o_orderpriority", "o_custkey", "o_orderkey"),
    ("customer", "c_mktsegment", "c_nationkey", "c_custkey"),
]


def q_encoding_audit(sf_dir: str):
    """Storage-encoding advisor (the Parquet/ORC encoding-chooser
    audit): for each candidate string column, exact plain-encoding
    bytes, dictionary-encoding bytes (distinct value bytes +
    ⌈n·bitwidth/8⌉, bitwidth = bit_length(d−1)), and the RLE run
    count under the column's natural within-group order (runs reset
    at group boundaries — the row-group model; the value itself is
    the final sort key so order-key ties can't make the run count
    ambiguous). One co-location pass
    per spec for runs + byte partials, one combiner pass for the
    dictionary; all integers, bit-exact vs SQL."""
    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    rows = []
    for tbl, col, grp, ordc in _ENC_SPECS:
        ds = read_parquet_sized(f"{sf_dir}/{tbl}.parquet",
                                columns=[col, grp, ordc])

        def run_block(df: pd.DataFrame, _c=col, _g=grp,
                      _o=ordc) -> pd.DataFrame:
            if df.empty:
                return pd.DataFrame({"n": pd.Series(dtype="int64"),
                                     "runs": pd.Series(dtype="int64"),
                                     "pb": pd.Series(dtype="int64")})
            d = df.sort_values([_g, _o, _c])
            v = d[_c].astype(str)
            new_grp = d[_g].ne(d[_g].shift())
            changed = v.ne(v.shift())
            runs = int((new_grp | changed).sum())
            return pd.DataFrame({
                "n": [np.int64(len(d))],
                "runs": [np.int64(runs)],
                "pb": [np.int64(v.str.len().sum())]})

        part = grouped_apply(ds, [grp], run_block).to_pandas()
        n = int(part["n"].sum())
        runs = int(part["runs"].sum())
        plain = int(part["pb"].sum())
        dv = grouped_aggregate(
            ds.map_batches(lambda df, _c=col: pd.DataFrame(
                {"v": df[_c].astype(str)}), batch_format="pandas"),
            ["v"], {"n": (None, "count")}).to_pandas()
        d = len(dv)
        dict_val_bytes = int(dv["v"].str.len().sum())
        bw = (d - 1).bit_length() if d > 1 else 0
        dict_bytes = dict_val_bytes + (n * bw + 7) // 8
        rows.append((tbl, col, np.int64(n), np.int64(d),
                     np.int64(runs), np.int64(plain),
                     np.int64(dict_bytes)))
    return pd.DataFrame(rows, columns=[
        "tbl", "col", "n", "n_distinct", "n_runs", "plain_bytes",
        "dict_bytes"]).sort_values(["tbl", "col"]) \
        .reset_index(drop=True)


def q_join_cardinality(sf_dir: str):
    """Join-cardinality estimation audit (the System R uniformity
    formula |A⋈B| ≈ |A|·|B|/max(d_A, d_B) vs ground truth): the
    ACTUAL size comes WITHOUT materializing any join — per-key counts
    co-locate once and Σ c_A(k)·c_B(k) reduces through the combiner.
    Reports estimate, actual, and the q-error max(est/act, act/est)
    for three classic equi-joins."""
    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    specs = [("orders", "o_orderkey", "lineitem", "l_orderkey"),
             ("customer", "c_custkey", "orders", "o_custkey"),
             ("part", "p_partkey", "lineitem", "l_partkey")]
    rows = []
    for ta, ka, tb, kb in specs:
        da = read_parquet_sized(f"{sf_dir}/{ta}.parquet",
                                columns=[ka])
        db = read_parquet_sized(f"{sf_dir}/{tb}.parquet",
                                columns=[kb])
        ca = grouped_aggregate(
            da.map_batches(lambda df, _k=ka: pd.DataFrame(
                {"k": df[_k].to_numpy(np.int64)}),
                batch_format="pandas"),
            ["k"], {"n": (None, "count")})
        cb = grouped_aggregate(
            db.map_batches(lambda df, _k=kb: pd.DataFrame(
                {"k": df[_k].to_numpy(np.int64)}),
                batch_format="pandas"),
            ["k"], {"n": (None, "count")})

        def tag(side):
            def f(df: pd.DataFrame) -> pd.DataFrame:
                if df.empty or "k" not in df.columns:
                    return pd.DataFrame(
                        {"k": pd.Series(dtype="int64"),
                         "side": pd.Series(dtype="object"),
                         "n": pd.Series(dtype="int64")})
                return pd.DataFrame({"k": df["k"].to_numpy(np.int64),
                                     "side": side,
                                     "n": df["n"].to_numpy(np.int64)})
            return f

        both = ca.map_batches(tag("a"), batch_format="pandas").union(
            cb.map_batches(tag("b"), batch_format="pandas"))

        def prod_block(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty or "k" not in df.columns:
                return pd.DataFrame({"s": pd.Series(dtype="int64")})
            p = df.pivot_table(index="k", columns="side", values="n",
                               aggfunc="sum", fill_value=0)
            if "a" not in p.columns or "b" not in p.columns:
                return pd.DataFrame({"s": [np.int64(0)]})
            return pd.DataFrame({"s": [np.int64(
                int((p["a"].to_numpy(np.int64)
                     * p["b"].to_numpy(np.int64)).sum()))]})

        actual = int(grouped_apply(both, ["k"], prod_block)
                     .to_pandas()["s"].sum())
        stats_a = ca.map_batches(
            lambda df: pd.DataFrame({"c": [int(df["n"].sum())],
                                     "d": [len(df)]}),
            batch_format="pandas", batch_size=None).to_pandas().sum()
        stats_b = cb.map_batches(
            lambda df: pd.DataFrame({"c": [int(df["n"].sum())],
                                     "d": [len(df)]}),
            batch_format="pandas", batch_size=None).to_pandas().sum()
        na, daa = int(stats_a["c"]), int(stats_a["d"])
        nb, dbb = int(stats_b["c"]), int(stats_b["d"])
        est = na * nb / max(daa, dbb)
        qerr = max(est / actual, actual / est) if actual and est \
            else 0.0
        rows.append((ta, tb, np.int64(na), np.int64(nb),
                     float(_round_half_away(est, 6)),
                     np.int64(actual),
                     float(_round_half_away(qerr, 6))))
    return pd.DataFrame(rows, columns=[
        "tbl_a", "tbl_b", "n_a", "n_b", "est", "actual", "q_error"]) \
        .sort_values(["tbl_a", "tbl_b"]).reset_index(drop=True)


def q_events_seasonal_naive(sf_dir: str, *, season: int = 168):
    """Seasonal-naive forecast backtest with MASE (Hyndman &
    Koehler '06) over the top event type's hourly series: forecast
    k(t) = k(t−168) (same hour last week), error scaled by the naive
    random-walk error k(t−1) — the standard "is your forecaster
    better than last week's value" gate. All sums are exact integers
    over the zero-filled dense grid (one combiner pass); only the
    final MASE ratio divides floats."""
    hmin, k = _top_type_hour_grid(sf_dir)
    span = len(k)
    sae_s = int(np.abs(k[season:] - k[:-season]).sum()) \
        if span > season else 0
    n_s = max(span - season, 0)
    sae_1 = int(np.abs(k[1:] - k[:-1]).sum()) if span > 1 else 0
    n_1 = max(span - 1, 0)
    mase = (sae_s / n_s) / (sae_1 / n_1) if n_s and sae_1 else 0.0
    return pd.DataFrame({
        "n_eval": [np.int64(n_s)],
        "sae_seasonal": [np.int64(sae_s)],
        "sae_naive1": [np.int64(sae_1)],
        "mase": [_round_half_away(np.float64(mase), 6)]})


def q_events_enrichment(sf_dir: str, *, threshold: float = 50.0):
    """Fisher-exact enrichment of high-value events (value ≥ 50) per
    event type — the GO-enrichment / over-representation test shape:
    right-tail hypergeometric p = Σᵢ exp(lnC(K,i)+lnC(N−K,n−i)
    −lnC(N,n)) via lgamma (bit-identical glibc on both engines), plus
    the ratio (k/n)/(K/N). One combiner pass to per-type (n, k)
    counts; the tail sums run over type-bounded grids."""
    import math

    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_type", "value"])

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        hi = (df["value"].to_numpy(np.float64)
              >= threshold).astype(np.int64)
        return pd.DataFrame({"event_type": df["event_type"]
                             .to_numpy(), "n": np.int64(1), "k": hi}) \
            .groupby("event_type", sort=False, as_index=False).sum()

    m = grouped_aggregate(
        ds.map_batches(partials, batch_format="pandas"),
        ["event_type"], {"n": ("n", "sum"), "k": ("k", "sum")}) \
        .to_pandas().sort_values("event_type").reset_index(drop=True)
    N = int(m["n"].sum())
    K = int(m["k"].sum())

    def lnC(a, b):
        return (math.lgamma(a + 1.0) - math.lgamma(b + 1.0)
                - math.lgamma(a - b + 1.0))

    rows = []
    for r in m.itertuples(index=False):
        n, k = int(r.n), int(r.k)
        hi = min(K, n)
        p = 0.0
        for i in range(k, hi + 1):
            p = p + math.exp(lnC(K, i) + lnC(N - K, n - i)
                             - lnC(N, n))
        ratio = (k / n) / (K / N)
        rows.append((r.event_type, np.int64(n), np.int64(k),
                     float(_round_half_away(ratio, 6)),
                     float(_round_half_away(p, 6))))
    return pd.DataFrame(rows, columns=["event_type", "n", "k",
                                       "ratio", "p_value"])


def doc_front_coding(sf_dir: str):
    """Front-coding dictionary audit (Witten-Moffat-Bell: store each
    sorted word as (lcp with predecessor, suffix)) over the corpus
    vocabulary — the term-dictionary compression every inverted index
    uses. One combiner pass to the distinct-word table (vocabulary-
    bounded driver close, the BPE/vocab contract), sorted ascending,
    suffix bytes = len − lcp(prev). Integer-exact."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["text"])

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        words = df["text"].fillna("").str.lower().str.split()
        flat = [w for ws in words.to_numpy() if ws for w in ws]
        if not flat:
            return pd.DataFrame({"w": pd.Series(dtype="object")})
        return pd.DataFrame({"w": pd.unique(np.asarray(flat,
                                                       dtype=object))})

    vocab = grouped_aggregate(
        ds.map_batches(explode, batch_format="pandas",
                       batch_size=8192),
        ["w"], {"n": (None, "count")}).to_pandas()
    ws = sorted(str(w) for w in vocab["w"])
    raw = sum(len(w) for w in ws)
    front = 0
    prev = ""
    for w in ws:
        l = 0
        for a, b in zip(prev, w):
            if a != b:
                break
            l += 1
        front += len(w) - l
        prev = w
    return pd.DataFrame({
        "n_words": [np.int64(len(ws))],
        "raw_bytes": [np.int64(raw)],
        "front_bytes": [np.int64(front)]})


def q_events_ams_f2(sf_dir: str):
    """AMS second-frequency-moment sketch of the user-id stream
    (Alon–Matias–Szegedy '96, the tug-of-war sketch): 16 ±1-sign
    estimators from independent md5 bits, each Z_j = Σ rows sign_j —
    the classic self-join-size / skew estimator a planner consults
    before committing a join. Median-of-means over 4 groups of 4; the
    only divides are by 4 and 8 (exact binary), so the estimate is the
    identical double in SQL. Exact F2 = Σ_u c_u² from a user-vocab
    bounded combiner pass for the audit column. Cross-cluster state:
    16 integers (plus the user-count table for the exact leg)."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    from jerex_ray.util import md5_hash64_batch
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id"])

    def signs_partial(df: pd.DataFrame) -> pd.DataFrame:
        h = md5_hash64_batch(
            ("ams|" + df["user_id"].astype("int64").astype(str))
            .to_numpy())
        js = np.arange(16, dtype=np.uint64)
        # (B, 16) sign matrix: +1 where bit j of md5 is set, else −1
        bits = ((h[:, None] >> js[None, :]) & np.uint64(1)) \
            .astype(np.int64)
        z = (2 * bits - 1).sum(axis=0)
        return pd.DataFrame({"j": np.arange(16, dtype=np.int64),
                             "z": z, "n": np.int64(len(df))})

    zt = grouped_aggregate(
        ds.map_batches(signs_partial, batch_format="pandas",
                       batch_size=65536),
        ["j"], {"z": ("z", "sum"), "n": ("n", "sum")},
        result_hint="small").to_pandas().sort_values("j")
    z = zt["z"].to_numpy(np.int64)
    n_rows = int(zt["n"].iloc[0])       # same total replicated per j
    # group sums of squares (python ints: overflow-proof)
    s4 = [sum(int(z[4 * g + i]) ** 2 for i in range(4))
          for g in range(4)]
    s4s = sorted(s4)
    est = float(s4s[1] + s4s[2]) / 8.0    # median of means, /4 then /2
    counts = grouped_aggregate(
        ds, ["user_id"], {"c": (None, "count")},
        result_hint="small").to_pandas()
    exact = sum(int(c) ** 2 for c in counts["c"])
    return pd.DataFrame({
        "n_rows": [np.int64(n_rows)],
        "exact_f2": [np.int64(exact)],
        "est_f2": [est],
        "rel_err": [round(abs(est - exact) / exact, 6)]})


def q_events_kmv_overlap(sf_dir: str, *, k: int = 64):
    """KMV set-operation estimates between the top-3 event types'
    user sets (Beyer et al. '07 §4, the mergeable-distinct-sketch
    algebra): per type keep the bottom-k distinct md5-64 user hashes;
    per pair the union sketch is the bottom-k of the merged hash set,
    K∩ counts union-sketch members present in BOTH sides, jaccard_est
    = K∩/k′ and union_est = (k′−1)/frac(h_k′). Exact jaccard rides a
    per-user type-bitmask pass (types are vocabulary-bounded, so the
    bitmask histogram is ≤2^#types rows). Only #types·k hashes and the
    bitmask histogram reach the driver. Type pick: count DESC, name
    ASC; pair order by (rank_a, rank_b)."""
    from jerex_ray.functions.aggregate import grouped_aggregate, \
        grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    from jerex_ray.util import md5_hash64_batch
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_type", "user_id"])

    tc = grouped_aggregate(ds, ["event_type"],
                           {"c": (None, "count")},
                           result_hint="small").to_pandas()
    tc = tc.sort_values(["c", "event_type"],
                        ascending=[False, True]).reset_index(drop=True)
    top = list(tc["event_type"].head(3))

    def local_bottom(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for t, g in df.groupby("event_type", sort=False):
            if t not in top:
                continue
            h = np.unique(md5_hash64_batch(
                g["user_id"].astype("int64").astype(str).to_numpy()))
            out.append(pd.DataFrame({"event_type": t, "h": h[:k]}))
        if not out:
            return pd.DataFrame({"event_type": pd.Series(dtype=object),
                                 "h": pd.Series(dtype="uint64")})
        return pd.concat(out, ignore_index=True)

    def merge_bottom(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for t, g in df.groupby("event_type", sort=False):
            h = np.unique(g["h"].to_numpy(np.uint64))[:k]
            rows.append(pd.DataFrame({"event_type": t, "h": h}))
        return pd.concat(rows, ignore_index=True)

    sk = grouped_apply(
        ds.map_batches(local_bottom, batch_format="pandas",
                       batch_size=65536),
        [], merge_bottom, single_block=True).to_pandas()
    sketches = {t: set(g["h"].tolist())
                for t, g in sk.groupby("event_type")}

    # exact per-pair jaccard via the per-user membership bitmask
    t_index = {t: i for i, t in enumerate(top)}

    def _or_by_user(u: np.ndarray, m: np.ndarray) -> tuple:
        order = np.argsort(u, kind="stable")
        u, m = u[order], m[order]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        return u[starts], np.bitwise_or.reduceat(m, starts)

    def mask_partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["event_type"].isin(top)]
        if not len(d):
            return pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                                 "mask": pd.Series(dtype="int64")})
        m = np.left_shift(
            np.int64(1),
            d["event_type"].map(t_index).to_numpy(np.int64))
        u, masks = _or_by_user(d["user_id"].to_numpy(np.int64), m)
        return pd.DataFrame({"user_id": u, "mask": masks})

    def mask_merge(df: pd.DataFrame) -> pd.DataFrame:
        u, masks = _or_by_user(df["user_id"].to_numpy(np.int64),
                               df["mask"].to_numpy(np.int64))
        vals, cnt = np.unique(masks, return_counts=True)
        return pd.DataFrame({"mask": vals, "n": cnt.astype(np.int64)})

    hist = grouped_apply(
        ds.map_batches(mask_partial, batch_format="pandas",
                       batch_size=65536),
        [], mask_merge, single_block=True).to_pandas()
    mask_n = dict(zip(hist["mask"].astype(int), hist["n"].astype(int)))

    rows = []
    for ia in range(len(top)):
        for ib in range(ia + 1, len(top)):
            a, b = top[ia], top[ib]
            sa, sb = sketches.get(a, set()), sketches.get(b, set())
            uni = np.array(sorted(sa | sb), dtype=np.uint64)[:k]
            kp = len(uni)
            both = set(uni.tolist()) & sa & sb
            j_est = len(both) / kp if kp else 0.0
            frac = float(int(uni[-1])) / float(1 << 64) if kp else 1.0
            u_est = float(kp) if kp < k else (k - 1) / frac
            inter = sum(n for m, n in mask_n.items()
                        if (m >> ia) & 1 and (m >> ib) & 1)
            union = sum(n for m, n in mask_n.items()
                        if (m >> ia) & 1 or (m >> ib) & 1)
            rows.append((a, b, np.int64(kp), np.int64(len(both)),
                         round(j_est, 6), round(u_est, 6),
                         round(inter / union, 6) if union else 0.0))
    return pd.DataFrame(rows, columns=[
        "type_a", "type_b", "k_used", "k_common",
        "jaccard_est", "union_est", "jaccard_exact"])


def doc_select_coverage(sf_dir: str):
    """Greedy max-coverage training-data selection (Nemhauser, Wolsey
    & Fisher '78: the submodular greedy's (1-1/e) guarantee; coverage
    of a hashed word-trigram space is the classic instance — the
    "pick a diverse seed subset" curation op). 8 rounds over 4096 md5
    buckets: per-doc bucket sets materialize once (no shuffle — a doc
    is one row), then each round ships one 4096-bit covered bitmap out
    and ONE candidate row per block back; integer gains with doc_id
    tie-break make the scan deterministic, so the generated
    chained-CTE oracle replays the identical greedy selection."""
    from jerex_ray.ops.select import coverage_select
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return coverage_select(ds, k=8, n=3, buckets=4096)


def doc_dsir_select(sf_dir: str):
    """DSIR data selection (Xie et al. '23, arXiv:2302.03169):
    importance-resampling scores of raw docs (lang<>'en') under
    hashed-unigram bag models of the target (lang='en') vs raw corpus.
    Log-probability ratios are quantized to integer micro-nats
    (floor(1e6·Δln), add-one smoothing over 1024 buckets), so each
    doc's score is an INTEGER sum — order-independent and bit-exact in
    SQL. Dataflow: one vocab-bounded combiner pass for both sides'
    bucket counts, one broadcast of the 1024-int ratio table, one
    streaming scoring pass with per-block top-50 + driver merge."""
    from jerex_ray.ops.select import dsir_scores
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text", "lang"])
    return dsir_scores(ds, buckets=1024, top_k=50)


def _coverage_oracle_sql(k: int = 8, buckets: int = 4096) -> str:
    """Generated chained-CTE replay of the greedy max-coverage scan:
    stage s{r} re-derives round r's argmax (count of not-yet-covered
    buckets, ties to smallest doc_id), c{r} accumulates the covered
    set — the same integer recurrence the engine runs."""
    head = """t AS (
        SELECT doc_id, list_filter(regexp_split_to_array(lower(text),
            '\\s+'), x -> x <> '') AS ws FROM documents),
    g AS (
        SELECT DISTINCT doc_id,
               CAST(CAST('0x' || substr(md5('cov|' || g), 1, 16)
                    AS UBIGINT) %% %d AS BIGINT) AS b
        FROM (SELECT doc_id,
                     unnest([array_to_string(ws[i:i+2], ' ')
                             for i in range(1, len(ws) - 1)]) AS g
              FROM t WHERE len(ws) >= 3)),
    c0 AS (SELECT CAST(NULL AS BIGINT) AS b WHERE FALSE)""" % buckets
    parts = [head]
    for r in range(1, k + 1):
        parts.append(f"""s{r} AS (
            SELECT doc_id, count(*) AS gain FROM g
            WHERE b NOT IN (SELECT b FROM c{r - 1})
            GROUP BY doc_id ORDER BY gain DESC, doc_id LIMIT 1),
        c{r} AS (SELECT b FROM c{r - 1}
                 UNION SELECT g.b FROM g JOIN s{r} USING (doc_id))""")
    sel = "\nUNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS sel_rank, doc_id,"
        f" CAST(gain AS BIGINT) AS gain,"
        f" (SELECT count(*) FROM c{r}) AS covered_total FROM s{r}"
        for r in range(1, k + 1))
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT * FROM ({sel}) ORDER BY sel_rank")


def _dtw_table(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Integer DTW DP table (Sakoe & Chiba '78): dp[i,j] =
    |a_i − b_j| + min(dp[i−1,j], dp[i,j−1], dp[i−1,j−1]), first
    row/column cumulative. All int64 — no float anywhere."""
    n, m = len(a), len(b)
    cost = np.abs(a[:, None].astype(np.int64)
                  - b[None, :].astype(np.int64))
    dp = np.zeros((n, m), dtype=np.int64)
    dp[0, 0] = cost[0, 0]
    for j in range(1, m):
        dp[0, j] = dp[0, j - 1] + cost[0, j]
    for i in range(1, n):
        dp[i, 0] = dp[i - 1, 0] + cost[i, 0]
        for j in range(1, m):
            dp[i, j] = cost[i, j] + min(
                int(dp[i - 1, j]), int(dp[i, j - 1]),
                int(dp[i - 1, j - 1]))
    return dp


def q_events_dtw(sf_dir: str):
    """Dynamic-time-warping alignment (Sakoe–Chiba '78) between the
    diurnal hour-of-day count profiles of the top-2 event types
    (count DESC, name ASC) — the elastic-series-similarity primitive
    behind profile matching and drift triage. Distributed part: ONE
    vocabulary-bounded combiner pass (≤ #types × 24 rows cross the
    cluster); the 24×24 integer DP grid is metadata-sized and runs on
    the driver. All-integer costs let the generated wavefront oracle
    (one chained CTE per anti-diagonal, three LEFT JOIN predecessors)
    replay the DP bit-for-bit. Output: per row i, type-A's hour count
    and dp[i, 24] (prefix-A-vs-all-B alignment cost); row 24's dp_end
    is the DTW distance."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["ts", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (pd.DataFrame({
            "event_type": df["event_type"],
            "h": df["ts"].dt.hour.astype("int64")})
            .groupby(["event_type", "h"], sort=False)
            .size().reset_index(name="c"))

    counts = grouped_aggregate(
        ds.map_batches(partial, batch_format="pandas",
                       batch_size=65536),
        ["event_type", "h"], {"c": ("c", "sum")},
        result_hint="small").to_pandas()
    tc = counts.groupby("event_type")["c"].sum().reset_index() \
        .sort_values(["c", "event_type"], ascending=[False, True])
    top = list(tc["event_type"].head(2))
    prof = []
    for t in top:
        v = np.zeros(24, dtype=np.int64)
        sub = counts[counts["event_type"] == t]
        v[sub["h"].to_numpy(np.int64)] = sub["c"].to_numpy(np.int64)
        prof.append(v)
    dp = _dtw_table(prof[0], prof[1])
    return pd.DataFrame({"i": np.arange(1, 25, dtype=np.int64),
                         "count_a": prof[0],
                         "dp_end": dp[:, 23]})


def _dtw_oracle_sql(n: int = 24) -> str:
    """Generated anti-diagonal wavefront replay of the DTW DP: w{d}
    holds the cells with i+j=d, each computed from the two previous
    diagonals; missing predecessors coalesce to a +inf sentinel."""
    big = 1 << 40
    stages = []
    for dd in range(3, 2 * n + 1):
        # MATERIALIZED is load-bearing: each w{d} is referenced three
        # times downstream; an inlined CTE would re-evaluate the whole
        # prefix chain exponentially.
        stages.append(f"""w{dd} AS MATERIALIZED (
            SELECT g.i, g.j, g.cost + least(
                coalesce(a.v, {big}), coalesce(bb.v, {big}),
                coalesce(c2.v, {big})) AS v
            FROM grid g
            LEFT JOIN w{dd - 1} a ON a.i = g.i - 1 AND a.j = g.j
            LEFT JOIN w{dd - 1} bb ON bb.i = g.i AND bb.j = g.j - 1
            LEFT JOIN w{dd - 2} c2 ON c2.i = g.i - 1
                                   AND c2.j = g.j - 1
            WHERE g.i + g.j = {dd})""")
    union = "\nUNION ALL ".join(
        f"SELECT i, v FROM w{dd} WHERE j = {n}"
        for dd in range(n + 1, 2 * n + 1))
    return f"""
        WITH tc AS MATERIALIZED (SELECT event_type, count(*) AS c
                    FROM events GROUP BY 1),
        top2 AS MATERIALIZED (SELECT event_type,
                        row_number() OVER (ORDER BY c DESC,
                                           event_type) AS rk
                 FROM tc QUALIFY rk <= 2),
        hrs AS (SELECT unnest(range({n})) AS h),
        ca AS MATERIALIZED (
               SELECT EXTRACT(hour FROM e.ts) AS h, count(*) AS c
               FROM events e JOIN top2 t USING (event_type)
               WHERE t.rk = 1 GROUP BY 1),
        cb AS MATERIALIZED (
               SELECT EXTRACT(hour FROM e.ts) AS h, count(*) AS c
               FROM events e JOIN top2 t USING (event_type)
               WHERE t.rk = 2 GROUP BY 1),
        pa AS MATERIALIZED (
               SELECT hrs.h + 1 AS i, coalesce(ca.c, 0) AS av
               FROM hrs LEFT JOIN ca ON ca.h = hrs.h),
        pb AS MATERIALIZED (
               SELECT hrs.h + 1 AS j, coalesce(cb.c, 0) AS bv
               FROM hrs LEFT JOIN cb ON cb.h = hrs.h),
        grid AS MATERIALIZED (
                 SELECT pa.i, pb.j, abs(pa.av - pb.bv) AS cost
                 FROM pa CROSS JOIN pb),
        w1 AS (SELECT CAST(NULL AS BIGINT) AS i,
                      CAST(NULL AS BIGINT) AS j,
                      CAST(NULL AS BIGINT) AS v WHERE FALSE),
        w2 AS (SELECT i, j, cost AS v FROM grid
               WHERE i = 1 AND j = 1),
        {','.join(stages)}
        SELECT u.i, CAST(pa.av AS BIGINT) AS count_a,
               CAST(u.v AS BIGINT) AS dp_end
        FROM ({union}) u JOIN pa ON pa.i = u.i ORDER BY u.i
    """


def q_lineitem_hilbert(sf_dir: str):
    """Hilbert-curve clustering audit of lineitem on
    (l_partkey, l_suppkey) — the locality-stronger twin of
    q_lineitem_zorder (consecutive Hilbert codes are always
    grid-adjacent, so bucket envelopes are tighter on average; Moon
    et al. '01). Same dataflow as the Z-order audit: one vectorized
    xy→d pass (16 shift/mask/where steps, no row loop), exact-integer
    bucket assignment d·64 // (maxd+1), per-bucket zone-map envelopes
    through the combiner. Integer-only end to end, so the generated
    16-stage rotate/reflect CTE oracle replays it bit-for-bit."""
    from jerex_ray.ops.layout import hilbert_interleave, \
        zorder_layout_stats
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/lineitem.parquet",
                            columns=["l_partkey", "l_suppkey"])
    return zorder_layout_stats(ds, cols=["l_partkey", "l_suppkey"],
                               nbuckets=64,
                               interleave=hilbert_interleave)


def _hilbert_oracle_sql(cols=("l_partkey", "l_suppkey"),
                        nbuckets: int = 64, bits: int = 16) -> str:
    """Generated unroll of the Hilbert xy→d transform: one CTE per
    bit level carrying (x, y, d) through the rotate/reflect step,
    originals preserved for the zone-map envelopes."""
    cx, cy = cols
    stages = [f"""h0 AS (
        SELECT {cx} AS ox, {cy} AS oy,
               CAST({cx} AS BIGINT) AS x, CAST({cy} AS BIGINT) AS y,
               CAST(0 AS BIGINT) AS d
        FROM lineitem)"""]
    for i in range(bits):
        s = 1 << (bits - 1 - i)
        stages.append(f"""h{i + 1} AS (
            SELECT ox, oy,
                CASE WHEN (y & {s}) = 0
                     THEN CASE WHEN (x & {s}) > 0
                               THEN {s} - 1 - y ELSE y END
                     ELSE x END AS x,
                CASE WHEN (y & {s}) = 0
                     THEN CASE WHEN (x & {s}) > 0
                               THEN {s} - 1 - x ELSE x END
                     ELSE y END AS y,
                d + {s * s} * xor(
                    3 * (CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END),
                    CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END) AS d
            FROM h{i})""")
    return f"""
        WITH {','.join(stages)},
        mx AS (SELECT max(d) AS m FROM h{bits}),
        b AS (SELECT ox, oy,
                     (d * {nbuckets}) // ((SELECT m FROM mx) + 1)
                         AS bucket
              FROM h{bits})
        SELECT bucket, count(*) AS n,
               min(ox) AS {cx}_min, max(ox) AS {cx}_max,
               min(oy) AS {cy}_min, max(oy) AS {cy}_max
        FROM b GROUP BY bucket ORDER BY bucket
    """


def q_customer_linkage_fs(sf_dir: str):
    """Fellegi–Sunter probabilistic record linkage (Fellegi & Sunter
    '69, the decision-theoretic core of every modern ER system) over
    nation-blocked customer pairs. Three comparison fields — market
    segment, 100-unit balance band (exact integer cents, offset
    positive so ``//`` floors identically in numpy and SQL), custkey
    last digit — scored with quantized integer log-weights
    ``wa=floor(1e6·(ln m − ln u))`` / ``wd=floor(1e6·(ln(1−m) −
    ln(1−u)))``, where each field's u-probability is the exact global
    agreement odds Σ c_v(c_v−1)/(N(N−1)) from a vocab-bounded
    histogram pass. Integer pair scores ⇒ the SQL self-join oracle
    reproduces the top-100 bit-for-bit. Dataflow: histogram combiner
    passes for u, ONE hash co-location by blocking key, vectorized
    in-block pair enumeration (triu indices — pairs never cross the
    cluster), per-block top-100 + driver merge."""
    from jerex_ray.functions.aggregate import grouped_aggregate, \
        grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal",
                 "c_mktsegment"])

    def feats(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(df["c_acctbal"].to_numpy(np.float64)
                         * 100).astype(np.int64)
        return pd.DataFrame({
            "id": df["c_custkey"].astype("int64"),
            "nk": df["c_nationkey"].astype("int64"),
            "f1": df["c_mktsegment"].astype(str),
            "f2": (cents + 100000) // 10000,
            "f3": df["c_custkey"].astype("int64") % 10})

    fds = ds.map_batches(feats, batch_format="pandas",
                         batch_size=65536).materialize()
    m_probs = (0.95, 0.9, 0.85)
    wa, wd = [], []
    for f, m in zip(("f1", "f2", "f3"), m_probs):
        h = grouped_aggregate(fds, [f], {"c": (None, "count")},
                              result_hint="small").to_pandas()
        c = h["c"].to_numpy(np.int64)
        n = int(c.sum())
        u = float(int((c * (c - 1)).sum())) / float(n * (n - 1))
        wa.append(int(np.floor(1e6 * (np.log(m) - np.log(u)))))
        wd.append(int(np.floor(1e6 * (np.log(1.0 - m)
                                      - np.log(1.0 - u)))))
    wa_v, wd_v = np.array(wa, dtype=np.int64), \
        np.array(wd, dtype=np.int64)
    empty = pd.DataFrame({
        "id_a": pd.Series(dtype="int64"),
        "id_b": pd.Series(dtype="int64"),
        "agree_seg": pd.Series(dtype="int64"),
        "agree_bal": pd.Series(dtype="int64"),
        "agree_digit": pd.Series(dtype="int64"),
        "score_micro": pd.Series(dtype="int64")})

    def block_pairs(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, g in df.groupby("nk", sort=False):
            g = g.sort_values("id")
            ids = g["id"].to_numpy(np.int64)
            if len(ids) < 2:
                continue
            i, j = np.triu_indices(len(ids), k=1)
            score = np.zeros(len(i), dtype=np.int64)
            agrees = []
            for fi, f in enumerate(("f1", "f2", "f3")):
                v = g[f].to_numpy()
                a = v[i] == v[j]
                agrees.append(a.astype(np.int64))
                score += np.where(a, wa_v[fi], wd_v[fi])
            d = pd.DataFrame({"id_a": ids[i], "id_b": ids[j],
                              "agree_seg": agrees[0],
                              "agree_bal": agrees[1],
                              "agree_digit": agrees[2],
                              "score_micro": score})
            rows.append(d.sort_values(
                ["score_micro", "id_a", "id_b"],
                ascending=[False, True, True]).head(100))
        return pd.concat(rows, ignore_index=True) if rows else empty

    cand = grouped_apply(fds, ["nk"], block_pairs).to_pandas()
    if cand.empty:
        return empty
    out = cand.sort_values(["score_micro", "id_a", "id_b"],
                           ascending=[False, True, True]) \
        .head(100).reset_index(drop=True)
    return out.astype({c: "int64" for c in out.columns})


def q_join_order_dp(sf_dir: str):
    """Cost-based join-order planning (Selinger et al. '79) over the
    nation⋈customer⋈orders⋈lineitem chain — the planner audit an
    engine consults before committing a join tree. Distributed part:
    exact row counts and per-edge distinct-key counts (the System-R
    statistics pass). Driver part: the contiguous-range DP over the
    metadata-sized range table with the classic cardinality model
    |A⋈B| = |A|·|B| / max(d_A, d_B) kept EXACT — one big-int product
    divided once per range (Python ints / SQL HUGEINT, both
    truncating positives), Cout cost = |output| summed over
    intermediates, ties to the smallest split. Everything integer ⇒
    the SQL oracle replays plan costs and split choices bit-for-bit.
    Output: one row per contiguous range (r_from, r_to, est_card,
    best_cost, best_split; singles cost 0 / split 0)."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()

    def _distinct(path: str, col: str) -> int:
        d = read_parquet_sized(path, columns=[col])
        return grouped_aggregate(d, [col], {"c": (None, "count")},
                                 result_hint="small").count()

    paths = {t: f"{sf_dir}/{t}.parquet"
             for t in ("nation", "customer", "orders", "lineitem")}
    rows = [read_parquet_sized(paths[t]).count()
            for t in ("nation", "customer", "orders", "lineitem")]
    # edge k joins relation k and k+1; denominator = max distinct
    dens = [
        max(_distinct(paths["nation"], "n_nationkey"),
            _distinct(paths["customer"], "c_nationkey")),
        max(_distinct(paths["customer"], "c_custkey"),
            _distinct(paths["orders"], "o_custkey")),
        max(_distinct(paths["orders"], "o_orderkey"),
            _distinct(paths["lineitem"], "l_orderkey")),
    ]

    def card(i: int, j: int) -> int:          # 1-indexed inclusive
        num = 1
        for t in range(i, j + 1):
            num *= rows[t - 1]
        den = 1
        for e in range(i, j):
            den *= dens[e - 1]
        return num // den

    cost: dict[tuple, int] = {}
    split: dict[tuple, int] = {}
    for i in range(1, 5):
        cost[(i, i)] = 0
        split[(i, i)] = 0
    for ln in range(2, 5):
        for i in range(1, 6 - ln):
            j = i + ln - 1
            best_c, best_k = None, None
            for k in range(i, j):
                c = cost[(i, k)] + cost[(k + 1, j)]
                if best_c is None or c < best_c:
                    best_c, best_k = c, k
            cost[(i, j)] = best_c + card(i, j)
            split[(i, j)] = best_k
    out = [(i, j, card(i, j) if i != j else rows[i - 1],
            cost[(i, j)], split[(i, j)])
           for i in range(1, 5) for j in range(i, 5)]
    out.sort()
    return pd.DataFrame(out, columns=["r_from", "r_to", "est_card",
                                      "best_cost", "best_split"]) \
        .astype("int64")


def q_events_ldiversity(sf_dir: str, *, el: int = 3):
    """Distinct l-diversity audit (Machanavajjhala et al. '06, the
    k-anonymity successor): under the quasi-identifier (user-id
    bucket, hour-of-day) with event_type as the SENSITIVE attribute,
    how many equivalence classes carry fewer than l distinct sensitive
    values — the homogeneity-attack surface k-anonymity misses. Two
    combiner passes, both QI-vocabulary bounded: class×sensitive
    counts, then per-class (rows, distinct-sensitive, max-sensitive
    run). Integer-exact throughout; the worst single-value share is
    one final divide of exact integers."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_type"])

    def qi(df: pd.DataFrame) -> pd.DataFrame:
        hod = (df["ts"].astype("datetime64[us]").astype("int64")
               // 3_600_000_000) % 24
        return pd.DataFrame({
            "ubucket": df["user_id"].to_numpy(np.int64) // 10,
            "hod": hod.to_numpy(np.int64),
            "event_type": df["event_type"].to_numpy(),
            "n": 1}).groupby(["ubucket", "hod", "event_type"],
                             sort=False).sum().reset_index()

    cells = grouped_aggregate(
        ds.map_batches(qi, batch_format="pandas", batch_size=8192),
        ["ubucket", "hod", "event_type"], {"n": ("n", "sum")},
        result_hint="large")
    cls = grouped_aggregate(
        cells, ["ubucket", "hod"],
        {"rows": ("n", "sum"), "n_sens": (None, "count"),
         "max_run": ("n", "max")}, result_hint="small").to_pandas()
    low = cls[cls["n_sens"] < el]
    # worst homogeneity: the class maximizing max_run/rows, ties to
    # the largest max_run then smallest rows — exact integer compare
    # via cross-multiplication is overkill here since we only report
    # the share of ONE class picked by integer sort keys
    worst = cls.sort_values(["max_run", "rows"],
                            ascending=[False, True]).iloc[0]
    return pd.DataFrame({
        "n_classes": [np.int64(len(cls))],
        "n_low_div": [np.int64(len(low))],
        "rows_at_risk": [np.int64(low["rows"].sum())],
        "min_distinct_sens": [np.int64(cls["n_sens"].min())],
        "worst_run": [np.int64(worst["max_run"])],
        "worst_share": [round(float(worst["max_run"])
                              / float(worst["rows"]), 6)]})


def q_lineitem_gains(sf_dir: str):
    """Cumulative gains curve of quantity-predicts-return (the
    marketing "decile lift" table at score-value granularity, which
    sidesteps NTILE tie-splitting entirely): for each quantity value
    scanned best-first, cumulative rows and cumulative positives
    (l_returnflag = 'R'). The score vocabulary is bounded (integer
    quantities), so ONE combiner pass reduces the corpus to ≤50 rows
    and the cumulative sums are exact integers on a driver-side
    table; completes the AUC/ROC eval family with the gains/lift
    view. SQL-oracled via window sums."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/lineitem.parquet",
                            columns=["l_quantity", "l_returnflag"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        q = df["l_quantity"].to_numpy(np.float64).astype(np.int64)
        pos = (df["l_returnflag"] == "R").to_numpy(np.int64)
        return (pd.DataFrame({"quantity": q, "n": 1, "pos": pos})
                .groupby("quantity", sort=False).sum().reset_index())

    h = grouped_aggregate(
        ds.map_batches(partial, batch_format="pandas",
                       batch_size=65536),
        ["quantity"], {"n": ("n", "sum"), "pos": ("pos", "sum")},
        result_hint="small").to_pandas() \
        .sort_values("quantity", ascending=False) \
        .reset_index(drop=True)
    h["cum_n"] = h["n"].cumsum()
    h["cum_pos"] = h["pos"].cumsum()
    tot_pos = int(h["pos"].sum())
    h["gain_share"] = np.round(
        h["cum_pos"].to_numpy(np.float64) / float(tot_pos), 6)
    return h.astype({c: "int64" for c in
                     ("quantity", "n", "pos", "cum_n", "cum_pos")})


def q_part_katz(sf_dir: str):
    """Katz centrality (Katz '53) over the customer–part purchase
    incidence, exact-integer form (``ops/graph.katz_bipartite``):
    α = 1/4 cleared by scaling, so every score is an integer
    walk-count combination and the chained-CTE oracle replays the
    4 SpMV rounds bit-for-bit. Broadcast-SpMV dataflow — incidence
    materializes once, node-sized vectors move per round."""
    from jerex_ray.ops.graph import katz_bipartite
    from jerex_ray.runtime import read_parquet_sized, \
        shuffle_partitions
    configure_data_context()
    li = read_parquet_sized(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey"])
    orders = read_parquet_sized(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_custkey"])
    j = li.join(orders, join_type="inner",
                num_partitions=shuffle_partitions(8),
                on=("l_orderkey",), right_on=("o_orderkey",))
    out = katz_bipartite(j, u_col="o_custkey", v_col="l_partkey",
                         iters=4, alpha_denom=4)
    out["node"] = out["node"].astype("int64")
    return out


def _katz_oracle_sql(iters: int = 4, denom: int = 4) -> str:
    """Chained-CTE replay of ``q_part_katz``: one u-side and one
    v-side SpMV CTE per iteration over the distinct incidence, then
    the integer-weighted sum Σ denom^{K−k}·s_k per node."""
    sql = """
        WITH e AS MATERIALIZED (
            SELECT DISTINCT o_custkey AS u, l_partkey AS v
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        su0 AS (SELECT u, CAST(1 AS BIGINT) AS s
                FROM (SELECT DISTINCT u FROM e)),
        sv0 AS (SELECT v, CAST(1 AS BIGINT) AS s
                FROM (SELECT DISTINCT v FROM e))"""
    for k in range(1, iters + 1):
        sql += f""",
        su{k} AS MATERIALIZED (
            SELECT u, sum(sv{k - 1}.s) AS s
            FROM e JOIN sv{k - 1} USING (v) GROUP BY u),
        sv{k} AS MATERIALIZED (
            SELECT v, sum(su{k - 1}.s) AS s
            FROM e JOIN su{k - 1} USING (u) GROUP BY v)"""
    wu = " + ".join(f"{denom ** (iters - k)} * su{k}.s"
                    for k in range(1, iters + 1))
    wv = " + ".join(f"{denom ** (iters - k)} * sv{k}.s"
                    for k in range(1, iters + 1))
    ju = " ".join(f"JOIN su{k} USING (u)"
                  for k in range(2, iters + 1))
    jv = " ".join(f"JOIN sv{k} USING (v)"
                  for k in range(2, iters + 1))
    sql += f"""
        SELECT side, node, katz_scaled FROM (
            SELECT 'o_custkey' AS side, su1.u AS node,
                   CAST({wu} AS BIGINT) AS katz_scaled
            FROM su1 {ju}
            UNION ALL
            SELECT 'l_partkey', sv1.v, CAST({wv} AS BIGINT)
            FROM sv1 {jv})
        ORDER BY side, node"""
    return sql


def q_events_viterbi(sf_dir: str, *, steps: int = 4):
    """Viterbi decode (Viterbi '67) over the per-user event-type
    Markov chain: the most likely length-4 state sequence under the
    transition-COUNT max-product objective (counts, not normalized
    probabilities — products of exact integers, so the DP has no
    float hazard and the generated SQL stages replay it exactly).
    Distributed part: the |types|²-bounded transition matrix from one
    hash co-location (``ops/windows.transition_matrix``); the
    |types|×steps DP runs on the driver over that metadata-sized
    table. Ties break to the lexicographically smallest predecessor.
    Output: (step, state, best_score, prev_state) for every
    reachable state at every step."""
    from jerex_ray.ops.windows import transition_matrix
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts",
                                     "event_type"])
    tm = transition_matrix(ds, key="user_id", ts_col="ts",
                           id_col="event_id", type_col="event_type")
    states = sorted(set(tm["prev_type"]) | set(tm["next_type"]))
    trans = {(r["prev_type"], r["next_type"]): int(r["cnt"])
             for _, r in tm.iterrows()}
    v = {s: (1, "") for s in states}           # score, backpointer
    rows = [(0, s, 1, "") for s in states]
    for k in range(1, steps):
        nv: dict = {}
        for (s, t), c in trans.items():
            if s not in v:
                continue
            cand = v[s][0] * c
            if t not in nv or cand > nv[t][0] \
                    or (cand == nv[t][0] and s < nv[t][1]):
                nv[t] = (cand, s)
        v = nv
        rows.extend((k, t, sc, bp)
                    for t, (sc, bp) in sorted(v.items()))
    out = pd.DataFrame(rows, columns=["step", "state", "best_score",
                                      "prev_state"])
    return out.astype({"step": "int64", "best_score": "int64"}) \
        .sort_values(["step", "state"]).reset_index(drop=True)


def _viterbi_oracle_sql(steps: int = 4) -> str:
    """Generated DP-stage replay of ``q_events_viterbi``: the LEAD
    transition counts, then one CTE per step taking the row_number-1
    (score DESC, predecessor ASC) candidate per state."""
    sql = """
        WITH seq AS MATERIALIZED (
            SELECT event_type AS s,
                   LEAD(event_type) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id) AS t
            FROM events),
        tm AS MATERIALIZED (
            SELECT s AS prev_type, t AS next_type, count(*) AS cnt
            FROM seq WHERE t IS NOT NULL GROUP BY 1, 2),
        st AS (SELECT DISTINCT prev_type AS state FROM tm
               UNION SELECT DISTINCT next_type FROM tm),
        v0 AS (SELECT state, CAST(1 AS BIGINT) AS s,
                      '' AS bp FROM st)"""
    for k in range(1, steps):
        sql += f""",
        v{k} AS MATERIALIZED (
            SELECT state, s, bp FROM (
                SELECT t.next_type AS state,
                       v.s * t.cnt AS s, v.state AS bp,
                       row_number() OVER (
                           PARTITION BY t.next_type
                           ORDER BY v.s * t.cnt DESC, v.state ASC)
                           AS rn
                FROM v{k - 1} v
                JOIN tm t ON t.prev_type = v.state)
            WHERE rn = 1)"""
    union = "\nUNION ALL ".join(
        f"SELECT CAST({k} AS BIGINT) AS step, state,"
        f" CAST(s AS BIGINT) AS best_score, bp AS prev_state"
        f" FROM v{k}"
        for k in range(steps))
    return sql + f"\nSELECT * FROM ({union}) ORDER BY step, state"


def q_events_butterflies(sf_dir: str):
    """Bipartite butterfly (2×2 biclique) counting on the user ×
    event-type graph (Sanei-Mehri et al. '18, the bipartite
    clustering primitive): per type pair, the common-user count n and
    C(n,2) butterflies. The type vocabulary is bounded, so ONE
    distinct-incidence combiner pass plus a per-user type-bitmask
    histogram (≤2^#types rows) computes every pair exactly — no
    user-pair materialization anywhere. Integer-exact; SQL-oracled
    via the incidence self-join."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type"])
    ut = grouped_aggregate(ds, ["user_id", "event_type"],
                           {"n": (None, "count")},
                           result_hint="large").drop_columns(["n"]) \
        .materialize()
    types = sorted(ut.unique("event_type"))
    t_index = {t: i for i, t in enumerate(types)}

    def mask_partial(df: pd.DataFrame) -> pd.DataFrame:
        m = np.left_shift(
            np.int64(1),
            df["event_type"].map(t_index).to_numpy(np.int64))
        g = (pd.DataFrame({"user_id": df["user_id"], "m": m})
             .groupby("user_id", sort=False)["m"].sum())
        return pd.DataFrame({"user_id": g.index.to_numpy(),
                             "mask": g.to_numpy(np.int64)})

    # the incidence rows are globally DISTINCT, so each (user, type)
    # bit appears in exactly one partial — per-user SUM of partial
    # masks IS the bitwise OR, and grouped_aggregate's sum combiner
    # merges them exactly
    masks = grouped_aggregate(
        ut.map_batches(mask_partial, batch_format="pandas",
                       batch_size=65536),
        ["user_id"], {"mask": ("mask", "sum")},
        result_hint="large")

    def hist_partial(df: pd.DataFrame) -> pd.DataFrame:
        vals, cnt = np.unique(df["mask"].to_numpy(np.int64),
                              return_counts=True)
        return pd.DataFrame({"mask": vals,
                             "n": cnt.astype(np.int64)})

    hist = grouped_aggregate(
        masks.map_batches(hist_partial, batch_format="pandas",
                          batch_size=65536),
        ["mask"], {"n": ("n", "sum")},
        result_hint="small").to_pandas()
    mask_n = dict(zip(hist["mask"].astype(int),
                      hist["n"].astype(int)))
    rows = []
    for ia in range(len(types)):
        for ib in range(ia + 1, len(types)):
            n = sum(c for m, c in mask_n.items()
                    if (m >> ia) & 1 and (m >> ib) & 1)
            if n == 0:
                continue
            rows.append((types[ia], types[ib], np.int64(n),
                         np.int64(n * (n - 1) // 2)))
    return pd.DataFrame(rows, columns=["type_a", "type_b",
                                       "n_common_users",
                                       "butterflies"])


def q_events_shapley(sf_dir: str):
    """EXACT Shapley-value reach attribution (Shapley '53; the
    game-theoretic attribution modern marketing/feature-importance
    stacks approximate by sampling): channels = event types, reach
    game v(S) = #users touched by at least one type in S, and each
    type's Shapley value φ_i = Σ_{S∌i} |S|!(n−|S|−1)!/n! · (v(S∪i) −
    v(S)) splits total reach exactly (Σφ = v(N), efficiency — the
    pytest invariant). The user-side reduces to the per-user
    type-bitmask HISTOGRAM (≤2ⁿ rows) via the distinct-incidence
    sum-is-OR combiner trick, so v(S) for all 2ⁿ coalitions — and the
    full exact Shapley sum — is driver-side arithmetic over a
    metadata-sized table; everything stays integer by scaling with n!
    (one final divide for the share). SQL-oracled bit-for-bit via
    range(64) subset enumeration + bit_count (needs #types ≤ 6;
    fixtures have 5)."""
    import math

    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type"])
    ut = grouped_aggregate(ds, ["user_id", "event_type"],
                           {"n": (None, "count")},
                           result_hint="large").drop_columns(["n"]) \
        .materialize()
    types = sorted(ut.unique("event_type"))
    n = len(types)
    t_index = {t: i for i, t in enumerate(types)}

    def mask_partial(df: pd.DataFrame) -> pd.DataFrame:
        m = np.left_shift(
            np.int64(1),
            df["event_type"].map(t_index).to_numpy(np.int64))
        g = (pd.DataFrame({"user_id": df["user_id"], "m": m})
             .groupby("user_id", sort=False)["m"].sum())
        return pd.DataFrame({"user_id": g.index.to_numpy(),
                             "mask": g.to_numpy(np.int64)})

    masks = grouped_aggregate(
        ut.map_batches(mask_partial, batch_format="pandas",
                       batch_size=65536),
        ["user_id"], {"mask": ("mask", "sum")},
        result_hint="large")

    def hist_partial(df: pd.DataFrame) -> pd.DataFrame:
        vals, cnt = np.unique(df["mask"].to_numpy(np.int64),
                              return_counts=True)
        return pd.DataFrame({"mask": vals,
                             "n": cnt.astype(np.int64)})

    hist = grouped_aggregate(
        masks.map_batches(hist_partial, batch_format="pandas",
                          batch_size=65536),
        ["mask"], {"n": ("n", "sum")},
        result_hint="small").to_pandas()
    mask_n = dict(zip(hist["mask"].astype(int),
                      hist["n"].astype(int)))

    def v(S: int) -> int:
        return sum(c for m, c in mask_n.items() if m & S)

    vs = [v(S) for S in range(1 << n)]
    phi = []
    for i in range(n):
        acc = 0
        for S in range(1 << n):
            if S & (1 << i):
                continue
            size = bin(S).count("1")
            w = math.factorial(size) * math.factorial(n - size - 1)
            acc += w * (vs[S | (1 << i)] - vs[S])
        phi.append(acc)
    tot = sum(phi)                       # = n! · v(N) (efficiency)
    return pd.DataFrame({
        "channel": types,
        "shapley_scaled": np.array(phi, dtype=np.int64),
        "share": [round(float(p) / float(tot), 6) for p in phi]})


def q_part_walks(sf_dir: str):
    """Deterministic DeepWalk corpus (Perozzi et al. '14) over the
    part co-purchase graph: 2 walks × 3 steps from every node, hop s
    = sorted-neighbor rank md5('walk|start|w|s|cur') % deg — the
    md5-seeded twin of the engine's per-doc seeded sampling, so the
    corpus is shard-independent and the generated SQL oracle replays
    every hop bit-for-bit (``ops/graph.deterministic_walks``). Per
    step only node-sized frontier state moves; the pick happens
    against the degree table BEFORE touching adjacency, so no
    neighborhood blow-up materializes."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.ops.graph import deterministic_walks
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    li = read_parquet_sized(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey"])

    def pairs_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"a": pd.Series(dtype="int64"),
                                 "b": pd.Series(dtype="int64")})
        d = df.drop_duplicates(["l_orderkey", "l_partkey"])
        m = d.merge(d, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        return pd.DataFrame({"a": m["l_partkey_x"].to_numpy(),
                             "b": m["l_partkey_y"].to_numpy()}) \
            .drop_duplicates()

    edges = grouped_apply(li, ["l_orderkey"], pairs_block)
    return deterministic_walks(edges, src="a", dst="b",
                               walks=2, length=3)


def _walks_oracle_sql(walks: int = 2, length: int = 3) -> str:
    """Generated per-step replay of ``q_part_walks``: ranked sorted
    adjacency via row_number, each step CTE picks rank
    md5-hash % deg exactly as the engine does."""
    sql = """
        WITH inc AS MATERIALIZED (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        ed AS MATERIALIZED (
            SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
            FROM inc a JOIN inc b
                 ON a.l_orderkey = b.l_orderkey
                AND a.l_partkey < b.l_partkey),
        adj AS MATERIALIZED (
            SELECT u, nbr,
                   row_number() OVER (PARTITION BY u ORDER BY nbr)
                       - 1 AS rnk,
                   count(*) OVER (PARTITION BY u) AS deg
            FROM (SELECT a AS u, b AS nbr FROM ed
                  UNION ALL SELECT b, a FROM ed)),
        dg AS MATERIALIZED (SELECT DISTINCT u, deg FROM adj),
        f0 AS MATERIALIZED (
            SELECT n.u AS start, w.w AS walk, n.u AS cur
            FROM (SELECT DISTINCT u FROM adj) n
            CROSS JOIN (SELECT unnest(range(%d)) AS w) w)""" % walks
    for s in range(1, length + 1):
        sql += f""",
        f{s} AS MATERIALIZED (
            SELECT f.start, f.walk, a.nbr AS cur
            FROM f{s - 1} f
            JOIN dg d ON d.u = f.cur
            JOIN adj a ON a.u = f.cur AND a.rnk = CAST(
                CAST('0x' || substr(md5(
                    'walk|' || f.start || '|' || f.walk
                    || '|{s}|' || f.cur), 1, 16) AS UBIGINT)
                % CAST(d.deg AS UBIGINT) AS BIGINT))"""
    union = "\nUNION ALL ".join(
        f"SELECT start, walk, CAST({s} AS BIGINT) AS step,"
        f" cur AS node FROM f{s}"
        for s in range(length + 1))
    return sql + f"""
        SELECT * FROM ({union})
        ORDER BY start, walk, step"""


def q_events_tcloseness(sf_dir: str, *, top: int = 10):
    """t-closeness audit (Li et al. '07, completing the k-anonymity /
    l-diversity privacy triad): per QI class (user-bucket, hour), the
    variational distance between the class's sensitive (event_type)
    distribution and the global one, kept EXACT — tvd_num =
    Σ_v |cnt_cv·N − cnt_gv·n_c| is an integer (cross-multiplied
    common denominator), tvd = tvd_num / (2·n_c·N) is one final
    divide. Reports the ``top`` worst classes ordered by the
    identical double (num/n_c) on both engines, ties to (ubucket,
    hod). Two QI-vocabulary-bounded combiner passes; the class ×
    sensitive grid is metadata-sized on the driver."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_type"])

    def qi(df: pd.DataFrame) -> pd.DataFrame:
        hod = (df["ts"].astype("datetime64[us]").astype("int64")
               // 3_600_000_000) % 24
        return pd.DataFrame({
            "ubucket": df["user_id"].to_numpy(np.int64) // 10,
            "hod": hod.to_numpy(np.int64),
            "event_type": df["event_type"].to_numpy(),
            "n": 1}).groupby(["ubucket", "hod", "event_type"],
                             sort=False).sum().reset_index()

    cells = grouped_aggregate(
        ds.map_batches(qi, batch_format="pandas", batch_size=8192),
        ["ubucket", "hod", "event_type"], {"n": ("n", "sum")},
        result_hint="large").to_pandas()
    glob = cells.groupby("event_type")["n"].sum()
    types = sorted(glob.index)
    g_vec = glob[types].to_numpy(np.int64)
    n_tot = int(g_vec.sum())
    piv = cells.pivot_table(index=["ubucket", "hod"],
                            columns="event_type", values="n",
                            aggfunc="sum", fill_value=0) \
        .reindex(columns=types, fill_value=0)
    cnt = piv.to_numpy(np.int64)
    n_c = cnt.sum(axis=1)
    tvd_num = np.abs(cnt * n_tot - g_vec[None, :] * n_c[:, None]) \
        .sum(axis=1)
    out = pd.DataFrame({
        "ubucket": piv.index.get_level_values(0).astype("int64"),
        "hod": piv.index.get_level_values(1).astype("int64"),
        "n_rows": n_c, "tvd_num": tvd_num,
        "key": tvd_num.astype(np.float64) / n_c.astype(np.float64)})
    out = out.sort_values(["key", "ubucket", "hod"],
                          ascending=[False, True, True]).head(top)
    out["tvd"] = np.round(
        out["tvd_num"].to_numpy(np.float64)
        / (2.0 * out["n_rows"].to_numpy(np.float64) * float(n_tot)),
        6)
    return out.drop(columns=["key"]) \
        .astype({"ubucket": "int64", "hod": "int64",
                 "n_rows": "int64", "tvd_num": "int64"}) \
        .reset_index(drop=True)


def q_doc_langid_kappa(sf_dir: str):
    """Cohen's kappa (Cohen '60) between the engine's stopword-profile
    language ID and the corpus's labeled lang column — the standard
    annotator-agreement audit of a labeling pipeline. Exact integers
    end to end: kappa = (N·Σn_kk − Σr_k·c_k)/(N² − Σr_k·c_k) is one
    final divide of exact integer sums from the label-vocabulary-
    bounded confusion matrix (one distributed join + one combiner
    pass). Output also carries the raw agreement and chance terms."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.ops.textstats import run_langid
    from jerex_ray.runtime import read_parquet_sized, \
        shuffle_partitions
    configure_data_context()
    docs = read_parquet_sized(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text", "lang"])
    pred = run_langid(docs.drop_columns(["lang"])).materialize()
    truth = docs.drop_columns(["text"]).materialize()
    j = pred.join(truth, join_type="inner",
                  num_partitions=shuffle_partitions(8),
                  on=("doc_id",))
    conf = grouped_aggregate(j, ["lang", "lang_pred"],
                             {"n": (None, "count")},
                             result_hint="small").to_pandas()
    n_tot = int(conf["n"].sum())
    agree = int(conf.loc[conf["lang"] == conf["lang_pred"],
                         "n"].sum())
    rs = conf.groupby("lang")["n"].sum()
    cs = conf.groupby("lang_pred")["n"].sum()
    labels = sorted(set(rs.index) | set(cs.index))
    chance = sum(int(rs.get(lb, 0)) * int(cs.get(lb, 0))
                 for lb in labels)
    kappa = float(n_tot * agree - chance) \
        / float(n_tot * n_tot - chance)
    return pd.DataFrame({
        "n_docs": [np.int64(n_tot)],
        "n_agree": [np.int64(agree)],
        "chance_cross": [np.int64(chance)],
        "kappa": [round(kappa, 6)]})


def q_events_mondrian(sf_dir: str, *, levels: int = 3):
    """Mondrian multidimensional k-anonymization (LeFevre et al.
    '06) over the (user-bucket, hour-of-day) QI space — the actual
    GENERALIZATION operator, not just the audit: recursive
    median-split partitioning, at each level splitting every region
    with ≥ 2k rows on its widest dimension (ties → user-bucket) at
    the weighted lower median, keeping the split only if both halves
    hold ≥ k rows. k = N//16 + 1 (data-proportional, computed
    identically on both engines). Both QI dims are vocabulary-bounded
    so ONE combiner pass reduces the corpus to the joint histogram
    and the whole recursion is exact integer arithmetic on that
    metadata-sized table; the generated per-level SQL oracle replays
    every split decision bit-for-bit. Output: final regions with
    row counts and generalized ranges."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts"])

    def qi(df: pd.DataFrame) -> pd.DataFrame:
        hod = (df["ts"].astype("datetime64[us]").astype("int64")
               // 3_600_000_000) % 24
        return pd.DataFrame({
            "ub": df["user_id"].to_numpy(np.int64) // 10,
            "hod": hod.to_numpy(np.int64),
            "w": 1}).groupby(["ub", "hod"],
                             sort=False).sum().reset_index()

    hist = grouped_aggregate(
        ds.map_batches(qi, batch_format="pandas", batch_size=8192),
        ["ub", "hod"], {"w": ("w", "sum")},
        result_hint="small").to_pandas().reset_index(drop=True)
    n_total = int(hist["w"].sum())
    k = n_total // 16 + 1
    region = np.zeros(len(hist), dtype=np.int64)
    for _ in range(levels):
        new_region = region * 2
        for r in np.unique(region):
            idx = np.flatnonzero(region == r)
            sub = hist.iloc[idx]
            n = int(sub["w"].sum())
            if n < 2 * k:
                continue
            rng_ub = int(sub["ub"].max()) - int(sub["ub"].min())
            rng_hod = int(sub["hod"].max()) - int(sub["hod"].min())
            dim = "ub" if rng_ub >= rng_hod else "hod"
            marg = sub.groupby(dim)["w"].sum().sort_index()
            cw = marg.cumsum().to_numpy()
            med = int(marg.index[int(np.argmax(cw >= (n + 1) // 2))])
            right = sub[dim].to_numpy(np.int64) > med
            nl = n - int(sub["w"].to_numpy(np.int64)[right].sum())
            if nl >= k and n - nl >= k:
                new_region[idx] = r * 2 + right.astype(np.int64)
        region = new_region
    hist = hist.assign(region=region)
    out = hist.groupby("region").agg(
        n=("w", "sum"), ub_min=("ub", "min"), ub_max=("ub", "max"),
        hod_min=("hod", "min"), hod_max=("hod", "max")) \
        .reset_index().sort_values("region").reset_index(drop=True)
    # every surviving region honors k-anonymity
    assert (out["n"] >= k).all()
    return out.astype("int64")


def _mondrian_oracle_sql(levels: int = 3) -> str:
    """Generated per-level replay of ``q_events_mondrian``: h{l}
    carries (ub, hod, w, r); each level derives per-region ranges,
    weighted lower medians of both dims, the widest-dim choice, the
    both-halves-≥k gate, and the child region codes."""
    sql = """
        WITH h0 AS MATERIALIZED (
            SELECT user_id // 10 AS ub,
                   (epoch_us(ts) // 3600000000) % 24 AS hod,
                   count(*) AS w, CAST(0 AS BIGINT) AS r
            FROM events GROUP BY 1, 2),
        kk AS (SELECT SUM(w) // 16 + 1 AS k FROM h0)"""
    for lv in range(levels):
        sql += f""",
        t{lv} AS MATERIALIZED (
            SELECT r, SUM(w) AS n, max(ub) - min(ub) AS rub,
                   max(hod) - min(hod) AS rhd
            FROM h{lv} GROUP BY r),
        cu{lv} AS (SELECT r, ub AS v, SUM(w) AS wv
                   FROM h{lv} GROUP BY r, ub),
        cc{lv} AS (SELECT r, v, SUM(wv) OVER (
                       PARTITION BY r ORDER BY v) AS cw
                   FROM cu{lv}),
        mu{lv} AS (SELECT cc.r, min(v) AS med
                   FROM cc{lv} cc JOIN t{lv} t ON t.r = cc.r
                   WHERE cc.cw >= (t.n + 1) // 2 GROUP BY cc.r),
        du{lv} AS (SELECT r, hod AS v, SUM(w) AS wv
                   FROM h{lv} GROUP BY r, hod),
        dc{lv} AS (SELECT r, v, SUM(wv) OVER (
                       PARTITION BY r ORDER BY v) AS cw
                   FROM du{lv}),
        mh{lv} AS (SELECT dc.r, min(v) AS med
                   FROM dc{lv} dc JOIN t{lv} t ON t.r = dc.r
                   WHERE dc.cw >= (t.n + 1) // 2 GROUP BY dc.r),
        d{lv} AS MATERIALIZED (
            SELECT t.r, t.n,
                   CASE WHEN t.rub >= t.rhd THEN 0 ELSE 1 END AS dim,
                   CASE WHEN t.rub >= t.rhd
                        THEN mu.med ELSE mh.med END AS med
            FROM t{lv} t
            JOIN mu{lv} mu ON mu.r = t.r
            JOIN mh{lv} mh ON mh.r = t.r),
        nl{lv} AS (SELECT h.r, SUM(h.w) AS nl
                   FROM h{lv} h JOIN d{lv} d ON d.r = h.r
                   WHERE (d.dim = 0 AND h.ub <= d.med)
                      OR (d.dim = 1 AND h.hod <= d.med)
                   GROUP BY h.r),
        s{lv} AS MATERIALIZED (
            SELECT d.r, d.dim, d.med,
                   (d.n >= 2 * (SELECT k FROM kk)
                    AND nl.nl >= (SELECT k FROM kk)
                    AND d.n - nl.nl >= (SELECT k FROM kk)) AS split
            FROM d{lv} d JOIN nl{lv} nl ON nl.r = d.r),
        h{lv + 1} AS MATERIALIZED (
            SELECT h.ub, h.hod, h.w,
                   h.r * 2 + CASE WHEN s.split AND (
                       (s.dim = 0 AND h.ub > s.med)
                       OR (s.dim = 1 AND h.hod > s.med))
                       THEN 1 ELSE 0 END AS r
            FROM h{lv} h JOIN s{lv} s ON s.r = h.r)"""
    return sql + f"""
        SELECT r AS region, CAST(SUM(w) AS BIGINT) AS n,
               min(ub) AS ub_min, max(ub) AS ub_max,
               min(hod) AS hod_min, max(hod) AS hod_max
        FROM h{levels} GROUP BY r ORDER BY r"""


def q_events_voptimal(sf_dir: str, *, buckets: int = 4):
    """V-optimal-style histogram construction (Jagadish et al. '98's
    DP shape — the optimizer-statistics bucketing primitive):
    partition the 24-point hour-of-day count series into 4 contiguous
    buckets minimizing the COUNT-WEIGHTED SSE, scaled integer form
    len·Σy² − (Σy)² per segment so the whole DP is exact integer
    arithmetic (no float compare anywhere); ties take the smallest
    split. ONE vocabulary-bounded combiner pass reduces the corpus to
    24 rows; the B×24 DP runs on the driver and the generated SQL
    stage oracle replays costs, argmins, and the backtracked bucket
    boundaries bit-for-bit."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        hod = (df["ts"].astype("datetime64[us]").astype("int64")
               // 3_600_000_000) % 24
        v, c = np.unique(hod.to_numpy(np.int64), return_counts=True)
        return pd.DataFrame({"hod": v, "y": c.astype(np.int64)})

    h = grouped_aggregate(
        ds.map_batches(partial, batch_format="pandas",
                       batch_size=65536),
        ["hod"], {"y": ("y", "sum")},
        result_hint="small").to_pandas().sort_values("hod")
    y = np.zeros(24, dtype=object)
    y[h["hod"].to_numpy(np.int64)] = [int(v) for v in h["y"]]
    ps = np.concatenate([[0], np.cumsum(y)])          # prefix sums
    ps2 = np.concatenate([[0], np.cumsum([v * v for v in y])])

    def seg(i: int, j: int) -> int:                  # 1-indexed incl
        n = j - i + 1
        s = int(ps[j] - ps[i - 1])
        ss = int(ps2[j] - ps2[i - 1])
        return n * ss - s * s

    INF = 1 << 62
    cost = [[INF] * 25 for _ in range(buckets + 1)]
    best = [[0] * 25 for _ in range(buckets + 1)]
    for i in range(1, 25):
        cost[1][i] = seg(1, i)
    for b in range(2, buckets + 1):
        for i in range(b, 25):
            bc, bj = INF, 0
            for j in range(b - 1, i):
                c = cost[b - 1][j] + seg(j + 1, i)
                if c < bc:
                    bc, bj = c, j
            cost[b][i], best[b][i] = bc, bj
    bounds = [24]
    for b in range(buckets, 1, -1):
        bounds.append(best[b][bounds[-1]])
    bounds.append(0)
    bounds = bounds[::-1]                            # 0, j1, .., 24
    rows = []
    for b in range(buckets):
        i, j = bounds[b] + 1, bounds[b + 1]
        rows.append((b + 1, i - 1, j - 1, j - i + 1, seg(i, j)))
    return pd.DataFrame(rows, columns=[
        "bucket", "h_start", "h_end", "n_hours", "sse_scaled"]) \
        .astype("int64")


def _voptimal_oracle_sql(buckets: int = 4) -> str:
    """Generated DP replay of ``q_events_voptimal``: prefix sums over
    the padded 24-hour grid, seg cost as a pure integer expression,
    one CTE per bucket level keeping the (cost ASC, split ASC)
    row_number-1 candidate per endpoint, then backtracked bounds."""
    sql = """
        WITH hrs AS (SELECT unnest(range(24)) AS h),
        raw AS (SELECT (epoch_us(ts) // 3600000000) % 24 AS h,
                       count(*) AS y
                FROM events GROUP BY 1),
        grid AS MATERIALIZED (
            SELECT hrs.h + 1 AS i, coalesce(raw.y, 0) AS y
            FROM hrs LEFT JOIN raw ON raw.h = hrs.h),
        pre AS MATERIALIZED (
            SELECT i, y,
                   SUM(y) OVER (ORDER BY i) AS s,
                   SUM(y * y) OVER (ORDER BY i) AS s2
            FROM grid),
        pre0 AS MATERIALIZED (
            SELECT i, s, s2 FROM pre
            UNION ALL SELECT 0, 0, 0),
        segc AS MATERIALIZED (
            SELECT lo.i + 1 AS i, hi.i AS j,
                   (hi.i - lo.i) * (hi.s2 - lo.s2)
                   - (hi.s - lo.s) * (hi.s - lo.s) AS c
            FROM pre0 lo JOIN pre0 hi ON lo.i < hi.i),
        c1 AS MATERIALIZED (
            SELECT j AS i, c AS cost, 0 AS bj
            FROM segc WHERE i = 1)"""
    for b in range(2, buckets + 1):
        sql += f""",
        c{b} AS MATERIALIZED (
            SELECT i, cost, bj FROM (
                SELECT s.j AS i, p.cost + s.c AS cost, p.i AS bj,
                       row_number() OVER (
                           PARTITION BY s.j
                           ORDER BY p.cost + s.c ASC, p.i ASC) AS rn
                FROM c{b - 1} p JOIN segc s ON s.i = p.i + 1
                WHERE p.i >= {b - 1})
            WHERE rn = 1)"""
    # backtrack the bounds b{buckets}..b1 (b{k} = end of bucket k)
    sql += f""",
        bt{buckets} AS (SELECT CAST(24 AS BIGINT) AS e)"""
    for b in range(buckets, 1, -1):
        sql += f""",
        bt{b - 1} AS (SELECT c{b}.bj AS e
                      FROM c{b}, bt{b} WHERE c{b}.i = bt{b}.e)"""
    sql += """,
        bt0 AS (SELECT CAST(0 AS BIGINT) AS e)"""
    parts = []
    for b in range(1, buckets + 1):
        parts.append(f"""
            SELECT CAST({b} AS BIGINT) AS bucket,
                   CAST(lo.e AS BIGINT) AS h_start,
                   CAST(hi.e - 1 AS BIGINT) AS h_end,
                   CAST(hi.e - lo.e AS BIGINT) AS n_hours,
                   CAST(s.c AS BIGINT) AS sse_scaled
            FROM bt{b - 1} lo CROSS JOIN bt{b} hi
            JOIN segc s ON s.i = lo.e + 1 AND s.j = hi.e""")
    return sql + "\nSELECT * FROM (" \
        + "\nUNION ALL ".join(parts) + ") ORDER BY bucket"


def q_part_mst(sf_dir: str, *, oracle_rounds: int = 6,
               min_cocount: int = 2):
    """Minimum spanning forest of the repeat co-purchase graph by
    synchronized Borůvka rounds (Borůvka 1926 / GHS '83 — the
    log-round component-hooking MST every distributed engine runs;
    ``ops/graph.boruvka_mst``). Edge weight = 1 + md5_64("a|b") % 97
    (the SQL-replayable ``md5_hash64`` contract); the effective
    weight is the STRICT total order (w, a, b), so the forest is
    unique and equal to Kruskal's under the same key — pinned by a
    serial-Kruskal pytest AND by the per-round CTE oracle, which
    replays every component's minimum outgoing edge and the
    min-label contraction closure. Per round: one streaming pass
    over the never-moving edge Dataset with the node-bounded label
    map broadcast via ``ray.put``; only (components × blocks)
    lexmin partials reach the driver. Asserts convergence within
    the oracle's unrolled depth (the ``q_part_sssp`` contract)."""
    from jerex_ray.ops.graph import boruvka_mst
    from jerex_ray.util import md5_hash64_batch
    configure_data_context()
    edges = _repeat_copurchase_edges(sf_dir, min_cocount=min_cocount)

    def with_w(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "a" not in df.columns:
            return pd.DataFrame({"a": pd.Series(dtype="int64"),
                                 "b": pd.Series(dtype="int64"),
                                 "w": pd.Series(dtype="int64")})
        a = df["a"].to_numpy(np.int64)
        b = df["b"].to_numpy(np.int64)
        w = 1 + (md5_hash64_batch(
            [f"{x}|{y}" for x, y in zip(a, b)]) % 97).astype(np.int64)
        return pd.DataFrame({"a": a, "b": b, "w": w})

    wedges = edges.map_batches(with_w, batch_format="pandas")
    out = boruvka_mst(wedges, max_rounds=32)
    if len(out):
        rounds = int(out["round"].max())
        assert rounds <= oracle_rounds, \
            f"MST finished at round {rounds} > oracle depth " \
            f"{oracle_rounds}"
    return out


def _mst_oracle_sql(rounds: int = 6, min_cocount: int = 2) -> str:
    """Per-round Borůvka replay of ``q_part_mst``: the thresholded
    co-purchase edge CTE with md5-derived weights, then per round a
    cross-edge CTE under the current labeling, the per-component
    rank-1 pick over both orientations ordered by the strict key
    (w, a, b), the deduped chosen set, and the min-label contraction
    via a recursive reachability closure over the hook edges. Any
    unroll depth ≥ the engine's asserted convergence round yields
    the identical (unique) forest."""
    sql = f"""
        WITH RECURSIVE inc AS MATERIALIZED (
            SELECT DISTINCT l_orderkey AS o, l_partkey AS p
            FROM lineitem),
        e0 AS MATERIALIZED (
            SELECT a.p AS a, b.p AS b
            FROM inc a JOIN inc b ON a.o = b.o AND a.p < b.p
            GROUP BY a.p, b.p HAVING count(*) >= {min_cocount}),
        we AS MATERIALIZED (
            SELECT a, b, CAST(1 + CAST('0x' || substr(md5(
                       CAST(a AS VARCHAR) || '|' || CAST(b AS VARCHAR)),
                       1, 16) AS UBIGINT) % 97 AS BIGINT) AS w
            FROM e0),
        lab1 AS MATERIALIZED (
            SELECT u AS node, u AS c FROM (
                SELECT a AS u FROM we UNION SELECT b FROM we))"""
    for r in range(1, rounds + 1):
        sql += f""",
        x{r} AS MATERIALIZED (
            SELECT e.a, e.b, e.w, la.c AS ca, lb.c AS cb
            FROM we e JOIN lab{r} la ON la.node = e.a
                      JOIN lab{r} lb ON lb.node = e.b
            WHERE la.c <> lb.c),
        pick{r} AS MATERIALIZED (
            SELECT a, b FROM (
                SELECT c, a, b, row_number() OVER (
                        PARTITION BY c ORDER BY w, a, b) AS rn
                FROM (SELECT ca AS c, a, b, w FROM x{r}
                      UNION ALL SELECT cb, a, b, w FROM x{r}))
            WHERE rn = 1),
        ch{r} AS MATERIALIZED (
            SELECT DISTINCT x.a, x.b, x.w, x.ca, x.cb
            FROM x{r} x JOIN (SELECT DISTINCT a, b FROM pick{r}) p
                 ON p.a = x.a AND p.b = x.b),
        hk{r} AS MATERIALIZED (
            SELECT ca AS u, cb AS v FROM ch{r}
            UNION SELECT cb, ca FROM ch{r}),
        rc{r} AS (
            SELECT u AS root, u AS node FROM (
                SELECT DISTINCT u FROM hk{r})
            UNION
            SELECT rc{r}.root, h.v
            FROM rc{r} JOIN hk{r} h ON h.u = rc{r}.node),
        nl{r} AS MATERIALIZED (
            SELECT root AS c, min(node) AS newc
            FROM rc{r} GROUP BY root),
        lab{r + 1} AS MATERIALIZED (
            SELECT l.node, coalesce(n.newc, l.c) AS c
            FROM lab{r} l LEFT JOIN nl{r} n ON n.c = l.c)"""
    parts = [f"""
        SELECT a, b, w, CAST({r} AS BIGINT) AS round FROM ch{r}"""
             for r in range(1, rounds + 1)]
    return sql + "\nSELECT * FROM (" \
        + "\nUNION ALL ".join(parts) + ") ORDER BY a, b"


def q_events_scc(sf_dir: str):
    """Strongly connected components and condensation depth of the
    DOMINANT-FLOW event-type graph (Tarjan '72 — the directed-graph
    decomposition the rest of the graph family lacks): directed edge
    u→v iff strictly more users transition u→v than v→u (ties and
    self-loops drop, so the graph is an orientation of the type
    tournament and SCCs are its dominance cycles). ONE per-user
    co-location pass reduces the corpus to the |types|² transition
    count table (``ops/windows.transition_matrix``'s combiner); the
    SCC recursion and the condensation longest-path layering both
    run driver-side on that metadata-sized table — the Viterbi/DTW
    convention. Returns (etype, scc_id = lexicographically smallest
    member, scc_size, layer = longest condensation path ENDING at
    the SCC), all deterministic; the oracle replays reachability
    with a recursive closure and mutual-reach min, and the layers
    with a recursive path-length walk over the condensation DAG."""
    from jerex_ray.ops.windows import transition_matrix
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts",
                                     "event_type"])
    from jerex_ray.ops.graph import scc_condensation
    tm = transition_matrix(ds, key="user_id", ts_col="ts",
                           id_col="event_id", type_col="event_type")
    types = sorted(set(tm["prev_type"]) | set(tm["next_type"]))
    cnt = {(p, n): int(c) for p, n, c in
           zip(tm["prev_type"], tm["next_type"], tm["cnt"])}
    edges = [(p, n) for (p, n), c in cnt.items()
             if p != n and c > cnt.get((n, p), 0)]
    out = scc_condensation(types, edges)
    return out.rename(columns={"node": "etype"})


_SCC_ORACLE_SQL = """
    WITH RECURSIVE seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (
                   PARTITION BY user_id
                   ORDER BY ts, event_id) AS nxt
        FROM events),
    t AS MATERIALIZED (
        SELECT event_type AS p, nxt AS n, count(*) AS c
        FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2),
    nodes AS MATERIALIZED (
        SELECT p AS t FROM t UNION SELECT n FROM t),
    dom AS MATERIALIZED (
        SELECT a.p AS u, a.n AS v
        FROM t a LEFT JOIN t b ON b.p = a.n AND b.n = a.p
        WHERE a.p <> a.n AND a.c > coalesce(b.c, 0)),
    reach AS (
        SELECT t AS src, t AS dst FROM nodes
        UNION
        SELECT reach.src, dom.v
        FROM reach JOIN dom ON dom.u = reach.dst),
    scc AS MATERIALIZED (
        SELECT a.src AS t, min(a.dst) AS scc_id
        FROM reach a JOIN reach b
             ON a.dst = b.src AND b.dst = a.src
        GROUP BY a.src),
    sz AS (SELECT scc_id, count(*) AS scc_size
           FROM scc GROUP BY scc_id),
    ced AS MATERIALIZED (
        SELECT DISTINCT su.scc_id AS u, sv.scc_id AS v
        FROM dom JOIN scc su ON su.t = dom.u
                 JOIN scc sv ON sv.t = dom.v
        WHERE su.scc_id <> sv.scc_id),
    lp AS (
        SELECT scc_id AS c, 0 AS l FROM sz
        UNION
        SELECT ced.v, lp.l + 1
        FROM lp JOIN ced ON ced.u = lp.c),
    lay AS (SELECT c, max(l) AS layer FROM lp GROUP BY c)
    SELECT scc.t AS etype, scc.scc_id,
           CAST(sz.scc_size AS BIGINT) AS scc_size,
           CAST(lay.layer AS BIGINT) AS layer
    FROM scc JOIN sz ON sz.scc_id = scc.scc_id
             JOIN lay ON lay.c = scc.scc_id
    ORDER BY etype"""


def q_events_matrix_profile(sf_dir: str, *, m: int = 24):
    """Matrix profile of the hourly event-count series (Yeh et al.
    '16's all-pairs-similarity-search shape, kept EXACT): for every
    length-``m`` window the nearest other window under the
    UNNORMALIZED squared Euclidean distance — integer counts make
    every distance an exact integer, so argmin decisions carry no
    float hazard and the SQL oracle lands bit-for-bit. The standard
    trivial-match exclusion zone |i−j| < m applies; ties take the
    smallest neighbor index. Discord (max) and motif (min) rows of
    this table are the anomaly/repetition audit.

    Scale shape: ONE time-bounded combiner pass reduces the corpus
    to the zero-filled hour grid; the O(n·m) distance work runs
    driver-side on that metadata-sized series via one integer
    Gram matmul of the sliding-window matrix (dist² = ssq_i + ssq_j
    − 2·W_i·W_j) — the DTW/burst-DP convention."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = (df["ts"].astype("datetime64[us]").astype("int64")
             // 3_600_000_000)
        v, c = np.unique(h.to_numpy(np.int64), return_counts=True)
        return pd.DataFrame({"h": v, "y": c.astype(np.int64)})

    g = grouped_aggregate(
        ds.map_batches(partial, batch_format="pandas",
                       batch_size=65536),
        ["h"], {"y": ("y", "sum")}, result_hint="small").to_pandas()
    empty = pd.DataFrame({"w_start": pd.Series(dtype="int64"),
                          "nn_start": pd.Series(dtype="int64"),
                          "dist2": pd.Series(dtype="int64")})
    if g.empty or "h" not in g.columns:
        return empty
    h0 = int(g["h"].min())
    T = int(g["h"].max()) - h0 + 1
    y = np.zeros(T, dtype=np.int64)
    y[g["h"].to_numpy(np.int64) - h0] = g["y"].to_numpy(np.int64)
    n = T - m + 1
    if n < m + 1:            # no window has a non-trivial neighbor
        return empty
    W = np.lib.stride_tricks.sliding_window_view(y, m).astype(np.int64)
    ssq = (W * W).sum(axis=1)
    D = ssq[:, None] + ssq[None, :] - 2 * (W @ W.T)
    ii = np.arange(n)
    D[np.abs(ii[:, None] - ii[None, :]) < m] = np.iinfo(np.int64).max
    nn = D.argmin(axis=1)          # first minimum = smallest j tie
    return pd.DataFrame({
        "w_start": ii.astype(np.int64),
        "nn_start": nn.astype(np.int64),
        "dist2": D[ii, nn].astype(np.int64)})


def _matrix_profile_oracle_sql(m: int = 24) -> str:
    """Replay of ``q_events_matrix_profile``: the zero-filled hour
    grid, a starts × starts × k three-way join summing the exact
    integer squared differences outside the |i−j| < m exclusion
    zone, then the (dist2, j) rank-1 neighbor per window."""
    return f"""
        WITH b AS (SELECT min(epoch_us(ts) // 3600000000) AS h0,
                          max(epoch_us(ts) // 3600000000) AS h1
                   FROM events),
        hrs AS (SELECT unnest(range(0, CAST(h1 - h0 + 1 AS BIGINT)))
                       AS h FROM b),
        raw AS (SELECT epoch_us(ts) // 3600000000
                       - (SELECT h0 FROM b) AS h, count(*) AS y
                FROM events GROUP BY 1),
        grid AS MATERIALIZED (
            SELECT hrs.h, coalesce(raw.y, 0) AS y
            FROM hrs LEFT JOIN raw ON raw.h = hrs.h),
        starts AS (SELECT h AS i FROM grid
                   WHERE h <= (SELECT max(h) FROM grid) - {m - 1}),
        d AS MATERIALIZED (
            SELECT s1.i, s2.i AS j,
                   sum((g1.y - g2.y) * (g1.y - g2.y)) AS d2
            FROM starts s1 JOIN starts s2
                 ON abs(s1.i - s2.i) >= {m}
                 JOIN grid g1 ON g1.h >= s1.i AND g1.h < s1.i + {m}
                 JOIN grid g2 ON g2.h = s2.i + (g1.h - s1.i)
            GROUP BY s1.i, s2.i)
        SELECT CAST(i AS BIGINT) AS w_start,
               CAST(j AS BIGINT) AS nn_start,
               CAST(d2 AS BIGINT) AS dist2
        FROM (SELECT i, j, d2, row_number() OVER (
                  PARTITION BY i ORDER BY d2, j) AS rn FROM d)
        WHERE rn = 1 ORDER BY w_start"""


def q_events_emd(sf_dir: str):
    """1-D Wasserstein / earth-mover's distance (Monge 1781; the
    optimal-transport drift metric completing the KL/PSI/TVD/KS
    distance family) between the hour-of-day profiles of the top-2
    event types (count DESC, name ASC — the DTW pick): on the line
    with unit bin spacing EMD = Σ_h |CDF_A(h) − CDF_B(h)|, kept
    EXACT by cross-multiplying the integer cumulative counts
    (Σ_h |cumA·n_B − cumB·n_A|, one final divide by n_A·n_B). ONE
    vocabulary-bounded combiner pass crosses the cluster; the 24-bin
    arithmetic runs on the driver."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["ts", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (pd.DataFrame({
            "event_type": df["event_type"],
            "h": df["ts"].dt.hour.astype("int64")})
            .groupby(["event_type", "h"], sort=False)
            .size().reset_index(name="c"))

    counts = grouped_aggregate(
        ds.map_batches(partial, batch_format="pandas",
                       batch_size=65536),
        ["event_type", "h"], {"c": ("c", "sum")},
        result_hint="small").to_pandas()
    tot = counts.groupby("event_type")["c"].sum().reset_index()
    tot = tot.sort_values(["c", "event_type"],
                          ascending=[False, True])
    ta, tb = str(tot["event_type"].iloc[0]), \
        str(tot["event_type"].iloc[1])

    def profile(t: str) -> np.ndarray:
        g = counts[counts["event_type"] == t]
        y = np.zeros(24, dtype=np.int64)
        y[g["h"].to_numpy(np.int64)] = g["c"].to_numpy(np.int64)
        return y

    a, b = profile(ta), profile(tb)
    na, nb = int(a.sum()), int(b.sum())
    ca, cb = np.cumsum(a), np.cumsum(b)
    emd_scaled = int(np.abs(ca * nb - cb * na).sum())
    return pd.DataFrame({
        "type_a": [ta], "type_b": [tb],
        "n_a": np.array([na], dtype=np.int64),
        "n_b": np.array([nb], dtype=np.int64),
        "emd_scaled": np.array([emd_scaled], dtype=np.int64),
        "emd": [round(emd_scaled / (na * nb), 6)]})


_EMD_ORACLE_SQL = """
    WITH hc AS MATERIALIZED (
        SELECT event_type, CAST(hour(ts) AS BIGINT) AS h,
               count(*) AS c
        FROM events GROUP BY 1, 2),
    top2 AS (SELECT event_type,
                    row_number() OVER (ORDER BY sum(c) DESC,
                                       event_type ASC) AS rk
             FROM hc GROUP BY event_type QUALIFY rk <= 2),
    hrs AS (SELECT unnest(range(24)) AS h),
    grid AS MATERIALIZED (
        SELECT t.rk, hrs.h, coalesce(hc.c, 0) AS c
        FROM top2 t CROSS JOIN hrs
        LEFT JOIN hc ON hc.event_type = t.event_type
                    AND hc.h = hrs.h),
    cum AS MATERIALIZED (
        SELECT rk, h, SUM(c) OVER (PARTITION BY rk ORDER BY h)
                      AS cs
        FROM grid),
    n AS (SELECT sum(CASE WHEN rk = 1 THEN c END) AS na,
                 sum(CASE WHEN rk = 2 THEN c END) AS nb
          FROM grid),
    e AS (SELECT sum(abs(a.cs * n.nb - b.cs * n.na)) AS emd_scaled
          FROM cum a JOIN cum b ON a.h = b.h
                     AND a.rk = 1 AND b.rk = 2
          CROSS JOIN n)
    SELECT (SELECT event_type FROM top2 WHERE rk = 1) AS type_a,
           (SELECT event_type FROM top2 WHERE rk = 2) AS type_b,
           CAST(n.na AS BIGINT) AS n_a,
           CAST(n.nb AS BIGINT) AS n_b,
           CAST(e.emd_scaled AS BIGINT) AS emd_scaled,
           round(e.emd_scaled / (n.na * n.nb * 1.0), 6) AS emd
    FROM n CROSS JOIN e"""


def doc_vocab_coverage(sf_dir: str):
    """Species-richness and coverage estimators over the corpus
    vocabulary: Chao1 richness (Chao '84, bias-corrected form
    S + f1·(f1−1)/(2·(f2+1)) — defined even with no doubletons) and
    Good-Turing unseen-mass estimate f1/N (Good '53) — the 'how much
    vocabulary haven't we crawled yet' audit for corpus growth.
    f1/f2 are singleton/doubleton counts from ONE distributed
    word-count combiner pass; everything after is exact integer
    arithmetic plus two final divides (identical expressions on both
    engines)."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["text"])

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        words = batch["text"].fillna("").str.lower().str.split()
        lens = words.str.len().fillna(0).to_numpy(dtype=np.int64)
        if lens.sum() == 0:
            return pd.DataFrame({"w": pd.Series(dtype="object"),
                                 "c": pd.Series(dtype="int64")})
        flat = np.concatenate([w for w in words.to_numpy() if w])
        u, c = np.unique(flat, return_counts=True)
        return pd.DataFrame({"w": u, "c": c.astype(np.int64)})

    wc = grouped_aggregate(
        ds.map_batches(explode, batch_format="pandas",
                       batch_size=4096),
        ["w"], {"n": ("c", "sum")}).to_pandas()
    n = wc["n"].to_numpy(np.int64)
    N = int(n.sum())
    S = int(len(n))
    f1 = int((n == 1).sum())
    f2 = int((n == 2).sum())
    return pd.DataFrame({
        "n_tokens": np.array([N], dtype=np.int64),
        "vocab": np.array([S], dtype=np.int64),
        "f1": np.array([f1], dtype=np.int64),
        "f2": np.array([f2], dtype=np.int64),
        "chao1": [round(S + f1 * (f1 - 1) / (2.0 * (f2 + 1)), 6)],
        "gt_unseen_mass": [round(f1 / (N * 1.0), 6)]})


_VOCAB_COVERAGE_ORACLE_SQL = """
    WITH w AS (
        SELECT unnest(list_filter(
            regexp_split_to_array(lower(coalesce(text, '')), '\\s+'),
            x -> x <> '')) AS word
        FROM documents),
    c AS (SELECT word, count(*) AS n FROM w GROUP BY word),
    s AS (SELECT CAST(sum(n) AS BIGINT) AS n_tokens,
                 CAST(count(*) AS BIGINT) AS vocab,
                 CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS f1,
                 CAST(sum(CASE WHEN n = 2 THEN 1 ELSE 0 END)
                      AS BIGINT) AS f2
          FROM c)
    SELECT n_tokens, vocab, f1, f2,
           round(vocab + f1 * (f1 - 1) / (2.0 * (f2 + 1)), 6)
               AS chao1,
           round(f1 / (n_tokens * 1.0), 6) AS gt_unseen_mass
    FROM s"""


def q_events_huffman(sf_dir: str, *, oracle_merges: int = 4):
    """Huffman code lengths (Huffman '52 — the optimal-prefix-code
    source-coding audit beside the front-coding/varint dictionary
    family) over the event-type frequency table: greedy merge of the
    two smallest trees under the STRICT key (weight, min-member
    symbol), new tree id = min member — fully deterministic, so the
    generated per-merge CTE oracle replays every pick bit-for-bit.
    ONE vocabulary-bounded combiner pass crosses the cluster; the
    |types|−1 merge loop runs driver-side on that metadata-sized
    table. Returns (etype, cnt, code_len, bits = cnt·code_len);
    Kraft equality Σ 2^−len = 1 and the Shannon H ≤ L̄ < H+1 bound
    are pytest-pinned. Asserts the type count matches the oracle's
    unrolled merge depth (the ``q_part_mst`` contract)."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_type"])
    cnt = grouped_aggregate(
        ds, ["event_type"], {"cnt": (None, "count")},
        result_hint="small").to_pandas().sort_values("event_type")
    types = [str(t) for t in cnt["event_type"]]
    ws = {t: int(c) for t, c in zip(types, cnt["cnt"])}
    assert len(types) == oracle_merges + 1, \
        f"{len(types)} types != oracle merge depth {oracle_merges}+1"

    # greedy merges under the strict (weight, id) key
    active = {t: ws[t] for t in types}          # id -> weight
    depth = dict.fromkeys(types, 0)             # symbol -> code len
    members = {t: [t] for t in types}           # id -> symbols
    while len(active) > 1:
        (i1, w1), (i2, w2) = sorted(
            active.items(), key=lambda kv: (kv[1], kv[0]))[:2]
        for s in members[i1] + members[i2]:
            depth[s] += 1
        nid = min(i1, i2)
        members[nid] = members.pop(i1) + members.pop(i2)
        del active[i1], active[i2]
        active[nid] = w1 + w2
    return pd.DataFrame({
        "etype": types,
        "cnt": np.array([ws[t] for t in types], dtype=np.int64),
        "code_len": np.array([depth[t] for t in types],
                             dtype=np.int64),
        "bits": np.array([ws[t] * depth[t] for t in types],
                         dtype=np.int64)})


def _huffman_oracle_sql(merges: int = 4) -> str:
    """Per-merge replay of ``q_events_huffman``: rank the active
    trees by the strict (weight, id) key, merge ranks 1–2 into a
    tree keyed by the smaller id, and bump the merged members'
    depths — one CTE triple per merge."""
    sql = """
        WITH a1 AS MATERIALIZED (
            SELECT event_type AS id, count(*) AS w
            FROM events GROUP BY 1),
        mb1 AS MATERIALIZED (
            SELECT id AS owner, id AS sym, 0 AS d FROM a1)"""
    for r in range(1, merges + 1):
        sql += f""",
        rk{r} AS MATERIALIZED (
            SELECT id, w, row_number() OVER (ORDER BY w, id) AS rn
            FROM a{r}),
        a{r + 1} AS MATERIALIZED (
            SELECT id, w FROM rk{r} WHERE rn > 2
            UNION ALL
            SELECT min(id), sum(w) FROM rk{r} WHERE rn <= 2),
        mb{r + 1} AS MATERIALIZED (
            SELECT CASE WHEN m.owner IN (
                       SELECT id FROM rk{r} WHERE rn <= 2)
                   THEN (SELECT min(id) FROM rk{r} WHERE rn <= 2)
                   ELSE m.owner END AS owner,
                   m.sym,
                   m.d + CASE WHEN m.owner IN (
                       SELECT id FROM rk{r} WHERE rn <= 2)
                   THEN 1 ELSE 0 END AS d
            FROM mb{r} m)"""
    return sql + f"""
        SELECT m.sym AS etype, CAST(a.w AS BIGINT) AS cnt,
               CAST(m.d AS BIGINT) AS code_len,
               CAST(a.w * m.d AS BIGINT) AS bits
        FROM mb{merges + 1} m JOIN a1 a ON a.id = m.sym
        ORDER BY etype"""


def doc_budget_knapsack(sf_dir: str, *, n_items: int = 12):
    """0/1-knapsack value function (Bellman '57 DP) for
    budget-constrained corpus selection: over the ``n_items``
    longest documents (n_tokens DESC, doc_id ASC — strict order),
    maximize total DISTINCT-WORD count (the diversity payoff) under
    a token budget B = ⌊Σ weights / 2⌋. Everything is exact integer
    arithmetic; the result is the full value function (budget,
    best_value) for budget 0..B — the selection frontier a curator
    reads the knee from, with no backtrack-ambiguity surface.

    Scale shape: per-doc (tokens, distinct words) come from the
    vectorized per-doc stats pass; the item list is a per-block
    top-k reduced on the driver (k-bounded), and the
    items × budget DP runs driver-side on that metadata-sized
    table — the V-optimal/Viterbi convention. The generated oracle
    replays the DP with one CTE per item."""
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.split()
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(),
            "w": toks.str.len().fillna(0).astype(np.int64),
            "v": np.array([len(set(x.lower() for x in t))
                           for t in toks], dtype=np.int64)})

    def block_top(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["w", "doc_id"],
                              ascending=[False, True],
                              kind="mergesort").head(n_items)

    per_block = ds.map_batches(stats, batch_format="pandas",
                               batch_size=8192) \
        .map_batches(block_top, batch_format="pandas").to_pandas()
    items = per_block.sort_values(["w", "doc_id"],
                                  ascending=[False, True],
                                  kind="mergesort").head(n_items)
    ws = items["w"].to_numpy(np.int64)
    vs = items["v"].to_numpy(np.int64)
    B = int(ws.sum()) // 2
    best = np.zeros(B + 1, dtype=np.int64)
    for wi, vi in zip(ws, vs):
        if wi <= B:
            upd = best[:B + 1 - wi] + vi
            best[wi:] = np.maximum(best[wi:], upd)
    return pd.DataFrame({
        "budget": np.arange(B + 1, dtype=np.int64),
        "best_value": best})


def _knapsack_oracle_sql(n_items: int = 12) -> str:
    """Per-item DP replay of ``doc_budget_knapsack``: the strict
    (n_tokens DESC, doc_id ASC) item ranking, B = Σw // 2, a budget
    spine CTE, then one max(skip, take) CTE per item."""
    val = ("array_length(list_distinct(list_filter("
           "regexp_split_to_array(lower(coalesce(text, '')), "
           "'\\s+'), x -> x <> '')))")
    sql = f"""
        WITH it AS MATERIALIZED (
            SELECT doc_id, {_N_TOKENS_SQL} AS w, {val} AS v,
                   row_number() OVER (
                       ORDER BY {_N_TOKENS_SQL} DESC, doc_id ASC)
                       AS rk
            FROM documents QUALIFY rk <= {n_items}),
        bmax AS (SELECT CAST(sum(w) // 2 AS BIGINT) AS b FROM it),
        caps AS (SELECT unnest(range(0, b + 1)) AS cap FROM bmax),
        k0 AS (SELECT cap, CAST(0 AS BIGINT) AS best FROM caps)"""
    for i in range(1, n_items + 1):
        sql += f""",
        k{i} AS MATERIALIZED (
            SELECT p.cap, greatest(p.best,
                       coalesce(t.best + (SELECT v FROM it
                                          WHERE rk = {i}), 0))
                       AS best
            FROM k{i - 1} p
            LEFT JOIN k{i - 1} t
                 ON t.cap = p.cap - (SELECT w FROM it WHERE rk = {i}))"""
    return sql + f"""
        SELECT cap AS budget, best AS best_value
        FROM k{n_items} ORDER BY budget"""


def q_part_item_cosine(sf_dir: str, *, k: int = 5,
                       min_cocount: int = 2):
    """Item-item cosine kNN (Sarwar et al. '01 — the neighborhood
    collaborative-filtering primitive beside the ALS factor step):
    over the binary part × order incidence, cos(a,b) =
    n_ab / √(d_a·d_b) with n_ab = orders containing both and d =
    the part's distinct-order degree; per part the top-``k``
    neighbors by (cos DESC, neighbor ASC). The ONLY float is the
    single-divide score n²/(d_a·d_b) — one identical expression on
    both engines, so the rank cut is deterministic (the t-closeness
    identical-double convention); the reported cos rounds to 6.

    Scale shape: pair counts come from the per-order co-location
    combiner (the thresholded ``_repeat_copurchase_edges`` pass),
    degrees from a distinct-incidence combiner broadcast as a
    node-bounded map, and the top-k cut is per-block exact after ONE
    hash co-location by center part."""
    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
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
    edges = cnt.map_batches(
        lambda df: df[df["n"] >= min_cocount]
        if "a" in df.columns else df, batch_format="pandas")

    deg = grouped_aggregate(
        li.map_batches(
            lambda df: df.drop_duplicates(
                ["l_orderkey", "l_partkey"]).rename(
                columns={"l_partkey": "p"})[["p"]],
            batch_format="pandas"),
        ["p"], {"d": (None, "count")}).to_pandas()
    dmap = dict(zip(deg["p"].astype("int64"),
                    deg["d"].astype("int64")))
    import ray
    dref = ray.put(dmap)

    def both_dirs(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "a" not in df.columns:
            return pd.DataFrame({"p": pd.Series(dtype="int64"),
                                 "nbr": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64")})
        a = df["a"].to_numpy(np.int64)
        b = df["b"].to_numpy(np.int64)
        n = df["n"].to_numpy(np.int64)
        return pd.DataFrame({"p": np.r_[a, b], "nbr": np.r_[b, a],
                             "n": np.r_[n, n]})

    def topk_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({
                "p": pd.Series(dtype="int64"),
                "nbr": pd.Series(dtype="int64"),
                "n_common": pd.Series(dtype="int64"),
                "cos": pd.Series(dtype="float64")})
        dm = ray.get(dref)
        da = df["p"].map(dm).to_numpy(np.int64)
        db = df["nbr"].map(dm).to_numpy(np.int64)
        n = df["n"].to_numpy(np.int64)
        score = (n * n) / (da * db)          # the one shared divide
        out = df.assign(score=score)
        out = out.sort_values(["p", "score", "nbr"],
                              ascending=[True, False, True],
                              kind="mergesort")
        out = out.groupby("p", sort=False).head(k)
        return pd.DataFrame({
            "p": out["p"].to_numpy(np.int64),
            "nbr": out["nbr"].to_numpy(np.int64),
            "n_common": out["n"].to_numpy(np.int64),
            "cos": np.round(np.sqrt(out["score"].to_numpy()), 6)})

    out = grouped_apply(edges.map_batches(
        both_dirs, batch_format="pandas"), ["p"], topk_block) \
        .to_pandas()
    if out.empty or "p" not in out.columns:
        return pd.DataFrame({"p": pd.Series(dtype="int64"),
                             "nbr": pd.Series(dtype="int64"),
                             "n_common": pd.Series(dtype="int64"),
                             "cos": pd.Series(dtype="float64")})
    return out.sort_values(["p", "nbr"]).reset_index(drop=True)


def _item_cosine_oracle_sql(k: int = 5, min_cocount: int = 2) -> str:
    return f"""
        WITH inc AS MATERIALIZED (
            SELECT DISTINCT l_orderkey AS o, l_partkey AS p
            FROM lineitem),
        deg AS MATERIALIZED (
            SELECT p, count(*) AS d FROM inc GROUP BY p),
        e0 AS MATERIALIZED (
            SELECT a.p AS a, b.p AS b, count(*) AS n
            FROM inc a JOIN inc b ON a.o = b.o AND a.p < b.p
            GROUP BY a.p, b.p HAVING count(*) >= {min_cocount}),
        bi AS (SELECT a AS p, b AS nbr, n FROM e0
               UNION ALL SELECT b, a, n FROM e0),
        sc AS (SELECT bi.p, bi.nbr, bi.n,
                      (bi.n * bi.n) / (da.d * db.d * 1.0) AS score
               FROM bi JOIN deg da ON da.p = bi.p
                       JOIN deg db ON db.p = bi.nbr),
        rk AS (SELECT p, nbr, n, score, row_number() OVER (
                   PARTITION BY p ORDER BY score DESC, nbr ASC)
                   AS rn
               FROM sc)
        SELECT p, nbr, CAST(n AS BIGINT) AS n_common,
               round(sqrt(score), 6) AS cos
        FROM rk WHERE rn <= {k} ORDER BY p, nbr"""


def q_events_holt_winters(sf_dir: str, *, alpha: float = 0.2,
                          beta: float = 0.1, gamma: float = 0.3,
                          period: int = 24):
    """Holt-Winters additive triple-exponential smoothing (Winters
    '60 — the seasonal completion of ``q_events_holt``) of the
    zero-filled hourly count series, with the classic two-season
    seed: l = mean(season 1), b = (mean(season 2) − mean(season 1))
    / period, s_i = y_i − l. Every update is performed in the exact
    float64 expression order the generated recursive-CTE oracle
    replays — the seasonal state rides the recursion as ``period``
    explicit slot columns, one CASE per slot — so final level,
    trend, and all 24 seasonal components land bit-for-bit after
    mirrored 6-dp rounding (the ``q_events_holt`` convention).

    Scale shape: ONE time-bounded combiner pass reduces the corpus
    to the hour grid; the O(T) three-state recursion runs
    driver-side on that metadata-sized series."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = (df["ts"].astype("datetime64[us]").astype("int64")
             // 3_600_000_000)
        v, c = np.unique(h.to_numpy(np.int64), return_counts=True)
        return pd.DataFrame({"h": v, "y": c.astype(np.int64)})

    g = grouped_aggregate(
        ds.map_batches(partial, batch_format="pandas",
                       batch_size=65536),
        ["h"], {"y": ("y", "sum")}, result_hint="small").to_pandas()
    h0 = int(g["h"].min())
    T = int(g["h"].max()) - h0 + 1
    y = np.zeros(T, dtype=np.int64)
    y[g["h"].to_numpy(np.int64) - h0] = g["y"].to_numpy(np.int64)
    assert T >= 2 * period, "need two full seasons to seed"

    lev = float(int(y[:period].sum()) / float(period))
    tr = float((int(y[period:2 * period].sum()) / float(period)
                - int(y[:period].sum()) / float(period)) / period)
    seas = [float(y[i]) - lev for i in range(period)]
    for t in range(period, T):
        slot = t % period
        l_new = (alpha * (float(y[t]) - seas[slot])
                 + (1.0 - alpha) * (lev + tr))
        tr = beta * (l_new - lev) + (1.0 - beta) * tr
        seas[slot] = (gamma * (float(y[t]) - l_new)
                      + (1.0 - gamma) * seas[slot])
        lev = l_new

    def r6(x: float) -> float:
        return float(np.copysign(np.floor(abs(x) * 1e6 + 0.5), x)
                     / 1e6)

    return pd.DataFrame({
        "slot": np.arange(period, dtype=np.int64),
        "seasonal": [r6(s) for s in seas],
        "level": [r6(lev)] * period,
        "trend": [r6(tr)] * period})


def _holt_winters_oracle_sql(alpha: float = 0.2, beta: float = 0.1,
                             gamma: float = 0.3,
                             period: int = 24) -> str:
    """Recursive-CTE replay of ``q_events_holt_winters``: the
    seasonal state rides as ``period`` explicit slot columns; the
    inlined l_new expression reproduces the engine's float64 op
    order exactly."""
    P, a, b_, c = period, alpha, beta, gamma
    scols = ", ".join(
        f"CAST((SELECT y FROM grid WHERE t = {i}) AS DOUBLE) "
        f"- (SELECT sum(y) FROM grid WHERE t < {P}) / {float(P)} "
        f"AS s{i}"
        for i in range(P))
    slot_ref = "CASE (rec.t + 1) % " + str(P) + " " + " ".join(
        f"WHEN {i} THEN rec.s{i}" for i in range(P)) + " END"
    l_new = (f"{a} * (CAST(g.y AS DOUBLE) - ({slot_ref})) "
             f"+ {1.0 - a} * (rec.l + rec.b)")
    supd = ", ".join(
        f"CASE WHEN (rec.t + 1) % {P} = {i} THEN "
        f"{c} * (CAST(g.y AS DOUBLE) - ({l_new})) "
        f"+ {1.0 - c} * rec.s{i} ELSE rec.s{i} END AS s{i}"
        for i in range(P))
    return f"""
        WITH RECURSIVE bnd AS (
            SELECT min(epoch_us(ts) // 3600000000) AS h0,
                   max(epoch_us(ts) // 3600000000) AS h1
            FROM events),
        hrs AS (SELECT unnest(range(0, CAST(h1 - h0 + 1 AS BIGINT)))
                       AS t FROM bnd),
        raw AS (SELECT epoch_us(ts) // 3600000000
                       - (SELECT h0 FROM bnd) AS t, count(*) AS y
                FROM events GROUP BY 1),
        grid AS MATERIALIZED (
            SELECT hrs.t, coalesce(raw.y, 0) AS y
            FROM hrs LEFT JOIN raw ON raw.t = hrs.t),
        rec AS (
            SELECT CAST({P - 1} AS BIGINT) AS t,
                   (SELECT sum(y) FROM grid WHERE t < {P})
                       / {float(P)} AS l,
                   ((SELECT sum(y) FROM grid
                     WHERE t >= {P} AND t < {2 * P}) / {float(P)}
                    - (SELECT sum(y) FROM grid WHERE t < {P})
                      / {float(P)}) / {float(P)} AS b,
                   {scols}
            UNION ALL
            SELECT rec.t + 1,
                   {l_new} AS l,
                   {b_} * (({l_new}) - rec.l) + {1.0 - b_} * rec.b
                       AS b,
                   {supd}
            FROM rec JOIN grid g ON g.t = rec.t + 1),
        fin AS (SELECT * FROM rec
                WHERE t = (SELECT max(t) FROM grid))
        SELECT CAST(u.slot AS BIGINT) AS slot,
               round(CASE u.slot {' '.join(
                   f'WHEN {i} THEN fin.s{i}' for i in range(P))}
                     END, 6) AS seasonal,
               round(fin.l, 6) AS level,
               round(fin.b, 6) AS trend
        FROM fin, (SELECT unnest(range({P})) AS slot) u
        ORDER BY slot"""


def q_events_bh_fdr(sf_dir: str, *, alpha: float = 0.1):
    """Benjamini–Hochberg FDR control (Benjamini & Hochberg '95 —
    the multiple-testing layer over the per-type Fisher enrichment
    family): rank the 6-dp-rounded enrichment p-values ascending
    (p ASC, type ASC strict ties), k* = max rank with
    p ≤ rank·α/m, reject ranks ≤ k*. The comparison operand
    rank·α/m is one identical double expression on both engines,
    and ranking the ROUNDED p removes any sub-6-dp ordering hazard.
    Distributed work is exactly the enrichment pass (one combiner to
    per-type counts); BH runs driver-side on the type-bounded
    table."""
    enr = q_events_enrichment(sf_dir)
    m = len(enr)
    d = enr.sort_values(["p_value", "event_type"]) \
        .reset_index(drop=True)
    rank = np.arange(1, m + 1, dtype=np.int64)
    crit = rank * alpha / m
    ok = d["p_value"].to_numpy(np.float64) <= crit
    kstar = int(rank[ok].max()) if ok.any() else 0
    d["rank"] = rank
    d["bh_crit"] = np.round(crit, 6)
    d["rejected"] = rank <= kstar
    return d[["event_type", "n", "k", "p_value", "rank",
              "bh_crit", "rejected"]] \
        .sort_values("event_type").reset_index(drop=True)


def _bh_fdr_oracle_sql(alpha: float = 0.1) -> str:
    """BH replay over the embedded enrichment CTE (the nested-WITH
    reuse convention of the kappa oracle)."""
    return f"""
        WITH m AS (
            SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                   CAST(count(*) FILTER (WHERE value >= 50.0)
                        AS BIGINT) AS k
            FROM events GROUP BY event_type),
        t AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
                     CAST(sum(k) AS BIGINT) AS kk FROM m),
        grid AS (
            SELECT m.event_type, m.n, m.k, t.nn, t.kk,
                   unnest(generate_series(
                       m.k, least(t.kk, m.n))) AS i
            FROM m CROSS JOIN t),
        p AS (
            SELECT event_type, sum(exp(
                (lgamma(kk + 1.0) - lgamma(i + 1.0)
                 - lgamma(kk - i + 1.0))
                + (lgamma(nn - kk + 1.0) - lgamma(n - i + 1.0)
                   - lgamma(nn - kk - (n - i) + 1.0))
                - (lgamma(nn + 1.0) - lgamma(n + 1.0)
                   - lgamma(nn - n + 1.0)))) AS pv
            FROM grid GROUP BY event_type),
        e AS (SELECT m.event_type, m.n, m.k,
                     round(p.pv, 6) AS p_value
              FROM m JOIN p USING (event_type)),
        rk AS (SELECT *, row_number() OVER (
                   ORDER BY p_value ASC, event_type ASC) AS rank,
                   (SELECT count(*) FROM e) AS mm
               FROM e),
        ks AS (SELECT coalesce(max(rank), 0) AS kstar
               FROM rk WHERE p_value <= rank * {alpha} / mm)
        SELECT event_type, n, k, p_value, CAST(rank AS BIGINT)
                   AS rank,
               round(rank * {alpha} / mm, 6) AS bh_crit,
               rank <= ks.kstar AS rejected
        FROM rk CROSS JOIN ks ORDER BY event_type"""


def emb_kcenter_select(sf_dir: str, *, k: int = 6):
    """Farthest-first-traversal k-center coreset selection (Gonzalez
    '85 — the 2-approximation diverse-subset primitive beside MMR
    and SemDeDup in the curation family): seed at the smallest
    vec_id, then ``k``−1 rounds each selecting the point FARTHEST
    from the chosen set. Distances are squared Euclidean over the
    3-decimal-quantized embedding grid (mirror-rounded float32 →
    int), so every distance is an EXACT INTEGER and the argmax cut
    (dist DESC, vec_id ASC) carries zero float hazard — the
    integer-cents convention applied to vectors.

    Scale shape: the ≤k selected centers broadcast per round; ONE
    streaming pass over the embeddings recomputes each point's
    min-distance-to-set (stateless k× recompute beats carrying a
    distributed min table at k this small) and emits per-block
    argmax partials; the driver reduces the block-bounded partials.
    Returns the selection order with each center's selection
    distance — the covering-radius curve."""
    import pyarrow.parquet as _pq

    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"]) \
        .materialize()

    def quant(m: np.ndarray) -> np.ndarray:
        return np.copysign(np.floor(np.abs(m.astype(np.float64))
                                    * 1000.0 + 0.5), m) \
            .astype(np.int64)

    first = int(ds.map_batches(
        lambda df: pd.DataFrame(
            {"m": [df["vec_id"].min()]}),
        batch_format="pandas").to_pandas()["m"].min())
    tbl = _pq.read_table(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"],
                         filters=[("vec_id", "==", first)])
    import ray
    sel = [(1, first, 0)]
    cents = [quant(np.stack(tbl["embedding"].to_pandas()
                            .to_numpy())[0])]
    for r in range(2, k + 1):
        cref = ray.put(np.stack(cents))

        def block_argmax(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty:
                return pd.DataFrame({"vec_id": pd.Series(dtype="int64"),
                                     "d2": pd.Series(dtype="int64")})
            C = ray.get(cref)
            Q = quant(np.stack(df["embedding"].to_numpy()))
            # (n, c) exact-integer squared distances
            d2 = ((Q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2) \
                .min(axis=1)
            vid = df["vec_id"].to_numpy(np.int64)
            o = np.lexsort((vid, -d2))[0]
            return pd.DataFrame({"vec_id": [int(vid[o])],
                                 "d2": [int(d2[o])]})

        part = ds.map_batches(block_argmax,
                              batch_format="pandas").to_pandas()
        part = part.sort_values(["d2", "vec_id"],
                                ascending=[False, True])
        vid, d2 = int(part["vec_id"].iloc[0]), int(part["d2"].iloc[0])
        sel.append((r, vid, d2))
        t = _pq.read_table(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"],
                           filters=[("vec_id", "==", vid)])
        cents.append(quant(np.stack(
            t["embedding"].to_pandas().to_numpy())[0]))
    return pd.DataFrame(sel, columns=["sel_rank", "vec_id", "d2"]) \
        .astype("int64")


def _kcenter_oracle_sql(k: int = 6, dim: int = 64) -> str:
    """Per-round replay of ``emb_kcenter_select``: quantized integer
    vectors, a correlated exact-integer distance sum per candidate,
    running least() min-distance, and the strict (d2 DESC, vec_id)
    pick."""
    sql = f"""
        WITH q AS MATERIALIZED (
            SELECT vec_id, list_transform(embedding,
                x -> CAST(round(CAST(x AS DOUBLE) * 1000.0, 0)
                          AS BIGINT)) AS v
            FROM embeddings),
        idx AS (SELECT unnest(range(1, {dim + 1})) AS i),
        p1 AS (SELECT min(vec_id) AS cid FROM q),
        m1 AS MATERIALIZED (
            SELECT q.vec_id,
                   (SELECT sum((q.v[idx.i] - c.v[idx.i])
                               * (q.v[idx.i] - c.v[idx.i]))
                    FROM idx) AS d2
            FROM q JOIN q c ON c.vec_id = (SELECT cid FROM p1))"""
    for r in range(2, k + 1):
        sql += f""",
        p{r} AS (SELECT vec_id AS cid, d2 FROM m{r - 1}
                 ORDER BY d2 DESC, vec_id ASC LIMIT 1),
        m{r} AS MATERIALIZED (
            SELECT m.vec_id, least(m.d2,
                   (SELECT sum((q.v[idx.i] - c.v[idx.i])
                               * (q.v[idx.i] - c.v[idx.i]))
                    FROM idx)) AS d2
            FROM m{r - 1} m JOIN q ON q.vec_id = m.vec_id
                 JOIN q c ON c.vec_id = (SELECT cid FROM p{r}))"""
    parts = ["""
        SELECT CAST(1 AS BIGINT) AS sel_rank,
               (SELECT cid FROM p1) AS vec_id,
               CAST(0 AS BIGINT) AS d2"""]
    for r in range(2, k + 1):
        parts.append(f"""
        SELECT CAST({r} AS BIGINT), cid, CAST(d2 AS BIGINT)
        FROM p{r}""")
    return sql + "\nSELECT * FROM (" \
        + "\nUNION ALL ".join(parts) + ") ORDER BY sel_rank"


def q_user_lis(sf_dir: str, *, oracle_levels: int = 30):
    """Longest strictly-increasing subsequence of each user's value
    sequence in (ts, id) order (patience sorting / Schensted '61 —
    the non-contiguous monotone-trend length beside the contiguous
    ``q_user_streaks``): the engagement-escalation audit. Users
    co-locate in ONE hash shuffle; inside each block the patience
    update is RANK-STEPPED across all of the block's users at once
    (the ``q_events_ewma`` convention): at rank r every user's
    insertion slot is the vectorized count of its tails < v (tails
    rows stay sorted by construction), so the loop is over max
    series length, not rows. Value comparisons are exact float64
    order tests — no arithmetic, no accumulation hazard. The oracle
    replays level-by-level: L_k = ends of strictly-increasing
    chains of length k (EXISTS-deduped, so rows per level stay
    n-bounded); lis_len = max populated level. Asserts the corpus
    max fits the oracle's unrolled depth."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts",
                                     "value"])

    def lis_block(block: pd.DataFrame) -> pd.DataFrame:
        if block.empty:
            return pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64"),
                                 "lis_len": pd.Series(dtype="int64")})
        b = block.sort_values(["user_id", "ts", "event_id"])
        v = b["value"].to_numpy(np.float64)
        uid = b["user_id"].to_numpy()
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        starts = np.flatnonzero(new_user)
        lens = np.diff(np.r_[starts, len(v)])
        rn = np.arange(len(v)) - np.repeat(starts, lens)
        U, L = len(starts), int(lens.max())
        tails = np.full((U, L), np.inf)
        urow = np.repeat(np.arange(U), lens)
        for r in range(L):
            idx = np.flatnonzero(rn == r)
            u = urow[idx]
            val = v[idx]
            pos = (tails[u] < val[:, None]).sum(axis=1)
            tails[u, pos] = val
        return pd.DataFrame({
            "user_id": uid[starts],
            "n": lens.astype("int64"),
            "lis_len": np.isfinite(tails).sum(axis=1)
            .astype("int64")})

    out = grouped_apply(ds, ["user_id"], lis_block).to_pandas()
    out["user_id"] = out["user_id"].astype("int64")
    out = out.sort_values("user_id").reset_index(drop=True)
    assert int(out["lis_len"].max()) <= oracle_levels, \
        "LIS exceeds oracle's unrolled depth"
    return out


def _lis_oracle_sql(levels: int = 30) -> str:
    """Level-unrolled chain replay of ``q_user_lis``: L_k holds the
    distinct (user, rank) positions ending a strictly-increasing
    chain of length k."""
    sql = """
        WITH seq AS MATERIALIZED (
            SELECT user_id, value AS v, row_number() OVER (
                PARTITION BY user_id ORDER BY ts, event_id) AS rn
            FROM events),
        l1 AS (SELECT user_id, rn FROM seq)"""
    for k in range(2, levels + 1):
        sql += f""",
        l{k} AS MATERIALIZED (
            SELECT DISTINCT b.user_id, b.rn
            FROM l{k - 1} p
            JOIN seq a ON a.user_id = p.user_id AND a.rn = p.rn
            JOIN seq b ON b.user_id = a.user_id
                      AND b.rn > a.rn AND b.v > a.v)"""
    lens = ["SELECT user_id, 1 AS k FROM l1"]
    lens += [f"SELECT user_id, {k} FROM l{k}"
             for k in range(2, levels + 1)]
    return sql + f""",
        allk AS ({' UNION ALL '.join(lens)}),
        n AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n
              FROM seq GROUP BY user_id)
        SELECT n.user_id, n.n,
               CAST(max(allk.k) AS BIGINT) AS lis_len
        FROM n JOIN allk ON allk.user_id = n.user_id
        GROUP BY n.user_id, n.n ORDER BY n.user_id"""


def doc_heaps_law(sf_dir: str, *, checkpoints: int = 10):
    """Heaps'-law vocabulary growth fit V = K·N^β (Heaps '78 — the
    growth-curve companion of the Chao1/Good-Turing coverage audit
    and the Zipf slope): at ``checkpoints`` equal doc-id range cuts,
    the cumulative token count N and cumulative vocabulary V, plus
    the log-log OLS slope β and intercept ln K over those points.
    The prefix trick keeps it ONE-pass distributed: V(t) = #words
    whose MIN doc_id ≤ t (a word-min combiner), N(t) = Σ tokens of
    docs with doc_id ≤ t (a per-doc-stats combiner) — no sequential
    corpus scan anywhere. The checkpoint table is exact integers;
    the 10-point OLS runs in the identical expression order on both
    engines (glibc ln), rounded to 6 dp."""
    import math

    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        words = batch["text"].fillna("").str.lower().str.split()
        lens = words.str.len().fillna(0).to_numpy(dtype=np.int64)
        ids = batch["doc_id"].to_numpy(np.int64)
        if lens.sum() == 0:
            return pd.DataFrame({"w": pd.Series(dtype="object"),
                                 "d": pd.Series(dtype="int64")})
        flat = np.concatenate([w for w in words.to_numpy() if w])
        docs = np.repeat(ids, lens)
        g = pd.DataFrame({"w": flat, "d": docs}) \
            .groupby("w", sort=False)["d"].min().reset_index()
        return g

    wmin = grouped_aggregate(
        ds.map_batches(explode, batch_format="pandas",
                       batch_size=4096),
        ["w"], {"d": ("d", "min")})

    # doc-id bounds: one metadata-sized combiner pass
    bounds = ds.map_batches(
        lambda df: pd.DataFrame({"lo": [df["doc_id"].min()],
                                 "hi": [df["doc_id"].max()]}),
        batch_format="pandas").to_pandas()
    lo, hi = int(bounds["lo"].min()), int(bounds["hi"].max())
    ths = np.array([lo + (hi - lo + 1) * i // checkpoints - 1
                    for i in range(1, checkpoints + 1)],
                   dtype=np.int64)

    # bucket histograms: neither the vocabulary nor the per-doc
    # table ever reaches the driver — only #checkpoint rows do
    def word_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "d" not in df.columns:
            return pd.DataFrame({"bkt": pd.Series(dtype="int64"),
                                 "v": pd.Series(dtype="int64")})
        b = np.searchsorted(ths, df["d"].to_numpy(np.int64),
                            side="left")
        u, c = np.unique(b, return_counts=True)
        return pd.DataFrame({"bkt": u.astype(np.int64),
                             "v": c.astype(np.int64)})

    vh = grouped_aggregate(
        wmin.map_batches(word_bucket, batch_format="pandas"),
        ["bkt"], {"v": ("v", "sum")},
        result_hint="small").to_pandas()

    def tok_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        words = batch["text"].fillna("").str.split()
        n = words.str.len().fillna(0).to_numpy(np.int64)
        b = np.searchsorted(ths, batch["doc_id"].to_numpy(np.int64),
                            side="left")
        g = pd.DataFrame({"bkt": b, "n": n}) \
            .groupby("bkt", sort=False)["n"].sum().reset_index()
        return g.astype({"bkt": "int64", "n": "int64"})

    nh = grouped_aggregate(
        ds.map_batches(tok_bucket, batch_format="pandas",
                       batch_size=8192),
        ["bkt"], {"n": ("n", "sum")},
        result_hint="small").to_pandas()
    vcum = np.zeros(checkpoints, dtype=np.int64)
    ncum = np.zeros(checkpoints, dtype=np.int64)
    vcum[vh["bkt"].to_numpy(np.int64)] = vh["v"].to_numpy(np.int64)
    ncum[nh["bkt"].to_numpy(np.int64)] = nh["n"].to_numpy(np.int64)
    vcum, ncum = np.cumsum(vcum), np.cumsum(ncum)
    rows = [(np.int64(i + 1), np.int64(ths[i]), np.int64(ncum[i]),
             np.int64(vcum[i])) for i in range(checkpoints)]
    pts = [(math.log(float(N)), math.log(float(V)))
           for _, _, N, V in rows]
    n = float(len(pts))
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxx = sum(p[0] * p[0] for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    lnk = (sy - beta * sx) / n
    out = pd.DataFrame(rows, columns=["checkpoint", "max_doc_id",
                                      "n_tokens", "vocab"])
    out["beta"] = _round_half_away(beta, 6)
    out["ln_k"] = _round_half_away(lnk, 6)
    return out


_HEAPS_ORACLE_SQL = """
    WITH w AS (
        SELECT doc_id, unnest(list_filter(
            regexp_split_to_array(lower(coalesce(text, '')), '\\s+'),
            x -> x <> '')) AS word
        FROM documents),
    wmin AS MATERIALIZED (
        SELECT word, min(doc_id) AS d FROM w GROUP BY word),
    dt AS MATERIALIZED (
        SELECT doc_id, count(*) AS n FROM w GROUP BY doc_id),
    b AS (SELECT min(doc_id) AS lo, max(doc_id) AS hi
          FROM documents),
    th AS (SELECT i, lo + ((hi - lo + 1) * i) // 10 - 1 AS t
           FROM b, (SELECT unnest(range(1, 11)) AS i)),
    cp AS MATERIALIZED (
        SELECT th.i AS checkpoint, th.t AS max_doc_id,
               (SELECT CAST(coalesce(sum(n), 0) AS BIGINT)
                FROM dt WHERE doc_id <= th.t) AS n_tokens,
               (SELECT CAST(count(*) AS BIGINT)
                FROM wmin WHERE d <= th.t) AS vocab
        FROM th),
    s AS (SELECT count(*) * 1.0 AS n,
                 sum(ln(n_tokens * 1.0)) AS sx,
                 sum(ln(vocab * 1.0)) AS sy,
                 sum(ln(n_tokens * 1.0) * ln(n_tokens * 1.0)) AS sxx,
                 sum(ln(n_tokens * 1.0) * ln(vocab * 1.0)) AS sxy
          FROM cp),
    f AS (SELECT (n * sxy - sx * sy) / (n * sxx - sx * sx) AS beta,
                 sx, sy, n FROM s)
    SELECT cp.checkpoint, cp.max_doc_id, cp.n_tokens, cp.vocab,
           round(f.beta, 6) AS beta,
           round((f.sy - f.beta * f.sx) / f.n, 6) AS ln_k
    FROM cp CROSS JOIN f ORDER BY cp.checkpoint"""


def q_user_interval_schedule(sf_dir: str):
    """Weighted interval scheduling DP (the Bellman-style classic,
    Kleinberg–Tardos ch. 6) over the heaviest user's event
    intervals: event at t with value v spans [t, t + cents·3.6 ms·
    1000) µs (cents = round(v·100) — spans proportional to value so
    the schedule genuinely conflicts), weight = integer cents.
    Intervals sort under the strict (end, start, id) key; p(i) =
    last interval with end ≤ start_i; opt(i) = max(opt(i−1),
    w_i + opt(p(i))) — all EXACT integers. Output is the full opt
    table (rank, start, end, w, p, opt), so the optimum and every
    DP decision are hash-checked with no backtrack ambiguity.

    Scale shape: the heaviest user comes from a combiner count
    (ties → smallest id); one streaming filtered pass extracts that
    user's rows; the user-bounded DP runs on the driver. The oracle
    carries the growing opt vector as a LIST column through a
    recursive CTE — one list_append per rank."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts",
                                     "value"])
    cnt = grouped_aggregate(ds, ["user_id"],
                            {"n": (None, "count")}).to_pandas()
    cnt = cnt.sort_values(["n", "user_id"],
                          ascending=[False, True])
    top = int(cnt["user_id"].iloc[0])
    ev = ds.filter(expr=f"user_id == {top}").to_pandas()
    ts = ev["ts"].astype("datetime64[us]").astype("int64") \
        .to_numpy(np.int64)
    cents = np.copysign(np.floor(np.abs(
        ev["value"].to_numpy(np.float64)) * 100.0 + 0.5),
        ev["value"].to_numpy(np.float64)).astype(np.int64)
    d = pd.DataFrame({"eid": ev["event_id"].to_numpy(np.int64),
                      "start": ts, "end": ts + cents * 3_600_000,
                      "w": cents})
    d = d.sort_values(["end", "start", "eid"], kind="mergesort") \
        .reset_index(drop=True)
    n = len(d)
    ends = d["end"].to_numpy(np.int64)
    starts = d["start"].to_numpy(np.int64)
    w = d["w"].to_numpy(np.int64)
    p = np.searchsorted(ends, starts, side="right")  # 0 = none
    opt = np.zeros(n + 1, dtype=np.int64)
    for i in range(1, n + 1):
        opt[i] = max(opt[i - 1], w[i - 1] + opt[p[i - 1]])
    return pd.DataFrame({
        "rank": np.arange(1, n + 1, dtype=np.int64),
        "start": starts, "end": ends, "w": w,
        "p": p.astype(np.int64), "opt": opt[1:]})


_INTERVAL_SCHEDULE_ORACLE_SQL = """
    WITH RECURSIVE topu AS (
        SELECT user_id FROM events GROUP BY user_id
        ORDER BY count(*) DESC, user_id ASC LIMIT 1),
    iv AS MATERIALIZED (
        SELECT epoch_us(ts) AS s,
               epoch_us(ts) + CAST(round(value * 100.0, 0)
                                   AS BIGINT) * 3600000 AS e,
               CAST(round(value * 100.0, 0) AS BIGINT) AS w,
               event_id AS eid
        FROM events WHERE user_id = (SELECT user_id FROM topu)),
    rk AS MATERIALIZED (
        SELECT s, e, w, row_number() OVER (
            ORDER BY e, s, eid) AS rank
        FROM iv),
    pp AS MATERIALIZED (
        SELECT rk.rank, rk.s, rk.e, rk.w,
               coalesce((SELECT max(o.rank) FROM rk o
                         WHERE o.e <= rk.s), 0) AS p
        FROM rk),
    dp AS (
        SELECT CAST(0 AS BIGINT) AS i, [CAST(0 AS BIGINT)] AS opts
        UNION ALL
        SELECT dp.i + 1,
               list_append(dp.opts, greatest(
                   dp.opts[CAST(dp.i + 1 AS INT)],
                   pp.w + dp.opts[CAST(pp.p + 1 AS INT)]))
        FROM dp JOIN pp ON pp.rank = dp.i + 1),
    fin AS (SELECT opts FROM dp
            WHERE i = (SELECT count(*) FROM pp))
    SELECT pp.rank, CAST(pp.s AS BIGINT) AS start,
           CAST(pp.e AS BIGINT) AS "end", pp.w,
           CAST(pp.p AS BIGINT) AS p,
           fin.opts[CAST(pp.rank + 1 AS INT)] AS opt
    FROM pp CROSS JOIN fin ORDER BY pp.rank"""


def q_stable_matching(sf_dir: str, *, n: int = 8,
                      oracle_rounds: int = 16):
    """Gale–Shapley stable matching (Gale & Shapley '62) between
    the top-``n`` customers and top-``n`` suppliers by account
    balance (strict (balance DESC, key ASC) pick): preference ranks
    on both sides come from md5("c|s") / md5("s|c") — the
    SQL-replayable ``md5_hash64`` contract, distinct with
    overwhelming probability and pinned strict by the (hash, id)
    tie key. Runs the ROUND-SYNCHRONOUS proposer variant (all free
    customers propose to their best not-yet-tried supplier; each
    supplier keeps its best suitor) — deterministic and identical
    to classic deferred acceptance's result (the proposer-optimal
    stable matching is unique), which is what the generated
    per-round CTE oracle replays. Stability (no blocking pair) is
    pytest-verified by brute force.

    Scale shape: two combiner top-k passes pick the participants;
    the n×n preference table is metadata-sized and the proposal
    rounds run driver-side (the Selinger/Viterbi convention).
    Asserts convergence within the oracle's unrolled depth."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    from jerex_ray.util import md5_hash64
    configure_data_context()

    def top_keys(table: str, key: str, bal: str) -> list[int]:
        ds = read_parquet_sized(f"{sf_dir}/{table}.parquet",
                                columns=[key, bal])
        t = grouped_aggregate(ds, [key], {"b": (bal, "max")}) \
            .to_pandas()
        t = t.sort_values(["b", key], ascending=[False, True])
        return [int(v) for v in t[key].head(n)]

    cs = top_keys("customer", "c_custkey", "c_acctbal")
    ss = top_keys("supplier", "s_suppkey", "s_acctbal")
    # customer c's preference list: suppliers by md5("c|s") ASC
    pref_c = {c: sorted(ss, key=lambda s: (md5_hash64(f"{c}|{s}"), s))
              for c in cs}
    # supplier s prefers the suitor with smaller md5("s|c")
    srank = {(s, c): (md5_hash64(f"{s}|{c}"), c)
             for s in ss for c in cs}

    nxt = dict.fromkeys(cs, 0)        # next proposal index
    engaged: dict[int, int] = {}      # supplier -> customer
    rounds = 0
    while True:
        rounds += 1
        free = [c for c in cs if c not in engaged.values()
                and nxt[c] < n]
        if not free:
            break
        props: dict[int, list[int]] = {}
        for c in free:
            s = pref_c[c][nxt[c]]
            nxt[c] += 1
            props.setdefault(s, []).append(c)
        for s, suitors in props.items():
            cand = suitors + ([engaged[s]] if s in engaged else [])
            engaged[s] = min(cand, key=lambda c: srank[(s, c)])
        assert rounds <= oracle_rounds, \
            f"GS still running at round {rounds} > {oracle_rounds}"
    return pd.DataFrame(
        sorted((c, s) for s, c in engaged.items()),
        columns=["c_custkey", "s_suppkey"]).astype("int64")


def _stable_matching_oracle_sql(n: int = 8,
                                rounds: int = 16) -> str:
    """Per-round replay of ``q_stable_matching``: the proposal
    state is (customer, tried-count, engaged supplier or NULL);
    each round free customers propose to preference rank
    tried+1, suppliers keep the md5-smallest suitor."""
    h = ("CAST('0x' || substr(md5(CAST({a} AS VARCHAR) || '|' || "
         "CAST({b} AS VARCHAR)), 1, 16) AS UBIGINT)")
    hc = h.format(a="c.c", b="s.s")
    hs = h.format(a="s.s", b="c.c")
    sql = f"""
        WITH cs AS MATERIALIZED (
            SELECT c_custkey AS c FROM customer
            ORDER BY c_acctbal DESC, c_custkey ASC LIMIT {n}),
        ss AS MATERIALIZED (
            SELECT s_suppkey AS s FROM supplier
            ORDER BY s_acctbal DESC, s_suppkey ASC LIMIT {n}),
        pr AS MATERIALIZED (
            SELECT c.c, s.s,
                   row_number() OVER (PARTITION BY c.c
                       ORDER BY {hc}, s.s) AS crk,
                   {hs} AS shash
            FROM cs c CROSS JOIN ss s),
        st0 AS (SELECT c, 0 AS tried, CAST(NULL AS BIGINT) AS eng
                FROM cs)"""
    for r in range(1, rounds + 1):
        p, q = f"st{r - 1}", f"st{r}"
        sql += f""",
        pp{r} AS MATERIALIZED (
            SELECT {p}.c, pr.s, pr.shash
            FROM {p} JOIN pr ON pr.c = {p}.c
                             AND pr.crk = {p}.tried + 1
            WHERE {p}.eng IS NULL AND {p}.tried < {n}),
        win{r} AS MATERIALIZED (
            SELECT s, c FROM (
                SELECT u.s, u.c, row_number() OVER (
                    PARTITION BY u.s ORDER BY u.shash, u.c) AS rn
                FROM (
                    SELECT s, c, shash FROM pp{r}
                    UNION ALL
                    SELECT p0.eng AS s, p0.c,
                           (SELECT shash FROM pr
                            WHERE pr.c = p0.c AND pr.s = p0.eng)
                    FROM {p} p0 WHERE p0.eng IS NOT NULL) u)
            WHERE rn = 1),
        {q} AS MATERIALIZED (
            SELECT {p}.c,
                   {p}.tried + CASE WHEN pp{r}.c IS NOT NULL
                                    THEN 1 ELSE 0 END AS tried,
                   w.s AS eng
            FROM {p}
            LEFT JOIN pp{r} ON pp{r}.c = {p}.c
            LEFT JOIN win{r} w ON w.c = {p}.c)"""
    return sql + f"""
        SELECT c AS c_custkey, eng AS s_suppkey
        FROM st{rounds} WHERE eng IS NOT NULL
        ORDER BY c_custkey"""


def q_doc_token_align(sf_dir: str):
    """Token-level global alignment distance (Needleman–Wunsch '70
    with unit costs = Levenshtein on the token alphabet) between the
    two LONGEST documents (n_tokens DESC, doc_id ASC — the knapsack
    pick): the document-scale sibling of the char-level edit
    distance the canonicalizer uses (M8). The DP row update is
    fully vectorized via the prefix-min identity dp[i][j] = j +
    min_{k≤j}(c_k − k) (one ``np.minimum.accumulate`` per row — no
    inner loop despite the left-cell dependency). The oracle maps
    each distinct token of the pair to one printable ASCII char
    (asserted ≤ 94 — loud, not silent, on vocabulary growth) and
    asks DuckDB's byte-level ``levenshtein`` on the encoded
    strings, which on a 1-byte alphabet IS token-level NW.

    Scale shape: the pair pick is an exact per-block top-k; the
    O(len²) DP runs driver-side on the two-document payload."""
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.split()
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "n": toks.str.len().fillna(0).astype(np.int64),
            "text": df["text"].fillna("")})

    def block_top(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["n", "doc_id"],
                              ascending=[False, True],
                              kind="mergesort").head(2)

    top = ds.map_batches(stats, batch_format="pandas",
                         batch_size=8192) \
        .map_batches(block_top, batch_format="pandas").to_pandas()
    top = top.sort_values(["n", "doc_id"],
                          ascending=[False, True],
                          kind="mergesort").head(2) \
        .reset_index(drop=True)
    da, db_ = int(top["doc_id"].iloc[0]), int(top["doc_id"].iloc[1])
    if da > db_:            # canonical (doc_a < doc_b) output order
        top = top.iloc[[1, 0]].reset_index(drop=True)
        da, db_ = db_, da
    a = [t.lower() for t in top["text"].iloc[0].split()]
    b = [t.lower() for t in top["text"].iloc[1].split()]
    assert len(set(a) | set(b)) <= 94, \
        "pair vocabulary exceeds the oracle's 1-byte alphabet"
    bv = np.array(b, dtype=object)
    prev = np.arange(len(b) + 1, dtype=np.int64)
    for i, ta in enumerate(a, 1):
        sub = (bv != ta).astype(np.int64)
        c = np.minimum(prev[:-1] + sub, prev[1:] + 1)
        cand = np.r_[np.int64(i), c] \
            - np.arange(len(b) + 1, dtype=np.int64)
        prev = np.arange(len(b) + 1, dtype=np.int64) \
            + np.minimum.accumulate(cand)
    d = int(prev[-1])
    la, lb = len(a), len(b)
    return pd.DataFrame({
        "doc_a": np.array([da], dtype=np.int64),
        "doc_b": np.array([db_], dtype=np.int64),
        "len_a": np.array([la], dtype=np.int64),
        "len_b": np.array([lb], dtype=np.int64),
        "edist": np.array([d], dtype=np.int64),
        "sim": [round(1.0 - d / max(la, lb), 6)]})


def _token_align_oracle_sql() -> str:
    return f"""
    WITH it AS MATERIALIZED (
        SELECT doc_id, lower(coalesce(text, '')) AS t,
               {_N_TOKENS_SQL} AS n,
               row_number() OVER (
                   ORDER BY {_N_TOKENS_SQL} DESC, doc_id ASC) AS rk
        FROM documents QUALIFY rk <= 2),
    pair AS (SELECT min(doc_id) AS da, max(doc_id) AS db FROM it),
    tok AS MATERIALIZED (
        SELECT it.doc_id, p.i AS pos,
               list_filter(regexp_split_to_array(it.t, '\\s+'),
                           x -> x <> '')[p.i] AS w
        FROM it, LATERAL (SELECT unnest(range(1,
            array_length(list_filter(regexp_split_to_array(it.t,
                '\\s+'), x -> x <> '')) + 1)) AS i) p),
    dict AS MATERIALIZED (
        SELECT w, chr(32 + CAST(row_number() OVER (ORDER BY w)
                                AS INT)) AS ch
        FROM (SELECT DISTINCT w FROM tok)),
    enc AS MATERIALIZED (
        SELECT tok.doc_id,
               string_agg(dict.ch, '' ORDER BY tok.pos) AS s,
               count(*) AS n
        FROM tok JOIN dict ON dict.w = tok.w
        GROUP BY tok.doc_id),
    d AS (SELECT levenshtein(
              (SELECT s FROM enc, pair WHERE doc_id = pair.da),
              (SELECT s FROM enc, pair WHERE doc_id = pair.db))
              AS dist)
    SELECT pair.da AS doc_a, pair.db AS doc_b,
           CAST((SELECT n FROM enc WHERE doc_id = pair.da)
                AS BIGINT) AS len_a,
           CAST((SELECT n FROM enc WHERE doc_id = pair.db)
                AS BIGINT) AS len_b,
           CAST(d.dist AS BIGINT) AS edist,
           round(1.0 - d.dist / greatest(
               (SELECT n FROM enc WHERE doc_id = pair.da),
               (SELECT n FROM enc WHERE doc_id = pair.db)) * 1.0, 6)
               AS sim
    FROM pair CROSS JOIN d"""  # noqa: E501


def _cdc_chunks(text: str, k: int, divisor: int,
                hash_batch) -> list[str]:
    """Content-defined chunk strings of ``text``: a cut after char
    i+k−1 wherever md5_64(text[i:i+k]) % divisor == 0 (gram hashes
    md5-derived — the ``winnowing_md5`` SQL-replay convention), plus
    the forced tail cut. Chunk boundaries move with content, not
    offsets, so insertions only reshape neighboring chunks — the
    LBFS property."""
    t = text.lower()
    n = len(t) - k + 1
    if n < 1:
        return [t] if t else []
    grams = [t[i:i + k] for i in range(n)]
    h = hash_batch(grams) % np.uint64(divisor)
    cuts = (np.flatnonzero(h == 0) + k).tolist()
    if not cuts or cuts[-1] != len(t):
        cuts.append(len(t))
    out, prev = [], 0
    for c in cuts:
        if c > prev:
            out.append(t[prev:c])
            prev = c
    return out


def doc_cdc_chunks(sf_dir: str, *, k: int = 8, divisor: int = 64):
    """Content-defined chunking audit (LBFS, Muthitacharoen et al.
    '01 — the Rabin-cut storage-dedup primitive beside the
    winnowing fingerprints): per document, the chunk count and how
    many of its DISTINCT chunk hashes are shared with at least one
    other document (the dedup win a content-addressed store would
    realize). Cuts derive from md5 char-``k``-gram hashes
    (% ``divisor`` == 0), so the SQL oracle replays every boundary
    and chunk hash bit-for-bit.

    Scale shape: pass 1 emits distinct (doc, chunk-hash) rows and
    reduces them through the combiner to per-hash doc counts; only
    hashes with ≥2 docs (bounded by the cross-doc duplicate volume,
    the MinHash-family broadcast contract) reach the driver and
    broadcast; pass 2 recomputes each doc's chunks and counts
    membership — no corpus-sized join, no chunk text ever
    shuffled."""
    import ray

    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    from jerex_ray.util import md5_hash64_batch
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def hash_rows(batch: pd.DataFrame) -> pd.DataFrame:
        ids, hs = [], []
        for did, txt in zip(batch["doc_id"], batch["text"].fillna("")):
            ch = _cdc_chunks(txt, k, divisor, md5_hash64_batch)
            if not ch:
                continue
            hh = np.unique((md5_hash64_batch(ch)
                            % np.uint64(1 << 63)).astype(np.int64))
            ids.extend([int(did)] * len(hh))
            hs.extend(int(v) for v in hh)
        return pd.DataFrame({"doc_id": np.array(ids, dtype=np.int64),
                             "chash": np.array(hs, dtype=np.int64)})

    counts = grouped_aggregate(
        ds.map_batches(hash_rows, batch_format="pandas",
                       batch_size=1024),
        ["chash"], {"n_docs": (None, "count")})
    shared_df = counts.map_batches(
        lambda df: df[df["n_docs"] >= 2][["chash"]]
        if "chash" in df.columns else df,
        batch_format="pandas").to_pandas()
    shared = set(int(v) for v in shared_df["chash"]) \
        if "chash" in shared_df.columns else set()
    sref = ray.put(shared)

    def per_doc(batch: pd.DataFrame) -> pd.DataFrame:
        sh = ray.get(sref)
        rows = []
        for did, txt in zip(batch["doc_id"], batch["text"].fillna("")):
            ch = _cdc_chunks(txt, k, divisor, md5_hash64_batch)
            hh = set(int(v) for v in (md5_hash64_batch(ch)
                                      % np.uint64(1 << 63))) \
                if ch else set()
            rows.append((int(did), len(txt), len(ch), len(hh),
                         sum(1 for v in hh if v in sh)))
        return pd.DataFrame(rows, columns=[
            "doc_id", "n_chars", "n_chunks", "uniq_chunks",
            "shared_chunks"]).astype("int64")

    out = ds.map_batches(per_doc, batch_format="pandas",
                         batch_size=1024).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _cdc_oracle_sql(k: int = 8, divisor: int = 64) -> str:
    return f"""
        WITH d AS MATERIALIZED (
            SELECT doc_id, lower(coalesce(text, '')) AS t
            FROM documents),
        g AS MATERIALIZED (
            SELECT d.doc_id, p.i,
                   CAST('0x' || substr(md5(substr(d.t, p.i, {k})),
                        1, 16) AS UBIGINT) % {divisor} AS hmod
            FROM d, LATERAL (SELECT unnest(range(1,
                greatest(length(d.t) - {k} + 1, 0) + 1)) AS i) p),
        cuts AS MATERIALIZED (
            SELECT doc_id, i + {k} - 1 AS c FROM g WHERE hmod = 0
            UNION
            SELECT doc_id, length(t) FROM d WHERE length(t) > 0),
        ch AS MATERIALIZED (
            SELECT doc_id, substr((SELECT t FROM d
                                   WHERE d.doc_id = cuts.doc_id),
                       coalesce(lag(c) OVER (PARTITION BY doc_id
                                             ORDER BY c), 0) + 1,
                       c - coalesce(lag(c) OVER (PARTITION BY doc_id
                                                 ORDER BY c), 0))
                       AS chunk
            FROM cuts),
        chh AS MATERIALIZED (
            SELECT DISTINCT doc_id,
                   CAST(CAST('0x' || substr(md5(chunk), 1, 16)
                        AS UBIGINT) % 9223372036854775808
                        AS BIGINT) AS chash
            FROM ch WHERE chunk <> ''),
        nd AS (SELECT chash, count(*) AS n_docs
               FROM chh GROUP BY chash),
        stats AS (
            SELECT d.doc_id, length(d.t) AS n_chars,
                   (SELECT count(*) FROM ch
                    WHERE ch.doc_id = d.doc_id
                      AND ch.chunk <> '') AS n_chunks,
                   (SELECT count(*) FROM chh
                    WHERE chh.doc_id = d.doc_id) AS uniq_chunks,
                   (SELECT count(*) FROM chh JOIN nd USING (chash)
                    WHERE chh.doc_id = d.doc_id
                      AND nd.n_docs >= 2) AS shared_chunks
            FROM d)
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               CAST(n_chars AS BIGINT) AS n_chars,
               CAST(n_chunks AS BIGINT) AS n_chunks,
               CAST(uniq_chunks AS BIGINT) AS uniq_chunks,
               CAST(shared_chunks AS BIGINT) AS shared_chunks
        FROM stats ORDER BY doc_id"""


def q_events_did(sf_dir: str):
    """Difference-in-differences estimate (the Card–Krueger '94
    two-period design, completing the SRM/CUPED experimentation
    family): arms from the md5("ab|user") parity bucketing the A/B
    family shares, periods split at the stream's integer timestamp
    midpoint, metric = mean event value. All four cell aggregates
    stay EXACT integers (event counts + value cents); the four
    means and DiD = (T̄post − T̄pre) − (C̄post − C̄pre) are computed
    in one identical expression order on both engines, rounded to
    6. ONE combiner pass over (arm, period) partials — the corpus
    never moves."""
    import pyarrow.parquet as _pq

    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    from jerex_ray.util import md5_hash64_batch
    configure_data_context()
    ts = _pq.read_table(f"{sf_dir}/events.parquet",
                        columns=["ts"])["ts"].to_pandas() \
        .astype("datetime64[us]").astype("int64")
    mid = (int(ts.min()) + int(ts.max())) // 2
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        arm = (md5_hash64_batch(
            [f"ab|{u}" for u in df["user_id"]]) % 2).astype(np.int64)
        post = (df["ts"].astype("datetime64[us]").astype("int64")
                .to_numpy() > mid).astype(np.int64)
        v = df["value"].to_numpy(np.float64)
        cents = np.copysign(np.floor(np.abs(v) * 100.0 + 0.5), v) \
            .astype(np.int64)
        g = pd.DataFrame({"arm": arm, "post": post, "c": cents,
                          "n": np.int64(1)}) \
            .groupby(["arm", "post"], sort=False, as_index=False) \
            .sum()
        return g.astype({"arm": "int64", "post": "int64",
                         "c": "int64", "n": "int64"})

    cells = grouped_aggregate(
        ds.map_batches(partial, batch_format="pandas",
                       batch_size=65536),
        ["arm", "post"], {"sum_cents": ("c", "sum"),
                          "n": ("n", "sum")},
        result_hint="small").to_pandas() \
        .sort_values(["arm", "post"]).reset_index(drop=True)

    def mean(arm: int, post: int) -> float:
        r = cells[(cells["arm"] == arm) & (cells["post"] == post)]
        return float(int(r["sum_cents"].iloc[0])
                     / (int(r["n"].iloc[0]) * 100.0))

    did = (mean(1, 1) - mean(1, 0)) - (mean(0, 1) - mean(0, 0))
    cells["mean_value"] = [
        _round_half_away(mean(int(a), int(p)), 6)
        for a, p in zip(cells["arm"], cells["post"])]
    cells["did"] = _round_half_away(did, 6)
    return cells[["arm", "post", "n", "sum_cents", "mean_value",
                  "did"]]


_DID_ORACLE_SQL = """
    WITH b AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2
                   AS mid FROM events),
    cells AS MATERIALIZED (
        SELECT CAST('0x' || substr(md5('ab|' ||
                   CAST(user_id AS VARCHAR)), 1, 16) AS UBIGINT)
                   % 2 AS arm,
               CASE WHEN epoch_us(ts) > (SELECT mid FROM b)
                    THEN 1 ELSE 0 END AS post,
               CAST(sum(CAST(round(value * 100.0, 0) AS BIGINT))
                    AS BIGINT) AS sum_cents,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2),
    m AS (SELECT
        (SELECT sum_cents / (n * 100.0) FROM cells
         WHERE arm = 1 AND post = 1) AS t1,
        (SELECT sum_cents / (n * 100.0) FROM cells
         WHERE arm = 1 AND post = 0) AS t0,
        (SELECT sum_cents / (n * 100.0) FROM cells
         WHERE arm = 0 AND post = 1) AS c1,
        (SELECT sum_cents / (n * 100.0) FROM cells
         WHERE arm = 0 AND post = 0) AS c0)
    SELECT CAST(cells.arm AS BIGINT) AS arm,
           CAST(cells.post AS BIGINT) AS post, cells.n,
           cells.sum_cents,
           round(cells.sum_cents / (cells.n * 100.0), 6)
               AS mean_value,
           round((m.t1 - m.t0) - (m.c1 - m.c0), 6) AS did
    FROM cells CROSS JOIN m ORDER BY arm, post"""


def q_events_lincount(sf_dir: str, *, m: int = 4096):
    """Linear-counting distinct estimate (Whang et al. '90 — the
    load-factor sketch completing the HLL/KMV/AMS/CMS/Bloom family)
    of the distinct event users: bitmap position md5("lc|u") % m,
    estimate = m·ln(m/(m−occupied)). The ONLY cross-cluster state
    is the position table (≤ m rows through the combiner — the
    Bloom-bitmap contract); the exact distinct count rides the same
    pass for the error column. ln is glibc on both engines; one
    final expression, rounded to 6."""
    import math

    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    from jerex_ray.util import md5_hash64_batch
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id"])
    users = grouped_aggregate(ds, ["user_id"],
                              {"n": (None, "count")})
    exact = users.count()

    def pos(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "user_id" not in df.columns:
            return pd.DataFrame({"p": pd.Series(dtype="int64")})
        h = (md5_hash64_batch([f"lc|{u}" for u in df["user_id"]])
             % m).astype(np.int64)
        return pd.DataFrame({"p": np.unique(h)})

    occ = grouped_aggregate(users.map_batches(
        pos, batch_format="pandas"), ["p"],
        {"n": (None, "count")}).count()
    est = m * math.log(m / float(m - occ))
    return pd.DataFrame({
        "m": np.array([m], dtype=np.int64),
        "occupied": np.array([occ], dtype=np.int64),
        "exact_distinct": np.array([exact], dtype=np.int64),
        "estimate": [_round_half_away(est, 6)],
        "rel_err": [_round_half_away(est / exact - 1.0, 6)]})


def _lincount_oracle_sql(m: int = 4096) -> str:
    return f"""
        WITH u AS (SELECT DISTINCT user_id FROM events),
        p AS (SELECT DISTINCT CAST('0x' || substr(md5('lc|' ||
                  CAST(user_id AS VARCHAR)), 1, 16) AS UBIGINT)
                  % {m} AS p
              FROM u),
        s AS (SELECT (SELECT count(*) FROM p) AS occ,
                     (SELECT count(*) FROM u) AS ex)
        SELECT CAST({m} AS BIGINT) AS m,
               CAST(occ AS BIGINT) AS occupied,
               CAST(ex AS BIGINT) AS exact_distinct,
               round({m} * ln({m} / CAST({m} - occ AS DOUBLE)), 6)
                   AS estimate,
               round({m} * ln({m} / CAST({m} - occ AS DOUBLE)) / ex
                     - 1.0, 6) AS rel_err
        FROM s"""


def q_events_mann_kendall(sf_dir: str):
    """Mann–Kendall trend test (Mann '45 / Kendall '75 — the
    nonparametric significance twin of the Theil–Sen slope) on the
    zero-filled hourly count series: S = Σ_{i<j} sign(y_j − y_i)
    and the tie-corrected variance Var(S) = [n(n−1)(2n+5) −
    Σ_t t(t−1)(2t+5)]/18 are EXACT INTEGERS (variance carried ×18),
    so the only floats are the final continuity-corrected
    Z = (S∓1)/√Var — one identical expression on both engines.
    ONE time-bounded combiner pass reduces the corpus to the hour
    grid; the O(T²) sign count is one vectorized comparison matrix
    driver-side on that metadata-sized series."""
    import math

    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = (df["ts"].astype("datetime64[us]").astype("int64")
             // 3_600_000_000)
        v, c = np.unique(h.to_numpy(np.int64), return_counts=True)
        return pd.DataFrame({"h": v, "y": c.astype(np.int64)})

    g = grouped_aggregate(
        ds.map_batches(partial, batch_format="pandas",
                       batch_size=65536),
        ["h"], {"y": ("y", "sum")}, result_hint="small").to_pandas()
    h0 = int(g["h"].min())
    T = int(g["h"].max()) - h0 + 1
    y = np.zeros(T, dtype=np.int64)
    y[g["h"].to_numpy(np.int64) - h0] = g["y"].to_numpy(np.int64)
    diff = np.sign(y[None, :] - y[:, None])
    S = int(np.triu(diff, 1).sum())
    _, tie = np.unique(y, return_counts=True)
    var18 = int(T) * (T - 1) * (2 * T + 5) \
        - int(sum(int(t) * (t - 1) * (2 * t + 5) for t in tie))
    var = var18 / 18.0
    z = ((S - 1) / math.sqrt(var) if S > 0
         else (S + 1) / math.sqrt(var) if S < 0 else 0.0)
    return pd.DataFrame({
        "n": np.array([T], dtype=np.int64),
        "s": np.array([S], dtype=np.int64),
        "var18": np.array([var18], dtype=np.int64),
        "z": [_round_half_away(z, 6)]})


_MANN_KENDALL_ORACLE_SQL = """
    WITH b AS (SELECT min(epoch_us(ts) // 3600000000) AS h0,
                      max(epoch_us(ts) // 3600000000) AS h1
               FROM events),
    hrs AS (SELECT unnest(range(0, CAST(h1 - h0 + 1 AS BIGINT)))
                   AS h FROM b),
    raw AS (SELECT epoch_us(ts) // 3600000000
                   - (SELECT h0 FROM b) AS h, count(*) AS y
            FROM events GROUP BY 1),
    grid AS MATERIALIZED (
        SELECT hrs.h, coalesce(raw.y, 0) AS y
        FROM hrs LEFT JOIN raw ON raw.h = hrs.h),
    s AS (SELECT CAST(sum(CASE WHEN b.y > a.y THEN 1
                               WHEN b.y < a.y THEN -1
                               ELSE 0 END) AS BIGINT) AS s
          FROM grid a JOIN grid b ON a.h < b.h),
    n AS (SELECT count(*) AS n FROM grid),
    ties AS (SELECT CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0)
                         AS BIGINT) AS tt
             FROM (SELECT count(*) AS t FROM grid GROUP BY y)),
    v AS (SELECT CAST(n.n * (n.n - 1) * (2 * n.n + 5) - ties.tt
                      AS BIGINT) AS var18
          FROM n CROSS JOIN ties)
    SELECT CAST(n.n AS BIGINT) AS n, s.s, v.var18,
           round(CASE WHEN s.s > 0
                      THEN (s.s - 1) / sqrt(v.var18 / 18.0)
                      WHEN s.s < 0
                      THEN (s.s + 1) / sqrt(v.var18 / 18.0)
                      ELSE 0.0 END, 6) AS z
    FROM n CROSS JOIN s CROSS JOIN v"""


def doc_source_logodds(sf_dir: str, *, alpha: float = 0.01,
                       top: int = 10):
    """Log-odds-ratio with informative Dirichlet prior (Monroe et
    al. '08, "Fightin' Words") between the two largest sources (doc
    count DESC, name ASC): the per-word "which words distinguish
    source A from B" ranking that the distribution-level KL/Jaccard
    source audits can't give. δ_w = ln((y1+α)/(n1+αV−y1−α)) −
    ln((y2+α)/(n2+αV−y2−α)), z = δ/√(1/(y1+α)+1/(y2+α)); counts
    are exact integers from ONE (source, word) combiner pass, and
    the ranking cut (|z| DESC, word ASC) is decided by the
    identical glibc-ln double on both engines (the t-closeness
    convention). Returns the top-``top`` discriminating words."""
    import math

    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "source", "text"])

    ndocs = grouped_aggregate(
        ds.map_batches(lambda df: df[["source", "doc_id"]]
                       .drop_duplicates(), batch_format="pandas"),
        ["source"], {"n": (None, "count")}).to_pandas()
    ndocs = ndocs.sort_values(["n", "source"],
                              ascending=[False, True])
    sa, sb = str(ndocs["source"].iloc[0]), \
        str(ndocs["source"].iloc[1])

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        m = batch[batch["source"].isin([sa, sb])]
        words = m["text"].fillna("").str.lower().str.split()
        lens = words.str.len().fillna(0).to_numpy(dtype=np.int64)
        if lens.sum() == 0:
            return pd.DataFrame({"source": pd.Series(dtype="object"),
                                 "w": pd.Series(dtype="object"),
                                 "c": pd.Series(dtype="int64")})
        flat = np.concatenate([w for w in words.to_numpy() if w])
        src = np.repeat(m["source"].to_numpy(), lens)
        g = pd.DataFrame({"source": src, "w": flat}) \
            .groupby(["source", "w"], sort=False).size() \
            .reset_index(name="c")
        g["c"] = g["c"].astype("int64")
        return g

    wc = grouped_aggregate(
        ds.map_batches(explode, batch_format="pandas",
                       batch_size=4096),
        ["source", "w"], {"c": ("c", "sum")}).to_pandas()
    piv = wc.pivot_table(index="w", columns="source", values="c",
                         fill_value=0, aggfunc="sum")
    y1 = piv.get(sa, pd.Series(0, index=piv.index)) \
        .to_numpy(np.int64)
    y2 = piv.get(sb, pd.Series(0, index=piv.index)) \
        .to_numpy(np.int64)
    n1, n2 = int(y1.sum()), int(y2.sum())
    V = len(piv)
    A = alpha * V
    words = piv.index.to_numpy()
    rows = []
    for w, a_, b_ in zip(words, y1, y2):
        d = (math.log((a_ + alpha) / (n1 + A - a_ - alpha))
             - math.log((b_ + alpha) / (n2 + A - b_ - alpha)))
        z = d / math.sqrt(1.0 / (a_ + alpha) + 1.0 / (b_ + alpha))
        rows.append((str(w), int(a_), int(b_), z))
    rows.sort(key=lambda r: (-abs(r[3]), r[0]))
    out = pd.DataFrame(rows[:top],
                       columns=["word", "y1", "y2", "z"])
    out["source_a"], out["source_b"] = sa, sb
    out["z"] = [_round_half_away(z, 6) for z in out["z"]]
    out = out.astype({"y1": "int64", "y2": "int64"})
    return out[["source_a", "source_b", "word", "y1", "y2", "z"]] \
        .sort_values("word").reset_index(drop=True)


def _logodds_oracle_sql(alpha: float = 0.01, top: int = 10) -> str:
    return f"""
        WITH top2 AS MATERIALIZED (
            SELECT source, row_number() OVER (
                ORDER BY count(DISTINCT doc_id) DESC, source ASC)
                AS rk
            FROM documents GROUP BY source QUALIFY rk <= 2),
        w AS MATERIALIZED (
            SELECT t.rk, unnest(list_filter(
                regexp_split_to_array(lower(coalesce(text, '')),
                                      '\\s+'), x -> x <> '')) AS w
            FROM documents d JOIN top2 t ON t.source = d.source),
        c AS MATERIALIZED (
            SELECT w,
                   CAST(count(*) FILTER (WHERE rk = 1) AS BIGINT)
                       AS y1,
                   CAST(count(*) FILTER (WHERE rk = 2) AS BIGINT)
                       AS y2
            FROM w GROUP BY w),
        tot AS (SELECT sum(y1) AS n1, sum(y2) AS n2,
                       count(*) * {alpha} AS aa FROM c),
        z AS MATERIALIZED (
            SELECT c.w, c.y1, c.y2,
                   (ln((c.y1 + {alpha})
                       / (tot.n1 + tot.aa - c.y1 - {alpha}))
                    - ln((c.y2 + {alpha})
                         / (tot.n2 + tot.aa - c.y2 - {alpha})))
                   / sqrt(1.0 / (c.y1 + {alpha})
                          + 1.0 / (c.y2 + {alpha})) AS z
            FROM c CROSS JOIN tot),
        rk AS (SELECT *, row_number() OVER (
                   ORDER BY abs(z) DESC, w ASC) AS rn FROM z)
        SELECT (SELECT source FROM top2 WHERE rk = 1) AS source_a,
               (SELECT source FROM top2 WHERE rk = 2) AS source_b,
               w AS word, y1, y2, round(z, 6) AS z
        FROM rk WHERE rn <= {top} ORDER BY word"""


def doc_multi_pattern(sf_dir: str, *, top: int = 20,
                      min_len: int = 4):
    """One-pass multi-pattern gazetteer scan (Aho–Corasick '75,
    ``ops/match.py``) of the corpus against its own top-``top``
    frequent words of length ≥ ``min_len`` (count DESC, word ASC —
    a deterministic stand-in for the PII/entity lexicon a curation
    pipeline sweeps at 100 TB): per (doc, pattern) the OVERLAPPING
    substring occurrence count, i.e. hits at every position — the
    semantics a positions × patterns SQL lateral replays exactly
    (regex/replace counting is non-overlapping and would not).
    The automaton builds ONCE PER ACTOR in ``__init__`` and every
    batch streams through it — the stateful actor-pool contract."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.ops.match import run_multi_pattern_counts
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"]) \
        .materialize()

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        words = batch["text"].fillna("").str.lower().str.split()
        flat = [w for ws in words.to_numpy() if isinstance(ws, list)
                for w in ws if len(w) >= min_len]
        if not flat:
            return pd.DataFrame({"w": pd.Series(dtype="object"),
                                 "c": pd.Series(dtype="int64")})
        u, c = np.unique(np.array(flat, dtype=object),
                         return_counts=True)
        return pd.DataFrame({"w": u, "c": c.astype(np.int64)})

    wc = grouped_aggregate(
        ds.map_batches(explode, batch_format="pandas",
                       batch_size=4096),
        ["w"], {"c": ("c", "sum")}).to_pandas()
    wc = wc.sort_values(["c", "w"], ascending=[False, True])
    patterns = [str(w) for w in wc["w"].head(top)]

    out = run_multi_pattern_counts(ds, patterns).to_pandas()
    if out.empty or "doc_id" not in out.columns:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "pattern": pd.Series(dtype="object"),
                             "n_matches": pd.Series(dtype="int64")})
    return out.sort_values(["doc_id", "pattern"]) \
        .reset_index(drop=True)


def _multi_pattern_oracle_sql(top: int = 20,
                              min_len: int = 4) -> str:
    return f"""
        WITH w AS (
            SELECT unnest(list_filter(
                regexp_split_to_array(lower(coalesce(text, '')),
                                      '\\s+'),
                x -> length(x) >= {min_len})) AS w
            FROM documents),
        pat AS MATERIALIZED (
            SELECT w AS p, row_number() OVER (
                ORDER BY count(*) DESC, w ASC) AS rk
            FROM w GROUP BY w QUALIFY rk <= {top}),
        d AS MATERIALIZED (
            SELECT doc_id, lower(coalesce(text, '')) AS t
            FROM documents),
        hits AS (
            SELECT d.doc_id, pat.p AS pattern,
                   count(*) AS n_matches
            FROM d CROSS JOIN pat,
                 LATERAL (SELECT unnest(range(1,
                     greatest(length(d.t) - length(pat.p) + 1, 0)
                     + 1)) AS i) pos
            WHERE substr(d.t, pos.i, length(pat.p)) = pat.p
            GROUP BY d.doc_id, pat.p)
        SELECT doc_id, pattern,
               CAST(n_matches AS BIGINT) AS n_matches
        FROM hits ORDER BY doc_id, pattern"""


def doc_string_complexity(sf_dir: str):
    """Stringology complexity audit of the LONGEST document
    (n_chars DESC, doc_id ASC): distinct-substring count via a
    suffix automaton (Blumer et al. '85 — Σ len(v) − len(link(v))
    over states, built online in O(n)) and the equal-letter run
    count of the Burrows–Wheeler transform (Burrows & Wheeler '94 —
    the r that r-index compressed structures scale with; low r =
    highly repetitive text). Both are EXACT integers the oracle
    recomputes from first principles: all-substrings DISTINCT count,
    and the BWT via sorted rotations of the doubled string with a
    LAG run count (equal rotations share last chars, so tie order
    cannot change runs).

    Scale shape: the doc pick is an exact per-block top-k; the O(n)
    automaton and the rotation sort run driver-side on the single
    selected payload."""
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        t = df["text"].fillna("")
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "n": t.str.len().astype(np.int64),
            "text": t})

    def block_top(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["n", "doc_id"],
                              ascending=[False, True],
                              kind="mergesort").head(1)

    top = ds.map_batches(stats, batch_format="pandas",
                         batch_size=8192) \
        .map_batches(block_top, batch_format="pandas").to_pandas()
    top = top.sort_values(["n", "doc_id"],
                          ascending=[False, True],
                          kind="mergesort").head(1)
    did = int(top["doc_id"].iloc[0])
    t = str(top["text"].iloc[0]).lower()
    n = len(t)

    # suffix automaton (online construction)
    sa_len = [0]
    sa_link = [-1]
    sa_next: list[dict] = [{}]
    last = 0
    for ch in t:
        cur = len(sa_len)
        sa_len.append(sa_len[last] + 1)
        sa_link.append(-1)
        sa_next.append({})
        p = last
        while p != -1 and ch not in sa_next[p]:
            sa_next[p][ch] = cur
            p = sa_link[p]
        if p == -1:
            sa_link[cur] = 0
        else:
            q = sa_next[p][ch]
            if sa_len[p] + 1 == sa_len[q]:
                sa_link[cur] = q
            else:
                clone = len(sa_len)
                sa_len.append(sa_len[p] + 1)
                sa_link.append(sa_link[q])
                sa_next.append(dict(sa_next[q]))
                while p != -1 and sa_next[p].get(ch) == q:
                    sa_next[p][ch] = clone
                    p = sa_link[p]
                sa_link[q] = clone
                sa_link[cur] = clone
        last = cur
    distinct = sum(sa_len[v] - sa_len[sa_link[v]]
                   for v in range(1, len(sa_len)))

    # BWT run count via sorted rotations of the doubled string
    dd = t + t
    rot = sorted(range(n), key=lambda i: dd[i:i + n])
    bwt = "".join(t[(i - 1) % n] for i in rot)
    runs = 1 + sum(1 for a, b in zip(bwt, bwt[1:]) if a != b) \
        if n else 0
    return pd.DataFrame({
        "doc_id": np.array([did], dtype=np.int64),
        "n_chars": np.array([n], dtype=np.int64),
        "distinct_substrings": np.array([distinct], dtype=np.int64),
        "bwt_runs": np.array([runs], dtype=np.int64)})


_STRING_COMPLEXITY_ORACLE_SQL = """
    WITH d AS MATERIALIZED (
        SELECT doc_id, lower(coalesce(text, '')) AS t,
               length(coalesce(text, '')) AS n,
               row_number() OVER (
                   ORDER BY length(coalesce(text, '')) DESC,
                            doc_id ASC) AS rk
        FROM documents QUALIFY rk = 1),
    subs AS (
        SELECT count(DISTINCT substr(d.t, p.i, p2.l)) AS ds
        FROM d, LATERAL (SELECT unnest(range(1, d.n + 1)) AS i) p,
             LATERAL (SELECT unnest(range(1, d.n - p.i + 2))
                      AS l) p2),
    rot AS MATERIALIZED (
        SELECT substr(d.t || d.t, p.i, d.n) AS r,
               substr(d.t, CASE WHEN p.i = 1 THEN d.n
                                ELSE p.i - 1 END, 1) AS last_ch
        FROM d, LATERAL (SELECT unnest(range(1, d.n + 1)) AS i) p),
    bwt AS (SELECT last_ch, lag(last_ch) OVER (ORDER BY r)
                       AS prev
            FROM rot),
    runs AS (SELECT 1 + count(*) FILTER (
                 WHERE prev IS NOT NULL AND last_ch <> prev)
                 AS runs
             FROM bwt)
    SELECT d.doc_id, CAST(d.n AS BIGINT) AS n_chars,
           CAST(subs.ds AS BIGINT) AS distinct_substrings,
           CAST(runs.runs AS BIGINT) AS bwt_runs
    FROM d CROSS JOIN subs CROSS JOIN runs"""


def q_events_kendall_tau(sf_dir: str):
    """Kendall τ-b rank correlation (Kendall '45, the tie-corrected
    form) between the hourly event COUNT and the hourly total VALUE
    in integer cents — the ordinal companion of the Pearson
    correlation and Theil–Sen queries: concordant/discordant pair
    counts and both tie terms are EXACT INTEGERS (vectorized sign
    matrices over the time-bounded grid), the only float is the
    final τ = (C−D)/√((n0−n1)(n0−n2)) expression, identical on
    both engines. ONE combiner pass reduces the corpus to the hour
    grid; the O(T²) pair census is two sign matmuls driver-side."""
    import math

    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = (df["ts"].astype("datetime64[us]").astype("int64")
             // 3_600_000_000).to_numpy(np.int64)
        v = df["value"].to_numpy(np.float64)
        cents = np.copysign(np.floor(np.abs(v) * 100.0 + 0.5), v) \
            .astype(np.int64)
        g = pd.DataFrame({"h": h, "n": np.int64(1), "c": cents}) \
            .groupby("h", sort=False, as_index=False).sum()
        return g.astype({"h": "int64", "n": "int64", "c": "int64"})

    g = grouped_aggregate(
        ds.map_batches(partial, batch_format="pandas",
                       batch_size=65536),
        ["h"], {"n": ("n", "sum"), "c": ("c", "sum")},
        result_hint="small").to_pandas()
    h0 = int(g["h"].min())
    T = int(g["h"].max()) - h0 + 1
    x = np.zeros(T, dtype=np.int64)
    y = np.zeros(T, dtype=np.int64)
    idx = g["h"].to_numpy(np.int64) - h0
    x[idx] = g["n"].to_numpy(np.int64)
    y[idx] = g["c"].to_numpy(np.int64)
    sx = np.sign(x[None, :] - x[:, None])
    sy = np.sign(y[None, :] - y[:, None])
    prod = np.triu(sx * sy, 1)
    C = int((prod == 1).sum())
    D = int((prod == -1).sum())
    n0 = T * (T - 1) // 2
    _, tx = np.unique(x, return_counts=True)
    _, ty = np.unique(y, return_counts=True)
    n1 = int(sum(int(t) * (t - 1) // 2 for t in tx))
    n2 = int(sum(int(t) * (t - 1) // 2 for t in ty))
    tau = (C - D) / math.sqrt(float((n0 - n1)) * (n0 - n2))
    return pd.DataFrame({
        "n": np.array([T], dtype=np.int64),
        "concordant": np.array([C], dtype=np.int64),
        "discordant": np.array([D], dtype=np.int64),
        "ties_x": np.array([n1], dtype=np.int64),
        "ties_y": np.array([n2], dtype=np.int64),
        "tau_b": [_round_half_away(tau, 6)]})


_KENDALL_TAU_ORACLE_SQL = """
    WITH b AS (SELECT min(epoch_us(ts) // 3600000000) AS h0,
                      max(epoch_us(ts) // 3600000000) AS h1
               FROM events),
    hrs AS (SELECT unnest(range(0, CAST(h1 - h0 + 1 AS BIGINT)))
                   AS h FROM b),
    raw AS (SELECT epoch_us(ts) // 3600000000
                   - (SELECT h0 FROM b) AS h,
                   count(*) AS n,
                   sum(CAST(round(value * 100.0, 0) AS BIGINT))
                       AS c
            FROM events GROUP BY 1),
    grid AS MATERIALIZED (
        SELECT hrs.h, coalesce(raw.n, 0) AS x,
               coalesce(raw.c, 0) AS y
        FROM hrs LEFT JOIN raw ON raw.h = hrs.h),
    pairs AS (
        SELECT CAST(count(*) FILTER (WHERE
                   (b.x - a.x) * (b.y - a.y) > 0) AS BIGINT) AS c,
               CAST(count(*) FILTER (WHERE
                   (b.x - a.x) * (b.y - a.y) < 0) AS BIGINT) AS d
        FROM grid a JOIN grid b ON a.h < b.h),
    n AS (SELECT count(*) AS n FROM grid),
    tx AS (SELECT CAST(coalesce(sum(t * (t - 1) // 2), 0)
                       AS BIGINT) AS n1
           FROM (SELECT count(*) AS t FROM grid GROUP BY x)),
    ty AS (SELECT CAST(coalesce(sum(t * (t - 1) // 2), 0)
                       AS BIGINT) AS n2
           FROM (SELECT count(*) AS t FROM grid GROUP BY y))
    SELECT CAST(n.n AS BIGINT) AS n, pairs.c AS concordant,
           pairs.d AS discordant, tx.n1 AS ties_x, ty.n2 AS ties_y,
           round((pairs.c - pairs.d) / sqrt(
               CAST(n.n * (n.n - 1) // 2 - tx.n1 AS DOUBLE)
               * (n.n * (n.n - 1) // 2 - ty.n2)), 6) AS tau_b
    FROM n CROSS JOIN pairs CROSS JOIN tx CROSS JOIN ty"""


def q_events_perm_test(sf_dir: str, *, n_perms: int = 20):
    """Derandomized permutation test (Fisher '35 exact-resampling
    logic, md5-seeded — the resampling member of the
    Welch/chi²/KS/logrank testing family): does mean event value
    differ between the md5("ab|u") arms? Each pseudo-permutation k
    reassigns users by md5("perm{k}|u") parity; the mean
    difference comparison |diff_k| ≥ |diff_obs| is decided EXACTLY
    by cross-multiplied integer cents (|s1·n0 − s0·n1| terms scaled
    by the other side's n1·n0 — Python big ints here, HUGEINT in
    the oracle), so the p-value (more_extreme+1)/(K+1) carries zero
    float hazard. ONE combiner pass computes all K+1 labelings'
    (arm, sum, n) cells at once; the K-bounded comparison table is
    driver-side."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    from jerex_ray.util import md5_hash64_batch
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["user_id", "value"])

    salts = ["ab"] + [f"perm{k}" for k in range(n_perms)]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value"].to_numpy(np.float64)
        cents = np.copysign(np.floor(np.abs(v) * 100.0 + 0.5), v) \
            .astype(np.int64)
        users = df["user_id"].to_numpy()
        frames = []
        for ki, salt in enumerate(salts):
            arm = (md5_hash64_batch(
                [f"{salt}|{u}" for u in users]) % 2).astype(np.int64)
            g = pd.DataFrame({"k": np.int64(ki), "arm": arm,
                              "s": cents, "n": np.int64(1)}) \
                .groupby(["k", "arm"], sort=False, as_index=False) \
                .sum()
            frames.append(g)
        return pd.concat(frames, ignore_index=True).astype(
            {"k": "int64", "arm": "int64", "s": "int64",
             "n": "int64"})

    cells = grouped_aggregate(
        ds.map_batches(partial, batch_format="pandas",
                       batch_size=65536),
        ["k", "arm"], {"s": ("s", "sum"), "n": ("n", "sum")},
        result_hint="small").to_pandas()

    def stat(ki: int) -> tuple[int, int]:
        """(|s1·n0 − s0·n1|, n1·n0) as exact Python ints."""
        c = cells[cells["k"] == ki]
        r0 = c[c["arm"] == 0].iloc[0]
        r1 = c[c["arm"] == 1].iloc[0]
        num = abs(int(r1["s"]) * int(r0["n"])
                  - int(r0["s"]) * int(r1["n"]))
        return num, int(r1["n"]) * int(r0["n"])

    num_o, den_o = stat(0)
    more = sum(1 for ki in range(1, n_perms + 1)
               if stat(ki)[0] * den_o >= num_o * stat(ki)[1])
    p = (more + 1) / (n_perms + 1)
    return pd.DataFrame({
        "n_perms": np.array([n_perms], dtype=np.int64),
        "more_extreme": np.array([more], dtype=np.int64),
        "diff_obs": [_round_half_away(num_o / den_o / 100.0
                                      if den_o else 0.0, 6)],
        "p_value": [_round_half_away(p, 6)]})


def _perm_test_oracle_sql(n_perms: int = 20) -> str:
    return f"""
        WITH salts AS (
            SELECT 0 AS k, 'ab' AS salt
            UNION ALL
            SELECT i + 1, 'perm' || CAST(i AS VARCHAR)
            FROM (SELECT unnest(range({n_perms})) AS i)),
        cells AS MATERIALIZED (
            SELECT s.k,
                   CAST('0x' || substr(md5(s.salt || '|' ||
                       CAST(e.user_id AS VARCHAR)), 1, 16)
                       AS UBIGINT) % 2 AS arm,
                   CAST(sum(CAST(round(e.value * 100.0, 0)
                                 AS BIGINT)) AS HUGEINT) AS sm,
                   CAST(count(*) AS HUGEINT) AS n
            FROM events e CROSS JOIN salts s
            GROUP BY 1, 2),
        st AS MATERIALIZED (
            SELECT a.k, abs(b.sm * a.n - a.sm * b.n) AS num,
                   b.n * a.n AS den
            FROM cells a JOIN cells b ON a.k = b.k
            WHERE a.arm = 0 AND b.arm = 1),
        obs AS (SELECT num, den FROM st WHERE k = 0),
        cmp AS (SELECT CAST(count(*) FILTER (
                    WHERE st.num * obs.den >= obs.num * st.den)
                    AS BIGINT) AS more
                FROM st CROSS JOIN obs WHERE st.k > 0)
        SELECT CAST({n_perms} AS BIGINT) AS n_perms,
               cmp.more AS more_extreme,
               round(CAST(obs.num AS DOUBLE) / CAST(obs.den
                     AS DOUBLE) / 100.0, 6) AS diff_obs,
               round((cmp.more + 1) / ({n_perms} + 1.0), 6)
                   AS p_value
        FROM cmp CROSS JOIN obs"""


def q_part_luby_mis(sf_dir: str, *, oracle_rounds: int = 8,
                    min_cocount: int = 2):
    """Maximal independent set by derandomized Luby rounds (Luby
    '86 — THE parallel-round symmetry-breaking algorithm; md5 node
    priorities replace its coin flips, the engine's seeded-sampling
    convention) over the repeat co-purchase graph: each round every
    still-alive node with a strictly smaller md5 priority than ALL
    alive neighbors joins the MIS, then it and its neighbors leave
    the graph. Pure order tests on distinct-w.h.p. hashes with the
    (priority, node) strict tie key — deterministic,
    shard-independent, and replayed round-by-round by the generated
    CTE oracle. Independence and maximality are pytest-verified.

    Scale shape: per round ONE streaming pass over the never-moving
    edge Dataset with the alive-set broadcast computes per-node min
    neighbor priority partials (combiner); winners and removals are
    node-bounded driver work. Rounds are O(log n) w.h.p.; asserts
    convergence within the oracle's unrolled depth."""
    import ray

    from jerex_ray.util import md5_hash64
    configure_data_context()
    edges = _repeat_copurchase_edges(
        sf_dir, min_cocount=min_cocount).materialize()
    nd = edges.map_batches(
        lambda df: pd.DataFrame({"u": np.unique(np.r_[
            df["a"].to_numpy(np.int64), df["b"].to_numpy(np.int64)])})
        if "a" in df.columns and len(df) else
        pd.DataFrame({"u": pd.Series(dtype="int64")}),
        batch_format="pandas").to_pandas()
    nodes = sorted(int(u) for u in np.unique(nd["u"].to_numpy())) \
        if "u" in nd.columns and len(nd) else []
    prio = {u: (md5_hash64(f"mis|{u}"), u) for u in nodes}
    alive = set(nodes)
    mis: set[int] = set()
    rounds = 0
    while alive:
        rounds += 1
        assert rounds <= oracle_rounds, \
            f"Luby still running at round {rounds} > {oracle_rounds}"
        aref = ray.put(alive)

        def min_nbr(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty or "a" not in df.columns:
                return pd.DataFrame({
                    "u": pd.Series(dtype="int64"),
                    "h": pd.Series(dtype="uint64"),
                    "n": pd.Series(dtype="int64")})
            al = ray.get(aref)
            a = df["a"].to_numpy(np.int64)
            b = df["b"].to_numpy(np.int64)
            keep = np.array([x in al and y in al
                             for x, y in zip(a, b)], dtype=bool)
            a, b = a[keep], b[keep]
            both = pd.DataFrame({
                "u": np.r_[a, b],
                "h": np.array([prio[int(v)][0] for v in
                               np.r_[b, a]], dtype=np.uint64),
                "n": np.r_[b, a]})
            both = both.sort_values(["u", "h", "n"],
                                    kind="mergesort")
            return both.drop_duplicates("u")

        partials = edges.map_batches(
            min_nbr, batch_format="pandas").to_pandas()
        best: dict[int, tuple] = {}
        if "u" in partials.columns:
            for r in partials.itertuples():
                k = (np.uint64(r.h), int(r.n))
                u = int(r.u)
                if u not in best or k < best[u]:
                    best[u] = k
        winners = {u for u in alive
                   if u not in best
                   or (prio[u][0], u) < (int(best[u][0]),
                                         int(best[u][1]))}
        mis |= winners
        # second streaming pass: ALL alive neighbors of winners
        # leave (not just nodes whose MIN-priority neighbor won)
        wref = ray.put(winners)

        def nbr_of_winner(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty or "a" not in df.columns:
                return pd.DataFrame({"u": pd.Series(dtype="int64")})
            w = ray.get(wref)
            al = ray.get(aref)
            a = df["a"].to_numpy(np.int64)
            b = df["b"].to_numpy(np.int64)
            out = [int(x) for x, y in zip(a, b)
                   if int(x) in al and int(y) in w]
            out += [int(y) for x, y in zip(a, b)
                    if int(y) in al and int(x) in w]
            return pd.DataFrame({"u": np.unique(
                np.array(out, dtype=np.int64))})

        rem = edges.map_batches(nbr_of_winner,
                                batch_format="pandas").to_pandas()
        removed = set(winners)
        if "u" in rem.columns:
            removed |= {int(u) for u in rem["u"]}
        alive -= removed
    return pd.DataFrame({"node": sorted(mis)}).astype("int64")


def _luby_mis_oracle_sql(rounds: int = 8,
                         min_cocount: int = 2) -> str:
    """Per-round Luby replay: alive edges under the current set,
    per-node strict-key min neighbor priority, winners, and the
    winner+neighbor removal."""
    h = ("CAST('0x' || substr(md5('mis|' || CAST({x} AS VARCHAR)), "
         "1, 16) AS UBIGINT)")
    sql = f"""
        WITH inc AS MATERIALIZED (
            SELECT DISTINCT l_orderkey AS o, l_partkey AS p
            FROM lineitem),
        e0 AS MATERIALIZED (
            SELECT a.p AS a, b.p AS b
            FROM inc a JOIN inc b ON a.o = b.o AND a.p < b.p
            GROUP BY a.p, b.p HAVING count(*) >= {min_cocount}),
        sym AS MATERIALIZED (
            SELECT a AS u, b AS v FROM e0
            UNION ALL SELECT b, a FROM e0),
        alive1 AS (SELECT DISTINCT u FROM sym)"""
    for r in range(1, rounds + 1):
        sql += f""",
        mn{r} AS MATERIALIZED (
            SELECT s.u, min(struct_pack(
                       h := {h.format(x='s.v')}, n := s.v)) AS k
            FROM sym s
            JOIN alive{r} x ON x.u = s.u
            JOIN alive{r} y ON y.u = s.v
            GROUP BY s.u),
        win{r} AS MATERIALIZED (
            SELECT a.u FROM alive{r} a LEFT JOIN mn{r} m
                 ON m.u = a.u
            WHERE m.u IS NULL
               OR struct_pack(h := {h.format(x='a.u')}, n := a.u)
                  < m.k),
        alive{r + 1} AS MATERIALIZED (
            SELECT a.u FROM alive{r} a
            WHERE a.u NOT IN (SELECT u FROM win{r})
              AND a.u NOT IN (
                  SELECT s.u FROM sym s
                  JOIN win{r} w ON w.u = s.v
                  JOIN alive{r} x ON x.u = s.u))"""
    parts = [f"SELECT u FROM win{r}" for r in range(1, rounds + 1)]
    return sql + "\nSELECT CAST(u AS BIGINT) AS node FROM (" \
        + "\nUNION ALL ".join(parts) + ") ORDER BY node"


def q_events_median_polish(sf_dir: str, *, iters: int = 2):
    """Tukey median polish (Tukey '77 EDA ch. 10 — the robust
    two-way decomposition beside the mean-based rollups) of the
    day-of-week × hour-of-day count grid: ``iters`` alternating
    row/column median sweeps split each cell into row effect +
    column effect + residual. Worked in 16×-SCALED integers: cell
    values start as multiples of 16 and each median (average of two
    middles) at worst halves the granularity, so four sweeps stay
    EXACT integers end-to-end — no float anywhere, and the unrolled
    window-median SQL replays every sweep bit-for-bit. ONE
    vocabulary-bounded combiner pass (≤168 cells) crosses the
    cluster; the sweeps run driver-side on that grid."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].astype("datetime64[us]").astype("int64")
        days = us // 86_400_000_000
        dow = ((days + 4) % 7).astype(np.int64)   # 1970-01-01 = Thu
        hod = ((us // 3_600_000_000) % 24).astype(np.int64)
        g = pd.DataFrame({"dow": dow, "hod": hod}) \
            .groupby(["dow", "hod"], sort=False).size() \
            .reset_index(name="c")
        return g.astype({"dow": "int64", "hod": "int64",
                         "c": "int64"})

    g = grouped_aggregate(
        ds.map_batches(partial, batch_format="pandas",
                       batch_size=65536),
        ["dow", "hod"], {"c": ("c", "sum")},
        result_hint="small").to_pandas()
    M = np.zeros((7, 24), dtype=np.int64)
    M[g["dow"].to_numpy(np.int64), g["hod"].to_numpy(np.int64)] = \
        g["c"].to_numpy(np.int64)
    R = M * 16                      # scaled residuals
    row_eff = np.zeros(7, dtype=np.int64)
    col_eff = np.zeros(24, dtype=np.int64)
    for _ in range(iters):
        rm = np.median(R, axis=1).astype(np.int64)
        R = R - rm[:, None]
        row_eff = row_eff + rm
        cm = np.median(R, axis=0).astype(np.int64)
        R = R - cm[None, :]
        col_eff = col_eff + cm
    dows = np.repeat(np.arange(7, dtype=np.int64), 24)
    hods = np.tile(np.arange(24, dtype=np.int64), 7)
    return pd.DataFrame({
        "dow": dows, "hod": hods,
        "y": M[dows, hods],
        "row_eff16": row_eff[dows],
        "col_eff16": col_eff[hods],
        "resid16": R[dows, hods]})


def _median_polish_oracle_sql(iters: int = 2) -> str:
    sql = """
        WITH dows AS (SELECT unnest(range(7)) AS dow),
        hods AS (SELECT unnest(range(24)) AS hod),
        raw AS (SELECT ((epoch_us(ts) // 86400000000) + 4) % 7
                           AS dow,
                       (epoch_us(ts) // 3600000000) % 24 AS hod,
                       count(*) AS c
                FROM events GROUP BY 1, 2),
        m0 AS MATERIALIZED (
            SELECT dows.dow, hods.hod,
                   coalesce(raw.c, 0) AS y,
                   coalesce(raw.c, 0) * 16 AS v
            FROM dows CROSS JOIN hods
            LEFT JOIN raw ON raw.dow = dows.dow
                         AND raw.hod = hods.hod)"""
    prev, step = "m0", 0
    reff = []
    ceff = []
    for _ in range(iters):
        step += 1
        sql += f""",
        rm{step} AS (SELECT dow, CAST(median(v) AS BIGINT) AS m
                     FROM {prev} GROUP BY dow),
        mr{step} AS MATERIALIZED (
            SELECT p.dow, p.hod, p.y, p.v - r.m AS v
            FROM {prev} p JOIN rm{step} r ON r.dow = p.dow)"""
        reff.append(f"rm{step}")
        prev = f"mr{step}"
        sql += f""",
        cm{step} AS (SELECT hod, CAST(median(v) AS BIGINT) AS m
                     FROM {prev} GROUP BY hod),
        mc{step} AS MATERIALIZED (
            SELECT p.dow, p.hod, p.y, p.v - c.m AS v
            FROM {prev} p JOIN cm{step} c ON c.hod = p.hod)"""
        ceff.append(f"cm{step}")
        prev = f"mc{step}"
    rsum = " + ".join(f"(SELECT m FROM {t} WHERE {t}.dow = f.dow)"
                      for t in reff)
    csum = " + ".join(f"(SELECT m FROM {t} WHERE {t}.hod = f.hod)"
                      for t in ceff)
    return sql + f"""
        SELECT CAST(f.dow AS BIGINT) AS dow,
               CAST(f.hod AS BIGINT) AS hod,
               CAST(f.y AS BIGINT) AS y,
               CAST({rsum} AS BIGINT) AS row_eff16,
               CAST({csum} AS BIGINT) AS col_eff16,
               CAST(f.v AS BIGINT) AS resid16
        FROM {prev} f ORDER BY dow, hod"""


def q_part_rich_club(sf_dir: str, *, min_cocount: int = 2):
    """Rich-club coefficient curve (Zhou & Mondragón '04 — do the
    hubs preferentially connect to each other?) of the repeat
    co-purchase graph: for every degree threshold k in the degree
    vocabulary, φ(k) = 2·E_k / (N_k·(N_k−1)) over the subgraph of
    nodes with degree > k. Both censuses are EXACT integers via the
    suffix trick — an edge belongs to every level below
    min(deg_a, deg_b), a node to every level below its degree, so
    one histogram + reverse cumulative per side replaces any
    per-level subgraph pass; the single divide is the identical
    double on both engines. Degrees come from one combiner pass and
    broadcast as the node-bounded map; edge min-degrees from one
    streaming pass."""
    import ray

    from jerex_ray.functions.aggregate import grouped_aggregate
    configure_data_context()
    edges = _repeat_copurchase_edges(
        sf_dir, min_cocount=min_cocount).materialize()
    deg_df = grouped_aggregate(
        edges.map_batches(
            lambda df: pd.DataFrame({"u": np.r_[
                df["a"].to_numpy(np.int64),
                df["b"].to_numpy(np.int64)]})
            if "a" in df.columns and len(df) else
            pd.DataFrame({"u": pd.Series(dtype="int64")}),
            batch_format="pandas"),
        ["u"], {"d": (None, "count")}).to_pandas()
    dmap = dict(zip(deg_df["u"].astype("int64"),
                    deg_df["d"].astype("int64")))
    dref = ray.put(dmap)

    def edge_mindeg(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "a" not in df.columns:
            return pd.DataFrame({"md": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64")})
        dm = ray.get(dref)
        md = np.minimum(df["a"].map(dm).to_numpy(np.int64),
                        df["b"].map(dm).to_numpy(np.int64))
        u, c = np.unique(md, return_counts=True)
        return pd.DataFrame({"md": u, "n": c.astype(np.int64)})

    eh = grouped_aggregate(
        edges.map_batches(edge_mindeg, batch_format="pandas"),
        ["md"], {"n": ("n", "sum")},
        result_hint="small").to_pandas()
    degs = np.sort(deg_df["d"].to_numpy(np.int64))
    ks = np.unique(degs)[:-1]            # top level has N_k <= 1
    rows = []
    e_md = dict(zip(eh["md"].astype(int), eh["n"].astype(int)))
    for k in ks:
        Nk = int((degs > k).sum())
        if Nk < 2:
            continue
        Ek = sum(n for md, n in e_md.items() if md > k)
        rows.append((int(k), Nk, Ek,
                     _round_half_away(2.0 * Ek / (Nk * (Nk - 1)),
                                      6)))
    return pd.DataFrame(rows, columns=["k", "n_nodes", "n_edges",
                                       "phi"]).astype(
        {"k": "int64", "n_nodes": "int64", "n_edges": "int64"})


def _rich_club_oracle_sql(min_cocount: int = 2) -> str:
    return f"""
        WITH inc AS MATERIALIZED (
            SELECT DISTINCT l_orderkey AS o, l_partkey AS p
            FROM lineitem),
        e0 AS MATERIALIZED (
            SELECT a.p AS a, b.p AS b
            FROM inc a JOIN inc b ON a.o = b.o AND a.p < b.p
            GROUP BY a.p, b.p HAVING count(*) >= {min_cocount}),
        deg AS MATERIALIZED (
            SELECT u, count(*) AS d FROM (
                SELECT a AS u FROM e0
                UNION ALL SELECT b FROM e0)
            GROUP BY u),
        ks AS (SELECT DISTINCT d AS k FROM deg
               WHERE d < (SELECT max(d) FROM deg)),
        lv AS MATERIALIZED (
            SELECT ks.k,
                   (SELECT count(*) FROM deg
                    WHERE deg.d > ks.k) AS n_nodes,
                   (SELECT count(*) FROM e0
                    JOIN deg da ON da.u = e0.a
                    JOIN deg db ON db.u = e0.b
                    WHERE least(da.d, db.d) > ks.k) AS n_edges
            FROM ks)
        SELECT CAST(k AS BIGINT) AS k,
               CAST(n_nodes AS BIGINT) AS n_nodes,
               CAST(n_edges AS BIGINT) AS n_edges,
               round(2.0 * n_edges / (n_nodes * (n_nodes - 1)), 6)
                   AS phi
        FROM lv WHERE n_nodes >= 2 ORDER BY k"""


def q_user_nelson_aalen(sf_dir: str):
    """Nelson–Aalen cumulative hazard (Nelson '72 / Aalen '78) of
    the inter-purchase durations with right-censoring — the hazard
    companion of ``q_user_km_survival`` (same one co-located LAG
    pass, same censoring-at-horizon contract): H(t) = Σ_{tᵢ≤t}
    dᵢ/nᵢ accumulated in duration order (np.cumsum ↔ the oracle's
    window prefix sum — identical sequential float order), plus
    the Breslow survival exp(−H). Integer d/n counts from the
    combiner-reduced duration grid; 6-dp mirrored rounding."""
    import math

    import pyarrow.parquet as _pq

    from jerex_ray.functions.aggregate import grouped_aggregate, grouped_apply
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts",
                                     "event_type"])
    ts_col = _pq.read_table(f"{sf_dir}/events.parquet",
                            columns=["ts"])["ts"].to_pandas()
    horizon = int(ts_col.astype("datetime64[us]").astype("int64")
                  .max())

    def durations(block: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"dur": pd.Series(dtype="int64"),
                              "cens": pd.Series(dtype="int64"),
                              "n": pd.Series(dtype="int64")})
        b = block[block["event_type"] == "purchase"]
        if b.empty:
            return empty
        b = b.sort_values(["user_id", "ts", "event_id"])
        t = b["ts"].astype("datetime64[us]").astype("int64") \
            .to_numpy()
        uid = b["user_id"].to_numpy()
        same = np.r_[uid[1:] == uid[:-1], False]
        dur = np.where(same, np.r_[t[1:], 0] - t, horizon - t)
        cens = (~same).astype(np.int64)
        g = (pd.DataFrame({"dur": dur, "cens": cens, "n": 1})
             .groupby(["dur", "cens"], sort=False).sum()
             .reset_index())
        return g

    grid = grouped_aggregate(
        grouped_apply(ds, ["user_id"], durations),
        ["dur", "cens"], {"n": ("n", "sum")}).to_pandas()
    grid = grid.sort_values("dur").reset_index(drop=True)
    total = int(grid["n"].sum())
    by_t = grid.groupby("dur").agg(all_n=("n", "sum")).reset_index()
    dcounts = grid[grid["cens"] == 0].groupby("dur")["n"].sum()
    by_t["d"] = by_t["dur"].map(dcounts).fillna(0).astype(np.int64)
    before = np.r_[0, np.cumsum(
        by_t["all_n"].to_numpy(np.int64))[:-1]]
    by_t["n_risk"] = total - before
    ev = by_t[by_t["d"] > 0].reset_index(drop=True)
    terms = [int(r["d"]) / float(r["n_risk"])
             for _, r in ev.iterrows()]
    H = np.cumsum(terms) if terms else np.array([])
    return pd.DataFrame({
        "dur_us": ev["dur"].astype("int64"),
        "n_risk": ev["n_risk"].astype("int64"),
        "n_events": ev["d"].astype("int64"),
        "cum_hazard": [_round_half_away(h, 6) for h in H],
        "s_breslow": [_round_half_away(math.exp(-h), 6)
                      for h in H]})


_NELSON_AALEN_ORACLE_SQL = """
    WITH p AS MATERIALIZED (
        SELECT user_id, epoch_us(ts) AS t,
               lead(epoch_us(ts)) OVER (
                   PARTITION BY user_id
                   ORDER BY ts, event_id) AS nxt
        FROM events WHERE event_type = 'purchase'),
    hz AS (SELECT max(epoch_us(ts)) AS h FROM events),
    durs AS MATERIALIZED (
        SELECT CASE WHEN nxt IS NULL
                    THEN (SELECT h FROM hz) - t
                    ELSE nxt - t END AS dur,
               CASE WHEN nxt IS NULL THEN 1 ELSE 0 END AS cens
        FROM p),
    gridt AS MATERIALIZED (
        SELECT dur, count(*) AS all_n,
               count(*) FILTER (WHERE cens = 0) AS d
        FROM durs GROUP BY dur),
    risk AS MATERIALIZED (
        SELECT dur, d,
               (SELECT count(*) FROM durs) -
               coalesce(sum(all_n) OVER (ORDER BY dur
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS n_risk
        FROM gridt),
    ev AS MATERIALIZED (
        SELECT dur, d, n_risk,
               sum(d * 1.0 / n_risk) OVER (ORDER BY dur) AS h
        FROM risk WHERE d > 0)
    SELECT CAST(dur AS BIGINT) AS dur_us,
           CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d AS BIGINT) AS n_events,
           round(h, 6) AS cum_hazard,
           round(exp(-h), 6) AS s_breslow
    FROM ev ORDER BY dur_us"""


def q_events_ransac(sf_dir: str, *, k: int = 32, eps: int = 5):
    """Derandomized RANSAC line fit (Fischler & Bolles '81 — the
    outlier-immune model-fitting loop, md5-seeded like every
    sampling op here) on the hourly (t, count) points: candidate
    c picks the two DISTINCT support points with md5("ransac|c|0/1")
    ranks over the hour grid, and a point is an inlier iff its
    vertical distance to the candidate line is ≤ ``eps`` — decided
    EXACTLY by the cross-multiplied integer test
    |y·Δt − y₁·Δt − Δy·(t−t₁)| ≤ eps·|Δt| (no division anywhere).
    Best candidate by (inliers DESC, candidate ASC). ONE combiner
    pass to the grid; the k×T inlier census is one vectorized
    integer matrix driver-side; the oracle replays every candidate
    via a grid × candidates lateral."""
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.runtime import read_parquet_sized
    from jerex_ray.util import md5_hash64
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = (df["ts"].astype("datetime64[us]").astype("int64")
             // 3_600_000_000)
        v, c = np.unique(h.to_numpy(np.int64), return_counts=True)
        return pd.DataFrame({"h": v, "y": c.astype(np.int64)})

    g = grouped_aggregate(
        ds.map_batches(partial, batch_format="pandas",
                       batch_size=65536),
        ["h"], {"y": ("y", "sum")}, result_hint="small").to_pandas()
    h0 = int(g["h"].min())
    T = int(g["h"].max()) - h0 + 1
    y = np.zeros(T, dtype=np.int64)
    y[g["h"].to_numpy(np.int64) - h0] = g["y"].to_numpy(np.int64)
    t = np.arange(T, dtype=np.int64)
    rows = []
    for c in range(k):
        i = md5_hash64(f"ransac|{c}|0") % T
        j = md5_hash64(f"ransac|{c}|1") % (T - 1)
        j = j + (j >= i)                # distinct second pick
        t1, y1 = int(t[i]), int(y[i])
        dt, dy = int(t[j]) - t1, int(y[j]) - y1
        lhs = np.abs(y * dt - y1 * dt - dy * (t - t1))
        inl = int((lhs <= eps * abs(dt)).sum())
        rows.append((c, t1, int(t[j]), inl))
    rows.sort(key=lambda r: (-r[3], r[0]))
    best = rows[0]
    out = pd.DataFrame(rows, columns=["cand", "t1", "t2",
                                      "inliers"]).astype("int64")
    out["best_cand"] = np.int64(best[0])
    out["best_inliers"] = np.int64(best[3])
    return out.sort_values("cand").reset_index(drop=True)


def _ransac_oracle_sql(k: int = 32, eps: int = 5) -> str:
    h = ("CAST('0x' || substr(md5('ransac|' || CAST(c.c AS VARCHAR)"
         " || '|{b}'), 1, 16) AS UBIGINT)")
    return f"""
        WITH b AS (SELECT min(epoch_us(ts) // 3600000000) AS h0,
                          max(epoch_us(ts) // 3600000000) AS h1
                   FROM events),
        hrs AS (SELECT unnest(range(0,
                    CAST(h1 - h0 + 1 AS BIGINT))) AS t FROM b),
        raw AS (SELECT epoch_us(ts) // 3600000000
                       - (SELECT h0 FROM b) AS t, count(*) AS y
                FROM events GROUP BY 1),
        grid AS MATERIALIZED (
            SELECT hrs.t, coalesce(raw.y, 0) AS y
            FROM hrs LEFT JOIN raw ON raw.t = hrs.t),
        n AS (SELECT count(*) AS t FROM grid),
        cand AS MATERIALIZED (
            SELECT c.c,
                   CAST({h.format(b='0')} % n.t AS BIGINT) AS i,
                   CAST({h.format(b='1')} % (n.t - 1) AS BIGINT)
                       AS j0
            FROM (SELECT unnest(range({k})) AS c) c CROSS JOIN n),
        picks AS MATERIALIZED (
            SELECT c, i AS t1,
                   CASE WHEN j0 >= i THEN j0 + 1 ELSE j0 END AS t2
            FROM cand),
        lines AS MATERIALIZED (
            SELECT p.c, p.t1, p.t2, g1.y AS y1,
                   p.t2 - p.t1 AS dt, g2.y - g1.y AS dy
            FROM picks p JOIN grid g1 ON g1.t = p.t1
                         JOIN grid g2 ON g2.t = p.t2),
        census AS MATERIALIZED (
            SELECT l.c, l.t1, l.t2,
                   CAST(count(*) FILTER (WHERE
                       abs(g.y * l.dt - l.y1 * l.dt
                           - l.dy * (g.t - l.t1))
                       <= {eps} * abs(l.dt)) AS BIGINT) AS inliers
            FROM lines l CROSS JOIN grid g
            GROUP BY l.c, l.t1, l.t2),
        best AS (SELECT c AS bc, inliers AS bi FROM census
                 ORDER BY inliers DESC, c ASC LIMIT 1)
        SELECT CAST(c AS BIGINT) AS cand, CAST(t1 AS BIGINT) AS t1,
               CAST(t2 AS BIGINT) AS t2, inliers,
               CAST(best.bc AS BIGINT) AS best_cand,
               CAST(best.bi AS BIGINT) AS best_inliers
        FROM census CROSS JOIN best ORDER BY cand"""


def q_events_concurrency_histogram(sf_dir: str):
    """Time-at-concurrency histogram — for every concurrency level
    k, the total microseconds the system spent with exactly k
    sessions active (each event occupies [ts, ts + value minutes)):
    the full sweep-line distribution whose max row is
    ``q_events_max_concurrency`` and whose Σ k·dur / horizon is
    Little's-law L. Same distributed exact-prefix-sum machinery:
    endpoint explode → per-timestamp net delta (combiner) →
    quantile range buckets → per-bucket LOCAL level histograms and
    boundary metadata → driver shifts each bucket's histogram by
    its offset and adds the bucket-spanning gaps. Level keys and
    integer-µs durations are exact; nothing endpoint-sized
    collects (per-bucket histograms are level-bounded)."""
    import ray

    from jerex_ray.functions.aggregate import (grouped_aggregate,
                                               grouped_apply)
    from jerex_ray.ops.quantiles import distributed_quantiles
    from jerex_ray.runtime import read_parquet_sized
    configure_data_context()
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["ts", "value"])

    def endpoints(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"t_us": pd.Series(dtype="int64"),
                                 "d": pd.Series(dtype="int64")})
        start = df["ts"].astype("int64").to_numpy()
        dur = np.floor(df["value"].to_numpy(np.float64)
                       * 60000000.0 + 0.5).astype(np.int64)
        return pd.DataFrame({
            "t_us": np.concatenate([start, start + dur]),
            "d": np.concatenate([np.ones(len(df), dtype=np.int64),
                                 -np.ones(len(df),
                                          dtype=np.int64)])})

    nd = grouped_aggregate(ds.map_batches(endpoints,
                                          batch_format="pandas"),
                           ["t_us"], {"nd": ("d", "sum")},
                           result_hint="large").materialize()
    qs = [i / 16 for i in range(1, 16)]
    pivots = np.unique(np.asarray(
        distributed_quantiles(nd, "t_us", qs), dtype=np.float64))
    piv_ref = ray.put(pivots)

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["__b"] = np.searchsorted(
            ray.get(piv_ref), df["t_us"].to_numpy(np.float64),
            side="left").astype(np.int64)
        return out

    def bucket_partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for b, g in df.groupby("__b", sort=False):
            g = g.sort_values("t_us")
            t = g["t_us"].to_numpy(np.int64)
            cum = g["nd"].to_numpy(np.int64).cumsum()
            # in-bucket gaps at local level cum[i]
            if len(t) > 1:
                gaps = t[1:] - t[:-1]
                hist = pd.DataFrame({"lvl": cum[:-1], "dur": gaps}) \
                    .groupby("lvl")["dur"].sum()
                for lvl, dur in hist.items():
                    rows.append((int(b), 0, int(lvl), int(dur)))
            # boundary metadata row (kind=1)
            rows.append((int(b), 1, int(cum[-1]),
                         int(t[0])))
            rows.append((int(b), 2, int(t[-1]), 0))
        return pd.DataFrame(rows, columns=["__b", "kind", "a", "b2"])

    parts = grouped_apply(nd.map_batches(with_bucket,
                                         batch_format="pandas"),
                          ["__b"], bucket_partial).to_pandas()
    parts = parts.sort_values(["__b", "kind", "a"])
    buckets = sorted(int(b) for b in parts["__b"].unique())
    hist: dict[int, int] = {}
    offset = 0
    prev_last_t = None
    for b in buckets:
        pb = parts[parts["__b"] == b]
        first_t = int(pb[pb["kind"] == 1]["b2"].iloc[0])
        total = int(pb[pb["kind"] == 1]["a"].iloc[0])
        last_t = int(pb[pb["kind"] == 2]["a"].iloc[0])
        if prev_last_t is not None and first_t > prev_last_t:
            hist[offset] = hist.get(offset, 0) \
                + (first_t - prev_last_t)
        for r in pb[pb["kind"] == 0].itertuples():
            lvl = offset + int(r.a)
            hist[lvl] = hist.get(lvl, 0) + int(r.b2)
        offset += total
        prev_last_t = last_t
    out = pd.DataFrame(sorted(hist.items()),
                       columns=["level", "total_us"]) \
        .astype("int64")
    return out[out["total_us"] > 0].reset_index(drop=True)


_CONCURRENCY_HIST_ORACLE_SQL = """
    WITH ep AS (
        SELECT epoch_us(ts) AS t, 1 AS d FROM events
        UNION ALL
        SELECT epoch_us(ts)
               + CAST(value * 60000000.0 AS BIGINT), -1
        FROM events),
    nd AS MATERIALIZED (
        SELECT t, sum(d) AS nd FROM ep GROUP BY t),
    lv AS MATERIALIZED (
        SELECT t, SUM(nd) OVER (ORDER BY t) AS lvl,
               lead(t) OVER (ORDER BY t) AS nxt
        FROM nd)
    SELECT CAST(lvl AS BIGINT) AS level,
           CAST(sum(nxt - t) AS BIGINT) AS total_us
    FROM lv WHERE nxt IS NOT NULL
    GROUP BY lvl HAVING sum(nxt - t) > 0 ORDER BY level"""


def q_part_eigenvector(sf_dir: str, *, iters: int = 4,
                       scale: int = 1_000_000, min_cocount: int = 2):
    """Eigenvector centrality (Bonacich '72) by EXACT-INTEGER power
    iteration (the von Mises power method) over the repeat
    co-purchase graph — the spectral member of the centrality family
    beside degree / Katz / PageRank / HITS / harmonic / betweenness.
    Derandomized exactness: x₀ = ``scale`` for every node; each round
    y = A·x is an integer SpMV (int64 sums — order-free, zero float
    hazard), then the max-rescale x ← (y·scale) // max(y) is exact
    integer division (all values positive, so truncation = floor on
    both engines), making every round bit-replayable: the generated
    per-round CTE oracle matches bit-for-bit, and each round's argmax
    node sits at exactly ``scale``.

    Scale shape: per round ONE streaming pass over the never-moving
    edge Dataset with the node-bounded score vector broadcast via
    ``ray.put`` emits per-node partial sums (combiner); the max and
    rescale are node-bounded driver work. Overflow guard: y·scale
    must stay under 2⁶³ (asserted each round)."""
    import ray
    configure_data_context()
    edges = _repeat_copurchase_edges(
        sf_dir, min_cocount=min_cocount).materialize()
    nd = edges.map_batches(
        lambda df: pd.DataFrame({"u": np.unique(np.r_[
            df["a"].to_numpy(np.int64), df["b"].to_numpy(np.int64)])})
        if "a" in df.columns and len(df) else
        pd.DataFrame({"u": pd.Series(dtype="int64")}),
        batch_format="pandas").to_pandas()
    nodes = sorted(int(u) for u in np.unique(nd["u"].to_numpy())) \
        if "u" in nd.columns and len(nd) else []
    if not nodes:
        return pd.DataFrame({"node": pd.Series(dtype="int64"),
                             "score": pd.Series(dtype="int64")})
    x = {u: scale for u in nodes}
    for _ in range(iters):
        xref = ray.put(x)

        def spmv(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty or "a" not in df.columns:
                return pd.DataFrame({"u": pd.Series(dtype="int64"),
                                     "s": pd.Series(dtype="int64")})
            xv = ray.get(xref)
            a = df["a"].to_numpy(np.int64)
            b = df["b"].to_numpy(np.int64)
            part = pd.DataFrame({
                "u": np.r_[a, b],
                "s": np.array([xv[int(v)] for v in np.r_[b, a]],
                              dtype=np.int64)})
            g = part.groupby("u", sort=False)["s"].sum()
            return pd.DataFrame({"u": g.index.to_numpy(np.int64),
                                 "s": g.to_numpy(np.int64)})

        partials = edges.map_batches(
            spmv, batch_format="pandas").to_pandas()
        y = {u: 0 for u in nodes}
        if "u" in partials.columns:
            for r in partials.itertuples():
                y[int(r.u)] += int(r.s)
        m = max(y.values())
        assert 0 < m and m * scale < 2 ** 63, \
            "eigenvector: rescale overflow"
        x = {u: (y[u] * scale) // m for u in nodes}
    return pd.DataFrame({"node": np.array(nodes, dtype=np.int64),
                         "score": np.array([x[u] for u in nodes],
                                           dtype=np.int64)})


def _eigenvector_oracle_sql(iters: int = 4, scale: int = 1_000_000,
                            min_cocount: int = 2) -> str:
    """Per-round replay of ``q_part_eigenvector``: integer SpMV over
    the symmetric edge CTE, then the exact integer max-rescale."""
    sql = f"""
        WITH inc AS MATERIALIZED (
            SELECT DISTINCT l_orderkey AS o, l_partkey AS p
            FROM lineitem),
        e0 AS MATERIALIZED (
            SELECT a.p AS a, b.p AS b
            FROM inc a JOIN inc b ON a.o = b.o AND a.p < b.p
            GROUP BY a.p, b.p HAVING count(*) >= {min_cocount}),
        sym AS MATERIALIZED (
            SELECT a AS u, b AS v FROM e0
            UNION ALL SELECT b, a FROM e0),
        x0 AS (SELECT u, CAST({scale} AS BIGINT) AS x
               FROM (SELECT DISTINCT u FROM sym))"""
    for k in range(1, iters + 1):
        sql += f""",
        y{k} AS MATERIALIZED (
            SELECT s.u, CAST(sum(p.x) AS BIGINT) AS y
            FROM sym s JOIN x{k - 1} p ON p.u = s.v
            GROUP BY s.u),
        x{k} AS MATERIALIZED (
            SELECT u, CAST((y * {scale}) //
                (SELECT max(y) FROM y{k}) AS BIGINT) AS x
            FROM y{k})"""
    return sql + f"""
        SELECT CAST(u AS BIGINT) AS node, x AS score
        FROM x{iters} ORDER BY node"""


def emb_principal_direction(sf_dir: str, *, iters: int = 16,
                            scale: int = 10_000):
    """Top principal direction of the embedding cloud by
    EXACT-INTEGER power iteration on the d×d Gram matrix
    G = Σᵢ qᵢqᵢᵀ (Pearson 1901 / Hotelling '33 PCA's first
    component; the von Mises power method) — the SQL-oracled
    companion of the rows-only full ``emb_pca``. Vectors quantize to
    the 3-decimal mirror-rounded integer grid (the ``emb_kcenter``
    convention), so G is exact int64 from ONE distributed combiner
    pass; the ``iters`` power-iteration rounds then run driver-side
    on the d²-bounded (metadata-sized) G with Python big ints:
    y = G·w, then the mirror-truncating max-rescale
    w ← sign(y)·((|y|·scale) // max|y|) — exact integer division on
    both engines (HUGEINT in the oracle), bit-replayable with zero
    float hazard. w₀ = ones fixes the sign convention.

    Scale shape: distributed cost is ONE streaming pass regardless
    of rounds — per-block d² partial Gram sums (order-free int64)
    reduce through the combiner; nothing row-sized leaves the
    blocks. The d×d driver DP is independent of corpus size."""
    configure_data_context()
    from jerex_ray.runtime import read_parquet_sized
    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["embedding"])

    def quant(m: np.ndarray) -> np.ndarray:
        return np.copysign(np.floor(np.abs(m.astype(np.float64))
                                    * 1000.0 + 0.5), m) \
            .astype(np.int64)

    def gram_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"j": pd.Series(dtype="int64"),
                                 "k": pd.Series(dtype="int64"),
                                 "g": pd.Series(dtype="int64")})
        Q = quant(np.stack(df["embedding"].to_numpy()))
        G = Q.T @ Q  # exact: |q| ≤ ~32k ⇒ block sums fit int64
        d = G.shape[0]
        jj, kk = np.meshgrid(np.arange(d), np.arange(d),
                             indexing="ij")
        return pd.DataFrame({"j": jj.ravel(), "k": kk.ravel(),
                             "g": G.ravel()})

    parts = ds.map_batches(gram_block,
                           batch_format="pandas").to_pandas()
    if parts.empty or "j" not in parts.columns:
        return pd.DataFrame({"dim_idx": pd.Series(dtype="int64"),
                             "score": pd.Series(dtype="int64")})
    gd = parts.groupby(["j", "k"], sort=True)["g"].sum()
    d = int(parts["j"].max()) + 1
    G = [[int(gd.loc[(j, k)]) for k in range(d)] for j in range(d)]
    w = [scale] * d
    for _ in range(iters):
        y = [sum(G[j][k] * w[k] for k in range(d)) for j in range(d)]
        m = max(abs(v) for v in y)
        assert m > 0, "principal direction: zero Gram product"
        w = [(abs(v) * scale) // m * (1 if v >= 0 else -1)
             for v in y]
    return pd.DataFrame({"dim_idx": np.arange(1, d + 1,
                                              dtype=np.int64),
                         "score": np.array(w, dtype=np.int64)})


def _principal_direction_oracle_sql(iters: int = 16,
                                    scale: int = 10_000,
                                    dim: int = 64) -> str:
    """Per-round replay of ``emb_principal_direction``: quantized
    integer Gram via an explode-group pass, then HUGEINT SpMV +
    mirror-truncating max-rescale per round."""
    sql = f"""
        WITH q AS MATERIALIZED (
            SELECT vec_id, list_transform(embedding,
                x -> CAST(round(CAST(x AS DOUBLE) * 1000.0, 0)
                          AS BIGINT)) AS v
            FROM embeddings),
        idx AS (SELECT unnest(range(1, {dim + 1})) AS i),
        g AS MATERIALIZED (
            SELECT a.i AS j, b.i AS k,
                   CAST(sum(q.v[a.i] * q.v[b.i]) AS HUGEINT) AS gv
            FROM q, idx a, idx b GROUP BY a.i, b.i),
        w0 AS (SELECT i, CAST({scale} AS HUGEINT) AS w FROM idx)"""
    for r in range(1, iters + 1):
        sql += f""",
        y{r} AS MATERIALIZED (
            SELECT g.j AS i, sum(g.gv * p.w) AS y
            FROM g JOIN w{r - 1} p ON p.i = g.k GROUP BY g.j),
        m{r} AS (SELECT max(abs(y)) AS m FROM y{r}),
        w{r} AS MATERIALIZED (
            SELECT i, CASE WHEN y >= 0
                THEN (y * {scale}) // (SELECT m FROM m{r})
                ELSE -((-y * {scale}) // (SELECT m FROM m{r}))
                END AS w
            FROM y{r})"""
    return sql + f"""
        SELECT CAST(i AS BIGINT) AS dim_idx, CAST(w AS BIGINT) AS score
        FROM w{iters} ORDER BY dim_idx"""


def q_events_sprt_srm(sf_dir: str, *, p1: float = 0.55):
    """Wald's sequential probability ratio test (Wald '45) run as a
    SEQUENTIAL sample-ratio-mismatch monitor — the always-valid
    companion of the fixed-horizon ``q_events_srm`` chi-square:
    H₀ p = 0.5 vs H₁ p = ``p1`` over the md5("ab|user") treatment
    indicator stream in global (ts, event_id) order, stopping at the
    first n where LLRₙ = k·ln(p1/0.5) + (n−k)·ln((1−p1)/0.5) leaves
    (−ln 19, ln 19) (α = β = 0.05). The LLR is one identical
    float64 expression of the exact integer prefix pair (n, k) on
    both engines, so every crossing decision is bit-deterministic
    and the window-cumsum oracle replays the stopped state exactly.

    Scale shape: the prefix-sum decomposition — exact-quantile time
    buckets, ONE combiner pass for per-bucket (n, k) totals, driver
    prefix offsets over the bucket-bounded table, then one
    co-located pass finds each bucket's earliest in-bucket crossing
    under its broadcast offset; the driver reduces the ≤ #buckets
    candidate rows. Nothing event-sized ever collects."""
    import ray

    from jerex_ray.functions.aggregate import (grouped_aggregate,
                                               grouped_apply)
    from jerex_ray.ops.quantiles import distributed_quantiles
    from jerex_ray.runtime import read_parquet_sized
    from jerex_ray.util import md5_hash64_batch
    configure_data_context()
    c1 = float(np.log(p1 / 0.5))
    c0 = float(np.log((1.0 - p1) / 0.5))
    bound = float(np.log(0.95 / 0.05))
    ds = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts"])

    def obs(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"t": pd.Series(dtype="int64"),
                                 "e": pd.Series(dtype="int64"),
                                 "x": pd.Series(dtype="int64")})
        t = df["ts"].astype("datetime64[us]").astype("int64") \
            .to_numpy()
        x = (md5_hash64_batch([f"ab|{u}" for u in df["user_id"]])
             % 2).astype(np.int64)
        return pd.DataFrame({"t": t,
                             "e": df["event_id"].to_numpy(np.int64),
                             "x": x})

    o = ds.map_batches(obs, batch_format="pandas").materialize()
    qs = [i / 16 for i in range(1, 16)]
    pivots = np.unique(np.asarray(
        distributed_quantiles(o, "t", qs), dtype=np.float64))
    piv_ref = ray.put(pivots)

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["__b"] = np.searchsorted(
            ray.get(piv_ref), df["t"].to_numpy(np.float64),
            side="left").astype(np.int64)
        return out

    ob = o.map_batches(with_bucket,
                       batch_format="pandas").materialize()

    def tot_partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"__b": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64"),
                                 "k": pd.Series(dtype="int64")})
        g = df.groupby("__b", as_index=False) \
            .agg(n=("x", "size"), k=("x", "sum"))
        return g.astype("int64")

    tot = grouped_aggregate(
        ob.map_batches(tot_partial, batch_format="pandas"),
        ["__b"], {"n": ("n", "sum"), "k": ("k", "sum")},
        result_hint="small").to_pandas() \
        .sort_values("__b").reset_index(drop=True)
    tot["N0"] = tot["n"].cumsum() - tot["n"]
    tot["K0"] = tot["k"].cumsum() - tot["k"]
    off_ref = ray.put(tot[["__b", "N0", "K0"]]
                      .set_index("__b"))

    def bucket_cross(block: pd.DataFrame) -> pd.DataFrame:
        cols = {"n": pd.Series(dtype="int64"),
                "k": pd.Series(dtype="int64"),
                "llr": pd.Series(dtype="float64")}
        if block.empty or "__b" not in block.columns:
            return pd.DataFrame(cols)
        off = ray.get(off_ref)
        rows = []
        for bb, g in block.groupby("__b", sort=False):
            g = g.sort_values(["t", "e"])
            n0 = int(off.loc[int(bb), "N0"])
            k0 = int(off.loc[int(bb), "K0"])
            k = k0 + g["x"].to_numpy(np.int64).cumsum()
            n = n0 + np.arange(1, len(g) + 1, dtype=np.int64)
            llr = k * c1 + (n - k) * c0
            hit = np.flatnonzero((llr >= bound) | (llr <= -bound))
            if len(hit):
                i = int(hit[0])
                rows.append((int(n[i]), int(k[i]), float(llr[i])))
        return pd.DataFrame(rows, columns=["n", "k", "llr"]) \
            if rows else pd.DataFrame(cols)

    hits = grouped_apply(ob, ["__b"], bucket_cross).to_pandas()
    n_tot, k_tot = int(tot["n"].sum()), int(tot["k"].sum())
    if len(hits) and "n" in hits.columns:
        hits = hits.sort_values("n")
        n_, k_ = int(hits["n"].iloc[0]), int(hits["k"].iloc[0])
        llr_ = float(hits["llr"].iloc[0])
        decision = "h1" if llr_ > 0 else "h0"
    else:
        n_, k_ = n_tot, k_tot
        llr_ = k_ * c1 + (n_ - k_) * c0
        decision = "continue"
    return pd.DataFrame({
        "decision": [decision],
        "n_obs": np.array([n_], dtype=np.int64),
        "k_treat": np.array([k_], dtype=np.int64),
        "llr": [float(_round_half_away(llr_, 6))]})


def _sprt_srm_oracle_sql(p1: float = 0.55) -> str:
    """Window-cumsum replay of ``q_events_sprt_srm``: exact integer
    (n, k) prefixes in (ts, event_id) order, the identical LLR
    expression, earliest boundary crossing else the final state."""
    return f"""
        WITH obs AS (
            SELECT epoch_us(ts) AS t, event_id,
                   CAST(CAST('0x' || substr(md5('ab|' ||
                        CAST(user_id AS VARCHAR)), 1, 16) AS UBIGINT)
                        % 2 AS BIGINT) AS x
            FROM events),
        w AS (
            SELECT row_number() OVER (ORDER BY t, event_id) AS n,
                   SUM(x) OVER (ORDER BY t, event_id
                                ROWS UNBOUNDED PRECEDING) AS k
            FROM obs),
        l AS (
            SELECT n, k,
                   k * ln({p1} / 0.5)
                   + (n - k) * ln({1.0 - p1} / 0.5) AS llr
            FROM w),
        c AS (
            SELECT * FROM l
            WHERE llr >= ln(0.95 / 0.05) OR llr <= -ln(0.95 / 0.05)
            ORDER BY n LIMIT 1),
        fin AS (SELECT * FROM l ORDER BY n DESC LIMIT 1)
        SELECT decision, CAST(n AS BIGINT) AS n_obs,
               CAST(k AS BIGINT) AS k_treat, round(llr, 6) AS llr
        FROM (
            SELECT CASE WHEN llr > 0 THEN 'h1' ELSE 'h0' END
                       AS decision, n, k, llr
            FROM c
            UNION ALL
            SELECT 'continue', n, k, llr FROM fin
            WHERE (SELECT count(*) FROM c) = 0)"""


# ---------- registry ----------

def build_queries() -> dict:
    from jerex_ray import relational as R
    return {
        # KG construction (rows-only: model inference, not SQL)
        "kg_triples": kg_triples,
        "kg_triples_numpy": kg_triples_numpy,
        "kg_triples_global": kg_triples_global,
        "kg_train_loss": kg_train_loss,
        "kg_train_step": kg_train_step,
        "media_image_features": media_image_features,
        "media_audio_frames": media_audio_frames,
        "media_video_frames": media_video_frames,
        "kg_entities": kg_entities,
        "kg_mentions": kg_mentions,
        "kg_eval": kg_eval,
        "kg_eval_strict": kg_eval_strict,
        "kg_eval_evidence": kg_eval_evidence,
        "kg_joint_metrics": kg_joint_metrics,
        "q_events_welch_ttest": q_events_welch_ttest,
        # text analysis / dedup / vectors
        "doc_token_stats": doc_token_stats,
        "doc_quality": doc_quality,
        "doc_exact_dedup": doc_exact_dedup,
        "doc_langid": doc_langid,
        "doc_name_mentions": doc_name_mentions,
        "doc_entity_canonical": doc_entity_canonical,
        "doc_fingerprint": doc_fingerprint,
        "doc_split": doc_split,
        "doc_stratified_sample": doc_stratified_sample,
        "doc_mixture_sample": doc_mixture_sample,
        "doc_weighted_sample": doc_weighted_sample,
        "doc_chunks": doc_chunks,
        "doc_top_bigrams": doc_top_bigrams,
        "doc_winnowing": doc_winnowing,
        "doc_winnowing_md5": doc_winnowing_md5,
        "doc_pack_batches": doc_pack_batches,
        "doc_decontaminate": doc_decontaminate,
        "doc_decontaminate_bloom": doc_decontaminate_bloom,
        "doc_repetition": doc_repetition,
        "doc_unigram_logppl": doc_unigram_logppl,
        "doc_quality_filter": doc_quality_filter,
        "doc_heavy_hitters": doc_heavy_hitters,
        "doc_tfidf_top": doc_tfidf_top,
        "doc_bm25_scores": doc_bm25_scores,
        "doc_bm25_indexed": doc_bm25_indexed,
        "emb_label_centroids": emb_label_centroids,
        "emb_kmeans": emb_kmeans,
        "dedup_minhash_edges": dedup_minhash_edges,
        "dedup_jaccard_edges": dedup_jaccard_edges,
        "dedup_jaccard_prefix": dedup_jaccard_prefix,
        "doc_sorted_neighborhood": doc_sorted_neighborhood,
        "doc_nb_model": doc_nb_model,
        "q_part_assortativity": q_part_assortativity,
        "q_events_moments": q_events_moments,
        "q_events_holt": q_events_holt,
        "doc_nb_predict": doc_nb_predict,
        "emb_mutual_nn": emb_mutual_nn,
        "q_events_interpolate": q_events_interpolate,
        "q_lineitem_ols2": q_lineitem_ols2,
        "q_events_auc": q_events_auc,
        "doc_hapax": doc_hapax,
        "doc_zipf_slope": doc_zipf_slope,
        "q_events_decayed_sum": q_events_decayed_sum,
        "q_events_winsorized_mean": q_events_winsorized_mean,
        "q_user_als_step": q_user_als_step,
        "q_user_features": q_user_features,
        "q_events_dp_counts": q_events_dp_counts,
        "doc_sentence_stats": doc_sentence_stats,
        "q_orders_streak": q_orders_streak,
        "doc_simpson_diversity": doc_simpson_diversity,
        "q_events_entropy_rate": q_events_entropy_rate,
        "q_events_peak_hours": q_events_peak_hours,
        "q_orders_interarrival": q_orders_interarrival,
        "doc_readability": doc_readability,
        "emb_centroid_drift": emb_centroid_drift,
        "q_part_powerlaw_alpha": q_part_powerlaw_alpha,
        "emb_quantization_error": emb_quantization_error,
        "doc_rake_keywords": doc_rake_keywords,
        "q_events_type_drift": q_events_type_drift,
        "doc_ttr": doc_ttr,
        "q_events_burstiness": q_events_burstiness,
        "q_events_runs_test": q_events_runs_test,
        "doc_pair_similarity": doc_pair_similarity,
        "q_part_hits": q_part_hits,
        "q_basket_rules": q_basket_rules,
        "q_events_best_split": q_events_best_split,
        "q_user_seq_patterns": q_user_seq_patterns,
        "q_events_ks_test": q_events_ks_test,
        "q_events_attribution": q_events_attribution,
        "q_events_woe_iv": q_events_woe_iv,
        "emb_procrustes": emb_procrustes,
        "q_events_isotonic": q_events_isotonic,
        "q_lineitem_zorder": q_lineitem_zorder,
        "q_events_rate_limit": q_events_rate_limit,
        "kg_type_signatures": kg_type_signatures,
        "kg_functional_conflicts": kg_functional_conflicts,
        "kg_provenance": kg_provenance,
        "q_events_ohlc": q_events_ohlc,
        "q_user_markov_backtest": q_user_markov_backtest,
        "q_events_partition_plan": q_events_partition_plan,
        "q_events_bootstrap_ci": q_events_bootstrap_ci,
        "q_events_quantile_sketch": q_events_quantile_sketch,
        "emb_mrr": emb_mrr,
        "q_events_theilsen": q_events_theilsen,
        "q_part_modularity": q_part_modularity,
        "q_supplier_hhi": q_supplier_hhi,
        "doc_compression_ratio": doc_compression_ratio,
        "doc_postings_size": doc_postings_size,
        "kg_pr_curve": kg_pr_curve,
        "q_events_kanonymity": q_events_kanonymity,
        "q_user_ab_assignment": q_user_ab_assignment,
        "q_user_km_survival": q_user_km_survival,
        "q_user_logrank": q_user_logrank,
        "q_user_cuped": q_user_cuped,
        "q_events_changepoint": q_events_changepoint,
        "q_basket_triples": q_basket_triples,
        "q_events_hill_tail": q_events_hill_tail,
        "q_events_mutual_info": q_events_mutual_info,
        "q_events_drawdown": q_events_drawdown,
        "q_events_kmv_distinct": q_events_kmv_distinct,
        "q_events_kmv_overlap": q_events_kmv_overlap,
        "q_events_ams_f2": q_events_ams_f2,
        "doc_select_coverage": doc_select_coverage,
        "doc_dsir_select": doc_dsir_select,
        "q_events_dtw": q_events_dtw,
        "q_lineitem_hilbert": q_lineitem_hilbert,
        "q_customer_linkage_fs": q_customer_linkage_fs,
        "q_join_order_dp": q_join_order_dp,
        "q_events_ldiversity": q_events_ldiversity,
        "q_lineitem_gains": q_lineitem_gains,
        "q_part_katz": q_part_katz,
        "q_events_viterbi": q_events_viterbi,
        "q_events_butterflies": q_events_butterflies,
        "q_events_shapley": q_events_shapley,
        "q_part_walks": q_part_walks,
        "q_events_tcloseness": q_events_tcloseness,
        "q_doc_langid_kappa": q_doc_langid_kappa,
        "q_events_mondrian": q_events_mondrian,
        "q_events_voptimal": q_events_voptimal,
        "q_part_mst": q_part_mst,
        "q_events_scc": q_events_scc,
        "q_events_matrix_profile": q_events_matrix_profile,
        "q_events_emd": q_events_emd,
        "doc_vocab_coverage": doc_vocab_coverage,
        "q_events_huffman": q_events_huffman,
        "doc_budget_knapsack": doc_budget_knapsack,
        "q_part_item_cosine": q_part_item_cosine,
        "q_events_holt_winters": q_events_holt_winters,
        "q_events_bh_fdr": q_events_bh_fdr,
        "emb_kcenter_select": emb_kcenter_select,
        "q_user_lis": q_user_lis,
        "doc_heaps_law": doc_heaps_law,
        "q_user_interval_schedule": q_user_interval_schedule,
        "q_stable_matching": q_stable_matching,
        "q_doc_token_align": q_doc_token_align,
        "doc_cdc_chunks": doc_cdc_chunks,
        "q_events_did": q_events_did,
        "q_events_lincount": q_events_lincount,
        "q_events_mann_kendall": q_events_mann_kendall,
        "doc_source_logodds": doc_source_logodds,
        "doc_multi_pattern": doc_multi_pattern,
        "doc_string_complexity": doc_string_complexity,
        "q_events_kendall_tau": q_events_kendall_tau,
        "q_events_perm_test": q_events_perm_test,
        "q_part_luby_mis": q_part_luby_mis,
        "q_events_median_polish": q_events_median_polish,
        "q_part_rich_club": q_part_rich_club,
        "q_part_eigenvector": q_part_eigenvector,
        "emb_principal_direction": emb_principal_direction,
        "q_events_sprt_srm": q_events_sprt_srm,
        "q_user_nelson_aalen": q_user_nelson_aalen,
        "q_events_ransac": q_events_ransac,
        "q_events_concurrency_histogram": q_events_concurrency_histogram,
        "q_events_xcorr": q_events_xcorr,
        "emb_ndcg": emb_ndcg,
        "emb_ivf_recall": emb_ivf_recall,
        "q_join_skew_audit": q_join_skew_audit,
        "dedup_components": dedup_components,
        "dedup_survivors": dedup_survivors,
        "dedup_incremental": dedup_incremental,
        "dedup_simhash_pairs": dedup_simhash_pairs,
        "ann_topk": ann_topk,
        "emb_knn_predict": emb_knn_predict,
        "ann_ivf_topk": ann_ivf_topk,
        "ann_ivfpq_topk": ann_ivfpq_topk,
        "emb_pq_topk": emb_pq_topk,
        "emb_near_dups": emb_near_dups,
        "emb_near_dups_lsh": emb_near_dups_lsh,
        "emb_semdedup": emb_semdedup,
        "emb_label_counts": emb_label_counts,
        # relational operators
        "q1_pricing_summary": R.q1_pricing_summary,
        "q_top_customer_revenue": R.q_top_customer_revenue,
        "q_building_revenue": R.q_building_revenue,
        "q_customers_per_region": R.q_customers_per_region,
        "q_events_hourly": R.q_events_hourly,
        "q_priciest_parts": R.q_priciest_parts,
        "q_supplier_balance": R.q_supplier_balance,
        "q_segment_avg_balance": R.q_segment_avg_balance,
        "q_distinct_segments": R.q_distinct_segments,
        "q_urgent_orders": R.q_urgent_orders,
        "q_customers_without_orders": R.q_customers_without_orders,
        "q_customers_with_orders_count": R.q_customers_with_orders_count,
        "q_distinct_event_users": q_distinct_event_users,
        "q_events_value_quantiles": q_events_value_quantiles,
        "q_events_quantiles_by_type": q_events_quantiles_by_type,
        "q_events_value_buckets": q_events_value_buckets,
        "q_top_parts_per_brand": q_top_parts_per_brand,
        "q_events_time_since_prev": q_events_time_since_prev,
        "q_events_type_pivot": q_events_type_pivot,
        "q_user_activity_outer": q_user_activity_outer,
        "q_events_global_rank": q_events_global_rank,
        "q_events_expectations": q_events_expectations,
        "doc_snapshot_diff": doc_snapshot_diff,
        "q_events_hll_users": q_events_hll_users,
        "q_events_hll_by_type": q_events_hll_by_type,
        "q_events_props_agg": q_events_props_agg,
        "doc_pagerank": doc_pagerank,
        "doc_dup_spans": doc_dup_spans,
        "doc_dup_ratio": doc_dup_ratio,
        "doc_pretrain_corpus": doc_pretrain_corpus,
        "emb_dim_stats": emb_dim_stats,
        "emb_pca": emb_pca,
        "doc_vocab": doc_vocab,
        "q_orders_events_window": q_orders_events_window,
        # windowed / time-ordered
        "q_events_sliding": q_events_sliding,
        "q_events_sessions": q_events_sessions,
        "q_orders_last_event": q_orders_last_event,
        # multi-table join shapes / rollup / set ops / graph
        "kg_entity_link": kg_entity_link,
        "q5_regional_supplier_revenue": R.q5_regional_supplier_revenue,
        "q18_large_volume_orders": R.q18_large_volume_orders,
        "q4_order_priority": R.q4_order_priority,
        "q3_shipping_priority": R.q3_shipping_priority,
        "q8_market_share": R.q8_market_share,
        "q9_product_profit": R.q9_product_profit,
        "q17_small_quantity_revenue": R.q17_small_quantity_revenue,
        "q19_disjunctive_revenue": R.q19_disjunctive_revenue,
        "q21_waiting_suppliers": R.q21_waiting_suppliers,
        "q2_min_cost_supplier": R.q2_min_cost_supplier,
        "q11_important_parts": R.q11_important_parts,
        "q12_priority_lines": R.q12_priority_lines,
        "q16_part_supplier_counts": R.q16_part_supplier_counts,
        "q20_dominant_suppliers": R.q20_dominant_suppliers,
        "q_events_ewma": q_events_ewma,
        "emb_knn_graph": emb_knn_graph,
        "emb_hard_negatives": emb_hard_negatives,
        "emb_label_outliers": emb_label_outliers,
        "q_part_sssp_tiered": q_part_sssp_tiered,
        "doc_feature_hash": doc_feature_hash,
        "q_events_max_concurrency": q_events_max_concurrency,
        "q_events_incremental_hourly": q_events_incremental_hourly,
        "emb_triplets": emb_triplets,
        "q_events_cusum": q_events_cusum,
        "q_events_psi": q_events_psi,
        "q_events_debounce": q_events_debounce,
        "doc_shuffle_order": doc_shuffle_order,
        "q6_forecast_revenue": R.q6_forecast_revenue,
        "q14_promo_revenue": R.q14_promo_revenue,
        "q15_top_supplier": R.q15_top_supplier,
        "q10_returned_items": R.q10_returned_items,
        "q13_order_distribution": R.q13_order_distribution,
        "q7_nation_volume": R.q7_nation_volume,
        "q22_idle_balance": R.q22_idle_balance,
        "q_revenue_rollup": R.q_revenue_rollup,
        "q_user_presence": R.q_user_presence,
        "q_part_triangles": q_part_triangles,
        "q_part_kcore": q_part_kcore,
        "q_orders_next_event": q_orders_next_event,
        "q_events_value_mad": q_events_value_mad,
        "q_events_distinct_users_by_type": q_events_distinct_users_by_type,
        "doc_normalize_text": doc_normalize_text,
        "doc_corpus_stats": doc_corpus_stats,
        "doc_redact_persons": doc_redact_persons,
        "kg_distant_supervision": kg_distant_supervision,
        "kg_pair_pmi": kg_pair_pmi,
        "kg_fuzzy_name_pairs": kg_fuzzy_name_pairs,
        "kg_jw_name_pairs": kg_jw_name_pairs,
        "q_part_harmonic": q_part_harmonic,
        "q_part_wl_colors": q_part_wl_colors,
        "q_supplier_adamic": q_supplier_adamic,
        "q_part_diameter": q_part_diameter,
        "q_fd_audit": q_fd_audit,
        "q_supplier_matching": q_supplier_matching,
        "q_events_burst_dp": q_events_burst_dp,
        "q_events_burst_states": q_events_burst_states,
        "q_user_dbscan": q_user_dbscan,
        "doc_ppr": doc_ppr,
        "doc_kn_logppl": doc_kn_logppl,
        "emb_label_prop": emb_label_prop,
        "q_part_ktruss": q_part_ktruss,
        "q_part_sssp": q_part_sssp,
        "q_orders_bloom_semijoin": q_orders_bloom_semijoin,
        "emb_hamming_topk": emb_hamming_topk,
        "emb_map10": emb_map10,
        "q_lineitem_auc": q_lineitem_auc,
        "q_orders_benford": q_orders_benford,
        "q_events_kfold_cv": q_events_kfold_cv,
        "doc_dirichlet_ql": doc_dirichlet_ql,
        "q_customer_chash": q_customer_chash,
        "q_part_betweenness": q_part_betweenness,
        "q_encoding_audit": q_encoding_audit,
        "q_join_cardinality": q_join_cardinality,
        "q_events_seasonal_naive": q_events_seasonal_naive,
        "q_events_enrichment": q_events_enrichment,
        "doc_front_coding": doc_front_coding,
        "kg_distant_negatives": kg_distant_negatives,
        "kg_graph_edges": kg_graph_edges,
        "kg_graph_pagerank": kg_graph_pagerank,
        "kg_transe": kg_transe,
        "media_image_resize": media_image_resize,
        "q_lineitem_corr": q_lineitem_corr,
        "q_events_funnel": q_events_funnel,
        "q_orders_cohort_retention": q_orders_cohort_retention,
        "q_events_outliers": q_events_outliers,
        "doc_word_entropy": doc_word_entropy,
        "q_events_checksum": q_events_checksum,
        "q_events_type_share": q_events_type_share,
        "q_events_running_total": q_events_running_total,
        "q_events_mode_by_user": q_events_mode_by_user,
        "q_events_cms_counts": q_events_cms_counts,
        "q_events_stream_late": q_events_stream_late,
        "q_events_stream_windows": q_events_stream_windows,
        "q_events_markov": q_events_markov,
        "q_supplier_jaccard": q_supplier_jaccard,
        "q_events_regression": q_events_regression,
        "q_events_moving_avg": q_events_moving_avg,
        "doc_bigram_logppl": doc_bigram_logppl,
        "doc_logreg_grad2": doc_logreg_grad2,
        "doc_quality_logreg": doc_quality_logreg,
        "q_user_event_type_set": q_user_event_type_set,
        "q_customer_rfm": q_customer_rfm,
        "q_events_unpivot": q_events_unpivot,
        "doc_hybrid_rrf": doc_hybrid_rrf,
        "doc_source_kl": doc_source_kl,
        "emb_mmr_select": emb_mmr_select,
        "doc_phrase_search": doc_phrase_search,
        "q_part_skyline": q_part_skyline,
        "q_part_bfs": q_part_bfs,
        "q_events_percent_rank": q_events_percent_rank,
        "q_events_state_intervals": q_events_state_intervals,
        "q_events_chi2": q_events_chi2,
        "q_user_event_paths": q_user_event_paths,
        "q_user_coverage": q_user_coverage,
        "q_events_trimmed_mean": q_events_trimmed_mean,
        "q_user_twap": q_user_twap,
        "kg_name_components": kg_name_components,
        "q_events_rolling_median": q_events_rolling_median,
        "q_events_since_anchor": q_events_since_anchor,
        "q_revenue_cube": q_revenue_cube,
        "dedup_component_sizes": dedup_component_sizes,
        "q_events_top_trigrams": q_events_top_trigrams,
        "doc_source_gini": doc_source_gini,
        "kg_coworker_pairs": kg_coworker_pairs,
        "q_user_streaks": q_user_streaks,
        "q_events_rolling_dau7": q_events_rolling_dau7,
        "q_referential_integrity": q_referential_integrity,
        "q_part_clustering": q_part_clustering,
        "q_events_hourly_autocorr": q_events_hourly_autocorr,
        "doc_source_vocab_jaccard": doc_source_vocab_jaccard,
        "q_orders_benford_shares": q_orders_benford_shares,
        "q_orders_profile": q_orders_profile,
        "q_events_geomean": q_events_geomean,
        "q_events_dod_overlap": q_events_dod_overlap,
        "doc_bpe_pair_counts": doc_bpe_pair_counts,
        "doc_bpe_merges": doc_bpe_merges,
        "doc_bpe_tokens": doc_bpe_tokens,
        "q_user_entry_exit": q_user_entry_exit,
        "q_events_type_lift": q_events_type_lift,
        "q_part_abc": q_part_abc,
    }


_N_TOKENS_SQL = ("array_length(list_filter(regexp_split_to_array(text, '\\s+'), "
                 "x -> x <> ''))")

# Exact all-pairs word-3-gram Jaccard edges at θ=0.7 — the oracle for
# BOTH dedup_minhash_edges (LSH recall caveat documented on the query)
# and dedup_jaccard_edges (exact path, deterministic parity).
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


def _kcore_oracle_sql(k: int = 80, rounds: int = 8) -> str:
    """Chained-CTE replay of ``q_part_kcore``: the co-purchase edge
    CTE, then one (degree → alive → filtered-edge) CTE triple per peel
    round, finally the surviving nodes with in-core degrees."""
    # AS MATERIALIZED: without it DuckDB inlines every CTE reference,
    # re-opening the parquet once per mention — 8 chained rounds blow
    # the open-file limit and redo the self-join 2^8 times
    sql = """
        WITH e0 AS MATERIALIZED (
            SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
        )"""
    prev = "e0"
    for r in range(1, rounds + 1):
        sql += f""",
        d{r} AS MATERIALIZED (SELECT u, count(*) AS dg FROM (
            SELECT a AS u FROM {prev} UNION ALL SELECT b FROM {prev})
            GROUP BY u),
        a{r} AS MATERIALIZED (SELECT u FROM d{r} WHERE dg >= {k}),
        e{r} AS MATERIALIZED (SELECT a, b FROM {prev}
                 WHERE a IN (SELECT u FROM a{r})
                   AND b IN (SELECT u FROM a{r}))"""
        prev = f"e{r}"
    sql += f"""
        SELECT u AS node, count(*) AS deg FROM (
            SELECT a AS u FROM {prev} UNION ALL SELECT b FROM {prev})
        GROUP BY u ORDER BY node"""
    return sql


def _matching_oracle_sql(rounds: int = 16) -> str:
    """Chained-CTE replay of ``q_supplier_matching``'s parallel
    greedy rounds: per round, windowed per-endpoint priority minima
    pick the local-minimum edges, and a NOT IN filter removes every
    edge touching a matched node. ``rounds`` only has to exceed the
    actual convergence round count (O(log E) expected; pytest pins
    maximality, so an unconverged oracle would mismatch the gate)."""
    sql = """
        WITH a0 AS MATERIALIZED (
            SELECT s, p, CAST('0x' || substr(md5(
                       CAST(s AS VARCHAR) || '|'
                       || CAST(p AS VARCHAR)), 1, 16) AS UBIGINT)
                   AS pr
            FROM (SELECT DISTINCT l_suppkey AS s, l_partkey AS p
                  FROM lineitem))"""
    parts = []
    prev = "a0"
    for r in range(1, rounds + 1):
        sql += f""",
        w{r} AS MATERIALIZED (
            SELECT s, p, pr,
                   min(pr) OVER (PARTITION BY s) AS ms,
                   min(pr) OVER (PARTITION BY p) AS mp
            FROM {prev}),
        m{r} AS MATERIALIZED (
            SELECT s, p FROM w{r} WHERE pr = ms AND pr = mp),
        a{r} AS MATERIALIZED (
            SELECT s, p, pr FROM w{r}
            WHERE s NOT IN (SELECT s FROM m{r})
              AND p NOT IN (SELECT p FROM m{r}))"""
        parts.append(f"SELECT s, p FROM m{r}")
        prev = f"a{r}"
    sql += f"""
        SELECT CAST(s AS BIGINT) AS l_suppkey,
               CAST(p AS BIGINT) AS l_partkey
        FROM ({" UNION ALL ".join(parts)})
        ORDER BY l_suppkey, l_partkey"""
    return sql


def _ktruss_oracle_sql(k: int = 3, min_cocount: int = 2,
                       rounds: int = 6) -> str:
    """Chained-CTE replay of ``q_part_ktruss``: thresholded
    co-purchase edges, then per round a wedge self-join counts each
    surviving edge's common neighbors and the support filter drops
    weak edges. ``rounds`` only has to exceed the convergence round
    (the Ray side terminates naturally and RAISES past its cap)."""
    thr = k - 2
    sql = f"""
        WITH inc AS MATERIALIZED (
            SELECT DISTINCT l_orderkey AS o, l_partkey AS p
            FROM lineitem),
        e0 AS MATERIALIZED (
            SELECT a.p AS a, b.p AS b
            FROM inc a JOIN inc b ON a.o = b.o AND a.p < b.p
            GROUP BY a.p, b.p HAVING count(*) >= {min_cocount})"""
    prev = "e0"
    last_sup = None
    for r in range(1, rounds + 1):
        sql += f""",
        sym{r} AS (SELECT a AS u, b AS v FROM {prev}
                   UNION ALL SELECT b, a FROM {prev}),
        sup{r} AS MATERIALIZED (
            SELECT w.a, w.b, count(*) AS c FROM (
                SELECT s1.v AS a, s2.v AS b
                FROM sym{r} s1 JOIN sym{r} s2
                  ON s1.u = s2.u AND s1.v < s2.v) w
            JOIN {prev} ee ON ee.a = w.a AND ee.b = w.b
            GROUP BY w.a, w.b),
        e{r} AS MATERIALIZED (
            SELECT a, b FROM sup{r} WHERE c >= {thr})"""
        prev = f"e{r}"
        last_sup = f"sup{r}"
    sql += f"""
        SELECT a, b, CAST(c AS BIGINT) AS support
        FROM {last_sup} WHERE c >= {thr} ORDER BY a, b"""
    return sql


def _sssp_oracle_sql(rounds: int = 24, min_cocount: int = 2) -> str:
    """Chained-CTE replay of ``q_part_sssp``: the thresholded
    co-purchase edge CTE, md5-derived integer weights, undirected
    explode, then one synchronized Bellman-Ford relax round per CTE
    (min over the previous table ∪ one-hop extensions). The lattice
    is monotone, so any depth ≥ the engine's asserted convergence
    round lands on the identical integer fixpoint."""
    sql = f"""
        WITH inc AS MATERIALIZED (
            SELECT DISTINCT l_orderkey AS o, l_partkey AS p
            FROM lineitem),
        e0 AS MATERIALIZED (
            SELECT a.p AS a, b.p AS b
            FROM inc a JOIN inc b ON a.o = b.o AND a.p < b.p
            GROUP BY a.p, b.p HAVING count(*) >= {min_cocount}),
        we AS MATERIALIZED (
            SELECT a, b, CAST(1 + CAST('0x' || substr(md5(
                       CAST(a AS VARCHAR) || '|' || CAST(b AS VARCHAR)),
                       1, 16) AS UBIGINT) % 9 AS BIGINT) AS w
            FROM e0),
        dir AS MATERIALIZED (
            SELECT a AS u, b AS v, w FROM we
            UNION ALL SELECT b, a, w FROM we),
        d0 AS (SELECT (SELECT min(u) FROM dir) AS node,
                      CAST(0 AS BIGINT) AS dist)"""
    prev = "d0"
    for k in range(1, rounds + 1):
        sql += f""",
        d{k} AS MATERIALIZED (
            SELECT node, min(dist) AS dist FROM (
                SELECT node, dist FROM {prev}
                UNION ALL
                SELECT dir.v AS node, {prev}.dist + dir.w AS dist
                FROM dir JOIN {prev} ON {prev}.node = dir.u) t
            GROUP BY node)"""
        prev = f"d{k}"
    sql += f"""
        SELECT node, dist FROM {prev} ORDER BY node"""
    return sql


def _betweenness_oracle_sql(n_sources: int = 4, max_depth: int = 6,
                            min_cocount: int = 2) -> str:
    """Unrolled Brandes replay for ``q_part_betweenness``: recursive
    BFS levels, one σ CTE per forward level (integer path counts),
    one δ CTE per backward level (correlated successor-dependency
    sums with the identical ratio expression), summed over sources."""
    L = max_depth
    sql = f"""
        WITH RECURSIVE inc AS MATERIALIZED (
            SELECT DISTINCT l_orderkey AS o, l_partkey AS p
            FROM lineitem),
        e0 AS MATERIALIZED (
            SELECT a.p AS a, b.p AS b
            FROM inc a JOIN inc b ON a.o = b.o AND a.p < b.p
            GROUP BY a.p, b.p HAVING count(*) >= {min_cocount}),
        sym AS MATERIALIZED (
            SELECT a AS u, b AS v FROM e0
            UNION ALL SELECT b, a FROM e0),
        nodes AS (SELECT DISTINCT u FROM sym),
        srcs AS (SELECT u FROM nodes ORDER BY u LIMIT {n_sources}),
        bfs AS (
            SELECT u AS src, u AS node, 0 AS lvl FROM srcs
            UNION
            SELECT bfs.src, sym.v, bfs.lvl + 1
            FROM bfs JOIN sym ON sym.u = bfs.node
            WHERE bfs.lvl < {L}),
        lv AS MATERIALIZED (
            SELECT src, node, min(lvl) AS lvl FROM bfs
            GROUP BY src, node),
        sig0 AS (SELECT u AS src, u AS node,
                        CAST(1 AS BIGINT) AS sigma FROM srcs)"""
    for l in range(1, L + 1):
        sql += f""",
        sig{l} AS MATERIALIZED (
            SELECT v.src, v.node, CAST(sum(p.sigma) AS BIGINT)
                       AS sigma
            FROM lv v JOIN sym e ON e.v = v.node
                 JOIN sig{l - 1} p ON p.src = v.src
                                  AND p.node = e.u
            WHERE v.lvl = {l}
            GROUP BY v.src, v.node)"""
    sql += f""",
        del{L} AS (SELECT src, node, 0.0 AS delta FROM sig{L})"""
    for l in range(L - 1, 0, -1):
        sql += f""",
        del{l} AS MATERIALIZED (
            SELECT su.src, su.node,
                   coalesce((SELECT sum(su.sigma / sw.sigma
                                        * (1.0 + dw.delta))
                             FROM sym e
                             JOIN sig{l + 1} sw ON sw.src = su.src
                                               AND sw.node = e.v
                             JOIN del{l + 1} dw ON dw.src = su.src
                                               AND dw.node = e.v
                             WHERE e.u = su.node), 0.0) AS delta
            FROM sig{l} su)"""
    union = " UNION ALL ".join(
        f"SELECT node, delta FROM del{l}" for l in range(1, L + 1))
    sql += f""",
        bc AS (SELECT node, sum(delta) AS s
               FROM ({union}) GROUP BY node)
        SELECT nodes.u AS node, round(coalesce(bc.s, 0.0), 6) AS bc
        FROM nodes LEFT JOIN bc ON bc.node = nodes.u
        ORDER BY node"""
    return sql


def _ppr_oracle_sql(iters: int = 5, damping: float = 0.85) -> str:
    """Chained-CTE replay of ``doc_ppr``: same edge CTE and power
    iteration as the PageRank oracle, but teleport mass sits entirely
    on the min-id seed and a per-round LEFT JOIN against the node
    table keeps zero-rank nodes in play."""
    sql = f"""
        WITH edges AS ({_EXACT_JACCARD_EDGES_SQL}),
        dir AS (SELECT doc_a AS u, doc_b AS v FROM edges
                UNION ALL SELECT doc_b, doc_a FROM edges),
        deg AS (SELECT u, CAST(count(*) AS DOUBLE) AS dg
                FROM dir GROUP BY u),
        nodes AS (SELECT u AS node FROM deg),
        seed AS (SELECT min(node) AS s FROM nodes),
        r0 AS (SELECT node,
                      CASE WHEN node = (SELECT s FROM seed)
                           THEN 1.0 ELSE 0.0 END AS pr
               FROM nodes)"""
    prev = "r0"
    for k in range(1, iters + 1):
        sql += f""",
        r{k} AS (SELECT nodes.node,
                        (CASE WHEN nodes.node = (SELECT s FROM seed)
                              THEN {1.0 - damping!r} ELSE 0.0 END)
                        + {damping!r} * coalesce(c.s, 0.0) AS pr
                 FROM nodes LEFT JOIN (
                     SELECT dir.v AS node,
                            sum({prev}.pr / deg.dg) AS s
                     FROM dir JOIN {prev} ON {prev}.node = dir.u
                              JOIN deg ON deg.u = dir.u
                     GROUP BY dir.v) c ON c.node = nodes.node)"""
        prev = f"r{k}"
    sql += f"""
        SELECT node AS doc_id, round(pr, 6) AS pr
        FROM {prev} ORDER BY doc_id"""
    return sql


def _pagerank_oracle_sql(iters: int = 5, damping: float = 0.85) -> str:
    """Chained-CTE recomputation of ``doc_pagerank``: the exact-Jaccard
    edge CTE, undirected explode, degree table, then one CTE per power
    iteration — the SQL mirror of ``ops/graph.pagerank``."""
    sql = f"""
        WITH edges AS ({_EXACT_JACCARD_EDGES_SQL}),
        dir AS (SELECT doc_a AS u, doc_b AS v FROM edges
                UNION ALL SELECT doc_b, doc_a FROM edges),
        deg AS (SELECT u, CAST(count(*) AS DOUBLE) AS dg
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
        SELECT node AS doc_id, round(pr, 6) AS pr
        FROM {prev} ORDER BY doc_id"""
    return sql


def _hits_oracle_sql(iters: int = 4) -> str:
    """Chained-CTE recomputation of ``q_part_hits``: distinct
    customer–part incidences, then one authority CTE and one hub CTE
    per HITS iteration (unnormalized — exact integers — mirroring
    ``ops/graph.hits``), with a single L1 normalization at the end."""
    sql = """
        WITH e AS MATERIALIZED (
            SELECT DISTINCT o_custkey AS u, l_partkey AS v
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        h0 AS (SELECT u, 1.0 AS s FROM (SELECT DISTINCT u FROM e))"""
    prev_h = "h0"
    for k in range(1, iters + 1):
        sql += f""",
        a{k} AS MATERIALIZED (
            SELECT v, sum({prev_h}.s) AS s
            FROM e JOIN {prev_h} USING (u) GROUP BY v),
        h{k} AS MATERIALIZED (
            SELECT u, sum(a{k}.s) AS s
            FROM e JOIN a{k} USING (v) GROUP BY u)"""
        prev_h = f"h{k}"
    last = iters
    sql += f"""
        SELECT side, node, score FROM (
            SELECT 'auth' AS side, v AS node,
                   round(s / (SELECT sum(s) FROM a{last}), 6) AS score
            FROM a{last}
            UNION ALL
            SELECT 'hub', u,
                   round(s / (SELECT sum(s) FROM h{last}), 6)
            FROM h{last})
        ORDER BY side, node"""
    return sql


def _dup_islands_cte(n: int = 8, min_count: int = 2) -> str:
    """Shared CTE chain for the substring-dedup oracles: rolling word
    n-grams (lateral unnest), duplicate filter, gaps-and-islands span
    merge. Positions are 1-indexed inside; the final selects convert
    to the engine's 0-based end-exclusive coordinates."""
    return f"""
        words AS (
            SELECT doc_id, list_filter(
                regexp_split_to_array(lower(text), '\\s+'),
                x -> x <> '') AS ws
            FROM documents),
        grams AS (
            SELECT doc_id, i AS pos,
                   array_to_string(ws[i:i+{n - 1}], ' ') AS g
            FROM words,
                 LATERAL (SELECT unnest(range(1, len(ws) - {n} + 2)) AS i) t
        ),
        dup AS (SELECT g FROM grams GROUP BY g
                HAVING count(*) >= {min_count}),
        hits AS (SELECT doc_id, pos FROM grams JOIN dup USING (g)),
        flagged AS (
            SELECT doc_id, pos,
                   CASE WHEN pos - lag(pos) OVER
                            (PARTITION BY doc_id ORDER BY pos) <= {n}
                        THEN 0 ELSE 1 END AS brk
            FROM hits),
        isl AS (
            SELECT doc_id, pos,
                   sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
            FROM flagged),
        spans AS (
            SELECT doc_id, min(pos) - 1 AS s, max(pos) + {n} - 1 AS e
            FROM isl GROUP BY doc_id, grp)"""


def _pretrain_corpus_oracle_sql() -> str:
    """ONE SQL statement recomputing the whole composed pipeline of
    ``doc_pretrain_corpus``: exact-Jaccard components (recursive CTE) →
    md5 split → 8-gram decontamination → P90 unigram-quality filter →
    per-source packing window. Each CTE chain mirrors the standalone
    query's oracle; the composition is their intersection feeding the
    pack window."""
    return """
        WITH RECURSIVE
        jw AS (SELECT doc_id, list_filter(
                   regexp_split_to_array(lower(text), '\\s+'),
                   x -> x <> '') AS ws
               FROM documents),
        jg AS (SELECT doc_id,
                      CASE WHEN len(ws) < 3
                           THEN [array_to_string(ws, ' ')]
                           ELSE [array_to_string(ws[i:i+2], ' ')
                                 for i in range(1, len(ws) - 1)]
                      END AS gs
               FROM jw WHERE len(ws) > 0),
        jdg AS (SELECT doc_id, unnest(list_distinct(gs)) AS g FROM jg),
        jcnt AS (SELECT doc_id, count(*) AS c FROM jdg GROUP BY doc_id),
        jinter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                          count(*) AS i
                   FROM jdg a JOIN jdg b
                        ON a.g = b.g AND a.doc_id < b.doc_id
                   GROUP BY a.doc_id, b.doc_id),
        jedges AS (SELECT doc_a, doc_b FROM jinter
                   JOIN jcnt ca ON ca.doc_id = doc_a
                   JOIN jcnt cb ON cb.doc_id = doc_b
                   WHERE CAST(i AS DOUBLE) / (ca.c + cb.c - i) >= 0.7),
        sym AS (SELECT doc_a AS a, doc_b AS b FROM jedges
                UNION ALL SELECT doc_b, doc_a FROM jedges),
        reach(a, b) AS (SELECT a, b FROM sym
                        UNION
                        SELECT r.a, s.b FROM reach r
                        JOIN sym s ON r.b = s.a),
        losers AS (SELECT a FROM (
                       SELECT a, least(a, min(b)) AS comp
                       FROM reach GROUP BY a) WHERE comp < a),
        spl AS (SELECT doc_id,
                       CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                           1, 16) AS UBIGINT)
                           % 1000000 AS b
                FROM documents),
        eg AS (SELECT DISTINCT
                      unnest([array_to_string(ws[i:i+7], ' ')
                              for i in range(1, len(ws) - 6)]) AS g
               FROM jw JOIN spl USING (doc_id)
               WHERE b >= 900000 AND len(ws) >= 8),
        tg AS (SELECT jw.doc_id,
                      unnest(list_distinct(
                          [array_to_string(ws[i:i+7], ' ')
                           for i in range(1, len(ws) - 6)])) AS g
               FROM jw JOIN spl USING (doc_id)
               WHERE b < 900000 AND len(ws) >= 8),
        contam AS (SELECT DISTINCT doc_id FROM tg
                   WHERE g IN (SELECT g FROM eg)),
        qw AS (SELECT doc_id, unnest(ws) AS w FROM jw),
        qc AS (SELECT w, count(*) AS c FROM qw GROUP BY w),
        qt AS (SELECT sum(c) AS t FROM qc),
        qlp AS (SELECT w, -log2(CAST(c AS DOUBLE) / t) AS l
                FROM qc CROSS JOIN qt),
        per AS (SELECT qw.doc_id, round(avg(qlp.l), 6) AS logppl
                FROM qw JOIN qlp ON qw.w = qlp.w GROUP BY qw.doc_id),
        scores AS (SELECT d.doc_id, COALESCE(per.logppl, 0.0) AS logppl
                   FROM documents d
                   LEFT JOIN per ON d.doc_id = per.doc_id),
        thr AS (SELECT quantile_cont(logppl, 0.9) AS t FROM scores),
        elig AS (
            SELECT d.doc_id, d.source,
                   array_length(list_filter(
                       regexp_split_to_array(d.text, '\\s+'),
                       x -> x <> '')) AS n_tokens
            FROM documents d
            JOIN spl ON spl.doc_id = d.doc_id
            JOIN scores ON scores.doc_id = d.doc_id, thr
            WHERE spl.b < 900000
              AND d.doc_id NOT IN (SELECT a FROM losers)
              AND d.doc_id NOT IN (SELECT doc_id FROM contam)
              AND scores.logppl <= thr.t),
        s AS (
            SELECT doc_id, source, n_tokens,
                   COALESCE(SUM(n_tokens) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS off
            FROM elig)
        SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(off // 512 AS BIGINT) AS pack_id,
               CAST(off % 512 AS BIGINT) AS pack_offset
        FROM s ORDER BY doc_id
    """


def build_oracle_sql() -> dict:
    oracles = _build_oracle_sql_literal()
    oracles["q_supplier_matching"] = _matching_oracle_sql(rounds=16)
    oracles["doc_ppr"] = _ppr_oracle_sql(iters=5, damping=0.85)
    oracles["q_part_ktruss"] = _ktruss_oracle_sql(k=3, min_cocount=2,
                                                  rounds=6)
    oracles["q_part_betweenness"] = _betweenness_oracle_sql(
        n_sources=4, max_depth=6, min_cocount=2)
    oracles["q_part_sssp"] = _sssp_oracle_sql(rounds=24, min_cocount=2)
    oracles["q_orders_bloom_semijoin"] = """
        WITH keys AS (
            SELECT DISTINCT o_orderkey AS k FROM orders
            WHERE o_orderpriority = '1-URGENT'),
        hs AS (SELECT unnest([0, 1, 2]) AS i),
        bits AS (
            SELECT DISTINCT CAST(
                CAST('0x' || substr(md5(CAST(k AS VARCHAR) || '#' ||
                     CAST(i AS VARCHAR)), 1, 16) AS UBIGINT)
                % 65536 AS BIGINT) AS b
            FROM keys CROSS JOIN hs),
        pk AS (SELECT DISTINCT l_orderkey AS k FROM lineitem),
        ph AS (
            SELECT pk.k, CAST(
                CAST('0x' || substr(md5(CAST(pk.k AS VARCHAR) || '#' ||
                     CAST(hs.i AS VARCHAR)), 1, 16) AS UBIGINT)
                % 65536 AS BIGINT) AS b
            FROM pk CROSS JOIN hs),
        pass AS (
            SELECT k FROM ph JOIN bits USING (b)
            GROUP BY k HAVING count(*) = 3),
        agg AS (SELECT
            (SELECT count(*) FROM keys) AS n_keys,
            (SELECT count(*) FROM bits) AS bits_set,
            (SELECT count(*) FROM lineitem) AS n_probe,
            (SELECT count(*) FROM lineitem
             WHERE l_orderkey IN (SELECT k FROM pass)) AS n_pass,
            (SELECT count(*) FROM lineitem
             WHERE l_orderkey IN (SELECT k FROM keys)) AS n_true)
        SELECT CAST(n_keys AS BIGINT) AS n_keys,
               CAST(bits_set AS BIGINT) AS bits_set,
               CAST(n_probe AS BIGINT) AS n_probe,
               CAST(n_pass AS BIGINT) AS n_pass,
               CAST(n_true AS BIGINT) AS n_true,
               CAST(n_pass - n_true AS BIGINT) AS n_false_pos,
               round(CASE WHEN n_probe - n_true > 0
                     THEN CAST(n_pass - n_true AS DOUBLE)
                          / (n_probe - n_true)
                     ELSE 0.0 END, 6) AS fp_rate
        FROM agg"""
    oracles["emb_map10"] = """
        WITH nn AS (
            SELECT q.vec_id AS qv, q.label AS ql, e.label AS el,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_cosine_similarity(
                           e.embedding, q.embedding) DESC,
                                e.vec_id) AS rk
            FROM embeddings q JOIN embeddings e
                 ON e.vec_id <> q.vec_id),
        h AS (
            SELECT qv, rk,
                   row_number() OVER (
                       PARTITION BY qv ORDER BY rk) AS hit_idx
            FROM nn WHERE rk <= 10 AND el = ql),
        s AS (
            SELECT qv, sum(hit_idx * (2520 // rk)) AS sc
            FROM h GROUP BY qv),
        rel AS (SELECT label, count(*) AS n
                FROM embeddings GROUP BY label),
        perq AS (
            SELECT a.label AS ql,
                   coalesce(s.sc, 0)
                   * (2520 // least(rel.n - 1, 10)) AS qsc
            FROM embeddings a JOIN rel ON rel.label = a.label
            LEFT JOIN s ON s.qv = a.vec_id
            WHERE rel.n > 1)
        SELECT CAST(ql AS BIGINT) AS label,
               count(*) AS n_queries,
               CAST(sum(qsc) AS BIGINT) AS ap_num,
               round(CAST(sum(qsc) AS DOUBLE)
                     / (2520.0 * 2520.0 * count(*)), 6) AS map10
        FROM perq GROUP BY ql ORDER BY label"""
    oracles["emb_hamming_topk"] = """
        WITH q AS (SELECT vec_id AS qid, embedding AS qe
                   FROM embeddings WHERE vec_id < 3),
        ham AS (
            SELECT q.qid, e.vec_id,
                   len(list_filter(range(1, 65),
                       i -> (q.qe[i] > 0) <> (e.embedding[i] > 0)))
                       AS hamming,
                   list_cosine_similarity(e.embedding, q.qe) AS cos
            FROM q CROSS JOIN embeddings e),
        short AS (
            SELECT *, row_number() OVER (
                PARTITION BY qid ORDER BY hamming, vec_id) AS hrk
            FROM ham),
        rer AS (
            SELECT qid, vec_id, hamming, row_number() OVER (
                PARTITION BY qid ORDER BY cos DESC, vec_id) AS rk
            FROM short WHERE hrk <= 50)
        SELECT CAST(qid AS BIGINT) AS query_idx,
               CAST(vec_id AS BIGINT) AS vec_id,
               CAST(hamming AS BIGINT) AS hamming
        FROM rer WHERE rk <= 5 ORDER BY query_idx, vec_id"""
    oracles["q_lineitem_auc"] = """
        WITH g AS (
            SELECT CAST(l_quantity AS BIGINT) AS s,
                   sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                       AS np_, count(*) AS n
            FROM lineitem GROUP BY 1),
        w AS (
            SELECT s, np_, n - np_ AS nn,
                   coalesce(sum(n - np_) OVER (ORDER BY s
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS below
            FROM g)
        SELECT CAST(sum(np_) AS BIGINT) AS n_pos,
               CAST(sum(nn) AS BIGINT) AS n_neg,
               CAST(sum(np_ * (2 * below + nn)) AS BIGINT) AS u2,
               round(CAST(sum(np_ * (2 * below + nn)) AS DOUBLE)
                     / (2.0 * sum(np_) * sum(nn)), 6) AS auc
        FROM w"""
    oracles["q_orders_benford"] = """
        WITH c AS (SELECT CAST(o_totalprice * 100 AS BIGINT) AS cents
                   FROM orders),
        d AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1)
                          AS BIGINT) AS digit, count(*) AS n_obs
              FROM c GROUP BY 1),
        e AS (SELECT digit, n_obs,
                     log10(1.0 + 1.0 / digit)
                     * (SELECT sum(n_obs) FROM d) AS exp_n
              FROM d)
        SELECT digit, CAST(n_obs AS BIGINT) AS n_obs,
               round(exp_n, 6) AS expected,
               round((n_obs - exp_n) * (n_obs - exp_n) / exp_n, 6)
                   AS chi2_term
        FROM e ORDER BY digit"""
    oracles["doc_pretrain_corpus"] = _pretrain_corpus_oracle_sql()
    oracles["doc_select_coverage"] = _coverage_oracle_sql(k=8,
                                                          buckets=4096)
    oracles["q_events_dtw"] = _dtw_oracle_sql(n=24)
    oracles["q_part_katz"] = _katz_oracle_sql(iters=4, denom=4)
    oracles["q_part_walks"] = _walks_oracle_sql(walks=2, length=3)
    oracles["q_events_mondrian"] = _mondrian_oracle_sql(levels=3)
    oracles["q_events_voptimal"] = _voptimal_oracle_sql(buckets=4)
    oracles["q_part_mst"] = _mst_oracle_sql(rounds=6, min_cocount=2)
    oracles["q_events_scc"] = _SCC_ORACLE_SQL
    oracles["q_events_matrix_profile"] = _matrix_profile_oracle_sql(m=24)
    oracles["q_events_emd"] = _EMD_ORACLE_SQL
    oracles["doc_vocab_coverage"] = _VOCAB_COVERAGE_ORACLE_SQL
    oracles["q_events_huffman"] = _huffman_oracle_sql(merges=4)
    oracles["doc_budget_knapsack"] = _knapsack_oracle_sql(n_items=12)
    oracles["q_part_item_cosine"] = _item_cosine_oracle_sql(
        k=5, min_cocount=2)
    oracles["q_events_holt_winters"] = _holt_winters_oracle_sql()
    oracles["q_events_bh_fdr"] = _bh_fdr_oracle_sql(alpha=0.1)
    oracles["emb_kcenter_select"] = _kcenter_oracle_sql(k=6, dim=64)
    oracles["q_user_lis"] = _lis_oracle_sql(levels=30)
    oracles["doc_heaps_law"] = _HEAPS_ORACLE_SQL
    oracles["q_user_interval_schedule"] = _INTERVAL_SCHEDULE_ORACLE_SQL
    oracles["q_stable_matching"] = _stable_matching_oracle_sql(
        n=8, rounds=16)
    oracles["q_doc_token_align"] = _token_align_oracle_sql()
    oracles["doc_cdc_chunks"] = _cdc_oracle_sql(k=8, divisor=64)
    oracles["q_events_did"] = _DID_ORACLE_SQL
    oracles["q_events_lincount"] = _lincount_oracle_sql(m=4096)
    oracles["q_events_mann_kendall"] = _MANN_KENDALL_ORACLE_SQL
    oracles["doc_source_logodds"] = _logodds_oracle_sql(
        alpha=0.01, top=10)
    oracles["doc_multi_pattern"] = _multi_pattern_oracle_sql(
        top=20, min_len=4)
    oracles["doc_string_complexity"] = _STRING_COMPLEXITY_ORACLE_SQL
    oracles["q_events_kendall_tau"] = _KENDALL_TAU_ORACLE_SQL
    oracles["q_events_perm_test"] = _perm_test_oracle_sql(n_perms=20)
    oracles["q_part_luby_mis"] = _luby_mis_oracle_sql(
        rounds=8, min_cocount=2)
    oracles["q_events_median_polish"] = _median_polish_oracle_sql(
        iters=2)
    oracles["q_part_rich_club"] = _rich_club_oracle_sql(min_cocount=2)
    oracles["q_part_eigenvector"] = _eigenvector_oracle_sql(
        iters=4, scale=1_000_000, min_cocount=2)
    oracles["emb_principal_direction"] = \
        _principal_direction_oracle_sql(iters=16, scale=10_000,
                                        dim=64)
    oracles["q_events_sprt_srm"] = _sprt_srm_oracle_sql(p1=0.55)
    oracles["q_user_nelson_aalen"] = _NELSON_AALEN_ORACLE_SQL
    oracles["q_events_ransac"] = _ransac_oracle_sql(k=32, eps=5)
    oracles["q_events_concurrency_histogram"] = \
        _CONCURRENCY_HIST_ORACLE_SQL
    oracles["q_events_tcloseness"] = """
        WITH cells AS MATERIALIZED (
            SELECT user_id // 10 AS ubucket,
                   (epoch_us(ts) // 3600000000) % 24 AS hod,
                   event_type, count(*) AS n
            FROM events GROUP BY 1, 2, 3),
        g AS MATERIALIZED (
            SELECT event_type, SUM(n) AS gn FROM cells GROUP BY 1),
        nt AS (SELECT SUM(gn) AS n_tot FROM g),
        cls AS MATERIALIZED (
            SELECT ubucket, hod, SUM(n) AS n_c
            FROM cells GROUP BY 1, 2),
        grid AS (
            SELECT cls.ubucket, cls.hod, cls.n_c, g.gn,
                   coalesce(c.n, 0) AS n
            FROM cls CROSS JOIN g
            LEFT JOIN cells c ON c.ubucket = cls.ubucket
                             AND c.hod = cls.hod
                             AND c.event_type = g.event_type),
        tv AS (
            SELECT ubucket, hod, any_value(n_c) AS n_c,
                   SUM(abs(n * (SELECT n_tot FROM nt) - gn * n_c))
                       AS tvd_num
            FROM grid GROUP BY 1, 2)
        SELECT ubucket, hod, CAST(n_c AS BIGINT) AS n_rows,
               CAST(tvd_num AS BIGINT) AS tvd_num,
               round(CAST(tvd_num AS DOUBLE)
                     / (2.0 * n_c * (SELECT n_tot FROM nt)), 6)
                   AS tvd
        FROM tv
        ORDER BY CAST(tvd_num AS DOUBLE) / n_c DESC, ubucket, hod
        LIMIT 10"""
    oracles["q_doc_langid_kappa"] = f"""
        WITH lp AS MATERIALIZED ({oracles["doc_langid"]}),
        j AS (SELECT d.lang, lp.lang_pred
              FROM documents d JOIN lp USING (doc_id)),
        conf AS (SELECT lang, lang_pred, count(*) AS n
                 FROM j GROUP BY 1, 2),
        agg AS (SELECT SUM(n) AS n_tot,
                       SUM(CASE WHEN lang = lang_pred
                                THEN n ELSE 0 END) AS agree
                FROM conf),
        rs AS (SELECT lang AS lb, SUM(n) AS r FROM conf GROUP BY 1),
        cs AS (SELECT lang_pred AS lb, SUM(n) AS c
               FROM conf GROUP BY 1),
        ch AS (SELECT SUM(coalesce(rs.r, 0) * coalesce(cs.c, 0))
                   AS chance
               FROM rs FULL JOIN cs USING (lb))
        SELECT CAST(agg.n_tot AS BIGINT) AS n_docs,
               CAST(agg.agree AS BIGINT) AS n_agree,
               CAST(ch.chance AS BIGINT) AS chance_cross,
               round(CAST(agg.n_tot * agg.agree - ch.chance
                          AS DOUBLE)
                     / (agg.n_tot * agg.n_tot - ch.chance), 6)
                   AS kappa
        FROM agg, ch"""
    oracles["q_events_viterbi"] = _viterbi_oracle_sql(steps=4)
    oracles["q_lineitem_hilbert"] = _hilbert_oracle_sql(
        cols=("l_partkey", "l_suppkey"), nbuckets=64, bits=16)
    # one-sided Bloom parity (see doc_decontaminate_bloom docstring)
    oracles["doc_decontaminate_bloom"] = oracles["doc_decontaminate"]
    oracles["doc_dup_spans"] = f"""
        WITH {_dup_islands_cte()}
        SELECT doc_id, s AS start, e AS "end"
        FROM spans ORDER BY doc_id, s"""
    oracles["doc_dup_ratio"] = f"""
        WITH {_dup_islands_cte()},
        cov AS (SELECT doc_id, sum(e - s) AS covered
                FROM spans GROUP BY doc_id),
        tot AS (SELECT doc_id, len(ws) AS n_words FROM words)
        SELECT tot.doc_id, tot.n_words,
               CAST(coalesce(cov.covered, 0) AS BIGINT) AS covered,
               round(CAST(coalesce(cov.covered, 0) AS DOUBLE)
                     / greatest(tot.n_words, 1), 6) AS dup_ratio
        FROM tot LEFT JOIN cov ON cov.doc_id = tot.doc_id
        ORDER BY tot.doc_id"""
    # the index-backed BM25 must reproduce the direct pass bit-for-bit
    # (after 6-decimal rounding) — one oracle serves both
    oracles["doc_bm25_indexed"] = oracles["doc_bm25_scores"]
    # cluster-size histogram over the SAME closure the components
    # oracle computes (nested WITH RECURSIVE inside a subquery)
    # motif join over the SAME distant-supervision edges its oracle
    # derives — a wedge self-join on the shared ORG
    oracles["kg_coworker_pairs"] = f"""
        WITH sup AS ({oracles["kg_distant_supervision"]}),
        e AS (SELECT DISTINCT subj_norm, obj_norm FROM sup)
        SELECT a.subj_norm AS per_a, b.subj_norm AS per_b,
               CAST(count(*) AS BIGINT) AS n_orgs
        FROM e a JOIN e b ON a.obj_norm = b.obj_norm
                         AND a.subj_norm < b.subj_norm
        GROUP BY per_a, per_b ORDER BY per_a, per_b"""
    oracles["dedup_component_sizes"] = f"""
        WITH sizes AS (
            SELECT component, count(*) AS sz
            FROM ({oracles["dedup_components"]}) GROUP BY component)
        SELECT CAST(sz AS BIGINT) AS size,
               CAST(count(*) AS BIGINT) AS n_components
        FROM sizes GROUP BY sz ORDER BY size"""
    return oracles


def _build_oracle_sql_literal() -> dict:
    return {
        "doc_token_stats": f"""
            SELECT doc_id,
                   {_N_TOKENS_SQL} AS n_tokens,
                   array_length(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS n_pieces
            FROM documents ORDER BY doc_id
        """,
        "doc_quality": f"""
            SELECT doc_id,
                   length(text) AS n_chars,
                   {_N_TOKENS_SQL} AS n_tokens,
                   CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS DOUBLE)
                       / greatest(length(text), 1) AS punct_ratio,
                   CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS DOUBLE)
                       / greatest(length(text), 1) AS upper_ratio,
                   CASE WHEN {_N_TOKENS_SQL} > 0 THEN
                       CAST(length(text) - (length(text) - length(regexp_replace(text, '\\s', '', 'g'))) AS DOUBLE)
                           / greatest({_N_TOKENS_SQL}, 1)
                   ELSE 0.0 END AS mean_token_len,
                   CAST(len(list_filter(
                            list_filter(regexp_split_to_array(text, '\\s+'),
                                        x -> x <> ''),
                            x -> lower(x) IN ('the','and','of','to','a',
                                              'in','is','it','that','was')))
                        AS DOUBLE) / greatest({_N_TOKENS_SQL}, 1)
                       AS stopword_ratio
            FROM documents ORDER BY doc_id
        """,
        "doc_exact_dedup": """
            SELECT min(doc_id) AS doc_id FROM documents
            GROUP BY regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')
            ORDER BY doc_id
        """,
        "doc_langid": """
            WITH w AS (
                SELECT doc_id,
                       unnest(list_distinct(
                           regexp_extract_all(lower(text), '[a-zà-ÿ]+'))) AS w
                FROM documents
            ),
            s AS (
                SELECT doc_id,
                       count(*) FILTER (WHERE w IN ('der','die','und','das',
                           'ist','nicht','ein','mit','zu')) AS de,
                       count(*) FILTER (WHERE w IN ('the','and','of','to','a',
                           'in','is','it','that','was')) AS en,
                       count(*) FILTER (WHERE w IN ('el','la','de','que','los',
                           'una','es','por','con')) AS es,
                       count(*) FILTER (WHERE w IN ('le','la','et','les','des',
                           'est','une','dans','que')) AS fr
                FROM w GROUP BY doc_id
            )
            SELECT d.doc_id,
                   CASE WHEN s.doc_id IS NULL
                             OR greatest(de, en, es, fr) = 0 THEN 'und'
                        WHEN de = greatest(de, en, es, fr) THEN 'de'
                        WHEN en = greatest(de, en, es, fr) THEN 'en'
                        WHEN es = greatest(de, en, es, fr) THEN 'es'
                        ELSE 'fr' END AS lang_pred
            FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
            ORDER BY d.doc_id
        """,
        "doc_name_mentions": """
            WITH w AS (
                SELECT doc_id, list_filter(
                    regexp_split_to_array(text, '\\s+'), x -> x <> '') AS ws
                FROM documents
            ),
            t AS (
                SELECT doc_id, unnest(ws) AS tok,
                       unnest(range(len(ws))) AS pos
                FROM w
            ),
            f AS (
                SELECT doc_id, pos,
                       (regexp_matches(upper(substr(tok, 1, 1)) ||
                                       substr(tok, 2),
                                       '^[A-Z][A-Za-z0-9]*$')
                        AND upper(substr(tok, 1, 1)) || substr(tok, 2)
                            NOT IN ('The','A','An','It','He','She','They',
                                    'We','I','You','This','That','These',
                                    'Those','There','Here','What','Where',
                                    'When','Who','Why','How','Yes','No',
                                    'Ok','Okay','Please','Thanks','Hello',
                                    'Hi')) AS isname
                FROM t
            ),
            g AS (
                SELECT doc_id, pos, isname,
                       pos - ROW_NUMBER() OVER (
                           PARTITION BY doc_id, isname ORDER BY pos) AS grp
                FROM f
            )
            SELECT doc_id, CAST(min(pos) AS BIGINT) AS m_start,
                   CAST(max(pos) + 1 AS BIGINT) AS m_end
            FROM g WHERE isname
            GROUP BY doc_id, grp
            HAVING count(*) <= 10
            ORDER BY doc_id, m_start
        """,
        "doc_entity_canonical": _canonical_entities_sql()
        + " ORDER BY norm",
        "doc_split": """
            WITH h AS (
                SELECT doc_id,
                       CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                           1, 16) AS UBIGINT)
                       % 1000000 AS b
                FROM documents)
            SELECT doc_id,
                   CASE WHEN b < 800000 THEN 'train'
                        WHEN b < 900000 THEN 'valid'
                        ELSE 'test' END AS split
            FROM h ORDER BY doc_id
        """,
        "doc_stratified_sample": """
            WITH h AS (
                SELECT doc_id, lang,
                       CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                           1, 16) AS UBIGINT) AS hv
                FROM documents),
            r AS (
                SELECT doc_id, lang,
                       ROW_NUMBER() OVER (PARTITION BY lang
                                          ORDER BY hv, doc_id) AS rk
                FROM h)
            SELECT doc_id, lang FROM r WHERE rk <= 20 ORDER BY doc_id
        """,
        "doc_fingerprint": """
            SELECT doc_id,
                   CAST(CAST('0x' || substr(md5(regexp_replace(
                            trim(lower(text)), '\\s+', ' ', 'g')), 1, 16)
                         AS UBIGINT) % 9223372036854775808 AS BIGINT) AS fp
            FROM documents ORDER BY doc_id
        """,
        "doc_top_bigrams": """
            WITH words AS (
                SELECT list_filter(regexp_split_to_array(lower(text),
                                                         '\\s+'),
                                   x -> x <> '') AS ws
                FROM documents
            ),
            grams AS (
                SELECT unnest([array_to_string(ws[i:i+1], ' ')
                               for i in range(1, len(ws))]) AS ngram
                FROM words WHERE len(ws) >= 2
            )
            SELECT ngram, count(*) AS n_occurrences
            FROM grams GROUP BY ngram
            ORDER BY n_occurrences DESC, ngram LIMIT 10
        """,
        "doc_winnowing_md5": """
            WITH d AS (
                SELECT doc_id, lower(text) AS t,
                       length(lower(text)) - 8 + 1 AS n
                FROM documents WHERE length(lower(text)) >= 8
            ),
            g AS (
                SELECT doc_id, unnest(range(n)) AS position, t FROM d
            ),
            h AS (
                SELECT doc_id, position,
                       CAST(CAST('0x' || substr(md5(substr(
                                t, CAST(position + 1 AS INTEGER), 8)), 1, 16)
                            AS UBIGINT) % 9223372036854775808 AS BIGINT) AS fp
                FROM g
            ),
            w AS (
                SELECT doc_id, unnest(range(greatest(n - 3, 1))) AS s FROM d
            ),
            p AS (
                SELECT h.doc_id, w.s, h.position, h.fp
                FROM h JOIN w ON h.doc_id = w.doc_id
                 AND h.position >= w.s AND h.position < w.s + 4
            ),
            wm AS (SELECT doc_id, s, min(fp) AS mfp
                   FROM p GROUP BY doc_id, s),
            sel AS (
                SELECT p.doc_id, max(p.position) AS position
                FROM p JOIN wm ON p.doc_id = wm.doc_id AND p.s = wm.s
                              AND p.fp = wm.mfp
                GROUP BY p.doc_id, p.s
            )
            SELECT DISTINCT h.doc_id, h.fp AS fingerprint, h.position
            FROM sel JOIN h ON h.doc_id = sel.doc_id
                           AND h.position = sel.position
            ORDER BY h.doc_id, h.position
        """,
        "doc_pack_batches": f"""
            WITH t AS (
                SELECT doc_id, source, {_N_TOKENS_SQL} AS n_tokens
                FROM documents
            ),
            s AS (
                SELECT doc_id, source, n_tokens,
                       COALESCE(SUM(n_tokens) OVER (
                           PARTITION BY source ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING), 0) AS off
                FROM t
            )
            SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
                   CAST(off // 512 AS BIGINT) AS pack_id,
                   CAST(off % 512 AS BIGINT) AS pack_offset
            FROM s ORDER BY doc_id
        """,
        "doc_decontaminate": """
            WITH h AS (
                SELECT doc_id,
                       CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                           1, 16) AS UBIGINT)
                           % 1000000 AS b,
                       list_filter(regexp_split_to_array(lower(text),
                                                         '\\s+'),
                                   x -> x <> '') AS ws
                FROM documents
            ),
            eg AS (
                SELECT DISTINCT unnest([array_to_string(ws[i:i+7], ' ')
                                        for i in range(1, len(ws) - 6)])
                           AS g
                FROM h WHERE b >= 900000 AND len(ws) >= 8
            ),
            tg AS (
                SELECT doc_id,
                       unnest(list_distinct(
                           [array_to_string(ws[i:i+7], ' ')
                            for i in range(1, len(ws) - 6)])) AS g
                FROM h WHERE b < 900000 AND len(ws) >= 8
            )
            SELECT doc_id, count(*) AS n_hits
            FROM tg WHERE g IN (SELECT g FROM eg)
            GROUP BY doc_id ORDER BY doc_id
        """,
        "doc_quality_filter": """
            WITH w AS (
                SELECT doc_id,
                       unnest(list_filter(regexp_split_to_array(
                           lower(text), '\\s+'), x -> x <> '')) AS w
                FROM documents
            ),
            cnt AS (SELECT w, count(*) AS c FROM w GROUP BY w),
            tot AS (SELECT sum(c) AS t FROM cnt),
            lp AS (
                SELECT w, -log2(CAST(c AS DOUBLE) / t) AS l
                FROM cnt CROSS JOIN tot
            ),
            per AS (
                SELECT w.doc_id, round(avg(lp.l), 6) AS logppl
                FROM w JOIN lp ON w.w = lp.w GROUP BY w.doc_id
            ),
            scores AS (
                SELECT d.doc_id, COALESCE(per.logppl, 0.0) AS logppl
                FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
            ),
            thr AS (SELECT quantile_cont(logppl, 0.9) AS t FROM scores)
            SELECT doc_id FROM scores, thr WHERE logppl <= t
            ORDER BY doc_id
        """,
        "doc_heavy_hitters": """
            WITH w AS (
                SELECT unnest(list_filter(regexp_split_to_array(
                    lower(text), '\\s+'), x -> x <> '')) AS term
                FROM documents
            ),
            cnt AS (SELECT term, count(*) AS n_occurrences
                    FROM w GROUP BY 1),
            tot AS (SELECT sum(n_occurrences) AS n FROM cnt)
            SELECT term, n_occurrences FROM cnt, tot
            WHERE n_occurrences * 40 > n
            ORDER BY n_occurrences DESC, term
        """,
        "doc_tfidf_top": """
            WITH w AS (
                SELECT doc_id, unnest(list_filter(regexp_split_to_array(
                    lower(text), '\\s+'), x -> x <> '')) AS term
                FROM documents
            ),
            tf AS (SELECT doc_id, term, count(*) AS tfc
                   FROM w GROUP BY 1, 2),
            dl AS (SELECT doc_id, count(*) AS len FROM w GROUP BY 1),
            df AS (SELECT term, count(DISTINCT doc_id) AS dfc
                   FROM w GROUP BY 1),
            nd AS (SELECT count(*) AS n FROM documents),
            s AS (
                SELECT tf.doc_id, tf.term, tf.tfc, df.dfc,
                       (CAST(tf.tfc AS DOUBLE) / dl.len)
                       * (ln((1.0 + nd.n) / (1.0 + df.dfc)) + 1.0) AS sc
                FROM tf JOIN dl USING (doc_id) JOIN df USING (term)
                CROSS JOIN nd
            )
            SELECT doc_id, term, tfc AS tf_count, dfc AS doc_freq,
                   CAST(row_number() OVER (
                       PARTITION BY doc_id
                       ORDER BY sc DESC, term) AS BIGINT) AS rank
            FROM s QUALIFY rank <= 3 ORDER BY doc_id, rank
        """,
        "doc_bm25_scores": """
            WITH q(query_idx, term) AS (VALUES
                (0, 'spark'), (0, 'join'), (0, 'fast'),
                (1, 'dup'),
                (2, 'window'), (2, 'stream'), (2, 'query'), (2, 'sort')),
            w AS (
                SELECT doc_id, unnest(list_filter(regexp_split_to_array(
                    lower(text), '\\s+'), x -> x <> '')) AS term
                FROM documents
            ),
            dl AS (SELECT doc_id, count(*) AS len FROM w GROUP BY 1),
            nd AS (SELECT (SELECT count(*) FROM documents) AS n,
                          (SELECT count(*) FROM w) AS total),
            df AS (SELECT term, count(DISTINCT doc_id) AS dfc FROM w
                   WHERE term IN (SELECT term FROM q) GROUP BY 1),
            tf AS (SELECT doc_id, term, count(*) AS tfc FROM w
                   WHERE term IN (SELECT term FROM q) GROUP BY 1, 2)
            SELECT q.query_idx, tf.doc_id,
                   round(sum(
                       ln(1.0 + (nd.n - COALESCE(df.dfc, 0) + 0.5)
                                / (COALESCE(df.dfc, 0) + 0.5))
                       * (tf.tfc * (1.2 + 1.0))
                       / (tf.tfc + 1.2 * (1.0 - 0.75
                          + 0.75 * (dl.len
                                    / (CAST(nd.total AS DOUBLE) / nd.n))))
                   ), 6) AS score
            FROM q JOIN tf USING (term)
                 JOIN dl ON tf.doc_id = dl.doc_id
                 LEFT JOIN df ON df.term = q.term
                 CROSS JOIN nd
            GROUP BY q.query_idx, tf.doc_id
            ORDER BY q.query_idx, tf.doc_id
        """,
        "emb_label_centroids": """
            WITH e AS (
                SELECT label, unnest(embedding) AS v,
                       generate_subscripts(embedding, 1) - 1 AS dim
                FROM embeddings
            )
            SELECT CAST(label AS BIGINT) AS label,
                   CAST(dim AS BIGINT) AS dim,
                   round(avg(CAST(v AS DOUBLE)), 6) AS centroid
            FROM e GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "doc_unigram_logppl": """
            WITH w AS (
                SELECT doc_id,
                       unnest(list_filter(regexp_split_to_array(
                           lower(text), '\\s+'), x -> x <> '')) AS w
                FROM documents
            ),
            cnt AS (SELECT w, count(*) AS c FROM w GROUP BY w),
            tot AS (SELECT sum(c) AS t FROM cnt),
            lp AS (
                SELECT w, -log2(CAST(c AS DOUBLE) / t) AS l
                FROM cnt CROSS JOIN tot
            ),
            per AS (
                SELECT w.doc_id, count(*) AS n_tokens,
                       round(avg(lp.l), 6) AS logppl
                FROM w JOIN lp ON w.w = lp.w
                GROUP BY w.doc_id
            )
            SELECT d.doc_id,
                   CAST(COALESCE(per.n_tokens, 0) AS BIGINT) AS n_tokens,
                   COALESCE(per.logppl, 0.0) AS logppl
            FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
            ORDER BY d.doc_id
        """,
        "doc_repetition": """
            WITH w AS (
                SELECT doc_id, list_filter(
                    regexp_split_to_array(lower(text), '\\s+'),
                    x -> x <> '') AS ws
                FROM documents
            ),
            tok AS (
                SELECT doc_id, len(ws) AS n_tokens,
                       len(list_distinct(ws)) AS n_distinct
                FROM w
            ),
            bg AS (
                SELECT doc_id, unnest([array_to_string(ws[i:i+1], ' ')
                                       for i in range(1, len(ws))]) AS g
                FROM w WHERE len(ws) >= 2
            ),
            bgc AS (
                SELECT doc_id, g, count(*) AS c FROM bg
                GROUP BY doc_id, g
            ),
            top AS (
                SELECT doc_id, max(c) AS top_c, sum(c) AS total
                FROM bgc GROUP BY doc_id
            )
            SELECT t.doc_id, CAST(t.n_tokens AS BIGINT) AS n_tokens,
                   1.0 - CAST(t.n_distinct AS DOUBLE)
                       / greatest(t.n_tokens, 1) AS dup_word_frac,
                   COALESCE(CAST(top.top_c AS DOUBLE) / top.total, 0.0)
                       AS top_bigram_frac
            FROM tok t LEFT JOIN top ON t.doc_id = top.doc_id
            ORDER BY t.doc_id
        """,
        "dedup_minhash_edges": _EXACT_JACCARD_EDGES_SQL,
        # same SQL — but for the exact engine path the parity is
        # deterministic for ANY corpus (no LSH-recall caveat)
        "dedup_jaccard_edges": _EXACT_JACCARD_EDGES_SQL,
        "dedup_jaccard_prefix": _EXACT_JACCARD_EDGES_SQL,
        "doc_sorted_neighborhood": """
            WITH r AS (
                SELECT doc_id,
                       row_number() OVER (
                           ORDER BY substr(lower(coalesce(text, '')),
                                           1, 24), doc_id) - 1 AS rnk
                FROM documents)
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   b.rnk - a.rnk AS rank_gap
            FROM r a JOIN r b
              ON b.rnk > a.rnk AND b.rnk <= a.rnk + 3
            ORDER BY doc_a, doc_b
        """,
        "doc_nb_model": """
            WITH w AS (
                SELECT lang, unnest(list_filter(
                    regexp_split_to_array(lower(coalesce(text, '')),
                                          '\\s+'),
                    x -> x <> '')) AS word
                FROM documents),
            c AS (SELECT lang, word, count(*) AS n
                  FROM w GROUP BY lang, word),
            v AS (SELECT count(DISTINCT word) AS vocab FROM c),
            tok AS (SELECT lang, sum(n) AS tok FROM c GROUP BY lang),
            d AS (SELECT lang, count(*) AS docs
                  FROM documents GROUP BY lang),
            tot AS (SELECT sum(docs) AS total FROM d),
            ranked AS (
                SELECT lang, word, n, row_number() OVER (
                    PARTITION BY lang ORDER BY n DESC, word) AS rk
                FROM c)
            SELECT r.lang, r.word, r.n,
                   round(ln(r.n + 1.0)
                         - ln(t.tok + (SELECT vocab FROM v)), 6)
                       AS loglik,
                   round(ln(CAST(d.docs AS DOUBLE))
                         - ln((SELECT total FROM tot)), 6) AS logprior
            FROM ranked r
            JOIN tok t ON t.lang = r.lang
            JOIN d ON d.lang = r.lang
            WHERE r.rk <= 20
            ORDER BY r.lang, r.n DESC, r.word
        """,
        "q_part_assortativity": """
            WITH e AS (
                SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
                FROM lineitem a JOIN lineitem b
                  ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey),
            stubs AS (
                SELECT a AS u, b AS v FROM e
                UNION ALL SELECT b, a FROM e),
            deg AS (SELECT u, count(*) AS deg FROM stubs GROUP BY u)
            SELECT (SELECT count(*) FROM deg) AS n_nodes,
                   (SELECT count(*) FROM e) AS n_edges,
                   round(corr(CAST(d1.deg AS DOUBLE),
                              CAST(d2.deg AS DOUBLE)), 6) AS r
            FROM stubs s
            JOIN deg d1 ON s.u = d1.u
            JOIN deg d2 ON s.v = d2.u
        """,
        "q_lineitem_ols2": """
            WITH mu AS (
                SELECT l_returnflag, count(*) AS n,
                       sum(CAST(l_quantity AS DOUBLE)) AS s1,
                       sum(CAST(l_discount AS DOUBLE)) AS s2,
                       sum(CAST(l_extendedprice AS DOUBLE)) AS sy,
                       sum(CAST(l_quantity AS DOUBLE)) / count(*)
                           AS m1,
                       sum(CAST(l_discount AS DOUBLE)) / count(*)
                           AS m2,
                       sum(CAST(l_extendedprice AS DOUBLE)) / count(*)
                           AS my
                FROM lineitem GROUP BY l_returnflag),
            c AS (
                SELECT l.l_returnflag, mu.n, mu.s1, mu.s2, mu.sy,
                       sum((CAST(l_quantity AS DOUBLE) - m1)
                           * (CAST(l_quantity AS DOUBLE) - m1))
                           AS c11,
                       sum((CAST(l_discount AS DOUBLE) - m2)
                           * (CAST(l_discount AS DOUBLE) - m2))
                           AS c22,
                       sum((CAST(l_quantity AS DOUBLE) - m1)
                           * (CAST(l_discount AS DOUBLE) - m2))
                           AS c12,
                       sum((CAST(l_quantity AS DOUBLE) - m1)
                           * (CAST(l_extendedprice AS DOUBLE) - my))
                           AS c1y,
                       sum((CAST(l_discount AS DOUBLE) - m2)
                           * (CAST(l_extendedprice AS DOUBLE) - my))
                           AS c2y
                FROM lineitem l JOIN mu
                  ON mu.l_returnflag = l.l_returnflag
                GROUP BY l.l_returnflag, mu.n, mu.s1, mu.s2, mu.sy),
            b AS (
                SELECT l_returnflag, n, s1, s2, sy,
                       (c22 * c1y - c12 * c2y)
                           / (c11 * c22 - c12 * c12) AS b1,
                       (c11 * c2y - c12 * c1y)
                           / (c11 * c22 - c12 * c12) AS b2
                FROM c)
            SELECT l_returnflag, CAST(n AS BIGINT) AS n,
                   round(b1, 6) AS b_qty, round(b2, 6) AS b_disc,
                   round(sy / n - b1 * s1 / n - b2 * s2 / n, 6)
                       AS intercept
            FROM b ORDER BY l_returnflag
        """,
        "q_events_burstiness": """
            WITH h AS (
                SELECT event_type,
                       CAST(epoch_us(ts) AS BIGINT) // 3600000000
                           AS hour
                FROM events),
            c AS (SELECT event_type, hour, count(*) AS n
                  FROM h GROUP BY event_type, hour),
            sp AS (SELECT max(hour) - min(hour) + 1 AS span FROM c),
            a AS (
                SELECT event_type, sum(n) AS total,
                       sum(CAST(n AS DOUBLE) * n) AS ss
                FROM c GROUP BY event_type),
            a2 AS (
                SELECT event_type, total, ss,
                       total / (SELECT CAST(span AS DOUBLE) FROM sp)
                           AS mu
                FROM a)
            SELECT event_type, CAST(total AS BIGINT) AS n_events,
                   round(mu, 6) AS mean_per_hour,
                   round(((ss - 2.0 * mu * total
                           + (SELECT span FROM sp) * mu * mu)
                          / (SELECT span FROM sp)) / mu, 6) AS fano
            FROM a2 ORDER BY event_type
        """,
        "q_events_runs_test": """
            WITH m AS (
                SELECT quantile_cont(CAST(value AS DOUBLE), 0.5)
                    AS med
                FROM events),
            u AS (
                SELECT event_type, ts, event_id,
                       CASE WHEN CAST(value AS DOUBLE)
                                > (SELECT med FROM m)
                            THEN 1 ELSE 0 END AS up
                FROM events
                WHERE CAST(value AS DOUBLE) <> (SELECT med FROM m)),
            f AS (
                SELECT event_type, up,
                       CASE WHEN lag(up) OVER w IS NULL
                                 OR up <> lag(up) OVER w
                            THEN 1 ELSE 0 END AS rs
                FROM u WINDOW w AS (PARTITION BY event_type
                                    ORDER BY ts, event_id)),
            agg AS (
                SELECT event_type, sum(up) AS npos,
                       sum(1 - up) AS nneg, sum(rs) AS r
                FROM f GROUP BY event_type)
            SELECT event_type, CAST(npos AS BIGINT) AS n_pos,
                   CAST(nneg AS BIGINT) AS n_neg,
                   CAST(r AS BIGINT) AS n_runs,
                   round((r - (2.0 * npos * nneg / (npos + nneg)
                               + 1.0))
                         / sqrt((2.0 * npos * nneg
                                 * (2.0 * npos * nneg
                                    - (npos + nneg)))
                                / (CAST(npos + nneg AS DOUBLE)
                                   * (npos + nneg)
                                   * (npos + nneg - 1.0))), 6) AS z
            FROM agg ORDER BY event_type
        """,
        "doc_pair_similarity": """
            WITH words AS (
                SELECT doc_id, list_filter(
                    regexp_split_to_array(lower(text), '\\s+'),
                    x -> x <> '') AS ws
                FROM documents),
            tok AS (
                SELECT doc_id, len(ws) AS dlen, unnest(ws) AS term
                FROM words),
            tf AS (
                SELECT doc_id, term, dlen, count(*) AS cnt
                FROM tok GROUP BY doc_id, term, dlen),
            dfreq AS (
                SELECT term, count(*) AS df FROM tf GROUP BY term),
            nd AS (SELECT count(*) AS n FROM documents),
            w AS (
                SELECT tf.doc_id, tf.term, dfreq.df,
                       (CAST(cnt AS DOUBLE) / dlen)
                       * (ln((1.0 + (SELECT n FROM nd)) / (1.0 + df))
                          + 1.0) AS w
                FROM tf JOIN dfreq USING (term)
                WHERE dfreq.df <= CAST(floor(
                    0.9 * (SELECT n FROM nd)) AS BIGINT)),
            nrm AS (
                SELECT doc_id, sqrt(sum(w * w)) AS nm
                FROM w GROUP BY doc_id),
            p AS (
                SELECT w.doc_id, w.term, w.w / nrm.nm AS wn
                FROM w JOIN nrm USING (doc_id)
                WHERE w.df >= 2),
            pair AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                       round(sum(a.wn * b.wn), 6) AS cosine
                FROM p a JOIN p b
                     ON a.term = b.term AND a.doc_id < b.doc_id
                GROUP BY a.doc_id, b.doc_id)
            SELECT doc_a, doc_b, cosine FROM pair
            WHERE cosine >= 0.8
            ORDER BY doc_a, doc_b
        """,
        "q_user_markov_backtest": """
            WITH tr AS (
                SELECT event_type AS prev,
                       lead(event_type) OVER (
                           PARTITION BY user_id
                           ORDER BY ts, event_id) AS nxt
                FROM events),
            c AS (SELECT prev, nxt, count(*) AS n
                  FROM tr WHERE nxt IS NOT NULL GROUP BY prev, nxt),
            p AS (
                SELECT prev, nxt AS predicted, n AS n_correct,
                       row_number() OVER (PARTITION BY prev
                                          ORDER BY n DESC, nxt ASC)
                           AS rk,
                       sum(n) OVER (PARTITION BY prev)
                           AS n_transitions
                FROM c)
            SELECT prev, CAST(n_transitions AS BIGINT)
                       AS n_transitions,
                   predicted, CAST(n_correct AS BIGINT) AS n_correct,
                   round(CAST(n_correct AS DOUBLE) / n_transitions, 6)
                       AS accuracy
            FROM p WHERE rk = 1 ORDER BY prev
        """,
        "q_events_ohlc": """
            WITH b AS (
                SELECT CAST(epoch_us(ts) AS BIGINT) // 3600000000
                           AS hour,
                       ts, event_id, CAST(value AS DOUBLE) AS v,
                       row_number() OVER (
                           PARTITION BY CAST(epoch_us(ts) AS BIGINT)
                                        // 3600000000
                           ORDER BY ts, event_id) AS rn_a,
                       row_number() OVER (
                           PARTITION BY CAST(epoch_us(ts) AS BIGINT)
                                        // 3600000000
                           ORDER BY ts DESC, event_id DESC) AS rn_d
                FROM events)
            SELECT hour,
                   max(CASE WHEN rn_a = 1 THEN v END) AS open,
                   max(v) AS high, min(v) AS low,
                   max(CASE WHEN rn_d = 1 THEN v END) AS close,
                   count(*) AS n
            FROM b GROUP BY hour ORDER BY hour
        """,
        "q_events_rate_limit": """
            WITH RECURSIVE seq AS MATERIALIZED (
                SELECT event_id, user_id,
                       CAST(epoch_us(ts) AS BIGINT) AS t,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)
                           AS rn
                FROM events),
            rec AS (
                SELECT event_id, user_id, rn, t,
                       CAST(1 AS DOUBLE) AS tokens, 1 AS admitted
                FROM seq WHERE rn = 1
                UNION ALL
                SELECT s.event_id, s.user_id, s.rn, s.t,
                       CASE WHEN least(CAST(2 AS DOUBLE), r.tokens
                                 + (s.t - r.t) / 60000000.0 * 0.005)
                                >= 1.0
                            THEN least(CAST(2 AS DOUBLE), r.tokens
                                 + (s.t - r.t) / 60000000.0 * 0.005)
                                 - 1.0
                            ELSE least(CAST(2 AS DOUBLE), r.tokens
                                 + (s.t - r.t) / 60000000.0 * 0.005)
                            END,
                       CASE WHEN least(CAST(2 AS DOUBLE), r.tokens
                                 + (s.t - r.t) / 60000000.0 * 0.005)
                                >= 1.0
                            THEN 1 ELSE 0 END
                FROM rec r JOIN seq s
                     ON s.user_id = r.user_id AND s.rn = r.rn + 1)
            SELECT event_id, CAST(admitted AS BIGINT) AS admitted,
                   round(tokens, 6) AS tokens
            FROM rec ORDER BY event_id
        """,
        "q_events_isotonic": """
            WITH lab AS (
                SELECT CAST(floor(CAST(value AS DOUBLE)) AS BIGINT)
                           AS b,
                       CASE WHEN event_type IN ('click', 'purchase')
                            THEN 1 ELSE 0 END AS y
                FROM events),
            h AS (SELECT b, count(*) AS n, sum(y) AS pos
                  FROM lab GROUP BY b),
            base AS MATERIALIZED (
                SELECT b, n, pos,
                       row_number() OVER (ORDER BY b) AS i,
                       CAST(sum(n) OVER (ORDER BY b) AS DOUBLE) AS cw,
                       CAST(sum(pos) OVER (ORDER BY b) AS DOUBLE)
                           AS cp
                FROM h),
            pairs AS MATERIALIZED (
                -- avg(s..t) over the block [s, t]
                SELECT s.i AS s, t.i AS t,
                       (t.cp - (s.cp - s.pos))
                       / (t.cw - (s.cw - s.n)) AS a
                FROM base s JOIN base t ON s.i <= t.i),
            m AS MATERIALIZED (
                -- m(s, i) = min over t >= i of avg(s..t)
                SELECT s, t AS i,
                       min(a) OVER (PARTITION BY s
                                    ORDER BY t DESC) AS mn
                FROM pairs),
            fit AS (
                -- Barlow minimax: fit(i) = max over s <= i of m(s,i)
                SELECT i, max(mn) AS fitv FROM m GROUP BY i)
            SELECT base.b AS bucket, CAST(base.n AS BIGINT) AS n,
                   CAST(base.pos AS BIGINT) AS pos,
                   round(fit.fitv, 6) AS fit
            FROM base JOIN fit USING (i)
            ORDER BY bucket
        """,
        "q_events_woe_iv": """
            WITH lab AS (
                SELECT CAST(value AS DOUBLE) AS v,
                       CASE WHEN event_type IN ('click', 'purchase')
                            THEN 1 ELSE 0 END AS y
                FROM events),
            ed AS (
                SELECT quantile_cont(v, 0.1) AS e1,
                       quantile_cont(v, 0.2) AS e2,
                       quantile_cont(v, 0.3) AS e3,
                       quantile_cont(v, 0.4) AS e4,
                       quantile_cont(v, 0.5) AS e5,
                       quantile_cont(v, 0.6) AS e6,
                       quantile_cont(v, 0.7) AS e7,
                       quantile_cont(v, 0.8) AS e8,
                       quantile_cont(v, 0.9) AS e9
                FROM lab),
            b AS (
                SELECT (CASE WHEN v > e1 THEN 1 ELSE 0 END)
                     + (CASE WHEN v > e2 THEN 1 ELSE 0 END)
                     + (CASE WHEN v > e3 THEN 1 ELSE 0 END)
                     + (CASE WHEN v > e4 THEN 1 ELSE 0 END)
                     + (CASE WHEN v > e5 THEN 1 ELSE 0 END)
                     + (CASE WHEN v > e6 THEN 1 ELSE 0 END)
                     + (CASE WHEN v > e7 THEN 1 ELSE 0 END)
                     + (CASE WHEN v > e8 THEN 1 ELSE 0 END)
                     + (CASE WHEN v > e9 THEN 1 ELSE 0 END) AS bucket,
                       y
                FROM lab, ed),
            h AS (SELECT bucket, count(*) AS n, sum(y) AS pos
                  FROM b GROUP BY bucket),
            tot AS (SELECT CAST(sum(pos) AS DOUBLE) AS pos_t,
                           CAST(sum(n - pos) AS DOUBLE) AS neg_t
                    FROM h)
            SELECT bucket, CAST(n AS BIGINT) AS n,
                   CAST(pos AS BIGINT) AS pos,
                   round(ln((pos / (SELECT pos_t FROM tot))
                            / ((n - pos) / (SELECT neg_t FROM tot))),
                         6) AS woe,
                   round(((pos / (SELECT pos_t FROM tot))
                          - ((n - pos) / (SELECT neg_t FROM tot)))
                         * ln((pos / (SELECT pos_t FROM tot))
                              / ((n - pos)
                                 / (SELECT neg_t FROM tot))), 6)
                       AS iv_term
            FROM h
            WHERE pos > 0 AND n - pos > 0
            ORDER BY bucket
        """,
        "q_events_attribution": """
            WITH p AS (
                SELECT event_id, user_id, ts FROM events
                WHERE event_type = 'purchase'),
            c AS (
                SELECT user_id, ts, event_type FROM events
                WHERE event_type <> 'purchase'),
            pair AS (
                SELECT p.event_id AS pid, p.user_id, c.event_type AS et
                FROM p JOIN c ON p.user_id = c.user_id
                     AND c.ts < p.ts
                     AND c.ts >= p.ts - INTERVAL 24 HOUR),
            k AS (SELECT pid, count(*) AS k FROM pair GROUP BY pid),
            cred AS (
                SELECT pair.et, 1.0 / k.k AS w
                FROM pair JOIN k USING (pid))
            SELECT et AS event_type, count(*) AS touches,
                   round(sum(w), 6) AS credit
            FROM cred GROUP BY et ORDER BY et
        """,
        "q_events_ks_test": """
            WITH s AS (
                SELECT CAST(value AS DOUBLE) AS v,
                       CASE WHEN event_type = 'click' THEN 1 ELSE 0
                           END AS ia,
                       CASE WHEN event_type = 'error' THEN 1 ELSE 0
                           END AS ib
                FROM events
                WHERE event_type IN ('click', 'error')),
            h AS (SELECT v, sum(ia) AS na, sum(ib) AS nb
                  FROM s GROUP BY v),
            tot AS (SELECT CAST(sum(na) AS DOUBLE) AS na,
                           CAST(sum(nb) AS DOUBLE) AS nb
                    FROM h),
            cum AS (
                SELECT v,
                       CAST(sum(na) OVER (ORDER BY v) AS DOUBLE) AS ca,
                       CAST(sum(nb) OVER (ORDER BY v) AS DOUBLE) AS cb
                FROM h),
            d AS (
                SELECT v,
                       abs(ca / (SELECT na FROM tot)
                           - cb / (SELECT nb FROM tot)) AS dv
                FROM cum)
            SELECT CAST((SELECT na FROM tot) AS BIGINT) AS n_a,
                   CAST((SELECT nb FROM tot) AS BIGINT) AS n_b,
                   round(dv, 6) AS d_stat,
                   v AS at_value,
                   round(2.0 * exp(-2.0
                       * ((SELECT na FROM tot) * (SELECT nb FROM tot)
                          / ((SELECT na FROM tot)
                             + (SELECT nb FROM tot)))
                       * dv * dv), 6) AS p_approx
            FROM d ORDER BY dv DESC, v ASC LIMIT 1
        """,
        "q_user_seq_patterns": """
            WITH mt AS (
                SELECT user_id, event_type,
                       min(ts) AS mn, max(ts) AS mx
                FROM events GROUP BY user_id, event_type),
            tot AS (SELECT count(DISTINCT user_id) AS nu FROM events)
            SELECT a.event_type AS ant, b.event_type AS con,
                   count(*) AS n_users,
                   round(CAST(count(*) AS DOUBLE)
                         / (SELECT nu FROM tot), 6) AS support
            FROM mt a JOIN mt b
                 ON a.user_id = b.user_id AND a.mn < b.mx
            GROUP BY a.event_type, b.event_type
            ORDER BY ant, con
        """,
        "q_events_best_split": """
            WITH lab AS (
                SELECT CAST(value AS DOUBLE) AS v,
                       CASE WHEN event_type IN ('click', 'purchase')
                            THEN 1 ELSE 0 END AS y
                FROM events),
            h AS (SELECT v, count(*) AS n, sum(y) AS pos
                  FROM lab GROUP BY v),
            tot AS (SELECT CAST(sum(n) AS DOUBLE) AS n,
                           CAST(sum(pos) AS DOUBLE) AS pos
                    FROM h),
            cum AS (
                SELECT v,
                       CAST(sum(n) OVER (ORDER BY v) AS DOUBLE) AS nl,
                       CAST(sum(pos) OVER (ORDER BY v) AS DOUBLE)
                           AS posl
                FROM h),
            cand AS (
                SELECT v, nl, posl,
                       (SELECT n FROM tot) - nl AS nr,
                       (SELECT pos FROM tot) - posl AS posr
                FROM cum WHERE nl < (SELECT n FROM tot)),
            g AS (
                SELECT v, nl, posl, nr, posr,
                       (1.0 - (pos / n) * (pos / n)
                            - ((n - pos) / n) * ((n - pos) / n)) AS gp,
                       (1.0 - (posl / nl) * (posl / nl)
                            - ((nl - posl) / nl) * ((nl - posl) / nl))
                           AS gl,
                       (1.0 - (posr / nr) * (posr / nr)
                            - ((nr - posr) / nr) * ((nr - posr) / nr))
                           AS gr
                FROM cand, tot),
            sc AS (
                SELECT v, nl, posl, nr, posr, gp,
                       gp - (nl / (SELECT n FROM tot)) * gl
                          - (nr / (SELECT n FROM tot)) * gr AS gain
                FROM g)
            SELECT v AS threshold, round(gain, 6) AS gain,
                   round(gp, 6) AS gini_parent,
                   CAST(nl AS BIGINT) AS n_left,
                   CAST(nr AS BIGINT) AS n_right,
                   CAST(posl AS BIGINT) AS pos_left,
                   CAST(posr AS BIGINT) AS pos_right
            FROM sc ORDER BY gain DESC, v ASC LIMIT 1
        """,
        "q_events_type_drift": """
            WITH c AS (
                SELECT event_type, event_id % 2 AS half,
                       count(*) AS n
                FROM events GROUP BY event_type, event_id % 2),
            t AS (SELECT half, sum(n) AS tot FROM c GROUP BY half),
            p AS (
                SELECT et.event_type,
                       coalesce(e.n, 0)
                           / (SELECT CAST(tot AS DOUBLE) FROM t
                              WHERE half = 0) AS a,
                       coalesce(o.n, 0)
                           / (SELECT CAST(tot AS DOUBLE) FROM t
                              WHERE half = 1) AS b
                FROM (SELECT DISTINCT event_type FROM events) et
                LEFT JOIN c e ON e.event_type = et.event_type
                             AND e.half = 0
                LEFT JOIN c o ON o.event_type = et.event_type
                             AND o.half = 1)
            SELECT event_type, round(a, 6) AS share_even,
                   round(b, 6) AS share_odd,
                   round(abs(a - b), 6) AS abs_gap
            FROM p ORDER BY event_type
        """,
        "doc_ttr": """
            WITH w AS (
                SELECT doc_id, unnest(list_filter(
                    regexp_split_to_array(lower(coalesce(text, '')),
                                          '\\s+'),
                    x -> x <> '')) AS word
                FROM documents)
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                   CAST(count(DISTINCT word) AS BIGINT) AS n_types,
                   round(count(DISTINCT word)
                         / CAST(count(*) AS DOUBLE), 6) AS ttr
            FROM w GROUP BY doc_id ORDER BY doc_id
        """,
        "doc_rake_keywords": """
            WITH d AS (
                SELECT doc_id, source,
                       regexp_split_to_array(lower(coalesce(text,
                                                            '')),
                                             '[.!?]+') AS sents
                FROM documents),
            s AS (
                SELECT doc_id, source, i AS sent_id,
                       list_filter(regexp_split_to_array(sents[i],
                                                         '\\s+'),
                                   x -> x <> '') AS ws
                FROM d, LATERAL (SELECT unnest(range(1,
                    len(sents) + 1)) AS i) t),
            w AS (
                SELECT doc_id, source, sent_id, j AS pos,
                       ws[j] AS word,
                       CASE WHEN ws[j] IN ('the', 'and', 'of', 'to',
                           'a', 'in', 'is', 'it', 'for', 'on',
                           'with', 'as', 'at', 'by', 'an')
                           THEN 1 ELSE 0 END AS stop
                FROM s, LATERAL (SELECT unnest(range(1,
                    len(ws) + 1)) AS j) u),
            isl AS (
                SELECT *, sum(stop) OVER (PARTITION BY doc_id,
                    sent_id ORDER BY pos) AS grp
                FROM w),
            ph AS (
                SELECT doc_id, source, sent_id, grp,
                       string_agg(word, ' ' ORDER BY pos) AS phrase,
                       count(*) AS plen
                FROM isl WHERE stop = 0
                GROUP BY doc_id, source, sent_id, grp),
            pw AS (
                SELECT i.source, i.word, i.doc_id, i.sent_id, i.grp,
                       p.plen
                FROM isl i JOIN ph p
                  ON p.doc_id = i.doc_id AND p.sent_id = i.sent_id
                 AND p.grp = i.grp
                WHERE i.stop = 0),
            stats AS (
                SELECT source, word, count(*) AS freq,
                       sum(plen) AS deg
                FROM pw GROUP BY source, word),
            inst AS (
                SELECT pw.source, pw.doc_id, pw.sent_id, pw.grp,
                       round(sum(CAST(st.deg AS DOUBLE) / st.freq),
                             6) AS score
                FROM pw JOIN stats st
                  ON st.source = pw.source AND st.word = pw.word
                GROUP BY pw.source, pw.doc_id, pw.sent_id, pw.grp),
            agg AS (
                SELECT i.source, p.phrase, count(*) AS n,
                       max(i.score) AS score
                FROM inst i JOIN ph p
                  ON p.doc_id = i.doc_id AND p.sent_id = i.sent_id
                 AND p.grp = i.grp AND p.source = i.source
                GROUP BY i.source, p.phrase),
            r AS (
                SELECT source, phrase, n, score,
                       row_number() OVER (PARTITION BY source
                           ORDER BY score DESC, phrase) AS rk
                FROM agg)
            SELECT source, phrase, CAST(n AS BIGINT) AS n, score
            FROM r WHERE rk <= 10
            ORDER BY source, score DESC, phrase
        """,
        "q_part_powerlaw_alpha": """
            WITH e AS (
                SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
                FROM lineitem a JOIN lineitem b
                  ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey),
            stubs AS (SELECT a AS u FROM e
                      UNION ALL SELECT b FROM e),
            deg AS (SELECT u, count(*) AS deg FROM stubs GROUP BY u),
            t AS (SELECT CAST(deg AS DOUBLE) AS d
                  FROM deg WHERE deg >= 2)
            SELECT CAST(count(*) AS BIGINT) AS n_tail_nodes,
                   round(1.0 + count(*) / sum(ln(d / 2.0)), 6)
                       AS alpha
            FROM t
        """,
        "emb_quantization_error": """
            WITH s AS (
                SELECT max(list_aggregate(list_transform(embedding,
                    x -> abs(CAST(x AS DOUBLE))), 'max')) AS sc
                FROM embeddings),
            r AS (
                SELECT label, len(embedding) AS d,
                       list_sum(list_transform(embedding, x ->
                           pow(CAST(x AS DOUBLE)
                               - round(CAST(x AS DOUBLE)
                                       / sc * 127.0)
                                 / 127.0 * sc,
                               2))) AS se
                FROM embeddings, s)
            SELECT CAST(label AS BIGINT) AS label,
                   CAST(count(*) AS BIGINT) AS n,
                   round(sum(se) / (count(*) * max(d)), 12) AS mse
            FROM r GROUP BY label ORDER BY label
        """,
        "emb_centroid_drift": """
            WITH d AS (
                SELECT label, vec_id % 2 AS half, i,
                       avg(embedding[i]) AS mu
                FROM embeddings,
                     LATERAL (SELECT unnest(range(1,
                         len(embedding) + 1)) AS i) t
                GROUP BY label, vec_id % 2, i),
            n AS (
                SELECT label, vec_id % 2 AS half, count(*) AS n
                FROM embeddings GROUP BY label, vec_id % 2),
            p AS (
                SELECT a.label,
                       sum(a.mu * b.mu) AS ab,
                       sum(a.mu * a.mu) AS aa,
                       sum(b.mu * b.mu) AS bb
                FROM d a JOIN d b
                  ON a.label = b.label AND a.i = b.i
                 AND a.half = 0 AND b.half = 1
                GROUP BY a.label)
            SELECT p.label,
                   CAST(ne.n AS BIGINT) AS n_even,
                   CAST(no.n AS BIGINT) AS n_odd,
                   round(ab / sqrt(aa * bb), 6) AS centroid_cosine
            FROM p
            JOIN n ne ON ne.label = p.label AND ne.half = 0
            JOIN n no ON no.label = p.label AND no.half = 1
            ORDER BY p.label
        """,
        "q_events_peak_hours": """
            WITH h AS (
                SELECT event_type,
                       (CAST(epoch_us(ts) AS BIGINT) // 3600000000)
                           % 24 AS hour
                FROM events),
            c AS (SELECT event_type, hour, count(*) AS n
                  FROM h GROUP BY event_type, hour),
            t AS (SELECT event_type, sum(n) AS tot
                  FROM c GROUP BY event_type),
            r AS (SELECT c.event_type, c.hour, c.n, t.tot,
                         row_number() OVER (PARTITION BY c.event_type
                             ORDER BY c.n DESC, c.hour) AS rk
                  FROM c JOIN t USING (event_type))
            SELECT event_type, CAST(hour AS BIGINT) AS peak_hour,
                   CAST(n AS BIGINT) AS peak_n,
                   round(CAST(n AS DOUBLE) / tot, 6) AS peak_share
            FROM r WHERE rk = 1 ORDER BY event_type
        """,
        "q_orders_interarrival": """
            WITH d AS (
                SELECT o_custkey,
                       CAST(epoch_us(CAST(o_orderdate AS TIMESTAMP))
                            AS BIGINT) // 86400000000 AS day,
                       o_orderkey
                FROM orders),
            g AS (
                SELECT o_custkey,
                       day - lag(day) OVER (PARTITION BY o_custkey
                           ORDER BY day, o_orderkey) AS gap
                FROM d)
            SELECT o_custkey, CAST(count(gap) AS BIGINT) AS n_gaps,
                   round(quantile_cont(CAST(gap AS DOUBLE), 0.5), 6)
                       AS median_gap_days
            FROM g WHERE gap IS NOT NULL
            GROUP BY o_custkey ORDER BY o_custkey
        """,
        "doc_readability": """
            WITH s AS (
                SELECT doc_id,
                       len(regexp_extract_all(coalesce(text, ''),
                                              '\\S+'))
                           AS n_words,
                       len(regexp_extract_all(lower(coalesce(text,
                                                             '')),
                                              '[aeiouy]+'))
                           AS n_syllables,
                       len(list_filter(
                           regexp_split_to_array(coalesce(text, ''),
                                                 '[.!?]+'),
                           x -> len(list_filter(
                               regexp_split_to_array(x, '\\s+'),
                               y -> y <> '')) > 0)) AS n_sentences
                FROM documents)
            SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
                   CAST(n_syllables AS BIGINT) AS n_syllables,
                   CAST(n_sentences AS BIGINT) AS n_sentences,
                   round(206.835
                         - 1.015 * (CAST(n_words AS DOUBLE)
                                    / n_sentences)
                         - 84.6 * (CAST(n_syllables AS DOUBLE)
                                   / n_words), 6) AS flesch
            FROM s WHERE n_words > 0 AND n_sentences > 0
            ORDER BY doc_id
        """,
        "q_orders_streak": """
            WITH o AS (
                SELECT o_custkey, o_totalprice,
                       row_number() OVER (PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey) AS rn,
                       CASE WHEN o_totalprice > lag(o_totalprice)
                           OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey)
                           THEN 0 ELSE 1 END AS brk
                FROM orders),
            i AS (
                SELECT o_custkey, rn,
                       sum(brk) OVER (PARTITION BY o_custkey
                                      ORDER BY rn) AS island
                FROM o),
            runs AS (
                SELECT o_custkey, island, count(*) AS len
                FROM i GROUP BY o_custkey, island),
            c AS (SELECT o_custkey, count(*) AS n_orders
                  FROM orders GROUP BY o_custkey)
            SELECT c.o_custkey, CAST(c.n_orders AS BIGINT) AS n_orders,
                   CAST(max(r.len) AS BIGINT) AS max_streak
            FROM runs r JOIN c USING (o_custkey)
            GROUP BY c.o_custkey, c.n_orders ORDER BY c.o_custkey
        """,
        "doc_simpson_diversity": """
            WITH w AS (
                SELECT source, unnest(list_filter(
                    regexp_split_to_array(lower(coalesce(text, '')),
                                          '\\s+'),
                    x -> x <> '')) AS word
                FROM documents),
            c AS (SELECT source, word, count(*) AS n
                  FROM w GROUP BY source, word)
            SELECT source, CAST(sum(n) AS BIGINT) AS n_tokens,
                   round(1.0 - sum(CAST(n AS DOUBLE) * n)
                         / (CAST(sum(n) AS DOUBLE) * sum(n)), 6)
                       AS simpson
            FROM c GROUP BY source ORDER BY source
        """,
        "q_events_entropy_rate": """
            WITH t AS (
                SELECT user_id, event_type AS a,
                       lead(event_type) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS b
                FROM events),
            c AS (SELECT user_id, a, b, count(*) AS n
                  FROM t WHERE b IS NOT NULL
                  GROUP BY user_id, a, b),
            ca AS (SELECT user_id, a, sum(n) AS cn
                   FROM c GROUP BY user_id, a),
            tot AS (SELECT user_id, sum(n) AS tot
                    FROM c GROUP BY user_id)
            SELECT c.user_id, CAST(tot.tot AS BIGINT)
                       AS n_transitions,
                   round(-sum((CAST(c.n AS DOUBLE) / tot.tot)
                              * (log2(CAST(c.n AS DOUBLE))
                                 - log2(CAST(ca.cn AS DOUBLE)))), 6)
                       AS entropy_rate
            FROM c JOIN ca USING (user_id, a)
            JOIN tot USING (user_id)
            GROUP BY c.user_id, tot.tot ORDER BY c.user_id
        """,
        "q_user_features": """
            WITH d AS (
                SELECT user_id, event_type, CAST(value AS DOUBLE) AS v,
                       CAST(epoch_us(ts) AS BIGINT) // 86400000000
                           AS day
                FROM events)
            SELECT user_id,
                   CAST(count(*) AS BIGINT) AS n_events,
                   round(sum(v) / count(*), 6) AS mean_value,
                   CAST(count(DISTINCT event_type) AS BIGINT)
                       AS n_types,
                   CAST(count(DISTINCT day) AS BIGINT) AS active_days,
                   CAST(max(day) - min(day) AS BIGINT) AS span_days
            FROM d GROUP BY user_id ORDER BY user_id
        """,
        "q_events_dp_counts": """
            WITH c AS (
                SELECT event_type, count(*) AS n
                FROM events GROUP BY event_type),
            u AS (
                SELECT event_type, n,
                       (CAST('0x' || substr(md5('dp|' || event_type),
                                            1, 13) AS UBIGINT)
                        % 1000000007) / 1000000007.0 - 0.5 AS u
                FROM c)
            SELECT event_type, CAST(n AS BIGINT) AS true_n,
                   round(n + (-(1.0 / 1.0) * sign(u)
                              * ln(1.0 - 2.0 * abs(u))), 6) AS dp_n
            FROM u ORDER BY event_type
        """,
        "doc_sentence_stats": """
            WITH s AS (
                SELECT doc_id, unnest(regexp_split_to_array(
                    coalesce(text, ''), '[.!?]+')) AS sent
                FROM documents),
            w AS (
                SELECT doc_id, len(list_filter(
                    regexp_split_to_array(sent, '\\s+'),
                    x -> x <> '')) AS words
                FROM s),
            k AS (SELECT doc_id, words FROM w WHERE words > 0),
            agg AS (
                SELECT doc_id, count(*) AS n_sentences,
                       round(sum(CAST(words AS DOUBLE)) / count(*), 6)
                           AS mean_words,
                       max(words) AS max_words
                FROM k GROUP BY doc_id)
            SELECT d.doc_id,
                   CAST(coalesce(a.n_sentences, 0) AS BIGINT)
                       AS n_sentences,
                   coalesce(a.mean_words, 0.0) AS mean_words,
                   CAST(coalesce(a.max_words, 0) AS BIGINT)
                       AS max_words
            FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
            ORDER BY d.doc_id
        """,
        "q_events_decayed_sum": """
            WITH t AS (SELECT max(epoch_us(ts)) AS tmax FROM events),
            w AS (
                SELECT user_id,
                       exp(-(CAST((SELECT tmax FROM t)
                                  - epoch_us(ts) AS DOUBLE)
                             / 86400000000.0)) AS wt,
                       CAST(value AS DOUBLE) AS v
                FROM events)
            SELECT user_id, round(sum(wt * v), 6) AS wsum,
                   round(sum(wt), 6) AS wtot
            FROM w GROUP BY user_id ORDER BY user_id
        """,
        "q_events_winsorized_mean": """
            WITH b AS (
                SELECT event_type,
                       quantile_cont(CAST(value AS DOUBLE), 0.05)
                           AS lo,
                       quantile_cont(CAST(value AS DOUBLE), 0.95)
                           AS hi
                FROM events GROUP BY event_type)
            SELECT e.event_type, CAST(count(*) AS BIGINT) AS n,
                   round(avg(CASE
                       WHEN CAST(value AS DOUBLE) < lo THEN lo
                       WHEN CAST(value AS DOUBLE) > hi THEN hi
                       ELSE CAST(value AS DOUBLE) END), 6)
                       AS winsorized_mean
            FROM events e JOIN b USING (event_type)
            GROUP BY e.event_type ORDER BY e.event_type
        """,
        "q_user_als_step": """
            WITH c AS (
                SELECT user_id, event_type, count(*) AS c
                FROM events GROUP BY user_id, event_type),
            f AS (
                SELECT DISTINCT event_type,
                       (CAST('0x' || substr(md5(event_type || '|1'),
                                            1, 8) AS UBIGINT)
                        % 1000000) / 1000000.0 - 0.5 AS f1,
                       (CAST('0x' || substr(md5(event_type || '|2'),
                                            1, 8) AS UBIGINT)
                        % 1000000) / 1000000.0 - 0.5 AS f2
                FROM events),
            p AS (
                SELECT user_id,
                       sum(f1 * f1) AS a11s, sum(f1 * f2) AS a12,
                       sum(f2 * f2) AS a22s,
                       sum(c * f1) AS b1, sum(c * f2) AS b2
                FROM c JOIN f USING (event_type)
                GROUP BY user_id)
            SELECT user_id,
                   round(((a22s + 0.1) * b1 - a12 * b2)
                         / ((a11s + 0.1) * (a22s + 0.1)
                            - a12 * a12), 6) AS x1,
                   round(((a11s + 0.1) * b2 - a12 * b1)
                         / ((a11s + 0.1) * (a22s + 0.1)
                            - a12 * a12), 6) AS x2
            FROM p ORDER BY user_id
        """,
        "q_events_auc": """
            WITH s AS (
                SELECT event_id, CAST(value AS DOUBLE) AS v,
                       CASE WHEN event_type = 'purchase'
                            THEN 1 ELSE 0 END AS pos
                FROM events),
            r AS (SELECT v, pos, row_number() OVER (
                      ORDER BY v, event_id) AS rn FROM s),
            g AS (SELECT v, count(*) AS n, sum(pos) AS np,
                         avg(CAST(rn AS DOUBLE)) AS ar
                  FROM r GROUP BY v),
            agg AS (SELECT sum(np * ar) AS s, sum(np) AS p,
                           sum(n) AS t
                    FROM g)
            SELECT CAST(p AS BIGINT) AS n_pos,
                   CAST(t - p AS BIGINT) AS n_neg,
                   round((s - p * (p + 1.0) / 2.0)
                         / (p * (t - p)), 6) AS auc
            FROM agg
        """,
        "doc_hapax": """
            WITH w AS (
                SELECT source, unnest(list_filter(
                    regexp_split_to_array(lower(coalesce(text, '')),
                                          '\\s+'),
                    x -> x <> '')) AS word
                FROM documents),
            c AS (SELECT source, word, count(*) AS n
                  FROM w GROUP BY source, word)
            SELECT source, CAST(count(*) AS BIGINT) AS vocab,
                   CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS hapax,
                   round(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)
                         / CAST(count(*) AS DOUBLE), 6)
                       AS hapax_ratio
            FROM c GROUP BY source ORDER BY source
        """,
        "doc_zipf_slope": """
            WITH w AS (
                SELECT source, unnest(list_filter(
                    regexp_split_to_array(lower(coalesce(text, '')),
                                          '\\s+'),
                    x -> x <> '')) AS word
                FROM documents),
            c AS (SELECT source, word, count(*) AS n
                  FROM w GROUP BY source, word),
            r AS (SELECT source, n, row_number() OVER (
                      PARTITION BY source
                      ORDER BY n DESC, word) AS rk
                  FROM c)
            SELECT source, CAST(count(*) AS BIGINT) AS n_terms,
                   round(regr_slope(ln(CAST(n AS DOUBLE)),
                                    ln(CAST(rk AS DOUBLE))), 6)
                       AS slope,
                   round(regr_intercept(ln(CAST(n AS DOUBLE)),
                                        ln(CAST(rk AS DOUBLE))), 6)
                       AS intercept
            FROM r WHERE rk <= 1000 GROUP BY source ORDER BY source
        """,
        "doc_nb_predict": """
            WITH wl AS (
                SELECT doc_id, lang, unnest(list_filter(
                    regexp_split_to_array(lower(coalesce(text, '')),
                                          '\\s+'),
                    x -> x <> '')) AS word
                FROM documents),
            wc AS (SELECT doc_id, word, count(*) AS cnt
                   FROM wl GROUP BY doc_id, word),
            c AS (SELECT lang, word, count(*) AS n
                  FROM wl GROUP BY lang, word),
            v AS (SELECT count(DISTINCT word) AS vocab FROM c),
            tok AS (SELECT lang, sum(n) AS tok FROM c GROUP BY lang),
            d AS (SELECT lang, count(*) AS docs
                  FROM documents GROUP BY lang),
            tot AS (SELECT sum(docs) AS total FROM d),
            ws AS (
                SELECT wc.doc_id, t.lang,
                       sum(wc.cnt * (ln(coalesce(c.n, 0) + 1.0)
                           - ln(t.tok + (SELECT vocab FROM v)))) AS s
                FROM wc CROSS JOIN tok t
                LEFT JOIN c ON c.lang = t.lang AND c.word = wc.word
                GROUP BY wc.doc_id, t.lang),
            sc AS (
                SELECT doc.doc_id, d.lang,
                       coalesce(ws.s, 0)
                       + ln(CAST(d.docs AS DOUBLE))
                       - ln((SELECT total FROM tot)) AS score
                FROM documents doc CROSS JOIN d
                LEFT JOIN ws ON ws.doc_id = doc.doc_id
                            AND ws.lang = d.lang),
            r AS (SELECT doc_id, lang, score, row_number() OVER (
                      PARTITION BY doc_id
                      ORDER BY score DESC, lang) AS rk
                  FROM sc)
            SELECT doc_id, lang AS pred_lang,
                   round(score, 6) AS score
            FROM r WHERE rk = 1 ORDER BY doc_id
        """,
        "emb_mutual_nn": """
            WITH nn AS (
                SELECT src, dst FROM (
                    SELECT q.vec_id AS src, e.vec_id AS dst,
                           row_number() OVER (
                               PARTITION BY q.vec_id
                               ORDER BY list_cosine_similarity(
                                   e.embedding, q.embedding) DESC,
                                        e.vec_id) AS rk
                    FROM embeddings q CROSS JOIN embeddings e
                    WHERE e.vec_id <> q.vec_id
                ) WHERE rk = 1)
            SELECT a.src AS vec_a, a.dst AS vec_b
            FROM nn a JOIN nn b
              ON b.src = a.dst AND b.dst = a.src
            WHERE a.src < a.dst
            ORDER BY vec_a
        """,
        "q_events_interpolate": """
            WITH o AS (
                SELECT user_id,
                       CAST(epoch(date_trunc('hour', ts)) AS BIGINT)
                           // 3600 AS h,
                       avg(CAST(value AS DOUBLE)) AS v
                FROM events GROUP BY user_id, 2),
            b AS (SELECT user_id, min(h) AS h0, max(h) AS h1
                  FROM o GROUP BY user_id),
            spine AS (
                SELECT user_id, unnest(generate_series(h0, h1)) AS h
                FROM b),
            j AS (SELECT s.user_id, s.h, o.v
                  FROM spine s LEFT JOIN o
                    ON o.user_id = s.user_id AND o.h = s.h),
            f AS (
                SELECT user_id, h, v,
                       last_value(v IGNORE NULLS) OVER w1 AS pv,
                       last_value(CASE WHEN v IS NOT NULL THEN h END
                                  IGNORE NULLS) OVER w1 AS ph,
                       first_value(v IGNORE NULLS) OVER w2 AS nv,
                       first_value(CASE WHEN v IS NOT NULL THEN h END
                                   IGNORE NULLS) OVER w2 AS nh
                FROM j WINDOW
                    w1 AS (PARTITION BY user_id ORDER BY h
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW),
                    w2 AS (PARTITION BY user_id ORDER BY h
                           ROWS BETWEEN CURRENT ROW
                           AND UNBOUNDED FOLLOWING))
            SELECT user_id, h AS hour,
                   round(CASE WHEN v IS NOT NULL THEN v
                         ELSE pv + (nv - pv)
                              * (CAST(h - ph AS DOUBLE)
                                 / CAST(nh - ph AS DOUBLE)) END,
                         6) AS value,
                   CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END
                       AS observed
            FROM f ORDER BY user_id, hour
        """,
        "q_events_moments": """
            SELECT event_type, count(*) AS n,
                   round(skewness(CAST(value AS DOUBLE)), 6) AS skew,
                   round(kurtosis(CAST(value AS DOUBLE)), 6) AS kurt
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "q_events_holt": """
            WITH RECURSIVE ord AS MATERIALIZED (
                SELECT user_id, CAST(value AS DOUBLE) AS value,
                       row_number() OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS rn
                FROM events),
            h AS (
                SELECT user_id, rn, value AS lev,
                       CAST(0.0 AS DOUBLE) AS tr
                FROM ord WHERE rn = 1
                UNION ALL
                SELECT o.user_id, o.rn,
                       0.2 * o.value + 0.8 * (h.lev + h.tr),
                       0.1 * ((0.2 * o.value + 0.8 * (h.lev + h.tr))
                              - h.lev) + 0.9 * h.tr
                FROM h JOIN ord o
                  ON o.user_id = h.user_id AND o.rn = h.rn + 1),
            last AS (
                SELECT user_id, max(rn) AS n FROM ord GROUP BY user_id)
            SELECT l.user_id, l.n,
                   round(h.lev, 6) AS level, round(h.tr, 6) AS trend
            FROM last l JOIN h ON h.user_id = l.user_id AND h.rn = l.n
            ORDER BY l.user_id
        """,
        "dedup_components": """
            WITH RECURSIVE words AS (
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
            ),
            edges AS (
                SELECT doc_a, doc_b
                FROM inter
                JOIN cnt ca ON ca.doc_id = doc_a
                JOIN cnt cb ON cb.doc_id = doc_b
                WHERE CAST(i AS DOUBLE) / (ca.c + cb.c - i) >= 0.7
            ),
            sym AS (
                SELECT doc_a AS a, doc_b AS b FROM edges
                UNION ALL
                SELECT doc_b AS a, doc_a AS b FROM edges
            ),
            reach(a, b) AS (
                SELECT a, b FROM sym
                UNION
                SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
            )
            SELECT a AS node, least(a, min(b)) AS component
            FROM reach GROUP BY a ORDER BY node
        """,
        "dedup_survivors": """
            WITH RECURSIVE words AS (
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
            ),
            edges AS (
                SELECT doc_a, doc_b
                FROM inter
                JOIN cnt ca ON ca.doc_id = doc_a
                JOIN cnt cb ON cb.doc_id = doc_b
                WHERE CAST(i AS DOUBLE) / (ca.c + cb.c - i) >= 0.7
            ),
            sym AS (
                SELECT doc_a AS a, doc_b AS b FROM edges
                UNION ALL
                SELECT doc_b AS a, doc_a AS b FROM edges
            ),
            reach(a, b) AS (
                SELECT a, b FROM sym
                UNION
                SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
            ),
            losers AS (
                SELECT a FROM (
                    SELECT a, least(a, min(b)) AS comp
                    FROM reach GROUP BY a
                ) WHERE comp < a
            )
            SELECT doc_id FROM documents
            WHERE doc_id NOT IN (SELECT a FROM losers)
            ORDER BY doc_id
        """,
        "dedup_simhash_pairs": """
            WITH w AS (
                SELECT doc_id, unnest(list_distinct(list_filter(
                    regexp_split_to_array(lower(text), '\\s+'),
                    x -> x <> ''))) AS w
                FROM documents
            ),
            h AS (
                SELECT doc_id,
                       CAST('0x' || substr(md5(w), 1, 16) AS UBIGINT) AS h
                FROM w
            ),
            v AS (
                SELECT doc_id, b.bit,
                       sum(CASE WHEN (h >> b.bit) & 1 = 1
                                THEN 1 ELSE -1 END) AS vote
                FROM h CROSS JOIN (SELECT unnest(range(64)) AS bit) b
                GROUP BY doc_id, b.bit
            ),
            sim AS (
                SELECT doc_id,
                       CAST(sum(CASE WHEN vote > 0
                                     THEN 1::UBIGINT << bit
                                     ELSE 0 END) AS UBIGINT) AS sh
                FROM v GROUP BY doc_id
            ),
            all_docs AS (
                SELECT d.doc_id, coalesce(s.sh, 0::UBIGINT) AS sh
                FROM documents d LEFT JOIN sim s ON d.doc_id = s.doc_id
            )
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
            FROM all_docs a JOIN all_docs b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.sh, b.sh)) <= 3
              AND ((a.sh >> 0) & 65535 = (b.sh >> 0) & 65535
                OR (a.sh >> 16) & 65535 = (b.sh >> 16) & 65535
                OR (a.sh >> 32) & 65535 = (b.sh >> 32) & 65535
                OR (a.sh >> 48) & 65535 = (b.sh >> 48) & 65535)
            ORDER BY doc_a, doc_b
        """,
        "emb_near_dups": """
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.95
            ORDER BY vec_a, vec_b
        """,
        "ann_topk": """
            SELECT query_idx, vec_id FROM (
                SELECT q.vec_id AS query_idx, e.vec_id AS vec_id,
                       row_number() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY list_cosine_similarity(e.embedding, q.embedding) DESC,
                                    e.vec_id) AS rk
                FROM embeddings q CROSS JOIN embeddings e
                WHERE q.vec_id < 3
            ) WHERE rk <= 5 ORDER BY query_idx, vec_id
        """,
        "q_join_skew_audit": """
            WITH lc AS (
                SELECT l_orderkey AS k, count(*) AS n
                FROM lineitem GROUP BY 1),
            oc AS (
                SELECT o_orderkey AS k, count(*) AS n
                FROM orders GROUP BY 1),
            l AS (
                SELECT 'lineitem' AS side, count(*) AS n_keys,
                       sum(n) AS total_rows, max(n) AS max_rows,
                       quantile_cont(CAST(n AS DOUBLE), 0.5) AS p50,
                       quantile_cont(CAST(n AS DOUBLE), 0.99) AS p99
                FROM lc),
            o AS (
                SELECT 'orders' AS side, count(*) AS n_keys,
                       sum(n) AS total_rows, max(n) AS max_rows,
                       quantile_cont(CAST(n AS DOUBLE), 0.5) AS p50,
                       quantile_cont(CAST(n AS DOUBLE), 0.99) AS p99
                FROM oc)
            SELECT side, CAST(n_keys AS BIGINT) AS n_keys,
                   CAST(total_rows AS BIGINT) AS total_rows,
                   CAST(max_rows AS BIGINT) AS max_rows,
                   round(p50, 6) AS p50_rows, round(p99, 6) AS p99_rows
            FROM (SELECT * FROM l UNION ALL SELECT * FROM o)
            ORDER BY side
        """,
        "q_events_hill_tail": """
            WITH t AS (
                SELECT CAST(value AS DOUBLE) AS v FROM events
                WHERE value IS NOT NULL
                ORDER BY v DESC LIMIT 201),
            r AS (SELECT v, row_number() OVER (ORDER BY v DESC)
                      AS rk
                  FROM t),
            xk AS (SELECT v AS xk1 FROM r WHERE rk = 201),
            s AS (SELECT sum(ln(v / (SELECT xk1 FROM xk))) AS ls
                  FROM r WHERE rk <= 200)
            SELECT CAST(200 AS BIGINT) AS k,
                   round((SELECT xk1 FROM xk), 6) AS x_k1,
                   round(s.ls, 6) AS log_sum,
                   round(200 / s.ls, 6) AS alpha
            FROM s
        """,
        "q_events_mutual_info": """
            WITH j AS (
                SELECT event_type,
                       (CAST(epoch_us(ts) AS BIGINT) // 3600000000)
                           % 24 AS hod,
                       count(*) AS c
                FROM events GROUP BY 1, 2),
            tot AS (SELECT sum(c) AS n FROM j),
            mx AS (SELECT event_type, sum(c) AS cx FROM j GROUP BY 1),
            my AS (SELECT hod, sum(c) AS cy FROM j GROUP BY 1),
            mi AS (
                SELECT sum((j.c / t.n)
                           * ln((j.c / t.n)
                                / ((mx.cx / t.n) * (my.cy / t.n))))
                           AS mi
                FROM j
                CROSS JOIN tot t
                JOIN mx ON j.event_type = mx.event_type
                JOIN my ON j.hod = my.hod),
            hx AS (SELECT -sum((cx / t.n) * ln(cx / t.n)) AS h
                   FROM mx, tot t),
            hy AS (SELECT -sum((cy / t.n) * ln(cy / t.n)) AS h
                   FROM my, tot t)
            SELECT CAST((SELECT n FROM tot) AS BIGINT) AS n,
                   round((SELECT h FROM hx), 6) AS h_type,
                   round((SELECT h FROM hy), 6) AS h_hour,
                   round((SELECT mi FROM mi), 6) AS mi,
                   round((SELECT mi FROM mi)
                         / sqrt((SELECT h FROM hx)
                                * (SELECT h FROM hy)), 6) AS nmi
        """,
        "q_events_drawdown": """
            WITH g AS (
                SELECT CAST(epoch_us(ts) AS BIGINT) // 3600000000
                           AS hour,
                       sum(CAST(round(value * 100, 0) AS BIGINT)) AS c
                FROM events GROUP BY 1),
            o AS (
                SELECT hour,
                       sum(c) OVER (ORDER BY hour) AS cum
                FROM g),
            m AS (
                SELECT hour, cum,
                       max(cum) OVER (ORDER BY hour) AS runmax
                FROM o),
            t AS (
                SELECT hour AS trough_hour, cum AS trough_cum, runmax
                FROM m ORDER BY runmax - cum DESC, hour ASC LIMIT 1)
            SELECT
                (SELECT min(m.hour) FROM m, t
                 WHERE m.cum = t.runmax
                   AND m.hour <= t.trough_hour) AS peak_hour,
                t.trough_hour,
                round(t.runmax / 100.0, 2) AS peak_cum,
                round(t.trough_cum / 100.0, 2) AS trough_cum,
                round((t.runmax - t.trough_cum) / 100.0, 2)
                    AS max_drawdown
            FROM t
        """,
        "q_events_kmv_distinct": """
            WITH h AS (
                SELECT DISTINCT event_type,
                       CAST('0x' || substr(
                           md5(CAST(user_id AS VARCHAR)), 1, 16)
                           AS UBIGINT) AS hash
                FROM events),
            r AS (
                SELECT event_type, hash,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY hash) AS rk,
                       count(*) OVER (PARTITION BY event_type) AS nd
                FROM h),
            kth AS (
                SELECT event_type,
                       CAST(least(nd, 64) AS BIGINT) AS k_used,
                       CAST(hash AS DOUBLE)
                           / 18446744073709551616.0 AS frac,
                       nd
                FROM r WHERE rk = least(nd, 64))
            SELECT event_type, k_used,
                   round(frac, 6) AS kth_frac,
                   round(CASE WHEN k_used < 64
                              THEN CAST(k_used AS DOUBLE)
                              ELSE 63.0 / frac END, 6)
                       AS est_distinct
            FROM kth ORDER BY event_type
        """,
        "q_events_xcorr": """
            WITH g AS (
                SELECT event_type,
                       CAST(epoch_us(ts) AS BIGINT) // 3600000000
                           AS hour,
                       count(*) AS c
                FROM events GROUP BY 1, 2),
            pick AS (
                SELECT event_type,
                       row_number() OVER (ORDER BY sum(c) DESC,
                                          event_type ASC) AS rk
                FROM g GROUP BY event_type),
            span AS (
                SELECT min(hour) AS hmin, max(hour) AS hmax
                FROM g JOIN pick USING (event_type)
                WHERE pick.rk <= 2),
            grid AS (
                SELECT unnest(generate_series(
                    (SELECT hmin FROM span),
                    (SELECT hmax FROM span))) AS hour),
            a AS (
                SELECT grid.hour, coalesce(g.c, 0) AS c
                FROM grid LEFT JOIN
                     (SELECT hour, c FROM g JOIN pick USING (event_type)
                      WHERE pick.rk = 1) g USING (hour)),
            b AS (
                SELECT grid.hour, coalesce(g.c, 0) AS c
                FROM grid LEFT JOIN
                     (SELECT hour, c FROM g JOIN pick USING (event_type)
                      WHERE pick.rk = 2) g USING (hour)),
            lags AS (
                SELECT unnest(generate_series(-3, 3)) AS lag),
            pair AS (
                SELECT l.lag, a.c AS x, b.c AS y
                FROM lags l
                JOIN a ON TRUE
                JOIN b ON b.hour = a.hour + l.lag),
            s AS (
                SELECT lag, count(*) AS m,
                       sum(x) AS sx, sum(y) AS sy,
                       sum(x * x) AS sxx, sum(y * y) AS syy,
                       sum(x * y) AS sxy
                FROM pair GROUP BY lag)
            SELECT CAST(lag AS BIGINT) AS lag,
                   CAST(m AS BIGINT) AS n_hours,
                   round((m * sxy - sx * sy)
                         / (sqrt(CAST(m * sxx - sx * sx AS DOUBLE))
                            * sqrt(CAST(m * syy - sy * sy AS DOUBLE))),
                         6) AS r
            FROM s ORDER BY lag
        """,
        "q_events_changepoint": """
            WITH g AS (
                SELECT CAST(epoch_us(ts) AS BIGINT) // 3600000000
                           AS hour,
                       count(*) AS c
                FROM events GROUP BY 1),
            o AS (
                SELECT hour, CAST(c AS DOUBLE) AS y,
                       row_number() OVER (ORDER BY hour) AS i,
                       sum(CAST(c AS DOUBLE)) OVER (ORDER BY hour)
                           AS s,
                       sum(CAST(c AS DOUBLE) * c) OVER
                           (ORDER BY hour) AS s2
                FROM g),
            tot AS (SELECT max(s) AS ts_, max(s2) AS ts2,
                           max(i) AS n
                    FROM o),
            cand AS (
                SELECT o2.hour AS split_hour, o.i AS k,
                       o.s, o.s2
                FROM o JOIN o o2 ON o2.i = o.i + 1),
            cost AS (
                SELECT split_hour, k,
                       (s2 - (s * s) / k)
                       + (((SELECT ts2 FROM tot) - s2)
                          - (((SELECT ts_ FROM tot) - s)
                             * ((SELECT ts_ FROM tot) - s))
                            / ((SELECT n FROM tot) - k)) AS sse,
                       s
                FROM cand),
            best AS (
                SELECT * FROM cost
                ORDER BY sse ASC, split_hour ASC LIMIT 1)
            SELECT split_hour,
                   CAST(k AS BIGINT) AS n_left,
                   CAST((SELECT n FROM tot) - k AS BIGINT)
                       AS n_right,
                   round(s / k, 6) AS mean_left,
                   round(((SELECT ts_ FROM tot) - s)
                         / ((SELECT n FROM tot) - k), 6)
                       AS mean_right,
                   round((SELECT ts2 FROM tot)
                         - ((SELECT ts_ FROM tot)
                            * (SELECT ts_ FROM tot))
                           / (SELECT n FROM tot), 6) AS sse_total,
                   round(sse, 6) AS sse_split
            FROM best
        """,
        "q_user_cuped": """
            WITH b AS (
                SELECT min(CAST(epoch_us(ts) AS BIGINT)) AS mn,
                       max(CAST(epoch_us(ts) AS BIGINT)) AS mx
                FROM events),
            per AS (
                SELECT user_id,
                       CASE WHEN CAST(epoch_us(ts) AS BIGINT)
                                 > (SELECT (mn + mx) // 2 FROM b)
                            THEN 1 ELSE 0 END AS period,
                       sum(CAST(value AS DOUBLE)) AS s,
                       count(*) AS n
                FROM events GROUP BY 1, 2),
            w AS (
                SELECT p0.user_id, p0.s / p0.n AS x, p1.s / p1.n AS y
                FROM per p0 JOIN per p1 ON p0.user_id = p1.user_id
                WHERE p0.period = 0 AND p1.period = 1),
            mm AS (SELECT avg(x) AS mx, avg(y) AS my FROM w),
            th AS (
                SELECT sum((x - mm.mx) * (y - mm.my))
                       / sum((x - mm.mx) * (x - mm.mx)) AS theta
                FROM w, mm),
            adj AS (
                SELECT user_id % 2 AS arm, y,
                       y - (SELECT theta FROM th)
                           * (x - (SELECT mx FROM mm)) AS yadj
                FROM w),
            am AS (
                SELECT arm, count(*) AS nu, avg(y) AS mya,
                       avg(yadj) AS myj
                FROM adj GROUP BY arm),
            v AS (
                SELECT adj.arm,
                       sum((adj.y - am.mya) * (adj.y - am.mya))
                           / max(am.nu) AS va,
                       sum((adj.yadj - am.myj) * (adj.yadj - am.myj))
                           / max(am.nu) AS vj
                FROM adj JOIN am ON am.arm = adj.arm
                GROUP BY adj.arm)
            SELECT am.arm, CAST(am.nu AS BIGINT) AS n_users,
                   round(am.mya, 6) AS mean_y,
                   round(am.myj, 6) AS mean_y_adj,
                   round(v.va, 6) AS var_y,
                   round(v.vj, 6) AS var_y_adj,
                   round((SELECT theta FROM th), 6) AS theta,
                   round(1.0 - v.vj / v.va, 6) AS var_reduction
            FROM am JOIN v USING (arm) ORDER BY am.arm
        """,
        "q_user_logrank": """
            WITH pp AS (
                SELECT user_id, event_id, user_id % 2 AS grp,
                       CAST(epoch_us(ts) AS BIGINT) AS t
                FROM events WHERE event_type = 'purchase'),
            h AS (SELECT max(CAST(epoch_us(ts) AS BIGINT)) AS horizon
                  FROM events),
            d AS (
                SELECT grp,
                       CASE WHEN lead(t) OVER w IS NULL
                            THEN (SELECT horizon FROM h) - t
                            ELSE lead(t) OVER w - t END AS dur,
                       CASE WHEN lead(t) OVER w IS NULL
                            THEN 1 ELSE 0 END AS cens
                FROM pp
                WINDOW w AS (PARTITION BY user_id
                             ORDER BY t, event_id)),
            grid AS (
                SELECT dur, count(*) AS all_n, sum(1 - cens) AS dd,
                       sum(CASE WHEN cens = 0 AND grp = 1
                                THEN 1 ELSE 0 END) AS dd1,
                       sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS a1
                FROM d GROUP BY dur),
            tot AS (SELECT sum(all_n) AS total, sum(a1) AS total1
                    FROM grid),
            r AS (
                SELECT dur, dd, dd1,
                       (SELECT total FROM tot)
                       - coalesce(sum(all_n) OVER (
                             ORDER BY dur
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING), 0) AS n,
                       (SELECT total1 FROM tot)
                       - coalesce(sum(a1) OVER (
                             ORDER BY dur
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING), 0) AS n1
                FROM grid),
            terms AS (
                SELECT dd, dd1,
                       CAST(dd1 AS DOUBLE)
                       - CAST(dd AS DOUBLE) * n1 / n AS om,
                       CASE WHEN n > 1
                            THEN CAST(dd AS DOUBLE)
                                 * (CAST(n1 AS DOUBLE) / n)
                                 * (1.0 - CAST(n1 AS DOUBLE) / n)
                                 * (n - dd) / (n - 1.0)
                            ELSE 0.0 END AS v
                FROM r WHERE dd > 0)
            SELECT CAST(sum(dd1) AS BIGINT) AS n_events_1,
                   CAST(sum(dd - dd1) AS BIGINT) AS n_events_0,
                   round(sum(om), 6) AS obs_minus_exp,
                   round(sum(v), 6) AS variance,
                   round(sum(om) * sum(om) / sum(v), 6) AS chi2
            FROM terms
        """,
        "q_user_km_survival": """
            WITH pp AS (
                SELECT user_id, event_id,
                       CAST(epoch_us(ts) AS BIGINT) AS t
                FROM events WHERE event_type = 'purchase'),
            h AS (SELECT max(CAST(epoch_us(ts) AS BIGINT)) AS horizon
                  FROM events),
            d AS (
                SELECT CASE WHEN lead(t) OVER w IS NULL
                            THEN (SELECT horizon FROM h) - t
                            ELSE lead(t) OVER w - t END AS dur,
                       CASE WHEN lead(t) OVER w IS NULL
                            THEN 1 ELSE 0 END AS cens
                FROM pp
                WINDOW w AS (PARTITION BY user_id
                             ORDER BY t, event_id)),
            grid AS (
                SELECT dur, count(*) AS all_n, sum(1 - cens) AS dd
                FROM d GROUP BY dur),
            tot AS (SELECT sum(all_n) AS total FROM grid),
            r AS (
                SELECT dur, dd,
                       (SELECT total FROM tot)
                       - coalesce(sum(all_n) OVER (
                             ORDER BY dur
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING), 0) AS n_risk
                FROM grid),
            e AS (
                SELECT dur, dd, n_risk,
                       sum(CASE WHEN dd = n_risk THEN 0.0
                                ELSE ln(1.0 - CAST(dd AS DOUBLE)
                                        / n_risk) END)
                           OVER (ORDER BY dur) AS ls
                FROM r WHERE dd > 0)
            SELECT dur AS dur_us, CAST(n_risk AS BIGINT) AS n_risk,
                   CAST(dd AS BIGINT) AS n_events,
                   CASE WHEN dd = n_risk THEN 0.0
                        ELSE round(exp(ls), 6) END AS survival
            FROM e ORDER BY dur_us
        """,
        "q_events_kanonymity": """
            WITH cls AS (
                SELECT user_id // 10 AS ubucket,
                       (CAST(epoch_us(ts) AS BIGINT) // 3600000000)
                           % 24 AS hod,
                       event_type, count(*) AS n
                FROM events GROUP BY 1, 2, 3),
            tot AS (SELECT sum(n) AS n_rows, count(*) AS n_classes,
                           min(n) AS mn
                    FROM cls),
            sm AS (SELECT count(*) AS n_small,
                          coalesce(sum(n), 0) AS at_risk
                   FROM cls WHERE n < 5)
            SELECT CAST(tot.n_rows AS BIGINT) AS n_rows,
                   CAST(tot.n_classes AS BIGINT) AS n_classes,
                   CAST(sm.n_small AS BIGINT) AS n_small_classes,
                   CAST(sm.at_risk AS BIGINT) AS rows_at_risk,
                   round(CAST(sm.at_risk AS DOUBLE) / tot.n_rows, 6)
                       AS risk_share,
                   CAST(tot.mn AS BIGINT) AS min_class
            FROM tot, sm
        """,
        "q_user_ab_assignment": """
            WITH u AS (
                SELECT user_id, count(*) AS n_events
                FROM events GROUP BY user_id),
            a AS (
                SELECT user_id, n_events,
                       CAST(CAST('0x' || substr(md5('ab|'
                           || CAST(user_id AS VARCHAR)), 1, 16)
                           AS UBIGINT) % 2 AS BIGINT) AS arm
                FROM u),
            g AS (
                SELECT arm, count(*) AS n_users,
                       sum(n_events) AS n_events
                FROM a GROUP BY arm),
            s AS (
                SELECT (max(CASE WHEN arm = 0 THEN n_users END)
                        - max(CASE WHEN arm = 1 THEN n_users END))
                       AS d,
                       sum(n_users) AS t
                FROM g)
            SELECT g.arm, CAST(g.n_users AS BIGINT) AS n_users,
                   CAST(g.n_events AS BIGINT) AS n_events,
                   round(CAST(s.d AS DOUBLE) * s.d / s.t, 6)
                       AS srm_chi2,
                   CAST(CASE WHEN CAST(s.d AS DOUBLE) * s.d / s.t
                                  > 3.841459
                             THEN 1 ELSE 0 END AS BIGINT) AS srm_flag
            FROM g, s ORDER BY g.arm
        """,
        "doc_postings_size": """
            WITH tok AS (
                SELECT DISTINCT doc_id,
                       unnest(list_filter(
                           regexp_split_to_array(lower(text), '\\s+'),
                           x -> x <> '')) AS term
                FROM documents),
            g AS (
                SELECT term, doc_id,
                       doc_id - lag(doc_id) OVER (
                           PARTITION BY term ORDER BY doc_id) AS gap
                FROM tok),
            b AS (SELECT term, coalesce(gap, doc_id) AS gp FROM g),
            sz AS (
                SELECT term, count(*) AS df,
                       sum(CASE WHEN gp < 128 THEN 1
                                WHEN gp < 16384 THEN 2
                                WHEN gp < 2097152 THEN 3
                                WHEN gp < 268435456 THEN 4
                                ELSE 5 END) AS vbytes
                FROM b GROUP BY term)
            SELECT term, CAST(df AS BIGINT) AS df,
                   CAST(df * 8 AS BIGINT) AS raw_bytes,
                   CAST(vbytes AS BIGINT) AS varint_bytes,
                   round(CAST(vbytes AS DOUBLE) / (df * 8), 6)
                       AS ratio
            FROM sz ORDER BY term
        """,
        "q_part_modularity": """
            WITH inc AS MATERIALIZED (
                SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                FROM lineitem),
            e AS MATERIALIZED (
                SELECT DISTINCT a.p AS pa, b.p AS pb
                FROM inc a JOIN inc b ON a.o = b.o AND a.p < b.p),
            mm AS (SELECT CAST(count(*) AS DOUBLE) AS m FROM e),
            deg AS (
                SELECT u, count(*) AS d FROM (
                    SELECT pa AS u FROM e
                    UNION ALL SELECT pb FROM e)
                GROUP BY u),
            br AS (SELECT p_partkey, p_brand FROM part),
            w AS (
                SELECT x.p_brand AS brand, count(*) AS ec
                FROM e JOIN br x ON x.p_partkey = e.pa
                       JOIN br y ON y.p_partkey = e.pb
                WHERE x.p_brand = y.p_brand
                GROUP BY x.p_brand),
            ds AS (
                SELECT br.p_brand AS brand, sum(deg.d) AS dc
                FROM deg JOIN br ON br.p_partkey = deg.u
                GROUP BY br.p_brand)
            SELECT ds.brand,
                   CAST(coalesce(w.ec, 0) AS BIGINT) AS n_within,
                   CAST(ds.dc AS BIGINT) AS deg_sum,
                   round(coalesce(w.ec, 0) / (SELECT m FROM mm)
                         - (ds.dc / (2.0 * (SELECT m FROM mm)))
                           * (ds.dc / (2.0 * (SELECT m FROM mm))), 6)
                       AS contribution
            FROM ds LEFT JOIN w USING (brand)
            ORDER BY brand
        """,
        "q_supplier_hhi": """
            WITH r AS (
                SELECT l_suppkey,
                       sum(CAST(l_extendedprice AS DOUBLE)
                           * (1.0 - CAST(l_discount AS DOUBLE)))
                           AS revenue
                FROM lineitem GROUP BY l_suppkey),
            j AS (
                SELECT r.l_suppkey, r.revenue, s.s_nationkey
                FROM r JOIN supplier s ON s.s_suppkey = r.l_suppkey),
            t AS (
                SELECT s_nationkey, sum(revenue) AS tot
                FROM j GROUP BY s_nationkey)
            SELECT CAST(j.s_nationkey AS BIGINT) AS nationkey,
                   count(*) AS n_suppliers,
                   round(sum((j.revenue / t.tot)
                             * (j.revenue / t.tot)), 6) AS hhi
            FROM j JOIN t USING (s_nationkey)
            GROUP BY j.s_nationkey
            ORDER BY nationkey
        """,
        "q_events_theilsen": """
            WITH h AS (
                SELECT CAST(epoch_us(ts) AS BIGINT) // 3600000000
                           AS hour,
                       sum(CAST(value AS DOUBLE)) AS s,
                       count(*) AS n
                FROM events GROUP BY hour),
            m AS (SELECT hour, s / n AS mu FROM h),
            p AS (
                SELECT (b.mu - a.mu)
                       / (CAST(b.hour AS DOUBLE) - a.hour) AS slope
                FROM m a JOIN m b ON a.hour < b.hour),
            mx AS (SELECT avg(CAST(hour AS DOUBLE)) AS mh,
                          avg(mu) AS mm
                   FROM m),
            ols AS (
                SELECT sum((hour - mx.mh) * (mu - mx.mm))
                       / sum((hour - mx.mh) * (hour - mx.mh)) AS sl
                FROM m, mx)
            SELECT CAST((SELECT count(*) FROM m) AS BIGINT)
                       AS n_buckets,
                   CAST((SELECT count(*) FROM p) AS BIGINT)
                       AS n_pairs,
                   round((SELECT quantile_cont(slope, 0.5) FROM p), 6)
                       AS theilsen_slope,
                   round((SELECT sl FROM ols), 6) AS ols_slope
        """,
        "emb_ndcg": """
            WITH nn AS (
                SELECT q.vec_id AS qv, q.label AS ql,
                       e.label AS el,
                       row_number() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY list_cosine_similarity(
                               e.embedding, q.embedding) DESC,
                                    e.vec_id) AS rk
                FROM embeddings q JOIN embeddings e
                     ON e.vec_id <> q.vec_id),
            dcg AS (
                SELECT qv,
                       sum(CASE WHEN el = ql
                                THEN 1.0 / log2(CAST(rk AS DOUBLE)
                                                + 1.0)
                                ELSE 0.0 END) AS dcg
                FROM nn WHERE rk <= 10 GROUP BY qv),
            labcnt AS (
                SELECT label, count(*) AS c
                FROM embeddings GROUP BY label),
            idcg AS (
                SELECT l.label,
                       sum(1.0 / log2(CAST(r.g AS DOUBLE) + 1.0))
                           AS idcg
                FROM labcnt l,
                     LATERAL (SELECT unnest(range(1,
                         CAST(least(10, l.c - 1) AS BIGINT) + 1))
                         AS g) r
                GROUP BY l.label),
            nd AS (
                SELECT a.label,
                       coalesce(dcg.dcg, 0.0) / idcg.idcg AS ndcg
                FROM embeddings a
                LEFT JOIN dcg ON dcg.qv = a.vec_id
                JOIN idcg ON idcg.label = a.label)
            SELECT CAST(label AS BIGINT) AS label,
                   count(*) AS n_queries,
                   round(sum(ndcg) / count(*), 6) AS ndcg
            FROM nd GROUP BY label ORDER BY label
        """,
        "emb_mrr": """
            WITH nn AS (
                SELECT q.vec_id AS qv, q.label AS ql,
                       e.label AS el,
                       row_number() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY list_cosine_similarity(
                               e.embedding, q.embedding) DESC,
                                    e.vec_id) AS rk
                FROM embeddings q JOIN embeddings e
                     ON e.vec_id <> q.vec_id),
            hit AS (
                SELECT qv, min(rk) AS mrk
                FROM nn WHERE rk <= 10 AND el = ql GROUP BY qv),
            rr AS (
                SELECT a.label AS ql,
                       coalesce(CAST(1 AS DOUBLE) / hit.mrk,
                                CAST(0 AS DOUBLE)) AS rr
                FROM embeddings a LEFT JOIN hit ON hit.qv = a.vec_id)
            SELECT CAST(ql AS BIGINT) AS label,
                   count(*) AS n_queries,
                   round(sum(rr) / count(*), 6) AS mrr
            FROM rr GROUP BY ql ORDER BY label
        """,
        "emb_knn_predict": """
            WITH nn AS (
                SELECT query_idx, vec_id FROM (
                    SELECT q.vec_id AS query_idx, e.vec_id AS vec_id,
                           row_number() OVER (
                               PARTITION BY q.vec_id
                               ORDER BY list_cosine_similarity(
                                   e.embedding, q.embedding) DESC,
                                        e.vec_id) AS rk
                    FROM embeddings q CROSS JOIN embeddings e
                    WHERE q.vec_id < 3 AND e.vec_id <> q.vec_id
                ) WHERE rk <= 5),
            votes AS (
                SELECT nn.query_idx, e.label, count(*) AS n
                FROM nn JOIN embeddings e ON e.vec_id = nn.vec_id
                GROUP BY nn.query_idx, e.label),
            best AS (
                SELECT query_idx, label AS pred_label,
                       CAST(n AS BIGINT) AS n_votes,
                       row_number() OVER (PARTITION BY query_idx
                           ORDER BY n DESC, label) AS rk
                FROM votes)
            SELECT query_idx, pred_label, n_votes
            FROM best WHERE rk = 1 ORDER BY query_idx
        """,
        "emb_label_counts": """
            SELECT label, count(*) AS n FROM embeddings
            GROUP BY label ORDER BY label
        """,
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "q_top_customer_revenue": """
            SELECT c_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            GROUP BY c_name
            ORDER BY revenue DESC, c_name
            LIMIT 10
        """,
        "q_customers_per_region": """
            SELECT r_name, count(*) AS n_customers
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name ORDER BY r_name
        """,
        "q_events_hourly": """
            SELECT event_type, date_trunc('hour', ts) AS hour,
                   count(*) AS n_events,
                   round(sum(value), 2) AS sum_value
            FROM events
            GROUP BY event_type, date_trunc('hour', ts)
            ORDER BY event_type, hour
        """,
        "q_priciest_parts": """
            SELECT p_partkey, p_name, p_retailprice FROM part
            ORDER BY p_retailprice DESC, p_partkey LIMIT 5
        """,
        "q_supplier_balance": """
            SELECT s_nationkey, count(*) AS n_suppliers,
                   round(min(s_acctbal), 2) AS min_bal,
                   round(max(s_acctbal), 2) AS max_bal,
                   round(sum(s_acctbal), 2) AS sum_bal
            FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey
        """,
        "q_segment_avg_balance": """
            SELECT c_mktsegment, count(*) AS n_customers,
                   round(avg(c_acctbal), 4) AS avg_bal
            FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
        """,
        "q_distinct_segments": """
            SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment
        """,
        "q_urgent_orders": """
            SELECT o_orderkey, o_orderpriority,
                   round(o_totalprice, 2) AS o_totalprice
            FROM orders WHERE o_orderpriority = '1-URGENT'
            ORDER BY o_orderkey
        """,
        "q_building_revenue": """
            SELECT l_orderkey, o_orderdate,
                   round(sum(l_extendedprice * (1.0 - l_discount)), 2)
                       AS revenue
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1998-06-01'
              AND l_shipdate > TIMESTAMP '1998-06-01'
            GROUP BY l_orderkey, o_orderdate
            ORDER BY revenue DESC, l_orderkey
            LIMIT 10
        """,
        "q_customers_without_orders": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
            ORDER BY c_custkey
        """,
        "q_customers_with_orders_count": """
            SELECT count(*) AS n_customers FROM customer
            WHERE c_custkey IN (SELECT o_custkey FROM orders)
        """,
        "q_distinct_event_users": """
            SELECT count(DISTINCT user_id) AS n_users FROM events
        """,
        "q_events_value_quantiles": """
            SELECT round(quantile_cont(value, 0.25), 6) AS q25,
                   round(quantile_cont(value, 0.50), 6) AS q50,
                   round(quantile_cont(value, 0.75), 6) AS q75,
                   round(quantile_cont(value, 0.99), 6) AS q99
            FROM events
        """,
        "q_events_quantiles_by_type": """
            SELECT event_type, CAST(0.25 AS DOUBLE) AS q,
                   round(quantile_cont(value, 0.25), 6) AS value
            FROM events GROUP BY event_type
            UNION ALL
            SELECT event_type, CAST(0.5 AS DOUBLE) AS q,
                   round(quantile_cont(value, 0.50), 6) AS value
            FROM events GROUP BY event_type
            UNION ALL
            SELECT event_type, CAST(0.75 AS DOUBLE) AS q,
                   round(quantile_cont(value, 0.75), 6) AS value
            FROM events GROUP BY event_type
            ORDER BY event_type, q
        """,
        "doc_chunks": """
            WITH w AS (
                SELECT doc_id, list_filter(
                    regexp_split_to_array(lower(text), '\\s+'),
                    x -> x <> '') AS ws
                FROM documents),
            k AS (
                SELECT doc_id, ws, len(ws) AS n,
                       CASE WHEN len(ws) <= 24 THEN 1
                            ELSE (len(ws) - 24 + 16 - 1) // 16 + 1
                       END AS n_chunks
                FROM w WHERE len(ws) > 0)
            SELECT doc_id, i AS chunk_idx,
                   i * 16 AS start,
                   least(i * 16 + 24, n) AS "end",
                   array_to_string(
                       ws[i * 16 + 1 : least(i * 16 + 24, n)], ' ')
                       AS chunk_text
            FROM k, LATERAL (SELECT unnest(range(0, n_chunks)) AS i) t
            ORDER BY doc_id, chunk_idx
        """,
        "doc_weighted_sample": """
            WITH u AS (
                SELECT doc_id, source,
                       (CAST(CAST('0x' || substr(md5(CAST(doc_id AS
                            VARCHAR)), 1, 16) AS UBIGINT) % 1000000
                            AS DOUBLE) + 0.5) / 1000000 AS uu,
                       CASE source WHEN 'src0' THEN 4.0
                                   WHEN 'src1' THEN 0.5
                                   ELSE 1.0 END AS wt
                FROM documents)
            SELECT doc_id, source FROM u
            ORDER BY pow(uu, 1.0 / wt) DESC, doc_id
            LIMIT 50
        """,
        "doc_mixture_sample": """
            WITH w AS (
                SELECT doc_id, source,
                       CASE source WHEN 'src0' THEN 2.25
                                   WHEN 'src1' THEN 0.5
                                   ELSE 1.0 END AS wt,
                       CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                           1, 16) AS UBIGINT)
                           % 1000000 AS b
                FROM documents),
            n AS (SELECT doc_id, source,
                         CAST(floor(wt)
                              + CASE WHEN b < (wt - floor(wt)) * 1000000
                                     THEN 1 ELSE 0 END AS BIGINT)
                             AS n_copies
                  FROM w)
            SELECT doc_id, source, unnest(range(n_copies)) AS copy_idx
            FROM n WHERE n_copies > 0
            ORDER BY doc_id, copy_idx
        """,
        "dedup_incremental": """
            WITH h AS (
                SELECT doc_id,
                       CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                           1, 16) AS UBIGINT)
                           % 1000000 AS b,
                       regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')
                           AS k
                FROM documents),
            base AS (SELECT DISTINCT k FROM h WHERE b < 500000),
            inc AS (SELECT doc_id, k FROM h WHERE b >= 500000)
            SELECT min(doc_id) AS doc_id FROM inc
            WHERE k NOT IN (SELECT k FROM base)
            GROUP BY k ORDER BY doc_id
        """,
        "q_events_global_rank": """
            SELECT event_id,
                   row_number() OVER (ORDER BY value, event_id) - 1
                       AS rnk
            FROM events ORDER BY event_id
        """,
        "q_events_expectations": """
            SELECT 'user_id' AS "column", count(*) AS n_rows,
                   count(*) FILTER (user_id IS NULL) AS n_null,
                   round(CAST(min(user_id) AS DOUBLE), 6) AS vmin,
                   round(CAST(max(user_id) AS DOUBLE), 6) AS vmax,
                   count(*) FILTER (user_id < 0) AS n_out_of_range
            FROM events
            UNION ALL
            SELECT 'value', count(*),
                   count(*) FILTER (value IS NULL),
                   round(min(value), 6), round(max(value), 6),
                   count(*) FILTER (value < 0.0 OR value > 50.0)
            FROM events
            ORDER BY "column"
        """,
        "doc_snapshot_diff": """
            WITH old AS (
                SELECT doc_id,
                       regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')
                           AS k
                FROM documents WHERE doc_id < 450),
            new AS (
                SELECT doc_id,
                       regexp_replace(trim(lower(
                           CASE WHEN doc_id % 7 = 0
                                THEN text || ' v2' ELSE text END)),
                           '\\s+', ' ', 'g') AS k
                FROM documents WHERE doc_id >= 50)
            SELECT COALESCE(old.doc_id, new.doc_id) AS doc_id,
                   CASE WHEN old.doc_id IS NULL THEN 'added'
                        WHEN new.doc_id IS NULL THEN 'removed'
                        ELSE 'changed' END AS status
            FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id
            WHERE old.doc_id IS NULL OR new.doc_id IS NULL
               OR old.k <> new.k
            ORDER BY doc_id
        """,
        "q_user_activity_outer": """
            WITH o AS (SELECT o_custkey AS user_id, count(*) AS n_orders,
                              round(sum(o_totalprice), 2) AS total_spent
                       FROM orders GROUP BY o_custkey),
            e AS (SELECT user_id, count(*) AS n_events,
                         round(sum(value), 2) AS sum_value
                  FROM events GROUP BY user_id)
            SELECT COALESCE(o.user_id, e.user_id) AS user_id,
                   COALESCE(o.n_orders, 0) AS n_orders,
                   o.total_spent,
                   COALESCE(e.n_events, 0) AS n_events,
                   e.sum_value
            FROM o FULL OUTER JOIN e ON o.user_id = e.user_id
            ORDER BY user_id
        """,
        "q_events_time_since_prev": """
            SELECT event_id, user_id,
                   floor(epoch(ts) - epoch(lag(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id)))
                       AS delta_s
            FROM events ORDER BY event_id
        """,
        "q_events_type_pivot": """
            SELECT user_id,
                   sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                       AS n_click,
                   sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                       AS n_error,
                   sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS n_purchase,
                   sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                       AS n_signup,
                   sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                       AS n_view
            FROM events GROUP BY user_id ORDER BY user_id
        """,
        "q_top_parts_per_brand": """
            SELECT p_brand, p_partkey, round(p_retailprice, 2)
                       AS p_retailprice
            FROM (SELECT p_brand, p_partkey, p_retailprice,
                         row_number() OVER (
                             PARTITION BY p_brand
                             ORDER BY p_retailprice DESC, p_partkey)
                             AS rn
                  FROM part)
            WHERE rn <= 3 ORDER BY p_brand, p_partkey
        """,
        "q_events_value_buckets": """
            WITH b AS (
                SELECT event_type,
                       round(quantile_cont(value, 0.25), 6) AS b1,
                       round(quantile_cont(value, 0.50), 6) AS b2,
                       round(quantile_cont(value, 0.75), 6) AS b3
                FROM events GROUP BY event_type)
            SELECT e.event_id, e.event_type,
                   CASE WHEN e.value <= b.b1 THEN 1
                        WHEN e.value <= b.b2 THEN 2
                        WHEN e.value <= b.b3 THEN 3
                        ELSE 4 END AS bucket
            FROM events e JOIN b USING (event_type)
            ORDER BY e.event_id
        """,
        # HLL parity: exact only in the linear-counting regime — the
        # estimate then depends only on which md5-derived registers are
        # hit, which this SQL recomputes (see q_events_hll_users doc)
        "q_events_hll_users": """
            WITH regs AS (
                SELECT DISTINCT
                       CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                           1, 16) AS UBIGINT) >> 52 AS r
                FROM events),
            v AS (SELECT count(*) AS nset FROM regs)
            SELECT round(4096 * ln(4096.0 / (4096 - nset)), 6) AS estimate,
                   CAST(nset AS BIGINT) AS registers_set,
                   CAST(12 AS BIGINT) AS p
            FROM v
        """,
        "q_events_hll_by_type": """
            WITH regs AS (
                SELECT DISTINCT event_type,
                       CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                           1, 16) AS UBIGINT) >> 52 AS r
                FROM events),
            c AS (SELECT event_type, count(*) AS nset
                  FROM regs GROUP BY event_type)
            SELECT event_type,
                   round(4096 * ln(4096.0 / (4096 - nset)), 6) AS estimate,
                   CAST(nset AS BIGINT) AS registers_set
            FROM c ORDER BY event_type
        """,
        "q_events_props_agg": """
            SELECT event_type, count(*) AS n,
                   sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                       AS sum_k,
                   min(CAST(json_extract_string(props, '$.k') AS BIGINT))
                       AS min_k,
                   max(CAST(json_extract_string(props, '$.k') AS BIGINT))
                       AS max_k,
                   round(avg(CAST(json_extract_string(props, '$.k')
                                  AS BIGINT)), 6) AS avg_k
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "doc_pagerank": _pagerank_oracle_sql(),
        "q_part_hits": _hits_oracle_sql(),
        "q_lineitem_zorder": _zorder_oracle_sql(),
        "q_events_partition_plan": _partition_plan_oracle_sql(),
        "q_events_bootstrap_ci": _bootstrap_ci_oracle_sql(),
        "q_basket_triples": """
            WITH inc AS MATERIALIZED (
                SELECT DISTINCT l_orderkey AS o, l_partkey AS i
                FROM lineitem)
            SELECT a.i AS item_a, b.i AS item_b, c.i AS item_c,
                   count(*) AS support_count
            FROM inc a JOIN inc b ON a.o = b.o AND a.i < b.i
                       JOIN inc c ON a.o = c.o AND b.i < c.i
            GROUP BY a.i, b.i, c.i
            HAVING count(*) >= 2
            ORDER BY item_a, item_b, item_c
        """,
        "q_basket_rules": """
            WITH inc AS MATERIALIZED (
                SELECT DISTINCT l_orderkey AS o, l_partkey AS i
                FROM lineitem),
            n AS (SELECT count(DISTINCT o) AS nb FROM inc),
            cnt AS (SELECT i, count(*) AS c FROM inc GROUP BY i),
            pair AS (
                SELECT a.i AS ia, b.i AS ib, count(*) AS cab
                FROM inc a JOIN inc b ON a.o = b.o AND a.i < b.i
                GROUP BY a.i, b.i
                HAVING count(*) >= 2),
            dirs AS (
                SELECT ia AS ant, ib AS con, cab FROM pair
                UNION ALL SELECT ib, ia, cab FROM pair)
            SELECT d.ant AS antecedent, d.con AS consequent,
                   cab AS pair_count,
                   round(CAST(cab AS DOUBLE) / (SELECT nb FROM n), 6)
                       AS support,
                   round(CAST(cab AS DOUBLE) / ca.c, 6) AS confidence,
                   round(CAST((SELECT nb FROM n) AS DOUBLE) * cab
                         / (ca.c * cb.c), 6) AS lift
            FROM dirs d JOIN cnt ca ON ca.i = d.ant
                        JOIN cnt cb ON cb.i = d.con
            ORDER BY antecedent, consequent
        """,
        "doc_vocab": """
            WITH w AS (
                SELECT unnest(list_filter(
                    regexp_split_to_array(lower(text), '\\s+'),
                    x -> x <> '')) AS word
                FROM documents),
            c AS (SELECT word, count(*) AS cnt FROM w GROUP BY word),
            r AS (SELECT word, cnt,
                         row_number() OVER (ORDER BY cnt DESC, word) - 1
                             AS token_id
                  FROM c)
            SELECT token_id, word, cnt FROM r
            WHERE token_id < 200 ORDER BY token_id
        """,
        "emb_dim_stats": """
            SELECT i - 1 AS dim,
                   round(avg(embedding[i]), 6) AS mean,
                   round(var_samp(embedding[i]), 6) AS var
            FROM embeddings,
                 LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS i) t
            GROUP BY i ORDER BY dim
        """,
        "q_orders_events_window": """
            SELECT o_orderkey,
                   (SELECT count(*) FROM events e
                    WHERE e.user_id = o.o_custkey
                      AND e.ts BETWEEN o.o_orderdate - INTERVAL 7 DAY
                                   AND o.o_orderdate) AS n_matches,
                   (SELECT round(coalesce(sum(e.value), 0), 2)
                    FROM events e
                    WHERE e.user_id = o.o_custkey
                      AND e.ts BETWEEN o.o_orderdate - INTERVAL 7 DAY
                                   AND o.o_orderdate) AS sum_value
            FROM orders o ORDER BY o_orderkey
        """,
        "q_events_sliding": """
            SELECT event_type, window_start, count(*) AS n_events FROM (
                SELECT event_type,
                       date_trunc('hour', ts) - k * INTERVAL 1 HOUR AS window_start
                FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k)
            ) GROUP BY event_type, window_start
            ORDER BY event_type, window_start
        """,
        "q_events_sessions": """
            WITH d AS (
                SELECT user_id, ts,
                       CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                                 > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
                FROM events),
            s AS (
                SELECT user_id, ts,
                       sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS sid
                FROM d)
            SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
                   count(*) AS n_events
            FROM s GROUP BY user_id, sid
            ORDER BY user_id, session_start
        """,
        "q_orders_last_event": """
            SELECT o_orderkey,
                   (SELECT max(e.ts) FROM events e
                    WHERE e.user_id = o.o_custkey AND e.ts <= o.o_orderdate)
                       AS last_event_ts
            FROM orders o ORDER BY o_orderkey
        """,
        "doc_normalize_text": """
            SELECT doc_id,
                   array_to_string(list_filter(
                       regexp_split_to_array(
                           lower(nfc_normalize(coalesce(text, ''))),
                           '\\s+'),
                       x -> x <> ''), ' ') AS norm_text
            FROM documents ORDER BY doc_id
        """,
        "doc_corpus_stats": """
            WITH n AS (
                SELECT CAST({_N_TOKENS_SQL} AS DOUBLE) AS n_tokens,
                       lang
                FROM documents)
            SELECT count(*) AS n_docs,
                   CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
                   round(sum(n_tokens) / count(*), 6) AS mean_tokens,
                   round(quantile_cont(n_tokens, 0.5), 6) AS p50_tokens,
                   round(quantile_cont(n_tokens, 0.95), 6) AS p95_tokens,
                   count(DISTINCT lang) AS n_langs
            FROM n
        """.replace("{_N_TOKENS_SQL}", _N_TOKENS_SQL),
        "doc_redact_persons": f"""
            WITH dm AS ({_doc_mentions_sql()}),
            per AS (SELECT doc_id, m_start, m_end FROM dm
                    WHERE entity_type = 'PER'),
            w AS (
                SELECT doc_id, list_filter(
                    regexp_split_to_array(text, '\\s+'),
                    x -> x <> '') AS ws
                FROM documents
            ),
            t AS (
                SELECT doc_id, unnest(ws) AS tok,
                       unnest(range(len(ws))) AS pos
                FROM w
            ),
            cover AS (
                SELECT DISTINCT doc_id, unnest(range(m_start, m_end))
                       AS pos
                FROM per
            ),
            red AS (
                SELECT t.doc_id, t.pos,
                       CASE WHEN c.pos IS NOT NULL THEN '[NAME]'
                            ELSE t.tok END AS tok2
                FROM t LEFT JOIN cover c
                  ON t.doc_id = c.doc_id AND t.pos = c.pos
            ),
            cnt AS (
                SELECT doc_id, count(*) AS n_redacted FROM per
                GROUP BY doc_id
            )
            SELECT d.doc_id,
                   coalesce(r.redacted, '') AS redacted,
                   CAST(coalesce(cnt.n_redacted, 0) AS BIGINT)
                       AS n_redacted
            FROM documents d
            LEFT JOIN (SELECT doc_id,
                              string_agg(tok2, ' ' ORDER BY pos)
                                  AS redacted
                       FROM red GROUP BY doc_id) r
              ON r.doc_id = d.doc_id
            LEFT JOIN cnt ON cnt.doc_id = d.doc_id
            ORDER BY d.doc_id
        """,
        "kg_distant_supervision": f"""
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
        "kg_fuzzy_name_pairs": f"""
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
        "kg_jw_name_pairs": f"""
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
        "q_events_enrichment": """
            WITH m AS (
                SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                       CAST(count(*) FILTER (WHERE value >= 50.0)
                            AS BIGINT) AS k
                FROM events GROUP BY event_type),
            t AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
                         CAST(sum(k) AS BIGINT) AS kk FROM m),
            grid AS (
                SELECT m.event_type, m.n, m.k, t.nn, t.kk,
                       unnest(generate_series(
                           m.k, least(t.kk, m.n))) AS i
                FROM m CROSS JOIN t),
            p AS (
                SELECT event_type, sum(exp(
                    (lgamma(kk + 1.0) - lgamma(i + 1.0)
                     - lgamma(kk - i + 1.0))
                    + (lgamma(nn - kk + 1.0) - lgamma(n - i + 1.0)
                       - lgamma(nn - kk - (n - i) + 1.0))
                    - (lgamma(nn + 1.0) - lgamma(n + 1.0)
                       - lgamma(nn - n + 1.0)))) AS pv
                FROM grid GROUP BY event_type)
            SELECT m.event_type, m.n, m.k,
                   round((CAST(m.k AS DOUBLE) / m.n)
                         / (CAST(t.kk AS DOUBLE) / t.nn), 6)
                       AS ratio,
                   round(p.pv, 6) AS p_value
            FROM m CROSS JOIN t JOIN p USING (event_type)
            ORDER BY m.event_type
        """,
        "doc_front_coding": """
            WITH w AS (
                SELECT DISTINCT unnest(list_filter(
                    regexp_split_to_array(lower(text), '\\s+'),
                    x -> x <> '')) AS w
                FROM documents),
            o AS (SELECT w, lag(w) OVER (ORDER BY w) AS pw FROM w),
            l AS (
                SELECT w, CASE WHEN pw IS NULL THEN 0 ELSE
                    coalesce((SELECT max(i) FROM
                        (SELECT unnest(generate_series(1,
                             least(length(w), length(pw)))) AS i)
                        t(i)
                        WHERE substr(w, 1, i) = substr(pw, 1, i)),
                        0) END AS lcp
                FROM o)
            SELECT CAST(count(*) AS BIGINT) AS n_words,
                   CAST(sum(length(w)) AS BIGINT) AS raw_bytes,
                   CAST(sum(length(w) - lcp) AS BIGINT)
                       AS front_bytes
            FROM l
        """,
        "q_encoding_audit": """
            WITH s1 AS (
                SELECT 'lineitem' AS tbl, 'l_returnflag' AS col,
                       CAST(count(*) AS BIGINT) AS n,
                       CAST(count(DISTINCT l_returnflag) AS BIGINT)
                           AS n_distinct,
                       CAST((SELECT count(*) FROM (
                            SELECT CASE WHEN lag(l_returnflag) OVER w
                                        IS NULL
                                     OR lag(l_returnflag) OVER w
                                        <> l_returnflag
                                     OR lag(l_orderkey) OVER w2
                                        IS DISTINCT FROM l_orderkey
                                        THEN 1 ELSE 0 END AS st
                            FROM lineitem
                            WINDOW w AS (PARTITION BY l_orderkey
                                         ORDER BY l_linenumber,
                                                  l_returnflag),
                                   w2 AS (PARTITION BY l_orderkey
                                          ORDER BY l_linenumber,
                                                   l_returnflag)
                            ) WHERE st = 1) AS BIGINT) AS n_runs,
                       CAST(sum(length(l_returnflag)) AS BIGINT)
                           AS plain_bytes,
                       CAST((SELECT sum(length(v)) FROM (
                                SELECT DISTINCT l_returnflag AS v
                                FROM lineitem))
                            + (count(*) * (CASE
                                WHEN count(DISTINCT l_returnflag) = 1
                                THEN 0
                                ELSE length(format('{:b}',
                                    count(DISTINCT l_returnflag) - 1))
                                END) + 7) // 8 AS BIGINT)
                           AS dict_bytes
                FROM lineitem),
            s2 AS (
                SELECT 'lineitem', 'l_linestatus',
                       CAST(count(*) AS BIGINT),
                       CAST(count(DISTINCT l_linestatus) AS BIGINT),
                       CAST((SELECT count(*) FROM (
                            SELECT CASE WHEN lag(l_linestatus) OVER w
                                        IS NULL
                                     OR lag(l_linestatus) OVER w
                                        <> l_linestatus
                                        THEN 1 ELSE 0 END AS st
                            FROM lineitem
                            WINDOW w AS (PARTITION BY l_orderkey
                                         ORDER BY l_linenumber,
                                                  l_linestatus)
                            ) WHERE st = 1) AS BIGINT),
                       CAST(sum(length(l_linestatus)) AS BIGINT),
                       CAST((SELECT sum(length(v)) FROM (
                                SELECT DISTINCT l_linestatus AS v
                                FROM lineitem))
                            + (count(*) * (CASE
                                WHEN count(DISTINCT l_linestatus) = 1
                                THEN 0
                                ELSE length(format('{:b}',
                                    count(DISTINCT l_linestatus) - 1))
                                END) + 7) // 8 AS BIGINT)
                FROM lineitem),
            s3 AS (
                SELECT 'orders', 'o_orderpriority',
                       CAST(count(*) AS BIGINT),
                       CAST(count(DISTINCT o_orderpriority)
                            AS BIGINT),
                       CAST((SELECT count(*) FROM (
                            SELECT CASE WHEN lag(o_orderpriority)
                                        OVER w IS NULL
                                     OR lag(o_orderpriority) OVER w
                                        <> o_orderpriority
                                        THEN 1 ELSE 0 END AS st
                            FROM orders
                            WINDOW w AS (PARTITION BY o_custkey
                                         ORDER BY o_orderkey,
                                                  o_orderpriority)
                            ) WHERE st = 1) AS BIGINT),
                       CAST(sum(length(o_orderpriority)) AS BIGINT),
                       CAST((SELECT sum(length(v)) FROM (
                                SELECT DISTINCT o_orderpriority AS v
                                FROM orders))
                            + (count(*) * (CASE
                                WHEN count(DISTINCT o_orderpriority)
                                     = 1 THEN 0
                                ELSE length(format('{:b}',
                                    count(DISTINCT o_orderpriority)
                                    - 1)) END) + 7) // 8 AS BIGINT)
                FROM orders),
            s4 AS (
                SELECT 'customer', 'c_mktsegment',
                       CAST(count(*) AS BIGINT),
                       CAST(count(DISTINCT c_mktsegment) AS BIGINT),
                       CAST((SELECT count(*) FROM (
                            SELECT CASE WHEN lag(c_mktsegment) OVER w
                                        IS NULL
                                     OR lag(c_mktsegment) OVER w
                                        <> c_mktsegment
                                        THEN 1 ELSE 0 END AS st
                            FROM customer
                            WINDOW w AS (PARTITION BY c_nationkey
                                         ORDER BY c_custkey,
                                                  c_mktsegment)
                            ) WHERE st = 1) AS BIGINT),
                       CAST(sum(length(c_mktsegment)) AS BIGINT),
                       CAST((SELECT sum(length(v)) FROM (
                                SELECT DISTINCT c_mktsegment AS v
                                FROM customer))
                            + (count(*) * (CASE
                                WHEN count(DISTINCT c_mktsegment) = 1
                                THEN 0
                                ELSE length(format('{:b}',
                                    count(DISTINCT c_mktsegment)
                                    - 1)) END) + 7) // 8 AS BIGINT)
                FROM customer)
            SELECT * FROM (
                SELECT * FROM s1 UNION ALL SELECT * FROM s2
                UNION ALL SELECT * FROM s3 UNION ALL SELECT * FROM s4
            ) ORDER BY tbl, col
        """,
        "q_join_cardinality": """
            WITH j1 AS (
                SELECT 'orders' AS tbl_a, 'lineitem' AS tbl_b,
                       (SELECT count(*) FROM orders) AS n_a,
                       (SELECT count(*) FROM lineitem) AS n_b,
                       (SELECT count(DISTINCT o_orderkey)
                        FROM orders) AS d_a,
                       (SELECT count(DISTINCT l_orderkey)
                        FROM lineitem) AS d_b,
                       (SELECT count(*) FROM orders
                        JOIN lineitem ON o_orderkey = l_orderkey)
                           AS actual),
            j2 AS (
                SELECT 'customer', 'orders',
                       (SELECT count(*) FROM customer),
                       (SELECT count(*) FROM orders),
                       (SELECT count(DISTINCT c_custkey)
                        FROM customer),
                       (SELECT count(DISTINCT o_custkey)
                        FROM orders),
                       (SELECT count(*) FROM customer
                        JOIN orders ON c_custkey = o_custkey)),
            j3 AS (
                SELECT 'part', 'lineitem',
                       (SELECT count(*) FROM part),
                       (SELECT count(*) FROM lineitem),
                       (SELECT count(DISTINCT p_partkey) FROM part),
                       (SELECT count(DISTINCT l_partkey)
                        FROM lineitem),
                       (SELECT count(*) FROM part
                        JOIN lineitem ON p_partkey = l_partkey))
            SELECT tbl_a, tbl_b,
                   CAST(n_a AS BIGINT) AS n_a,
                   CAST(n_b AS BIGINT) AS n_b,
                   round(CAST(n_a AS DOUBLE) * n_b
                         / greatest(d_a, d_b), 6) AS est,
                   CAST(actual AS BIGINT) AS actual,
                   round(greatest(
                       (CAST(n_a AS DOUBLE) * n_b
                        / greatest(d_a, d_b)) / actual,
                       actual / (CAST(n_a AS DOUBLE) * n_b
                                 / greatest(d_a, d_b))), 6)
                       AS q_error
            FROM (SELECT * FROM j1 UNION ALL SELECT * FROM j2
                  UNION ALL SELECT * FROM j3)
            ORDER BY tbl_a, tbl_b
        """,
        "q_events_seasonal_naive": """
            WITH top1 AS (
                SELECT event_type FROM events GROUP BY event_type
                ORDER BY count(*) DESC, event_type LIMIT 1),
            h AS (
                SELECT CAST(epoch_us(ts) AS BIGINT) // 3600000000
                           AS hr,
                       count(*) AS k
                FROM events
                WHERE event_type = (SELECT event_type FROM top1)
                GROUP BY hr),
            span AS (SELECT min(hr) AS h0, max(hr) AS h1 FROM h),
            grid AS (
                SELECT unnest(generate_series(h0, h1)) AS hr
                FROM span),
            g2 AS MATERIALIZED (
                SELECT grid.hr,
                       CAST(coalesce(h.k, 0) AS BIGINT) AS k
                FROM grid LEFT JOIN h USING (hr)),
            lagged AS (
                SELECT k,
                       lag(k, 168) OVER (ORDER BY hr) AS ks,
                       lag(k, 1) OVER (ORDER BY hr) AS k1
                FROM g2),
            agg AS (
                SELECT CAST(count(ks) AS BIGINT) AS n_eval,
                       CAST(coalesce(sum(abs(k - ks)), 0) AS BIGINT)
                           AS sae_seasonal,
                       CAST(coalesce(sum(abs(k - k1)), 0) AS BIGINT)
                           AS sae_naive1,
                       CAST(count(k1) AS BIGINT) AS n1
                FROM lagged)
            SELECT n_eval, sae_seasonal, sae_naive1,
                   CASE WHEN n_eval > 0 AND sae_naive1 > 0
                        THEN round((CAST(sae_seasonal AS DOUBLE)
                                    / n_eval)
                                   / (CAST(sae_naive1 AS DOUBLE)
                                      / n1), 6)
                        ELSE 0.0 END AS mase
            FROM agg
        """,
        "doc_dirichlet_ql": """
            WITH w AS (
                SELECT doc_id, list_filter(
                    regexp_split_to_array(lower(text), '\\s+'),
                    x -> x <> '') AS ws
                FROM documents),
            tok AS (SELECT doc_id, unnest(ws) AS t FROM w),
            tot AS (SELECT CAST(sum(len(ws)) AS BIGINT) AS l FROM w),
            q(qi, t) AS (VALUES
                (0, 'fast'), (0, 'join'), (0, 'spark'),
                (1, 'dup'),
                (2, 'query'), (2, 'sort'), (2, 'stream'),
                (2, 'window')),
            ctf AS (SELECT t, CAST(count(*) AS BIGINT) AS c
                    FROM tok GROUP BY t),
            qq AS (SELECT q.qi, q.t, ctf.c
                   FROM q JOIN ctf ON ctf.t = q.t),
            ctd AS (SELECT tok.doc_id, tok.t,
                           CAST(count(*) AS BIGINT) AS c
                    FROM tok JOIN (SELECT DISTINCT t FROM qq) s
                         ON s.t = tok.t
                    GROUP BY tok.doc_id, tok.t),
            dl AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl
                   FROM w),
            lp AS (
                SELECT d.doc_id, qq.qi,
                       ln((coalesce(ctd.c, 0)
                           + 100.0 * (qq.c / (SELECT l FROM tot)))
                          / (d.dl + 100.0)) AS l
                FROM dl d CROSS JOIN qq
                LEFT JOIN ctd ON ctd.doc_id = d.doc_id
                             AND ctd.t = qq.t)
            SELECT qi AS query_idx, doc_id,
                   round(sum(l), 6) AS score
            FROM lp GROUP BY qi, doc_id ORDER BY query_idx, doc_id
        """,
        "q_customer_chash": """
            WITH r8 AS (
                SELECT 's' || CAST(s AS VARCHAR) AS server,
                       CAST('0x' || substr(md5(
                           's' || CAST(s AS VARCHAR) || '#'
                           || CAST(v AS VARCHAR)), 1, 16) AS UBIGINT)
                           AS pos
                FROM range(8) t(s), range(16) u(v)),
            r9 AS (
                SELECT 's' || CAST(s AS VARCHAR) AS server,
                       CAST('0x' || substr(md5(
                           's' || CAST(s AS VARCHAR) || '#'
                           || CAST(v AS VARCHAR)), 1, 16) AS UBIGINT)
                           AS pos
                FROM range(9) t(s), range(16) u(v)),
            k AS (SELECT c_custkey AS key,
                         CAST('0x' || substr(md5(
                             CAST(c_custkey AS VARCHAR)), 1, 16)
                             AS UBIGINT) AS pos
                  FROM customer),
            a8 AS (SELECT k.key, coalesce(
                       (SELECT r.server FROM r8 r
                        WHERE r.pos >= k.pos
                        ORDER BY r.pos, r.server LIMIT 1),
                       (SELECT r.server FROM r8 r
                        ORDER BY r.pos, r.server LIMIT 1)) AS s8
                   FROM k),
            a9 AS (SELECT k.key, coalesce(
                       (SELECT r.server FROM r9 r
                        WHERE r.pos >= k.pos
                        ORDER BY r.pos, r.server LIMIT 1),
                       (SELECT r.server FROM r9 r
                        ORDER BY r.pos, r.server LIMIT 1)) AS s9
                   FROM k),
            j AS (SELECT a8.key, a8.s8, a9.s9
                  FROM a8 JOIN a9 USING (key)),
            srv AS (SELECT 's' || CAST(s AS VARCHAR) AS server
                    FROM range(9) t(s))
            SELECT srv.server,
                   CAST(coalesce(b.n, 0) AS BIGINT) AS n_before,
                   CAST(coalesce(a.n, 0) AS BIGINT) AS n_after,
                   CAST(coalesce(m.n, 0) AS BIGINT) AS moved_out
            FROM srv
            LEFT JOIN (SELECT s8 AS server, count(*) AS n
                       FROM j GROUP BY s8) b USING (server)
            LEFT JOIN (SELECT s9, count(*) AS n FROM j GROUP BY s9) a
                   ON a.s9 = srv.server
            LEFT JOIN (SELECT s8, count(*) AS n FROM j
                       WHERE s8 <> s9 GROUP BY s8) m
                   ON m.s8 = srv.server
            ORDER BY server
        """,
        "q_events_kfold_cv": """
            WITH e AS (
                SELECT CAST(CAST('0x' || substr(md5(
                           CAST(event_id AS VARCHAR)), 1, 16)
                           AS UBIGINT) % 5 AS BIGINT) AS fold,
                       (epoch(ts) - epoch(TIMESTAMP '1995-01-01'))
                           / 86400.0 AS x,
                       value AS y
                FROM events),
            m AS (SELECT fold, CAST(count(*) AS DOUBLE) AS n,
                         sum(x) AS sx, sum(y) AS sy,
                         sum(x * x) AS sxx, sum(x * y) AS sxy,
                         sum(y * y) AS syy
                  FROM e GROUP BY fold),
            t AS (SELECT sum(n) AS n, sum(sx) AS sx, sum(sy) AS sy,
                         sum(sxx) AS sxx, sum(sxy) AS sxy
                  FROM m),
            tr AS (SELECT m.fold, m.n, m.sx, m.sy, m.sxx, m.sxy,
                          m.syy,
                          t.n - m.n AS nt, t.sx - m.sx AS sxt,
                          t.sy - m.sy AS syt, t.sxx - m.sxx AS sxxt,
                          t.sxy - m.sxy AS sxyt
                   FROM m CROSS JOIN t),
            fit AS (SELECT fold, n, sx, sy, sxx, sxy, syy,
                           (sxyt - sxt * syt / nt)
                               / (sxxt - sxt * sxt / nt) AS b,
                           syt / nt
                               - (sxyt - sxt * syt / nt)
                                 / (sxxt - sxt * sxt / nt)
                                 * sxt / nt AS a
                    FROM tr)
            SELECT CAST(fold AS BIGINT) AS fold,
                   CAST(n AS BIGINT) AS n_test,
                   round(b, 6) AS slope,
                   round(a, 6) AS intercept,
                   round((syy - 2 * a * sy - 2 * b * sxy
                          + n * a * a + 2 * a * b * sx
                          + b * b * sxx) / n, 6) AS mse
            FROM fit ORDER BY fold
        """,
        "doc_kn_logppl": """
            WITH w AS (
                SELECT doc_id, list_filter(
                    regexp_split_to_array(lower(text), '\\s+'),
                    x -> x <> '') AS ws
                FROM documents),
            pos AS (
                SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
                FROM w, LATERAL (SELECT unnest(range(1, len(ws)))
                                 AS i) t),
            bg AS (SELECT w1, w2, count(*) AS c2 FROM pos
                   GROUP BY w1, w2),
            ctx AS (SELECT w1, count(*) AS c1 FROM pos GROUP BY w1),
            f AS (SELECT w1, count(*) AS n1f FROM bg GROUP BY w1),
            b AS (SELECT w2, count(*) AS n1b FROM bg GROUP BY w2),
            bt AS (SELECT count(*) AS b FROM bg),
            lp AS (
                SELECT p.doc_id,
                       -ln(greatest(bg.c2 - 0.75, 0) / ctx.c1
                           + 0.75 * f.n1f / ctx.c1
                             * (b.n1b / bt.b)) AS l
                FROM pos p
                JOIN bg ON bg.w1 = p.w1 AND bg.w2 = p.w2
                JOIN ctx ON ctx.w1 = p.w1
                JOIN f ON f.w1 = p.w1
                JOIN b ON b.w2 = p.w2
                CROSS JOIN bt),
            per AS (SELECT doc_id, count(*) AS n_bigrams,
                           round(avg(l), 6) AS logppl
                    FROM lp GROUP BY doc_id)
            SELECT d.doc_id,
                   CAST(coalesce(per.n_bigrams, 0) AS BIGINT)
                       AS n_bigrams,
                   coalesce(per.logppl, 0.0) AS logppl
            FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
            ORDER BY d.doc_id
        """,
        "emb_label_prop": """
            WITH knn AS MATERIALIZED (
                SELECT src, dst FROM (
                    SELECT q.vec_id AS src, e.vec_id AS dst,
                           row_number() OVER (
                               PARTITION BY q.vec_id
                               ORDER BY list_cosine_similarity(
                                   e.embedding, q.embedding) DESC,
                                        e.vec_id) AS rk
                    FROM embeddings q CROSS JOIN embeddings e
                    WHERE e.vec_id <> q.vec_id
                ) WHERE rk <= 5),
            s0 AS (SELECT vec_id, CAST(label AS BIGINT) AS lab
                   FROM embeddings WHERE vec_id % 2 = 0),
            allv AS (SELECT vec_id FROM embeddings),
            v1 AS (SELECT k.src, s0.lab, count(*) AS c
                   FROM knn k JOIN s0 ON s0.vec_id = k.dst
                   GROUP BY k.src, s0.lab),
            p1 AS (SELECT src, lab FROM (
                       SELECT src, lab, row_number() OVER (
                           PARTITION BY src
                           ORDER BY c DESC, lab) AS rk FROM v1)
                   WHERE rk = 1),
            l1 AS (SELECT a.vec_id,
                          coalesce(s0.lab, p1.lab, -1) AS lab
                   FROM allv a
                   LEFT JOIN s0 ON s0.vec_id = a.vec_id
                   LEFT JOIN p1 ON p1.src = a.vec_id),
            v2 AS (SELECT k.src, l1.lab, count(*) AS c
                   FROM knn k JOIN l1 ON l1.vec_id = k.dst
                   WHERE l1.lab <> -1
                   GROUP BY k.src, l1.lab),
            p2 AS (SELECT src, lab FROM (
                       SELECT src, lab, row_number() OVER (
                           PARTITION BY src
                           ORDER BY c DESC, lab) AS rk FROM v2)
                   WHERE rk = 1)
            SELECT a.vec_id,
                   CAST(coalesce(s0.lab, p2.lab, -1) AS BIGINT)
                       AS label_pred
            FROM allv a
            LEFT JOIN s0 ON s0.vec_id = a.vec_id
            LEFT JOIN p2 ON p2.src = a.vec_id
            ORDER BY a.vec_id
        """,
        "q_user_dbscan": """
            WITH RECURSIVE pts AS MATERIALIZED (
                SELECT user_id, CAST(count(*) AS BIGINT) AS x,
                       CAST(sum(CAST(round(value * 100) AS BIGINT))
                            // 10000 AS BIGINT) AS y
                FROM events GROUP BY user_id),
            pairs AS MATERIALIZED (
                SELECT a.user_id AS ua, b.user_id AS ub
                FROM pts a JOIN pts b ON a.user_id < b.user_id
                  AND (a.x - b.x) * (a.x - b.x)
                      + (a.y - b.y) * (a.y - b.y) <= 4),
            cnt AS (SELECT u, count(*) + 1 AS n FROM (
                        SELECT ua AS u FROM pairs
                        UNION ALL SELECT ub FROM pairs) GROUP BY u),
            core AS MATERIALIZED (
                SELECT p.user_id FROM pts p
                LEFT JOIN cnt ON cnt.u = p.user_id
                WHERE coalesce(cnt.n, 1) >= 3),
            ce AS MATERIALIZED (
                SELECT ua, ub FROM pairs
                WHERE ua IN (SELECT user_id FROM core)
                  AND ub IN (SELECT user_id FROM core)),
            sym AS MATERIALIZED (
                SELECT ua AS u, ub AS v FROM ce
                UNION ALL SELECT ub, ua FROM ce),
            reach AS (
                SELECT user_id AS a, user_id AS b FROM core
                UNION
                SELECT reach.a, sym.v
                FROM reach JOIN sym ON sym.u = reach.b),
            comp AS MATERIALIZED (
                SELECT a AS user_id, min(b) AS comp
                FROM reach GROUP BY a),
            bj AS (
                SELECT x.u AS user_id, min(comp.comp) AS comp FROM (
                    SELECT ua AS u, ub AS c FROM pairs
                    WHERE ub IN (SELECT user_id FROM core)
                      AND ua NOT IN (SELECT user_id FROM core)
                    UNION ALL
                    SELECT ub, ua FROM pairs
                    WHERE ua IN (SELECT user_id FROM core)
                      AND ub NOT IN (SELECT user_id FROM core)) x
                JOIN comp ON comp.user_id = x.c GROUP BY x.u)
            SELECT p.user_id,
                   CASE WHEN comp.comp IS NOT NULL THEN 'core'
                        WHEN bj.comp IS NOT NULL THEN 'border'
                        ELSE 'noise' END AS role,
                   CAST(coalesce(comp.comp, bj.comp, -1) AS BIGINT)
                       AS cluster
            FROM pts p
            LEFT JOIN comp ON comp.user_id = p.user_id
            LEFT JOIN bj ON bj.user_id = p.user_id
            ORDER BY p.user_id
        """,
        "q_events_burst_dp": """
            WITH RECURSIVE top1 AS (
                SELECT event_type FROM events GROUP BY event_type
                ORDER BY count(*) DESC, event_type LIMIT 1),
            h AS (
                SELECT CAST(epoch_us(ts) AS BIGINT) // 3600000000
                           AS hr,
                       count(*) AS k
                FROM events
                WHERE event_type = (SELECT event_type FROM top1)
                GROUP BY hr),
            span AS (SELECT min(hr) AS h0, max(hr) AS h1 FROM h),
            grid AS (
                SELECT unnest(generate_series(h0, h1)) AS hr
                FROM span),
            g2 AS MATERIALIZED (
                SELECT grid.hr,
                       row_number() OVER (ORDER BY grid.hr) AS rk,
                       CAST(coalesce(h.k, 0) AS BIGINT) AS k
                FROM grid LEFT JOIN h USING (hr)),
            params AS (
                SELECT CAST(sum(k) AS DOUBLE) / count(*) AS r0,
                       2.0 * (CAST(sum(k) AS DOUBLE) / count(*))
                           AS r1,
                       ln(CAST(count(*) AS DOUBLE)) AS gam
                FROM g2),
            dp AS (
                SELECT rk, hr, k,
                       (SELECT r0 FROM params)
                           - k * ln((SELECT r0 FROM params)) AS c0,
                       (SELECT gam FROM params)
                           + ((SELECT r1 FROM params)
                              - k * ln((SELECT r1 FROM params))) AS c1
                FROM g2 WHERE rk = 1
                UNION ALL
                SELECT g2.rk, g2.hr, g2.k,
                       ((SELECT r0 FROM params)
                        - g2.k * ln((SELECT r0 FROM params)))
                           + least(dp.c0, dp.c1),
                       ((SELECT r1 FROM params)
                        - g2.k * ln((SELECT r1 FROM params)))
                           + least(dp.c1,
                                   dp.c0 + (SELECT gam FROM params))
                FROM dp JOIN g2 ON g2.rk = dp.rk + 1)
            SELECT hr AS hour, k, round(c0, 6) AS c0,
                   round(c1, 6) AS c1
            FROM dp ORDER BY hour
        """,
        "q_supplier_adamic": """
            WITH inc AS MATERIALIZED (
                SELECT DISTINCT l_suppkey AS s, l_partkey AS p
                FROM lineitem),
            deg AS (SELECT p, count(*) AS d FROM inc GROUP BY p),
            w AS (
                SELECT a.s AS a, b.s AS b,
                       count(*) AS shared,
                       sum(1.0 / ln(deg.d)) AS aa
                FROM inc a JOIN inc b ON a.p = b.p AND a.s < b.s
                     JOIN deg ON deg.p = a.p
                GROUP BY a.s, b.s)
            SELECT a, b, CAST(shared AS BIGINT) AS shared,
                   round(aa, 6) AS aa
            FROM w
            ORDER BY round(aa, 6) DESC, a, b LIMIT 50
        """,
        "q_part_diameter": """
            WITH RECURSIVE inc AS MATERIALIZED (
                SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                FROM lineitem),
            e AS MATERIALIZED (
                SELECT DISTINCT a.p AS pa, b.p AS pb
                FROM inc a JOIN inc b ON a.o = b.o AND a.p < b.p),
            sym AS MATERIALIZED (
                SELECT pa AS u, pb AS v FROM e
                UNION ALL SELECT pb, pa FROM e),
            seed AS (SELECT min(p) AS s FROM inc),
            b1 AS (
                SELECT (SELECT s FROM seed) AS node, 0 AS level
                UNION
                SELECT sym.v, b1.level + 1
                FROM b1 JOIN sym ON sym.u = b1.node
                WHERE b1.level < 16),
            l1 AS (SELECT node, min(level) AS lvl FROM b1
                   GROUP BY node),
            far AS (SELECT node, lvl FROM l1
                    ORDER BY lvl DESC, node LIMIT 1),
            b2 AS (
                SELECT (SELECT node FROM far) AS node, 0 AS level
                UNION
                SELECT sym.v, b2.level + 1
                FROM b2 JOIN sym ON sym.u = b2.node
                WHERE b2.level < 16),
            l2 AS (SELECT node, min(level) AS lvl FROM b2
                   GROUP BY node)
            SELECT CAST((SELECT s FROM seed) AS BIGINT) AS seed,
                   CAST((SELECT max(lvl) FROM l1) AS BIGINT)
                       AS ecc_seed,
                   CAST((SELECT node FROM far) AS BIGINT) AS far_node,
                   CAST((SELECT max(lvl) FROM l2) AS BIGINT)
                       AS diameter_lb,
                   CAST((SELECT count(*) FROM l2) AS BIGINT)
                       AS n_reached
        """,
        "q_fd_audit": """
            SELECT * FROM (
                SELECT 'customer' AS tbl, 'c_custkey' AS det,
                       'c_nationkey' AS dep,
                       CAST(count(*) AS BIGINT) AS n_keys,
                       CAST(count(*) FILTER (WHERE nd > 1) AS BIGINT)
                           AS n_violating,
                       CAST(CASE WHEN count(*) FILTER (WHERE nd > 1)
                                      = 0 THEN 1 ELSE 0 END AS BIGINT)
                           AS holds
                FROM (SELECT c_custkey,
                             count(DISTINCT c_nationkey) AS nd
                      FROM customer GROUP BY c_custkey)
                UNION ALL
                SELECT 'customer', 'c_nationkey', 'c_mktsegment',
                       CAST(count(*) AS BIGINT),
                       CAST(count(*) FILTER (WHERE nd > 1) AS BIGINT),
                       CAST(CASE WHEN count(*) FILTER (WHERE nd > 1)
                                      = 0 THEN 1 ELSE 0 END AS BIGINT)
                FROM (SELECT c_nationkey,
                             count(DISTINCT c_mktsegment) AS nd
                      FROM customer GROUP BY c_nationkey)
                UNION ALL
                SELECT 'orders', 'o_orderkey', 'o_custkey',
                       CAST(count(*) AS BIGINT),
                       CAST(count(*) FILTER (WHERE nd > 1) AS BIGINT),
                       CAST(CASE WHEN count(*) FILTER (WHERE nd > 1)
                                      = 0 THEN 1 ELSE 0 END AS BIGINT)
                FROM (SELECT o_orderkey,
                             count(DISTINCT o_custkey) AS nd
                      FROM orders GROUP BY o_orderkey)
                UNION ALL
                SELECT 'orders', 'o_custkey', 'o_orderpriority',
                       CAST(count(*) AS BIGINT),
                       CAST(count(*) FILTER (WHERE nd > 1) AS BIGINT),
                       CAST(CASE WHEN count(*) FILTER (WHERE nd > 1)
                                      = 0 THEN 1 ELSE 0 END AS BIGINT)
                FROM (SELECT o_custkey,
                             count(DISTINCT o_orderpriority) AS nd
                      FROM orders GROUP BY o_custkey)
                UNION ALL
                SELECT 'nation', 'n_nationkey', 'n_regionkey',
                       CAST(count(*) AS BIGINT),
                       CAST(count(*) FILTER (WHERE nd > 1) AS BIGINT),
                       CAST(CASE WHEN count(*) FILTER (WHERE nd > 1)
                                      = 0 THEN 1 ELSE 0 END AS BIGINT)
                FROM (SELECT n_nationkey,
                             count(DISTINCT n_regionkey) AS nd
                      FROM nation GROUP BY n_nationkey)
            ) ORDER BY tbl, det, dep
        """,
        "q_part_harmonic": """
            WITH RECURSIVE inc AS MATERIALIZED (
                SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                FROM lineitem),
            e AS MATERIALIZED (
                SELECT DISTINCT a.p AS pa, b.p AS pb
                FROM inc a JOIN inc b ON a.o = b.o AND a.p < b.p),
            sym AS MATERIALIZED (
                SELECT pa AS u, pb AS v FROM e
                UNION ALL SELECT pb, pa FROM e),
            srcs AS (SELECT DISTINCT p FROM inc ORDER BY p LIMIT 8),
            bfs AS (
                SELECT p AS src, p AS node, 0 AS level FROM srcs
                UNION
                SELECT bfs.src, sym.v, bfs.level + 1
                FROM bfs JOIN sym ON sym.u = bfs.node
                WHERE bfs.level < 8),
            lv AS (SELECT src, node, min(level) AS lvl
                   FROM bfs GROUP BY src, node)
            SELECT src,
                   CAST(count(*) FILTER (WHERE lvl > 0) AS BIGINT)
                       AS n_reached,
                   CAST(coalesce(sum(840 // lvl)
                                 FILTER (WHERE lvl > 0), 0) AS BIGINT)
                       AS h840,
                   round(CAST(coalesce(sum(840 // lvl)
                                       FILTER (WHERE lvl > 0), 0)
                              AS DOUBLE) / 840.0, 6) AS harmonic
            FROM lv GROUP BY src ORDER BY src
        """,
        "q_part_wl_colors": """
            WITH inc AS MATERIALIZED (
                SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                FROM lineitem),
            e AS MATERIALIZED (
                SELECT DISTINCT a.p AS pa, b.p AS pb
                FROM inc a JOIN inc b ON a.o = b.o AND a.p < b.p),
            sym AS MATERIALIZED (
                SELECT pa AS u, pb AS v FROM e
                UNION ALL SELECT pb, pa FROM e),
            c0 AS MATERIALIZED (
                SELECT u, CAST(count(*) AS VARCHAR) AS c
                FROM sym GROUP BY u),
            c1 AS MATERIALIZED (
                SELECT s.u, md5(max(cu.c) || '|' ||
                                string_agg(cv.c, ',' ORDER BY cv.c))
                           AS c
                FROM sym s JOIN c0 cu ON cu.u = s.u
                           JOIN c0 cv ON cv.u = s.v
                GROUP BY s.u),
            c2 AS (
                SELECT s.u, md5(max(cu.c) || '|' ||
                                string_agg(cv.c, ',' ORDER BY cv.c))
                           AS c
                FROM sym s JOIN c1 cu ON cu.u = s.u
                           JOIN c1 cv ON cv.u = s.v
                GROUP BY s.u)
            SELECT c AS color, CAST(count(*) AS BIGINT) AS n_nodes
            FROM c2 GROUP BY c ORDER BY color
        """,
        "doc_source_gini": f"""
            WITH d AS (SELECT source,
                              CAST({_N_TOKENS_SQL} AS DOUBLE) AS x
                       FROM documents),
            r AS (SELECT source, x,
                         row_number() OVER (PARTITION BY source
                                            ORDER BY x) AS i,
                         count(*) OVER (PARTITION BY source) AS n,
                         sum(x) OVER (PARTITION BY source) AS s
                  FROM d)
            SELECT source,
                   round(2.0 * sum(i * x) / (max(n) * max(s))
                         - (max(n) + 1.0) / max(n), 6) AS gini
            FROM r GROUP BY source ORDER BY source
        """,
        "kg_name_components": f"""
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
        "kg_pair_pmi": f"""
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
        "kg_distant_negatives": f"""
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
        "kg_entity_link": f"""
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
        "q5_regional_supplier_revenue": """
            SELECT n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)
                       AS revenue
            FROM customer, orders, lineitem, supplier, nation, region
            WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
              AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
              AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
              AND r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY n_name ORDER BY revenue DESC, n_name
        """,
        "q3_shipping_priority": """
            SELECT o_orderkey, revenue, o_orderdate FROM (
                SELECT l_orderkey AS o_orderkey, o_orderdate,
                       round(sum(l_extendedprice * (1 - l_discount)), 2)
                           AS revenue
                FROM customer
                JOIN orders ON o_custkey = c_custkey
                JOIN lineitem ON l_orderkey = o_orderkey
                WHERE c_mktsegment = 'BUILDING'
                  AND o_orderdate < DATE '1998-06-01'
                  AND l_shipdate > DATE '1998-06-01'
                GROUP BY l_orderkey, o_orderdate)
            ORDER BY revenue DESC, o_orderkey LIMIT 10
        """,
        "q8_market_share": """
            SELECT o_year, round(nation_volume / volume, 6) AS mkt_share
            FROM (
                SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                       sum(CASE WHEN n2.n_name = 'NATION_12'
                           THEN l_extendedprice * (1 - l_discount)
                           ELSE 0 END) AS nation_volume,
                       sum(l_extendedprice * (1 - l_discount)) AS volume
                FROM lineitem
                JOIN orders ON o_orderkey = l_orderkey
                JOIN customer ON c_custkey = o_custkey
                JOIN nation n1 ON n1.n_nationkey = c_nationkey
                JOIN region ON r_regionkey = n1.n_regionkey
                JOIN part ON p_partkey = l_partkey
                JOIN supplier ON s_suppkey = l_suppkey
                JOIN nation n2 ON n2.n_nationkey = s_nationkey
                WHERE r_name = 'ASIA' AND p_type = 'PROMO'
                GROUP BY 1)
            ORDER BY o_year
        """,
        "q9_product_profit": """
            SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)
                       AS sum_profit
            FROM lineitem
            JOIN part ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation ON n_nationkey = s_nationkey
            JOIN orders ON o_orderkey = l_orderkey
            WHERE p_name LIKE '%red%'
            GROUP BY n_name, 2
            ORDER BY n_name, o_year DESC
        """,
        "q17_small_quantity_revenue": """
            SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
            FROM lineitem
            JOIN part ON p_partkey = l_partkey
            WHERE p_brand = 'Brand#1'
              AND l_quantity < (
                  SELECT 0.2 * avg(l_quantity) FROM lineitem l2
                  WHERE l2.l_partkey = lineitem.l_partkey)
        """,
        "q19_disjunctive_revenue": """
            SELECT round(sum(l_extendedprice * (1 - l_discount)), 2)
                       AS revenue,
                   CAST(count(*) AS BIGINT) AS n_lines
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
                   AND l_quantity BETWEEN 1 AND 30)
               OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
                   AND l_quantity BETWEEN 5 AND 35)
               OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
                   AND l_quantity BETWEEN 10 AND 40)
        """,
        "q21_waiting_suppliers": """
            WITH per_os AS (
                SELECT l_orderkey, l_suppkey,
                       max(CASE WHEN l_shipdate >
                           o_orderdate + INTERVAL 60 DAY
                           THEN 1 ELSE 0 END) AS late
                FROM lineitem JOIN orders ON o_orderkey = l_orderkey
                WHERE o_orderstatus = 'F'
                GROUP BY l_orderkey, l_suppkey),
            per_o AS (
                SELECT l_orderkey, count(*) AS n_supp,
                       sum(late) AS n_late
                FROM per_os GROUP BY l_orderkey)
            SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
            FROM per_os
            JOIN per_o USING (l_orderkey)
            JOIN supplier ON s_suppkey = l_suppkey
            WHERE late = 1 AND n_supp > 1 AND n_late = 1
            GROUP BY s_name
            ORDER BY numwait DESC, s_name LIMIT 20
        """,
        "doc_feature_hash": """
            WITH w AS (
                SELECT doc_id,
                       CAST('0x' || substr(md5(unnest(
                           string_split(lower(text), ' '))), 1, 16)
                           AS UBIGINT) AS h
                FROM documents
            ),
            f AS (
                SELECT doc_id,
                       CAST(h % 32 AS BIGINT) AS bucket,
                       sum(CASE WHEN (h >> 8) % 2 = 1
                           THEN 1 ELSE -1 END) AS feat
                FROM w GROUP BY 1, 2
            )
            SELECT doc_id, bucket, CAST(feat AS BIGINT) AS feat
            FROM f WHERE feat <> 0
            ORDER BY doc_id, bucket
        """,
        "q_events_psi": """
            WITH pr AS MATERIALIZED (
                SELECT round(unnest(quantile_cont(value,
                    [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])), 4)
                    AS p
                FROM events WHERE event_id % 2 = 0),
            bkt AS MATERIALIZED (
                SELECT event_id % 2 AS half,
                       (SELECT count(*) FROM pr WHERE p < value)
                           AS bucket
                FROM events),
            c AS (SELECT half, bucket, count(*) AS n
                  FROM bkt GROUP BY 1, 2),
            grid AS (SELECT h.half, g.bucket
                     FROM (SELECT unnest([0, 1]) AS half) h,
                          (SELECT unnest(generate_series(0, 9))
                               AS bucket) g),
            f AS (SELECT grid.half, grid.bucket,
                         coalesce(n, 0) AS n
                  FROM grid LEFT JOIN c
                    ON c.half = grid.half AND c.bucket = grid.bucket),
            tot AS (SELECT half, sum(n) AS nt FROM f GROUP BY 1),
            sh AS (SELECT f.bucket,
                          max(CASE WHEN f.half = 0
                              THEN (n + 0.5) / (nt + 5.0) END) AS p,
                          max(CASE WHEN f.half = 1
                              THEN (n + 0.5) / (nt + 5.0) END) AS q
                   FROM f JOIN tot USING (half) GROUP BY 1)
            SELECT round(sum((p - q) * ln(p / q)), 6) AS psi,
                   (SELECT count(*) FROM events
                    WHERE event_id % 2 = 0) AS n_ref,
                   (SELECT count(*) FROM events
                    WHERE event_id % 2 = 1) AS n_cur
            FROM sh
        """,
        "q_events_debounce": """
            WITH RECURSIVE ord AS MATERIALIZED (
                SELECT event_id, user_id, event_type,
                       epoch_us(ts) AS t,
                       row_number() OVER (
                           PARTITION BY user_id, event_type
                           ORDER BY ts, event_id) AS rn
                FROM events),
            k AS (
                SELECT event_id, user_id, event_type, t, rn,
                       t AS last_t, TRUE AS kept
                FROM ord WHERE rn = 1
                UNION ALL
                SELECT o.event_id, o.user_id, o.event_type, o.t, o.rn,
                       CASE WHEN o.t - k.last_t > 300000000
                            THEN o.t ELSE k.last_t END,
                       o.t - k.last_t > 300000000
                FROM k JOIN ord o
                  ON o.user_id = k.user_id
                 AND o.event_type = k.event_type
                 AND o.rn = k.rn + 1)
            SELECT event_id FROM k WHERE kept ORDER BY event_id
        """,
        "q_events_cusum": """
            WITH c AS MATERIALIZED (
                SELECT event_id, ts, event_type,
                       CAST(round(value * 100, 0) AS BIGINT) AS cents
                FROM events),
            s AS (SELECT event_type, count(*) AS n, sum(cents) AS sc
                  FROM c GROUP BY 1),
            p AS (
                SELECT c.event_type, event_id, ts, n,
                       sum(n * cents) OVER w
                       - row_number() OVER w * sc AS cum
                FROM c JOIN s USING (event_type)
                WINDOW w AS (PARTITION BY c.event_type
                             ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING))
            SELECT event_type, at_event_id, peak_cusum FROM (
                SELECT event_type, event_id AS at_event_id,
                       round(cum / (n * 100.0), 6) AS peak_cusum,
                       row_number() OVER (PARTITION BY event_type
                           ORDER BY abs(cum) DESC, ts, event_id) AS rk
                FROM p)
            WHERE rk = 1 ORDER BY event_type
        """,
        "emb_triplets": """
            WITH pos AS MATERIALIZED (
                SELECT anchor, pos FROM (
                    SELECT a.vec_id AS anchor, p.vec_id AS pos,
                           row_number() OVER (
                               PARTITION BY a.vec_id
                               ORDER BY CAST('0x' || substr(md5(
                                   a.vec_id || ':' || p.vec_id), 1, 16)
                                   AS UBIGINT), p.vec_id) AS rk
                    FROM embeddings a JOIN embeddings p
                      ON p.label = a.label AND p.vec_id <> a.vec_id)
                WHERE rk = 1),
            neg AS MATERIALIZED (
                SELECT anchor, neg FROM (
                    SELECT q.vec_id AS anchor, e.vec_id AS neg,
                           row_number() OVER (
                               PARTITION BY q.vec_id
                               ORDER BY list_cosine_similarity(
                                   e.embedding, q.embedding) DESC,
                                        e.vec_id) AS rk
                    FROM embeddings q JOIN embeddings e
                      ON e.label <> q.label)
                WHERE rk = 1)
            SELECT anchor, pos, neg
            FROM pos JOIN neg USING (anchor)
            ORDER BY anchor
        """,
        "q_events_incremental_hourly": """
            SELECT event_type, date_trunc('hour', ts) AS hour,
                   count(*) AS n_events,
                   round(sum(value), 2) AS sum_value,
                   round(avg(value), 6) AS avg_value
            FROM events
            GROUP BY 1, 2
            ORDER BY event_type, hour
        """,
        "q_events_max_concurrency": """
            WITH ep AS (
                SELECT epoch_us(ts) AS t, 1 AS d FROM events
                UNION ALL
                SELECT epoch_us(ts)
                       + CAST(value * 60000000.0 AS BIGINT), -1
                FROM events),
            g AS (SELECT t, sum(d) AS nd FROM ep GROUP BY t),
            c AS (SELECT t,
                         sum(nd) OVER (ORDER BY t) AS cum FROM g)
            SELECT CAST(cum AS BIGINT) AS max_concurrency,
                   make_timestamp(t) AS at_ts
            FROM c ORDER BY cum DESC, t LIMIT 1
        """,
        "emb_hard_negatives": """
            SELECT src, dst FROM (
                SELECT q.vec_id AS src, e.vec_id AS dst,
                       row_number() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY list_cosine_similarity(
                               e.embedding, q.embedding) DESC,
                                    e.vec_id) AS rk
                FROM embeddings q JOIN embeddings e
                  ON e.label <> q.label
            ) WHERE rk <= 5 ORDER BY src, dst
        """,
        "emb_label_outliers": """
            WITH e AS (
                SELECT label, unnest(embedding) AS v,
                       generate_subscripts(embedding, 1) - 1 AS dim
                FROM embeddings),
            c AS MATERIALIZED (
                SELECT label, list(round(av, 6) ORDER BY dim)
                           AS centroid
                FROM (SELECT label, dim, avg(CAST(v AS DOUBLE)) AS av
                      FROM e GROUP BY 1, 2)
                GROUP BY label),
            d AS MATERIALIZED (
                SELECT vec_id, emb.label,
                       list_cosine_similarity(
                           CAST(embedding AS DOUBLE[]), centroid)
                           AS cos_sim,
                       count(*) OVER (PARTITION BY emb.label) AS n,
                       row_number() OVER (PARTITION BY emb.label
                           ORDER BY list_cosine_similarity(
                               CAST(embedding AS DOUBLE[]), centroid),
                                    vec_id) AS rk
                FROM embeddings emb JOIN c USING (label))
            SELECT CAST(label AS BIGINT) AS label, vec_id,
                   round(cos_sim, 6) AS cos_sim
            FROM d WHERE rk <= ceil(0.05 * n)
            ORDER BY label, vec_id
        """,
        "q_part_sssp_tiered": """
            WITH RECURSIVE pairs AS MATERIALIZED (
                SELECT a.l_partkey AS u, b.l_partkey AS v,
                       CASE WHEN count(DISTINCT a.l_orderkey) >= 2
                            THEN 1 ELSE 2 END AS w
                FROM lineitem a JOIN lineitem b
                  ON a.l_orderkey = b.l_orderkey
                WHERE a.l_partkey <> b.l_partkey
                GROUP BY 1, 2),
            sp(node, dist) AS (
                SELECT CAST(1 AS BIGINT), CAST(0 AS BIGINT)
                UNION
                SELECT p.v, sp.dist + p.w
                FROM sp JOIN pairs p ON p.u = sp.node
                WHERE sp.dist < 24)
            SELECT node, min(dist) AS dist
            FROM sp GROUP BY node ORDER BY node
        """,
        "q2_min_cost_supplier": """
            WITH ps AS MATERIALIZED (
                SELECT l_partkey, l_suppkey,
                       min(l_extendedprice / l_quantity) AS cost
                FROM lineitem
                WHERE l_suppkey IN (
                    SELECT s_suppkey FROM supplier
                    JOIN nation ON n_nationkey = s_nationkey
                    JOIN region ON r_regionkey = n_regionkey
                    WHERE r_name = 'EUROPE')
                GROUP BY 1, 2)
            SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
                   round(cost, 6) AS cost
            FROM ps
            JOIN part ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation ON n_nationkey = s_nationkey
            WHERE p_size <= 5 AND p_type = 'LARGE'
              AND cost = (SELECT min(cost) FROM ps p2
                          WHERE p2.l_partkey = ps.l_partkey)
            ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
            LIMIT 100
        """,
        "q11_important_parts": """
            WITH nv AS MATERIALIZED (
                SELECT l_partkey,
                       sum(l_extendedprice * (1 - l_discount)) AS value
                FROM lineitem
                JOIN supplier ON s_suppkey = l_suppkey
                JOIN nation ON n_nationkey = s_nationkey
                WHERE n_name = 'NATION_12'
                GROUP BY 1)
            SELECT l_partkey, round(value, 2) AS value
            FROM nv
            WHERE value > 2.0 * (SELECT avg(value) FROM nv)
            ORDER BY value DESC, l_partkey
        """,
        "q12_priority_lines": """
            SELECT l_returnflag,
                   sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                       THEN 1 ELSE 0 END) AS high_line_count,
                   sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                       THEN 0 ELSE 1 END) AS low_line_count
            FROM lineitem JOIN orders ON o_orderkey = l_orderkey
            WHERE l_shipdate >= DATE '1997-01-01'
              AND l_shipdate < DATE '1998-01-01'
            GROUP BY l_returnflag
            ORDER BY l_returnflag
        """,
        "q16_part_supplier_counts": """
            SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
                   CAST(count(DISTINCT l_suppkey) AS BIGINT)
                       AS supplier_cnt
            FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
            JOIN part ON p_partkey = l_partkey
            WHERE p_brand <> 'Brand#1'
              AND p_size IN (1, 4, 9, 16, 25, 36, 49)
              AND l_suppkey NOT IN (
                  SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
            GROUP BY 1, 2, 3
            ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        """,
        "q20_dominant_suppliers": """
            WITH pq AS MATERIALIZED (
                SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
                FROM lineitem
                WHERE l_partkey IN (
                    SELECT p_partkey FROM part
                    WHERE p_name LIKE 'small%')
                  AND l_shipdate >= DATE '1997-01-01'
                  AND l_shipdate < DATE '1998-01-01'
                GROUP BY 1, 2),
            pt AS (SELECT l_partkey, sum(qty) AS total
                   FROM pq GROUP BY 1)
            SELECT s_name, s_acctbal
            FROM supplier
            WHERE s_suppkey IN (
                SELECT l_suppkey FROM pq JOIN pt USING (l_partkey)
                WHERE qty > 0.3 * total)
            ORDER BY s_name
        """,
        "q_events_ewma": """
            WITH RECURSIVE ord AS MATERIALIZED (
                SELECT user_id, event_id, CAST(value AS DOUBLE) AS value,
                       row_number() OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS rn
                FROM events),
            e AS (
                SELECT user_id, event_id, rn, value AS ewma
                FROM ord WHERE rn = 1
                UNION ALL
                SELECT o.user_id, o.event_id, o.rn,
                       0.1 * o.value + 0.9 * e.ewma
                FROM e JOIN ord o
                ON o.user_id = e.user_id AND o.rn = e.rn + 1)
            SELECT event_id, round(ewma, 6) AS ewma FROM e
            ORDER BY event_id
        """,
        "q_events_welch_ttest": """
            WITH st AS (
                SELECT event_type, count(*) AS n,
                       sum(CAST(value AS DOUBLE)) AS s,
                       sum(CAST(value AS DOUBLE) * value) AS ss
                FROM events GROUP BY event_type),
            tot AS (
                SELECT sum(n) AS n, sum(s) AS s, sum(ss) AS ss FROM st)
            SELECT event_type, CAST(st.n AS BIGINT) AS n,
                   round((st.s / st.n - (tot.s - st.s) / (tot.n - st.n))
                         / sqrt(((st.ss - st.s * st.s / st.n)
                                 / (st.n - 1)) / st.n
                                + (((tot.ss - st.ss)
                                    - (tot.s - st.s) * (tot.s - st.s)
                                      / (tot.n - st.n))
                                   / (tot.n - st.n - 1))
                                  / (tot.n - st.n)), 6) AS t_stat
            FROM st, tot ORDER BY event_type
        """,
        "doc_shuffle_order": """
            SELECT doc_id,
                   row_number() OVER (
                       ORDER BY CAST(CAST('0x' || substr(
                           md5(doc_id || ':42'), 1, 16) AS UBIGINT)
                           AS DOUBLE), doc_id) - 1 AS pos
            FROM documents ORDER BY doc_id
        """,
        "emb_knn_graph": """
            SELECT src, dst FROM (
                SELECT q.vec_id AS src, e.vec_id AS dst,
                       row_number() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY list_cosine_similarity(
                               e.embedding, q.embedding) DESC,
                                    e.vec_id) AS rk
                FROM embeddings q CROSS JOIN embeddings e
                WHERE e.vec_id <> q.vec_id
            ) WHERE rk <= 5 ORDER BY src, dst
        """,
        "q18_large_volume_orders": """
            WITH s AS (
                SELECT l_orderkey, sum(l_quantity) AS sum_qty
                FROM lineitem GROUP BY l_orderkey
                HAVING sum(l_quantity) > 250)
            SELECT c_name, o_orderkey,
                   round(o_totalprice, 2) AS o_totalprice,
                   round(sum_qty, 2) AS sum_qty
            FROM s JOIN orders ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            ORDER BY o_totalprice DESC, o_orderkey
        """,
        "q_revenue_rollup": """
            SELECT coalesce(r_name, 'ALL') AS r_name,
                   coalesce(n_name, 'ALL') AS n_name,
                   round(sum(o_totalprice), 2) AS revenue
            FROM orders
            JOIN customer ON c_custkey = o_custkey
            JOIN nation ON n_nationkey = c_nationkey
            JOIN region ON r_regionkey = n_regionkey
            GROUP BY ROLLUP (r_name, n_name)
            ORDER BY r_name, n_name
        """,
        "q_user_presence": """
            WITH eu AS (SELECT DISTINCT user_id FROM events),
                 ou AS (SELECT DISTINCT o_custkey AS user_id FROM orders)
            SELECT user_id, 'both' AS tag
            FROM (SELECT user_id FROM eu INTERSECT SELECT user_id FROM ou)
            UNION ALL
            SELECT user_id, 'events_only'
            FROM (SELECT user_id FROM eu EXCEPT SELECT user_id FROM ou)
            UNION ALL
            SELECT user_id, 'orders_only'
            FROM (SELECT user_id FROM ou EXCEPT SELECT user_id FROM eu)
            ORDER BY user_id, tag
        """,
        "q_lineitem_corr": """
            SELECT count(*) AS n,
                   round(corr(l_quantity, l_extendedprice), 6)
                       AS corr_qty_price
            FROM lineitem
        """,
        "q_events_funnel": """
            WITH v AS (
                SELECT user_id, min(ts) AS t0 FROM events
                WHERE event_type = 'view' GROUP BY user_id),
            c AS (
                SELECT v.user_id, min(e.ts) AS t1
                FROM events e JOIN v ON v.user_id = e.user_id
                WHERE e.event_type = 'click' AND e.ts > v.t0
                  AND e.ts <= v.t0 + INTERVAL 24 HOUR
                GROUP BY v.user_id),
            p AS (
                SELECT c.user_id
                FROM events e JOIN c ON c.user_id = e.user_id
                WHERE e.event_type = 'purchase' AND e.ts > c.t1
                  AND e.ts <= c.t1 + INTERVAL 24 HOUR
                GROUP BY c.user_id)
            SELECT '1_view' AS stage,
                   (SELECT count(*) FROM v) AS n_users
            UNION ALL SELECT '2_click_24h', (SELECT count(*) FROM c)
            UNION ALL SELECT '3_purchase_24h', (SELECT count(*) FROM p)
            ORDER BY stage
        """,
        "q_orders_cohort_retention": """
            WITH f AS (
                SELECT o_custkey,
                       min(year(o_orderdate)) AS cohort
                FROM orders GROUP BY o_custkey)
            SELECT f.cohort, year(o.o_orderdate) AS active_year,
                   count(DISTINCT o.o_custkey) AS n_customers
            FROM orders o JOIN f ON f.o_custkey = o.o_custkey
            GROUP BY f.cohort, active_year
            ORDER BY cohort, active_year
        """,
        "q_events_outliers": """
            WITH s AS (
                SELECT event_type, avg(value) AS mu,
                       stddev_samp(value) AS sd
                FROM events GROUP BY event_type)
            SELECT e.event_id, e.event_type
            FROM events e JOIN s ON s.event_type = e.event_type
            WHERE abs(e.value - s.mu) > 3 * s.sd
            ORDER BY e.event_id
        """,
        "doc_word_entropy": """
            WITH words AS (
                SELECT doc_id, unnest(list_filter(
                    regexp_split_to_array(lower(text), '\\s+'),
                    x -> x <> '')) AS w
                FROM documents),
            c AS (SELECT doc_id, w, count(*) AS n
                  FROM words GROUP BY doc_id, w),
            tot AS (SELECT doc_id, sum(n) AS t FROM c GROUP BY doc_id),
            h AS (SELECT c.doc_id,
                         round(-sum((n / t) * ln(n / t)), 6) AS entropy
                  FROM c JOIN tot ON tot.doc_id = c.doc_id
                  GROUP BY c.doc_id)
            SELECT d.doc_id, coalesce(h.entropy, 0.0) AS entropy
            FROM documents d LEFT JOIN h ON h.doc_id = d.doc_id
            ORDER BY d.doc_id
        """,
        "q_events_checksum": """
            SELECT CAST(sum(CAST(
                       CAST('0x' || substr(md5(
                           CAST(event_id AS VARCHAR) || '|' ||
                           CAST(user_id AS VARCHAR) || '|' ||
                           event_type), 1, 16) AS UBIGINT)
                       % 9223372036854775808 AS HUGEINT))
                   % 9223372036854775808 AS BIGINT) AS checksum,
                   count(*) AS n_rows
            FROM events
        """,
        "q_events_type_share": """
            SELECT event_type,
                   round(sum(value), 2) AS sum_value,
                   round(sum(value) / sum(sum(value)) OVER (), 6)
                       AS share
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "q_events_running_total": """
            SELECT event_id, user_id,
                   round(sum(value) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id), 2) AS running_value
            FROM events ORDER BY event_id
        """,
        "q_events_mode_by_user": """
            WITH c AS (
                SELECT user_id, event_type, count(*) AS n
                FROM events GROUP BY user_id, event_type),
            r AS (
                SELECT user_id, event_type AS mode_value,
                       CAST(n AS BIGINT) AS mode_count,
                       ROW_NUMBER() OVER (PARTITION BY user_id
                           ORDER BY n DESC, event_type) AS rk
                FROM c)
            SELECT user_id, mode_value, mode_count
            FROM r WHERE rk = 1 ORDER BY user_id
        """,
        "q_events_cms_counts": """
            WITH rows_ AS (SELECT unnest(range(4)) AS j),
            b AS (
                SELECT j, CAST(CAST('0x' || substr(md5(
                           CAST(j AS VARCHAR) || '|' || event_type),
                           1, 16) AS UBIGINT) % 1024 AS BIGINT) AS bucket
                FROM events, rows_),
            counters AS (
                SELECT j, bucket, count(*) AS c
                FROM b GROUP BY j, bucket),
            types AS (SELECT DISTINCT event_type FROM events),
            tb AS (
                SELECT t.event_type, r.j,
                       CAST(CAST('0x' || substr(md5(
                           CAST(r.j AS VARCHAR) || '|' || t.event_type),
                           1, 16) AS UBIGINT) % 1024 AS BIGINT) AS bucket
                FROM types t, rows_ r)
            SELECT tb.event_type, CAST(min(c.c) AS BIGINT) AS cms_count
            FROM tb JOIN counters c ON c.j = tb.j AND c.bucket = tb.bucket
            GROUP BY tb.event_type ORDER BY event_type
        """,
        "q_events_stream_late": """
            WITH a AS (
                SELECT event_id, ts, event_id % 8 AS shard,
                       ts + to_seconds(CAST(
                           CAST('0x' || substr(md5(CAST(event_id AS
                               VARCHAR)), 1, 16) AS UBIGINT) % 3600
                           AS BIGINT)) AS arrival_ts
                FROM events),
            t AS (
                SELECT *, max(ts) OVER (PARTITION BY shard
                           ORDER BY arrival_ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) AS wm
                FROM a)
            SELECT event_id, shard, ts
            FROM t WHERE ts < wm - INTERVAL 30 MINUTE
            ORDER BY event_id
        """,
        "q_events_stream_windows": """
            WITH a AS (
                SELECT event_id, ts, value, event_id % 8 AS shard,
                       ts + to_seconds(CAST(
                           CAST('0x' || substr(md5(CAST(event_id AS
                               VARCHAR)), 1, 16) AS UBIGINT) % 3600
                           AS BIGINT)) AS arrival_ts
                FROM events),
            t AS (
                SELECT *, max(ts) OVER (PARTITION BY shard
                           ORDER BY arrival_ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) AS wm
                FROM a)
            SELECT date_trunc('hour', ts) AS window_start,
                   count(*) AS n_events,
                   round(sum(value), 2) AS sum_value
            FROM t
            WHERE wm IS NULL OR ts >= wm - INTERVAL 30 MINUTE
            GROUP BY 1 ORDER BY 1
        """,
        "q_orders_next_event": """
            SELECT o_orderkey,
                   (SELECT min(e.ts) FROM events e
                    WHERE e.user_id = o.o_custkey
                      AND e.ts >= o.o_orderdate) AS next_event_ts
            FROM orders o ORDER BY o_orderkey
        """,
        "q_events_value_mad": """
            SELECT round(quantile_cont(value, 0.5), 6) AS med,
                   round(quantile_cont(abs(value -
                       (SELECT quantile_cont(value, 0.5) FROM events)),
                       0.5), 6) AS mad
            FROM events
        """,
        "q_events_distinct_users_by_type": """
            SELECT event_type,
                   count(DISTINCT user_id) AS n_users
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "q_part_kcore": _kcore_oracle_sql(k=80, rounds=8),
        "q_part_triangles": """
            WITH e AS (
                SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
                FROM lineitem a JOIN lineitem b
                  ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey
            ),
            tri AS (
                SELECT e1.a AS x, e1.b AS y, e2.b AS z
                FROM e e1
                JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
                JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b
            ),
            corners AS (
                SELECT x AS node FROM tri
                UNION ALL SELECT y FROM tri
                UNION ALL SELECT z FROM tri
            )
            SELECT node, count(*) AS n_triangles
            FROM corners GROUP BY node ORDER BY node
        """,
        "q_part_clustering": """
            WITH e AS (
                SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
                FROM lineitem a JOIN lineitem b
                  ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey),
            deg AS (
                SELECT node, count(*) AS degree
                FROM (SELECT a AS node FROM e
                      UNION ALL SELECT b FROM e)
                GROUP BY node),
            tri AS (
                SELECT e1.a AS x, e1.b AS y, e2.b AS z
                FROM e e1
                JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
                JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b),
            corners AS (
                SELECT x AS node FROM tri
                UNION ALL SELECT y FROM tri
                UNION ALL SELECT z FROM tri),
            t AS (SELECT node, count(*) AS n_triangles
                  FROM corners GROUP BY node)
            SELECT d.node, CAST(d.degree AS BIGINT) AS degree,
                   CAST(COALESCE(t.n_triangles, 0) AS BIGINT)
                       AS n_triangles,
                   round(2.0 * COALESCE(t.n_triangles, 0)
                         / (d.degree * (d.degree - 1.0)), 6) AS cc
            FROM deg d LEFT JOIN t USING (node)
            WHERE d.degree >= 2
            ORDER BY d.node
        """,
        "q_events_hourly_autocorr": """
            WITH h AS (SELECT date_trunc('hour', ts) AS hr,
                              count(*) AS n
                       FROM events GROUP BY 1),
            x AS (SELECT CAST(n AS DOUBLE) AS n,
                         lag(CAST(n AS DOUBLE)) OVER (ORDER BY hr)
                             AS prev
                  FROM h)
            SELECT CAST(count(*) AS BIGINT) AS n_pairs,
                   round(corr(n, prev), 6) AS autocorr_lag1
            FROM x WHERE prev IS NOT NULL
        """,
        "doc_source_vocab_jaccard": """
            WITH ws AS (
                SELECT DISTINCT source,
                       unnest(list_filter(
                           regexp_split_to_array(lower(text), '\\s+'),
                           x -> x <> '')) AS w
                FROM documents),
            cnt AS (SELECT source, count(*) AS c
                    FROM ws GROUP BY source),
            inter AS (
                SELECT a.source AS source_a, b.source AS source_b,
                       count(*) AS i
                FROM ws a JOIN ws b
                  ON a.w = b.w AND a.source < b.source
                GROUP BY 1, 2)
            SELECT source_a, source_b, CAST(i AS BIGINT) AS shared,
                   round(CAST(i AS DOUBLE) / (ca.c + cb.c - i), 6)
                       AS jaccard
            FROM inter
            JOIN cnt ca ON ca.source = source_a
            JOIN cnt cb ON cb.source = source_b
            ORDER BY source_a, source_b
        """,
        "q_user_streaks": """
            WITH d AS (SELECT DISTINCT user_id,
                              CAST(ts AS DATE) AS day FROM events),
            r AS (SELECT user_id, day,
                         row_number() OVER (PARTITION BY user_id
                                            ORDER BY day) AS rn
                  FROM d),
            g AS (SELECT user_id,
                         day - CAST(rn AS INTEGER) AS grp,
                         count(*) AS len
                  FROM r GROUP BY user_id, day - CAST(rn AS INTEGER))
            SELECT user_id, CAST(max(len) AS BIGINT) AS max_streak,
                   CAST(sum(len) AS BIGINT) AS n_active_days
            FROM g GROUP BY user_id ORDER BY user_id
        """,
        "q_events_rolling_dau7": """
            WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day,
                               user_id FROM events),
            days AS (SELECT DISTINCT day FROM du)
            SELECT CAST(d.day AS VARCHAR) AS day,
                   CAST(count(DISTINCT u.user_id) AS BIGINT) AS dau7
            FROM days d JOIN du u
              ON u.day BETWEEN d.day - 6 AND d.day
            GROUP BY d.day ORDER BY day
        """,
        "q_user_entry_exit": """
            WITH r AS (
                SELECT user_id, event_type, value,
                       row_number() OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS rn_f,
                       row_number() OVER (PARTITION BY user_id
                           ORDER BY ts DESC, event_id DESC) AS rn_l
                FROM events)
            SELECT f.user_id,
                   f.event_type AS first_type, f.value AS first_value,
                   l.event_type AS last_type, l.value AS last_value
            FROM r f JOIN r l ON f.user_id = l.user_id
            WHERE f.rn_f = 1 AND l.rn_l = 1
            ORDER BY f.user_id
        """,
        "q_events_type_lift": """
            WITH b AS (SELECT DISTINCT user_id,
                              epoch_us(ts) // 86400000000 AS day,
                              event_type AS t
                       FROM events),
            nb AS (SELECT count(*) AS n
                   FROM (SELECT DISTINCT user_id, day FROM b)),
            tc AS (SELECT t, count(*) AS c FROM b GROUP BY t),
            ab AS (SELECT a.t AS ta, b2.t AS tb, count(*) AS n_ab
                   FROM b a JOIN b b2
                     ON a.user_id = b2.user_id AND a.day = b2.day
                        AND a.t < b2.t
                   GROUP BY 1, 2)
            SELECT ta, tb, CAST(n_ab AS BIGINT) AS n_ab,
                   round(CAST(n_ab AS DOUBLE) * (SELECT n FROM nb)
                         / (CAST(ca.c AS DOUBLE) * CAST(cb.c AS DOUBLE)),
                         6) AS lift
            FROM ab JOIN tc ca ON ca.t = ta JOIN tc cb ON cb.t = tb
            ORDER BY ta, tb
        """,
        "q_part_abc": """
            WITH pr AS (
                SELECT l_partkey,
                       CAST(sum(CAST(round(l_extendedprice * 100)
                                     AS BIGINT)) AS BIGINT) AS cents
                FROM lineitem GROUP BY l_partkey),
            c AS (SELECT l_partkey, cents,
                         sum(cents) OVER (
                             ORDER BY cents DESC, l_partkey ASC
                             ROWS UNBOUNDED PRECEDING) AS cum_cents,
                         sum(cents) OVER () AS tot
                  FROM pr)
            SELECT l_partkey, cents,
                   CAST(cum_cents AS BIGINT) AS cum_cents,
                   CASE WHEN cum_cents * 10 <= tot * 8 THEN 'A'
                        WHEN cum_cents * 20 <= tot * 19 THEN 'B'
                        ELSE 'C' END AS abc_class
            FROM c ORDER BY l_partkey
        """,
        "q_referential_integrity": """
            SELECT * FROM (
                SELECT 'event_user_orphans' AS check_name,
                       CAST(count(*) AS BIGINT) AS n
                FROM events e
                WHERE NOT EXISTS (SELECT 1 FROM customer c
                                  WHERE c.c_custkey = e.user_id)
                UNION ALL
                SELECT 'lineitem_orphans',
                       CAST(count(*) AS BIGINT)
                FROM lineitem l
                WHERE NOT EXISTS (SELECT 1 FROM orders o
                                  WHERE o.o_orderkey = l.l_orderkey)
                UNION ALL
                SELECT 'orders_childless',
                       CAST(count(*) AS BIGINT)
                FROM orders o
                WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                                  WHERE l.l_orderkey = o.o_orderkey))
            ORDER BY check_name
        """,
        "q_events_top_trigrams": """
            WITH s AS (
                SELECT user_id, event_type AS t1,
                       lead(event_type, 1) OVER w AS t2,
                       lead(event_type, 2) OVER w AS t3
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
            SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n
            FROM s WHERE t3 IS NOT NULL
            GROUP BY t1, t2, t3
            ORDER BY n DESC, t1, t2, t3
            LIMIT 20
        """,
        "q_events_rolling_median": """
            SELECT event_id,
                   round(median(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6)
                       AS med5
            FROM events ORDER BY event_id
        """,
        "q_events_since_anchor": """
            WITH x AS (
                SELECT event_id, user_id, ts,
                       max(CASE WHEN event_type = 'purchase'
                                THEN ts END) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS anchor
                FROM events)
            SELECT event_id, user_id,
                   date_diff('microsecond', anchor, ts) AS since_us
            FROM x WHERE anchor IS NOT NULL
            ORDER BY event_id
        """,
        "q_revenue_cube": """
            SELECT COALESCE(r_name, 'ALL') AS r_name,
                   COALESCE(n_name, 'ALL') AS n_name,
                   round(sum(o_totalprice), 2) AS revenue
            FROM orders o
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n ON n.n_nationkey = c.c_nationkey
            JOIN region r ON r.r_regionkey = n.n_regionkey
            GROUP BY CUBE (r_name, n_name)
            ORDER BY r_name, n_name
        """,
        "q_events_chi2": """
            WITH o AS (SELECT event_type,
                              CAST(extract(hour FROM ts) AS BIGINT) AS hr,
                              count(*) AS obs
                       FROM events GROUP BY 1, 2),
            rt AS (SELECT event_type, CAST(sum(obs) AS DOUBLE) AS r
                   FROM o GROUP BY 1),
            ct AS (SELECT hr, CAST(sum(obs) AS DOUBLE) AS c
                   FROM o GROUP BY 1),
            n AS (SELECT CAST(sum(obs) AS DOUBLE) AS n FROM o)
            SELECT o.event_type, o.hr, CAST(o.obs AS BIGINT) AS obs,
                   round(rt.r * ct.c / n.n, 6) AS expected,
                   round((o.obs - rt.r * ct.c / n.n)
                         * (o.obs - rt.r * ct.c / n.n)
                         / (rt.r * ct.c / n.n), 6) AS contrib
            FROM o JOIN rt USING (event_type) JOIN ct USING (hr), n
            ORDER BY o.event_type, o.hr
        """,
        "q_user_event_paths": """
            SELECT user_id,
                   string_agg(event_type, '>' ORDER BY ts, event_id)
                       AS path
            FROM events GROUP BY user_id ORDER BY user_id
        """,
        "q_user_coverage": """
            WITH iv AS (SELECT user_id, ts AS s,
                               ts + INTERVAL 300 SECOND AS e
                        FROM events),
            x AS (SELECT user_id, s, e,
                         max(e) OVER (PARTITION BY user_id ORDER BY s, e
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING) AS pmax
                  FROM iv),
            y AS (SELECT *, CASE WHEN pmax IS NULL OR s > pmax
                                 THEN 1 ELSE 0 END AS opens
                  FROM x),
            z AS (SELECT *, sum(opens) OVER (PARTITION BY user_id
                                             ORDER BY s, e
                                             ROWS UNBOUNDED PRECEDING)
                            AS isl
                  FROM y),
            i AS (SELECT user_id, isl,
                         date_diff('microsecond', min(s), max(e))
                             // 1000000 AS cov
                  FROM z GROUP BY user_id, isl)
            SELECT user_id, CAST(count(*) AS BIGINT) AS n_islands,
                   CAST(sum(cov) AS BIGINT) AS covered_sec
            FROM i GROUP BY user_id ORDER BY user_id
        """,
        "q_events_trimmed_mean": """
            WITH b AS (SELECT event_type,
                              quantile_cont(value, 0.1) AS lo,
                              quantile_cont(value, 0.9) AS hi
                       FROM events GROUP BY event_type)
            SELECT e.event_type, CAST(count(*) AS BIGINT) AS n,
                   round(avg(e.value), 6) AS trimmed_mean
            FROM events e JOIN b USING (event_type)
            WHERE e.value >= b.lo AND e.value <= b.hi
            GROUP BY e.event_type ORDER BY e.event_type
        """,
        "q_user_twap": """
            WITH x AS (SELECT user_id, value,
                              CAST(date_diff('microsecond', ts,
                                   lead(ts) OVER (PARTITION BY user_id
                                                  ORDER BY ts, event_id))
                                   AS DOUBLE) AS dt
                       FROM events)
            SELECT user_id,
                   round(sum(value * dt) / sum(dt), 6) AS twap
            FROM x WHERE dt IS NOT NULL
            GROUP BY user_id HAVING sum(dt) > 0
            ORDER BY user_id
        """,
        "q_part_skyline": """
            SELECT p_partkey, p_retailprice,
                   CAST(p_size AS BIGINT) AS p_size
            FROM part p
            WHERE NOT EXISTS (
                SELECT 1 FROM part q
                WHERE q.p_retailprice <= p.p_retailprice
                  AND q.p_size >= p.p_size
                  AND (q.p_retailprice < p.p_retailprice
                       OR q.p_size > p.p_size))
            ORDER BY p_partkey
        """,
        "q_part_bfs": """
            WITH RECURSIVE pairs AS MATERIALIZED (
                SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
                FROM lineitem a JOIN lineitem b
                  ON a.l_orderkey = b.l_orderkey
                WHERE a.l_partkey <> b.l_partkey),
            bfs(node, lvl) AS (
                SELECT CAST(1 AS BIGINT), CAST(0 AS BIGINT)
                UNION
                SELECT p.v, bfs.lvl + 1
                FROM bfs JOIN pairs p ON p.u = bfs.node
                WHERE bfs.lvl < 12)
            SELECT node, min(lvl) AS level
            FROM bfs GROUP BY node ORDER BY node
        """,
        "q_events_percent_rank": """
            SELECT event_id, event_type,
                   percent_rank() OVER (PARTITION BY event_type
                                        ORDER BY value) AS pr
            FROM events ORDER BY event_id
        """,
        "q_events_state_intervals": """
            WITH x AS (
                SELECT user_id, event_type, ts, event_id,
                       CASE WHEN lag(event_type) OVER (
                                PARTITION BY user_id
                                ORDER BY ts, event_id)
                            IS DISTINCT FROM event_type
                            THEN 1 ELSE 0 END AS chg
                FROM events),
            y AS (
                SELECT *, sum(chg) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING)
                          AS run
                FROM x)
            SELECT user_id, run, event_type,
                   min(ts) AS first_ts, max(ts) AS last_ts,
                   count(*) AS n_events
            FROM y GROUP BY user_id, run, event_type
            ORDER BY user_id, run
        """,
        "doc_phrase_search": """
            WITH d AS (
                SELECT doc_id, list_filter(
                    regexp_split_to_array(lower(text), '\\s+'),
                    x -> x <> '') AS ws
                FROM documents),
            p AS (SELECT doc_id, unnest(ws) AS word,
                         generate_subscripts(ws, 1) AS pos
                  FROM d),
            a AS (SELECT doc_id, pos FROM p WHERE word = 'key'),
            b AS (SELECT doc_id, pos FROM p WHERE word = 'order')
            SELECT a.doc_id, count(*) AS n_matches
            FROM a JOIN b ON b.doc_id = a.doc_id
                         AND b.pos = a.pos + 1
            GROUP BY a.doc_id ORDER BY a.doc_id
        """,
        "doc_source_kl": """
            WITH w AS (
                SELECT source, unnest(list_filter(
                    regexp_split_to_array(lower(text), '\\s+'),
                    x -> x <> '')) AS word
                FROM documents),
            cw AS (SELECT word, count(*) AS cq FROM w GROUP BY 1),
            tot AS (SELECT (SELECT count(*) FROM w) AS n,
                           (SELECT count(*) FROM cw) AS v),
            sw AS (SELECT source, word, count(*) AS cp FROM w
                   GROUP BY 1, 2),
            st AS (SELECT source, count(*) AS ns FROM w GROUP BY 1),
            grid AS (
                SELECT st.source, cw.cq, coalesce(sw.cp, 0) AS cp,
                       st.ns
                FROM st CROSS JOIN cw
                LEFT JOIN sw ON sw.source = st.source
                            AND sw.word = cw.word),
            terms AS (
                SELECT source,
                       ((cp + 0.5) / (ns + 0.5 * t.v))
                       * log2(((cp + 0.5) / (ns + 0.5 * t.v))
                              / ((cq + 0.5) / (t.n + 0.5 * t.v)))
                           AS term
                FROM grid CROSS JOIN tot t)
            SELECT source, round(sum(term), 6) AS kl_bits
            FROM terms GROUP BY source ORDER BY source
        """,
        "q_orders_benford_shares": """
            WITH d AS (
                SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100)
                           AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT)
                           AS digit
                FROM orders
                WHERE isfinite(o_totalprice) AND o_totalprice > 0),
            c AS (SELECT digit, count(*) AS n FROM d GROUP BY digit),
            t AS (SELECT sum(n) AS total FROM c)
            SELECT digit, CAST(n AS BIGINT) AS n,
                   round(n * 1.0 / t.total, 6) AS share,
                   round(log10(1.0 + 1.0 / digit), 6) AS benford_p
            FROM c CROSS JOIN t ORDER BY digit
        """,
        "q_orders_profile": """
            WITH v AS (
                SELECT 'o_custkey' AS "column",
                       CAST(o_custkey AS VARCHAR) AS val FROM orders
                UNION ALL
                SELECT 'o_orderstatus', o_orderstatus FROM orders
                UNION ALL
                SELECT 'o_orderpriority', o_orderpriority FROM orders)
            SELECT "column", count(*) AS n,
                   count(DISTINCT val) AS n_distinct,
                   min(val) AS min_val, max(val) AS max_val
            FROM v GROUP BY "column" ORDER BY "column"
        """,
        "doc_hybrid_rrf": """
            WITH w AS (
                SELECT doc_id, unnest(list_filter(
                    regexp_split_to_array(lower(text), '\\s+'),
                    x -> x <> '')) AS term
                FROM documents),
            dl AS (SELECT doc_id, count(*) AS len FROM w GROUP BY 1),
            nd AS (SELECT (SELECT count(*) FROM documents) AS n,
                          (SELECT count(*) FROM w) AS total),
            q(term) AS (VALUES ('spark'), ('join'), ('fast')),
            df AS (SELECT term, count(DISTINCT doc_id) AS dfc FROM w
                   WHERE term IN (SELECT term FROM q) GROUP BY 1),
            tf AS (SELECT doc_id, term, count(*) AS tfc FROM w
                   WHERE term IN (SELECT term FROM q) GROUP BY 1, 2),
            s_lex AS (
                SELECT tf.doc_id,
                       round(sum(
                           ln(1.0 + (nd.n - COALESCE(df.dfc, 0) + 0.5)
                                    / (COALESCE(df.dfc, 0) + 0.5))
                           * (tf.tfc * (1.2 + 1.0))
                           / (tf.tfc + 1.2 * (1.0 - 0.75
                              + 0.75 * (dl.len
                                 / (CAST(nd.total AS DOUBLE) / nd.n))))
                       ), 6) AS s
                FROM q JOIN tf USING (term)
                     JOIN dl ON tf.doc_id = dl.doc_id
                     LEFT JOIN df ON df.term = q.term
                     CROSS JOIN nd
                GROUP BY tf.doc_id),
            lexr AS (SELECT doc_id, r FROM (
                SELECT doc_id, row_number() OVER
                    (ORDER BY s DESC, doc_id) AS r FROM s_lex)
                WHERE r <= 100),
            dn AS (SELECT vec_id AS doc_id,
                          round(list_cosine_similarity(
                              CAST(embedding AS DOUBLE[]),
                              (SELECT CAST(embedding AS DOUBLE[])
                               FROM embeddings WHERE vec_id = 0)), 6)
                              AS s
                   FROM embeddings),
            denser AS (SELECT doc_id, r FROM (
                SELECT doc_id, row_number() OVER
                    (ORDER BY s DESC, doc_id) AS r FROM dn)
                WHERE r <= 100),
            fused AS (
                SELECT coalesce(l.doc_id, d.doc_id) AS doc_id,
                       coalesce(l.r, 0) AS r_lex,
                       coalesce(d.r, 0) AS r_dense,
                       round(coalesce(1.0 / (60 + l.r), 0)
                             + coalesce(1.0 / (60 + d.r), 0), 6)
                           AS rrf
                FROM lexr l FULL OUTER JOIN denser d
                     ON d.doc_id = l.doc_id)
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(r_lex AS BIGINT) AS r_lex,
                   CAST(r_dense AS BIGINT) AS r_dense, rrf
            FROM fused ORDER BY rrf DESC, doc_id LIMIT 10
        """,
        "q_events_unpivot": """
            WITH u AS (SELECT DISTINCT user_id FROM events),
            t AS (SELECT unnest(['click','error','purchase','signup',
                                 'view']) AS event_type),
            c AS (SELECT user_id, event_type, count(*) AS n
                  FROM events GROUP BY 1, 2)
            SELECT u.user_id, t.event_type,
                   CAST(coalesce(c.n, 0) AS BIGINT) AS n
            FROM u CROSS JOIN t
            LEFT JOIN c ON c.user_id = u.user_id
                       AND c.event_type = t.event_type
            ORDER BY u.user_id, t.event_type
        """,
        "q_events_geomean": """
            SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                   round(exp(avg(ln(value))), 6) AS geomean
            FROM events WHERE value > 0
            GROUP BY event_type ORDER BY event_type
        """,
        "q_events_dod_overlap": """
            WITH du AS (SELECT DISTINCT user_id,
                               date_trunc('day', ts) AS day
                        FROM events),
            daily AS (SELECT day, count(*) AS n_active FROM du
                      GROUP BY day),
            b AS (SELECT a.day + INTERVAL 1 DAY AS day,
                         count(*) AS n_both
                  FROM du a JOIN du c ON c.user_id = a.user_id
                       AND c.day = a.day + INTERVAL 1 DAY
                  GROUP BY 1)
            SELECT d.day, p.n_active AS n_active_prev, d.n_active,
                   CAST(coalesce(b.n_both, 0) AS BIGINT) AS n_both,
                   round(coalesce(b.n_both, 0) * 1.0
                         / (p.n_active + d.n_active
                            - coalesce(b.n_both, 0)), 6) AS jaccard
            FROM daily d
            JOIN daily p ON p.day = d.day - INTERVAL 1 DAY
            LEFT JOIN b ON b.day = d.day
            ORDER BY d.day
        """,
        "q_user_event_type_set": """
            SELECT user_id,
                   string_agg(DISTINCT event_type, ','
                              ORDER BY event_type) AS types
            FROM events WHERE ts < TIMESTAMP '2024-01-03'
            GROUP BY user_id ORDER BY user_id
        """,
        "q_customer_rfm": """
            WITH per AS (
                SELECT o_custkey,
                       CAST(date_diff('day', max(o_orderdate),
                            DATE '1998-12-31') AS DOUBLE) AS recency,
                       CAST(count(*) AS DOUBLE) AS frequency,
                       round(sum(o_totalprice), 2) AS monetary
                FROM orders GROUP BY o_custkey),
            th AS (
                SELECT round(quantile_cont(recency, 1.0/3), 6) AS r1,
                       round(quantile_cont(recency, 2.0/3), 6) AS r2,
                       round(quantile_cont(frequency, 1.0/3), 6) AS f1,
                       round(quantile_cont(frequency, 2.0/3), 6) AS f2,
                       round(quantile_cont(monetary, 1.0/3), 6) AS m1,
                       round(quantile_cont(monetary, 2.0/3), 6) AS m2
                FROM per)
            SELECT CAST(1 + CAST(recency > r1 AS INT)
                       + CAST(recency > r2 AS INT) AS BIGINT)
                       AS r_bucket,
                   CAST(1 + CAST(frequency > f1 AS INT)
                       + CAST(frequency > f2 AS INT) AS BIGINT)
                       AS f_bucket,
                   CAST(1 + CAST(monetary > m1 AS INT)
                       + CAST(monetary > m2 AS INT) AS BIGINT)
                       AS m_bucket,
                   count(*) AS n_customers
            FROM per CROSS JOIN th
            GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
        """,
        "doc_logreg_grad2": f"""
            WITH f AS (
                SELECT CAST(length(text) - length(regexp_replace(text,
                           '[^\\w\\s]', '', 'g')) AS DOUBLE)
                           / greatest(length(text), 1) AS x1,
                       CASE WHEN {_N_TOKENS_SQL} > 0 THEN
                           CAST(length(regexp_replace(text, '\\s', '',
                               'g')) AS DOUBLE)
                               / greatest({_N_TOKENS_SQL}, 1)
                       ELSE 0.0 END AS x2,
                       CAST(len(list_filter(
                            list_filter(regexp_split_to_array(text,
                                '\\s+'), x -> x <> ''),
                            x -> lower(x) IN ('the','and','of','to','a',
                                'in','is','it','that','was')))
                            AS DOUBLE) / greatest({_N_TOKENS_SQL}, 1)
                           AS x3,
                       CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
                FROM documents),
            g0 AS (
                SELECT avg(0.5 - y) AS b, avg(x1 * (0.5 - y)) AS p1,
                       avg(x2 * (0.5 - y)) AS p2,
                       avg(x3 * (0.5 - y)) AS p3
                FROM f),
            s AS (
                SELECT y, x1, x2, x3,
                       1.0 / (1.0 + exp(2.0 * (g0.b + g0.p1 * x1
                           + g0.p2 * x2 + g0.p3 * x3))) AS pr
                FROM f CROSS JOIN g0)
            SELECT round(avg(pr - y), 6) AS g_bias,
                   round(avg(x1 * (pr - y)), 6) AS g_punct_ratio,
                   round(avg(x2 * (pr - y)), 6) AS g_mean_token_len,
                   round(avg(x3 * (pr - y)), 6) AS g_stopword_ratio
            FROM s
        """,
        "doc_bigram_logppl": """
            WITH w AS (
                SELECT doc_id, list_filter(
                    regexp_split_to_array(lower(text), '\\s+'),
                    x -> x <> '') AS ws
                FROM documents),
            pos AS (
                SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
                FROM w, LATERAL (SELECT unnest(range(1, len(ws)))
                                 AS i) t),
            bg AS (SELECT w1, w2, count(*) AS c2 FROM pos
                   GROUP BY w1, w2),
            ctx AS (SELECT w1, count(*) AS c1 FROM pos GROUP BY w1),
            v AS (SELECT count(DISTINCT x) AS nv
                  FROM (SELECT unnest(ws) AS x FROM w)),
            lp AS (
                SELECT p.doc_id,
                       -(log2(bg.c2 + 0.5) - log2(ctx.c1 + 0.5 * v.nv))
                           AS l
                FROM pos p
                JOIN bg ON bg.w1 = p.w1 AND bg.w2 = p.w2
                JOIN ctx ON ctx.w1 = p.w1
                CROSS JOIN v),
            per AS (SELECT doc_id, count(*) AS n_bigrams,
                           round(avg(l), 6) AS logppl
                    FROM lp GROUP BY doc_id)
            SELECT d.doc_id,
                   CAST(coalesce(per.n_bigrams, 0) AS BIGINT)
                       AS n_bigrams,
                   coalesce(per.logppl, 0.0) AS logppl
            FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
            ORDER BY d.doc_id
        """,
        "q_events_regression": """
            WITH e AS (
                SELECT event_type,
                       (epoch(ts) - epoch(TIMESTAMP '1995-01-01'))
                           / 86400.0 AS x,
                       value AS y
                FROM events)
            SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                   round(regr_slope(y, x), 6) AS slope,
                   round(regr_intercept(y, x), 6) AS intercept,
                   round(regr_r2(y, x), 6) AS r2
            FROM e GROUP BY event_type ORDER BY event_type
        """,
        "q_events_moving_avg": """
            SELECT event_id, user_id,
                   round(avg(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6)
                       AS mavg
            FROM events ORDER BY event_id
        """,
        "q4_order_priority": """
            SELECT o_orderpriority, count(*) AS order_count
            FROM orders o
            WHERE o_orderdate >= DATE '1996-01-01'
              AND o_orderdate < DATE '1996-04-01'
              AND EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey
                            AND l.l_shipdate >
                                o.o_orderdate + INTERVAL 30 DAY)
            GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        "q6_forecast_revenue": """
            SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
            FROM lineitem
            WHERE l_shipdate >= DATE '1997-01-01'
              AND l_shipdate < DATE '1998-01-01'
              AND l_discount BETWEEN 0.05 AND 0.07
              AND l_quantity < 24
        """,
        "q10_returned_items": """
            WITH r AS (
                SELECT o.o_custkey AS c_custkey,
                       round(sum(l.l_extendedprice * (1 - l.l_discount)),
                             2) AS revenue
                FROM lineitem l
                JOIN orders o ON o.o_orderkey = l.l_orderkey
                WHERE l.l_returnflag = 'R'
                  AND o.o_orderdate >= DATE '1996-01-01'
                  AND o.o_orderdate < DATE '1996-04-01'
                GROUP BY 1)
            SELECT r.c_custkey, c.c_name, r.revenue, c.c_acctbal,
                   n.n_name
            FROM r JOIN customer c ON c.c_custkey = r.c_custkey
            JOIN nation n ON n.n_nationkey = c.c_nationkey
            ORDER BY r.revenue DESC, r.c_custkey LIMIT 20
        """,
        "q13_order_distribution": """
            WITH c AS (SELECT c.c_custkey,
                              count(o.o_orderkey) AS c_count
                       FROM customer c
                       LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                       GROUP BY c.c_custkey)
            SELECT CAST(c_count AS BIGINT) AS c_count,
                   CAST(count(*) AS BIGINT) AS custdist
            FROM c GROUP BY c_count
            ORDER BY custdist DESC, c_count DESC
        """,
        "q7_nation_volume": """
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)),
                         2) AS revenue
            FROM lineitem l
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
            JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
            WHERE l.l_shipdate >= DATE '1996-01-01'
              AND l.l_shipdate < DATE '1998-01-01'
              AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
                OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
            GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
        """,
        "q22_idle_balance": """
            WITH pos AS (
                SELECT CAST(round(c_acctbal * 100) AS BIGINT) AS cents
                FROM customer WHERE round(c_acctbal * 100) > 0),
            th AS (SELECT CAST(sum(cents) AS BIGINT) AS s,
                          CAST(count(*) AS BIGINT) AS n FROM pos)
            SELECT n.n_name, CAST(count(*) AS BIGINT) AS numcust,
                   round(sum(c.c_acctbal), 2) AS totacctbal
            FROM customer c
            JOIN nation n ON n.n_nationkey = c.c_nationkey
            WHERE CAST(round(c.c_acctbal * 100) AS BIGINT)
                      * (SELECT n FROM th) > (SELECT s FROM th)
              AND NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_orderdate >= DATE '2000-01-01')
            GROUP BY n.n_name ORDER BY n.n_name
        """,
        "q14_promo_revenue": """
            SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                       THEN l_extendedprice * (1 - l_discount)
                       ELSE 0 END)
                   / sum(l_extendedprice * (1 - l_discount)), 6)
                       AS promo_share
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= DATE '1997-03-01'
              AND l_shipdate < DATE '1997-04-01'
        """,
        "q15_top_supplier": """
            WITH r AS (
                SELECT l_suppkey,
                       round(sum(l_extendedprice * (1 - l_discount)), 2)
                           AS total_revenue
                FROM lineitem
                WHERE l_shipdate >= DATE '1996-01-01'
                  AND l_shipdate < DATE '1996-04-01'
                GROUP BY l_suppkey)
            SELECT s_suppkey, s_name, total_revenue
            FROM r JOIN supplier ON s_suppkey = l_suppkey
            WHERE total_revenue = (SELECT max(total_revenue) FROM r)
            ORDER BY s_suppkey
        """,
        "q_supplier_jaccard": """
            WITH sp AS (SELECT DISTINCT l_suppkey AS s, l_partkey AS p
                        FROM lineitem),
            deg AS (SELECT s, count(*) AS d FROM sp GROUP BY s),
            cn AS (SELECT x.s AS a, y.s AS b, count(*) AS shared
                   FROM sp x JOIN sp y ON x.p = y.p AND x.s < y.s
                   GROUP BY 1, 2)
            SELECT a, b, CAST(shared AS BIGINT) AS shared,
                   round(shared * 1.0 / (da.d + db.d - shared), 6)
                       AS jaccard
            FROM cn JOIN deg da ON da.s = a JOIN deg db ON db.s = b
            ORDER BY jaccard DESC, a, b LIMIT 50
        """,
        "q_events_markov": """
            WITH seq AS (
                SELECT user_id, event_type,
                       lead(event_type) OVER (
                           PARTITION BY user_id
                           ORDER BY ts, event_id) AS nxt
                FROM events),
            t AS (SELECT event_type AS prev_type, nxt AS next_type,
                         count(*) AS cnt
                  FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2)
            SELECT prev_type, next_type, CAST(cnt AS BIGINT) AS cnt,
                   round(cnt * 1.0 / sum(cnt) OVER
                             (PARTITION BY prev_type), 6) AS prob
            FROM t ORDER BY prev_type, next_type
        """,
        "doc_bpe_pair_counts": """
            WITH w AS (
                SELECT unnest(list_filter(
                    regexp_split_to_array(lower(text), '\\s+'),
                    x -> x <> '')) AS word
                FROM documents),
            wf AS (SELECT word, count(*) AS freq FROM w GROUP BY word),
            p AS (SELECT substr(word, i, 1) AS a,
                         substr(word, i + 1, 1) AS b, freq
                  FROM wf, LATERAL (SELECT unnest(range(1, length(word)))
                                    AS i) t)
            SELECT a, b, CAST(sum(freq) AS BIGINT) AS cnt
            FROM p GROUP BY a, b ORDER BY a, b
        """,
        "q_events_ams_f2": """
            WITH js AS (SELECT unnest(range(16)) AS j),
            h AS (
                SELECT CAST('0x' || substr(
                    md5('ams|' || CAST(user_id AS VARCHAR)), 1, 16)
                    AS UBIGINT) AS h
                FROM events),
            s AS (
                SELECT j,
                       SUM(CASE WHEN (h >> CAST(j AS UBIGINT))
                                     & CAST(1 AS UBIGINT)
                                     = CAST(1 AS UBIGINT)
                                THEN 1 ELSE -1 END) AS z
                FROM h CROSS JOIN js GROUP BY j),
            g AS (SELECT j // 4 AS grp, SUM(z * z) AS s4
                  FROM s GROUP BY 1),
            m AS (SELECT s4, row_number() OVER (ORDER BY s4) AS rk
                  FROM g),
            med AS (SELECT SUM(s4) AS s2 FROM m WHERE rk IN (2, 3)),
            ex AS (SELECT SUM(c * c) AS f2, SUM(c) AS n
                   FROM (SELECT count(*) AS c FROM events
                         GROUP BY user_id))
            SELECT CAST(ex.n AS BIGINT) AS n_rows,
                   CAST(ex.f2 AS BIGINT) AS exact_f2,
                   CAST(med.s2 AS DOUBLE) / 8.0 AS est_f2,
                   round(abs(CAST(med.s2 AS DOUBLE) / 8.0
                             - CAST(ex.f2 AS DOUBLE))
                         / CAST(ex.f2 AS DOUBLE), 6) AS rel_err
            FROM ex, med
        """,
        "q_events_shapley": """
            WITH ut AS MATERIALIZED (
                SELECT DISTINCT user_id, event_type FROM events),
            ty AS MATERIALIZED (
                SELECT event_type,
                       CAST(row_number() OVER (ORDER BY event_type)
                            - 1 AS BIGINT) AS idx
                FROM (SELECT DISTINCT event_type FROM ut)),
            nch AS (SELECT count(*) AS n FROM ty),
            um AS (
                SELECT user_id, SUM(1 << ty.idx) AS mask
                FROM ut JOIN ty USING (event_type)
                GROUP BY user_id),
            hist AS MATERIALIZED (
                SELECT mask, count(*) AS c FROM um GROUP BY mask),
            subs AS (SELECT unnest(range(64)) AS s),
            vs AS MATERIALIZED (
                SELECT s.s,
                       coalesce(SUM(CASE WHEN (h.mask & s.s) <> 0
                                         THEN h.c ELSE 0 END), 0)
                           AS v
                FROM subs s CROSS JOIN hist h
                WHERE s.s < (1 << (SELECT n FROM nch))
                GROUP BY s.s),
            phi AS (
                SELECT t.event_type AS channel,
                    SUM(CAST(factorial(CAST(bit_count(
                            CAST(v0.s AS BIGINT)) AS INTEGER))
                            AS BIGINT)
                        * CAST(factorial(CAST((SELECT n FROM nch)
                            - bit_count(CAST(v0.s AS BIGINT)) - 1
                            AS INTEGER)) AS BIGINT)
                        * (v1.v - v0.v)) AS phi
                FROM ty t
                JOIN vs v0 ON (v0.s & (1 << t.idx)) = 0
                JOIN vs v1 ON v1.s = (v0.s | (1 << t.idx))
                GROUP BY t.event_type)
            SELECT channel, CAST(phi AS BIGINT) AS shapley_scaled,
                   round(CAST(phi AS DOUBLE)
                         / (SELECT SUM(phi) FROM phi), 6) AS share
            FROM phi ORDER BY channel
        """,
        "q_events_butterflies": """
            WITH ut AS MATERIALIZED (
                SELECT DISTINCT user_id, event_type FROM events)
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   CAST(count(*) AS BIGINT) AS n_common_users,
                   CAST(count(*) * (count(*) - 1) // 2 AS BIGINT)
                       AS butterflies
            FROM ut a JOIN ut b ON a.user_id = b.user_id
                               AND a.event_type < b.event_type
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "q_events_ldiversity": """
            WITH cells AS (
                SELECT user_id // 10 AS ubucket,
                       (epoch_us(ts) // 3600000000) % 24 AS hod,
                       event_type, count(*) AS n
                FROM events GROUP BY 1, 2, 3),
            cls AS (
                SELECT ubucket, hod, SUM(n) AS rows_, count(*) AS ns,
                       max(n) AS max_run
                FROM cells GROUP BY 1, 2),
            low AS (SELECT * FROM cls WHERE ns < 3),
            worst AS (SELECT * FROM cls
                      ORDER BY max_run DESC, rows_ ASC LIMIT 1)
            SELECT CAST((SELECT count(*) FROM cls) AS BIGINT)
                       AS n_classes,
                   CAST((SELECT count(*) FROM low) AS BIGINT)
                       AS n_low_div,
                   CAST((SELECT coalesce(SUM(rows_), 0) FROM low)
                        AS BIGINT) AS rows_at_risk,
                   CAST((SELECT min(ns) FROM cls) AS BIGINT)
                       AS min_distinct_sens,
                   CAST(worst.max_run AS BIGINT) AS worst_run,
                   round(CAST(worst.max_run AS DOUBLE) / worst.rows_,
                         6) AS worst_share
            FROM worst
        """,
        "q_lineitem_gains": """
            WITH h AS (
                SELECT CAST(l_quantity AS BIGINT) AS quantity,
                       count(*) AS n,
                       SUM(CASE WHEN l_returnflag = 'R'
                                THEN 1 ELSE 0 END) AS pos
                FROM lineitem GROUP BY 1),
            c AS (
                SELECT quantity, n, pos,
                       SUM(n) OVER (ORDER BY quantity DESC) AS cum_n,
                       SUM(pos) OVER (ORDER BY quantity DESC)
                           AS cum_pos
                FROM h)
            SELECT quantity, CAST(n AS BIGINT) AS n,
                   CAST(pos AS BIGINT) AS pos,
                   CAST(cum_n AS BIGINT) AS cum_n,
                   CAST(cum_pos AS BIGINT) AS cum_pos,
                   round(CAST(cum_pos AS DOUBLE)
                         / (SELECT SUM(pos) FROM h), 6) AS gain_share
            FROM c ORDER BY quantity DESC
        """,
        "q_join_order_dp": """
            WITH st AS (SELECT
                (SELECT count(*) FROM nation) AS r1,
                (SELECT count(*) FROM customer) AS r2,
                (SELECT count(*) FROM orders) AS r3,
                (SELECT count(*) FROM lineitem) AS r4,
                greatest(
                    (SELECT count(DISTINCT n_nationkey) FROM nation),
                    (SELECT count(DISTINCT c_nationkey)
                     FROM customer)) AS e1,
                greatest(
                    (SELECT count(DISTINCT c_custkey) FROM customer),
                    (SELECT count(DISTINCT o_custkey)
                     FROM orders)) AS e2,
                greatest(
                    (SELECT count(DISTINCT o_orderkey) FROM orders),
                    (SELECT count(DISTINCT l_orderkey)
                     FROM lineitem)) AS e3),
            c AS (SELECT *,
                CAST(r1 AS HUGEINT) * r2 // e1 AS c12,
                CAST(r2 AS HUGEINT) * r3 // e2 AS c23,
                CAST(r3 AS HUGEINT) * r4 // e3 AS c34,
                CAST(r1 AS HUGEINT) * r2 * r3
                    // (CAST(e1 AS HUGEINT) * e2) AS c13,
                CAST(r2 AS HUGEINT) * r3 * r4
                    // (CAST(e2 AS HUGEINT) * e3) AS c24,
                CAST(r1 AS HUGEINT) * r2 * r3 * r4
                    // (CAST(e1 AS HUGEINT) * e2 * e3) AS c14
                FROM st),
            d AS (SELECT *,
                least(c23, c12) + c13 AS k13,
                least(c34, c23) + c24 AS k24
                FROM c),
            f AS (SELECT *,
                least(k24, c12 + c34, k13) + c14 AS k14,
                CASE WHEN k24 <= c12 + c34 AND k24 <= k13 THEN 1
                     WHEN c12 + c34 <= k13 THEN 2
                     ELSE 3 END AS s14
                FROM d)
            SELECT * FROM (
                SELECT CAST(1 AS BIGINT) AS r_from,
                       CAST(1 AS BIGINT) AS r_to,
                       CAST(r1 AS BIGINT) AS est_card,
                       CAST(0 AS BIGINT) AS best_cost,
                       CAST(0 AS BIGINT) AS best_split FROM f
                UNION ALL SELECT 1, 2, CAST(c12 AS BIGINT),
                       CAST(c12 AS BIGINT), 1 FROM f
                UNION ALL SELECT 1, 3, CAST(c13 AS BIGINT),
                       CAST(k13 AS BIGINT),
                       CASE WHEN c23 <= c12 THEN 1 ELSE 2 END FROM f
                UNION ALL SELECT 1, 4, CAST(c14 AS BIGINT),
                       CAST(k14 AS BIGINT), s14 FROM f
                UNION ALL SELECT 2, 2, CAST(r2 AS BIGINT), 0, 0 FROM f
                UNION ALL SELECT 2, 3, CAST(c23 AS BIGINT),
                       CAST(c23 AS BIGINT), 2 FROM f
                UNION ALL SELECT 2, 4, CAST(c24 AS BIGINT),
                       CAST(k24 AS BIGINT),
                       CASE WHEN c34 <= c23 THEN 2 ELSE 3 END FROM f
                UNION ALL SELECT 3, 3, CAST(r3 AS BIGINT), 0, 0 FROM f
                UNION ALL SELECT 3, 4, CAST(c34 AS BIGINT),
                       CAST(c34 AS BIGINT), 3 FROM f
                UNION ALL SELECT 4, 4, CAST(r4 AS BIGINT), 0, 0 FROM f
            ) ORDER BY r_from, r_to
        """,
        "q_customer_linkage_fs": """
            WITH f AS MATERIALIZED (
                SELECT c_custkey AS id, c_nationkey AS nk,
                       c_mktsegment AS f1,
                       (CAST(round(c_acctbal * 100) AS BIGINT)
                        + 100000) // 10000 AS f2,
                       c_custkey % 10 AS f3
                FROM customer),
            nn AS (SELECT count(*) AS n FROM f),
            u1 AS (SELECT SUM(c * (c - 1)) AS num FROM
                   (SELECT count(*) AS c FROM f GROUP BY f1)),
            u2 AS (SELECT SUM(c * (c - 1)) AS num FROM
                   (SELECT count(*) AS c FROM f GROUP BY f2)),
            u3 AS (SELECT SUM(c * (c - 1)) AS num FROM
                   (SELECT count(*) AS c FROM f GROUP BY f3)),
            w AS (SELECT
                CAST(floor(1e6 * (ln(0.95) - ln(CAST(u1.num AS DOUBLE)
                    / (nn.n * (nn.n - 1))))) AS BIGINT) AS wa1,
                CAST(floor(1e6 * (ln(1.0 - 0.95)
                    - ln(1.0 - CAST(u1.num AS DOUBLE)
                         / (nn.n * (nn.n - 1))))) AS BIGINT) AS wd1,
                CAST(floor(1e6 * (ln(0.9) - ln(CAST(u2.num AS DOUBLE)
                    / (nn.n * (nn.n - 1))))) AS BIGINT) AS wa2,
                CAST(floor(1e6 * (ln(1.0 - 0.9)
                    - ln(1.0 - CAST(u2.num AS DOUBLE)
                         / (nn.n * (nn.n - 1))))) AS BIGINT) AS wd2,
                CAST(floor(1e6 * (ln(0.85) - ln(CAST(u3.num AS DOUBLE)
                    / (nn.n * (nn.n - 1))))) AS BIGINT) AS wa3,
                CAST(floor(1e6 * (ln(1.0 - 0.85)
                    - ln(1.0 - CAST(u3.num AS DOUBLE)
                         / (nn.n * (nn.n - 1))))) AS BIGINT) AS wd3
                FROM u1, u2, u3, nn),
            p AS (
                SELECT a.id AS id_a, b.id AS id_b,
                       CAST(CASE WHEN a.f1 = b.f1
                                 THEN 1 ELSE 0 END AS BIGINT)
                           AS agree_seg,
                       CAST(CASE WHEN a.f2 = b.f2
                                 THEN 1 ELSE 0 END AS BIGINT)
                           AS agree_bal,
                       CAST(CASE WHEN a.f3 = b.f3
                                 THEN 1 ELSE 0 END AS BIGINT)
                           AS agree_digit
                FROM f a JOIN f b ON a.nk = b.nk AND a.id < b.id)
            SELECT id_a, id_b, agree_seg, agree_bal, agree_digit,
                   (CASE WHEN agree_seg = 1 THEN w.wa1 ELSE w.wd1 END
                    + CASE WHEN agree_bal = 1
                           THEN w.wa2 ELSE w.wd2 END
                    + CASE WHEN agree_digit = 1
                           THEN w.wa3 ELSE w.wd3 END) AS score_micro
            FROM p, w
            ORDER BY score_micro DESC, id_a, id_b LIMIT 100
        """,
        "doc_dsir_select": """
            WITH w AS (
                SELECT doc_id, lang,
                       unnest(list_filter(regexp_split_to_array(
                           lower(text), '\\s+'), x -> x <> '')) AS w
                FROM documents),
            b AS (
                SELECT doc_id, lang,
                       CAST(CAST('0x' || substr(md5('dsir|' || w),
                                                1, 16) AS UBIGINT)
                            % 1024 AS BIGINT) AS b
                FROM w),
            ct AS (SELECT b, count(*) AS c FROM b
                   WHERE lang = 'en' GROUP BY b),
            cr AS (SELECT b, count(*) AS c FROM b
                   WHERE lang <> 'en' GROUP BY b),
            tot AS (SELECT
                (SELECT count(*) FROM b WHERE lang = 'en') AS t,
                (SELECT count(*) FROM b WHERE lang <> 'en') AS r),
            m AS (
                SELECT bb.b,
                       CAST(floor(1e6 * (
                           ln((coalesce(ct.c, 0) + 1.0)
                              / (tot.t + 1024))
                           - ln((coalesce(cr.c, 0) + 1.0)
                                / (tot.r + 1024)))) AS BIGINT) AS m
                FROM (SELECT unnest(range(1024)) AS b) bb
                LEFT JOIN ct ON ct.b = bb.b
                LEFT JOIN cr ON cr.b = bb.b
                CROSS JOIN tot),
            sc AS (
                SELECT b.doc_id, SUM(m.m) AS score_micro
                FROM b JOIN m ON m.b = b.b WHERE b.lang <> 'en'
                GROUP BY b.doc_id)
            SELECT CAST(row_number() OVER (
                       ORDER BY score_micro DESC, doc_id)
                       AS BIGINT) AS sel_rank,
                   doc_id,
                   CAST(score_micro AS BIGINT) AS score_micro
            FROM sc ORDER BY score_micro DESC, doc_id LIMIT 50
        """,
        "q_events_kmv_overlap": """
            WITH tc AS (
                SELECT event_type, count(*) AS c
                FROM events GROUP BY 1),
            top AS (
                SELECT event_type,
                       row_number() OVER (ORDER BY c DESC,
                                          event_type ASC) AS rk
                FROM tc QUALIFY rk <= 3),
            h AS (
                SELECT DISTINCT t.rk, t.event_type,
                       CAST('0x' || substr(
                           md5(CAST(e.user_id AS VARCHAR)), 1, 16)
                           AS UBIGINT) AS h
                FROM events e JOIN top t USING (event_type)),
            sk AS (
                SELECT rk, event_type, h,
                       row_number() OVER (PARTITION BY rk
                                          ORDER BY h) AS hr
                FROM h QUALIFY hr <= 64),
            pairs AS (
                SELECT a.rk AS ra, b.rk AS rb,
                       a.event_type AS type_a, b.event_type AS type_b
                FROM (SELECT DISTINCT rk, event_type FROM sk) a
                JOIN (SELECT DISTINCT rk, event_type FROM sk) b
                     ON a.rk < b.rk),
            uni0 AS (
                SELECT p.ra, p.rb, s.h,
                       count(DISTINCT s.rk) AS sides
                FROM pairs p JOIN sk s ON s.rk IN (p.ra, p.rb)
                GROUP BY 1, 2, 3),
            uni AS (
                SELECT ra, rb, h, sides,
                       row_number() OVER (PARTITION BY ra, rb
                                          ORDER BY h) AS ur
                FROM uni0 QUALIFY ur <= 64),
            stats AS (
                SELECT ra, rb, count(*) AS kp,
                       sum(CASE WHEN sides = 2 THEN 1 ELSE 0 END)
                           AS kc,
                       max(h) AS maxh
                FROM uni GROUP BY 1, 2),
            eu AS (
                SELECT DISTINCT t.rk, e.user_id
                FROM events e JOIN top t USING (event_type)),
            exj AS (
                SELECT p.ra, p.rb, eu.user_id,
                       count(DISTINCT eu.rk) AS cnt
                FROM pairs p JOIN eu ON eu.rk IN (p.ra, p.rb)
                GROUP BY 1, 2, 3),
            ex AS (
                SELECT ra, rb,
                       sum(CASE WHEN cnt = 2 THEN 1 ELSE 0 END)
                           AS inter,
                       count(*) AS un
                FROM exj GROUP BY 1, 2)
            SELECT p.type_a, p.type_b,
                   CAST(s.kp AS BIGINT) AS k_used,
                   CAST(s.kc AS BIGINT) AS k_common,
                   round(CAST(s.kc AS DOUBLE) / s.kp, 6)
                       AS jaccard_est,
                   round(CASE WHEN s.kp < 64
                              THEN CAST(s.kp AS DOUBLE)
                              ELSE 63.0 / (CAST(s.maxh AS DOUBLE)
                                   / 18446744073709551616.0) END, 6)
                       AS union_est,
                   round(CAST(ex.inter AS DOUBLE) / ex.un, 6)
                       AS jaccard_exact
            FROM pairs p
            JOIN stats s ON s.ra = p.ra AND s.rb = p.rb
            JOIN ex ON ex.ra = p.ra AND ex.rb = p.rb
            ORDER BY p.ra, p.rb
        """,
    }
