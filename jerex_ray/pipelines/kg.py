"""The flagship pipeline: transcripts → knowledge-graph triples.

Ray-Data restatement of the reference's ``jerex_test.py`` inference
path (SURVEY.md §3.1):

    read/synthesize transcripts
      → hash-repartition on conv_id + vectorized assembly   (shuffle #1)
      → TokenizeDocs actor pool (sub-word offsets + 700-cap chunking)
      → RuleScorer actor pool   (J1–J9, whole chain per doc)
      → explode_triples          (flat triple rows)
      → canonicalize_triples     (normalized surfaces + stable ids)
      → groupby(part_key) → atomic partition write + manifest
                                                             (shuffle #2)

Everything streams; nothing materializes the full corpus. The only
driver-side data are the tiny per-partition metrics rows.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from jerex_ray.config import PipelineConfig
from jerex_ray.runtime import configure_data_context, shuffle_partitions
from jerex_ray.sinks.parquet_sink import (completed_partitions,
                                          write_partition_block)
from jerex_ray.stages.assemble import add_part_key, assemble_documents
from jerex_ray.stages.canonicalize import canonicalize_triples, dedup_triples
from jerex_ray.stages.convert import explode_triples
from jerex_ray.stages.scorer import score_documents
from jerex_ray.stages.tokenize import tokenize_documents


def _with_part_key(transcripts_ds, cfg: PipelineConfig,
                   skip_partitions: set[int] | None = None):
    """Tag transcript rows with the persistent output partition key and
    (on resume) drop rows of already-committed partitions at the READ,
    before any shuffle or model work."""
    ds = transcripts_ds.map_batches(
        add_part_key, batch_format="pyarrow",
        fn_kwargs={"num_partitions": cfg.num_output_partitions})
    if skip_partitions:
        skip = pa.array(sorted(skip_partitions), pa.int32())
        ds = ds.map_batches(
            lambda t: t.filter(pc.invert(pc.is_in(t["part_key"], value_set=skip))),
            batch_format="pyarrow")
    return ds


class TokenizeAndScore:
    """Fused tokenizer+scorer actor: one pool instead of two.

    The tokenized representation (per-token sub-word ids + offsets) is
    a transient between the two stages — fusing keeps it inside the
    actor's heap instead of shipping every encoded document through
    the object store to a second pool, and halves actor-fleet startup.
    Length-bucketing (``stages/bucket.py``) happens within the fused
    batch: same semantics (it only orders docs to homogenize scorer
    batch lengths), narrower scope."""

    def __init__(self, config=None, scorer_cls=None,
                 scorer_kwargs: dict | None = None):
        from jerex_ray.stages.scorer import RuleScorer
        from jerex_ray.stages.tokenize import TokenizeDocs
        self.tokenize = TokenizeDocs(config)
        self.score = (scorer_cls or RuleScorer)(
            config=config, **(scorer_kwargs or {}))

    def __call__(self, batch: pa.Table) -> pa.Table:
        from jerex_ray.stages.bucket import _sort_block_by_length
        return self.score(_sort_block_by_length(self.tokenize(batch)))


def extract_triples(transcripts_ds, config: PipelineConfig | None = None,
                    *, shuffle_blocks: int | None = None,
                    skip_partitions: set[int] | None = None,
                    scorer_cls=None, scorer_kwargs: dict | None = None):
    """transcripts Dataset → canonicalized triples Dataset (no sink).

    ``scorer_cls`` selects the model actor (default ``RuleScorer``;
    ``NumpyScorer`` for the frozen-weight head-math model, with
    ``scorer_kwargs={'variant': 'global'}`` for the J10 global
    relation variant mirroring the reference's model_type registry,
    ``models/__init__.py:9-24``).

    Note: conversation-level dedup (G6) happens at the sink's
    per-partition group; callers that skip the sink get chunk-level
    triples and should dedup themselves if long convs matter."""
    cfg = config or PipelineConfig()
    configure_data_context(ds=transcripts_ds)
    ds = _with_part_key(transcripts_ds, cfg, skip_partitions)
    from jerex_ray.stages.assemble import DOCS_PER_BLOCK

    docs = assemble_documents(ds, shuffle_blocks=shuffle_blocks,
                              locality=cfg.assembly_locality)
    # actor-pool parallelism is one task per block, and Ray's dynamic
    # block builder re-coalesces small yielded sub-blocks up to the
    # target byte size — split to bounded-row blocks (metadata-level,
    # no shuffle) so pools parallelize past the shuffle width at scale
    # without adding overhead on small inputs
    docs = docs.repartition(target_num_rows_per_block=DOCS_PER_BLOCK)
    if cfg.fused_scoring:
        from jerex_ray.runtime import pool_concurrency
        scored = docs.map_batches(
            TokenizeAndScore, batch_format="pyarrow",
            batch_size=cfg.score_batch_size,
            concurrency=cfg.scorer_concurrency
            # 0.5: the fused pool shares the cluster with assembly,
            # the conv_id shuffle and the explode/canonicalize tasks —
            # 0.75 starved them and measured consistently SLOWER
            # end-to-end (4.6-4.9s vs 4.0-4.6s at sf0.1/32)
            or pool_concurrency(cfg.actor_num_cpus, cpu_fraction=0.5),
            num_cpus=cfg.actor_num_cpus,
            fn_constructor_kwargs={"config": cfg, "scorer_cls": scorer_cls,
                                   "scorer_kwargs": scorer_kwargs})
    else:
        docs = tokenize_documents(docs, cfg,
                                  concurrency=cfg.tokenizer_concurrency)
        # length-bucket within blocks: near-homogeneous batch lengths
        # for the (batched) scorer — bounded pad waste on a GPU model
        from jerex_ray.stages.bucket import length_bucket
        docs = length_bucket(docs)
        scored = score_documents(docs, cfg, scorer_cls=scorer_cls,
                                 scorer_kwargs=scorer_kwargs)
    triples = scored.map_batches(explode_triples, batch_format="pyarrow")
    return triples.map_batches(canonicalize_triples, batch_format="pandas")


def run_kg_pipeline(transcripts_ds, out_dir: str,
                    config: PipelineConfig | None = None,
                    *, resume: bool = True, shuffle_blocks: int | None = None,
                    scorer_cls=None, scorer_kwargs: dict | None = None):
    """End-to-end run with resumable partitioned sink.

    Returns the per-partition metrics as a pandas DataFrame (the
    lineage summary). With ``resume=True``, partitions that already
    have a valid manifest are skipped at the read — no recompute."""
    import dataclasses

    import pandas as pd

    from jerex_ray.sinks.parquet_sink import write_layout_meta

    cfg = config or PipelineConfig()
    # the output's partitioning modulus is part of its layout: adopt the
    # stored value on resume (a different modulus would hash rows into
    # partitions the committed manifests don't describe)
    stored = write_layout_meta(out_dir, cfg.num_output_partitions)
    if stored != cfg.num_output_partitions:
        cfg = dataclasses.replace(cfg, num_output_partitions=stored)
    done = completed_partitions(out_dir) if resume else set()
    empty_metrics = pd.DataFrame(columns=["part_key", "n_triples", "n_convs",
                                          "fingerprint"])
    if done >= set(range(cfg.num_output_partitions)):
        # every possible partition is committed — nothing to do
        return empty_metrics
    if transcripts_ds.count() == 0:
        # guard: an all-empty corpus loses its schema inside the hash
        # shuffle (library edge); count() on the raw source is metadata
        return empty_metrics

    triples = extract_triples(transcripts_ds, cfg,
                              shuffle_blocks=shuffle_blocks,
                              skip_partitions=done,
                              scorer_cls=scorer_cls,
                              scorer_kwargs=scorer_kwargs)
    from jerex_ray.functions.aggregate import grouped_apply
    metrics = grouped_apply(
        triples, ["part_key"],
        lambda b: write_partition_block(b, out_dir, dedup_triples),
        num_partitions=shuffle_partitions(cfg.num_output_partitions))
    pdf = metrics.to_pandas()  # tiny: one row per partition
    if "part_key" not in pdf.columns:
        # a model that extracts zero triples yields an all-empty
        # metrics Dataset, which collects schema-less (library edge)
        return empty_metrics
    return pdf.sort_values("part_key").reset_index(drop=True)


def graph_tables(triples_ds):
    """Materialize the KG as graph tables (north rule: "graph
    materialize"): from the canonicalized triple stream,

    * ``nodes``: one row per canonical entity — id, elected surface,
      type, occurrence count (``canonicalize.build_entity_table``,
      the two-phase partial/final aggregate);
    * ``edges``: one row per distinct (subj_id, pred, obj_id) with
      ``n_support`` (how many conversations assert it) and
      ``score_max`` — the global edge aggregate on top of the
      per-conversation G6 dedup, combiner-backed like every grouped
      aggregate here.

    Both stay Datasets (never collected); at 100 TB the node and edge
    tables are the bounded artifacts a downstream graph store ingests.
    """
    from jerex_ray.functions.aggregate import grouped_aggregate
    from jerex_ray.stages.canonicalize import build_entity_table

    nodes = build_entity_table(triples_ds)
    # G6 first: a >700-sub-word conversation is chunked, and a triple
    # extracted in two chunks of ONE conversation must count once —
    # collapse to (conv, triple) before counting supporting convs
    # (both aggregates are combiner-backed; the first bounds the
    # second's input to distinct conv-triples)
    per_conv = grouped_aggregate(
        triples_ds, ["conv_id", "subj_id", "pred", "obj_id"],
        {"score": ("score", "max")}, result_hint="large")
    edges = grouped_aggregate(
        per_conv, ["subj_id", "pred", "obj_id"],
        {"n_support": (None, "count"), "score_max": ("score", "max")},
        result_hint="large")
    return nodes, edges


def materialize_graph(triples_ds, out_dir: str):
    """Write the graph tables as parquet directories
    (``<out_dir>/nodes``, ``<out_dir>/edges`` — one file per block, so
    a downstream reader parallelizes over files). Returns
    (n_nodes, n_edges)."""
    import os

    nodes, edges = graph_tables(triples_ds)
    nodes = nodes.materialize()
    edges = edges.materialize()
    nodes.write_parquet(os.path.join(out_dir, "nodes"))
    edges.write_parquet(os.path.join(out_dir, "edges"))
    return nodes.count(), edges.count()
