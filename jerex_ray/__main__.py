"""CLI entry points — the ``ray job submit`` surface.

    python -m jerex_ray synth  --n-convs 10000 --output /tmp/transcripts
    python -m jerex_ray run    --input /tmp/transcripts --output /tmp/kg
    python -m jerex_ray eval   --pred /tmp/kg --gt-convs 10000
    python -m jerex_ray report --pred /tmp/kg --gt-convs 10000 --output /tmp/report.html

Only this module (and bench.py / the test fixture) owns a Ray session;
library code never calls ``ray.init``.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_session():
    import ray
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    import logging
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    return ray


def cmd_synth(args) -> int:
    ray = _ray_session()
    from jerex_ray.sources.transcripts import read_synthetic_transcripts
    ds = read_synthetic_transcripts(args.n_convs)
    if getattr(args, "format", "parquet") == "jsonl":
        from jerex_ray.sources.jsonl import write_transcripts_jsonl
        write_transcripts_jsonl(ds, args.output)
    else:
        ds.write_parquet(args.output)
    print(json.dumps({"written": args.output, "n_convs": args.n_convs,
                      "format": getattr(args, "format", "parquet")}))
    ray.shutdown()
    return 0


def cmd_run(args) -> int:
    ray = _ray_session()
    import ray.data as rd
    from jerex_ray.config import PipelineConfig
    from jerex_ray.pipelines.kg import run_kg_pipeline
    from jerex_ray.runtime import configure_data_context
    configure_data_context()
    cfg = PipelineConfig(num_output_partitions=args.num_partitions)
    if getattr(args, "input_format", "parquet") == "jsonl":
        from jerex_ray.sources.jsonl import read_transcripts_jsonl
        ds = read_transcripts_jsonl(args.input)
    else:
        ds = rd.read_parquet(args.input)
    scorer_cls = scorer_kwargs = None
    if getattr(args, "model_type", "rule") != "rule":
        from jerex_ray.registry import resolve_model
        scorer_cls, scorer_kwargs = resolve_model(args.model_type)
        if getattr(args, "checkpoint", None):
            scorer_kwargs = {**(scorer_kwargs or {}),
                             "checkpoint_path": args.checkpoint}
    metrics = run_kg_pipeline(ds, args.output, cfg, resume=not args.no_resume,
                              scorer_cls=scorer_cls,
                              scorer_kwargs=scorer_kwargs)
    print(json.dumps({
        "output": args.output,
        "partitions_written": int(len(metrics)),
        "n_triples": int(metrics["n_triples"].sum()) if len(metrics) else 0,
    }))
    ray.shutdown()
    return 0


def cmd_graph(args) -> int:
    """Materialize the node/edge graph tables from a finished triple
    output directory (the 'graph materialize' step as its own job)."""
    ray = _ray_session()
    import os

    import ray.data as rd

    from jerex_ray.pipelines.kg import materialize_graph
    from jerex_ray.runtime import configure_data_context
    from jerex_ray.sinks.parquet_sink import completed_partitions
    configure_data_context()
    paths = [os.path.join(args.pred, f"part_key={k}", "triples.parquet")
             for k in sorted(completed_partitions(args.pred))]
    if not paths:
        print(json.dumps({"output": args.output, "n_nodes": 0,
                          "n_edges": 0}))
        ray.shutdown()
        return 0
    triples = rd.read_parquet(paths)   # streams; never one big table
    n_nodes, n_edges = materialize_graph(triples, args.output)
    summary = {"output": args.output,
               "n_nodes": int(n_nodes), "n_edges": int(n_edges)}
    if getattr(args, "graphml", None):
        from jerex_ray.sinks.graphml import write_graphml
        nodes = rd.read_parquet(os.path.join(args.output, "nodes")) \
            .to_pandas()
        edges = rd.read_parquet(os.path.join(args.output, "edges")) \
            .to_pandas()
        write_graphml(nodes, edges, args.graphml)
        summary["graphml"] = args.graphml
    print(json.dumps(summary))
    ray.shutdown()
    return 0


def cmd_eval(args) -> int:
    ray = _ray_session()
    from jerex_ray.sinks.parquet_sink import read_triples
    if args.distributed:
        # corpus-scale path: hash-join of pred vs GT keys, both sides
        # stay Datasets — only three counters reach the driver
        from jerex_ray.eval.scoring import evaluate_triples_distributed
        from jerex_ray.sinks.parquet_sink import read_triples_dataset
        from jerex_ray.sources.transcripts import \
            read_ground_truth_triples
        m = evaluate_triples_distributed(
            read_triples_dataset(args.pred),
            read_ground_truth_triples(args.gt_convs),
            strict_types=args.strict)
    else:
        from jerex_ray.eval.scoring import evaluate_triples
        from jerex_ray.sources.transcripts import ground_truth_triples
        pred = read_triples(args.pred).to_pandas()
        gt = ground_truth_triples(args.gt_convs).to_pandas()
        m = evaluate_triples(pred, gt, strict_types=args.strict)
    print(json.dumps({k: (round(v, 6) if isinstance(v, float) else v)
                      for k, v in m.items()}))
    ray.shutdown()
    return 0 if m["precision"] >= 0.95 and m["recall"] >= 0.95 else 1


def cmd_report(args) -> int:
    ray = _ray_session()
    from jerex_ray.eval.report import write_examples_report
    from jerex_ray.sinks.parquet_sink import read_triples_dataset
    from jerex_ray.sources.transcripts import ground_truth_triples
    # the report is example-bounded — pull a bounded prefix of the
    # committed partitions, never the whole triple output
    pred = read_triples_dataset(args.pred) \
        .limit(max(100_000, 200 * args.limit)).to_pandas()
    gt = ground_truth_triples(args.gt_convs).to_pandas()
    path = write_examples_report(pred, gt, args.output, limit=args.limit)
    print(json.dumps({"report": path}))
    ray.shutdown()
    return 0


def cmd_train(args) -> int:
    """The reference's ``jerex_train.py`` analogue: distill silver GT
    from the rule scorer (or read annotated GT parquet), then run the
    synchronous data-parallel AdamW loop over the head parameters and
    save the trained weights as an .npz checkpoint."""
    ray = _ray_session()
    import ray.data as rd

    from jerex_ray.config import PipelineConfig
    from jerex_ray.pipelines.train import (silver_gt_from_rule_scorer,
                                           train_epochs)
    from jerex_ray.runtime import configure_data_context
    from jerex_ray.stages.numpy_scorer import NumpyScorer
    configure_data_context()
    cfg = PipelineConfig()
    gt_join = getattr(args, "gt_join", False)
    if args.gt_dir:
        # annotated corpus: GT from parquet (the layout
        # silver_gt_from_rule_scorer's output_dir writes)
        from jerex_ray.pipelines.kg import _with_part_key
        from jerex_ray.stages.assemble import assemble_documents
        from jerex_ray.stages.tokenize import tokenize_documents
        if gt_join:
            # corpus-sized GT: stream as Datasets → attach_gt
            # hash-join co-location, nothing GT-sized on the driver
            gt_m = rd.read_parquet(f"{args.gt_dir}/mentions")
            gt_r = rd.read_parquet(f"{args.gt_dir}/relations")
        else:
            import pyarrow.parquet as pq
            gt_m = pq.read_table(f"{args.gt_dir}/mentions")
            gt_r = pq.read_table(f"{args.gt_dir}/relations")
        tok = tokenize_documents(assemble_documents(_with_part_key(
            rd.read_parquet(args.input), cfg)), cfg)
    else:
        # the distillation pass already assembles + tokenizes the
        # corpus — reuse its materialized tokenized Dataset
        gt_m, gt_r, tok = silver_gt_from_rule_scorer(
            rd.read_parquet(args.input), cfg, return_tokenized=True,
            as_datasets=gt_join)
    hist, weights = train_epochs(tok, gt_m, gt_r, epochs=args.epochs,
                                 lr=args.lr, warmup_ratio=args.warmup,
                                 config=cfg, variant=args.model_type)
    if not len(hist):
        print(json.dumps({"error": "no trainable documents in input",
                          "input": args.input}))
        ray.shutdown()
        return 1
    model = NumpyScorer(cfg, variant=args.model_type)
    model.set_weights(weights)
    model.save_checkpoint(args.checkpoint)
    print(json.dumps({
        "checkpoint": args.checkpoint,
        "epochs": int(len(hist)),
        "loss_first": round(float(hist["loss"].iloc[0]), 6),
        "loss_last": round(float(hist["loss"].iloc[-1]), 6),
    }))
    ray.shutdown()
    return 0


def cmd_dedup(args) -> int:
    """Corpus dedup over a (doc_id, text) parquet table: exact
    fingerprint or MinHash-LSH near-dup; writes the kept rows as
    partitioned parquet plus a JSON summary line."""
    ray = _ray_session()
    import ray.data as rd

    from jerex_ray.runtime import configure_data_context
    configure_data_context()
    ds = rd.read_parquet(args.input)
    n_in = ds.count()       # metadata-only (parquet row counts)
    if args.method == "exact":
        from jerex_ray.ops.dedup import exact_dedup
        kept = exact_dedup(ds)
        n_edges = None
    else:
        from jerex_ray.ops.dedup import minhash_dedup
        kept, edges = minhash_dedup(ds, threshold=args.threshold,
                                    transitive=args.transitive)
        n_edges = int(len(edges))
    # one materialization serves both the write and the kept count —
    # no re-read of input or output
    kept = kept.materialize()
    kept.write_parquet(args.output)
    n_out = kept.count()
    out = {"input_rows": int(n_in), "kept_rows": int(n_out),
           "dropped": int(n_in - n_out), "method": args.method}
    if n_edges is not None:
        out["near_dup_edges"] = n_edges
    print(json.dumps(out))
    ray.shutdown()
    return 0


def cmd_pretrain(args) -> int:
    """The composed pretraining-data pipeline over a (doc_id, text,
    source) parquet table: near-dup survivors → train split →
    decontaminate → quality filter → token packing; writes the packed
    assignment table as parquet plus a JSON summary."""
    ray = _ray_session()
    import ray.data as rd

    from jerex_ray.pipelines.pretrain import pretrain_corpus
    from jerex_ray.runtime import configure_data_context
    configure_data_context()
    ds = rd.read_parquet(args.input)
    n_in = ds.count()
    out = pretrain_corpus(ds, pack_budget=args.pack_budget).materialize()
    out.write_parquet(args.output)
    n_out = out.count()
    print(json.dumps({"input_rows": int(n_in), "packed_rows": int(n_out),
                      "dropped": int(n_in - n_out),
                      "pack_budget": args.pack_budget,
                      "output": args.output}))
    ray.shutdown()
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="jerex_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("synth", help="write a synthetic transcript corpus")
    s.add_argument("--n-convs", type=int, default=10_000)
    s.add_argument("--output", required=True)
    s.add_argument("--format", default="parquet",
                   choices=["parquet", "jsonl"],
                   help="on-disk corpus format")
    s.set_defaults(fn=cmd_synth)

    r = sub.add_parser("run", help="run the KG pipeline (resumable)")
    r.add_argument("--input", required=True)
    r.add_argument("--input-format", default="parquet",
                   choices=["parquet", "jsonl"],
                   help="transcript corpus format at --input")
    r.add_argument("--output", required=True)
    r.add_argument("--num-partitions", type=int, default=16)
    r.add_argument("--no-resume", action="store_true")
    r.add_argument("--model-type", default="rule",
                   help="scorer from the model registry: rule | "
                        "joint_multi_instance | joint_global | hf "
                        "(reference models/__init__.py:9-24 analogue)")
    r.add_argument("--checkpoint", default=None,
                   help=".npz weight checkpoint (from `train`) loaded "
                        "once per scorer actor")
    r.set_defaults(fn=cmd_run)

    g = sub.add_parser("graph", help="materialize node/edge graph tables "
                       "from a triple output dir")
    g.add_argument("--pred", required=True)
    g.add_argument("--output", required=True)
    g.add_argument("--graphml", default=None,
                   help="also export one GraphML file (the graph "
                        "tables are vocabulary-bounded)")
    g.set_defaults(fn=cmd_graph)

    e = sub.add_parser("eval", help="triple P/R vs planted ground truth")
    e.add_argument("--pred", required=True)
    e.add_argument("--gt-convs", type=int, required=True)
    e.add_argument("--strict", action="store_true",
                   help="rel_nec variant: entity types must match too")
    e.add_argument("--distributed", action="store_true",
                   help="hash-join eval with pred AND GT as Datasets "
                        "(nothing triple-sized on the driver; the "
                        "corpus-scale path)")
    e.set_defaults(fn=cmd_eval)

    t = sub.add_parser("train", help="train head weights on silver GT "
                                     "(AdamW, reference schedule)")
    t.add_argument("--input", required=True,
                   help="transcripts parquet (silver GT is distilled "
                        "from the rule scorer)")
    t.add_argument("--checkpoint", required=True,
                   help="output .npz weight checkpoint")
    t.add_argument("--gt-dir", default=None,
                   help="annotated GT parquet dir (mentions/ + "
                        "relations/, the silver-GT output layout); "
                        "default distills silver GT from the rule "
                        "scorer")
    t.add_argument("--gt-join", action="store_true",
                   help="co-locate GT with docs by hash join instead "
                        "of broadcasting it (the corpus-sized-GT "
                        "scale path; identical losses)")
    t.add_argument("--epochs", type=int, default=3)
    t.add_argument("--lr", type=float, default=5e-3)
    t.add_argument("--warmup", type=float, default=0.0,
                   help="warmup fraction of total epochs")
    t.add_argument("--model-type", default="multi_instance",
                   choices=["multi_instance", "global"])
    t.set_defaults(fn=cmd_train)

    d = sub.add_parser("dedup", help="exact / minhash near-dup corpus dedup")
    d.add_argument("--input", required=True,
                   help="parquet dir/file with (doc_id, text)")
    d.add_argument("--output", required=True)
    d.add_argument("--method", choices=["exact", "minhash"],
                   default="exact")
    d.add_argument("--threshold", type=float, default=0.8,
                   help="minhash jaccard threshold")
    d.add_argument("--transitive", action="store_true",
                   help="transitive closure via distributed "
                        "connected components")
    d.set_defaults(fn=cmd_dedup)

    pt = sub.add_parser("pretrain", help="composed pretraining-data "
                        "pipeline: dedup -> split -> decontaminate -> "
                        "quality filter -> pack")
    pt.add_argument("--input", required=True)
    pt.add_argument("--output", required=True)
    pt.add_argument("--pack-budget", type=int, default=512)
    pt.set_defaults(fn=cmd_pretrain)

    h = sub.add_parser("report", help="TP/FP/FN examples HTML report")
    h.add_argument("--pred", required=True)
    h.add_argument("--gt-convs", type=int, required=True)
    h.add_argument("--output", required=True)
    h.add_argument("--limit", type=int, default=50)
    h.set_defaults(fn=cmd_report)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
