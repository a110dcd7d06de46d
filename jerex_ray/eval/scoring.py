"""Evaluation: micro/macro P/R/F1 with dedup-union semantics (G5–G7).

Mirrors ``/root/reference/jerex/evaluation/scoring.py:8-73``:

* per-document predicted and ground-truth tuple lists are deduplicated
  and unioned (duplicates count once — ``scoring.py:16-23``,
  README.md:62);
* flattened to binary label vectors over the union;
* micro and macro precision/recall/F1 computed over those vectors
  (the reference calls sklearn ``precision_recall_fscore_support``;
  re-derived here from counts — same definitions).

Identity rules (``conversion.py:4-10`` + SURVEY.md §5): a mention is
its word-level orig span; a cluster is a frozenset of spans; an entity
is (cluster, type); a relation is (head cluster, tail cluster, type).
For the engine's flat output, a triple is (conv_id, subj, pred, obj)
— or the strict variant including both entity types (rel_nec,
``joint_evaluator.py:100-105``).

``evaluate_triples_distributed`` is the scalable path: a hash join of
prediction and ground-truth keys (both sides arbitrary size), counting
TP/FP/FN without collecting either side to the driver.
"""

from __future__ import annotations

from collections import defaultdict

import pandas as pd
import pyarrow as pa


def _dedup(tuples):
    seen, out = set(), []
    for t in tuples:
        if t not in seen:
            seen.add(t)
            out.append(t)
    return out


def score_documents_micro(gt_docs: list[list], pred_docs: list[list]) -> dict:
    """Micro P/R/F1 over per-document tuple lists (G5 semantics).

    ``gt_docs[i]`` / ``pred_docs[i]`` are the ground-truth / predicted
    tuples of document i (hashable; duplicates counted once)."""
    assert len(gt_docs) == len(pred_docs)
    tp = fp = fn = 0
    for gt, pred in zip(gt_docs, pred_docs):
        g, p = set(_dedup(gt)), set(_dedup(pred))
        tp += len(g & p)
        fp += len(p - g)
        fn += len(g - p)
    return _prf(tp, fp, fn)


def score_documents_macro(gt_docs: list[list], pred_docs: list[list],
                          type_of) -> dict:
    """Macro P/R/F1: per-type micro scores averaged over the types seen
    in gt or pred (reference macro average over labels)."""
    per_type_tp = defaultdict(int)
    per_type_fp = defaultdict(int)
    per_type_fn = defaultdict(int)
    types = set()
    for gt, pred in zip(gt_docs, pred_docs):
        g, p = set(_dedup(gt)), set(_dedup(pred))
        for t in g & p:
            per_type_tp[type_of(t)] += 1
        for t in p - g:
            per_type_fp[type_of(t)] += 1
        for t in g - p:
            per_type_fn[type_of(t)] += 1
        types |= {type_of(t) for t in g | p}
    if not types:
        return {"precision": 0.0, "recall": 0.0, "f1": 0.0}
    scores = [_prf(per_type_tp[t], per_type_fp[t], per_type_fn[t])
              for t in sorted(types)]
    return {
        "precision": sum(s["precision"] for s in scores) / len(scores),
        "recall": sum(s["recall"] for s in scores) / len(scores),
        "f1": sum(s["f1"] for s in scores) / len(scores),
    }


def _prf(tp: int, fp: int, fn: int) -> dict:
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = (2 * precision * recall / (precision + recall)
          if precision + recall else 0.0)
    return {"precision": precision, "recall": recall, "f1": f1,
            "tp": tp, "fp": fp, "fn": fn}


TRIPLE_KEY = ["conv_id", "subj", "pred", "obj"]
TRIPLE_KEY_NEC = ["conv_id", "subj", "subj_type", "pred", "obj", "obj_type"]


def evaluate_triples(pred: pd.DataFrame, gt: pd.DataFrame,
                     strict_types: bool = False) -> dict:
    """Driver-side triple P/R (small/medium results)."""
    key = TRIPLE_KEY_NEC if strict_types else TRIPLE_KEY
    p = set(map(tuple, pred[key].values))
    g = set(map(tuple, gt[key].values))
    tp = len(p & g)
    return _prf(tp, len(p) - tp, len(g) - tp)


def evaluate_triples_distributed(pred_ds, gt_ds, *, strict_types: bool = False,
                                 num_partitions: int | None = None) -> dict:
    """Scalable triple eval: hash-join pred vs gt keys and count.

    Both sides stay distributed; only three counters reach the driver.
    """
    from jerex_ray.runtime import shuffle_partitions

    key = TRIPLE_KEY_NEC if strict_types else TRIPLE_KEY

    def keyed(label):
        def fn(t: pa.Table) -> pa.Table:
            cols = [t[k].cast(pa.string()) for k in key]
            joined = cols[0]
            import pyarrow.compute as pc
            for c in cols[1:]:
                joined = pc.binary_join_element_wise(joined, c, "\x1f")
            out = pa.table({"k": joined})
            # dedup within batch; global dedup happens via the join union
            return out.group_by("k").aggregate([]).rename_columns(["k"])
        return fn

    from jerex_ray.functions.aggregate import grouped_apply

    np_ = shuffle_partitions(num_partitions)
    # distinct keys, still distributed (per-batch combiner above bounds
    # the shuffle; co-located vectorized drop_duplicates is the global
    # dedup — no per-group Python)
    p = grouped_apply(pred_ds.map_batches(keyed("p"), batch_format="pyarrow"),
                      ["k"], lambda b: b.drop_duplicates("k"),
                      num_partitions=np_)
    g = grouped_apply(gt_ds.map_batches(keyed("g"), batch_format="pyarrow"),
                      ["k"],
                      lambda b: b.drop_duplicates("k")
                                 .rename(columns={"k": "k_gt"}),
                      num_partitions=np_)
    joined = p.join(g, join_type="inner", num_partitions=np_,
                    on=("k",), right_on=("k_gt",))
    tp = joined.count()
    n_p = p.count()
    n_g = g.count()
    return _prf(tp, n_p - tp, n_g - tp)


def evaluate_triples_evidence(pred: pd.DataFrame, gt: pd.DataFrame) -> dict:
    """Evidence-aware triple P/R: a predicted triple counts as TP only
    if its key matches AND its predicted evidence turn is one of the
    turns that actually express the relation (DocRED's evidence
    supervision translated to the joint eval — the reference parses
    evidence onto each Relation, ``datasets.py:144-159`` /
    ``entities.py:341-374``, but never scores it; this closes that
    gap). ``pred`` must carry a scalar ``evidence`` turn column,
    ``gt`` a list-valued ``evidence`` column."""
    g = {}
    for row, evs in zip(map(tuple, gt[TRIPLE_KEY].values),
                        gt["evidence"]):
        g[row] = {int(e) for e in evs}
    keys = list(map(tuple, pred[TRIPLE_KEY].values))
    evs = pred["evidence"].astype(int).tolist()
    seen = set()
    tp = 0
    for k, e in zip(keys, evs):
        if k in seen:
            continue
        seen.add(k)
        if k in g and e in g[k]:
            tp += 1
    return _prf(tp, len(seen) - tp, len(g) - tp)
