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

import numpy as np
import pandas as pd
import pyarrow as pa


def _round_half_away(x, decimals: int = 6):
    """DuckDB ``round()`` rounds half away from zero; Python/numpy
    round half to even. Rounded engine outputs are often exact
    rationals (integer tp/fp/fn counts, count ratios), so 6-decimal
    ties are REAL — e.g. precision = 1/128 = 0.0078125 → 0.007813
    (DuckDB) vs 0.007812 (banker's). Mirror DuckDB wherever rounded
    values feed oracle comparisons or output hashes. Scalar in →
    float out; array in → float64 array out. (Single definition —
    ``pipelines/queries/_shared`` re-exports this one.)"""
    x = np.asarray(x, dtype=np.float64)
    s = 10.0 ** decimals
    out = np.copysign(np.floor(np.abs(x) * s + 0.5), x) / s
    return float(out) if out.ndim == 0 else out


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


def pred_structures_from_scored(scored: pd.DataFrame) -> dict:
    """Scored-doc rows → per-conv predicted structures under the
    chunk-invariant mention identity (turn, within-turn word span).

    Chunked long convs emit per-chunk clusters; chunks of one conv are
    closed under the same canonical-representative linking the triple
    canonicalization stage uses (normalized surface + type), so the
    conv-level cluster identity matches what an unchunked forward pass
    would produce."""
    out: dict = {}
    cols = ["conv_id", "sent_tok_off", "m_start", "m_end", "m_sent",
            "m_turn", "m_cluster", "cl_rep", "cl_type",
            "r_head", "r_tail", "r_type"]
    for (conv, soff, ms, me, msent, mturn, mcl, reps, ctypes,
         rh, rt, rt2) in zip(*(scored[c] for c in cols)):
        st = out.setdefault(conv, {"mentions": set(), "clusters": {},
                                   "cl_types": {}, "relations": set()})
        soff = np.asarray(soff)
        keys = []
        for s, e, si, ti in zip(ms, me, msent, mturn):
            base = int(soff[int(si)])
            keys.append((int(ti), int(s) - base, int(e) - base))
        st["mentions"].update(keys)
        # doc-local cluster id → conv-level merge key
        ckey = [(str(r).lower(), t) for r, t in zip(reps, ctypes)]
        for span, ci in zip(keys, mcl):
            st["clusters"].setdefault(ckey[int(ci)], set()).add(span)
            st["cl_types"][ckey[int(ci)]] = ctypes[int(ci)]
        for h, t, r in zip(rh, rt, rt2):
            st["relations"].add((ckey[int(h)], ckey[int(t)], r))
    return out


def joint_level_tuples(scored: pd.DataFrame, gt: dict) -> tuple:
    """Shared derivation for ``joint_metrics`` and its SQL-oracle side
    tables: per-conv ground-truth / predicted tuple lists at all five
    levels. Returns ``(convs, levels)`` where ``levels`` maps level
    name → (gt_docs, pred_docs)."""
    pred = pred_structures_from_scored(scored)
    convs = sorted(gt)

    def pred_of(c):
        return pred.get(c, {"mentions": set(), "clusters": {},
                            "cl_types": {}, "relations": set()})

    def cl_fs(st):
        return {k: frozenset(v) for k, v in st["clusters"].items()}

    g_m = [list(gt[c]["mentions"]) for c in convs]
    p_m = [list(pred_of(c)["mentions"]) for c in convs]
    g_c = [list(map(frozenset, gt[c]["clusters"])) for c in convs]
    p_c = [list(cl_fs(pred_of(c)).values()) for c in convs]
    g_e = [[(frozenset(cl), ty) for cl, ty in gt[c]["entities"]]
           for c in convs]
    p_e = [[(fs, pred_of(c)["cl_types"][k])
            for k, fs in cl_fs(pred_of(c)).items()] for c in convs]
    g_r, p_r, g_rn, p_rn = [], [], [], []
    for c in convs:
        g_r.append([(frozenset(h), frozenset(t), r)
                    for h, _ht, t, _tt, r in gt[c]["relations"]])
        g_rn.append([(frozenset(h), ht, frozenset(t), tt, r)
                     for h, ht, t, tt, r in gt[c]["relations"]])
        st = pred_of(c)
        fs = cl_fs(st)
        p_r.append([(fs[h], fs[t], r) for h, t, r in st["relations"]])
        p_rn.append([(fs[h], st["cl_types"][h], fs[t],
                      st["cl_types"][t], r)
                     for h, t, r in st["relations"]])
    return convs, {"mention": (g_m, p_m), "coref": (g_c, p_c),
                   "entity": (g_e, p_e), "relation": (g_r, p_r),
                   "rel_nec": (g_rn, p_rn)}


def joint_metrics(scored: pd.DataFrame, gt: dict) -> pd.DataFrame:
    """The reference's joint evaluation tables (mention, coreference,
    typed-entity, relation, strict rel_nec — ``joint_evaluator.py``)
    over a whole corpus: micro P/R/F1 per level, plus per-type macro
    for the typed levels. ``gt`` comes from
    ``ground_truth_structures``; convs absent from predictions (e.g.
    filler-only) count as empty documents."""
    _, lv = joint_level_tuples(scored, gt)
    g_m, p_m = lv["mention"]
    g_c, p_c = lv["coref"]
    g_e, p_e = lv["entity"]
    g_r, p_r = lv["relation"]
    g_rn, p_rn = lv["rel_nec"]

    rows = []

    def add(level, avg, m):
        rows.append({"level": level, "average": avg,
                     "precision": _round_half_away(m["precision"]),
                     "recall": _round_half_away(m["recall"]),
                     "f1": _round_half_away(m["f1"]),
                     # macro averages carry no meaningful counts
                     "tp": int(m.get("tp", -1)),
                     "fp": int(m.get("fp", -1)),
                     "fn": int(m.get("fn", -1))})

    add("mention", "micro", score_documents_micro(g_m, p_m))
    add("coref", "micro", score_documents_micro(g_c, p_c))
    add("entity", "micro", score_documents_micro(g_e, p_e))
    add("entity", "macro",
        score_documents_macro(g_e, p_e, type_of=lambda e: e[1]))
    add("relation", "micro", score_documents_micro(g_r, p_r))
    add("relation", "macro",
        score_documents_macro(g_r, p_r, type_of=lambda r: r[2]))
    add("rel_nec", "micro", score_documents_micro(g_rn, p_rn))
    return pd.DataFrame(rows)
