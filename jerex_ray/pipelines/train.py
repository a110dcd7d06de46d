"""Distributed training objective: the full reference train path as a
Ray Data pipeline (T11 orchestration).

Per document, inside one actor-pool stage (GT broadcast once per
actor, model weights built once per actor):

    sample_document  (T1–T9: pos/neg mentions, coref pairs, entities,
                      relations, mention-pair structures)
      → tensorize_document  (T10 placeholder-row tensors)
      → forward_train       (J1–J9/J10 head math over the samples)
      → joint_loss          (G4 masked objective, loss.py:11-88)

emitting one loss row per document; the corpus objective is a
combiner-aggregate mean. This is the Ray Data shape of the reference's
DataLoader + LightningModule.training_step
(``/root/reference/jerex/model.py:107-135``) — an actual optimizer
loop would wrap it in Ray Train, swapping joint_loss for a backward
pass; everything up to the loss is shared.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from jerex_ray.config import PipelineConfig
from jerex_ray.types import DEFAULT_TYPES, TypeVocabulary


class TrainingLossStage:
    """Actor-pool UDF: tokenized docs + broadcast GT → per-doc losses."""

    def __init__(self, gt_ref, *, types: TypeVocabulary | None = None,
                 config: PipelineConfig | None = None,
                 variant: str = "multi_instance", seed: int = 13, **knobs):
        import ray

        from jerex_ray.stages.numpy_scorer import NumpyScorer
        # gt_ref=None → co-located mode: GT arrives as per-doc packed
        # list columns on the batch itself (``attach_gt``), nothing is
        # broadcast. Otherwise: conv → (mentions, relations, cl_types)
        self._gt = None if gt_ref is None else ray.get(gt_ref)
        self.types = types or DEFAULT_TYPES
        self.config = config or PipelineConfig()
        self.scorer = NumpyScorer(self.config, variant=variant, seed=seed,
                                  types=self.types)
        self.knobs = knobs

    def _doc_steps(self, batch: pa.Table):
        """Yield (conv_id, doc_id, sample, step_kwargs) per document,
        iterating the Arrow lists via flat values + offsets (zero-copy
        numeric slices; no pandas conversion, no iterrows) — same
        pattern as RuleScorer.__call__."""
        from jerex_ray.stages.sampling import sample_document
        from jerex_ray.util import \
            arrow_flat_with_offsets as flat_with_offsets

        rel_types = list(self.types.relation_index)

        phrase_vals, phrase_offs = flat_with_offsets(batch["tok_phrase"])
        sent_vals, sent_offs = flat_with_offsets(batch["tok_sent"], np.int32)
        soff_vals, soff_offs = flat_with_offsets(batch["sent_tok_off"],
                                                 np.int32)
        enc_vals, enc_offs = flat_with_offsets(batch["encoding"], np.int32)
        ss_vals, ss_offs = flat_with_offsets(batch["tok_sub_start"], np.int64)
        se_vals, se_offs = flat_with_offsets(batch["tok_sub_end"], np.int64)
        conv_ids = batch["conv_id"].to_pylist()
        doc_ids = batch["doc_id"].to_pylist()
        gt_rows = (None if self._gt is not None
                   else parse_gt_columns(batch, self.types))

        for d in range(batch.num_rows):
            conv, doc_id = conv_ids[d], doc_ids[d]
            if gt_rows is not None:
                gt_m, gt_r, cl_types = gt_rows[d]
            else:
                # GT coordinates are DOC-scoped: a conversation chunked
                # at the 700-sub-word ceiling has per-chunk sentence/
                # cluster indices, so lookup is by doc_id first (silver
                # GT is emitted per chunk); plain conv_id works for
                # unchunked externally-annotated corpora
                gt_m, gt_r, cl_types = self._gt.get(
                    doc_id, self._gt.get(conv, ([], [], [])))
            sample = sample_document(
                conv_id=conv,
                phrases=phrase_vals[phrase_offs[d]:phrase_offs[d + 1]]
                .tolist(),
                tok_sent=sent_vals[sent_offs[d]:sent_offs[d + 1]],
                sent_tok_off=soff_vals[soff_offs[d]:soff_offs[d + 1]],
                gt_mentions=gt_m, gt_relations=gt_r,
                relation_types=rel_types, **self.knobs)
            yield conv, doc_id, sample, {
                "encoding": enc_vals[enc_offs[d]:enc_offs[d + 1]],
                "sub_start": ss_vals[ss_offs[d]:ss_offs[d + 1]],
                "sub_end": se_vals[se_offs[d]:se_offs[d + 1]],
                "entity_type_targets": cl_types,
            }

    def __call__(self, batch: pa.Table) -> pa.Table:
        from jerex_ray.stages.numpy_scorer import training_step

        out = {k: [] for k in ("conv_id", "doc_id", "loss", "mention_loss",
                               "coref_loss", "entity_loss", "rel_loss")}
        if batch.num_rows == 0 or "tok_phrase" not in batch.column_names:
            # schema-less empty block from the co-location merge
            return pa.table({
                "conv_id": pa.array([], pa.string()),
                "doc_id": pa.array([], pa.string()),
                **{k: pa.array([], pa.float64())
                   for k in ("loss", "mention_loss", "coref_loss",
                             "entity_loss", "rel_loss")}})
        for conv, doc_id, sample, kw in self._doc_steps(batch):
            losses = training_step(self.scorer, sample=sample, **kw)
            out["conv_id"].append(conv)
            out["doc_id"].append(doc_id)
            for k in ("loss", "mention_loss", "coref_loss", "entity_loss",
                      "rel_loss"):
                out[k].append(float(losses.get(k, 0.0)))
        return pa.table({
            "conv_id": pa.array(out["conv_id"], pa.string()),
            "doc_id": pa.array(out["doc_id"], pa.string()),
            **{k: pa.array(out[k], pa.float64())
               for k in ("loss", "mention_loss", "coref_loss",
                         "entity_loss", "rel_loss")},
        })


class TrainingGradStage(TrainingLossStage):
    """Actor-pool UDF for one SYNCHRONOUS data-parallel training step:
    per document, cached forward → joint masked loss → analytic
    backward over the head parameters; the batch's gradients and
    losses are pre-reduced inside the actor (the combiner pattern) and
    emitted as ONE flat row — only #batches tiny rows reach the
    reducer, never per-doc gradient tensors. ``weights_ref`` broadcasts
    the current weights once per actor per step."""

    def __init__(self, gt_ref, *, weights_ref=None, **kwargs):
        super().__init__(gt_ref, **kwargs)
        if weights_ref is not None:
            import ray
            self.scorer.set_weights(ray.get(weights_ref))

    def __call__(self, batch: pa.Table) -> pa.Table:
        from jerex_ray.stages.numpy_scorer import (flatten_grads,
                                                   training_step_grads)

        grad_sum = None
        loss_sums = {k: 0.0 for k in ("loss", "mention_loss", "coref_loss",
                                      "entity_loss", "rel_loss")}
        n = 0
        empty = (batch.num_rows == 0
                 or "tok_phrase" not in batch.column_names)
        for conv, doc_id, sample, kw in \
                (() if empty else self._doc_steps(batch)):
            losses, grads = training_step_grads(self.scorer, sample=sample,
                                                **kw)
            flat = flatten_grads(grads)
            grad_sum = flat if grad_sum is None else grad_sum + flat
            for k in loss_sums:
                loss_sums[k] += float(losses.get(k, 0.0))
            n += 1
        if grad_sum is None:
            from jerex_ray.stages.numpy_scorer import _zero_grads
            grad_sum = flatten_grads(_zero_grads(self.scorer))
        return pa.table({
            "n_docs": pa.array([n], pa.int64()),
            **{k + "_sum": pa.array([loss_sums[k]], pa.float64())
               for k in loss_sums},
            "grad": pa.array([grad_sum.tolist()],
                             pa.list_(pa.float64())),
        })


def _doc_gt_struct(m_rows, r_rows, types: TypeVocabulary):
    """One document's raw GT rows → the (mentions, relations,
    cl_types) structure ``sample_document`` consumes — CANONICALLY
    ordered (mentions by (sent, start, end, cluster), relations by
    (head, tail, pred)) so the broadcast-dict and hash-join paths
    produce bit-identical samples regardless of shuffle row order.

    ``m_rows``: iterable of (cluster, sent_id, start, end, type|None);
    ``r_rows``: iterable of (head, tail, pred). Cluster type = first
    mention's type in canonical order (``datasets.py:126-128``)."""
    m_sorted = sorted(m_rows, key=lambda t: (t[1], t[2], t[3], t[0],
                                             t[4] or ""))
    mentions = [(int(c), int(s), int(a), int(b))
                for c, s, a, b, _ in m_sorted]
    cl_first: dict[int, str] = {}
    for c, _s, _a, _b, ty in m_sorted:
        if ty is not None:
            cl_first.setdefault(int(c), ty)
    cl_ids = sorted({m[0] for m in mentions})
    cl_types = [types.entity_id(cl_first[c])
                if c in cl_first and cl_first[c] in types.entity_types
                else 0
                for c in cl_ids]
    relations = sorted((int(h), int(t), p) for h, t, p in r_rows)
    return mentions, relations, cl_types


def build_gt_dict(gt_mentions: pa.Table, gt_relations: pa.Table,
                  types: TypeVocabulary | None = None) -> dict:
    """GT tables → conv_id-keyed dict the stage broadcasts (the
    SMALL-GT fast path; corpus-sized GT goes through ``attach_gt``).

    ``gt_mentions``: (conv_id, cluster, sent_id, start, end[,
    entity_type]); ``gt_relations``: (conv_id, head, tail, pred)."""
    types = types or DEFAULT_TYPES
    raw: dict = {}

    mdf = gt_mentions.to_pandas()
    has_type = "entity_type" in mdf.columns
    for conv, g in mdf.groupby("conv_id", sort=False):
        tys = g["entity_type"] if has_type else [None] * len(g)
        raw[conv] = [list(zip(g["cluster"], g["sent_id"], g["start"],
                              g["end"], tys)), []]
    rdf = gt_relations.to_pandas()
    for conv, g in rdf.groupby("conv_id", sort=False):
        raw.setdefault(conv, [[], []])
        raw[conv][1] = list(zip(g["head"], g["tail"], g["pred"]))
    return {conv: _doc_gt_struct(m, r, types)
            for conv, (m, r) in raw.items()}


GT_PACK_COLS = ["gt_m_cluster", "gt_m_sent", "gt_m_start", "gt_m_end",
                "gt_m_type", "gt_r_head", "gt_r_tail", "gt_r_pred"]

_GT_PACK_SCHEMA = pa.schema(
    [("gt_key", pa.string())]
    + [(c, pa.list_(pa.string() if c in ("gt_m_type", "gt_r_pred")
                    else pa.int64())) for c in GT_PACK_COLS])


def parse_gt_columns(batch: pa.Table, types: TypeVocabulary) -> list:
    """Per-row GT from the packed list columns ``attach_gt`` joined
    onto the batch → list of (mentions, relations, cl_types) per doc.
    Docs without GT (null lists from the left-outer join) get the
    empty structure."""
    n = batch.num_rows
    if not all(c in batch.column_names for c in GT_PACK_COLS):
        return [([], [], [])] * n
    data = {c: batch[c].to_pylist() for c in GT_PACK_COLS}
    out = []
    for d in range(n):
        mc = data["gt_m_cluster"][d] or []
        ms = data["gt_m_sent"][d] or []
        ma = data["gt_m_start"][d] or []
        mb = data["gt_m_end"][d] or []
        mt = data["gt_m_type"][d] or [None] * len(mc)
        rh = data["gt_r_head"][d] or []
        rt = data["gt_r_tail"][d] or []
        rp = data["gt_r_pred"][d] or []
        out.append(_doc_gt_struct(zip(mc, ms, ma, mb, mt),
                                  zip(rh, rt, rp), types))
    return out


def _rows_to_ipc_blobs(t: pa.Table) -> tuple[list[bytes], int]:
    """Each row → ``schema_bytes + record_batch_body`` so wide jagged
    doc rows can ride a NARROW uniform shuffle schema — Acero
    (``Dataset.join``) rejects list-typed payload columns outright,
    and a heterogeneous union breaks hash-shuffle finalize. Batched
    IPC framing: the schema is serialized ONCE per input batch and the
    per-row payload is just the record-batch message (read back with
    ``pa.ipc.read_record_batch`` against a memoized schema — ~2.5×
    faster per doc than a full ``pa.ipc.open_stream`` per blob).
    Returns (blobs, schema_prefix_len)."""
    sch = t.schema.serialize().to_pybytes()
    out = []
    for b in t.to_batches():
        for i in range(b.num_rows):
            out.append(sch + b.slice(i, 1).serialize().to_pybytes())
    return out, len(sch)


class _GtMatchCounter:
    """Tiny driver-owned actor the co-location merge reports GT match
    counts to — a conv-keyed external GT over a chunked corpus
    (doc_id != conv_id) would otherwise silently attach ZERO ground
    truth and train with no loss signal."""

    def __init__(self):
        self.matched = 0
        self.dropped = 0

    def add(self, matched: int, dropped: int) -> None:
        self.matched += matched
        self.dropped += dropped

    def totals(self) -> tuple[int, int]:
        return self.matched, self.dropped


def _check_gt_match(counter) -> None:
    """Raise if the co-location merge dropped EVERY GT row (key
    mismatch — e.g. conv-keyed GT against chunked doc ids); a partial
    drop (GT for docs outside this corpus subset) is legitimate."""
    import ray
    matched, dropped = ray.get(counter.totals.remote())
    if matched == 0 and dropped > 0:
        raise ValueError(
            f"attach_gt matched 0 of {dropped} GT rows — the GT key "
            "column does not match the docs' doc_id (a conv-keyed "
            "external GT over a chunked corpus?). Pass "
            "gt_key='conv_id' to co-locate on conversation ids, or "
            "re-key the GT per chunk.")


def attach_gt(tokenized_ds, gt_m_ds, gt_r_ds, *,
              num_partitions: int | None = None,
              gt_key: str = "doc_id", match_counter=None):
    """Hash-join co-location of GT rows against tokenized docs on
    doc id — the SCALE path for corpus-sized GT (silver distillation
    generates GT from the corpus itself, so at 100× the broadcast
    dict becomes an unbounded driver materialization). Nothing GT- or
    corpus-sized touches the driver, and there is exactly ONE
    all-to-all exchange:

    1. Docs, GT mention rows and GT relation rows are tagged into ONE
       narrow uniform schema (key, side, blob, 4 ints, 1 string); the
       wide jagged doc row travels as its 1-row Arrow-IPC blob.
    2. One hash co-location on the key (``grouped_apply``) puts every
       doc next to its GT rows (silver GT is doc/chunk-keyed, and
       unchunked external corpora have doc_id == conv_id).
    3. The per-block merge reconstructs the doc rows zero-copy from
       their IPC blobs and appends the 8 ``GT_PACK_COLS`` list
       columns; docs without GT get empty lists. No further shuffle
       touches the (list-columned) output — it feeds the loss stage
       directly.

    ``gt_key`` names the DOC column the GT's conv_id values key on
    (default ``doc_id``; pass ``conv_id`` for a conv-keyed external
    GT over a chunked corpus — the join analogue of the broadcast
    path's doc_id→conv_id fallback). ``match_counter`` (a
    ``_GtMatchCounter`` actor handle) receives per-block
    (matched, dropped) GT row counts so callers can detect an
    all-dropped key mismatch after consumption."""
    from jerex_ray.functions.aggregate import grouped_apply
    from jerex_ray.runtime import configure_data_context, \
        shuffle_partitions
    configure_data_context(ds=tokenized_ds)

    def _narrow(key, side, n, **over):
        base = {
            "gt_key": pa.array(key, pa.string()),
            "side": pa.array(np.full(n, side, dtype=np.int8)),
            "blob": pa.array(over.pop("blob", [b""] * n), pa.binary()),
            "ia": pa.array(over.pop("ia", np.zeros(n, np.int64))),
            "ib": pa.array(over.pop("ib", np.zeros(n, np.int64))),
            "ic": pa.array(over.pop("ic", np.zeros(n, np.int64))),
            "idd": pa.array(over.pop("idd", np.zeros(n, np.int64))),
            "s": pa.array(over.pop("s", [""] * n), pa.string()),
        }
        return pa.table(base)

    def tag_docs(t: pa.Table) -> pa.Table:
        if gt_key not in t.column_names:
            # an explicit-but-missing key must fail loudly, not
            # silently fall back and surface later as a confusing
            # zero-GT-match error
            raise KeyError(
                f"attach_gt: gt_key column {gt_key!r} is not in the "
                f"tokenized doc schema {t.column_names}")
        blobs, sch_len = _rows_to_ipc_blobs(t)
        return _narrow(t[gt_key].to_pylist(), 0, t.num_rows,
                       blob=blobs,
                       ia=np.full(t.num_rows, sch_len, np.int64))

    def tag_m(t: pa.Table) -> pa.Table:
        has_type = "entity_type" in t.column_names
        return _narrow(
            t["conv_id"].to_pylist(), 1, t.num_rows,
            ia=t["cluster"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            ib=t["sent_id"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            ic=t["start"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            idd=t["end"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            s=(t["entity_type"].to_pylist() if has_type
               else [""] * t.num_rows))

    def tag_r(t: pa.Table) -> pa.Table:
        return _narrow(
            t["conv_id"].to_pylist(), 2, t.num_rows,
            ia=t["head"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            ib=t["tail"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            s=t["pred"].to_pylist())

    tagged = tokenized_ds.map_batches(tag_docs, batch_format="pyarrow") \
        .union(gt_m_ds.map_batches(tag_m, batch_format="pyarrow")) \
        .union(gt_r_ds.map_batches(tag_r, batch_format="pyarrow"))

    def merge(block: pd.DataFrame) -> pa.Table:
        if block.empty or "side" not in block.columns:
            return pa.table({})
        doc_tables, gt_cols = [], {c: [] for c in GT_PACK_COLS}
        n_matched = n_dropped = 0
        sch_cache: dict[bytes, pa.Schema] = {}
        for _key, g in block.groupby("gt_key", sort=False):
            docs = g[g["side"] == 0]
            n_gt = int((g["side"] != 0).sum())
            if docs.empty:
                n_dropped += n_gt  # GT for a doc not in this corpus
                continue
            n_matched += n_gt
            m = g[g["side"] == 1]
            r = g[g["side"] == 2]
            for blob, sch_len in zip(docs["blob"], docs["ia"]):
                sb = blob[:sch_len]
                sch = sch_cache.get(sb)
                if sch is None:
                    sch = pa.ipc.read_schema(pa.py_buffer(sb))
                    sch_cache[sb] = sch
                doc_tables.append(pa.Table.from_batches(
                    [pa.ipc.read_record_batch(
                        pa.py_buffer(blob[sch_len:]), sch)]))
                gt_cols["gt_m_cluster"].append(m["ia"].tolist())
                gt_cols["gt_m_sent"].append(m["ib"].tolist())
                gt_cols["gt_m_start"].append(m["ic"].tolist())
                gt_cols["gt_m_end"].append(m["idd"].tolist())
                gt_cols["gt_m_type"].append(m["s"].tolist())
                gt_cols["gt_r_head"].append(r["ia"].tolist())
                gt_cols["gt_r_tail"].append(r["ib"].tolist())
                gt_cols["gt_r_pred"].append(r["s"].tolist())
        if match_counter is not None and (n_matched or n_dropped):
            # synchronous: a fire-and-forget add could still be in
            # flight when the driver reads totals after materialize(),
            # letting the all-dropped guard fail open (or a healthy
            # run trip it). One actor RTT per merged block is noise.
            import ray
            ray.get(match_counter.add.remote(n_matched, n_dropped))
        if not doc_tables:
            return pa.table({})
        out = pa.concat_tables(doc_tables, promote_options="default")
        for name in GT_PACK_COLS:
            if name in out.column_names:   # idempotent re-attach
                out = out.drop_columns([name])
            out = out.append_column(
                pa.field(name, _GT_PACK_SCHEMA.field(name).type),
                pa.array(gt_cols[name],
                         _GT_PACK_SCHEMA.field(name).type))
        return out

    np_ = shuffle_partitions(num_partitions)
    return grouped_apply(tagged, ["gt_key"], merge,
                         num_partitions=np_)


def _gt_input_mode(gt_mentions, gt_relations, broadcast_rows):
    """Pick the GT delivery path: arrow tables under the row budget
    broadcast (fast path); Datasets or over-budget tables co-locate
    via ``attach_gt`` (nothing GT-sized on the driver)."""
    import ray.data
    is_tbl = isinstance(gt_mentions, pa.Table)
    if is_tbl and (gt_mentions.num_rows + gt_relations.num_rows
                   <= broadcast_rows):
        return "broadcast", gt_mentions, gt_relations
    if is_tbl:
        return ("join", ray.data.from_arrow(gt_mentions),
                ray.data.from_arrow(gt_relations))
    return "join", gt_mentions, gt_relations


def training_objective(tokenized_ds, gt_mentions,
                       gt_relations, *,
                       types: TypeVocabulary | None = None,
                       config: PipelineConfig | None = None,
                       variant: str = "multi_instance", seed: int = 13,
                       concurrency=(1, 4),
                       gt_broadcast_rows: int = 500_000,
                       num_partitions: int | None = None,
                       gt_key: str = "doc_id", **knobs):
    """tokenized docs + GT tables → (per-doc loss Dataset,
    corpus-mean loss DataFrame). The mean is a combiner aggregate
    (one row), per-doc losses stream.

    GT arrives either as arrow tables (≤ ``gt_broadcast_rows`` rows:
    broadcast once via ``ray.put``, the annotated-corpus fast path) or
    as Datasets / over-budget tables: then the GT rows are
    hash-join co-located with the tokenized docs on doc id
    (``attach_gt``) and NEVER pass through the driver — the
    silver-distillation scale path where GT is corpus-sized."""
    import ray

    from jerex_ray.functions.aggregate import grouped_aggregate

    mode, gt_m, gt_r = _gt_input_mode(gt_mentions, gt_relations,
                                      gt_broadcast_rows)
    if mode == "broadcast":
        gt_ref = ray.put(build_gt_dict(gt_m, gt_r, types))
        stage_in = tokenized_ds
        counter = None
    else:
        gt_ref = None
        counter = ray.remote(num_cpus=0)(_GtMatchCounter).remote()
        stage_in = attach_gt(tokenized_ds, gt_m, gt_r,
                             num_partitions=num_partitions,
                             gt_key=gt_key, match_counter=counter)
    per_doc = stage_in.map_batches(
        TrainingLossStage, batch_format="pyarrow", batch_size=64,
        concurrency=concurrency,
        fn_constructor_kwargs={"gt_ref": gt_ref, "types": types,
                               "config": config, "variant": variant,
                               "seed": seed, **knobs})
    per_doc = per_doc.materialize()
    if counter is not None:
        _check_gt_match(counter)
        ray.kill(counter)
    mean = grouped_aggregate(
        per_doc.map_batches(lambda df: df.assign(__all=0),
                            batch_format="pandas"),
        ["__all"],
        {k: (k, "mean") for k in ("loss", "mention_loss", "coref_loss",
                                  "entity_loss", "rel_loss")}).to_pandas()
    mean = mean.drop(columns=["__all"])
    mean.insert(0, "n_docs", per_doc.count())
    return per_doc, mean


def _save_train_checkpoint(ckpt_dir: str, ep: int, weights: dict,
                           opt, hist: dict) -> str:
    """Atomically write one epoch's full training state: weights,
    AdamW moments + step counter, and the loss history so far —
    everything a resumed run needs to reproduce the uninterrupted
    history bit-for-bit (same manifest write-then-rename discipline
    as the parquet sink)."""
    import os
    os.makedirs(ckpt_dir, exist_ok=True)
    arrs = {"t": np.int64(opt.t), "epoch": np.int64(ep)}
    for n, w in weights.items():
        arrs["w__" + n] = w
    for n, m in opt.m.items():
        arrs["m__" + n] = m
    for n, v in opt.v.items():
        arrs["v__" + n] = v
    for k, vals in hist.items():
        arrs["h__" + k] = np.asarray(vals)
    path = os.path.join(ckpt_dir, f"epoch-{ep}.npz")
    tmp = os.path.join(ckpt_dir, f".epoch-{ep}.npz.tmp")
    with open(tmp, "wb") as f:
        np.savez(f, **arrs)
    os.replace(tmp, path)
    return path


def _load_latest_train_checkpoint(ckpt_dir: str):
    """Newest complete epoch checkpoint in ``ckpt_dir`` (atomic
    renames mean every ``epoch-*.npz`` present is complete), or
    None."""
    import glob
    import os
    import re
    files = glob.glob(os.path.join(ckpt_dir, "epoch-*.npz"))
    if not files:
        return None
    latest = max(files, key=lambda p: int(
        re.search(r"epoch-(\d+)\.npz$", p).group(1)))
    return np.load(latest, allow_pickle=False)


def train_epochs(tokenized_ds, gt_mentions,
                 gt_relations, *, epochs: int = 3,
                 lr: float = 5e-5, weight_decay: float = 0.01,
                 warmup_ratio: float = 0.1,
                 types: TypeVocabulary | None = None,
                 config: PipelineConfig | None = None,
                 variant: str = "multi_instance", seed: int = 13,
                 concurrency=(1, 4), resample_per_epoch: bool = True,
                 gt_broadcast_rows: int = 500_000,
                 num_partitions: int | None = None,
                 checkpoint_dir: str | None = None,
                 gt_key: str = "doc_id",
                 **knobs):
    """Synchronous data-parallel training of the HEAD parameters: per
    epoch, every document's analytic gradient is computed in the actor
    pool (pre-reduced per batch), summed in one tiny aggregate, and
    applied by driver-side AdamW under the reference's linear
    warmup/decay schedule (``model.py:188-204``, lr/decay defaults
    ``configs.py:88-92``); updated weights broadcast via ``ray.put``
    for the next epoch. ``resample_per_epoch`` re-seeds the negative
    samplers each epoch, mirroring the reference's fresh sampled
    dataset per epoch (``data_module.py:114-127``). The frozen encoder stand-in mirrors the
    reference's BERT-vs-heads split. Returns (history DataFrame with
    the per-epoch corpus-mean loss BEFORE each update, trained
    weights dict).

    ``checkpoint_dir`` enables epoch-level checkpoint/resume
    (reference ``model.py:320-323`` checkpoints per epoch; best-k
    selection stays a consumer choice since every epoch file is
    kept): after each update the weights, AdamW moments + step
    counter, and loss history are written atomically to
    ``epoch-<k>.npz``; a rerun with the same ``checkpoint_dir``
    restores the newest one and continues, reproducing the
    uninterrupted loss history bit-for-bit (gradients depend only on
    restored weights + the epoch index)."""
    import ray

    from jerex_ray.functions.optim import AdamW
    from jerex_ray.stages.numpy_scorer import (TRAINABLE, NumpyScorer,
                                               unflatten_grads)

    mode, gt_m, gt_r = _gt_input_mode(gt_mentions, gt_relations,
                                      gt_broadcast_rows)
    if mode == "broadcast":
        gt_ref = ray.put(build_gt_dict(gt_m, gt_r, types))
        epoch_ds = tokenized_ds
    else:
        # corpus-sized GT: join it onto the tokenized blocks ONCE;
        # the epoch loop then re-reads GT-carrying blocks and the
        # workers parse GT from columns — nothing broadcast
        gt_ref = None
        gt_counter = ray.remote(num_cpus=0)(_GtMatchCounter).remote()
        epoch_ds = attach_gt(tokenized_ds, gt_m, gt_r,
                             num_partitions=num_partitions,
                             gt_key=gt_key, match_counter=gt_counter)
    template = NumpyScorer(config or PipelineConfig(), variant=variant,
                           seed=seed, types=types)
    weights = template.get_weights(TRAINABLE)
    opt = AdamW(weights, lr=lr, weight_decay=weight_decay,
                warmup=int(warmup_ratio * epochs), total=epochs)
    # epoch cache: materialize once so epochs re-read object-store
    # blocks (spilling to disk if needed) instead of re-running
    # assembly+tokenization per epoch. For corpora far beyond the
    # object store, write the tokenized table to parquet once and pass
    # `read_parquet(...)` here — each epoch then streams from storage.
    blocks = epoch_ds.materialize().to_arrow_refs()
    if gt_ref is None:
        _check_gt_match(gt_counter)
        ray.kill(gt_counter)

    # PERSISTENT raw-actor fleet (the Dataset API would re-create its
    # actor pool every epoch — an iterative algorithm is the one place
    # the brief's "drop to raw actors" escape hatch applies): workers
    # build GT + scorer once; per epoch only the weight dict ships
    worker_cls = ray.remote(num_cpus=1)(_GradWorker)
    if isinstance(concurrency, tuple):
        n_workers = concurrency[-1]
    else:
        n_workers = concurrency or 4
    n_workers = max(1, min(n_workers, max(len(blocks), 1)))
    # box the GT ref: a top-level ObjectRef argument would be
    # auto-resolved by Ray, but the stage broadcasts the REF itself
    workers = [worker_cls.remote([gt_ref], types=types, config=config,
                                 variant=variant, seed=seed, **knobs)
               for _ in range(n_workers)]

    hist = {"epoch": [], "n_docs": [], "loss": [], "mention_loss": [],
            "coref_loss": [], "entity_loss": [], "rel_loss": [], "lr": []}
    loss_keys = ("loss", "mention_loss", "coref_loss", "entity_loss",
                 "rel_loss")
    start_ep = 0
    if checkpoint_dir:
        ck = _load_latest_train_checkpoint(checkpoint_dir)
        if ck is not None:
            for n in weights:
                weights[n][...] = ck["w__" + n]
                opt.m[n][...] = ck["m__" + n]
                opt.v[n][...] = ck["v__" + n]
            opt.t = int(ck["t"])
            start_ep = int(ck["epoch"]) + 1
            for k in hist:
                hist[k] = ck["h__" + k].tolist()
    try:
        for ep in range(start_ep, epochs):
            wref = ray.put({n: w.copy() for n, w in weights.items()})
            futures = [workers[i % n_workers].grads.remote(
                blocks[i], wref, ep if resample_per_epoch else 0)
                for i in range(len(blocks))]
            results = ray.get(futures)
            n = sum(r[0] for r in results)
            if n == 0:
                break
            grad = np.sum([r[2] for r in results if r[0]], axis=0) / n
            hist["epoch"].append(ep)
            hist["n_docs"].append(n)
            for k in loss_keys:
                hist[k].append(sum(r[1][k] for r in results) / n)
            hist["lr"].append(opt.step(unflatten_grads(grad, template)))
            if checkpoint_dir:
                _save_train_checkpoint(checkpoint_dir, ep, weights,
                                       opt, hist)
    finally:
        for w in workers:
            ray.kill(w)
    return pd.DataFrame(hist), weights


class _GradWorker:
    """Long-lived training worker: GT dict + scorer built once; each
    ``grads`` call scores one tokenized block under the given weights
    and returns its pre-reduced (n_docs, loss sums, gradient sum)."""

    def __init__(self, gt_ref_box, **stage_kwargs):
        self.stage = TrainingGradStage(gt_ref_box[0], **stage_kwargs)

    def grads(self, block: pa.Table, weights: dict, epoch: int):
        self.stage.scorer.set_weights(weights)
        self.stage.knobs["epoch"] = epoch
        out = self.stage(block)
        n = int(out["n_docs"][0].as_py())
        loss_sums = {k: float(out[k + "_sum"][0].as_py())
                     for k in ("loss", "mention_loss", "coref_loss",
                               "entity_loss", "rel_loss")}
        grad = np.asarray(out["grad"][0].as_py(), dtype=np.float64)
        return n, loss_sums, grad


def _explode_gt_mentions(batch: pa.Table) -> pa.Table:
    """Scored docs → silver GT mention rows, vectorized with pyarrow
    list offsets + numpy gathers (no per-row Python). Coordinates are
    re-based to sentence-relative via the passthrough ``sent_tok_off``
    column; GT is keyed by DOC id (chunk-scoped — sentence/cluster
    indices are chunk-local for conversations chunked at the
    700-sub-word ceiling)."""
    import pyarrow.compute as pc

    n_m = pc.list_value_length(batch["m_start"]) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    doc_idx = np.repeat(np.arange(len(batch["m_start"])), n_m)

    def flat(col, dtype=np.int64):
        return pc.list_flatten(batch[col]) \
            .to_numpy(zero_copy_only=False).astype(dtype)

    m_start, m_end = flat("m_start"), flat("m_end")
    m_sent, m_cluster = flat("m_sent"), flat("m_cluster")

    # sentence base offset per mention: index the flattened offsets
    soff_lens = pc.list_value_length(batch["sent_tok_off"]) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    soff_starts = np.concatenate(([0], np.cumsum(soff_lens)[:-1]))
    soff_vals = flat("sent_tok_off")
    base = soff_vals[soff_starts[doc_idx] + m_sent] \
        if len(doc_idx) else np.empty(0, np.int64)

    # cluster entity type per mention (guard out-of-range with "PER",
    # matching the driver-loop predecessor)
    cl_lens = pc.list_value_length(batch["cl_type"]) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    cl_starts = np.concatenate(([0], np.cumsum(cl_lens)[:-1]))
    cl_vals = pc.list_flatten(batch["cl_type"]).to_pylist()
    cl_vals.append("PER")
    in_range = (m_cluster >= 0) & (m_cluster < cl_lens[doc_idx]) \
        if len(doc_idx) else np.empty(0, bool)
    type_idx = np.where(in_range, cl_starts[doc_idx] + m_cluster,
                        len(cl_vals) - 1)
    etypes = [cl_vals[i] for i in type_idx]

    conv = pc.take(batch["doc_id"].combine_chunks()
                   if hasattr(batch["doc_id"], "combine_chunks")
                   else batch["doc_id"], pa.array(doc_idx))
    return pa.table({
        "conv_id": pc.cast(conv, pa.string()),
        "cluster": pa.array(m_cluster, pa.int32()),
        "sent_id": pa.array(m_sent, pa.int32()),
        "start": pa.array(m_start - base, pa.int32()),
        "end": pa.array(m_end - base, pa.int32()),
        "entity_type": pa.array(etypes, pa.string()),
    })


def _explode_gt_relations(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    n_r = pc.list_value_length(batch["r_head"]) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    doc_idx = np.repeat(np.arange(len(batch["r_head"])), n_r)
    conv = pc.take(batch["doc_id"].combine_chunks()
                   if hasattr(batch["doc_id"], "combine_chunks")
                   else batch["doc_id"], pa.array(doc_idx))
    return pa.table({
        "conv_id": pc.cast(conv, pa.string()),
        "head": pc.cast(pc.list_flatten(batch["r_head"]), pa.int32()),
        "tail": pc.cast(pc.list_flatten(batch["r_tail"]), pa.int32()),
        "pred": pc.cast(pc.list_flatten(batch["r_type"]), pa.string()),
    })


def silver_gt_from_rule_scorer(transcripts_ds,
                               config: PipelineConfig | None = None,
                               output_dir: str | None = None,
                               return_tokenized: bool = False,
                               as_datasets: bool = False):
    """Silver ground truth distilled from the frozen RuleScorer: its
    mentions/clusters/relations become the GT tables the training
    objective consumes (a distillation-style setup; real corpora
    supply annotated tables instead). Returns (gt_mentions,
    gt_relations) arrow tables with conv-level (sentence-relative)
    mention coordinates.

    The distillation is a DISTRIBUTED map_batches explode over the
    scored Dataset — the full scored corpus never materializes on the
    driver; only the GT tables (mention-table sized, the broadcast
    side of training by contract) are collected. ``output_dir`` also
    writes them as partitioned parquet (``mentions/``, ``relations/``)
    so a training run can broadcast from file instead of recomputing.
    For GT too large to broadcast, shard the training run by conv-id
    range and broadcast per shard. ``return_tokenized=True`` also
    returns the (materialized) tokenized Dataset so a training run can
    reuse it instead of re-assembling and re-tokenizing the corpus."""
    from jerex_ray.pipelines.kg import _with_part_key
    from jerex_ray.stages.assemble import assemble_documents
    from jerex_ray.stages.scorer import score_documents
    from jerex_ray.stages.tokenize import tokenize_documents

    cfg = config or PipelineConfig()
    docs = assemble_documents(_with_part_key(transcripts_ds, cfg))
    tok = tokenize_documents(docs, cfg)
    if return_tokenized:
        tok = tok.materialize()      # computed once, reused by training
    scored = score_documents(tok, cfg).materialize()

    gt_m_ds = scored.map_batches(_explode_gt_mentions,
                                 batch_format="pyarrow")
    gt_r_ds = scored.map_batches(_explode_gt_relations,
                                 batch_format="pyarrow")
    if output_dir:
        gt_m_ds.write_parquet(f"{output_dir}/mentions")
        gt_r_ds.write_parquet(f"{output_dir}/relations")
    if as_datasets:
        # corpus-scale distillation: hand the GT back as DATASETS so
        # training co-locates them via ``attach_gt`` — the driver
        # never materializes a row
        if return_tokenized:
            return gt_m_ds, gt_r_ds, tok
        return gt_m_ds, gt_r_ds

    def collect_typed(ds, schema: pa.Schema) -> pa.Table:
        # an all-empty Dataset surfaces SCHEMA-LESS through to_pandas —
        # fall back to the declared schema so consumers keep columns
        pdf = ds.to_pandas()
        if not set(schema.names) <= set(pdf.columns):
            return schema.empty_table()
        return pa.Table.from_pandas(pdf[list(schema.names)], schema=schema,
                                    preserve_index=False)

    gt_m = collect_typed(gt_m_ds, pa.schema([
        ("conv_id", pa.string()), ("cluster", pa.int32()),
        ("sent_id", pa.int32()), ("start", pa.int32()),
        ("end", pa.int32()), ("entity_type", pa.string())]))
    gt_r = collect_typed(gt_r_ds, pa.schema([
        ("conv_id", pa.string()), ("head", pa.int32()),
        ("tail", pa.int32()), ("pred", pa.string())]))
    if return_tokenized:
        return gt_m, gt_r, tok
    return gt_m, gt_r
