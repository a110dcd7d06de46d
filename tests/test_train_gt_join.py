"""Round-4 item 2: corpus-sized training GT is hash-join co-located
(``attach_gt``) instead of broadcast — these tests pin that the join
path produces BIT-IDENTICAL per-doc losses to the broadcast dict, that
Dataset-GT inputs never pass through a driver collect, and that
``train_epochs`` trains identically through joined blocks."""

import numpy as np
import pandas as pd
import ray.data as rd

from jerex_ray.config import PipelineConfig
from jerex_ray.pipelines.kg import _with_part_key
from jerex_ray.pipelines.train import (silver_gt_from_rule_scorer,
                                       train_epochs, training_objective)
from jerex_ray.sources.transcripts import generate_transcripts_table
from jerex_ray.stages.assemble import assemble_documents
from jerex_ray.stages.tokenize import tokenize_documents

CFG = PipelineConfig().scaled_for_tests()


def _tokenized(transcripts):
    return tokenize_documents(
        assemble_documents(_with_part_key(transcripts, CFG)), CFG,
        concurrency=(1, 2))


def _losses(per_doc):
    return per_doc.to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)[["doc_id", "loss", "mention_loss",
                                 "coref_loss", "entity_loss",
                                 "rel_loss"]]


def test_join_path_losses_identical_to_broadcast():
    gt_m, gt_r = silver_gt_from_rule_scorer(
        rd.from_arrow(generate_transcripts_table(20)), CFG)
    a, _ = training_objective(
        _tokenized(rd.from_arrow(generate_transcripts_table(20))),
        gt_m, gt_r, config=CFG, concurrency=(1, 2))
    # gt_broadcast_rows=0 forces the hash-join co-location path
    b, _ = training_objective(
        _tokenized(rd.from_arrow(generate_transcripts_table(20))),
        gt_m, gt_r, config=CFG, concurrency=(1, 2),
        gt_broadcast_rows=0, num_partitions=4)
    la, lb = _losses(a), _losses(b)
    pd.testing.assert_frame_equal(la, lb)
    assert (la["loss"] > 0).all()


def test_dataset_gt_never_collected_on_driver(monkeypatch):
    """GT handed over as DATASETS (the corpus-scale distillation
    shape) must flow through attach_gt without any driver-side
    to_pandas/collect of the GT rows — build_gt_dict must not run."""
    import jerex_ray.pipelines.train as T

    def boom(*a, **k):
        raise AssertionError("build_gt_dict (driver GT collect) "
                             "called on the join path")

    monkeypatch.setattr(T, "build_gt_dict", boom)
    gt_m_ds, gt_r_ds = silver_gt_from_rule_scorer(
        rd.from_arrow(generate_transcripts_table(12)), CFG,
        as_datasets=True)
    per_doc, mean = training_objective(
        _tokenized(rd.from_arrow(generate_transcripts_table(12))),
        gt_m_ds, gt_r_ds, config=CFG, concurrency=(1, 2),
        num_partitions=4)
    pdf = per_doc.to_pandas()
    assert pdf["conv_id"].nunique() == 12
    assert np.isfinite(pdf["loss"]).all() and (pdf["loss"] > 0).all()
    assert abs(mean.iloc[0]["loss"] - pdf["loss"].mean()) < 1e-9


def test_train_epochs_join_path_matches_broadcast():
    gt_m, gt_r = silver_gt_from_rule_scorer(
        rd.from_arrow(generate_transcripts_table(12)), CFG)
    kw = dict(epochs=2, lr=5e-3, warmup_ratio=0.0, config=CFG,
              concurrency=(1, 2))
    h_b, w_b = train_epochs(
        _tokenized(rd.from_arrow(generate_transcripts_table(12))),
        gt_m, gt_r, **kw)
    h_j, w_j = train_epochs(
        _tokenized(rd.from_arrow(generate_transcripts_table(12))),
        gt_m, gt_r, gt_broadcast_rows=0, num_partitions=4, **kw)
    # the per-doc losses are bit-identical (see the objective test);
    # the epoch HISTORY accumulates block sums in partition order, so
    # the join path's different block layout leaves last-ulp dust in
    # the gradient mean from epoch 2 on — near-exact is the contract
    assert np.allclose(h_b["loss"], h_j["loss"], rtol=1e-12), \
        (h_b["loss"].tolist(), h_j["loss"].tolist())
    for k in w_b:
        assert np.allclose(w_b[k], w_j[k], rtol=1e-9, atol=1e-12), k
    assert (np.diff(h_b["loss"].to_numpy()) < 0).all()
    assert (np.diff(h_j["loss"].to_numpy()) < 0).all()


def test_train_epochs_checkpoint_resume_bitexact(tmp_path):
    """Round-4 item 4: kill-between-epochs resume. A run checkpointed
    per epoch and killed after epoch 2, then resumed from the same
    checkpoint_dir, reproduces the uninterrupted 4-epoch loss history
    BIT-FOR-BIT (weights + AdamW moments + step counter + history all
    restored from the atomic epoch-<k>.npz)."""
    import os

    gt_m, gt_r = silver_gt_from_rule_scorer(
        rd.from_arrow(generate_transcripts_table(10)), CFG)
    kw = dict(lr=5e-3, warmup_ratio=0.0, config=CFG,
              concurrency=(1, 2))
    h_full, w_full = train_epochs(
        _tokenized(rd.from_arrow(generate_transcripts_table(10))),
        gt_m, gt_r, epochs=4, **kw)

    ck = str(tmp_path / "ckpt")
    # "killed" run: SAME epochs=4 schedule (the lr schedule's total
    # must match the real run), killed right after the epoch-1
    # checkpoint lands
    import jerex_ray.pipelines.train as T
    import pytest
    real_save = T._save_train_checkpoint

    def save_then_die(ckpt_dir, ep, *a, **k):
        out = real_save(ckpt_dir, ep, *a, **k)
        if ep == 1:
            raise RuntimeError("simulated kill")
        return out

    T._save_train_checkpoint = save_then_die
    try:
        with pytest.raises(RuntimeError, match="simulated kill"):
            train_epochs(
                _tokenized(rd.from_arrow(generate_transcripts_table(10))),
                gt_m, gt_r, epochs=4, checkpoint_dir=ck, **kw)
    finally:
        T._save_train_checkpoint = real_save
    assert sorted(os.listdir(ck)) == ["epoch-0.npz", "epoch-1.npz"]
    # resumed run: continues at epoch 2, reuses restored state
    h_res, w_res = train_epochs(
        _tokenized(rd.from_arrow(generate_transcripts_table(10))),
        gt_m, gt_r, epochs=4, checkpoint_dir=ck, **kw)

    assert h_res["epoch"].tolist() == [0, 1, 2, 3]
    assert h_res["loss"].tolist() == h_full["loss"].tolist()
    assert h_res["lr"].tolist() == h_full["lr"].tolist()
    assert h_res["n_docs"].tolist() == h_full["n_docs"].tolist()
    for k in w_full:
        assert np.array_equal(w_full[k], w_res[k]), k
    # resume-on-finished: nothing recomputed, history returned intact
    h_noop, _ = train_epochs(
        _tokenized(rd.from_arrow(generate_transcripts_table(10))),
        gt_m, gt_r, epochs=4, checkpoint_dir=ck, **kw)
    assert h_noop["loss"].tolist() == h_full["loss"].tolist()


def test_attach_gt_ignores_orphan_gt_rows():
    """GT rows whose key matches no document (stale annotations, a
    filtered corpus) must drop silently in the co-location merge —
    never crash, never fabricate a doc."""
    import pyarrow as pa

    from jerex_ray.pipelines.train import attach_gt

    gt_m, gt_r, tok = silver_gt_from_rule_scorer(
        rd.from_arrow(generate_transcripts_table(8)), CFG,
        return_tokenized=True)
    orphan_m = pa.table({
        "conv_id": pa.array(["no-such-conv"] * 3),
        "cluster": pa.array([0, 0, 1], pa.int32()),
        "sent_id": pa.array([0, 1, 0], pa.int32()),
        "start": pa.array([0, 0, 2], pa.int32()),
        "end": pa.array([1, 2, 3], pa.int32()),
        "entity_type": pa.array(["PER"] * 3)})
    gt_m_all = pa.concat_tables([gt_m, orphan_m])
    joined = attach_gt(tok, rd.from_arrow(gt_m_all),
                       rd.from_arrow(gt_r), num_partitions=4)
    df = joined.to_pandas()
    df = df[df["doc_id"].notna()] if "doc_id" in df.columns else df
    n_docs = tok.count()
    assert len(df) == n_docs
    assert "no-such-conv" not in set(df["doc_id"])
    # real docs still carry their GT lists
    assert df["gt_m_cluster"].map(len).sum() > 0


def test_doc_gt_struct_invariant_under_row_permutation():
    """The canonical per-doc GT builder must be a pure function of the
    row SET — any arrival order (broadcast dict vs shuffle-scrambled
    join columns) yields the identical structure."""
    import itertools
    import random

    from jerex_ray.pipelines.train import _doc_gt_struct
    from jerex_ray.types import DEFAULT_TYPES

    m_rows = [(0, 0, 0, 2, "PER"), (0, 1, 3, 4, "ORG"),
              (1, 0, 5, 6, "PER"), (2, 2, 0, 1, "TOOL"),
              (1, 1, 0, 2, "ORG")]
    r_rows = [(0, 1, "works_at"), (1, 2, "uses_tool"),
              (0, 2, "uses_tool")]
    base = _doc_gt_struct(m_rows, r_rows, DEFAULT_TYPES)
    rng = random.Random(7)
    for _ in range(20):
        mp = m_rows[:]
        rp = r_rows[:]
        rng.shuffle(mp)
        rng.shuffle(rp)
        assert _doc_gt_struct(mp, rp, DEFAULT_TYPES) == base
    # small-n exhaustive: every permutation of the first 4 mentions
    for perm in itertools.permutations(m_rows[:4]):
        got = _doc_gt_struct(list(perm) + m_rows[4:], r_rows,
                             DEFAULT_TYPES)
        assert got == base


def test_gt_key_mismatch_raises_and_conv_key_recovers():
    """Round-5 (ADVICE): a conv-keyed external GT over a CHUNKED
    corpus (doc_id != conv_id) must not silently train with zero loss
    signal — the all-dropped key mismatch raises; re-running with
    gt_key='conv_id' co-locates correctly and matches the broadcast
    path's doc_id→conv_id fallback bit-for-bit."""
    import pyarrow as pa
    import pytest

    gt_m, gt_r = silver_gt_from_rule_scorer(
        rd.from_arrow(generate_transcripts_table(10)), CFG)

    def chunk_ids(t: pa.Table) -> pa.Table:
        # simulate the 700-sub-word chunk suffix: doc_id != conv_id
        new = pa.array([d + "#0" for d in t["doc_id"].to_pylist()])
        return t.set_column(t.column_names.index("doc_id"),
                            "doc_id", new)

    def chunked():
        return _tokenized(
            rd.from_arrow(generate_transcripts_table(10))) \
            .map_batches(chunk_ids, batch_format="pyarrow")

    with pytest.raises(ValueError, match="matched 0"):
        training_objective(chunked(), gt_m, gt_r, config=CFG,
                           concurrency=(1, 2), gt_broadcast_rows=0,
                           num_partitions=4)

    joined, _ = training_objective(
        chunked(), gt_m, gt_r, config=CFG, concurrency=(1, 2),
        gt_broadcast_rows=0, num_partitions=4, gt_key="conv_id")
    # broadcast path on the same chunked docs: lookup falls back
    # doc_id -> conv_id, so the two paths must agree bit-for-bit
    bcast, _ = training_objective(
        chunked(), gt_m, gt_r, config=CFG, concurrency=(1, 2))
    lj, lb = _losses(joined), _losses(bcast)
    pd.testing.assert_frame_equal(lj, lb)
    assert (lj["loss"] > 0).all()
