"""Sub-task pipelines: each JEREX stage independently runnable with
ground truth substituted upstream.

Mirrors the reference's single-stage models
(``/root/reference/jerex/models/classification_models.py:23-269``,
selected by the ``model.model_type`` registry ``models/__init__.py:9-24``):

* ``mention_pipeline``  — mention localization only (J1/J2+M3).
* ``coref_pipeline``    — coreference over GT mentions (J3–J5; the
  coref-only model defaults valid_mentions to the ground truth,
  ``classification_models.py:101-107``).
* ``entity_pipeline``   — entity typing of GT clusters (J6/J7).
* ``relation_pipeline`` — multi-instance relation classification over
  GT mentions + clusters (J8/J9; ``sampling_classify.py:84-125``).

Ground truth is broadcast by value (``ray.put`` once) and substituted
inside the scorer actor per document — exactly the reference's pattern
of feeding GT tensors where upstream predictions would flow. This is
also what makes stage-level conformance testing possible (SURVEY §3.3).

Limitation (same 700-sub-word regime as the reference): GT sentence ids
are conversation-global, so GT-substituted tasks assume unchunked
documents (reference docs always fit the ceiling; a chunked conv would
need sent-id remapping per chunk).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from jerex_ray.config import PipelineConfig
from jerex_ray.lexicon import entity_type_of
from jerex_ray.cluster import clusters_from_pair_scores
from jerex_ray.pipelines.kg import _with_part_key
from jerex_ray.runtime import configure_data_context
from jerex_ray.stages.assemble import assemble_documents
from jerex_ray.stages.convert import explode_entities, explode_mentions, explode_triples
from jerex_ray.stages.scorer import RuleScorer
from jerex_ray.stages.tokenize import tokenize_documents


def _gt_mentions_by_conv(gt_mentions: "pa.Table") -> dict:
    """conv_id → list of (cluster, sent_id, start, end) sorted by
    (sent_id, start, end) — stable mention order."""
    out: dict[str, list] = {}
    cols = [gt_mentions[c].to_pylist()
            for c in ("conv_id", "cluster", "sent_id", "start", "end")]
    for conv, cl, sid, s, e in zip(*cols):
        out.setdefault(conv, []).append((cl, sid, s, e))
    for conv in out:
        out[conv].sort(key=lambda m: (m[1], m[2], m[3]))
    return out


class GTSubstitutingScorer(RuleScorer):
    """Scorer with ground-truth mentions/clusters substituted for the
    corresponding predicted stages. ``task`` ∈ {mention, coref, entity,
    relation}."""

    def __init__(self, config=None, *, task: str = "relation", gt_ref=None):
        super().__init__(config)
        self.task = task
        self._gt = ray.get(gt_ref) if gt_ref is not None else {}

    def _gt_doc_mentions(self, conv_id: str, sent_off: np.ndarray,
                         n_sents: int):
        """GT (sentence-relative) mentions → doc-word-coordinate
        mentions (start, end, sent) for this chunk's sentences."""
        mentions, clusters_of = [], []
        for cl, sid, s, e in self._gt.get(conv_id, ()):
            if sid >= n_sents:
                continue  # outside this chunk (long-doc chunk policy)
            base = int(sent_off[sid])
            mentions.append((base + s, base + e, sid))
            clusters_of.append(cl)
        return mentions, clusters_of

    def _score_doc(self, phrases, tok_sent, sent_off, conv_id=None,
                   name_flags=None):
        if self.task == "mention":
            return super()._score_doc(phrases, tok_sent, sent_off,
                                      conv_id=conv_id, name_flags=name_flags)
        n_sents = len(sent_off) - 1
        mentions, gt_cluster_of = self._gt_doc_mentions(
            conv_id, sent_off, n_sents)
        if not mentions:
            return [], [], [], [], []
        m_phrases = [" ".join(phrases[s:e]).lower() for s, e, _ in mentions]

        if self.task == "coref":
            # J3-J5 over GT mentions
            pair_scores = {}
            for i in range(len(mentions)):
                for j in range(i + 1, len(mentions)):
                    s = self._score_coref_pair(m_phrases[i], m_phrases[j])
                    if s >= self.config.coref_threshold:
                        pair_scores[(i, j)] = s
                        pair_scores[(j, i)] = s
            clusters = clusters_from_pair_scores(
                list(range(len(mentions))), pair_scores,
                self.config.coref_threshold)
        else:
            # GT clusters (entity / relation tasks)
            by_cl: dict[int, list[int]] = {}
            for mi, cl in enumerate(gt_cluster_of):
                by_cl.setdefault(cl, []).append(mi)
            clusters = [sorted(v) for _, v in sorted(by_cl.items())]

        reps, types = [], []
        for c in clusters:
            rep = min(c, key=lambda m: mentions[m])
            s, e, _ = mentions[rep]
            reps.append(" ".join(phrases[s:e]))
            types.append(entity_type_of(phrases[s:e]))

        relations = []
        if self.task == "relation":
            relations = self._score_relations(phrases, mentions, clusters,
                                              types)
        return mentions, clusters, reps, types, relations


def _run_subtask(transcripts_ds, gt_mentions, task: str,
                 config: PipelineConfig | None = None):
    cfg = config or PipelineConfig()
    configure_data_context(ds=transcripts_ds)
    gt_ref = ray.put(_gt_mentions_by_conv(gt_mentions)
                     if gt_mentions is not None else {})
    docs = assemble_documents(_with_part_key(transcripts_ds, cfg))
    tok = tokenize_documents(docs, cfg, concurrency=cfg.tokenizer_concurrency)
    from jerex_ray.runtime import pool_concurrency
    scored = tok.map_batches(
        GTSubstitutingScorer, batch_format="pyarrow",
        batch_size=cfg.score_batch_size,
        concurrency=cfg.scorer_concurrency
        or pool_concurrency(cfg.actor_num_cpus, cpu_fraction=0.55),
        num_cpus=cfg.actor_num_cpus,
        fn_constructor_kwargs={"config": cfg, "task": task,
                               "gt_ref": gt_ref})
    return scored


def mention_pipeline(transcripts_ds, config=None):
    scored = _run_subtask(transcripts_ds, None, "mention", config)
    return scored.map_batches(explode_mentions, batch_format="pyarrow")


def coref_pipeline(transcripts_ds, gt_mentions, config=None):
    scored = _run_subtask(transcripts_ds, gt_mentions, "coref", config)
    return scored.map_batches(explode_entities, batch_format="pyarrow")


def entity_pipeline(transcripts_ds, gt_mentions, config=None):
    scored = _run_subtask(transcripts_ds, gt_mentions, "entity", config)
    return scored.map_batches(explode_entities, batch_format="pyarrow")


def relation_pipeline(transcripts_ds, gt_mentions, config=None):
    scored = _run_subtask(transcripts_ds, gt_mentions, "relation", config)
    return scored.map_batches(explode_triples, batch_format="pyarrow")
