"""Training-path sampling operators (T1–T10 of SURVEY.md §2.5).

Re-expresses the reference's per-document samplers
(``/root/reference/jerex/sampling/sampling_common.py``) as a vectorized
``map_batches`` stage over tokenized documents + broadcast ground
truth. Key deviation, by design (SURVEY §2.5): the reference draws
negatives from a GLOBAL ``random`` state seeded once per run
(order-dependent, irreproducible under re-sharding); here every
document seeds its own RNG from a stable content hash of its conv_id,
so samples are identical across shards, workers and reruns.

Implemented semantics (file:line refer to the reference):

* positive mentions — all GT spans (T1, ``sampling_common.py:8-20``).
* negative mentions — non-GT spans of size ≤ max_span_size split into
  overlap (inside a GT span) vs distinct; quota ``neg_mention_count``
  (200) split by ``overlap_ratio`` 0.5 (T2, ``:23-74``;
  ``configs.py:55,65``).
* positive coref pairs — all coreferent ordered pairs + edit distance
  of phrases (T3+, ``:101-118``).
* negative coref pairs — all non-coreferent ordered pairs, sampled to
  quota 200, with edit distances (T3-, ``:120-151``).
* GT entities — mention-index lists + type (T5, ``:180-189``).
* positive relations — multi-label one-hot per related ordered entity
  pair, grouped by pair (T7, ``:204-228``).
* negative relations — unrelated ordered entity pairs, quota 200,
  all-zero labels (T8, ``:231-253``).
"""

from __future__ import annotations

import numpy as np

from jerex_ray.stages.scorer import enumerate_candidate_spans
from jerex_ray.util import conv_seed, get_edit_distance


def sample_document(
    *,
    conv_id: str,
    phrases: list[str],
    tok_sent: np.ndarray,
    sent_tok_off: np.ndarray,
    gt_mentions: list[tuple[int, int, int, int]],  # (cluster, sent, s, e) sentence-relative
    gt_relations: list[tuple[int, int, str]],      # (head cluster, tail cluster, type)
    relation_types: list[str],
    max_span_size: int = 10,
    neg_mention_count: int = 200,
    neg_coref_count: int = 200,
    neg_rel_count: int = 200,
    overlap_ratio: float = 0.5,
    epoch: int = 0,
) -> dict:
    """All samplers for one document; deterministic via conv_seed.
    ``epoch`` re-seeds the negative sampling per training epoch — the
    engine's analogue of the reference's per-epoch dataset re-sampling
    (``data_module.py:114-127`` builds a fresh sampled dataset each
    epoch); epoch 0 reproduces the historical draws exactly."""
    rng = np.random.default_rng(
        conv_seed(conv_id) if epoch == 0
        else [conv_seed(conv_id), epoch])

    # --- T1: positive mentions in doc-word coordinates ---
    pos = []
    clusters_of = []
    for cl, sid, s, e in gt_mentions:
        base = int(sent_tok_off[sid])
        pos.append((base + s, base + e))
        clusters_of.append(cl)
    pos_set = set(pos)

    # --- T2: negative mentions (overlap vs distinct, quota split) ---
    starts, ends = enumerate_candidate_spans(tok_sent, max_span_size)
    neg_overlap, neg_distinct = [], []
    for s, e in zip(starts.tolist(), ends.tolist()):
        span = (s, e)
        if span in pos_set:
            continue
        inside = any(s >= ps and e <= pe for ps, pe in pos)
        (neg_overlap if inside else neg_distinct).append(span)
    overlap_quota = min(len(neg_overlap), int(neg_mention_count * overlap_ratio))
    distinct_quota = neg_mention_count - overlap_quota
    neg_overlap_s = _sample(rng, neg_overlap, overlap_quota)
    neg_distinct_s = _sample(rng, neg_distinct,
                             min(len(neg_distinct), distinct_quota))
    neg_mentions = neg_overlap_s + neg_distinct_s

    # --- T3: coref pairs over positive mentions ---
    phrase_of = [" ".join(phrases[s:e]).strip() for s, e in pos]
    pos_coref, pos_coref_eds = [], []
    neg_coref_all = []
    for i in range(len(pos)):
        for j in range(len(pos)):
            if i == j:
                continue
            if clusters_of[i] == clusters_of[j]:
                pos_coref.append((i, j))
                pos_coref_eds.append(
                    get_edit_distance(phrase_of[i], phrase_of[j]))
            else:
                neg_coref_all.append((i, j))
    neg_coref = _sample(rng, neg_coref_all,
                        min(len(neg_coref_all), neg_coref_count))
    neg_coref_eds = [get_edit_distance(phrase_of[i], phrase_of[j])
                     for i, j in neg_coref]

    # --- T5: GT entities (mention-index lists per cluster) ---
    by_cl: dict[int, list[int]] = {}
    for mi, cl in enumerate(clusters_of):
        by_cl.setdefault(cl, []).append(mi)
    entity_ids = sorted(by_cl)
    entities = [by_cl[c] for c in entity_ids]
    cl_index = {c: k for k, c in enumerate(entity_ids)}

    # --- T7: positive relations (multi-label one-hot per pair) ---
    rels_between: dict[tuple[int, int], list[str]] = {}
    for h, t, r in gt_relations:
        if h in cl_index and t in cl_index:
            rels_between.setdefault((cl_index[h], cl_index[t]), []).append(r)
    rt_index = {r: k for k, r in enumerate(relation_types)}
    pos_rel_pairs, pos_rel_labels = [], []
    for pair, rels in rels_between.items():
        one_hot = [0] * len(relation_types)
        for r in rels:
            one_hot[rt_index[r]] = 1
        pos_rel_pairs.append(pair)
        pos_rel_labels.append(one_hot)

    # --- T8: negative relations (unrelated ordered pairs, quota) ---
    neg_unrelated = [(i1, i2)
                     for i1 in range(len(entities))
                     for i2 in range(len(entities))
                     if i1 != i2 and (i1, i2) not in rels_between]
    neg_rel_pairs = _sample(rng, neg_unrelated,
                            min(len(neg_unrelated), neg_rel_count))

    # --- T9: mention-pair structures for pos + neg entity pairs, with
    # the reference's offset-concat convention (pos first, then neg
    # with offsets; ``sampling_joint.py`` builds them separately) ---
    mention_sents = [int(sid) for _, sid, _, _ in gt_mentions]
    mi_pos = create_rel_mention_pairs(
        entities, pos_rel_pairs, pos, mention_sents)
    mi_neg = create_rel_mention_pairs(
        entities, neg_rel_pairs, pos, mention_sents,
        offset_mp=len(mi_pos["rel_mention_pairs"]),
        offset_ep=len(pos_rel_pairs))
    rel_mi = {k: mi_pos[k] + mi_neg[k] for k in mi_pos}

    # --- T4: coref candidates (coref-only subtask inference) ---
    coref_candidates, coref_candidate_eds = create_coref_candidates(
        pos, phrases)

    return {
        "pos_mentions": pos,
        "neg_mentions": neg_mentions,
        "pos_coref": pos_coref,
        "pos_coref_eds": pos_coref_eds,
        "neg_coref": neg_coref,
        "neg_coref_eds": neg_coref_eds,
        "coref_candidates": coref_candidates,
        "coref_candidate_eds": coref_candidate_eds,
        "entities": entities,
        "pos_rel_pairs": pos_rel_pairs,
        "pos_rel_labels": pos_rel_labels,
        "neg_rel_pairs": neg_rel_pairs,
        "rel_mi": rel_mi,
    }


def create_coref_candidates(pos_mentions: list[tuple[int, int]],
                            phrases: list[str]):
    """T4 (``sampling_common.py:154-177``): coref candidates for the
    coref-only subtask's inference = ALL ordered pairs of ground-truth
    mentions with edit distances of their stripped phrases. Returns
    (pairs, eds)."""
    phrase_of = [" ".join(phrases[s:e]).strip() for s, e in pos_mentions]
    pairs, eds = [], []
    n = len(pos_mentions)
    for i in range(n):
        for j in range(n):
            if i != j:
                pairs.append((i, j))
                eds.append(get_edit_distance(phrase_of[i], phrase_of[j]))
    return pairs, eds


def create_rel_mention_pairs(entities: list[list[int]],
                             rel_entity_pairs: list[tuple[int, int]],
                             mention_word_spans: list[tuple[int, int]],
                             mention_sents: list[int],
                             mention_sub_spans: list[tuple[int, int]] | None = None,
                             *, offset_mp: int = 0, offset_ep: int = 0):
    """T9 (``sampling_common.py:256-294``): cross product of the two
    clusters' mentions per entity pair, with between-context intervals,
    token/sentence distances, and the mention-pair→entity-pair index
    maps the multi-instance classifier gathers by.

    Context intervals are (start, end) sub-word pairs instead of the
    reference's O(ctx) boolean masks (M9 interval policy); the
    placeholder/offset conventions are identical. ``offset_mp`` /
    ``offset_ep`` shift the index maps when positive and negative
    samples are concatenated (the reference builds them separately and
    concatenates, ``sampling_joint.py``)."""
    subs = mention_sub_spans or mention_word_spans
    ep_mp: list[list[int]] = []
    mp_ep: list[int] = []
    mention_pairs: list[tuple[int, int]] = []
    ctx_intervals: list[tuple[int, int]] = []
    token_dists: list[int] = []
    sent_dists: list[int] = []

    for pair_idx, (hi, ti) in enumerate(rel_entity_pairs):
        pair_mp = []
        for m1 in entities[hi]:
            for m2 in entities[ti]:
                pair_mp.append(len(mention_pairs) + offset_mp)
                mp_ep.append(pair_idx + offset_ep)
                mention_pairs.append((m1, m2))
                s1, s2 = subs[m1], subs[m2]
                # create_rel_mask (sampling_common.py:325-330)
                if s1[1] < s2[0]:
                    ctx_intervals.append((s1[1], s2[0]))
                else:
                    ctx_intervals.append((s2[1], s1[0]))
                # get_mention_token_dist (sampling_common.py:296-302)
                w1, w2 = mention_word_spans[m1], mention_word_spans[m2]
                first, second = (w1, w2) if w1[0] < w2[0] else (w2, w1)
                token_dists.append(max(0, second[0] - (first[1] - 1)))
                sent_dists.append(abs(mention_sents[m1] - mention_sents[m2]))
        ep_mp.append(pair_mp)

    return {
        "rel_entity_pair_mp": ep_mp,
        "rel_mention_pair_ep": mp_ep,
        "rel_mention_pairs": mention_pairs,
        "rel_ctx_intervals": ctx_intervals,
        "rel_token_distances": token_dists,
        "rel_sentence_distances": sent_dists,
    }


def tensorize_document(sample: dict, *, ctx_size: int,
                       n_relation_types: int) -> dict:
    """T10 (``sampling_common.py:345-507``): combine pos+neg samples
    into fixed-schema numpy arrays, with the reference's ALL-ZERO
    sample-mask placeholder-row convention at every empty site — the
    batch collate (T12 ``padded_stack``) then never sees a zero-length
    axis, and the placeholder rows are masked out of every loss.

    The six placeholder sites mirrored exactly (shapes per reference):

    * mentions (``:345-372``): empty → spans [[0,0]], masks all-ones,
      sizes [0], types [0], sample_masks [0]
    * coref (``:398-420``): empty → pairs [[0,0]], types [0], ed [0],
      sample_masks [0]
    * entities (``:423-437``): empty → entities [[0]], masks [[1]],
      types [0], sample_masks [0]
    * entity pairs (``:440-450``): empty → pairs [[0,0]],
      sample_masks [0]
    * global relations (``:453-470``): empty → pairs [[0,0]],
      types all-zero row, sample_masks [0]
    * multi-instance relations (``:473-507``): empty → pair_masks
      [[0]], ep_mp [[0]], mention_pair_ep [0], mention_pairs [[0,0]],
      ctx all-ones (interval = whole context), distances [0]

    Context masks are (start, end) intervals; the reference's all-ones
    placeholder mask is the (0, ctx_size) interval."""
    from jerex_ray.util import padded_stack
    out: dict = {}

    # --- mentions ---
    spans = list(sample["pos_mentions"]) + list(sample["neg_mentions"])
    if spans:
        out["mention_spans"] = np.asarray(spans, dtype=np.int64)
        out["mention_sizes"] = (out["mention_spans"][:, 1]
                                - out["mention_spans"][:, 0])
        out["mention_types"] = np.asarray(
            [1] * len(sample["pos_mentions"])
            + [0] * len(sample["neg_mentions"]), dtype=np.int64)
        out["mention_sample_masks"] = np.ones(len(spans), dtype=bool)
    else:
        out["mention_spans"] = np.zeros((1, 2), dtype=np.int64)
        out["mention_sizes"] = np.zeros(1, dtype=np.int64)
        out["mention_types"] = np.zeros(1, dtype=np.int64)
        out["mention_sample_masks"] = np.zeros(1, dtype=bool)

    # --- coref pairs ---
    pairs = list(sample["pos_coref"]) + list(sample["neg_coref"])
    eds = list(sample["pos_coref_eds"]) + list(sample["neg_coref_eds"])
    if pairs:
        out["coref_mention_pairs"] = np.asarray(pairs, dtype=np.int64)
        out["coref_eds"] = np.asarray(eds, dtype=np.int64)
        out["coref_types"] = np.asarray(
            [1] * len(sample["pos_coref"]) + [0] * len(sample["neg_coref"]),
            dtype=np.int64)
        out["coref_sample_masks"] = np.ones(len(pairs), dtype=bool)
    else:
        out["coref_mention_pairs"] = np.zeros((1, 2), dtype=np.int64)
        out["coref_eds"] = np.zeros(1, dtype=np.int64)
        out["coref_types"] = np.zeros(1, dtype=np.int64)
        out["coref_sample_masks"] = np.zeros(1, dtype=bool)

    # --- entities (clusters) ---
    entities = sample["entities"]
    if entities:
        out["entities"] = padded_stack(
            [np.asarray(e, dtype=np.int64) for e in entities])
        out["entity_masks"] = padded_stack(
            [np.ones(len(e), dtype=bool) for e in entities])
        out["entity_sample_masks"] = np.ones(len(entities), dtype=bool)
    else:
        out["entities"] = np.zeros((1, 1), dtype=np.int64)
        out["entity_masks"] = np.ones((1, 1), dtype=bool)
        out["entity_sample_masks"] = np.zeros(1, dtype=bool)

    # --- relation entity pairs + global labels ---
    rel_pairs = list(sample["pos_rel_pairs"]) + list(sample["neg_rel_pairs"])
    rel_labels = (list(sample["pos_rel_labels"])
                  + [[0] * n_relation_types] * len(sample["neg_rel_pairs"]))
    if rel_pairs:
        out["rel_entity_pairs"] = np.asarray(rel_pairs, dtype=np.int64)
        out["rel_types"] = np.asarray(rel_labels, dtype=np.int64)
        out["rel_sample_masks"] = np.ones(len(rel_pairs), dtype=bool)
    else:
        out["rel_entity_pairs"] = np.zeros((1, 2), dtype=np.int64)
        out["rel_types"] = np.zeros((1, n_relation_types), dtype=np.int64)
        out["rel_sample_masks"] = np.zeros(1, dtype=bool)

    # --- multi-instance mention-pair structures (T9 output) ---
    mi = sample.get("rel_mi")
    if mi and mi["rel_mention_pairs"]:
        out["rel_entity_pair_mp"] = padded_stack(
            [np.asarray(e, dtype=np.int64) for e in mi["rel_entity_pair_mp"]])
        out["rel_pair_masks"] = padded_stack(
            [np.ones(len(e), dtype=bool) for e in mi["rel_entity_pair_mp"]])
        out["rel_mention_pair_ep"] = np.asarray(mi["rel_mention_pair_ep"],
                                                dtype=np.int64)
        out["rel_mention_pairs"] = np.asarray(mi["rel_mention_pairs"],
                                              dtype=np.int64)
        out["rel_ctx_intervals"] = np.asarray(mi["rel_ctx_intervals"],
                                              dtype=np.int64)
        out["rel_token_distances"] = np.asarray(mi["rel_token_distances"],
                                                dtype=np.int64)
        out["rel_sentence_distances"] = np.asarray(
            mi["rel_sentence_distances"], dtype=np.int64)
    else:
        out["rel_entity_pair_mp"] = np.zeros((1, 1), dtype=np.int64)
        out["rel_pair_masks"] = np.zeros((1, 1), dtype=bool)
        out["rel_mention_pair_ep"] = np.zeros(1, dtype=np.int64)
        out["rel_mention_pairs"] = np.zeros((1, 2), dtype=np.int64)
        out["rel_ctx_intervals"] = np.asarray([[0, ctx_size]],
                                              dtype=np.int64)
        out["rel_token_distances"] = np.zeros(1, dtype=np.int64)
        out["rel_sentence_distances"] = np.zeros(1, dtype=np.int64)

    return out


def _sample(rng: np.random.Generator, items: list, k: int) -> list:
    """Deterministic order-independent sample of k items (analogue of
    ``random.sample`` with a per-doc generator)."""
    if k >= len(items):
        return list(items)
    idx = rng.choice(len(items), size=k, replace=False)
    return [items[i] for i in sorted(idx.tolist())]


class TrainingSampler:
    """Actor-pool UDF: tokenized docs + broadcast GT → per-doc training
    samples as list columns (the Ray equivalent of the reference's
    DataLoader-worker sampling, ``data_module.py:114-127``)."""

    def __init__(self, gt_ref, relation_types: list[str], **knobs):
        import ray
        self._gt = ray.get(gt_ref)  # conv_id → (mentions, relations)
        self.relation_types = relation_types
        self.knobs = knobs

    def __call__(self, batch):
        import pyarrow as pa
        out = {k: [] for k in (
            "doc_id", "conv_id",
            "pos_mention_start", "pos_mention_end",
            "neg_mention_start", "neg_mention_end",
            "pos_coref_a", "pos_coref_b", "pos_coref_ed",
            "neg_coref_a", "neg_coref_b", "neg_coref_ed",
            "entity_sizes",
            "pos_rel_head", "pos_rel_tail",
            "neg_rel_head", "neg_rel_tail")}
        phrases_l = batch["tok_phrase"].to_pylist()
        sent_l = batch["tok_sent"].to_pylist()
        soff_l = batch["sent_tok_off"].to_pylist()
        conv_l = batch["conv_id"].to_pylist()
        docid_l = batch["doc_id"].to_pylist()
        for d in range(batch.num_rows):
            gt_m, gt_r = self._gt.get(conv_l[d], ([], []))
            s = sample_document(
                conv_id=conv_l[d], phrases=phrases_l[d],
                tok_sent=np.asarray(sent_l[d], dtype=np.int32),
                sent_tok_off=np.asarray(soff_l[d], dtype=np.int32),
                gt_mentions=gt_m, gt_relations=gt_r,
                relation_types=self.relation_types, **self.knobs)
            out["doc_id"].append(docid_l[d])
            out["conv_id"].append(conv_l[d])
            out["pos_mention_start"].append([m[0] for m in s["pos_mentions"]])
            out["pos_mention_end"].append([m[1] for m in s["pos_mentions"]])
            out["neg_mention_start"].append([m[0] for m in s["neg_mentions"]])
            out["neg_mention_end"].append([m[1] for m in s["neg_mentions"]])
            out["pos_coref_a"].append([p[0] for p in s["pos_coref"]])
            out["pos_coref_b"].append([p[1] for p in s["pos_coref"]])
            out["pos_coref_ed"].append(s["pos_coref_eds"])
            out["neg_coref_a"].append([p[0] for p in s["neg_coref"]])
            out["neg_coref_b"].append([p[1] for p in s["neg_coref"]])
            out["neg_coref_ed"].append(s["neg_coref_eds"])
            out["entity_sizes"].append([len(e) for e in s["entities"]])
            out["pos_rel_head"].append([p[0] for p in s["pos_rel_pairs"]])
            out["pos_rel_tail"].append([p[1] for p in s["pos_rel_pairs"]])
            out["neg_rel_head"].append([p[0] for p in s["neg_rel_pairs"]])
            out["neg_rel_tail"].append([p[1] for p in s["neg_rel_pairs"]])
        i32l = pa.list_(pa.int32())
        return pa.table({
            "doc_id": pa.array(out["doc_id"], pa.string()),
            "conv_id": pa.array(out["conv_id"], pa.string()),
            **{k: pa.array(out[k], i32l) for k in out
               if k not in ("doc_id", "conv_id")},
        })


def sample_training_data(tokenized_ds, gt_mentions, gt_relations,
                         relation_types: list[str], **knobs):
    """tokenized docs + GT tables → per-doc training-sample Dataset.

    ``gt_mentions``: (conv_id, cluster, sent_id, start, end);
    ``gt_relations``: (conv_id, head cluster idx, tail cluster idx,
    pred)."""
    import ray

    gt: dict[str, tuple[list, list]] = {}
    mcols = [gt_mentions[c].to_pylist()
             for c in ("conv_id", "cluster", "sent_id", "start", "end")]
    for conv, cl, sid, s, e in zip(*mcols):
        gt.setdefault(conv, ([], []))[0].append((cl, sid, s, e))
    rcols = [gt_relations[c].to_pylist()
             for c in ("conv_id", "head", "tail", "pred")]
    for conv, h, t, r in zip(*rcols):
        gt.setdefault(conv, ([], []))[1].append((h, t, r))
    for conv in gt:
        gt[conv][0].sort(key=lambda m: (m[1], m[2], m[3]))
    gt_ref = ray.put(gt)

    return tokenized_ds.map_batches(
        TrainingSampler, batch_format="pyarrow", batch_size=64,
        concurrency=(1, 4),
        fn_constructor_kwargs={"gt_ref": gt_ref,
                               "relation_types": relation_types, **knobs})
