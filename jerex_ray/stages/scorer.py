"""The JEREX scorer stage: candidate spans → mentions → coreference
clusters → entity types → multi-instance relations, per document.

This actor-pool stage reproduces the reference's whole inference
forward pass (``/root/reference/jerex/models/joint_models.py:202-244``)
as one per-document transform, so nothing ping-pongs between stages
(the reference crosses GPU↔CPU three times per batch; here the whole
J1–J9 chain runs inside one actor call — SURVEY.md §4 Option A):

* J1/J2 + M1/M3: candidate span enumeration (all spans ≤ max_span_size
  within a sentence, ``sampling_common.py:77-98``) and mention
  localization with sigmoid threshold 0.85 (``joint_models.py:85-86``).
* J3/J4: ordered coref mention pairs with edit distances of decoded
  phrases (``models/misc.py:8-56``), scored and thresholded.
* J5: complete-linkage agglomerative clustering, cut at
  1 - coref_threshold (``misc.py:93-158``); singleton for single valid
  mention.
* J6/J7: entity typing of each cluster via its representative
  (argmax classifier → deterministic decision rule here).
* J8/J9: ordered cluster pairs × mention cross-products with
  between-context masks and the multi-instance max-pool over mention
  pairs per entity pair (``relation_classification_multi_instance.py:89-93``),
  multi-label threshold 0.6 (``joint_models.py:112-130``).

The model weights are replaced by frozen deterministic rules
(``jerex_ray/lexicon.py``) because the sandbox ships no torch — a real
HF checkpoint slots in behind the same interface by overriding the
three ``_score_*`` hooks. All "logit" arithmetic is vectorized numpy;
Python loops only run over valid mentions / clusters (small per doc,
bounded by the 700-sub-word chunk ceiling).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from jerex_ray.cluster import clusters_from_pair_scores
from jerex_ray.config import PipelineConfig
from jerex_ray.lexicon import coref_score, entity_type_of, is_name_token, relation_cue
from jerex_ray.util import edit_distances_batch, get_edit_distance


def enumerate_candidate_spans(tok_sent: np.ndarray, max_span_size: int):
    """M1: all (start, end) spans of width 1..max_span_size that do not
    cross sentence boundaries (``sampling_common.py:77-98``). Vectorized
    over all sentences at once. Returns (starts, ends) int32 arrays."""
    n = tok_sent.shape[0]
    S = min(max_span_size, n)
    if S <= 0:
        return (np.empty(0, np.int32), np.empty(0, np.int32))
    # one flat construction over every (size, start) block — same
    # order as the per-size loop it replaces: sizes ascending,
    # starts ascending within a size
    L = n - np.arange(1, S + 1, dtype=np.int64) + 1
    blockstart = np.concatenate(([0], np.cumsum(L[:-1])))
    sizes = np.repeat(np.arange(1, S + 1, dtype=np.int32), L)
    starts = (np.arange(int(L.sum()), dtype=np.int32)
              - blockstart.astype(np.int32)[sizes - 1])
    ends = starts + sizes
    keep = tok_sent[starts] == tok_sent[ends - 1]
    return starts[keep], ends[keep]


class RuleScorer:
    """Actor-pool UDF over tokenized documents (frozen rule model)."""

    # subclasses that consume sub-word encodings (NumpyScorer, a real
    # HF checkpoint) set this so __call__ extracts the extra columns;
    # the rule model skips the extraction in its hot path
    NEEDS_SUBWORDS = False

    def __init__(self, config: PipelineConfig | None = None):
        self.config = config or PipelineConfig()
        self._name_memo: dict[str, bool] = {}
        self._ed_memo: dict[tuple[str, str], int] = {}

    # --- model hooks (swap these for a real checkpoint) ---

    def _batch_name_flags(self, phrase_vals: np.ndarray) -> np.ndarray:
        """Name-shape flags for EVERY token in the batch in one
        unique-then-scatter: the regex+stopword rule runs once per
        distinct surface in the batch (memoized across batches), then
        scatters to all positions — replacing a per-token Python dict
        loop inside every document."""
        if phrase_vals.size == 0:
            return np.zeros(0, dtype=bool)
        uniq, inv = np.unique(phrase_vals, return_inverse=True)
        memo = self._name_memo
        flags = np.empty(len(uniq), dtype=bool)
        cache = len(memo) < 1_000_000
        for i, p in enumerate(uniq.tolist()):
            v = memo.get(p)
            if v is None:
                v = is_name_token(p)
                if cache:
                    memo[p] = v
            flags[i] = v
        return flags[inv]

    def _score_mentions(self, phrases: list[str], tok_sent: np.ndarray,
                        sent_tok_off: np.ndarray,
                        starts: np.ndarray, ends: np.ndarray,
                        name: np.ndarray | None = None) -> np.ndarray:
        """J1/J2 stand-in: sigmoid mention scores for candidate spans.
        High iff the span is a maximal run of name-shaped tokens.
        ``name`` is the batch-precomputed flag slice when called from
        ``__call__``; direct callers fall back to the per-token memo."""
        if name is None:
            memo = self._name_memo
            name = np.empty(len(phrases), dtype=bool)
            for i, p in enumerate(phrases):
                v = memo.get(p)
                if v is None:
                    v = is_name_token(p)
                    if len(memo) < 1_000_000:
                        memo[p] = v
                name[i] = v
        cs = np.concatenate(([0], np.cumsum(name)))
        all_name = (cs[ends] - cs[starts]) == (ends - starts)
        sent_begin = sent_tok_off[tok_sent[starts]]
        sent_end = sent_tok_off[tok_sent[starts] + 1]
        left_max = (starts == sent_begin) | ~name[np.maximum(starts - 1, 0)]
        right_max = (ends == sent_end) | ~name[np.minimum(ends, len(phrases) - 1)]
        maximal = all_name & left_max & right_max
        return np.where(maximal, 0.95, 0.05)

    def _score_coref_pair(self, p1: str, p2: str) -> float:
        """J3/J4 stand-in: sigmoid coref score for a decoded-phrase pair.
        The edit distance is computed on decoded (lowercased) phrases as
        in ``misc.py:32-34``, lazily — only when the cheap rules don't
        decide."""
        if p1 == p2:
            return coref_score(p1, p2, 0)
        key = (p1, p2) if p1 <= p2 else (p2, p1)
        ed = self._ed_memo.get(key)
        if ed is None:
            ed = get_edit_distance(p1, p2)
            if len(self._ed_memo) < 500_000:
                self._ed_memo[key] = ed
        return coref_score(p1, p2, ed)

    def _score_relations(self, phrases: list[str],
                         mentions: list[tuple[int, int, int]],
                         clusters: list[list[int]],
                         cluster_types: list[str]) -> list[tuple[int, int, str, float, int]]:
        """J8/J9 stand-in. ``mentions[i] = (start, end, sent)`` for valid
        mention i; ``clusters`` holds valid-mention indices. Returns
        (head_cluster, tail_cluster, rel_type, score, evidence_sent)
        above threshold, max-pooled over mention pairs per ordered
        cluster pair (G3); the evidence sentence is the sentence of the
        max-pooled mention pair (reference keeps evidence sentences on
        each Relation, ``entities.py:341-374``)."""
        out = []
        thr = self.config.rel_threshold
        for i1, c1 in enumerate(clusters):
            for i2, c2 in enumerate(clusters):
                if i1 == i2:
                    continue
                best: dict[str, tuple[float, int]] = {}
                for m1 in c1:
                    s1, e1, sent1 = mentions[m1]
                    for m2 in c2:
                        s2, e2, sent2 = mentions[m2]
                        if sent1 != sent2 or e1 > s2:
                            # frozen rule scores only ordered same-sentence
                            # pairs; cross-sentence pairs get ~0 logits
                            continue
                        between = phrases[e1:s2]
                        r = relation_cue(between, cluster_types[i1], cluster_types[i2])
                        if r is not None:
                            prev = best.get(r)
                            if prev is None or 0.95 > prev[0] or (
                                    0.95 == prev[0] and sent1 < prev[1]):
                                best[r] = (0.95, sent1)
                for r, (sc, ev) in best.items():
                    if sc >= thr:
                        out.append((i1, i2, r, sc, ev))
        return out

    # --- the per-document dataflow ---

    def _score_doc(self, phrases: list[str], tok_sent: np.ndarray,
                   sent_tok_off: np.ndarray, conv_id: str | None = None,
                   name_flags: np.ndarray | None = None,
                   **_subword_extras):
        cfg = self.config
        starts, ends = enumerate_candidate_spans(tok_sent, cfg.max_span_size)
        if starts.size == 0:
            return [], [], [], [], []

        scores = self._score_mentions(phrases, tok_sent, sent_tok_off,
                                      starts, ends, name=name_flags)
        valid = scores >= cfg.mention_threshold          # M3 threshold
        v_start, v_end = starts[valid], ends[valid]
        v_sent = tok_sent[v_start]
        order = np.lexsort((v_end, v_start, v_sent))     # stable mention order
        v_start, v_end, v_sent = v_start[order], v_end[order], v_sent[order]

        n_valid = len(v_start)
        mentions = [(int(s), int(e), int(si))
                    for s, e, si in zip(v_start, v_end, v_sent)]
        m_phrases = [" ".join(phrases[s:e]).lower() for s, e, _ in mentions]
        m_last = [p.rsplit(" ", 1)[-1] for p in m_phrases]
        m_nwords = [p.count(" ") + 1 for p in m_phrases]

        # J3/J4: ordered pairs of valid mentions. The rule score is
        # symmetric, so each unordered pair is scored once and
        # mirrored. The cheap rules (equality, surname alias,
        # length-gap bound ed/m > 0.2) are evaluated as numpy matrices
        # over ALL pairs at once; only the undecided remainder enters
        # the Python edit-distance loop.
        pair_scores: dict[tuple[int, int], float] = {}
        thr = self.config.coref_threshold
        if n_valid > 1:
            _, ph_inv = np.unique(np.asarray(m_phrases, dtype=object),
                                  return_inverse=True)
            _, last_inv = np.unique(np.asarray(m_last, dtype=object),
                                    return_inverse=True)
            nw = np.asarray(m_nwords, dtype=np.int64)
            ln = np.fromiter((len(p) for p in m_phrases),
                             dtype=np.int64, count=n_valid)
            iu, ju = np.triu_indices(n_valid, k=1)
            eq = ph_inv[iu] == ph_inv[ju]
            alias = (~eq) & (last_inv[iu] == last_inv[ju]) \
                & ((nw[iu] == 1) | (nw[ju] == 1))
            gap = np.abs(ln[iu] - ln[ju]) > 0.2 * np.maximum(ln[iu], ln[ju])
            if 0.98 >= thr:
                for k in np.flatnonzero(eq):
                    i, j = int(iu[k]), int(ju[k])
                    pair_scores[(i, j)] = pair_scores[(j, i)] = 0.98
            if 0.95 >= thr:
                for k in np.flatnonzero(alias):
                    i, j = int(iu[k]), int(ju[k])
                    pair_scores[(i, j)] = pair_scores[(j, i)] = 0.95
            # undecided: neither equal, alias, nor gap-excluded
            # (gap ⇒ ed/m > 0.2 ⇒ score 0.02, below any real threshold).
            # Their edit distances come from the memo where known; the
            # doc's memo misses run as ONE batched numpy DP.
            und = np.flatnonzero(~(eq | alias | gap))
            if und.size:
                memo = self._ed_memo
                eds = np.empty(und.size, dtype=np.int64)
                missing: dict[tuple[str, str], list[int]] = {}
                for t, k in enumerate(und.tolist()):
                    p1, p2 = m_phrases[int(iu[k])], m_phrases[int(ju[k])]
                    key = (p1, p2) if p1 <= p2 else (p2, p1)
                    ed = memo.get(key)
                    if ed is None:
                        missing.setdefault(key, []).append(t)
                    else:
                        eds[t] = ed
                if missing:
                    mkeys = list(missing)
                    vals = edit_distances_batch(mkeys)
                    cache = len(memo) < 500_000
                    for key, ed in zip(mkeys, vals.tolist()):
                        if cache:
                            memo[key] = ed
                        for t in missing[key]:
                            eds[t] = ed
                for t, k in enumerate(und.tolist()):
                    i, j = int(iu[k]), int(ju[k])
                    s = coref_score(m_phrases[i], m_phrases[j],
                                    int(eds[t]))
                    if s >= thr:
                        # below-threshold pairs are indistinguishable
                        # from missing pairs (distance ≥ cut) for
                        # complete linkage — omit them, keeping the
                        # pair dict tiny
                        pair_scores[(i, j)] = pair_scores[(j, i)] = s

        # J5: complete-linkage clusters over valid mentions
        clusters = clusters_from_pair_scores(
            list(range(n_valid)), pair_scores, cfg.coref_threshold)

        # J6/J7: entity typing via cluster representative (first mention
        # in document order — analogue of datasets.py:126-128)
        reps, types = [], []
        for c in clusters:
            rep = min(c, key=lambda m: mentions[m])
            s, e, _ = mentions[rep]
            reps.append(" ".join(phrases[s:e]))
            types.append(entity_type_of(phrases[s:e]))

        relations = self._score_relations(phrases, mentions, clusters, types)
        return mentions, clusters, reps, types, relations

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {k: [] for k in (
            "doc_id", "conv_id", "part_key", "sent_tok_off",
            "m_start", "m_end", "m_sent", "m_turn", "m_cluster",
            "cl_rep", "cl_type", "cl_size",
            "r_head", "r_tail", "r_type", "r_score", "r_evidence",
            "r_evidence_turn")}

        from jerex_ray.util import arrow_flat_with_offsets as flat_with_offsets

        phrase_vals, phrase_offs = flat_with_offsets(batch["tok_phrase"])
        sent_vals, sent_offs = flat_with_offsets(batch["tok_sent"], np.int32)
        soff_vals, soff_offs = flat_with_offsets(batch["sent_tok_off"], np.int32)
        # original conv turn index per doc sentence (sentences ARE turn
        # ordinals; chunked docs carry their chunk's global turn list) —
        # maps chunk-local evidence sentences to conv-level turns
        has_turns = "turn_idx" in batch.schema.names
        if has_turns:
            turn_vals, turn_offs = flat_with_offsets(batch["turn_idx"],
                                                     np.int32)
        doc_ids = batch["doc_id"].to_pylist()
        conv_ids = batch["conv_id"].to_pylist()
        part_keys = batch["part_key"].to_pylist()

        if self.NEEDS_SUBWORDS:
            enc_vals, enc_offs = flat_with_offsets(batch["encoding"], np.int32)
            ss_vals, ss_offs = flat_with_offsets(batch["tok_sub_start"], np.int32)
            se_vals, se_offs = flat_with_offsets(batch["tok_sub_end"], np.int32)
        else:
            # rule path: one batch-wide unique-then-scatter computes
            # every token's name flag up front (model subclasses embed
            # sub-words instead and take no name_flags)
            name_all = self._batch_name_flags(np.asarray(phrase_vals,
                                                         dtype=object))

        for d in range(batch.num_rows):
            phrases = phrase_vals[phrase_offs[d]:phrase_offs[d + 1]].tolist()
            tok_sent = sent_vals[sent_offs[d]:sent_offs[d + 1]]
            sent_off = soff_vals[soff_offs[d]:soff_offs[d + 1]]
            extras = {}
            if self.NEEDS_SUBWORDS:
                extras = {
                    "encoding": enc_vals[enc_offs[d]:enc_offs[d + 1]],
                    "sub_start": ss_vals[ss_offs[d]:ss_offs[d + 1]],
                    "sub_end": se_vals[se_offs[d]:se_offs[d + 1]],
                }
            else:
                extras = {"name_flags":
                          name_all[phrase_offs[d]:phrase_offs[d + 1]]}
            mentions, clusters, reps, types, relations = self._score_doc(
                phrases, tok_sent, sent_off, conv_id=conv_ids[d], **extras)

            m_cluster = [-1] * len(mentions)
            for ci, c in enumerate(clusters):
                for m in c:
                    m_cluster[m] = ci

            out["doc_id"].append(doc_ids[d])
            out["conv_id"].append(conv_ids[d])
            out["part_key"].append(part_keys[d])
            # sentence offsets pass through so downstream explodes can
            # re-base doc-word coords without re-joining the tokenized
            # table (silver-GT distillation)
            out["sent_tok_off"].append(sent_off.tolist())
            out["m_start"].append([m[0] for m in mentions])
            out["m_end"].append([m[1] for m in mentions])
            out["m_sent"].append([m[2] for m in mentions])
            if has_turns:
                t_d2 = turn_vals[turn_offs[d]:turn_offs[d + 1]]
                out["m_turn"].append([int(t_d2[m[2]]) for m in mentions])
            else:
                out["m_turn"].append([m[2] for m in mentions])
            out["m_cluster"].append(m_cluster)
            out["cl_rep"].append(reps)
            out["cl_type"].append(types)
            out["cl_size"].append([len(c) for c in clusters])
            out["r_head"].append([r[0] for r in relations])
            out["r_tail"].append([r[1] for r in relations])
            out["r_type"].append([r[2] for r in relations])
            out["r_score"].append([r[3] for r in relations])
            out["r_evidence"].append([r[4] for r in relations])
            if has_turns:
                t_d = turn_vals[turn_offs[d]:turn_offs[d + 1]]
                # -1 = model emitted no evidence sentence (J10 global
                # variant) — pass the sentinel through, never index
                out["r_evidence_turn"].append(
                    [int(t_d[r[4]]) if 0 <= r[4] < len(t_d) else -1
                     for r in relations])
            else:
                out["r_evidence_turn"].append([r[4] for r in relations])

        return pa.table({
            "doc_id": pa.array(out["doc_id"], pa.string()),
            "conv_id": pa.array(out["conv_id"], pa.string()),
            "part_key": pa.array(out["part_key"], pa.int32()),
            "sent_tok_off": pa.array(out["sent_tok_off"],
                                     pa.list_(pa.int32())),
            "m_start": pa.array(out["m_start"], pa.list_(pa.int32())),
            "m_end": pa.array(out["m_end"], pa.list_(pa.int32())),
            "m_sent": pa.array(out["m_sent"], pa.list_(pa.int32())),
            "m_turn": pa.array(out["m_turn"], pa.list_(pa.int32())),
            "m_cluster": pa.array(out["m_cluster"], pa.list_(pa.int32())),
            "cl_rep": pa.array(out["cl_rep"], pa.list_(pa.string())),
            "cl_type": pa.array(out["cl_type"], pa.list_(pa.string())),
            "cl_size": pa.array(out["cl_size"], pa.list_(pa.int32())),
            "r_head": pa.array(out["r_head"], pa.list_(pa.int32())),
            "r_tail": pa.array(out["r_tail"], pa.list_(pa.int32())),
            "r_type": pa.array(out["r_type"], pa.list_(pa.string())),
            "r_score": pa.array(out["r_score"], pa.list_(pa.float32())),
            "r_evidence": pa.array(out["r_evidence"], pa.list_(pa.int32())),
            "r_evidence_turn": pa.array(out["r_evidence_turn"],
                                        pa.list_(pa.int32())),
        })


# torch-Linear stores (out, in); the numpy heads store (in, out).
# Maps reference checkpoint state-dict entries (module names from
# jerex/models/modules/*.py) onto NumpyScorer weight attributes.
_HF_WEIGHT_MAP = {
    "mention_localization.linear.weight": ("W_ml1", True),
    "mention_localization.linear.bias": ("b_ml1", False),
    "mention_localization.mention_classifier.weight": ("W_ml2", True),
    "mention_localization.mention_classifier.bias": ("b_ml2", False),
    "mention_localization.size_embeddings.weight": ("E_size", False),
    "coreference_resolution.coref_linear.weight": ("W_co1", True),
    "coreference_resolution.coref_linear.bias": ("b_co1", False),
    "coreference_resolution.coref_classifier.weight": ("W_co2", True),
    "coreference_resolution.coref_classifier.bias": ("b_co2", False),
    "coreference_resolution.coref_ed_embeddings.weight": ("E_ed", False),
    "entity_classification.linear.weight": ("W_ec1", True),
    "entity_classification.linear.bias": ("b_ec1", False),
    "entity_classification.entity_classifier.weight": ("W_ec2", True),
    "entity_classification.entity_classifier.bias": ("b_ec2", False),
    "relation_classification.pair_linear.weight": ("W_pair", True),
    "relation_classification.pair_linear.bias": ("b_pair", False),
    "relation_classification.rel_linear.weight": ("W_rel1", True),
    "relation_classification.rel_linear.bias": ("b_rel1", False),
    "relation_classification.token_distance_embeddings.weight":
        ("E_tokdist", False),
    "relation_classification.sentence_distance_embeddings.weight":
        ("E_sentdist", False),
    "relation_classification.entity_type_embeddings.weight":
        ("E_etype", False),
    # global variant (JointGlobalModel): parametrized entity-pair repr
    # + flat classifier (entity_pair_representation.py:10-11,
    # relation_classification_global.py:8)
    "entity_pair_representation.entity_pair_linear.weight":
        ("W_gpair", True),
    "entity_pair_representation.entity_pair_linear.bias":
        ("b_gpair", False),
    "entity_pair_representation.entity_embeddings.weight":
        ("E_etype", False),
}


def load_head_weights_from_state_dict(scorer, state_dict: dict,
                                      prefix: str = "model.") -> int:
    """Copy every recognized HEAD weight from a reference checkpoint
    state dict (name → numpy array) into the scorer's numpy head
    slots, transposing torch Linear layouts. Encoder (``bert.*``)
    entries are ignored here — the torch encoder consumes them.
    Returns the number of mapped tensors. Pure numpy, so the mapping
    itself is testable without torch."""
    import numpy as np

    # rel_classifier names the FINAL linear of whichever relation
    # module the checkpoint's model type uses — multi-instance
    # (W_rel2) or global (W_grel); resolve by the scorer's variant
    variant = getattr(scorer, "variant", "multi_instance")
    final = ("W_rel2", "b_rel2") if variant == "multi_instance" \
        else ("W_grel", "b_grel")
    mapping = dict(_HF_WEIGHT_MAP)
    mapping["relation_classification.rel_classifier.weight"] = \
        (final[0], True)
    mapping["relation_classification.rel_classifier.bias"] = \
        (final[1], False)

    mapped = 0
    for key, arr in state_dict.items():
        name = key[len(prefix):] if key.startswith(prefix) else key
        target = mapping.get(name)
        if target is None:
            continue
        attr, transpose = target
        w = np.asarray(arr, dtype=np.float64)
        setattr(scorer, attr, w.T.copy() if transpose else w.copy())
        mapped += 1
    if mapped:  # invalidate the scorer's _proj_blocks cache
        scorer._weights_version = getattr(scorer, "_weights_version",
                                          0) + 1
    return mapped


class HFScorer:
    """The real-checkpoint actor (GPU path): torch BERT encoder + the
    reference's trained head weights running through the SAME numpy
    head dataflow as :class:`NumpyScorer` (which reproduces
    ``joint_models.py:202-244`` including the max_spans /
    max_coref_pairs / max_rel_pairs chunk caps). Per actor, ONCE in
    ``__init__``: tokenizer + encoder load, head weights copied out of
    the checkpoint into numpy; per batch only tensor math runs.
    Schedule with ``map_batches(HFScorer, concurrency=N, num_gpus=1,
    batch_size=B)`` — weights never leave the actor, blocks stay
    Arrow outside it (reference load: ``model.py:356-362``).

    Not runnable with a REAL checkpoint in this sandbox (no
    torch/transformers) — the guard raises NotImplementedError on the
    checkpoint path; but the WIRING (decode hook, ``_cur`` stash,
    head-weight mapping, H/M re-derivation) is torch-free: inject
    duck-typed ``tokenizer`` (``.decode(list[int]) -> str``),
    ``encoder`` (``encoding -> (len, H) float64 ndarray``) and
    ``head_state`` (name → numpy array, reference state-dict layout)
    and the whole composition runs on pure numpy — the always-run leg
    of the test split; the torch leg loads the real objects from
    ``checkpoint_path``. NOTE: a real run also swaps the whitespace
    stub in ``stages/tokenize.py`` for the checkpoint's tokenizer so
    sub-word encodings match the encoder."""

    def __new__(cls, config=None, *, checkpoint_path: str = "",
                variant: str = "multi_instance", device: str = "cpu",
                types=None, tokenizer=None, encoder=None,
                head_state: dict | None = None):
        if tokenizer is None or encoder is None or head_state is None:
            try:
                import torch  # noqa: F401
                import transformers  # noqa: F401
            except ImportError as e:
                raise NotImplementedError(
                    "HFScorer needs torch+transformers for the "
                    "checkpoint path; this sandbox ships neither — "
                    "inject tokenizer/encoder/head_state for the "
                    "torch-free wiring, or use NumpyScorer (full head "
                    "dataflow, frozen weights) / RuleScorer (frozen "
                    "semantics)"
                ) from e
        return super().__new__(cls)

    def __init__(self, config=None, *, checkpoint_path: str = "",
                 variant: str = "multi_instance", device: str = "cpu",
                 types=None, tokenizer=None, encoder=None,
                 head_state: dict | None = None):
        from jerex_ray.stages.numpy_scorer import NumpyScorer

        # compose rather than subclass so the guard can fire before
        # any NumpyScorer weight allocation happens
        self._impl = NumpyScorer(config, variant=variant, types=types)
        self.config = self._impl.config
        self._device = device
        if tokenizer is None or encoder is None or head_state is None:
            import torch
            import transformers

            self._tokenizer = transformers.AutoTokenizer \
                .from_pretrained(checkpoint_path)
            self._encoder = transformers.AutoModel \
                .from_pretrained(checkpoint_path).to(device).eval()
            state = torch.load(f"{checkpoint_path}/heads.pt",
                               map_location="cpu")
            sd = {k: v.numpy() for k, v in state.items()}
            scorer_outer = self

            # real contextual embeddings: BERT last hidden state
            def embed_fn(encoding):
                with torch.no_grad():
                    ids = torch.as_tensor(
                        encoding, dtype=torch.long,
                        device=scorer_outer._device)[None]
                    h = scorer_outer._encoder(
                        input_ids=ids)["last_hidden_state"]
                return h[0].cpu().numpy().astype(np.float64)
        else:
            # injected duck-typed components (torch-free wiring leg)
            self._tokenizer = tokenizer
            self._encoder = encoder
            sd = {k: np.asarray(v) for k, v in head_state.items()}
            embed_fn = encoder
        n = load_head_weights_from_state_dict(self._impl, sd)
        if n == 0:
            raise ValueError("checkpoint contains no recognized head "
                             "weights")
        self._impl.H = self._impl.W_ml1.shape[0] - self._impl.E_size.shape[1]
        self._impl.M = self._impl.E_size.shape[1]
        impl = self._impl
        scorer = self

        def _embed(encoding):
            return embed_fn(encoding)

        # reference decode hook (misc.py:32-34): tokenizer.decode of
        # the mention's sub-word slice, stripped
        def _decode_phrase(phrases, s, e):
            enc, ss, se = scorer._cur
            return scorer._tokenizer.decode(
                enc[ss[s]:se[e - 1]].tolist()).strip()

        orig_score_doc = impl._score_doc

        def _score_doc(phrases, tok_sent, sent_tok_off, conv_id=None,
                       encoding=None, sub_start=None, sub_end=None):
            # stash the doc's encoding so the decode hook can slice the
            # mention's sub-words exactly as the reference does
            scorer._cur = (np.asarray(encoding),
                           np.asarray(sub_start, np.int64),
                           np.asarray(sub_end, np.int64))
            try:
                return orig_score_doc(phrases, tok_sent, sent_tok_off,
                                      conv_id=conv_id, encoding=encoding,
                                      sub_start=sub_start, sub_end=sub_end)
            finally:
                scorer._cur = None

        impl._embed = _embed
        impl._decode_phrase = _decode_phrase
        impl._score_doc = _score_doc
        self._cur = None

    NEEDS_SUBWORDS = True

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self._impl(batch)


def score_documents(ds, config: PipelineConfig | None = None, *,
                    concurrency=None, batch_size: int | None = None,
                    scorer_cls=None, scorer_kwargs: dict | None = None):
    """Tokenized docs → scored docs via an actor-pool scorer.

    ``scorer_cls`` selects the model: ``RuleScorer`` (default frozen
    rules), ``jerex_ray.stages.numpy_scorer.NumpyScorer`` (full J1–J9
    head math with frozen random weights, honoring the chunk caps), or
    a real ``HFScorer`` checkpoint."""
    from jerex_ray.runtime import pool_concurrency
    cfg = config or PipelineConfig()
    return ds.map_batches(
        scorer_cls or RuleScorer, batch_format="pyarrow",
        batch_size=batch_size or cfg.score_batch_size,
        concurrency=concurrency or pool_concurrency(cfg.actor_num_cpus,
                                                    cpu_fraction=0.55),
        num_cpus=cfg.actor_num_cpus,
        fn_constructor_kwargs={"config": cfg, **(scorer_kwargs or {})})
