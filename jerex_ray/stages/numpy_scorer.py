"""NumpyScorer: the full JEREX head math (J1–J11) in numpy with
frozen random weights, honoring the reference's chunk-cap semantics.

This is the bridge between the frozen ``RuleScorer`` (decision rules,
no tensor math) and a real GPU checkpoint: every head module of the
reference runs here with the exact dataflow, shapes, chunking and
thresholding of the torch originals, just with deterministic
frozen-random weights instead of trained ones (the sandbox ships no
torch). In particular the three work-bounding caps are CONSUMED
exactly as the reference chunks:

* ``max_spans`` — J1 mention max-pool is computed in span chunks
  (``mention_representation.py:16-22``);
* ``max_coref_pairs`` — J4 coref logits in pair chunks
  (``coreference_resolution.py:26-32``);
* ``max_rel_pairs`` — J9 mention-pair representations in pair chunks
  (``relation_classification_multi_instance.py:32-51``).

Chunking changes memory, never output — ``tests/test_numpy_scorer.py``
asserts bit-identical results across cap settings.

Head modules reproduced (reference file:line):

* J1  mention repr: additive −1e30 masked max-pool over sub-word
  embeddings per candidate span (``mention_representation.py:25-31``).
* J2  mention localization: [repr ‖ size-emb] → linear → relu →
  linear → logit (``mention_localization.py:14-22``).
* J3  coref pair gen: all ORDERED pairs of valid mentions; edit
  distance of DECODED sub-word phrases (``models/misc.py:28-34``) —
  the decode hook here is the stub tokenizer's lossless-lowercase
  decode; a real tokenizer overrides ``_decode_phrase``.
* J4  coref scorer: [r1 ‖ r2 ‖ ed-emb(clamped <300)] → linear → relu
  → logit, chunked (``coreference_resolution.py:36-51``).
* J5  complete-linkage clusters cut at 1−coref_threshold
  (``misc.py:93-158``; via ``jerex_ray.cluster``).
* J6  entity repr: max-pool mention reprs per cluster
  (``entity_representation.py:12-22``).
* J7  entity clf: relu(linear) → linear → softmax → argmax
  (``entity_classification.py:13-17``, ``joint_models.py:227``).
* J8  local entity pairs: ordered cluster pairs × mention
  cross-products with between-context masks, token/sentence
  distances, mention-pair→entity-pair index maps (``misc.py:161-264``).
* J9  multi-instance relation scorer: [ctx-max-pool ‖ m1 ‖ m2 ‖
  ep-cat-repr ‖ tok-dist-emb ‖ sent-dist-emb] → pair_linear (ctx
  zeroed for adjacent spans), max-pool over mention pairs per entity
  pair, ⊕ entity-type embeddings → relu(linear) → multi-label sigmoid
  (``relation_classification_multi_instance.py:23-109``).
* J10 global relation variant: [head ‖ tail ‖ type-embs] →
  relu(linear) → linear → sigmoid
  (``entity_pair_representation.py:15-27``,
  ``relation_classification_global.py:10-13``, ``misc.py:59-90``).

Embedding-table sizes follow the reference defaults
(``configs.py:39-46``): size 30, edit-distance 300, token-distance
700, sentence-distance 50 — inputs are clamped to the table bound
exactly where the reference relies on data never exceeding it.
"""

from __future__ import annotations

import numpy as np

from jerex_ray.cluster import complete_linkage_clusters
from jerex_ray.config import PipelineConfig
from jerex_ray.stages.scorer import RuleScorer, enumerate_candidate_spans
from jerex_ray.types import DEFAULT_TYPES, TypeVocabulary
from jerex_ray.util import edit_distances_batch, get_edit_distance

_SIZE_EMB = 30          # size_embeddings_count (configs.py:43)
_ED_EMB = 300           # ed_embeddings_count (configs.py:44)
_TOKDIST_EMB = 700      # token_dist_embeddings_count (configs.py:45)
_SENTDIST_EMB = 50      # sentence_dist_embeddings_count (configs.py:46)
_WORD_BUCKETS = 4096


def _relu(x):
    return np.maximum(x, 0.0)


def _offdiag_cols(n: int) -> np.ndarray:
    """Column indices of the n×n off-diagonal in row-major order —
    the reference's nested-loop pair order without materializing a
    meshgrid + boolean mask: row i contributes cols [0..n-1] \\ {i}."""
    base = np.broadcast_to(np.arange(n - 1), (n, n - 1))
    return (base + (base >= np.arange(n)[:, None])).ravel()


def _sparse_max_table(h: np.ndarray) -> tuple:
    """Sparse table for O(1) range-max queries over the rows of ``h``,
    stored FLATTENED: one (ΣT_k + 1, H) array whose level-k rows start
    at ``offs[k]`` (``ST[offs[k] + i] = max(h[i : i + 2^k])``), with a
    sentinel all-zero LAST row that empty ranges index — so a query
    batch is pure vectorized arithmetic (no per-level Python loop, no
    zeros+scatter). Build is O(T log T · H) once per document; every
    J1/J9 interval max then costs two gathers + one elementwise
    maximum — replacing the concatenated-gather reduceat, whose work
    grew with the SUM of interval lengths (the dominant cost for J9's
    wide between-contexts × thousands of mention pairs).
    Returns (ST, offs, T) — offs is an int64 array indexable by the
    per-query level ks."""
    T, H = h.shape
    nlev = 1
    while (1 << nlev) <= T:
        nlev += 1
    lens = [T - (1 << k) + 1 for k in range(nlev)]
    offs = np.concatenate(([0], np.cumsum(lens[:-1]))).astype(np.int64) \
        if nlev > 1 else np.zeros(1, np.int64)
    total = int(sum(lens))
    ST = np.empty((total + 1, H))
    ST[0:T] = h
    ST[total] = 0.0                 # sentinel row for empty ranges
    for k in range(1, nlev):
        prev = ST[offs[k - 1]:offs[k - 1] + lens[k - 1]]
        half = 1 << (k - 1)
        n = lens[k]
        np.maximum(prev[:n], prev[half:half + n],
                   out=ST[offs[k]:offs[k] + n])
    return ST, offs, T


def _range_max(st: tuple, a: np.ndarray, b: np.ndarray,
               H: int) -> np.ndarray:
    """Max-pool ``h[a_k:b_k]`` per row via the flattened sparse table;
    empty ranges (b ≤ a) give zero rows (the reference's additive
    −1e30 mask saturates to the same). One fully vectorized query
    batch: level = floor(log2(len)) via frexp, two row gathers, one
    maximum."""
    ST, offs, T = st
    n = len(a)
    if n == 0:
        return np.zeros((0, H))
    a = np.clip(np.asarray(a, dtype=np.int64), 0, T)
    b = np.clip(np.asarray(b, dtype=np.int64), 0, T)
    lens = b - a
    # exact floor(log2(len)) via frexp (len = m·2^e, 0.5 ≤ m < 1);
    # len ≤ 0 maps to the sentinel zero row
    _, exp = np.frexp(np.maximum(lens, 1).astype(np.float64))
    ks = exp.astype(np.int64) - 1
    base = offs[ks]
    r1 = base + a
    r2 = base + b - (1 << ks)
    sent = len(ST) - 1
    bad = lens <= 0
    if bad.any():
        r1 = np.where(bad, sent, r1)
        r2 = np.where(bad, sent, r2)
    return np.maximum(ST[r1], ST[r2])


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _softmax(x):
    e = np.exp(x - x.max(axis=-1, keepdims=True))
    return e / e.sum(axis=-1, keepdims=True)


class NumpyScorer(RuleScorer):
    """Frozen-random-weight JEREX model as a scorer actor.

    ``variant='multi_instance'`` mirrors ``JointMultiInstanceModel``
    (``joint_models.py:147-244``); ``variant='global'`` mirrors
    ``JointGlobalModel`` (``joint_models.py:247-319``)."""

    NEEDS_SUBWORDS = True

    def __init__(self, config: PipelineConfig | None = None, *,
                 variant: str = "multi_instance", seed: int = 13,
                 hidden_size: int = 32, meta_size: int = 8,
                 types: TypeVocabulary | None = None,
                 checkpoint_path: str | None = None):
        super().__init__(config)
        if variant not in ("multi_instance", "global"):
            raise ValueError(f"unknown variant {variant!r}")
        self.variant = variant
        self.types = types or DEFAULT_TYPES
        self.entity_names = list(self.types.entity_index)
        self.relation_names = list(self.types.relation_index)
        nE, nR = len(self.entity_names), len(self.relation_names)
        H, M = hidden_size, meta_size
        self.H, self.M = H, M

        # bumped on every weight mutation; keys the _proj_blocks cache
        self._weights_version = 0
        rng = np.random.default_rng(seed)

        def lin(fan_in, fan_out):
            w = (rng.standard_normal((fan_in, fan_out)) /
                 np.sqrt(fan_in)).astype(np.float64)
            b = (0.1 * rng.standard_normal(fan_out)).astype(np.float64)
            return w, b

        def emb(count, dim):
            return rng.standard_normal((count, dim)).astype(np.float64)

        # frozen "encoder": word-bucket + position embeddings with a
        # ±1-neighbor mix standing in for contextualization
        self.E_word = emb(_WORD_BUCKETS, H)
        self.E_pos = emb(self.config.context_size, H)
        # meta embeddings (reference table sizes)
        self.E_size = emb(_SIZE_EMB, M)
        self.E_ed = emb(_ED_EMB, M)
        self.E_tokdist = emb(_TOKDIST_EMB, M)
        self.E_sentdist = emb(_SENTDIST_EMB, M)
        self.E_etype = emb(nE, M)
        # Final binary/multi-label classifier layers are scaled up so
        # logits saturate the sigmoid — a trained model's calibrated
        # confidence, which the frozen-random stand-in must imitate for
        # the reference-default thresholds (0.85/0.85/0.6) to cut
        # meaningfully. Biases shift the pass rates to realistic
        # sparsity (a few mentions per hundred candidates).
        def scaled(fan_in, fan_out, scale, bias):
            w, b = lin(fan_in, fan_out)
            return w * scale, b + bias

        # J2 mention localization
        self.W_ml1, self.b_ml1 = lin(H + M, H)
        self.W_ml2, self.b_ml2 = scaled(H, 1, 6.0, -9.0)
        # J4 coreference (bias raised so both orderings of a near-dup
        # pair can clear the threshold — complete linkage needs the
        # weaker direction, and frozen-random scores lack a trained
        # model's symmetry)
        self.W_co1, self.b_co1 = lin(2 * H + M, H)
        self.W_co2, self.b_co2 = scaled(H, 1, 6.0, 4.0)
        # J7 entity classification
        self.W_ec1, self.b_ec1 = lin(H, H)
        self.W_ec2, self.b_ec2 = lin(H, nE)
        # J9 multi-instance (pair_linear: 5H + 2M; rel_linear: H + 2M)
        self.W_pair, self.b_pair = lin(5 * H + 2 * M, H)
        self.W_rel1, self.b_rel1 = lin(H + 2 * M, H)
        self.W_rel2, self.b_rel2 = scaled(H, nR, 6.0, -4.0)
        # J10 global (entity_pair_linear: 2H + 2M; classifier H → nR)
        self.W_gpair, self.b_gpair = lin(2 * H + 2 * M, H)
        self.W_grel, self.b_grel = scaled(H, nR, 6.0, -9.0)

        if checkpoint_path:
            self.load_checkpoint(checkpoint_path)

    # --- S10: model checkpoint IO (reference model.py:206-212,356-362
    # saves/loads the HF checkpoint; here the checkpoint is the full
    # frozen weight set as one .npz, loaded ONCE per actor) ---

    _WEIGHT_NAMES = (
        "E_word", "E_pos", "E_size", "E_ed", "E_tokdist", "E_sentdist",
        "E_etype", "W_ml1", "b_ml1", "W_ml2", "b_ml2", "W_co1", "b_co1",
        "W_co2", "b_co2", "W_ec1", "b_ec1", "W_ec2", "b_ec2", "W_pair",
        "b_pair", "W_rel1", "b_rel1", "W_rel2", "b_rel2", "W_gpair",
        "b_gpair", "W_grel", "b_grel")

    def save_checkpoint(self, path: str) -> None:
        """Write every weight tensor to one ``.npz`` (shared-path
        checkpoint the actor pool loads from)."""
        np.savez(path, **{n: getattr(self, n) for n in self._WEIGHT_NAMES})

    def load_checkpoint(self, path: str) -> None:
        """Replace the frozen-random weights with a saved set — the
        numpy analogue of ``from_pretrained`` in actor ``__init__``
        (weights load once per actor, never per batch)."""
        with np.load(path) as z:
            for n in self._WEIGHT_NAMES:
                setattr(self, n, z[n])
        self._weights_version += 1

    def set_weights(self, weights: dict) -> None:
        """Override a subset of weights in place (the per-step weight
        broadcast of the synchronous data-parallel training loop)."""
        for n, w in weights.items():
            if n not in self._WEIGHT_NAMES:
                raise KeyError(f"unknown weight {n!r}")
            setattr(self, n, np.array(w, copy=True))
        self._weights_version += 1

    def get_weights(self, names=None) -> dict:
        return {n: np.array(getattr(self, n), copy=True)
                for n in (names or self._WEIGHT_NAMES)}

    # --- frozen encoder ---

    def _embed(self, encoding: np.ndarray) -> np.ndarray:
        """Deterministic stand-in for the BERT last hidden state: word
        bucket + position embedding, mixed with immediate neighbors so
        representations are context-dependent. Positions past the
        700-sub-word ceiling are clamped (the reference's extended
        position table would reject them; our tokenizer only exceeds
        it for a single oversized turn)."""
        ids = np.asarray(encoding, dtype=np.int64) % _WORD_BUCKETS
        pos = np.minimum(np.arange(ids.size), len(self.E_pos) - 1)
        e = self.E_word[ids] + self.E_pos[pos]
        mixed = e.copy()
        if ids.size > 1:
            mixed[1:] += 0.3 * e[:-1]
            mixed[:-1] += 0.3 * e[1:]
        return np.tanh(mixed)

    def _proj_blocks(self):
        """Block-decomposed first-layer weights for the pair-heavy
        heads (J4 coref, J9 mention-pair): ``concat(parts) @ W`` ==
        ``Σ part @ W_block``, so the per-MENTION and per-ENTITY-PAIR
        blocks are projected ONCE per doc and gathered per pair, and
        the embedding blocks collapse to precomputed lookup tables —
        the P-sized (quadratic) axis only ever sees adds and one ctx
        matmul. Cached on an explicit integer weights-version counter
        bumped by every mutation path (``set_weights``,
        ``load_checkpoint``, HF head mapping) — object ``id()`` keys
        could alias after CPython reuses a freed array's address.
        Block sums re-associate float addition vs the fused matmul
        (last-ulp dust); the chunk-cap parity contract is unaffected
        because chunking never splits the feature axis."""
        key = self._weights_version
        if getattr(self, "_blk_key", None) != key:
            H, M = self.H, self.M
            L = self.W_ml1
            self._Wm_r = np.ascontiguousarray(L[0:H])
            self._proj_size = self.E_size @ L[H:H + M]
            W = self.W_pair
            self._Wp_ctx = np.ascontiguousarray(W[0:H])
            self._Wp_a = np.ascontiguousarray(W[H:2 * H])
            self._Wp_b = np.ascontiguousarray(W[2 * H:3 * H])
            # ep block split head/tail so ent_reprs projects ONCE
            # (nC-sized) instead of building the nC²×2H concat
            self._Wp_eph = np.ascontiguousarray(W[3 * H:4 * H])
            self._Wp_ept = np.ascontiguousarray(W[4 * H:5 * H])
            self._proj_td = self.E_tokdist @ W[5 * H:5 * H + M]
            self._proj_sd = self.E_sentdist @ W[5 * H + M:5 * H + 2 * M]
            C = self.W_co1
            self._Wc_a = np.ascontiguousarray(C[0:H])
            self._Wc_b = np.ascontiguousarray(C[H:2 * H])
            self._proj_ed = self.E_ed @ C[2 * H:2 * H + M]
            # J9 second stage: [pooled ‖ etype_h ‖ etype_t] @ W_rel1
            R = self.W_rel1
            self._Wr_p = np.ascontiguousarray(R[0:H])
            self._proj_eth = self.E_etype @ R[H:H + M]
            self._proj_ett = self.E_etype @ R[H + M:H + 2 * M]
            self._blk_key = key
        return self

    def _decode_phrase(self, phrases: list[str], s: int, e: int) -> str:
        """Decode hook for J3 (``misc.py:32-34`` decodes the sub-word
        slice). The stub tokenizer lowercases and re-joins losslessly,
        so decode(encode(span)) == lowercased surface; a real HF
        scorer overrides this with ``tokenizer.decode``."""
        return " ".join(phrases[s:e]).lower().strip()

    # --- J1: chunked masked max-pool ---

    def _mention_reprs(self, st: list[np.ndarray], ss: np.ndarray,
                       se: np.ndarray) -> np.ndarray:
        """``st`` is the per-doc sparse max table
        (``_sparse_max_table(h)``)."""
        n = len(ss)
        out = np.zeros((n, self.H))
        max_spans = self.config.max_spans or n
        for i in range(0, n, max_spans):          # the J1 chunk loop
            sl = slice(i, min(i + max_spans, n))
            # the whole chunk pools as one range-max query batch,
            # mirroring the reference's single masked-max tensor op
            out[sl] = _range_max(st, ss[sl], se[sl], self.H)
        return out

    # --- the full per-document forward pass ---

    def _score_doc(self, phrases, tok_sent, sent_tok_off, conv_id=None,
                   encoding=None, sub_start=None, sub_end=None):
        cfg = self.config
        starts, ends = enumerate_candidate_spans(tok_sent, cfg.max_span_size)
        if starts.size == 0:
            return [], [], [], [], []

        h = self._embed(encoding)
        st = _sparse_max_table(h)
        sub_start = np.asarray(sub_start, dtype=np.int64)
        sub_end = np.asarray(sub_end, dtype=np.int64)
        cand_ss = sub_start[starts]
        cand_se = sub_end[ends - 1]

        # J1 + J2: mention localization (size block decomposed to a
        # precomputed 30-row projection table, see _proj_blocks)
        self._proj_blocks()
        reprs = self._mention_reprs(st, cand_ss, cand_se)
        sizes = np.clip(ends - starts, 0, _SIZE_EMB - 1)
        x = reprs @ self._Wm_r
        x += self._proj_size[sizes]
        x += self.b_ml1
        ml_logits = (_relu(x) @ self.W_ml2 + self.b_ml2).ravel()
        valid = _sigmoid(ml_logits) >= cfg.mention_threshold   # M3
        if not valid.any():
            return [], [], [], [], []

        vsel = np.flatnonzero(valid)
        v_start, v_end = starts[vsel], ends[vsel]
        v_sent = tok_sent[v_start]
        order = np.lexsort((v_end, v_start, v_sent))
        vsel = vsel[order]
        v_start, v_end, v_sent = v_start[order], v_end[order], v_sent[order]
        v_reprs = reprs[vsel]
        v_ss, v_se = cand_ss[vsel], cand_se[vsel]
        n = len(vsel)
        mentions = list(zip(v_start.tolist(), v_end.tolist(),
                            v_sent.tolist()))

        # J3: ordered pairs + decoded-phrase edit distances.
        # ED depends only on the UNIQUE decoded-phrase pair, so the
        # per-pair work collapses: unique phrases (u ≤ n) → unique
        # unordered uid pairs → one memo lookup / batched-DP entry per
        # unique pair → one vectorized gather back to all n(n-1) rows.
        # No Python loop ever touches the O(n²) pair axis.
        decoded = [self._decode_phrase(phrases, s, e) for s, e, _ in mentions]
        if n > 1:
            pa_ = np.repeat(np.arange(n), n - 1)   # reference order
            pb_ = _offdiag_cols(n)
            # dict-based unique: np.unique on object arrays pays a
            # full string sort per doc; first-occurrence ids are
            # equivalent (only pair IDENTITY matters downstream, and
            # ED keys are sorted explicitly below)
            uniq_map: dict[str, int] = {}
            uid = np.fromiter((uniq_map.setdefault(p, len(uniq_map))
                               for p in decoded), np.int64, count=n)
            uniq_phr = list(uniq_map)
            ua, ub = uid[pa_], uid[pb_]
            lo, hi = np.minimum(ua, ub), np.maximum(ua, ub)
            pairkey = lo * len(uniq_phr) + hi
            uk, inv2 = np.unique(pairkey, return_inverse=True)
            uk_lo, uk_hi = uk // len(uniq_phr), uk % len(uniq_phr)
            uvals = np.empty(len(uk), dtype=np.int64)
            memo = self._ed_memo
            missing_idx, missing_keys = [], []
            for k, (a, b) in enumerate(zip(uk_lo.tolist(),
                                           uk_hi.tolist())):
                if a == b:
                    uvals[k] = 0
                    continue
                p1, p2 = uniq_phr[a], uniq_phr[b]
                # memo keys stay lexicographically sorted (shared
                # with RuleScorer's convention) even though uid order
                # is first-occurrence, not sorted
                key = (p1, p2) if p1 <= p2 else (p2, p1)
                ed = memo.get(key)
                if ed is None:
                    missing_idx.append(k)
                    missing_keys.append(key)
                else:
                    uvals[k] = ed
            if missing_keys:
                vals = edit_distances_batch(missing_keys)
                uvals[np.asarray(missing_idx, dtype=np.int64)] = vals
                if len(memo) < 500_000:
                    memo.update(zip(missing_keys, vals.tolist()))
            eds = np.clip(uvals[inv2], 0, _ED_EMB - 1)

            # J4: chunked coref classification — per-mention blocks
            # projected once (n×H matmuls), gathered per pair; the
            # E_ed block is a precomputed 300-row lookup
            self._proj_blocks()
            cA = v_reprs @ self._Wc_a
            cB = v_reprs @ self._Wc_b
            P = len(pa_)
            co_logits = np.empty(P)
            max_pairs = cfg.max_coref_pairs or P
            for i in range(0, P, max_pairs):   # the J4 chunk loop
                sl = slice(i, i + max_pairs)
                xc = cA[pa_[sl]] + cB[pb_[sl]] + self._proj_ed[eds[sl]]
                xc += self.b_co1
                co_logits[sl] = (_relu(xc)
                                 @ self.W_co2 + self.b_co2).ravel()
            co_probs = _sigmoid(co_logits)
            # below-threshold pairs are indistinguishable from missing
            # pairs for complete linkage (distance ≥ cut either way);
            # the similarity matrix fills VECTORIZED (valid indices are
            # already 0..n-1, so the dict round-trip of
            # clusters_from_pair_scores is pure overhead here — same
            # semantics: diag 1, missing pairs 0, cut 1-threshold)
            keep = co_probs >= cfg.coref_threshold
        else:
            keep = None

        # J5: complete-linkage clusters
        if keep is not None and keep.any():
            sim = np.zeros((n, n))
            np.fill_diagonal(sim, 1.0)
            sim[pa_[keep], pb_[keep]] = co_probs[keep]
            clusters = complete_linkage_clusters(
                1.0 - sim, 1.0 - cfg.coref_threshold)
        else:
            clusters = [[i] for i in range(n)]

        # J6 + J7: entity representation and classification
        # per-cluster max-pool as one reduceat over the member gather
        # (clusters are non-empty; reduceat segments are contiguous)
        _memb = np.concatenate([np.asarray(c, dtype=np.int64)
                                for c in clusters])
        _cl_sizes = np.fromiter((len(c) for c in clusters), np.int64,
                                count=len(clusters))
        _cl_starts = np.concatenate(([0], np.cumsum(_cl_sizes)[:-1]))
        ent_reprs = np.maximum.reduceat(v_reprs[_memb], _cl_starts,
                                        axis=0)
        ent_clf = _softmax(_relu(ent_reprs @ self.W_ec1 + self.b_ec1)
                           @ self.W_ec2 + self.b_ec2)
        etype_idx = ent_clf.argmax(axis=1)
        types = [self.entity_names[t] for t in etype_idx]

        # cluster representative = first mention in document order
        # (datasets.py:126-128 analogue)
        reps = []
        for c in clusters:
            rep = min(c, key=lambda m: mentions[m])
            s, e, _ = mentions[rep]
            reps.append(" ".join(phrases[s:e]))

        if self.variant == "global":
            relations = self._relations_global(clusters, ent_reprs, etype_idx)
        else:
            relations = self._relations_multi_instance(
                clusters, ent_reprs, etype_idx, v_start, v_end, v_sent,
                v_reprs, v_ss, v_se, st)
        return mentions, clusters, reps, types, relations

    # --- J8 + J9: multi-instance relation classification ---

    def _relations_multi_instance(self, clusters, ent_reprs, etype_idx,
                                  m_start, m_end, m_sent,
                                  v_reprs, v_ss, v_se, st):
        cfg = self.config
        nC = len(clusters)
        if nC < 2:
            return []

        # J8: ordered cluster pairs × mention cross products, built as
        # ONE flat arithmetic construction (reference order preserved:
        # entity pairs row-major, m1 outer / m2 inner within a pair)
        memb = [np.asarray(c, dtype=np.int64) for c in clusters]
        sizes = np.asarray([m.size for m in memb], dtype=np.int64)
        mem_flat = np.concatenate(memb)
        cs = np.concatenate(([0], np.cumsum(sizes)[:-1]))
        heads = np.repeat(np.arange(nC, dtype=np.int64), nC - 1)
        tails = _offdiag_cols(nC)            # row-major (i, j != i)
        ep_counts = sizes[heads] * sizes[tails]
        P = int(ep_counts.sum())
        mp_ep = np.repeat(np.arange(len(heads), dtype=np.int64), ep_counts)
        ep_offsets = np.concatenate(([0], np.cumsum(ep_counts)[:-1]))
        within = np.arange(P, dtype=np.int64) - ep_offsets[mp_ep]
        s2_of = sizes[tails][mp_ep]
        mp_a = mem_flat[cs[heads][mp_ep] + within // s2_of]
        mp_b = mem_flat[cs[tails][mp_ep] + within % s2_of]

        # between-context interval per mention pair (create_rel_mask,
        # sampling_common.py:325-330: sub-word coordinates)
        s1s, s1e = v_ss[mp_a], v_se[mp_a]
        s2s, s2e = v_ss[mp_b], v_se[mp_b]
        succ = s1e < s2s
        ctx_start = np.where(succ, s1e, s2e)
        ctx_end = np.where(succ, s2s, s1s)

        # word-level token distance (get_mention_token_dist_tensors,
        # sampling_common.py:305-314) and sentence distance; the
        # m_* arrays arrive as the caller's v_start/v_end/v_sent —
        # no per-mention tuple rebuild
        m_start = np.asarray(m_start, dtype=np.int64)
        m_end = np.asarray(m_end, dtype=np.int64)
        m_sent = np.asarray(m_sent, dtype=np.int64)
        w1s, w1e = m_start[mp_a], m_end[mp_a]
        w2s, w2e = m_start[mp_b], m_end[mp_b]
        first_e = np.where(w1s < w2s, w1e, w2e)
        second_s = np.where(w1s < w2s, w2s, w1s)
        tok_dist = np.clip(second_s - (first_e - 1), 0, _TOKDIST_EMB - 1)
        sent1, sent2 = m_sent[mp_a], m_sent[mp_b]
        sent_dist = np.clip(np.abs(sent1 - sent2), 0, _SENTDIST_EMB - 1)

        # entity-pair repr: concat variant [head ‖ tail]
        # (EntityPairRepresentationCat, entity_pair_representation.py:
        # 30-40) — realized as split head/tail projections of
        # ent_reprs (nC-sized), never as the nC²×2H concat

        # J9 chunked mention-pair representations — each chunk is ONE
        # range-max query batch + block-decomposed projection: the
        # per-mention and per-entity-pair blocks are projected ONCE
        # (n- and nC²-sized matmuls) and GATHERED per pair; only the
        # ctx block (unique per pair) multiplies on the P axis. Numpy
        # mirror of the reference's per-chunk tensor op
        # (relation_classification_multi_instance.py:32-51)
        self._proj_blocks()
        pA = v_reprs @ self._Wp_a
        pB = v_reprs @ self._Wp_b
        pEP = (ent_reprs @ self._Wp_eph)[heads] \
            + (ent_reprs @ self._Wp_ept)[tails] + self.b_pair
        local = np.empty((P, self.H))
        max_pairs = cfg.max_rel_pairs or P
        T = st[2]
        for i in range(0, P, max_pairs):          # the J9 chunk loop
            sl = slice(i, min(i + max_pairs, P))
            # adjacent/overlapping spans ⇒ empty interval ⇒ zero ctx
            # vector (relation_classification_multi_instance.py:78)
            ctx = _range_max(st, ctx_start[sl],
                             np.minimum(ctx_end[sl], T), self.H)
            x = ctx @ self._Wp_ctx
            x += pA[mp_a[sl]]
            x += pB[mp_b[sl]]
            x += pEP[mp_ep[sl]]
            x += self._proj_td[tok_dist[sl]]
            x += self._proj_sd[sent_dist[sl]]
            local[sl] = x

        # multi-instance max-pool per entity pair (G3): mention-pair
        # rows are contiguous per entity pair ⇒ one reduceat
        ep_row_starts = np.concatenate(
            ([0], np.cumsum(ep_counts)[:-1])).astype(np.int64)
        pooled = np.maximum.reduceat(local, ep_row_starts, axis=0)
        xr = pooled @ self._Wr_p
        xr += self._proj_eth[etype_idx[heads]]
        xr += self._proj_ett[etype_idx[tails]]
        xr += self.b_rel1
        logits = _relu(xr) @ self.W_rel2 + self.b_rel2
        probs = _sigmoid(logits)
        # deterministic evidence: smallest sentence index among the
        # pair's mention pairs (the reference emits no evidence at
        # inference; this engine keeps the column populated)
        ev = np.minimum.reduceat(np.minimum(sent1, sent2), ep_row_starts)
        pi, ri = np.nonzero(probs >= cfg.rel_threshold)
        return [(int(heads[p]), int(tails[p]), self.relation_names[r],
                 float(probs[p, r]), int(ev[p]))
                for p, r in zip(pi, ri)]

    # --- J10: global relation classification ---

    def _relations_global(self, clusters, ent_reprs, etype_idx):
        cfg = self.config
        nC = len(clusters)
        if nC < 2:
            return []
        heads = np.repeat(np.arange(nC, dtype=np.int64), nC - 1)
        tails = _offdiag_cols(nC)            # row-major (i, j != i)
        x = np.concatenate([ent_reprs[heads], ent_reprs[tails],
                            self.E_etype[etype_idx[heads]],
                            self.E_etype[etype_idx[tails]]], axis=1)
        ep = _relu(x @ self.W_gpair + self.b_gpair)
        probs = _sigmoid(ep @ self.W_grel + self.b_grel)
        pi, ri = np.nonzero(probs >= cfg.rel_threshold)
        return [(int(heads[p]), int(tails[p]), self.relation_names[r],
                 float(probs[p, r]), -1)
                for p, r in zip(pi, ri)]


def forward_train(scorer: NumpyScorer, *, encoding, sub_start, sub_end,
                  tensors: dict, entity_type_targets,
                  cache: dict | None = None) -> dict:
    """The reference's ``_forward_train`` (``joint_models.py:176-199``)
    over T10 tensors: logits for the SAMPLED structures (pos+neg
    mentions, coref pairs, GT clusters, pos+neg entity pairs) with the
    same placeholder-row conventions — placeholder mention rows pool
    over the whole context (the all-ones mask), every placeholder is
    excluded from the loss by its sample mask, and relation
    classification consumes GT entity types (not predictions), exactly
    as in training.

    Returns the logits dict ``training_step`` feeds to the joint loss.
    """
    cfg = scorer.config
    t = tensors
    h = scorer._embed(encoding)
    st = _sparse_max_table(h)
    T = h.shape[0]
    sub_start = np.asarray(sub_start, dtype=np.int64)
    sub_end = np.asarray(sub_end, dtype=np.int64)
    sub_of = np.append(sub_start, T)      # word boundary → sub-word offset

    # mention spans (word coords) → sub-word spans; placeholder (0,0)
    # rows pool the whole context (all-ones placeholder mask semantics)
    spans = t["mention_spans"]
    n_m = len(spans)
    ss = np.where(spans[:, 1] > spans[:, 0],
                  sub_start[np.minimum(spans[:, 0], len(sub_start) - 1)], 0)
    se = np.where(spans[:, 1] > spans[:, 0],
                  sub_end[np.minimum(spans[:, 1] - 1, len(sub_end) - 1)], T)
    reprs = scorer._mention_reprs(st, ss, se)

    sizes = np.clip(t["mention_sizes"], 0, _SIZE_EMB - 1)
    x_ml = np.concatenate([reprs, scorer.E_size[sizes]], axis=1)
    z_ml = x_ml @ scorer.W_ml1 + scorer.b_ml1
    mention_logits = (_relu(z_ml) @ scorer.W_ml2 + scorer.b_ml2).ravel()

    # coref pairs index the sampled mention rows (positives first)
    pairs = t["coref_mention_pairs"]
    eds = np.clip(t["coref_eds"], 0, _ED_EMB - 1)
    P = len(pairs)
    coref_logits = np.empty(P)
    x_co = np.empty((P, 2 * scorer.H + scorer.M))
    z_co = np.empty((P, scorer.H))
    max_pairs = cfg.max_coref_pairs or P
    for i in range(0, P, max_pairs):          # the J4 chunk loop
        sl = slice(i, i + max_pairs)
        xc = np.concatenate([reprs[pairs[sl, 0]], reprs[pairs[sl, 1]],
                             scorer.E_ed[eds[sl]]], axis=1)
        zc = xc @ scorer.W_co1 + scorer.b_co1
        coref_logits[sl] = (_relu(zc) @ scorer.W_co2 + scorer.b_co2).ravel()
        x_co[sl], z_co[sl] = xc, zc

    # entity (cluster) reprs: masked max over member mention reprs
    ents, emasks = t["entities"], t["entity_masks"]
    gathered = reprs[ents]                          # (E, max_m, H)
    gathered = np.where(emasks[:, :, None], gathered, -1e30)
    ent_reprs = gathered.max(axis=1)
    ent_reprs[~emasks.any(axis=1)] = 0.0
    z_ec = ent_reprs @ scorer.W_ec1 + scorer.b_ec1
    entity_logits = _relu(z_ec) @ scorer.W_ec2 + scorer.b_ec2

    # relations: GT entity types (training convention,
    # joint_models.py:192-193), T9 structures, J9 chunked loop
    etypes = np.clip(np.asarray(entity_type_targets, dtype=np.int64),
                     0, len(scorer.entity_names) - 1)
    rp = t["rel_entity_pairs"]
    n_p = len(rp)
    head_t = etypes[np.clip(rp[:, 0], 0, len(etypes) - 1)] \
        if len(etypes) else np.zeros(n_p, dtype=np.int64)
    tail_t = etypes[np.clip(rp[:, 1], 0, len(etypes) - 1)] \
        if len(etypes) else np.zeros(n_p, dtype=np.int64)

    if scorer.variant == "global":
        xg = np.concatenate([ent_reprs[np.clip(rp[:, 0], 0, len(ent_reprs) - 1)],
                             ent_reprs[np.clip(rp[:, 1], 0, len(ent_reprs) - 1)],
                             scorer.E_etype[head_t],
                             scorer.E_etype[tail_t]], axis=1)
        z_g = xg @ scorer.W_gpair + scorer.b_gpair
        rel_logits = _relu(z_g) @ scorer.W_grel + scorer.b_grel
        if cache is not None:
            cache.update(xg=xg, z_g=z_g)
    else:
        ep_cat = np.concatenate(
            [ent_reprs[np.clip(rp[:, 0], 0, len(ent_reprs) - 1)],
             ent_reprs[np.clip(rp[:, 1], 0, len(ent_reprs) - 1)]], axis=1)
        mp = t["rel_mention_pairs"]
        mp_ep = t["rel_mention_pair_ep"]
        ctx_iv = t["rel_ctx_intervals"]
        td = np.clip(t["rel_token_distances"], 0, _TOKDIST_EMB - 1)
        sd = np.clip(t["rel_sentence_distances"], 0, _SENTDIST_EMB - 1)
        n_mp = len(mp)
        local = np.zeros((n_mp, scorer.H))
        max_rel = cfg.max_rel_pairs or n_mp
        # word-interval → sub-word interval, vectorized once
        ctx_a = np.clip(sub_of[np.minimum(ctx_iv[:, 0], len(sub_of) - 1)],
                        0, T) if n_mp else np.empty(0, np.int64)
        ctx_b = np.clip(sub_of[np.minimum(ctx_iv[:, 1], len(sub_of) - 1)],
                        0, T) if n_mp else np.empty(0, np.int64)
        mp_a_idx = np.minimum(mp[:, 0], n_m - 1) if n_mp else mp[:, 0]
        mp_b_idx = np.minimum(mp[:, 1], n_m - 1) if n_mp else mp[:, 1]
        ep_idx = np.minimum(mp_ep, max(n_p - 1, 0))
        x_pair = np.empty((n_mp, 5 * scorer.H + 2 * scorer.M))
        for i in range(0, n_mp, max_rel):     # the J9 chunk loop
            sl = slice(i, min(i + max_rel, n_mp))
            ctx = _range_max(st, ctx_a[sl], ctx_b[sl], scorer.H)
            x = np.concatenate([
                ctx, reprs[mp_a_idx[sl]], reprs[mp_b_idx[sl]],
                ep_cat[ep_idx[sl]],
                scorer.E_tokdist[td[sl]],
                scorer.E_sentdist[sd[sl]]], axis=1)
            local[sl] = x @ scorer.W_pair + scorer.b_pair
            x_pair[sl] = x

        # multi-instance max-pool per entity pair via the index maps
        ep_mp, pmask = t["rel_entity_pair_mp"], t["rel_pair_masks"]
        ep_mp_c = np.clip(ep_mp, 0, max(n_mp - 1, 0))
        gathered_mp = np.where(pmask[:, :, None], local[ep_mp_c], -1e30)
        pooled = gathered_mp.max(axis=1)
        has_mp = pmask.any(axis=1)
        pooled[~has_mp] = 0.0
        xr = np.concatenate([pooled, scorer.E_etype[head_t],
                             scorer.E_etype[tail_t]], axis=1)
        z_r = xr @ scorer.W_rel1 + scorer.b_rel1
        rel_logits = _relu(z_r) @ scorer.W_rel2 + scorer.b_rel2
        if cache is not None:
            # argmax (the max-pool backward routing) only on the grad
            # path — it is a second full reduction over the largest
            # relation-head intermediate
            cache.update(x_pair=x_pair, local=local, ep_mp_c=ep_mp_c,
                         pool_arg=gathered_mp.argmax(axis=1),
                         has_mp=has_mp, xr=xr, z_r=z_r,
                         td=td, sd=sd, n_mp=n_mp)

    if cache is not None:
        cache.update(x_ml=x_ml, z_ml=z_ml, sizes=sizes,
                     pairs=pairs, eds=eds, x_co=x_co, z_co=z_co,
                     ent_reprs=ent_reprs, z_ec=z_ec,
                     head_t=head_t, tail_t=tail_t)
    return {
        "mention_logits": mention_logits,
        "coref_logits": coref_logits,
        "entity_logits": entity_logits,
        "rel_logits": rel_logits,
    }


def training_step(scorer: NumpyScorer, *, encoding, sub_start, sub_end,
                  sample: dict, entity_type_targets,
                  n_relation_types: int | None = None) -> dict:
    """One full reference training step for one document: T10
    tensorization → ``forward_train`` → joint masked loss (G4,
    ``loss.py:11-88``). Returns the loss dict; placeholder rows never
    contribute (their sample masks are zero)."""
    from jerex_ray.functions.losses import joint_loss
    from jerex_ray.stages.sampling import tensorize_document

    nR = n_relation_types or len(scorer.relation_names)
    t = tensorize_document(sample, ctx_size=scorer.config.context_size,
                           n_relation_types=nR)
    logits = forward_train(scorer, encoding=encoding, sub_start=sub_start,
                           sub_end=sub_end, tensors=t,
                           entity_type_targets=entity_type_targets)
    # entity targets aligned to the entity rows; the only legitimate
    # mismatch is the no-entity placeholder (one all-zero-mask row, no
    # targets) — anything else is caller error and must not silently
    # train against type 0
    et = np.clip(np.asarray(entity_type_targets, dtype=np.int64).ravel(),
                 0, len(scorer.entity_names) - 1)
    n_ent = len(logits["entity_logits"])
    if et.size != n_ent:
        if et.size == 0 and not t["entity_sample_masks"].any():
            et = np.zeros(n_ent, dtype=np.int64)   # masked placeholder
        else:
            raise ValueError(
                f"entity_type_targets has {et.size} entries for "
                f"{n_ent} sampled entity rows (GT/sample mismatch)")
    return joint_loss(
        mention_logits=logits["mention_logits"],
        mention_targets=t["mention_types"],
        mention_mask=t["mention_sample_masks"],
        coref_logits=logits["coref_logits"],
        coref_targets=t["coref_types"],
        coref_mask=t["coref_sample_masks"],
        entity_logits=logits["entity_logits"],
        entity_targets=et,
        entity_mask=t["entity_sample_masks"],
        rel_logits=logits["rel_logits"],
        rel_targets=t["rel_types"],
        rel_mask=t["rel_sample_masks"])


# --- analytic backward pass over the HEAD parameters ---
#
# The encoder stand-in (E_word, E_pos) stays FROZEN, mirroring the
# reference's BERT-vs-heads separation when fine-tuning only heads;
# consequently every gradient path ENDS at the mention
# representations (they are functions of frozen h only), and each
# head's backward is self-contained given its cached forward
# intermediates. Loss gradients follow loss.py:11-88 exactly:
# masked-mean BCE (sigmoid(x) − t), masked-mean softmax CE
# (softmax − onehot), multi-label BCE summed over types — each scaled
# by its task weight (configs.py:71-77).

TRAINABLE = ("E_size", "E_ed", "E_tokdist", "E_sentdist", "E_etype",
             "W_ml1", "b_ml1", "W_ml2", "b_ml2",
             "W_co1", "b_co1", "W_co2", "b_co2",
             "W_ec1", "b_ec1", "W_ec2", "b_ec2",
             "W_pair", "b_pair", "W_rel1", "b_rel1", "W_rel2", "b_rel2",
             "W_gpair", "b_gpair", "W_grel", "b_grel")


def _zero_grads(scorer: NumpyScorer) -> dict:
    return {n: np.zeros_like(getattr(scorer, n)) for n in TRAINABLE}


def flatten_grads(grads: dict) -> np.ndarray:
    """Fixed-order flat vector (one Arrow list cell per batch row)."""
    return np.concatenate([np.asarray(grads[n], np.float64).ravel()
                           for n in TRAINABLE])


def unflatten_grads(flat: np.ndarray, scorer: NumpyScorer) -> dict:
    out, off = {}, 0
    for n in TRAINABLE:
        shape = getattr(scorer, n).shape
        size = int(np.prod(shape))
        out[n] = flat[off:off + size].reshape(shape)
        off += size
    return out


def _mlp_backward(dlogits, x, z, W1, W2, grads, names):
    """Backward through logits = relu(x@W1+b1)@W2+b2. Accumulates into
    ``grads`` under ``names`` = (W1, b1, W2, b2); returns dx."""
    nW1, nb1, nW2, nb2 = names
    a1 = _relu(z)
    grads[nW2] += a1.T @ dlogits
    grads[nb2] += dlogits.sum(axis=0)
    dz = (dlogits @ W2.T) * (z > 0)
    grads[nW1] += x.T @ dz
    grads[nb1] += dz.sum(axis=0)
    return dz @ W1.T


def backward_train(scorer: NumpyScorer, *, tensors: dict, cache: dict,
                   entity_type_targets,
                   task_weights=None) -> dict:
    """Gradients of the joint masked loss w.r.t. every TRAINABLE head
    parameter, given the ``cache`` filled by ``forward_train``.
    Max-pools route gradient to the (first) argmax element, relu uses
    the z>0 subgradient — matching torch autograd conventions."""
    from jerex_ray.functions.losses import DEFAULT_TASK_WEIGHTS

    w = task_weights or DEFAULT_TASK_WEIGHTS
    t = tensors
    H, M = scorer.H, scorer.M
    g = _zero_grads(scorer)

    # --- mention head ---
    m_mask = np.asarray(t["mention_sample_masks"], np.float64)
    if m_mask.sum() > 0:
        logits = (_relu(cache["z_ml"]) @ scorer.W_ml2
                  + scorer.b_ml2).ravel()
        dl = (_sigmoid(logits) - np.asarray(t["mention_types"], np.float64))
        dl = (dl * m_mask / m_mask.sum() * w[0])[:, None]
        dx = _mlp_backward(dl, cache["x_ml"], cache["z_ml"],
                           scorer.W_ml1, scorer.W_ml2, g,
                           ("W_ml1", "b_ml1", "W_ml2", "b_ml2"))
        np.add.at(g["E_size"], cache["sizes"], dx[:, H:])

    # --- coref head ---
    c_mask = np.asarray(t["coref_sample_masks"], np.float64)
    if c_mask.sum() > 0:
        logits = (_relu(cache["z_co"]) @ scorer.W_co2
                  + scorer.b_co2).ravel()
        dl = (_sigmoid(logits) - np.asarray(t["coref_types"], np.float64))
        dl = (dl * c_mask / c_mask.sum() * w[1])[:, None]
        dx = _mlp_backward(dl, cache["x_co"], cache["z_co"],
                           scorer.W_co1, scorer.W_co2, g,
                           ("W_co1", "b_co1", "W_co2", "b_co2"))
        np.add.at(g["E_ed"], cache["eds"], dx[:, 2 * H:])

    # --- entity head (softmax CE; input ent_reprs is frozen-derived) ---
    e_mask = np.asarray(t["entity_sample_masks"], np.float64)
    if e_mask.sum() > 0:
        logits = _relu(cache["z_ec"]) @ scorer.W_ec2 + scorer.b_ec2
        probs = _softmax(logits)
        et = np.clip(np.asarray(entity_type_targets, np.int64).ravel(),
                     0, logits.shape[1] - 1)
        if et.size != logits.shape[0]:
            et = np.zeros(logits.shape[0], dtype=np.int64)
        onehot = np.zeros_like(probs)
        onehot[np.arange(len(et)), et] = 1.0
        dl = (probs - onehot) * (e_mask / e_mask.sum() * w[2])[:, None]
        _mlp_backward(dl, cache["ent_reprs"], cache["z_ec"],
                      scorer.W_ec1, scorer.W_ec2, g,
                      ("W_ec1", "b_ec1", "W_ec2", "b_ec2"))

    # --- relation head ---
    r_mask = np.asarray(t["rel_sample_masks"], np.float64)
    if r_mask.sum() > 0:
        scale = r_mask / r_mask.sum() * w[3]
        targets = np.asarray(t["rel_types"], np.float64)
        head_t, tail_t = cache["head_t"], cache["tail_t"]
        if scorer.variant == "global":
            logits = _relu(cache["z_g"]) @ scorer.W_grel + scorer.b_grel
            dl = (_sigmoid(logits) - targets) * scale[:, None]
            dx = _mlp_backward(dl, cache["xg"], cache["z_g"],
                               scorer.W_gpair, scorer.W_grel, g,
                               ("W_gpair", "b_gpair", "W_grel", "b_grel"))
            np.add.at(g["E_etype"], head_t, dx[:, 2 * H:2 * H + M])
            np.add.at(g["E_etype"], tail_t, dx[:, 2 * H + M:])
        else:
            logits = _relu(cache["z_r"]) @ scorer.W_rel2 + scorer.b_rel2
            dl = (_sigmoid(logits) - targets) * scale[:, None]
            dxr = _mlp_backward(dl, cache["xr"], cache["z_r"],
                                scorer.W_rel1, scorer.W_rel2, g,
                                ("W_rel1", "b_rel1", "W_rel2", "b_rel2"))
            np.add.at(g["E_etype"], head_t, dxr[:, H:H + M])
            np.add.at(g["E_etype"], tail_t, dxr[:, H + M:])
            # max-pool backward: route each (pair, dim) gradient to the
            # argmax mention-pair row; pairs with no valid mention pair
            # pooled a constant 0 ⇒ no gradient
            dpooled = dxr[:, :H] * cache["has_mp"][:, None]
            n_p = len(dpooled)
            if n_p and cache["n_mp"]:
                rows = np.take_along_axis(
                    cache["ep_mp_c"], cache["pool_arg"], axis=1)  # (n_p, H)
                dlocal = np.zeros_like(cache["local"])
                cols = np.tile(np.arange(H), n_p)
                np.add.at(dlocal, (rows.ravel(), cols), dpooled.ravel())
                # local = x_pair @ W_pair + b_pair (no relu)
                g["W_pair"] += cache["x_pair"].T @ dlocal
                g["b_pair"] += dlocal.sum(axis=0)
                dxp = dlocal @ scorer.W_pair.T
                np.add.at(g["E_tokdist"], cache["td"],
                          dxp[:, 5 * H:5 * H + M])
                np.add.at(g["E_sentdist"], cache["sd"],
                          dxp[:, 5 * H + M:])
    return g


def training_step_grads(scorer: NumpyScorer, *, encoding, sub_start,
                        sub_end, sample: dict, entity_type_targets,
                        n_relation_types: int | None = None
                        ) -> tuple[dict, dict]:
    """One document's (losses, gradients): T10 tensorization → cached
    ``forward_train`` → joint masked loss → ``backward_train``."""
    from jerex_ray.functions.losses import joint_loss
    from jerex_ray.stages.sampling import tensorize_document

    nR = n_relation_types or len(scorer.relation_names)
    t = tensorize_document(sample, ctx_size=scorer.config.context_size,
                           n_relation_types=nR)
    cache: dict = {}
    logits = forward_train(scorer, encoding=encoding, sub_start=sub_start,
                           sub_end=sub_end, tensors=t,
                           entity_type_targets=entity_type_targets,
                           cache=cache)
    et = np.clip(np.asarray(entity_type_targets, dtype=np.int64).ravel(),
                 0, len(scorer.entity_names) - 1)
    n_ent = len(logits["entity_logits"])
    if et.size != n_ent:
        et = np.zeros(n_ent, dtype=np.int64)
    losses = joint_loss(
        mention_logits=logits["mention_logits"],
        mention_targets=t["mention_types"],
        mention_mask=t["mention_sample_masks"],
        coref_logits=logits["coref_logits"],
        coref_targets=t["coref_types"],
        coref_mask=t["coref_sample_masks"],
        entity_logits=logits["entity_logits"],
        entity_targets=et,
        entity_mask=t["entity_sample_masks"],
        rel_logits=logits["rel_logits"],
        rel_targets=t["rel_types"],
        rel_mask=t["rel_sample_masks"])
    grads = backward_train(scorer, tensors=t, cache=cache,
                           entity_type_targets=et)
    return losses, grads
