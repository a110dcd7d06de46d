"""Training loss functions (G4), numpy form.

Reference semantics (``/root/reference/jerex/loss.py:11-88``): per-task
criteria with masked-mean reduction —

* mention: element-wise binary cross-entropy on logits, masked mean;
* coref:   same, skipped when the mask is empty;
* entity:  softmax cross-entropy over type logits, masked mean;
* relation: multi-label BCE summed over types, masked mean over pairs;
* total = Σ task_loss × weight (default joint weights 1/1/0.25/1 for
  mention/coref/entity/relation, ``configs.py:71-77``).

Training itself is out of the engine's MVP scope (it would live in a
Ray Train loop, not Ray Data — SURVEY §2.3 A4); these kernels exist so
the sampling operators (``stages/sampling.py``) plus a model produce
the exact reference objective.
"""

from __future__ import annotations

import numpy as np

DEFAULT_TASK_WEIGHTS = (1.0, 1.0, 0.25, 1.0)  # mention, coref, entity, rel


def _bce_with_logits(logits: np.ndarray, targets: np.ndarray) -> np.ndarray:
    # numerically stable: max(x,0) - x*t + log1p(exp(-|x|))
    x, t = logits, targets
    return np.maximum(x, 0) - x * t + np.log1p(np.exp(-np.abs(x)))


def _softmax_ce(logits: np.ndarray, target_idx: np.ndarray) -> np.ndarray:
    m = logits.max(axis=-1, keepdims=True)
    logsumexp = m.squeeze(-1) + np.log(np.exp(logits - m).sum(axis=-1))
    picked = np.take_along_axis(logits, target_idx[:, None], axis=-1).squeeze(-1)
    return logsumexp - picked


def _masked_mean(per_sample: np.ndarray, mask: np.ndarray) -> float:
    mask = mask.astype(np.float64)
    total = mask.sum()
    if total == 0:
        return 0.0
    return float((per_sample * mask).sum() / total)


def joint_loss(*, mention_logits, mention_targets, mention_mask,
               coref_logits, coref_targets, coref_mask,
               entity_logits, entity_targets, entity_mask,
               rel_logits, rel_targets, rel_mask,
               task_weights=DEFAULT_TASK_WEIGHTS) -> dict:
    """Exact reference objective over flat numpy arrays. Empty-mask
    tasks contribute 0 (reference ``loss.py:41-51,59-67,71-84``)."""
    out = {}
    mention = _masked_mean(_bce_with_logits(
        np.asarray(mention_logits, np.float64),
        np.asarray(mention_targets, np.float64)),
        np.asarray(mention_mask))
    out["mention_loss"] = mention

    coref_mask = np.asarray(coref_mask)
    coref = 0.0
    if coref_mask.sum() != 0:
        coref = _masked_mean(_bce_with_logits(
            np.asarray(coref_logits, np.float64),
            np.asarray(coref_targets, np.float64)), coref_mask)
        out["coref_loss"] = coref

    entity_mask = np.asarray(entity_mask)
    entity = 0.0
    if entity_mask.sum() != 0:
        entity = _masked_mean(_softmax_ce(
            np.asarray(entity_logits, np.float64),
            np.asarray(entity_targets, np.int64)), entity_mask)
        out["entity_loss"] = entity

    rel_mask = np.asarray(rel_mask)
    rel = 0.0
    if rel_mask.sum() != 0:
        per_pair = _bce_with_logits(
            np.asarray(rel_logits, np.float64),
            np.asarray(rel_targets, np.float64)).sum(axis=-1)
        rel = _masked_mean(per_pair, rel_mask)
        out["rel_loss"] = rel

    w = task_weights
    out["loss"] = mention * w[0] + coref * w[1] + entity * w[2] + rel * w[3]
    return out
