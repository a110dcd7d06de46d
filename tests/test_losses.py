"""Loss-kernel tests vs independent scipy-free oracles."""

import math

import numpy as np

from jerex_ray.functions.losses import (_bce_with_logits, _softmax_ce,
                                        joint_loss)


def _bce_naive(x, t):
    p = 1 / (1 + math.exp(-x))
    return -(t * math.log(p) + (1 - t) * math.log(1 - p))


def test_bce_matches_naive():
    rng = np.random.default_rng(0)
    for _ in range(100):
        x = float(rng.normal(scale=3))
        t = float(rng.integers(0, 2))
        assert abs(_bce_with_logits(np.array([x]), np.array([t]))[0]
                   - _bce_naive(x, t)) < 1e-9


def test_softmax_ce_matches_naive():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(20, 4))
    idx = rng.integers(0, 4, size=20)
    got = _softmax_ce(logits, idx)
    for i in range(20):
        p = np.exp(logits[i]) / np.exp(logits[i]).sum()
        assert abs(got[i] + math.log(p[idx[i]])) < 1e-9


def test_joint_loss_weights_and_empty_masks():
    # all masks empty except mention → only mention contributes
    out = joint_loss(
        mention_logits=[2.0, -2.0], mention_targets=[1, 0],
        mention_mask=[1, 1],
        coref_logits=[0.0], coref_targets=[0], coref_mask=[0],
        entity_logits=[[0.0, 0.0]], entity_targets=[0], entity_mask=[0],
        rel_logits=[[0.0]], rel_targets=[[0]], rel_mask=[0])
    assert "coref_loss" not in out and "entity_loss" not in out
    assert abs(out["loss"] - out["mention_loss"]) < 1e-12

    # entity weighted 0.25 in the default joint weights
    out2 = joint_loss(
        mention_logits=[0.0], mention_targets=[0], mention_mask=[0],
        coref_logits=[0.0], coref_targets=[0], coref_mask=[0],
        entity_logits=[[3.0, -1.0]], entity_targets=[1], entity_mask=[1],
        rel_logits=[[0.0]], rel_targets=[[0]], rel_mask=[0])
    assert abs(out2["loss"] - 0.25 * out2["entity_loss"]) < 1e-12


def test_rel_loss_sums_over_types():
    out = joint_loss(
        mention_logits=[0.0], mention_targets=[0], mention_mask=[0],
        coref_logits=[0.0], coref_targets=[0], coref_mask=[0],
        entity_logits=[[0.0, 0.0]], entity_targets=[0], entity_mask=[0],
        rel_logits=[[0.0, 0.0, 0.0]], rel_targets=[[1, 0, 0]],
        rel_mask=[1])
    # BCE(0, t) = log 2 per type, summed over the 3 types
    assert abs(out["rel_loss"] - 3 * math.log(2)) < 1e-9
