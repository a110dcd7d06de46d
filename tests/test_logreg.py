"""Distributed logistic regression: gradient correctness (finite
differences), monotone full-batch GD convergence, and separability."""

import numpy as np
import pandas as pd
import ray.data as rd

from jerex_ray.ops.logreg import (FEATURES, accuracy, epoch_pass,
                                  feature_table, train_logreg)


def _docs():
    # English-looking docs (stopword-heavy) vs terse symbol-heavy ones
    en = ["the cat is in the hat and it was good %d" % i
          for i in range(20)]
    xx = ["zzz%d qqq!! ###" % i for i in range(20)]
    return rd.from_pandas(pd.DataFrame({
        "doc_id": range(40), "text": en + xx,
        "lang": ["en"] * 20 + ["xx"] * 20}))


def test_gradient_matches_finite_differences():
    feats = feature_table(_docs()).materialize()
    pdf = feats.to_pandas()
    X = np.column_stack([np.ones(len(pdf))]
                        + [pdf[c].to_numpy() for c in FEATURES])
    y = pdf["y"].to_numpy()
    w = np.array([0.1, -0.3, 0.05, 0.7])
    grad, loss, n = epoch_pass(feats, w)
    assert n == 40

    def f(wv):
        p = 1.0 / (1.0 + np.exp(-(X @ wv)))
        eps = 1e-12
        return -(y * np.log(p + eps)
                 + (1 - y) * np.log(1 - p + eps)).mean()

    assert abs(f(w) - loss) < 1e-9
    h = 1e-6
    for j in range(4):
        e = np.zeros(4)
        e[j] = h
        fd = (f(w + e) - f(w - e)) / (2 * h)
        assert abs(fd - grad[j]) < 1e-5, (j, fd, grad[j])


def test_training_converges_and_separates():
    feats = feature_table(_docs()).materialize()
    w, hist = train_logreg(feats, epochs=100, lr=0.05)
    losses = hist["loss"].to_numpy()
    # in the stable-step regime (lr < 2/L) full-batch GD decreases
    # the loss EVERY epoch; the problem is separable → perfect
    # training accuracy well before convergence
    assert (np.diff(losses) < 1e-12).all()
    assert losses[-1] < losses[0]
    assert accuracy(feats, w) == 1.0


def test_epoch_pass_empty_dataset():
    empty = feature_table(rd.from_pandas(pd.DataFrame({
        "doc_id": pd.Series(dtype="int64"),
        "text": pd.Series(dtype="object"),
        "lang": pd.Series(dtype="object")})))
    grad, loss, n = epoch_pass(empty, np.zeros(4))
    assert n == 0 and loss == 0.0 and (grad == 0).all()


def test_standardize_moments():
    from jerex_ray.ops.logreg import standardize
    feats = feature_table(_docs())
    scaled, mu, sd = standardize(feats)
    pdf = scaled.to_pandas()
    raw = feature_table(_docs()).to_pandas()
    for j, c in enumerate(FEATURES):
        x = raw[c].to_numpy()
        assert abs(mu[j] - x.mean()) < 1e-12
        assert abs(sd[j] - x.std()) < 1e-12
        z = pdf[c].to_numpy()
        assert abs(z.mean()) < 1e-9 and abs(z.std() - 1.0) < 1e-9
    # labels and ids untouched
    assert (pdf["y"].to_numpy() == raw["y"].to_numpy()).all()
