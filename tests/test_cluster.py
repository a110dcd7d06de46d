"""Unit tests for the J5 complete-linkage clustering operator."""

import numpy as np

from jerex_ray.cluster import clusters_from_pair_scores, complete_linkage_clusters


def _brute_force_complete_linkage(d: np.ndarray, thr: float) -> set[frozenset]:
    """Independent O(n^4) reference: repeatedly merge the closest pair
    of clusters under complete linkage while below threshold."""
    clusters = [frozenset([i]) for i in range(d.shape[0])]
    sym = np.maximum(d, d.T)
    while len(clusters) > 1:
        best = None
        for i in range(len(clusters)):
            for j in range(i + 1, len(clusters)):
                dist = max(sym[a, b] for a in clusters[i] for b in clusters[j])
                if best is None or dist < best[0]:
                    best = (dist, i, j)
        if best[0] >= thr:
            break
        _, i, j = best
        merged = clusters[i] | clusters[j]
        clusters = [c for k, c in enumerate(clusters) if k not in (i, j)]
        clusters.append(merged)
    return set(clusters)


def test_matches_brute_force_on_random_matrices():
    rng = np.random.default_rng(0)
    for _ in range(50):
        n = int(rng.integers(2, 9))
        d = rng.random((n, n))
        d = np.maximum(d, d.T)
        np.fill_diagonal(d, 0)
        thr = float(rng.random())
        got = {frozenset(c) for c in complete_linkage_clusters(d, thr)}
        want = _brute_force_complete_linkage(d, thr)
        assert got == want


def test_singleton_and_empty():
    assert complete_linkage_clusters(np.zeros((0, 0)), 0.5) == []
    assert complete_linkage_clusters(np.zeros((1, 1)), 0.5) == [[0]]


def test_threshold_extremes():
    d = np.array([[0, .1, .9], [.1, 0, .9], [.9, .9, 0]])
    # tiny threshold → all singletons
    assert complete_linkage_clusters(d, 0.05) == [[0], [1], [2]]
    # huge threshold → one cluster
    assert complete_linkage_clusters(d, 2.0) == [[0, 1, 2]]


def test_clusters_from_pair_scores_semantics():
    # reference misc.py:104-143: diag sim 1, missing pairs 0,
    # cut at 1 - coref_threshold
    out = clusters_from_pair_scores([5], {}, 0.85)
    assert out == [[5]]  # singleton rule (misc.py:108-109)

    # two mentions, high mutual score → merged
    out = clusters_from_pair_scores([3, 7], {(3, 7): 0.9, (7, 3): 0.9}, 0.85)
    assert out == [[3, 7]]

    # below threshold → separate
    out = clusters_from_pair_scores([3, 7], {(3, 7): 0.5, (7, 3): 0.5}, 0.85)
    assert out == [[3], [7]]

    # missing pair behaves like similarity 0 → separate
    out = clusters_from_pair_scores([1, 2], {}, 0.85)
    assert out == [[1], [2]]
