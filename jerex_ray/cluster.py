"""Complete-linkage agglomerative clustering over a precomputed
similarity matrix — the J5 cluster-formation operator.

Reference semantics (``/root/reference/jerex/models/misc.py:93-158``):
sigmoid coref scores fill a similarity matrix (diagonal = 1, missing
pairs stay 0), distances = 1 - similarity, then sklearn
``AgglomerativeClustering(linkage='complete', affinity='precomputed',
distance_threshold=1 - coref_threshold)``. sklearn is unavailable in
this sandbox, so this is a from-scratch implementation of the same
textbook algorithm: greedily merge the pair of clusters with the
smallest complete-linkage (max) distance while that distance is
strictly below the threshold. Complete linkage is monotone, so the
greedy loop is equivalent to building the full dendrogram and cutting
at the threshold, which is what sklearn's ``distance_threshold`` does.

Ties are broken by lowest (i, j) cluster index pair — deterministic
across processes and re-sharding.
"""

from __future__ import annotations

import numpy as np


def complete_linkage_clusters(distances: np.ndarray, distance_threshold: float) -> list[list[int]]:
    """Cluster n items given an (n, n) distance matrix.

    Returns a list of clusters, each a sorted list of item indices,
    ordered by smallest member index (deterministic output order).
    Merges happen while the minimum complete-linkage distance is
    < ``distance_threshold`` (sklearn: merges with distance >= threshold
    are not applied).
    """
    n = distances.shape[0]
    if n == 0:
        return []
    if n == 1:
        return [[0]]

    # symmetrize with max (conservative for complete linkage; the
    # reference fills both (i,j) and (j,i) from ordered pairs with a
    # symmetric score function, so this is a no-op in practice)
    d = np.maximum(distances, distances.T).astype(np.float64, copy=True)
    np.fill_diagonal(d, np.inf)

    active = list(range(n))            # current cluster ids (rows of d)
    members: dict[int, list[int]] = {i: [i] for i in range(n)}

    while len(active) > 1:
        sub = d[np.ix_(active, active)]
        flat = np.argmin(sub)
        ai, aj = divmod(flat, len(active))
        if ai > aj:
            ai, aj = aj, ai
        if sub[ai, aj] >= distance_threshold:
            break
        ci, cj = active[ai], active[aj]
        # complete linkage: distance(ci∪cj, k) = max(d(ci,k), d(cj,k))
        merged_row = np.maximum(d[ci], d[cj])
        d[ci, :] = merged_row
        d[:, ci] = merged_row
        d[ci, ci] = np.inf
        members[ci] = members[ci] + members[cj]
        del members[cj]
        active.remove(cj)

    clusters = [sorted(members[c]) for c in active]
    clusters.sort(key=lambda c: c[0])
    return clusters


def clusters_from_pair_scores(
    valid_indices: list[int],
    pair_scores: dict[tuple[int, int], float],
    coref_threshold: float,
) -> list[list[int]]:
    """The full J5 operator: mention indices + ordered-pair sigmoid
    scores → clusters of mention indices.

    Mirrors ``misc.py:104-143``: single valid mention ⇒ singleton
    cluster; similarity diag = 1, missing pairs 0; cut at
    ``1 - coref_threshold``.
    """
    if not valid_indices:
        return []
    if len(valid_indices) == 1:
        return [[valid_indices[0]]]
    if not pair_scores:
        # missing pairs have distance 1 ≥ the cut for any threshold
        # in [0, 1] — no merge can happen, every mention is a
        # singleton (ordered by member index, as below)
        return [[i] for i in sorted(valid_indices)]

    mapping = {m: k for k, m in enumerate(valid_indices)}
    m = len(valid_indices)
    sim = np.zeros((m, m), dtype=np.float64)
    np.fill_diagonal(sim, 1.0)
    for (i, j), v in pair_scores.items():
        if i in mapping and j in mapping:
            sim[mapping[i], mapping[j]] = v
    dist = 1.0 - sim
    raw = complete_linkage_clusters(dist, 1.0 - coref_threshold)
    return [[valid_indices[k] for k in c] for c in raw]
