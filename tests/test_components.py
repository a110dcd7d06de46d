"""Connected-components operator tests vs a union-find oracle."""

import numpy as np
import pandas as pd
import ray.data as rd

from jerex_ray.functions.components import connected_components


def _oracle(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical: min node id of each component
    comp = {}
    for n in nodes:
        r = find(n)
        comp.setdefault(r, []).append(n)
    out = {}
    for members in comp.values():
        m = min(members)
        for n in members:
            out[n] = m
    return out


def test_chain_and_clusters_match_union_find():
    rng = np.random.default_rng(4)
    # a long chain (stresses propagation rounds) + random clusters
    chain = [(i, i + 1) for i in range(0, 30)]
    rand = [(int(rng.integers(100, 140)), int(rng.integers(100, 140)))
            for _ in range(60)]
    edges = chain + rand
    nodes = sorted({n for e in edges for n in e})
    got = connected_components(
        rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"])))
    want = _oracle(edges, nodes)
    assert dict(zip(got["node"], got["component"])) == want
    # the chain is one component rooted at 0
    assert set(got[got["node"] <= 30]["component"]) == {0}


def test_isolated_pairs():
    edges = pd.DataFrame({"src": [1, 5], "dst": [2, 6]})
    got = connected_components(rd.from_pandas(edges))
    assert dict(zip(got["node"], got["component"])) == {1: 1, 2: 1, 5: 5, 6: 5}


def test_empty_edge_set_returns_empty_frame():
    import pandas as pd
    import ray.data as rd
    from jerex_ray.functions.components import connected_components
    empty = rd.from_pandas(pd.DataFrame({"src": pd.Series(dtype="int64"),
                                         "dst": pd.Series(dtype="int64")}))
    out = connected_components(empty)
    assert list(out.columns) == ["node", "component"]
    assert len(out) == 0


def test_long_chain_converges_distributed():
    """A 2000-node path graph: min-label + pointer jumping converges in
    O(log n) rounds with labels held in Datasets, never driver pandas."""
    import pandas as pd
    import ray.data as rd
    from jerex_ray.functions.components import connected_components
    n = 600
    edges = pd.DataFrame({"src": range(n - 1), "dst": range(1, n)})
    out = connected_components(rd.from_pandas(edges), num_partitions=4)
    assert len(out) == n
    assert (out["component"] == 0).all()
