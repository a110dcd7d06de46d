"""Property-based tests (hypothesis) for the core kernels."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from jerex_ray.cluster import complete_linkage_clusters
from jerex_ray.ops.dedup import minhash_signature, ngram_jaccard
from jerex_ray.util import get_edit_distance, normalize_surface, padded_stack

texts = st.text(alphabet="abc d", max_size=25)


@settings(max_examples=200, deadline=None)
@given(texts, texts)
def test_edit_distance_metric_properties(a, b):
    d = get_edit_distance(a, b)
    assert d == get_edit_distance(b, a)          # symmetry
    assert (d == 0) == (a == b)                  # identity
    assert d >= abs(len(a) - len(b))             # length bound
    assert d <= max(len(a), len(b))              # upper bound


@settings(max_examples=100, deadline=None)
@given(texts, texts, texts)
def test_edit_distance_triangle_inequality(a, b, c):
    assert (get_edit_distance(a, c)
            <= get_edit_distance(a, b) + get_edit_distance(b, c))


@settings(max_examples=100, deadline=None)
@given(texts)
def test_normalize_idempotent(s):
    n = normalize_surface(s)
    assert normalize_surface(n) == n


@settings(max_examples=60, deadline=None)
@given(st.integers(2, 8), st.floats(0.01, 0.99), st.integers(0, 10_000))
def test_complete_linkage_partition_invariants(n, thr, seed):
    rng = np.random.default_rng(seed)
    d = rng.random((n, n))
    d = np.maximum(d, d.T)
    np.fill_diagonal(d, 0)
    clusters = complete_linkage_clusters(d, thr)
    flat = sorted(i for c in clusters for i in c)
    assert flat == list(range(n))                # exact partition
    # complete linkage guarantee: every within-cluster pair < threshold
    for c in clusters:
        for i in c:
            for j in c:
                if i != j:
                    assert d[i, j] < thr


@settings(max_examples=30, deadline=None)
@given(st.integers(0, 1000))
def test_minhash_estimates_jaccard(seed):
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(40)]
    a = " ".join(words)
    # drop a random suffix → known overlap
    k = int(rng.integers(0, 35))
    b = " ".join(words[:40 - k] + [f"x{i}" for i in range(k)])
    true_j = ngram_jaccard(a, b)
    sa, sb = minhash_signature(a), minhash_signature(b)
    est = float((sa == sb).mean())
    assert abs(est - true_j) < 0.35              # 64 hashes → coarse


def test_padded_stack_shapes():
    out = padded_stack([np.array([1, 2]), np.array([3])], pad_value=-1)
    assert out.tolist() == [[1, 2], [3, -1]]
    out2 = padded_stack([np.ones((2, 3)), np.ones((1, 5))])
    assert out2.shape == (2, 2, 5)
    assert out2[1, 1].sum() == 0


@settings(max_examples=40, deadline=None)
@given(st.text(alphabet="abcdefgh ", min_size=30, max_size=120),
       st.integers(4, 10), st.integers(2, 6))
def test_winnowing_guarantee(t, k, w):
    """The winnowing guarantee (Schleimer et al. 2003 §2): at least
    one fingerprint is selected from every window, so any two
    positions at distance < w share... concretely: selected positions
    are never more than w apart, and every selected hash is the min of
    some window."""
    import pandas as pd
    from jerex_ray.ops.textstats import winnowing_fingerprints
    out = winnowing_fingerprints(
        pd.DataFrame({"doc_id": [0], "text": [t]}), k=k, window=w)
    data = t.lower().encode()
    n_hashes = len(data) - k + 1
    if n_hashes < 1:
        assert len(out) == 0
        return
    pos = sorted(out["position"])
    assert len(pos) >= 1
    # gap property: consecutive selections within one window length
    for a, b in zip(pos, pos[1:]):
        assert b - a <= w
    # coverage of first/last windows
    assert pos[0] <= w - 1
    if n_hashes >= w:
        assert pos[-1] >= n_hashes - w


@settings(max_examples=15, deadline=None)
@given(st.integers(0, 1000))
def test_gram_hash_polynomial_matches_scalar(seed):
    """Batch shingle arrays == per-text shingle arrays (the
    unique-then-scatter + polynomial path is exact)."""
    import numpy as np
    from jerex_ray.ops.dedup import _doc_shingle_arrays, _shingle_hashes
    rng = np.random.default_rng(seed)
    vocab = ["alpha", "beta", "gamma", "delta", "x1", "y2"]
    texts = [" ".join(vocab[i] for i in rng.integers(0, len(vocab),
                                                     rng.integers(0, 9)))
             for _ in range(6)]
    batch = _doc_shingle_arrays(texts, k=3)
    for t, got in zip(texts, batch):
        np.testing.assert_array_equal(got, _shingle_hashes(t, 3))


@settings(max_examples=80, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 5), st.integers(0, 60)),
                max_size=40),
       st.integers(2, 6))
def test_dup_span_islands_match_bruteforce(pairs, n):
    import pandas as pd

    from jerex_ray.ops.substr import _islands_fn
    df = pd.DataFrame({"doc_id": [a for a, _ in pairs],
                       "pos": [b for _, b in pairs]}).drop_duplicates()
    got = _islands_fn(n)(df)
    got_set = set(map(tuple, got[["doc_id", "start", "end"]].values)) \
        if len(got) else set()
    expect = set()
    for doc in set(df["doc_id"]) if len(df) else set():
        ivs = sorted((p, p + n) for p in df.loc[df["doc_id"] == doc, "pos"])
        merged = []
        for s, e in ivs:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        expect |= {(doc, s, e) for s, e in merged}
    assert got_set == expect


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(0, 2**64 - 1), min_size=1, max_size=40),
       st.integers(4, 14))
def test_hll_register_bit_arithmetic(hs, p):
    from jerex_ray.ops.sketch import _hll_registers
    idx, rho = _hll_registers(np.array(hs, dtype=np.uint64), p)
    for h, i, r in zip(hs, idx, rho):
        assert i == h >> (64 - p)
        w = (h << p) & ((1 << 64) - 1)
        assert r == ((64 - w.bit_length() + 1) if w else (64 - p + 1))


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(0, 2**64 - 1), min_size=1, max_size=30),
       st.integers(1, 6))
def test_bloom_positions_in_range_and_deterministic(hs, k):
    from jerex_ray.ops.sketch import _bloom_positions
    h = np.array(hs, dtype=np.uint64)
    pos = _bloom_positions(h, 1 << 12, k)
    assert pos.shape == (len(hs), k)
    assert (pos >= 0).all() and (pos < (1 << 12)).all()
    np.testing.assert_array_equal(pos, _bloom_positions(h, 1 << 12, k))


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 65535), st.integers(0, 65535)),
                min_size=1, max_size=50))
def test_morton_interleave_roundtrip_and_order(pairs):
    from jerex_ray.ops.layout import morton_interleave
    a = np.array([p[0] for p in pairs], dtype=np.int64)
    b = np.array([p[1] for p in pairs], dtype=np.int64)
    z = morton_interleave([a, b])
    # deinterleave recovers both keys exactly
    ra = np.zeros_like(a)
    rb = np.zeros_like(b)
    for i in range(16):
        ra |= ((z >> (2 * i)) & 1) << i
        rb |= ((z >> (2 * i + 1)) & 1) << i
    assert (ra == a).all() and (rb == b).all()
    # dominance: strictly larger on both keys => strictly larger z
    for i in range(min(len(a), 8)):
        for j in range(min(len(a), 8)):
            if a[i] > a[j] and b[i] > b[j]:
                assert z[i] > z[j]


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 100), st.integers(0, 10)),
                min_size=1, max_size=60))
def test_pav_stack_is_isotonic_and_mean_preserving(cells):
    # replicate the PAV kernel from q_events_isotonic on arbitrary
    # (n, pos<=n) histograms
    h = [(n + 1, min(p, n + 1)) for n, p in cells]
    pools = []
    for w, p in h:
        c = 1
        while pools and pools[-1][1] * w >= p * pools[-1][0]:
            pw, pp, pc = pools.pop()
            w, p, c = w + pw, p + pp, c + pc
        pools.append([w, p, c])
    fit = np.concatenate([np.full(c, p / w) for w, p, c in pools])
    assert (np.diff(fit) >= -1e-12).all()                # isotonic
    tot_w = sum(w for w, _, _ in pools)
    assert tot_w == sum(w for w, _ in h) and len(fit) == len(h)
    ws = np.array([w for w, _ in h], dtype=float)
    ps = np.array([p for _, p in h], dtype=float)
    # weighted-mean preservation
    assert abs((fit * ws).sum() - ps.sum()) < 1e-6
    # fit stays within [0, 1] for rates
    assert (fit >= -1e-12).all() and (fit <= 1 + 1e-12).all()


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(1, 1000), min_size=1, max_size=80),
       st.integers(2, 12))
def test_lpt_respects_graham_bound(counts, m):
    loads = np.zeros(m, dtype=np.int64)
    for c in sorted(counts, reverse=True):
        loads[int(np.argmin(loads))] += c
    # provable greedy bound: the last job placed on the max machine
    # landed on a then-least-loaded machine => load <= total/m + max
    assert loads.max() <= sum(counts) / m + max(counts) + 1e-9
    assert loads.sum() == sum(counts)
