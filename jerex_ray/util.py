"""Small shared utilities: stable hashing, edit distance, normalization.

Python's builtin ``hash`` is salted per process — everything here uses
content-stable hashes so results are identical across Ray workers,
re-sharding and reruns (the reference's global parse-order IDs,
``/root/reference/jerex/datasets.py:41-48``, are replaced by stable
content-derived keys per SURVEY.md §1.2).
"""

from __future__ import annotations

import hashlib

import numpy as np


def stable_hash64(s: str | bytes) -> int:
    """Stable unsigned 64-bit content hash."""
    if isinstance(s, str):
        s = s.encode("utf-8")
    return int.from_bytes(hashlib.blake2b(s, digest_size=8).digest(), "big")


def md5_hash64(s: str | bytes) -> int:
    """Stable unsigned 64-bit hash replicable in ANSI-SQL engines:
    equals DuckDB ``CAST('0x' || substr(md5(x), 1, 16) AS UBIGINT)``
    (big-endian first 8 bytes of the md5 digest). Used wherever an
    oracle query must recompute the same hash in SQL (simhash word
    votes)."""
    if isinstance(s, str):
        s = s.encode("utf-8")
    return int.from_bytes(hashlib.md5(s).digest()[:8], "big")


def md5_hash64_batch(strings) -> "np.ndarray":
    """Vectorized-ish md5_hash64 over an iterable of strings: hashes
    each UNIQUE value once and scatters back (the unique-then-scatter
    trick; dup-heavy columns pay one hash per distinct value)."""
    arr = np.asarray(list(strings), dtype=object)
    uniq, inv = np.unique(arr, return_inverse=True)
    h = np.fromiter((md5_hash64(u) for u in uniq),
                    dtype=np.uint64, count=len(uniq))
    return h[inv]


def stable_hash64_batch(strings) -> "np.ndarray":
    """unique-then-scatter blake2b-64 over an iterable of strings."""
    arr = np.asarray(list(strings), dtype=object)
    if arr.size == 0:
        return np.empty(0, dtype=np.uint64)
    uniq, inv = np.unique(arr, return_inverse=True)
    h = np.fromiter((stable_hash64(u) for u in uniq),
                    dtype=np.uint64, count=len(uniq))
    return h[inv]


def stable_hash32(s: str | bytes) -> int:
    if isinstance(s, str):
        s = s.encode("utf-8")
    return int.from_bytes(hashlib.blake2b(s, digest_size=4).digest(), "big")


def conv_seed(conv_id: str) -> int:
    """Deterministic per-conversation RNG seed (SURVEY.md §2.5: per-doc
    seeds replace the reference's order-dependent global random state)."""
    return stable_hash32("seed::" + conv_id)


def get_edit_distance(str1: str, str2: str) -> int:
    """Levenshtein distance, same algorithm as the reference
    (``/root/reference/jerex/util.py:93-106``)."""
    if len(str1) > len(str2):
        str1, str2 = str2, str1
    if not str1:
        return len(str2)
    if str1 == str2:
        return 0
    if len(str2) <= 48:
        # short strings: plain two-row DP beats numpy's per-op overhead
        prev = list(range(len(str1) + 1))
        for i2, c2 in enumerate(str2):
            cur = [i2 + 1]
            append = cur.append
            for i1, c1 in enumerate(str1):
                if c1 == c2:
                    append(prev[i1])
                else:
                    append(1 + min(prev[i1], prev[i1 + 1], cur[-1]))
            prev = cur
        return prev[-1]
    # Wagner-Fischer with numpy row updates, vectorized over the shorter
    # string. The left-to-right dependency cur[j] = min(..., cur[j-1]+1)
    # is resolved with a min-accumulate over (c[k] - k):
    #   final[j] = min_{k<=j}(c[k] + (j-k)) = j + min_{k<=j}(c[k]-k)
    a = np.frombuffer(str1.encode("utf-32-le"), dtype=np.uint32)
    b = np.frombuffer(str2.encode("utf-32-le"), dtype=np.uint32)
    n = a.size
    idx = np.arange(n + 1, dtype=np.int64)
    prev = idx.copy()
    c = np.empty(n + 1, dtype=np.int64)
    for i2 in range(b.size):
        c[0] = i2 + 1
        np.minimum(prev[:-1] + (a != b[i2]), prev[1:] + 1, out=c[1:])
        prev = np.minimum.accumulate(c - idx) + idx
    return int(prev[-1])


def edit_distances_batch(pairs: list[tuple[str, str]]) -> "np.ndarray":
    """Levenshtein over MANY string pairs at once: one padded uint32
    matrix per side, one vectorized Wagner-Fischer row update per DP
    row ACROSS all pairs (the left-to-right ``cur[j-1]+1`` dependency
    resolved with the same min-accumulate identity as the scalar
    numpy path in ``get_edit_distance``). Each pair's result is read
    off at its own (len_a, len_b) cell, so padding never leaks into a
    shorter pair's answer. Replaces P Python DP loops with
    ``max_len_b`` numpy ops of width ``P × max_len_a`` — the win that
    makes per-doc coref ED (J3) vectorizable."""
    P = len(pairs)
    out = np.zeros(P, dtype=np.int64)
    a_strs: list[str] = []
    b_strs: list[str] = []
    idxs: list[int] = []
    for i, (x, y) in enumerate(pairs):
        if len(x) > len(y):
            x, y = y, x
        if not x:
            out[i] = len(y)
        elif x == y:
            out[i] = 0
        else:
            a_strs.append(x)
            b_strs.append(y)
            idxs.append(i)
    if not a_strs:
        return out
    la = np.asarray([len(s) for s in a_strs], dtype=np.int64)
    lb = np.asarray([len(s) for s in b_strs], dtype=np.int64)
    A, B = int(la.max()), int(lb.max())
    n = len(a_strs)
    am = np.zeros((n, A), dtype=np.uint32)
    bm = np.zeros((n, B), dtype=np.uint32)
    for r, s in enumerate(a_strs):
        am[r, :la[r]] = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
    for r, s in enumerate(b_strs):
        bm[r, :lb[r]] = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
    idx = np.arange(A + 1, dtype=np.int64)
    prev = np.broadcast_to(idx, (n, A + 1)).copy()
    res = np.empty(n, dtype=np.int64)
    c = np.empty_like(prev)
    rows = np.arange(n)
    for i2 in range(B):
        c[:, 0] = i2 + 1
        np.minimum(prev[:, :-1] + (am != bm[:, i2:i2 + 1]),
                   prev[:, 1:] + 1, out=c[:, 1:])
        prev = np.minimum.accumulate(c - idx, axis=1) + idx
        done = lb == i2 + 1
        if done.any():
            res[done] = prev[rows[done], la[done]]
    out[np.asarray(idxs, dtype=np.int64)] = res
    return out


def jaro_winkler_batch(pairs: list[tuple[str, str]]) -> "np.ndarray":
    """Jaro-Winkler similarity over MANY string pairs at once (Winkler
    '90: prefix scale 0.1 over up to 4 chars, boost only when Jaro >
    0.7 — DuckDB ``jaro_winkler_similarity`` semantics, verified
    bit-identical on non-empty strings; the one divergence is
    ``('','')`` where DuckDB returns 0.0, matched here). The Jaro
    matching loop runs once per LEFT position across ALL pairs: each
    step builds an (n, B) validity mask (inside the per-pair window,
    unmatched, equal char) and takes the leftmost hit with one
    ``argmax`` — P Python greedy loops become ``max_len_a`` numpy
    steps. Transpositions come from stable-sorting matched chars to
    the front of each row (order preserved) and counting positional
    mismatches. All float expressions keep the scalar association
    ``(m/la + m/lb + (m-t)/m) / 3`` and ``j + l*0.1*(1-j)`` so results
    are bit-stable against a scalar replay."""
    P = len(pairs)
    out = np.zeros(P, dtype=np.float64)
    a_strs: list[str] = []
    b_strs: list[str] = []
    idxs: list[int] = []
    for i, (x, y) in enumerate(pairs):
        if not x or not y:
            out[i] = 0.0          # DuckDB: empty side ⇒ 0 (incl. both)
        elif x == y:
            out[i] = 1.0
        else:
            a_strs.append(x)
            b_strs.append(y)
            idxs.append(i)
    if not a_strs:
        return out
    la = np.asarray([len(s) for s in a_strs], dtype=np.int64)
    lb = np.asarray([len(s) for s in b_strs], dtype=np.int64)
    A, B = int(la.max()), int(lb.max())
    n = len(a_strs)
    am = np.zeros((n, A), dtype=np.uint32)
    bm_ = np.zeros((n, B), dtype=np.uint32)
    for r, s in enumerate(a_strs):
        am[r, :la[r]] = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
    for r, s in enumerate(b_strs):
        bm_[r, :lb[r]] = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
    w = np.maximum(np.maximum(la, lb) // 2 - 1, 0)
    ma = np.zeros((n, A), dtype=bool)
    mb = np.zeros((n, B), dtype=bool)
    jpos = np.arange(B, dtype=np.int64)[None, :]
    rows = np.arange(n)
    for i in range(A):
        valid = ((~mb) & (bm_ == am[:, i:i + 1])
                 & (jpos < lb[:, None])
                 & (jpos >= (i - w)[:, None])
                 & (jpos <= (i + w)[:, None])
                 & (i < la)[:, None])
        hit = valid.any(axis=1)
        j = valid.argmax(axis=1)
        ma[hit, i] = True
        mb[rows[hit], j[hit]] = True
    m = ma.sum(axis=1).astype(np.int64)
    # matched chars, original order, pushed to the row front
    ia = np.argsort(~ma, axis=1, kind="stable")
    aseq = np.take_along_axis(am, ia, axis=1)
    ib = np.argsort(~mb, axis=1, kind="stable")
    bseq = np.take_along_axis(bm_, ib, axis=1)
    K = min(A, B)
    pos = np.arange(K, dtype=np.int64)[None, :]
    t = (((aseq[:, :K] != bseq[:, :K]) & (pos < m[:, None]))
         .sum(axis=1).astype(np.int64) // 2)
    mf = m.astype(np.float64)
    laf = la.astype(np.float64)
    lbf = lb.astype(np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        jr = (mf / laf + mf / lbf + (mf - t) / mf) / 3.0
    jr = np.where(m == 0, 0.0, jr)
    Lp = min(4, A, B)
    if Lp:
        eq = ((am[:, :Lp] == bm_[:, :Lp])
              & (np.arange(Lp, dtype=np.int64)[None, :]
                 < np.minimum(la, lb)[:, None]))
        pre = np.cumprod(eq, axis=1).sum(axis=1).astype(np.float64)
    else:
        pre = np.zeros(n, dtype=np.float64)
    jw = np.where(jr > 0.7, jr + pre * 0.1 * (1.0 - jr), jr)
    out[np.asarray(idxs, dtype=np.int64)] = jw
    return out


_PUNCT = set(".,;:!?\"'`()[]{}<>|/\\-_=+*&^%$#@~")


def normalize_surface(s: str) -> str:
    """Canonicalization key: casefold, strip punctuation, collapse
    whitespace. Reference analogue: the cluster representative phrase is
    the first mention's raw phrase (``datasets.py:126-128``); we add the
    normalization required by the north rule's canonicalization stage."""
    out = []
    for ch in s:
        if ch in _PUNCT:
            out.append(" ")
        else:
            out.append(ch.lower())
    return " ".join("".join(out).split())


def flatten(list_of_lists):
    """Reference ``util.py:89-90``."""
    return [i for p in list_of_lists for i in p]


def padded_stack(arrays, pad_value=0) -> np.ndarray:
    """Stack variable-length 1-D/2-D arrays with right padding — the
    collate primitive a real model path needs (reference
    ``util.py:43-54`` / ``sampling_common.py:510-523``). Batching
    happens inside the scorer actor here, so this is only used at the
    model boundary, never in the Arrow dataflow."""
    arrays = [np.asarray(a) for a in arrays]
    if not arrays:
        return np.empty((0,))
    ndim = arrays[0].ndim
    max_shape = tuple(max(a.shape[d] for a in arrays) for d in range(ndim))
    out = np.full((len(arrays),) + max_shape, pad_value,
                  dtype=arrays[0].dtype)
    for i, a in enumerate(arrays):
        sl = (i,) + tuple(slice(0, s) for s in a.shape)
        out[sl] = a
    return out


def arrow_flat_with_offsets(col, dtype=None):
    """Arrow list column → (flat values ndarray, int64 row offsets):
    the zero-copy-when-possible iteration primitive shared by the
    scorer and training stages (slice row d as
    ``vals[offs[d]:offs[d + 1]]``)."""
    import numpy as np
    import pyarrow.compute as pc

    lens = pc.list_value_length(col).to_numpy(zero_copy_only=False)
    offs = np.concatenate(([0], np.cumsum(lens))).astype(np.int64)
    vals = pc.list_flatten(col).to_numpy(zero_copy_only=False)
    if dtype is not None:
        vals = vals.astype(dtype)
    return vals, offs
