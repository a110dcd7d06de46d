"""Unit tests: edit distance (vs the reference algorithm re-derived in
pure Python), normalization, stable hashing."""

import random

from jerex_ray.util import (conv_seed, get_edit_distance, normalize_surface,
                            stable_hash64)


def _naive_levenshtein(s1: str, s2: str) -> int:
    # textbook Wagner-Fischer, the semantics of reference util.py:93-106
    if len(s1) > len(s2):
        s1, s2 = s2, s1
    distances = list(range(len(s1) + 1))
    for i2, c2 in enumerate(s2):
        row = [i2 + 1]
        for i1, c1 in enumerate(s1):
            if c1 == c2:
                row.append(distances[i1])
            else:
                row.append(1 + min(distances[i1], distances[i1 + 1], row[-1]))
        distances = row
    return distances[-1]


def test_edit_distance_matches_reference_algorithm():
    rng = random.Random(42)
    alphabet = "abcdef .ü"
    for _ in range(300):
        a = "".join(rng.choices(alphabet, k=rng.randint(0, 20)))
        b = "".join(rng.choices(alphabet, k=rng.randint(0, 20)))
        assert get_edit_distance(a, b) == _naive_levenshtein(a, b)


def test_edit_distance_edges():
    assert get_edit_distance("", "") == 0
    assert get_edit_distance("", "abc") == 3
    assert get_edit_distance("abc", "abc") == 0
    assert get_edit_distance("kitten", "sitting") == 3


def test_edit_distances_batch_matches_scalar():
    """The batched multi-pair Levenshtein (one vectorized DP across
    all pairs, per-pair result read at its own (len_a, len_b) cell)
    equals the scalar path on random pairs of mixed lengths, empties,
    equal strings, and >48-char strings (both scalar code paths)."""
    from jerex_ray.util import edit_distances_batch
    rng = random.Random(7)
    alphabet = "abcdef .ü"
    pairs = [("", ""), ("", "abc"), ("same", "same"),
             ("x" * 60, "x" * 59 + "y")]
    pairs += [("".join(rng.choices(alphabet, k=rng.randint(0, 30))),
               "".join(rng.choices(alphabet, k=rng.randint(0, 30))))
              for _ in range(200)]
    got = edit_distances_batch(pairs)
    assert [int(v) for v in got] == \
        [get_edit_distance(a, b) for a, b in pairs]


def test_normalize_surface():
    assert normalize_surface("  Acme,  Corp. ") == "acme corp"
    assert normalize_surface("ACME-CORP") == "acme corp"
    assert normalize_surface("") == ""


def test_stable_hashes_deterministic():
    assert stable_hash64("conv-1") == stable_hash64("conv-1")
    assert stable_hash64("conv-1") != stable_hash64("conv-2")
    assert conv_seed("a") == conv_seed("a")


def test_jaro_winkler_batch_matches_scalar_and_duckdb():
    import duckdb
    import random
    from jerex_ray.util import jaro_winkler_batch

    def jaro_scalar(a, b):
        la, lb = len(a), len(b)
        if la == 0 or lb == 0:
            return 0.0
        w = max(max(la, lb) // 2 - 1, 0)
        ma, mb, m = [False] * la, [False] * lb, 0
        for i in range(la):
            for j in range(max(0, i - w), min(lb, i + w + 1)):
                if not mb[j] and a[i] == b[j]:
                    ma[i] = mb[j] = True
                    m += 1
                    break
        if m == 0:
            return 0.0
        t, k = 0, 0
        for i in range(la):
            if ma[i]:
                while not mb[k]:
                    k += 1
                if a[i] != b[k]:
                    t += 1
                k += 1
        t //= 2
        return (m / la + m / lb + (m - t) / m) / 3.0

    def jw_scalar(a, b):
        j = jaro_scalar(a, b)
        if j <= 0.7:
            return j
        p = 0
        for x, y in zip(a, b):
            if x == y and p < 4:
                p += 1
            else:
                break
        return j + p * 0.1 * (1 - j)

    rng = random.Random(23)
    alphabet = "abcdef gh"
    pairs = [("", ""), ("", "x"), ("martha", "marhta"),
             ("dixon", "dicksonx"), ("same", "same"),
             ("jon smith", "john smith")]
    pairs += [("".join(rng.choices(alphabet, k=rng.randint(1, 14))),
               "".join(rng.choices(alphabet, k=rng.randint(1, 14))))
              for _ in range(400)]
    got = jaro_winkler_batch(pairs)
    # bit parity with the scalar greedy algorithm (non-empty pairs)
    for (a, b), g in zip(pairs, got):
        exp = 0.0 if not (a and b) else jw_scalar(a, b)
        assert g == exp, (a, b, g, exp)
    # and with DuckDB's native kernel (the oracle function)
    con = duckdb.connect()
    for (a, b), g in zip(pairs[:120], got[:120]):
        d = con.execute("SELECT jaro_winkler_similarity(?, ?)",
                        [a, b]).fetchone()[0]
        if a or b:  # ('','') is the documented divergence
            assert g == d, (a, b, g, d)
