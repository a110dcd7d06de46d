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
