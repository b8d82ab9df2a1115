"""String-similarity kernels: Jaro, Jaro-Winkler, Jaccard.

Jaro / Jaro-Winkler semantics match the reference implementation
(/root/reference/apps/api/services/disambiguation/similarity.py:27-72): match
window ``max(len)//2 - 1``, half-transposition count, and a Winkler bonus of up
to 4 common prefix chars at p=0.1. These run on *candidate pairs only* (post-LSH,
a tiny fraction of the data), so a tight pure-Python scalar plus a thin batch
wrapper is the right shape; the O(n^2)-ish all-pairs work never happens here.
"""

from __future__ import annotations

import numpy as np


def jaro(s1: str, s2: str) -> float:
    """Classic Jaro similarity in [0, 1] (reference similarity.py:27-60)."""
    if s1 == s2:
        return 1.0
    if not s1 or not s2:
        return 0.0
    len1, len2 = len(s1), len(s2)
    match_dist = max(len1, len2) // 2 - 1
    if match_dist < 0:
        match_dist = 0
    m1 = [False] * len1
    m2 = [False] * len2
    matches = 0
    for i, c in enumerate(s1):
        start = i - match_dist
        if start < 0:
            start = 0
        end = i + match_dist + 1
        if end > len2:
            end = len2
        for j in range(start, end):
            if m2[j] or s2[j] != c:
                continue
            m1[i] = m2[j] = True
            matches += 1
            break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(len1):
        if not m1[i]:
            continue
        while not m2[k]:
            k += 1
        if s1[i] != s2[k]:
            t += 1
        k += 1
    t /= 2
    return (matches / len1 + matches / len2 + (matches - t) / matches) / 3


def jaro_winkler(s1: str, s2: str, p: float = 0.1) -> float:
    """Jaro-Winkler: Jaro plus up-to-4-char common-prefix bonus
    (reference similarity.py:63-72)."""
    j = jaro(s1, s2)
    prefix = 0
    for c1, c2 in zip(s1[:4], s2[:4]):
        if c1 != c2:
            break
        prefix += 1
    return j + prefix * p * (1 - j)


def jaro_winkler_batch(a: list[str] | np.ndarray, b: list[str] | np.ndarray) -> np.ndarray:
    """Jaro-Winkler over aligned pairs (used inside verify map_batches)."""
    return np.fromiter((jaro_winkler(x, y) for x, y in zip(a, b)), dtype=np.float64, count=len(a))


def jaccard_sets(a: set, b: set) -> float:
    """Exact Jaccard similarity of two sets."""
    if not a and not b:
        return 0.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


def jaccard_sorted_arrays(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two *sorted unique* uint64 arrays (vectorized intersect)."""
    if a.size == 0 and b.size == 0:
        return 0.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    return inter / (a.size + b.size - inter)
