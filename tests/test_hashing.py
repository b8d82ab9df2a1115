"""Unit tests for the vectorized hashing kernels."""

import numpy as np
import pyarrow as pa
import pytest

from bibexpy_ray.functions import hashing as H


def _brute_shingles(s: str, k: int = 5) -> set[bytes]:
    b = s.encode("utf-8")
    return {b[i : i + k] for i in range(len(b) - k + 1)}


def test_shingle_counts_match_bruteforce():
    texts = ["hello world", "", "abcd", "abcde", "abcdef", "yyyyyyyy"]
    flat, offs = H.shingle_hashes(texts, 5)
    counts = np.diff(offs)
    expected = [max(0, len(t.encode()) - 4) for t in texts]
    assert counts.tolist() == expected


def test_shingle_hashes_equal_for_equal_windows():
    texts = ["abcdefgh", "xabcdefgh"]  # share the windows of 'abcdefgh'
    flat, offs = H.shingle_hashes(texts, 5)
    s0 = set(flat[offs[0] : offs[1]].tolist())
    s1 = set(flat[offs[1] : offs[2]].tolist())
    assert s0 <= s1
    assert len(s1) == len(s0) + 1


def test_unique_per_row():
    texts = ["aaaaaaaaaa", "abcdefghij"]
    flat, offs = H.shingle_hashes(texts, 5)
    uf, uo = H.unique_per_row(flat, offs)
    assert np.diff(uo).tolist() == [1, 6]  # 'aaaaa' repeated; all distinct


def test_minhash_similarity_estimates_jaccard():
    rng = np.random.default_rng(0)
    base = "the quick brown fox jumps over the lazy dog " * 3
    variant = base[:-10]
    texts = [base, variant, "completely unrelated text about other topics entirely"]
    flat, offs = H.shingle_hashes(texts, 5)
    flat, offs = H.unique_per_row(flat, offs)
    sig = H.minhash_signatures(flat, offs, 128)
    sets = [set(flat[offs[i] : offs[i + 1]].tolist()) for i in range(3)]
    true_j = len(sets[0] & sets[1]) / len(sets[0] | sets[1])
    est_j = (sig[0] == sig[1]).mean()
    assert abs(true_j - est_j) < 0.15
    assert (sig[0] == sig[2]).mean() < 0.15


def test_minhash_empty_rows_get_sentinel():
    flat, offs = H.shingle_hashes(["", "abcdefg"], 5)
    flat, offs = H.unique_per_row(flat, offs)
    sig = H.minhash_signatures(flat, offs, 16)
    assert (sig[0] == np.iinfo(np.uint64).max).all()
    assert not (sig[1] == np.iinfo(np.uint64).max).all()


def test_simhash_close_for_similar_text():
    texts = ["the quick brown fox jumps over the lazy dog",
             "the quick brown fox jumps over the lazy cat",
             "entirely different content matter here now"]
    flat, offs = H.shingle_hashes(texts, 5)
    sh = H.simhash_signatures(flat, offs)
    d01 = H.hamming64(sh[0:1], sh[1:2])[0]
    d02 = H.hamming64(sh[0:1], sh[2:3])[0]
    assert d01 < d02
    assert d01 <= 12


def test_band_keys_identical_iff_band_rows_equal():
    sig = np.arange(256, dtype=np.uint64).reshape(2, 128)
    sig[1] = sig[0]
    keys = H.band_keys(sig, 64, 2)
    assert (keys[0] == keys[1]).all()
    sig2 = sig.copy()
    sig2[1, 0] += 1  # corrupt band 0 only
    keys2 = H.band_keys(sig2, 64, 2)
    assert keys2[0, 0] != keys2[1, 0]
    assert (keys2[0, 1:] == keys2[1, 1:]).all()


def test_phash_band_keys_guarantee():
    # any pair at Hamming <= 3 shares at least one of 4 byte-slices
    base = np.array([0x0123456789ABCDEF], dtype=np.int64)
    flipped = np.array([0x0123456789ABCDEF ^ 0b1011], dtype=np.int64)  # 3 bits flipped
    ka = H.phash_band_keys(base, 4)
    kb = H.phash_band_keys(flipped, 4)
    assert (ka == kb).any()


def test_text_hash_deterministic_and_distinct():
    a = H.text_hash_u64(["abc", "abc", "abd", ""])
    assert a[0] == a[1]
    assert a[0] != a[2]
    b = H.text_hash_u64(pa.array(["abc"]))
    assert a[0] == b[0]


def test_hamming64():
    a = np.array([0], dtype=np.uint64)
    b = np.array([0xFFFFFFFFFFFFFFFF], dtype=np.uint64)
    assert H.hamming64(a, b)[0] == 64
    assert H.hamming64(a, a)[0] == 0


# ---------------------------------------------------------------------------
# similarity kernels: bit-parallel Jaro parity + sound DuckDB prune bound
# ---------------------------------------------------------------------------


def _jaro_textbook(s1, s2):
    """Direct double-loop Jaro (the reference formulation,
    /root/reference/apps/api/services/disambiguation/similarity.py:27-60) —
    kept here as the parity oracle for the bit-parallel implementation."""
    if s1 == s2:
        return 1.0
    if not s1 or not s2:
        return 0.0
    len1, len2 = len(s1), len(s2)
    md = max(len1, len2) // 2 - 1
    if md < 0:
        md = 0
    m1 = [False] * len1
    m2 = [False] * len2
    matches = 0
    for i, c in enumerate(s1):
        for j in range(max(0, i - md), min(i + md + 1, len2)):
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
    return (matches / len1 + matches / len2 + (matches - t / 2) / matches) / 3


def _random_pairs(n, seed):
    import random
    import string

    rng = random.Random(seed)
    vocab = [
        "".join(rng.choices(string.ascii_lowercase, k=rng.randint(1, 9)))
        for _ in range(200)
    ]
    pairs = []
    for i in range(n):
        a = " ".join(rng.choices(vocab, k=rng.randint(0, 15)))
        r = i % 4
        if r == 0:
            toks = a.split()
            rng.shuffle(toks)
            b = " ".join(toks)
        elif r == 1:
            b = a
        elif r == 2:
            b = a[rng.randint(0, max(1, len(a) // 2)):]
        else:
            b = " ".join(rng.choices(vocab, k=rng.randint(0, 15)))
        pairs.append((a, b))
    pairs += [("", ""), ("a", ""), ("", "b"), ("ab", "ba"),
              ("dwayne", "duane"), ("martha", "marhta")]
    return pairs


def test_jaro_bitparallel_matches_textbook():
    from bibexpy_ray.functions.similarity import jaro

    for a, b in _random_pairs(3000, seed=5):
        assert abs(jaro(a, b) - _jaro_textbook(a, b)) < 1e-12, (a, b)


def test_duck_jaro_upper_bounds_ours():
    """jaro_floor_mask soundness: DuckDB jaro >= ours (one-sided), so a pair
    pruned by the floor can never reach the borderline threshold."""
    import pandas as pd

    duckdb = pytest.importorskip("duckdb")
    from bibexpy_ray.functions.similarity import jaro, jaro_floor_mask, jaro_winkler

    pairs = [(a, b) for a, b in _random_pairs(4000, seed=6) if a and b]
    con = duckdb.connect()
    df = pd.DataFrame(pairs, columns=["a", "b"])
    duck = con.execute(
        "select jaro_similarity(a, b) as j from df"
    ).df()["j"].to_numpy()
    ours = np.array([jaro(a, b) for a, b in pairs])
    assert (duck - ours).min() > -1e-9

    a = np.array([p[0] for p in pairs], dtype=object)
    b = np.array([p[1] for p in pairs], dtype=object)
    mask = jaro_floor_mask(a, b, 0.8)
    jw = np.array([jaro_winkler(x, y) for x, y in pairs])
    assert not ((jw >= 0.8) & ~mask).any(), "pruned pair reached the threshold"
