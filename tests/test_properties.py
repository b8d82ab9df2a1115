"""Property-based kernel tests (hypothesis): the vectorized/bit-parallel
kernels must agree with direct per-element reference formulations on
arbitrary inputs, not just the fixture corpus. Pure-Python — no Ray."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from bibexpy_ray.functions import hashing
from bibexpy_ray.functions.normalize import normalize_doi, normalize_title
from bibexpy_ray.functions.similarity import (
    jaccard_sets,
    jaccard_sorted_arrays,
    jaro,
    jaro_winkler,
    jaro_winkler_batch,
)

TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=60
)
ASCII = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=40
)


def _jaro_reference(s1: str, s2: str) -> float:
    """Textbook double-loop Jaro — the direct formulation the bit-parallel
    kernel must reproduce bit-exactly."""
    if s1 == s2:
        return 1.0
    if not s1 or not s2:
        return 0.0
    len1, len2 = len(s1), len(s2)
    match_dist = max(max(len1, len2) // 2 - 1, 0)
    m1 = [False] * len1
    m2 = [False] * len2
    matches = 0
    for i, c in enumerate(s1):
        lo, hi = max(0, i - match_dist), min(len2, i + match_dist + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(len1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (matches / len1 + matches / len2 + (matches - t) / matches) / 3


@given(TEXT, TEXT)
@settings(max_examples=300, deadline=None)
def test_jaro_bitparallel_equals_reference(a, b):
    assert jaro(a, b) == _jaro_reference(a, b)


@given(st.lists(st.tuples(ASCII, ASCII), min_size=1, max_size=20))
@settings(max_examples=100, deadline=None)
def test_jaro_winkler_batch_equals_scalar(pairs):
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    batch = jaro_winkler_batch(a, b)
    for i in range(len(pairs)):
        assert batch[i] == jaro_winkler(a[i], b[i])


@given(st.sets(st.integers(0, 10**9)), st.sets(st.integers(0, 10**9)))
@settings(max_examples=200, deadline=None)
def test_jaccard_sorted_equals_set(sa, sb):
    a = np.array(sorted(sa), dtype=np.uint64)
    b = np.array(sorted(sb), dtype=np.uint64)
    assert jaccard_sorted_arrays(a, b) == jaccard_sets(sa, sb)


@given(st.lists(TEXT, min_size=1, max_size=16))
@settings(max_examples=100, deadline=None)
def test_text_hash_arrow_equals_list_path(texts):
    via_list = hashing.text_hash_u64(texts)
    via_arrow = hashing.text_hash_u64(pa.array(texts, type=pa.string()))
    np.testing.assert_array_equal(via_list, via_arrow)


@given(st.lists(TEXT, min_size=1, max_size=12), st.integers(2, 7))
@settings(max_examples=100, deadline=None)
def test_shingles_match_per_row_recompute(texts, k):
    """Vectorized batch shingling == shingling each row alone (flat-buffer
    offsets carry no cross-row contamination)."""
    flat, offs = hashing.shingle_hashes(texts, k)
    for i, t in enumerate(texts):
        row = flat[offs[i] : offs[i + 1]]
        alone, ao = hashing.shingle_hashes([t], k)
        np.testing.assert_array_equal(row, alone)
        n_bytes = len(t.encode("utf-8"))
        assert len(row) == max(0, n_bytes - k + 1)


@given(st.lists(st.lists(st.integers(0, 2**63), min_size=0, max_size=30),
                min_size=1, max_size=8))
@settings(max_examples=100, deadline=None)
def test_minhash_permutation_invariance(rows):
    """MinHash of a row depends only on its shingle SET (order/dup free)."""
    flat = np.array([v for r in rows for v in r], dtype=np.uint64)
    offs = np.cumsum([0] + [len(r) for r in rows])
    flat_u, offs_u = hashing.unique_per_row(flat, offs)
    sig = hashing.minhash_signatures(flat_u, offs_u, num_perms=16)
    # shuffled + duplicated input rows give the identical signature
    rng = np.random.default_rng(0)
    rows2 = [list(rng.permutation(np.array(r + r, dtype=np.uint64))) for r in rows]
    flat2 = np.array([v for r in rows2 for v in r], dtype=np.uint64)
    offs2 = np.cumsum([0] + [len(r) for r in rows2])
    f2u, o2u = hashing.unique_per_row(flat2, offs2)
    sig2 = hashing.minhash_signatures(f2u, o2u, num_perms=16)
    np.testing.assert_array_equal(sig, sig2)


@given(TEXT)
@settings(max_examples=200, deadline=None)
def test_normalize_title_idempotent(t):
    once = normalize_title(t)
    assert normalize_title(once) == once


@given(TEXT)
@settings(max_examples=200, deadline=None)
def test_normalize_doi_idempotent(t):
    once = normalize_doi(t)
    assert normalize_doi(once) == once


# ---------------------------------------------------------------------------
# Specialized-merger invariants (pure functions, hypothesis)
# ---------------------------------------------------------------------------

_kw = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd"), max_codepoint=0x24F),
    min_size=0, max_size=12,
)
_kw_list = st.lists(_kw, max_size=6).map("; ".join)


@given(_kw_list, _kw_list)
def test_merge_keywords_sorted_unique_idempotent(a, b):
    from bibexpy_ray.functions.fieldmerge import merge_keyword_lists

    out = merge_keyword_lists(a, b)
    parts = out.split("; ") if out else []
    # case-insensitively unique and sorted
    uppers = [p.upper() for p in parts]
    assert uppers == sorted(uppers)
    assert len(set(uppers)) == len(uppers)
    # merging the result with itself is a fixed point
    assert merge_keyword_lists(out, out) == out


@given(_kw_list, _kw_list)
def test_merge_author_fields_prefix_preserved(a, b):
    from bibexpy_ray.functions.fieldmerge import merge_author_fields

    out = merge_author_fields(a, b)
    wos = [x.strip() for x in (a or "").split(";") if x.strip()]
    # WoS authors always survive verbatim, in order, as a prefix
    assert [x.strip() for x in out.split(";") if x.strip()][: len(wos)] == wos


@given(_kw, _kw)
def test_two_source_pickers_always_pick_a_side(w, s):
    from bibexpy_ray.functions.fieldmerge import (
        merge_address_fields,
        merge_reprint_author,
        merge_source_title,
        merge_url,
    )

    for fn in (merge_address_fields, merge_reprint_author, merge_url):
        out = fn(w, s)
        assert out in (w.strip(), s.strip(), "")
    # source_title collapses whitespace before picking
    out = merge_source_title(w, s)
    import re as _re

    assert out in (_re.sub(r"\s+", " ", w.strip()), _re.sub(r"\s+", " ", s.strip()), "")


@given(st.lists(st.frozensets(st.integers(0, 8), max_size=4), max_size=12))
def test_field_components_is_a_partition_refining_token_overlap(sets):
    from bibexpy_ray.pipelines.entity import field_components

    labels = field_components(list(sets))
    assert len(labels) == len(sets)
    # same label => connected; directly-overlapping sets always share a label
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            if sets[i] & sets[j]:
                assert labels[i] == labels[j]
    # labels are the min record index of their component
    for i, l in enumerate(labels):
        assert l <= i
        assert labels[l] == l


# ---------------------------------------------------------------------------
# XLSX round-trip (stdlib sink/source)
# ---------------------------------------------------------------------------

_XL_TEXT = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs", "Cc"),  # no surrogates / control chars
    ),
    max_size=40,
)


@given(
    st.lists(_XL_TEXT, min_size=1, max_size=8),
    st.lists(st.integers(-(2**53), 2**53), min_size=1, max_size=8),
    st.lists(
        st.floats(allow_nan=False, allow_infinity=False, width=64),
        min_size=1,
        max_size=8,
    ),
)
@settings(max_examples=40, deadline=None)
def test_xlsx_roundtrip_property(strs, ints, floats):
    import pandas as pd

    from bibexpy_ray.sources.xlsx import read_xlsx, write_xlsx

    n = min(len(strs), len(ints), len(floats))
    df = pd.DataFrame(
        {"s": strs[:n], "i": ints[:n], "f": floats[:n]}
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "t.xlsx")
        write_xlsx(df, p)
        got = read_xlsx(p)["Sheet1"]
    assert got["s"].tolist() == df["s"].tolist()
    assert [int(v) for v in got["i"]] == df["i"].tolist()
    assert [float(v) for v in got["f"]] == df["f"].tolist()


# ---------------------------------------------------------------------------
# uid collision-rule replay (pure-function invariants, no Ray)
# ---------------------------------------------------------------------------

_IDS = st.lists(
    st.text(alphabet=st.characters(min_codepoint=33, max_codepoint=126),
            min_size=1, max_size=12),
    min_size=1,
    max_size=60,
    unique=True,
)


@given(_IDS, st.integers(6, 16))
@settings(max_examples=30, deadline=None)
def test_uid_replay_without_rules_is_masked_hash(ids, bits):
    import numpy as np
    import pyarrow as pa

    from bibexpy_ray.functions import hashing
    from bibexpy_ray.stages.signer import replay_uid_rules, uid_base

    arr = pa.array(ids, type=pa.string())
    got = replay_uid_rules(arr, [], bits)
    want = hashing.text_hash_u64(arr) & np.uint64((1 << bits) - 1)
    assert (got == want).all()
    assert (got == uid_base(arr, bits)).all()


@given(_IDS, st.integers(8, 14))
@settings(max_examples=20, deadline=None)
def test_uid_salted_rule_keeps_keeper_and_moves_losers(ids, bits):
    """Simulate one resolver round by hand: for every colliding uid the
    min-witness row must keep its uid under replay and every other row of
    that uid must move off it (to the salted hash)."""
    import numpy as np
    import pyarrow as pa

    from bibexpy_ray.functions import hashing
    from bibexpy_ray.stages.signer import (
        UID_SALT_SEEDS,
        replay_uid_rules,
        uid_base,
        uid_witness,
    )

    arr = pa.array(ids, type=pa.string())
    u = uid_base(arr, bits)
    w = uid_witness(arr)
    # build the round-1 rule exactly as the resolver would
    order = np.lexsort((w, u))
    us, ws = u[order], w[order]
    starts = np.flatnonzero(np.r_[True, us[1:] != us[:-1]])
    counts = np.r_[starts[1:], len(us)] - starts
    coll = starts[counts >= 2]
    if coll.size == 0:
        return
    rules = [(us[coll], ws[coll], UID_SALT_SEEDS[0])]
    got = replay_uid_rules(arr, rules, bits)
    mask = np.uint64((1 << bits) - 1)
    for i, ident in enumerate(ids):
        if u[i] in set(int(x) for x in us[coll]):
            k = np.searchsorted(us[coll], u[i])
            if w[i] == ws[coll][k]:
                assert got[i] == u[i], "keeper must keep its uid"
            else:
                salted = hashing.text_hash_u64([ident], seed=UID_SALT_SEEDS[0])[0]
                assert got[i] == (salted & mask), "loser must take the salted uid"
        else:
            assert got[i] == u[i]
