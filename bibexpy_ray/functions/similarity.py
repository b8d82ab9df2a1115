"""String-similarity kernels: Jaro, Jaro-Winkler, Jaccard.

Jaro / Jaro-Winkler semantics: classic Jaro (match window ``max(len)//2 - 1``,
greedy leftmost-available matching, half-transposition count) plus a Winkler
bonus of up to 4 common prefix chars at p=0.1 — the textbook definition the
reference's thresholds are calibrated against (conformance with
/root/reference/apps/api/services/disambiguation/similarity.py:27-72 is
bit-exact; tests/test_fieldmerge_entity.py pins decision-table values).

Implementation is BIT-PARALLEL, not the textbook double loop: per-character
position bitmasks over s2 (arbitrary-precision Python ints), so the greedy
window scan for each s1 character is ``lowest set bit of (mask[c] & window &
~used)`` — O(len1) big-int ops instead of O(len1 × window) char compares
(~4x on 90-char captions; equivalence with the direct formulation is
property-tested in tests/test_hashing.py). These kernels run on *candidate
pairs only* (post-LSH, a tiny fraction of the data); the O(n^2)-ish
all-pairs work never happens here.
"""

from __future__ import annotations

import numpy as np


def jaro(s1: str, s2: str) -> float:
    """Classic Jaro similarity in [0, 1] (bit-parallel; see module docstring)."""
    if s1 == s2:
        return 1.0
    if not s1 or not s2:
        return 0.0
    len1, len2 = len(s1), len(s2)
    match_dist = max(len1, len2) // 2 - 1
    if match_dist < 0:
        match_dist = 0
    # position bitmask of each character of s2
    pm: dict[str, int] = {}
    bit = 1
    for c in s2:
        pm[c] = pm.get(c, 0) | bit
        bit <<= 1
    used2 = 0
    matched1: list[str] = []  # s1's matched chars in i-order
    win_full = (1 << (2 * match_dist + 1)) - 1  # run covering [i-md, i+md]
    get = pm.get
    for i, c in enumerate(s1):
        # window mask [max(0, i-md), i+md] as one shift of the full run
        d = i - match_dist
        window = win_full << d if d >= 0 else win_full >> -d
        avail = get(c, 0) & window & ~used2
        if avail:
            used2 |= avail & -avail  # greedy: leftmost available position
            matched1.append(c)
    matches = len(matched1)
    if matches == 0:
        return 0.0
    # s2's matched chars in j-order = ascending set bits of used2
    t = 0
    u = used2
    for c in matched1:
        low = u & -u
        if s2[low.bit_length() - 1] != c:
            t += 1
        u &= u - 1
    half_t = t / 2
    return (
        matches / len1 + matches / len2 + (matches - half_t) / matches
    ) / 3


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


#: strings longer than this fall back to the scalar kernel inside the batch
#: path (the padded UCS4 matrices grow O(N * maxlen); captions are ~90 chars,
#: so this bound is never hit on the dedup path)
_BATCH_MAX_LEN = 512

#: pairs per vectorized chunk — keeps the N x L2 working matrices L2/L3-cache
#: resident (measured 13 us/pair at 4096 vs 20 us at 16384 on 90-char pairs)
_BATCH_CHUNK = 4096


def _jaro_batch_chunk(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Exact classic Jaro over one chunk of DISTINCT, NON-EMPTY pairs.

    Same greedy leftmost-available matching + half-transposition semantics as
    the scalar :func:`jaro`, vectorized ACROSS pairs: the sequential scan over
    s1's positions stays a Python loop (it is inherently ordered — greedy
    matching consumes s2 positions left to right), but each iteration handles
    every still-active pair with one set of numpy kernels. Equivalence with
    the scalar kernel is property-tested in tests/test_hashing.py.
    """
    n = len(a)
    len1 = np.fromiter((len(x) for x in a), dtype=np.int64, count=n)
    len2 = np.fromiter((len(x) for x in b), dtype=np.int64, count=n)

    # sort by len1 descending: at outer position i the active rows are a
    # PREFIX of the sorted order, so per-iteration state slices are views
    order = np.argsort(-len1, kind="stable")
    a = a[order]
    b = b[order]
    len1 = len1[order]
    len2 = len2[order]

    l1m = int(len1.max())
    l2m = int(len2.max())
    # UCS4 encode: numpy pads with NUL, which never equals a real char
    A = np.array(a.tolist(), dtype=f"U{l1m}").view(np.uint32).reshape(n, l1m)
    B = np.array(b.tolist(), dtype=f"U{l2m}").view(np.uint32).reshape(n, l2m)

    # all-ASCII chunks compare as uint8 (4x less memory traffic); the rare
    # non-Latin-1 chunk stays uint32 — same semantics either way
    if (A.max(initial=0) < 256) and (B.max(initial=0) < 256):
        A = A.astype(np.uint8)
        B = B.astype(np.uint8)

    md = np.maximum(np.maximum(len1, len2) // 2 - 1, 0)
    used = np.zeros((n, l2m), dtype=bool)
    m1 = np.zeros((n, l1m), dtype=A.dtype)  # s1's matched chars, i-order
    mcount = np.zeros(n, dtype=np.int64)
    cols = np.arange(l2m, dtype=np.int64)
    # rows active at position i form the prefix [0, n_active[i]):
    # row r is active iff len1[r] >= i+1 (char at 0-based position i exists)
    n_active = np.searchsorted(-len1, -(np.arange(l1m) + 1), side="right")

    # `free[r, j]` = column j is inside row r's CURRENT match window and not
    # yet consumed. Maintained incrementally: the window at position i is
    # [i-md, i+md+1), so stepping i->i+1 admits one column and retires one —
    # two O(n) scatters instead of rebuilding an O(n*l2m) mask per iteration.
    free = cols < np.minimum(md + 1, len2)[:, None]
    rng_all = np.arange(n)
    avail = np.empty((n, l2m), dtype=bool)
    for i in range(l1m):
        na = int(n_active[i])
        if na == 0:
            break
        c = A[:na, i]
        av = np.equal(B[:na], c[:, None], out=avail[:na])
        av &= free[:na]
        j = av.argmax(axis=1)
        rows = np.flatnonzero(av[np.arange(na), j])
        if rows.size:
            jr = j[rows]
            used[rows, jr] = True
            free[rows, jr] = False
            m1[rows, mcount[rows]] = c[rows]
            mcount[rows] += 1
        # slide every row's window for position i+1 (rows past n_active[i+1]
        # are never read again, so updating them is harmless)
        enter = i + 1 + md
        ok = enter < len2
        free[rng_all[ok], enter[ok]] = True
        leave = i - md
        ok = (leave >= 0) & (leave < len2)  # cols >= len2 were never admitted
        free[rng_all[ok], leave[ok]] = False

    m = mcount.astype(np.float64)
    out = np.zeros(n, dtype=np.float64)
    has = mcount > 0
    if has.any():
        # s2's matched chars in j-order: nonzero() walks row-major, i.e.
        # ascending column within each row — exactly the order the scalar
        # kernel visits used2's set bits
        r2, c2 = np.nonzero(used)
        chars2 = B[r2, c2]
        valid1 = np.arange(l1m) < mcount[:, None]
        chars1 = m1[valid1]  # row-major == i-order per row
        t = np.bincount(r2, weights=(chars1 != chars2), minlength=n)
        with np.errstate(divide="ignore", invalid="ignore"):
            out[has] = (
                m[has] / len1[has]
                + m[has] / len2[has]
                + (m[has] - t[has] / 2) / m[has]
            ) / 3
    inv = np.empty(n, dtype=np.int64)
    inv[order] = np.arange(n)
    return out[inv]


def jaro_batch(a, b) -> np.ndarray:
    """Exact :func:`jaro` over aligned pairs, vectorized across the batch.

    Bit-equivalent to the scalar kernel (IEEE double ops in the same order for
    the final formula); ~10x faster on ~90-char caption pairs. Oversized
    strings (> _BATCH_MAX_LEN chars) fall back to the scalar kernel so padded
    matrices stay bounded.
    """
    n = len(a)
    a = np.asarray(a, dtype=object)
    b = np.asarray(b, dtype=object)
    out = np.empty(n, dtype=np.float64)
    if n == 0:
        return out
    len1 = np.fromiter((len(x) for x in a), dtype=np.int64, count=n)
    len2 = np.fromiter((len(x) for x in b), dtype=np.int64, count=n)
    eq = a == b
    empty = (len1 == 0) | (len2 == 0)
    out[eq] = 1.0
    out[empty & ~eq] = 0.0
    big = (len1 > _BATCH_MAX_LEN) | (len2 > _BATCH_MAX_LEN)
    for i in np.flatnonzero(big & ~eq & ~empty):
        out[i] = jaro(a[i], b[i])
    todo = np.flatnonzero(~eq & ~empty & ~big)
    for s in range(0, todo.size, _BATCH_CHUNK):
        idx = todo[s : s + _BATCH_CHUNK]
        out[idx] = _jaro_batch_chunk(a[idx], b[idx])
    return out


def jaro_winkler_batch(a, b, p: float = 0.1) -> np.ndarray:
    """Jaro-Winkler over aligned pairs (used inside verify map_batches).

    Same definition as the scalar :func:`jaro_winkler`: batch Jaro plus the
    up-to-4-char common-prefix bonus, computed with the identical expression
    ``j + prefix * p * (1 - j)`` so results match the scalar kernel bit-exactly.
    """
    n = len(a)
    a = np.asarray(a, dtype=object)
    b = np.asarray(b, dtype=object)
    j = jaro_batch(a, b)
    if n == 0:
        return j
    # prefix length: common chars among the first 4, stopping at the first
    # mismatch AND at min(len) (zip semantics in the scalar kernel)
    P = np.array([x[:4] for x in a], dtype="U4").view(np.uint32).reshape(n, 4)
    Q = np.array([x[:4] for x in b], dtype="U4").view(np.uint32).reshape(n, 4)
    # NUL padding: both-padded columns compare equal, so cap by min length
    match = np.logical_and.accumulate(P == Q, axis=1)
    prefix = match.sum(axis=1).astype(np.float64)
    minlen = np.minimum(
        np.fromiter((len(x) for x in a), dtype=np.int64, count=n),
        np.fromiter((len(x) for x in b), dtype=np.int64, count=n),
    )
    prefix = np.minimum(prefix, np.minimum(minlen, 4))
    return j + prefix * p * (1.0 - j)


# ---------------------------------------------------------------------------
# Sound lower-bound prune for threshold checks (DuckDB-accelerated)
# ---------------------------------------------------------------------------

_DUCK_CON = None


def _duck():
    global _DUCK_CON
    if _DUCK_CON is None:
        import duckdb

        _DUCK_CON = duckdb.connect()
        # single-threaded: this runs INSIDE Ray map_batches tasks; DuckDB's own
        # thread pool would oversubscribe the node
        _DUCK_CON.execute("SET threads TO 1")
    return _DUCK_CON


def jaro_floor_mask(a, b, jw_threshold: float) -> np.ndarray:
    """True where the pair MIGHT reach ``jaro_winkler(a,b) >= jw_threshold``.

    Sound prune: jw = jaro + prefix*0.1*(1-jaro) <= 0.6*jaro + 0.4, so
    jw >= T requires jaro >= (T-0.4)/0.6. DuckDB's ``jaro_similarity`` is an
    upper bound on this module's ``jaro`` (measured duck-ours in [0, 0.056]
    over 100k adversarial pairs; property-tested in tests/test_hashing.py),
    so duck_jaro < floor - eps proves jw < T. Pairs this returns False for
    need no exact Jaro-Winkler call — at ~1us/pair vs ~45us, this removes
    most of the verify stage's CPU on non-duplicate candidates. Falls back
    to all-True when duckdb is unavailable.
    """
    n = len(a)
    if n == 0:
        return np.zeros(0, dtype=bool)
    floor = (jw_threshold - 0.4) / 0.6 - 0.01  # eps covers the empirical bound
    try:
        import pandas as pd

        con = _duck()
        df = pd.DataFrame({"a": list(a), "b": list(b)})
        con.register("_jw_pairs", df)
        try:
            duck_j = (
                con.execute("SELECT jaro_similarity(a, b) AS j FROM _jw_pairs")
                .df()["j"]
                .to_numpy()
            )
        finally:
            con.unregister("_jw_pairs")
        return duck_j >= floor
    except Exception:  # pragma: no cover - duckdb missing/failed
        return np.ones(n, dtype=bool)


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
