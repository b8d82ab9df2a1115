"""IntBucketPairEmitter hot-bucket behavior: per-band salted windows must
truncate DIFFERENT pairs (union recovers coverage) and surface the dropped
count — the no-silent-truncation contract (docdedup.py docstring)."""

import numpy as np
import pandas as pd

from bibexpy_ray.pipelines.docdedup import IntBucketPairEmitter


def _part(bucket_key: int, ids, sortkey=None) -> pd.DataFrame:
    df = pd.DataFrame(
        {
            "bucket_key": np.full(len(ids), bucket_key, dtype=np.uint64),
            "doc_id": np.array(ids, dtype=np.int64),
        }
    )
    if sortkey is not None:
        df["sortkey"] = np.array(sortkey, dtype=np.uint64)
    return df


def _pairset(df: pd.DataFrame) -> set[tuple[int, int]]:
    return set(zip(df["id_a"].tolist(), df["id_b"].tolist()))


def test_small_bucket_full_crossproduct_no_drops():
    em = IntBucketPairEmitter(cap=100, window=2)
    out = em(_part(7, range(10)))
    assert len(out) == 45 and (out["dropped"] == 0).all()


def test_hot_bucket_reports_drops():
    em = IntBucketPairEmitter(cap=10, window=2)
    m = 20  # 190 pairs > cap
    out = em(_part(7, range(m)))
    emitted = len(out)
    assert emitted < m * (m - 1) // 2
    # every emitted row carries the SAME dropped count = total - emitted
    assert (out["dropped"] == m * (m - 1) // 2 - emitted).all()


def test_bands_truncate_different_pairs():
    # same doc set bucketed under two band keys (constant sortkey = the
    # near-identical-docs case): the per-bucket salt must order the window
    # differently, so the two bands' pair sets differ and their union is
    # strictly larger than either band alone
    em = IntBucketPairEmitter(cap=10, window=2)
    ids = list(range(30))
    a = _pairset(em(_part(101, ids, sortkey=[5] * 30)))
    b = _pairset(em(_part(202, ids, sortkey=[5] * 30)))
    assert a != b
    assert len(a | b) > max(len(a), len(b))


def test_sortkey_proximity_dominates_salt():
    # distinct sortkeys (signature proximity) order the window; docs adjacent
    # in sortkey must pair even in a hot bucket
    em = IntBucketPairEmitter(cap=10, window=1)
    ids = list(range(20))
    sortkey = [i * 1000 for i in ids]  # strictly increasing, distinct
    out = em(_part(9, ids, sortkey=sortkey))
    got = _pairset(out)
    want = {(i, i + 1) for i in range(19)}
    assert got == want


# ---- size-class vectorization equivalence (multi-bucket batches) ----------
# The size-class path emits ALL under-cap buckets with one broadcast triu per
# distinct size; its risk is the cross-bucket index arithmetic, so these
# tests drive many buckets of mixed sizes in ONE part and compare against a
# per-bucket brute force.

from hypothesis import given, settings
from hypothesis import strategies as st


def _brute_pairs(df: pd.DataFrame) -> set[tuple[int, int]]:
    want = set()
    for _, grp in df.groupby("bucket_key"):
        ids = sorted(grp["doc_id"].tolist())
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                want.add((ids[i], ids[j]))
    return want


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=12), min_size=1, max_size=30),
    st.randoms(use_true_random=False),
)
def test_multibucket_size_classes_match_brute_force(sizes, rnd):
    cap = 100  # every bucket below the cap -> exact full cross-product
    em = IntBucketPairEmitter(cap=cap, window=2)
    rows_key, rows_id = [], []
    next_id = 0
    for bi, m in enumerate(sizes):
        ids = list(range(next_id, next_id + m))
        next_id += m
        rows_key += [bi * 7919 + 13] * m
        rows_id += ids
    # shuffle rows so the emitter's own lexsort does the segmenting
    order = list(range(len(rows_id)))
    rnd.shuffle(order)
    df = pd.DataFrame(
        {
            "bucket_key": np.array([rows_key[i] for i in order], dtype=np.uint64),
            "doc_id": np.array([rows_id[i] for i in order], dtype=np.int64),
        }
    )
    out = em(df)
    got = {(min(a, b), max(a, b)) for a, b in _pairset(out)}
    assert got == _brute_pairs(df)
    assert (out["dropped"] == 0).all()


def test_mixed_small_and_hot_buckets_one_part():
    # one part holding: a size-2, a size-5, and a hot size-25 bucket; the
    # small buckets stay exact while the hot one windows + reports drops
    em = IntBucketPairEmitter(cap=10, window=2)
    df = pd.concat(
        [_part(1, [0, 1]), _part(2, range(10, 15)), _part(3, range(100, 125))]
    )
    out = em(df)
    small = out[out["dropped"] == 0]
    got_small = {(min(a, b), max(a, b)) for a, b in _pairset(small)}
    assert got_small >= {(0, 1)}
    assert {(a, b) for (a, b) in got_small if a >= 10 and b < 100} == {
        (i, j) for i in range(10, 15) for j in range(i + 1, 15)
    }
    hot = out[out["dropped"] > 0]
    assert len(hot) > 0 and (hot["dropped"] == 25 * 24 // 2 - len(hot)).all()


def test_value_col_rides_size_class_emit():
    # carried values must stay row-aligned through the broadcast indexing
    em = IntBucketPairEmitter(cap=100, window=2, value_col="val")
    df = pd.DataFrame(
        {
            "bucket_key": np.array([1, 1, 1, 2, 2], dtype=np.uint64),
            "doc_id": np.array([10, 11, 12, 20, 21], dtype=np.int64),
            "val": np.array([100, 110, 120, 200, 210], dtype=np.uint64),
        }
    )
    out = em(df)
    for _, r in out.iterrows():
        assert r["val_a"] == r["id_a"] * 10
        assert r["val_b"] == r["id_b"] * 10


# ---- stages.lsh.BucketPairEmitter: size classes + inline pHash gate -------

from bibexpy_ray.functions import hashing
from bibexpy_ray.stages.lsh import KIND_PHASH, BucketPairEmitter


def _lsh_part(rows):
    # rows: (bucket_key, uid, phash, kind)
    k, u, p, kd = zip(*rows)
    return pd.DataFrame(
        {
            "bucket_key": np.array(k, dtype=np.uint64),
            "uid": np.array(u, dtype=np.uint64),
            "phash": np.array(p, dtype=np.int64),
            "kind": np.array(kd, dtype=np.int8),
        }
    )


def test_lsh_multibucket_mixed_kinds_phash_gate():
    """One part holding a non-phash size-3 bucket, a phash size-3 bucket
    (one member beyond tolerance), and a phash size-2 bucket — the gate
    must apply per-bucket-kind across the size-class emit."""
    em = BucketPairEmitter(cap=100, window=2, phash_tol=4)
    rows = [
        # bucket 1: caption kind — all 3 pairs survive regardless of phash
        (1, 10, 0, 0), (1, 11, 1 << 40, 0), (1, 12, -5, 0),
        # bucket 2: phash kind — uids 20,21 close (ham 2); 22 far
        (2, 20, 0b0000, KIND_PHASH), (2, 21, 0b0011, KIND_PHASH),
        (2, 22, -1, KIND_PHASH),
        # bucket 3: phash kind size-2, within tolerance
        (3, 30, 8, KIND_PHASH), (3, 31, 12, KIND_PHASH),
    ]
    out = em(_lsh_part(rows))
    got = {(min(a, b), max(a, b)) for a, b in zip(out["id_a"], out["id_b"])}
    assert got == {(10, 11), (10, 12), (11, 12), (20, 21), (30, 31)}
    assert (out["dropped"] == 0).all()


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.integers(min_value=2, max_value=10), min_size=1, max_size=20),
    st.randoms(use_true_random=False),
)
def test_lsh_multibucket_size_classes_match_brute_force(sizes, rnd):
    em = BucketPairEmitter(cap=100, window=2, phash_tol=64)  # gate disabled
    rows = []
    next_uid = 1
    for bi, m in enumerate(sizes):
        for _ in range(m):
            rows.append((bi * 104729 + 1, next_uid, rnd.randrange(-2**60, 2**60), 0))
            next_uid += 1
    rnd.shuffle(rows)
    df = _lsh_part(rows)
    out = em(df)
    got = {(min(a, b), max(a, b)) for a, b in zip(out["id_a"], out["id_b"])}
    want = set()
    for _, grp in df.groupby("bucket_key"):
        ids = sorted(grp["uid"].tolist())
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                want.add((ids[i], ids[j]))
    assert got == want and (out["dropped"] == 0).all()
