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
