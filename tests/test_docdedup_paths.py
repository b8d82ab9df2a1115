"""docdedup scale paths: the gated distributed union-find must equal the
driver CC, and a degenerate simhash bucket must be capped (with dropped
counts reported) instead of an O(m²) cross product."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import bibexpy_ray.stages.unionfind as uf
from bibexpy_ray.pipelines import docdedup as dd

SF_DIR = "/root/testdata/sf0.001"


def _clear_memos():
    dd._char5_pairs_memo.clear()
    dd._assign_ds_memo.clear()


def test_cluster_assignments_distributed_matches_driver(monkeypatch, ray_session):
    _clear_memos()
    base = dd.minhash_clusters(SF_DIR)
    base_dedup = dd.neardup_dedup(SF_DIR)
    _clear_memos()
    monkeypatch.setattr(uf, "DRIVER_EDGE_LIMIT", 0)  # force distributed CC
    dist = dd.minhash_clusters(SF_DIR)
    # the scale path memoizes its materialized assignment: the second query
    # must reuse it rather than re-run LSH+verify+CC
    assert len(dd._assign_ds_memo) == 1
    dist_dedup = dd.neardup_dedup(SF_DIR)
    _clear_memos()
    pd.testing.assert_frame_equal(base, dist)
    pd.testing.assert_frame_equal(base_dedup, dist_dedup)
    assert len(base) > 0 and (base["cluster_id"] != base["doc_id"]).any()


def test_simhash_skew_bucket_capped(tmp_path, ray_session):
    n = 1200  # one degenerate bucket: all texts identical -> identical simhash
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n), type=pa.int64()),
            "text": pa.array(
                ["the same templated caption text repeated verbatim"] * n
            ),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = dd._simhash_pairs_ds(str(tmp_path)).to_pandas()
    assert out["dropped"].max() > 0  # truncation is reported, never silent
    assert len(out) < n * (n - 1) // 2  # the cross product was capped
    assert (out["hamming"] == 0).all()  # identical texts, window kept adjacency
    # capped output is still a valid distinct pair set
    assert not out.duplicated(subset=["id_a", "id_b"]).any()
    assert (out["id_a"] < out["id_b"]).all()


def test_clusters_driver_ints_matches_dict():
    edges = [(5, 3), (3, 9), (20, 21), (7, 7), (40, 2), (2, 41)]
    members, canon = uf.clusters_driver_ints(
        np.array([a for a, _ in edges]), np.array([b for _, b in edges])
    )
    expect = uf.clusters_driver([(str(a).zfill(4), str(b).zfill(4)) for a, b in edges])
    got = {int(m): int(c) for m, c in zip(members, canon)}
    assert got == {int(k): int(v) for k, v in expect.items()}
