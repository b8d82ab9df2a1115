"""Forced-gate equivalence: the co-partition attach scale paths (the
``Dataset.join`` replacements in docdedup/ann verify) must produce the exact
same verified pair sets as the broadcast paths."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from bibexpy_ray.pipelines import ann
from bibexpy_ray.pipelines import docdedup as dd
from bibexpy_ray.pipelines.tables import read_table

SF_DIR = "/root/testdata/sf0.001"


def test_jaccard_attach_path_matches_broadcast(monkeypatch, ray_session):
    pairs = dd.lsh_candidate_pairs(SF_DIR, "char5")
    broadcast = dd._verify_jaccard(pairs, SF_DIR, "char5", 0.8)
    monkeypatch.setattr(dd, "BROADCAST_DOC_LIMIT", 1)  # force co-partition
    pairs2 = dd.lsh_candidate_pairs(SF_DIR, "char5")
    attached = dd._verify_jaccard(pairs2, SF_DIR, "char5", 0.8)
    pd.testing.assert_frame_equal(broadcast, attached)
    assert len(broadcast) > 0


def test_cosine_attach_path_matches_broadcast(monkeypatch, ray_session):
    ds = read_table(SF_DIR, "embeddings", ["vec_id", "embedding"])
    n = ds.count()
    ids = np.arange(n, dtype=np.int64)
    # candidate pairs: a ring plus long-range strides — includes true
    # near-dups (adjacent synthetic vectors) and far pairs that must drop
    pairs_tbl = pa.table(
        {
            "id_a": pa.array(np.concatenate([ids[:-1], ids[: n // 2]])),
            "id_b": pa.array(
                np.concatenate([ids[1:], ids[: n // 2] + n // 2])
            ),
        }
    )
    broadcast = (
        ann._cosine_verify_ds(rd.from_arrow(pairs_tbl), ds, 0.4, n)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    monkeypatch.setattr(ann, "BROADCAST_VEC_LIMIT", 1)  # force co-partition
    attached = (
        ann._cosine_verify_ds(rd.from_arrow(pairs_tbl), ds, 0.4, n)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(broadcast, attached)
    assert 0 < len(broadcast) < pairs_tbl.num_rows  # kept some, dropped some


def test_embedding_neardup_lsh_forced_attach(monkeypatch, ray_session):
    base = ann.embedding_neardup_lsh(SF_DIR)
    monkeypatch.setattr(ann, "BROADCAST_VEC_LIMIT", 1)
    forced = ann.embedding_neardup_lsh(SF_DIR)
    pd.testing.assert_frame_equal(base, forced)
    assert len(base) > 0
