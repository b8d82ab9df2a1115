"""Incremental dedup: fold a new shard into a saved base run and land on
the same clusters as a from-scratch run over the union."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from bibexpy_ray import synth
from bibexpy_ray.config import DedupConfig
from bibexpy_ray.pipelines.dedup_images import dedup_images
from bibexpy_ray.pipelines.export import save_run
from bibexpy_ray.pipelines.incremental import dedup_images_incremental

N_ROWS = 240  # 20 cohorts of 12


@pytest.fixture(scope="module")
def corpus_table():
    return synth.CorpusGen(42).rows(range(N_ROWS))


def _cluster_sets(clusters: pd.DataFrame) -> set[frozenset]:
    return {frozenset(m.split("|")) for m in clusters["members"]}


def _split(table: pa.Table):
    # interleave: even rows -> base, odd rows -> new shard. Splitting WITHIN
    # cohorts exercises new-row -> base-cluster attachment, not just
    # new-only clusters.
    idx = np.arange(table.num_rows)
    return table.take(pa.array(idx[idx % 2 == 0])), table.take(
        pa.array(idx[idx % 2 == 1])
    )


def test_incremental_matches_full_run(corpus_table, tmp_path, ray_session):
    base_tbl, new_tbl = _split(corpus_table)
    cfg = DedupConfig()

    full = dedup_images(rd.from_arrow(corpus_table), cfg)

    base_res = dedup_images(rd.from_arrow(base_tbl), cfg)
    base_dir = str(tmp_path / "base_run")
    save_run(base_res, rd.from_arrow(base_tbl), base_dir)

    clusters_ds, metrics = dedup_images_incremental(
        base_dir, rd.from_arrow(new_tbl), cfg
    )
    clusters = clusters_ds.to_pandas()

    # every base member must still be clustered with its base peers, and
    # the final partition must equal the from-scratch run over the union
    assert _cluster_sets(clusters) == _cluster_sets(full.clusters)
    assert metrics["gated"] is True
    assert metrics["new_rows"] == new_tbl.num_rows
    assert metrics["base_canonical"] == len(base_res.clusters) + (
        base_tbl.num_rows - int(base_res.clusters["cluster_size"].sum())
    )
    # the gate did real work: candidate pairs exclude the base-only ones
    assert metrics["candidate_edges"] > 0
    # the base run persisted features: the increment must not re-sign them
    assert metrics["index_featurized"] is False


def test_incremental_survivor_not_min_id(tmp_path, ray_session):
    # adversarial shape: rename every png in a cohort's main cluster with a
    # 'z' prefix so the jpeg re-encode (off 2) holds the cluster's MIN id —
    # cluster_id (CC min member) != survivor_id (png rank winner). The
    # expansion must still splice the base members (it joins on survivor_id,
    # the row the incremental run actually consumed).
    cfg = DedupConfig()
    tbl = synth.CorpusGen(42).rows(range(12))
    ids = tbl.column("image_id").to_pylist()
    new_ids = [iid if i % 12 == 2 else "z" + iid for i, iid in enumerate(ids)]
    col = tbl.schema.get_field_index("image_id")
    tbl = tbl.set_column(col, "image_id", pa.array(new_ids, type=pa.string()))

    idx = np.arange(12)
    base_tbl = tbl.take(pa.array(idx[idx != 3]))
    new_tbl = tbl.take(pa.array(idx[idx == 3]))  # near-dup caption of base

    base_res = dedup_images(rd.from_arrow(base_tbl), cfg)
    main = base_res.clusters.loc[
        base_res.clusters["cluster_size"].idxmax()
    ]
    assert main["survivor_id"] != main["cluster_id"]  # the shape under test

    base_dir = str(tmp_path / "base_run")
    save_run(base_res, rd.from_arrow(base_tbl), base_dir)
    clusters_ds, metrics = dedup_images_incremental(
        base_dir, rd.from_arrow(new_tbl), cfg
    )
    clusters = clusters_ds.to_pandas()

    full = dedup_images(rd.from_arrow(tbl), cfg)
    assert _cluster_sets(clusters) == _cluster_sets(full.clusters)
    assert metrics["base_clusters_touched"] == 1
    # no member may land in two clusters (the bug double-assigned survivors)
    flat = [m for ms in clusters["members"] for m in ms.split("|")]
    assert len(flat) == len(set(flat))


def test_incremental_disjoint_shard_appends_only(corpus_table, tmp_path, ray_session):
    # a new shard with NO relation to the base (different cohort range):
    # base clusters must carry over verbatim and the new shard must cluster
    # exactly as it would alone
    cfg = DedupConfig()
    base_tbl = synth.CorpusGen(42).rows(range(120))
    new_tbl = synth.CorpusGen(42).rows(range(1200, 1320))

    base_res = dedup_images(rd.from_arrow(base_tbl), cfg)
    base_dir = str(tmp_path / "base_run")
    save_run(base_res, rd.from_arrow(base_tbl), base_dir)

    alone = dedup_images(rd.from_arrow(new_tbl), cfg)
    clusters_ds, metrics = dedup_images_incremental(
        base_dir, rd.from_arrow(new_tbl), cfg
    )
    clusters = clusters_ds.to_pandas()
    assert _cluster_sets(clusters) == (
        _cluster_sets(base_res.clusters) | _cluster_sets(alone.clusters)
    )
    assert metrics["base_clusters_touched"] == 0


def test_incremental_legacy_base_without_features(corpus_table, tmp_path, ray_session):
    # a base run saved by an older version (no features/) must still fold
    # shards correctly via the re-sign fallback
    import shutil

    base_tbl, new_tbl = _split(corpus_table)
    cfg = DedupConfig()
    full = dedup_images(rd.from_arrow(corpus_table), cfg)
    base_res = dedup_images(rd.from_arrow(base_tbl), cfg)
    base_dir = str(tmp_path / "base_run")
    save_run(base_res, rd.from_arrow(base_tbl), base_dir)
    shutil.rmtree(f"{base_dir}/features")

    clusters_ds, metrics = dedup_images_incremental(
        base_dir, rd.from_arrow(new_tbl), cfg
    )
    assert metrics["index_featurized"] is True
    assert _cluster_sets(clusters_ds.to_pandas()) == _cluster_sets(full.clusters)
