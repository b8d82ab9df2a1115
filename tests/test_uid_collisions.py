"""uid collision resolution: the 64-bit row uid must be collision-free per
run (detect + salted-rehash), and the pipeline must produce bit-identical
clusters even when the uid space is artificially tiny (collision injection
via ``DedupConfig.uid_bits``)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from bibexpy_ray.config import DedupConfig
from bibexpy_ray.stages.signer import (
    UID_SALT_SEEDS,
    replay_uid_rules,
    resolve_uid_collisions,
    uid_base,
    uid_witness,
)


def _feature_stub(ids: list[str], uid_bits: int) -> rd.Dataset:
    arr = pa.array(ids, type=pa.string())
    return rd.from_arrow(
        pa.table(
            {
                "image_id": arr,
                "_uid": pa.array(uid_base(arr, uid_bits), type=pa.uint64()),
                "_uid_w": pa.array(uid_witness(arr), type=pa.uint64()),
            }
        )
    )


def test_resolver_makes_uids_distinct(ray_session):
    ids = [f"img_{i:05d}" for i in range(600)]
    bits = 12  # 4096 slots for 600 ids: dozens of collisions, still room
    feats = _feature_stub(ids, bits)
    out, rules, n_coll = resolve_uid_collisions(feats, 4, uid_bits=bits)
    assert n_coll > 0 and rules
    df = out.to_pandas()
    # every distinct id ends with a distinct uid
    assert df["_uid"].nunique() == len(ids)
    # replay from the id strings reproduces the resolved column bit-for-bit
    replayed = replay_uid_rules(df["image_id"].tolist(), rules, bits)
    assert (replayed == df["_uid"].to_numpy(dtype=np.uint64)).all()


def test_resolver_noop_without_collisions(ray_session):
    ids = [f"img_{i:05d}" for i in range(500)]
    feats = _feature_stub(ids, 64)
    out, rules, n_coll = resolve_uid_collisions(feats, 4, uid_bits=64)
    assert n_coll == 0 and rules == []
    assert out is feats  # untouched dataset, no rewrite pass


def test_repeated_id_is_not_a_collision(ray_session):
    # the same id string twice is the same identity — must NOT be salted
    ids = ["dup", "dup", "other"]
    feats = _feature_stub(ids, 64)
    out, rules, n_coll = resolve_uid_collisions(feats, 2, uid_bits=64)
    assert n_coll == 0
    df = out.to_pandas()
    assert df.loc[df["image_id"] == "dup", "_uid"].nunique() == 1


def test_reserved_base_rows_keep_their_uid(ray_session):
    # craft a base/new collision: mask to few bits so ids share uids, then
    # reserve the base rows — every reserved (uid, witness) pair must
    # survive resolution untouched, with colliding new rows salted away
    bits = 8
    # base rows come from an already-RESOLVED base run, so they are
    # internally collision-free: keep only candidates with distinct uids
    cand = [f"b{i}" for i in range(60)]
    cu = uid_base(pa.array(cand, type=pa.string()), bits)
    seen: dict[int, str] = {}
    for cid, u in zip(cand, cu):
        seen.setdefault(int(u), cid)
    base_ids = list(seen.values())[:30]
    new_ids = [f"n{i}" for i in range(30)]
    base_arr = pa.array(base_ids, type=pa.string())
    bu, bw = uid_base(base_arr, bits), uid_witness(base_arr)
    order = np.argsort(bu)
    reserved = (bu[order], bw[order])
    feats = _feature_stub(base_ids + new_ids, bits)
    out, rules, n_coll = resolve_uid_collisions(
        feats, 2, uid_bits=bits, reserved=reserved
    )
    df = out.to_pandas().set_index("image_id")
    assert n_coll > 0
    for i, bid in enumerate(base_ids):
        assert int(df.loc[bid, "_uid"]) == int(bu[i]), "base row lost its uid"
    assert df["_uid"].nunique() == len(base_ids) + len(new_ids)


def test_resolver_raises_when_space_too_small(ray_session):
    # 4-bit space (16 slots) cannot hold 300 ids no matter the salt
    feats = _feature_stub([f"x{i}" for i in range(300)], 4)
    with pytest.raises(RuntimeError, match="uid collisions persist"):
        resolve_uid_collisions(feats, 2, uid_bits=4)


def test_flagship_identical_under_collision_injection(ray_session, tmp_path):
    """End-to-end: the full pipeline at uid_bits=14 (hundreds of collisions
    on a 1200-row corpus) must produce exactly the clusters of the 64-bit
    run — collisions change intermediate uids, never the output."""
    from bibexpy_ray.pipelines.dedup_images import dedup_images, read_corpus
    from bibexpy_ray.synth import write_corpus_parquet

    path = str(tmp_path / "corpus")
    write_corpus_parquet(path, 1200, use_ray=False)
    corpus = read_corpus(path)

    res64 = dedup_images(corpus, DedupConfig())
    res14 = dedup_images(corpus, DedupConfig(uid_bits=14))
    assert res14.metrics["uid_collisions"] > 0
    assert res64.metrics["uid_collisions"] == 0
    assert res14.labels.as_dict() == res64.labels.as_dict()
    assert res14.metrics["clusters"] == res64.metrics["clusters"]
    assert res14.metrics["exact_edges"] == res64.metrics["exact_edges"]


def test_incremental_gate_exact_under_collision_injection(ray_session, tmp_path):
    """Incremental mode with injected collisions: a new shard against a
    saved base index must produce the same clusters as the 64-bit
    increment — base rows are reserved keepers, so gate hits stay exact."""
    from bibexpy_ray import synth
    from bibexpy_ray.pipelines.dedup_images import dedup_images
    from bibexpy_ray.pipelines.export import save_run
    from bibexpy_ray.pipelines.incremental import dedup_images_incremental

    tbl = synth.CorpusGen(42).rows(range(240))
    idx = np.arange(tbl.num_rows)
    base_tbl = tbl.take(pa.array(idx[idx % 2 == 0]))
    new_tbl = tbl.take(pa.array(idx[idx % 2 == 1]))

    def run(bits: int, tag: str):
        cfg = DedupConfig(uid_bits=bits)
        base_ds = rd.from_arrow(base_tbl)
        res = dedup_images(base_ds, cfg)
        base_dir = str(tmp_path / f"saved_{tag}")
        save_run(res, base_ds, base_dir)
        clusters_ds, metrics = dedup_images_incremental(
            base_dir, rd.from_arrow(new_tbl), cfg
        )
        df = (
            clusters_ds.to_pandas()
            .sort_values("cluster_id")
            .reset_index(drop=True)
        )
        return df[["cluster_id", "survivor_id", "cluster_size", "members"]], metrics

    df64, _ = run(64, "b64")
    df10, m10 = run(10, "b10")
    pd.testing.assert_frame_equal(df10, df64)
    assert m10.get("uid_collisions", 0) > 0
