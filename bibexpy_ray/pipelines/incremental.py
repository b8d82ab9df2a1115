"""Incremental near-duplicate dedup: fold NEW shards into an existing run.

At 10^12-row scale a corpus is never re-deduplicated when a shard lands —
new rows are matched against the standing SURVIVOR INDEX (every canonical
row of the base run: cluster survivors + singletons), while pairs wholly
inside the index are skipped (the base run already adjudicated them — they
stayed separate clusters). This is the classic incremental-LSH design; the
documented recall trade is that a new row joins a base cluster only by
matching its *canonical* row, not an absorbed member.

Semantics reimplemented (NOT copied) from the reference's skip-if-fresh /
append-analysis pattern (/root/reference/apps/api/services/analyses.py:26-101
runs whole-corpus passes; the incremental index is this repo's scale
extension — the reference has no trillion-row analog).

Ray shape: the base canonical table reads straight off the base run's
``canonical/`` parquet (column-pruned to the feature inputs); the combined
Dataset streams through the UNCHANGED ``dedup_images`` stages; the only
addition is the candidate-pair gate (a sorted uint64 uid array in the
object store, 8 B per index row, probed by vectorized searchsorted inside
the pair stream before the dedupe shuffle). Cluster expansion joins the
result against the base cluster table — bounded by the number of
multi-member base clusters, the same order as the cluster table itself.

Measured at 192k base + 48k shard (32 CPUs): the gate halves the
verify/exact volume (verify_exec 2.1 -> 0.8-1.0 s, exact 1.7 -> 0.5 s vs
the 240k from-scratch run) while index re-featurization (~5.6 s) keeps
the toy-scale WALL comparable to a full re-run — the trade inverts at
real scale, where verify dominates (52% of the 2M-row wall) and grows
O(corpus x corpus) for re-runs vs O(new x index) here. Future
optimization: persist the index FEATURES alongside ``canonical/`` so an
increment re-featurizes only the new shard.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import ray.data as rd

from bibexpy_ray.config import DedupConfig
from bibexpy_ray.functions.hashing import text_hash_u64

#: above this many base canonical rows the uid gate (8 B/row broadcast)
#: is skipped — the run stays CORRECT (base pairs re-verify and re-split
#: into the same clusters, deterministically) but does redundant work;
#: the cap keeps the broadcast ~1.6 GB. Mirrors the verify-stage
#: BROADCAST_LIMIT convention in dedup_images.py.
GATE_LIMIT = 200_000_000


def dedup_images_incremental(
    base_dir: str,
    new_input: "rd.Dataset | str",
    cfg: DedupConfig | None = None,
    run_dir: str | None = None,
    survivor_rank_fn=None,
):
    """Dedup ``new_input`` against the run saved at ``base_dir`` (a
    ``pipelines.export.save_run`` output: ``canonical/`` + ``clusters/``).

    Returns ``(clusters, metrics)``: the UPDATED full cluster table —
    base clusters extended/merged where new rows matched, new-only
    clusters appended, untouched base clusters carried over verbatim —
    in the same ``(cluster_id, survivor_id, cluster_size, members)``
    schema ``DedupResult.clusters`` uses, plus the incremental metrics.
    """
    from bibexpy_ray.pipelines.dedup_images import (
        FEATURE_INPUT_COLS,
        dedup_images,
        read_corpus,
    )

    import ray

    cfg = cfg or DedupConfig()
    canon_dir = os.path.join(base_dir, "canonical")
    clusters_dir = os.path.join(base_dir, "clusters")
    # the index re-reads every increment and feeds the (fused) signature
    # stage — force enough read blocks that the stage parallelizes even
    # when the index sits in a handful of coalesced files
    cpus = int(ray.cluster_resources().get("CPU", 4))
    base_canon = rd.read_parquet(
        canon_dir, columns=FEATURE_INPUT_COLS, override_num_blocks=cpus * 2
    )
    base_clusters = rd.read_parquet(clusters_dir).to_pandas()

    new_ds = read_corpus(new_input) if isinstance(new_input, str) else new_input
    keep = [c for c in FEATURE_INPUT_COLS if c in new_ds.schema().names]
    new_ds = new_ds.select_columns(keep)
    base_canon = base_canon.select_columns(keep)

    # conform BOTH sides to one Arrow schema before the union when they
    # differ: the base side comes off parquet (large_string etc.) while the
    # new side may have passed through pandas (object -> string) — mixed
    # block schemas crash the zero-copy batcher inside the signature stage.
    # Parquet-to-parquet inputs usually already agree; skip the extra map
    # stage then (it costs a full pass over both sides).
    import pyarrow as pa

    base_schema = base_canon.schema()
    new_schema = new_ds.schema()
    if [str(t) for t in base_schema.types] != [str(t) for t in new_schema.types]:
        target = pa.schema(
            [(c, pa.int64() if c == "phash" else pa.string()) for c in keep]
        )

        def conform(t: pa.Table) -> pa.Table:
            return t.select(keep).cast(target)

        base_canon = base_canon.map_batches(conform, batch_format="pyarrow")
        new_ds = new_ds.map_batches(conform, batch_format="pyarrow")

    # pair gate: uids of the base canonical rows. Ids-only collect, bounded
    # by the index size; above GATE_LIMIT run ungated (correct, slower).
    n_base = base_canon.count()
    gate = None
    if n_base <= GATE_LIMIT:
        ids = (
            base_canon.select_columns(["image_id"])
            .to_pandas()["image_id"]
            .tolist()
        )
        gate = text_hash_u64(ids)

    combined = base_canon.union(new_ds)
    res = dedup_images(
        combined,
        cfg,
        run_dir=run_dir,
        survivor_rank_fn=survivor_rank_fn,
        skip_pairs_within=gate,
    )

    # ---- expand result clusters through the base membership ----------------
    # vectorized explode/merge/regroup (a python loop over the cluster table
    # costs seconds at 10^5 clusters): each result member that is a base
    # CANONICAL of a multi-member cluster expands to that cluster's full
    # member list; base singletons expand to themselves
    rc = res.clusters
    if len(rc):
        exp = rc[["cluster_id", "survivor_id"]].assign(
            member=rc["members"].str.split("|")
        ).explode("member")
        # the index rows fed into the incremental run are the base clusters'
        # SURVIVORS (rank winners), not their cluster_ids (CC min members) —
        # join on survivor_id or the expansion silently misses every cluster
        # whose min-id member lost the survivor rank (e.g. a jpeg min id
        # beaten by a png member)
        bm = base_clusters[["cluster_id", "survivor_id", "members"]].rename(
            columns={
                "survivor_id": "member",
                "cluster_id": "_base_cid",
                "members": "_base_members",
            }
        )
        exp = exp.merge(bm, on="member", how="left")
        hit = exp["_base_members"].notna()
        exp["_expanded"] = exp["_base_members"].where(hit, exp["member"])
        touched_base = set(exp.loc[hit, "_base_cid"])
        expanded = exp.groupby("cluster_id", sort=False).agg(
            survivor_id=("survivor_id", "first"),
            members=("_expanded", "|".join),
            base_cluster_ids=("_base_cid", lambda s: "|".join(s.dropna())),
        ).reset_index()
        expanded["cluster_size"] = expanded["members"].str.count(r"\|") + 1
    else:
        touched_base = set()
        expanded = pd.DataFrame(
            columns=["cluster_id", "survivor_id", "members",
                     "base_cluster_ids", "cluster_size"]
        )
    # untouched base clusters carry over verbatim
    carry = base_clusters[~base_clusters["cluster_id"].isin(touched_base)].copy()
    carry["base_cluster_ids"] = carry["cluster_id"]
    cols = ["cluster_id", "survivor_id", "cluster_size", "members",
            "base_cluster_ids"]
    out = (
        pd.concat([expanded[cols], carry[cols]], ignore_index=True)
        .sort_values("cluster_id")
        .reset_index(drop=True)
    )
    metrics = {
        **res.metrics,
        "base_canonical": int(n_base),
        "base_clusters": int(len(base_clusters)),
        "base_clusters_touched": len(touched_base),
        "new_rows": int(new_ds.count()),
        "gated": gate is not None,
        "clusters_total": int(len(out)),
    }
    return out, metrics


def incremental_dedup_clusters(sf_dir: str) -> pd.DataFrame:
    """Query entry: fold the odd half of the synthetic corpus into a saved
    base run over the even half (deterministic split on the numeric id
    suffix). The base run is built once per scale and cached under /tmp —
    exactly the standing-survivor-index situation the incremental path
    exists for."""
    from bibexpy_ray.pipelines.dedup_images import dedup_images, read_corpus
    from bibexpy_ray.pipelines.export import save_run
    from bibexpy_ray.pipelines.multimodal import corpus_path_for

    path = corpus_path_for(sf_dir)
    cfg = DedupConfig()

    def id_num(batch: pd.DataFrame) -> np.ndarray:
        return (
            batch["image_id"].str.extract(r"(\d+)", expand=False).astype(np.int64)
        )

    def even_half(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[id_num(batch) % 2 == 0]

    def odd_half(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[id_num(batch) % 2 == 1]

    base_dir = os.path.join(
        "/tmp/bibexpy_incr_base", os.path.basename(path.rstrip("/"))
    )
    if not os.path.exists(os.path.join(base_dir, "manifest.json")):
        base_ds = read_corpus(path).map_batches(even_half, batch_format="pandas")
        save_run(dedup_images(base_ds, cfg), base_ds, base_dir)

    new_ds = read_corpus(path).map_batches(odd_half, batch_format="pandas")
    clusters, _metrics = dedup_images_incremental(base_dir, new_ds, cfg)
    return clusters
