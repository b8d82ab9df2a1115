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

Ray shape — nothing O(index) or O(base clusters) ever lands on the driver:

* the index's FEATURES read straight off the base run's persisted
  ``features/`` parquet (``save_run`` writes it) and union into the
  pipeline AFTER the signature stage — an increment featurizes only the
  new shard. Legacy base runs without ``features/`` fall back to
  re-signing ``canonical/``.
* the candidate-pair gate is a sorted uint64 uid array in the object
  store (8 B per index row, built from the feature table's ``_uid``
  column block-by-block — no Python string list), probed by vectorized
  searchsorted inside the pair stream before the dedupe shuffle.
* cluster expansion is a co-partition shuffle on the base SURVIVOR id:
  result members (bounded by the new shard — gated base survivors can
  only cluster via a new-row bridge) meet the base cluster table in
  per-partition reduces; untouched base clusters emit their carry rows
  from the same pass. The updated cluster table returns as a Dataset.

Measured at 192k base + 48k shard (32 CPUs): the gate halves the
verify/exact volume (verify_exec 2.1 -> 0.8-1.0 s, exact 1.7 -> 0.5 s vs
the 240k from-scratch run), and the persisted features remove the ~5.6 s
index re-featurization that previously kept toy-scale WALL comparable to
a full re-run.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from bibexpy_ray.config import DedupConfig
from bibexpy_ray.functions.hashing import text_hash_u64

#: above this many base canonical rows the uid gate (8 B/row broadcast)
#: is skipped — the run stays CORRECT (base pairs re-verify and re-split
#: into the same clusters, deterministically) but does redundant work;
#: the cap keeps the broadcast ~1.6 GB. Mirrors the verify-stage
#: BROADCAST_LIMIT convention in dedup_images.py.
GATE_LIMIT = 200_000_000

#: final cluster-table columns (DedupResult.clusters schema + lineage)
_CLUSTER_COLS = ["cluster_id", "survivor_id", "cluster_size", "members",
                 "base_cluster_ids"]


def _uid_gate(feats: rd.Dataset) -> np.ndarray:
    """Sorted uint64 uids of the index rows, collected block-by-block off the
    feature table's ``_uid`` column (8 B/row — never a Python string list)."""
    blocks = [
        b.column("_uid").to_numpy(zero_copy_only=False).astype(np.uint64)
        for b in ray.get(feats.select_columns(["_uid"]).to_arrow_refs())
        if b.num_rows and "_uid" in b.schema.names
    ]
    if not blocks:
        return np.empty(0, dtype=np.uint64)
    return np.sort(np.concatenate(blocks))


def _expand_clusters(
    rc_ds: rd.Dataset, base_clusters_ds: rd.Dataset, n_parts: int
) -> tuple[rd.Dataset, int]:
    """Stream the base-membership expansion.

    One co-partition shuffle on the base SURVIVOR id merges result members
    (each member that is a base survivor expands to that cluster's full
    member list) AND emits untouched base clusters' carry rows — the base
    cluster table never lands on the driver. A second, result-bounded
    shuffle regroups the expanded members per result cluster. Returns the
    updated cluster Dataset and the touched-base-cluster count.
    """
    from bibexpy_ray.stages.shuffle import hash_partition_apply

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["cluster_id", "survivor_id"]].assign(
            member=df["members"].str.split("|")
        ).explode("member")
        return out.reset_index(drop=True)

    exp_ds = rc_ds.map_batches(explode, batch_format="pandas")
    bm_ds = base_clusters_ds.map_batches(
        # keyed on SURVIVOR id: the index rows the incremental run consumed
        # are the base clusters' rank winners, not their CC-min cluster_ids
        lambda df: pd.DataFrame(
            {
                "member": df["survivor_id"],
                "_base_cid": df["cluster_id"],
                "_base_members": df["members"],
            }
        ),
        batch_format="pandas",
    )

    def member_key(t: pa.Table) -> np.ndarray:
        ids = t.column("member")
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return (text_hash_u64(ids) % np.uint64(n_parts)).astype(np.int32)

    pass1_cols = _CLUSTER_COLS + ["_final"]

    def _empty_clusters(final_col: bool) -> pd.DataFrame:
        out = {
            "cluster_id": pd.Series([], dtype=object),
            "survivor_id": pd.Series([], dtype=object),
            "cluster_size": pd.Series([], dtype=np.int64),
            "members": pd.Series([], dtype=object),
            "base_cluster_ids": pd.Series([], dtype=object),
        }
        if final_col:
            out["_final"] = pd.Series([], dtype=bool)
        return pd.DataFrame(out)

    def merge_part(part: pd.DataFrame) -> pd.DataFrame:
        # dtype-exact empty (NOT DataFrame(columns=...), whose all-object
        # columns arrow-cast to null type and break downstream filters)
        empty = _empty_clusters(final_col=True)
        if len(part) == 0:
            return empty
        has_bm = "_base_cid" in part.columns
        is_bm = part["_base_cid"].notna() if has_bm else pd.Series(
            False, index=part.index
        )
        exp = part.loc[~is_bm]
        exp = exp[exp["member"].notna()] if "member" in exp.columns else exp
        bm = (
            part.loc[is_bm, ["member", "_base_cid", "_base_members"]]
            if has_bm
            else pd.DataFrame(columns=["member", "_base_cid", "_base_members"])
        )
        outs = []
        if len(exp):
            m = exp[["cluster_id", "survivor_id", "member"]].merge(
                bm, on="member", how="left"
            )
            hit = m["_base_members"].notna()
            outs.append(
                pd.DataFrame(
                    {
                        "cluster_id": m["cluster_id"],
                        "survivor_id": m["survivor_id"],
                        "cluster_size": 0,
                        "members": m["_base_members"].where(hit, m["member"]),
                        "base_cluster_ids": m["_base_cid"].fillna(""),
                        "_final": False,
                    }
                )
            )
        if len(bm):
            touched = set(exp["member"]) if len(exp) else set()
            carry = bm.loc[~bm["member"].isin(touched)]
            if len(carry):
                outs.append(
                    pd.DataFrame(
                        {
                            "cluster_id": carry["_base_cid"],
                            "survivor_id": carry["member"],
                            "cluster_size": carry["_base_members"].str.count(
                                r"\|"
                            ).astype(np.int64) + 1,
                            "members": carry["_base_members"],
                            "base_cluster_ids": carry["_base_cid"],
                            "_final": True,
                        }
                    )
                )
        if not outs:
            return empty
        return pd.concat(outs, ignore_index=True)[pass1_cols]

    pass1 = hash_partition_apply(
        exp_ds.union(bm_ds),
        n_parts,
        merge_part,
        key_fn=member_key,
        empty_like=merge_part(pd.DataFrame()),
    ).materialize()

    import pyarrow.compute as pc

    carry_ds = pass1.map_batches(
        lambda t: t.filter(
            pc.fill_null(t.column("_final"), False)
        ).drop_columns(["_final"]),
        batch_format="pyarrow",
    )
    nonfinal = pass1.map_batches(
        lambda t: t.filter(
            pc.invert(pc.fill_null(t.column("_final"), False))
        ).drop_columns(["_final"]),
        batch_format="pyarrow",
    ).materialize()
    touched_parts = nonfinal.map_batches(
        lambda df: pd.DataFrame(
            {"n": [int((df["base_cluster_ids"] != "").sum())]}
        ),
        batch_format="pandas",
    ).to_pandas()
    # an all-empty Dataset loses its schema through to_pandas (0-col frame)
    n_touched = int(touched_parts["n"].sum()) if "n" in touched_parts.columns else 0

    def cluster_key(t: pa.Table) -> np.ndarray:
        ids = t.column("cluster_id")
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return (text_hash_u64(ids) % np.uint64(n_parts)).astype(np.int32)

    def regroup(part: pd.DataFrame) -> pd.DataFrame:
        if len(part) == 0:
            return _empty_clusters(final_col=False)
        g = part.groupby("cluster_id", sort=False).agg(
            survivor_id=("survivor_id", "first"),
            members=("members", "|".join),
            base_cluster_ids=(
                "base_cluster_ids",
                lambda s: "|".join(sorted(v for v in s if v)),
            ),
        ).reset_index()
        g["members"] = g["members"].map(
            lambda m: "|".join(sorted(m.split("|")))
        )
        g["cluster_size"] = g["members"].str.count(r"\|").astype(np.int64) + 1
        return g[_CLUSTER_COLS]

    merged = hash_partition_apply(
        nonfinal,
        n_parts,
        regroup,
        key_fn=cluster_key,
        empty_like=regroup(pd.DataFrame()),
    )
    return merged.union(carry_ds), n_touched


def dedup_images_incremental(
    base_dir: str,
    new_input: "rd.Dataset | str",
    cfg: DedupConfig | None = None,
    run_dir: str | None = None,
    survivor_rank_fn=None,
):
    """Dedup ``new_input`` against the run saved at ``base_dir`` (a
    ``pipelines.export.save_run`` output: ``canonical/`` + ``clusters/``,
    plus ``features/`` when the base run persisted signatures).

    Returns ``(clusters_ds, metrics)``: the UPDATED full cluster table as a
    lazy Dataset — base clusters extended/merged where new rows matched,
    new-only clusters appended, untouched base clusters carried over
    verbatim — in the ``DedupResult.clusters`` schema plus a
    ``base_cluster_ids`` lineage column, and the incremental metrics.
    Nothing proportional to the base corpus materializes on the driver.
    """
    from bibexpy_ray.pipelines.dedup_images import (
        FEATURE_INPUT_COLS,
        dedup_images,
        read_corpus,
    )

    cfg = cfg or DedupConfig()
    clusters_dir = os.path.join(base_dir, "clusters")
    feat_dir = os.path.join(base_dir, "features")
    cpus = int(ray.cluster_resources().get("CPU", 4))

    new_ds = read_corpus(new_input) if isinstance(new_input, str) else new_input
    keep = [c for c in FEATURE_INPUT_COLS if c in new_ds.schema().names]
    new_ds = new_ds.select_columns(keep)

    if os.path.isdir(feat_dir):
        # fast path: the index's signatures persist from the base run — an
        # increment re-featurizes only the new shard. Force enough read
        # blocks that downstream stages parallelize off coalesced files.
        base_feats = rd.read_parquet(feat_dir, override_num_blocks=cpus * 2)
        n_base = int(rd.read_parquet(feat_dir).count())  # parquet metadata
        gate = _uid_gate(base_feats) if n_base <= GATE_LIMIT else None
        res = dedup_images(
            new_ds,
            cfg,
            run_dir=run_dir,
            survivor_rank_fn=survivor_rank_fn,
            skip_pairs_within=gate,
            extra_features=base_feats,
        )
    else:
        # legacy base run (no features/): re-sign the canonical table
        canon_dir = os.path.join(base_dir, "canonical")
        base_canon = rd.read_parquet(
            canon_dir, columns=keep, override_num_blocks=cpus * 2
        )
        # conform BOTH sides to one Arrow schema before the union when they
        # differ: the base side comes off parquet (large_string etc.) while
        # the new side may have passed through pandas — mixed block schemas
        # crash the zero-copy batcher inside the signature stage.
        base_schema = base_canon.schema()
        new_schema = new_ds.schema()
        if [str(t) for t in base_schema.types] != [
            str(t) for t in new_schema.types
        ]:
            target = pa.schema(
                [(c, pa.int64() if c == "phash" else pa.string()) for c in keep]
            )

            def conform(t: pa.Table) -> pa.Table:
                return t.select(keep).cast(target)

            base_canon = base_canon.map_batches(conform, batch_format="pyarrow")
            new_ds = new_ds.map_batches(conform, batch_format="pyarrow")
        n_base = int(base_canon.count())
        gate = None
        if n_base <= GATE_LIMIT:
            # uid gate hashed block-by-block off Arrow id arrays — no Python
            # string list (the _loser_uid_batch pattern, dedup_images.py)
            blocks = [
                text_hash_u64(
                    b.column("image_id").combine_chunks()
                    if isinstance(b.column("image_id"), pa.ChunkedArray)
                    else b.column("image_id")
                )
                for b in ray.get(
                    base_canon.select_columns(["image_id"]).to_arrow_refs()
                )
                if b.num_rows and "image_id" in b.schema.names
            ]
            gate = (
                np.sort(np.concatenate(blocks))
                if blocks
                else np.empty(0, dtype=np.uint64)
            )
        res = dedup_images(
            base_canon.union(new_ds),
            cfg,
            run_dir=run_dir,
            survivor_rank_fn=survivor_rank_fn,
            skip_pairs_within=gate,
        )

    # ---- expand result clusters through the base membership ----------------
    base_clusters_ds = rd.read_parquet(clusters_dir)
    n_base_clusters = int(base_clusters_ds.count())  # parquet metadata
    n_parts = max(8, min(64, cpus * 2), n_base_clusters // 500_000)
    clusters_ds, n_touched = _expand_clusters(
        res.clusters_ds, base_clusters_ds, n_parts
    )
    clusters_ds = clusters_ds.materialize()
    metrics = {
        **res.metrics,
        "base_canonical": int(n_base),
        "base_clusters": n_base_clusters,
        "base_clusters_touched": n_touched,
        "new_rows": int(new_ds.count()),
        "gated": gate is not None,
        "clusters_total": int(clusters_ds.count()),
        "index_featurized": not os.path.isdir(feat_dir),
    }
    return clusters_ds, metrics


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
    if not os.path.exists(os.path.join(base_dir, "manifest.json")) or (
        # pre-features cache from an older code version: rebuild so the
        # increment exercises the persisted-signature fast path
        not os.path.isdir(os.path.join(base_dir, "features"))
    ):
        base_ds = read_corpus(path).map_batches(even_half, batch_format="pandas")
        save_run(dedup_images(base_ds, cfg), base_ds, base_dir)

    new_ds = read_corpus(path).map_batches(odd_half, batch_format="pandas")
    clusters_ds, _metrics = dedup_images_incremental(base_dir, new_ds, cfg)
    return (
        clusters_ds.to_pandas()
        .sort_values("cluster_id")
        .reset_index(drop=True)
    )
