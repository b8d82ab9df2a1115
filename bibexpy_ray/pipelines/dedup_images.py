"""Flagship pipeline: near-duplicate detection + clustering over image+caption tables.

Ray-Data-first composition of the reference's Smart Merge phases
(/root/reference/apps/api/services/smart_merger.py:576-827) at near-dup scale:

  read -> signature map_batches (actor pool)                 [Phase 1 normalize]
       -> exact pre-collapse groupby(caption_hash, phash)    [exact-dup pre-pass,
                                                              MergeDB.py:776-797 analog]
       -> LSH band emit + pHash bands + authority buckets    [Phase 2 blocking]
       -> salted/capped bucket pair emit -> edge dedup       [candidate generation]
       -> verify stage (staged decision table + neg rules)   [Phase 3 matching]
       -> connected components -> cluster ids                [greedy 1:1 analog]
       -> survivor selection (richest metadata)              [Phase 4 field merge]
       -> canonical table + match_audit + borderline queue   [Phase 5 audit]

Scale properties: image bytes never enter a shuffle (signatures and ids only);
the exact pre-collapse bounds LSH input; hot buckets are capped with a
sorted-by-pHash window fallback; every stage is deterministic, and stage
boundaries checkpoint to a RunDir for mid-pipeline restart.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from bibexpy_ray.config import DedupConfig
from bibexpy_ray.stages.lsh import (
    BucketPairEmitter,
    add_coarse_partition,
    dedupe_pairs,
    emit_authority_rows,
    emit_caption_band_rows,
    emit_phash_band_rows,
    emit_prefix_rows,
)
from bibexpy_ray.stages.signer import SignatureStage
from bibexpy_ray.stages.survivor import select_survivors
from bibexpy_ray.stages.unionfind import DRIVER_EDGE_LIMIT, clusters_driver
from bibexpy_ray.stages.verify import EdgeVerifier
from bibexpy_ray.state.checkpoint import RunDir

#: columns the signature/feature path needs — bytes is deliberately absent
FEATURE_INPUT_COLS = ["image_id", "caption", "phash", "fmt"]
#: verify-side feature table broadcasts below this row count (~100 B/row →
#: ≤ ~200 MB in the object store, one copy per node); above it the verifier
#: hash-joins features to edges (tests/test_verify_join_path.py proves the
#: two paths equivalent)
BROADCAST_LIMIT = 2_000_000


@dataclass
class DedupResult:
    clusters: pd.DataFrame          # cluster_id, survivor_id, cluster_size, members
    cluster_map: dict[str, str]     # member id -> cluster id (only ids in size>=2 clusters)
    borderline: pd.DataFrame        # id_a, id_b, confidence, similarity
    audit: pd.DataFrame             # verified edges (all stages)
    metrics: dict

    def assign_clusters(self, ds: rd.Dataset) -> rd.Dataset:
        """Append cluster_id to a dataset of IMAGE_SCHEMA rows (broadcast map)."""
        ref = ray.put(self.cluster_map)

        def attach(batch: pd.DataFrame) -> pd.DataFrame:
            cmap = ray.get(ref)
            batch["cluster_id"] = [
                cmap.get(i, i) for i in batch["image_id"]
            ]
            return batch

        return ds.map_batches(attach, batch_format="pandas")

    def merged_records(
        self,
        ds: rd.Dataset,
        policies: dict[str, str] | None = None,
    ) -> tuple[pd.DataFrame, pd.DataFrame]:
        """Phase-4 field merge: fold each duplicate cluster's metadata rows into
        one merged record using per-field policies (functions/fieldmerge.py —
        the reference's merge_pair_with_preferences scaled to n-ary clusters,
        smart_merger.py:388-458). Returns (merged_records, conflict_log).

        Metadata only — the ``bytes`` column never enters this reduce; callers
        re-attach payloads by survivor id from the canonical dataset.
        """
        from bibexpy_ray.functions.fieldmerge import merge_record

        cmap = self.cluster_map
        if not cmap:
            return pd.DataFrame(), pd.DataFrame()
        ref = ray.put(cmap)
        meta_cols = [c for c in ds.schema().names if c != "bytes"]

        def members_of(batch: pd.DataFrame) -> pd.DataFrame:
            cm = ray.get(ref)
            sub = batch[batch["image_id"].isin(cm.keys())].copy()
            sub["cluster_id"] = [cm[i] for i in sub["image_id"]]
            return sub

        def merge_part(part: pd.DataFrame) -> pd.DataFrame:
            out_rows, conflict_rows = [], []
            for cid, g in part.groupby("cluster_id"):
                rows = g.drop(columns=["cluster_id"]).sort_values("image_id")
                merged, conflicts = merge_record(rows.to_dict("records"), policies)
                merged["cluster_id"] = cid
                out_rows.append(merged)
                for c in conflicts:
                    conflict_rows.append({**c, "cluster_id": cid})
            res = pd.DataFrame(out_rows)
            res.attrs["conflicts"] = conflict_rows
            res["_conflicts"] = [
                "" for _ in range(len(res))
            ]  # placeholder keeps schema stable
            import json as _json

            if len(res):
                res.loc[res.index[0], "_conflicts"] = _json.dumps(conflict_rows)
            return res

        merged_pd = (
            ds.select_columns(meta_cols)
            .map_batches(members_of, batch_format="pandas")
            .groupby("cluster_id")
            .map_groups(
                lambda g: merge_part(g), batch_format="pandas"
            )
            .to_pandas()
        )
        import json as _json

        conflicts = [
            row
            for blob in merged_pd["_conflicts"]
            if blob
            for row in _json.loads(blob)
        ]
        merged_pd = merged_pd.drop(columns=["_conflicts"])
        return (
            merged_pd.sort_values("cluster_id").reset_index(drop=True),
            pd.DataFrame(conflicts),
        )

    def canonical(self, ds: rd.Dataset) -> rd.Dataset:
        """Survivor rows only (losers filtered out), with cluster_id attached.

        The loser set (dup-cluster members minus survivors) is small relative to
        the corpus, so it broadcasts; the full dataset streams through a single
        vectorized filter — no shuffle of image bytes.
        """
        survivors = set(self.clusters["survivor_id"])
        losers = {m for m, c in self.cluster_map.items() if m not in survivors}
        cmap = self.cluster_map
        ref = ray.put((losers, cmap))

        def keep(batch: pd.DataFrame) -> pd.DataFrame:
            lose, cm = ray.get(ref)
            mask = ~batch["image_id"].isin(lose)
            out = batch[mask].copy()
            out["cluster_id"] = [cm.get(i, i) for i in out["image_id"]]
            return out

        return ds.map_batches(keep, batch_format="pandas")


def _exact_group_edges(group: pd.DataFrame) -> pd.DataFrame:
    """Edges inside one exact-content group (same caption hash AND pHash).

    Negative-rule safe: members carrying *different* authority ids are never
    linked (the determinative-id rule trumps exact content equality,
    smart_merger.py:205-226); null-authority members link together and to the
    single distinct authority subgroup when exactly one exists.
    """
    ids = sorted(group["image_id"].tolist())
    if len(ids) < 2:
        return pd.DataFrame({"id_a": [], "id_b": [], "stage": [], "confidence": []})
    auth = {
        i: (a if isinstance(a, str) and a else None)
        for i, a in zip(group["image_id"], group["_authority"])
    }
    distinct = sorted({a for a in auth.values() if a})
    subgroups: list[list[str]] = []
    if len(distinct) <= 1:
        subgroups.append(ids)  # all content-equal, no conflicting ids
    else:
        nulls = [i for i in ids if auth[i] is None]
        if nulls:
            subgroups.append(nulls)
        for a in distinct:
            subgroups.append([i for i in ids if auth[i] == a])
    rows_a, rows_b = [], []
    for sub in subgroups:
        if len(sub) < 2:
            continue
        rep = sub[0]
        for other in sub[1:]:
            rows_a.append(rep)
            rows_b.append(other)
    return pd.DataFrame(
        {
            "id_a": rows_a,
            "id_b": rows_b,
            "stage": ["0_exact"] * len(rows_a),
            "confidence": [1.0] * len(rows_a),
        }
    )


def _default_concurrency() -> tuple[int, int]:
    """Actor-pool sizing: autoscale from 1 up to cpus-1 actors. A fixed
    minimum above 1 can deadlock the streaming executor when several stages
    compete for CPUs on a small node; (1, cpus-1) keeps one CPU for the
    read/write stages and lets Ray grow the pool under load."""
    cpus = int(ray.cluster_resources().get("CPU", 4))
    return (1, max(2, cpus - 1))


def compute_features(ds: rd.Dataset, cfg: DedupConfig) -> rd.Dataset:
    """Signature stage over the metadata columns (zero-copy Arrow batches).

    Task pool + per-process state memo (stages/signer.py sign_batch): the
    stage state is trivial to derive, so skipping actor-pool startup wins;
    ``cfg.signer_concurrency`` forces an explicit actor pool when set.
    """
    from bibexpy_ray.stages.signer import sign_batch

    cols = [c for c in FEATURE_INPUT_COLS if c in ds.schema().names]
    ds = ds.select_columns(cols)
    if cfg.signer_concurrency:
        return ds.map_batches(
            SignatureStage,
            fn_constructor_kwargs={"cfg": cfg},
            batch_format="pyarrow",
            batch_size=cfg.signer_batch_size,
            concurrency=cfg.signer_concurrency,
        )
    return ds.map_batches(
        sign_batch,
        fn_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=cfg.signer_batch_size,
    )


def dedup_images(
    ds: rd.Dataset,
    cfg: DedupConfig | None = None,
    run_dir: Optional[str] = None,
) -> DedupResult:
    """Run the full near-duplicate pipeline. ``ds`` must have IMAGE_SCHEMA columns
    (bytes optional — never read here). Returns cluster assignments + side outputs.
    """
    import time as _time

    cfg = cfg or DedupConfig()
    rdir = RunDir(run_dir, config={"cfg": str(cfg)}) if run_dir else None
    metrics: dict = {}
    t_phase = _time.time()

    def _lap(name: str) -> None:
        nonlocal t_phase
        metrics[name] = round(_time.time() - t_phase, 2)
        t_phase = _time.time()

    if ds.count() == 0:
        empty = pd.DataFrame(
            {"cluster_id": [], "survivor_id": [], "cluster_size": [], "members": []}
        )
        return DedupResult(
            clusters=empty,
            cluster_map={},
            borderline=pd.DataFrame({"id_a": [], "id_b": []}),
            audit=pd.DataFrame({"id_a": [], "id_b": [], "stage": []}),
            metrics={"exact_edges": 0, "candidate_edges": 0, "verified_auto": 0,
                     "borderline": 0, "clusters": 0},
        )

    def checkpoint(name, factory):
        if rdir is None:
            return factory()
        return rdir.materialize(name, factory)

    features = checkpoint("features", lambda: compute_features(ds, cfg))
    # Pin the feature table (ids + signatures, bytes excluded — bounded at
    # ~1.1 KB/row) in the object store: five downstream consumers read it, and
    # without pinning each one would either re-run the signature stage (no
    # run_dir) or re-decode the fixed-size-list parquet checkpoint (run_dir —
    # measured ~20 s per consumer at 192k rows on 8 CPUs).
    features = features.materialize()
    _lap("s_features")

    # fixed floor, not CPU-proportional: coarse partitions bound per-task skew
    # (hot buckets concentrate in few partitions when P is small) and a fixed
    # P keeps results and load shape identical across cluster sizes
    n_coarse = max(64, int(ray.cluster_resources().get("CPU", 4)) * 2)

    # ---- exact pre-collapse -------------------------------------------------
    def exact_stage():
        def exact_partition(part: pd.DataFrame) -> pd.DataFrame:
            # one coarse hash-partition: vectorized segment scan over the
            # (caption_hash, phash) sort; only >=2 segments reach python
            part = part.sort_values(["_caption_hash", "phash", "image_id"], kind="mergesort")
            k1 = part["_caption_hash"].to_numpy()
            k2 = part["phash"].to_numpy()
            import numpy as np

            brk = np.r_[True, (k1[1:] != k1[:-1]) | (k2[1:] != k2[:-1])]
            starts = np.flatnonzero(brk)
            ends = np.r_[starts[1:], len(part)]
            outs = [
                _exact_group_edges(part.iloc[s:e])
                for s, e in zip(starts, ends)
                if e - s >= 2
            ]
            if not outs:
                return _exact_group_edges(part.iloc[:0])
            return pd.concat(outs, ignore_index=True)

        return (
            features.select_columns(["image_id", "_caption_hash", "phash", "_authority"])
            .map_batches(
                lambda b: add_coarse_partition(b, "_caption_hash", n_coarse),
                batch_format="pyarrow",
            )
            .groupby("_part")
            .map_groups(exact_partition, batch_format="pandas")
        )

    exact_edges = checkpoint("exact_edges", exact_stage)

    # representatives: drop exact-dup losers before LSH (candidate-volume bound)
    exact_pd = exact_edges.to_pandas()
    exact_losers: set[str] = set(exact_pd["id_b"]) if len(exact_pd) else set()
    metrics["exact_edges"] = int(len(exact_pd))
    _lap("s_exact")

    # loser filter by numeric uid against a PREBUILT sorted array — building
    # or sorting the value set per batch would dominate the filter
    from bibexpy_ray.functions.hashing import text_hash_u64 as _th64

    loser_uids = (
        np.sort(_th64(sorted(exact_losers))) if exact_losers else np.empty(0, np.uint64)
    )
    loser_ref = ray.put(loser_uids)

    def drop_losers(batch: pa.Table) -> pa.Table:
        # pure-Arrow-adjacent filter: keeps the _minhash fixed_size_list intact
        lose = ray.get(loser_ref)
        if lose.size == 0:
            return batch
        uids = batch.column("_uid").to_numpy(zero_copy_only=False).astype(np.uint64)
        pos = np.searchsorted(lose, uids)
        pos[pos == lose.size] = 0
        mask = lose[pos] != uids
        return batch.filter(pa.array(mask))

    reps = features.map_batches(drop_losers, batch_format="pyarrow")

    # ---- candidate generation ----------------------------------------------
    def candidates_stage():
        # all three bucket-row kinds emitted in ONE pass over the features —
        # a union of three branches would re-execute the upstream per branch
        # and demand three concurrent actor pools (scheduler deadlock on small
        # nodes; 3x the read at scale)
        def emit_all(b: pa.Table) -> pa.Table:
            return pa.concat_tables(
                [
                    emit_caption_band_rows(b, cfg),
                    emit_prefix_rows(b, cfg),
                    emit_phash_band_rows(b, cfg),
                    emit_authority_rows(b, cfg),
                ]
            )

        bucket_rows = reps.map_batches(emit_all, batch_format="pyarrow")
        emitter = BucketPairEmitter(cfg.bucket_pair_cap, phash_tol=cfg.phash_hamming_tol)

        def emit_pairs(df: pd.DataFrame) -> pd.DataFrame:
            return emitter(df)

        pairs = (
            bucket_rows.map_batches(
                lambda b: add_coarse_partition(b, "bucket_key", n_coarse),
                batch_format="pyarrow",
            )
            .groupby("_part")
            .map_groups(emit_pairs, batch_format="pandas")
            # barrier: the union below would otherwise put two all-to-all
            # Sorts (bucket groupby + containment groupby + pair dedupe) into
            # one streaming DAG, which thrashes badly at low CPU counts
            # (measured 5x slower at 8 CPUs); pairs are ids-only — cheap to pin
            .materialize()
        )
        _lap("s_cand_lsh")
        if cfg.substring_pass:
            # suffix-array containment pass (Stage-4 feeder for contained
            # captions whose Jaccard/prefix signals are too weak — the
            # partial-metadata-match analog, smart_merger.py:309-334)
            from bibexpy_ray.stages.substring import containment_candidates

            from bibexpy_ray.functions.hashing import text_hash_u64

            def to_uid_pairs(df: pd.DataFrame) -> pd.DataFrame:
                # containment works on id strings; the pair stream is numeric
                a = text_hash_u64(df["id_a"].tolist())
                b = text_hash_u64(df["id_b"].tolist())
                return pd.DataFrame(
                    {
                        "id_a": np.minimum(a, b),
                        "id_b": np.maximum(a, b),
                        "dropped": np.zeros(len(df), dtype=np.int64),
                    }
                )

            contained = (
                containment_candidates(
                    reps.select_columns(["image_id", "_norm_caption"]), cfg, n_coarse
                )
                .map_batches(to_uid_pairs, batch_format="pandas")
                .materialize()
            )
            _lap("s_cand_contain")
            pairs = pairs.union(contained)
        # a pair appears in many buckets: dedupe on (id_a, id_b)
        return dedupe_pairs(pairs, n_coarse)

    # candidate edges feed both the verifier and the metrics count — pin them
    # so the shuffle-heavy candidate stage executes exactly once
    edges_raw = checkpoint("edges_raw", candidates_stage).materialize()
    _lap("s_candidates")

    # ---- verification -------------------------------------------------------
    # edges carry numeric uids; verification joins features back BY UID and
    # emits string image_ids (the external audit/cluster surface)
    feat_cols = ["_uid", "image_id", "_norm_caption", "phash", "_authority"]

    def verify_stage():
        # rep count derived arithmetically — a reps.count() here would execute
        # the filter chain once just to pick a code path
        n_reps = features.count() - len(exact_losers)
        edge_cols = edges_raw.select_columns(["id_a", "id_b"])
        if n_reps <= BROADCAST_LIMIT:
            # broadcast lookup as uid-sorted numpy columns: searchsorted probes
            # are vectorized and the build avoids a driver-side pandas index
            feat_tbl = pa.concat_tables(
                ray.get(reps.select_columns(feat_cols).to_arrow_refs())
            ).combine_chunks()
            uids = feat_tbl.column("_uid").to_numpy(zero_copy_only=False).astype(np.uint64)
            order = np.argsort(uids)
            uids = uids[order]
            cols = {
                c: feat_tbl.column(c).to_numpy(zero_copy_only=False)[order]
                for c in feat_cols
                if c != "_uid"
            }
            feat_ref = ray.put((uids, cols))
            _lap("s_verify_bcast_build")

            def join_verify(batch: pd.DataFrame) -> pd.DataFrame:
                suids, scols = ray.get(feat_ref)
                pa_idx = np.searchsorted(suids, batch["id_a"].to_numpy(dtype=np.uint64))
                pb_idx = np.searchsorted(suids, batch["id_b"].to_numpy(dtype=np.uint64))
                joined = pd.DataFrame(
                    {
                        "id_a": scols["image_id"][pa_idx],
                        "id_b": scols["image_id"][pb_idx],
                        "_norm_caption_a": scols["_norm_caption"][pa_idx],
                        "_norm_caption_b": scols["_norm_caption"][pb_idx],
                        "phash_a": scols["phash"][pa_idx],
                        "phash_b": scols["phash"][pb_idx],
                        "_authority_a": scols["_authority"][pa_idx],
                        "_authority_b": scols["_authority"][pb_idx],
                    }
                )
                return EdgeVerifier(cfg)(joined)

            return edge_cols.map_batches(join_verify, batch_format="pandas")
        # scale path: hash-partitioned joins (bytes-free feature table)
        n_parts = max(8, n_reps // 500_000)

        def side(suffix: str, key: str):
            def rename(df: pd.DataFrame) -> pd.DataFrame:
                out = df.rename(
                    columns={
                        "_uid": key,
                        **{
                            c: c + suffix
                            for c in feat_cols
                            if c not in ("_uid",)
                        },
                    }
                )
                return out

            return reps.select_columns(feat_cols).map_batches(
                rename, batch_format="pandas"
            )

        fa = side("_a", "id_a")
        fb = side("_b", "id_b")
        joined = edge_cols.join(fa, "inner", n_parts, on=("id_a",)).join(
            fb, "inner", n_parts, on=("id_b",)
        )
        # uid join keys served their purpose; expose string ids downstream
        joined = joined.map_batches(
            lambda df: df.drop(columns=["id_a", "id_b"]).rename(
                columns={"image_id_a": "id_a", "image_id_b": "id_b"}
            ),
            batch_format="pandas",
        )
        return joined.map_batches(
            EdgeVerifier,
            fn_constructor_kwargs={"cfg": cfg},
            batch_format="pandas",
            concurrency=_default_concurrency(),
        )

    verified = checkpoint("verified", verify_stage).materialize()
    _lap("s_verify_exec")
    verified_pd = verified.to_pandas()
    _lap("s_verify_collect")
    borderline = verified_pd[verified_pd["stage"] == "5_borderline"].reset_index(drop=True)
    auto = verified_pd[
        (verified_pd["stage"] != "5_borderline") & (verified_pd["confidence"] >= 0.9)
    ]
    metrics["candidate_edges"] = int(edges_raw.count())
    metrics["verified_auto"] = int(len(auto))
    metrics["borderline"] = int(len(borderline))
    t_phase = _time.time()

    # ---- connected components ----------------------------------------------
    all_edges = list(zip(auto["id_a"], auto["id_b"]))
    if len(exact_pd):
        all_edges += list(zip(exact_pd["id_a"], exact_pd["id_b"]))
    if len(all_edges) > DRIVER_EDGE_LIMIT:  # pragma: no cover - scale path
        # distributed min-label propagation over the edge Dataset; verified
        # equivalent to the driver union-find in tests/test_unionfind.py
        from bibexpy_ray.stages.unionfind import clusters_distributed

        edges_ds = rd.from_pandas(
            pd.DataFrame({"id_a": [a for a, _ in all_edges],
                          "id_b": [b for _, b in all_edges]})
        )
        labels = clusters_distributed(edges_ds).to_pandas()
        cluster_map = dict(zip(labels["image_id"], labels["cluster_id"]))
    else:
        cluster_map = clusters_driver(all_edges)
    metrics["clusters"] = len(set(cluster_map.values()))
    _lap("s_unionfind")

    # ---- survivor selection -------------------------------------------------
    if cluster_map:
        cmap_ref = ray.put(cluster_map)

        def members_of(batch: pd.DataFrame) -> pd.DataFrame:
            cm = ray.get(cmap_ref)
            sub = batch[batch["image_id"].isin(cm.keys())].copy()
            sub["cluster_id"] = [cm[i] for i in sub["image_id"]]
            return sub[["cluster_id", "image_id", "fmt", "caption"]]

        from bibexpy_ray.functions.hashing import text_hash_u64
        from bibexpy_ray.stages.survivor import survivors_partition

        def add_cluster_part(df: pd.DataFrame) -> pd.DataFrame:
            h = text_hash_u64(df["cluster_id"].tolist())
            df["_part"] = (h % np.uint64(n_coarse)).astype(np.int32)
            return df

        # coarse hash partition on cluster_id: whole clusters colocate, the
        # per-partition reduce is vectorized over many clusters at once
        clusters = (
            features.select_columns(["image_id", "fmt", "caption"])
            .map_batches(members_of, batch_format="pandas")
            .map_batches(add_cluster_part, batch_format="pandas")
            .groupby("_part")
            .map_groups(
                lambda df: survivors_partition(df.drop(columns=["_part"])),
                batch_format="pandas",
            )
            .to_pandas()
        )
    else:
        clusters = pd.DataFrame(
            {"cluster_id": [], "survivor_id": [], "cluster_size": [], "members": []}
        )

    _lap("s_survivor")
    if rdir is not None:
        rdir.mark_done("result", metrics)

    return DedupResult(
        clusters=clusters,
        cluster_map=cluster_map,
        borderline=borderline,
        audit=verified_pd,
        metrics=metrics,
    )


def read_corpus(path: str) -> rd.Dataset:
    """Read an image+caption table (parquet dir/file; Lance when available)."""
    if path.endswith(".lance"):
        try:
            return rd.read_lance(path)  # lance not installed in this sandbox
        except (ImportError, AttributeError) as e:  # pragma: no cover
            raise NotImplementedError("Lance reader requires the lance package") from e
    return rd.read_parquet(path)
