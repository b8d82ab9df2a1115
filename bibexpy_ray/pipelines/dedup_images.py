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
    _EMPTY_PAIRS,
    BucketPairEmitter,
    add_coarse_partition,
    dedupe_pairs_manual,
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
#: columns the candidate + verify consumers of the ``reps`` pin actually
#: read (bucket emitters: _minhash/_n_shingles/_uid/phash/_authority/
#: _norm_caption; containment: image_id/_norm_caption; verify feat join:
#: the 5 feat_cols) — the second pin carries nothing else
CANDIDATE_COLS = [
    "image_id",
    "_uid",
    "_norm_caption",
    "phash",
    "_authority",
    "_minhash",
    "_n_shingles",
]
#: above this many rep rows, drop the signature columns from the reps pin
#: once the candidate stage has consumed them (frees ~1 KB/row of object
#: store before the verify shuffle — the measured 5M disk-ceiling driver);
#: below it the re-materialize costs more than the memory it frees
REPS_SLIM_LIMIT = 500_000
#: verify-side feature table broadcasts below this row count (~100 B/row →
#: ≤ ~200 MB in the object store, one copy per node); above it the verifier
#: hash-joins features to edges (tests/test_verify_join_path.py proves the
#: two paths equivalent)
BROADCAST_LIMIT = 2_000_000
#: exact-dup loser uids broadcast below this edge count (8 B/uid → ≤16 MB);
#: above it the losers anti-join the feature table via an Arrow-native hash
#: shuffle (tests/test_verify_join_path.py proves the paths equivalent) —
#: the exact-dup edge SET never lands on the driver at any scale
LOSER_BROADCAST_LIMIT = 2_000_000


class ClusterLabels:
    """Member → cluster mapping with a scale-dependent physical form.

    Below ``LABEL_BROADCAST_LIMIT`` members: uid-sorted numpy arrays in the
    object store (``ray.put`` once; vectorized searchsorted probes with an
    exact-match guard — never a Python dict of every member). Above it: a
    labels Dataset joined to consumers by hash partition (the VERDICT scale
    path — no driver-resident structure of unbounded size).
    """

    def __init__(
        self,
        members: "np.ndarray | pa.Array | None" = None,
        canon: np.ndarray | None = None,
        labels_ds: rd.Dataset | None = None,
        canon_codes: np.ndarray | None = None,
    ):
        self._labels_ds = labels_ds
        self._ref = None
        if members is not None:
            from bibexpy_ray.functions.hashing import text_hash_u64

            # members/canon live as ARROW string arrays: ray.put serializes
            # Arrow buffers zero-copy (~ms), where an object-dtype numpy array
            # of the same strings pickles every PyObject (seconds at ~1M
            # members — measured as a FLAT ~10 s survivor stage at both
            # parallelism levels, i.e. pure serial time in the scaling ratio)
            if len(members) == 0:
                self._uids = np.empty(0, dtype=np.uint64)
                self._members = pa.array([], type=pa.string())
                self._canon = pa.array([], type=pa.string())
            elif isinstance(members, (pa.Array, pa.ChunkedArray)):
                # Arrow fast path (the driver-CC output): hash/take stay in
                # C — no Python string list is ever built. ``canon_codes``
                # indexes members (members[canon_codes[i]] is i's canonical).
                if isinstance(members, pa.ChunkedArray):
                    members = members.combine_chunks()
                uids = text_hash_u64(members)
                order = np.argsort(uids)
                self._uids = uids[order]
                self._members = members.take(pa.array(order))
                self._canon = (
                    members.take(pa.array(canon_codes[order]))
                    if canon_codes is not None
                    else pa.array(np.asarray(canon, dtype=object)[order])
                )
            else:
                uids = text_hash_u64(list(members))
                order = np.argsort(uids)
                self._uids = uids[order]
                self._members = pa.array(
                    np.asarray(members, dtype=object)[order], type=pa.string()
                )
                self._canon = pa.array(
                    np.asarray(canon, dtype=object)[order], type=pa.string()
                )
        else:
            self._uids = None

    @property
    def is_broadcast(self) -> bool:
        return self._uids is not None

    def __len__(self) -> int:
        if self.is_broadcast:
            return len(self._uids)
        return self._labels_ds.count() if self._labels_ds is not None else 0

    def as_dict(self) -> dict[str, str]:
        """Driver-side {member: cluster} (test/small-result surface only)."""
        if self.is_broadcast:
            return dict(zip(self._members.to_pylist(), self._canon.to_pylist()))
        if self._labels_ds is None:
            return {}
        pdf = self._labels_ds.to_pandas()
        return dict(zip(pdf["image_id"], pdf["cluster_id"]))

    def to_dataset(self) -> rd.Dataset | None:
        if self._labels_ds is not None:
            return self._labels_ds
        if self._uids is None or len(self._uids) == 0:
            return None
        return rd.from_arrow(
            pa.table({"image_id": self._members, "cluster_id": self._canon})
        )

    def _broadcast_ref(self):
        if self._ref is None:
            self._ref = ray.put((self._uids, self._members, self._canon))
        return self._ref

    def attach(self, ds: rd.Dataset, members_only: bool = False) -> rd.Dataset:
        """Append ``cluster_id`` (non-members map to their own id); with
        ``members_only`` return only member rows instead."""
        if self.is_broadcast:
            from bibexpy_ray.functions.hashing import text_hash_u64

            ref = self._broadcast_ref()

            def probe(batch: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                uids, members, canon = ray.get(ref)
                ids = batch.column("image_id")
                if isinstance(ids, pa.ChunkedArray):
                    ids = ids.combine_chunks()
                if len(uids) == 0:
                    hit = np.zeros(len(ids), dtype=bool)
                    cl = ids
                else:
                    h = text_hash_u64(ids)
                    pos = np.minimum(np.searchsorted(uids, h), len(uids) - 1)
                    # exact-match guard: uid hit AND the member string matches
                    # (hash collisions / drift must not mislabel a row)
                    pos_arr = pa.array(pos)
                    hit = (uids[pos] == h) & pc.equal(
                        members.take(pos_arr), ids
                    ).to_numpy(zero_copy_only=False)
                    cl = pc.if_else(pa.array(hit), canon.take(pos_arr), ids)
                out = batch.append_column("cluster_id", cl)
                if members_only:
                    return out.filter(pa.array(hit))
                return out

            return ds.map_batches(probe, batch_format="pyarrow")
        labels = self._labels_ds
        if labels is None:
            if members_only:
                return ds.limit(0)
            return ds.map_batches(
                lambda df: df.assign(cluster_id=df["image_id"]),
                batch_format="pandas",
            )
        # co-partition lookup via the raw-task hash shuffle — Dataset.join
        # reserves an aggregator ACTOR pool sized by num_partitions, which
        # cannot schedule on small clusters (see stages/unionfind.py); the
        # task shuffle has no actor floor and the same all-to-all cost
        from bibexpy_ray.functions.hashing import text_hash_u64 as _th
        from bibexpy_ray.stages.shuffle import hash_partition_apply as _hpa

        n_parts = max(8, len(self) // 500_000)
        marked = labels.map_batches(
            lambda df: pd.DataFrame(
                {"image_id": df["image_id"], "_lab": df["cluster_id"]}
            ),
            batch_format="pandas",
        )

        def key(t: pa.Table) -> np.ndarray:
            ids = t.column("image_id")
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            return (_th(ids) % np.uint64(n_parts)).astype(np.int32)

        def lookup(part: pd.DataFrame) -> pd.DataFrame:
            if "_lab" not in part.columns:
                # no labels landed here: every row keeps its own id
                if members_only:
                    return part.iloc[0:0].assign(cluster_id=part["image_id"].iloc[0:0])
                return part.assign(cluster_id=part["image_id"])
            # only label rows carry _lab (ds rows get a null via promotion)
            is_lab = part["_lab"].notna()
            build = pd.DataFrame(
                {
                    "image_id": part.loc[is_lab, "image_id"],
                    "cluster_id": part.loc[is_lab, "_lab"],
                }
            ).drop_duplicates("image_id")
            probe = part.loc[~is_lab].drop(columns=["_lab"])
            m = probe.merge(build, on="image_id", how="left")
            if members_only:
                return m[m["cluster_id"].notna()]
            return m.assign(cluster_id=m["cluster_id"].fillna(m["image_id"]))

        return _hpa(ds.union(marked), n_parts, lookup, key_fn=key)


@dataclass
class DedupResult:
    """Flagship output. The heavy surfaces (clusters, borderline, audit) are
    Datasets — nothing of unbounded size lives on the driver; the pandas/dict
    properties below are lazy conveniences for tests and small results."""

    clusters_ds: rd.Dataset         # cluster_id, survivor_id, cluster_size, members
    labels: ClusterLabels           # member id -> cluster id (size>=2 clusters)
    borderline_ds: rd.Dataset       # id_a, id_b, confidence, similarity
    audit_ds: rd.Dataset            # verified edges (all stages)
    metrics: dict
    #: FULL signature table (every input row) — retained so save_run can
    #: persist the CANONICAL rows' features (``filter_losers`` of this — the
    #: cluster-loser set subsumes exact losers, which are cluster members
    #: via the exact edges, EXCEPT when an exact loser wins the survivor
    #: rank, which is exactly why the reps table would be wrong here) and an
    #: incremental run can skip re-featurizing the whole index
    features_ds: "rd.Dataset | None" = None

    def __post_init__(self):
        self._cache: dict[str, object] = {}

    def _memo(self, key: str, fn):
        if key not in self._cache:
            self._cache[key] = fn()
        return self._cache[key]

    @property
    def clusters(self) -> pd.DataFrame:
        return self._memo(
            "clusters",
            lambda: self.clusters_ds.to_pandas()
            .sort_values("cluster_id")
            .reset_index(drop=True),
        )

    @property
    def cluster_map(self) -> dict[str, str]:
        return self._memo("cluster_map", self.labels.as_dict)

    @property
    def borderline(self) -> pd.DataFrame:
        return self._memo(
            "borderline",
            lambda: self.borderline_ds.to_pandas()
            .sort_values(["id_a", "id_b"])
            .reset_index(drop=True),
        )

    @property
    def audit(self) -> pd.DataFrame:
        return self._memo(
            "audit",
            lambda: self.audit_ds.to_pandas()
            .sort_values(["id_a", "id_b", "stage"])
            .reset_index(drop=True),
        )

    def assign_clusters(self, ds: rd.Dataset) -> rd.Dataset:
        """Append cluster_id to a dataset of IMAGE_SCHEMA rows."""
        return self.labels.attach(ds)

    def merged_records_ds(
        self,
        ds: rd.Dataset,
        policies: dict[str, str] | None = None,
    ) -> tuple[rd.Dataset, rd.Dataset]:
        """Distributed phase-4 field merge: fold each duplicate cluster's
        metadata rows into one merged record using per-field policies
        (functions/fieldmerge.py — the reference's merge_pair_with_preferences
        scaled to n-ary clusters, smart_merger.py:388-458). Returns lazy
        ``(merged_records, conflict_log)`` Datasets — nothing of unbounded
        size lands on the driver.

        One reduce task per hash partition of ``cluster_id`` (manual hash
        shuffle, stages/shuffle.py), not per-cluster ``map_groups`` — at
        millions of clusters the sort-groupby's per-group overhead would
        dominate. Metadata only — the ``bytes`` column never enters this
        reduce; callers re-attach payloads by survivor id from the canonical
        dataset. Each merged row carries ITS OWN cluster's conflict log as a
        JSON column (schema-stable per row; no cross-row smuggling), exploded
        into the conflict Dataset by a second streaming pass.
        """
        import json as _json

        from bibexpy_ray.functions.fieldmerge import merge_record
        from bibexpy_ray.functions.hashing import text_hash_u64
        from bibexpy_ray.stages.shuffle import hash_partition_apply

        meta_cols = [c for c in ds.schema().names if c != "bytes"]
        out_cols = meta_cols + ["cluster_id", "_conflicts"]
        conflict_cols = ["field", "chosen", "values", "cluster_id"]
        members = self.labels.attach(
            ds.select_columns(meta_cols), members_only=True
        )
        n_parts = max(8, len(self.labels) // 50_000)

        def cluster_key(tbl: pa.Table) -> np.ndarray:
            ids = tbl.column("cluster_id")
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            return (text_hash_u64(ids) % n_parts).astype(np.int64)

        def merge_part(part: pd.DataFrame) -> pd.DataFrame:
            out_rows = []
            for cid, g in part.groupby("cluster_id"):
                rows = g.drop(columns=["cluster_id"]).sort_values("image_id")
                merged, conflicts = merge_record(rows.to_dict("records"), policies)
                merged["cluster_id"] = cid
                merged["_conflicts"] = _json.dumps(
                    [{**c, "cluster_id": cid} for c in conflicts]
                )
                out_rows.append(merged)
            return pd.DataFrame(out_rows, columns=out_cols)

        merged_ds = hash_partition_apply(
            members, n_parts, merge_part, key_fn=cluster_key, compress=True
        )

        def explode_conflicts(part: pd.DataFrame) -> pd.DataFrame:
            rows = [
                row
                for blob in part["_conflicts"]
                if blob
                for row in _json.loads(blob)
            ]
            return pd.DataFrame(rows, columns=conflict_cols)

        return (
            merged_ds.drop_columns(["_conflicts"]),
            merged_ds.map_batches(explode_conflicts, batch_format="pandas"),
        )

    def merged_records(
        self,
        ds: rd.Dataset,
        policies: dict[str, str] | None = None,
    ) -> tuple[pd.DataFrame, pd.DataFrame]:
        """Collected convenience over :meth:`merged_records_ds` (tests / small
        results); at scale consume the Dataset variant directly."""
        if len(self.labels) == 0:
            return pd.DataFrame(), pd.DataFrame()
        merged_ds, conflicts_ds = self.merged_records_ds(ds, policies)
        return (
            merged_ds.to_pandas()
            .sort_values("cluster_id")
            .reset_index(drop=True),
            conflicts_ds.to_pandas(),
        )

    def filter_losers(self, ds: rd.Dataset) -> rd.Dataset:
        """Drop cluster losers (members minus survivors) from ``ds``.

        Below the broadcast limit the loser set derives Arrow-natively
        (``pc.is_in`` on the member column — no Python loop over members) and
        filters via uid-sorted arrays (one object-store copy, vectorized
        searchsorted with an exact-string guard). At scale, two co-partition
        passes over the raw-task hash shuffle (``Dataset.join`` reserves an
        aggregator actor pool sized by num_partitions — measured deadlocking
        small clusters, see stages/unionfind.py): labels anti survivors
        derives the loser marks, then ``ds`` anti the marks. Either way the
        dataset streams through one filter pass.
        """
        import pyarrow.compute as pc

        from bibexpy_ray.functions.hashing import text_hash_u64

        if self.labels.is_broadcast:
            members = self.labels._members  # uid-sorted, aligned with _uids
            if len(members) == 0:
                return ds
            surv = (
                self.clusters_ds.select_columns(["survivor_id"])
                .to_pandas()["survivor_id"]
            )  # bounded: one row per cluster
            is_surv = pc.is_in(
                members, value_set=pa.array(surv, type=members.type)
            )
            lose_mask = pc.fill_null(pc.invert(is_surv), True)
            lnames = members.filter(lose_mask)
            if len(lnames) == 0:
                return ds
            # _uids is sorted and aligned with members: the filtered slice
            # stays sorted, so no re-sort is needed
            luids = self.labels._uids[
                lose_mask.to_numpy(zero_copy_only=False).astype(bool)
            ]
            lose_ref = ray.put((luids, lnames))

            def keep(batch: pa.Table) -> pa.Table:
                uids, names = ray.get(lose_ref)
                ids = batch.column("image_id")
                if isinstance(ids, pa.ChunkedArray):
                    ids = ids.combine_chunks()
                h = text_hash_u64(ids)
                pos = np.minimum(np.searchsorted(uids, h), len(uids) - 1)
                hit = uids[pos] == h
                # exact-string guard on hash hits: a 64-bit collision with a
                # loser's uid must not silently delete an unrelated record
                # (same invariant ClusterLabels.attach enforces)
                if hit.any():
                    eq = pc.equal(
                        names.take(pa.array(pos[hit])),
                        ids.filter(pa.array(hit)),
                    ).to_numpy(zero_copy_only=False)
                    hit[hit] = eq.astype(bool)
                return batch.filter(pa.array(~hit))

            return ds.map_batches(keep, batch_format="pyarrow")
        # scale path: two co-partition anti passes (no driver structure)
        from bibexpy_ray.stages.shuffle import hash_partition_apply

        n_parts = max(8, len(self.labels) // 500_000)

        def key(t: pa.Table) -> np.ndarray:
            ids = t.column("image_id")
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            return (text_hash_u64(ids) % np.uint64(n_parts)).astype(np.int32)

        surv_marks = self.clusters_ds.select_columns(["survivor_id"]).map_batches(
            lambda df: pd.DataFrame(
                {"image_id": df["survivor_id"], "_surv": True}
            ),
            batch_format="pandas",
        )
        labels_ds = self.labels.to_dataset()

        def losers_part(part: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame(
                {
                    "image_id": pd.Series([], dtype=object),
                    "_lose": pd.Series([], dtype=bool),
                }
            )
            if "cluster_id" not in part.columns or len(part) == 0:
                return empty  # no label rows landed here
            is_lab = part["cluster_id"].notna()
            lab = part.loc[is_lab]
            surv = (
                set(part.loc[part["_surv"].notna(), "image_id"])
                if "_surv" in part.columns
                else set()
            )
            lose = lab.loc[~lab["image_id"].isin(surv)]
            return pd.DataFrame({"image_id": lose["image_id"], "_lose": True})

        losers_ds = hash_partition_apply(
            labels_ds.union(surv_marks),
            n_parts,
            losers_part,
            key_fn=key,
            empty_like=losers_part(pd.DataFrame()),
            compress=True,
        )

        # arrow-mode reduce: the data side may carry int32/int64/binary
        # columns — a pandas hop here would float-promote ints nulled by the
        # schema union with the 2-column mark rows
        def drop_part(t: pa.Table) -> pa.Table:
            if "_lose" not in t.schema.names:
                return t
            is_mark = pc.is_valid(t.column("_lose"))
            data = t.filter(pc.invert(is_mark)).drop_columns(["_lose"])
            marks = t.filter(is_mark)
            if marks.num_rows == 0 or data.num_rows == 0:
                return data
            lose_ids = marks.column("image_id")
            if isinstance(lose_ids, pa.ChunkedArray):
                lose_ids = lose_ids.combine_chunks()
            keep_mask = pc.invert(
                pc.is_in(data.column("image_id"), value_set=lose_ids)
            )
            return data.filter(pc.fill_null(keep_mask, True))

        return hash_partition_apply(
            ds.union(losers_ds), n_parts, drop_part, key_fn=key, arrow=True,
            compress=True,
        )

    def canonical(self, ds: rd.Dataset) -> rd.Dataset:
        """Survivor rows only (losers filtered out), with cluster_id attached."""
        return self.labels.attach(self.filter_losers(ds))


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
    ds: "rd.Dataset | str",
    cfg: DedupConfig | None = None,
    run_dir: Optional[str] = None,
    survivor_rank_fn=None,
    skip_pairs_within: "np.ndarray | None" = None,
    extra_features: "rd.Dataset | None" = None,
) -> DedupResult:
    """Run the full near-duplicate pipeline. ``ds`` must have IMAGE_SCHEMA columns
    (bytes optional — never read here). Returns cluster assignments + side outputs.

    ``ds`` may be the corpus PATH instead of a Dataset: with a ``run_dir``
    the signature stage then checkpoints per input-file group
    (``RunDir.materialize_partitioned`` — partition lineage in each part's
    ``_DONE``), so a restarted run recomputes only the unfinished partitions
    of the stage rather than the whole stage.

    ``survivor_rank_fn`` is the survivor-policy extension point (SURVEY
    §2.14): ``part -> pd.DataFrame`` of rank columns, lower-first, as in
    stages/survivor.survivors_partition. The callable is NOT part of the
    checkpoint config — resuming a run_dir with a different rank_fn is the
    caller's responsibility.

    ``skip_pairs_within`` (incremental mode, see pipelines/incremental.py):
    uint64 uids whose within-set candidate pairs are dropped before the
    verify stage — used when those rows are a base run's survivor index and
    pairs among them were already adjudicated. May be a bare sorted uid
    array or ``(uids, witness)`` with the aligned ``_uid_w`` identity
    witnesses — with witnesses, uid collision resolution treats the base
    rows as reserved keepers, so a NEW row colliding with a base uid is
    salted away instead of being silently swallowed by the gate. Not part
    of the checkpoint config: give incremental runs their own ``run_dir``.

    ``extra_features`` (incremental mode): an already-SIGNED feature table
    (the signature stage's output schema, e.g. a base run's persisted
    ``features/``) unioned in after ``ds``'s signature stage — the index
    never re-featurizes. Rows in ``extra_features`` must be disjoint from
    ``ds``.
    """
    import time as _time

    corpus_path = None
    if isinstance(ds, str):
        corpus_path = ds
        ds = read_corpus(ds)
    cfg = cfg or DedupConfig()
    rdir = RunDir(run_dir, config={"cfg": str(cfg)}) if run_dir else None
    metrics: dict = {}
    t_phase = _time.time()

    def _lap(name: str) -> None:
        nonlocal t_phase
        metrics[name] = round(_time.time() - t_phase, 2)
        t_phase = _time.time()

    if ds.count() == 0:
        empty_clusters = rd.from_pandas(
            pd.DataFrame(
                {"cluster_id": pd.Series([], dtype=object),
                 "survivor_id": pd.Series([], dtype=object),
                 "cluster_size": pd.Series([], dtype=np.int64),
                 "members": pd.Series([], dtype=object)}
            )
        )
        empty_edges = rd.from_pandas(
            pd.DataFrame(
                {"id_a": pd.Series([], dtype=object),
                 "id_b": pd.Series([], dtype=object),
                 "stage": pd.Series([], dtype=object),
                 "confidence": pd.Series([], dtype=np.float64),
                 "similarity": pd.Series([], dtype=np.float64)}
            )
        )
        return DedupResult(
            clusters_ds=empty_clusters,
            labels=ClusterLabels(
                members=np.empty(0, dtype=object), canon=np.empty(0, dtype=object)
            ),
            borderline_ds=empty_edges,
            audit_ds=empty_edges,
            metrics={"exact_edges": 0, "candidate_edges": 0, "verified_auto": 0,
                     "borderline": 0, "clusters": 0},
        )

    def checkpoint(name, factory):
        if rdir is None:
            return factory()
        return rdir.materialize(name, factory)

    if (
        rdir is not None
        and corpus_path is not None
        # partition-granular resume re-reads file groups with read_parquet;
        # a .lance corpus's input_files() are Lance fragments, not parquet —
        # fall back to the stage-granular checkpoint for those
        and not corpus_path.endswith(".lance")
    ):
        # per-partition feature checkpoints: one part per input-file group,
        # lineage (the file list) recorded in each part's _DONE
        files = sorted(ds.input_files())
        n_groups = max(1, min(len(files), cfg.feature_checkpoint_parts))
        groups = [
            (f"{i:05d}", files[i::n_groups]) for i in range(n_groups)
        ]
        read_cols = [c for c in FEATURE_INPUT_COLS if c in ds.schema().names]
        features = rdir.materialize_partitioned(
            "features",
            groups,
            lambda fs: compute_features(
                rd.read_parquet(fs, columns=read_cols), cfg
            ),
        )
    else:
        features = checkpoint("features", lambda: compute_features(ds, cfg))
    if extra_features is not None:
        # incremental mode: the pre-signed index features union in AFTER the
        # signature stage — only the new shard paid featurization above
        if "_uid_w" not in extra_features.schema().names:
            # base run persisted by a pre-witness version: derive the
            # identity witness from the id strings it does carry
            from bibexpy_ray.stages.signer import uid_witness as _uw

            def _add_w(t: pa.Table) -> pa.Table:
                ids = t.column("image_id")
                if isinstance(ids, pa.ChunkedArray):
                    ids = ids.combine_chunks()
                return t.append_column("_uid_w", pa.array(_uw(ids), type=pa.uint64()))

            extra_features = extra_features.map_batches(
                _add_w, batch_format="pyarrow"
            )
        features = features.union(extra_features)
    # Pin the feature table (ids + signatures, bytes excluded — bounded at
    # ~1.1 KB/row) in the object store: five downstream consumers read it, and
    # without pinning each one would either re-run the signature stage (no
    # run_dir) or re-decode the fixed-size-list parquet checkpoint (run_dir —
    # measured ~20 s per consumer at 192k rows on 8 CPUs).
    features = features.materialize()
    _lap("s_features")

    # coarse partition count: a 64-partition floor bounds per-task skew (hot
    # buckets concentrate in few partitions when P is small); above 32 CPUs
    # it grows with the cluster (2 per CPU) so reduce tasks keep every core
    # busy. Results are partition-count-free (order-free reduces), so the
    # growth never changes answers across cluster sizes.
    n_coarse = max(64, int(ray.cluster_resources().get("CPU", 4)) * 2)

    # ---- uid collision resolution -------------------------------------------
    # normalize the incremental gate: bare sorted uids, or (uids, witness)
    gate_uids = gate_w = None
    if skip_pairs_within is not None:
        if isinstance(skip_pairs_within, tuple):
            gate_uids, gate_w = skip_pairs_within
            gate_uids = np.asarray(gate_uids, dtype=np.uint64)
            gate_w = np.asarray(gate_w, dtype=np.uint64)
        else:
            gate_uids = np.sort(
                np.asarray(skip_pairs_within, dtype=np.uint64)
            )
    # make `_uid` collision-free (detect + salted-rehash; one 16 B/row
    # co-partition pass in the no-collision common case). Base index rows
    # (incremental) are reserved keepers when the gate carries witnesses.
    from bibexpy_ray.stages.signer import replay_uid_rules, resolve_uid_collisions

    # detection partitions sized by ROW COUNT, not CPU count: the pass moves
    # 16 B/row, so at small corpora the B x P object bookkeeping IS the wall
    # time; the count is free metadata on the materialized pin
    n_uid_parts = max(8, min(n_coarse, int(features.count()) // 250_000 + 1))
    features, uid_rules, n_uid_coll = resolve_uid_collisions(
        features,
        n_uid_parts,
        uid_bits=cfg.uid_bits,
        reserved=(gate_uids, gate_w) if gate_w is not None else None,
    )
    metrics["uid_collisions"] = n_uid_coll
    _lap("s_uid_resolve")

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

        from bibexpy_ray.functions import hashing as _hashing
        from bibexpy_ray.stages.shuffle import hash_partition_apply

        def key(b: pa.Table) -> np.ndarray:
            k = b.column("_caption_hash").to_numpy(zero_copy_only=False).astype(
                np.uint64, copy=False
            )
            return (_hashing.splitmix64(k) % np.uint64(n_coarse)).astype(np.int32)

        # manual hash shuffle instead of the sort-based groupby: the reduce is
        # a pure vectorized segment scan, so the sort machinery's sampling and
        # range coordination was most of the stage's wall time
        return hash_partition_apply(
            features.select_columns(
                ["image_id", "_caption_hash", "phash", "_authority"]
            ),
            n_coarse,
            exact_partition,
            key_fn=key,
        )

    # exact edges STAY a Dataset — at a 10% dup rate a trillion-row corpus
    # carries ~10^11 exact edges, so no O(edges) structure may touch the
    # driver before a cap gate; the count is metadata on the materialization
    exact_edges = checkpoint("exact_edges", exact_stage).materialize()
    n_exact = int(exact_edges.count())
    metrics["exact_edges"] = n_exact
    _lap("s_exact")

    def _loser_uid_batch(t: pa.Table) -> pa.Table:
        # id_b values are globally unique by construction: the exact groups
        # partition rows and each loser appears in exactly one edge.
        # replay_uid_rules keeps these string-derived uids bit-identical to
        # the resolved feature `_uid`s (collision-salted rows included)
        ids = t.column("id_b")
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table(
            {
                "_luid": pa.array(
                    replay_uid_rules(ids, uid_rules, cfg.uid_bits),
                    type=pa.uint64(),
                )
            }
        )

    if n_exact <= LOSER_BROADCAST_LIMIT:
        # collect ONLY the 8-byte loser uids (≤16 MB at the cap), never the
        # string edge table; filter by vectorized searchsorted per batch
        uid_blocks = [
            b.column("_luid").to_numpy(zero_copy_only=False)
            for b in ray.get(
                exact_edges.select_columns(["id_b"])
                .map_batches(_loser_uid_batch, batch_format="pyarrow")
                .to_arrow_refs()
            )
            if b.num_rows and "_luid" in b.schema.names
        ]
        loser_uids = (
            np.sort(np.concatenate(uid_blocks).astype(np.uint64))
            if uid_blocks
            else np.empty(0, np.uint64)
        )
        loser_ref = ray.put(loser_uids)

        def drop_losers(batch: pa.Table) -> pa.Table:
            # pure-Arrow-adjacent filter: keeps the _minhash fixed_size_list
            # intact; PREBUILT sorted array (building per batch would dominate)
            lose = ray.get(loser_ref)
            if lose.size == 0:
                return batch
            uids = batch.column("_uid").to_numpy(zero_copy_only=False).astype(np.uint64)
            pos = np.searchsorted(lose, uids)
            pos[pos == lose.size] = 0
            mask = lose[pos] != uids
            return batch.filter(pa.array(mask))

        reps_lazy = features.map_batches(drop_losers, batch_format="pyarrow")
    else:
        # scale path: anti-join by uid hash partition. Acero joins reject the
        # fixed_size_list _minhash payload column, so this is a manual
        # ARROW-native hash shuffle (stages/shuffle.py arrow mode): feature
        # rows and loser-mark rows co-partition on uid; each reduce drops
        # marked uids with one vectorized searchsorted — no pandas hop, so
        # every signature column survives with its Arrow type intact.
        from bibexpy_ray.functions import hashing as _hashing
        from bibexpy_ray.stages.shuffle import hash_partition_apply as _hpa

        marks = exact_edges.select_columns(["id_b"]).map_batches(
            lambda t: _loser_uid_batch(t)
            .rename_columns(["_uid"])
            .append_column("_isloser", pa.array(np.ones(t.num_rows, dtype=bool))),
            batch_format="pyarrow",
        )
        n_anti = max(n_coarse, int(features.count()) // 500_000)

        def uid_key(t: pa.Table) -> np.ndarray:
            u = t.column("_uid").to_numpy(zero_copy_only=False).astype(np.uint64)
            return (_hashing.splitmix64(u) % np.uint64(n_anti)).astype(np.int32)

        def anti(part: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            if part.num_rows == 0 or "_isloser" not in part.schema.names:
                return part
            isl = (
                pc.fill_null(part.column("_isloser"), False)
                .to_numpy(zero_copy_only=False)
                .astype(bool)
            )
            feat = part.filter(pa.array(~isl)).drop_columns(["_isloser"])
            lose = np.unique(
                part.filter(pa.array(isl))
                .column("_uid")
                .to_numpy(zero_copy_only=False)
                .astype(np.uint64)
            )
            if lose.size == 0 or feat.num_rows == 0:
                return feat
            uids = feat.column("_uid").to_numpy(zero_copy_only=False).astype(np.uint64)
            pos = np.searchsorted(lose, uids)
            pos[pos == lose.size] = 0
            return feat.filter(pa.array(lose[pos] != uids))

        reps_lazy = _hpa(
            features.union(marks), n_anti, anti, key_fn=uid_key, arrow=True
        )

    # pin reps too: four consumers (LSH bucket emit, containment, verify
    # feature join, schema fetch) would each re-run the filter as a separate
    # Ray job — ~0.5 s of fixed execution cost per consumer regardless of CPU
    # count (a pure serial term in the scaling ratio). Same bounded-size
    # argument as the features pin (bytes never enter this table).
    # Column-pruned: the rep consumers read only the candidate columns
    # (everything else — caption, w/h/fmt, _caption_hash, _simhash — already
    # lives in the features pin), so the second pin skips them; _minhash
    # (1 KB/row, the single largest column) rides only until the candidate
    # stage completes and is then dropped (see the re-slim below).
    reps = reps_lazy.select_columns(CANDIDATE_COLS).materialize()

    # incremental mode: the sorted base-uid gate broadcasts ONCE and is
    # consumed at two levels — (1) inside the pair emitters, where a bucket
    # whose every member is in-gate is dropped BEFORE pair emission (its
    # pairs are all base-base and would be discarded by (2) anyway; at a
    # large standing index these all-index buckets are the dominant share
    # of candidate work), and (2) as the per-pair filter before the dedupe
    # shuffle (mixed buckets still emit base-base pairs). Level (1) is a
    # pure subset-drop of level (2)'s discards, so the surviving pair set —
    # and every downstream result — is bit-identical with or without it.
    gate_ref = None
    if gate_uids is not None and len(gate_uids):
        gate_ref = ray.put(gate_uids)

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
            if gate_ref is not None and len(df):
                from bibexpy_ray.functions.hashing import in_sorted_u64

                g = ray.get(gate_ref)
                ing = in_sorted_u64(g, df["uid"].to_numpy(dtype=np.uint64))
                if ing.all():
                    return _EMPTY_PAIRS.copy()
                if ing.any():
                    keys = df["bucket_key"].to_numpy(dtype=np.uint64)
                    live = np.unique(keys[~ing])  # buckets with >=1 new row
                    df = df[np.isin(keys, live)]
            return emitter(df)

        def run_lsh():
            # each branch ends in its own materialize barrier: fusing the
            # bucket groupby + containment groupby + pair dedupe into ONE
            # streaming DAG thrashes badly at low CPU counts (measured 5x
            # slower at 8 CPUs); pairs are ids-only — cheap to pin
            from bibexpy_ray.functions import hashing as _hashing
            from bibexpy_ray.stages.shuffle import hash_partition_apply

            def bucket_part(b: pa.Table) -> np.ndarray:
                k = b.column("bucket_key").to_numpy(zero_copy_only=False).astype(
                    np.uint64, copy=False
                )
                return (_hashing.splitmix64(k) % np.uint64(n_coarse)).astype(
                    np.int32
                )

            t0 = _time.time()
            # manual hash shuffle (not sort-groupby): whole buckets colocate
            # by bucket_key hash exactly as before, without the sort's
            # sample/range-partition coordination
            out = hash_partition_apply(
                bucket_rows, n_coarse, emit_pairs, key_fn=bucket_part
            ).materialize()
            metrics["s_cand_lsh"] = round(_time.time() - t0, 2)
            return out

        def run_containment():
            # suffix-sort containment pass (Stage-4 feeder for contained
            # captions whose Jaccard/prefix signals are too weak — the
            # partial-metadata-match analog, smart_merger.py:309-334)
            from bibexpy_ray.stages.substring import containment_candidates

            def to_uid_pairs(df: pd.DataFrame) -> pd.DataFrame:
                # containment works on id strings; the pair stream is numeric
                # (replayed through the collision rules so salted rows join)
                a = replay_uid_rules(df["id_a"].tolist(), uid_rules, cfg.uid_bits)
                b = replay_uid_rules(df["id_b"].tolist(), uid_rules, cfg.uid_bits)
                return pd.DataFrame(
                    {
                        "id_a": np.minimum(a, b),
                        "id_b": np.maximum(a, b),
                        "dropped": df["dropped"].to_numpy(dtype=np.int64)
                        if "dropped" in df.columns
                        else np.zeros(len(df), dtype=np.int64),
                    }
                )

            t0 = _time.time()
            out = (
                containment_candidates(
                    reps.select_columns(["image_id", "_norm_caption"]),
                    cfg,
                    n_coarse,
                    gate_ref=gate_ref,
                )
                .map_batches(to_uid_pairs, batch_format="pandas")
                .materialize()
            )
            metrics["s_cand_contain"] = round(_time.time() - t0, 2)
            return out

        # the LSH-bucket and containment branches share only the pinned
        # feature table. Run them SEQUENTIALLY: overlapping them from two
        # driver threads spawns two independent streaming executors that each
        # assume they own the cluster — measured 44 s vs 24 s at 32 CPUs and
        # 84 s vs 67 s at 2 CPUs on the 192k corpus (the executors
        # oversubscribe memory bandwidth; tools/membw_probe.py quantifies the
        # box's DRAM ceiling). Overlap stays available as an opt-in for
        # clusters with real per-node bandwidth headroom.
        import os as _os

        if cfg.substring_pass and _os.environ.get("BIBEXPY_OVERLAP_BRANCHES"):
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=2) as pool:
                f_lsh = pool.submit(run_lsh)
                f_contained = pool.submit(run_containment)
                pairs = f_lsh.result().union(f_contained.result())
        elif cfg.substring_pass:
            pairs = run_lsh().union(run_containment())
        else:
            pairs = run_lsh()
        _lap("s_cand_emit")
        if gate_ref is not None:
            # incremental mode: pairs WITHIN the base index were adjudicated
            # by the base run (they stayed separate clusters) — drop them
            # BEFORE the dedupe shuffle so they never move again. The gate is
            # one sorted uint64 array in the object store (8 B per base
            # canonical row), read zero-copy per task. Gating on the bare
            # u64 uid is EXACT here: resolve_uid_collisions salts any new
            # row whose uid collides with a base uid (the gate's witnesses
            # make base rows reserved keepers), so a gate hit implies true
            # base membership up to the 128-bit double-hash residual.
            def drop_base_pairs(df: pd.DataFrame) -> pd.DataFrame:
                from bibexpy_ray.functions.hashing import in_sorted_u64

                g = ray.get(gate_ref)
                a = df["id_a"].to_numpy(dtype=np.uint64)
                b = df["id_b"].to_numpy(dtype=np.uint64)
                return df[~(in_sorted_u64(g, a) & in_sorted_u64(g, b))]

            pairs = pairs.map_batches(drop_base_pairs, batch_format="pandas")
        # a pair appears in many buckets: dedupe on (id_a, id_b) — manual
        # hash shuffle (the reduce is pure vectorized; the sort-groupby's
        # coordination would dominate it 4x, stages/shuffle.py)
        return dedupe_pairs_manual(pairs, n_coarse)

    # candidate edges feed both the verifier and the metrics count — pin them
    # so the shuffle-heavy candidate stage executes exactly once
    edges_raw = checkpoint("edges_raw", candidates_stage).materialize()
    # the count is block metadata on the materialized set — record it NOW so
    # the edges_raw pin can be released as soon as verify consumes it
    metrics["candidate_edges"] = int(edges_raw.count())
    _lap("s_candidates")

    # ---- verification -------------------------------------------------------
    # edges carry numeric uids; verification joins features back BY UID and
    # emits string image_ids (the external audit/cluster surface)
    feat_cols = ["_uid", "image_id", "_norm_caption", "phash", "_authority"]
    if int(features.count()) - n_exact > REPS_SLIM_LIMIT:
        # candidate generation is done with the signature columns; re-pin
        # reps as the 5 verify columns and let the _minhash copy free before
        # the verify shuffle allocates (peak object-store moment at scale)
        reps = reps.select_columns(feat_cols).materialize()

    def verify_stage():
        # rep count derived arithmetically — a reps.count() here would execute
        # the filter chain once just to pick a code path (each exact edge
        # removes exactly one loser, so reps = rows - exact edges)
        n_reps = features.count() - n_exact
        edge_cols = edges_raw.select_columns(["id_a", "id_b"])
        if n_reps <= BROADCAST_LIMIT:
            # broadcast lookup as a uid-SORTED ARROW table: Arrow objects in
            # the object store are zero-copy-mapped per node (an object-dtype
            # numpy broadcast would re-deserialize every python string in
            # every task); probes are vectorized searchsorted over the uid
            # column, and only probed rows ever materialize to python
            # zero-row reduce blocks pass select_columns un-projected (the
            # UDF never runs), so drop empties and normalize column order
            # before concatenating
            feat_blocks = [
                b.select(feat_cols)
                for b in ray.get(reps.select_columns(feat_cols).to_arrow_refs())
                if b.num_rows
            ]
            feat_tbl = (
                pa.concat_tables(feat_blocks)
                if feat_blocks
                else pa.table(
                    {
                        "_uid": pa.array([], pa.uint64()),
                        "image_id": pa.array([], pa.string()),
                        "_norm_caption": pa.array([], pa.large_string()),
                        "phash": pa.array([], pa.int64()),
                        "_authority": pa.array([], pa.string()),
                    }
                )
            ).combine_chunks()
            uids = feat_tbl.column("_uid").to_numpy(zero_copy_only=False).astype(np.uint64)
            order = np.argsort(uids)
            feat_tbl = feat_tbl.take(pa.array(order)).combine_chunks()
            feat_ref = ray.put(feat_tbl)
            _lap("s_verify_bcast_build")

            def join_verify(batch: pd.DataFrame) -> pd.DataFrame:
                tbl = ray.get(feat_ref)
                suids = tbl.column("_uid").to_numpy(zero_copy_only=False)
                a = batch["id_a"].to_numpy(dtype=np.uint64)
                b = batch["id_b"].to_numpy(dtype=np.uint64)
                pa_idx = np.minimum(np.searchsorted(suids, a), len(suids) - 1)
                pb_idx = np.minimum(np.searchsorted(suids, b), len(suids) - 1)
                # exact-match guard: a probe uid absent from the feature table
                # (resume drift / refactor) must drop, not silently join the
                # wrong row's features into verification
                ok = (suids[pa_idx] == a) & (suids[pb_idx] == b)
                if not ok.all():
                    pa_idx, pb_idx = pa_idx[ok], pb_idx[ok]
                ta = tbl.take(pa.array(pa_idx))
                tb = tbl.take(pa.array(pb_idx))
                joined = pd.DataFrame(
                    {
                        "id_a": ta.column("image_id").to_numpy(zero_copy_only=False),
                        "id_b": tb.column("image_id").to_numpy(zero_copy_only=False),
                        "_norm_caption_a": ta.column("_norm_caption").to_numpy(zero_copy_only=False),
                        "_norm_caption_b": tb.column("_norm_caption").to_numpy(zero_copy_only=False),
                        "phash_a": ta.column("phash").to_numpy(zero_copy_only=False),
                        "phash_b": tb.column("phash").to_numpy(zero_copy_only=False),
                        "_authority_a": ta.column("_authority").to_numpy(zero_copy_only=False),
                        "_authority_b": tb.column("_authority").to_numpy(zero_copy_only=False),
                    }
                )
                return EdgeVerifier(cfg)(joined)

            return edge_cols.map_batches(join_verify, batch_format="pandas")
        # scale path: fused two-hop co-partition join + verify-in-reduce
        # (stages/shuffle.attach_pair_both). Dataset.join reserves an
        # aggregator ACTOR pool sized by num_partitions (cannot schedule on
        # small clusters, deadlocks the plan; see stages/unionfind.py) and
        # its pandas hop would corrupt uint64 uids / 64-bit phash via
        # null→float64 promotion. The previous shape (two chained attach
        # shuffles, then a verifier task pool) stored the half- and
        # fully-joined pair tables — O(pairs x caption) each, the measured
        # 4M-row spill driver (BASELINE.md round 4). Here hop A re-partitions
        # by id_b inside the same task and hop B runs the verifier inline, so
        # only the (tiny) verified table is ever stored; intermediate slices
        # ride zstd-compressed.
        from bibexpy_ray.stages.shuffle import attach_pair_both

        # hop-A partition count scales with features (~250k rows per reduce);
        # hop-B with the candidate-pair count so each verify reduce holds a
        # bounded pair slice and the verify work spreads wider than P1
        cpus_now = int(ray.cluster_resources().get("CPU", 4))
        n_parts = max(8, cpus_now * 2, n_reps // 250_000)
        n_parts_b = max(n_parts, int(metrics["candidate_edges"]) // 750_000)
        verifier = EdgeVerifier(cfg)
        payload = {c: c for c in feat_cols if c != "_uid"}
        verified_schema = pa.schema(
            [
                ("id_a", pa.string()),
                ("id_b", pa.string()),
                ("stage", pa.string()),
                ("confidence", pa.float64()),
                ("similarity", pa.float64()),
                ("phash_hamming", pa.int32()),
            ]
        )

        def verify_reduce(joined: pa.Table) -> pa.Table:
            def col(name):
                return joined.column(name).to_numpy(zero_copy_only=False)

            df = pd.DataFrame(
                {
                    # uid join keys served their purpose; expose string ids
                    "id_a": col("image_id_a"),
                    "id_b": col("image_id_b"),
                    "_norm_caption_a": col("_norm_caption_a"),
                    "_norm_caption_b": col("_norm_caption_b"),
                    "phash_a": col("phash_a"),
                    "phash_b": col("phash_b"),
                    "_authority_a": col("_authority_a"),
                    "_authority_b": col("_authority_b"),
                }
            )
            return pa.Table.from_pandas(
                verifier(df), preserve_index=False, schema=verified_schema
            )

        return attach_pair_both(
            edge_cols,
            reps.select_columns(feat_cols),
            "_uid",
            payload,
            verify_reduce,
            empty_like=verified_schema.empty_table(),
            num_partitions=n_parts,
            num_partitions_b=n_parts_b,
        )

    # verified stays a DATASET: pinned in the object store, consumed by the
    # borderline/auto filters below — never collected whole to the driver
    verified = checkpoint("verified", verify_stage).materialize()
    _lap("s_verify_exec")
    import pyarrow.compute as pc

    def _filter_borderline(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t.column("stage"), "5_borderline"))

    def _filter_auto(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.not_equal(t.column("stage"), "5_borderline"),
            pc.greater_equal(t.column("confidence"), 0.9),
        )
        return t.filter(mask).select(["id_a", "id_b"])

    borderline_ds = verified.map_batches(_filter_borderline, batch_format="pyarrow")
    # materialized ids-only (~16 B + id chars per edge, object-store-resident):
    # the gate count below AND the CC consumer (driver collect or distributed
    # propagation) read these blocks — unmaterialized, each would re-run the
    # filter job over the full verified table
    auto_edges_ds = verified.map_batches(
        _filter_auto, batch_format="pyarrow"
    ).materialize()
    # release the candidate-edge pin: verify has consumed it (the count was
    # recorded at materialization). Clearing BOTH references (the name and
    # the consuming closure) lets the object store free/unspill the blocks
    # before CC + survivor allocate.
    edges_raw = None
    verify_stage = None
    _lap("s_verify_split")

    # ---- connected components ----------------------------------------------
    # cap gate counts the AUTO edges — the set CC actually consumes. Gating
    # on n_verified instead looked free but a 2M-row scaling run measured
    # borderline at 4x the auto count, tripping the distributed path (150 s
    # at 8 CPUs) for a 1.36M-edge job the driver Arrow CC clears in seconds.
    # (Every non-borderline stage carries confidence >= 0.9: 1-4 =
    # 1.0/.99/.95/.90.)
    n_verified = int(verified.count())
    n_auto_edges = int(auto_edges_ds.count())
    metrics["verified_auto"] = n_auto_edges
    metrics["borderline"] = n_verified - n_auto_edges
    if n_auto_edges + n_exact > DRIVER_EDGE_LIMIT:  # pragma: no cover - scale path
        # distributed min-label propagation straight over the edge DATASET
        # (union with the exact pre-collapse edge DATASET — the exact edges
        # never transit the driver on this path); equivalence with the
        # driver union-find is proven in tests/test_unionfind.py
        from bibexpy_ray.stages.unionfind import clusters_distributed

        edges_ds = auto_edges_ds
        if n_exact:
            edges_ds = edges_ds.union(exact_edges.select_columns(["id_a", "id_b"]))
        labels_ds = clusters_distributed(edges_ds).materialize()
        labels = ClusterLabels(labels_ds=labels_ds)
        # cluster count is read off the survivor table below (one row per
        # cluster, already materialized) — a groupby here purely for the
        # metric would cost an extra full shuffle
    else:
        # ids-only collect (bounded by the dup rate, ~16 B + id chars per
        # edge), then vectorized driver connected components — the
        # measured-fastest path at bench scale; above the cap nothing
        # transits the driver
        from bibexpy_ray.stages.unionfind import clusters_driver_arrow, contract_blocks

        # per-block pre-contraction BEFORE the collect: each block's edges
        # collapse to a local star forest in parallel tasks (connectivity-
        # preserving), shrinking both the collected bytes and the driver
        # CC's single-threaded input — dense clusters whose edges co-reside
        # in a block contract to size-1-per-member stars.
        # arrow-refs collect: the contracted blocks come back as Arrow (no
        # pandas conversion job) and only the two id columns materialize.
        # Zero-row pandas blocks can pass the filter UDF through unchanged,
        # so coerce any stray DataFrame block before concatenating.
        blocks = [
            b if isinstance(b, pa.Table) else pa.Table.from_pandas(b)
            for b in ray.get(contract_blocks(auto_edges_ds).to_arrow_refs())
        ]
        auto_tbl = pa.concat_tables(blocks, promote_options="default")
        if "id_a" not in auto_tbl.schema.names:
            # every block was a schema-less zero-row passthrough
            auto_tbl = pa.table(
                {"id_a": pa.array([], pa.string()), "id_b": pa.array([], pa.string())}
            )
        else:
            auto_tbl = auto_tbl.select(["id_a", "id_b"])
        _lap("s_uf_collect")
        if n_exact:
            # ids-only arrow-refs collect of the exact edges — reached only
            # under the DRIVER_EDGE_LIMIT gate, so bounded like the auto set
            exact_blocks = [
                b if isinstance(b, pa.Table) else pa.Table.from_pandas(b)
                for b in ray.get(
                    exact_edges.select_columns(["id_a", "id_b"]).to_arrow_refs()
                )
            ]
            auto_tbl = pa.concat_tables(
                [auto_tbl, *[b.select(["id_a", "id_b"]) for b in exact_blocks if b.num_rows]],
                promote_options="default",
            )
        # Arrow-native CC: endpoints stay dictionary codes; only the V unique
        # member strings become Python objects (vs 2E with the numpy path)
        members, lab_codes, n_clusters = clusters_driver_arrow(
            auto_tbl.column("id_a"), auto_tbl.column("id_b")
        )
        _lap("s_uf_cc")
        labels = ClusterLabels(members=members, canon_codes=lab_codes)
        _lap("s_uf_labels")
        metrics["clusters"] = n_clusters
    _lap("s_unionfind")

    # ---- survivor selection -------------------------------------------------
    from bibexpy_ray.functions.hashing import text_hash_u64
    from bibexpy_ray.stages.survivor import survivors_partition

    def cluster_key(b: pa.Table) -> np.ndarray:
        h = text_hash_u64(b.column("cluster_id"))
        return (h % np.uint64(n_coarse)).astype(np.int32)

    # coarse hash partition on cluster_id: whole clusters colocate, the
    # per-partition reduce is vectorized over many clusters at once (manual
    # hash shuffle — same colocation as a sort-groupby without its sampling
    # and range coordination)
    from bibexpy_ray.stages.shuffle import hash_partition_apply

    members_ds = labels.attach(
        features.select_columns(["image_id", "fmt", "caption"]),
        members_only=True,
    )
    clusters_ds = hash_partition_apply(
        members_ds,
        n_coarse,
        lambda df: survivors_partition(
            df[["cluster_id", "image_id", "fmt", "caption"]], rank_fn=survivor_rank_fn
        ),
        key_fn=cluster_key,
        compress=True,  # members carry captions — text compresses ~3x
    ).materialize()

    _lap("s_survivor")
    if "clusters" not in metrics:
        # distributed-CC path: one survivor row per cluster, and clusters_ds
        # is already materialized — count is metadata, no extra shuffle
        metrics["clusters"] = int(clusters_ds.count())
    if rdir is not None:
        rdir.mark_done("result", metrics)

    return DedupResult(
        clusters_ds=clusters_ds,
        labels=labels,
        borderline_ds=borderline_ds,
        audit_ds=verified,
        metrics=metrics,
        features_ds=features,
    )


def read_corpus(path: str) -> rd.Dataset:
    """Read an image+caption table (parquet dir/file; ``.lance`` tables via
    ``ray.data.read_lance`` when the lance package is importable).

    DOCUMENTED DECISION (round 5): the target input format is Lance
    (BASELINE.json input_hint), but the lance wheel is not installable in
    this sandbox (no pip, no network), so parquet stands in permanently for
    tests and benchmarks here. The stand-in is behaviorally equivalent for
    everything this pipeline exercises: both readers yield zero-copy Arrow
    blocks with identical schemas, both prune to the requested columns at
    the storage layer, and nothing downstream of the read depends on the
    format (the signature stage consumes Arrow batches either way). The
    ``.lance`` dispatch below is live code — on a cluster with lance
    installed, ``read_corpus("s3://…/corpus.lance")`` goes straight through
    ``read_lance`` (dispatch pinned by tests/test_dedup_pipeline.py) — and
    the one format-coupled behavior difference (Lance fragments are not
    parquet file groups) is handled where partition-granular resume chooses
    stage-granular checkpoints for ``.lance`` inputs (see dedup_images).
    """
    if path.endswith(".lance"):
        try:
            return rd.read_lance(path)  # lance not installed in this sandbox
        except (ImportError, AttributeError) as e:  # pragma: no cover
            raise NotImplementedError("Lance reader requires the lance package") from e
    return rd.read_parquet(path)
