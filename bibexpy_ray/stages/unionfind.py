"""Connected components over verified duplicate edges -> cluster ids.

The reference's transitive clustering is an in-memory single-link pass
(_greedy_cluster, /root/reference/apps/api/services/disambiguation/blocking.py:116-140);
at scale the analog is connected components over the verified edge set.

Two implementations:

- ``clusters_driver``: classic union-find on the driver. Verified edges are a
  tiny fraction of rows (post-LSH, post-verification), so at the dup rates this
  engine targets the edge list fits the driver comfortably; this is the default
  below ``DRIVER_EDGE_LIMIT`` edges.
- ``clusters_distributed``: hash-partitioned iterative min-label propagation
  (pointer jumping) expressed as Ray Dataset ops — O(log n) rounds of
  groupby-min; the scale path when the edge set itself is too large to collect.
  (BTS, ICDE 2024 is the load-balanced blueprint — see PAPERS.md.)

Canonical cluster id = lexicographic min member id — order-free and
deterministic regardless of Ray block ordering (SURVEY.md §7.5).
"""

from __future__ import annotations

from typing import Iterable

DRIVER_EDGE_LIMIT = 5_000_000


def clusters_driver(edges: Iterable[tuple[str, str]]) -> dict[str, str]:
    """Union-find -> {member_id: canonical_min_id} for every id seen in edges."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by lexicographic min keeps the canonical choice order-free
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
            parent.setdefault(lo, lo)
    return {x: find(x) for x in list(parent)}


def clusters_driver_arrays(id_a, id_b):
    """Vectorized driver connected components over string edge arrays.

    Same result as ``clusters_driver`` (canonical = lexicographic min member)
    but numpy throughout: integer-encode endpoints (np.unique), iterate
    min-label scatter (np.minimum.at) + pointer jumping until fixpoint —
    O((E+V) · log diameter) C-speed ops instead of a per-edge Python loop.
    Returns (members: object ndarray, canon: object ndarray).
    """
    import numpy as np
    import pandas as pd

    id_a = np.asarray(id_a, dtype=object)
    id_b = np.asarray(id_b, dtype=object)
    # self-edges carry no information; the dict union-find drops endpoints
    # seen only in self-edges, so the array form must too
    keep = id_a != id_b
    id_a, id_b = id_a[keep], id_b[keep]
    if len(id_a) == 0:
        return np.empty(0, dtype=object), np.empty(0, dtype=object)
    # hash-based factorize + sort of the uniques ≡ np.unique(return_inverse)
    # but 3x faster on object strings (no O(n log n) python-level compares)
    codes, uniques = pd.factorize(np.concatenate([id_a, id_b]))
    order = np.argsort(uniques)
    rank = np.empty_like(order)
    rank[order] = np.arange(len(order))
    ids, inv = uniques[order], rank[codes]
    ai, bi = inv[: len(id_a)], inv[len(id_a):]
    # np.unique sorts, so integer order == lexicographic order: the min LABEL
    # is the min member string, exactly the union-by-min rule
    lab = np.arange(len(ids), dtype=np.int64)
    while True:
        m = np.minimum(lab[ai], lab[bi])
        before = lab.copy()
        np.minimum.at(lab, ai, m)
        np.minimum.at(lab, bi, m)
        # pointer jumping: chase labels to their current roots
        for _ in range(3):
            nxt = lab[lab]
            if (nxt == lab).all():
                break
            lab = nxt
        if (lab == before).all():
            break
    return ids, ids[lab]


def clusters_driver_ints(id_a, id_b):
    """Vectorized driver connected components over int64 edge arrays.

    Integer sibling of ``clusters_driver_arrays``: canonical = MIN member id
    (np.unique sorts ascending, so the min integer label is the min id).
    Returns ``(members: sorted int64 ndarray, canon: int64 ndarray)`` — ids
    seen only in self-edges drop, matching the dict union-find.
    """
    import numpy as np

    a = np.asarray(id_a, dtype=np.int64)
    b = np.asarray(id_b, dtype=np.int64)
    keep = a != b
    a, b = a[keep], b[keep]
    if len(a) == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    ids = np.unique(np.concatenate([a, b]))
    ai = np.searchsorted(ids, a)
    bi = np.searchsorted(ids, b)
    lab = np.arange(len(ids), dtype=np.int64)
    while True:
        m = np.minimum(lab[ai], lab[bi])
        before = lab.copy()
        np.minimum.at(lab, ai, m)
        np.minimum.at(lab, bi, m)
        for _ in range(3):
            nxt = lab[lab]
            if (nxt == lab).all():
                break
            lab = nxt
        if (lab == before).all():
            break
    return ids, ids[lab]


def clusters_driver_arrow(col_a, col_b):
    """``clusters_driver_arrays`` taking Arrow string columns directly.

    Avoids materializing 2E Python strings for the edge endpoints: the
    combined endpoint column is ``dictionary_encode``d (C-speed hash), the
    self-edge filter and connected components run on int32 codes, and NO
    Python string objects are created at all — the result stays Arrow.
    Returns ``(members: pa.StringArray, lab: np.int64 codes, n_clusters)``
    where member ``i``'s canonical id is ``members[lab[i]]`` (members are
    string-sorted, so the min label == min member string). Equivalent to
    ``clusters_driver_arrays`` on the same edges (tests/test_unionfind.py).
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    def _empty():
        return pa.array([], type=pa.string()), np.empty(0, dtype=np.int64), 0

    def _as_array(c):
        if isinstance(c, pa.ChunkedArray):
            return c.combine_chunks()
        return c

    col_a, col_b = _as_array(col_a), _as_array(col_b)
    n = len(col_a)
    if n == 0:
        return _empty()
    combined = pa.chunked_array([col_a, col_b]).combine_chunks()
    enc = combined.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    dic = enc.dictionary
    ca, cb = codes[:n], codes[n:]
    # self-edges carry no information; endpoints seen only in self-edges drop
    keep = ca != cb
    ca, cb = ca[keep], cb[keep]
    if len(ca) == 0:
        return _empty()
    # compact to the used endpoint set, ranked by STRING sort order so the
    # min integer label == min member string (the union-by-min rule)
    used = np.unique(np.concatenate([ca, cb]))
    sub = dic.take(pa.array(used))
    order = pc.sort_indices(sub).to_numpy(zero_copy_only=False).astype(np.int64)
    rank = np.empty(len(used), dtype=np.int64)
    rank[order] = np.arange(len(used))
    ai = rank[np.searchsorted(used, ca)]
    bi = rank[np.searchsorted(used, cb)]
    ids = sub.take(pa.array(order))
    lab = np.arange(len(ids), dtype=np.int64)
    while True:
        m = np.minimum(lab[ai], lab[bi])
        before = lab.copy()
        np.minimum.at(lab, ai, m)
        np.minimum.at(lab, bi, m)
        for _ in range(3):
            nxt = lab[lab]
            if (nxt == lab).all():
                break
            lab = nxt
        if (lab == before).all():
            break
    return ids, lab, int(len(np.unique(lab)))


def clusters_distributed(edges_ds, max_rounds: int = 20):
    """Min-label propagation over an edges Dataset (id_a, id_b) -> Dataset
    (image_id, cluster_id).

    Each round: every endpoint adopts the min label over its neighborhood
    (including itself), then pointer-jumps (adopts its label's label) —
    O(log(max component diameter)) rounds for the near-star components dedup
    produces; converges when no label changes.

    All shuffles are ``hash_partition_apply`` co-partition passes (mark the
    build side, union, partition on the probe key, vectorized pandas merge
    per partition). ``Dataset.join`` is deliberately NOT used: Ray's
    hash-shuffle join reserves an aggregator ACTOR pool sized by
    ``num_partitions`` (e.g. 64 aggregators × 0.25 CPU per join, and two
    joins per plan here) — on a small cluster the pool cannot schedule and
    the plan deadlocks, and at any scale the raw-task shuffle has no actor
    floor to warm up. Ids may be strings or int64; int64 survives the
    promotion to pandas only below 2^53 (≈9e15 — far above any realistic
    row count; the flagship uses string ids which are exact at any scale).
    """
    import numpy as np
    import pandas as pd

    from bibexpy_ray.functions import hashing
    from bibexpy_ray.stages.shuffle import hash_partition_apply

    import ray as _ray

    edges = edges_ds.map_batches(
        lambda df: pd.DataFrame({"id_a": df["id_a"], "id_b": df["id_b"]}),
        batch_format="pandas",
    ).materialize()
    cpus = int(_ray.cluster_resources().get("CPU", 4))
    n_parts = max(2, min(max(2, edges.num_blocks()), cpus * 4))

    # int64 ids null-promote to float64 on the pandas hop inside each
    # reduce; every reduce output is cast back so the NEXT Arrow concat
    # sees one consistent type (exact below 2^53 — see docstring)
    import pyarrow as _pa

    _sch = edges.schema().base_schema
    if isinstance(_sch, _pa.Schema):
        id_is_int = _pa.types.is_integer(_sch.field("id_a").type)
    else:  # PandasBlockSchema (pandas-block upstream)
        id_is_int = np.issubdtype(
            _sch.types[list(_sch.names).index("id_a")], np.integer
        )

    def _cast_ids(df: pd.DataFrame) -> pd.DataFrame:
        if id_is_int:
            for c in df.columns:
                df[c] = df[c].astype(np.int64)
        return df

    def _key_on(col):
        def key(t):
            c = t.column(col)
            import pyarrow as pa
            import pyarrow.compute as pc

            if pa.types.is_integer(c.type):
                v = c.to_numpy(zero_copy_only=False).astype(np.uint64)
                h = hashing.splitmix64(v)
            else:
                h = hashing.text_hash_u64(
                    c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
                )
            return (h % np.uint64(n_parts)).astype(np.int32)

        return key

    # labels start as identity over every endpoint id, deduped per partition
    def init_labels(df: pd.DataFrame) -> pd.DataFrame:
        ids = pd.unique(pd.concat([df["id_a"], df["id_b"]], ignore_index=True))
        return pd.DataFrame({"image_id": ids, "cluster_id": ids})

    def dedupe_min(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby("image_id", as_index=False)["cluster_id"].min()
        return _cast_ids(
            pd.DataFrame({"image_id": g["image_id"], "cluster_id": g["cluster_id"]})
        )

    # zero-row exemplars: empty partitions must still emit each stage's
    # OUTPUT schema (hash_partition_apply's empty_like contract)
    _idt = np.int64 if id_is_int else object

    def _mt(*cols: str) -> pd.DataFrame:
        return pd.DataFrame({c: pd.Series([], dtype=_idt) for c in cols})

    # per-partition pre-contraction: local connected components inside each
    # hash partition replace its edge subset by a star forest (canonical ->
    # member, <= V_part edges vs E_part) — connectivity-preserving, and it
    # star-shapes every locally-visible component so the global min-label
    # rounds start closer to the fixpoint with less data per round. Ids seen
    # only in self-edges keep a self-edge so they still surface as singleton
    # labels (the un-contracted path labels them too).
    def contract(part: pd.DataFrame) -> pd.DataFrame:
        a = part["id_a"].to_numpy()
        b = part["id_b"].to_numpy()
        if id_is_int:
            mem, canon = clusters_driver_ints(a, b)
        else:
            mem, canon = clusters_driver_arrays(a, b)
        all_ids = pd.unique(np.concatenate([a, b]))
        # self-edge-only endpoints (hash-based isin: object-dtype setdiff1d
        # would sort with Python-level compares)
        lone = all_ids[~pd.Series(all_ids).isin(mem).to_numpy()]
        keep = mem != canon
        return _cast_ids(
            pd.DataFrame(
                {
                    "id_a": np.concatenate([canon[keep], lone]),
                    "id_b": np.concatenate([mem[keep], lone]),
                }
            )
        )

    edges = hash_partition_apply(
        edges, n_parts, contract, key_fn=_key_on("id_a"),
        empty_like=_mt("id_a", "id_b"),
    ).materialize()

    labels = hash_partition_apply(
        edges.map_batches(init_labels, batch_format="pandas"),
        n_parts,
        dedupe_min,
        key_fn=_key_on("image_id"),
        empty_like=_mt("image_id", "cluster_id"),
    ).materialize()

    def attach_lab(part: pd.DataFrame, key: str, out_col: str) -> pd.DataFrame:
        # build side = label rows (identified by the _lab marker column);
        # probe side = edge rows. Every endpoint is labeled by construction,
        # so the left merge is total.
        if "_lab" not in part.columns:
            return part.iloc[0:0]
        is_lab = part["_lab"].notna()
        build = pd.DataFrame(
            {key: part.loc[is_lab, key], out_col: part.loc[is_lab, "_lab"]}
        )
        probe = part.loc[~is_lab].drop(columns=["_lab"])
        if len(probe) == 0 or len(build) == 0:
            return _cast_ids(
                probe.assign(**{out_col: pd.Series([], dtype=object)}).iloc[0:0]
            )
        return _cast_ids(probe.merge(build, on=key, how="left"))

    def marked_labels(lab_ds, key: str):
        # label rows carry BOTH id columns (key = the probe key, the other
        # mirrors it) so no shared id column is ever null — int64 types
        # survive the Arrow concat in the next shuffle intact
        other = "id_b" if key == "id_a" else "id_a"
        return lab_ds.map_batches(
            lambda df, k=key, o=other: pd.DataFrame(
                {k: df["image_id"], o: df["image_id"], "_lab": df["cluster_id"]}
            ),
            batch_format="pandas",
        )

    for _ in range(max_rounds):
        # edge endpoints pick up their current labels (two co-partition passes)
        with_a = hash_partition_apply(
            edges.union(marked_labels(labels, "id_a")),
            n_parts,
            lambda p: attach_lab(p, "id_a", "lab_a"),
            key_fn=_key_on("id_a"),
            empty_like=_mt("id_a", "id_b", "lab_a"),
        )
        with_ab = hash_partition_apply(
            with_a.union(marked_labels(labels, "id_b")),
            n_parts,
            lambda p: attach_lab(p, "id_b", "lab_b"),
            key_fn=_key_on("id_b"),
            empty_like=_mt("id_a", "id_b", "lab_a", "lab_b"),
        )

        def emit_min(df: pd.DataFrame) -> pd.DataFrame:
            lo = df[["lab_a", "lab_b"]].min(axis=1)
            return pd.concat(
                [
                    pd.DataFrame({"image_id": df["id_a"], "cluster_id": lo}),
                    pd.DataFrame({"image_id": df["id_b"], "cluster_id": lo}),
                ]
            )

        prop = with_ab.map_batches(emit_min, batch_format="pandas").union(labels)
        new_labels = hash_partition_apply(
            prop, n_parts, dedupe_min, key_fn=_key_on("image_id"),
            empty_like=_mt("image_id", "cluster_id"),
        )
        # pointer jumping: follow the label's own label (grandparent
        # shortcut). Every cluster_id is itself a labeled node, so the
        # lookup is total.
        probe = new_labels.map_batches(
            lambda df: pd.DataFrame(
                {"image_id": df["image_id"], "jump_key": df["cluster_id"]}
            ),
            batch_format="pandas",
        )
        build = new_labels.map_batches(
            # image_id mirrors jump_key (dummy, filtered out in the reduce)
            # so the shared id columns stay null-free across the concat
            lambda df: pd.DataFrame(
                {
                    "image_id": df["image_id"],
                    "jump_key": df["image_id"],
                    "_lab": df["cluster_id"],
                }
            ),
            batch_format="pandas",
        )

        def jump(part: pd.DataFrame) -> pd.DataFrame:
            if "_lab" not in part.columns:
                return part.iloc[0:0]
            is_lab = part["_lab"].notna()
            bmap = pd.DataFrame(
                {
                    "jump_key": part.loc[is_lab, "jump_key"],
                    "cluster_id": part.loc[is_lab, "_lab"],
                }
            ).drop_duplicates("jump_key")
            pr = part.loc[~is_lab, ["image_id", "jump_key"]]
            m = pr.merge(bmap, on="jump_key", how="left")
            return _cast_ids(
                pd.DataFrame({"image_id": m["image_id"], "cluster_id": m["cluster_id"]})
            )

        new_labels = hash_partition_apply(
            probe.union(build), n_parts, jump, key_fn=_key_on("jump_key"),
            empty_like=_mt("image_id", "cluster_id"),
        ).materialize()

        # convergence: any label changed this round? (one more co-partition)
        old = labels.map_batches(
            lambda df: pd.DataFrame({"image_id": df["image_id"], "_lab": df["cluster_id"]}),
            batch_format="pandas",
        )

        def count_changed(part: pd.DataFrame) -> pd.DataFrame:
            if "_lab" not in part.columns or "cluster_id" not in part.columns:
                return pd.DataFrame({"c": [0]})
            is_old = part["cluster_id"].isna()
            om = pd.DataFrame(
                {"image_id": part.loc[is_old, "image_id"], "old": part.loc[is_old, "_lab"]}
            )
            nw = part.loc[~is_old, ["image_id", "cluster_id"]]
            m = nw.merge(om, on="image_id", how="left")
            return pd.DataFrame({"c": [int((m["old"] != m["cluster_id"]).sum())]})

        changed = hash_partition_apply(
            new_labels.union(old),
            n_parts,
            count_changed,
            key_fn=_key_on("image_id"),
            empty_like=pd.DataFrame({"c": pd.Series([], dtype=np.int64)}),
        ).sum("c")
        labels = new_labels
        if not changed:
            break
    return labels


def contract_blocks(edges_ds):
    """Per-BLOCK pre-contraction for the driver-collect CC path.

    Each block's edges run a local CC and emit star edges (local-min canon →
    member) — connectivity-preserving (every endpoint survives as a star
    member or canon, every within-block path collapses to its star), so
    global CC over the output equals CC over the input. Runs as a parallel
    map with no shuffle; shrinks the edge count toward the endpoint count
    before the driver collect, cutting both the collect bytes and the
    single-threaded driver CC input (the distributed path's per-partition
    ``contract`` does the same after its first shuffle).
    """
    import pandas as pd
    import pyarrow as pa

    def _contract(df: pd.DataFrame) -> pa.Table:
        # explicit Arrow string output: an all-empty run must still collect
        # as string columns (pandas empty object columns round-trip as null)
        if len(df) == 0:
            return pa.table(
                {"id_a": pa.array([], pa.string()), "id_b": pa.array([], pa.string())}
            )
        mem, canon = clusters_driver_arrays(
            df["id_a"].to_numpy(), df["id_b"].to_numpy()
        )
        keep = mem != canon
        return pa.table(
            {
                "id_a": pa.array(canon[keep], type=pa.string()),
                "id_b": pa.array(mem[keep], type=pa.string()),
            }
        )

    return edges_ds.map_batches(_contract, batch_format="pandas")
