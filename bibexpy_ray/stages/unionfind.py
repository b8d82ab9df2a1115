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
  Measured negative result, do not retry blindly: an inner
  jump-until-fixpoint loop (full path compression per round) HALVED the
  attach-round count but ran 2.2× slower end-to-end at 2M edges — every
  extra jump pass pays the same per-shuffle fixed cost that dominates this
  workload, so one jump per round is the right trade here.

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

    All shuffles are ``hash_partition_apply`` co-partition passes in ARROW
    mode end to end — the reduces run pyarrow ``group_by`` / local Acero
    ``Table.join`` / ``pc.min_element_wise`` with no pandas hop, so no
    per-round Python-object conversion of the id columns and int64 ids stay
    exact at any scale (no float64 null-promotion). ``Dataset.join`` is
    deliberately NOT used: Ray's hash-shuffle join reserves an aggregator
    ACTOR pool sized by ``num_partitions`` (e.g. 64 aggregators × 0.25 CPU
    per join, and two joins per plan here) — on a small cluster the pool
    cannot schedule and the plan deadlocks, and at any scale the raw-task
    shuffle has no actor floor to warm up. A per-reduce LOCAL Acero join is
    a different thing entirely: plain C hash-join over one partition's rows
    inside an ordinary task. Ids may be strings or int64.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from bibexpy_ray.functions import hashing
    from bibexpy_ray.stages.shuffle import hash_partition_apply

    import ray as _ray

    _sch = edges_ds.schema().base_schema
    if isinstance(_sch, pa.Schema):
        id_is_int = pa.types.is_integer(_sch.field("id_a").type)
    else:  # PandasBlockSchema (pandas-block upstream)
        id_is_int = np.issubdtype(
            _sch.types[list(_sch.names).index("id_a")], np.integer
        )
    #: one canonical id type for every block this function creates — mixed
    #: string/large_string blocks would fail the reduce-side Arrow concat.
    #: ``string`` (not large_string) because downstream consumers union the
    #: label table with pandas-derived string blocks (canonical scale path);
    #: per-block offsets stay far under the int32 ceiling.
    _idt = pa.int64() if id_is_int else pa.string()

    def _norm_edges(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id_a": t.column("id_a").cast(_idt),
                "id_b": t.column("id_b").cast(_idt),
            }
        )

    edges = edges_ds.map_batches(_norm_edges, batch_format="pyarrow").materialize()
    cpus = int(_ray.cluster_resources().get("CPU", 4))
    n_parts = max(2, min(max(2, edges.num_blocks()), cpus * 4))

    def _key_on(col):
        def key(t):
            c = t.column(col)
            if pa.types.is_integer(c.type):
                v = c.to_numpy(zero_copy_only=False).astype(np.uint64)
                h = hashing.splitmix64(v)
            else:
                h = hashing.text_hash_u64(
                    c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
                )
            return (h % np.uint64(n_parts)).astype(np.int32)

        return key

    def _mt(**cols: "pa.DataType") -> pa.Table:
        return pa.schema(list(cols.items())).empty_table()

    def _col(t: pa.Table, name: str) -> pa.Array:
        c = t.column(name)
        return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

    # labels start as identity over every endpoint id, deduped per partition
    def init_labels(t: pa.Table) -> pa.Table:
        ids = pc.unique(
            pa.concat_arrays([_col(t, "id_a").cast(_idt), _col(t, "id_b").cast(_idt)])
        )
        return pa.table({"image_id": ids, "cluster_id": ids})

    def dedupe_min(part: pa.Table) -> pa.Table:
        g = part.group_by("image_id").aggregate([("cluster_id", "min")])
        return pa.table(
            {
                "image_id": g.column("image_id").cast(_idt),
                "cluster_id": g.column("cluster_id_min").cast(_idt),
            }
        )

    # per-partition pre-contraction: local connected components inside each
    # hash partition replace its edge subset by a star forest (canonical ->
    # member, <= V_part edges vs E_part) — connectivity-preserving, and it
    # star-shapes every locally-visible component so the global min-label
    # rounds start closer to the fixpoint with less data per round. Ids seen
    # only in self-edges keep a self-edge so they still surface as singleton
    # labels (the un-contracted path labels them too).
    def contract(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return _mt(id_a=_idt, id_b=_idt)
        ca, cb = _col(part, "id_a"), _col(part, "id_b")
        if id_is_int:
            mem, canon = clusters_driver_ints(
                ca.to_numpy(zero_copy_only=False), cb.to_numpy(zero_copy_only=False)
            )
            mem_a = pa.array(mem, type=_idt)
            canon_a = pa.array(canon, type=_idt)
        else:
            ids, lab, _ = clusters_driver_arrow(ca, cb)
            mem_a = ids.cast(_idt)
            canon_a = ids.take(pa.array(lab)).cast(_idt)
        all_ids = pc.unique(pa.concat_arrays([ca.cast(_idt), cb.cast(_idt)]))
        lone = all_ids.filter(
            pc.invert(pc.is_in(all_ids, value_set=mem_a))
        )
        keep = pc.invert(pc.equal(mem_a, canon_a))
        return pa.table(
            {
                "id_a": pa.concat_arrays([canon_a.filter(keep), lone]),
                "id_b": pa.concat_arrays([mem_a.filter(keep), lone]),
            }
        )

    edges = hash_partition_apply(
        edges, n_parts, contract, key_fn=_key_on("id_a"),
        empty_like=_mt(id_a=_idt, id_b=_idt), arrow=True,
    ).materialize()

    labels = hash_partition_apply(
        edges.map_batches(init_labels, batch_format="pyarrow"),
        n_parts,
        dedupe_min,
        key_fn=_key_on("image_id"),
        empty_like=_mt(image_id=_idt, cluster_id=_idt),
        arrow=True,
    ).materialize()

    def attach_lab(part: pa.Table, key: str, out_col: str) -> pa.Table:
        # build side = label rows (identified by the _lab marker column);
        # probe side = edge rows. Every endpoint is labeled by construction,
        # so the left join is total. Local Acero hash join — C-speed, no
        # pandas objects.
        cols = {"id_a": _idt, "id_b": _idt}
        if key == "id_b":
            cols["lab_a"] = _idt
        cols[out_col] = _idt
        if "_lab" not in part.schema.names:
            return _mt(**cols)
        is_lab = pc.is_valid(part.column("_lab"))
        build = pa.table(
            {key: _col(part.filter(is_lab), key), out_col: _col(part.filter(is_lab), "_lab")}
        )
        probe = part.filter(pc.invert(is_lab)).drop_columns(["_lab"])
        if probe.num_rows == 0 or build.num_rows == 0:
            return _mt(**cols)
        joined = probe.join(build, key, join_type="left outer")
        # Acero does not guarantee column order; rebuild in contract order
        return pa.table({c: joined.column(c).cast(t) for c, t in cols.items()})

    def marked_labels(lab_ds, key: str):
        # label rows carry BOTH id columns (key = the probe key, the other
        # mirrors it) so no shared id column is ever null across the concat
        other = "id_b" if key == "id_a" else "id_a"

        def mark(t: pa.Table, k=key, o=other) -> pa.Table:
            ids = _col(t, "image_id")
            return pa.table(
                {k: ids, o: ids, "_lab": _col(t, "cluster_id")}
            )

        return lab_ds.map_batches(mark, batch_format="pyarrow")

    last_sum: "int | None" = None
    for round_no in range(max_rounds):
        # edge endpoints pick up their current labels (two co-partition passes)
        with_a = hash_partition_apply(
            edges.union(marked_labels(labels, "id_a")),
            n_parts,
            lambda p: attach_lab(p, "id_a", "lab_a"),
            key_fn=_key_on("id_a"),
            empty_like=_mt(id_a=_idt, id_b=_idt, lab_a=_idt),
            arrow=True,
        )
        with_ab = hash_partition_apply(
            with_a.union(marked_labels(labels, "id_b")),
            n_parts,
            lambda p: attach_lab(p, "id_b", "lab_b"),
            key_fn=_key_on("id_b"),
            empty_like=_mt(id_a=_idt, id_b=_idt, lab_a=_idt, lab_b=_idt),
            arrow=True,
        )

        def emit_min(t: pa.Table) -> pa.Table:
            la, lb = _col(t, "lab_a"), _col(t, "lab_b")
            lo = pc.min_element_wise(la, lb)
            # emit ONLY strict improvements: a row whose endpoint already
            # holds lo is redundant (the labels union carries it), so in
            # converged regions — most of the graph after a round or two —
            # the dedupe_min input shrinks from 2·E + V toward V + Δ
            imp_a = pc.fill_null(pc.less(lo, la), False)
            imp_b = pc.fill_null(pc.less(lo, lb), False)
            return pa.table(
                {
                    "image_id": pa.concat_arrays(
                        [
                            _col(t.filter(imp_a), "id_a").cast(_idt),
                            _col(t.filter(imp_b), "id_b").cast(_idt),
                        ]
                    ),
                    "cluster_id": pa.concat_arrays(
                        [
                            lo.filter(imp_a).cast(_idt),
                            lo.filter(imp_b).cast(_idt),
                        ]
                    ),
                }
            )

        prop = with_ab.map_batches(emit_min, batch_format="pyarrow").union(labels)
        new_labels = hash_partition_apply(
            prop, n_parts, dedupe_min, key_fn=_key_on("image_id"),
            empty_like=_mt(image_id=_idt, cluster_id=_idt), arrow=True,
        )
        # pointer jumping: follow the label's own label (grandparent
        # shortcut). Every cluster_id is itself a labeled node, so the
        # lookup is total.
        def to_probe(t: pa.Table) -> pa.Table:
            # self-labeled roots bypass the jump shuffle entirely (their
            # lookup is the identity); after convergence most labels are
            # roots, so the jump traffic shrinks toward the frontier
            moved = pc.invert(
                pc.equal(t.column("image_id"), t.column("cluster_id"))
            )
            t = t.filter(pc.fill_null(moved, True))
            return pa.table(
                {"image_id": _col(t, "image_id"), "jump_key": _col(t, "cluster_id")}
            )

        def to_bypass(t: pa.Table) -> pa.Table:
            keep = pc.fill_null(
                pc.equal(t.column("image_id"), t.column("cluster_id")), False
            )
            t = t.filter(keep)
            return pa.table(
                {"image_id": _col(t, "image_id"), "cluster_id": _col(t, "cluster_id")}
            )

        def to_build(t: pa.Table) -> pa.Table:
            # image_id mirrors jump_key (dummy, filtered out in the reduce)
            # so the shared id columns stay null-free across the concat
            return pa.table(
                {
                    "image_id": _col(t, "image_id"),
                    "jump_key": _col(t, "image_id"),
                    "_lab": _col(t, "cluster_id"),
                }
            )

        probe = new_labels.map_batches(to_probe, batch_format="pyarrow")
        bypass = new_labels.map_batches(to_bypass, batch_format="pyarrow")
        build = new_labels.map_batches(to_build, batch_format="pyarrow")

        def jump(part: pa.Table) -> pa.Table:
            if "_lab" not in part.schema.names:
                return _mt(image_id=_idt, cluster_id=_idt)
            is_lab = pc.is_valid(part.column("_lab"))
            bm = part.filter(is_lab)
            bmap = pa.table(
                {"jump_key": _col(bm, "jump_key"), "cluster_id": _col(bm, "_lab")}
            )
            pr = part.filter(pc.invert(is_lab)).select(["image_id", "jump_key"])
            if pr.num_rows == 0 or bmap.num_rows == 0:
                return _mt(image_id=_idt, cluster_id=_idt)
            m = pr.join(bmap, "jump_key", join_type="left outer")
            return pa.table(
                {
                    "image_id": m.column("image_id").cast(_idt),
                    "cluster_id": m.column("cluster_id").cast(_idt),
                }
            )

        new_labels = (
            hash_partition_apply(
                probe.union(build), n_parts, jump, key_fn=_key_on("jump_key"),
                empty_like=_mt(image_id=_idt, cluster_id=_idt), arrow=True,
            )
            .union(bypass)
            .materialize()
        )

        # convergence: the (image_id, cluster_id) MULTISET is unchanged iff
        # its order-free checksum is — a streaming sum of per-row 64-bit
        # hashes (one cheap map + aggregate) instead of the co-partition
        # compare pass this used to cost per round. Equal-sum different
        # multisets need a 2⁻⁶⁴-scale hash coincidence; the worst case is
        # one EXTRA round, never a wrong result (labels are monotone
        # non-increasing, and a genuinely changed fixpoint re-converges).
        new_sum = _label_checksum(new_labels, id_is_int)
        old_sum = (
            _label_checksum(labels, id_is_int) if last_sum is None else last_sum
        )
        last_sum = new_sum
        labels = new_labels
        if new_sum == old_sum:
            break
    return labels


def _label_checksum(lab_ds, id_is_int: bool) -> int:
    """Order-free multiset checksum of (image_id, cluster_id) rows: sum of
    SplitMix64(row-hash) mod 2⁶⁴ — partition- and order-invariant."""
    import numpy as np
    import pyarrow as pa

    from bibexpy_ray.functions import hashing

    def part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"s": pa.array([0], type=pa.uint64())})

        def col_hash(name):
            c = t.column(name)
            c = c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
            if id_is_int:
                v = c.to_numpy(zero_copy_only=False).astype(np.uint64)
                return hashing.splitmix64(v)
            return hashing.text_hash_u64(c)

        with np.errstate(over="ignore"):
            h = hashing.splitmix64(
                col_hash("image_id") * np.uint64(0x9E3779B97F4A7C15)
                ^ col_hash("cluster_id")
            )
            s = np.uint64(np.sum(h, dtype=np.uint64))
        return pa.table({"s": pa.array([s], type=pa.uint64())})

    parts = lab_ds.map_batches(part, batch_format="pyarrow").to_pandas()
    return int(np.sum(parts["s"].to_numpy(dtype=np.uint64), dtype=np.uint64))


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
