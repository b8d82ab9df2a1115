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
    (including itself); converges when no label changes. Rounds are
    groupby-shuffles on the id key — O(log(max component diameter)) rounds for
    the near-star components dedup produces.
    """
    import pandas as pd

    def _rename(ds, mapping):
        # rename via a pandas map_batches — robust across block formats
        return ds.map_batches(
            lambda df, m=mapping: df.rename(columns=m), batch_format="pandas"
        )

    def _dedupe_min(ds, key, val):
        # per-key minimum via groupby aggregate, normalized column name
        out = ds.groupby(key).min(val)
        return _rename(out, {f"min({val})": val})

    edges = edges_ds.map_batches(
        lambda df: pd.DataFrame({"id_a": df["id_a"], "id_b": df["id_b"]}),
        batch_format="pandas",
    ).materialize()
    n_parts = max(2, edges.num_blocks())

    # labels start as identity over every endpoint id
    def init_labels(df: pd.DataFrame) -> pd.DataFrame:
        ids = pd.unique(pd.concat([df["id_a"], df["id_b"]], ignore_index=True))
        return pd.DataFrame({"image_id": ids, "cluster_id": ids})

    labels = _dedupe_min(
        edges.map_batches(init_labels, batch_format="pandas"), "image_id", "cluster_id"
    ).materialize()

    for _ in range(max_rounds):
        lab_a = _rename(labels, {"image_id": "id_a", "cluster_id": "lab_a"})
        lab_b = _rename(labels, {"image_id": "id_b", "cluster_id": "lab_b"})
        j = edges.join(lab_a, "inner", n_parts, on=("id_a",)).join(
            lab_b, "inner", n_parts, on=("id_b",)
        )

        def emit_min(df: pd.DataFrame) -> pd.DataFrame:
            lo = df[["lab_a", "lab_b"]].min(axis=1)
            return pd.concat(
                [
                    pd.DataFrame({"image_id": df["id_a"], "cluster_id": lo}),
                    pd.DataFrame({"image_id": df["id_b"], "cluster_id": lo}),
                ]
            )

        prop = j.map_batches(emit_min, batch_format="pandas").union(labels)
        new_labels = _dedupe_min(prop, "image_id", "cluster_id").materialize()
        # pointer jumping: follow the label's own label (grandparent shortcut)
        # so chain components converge in O(log diameter) rounds, not O(n).
        # Every cluster_id is itself a labeled node, so the inner join is total.
        jump_src = _rename(new_labels, {"image_id": "jump_key", "cluster_id": "jump_lab"})
        jumped = _rename(new_labels, {"cluster_id": "jump_key"}).join(
            jump_src, "inner", n_parts, on=("jump_key",)
        )
        new_labels = jumped.map_batches(
            lambda df: pd.DataFrame(
                {"image_id": df["image_id"], "cluster_id": df["jump_lab"]}
            ),
            batch_format="pandas",
        ).materialize()
        # convergence: any label changed this round?
        old = _rename(labels, {"cluster_id": "old"})
        merged = old.join(new_labels, "inner", n_parts, on=("image_id",))
        changed = merged.map_batches(
            lambda df: pd.DataFrame({"c": [int((df["old"] != df["cluster_id"]).sum())]}),
            batch_format="pandas",
        ).sum("c")
        labels = new_labels
        if not changed:
            break
    return labels
