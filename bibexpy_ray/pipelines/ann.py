"""Similarity search over the embeddings table (list<float> vectors).

Brute-force cosine top-k as the exactness baseline — per-batch numpy matmul
against a broadcast query matrix (`ray.put` once, read per task) — plus an
LSH-bucketed near-dup variant as the scale path. All float math in float64 so
scores match the DuckDB oracle's double-precision ``list_cosine_similarity``.

Scale notes: the query matrix broadcasts (k×d doubles — tiny); the corpus
streams through map_batches; per-batch partial top-k reduces driver traffic to
(#blocks × k × topk) rows. For corpus×corpus near-dup the full normalized
matrix broadcasts below ``BROADCAST_VEC_LIMIT`` rows; beyond that the
random-hyperplane LSH variant (`embedding_neardup_lsh`) buckets vectors by
sign-pattern so only same-bucket pairs are scored.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from bibexpy_ray.functions import hashing
from bibexpy_ray.pipelines.tables import read_table

BROADCAST_VEC_LIMIT = 2_000_000


def _embedding_matrix(batch: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
    ids = batch["vec_id"].to_numpy(dtype=np.int64)
    mat = np.array([np.asarray(v, dtype=np.float64) for v in batch["embedding"]])
    return ids, mat


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def ann_topk(sf_dir: str, n_queries: int = 8, k: int = 5) -> pd.DataFrame:
    """Exact cosine top-k: first ``n_queries`` vec_ids against the corpus.

    Per-batch partial top-k (numpy matmul, float64) → driver merge. Ties break
    (score desc, vec_id asc) deterministically; self-matches excluded.
    """
    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    # small filtered read for the query side (vectorized filter, streams once)
    import pyarrow.compute as pc

    q_pd = (
        ds.map_batches(
            lambda b: b.filter(pc.less(b.column("vec_id"), n_queries)),
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values("vec_id")
    )
    q_ids, q_mat = _embedding_matrix(q_pd)
    q_norm = _normalize(q_mat)
    ref = ray.put((q_ids, q_norm))

    def partial_topk(batch: pd.DataFrame) -> pd.DataFrame:
        qi, qn = ray.get(ref)
        ids, mat = _embedding_matrix(batch)
        sims = _normalize(mat) @ qn.T  # (batch, nq)
        rows = []
        for j, qid in enumerate(qi):
            s = sims[:, j]
            mask = ids != qid  # exclude self
            cand_ids, cand_s = ids[mask], s[mask]
            if cand_ids.size == 0:
                continue
            top = min(len(cand_ids), k)
            # deterministic partial top-k: sort by (-sim, id)
            order = np.lexsort((cand_ids, -cand_s))[:top]
            rows.append(
                pd.DataFrame(
                    {"query_id": qid, "neighbor_id": cand_ids[order], "sim": cand_s[order]}
                )
            )
        if not rows:
            return pd.DataFrame(
                {
                    "query_id": pd.Series([], dtype=np.int64),
                    "neighbor_id": pd.Series([], dtype=np.int64),
                    "sim": pd.Series([], dtype=np.float64),
                }
            )
        return pd.concat(rows, ignore_index=True)

    partials = ds.map_batches(partial_topk, batch_format="pandas").to_pandas()
    out_rows = []
    for qid, g in partials.groupby("query_id"):
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        out_rows.append(
            pd.DataFrame(
                {
                    "query_id": np.full(len(g), qid, dtype=np.int64),
                    "rank": np.arange(1, len(g) + 1, dtype=np.int64),
                    "neighbor_id": g["neighbor_id"].to_numpy(dtype=np.int64),
                }
            )
        )
    if not out_rows:
        return pd.DataFrame(
            {
                "query_id": pd.Series([], dtype=np.int64),
                "rank": pd.Series([], dtype=np.int64),
                "neighbor_id": pd.Series([], dtype=np.int64),
            }
        )
    return pd.concat(out_rows, ignore_index=True).sort_values(
        ["query_id", "rank"]
    ).reset_index(drop=True)


def _spherical_kmeans(
    mat: np.ndarray, n_centroids: int, iters: int = 10, seed: int = 42
) -> np.ndarray:
    """Deterministic spherical k-means over a normalized sample (driver-side:
    the sample is a few thousand rows — the model-train-small pattern)."""
    rng = np.random.default_rng(seed)
    nm = _normalize(mat)
    c = nm[rng.choice(len(nm), size=min(n_centroids, len(nm)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(nm @ c.T, axis=1)
        for j in range(len(c)):
            members = nm[assign == j]
            if len(members):
                c[j] = members.sum(axis=0)
        c = _normalize(c)
    return c


IVF_SAMPLE_ROWS = 4096


def ivf_build(
    sf_dir: str, n_centroids: int = 32, seed: int = 42
) -> tuple[str, np.ndarray]:
    """Build an IVF index: train centroids on a sample, assign every vector,
    write the corpus PARTITIONED BY LIST (hive layout, one directory per
    centroid). Queries then read only their probed partitions — candidate
    pruning happens at the read, which is the entire point of IVF at 100 TB
    (the LSH variant prunes pairs; IVF prunes I/O). Cached per (sf, params,
    source mtime); built in a temp dir and atomically renamed so a crash
    mid-build never leaves a half-populated index that a rebuild would
    append duplicates into."""
    import os
    import shutil

    src = os.path.join(sf_dir, "embeddings.parquet")
    try:
        st = os.stat(src)
        # nanosecond granularity: a regenerated same-size file within the
        # same second must invalidate the cached index (checkpoint.py:183)
        mtime = getattr(st, "st_mtime_ns", None) or int(st.st_mtime * 1e9)
    except OSError:
        mtime = 0
    sf = os.path.basename(sf_dir.rstrip("/"))
    root = f"/tmp/bibexpy_ivf/{sf}_c{n_centroids}_s{seed}_m{mtime}"
    cent_path = f"{root}/centroids.npy"
    if os.path.exists(cent_path):
        return root, np.load(cent_path)
    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    sample = ds.limit(IVF_SAMPLE_ROWS).to_pandas()
    _, s_mat = _embedding_matrix(sample)
    centroids = _spherical_kmeans(s_mat, n_centroids, seed=seed)
    ref = ray.put(centroids)

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(ref)
        ids, mat = _embedding_matrix(batch)
        lid = np.argmax(_normalize(mat) @ c.T, axis=1).astype(np.int64)
        out = batch.copy()
        # list_id rides twice: as the hive partition key (pruned at read) and
        # as a plain column (partition cols are stripped from the files)
        out["list_part"] = lid
        out["list_id"] = lid
        return out

    tmp = root + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    ds.map_batches(assign, batch_format="pandas").write_parquet(
        tmp, partition_cols=["list_part"]
    )
    np.save(os.path.join(tmp, "centroids.npy"), centroids)
    shutil.rmtree(root, ignore_errors=True)
    os.replace(tmp, root)
    return root, centroids


def ann_topk_ivf(
    sf_dir: str,
    n_queries: int = 8,
    k: int = 5,
    n_centroids: int = 32,
    nprobe: int = 20,
) -> pd.DataFrame:
    """IVF cosine top-k: probe only each query's ``nprobe`` nearest centroid
    lists. Reads ONLY the probed partitions (union across queries) and masks
    per query inside each batch. Approximate by design — recall vs the exact
    ``ann_topk`` is pinned in tests (measured 0.75/0.8/0.9 at nprobe
    12/16/20 on the synthetic table, whose vectors are ISOTROPIC — mean
    pairwise cos 0.0 — so recall tracks the probed fraction with only a
    modest lift; real embedding corpora cluster, making the probe far more
    selective at the same nprobe). Same output schema as ``ann_topk`` so the
    two are drop-in interchangeable."""
    import os

    root, centroids = ivf_build(sf_dir, n_centroids=n_centroids)
    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    import pyarrow.compute as pc

    q_pd = (
        ds.map_batches(
            lambda b: b.filter(pc.less(b.column("vec_id"), n_queries)),
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values("vec_id")
    )
    q_ids, q_mat = _embedding_matrix(q_pd)
    q_norm = _normalize(q_mat)
    q_sims = q_norm @ centroids.T  # (nq, c)
    nprobe = min(nprobe, centroids.shape[0])
    probe_lists = np.argsort(-q_sims, axis=1)[:, :nprobe]  # (nq, nprobe)
    union = sorted({int(l) for row in probe_lists for l in row})
    # prune at the read: only probed partitions leave storage (explicit file
    # list — read_parquet expands a single directory but not a list of them)
    paths = [
        os.path.join(d, f)
        for d in (f"{root}/list_part={lid}" for lid in union)
        if os.path.isdir(d)
        for f in sorted(os.listdir(d))
        if f.endswith(".parquet")
    ]
    probed = rd.read_parquet(paths, columns=["vec_id", "embedding", "list_id"])
    probe_sets = [set(map(int, row)) for row in probe_lists]
    ref = ray.put((q_ids, q_norm, probe_sets))

    def partial_topk(batch: pd.DataFrame) -> pd.DataFrame:
        qi, qn, psets = ray.get(ref)
        ids, mat = _embedding_matrix(batch)
        lids = batch["list_id"].to_numpy(dtype=np.int64)
        sims = _normalize(mat) @ qn.T
        rows = []
        for j, qid in enumerate(qi):
            in_probe = np.isin(lids, list(psets[j])) & (ids != qid)
            cand_ids, cand_s = ids[in_probe], sims[in_probe, j]
            if cand_ids.size == 0:
                continue
            top = min(len(cand_ids), k)
            order = np.lexsort((cand_ids, -cand_s))[:top]
            rows.append(
                pd.DataFrame(
                    {"query_id": qid, "neighbor_id": cand_ids[order],
                     "sim": cand_s[order]}
                )
            )
        if not rows:
            return pd.DataFrame(
                {
                    "query_id": pd.Series([], dtype=np.int64),
                    "neighbor_id": pd.Series([], dtype=np.int64),
                    "sim": pd.Series([], dtype=np.float64),
                }
            )
        return pd.concat(rows, ignore_index=True)

    partials = probed.map_batches(partial_topk, batch_format="pandas").to_pandas()
    out_rows = []
    for qid, g in partials.groupby("query_id"):
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        out_rows.append(
            pd.DataFrame(
                {
                    "query_id": np.full(len(g), qid, dtype=np.int64),
                    "rank": np.arange(1, len(g) + 1, dtype=np.int64),
                    "neighbor_id": g["neighbor_id"].to_numpy(dtype=np.int64),
                }
            )
        )
    if not out_rows:
        return pd.DataFrame(
            {
                "query_id": pd.Series([], dtype=np.int64),
                "rank": pd.Series([], dtype=np.int64),
                "neighbor_id": pd.Series([], dtype=np.int64),
            }
        )
    return pd.concat(out_rows, ignore_index=True).sort_values(
        ["query_id", "rank"]
    ).reset_index(drop=True)


def embedding_neardup_pairs(sf_dir: str, tau: float = 0.4) -> pd.DataFrame:
    """All vector pairs with cosine ≥ τ — exact (brute force vs broadcast
    normalized matrix). Output is id-only so it hash-matches the SQL oracle
    (float scores differ in the last ulp across sum orders).

    Above ``BROADCAST_VEC_LIMIT`` the O(n²) exact sweep is not viable on any
    hardware — delegates to the LSH variant (documented approximation: per-pair
    scoring stays exact, only candidate *generation* becomes probabilistic,
    ≈0.96 recall at the default table shape)."""
    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    n = ds.count()
    if n > BROADCAST_VEC_LIMIT:  # pragma: no cover - scale path
        return embedding_neardup_lsh(sf_dir, tau)
    full = ds.to_pandas()
    all_ids, all_mat = _embedding_matrix(full)
    all_norm = _normalize(all_mat)
    ref = ray.put((all_ids, all_norm))

    def pairs(batch: pd.DataFrame) -> pd.DataFrame:
        ai, an = ray.get(ref)
        ids, mat = _embedding_matrix(batch)
        sims = _normalize(mat) @ an.T  # (batch, n)
        ri, ci = np.nonzero(sims >= tau)
        a = ids[ri]
        b = ai[ci]
        keep = a < b  # each unordered pair once, no self-pairs
        return pd.DataFrame({"id_a": a[keep], "id_b": b[keep]})

    out = ds.map_batches(pairs, batch_format="pandas").to_pandas()
    if len(out) == 0:
        return pd.DataFrame(
            {
                "id_a": pd.Series([], dtype=np.int64),
                "id_b": pd.Series([], dtype=np.int64),
            }
        )
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def _cosine_verify_ds(
    pairs: rd.Dataset, ds: rd.Dataset, tau: float, n_vecs: int
) -> rd.Dataset:
    """Exact per-pair cosine ≥ τ filter over a candidate pair Dataset.

    Below ``BROADCAST_VEC_LIMIT`` vectors, the normalized matrix broadcasts
    uid-sorted (``ray.put`` once — a dense float block, not an object-heavy
    dict) and pairs probe it with a guarded searchsorted. Above it, the
    embeddings co-partition to each pair side via the raw-task hash shuffle
    (``stages.shuffle.attach_pair_both``, same shape as
    docdedup._verify_jaccard_ds — ``Dataset.join`` deadlocks small clusters,
    BASELINE.md round 3) — no whole-corpus collect at any scale."""
    pairs = pairs.map_batches(
        lambda t: t.select(["id_a", "id_b"]), batch_format="pyarrow"
    )
    if n_vecs <= BROADCAST_VEC_LIMIT:
        tbl = pa.concat_tables(ray.get(ds.to_arrow_refs())).combine_chunks()
        ids = tbl.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        mat = np.vstack(
            [np.asarray(v, dtype=np.float64) for v in tbl.column("embedding").to_pylist()]
        )
        order = np.argsort(ids)
        ids, nm = ids[order], _normalize(mat[order])
        ref = ray.put((ids, nm))

        def verify(batch: pd.DataFrame) -> pd.DataFrame:
            sids, snm = ray.get(ref)
            a = batch["id_a"].to_numpy(dtype=np.int64)
            b = batch["id_b"].to_numpy(dtype=np.int64)
            ia = np.minimum(np.searchsorted(sids, a), len(sids) - 1)
            ib = np.minimum(np.searchsorted(sids, b), len(sids) - 1)
            ok = (sids[ia] == a) & (sids[ib] == b)
            if not ok.all():  # unknown ids can't verify (resume/drift guard)
                a, b, ia, ib = a[ok], b[ok], ia[ok], ib[ok]
            sims = np.einsum("ij,ij->i", snm[ia], snm[ib])
            keep = sims >= tau
            return pd.DataFrame({"id_a": a[keep], "id_b": b[keep]})

        return pairs.map_batches(verify, batch_format="pandas")
    # scale path: fused two-hop co-partition join + verify-in-reduce
    # (stages/shuffle.attach_pair_both — the flagship's verify_stage shape):
    # hop A attaches emb_a and re-partitions by id_b in the same task, hop B
    # attaches emb_b and scores the cosine inline, so the half- and
    # fully-joined O(pairs x dim) tables are never stored; Arrow tables
    # end-to-end keep the list<float> embeddings exact (no pandas object hop)
    from bibexpy_ray.stages.shuffle import attach_pair_both

    cpus_now = int(ray.cluster_resources().get("CPU", 4))
    n_parts = max(8, cpus_now * 2, n_vecs // 500_000)
    ids64 = pa.int64()
    out_schema = pa.schema([("id_a", ids64), ("id_b", ids64)])

    def verify_reduce(joined: pa.Table) -> pa.Table:
        if joined.num_rows == 0:
            return out_schema.empty_table()
        na = _normalize(
            np.vstack([np.asarray(v, np.float64) for v in joined.column("emb_a").to_pylist()])
        )
        nb = _normalize(
            np.vstack([np.asarray(v, np.float64) for v in joined.column("emb_b").to_pylist()])
        )
        keep = np.einsum("ij,ij->i", na, nb) >= tau
        return pa.table(
            {
                "id_a": pa.array(
                    joined.column("id_a").to_numpy(zero_copy_only=False).astype(np.int64)[keep]
                ),
                "id_b": pa.array(
                    joined.column("id_b").to_numpy(zero_copy_only=False).astype(np.int64)[keep]
                ),
            }
        )

    return attach_pair_both(
        pairs,
        ds,
        "vec_id",
        {"embedding": "emb"},
        verify_reduce,
        empty_like=out_schema.empty_table(),
        num_partitions=n_parts,
    )


def embedding_neardup_lsh(
    sf_dir: str, tau: float = 0.4, n_tables: int = 16, planes_per_table: int = 4
) -> pd.DataFrame:
    """Random-hyperplane LSH near-dup (the scale path): ``n_tables`` hash
    tables of ``planes_per_table`` sign bits each (deterministic seed); a pair
    is scored iff it collides in at least one table. Collision probability per
    table is (1-θ/π)^p — 16 tables × 4 planes gives ≈0.96 recall at cos 0.45.
    Approximate by design; compared against the exact variant in tests.

    Scale shape: bucket rows are (bucket_key, vec_id) ONLY — embeddings never
    ride the shuffle (n_tables copies of each vector otherwise). Pair emission
    is capped per bucket with the dropped count carried through the distributed
    dedupe; each distinct pair is cosine-scored exactly once by
    ``_cosine_verify_ds`` (broadcast matrix under the cap, hash-join above)."""
    from bibexpy_ray.pipelines.docdedup import IntBucketPairEmitter, _dedupe_int_pairs

    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    n = ds.count()
    rng = np.random.default_rng(42)
    first = ds.take(1)
    dim = len(first[0]["embedding"])
    planes = rng.standard_normal((dim, n_tables * planes_per_table))
    planes_ref = ray.put(planes)
    n_parts = 32

    def bucket(batch: pd.DataFrame) -> pa.Table:
        pl = ray.get(planes_ref)
        ids, mat = _embedding_matrix(batch)
        signs = (mat @ pl) >= 0  # (n, tables*p)
        # key = table_id in the high bits, the table's sign pattern below
        bits = signs.astype(np.uint64)
        keys = np.empty((len(ids), n_tables), dtype=np.uint64)
        for t in range(n_tables):
            key = np.full(len(ids), t, dtype=np.uint64)
            for j in range(t * planes_per_table, (t + 1) * planes_per_table):
                key = (key << np.uint64(1)) | bits[:, j]
            keys[:, t] = key
        # sortkey = full sign pattern of table 0: similar vectors share a
        # prefix, keeping near neighbors adjacent in hot-bucket windows
        sk = keys[:, 0]
        return pa.table(
            {
                "bucket_key": pa.array(keys.ravel(), type=pa.uint64()),
                "doc_id": pa.array(np.repeat(ids, n_tables), type=pa.int64()),
                "sortkey": pa.array(np.repeat(sk, n_tables), type=pa.uint64()),
            }
        )

    def add_part(batch: pa.Table) -> pa.Table:
        k = batch.column("bucket_key").to_numpy(zero_copy_only=False).astype(np.uint64)
        part = (hashing.splitmix64(k) % np.uint64(n_parts)).astype(np.int32)
        return batch.append_column("_part", pa.array(part, type=pa.int32()))

    from bibexpy_ray.stages.shuffle import hash_partition_apply

    emitter = IntBucketPairEmitter()
    raw_pairs = hash_partition_apply(
        ds.map_batches(bucket, batch_format="pandas").map_batches(
            add_part, batch_format="pyarrow"
        ),
        n_parts,
        lambda df: emitter(df),
    )
    pairs = _dedupe_int_pairs(raw_pairs, n_parts, agg={"dropped": "max"})
    out = _cosine_verify_ds(pairs, ds, tau, n).to_pandas()
    if len(out) == 0:
        return pd.DataFrame(
            {
                "id_a": pd.Series([], dtype=np.int64),
                "id_b": pd.Series([], dtype=np.int64),
            }
        )
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)
