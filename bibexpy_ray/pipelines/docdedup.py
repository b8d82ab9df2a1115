"""Deduplication operators over the documents table (int-id text corpus).

The training-data dedup family from the brief, built from the same kernels as
the flagship image pipeline (functions/hashing.py):

- exact dedup            hash-partition on content hash → per-group min id
                         (the reference's groupby-DOI exact dedup,
                         /root/reference/packages/bibex_core/MergeDB.py:776-797)
- MinHash+LSH near-dup   char-5-gram shingles → 128-perm MinHash → banded
                         buckets → capped pair emit → exact-Jaccard verify
                         (smart_merger.py blocking+staged-match analog)
- word-n-gram Jaccard    same shape over word 3-gram shingles
- SimHash near-dup       64-bit SimHash, 8×8-bit band buckets (complete for
                         Hamming ≤ 7 by pigeonhole), Hamming verify

Oracle-exactness: verification returns integer ``inter_size``/``union_size``
(shingle-set cardinalities) rather than a float ratio, so results hash-match a
DuckDB brute-force oracle bit-for-bit. Pair recall at the τ=0.8 operating
point: P[no shared band] = (1-τ²)^64 < 1e-8 — LSH is effectively complete.

Scale notes: only (bucket_key, doc_id) rows enter the shuffle; verify
broadcasts the id→text map under ``BROADCAST_DOC_LIMIT`` docs, else falls back
to a hash-partitioned join; pair emission is capped per bucket with the dropped
count reported (no silent truncation).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from bibexpy_ray.functions import hashing
from bibexpy_ray.pipelines.tables import read_table
from bibexpy_ray.stages.lsh import BucketPairEmitter

BROADCAST_DOC_LIMIT = 2_000_000
_U64 = np.uint64


# ---------------------------------------------------------------------------
# Shingle builders (char k-gram and word n-gram)
# ---------------------------------------------------------------------------


def char_shingles(texts: pa.Array | list[str], k: int = 5) -> tuple[np.ndarray, np.ndarray]:
    """Distinct char-k-gram hash sets per row → (flat u64, row_offsets)."""
    flat, offs = hashing.shingle_hashes(texts, k)
    return hashing.unique_per_row(flat, offs)


def word_shingles(texts: list[str], n: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Distinct word-n-gram hash sets per row (single-space tokenization,
    matching DuckDB ``string_split(text, ' ')``)."""
    grams: list[str] = []
    counts = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        toks = (t or "").split(" ")
        row = [" ".join(toks[j : j + n]) for j in range(max(0, len(toks) - n + 1))]
        grams.extend(row)
        counts[i] = len(row)
    offs = np.zeros(len(texts) + 1, dtype=np.int64)
    np.cumsum(counts, out=offs[1:])
    flat = hashing.text_hash_u64(grams) if grams else np.empty(0, dtype=_U64)
    return hashing.unique_per_row(flat, offs)


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(sf_dir: str) -> rd.Dataset:
    """Exact dedup on text content: keep min doc_id per distinct text.

    Hash-partition on the 64-bit content hash (groups colocate, P bounds group
    count), then one vectorized pandas reduction per partition. At 100 TB only
    (hash, doc_id) pairs shuffle — never the text — but group-on-hash means a
    (astronomically unlikely) 64-bit collision would merge two texts; the
    per-partition reduce groups on the hash *and* verifies nothing else is
    needed because min/count are hash-keyed exactly like the SQL oracle's
    text-keyed groupby when no collision exists.
    """
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])
    n_parts = 32

    def add_key(batch: pa.Table) -> pa.Table:
        h = hashing.text_hash_u64(batch.column("text"))
        part = (h % _U64(n_parts)).astype(np.int32)
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "_h": pa.array(h, type=pa.uint64()),
                "_part": pa.array(part, type=pa.int32()),
            }
        )

    def reduce_part(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby("_h", as_index=False).agg(
            doc_id=("doc_id", "min"), n_copies=("doc_id", "size")
        )
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].astype(np.int64),
                "n_copies": g["n_copies"].astype(np.int64),
            }
        )

    from bibexpy_ray.stages.shuffle import hash_partition_apply

    # manual hash shuffle (split/reduce) — the sort-based groupby's sampling
    # and range coordination dominates a pure vectorized per-partition reduce
    return hash_partition_apply(
        ds.map_batches(add_key, batch_format="pyarrow"), n_parts, reduce_part
    )


def composite_dedup(sf_dir: str) -> rd.Dataset:
    """Second-pass composite-key dedup (the reference's title+year pass,
    /root/reference/packages/bibex_core/MergeDB.py:798-815 — semantics
    reimplemented): key = non-alnum-stripped, whitespace-collapsed text +
    ' ' + lang (the clean_title + PY analog); per group keep the most
    complete record — first non-null value per field in doc_id order
    (``merge_values``, MergeDB.py:14-25), provenance = sorted distinct
    sources ';'-joined (``DB_Original``), and the DB flag flips to
    'BIBEXPY' when more than one source merged (MergeDB.py:813).

    Scale shape: the cleaned key never leaves the mapper — only its 64-bit
    hash, doc_id and the two small carried fields shuffle; one vectorized
    reduction per hash partition.
    """
    ds = read_table(sf_dir, "documents", ["doc_id", "text", "lang", "source", "n_chars"])
    n_parts = 32

    def add_key(batch: pd.DataFrame) -> pd.DataFrame:
        clean = (
            batch["text"]
            .fillna("")
            .astype(str)
            .str.replace(r"[^a-zA-Z0-9\s]", "", regex=True)
            .str.replace(r"\s+", " ", regex=True)
            .str.strip()
        )
        key = clean + " " + batch["lang"].fillna("").astype(str)
        h = hashing.text_hash_u64(key.tolist())
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype(np.int64),
                "source": batch["source"],
                "n_chars": batch["n_chars"],
                "_h": h,
                "_part": (h % _U64(n_parts)).astype(np.int32),
            }
        )

    def reduce_part(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values("doc_id", kind="stable")  # merge_values order
        g = part.groupby("_h")
        agg = g.agg(
            doc_id=("doc_id", "min"),
            n_copies=("doc_id", "size"),
            n_chars=("n_chars", "first"),  # pandas 'first' = first non-null
        )
        # provenance: sorted distinct non-null sources, ';'-joined
        u = (
            part[["_h", "source"]]
            .dropna()
            .drop_duplicates()
            .sort_values(["_h", "source"])
        )
        db_orig = u.groupby("_h")["source"].agg("; ".join)
        agg["db_original"] = db_orig.reindex(agg.index)
        agg["db"] = np.where(
            agg["db_original"].str.contains(";", na=False),
            "BIBEXPY",
            agg["db_original"],
        )
        out = agg.reset_index(drop=True)
        # an all-null group keeps NULL (nullable Int64) like the oracle's
        # FILTERed arg_min; the null-free common case stays plain int64
        nch = out["n_chars"]
        nch = nch.astype("Int64") if nch.isna().any() else nch.astype(np.int64)
        return pd.DataFrame(
            {
                "doc_id": out["doc_id"].astype(np.int64),
                "n_copies": out["n_copies"].astype(np.int64),
                "db_original": out["db_original"],
                "db": out["db"],
                "n_chars": nch,
            }
        )

    from bibexpy_ray.stages.shuffle import hash_partition_apply

    return hash_partition_apply(
        ds.map_batches(add_key, batch_format="pandas"), n_parts, reduce_part
    )


# ---------------------------------------------------------------------------
# LSH candidate generation over int-id shingle sets
# ---------------------------------------------------------------------------


def _empty_int_pairs(extra: dict[str, np.dtype] | None = None) -> pd.DataFrame:
    cols = {
        "id_a": pd.Series([], dtype=np.int64),
        "id_b": pd.Series([], dtype=np.int64),
    }
    for name, dt in (extra or {}).items():
        cols[name] = pd.Series([], dtype=dt)
    return pd.DataFrame(cols)


_EMPTY_INT_PAIRS = _empty_int_pairs({"dropped": np.int64})


class IntBucketPairEmitter:
    """Vectorized pair emission over a hash partition of (bucket_key, doc_id)
    rows — the int-id sibling of stages.lsh.BucketPairEmitter. Size-2 buckets
    emit in one vector op; ≥3 buckets cross-product up to ``cap`` pairs.

    Hot buckets (> cap pairs) fall back to a sliding window ordered by
    signature proximity (``sortkey`` — e.g. the first MinHash permutation —
    keeps near-identical docs adjacent) with a per-bucket salt
    (``splitmix64(doc_id ^ bucket_key)`` tie-break) so different bands'
    windows truncate DIFFERENT pairs and their union recovers coverage; the dropped
    pair count is emitted per row (no silent truncation — the count survives
    dedupe as max and surfaces in metrics).

    ``value_col`` (optional): name of a u64 column carried per bucket row
    (e.g. the full SimHash); emitted as ``val_a``/``val_b`` aligned with the
    pair's (min, max) id order so a downstream vectorized verify (Hamming)
    needs no join back to the corpus. When present it doubles as the
    hot-bucket sort key (identical signatures stay adjacent under the cap)."""

    def __init__(self, cap: int = 4096, window: int = 8, value_col: str | None = None):
        self.cap = cap
        self.window = window
        self.value_col = value_col

    def _empty(self) -> pd.DataFrame:
        extra: dict[str, np.dtype] = {"dropped": np.int64}
        if self.value_col:
            extra["val_a"] = _U64
            extra["val_b"] = _U64
        return _empty_int_pairs(extra)

    def __call__(self, part: pd.DataFrame) -> pd.DataFrame:
        if len(part) == 0:
            return self._empty()
        keys = part["bucket_key"].to_numpy()
        ids = part["doc_id"].to_numpy(dtype=np.int64)
        vals = (
            part[self.value_col].to_numpy(dtype=_U64)
            if self.value_col and self.value_col in part.columns
            else None
        )
        if "sortkey" in part.columns:
            sortkey = part["sortkey"].to_numpy(dtype=_U64)
        else:
            sortkey = vals  # signature proximity by the carried value
        aliased = sortkey is vals
        order = np.lexsort((ids, keys))  # np.lexsort beats the pandas sort 3x
        keys, ids = keys[order], ids[order]
        if vals is not None:
            vals = vals[order]
        if sortkey is not None:
            sortkey = vals if aliased else sortkey[order]
        starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
        ends = np.r_[starts[1:], len(keys)]
        sizes = ends - starts
        out_a, out_b, out_d = [], [], []
        out_va, out_vb = [], []
        # size-class vectorization (one triu per distinct bucket size, starts
        # broadcast against the pair pattern) — mirrors
        # stages.lsh.BucketPairEmitter; per-bucket numpy calls dominate when
        # small buckets number in the hundreds of thousands
        m_cap = BucketPairEmitter.max_full_bucket(self.cap)
        small = (sizes >= 2) & (sizes <= m_cap)
        s_starts = starts[small]
        s_sizes = sizes[small]
        for m in np.unique(s_sizes):
            st = s_starts[s_sizes == m]
            ia, ib = BucketPairEmitter._triu(int(m))
            idx_a = (st[:, None] + ia[None, :]).ravel()
            idx_b = (st[:, None] + ib[None, :]).ravel()
            out_a.append(ids[idx_a])
            out_b.append(ids[idx_b])
            out_d.append(np.zeros(len(idx_a), dtype=np.int64))
            if vals is not None:
                out_va.append(vals[idx_a])
                out_vb.append(vals[idx_b])
        for s, e in zip(starts[sizes > m_cap], ends[sizes > m_cap]):
            m = e - s
            n_pairs = m * (m - 1) // 2
            # per-band salted proximity order (see class docstring)
            salt = hashing.splitmix64(ids[s:e].view(_U64) ^ keys[s])
            if sortkey is not None:
                order = np.lexsort((salt, sortkey[s:e]))
            else:
                order = np.argsort(salt, kind="stable")
            seg = ids[s:e][order]
            w = self.window
            a = np.concatenate([seg[:-off] for off in range(1, w + 1)])
            b = np.concatenate([seg[off:] for off in range(1, w + 1)])
            out_a.append(a)
            out_b.append(b)
            out_d.append(np.full(len(a), n_pairs - len(a), dtype=np.int64))
            if vals is not None:
                sv = vals[s:e][order]
                out_va.append(
                    np.concatenate([sv[:-off] for off in range(1, w + 1)])
                )
                out_vb.append(
                    np.concatenate([sv[off:] for off in range(1, w + 1)])
                )
        if not out_a:
            return self._empty()
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        out = {
            "id_a": np.minimum(a, b),
            "id_b": np.maximum(a, b),
            "dropped": np.concatenate(out_d),
        }
        if vals is not None:
            va = np.concatenate(out_va)
            vb = np.concatenate(out_vb)
            swap = a > b  # values track the (min, max) id order
            out["val_a"] = np.where(swap, vb, va)
            out["val_b"] = np.where(swap, va, vb)
        return pd.DataFrame(out)


def _dedupe_int_pairs(
    pairs: rd.Dataset, n_parts: int, agg: dict[str, str] | None = None
) -> rd.Dataset:
    """Distinct (id_a, id_b) — partition on a pair hash, dedupe per partition.

    ``agg`` maps extra columns to 'min'/'max' reducers applied across the
    duplicate copies of a pair (e.g. {'dropped': 'max'}, {'hamming': 'min'});
    unlisted extra columns are dropped.
    """
    agg = agg or {}

    def add_part(batch: pa.Table) -> pa.Table:
        a = batch.column("id_a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch.column("id_b").to_numpy(zero_copy_only=False).astype(np.int64)
        h = hashing.splitmix64(a.view(_U64) * _U64(1_000_003) ^ b.view(_U64))
        keep = ["id_a", "id_b", *agg.keys()]
        return batch.select(keep).append_column(
            "_part", pa.array((h % _U64(n_parts)).astype(np.int32), type=pa.int32())
        )

    def dedupe(part: pd.DataFrame) -> pd.DataFrame:
        if agg:
            g = part.groupby(["id_a", "id_b"], as_index=False).agg(agg)
        else:
            g = part.drop_duplicates(subset=["id_a", "id_b"])
        out = {
            "id_a": g["id_a"].astype(np.int64),
            "id_b": g["id_b"].astype(np.int64),
        }
        for c in agg:
            out[c] = g[c].astype(np.int64)
        return pd.DataFrame(out)

    from bibexpy_ray.stages.shuffle import hash_partition_apply

    empty = pd.DataFrame(
        {c: pd.Series([], dtype=np.int64) for c in ("id_a", "id_b", *agg)}
    )
    return hash_partition_apply(
        pairs.map_batches(add_part, batch_format="pyarrow"), n_parts, dedupe,
        empty_like=empty,
    )


#: per-shingle-mode LSH shapes (num_perms, bands, rows), tuned to the noise
#: floor: char-5-grams of natural text overlap heavily between unrelated docs
#: (j≈0.2-0.3), so r=8 is needed to keep the candidate count linear; word
#: 3-grams barely collide (j≈0.01), so r=2 maximizes boundary recall at τ=0.5.
#: P(candidate) = 1-(1-j^r)^b: char5 ⇒ 99.7% at j=0.8, ~1e-4 at j=0.25;
#: word3 ⇒ 98% at j=0.5, ~2e-3 at j=0.05.
_LSH_SHAPES = {"char5": (256, 32, 8), "word3": (128, 64, 2)}


def lsh_candidate_pairs(
    sf_dir: str,
    shingle_mode: str = "char5",
    min_shingles: int = 1,
) -> rd.Dataset:
    """(doc_id, text) → distinct candidate pairs via MinHash band LSH."""
    num_perms, bands, rows = _LSH_SHAPES[shingle_mode]
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])
    n_parts = 32

    def emit_bands(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        if shingle_mode == "char5":
            flat, offs = char_shingles(batch.column("text"), 5)
        else:
            flat, offs = word_shingles(batch.column("text").to_pylist(), 3)
        sig = hashing.minhash_signatures(flat, offs, num_perms)
        keys = hashing.band_keys(sig, bands, rows)
        keep = np.diff(offs) >= min_shingles
        keys = keys[keep]
        ids = ids[keep]
        # sortkey = first MinHash permutation: a cheap signature-proximity
        # order for hot-bucket windows (near-identical docs share it)
        sk = sig[keep, 0].astype(_U64)
        return pa.table(
            {
                "bucket_key": pa.array(keys.ravel(), type=pa.uint64()),
                "doc_id": pa.array(np.repeat(ids, bands), type=pa.int64()),
                "sortkey": pa.array(np.repeat(sk, bands), type=pa.uint64()),
            }
        )

    bucket_rows = ds.map_batches(emit_bands, batch_format="pyarrow")

    def add_part(batch: pa.Table) -> pa.Table:
        k = batch.column("bucket_key").to_numpy(zero_copy_only=False).astype(_U64)
        part = (hashing.splitmix64(k) % _U64(n_parts)).astype(np.int32)
        return batch.append_column("_part", pa.array(part, type=pa.int32()))

    from bibexpy_ray.stages.shuffle import hash_partition_apply

    emitter = IntBucketPairEmitter()
    pairs = hash_partition_apply(
        bucket_rows.map_batches(add_part, batch_format="pyarrow"),
        n_parts,
        lambda df: emitter(df),
    )
    return _dedupe_int_pairs(pairs, n_parts, agg={"dropped": "max"})


# ---------------------------------------------------------------------------
# Exact-Jaccard verification (oracle-matched integer sizes)
# ---------------------------------------------------------------------------


def _jaccard_batch(
    a_ids: np.ndarray,
    b_ids: np.ndarray,
    texts_a: list[str],
    texts_b: list[str],
    shingle_mode: str,
    tau: float,
) -> pd.DataFrame:
    """Exact shingle-set Jaccard over one batch of candidate pairs (shared by
    the broadcast and hash-join verify paths)."""
    if shingle_mode == "char5":
        fa, oa = char_shingles(texts_a, 5)
        fb, ob = char_shingles(texts_b, 5)
    else:
        fa, oa = word_shingles(texts_a, 3)
        fb, ob = word_shingles(texts_b, 3)
    inter = np.zeros(len(a_ids), dtype=np.int64)
    union = np.zeros(len(a_ids), dtype=np.int64)
    for i in range(len(a_ids)):
        sa = fa[oa[i] : oa[i + 1]]
        sb = fb[ob[i] : ob[i + 1]]
        ni = np.intersect1d(sa, sb, assume_unique=True).size
        inter[i] = ni
        union[i] = sa.size + sb.size - ni
    keep = inter >= tau * union
    return pd.DataFrame(
        {
            "id_a": a_ids[keep],
            "id_b": b_ids[keep],
            "inter_size": inter[keep],
            "union_size": union[keep],
        }
    )


def _verify_jaccard_ds(
    pairs: rd.Dataset,
    sf_dir: str,
    shingle_mode: str,
    tau: float,
) -> rd.Dataset:
    """Exact shingle-set Jaccard per candidate pair; keep inter/union ≥ τ.

    Below ``BROADCAST_DOC_LIMIT`` docs the (doc_id, text) table broadcasts as
    uid-sorted arrays (``ray.put`` — one copy per node, vectorized searchsorted
    probes with an exact-match guard). Above it, the texts co-partition to the
    pair stream side by side via the raw-task hash shuffle
    (``stages.shuffle.attach_pair_both`` — ``Dataset.join`` deadlocks small
    clusters, BASELINE.md round 3) — no whole-corpus collect at any scale.
    Candidate pairs are a tiny post-LSH fraction, so the per-pair set
    intersection is off the hot path (the reference verifies the same way —
    per-candidate Jaro-Winkler, smart_merger.py:641-651).
    """
    docs = read_table(sf_dir, "documents", ["doc_id", "text"])
    n_docs = docs.count()
    pairs = pairs.map_batches(
        lambda t: t.select(["id_a", "id_b"]), batch_format="pyarrow"
    )
    if n_docs <= BROADCAST_DOC_LIMIT:
        doc_tbl = pa.concat_tables(ray.get(docs.to_arrow_refs())).combine_chunks()
        ids = doc_tbl.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        texts = np.asarray(doc_tbl.column("text").to_pylist(), dtype=object)[order]
        ref = ray.put((ids, texts))

        def verify(batch: pd.DataFrame) -> pd.DataFrame:
            sids, stexts = ray.get(ref)
            a_ids = batch["id_a"].to_numpy(dtype=np.int64)
            b_ids = batch["id_b"].to_numpy(dtype=np.int64)
            ia = np.minimum(np.searchsorted(sids, a_ids), len(sids) - 1)
            ib = np.minimum(np.searchsorted(sids, b_ids), len(sids) - 1)
            ok = (sids[ia] == a_ids) & (sids[ib] == b_ids)
            if not ok.all():  # unknown ids can't verify (resume/drift guard)
                a_ids, b_ids, ia, ib = a_ids[ok], b_ids[ok], ia[ok], ib[ok]
            return _jaccard_batch(
                a_ids, b_ids, list(stexts[ia]), list(stexts[ib]), shingle_mode, tau
            )

        return pairs.map_batches(verify, batch_format="pandas")
    # scale path: fused two-hop co-partition join + verify-in-reduce
    # (stages/shuffle.attach_pair_both — the flagship's verify_stage shape):
    # hop A attaches text_a and re-partitions by id_b in the same task, hop B
    # attaches text_b and computes the Jaccard inline, so the half- and
    # fully-joined O(pairs x text) tables are never stored (the measured
    # 4M-row spill driver, BASELINE.md round 4)
    from bibexpy_ray.stages.shuffle import attach_pair_both

    cpus_now = int(ray.cluster_resources().get("CPU", 4))
    n_parts = max(8, cpus_now * 2, n_docs // 500_000)
    ids64 = pa.int64()
    out_schema = pa.schema(
        [
            ("id_a", ids64),
            ("id_b", ids64),
            ("inter_size", ids64),
            ("union_size", ids64),
        ]
    )

    def verify_reduce(joined: pa.Table) -> pa.Table:
        out = _jaccard_batch(
            joined.column("id_a").to_numpy(zero_copy_only=False).astype(np.int64),
            joined.column("id_b").to_numpy(zero_copy_only=False).astype(np.int64),
            joined.column("text_a").to_pylist(),
            joined.column("text_b").to_pylist(),
            shingle_mode,
            tau,
        )
        return pa.Table.from_pandas(out, preserve_index=False, schema=out_schema)

    return attach_pair_both(
        pairs,
        docs,
        "doc_id",
        {"text": "text"},
        verify_reduce,
        empty_like=out_schema.empty_table(),
        num_partitions=n_parts,
    )


def _verify_jaccard(
    pairs: rd.Dataset,
    sf_dir: str,
    shingle_mode: str,
    tau: float,
) -> pd.DataFrame:
    """Collected + deterministically ordered verify result (query surface)."""
    out = _verify_jaccard_ds(pairs, sf_dir, shingle_mode, tau).to_pandas()
    if len(out) == 0:
        return pd.DataFrame(
            {
                "id_a": pd.Series([], dtype=np.int64),
                "id_b": pd.Series([], dtype=np.int64),
                "inter_size": pd.Series([], dtype=np.int64),
                "union_size": pd.Series([], dtype=np.int64),
            }
        )
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


#: memo for the verified char5 pair table: ``minhash_clusters`` builds on
#: ``neardup_pairs_char5`` — within one process (bench, driver gate) the
#: LSH + verify stages run ONCE and both queries share the result. Keyed by
#: (resolved path, documents mtime) so fixture rewrites invalidate.
_char5_pairs_memo: dict[tuple, pd.DataFrame] = {}
#: scale-path sibling: materialized (doc_id, cluster_id) assignment Dataset
_assign_ds_memo: dict[tuple, "rd.Dataset"] = {}


def _char5_memo_key(sf_dir: str, tau: float) -> tuple:
    import glob
    import os

    root = os.path.realpath(sf_dir)
    mt = max(
        (os.path.getmtime(p) for p in glob.glob(os.path.join(root, "documents*"))),
        default=0.0,
    )
    return (root, round(mt, 3), tau)


def _char5_verified_ds(sf_dir: str, tau: float) -> rd.Dataset:
    """Materialized verified char-5-gram pair Dataset (id_a, id_b, sizes)."""
    pairs = lsh_candidate_pairs(sf_dir, "char5")
    return _verify_jaccard_ds(pairs, sf_dir, "char5", tau).materialize()


def _collect_char5_pairs(vds: rd.Dataset, key: tuple) -> pd.DataFrame:
    """Collect + normalize + memoize a verified char5 pair Dataset (bounded
    by the DRIVER_EDGE_LIMIT gate at every call site)."""
    out = vds.to_pandas()
    if len(out) == 0:
        out = pd.DataFrame(
            {
                "id_a": pd.Series([], dtype=np.int64),
                "id_b": pd.Series([], dtype=np.int64),
                "inter_size": pd.Series([], dtype=np.int64),
                "union_size": pd.Series([], dtype=np.int64),
            }
        )
    out = out.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    _char5_pairs_memo.clear()  # keep at most one corpus resident
    _char5_pairs_memo[key] = out
    return out


def neardup_pairs_char5(sf_dir: str, tau: float = 0.8) -> pd.DataFrame:
    """Near-duplicate pairs by exact char-5-gram Jaccard ≥ τ (MinHash-LSH
    candidates, exact verify). Integer set sizes match the SQL oracle."""
    key = _char5_memo_key(sf_dir, tau)
    hit = _char5_pairs_memo.get(key)
    if hit is not None:
        return hit.copy()
    return _collect_char5_pairs(_char5_verified_ds(sf_dir, tau), key).copy()


def neardup_pairs_word3(sf_dir: str, tau: float = 0.5) -> pd.DataFrame:
    """Near-duplicate pairs by exact word-3-gram Jaccard ≥ τ."""
    pairs = lsh_candidate_pairs(sf_dir, "word3")
    return _verify_jaccard(pairs, sf_dir, "word3", tau)


def _cluster_assignments(sf_dir: str, tau: float) -> rd.Dataset:
    """(doc_id, cluster_id) Dataset from char-5-gram near-dup components.

    Cap-gated like the flagship (dedup_images.py CC section): below
    ``DRIVER_EDGE_LIMIT`` verified edges, vectorized driver CC
    (``clusters_driver_ints``) with the (members, canon) int arrays broadcast
    via ``ray.put`` and a searchsorted attach per batch; above it, distributed
    min-label propagation over the edge DATASET plus a hash-partitioned
    left-join-style fill — no O(edges) structure lands on the driver.
    tests/test_docdedup.py proves the two paths identical on a forced gate."""
    from bibexpy_ray.stages.shuffle import hash_partition_apply
    from bibexpy_ray.stages.unionfind import (
        DRIVER_EDGE_LIMIT,
        clusters_distributed,
        clusters_driver_ints,
    )

    docs = read_table(sf_dir, "documents", ["doc_id"])
    key = _char5_memo_key(sf_dir, tau)
    hit = _assign_ds_memo.get(key)
    if hit is not None:
        return hit  # scale-path result shared across minhash/neardup_dedup
    verified = _char5_pairs_memo.get(key)
    if verified is None:
        vds = _char5_verified_ds(sf_dir, tau)
        if int(vds.count()) > DRIVER_EDGE_LIMIT:
            # ---- scale path: edges never collect --------------------------
            edges = vds.map_batches(
                lambda t: t.select(["id_a", "id_b"]), batch_format="pyarrow"
            )
            labels = clusters_distributed(edges).map_batches(
                lambda df: pd.DataFrame(
                    {
                        "doc_id": df["image_id"].astype(np.int64),
                        "cluster_id": df["cluster_id"].astype(np.int64),
                    }
                ),
                batch_format="pandas",
            )
            n_parts = 32

            def fill(part: pd.DataFrame) -> pd.DataFrame:
                # member rows carry cluster_id, bare doc rows carry null
                # (schema promotion); canonical = min member <= doc_id, so
                # max() picks the label over the null and singletons fall
                # back to their own id
                if "cluster_id" not in part.columns:
                    part = part.assign(cluster_id=np.nan)
                # nullable Int64, not float: float64 corrupts ids above 2^53
                part = part.assign(cluster_id=part["cluster_id"].astype("Int64"))
                g = part.groupby("doc_id", as_index=False)["cluster_id"].max()
                return pd.DataFrame(
                    {
                        "doc_id": g["doc_id"].astype(np.int64),
                        "cluster_id": g["cluster_id"]
                        .fillna(g["doc_id"])
                        .astype(np.int64),
                    }
                )

            def by_doc(t: pa.Table) -> np.ndarray:
                d = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
                return (hashing.splitmix64(d.view(_U64)) % _U64(n_parts)).astype(
                    np.int32
                )

            empty = pd.DataFrame(
                {c: pd.Series([], dtype=np.int64) for c in ("doc_id", "cluster_id")}
            )
            out = hash_partition_apply(
                docs.union(labels), n_parts, fill, key_fn=by_doc, empty_like=empty
            ).materialize()
            # memoize the MATERIALIZED assignment so minhash_clusters and
            # neardup_dedup share one LSH+verify+CC execution on the scale
            # path too (the driver path shares via _char5_pairs_memo)
            _assign_ds_memo.clear()
            _assign_ds_memo[key] = out
            return out
        # collect from the ALREADY-materialized pair Dataset (gate-bounded);
        # memoizes so neardup_pairs_char5/neardup_dedup share the stage
        verified = _collect_char5_pairs(vds, key)

    members, canon = clusters_driver_ints(
        verified["id_a"].to_numpy(), verified["id_b"].to_numpy()
    )
    ref = ray.put((members, canon))

    def attach(batch: pa.Table) -> pa.Table:
        mem, can = ray.get(ref)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        out = ids.copy()
        if mem.size:
            pos = np.minimum(np.searchsorted(mem, ids), mem.size - 1)
            hit = mem[pos] == ids
            out[hit] = can[pos[hit]]
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "cluster_id": pa.array(out, type=pa.int64()),
            }
        )

    return docs.map_batches(attach, batch_format="pyarrow")


def minhash_clusters(sf_dir: str, tau: float = 0.8) -> pd.DataFrame:
    """Cluster assignment from char-5-gram near-dup pairs: connected
    components, canonical id = min member (order-free); singletons map to
    themselves. Every doc_id appears exactly once."""
    out = _cluster_assignments(sf_dir, tau).to_pandas()
    if len(out) == 0:
        out = pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype=np.int64),
                "cluster_id": pd.Series([], dtype=np.int64),
            }
        )
    return out.sort_values("doc_id").reset_index(drop=True)


def neardup_dedup(sf_dir: str, tau: float = 0.8) -> pd.DataFrame:
    """End-to-end corpus dedup: near-dup clusters → one SURVIVOR per cluster
    (min doc_id, the keep-first rule) with its member count — the 'cleaned
    corpus + how much was removed' output a training-data pipeline feeds
    downstream. Survivor selection is a hash-partitioned vectorized reduce
    over the cluster assignment Dataset (which shares the char5 pair stage);
    only the per-cluster survivor rows collect."""
    from bibexpy_ray.stages.shuffle import hash_partition_apply

    assign = _cluster_assignments(sf_dir, tau)
    n_parts = 32

    def surv(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby("cluster_id", as_index=False).agg(
            doc_id=("doc_id", "min"), n_members=("doc_id", "size")
        )
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].astype(np.int64),
                "n_members": g["n_members"].astype(np.int64),
            }
        )

    def by_cluster(t: pa.Table) -> np.ndarray:
        c = t.column("cluster_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return (hashing.splitmix64(c.view(_U64)) % _U64(n_parts)).astype(np.int32)

    empty = pd.DataFrame(
        {c: pd.Series([], dtype=np.int64) for c in ("doc_id", "n_members")}
    )
    out = hash_partition_apply(
        assign, n_parts, surv, key_fn=by_cluster, empty_like=empty
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------


def _simhash_pairs_ds(sf_dir: str, max_hamming: int = 6) -> rd.Dataset:
    """SimHash near-dup pairs as a Dataset (id_a, id_b, hamming, dropped).

    64-bit SimHash over char-5-gram shingles, 8×8-bit band buckets (complete
    for Hamming ≤ 7 by pigeonhole), exact Hamming verify ≤ ``max_hamming``.
    Pair emission goes through ``IntBucketPairEmitter`` — a degenerate band
    (thousands of empty/templated texts sharing a simhash byte) is capped to
    a salted window ordered by the FULL simhash (near-Hamming neighbors stay
    adjacent) instead of an O(m²) per-bucket cross product, with the dropped
    pair count carried through the dedupe as max (no silent truncation)."""
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])
    n_parts = 32
    n_bands = 8

    def emit(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        flat, offs = char_shingles(batch.column("text"), 5)
        sim = hashing.simhash_signatures(flat, offs)
        keys = hashing.phash_band_keys(sim.view(np.int64), n_bands)
        k = keys.ravel().astype(_U64)
        return pa.table(
            {
                "bucket_key": pa.array(k, type=pa.uint64()),
                "doc_id": pa.array(np.repeat(ids, n_bands), type=pa.int64()),
                "simhash": pa.array(np.repeat(sim, n_bands), type=pa.uint64()),
                "_part": pa.array(
                    (hashing.splitmix64(k) % _U64(n_parts)).astype(np.int32),
                    type=pa.int32(),
                ),
            }
        )

    from bibexpy_ray.stages.shuffle import hash_partition_apply

    emitter = IntBucketPairEmitter(value_col="simhash")
    pairs = hash_partition_apply(
        ds.map_batches(emit, batch_format="pyarrow"),
        n_parts,
        lambda df: emitter(df),
        empty_like=emitter._empty(),
    )

    def hamming_verify(batch: pa.Table) -> pa.Table:
        va = batch.column("val_a").to_numpy(zero_copy_only=False).astype(_U64)
        vb = batch.column("val_b").to_numpy(zero_copy_only=False).astype(_U64)
        h = hashing.hamming64(va, vb).astype(np.int64)
        keep = h <= max_hamming
        t = batch.filter(pa.array(keep))
        return pa.table(
            {
                "id_a": t.column("id_a").cast(pa.int64()),
                "id_b": t.column("id_b").cast(pa.int64()),
                "hamming": pa.array(h[keep], type=pa.int64()),
                "dropped": t.column("dropped").cast(pa.int64()),
            }
        )

    verified = pairs.map_batches(hamming_verify, batch_format="pyarrow")
    # distributed dedupe (a pair surfaces in up to 8 bands; hamming identical
    # across copies, so min == the value; dropped keeps the worst band's count)
    return _dedupe_int_pairs(
        verified, n_parts, agg={"hamming": "min", "dropped": "max"}
    )


def simhash_pairs(sf_dir: str, max_hamming: int = 6) -> pd.DataFrame:
    """SimHash near-dup pairs (query surface): collected + ordered, the
    ``dropped`` bookkeeping column projected away."""
    out = _simhash_pairs_ds(sf_dir, max_hamming).to_pandas()
    out = out[["id_a", "id_b", "hamming"]]
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def simhash_pairs_oracle_sql(max_hamming: int = 6, k: int = 5) -> str:
    """DuckDB oracle for ``simhash_pairs`` — bit-exact.

    Replays the whole chain in SQL: the rolling k-gram hash + SplitMix64
    (``hashing.splitmix64_sql_ctes``, as in the fingerprint oracle), the
    DISTINCT shingle set per document, the majority-bit SimHash (64-way bit
    expansion + per-bit counts; zero-shingle documents get signature 0,
    exactly like the engine), then all-pairs Hamming ≤ ``max_hamming`` via
    ``bit_count(xor(...))``. Valid because the engine's 8×8-bit banding is
    COMPLETE for Hamming ≤ 7 (pigeonhole), so at the default threshold the
    banded pair set equals the all-pairs set (the salted-window cap never
    trips at oracle scales — ``dropped`` is carried and is 0 there)."""
    from bibexpy_ray.functions import hashing as _h

    m64 = 1 << 64
    pows = [pow(_h.GOLDEN_INT, t, m64) for t in range(k)]
    terms = " + ".join(
        f"CAST(unicode(substr(text, CAST(i AS INT) + {j}, 1)) AS HUGEINT)"
        f" * {pows[k - 1 - j]}"
        for j in range(k)
    )
    sm_frag, sm_cte = _h.splitmix64_sql_ctes(
        "g1", "rolled", "hv", ["doc_id", "i"], "sh"
    )
    return (
        "WITH g0 AS (SELECT doc_id, text, "
        f"unnest(range(1, CAST(len(text) AS BIGINT) - {k - 2})) AS i "
        "FROM documents), "
        f"g1 AS (SELECT doc_id, i, CAST(({terms}) % {m64} AS UBIGINT) AS rolled FROM g0), "
        f"{sm_frag}, "
        f"sh AS (SELECT DISTINCT doc_id, hv FROM {sm_cte}), "
        "cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1), "
        "bits AS (SELECT doc_id, b, "
        "SUM(CAST((hv >> CAST(b AS INT)) & 1 AS BIGINT)) AS ones "
        "FROM sh CROSS JOIN (SELECT unnest(range(64)) AS b) t GROUP BY 1, 2), "
        "sig0 AS (SELECT bits.doc_id, "
        "SUM(CASE WHEN 2 * ones > n "
        "THEN CAST(CAST(1 AS UBIGINT) << CAST(b AS INT) AS HUGEINT) "
        "ELSE 0 END) AS sig "
        "FROM bits JOIN cnt USING (doc_id) GROUP BY 1), "
        "sigs AS (SELECT d.doc_id, CAST(coalesce(s.sig, 0) AS UBIGINT) AS sig "
        "FROM documents d LEFT JOIN sig0 s USING (doc_id)) "
        "SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
        "CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming "
        "FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id "
        f"WHERE bit_count(xor(a.sig, b.sig)) <= {max_hamming}"
    )
