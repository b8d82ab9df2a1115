"""LSH candidate generation: band emit -> bucket groupby -> capped pair emit.

The Ray-native analog of the reference's blocking phase
(/root/reference/apps/api/services/smart_merger.py:185-198 build_blocks +
:641-651 per-block candidate cross-product), generalized to MinHash band
buckets + pHash bit-slice buckets + authority/exact-hash buckets.

Skew handling (SURVEY.md §4.3): rows below the min-shingle floor never enter
caption LSH; buckets whose full cross-product exceeds ``bucket_pair_cap`` fall
back to a sorted-by-pHash sliding window (near-pHash pairs — the only ones
that can survive verification in a mega-bucket — remain adjacent), and the
dropped-pair count is recorded per bucket in the metrics side-output.

Only (band_key:uint64, uid:uint64, phash:int64, kind:int8) rows enter the
shuffle — numeric throughout; image bytes and id strings never do.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from bibexpy_ray.config import DedupConfig
from bibexpy_ray.functions import hashing

#: bucket-row provenance: pHash-band pairs get an inline full-Hamming gate at
#: emission (their 16-bit band space saturates at ~65k rows — without the gate
#: candidate volume grows as n²/2^16); caption/prefix/authority pairs must NOT
#: be Hamming-gated (borderline-band pairs have unrelated pixels by design).
KIND_CAPTION = 0
KIND_PREFIX = 1
KIND_PHASH = 2
KIND_AUTHORITY = 3


def emit_caption_band_rows(batch: pa.Table, cfg: DedupConfig) -> pa.Table:
    """(signed batch) -> (bucket_key, image_id) rows for MinHash LSH bands.

    Rows with fewer than ``cfg.min_shingles`` shingles are excluded (degenerate
    captions — the reference's empty-surname catch-all block analog).
    """
    n = batch.num_rows
    n_sh = batch.column("_n_shingles").to_numpy(zero_copy_only=False)
    mh = batch.column("_minhash")
    if isinstance(mh, pa.ChunkedArray):
        mh = mh.combine_chunks()
    if isinstance(mh, pa.ExtensionArray):  # e.g. Ray tensor ext. after a pandas hop
        sig = np.asarray(mh.to_numpy(zero_copy_only=False)).reshape(n, cfg.num_perms)
    else:
        sig = np.asarray(mh.flatten()).reshape(n, cfg.num_perms)
    sig = sig.astype(np.uint64, copy=False)
    keys = hashing.band_keys(sig, cfg.lsh_bands, cfg.lsh_rows)  # (n, bands)
    keep = n_sh >= cfg.min_shingles
    keys = keys[keep]
    uids = batch.column("_uid").to_numpy(zero_copy_only=False).astype(np.uint64)[keep]
    nk = keys.shape[0]
    return pa.table(
        {
            "bucket_key": pa.array(keys.ravel(), type=pa.uint64()),
            "uid": pa.array(np.repeat(uids, cfg.lsh_bands), type=pa.uint64()),
            "phash": pa.array(
                np.repeat(
                    batch.column("phash").to_numpy(zero_copy_only=False)[keep], cfg.lsh_bands
                ),
                type=pa.int64(),
            ),
            "kind": pa.array(
                np.zeros(nk * cfg.lsh_bands, dtype=np.int8), type=pa.int8()
            ),
        }
    )


def emit_phash_band_rows(batch: pa.Table, cfg: DedupConfig) -> pa.Table:
    """(batch with phash) -> (bucket_key, image_id) rows for pHash bit-slices.

    4 bands of 16 bits: complete for Hamming <= 3 (pigeonhole) — the Stage-2
    (pHash-exact / near) candidate generator.
    """
    ph = batch.column("phash").to_numpy(zero_copy_only=False)
    keys = hashing.phash_band_keys(ph, cfg.phash_bands)
    n = len(ph)
    uids = batch.column("_uid").to_numpy(zero_copy_only=False).astype(np.uint64)
    return pa.table(
        {
            "bucket_key": pa.array(keys.ravel(), type=pa.uint64()),
            "uid": pa.array(np.repeat(uids, cfg.phash_bands), type=pa.uint64()),
            "phash": pa.array(np.repeat(ph, cfg.phash_bands), type=pa.int64()),
            "kind": pa.array(
                np.full(n * cfg.phash_bands, KIND_PHASH, dtype=np.int8), type=pa.int8()
            ),
        }
    )


def emit_prefix_rows(batch: pa.Table, cfg: DedupConfig) -> pa.Table:
    """(signed batch) -> (bucket_key, image_id) for the normalized-caption
    prefix block: exact-equality bucket on the first ``prefix_block_chars``
    chars. This is the reference's deterministic blocking key analog
    ((year, surname-initial), smart_merger.py:185-198): borderline-band and
    contained-caption pairs share a long prefix even when their shingle
    Jaccard is too low for banded MinHash, so this block feeds them to the
    verifier deterministically. Captions shorter than the prefix are excluded
    (the empty-key catch-all-block guard)."""
    import pyarrow.compute as pc

    k = cfg.prefix_block_chars
    norm = batch.column("_norm_caption")
    if isinstance(norm, pa.ChunkedArray):
        norm = norm.combine_chunks()
    long_enough = pc.greater_equal(pc.utf8_length(norm), k)
    sub = batch.filter(long_enough)
    if sub.num_rows == 0:
        return pa.table(
            {
                "bucket_key": pa.array([], type=pa.uint64()),
                "uid": pa.array([], type=pa.uint64()),
                "phash": pa.array([], type=pa.int64()),
                "kind": pa.array([], type=pa.int8()),
            }
        )
    prefixes = pc.utf8_slice_codeunits(sub.column("_norm_caption"), 0, k)
    keys = hashing.text_hash_u64(prefixes, seed=23)
    return pa.table(
        {
            "bucket_key": pa.array(keys, type=pa.uint64()),
            "uid": sub.column("_uid").cast(pa.uint64()),
            "phash": sub.column("phash").cast(pa.int64()),
            "kind": pa.array(
                np.full(sub.num_rows, KIND_PREFIX, dtype=np.int8), type=pa.int8()
            ),
        }
    )


def emit_authority_rows(batch: pa.Table, cfg: DedupConfig) -> pa.Table:
    """(signed batch) -> (bucket_key, image_id) for rows carrying an authority id.

    Authority-equal pairs are Stage-1 candidates (DOI-exact analog,
    smart_merger.py:254-265) — bucket key = hash of the authority string.
    """
    mask = batch.column("_authority").is_valid()
    sub = batch.filter(mask)
    if sub.num_rows == 0:
        return pa.table(
            {
                "bucket_key": pa.array([], type=pa.uint64()),
                "uid": pa.array([], type=pa.uint64()),
                "phash": pa.array([], type=pa.int64()),
                "kind": pa.array([], type=pa.int8()),
            }
        )
    keys = hashing.text_hash_u64(sub.column("_authority"), seed=11)
    return pa.table(
        {
            "bucket_key": pa.array(keys, type=pa.uint64()),
            "uid": sub.column("_uid").cast(pa.uint64()),
            "phash": sub.column("phash").cast(pa.int64()),
            "kind": pa.array(
                np.full(sub.num_rows, KIND_AUTHORITY, dtype=np.int8), type=pa.int8()
            ),
        }
    )


class BucketPairEmitter:
    """Vectorized candidate-pair emission over a *hash partition* of bucket rows.

    Ray's ``groupby(key).map_groups`` pays a pandas-group construction per
    bucket — ruinous when buckets number in the millions and average ~1 row.
    Instead the pipeline coarse-partitions rows by ``hash(bucket_key) % P``
    (every bucket lands wholly in one partition) and this callable processes a
    whole partition: sort by key, segment boundaries with one vector compare,
    emit size-2 buckets fully vectorized, loop only over the rare >=3 buckets.

    Hot buckets: full cross-product while |bucket| choose 2 <= cap; beyond the
    cap a sorted-by-pHash sliding window (near-pHash pairs — the only ones that
    can survive verification in a mega-bucket — stay adjacent) plus a
    dropped-pair count column so metrics report truncation (no silent caps).
    """

    def __init__(self, cap: int = 2048, window: int = 8, phash_tol: int = 8):
        self.cap = cap
        self.window = window
        self.phash_tol = phash_tol

    _triu_cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    @classmethod
    def _triu(cls, m: int) -> tuple[np.ndarray, np.ndarray]:
        got = cls._triu_cache.get(m)
        if got is None:
            got = np.triu_indices(m, k=1)
            if len(cls._triu_cache) < 4096:
                cls._triu_cache[m] = got
        return got

    @staticmethod
    def max_full_bucket(cap: int) -> int:
        """Largest bucket size whose full cross-product fits under ``cap``
        (shared by this emitter and docdedup's IntBucketPairEmitter so the
        two caps can't drift)."""
        m = int((1 + np.sqrt(1 + 8 * cap)) // 2)
        while m * (m - 1) // 2 > cap:
            m -= 1
        return m

    def __call__(self, part: pd.DataFrame) -> pd.DataFrame:
        if len(part) == 0:
            return _EMPTY_PAIRS.copy()
        keys = part["bucket_key"].to_numpy()
        ids = part["uid"].to_numpy(dtype=np.uint64)
        ph = part["phash"].to_numpy()
        kinds = (
            part["kind"].to_numpy()
            if "kind" in part.columns
            else np.zeros(len(part), dtype=np.int8)
        )
        order = np.lexsort((ids, keys))
        keys, ids, ph, kinds = keys[order], ids[order], ph[order], kinds[order]
        starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
        ends = np.r_[starts[1:], len(keys)]
        sizes = ends - starts
        tol = self.phash_tol
        # largest bucket size whose full cross-product fits under the cap —
        # everything at or below it is emitted via the size-class path
        m_cap = self.max_full_bucket(self.cap)
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        out_d: list[np.ndarray] = []

        def hamming_keep(a, b, pha, phb, d):
            # inline full-Hamming gate for pHash-band pairs: the 16-bit band
            # space saturates above ~65k rows, so random same-band collisions
            # must die here, before the pair shuffle (see KIND_PHASH note)
            keep = (
                hashing.hamming64(
                    pha.astype(np.int64).view(np.uint64),
                    phb.astype(np.int64).view(np.uint64),
                )
                <= tol
            )
            return a[keep], b[keep], d[keep]

        # size-class vectorization: ONE triu per distinct bucket size (a few
        # dozen values), broadcasting bucket starts against the pair pattern —
        # a per-bucket loop pays ~40 us of numpy call overhead per bucket,
        # which dominates the stage when small (3-10 row) buckets number in
        # the hundreds of thousands. Size-2 falls out as the m=2 class.
        small = (sizes >= 2) & (sizes <= m_cap)
        s_starts = starts[small]
        s_sizes = sizes[small]
        for m in np.unique(s_sizes):
            st = s_starts[s_sizes == m]
            ia, ib = self._triu(int(m))
            idx_a = (st[:, None] + ia[None, :]).ravel()
            idx_b = (st[:, None] + ib[None, :]).ravel()
            a, b = ids[idx_a], ids[idx_b]
            d = np.zeros(len(idx_a), dtype=np.int64)
            gate = np.repeat(kinds[st] == KIND_PHASH, len(ia))
            if gate.any():
                ga, gb, gd = hamming_keep(
                    a[gate], b[gate], ph[idx_a[gate]], ph[idx_b[gate]], d[gate]
                )
                ng = ~gate
                a = np.concatenate([a[ng], ga])
                b = np.concatenate([b[ng], gb])
                d = np.concatenate([d[ng], gd])
            out_a.append(a)
            out_b.append(b)
            out_d.append(d)

        # hot buckets above the cap: sorted-by-pHash sliding window (rare —
        # loop is fine); near-pHash pairs stay adjacent, drops are reported
        for s, e in zip(starts[sizes > m_cap], ends[sizes > m_cap]):
            m = e - s
            n_pairs = m * (m - 1) // 2
            seg_order = np.argsort(ph[s:e], kind="stable")
            seg = ids[s:e][seg_order]
            segp = ph[s:e][seg_order]
            w = self.window
            a = np.concatenate([seg[:-off] for off in range(1, w + 1)])
            b = np.concatenate([seg[off:] for off in range(1, w + 1)])
            d = np.full(len(a), n_pairs - len(a), dtype=np.int64)
            if kinds[s] == KIND_PHASH:
                pha = np.concatenate([segp[:-off] for off in range(1, w + 1)])
                phb = np.concatenate([segp[off:] for off in range(1, w + 1)])
                a, b, d = hamming_keep(a, b, pha, phb, d)
            out_a.append(a)
            out_b.append(b)
            out_d.append(d)
        if not out_a:
            return _EMPTY_PAIRS.copy()
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        return pd.DataFrame({"id_a": lo, "id_b": hi, "dropped": np.concatenate(out_d)})


_EMPTY_PAIRS = pd.DataFrame(
    {
        "id_a": pd.Series([], dtype=np.uint64),
        "id_b": pd.Series([], dtype=np.uint64),
        "dropped": pd.Series([], dtype=np.int64),
    }
)


def dedupe_pairs(pairs_ds, num_partitions: int):
    """Distinct (id_a, id_b) with max(dropped) — hash-partitioned.

    Ray's multi-column string-key ``groupby().max()`` is a sort-based aggregate
    with per-group overhead (66 s for 170 k rows measured); partitioning by a
    hash of the pair and deduplicating with a vectorized pandas pass inside each
    partition is ~50x faster and shuffles the same bytes exactly once.
    """
    def add_part(batch: pa.Table) -> pa.Table:
        a = batch.column("id_a").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = batch.column("id_b").to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            k = hashing.splitmix64(a * np.uint64(1_000_003) ^ b)
        part = (k % np.uint64(num_partitions)).astype(np.int32)
        return batch.append_column("_part", pa.array(part, type=pa.int32()))

    def dedupe(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values("dropped", ascending=False, kind="mergesort")
        out = part.drop_duplicates(subset=["id_a", "id_b"], keep="first")
        return out[["id_a", "id_b", "dropped"]]

    return (
        pairs_ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(dedupe, batch_format="pandas")
    )


def dedupe_pairs_manual(pairs_ds, num_partitions: int):
    """``dedupe_pairs`` via the manual hash shuffle (stages/shuffle.py).

    The per-partition function is a pure vectorized sort+drop_duplicates, so
    the sort-based groupby's sampling/range-partition coordination dominates
    its wall time — the manual split/reduce shuffle runs the same reduce 4x
    faster (measured at a 21.8M-row pair stream, 32 CPUs: 4.5 s vs 18 s).
    Input should be materialized (the flagship pins the pair stream anyway).
    """
    from bibexpy_ray.stages.shuffle import hash_partition_apply

    # size P to the pair volume, not the CPU count: with B input blocks the
    # shuffle creates B x P objects, and at small volumes that bookkeeping IS
    # the wall time (measured flat ~3.4 s at 2M pairs / P=64 regardless of
    # CPUs). ~250k rows per reduce keeps the vectorized drop_duplicates cheap
    # while the object count stays O(B x volume/250k) — grows with data, as a
    # shuffle's map-side output must.
    n_pairs = pairs_ds.count()
    num_partitions = max(8, min(int(num_partitions), n_pairs // 250_000 + 1))

    def pair_key(batch: pa.Table) -> np.ndarray:
        a = batch.column("id_a").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = batch.column("id_b").to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            k = hashing.splitmix64(a * np.uint64(1_000_003) ^ b)
        return (k % np.uint64(num_partitions)).astype(np.int32)

    empty = pa.table(
        {
            "id_a": pa.array([], pa.uint64()),
            "id_b": pa.array([], pa.uint64()),
            "dropped": pa.array([], pa.int64()),
        }
    )

    def dedupe(part: pa.Table) -> pa.Table:
        # arrow-mode lexsort dedupe: one lexsort + one adjacent-diff mask,
        # keeping the max `dropped` per pair. The previous pandas
        # sort_values + drop_duplicates did ~3x the memory passes — on a
        # DRAM-bandwidth-limited host that was THE scaling ceiling of this
        # stage (4M rows, 2->8 CPUs: the pandas reduce ran slower at 8).
        if part.num_rows == 0:
            return empty
        a = part.column("id_a").to_numpy(zero_copy_only=False).astype(np.uint64, copy=False)
        b = part.column("id_b").to_numpy(zero_copy_only=False).astype(np.uint64, copy=False)
        d = part.column("dropped").to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        order = np.lexsort((-d, b, a))  # primary a, then b, then dropped desc
        a2, b2 = a[order], b[order]
        first = np.empty(len(order), dtype=bool)
        first[0] = True
        np.not_equal(a2[1:], a2[:-1], out=first[1:])
        first[1:] |= b2[1:] != b2[:-1]
        keep = order[first]
        return pa.table(
            {
                "id_a": pa.array(a[keep]),
                "id_b": pa.array(b[keep]),
                "dropped": pa.array(d[keep]),
            }
        )

    # key_fn fuses the partition tagging into the split task itself — no
    # separate tagging map pass, no extra object-store copy of the pair
    # stream; rows_per_block re-splits the few large reduce outputs so the
    # downstream verify task-pool still sees enough blocks for every CPU
    return hash_partition_apply(
        pairs_ds, num_partitions, dedupe, key_fn=pair_key,
        rows_per_block=16384, empty_like=empty, arrow=True,
    )


def add_coarse_partition(batch: pa.Table, key: str, num_partitions: int) -> pa.Table:
    """Append ``_part = hash(key) % P`` — the explicit hash-partitioning column
    for coarse groupby (whole buckets colocate; P bounds group count)."""
    k = batch.column(key).to_numpy(zero_copy_only=False).astype(np.uint64, copy=False)
    part = (hashing.splitmix64(k) % np.uint64(num_partitions)).astype(np.int32)
    return batch.append_column("_part", pa.array(part, type=pa.int32()))
