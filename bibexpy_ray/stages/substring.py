"""Token-aligned suffix-sort substring pass: contained/expanded-caption pairs.

The reference's Stage-4 partial-metadata match (journal+volume+pages,
/root/reference/apps/api/services/smart_merger.py:309-334) catches records the
primary similarity stage misses; our analog is caption *containment* — one
normalized caption a strict substring of the other. Banded MinHash misses
containment when the length ratio (≈ the Jaccard bound) is low, and the
prefix/suffix blocks miss mid-string insertion, so this pass finds the general
case.

Algorithm per (rare-token) bucket — every member caption contains the bucket's
token ``t``:

  1. emit the suffix ``c[p:]`` of each caption at each occurrence ``p`` of
     ``t`` (first ``OCC_CAP`` occurrences), and sort the suffixes
  2. if short ⊂ long, then at the aligned occurrence of ``t`` the long's
     suffix STARTS WITH the short's first-occurrence suffix — so every
     container of a pattern lies in one contiguous range of the sorted
     suffix list (found by two bisects)
  3. scan the range (capped at ``RANGE_CAP`` per probe) and confirm with an
     exact ``in`` check. Truncated probes stamp a ``dropped`` count onto
     their emitted pairs — an APPROXIMATE upper bound (the unscanned tail
     may contain non-containers), and a probe that truncates before finding
     any pair has no row to carry its count, so the metric under-reports
     that case; it signals *that* truncation happened, not exactly how much

This replaces a per-bucket generalized suffix array (prefix-doubling build,
O(n log² n) on megabytes of concatenated text) with one C-speed sort of the
suffix strings + two bisects per pattern: on a skewed corpus whose rare-token
buckets reach 10-20k captions the hot bucket drops from tens of seconds to
~100 ms, and the result set is identical except where a cap reports drops.

Partitioning assumption (documented per the brief): containment pairs must
share the partition key. We key each caption by its TOP_K largest-hash
tokens — every token of a contained caption survives in its container, so the
pair collides whenever any of the short's top-hash tokens is also among the
long's top-hash tokens (multi-key emission bounds the miss rate without a
global token-frequency pass). Rows shorter than ``contained_min_chars`` never
emit (a container must be strictly longer than any pattern).
"""

from __future__ import annotations

from bisect import bisect_left, bisect_right

import numpy as np
import pandas as pd
import pyarrow as pa

from bibexpy_ray.config import DedupConfig
from bibexpy_ray.functions import hashing

#: keys emitted per caption (see module docstring)
TOP_K = 3
#: suffixes emitted per (caption, token): occurrences of the token beyond this
#: never anchor a probe (templated captions repeating their rare token)
OCC_CAP = 8
#: containers examined per pattern probe; beyond it the dropped count surfaces
#: in the pair stream's ``dropped`` column
RANGE_CAP = 256

#: sentinel above any valid unicode char: upper bisect bound for prefix ranges
_HI = "\U0010ffff"


def emit_rare_token_keys(
    norm, min_chars: int
) -> tuple[np.ndarray, np.ndarray, "pa.Array"]:
    """For each row with ``len >= min_chars`` emit up to TOP_K
    (key, row, token) triples: the TOP_K largest-hash distinct tokens, in
    ascending hash order per row. Returns (keys u64, row indices into the
    input, token Arrow array) flattened.

    Fully vectorized: ONE Arrow split over the batch, ONE flat token hash,
    then a lexsort + segment scan — the per-row-loop version of this kernel
    was the single largest CPU term of the flagship (137 CPU-s at 480k rows,
    ~65% of it per-row numpy/python call overhead).
    """
    import pyarrow.compute as pc

    if not isinstance(norm, (pa.Array, pa.ChunkedArray)):
        norm = pa.array(
            ["" if t is None else t for t in norm], type=pa.large_string()
        )
    if isinstance(norm, pa.ChunkedArray):
        norm = norm.combine_chunks()
    empty = (
        np.array([], dtype=np.uint64),
        np.array([], dtype=np.int64),
        pa.array([], type=pa.large_string()),
    )
    if len(norm) == 0:
        return empty
    norm = pc.fill_null(norm, "")
    lens = pc.utf8_length(norm).to_numpy(zero_copy_only=False)
    keep = np.flatnonzero(lens >= min_chars)
    if keep.size == 0:
        return empty
    split = pc.split_pattern(norm.take(pa.array(keep)), " ")
    counts = pc.list_value_length(split).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(split)
    token_hash = hashing.text_hash_u64(flat)
    row_of = np.repeat(np.arange(keep.size, dtype=np.int64), counts)
    pos = np.arange(token_hash.size, dtype=np.int64)
    # sort by (row, hash, first-occurrence position) then keep the first
    # element of each (row, hash) group == np.unique(th, return_index=True)
    # of the loop version, for every row at once
    order = np.lexsort((pos, token_hash, row_of))
    sr, sh = row_of[order], token_hash[order]
    grp = np.r_[True, (sr[1:] != sr[:-1]) | (sh[1:] != sh[:-1])]
    ur, uh, up = sr[grp], sh[grp], order[grp]
    # per-row segments are hash-ascending; take the last <=TOP_K of each
    starts = np.flatnonzero(np.r_[True, ur[1:] != ur[:-1]])
    ends = np.r_[starts[1:], len(ur)]
    cand = ends[:, None] - np.arange(TOP_K, 0, -1)[None, :]
    sel = cand[cand >= starts[:, None]]
    return uh[sel], keep[ur[sel]], flat.take(pa.array(up[sel]))


def containment_pairs_bucket(
    ids: list,
    texts: list[str],
    token: str,
    cfg: DedupConfig,
    range_cap: int = RANGE_CAP,
    occ_cap: int = OCC_CAP,
) -> pd.DataFrame:
    """One bucket (all captions contain ``token``): emit containment pairs.

    Columns out: id_a, id_b (sorted), dropped (containers skipped past the
    range cap for the probe that emitted this pair).
    """
    empty = pd.DataFrame(
        {
            "id_a": pd.Series([], dtype=object),
            "id_b": pd.Series([], dtype=object),
            "dropped": pd.Series([], dtype=np.int64),
        }
    )
    n = len(texts)
    if n < 2:
        return empty
    # suffix list: (suffix, row) at every occurrence of token (capped)
    sufs: list[tuple[str, int]] = []
    for r, txt in enumerate(texts):
        start = 0
        for _ in range(occ_cap):
            p = txt.find(token, start)
            if p < 0:
                break
            sufs.append((txt[p:], r))
            start = p + 1
    if len(sufs) < 2:
        return empty
    sufs.sort()
    keys = [s for s, _ in sufs]
    pairs: dict[tuple, int] = {}
    min_chars = cfg.contained_min_chars
    for r, txt in enumerate(texts):
        if len(txt) < min_chars:
            continue
        p1 = txt.find(token)
        if p1 < 0:  # pragma: no cover - bucket invariant
            continue
        pat = txt[p1:]
        lo = bisect_left(keys, pat)
        hi = bisect_right(keys, pat + _HI)
        scanned = 0
        dropped = 0
        probe_pairs: list[tuple] = []
        for k in range(lo, hi):
            if scanned >= range_cap:
                dropped = hi - k
                break
            s2, r2 = sufs[k]
            if r2 == r:
                continue
            long_ = texts[r2]
            if len(long_) <= len(txt):
                continue
            scanned += 1
            if txt in long_:
                a, b = (ids[r], ids[r2]) if ids[r] < ids[r2] else (ids[r2], ids[r])
                probe_pairs.append((a, b))
        for key in probe_pairs:
            # the probe's dropped count rides on every pair it DID emit, so
            # truncation surfaces in the pair stream's metrics
            pairs[key] = max(pairs.get(key, 0), dropped)
    if not pairs:
        return empty
    out = pd.DataFrame(
        {
            "id_a": [a for a, _ in pairs],
            "id_b": [b for _, b in pairs],
            "dropped": list(pairs.values()),
        }
    )
    return out


def containment_pairs_partition(part: pd.DataFrame, cfg: DedupConfig) -> pd.DataFrame:
    """Standalone partition entry (tests / no-Dataset callers): key the rows,
    then run each token bucket. Columns in: image_id, _norm_caption."""
    part = (
        part.drop_duplicates(subset=["image_id"])
        .sort_values("image_id")
        .drop_duplicates(subset=["_norm_caption"])
        .reset_index(drop=True)
    )
    ids = part["image_id"].to_numpy(dtype=object)
    norm = part["_norm_caption"].fillna("").tolist()
    keys, rows, toks = emit_rare_token_keys(norm, cfg.contained_min_chars)
    norm_arr = np.asarray(norm, dtype=object)
    df = pd.DataFrame(
        {
            "bucket_key": keys,
            "image_id": ids[rows],
            "token": toks.to_numpy(zero_copy_only=False),
            "_cap": norm_arr[rows],
        }
    )
    outs = []
    for (_, token), g in df.groupby(["bucket_key", "token"], sort=True):
        outs.append(
            containment_pairs_bucket(
                g["image_id"].tolist(), g["_cap"].tolist(), token, cfg
            )
        )
    if not outs:
        return containment_pairs_bucket([], [], "", cfg)
    out = pd.concat(outs, ignore_index=True)
    return (
        out.groupby(["id_a", "id_b"], as_index=False)["dropped"]
        .max()
        .reset_index(drop=True)
    )


#: rows below this count MAY broadcast the caption table instead of shuffling
#: caption payloads. Measured at 480k/32cpu: broadcast 15-25 s vs shuffle
#: 10-11 s — the driver-side Arrow build + per-task take() probes cost more
#: than shuffling the ~130 B/row payload, so the SHUFFLE path is the default
#: at every scale (and the only possible path above the object-store bound);
#: the broadcast variant is kept behind this knob for wide-caption corpora
#: where the payload ratio flips.
CAPTION_BROADCAST_LIMIT = 0


def _dedupe_reps(ids: list, texts: list[str]) -> tuple[list, list[str]]:
    """One representative (min image_id) per distinct caption: equal texts can
    never strictly contain each other, and duplicated captions would make the
    suffix ranges quadratic; content-equal rows merge in the exact pre-pass."""
    best: dict[str, object] = {}
    for i, t in zip(ids, texts):
        cur = best.get(t)
        if cur is None or i < cur:
            best[t] = i
    out_ids = sorted(best.values())
    by_id = {i: t for t, i in best.items()}
    return out_ids, [by_id[i] for i in out_ids]


def containment_candidates(
    features,
    cfg: DedupConfig,
    n_parts: int = 32,
    broadcast_limit: int = CAPTION_BROADCAST_LIMIT,
    gate_ref=None,
):
    """Dataset stage: features (image_id, _norm_caption) -> containment edges
    (id_a, id_b, dropped).

    Rare-token multi-key partitioning (see module docstring); per-bucket
    token-aligned suffix sort in a map_groups. Below ``broadcast_limit`` rows
    the captions broadcast as a uid-sorted Arrow table and the shuffle carries
    only (bucket_key, token, image_id, uid); above it captions ride along.
    """
    import ray

    n_rows = features.count()
    broadcast = n_rows <= broadcast_limit
    cap_ref = None
    if broadcast:
        # uid hashing runs in WORKERS (parallel, warm allocators) — on this
        # class of sandbox a fresh process's first large numpy allocation
        # pays ~25x in page-fault cost, so a driver-side text_hash_u64 over
        # the whole corpus was ~3.5 s of pure serial time; the driver now
        # only argsorts+takes the collected table (C-speed, ~0.1 s)
        def add_uid(b: pa.Table) -> pa.Table:
            u = hashing.text_hash_u64(b.column("image_id"))
            return b.append_column("_cap_uid", pa.array(u, type=pa.uint64()))

        tbl = pa.concat_tables(
            ray.get(
                features.select_columns(["image_id", "_norm_caption"])
                .map_batches(add_uid, batch_format="pyarrow")
                .to_arrow_refs()
            )
        ).combine_chunks()
        uids = tbl.column("_cap_uid").to_numpy(zero_copy_only=False)
        order = np.argsort(uids)
        tbl = tbl.take(pa.array(order)).drop_columns(["_cap_uid"]).combine_chunks()
        cap_ref = ray.put((uids[order], tbl))

    def emit_keys(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keys, rows, toks = emit_rare_token_keys(
            batch.column("_norm_caption"), cfg.contained_min_chars
        )
        rows_idx = pa.array(rows)
        ids_sel = pc.take(batch.column("image_id"), rows_idx)
        if isinstance(ids_sel, pa.ChunkedArray):
            ids_sel = ids_sel.combine_chunks()
        cols = {
            "_part": pa.array(
                (hashing.splitmix64(keys) % np.uint64(n_parts)).astype(np.int32)
                if len(keys)
                else np.array([], dtype=np.int32),
                type=pa.int32(),
            ),
            "bucket_key": pa.array(keys, type=pa.uint64()),
            "token": toks.cast(pa.string()),
            "image_id": ids_sel.cast(pa.string()),
        }
        if broadcast:
            cols["uid"] = pa.array(
                hashing.text_hash_u64(ids_sel)
                if len(rows)
                else np.empty(0, dtype=np.uint64),
                type=pa.uint64(),
            )
        else:
            caps_sel = pc.take(batch.column("_norm_caption"), rows_idx)
            if isinstance(caps_sel, pa.ChunkedArray):
                caps_sel = caps_sel.combine_chunks()
            cols["_norm_caption"] = caps_sel.cast(pa.large_string())
        return pa.table(cols)

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        if broadcast and len(df):
            suids, stbl = ray.get(cap_ref)
            pos = np.minimum(
                np.searchsorted(suids, df["uid"].to_numpy(dtype=np.uint64)),
                len(suids) - 1,
            )
            probed = stbl.take(pa.array(pos))
            ok = (
                probed.column("image_id").to_numpy(zero_copy_only=False)
                == df["image_id"].to_numpy(dtype=object)
            )
            df = df.assign(
                _norm_caption=probed.column("_norm_caption").to_numpy(
                    zero_copy_only=False
                )
            )[ok]
        if gate_ref is not None and len(df):
            # incremental mode: a bucket whose every member is in the base
            # index emits only base-base pairs — all discarded by the pair
            # gate downstream — so drop it before the suffix sort (pure
            # subset of the gate's own discards; output is bit-identical)
            import ray as _ray

            from bibexpy_ray.functions.hashing import in_sorted_u64

            g = _ray.get(gate_ref)
            uid = (
                df["uid"].to_numpy(dtype=np.uint64)
                if "uid" in df.columns
                else hashing.text_hash_u64(df["image_id"].tolist())
            )
            ing = in_sorted_u64(g, uid)
            if ing.all():
                return containment_pairs_bucket([], [], "", cfg)
            if ing.any():
                keys = df["bucket_key"].to_numpy(dtype=np.uint64)
                df = df[np.isin(keys, np.unique(keys[~ing]))]
        outs = []
        for (_, token), g in df.groupby(["bucket_key", "token"], sort=True):
            if len(g) < 2:
                continue
            gids, gtexts = _dedupe_reps(
                g["image_id"].tolist(), g["_norm_caption"].fillna("").tolist()
            )
            if len(gids) < 2:
                continue
            outs.append(containment_pairs_bucket(gids, gtexts, token, cfg))
        if not outs:
            return containment_pairs_bucket([], [], "", cfg)
        out = pd.concat(outs, ignore_index=True)
        return out.groupby(["id_a", "id_b"], as_index=False)["dropped"].max()

    # manual hash shuffle on the precomputed _part column — same colocated
    # buckets as groupby("_part").map_groups without the sort machinery
    from bibexpy_ray.stages.shuffle import hash_partition_apply

    return hash_partition_apply(
        features.map_batches(emit_keys, batch_format="pyarrow"),
        n_parts,
        per_part,
        empty_like=containment_pairs_bucket([], [], "", cfg),
        compress=True,  # bucket rows carry the normalized captions
    )
