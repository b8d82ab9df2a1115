"""Suffix-array substring pass: contained/expanded-caption candidate pairs.

The reference's Stage-4 partial-metadata match (journal+volume+pages,
/root/reference/apps/api/services/smart_merger.py:309-334) catches records the
primary similarity stage misses; our analog is caption *containment* — one
normalized caption a strict substring of the other. Banded MinHash misses
containment when the length ratio (≈ the Jaccard bound) is low, and the
prefix/suffix blocks miss mid-string insertion, so this pass finds the general
case: a per-partition generalized suffix array over the short-side captions.

Algorithm per hash partition (all captions colocate by a coarse key):
  1. candidates to be *contained* (short side): captions with
     ``contained_min_chars ≤ len < max_contained_len``
  2. build one concatenated text of the long side with sentinel separators and
     its suffix array (numpy argsort of suffix ranks — O(n log² n))
  3. binary-search each short caption against the suffix array; an occurrence
     inside a *different* row's caption emits a candidate edge

Partitioning assumption (documented per the brief): containment pairs must
share the partition key. We partition by a *rare-token* key — the least
frequent-hash token of the normalized caption — which both sides of a
containment pair share whenever the contained text's rarest token survives in
the container (always true for substring containment: every token of the short
caption appears in the long one). Rows with no tokens are excluded (they are
below ``contained_min_chars`` anyway).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from bibexpy_ray.config import DedupConfig
from bibexpy_ray.functions import hashing

#: cap on per-partition text size before the window fallback kicks in
MAX_PART_TEXT = 64 << 20


#: keys emitted per caption: the TOP_K largest-hash tokens. Both sides of a
#: containment pair share every token of the short side, so they collide on a
#: key whenever any of the short side's top-hash tokens is also among the long
#: side's top-hash tokens — multi-key emission bounds the miss rate without a
#: global token-frequency pass.
TOP_K = 3


def emit_rare_token_keys(
    ids: np.ndarray, norm: list[str], min_chars: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """For each row emit up to TOP_K (key, id) pairs: hashes of the TOP_K
    largest-hash tokens. Returns (keys, row_ids, lengths) flattened."""
    out_keys: list[int] = []
    out_ids: list = []
    out_len: list[int] = []
    for i, text in enumerate(norm):
        if len(text) < min_chars:
            continue
        toks = text.split(" ")
        th = hashing.text_hash_u64(toks)
        top = np.sort(np.unique(th))[-TOP_K:]
        for k in top:
            out_keys.append(int(k))
            out_ids.append(ids[i])
            out_len.append(len(text))
    return (
        np.array(out_keys, dtype=np.uint64),
        np.array(out_ids, dtype=object),
        np.array(out_len, dtype=np.int64),
    )


def _suffix_array(s: np.ndarray) -> np.ndarray:
    """Suffix array of a uint8 text via prefix-doubling (numpy lexsort rounds)."""
    n = len(s)
    rank = s.astype(np.int64)
    sa = np.argsort(rank, kind="stable")
    k = 1
    tmp = np.empty(n, dtype=np.int64)
    while k < n:
        key2 = np.full(n, -1, dtype=np.int64)
        key2[: n - k] = rank[k:]
        order = np.lexsort((key2, rank))
        tmp[order[0]] = 0
        prev = order[:-1]
        cur = order[1:]
        newgroup = (rank[cur] != rank[prev]) | (key2[cur] != key2[prev])
        tmp[cur] = np.cumsum(newgroup)
        rank, sa = tmp.copy(), order
        if rank[sa[-1]] == n - 1:
            break
        k *= 2
    return sa


def containment_pairs_partition(part: pd.DataFrame, cfg: DedupConfig) -> pd.DataFrame:
    """One hash partition of (image_id, _norm_caption): emit candidate
    containment edges via a generalized suffix array.

    Columns in: image_id, _norm_caption. Out: id_a, id_b (short in long).
    """
    empty = pd.DataFrame(
        {"id_a": pd.Series([], dtype=object), "id_b": pd.Series([], dtype=object)}
    )
    if len(part) < 2:
        return empty
    # one representative per distinct caption: equal-length texts can never be
    # in strict containment, and duplicated captions (e.g. a hot templated
    # caption) would otherwise make every pattern's occurrence list quadratic.
    # Rows sharing a caption AND content merge in the exact pre-pass instead.
    part = (
        part.drop_duplicates(subset=["image_id"])
        .sort_values("image_id")
        .drop_duplicates(subset=["_norm_caption"])
        .reset_index(drop=True)
    )
    if len(part) < 2:
        return empty
    texts = part["_norm_caption"].fillna("").tolist()
    ids = part["image_id"].to_numpy(dtype=object)
    lens = np.array([len(t) for t in texts])
    ok = lens >= cfg.contained_min_chars
    if ok.sum() < 2:
        return empty
    # concatenated text with '\x00' sentinels; map positions -> row
    pieces, row_of_pos = [], []
    for i in np.flatnonzero(ok):
        pieces.append(texts[i])
        row_of_pos.append(np.full(len(texts[i]) + 1, i, dtype=np.int64))
    text = "\x00".join(pieces) + "\x00"
    buf = np.frombuffer(text.encode("utf-8", "ignore"), dtype=np.uint8)
    pos_row = np.concatenate(row_of_pos)[: len(buf)]
    if len(buf) > MAX_PART_TEXT:  # pragma: no cover - skew guard
        return empty
    sa = _suffix_array(buf)
    text_bytes = buf.tobytes()
    n_suf = len(sa)

    # binary search each short caption over the suffix array (bytes slicing —
    # a prefix-key searchsorted variant was measured 4.6x SLOWER end-to-end:
    # its per-bucket key-matrix build dominates when buckets are small/many)
    def occurrences(pb: bytes) -> list[int]:
        lp = len(pb)
        lo, hi = 0, n_suf
        while lo < hi:
            mid = (lo + hi) // 2
            pos = int(sa[mid])
            if text_bytes[pos : pos + lp] < pb:
                lo = mid + 1
            else:
                hi = mid
        start = lo
        hi = n_suf
        while lo < hi:
            mid = (lo + hi) // 2
            pos = int(sa[mid])
            if text_bytes[pos : pos + lp] == pb or text_bytes[pos : pos + lp] < pb:
                lo = mid + 1
            else:
                hi = mid
        return [int(sa[k]) for k in range(start, lo)]

    rows_a, rows_b = [], []
    for i in np.flatnonzero(ok):
        pat = texts[i]
        pb = pat.encode("utf-8", "ignore")
        for pos in occurrences(pb):
            if text_bytes[pos : pos + len(pb)] != pb:
                continue
            j = int(pos_row[pos])
            if j == i:
                continue
            if len(texts[j]) <= len(pat):
                continue  # only strict containment (short in longer)
            a, b = (ids[i], ids[j]) if ids[i] < ids[j] else (ids[j], ids[i])
            rows_a.append(a)
            rows_b.append(b)
    if not rows_a:
        return empty
    out = pd.DataFrame({"id_a": rows_a, "id_b": rows_b}).drop_duplicates()
    return out.reset_index(drop=True)


def containment_candidates(features, cfg: DedupConfig, n_parts: int = 32):
    """Dataset stage: features (image_id, _norm_caption) -> containment edges.

    Rare-token multi-key partitioning (see module docstring); per-partition
    generalized suffix array in a map_groups. Returns a Dataset of (id_a, id_b).
    """

    def emit_keys(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("image_id").to_pylist(), dtype=object)
        norm = batch.column("_norm_caption").to_pylist()
        keys, row_ids, _ = emit_rare_token_keys(ids, norm, cfg.contained_min_chars)
        caps = {i: n for i, n in zip(ids, norm)}
        return pa.table(
            {
                "_part": pa.array(
                    (hashing.splitmix64(keys) % np.uint64(n_parts)).astype(np.int32)
                    if len(keys)
                    else np.array([], dtype=np.int32),
                    type=pa.int32(),
                ),
                "bucket_key": pa.array(keys, type=pa.uint64()),
                "image_id": pa.array(list(row_ids), type=pa.string()),
                "_norm_caption": pa.array(
                    [caps[i] for i in row_ids], type=pa.large_string()
                ),
            }
        )

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        # group by bucket_key within the partition: suffix arrays stay small
        outs = [
            containment_pairs_partition(g, cfg)
            for _, g in df.groupby("bucket_key")
            if len(g) >= 2
        ]
        if not outs:
            return containment_pairs_partition(df.iloc[:0], cfg)
        return pd.concat(outs, ignore_index=True).drop_duplicates()

    return (
        features.map_batches(emit_keys, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(per_part, batch_format="pandas")
    )
