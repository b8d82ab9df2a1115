"""Vectorized hashing kernels: shingles, MinHash, SimHash, band keys.

All kernels operate on whole Arrow/numpy batches — never per Python row — so a
``map_batches(..., batch_format="pyarrow")`` stage stays zero-copy and vectorized.
Everything is deterministic (fixed seeds, no process-salted ``hash()``) so Ray task
retries reproduce identical signatures (required for lineage reconstruction).

Shingle model: UTF-8 *byte* k-grams of the normalized text. Signature config
(char 5-grams, 128 permutations, 64-bit SimHash) is mandated by BASELINE.json and
mirrors the reference's fixed-config reproducibility stance
(/root/reference/apps/api/services/smart_merger.py:36-41).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_U64 = np.uint64
_GOLDEN = _U64(0x9E3779B97F4A7C15)
_MIX1 = _U64(0xBF58476D1CE4E5B9)
_MIX2 = _U64(0x94D049BB133111EB)

# numpy intentionally wraps uint64 arithmetic; silence the overflow warnings once.
_ERR = {"over": "ignore"}


def splitmix64(x: np.ndarray | int) -> np.ndarray | np.uint64:
    """SplitMix64 finalizer — a strong 64-bit bit mixer (public domain algorithm)."""
    with np.errstate(**_ERR):
        z = (np.asarray(x, dtype=_U64) + _GOLDEN) if np.isscalar(x) else x.astype(_U64) + _GOLDEN
        z = (z ^ (z >> _U64(30))) * _MIX1
        z = (z ^ (z >> _U64(27))) * _MIX2
        z = z ^ (z >> _U64(31))
    return z if isinstance(z, np.ndarray) else _U64(z)


_M64 = (1 << 64) - 1

#: the same constants as Python ints, for SQL-oracle generation
GOLDEN_INT = 0x9E3779B97F4A7C15
MIX1_INT = 0xBF58476D1CE4E5B9
MIX2_INT = 0x94D049BB133111EB


def modmul_sql(a_expr: str, b: int) -> str:
    """DuckDB SQL for ``(a · b) mod 2⁶⁴`` with ``a`` a UBIGINT expression and
    ``b`` a 64-bit constant. HUGEINT (int128) can't hold a full 64×64 product,
    so split ``a`` at 32 bits: ``a·b ≡ al·b + ((ah·b mod 2³²) << 32)`` — every
    intermediate stays under 2⁹⁷."""
    a = f"CAST({a_expr} AS HUGEINT)"
    return (
        f"CAST(((({a}) % 4294967296) * {b} + "
        f"(((({a}) // 4294967296) * {b}) % 4294967296) * 4294967296) "
        f"% 18446744073709551616 AS UBIGINT)"
    )


def splitmix64_sql_ctes(
    src_cte: str, x_expr: str, out_col: str, carry: list[str], prefix: str
) -> tuple[str, str]:
    """Generate chained-CTE DuckDB SQL computing ``out_col =
    splitmix64(x_expr)`` over rows of ``src_cte``, bit-identical to the
    vectorized ``splitmix64`` (verified value-for-value in
    tests/test_textstats.py). Staged CTEs instead of one nested expression:
    each splitmix round references its input twice, so full inlining grows
    exponentially. Returns ``(cte_fragment, final_cte_name)`` — append the
    fragment after a ``WITH`` clause (comma-joined) and select from the
    final CTE. ``carry`` columns pass through every stage."""
    c = "".join(f"{col}, " for col in carry)
    m64 = 1 << 64
    z0 = f"CAST((CAST({x_expr} AS HUGEINT) + {GOLDEN_INT}) % {m64} AS UBIGINT)"
    z1 = modmul_sql("xor(z0, z0 >> 30)", MIX1_INT)
    z2 = modmul_sql("xor(z1, z1 >> 27)", MIX2_INT)
    p = prefix
    frag = (
        f"{p}_s0 AS (SELECT {c}{z0} AS z0 FROM {src_cte}), "
        f"{p}_s1 AS (SELECT {c}{z1} AS z1 FROM {p}_s0), "
        f"{p}_s2 AS (SELECT {c}{z2} AS z2 FROM {p}_s1), "
        f"{p}_sm AS (SELECT {c}xor(z2, z2 >> 31) AS {out_col} FROM {p}_s2)"
    )
    return frag, f"{p}_sm"


def ubigint_as_bigint_sql(expr: str) -> str:
    """DuckDB SQL reinterpreting a UBIGINT expression as two's-complement
    BIGINT (the SQL analog of ``np.uint64.view(np.int64)``)."""
    return (
        f"CAST(CASE WHEN ({expr}) >= 9223372036854775808 "
        f"THEN CAST(({expr}) AS HUGEINT) - 18446744073709551616 "
        f"ELSE CAST(({expr}) AS HUGEINT) END AS BIGINT)"
    )


def hash_u64(x: int) -> int:
    """Deterministic 64-bit hash of a Python int (pure-python SplitMix64 —
    bit-identical to the vectorized ``splitmix64``)."""
    z = (x + 0x9E3779B97F4A7C15) & _M64
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _M64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _M64
    return z ^ (z >> 31)


def hash_bytes_u64(data: bytes, seed: int = 0) -> int:
    """Deterministic 64-bit hash of a byte string (FNV-1a core + splitmix finalize)."""
    h = _U64(0xCBF29CE484222325) ^ _U64(seed & 0xFFFFFFFFFFFFFFFF)
    prime = _U64(0x100000001B3)
    with np.errstate(**_ERR):
        for b in data:
            h = (h ^ _U64(b)) * prime
    return int(splitmix64(np.array([h], dtype=_U64))[0])


def _string_flat_view(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Return (flat utf8 byte buffer, int64 offsets) for an Arrow string array.

    Nulls are treated as empty strings. Handles chunked arrays and array offsets.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = arr.cast(pa.large_string())
    if arr.null_count:
        arr = arr.fill_null("")
    # After cast+fill_null the array may still carry a slice offset.
    buffers = arr.buffers()
    offsets_all = np.frombuffer(buffers[1], dtype=np.int64)
    offs = offsets_all[arr.offset : arr.offset + len(arr) + 1]
    data = np.frombuffer(buffers[2], dtype=np.uint8) if buffers[2] is not None else np.empty(0, np.uint8)
    return data, offs.astype(np.int64, copy=False)


def shingle_hashes(texts: pa.Array | list[str], k: int = 5) -> tuple[np.ndarray, np.ndarray]:
    """Char (byte) k-gram shingle hashes for a batch of strings, fully vectorized.

    Returns ``(flat, row_offsets)`` where ``flat`` is a uint64 array of shingle
    hashes for all rows concatenated and ``row_offsets`` (len = nrows+1) delimits
    each row's slice. Rows shorter than ``k`` bytes produce zero shingles.

    Implementation: one rolling polynomial hash over the batch's flat UTF-8
    buffer, then a vectorized gather of the window positions that do not cross a
    row boundary, then a SplitMix64 finalize.
    """
    if not isinstance(texts, (pa.Array, pa.ChunkedArray)):
        texts = pa.array(texts, type=pa.large_string())
    data, offs = _string_flat_view(texts)
    nrows = len(offs) - 1
    starts = offs[:-1]
    # valid window starts for row r: [offs[r], offs[r+1]-k] inclusive
    ends = np.maximum(starts, offs[1:] - (k - 1))
    counts = ends - starts
    row_offsets = np.zeros(nrows + 1, dtype=np.int64)
    np.cumsum(counts, out=row_offsets[1:])
    total = int(row_offsets[-1])
    if total == 0 or data.size < k:
        return np.empty(0, dtype=_U64), row_offsets

    n_windows = data.size - k + 1
    with np.errstate(**_ERR):
        rolled = np.zeros(n_windows, dtype=_U64)
        mult = _U64(1)
        # Horner from the last byte of the window backwards: k vector ops total.
        for j in range(k - 1, -1, -1):
            rolled += data[j : j + n_windows].astype(_U64) * mult
            mult = mult * _GOLDEN
    # Gather valid (non-boundary-crossing) window positions per row.
    idx = np.repeat(starts, counts) + (np.arange(total, dtype=np.int64) - np.repeat(row_offsets[:-1], counts))
    return splitmix64(rolled[idx]), row_offsets


def unique_per_row(flat: np.ndarray, row_offsets: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Deduplicate hash values within each row segment (vectorized, sort-based).

    Returns new ``(flat, row_offsets)`` where each row's slice is its *set* of
    values (sorted ascending — order within a row is irrelevant downstream).
    """
    nrows = len(row_offsets) - 1
    if flat.size == 0:
        return flat, row_offsets
    row_ids = np.repeat(np.arange(nrows, dtype=np.int64), np.diff(row_offsets))
    order = np.lexsort((flat, row_ids))
    f = flat[order]
    r = row_ids[order]
    keep = np.ones(f.size, dtype=bool)
    keep[1:] = (f[1:] != f[:-1]) | (r[1:] != r[:-1])
    f, r = f[keep], r[keep]
    new_counts = np.bincount(r, minlength=nrows)
    new_offsets = np.zeros(nrows + 1, dtype=np.int64)
    np.cumsum(new_counts, out=new_offsets[1:])
    return f, new_offsets


def minhash_signatures(
    flat: np.ndarray,
    row_offsets: np.ndarray,
    num_perms: int = 128,
    seed: int = 42,
) -> np.ndarray:
    """128-permutation MinHash signatures over per-row shingle-hash sets.

    Permutation j is multiplication by a seed-derived odd constant — an exact
    bijection of the u64 domain (an odd multiplier is invertible mod 2^64), so
    the min over a row's mapped shingles is a valid MinHash sample. Returns a
    ``(nrows, num_perms)`` uint64 matrix; rows with zero shingles get the
    sentinel ``uint64 max`` (callers must exclude them from LSH — the
    min-shingle floor).

    One 1-D multiply + 1-D ``minimum.reduceat`` per permutation: peak extra
    memory is a single nshingles-sized temporary, and the ~35x speedup over a
    2-D salted-mix formulation comes entirely from avoiding (nshingles x
    perm_chunk) temporaries (memory-bandwidth-bound kernel).
    """
    nrows = len(row_offsets) - 1
    sig = np.full((nrows, num_perms), np.iinfo(np.uint64).max, dtype=_U64)
    if flat.size == 0 or nrows == 0:
        return sig
    counts = np.diff(row_offsets)
    nz = counts > 0
    seg_starts = row_offsets[:-1][nz]
    with np.errstate(**_ERR):
        seed_base = _U64(seed & 0xFFFFFFFFFFFFFFFF) * _GOLDEN
        mults = splitmix64(np.arange(num_perms, dtype=_U64) + seed_base) | _U64(1)
        col = np.empty(int(nz.sum()), dtype=_U64)
        for j in range(num_perms):
            mixed = flat * mults[j]
            np.minimum.reduceat(mixed, seg_starts, out=col)
            sig[nz, j] = col
    return sig


def simhash_signatures(flat: np.ndarray, row_offsets: np.ndarray) -> np.ndarray:
    """64-bit SimHash per row from shingle hashes (frequency-weighted).

    bit_i(sig) = 1 iff sum over shingles of (2*bit_i(h) - 1) > 0. Rows with no
    shingles get 0. Returns uint64 array of length nrows.
    """
    nrows = len(row_offsets) - 1
    out = np.zeros(nrows, dtype=_U64)
    if flat.size == 0 or nrows == 0:
        return out
    counts = np.diff(row_offsets)
    nz = counts > 0
    seg_starts = row_offsets[:-1][nz]
    seg_counts = counts[nz]
    # per-bit 1-D pass (bit set in > half the shingles ⇒ signature bit 1);
    # avoids the (nshingles x 64) temporary of the 2-D formulation
    packed = np.zeros(int(nz.sum()), dtype=_U64)
    ones = np.empty(int(nz.sum()), dtype=np.int64)
    with np.errstate(**_ERR):
        for b in range(64):
            bit = ((flat >> _U64(b)) & _U64(1)).astype(np.int64)
            np.add.reduceat(bit, seg_starts, out=ones)
            packed |= ((2 * ones > seg_counts).astype(_U64)) << _U64(b)
    out[nz] = packed
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Elementwise Hamming distance between two uint64 arrays (vectorized popcount)."""
    x = (np.asarray(a, dtype=_U64) ^ np.asarray(b, dtype=_U64)).view(np.uint8)
    return np.unpackbits(x.reshape(-1, 8), axis=1).sum(axis=1).astype(np.int32)


def band_keys(sig: np.ndarray, bands: int, rows: int, band_seed: int = 7) -> np.ndarray:
    """LSH band keys: hash each band's r signature values into one uint64 key.

    Returns ``(nrows, bands)`` uint64 where key = mix of (band index, the r
    values). Two rows share a band key iff their signatures agree on that band's
    rows (up to 64-bit hash collisions).
    """
    n, p = sig.shape
    assert bands * rows == p, "bands*rows must equal signature width"
    with np.errstate(**_ERR):
        acc = np.zeros((n, bands), dtype=_U64)
        grouped = sig.reshape(n, bands, rows)
        for j in range(rows):
            acc = splitmix64(acc ^ grouped[:, :, j])
        band_ids = splitmix64(np.arange(bands, dtype=_U64) + _U64(band_seed))
        acc = splitmix64(acc ^ band_ids[None, :])
    return acc


def phash_band_keys(phash: np.ndarray, bands: int = 4) -> np.ndarray:
    """Band keys over a 64-bit perceptual hash: ``bands`` equal bit-slices.

    With 4 bands of 16 bits, any pair at Hamming distance <= 3 is *guaranteed*
    to share at least one intact band (pigeonhole), so exact-bucket grouping on
    these keys is a complete candidate generator for Hamming <= 3.
    """
    ph = np.asarray(phash).astype(np.int64).view(_U64)
    width = 64 // bands
    mask = _U64((1 << width) - 1)
    out = np.empty((ph.size, bands), dtype=_U64)
    with np.errstate(**_ERR):
        for b in range(bands):
            chunk = (ph >> _U64(b * width)) & mask
            out[:, b] = splitmix64(chunk ^ splitmix64(np.full(ph.size, b + 101, dtype=_U64)))
    return out


#: rows per internal chunk for large text_hash_u64 inputs. Bounding the flat
#: temporaries to a fixed, repeated size lets the allocator serve every chunk
#: after the first from warm heap pages — on this sandbox a FIRST touch of a
#: fresh page costs ~25x a warm write, so one unchunked multi-hundred-MB pass
#: on a cold heap (e.g. the driver's label build) measured 4.5 s vs 0.3 s.
_HASH_CHUNK_ROWS = 65536


def text_hash_u64(texts: pa.Array | list[str], seed: int = 0) -> np.ndarray:
    """Deterministic 64-bit content hash per string (vectorized).

    Used for exact-dedup keys. Polynomial hash over the full byte string with
    per-position golden-ratio powers, then SplitMix64 finalize. Empty/null
    strings hash to splitmix64(seed). Inputs beyond ``_HASH_CHUNK_ROWS`` are
    processed in fixed-size chunks (identical per-row results — the hash has
    no cross-row state).
    """
    if not isinstance(texts, (pa.Array, pa.ChunkedArray)):
        texts = pa.array(texts, type=pa.large_string())
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if len(texts) > _HASH_CHUNK_ROWS:
        return np.concatenate(
            [
                text_hash_u64(texts.slice(lo, _HASH_CHUNK_ROWS), seed)
                for lo in range(0, len(texts), _HASH_CHUNK_ROWS)
            ]
        )
    data, offs = _string_flat_view(texts)
    if len(offs) and (offs[0] != 0 or offs[-1] != data.size):
        # sliced array: window the flat buffer so positions are chunk-local
        data = data[offs[0] : offs[-1]]
        offs = offs - offs[0]
    nrows = len(offs) - 1
    lengths = np.diff(offs)
    with np.errstate(**_ERR):
        if data.size:
            pows = np.empty(data.size, dtype=_U64)
            # position within row: global position minus row start
            pos = np.arange(data.size, dtype=np.int64) - np.repeat(offs[:-1], lengths)
            # golden^pos via cumulative product per row is costly; use mix(pos)^byte scheme:
            pows = splitmix64(pos.astype(_U64) ^ _U64(seed & 0xFFFFFFFFFFFFFFFF) * _GOLDEN)
            terms = splitmix64(data.astype(_U64) * _GOLDEN ^ pows)
            sums = np.zeros(nrows, dtype=_U64)
            nz = lengths > 0
            if nz.any():
                sums[nz] = np.add.reduceat(terms, offs[:-1][nz])
        else:
            sums = np.zeros(nrows, dtype=_U64)
        out = splitmix64(sums ^ splitmix64(lengths.astype(_U64) + _U64(seed & 0xFFFFFFFFFFFFFFFF)))
    return out


def in_sorted_u64(sorted_arr: np.ndarray, values: np.ndarray) -> np.ndarray:
    """Vectorized membership probe of ``values`` against a SORTED uint64
    array (searchsorted + equality check). The standard probe for the
    broadcast uid gates (incremental pair gate, loser filters)."""
    if len(sorted_arr) == 0:
        return np.zeros(len(values), dtype=bool)
    v = np.asarray(values, dtype=np.uint64)
    i = np.minimum(np.searchsorted(sorted_arr, v), len(sorted_arr) - 1)
    return sorted_arr[i] == v
