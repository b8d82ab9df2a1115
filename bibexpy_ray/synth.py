"""Deterministic synthetic image+caption corpus with known ground truth.

Generates the FIXTURES.md §1 table: every block of 12 consecutive rows (a
"cohort") contains one original plus the duplicate classes mirroring the
reference's match stages (smart_merger.py:243-350):

  off 0  original base row (png)
  off 1  exact duplicate of base   — same caption + pixels      -> exact pre-pass
  off 2  re-encoded duplicate      — same caption, fake-jpeg    -> Stage 3 (sim=1, small pHash drift)
  off 3  near-duplicate caption    — tiny tail edit, same pixels-> Stage 3 (JW >= 0.92)
  off 4  secondary-key duplicate   — unrelated caption, IDENTICAL pixels -> Stage 2 (pHash exact)
  off 5  contained caption         — base caption + suffix, same pixels  -> Stage 4 (containment)
  off 6  borderline                — JW in [0.80, 0.92) vs base -> borderline queue only
  off 7  authority pair A          — authority id '#k<d>' shared with off 8 -> Stage 1
  off 8  authority pair B          — same '#k<d>', unrelated caption/pixels
  off 9  negative pair A           — authority '#na<d>', caption Z
  off 10 negative pair B           — authority '#nb<d>', caption ~Z (JW>=0.92), same pixels
         -> negative rule rejects; both singletons, never borderline
  off 11 skew stressor             — even cohorts: a globally shared templated
         caption with unique pixels (hot LSH bucket, must NOT merge);
         odd cohorts: a caption shorter than the shingle width (min-shingle floor)

Ground-truth clusters per cohort d: {0,1,2,3,4,5}, {7,8}, singletons {6},{9},{10},{11};
expected borderline pair (12d+0, 12d+6).

Everything is derived from splitmix64 counters on (seed, cohort, ...) — no RNG
state, so generation is order-free and shardable across Ray tasks.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from bibexpy_ray import codecs
from bibexpy_ray.config import STOPWORDS
from bibexpy_ray.functions.hashing import hash_u64
from bibexpy_ray.functions.normalize import normalize_text
from bibexpy_ray.functions.similarity import jaro_winkler
from bibexpy_ray.schema import IMAGE_SCHEMA

COHORT = 12
HOT_CAPTION = "generic stock template scene picture frame"
_IMG_SIZE = 64


def _vocab(seed: int, size: int = 512) -> list[str]:
    """Deterministic pseudo-word vocabulary, guaranteed stopword-free, normalize-stable."""
    words = []
    i = 0
    while len(words) < size:
        h = hash_u64(seed * 1_000_003 + i)
        length = 4 + (h % 6)
        w = "".join(chr(ord("a") + ((h >> (5 * (j + 1))) % 26)) for j in range(length))
        if w not in STOPWORDS:
            words.append(w)
        i += 1
    return words


class CorpusGen:
    """Callable batch generator: maps a batch of row indices to corpus rows.

    Usable directly (``gen.rows(range(n))``) or as a Ray ``map_batches`` class
    over ``ray.data.range(n)`` (stateful actor pool — the vocabulary and DCT
    basis are built once per actor).
    """

    def __init__(self, seed: int = 42):
        self.seed = seed
        self.vocab = _vocab(seed)
        # per-(cohort, offset) memoization: every field except image_id is a pure
        # function of (d, off); duplicate classes reuse the cohort's base caption
        # and pixels, so caching makes sequential batch generation ~10x faster.
        import functools

        self._variant = functools.lru_cache(maxsize=4096)(self._variant)
        self._caption_base = functools.lru_cache(maxsize=1024)(self._caption_base)
        self._caption_alt = functools.lru_cache(maxsize=1024)(self._caption_alt)
        self._pixels = functools.lru_cache(maxsize=1024)(self._pixels)

    # ---- deterministic primitives -------------------------------------
    def _tokens(self, stream: int, count: int) -> list[str]:
        v = self.vocab
        return [v[hash_u64(self.seed ^ hash_u64(stream * 1013 + j)) % len(v)] for j in range(count)]

    def _caption_base(self, d: int) -> str:
        return " ".join(self._tokens(d * 7 + 1, 10 + d % 6))

    def _caption_alt(self, d: int, salt: int) -> str:
        return " ".join(self._tokens(d * 7 + 2 + salt * 31, 9 + (d + salt) % 5))

    def _pixels(self, stream: int) -> np.ndarray:
        """Deterministic 64x64 image: per-stream low-frequency structure (so
        unrelated streams have well-separated pHashes) plus counter-based noise."""
        h = hash_u64(self.seed * 31 + stream)
        n = _IMG_SIZE * _IMG_SIZE
        base = np.arange(n, dtype=np.uint64) + np.uint64(h)
        with np.errstate(over="ignore"):
            z = base * np.uint64(0x9E3779B97F4A7C15)
            z ^= z >> np.uint64(29)
        noise = (z & np.uint64(0xFF)).astype(np.float64).reshape(_IMG_SIZE, _IMG_SIZE)
        # low-frequency structure: sum of 3 cosine plane waves with per-stream
        # frequencies/phases — dominates the DCT low band, decorrelating pHashes
        yy, xx = np.meshgrid(np.arange(_IMG_SIZE), np.arange(_IMG_SIZE), indexing="ij")
        struct = np.zeros((_IMG_SIZE, _IMG_SIZE))
        for j in range(3):
            hj = hash_u64(h + j + 1)
            fx = 1 + (hj % 4)
            fy = 1 + ((hj >> 8) % 4)
            phase = ((hj >> 16) % 628) / 100.0
            struct += np.cos(2 * np.pi * (fx * xx + fy * yy) / _IMG_SIZE + phase)
        struct = (struct - struct.min()) / max(struct.ptp(), 1e-9) * 160
        return np.clip(noise / 4 + struct + 32, 0, 255).astype(np.uint8)

    def _borderline_caption(self, base_caption: str, d: int) -> str:
        """A caption whose JW vs the *normalized* base lands in [0.80, 0.92).

        Token-tail replacement first; char-level truncation fallback gives
        ~0.01-granularity steps so the 0.12-wide band is always reachable.
        """
        norm_base = normalize_text(base_caption)
        toks = norm_base.split()
        lo, hi = 0.80, 0.92
        for j in range(1, len(toks)):
            cand = " ".join(toks[: len(toks) - j] + self._tokens(d * 7 + 5, j))
            jw = jaro_winkler(norm_base, cand)
            if lo <= jw < hi:
                return cand
        for cut in range(1, len(norm_base) - 8):
            cand = norm_base[: len(norm_base) - cut]
            jw = jaro_winkler(norm_base, cand)
            if lo <= jw < hi:
                return cand
        # pathological fallback: pad with one distinct token until in band
        cand = norm_base
        for j in range(1, 40):
            cand = cand + " " + self._tokens(d * 7 + 6, 1)[0]
            jw = jaro_winkler(norm_base, cand)
            if lo <= jw < hi:
                return cand
        return norm_base[: max(8, len(norm_base) // 2)]

    def _near_dup_caption(self, base_caption: str, d: int) -> str:
        """JW >= 0.92 vs normalized base but not identical after normalization."""
        norm_base = normalize_text(base_caption)
        cand = norm_base + "x"  # single appended char: JW ~ 1 - 1/(3*len)
        if jaro_winkler(norm_base, cand) >= 0.92:
            return cand
        return norm_base + norm_base[-1]

    def _contained_caption(self, base_caption: str, d: int) -> str:
        """Base caption plus a suffix long enough to push JW below the Stage-3
        threshold — containment must be what catches it (FIXTURES.md class 5)."""
        norm_base = normalize_text(base_caption)
        cand = norm_base
        for j in range(3, 30, 3):
            cand = norm_base + " " + " ".join(self._tokens(d * 7 + 3, j))
            if jaro_winkler(norm_base, cand) < 0.92:
                return cand
        return cand

    def _perturb_pixels(self, pixels: np.ndarray) -> np.ndarray:
        """Produce a visually-identical copy (PSNR >> 40 dB) with a *nearby but
        distinct* pHash — Stage-3's Hamming side-constraint analog of the
        reference's year +-1 tolerance.

        Targeted: find the 8x8 low-band DCT coefficient closest to the median
        (the pHash threshold) and add exactly the inverse-DCT pattern that pushes
        it across, upsampled 2x. The pattern's energy is d^2/1024 per pixel, so
        even a margin of 24 keeps PSNR above 55 dB.
        """
        m = codecs._DCT_M
        base_hash = codecs.phash64(pixels)
        for margin in (10.0, 20.0, 35.0):
            img = pixels.astype(np.float64)
            small = img.reshape(32, 2, 32, 2).mean(axis=(1, 3))
            coef = m @ small @ m.T
            block = coef[:8, :8]
            med = np.median(block)
            dist = np.abs(block - med)
            dist[0, 0] = np.inf  # keep DC alone
            u, v = np.unravel_index(np.argmin(dist), dist.shape)
            d = (med - block[u, v]) + (margin if block[u, v] <= med else -margin)
            pattern = d * np.outer(m[u], m[v])  # exact +d on coef[u, v]
            big = np.repeat(np.repeat(pattern, 2, axis=0), 2, axis=1)
            out = np.clip(img + big, 0, 255).round().astype(np.uint8)
            if codecs.phash64(out) != base_hash and codecs.psnr(pixels, out) >= 42.0:
                return out
        return out

    # ---- row assembly --------------------------------------------------
    def _encode(self, pixels: np.ndarray, fmt: str) -> tuple[bytes, int]:
        if fmt == "png":
            data = codecs.encode_png_gray(pixels)
        else:
            data = codecs.encode_fake_jpeg_gray(pixels)
        ph = codecs.phash64_signed(codecs.decode_image(data))
        return data, ph

    def row(self, i: int) -> dict:
        d, off = divmod(i, COHORT)
        caption, data, ph, fmt, authority = self._variant(d, off)
        image_id = f"img_{i:012d}" + (f"#{authority}" if authority else "")
        return {
            "image_id": image_id,
            "bytes": data,
            "w": _IMG_SIZE,
            "h": _IMG_SIZE,
            "fmt": fmt,
            "caption": caption,
            "phash": ph,
        }

    def _variant(self, d: int, off: int) -> tuple[str, bytes, int, str, str]:
        base_caption = self._caption_base(d)
        base_pixels = self._pixels(d * 101)
        fmt = "png"
        authority = ""
        if off == 0:
            caption, pixels = base_caption, base_pixels
        elif off == 1:
            caption, pixels = base_caption, base_pixels
        elif off == 2:
            caption, pixels, fmt = base_caption, base_pixels, "jpeg"
        elif off == 3:
            caption = self._near_dup_caption(base_caption, d)
            pixels = self._perturb_pixels(base_pixels)
        elif off == 4:
            caption, pixels = self._caption_alt(d, 1), base_pixels
        elif off == 5:
            caption = self._contained_caption(base_caption, d)
            pixels = self._perturb_pixels(base_pixels)
        elif off == 6:
            # borderline pairs are *uncertain*: unrelated pixels, similar caption
            caption, pixels = self._borderline_caption(base_caption, d), self._pixels(d * 101 + 6)
        elif off == 7:
            caption, pixels = self._caption_alt(d, 2), self._pixels(d * 101 + 7)
            authority = f"k{d}"
        elif off == 8:
            # same underlying image as its authority partner (re-encoded lossy),
            # so the merged cluster satisfies the decoded-pixel PSNR invariant
            caption, pixels, fmt = self._caption_alt(d, 3), self._pixels(d * 101 + 7), "jpeg"
            authority = f"k{d}"
        elif off == 9:
            caption, pixels = self._caption_alt(d, 4), self._pixels(d * 101 + 9)
            authority = f"na{d}"
        elif off == 10:
            neg_base = self._caption_alt(d, 4)
            caption, pixels = self._near_dup_caption(neg_base, d), self._pixels(d * 101 + 9)
            authority = f"nb{d}"
        else:  # off == 11: skew stressors
            if d % 2 == 0:
                caption, pixels = HOT_CAPTION, self._pixels(d * 101 + 11)
            else:
                caption, pixels = "im", self._pixels(d * 101 + 11)
        data, ph = self._encode(pixels, fmt)
        return caption, data, ph, fmt, authority

    def rows(self, indices) -> pa.Table:
        cols: dict[str, list] = {f.name: [] for f in IMAGE_SCHEMA}
        for i in indices:
            r = self.row(int(i))
            for k, v in r.items():
                cols[k].append(v)
        return pa.table(cols, schema=IMAGE_SCHEMA)

    # Ray map_batches entry: batch of {'id': int64 array} from ray.data.range(n)
    def __call__(self, batch: dict) -> pa.Table:
        ids = batch["id"]
        return self.rows(np.asarray(ids).tolist())


# ---------------------------------------------------------------------------
# Ground truth
# ---------------------------------------------------------------------------

def ground_truth_clusters(n: int) -> dict[int, list[int]]:
    """Expected clusters (by row index) of size >= 2 for an n-row corpus."""
    out: dict[int, list[int]] = {}
    for d in range(0, (n + COHORT - 1) // COHORT):
        base = d * COHORT
        main = [base + off for off in (0, 1, 2, 3, 4, 5) if base + off < n]
        if len(main) > 1:
            out[base] = main
        auth = [base + off for off in (7, 8) if base + off < n]
        if len(auth) > 1:
            out[base + 7] = auth
    return out


def ground_truth_pairs(n: int) -> set[tuple[int, int]]:
    """All unordered ground-truth duplicate pairs (for recall measurement)."""
    pairs: set[tuple[int, int]] = set()
    for members in ground_truth_clusters(n).values():
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                pairs.add((members[i], members[j]))
    return pairs


def expected_borderline_pairs(n: int) -> set[tuple[int, int]]:
    """(base, borderline) index pairs expected in the uncertain side-output."""
    return {
        (d * COHORT, d * COHORT + 6)
        for d in range(n // COHORT + 1)
        if d * COHORT + 6 < n and d * COHORT < n
    }


def index_of(image_id: str) -> int:
    """Recover the row index from an image_id (strips the authority suffix)."""
    return int(image_id.split("#", 1)[0].split("_", 1)[1])


# ---------------------------------------------------------------------------
# Materialization helpers
# ---------------------------------------------------------------------------

def write_corpus_parquet(path: str, n: int, seed: int = 42, use_ray: bool = True) -> str:
    """Write an n-row corpus to parquet (directory when Ray-parallel, else file).

    With Ray available and n large, generation fans out as a map_batches over
    ``ray.data.range(n)`` — the generator is counter-based so shards are
    independent. Skips work if the target already exists (resume-friendly).
    """
    if os.path.exists(path) and (os.path.isfile(path) or os.listdir(path)):
        return path
    if use_ray and n >= 10_000:
        import ray
        import ray.data as rd

        cpus = int(ray.cluster_resources().get("CPU", 4))
        # class + constructor kwargs: each actor builds its own vocab/caches
        # (the instance-level lru_cache wrappers are unpicklable by design)
        ds = rd.range(n).repartition(max(cpus * 2, 8)).map_batches(
            CorpusGen,
            fn_constructor_kwargs={"seed": seed},
            batch_format="numpy",
            batch_size=2048,
            concurrency=(1, max(2, cpus - 1)),
        )
        ds.write_parquet(path)
    else:
        import pyarrow.parquet as pq

        table = CorpusGen(seed).rows(range(n))
        if not path.endswith(".parquet"):
            os.makedirs(path, exist_ok=True)
            pq.write_table(table, os.path.join(path, "part-0.parquet"))
        else:
            pq.write_table(table, path)
    return path
