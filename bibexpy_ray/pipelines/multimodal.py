"""Multimodal (image) query entry points over the synthetic image+caption corpus.

The testdata star schema has no binary-image table, so these queries run on the
deterministic synthetic corpus (synth.py — seeded, no external data; the
BASELINE.json input_hint shape) materialized once per scale under /tmp.

- ``image_decode_stats``: the decode/feature-extract actor-pool pattern from
  the brief — binary column in, per-image features out. The PNG decode is real
  (stdlib zlib); the lossy decode is the documented deterministic stand-in
  (codecs.py) since no image libs exist in this container.
- ``image_dedup_clusters``: the flagship near-dup pipeline's cluster table.
- ``documents_as_corpus``: adapter mapping the documents table into the image
  schema (caption=text, phash=SimHash) so the flagship pipeline also serves
  pure-text corpora — used by ``__ray_entry__.entry``.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from bibexpy_ray import codecs
from bibexpy_ray.config import DedupConfig
from bibexpy_ray.functions import hashing
from bibexpy_ray.pipelines.tables import read_table
from bibexpy_ray.synth import COHORT, write_corpus_parquet

#: corpus rows per testdata scale factor (cohorts of 12, see synth.py)
CORPUS_ROWS = {"0.001": 1_200, "0.01": 4_800, "0.1": 48_000}


def corpus_rows_for(sf_dir: str) -> int:
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    return CORPUS_ROWS.get(sf, 1_200)


def corpus_path_for(sf_dir: str, seed: int = 42) -> str:
    n = corpus_rows_for(sf_dir)
    path = f"/tmp/bibexpy_corpus/n{n}_seed{seed}"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    return write_corpus_parquet(path, n, seed=seed)


def _pool_concurrency(cpus: int) -> tuple[int, int]:
    """Actor-pool (floor, ceil) for the decode-style stages.

    floor=1 ramps too slowly at high CPU counts (actor startup serializes
    behind the first batches — measured 2x the wall at 32 CPUs), while a
    floor that reserves EVERY cluster CPU starves the upstream read tasks
    and deadlocks the streaming executor. cpus//2, clamped strictly below
    the cluster size, is the sweet spot at every size (2 CPUs -> (1, 1),
    4 -> (2, 3), 32 -> (16, 31))."""
    ceil = max(1, cpus - 1)
    floor = max(1, min(ceil, cpus // 2))
    return floor, ceil


class DecodeStatsStage:
    """Actor-pool decode stage: bytes → decoded-pixel features.

    Codec state (DCT basis) binds once per actor in ``__init__``; ``__call__``
    decodes each image and emits exact-integer features (sums over uint8
    pixels) so results are bit-deterministic. Small batches — binary payloads
    dominate batch bytes (the memory-aware rule from the brief).
    """

    def __init__(self):
        self._dct = codecs._DCT_M  # force basis construction once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("image_id").to_pylist()
        datas = batch.column("bytes").to_pylist()
        phashes = batch.column("phash").to_numpy(zero_copy_only=False)
        px_sum = np.zeros(len(ids), dtype=np.int64)
        phash_ok = np.zeros(len(ids), dtype=bool)
        ws = np.zeros(len(ids), dtype=np.int64)
        hs = np.zeros(len(ids), dtype=np.int64)
        for i, data in enumerate(datas):
            px = codecs.decode_image(data)
            hs[i], ws[i] = px.shape
            px_sum[i] = int(px.sum())
            phash_ok[i] = codecs.phash64_signed(px) == int(phashes[i])
        return pa.table(
            {
                "image_id": pa.array(ids, type=pa.string()),
                "w": pa.array(ws, type=pa.int64()),
                "h": pa.array(hs, type=pa.int64()),
                "px_sum": pa.array(px_sum, type=pa.int64()),
                "phash_ok": pa.array(phash_ok, type=pa.bool_()),
            }
        )


def image_decode_stats(sf_dir: str) -> rd.Dataset:
    """Decode every image in the synthetic corpus; per-image exact features."""
    path = corpus_path_for(sf_dir)
    ds = rd.read_parquet(path, columns=["image_id", "bytes", "phash"])
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4))
    return ds.map_batches(
        DecodeStatsStage,
        batch_format="pyarrow",
        # binary payloads: batch bytes stay bounded (~3 MB at the corpus's
        # ~6 KB/img; real 100 KB+ images would warrant dropping this back)
        batch_size=512,
        concurrency=_pool_concurrency(cpus),
    )


def image_dedup_clusters(sf_dir: str) -> pd.DataFrame:
    """Flagship image near-dup pipeline → cluster table (deterministic)."""
    from bibexpy_ray.pipelines.dedup_images import FEATURE_INPUT_COLS, dedup_images

    path = corpus_path_for(sf_dir)
    # prune at the read: the dedup path never reads image bytes
    ds = rd.read_parquet(path, columns=FEATURE_INPUT_COLS)
    result = dedup_images(ds, DedupConfig())
    out = result.clusters.sort_values("cluster_id").reset_index(drop=True)
    return out


class ResizeStage:
    """Actor-pool resize stage: bytes → box-filter-downsampled bytes.

    The decode/transform/re-encode layout from the brief: binary column in,
    binary column out (plus typed metadata), so downstream stages can chain
    on the resized payload. Downsampling is an integer-exact k x k box mean
    (k chosen so max(w, h) <= ``target``), re-encoded as lossless PNG —
    bit-deterministic across runs and parallelism levels. Codec state binds
    once per actor; batches stay small because binary payloads dominate
    batch bytes.
    """

    def __init__(self, target: int = 16):
        self._dct = codecs._DCT_M
        self._target = int(target)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("image_id").to_pylist()
        datas = batch.column("bytes").to_pylist()
        out_bytes: list[bytes] = []
        ws = np.zeros(len(ids), dtype=np.int64)
        hs = np.zeros(len(ids), dtype=np.int64)
        sums = np.zeros(len(ids), dtype=np.int64)
        for i, data in enumerate(datas):
            px = codecs.decode_image(data)
            k = max(1, (max(px.shape) + self._target - 1) // self._target)
            h, w = (px.shape[0] // k) * k, (px.shape[1] // k) * k
            # integer box mean: exact (floor) division keeps determinism
            small = (
                px[:h, :w]
                .reshape(h // k, k, w // k, k)
                .sum(axis=(1, 3), dtype=np.int64)
                // (k * k)
            ).astype(np.uint8)
            hs[i], ws[i] = small.shape
            sums[i] = int(small.sum())
            out_bytes.append(codecs.encode_png_gray(small))
        return pa.table(
            {
                "image_id": pa.array(ids, type=pa.string()),
                "bytes": pa.array(out_bytes, type=pa.binary()),
                "w": pa.array(ws, type=pa.int64()),
                "h": pa.array(hs, type=pa.int64()),
                "px_sum": pa.array(sums, type=pa.int64()),
            }
        )


def image_resize(sf_dir: str, target: int = 16) -> rd.Dataset:
    """Resize every corpus image to <= target px per side (actor pool)."""
    path = corpus_path_for(sf_dir)
    ds = rd.read_parquet(path, columns=["image_id", "bytes"])
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4))
    return ds.map_batches(
        ResizeStage,
        fn_constructor_kwargs={"target": target},
        batch_format="pyarrow",
        batch_size=256,
        concurrency=_pool_concurrency(cpus),
    )


def image_resize_stats(sf_dir: str) -> rd.Dataset:
    """Resized dims + exact pixel sums (binary column dropped for the query
    surface; chain on :func:`image_resize` itself to consume the bytes)."""
    return image_resize(sf_dir).drop_columns(["bytes"])


#: frames per synthetic video = one synth cohort (synth.py generates related
#: variants in cohorts of COHORT=12; a cohort is the natural "clip")
FRAMES_PER_VIDEO = COHORT


def videos_from_corpus(sf_dir: str, n_parts: int = 32) -> rd.Dataset:
    """Adapter: image corpus → video table (video_id, n_frames, payload).

    The payload is a length-prefixed concatenation of the cohort's encoded
    frames (uint32 LE frame count, then per-frame uint32 LE byte length,
    then the frame bytes) — an opaque ``binary`` column with typed metadata,
    the multimodal layout from the brief. Frames co-locate via a coarse hash
    shuffle on video_id (never one pandas group per video).
    """
    path = corpus_path_for(sf_dir)
    ds = rd.read_parquet(path, columns=["image_id", "bytes"])

    from bibexpy_ray.stages.shuffle import hash_partition_apply

    def vid_key(tbl: pa.Table) -> np.ndarray:
        import pyarrow.compute as pc

        # image_id = img_<%012d>[#authority] (synth.py); video = index // 12
        idx = pc.utf8_slice_codeunits(
            tbl.column("image_id"), 4, 16
        ).cast(pa.int64()).to_numpy(zero_copy_only=False)
        vid = idx // FRAMES_PER_VIDEO
        return (hashing.splitmix64(vid.astype(np.uint64)) % np.uint64(n_parts)).astype(
            np.int32
        )

    def pack(part: pd.DataFrame) -> pd.DataFrame:
        idx = part["image_id"].str.slice(4, 16).astype(np.int64)
        part = part.assign(_vid=idx // FRAMES_PER_VIDEO, _frame=idx % FRAMES_PER_VIDEO)
        rows = []
        for vid, grp in part.groupby("_vid", sort=True):
            grp = grp.sort_values("_frame")
            frames = list(grp["bytes"])
            payload = np.uint32(len(frames)).tobytes() + b"".join(
                np.uint32(len(f)).tobytes() + f for f in frames
            )
            rows.append(
                {
                    "video_id": f"vid_{int(vid):09d}",
                    "n_frames": len(frames),
                    "payload": payload,
                }
            )
        return pd.DataFrame(rows, columns=["video_id", "n_frames", "payload"])

    return hash_partition_apply(ds, n_parts, pack, key_fn=vid_key)


class FrameSampleStage:
    """Actor-pool frame sampler: video payload → every k-th frame's features.

    Frame extraction is pure byte slicing on the length-prefix table (no
    decode of skipped frames — the point of frame sampling at scale); only
    sampled frames are decoded for features. One input row fans out to
    ``ceil(n_frames / k)`` output rows.
    """

    def __init__(self, every: int = 4):
        self._dct = codecs._DCT_M
        self._every = int(every)

    def __call__(self, batch: pa.Table) -> pa.Table:
        vids = batch.column("video_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out_vid: list[str] = []
        out_frame: list[int] = []
        out_sum: list[int] = []
        for vid, payload in zip(vids, payloads):
            mv = memoryview(payload)
            n = int(np.frombuffer(mv[:4], dtype=np.uint32)[0])
            off = 4
            for f in range(n):
                ln = int(np.frombuffer(mv[off : off + 4], dtype=np.uint32)[0])
                off += 4
                if f % self._every == 0:
                    px = codecs.decode_image(bytes(mv[off : off + ln]))
                    out_vid.append(vid)
                    out_frame.append(f)
                    out_sum.append(int(px.sum()))
                off += ln
        return pa.table(
            {
                "video_id": pa.array(out_vid, type=pa.string()),
                "frame_idx": pa.array(out_frame, type=pa.int64()),
                "px_sum": pa.array(out_sum, type=pa.int64()),
            }
        )


def video_frame_sample(sf_dir: str, every: int = 4) -> rd.Dataset:
    """Sample every k-th frame of each synthetic video; exact per-frame stats."""
    videos = videos_from_corpus(sf_dir)
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4))
    return videos.map_batches(
        FrameSampleStage,
        fn_constructor_kwargs={"every": every},
        batch_format="pyarrow",
        batch_size=64,  # payloads are ~12x image bytes — smaller batches
        concurrency=_pool_concurrency(cpus),
    )


# ---------------------------------------------------------------------------
# Audio: opaque PCM binary column + feature-extraction actor pool
# ---------------------------------------------------------------------------

AUDIO_SR = 8_000  # nominal sample rate carried as typed metadata


def audio_from_corpus(sf_dir: str) -> rd.Dataset:
    """Adapter: documents table → audio table (audio_id, bytes, sr,
    n_samples) with deterministic synthetic int16 PCM (seeded per doc_id —
    no external data). The payload is an opaque ``binary`` column with typed
    metadata, the multimodal layout from the brief."""
    docs = read_table(sf_dir, "documents", ["doc_id"])

    def gen(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(dtype=np.int64)
        rows = []
        for did in ids:
            n = 1024 + int(did) % 1024
            # integer-exact waveform: a seeded PCG stream, bit-reproducible
            rng = np.random.Generator(np.random.PCG64(int(did)))
            samples = rng.integers(-20000, 20000, size=n, dtype=np.int16)
            rows.append(
                {
                    "audio_id": f"aud_{int(did):012d}",
                    "bytes": samples.tobytes(),
                    "sr": AUDIO_SR,
                    "n_samples": n,
                }
            )
        return pd.DataFrame(rows, columns=["audio_id", "bytes", "sr", "n_samples"])

    return docs.map_batches(gen, batch_format="pandas")


class AudioFeatureStage:
    """Actor-pool audio featurizer: PCM payload → integer-exact features
    (mean square energy, zero crossings, peak amplitude). ``frombuffer`` is
    zero-copy; all reductions are vectorized int64 numpy. Real codecs (mp3/
    flac) would decode here — the libs aren't in this container, so payloads
    are raw PCM and the Ray-side plumbing (schema, actor signature, batch
    sizing for binary columns) is the real, tested part."""

    def __init__(self) -> None:
        pass  # a real build loads the codec/model here, once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("audio_id").to_pylist()
        payloads = batch.column("bytes").to_pylist()
        energy: list[int] = []
        zc: list[int] = []
        peak: list[int] = []
        n_out: list[int] = []
        for p in payloads:
            x = np.frombuffer(p, dtype=np.int16).astype(np.int64)
            n = len(x)
            n_out.append(n)
            energy.append(int((x * x).sum() // max(n, 1)))
            zc.append(int(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1]))))
            peak.append(int(np.abs(x).max()) if n else 0)
        return pa.table(
            {
                "audio_id": pa.array(ids, type=pa.string()),
                "n_samples": pa.array(n_out, type=pa.int64()),
                "energy": pa.array(energy, type=pa.int64()),
                "zero_crossings": pa.array(zc, type=pa.int64()),
                "peak": pa.array(peak, type=pa.int64()),
            }
        )


def audio_feature_stats(sf_dir: str) -> rd.Dataset:
    """Audio feature extraction over the synthetic PCM corpus (actor pool,
    small batches for binary payloads)."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4))
    return audio_from_corpus(sf_dir).map_batches(
        AudioFeatureStage,
        batch_format="pyarrow",
        batch_size=128,
        concurrency=_pool_concurrency(cpus),
    )


def documents_as_corpus(sf_dir: str) -> rd.Dataset:
    """Adapter: documents table → IMAGE_SCHEMA-shaped dataset (caption=text).

    phash := 64-bit SimHash of the raw text, so the flagship's pHash-Hamming
    side-constraint becomes a SimHash-agreement constraint in text mode (near
    -identical texts ⇒ small Hamming), mirroring how the reference reuses one
    staged matcher across field types.
    """
    docs = read_table(sf_dir, "documents", ["doc_id", "text"])

    def to_corpus(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        texts = batch.column("text")
        flat, offs = hashing.shingle_hashes(texts, 5)
        flat, offs = hashing.unique_per_row(flat, offs)
        sim = hashing.simhash_signatures(flat, offs)
        return pa.table(
            {
                "image_id": pa.array([f"doc_{i:012d}" for i in ids], type=pa.string()),
                "w": pa.array(np.zeros(len(ids)), type=pa.int32()),
                "h": pa.array(np.zeros(len(ids)), type=pa.int32()),
                "fmt": pa.array(["txt"] * len(ids), type=pa.string()),
                "caption": texts.cast(pa.string()),
                "phash": pa.array(sim.view(np.int64), type=pa.int64()),
            }
        )

    return docs.map_batches(to_corpus, batch_format="pyarrow")
