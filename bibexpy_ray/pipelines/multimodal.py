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
from bibexpy_ray.synth import write_corpus_parquet

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
        batch_size=256,  # binary payloads: keep batch bytes bounded
        # autoscaling pool: a fixed minimum equal to the CPU count starves the
        # upstream read and deadlocks the streaming executor
        concurrency=(1, max(2, cpus - 1)),
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
