"""Signature stage: normalize + shingle + MinHash + SimHash per batch.

The Ray-native analog of the reference's Phase-1 normalization pass
(/root/reference/apps/api/services/smart_merger.py:605-621) — instead of 8
``_norm_*`` pandas side columns, a stateful actor pool appends Arrow signature
columns. State built once per actor in ``__init__`` (permutation seeds, DCT
basis, compiled regexes); ``__call__`` is fully vectorized over zero-copy Arrow
batches. Deterministic by construction (fixed seeds) so Ray task retries
reproduce identical signatures.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from bibexpy_ray.config import DedupConfig
from bibexpy_ray.functions import hashing
from bibexpy_ray.functions.normalize import normalize_text_batch


class SignatureStage:
    """map_batches callable: IMAGE_SCHEMA columns in -> + signature columns.

    Works both as an actor-pool class (``map_batches(SignatureStage, ...)``)
    and, preferred, through :func:`sign_batch` as a plain task-pool function —
    the stage's only state (permutation seeds) is microseconds to derive, so a
    per-worker-process memo (module-level cache) gives actor-style state reuse
    without actor-pool startup latency. Heavy-state stages (decoders, models)
    should stay actor pools; this one is the documented exception.
    """

    def __init__(self, cfg: DedupConfig | None = None):
        self.cfg = cfg or DedupConfig()

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        captions = batch.column("caption")
        norm = normalize_text_batch(
            captions.combine_chunks() if isinstance(captions, pa.ChunkedArray) else captions
        )
        flat, offs = hashing.shingle_hashes(norm, cfg.shingle_k)
        flat, offs = hashing.unique_per_row(flat, offs)
        n_shingles = np.diff(offs).astype(np.int32)
        minhash = hashing.minhash_signatures(flat, offs, cfg.num_perms, cfg.seed)
        simhash = hashing.simhash_signatures(flat, offs)
        caption_hash = hashing.text_hash_u64(norm)

        ids = batch.column("image_id")
        authority = pc.if_else(
            pc.match_substring(ids, "#"),
            pc.replace_substring_regex(ids, "^[^#]*#", ""),
            pa.scalar(None, pa.string()),
        )
        # numeric row id for the candidate path: shuffling/sorting u64 ids is
        # several times cheaper than object-dtype strings. 64-bit collision
        # probability is ~n²/2^64 (negligible below ~10^8 rows; a 128-bit uid
        # is the documented upgrade for the trillion-row target).
        uid = hashing.text_hash_u64(ids)

        nrows = batch.num_rows
        mh_list = pa.FixedSizeListArray.from_arrays(
            pa.array(minhash.ravel(), type=pa.uint64()), cfg.num_perms
        )
        return (
            batch.append_column("_norm_caption", norm)
            .append_column("_caption_hash", pa.array(caption_hash, type=pa.uint64()))
            .append_column("_n_shingles", pa.array(n_shingles, type=pa.int32()))
            .append_column("_simhash", pa.array(simhash, type=pa.uint64()))
            .append_column("_minhash", mh_list)
            .append_column("_authority", authority.combine_chunks() if isinstance(authority, pa.ChunkedArray) else authority)
            .append_column("_uid", pa.array(uid, type=pa.uint64()))
        )


#: per-worker-process stage memo keyed by config (task-pool state reuse)
_STAGE_CACHE: dict[DedupConfig, SignatureStage] = {}


def sign_batch(batch: pa.Table, cfg: DedupConfig) -> pa.Table:
    """Task-pool form of the signature stage (state memoized per process)."""
    stage = _STAGE_CACHE.get(cfg)
    if stage is None:
        stage = _STAGE_CACHE[cfg] = SignatureStage(cfg)
    return stage(batch)
