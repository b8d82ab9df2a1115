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
        # several times cheaper than object-dtype strings. 64-bit hash
        # collisions (~n²/2⁶⁴ — ~10⁴ expected at the 10¹²-row target) are
        # NOT accepted: resolve_uid_collisions detects every colliding uid
        # after the signature stage and salted-rehashes the non-keeper rows,
        # so downstream candidate/attach/gate machinery runs on uids that
        # are collision-free by construction. `_uid_w` is the 64-bit
        # identity witness (an independent hash of the id) that detection
        # uses to tell same-uid-different-id apart from a repeated id.
        uid = uid_base(ids, cfg.uid_bits)

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
            .append_column(
                "_uid_w", pa.array(uid_witness(ids), type=pa.uint64())
            )
        )


#: per-worker-process stage memo keyed by config (task-pool state reuse)
_STAGE_CACHE: dict[DedupConfig, SignatureStage] = {}


def sign_batch(batch: pa.Table, cfg: DedupConfig) -> pa.Table:
    """Task-pool form of the signature stage (state memoized per process)."""
    stage = _STAGE_CACHE.get(cfg)
    if stage is None:
        stage = _STAGE_CACHE[cfg] = SignatureStage(cfg)
    return stage(batch)


# ---------------------------------------------------------------------------
# uid collision resolution
#
# The uid is a 64-bit hash of the image_id. At the 10^12-row north-rule scale
# the birthday bound puts ~10^4 distinct ids on shared uids; left alone those
# rows would lose candidate pairs (pair dedupe / attach guards / incremental
# gate all key on the uid). Instead of widening every candidate shuffle to
# 128 bits (+16 B per pair row on the pipeline's heaviest streams), the
# resolver below makes uids collision-free per run: ONE cheap co-partition
# pass over (uid, witness) detects every uid carried by >= 2 distinct ids,
# and the non-keeper rows are deterministically re-hashed with a salt. The
# collision sets are tiny (broadcast whole), so the handful of stages that
# re-derive uids from id strings replay the same rules bit-identically.
# ---------------------------------------------------------------------------

#: seed of the identity-witness hash (`_uid_w`) — never masked by uid_bits
UID_WITNESS_SEED = 97
#: per-round salts for re-hashing collision losers. Production (64-bit)
#: needs one round essentially always — post-salt re-collision odds are
#: ~|collisions|·n/2^bits per round; the long list exists for the
#: collision-injection tests, where tiny uid spaces converge geometrically
#: at rate n/2^bits and need several rounds.
UID_SALT_SEEDS = (131, 137, 139, 149, 151, 157, 163, 167)


def _uid_mask(uid_bits: int) -> np.uint64:
    return np.uint64((1 << uid_bits) - 1 if uid_bits < 64 else 0xFFFFFFFFFFFFFFFF)


def uid_base(ids, uid_bits: int = 64) -> np.ndarray:
    """Pre-resolution uid of each id string (hash, masked to uid_bits)."""
    return hashing.text_hash_u64(ids) & _uid_mask(uid_bits)


def uid_witness(ids) -> np.ndarray:
    """64-bit identity witness (independent hash; full width always)."""
    return hashing.text_hash_u64(ids, seed=UID_WITNESS_SEED)


def replay_uid_rules(
    ids, rules: "list[tuple[np.ndarray, np.ndarray, int]]", uid_bits: int = 64
) -> np.ndarray:
    """Recompute the RESOLVED uid of each id string from the collision rules.

    ``rules`` is ``resolve_uid_collisions``'s output: per round a sorted
    colliding-uid array, the aligned keeper witness per uid, and the round's
    salt seed. A row is salted in round r iff its current uid is in that
    round's set and its witness differs from the keeper's — exactly the
    rewrite the resolver applied, so this replay is bit-identical to the
    ``_uid`` column of the resolved feature table (tests/test_uid_collisions).
    """
    u = uid_base(ids, uid_bits)
    if not rules:
        return u
    w = uid_witness(ids)
    mask = _uid_mask(uid_bits)
    if not isinstance(ids, (pa.Array, pa.ChunkedArray)):
        ids = pa.array(ids, type=pa.large_string())
    elif isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    for uids_c, keeper_w, seed in rules:
        if len(uids_c) == 0:
            continue
        pos = np.minimum(np.searchsorted(uids_c, u), len(uids_c) - 1)
        hit = (uids_c[pos] == u) & (keeper_w[pos] != w)
        if hit.any():
            idx = np.flatnonzero(hit)
            salted = hashing.text_hash_u64(ids.take(pa.array(idx)), seed=seed)
            u[idx] = salted & mask
    return u


def resolve_uid_collisions(
    features,
    num_partitions: int,
    uid_bits: int = 64,
    reserved: "tuple[np.ndarray, np.ndarray] | None" = None,
    max_rounds: int = len(UID_SALT_SEEDS),
):
    """Make the feature table's ``_uid`` collision-free; returns
    ``(features, rules, n_collisions)``.

    Detection is one co-partition pass per round over only ``(_uid,
    _uid_w)`` — 16 B/row, far lighter than any candidate shuffle — keyed on
    uid so every uid group lands whole in one reduce. A uid is colliding
    when it carries >= 2 DISTINCT witnesses (a repeated id string is the
    same identity and is left alone). One row per colliding uid keeps it
    (the keeper); the rest are re-hashed with the round's salt in a cheap
    rewrite map. In the common case (no collisions) the single detection
    pass is the only cost and the input dataset is returned untouched.

    ``reserved`` (incremental mode): the base index's ``(sorted uids,
    aligned witness)``. For a colliding uid found there the keeper is the
    BASE row — its uid must stay stable because the incremental pair gate
    and the base run's persisted features key on it; new rows yield.
    Otherwise the keeper is the minimum witness (order-free deterministic).

    ``rules`` must be replayed (``replay_uid_rules``) wherever uids are
    re-derived from id strings (exact-loser drop, containment pair stream,
    legacy gates). Raises if collisions persist after ``max_rounds`` — at
    real uid widths that is ~impossible; at test-injected widths it signals
    the corpus outgrew the injected space.
    """
    import ray

    from bibexpy_ray.stages.shuffle import hash_partition_apply

    rules: list[tuple[np.ndarray, np.ndarray, int]] = []
    n_collisions = 0
    res_ref = ray.put(reserved)
    # below this many rows the (uid, witness) pairs collect to the driver
    # (16 B/row — ≤80 MB at the cap) and detection is one lexsort there;
    # the co-partition shuffle's fixed task/object bookkeeping dominates the
    # pass at bench scales. Above the cap the distributed pass runs.
    driver_detect = int(features.count()) <= 5_000_000

    def _key(t: pa.Table) -> np.ndarray:
        u = t.column("_uid").to_numpy(zero_copy_only=False).astype(np.uint64)
        return (hashing.splitmix64(u) % np.uint64(num_partitions)).astype(np.int32)

    _detect_empty = pa.table(
        {"uid": pa.array([], pa.uint64()), "keeper_w": pa.array([], pa.uint64())}
    )

    def detect(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return _detect_empty
        u = part.column("_uid").to_numpy(zero_copy_only=False).astype(np.uint64)
        w = part.column("_uid_w").to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.lexsort((w, u))
        u, w = u[order], w[order]
        # distinct (uid, witness) rows, then uids appearing >= 2 times
        first = np.empty(len(u), dtype=bool)
        first[0] = True
        first[1:] = (u[1:] != u[:-1]) | (w[1:] != w[:-1])
        du, dw = u[first], w[first]
        ustart = np.flatnonzero(np.r_[True, du[1:] != du[:-1]])
        ucount = np.r_[ustart[1:], len(du)] - ustart
        coll = ustart[ucount >= 2]
        if coll.size == 0:
            return _detect_empty
        uids_c = du[coll]
        keeper = dw[coll]  # min witness per uid (lexsort order)
        res = ray.get(res_ref)
        if res is not None and len(res[0]):
            r_u, r_w = res
            pos = np.minimum(np.searchsorted(r_u, uids_c), len(r_u) - 1)
            in_base = r_u[pos] == uids_c
            keeper = np.where(in_base, r_w[pos], keeper)
        return pa.table(
            {
                "uid": pa.array(uids_c, type=pa.uint64()),
                "keeper_w": pa.array(keeper, type=pa.uint64()),
            }
        )

    for round_no in range(max_rounds + 1):
        if driver_detect:
            blocks = [
                b.select(["_uid", "_uid_w"])
                for b in ray.get(
                    features.select_columns(["_uid", "_uid_w"]).to_arrow_refs()
                )
                if b.num_rows and "_uid" in b.schema.names
            ]
            coll = detect(
                pa.concat_tables(blocks)
                if blocks
                else _detect_empty.rename_columns(["_uid", "_uid_w"])
            ).to_pandas()
        else:
            coll = hash_partition_apply(
                features.select_columns(["_uid", "_uid_w"]),
                num_partitions,
                detect,
                key_fn=_key,
                empty_like=_detect_empty,
                arrow=True,
            ).to_pandas()
        if coll.empty:
            break
        if round_no == max_rounds:
            raise RuntimeError(
                f"uid collisions persist after {max_rounds} salt rounds "
                f"({len(coll)} colliding uids at uid_bits={uid_bits}) — "
                "the uid space is too small for this corpus"
            )
        u_c = coll["uid"].to_numpy(dtype=np.uint64)
        k_w = coll["keeper_w"].to_numpy(dtype=np.uint64)
        order = np.argsort(u_c)
        u_c, k_w = u_c[order], k_w[order]
        seed = UID_SALT_SEEDS[round_no]
        rules.append((u_c, k_w, seed))
        n_collisions += int(len(u_c))
        rule_ref = ray.put((u_c, k_w))
        mask = _uid_mask(uid_bits)

        def rewrite(batch: pa.Table, _seed=seed) -> pa.Table:
            uc, kw = ray.get(rule_ref)
            u = batch.column("_uid").to_numpy(zero_copy_only=False).astype(np.uint64)
            w = batch.column("_uid_w").to_numpy(zero_copy_only=False).astype(np.uint64)
            pos = np.minimum(np.searchsorted(uc, u), len(uc) - 1)
            hit = (uc[pos] == u) & (kw[pos] != w)
            if not hit.any():
                return batch
            ids = batch.column("image_id")
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            idx = np.flatnonzero(hit)
            salted = hashing.text_hash_u64(ids.take(pa.array(idx)), seed=_seed)
            u = u.copy()
            u[idx] = salted & mask
            i = batch.schema.get_field_index("_uid")
            return batch.set_column(i, "_uid", pa.array(u, type=pa.uint64()))

        features = features.map_batches(
            rewrite, batch_format="pyarrow"
        ).materialize()
    return features, rules, n_collisions
