"""Engine configuration constants.

Threshold values mirror the reference's Smart Merge constants
(/root/reference/apps/api/services/smart_merger.py:60-69): title-similarity
threshold 0.92, borderline band lower bound 0.80, year tolerance ±1, journal
(secondary) similarity 0.90, and the 20-word stopword list used by title
normalization. The shingle / signature config (char 5-gram shingles, 128 MinHash
permutations, 64-bit SimHash) is mandated by BASELINE.json.
"""

from __future__ import annotations

from dataclasses import dataclass, field


#: Stopwords removed by text normalization (reference smart_merger.py:66-69).
STOPWORDS: frozenset[str] = frozenset(
    {
        "the", "a", "an", "of", "in", "on", "and", "or", "for", "to", "with",
        "by", "from", "as", "at", "is", "are", "was", "were", "be", "been",
    }
)

#: Stage-3 primary similarity threshold (smart_merger.py:60 TITLE_EXACT_THRESHOLD).
SIM_EXACT_THRESHOLD = 0.92
#: Stage-5 borderline band lower bound (smart_merger.py:61 TITLE_BORDERLINE_LOW).
SIM_BORDERLINE_LOW = 0.80
#: Stage-4 secondary-field similarity (smart_merger.py:63 JOURNAL_SIMILARITY).
SECONDARY_SIMILARITY = 0.90
#: Stage-3 numeric tolerance (smart_merger.py:62 YEAR_TOLERANCE).
YEAR_TOLERANCE = 1

#: Per-stage confidences (smart_merger.py:254-348).
CONF_STAGE1 = 1.00
CONF_STAGE2 = 0.99
CONF_STAGE3 = 0.95
CONF_STAGE4 = 0.90


def borderline_confidence(sim: float) -> float:
    """Linear 0.70–0.85 confidence over the borderline band (smart_merger.py:338-341)."""
    lo, hi = SIM_BORDERLINE_LOW, SIM_EXACT_THRESHOLD
    conf = 0.70 + (sim - lo) * (0.85 - 0.70) / (hi - lo)
    return round(conf, 3)


@dataclass(frozen=True)
class DedupConfig:
    """Configuration for the near-duplicate pipeline.

    Defaults follow BASELINE.json's mandated signature config: char 5-gram
    shingles, 128 MinHash permutations, 64-bit SimHash, pHash Hamming.
    """

    shingle_k: int = 5                 # char n-gram width
    num_perms: int = 128               # MinHash permutations
    lsh_bands: int = 32                # b bands ...
    lsh_rows: int = 4                  # ... of r rows each (b*r == num_perms)
    # r=4 keeps P(candidate) ≈ 1 for true near-dups (j ≥ 0.9 ⇒ ≥ 1-1e-6) while
    # suppressing the word-overlap noise floor (j ≤ 0.1 ⇒ ≤ 1e-3) that made
    # r=2 quadratic in corpus size. Low-jaccard-but-prefix-sharing pairs
    # (borderline band, contained captions) are caught deterministically by the
    # prefix block below — the reference's (year, surname[0]) exact-key
    # blocking analog (smart_merger.py:185-198).
    prefix_block_chars: int = 12       # exact-equality block on the first k norm chars
    min_shingles: int = 4              # rows with fewer shingles skip LSH (skew floor)
    phash_bands: int = 4               # 4 x 16-bit bands -> guaranteed candidate at Hamming<=3
    phash_hamming_tol: int = 8         # Stage-3 side-constraint (year-tolerance analog)
    sim_exact: float = SIM_EXACT_THRESHOLD
    sim_borderline_low: float = SIM_BORDERLINE_LOW
    contained_min_chars: int = 20      # Stage-4 containment floor
    substring_pass: bool = True        # suffix-array containment candidates
    bucket_pair_cap: int = 2048        # max pairs emitted per LSH bucket before splitting
    seed: int = 42
    # uid width in bits (production 64). The numeric row uid is made
    # COLLISION-FREE per run by stages/signer.resolve_uid_collisions (detect
    # colliding uids in one co-partition pass, salted-rehash the losers), so
    # this knob exists for the collision-injection regression tests: masking
    # the uid to few bits floods the resolver with collisions on a small
    # corpus, and the pipeline must still produce bit-identical clusters.
    uid_bits: int = 64
    signer_batch_size: int = 4096
    signer_concurrency: int | None = None  # None -> let Ray size the pool
    # path-input runs checkpoint the signature stage per input-file group
    # (RunDir.materialize_partitioned); one part per group of
    # ceil(n_files / feature_checkpoint_parts) files
    feature_checkpoint_parts: int = 16

    def __post_init__(self) -> None:
        if self.lsh_bands * self.lsh_rows != self.num_perms:
            raise ValueError("lsh_bands * lsh_rows must equal num_perms")
        if not 1 <= self.uid_bits <= 64:
            raise ValueError("uid_bits must be in [1, 64]")


DEFAULT_CONFIG = DedupConfig()


def tune_data_context(payload: str = "records") -> None:
    """Size Ray Data block targets to the payload class (call from OWNED Ray
    sessions only — CLI entry points and bench, never from library functions,
    which must not mutate a session they don't own).

    - "records": leave Ray's default block target (128 MiB) — right for the
      narrow id/signature tables every shuffle here moves.
    - "binary": shrink the block target so a batch x actor-pool concurrency
      of image/audio/video payload rows fits in a worker heap; large opaque
      payload columns make the default 128 MiB block ~100k+ rows, and a few
      of those pinned per actor is the OOM path at 100 TB.
    """
    from ray.data import DataContext

    ctx = DataContext.get_current()
    if payload == "binary":
        ctx.target_max_block_size = 32 * 1024 * 1024
