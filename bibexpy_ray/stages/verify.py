"""Edge verification: the reference's staged match decision table on candidate pairs.

Reimplements ``compute_match`` / ``negative_rule_check`` semantics
(/root/reference/apps/api/services/smart_merger.py:205-350) on image+caption
records:

  Stage 0  negative rule   both authority ids present and DIFFERENT -> hard
           reject; never matched, never borderline (DOI-determinative analog).
  Stage 1  authority exact  equal authority ids            -> conf 1.00
  Stage 2  pHash exact      equal 64-bit perceptual hash   -> conf 0.99 (PMID analog)
  Stage 3  caption sim      JW(norm) >= 0.92 AND pHash Hamming <= tol -> conf 0.95
           (title JW >= 0.92 AND year +-1 AND surname equal analog)
  Stage 4  containment      one normalized caption a strict substring of the
           other (len >= floor) AND Hamming <= tol -> conf 0.90
           (journal+volume+pages partial-metadata analog, smart_merger.py:309-334)
  Stage 5  borderline       0.80 <= JW < 0.92 -> side-output queue with linear
           confidence 0.70-0.85; never auto-merged (smart_merger.py:336-348)

Stages 3-5 require both normalized captions non-empty, mirroring the
reference's guard. Ordering is identical to the reference (4 before 5: a
contained pair in the borderline band merges at Stage 4).

Vectorized where it matters: cheap stages decide most edges; Jaro-Winkler runs
only on the undecided remainder (python scalar per pair — candidate pairs are a
tiny post-LSH fraction).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from bibexpy_ray.config import (
    CONF_STAGE1,
    CONF_STAGE2,
    CONF_STAGE3,
    CONF_STAGE4,
    DedupConfig,
    borderline_confidence,
)
from bibexpy_ray.functions.hashing import hamming64
from bibexpy_ray.functions.similarity import (
    jaro_floor_mask,
    jaro_winkler,
    jaro_winkler_batch,
)

#: feature columns each edge side carries into verification
FEATURE_COLS = ["_norm_caption", "phash", "_authority", "_n_shingles"]


def verify_edges_batch(batch: pd.DataFrame, cfg: DedupConfig) -> pd.DataFrame:
    """Verify a batch of candidate edges carrying per-side features.

    Input columns: id_a, id_b, _norm_caption_a/_b, phash_a/_b,
    _authority_a/_b. Output: id_a, id_b, stage, confidence, similarity,
    phash_hamming — only edges that matched a stage (including borderline).
    """
    n = len(batch)
    if n == 0:
        return _empty_out()
    auth_a = batch["_authority_a"].to_numpy(dtype=object)
    auth_b = batch["_authority_b"].to_numpy(dtype=object)
    ph_a = batch["phash_a"].to_numpy()
    ph_b = batch["phash_b"].to_numpy()
    cap_a = batch["_norm_caption_a"].to_numpy(dtype=object)
    cap_b = batch["_norm_caption_b"].to_numpy(dtype=object)

    has_a = np.array([bool(x) for x in auth_a])
    has_b = np.array([bool(x) for x in auth_b])
    auth_eq = np.array([x == y for x, y in zip(auth_a, auth_b)])
    negative = has_a & has_b & ~auth_eq

    ham = hamming64(ph_a.astype(np.int64).view(np.uint64), ph_b.astype(np.int64).view(np.uint64))
    stage = np.full(n, "", dtype=object)
    conf = np.zeros(n, dtype=np.float64)
    sim = np.full(n, np.nan, dtype=np.float64)

    undecided = ~negative
    s1 = undecided & has_a & has_b & auth_eq
    stage[s1] = "1_authority_exact"
    conf[s1] = CONF_STAGE1
    undecided &= ~s1

    s2 = undecided & (ph_a == ph_b)
    stage[s2] = "2_phash_exact"
    conf[s2] = CONF_STAGE2
    undecided &= ~s2

    # Stages 3-5 need both captions non-empty (reference guard :283)
    nonempty = np.array([bool(a) and bool(b) for a, b in zip(cap_a, cap_b)])
    todo = undecided & nonempty
    ham_ok = ham <= cfg.phash_hamming_tol

    # Jaro-Winkler, cheap-first: equal captions are 1.0 outright; remaining
    # pairs pass through the sound DuckDB jaro lower-bound prune
    # (similarity.jaro_floor_mask) — only pairs that can still reach the
    # borderline floor pay the exact scalar call. Pruned pairs keep sim=NaN
    # (provably < sim_borderline_low, so stages 3/5 are impossible for them);
    # stage-4 rows matched below get their exact sim backfilled.
    eq = np.zeros(n, dtype=bool)
    ti = np.flatnonzero(todo)
    eq[ti] = np.array([cap_a[i] == cap_b[i] for i in ti], dtype=bool)
    sim[todo & eq] = 1.0
    rest = np.flatnonzero(todo & ~eq)
    if rest.size:
        maybe = jaro_floor_mask(
            cap_a[rest], cap_b[rest], cfg.sim_borderline_low
        )
        sel = rest[maybe]
        if sel.size:
            # batch kernel: bit-equivalent to the scalar jaro_winkler
            # (property-tested), vectorized across the surviving pairs
            sim[sel] = jaro_winkler_batch(cap_a[sel], cap_b[sel])

    with np.errstate(invalid="ignore"):
        s3 = todo & ham_ok & (sim >= cfg.sim_exact)
    stage[s3] = "3_caption_sim"
    conf[s3] = CONF_STAGE3

    # Stage 4: containment (checked before borderline, like the reference's
    # journal+vol+page stage precedes the borderline band)
    for i in np.flatnonzero(todo & ~s3 & ham_ok):
        a, b = cap_a[i], cap_b[i]
        short, long_ = (a, b) if len(a) <= len(b) else (b, a)
        if (
            len(short) >= cfg.contained_min_chars
            and len(short) < len(long_)
            and short in long_
        ):
            stage[i] = "4_contained"
            conf[i] = CONF_STAGE4
            if np.isnan(sim[i]):  # audit surface carries the exact value
                sim[i] = jaro_winkler(a, b)

    with np.errstate(invalid="ignore"):
        s5 = (
            todo
            & (stage == "")
            & (sim >= cfg.sim_borderline_low)
            & (sim < cfg.sim_exact)
        )
    for i in np.flatnonzero(s5):
        stage[i] = "5_borderline"
        conf[i] = borderline_confidence(sim[i])

    matched = stage != ""
    return pd.DataFrame(
        {
            "id_a": batch["id_a"].to_numpy()[matched],
            "id_b": batch["id_b"].to_numpy()[matched],
            "stage": stage[matched],
            "confidence": conf[matched],
            "similarity": sim[matched],
            "phash_hamming": ham[matched].astype(np.int32),
        }
    )


def _empty_out() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "id_a": pd.Series([], dtype=object),
            "id_b": pd.Series([], dtype=object),
            "stage": pd.Series([], dtype=object),
            "confidence": pd.Series([], dtype=np.float64),
            "similarity": pd.Series([], dtype=np.float64),
            "phash_hamming": pd.Series([], dtype=np.int32),
        }
    )


class EdgeVerifier:
    """Callable ``map_batches`` wrapper around ``verify_edges_batch``.

    Passed as an INSTANCE (task pool): the only state is the small config,
    which ships once in the task closure — an actor pool would add startup
    ramp without amortizing anything."""

    def __init__(self, cfg: DedupConfig | None = None):
        self.cfg = cfg or DedupConfig()

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return verify_edges_batch(batch, self.cfg)
