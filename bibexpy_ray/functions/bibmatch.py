"""Bibliographic staged matcher + survivor merge on reference-shape records.

The 1:1 conformance surface for the reference's decision table
(/root/reference/apps/api/services/smart_merger.py:205-458) over records of
the CONFORMANCE_SCHEMA shape (schema.py — the reference's test `_rec` dicts,
tests/test_smart_merge.py:19-30). The image pipeline generalizes these rules
(stages/verify.py); this module replays them on the original field semantics
so the reference's unit-test suite ports 1:1 (SURVEY.md §5: "the conformance
spec we must reproduce").

Records are dicts with keys: norm_key_a (DOI analog, determinative),
norm_key_b (PMID analog), norm_key_c (ISSN analog, negative-rule-only),
norm_text (title), norm_year, norm_group (first-author surname),
norm_secondary (journal), vl, bp, pg.
"""

from __future__ import annotations

from typing import Any, Optional

from bibexpy_ray.config import (
    CONF_STAGE1,
    CONF_STAGE2,
    CONF_STAGE3,
    CONF_STAGE4,
    SECONDARY_SIMILARITY,
    SIM_BORDERLINE_LOW,
    SIM_EXACT_THRESHOLD,
    YEAR_TOLERANCE,
    borderline_confidence,
)
from bibexpy_ray.functions.fieldmerge import union_values
from bibexpy_ray.functions.normalize import is_empty, to_str
from bibexpy_ray.functions.similarity import jaro_winkler


def _k(rec: dict, key: str) -> Optional[str]:
    v = rec.get(key)
    s = to_str(v)
    return s or None


def negative_rule_check(a: dict, b: dict) -> bool:
    """True ⇒ hard reject (smart_merger.py:205-226): any of the determinative
    keys (DOI / PMID / ISSN analogs) present on BOTH sides and differing.
    The UT analog is deliberately NOT a negative key (WoS UT ≠ Scopus EID)."""
    for key in ("norm_key_a", "norm_key_b", "norm_key_c"):
        va, vb = _k(a, key), _k(b, key)
        if va is not None and vb is not None and va != vb:
            return True
    return False


def doi_conflict(a: dict, b: dict) -> bool:
    """The retro guard re-applied on stored queues (smart_merger.py:229-240):
    determinative-key conflict only (DOI analog)."""
    va, vb = _k(a, "norm_key_a"), _k(b, "norm_key_a")
    return va is not None and vb is not None and va != vb


def compute_match(a: dict, b: dict) -> Optional[dict[str, Any]]:
    """Staged decision table (smart_merger.py:243-350). Returns None (no
    match) or {stage, confidence, similarity} — stage '5_borderline' means
    queue-only, never auto-merged."""
    if negative_rule_check(a, b):
        return None

    # Stage 1: determinative key exact (DOI) — conf 1.00 regardless of text
    va, vb = _k(a, "norm_key_a"), _k(b, "norm_key_a")
    if va is not None and va == vb:
        return {"stage": 1, "confidence": CONF_STAGE1, "similarity": None}

    # Stage 2: secondary id exact (PMID) — conf 0.99
    va, vb = _k(a, "norm_key_b"), _k(b, "norm_key_b")
    if va is not None and va == vb:
        return {"stage": 2, "confidence": CONF_STAGE2, "similarity": None}

    # Stages 3-5 need both titles non-empty (reference guard :283)
    ta, tb = to_str(a.get("norm_text")), to_str(b.get("norm_text"))
    if not ta or not tb:
        return None
    jw = 1.0 if ta == tb else jaro_winkler(ta, tb)

    # Stage 3: title ≥ 0.92 AND |Δyear| ≤ 1 AND surname equal — conf 0.95
    ya, yb = a.get("norm_year"), b.get("norm_year")
    year_ok = ya is not None and yb is not None and abs(int(ya) - int(yb)) <= YEAR_TOLERANCE
    group_ok = (
        to_str(a.get("norm_group")) != ""
        and to_str(a.get("norm_group")) == to_str(b.get("norm_group"))
    )
    if jw >= SIM_EXACT_THRESHOLD and year_ok and group_ok:
        return {"stage": 3, "confidence": CONF_STAGE3, "similarity": jw}

    # Stage 4: journal ≥ 0.90 AND volume equal AND (BP or PG equal) — conf 0.90
    sa, sb = to_str(a.get("norm_secondary")), to_str(b.get("norm_secondary"))
    if sa and sb:
        sjw = 1.0 if sa == sb else jaro_winkler(sa, sb)
        vl_ok = to_str(a.get("vl")) != "" and to_str(a.get("vl")) == to_str(b.get("vl"))
        page_ok = (
            to_str(a.get("bp")) != "" and to_str(a.get("bp")) == to_str(b.get("bp"))
        ) or (to_str(a.get("pg")) != "" and to_str(a.get("pg")) == to_str(b.get("pg")))
        if sjw >= SECONDARY_SIMILARITY and vl_ok and page_ok:
            return {"stage": 4, "confidence": CONF_STAGE4, "similarity": sjw}

    # Stage 5: borderline band — queue only
    if SIM_BORDERLINE_LOW <= jw < SIM_EXACT_THRESHOLD:
        return {
            "stage": 5,
            "confidence": borderline_confidence(jw),
            "similarity": jw,
        }
    return None


# ---------------------------------------------------------------------------
# Survivor merge with the fixed field-preference table
# ---------------------------------------------------------------------------

#: per-field source preference (smart_merger.py:40-57 — fixed and immutable):
#: WOS wins citation/reference fields, SCOPUS wins abstract/author/address,
#: keyword fields union, category fields cross-fill WoS-first.
FIELD_PREFERENCES: dict[str, str] = {
    "TC": "wos", "CR": "wos", "NR": "wos",
    "AB": "scopus", "AU": "scopus", "AF": "scopus", "C1": "scopus",
    "DE": "union", "ID": "union",
    "WC": "crossfill", "SC": "crossfill",
}
DEFAULT_PREFERENCE = "wos"


def merge_pair_with_preferences(
    wos: dict, scopus: dict
) -> tuple[dict, list[dict]]:
    """Field merge of one matched (WoS, Scopus) pair (smart_merger.py:388-458).

    Returns (merged, conflict_log). Conflicts are both-non-empty,
    case-insensitively-different values on preference-resolved fields.
    """
    merged: dict[str, Any] = {}
    conflicts: list[dict] = []
    for field in sorted(set(wos) | set(scopus)):
        wv, sv = wos.get(field), scopus.get(field)
        pref = FIELD_PREFERENCES.get(field, DEFAULT_PREFERENCE)
        if pref == "union":
            merged[field] = union_values([wv, sv])
        elif pref == "crossfill":
            # WoS-first, Scopus fills blanks (smart_merger.py WC/SC rows)
            merged[field] = to_str(wv) if not is_empty(wv) else to_str(sv)
        else:
            primary, secondary = (wv, sv) if pref == "wos" else (sv, wv)
            merged[field] = to_str(primary) if not is_empty(primary) else to_str(secondary)
        # conflict log for EVERY preference kind (the reference checks after
        # _apply_preference regardless of rule, smart_merger.py:441-452)
        if (
            not is_empty(wv)
            and not is_empty(sv)
            and to_str(wv).lower().strip() != to_str(sv).lower().strip()
        ):
            conflicts.append(
                {"field": field, "chosen_source": pref, "wos": to_str(wv),
                 "scopus": to_str(sv)}
            )
    return merged, conflicts
