"""Per-field value mergers: the reference's MergeDB/SmartMerge merge policies.

Semantics reimplemented (NOT copied) from /root/reference/packages/bibex_core/
MergeDB.py and /root/reference/apps/api/services/smart_merger.py:388-458:

- ``union_values``      split on ';'/'|', case-insensitive dedup preserving
                        first-seen order, rejoin '; '  (smart_merger.py:369-385,
                        MergeDB.py merge_keywords :313)
- ``longer_wins``       longest non-blank value (merge_abstracts :280,
                        merge_publisher :397)
- ``first_non_blank``   priority-ordered coalesce (exact-dedup agg,
                        MergeDB.py:14-25 merge_values)
- ``priority_source``   fixed source-preference table: per-field winner by
                        source rank, conflict logged when both non-blank and
                        differing case-insensitively (smart_merger.py:40-57,
                        388-458)
- ``merge_record``      fold a cluster's rows into one canonical record using
                        a per-field policy map + conflict log — the Phase-4
                        field-merge engine as a reusable reduce function for
                        per-cluster ``map_groups``.
"""

from __future__ import annotations

import re
from typing import Any, Callable

from bibexpy_ray.functions.normalize import is_empty, to_str

_SPLIT_RE = re.compile(r"[;|]")


def union_values(values: list[Any]) -> str:
    """Multi-valued union: case-insensitive dedup preserving first-seen order."""
    seen: set[str] = set()
    out: list[str] = []
    for v in values:
        s = to_str(v)
        if not s:
            continue
        for part in _SPLIT_RE.split(s):
            p = part.strip()
            if p and p.lower() not in seen:
                seen.add(p.lower())
                out.append(p)
    return "; ".join(out)


def longer_wins(values: list[Any]) -> str:
    """Longest non-blank value; earlier value wins ties (stable)."""
    best = ""
    for v in values:
        s = to_str(v)
        if len(s) > len(best):
            best = s
    return best


def first_non_blank(values: list[Any]) -> str:
    for v in values:
        s = to_str(v)
        if s and s.lower() != "nan":
            return s
    return ""


def priority_source(
    values: list[Any], sources: list[str], order: list[str]
) -> tuple[str, bool]:
    """Pick by source priority; returns (winner, conflict).

    conflict = at least two non-blank values differ case-insensitively
    (smart_merger.py _apply_preference conflict logging)."""
    non_blank = [to_str(v) for v in values if not is_empty(v)]
    conflict = len({v.lower() for v in non_blank}) > 1
    rank = {s: i for i, s in enumerate(order)}
    best_val, best_rank = "", len(order) + 1
    for v, s in zip(values, sources):
        sv = to_str(v)
        if not sv:
            continue
        r = rank.get(s, len(order))
        if r < best_rank:
            best_val, best_rank = sv, r
    return best_val, conflict


MergePolicy = Callable[[list[Any]], str]

#: default per-field policies for the image+caption record (the Caputo-table
#: analog: fixed, documented, immutable per run)
DEFAULT_POLICIES: dict[str, str] = {
    "caption": "longer_wins",
    "fmt": "first_non_blank",
    "image_id": "first_non_blank",
}

_POLICY_FNS: dict[str, MergePolicy] = {
    "union": union_values,
    "longer_wins": longer_wins,
    "first_non_blank": first_non_blank,
}


def merge_record(
    rows: list[dict[str, Any]],
    policies: dict[str, str] | None = None,
    source_field: str | None = None,
    source_order: list[str] | None = None,
) -> tuple[dict[str, Any], list[dict[str, Any]]]:
    """Fold cluster member rows into one canonical record.

    Returns (merged_record, conflict_log_rows). Fields not named in
    ``policies`` default to first_non_blank. When ``source_field`` and
    ``source_order`` are given, a field policy of 'priority_source' uses them.
    """
    policies = {**DEFAULT_POLICIES, **(policies or {})}
    if not rows:
        return {}, []
    fields = list(rows[0].keys())
    merged: dict[str, Any] = {}
    conflicts: list[dict[str, Any]] = []
    sources = [to_str(r.get(source_field, "")) for r in rows] if source_field else []
    for f in fields:
        values = [r.get(f) for r in rows]
        policy = policies.get(f, "first_non_blank")
        if policy == "priority_source" and source_field:
            val, conflict = priority_source(values, sources, source_order or [])
            if conflict:
                conflicts.append(
                    {"field": f, "chosen": val, "values": union_values(values)}
                )
            merged[f] = val
            continue
        fn = _POLICY_FNS.get(policy, first_non_blank)
        merged[f] = fn(values)
        non_blank = {to_str(v).lower() for v in values if not is_empty(v)}
        if policy == "first_non_blank" and len(non_blank) > 1:
            conflicts.append(
                {"field": f, "chosen": merged[f], "values": union_values(values)}
            )
    return merged, conflicts
