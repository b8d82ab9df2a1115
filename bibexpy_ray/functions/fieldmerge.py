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


def clean_merged_values(x: Any) -> Any:
    """1:1 parity with MergeDB.py:44-61 clean_merged_values: split on ';'
    ONLY, strip, drop empties, CASE-SENSITIVE first-seen dedup, rejoin '; '.
    Non-strings pass through unchanged (the reference's isinstance guard).
    Distinct from ``union_values``, which is the case-insensitive ';'/'|'
    multi-value union used by the merge policies."""
    if not isinstance(x, str):
        return x
    seen: set[str] = set()
    out: list[str] = []
    for part in x.split(";"):
        p = part.strip()
        if p and p not in seen:
            seen.add(p)
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


# ---------------------------------------------------------------------------
# Specialized per-field mergers (MergeDB.py:433-530 merge_language, :595-664
# merge_open_access, :210-278 merge_references — semantics reimplemented)
# ---------------------------------------------------------------------------

#: language code/name → canonical name (MergeDB.py:447-480; ASCII-folded keys
#: only — the reference folds input through unidecode before lookup, so its
#: non-ASCII keys are unreachable and are intentionally not carried over)
LANGUAGE_MAP: dict[str, str] = {
    "ENG": "ENGLISH",
    "EN": "ENGLISH",
    "FRE": "FRENCH",
    "FR": "FRENCH",
    "GER": "GERMAN",
    "DE": "GERMAN",
    "SPA": "SPANISH",
    "ES": "SPANISH",
    "ITA": "ITALIAN",
    "IT": "ITALIAN",
    "POR": "PORTUGUESE",
    "PT": "PORTUGUESE",
    "RUS": "RUSSIAN",
    "RU": "RUSSIAN",
    "CHI": "CHINESE",
    "ZH": "CHINESE",
    "JPN": "JAPANESE",
    "JA": "JAPANESE",
    "ESPANOL": "SPANISH",
    "FRANCAIS": "FRENCH",
    "DEUTSCHE": "GERMAN",
    "PORTUGUES": "PORTUGUESE",
    "ITALIANO": "ITALIAN",
    "RUSSKIY": "RUSSIAN",
}

_WS_RE = re.compile(r"\s+")


def _ascii_fold_upper(s: str) -> str:
    import unicodedata

    s = _WS_RE.sub(" ", s.strip())
    return (
        unicodedata.normalize("NFKD", s).encode("ascii", "ignore").decode("ascii").upper()
    )


def standardize_language(lang: Any) -> str:
    """Fold → upper → split ';' → map each token → sorted unique rejoin
    (MergeDB.py:482-501 standardize_language)."""
    s = to_str(lang)
    if not s:
        return ""
    toks = [t.strip() for t in _ascii_fold_upper(s).split(";")]
    std = [LANGUAGE_MAP.get(t, t) for t in toks if t]
    return "; ".join(sorted(set(std)))


def merge_language(wos_lang: Any, scopus_lang: Any) -> str:
    """Union of standardized languages; ENGLISH default when both blank
    (MergeDB.py:504-521)."""
    w, s = standardize_language(wos_lang), standardize_language(scopus_lang)
    if w and s:
        return "; ".join(sorted(set(w.split("; ")) | set(s.split("; "))))
    return w or s or "ENGLISH"


#: OA status variants → canonical status (MergeDB.py:608-630)
OA_STATUS_MAP: dict[str, str] = {
    "OPEN ACCESS": "OPEN ACCESS",
    "OA": "OPEN ACCESS",
    "GOLD": "GOLD OPEN ACCESS",
    "GOLD OPEN ACCESS": "GOLD OPEN ACCESS",
    "GREEN": "GREEN OPEN ACCESS",
    "GREEN OPEN ACCESS": "GREEN OPEN ACCESS",
    "BRONZE": "BRONZE OPEN ACCESS",
    "BRONZE OPEN ACCESS": "BRONZE OPEN ACCESS",
    "HYBRID": "HYBRID OPEN ACCESS",
    "HYBRID OPEN ACCESS": "HYBRID OPEN ACCESS",
    "ALL OPEN ACCESS": "OPEN ACCESS",
    "PUBLISHED": "OPEN ACCESS",
    "FREE": "OPEN ACCESS",
    "PUBLISHERFULLGOLD": "GOLD OPEN ACCESS",
    "REPOSITORY": "GREEN OPEN ACCESS",
    "SUBSCRIPTION": "NON OPEN ACCESS",
    "NON-OA": "NON OPEN ACCESS",
    "CLOSED": "NON OPEN ACCESS",
}


def standardize_oa_status(oa: Any) -> str:
    s = to_str(oa)
    if not s:
        return ""
    folded = _ascii_fold_upper(s)
    return OA_STATUS_MAP.get(folded, folded)


def merge_open_access(wos_oa: Any, scopus_oa: Any) -> str:
    """Specific-beats-generic OA merge: a named tier (GOLD/GREEN/…) beats the
    generic 'OPEN ACCESS'; both specific and differing → WoS wins; both blank
    → 'NON OPEN ACCESS' (MergeDB.py:643-664)."""
    w, s = standardize_oa_status(wos_oa), standardize_oa_status(scopus_oa)
    if not w and s:
        return s
    if w and not s:
        return w
    if w and s and w != s:
        if w == "OPEN ACCESS":
            return s
        if s == "OPEN ACCESS":
            return w
        return w
    return w or "NON OPEN ACCESS"


_NON_ALNUM_RE = re.compile(r"[^A-Z0-9]")
_TRAIL_YEAR_RE = re.compile(r"\((\d{4})\)$")
_YEAR_RE = re.compile(r"\d{4}")


def reference_key(ref: str) -> str:
    """author_year key for one citation string (MergeDB.py:233-256
    create_ref_key): Scopus style ends '(YYYY)'; WoS style 'Author, YYYY, …';
    unrecognized formats fall back to the cleaned whole string."""
    r = ref.upper().strip()
    if r.endswith(")"):
        m = _TRAIL_YEAR_RE.search(r)
        if m:
            author = _NON_ALNUM_RE.sub("", r.split(",")[0])
            return f"{author}_{m.group(1)}"
    parts = r.split(",")
    if len(parts) >= 2:
        m = _YEAR_RE.search(parts[1])
        if m:
            return f"{_NON_ALNUM_RE.sub('', parts[0])}_{m.group()}"
    return _NON_ALNUM_RE.sub("", r)


def merge_references(wos_refs: Any, scopus_refs: Any) -> str:
    """Reference-list merge keyed by author_year: WoS formatting preferred per
    key, Scopus-only keys appended (MergeDB.py:258-278). Divergence from the
    reference, documented: the reference iterates a Python set (order
    nondeterministic run-to-run); this emits WoS order then Scopus-only order
    so task retries are reproducible.
    """

    def split_refs(s: Any) -> list[str]:
        t = to_str(s)
        return [r.strip() for r in t.split(";") if r.strip()] if t else []

    wos_list, scopus_list = split_refs(wos_refs), split_refs(scopus_refs)
    # dict semantics like the reference: LAST occurrence of a key within one
    # source wins; WoS value preferred when both sources share a key
    wos_d = {reference_key(r): r for r in wos_list}
    sco_d = {reference_key(r): r for r in scopus_list}
    out: list[str] = []
    seen: set[str] = set()
    for ref in wos_list + scopus_list:
        k = reference_key(ref)
        if k not in seen:
            seen.add(k)
            out.append(wos_d.get(k, sco_d.get(k, ref)))
    return "; ".join(out)


# ---------------------------------------------------------------------------
# Remaining specialized two-source mergers (MergeDB.py:63-733 — semantics
# reimplemented; together with language/open_access/references above this is
# the reference's complete 15-merger family)
# ---------------------------------------------------------------------------


def _ascii_fold(s: str) -> str:
    """Whitespace-collapsed, accent-folded, case-PRESERVED (the unidecode
    analog used by the keyword/publisher cleaners)."""
    import unicodedata

    s = _WS_RE.sub(" ", s.strip())
    return unicodedata.normalize("NFKD", s).encode("ascii", "ignore").decode("ascii")


_LETTERS_ONLY_RE = re.compile(r"[^A-Z]")


def author_key(author: str) -> str:
    """Matching key for a short-form author: letters of the first token,
    folded upper (MergeDB.py:82-89)."""
    parts = _ascii_fold_upper(author).split()
    return _LETTERS_ONLY_RE.sub("", parts[0]) if parts else ""


def merge_author_fields(wos_authors: Any, scopus_authors: Any) -> str:
    """AU merge, WoS format as reference (MergeDB.py:63-106): WoS authors
    first in their order, then Scopus authors whose key is absent from WoS.
    Faithful to the reference: Scopus-vs-Scopus duplicates are NOT collapsed
    (only the WoS dict is consulted)."""
    wos_list = [a.strip() for a in to_str(wos_authors).split(";") if a.strip()]
    wos_keys = {author_key(a) for a in wos_list}
    merged = wos_list.copy()
    for a in (a.strip() for a in to_str(scopus_authors).split(";")):
        if a and author_key(a) not in wos_keys:
            merged.append(a)
    return "; ".join(merged)


_PAREN_ID_RE = re.compile(r"\s*\([^)]*\)")


def clean_fullname(author: str) -> str:
    """Drop '(...)' ids, collapse whitespace, fold accents (MergeDB.py:119-127)."""
    return _ascii_fold(_PAREN_ID_RE.sub("", author))


def fullname_key(author: str) -> str:
    """LASTNAME key of a 'Last, First' full name; '' when no comma
    (MergeDB.py:128-136)."""
    parts = clean_fullname(author).split(",", 1)
    return parts[0].strip().upper() if len(parts) >= 2 else ""


def merge_author_fullnames(wos_af: Any, scopus_af: Any) -> str:
    """AF merge (MergeDB.py:108-156): WoS full names verbatim, then CLEANED
    Scopus names with a non-empty lastname key absent from WoS. Joined with
    ';' (no space) — the reference's exact output quirk."""
    wos_list = [a.strip() for a in to_str(wos_af).split(";") if a.strip()]
    wos_keys = {fullname_key(a) for a in wos_list}
    merged = wos_list.copy()
    for a in (a.strip() for a in to_str(scopus_af).split(";")):
        if not a:
            continue
        k = fullname_key(a)
        if k and k not in wos_keys:
            merged.append(clean_fullname(a))
    return ";".join(merged)


def merge_address_fields(wos_addresses: Any, scopus_addresses: Any) -> str:
    """C1: Scopus wins when present, else WoS (MergeDB.py:157-184)."""
    return to_str(scopus_addresses).strip() or to_str(wos_addresses).strip()


def merge_reprint_author(wos_rp: Any, scopus_rp: Any) -> str:
    """RP: WoS wins when present, else Scopus, no formatting (MergeDB.py:186-208)."""
    return to_str(wos_rp).strip() or to_str(scopus_rp).strip()


_COPYRIGHT_RE = re.compile(r"©.*?RESERVED\.?$", re.IGNORECASE)


def clean_abstract(ab: Any) -> str:
    s = to_str(ab)
    if not s:
        return ""
    return _COPYRIGHT_RE.sub("", _WS_RE.sub(" ", s.strip())).strip()


def merge_abstracts(wos_ab: Any, scopus_ab: Any) -> str:
    """AB: copyright-tail-stripped, longer text wins; length tie → Scopus
    (MergeDB.py:280-312's exact comparison)."""
    w, s = clean_abstract(wos_ab), clean_abstract(scopus_ab)
    if not w:
        return s
    if not s:
        return w
    return w if len(w) > len(s) else s


def merge_keyword_lists(wos_keywords: Any, scopus_keywords: Any) -> str:
    """DE / ID merge (MergeDB.py:313-395, identical for both tags): fold
    accents preserving case, first occurrence wins a case-insensitive dedup
    (WoS order first), then case-insensitive alphabetical sort."""

    toks = [
        c
        for src in (wos_keywords, scopus_keywords)
        for kw in to_str(src).split(";")
        if (c := _ascii_fold(kw))
    ]
    seen: set[str] = set()
    uniq: list[str] = []
    for kw in toks:
        u = kw.upper()
        if u not in seen:
            seen.add(u)
            uniq.append(kw)
    uniq.sort(key=str.upper)
    return "; ".join(uniq)


merge_keywords = merge_keyword_lists
merge_index_keywords = merge_keyword_lists


def merge_publisher(wos_pub: Any, scopus_pub: Any) -> str:
    """PU: accent-folded, longer name wins (usually more complete); tie →
    WoS (MergeDB.py:397-431's exact comparison)."""
    w, s = _ascii_fold(to_str(wos_pub)), _ascii_fold(to_str(scopus_pub))
    if not w:
        return s
    if not s:
        return w
    return s if len(s) > len(w) else w


_DT_CLEAN_RE = re.compile(r"[^A-Z0-9\s]")


def merge_document_type(wos_dt: Any, scopus_dt: Any) -> str:
    """DT: upper-fold, strip punctuation, union of ';'-split types, sorted
    (MergeDB.py:522-569). Faithful quirk: the cleaner strips ';' BEFORE the
    multi-type split (as the reference does), so each source contributes one
    cleaned type string and the split is effectively a two-element union."""

    def clean(dt: Any) -> str:
        s = to_str(dt)
        return _DT_CLEAN_RE.sub("", _ascii_fold_upper(s)) if s else ""

    w, s = clean(wos_dt), clean(scopus_dt)
    if not w:
        return s
    if not s:
        return w
    types = {t.strip() for t in w.split(";") if t.strip()}
    types |= {t.strip() for t in s.split(";") if t.strip()}
    return "; ".join(sorted(types))


def merge_url(wos_url: Any, scopus_url: Any) -> str:
    """URL: WoS wins when present, else Scopus (MergeDB.py:571-593)."""
    return to_str(wos_url).strip() or to_str(scopus_url).strip()


def merge_source_title(wos_so: Any, scopus_so: Any) -> str:
    """SO: Scopus preferred when both exist (MergeDB.py:701-733)."""
    w = _WS_RE.sub(" ", to_str(wos_so).strip())
    s = _WS_RE.sub(" ", to_str(scopus_so).strip())
    return s or w


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

#: specialized two-source mergers (field policy → fn(wos_value, scopus_value));
#: in merge_record the first/second entries of ``source_order`` play the
#: wos/scopus roles
_TWO_SOURCE_FNS: dict[str, Callable[[Any, Any], str]] = {
    "language": merge_language,
    "open_access": merge_open_access,
    "references": merge_references,
    "author_fields": merge_author_fields,
    "author_fullnames": merge_author_fullnames,
    "address": merge_address_fields,
    "reprint": merge_reprint_author,
    "abstract": merge_abstracts,
    "keywords": merge_keyword_lists,
    "index_keywords": merge_keyword_lists,
    "publisher": merge_publisher,
    "document_type": merge_document_type,
    "url": merge_url,
    "source_title": merge_source_title,
}


def register_policy(name: str, fn, two_source: bool = False) -> None:
    """Extension surface: register a custom merge policy under ``name``.

    ``fn`` takes ``list[values] -> str`` (or ``(a, b) -> str`` with
    ``two_source=True``, where a/b are the first/second source_order values).
    Registries are per-process — Ray workers resolve policy NAMES in their own
    interpreter, so call this at import time in a module the workers also
    import. To skip the registry entirely, pass the callable itself as the
    policy value in ``policies`` (it ships inside the task closure).
    """
    if not callable(fn):
        raise TypeError("policy fn must be callable")
    (_TWO_SOURCE_FNS if two_source else _POLICY_FNS)[name] = fn


def available_policies() -> dict[str, list[str]]:
    return {
        "value": sorted(_POLICY_FNS),
        "two_source": sorted(_TWO_SOURCE_FNS),
        "other": ["priority_source"],
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
        if callable(policy):
            # extension surface: a policy callable ships in the task closure
            # (no registry round-trip); conflicts are the callable's concern
            merged[f] = policy(values)
            continue
        if policy in _TWO_SOURCE_FNS and source_field:
            order = source_order or []
            a = first_non_blank(
                [v for v, s in zip(values, sources) if order and s == order[0]]
            )
            b = first_non_blank(
                [v for v, s in zip(values, sources) if len(order) > 1 and s == order[1]]
            )
            merged[f] = _TWO_SOURCE_FNS[policy](a, b)
            continue
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
