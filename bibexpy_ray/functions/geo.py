"""C1 address parsing + country/institution standardization (pure functions).

Semantics reimplemented (NOT copied) from the reference's geographic
disambiguation family:

- country variant/code dictionaries and ``canonical_country`` /
  ``country_from_code``: /root/reference/packages/bibex_core/modules/
  c1_utils.py:16-139 (the dictionaries are factual name mappings — any
  correct implementation contains the same facts; entries are regenerated
  from the WoS/Scopus/ISO conventions the reference documents)
- ``split_c1_addresses`` (bracket-aware ';' splitter), ``parse_c1_address``
  (parent institution + country extraction): c1_utils.py:191-257
- structure-preserving rewrite helpers ``replace_country_in_c1`` /
  ``append_country_to_c1`` / ``replace_affiliation_in_c1`` /
  ``replace_org_in_c1``: c1_utils.py:289-418

These are scalar kernels; the distributed stages live in
``bibexpy_ray.pipelines.geo`` (dictionary lookups are broadcast once per
actor, never rebuilt per batch).
"""

from __future__ import annotations

import re
from typing import Optional

#: country-name variant (lowercase) -> canonical English name. Covers the WoS
#: all-caps conventions (USA, PEOPLES R CHINA, ENGLAND...) and Scopus long
#: forms, per the reference's dictionary (c1_utils.py:16-47).
COUNTRY_VARIANTS: dict[str, str] = {
    "usa": "United States", "u.s.a.": "United States", "u.s.a": "United States",
    "us": "United States", "u.s.": "United States", "u s a": "United States",
    "united states of america": "United States", "america": "United States",
    "united states": "United States",
    "uk": "United Kingdom", "u.k.": "United Kingdom", "great britain": "United Kingdom",
    "england": "United Kingdom", "scotland": "United Kingdom", "wales": "United Kingdom",
    "northern ireland": "United Kingdom", "north ireland": "United Kingdom",
    "united kingdom": "United Kingdom",
    "peoples r china": "China", "p r china": "China", "prc": "China",
    "peoples republic of china": "China", "china": "China", "mainland china": "China",
    "south korea": "South Korea", "korea": "South Korea",
    "republic of korea": "South Korea", "korea rep": "South Korea",
    "korea (south)": "South Korea",
    "north korea": "North Korea", "dprk": "North Korea",
    "russia": "Russia", "russian federation": "Russia", "ussr": "Russia",
    "turkiye": "Turkey", "türkiye": "Turkey", "turkey": "Turkey",
    "iran": "Iran", "islamic republic of iran": "Iran",
    "czechia": "Czech Republic", "czech republic": "Czech Republic",
    "netherlands": "Netherlands", "the netherlands": "Netherlands",
    "holland": "Netherlands",
    "uae": "United Arab Emirates", "u arab emirates": "United Arab Emirates",
    "united arab emirates": "United Arab Emirates",
    "germany": "Germany", "deutschland": "Germany", "fed rep ger": "Germany",
    "viet nam": "Vietnam", "vietnam": "Vietnam",
    "taiwan": "Taiwan", "rep of china": "Taiwan",
    "hong kong": "Hong Kong", "macau": "Macau", "macao": "Macau",
    "saudi arabia": "Saudi Arabia", "ksa": "Saudi Arabia",
    "brasil": "Brazil", "brazil": "Brazil",
    "espana": "Spain", "españa": "Spain", "spain": "Spain",
    "cote d'ivoire": "Ivory Coast", "ivory coast": "Ivory Coast",
}

#: names already canonical (no rewrite needed) — variant targets + common
#: single-form countries (c1_utils.py:51-62).
CANONICAL_COUNTRIES: set[str] = set(COUNTRY_VARIANTS.values()) | {
    "France", "Italy", "Japan", "Canada", "Australia", "India", "Mexico",
    "Poland", "Sweden", "Norway", "Denmark", "Finland", "Belgium", "Austria",
    "Switzerland", "Portugal", "Greece", "Ireland", "Israel", "Egypt", "Pakistan",
    "Indonesia", "Malaysia", "Thailand", "Singapore", "Philippines", "Argentina",
    "Chile", "Colombia", "Peru", "South Africa", "Nigeria", "Kenya", "Morocco",
    "Romania", "Hungary", "Ukraine", "Bulgaria", "Croatia", "Serbia", "Slovenia",
    "Slovakia", "Lithuania", "Latvia", "Estonia", "Qatar", "Kuwait", "Jordan",
    "Lebanon", "Iraq", "New Zealand", "Bangladesh", "Sri Lanka", "Nepal",
}
_CANON_LOWER = {c.lower(): c for c in CANONICAL_COUNTRIES}

#: ISO 3166-1 alpha-2 code -> the SAME canonical names (c1_utils.py:107-139)
COUNTRY_CODE_TO_NAME: dict[str, str] = {
    "US": "United States", "GB": "United Kingdom", "CN": "China",
    "KR": "South Korea", "KP": "North Korea", "RU": "Russia", "TR": "Turkey",
    "IR": "Iran", "CZ": "Czech Republic", "NL": "Netherlands",
    "AE": "United Arab Emirates", "DE": "Germany", "VN": "Vietnam",
    "TW": "Taiwan", "HK": "Hong Kong", "MO": "Macau", "SA": "Saudi Arabia",
    "BR": "Brazil", "ES": "Spain", "CI": "Ivory Coast", "FR": "France",
    "IT": "Italy", "JP": "Japan", "CA": "Canada", "AU": "Australia",
    "IN": "India", "MX": "Mexico", "PL": "Poland", "SE": "Sweden",
    "NO": "Norway", "DK": "Denmark", "FI": "Finland", "BE": "Belgium",
    "AT": "Austria", "CH": "Switzerland", "PT": "Portugal", "GR": "Greece",
    "IE": "Ireland", "IL": "Israel", "EG": "Egypt", "PK": "Pakistan",
    "ID": "Indonesia", "MY": "Malaysia", "TH": "Thailand", "SG": "Singapore",
    "PH": "Philippines", "AR": "Argentina", "CL": "Chile", "CO": "Colombia",
    "PE": "Peru", "ZA": "South Africa", "NG": "Nigeria", "KE": "Kenya",
    "MA": "Morocco", "RO": "Romania", "HU": "Hungary", "UA": "Ukraine",
    "BG": "Bulgaria", "HR": "Croatia", "RS": "Serbia", "SI": "Slovenia",
    "SK": "Slovakia", "LT": "Lithuania", "LV": "Latvia", "EE": "Estonia",
    "QA": "Qatar", "KW": "Kuwait", "JO": "Jordan", "LB": "Lebanon",
    "IQ": "Iraq", "NZ": "New Zealand", "BD": "Bangladesh", "LK": "Sri Lanka",
    "NP": "Nepal", "LU": "Luxembourg", "IS": "Iceland", "CY": "Cyprus",
    "MT": "Malta", "EC": "Ecuador", "UY": "Uruguay", "VE": "Venezuela",
    "CU": "Cuba", "CR": "Costa Rica", "PA": "Panama", "BO": "Bolivia",
    "PY": "Paraguay", "TN": "Tunisia", "DZ": "Algeria", "ET": "Ethiopia",
    "GH": "Ghana", "TZ": "Tanzania", "UG": "Uganda", "CM": "Cameroon",
    "SN": "Senegal", "OM": "Oman", "BH": "Bahrain", "YE": "Yemen",
    "SY": "Syria", "AF": "Afghanistan", "KZ": "Kazakhstan", "UZ": "Uzbekistan",
    "AZ": "Azerbaijan", "GE": "Georgia", "AM": "Armenia", "BY": "Belarus",
    "MD": "Moldova", "MK": "North Macedonia", "AL": "Albania",
    "BA": "Bosnia and Herzegovina", "MM": "Myanmar", "KH": "Cambodia",
    "LA": "Laos", "MN": "Mongolia", "BN": "Brunei", "FJ": "Fiji",
    "PG": "Papua New Guinea", "ZW": "Zimbabwe", "ZM": "Zambia", "BW": "Botswana",
}


def _norm_country_token(token: str) -> str:
    t = str(token or "").strip().lower().rstrip(".")
    return re.sub(r"\s+", " ", t)


def canonical_country(token: str) -> Optional[str]:
    """Country-name variant -> canonical English name; None if unknown
    (unknown tokens go to the Tier-2 similarity-cluster path)."""
    t = _norm_country_token(token)
    if not t:
        return None
    if t in COUNTRY_VARIANTS:
        return COUNTRY_VARIANTS[t]
    return _CANON_LOWER.get(t)


def country_from_code(cc: str) -> Optional[str]:
    """ISO alpha-2 code (US, GB, CN, ...) -> canonical English name."""
    return COUNTRY_CODE_TO_NAME.get(str(cc or "").strip().upper())


# ── institution detection (c1_utils.py:141-186) ────────────────────────────

#: unambiguous org words: prefix match is safe (long + distinctive)
_ORG_KW_PREFIX = (
    "univ", "institut", "college", "hospital", "clinic", "center", "centre",
    "laborator", "academ", "polytech", "hochschule", "universidad",
    "universita", "ministr", "council", "foundation", "klinik",
)
#: abbreviations / short risky words: EXACT token match only ('tech' would
#: otherwise swallow place names like 'Techny')
_ORG_KW_EXACT = (
    "inst", "coll", "hosp", "ctr", "lab", "acad", "natl", "fdn", "sch", "dept",
    "polytechnic", "school", "laboratory", "spital",
)
#: sub-unit markers (NOT a parent institution)
_SUBUNIT_KW = (
    "depart", "dept", "division", " div ", "faculty", " fac ", "school of",
    "section", "chair", "unit", "program", "laboratory of",
)
_POSTAL_RE = re.compile(r"\d{4,6}")
_US_STATES = frozenset(
    "AL AK AZ AR CA CO CT DE FL GA HI ID IL IN IA KS KY LA ME MD MA MI MN MS "
    "MO MT NE NV NH NJ NM NY NC ND OH OK OR PA RI SC SD TN TX UT VT VA WA WV "
    "WI WY DC".split()
)


def is_org(part: str) -> bool:
    """Is this address component a parent institution?"""
    toks = re.findall(r"[a-zçğıöşü]+", str(part or "").lower())
    if not toks:
        return False
    if set(toks) & set(_ORG_KW_EXACT):
        return True
    return any(tok.startswith(pfx) for tok in toks for pfx in _ORG_KW_PREFIX)


def is_subunit(part: str) -> bool:
    low = str(part or "").lower()
    return any(kw in low for kw in _SUBUNIT_KW)


def _looks_geographic(part: str) -> bool:
    p = str(part or "").strip()
    if not p:
        return True
    if _POSTAL_RE.search(p):
        return True
    toks = p.replace(",", " ").split()
    return any(tk.upper() in _US_STATES for tk in toks)


# ── C1 splitting / parsing (c1_utils.py:191-257) ───────────────────────────


def _split_semicolons(value: str, strip_brackets: bool) -> list[str]:
    """Bracket-aware ';' split: ';' inside '[Author; Author]' never splits.
    ``strip_brackets`` removes the leading author bracket from each chunk."""
    raw = str(value or "")
    if not raw.strip() or raw.strip().upper() == "NAN":
        return []
    chunks: list[str] = []
    buf: list[str] = []
    depth = 0
    for ch in raw:
        if ch == "[":
            depth += 1
            buf.append(ch)
        elif ch == "]":
            depth = max(0, depth - 1)
            buf.append(ch)
        elif ch == ";" and depth == 0:
            chunks.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    if buf:
        chunks.append("".join(buf))
    if not strip_brackets:
        return chunks
    out = []
    for chunk in chunks:
        c = re.sub(r"^\s*\[[^\]]*\]\s*", "", chunk).strip()
        if c:
            out.append(c)
    return out


def split_c1_addresses(value: str) -> list[str]:
    """Split a multi-author C1 field into address components, stripping the
    '[Author; Author]' prefixes (their inner ';' is preserved)."""
    return _split_semicolons(value, strip_brackets=True)


def parse_c1_address(addr: str) -> dict:
    """Extract parent institution + country from one address component.

    Returns {raw, institution, country, stripped}; institution/country may be
    None (no-org addresses are deliberately NOT guessed — a wrong parent is
    worse than none, c1_utils.py:251-254).
    """
    raw = str(addr or "").strip()
    parts = [p.strip() for p in raw.split(",") if p.strip()]
    country = None
    if parts:
        c = canonical_country(parts[-1])
        if c:
            country = c
            parts = parts[:-1]
    while parts and _looks_geographic(parts[-1]):
        parts.pop()
    institution = None
    for p in reversed(parts):
        if is_org(p) and not is_subunit(p):
            institution = p
            break
    if institution is None:
        for p in reversed(parts):
            if is_org(p):
                institution = p
                break
    return {"raw": raw, "institution": institution, "country": country,
            "stripped": parts}


def extract_country_tokens(value: str) -> list[str]:
    """All raw last-comma-component tokens of a C1 cell (uncanonicalized)."""
    out: list[str] = []
    for addr in split_c1_addresses(value):
        parts = [p.strip() for p in addr.split(",") if p.strip()]
        if parts:
            out.append(parts[-1])
    return out


def rollup_c1_to_parent(value: str) -> str:
    """Reduce every address component to its parent institution (+country),
    preserving the multi-author structure; order-preserving unique."""
    rolled: list[str] = []
    for addr in split_c1_addresses(value):
        info = parse_c1_address(addr)
        inst, country = info["institution"], info["country"]
        if inst and country:
            rolled.append(f"{inst}, {country}")
        elif inst:
            rolled.append(inst)
        else:
            rolled.append(addr)
    seen: set[str] = set()
    return "; ".join(x for x in rolled if not (x in seen or seen.add(x)))


# ── structure-preserving rewrites (c1_utils.py:289-418) ────────────────────


def _addr_of(chunk: str) -> tuple[str, str]:
    """Split one ';'-chunk into (author-bracket prefix, address text)."""
    m = re.match(r"^(\s*\[[^\]]*\]\s*)?(.*)$", chunk, re.S)
    return (m.group(1) or ""), (m.group(2) or "").strip()


def replace_country_in_c1(value: str, mapping: dict[str, str]) -> str:
    """Canonicalize the COUNTRY component (rightmost comma part) of every
    address; author brackets and all other components untouched."""
    if not str(value or "").strip():
        return value
    out: list[str] = []
    for chunk in _split_semicolons(value, strip_brackets=False):
        parts = chunk.split(",")
        if parts:
            last = parts[-1].strip()
            canon = mapping.get(last.lower())
            if canon and last and last.lower() != canon.lower():
                parts[-1] = " " + canon
        out.append(",".join(parts))
    return ";".join(out)


def append_country_to_c1(value: str, append_map: dict[str, str]) -> str:
    """APPEND a country to addresses that lack one (the last component is in
    ``append_map`` and is not itself a country) — fills missing countries
    without destroying institution/city components."""
    if not str(value or "").strip():
        return value
    out: list[str] = []
    for chunk in _split_semicolons(value, strip_brackets=False):
        _, addr = _addr_of(chunk)
        parts = addr.split(",")
        last = parts[-1].strip() if parts else ""
        country = append_map.get(last.lower())
        if country and last and canonical_country(last) is None:
            chunk = chunk.rstrip() + ", " + country
        out.append(chunk)
    return ";".join(out)


def _ws_lower(s: str) -> str:
    return re.sub(r"\s+", " ", str(s or "").strip()).lower()


#: per-worker memo of normalized rewrite maps. These functions are called
#: once PER ROW by apply_rewrite with the SAME broadcast dict object
#: (ray.get returns the plasma-cached object, stable id per worker) —
#: renormalizing a 10k-entry map per row would be O(rows × mapping).
_NORM_MAP_MEMO: dict[int, tuple[int, dict]] = {}


def _norm_map_of(mapping: dict) -> dict:
    key = id(mapping)
    hit = _NORM_MAP_MEMO.get(key)
    if hit is not None and hit[0] == len(mapping):
        return hit[1]
    norm = {_ws_lower(k): v for k, v in mapping.items()}
    _NORM_MAP_MEMO.clear()  # one live mapping per stage; don't grow unbounded
    _NORM_MAP_MEMO[key] = (len(mapping), norm)
    return norm


def replace_affiliation_in_c1(value: str, variant_to_canonical: dict) -> str:
    """Whitespace/case-tolerant EXACT-component replacement: first the whole
    address, then each comma sub-component (never substring matching)."""
    if not str(value or "").strip():
        return value
    norm_map = _norm_map_of(variant_to_canonical)
    out: list[str] = []
    for chunk in _split_semicolons(value, strip_brackets=False):
        prefix, addr = _addr_of(chunk)
        canon = norm_map.get(_ws_lower(addr))
        if canon:
            out.append(prefix + canon)
            continue
        parts = addr.split(",")
        replaced = False
        for i, part in enumerate(parts):
            c = norm_map.get(_ws_lower(part))
            if c:
                parts[i] = (" " if i > 0 and part.startswith(" ") else "") + c
                replaced = True
        out.append(prefix + ",".join(parts) if replaced else chunk)
    return ";".join(out)


def replace_org_in_c1(value: str, variant_to_canonical: dict) -> str:
    """Replace whole matched addresses with their canonical parent org,
    preserving the author bracket (org-rollup apply)."""
    if not str(value or "").strip():
        return value
    norm_map = _norm_map_of(variant_to_canonical)
    out: list[str] = []
    for chunk in _split_semicolons(value, strip_brackets=False):
        prefix, addr = _addr_of(chunk)
        canon = norm_map.get(_ws_lower(addr))
        out.append(prefix + canon if canon else chunk)
    return ";".join(out)
