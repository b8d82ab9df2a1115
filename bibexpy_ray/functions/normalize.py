"""Normalization functions mirroring the reference's Phase-1 normalizers.

Semantics reimplemented (NOT copied) from
/root/reference/apps/api/services/smart_merger.py:94-178 (normalize_doi,
normalize_title, normalize_year, normalize_author_surname, normalize_issn,
normalize_id_token) and
/root/reference/apps/api/services/disambiguation/similarity.py:16-24, 75-98
(normalize_name, name_initials). Bit-exact parity with the reference's
normalization is a hard requirement for the >=0.99 dup-pair recall target
(SURVEY.md §7.5) — every function here is covered by a ported decision-table
test in tests/test_normalize.py.

Scalar functions are provided for per-pair verification; ``normalize_text_batch``
is the vectorized batch form used inside ``map_batches`` hot paths.
"""

from __future__ import annotations

import re
import unicodedata
from typing import Any, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from bibexpy_ray.config import STOPWORDS

_DOI_PREFIX_RE = re.compile(r"^https?://(dx\.)?doi\.org/", re.IGNORECASE)
_PUNCT_RE = re.compile(r"[^a-z0-9 ]+")
_WS_RE = re.compile(r"\s+")
_LATEX_RE = re.compile(r"\\[a-z]+\{[^}]*\}|\\[\\\\&%$#_{}~^]")
_ISSN_STRIP_RE = re.compile(r"[^0-9Xx]")
_NAME_PUNCT_RE = re.compile(r"[^a-z0-9 ]+")


def to_str(v: Any) -> str:
    """NaN/None-safe string coercion (reference smart_merger.py:83-91)."""
    if v is None:
        return ""
    if isinstance(v, float) and v != v:  # NaN
        return ""
    return str(v).strip()


def is_empty(v: Any) -> bool:
    """Blank check treating None/NaN/''/'nan' as empty (smart_merger.py:357-366)."""
    s = to_str(v)
    return s == "" or s.lower() == "nan"


def normalize_doi(raw: Any) -> Optional[str]:
    """Canonical DOI: lowercase, strip doi.org URL prefix, rstrip '/. \\t',
    require a '10.' prefix (smart_merger.py:94-110)."""
    s = to_str(raw)
    if not s:
        return None
    s = _DOI_PREFIX_RE.sub("", s.lower()).rstrip("/. \t")
    return s if s.startswith("10.") else None


def normalize_text(raw: Any) -> str:
    """Canonical text: LaTeX strip -> NFKD->ASCII -> lower -> punct->space ->
    collapse whitespace -> drop stopwords (smart_merger.py:113-127).

    This is both the reference's title normalizer and our caption canonicalizer
    (the primary-similarity field analog per SURVEY.md §2.2).
    """
    s = to_str(raw)
    if not s:
        return ""
    s = _LATEX_RE.sub(" ", s)
    s = unicodedata.normalize("NFKD", s).encode("ascii", "ignore").decode("ascii")
    s = _PUNCT_RE.sub(" ", s.lower())
    s = _WS_RE.sub(" ", s).strip()
    return " ".join(t for t in s.split() if t not in STOPWORDS)


# alias matching the reference name for the bibliographic pipeline
normalize_title = normalize_text


def normalize_year(raw: Any) -> Optional[int]:
    """'2023.0'/'2023'/2023 -> 2023 within [1900, 2100], else None
    (smart_merger.py:130-141)."""
    s = to_str(raw)
    if not s:
        return None
    try:
        n = int(float(s))
    except (TypeError, ValueError):
        return None
    return n if 1900 <= n <= 2100 else None


def normalize_name(s: Any) -> str:
    """ASCII-fold + lower + single-space (similarity.py:16-24)."""
    s = to_str(s)
    if not s:
        return ""
    s = unicodedata.normalize("NFKD", s).encode("ascii", "ignore").decode("ascii")
    s = _NAME_PUNCT_RE.sub(" ", s.lower())
    return _WS_RE.sub(" ", s).strip()


def name_initials(full: Any) -> tuple[str, str]:
    """Bibliographic author name (surname FIRST) -> (surname, initials)
    (similarity.py:75-98). Comma-aware: 'Smith, John A' -> ('smith', 'ja');
    no comma: first token is the surname."""
    raw = to_str(full)
    if "," in raw:
        surname_part, _, given_part = raw.partition(",")
        surname = normalize_name(surname_part)
        initials = "".join(t[0] for t in normalize_name(given_part).split() if t)
        if surname:
            return surname, initials
    parts = normalize_name(raw).split()
    if not parts:
        return "", ""
    return parts[0], "".join(p[0] for p in parts[1:] if p)


def normalize_author_surname(raw: Any) -> str:
    """First author's surname, uppercase ASCII (smart_merger.py:144-159)."""
    s = to_str(raw)
    if not s:
        return ""
    first = re.split(r"[;|]", s, maxsplit=1)[0].replace(",", " ")
    surname, _ = name_initials(first)
    return surname.upper()


def normalize_issn(raw: Any) -> Optional[str]:
    """8-char digits+X form, else None (smart_merger.py:161-169)."""
    s = to_str(raw)
    if not s:
        return None
    s = _ISSN_STRIP_RE.sub("", s.upper())
    return s if len(s) == 8 else None


def normalize_id_token(raw: Any) -> Optional[str]:
    """Generic id token: lowercase + strip, '' -> None (smart_merger.py:172-178)."""
    s = to_str(raw)
    if not s:
        return None
    s = s.lower().strip()
    return s or None


_PAREN_ID_RE = re.compile(r"\s*\([^)]*\)")


def sr_tag(au: Any, py: Any) -> str:
    """SR (source) meta-tag: first author before ';' + ' ' + year, stripped
    (reference MergeDB.py:27-42 meta_tag_extraction)."""
    au_s = to_str(au)
    first = au_s.split(";")[0].strip() if au_s else ""
    return f"{first} {to_str(py)}".strip()


def clean_author_fullnames(raw: Any) -> str:
    """Strip Scopus '(12345)' id parens from each ';'-separated author name,
    collapse whitespace, drop empties (reference MergeDB.py:665-699
    clean_scopus_author_fullnames)."""
    s = to_str(raw)
    if not s:
        return ""
    out = []
    for author in s.split(";"):
        a = _WS_RE.sub(" ", _PAREN_ID_RE.sub("", author.strip())).strip()
        if a:
            out.append(a)
    return "; ".join(out)


# ---------------------------------------------------------------------------
# Vectorized batch form (hot path)
# ---------------------------------------------------------------------------

_STOPWORD_BATCH_RE = re.compile(
    r"\b(?:" + "|".join(sorted(STOPWORDS)) + r")\b"
)


def normalize_text_batch(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized ``normalize_text`` over an Arrow string array.

    Uses pyarrow.compute kernels end-to-end except the NFKD ASCII fold, which
    pyarrow lacks; non-ASCII rows (detected vectorized) fall back to the scalar
    path. Property-tested equal to the scalar function in tests/test_normalize.py.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = arr.cast(pa.large_string()).fill_null("")
    # LaTeX strip + the rare non-ASCII fold via scalar fallback only where needed
    ascii_mask = pc.string_is_ascii(arr)
    has_tex = pc.match_substring(arr, "\\")
    needs_scalar = pc.or_(pc.invert(ascii_mask), has_tex)
    if pc.any(needs_scalar).as_py():
        py = arr.to_pylist()
        mask = needs_scalar.to_numpy(zero_copy_only=False)
        out = [normalize_text(s) if m else s for s, m in zip(py, mask)]
        arr = pa.array(out, type=pa.large_string())
        done_mask = mask
    else:
        done_mask = np.zeros(len(arr), dtype=bool)
    s = pc.utf8_lower(arr)
    s = pc.replace_substring_regex(s, "[^a-z0-9 ]+", " ")
    s = pc.replace_substring_regex(s, _STOPWORD_BATCH_RE.pattern, " ")
    s = pc.replace_substring_regex(s, "\\s+", " ")
    s = pc.utf8_trim_whitespace(s)
    if done_mask.any():
        # rows already normalized by the scalar path must not be re-processed
        # (idempotent anyway — normalize_text output contains no stopwords,
        #  uppercase, or punctuation — but keep the explicit merge for clarity)
        merged = pa.array(
            [a if m else b for a, b, m in zip(arr.to_pylist(), s.to_pylist(), done_mask)],
            type=pa.large_string(),
        )
        return merged
    return s
