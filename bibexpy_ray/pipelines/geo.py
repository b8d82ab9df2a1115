"""Geographic / affiliation standardization pipelines (C1 family).

Distributed analogs of the reference's country/org disambiguation:

- ``country_blocks``: Tier-1 deterministic dictionary standardization +
  Tier-2 similarity clustering of unknown tokens
  (/root/reference/apps/api/services/disambiguation/blocking.py:429-510,
  semantics reimplemented over Ray Dataset stages)
- ``org_rollup_blocks``: affiliation → parent-institution rollup proposals
  (blocking.py:513-582)
- ``apply_country_rewrite`` / ``apply_org_rewrite``: the broadcast
  variant→canonical substitution stage with changed-row counting
  (the reference's apply_clusters rewrite, pipeline.py:721-975 analog —
  see also ``bibexpy_ray.pipelines.rewrite``)

The testdata star schema has no address column, so the query surface runs on
a DETERMINISTIC synthetic C1 column derived from the customer table (pure
function of c_custkey — reproducible in ANSI SQL, which is what makes the
country/institution queries oracle-checkable end-to-end against DuckDB while
still exercising the real splitter/parser kernels).

Scale notes: dictionaries ride inside the map_batches closure (broadcast once
per process, a few KB); C1 parsing runs as pre-compiled Arrow RE2 kernels
over whole batches with dictionary-encoded dict probes (scalar fallback only
for malformed bracket structures — see the vectorized-kernels section); the
aggregation is a partial count inside map_batches followed by a small
groupby — no full-corpus shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from bibexpy_ray.functions import geo
from bibexpy_ray.pipelines.tables import read_table

# ---------------------------------------------------------------------------
# Deterministic synthetic C1 column (shared shape with the SQL oracle)
# ---------------------------------------------------------------------------

#: (display variant, canonical) — display forms as they appear in WoS/Scopus
#: exports; index i is selected by c_custkey % len. Kept SMALL and explicit so
#: the DuckDB oracle can embed the same table as a VALUES list.
SYNTH_VARIANTS: list[tuple[str, str]] = [
    ("USA", "United States"),
    ("U.S.A.", "United States"),
    ("United States", "United States"),
    ("England", "United Kingdom"),
    ("Scotland", "United Kingdom"),
    ("UK", "United Kingdom"),
    ("Peoples R China", "China"),
    ("P R China", "China"),
    ("China", "China"),
    ("Fed Rep Ger", "Germany"),
    ("Germany", "Germany"),
    ("Turkiye", "Turkey"),
    ("Turkey", "Turkey"),
    ("South Korea", "South Korea"),
    ("Republic of Korea", "South Korea"),
    ("Russian Federation", "Russia"),
    ("Holland", "Netherlands"),
    ("The Netherlands", "Netherlands"),
    ("Espana", "Spain"),
    ("Brasil", "Brazil"),
    ("France", "France"),
    ("Italy", "Italy"),
    ("Japan", "Japan"),
    ("Canada", "Canada"),
    ("Australia", "Australia"),
    ("India", "India"),
]
_NV = len(SYNTH_VARIANTS)


def synth_c1_addresses(sf_dir: str) -> rd.Dataset:
    """customer → (c_custkey, c1): a WoS-style multi-author address field.

    Address 1: ``[Smith, J; Doe, A] Univ <k%50>, Dept Phys, City <k%10>,
    <variant[k % NV]>``; customers with k%3==0 carry a second address
    ``Natl Inst <k%20>, <variant[(3*k+7) % NV]>``. Pure function of
    c_custkey — the SQL oracle reconstructs the same facts without parsing.
    """
    cust = read_table(sf_dir, "customer", ["c_custkey"])

    def build(batch: pd.DataFrame) -> pd.DataFrame:
        ks = batch["c_custkey"].to_numpy(dtype=np.int64)
        c1 = [
            (
                f"[Smith, J; Doe, A] Univ {k % 50}, Dept Phys, City {k % 10}, "
                f"{SYNTH_VARIANTS[k % _NV][0]}"
                + (
                    f"; [Roe, B] Natl Inst {k % 20}, {SYNTH_VARIANTS[(3 * k + 7) % _NV][0]}"
                    if k % 3 == 0
                    else ""
                )
            )
            for k in ks
        ]
        return pd.DataFrame({"c_custkey": ks, "c1": c1})

    return cust.map_batches(build, batch_format="pandas")


def _variants_values_sql() -> str:
    rows = ", ".join(
        f"({i}, '{v}', '{c}')" for i, (v, c) in enumerate(SYNTH_VARIANTS)
    )
    return f"(VALUES {rows}) AS variants(i, variant, canon)"


# ---------------------------------------------------------------------------
# Vectorized C1 parsing (query hot path)
#
# The scalar kernels in functions/geo.py (split_c1_addresses,
# canonical_country, is_org, …) are the semantic reference — per-row Python
# with a regex per address. The query pipelines below instead run the bulk
# of the work as pre-compiled pandas ``.str`` passes over whole batches
# (C-speed regex over contiguous buffers); rows with shapes the vector pass
# cannot mirror exactly (nested author brackets) fall back to the scalar
# kernels, so the two paths are value-identical on any input
# (tests/test_geo.py pins the equivalence on randomized C1 cells).
# ---------------------------------------------------------------------------

import re as _re

import pyarrow.compute as pc

#: the scalar is_org tokenizer's alphabet — token boundaries for the
#: exact/prefix keyword tests. RE2 (Arrow's regex engine) has no
#: lookarounds, so boundaries are CONSUMING character classes — fine for
#: boolean matches.
_TOKCLS = "a-zçğıöşü"
_ORG_EXACT_PAT = (
    rf"(?:^|[^{_TOKCLS}])(?:{'|'.join(geo._ORG_KW_EXACT)})(?:[^{_TOKCLS}]|$)"
)
_ORG_PREFIX_PAT = rf"(?:^|[^{_TOKCLS}])(?:{'|'.join(geo._ORG_KW_PREFIX)})"
_SUBUNIT_PAT = "|".join(_re.escape(k) for k in geo._SUBUNIT_KW)
_STATE_PAT = rf"(?:^|\s)(?:{'|'.join(sorted(geo._US_STATES))})(?:\s|$)"
#: rows whose bracket structure the vector splitter can mirror: a sequence
#: of plain chars and simple (non-nested, balanced) bracket groups.
#: Everything else (nested/unbalanced brackets) takes the scalar kernel.
_WELLFORMED_PAT = r"^(?:[^\[\]]|\[[^\[\]]*\])*$"
#: one semicolon inside a simple bracket group (iterated protection)
_BRACKET_SEMI_PAT = r"\[([^\[\]]*?);([^\[\]]*)\]"
#: canonical lookup with variant priority (canonical_country checks
#: COUNTRY_VARIANTS first, then the canonical-name set)
_FULL_CANON = {**geo._CANON_LOWER, **geo.COUNTRY_VARIANTS}


def _as_arrow(s: "pd.Series | pa.Array") -> pa.Array:
    if isinstance(s, pa.ChunkedArray):
        return s.combine_chunks()
    if isinstance(s, pa.Array):
        return s
    return pa.array(s.fillna("").astype(str).to_numpy(dtype=object), type=pa.string())


def _protect_bracket_semis(arr: pa.Array) -> pa.Array:
    """Rewrite every ';' inside a simple bracket group to NUL: each
    vectorized pass rewrites ONE ';' per group (RE2 has no lookarounds, so
    the pattern must consume the group), so passes = max per-group count."""
    repl = "[\\1" + "\x00" + "\\2]"
    while pc.any(
        pc.match_substring_regex(arr, _BRACKET_SEMI_PAT)
    ).as_py():
        arr = pc.replace_substring_regex(arr, _BRACKET_SEMI_PAT, repl)
    return arr


def _dict_probe(arr: pa.Array, mapping: dict[str, str]) -> np.ndarray:
    """Per-row dict lookup where the Python dict probe runs once per
    DISTINCT value (dictionary encode), not once per row."""
    enc = arr.dictionary_encode()
    uniq = enc.dictionary.to_pylist()
    mapped = np.array([mapping.get(u) for u in uniq] + [None], dtype=object)
    idx = enc.indices
    if idx.null_count:
        idx = idx.fill_null(len(uniq))
    return mapped[idx.to_numpy(zero_copy_only=False).astype(np.int64)]


def _explode_addresses_arrow(s: pd.Series) -> tuple[np.ndarray, pa.Array, list]:
    """Vectorized ``split_c1_addresses`` over a whole column via Arrow
    kernels: returns ``(row_ids, addresses, scalar_pairs)`` where
    ``addresses[k]`` belongs to input row ``row_ids[k]`` and
    ``scalar_pairs`` holds the (row, address) output of the scalar kernel
    for rows whose bracket structure the vector pass cannot mirror.

    Semicolons inside author brackets are protected by an ITERATED
    vectorized replace (one pass per ';' still inside a bracket — RE2 has
    no lookarounds, and one pass rewrites one ';' per group), then the
    split/strip/trim chain runs as C-speed Arrow kernels."""
    arr = _as_arrow(s)
    n = len(arr)
    well = pc.match_substring_regex(arr, _WELLFORMED_PAT)
    well_np = well.to_numpy(zero_copy_only=False).astype(bool)
    scalar_pairs: list = []
    if not well_np.all():
        for i in np.flatnonzero(~well_np):
            for a in geo.split_c1_addresses(arr[i].as_py()):
                scalar_pairs.append((int(i), a))
        arr = pc.if_else(well, arr, "")
    prot = _protect_bracket_semis(arr)
    lst = pc.split_pattern(prot, ";")
    lengths = pc.list_value_length(lst).to_numpy(zero_copy_only=False)
    row_ids = np.repeat(np.arange(n, dtype=np.int64), lengths)
    flat = pc.list_flatten(lst)
    flat = pc.replace_substring(flat, "\x00", ";")
    flat = pc.replace_substring_regex(
        flat, r"^\s*\[[^\]]*\]\s*", "", max_replacements=1
    )
    flat = pc.utf8_trim_whitespace(flat)
    keep = pc.not_equal(flat, "")
    keep_np = keep.to_numpy(zero_copy_only=False).astype(bool)
    return row_ids[keep_np], flat.filter(keep), scalar_pairs


def _explode_addresses(s: pd.Series) -> pd.Series:
    """``split_c1_addresses`` over a whole column: one address per output
    row, index = the caller's index label for that row (pandas view over
    the Arrow kernels; positions map back to labels at the end)."""
    labels = s.index.to_numpy()
    row_ids, flat, scalar_pairs = _explode_addresses_arrow(s)
    pos = row_ids
    vals = flat.to_numpy(zero_copy_only=False)
    if scalar_pairs:
        pos = np.concatenate(
            [pos, np.array([i for i, _ in scalar_pairs], dtype=np.int64)]
        )
        vals = np.concatenate(
            [vals, np.array([a for _, a in scalar_pairs], dtype=object)]
        )
    return pd.Series(vals, index=labels[pos], dtype=object)


def _last_comma_arrow(addrs: pa.Array) -> pa.Array:
    """Vectorized ``parts[-1]`` of the non-empty comma parts per address."""
    trimmed = pc.replace_substring_regex(addrs, r"[,\s]+$", "")
    last = pc.replace_substring_regex(
        trimmed, r"(?s)^.*,", "", max_replacements=1
    )
    return pc.utf8_trim_whitespace(last)


def _canon_map_arrow(tokens: pa.Array, mapping: dict[str, str]) -> np.ndarray:
    """``canonical_country`` normalization (strip/lower/trailing dots/
    whitespace collapse) then the dictionary-encoded dict probe."""
    norm = pc.utf8_trim_whitespace(tokens)
    norm = pc.utf8_lower(norm)
    norm = pc.utf8_rtrim(norm, ".")
    norm = pc.replace_substring_regex(norm, r"\s+", " ")
    return _dict_probe(norm, mapping)


def _last_comma_token(addrs: pd.Series) -> pd.Series:
    """pandas view of ``_last_comma_arrow`` (index preserved)."""
    out = _last_comma_arrow(_as_arrow(addrs))
    return pd.Series(
        out.to_numpy(zero_copy_only=False), index=addrs.index, dtype=object
    )


def _canonical_country_vec(tokens: "pd.Series | pa.Array") -> pd.Series:
    """Vectorized ``canonical_country`` (see ``_canon_map_arrow``)."""
    idx = tokens.index if isinstance(tokens, pd.Series) else None
    out = _canon_map_arrow(_as_arrow(tokens), _FULL_CANON)
    return pd.Series(out, index=idx, dtype=object)


def country_counts(sf_dir: str) -> pd.DataFrame:
    """Canonical-country mention counts over the synthetic C1 column —
    the vectorized split/canonicalize pass end-to-end; the oracle
    reconstructs the counts from the generating function."""
    ds = synth_c1_addresses(sf_dir)

    def count_part(batch: pd.DataFrame) -> pd.DataFrame:
        # partial (combiner) aggregation inside the batch: the groupby below
        # only shuffles (country, n) partials, never rows
        addrs = _explode_addresses(batch["c1"])
        canon = _canonical_country_vec(_last_comma_token(addrs)).dropna()
        vc = canon.value_counts()
        return pd.DataFrame(
            {"country": vc.index, "n": vc.to_numpy(dtype=np.int64)}
        )

    out = (
        ds.map_batches(count_part, batch_format="pandas")
        .groupby("country")
        .sum("n")
        .to_pandas()
    )
    out = out.rename(columns={"sum(n)": "n_mentions"})
    out["n_mentions"] = out["n_mentions"].astype(np.int64)
    return out.sort_values("country").reset_index(drop=True)


def country_counts_oracle_sql() -> str:
    v = _variants_values_sql()
    return (
        "WITH first_addr AS (SELECT canon FROM customer "
        f"JOIN {v} ON c_custkey % {_NV} = i), "
        "second_addr AS (SELECT canon FROM customer "
        f"JOIN {v} ON (3 * c_custkey + 7) % {_NV} = i WHERE c_custkey % 3 = 0), "
        "allm AS (SELECT canon FROM first_addr UNION ALL SELECT canon FROM second_addr) "
        "SELECT canon AS country, COUNT(*) AS n_mentions FROM allm GROUP BY canon"
    )


def institutions_vec(addrs: pd.Series) -> pd.Series:
    """Vectorized ``parse_c1_address(addr)["institution"]`` per address.

    All regex work (org keywords, subunit markers, postal/state geography,
    country canonicalization) runs as pre-compiled ``.str`` passes over the
    exploded segment column; the remaining per-address selection (pop
    country, pop geographic tail, reverse-scan for the org segment) walks
    precomputed boolean arrays — no regex, no string ops per row."""
    if len(addrs) == 0:
        return pd.Series([], dtype=object)
    arr = _as_arrow(addrs)
    lst = pc.split_pattern(arr, ",")
    lengths = pc.list_value_length(lst).to_numpy(zero_copy_only=False)
    addr_id = np.repeat(np.arange(len(arr), dtype=np.int64), lengths)
    seg = pc.utf8_trim_whitespace(pc.list_flatten(lst))
    keep = pc.not_equal(seg, "")
    keep_np = keep.to_numpy(zero_copy_only=False).astype(bool)
    addr_id = addr_id[keep_np]
    seg = seg.filter(keep)
    vals = seg.to_numpy(zero_copy_only=False)
    low = pc.utf8_lower(seg)

    def _m(a, pat, **kw):
        return pc.match_substring_regex(a, pat, **kw).to_numpy(
            zero_copy_only=False
        ).astype(bool)

    org_a = _m(low, _ORG_EXACT_PAT) | _m(low, _ORG_PREFIX_PAT)
    sub_a = _m(low, _SUBUNIT_PAT)
    geo_a = _m(seg, r"\d{4,6}") | _m(seg, _STATE_PAT, ignore_case=True)
    ctry_a = np.array(
        [c is not None for c in _canon_map_arrow(seg, _FULL_CANON)], dtype=bool
    )
    # segment ranges per address (contiguous runs of addr_id), then the
    # scalar algorithm (pop country, pop geographic tail, reverse-scan for
    # the org segment) expressed as vectorized running maxima:
    #   hi1 = end minus the country segment, hi2 = hi1 minus the trailing
    #   geographic run (last non-geo index + 1, clamped to the run start —
    #   a global running max is safe because any carried index from an
    #   earlier run is < start), institution = the LAST index under hi2
    #   where org&!sub holds (else where org holds) via running max of
    #   flagged positions.
    N = len(addr_id)
    starts = np.flatnonzero(np.r_[True, addr_id[1:] != addr_id[:-1]])
    ends = np.r_[starts[1:], N]
    idx = np.arange(N, dtype=np.int64)
    hi1 = ends - ctry_a[ends - 1].astype(np.int64)
    last_nongeo = np.maximum.accumulate(np.where(~geo_a, idx, -1))
    hi2 = np.where(
        hi1 > starts,
        np.maximum(starts, last_nongeo[np.maximum(hi1 - 1, 0)] + 1),
        starts,
    )
    m_strict = np.maximum.accumulate(np.where(org_a & ~sub_a, idx, -1))
    m_any = np.maximum.accumulate(np.where(org_a, idx, -1))
    out = np.full(len(addrs), None, dtype=object)
    nonempty = hi2 > starts
    top = np.maximum(hi2 - 1, 0)
    j_strict = np.where(nonempty, m_strict[top], -1)
    j_any = np.where(nonempty, m_any[top], -1)
    j = np.where(j_strict >= starts, j_strict, np.where(j_any >= starts, j_any, -1))
    sel = j >= 0
    out[addr_id[starts[sel]]] = vals[j[sel]]
    return pd.Series(out, dtype=object)


def c1_institutions(sf_dir: str) -> pd.DataFrame:
    """Parent-institution counts over the synthetic C1 — the vectorized
    org-keyword parser (is_org / subunit / geo stripping semantics,
    equivalence with parse_c1_address pinned in tests/test_geo.py)."""
    ds = synth_c1_addresses(sf_dir)

    def count_part(batch: pd.DataFrame) -> pd.DataFrame:
        addrs = _explode_addresses(batch["c1"])
        inst = institutions_vec(addrs).dropna()
        vc = inst.value_counts()
        return pd.DataFrame(
            {"institution": vc.index, "n": vc.to_numpy(dtype=np.int64)}
        )

    out = (
        ds.map_batches(count_part, batch_format="pandas")
        .groupby("institution")
        .sum("n")
        .to_pandas()
    )
    out = out.rename(columns={"sum(n)": "n_mentions"})
    out["n_mentions"] = out["n_mentions"].astype(np.int64)
    return out.sort_values("institution").reset_index(drop=True)


def c1_institutions_oracle_sql() -> str:
    return (
        "WITH first_addr AS (SELECT 'Univ ' || (c_custkey % 50) AS institution "
        "FROM customer), "
        "second_addr AS (SELECT 'Natl Inst ' || (c_custkey % 20) AS institution "
        "FROM customer WHERE c_custkey % 3 = 0), "
        "allm AS (SELECT institution FROM first_addr "
        "UNION ALL SELECT institution FROM second_addr) "
        "SELECT institution, COUNT(*) AS n_mentions FROM allm GROUP BY institution"
    )


def rewrite_changed_vec(s: pd.Series, mapping: dict[str, str]) -> np.ndarray:
    """Vectorized ``replace_country_in_c1(v, mapping) != v`` per row.

    The rewrite changes a cell iff (a) some depth-0 chunk's rightmost comma
    part maps to a canonically different country, or (b) the cell ends with
    a depth-0 ``;`` (the splitter drops the trailing empty chunk, so the
    rejoin differs even without a country hit). Rows the vector pass cannot
    mirror (nested brackets, trailing ``;``) take the scalar kernel —
    equivalence pinned in tests/test_geo.py."""
    arr = _as_arrow(s.reset_index(drop=True))
    n = len(arr)
    changed = np.zeros(n, dtype=bool)
    well = pc.match_substring_regex(arr, _WELLFORMED_PAT)
    fallback = pc.or_(pc.invert(well), pc.ends_with(arr, pattern=";"))
    fb_np = fallback.to_numpy(zero_copy_only=False).astype(bool)
    if fb_np.any():
        for i in np.flatnonzero(fb_np):
            v = arr[int(i)].as_py()
            changed[i] = geo.replace_country_in_c1(v, mapping) != v
        arr = pc.if_else(fallback, "", arr)
    blank = pc.equal(pc.utf8_trim_whitespace(arr), "").to_numpy(
        zero_copy_only=False
    ).astype(bool)
    prot = _protect_bracket_semis(arr)
    lst = pc.split_pattern(prot, ";")
    lengths = pc.list_value_length(lst).to_numpy(zero_copy_only=False)
    row_ids = np.repeat(np.arange(n, dtype=np.int64), lengths)
    chunks = pc.replace_substring(pc.list_flatten(lst), "\x00", ";")
    # parts[-1] INCLUDING empties (split keeps them; no strip filter here)
    last = pc.replace_substring_regex(
        chunks, r"(?s)^.*,", "", max_replacements=1
    )
    stripped = pc.utf8_trim_whitespace(last)
    low = pc.utf8_lower(stripped)
    canon = _dict_probe(low, mapping)
    low_np = low.to_numpy(zero_copy_only=False)
    nz = stripped.to_numpy(zero_copy_only=False) != ""
    # the python comparison only runs on dict HITS (rare after the probe)
    hit = np.zeros(len(canon), dtype=bool)
    for j in np.flatnonzero(np.array([c is not None for c in canon]) & nz):
        hit[j] = low_np[j] != canon[j].lower()
    np.bitwise_or.at(changed, row_ids, hit)
    changed &= ~blank | fb_np
    return changed


def country_rewrite_flags(sf_dir: str) -> pd.DataFrame:
    """Per-row changed flag of the country-canonicalization rewrite
    (replace_country_in_c1 with the full variant dictionary) — the
    apply-stage semantics, oracle-checked against the generating function."""
    ds = synth_c1_addresses(sf_dir)
    mapping = {
        **{k: v for k, v in geo.COUNTRY_VARIANTS.items()},
        **{c.lower(): c for c in geo.CANONICAL_COUNTRIES},
    }

    def apply(batch: pd.DataFrame) -> pd.DataFrame:
        ks = batch["c_custkey"].to_numpy(dtype=np.int64)
        changed = rewrite_changed_vec(batch["c1"], mapping)
        return pd.DataFrame({"c_custkey": ks, "changed": changed})

    out = ds.map_batches(apply, batch_format="pandas").to_pandas()
    return out.sort_values("c_custkey").reset_index(drop=True)


def country_rewrite_flags_oracle_sql() -> str:
    v = _variants_values_sql()
    return (
        "WITH a1 AS (SELECT c_custkey, (lower(variant) <> lower(canon)) AS ch1 "
        f"FROM customer JOIN {v} ON c_custkey % {_NV} = i), "
        "a2 AS (SELECT c_custkey, (lower(variant) <> lower(canon)) AS ch2 "
        f"FROM customer JOIN {v} ON (3 * c_custkey + 7) % {_NV} = i "
        "WHERE c_custkey % 3 = 0) "
        "SELECT a1.c_custkey, (ch1 OR coalesce(ch2, FALSE)) AS changed "
        "FROM a1 LEFT JOIN a2 USING (c_custkey)"
    )


# ---------------------------------------------------------------------------
# Block builders (country standardization / org rollup proposals)
# ---------------------------------------------------------------------------


def country_blocks(
    ds: rd.Dataset,
    c1_col: str = "c1",
    id_col: str = "c_custkey",
    sim_threshold: float = 0.85,
    n_parts: int = 32,
) -> pd.DataFrame:
    """Country standardization proposals (blocking.py:429-510 analog).

    Tier 1: dictionary-resolved variants grouped per canonical name (emitted
    only when some variant differs from the canonical). Tier 2: unknown
    tokens (minus org-looking/postal tokens) greedy-clustered by Jaro-Winkler
    ≥ ``sim_threshold``. Returns one row per proposal cluster:
    (cluster_id, tier, canonical_name, variants, n_records).

    Scale shape (same as ``org_rollup_blocks``): mention rows never collect
    on the driver — they pre-deduplicate per batch, coarse-hash-partition on
    the group key (canon for resolved, lowercase token for unresolved) so
    each group's mentions colocate, and the per-partition reduce emits only
    proposal rows (Tier 1) / one row per distinct unknown token (Tier 2
    input). Only the Tier-2 greedy clustering runs on the driver, over the
    unique unknown-token vocabulary (bounded by the country-ish token space,
    not the corpus).
    """
    from bibexpy_ray.functions import hashing
    from bibexpy_ray.pipelines.entity import greedy_cluster
    from bibexpy_ray.stages.shuffle import hash_partition_apply

    cols = ["cluster_id", "tier", "canonical_name", "variants", "n_records"]
    mid_cols = cols + ["_tok"]

    def extract(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for rid, val in zip(batch[id_col], batch[c1_col]):
            for tok in geo.extract_country_tokens(val):
                t = tok.strip()
                if not t:
                    continue
                canon = geo.canonical_country(t)
                if canon is None and (
                    geo.is_org(t) or any(ch.isdigit() for ch in t)
                ):
                    continue  # never send orgs/postals to Tier 2
                rows.append(
                    {
                        "key": canon if canon else t.lower(),
                        "token": t,
                        "canon": canon or "",
                        "rid": rid,
                    }
                )
        out = pd.DataFrame(rows, columns=["key", "token", "canon", "rid"])
        # per-batch combiner: the shuffle carries distinct mentions only
        return out.drop_duplicates(subset=["key", "token", "rid"])

    def add_part(batch: pa.Table) -> pa.Table:
        h = hashing.text_hash_u64(batch.column("key"))
        return batch.append_column(
            "_part",
            pa.array((h % np.uint64(n_parts)).astype(np.int32), type=pa.int32()),
        )

    def per_part(part: pd.DataFrame) -> pd.DataFrame:
        rows: list[dict] = []
        resolved = part[part["canon"] != ""]
        for canon, g in resolved.groupby("canon"):
            variants = sorted(set(g["token"]))
            if all(v.strip().lower() == canon.lower() for v in variants):
                continue  # already canonical everywhere
            rows.append(
                {
                    "cluster_id": f"country_{canon.lower().replace(' ', '_')}",
                    "tier": 1,
                    "canonical_name": canon,
                    "variants": "; ".join(variants),
                    "n_records": int(g["rid"].nunique()),
                    "_tok": "",
                }
            )
        unresolved = part[part["canon"] == ""]
        # tier-2 INPUT rows: one per distinct unknown token (deterministic
        # min-cased representative); global clustering happens on the driver
        for low, g in unresolved.groupby("key"):
            rows.append(
                {
                    "cluster_id": "",
                    "tier": -1,
                    "canonical_name": "",
                    "variants": min(g["token"]),
                    "n_records": int(g["rid"].nunique()),
                    "_tok": str(low),
                }
            )
        return pd.DataFrame(rows, columns=mid_cols)

    reduced = hash_partition_apply(
        ds.map_batches(extract, batch_format="pandas").map_batches(
            add_part, batch_format="pyarrow"
        ),
        n_parts,
        per_part,
        empty_like=pd.DataFrame(
            {c: pd.Series([], dtype=(np.int64 if c in ("tier", "n_records") else object)) for c in mid_cols}
        ),
    ).to_pandas()
    out_rows = reduced[reduced["tier"] == 1].drop(columns=["_tok"])
    unres = reduced[reduced["tier"] == -1].sort_values("_tok")
    tier2_rows: list[dict] = []
    if len(unres):
        toks = unres["variants"].tolist()
        ns = unres["n_records"].to_numpy(dtype=np.int64)
        for ci, comp in enumerate(
            greedy_cluster([t.lower() for t in toks], sim_threshold)
        ):
            tier2_rows.append(
                {
                    "cluster_id": f"country_u_{ci}",
                    "tier": 2,
                    "canonical_name": "",
                    "variants": "; ".join(sorted(toks[i] for i in comp)),
                    "n_records": int(ns[list(comp)].sum()),
                }
            )
    out = pd.concat(
        [out_rows, pd.DataFrame(tier2_rows, columns=cols)], ignore_index=True
    )
    if not len(out):
        return pd.DataFrame(columns=cols)
    out["tier"] = out["tier"].astype(np.int64)
    out["n_records"] = out["n_records"].astype(np.int64)
    return out[cols].sort_values("cluster_id").reset_index(drop=True)


def org_rollup_blocks(
    ds: rd.Dataset,
    c1_col: str = "c1",
    id_col: str = "c_custkey",
    sim_threshold: float = 0.85,
    auto_threshold: float = 0.95,
    n_parts: int = 32,
) -> pd.DataFrame:
    """Affiliation → parent-institution rollup proposals (blocking.py:513-582).

    Per parsed address: block on the first significant normalized-institution
    token; greedy-cluster within blocks; a cluster is Tier 1 (auto) when its
    min pairwise JW ≥ ``auto_threshold``, else Tier 2. The whole block step
    runs distributed (coarse hash partition on the block key; whole blocks
    colocate); only proposal rows return to the driver.
    """
    from bibexpy_ray.functions import hashing
    from bibexpy_ray.functions.normalize import normalize_name
    from bibexpy_ray.pipelines.entity import greedy_cluster, min_pairwise_jw

    STOP = {"the", "of", "and", "for", "univ", "university"}

    def extract(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for rid, val in zip(batch[id_col], batch[c1_col]):
            for addr in geo.split_c1_addresses(val):
                info = geo.parse_c1_address(addr)
                inst = info["institution"]
                if not inst:
                    continue
                norm = normalize_name(inst)
                if not norm:
                    continue
                toks = [t for t in norm.split() if t not in STOP]
                key = toks[0] if toks else norm[:5]
                rows.append(
                    {"key": key, "rid": rid, "raw": addr, "norm": norm, "parent": inst}
                )
        return pd.DataFrame(rows, columns=["key", "rid", "raw", "norm", "parent"])

    def add_part(batch: pa.Table) -> pa.Table:
        h = hashing.text_hash_u64(batch.column("key"))
        return batch.append_column(
            "_part",
            pa.array((h % np.uint64(n_parts)).astype(np.int32), type=pa.int32()),
        )

    def per_part(part: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        rows: list[dict] = []
        for key, members in part.groupby("key"):
            norms = members["norm"].tolist()
            for ci, comp in enumerate(greedy_cluster(norms, sim_threshold)):
                comp = list(comp)
                sub = members.iloc[comp]
                parent = Counter(sub["parent"]).most_common(1)[0][0]
                variants = sorted(set(sub["raw"]))
                if len(variants) == 1 and variants[0].strip() == parent.strip():
                    continue
                comp_norms = set(sub["norm"])
                tier = (
                    1
                    if len(comp_norms) < 2
                    or min_pairwise_jw(sorted(comp_norms)) >= auto_threshold
                    else 2
                )
                rows.append(
                    {
                        "cluster_id": f"org_{key}_{ci}",
                        "tier": tier,
                        "canonical_name": parent,
                        "variants": "; ".join(variants),
                        "n_records": int(sub["rid"].nunique()),
                    }
                )
        cols = ["cluster_id", "tier", "canonical_name", "variants", "n_records"]
        return pd.DataFrame(rows, columns=cols)

    from bibexpy_ray.stages.shuffle import hash_partition_apply

    out = hash_partition_apply(
        ds.map_batches(extract, batch_format="pandas").map_batches(
            add_part, batch_format="pyarrow"
        ),
        n_parts,
        per_part,
    ).to_pandas()
    return out.sort_values("cluster_id").reset_index(drop=True)
