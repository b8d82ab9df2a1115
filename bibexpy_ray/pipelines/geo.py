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
per process, a few KB); token extraction is per-row python over short strings
(bounded by address count, not corpus bytes); the aggregation is a partial
count inside map_batches followed by a small groupby — no full-corpus shuffle.
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


def country_counts(sf_dir: str) -> pd.DataFrame:
    """Canonical-country mention counts over the synthetic C1 column —
    exercises split_c1_addresses + canonical_country end-to-end; the oracle
    reconstructs the counts from the generating function."""
    ds = synth_c1_addresses(sf_dir)

    def count_part(batch: pd.DataFrame) -> pd.DataFrame:
        # partial (combiner) aggregation inside the batch: the groupby below
        # only shuffles (country, n) partials, never rows
        counts: dict[str, int] = {}
        for val in batch["c1"]:
            for tok in geo.extract_country_tokens(val):
                canon = geo.canonical_country(tok)
                if canon:
                    counts[canon] = counts.get(canon, 0) + 1
        return pd.DataFrame(
            {"country": list(counts), "n": list(counts.values())}
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


def c1_institutions(sf_dir: str) -> pd.DataFrame:
    """Parent-institution counts via parse_c1_address over the synthetic C1 —
    exercises the org-keyword parser (is_org / subunit / geo stripping)."""
    ds = synth_c1_addresses(sf_dir)

    def count_part(batch: pd.DataFrame) -> pd.DataFrame:
        counts: dict[str, int] = {}
        for val in batch["c1"]:
            for addr in geo.split_c1_addresses(val):
                inst = geo.parse_c1_address(addr)["institution"]
                if inst:
                    counts[inst] = counts.get(inst, 0) + 1
        return pd.DataFrame(
            {"institution": list(counts), "n": list(counts.values())}
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
        changed = np.zeros(len(ks), dtype=bool)
        for i, val in enumerate(batch["c1"]):
            changed[i] = geo.replace_country_in_c1(val, mapping) != val
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
