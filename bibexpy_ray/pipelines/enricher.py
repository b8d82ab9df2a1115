"""Fill-all enrichment orchestration (the reference's enricher service).

Semantics reimplemented (NOT copied) from
/root/reference/apps/api/services/enricher.py:69-321:

- ``_mirror_wc_sc`` (:69-84): WC<->SC mutual copy — whichever side is blank
  takes the other's value; deterministic, needs no external source, runs
  BEFORE the API passes and once more after them.
- ``_doi_pass`` (:137-176): records with a blank DOI but a title get a
  verified reverse lookup (title+authors+year -> DOI); unsure stays blank.
- ``_api_pass`` (:87-134): one ``extract_metadata`` chain call per DOI,
  filling every still-blank field.
- ``_complete_addresses_pass`` (:255-321): C1 addresses that have an
  institution but NO country get the country appended from an affiliation
  lookup — matched by normalized institution name, else the single-country
  fallback when the paper has exactly one distinct country; existing
  countries are never overwritten.
- ``run_fill_all`` (:178-252): snapshot -> mirror -> doi -> api -> addresses
  -> mirror -> write; cancellation preserves the gains made so far; the
  report carries per-field fill rates before/after.

Ray shape: every pass is a ``map_batches`` stage producing a NEW Dataset
(never in-place), so "gains preserved on cancel" holds by construction —
each completed stage is a durable Dataset (and a RunDir checkpoint when a
run_dir is given). Fill rates are computed with a vectorized per-batch
partial aggregation (no driver scan).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import ray.data as rd

from bibexpy_ray.sources.enrich import is_blank


def mirror_fill(ds: rd.Dataset, col_a: str, col_b: str) -> rd.Dataset:
    """Mutual blank-fill between two columns (``_mirror_wc_sc`` analog,
    enricher.py:69-84): where exactly one side is blank it takes the other's
    value; both-blank and both-filled rows are untouched."""

    def pass_(batch: pd.DataFrame) -> pd.DataFrame:
        if col_a not in batch.columns or col_b not in batch.columns:
            return batch
        a_blank = batch[col_a].map(is_blank)
        b_blank = batch[col_b].map(is_blank)
        m1 = (~a_blank) & b_blank  # a present, b blank -> b = a
        m2 = (~b_blank) & a_blank  # b present, a blank -> a = b
        out = batch.copy()
        out.loc[m1, col_b] = out.loc[m1, col_a]
        out.loc[m2, col_a] = out.loc[m2, col_b]
        return out

    return ds.map_batches(pass_, batch_format="pandas")


# affiliations_fn(doi) -> list of (institution_name, country) tuples
AffiliationsFn = Callable[[str], "list[tuple[str, str]]"]


class CompleteAddressesStage:
    """Actor-pool stage: append missing countries to C1 addresses
    (``_complete_addresses_pass`` analog, enricher.py:255-321).

    ``affiliations_factory`` is called once per actor (open transports
    there) and returns the affiliations_fn. Per row: addresses whose parsed
    country is None contribute their LAST comma component as the
    institution token; the token matches an affiliation by normalized name,
    else the single-country fallback applies when the DOI's affiliations
    span exactly ONE distinct country. Existing countries never overwrite;
    both C1 and C1raw (when present) update through
    ``append_country_to_c1``. Distinct DOIs resolve once per batch via a
    per-actor cache."""

    def __init__(
        self,
        affiliations_factory: Callable[[], AffiliationsFn],
        *,
        doi_col: str = "DI",
        c1_cols: tuple = ("C1", "C1raw"),
    ) -> None:
        from bibexpy_ray.sources.enrich import LruCache

        self.fn = affiliations_factory()
        self.doi_col = doi_col
        self.c1_cols = c1_cols
        self.cache = LruCache()

    def _affs(self, doi: str):
        hit = self.cache.get(doi)
        if hit is not None:
            return hit
        try:
            affs = self.fn(doi) or []
        except Exception:
            return []  # a failing lookup skips the row, never cached
        self.cache.put(doi, affs)
        return affs

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from bibexpy_ray.functions.geo import (
            append_country_to_c1,
            parse_c1_address,
            split_c1_addresses,
        )
        from bibexpy_ray.functions.normalize import normalize_name

        cols = [c for c in self.c1_cols if c in batch.columns]
        if not cols or self.doi_col not in batch.columns:
            return batch
        main_col = cols[0]
        out = batch.copy()
        for idx in out.index:
            doi = out.at[idx, self.doi_col]
            if is_blank(doi):
                continue
            tokens: list[str] = []
            val = out.at[idx, main_col]
            if is_blank(val):
                continue
            for addr in split_c1_addresses(str(val)):
                if parse_c1_address(addr)["country"] is None:
                    parts = [p.strip() for p in addr.split(",") if p.strip()]
                    if parts:
                        tokens.append(parts[-1])
            if not tokens:
                continue
            affs = self._affs(str(doi).strip())
            if not affs:
                continue
            distinct = {c for (_n, c) in affs if c}
            single = next(iter(distinct)) if len(distinct) == 1 else None
            append_map: dict[str, str] = {}
            for tok in tokens:
                ntok = normalize_name(tok)
                matched = None
                if ntok:
                    for iname, ic in affs:
                        if ic and normalize_name(iname) == ntok:
                            matched = ic
                            break
                country = matched or single
                if country:
                    append_map[tok.lower()] = country
            if not append_map:
                continue
            for col in cols:
                old = "" if is_blank(out.at[idx, col]) else str(out.at[idx, col])
                new = append_country_to_c1(old, append_map)
                if new != old:
                    out.at[idx, col] = new
        return out


def fill_rates(ds: rd.Dataset, columns: list[str]) -> dict[str, float]:
    """Per-column fill rate via per-batch partial counts (no driver scan)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        row = {"n": [len(batch)]}
        for c in columns:
            if c in batch.columns:
                row[c] = [int((~batch[c].map(is_blank)).sum())]
            else:
                row[c] = [0]
        return pd.DataFrame(row)

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    n = int(parts["n"].sum())
    if n == 0:
        return {c: 0.0 for c in columns}
    return {c: round(float(parts[c].sum()) / n, 4) for c in columns}


def fill_all(
    ds: rd.Dataset,
    *,
    sources_factory: Callable[[], Any] | None = None,
    candidate_factory: Callable[[], Any] | None = None,
    affiliations_factory: Callable[[], AffiliationsFn] | None = None,
    mirror: tuple = ("WC", "SC"),
    fillable: tuple | None = None,
    rate_fields: list[str] | None = None,
    cache_path: str | None = None,
    concurrency: int = 4,
) -> "tuple[rd.Dataset, dict]":
    """The composed fill-all orchestration (``run_fill_all`` analog):
    mirror -> reverse-DOI pass -> multi-source API pass -> address
    completion -> mirror again, each pass a new Dataset stage (gains
    preserved on cancellation by construction), with per-field fill rates
    before/after in the report. Passes whose factory is None are skipped
    (matching the reference's credential-gated sources)."""
    from bibexpy_ray.sources.enrich import (
        FILLABLE_FIELDS,
        EnrichStage,
        MultiSourceEnrichStage,
    )

    rate_fields = rate_fields or [c for c in (ds.schema().names or [])][:12]
    before = fill_rates(ds, rate_fields)

    out = mirror_fill(ds, *mirror)

    if candidate_factory is not None:
        out = out.map_batches(
            EnrichStage,
            fn_constructor_kwargs={
                "candidate_factory": candidate_factory,
                "title_col": "TI",
                "authors_col": "AU",
                "year_col": "PY",
                "out_col": "DI",
            },
            batch_format="pyarrow",
            batch_size=512,
            concurrency=concurrency,
        ).materialize()  # pass barrier: one actor pool at a time (a chained
        # lazy pool would hold CPUs while the next pool waits for them —
        # starvation on small clusters), and a completed pass's gains are
        # durable before the next starts (the reference's cancel contract)

    if sources_factory is not None:
        kwargs: dict[str, Any] = {
            "sources_factory": sources_factory,
            "key_col": "DI",
        }
        if fillable is not None:
            kwargs["fillable"] = fillable
        if cache_path:
            kwargs["cache_path"] = cache_path
        out = out.map_batches(
            MultiSourceEnrichStage,
            fn_constructor_kwargs=kwargs,
            batch_format="pyarrow",
            batch_size=512,
            concurrency=concurrency,
        ).materialize()

    if affiliations_factory is not None:
        out = out.map_batches(
            CompleteAddressesStage,
            fn_constructor_kwargs={"affiliations_factory": affiliations_factory},
            batch_format="pandas",
            batch_size=512,
            concurrency=concurrency,
        ).materialize()

    out = mirror_fill(out, *mirror).materialize()
    after = fill_rates(out, rate_fields)
    overall_before = round(sum(before.values()) / len(before), 4) if before else 0.0
    overall_after = round(sum(after.values()) / len(after), 4) if after else 0.0
    report = {
        "method": "fill_all",
        "total": int(out.count()),
        "fill_rate_before": overall_before,
        "fill_rate_after": overall_after,
        "per_field_fill": {
            c: {"before": before[c], "after": after[c]} for c in rate_fields
        },
    }
    return out, report


def mirror_fill_documents(sf_dir: str) -> pd.DataFrame:
    """Query surface for the mirror operator over the documents table
    (lang <-> source mutual blank-fill) — oracle-checked CASE semantics."""
    from bibexpy_ray.pipelines.tables import read_table

    ds = read_table(sf_dir, "documents", ["doc_id", "lang", "source"])
    out = mirror_fill(ds, "lang", "source").to_pandas()
    out["doc_id"] = out["doc_id"].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)
