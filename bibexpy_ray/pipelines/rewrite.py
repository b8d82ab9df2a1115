"""Apply-rewrite stage: broadcast variant→canonical substitution over a corpus.

The reference's ``apply_clusters`` / ``apply_splits``
(/root/reference/apps/api/services/disambiguation/pipeline.py:721-975,
semantics reimplemented): a proposal set (variant → canonical, from
country_blocks / org_rollup_blocks / entity clusters) is applied to every
record's field with structure-preserving, whitespace/case-tolerant
substitution, counting changed rows, with an optional pre-apply snapshot of
the untouched column for restore.

Ray-Data-first: the mapping is a small side — ``ray.put`` once, read inside
every ``map_batches`` task (never re-shipped per batch); the corpus streams
through one vectorized-scalar pass; the changed count is a partial sum
aggregated from per-batch counters, not a driver scan. Idempotence: applying
the same mapping twice changes nothing (canonical forms map to themselves or
are absent from the variant keys) — tested propose → apply → re-propose.
"""

from __future__ import annotations

from typing import Callable, Literal

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from bibexpy_ray.functions import geo

Kind = Literal["country", "affiliation", "org", "exact"]

_APPLY_FN: dict[str, Callable[[str, dict], str]] = {
    "country": geo.replace_country_in_c1,
    "affiliation": geo.replace_affiliation_in_c1,
    "org": geo.replace_org_in_c1,
}


def _exact_replace(value: str, mapping: dict) -> str:
    """Whole-value whitespace/case-tolerant replacement (entity apply_clusters
    over plain mention columns, pipeline.py:721-820 analog)."""
    return mapping.get(geo._ws_lower(value), value)


def _finalize_rewrite(rewritten: rd.Dataset) -> tuple[rd.Dataset, dict]:
    """Shared tail of the apply stages: sum the per-batch ``_changed``
    markers into the metric, then drop the marker column."""
    changed = int(
        rewritten.map_batches(
            lambda df: pd.DataFrame({"c": [int(df["_changed"].sum())]}),
            batch_format="pandas",
        ).sum("c")
        or 0
    )
    total = rewritten.count()
    out = rewritten.map_batches(
        lambda df: df.drop(columns=["_changed"]), batch_format="pandas"
    )
    return out, {"changed_rows": changed, "total_rows": total}


def apply_rewrite(
    ds: rd.Dataset,
    col: str,
    variant_to_canonical: dict[str, str],
    kind: Kind = "exact",
    snapshot_col: str | None = None,
) -> tuple[rd.Dataset, dict]:
    """Rewrite ``col`` with the proposal mapping; return (dataset, metrics).

    metrics: {"changed_rows": n, "total_rows": n}. When ``snapshot_col`` is
    given the pre-apply value is preserved in that column (the reference's
    snapshot-before-apply, restorable by renaming back).
    """
    fn = _exact_replace if kind == "exact" else _APPLY_FN[kind]
    # lowercase keys once here; per-kind functions normalize their own probes
    mapping = {str(k).lower(): v for k, v in variant_to_canonical.items()}
    map_ref = ray.put(mapping)

    def apply_batch(batch: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(map_ref)
        vals = batch[col]
        new = [fn(v, m) for v in vals]
        out = batch.copy()
        if snapshot_col:
            out[snapshot_col] = vals
        out[col] = new
        out["_changed"] = np.array(
            [a != b for a, b in zip(vals, new)], dtype=bool
        )
        return out

    return _finalize_rewrite(
        ds.map_batches(apply_batch, batch_format="pandas").materialize()
    )


def apply_splits(
    ds: rd.Dataset,
    assignments: pd.DataFrame,
    mention_col: str,
    rec_col: str,
    snapshot_col: str | None = None,
) -> tuple[rd.Dataset, dict]:
    """Apply split-proposal renames PER RECORD (the reference's
    ``apply_splits``, pipeline.py:851-975 analog): a record listed in
    ``assignments`` whose mention matches (whitespace/case-tolerant) is
    renamed to its component's suffixed name; everything else passes through.

    The assignment table broadcasts once via ``ray.put`` as
    {rec_id: (mention_lower, proposed_name)}; at 100 TB the assignment side
    is proposal-sized (dup mentions only), not corpus-sized. Idempotent:
    renamed mentions carry a split suffix, which the proposal builder skips,
    so propose → apply → re-propose yields nothing.
    """
    a = {
        int(r): (geo._ws_lower(m), p)
        for r, m, p in zip(
            assignments["rec_id"], assignments["mention"], assignments["proposed_name"]
        )
    }
    map_ref = ray.put(a)

    def apply_batch(batch: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(map_ref)
        recs = batch[rec_col].to_numpy()
        vals = batch[mention_col]
        new = []
        for rid, v in zip(recs, vals):
            hit = m.get(int(rid))
            if hit is not None and geo._ws_lower(v) == hit[0]:
                new.append(hit[1])
            else:
                new.append(v)
        out = batch.copy()
        if snapshot_col:
            out[snapshot_col] = vals
        out[mention_col] = new
        out["_changed"] = np.array(
            [x != y for x, y in zip(vals, new)], dtype=bool
        )
        return out

    return _finalize_rewrite(
        ds.map_batches(apply_batch, batch_format="pandas").materialize()
    )


def restore_from_snapshot(
    ds: rd.Dataset, col: str, snapshot_col: str
) -> rd.Dataset:
    """Undo an apply: the pre-apply snapshot column becomes ``col`` again and
    the snapshot column disappears (the reference's ``restore_snapshot``,
    pipeline.py:1040-1070 analog — there a saved frame version, here the
    in-row snapshot written by apply_rewrite/apply_splits). One streaming
    pass; apply → restore is the identity, tested."""

    def restore(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out[col] = out[snapshot_col]
        return out.drop(columns=[snapshot_col])

    return ds.map_batches(restore, batch_format="pandas")


def country_mapping_from_blocks(blocks: pd.DataFrame) -> dict[str, str]:
    """Tier-1 country proposals → {variant_lower: canonical} apply map."""
    mapping: dict[str, str] = {}
    for t in blocks.itertuples(index=False):
        if int(t.tier) != 1 or not t.canonical_name:
            continue
        for v in str(t.variants).split("; "):
            if v:
                mapping[v.lower()] = t.canonical_name
    return mapping


def org_mapping_from_blocks(blocks: pd.DataFrame) -> dict[str, str]:
    """Tier-1 org-rollup proposals → {full-address variant: parent} map."""
    mapping: dict[str, str] = {}
    for t in blocks.itertuples(index=False):
        if int(t.tier) != 1 or not t.canonical_name:
            continue
        for v in str(t.variants).split("; "):
            if v:
                mapping[v] = t.canonical_name
    return mapping
