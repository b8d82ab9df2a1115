"""Run outputs: the reference's analysis-folder pattern at scale.

The reference writes each merge run into a self-contained directory
(merged.xlsx + match_audit/conflict/borderline/statistics side-files +
meta.json, /root/reference/apps/api/services/analyses.py:26-101,
smart_merger.py:760-791). Our analog is a run directory of partitioned
Parquet side-outputs plus a JSON manifest — resumable (one directory per
output, atomic rename) and queryable without the engine:

    out_dir/
      manifest.json          config, row counts, metrics
      canonical/             survivor rows (cluster losers dropped), partitioned parquet
      clusters/              cluster_id, survivor_id, cluster_size, members
      match_audit/           verified edges with stage/confidence/similarity
      borderline_queue/      uncertain pairs awaiting decisions
      exports/clusters.tsv   flat TSV export (VOSviewer-style sink analog)

Binary image bytes appear only in `canonical/` and stream straight from the
input dataset — they never pass through the driver.
"""

from __future__ import annotations

import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from bibexpy_ray.pipelines.dedup_images import DedupResult


def _write_pd(df: pd.DataFrame, path: str) -> None:
    os.makedirs(path, exist_ok=True)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(path, "part-0.parquet"))


def save_run(result: DedupResult, ds: rd.Dataset, out_dir: str) -> dict:
    """Persist a DedupResult + canonical dataset into a run directory."""
    os.makedirs(out_dir, exist_ok=True)
    canonical = result.canonical(ds)
    canon_dir = os.path.join(out_dir, "canonical")
    # bound file count: the canonical filter job emits many tiny blocks
    # (measured 256 files of ~375 rows for a 96k-row canonical — a
    # downstream read then pays 256 task startups); coalescing to ~8k-row
    # files keeps reads fast while leaving enough files for parallel
    # re-reads (incremental runs re-read this table every increment)
    canonical.write_parquet(canon_dir, min_rows_per_file=8_192)

    # persist the canonical rows' FEATURES (signature-stage schema) so an
    # incremental run re-featurizes only its new shard — the index reads its
    # signatures straight off this table (pipelines/incremental.py)
    outputs = ["canonical", "clusters", "match_audit", "borderline_queue",
               "exports/clusters.tsv"]
    if result.features_ds is not None:
        feat_dir = os.path.join(out_dir, "features")
        result.filter_losers(result.features_ds).write_parquet(
            feat_dir, min_rows_per_file=8_192
        )
        outputs.append("features")

    _write_pd(result.clusters, os.path.join(out_dir, "clusters"))
    _write_pd(result.audit, os.path.join(out_dir, "match_audit"))
    _write_pd(result.borderline, os.path.join(out_dir, "borderline_queue"))

    exports = os.path.join(out_dir, "exports")
    os.makedirs(exports, exist_ok=True)
    result.clusters.to_csv(os.path.join(exports, "clusters.tsv"), sep="\t", index=False)

    n_canonical = rd.read_parquet(canon_dir).count()
    manifest = {
        "metrics": result.metrics,
        "rows_canonical": n_canonical,
        "n_clusters": int(len(result.clusters)),
        "n_borderline": int(len(result.borderline)),
        "outputs": outputs,
    }
    tmp = os.path.join(out_dir, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2)
    os.replace(tmp, os.path.join(out_dir, "manifest.json"))
    from bibexpy_ray.state import audit

    audit.write(
        out_dir, "dedup", "Dedup run saved",
        details={
            **result.metrics,
            "rows_in": int(ds.count()),  # parquet metadata count, no scan
            "rows_canonical": n_canonical,
        },
    )
    return manifest


def load_manifest(out_dir: str) -> dict:
    with open(os.path.join(out_dir, "manifest.json")) as f:
        return json.load(f)


def export_run_xlsx(result: DedupResult, path: str) -> str:
    """Statistic.xlsx-style workbook for a dedup run (smart_merger.py:770-791
    writes merged.xlsx + audit side-sheets; the reference UI serves them as
    downloads). Sheets: Summary (metrics), Clusters, Match_Audit,
    Borderline. Driver-side sink for the bounded report tables — the bulk
    canonical rows stay in parquet (see save_run)."""
    from bibexpy_ray.sources.xlsx import write_xlsx

    summary = pd.DataFrame(
        {
            "Metric": list(result.metrics),
            "Value": [result.metrics[k] for k in result.metrics],
        }
    )
    return write_xlsx(
        {
            "Summary": summary,
            "Clusters": result.clusters,
            "Match_Audit": result.audit,
            "Borderline": result.borderline,
        },
        path,
    )


def overview_xlsx(sf_dir: str, path: str) -> str:
    """Data-health overview workbook (quality.py:196-214 /overview XLSX):
    a Summary sheet (total records + weighted health score) and a Fields
    sheet (per-field filled/missing/fill-rate), computed by the streaming
    quality partials."""
    from bibexpy_ray.pipelines.relational import health_score, quality_stats
    from bibexpy_ray.sources.xlsx import write_xlsx

    stats = quality_stats(sf_dir)
    hs = health_score(sf_dir)
    total = int(hs["total_records"].iloc[0])
    fields = pd.DataFrame(
        {
            "Field": stats["column_name"],
            "Total": total,
            "Filled": stats["n_filled"],
            "Missing": stats["n_missing"],
            "Fill rate (%)": (stats["n_filled"] * 1000 // max(total, 1)) / 10.0,
        }
    )
    summary = pd.DataFrame(
        {
            "Metric": ["Total records", "Health score (%)"],
            "Value": [total, int(hs["health_bp"].iloc[0]) / 100.0],
        }
    )
    return write_xlsx({"Summary": summary, "Fields": fields}, path)
