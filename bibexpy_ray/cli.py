"""CLI entry point — the `ray job submit` surface of the engine.

    ray job submit -- python -m bibexpy_ray.cli dedup \
        --input /data/corpus_parquet --out /data/run1 [--no-bytes]

Owns its Ray session (guarded init — the library itself never calls
ray.init). Writes the full run folder (canonical + clusters + match_audit +
borderline_queue + manifest) and prints one JSON metrics line.
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray(num_cpus: int | None) -> None:
    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "logging_level": "ERROR"}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(address="local", **kwargs)


def cmd_dedup(args: argparse.Namespace) -> int:
    _init_ray(args.num_cpus)
    import ray
    import ray.data as rd

    from bibexpy_ray.config import DedupConfig, tune_data_context

    # the corpus carries an opaque bytes column; this session is CLI-owned
    tune_data_context(payload="binary")
    from bibexpy_ray.pipelines.dedup_images import FEATURE_INPUT_COLS, dedup_images
    from bibexpy_ray.pipelines.export import save_run

    cfg = DedupConfig()
    if args.checkpoints:
        # path input + run_dir -> per-partition feature checkpoints with
        # lineage (RunDir.materialize_partitioned); the partitioned reads
        # prune to FEATURE_INPUT_COLS themselves
        result = dedup_images(args.input, cfg, run_dir=args.checkpoints)
    else:
        # prune at the read: the dedup path never touches image bytes
        feat_ds = rd.read_parquet(args.input, columns=FEATURE_INPUT_COLS)
        result = dedup_images(feat_ds, cfg)
    full_ds = rd.read_parquet(args.input)  # canonical output carries payloads
    manifest = save_run(result, full_ds, args.out)
    if getattr(args, "xlsx", None):
        # Statistic.xlsx-style report workbook (reference download analog)
        from bibexpy_ray.pipelines.export import export_run_xlsx

        export_run_xlsx(result, args.xlsx)
        manifest = {**manifest, "xlsx": args.xlsx}
    print(json.dumps({"metrics": result.metrics, **manifest}))
    ray.shutdown()
    return 0


def cmd_dedup_incr(args: argparse.Namespace) -> int:
    _init_ray(args.num_cpus)
    import ray
    import ray.data as rd

    from bibexpy_ray.config import DedupConfig, tune_data_context

    tune_data_context(payload="binary")
    from bibexpy_ray.pipelines.incremental import dedup_images_incremental

    clusters_ds, metrics = dedup_images_incremental(
        args.base, args.input, DedupConfig(), run_dir=args.checkpoints
    )
    import os

    os.makedirs(args.out, exist_ok=True)
    out_path = os.path.join(args.out, "clusters")
    clusters_ds.write_parquet(out_path)
    print(json.dumps({"metrics": metrics, "clusters": out_path}))
    ray.shutdown()
    return 0


def cmd_synth(args: argparse.Namespace) -> int:
    _init_ray(args.num_cpus)
    import ray

    from bibexpy_ray.synth import write_corpus_parquet

    path = write_corpus_parquet(args.out, args.rows, seed=args.seed)
    print(json.dumps({"path": path, "rows": args.rows}))
    ray.shutdown()
    return 0


def cmd_convert(args: argparse.Namespace) -> int:
    _init_ray(args.num_cpus)
    import ray

    from bibexpy_ray.sources.formats import convert

    out = convert(args.input, args.out, args.from_fmt, args.to_fmt)
    print(json.dumps({"path": out, "from": args.from_fmt, "to": args.to_fmt}))
    ray.shutdown()
    return 0


def cmd_prepare(args: argparse.Namespace) -> int:
    _init_ray(args.num_cpus)
    import ray

    from bibexpy_ray.sources.formats import auto_prepare

    report = auto_prepare(args.raw, args.processed, log=lambda m: print(f"# {m}"))
    print(json.dumps(report))
    ray.shutdown()
    return 0 if not report["skipped"] else 1


def cmd_report(args: argparse.Namespace) -> int:
    # driver-side control plane — no Ray session needed
    from bibexpy_ray.state import audit

    print(audit.format_markdown_report(args.run_dir))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="bibexpy_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("dedup", help="run the near-dup pipeline over a corpus")
    d.add_argument("--input", required=True, help="parquet dir/file of IMAGE_SCHEMA rows")
    d.add_argument("--out", required=True, help="run output directory")
    d.add_argument("--checkpoints", default=None, help="stage-checkpoint dir (resume)")
    d.add_argument("--num-cpus", type=int, default=None)
    d.add_argument(
        "--xlsx", default=None,
        help="also write a Summary/Clusters/Match_Audit/Borderline workbook",
    )
    d.set_defaults(fn=cmd_dedup)

    di = sub.add_parser(
        "dedup-incr",
        help="fold a new shard into a saved base run (incremental dedup)",
    )
    di.add_argument("--base", required=True, help="base run dir (a save_run output)")
    di.add_argument("--input", required=True, help="new-shard parquet dir/file")
    di.add_argument("--out", required=True, help="output directory")
    di.add_argument("--checkpoints", default=None, help="stage-checkpoint dir (resume)")
    di.add_argument("--num-cpus", type=int, default=None)
    di.set_defaults(fn=cmd_dedup_incr)

    s = sub.add_parser("synth", help="generate the deterministic synthetic corpus")
    s.add_argument("--out", required=True)
    s.add_argument("--rows", type=int, required=True)
    s.add_argument("--seed", type=int, default=42)
    s.add_argument("--num-cpus", type=int, default=None)
    s.set_defaults(fn=cmd_synth)

    c = sub.add_parser("convert", help="any-to-any format conversion (streaming)")
    c.add_argument("--input", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--from", dest="from_fmt", required=True,
                   choices=["tagged", "scopus_csv", "parquet", "csv"])
    c.add_argument("--to", dest="to_fmt", required=True,
                   choices=["tagged", "bibtex", "ris", "parquet", "csv", "tsv"])
    c.add_argument("--num-cpus", type=int, default=None)
    c.set_defaults(fn=cmd_convert)

    pr = sub.add_parser(
        "prepare", help="auto_prepare: raw CSV/tagged -> per-kind parquet, skip-if-fresh"
    )
    pr.add_argument("--raw", required=True, help="directory of raw exports")
    pr.add_argument("--processed", required=True, help="output directory")
    pr.add_argument("--num-cpus", type=int, default=None)
    pr.set_defaults(fn=cmd_prepare)

    r = sub.add_parser("report", help="render a run dir's Markdown ops report")
    r.add_argument("--run-dir", required=True)
    r.set_defaults(fn=cmd_report)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
