"""CLI (ray job submit surface) smoke test — runs in its own process with its
own Ray session, as a submitted job would."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_cli_synth_and_dedup(tmp_path):
    corpus = str(tmp_path / "corpus")
    out = subprocess.run(
        [sys.executable, "-m", "bibexpy_ray.cli", "synth", "--out", corpus,
         "--rows", "120", "--num-cpus", "2"],
        capture_output=True, text=True, timeout=300,
        cwd=REPO, env={**os.environ, "PYTHONPATH": REPO, "RAY_ADDRESS": ""},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    info = json.loads([l for l in out.stdout.splitlines() if l.startswith("{")][-1])
    assert info["rows"] == 120

    run_dir = str(tmp_path / "run")
    ckpt = str(tmp_path / "ckpt")
    xlsx = str(tmp_path / "run.xlsx")
    out = subprocess.run(
        [sys.executable, "-m", "bibexpy_ray.cli", "dedup", "--input", corpus,
         "--out", run_dir, "--checkpoints", ckpt, "--num-cpus", "2",
         "--xlsx", xlsx],
        capture_output=True, text=True, timeout=300,
        cwd=REPO, env={**os.environ, "PYTHONPATH": REPO, "RAY_ADDRESS": ""},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    result = json.loads([l for l in out.stdout.splitlines() if l.startswith("{")][-1])
    assert result["metrics"]["clusters"] == 20  # 10 cohorts x 2 clusters
    assert os.path.exists(os.path.join(run_dir, "manifest.json"))
    assert os.path.exists(os.path.join(run_dir, "exports", "clusters.tsv"))
    from bibexpy_ray.sources.xlsx import read_xlsx

    wb = read_xlsx(xlsx)
    assert list(wb) == ["Summary", "Clusters", "Match_Audit", "Borderline"]
    assert len(wb["Clusters"]) == 20
    # --checkpoints engages path-mode per-partition feature checkpoints
    import glob as _glob
    assert _glob.glob(os.path.join(ckpt, "stage=features", "part-*", "_DONE"))


def test_cli_prepare_subcommand(tmp_path):
    """`prepare` converts raw exports then skips when fresh (exit 0 both
    times); the CLI owns its own Ray session (subprocess)."""
    import json
    import pandas as pd

    from bibexpy_ray.sources.tagged_text import format_records

    raw = tmp_path / "raw"
    raw.mkdir()
    (raw / "w.txt").write_text(
        format_records(pd.DataFrame({"TI": ["One"], "PY": ["2020"]}))
    )
    cmd = [
        sys.executable, "-m", "bibexpy_ray.cli", "prepare",
        "--raw", str(raw), "--processed", str(tmp_path / "processed"),
        "--num-cpus", "2",
    ]
    env = {**os.environ, "PYTHONPATH": "/root/repo"}
    out = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=300)
    assert out.returncode == 0, out.stderr[-800:]
    rep = json.loads([l for l in out.stdout.splitlines() if l.startswith("{")][-1])
    assert rep["did_convert"] is True and rep["wos"]
    out2 = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=300)
    rep2 = json.loads([l for l in out2.stdout.splitlines() if l.startswith("{")][-1])
    assert rep2["did_convert"] is False and rep2["wos"]
