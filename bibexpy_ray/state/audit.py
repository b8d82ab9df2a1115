"""Operation audit log + Markdown ops report + saved filter presets.

Semantics reimplemented (NOT copied) from the reference:

- append-only JSONL audit log with per-analysis scoping, category summary and
  a rendered Markdown operation report
  (/root/reference/apps/api/services/audit.py:33-151, 259-330);
- saved filter presets as a JSON list of {name, spec} with overwrite-by-name
  create and delete, each mutation audited
  (/root/reference/apps/api/routers/filter.py:60-131).

Everything here is driver-side control plane over a run directory — tiny
JSON/JSONL files next to the Parquet outputs, never data-plane state.
"""

from __future__ import annotations

import datetime as _dt
import json
import os
import time
from typing import Any, Optional

import ray.data as rd

_AUDIT_FILE = "audit.jsonl"
_PRESET_FILE = "filter_presets.json"

#: human labels for report rendering (reference KIND_LABELS analog)
KIND_LABELS = {
    "dedup": "Dedup run",
    "merge": "Merge",
    "export": "Export",
    "filter_save": "Preset saved",
    "borderline": "Borderline decision",
    "rewrite": "Cluster rewrite",
    "snapshot": "Snapshot",
    "report": "Report",
}


# ---------------------------------------------------------------------------
# audit log (JSONL, append-only)
# ---------------------------------------------------------------------------

def _log_path(run_dir: str) -> str:
    return os.path.join(run_dir, _AUDIT_FILE)


def write(
    run_dir: str,
    kind: str,
    title: str,
    details: Optional[dict] = None,
    analysis_id: Optional[str] = None,
    user_action: Optional[str] = None,
) -> dict:
    """Append one audit entry; returns the entry written."""
    os.makedirs(run_dir, exist_ok=True)
    entry: dict[str, Any] = {"ts": time.time(), "kind": kind, "title": title}
    if details:
        entry["details"] = details
    if analysis_id:
        entry["analysis_id"] = analysis_id
    if user_action:
        entry["user_action"] = user_action
    with open(_log_path(run_dir), "a", encoding="utf-8") as f:
        f.write(json.dumps(entry, ensure_ascii=False) + "\n")
    return entry


def read(
    run_dir: str,
    kind: Optional[str] = None,
    analysis_id: Optional[str] = None,
) -> list[dict]:
    """All entries in write order, optionally filtered by kind / analysis."""
    p = _log_path(run_dir)
    if not os.path.exists(p):
        return []
    out = []
    with open(p, encoding="utf-8") as f:
        for line in f:
            if not line.strip():
                continue
            e = json.loads(line)
            if kind is not None and e.get("kind") != kind:
                continue
            if analysis_id is not None and e.get("analysis_id") != analysis_id:
                continue
            out.append(e)
    return out


def delete_for_analysis(run_dir: str, analysis_id: str) -> int:
    """Drop entries scoped to one analysis (reference audit.py:120); returns
    the number removed."""
    entries = read(run_dir)
    kept = [e for e in entries if e.get("analysis_id") != analysis_id]
    _rewrite(run_dir, kept)
    return len(entries) - len(kept)


def clear(run_dir: str) -> int:
    entries = read(run_dir)
    _rewrite(run_dir, [])
    return len(entries)


def _rewrite(run_dir: str, entries: list[dict]) -> None:
    p = _log_path(run_dir)
    tmp = p + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        for e in entries:
            f.write(json.dumps(e, ensure_ascii=False) + "\n")
    os.replace(tmp, p)


def summary(run_dir: str) -> dict:
    """Category counts + first/last timestamps (reference audit.py:151)."""
    entries = read(run_dir)
    if not entries:
        return {"total": 0, "by_kind": {}, "first_ts": None, "last_ts": None}
    by_kind: dict[str, int] = {}
    for e in entries:
        k = e.get("kind", "?")
        by_kind[k] = by_kind.get(k, 0) + 1
    return {
        "total": len(entries),
        "by_kind": by_kind,
        "first_ts": entries[0].get("ts"),
        "last_ts": entries[-1].get("ts"),
    }


# ---------------------------------------------------------------------------
# Markdown ops report
# ---------------------------------------------------------------------------

def _render_dedup_md(details: dict) -> list[str]:
    """Rich block for a dedup-run entry (reference _render_smart_merge_md
    analog: flow summary + per-stage table)."""
    lines = ["**Dedup summary:**", "", "| Metric | Value |", "|---|---|"]
    rows_in = details.get("rows_in")
    if rows_in is not None:
        lines.append(f"| Input rows | **{rows_in}** |")
    for key, label in (
        ("exact_edges", "Exact edges"),
        ("candidate_edges", "Candidate edges"),
        ("verified_auto", "Auto-verified edges"),
        ("borderline", "Borderline (awaiting decision)"),
        ("clusters", "Clusters"),
        ("rows_canonical", "Canonical output rows"),
    ):
        if key in details:
            lines.append(f"| {label} | {details[key]} |")
    if rows_in and details.get("rows_canonical") is not None:
        rate = (rows_in - details["rows_canonical"]) / rows_in
        lines.append(f"| Dedup rate | {rate * 100:.1f}% |")
    if details.get("duration_seconds") is not None:
        lines.append(f"| Duration | {details['duration_seconds']:.1f} s |")
    lines.append("")
    stages = {
        k[2:]: v
        for k, v in details.items()
        if k.startswith("s_") and isinstance(v, (int, float))
    }
    if stages:
        lines += ["**Stage timings (s):**", "", "| Stage | Seconds |", "|---|---|"]
        for name, sec in sorted(stages.items(), key=lambda x: -x[1]):
            lines.append(f"| {name} | {sec} |")
        lines.append("")
    return lines


def format_markdown_report(
    run_dir: str, title: str = "Operation report", analysis_id: Optional[str] = None
) -> str:
    """Render the audit log as a Markdown operation report: header, category
    summary table, then chronology with a rich block for dedup entries
    (reference audit.py:259-330 semantics)."""
    entries = read(run_dir, analysis_id=analysis_id)
    lines = [f"# {title}", "", f"**Run dir:** `{run_dir}`  ",
             f"**Total operations:** {len(entries)}", ""]
    if not entries:
        lines.append("_No operations recorded yet._")
        return "\n".join(lines)

    by_kind: dict[str, int] = {}
    for e in entries:
        k = e.get("kind", "?")
        by_kind[k] = by_kind.get(k, 0) + 1
    lines += ["## Summary", "", "| Category | Count |", "|---|---|"]
    for k, n in sorted(by_kind.items(), key=lambda x: -x[1]):
        lines.append(f"| {KIND_LABELS.get(k, k)} | {n} |")
    lines += ["", "## Chronology", ""]

    for i, e in enumerate(entries, 1):
        ts = e.get("ts")
        ts_str = (
            _dt.datetime.fromtimestamp(ts).strftime("%Y-%m-%d %H:%M:%S")
            if ts
            else "—"
        )
        label = KIND_LABELS.get(e.get("kind", ""), e.get("kind", "?"))
        lines += [f"### {i}. {label} — {e.get('title', '')}", f"_{ts_str}_", ""]
        details = e.get("details") or {}
        if e.get("kind") == "dedup" and details:
            lines.extend(_render_dedup_md(details))
            continue
        for k, v in details.items():
            if v is None or v == "":
                continue
            if isinstance(v, (list, dict)):
                v = json.dumps(v, ensure_ascii=False)
            s = str(v)
            if len(s) > 200:
                s = s[:200] + "…"
            lines.append(f"- **{k}:** {s}")
        if e.get("user_action"):
            lines.append(f"- user action: _{e['user_action']}_")
        lines.append("")
    return "\n".join(lines)


# ---------------------------------------------------------------------------
# saved filter presets
# ---------------------------------------------------------------------------

class PresetStore:
    """Saved filter specs: a JSON list of ``{name, spec}`` in the run dir.
    Create overwrites same-named presets; every mutation writes an audit
    entry (reference routers/filter.py:95-131 semantics)."""

    def __init__(self, run_dir: str):
        self.run_dir = run_dir
        os.makedirs(run_dir, exist_ok=True)
        self._path = os.path.join(run_dir, _PRESET_FILE)

    def list(self) -> list[dict]:
        if not os.path.exists(self._path):
            return []
        try:
            with open(self._path, encoding="utf-8") as f:
                return json.load(f)
        except (json.JSONDecodeError, OSError):
            return []

    def _write(self, presets: list[dict]) -> None:
        tmp = self._path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(presets, f, indent=2, ensure_ascii=False)
        os.replace(tmp, self._path)

    def save(self, name: str, spec: dict) -> int:
        if not name or len(name) > 80:
            raise ValueError("preset name must be 1-80 characters")
        presets = [p for p in self.list() if p.get("name") != name]
        presets.append({"name": name, "spec": spec})
        self._write(presets)
        write(
            self.run_dir, "filter_save", f"Preset saved: {name}",
            details={"name": name, "filter_keys": sorted(spec.keys())},
            user_action="save_preset",
        )
        return len(presets)

    def get(self, name: str) -> Optional[dict]:
        for p in self.list():
            if p.get("name") == name:
                return p["spec"]
        return None

    def delete(self, name: str) -> None:
        self._write([p for p in self.list() if p.get("name") != name])
        write(
            self.run_dir, "filter_save", f"Preset deleted: {name}",
            details={"name": name, "action": "delete"},
            user_action="delete_preset",
        )

    def apply(
        self, ds: rd.Dataset, name: str, project: Optional[list[str]] = None
    ) -> rd.Dataset:
        """Compose the named preset through the one-pass spec combinator."""
        from bibexpy_ray.pipelines.relational import apply_filter_spec

        spec = self.get(name)
        if spec is None:
            raise KeyError(f"no preset named {name!r}")
        return apply_filter_spec(ds, spec, project=project)
