"""auto_prepare: implicit raw → parquet preparation with skip-if-fresh,
per-kind error tolerance, and input-set fingerprinting."""

from __future__ import annotations

import os
import time

import pandas as pd
import ray.data as rd

from bibexpy_ray.sources.formats import auto_prepare
from bibexpy_ray.sources.tagged_text import format_records


def _make_raw(tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir()
    # WoS-style tagged text
    wos = pd.DataFrame({"TI": ["Alpha Paper", "Beta Paper"], "PY": ["2020", "2021"]})
    (raw / "wos_export.txt").write_text(format_records(wos))
    # Scopus-style CSV (headers from the 31-entry map)
    (raw / "scopus_export.csv").write_text(
        "Authors,Title,Year,DOI\n"
        "Zhang C.; Guo R.,Gamma Paper,2022,10.1/g\n"
        "Lee K.,Delta Paper,2023,10.1/d\n"
    )
    return raw


def test_auto_prepare_converts_then_skips(tmp_path, ray_session):
    raw = _make_raw(tmp_path)
    processed = tmp_path / "processed"

    logs: list[str] = []
    rep = auto_prepare(str(raw), str(processed), log=logs.append)
    assert rep["did_convert"] is True
    assert rep["csv"] == 1 and rep["txt"] == 1 and rep["skipped"] == []
    wos = rd.read_parquet(rep["wos"]).to_pandas()
    assert sorted(wos["TI"]) == ["Alpha Paper", "Beta Paper"]
    scp = rd.read_parquet(rep["scopus"]).to_pandas()
    assert "AU" in scp.columns and len(scp) == 2  # headers relabeled to tags

    # second run: everything fresh, nothing converts
    rep2 = auto_prepare(str(raw), str(processed), log=logs.append)
    assert rep2["did_convert"] is False
    assert rep2["wos"] == rep["wos"] and rep2["scopus"] == rep["scopus"]
    assert any("already prepared" in m for m in logs)


def test_auto_prepare_reconverts_only_stale_kind(tmp_path, ray_session):
    raw = _make_raw(tmp_path)
    processed = tmp_path / "processed"
    auto_prepare(str(raw), str(processed))

    # touch only the wos raw newer than its output
    future = time.time() + 60
    os.utime(raw / "wos_export.txt", (future, future))
    marker_s = os.path.getmtime(processed / "scopus" / "_PREPARED.json")
    rep = auto_prepare(str(raw), str(processed))
    assert rep["did_convert"] is True
    # scopus output untouched (marker not rewritten)
    assert os.path.getmtime(processed / "scopus" / "_PREPARED.json") == marker_s


def test_auto_prepare_new_input_file_invalidates(tmp_path, ray_session):
    raw = _make_raw(tmp_path)
    processed = tmp_path / "processed"
    auto_prepare(str(raw), str(processed))
    # adding a raw file changes the recorded input set even with old mtimes
    extra = pd.DataFrame({"TI": ["Extra Paper"], "PY": ["2019"]})
    p = raw / "wos_extra.txt"
    p.write_text(format_records(extra))
    past = time.time() - 3600
    os.utime(p, (past, past))
    rep = auto_prepare(str(raw), str(processed))
    assert rep["did_convert"] is True
    wos = rd.read_parquet(rep["wos"]).to_pandas()
    assert len(wos) == 3


def test_auto_prepare_error_tolerant_per_kind(tmp_path, ray_session, monkeypatch):
    raw = _make_raw(tmp_path)
    processed = tmp_path / "processed"

    import bibexpy_ray.sources.formats as formats

    def boom(paths):
        raise RuntimeError("scopus reader exploded")

    monkeypatch.setattr(formats, "read_scopus_csv", boom)
    rep = auto_prepare(str(raw), str(processed))
    # the failing kind is reported, the other kind still converts
    assert any("scopus" in s for s in rep["skipped"])
    assert rep["scopus"] is None and rep["wos"] is not None
    assert rd.read_parquet(rep["wos"]).count() == 2


def test_auto_prepare_missing_raw_dir(tmp_path):
    rep = auto_prepare(str(tmp_path / "nope"), str(tmp_path / "processed"))
    assert rep == {
        "scopus": None, "wos": None, "csv": 0, "txt": 0,
        "skipped": [], "did_convert": False,
    }
