"""Minimal XLSX sink/source: typed round-trip, multi-sheet workbooks, and
the run/overview export surfaces (the reference's .xlsx download analogs)."""

import zipfile

import numpy as np
import pandas as pd
import pytest

from bibexpy_ray.sources.xlsx import read_xlsx, write_xlsx


def test_roundtrip_types(tmp_path):
    df = pd.DataFrame(
        {
            "name": ["alpha", "a & b <c>", "ünïcode ✓", ""],
            "n": np.array([1, -7, 0, 2**40], dtype=np.int64),
            "x": [1.5, -0.25, 2.0, 1e-9],
            "ok": [True, False, True, False],
        }
    )
    p = str(tmp_path / "t.xlsx")
    write_xlsx(df, p)
    got = read_xlsx(p)["Sheet1"]
    assert list(got.columns) == ["name", "n", "x", "ok"]
    assert got["name"].tolist() == df["name"].tolist()
    assert [int(v) for v in got["n"]] == df["n"].tolist()
    assert [float(v) for v in got["x"]] == df["x"].tolist()
    assert [bool(v) for v in got["ok"]] == df["ok"].tolist()


def test_multi_sheet_order_and_names(tmp_path):
    p = str(tmp_path / "m.xlsx")
    write_xlsx(
        {
            "Summary": pd.DataFrame({"Metric": ["rows"], "Value": [3]}),
            "Bad/Name[x]?": pd.DataFrame({"a": [1]}),
        },
        p,
    )
    got = read_xlsx(p)
    assert list(got) == ["Summary", "Bad_Name_x__"]
    assert got["Summary"]["Value"].tolist() == [3]


def test_nan_and_none_cells_round_trip_as_missing(tmp_path):
    df = pd.DataFrame({"a": [1.0, np.nan], "b": ["x", None]})
    p = str(tmp_path / "n.xlsx")
    write_xlsx(df, p)
    got = read_xlsx(p)["Sheet1"]
    assert got["a"].tolist()[0] == 1.0 and got["a"].isna().tolist() == [False, True]
    assert got["b"].tolist() == ["x", None]


def test_is_a_valid_zip_package(tmp_path):
    p = str(tmp_path / "z.xlsx")
    write_xlsx(pd.DataFrame({"a": [1]}), p)
    with zipfile.ZipFile(p) as z:
        names = set(z.namelist())
        assert "[Content_Types].xml" in names
        assert "xl/workbook.xml" in names
        assert "xl/worksheets/sheet1.xml" in names
        assert z.testzip() is None


def test_reads_shared_strings_and_cached_formulas(tmp_path):
    """Files written by Excel/openpyxl use sharedStrings and cached formula
    values — construct one by hand and read it."""
    p = str(tmp_path / "ext.xlsx")
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    sheet = (
        f'<worksheet xmlns="{ns}"><sheetData>'
        '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>'
        '<row r="2"><c r="A2" t="s"><v>2</v></c>'
        '<c r="B2"><f>1+1</f><v>2</v></c></row>'
        "</sheetData></worksheet>"
    )
    shared = (
        f'<sst xmlns="{ns}"><si><t>k</t></si><si><t>v</t></si>'
        "<si><t>hello</t></si></sst>"
    )
    import shutil

    base = str(tmp_path / "base.xlsx")
    write_xlsx(pd.DataFrame({"k": ["x"], "v": [1]}), base)
    shutil.copy(base, p)
    # splice the handcrafted sheet + sharedStrings into the package
    with zipfile.ZipFile(base) as zin, zipfile.ZipFile(p, "w") as zout:
        for item in zin.namelist():
            data = zin.read(item)
            if item == "xl/worksheets/sheet1.xml":
                data = sheet.encode()
            zout.writestr(item, data)
        zout.writestr("xl/sharedStrings.xml", shared)
    got = read_xlsx(p)["Sheet1"]
    assert list(got.columns) == ["k", "v"]
    assert got.iloc[0].tolist() == ["hello", 2]


def test_export_run_xlsx(tmp_path, ray_session):
    import ray.data as rd

    from bibexpy_ray import synth
    from bibexpy_ray.config import DedupConfig
    from bibexpy_ray.pipelines.dedup_images import dedup_images
    from bibexpy_ray.pipelines.export import export_run_xlsx

    tbl = synth.CorpusGen(42).rows(range(48))
    res = dedup_images(rd.from_arrow(tbl), DedupConfig())
    p = str(tmp_path / "run.xlsx")
    export_run_xlsx(res, p)
    got = read_xlsx(p)
    assert list(got) == ["Summary", "Clusters", "Match_Audit", "Borderline"]
    summ = dict(zip(got["Summary"]["Metric"], got["Summary"]["Value"]))
    assert int(summ["clusters"]) == int(res.metrics["clusters"])
    assert len(got["Clusters"]) == len(res.clusters)
    assert set(["cluster_id", "survivor_id", "cluster_size", "members"]) <= set(
        got["Clusters"].columns
    )


def test_overview_xlsx(tmp_path, ray_session):
    from bibexpy_ray.pipelines.export import overview_xlsx
    from bibexpy_ray.pipelines.relational import health_score

    p = str(tmp_path / "overview.xlsx")
    overview_xlsx("/root/testdata/sf0.001", p)
    got = read_xlsx(p)
    assert list(got) == ["Summary", "Fields"]
    hs = health_score("/root/testdata/sf0.001")
    summ = dict(zip(got["Summary"]["Metric"], got["Summary"]["Value"]))
    assert summ["Total records"] == int(hs["total_records"].iloc[0])
    assert summ["Health score (%)"] == int(hs["health_bp"].iloc[0]) / 100.0
    assert set(got["Fields"]["Field"]) == {"text", "lang", "source", "n_chars"}
