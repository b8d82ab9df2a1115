"""BibTeX / RIS sinks + Scopus CSV source: round-trip and conformance tests
(reference: bibtex_writer.py:53-110, ris_writer.py:33-80, scp2xlsx.py:13-150
semantics)."""

import os

import pandas as pd
import pytest
import ray.data as rd

from bibexpy_ray.sources.formats import (
    SCOPUS_HEADER_MAP,
    format_bibtex,
    format_ris,
    read_scopus_csv,
    write_bibtex,
    write_ris,
)

RECORDS = pd.DataFrame(
    [
        {
            "AU": "Smith, J; Doe, A", "TI": "Deep & Learned {Things}",
            "SO": "Journal of Tests", "PY": "2020", "VL": "7", "IS": "2",
            "PG": "100-110", "DI": "10.1/xyz", "URL": "http://x", "AB": "An abstract",
            "DE": "kw one; kw two", "PU": "TestPub", "DT": "Article", "SN": "1234-5678",
            "JI": "J. Tests",
        },
        {
            "AU": "Roe, B", "TI": "Second paper", "SO": "Conf Proc", "PY": "2021",
            "VL": "", "IS": "", "PG": "", "DI": "", "URL": "", "AB": "",
            "DE": "", "PU": "", "DT": "Conference Paper", "SN": "", "JI": "",
        },
    ]
)


def test_bibtex_format_escaping_and_keys():
    import re as _re

    text = format_bibtex(RECORDS)
    # readable base + deterministic 6-hex identity suffix (shard-independent)
    assert _re.search(r"@article\{Smith2020DeepLearnedT-[0-9a-f]{6},", text)
    assert _re.search(r"@inproceedings\{Roe2021Secondpaper-[0-9a-f]{6},", text)
    assert "author = {Smith, J and Doe, A}" in text
    assert "keywords = {kw one, kw two}" in text
    # LaTeX escaping of & and {}
    assert r"Deep \& Learned \{Things\}" in text
    # a literal backslash must not be mangled by the brace pass
    from bibexpy_ray.sources.formats import _latex_escape

    assert _latex_escape("C:\\data") == "C:\\textbackslash{}data"
    assert _latex_escape("a{b}~c") == "a\\{b\\}\\textasciitilde{}c"
    # empty fields omitted
    assert "volume = {}" not in text


def test_bibtex_key_uniqueness():
    import re as _re

    # identical records (identity-hash tie) fall back to ordinals in-batch
    dup = pd.concat([RECORDS.iloc[[0]]] * 3, ignore_index=True)
    text = format_bibtex(dup)
    assert _re.search(r"@article\{Smith2020DeepLearnedT-[0-9a-f]{6},", text)
    assert _re.search(r"@article\{Smith2020DeepLearnedT-[0-9a-f]{6}_1,", text)
    assert _re.search(r"@article\{Smith2020DeepLearnedT-[0-9a-f]{6}_2,", text)
    # DIFFERENT records sharing the slug diverge by hash alone, no ordinals:
    # cross-shard safety without shared state
    import pandas as _pd

    a = RECORDS.iloc[[0]].copy()
    b = RECORDS.iloc[[0]].copy()
    b["DI"] = "10.9/other"
    ka = _re.search(r"@article\{(\S+),", format_bibtex(a)).group(1)
    kb = _re.search(r"@article\{(\S+),", format_bibtex(b)).group(1)
    assert ka != kb and "_" not in ka and "_" not in kb


def test_ris_format_tags():
    text = format_ris(RECORDS)
    entries = [e for e in text.split("ER  - ") if e.strip()]
    assert len(entries) == 2
    first = entries[0]
    assert "TY  - JOUR" in first
    assert "AU  - Smith, J" in first and "AU  - Doe, A" in first
    assert "KW  - kw one" in first and "KW  - kw two" in first
    assert "DO  - 10.1/xyz" in first
    assert "TY  - CPAPER" in entries[1]
    assert "VL  -" not in entries[1]  # blank fields omitted


def test_sharded_sinks_write_files(tmp_path):
    ds = rd.from_pandas(RECORDS)
    bib_dir = write_bibtex(ds, str(tmp_path / "bib"))
    ris_dir = write_ris(ds, str(tmp_path / "ris"))
    bibs = [f for f in os.listdir(bib_dir) if f.endswith(".bib")]
    riss = [f for f in os.listdir(ris_dir) if f.endswith(".ris")]
    assert bibs and riss
    content = open(os.path.join(bib_dir, bibs[0])).read()
    assert "@article{" in content


def test_export_filtered_composes_spec_and_sink(tmp_path):
    from bibexpy_ray.sources.formats import export_filtered

    ds = rd.from_pandas(RECORDS)
    out = export_filtered(
        ds, {"contains_any": [{"col": "DT", "terms": ["Article"]}]},
        str(tmp_path / "filt"), fmt="ris",
    )
    text = "".join(
        open(os.path.join(out, f)).read()
        for f in os.listdir(out) if f.endswith(".ris")
    )
    assert "Smith, J" in text and "Roe, B" not in text
    with pytest.raises(ValueError):
        export_filtered(ds, None, str(tmp_path / "bad"), fmt="xlsx")


def test_scopus_csv_reader(tmp_path):
    csv = tmp_path / "scopus.csv"
    pd.DataFrame(
        [
            {
                "Authors": "Smith J., Doe A.", "Title": "A test title",
                "Source title": "Journal of Tests", "Year": "2020",
                "DOI": "10.1/AbC", "EID": "2-s2.0-1", "Cited by": "5",
                "Abbreviated Source Title": "J. Tests",
                "Document Type": "Article", "Link": "http://scopus/x",
            },
            {
                "Authors": "Roe B.", "Title": "Another", "Source title": "Conf",
                "Year": "2021", "DOI": "", "EID": "2-s2.0-2", "Cited by": "0",
                "Abbreviated Source Title": "Conf.", "Document Type": "Review",
                "Link": "",
            },
        ]
    ).to_csv(csv, index=False)
    # block order from a parallel read is not guaranteed — sort by year
    out = (
        read_scopus_csv(str(csv))
        .to_pandas()
        .sort_values("PY")
        .reset_index(drop=True)
    )
    # header map applied
    for tag in ("AU", "TI", "SO", "PY", "DI", "UT", "TC", "JI", "DT", "URL"):
        assert tag in out.columns, tag
    # AU cleanup: dots stripped, commas -> semicolons
    assert out["AU"].iloc[0] == "SMITH J; DOE A"
    # J9 = JI without dots, uppercased
    assert out["J9"].iloc[0] == "J TESTS"
    # uppercase everywhere EXCEPT DI/URL preserved
    assert out["TI"].iloc[0] == "A TEST TITLE"
    assert out["DI"].iloc[0] == "10.1/AbC"
    assert out["URL"].iloc[0] == "http://scopus/x"
    assert "C1" in out.columns


def test_header_map_complete():
    # all 31 reference entries present
    assert len(SCOPUS_HEADER_MAP) == 31


def test_convert_any_to_any(ray_session, tmp_path):
    from bibexpy_ray.sources.formats import convert
    from bibexpy_ray.sources.tagged_text import write_tagged_text

    # seed a tagged-text dir from RECORDS
    src = str(tmp_path / "tagged")
    write_tagged_text(rd.from_pandas(RECORDS), src)

    # tagged -> parquet: table round-trips by content
    pq_dir = str(tmp_path / "pq")
    convert(src, pq_dir, "tagged", "parquet")
    back = rd.read_parquet(pq_dir).to_pandas()
    assert len(back) == len(RECORDS)
    assert set(back["TI"]) == set(RECORDS["TI"])

    # parquet -> bibtex: sharded .bib files appear with both entries
    bib_dir = str(tmp_path / "bib")
    convert(pq_dir, bib_dir, "parquet", "bibtex")
    text = "".join(
        open(os.path.join(bib_dir, f)).read()
        for f in os.listdir(bib_dir) if f.endswith(".bib")
    )
    assert "@article{" in text and "Second paper" in text

    # parquet -> tsv: delimiter honored
    tsv_dir = str(tmp_path / "tsv")
    convert(pq_dir, tsv_dir, "parquet", "tsv")
    tsv_files = [f for f in os.listdir(tsv_dir)]
    assert tsv_files
    line = open(os.path.join(tsv_dir, tsv_files[0])).readline()
    assert "\t" in line

    # unknown formats raise
    with pytest.raises(ValueError):
        convert(src, str(tmp_path / "x"), "tagged", "nope")
    with pytest.raises(ValueError):
        convert(src, str(tmp_path / "x"), "nope", "parquet")
