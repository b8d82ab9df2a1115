"""Reference-format WoS writer fidelity (xlsx2vos.py:4-185 semantics):
[author] address C1 pairing, AU/AF/CR continuation blocks, fixed tag order,
FN/VR/EF framing — verified line-exact and by isi2df-shaped round-trip."""

import pandas as pd

from bibexpy_ray.sources.tagged_text import (
    format_wos_records,
    parse_wos_records,
    wos_c1_lines,
    write_wos_text,
)


def _rec(**kw):
    base = {
        "PT": "J",
        "AU": "ZHANG C; GUO R; LI W",
        "AF": "Zhang, Chen; Guo, Rui; Li, Wei",
        "TI": "A Study",
        "SO": "J TEST",
        "C1": "Univ A, Dept X, City A; Univ B, City B",
        "CR": "Smith J, 2001, J FOO; Doe A, 2002, J BAR",
        "PY": "2020",
    }
    base.update(kw)
    return base


def test_c1_pairing_extra_authors_reuse_last_address():
    lines = wos_c1_lines(
        "Zhang, Chen; Guo, Rui; Li, Wei", "Univ A, Dept X, City A; Univ B, City B"
    )
    assert lines == [
        "[Zhang, Chen] Univ A, Dept X, City A",
        "[Guo, Rui] Univ B, City B",
        "[Li, Wei] Univ B, City B",  # extra author pairs with the LAST address
    ]


def test_c1_pairing_surplus_addresses_dropped():
    lines = wos_c1_lines("Zhang, Chen", "Addr 1; Addr 2; Addr 3")
    assert lines == ["[Zhang, Chen] Addr 1"]


def test_format_layout_line_exact():
    text = format_wos_records(pd.DataFrame([_rec()]))
    assert text.startswith("FN Clarivate Analytics Web of Science\nVR 1.0\n\n")
    assert text.endswith("ER\n\nEF\n")
    lines = text.splitlines()
    # continuation blocks: first item on the tag line, rest 3-space indented
    i = lines.index("AU ZHANG C")
    assert lines[i + 1] == "   GUO R" and lines[i + 2] == "   LI W"
    j = lines.index("AF Zhang, Chen")
    assert lines[j + 1] == "   Guo, Rui" and lines[j + 2] == "   Li, Wei"
    k = lines.index("C1 [Zhang, Chen] Univ A, Dept X, City A")
    assert lines[k + 1] == "   [Guo, Rui] Univ B, City B"
    assert lines[k + 2] == "   [Li, Wei] Univ B, City B"
    c = lines.index("CR Smith J, 2001, J FOO")
    assert lines[c + 1] == "   Doe A, 2002, J BAR"
    # empty plain tags still write "TAG " (reference writes unconditionally)
    assert "DT " in lines and "UT " in lines


def test_pt_defaults_to_j_and_blank_blocks():
    text = format_wos_records(pd.DataFrame([{"TI": "x"}]))
    lines = text.splitlines()
    assert "PT J" in lines
    assert "AU " in lines and "AF " in lines and "C1 " in lines and "CR " in lines


def test_column_map_quirks():
    # EI reads the ISSN-named column, AR reads "Art. No." (reference map)
    df = pd.DataFrame([{"ISSN": "1234-5678", "Art. No.": "e99", "TI": "t"}])
    lines = format_wos_records(df).splitlines()
    assert "EI 1234-5678" in lines
    assert "AR e99" in lines


def test_roundtrip_isi2df_shape():
    recs = [
        _rec(),
        _rec(AU="DOE J", AF="Doe, Jane", C1="Univ C, City C", TI="Second"),
    ]
    parsed = parse_wos_records(format_wos_records(pd.DataFrame(recs)))
    assert len(parsed) == 2
    p = parsed[0]
    assert p["AU"] == "ZHANG C;GUO R;LI W"  # comma-tag folding joins with ';'
    assert p["CR"] == "Smith J, 2001, J FOO;Doe A, 2002, J BAR"
    # C1raw keeps the pairing; C1 strips the [author] brackets (isi2df rule)
    assert p["C1raw"].startswith("[Zhang, Chen] Univ A, Dept X, City A")
    assert "[Li, Wei] Univ B, City B" in p["C1raw"]
    assert "[" not in p["C1"]
    assert parsed[1]["TI"] == "Second"


def test_write_wos_text_sharded(tmp_path, ray_session):
    import ray.data as rd

    ds = rd.from_pandas(pd.DataFrame([_rec(TI=f"t{i}") for i in range(10)]))
    out = write_wos_text(ds, str(tmp_path / "wos"))
    import glob

    files = glob.glob(out + "/wos-*.txt")
    assert files
    all_recs = []
    for f in sorted(files):
        body = open(f).read()
        assert body.startswith("FN Clarivate")  # each shard self-contained
        assert body.endswith("EF\n")
        all_recs.extend(parse_wos_records(body))
    assert len(all_recs) == 10
    assert {r["TI"] for r in all_recs} == {f"t{i}" for i in range(10)}
