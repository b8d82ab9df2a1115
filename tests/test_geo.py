"""C1/geo family tests: country dictionaries, address parsing, structure-
preserving rewrites, block builders, and the propose → apply → re-propose
idempotence loop (reference: c1_utils.py:16-418, blocking.py:429-582)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from bibexpy_ray.functions import geo

SF_DIR = "/root/testdata/sf0.001"


# ── dictionaries ──────────────────────────────────────────────────────────


def test_canonical_country_variants():
    assert geo.canonical_country("USA") == "United States"
    assert geo.canonical_country("u.s.a.") == "United States"
    assert geo.canonical_country("Peoples R China") == "China"
    assert geo.canonical_country("ENGLAND") == "United Kingdom"
    assert geo.canonical_country("Türkiye") == "Turkey"
    assert geo.canonical_country("France") == "France"  # already canonical
    assert geo.canonical_country("Atlantis") is None
    assert geo.canonical_country("") is None


def test_country_from_code():
    assert geo.country_from_code("us") == "United States"
    assert geo.country_from_code("GB") == "United Kingdom"
    assert geo.country_from_code("zz") is None
    # code names agree with variant-map names (consistency requirement)
    for code, name in geo.COUNTRY_CODE_TO_NAME.items():
        if name.lower() in {v.lower() for v in geo.CANONICAL_COUNTRIES}:
            assert geo.canonical_country(name) == name, (code, name)


# ── splitting / parsing ───────────────────────────────────────────────────


def test_split_preserves_bracketed_semicolons():
    c1 = "[Smith, J; Doe, A] Univ X, City, USA; [Roe, B] Inst Y, Berlin, Germany"
    out = geo.split_c1_addresses(c1)
    assert out == ["Univ X, City, USA", "Inst Y, Berlin, Germany"]
    assert geo.split_c1_addresses("") == []
    assert geo.split_c1_addresses("NaN") == []


def test_parse_c1_address():
    info = geo.parse_c1_address("Dept Phys, Univ Oxford, Oxford OX1, England")
    assert info["country"] == "United Kingdom"
    assert info["institution"] == "Univ Oxford"
    # subunit not preferred over the parent
    info2 = geo.parse_c1_address("School of Med, Harvard Univ, Boston, MA 02115, USA")
    assert info2["institution"] == "Harvard Univ"
    # no org keyword → no guess
    info3 = geo.parse_c1_address("Research Triangle Park, NC 27709, USA")
    assert info3["institution"] is None
    assert info3["country"] == "United States"


def test_rollup_c1_to_parent():
    c1 = "[A] Dept Phys, Univ X, City 123, USA; [B] Dept Chem, Univ X, City 123, USA"
    rolled = geo.rollup_c1_to_parent(c1)
    assert rolled == "Univ X, United States"  # dedup + structure collapse


# ── rewrites ──────────────────────────────────────────────────────────────


def test_replace_country_preserves_structure():
    c1 = "[Smith, J; Doe, A] Univ X, City, USA; [Roe, B] Inst Y, Berlin, Germany"
    mapping = {"usa": "United States", "germany": "Germany"}
    out = geo.replace_country_in_c1(c1, mapping)
    assert "[Smith, J; Doe, A] Univ X, City, United States" in out
    assert "Inst Y, Berlin, Germany" in out  # already canonical — untouched
    # idempotent
    assert geo.replace_country_in_c1(out, mapping) == out


def test_append_country_only_when_missing():
    c1 = "[A] Univ X, Lausanne"
    out = geo.append_country_to_c1(c1, {"lausanne": "Switzerland"})
    assert out == "[A] Univ X, Lausanne, Switzerland"
    # never appends when the last token is already a country
    c2 = "[A] Univ X, France"
    assert geo.append_country_to_c1(c2, {"france": "France"}) == c2


def test_replace_org_exact_component_only():
    c1 = "[A] Dept Bio, Univ of Somewhere Med Ctr, City, USA"
    addr = "Dept Bio, Univ of Somewhere Med Ctr, City, USA"
    out = geo.replace_org_in_c1(c1, {addr: "Univ of Somewhere"})
    assert out == "[A] Univ of Somewhere"
    # non-matching addresses untouched
    assert geo.replace_org_in_c1("[B] Other Inst, UK", {addr: "X"}) == "[B] Other Inst, UK"


# ── blocks + apply loop ───────────────────────────────────────────────────


def _c1_table():
    return pd.DataFrame(
        {
            "c_custkey": [1, 2, 3, 4, 5],
            "c1": [
                "[A] Univ Alpha, City, USA",
                "[B] Univ Alpha, City, U.S.A.",
                "[C] Inst Beta, Berlin, Germany",
                "[D] Univ Alpha Dept Phys, City, United States",
                "[E] Somewhere, Narnia",
            ],
        }
    )


def test_country_blocks_tiers(entryray):
    from bibexpy_ray.pipelines.geo import country_blocks

    blocks = country_blocks(rd.from_pandas(_c1_table()))
    tier1 = blocks[blocks["tier"] == 1]
    # USA + U.S.A. variants → one United States proposal; Germany is already
    # canonical (no proposal)
    assert any(
        b == "United States" for b in tier1["canonical_name"]
    )
    assert not any(b == "Germany" for b in tier1["canonical_name"])
    # unknown token (Narnia) lands in tier 2
    tier2 = blocks[blocks["tier"] == 2]
    assert any("Narnia" in v for v in tier2["variants"])


def test_propose_apply_repropose_nothing(entryray):
    """The apply-rewrite loop converges: after applying tier-1 country
    proposals, a re-scan proposes nothing at tier 1 (pipeline.py:721-975
    apply_clusters semantics)."""
    from bibexpy_ray.pipelines.geo import country_blocks
    from bibexpy_ray.pipelines.rewrite import apply_rewrite, country_mapping_from_blocks

    ds = rd.from_pandas(_c1_table())
    blocks = country_blocks(ds)
    mapping = country_mapping_from_blocks(blocks)
    assert mapping  # USA/U.S.A. → United States at least
    rewritten, metrics = apply_rewrite(ds, "c1", mapping, kind="country")
    assert metrics["changed_rows"] >= 2
    assert metrics["total_rows"] == 5
    blocks2 = country_blocks(rewritten)
    assert not len(blocks2[blocks2["tier"] == 1]), blocks2
    # second apply changes nothing (idempotent)
    _, metrics2 = apply_rewrite(rewritten, "c1", mapping, kind="country")
    assert metrics2["changed_rows"] == 0


def test_org_rollup_blocks(entryray):
    from bibexpy_ray.pipelines.geo import org_rollup_blocks

    df = pd.DataFrame(
        {
            "c_custkey": [1, 2, 3],
            "c1": [
                "[A] Dept Phys, Univ Gamma, City, USA",
                "[B] Univ Gamma Sch Med, City, USA",
                "[C] Wholly Different Inst, Town, France",
            ],
        }
    )
    blocks = org_rollup_blocks(rd.from_pandas(df))
    # the two Univ Gamma address variants roll up into one proposal
    gamma = blocks[blocks["canonical_name"].str.contains("Gamma")]
    assert len(gamma) >= 1
    assert gamma["n_records"].iloc[0] == 2


def test_snapshot_column(entryray):
    from bibexpy_ray.pipelines.rewrite import apply_rewrite

    ds = rd.from_pandas(_c1_table())
    out, _ = apply_rewrite(
        ds, "c1", {"usa": "United States"}, kind="country", snapshot_col="c1_orig"
    )
    pdf = out.to_pandas()
    assert "c1_orig" in pdf.columns
    assert (pdf["c1_orig"] == _c1_table()["c1"]).all()


@pytest.fixture(scope="module")
def entryray():
    return True  # ray session provided by conftest


def test_country_blocks_skew_distributed(entryray):
    """Skewed corpus (few distinct tokens, many rows, rows repeated across
    batches): the distributed reduce must still count DISTINCT record ids per
    group, and nothing proportional to the corpus reaches the driver (the
    reduce emits one row per canon / unknown token)."""
    from bibexpy_ray.pipelines.geo import country_blocks

    n = 20_000
    keys = np.arange(n, dtype=np.int64) % 6_000  # rids repeat across batches
    toks = ["USA", "U.S.A.", "United States", "Narnia", "Narnja"]
    df = pd.DataFrame(
        {
            "c_custkey": keys,
            "c1": [f"[X] Univ Alpha, City, {toks[i % 5]}" for i in range(n)],
        }
    )
    blocks = country_blocks(rd.from_pandas(df).repartition(8))
    t1 = blocks[blocks["tier"] == 1]
    assert list(t1["canonical_name"]) == ["United States"]
    # every rid mentions a US variant at least once in this layout
    us_rids = {int(k) for k, i in zip(keys, range(n)) if i % 5 in (0, 1, 2)}
    assert int(t1["n_records"].iloc[0]) == len(us_rids)
    t2 = blocks[blocks["tier"] == 2]
    assert len(t2) == 1  # Narnia + Narnja cluster together (JW ≥ 0.85)
    narnia_rids = {int(k) for k, i in zip(keys, range(n)) if i % 5 in (3, 4)}
    assert int(t2["n_records"].iloc[0]) == len(narnia_rids)
    assert "Narnia" in t2["variants"].iloc[0] and "Narnja" in t2["variants"].iloc[0]


def _random_c1_cells(n: int, seed: int) -> list[str]:
    """Randomized C1 cells covering the parser's edge shapes: author
    brackets (with inner ';'), multiple addresses, org/subunit/geo
    segments, country variants, unknown tokens, empties, stray commas."""
    import random

    rng = random.Random(seed)
    insts = ["Univ Alpha", "Natl Inst 7", "Dept Phys", "Tech Ctr", "Museum X",
             "School of Arts", "Acme Corp", "Hosp St Jude", "Lab2 Beta"]
    places = ["City 4", "TX 77005", "Springfield", "CA", "Region 9"]
    countries = ["USA", "U.S.A.", "Peoples R China", "Narnia", "Germany",
                 "turkiye", "England", ""]
    cells = []
    for _ in range(n):
        n_addr = rng.randint(0, 3)
        addrs = []
        for _a in range(n_addr):
            segs = rng.sample(insts, rng.randint(0, 3)) + rng.sample(
                places, rng.randint(0, 2)
            )
            if rng.random() < 0.8:
                segs.append(rng.choice(countries))
            addr = ", ".join(segs)
            if rng.random() < 0.5:
                addr = f"[Smith, J; Doe, A] {addr}"
            if rng.random() < 0.1:
                addr = f"  {addr} , "
            addrs.append(addr)
        cell = "; ".join(addrs)
        if rng.random() < 0.05:
            cell += ";"
        if rng.random() < 0.05:
            cell = ""
        cells.append(cell)
    return cells


def test_vectorized_c1_paths_match_scalar():
    """The pandas-vectorized C1 kernels (explode/country/institution/
    rewrite-changed) must be value-identical to the scalar reference
    kernels on randomized cells including bracket/empty/trailing shapes."""
    from bibexpy_ray.functions import geo as fgeo
    from bibexpy_ray.pipelines.geo import (
        _canonical_country_vec,
        _explode_addresses,
        _last_comma_token,
        institutions_vec,
        rewrite_changed_vec,
    )

    cells = _random_c1_cells(600, seed=9)
    s = pd.Series(cells)

    # address explosion
    want_addrs = [(i, a) for i, v in enumerate(cells)
                  for a in fgeo.split_c1_addresses(v)]
    got = _explode_addresses(s)
    got_pairs = sorted(zip(got.index.tolist(), got.tolist()))
    assert got_pairs == sorted(want_addrs)

    # country tokens + canonicalization
    addrs = pd.Series([a for _, a in want_addrs])
    got_canon = _canonical_country_vec(_last_comma_token(addrs))
    for k, (_, a) in enumerate(want_addrs):
        parts = [p.strip() for p in a.split(",") if p.strip()]
        want = fgeo.canonical_country(parts[-1]) if parts else None
        gotv = got_canon.iloc[k]
        assert (want is None and pd.isna(gotv)) or want == gotv, a

    # institution selection
    got_inst = institutions_vec(addrs)
    for k, (_, a) in enumerate(want_addrs):
        want = fgeo.parse_c1_address(a)["institution"]
        assert got_inst.iloc[k] == want or (want is None and got_inst.iloc[k] is None), a

    # rewrite-changed flags
    mapping = {
        **{k: v for k, v in fgeo.COUNTRY_VARIANTS.items()},
        **{c.lower(): c for c in fgeo.CANONICAL_COUNTRIES},
    }
    want_flags = np.array(
        [fgeo.replace_country_in_c1(v, mapping) != v for v in cells]
    )
    got_flags = rewrite_changed_vec(s, mapping)
    assert (got_flags == want_flags).all()
