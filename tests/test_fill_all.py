"""Fill-all enrichment orchestration (enricher.py:69-321 semantics):
mirror pass, DOI reverse-lookup pass, multi-source API pass, address
completion, fill-rate report — composed as chained Dataset stages."""

import pandas as pd
import pytest
import ray.data as rd

from bibexpy_ray.pipelines.enricher import (
    CompleteAddressesStage,
    fill_all,
    fill_rates,
    mirror_fill,
    mirror_fill_documents,
)

SF_DIR = "/root/testdata/sf0.001"


def test_mirror_fill_semantics(ray_session):
    ds = rd.from_pandas(
        pd.DataFrame(
            {
                "WC": ["Physics", "", None, "Chem"],
                "SC": ["", "Biology", None, "Chemistry"],
            }
        )
    )
    out = mirror_fill(ds, "WC", "SC").to_pandas()
    assert list(out["SC"]) == ["Physics", "Biology", None, "Chemistry"]
    assert list(out["WC"]) == ["Physics", "Biology", None, "Chem"]  # both-filled untouched


def test_mirror_fill_documents_query(ray_session):
    out = mirror_fill_documents(SF_DIR)
    assert list(out.columns) == ["doc_id", "lang", "source"]
    assert len(out) > 0


def _affil_factory():
    def affs(doi):
        if doi == "10.1/one":
            # matched by normalized institution name
            return [("Univ Alpha", "Germany"), ("Univ Beta", "France")]
        if doi == "10.1/single":
            # no name match, but a single distinct country -> fallback
            return [("Other Inst", "Japan"), ("Another Inst", "Japan")]
        return []

    return affs


def test_complete_addresses_stage():
    stage = CompleteAddressesStage(_affil_factory)
    batch = pd.DataFrame(
        {
            "DI": ["10.1/one", "10.1/single", "10.1/none", None],
            "C1": [
                "Dept Phys, Univ Alpha; Lab X, City Y, England",
                "Inst Q, Somewhere",
                "Inst R, Nowhere",
                "Inst S, Anywhere",
            ],
        }
    )
    out = stage(batch)
    # name-matched country appended; the already-countried address untouched
    assert "Univ Alpha, Germany" in out.at[0, "C1"]
    assert "England" in out.at[0, "C1"] and "England, " not in out.at[0, "C1"]
    # single-country fallback
    assert out.at[1, "C1"].endswith("Japan")
    # no affiliations / no doi -> untouched
    assert out.at[2, "C1"] == "Inst R, Nowhere"
    assert out.at[3, "C1"] == "Inst S, Anywhere"


def test_fill_all_composition(tmp_path, ray_session):
    from bibexpy_ray.sources.enrich import stub_candidate_factory, stub_sources_factory

    df = pd.DataFrame(
        {
            "DI": [None, "10.9/known", None],
            "TI": ["alpha beta", "gamma delta", None],
            "AU": ["ZHANG C", "DOE J", None],
            "PY": ["2020", "2021", None],
            "WC": ["Physics", "", ""],
            "SC": ["", "Biology", ""],
            "SO": [None, None, None],
        }
    )
    ds = rd.from_pandas(df)
    out, report = fill_all(
        ds,
        sources_factory=stub_sources_factory,
        candidate_factory=stub_candidate_factory,
        mirror=("WC", "SC"),
        fillable=("TI", "PY", "SO", "UR"),
        rate_fields=["DI", "SO", "WC", "SC"],
        cache_path=str(tmp_path / "cache.sqlite"),
        concurrency=2,
    )
    got = out.to_pandas().sort_values("TI", na_position="last").reset_index(drop=True)
    # mirror ran (WC<->SC), doi pass filled row 0's DOI from its title,
    # api pass filled SO for every row that has a DOI
    assert got.loc[0, "WC"] == "Physics" and got.loc[0, "SC"] == "Physics"
    assert got.loc[0, "DI"] == "10.9/alpha"  # stub candidate: first token
    assert str(got.loc[0, "SO"]).startswith("journal-")
    assert got.loc[1, "DI"] == "10.9/known"
    assert report["fill_rate_after"] > report["fill_rate_before"]
    assert report["per_field_fill"]["SO"]["after"] > report["per_field_fill"]["SO"]["before"]
    assert report["total"] == 3


def test_fill_rates(ray_session):
    ds = rd.from_pandas(pd.DataFrame({"a": ["x", "", None, "y"], "b": [None, None, None, None]}))
    r = fill_rates(ds, ["a", "b", "missing_col"])
    assert r == {"a": 0.5, "b": 0.0, "missing_col": 0.0}
