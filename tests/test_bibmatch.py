"""Conformance replay of the reference's smart-merge unit tests on
reference-shape records (FIXTURES.md §2/§3; reference
apps/api/tests/test_smart_merge.py semantics, reimplemented)."""

from bibexpy_ray.functions.bibmatch import (
    compute_match,
    doi_conflict,
    merge_pair_with_preferences,
    negative_rule_check,
)
from bibexpy_ray.functions.normalize import normalize_doi


def _rec(**kw):
    base = {
        "norm_key_a": None, "norm_key_b": None, "norm_key_c": None,
        "norm_text": "deep learning for cats", "norm_year": 2020,
        "norm_group": "SMITH", "norm_secondary": "journal of cats",
        "vl": "12", "bp": "101", "pg": "",
    }
    base.update(kw)
    return base


def test_differing_dois_never_match_nor_borderline():
    a = _rec(norm_key_a="10.1/aaa")
    b = _rec(norm_key_a="10.1/bbb")
    assert negative_rule_check(a, b)
    assert compute_match(a, b) is None  # despite identical title/year/surname


def test_control_matches_stage3_without_dois():
    a, b = _rec(), _rec()
    m = compute_match(a, b)
    assert m and m["stage"] == 3 and m["confidence"] == 0.95


def test_equal_doi_stage1_conf_1():
    a = _rec(norm_key_a="10.1/x", norm_text="totally different words here")
    b = _rec(norm_key_a="10.1/x", norm_text="unrelated other title entirely")
    m = compute_match(a, b)
    assert m == {"stage": 1, "confidence": 1.0, "similarity": None}


def test_one_sided_doi_falls_through_to_title():
    a = _rec(norm_key_a="10.1/x")
    b = _rec()  # no DOI on this side
    m = compute_match(a, b)
    assert m and m["stage"] == 3


def test_normalization_equivalent_dois_not_conflicts():
    a = _rec(norm_key_a=normalize_doi("https://doi.org/10.1/X"))
    b = _rec(norm_key_a=normalize_doi("10.1/x"))
    assert not doi_conflict(a, b)
    m = compute_match(a, b)
    assert m and m["stage"] == 1


def test_doi_conflict_blocks_stage4():
    a = _rec(norm_key_a="10.1/aaa", norm_text="title one entirely", vl="7", bp="55")
    b = _rec(norm_key_a="10.1/bbb", norm_text="other title here now", vl="7", bp="55")
    assert compute_match(a, b) is None  # journal+vol+page agree but DOI kills it


def test_stage4_partial_metadata_match():
    a = _rec(norm_text="completely different one", vl="7", bp="55")
    b = _rec(norm_text="nothing alike at all xyz", vl="7", bp="55")
    m = compute_match(a, b)
    assert m and m["stage"] == 4 and m["confidence"] == 0.90


def test_borderline_band_queued_with_linear_confidence():
    a = _rec(norm_text="statistical methods in epidemiology research")
    b = _rec(norm_text="statistical methods in epidemiology resurvey")
    m = compute_match(a, b)
    if m is not None and m["stage"] == 5:
        assert 0.70 <= m["confidence"] <= 0.85
    else:  # if the edit lands ≥ .92 it must be stage 3 — either way never None-band
        assert m is None or m["stage"] == 3


def test_year_tolerance_pm1():
    a, b = _rec(norm_year=2020), _rec(norm_year=2021)
    assert compute_match(a, b)["stage"] == 3
    c = _rec(norm_year=2022)
    m = compute_match(a, c)
    assert m is None or m["stage"] != 3


def test_titles_required_for_text_stages():
    a, b = _rec(norm_text=""), _rec()
    assert compute_match(a, b) is None


# ---- survivor merge preference table (FIXTURES.md §3) ----------------------

def test_merge_preferences_table():
    wos = {
        "TC": "10", "CR": "ref1; ref2", "NR": "2", "AB": "wos abstract",
        "AU": "Smith J", "DE": "cats; Dogs", "WC": "", "SC": "Zoology",
        "TI": "The Title", "SO": "J Cats",
    }
    scp = {
        "TC": "12", "CR": "", "NR": "", "AB": "scopus abstract longer",
        "AU": "Smith, John", "DE": "dogs; birds", "WC": "Veterinary",
        "SC": "", "TI": "The Title", "SO": "Journal of Cats",
    }
    merged, conflicts = merge_pair_with_preferences(wos, scp)
    assert merged["TC"] == "10"            # WoS wins citations
    assert merged["CR"] == "ref1; ref2"
    assert merged["AB"] == "scopus abstract longer"   # Scopus wins abstract
    assert merged["AU"] == "Smith, John"
    assert merged["DE"] == "cats; Dogs; birds"        # union, case-insens dedup
    assert merged["WC"] == "Veterinary"    # cross-fill WoS-first, WoS blank
    assert merged["SC"] == "Zoology"
    assert merged["SO"] == "J Cats"        # default WoS-first
    fields = {c["field"] for c in conflicts}
    assert "TC" in fields and "SO" in fields
    assert "TI" not in fields              # equal values are not conflicts


def test_merge_blank_handling():
    merged, conflicts = merge_pair_with_preferences({"TC": ""}, {"TC": "5"})
    assert merged["TC"] == "5" and not conflicts
