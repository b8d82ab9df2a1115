"""Greedy 1:1 assignment tests — the reference's two-source Smart Merge
semantics (smart_merger.py:630-711): confidence-descending first-come-wins,
borderline queues without consuming, negative rule excludes entirely, and the
greedy-vs-cluster difference (a 3-chain must 1:1-match, not transitively
merge)."""

import numpy as np
import pandas as pd
import pytest

from bibexpy_ray.pipelines.assign import (
    greedy_assign_block,
    smart_match_pairs,
    two_source_records,
)

SF_DIR = "/root/testdata/sf0.001"


def cands(rows):
    return pd.DataFrame(
        rows, columns=["id_a", "id_b", "stage", "confidence", "similarity"]
    )


def test_greedy_first_come_wins_both_sides():
    # w1 matches s1 at 1.0; the weaker (w1,s2) and (w2,s1) pairs must lose;
    # w2 then takes s2.
    out = greedy_assign_block(
        cands(
            [
                ("w1", "s1", 1, 1.00, np.nan),
                ("w1", "s2", 3, 0.95, 0.93),
                ("w2", "s1", 3, 0.95, 0.94),
                ("w2", "s2", 4, 0.90, 0.91),
            ]
        )
    )
    matches = out[out["decision"] == "match"]
    assert set(zip(matches["id_a"], matches["id_b"])) == {("w1", "s1"), ("w2", "s2")}


def test_three_chain_matches_one_to_one_not_merged():
    # A~B (0.95) and B~C (0.95): union-find would merge {A,B,C}; greedy must
    # assign B exactly once. Deterministic tie-break: (id_a, id_b) ascending.
    out = greedy_assign_block(
        cands(
            [
                ("wA", "sB", 3, 0.95, 0.93),
                ("wC", "sB", 3, 0.95, 0.93),
            ]
        )
    )
    matches = out[out["decision"] == "match"]
    assert len(matches) == 1
    assert (matches["id_a"].iloc[0], matches["id_b"].iloc[0]) == ("wA", "sB")


def test_borderline_queues_without_consuming():
    # a borderline pair does not consume sides: a later (lower-conf is
    # impossible; equal-conf) auto candidate for the same side still matches —
    # and an auto match BEFORE the borderline suppresses the borderline row.
    out = greedy_assign_block(
        cands(
            [
                ("w1", "s1", 5, 0.80, 0.90),
                ("w2", "s2", 5, 0.75, 0.85),
            ]
        )
    )
    assert list(out["decision"]) == ["borderline", "borderline"]

    out2 = greedy_assign_block(
        cands(
            [
                ("w1", "s1", 1, 1.00, np.nan),
                ("w1", "s2", 5, 0.80, 0.90),  # w1 already matched -> skipped
                ("w3", "s3", 5, 0.80, 0.90),
            ]
        )
    )
    assert set(zip(out2["id_a"], out2["decision"])) == {
        ("w1", "match"),
        ("w3", "borderline"),
    }


def test_confidence_order_beats_input_order():
    # input lists the weak pair first; the strong pair must still win
    out = greedy_assign_block(
        cands(
            [
                ("w1", "s2", 4, 0.90, 0.91),
                ("w1", "s1", 1, 1.00, np.nan),
            ]
        )
    )
    matches = out[out["decision"] == "match"]
    assert set(zip(matches["id_a"], matches["id_b"])) == {("w1", "s1")}


def test_smart_match_pairs_end_to_end(entrymod):
    out = smart_match_pairs(SF_DIR)
    assert len(out) > 0
    matches = out[out["decision"] == "match"]
    # 1:1: no wos or scopus record matched twice
    assert matches["id_a"].is_unique
    assert matches["id_b"].is_unique
    # the synthetic construction: i%9==0 twins share an authority (stage 1),
    # i%9==3 twins conflict (never matched, never borderline vs each other)
    recs = two_source_records(SF_DIR).to_pandas()
    scp_ids = set(recs.loc[recs["side"] == "scopus", "rec_id"])
    m = dict(zip(matches["id_a"], matches["id_b"]))
    for i in range(0, 60, 9):
        w, s = f"w{i:010d}", f"s{i:010d}"
        if s in scp_ids:
            assert m.get(w) == s, f"stage-1 twin {i} not matched"
    conflict_pairs = set(
        zip(out["id_a"], out["id_b"])
    )
    for i in range(3, 60, 9):
        w, s = f"w{i:010d}", f"s{i:010d}"
        if s in scp_ids:
            assert (w, s) not in conflict_pairs, f"negative-rule twin {i} surfaced"


@pytest.fixture(scope="module")
def entrymod():
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__

    return __ray_entry__
