"""Field-merge policies + entity clustering (reference decision-table parity)."""

import pandas as pd
import pytest

from bibexpy_ray.functions.fieldmerge import (
    first_non_blank,
    longer_wins,
    merge_record,
    priority_source,
    union_values,
)
from bibexpy_ray.pipelines.entity import (
    block_key,
    cluster_block,
    greedy_cluster,
    min_pairwise_jw,
)


# ---- field mergers (MergeDB.py semantics) ---------------------------------

def test_union_values_dedup_case_insensitive_order_preserving():
    assert union_values(["Alpha; beta", "BETA | gamma", None]) == "Alpha; beta; gamma"


def test_union_values_empty():
    assert union_values([None, "", "nan "]) == "nan"  # literal 'nan ' strips to token
    assert union_values([None, ""]) == ""


def test_longer_wins():
    assert longer_wins(["short", "the longest value here", ""]) == "the longest value here"
    assert longer_wins(["aa", "bb"]) == "aa"  # stable tie


def test_first_non_blank():
    assert first_non_blank([None, "", "nan", "x", "y"]) == "x"


def test_priority_source_prefers_order_and_flags_conflict():
    val, conflict = priority_source(["b-val", "a-val"], ["src_b", "src_a"], ["src_a", "src_b"])
    assert val == "a-val" and conflict
    val, conflict = priority_source(["same", "SAME"], ["s1", "s2"], ["s1", "s2"])
    assert val == "same" and not conflict


def test_merge_record_policies_and_conflicts():
    rows = [
        {"caption": "short cap", "fmt": "png", "image_id": "b", "tags": "x; y"},
        {"caption": "a much longer caption", "fmt": "", "image_id": "a", "tags": "Y; z"},
    ]
    merged, conflicts = merge_record(rows, policies={"tags": "union"})
    assert merged["caption"] == "a much longer caption"
    assert merged["fmt"] == "png"
    assert merged["image_id"] == "b"  # first_non_blank default keeps first
    assert merged["tags"] == "x; y; z"
    conflict_fields = {c["field"] for c in conflicts}
    assert "image_id" in conflict_fields  # differing non-blank values logged


# ---- entity clustering (blocking.py semantics) ----------------------------

def test_greedy_cluster_transitive():
    # a~b and b~c but a!~c still end up together (single-link transitivity)
    ms = ["johnson r", "johnson ro", "johnson rob", "smith k"]
    clusters = greedy_cluster(ms)
    sets = [set(c) for c in clusters]
    assert {0, 1, 2} in sets and {3} in sets


def test_min_pairwise_jw_bounds():
    assert min_pairwise_jw(["abc"]) == 1.0
    assert 0 <= min_pairwise_jw(["abc", "xyz"]) < 0.6


def test_block_key():
    assert block_key("johnson robert") == "johnson_r"
    assert block_key("cher") == "cher_"
    assert block_key("") == ""


def test_cluster_block_tiers():
    block = pd.DataFrame(
        {
            "mention_id": range(5),
            "mention": ["x"] * 5,
            "_norm": [
                "customer 0001", "customer 00011",  # near-identical -> tier 1
                "customer 0901",                     # JW in [0.75, 0.95) of the above
                "zzz distinct", "qqq other",
            ],
        }
    )
    out = cluster_block(block)
    assert len(out) >= 1
    big = out.loc[out["n_mentions"].idxmax()]
    assert "customer 0001" in big["variants"]
    assert big["tier"] in (1, 2)
    # singletons (zzz/qqq) never become proposals
    assert not any("zzz" in v for v in out["variants"])


def test_split_proposals():
    import ray.data as rd

    from bibexpy_ray.pipelines.entity import split_proposals

    df = pd.DataFrame(
        {
            "name": ["j smith"] * 5 + ["a jones"] * 2 + ["only one"],
            "field": ["physics", "physics", "physics", "biology", "biology",
                      "chem", "chem", "math"],
        }
    )
    out = split_proposals(rd.from_pandas(df), "name", "field")
    smith = out[out["mention"] == "j smith"]
    assert len(smith) == 2
    # largest component keeps the plain name; the other gets the (b) suffix
    top = smith.loc[smith["n_mentions"].idxmax()]
    assert top["proposed_name"] == "j smith" and top["component_feature"] == "physics"
    assert set(smith["proposed_name"]) == {"j smith", "j smith (b)"}
    # single-feature and singleton names never propose splits
    assert "a jones" not in set(out["mention"])
    assert "only one" not in set(out["mention"])


# ---------------------------------------------------------------------------
# authority-set (ORCID) arbitration — ported decision tests (orcid.py:245-261)
# ---------------------------------------------------------------------------


def test_classify_authority_sets_decisions():
    from bibexpy_ray.pipelines.entity import classify_by_authority_sets as c

    # disjoint known sets ⇒ conflict (different people)
    assert c([{"0000-1"}, {"0000-2"}]) == "conflict"
    # all pairwise-intersecting ⇒ merge
    assert c([{"0000-1"}, {"0000-1", "0000-3"}]) == "merge"
    assert c([{"a", "b"}, {"b", "c"}, {"b"}]) == "merge"
    # fewer than two known ⇒ unknown
    assert c([]) == "unknown"
    assert c([{"x"}]) == "unknown"
    assert c([set(), {"x"}, set()]) == "unknown"
    # one disjoint pair among several ⇒ conflict even if others intersect
    assert c([{"a"}, {"a"}, {"z"}]) == "conflict"


def test_arbitrate_clusters_tiers():
    import pandas as pd

    from bibexpy_ray.pipelines.entity import arbitrate_clusters

    clusters = pd.DataFrame(
        {
            "cluster_id": ["c1", "c2", "c3"],
            "members": ["smith j; smith jo", "doe a; doe ab", "roe b; roe bc"],
            "tier": [2, 2, 1],
        }
    )
    ids = {
        "smith j": {"0000-1"}, "smith jo": {"0000-1"},     # merge
        "doe a": {"0000-2"}, "doe ab": {"0000-9"},          # conflict
        # roe: no ids -> unknown, tier unchanged
    }
    out = arbitrate_clusters(clusters, ids)
    assert list(out["authority_decision"]) == ["merge", "conflict", "unknown"]
    assert list(out["tier"]) == [1, 3, 1]
