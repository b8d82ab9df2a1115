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


# ---------------------------------------------------------------------------
# Specialized per-field mergers (MergeDB.py:433-530, :595-664, :210-278)
# ---------------------------------------------------------------------------


def test_merge_language_decision_table():
    from bibexpy_ray.functions.fieldmerge import merge_language, standardize_language

    # code mapping + multi-language split + sorted-unique rejoin
    assert standardize_language("ENG; Fre") == "ENGLISH; FRENCH"
    assert standardize_language(" en ") == "ENGLISH"
    assert standardize_language("Español") == "SPANISH"  # folds to ESPANOL
    assert standardize_language("KLINGON") == "KLINGON"  # unmapped passthrough
    # union of both sources
    assert merge_language("ENG", "Spanish; GER") == "ENGLISH; GERMAN; SPANISH"
    # single-source fallbacks
    assert merge_language("", "zh") == "CHINESE"
    assert merge_language("JPN", None) == "JAPANESE"
    # ENGLISH default when both blank
    assert merge_language("", "") == "ENGLISH"
    assert merge_language(None, float("nan")) == "ENGLISH"


def test_merge_open_access_specific_beats_generic():
    from bibexpy_ray.functions.fieldmerge import merge_open_access

    # specific tier beats generic OPEN ACCESS, either side
    assert merge_open_access("OPEN ACCESS", "gold") == "GOLD OPEN ACCESS"
    assert merge_open_access("Green", "all open access") == "GREEN OPEN ACCESS"
    # both specific and differing -> WoS wins
    assert merge_open_access("GOLD", "HYBRID") == "GOLD OPEN ACCESS"
    # variant normalization
    assert merge_open_access("publisherfullgold", "") == "GOLD OPEN ACCESS"
    assert merge_open_access("", "repository") == "GREEN OPEN ACCESS"
    assert merge_open_access("subscription", "") == "NON OPEN ACCESS"
    # both blank -> NON OPEN ACCESS
    assert merge_open_access("", None) == "NON OPEN ACCESS"
    # unmapped passthrough
    assert merge_open_access("DIAMOND", "") == "DIAMOND"


def test_merge_references_author_year_keying():
    from bibexpy_ray.functions.fieldmerge import merge_references, reference_key

    # WoS style: Author, YYYY, JOURNAL
    assert reference_key("Smith J, 2019, J FOO, V1, P1") == "SMITHJ_2019"
    # Scopus style: Author T., Title (2019)
    assert reference_key("Smith J., Some title (2019)") == "SMITHJ_2019"
    # comma after surname -> author token is surname only
    assert reference_key("Smith, J., Some title (2019)") == "SMITH_2019"
    # unrecognized -> cleaned whole string
    assert reference_key("no year here") == "NOYEARHERE"

    wos = "Smith J, 2019, J FOO, V1, P1; Doe A, 2020, J BAR"
    sco = "Smith J., Some title... (2019); Roe B., Other (2021)"
    merged = merge_references(wos, sco)
    parts = merged.split("; ")
    # same author_year from both sources -> WoS formatting kept, once
    assert "Smith J, 2019, J FOO, V1, P1" in parts
    assert not any(p.startswith("Smith J.,") for p in parts)
    # scopus-only key appended; deterministic order (wos first)
    assert parts[0].startswith("Smith J")
    assert "Roe B., Other (2021)" in parts
    assert len(parts) == 3
    # empty sides
    assert merge_references("", sco) == "Smith J., Some title... (2019); Roe B., Other (2021)"
    assert merge_references(None, None) == ""


def test_merge_record_two_source_policies():
    from bibexpy_ray.functions.fieldmerge import merge_record

    rows = [
        {"id": "w1", "db": "wos", "LA": "ENG", "OA": "OPEN ACCESS",
         "CR": "Smith J, 2019, J FOO"},
        {"id": "s1", "db": "scopus", "LA": "Spanish", "OA": "gold",
         "CR": "Smith J., T... (2019); Roe B., X (2021)"},
    ]
    merged, _ = merge_record(
        rows,
        policies={"LA": "language", "OA": "open_access", "CR": "references"},
        source_field="db",
        source_order=["wos", "scopus"],
    )
    assert merged["LA"] == "ENGLISH; SPANISH"
    assert merged["OA"] == "GOLD OPEN ACCESS"
    assert merged["CR"] == "Smith J, 2019, J FOO; Roe B., X (2021)"


def test_field_status_bands():
    from bibexpy_ray.pipelines.relational import field_status

    assert field_status(0, 100) == "Excellent"
    assert field_status(4, 100) == "Very Good"
    assert field_status(5, 100) == "Good"      # 5% is NOT < 5
    assert field_status(14, 100) == "Good"
    assert field_status(15, 100) == "Poor"     # 15% is NOT < 15
    assert field_status(39, 100) == "Poor"
    assert field_status(40, 100) == "Very Poor"
    assert field_status(100, 100) == "Very Poor"


def test_clean_merged_values_parity():
    from bibexpy_ray.functions.fieldmerge import clean_merged_values

    # case-SENSITIVE dedup, ';' only, strip + drop empties (MergeDB.py:44-61)
    assert clean_merged_values("a; b ;; a; B") == "a; b; B"
    assert clean_merged_values("x|y; x|y") == "x|y"  # '|' is not a separator
    assert clean_merged_values("  ") == ""
    assert clean_merged_values(None) is None
    assert clean_merged_values(7) == 7


# ---------------------------------------------------------------------------
# Token-set field components (blocking.py:266-359 transitive semantics)
# ---------------------------------------------------------------------------


def test_field_components_transitive_chain():
    from bibexpy_ray.pipelines.entity import field_components

    # A-{x}, B-{x,y}, C-{y}: chained through B -> ONE component
    labels = field_components(
        [frozenset({"x"}), frozenset({"x", "y"}), frozenset({"y"})]
    )
    assert len(set(labels)) == 1
    # disjoint sets stay apart; later record touching two comps merges them
    labels = field_components(
        [frozenset({"a"}), frozenset({"b"}), frozenset({"a", "b"})]
    )
    assert len(set(labels)) == 1
    labels = field_components([frozenset({"a"}), frozenset({"b"})])
    assert len(set(labels)) == 2
    # labels are the component's smallest record index
    assert field_components(
        [frozenset({"q"}), frozenset({"z"}), frozenset({"q"})]
    ) == [0, 1, 0]


def test_build_field_splits_reference_decision_table():
    import pandas as pd

    from bibexpy_ray.pipelines.entity import build_field_splits

    df = pd.DataFrame(
        {
            # m1: two disjoint groups, clean Tier 1 split; sizes 2 vs 1
            # m2: chained (shared token bridges) -> single comp, no proposal
            # m3: disjoint groups + one record WITHOUT fields -> Tier 2
            # m4 (b): already-suffixed mention must be skipped (idempotency)
            # m5: only one record with fields -> undecidable, skipped
            "mention": ["m1"] * 3 + ["m2"] * 3 + ["m3"] * 3 + ["m4 (b)"] * 2 + ["m5"] * 2,
            "rec_id": [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13],
            "fields": [
                ["cs"], ["cs", "ml"], ["bio"],
                ["cs"], ["cs", "bio"], ["bio"],
                ["cs"], ["bio"], None,
                ["cs"], ["bio"],
                ["cs"], [],
            ],
        }
    )
    out = build_field_splits(df).sort_values(["mention", "proposed_name"])
    assert out["mention"].unique().tolist() == ["m1", "m3"]
    m1 = out[out["mention"] == "m1"]
    # largest comp keeps the plain name, smaller gets (b); Tier 1
    assert m1["proposed_name"].tolist() == ["m1", "m1 (b)"]
    assert m1["n_records"].tolist() == [2, 1]
    assert m1["tier"].tolist() == [1, 1]
    assert m1["fields"].tolist() == ["cs|ml", "bio"]
    m3 = out[out["mention"] == "m3"]
    assert m3["tier"].tolist() == [2, 2]  # unknown record demotes to ask
    # size tie broken by smallest record id: rec 7 comp keeps plain name
    assert m3[m3["proposed_name"] == "m3"]["rec_min"].tolist() == [7]


def test_build_field_splits_suffix_rollover():
    import pandas as pd

    from bibexpy_ray.pipelines.entity import build_field_splits

    # 9 singleton components: suffixes run "", (b)..(g), then numeric (7), (8)
    df = pd.DataFrame(
        {
            "mention": ["m"] * 9,
            "rec_id": list(range(9)),
            "fields": [[f"t{i}"] for i in range(9)],
        }
    )
    out = build_field_splits(df)
    assert out["proposed_name"].tolist() == [
        "m", "m (b)", "m (c)", "m (d)", "m (e)", "m (f)", "m (g)", "m (7)", "m (8)"
    ]


# ---------------------------------------------------------------------------
# Remaining specialized mergers (MergeDB.py:63-733 complete family)
# ---------------------------------------------------------------------------


def test_merge_author_fields_wos_reference_order():
    from bibexpy_ray.functions.fieldmerge import merge_author_fields

    # WoS order preserved; Scopus author with a NEW first-token key appended
    assert (
        merge_author_fields("ZHANG C; GUO R", "Zhang, Chen; Li K.")
        == "ZHANG C; GUO R; Li K."
    )
    # accent fold in the key: MÜLLER matches MULLER
    assert merge_author_fields("MULLER A", "Müller, A.") == "MULLER A"
    # empty WoS -> Scopus passes through (scopus-vs-scopus dups NOT collapsed,
    # faithful to the reference's wos-dict-only check)
    assert merge_author_fields("", "Li K.; Li K.") == "Li K.; Li K."
    assert merge_author_fields(None, "") == ""


def test_merge_author_fullnames_key_and_join_quirk():
    from bibexpy_ray.functions.fieldmerge import merge_author_fullnames

    # scopus name cleaned of (id) parens; ';'-joined WITHOUT space (reference quirk)
    assert (
        merge_author_fullnames("Zhang, Chen", "Lee, Kai (57190)")
        == "Zhang, Chen;Lee, Kai"
    )
    # same lastname key -> not appended
    assert merge_author_fullnames("Zhang, Chen", "ZHANG, C.") == "Zhang, Chen"
    # scopus name without a comma has no key -> never appended
    assert merge_author_fullnames("Zhang, Chen", "Mononym") == "Zhang, Chen"


def test_merge_address_reprint_url_source_title_priorities():
    from bibexpy_ray.functions.fieldmerge import (
        merge_address_fields,
        merge_reprint_author,
        merge_source_title,
        merge_url,
    )

    # C1: scopus-first; RP/URL: wos-first; SO: scopus-first
    assert merge_address_fields("w addr", "s addr") == "s addr"
    assert merge_address_fields("w addr", "  ") == "w addr"
    assert merge_reprint_author("w rp", "s rp") == "w rp"
    assert merge_reprint_author("", "s rp") == "s rp"
    assert merge_url("http://w", "http://s") == "http://w"
    assert merge_url(None, "http://s") == "http://s"
    assert merge_source_title("J  WoS", "J Scopus") == "J Scopus"
    assert merge_source_title("J  WoS", None) == "J WoS"  # whitespace collapsed


def test_merge_abstracts_copyright_strip_and_longer():
    from bibexpy_ray.functions.fieldmerge import merge_abstracts

    w = "Short text. © 2020 ALL RIGHTS RESERVED."
    s = "A longer abstract body with more words."
    assert merge_abstracts(w, s) == s  # copyright tail stripped before compare
    assert merge_abstracts("This is the longer one truly", "short") == (
        "This is the longer one truly"
    )
    # exact length tie -> scopus (reference's > comparison)
    assert merge_abstracts("abcd", "wxyz") == "wxyz"
    assert merge_abstracts("", "") == ""


def test_merge_keywords_case_insensitive_dedup_sorted():
    from bibexpy_ray.functions.fieldmerge import merge_keywords

    out = merge_keywords("Deep Learning; graphs", "GRAPHS; Álgebra; deep learning")
    # first occurrence wins the case battle; sorted case-insensitively; accents folded
    assert out == "Algebra; Deep Learning; graphs"
    assert merge_keywords("", "") == ""


def test_merge_publisher_longer_wins_tie_wos():
    from bibexpy_ray.functions.fieldmerge import merge_publisher

    assert merge_publisher("Elsevier", "Elsevier B.V. Amsterdam") == (
        "Elsevier B.V. Amsterdam"
    )
    assert merge_publisher("Springer", "Elsevie") == "Springer"  # tie-break len: wos
    assert merge_publisher("", "ACM") == "ACM"


def test_merge_document_type_union_sorted():
    from bibexpy_ray.functions.fieldmerge import merge_document_type

    # faithful reference quirk (MergeDB.py:539-543): the cleaner strips ';'
    # BEFORE the multi-type split, so each source contributes ONE cleaned type
    assert merge_document_type("Article", "Review; article") == (
        "ARTICLE; REVIEW ARTICLE"
    )
    assert merge_document_type("Article", "ARTICLE") == "ARTICLE"
    assert merge_document_type("Proc. Paper!", "") == "PROC PAPER"
    assert merge_document_type(None, None) == ""


def test_merge_record_uses_new_two_source_policies():
    from bibexpy_ray.functions.fieldmerge import merge_record

    rows = [
        {"src": "wos", "AU": "ZHANG C", "AB": "short", "SO": "J WoS"},
        {"src": "scopus", "AU": "Zhang, C.; Li K.", "AB": "a much longer abstract",
         "SO": "J Scopus"},
    ]
    merged, conflicts = merge_record(
        rows,
        policies={"AU": "author_fields", "AB": "abstract", "SO": "source_title"},
        source_field="src",
        source_order=["wos", "scopus"],
    )
    assert merged["AU"] == "ZHANG C; Li K."
    assert merged["AB"] == "a much longer abstract"
    assert merged["SO"] == "J Scopus"


def test_metadata_status_bands_integer_exact():
    from bibexpy_ray.pipelines.relational import metadata_status

    assert metadata_status(0, 100) == "Excellent"
    # <1% — 0.99% is Very Good, exactly 1% is Good (strict < like the reference)
    assert metadata_status(99, 10000) == "Very Good"
    assert metadata_status(1, 100) == "Good"
    assert metadata_status(4, 100) == "Good"
    assert metadata_status(5, 100) == "Acceptable"
    assert metadata_status(19, 100) == "Acceptable"
    assert metadata_status(20, 100) == "Poor"
    assert metadata_status(49, 100) == "Poor"
    assert metadata_status(50, 100) == "Critical"
    assert metadata_status(89, 100) == "Critical"
    assert metadata_status(90, 100) == "Completely Missing"
    assert metadata_status(100, 100) == "Completely Missing"


def test_merge_statistics_streaming_totals(ray_session):
    import pandas as pd
    import ray.data as rd

    from bibexpy_ray.pipelines.relational import merge_statistics

    wos = rd.from_pandas(
        pd.DataFrame({"TI": ["a", "b", ""], "PY": [2020, None, 2021], "CR": ["x", "y", "z"]})
    )
    scopus = rd.from_pandas(pd.DataFrame({"TI": ["c"], "PY": [2022]}))
    merged = rd.from_pandas(
        pd.DataFrame({"TI": ["a", "b", "c"], "PY": [2020, 2021, 2022]})
    )
    out = merge_statistics(wos, scopus, merged)
    assert out["wos"] == {"rows": 3, "columns": 3, "empty_cell_bp": 2222}  # 2/9
    assert out["scopus"] == {"rows": 1, "columns": 2, "empty_cell_bp": 0}
    assert out["merged"]["rows"] == 3 and out["merged"]["empty_cell_bp"] == 0
    assert out["common_columns"] == 2  # TI, PY
    assert out["merge_rate_bp"] == 7500  # 3 of 4 input rows survive


def test_cluster_mentions_two_stage_matches_fused(ray_session):
    """The two-shuffle leaf parallelization must produce the identical
    cluster table as a fused groupby→split→greedy pass, including under
    the skew it exists for (every mention sharing one coarse block key)."""
    import numpy as np
    import ray.data as rd

    from bibexpy_ray.pipelines.entity import (
        MAX_BLOCK,
        block_key,
        cluster_mentions,
    )
    from bibexpy_ray.functions.normalize import normalize_name

    rng = np.random.default_rng(11)
    names = (
        # one hot coarse key: shared long prefix, suffix digits (forces the
        # recursive prefix refinement several levels deep)
        [f"Customer Alpha {i:06d}" for i in range(600)]
        # a handful of small natural blocks
        + [f"{fam} {giv}" for fam in ["smith", "jones", "garcia"]
           for giv in ["anna", "annna", "bob", "bobb", "carol"]]
    )
    rng.shuffle(names)
    df = pd.DataFrame({"mention_id": range(len(names)), "name": names})

    got = (
        cluster_mentions(rd.from_pandas(df), "name")
        .to_pandas()
        .sort_values(["canonical", "variants"])
        .reset_index(drop=True)
    )

    # fused single-machine reference: identical primitives, no shuffles
    from bibexpy_ray.pipelines.entity import cluster_block

    work = pd.DataFrame(
        {
            "mention_id": df["mention_id"],
            "mention": df["name"],
            "_norm": [normalize_name(n) for n in df["name"]],
        }
    )
    work["_bkey"] = [block_key(n) for n in work["_norm"]]
    work = work[(work["_norm"] != "") & (work["_bkey"] != "")]

    def split(g, depth=0):
        if len(g) <= MAX_BLOCK or depth > 24:
            return [g]
        out = []
        for _, sub in g.groupby(g["_norm"].str.slice(0, 10 + depth)):
            out.extend(split(sub, depth + 1))
        return out

    outs = []
    for _, g in work.groupby("_bkey"):
        for sub in split(g):
            o = cluster_block(sub)
            if len(o):
                outs.append(o)
    want = (
        pd.concat(outs, ignore_index=True)
        .sort_values(["canonical", "variants"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
