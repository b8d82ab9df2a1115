

def test_apply_splits_propose_apply_repropose_empty(ray_session):
    """Full split lifecycle: propose (token-set components) → per-record
    apply → re-scan proposes nothing (suffixed names are skipped and the
    groups now carry distinct names)."""
    import pandas as pd
    import ray.data as rd

    from bibexpy_ray.pipelines.entity import (
        build_field_splits,
        build_split_assignments,
    )
    from bibexpy_ray.pipelines.rewrite import apply_splits

    df = pd.DataFrame(
        {
            "mention": ["LIU L"] * 4 + ["WANG Q"] * 2,
            "rec_id": [1, 2, 3, 4, 5, 6],
            "fields": [
                ["cs"], ["cs", "ml"],      # component A (chained, size 2)
                ["bio"], ["bio"],          # component B (size 2, larger rec ids)
                ["cs"], ["cs"],            # WANG Q: single component, no split
            ],
        }
    )
    proposals = build_field_splits(df)
    assert proposals["mention"].tolist() == ["LIU L", "LIU L"]
    assignments = build_split_assignments(df)
    # only the second component's records get renamed
    assert assignments["rec_id"].tolist() == [3, 4]
    assert set(assignments["proposed_name"]) == {"LIU L (b)"}

    corpus = pd.DataFrame(
        {"rec_id": [1, 2, 3, 4, 5, 6],
         "au": ["LIU  L", "LIU L", "liu l", "LIU L", "WANG Q", "LIU L"]}
    )
    out, metrics = apply_splits(
        rd.from_pandas(corpus), assignments, "au", "rec_id", snapshot_col="au_raw"
    )
    res = out.to_pandas().sort_values("rec_id")
    # recs 3 and 4 renamed (ws/case-tolerant match); rec 6 NOT in the
    # assignment set even though the mention matches
    assert res["au"].tolist() == [
        "LIU  L", "LIU L", "LIU L (b)", "LIU L (b)", "WANG Q", "LIU L"
    ]
    assert res["au_raw"].tolist() == corpus["au"].tolist()
    assert metrics == {"changed_rows": 2, "total_rows": 6}

    # re-propose over the rewritten mentions: suffixed names skipped,
    # remaining LIU L records are a single component -> nothing proposed
    df2 = df.copy()
    df2["mention"] = res["au"].tolist()[:4] + ["WANG Q", "WANG Q"]
    assert len(build_field_splits(df2)) == 0
    # applying the same assignments again changes nothing (idempotent)
    out2, metrics2 = apply_splits(out, assignments, "au", "rec_id")
    assert metrics2["changed_rows"] == 0


def test_restore_from_snapshot_roundtrip(ray_session):
    """apply (with snapshot) → restore is the identity on the column."""
    import pandas as pd
    import ray.data as rd

    from bibexpy_ray.pipelines.rewrite import apply_rewrite, restore_from_snapshot

    src = pd.DataFrame({"rec_id": [1, 2, 3], "name": ["a corp", "B Corp", "c llc"]})
    ds = rd.from_pandas(src)
    rewritten, metrics = apply_rewrite(
        ds, "name", {"a corp": "A Corporation"}, snapshot_col="name_raw"
    )
    rw = rewritten.to_pandas().sort_values("rec_id")
    assert rw["name"].tolist() == ["A Corporation", "B Corp", "c llc"]
    assert metrics["changed_rows"] == 1
    restored = restore_from_snapshot(rewritten, "name", "name_raw").to_pandas()
    restored = restored.sort_values("rec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(restored[["rec_id", "name"]], src)
    assert "name_raw" not in restored.columns
