"""Audit log / ops report / saved filter presets (state/audit.py)."""

import pyarrow as pa
import ray.data as rd

from bibexpy_ray.pipelines.relational import apply_filter_spec
from bibexpy_ray.state import audit
from bibexpy_ray.state.audit import PresetStore


def _orders_ds():
    return rd.from_arrow(
        pa.table(
            {
                "o_orderkey": list(range(100)),
                "o_totalprice": [float(i * 1000) for i in range(100)],
                "o_orderpriority": ["1-URGENT" if i % 2 else "5-LOW" for i in range(100)],
            }
        )
    )


SPEC = {
    "range": [{"col": "o_totalprice", "ge": 10_000.0, "lt": 60_000.0}],
    "in_set": [{"col": "o_orderpriority", "values": ["1-URGENT"]}],
}


def test_audit_write_read_summary(tmp_path):
    d = str(tmp_path)
    audit.write(d, "merge", "first", details={"n": 1}, analysis_id="a1")
    audit.write(d, "export", "second", analysis_id="a2")
    audit.write(d, "merge", "third", analysis_id="a1")
    assert [e["title"] for e in audit.read(d)] == ["first", "second", "third"]
    assert len(audit.read(d, kind="merge")) == 2
    assert len(audit.read(d, analysis_id="a2")) == 1
    s = audit.summary(d)
    assert s["total"] == 3 and s["by_kind"] == {"merge": 2, "export": 1}
    assert s["first_ts"] <= s["last_ts"]
    # per-analysis scoped delete, then clear
    assert audit.delete_for_analysis(d, "a1") == 2
    assert [e["title"] for e in audit.read(d)] == ["second"]
    assert audit.clear(d) == 1
    assert audit.read(d) == []


def test_markdown_report(tmp_path):
    d = str(tmp_path)
    assert "_No operations recorded yet._" in audit.format_markdown_report(d)
    audit.write(
        d, "dedup", "Dedup run saved",
        details={
            "rows_in": 1200, "rows_canonical": 600, "clusters": 200,
            "verified_auto": 629, "borderline": 508, "s_exact": 2.9,
        },
    )
    audit.write(d, "export", "TSV export", details={"rows": 600})
    md = audit.format_markdown_report(d, title="Test report")
    assert md.startswith("# Test report")
    assert "| Dedup run | 1 |" in md  # summary table uses the kind label
    assert "| Input rows | **1200** |" in md
    assert "| Dedup rate | 50.0% |" in md
    assert "| exact | 2.9 |" in md  # stage timing table
    assert "TSV export" in md and "**rows:** 600" in md


def test_preset_roundtrip_and_apply(ray_session, tmp_path):
    store = PresetStore(str(tmp_path))
    assert store.list() == [] and store.get("x") is None
    store.save("mine", SPEC)
    assert store.get("mine") == SPEC
    # overwrite by name, not duplicate
    store.save("mine", {"has": ["o_orderkey"]})
    assert [p["name"] for p in store.list()] == ["mine"]
    store.save("mine", SPEC)

    got = store.apply(_orders_ds(), "mine").to_pandas()
    want = apply_filter_spec(_orders_ds(), SPEC).to_pandas()
    assert got.equals(want) and len(got) > 0

    store.delete("mine")
    assert store.list() == []
    try:
        store.apply(_orders_ds(), "mine")
        raise AssertionError("expected KeyError")
    except KeyError:
        pass
    # mutations were audited
    kinds = [e["user_action"] for e in audit.read(str(tmp_path), kind="filter_save")]
    assert kinds == ["save_preset", "save_preset", "save_preset", "delete_preset"]
