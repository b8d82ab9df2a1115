"""Multi-source enrichment priority chain (extract_metadata analog):
priority order, per-field provenance, early exit, error skipping, URL
truncation, and the persistent payload-hash cache surviving actor restarts.
Reference semantics: api_utils.py:973-1172 + cache.py:16-51 (reimplemented,
NOT copied)."""

import pyarrow as pa

from bibexpy_ray.sources.enrich import (
    FILLABLE_FIELDS,
    MultiSourceEnrichStage,
    extract_metadata_chain,
    is_blank,
    stub_sources_factory,
    truncate_url_list,
)


def test_priority_order_and_provenance():
    s1 = ("One", lambda k: {"TI": "first-title", "AU": ""})
    s2 = ("Two", lambda k: {"TI": "second-title", "PY": "2021", "AU": "DOE J"})
    out = extract_metadata_chain(
        "10.1/x", {"TI": "", "PY": None, "AU": "nan"}, [s1, s2],
        fillable=("TI", "PY", "AU"),
    )
    # earlier source wins the contested field
    assert out["TI"] == "first-title"
    # a BLANK fill from an earlier source leaves the field fillable by a later
    # one, and provenance records only non-blank fills (reference rule)
    assert out["AU"] == "DOE J"
    assert out["PY"] == "2021"
    assert out["API_Sources"] == {"TI": "One", "PY": "Two", "AU": "Two"}


def test_early_exit_skips_tail_sources():
    calls = []

    def mk(name, data):
        def f(k):
            calls.append(name)
            return data

        return (name, f)

    sources = [mk("a", {"TI": "t"}), mk("b", {"PY": "2020"}), mk("c", {"SO": "s"})]
    out = extract_metadata_chain(
        "k", {"TI": "", "PY": "", "SO": "already"}, sources,
        early_exit_after=2, fillable=("TI", "PY", "SO"),
    )
    assert calls == ["a", "b"]  # early exit: nothing blank after the first two
    assert out["API_Sources"] == {"TI": "a", "PY": "b"}
    # still-blank field -> the tail source IS consulted
    calls.clear()
    out = extract_metadata_chain(
        "k", {"TI": "", "PY": "", "SO": ""}, sources,
        early_exit_after=2, fillable=("TI", "PY", "SO"),
    )
    assert calls == ["a", "b", "c"]
    assert out["SO"] == "s"


def test_raising_source_is_skipped():
    def boom(k):
        raise RuntimeError("api down")

    sources = [("bad", boom), ("good", lambda k: {"TI": "t"})]
    out = extract_metadata_chain("k", {"TI": ""}, sources, fillable=("TI",))
    assert out["TI"] == "t"
    assert out["API_Sources"] == {"TI": "good"}


def test_truncate_url_list():
    urls = "; ".join(f"https://example.test/{i:04d}" for i in range(200))
    t = truncate_url_list(urls)
    # reference-parity bound: the '; ...' tail may overshoot the nominal cap
    # by up to 2 chars (documented quirk, kept 1:1 with the reference)
    assert len(t) <= 2079 + 2
    assert t.endswith("...")
    # whole-URL boundaries are preserved
    kept = t.split("; ")[:-1]
    assert all(u.startswith("https://example.test/") for u in kept)
    short = "https://a.test/1; https://a.test/2"
    assert truncate_url_list(short) == short


def test_is_blank_matches_reference_rule():
    assert is_blank(None) and is_blank("") and is_blank("  ")
    assert is_blank("nan") and is_blank("NaN") and is_blank("None")
    assert is_blank(float("nan"))
    assert not is_blank("x") and not is_blank(0)


def _stage(tmp_path, counter):
    def factory():
        def counted(k):
            counter.append(k)
            return {"TI": f"t-{k}", "PY": "2020", "SO": f"s-{k}"}

        return [("Counted", counted)]

    return MultiSourceEnrichStage(
        factory,
        key_col="doi",
        fillable=("TI", "PY", "SO"),
        cache_path=str(tmp_path / "enrich_cache.sqlite"),
    )


def test_stage_fills_and_persistent_cache_survives_restart(tmp_path):
    calls: list = []
    batch = pa.table(
        {
            "doi": ["10.1/a", "10.1/b", "10.1/a", None],
            "TI": [None, "kept-title", None, None],
            "PY": [None, None, None, None],
            "SO": [None, "kept-so", None, None],
        }
    )
    stage = _stage(tmp_path, calls)
    out = stage(batch)
    d = out.to_pylist()
    assert d[0]["TI"] == "t-10.1/a" and d[0]["PY"] == "2020"
    assert d[1]["TI"] == "kept-title" and d[1]["SO"] == "kept-so"
    assert d[1]["PY"] == "2020"  # partial record still fills the blank field
    assert d[3]["TI"] is None  # no key -> untouched
    assert '"TI": "Counted"' in d[0]["API_Sources"]
    # fetch-once per distinct key (row 2 repeats 10.1/a)
    assert sorted(calls) == ["10.1/a", "10.1/b"]
    # "restart" the actor: a NEW stage instance over the same cache path must
    # serve every key from disk — zero new fetches
    calls2: list = []
    stage2 = _stage(tmp_path, calls2)
    out2 = stage2(batch)
    assert calls2 == []
    assert out2.to_pylist()[0]["TI"] == "t-10.1/a"


def test_stage_complete_records_do_zero_lookups(tmp_path):
    calls: list = []
    full = pa.table(
        {"doi": ["10.1/z"], "TI": ["t"], "PY": ["2001"], "SO": ["s"]}
    )
    stage = _stage(tmp_path, calls)
    out = stage(full)
    assert calls == []  # auto_prepare property: fully-enriched is free
    assert out.to_pylist()[0]["API_Sources"] is None


def test_stage_over_ray_dataset(ray_session):
    import ray.data as rd

    from bibexpy_ray.sources.enrich import MultiSourceEnrichStage

    ds = rd.from_items(
        [{"doi": f"10.2/{i}", "TI": None, "PY": None, "SO": None} for i in range(20)]
    )
    out = ds.map_batches(
        MultiSourceEnrichStage,
        fn_constructor_kwargs={
            "sources_factory": stub_sources_factory,
            "key_col": "doi",
            "fillable": ("TI", "PY", "SO", "UR"),
        },
        batch_format="pyarrow",
        batch_size=8,
        concurrency=2,
    ).to_pandas()
    assert len(out) == 20
    assert (out["TI"].str.startswith("title-")).all()  # priority source wins TI
    assert (out["SO"].str.startswith("journal-")).all()  # tail source fills SO
    assert out["UR"].str.startswith("https://").all()
    assert set(FILLABLE_FIELDS) >= {"TI", "PY", "SO", "UR"}


def test_enrich_chain_documents_parity_shape(ray_session):
    from bibexpy_ray.sources.enrich import enrich_chain_documents

    import json

    import pyarrow.parquet as pq

    out = enrich_chain_documents("/root/testdata/sf0.001")
    assert list(out.columns) == ["doc_id", "la", "pu", "api_sources"]
    assert (out["pu"] == "house").all()  # PU always blank -> Secondary fills
    # blankness from the SOURCE column (la='en' may be an original value)
    src = (
        pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "lang"])
        .to_pandas()
        .set_index("doc_id")["lang"]
    )
    lang = out["doc_id"].map(src)
    blank = lang.isna() | (lang.astype(str).str.strip().isin(["", "nan", "None"]))
    # non-blank rows keep their value; only PU provenance recorded
    assert (out.loc[~blank, "la"] == lang.loc[~blank]).all()
    assert (out.loc[~blank, "api_sources"] == '{"PU": "Secondary"}').all()
    # priority fallthrough: even keys take Primary's 'en', odd take 'xx'
    ev = out["doc_id"] % 2 == 0
    assert (out.loc[blank & ev, "la"] == "en").all()
    assert (out.loc[blank & ~ev, "la"] == "xx").all()
    if (blank & ev).any():
        j = out.loc[blank & ev, "api_sources"].iloc[0]
        assert json.loads(j) == {"LA": "Primary", "PU": "Secondary"}
