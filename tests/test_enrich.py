"""Enrichment client tests: retry/backoff semantics, candidate verification,
LRU + success-only caching, and the actor-pool fill stage — all against fake
transports (no network exists here)."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data as rd

from bibexpy_ray.sources.enrich import (
    EnrichStage,
    LruCache,
    Response,
    TransportError,
    enrich_missing_ids,
    first_surname,
    get_with_retry,
    resolve_id,
    stub_candidate_factory,
    title_sim,
    verify_candidate,
)


class FakeTransport:
    """Scripted transport: pops one outcome per call; records calls."""

    def __init__(self, outcomes):
        self.outcomes = list(outcomes)
        self.calls = []

    def __call__(self, url, *, headers=None, timeout=None, **kw):
        self.calls.append({"url": url, "headers": headers, "timeout": timeout, **kw})
        out = self.outcomes.pop(0)
        if isinstance(out, Exception):
            raise out
        return out


def _sleeps():
    delays = []
    return delays, delays.append


# ---------------------------------------------------------------------------
# get_with_retry
# ---------------------------------------------------------------------------


def test_retry_success_first_try_no_sleep():
    t = FakeTransport([Response(200, body={"ok": 1})])
    delays, sleep = _sleeps()
    r = get_with_retry(t, "http://x", sleep=sleep)
    assert r.ok and r.json() == {"ok": 1}
    assert delays == []
    assert t.calls[0]["timeout"] == (5.0, 20.0)  # mandatory timeout on every call


def test_retry_transport_errors_exponential_backoff():
    t = FakeTransport([TransportError("boom"), TransportError("boom"), Response(200)])
    delays, sleep = _sleeps()
    r = get_with_retry(t, "http://x", sleep=sleep)
    assert r.status_code == 200
    assert delays == [1.0, 2.0]  # 2**0, 2**1


def test_retry_all_errors_raises_last():
    t = FakeTransport([TransportError("a"), TransportError("b"), TransportError("c")])
    delays, sleep = _sleeps()
    with pytest.raises(TransportError, match="c"):
        get_with_retry(t, "http://x", sleep=sleep)
    assert delays == [1.0, 2.0, 4.0]


def test_retry_429_honors_retry_after():
    t = FakeTransport(
        [Response(429, headers={"Retry-After": "0.5"}), Response(200)]
    )
    delays, sleep = _sleeps()
    r = get_with_retry(t, "http://x", sleep=sleep)
    assert r.status_code == 200
    assert delays == [0.5]


def test_retry_after_capped_and_unparseable_falls_back():
    t = FakeTransport(
        [
            Response(503, headers={"Retry-After": "9999"}),   # capped to 15
            Response(429, headers={"Retry-After": "soon"}),   # unparseable -> 2**1
            Response(200),
        ]
    )
    delays, sleep = _sleeps()
    r = get_with_retry(t, "http://x", sleep=sleep)
    assert r.status_code == 200
    assert delays == [15.0, 2.0]


def test_retry_exhausted_returns_last_response_not_raise():
    t = FakeTransport([Response(429, headers={}) for _ in range(3)])
    delays, sleep = _sleeps()
    r = get_with_retry(t, "http://x", sleep=sleep)
    assert r.status_code == 429  # last response comes back, caller decides


def test_non_retryable_status_returned_immediately():
    t = FakeTransport([Response(404)])
    delays, sleep = _sleeps()
    r = get_with_retry(t, "http://x", sleep=sleep)
    assert r.status_code == 404 and delays == [] and len(t.calls) == 1


# ---------------------------------------------------------------------------
# verification gate
# ---------------------------------------------------------------------------


def test_verify_candidate_decision_table():
    ok = verify_candidate
    # identical -> accept
    assert ok("Deep Learning", 2020, "zhang", "Deep Learning", 2020, "zhang")
    # title below 0.90 -> reject
    assert not ok("Shallow Forests", 2020, "zhang", "Deep Learning", 2020, "zhang")
    # punctuation/case-insensitive title match
    assert ok("DEEP learning!!", 2020, "zhang", "deep Learning", 2020, "zhang")
    # year within +/-1 accepted, beyond rejected
    assert ok("T same title here", 2021, "z", "T same title here", 2020, "z")
    assert not ok("T same title here", 2022, "z", "T same title here", 2020, "z")
    # unparseable candidate year -> REJECT (not silently skipped)
    assert not ok("T same title here", "n.d.", "z", "T same title here", 2020, "z")
    # missing either year -> year check skipped
    assert ok("T same title here", None, "z", "T same title here", 2020, "z")
    # surname exact match required; substring does not count
    assert not ok("T same title here", 2020, "li", "T same title here", 2020, "oliveira")
    # missing surname on either side -> surname check skipped
    assert ok("T same title here", 2020, "", "T same title here", 2020, "zhang")


def test_first_surname_formats():
    assert first_surname("ZHANG C; GUO R") == "zhang"
    assert first_surname("Zhang, Chen; Guo, R") == "zhang"
    assert first_surname("") == ""
    assert first_surname(None) == ""


def test_title_sim_normalization():
    assert title_sim("A-B c", "a b C") == 1.0
    assert title_sim("", "x") == 0.0


# ---------------------------------------------------------------------------
# resolve_id + caching
# ---------------------------------------------------------------------------


def _cands_static(mapping):
    def fn(title, year, surname):
        return mapping.get(title, [])

    return fn


def test_resolve_picks_best_by_similarity():
    cands = _cands_static(
        {
            "alpha beta gamma": [
                ("10.1/close", "alpha beta gamm", 2020, "z"),
                ("10.1/exact", "alpha beta gamma", 2020, "z"),
            ]
        }
    )
    got = resolve_id("alpha beta gamma", "Z A", 2020, candidate_fn=cands)
    assert got == "10.1/exact"


def test_resolve_rejects_unverified_and_returns_none():
    cands = _cands_static(
        {"alpha beta gamma": [("10.1/far", "totally different", 2020, "z")]}
    )
    assert resolve_id("alpha beta gamma", "Z A", 2020, candidate_fn=cands) is None
    assert resolve_id("", "Z A", 2020, candidate_fn=cands) is None


def test_resolve_caches_success_only():
    calls = []

    def fn(title, year, surname):
        calls.append(title)
        if len(calls) < 2:
            return []  # transient failure: nothing found
        return [("10.1/x", title, year or None, surname)]

    cache = LruCache(4)
    # miss (not cached), then success (cached), then hit (no new call)
    assert resolve_id("t one two three", year=2020, candidate_fn=fn, cache=cache) is None
    assert len(cache) == 0  # failure NOT cached
    assert resolve_id("t one two three", year=2020, candidate_fn=fn, cache=cache) == "10.1/x"
    assert len(cache) == 1
    assert resolve_id("t one two three", year=2020, candidate_fn=fn, cache=cache) == "10.1/x"
    assert len(calls) == 2  # third resolve served from cache


def test_lru_eviction_order():
    c = LruCache(2)
    c.put("a", 1)
    c.put("b", 2)
    assert c.get("a") == 1  # refresh a
    c.put("c", 3)            # evicts b (least recent)
    assert "b" not in c and "a" in c and "c" in c


# ---------------------------------------------------------------------------
# actor-pool fill stage
# ---------------------------------------------------------------------------


# the factory must be library-level (workers import it by module path);
# a test-module function would fail to import inside the actor constructor
_offline_factory = stub_candidate_factory


def test_enrich_stage_fills_only_missing(ray_session):
    tbl = pa.table(
        {
            "title": ["alpha beta gamma", "delta epsilon zeta", "eta theta iota"],
            "authors": ["A B; C D", None, "E F"],
            "year": [2020, None, 2021],
            "doi": ["10.5/already", None, ""],
        }
    )
    out = (
        rd.from_arrow(tbl)
        .map_batches(
            EnrichStage,
            fn_constructor_kwargs={"candidate_factory": _offline_factory},
            batch_format="pyarrow",
            concurrency=1,
        )
        .to_pandas()
        .sort_values("title")
        .reset_index(drop=True)
    )
    assert out["doi"].tolist() == ["10.5/already", "10.9/delta", "10.9/eta"]


def test_enrich_wrapper_creates_column(ray_session):
    ds = rd.from_arrow(
        pa.table({"title": ["kappa lambda mu"], "authors": [None], "year": [2022]})
    )
    out = enrich_missing_ids(ds, _offline_factory, concurrency=1).to_pandas()
    assert out["doi"].tolist() == ["10.9/kappa"]


def test_verify_candidate_folds_candidate_surname_case():
    # candidate sources return surnames verbatim; the probe side is lowered
    assert verify_candidate(
        "T same title here", 2020, "Zhang", "T same title here", 2020, "zhang"
    )
    assert not verify_candidate(
        "T same title here", 2020, "Li", "T same title here", 2020, "zhang"
    )


def test_enrich_stage_resolves_distinct_keys_once(ray_session):
    """Duplicate UNRESOLVABLE keys in one batch must invoke the candidate
    source once, not once per row (the success-only cache can't dedup them)."""
    import pyarrow as pa
    import ray.data as rd

    tbl = pa.table(
        {
            "title": ["same title here"] * 6 + ["other title here"],
            "authors": [None] * 7,
            "year": [None] * 7,
        }
    )
    from bibexpy_ray.sources.enrich import EnrichStage, stub_candidate_factory

    class CountingStage(EnrichStage):
        def __init__(self):
            calls = []

            def factory():
                def fn(title, year, surname):
                    calls.append(title)
                    return []  # unresolvable: nothing ever verifies

                return fn

            super().__init__(factory)
            self._calls = calls

        def __call__(self, batch):
            out = super().__call__(batch)
            return out.append_column(
                "n_calls", pa.array([len(self._calls)] * len(out), type=pa.int64())
            )

    out = (
        rd.from_arrow(tbl)
        .map_batches(CountingStage, batch_format="pyarrow", batch_size=7, concurrency=1)
        .to_pandas()
    )
    assert out["doi"].isna().all()
    assert out["n_calls"].max() == 2  # one per DISTINCT key, not 7
