"""Enrichment lookups: retry/backoff client + cached actor-pool fill stage.

Semantics reimplemented (NOT copied) from the reference's enrichment client,
/root/reference/packages/bibex_core/modules/api_utils.py:

- ``get_with_retry`` (:19-42): fixed (connect, read) timeout on every call, 3
  attempts, exponential backoff ``min(2**i, 8)`` on transport errors, 429/503
  honored via ``Retry-After`` (float seconds, fall back to the exponential
  delay when absent/unparseable, hard cap 15 s); the LAST response is returned
  when attempts run out, the last exception re-raised when no response ever
  arrived.
- ``_verify_candidate`` (:67-88): precision-over-recall gate for reverse-DOI
  lookups — title similarity >= 0.90 (difflib ratio over alnum-normalized
  lowercase), year within +/-1 when both sides have one (an UNPARSEABLE
  candidate year REJECTS, it is not silently skipped), first-author surname
  must match EXACTLY when both sides have one (substring does not count).
- ``resolve_id`` (:137-171 _resolve_doi_cached / resolve_doi): gather
  candidates from the configured sources, verify each, keep the best by title
  similarity; ONLY successful resolutions are cached so a transient failure
  never sticks as a permanent blank.
- per-process LRU cache of 8192 entries (orcid.py:37's lookup-cache bound).

Ray shape: lookups run inside an actor-pool ``map_batches`` stage
(``EnrichStage``) — the cache and the transport live in ``__init__`` (once per
actor), each batch resolves only its DISTINCT missing keys, and already-filled
rows pass through untouched. This sandbox has no network, so the transport is
an injected callable; ``requests_transport()`` exists for real deployments and
raises a clear error here. All tests drive fake transports.
"""

from __future__ import annotations

import difflib
import re
import time
from collections import OrderedDict
from collections.abc import Callable, Iterable
from dataclasses import dataclass
from typing import Any

import pyarrow as pa

REQUEST_TIMEOUT = (5.0, 20.0)  # (connect, read) — no call may hang a job
DEFAULT_ATTEMPTS = 3
BACKOFF_CAP = 8.0       # cap on the exponential delay
RETRY_AFTER_CAP = 15.0  # cap on a server-provided Retry-After
RETRY_STATUSES = (429, 503)
CACHE_SIZE = 8192       # per-actor LRU bound (reference orcid.py:37)


class TransportError(Exception):
    """A transport-level failure (connection refused, timeout, DNS...)."""


@dataclass
class Response:
    """Minimal response shape the client needs (requests-compatible subset)."""

    status_code: int
    headers: dict[str, str] | None = None
    body: Any = None

    @property
    def ok(self) -> bool:
        return 200 <= self.status_code < 400

    def json(self) -> Any:
        return self.body


# Transport: callable(url, *, headers, timeout, **kw) -> Response,
# raising TransportError on network-level failure.
Transport = Callable[..., Response]


def requests_transport() -> Transport:
    """Real-network transport (unavailable in this sandbox — inject a fake)."""
    try:
        import requests  # noqa: F401
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise RuntimeError(
            "no network/requests in this environment; pass transport= explicitly"
        ) from exc

    def _call(url: str, *, headers=None, timeout=REQUEST_TIMEOUT, **kw) -> Response:
        import requests

        try:
            r = requests.get(url, headers=headers, timeout=timeout, **kw)
        except requests.RequestException as exc:  # pragma: no cover
            raise TransportError(str(exc)) from exc
        return Response(r.status_code, dict(r.headers), r.json() if r.content else None)

    return _call


def _retry_delay(attempt: int) -> float:
    return min(float(2**attempt), BACKOFF_CAP)


def get_with_retry(
    transport: Transport,
    url: str,
    *,
    headers: dict[str, str] | None = None,
    attempts: int = DEFAULT_ATTEMPTS,
    sleep: Callable[[float], None] = time.sleep,
    **kw: Any,
) -> Response:
    """GET with mandatory timeout + exponential backoff; 429/503 honor
    Retry-After (see module docstring for the exact reference semantics)."""
    last: Response | Exception | None = None
    for i in range(attempts):
        try:
            r = transport(url, headers=headers, timeout=REQUEST_TIMEOUT, **kw)
        except TransportError as exc:
            last = exc
            sleep(_retry_delay(i))
            continue
        if r.status_code in RETRY_STATUSES:
            retry_after = (r.headers or {}).get("Retry-After")
            try:
                delay = float(retry_after) if retry_after else _retry_delay(i)
            except (TypeError, ValueError):
                delay = _retry_delay(i)
            # the sleep also runs on the FINAL attempt before the last
            # response is returned — deliberate 1:1 parity with the
            # reference's loop shape (api_utils.py:19-42)
            sleep(min(delay, RETRY_AFTER_CAP))
            last = r
            continue
        return r
    if isinstance(last, Response):
        return last
    raise last if last else TransportError(f"request failed: {url}")


# ---------------------------------------------------------------------------
# Candidate verification (precision-first reverse lookup)
# ---------------------------------------------------------------------------

_NON_ALNUM = re.compile(r"[^a-z0-9 ]")
_WS = re.compile(r"\s+")

TITLE_SIM_MIN = 0.90
YEAR_TOLERANCE = 1


def norm_title(s: Any) -> str:
    s = _NON_ALNUM.sub(" ", str(s).lower())
    return _WS.sub(" ", s).strip()


def title_sim(a: Any, b: Any) -> float:
    na, nb = norm_title(a), norm_title(b)
    if not na or not nb:
        return 0.0
    return difflib.SequenceMatcher(None, na, nb).ratio()


def first_surname(authors: Any) -> str:
    """'ZHANG C; GUO R' / 'Zhang, Chen; ...' -> first author's surname, lower."""
    if not authors:
        return ""
    first = str(authors).split(";")[0].strip()
    first = first.split(",")[0].strip()
    parts = first.split()
    return (parts[0] if parts else "").lower()


def verify_candidate(
    c_title: Any, c_year: Any, c_surname: str, title: Any, year: Any, surname: str
) -> bool:
    """Accept a lookup candidate only when title sim >= 0.90, year within
    +/-1 (unparseable candidate year ⇒ REJECT), and exact surname match."""
    if title_sim(c_title, title) < TITLE_SIM_MIN:
        return False
    if year and c_year:
        try:
            if abs(int(float(str(c_year))) - int(float(str(year)))) > YEAR_TOLERANCE:
                return False
        except (TypeError, ValueError):
            return False  # stay on the safe side: can't interpret ⇒ reject
    # fold the candidate side: user-supplied candidate_fns return surnames
    # verbatim, while the probe side is always lowercased by first_surname
    cs = str(c_surname or "").strip().lower()
    if surname and cs and surname != cs:
        return False  # exact match required (substring does not count)
    return True


class LruCache:
    """Tiny bounded LRU (dict-ordered); one per actor, never shipped."""

    def __init__(self, maxsize: int = CACHE_SIZE) -> None:
        self.maxsize = maxsize
        self._d: OrderedDict[Any, Any] = OrderedDict()

    def get(self, key: Any) -> Any:
        try:
            self._d.move_to_end(key)
            return self._d[key]
        except KeyError:
            return None

    def put(self, key: Any, value: Any) -> None:
        self._d[key] = value
        self._d.move_to_end(key)
        if len(self._d) > self.maxsize:
            self._d.popitem(last=False)

    def __len__(self) -> int:
        return len(self._d)

    def __contains__(self, key: Any) -> bool:
        return key in self._d


# candidate_fn(title, year, surname) -> iterable of (id, title, year, surname)
CandidateFn = Callable[[str, str, str], Iterable[tuple[str, Any, Any, str]]]


def resolve_id(
    title: Any,
    authors: Any = None,
    year: Any = None,
    *,
    candidate_fn: CandidateFn,
    cache: LruCache | None = None,
) -> str | None:
    """Reverse lookup: title+year+first-surname → verified external id.

    Best verified candidate by title similarity wins; ``None`` when nothing
    verifies (never fabricates). Only SUCCESSFUL resolutions are cached so a
    transient failure can be retried on the next encounter.
    """
    if not title or not str(title).strip():
        return None
    surname = first_surname(authors)
    yr = ""
    if year not in (None, ""):
        try:
            yr = str(int(float(str(year))))
        except (TypeError, ValueError):
            yr = ""
    t = str(title).strip()[:300]
    key = (t, yr, surname)
    if cache is not None:
        hit = cache.get(key)
        if hit:
            return hit
    best_id, best_sim = "", 0.0
    for cid, c_title, c_year, c_surname in candidate_fn(t, yr, surname):
        if not cid:
            continue
        if not verify_candidate(c_title, c_year, c_surname, t, yr, surname):
            continue
        sim = title_sim(c_title, t)
        if sim > best_sim:
            best_sim, best_id = sim, cid
    if best_id and cache is not None:
        cache.put(key, best_id)
    return best_id or None


class EnrichStage:
    """Actor-pool ``map_batches`` stage: fill a missing id column via cached
    reverse lookups.

    ``candidate_factory`` is called ONCE in ``__init__`` (per actor) and
    returns the candidate_fn — the place to open transports / load config.
    Each batch resolves only its distinct unresolved keys; rows that already
    carry a value pass through untouched (zero lookups on a fully-enriched
    table, the ``auto_prepare`` property).
    """

    def __init__(
        self,
        candidate_factory: Callable[[], CandidateFn],
        *,
        title_col: str = "title",
        authors_col: str | None = "authors",
        year_col: str | None = "year",
        out_col: str = "doi",
        cache_size: int = CACHE_SIZE,
    ) -> None:
        self.candidate_fn = candidate_factory()
        self.cache = LruCache(cache_size)
        self.title_col = title_col
        self.authors_col = authors_col
        self.year_col = year_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        titles = batch[self.title_col].to_pylist()
        n = len(titles)
        authors = (
            batch[self.authors_col].to_pylist() if self.authors_col else [None] * n
        )
        years = batch[self.year_col].to_pylist() if self.year_col else [None] * n
        if self.out_col in batch.column_names:
            current = batch[self.out_col].to_pylist()
            batch = batch.drop_columns([self.out_col])
        else:
            current = [None] * n
        # resolve each DISTINCT unresolved (title, authors, year) key once —
        # duplicate unresolvable keys must not re-invoke the candidate source
        # per row (the success-only cache can't dedup failures within a batch)
        resolved: dict[tuple, str | None] = {}
        out: list[str | None] = []
        for cur, t, a, y in zip(current, titles, authors, years):
            if cur is not None and str(cur).strip():
                out.append(cur)
                continue
            key = (t, a, y)
            if key not in resolved:
                resolved[key] = resolve_id(
                    t, a, y, candidate_fn=self.candidate_fn, cache=self.cache
                )
            out.append(resolved[key])
        return batch.append_column(self.out_col, pa.array(out, type=pa.string()))


def stub_sources_factory() -> "list[tuple[str, SourceFn]]":
    """Deterministic OFFLINE source chain (no network in this sandbox): two
    priority sources deriving fields from the key. Lives in the library so
    actor-pool workers can import it by module path (a test-module factory
    would ImportError inside the worker and restart the actor forever)."""

    def primary(key: str) -> dict:
        return {"TI": f"title-{key}", "PY": "2020"}

    def secondary(key: str) -> dict:
        return {"TI": f"alt-{key}", "SO": f"journal-{key}", "UR": f"https://x.test/{key}"}

    return [("Primary", primary), ("Secondary", secondary)]


def parity_sources_factory() -> "list[tuple[str, SourceFn]]":
    """Deterministic chain used by the oracle-checked ``enrich_chain`` query:
    Primary fills LA='en' for EVEN integer keys only (returns no data for
    odd — the priority-fallthrough case); Secondary always offers LA='xx'
    and PU='house'. Pure functions of the key, so a SQL CASE expression can
    reproduce the fill + provenance bit-exactly."""

    def primary(key: str) -> dict:
        return {"LA": "en"} if int(key) % 2 == 0 else {}

    def secondary(key: str) -> dict:
        return {"LA": "xx", "PU": "house"}

    return [("Primary", primary), ("Secondary", secondary)]


def enrich_chain_documents(sf_dir: str):
    """Query surface for the multi-source chain: documents' ``lang`` maps to
    the WoS LA field; PU is always absent so every keyed row enriches. The
    result (la, pu, api_sources) is a pure function of (doc_id, lang) —
    verified value-exact against a DuckDB CASE oracle."""
    import pyarrow.compute as pc
    import ray.data as rd  # noqa: F401

    from bibexpy_ray.pipelines.tables import read_table

    ds = read_table(sf_dir, "documents", ["doc_id", "lang"])

    def adapt(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "LA": t.column("lang").cast(pa.string()),
            }
        )

    enriched = ds.map_batches(adapt, batch_format="pyarrow").map_batches(
        MultiSourceEnrichStage,
        fn_constructor_kwargs={
            "sources_factory": parity_sources_factory,
            "key_col": "doc_id",
            "fillable": ("LA", "PU"),
        },
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=2,
    )

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("doc_id").cast(pa.int64()),
                "la": t.column("LA"),
                "pu": t.column("PU"),
                "api_sources": t.column("API_Sources"),
            }
        )

    out = enriched.map_batches(project, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def stub_candidate_factory() -> CandidateFn:
    """Deterministic OFFLINE candidate source (this sandbox has no network):
    resolves every title to an id derived from its first token, echoing the
    probe back as the candidate metadata so verification always passes. Used
    by tests and as the documented stub for network-less environments — it
    must live in the library (not a test module) because the actor pool's
    workers import the factory by module path."""

    def fn(title: str, year: str, surname: str):
        first = title.split()[0] if title.split() else "x"
        return [(f"10.9/{first}", title, year or None, surname)]

    return fn


# ---------------------------------------------------------------------------
# Multi-source priority chain (extract_metadata analog)
# ---------------------------------------------------------------------------

URL_FIELD_MAX = 2079  # Excel's URL cell limit (reference truncate_url_list)

#: fields the chain may fill; the early-exit checks exactly this set
#: (reference api_utils.py:978-981 _FILLABLE)
FILLABLE_FIELDS = (
    "DI", "DT", "AU", "AF", "TI", "PY", "SO", "PU", "SN", "UR", "AB", "DE",
    "C1", "TC", "CR", "LA", "WC", "SC", "OI", "RI", "ROR", "CC",
)


def is_blank(v: Any) -> bool:
    """Blank = None/NaN/''/'nan'/'NaN'/'None' (reference _is_blank 1:1)."""
    if v is None:
        return True
    if isinstance(v, float) and v != v:  # NaN without a pandas dependency
        return True
    return str(v).strip() in ("", "nan", "NaN", "None")


def truncate_url_list(url_list: str, max_length: int = URL_FIELD_MAX) -> str:
    """'; '-separated URL list truncated to the cell limit, ending in '...'
    when anything was dropped (reference truncate_url_list semantics:
    accumulate whole URLs while the running length stays within
    ``max_length - 3``, then append the ellipsis marker).

    Bit-parity note: like the reference, the appended '; ...' separator can
    land the result up to 2 characters OVER ``max_length`` when the last
    accepted URL ends exactly at the ``max_length - 3`` boundary — kept 1:1
    deliberately (fidelity to xlsx2vos/api_utils output beats the 2-char
    nominal cap)."""
    if not url_list or len(url_list) <= max_length:
        return url_list
    urls = url_list.split("; ")
    result: list[str] = []
    current = 0
    for url in urls:
        sep = 0 if not result else 2
        new_len = current + len(url) + sep
        if new_len <= max_length - 3:
            result.append(url)
            current = new_len
        else:
            result.append("...")
            break
    return "; ".join(result)


def _truncate_urls_inplace(record: dict) -> None:
    for field, v in record.items():
        if isinstance(v, str) and ("http://" in v or "https://" in v):
            record[field] = truncate_url_list(v)


# source fetch: callable(key) -> dict of field→value (may raise; a raising
# source is skipped, exactly like the reference's per-API try/except)
SourceFn = Callable[[str], dict]


def extract_metadata_chain(
    key: str,
    current: dict,
    sources: "list[tuple[str, SourceFn]]",
    *,
    early_exit_after: int = 2,
    fillable: tuple = FILLABLE_FIELDS,
) -> dict:
    """Fetch-once-fill-all priority chain (reference api_utils.py:973-1172):

    - sources run in FIXED priority order; each fills only fields still
      blank, so an earlier source always wins a contested field;
    - provenance: every field filled with a non-blank value is recorded in
      the ``API_Sources`` map as field→source-name;
    - early exit: after the first ``early_exit_after`` sources, if no
      fillable field remains blank the rest of the chain is never invoked
      (the reference's biggest latency win);
    - a source that raises is skipped (never fails the record);
    - URL-bearing string fields are truncated to the cell limit.
    """
    metadata = dict(current)
    api_sources: dict[str, str] = {}

    def remaining() -> bool:
        return any(is_blank(metadata.get(f)) for f in fillable)

    def apply(name: str, data: dict) -> None:
        for k, value in data.items():
            if is_blank(metadata.get(k)):
                if isinstance(value, str) and ("http://" in value or "https://" in value):
                    value = truncate_url_list(value)
                metadata[k] = value
                if not is_blank(value):
                    api_sources[k] = name

    for i, (name, fetch) in enumerate(sources):
        if i == early_exit_after and not remaining():
            break
        try:
            data = fetch(key)
        except Exception:
            continue  # a failing source is skipped, never fatal
        if data:
            apply(name, data)

    if api_sources:
        metadata["API_Sources"] = api_sources
    _truncate_urls_inplace(metadata)
    return metadata


class MultiSourceEnrichStage:
    """Actor-pool ``map_batches`` stage running the priority chain per row.

    ``sources_factory`` is called once per actor and returns the ordered
    ``[(name, fetch_fn), ...]`` list — the place to open transports. Results
    are cached per DISTINCT key: in-memory LRU first, then (optionally) a
    persistent ``PayloadCache`` in the run directory keyed by the payload
    hash of (key, source names) — an actor RESTART resumes from disk instead
    of refetching (the reference's sqlite response-cache pattern,
    cache.py:16-51). Rows whose fillable fields are complete short-circuit
    before any lookup.

    Output: one string column per fillable field present in the batch or
    filled by the chain, plus ``API_Sources`` as a JSON string column.
    """

    def __init__(
        self,
        sources_factory: Callable[[], "list[tuple[str, SourceFn]]"],
        *,
        key_col: str = "doi",
        fillable: tuple = FILLABLE_FIELDS,
        early_exit_after: int = 2,
        cache_size: int = CACHE_SIZE,
        cache_path: str | None = None,
    ) -> None:
        self.sources = sources_factory()
        self.key_col = key_col
        self.fillable = tuple(fillable)
        self.early_exit_after = early_exit_after
        self.cache = LruCache(cache_size)
        self.disk: Any = None
        if cache_path:
            from bibexpy_ray.state.payload_cache import PayloadCache

            self.disk = PayloadCache(cache_path)

    def _cached_sources(self) -> "list[tuple[str, SourceFn]]":
        """Wrap each source in a fetch-once cache keyed by (source, key):
        LRU first, then the persistent cache. Successful fetches (including
        'no data' = {}) cache; a RAISING fetch does not (transient failures
        stay retryable — the reference's success-only rule)."""
        from bibexpy_ray.state.payload_cache import payload_key

        wrapped = []
        for name, fetch in self.sources:
            def cached(key: str, _n=name, _f=fetch) -> dict:
                ck = payload_key({"source": _n, "key": key})
                hit = self.cache.get(ck)
                if hit is None and self.disk is not None:
                    hit = self.disk.get(ck)
                    if hit is not None:
                        self.cache.put(ck, hit)
                if hit is not None:
                    return hit
                data = _f(key) or {}  # a raise propagates → chain skips it
                self.cache.put(ck, data)
                if self.disk is not None:
                    self.disk.put(ck, data)
                return data

            wrapped.append((name, cached))
        return wrapped

    def __call__(self, batch: pa.Table) -> pa.Table:
        import json

        names = list(batch.column_names)
        rows = batch.to_pylist()
        sources = self._cached_sources()
        out_rows: list[dict] = []
        new_fields: set[str] = set()
        for row in rows:
            key = row.get(self.key_col)
            if is_blank(key) or not any(is_blank(row.get(f)) for f in self.fillable):
                # complete record or no lookup key: zero lookups (the
                # auto_prepare property — a fully-enriched table is free)
                out = dict(row)
                out["API_Sources"] = None
            else:
                out = extract_metadata_chain(
                    str(key),
                    row,
                    sources,
                    early_exit_after=self.early_exit_after,
                    fillable=self.fillable,
                )
                srcs = out.pop("API_Sources", None)
                out["API_Sources"] = json.dumps(srcs, sort_keys=True) if srcs else None
            out_rows.append(out)
            new_fields.update(k for k in out if k not in names and k != "API_Sources")
        cols = names + sorted(new_fields) + (
            ["API_Sources"] if "API_Sources" not in names else []
        )
        arrays = {}
        for c in cols:
            if c in names and c not in self.fillable:
                arrays[c] = pa.array([r.get(c) for r in out_rows])
            else:
                # every fillable/chain-added field surfaces as a nullable
                # string column — a string fill into a numeric input column
                # must not mix types inside one array
                arrays[c] = pa.array(
                    [None if is_blank(r.get(c)) else str(r.get(c)) for r in out_rows],
                    type=pa.string(),
                )
        return pa.table(arrays)


def enrich_missing_ids(
    ds: "Any",
    candidate_factory: Callable[[], CandidateFn],
    *,
    concurrency: int = 4,
    batch_size: int = 512,
    **cols: Any,
) -> "Any":
    """Convenience wrapper: actor-pool enrichment over a Dataset. Lookup
    latency dominates, so concurrency should be sized to the external
    service's rate limit, not the CPU count."""
    return ds.map_batches(
        EnrichStage,
        fn_constructor_kwargs={"candidate_factory": candidate_factory, **cols},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
