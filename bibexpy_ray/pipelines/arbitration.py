"""Tier-2 arbitration: judge-in-the-loop review of uncertain entity blocks.

Semantics reimplemented (NOT copied) from the reference's tier-2 LLM
arbitration — /root/reference/apps/api/services/disambiguation/pipeline.py:
327-431 (ORCID-first gate, per-block judge consult, response cache,
label round-trip) and deepseek_client.py:20-127 (JSON-mode chat client +
system-prompt contract). The reference flow per uncertain block:

  1. authority pre-pass (ORCID): 'merge' → Tier-1 proposal without the
     judge; 'conflict' → distinct people, never merged; 'unknown' → step 2.
  2. label every VARIANT v1..vN (variant level, not member level — the
     reference found member-level labels get sub-indexed by the model,
     pipeline.py:71-99), send {task, candidates} to the judge, map returned
     member_ids back through the label table, drop clusters that merge <2
     distinct variants.
  3. responses are cached by canonical-JSON payload hash so a re-run never
     re-consults the judge (cache.py:16-51 → our state/payload_cache).

The reference's judge is a network LLM (DeepSeek chat completions). No
network exists in this environment, so the judge here is PLUGGABLE:

  * ``HeuristicJudge`` (default): deterministic offline arbiter over the
    same payload/verdict contract — greedy single-link on Jaro-Winkler with
    a context-overlap bonus, confidence = min pairwise JW, the prompt's
    "only merge at confidence ≥ 0.7" rule enforced verbatim.
  * ``ChatJudge``: the reference client's exact shape (system prompt +
    canonical-JSON user payload → ``response_format: json_object`` →
    parse ``choices[0].message.content``) over an INJECTED transport, with
    the same 3-attempt retry policy as our enrichment client. The
    real-network factory is gated exactly like ``enrich.requests_transport``.

Ray-side shape (100 TB): arbitration is an ACTOR-POOL ``map_batches`` over
block rows — the judge and its sqlite ``PayloadCache`` are opened once per
actor in ``__init__``, blocks stream through ``__call__``; nothing is
collected on the driver. Block rows are tiny (ids + variant strings), so the
stage shuffles no payloads; the expensive part (the judge consult) is
cache-deduplicated across actors AND across runs by payload hash.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any, Callable

import numpy as np
import pandas as pd

from bibexpy_ray.functions.similarity import jaro_winkler
from bibexpy_ray.pipelines.entity import classify_by_authority_sets
from bibexpy_ray.state.payload_cache import PayloadCache, payload_key

# ---------------------------------------------------------------------------
# Judge contract (deepseek_client.py:81-127 — prompt semantics restated, not
# copied; the schema below is what both judges return / parse)
# ---------------------------------------------------------------------------

#: System prompt for entity (author-style) arbitration. Contract: the judge
#: receives {"task": "...", "candidates": [{"id": "vN", "name": variant,
#: **context}]} and must return
#: {"clusters": [{"cluster_id", "member_ids": ["vN", ...],
#:   "confidence": 0..1, "reason"}], "uncertain": [{"id", "reason"}]}
#: using ONLY the provided vN labels, merging only at confidence ≥ 0.7.
ENTITY_JUDGE_SYSTEM = (
    "You are a data-quality arbiter. Decide which of the labelled candidate "
    "variants denote the SAME entity, using name similarity and any provided "
    "context (affiliations, coauthors, year_range). Respond with JSON only: "
    '{"clusters": [{"cluster_id": "c1", "member_ids": ["v1"], '
    '"confidence": 0.0, "reason": ""}], "uncertain": [{"id": "v2", '
    '"reason": ""}]} — use the EXACT candidate ids given; only merge at '
    "confidence >= 0.7."
)

#: System prompt for split arbitration (same spelling, disjoint fields):
#: payload {"task": "entity_split", "name", "records": [{"id", "fields"}]};
#: verdict {"decision": "split"|"keep", "confidence", "reason"}.
SPLIT_JUDGE_SYSTEM = (
    "You are a data-quality arbiter. Decide whether records sharing one name "
    "spelling belong to DIFFERENT entities (disjoint research fields -> "
    'split) or one entity (overlapping fields -> keep). JSON only: '
    '{"decision": "split", "confidence": 0.0, "reason": ""}.'
)

#: Merge floor from the prompt contract ("only place decisions with
#: confidence>=0.7 into the same cluster").
MIN_MERGE_CONFIDENCE = 0.7

# Judge: callable(system_prompt, payload) -> verdict dict.
Judge = Callable[[str, dict], dict]


# ---------------------------------------------------------------------------
# Label round-trip (pipeline.py:57-113 semantics)
# ---------------------------------------------------------------------------


def label_variants(
    members: list[dict],
    variant_key: str = "name_variants",
    context_keys: tuple = (),
) -> tuple[list[dict], dict[str, str]]:
    """Label every VARIANT v1..vN for the judge payload.

    Variant-level labelling (not member-level): the reference observed the
    model sub-indexing multi-variant members ('v1_10') when labels were per
    member, breaking the response mapping (pipeline.py:71-99). One label per
    variant makes the verdict map back 1:1. Returns (payload items,
    {label -> raw variant string}).
    """
    text_field = "name" if variant_key == "name_variants" else "text"
    items: list[dict] = []
    by_label: dict[str, str] = {}
    n = 0
    for m in members:
        vs = m.get(variant_key) or ([m["id"]] if m.get("id") else [])
        ctx = {k: m[k] for k in context_keys if m.get(k)}
        for v in vs:
            if not v:
                continue
            n += 1
            label = f"v{n}"
            items.append({"id": label, text_field: v, **ctx})
            by_label[label] = v
    return items, by_label


def members_from_labels(
    cluster: dict, by_label: dict[str, str], variant_key: str = "name_variants"
) -> list[dict]:
    """Map a verdict's member_ids (vN labels) back to real variant strings,
    one member per distinct variant; unknown labels fall back to the raw
    string (pipeline.py:101-113)."""
    out: list[dict] = []
    seen: set[str] = set()
    for mid in cluster.get("member_ids") or []:
        v = by_label.get(str(mid).strip(), str(mid))
        if not v or v in seen:
            continue
        seen.add(v)
        out.append({"id": v, variant_key: [v]})
    return out


def distinct_variants(cluster: dict) -> set[str]:
    """Set of distinct variant strings a cluster merges; < 2 means there is
    nothing to merge and the proposal is dropped (pipeline.py:57-69,419)."""
    out: set[str] = set()
    for m in cluster.get("members", []):
        vs = m.get("name_variants") or m.get("variants") or (
            [m["id"]] if m.get("id") else []
        )
        out.update(v for v in vs if v)
    return out


# ---------------------------------------------------------------------------
# Deterministic offline judge
# ---------------------------------------------------------------------------

#: Pure-name link threshold (greedy single-link).
LINK_JW = 0.90
#: Link threshold when two candidates share a context token (coauthor /
#: affiliation overlap is a strong signal in the reference's prompt).
CONTEXT_LINK_JW = 0.84
#: Below this best-similarity a candidate is reported in ``uncertain``.
UNCERTAIN_FLOOR = 0.75


def _context_tokens(item: dict) -> set[str]:
    toks: set[str] = set()
    for k in ("affiliations", "coauthors", "year_range"):
        v = item.get(k)
        if v is None:
            continue
        vals = v if isinstance(v, (list, tuple)) else [v]
        toks.update(str(x).strip().lower() for x in vals if str(x).strip())
    return toks


class HeuristicJudge:
    """Deterministic offline arbiter over the judge contract.

    Stands in for the reference's network LLM (deepseek_client.py) — same
    payload in, same verdict schema out, bit-stable across calls/processes:
    greedy single-link union on JW ≥ 0.90 (or ≥ 0.84 with shared context),
    cluster confidence = min pairwise JW, merges below the contract's 0.7
    floor are demoted to ``uncertain``.
    """

    def __init__(self) -> None:
        self.calls = 0  # consult count (tests assert cache short-circuits)

    def __call__(self, system: str, payload: dict) -> dict:
        self.calls += 1
        task = payload.get("task", "")
        if task == "entity_split":
            return self._judge_split(payload)
        return self._judge_clusters(payload)

    # -- author_disambiguation-style payloads ------------------------------
    def _judge_clusters(self, payload: dict) -> dict:
        items = payload.get("candidates") or []
        n = len(items)
        texts = [str(it.get("name") or it.get("text") or "") for it in items]
        norm = [" ".join(t.lower().split()) for t in texts]
        ctx = [_context_tokens(it) for it in items]
        # greedy single-link in payload order (deterministic)
        parent = list(range(n))

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        sim = np.ones((n, n))
        for i in range(n):
            for j in range(i + 1, n):
                s = jaro_winkler(norm[i], norm[j])
                sim[i, j] = sim[j, i] = s
                thr = CONTEXT_LINK_JW if ctx[i] & ctx[j] else LINK_JW
                if s >= thr:
                    ri, rj = find(i), find(j)
                    if ri != rj:
                        parent[max(ri, rj)] = min(ri, rj)
        groups: dict[int, list[int]] = {}
        for i in range(n):
            groups.setdefault(find(i), []).append(i)
        clusters, uncertain = [], []
        c = 0
        for root in sorted(groups):
            idx = groups[root]
            if len(idx) < 2:
                i = idx[0]
                best = max((sim[i, j] for j in range(n) if j != i), default=0.0)
                if UNCERTAIN_FLOOR <= best:
                    uncertain.append(
                        {
                            "id": items[i]["id"],
                            "reason": f"best similarity {best:.2f} below link threshold",
                        }
                    )
                continue
            conf = min(sim[i, j] for i in idx for j in idx if i < j)
            if conf < MIN_MERGE_CONFIDENCE:
                # contract: never merge below 0.7 — report instead
                for i in idx:
                    uncertain.append(
                        {
                            "id": items[i]["id"],
                            "reason": f"cluster confidence {conf:.2f} < {MIN_MERGE_CONFIDENCE}",
                        }
                    )
                continue
            c += 1
            clusters.append(
                {
                    "cluster_id": f"c{c}",
                    "member_ids": [items[i]["id"] for i in idx],
                    "confidence": round(float(conf), 4),
                    "reason": "name similarity"
                    + (" + shared context" if any(ctx[i] for i in idx) else ""),
                }
            )
        return {"clusters": clusters, "uncertain": uncertain}

    # -- entity_split payloads ---------------------------------------------
    def _judge_split(self, payload: dict) -> dict:
        records = payload.get("records") or []
        fields = [set(map(str, r.get("fields") or [])) for r in records]
        known = [f for f in fields if f]
        if len(known) < 2:
            return {"decision": "keep", "confidence": 0.5, "reason": "insufficient field data"}
        # pairwise max Jaccard between field sets: fully disjoint -> split
        best = 0.0
        for i in range(len(known)):
            for j in range(i + 1, len(known)):
                inter = len(known[i] & known[j])
                union = len(known[i] | known[j])
                if union:
                    best = max(best, inter / union)
        if best == 0.0:
            return {
                "decision": "split",
                "confidence": 0.9,
                "reason": "field sets fully disjoint",
            }
        return {
            "decision": "keep",
            "confidence": round(0.5 + best / 2, 4),
            "reason": f"field overlap jaccard {best:.2f}",
        }


# ---------------------------------------------------------------------------
# Network judge shape (transport-injected; no real network in this sandbox)
# ---------------------------------------------------------------------------


class JudgeError(Exception):
    pass


@dataclass
class ChatResponse:
    """Minimal response the chat transport returns."""

    status_code: int
    body: Any = None
    headers: dict = field(default_factory=dict)

    @property
    def ok(self) -> bool:
        return 200 <= self.status_code < 400


# ChatTransport: callable(url, json_body, timeout) -> ChatResponse
ChatTransport = Callable[..., ChatResponse]


def requests_chat_transport() -> ChatTransport:  # pragma: no cover - env
    """Real-network POST transport (unavailable here — inject a fake)."""
    try:
        import requests  # noqa: F401
    except ImportError as exc:
        raise RuntimeError(
            "no network/requests in this environment; pass transport= explicitly"
        ) from exc

    def _call(url: str, json_body: dict, timeout: float = 60.0) -> ChatResponse:
        import requests

        r = requests.post(url, json=json_body, timeout=timeout)
        return ChatResponse(r.status_code, r.json() if r.content else None)

    return _call


class ChatJudge:
    """JSON-mode chat-completions judge (deepseek_client.py:20-58 shape).

    Body: {model, messages: [system, user=canonical-JSON payload],
    response_format: json_object, temperature: 0}; verdict parsed from
    ``choices[0].message.content``. Retries transient statuses (429/503)
    up to 3 attempts with exponential backoff, mirroring the reference's
    api_utils retry policy (reimplemented at sources/enrich.py:101-135).
    """

    RETRY_STATUSES = (429, 503)
    ATTEMPTS = 3

    def __init__(
        self,
        transport: ChatTransport,
        *,
        base_url: str = "https://judge.invalid",
        model: str = "chat-judge",
        sleep: Callable[[float], None] | None = None,
    ) -> None:
        self.transport = transport
        self.url = base_url.rstrip("/") + "/chat/completions"
        self.model = model
        self._sleep = sleep if sleep is not None else __import__("time").sleep

    def __call__(self, system: str, payload: dict) -> dict:
        body = {
            "model": self.model,
            "messages": [
                {"role": "system", "content": system},
                {
                    "role": "user",
                    "content": json.dumps(payload, sort_keys=True, ensure_ascii=False),
                },
            ],
            "response_format": {"type": "json_object"},
            "temperature": 0.0,
        }
        last: ChatResponse | None = None
        for attempt in range(self.ATTEMPTS):
            r = self.transport(self.url, body, timeout=60.0)
            last = r
            if r.status_code in self.RETRY_STATUSES:
                self._sleep(min(float(2**attempt), 8.0))
                continue
            if not r.ok:
                raise JudgeError(f"judge HTTP {r.status_code}")
            try:
                content = r.body["choices"][0]["message"]["content"]
                return json.loads(content)
            except (KeyError, IndexError, TypeError, json.JSONDecodeError) as exc:
                raise JudgeError(f"unparseable judge response: {exc}") from exc
        raise JudgeError(f"judge retries exhausted (HTTP {last.status_code if last else '?'})")


# ---------------------------------------------------------------------------
# Actor-pool arbitration stage
# ---------------------------------------------------------------------------

#: Output schema of the arbitration stage.
PROPOSAL_COLUMNS = [
    "block_key",
    "cluster_id",
    "members",
    "canonical",
    "confidence",
    "source",
    "tier",
    "reason",
]


def _empty_proposals() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "block_key": pd.Series([], dtype=object),
            "cluster_id": pd.Series([], dtype=object),
            "members": pd.Series([], dtype=object),
            "canonical": pd.Series([], dtype=object),
            "confidence": pd.Series([], dtype=np.float64),
            "source": pd.Series([], dtype=object),
            "tier": pd.Series([], dtype=np.int64),
            "reason": pd.Series([], dtype=object),
        }
    )


class ArbitrationStage:
    """Per-actor judge + cache; tier-2 block rows stream through ``__call__``.

    Input rows: (block_key: str, members_json: str) — members_json a JSON
    list of member dicts ({id, name_variants?, authority_ids?, affiliations?,
    coauthors?, year_range?}). Per block (pipeline.py:327-431 order):

      1. authority pre-pass: 'merge' → Tier-1 proposal (confidence 1.0,
         source='authority'), no judge; 'conflict' → one uncertain row
         (source='authority_conflict', tier 3), no judge — the authoritative
         id overrides similarity in BOTH directions;
      2. otherwise consult the judge through the payload-hash cache; map the
         verdict's labels back to variants; drop clusters merging < 2
         distinct variants; emit proposal + uncertain rows.

    State (judge instance, sqlite cache connection) is built ONCE per actor
    here in ``__init__`` — never per batch.
    """

    def __init__(
        self,
        judge_factory: Callable[[], Judge] | None = None,
        cache_path: str | None = None,
        variant_key: str = "name_variants",
        context_keys: tuple = ("affiliations", "coauthors", "year_range"),
        system_prompt: str = ENTITY_JUDGE_SYSTEM,
    ) -> None:
        self.judge: Judge = (judge_factory or HeuristicJudge)()
        self.cache = PayloadCache(cache_path) if cache_path else None
        self.variant_key = variant_key
        self.context_keys = context_keys
        self.system_prompt = system_prompt

    def _consult(self, payload: dict) -> dict:
        if self.cache is not None:
            key = payload_key(payload)
            hit = self.cache.get(key)
            if hit is not None:
                return hit
        verdict = self.judge(self.system_prompt, payload)
        if self.cache is not None:
            self.cache.put(key, verdict)
        return verdict

    def _arbitrate_block(self, block_key: str, members: list[dict]) -> list[dict]:
        rows: list[dict] = []
        id_sets = [
            {str(x) for x in (m.get("authority_ids") or []) if str(x).strip()}
            for m in members
        ]
        decision = classify_by_authority_sets(id_sets)
        all_variants = sorted(
            {
                v
                for m in members
                for v in (m.get(self.variant_key) or ([m["id"]] if m.get("id") else []))
                if v
            }
        )
        if decision == "merge":
            if len(all_variants) >= 2:
                shared = sorted(set.union(*[s for s in id_sets if s]))
                rows.append(
                    {
                        "block_key": block_key,
                        "cluster_id": f"{block_key}__authority",
                        "members": "|".join(all_variants),
                        "canonical": all_variants[0],
                        "confidence": 1.0,
                        "source": "authority",
                        "tier": 1,
                        "reason": f"shared authority id ({', '.join(shared[:3])})",
                    }
                )
            return rows
        if decision == "conflict":
            rows.append(
                {
                    "block_key": block_key,
                    "cluster_id": f"{block_key}__conflict",
                    "members": "|".join(all_variants),
                    "canonical": "",
                    "confidence": 1.0,
                    "source": "authority_conflict",
                    "tier": 3,
                    "reason": "disjoint authority ids — distinct entities",
                }
            )
            return rows
        # unknown → judge
        items, by_label = label_variants(members, self.variant_key, self.context_keys)
        if len(items) < 2:
            return rows
        payload = {"task": "entity_disambiguation", "candidates": items}
        verdict = self._consult(payload)
        for c in verdict.get("clusters", []):
            mem = members_from_labels(c, by_label, self.variant_key)
            vs = sorted(distinct_variants({"members": mem}))
            if len(vs) < 2:
                continue  # single variant — nothing to merge (pipeline.py:419)
            rows.append(
                {
                    "block_key": block_key,
                    "cluster_id": f"{block_key}__{c.get('cluster_id', 'c')}",
                    "members": "|".join(vs),
                    "canonical": vs[0],
                    "confidence": float(c.get("confidence", 0.0)),
                    "source": "judge",
                    "tier": 2,
                    "reason": str(c.get("reason", "")),
                }
            )
        for u in verdict.get("uncertain", []):
            v = by_label.get(str(u.get("id", "")).strip(), str(u.get("id", "")))
            rows.append(
                {
                    "block_key": block_key,
                    "cluster_id": f"{block_key}__uncertain_{u.get('id', '')}",
                    "members": v,
                    "canonical": "",
                    "confidence": 0.0,
                    "source": "judge_uncertain",
                    "tier": 3,
                    "reason": str(u.get("reason", "")),
                }
            )
        return rows

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        rows: list[dict] = []
        for bk, mj in zip(batch["block_key"], batch["members_json"]):
            rows.extend(self._arbitrate_block(str(bk), json.loads(mj)))
        if not rows:
            return _empty_proposals()
        out = pd.DataFrame(rows, columns=PROPOSAL_COLUMNS)
        out["confidence"] = out["confidence"].astype(np.float64)
        out["tier"] = out["tier"].astype(np.int64)
        return out


def arbitrate_blocks(
    blocks,
    *,
    judge_factory: Callable[[], Judge] | None = None,
    cache_path: str | None = None,
    variant_key: str = "name_variants",
    concurrency: int = 4,
):
    """Run tier-2 arbitration over a Dataset of (block_key, members_json)
    rows as an actor pool; returns the proposal Dataset. Blocks are tiny
    (ids + variants), so batches can be large; the judge consult dominates
    and is deduplicated by the payload cache across actors and runs."""
    fn_kwargs = {
        "judge_factory": judge_factory,
        "cache_path": cache_path,
        "variant_key": variant_key,
    }
    return blocks.map_batches(
        ArbitrationStage,
        fn_constructor_kwargs=fn_kwargs,
        batch_format="pandas",
        batch_size=256,
        concurrency=concurrency,
    )


# ---------------------------------------------------------------------------
# Query: arbitrate uncertain name blocks (rows-only; the heuristic judge is
# deterministic, so output is stable across runs and parallelism)
# ---------------------------------------------------------------------------


def _edit_name(name: str, seed: int, heavy: bool) -> str:
    """Deterministic spelling variant: transpose (light) or replace a span
    (heavy) at a hash-chosen position. Pure function of (name, seed)."""
    if len(name) < 6:
        return name + "x"
    pos = 1 + (seed % (len(name) - 4))
    if heavy:
        # replace a 3-char span — pushes JW below the judge's link window
        sub = "".join(chr(ord("a") + ((seed >> (3 * k)) % 26)) for k in range(3))
        return name[:pos] + sub + name[pos + 3 :]
    return name[:pos] + name[pos + 1] + name[pos] + name[pos + 2 :]


def _arbitration_blocks(batch: pd.DataFrame) -> pd.DataFrame:
    """Synthesize one uncertain block per customer, deterministically from
    c_custkey (the same convention as the synthetic image/audio corpora:
    testdata-derived, no external data). Four block shapes, keyed by
    custkey % 4, cover every tier-2 decision path:

      0 → two variants sharing an authority id   (authority merge, no judge)
      1 → two variants with disjoint authority ids (conflict, no judge)
      2 → light spelling edits                    (judge merges)
      3 → one heavy edit                          (judge uncertain / split)
    """
    rows = []
    for key, name in zip(batch["c_custkey"], batch["c_name"]):
        k = int(key)
        name = str(name)
        kind = k % 4
        light = _edit_name(name, k, heavy=False)
        if kind == 0:
            members = [
                {"id": name, "name_variants": [name], "authority_ids": [f"A{k}"]},
                {"id": light, "name_variants": [light], "authority_ids": [f"A{k}"]},
            ]
        elif kind == 1:
            members = [
                {"id": name, "name_variants": [name], "authority_ids": [f"A{k}"]},
                {"id": light, "name_variants": [light], "authority_ids": [f"B{k}"]},
            ]
        elif kind == 2:
            other = _edit_name(name, k + 7, heavy=False)
            members = [
                {"id": name, "name_variants": [name]},
                {"id": light, "name_variants": [light]},
                {"id": other, "name_variants": [other]},
            ]
        else:
            heavy = _edit_name(name, k, heavy=True)
            members = [
                {"id": name, "name_variants": [name]},
                {"id": heavy, "name_variants": [heavy]},
            ]
        rows.append({"block_key": name, "members_json": json.dumps(members)})
    return pd.DataFrame(rows, columns=["block_key", "members_json"])


def customer_arbitration(sf_dir: str) -> pd.DataFrame:
    """Uncertain name blocks derived deterministically from the customer
    table, arbitrated by the deterministic offline judge through the full
    tier-2 flow (authority gate → judge → label round-trip). Rows-only query
    (the judge verdict is not SQL-expressible)."""
    from bibexpy_ray.pipelines.tables import read_table

    import ray

    ds = read_table(sf_dir, "customer", ["c_custkey", "c_name"])
    blocks = ds.map_batches(_arbitration_blocks, batch_format="pandas")
    # leave headroom for the read tasks: an actor pool sized to the whole
    # cluster starves upstream tasks and deadlocks small CPU counts
    pool = max(1, int(ray.cluster_resources().get("CPU", 2)) // 2)
    out = arbitrate_blocks(
        blocks, judge_factory=HeuristicJudge, concurrency=min(4, pool)
    ).to_pandas()
    if out.empty:
        return _empty_proposals()
    return out.sort_values(["block_key", "cluster_id", "members"]).reset_index(
        drop=True
    )
