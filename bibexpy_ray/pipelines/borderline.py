"""Borderline decision lifecycle: queue → human decisions → idempotent apply.

Reimplements the reference's borderline workflow semantics
(/root/reference/apps/api/services/smart_merger.py:543-569 queue state,
:834-989 list/decide): uncertain pairs (similarity in the borderline band) are
never auto-merged; decisions arrive as an external JSON map
``{"id_a|id_b": "accept" | "reject"}``; applying decisions is idempotent and
re-checks the determinative-authority negative rule at apply time (the
reference's retro DOI-conflict guard, :850-854, 918-924) — a pair whose sides
carry *different* authority ids is never merged even if a stale decision says
accept.
"""

from __future__ import annotations

import json
import os

import pandas as pd

from bibexpy_ray.pipelines.dedup_images import DedupResult
from bibexpy_ray.schema import authority_of
from bibexpy_ray.stages.unionfind import clusters_driver


def pair_key(id_a: str, id_b: str) -> str:
    lo, hi = sorted((id_a, id_b))
    return f"{lo}|{hi}"


def save_decisions(decisions: dict[str, str], path: str) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(decisions, f, indent=2, sort_keys=True)
    os.replace(tmp, path)


def load_decisions(path: str) -> dict[str, str]:
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)


def authority_conflict(id_a: str, id_b: str) -> bool:
    """Retro negative-rule check (DOI-conflict analog): both sides carry an
    authority id and they differ → the pair can never merge."""
    a, b = authority_of(id_a), authority_of(id_b)
    return a is not None and b is not None and a != b


def apply_decisions(result: DedupResult, decisions: dict[str, str]) -> DedupResult:
    """Merge accepted borderline pairs into the cluster map (idempotent).

    Rebuilds connected components over (existing intra-cluster edges +
    accepted borderline edges) so transitive accepts compose; conflicting
    authority ids veto an accept; rejected/undecided pairs stay unmerged and
    are removed from / kept in the queue respectively.
    """
    accepted: list[tuple[str, str]] = []
    decided_keys: set[str] = set()
    for _, row in result.borderline.iterrows():
        key = pair_key(row["id_a"], row["id_b"])
        decision = decisions.get(key)
        if decision is None:
            continue
        decided_keys.add(key)
        if decision == "accept" and not authority_conflict(row["id_a"], row["id_b"]):
            accepted.append((row["id_a"], row["id_b"]))

    edges = [(m, c) for m, c in result.cluster_map.items()] + accepted
    cluster_map = clusters_driver(edges)

    remaining = result.borderline[
        [
            pair_key(a, b) not in decided_keys
            for a, b in zip(result.borderline["id_a"], result.borderline["id_b"])
        ]
    ].reset_index(drop=True)

    # clusters table rebuilt lazily by callers that need survivor selection;
    # here we carry the updated map + queue (the audit trail is append-only)
    import numpy as np
    import ray.data as rd

    from bibexpy_ray.pipelines.dedup_images import ClusterLabels

    labels = ClusterLabels(
        members=np.array(list(cluster_map.keys()), dtype=object),
        canon=np.array(list(cluster_map.values()), dtype=object),
    )
    return DedupResult(
        clusters_ds=result.clusters_ds,
        labels=labels,
        borderline_ds=rd.from_pandas(remaining)
        if len(remaining)
        else result.borderline_ds.limit(0),
        audit_ds=result.audit_ds,
        metrics={**result.metrics, "accepted_borderline": len(accepted)},
    )
