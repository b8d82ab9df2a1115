"""Exact-dup edges must never require a driver collect: the loser anti-join
scale path and the distributed-CC exact-edge union must equal the default
(bounded-broadcast / driver-CC) paths on an exact-dup-carrying corpus."""

import ray.data as rd

from bibexpy_ray import synth
from bibexpy_ray.config import DedupConfig
from bibexpy_ray.pipelines import dedup_images as di

N_ROWS = 192  # 16 cohorts — carries exact-dup cohorts


def _cluster_sets(result):
    out = {}
    for m, c in result.cluster_map.items():
        out.setdefault(c, set()).add(m)
    return {frozenset(v) for v in out.values()}


def _run(monkeypatch, **attrs):
    table = synth.CorpusGen(42).rows(range(N_ROWS))
    ds = rd.from_arrow(table)
    for k, v in attrs.items():
        monkeypatch.setattr(di, k, v)
    return di.dedup_images(ds, DedupConfig())


def test_loser_antijoin_matches_broadcast(monkeypatch):
    base = _run(monkeypatch)
    assert base.metrics["exact_edges"] > 0  # the path under test is exercised
    anti = _run(monkeypatch, LOSER_BROADCAST_LIMIT=0)  # force the anti-join
    assert anti.metrics["exact_edges"] == base.metrics["exact_edges"]
    assert _cluster_sets(anti) == _cluster_sets(base)
    assert sorted(
        map(tuple, anti.borderline[["id_a", "id_b"]].to_numpy())
    ) == sorted(map(tuple, base.borderline[["id_a", "id_b"]].to_numpy()))


def test_distributed_cc_unions_exact_edge_dataset(monkeypatch):
    base = _run(monkeypatch)
    assert base.metrics["exact_edges"] > 0
    # force BOTH scale paths at once: exact losers anti-join AND the
    # distributed min-label CC fed by the exact-edge Dataset union
    dist = _run(monkeypatch, LOSER_BROADCAST_LIMIT=0, DRIVER_EDGE_LIMIT=0)
    assert _cluster_sets(dist) == _cluster_sets(base)
    assert dist.metrics["clusters"] == base.metrics["clusters"]


def test_canonical_scale_path_matches_broadcast(monkeypatch):
    """canonical()'s loser filter must produce identical rows on the
    broadcast path (driver-CC labels, uid-sorted arrays) and the scale path
    (distributed-CC labels, two co-partition anti passes over the raw-task
    shuffle — Dataset.join is banned here, it deadlocks small clusters)."""
    table = synth.CorpusGen(42).rows(range(N_ROWS))

    def canon_pairs(result):
        df = result.canonical(
            rd.from_arrow(table).drop_columns(["bytes"])
        ).to_pandas()
        return sorted(zip(df["image_id"], df["cluster_id"]))

    base = _run(monkeypatch)
    assert base.labels.is_broadcast
    pairs_b = canon_pairs(base)
    dist = _run(monkeypatch, LOSER_BROADCAST_LIMIT=0, DRIVER_EDGE_LIMIT=0)
    assert not dist.labels.is_broadcast  # the path under test
    assert canon_pairs(dist) == pairs_b


def test_cc_gate_counts_auto_edges_not_all_verified(monkeypatch):
    """The DRIVER_EDGE_LIMIT gate must count the edges CC consumes (auto +
    exact), NOT the whole verified table — borderline rows never enter CC.
    A 2M-row scaling run measured borderline at 4x the auto count; gating on
    n_verified routed a driver-sized job to the distributed path (150 s at
    8 CPUs for a seconds-sized CC). Limit is set between (auto + exact) and
    (verified + exact): the driver path must run (s_uf_collect lap present)."""
    base = _run(monkeypatch)
    n_auto = base.metrics["verified_auto"]
    n_exact = base.metrics["exact_edges"]
    n_verified = n_auto + base.metrics["borderline"]
    assert n_verified > n_auto  # corpus carries borderline rows
    limit = n_auto + n_exact + (n_verified - n_auto) // 2
    gated = _run(monkeypatch, DRIVER_EDGE_LIMIT=limit)
    assert "s_uf_collect" in gated.metrics  # driver-CC branch, not distributed
    assert _cluster_sets(gated) == _cluster_sets(base)
