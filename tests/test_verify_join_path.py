"""The verify stage's hash-join scale path must equal the broadcast path."""

import pytest
import ray.data as rd

from bibexpy_ray import synth
from bibexpy_ray.config import DedupConfig
from bibexpy_ray.pipelines import dedup_images as di

N_ROWS = 96  # 8 cohorts


def _cluster_sets(result):
    out = {}
    for m, c in result.cluster_map.items():
        out.setdefault(c, set()).add(m)
    return {frozenset(v) for v in out.values()}


def test_join_path_matches_broadcast(monkeypatch):
    table = synth.CorpusGen(42).rows(range(N_ROWS))
    ds = rd.from_arrow(table)
    broadcast = di.dedup_images(ds, DedupConfig())
    monkeypatch.setattr(di, "BROADCAST_LIMIT", 1)  # force the join path
    joined = di.dedup_images(ds, DedupConfig())
    assert _cluster_sets(joined) == _cluster_sets(broadcast)
    assert sorted(
        map(tuple, joined.borderline[["id_a", "id_b"]].to_numpy())
    ) == sorted(map(tuple, broadcast.borderline[["id_a", "id_b"]].to_numpy()))
