"""Driver union-find vs distributed min-label propagation equivalence."""

import numpy as np
import pandas as pd
import ray.data as rd

from bibexpy_ray.stages.unionfind import clusters_distributed, clusters_driver


def _random_edges(n_nodes: int, n_edges: int, seed: int) -> list[tuple[str, str]]:
    rng = np.random.default_rng(seed)
    a = rng.integers(0, n_nodes, n_edges)
    b = rng.integers(0, n_nodes, n_edges)
    return [(f"n{x:05d}", f"n{y:05d}") for x, y in zip(a, b) if x != y]


def test_distributed_matches_driver():
    edges = _random_edges(500, 400, seed=3)
    expect = clusters_driver(edges)
    ds = rd.from_pandas(
        pd.DataFrame({"id_a": [a for a, _ in edges], "id_b": [b for _, b in edges]})
    )
    labels = clusters_distributed(ds).to_pandas()
    got = dict(zip(labels["image_id"], labels["cluster_id"]))
    assert got == expect


def test_distributed_chain_component():
    # a long path graph stresses the propagation round count (O(log n) rounds)
    edges = [(f"c{i:04d}", f"c{i+1:04d}") for i in range(200)]
    expect = clusters_driver(edges)
    ds = rd.from_pandas(
        pd.DataFrame({"id_a": [a for a, _ in edges], "id_b": [b for _, b in edges]})
    )
    labels = clusters_distributed(ds).to_pandas()
    got = dict(zip(labels["image_id"], labels["cluster_id"]))
    assert got == expect
    assert set(got.values()) == {"c0000"}
