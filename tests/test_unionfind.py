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


def test_clusters_driver_arrays_equivalent():
    """Vectorized array connected components == the dict union-find."""
    import random

    import numpy as np

    from bibexpy_ray.stages.unionfind import clusters_driver, clusters_driver_arrays

    rng = random.Random(5)
    for trial in range(10):
        n = rng.randint(2, 400)
        edges = [
            (f"id{rng.randrange(n):04d}", f"id{rng.randrange(n):04d}")
            for _ in range(rng.randint(1, 600))
        ]
        want = clusters_driver(edges)
        members, canon = clusters_driver_arrays(
            np.array([a for a, _ in edges], dtype=object),
            np.array([b for _, b in edges], dtype=object),
        )
        got = dict(zip(members, canon))
        assert got == want, trial
    m, c = clusters_driver_arrays(np.empty(0, object), np.empty(0, object))
    assert len(m) == 0 and len(c) == 0


def test_hash_partition_apply_zero_block_input_keeps_output_schema(ray_session):
    """A zero-block input must still produce fn's OUTPUT schema, not leak the
    pre-shuffle input columns downstream."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from bibexpy_ray.stages.shuffle import hash_partition_apply

    def reduce_fn(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "id_a": df["x"].astype("int64"),
                "id_b": df["x"].astype("int64"),
                "dropped": df["x"].astype("int64"),
            }
        )

    empty_like = reduce_fn(pd.DataFrame({"x": pd.Series([], dtype=np.int64)}))
    # a filtered empty dataset yields schema-LESS zero-row blocks (the
    # filter UDF never ran); the empty_like exemplar restores the contract
    src = rd.from_arrow(
        pa.table({"x": pa.array([], type=pa.int64()),
                  "_part": pa.array([], type=pa.int32())})
    ).filter(lambda r: True)
    out = hash_partition_apply(src, 4, reduce_fn, empty_like=empty_like)
    # Dataset-LEVEL schema is what unions / select_columns consume (Ray's
    # to_pandas drops columns on fully-empty datasets — upstream behavior)
    assert out.schema().names == ["id_a", "id_b", "dropped"]
    assert out.count() == 0
    # downstream ops that used to break on the leaked input schema now work
    assert out.select_columns(["id_a", "id_b"]).count() == 0
    assert out.union(rd.from_pandas(empty_like.assign(extra=1)[
        ["id_a", "id_b", "dropped"]])).count() == 0
    # schema-CORRECT empty input works even without the exemplar: the
    # reducer runs on an empty frame derived from the input schema
    src2 = rd.from_arrow(
        pa.table({"x": pa.array([], type=pa.int64()),
                  "_part": pa.array([], type=pa.int32())})
    )
    out2 = hash_partition_apply(src2, 4, reduce_fn)
    assert out2.schema().names == ["id_a", "id_b", "dropped"]
    assert out2.count() == 0
    # arrow mode without an exemplar: fn must still receive a pa.Table on
    # the zero-block degenerate path (not a pandas frame)
    def reduce_arrow(t: pa.Table) -> pa.Table:
        assert isinstance(t, pa.Table)
        return pa.table({"y": t.column("x")})

    out3 = hash_partition_apply(src2, 4, reduce_arrow, arrow=True)
    assert out3.schema().names == ["y"]
    assert out3.count() == 0
    # zero-block arrow mode must hand fn a table with NESTED types intact
    # (a pandas hop would degrade fixed_size_list<int32,4> to null); the
    # public API can't produce a zero-block dataset WITH a known schema in
    # this Ray version, so pin the helper the degenerate branch calls
    from bibexpy_ray.stages.shuffle import _empty_input

    fsl_t = pa.list_(pa.int32(), 4)
    names = ["sig", "u", "_part"]
    types = [fsl_t, pa.uint64(), pa.int32()]
    tbl = _empty_input(names, types, "_part", arrow=True)
    assert isinstance(tbl, pa.Table)
    assert tbl.schema.names == ["sig", "u"]
    assert tbl.schema.field("sig").type == fsl_t
    assert tbl.schema.field("u").type == pa.uint64()
    # type-dependent ops a reducer would run must work on the empty table
    assert len(tbl.column("sig").combine_chunks().flatten()) == 0
    df = _empty_input(names, types, "_part", arrow=False)
    assert isinstance(df, pd.DataFrame) and list(df.columns) == ["sig", "u"]


def test_hash_partition_apply_arrow_mode_preserves_types(ray_session):
    """arrow=True reduces must keep uint64 / fixed-size-list columns exact —
    no pandas hop, on both the plain and the rows_per_block paths."""
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data as rd

    from bibexpy_ray.stages.shuffle import hash_partition_apply

    n = 100
    # values above 2^53: a pandas float64 hop would corrupt them
    big = np.arange(n, dtype=np.uint64) + np.uint64(1 << 60)
    fsl = pa.FixedSizeListArray.from_arrays(
        pa.array(np.arange(n * 4, dtype=np.int32)), 4
    )
    src = rd.from_arrow(pa.table({"u": pa.array(big, type=pa.uint64()), "sig": fsl}))

    def key(t: pa.Table) -> np.ndarray:
        u = t.column("u").to_numpy(zero_copy_only=False).astype(np.uint64)
        return (u % np.uint64(4)).astype(np.int32)

    def ident(t: pa.Table) -> pa.Table:
        assert isinstance(t, pa.Table)  # arrow mode contract
        return t

    for rpb in (None, 16):
        out = hash_partition_apply(src, 4, ident, key_fn=key, arrow=True,
                                   rows_per_block=rpb)
        tbl = pa.concat_tables(ray.get(out.to_arrow_refs()))
        assert tbl.schema.field("u").type == pa.uint64()
        assert pa.types.is_fixed_size_list(tbl.schema.field("sig").type)
        got = np.sort(tbl.column("u").to_numpy(zero_copy_only=False).astype(np.uint64))
        assert (got == big).all()  # bit-exact above 2^53
