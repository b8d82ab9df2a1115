"""Unit tests for the fused two-hop pair join (stages/shuffle.attach_pair_both):
compressed and uncompressed slices must agree, missing keys must drop on both
hops, carry columns survive, and degenerate inputs yield the output schema."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from bibexpy_ray.stages.shuffle import attach_pair_both

OUT_SCHEMA = pa.schema(
    [
        ("id_a", pa.int64()),
        ("id_b", pa.int64()),
        ("text_a", pa.string()),
        ("text_b", pa.string()),
    ]
)


def _make_identity_reduce():
    # defined as a nested function so cloudpickle ships it by VALUE (test
    # modules are not importable on Ray workers)
    schema = OUT_SCHEMA

    def identity_reduce(joined: pa.Table) -> pa.Table:
        return joined.select(["id_a", "id_b", "text_a", "text_b"]).cast(schema)

    return identity_reduce


def _side(n=50):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                # large enough that every split slice crosses the _pack
                # threshold — the zstd branch must actually run in these tests
                "text": pa.array([f"document number {i} " * 400 for i in range(n)]),
                "extra": pa.array(np.arange(n, dtype=np.int64) * 7),
            }
        )
    )


def _pairs(n=50):
    ids = np.arange(n - 1, dtype=np.int64)
    return rd.from_arrow(
        pa.table({"id_a": pa.array(ids), "id_b": pa.array(ids + 1)})
    )


def _run(pairs, side, compress, **kw):
    out = attach_pair_both(
        pairs,
        side,
        "doc_id",
        {"text": "text"},
        _make_identity_reduce(),
        empty_like=OUT_SCHEMA.empty_table(),
        num_partitions=4,
        compress=compress,
        **kw,
    ).to_pandas()
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def test_compressed_equals_uncompressed(ray_session):
    a = _run(_pairs(), _side(), compress=True)
    b = _run(_pairs(), _side(), compress=False)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == 49
    assert a.loc[0, "text_a"].startswith("document number 0")
    assert a.loc[0, "text_b"].startswith("document number 1")


def test_missing_keys_drop_both_hops(ray_session):
    # id 999 absent from the side table on the a-end; id -5 on the b-end
    pairs = rd.from_arrow(
        pa.table(
            {
                "id_a": pa.array([0, 999, 3], type=pa.int64()),
                "id_b": pa.array([1, 2, -5], type=pa.int64()),
            }
        )
    )
    out = _run(pairs, _side(), compress=True)
    assert out[["id_a", "id_b"]].values.tolist() == [[0, 1]]


def test_rows_per_block_and_p2(ray_session):
    out = _run(
        _pairs(), _side(), compress=True, num_partitions_b=7, rows_per_block=5
    )
    base = _run(_pairs(), _side(), compress=False)
    pd.testing.assert_frame_equal(out, base)


def test_empty_pairs_yield_output_schema(ray_session):
    empty_pairs = rd.from_arrow(
        pa.table(
            {
                "id_a": pa.array([], type=pa.int64()),
                "id_b": pa.array([], type=pa.int64()),
            }
        )
    )
    out = attach_pair_both(
        empty_pairs,
        _side(),
        "doc_id",
        {"text": "text"},
        _make_identity_reduce(),
        empty_like=OUT_SCHEMA.empty_table(),
        num_partitions=4,
    )
    assert out.count() == 0
    assert set(out.schema().names) == {"id_a", "id_b", "text_a", "text_b"}
