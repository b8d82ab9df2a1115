"""Manual hash shuffle: split-by-partition map tasks + one reduce per part.

Ray Data's ``groupby(key).map_groups`` is a sort-based shuffle: it samples,
range-partitions and globally sorts — serial coordination that costs seconds
per execution regardless of CPU count (measured: 2.2x the wall of this
operator on a 2.7M-row pair table, and the gap grows with row count). When
the grouping key is already a coarse partition id in ``[0, P)``, none of that
machinery is needed: one task per input block splits its rows by partition id
(single argsort), one task per partition concatenates its slices and applies
the per-partition function. This is recipe (c) from the brief — raw Ray tasks
where the Dataset API's operator is semantically right but structurally
wasteful — and the partitioning assumption is explicit: ``part_col`` holds
ints in ``[0, num_partitions)`` and one partition's rows fit one worker
(the same assumption every ``groupby(_part).map_groups`` call here makes).

At multi-node scale the split outputs are exactly a shuffle's map-side
partition files (B x P small objects); Ray's object store handles locality
and spill. Inputs should be materialized datasets (ids/signatures — bytes
never ride through these shuffles).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def hash_partition_apply(
    ds: rd.Dataset,
    num_partitions: int,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    part_col: str = "_part",
    key_fn: Callable[[pa.Table], "np.ndarray"] | None = None,
    rows_per_block: int | None = None,
    empty_like: pd.DataFrame | None = None,
    arrow: bool = False,
) -> rd.Dataset:
    """Apply ``fn`` once per hash partition (``part_col`` in [0, P)).

    Equivalent to ``ds.groupby(part_col).map_groups(fn)`` with ``part_col``
    dropped before ``fn`` — proven by tests/test_unionfind.py's shuffle
    equivalence test — but with no global sort. Returns a Dataset built from
    the reduce outputs (deterministic partition order).

    ``key_fn`` (optional) computes the partition-id array from each block
    INSIDE the split task — fusing the tagging map into the shuffle's map side
    saves a full extra pass + object-store copy of the input. When given,
    ``part_col`` need not exist in the input.

    ``rows_per_block`` (optional) splits each reduce output into blocks of at
    most that many rows (dynamic returns) — use when P is sized for shuffle
    economy (few, large partitions) but a downstream task-pool map needs more
    blocks than P to keep all CPUs busy.

    ``arrow`` (optional): when True, ``fn`` receives and returns a
    ``pa.Table`` — no pandas hop in the reduce, so nested Arrow types
    (fixed_size_list signatures) survive the shuffle intact. Per-group input
    blocks with differing schemas concat with null promotion, exactly like
    the pandas mode.

    ``empty_like`` (optional) is a ZERO-ROW exemplar of fn's output schema.
    Degenerate inputs (zero blocks, or only schema-less zero-row blocks from
    upstream map_batches whose UDF never ran) then still produce a dataset
    with the right columns instead of leaking pre-shuffle columns — pass it
    whenever the result feeds a union / column selection.
    """
    P = int(num_partitions)
    blocks = ds.to_arrow_refs()
    if not blocks and empty_like is not None:
        return rd.from_pandas(empty_like)
    if not blocks:
        # a zero-block input must still yield fn's OUTPUT schema (returning
        # the input dataset would leak pre-shuffle columns downstream): run
        # fn once on an empty schema-correct frame (every reducer here is
        # empty-safe — the reduce tasks call fn on empty partitions too)
        schema = ds.schema(fetch_if_missing=True)
        if schema is None:
            return ds
        try:
            empty = pa.schema(
                list(zip(schema.names, schema.types))
            ).empty_table().to_pandas()
        except (pa.ArrowInvalid, pa.ArrowTypeError, TypeError):
            # pandas-backed schema (numpy dtypes): object-dtype empties are
            # fine for the vectorized reducers used here
            empty = pd.DataFrame({n: pd.Series([], dtype=object) for n in schema.names})
        if part_col in empty.columns:
            empty = empty.drop(columns=[part_col])
        return rd.from_pandas(fn(empty))
    # ship the callables ONCE via the object store; the remote functions are
    # module-level (exported to each worker once per session), so a pipeline
    # that runs several shuffles pays no per-invocation function-export cost
    # (defining @ray.remote closures inside this call measured ~0.3-0.5 s of
    # fixed driver/GCS time per shuffle, flat across data sizes)
    fn_ref = ray.put(fn)
    key_ref = ray.put(key_fn)
    empty_ref = ray.put(empty_like)
    # coalesce fragmented upstream blocks into a bounded number of split
    # tasks: the shuffle creates (#splits x P) objects, and B tracks upstream
    # read/map parallelism — at high CPU counts thousands of tiny map-side
    # slices cost more in scheduling + concat than the split work itself.
    # ~2 split waves per CPU keeps every core busy while bounding B.
    cpus = max(1, int(ray.cluster_resources().get("CPU", 4)))
    max_splits = max(16, 2 * cpus)
    if len(blocks) > max_splits:
        per = -(-len(blocks) // max_splits)
        groups = [blocks[i : i + per] for i in range(0, len(blocks), per)]
    else:
        groups = [[b] for b in blocks]
    splits = [
        _split_task.options(num_returns=P).remote(P, part_col, key_ref, *g)
        for g in groups
    ]
    if rows_per_block is None:
        reduced = [
            _reduce_task.remote(
                fn_ref, part_col, empty_ref, arrow, *[s[i] for s in splits]
            )
            for i in range(P)
        ]
        return rd.from_arrow_refs(reduced)
    gens = [
        _reduce_split_task.remote(
            fn_ref, part_col, rows_per_block, empty_ref, arrow, *[s[i] for s in splits]
        )
        for i in range(P)
    ]
    reduced = [ref for g in ray.get(gens) for ref in g]
    return rd.from_arrow_refs(reduced)


@ray.remote
def _split_task(P, part_col, key_fn, *tbls):
    tbls = [
        pa.Table.from_pandas(t, preserve_index=False)
        # to_arrow_refs hands back raw pandas blocks from pandas-format
        # upstream stages (including zero-row UDF passthroughs)
        if isinstance(t, pd.DataFrame)
        else t
        for t in tbls
    ]
    widest = max(tbls, key=lambda t: t.num_columns)
    tbl = (
        pa.concat_tables(
            [t for t in tbls if t.num_rows], promote_options="default"
        )
        if any(t.num_rows for t in tbls)
        else widest
    )
    has_col = part_col in tbl.schema.names
    if tbl.num_rows == 0 or (key_fn is None and not has_col):
        # zero-row blocks pass through upstream map_batches without the
        # UDF running (so part_col may be absent, schema possibly empty)
        empty = tbl.slice(0, 0)
        return tuple(empty for _ in range(P))
    if key_fn is not None:
        part = np.asarray(key_fn(tbl))
    else:
        part = tbl.column(part_col).to_numpy(zero_copy_only=False)
    order = np.argsort(part, kind="stable")
    st = tbl.take(pa.array(order)).combine_chunks()
    sp = part[order]
    bounds = np.searchsorted(sp, np.arange(P + 1))
    return tuple(
        st.slice(bounds[i], bounds[i + 1] - bounds[i]) for i in range(P)
    )


def _reduce_impl(fn, part_col, parts, empty_like=None, arrow=False) -> pa.Table:
    non_empty = [p for p in parts if p.num_rows]
    tbl = (
        pa.concat_tables(non_empty, promote_options="default")
        if non_empty
        # widest empty slice keeps the real input schema (schema-less
        # empties can coexist with it — see _split_task's passthrough)
        else max(parts, key=lambda p: p.num_columns)
    )
    if tbl.num_columns == 0:
        # all inputs were schema-less empties (upstream UDF never ran)
        if isinstance(empty_like, pa.Table):
            return empty_like  # exact Arrow schema (large_string etc.)
        if empty_like is not None:
            return pa.Table.from_pandas(empty_like, preserve_index=False)
        return tbl
    if arrow:
        if part_col in tbl.schema.names:
            tbl = tbl.drop_columns([part_col])
        return fn(tbl)
    df = tbl.to_pandas()
    if part_col in df.columns:
        df = df.drop(columns=[part_col])
    out = fn(df)
    return pa.Table.from_pandas(out, preserve_index=False)


@ray.remote
def _reduce_task(fn, part_col, empty_like, arrow, *parts: pa.Table) -> pa.Table:
    return _reduce_impl(fn, part_col, parts, empty_like, arrow)


@ray.remote(num_returns="dynamic")
def _reduce_split_task(fn, part_col, rows_per_block, empty_like, arrow, *parts: pa.Table):
    out = _reduce_impl(fn, part_col, parts, empty_like, arrow)
    if out.num_rows <= rows_per_block:
        yield out
        return
    for lo in range(0, out.num_rows, rows_per_block):
        # compact each slice's buffers so serialized blocks don't drag the
        # whole partition's arrays along: pandas hop in the default mode,
        # identity-take (fresh allocations, Arrow types intact) in arrow mode
        sl = out.slice(lo, rows_per_block)
        if arrow:
            import numpy as np

            yield sl.take(pa.array(np.arange(sl.num_rows, dtype=np.int64)))
        else:
            yield pa.Table.from_pandas(sl.to_pandas(), preserve_index=False)


def attach_pair_side(
    probe: rd.Dataset,
    side: rd.Dataset,
    key: str,
    side_key: str,
    payload: dict[str, str],
    num_partitions: int,
    carry_cols: list[str],
    empty_like: pa.Table,
    rows_per_block: int | None = None,
) -> rd.Dataset:
    """Attach ``payload`` columns from ``side`` to ``probe`` rows on ``key``.

    The co-partition replacement for ``Dataset.join`` on pair streams
    (semantics reimplemented, NOT copied — reference joins in pandas,
    /root/reference/apps/api/services/merger.py): ``Dataset.join`` reserves an
    aggregator ACTOR pool sized by num_partitions, which cannot schedule on
    small clusters (measured deadlock, BASELINE.md round 3), and its pandas
    hop promotes int columns with nulls to float64. Here both sides ride ONE
    raw-task hash shuffle (``hash_partition_apply``, arrow mode — exact
    types) and meet in a vectorized sorted-probe reduce.

    - ``probe``: pair stream; ``key`` ("id_a"/"id_b") is an integer column.
    - ``side``: lookup table with ``side_key`` + the ``payload`` source cols;
      payload maps source column → output column (e.g. text → text_a).
    - ``carry_cols``: probe columns preserved in the output (in order).
    - ``empty_like``: zero-row exemplar of the OUTPUT schema (reduce output
      for empty partitions and the zero-block input case).
    - Inner-join semantics with an exact-match guard: probe rows whose key is
      absent from ``side`` drop (never join a colliding row's payload).
    """
    import pyarrow.compute as pc

    from bibexpy_ray.functions import hashing as _hashing

    P = int(num_partitions)

    def side_prep(t: pa.Table) -> pa.Table:
        cols: dict = {key: t.column(side_key)}
        for src, dst in payload.items():
            cols[dst] = t.column(src)
        cols["_side"] = pa.array(np.ones(t.num_rows, dtype=bool))
        return pa.table(cols)

    tagged = side.map_batches(side_prep, batch_format="pyarrow")

    def key_fn(t: pa.Table) -> np.ndarray:
        u = t.column(key).to_numpy(zero_copy_only=False).astype(np.uint64)
        return (_hashing.splitmix64(u) % np.uint64(P)).astype(np.int32)

    out_payload = list(payload.values())

    def reduce(part: pa.Table) -> pa.Table:
        if part.num_rows == 0 or "_side" not in part.schema.names:
            return empty_like
        is_side = pc.fill_null(part.column("_side"), False)
        feat = part.filter(is_side)
        rows = part.filter(pc.invert(is_side))
        if feat.num_rows == 0 or rows.num_rows == 0:
            return empty_like
        fk = feat.column(key).to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.argsort(fk)
        feat = feat.take(pa.array(order)).combine_chunks()
        fk = fk[order]
        p = rows.column(key).to_numpy(zero_copy_only=False).astype(np.uint64)
        idx = np.minimum(np.searchsorted(fk, p), len(fk) - 1)
        ok = fk[idx] == p
        rows = rows.filter(pa.array(ok))
        taken = feat.take(pa.array(idx[ok]))
        cols = {c: rows.column(c) for c in carry_cols}
        for dst in out_payload:
            cols[dst] = taken.column(dst)
        return pa.table(cols)

    return hash_partition_apply(
        probe.union(tagged),
        P,
        reduce,
        key_fn=key_fn,
        arrow=True,
        rows_per_block=rows_per_block,
        empty_like=empty_like,
    )
