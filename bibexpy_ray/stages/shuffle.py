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
    compress: bool = False,
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

    ``compress`` (opt-in): split-side slices above the ``_pack`` threshold
    ride as zstd-compressed Arrow IPC buffers. Turn it on for TEXT-heavy
    shuffles (survivor members, incremental expansion, containment captions)
    where it shrinks object-store bytes — and their spill I/O — ~3x. Leave
    it off for int-dominated streams (pair tables, bucket rows, union-find
    labels): those barely compress, and the extra serialize/compress/
    decompress memory passes measurably HURT on DRAM-bandwidth-limited
    hosts (4M-row flagship, 8 CPUs: candidate stages ~2x slower with
    blanket compression; tools/membw_probe.py quantifies the wall).

    ``empty_like`` (optional) is a ZERO-ROW exemplar of fn's output schema.
    Degenerate inputs (zero blocks, or only schema-less zero-row blocks from
    upstream map_batches whose UDF never ran) then still produce a dataset
    with the right columns instead of leaking pre-shuffle columns — pass it
    whenever the result feeds a union / column selection.
    """
    P = int(num_partitions)
    blocks = ds.to_arrow_refs()
    if not blocks and empty_like is not None:
        if isinstance(empty_like, pa.Table):
            return rd.from_arrow(empty_like)
        return rd.from_pandas(empty_like)
    if not blocks:
        # a zero-block input must still yield fn's OUTPUT schema (returning
        # the input dataset would leak pre-shuffle columns downstream): run
        # fn once on an empty schema-correct frame (every reducer here is
        # empty-safe — the reduce tasks call fn on empty partitions too)
        schema = ds.schema(fetch_if_missing=True)
        if schema is None:
            return ds
        empty = _empty_input(schema.names, schema.types, part_col, arrow)
        if arrow:
            return rd.from_arrow(fn(empty))
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
        _split_task.options(num_returns=P).remote(P, part_col, key_ref, compress, *g)
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


def _empty_input(names, types, part_col, arrow):
    """Build fn's zero-row input for the zero-block degenerate path.

    Arrow mode builds the table straight from the schema — an
    arrow->pandas->arrow hop degrades nested types (fixed_size_list<int32,4>
    becomes null), and preserving exactly those types is arrow mode's point.
    """
    try:
        tbl = pa.schema(list(zip(names, types))).empty_table()
    except (pa.ArrowInvalid, pa.ArrowTypeError, TypeError):
        # pandas-backed schema (numpy dtypes) — no nested Arrow types to
        # preserve; object-dtype empties are fine for the reducers here
        tbl = pa.Table.from_pandas(
            pd.DataFrame({n: pd.Series([], dtype=object) for n in names}),
            preserve_index=False,
        )
    if part_col in tbl.schema.names:
        tbl = tbl.drop_columns([part_col])
    return tbl if arrow else tbl.to_pandas()


@ray.remote
def _split_task(P, part_col, key_fn, compress, *tbls):
    # to_arrow_refs hands back raw pandas blocks from pandas-format
    # upstream stages (including zero-row UDF passthroughs)
    tbls = _as_tables(tbls)
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
    return _split_by(tbl, part, P, compress)


def _reduce_impl(fn, part_col, parts, empty_like=None, arrow=False) -> pa.Table:
    parts = [_unpack(p) for p in parts]
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


def _pack(tbl: pa.Table, compress: bool):
    """Optionally serialize a slice to zstd-compressed Arrow IPC bytes.

    Shuffle slices carrying text payloads dominate the object store (and its
    disk spill) at scale; zstd cuts caption-bearing slices ~3x for a CPU cost
    far below the spill I/O it avoids. Tiny slices skip compression — the IPC
    framing would exceed the saving."""
    if not compress or tbl.nbytes < 65536:
        return tbl
    sink = pa.BufferOutputStream()
    opts = pa.ipc.IpcWriteOptions(compression="zstd")
    with pa.ipc.new_stream(sink, tbl.schema, options=opts) as w:
        w.write_table(tbl)
    return sink.getvalue()


def _unpack(obj) -> pa.Table:
    if isinstance(obj, pa.Table):
        return obj
    return pa.ipc.open_stream(obj).read_all()


def _as_tables(objs) -> list[pa.Table]:
    out = []
    for t in objs:
        if isinstance(t, pd.DataFrame):
            t = pa.Table.from_pandas(t, preserve_index=False)
        else:
            t = _unpack(t)
        out.append(t)
    return out


def _concat_parts(parts: list[pa.Table]) -> pa.Table:
    non_empty = [p for p in parts if p.num_rows]
    if non_empty:
        return pa.concat_tables(non_empty, promote_options="default")
    return max(parts, key=lambda p: p.num_columns)


def _sorted_probe_attach(
    probe: pa.Table,
    feat: pa.Table,
    key: str,
    carry_cols: list[str],
    payload_cols: list[str],
) -> pa.Table | None:
    """Inner-join ``payload_cols`` from ``feat`` onto ``probe`` rows on ``key``.

    Vectorized sorted-probe with an exact-match guard (a probe key absent from
    the feature side drops — never join a colliding row's payload). Returns
    None when either side is empty."""
    if feat.num_rows == 0 or probe.num_rows == 0:
        return None
    fk = feat.column(key).to_numpy(zero_copy_only=False).astype(np.uint64)
    order = np.argsort(fk)
    feat = feat.take(pa.array(order)).combine_chunks()
    fk = fk[order]
    p = probe.column(key).to_numpy(zero_copy_only=False).astype(np.uint64)
    idx = np.minimum(np.searchsorted(fk, p), len(fk) - 1)
    ok = fk[idx] == p
    if not ok.all():
        probe = probe.filter(pa.array(ok))
        idx = idx[ok]
    if probe.num_rows == 0:
        return None
    taken = feat.take(pa.array(idx))
    cols = {c: probe.column(c) for c in carry_cols}
    for c in payload_cols:
        cols[c] = taken.column(c)
    return pa.table(cols)


def attach_pair_both(
    pairs: rd.Dataset,
    side: rd.Dataset,
    side_key: str,
    payload: dict[str, str],
    reduce_fn: Callable[[pa.Table], pa.Table],
    empty_like: pa.Table,
    num_partitions: int,
    num_partitions_b: int | None = None,
    carry_cols: tuple[str, ...] = (),
    rows_per_block: int | None = None,
    compress: bool = True,
) -> rd.Dataset:
    """Fused two-hop pair join: attach ``payload`` from ``side`` to BOTH ends
    of a pair stream, then apply ``reduce_fn`` to the joined rows — without
    ever storing the half- or fully-joined pair table.

    The two chained ``attach_pair_side`` calls this replaces each materialize
    an O(pairs x payload) table in the object store (the measured 4M-row spill
    driver, BASELINE.md round 4). Here hop A's reduce attaches the a-side
    payload and RE-PARTITIONS its output by ``id_b`` in the same task
    (``num_returns=P2``), and hop B's reduce attaches the b-side payload and
    immediately applies ``reduce_fn`` (e.g. the edge verifier), so only its —
    typically tiny — output is stored. Intermediate slices are optionally
    zstd-compressed (``compress``), cutting text-bearing shuffle bytes ~3x.

    - ``pairs``: columns ``id_a``, ``id_b`` (integer keys) + ``carry_cols``.
    - ``side``: lookup table with ``side_key`` + the ``payload`` source cols;
      payload maps source column -> base output name (suffixed ``_a``/``_b``).
    - ``reduce_fn`` receives a pa.Table with ``id_a``, ``id_b``, carry cols and
      every payload column in both suffixes; returns a pa.Table. It runs once
      per hop-B partition — size ``num_partitions_b`` for task granularity.
    - ``empty_like``: zero-row exemplar of ``reduce_fn``'s OUTPUT schema.
    - Inner-join semantics with an exact-match guard on both hops.
    """
    P1 = int(num_partitions)
    P2 = int(num_partitions_b or num_partitions)
    pair_blocks = pairs.to_arrow_refs()
    side_blocks = side.to_arrow_refs()
    if not pair_blocks or not side_blocks:
        return rd.from_arrow(empty_like)
    payload_ref = ray.put(dict(payload))
    fn_ref = ray.put(reduce_fn)
    empty_ref = ray.put(empty_like)
    carry = list(carry_cols)

    cpus = max(1, int(ray.cluster_resources().get("CPU", 4)))
    max_splits = max(16, 2 * cpus)

    def _group(blocks):
        if len(blocks) > max_splits:
            per = -(-len(blocks) // max_splits)
            return [blocks[i : i + per] for i in range(0, len(blocks), per)]
        return [[b] for b in blocks]

    # pair splits are (id_a, id_b) int streams — never worth compressing
    # (see hash_partition_apply's compress note); the side/hop-A slices
    # carry the text payload and are where compression pays
    pair_splits = [
        _pair_split.options(num_returns=P1).remote(P1, False, *g)
        for g in _group(pair_blocks)
    ]
    side_a_splits = [
        _side_split.options(num_returns=P1).remote(
            P1, side_key, payload_ref, "_a", compress, *g
        )
        for g in _group(side_blocks)
    ]
    side_b_splits = [
        _side_split.options(num_returns=P2).remote(
            P2, side_key, payload_ref, "_b", compress, *g
        )
        for g in _group(side_blocks)
    ]
    hop_a = [
        _attach_a_task.options(num_returns=P2).remote(
            P2,
            payload_ref,
            tuple(carry),
            compress,
            len(pair_splits),
            *[s[i] for s in pair_splits],
            *[s[i] for s in side_a_splits],
        )
        for i in range(P1)
    ]
    if rows_per_block is None:
        reduced = [
            _attach_b_task.remote(
                fn_ref,
                payload_ref,
                tuple(carry),
                empty_ref,
                len(hop_a),
                *[h[q] for h in hop_a],
                *[s[q] for s in side_b_splits],
            )
            for q in range(P2)
        ]
        return rd.from_arrow_refs(reduced)
    gens = [
        _attach_b_split_task.remote(
            fn_ref,
            payload_ref,
            tuple(carry),
            empty_ref,
            rows_per_block,
            len(hop_a),
            *[h[q] for h in hop_a],
            *[s[q] for s in side_b_splits],
        )
        for q in range(P2)
    ]
    reduced = [ref for g in ray.get(gens) for ref in g]
    return rd.from_arrow_refs(reduced)


def _hash_part(vals: np.ndarray, P: int) -> np.ndarray:
    from bibexpy_ray.functions import hashing as _hashing

    return (_hashing.splitmix64(vals.astype(np.uint64)) % np.uint64(P)).astype(
        np.int32
    )


def _split_by(tbl: pa.Table, part: np.ndarray, P: int, compress: bool):
    order = np.argsort(part, kind="stable")
    st = tbl.take(pa.array(order)).combine_chunks()
    sp = part[order]
    bounds = np.searchsorted(sp, np.arange(P + 1))
    return tuple(
        _pack(st.slice(bounds[i], bounds[i + 1] - bounds[i]), compress)
        for i in range(P)
    )


@ray.remote
def _pair_split(P, compress, *tbls):
    tbls = _as_tables(tbls)
    tbl = _concat_parts(tbls)
    if tbl.num_rows == 0 or "id_a" not in tbl.schema.names:
        empty = tbl.slice(0, 0)
        return tuple(empty for _ in range(P))
    part = _hash_part(
        tbl.column("id_a").to_numpy(zero_copy_only=False), P
    )
    return _split_by(tbl, part, P, compress)


@ray.remote
def _side_split(P, side_key, payload, suffix, compress, *tbls):
    tbls = _as_tables(tbls)
    tbl = _concat_parts(tbls)
    if tbl.num_rows == 0 or side_key not in tbl.schema.names:
        empty = pa.table({})
        return tuple(empty for _ in range(P))
    cols = {"_k": tbl.column(side_key)}
    for src, dst in payload.items():
        cols[dst + suffix] = tbl.column(src)
    tbl = pa.table(cols)
    part = _hash_part(tbl.column("_k").to_numpy(zero_copy_only=False), P)
    return _split_by(tbl, part, P, compress)


@ray.remote
def _attach_a_task(P2, payload, carry, compress, n_pair, *slices):
    pair_parts = _as_tables(slices[:n_pair])
    feat_parts = _as_tables(slices[n_pair:])
    probe = _concat_parts(pair_parts)
    feat = _concat_parts(feat_parts)
    out_payload = [dst + "_a" for dst in payload.values()]
    if (
        probe.num_rows == 0
        or feat.num_rows == 0
        or "id_a" not in probe.schema.names
        or "_k" not in feat.schema.names
    ):
        return tuple(pa.table({}) for _ in range(P2))
    feat = feat.rename_columns(["id_a", *out_payload])
    joined = _sorted_probe_attach(
        probe, feat, "id_a", ["id_a", "id_b", *carry], out_payload
    )
    if joined is None:
        return tuple(pa.table({}) for _ in range(P2))
    part = _hash_part(
        joined.column("id_b").to_numpy(zero_copy_only=False), P2
    )
    return _split_by(joined, part, P2, compress)


def _attach_b_impl(fn, payload, carry, empty_like, n_hop, slices) -> pa.Table:
    hop_parts = [t for t in _as_tables(slices[:n_hop]) if t.num_columns]
    feat_parts = [t for t in _as_tables(slices[n_hop:]) if t.num_columns]
    if not hop_parts or not feat_parts:
        return empty_like
    probe = _concat_parts(hop_parts)
    feat = _concat_parts(feat_parts)
    if probe.num_rows == 0 or feat.num_rows == 0:
        return empty_like
    out_a = [dst + "_a" for dst in payload.values()]
    out_b = [dst + "_b" for dst in payload.values()]
    feat = feat.rename_columns(["id_b", *out_b])
    joined = _sorted_probe_attach(
        probe, feat, "id_b", ["id_a", "id_b", *carry, *out_a], out_b
    )
    if joined is None:
        return empty_like
    return fn(joined)


@ray.remote
def _attach_b_task(fn, payload, carry, empty_like, n_hop, *slices) -> pa.Table:
    return _attach_b_impl(fn, payload, carry, empty_like, n_hop, slices)


@ray.remote(num_returns="dynamic")
def _attach_b_split_task(
    fn, payload, carry, empty_like, rows_per_block, n_hop, *slices
):
    out = _attach_b_impl(fn, payload, carry, empty_like, n_hop, slices)
    if out.num_rows <= rows_per_block:
        yield out
        return
    for lo in range(0, out.num_rows, rows_per_block):
        sl = out.slice(lo, rows_per_block)
        yield sl.take(pa.array(np.arange(sl.num_rows, dtype=np.int64)))
