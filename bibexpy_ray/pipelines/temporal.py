"""Temporal operators the Dataset API lacks: as-of join, tumbling windows.

Custom-operator recipe (a) from the brief: compose map_batches + broadcast /
partial aggregation when semantics allow. The as-of join has two
equivalence-tested paths, dispatched on build-side size:

- **broadcast** (build side ≤ ``ASOF_BROADCAST_LIMIT`` rows): per-key sorted
  timestamp arrays built once on the driver, shipped via ``ray.put``, probed
  vectorized per batch with searchsorted.
- **cogroup** (the 100-TB path): hash-partition BOTH sides on the join key
  into a bounded number of parts, union with a side tag, then one vectorized
  merge pass per partition (lexsort + reset-aware forward-max) — no driver
  index, nothing broadcast; the only shuffle is the single groupby on the
  coarse partition id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from bibexpy_ray.pipelines.tables import read_table

#: build-side rows above which the as-of join switches from the broadcast
#: index to the cogrouped merge (driver index memory ∝ build rows)
ASOF_BROADCAST_LIMIT = 2_000_000


def asof_join_events_orders(sf_dir: str) -> pd.DataFrame:
    """For each event: the customer's latest order at-or-before the event time
    (inner as-of join). Matches DuckDB ``ASOF JOIN`` semantics. Dispatches to
    the cogrouped path when the build side exceeds ``ASOF_BROADCAST_LIMIT``.
    """
    n_orders = read_table(sf_dir, "orders", ["o_orderkey"]).count()
    if n_orders > ASOF_BROADCAST_LIMIT:
        return asof_join_cogroup(sf_dir)
    orders = read_table(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).to_pandas()
    orders = orders.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
    index: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    for ck, g in orders.groupby("o_custkey"):
        ts = g["o_orderdate"].astype("datetime64[us]").astype(np.int64).to_numpy()
        # ties on o_orderdate: ASOF picks one row per probe; make it the max
        # orderkey at that timestamp (deterministic, matches ORDER BY below)
        keys = g["o_orderkey"].to_numpy(dtype=np.int64)
        index[int(ck)] = (ts, keys)
    ref = ray.put(index)

    events = read_table(sf_dir, "events", ["event_id", "user_id", "ts"])

    def probe(batch: pd.DataFrame) -> pd.DataFrame:
        idx = ray.get(ref)
        ets = batch["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
        uid = batch["user_id"].to_numpy(dtype=np.int64)
        eid = batch["event_id"].to_numpy(dtype=np.int64)
        out_e, out_o = [], []
        # probe grouped by user so each user's searchsorted is one vector op
        order = np.argsort(uid, kind="mergesort")
        i = 0
        while i < len(order):
            j = i
            u = uid[order[i]]
            while j < len(order) and uid[order[j]] == u:
                j += 1
            entry = idx.get(int(u))
            if entry is not None:
                ts_arr, key_arr = entry
                sel = order[i:j]
                pos = np.searchsorted(ts_arr, ets[sel], side="right") - 1
                ok = pos >= 0
                out_e.append(eid[sel][ok])
                out_o.append(key_arr[pos[ok]])
            i = j
        if not out_e:
            return pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype=np.int64),
                    "o_orderkey": pd.Series([], dtype=np.int64),
                }
            )
        return pd.DataFrame(
            {"event_id": np.concatenate(out_e), "o_orderkey": np.concatenate(out_o)}
        )

    out = events.map_batches(probe, batch_format="pandas").to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def asof_join_cogroup(sf_dir: str, n_parts: int = 64) -> pd.DataFrame:
    """Cogrouped as-of join: hash-partition both sides on the key, one
    vectorized merge pass per partition.

    Per partition: concatenate build (orders) and probe (events) rows, lexsort
    by (key, ts, is_probe, payload) so at equal (key, ts) build rows precede probes,
    take a running forward-max of build row positions, and invalidate carries
    across key boundaries by checking the carried position falls inside the
    current key's segment. Ties on ts resolve to the max ``o_orderkey``
    (build rows sub-sorted by orderkey), matching DuckDB's ``ASOF JOIN`` with
    the deterministic ORDER BY in the oracle. O(m log m) per partition, fully
    numpy — no Python loop over keys, no driver state.
    """
    orders = read_table(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    events = read_table(sf_dir, "events", ["event_id", "user_id", "ts"])

    def tag_orders(batch: pa.Table) -> pa.Table:
        key = batch.column("o_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = batch.column("o_orderdate").cast(pa.timestamp("us")).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        return pa.table(
            {
                "_part": pa.array((key % n_parts).astype(np.int32), type=pa.int32()),
                "key": pa.array(key),
                "ts_us": pa.array(ts),
                "payload": batch.column("o_orderkey").cast(pa.int64()),
                "is_probe": pa.array(np.zeros(len(key), dtype=bool)),
            }
        )

    def tag_events(batch: pa.Table) -> pa.Table:
        key = batch.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = batch.column("ts").cast(pa.timestamp("us")).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        return pa.table(
            {
                "_part": pa.array((key % n_parts).astype(np.int32), type=pa.int32()),
                "key": pa.array(key),
                "ts_us": pa.array(ts),
                "payload": batch.column("event_id").cast(pa.int64()),
                "is_probe": pa.array(np.ones(len(key), dtype=bool)),
            }
        )

    tagged = orders.map_batches(tag_orders, batch_format="pyarrow").union(
        events.map_batches(tag_events, batch_format="pyarrow")
    )

    def per_part(part: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "event_id": pd.Series([], dtype=np.int64),
                "o_orderkey": pd.Series([], dtype=np.int64),
            }
        )
        if not len(part):
            return empty
        key = part["key"].to_numpy(dtype=np.int64)
        ts = part["ts_us"].to_numpy(dtype=np.int64)
        payload = part["payload"].to_numpy(dtype=np.int64)
        is_probe = part["is_probe"].to_numpy(dtype=bool)
        # at equal (key, ts): builds first (is_probe before payload in the
        # lexsort, so a probe at exactly a build's ts matches it —
        # at-or-before semantics), and among equal-ts builds the max
        # orderkey sorts last so the forward-max picks it
        order = np.lexsort((payload, is_probe, ts, key))
        key, ts, payload, is_probe = (
            key[order],
            ts[order],
            payload[order],
            is_probe[order],
        )
        n = len(key)
        # running forward-max of build-row positions
        pos = np.where(~is_probe, np.arange(n), -1)
        acc = np.maximum.accumulate(pos)
        # invalidate carries across key boundaries: the carried build position
        # must sit inside the current row's key segment
        new_key = np.empty(n, dtype=bool)
        new_key[0] = True
        np.not_equal(key[1:], key[:-1], out=new_key[1:])
        seg_start = np.maximum.accumulate(np.where(new_key, np.arange(n), -1))
        valid = is_probe & (acc >= seg_start)
        out = pd.DataFrame(
            {"event_id": payload[valid], "o_orderkey": payload[acc[valid]]}
        )
        return out if len(out) else empty

    from bibexpy_ray.stages.shuffle import hash_partition_apply

    joined = hash_partition_apply(tagged, n_parts, per_part).to_pandas()
    return joined.sort_values("event_id").reset_index(drop=True)


def daily_event_counts(sf_dir: str) -> pd.DataFrame:
    """Tumbling 1-day window aggregate per event type: count + exact min/max.

    Partial aggregation per batch (combiner), tiny merge — the windowed
    aggregate from the brief with deterministic string day keys.
    """
    ds = read_table(sf_dir, "events", ["ts", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.strftime(batch.column("ts"), format="%Y-%m-%d")
        t = pa.table(
            {
                "day": day,
                "event_type": batch.column("event_type"),
                "value": batch.column("value"),
            }
        )
        g = t.group_by(["day", "event_type"]).aggregate(
            [("value", "count"), ("value", "min"), ("value", "max")]
        )
        return pa.table(
            {
                "day": g.column("day"),
                "event_type": g.column("event_type"),
                "n": g.column("value_count").cast(pa.int64()),
                "min_value": g.column("value_min"),
                "max_value": g.column("value_max"),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return (
        partials.groupby(["day", "event_type"], as_index=False)
        .agg(n=("n", "sum"), min_value=("min_value", "min"), max_value=("max_value", "max"))
        .sort_values(["day", "event_type"])
        .reset_index(drop=True)
    )
