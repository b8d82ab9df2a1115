"""Temporal operators the Dataset API lacks: as-of join, tumbling windows.

Custom-operator recipe (a) from the brief: compose map_batches + broadcast /
partial aggregation when semantics allow. The as-of join broadcasts the
build side (orders) as per-key sorted timestamp arrays — a lookup index built
once via ``ray.put`` — and probes it vectorized per batch with searchsorted;
the documented partitioning assumption is that the build side's per-key index
fits one node (at 100 TB: hash-partition both sides on the key and run the
same probe per partition — the cogroup variant).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from bibexpy_ray.pipelines.tables import read_table


def asof_join_events_orders(sf_dir: str) -> pd.DataFrame:
    """For each event: the customer's latest order at-or-before the event time
    (inner as-of join). Matches DuckDB ``ASOF JOIN`` semantics.
    """
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
