"""Survivor selection: one canonical row per cluster, richest metadata first.

The reference picks per-field winners with fixed source preferences
(merge_pair_with_preferences, /root/reference/apps/api/services/smart_merger.py:388-458).
For image+caption clusters the BASELINE "richest metadata" rule is a
deterministic priority (SURVEY.md §2.5 Phase-4 row):

  1. most non-empty fields,
  2. lossless format preferred (png before jpeg — the WoS-priority analog:
     the cleaner source wins),
  3. lowest image_id (order-free tiebreak).

Survivor choice uses *metadata only* — image bytes never enter this shuffle;
the canonical table is produced by filtering the original dataset against the
(small) loser-id set broadcast via ``ray.put``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_FMT_PRIORITY = {"png": 0, "jpeg": 1, "jpg": 1}


def survivor_rank(df: pd.DataFrame) -> pd.Series:
    """Lower rank wins. Columns required: image_id, fmt, caption."""
    non_empty = (
        df["caption"].fillna("").astype(str).str.len().gt(0).astype(int)
        + df["image_id"].astype(str).str.len().gt(0).astype(int)
    )
    fmt_rank = df["fmt"].map(_FMT_PRIORITY).fillna(2).astype(int)
    return pd.Series(
        list(zip(-non_empty.to_numpy(), fmt_rank.to_numpy(), df["image_id"].to_numpy())),
        index=df.index,
    )


def select_survivors(members: pd.DataFrame) -> pd.DataFrame:
    """Per-cluster map_groups: emit one row (cluster_id, survivor_id, size, members).

    ``members`` carries (cluster_id, image_id, fmt, caption).
    """
    rank = survivor_rank(members)
    winner = members.loc[rank.idxmin()]
    member_ids = sorted(members["image_id"].tolist())
    return pd.DataFrame(
        {
            "cluster_id": [members["cluster_id"].iloc[0]],
            "survivor_id": [winner["image_id"]],
            "cluster_size": [len(members)],
            "members": ["|".join(member_ids)],
        }
    )


def survivors_partition(part: pd.DataFrame, rank_fn=None) -> pd.DataFrame:
    """Vectorized survivor selection over a whole hash partition of cluster
    members (many clusters per call — avoids Ray's and pandas' per-group
    overhead when clusters number in the millions).

    Equivalent to ``select_survivors`` per cluster: sort members by the
    survivor rank within cluster, take the first per cluster.

    ``rank_fn`` is the extension surface (SURVEY §2.14): a callable
    ``part -> pd.DataFrame`` of rank columns aligned with ``part`` — lower
    sorts first, column order is significance order. ``image_id`` is always
    appended as the order-free tiebreak. The callable ships in the task
    closure, so no registry is needed on the workers.
    """
    if len(part) == 0:
        return pd.DataFrame(
            {
                "cluster_id": pd.Series([], dtype=object),
                "survivor_id": pd.Series([], dtype=object),
                "cluster_size": pd.Series([], dtype=np.int64),
                "members": pd.Series([], dtype=object),
            }
        )
    if rank_fn is not None:
        ranks = rank_fn(part)
    else:
        non_empty = (
            part["caption"].fillna("").astype(str).str.len().gt(0).astype(int)
            + part["image_id"].astype(str).str.len().gt(0).astype(int)
        )
        ranks = pd.DataFrame(
            {
                "_ne": -non_empty,
                "_fr": part["fmt"].map(_FMT_PRIORITY).fillna(2).astype(int),
            },
            index=part.index,
        )
    rank_cols = [f"_rk{i}" for i in range(ranks.shape[1])]
    ranked = part.assign(
        **{c: ranks.iloc[:, i] for i, c in enumerate(rank_cols)}
    ).sort_values(["cluster_id", *rank_cols, "image_id"], kind="mergesort")
    winners = ranked.drop_duplicates(subset=["cluster_id"], keep="first")
    # member-list aggregation without a per-cluster Python "|".join call:
    # one segment scan over the (cluster_id, image_id) sort + Arrow's C++
    # binary_join over a list array (the same size-class idea as the pair
    # emitters — all clusters in the partition handled in one kernel)
    import pyarrow as pa
    import pyarrow.compute as pc

    by_id = part.sort_values(["cluster_id", "image_id"], kind="mergesort")
    cl = by_id["cluster_id"].to_numpy()
    ids = by_id["image_id"].to_numpy()
    starts = np.flatnonzero(np.r_[True, cl[1:] != cl[:-1]])
    offsets = np.r_[starts, len(cl)].astype(np.int32)
    members = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(offsets), pa.array(ids, type=pa.string())),
        "|",
    ).to_numpy(zero_copy_only=False)
    # winners and the segment scan are both in ascending cluster_id order
    return pd.DataFrame(
        {
            "cluster_id": cl[starts],
            "survivor_id": winners["image_id"].to_numpy(dtype=object),
            "cluster_size": np.diff(offsets).astype(np.int64),
            "members": members,
        }
    )
