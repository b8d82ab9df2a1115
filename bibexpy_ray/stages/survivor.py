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
