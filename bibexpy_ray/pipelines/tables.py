"""Table access + shared helpers for the query surface.

Readers prune at the source: every query passes ``columns=[...]`` to
``read_parquet`` so only needed columns leave storage (the 100 TB rule — a
read that loads all columns for a 2-column transform is wrong).

Numeric-stability convention for oracle-checked aggregates: monetary doubles
are converted to integer cents (``round(x*100) -> int64``) *before* summing, so
distributed partial sums are exact and order-free and match DuckDB's sequential
sums bit-for-bit. Averages are expressed as divisions of exact integer sums.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def read_table(sf_dir: str, name: str, columns: list[str] | None = None) -> rd.Dataset:
    """Read one testdata table with column pruning pushed to the parquet read."""
    return rd.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)


def cents(x: np.ndarray) -> np.ndarray:
    """Exact integer cents from a 2-decimal double column (order-free sums)."""
    return np.round(np.asarray(x, dtype=np.float64) * 100).astype(np.int64)


def partial_global_agg(
    ds: rd.Dataset,
    keys: list[str],
    partial_fn,
    final_fn,
) -> pd.DataFrame:
    """The combiner pattern: pre-aggregate inside map_batches, then a small
    groupby over the (tiny) partial-result stream, finalized on the driver.

    ``partial_fn(batch: pd.DataFrame) -> pd.DataFrame`` reduces one batch to at
    most one row per key; ``final_fn(df: pd.DataFrame) -> pd.DataFrame`` merges
    the concatenated partials (already tiny — a few rows per key per block).
    At 100 TB this shuffles only #blocks × #keys rows instead of every row.
    """
    partials = ds.map_batches(partial_fn, batch_format="pandas")
    merged = partials.to_pandas()  # #blocks × #keys rows — always small
    if len(merged) == 0:
        return final_fn(merged)
    return final_fn(merged)


def to_arrow_int64(series) -> pa.Array:
    return pa.array(np.asarray(series, dtype=np.int64), type=pa.int64())
