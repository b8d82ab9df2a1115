"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry at a given sf_dir, converts the result to a
pandas DataFrame, runs the matching ``oracle_sql()`` in DuckDB over the same
parquet tables, and compares row count, column names, dtype compatibility, and
an order-insensitive value hash (rows sorted by all columns, columns sorted by
name). Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import functools
import sys

print = functools.partial(print, flush=True)
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(result, rd.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def value_digest(df: pd.DataFrame) -> str:
    df = canon(df)
    # float columns rounded to 9 significant-ish decimals for the digest
    rows = df.to_csv(index=False, float_format="%.10g")
    import hashlib

    return hashlib.sha256(rows.encode()).hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows-only {name}: {len(mine)} rows, cols={list(mine.columns)} ({dt:.1f}s)")
            n_rowsonly += 1
            continue
        try:
            oracle = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        problems = []
        if len(mine) != len(oracle):
            problems.append(f"rowcount {len(mine)} != {len(oracle)}")
        if sorted(mine.columns) != sorted(oracle.columns):
            problems.append(f"columns {sorted(mine.columns)} != {sorted(oracle.columns)}")
        if not problems:
            hm, ho = value_digest(mine), value_digest(oracle)
            if hm != ho:
                problems.append(f"value hash {hm} != {ho}")
                cm, co = canon(mine), canon(oracle)
                diff = (cm != co)
                if diff.to_numpy().any():
                    idx = np.nonzero(diff.to_numpy())
                    r, c = idx[0][0], idx[1][0]
                    problems.append(
                        f"first diff row {r} col {cm.columns[c]}: "
                        f"{cm.iloc[r, c]!r} vs {co.iloc[r, c]!r}"
                    )
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)} ({dt:.1f}s)")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(mine)} rows ({dt:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
