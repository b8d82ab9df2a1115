"""Tagged-text source/sink: the reference's WoS plain-text round-trip analog.

The reference parses ISI tag format (2-letter tag + value, 3-space
continuation lines, records separated by a sentinel tag;
/root/reference/packages/bibex_core/wos2xlsx.py:21-114) and re-serializes it
(xlsx2vos.py:4-185). Our engine keeps the same exchange-format capability for
its metadata tables, re-expressed Ray-Data-first:

- writer: ``map_batches`` formatter → sharded ``.txt`` files (one per block,
  resumable layout — never one giant file)
- reader: ``read_binary_files`` over the shard directory → per-file record
  splitter in ``map_batches`` (each shard is self-contained, so parsing
  parallelizes per file exactly like the reference's per-upload parse)

Format: ``TAG value`` lines, continuation lines start with three spaces,
``ER`` ends a record, blank line between records. Tags are column names
written case-preserving (WoS exports already use uppercase tags, and our own
lowercase metadata columns round-trip unchanged); values are str()-serialized
scalars.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

RECORD_END = "ER"
_CONT = "   "


def format_records(batch: pd.DataFrame) -> str:
    """Serialize a batch of rows into tagged text."""
    lines: list[str] = []
    for _, row in batch.iterrows():
        for col in batch.columns:
            v = row[col]
            if v is None or (isinstance(v, float) and v != v):
                continue
            text = str(v)
            parts = text.split("\n")
            tag = col[:64].ljust(2)
            lines.append(f"{tag} {parts[0]}")
            for cont in parts[1:]:
                lines.append(_CONT + cont)
        lines.append(RECORD_END)
        lines.append("")
    return "\n".join(lines) + "\n"


def parse_records(text: str) -> list[dict[str, Any]]:
    """Parse tagged text back into records (continuation-line folding)."""
    records: list[dict[str, Any]] = []
    cur: dict[str, Any] = {}
    last_tag: str | None = None
    for line in text.splitlines():
        if not line.strip():
            continue
        if line.startswith(_CONT) and last_tag is not None:
            cur[last_tag] = cur[last_tag] + "\n" + line[len(_CONT):]
            continue
        tag, _, value = line.partition(" ")
        tag = tag.strip()
        if tag == RECORD_END:
            if cur:
                records.append(cur)
            cur, last_tag = {}, None
            continue
        cur[tag] = value.strip() if tag not in cur else cur[tag] + "; " + value.strip()
        last_tag = tag
    if cur:
        records.append(cur)
    return records


def write_tagged_text(ds: rd.Dataset, out_dir: str, columns: list[str] | None = None) -> str:
    """Sink: one .txt shard per batch (sharded, resumable — no giant files)."""
    os.makedirs(out_dir, exist_ok=True)
    if columns:
        ds = ds.select_columns(columns)

    def write_shard(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame({"path": pd.Series([], dtype=object),
                                 "rows": pd.Series([], dtype=np.int64)})
        text = format_records(batch)
        # shard name from the FULL content hash: deterministic, idempotent on
        # retry, and two batches sharing a 4 KB prefix (duplicate-heavy
        # corpora) can never collide into one filename
        from bibexpy_ray.functions.hashing import hash_bytes_u64

        name = f"shard-{hash_bytes_u64(text.encode()):016x}-{len(batch)}.txt"
        path = os.path.join(out_dir, name)
        # content-addressed shard; pid-unique tmp (see formats._write_sharded)
        tmp = f"{path}.{os.getpid()}.tmp"
        with open(tmp, "w") as f:
            f.write(text)
        os.replace(tmp, path)
        return pd.DataFrame({"path": [path], "rows": [np.int64(len(batch))]})

    shards = ds.map_batches(write_shard, batch_format="pandas").to_pandas()
    return out_dir


def read_tagged_text(path: str) -> rd.Dataset:
    """Source: parallel per-file parse of a tagged-text shard directory."""
    files = rd.read_binary_files(path, include_paths=False)

    def parse(batch: dict) -> pd.DataFrame:
        rows: list[dict[str, Any]] = []
        for data in batch["bytes"]:
            rows.extend(parse_records(bytes(data).decode("utf-8", "replace")))
        return pd.DataFrame(rows)

    return files.map_batches(parse, batch_format="numpy")
