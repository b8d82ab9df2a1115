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


# ---------------------------------------------------------------------------
# Reference-format WoS writer (xlsx2vos.py:4-185 fidelity)
# ---------------------------------------------------------------------------

#: the reference's fixed tag order (xlsx2vos.py desired_columns / write body)
WOS_TAG_ORDER = [
    "PT", "AU", "AF", "TI", "SO", "LA", "DT", "DE", "ID", "AB", "C1", "C3",
    "RP", "EM", "FU", "FX", "CR", "NR", "TC", "Z9", "U1", "U2", "PU", "PI",
    "PA", "SN", "EI", "J9", "JI", "PD", "PY", "VL", "AR", "DI", "EA", "PG",
    "WC", "WE", "SC", "GA", "UT", "DA",
]

#: tags whose source column name differs from the tag (reference quirks:
#: EI reads the "ISSN" header, AR reads "Art. No.")
WOS_COLUMN_MAP = {"EI": "ISSN", "AR": "Art. No."}

WOS_HEADER = "FN Clarivate Analytics Web of Science\nVR 1.0\n\n"
WOS_FOOTER = "EF\n"


def _wos_value(row: Any, tag: str, column_map: dict[str, str]) -> str:
    def _missing(v: Any) -> bool:
        return v is None or (isinstance(v, float) and v != v)  # None or NaN

    col = column_map.get(tag, tag)
    v = row.get(col)
    if _missing(v) and col != tag:
        v = row.get(tag)  # fall back to the tag-named column (NaN too)
    return "" if _missing(v) else str(v)


def wos_c1_lines(af: str, c1: str) -> list[str]:
    """``[author] address`` pairing (xlsx2vos.py:107-135, 1:1):

    authors come from AF, addresses from C1, both ';'-split; index i pairs
    author i with address i; when authors outnumber addresses the extras all
    pair with the LAST address; surplus addresses are dropped. Returns the
    body lines WITHOUT the tag/indent prefix; empty when either side is
    empty after splitting (the reference then writes nothing at all — not
    even a blank C1 line — reproduced faithfully by the caller)."""
    authors = [a.strip() for a in af.split(";") if a.strip()]
    addresses = [a.strip() for a in c1.split(";") if a.strip()]
    if not authors or not addresses:
        return []
    lines = [f"[{authors[0]}] {addresses[0]}"]
    current = 1
    for i in range(1, min(len(authors), len(addresses))):
        lines.append(f"[{authors[i]}] {addresses[i]}")
        current = i + 1
    if len(authors) > len(addresses):
        last = addresses[-1]
        for i in range(current, len(authors)):
            lines.append(f"[{authors[i]}] {last}")
    return lines


def format_wos_records(
    batch: pd.DataFrame, column_map: dict[str, str] | None = None
) -> str:
    """Serialize rows in the reference's exact WoS layout (xlsx2vos.py:4-185):
    FN/VR file header; per record PT first ('J' default), AU/AF/CR as
    ';'-split continuation blocks (first item on the tag line, the rest
    indented three spaces), C1 as ``[author] address`` pairs from AF×C1,
    every other tag written unconditionally as ``TAG value``; ER + blank
    line per record; EF file footer."""
    cmap = dict(WOS_COLUMN_MAP)
    if column_map:
        cmap.update(column_map)
    out: list[str] = [WOS_HEADER]
    rows = batch.to_dict("records")
    for row in rows:
        val = {tag: _wos_value(row, tag, cmap) for tag in WOS_TAG_ORDER}
        w = out.append
        w(f"PT {val['PT'] or 'J'}\n")
        for tag in ("AU", "AF"):
            v = val[tag]
            if v:
                items = [a.strip() for a in v.split(";") if a.strip()]
                # the reference keeps an empty AF list's first element ('');
                # strip-filter matches its AU branch and a well-formed AF
                first = items[0] if items else ""
                w(f"{tag} {first}\n")
                for item in items[1:]:
                    w(f"{_CONT}{item}\n")
            else:
                w(f"{tag} \n")
        for tag in ("TI", "SO", "LA", "DT", "DE", "ID", "AB"):
            w(f"{tag} {val[tag]}\n")
        c1, af = val["C1"], val["AF"]
        if c1 and af:
            pairs = wos_c1_lines(af, c1)
            for i, line in enumerate(pairs):
                w(f"C1 {line}\n" if i == 0 else f"{_CONT}{line}\n")
        else:
            w("C1 \n")
        for tag in ("C3", "RP", "EM", "FU", "FX"):
            w(f"{tag} {val[tag]}\n")
        cr = val["CR"]
        if cr:
            refs = [r.strip() for r in cr.split(";") if r.strip()]
            if refs:
                w(f"CR {refs[0]}\n")
                for ref in refs[1:]:
                    w(f"{_CONT}{ref}\n")
        else:
            w("CR \n")
        for tag in WOS_TAG_ORDER[WOS_TAG_ORDER.index("NR"):]:
            w(f"{tag} {val[tag]}\n")
        w("ER\n\n")
    out.append(WOS_FOOTER)
    return "".join(out)


def parse_wos_records(text: str) -> list[dict[str, Any]]:
    """isi2df-shaped parse (wos2xlsx.py:21-114 semantics) for round-trip
    verification: FN/VR dropped, three-space continuations fold into the
    previous tag, AU/AF/CR groups join with ';', all other tags join with a
    space; C1 keeps the raw ``[author] address`` text in ``C1raw`` and a
    bracket-stripped form in ``C1``.

    Bit-parity note: like the reference, lines whose stripped content is a
    single character are dropped (``len(line.strip()) > 1``) — a
    one-character continuation item (e.g. a CR entry 'X') is lost in
    round-trip exactly as isi2df would lose it. Kept 1:1 deliberately."""
    import re as _re

    lines = [ln for ln in text.splitlines() if len(ln.strip()) > 1]
    lines = [ln for ln in lines if not ln.startswith(("FN ", "VR "))]
    folded: list[tuple[str, str]] = []
    for ln in lines:
        if ln.startswith(_CONT) and folded:
            folded.append((folded[-1][0], ln[3:].strip()))
        else:
            folded.append((ln[:3].strip(), ln[3:].strip()))
    records: list[dict[str, Any]] = []
    cur: dict[str, list[str]] = {}
    for tag, content in folded:
        if tag == "PT" and cur:
            records.append(_finish_wos(cur))
            cur = {}
        if tag in ("ER", "EF"):
            continue
        cur.setdefault(tag, []).append(content)
    if cur:
        records.append(_finish_wos(cur))
    return records


def _finish_wos(groups: dict[str, list[str]]) -> dict[str, Any]:
    import re as _re

    comma_tags = ("AU", "AF", "CR")
    rec: dict[str, Any] = {}
    for tag, parts in groups.items():
        if tag in comma_tags:
            rec[tag] = ";".join(parts)
        else:
            rec[tag] = " ".join(parts).strip()
    if "C1" in rec:
        rec["C1raw"] = rec["C1"]
        rec["C1"] = _re.sub(r"\[.*?\]", "", rec["C1"]).replace(".", ".;")
    return rec


def write_wos_text(
    ds: rd.Dataset,
    out_dir: str,
    columns: list[str] | None = None,
    column_map: dict[str, str] | None = None,
) -> str:
    """Sink: reference-format WoS export, one self-contained .txt shard per
    batch (each shard carries its own FN/VR header + EF footer, so any shard
    subset is itself a valid WoS file — the resumable layout)."""
    os.makedirs(out_dir, exist_ok=True)
    if columns:
        ds = ds.select_columns(columns)

    def write_shard(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame({"path": pd.Series([], dtype=object),
                                 "rows": pd.Series([], dtype=np.int64)})
        text = format_wos_records(batch, column_map)
        from bibexpy_ray.functions.hashing import hash_bytes_u64

        name = f"wos-{hash_bytes_u64(text.encode()):016x}-{len(batch)}.txt"
        path = os.path.join(out_dir, name)
        tmp = f"{path}.{os.getpid()}.tmp"
        with open(tmp, "w") as f:
            f.write(text)
        os.replace(tmp, path)
        return pd.DataFrame({"path": [path], "rows": [np.int64(len(batch))]})

    ds.map_batches(write_shard, batch_format="pandas").materialize()
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
