"""Bibliographic exchange formats: BibTeX / RIS sinks + Scopus-style CSV source.

Semantics reimplemented (NOT copied) from the reference's format layer:

- BibTeX writer (/root/reference/apps/api/services/bibtex_writer.py:53-110):
  field map AU→author, TI→title, SO→journal, PY→year, DI→doi, DE→keywords;
  '; '-list normalization; LaTeX escaping; unique cite keys
  (FirstAuthor + year + title slug).
- RIS writer (/root/reference/apps/api/services/ris_writer.py:33-80): TY/AU/
  TI/JO/PY/.../ER tag serialization with multi-valued AU/KW splitting.
- Scopus CSV reader (/root/reference/packages/bibex_core/scp2xlsx.py:13-150):
  the 31-entry header→tag map (Authors→AU, Source title→SO, EID→UT, ...),
  author-name cleanup, J9 abbreviation fill, uppercase normalization with
  DI/URL preserved.

Ray-Data-first: writers are ``map_batches`` formatters over the sharded-file
sink pattern (one file per batch, content-hash names — resumable, never one
giant file, same layout as sources/tagged_text.py); the reader is
``ray.data.read_csv`` with the relabel + cleanup applied per batch.
"""

from __future__ import annotations

import os
import re

import numpy as np
import pandas as pd
import ray.data as rd

# ---------------------------------------------------------------------------
# BibTeX
# ---------------------------------------------------------------------------

#: record field → BibTeX field (bibtex_writer.py:70-84)
_BIB_FIELDS = [
    ("AU", "author"), ("TI", "title"), ("SO", "journal"), ("PY", "year"),
    ("VL", "volume"), ("IS", "number"), ("PG", "pages"), ("DI", "doi"),
    ("URL", "url"), ("AB", "abstract"), ("DE", "keywords"), ("PU", "publisher"),
]


def _latex_escape(value: str) -> str:
    # backslash goes through a brace-free sentinel: replacing it directly
    # with \textbackslash{} would let the brace pass below mangle it
    s = str(value).replace("\\", "\x00")
    for ch in "&%$#_{}":
        s = s.replace(ch, f"\\{ch}")
    s = s.replace("\x00", "\\textbackslash{}")
    return s.replace("~", "\\textasciitilde{}").replace("^", "\\textasciicircum{}")


def _slug(text: str, maxlen: int = 30) -> str:
    s = re.sub(r"[^a-zA-Z0-9]+", "", str(text))
    return s[:maxlen] or "anon"


def _entry_type(dt: str) -> str:
    dt = str(dt).upper()
    if "CONFERENCE" in dt or "PROCEEDING" in dt:
        return "inproceedings"
    if "CHAPTER" in dt:
        return "incollection"
    if "BOOK" in dt:
        return "book"
    return "article"


def format_bibtex(batch: pd.DataFrame, used_keys: set[str] | None = None) -> str:
    """Serialize one batch of records as BibTeX entries.

    Cite-key uniqueness: the reference dedups through an in-process
    ``used_keys`` set (bibtex_writer.py:63), which cannot distribute across
    shard writers. Here EVERY key carries a deterministic 6-hex suffix
    hashed from the record's identity fields — shard-independent, so two
    different records sharing an author/year/title slug diverge no matter
    which shards they land in, while true duplicate records keep identical
    keys. The ``used_keys`` ordinal fallback only catches identity-hash
    ties within a batch (documented divergence from the reference's
    single-process ``_1`` ordinals, which are shard-order-dependent).
    """
    from bibexpy_ray.functions import hashing

    used = used_keys if used_keys is not None else set()
    out: list[str] = []
    for _, row in batch.iterrows():
        au = str(row.get("AU", "") or "")
        py = str(row.get("PY", "") or "").strip()
        ti = str(row.get("TI", "") or "")
        first = re.split(r";|,|\band\b", au)[0].strip()
        first = _slug(first.split()[0] if first else "Anon", 20)
        ident = "\x1f".join(
            str(row.get(c, "") or "") for c in ("DI", "UT", "TI", "PY", "AU")
        )
        h = int(hashing.text_hash_u64([ident])[0])
        key = f"{first}{py}{_slug(ti, 12)}-{h & 0xFFFFFF:06x}"
        base, n = key, 1
        while key in used:
            key = f"{base}_{n}"
            n += 1
        used.add(key)
        out.append(f"@{_entry_type(row.get('DT', '') or '')}{{{key},")
        fields = []
        for col, bib in _BIB_FIELDS:
            v = str(row.get(col, "") or "").strip()
            if not v or v.lower() == "nan":
                continue
            if bib == "author":
                v = " and ".join(
                    a.strip() for a in re.split(r";|\band\b", v) if a.strip()
                )
            elif bib == "keywords":
                v = ", ".join(k.strip() for k in v.split(";") if k.strip())
            fields.append(f"  {bib} = {{{_latex_escape(v)}}}")
        out.append(",\n".join(fields))
        out.append("}")
        out.append("")
    return "\n".join(out) + "\n"


# ---------------------------------------------------------------------------
# RIS
# ---------------------------------------------------------------------------

_RIS_TYPE = {
    "ARTICLE": "JOUR", "REVIEW": "JOUR", "CONFERENCE PAPER": "CPAPER",
    "BOOK": "BOOK", "BOOK CHAPTER": "CHAP", "EDITORIAL": "JOUR",
}
#: single-valued record field → RIS tag, in emit order (ris_writer.py:38-76)
_RIS_FIELDS = [
    ("TI", "TI"), ("SO", "JO"), ("JI", "J2"), ("PY", "PY"), ("VL", "VL"),
    ("IS", "IS"), ("PG", "SP"), ("DI", "DO"), ("URL", "UR"), ("AB", "AB"),
]


def format_ris(batch: pd.DataFrame) -> str:
    """Serialize one batch of records as RIS entries."""
    out: list[str] = []
    for _, row in batch.iterrows():
        dt = str(row.get("DT", "") or "").upper().strip()
        out.append(f"TY  - {_RIS_TYPE.get(dt, 'JOUR')}")
        for au in str(row.get("AU", "") or "").split(";"):
            if au.strip():
                out.append(f"AU  - {au.strip()}")
        for col, tag in _RIS_FIELDS:
            v = str(row.get(col, "") or "").strip()
            if v and v.lower() != "nan":
                out.append(f"{tag}  - {v}")
        for kw in str(row.get("DE", "") or "").split(";"):
            if kw.strip():
                out.append(f"KW  - {kw.strip()}")
        for col, tag in (("PU", "PB"), ("SN", "SN")):
            v = str(row.get(col, "") or "").strip()
            if v and v.lower() != "nan":
                out.append(f"{tag}  - {v}")
        out.append("ER  - ")
        out.append("")
    return "\n".join(out) + "\n"


# ---------------------------------------------------------------------------
# sharded sink (shared by both writers)
# ---------------------------------------------------------------------------


def _write_sharded(ds: rd.Dataset, out_dir: str, formatter, ext: str) -> str:
    os.makedirs(out_dir, exist_ok=True)

    def write_shard(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame(
                {"path": pd.Series([], dtype=object),
                 "rows": pd.Series([], dtype=np.int64)}
            )
        text = formatter(batch)
        from bibexpy_ray.functions.hashing import hash_bytes_u64

        name = f"shard-{hash_bytes_u64(text.encode()):016x}-{len(batch)}{ext}"
        path = os.path.join(out_dir, name)
        # CONTENT-ADDRESSED shards: byte-identical batches coalesce into one
        # file by design (reruns stay idempotent — no duplicate shards pile
        # up); the manifest still reports each batch's rows. The tmp name is
        # pid-unique so two concurrent writers of the same content never
        # interleave into one tmp file; os.replace is atomic either way.
        tmp = f"{path}.{os.getpid()}.tmp"
        with open(tmp, "w") as f:
            f.write(text)
        os.replace(tmp, path)
        return pd.DataFrame({"path": [path], "rows": [np.int64(len(batch))]})

    ds.map_batches(write_shard, batch_format="pandas").materialize()
    return out_dir


def write_bibtex(ds: rd.Dataset, out_dir: str) -> str:
    """Sink: sharded .bib files (one per batch, content-hash names)."""
    return _write_sharded(ds, out_dir, format_bibtex, ".bib")


def write_ris(ds: rd.Dataset, out_dir: str) -> str:
    """Sink: sharded .ris files."""
    return _write_sharded(ds, out_dir, format_ris, ".ris")


#: export format name → sink (the reference's export endpoint format switch)
EXPORT_SINKS = {"bibtex": write_bibtex, "ris": write_ris}


def export_filtered(
    ds: rd.Dataset, spec: dict | None, out_dir: str, fmt: str = "bibtex"
) -> str:
    """Export-with-filter: apply a filter spec, then stream to a format sink
    (the reference's filtered-export flow, routers/export.py — filter specs
    and writers composed in ONE streaming pass; semantics reimplemented, NOT
    copied). ``spec`` uses :func:`relational.apply_filter_spec`'s clause
    grammar; ``None`` exports everything."""
    if fmt not in EXPORT_SINKS:
        raise ValueError(f"unknown export format {fmt!r} (have {sorted(EXPORT_SINKS)})")
    if spec:
        from bibexpy_ray.pipelines.relational import apply_filter_spec

        ds = apply_filter_spec(ds, spec)
    return EXPORT_SINKS[fmt](ds, out_dir)


# ---------------------------------------------------------------------------
# any-to-any converter (the reference's stateless converter tool,
# /root/reference/apps/api/routers/tools.py + services/converter.py —
# semantics reimplemented as one streaming read -> write over a Dataset)
# ---------------------------------------------------------------------------

def _read_fmt(path: str, fmt: str) -> rd.Dataset:
    if fmt == "tagged":
        from bibexpy_ray.sources.tagged_text import read_tagged_text

        return read_tagged_text(path)
    if fmt == "scopus_csv":
        return read_scopus_csv(path)
    if fmt == "parquet":
        return rd.read_parquet(path)
    if fmt == "csv":
        return rd.read_csv(path)
    raise ValueError(f"unknown input format {fmt!r}")


def convert(src: str, out_dir: str, in_fmt: str, out_fmt: str) -> str:
    """Any-to-any format conversion in one streaming pass (never materializes
    the table on the driver). Input formats: tagged | scopus_csv | parquet |
    csv. Output formats: tagged | bibtex | ris | parquet | csv | tsv."""
    ds = _read_fmt(src, in_fmt)
    if out_fmt == "tagged":
        from bibexpy_ray.sources.tagged_text import write_tagged_text

        return write_tagged_text(ds, out_dir)
    if out_fmt in EXPORT_SINKS:
        return EXPORT_SINKS[out_fmt](ds, out_dir)
    if out_fmt == "parquet":
        ds.write_parquet(out_dir)
        return out_dir
    if out_fmt in ("csv", "tsv"):
        delim = "\t" if out_fmt == "tsv" else ","

        def csv_args():
            # WriteOptions is not picklable — build it on the worker
            from pyarrow import csv as pacsv

            return {"write_options": pacsv.WriteOptions(delimiter=delim)}

        ds.write_csv(out_dir, arrow_csv_args_fn=csv_args)
        return out_dir
    raise ValueError(f"unknown output format {out_fmt!r}")


# ---------------------------------------------------------------------------
# auto_prepare: implicit raw → columnar preparation with skip-if-fresh
# ---------------------------------------------------------------------------


def _newest_mtime(paths: list[str]) -> float:
    return max((os.stat(p).st_mtime for p in paths), default=0.0)


def auto_prepare(raw_dir: str, processed_dir: str, *, log=None) -> dict:
    """Convert raw exports (Scopus CSVs, WoS tagged .txt/.isi) into
    consolidated parquet under ``processed_dir`` — the IMPLICIT first phase
    of a merge run, replaying the reference's ``auto_prepare``
    (/root/reference/apps/api/services/converter.py:79-145 — semantics
    reimplemented):

    - skip-if-fresh: a source kind is reconverted only when its newest raw
      file is newer than the prepared output (or the output is missing /
      its recorded input set changed — a marker file carries both, the
      RunDir-style strengthening of the reference's pure-mtime check);
    - errors never raise: a failing kind lands in ``skipped`` so a
      single-source merge can still proceed;
    - each kind consolidates ALL of its raw files in one streaming pass.

    Returns {"scopus": path|None, "wos": path|None, "csv": n, "txt": n,
    "skipped": [...], "did_convert": bool}.
    """
    import json

    report: dict = {
        "scopus": None, "wos": None,
        "csv": 0, "txt": 0, "skipped": [], "did_convert": False,
    }
    if not os.path.isdir(raw_dir):
        return report
    entries = sorted(os.listdir(raw_dir))
    csv_files = [os.path.join(raw_dir, f) for f in entries if f.lower().endswith(".csv")]
    txt_files = [
        os.path.join(raw_dir, f)
        for f in entries
        if f.lower().endswith((".txt", ".isi"))
    ]
    report["csv"] = len(csv_files)
    report["txt"] = len(txt_files)

    def _fingerprint(paths: list[str]) -> dict:
        return {
            "files": [os.path.basename(p) for p in paths],
            "newest_mtime": _newest_mtime(paths),
        }

    def _fresh(out_dir: str, paths: list[str]) -> bool:
        marker = os.path.join(out_dir, "_PREPARED.json")
        if not os.path.exists(marker):
            return False
        try:
            rec = json.load(open(marker))
        except (OSError, ValueError):
            return False
        fp = _fingerprint(paths)
        return rec.get("files") == fp["files"] and rec.get("newest_mtime", -1.0) >= fp["newest_mtime"]

    def _convert(kind: str, paths: list[str], reader) -> None:
        out_dir = os.path.join(processed_dir, kind)
        if _fresh(out_dir, paths):
            report[kind] = out_dir
            if log:
                log(f"{kind} already prepared (up to date)")
            return
        import shutil

        tmp_dir = out_dir + ".tmp"
        try:
            if log:
                log(f"preparing {kind} — {len(paths)} file(s) → {out_dir}")
            # convert into a TEMP dir and swap only on success: a failing
            # reader must never destroy the last good prepared output
            shutil.rmtree(tmp_dir, ignore_errors=True)
            os.makedirs(tmp_dir, exist_ok=True)
            reader(paths).write_parquet(tmp_dir)
            with open(os.path.join(tmp_dir, "_PREPARED.json"), "w") as fh:
                json.dump(_fingerprint(paths), fh)
            shutil.rmtree(out_dir, ignore_errors=True)
            os.replace(tmp_dir, out_dir)
            report[kind] = out_dir
            report["did_convert"] = True
        except Exception as e:  # noqa: BLE001 — single-source merge proceeds
            # the previous good output (if any) is untouched on disk; like
            # the reference, the failed kind is only reported in `skipped`
            shutil.rmtree(tmp_dir, ignore_errors=True)
            report["skipped"].append(f"{kind}: {e}")

    if csv_files:
        _convert("scopus", csv_files, read_scopus_csv)
    if txt_files:
        from bibexpy_ray.sources.tagged_text import read_tagged_text

        _convert("wos", txt_files, read_tagged_text)
    return report


# ---------------------------------------------------------------------------
# Scopus-style CSV reader
# ---------------------------------------------------------------------------

#: Scopus export header → WoS-style tag (scp2xlsx.py:16-47, all 31 entries)
SCOPUS_HEADER_MAP: dict[str, str] = {
    "Abbreviated Source Title": "JI", "Affiliations": "C1", "Authors": "AU",
    "Author Names": "AU", "Author full names": "AF", "Source title": "SO",
    "Titles": "TI", "Title": "TI", "Publication Year": "PY", "Year": "PY",
    "Volume": "VL", "Issue": "IS", "Page count": "PP", "Cited by": "TC",
    "DOI": "DI", "Link": "URL", "Abstract": "AB", "Author Keywords": "DE",
    "Indexed Keywords": "ID", "Index Keywords": "ID", "Funding Details": "FU",
    "Funding Texts": "FX", "Funding Text 1": "FX", "References": "CR",
    "Correspondence Address": "RP", "Publisher": "PU", "Open Access": "OA",
    "Language of Original Document": "LA", "Document Type": "DT",
    "Source": "DB", "EID": "UT",
}


def _clean_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Per-batch Scopus cleanup: AU normalization, J9 fill, uppercase with
    DI/URL preserved (scp2xlsx.py:115-150)."""
    out = batch.copy()
    if "AU" in out.columns:
        out["AU"] = (
            out["AU"].astype(str).str.replace(".", "", regex=False)
            .str.replace(",", ";", regex=False)
        )
    if "AF" in out.columns:
        # strip Scopus '(12345)' author-id parens (MergeDB.py:665-699)
        from bibexpy_ray.functions.normalize import clean_author_fullnames

        out["AF"] = out["AF"].map(clean_author_fullnames)
    if "JI" in out.columns:
        out["J9"] = out["JI"].astype(str).str.replace(".", "", regex=False)
    keep = {c: out[c].copy() for c in ("DI", "URL") if c in out.columns}
    for col in out.columns:
        if out[col].dtype == object:
            out[col] = out[col].astype(str).str.upper()
    for c, v in keep.items():
        out[c] = v
    return out


def read_scopus_csv(path: str) -> rd.Dataset:
    """Source: Scopus CSV export(s) → relabeled, cleaned Dataset.

    Header relabeling happens once (schema-level rename); the per-batch
    cleanup streams. ``path`` may be a file or a directory of CSVs (all files
    must share the export schema — Ray's reader enforces it)."""
    ds = rd.read_csv(path)
    names = ds.schema().names
    rename = {c: SCOPUS_HEADER_MAP[c] for c in names if c in SCOPUS_HEADER_MAP}

    def relabel(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.rename(columns=rename)
        if "C1" not in out.columns:
            out["C1"] = ""
        return _clean_batch(out)

    return ds.map_batches(relabel, batch_format="pandas")
