"""Greedy one-to-one assignment: the reference's two-source Smart Merge matcher.

The heart of the reference's WoS↔Scopus merge semantics
(/root/reference/apps/api/services/smart_merger.py:630-711, semantics
reimplemented — NOT copied): candidate pairs sorted by confidence descending,
then assigned first-come-wins on BOTH sides, so each record matches at most
one record of the other source. This differs from the flagship's union-find
clustering: a similarity chain A~B~C must produce a single best 1:1 match,
never a transitive 3-way merge.

Ray-Data-first decomposition: the reference's blocking key ``(year,
surname[0])`` places every record in EXACTLY ONE block, and candidates only
exist within a block — so the global confidence-descending greedy decomposes
exactly into independent per-block greedies (a row can never collide with a
candidate outside its block). The operator is therefore a coarse
hash-partition on the block key + one ``map_groups`` doing per-block
cross-product → ``compute_match`` → greedy, with no driver-side loop and no
global sort. Determinism: within equal confidence, ties break on (id_a,
id_b) — the reference's Python ``sort`` is stable on its (nondeterministic)
set-iteration enumeration order; ours is order-free.

Partitioning assumption (documented per the brief): whole blocks colocate via
``hash(block_key) % P``. Block sizes are bounded by the blocking design
(year × initial), exactly as in the reference; a pathological mega-block
degrades to the block's own cross-product, never the corpus's.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from bibexpy_ray.functions import hashing
from bibexpy_ray.functions.bibmatch import compute_match
from bibexpy_ray.functions.normalize import normalize_text, to_str
from bibexpy_ray.pipelines.tables import read_table

_ASSIGN_COLS = {
    "id_a": object,
    "id_b": object,
    "stage": np.int64,
    "confidence": np.float64,
    "similarity": np.float64,
    "decision": object,  # 'match' | 'borderline'
}


def _empty_assign() -> pd.DataFrame:
    return pd.DataFrame({c: pd.Series([], dtype=t) for c, t in _ASSIGN_COLS.items()})


def greedy_assign_block(cands: pd.DataFrame) -> pd.DataFrame:
    """Greedy 1:1 assignment over ONE block's scored candidates.

    ``cands`` columns: id_a, id_b, stage (int), confidence, similarity.
    Replays smart_merger.py:660-711: confidence-descending, first-come-wins
    per side; borderline (stage 5) rows are queued but consume NEITHER side
    (they await manual review), yet are skipped when a side is already
    auto-matched — identical loop semantics, deterministic tie-break.
    """
    if len(cands) == 0:
        return _empty_assign()
    cands = cands.sort_values(
        ["confidence", "id_a", "id_b"], ascending=[False, True, True], kind="mergesort"
    )
    matched_a: set = set()
    matched_b: set = set()
    rows: list[dict] = []
    for t in cands.itertuples(index=False):
        if t.id_a in matched_a or t.id_b in matched_b:
            continue
        if int(t.stage) == 5:
            rows.append(
                {
                    "id_a": t.id_a, "id_b": t.id_b, "stage": 5,
                    "confidence": t.confidence, "similarity": t.similarity,
                    "decision": "borderline",
                }
            )
            continue
        matched_a.add(t.id_a)
        matched_b.add(t.id_b)
        rows.append(
            {
                "id_a": t.id_a, "id_b": t.id_b, "stage": int(t.stage),
                "confidence": t.confidence, "similarity": t.similarity,
                "decision": "match",
            }
        )
    if not rows:
        return _empty_assign()
    return pd.DataFrame(rows)[list(_ASSIGN_COLS)]


def _match_block(block: pd.DataFrame) -> pd.DataFrame:
    """One block: score the wos×scopus cross-product, then greedy-assign."""
    wos = block[block["side"] == "wos"]
    scp = block[block["side"] == "scopus"]
    if len(wos) == 0 or len(scp) == 0:
        return _empty_assign()
    wrecs = wos.to_dict("records")
    srecs = scp.to_dict("records")
    rows = []
    for w in wrecs:
        for s in srecs:
            m = compute_match(w, s)
            if m is None:
                continue
            rows.append(
                {
                    "id_a": w["rec_id"], "id_b": s["rec_id"],
                    "stage": m["stage"], "confidence": m["confidence"],
                    "similarity": m["similarity"] if m["similarity"] is not None else np.nan,
                }
            )
    if not rows:
        return _empty_assign()
    return greedy_assign_block(pd.DataFrame(rows))


def smart_match(records: rd.Dataset, n_parts: int = 64) -> rd.Dataset:
    """Two-source greedy 1:1 matcher over CONFORMANCE_SCHEMA-shaped records.

    records columns: rec_id, side ('wos'|'scopus'), norm_key_a/b/c, norm_text,
    norm_year, norm_group, norm_secondary, vl, bp, pg. Returns the assignment
    table (id_a=wos rec, id_b=scopus rec, stage, confidence, similarity,
    decision).
    """

    def add_block(batch: pd.DataFrame) -> pd.DataFrame:
        years = batch["norm_year"]
        groups = [to_str(g) for g in batch["norm_group"]]
        keys = [
            f"{'' if pd.isna(y) else int(y)}|{g[0] if g else ''}"
            for y, g in zip(years, groups)
        ]
        h = hashing.text_hash_u64(keys, seed=31)
        batch = batch.copy()
        batch["_block"] = np.asarray(h, dtype=np.uint64)
        batch["_part"] = (h % np.uint64(n_parts)).astype(np.int32)
        return batch

    def per_part(part: pd.DataFrame) -> pd.DataFrame:
        outs = [
            _match_block(g.drop(columns=["_block", "_part"]))
            for _, g in part.groupby("_block")
        ]
        if not outs:
            return _empty_assign()
        return pd.concat(outs, ignore_index=True)

    return (
        records.map_batches(add_block, batch_format="pandas")
        .groupby("_part")
        .map_groups(per_part, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# queries() surface: two-source synthetic conformance table from documents
# ---------------------------------------------------------------------------


def two_source_records(sf_dir: str) -> rd.Dataset:
    """Deterministic two-source adapter over the documents table.

    Each document yields a 'wos' record; documents with doc_id % 3 == 0 yield
    a near-identical 'scopus' twin (same normalized title/year/surname ⇒
    Stage-3 match) and doc_id % 9 == 0 twins carry the SAME authority key
    (Stage-1) while % 9 == 3 twins carry a CONFLICTING key (negative rule ⇒
    never matched). Purely a function of the parquet contents — no external
    data, stable across runs.
    """
    docs = read_table(sf_dir, "documents", ["doc_id", "text", "lang", "source"])

    def to_records(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(dtype=np.int64)
        rows: list[dict] = []
        for i, text, lang, source in zip(
            ids, batch["text"], batch["lang"], batch["source"]
        ):
            title = normalize_text(str(text)[:80])
            year = 1990 + int(i) % 30
            group = (str(lang) or "x").upper()
            base = {
                "norm_key_b": None, "norm_key_c": None,
                "norm_text": title, "norm_year": year, "norm_group": group,
                "norm_secondary": str(source), "vl": str(int(i) % 7),
                "bp": "", "pg": "",
            }
            rows.append(
                {
                    "rec_id": f"w{i:010d}", "side": "wos",
                    "norm_key_a": f"10.1/{i}" if i % 9 in (0, 3) else None,
                    **base,
                }
            )
            if i % 3 == 0:
                key = None
                if i % 9 == 0:
                    key = f"10.1/{i}"  # same authority → Stage 1
                elif i % 9 == 3:
                    key = f"10.9/{i}x"  # conflicting → negative rule
                rows.append(
                    {
                        "rec_id": f"s{i:010d}", "side": "scopus",
                        "norm_key_a": key,
                        **base,
                    }
                )
        return pd.DataFrame(rows)

    return docs.map_batches(to_records, batch_format="pandas")


def smart_match_pairs(sf_dir: str) -> pd.DataFrame:
    """Greedy 1:1 two-source assignment over the synthetic conformance table
    (deterministic collected result, ordered by id_a)."""
    out = smart_match(two_source_records(sf_dir)).to_pandas()
    if len(out) == 0:
        return _empty_assign()
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)
