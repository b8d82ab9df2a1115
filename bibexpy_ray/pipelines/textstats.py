"""Text-analysis operators over the documents table.

The large-scale training-data text ops from the brief: token counting, quality
scoring, language-ID (n-gram/function-word heuristic), and document
fingerprinting (winnowing rolling-hash). Shapes mirror the reference's
per-record normalize/score passes (/root/reference/packages/bibex_core/modules/
ml_utils.py:84-94 preprocess_text; /root/reference/apps/api/routers/
quality.py:59-106 per-field scoring) but run as vectorized ``map_batches``
stages.

Tokenization contract for oracle-checked ops: literal single-space split
(Python ``s.split(' ')``), which matches DuckDB ``string_split(text, ' ')``
including empty tokens from repeated spaces.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from bibexpy_ray.config import STOPWORDS
from bibexpy_ray.functions import hashing
from bibexpy_ray.pipelines.tables import read_table

#: fixed stopword list shared with the SQL oracle (sorted for determinism)
STOPWORD_LIST = sorted(STOPWORDS)


def token_stats(sf_dir: str) -> rd.Dataset:
    """Per-document token counts: n_tokens, n_uniq_tokens, n_chars."""
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])

    def stats(batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["text"].fillna("").tolist()
        toks = [t.split(" ") for t in texts]
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(dtype=np.int64),
                "n_tokens": np.array([len(t) for t in toks], dtype=np.int64),
                "n_uniq_tokens": np.array([len(set(t)) for t in toks], dtype=np.int64),
                "n_chars": np.array([len(s) for s in texts], dtype=np.int64),
            }
        )

    return ds.map_batches(stats, batch_format="pandas")


#: BPE-ish pre-tokenizer (the GPT-2 split pattern restricted to constructs
#: RE2 also supports, so the DuckDB oracle applies the IDENTICAL regex):
#: contraction suffixes, space-prefixed letter runs, digit runs, punctuation
#: runs. Whitespace itself never forms a token.
BPE_SPLIT_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^\sa-zA-Z0-9]+"


def token_stats_bpe(sf_dir: str) -> rd.Dataset:
    """Per-document BPE-ish token counts: the pre-tokenization split every
    byte-pair encoder starts from (word/number/punct runs + contraction
    suffixes) — the 'how many tokens will this cost' estimator for a
    training-data pipeline. Vectorized ``Series.str.count`` over the
    compiled pattern; whitespace token count included for the ratio."""
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])

    def stats(batch: pd.DataFrame) -> pd.DataFrame:
        import re as _re

        texts = batch["text"].fillna("")
        # re.ASCII: RE2's \s is ASCII-only, Python's is unicode-aware —
        # without the flag a NBSP would tokenize differently in the oracle
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(dtype=np.int64),
                "n_bpe_tokens": texts.str.count(
                    BPE_SPLIT_PATTERN, flags=_re.ASCII
                ).astype(np.int64),
                "n_ws_tokens": texts.str.count(
                    r"\S+", flags=_re.ASCII
                ).astype(np.int64),
            }
        )

    return ds.map_batches(stats, batch_format="pandas")


def quality_score(sf_dir: str) -> rd.Dataset:
    """Heuristic quality scoring: stopword count/ratio + length gate.

    quality_ok = 50 <= n_chars <= 20000 AND stopword ratio <= 0.5 — the
    length/stopword-ratio quality signals from the brief, exactly expressible
    in the SQL oracle.
    """
    ds = read_table(sf_dir, "documents", ["doc_id", "text", "n_chars"])
    stop = frozenset(STOPWORD_LIST)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["text"].fillna("").tolist()
        toks = [t.split(" ") for t in texts]
        n_tokens = np.array([len(t) for t in toks], dtype=np.int64)
        stop_cnt = np.array(
            [sum(1 for w in t if w in stop) for t in toks], dtype=np.int64
        )
        n_chars = batch["n_chars"].to_numpy(dtype=np.int64)
        ok = (n_chars >= 50) & (n_chars <= 20000) & (stop_cnt * 2 <= n_tokens)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(dtype=np.int64),
                "n_tokens": n_tokens,
                "stop_cnt": stop_cnt,
                "quality_ok": ok,
            }
        )

    return ds.map_batches(score, batch_format="pandas")


#: tiny function-word profiles for the language-ID heuristic
_LANG_PROFILES: dict[str, frozenset[str]] = {
    "en": frozenset("the a an of in on and or for to with by from as at is are".split()),
    "de": frozenset("der die das und oder für zu mit von als bei ist sind ein eine".split()),
    "fr": frozenset("le la les et ou pour avec par de des un une est sont dans".split()),
    "es": frozenset("el la los las y o para con por de un una es son en".split()),
    "it": frozenset("il la gli le e o per con da di un una è sono nel".split()),
}


class LangIdStage:
    """Stateful language-ID scorer (actor pool): profiles built once per actor.

    Function-word overlap heuristic — argmax language by matched-token count,
    deterministic tie-break by language code, 'und' when nothing matches.
    """

    def __init__(self):
        self.profiles = sorted(_LANG_PROFILES.items())  # deterministic order

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        preds, scores = [], []
        for text in batch["text"].fillna(""):
            toks = text.lower().split()
            best_lang, best = "und", 0
            for lang, words in self.profiles:
                s = sum(1 for t in toks if t in words)
                if s > best:
                    best_lang, best = lang, s
            preds.append(best_lang)
            scores.append(best)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(dtype=np.int64),
                "pred_lang": preds,
                "match_cnt": np.array(scores, dtype=np.int64),
            }
        )


def lang_id(sf_dir: str) -> rd.Dataset:
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(LangIdStage, batch_format="pandas", concurrency=(1, 2))


def fingerprint(sf_dir: str, k: int = 8, window: int = 16) -> rd.Dataset:
    """Winnowing document fingerprints (rolling-hash min-sampling).

    Classic winnowing: k-gram rolling hashes, minimum per sliding window of
    ``window`` hashes (rightmost-min rule), deduplicated. Emits the fingerprint
    count and an order-free XOR digest per document — deterministic, so task
    retries reproduce identical fingerprints.
    """
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])

    def fp(batch: pa.Table) -> pa.Table:
        texts = batch.column("text")
        flat, offs = hashing.shingle_hashes(texts, k)
        n = batch.num_rows
        counts = np.zeros(n, dtype=np.int64)
        digests = np.zeros(n, dtype=np.uint64)
        for i in range(n):
            row = flat[offs[i] : offs[i + 1]]
            if row.size == 0:
                continue
            if row.size <= window:
                sel = np.unique(row.min(keepdims=True))
            else:
                # vectorized sliding-window minimum via stride tricks
                win = np.lib.stride_tricks.sliding_window_view(row, window)
                sel = np.unique(win.min(axis=1))
            counts[i] = sel.size
            digests[i] = np.bitwise_xor.reduce(sel)
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "n_fp": pa.array(counts, type=pa.int64()),
                "fp_digest": pa.array(digests.view(np.int64), type=pa.int64()),
            }
        )

    return ds.map_batches(fp, batch_format="pyarrow")


def fingerprint_oracle_sql(k: int = 8, window: int = 16) -> str:
    """DuckDB oracle for ``fingerprint`` — bit-exact, not approximate.

    Reproduces the engine's whole chain in SQL: the rolling polynomial
    k-gram hash (Horner with GOLDEN powers, mod 2⁶⁴ via the 32-bit split
    multiply), the SplitMix64 finalize (chained CTEs from
    ``hashing.splitmix64_sql_ctes``), the winnowing rightmost-min rule
    (window-min over full windows only; whole-row min when a document has
    ≤ ``window`` grams), dedup, and the order-free XOR digest reinterpreted
    as int64. Valid for ASCII corpora (``unicode(substr(..))`` == the UTF-8
    byte the engine hashes); the synthetic documents table is ASCII."""
    m64 = 1 << 64
    pows = [pow(hashing.GOLDEN_INT, t, m64) for t in range(k)]
    terms = " + ".join(
        f"CAST(unicode(substr(text, CAST(i AS INT) + {j}, 1)) AS HUGEINT)"
        f" * {pows[k - 1 - j]}"
        for j in range(k)
    )
    sm_frag, sm_cte = hashing.splitmix64_sql_ctes(
        "g1", "rolled", "hv", carry=["doc_id", "i"], prefix="fp"
    )
    digest = hashing.ubigint_as_bigint_sql("coalesce(a.dg, 0)")
    return (
        "WITH g0 AS (SELECT doc_id, text, "
        f"unnest(range(1, CAST(len(text) AS BIGINT) - {k - 2})) AS i "
        "FROM documents), "
        f"g1 AS (SELECT doc_id, i, CAST(({terms}) % {m64} AS UBIGINT) AS rolled FROM g0), "
        f"{sm_frag}, "
        "w AS (SELECT doc_id, hv, "
        "count(*) OVER (PARTITION BY doc_id) AS ng, "
        "row_number() OVER (PARTITION BY doc_id ORDER BY i) AS rn, "
        "min(hv) OVER (PARTITION BY doc_id ORDER BY i "
        f"ROWS BETWEEN {window - 1} PRECEDING AND CURRENT ROW) AS wmin, "
        f"min(hv) OVER (PARTITION BY doc_id) AS gmin FROM {sm_cte}), "
        "sel AS (SELECT DISTINCT doc_id, "
        f"CASE WHEN ng <= {window} THEN gmin ELSE wmin END AS fp "
        f"FROM w WHERE ng <= {window} OR rn >= {window}), "
        "agg AS (SELECT doc_id, count(*) AS n_fp, bit_xor(fp) AS dg "
        "FROM sel GROUP BY doc_id) "
        "SELECT d.doc_id, coalesce(a.n_fp, 0) AS n_fp, "
        f"{digest} AS fp_digest "
        "FROM documents d LEFT JOIN agg a USING (doc_id)"
    )


def fingerprint_kgrams(sf_dir: str, k: int = 8) -> rd.Dataset:
    """Distinct char k-gram count per document — the fingerprint pre-image
    cardinality (the winnowing input set before min-sampling), exposed as an
    oracle-checkable companion to ``fingerprint``.

    Vectorized: one rolling hash over the batch's flat UTF-8 buffer
    (hashing.shingle_hashes), per-row distinct count via a single sort over
    (row, hash). Distinct-hash count equals distinct-gram count (64-bit
    hashes; a collision within one document is ~n²/2⁶⁴).
    """
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])

    def counts(batch: pa.Table) -> pa.Table:
        flat, offs = hashing.shingle_hashes(batch.column("text"), k)
        n = batch.num_rows
        out = np.zeros(n, dtype=np.int64)
        if flat.size:
            row_id = np.repeat(
                np.arange(n, dtype=np.int64), np.diff(offs).astype(np.int64)
            )
            order = np.lexsort((flat, row_id))
            r, h = row_id[order], flat[order]
            first = np.empty(len(r), dtype=bool)
            first[0] = True
            first[1:] = (r[1:] != r[:-1]) | (h[1:] != h[:-1])
            np.add.at(out, r[first], 1)
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "n_kgrams": pa.array(out, type=pa.int64()),
            }
        )

    return ds.map_batches(counts, batch_format="pyarrow")
