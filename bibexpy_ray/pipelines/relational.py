"""Relational operators over the TPC-H-ish testdata tables.

Ray-Data-native reimplementation of the reference's filter engine + statistics
services (/root/reference/apps/api/services/filter_engine.py — numeric range
:86-96, set membership :99-104, contains-any :107-116, boolean full-text
:119-166, facets :214-247; /root/reference/apps/api/routers/quality.py:59-106
quality stats, :221-289 charts/top-k; joins are the enrichment-lookup analog of
/root/reference/packages/bibex_core/modules/api_utils.py:973-1172).

Design rules applied throughout:
- column pruning at the read (`columns=[...]`),
- vectorized pyarrow.compute / numpy kernels inside ``map_batches`` (no Python
  row loops),
- pre-aggregation (combiner) inside ``map_batches`` before any groupby so the
  shuffle moves #blocks × #keys rows, not the data,
- broadcast hash joins for small dimension tables (``ray.put`` once, read per
  actor) instead of an all-to-all shuffle join,
- integer-cent sums for oracle-exact money arithmetic (see tables.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from bibexpy_ray.pipelines.tables import cents, read_table

# ---------------------------------------------------------------------------
# Filters (filter_engine.py analogs)
# ---------------------------------------------------------------------------


def filter_numeric_range(sf_dir: str) -> rd.Dataset:
    """Numeric range + status predicate on orders (filter_engine.py:86-96).

    Vectorized pyarrow compute; streams — no materialization.
    """
    ds = read_table(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"]
    )

    def pred(batch: pa.Table) -> pa.Table:
        price = batch.column("o_totalprice")
        mask = pc.and_(
            pc.and_(pc.greater_equal(price, 1000.0), pc.less(price, 150000.0)),
            pc.equal(batch.column("o_orderstatus"), "F"),
        )
        return batch.filter(mask).select(["o_orderkey", "o_custkey", "o_totalprice"])

    return ds.map_batches(pred, batch_format="pyarrow")


def filter_set_membership(sf_dir: str) -> rd.Dataset:
    """`.isin` facet on lineitem (filter_engine.py:99-104)."""
    ds = read_table(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"],
    )
    flags = pa.array(["A", "R"])

    def pred(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.is_in(batch.column("l_returnflag"), value_set=flags),
            pc.less(batch.column("l_quantity"), 10.0),
        )
        return batch.filter(mask)

    return ds.map_batches(pred, batch_format="pyarrow")


def filter_contains_any(sf_dir: str) -> rd.Dataset:
    """Contains-any over multi-valued text (filter_engine.py:107-116):
    regex alternation of escaped needles, substring semantics."""
    ds = read_table(sf_dir, "documents", ["doc_id", "lang", "text"])
    import re

    pattern = "|".join(re.escape(n) for n in ["spark", "window"])

    def pred(batch: pa.Table) -> pa.Table:
        mask = pc.match_substring_regex(batch.column("text"), pattern)
        return batch.filter(mask).select(["doc_id", "lang"])

    return ds.map_batches(pred, batch_format="pyarrow")


def filter_boolean_fulltext(sf_dir: str) -> rd.Dataset:
    """Boolean AND/OR/NOT full-text query (filter_engine.py:119-166):
    (spark AND join) OR (merge AND agg), NOT batch — substring contains,
    compiled once, vectorized per batch."""
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])

    def pred(batch: pa.Table) -> pa.Table:
        t = batch.column("text")
        has = lambda s: pc.match_substring(t, s)  # noqa: E731
        clause1 = pc.and_(has("spark"), has("join"))
        clause2 = pc.and_(has("merge"), has("agg"))
        mask = pc.and_(pc.or_(clause1, clause2), pc.invert(has("batch")))
        return batch.filter(mask).select(["doc_id"])

    return ds.map_batches(pred, batch_format="pyarrow")


def filter_data_quality(sf_dir: str) -> rd.Dataset:
    """missing:/has: data-quality facets (filter_engine.py:169-181): flag rows
    whose `props` payload is blank OR suspicious (single-digit k), with
    `event_type` present — the blank/low-quality-field check scaled up."""
    ds = read_table(sf_dir, "events", ["event_id", "event_type", "props"])

    def pred(batch: pa.Table) -> pa.Table:
        props = pc.fill_null(batch.column("props"), "")
        blank = pc.equal(pc.utf8_trim_whitespace(props), "")
        suspicious = pc.match_substring_regex(props, '^\\{"k": [0-9]\\}$')
        has_type = pc.invert(
            pc.or_kleene(
                pc.is_null(batch.column("event_type")),
                pc.equal(batch.column("event_type"), ""),
            )
        )
        mask = pc.and_(pc.or_(blank, suspicious), has_type)
        return batch.filter(mask).select(["event_id", "event_type"])

    return ds.map_batches(pred, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Filter-spec combinator (filter_engine.py:184-211 apply_filter analog)
# ---------------------------------------------------------------------------


def _spec_mask(batch: pa.Table, spec: dict) -> pa.Array:
    """AND-of-clauses mask for one batch — every clause vectorized pyarrow.

    Spec clauses (all optional, ANDed together — the reference's
    ``apply_filter`` semantics, /root/reference/apps/api/services/
    filter_engine.py:184-211, reimplemented column-generic):

    - ``range``: ``[{"col", "ge"?, "lt"?}]`` numeric ranges
    - ``in_set``: ``[{"col", "values"}]`` set membership
    - ``contains_any``: ``[{"col", "terms"}]`` substring OR within a clause
    - ``not_contains``: ``[{"col", "terms"}]`` negated substrings
    - ``has`` / ``missing``: data-quality presence checks (non-blank / blank)
    """
    mask = pa.array(np.ones(batch.num_rows, dtype=bool))
    for cl in spec.get("range", []):
        col = batch.column(cl["col"])
        if "ge" in cl:
            mask = pc.and_(mask, pc.greater_equal(col, cl["ge"]))
        if "lt" in cl:
            mask = pc.and_(mask, pc.less(col, cl["lt"]))
    for cl in spec.get("in_set", []):
        mask = pc.and_(
            mask, pc.is_in(batch.column(cl["col"]), value_set=pa.array(cl["values"]))
        )
    for cl in spec.get("contains_any", []):
        col = pc.fill_null(batch.column(cl["col"]), "")
        any_term = pc.match_substring(col, cl["terms"][0])
        for t in cl["terms"][1:]:
            any_term = pc.or_(any_term, pc.match_substring(col, t))
        mask = pc.and_(mask, any_term)
    for cl in spec.get("not_contains", []):
        col = pc.fill_null(batch.column(cl["col"]), "")
        for t in cl["terms"]:
            mask = pc.and_(mask, pc.invert(pc.match_substring(col, t)))
    for field in spec.get("has", []):
        col = pc.fill_null(batch.column(field).cast(pa.string()), "")
        mask = pc.and_(mask, pc.invert(pc.equal(pc.utf8_trim_whitespace(col), "")))
    for field in spec.get("missing", []):
        col = pc.fill_null(batch.column(field).cast(pa.string()), "")
        mask = pc.and_(mask, pc.equal(pc.utf8_trim_whitespace(col), ""))
    return mask


def apply_filter_spec(
    ds: rd.Dataset, spec: dict, project: list[str] | None = None
) -> rd.Dataset:
    """Compose a filter spec into ONE fused ``map_batches`` pass (no chained
    per-clause Dataset filters — one scan, one mask, optional projection)."""

    def pred(batch: pa.Table) -> pa.Table:
        out = batch.filter(_spec_mask(batch, spec))
        return out.select(project) if project else out

    return ds.map_batches(pred, batch_format="pyarrow")


def paginate(
    ds: rd.Dataset, sort_key: str, offset: int, limit: int, columns: list[str]
) -> pd.DataFrame:
    """Deterministic pagination + projection (filter_engine.py's sayfalama/
    projeksiyon block): per-block partial top-(offset+limit) + driver merge
    (``partial_topk`` — no global sort; a ``ds.sort().limit()`` would
    range-shuffle the whole table per page view), then drop the offset
    prefix. Driver memory is blocks·(offset+limit) rows — bounded by the
    API's page-depth cap, not by the corpus.
    """
    head = partial_topk(
        ds.select_columns(columns), [sort_key], ascending=[True], k=offset + limit
    )
    return head.iloc[offset : offset + limit].reset_index(drop=True)


def paginate_orders(sf_dir: str) -> pd.DataFrame:
    ds = read_table(sf_dir, "orders", ["o_orderkey", "o_totalprice", "o_orderstatus"])
    return paginate(
        ds, "o_orderkey", 100, 20, ["o_orderkey", "o_totalprice", "o_orderstatus"]
    )


#: saved preset, the reference's saved-filter analog (routers/filter.py)
FILTER_SPEC_PRESET = {
    "range": [{"col": "o_totalprice", "ge": 50_000.0, "lt": 250_000.0}],
    "in_set": [{"col": "o_orderpriority", "values": ["1-URGENT", "2-HIGH"]}],
    "not_contains": [{"col": "o_orderstatus", "terms": ["P"]}],
    "has": ["o_orderdate"],
}


def filter_spec(sf_dir: str) -> rd.Dataset:
    """AND-of-facets combinator query: the saved preset over orders."""
    ds = read_table(
        sf_dir,
        "orders",
        ["o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"],
    )
    return apply_filter_spec(
        ds, FILTER_SPEC_PRESET, project=["o_orderkey", "o_totalprice", "o_orderpriority"]
    )


# ---------------------------------------------------------------------------
# Aggregations (combiner pattern — partial agg inside map_batches)
# ---------------------------------------------------------------------------


def pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q1-shaped pricing summary over lineitem.

    The canonical pre-aggregate pattern: each batch reduces to ≤ #keys rows
    (integer-cent sums — exact and order-free), the tiny partial stream is
    merged on the driver. At 100 TB the shuffle carries #blocks × ~6 rows.
    """
    ds = read_table(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "qty": np.round(batch["l_quantity"].to_numpy() * 100).astype(np.int64),
                "base": cents(batch["l_extendedprice"].to_numpy()),
                "disc_pct": np.round(batch["l_discount"].to_numpy() * 100).astype(np.int64),
            }
        )
        g["disc_price"] = g["base"] * (100 - g["disc_pct"])
        out = (
            g.groupby(["l_returnflag", "l_linestatus"], as_index=False)
            .agg(
                sum_qty_x100=("qty", "sum"),
                sum_base_cents=("base", "sum"),
                sum_disc_cents_x100=("disc_price", "sum"),
                count_order=("qty", "size"),
            )
        )
        return out

    partials = ds.map_batches(partial, batch_format="pandas").to_pandas()
    final = (
        partials.groupby(["l_returnflag", "l_linestatus"], as_index=False)
        .agg(
            sum_qty_x100=("sum_qty_x100", "sum"),
            sum_base_cents=("sum_base_cents", "sum"),
            sum_disc_cents_x100=("sum_disc_cents_x100", "sum"),
            count_order=("count_order", "sum"),
        )
        .sort_values(["l_returnflag", "l_linestatus"])
        .reset_index(drop=True)
    )
    final["avg_qty"] = final["sum_qty_x100"] / 100.0 / final["count_order"]
    return final


def year_histogram(sf_dir: str) -> pd.DataFrame:
    """Year histogram (filter_engine.py:214-218 facet analog) over orders."""
    ds = read_table(sf_dir, "orders", ["o_orderdate"])

    def partial(batch: pa.Table) -> pa.Table:
        years = pc.year(batch.column("o_orderdate"))
        counted = pa.table({"o_year": years}).group_by("o_year").aggregate([("o_year", "count")])
        return pa.table(
            {
                "o_year": counted.column("o_year").cast(pa.int64()),
                "n": counted.column("o_year_count").cast(pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return (
        partials.groupby("o_year", as_index=False)["n"].sum().sort_values("o_year").reset_index(drop=True)
    )


def top_event_types(sf_dir: str) -> pd.DataFrame:
    """Top-5 event types by count (quality.py:247-271 top-k analog):
    partial count per batch → tiny merge → deterministic (n desc, name asc)."""
    ds = read_table(sf_dir, "events", ["event_type"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        vc = batch["event_type"].value_counts()
        return pd.DataFrame({"event_type": vc.index, "n": vc.to_numpy(dtype=np.int64)})

    partials = ds.map_batches(partial, batch_format="pandas").to_pandas()
    merged = partials.groupby("event_type", as_index=False)["n"].sum()
    out = merged.sort_values(["n", "event_type"], ascending=[False, True]).head(5)
    return out.reset_index(drop=True)


def quality_stats(sf_dir: str) -> pd.DataFrame:
    """Per-field filled/missing counts (quality.py:59-106 / Statistic.xlsx
    analog, smart_merger.py:497-538): one streaming pass, per-batch null+blank
    counts, summed on the driver."""
    cols = ["text", "lang", "source", "n_chars"]
    ds = read_table(sf_dir, "documents", cols)

    def partial(batch: pa.Table) -> pa.Table:
        names, filled, missing = [], [], []
        n = batch.num_rows
        for c in cols:
            col = batch.column(c)
            if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
                blank = pc.or_kleene(
                    pc.is_null(col), pc.equal(pc.utf8_trim_whitespace(pc.fill_null(col, "")), "")
                )
                miss = pc.sum(pc.cast(blank, pa.int64())).as_py() or 0
            else:
                miss = col.null_count
            names.append(c)
            missing.append(miss)
            filled.append(n - miss)
        return pa.table(
            {
                "column_name": pa.array(names),
                "n_filled": pa.array(filled, type=pa.int64()),
                "n_missing": pa.array(missing, type=pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return (
        partials.groupby("column_name", as_index=False)[["n_filled", "n_missing"]]
        .sum()
        .sort_values("column_name")
        .reset_index(drop=True)
    )


#: missing-rate → status bands (smart_merger.py:516-527: 0 / <5% / <15% /
#: <40% / else), compared with exact integer arithmetic (100·missing vs
#: band·total) so the band never depends on float rounding
_STATUS_BANDS = [(0, "Excellent"), (5, "Very Good"), (15, "Good"), (40, "Poor")]


def field_status(n_missing: int, total: int) -> str:
    if n_missing == 0:
        return "Excellent"
    for band, label in _STATUS_BANDS[1:]:
        if 100 * n_missing < band * total:
            return label
    return "Very Poor"


def field_status_report(sf_dir: str) -> pd.DataFrame:
    """Statistic.xlsx Field-Stats analog: per-field missing counts banded into
    the reference's five status labels, plus an integer basis-point rate
    (missing_bp = ⌊10000·missing/total⌋ — exact, hash-stable)."""
    stats = quality_stats(sf_dir)
    total = (stats["n_filled"] + stats["n_missing"]).astype(np.int64)
    miss = stats["n_missing"].astype(np.int64)
    return pd.DataFrame(
        {
            "column_name": stats["column_name"],
            "n_missing": miss,
            "missing_bp": (miss * 10000) // total,
            "status": [field_status(int(m), int(t)) for m, t in zip(miss, total)],
        }
    )


#: the merge-report band scheme (stats_utils.py:71-87 — a second, finer
#: ladder than smart_merger's): 0 / <1% / <5% / <20% / <50% / <90% / else
_METADATA_BANDS = [
    (1, "Very Good"), (5, "Good"), (20, "Acceptable"),
    (50, "Poor"), (90, "Critical"),
]


def metadata_status(n_missing: int, total: int) -> str:
    """stats_utils.generate_metadata_statistics band (integer-exact)."""
    if n_missing == 0:
        return "Excellent"
    for band, label in _METADATA_BANDS:
        if 100 * n_missing < band * total:
            return label
    return "Completely Missing"


def metadata_statistics(sf_dir: str) -> pd.DataFrame:
    """Merge-report metadata quality table (stats_utils.py:44-96
    generate_metadata_statistics — semantics reimplemented): per-field
    missing count + integer basis-point rate + the seven-band status."""
    stats = quality_stats(sf_dir)
    total = (stats["n_filled"] + stats["n_missing"]).astype(np.int64)
    miss = stats["n_missing"].astype(np.int64)
    return pd.DataFrame(
        {
            "column_name": stats["column_name"],
            "n_missing": miss,
            "missing_bp": (miss * 10000) // total,
            "status": [metadata_status(int(m), int(t)) for m, t in zip(miss, total)],
        }
    )


#: bibliometric field weights (quality.py:59-63 FIELD_WEIGHTS — tier 1
#: critical = 3, tier 2 important = 2, tier 3 useful = 1), mapped onto the
#: documents table's fields: the text body is the analysis-critical field,
#: lang/source the important dimensions, n_chars the supplementary one
HEALTH_WEIGHTS = {"text": 3, "lang": 2, "source": 2, "n_chars": 1}


def health_score(sf_dir: str) -> pd.DataFrame:
    """Weighted data-health score (quality.py:71-106 ``_compute_stats``):
    the weighted mean of per-field fill rates, weights 3/2/1 by analytic
    criticality, so missing critical fields sink the score hard while
    supplementary gaps barely move it.

    One streaming pass (the ``quality_stats`` partials); the scalar is
    integer basis points — ``⌊10⁴·Σ(wᶜ·filledᶜ) / (total·Σwᶜ)⌋`` — so the
    result is exact and hash-stable across partitionings.
    """
    stats = quality_stats(sf_dir)
    total = int(stats["n_filled"].iloc[0] + stats["n_missing"].iloc[0])
    w = stats["column_name"].map(HEALTH_WEIGHTS).astype(np.int64)
    weighted = int((stats["n_filled"].astype(np.int64) * w).sum())
    wsum = int(w.sum())
    bp = (10000 * weighted) // (total * wsum) if total else 0
    return pd.DataFrame(
        {
            "total_records": np.array([total], dtype=np.int64),
            "weighted_filled": np.array([weighted], dtype=np.int64),
            "weights_sum": np.array([wsum], dtype=np.int64),
            "health_bp": np.array([bp], dtype=np.int64),
        }
    )


def merge_statistics(
    wos_ds: rd.Dataset, scopus_ds: rd.Dataset, merged_ds: rd.Dataset
) -> dict:
    """Cross-dataset merge report (stats_utils.py:4-42
    generate_detailed_statistics — semantics reimplemented): row totals,
    column counts, common columns, and empty-cell rates, all computed by
    streaming aggregation (never collects a table). Rates are integer basis
    points so the report is deterministic across partitionings."""

    def empty_cells(ds: rd.Dataset) -> tuple[int, int]:
        cols = ds.schema().names

        def partial(batch: pa.Table) -> pa.Table:
            miss = 0
            for c in cols:
                col = batch.column(c)
                if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
                    blank = pc.or_kleene(
                        pc.is_null(col),
                        pc.equal(pc.utf8_trim_whitespace(pc.fill_null(col, "")), ""),
                    )
                    miss += pc.sum(pc.cast(blank, pa.int64())).as_py() or 0
                else:
                    miss += col.null_count
            return pa.table(
                {
                    "n_rows": pa.array([batch.num_rows], type=pa.int64()),
                    "n_empty": pa.array([miss], type=pa.int64()),
                }
            )

        parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        return int(parts["n_rows"].sum()), int(parts["n_empty"].sum())

    def table_stats(ds: rd.Dataset) -> dict:
        n_cols = len(ds.schema().names)
        n_rows, n_empty = empty_cells(ds)
        cells = n_rows * n_cols
        return {
            "rows": n_rows,
            "columns": n_cols,
            "empty_cell_bp": (n_empty * 10000) // cells if cells else 0,
        }

    w, s, m = table_stats(wos_ds), table_stats(scopus_ds), table_stats(merged_ds)
    total_in = w["rows"] + s["rows"]
    return {
        "wos": w,
        "scopus": s,
        "merged": m,
        "common_columns": len(
            set(wos_ds.schema().names) & set(scopus_ds.schema().names)
        ),
        "merge_rate_bp": (m["rows"] * 10000) // total_in if total_in else 0,
    }


def facets(sf_dir: str) -> pd.DataFrame:
    """compute_facets analog (filter_engine.py:214-247): group counts +
    min/max/avg over a numeric column, per (lang, source)."""
    ds = read_table(sf_dir, "documents", ["lang", "source", "n_chars"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby(["lang", "source"], as_index=False).agg(
            n=("n_chars", "size"),
            sum_chars=("n_chars", "sum"),
            min_chars=("n_chars", "min"),
            max_chars=("n_chars", "max"),
        )

    partials = ds.map_batches(partial, batch_format="pandas").to_pandas()
    final = partials.groupby(["lang", "source"], as_index=False).agg(
        n=("n", "sum"),
        sum_chars=("sum_chars", "sum"),
        min_chars=("min_chars", "min"),
        max_chars=("max_chars", "max"),
    )
    final["avg_chars"] = final["sum_chars"].astype(np.float64) / final["n"]
    return final.sort_values(["lang", "source"]).reset_index(drop=True)


def value_buckets(sf_dir: str) -> pd.DataFrame:
    """Bucketed histogram (quality.py:280-289 citation-buckets analog):
    floor(value/100) buckets with count + exact min/max."""
    ds = read_table(sf_dir, "events", ["value"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch["value"].to_numpy(dtype=np.float64)
        b = np.floor(v / 100.0).astype(np.int64)
        df = pd.DataFrame({"bucket": b, "value": v})
        return df.groupby("bucket", as_index=False).agg(
            n=("value", "size"), min_value=("value", "min"), max_value=("value", "max")
        )

    partials = ds.map_batches(partial, batch_format="pandas").to_pandas()
    return (
        partials.groupby("bucket", as_index=False)
        .agg(n=("n", "sum"), min_value=("min_value", "min"), max_value=("max_value", "max"))
        .sort_values("bucket")
        .reset_index(drop=True)
    )


# ---------------------------------------------------------------------------
# Dimension joins: broadcast lookup under the cap, co-partition hash join
# above it (customer/part scale with SF — they are NOT bounded dimensions)
# ---------------------------------------------------------------------------

#: dim rows broadcast below this (dict of int→str, ~100 B/row → ≤500 MB at
#: the cap is too big; 5M rows ≈ tens of MB of keys+values — node-resident);
#: above it the fact side pre-aggregates per join key (combiner) and the
#: (key, partial) rows co-partition with the dim via the raw-task hash
#: shuffle — only distinct-key partials transit, never fact rows
DIM_BROADCAST_LIMIT = 5_000_000


def _copartition_dim(partials_ds, dim_ds, key_col: str, dim_cols: list[str], reduce_fn, n_parts: int = 32, empty_like: pd.DataFrame | None = None):
    """Co-partition (key, partial-agg) rows with dim rows on ``key_col`` and
    apply ``reduce_fn`` per partition. Dim rows are marked by their extra
    columns (null on partial rows after schema promotion)."""
    from bibexpy_ray.functions import hashing
    from bibexpy_ray.stages.shuffle import hash_partition_apply

    marked = dim_ds.map_batches(
        lambda df: df[[key_col, *dim_cols]].assign(_dim=True),
        batch_format="pandas",
    )

    def key_fn(t: pa.Table) -> np.ndarray:
        k = t.column(key_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        return (hashing.splitmix64(k) % np.uint64(n_parts)).astype(np.int32)

    return hash_partition_apply(
        partials_ds.union(marked), n_parts, reduce_fn, key_fn=key_fn,
        empty_like=empty_like,
    )


def revenue_by_nation(sf_dir: str) -> pd.DataFrame:
    """orders ⋈ customer ⋈ nation revenue rollup.

    nation (25 rows, genuinely bounded) always broadcasts. customer scales
    with SF: under ``DIM_BROADCAST_LIMIT`` it broadcasts as SORTED numpy
    arrays (custkey + per-customer nation code — ~12 B/row, vs a Python
    dict's ~100 B/entry and per-task re-deserialization) probed with a
    guarded searchsorted; above it the orders pre-aggregate per custkey
    (combiner) and co-partition with the customer dim — both paths proven
    equivalent in tests/test_dim_join_paths.py.
    """
    nation = read_table(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    nat_name = dict(zip(nation["n_nationkey"].astype(np.int64), nation["n_name"]))
    cust_ds = read_table(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    orders = read_table(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    if int(cust_ds.count()) <= DIM_BROADCAST_LIMIT:
        cust = cust_ds.to_pandas()
        ckeys = cust["c_custkey"].to_numpy(dtype=np.int64)
        order = np.argsort(ckeys)
        ckeys = ckeys[order]
        cnat = cust["c_nationkey"].to_numpy(dtype=np.int64)[order]
        natk = nation["n_nationkey"].to_numpy(dtype=np.int64)
        norder = np.argsort(natk)
        natk = natk[norder]
        natn = nation["n_name"].to_numpy()[norder]
        lookup_ref = ray.put((ckeys, cnat, natk, natn))

        def partial(batch: pd.DataFrame) -> pd.DataFrame:
            ck, cn, nk, nn = ray.get(lookup_ref)
            o = batch["o_custkey"].to_numpy(dtype=np.int64)
            i = np.minimum(np.searchsorted(ck, o), len(ck) - 1)
            ok = ck[i] == o  # unknown custkeys drop (dict .map gave NaN)
            codes = cn[i[ok]]
            j = np.minimum(np.searchsorted(nk, codes), len(nk) - 1)
            df = pd.DataFrame(
                {
                    "n_name": nn[j],
                    "revenue_cents": cents(batch["o_totalprice"].to_numpy())[ok],
                }
            )
            return df.groupby("n_name", as_index=False).agg(
                revenue_cents=("revenue_cents", "sum"), n_orders=("revenue_cents", "size")
            )

        partials = orders.map_batches(partial, batch_format="pandas").to_pandas()
    else:  # pragma: no cover - exercised via a forced gate in tests
        def partial_by_cust(batch: pd.DataFrame) -> pd.DataFrame:
            df = pd.DataFrame(
                {
                    "c_custkey": batch["o_custkey"].astype(np.int64),
                    "revenue_cents": cents(batch["o_totalprice"].to_numpy()),
                }
            )
            return df.groupby("c_custkey", as_index=False).agg(
                revenue_cents=("revenue_cents", "sum"),
                n_orders=("revenue_cents", "size"),
            )

        nat_ref = ray.put(nat_name)

        def reduce_part(part: pd.DataFrame) -> pd.DataFrame:
            nn = ray.get(nat_ref)
            empty = pd.DataFrame(
                {
                    "n_name": pd.Series([], dtype=object),
                    "revenue_cents": pd.Series([], dtype=np.int64),
                    "n_orders": pd.Series([], dtype=np.int64),
                }
            )
            # one-sided partitions (dim rows only — custkeys with no orders —
            # or fact columns only on an empty reduce) produce no joined rows
            if "_dim" not in part.columns or "revenue_cents" not in part.columns:
                return empty
            is_dim = part["_dim"].notna()
            dim = part.loc[is_dim, ["c_custkey", "c_nationkey"]]
            probe = part.loc[~is_dim, ["c_custkey", "revenue_cents", "n_orders"]]
            if len(dim) == 0 or len(probe) == 0:
                return empty
            m = probe.merge(dim, on="c_custkey", how="inner")
            m["n_name"] = m["c_nationkey"].astype(np.int64).map(nn)
            # schema promotion floats the measure columns (nulls on dim
            # rows) — cast back so both paths emit identical int64 partials
            m["revenue_cents"] = m["revenue_cents"].astype(np.int64)
            m["n_orders"] = m["n_orders"].astype(np.int64)
            return m.groupby("n_name", as_index=False).agg(
                revenue_cents=("revenue_cents", "sum"), n_orders=("n_orders", "sum")
            )

        partials = _copartition_dim(
            orders.map_batches(partial_by_cust, batch_format="pandas"),
            cust_ds,
            "c_custkey",
            ["c_nationkey"],
            reduce_part,
            empty_like=reduce_part(pd.DataFrame()),
        ).to_pandas()

    return (
        partials.groupby("n_name", as_index=False)
        .agg(revenue_cents=("revenue_cents", "sum"), n_orders=("n_orders", "sum"))
        .sort_values("n_name")
        .reset_index(drop=True)
    )


def brand_revenue(sf_dir: str) -> pd.DataFrame:
    """lineitem ⋈ part → discounted revenue per brand: broadcast dict under
    ``DIM_BROADCAST_LIMIT`` part rows, per-partkey combiner + co-partition
    hash join above it (part scales with SF)."""
    part_ds = read_table(sf_dir, "part", ["p_partkey", "p_brand"])
    li = read_table(sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount"])

    if int(part_ds.count()) <= DIM_BROADCAST_LIMIT:
        part_df = part_ds.to_pandas()
        # sorted-array broadcast: keys + small brand-code column, with the
        # tiny distinct-brand vocabulary alongside (no per-key Python strings)
        pkeys = part_df["p_partkey"].to_numpy(dtype=np.int64)
        order = np.argsort(pkeys)
        pkeys = pkeys[order]
        codes, brands = pd.factorize(part_df["p_brand"])
        codes = codes[order].astype(np.int32)
        ref = ray.put((pkeys, codes, np.asarray(brands, dtype=object)))

        def partial(batch: pd.DataFrame) -> pd.DataFrame:
            pk, cd, br = ray.get(ref)
            base = cents(batch["l_extendedprice"].to_numpy())
            disc = np.round(batch["l_discount"].to_numpy() * 100).astype(np.int64)
            keys = batch["l_partkey"].to_numpy(dtype=np.int64)
            i = np.minimum(np.searchsorted(pk, keys), len(pk) - 1)
            ok = pk[i] == keys  # unknown partkeys drop (dict .map gave NaN)
            df = pd.DataFrame(
                {
                    "p_brand": br[cd[i[ok]]],
                    "rev": (base * (100 - disc))[ok],
                }
            )
            return df.groupby("p_brand", as_index=False).agg(
                revenue_cents_x100=("rev", "sum"), n_items=("rev", "size")
            )

        partials = li.map_batches(partial, batch_format="pandas").to_pandas()
    else:  # pragma: no cover - exercised via a forced gate in tests
        def partial_by_part(batch: pd.DataFrame) -> pd.DataFrame:
            base = cents(batch["l_extendedprice"].to_numpy())
            disc = np.round(batch["l_discount"].to_numpy() * 100).astype(np.int64)
            df = pd.DataFrame(
                {"p_partkey": batch["l_partkey"].astype(np.int64), "rev": base * (100 - disc)}
            )
            return df.groupby("p_partkey", as_index=False).agg(
                revenue_cents_x100=("rev", "sum"), n_items=("rev", "size")
            )

        def reduce_part(part: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame(
                {
                    "p_brand": pd.Series([], dtype=object),
                    "revenue_cents_x100": pd.Series([], dtype=np.int64),
                    "n_items": pd.Series([], dtype=np.int64),
                }
            )
            if "_dim" not in part.columns or "revenue_cents_x100" not in part.columns:
                return empty  # one-sided partition: no joined rows
            is_dim = part["_dim"].notna()
            dim = part.loc[is_dim, ["p_partkey", "p_brand"]]
            probe = part.loc[~is_dim, ["p_partkey", "revenue_cents_x100", "n_items"]]
            if len(dim) == 0 or len(probe) == 0:
                return empty
            m = probe.merge(dim, on="p_partkey", how="inner")
            m["revenue_cents_x100"] = m["revenue_cents_x100"].astype(np.int64)
            m["n_items"] = m["n_items"].astype(np.int64)
            return m.groupby("p_brand", as_index=False).agg(
                revenue_cents_x100=("revenue_cents_x100", "sum"), n_items=("n_items", "sum")
            )

        partials = _copartition_dim(
            li.map_batches(partial_by_part, batch_format="pandas"),
            part_ds,
            "p_partkey",
            ["p_brand"],
            reduce_part,
            empty_like=reduce_part(pd.DataFrame()),
        ).to_pandas()

    return (
        partials.groupby("p_brand", as_index=False)
        .agg(revenue_cents_x100=("revenue_cents_x100", "sum"), n_items=("n_items", "sum"))
        .sort_values("p_brand")
        .reset_index(drop=True)
    )


# ---------------------------------------------------------------------------
# Windowed / sessionized aggregate (custom operator the Dataset API lacks)
# ---------------------------------------------------------------------------

SESSION_GAP_US = 1_800_000_000  # 30 min


def sessionize(sf_dir: str, n_parts: int = 64) -> rd.Dataset:
    """Per-user session counts with a 30-minute inactivity gap.

    Composition (a) from the brief: coarse hash-partition (``user_id %
    n_parts`` — a bounded number of groups, not one pandas group per user,
    which is the per-group-overhead pathology documented in lsh.py), then one
    vectorized sort + boundary-aware diff over each whole partition. The
    partitioning assumption is that one user's events land in one partition
    (trivially true for a hash of the key); a partition holds ~|users|/64
    users and streams through a single numpy pass.
    """
    ds = read_table(sf_dir, "events", ["user_id", "ts"])

    def add_part(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "_part", pa.array((uid % n_parts).astype(np.int32), type=pa.int32())
        )

    def per_part(part: pd.DataFrame) -> pd.DataFrame:
        if not len(part):
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype=np.int64),
                    "n_events": pd.Series([], dtype=np.int64),
                    "n_sessions": pd.Series([], dtype=np.int64),
                }
            )
        uid = part["user_id"].to_numpy(dtype=np.int64)
        ts = part["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
        order = np.lexsort((ts, uid))
        uid, ts = uid[order], ts[order]
        # one diff over the whole partition; user boundaries reset the gap
        new_user = np.empty(len(uid), dtype=bool)
        new_user[0] = True
        np.not_equal(uid[1:], uid[:-1], out=new_user[1:])
        session_start = new_user.copy()
        session_start[1:] |= np.diff(ts) > SESSION_GAP_US
        starts = np.flatnonzero(new_user)
        counts = np.diff(np.append(starts, len(uid)))
        n_sessions = np.add.reduceat(session_start.astype(np.int64), starts)
        return pd.DataFrame(
            {
                "user_id": uid[starts],
                "n_events": counts.astype(np.int64),
                "n_sessions": n_sessions,
            }
        )

    from bibexpy_ray.stages.shuffle import hash_partition_apply

    return hash_partition_apply(
        ds.map_batches(add_part, batch_format="pyarrow"), n_parts, per_part
    )


# ---------------------------------------------------------------------------
# Sort / limit, set ops, priority-coalesce fill
# ---------------------------------------------------------------------------


def partial_topk(
    ds: rd.Dataset, by: list[str], ascending: list[bool], k: int
) -> pd.DataFrame:
    """Distributed top-k without a global sort: each block keeps only its
    best ``k`` rows (a per-batch sort of one block), then one driver merge of
    the ≤ blocks·k survivors. A ``ds.sort().limit(k)`` range-shuffles the
    whole table to extract k rows; this ships k rows per block and touches
    nothing else — the same partial+merge pattern as ``top_event_types``."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(by, ascending=ascending, kind="mergesort").head(k)

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    return (
        parts.sort_values(by, ascending=ascending, kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )


def top_orders(sf_dir: str) -> pd.DataFrame:
    """Top-10 orders by price (quality.py top-k analog) with a deterministic
    tie-break (price desc, key asc) — per-block partial top-k + driver merge,
    no global sort."""
    ds = read_table(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    return partial_topk(
        ds, ["o_totalprice", "o_orderkey"], ascending=[False, True], k=10
    )


def events_pivot(sf_dir: str) -> pd.DataFrame:
    """Pivot / crosstab: one row per day, one count column per event type
    (conditional aggregation). The column set is the SMALL dimension's
    domain, discovered in a cheap first pass; counts combine per batch
    (day × type partials) so only the tiny pivot table leaves the workers."""
    ds = read_table(sf_dir, "events", ["ts", "event_type"])
    types = sorted(
        ds.select_columns(["event_type"]).unique("event_type")
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame(
            {
                "day": batch["ts"].dt.strftime("%Y-%m-%d"),
                "event_type": batch["event_type"],
            }
        )
        g = d.groupby(["day", "event_type"]).size().unstack(fill_value=0)
        g = g.reindex(columns=types, fill_value=0)
        g.columns = [f"n_{t}" for t in types]
        return g.reset_index()

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .to_pandas()
        .groupby("day", as_index=False)
        .sum()
        .sort_values("day")
        .reset_index(drop=True)
    )
    for c in out.columns[1:]:
        out[c] = out[c].astype(np.int64)
    return out


def distinct_users(sf_dir: str, n_parts: int = 16) -> pd.DataFrame:
    """Exact COUNT(DISTINCT) at scale: per-batch local dedupe (combiner) →
    hash-partition on (event_type, user hash) → per-partition dedupe + count
    → small final sum. Only already-deduped (type, user_id) pairs shuffle."""
    ds = read_table(sf_dir, "events", ["event_type", "user_id"])

    def local_dedupe(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.drop_duplicates()
        h = out["user_id"].to_numpy(dtype=np.uint64)
        out = out.assign(
            _part=((h * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(60)).astype(
                np.int32
            )
            % n_parts
        )
        return out

    def count_part(part: pd.DataFrame) -> pd.DataFrame:
        g = part.drop_duplicates().groupby("event_type", as_index=False).size()
        return g.rename(columns={"size": "n_users"})

    from bibexpy_ray.stages.shuffle import hash_partition_apply

    out = (
        hash_partition_apply(
            ds.map_batches(local_dedupe, batch_format="pandas"), n_parts, count_part
        )
        .to_pandas()
        .groupby("event_type", as_index=False)["n_users"]
        .sum()
    )
    out["n_users"] = out["n_users"].astype(np.int64)
    return out.sort_values("event_type").reset_index(drop=True)


# HyperLogLog: the classic cardinality sketch (Flajolet et al. 2007, public
# algorithm) — registers merge by elementwise max, so per-batch partials
# combine associatively: the canonical distributed approximate-distinct.
HLL_P = 12  # 4096 registers → ~1.6% standard error


def _hll_registers(hashes: np.ndarray, p: int = HLL_P) -> np.ndarray:
    m = 1 << p
    idx = (hashes >> np.uint64(64 - p)).astype(np.int64)
    rest = hashes << np.uint64(p) | np.uint64((1 << p) - 1)  # pad tail with 1s
    # rank = leading zeros of the remaining bits + 1, capped by width
    lz = np.zeros(len(hashes), dtype=np.int64)
    bit = np.uint64(1) << np.uint64(63)
    cur = rest.copy()
    # vectorized leading-zero count via float log2 would lose precision at
    # 64-bit; do it in 8-bit steps (at most 8 passes, all vectorized)
    for shift in (32, 16, 8, 4, 2, 1):
        mask = cur < (bit >> np.uint64(shift - 1))
        lz += np.where(mask, shift, 0)
        cur = np.where(mask, cur << np.uint64(shift), cur)
    regs = np.zeros(m, dtype=np.int8)
    np.maximum.at(regs, idx, np.minimum(lz + 1, 64 - p).astype(np.int8))
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # small-range correction
    return float(est)


def hll_distinct_users(sf_dir: str) -> pd.DataFrame:
    """Approximate distinct users per event type via per-batch HLL register
    partials merged by elementwise max — constant memory per group no matter
    the cardinality (the sketch path for when exact dedupe is too wide)."""
    from bibexpy_ray.functions import hashing

    ds = read_table(sf_dir, "events", ["event_type", "user_id"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        h_all = hashing.splitmix64(batch["user_id"].to_numpy(dtype=np.uint64))
        for et, idxs in batch.groupby("event_type").indices.items():
            rows.append(
                {"event_type": et, "regs": _hll_registers(h_all[idxs]).tobytes()}
            )
        return pd.DataFrame(rows)

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    rows = []
    for et, g in parts.groupby("event_type"):
        regs = np.zeros(1 << HLL_P, dtype=np.int8)
        for b in g["regs"]:
            regs = np.maximum(regs, np.frombuffer(b, dtype=np.int8))
        rows.append({"event_type": et, "n_users_est": int(round(hll_estimate(regs)))})
    return pd.DataFrame(rows).sort_values("event_type").reset_index(drop=True)


def hll_oracle_sql(p: int = HLL_P) -> str:
    """DuckDB oracle for ``hll_distinct_users`` — exact, not approximate:
    the registers are a deterministic function of the SplitMix64 user-id
    hashes, and the estimate arithmetic is reproducible bit-for-bit.

    Register max is a plain GROUP BY; leading zeros come from DuckDB's
    ``bin()`` (no leading zeros → lz = 64 − strlen). The float path is safe
    to hash-compare: every ``2⁻ʳ`` term is a power of two with exponents
    spanning < 53 bits, so ``Z`` is EXACT in float64 regardless of summation
    order, and the remaining ops (one divide, or m·ln(m/V)) are identical
    IEEE expressions on both sides (verified at sf0.001/0.01/0.1)."""
    from bibexpy_ray.functions import hashing

    m = 1 << p
    sm_frag, sm_cte = hashing.splitmix64_sql_ctes(
        "h0", "CAST(user_id AS UBIGINT)", "hv", carry=["event_type"], prefix="hll"
    )
    rest = hashing.modmul_sql("hv", m) + f" | {m - 1}"
    alpha_raw = (
        f"(0.7213 / (1 + 1.079 / {m})) * {m} * {m} / (z_present + ({m} - n_present))"
    )
    return (
        "WITH h0 AS (SELECT event_type, user_id FROM events), "
        f"{sm_frag}, "
        f"r AS (SELECT event_type, hv >> {64 - p} AS idx, "
        f"least(CAST(64 - length(bin({rest})) AS BIGINT) + 1, {64 - p}) AS rk "
        f"FROM {sm_cte}), "
        "mx AS (SELECT event_type, idx, MAX(rk) AS r FROM r GROUP BY 1, 2), "
        "agg AS (SELECT event_type, count(*) AS n_present, "
        "SUM(pow(2.0, -r)) AS z_present FROM mx GROUP BY 1) "
        "SELECT event_type, CAST(round("
        f"CASE WHEN {alpha_raw} <= 2.5 * {m} AND n_present < {m} "
        f"THEN {m} * ln(CAST({m} AS DOUBLE) / ({m} - n_present)) "
        f"ELSE {alpha_raw} END) AS BIGINT) AS n_users_est "
        "FROM agg"
    )


def customers_without_urgent_orders(sf_dir: str) -> rd.Dataset:
    """Broadcast anti-join: the distinct urgent-order customer key set ships
    once via ray.put; customers stream through a vectorized sorted-probe
    filter. The small side is the DISTINCT keys of a filtered fact-table FK
    — orders of magnitude under the fact rows (prune at the read: only the
    two needed columns leave storage)."""
    import ray as _ray

    orders = read_table(sf_dir, "orders", ["o_custkey", "o_orderpriority"])

    def urgent_keys(batch: pd.DataFrame) -> pd.DataFrame:
        k = batch.loc[batch["o_orderpriority"] == "1-URGENT", ["o_custkey"]]
        return k.drop_duplicates()

    keys = (
        orders.map_batches(urgent_keys, batch_format="pandas")
        .to_pandas()["o_custkey"]
        .unique()
    )
    keys_ref = _ray.put(np.sort(keys))
    cust = read_table(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"])

    def anti(batch: pd.DataFrame) -> pd.DataFrame:
        ks = _ray.get(keys_ref)
        probe = batch["c_custkey"].to_numpy()
        pos = np.searchsorted(ks, probe)
        pos = np.minimum(pos, len(ks) - 1)
        hit = ks[pos] == probe
        return batch[~hit]

    return cust.map_batches(anti, batch_format="pandas")


def customers_with_urgent_orders(sf_dir: str) -> rd.Dataset:
    """Broadcast SEMI-join (the anti-join's complement): keep customers whose
    key appears in the filtered fact-table FK set. Same broadcast shape —
    distinct keys ship once, customers stream a sorted-probe filter."""
    import ray as _ray

    orders = read_table(sf_dir, "orders", ["o_custkey", "o_orderpriority"])

    def urgent_keys(batch: pd.DataFrame) -> pd.DataFrame:
        k = batch.loc[batch["o_orderpriority"] == "1-URGENT", ["o_custkey"]]
        return k.drop_duplicates()

    keys = (
        orders.map_batches(urgent_keys, batch_format="pandas")
        .to_pandas()["o_custkey"]
        .unique()
    )
    keys_ref = _ray.put(np.sort(keys))
    cust = read_table(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"])

    def semi(batch: pd.DataFrame) -> pd.DataFrame:
        ks = _ray.get(keys_ref)
        probe = batch["c_custkey"].to_numpy()
        pos = np.minimum(np.searchsorted(ks, probe), len(ks) - 1)
        return batch[ks[pos] == probe]

    return cust.map_batches(semi, batch_format="pandas")


def sample_orders_systematic(sf_dir: str, modulus: int = 10, residue: int = 3) -> rd.Dataset:
    """Deterministic systematic sample: keep rows whose key falls in a fixed
    residue class — reproducible across runs/partitionings (the seedable
    sample a pipeline needs when `random_shuffle` nondeterminism would break
    resume or oracle comparison). A vectorized filter; no shuffle."""
    ds = read_table(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    def pick(batch: pa.Table) -> pa.Table:
        k = batch.column("o_orderkey").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(k % modulus == residue))

    return ds.map_batches(pick, batch_format="pyarrow")


def value_quantiles(sf_dir: str, qs: tuple = (25, 50, 75, 90)) -> pd.DataFrame:
    """Exact per-group quantiles at 100-TB scale WITHOUT a global sort: event
    values are 2-decimal, so a per-(group, cents) counting histogram is a
    lossless sufficient statistic. Per-batch partial histograms combine in a
    small groupby, then each group's quantile reads off the cumulative count
    (percentile_disc semantics: the first value whose cumulative share
    reaches q). Shuffle volume = distinct (type, cents) pairs, not rows."""
    ds = read_table(sf_dir, "events", ["event_type", "value"])

    def partial_hist(batch: pd.DataFrame) -> pd.DataFrame:
        cents = (batch["value"] * 100).round().astype(np.int64)
        g = (
            pd.DataFrame({"event_type": batch["event_type"], "cents": cents})
            .groupby(["event_type", "cents"], as_index=False)
            .size()
        )
        return g.rename(columns={"size": "n"})

    hist = (
        ds.map_batches(partial_hist, batch_format="pandas")
        .to_pandas()
        .groupby(["event_type", "cents"], as_index=False)["n"]
        .sum()
        .sort_values(["event_type", "cents"])
    )
    rows = []
    for et, g in hist.groupby("event_type"):
        cum = g["n"].cumsum().to_numpy()
        total = int(cum[-1])
        vals = g["cents"].to_numpy()
        for q in qs:
            # percentile_disc: smallest value with cum >= ceil(q/100 * total)
            target = -(-q * total // 100)
            idx = int(np.searchsorted(cum, target))
            rows.append({"event_type": et, "q": int(q), "cents": int(vals[idx])})
    return (
        pd.DataFrame(rows)
        .astype({"q": np.int64, "cents": np.int64})
        .sort_values(["event_type", "q"])
        .reset_index(drop=True)
    )


def rolling_daily_value(sf_dir: str, window: int = 7) -> pd.DataFrame:
    """Sliding-window aggregate: per event type, the trailing-7-row window
    over its daily value sums (integer cents — hash-stable). The daily
    pre-aggregation is the heavy distributed step (combiner pattern); the
    rolling pass runs per type over at most #days rows."""
    ds = read_table(sf_dir, "events", ["ts", "event_type", "value"])

    def daily(batch: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame(
            {
                "day": batch["ts"].dt.strftime("%Y-%m-%d"),
                "event_type": batch["event_type"],
                "cents": (batch["value"] * 100).round().astype(np.int64),
            }
        )
        return d.groupby(["event_type", "day"], as_index=False)["cents"].sum()

    per_day = (
        ds.map_batches(daily, batch_format="pandas")
        .to_pandas()
        .groupby(["event_type", "day"], as_index=False)["cents"]
        .sum()
        .sort_values(["event_type", "day"])
    )
    out = per_day.rename(columns={"cents": "day_cents"}).reset_index(drop=True)
    roll = out.groupby("event_type")["day_cents"]
    out["win_cents"] = roll.transform(
        lambda s: s.rolling(window, min_periods=1).sum()
    ).astype(np.int64)
    out["win_days"] = roll.transform(
        lambda s: s.rolling(window, min_periods=1).count()
    ).astype(np.int64)
    return out.sort_values(["event_type", "day"]).reset_index(drop=True)


def top_orders_per_nation(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """Per-group top-k (windowed rank): the k most expensive orders per
    customer nation. Combiner pattern — every batch reduces to at most
    (groups-in-batch × k) rows BEFORE the shuffle, then one vectorized
    rank per hash partition; the full table never sorts globally and no
    group materializes whole (the row_number() window analog at scale).

    customer scales with SF: under ``DIM_BROADCAST_LIMIT`` it broadcasts as
    a custkey→nation dict; above it the per-batch combiner keeps top-k per
    CUSTKEY (a superset of the nation top-k — an order in a nation's top-k
    is necessarily in its own customer's top-k) and the bounded partials
    co-partition with the customer dim to pick up nations, then a final
    per-nation rank. Paths proven equal in tests/test_dim_join_paths.py."""
    import ray as _ray

    from bibexpy_ray.stages.shuffle import hash_partition_apply

    cust_ds = read_table(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    ds = read_table(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    n_parts = 16

    def final_topk(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values(["nation", "cents", "o_orderkey"],
                                ascending=[True, False, True])
        part = part.groupby("nation", as_index=False).head(k)
        part["rank"] = part.groupby("nation").cumcount() + 1
        return part[["nation", "rank", "o_orderkey", "cents"]].astype(np.int64)

    if int(cust_ds.count()) <= DIM_BROADCAST_LIMIT:
        cust = cust_ds.to_pandas()
        # sorted-array broadcast (custkey + nationkey int64 pairs) — the
        # uid-sorted searchsorted convention, ~10× cheaper to ship than a
        # Python dict of the same size
        ckeys = cust["c_custkey"].to_numpy(dtype=np.int64)
        corder = np.argsort(ckeys)
        ckeys = ckeys[corder]
        cnat = cust["c_nationkey"].to_numpy(dtype=np.int64)[corder]
        nat_ref = _ray.put((ckeys, cnat))

        def partial_topk(batch: pd.DataFrame) -> pd.DataFrame:
            ck, cn = _ray.get(nat_ref)
            o = batch["o_custkey"].to_numpy(dtype=np.int64)
            i = np.minimum(np.searchsorted(ck, o), len(ck) - 1)
            ok = ck[i] == o  # unknown custkeys drop (dict .map raised/NaN)
            out = pd.DataFrame(
                {
                    "nation": cn[i[ok]],
                    "o_orderkey": batch["o_orderkey"].to_numpy(dtype=np.int64)[ok],
                    "cents": (batch["o_totalprice"].to_numpy()[ok] * 100)
                    .round()
                    .astype(np.int64),
                }
            )
            # per-batch combine: keep k best per group (desc cents, asc key)
            out = out.sort_values(["nation", "cents", "o_orderkey"],
                                  ascending=[True, False, True])
            out = out.groupby("nation", as_index=False).head(k)
            out["_part"] = (out["nation"].to_numpy() % n_parts).astype(np.int32)
            return out

        out = hash_partition_apply(
            ds.map_batches(partial_topk, batch_format="pandas"), n_parts, final_topk
        ).to_pandas()
    else:  # pragma: no cover - exercised via a forced gate in tests
        def partial_by_cust(batch: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame(
                {
                    "c_custkey": batch["o_custkey"].astype(np.int64),
                    "o_orderkey": batch["o_orderkey"].astype(np.int64),
                    "cents": (batch["o_totalprice"] * 100).round().astype(np.int64),
                }
            )
            out = out.sort_values(["c_custkey", "cents", "o_orderkey"],
                                  ascending=[True, False, True])
            return out.groupby("c_custkey", as_index=False).head(k)

        def nation_partial(part: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame(
                {c: pd.Series([], dtype=np.int64) for c in ("nation", "o_orderkey", "cents")}
            )
            if "_dim" not in part.columns or "o_orderkey" not in part.columns:
                return empty  # one-sided partition: no joined rows
            is_dim = part["_dim"].notna()
            dim = part.loc[is_dim, ["c_custkey", "c_nationkey"]]
            probe = part.loc[~is_dim, ["c_custkey", "o_orderkey", "cents"]]
            if len(dim) == 0 or len(probe) == 0:
                return empty
            m = probe.merge(dim, on="c_custkey", how="inner")
            m = pd.DataFrame(
                {
                    "nation": m["c_nationkey"].astype(np.int64),
                    "o_orderkey": m["o_orderkey"].astype(np.int64),
                    "cents": m["cents"].astype(np.int64),
                }
            )
            m = m.sort_values(["nation", "cents", "o_orderkey"],
                              ascending=[True, False, True])
            return m.groupby("nation", as_index=False).head(k)

        # bounded partials (≤ partitions × nations × k rows) collect, then
        # one driver-side final rank — same shape as the broadcast path
        partials = _copartition_dim(
            ds.map_batches(partial_by_cust, batch_format="pandas"),
            cust_ds,
            "c_custkey",
            ["c_nationkey"],
            nation_partial,
            empty_like=nation_partial(pd.DataFrame()),
        ).to_pandas()
        out = final_topk(partials)

    return out.sort_values(["nation", "rank"]).reset_index(drop=True)


def union_filtered(sf_dir: str) -> rd.Dataset:
    """Set op: union of two filtered streams (schema-union analog,
    smart_merger.py:719; duplicates preserved like SQL UNION ALL)."""
    ds = read_table(sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_totalprice"])

    def urgent(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch.column("o_orderpriority"), "1-URGENT"))

    def big(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater(batch.column("o_totalprice"), 200000.0))

    return ds.map_batches(urgent, batch_format="pyarrow").union(
        ds.map_batches(big, batch_format="pyarrow")
    )


def coalesce_fill(sf_dir: str) -> pd.DataFrame:
    """Priority-ordered fill with provenance (extract_metadata first-non-blank
    analog, api_utils.py:973-1172): impute negative account balances with the
    per-nation floor-average of non-negative ones; `imputed` records provenance.

    Integer-cent arithmetic + floor division keep the fill value bit-identical
    to the SQL oracle. The per-nation stats are a tiny broadcast side table.
    """
    cust = read_table(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ok = batch[batch["c_acctbal"] >= 0]
        g = pd.DataFrame(
            {
                "c_nationkey": ok["c_nationkey"].astype(np.int64),
                "s": cents(ok["c_acctbal"].to_numpy()),
            }
        )
        return g.groupby("c_nationkey", as_index=False).agg(s=("s", "sum"), c=("s", "size"))

    stats = (
        cust.map_batches(partial, batch_format="pandas")
        .to_pandas()
        .groupby("c_nationkey", as_index=False)
        .agg(s=("s", "sum"), c=("c", "sum"))
    )
    fill = {int(k): int(s) // int(c) for k, s, c in zip(stats["c_nationkey"], stats["s"], stats["c"])}
    ref = ray.put(fill)

    def apply_fill(batch: pd.DataFrame) -> pd.DataFrame:
        lookup = ray.get(ref)
        own = cents(batch["c_acctbal"].to_numpy())
        neg = batch["c_acctbal"].to_numpy() < 0
        filled = own.copy()
        if neg.any():
            # vectorized Series.map over the negative subset only; a nation
            # with no non-negative rows keeps the row's own value
            mapped = batch["c_nationkey"].loc[neg].map(lookup).to_numpy()
            miss = pd.isna(mapped)
            filled[neg] = np.where(miss, own[neg], mapped).astype(np.int64)
        return pd.DataFrame(
            {
                "c_custkey": batch["c_custkey"].astype(np.int64),
                "acctbal_cents": filled,
                "imputed": neg,
            }
        )

    out = cust.map_batches(apply_fill, batch_format="pandas").to_pandas()
    return out.sort_values("c_custkey").reset_index(drop=True)
