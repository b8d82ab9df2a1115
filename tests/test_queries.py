"""Query-surface regression tests: every oracle-checked queries() entry must
match its DuckDB oracle_sql() at sf0.001, plus unit checks for the rows-only
operators (LSH recall vs exact, fingerprint determinism, language-ID)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(result, rd.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def entrymod():
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__

    return __ray_entry__


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def _oracle_names() -> list[str]:
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__

    return sorted(__ray_entry__.oracle_sql())


#: every oracle entry is parity-tested — the list is derived so a new
#: oracle_sql() row can never silently miss coverage
ORACLE_QUERIES = _oracle_names()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(entrymod, con, name):
    mine = _canon(_to_pandas(entrymod.queries()[name](SF_DIR)))
    oracle = _canon(con.execute(entrymod.oracle_sql()[name]).df())
    assert list(mine.columns) == list(oracle.columns)
    assert len(mine) == len(oracle)
    pd.testing.assert_frame_equal(mine, oracle, check_dtype=False)


def test_oracle_keys_subset_of_queries(entrymod):
    assert set(entrymod.oracle_sql()) <= set(entrymod.queries())


def test_partial_topk_matches_global_sort():
    """The per-block partial + driver merge must equal a global sort+limit
    (including the descending-with-tie-break case) on a multi-block input."""
    import ray.data as rd

    from bibexpy_ray.pipelines.relational import partial_topk

    rng = np.random.default_rng(7)
    n = 5000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 400, n),  # duplicates exercise the tie-break
            "id": np.arange(n, dtype=np.int64),
        }
    )
    ds = rd.from_pandas(df).repartition(13)
    got = partial_topk(ds, ["k", "id"], ascending=[False, True], k=25)
    want = (
        df.sort_values(["k", "id"], ascending=[False, True])
        .head(25)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    # k larger than some blocks (and than the dataset) stays correct
    got_all = partial_topk(ds, ["k", "id"], ascending=[True, True], k=n + 10)
    want_all = df.sort_values(["k", "id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got_all, want_all)


def test_health_score_weighted_arithmetic(entrymod):
    """health_bp must equal the integer-exact weighted fill-rate mean derived
    from quality_stats (weights 3/2/1 — quality.py:59-106 analog)."""
    from bibexpy_ray.pipelines.relational import (
        HEALTH_WEIGHTS,
        health_score,
        quality_stats,
    )

    hs = health_score(SF_DIR)
    stats = quality_stats(SF_DIR)
    total = int(stats["n_filled"].iloc[0] + stats["n_missing"].iloc[0])
    num = sum(
        int(r["n_filled"]) * HEALTH_WEIGHTS[r["column_name"]]
        for _, r in stats.iterrows()
    )
    wsum = sum(HEALTH_WEIGHTS.values())
    assert hs.shape == (1, 4)
    assert int(hs["total_records"].iloc[0]) == total
    assert int(hs["weighted_filled"].iloc[0]) == num
    assert int(hs["weights_sum"].iloc[0]) == wsum
    assert int(hs["health_bp"].iloc[0]) == (10000 * num) // (total * wsum)
    # the weighted score must differ from the unweighted mean when fill
    # rates differ per field (otherwise the weights are dead code); at
    # minimum it is bounded by the extreme per-field rates
    rates_bp = [
        (10000 * int(r["n_filled"])) // total for _, r in stats.iterrows()
    ]
    assert min(rates_bp) <= int(hs["health_bp"].iloc[0]) <= max(rates_bp)


def test_splitmix64_sql_parity_edge_values():
    """The chained-CTE SQL splitmix64 must be bit-identical to the numpy
    kernel, including values ≥ 2⁶³ (where signed casts would corrupt)."""
    from bibexpy_ray.functions import hashing

    vals = np.array(
        [0, 1, 2**31, 2**32 - 1, 2**53 + 1, 2**63 - 1, 2**63, 2**64 - 1],
        dtype=np.uint64,
    )
    want = [int(v) for v in hashing.splitmix64(vals)]
    frag, final = hashing.splitmix64_sql_ctes("src", "x", "h", ["i"], "t")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE src AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, CAST({int(v)} AS UBIGINT))" for i, v in enumerate(vals))
        + ") AS t(i, x)"
    )
    got = con.execute(
        f"WITH {frag} SELECT h FROM {final} ORDER BY i"
    ).df()["h"].tolist()
    assert [int(g) for g in got] == want
    # and the signed reinterpretation helper matches np.view(int64)
    signed = con.execute(
        "SELECT "
        + ", ".join(
            hashing.ubigint_as_bigint_sql(f"CAST({int(v)} AS UBIGINT)")
            for v in vals
        )
    ).fetchone()
    assert list(signed) == [int(v) for v in vals.view(np.int64)]


def test_embedding_lsh_recall(entrymod):
    from bibexpy_ray.pipelines.ann import embedding_neardup_lsh, embedding_neardup_pairs

    exact = embedding_neardup_pairs(SF_DIR)
    approx = embedding_neardup_lsh(SF_DIR)
    exact_set = set(zip(exact["id_a"], exact["id_b"]))
    approx_set = set(zip(approx["id_a"], approx["id_b"]))
    assert approx_set <= exact_set  # no false positives: same verify threshold
    if exact_set:
        recall = len(approx_set & exact_set) / len(exact_set)
        assert recall >= 0.8, f"LSH recall {recall:.2f}"


def test_ann_ivf_recall(entrymod):
    """IVF top-k recall vs exact cosine top-k at the defaults (the synthetic
    embeddings are isotropic — the hardest case for IVF — measured 0.9 at
    nprobe=20/32; assert with slack for k-means seed drift), reading only
    probed partitions, same output schema as the exact variant."""
    from bibexpy_ray.pipelines.ann import ann_topk, ann_topk_ivf

    exact = ann_topk(SF_DIR)
    ivf = ann_topk_ivf(SF_DIR)
    assert list(ivf.columns) == list(exact.columns)
    ex = {(q, n) for q, n in zip(exact["query_id"], exact["neighbor_id"])}
    iv = {(q, n) for q, n in zip(ivf["query_id"], ivf["neighbor_id"])}
    recall = len(ex & iv) / len(ex)
    assert recall >= 0.85, f"IVF recall {recall:.2f}"
    # determinism: a rebuilt run returns the identical table
    pd.testing.assert_frame_equal(ivf, ann_topk_ivf(SF_DIR))


def test_fingerprint_deterministic(entrymod):
    from bibexpy_ray.pipelines.textstats import fingerprint

    a = _to_pandas(fingerprint(SF_DIR)).sort_values("doc_id").reset_index(drop=True)
    b = _to_pandas(fingerprint(SF_DIR)).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert (a["n_fp"] > 0).all()


def test_lang_id_heuristic():
    from bibexpy_ray.pipelines.textstats import LangIdStage

    batch = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "the cat sat on the mat and the dog",
                "der hund und die katze sind bei der tür",
                "zzz qqq xxx",
            ],
        }
    )
    out = LangIdStage()(batch)
    assert list(out["pred_lang"]) == ["en", "de", "und"]


def test_minhash_clusters_cover_all_docs(entrymod):
    from bibexpy_ray.pipelines.docdedup import minhash_clusters, neardup_pairs_char5

    clusters = minhash_clusters(SF_DIR)
    docs = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchone()[0]
    assert len(clusters) == docs
    assert clusters["doc_id"].is_unique
    # every verified near-dup pair lands in one cluster
    pairs = neardup_pairs_char5(SF_DIR)
    cmap = dict(zip(clusters["doc_id"], clusters["cluster_id"]))
    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        assert cmap[a] == cmap[b]


def test_simhash_pairs_align_with_jaccard(entrymod):
    """SimHash pairs at Hamming<=6 should essentially be the high-Jaccard pairs."""
    from bibexpy_ray.pipelines.docdedup import neardup_pairs_char5, simhash_pairs

    sim = simhash_pairs(SF_DIR)
    jac = neardup_pairs_char5(SF_DIR)
    sim_set = set(zip(sim["id_a"], sim["id_b"]))
    jac_set = set(zip(jac["id_a"], jac["id_b"]))
    if jac_set:
        overlap = len(sim_set & jac_set) / len(jac_set)
        assert overlap >= 0.8, f"simhash/jaccard agreement {overlap:.2f}"


def test_image_decode_stats_phash_consistent(entrymod):
    out = _to_pandas(entrymod.queries()["image_decode_stats"](SF_DIR))
    assert len(out) > 0
    assert bool(out["phash_ok"].all())
    assert (out["w"] == 64).all() and (out["h"] == 64).all()


def test_asof_cogroup_matches_broadcast(entrymod):
    """The cogrouped (100-TB) as-of join path must equal the broadcast path."""
    from bibexpy_ray.pipelines.temporal import (
        asof_join_cogroup,
        asof_join_events_orders,
    )

    a = asof_join_events_orders(SF_DIR)
    b = asof_join_cogroup(SF_DIR)
    pd.testing.assert_frame_equal(a, b)


def test_composite_dedup_merges_and_flags(tmp_path, entrymod):
    """Crafted composite-key duplicates: punctuation/whitespace variants of the
    same text+lang must collapse; provenance joins sorted distinct sources and
    the DB flag flips to BIBEXPY only for multi-source groups; per-field value
    = first non-null in doc_id order (merge_values semantics)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "doc_id": [3, 1, 2, 10, 11],
            "text": [
                "Deep, Learning: a survey!",   # variant of the same title...
                "Deep Learning   a survey",    # ...all clean to one key
                "deep learning a survey",      # case differs -> DIFFERENT key
                "other paper",
                "other; paper",
            ],
            "lang": ["en", "en", "en", "fr", "fr"],
            "source": ["scopus", "wos", "wos", "wos", "wos"],
            "n_chars": pa.array([25, None, 22, 11, 12], type=pa.int64()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    out = (
        _to_pandas(entrymod.queries()["composite_dedup"](str(tmp_path)))
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [1, 2, 10]
    m = out.set_index("doc_id")
    # multi-source group: sorted distinct provenance, BIBEXPY flag,
    # first non-null n_chars in doc_id order (doc 1's is null -> doc 3's 25)
    assert m.loc[1, "n_copies"] == 2
    assert m.loc[1, "db_original"] == "scopus; wos"
    assert m.loc[1, "db"] == "BIBEXPY"
    assert m.loc[1, "n_chars"] == 25
    # case-sensitive key keeps doc 2 separate (reference keeps case)
    assert m.loc[2, "n_copies"] == 1 and m.loc[2, "db"] == "wos"
    # single-source two-copy group: provenance stays the plain source
    assert m.loc[10, "n_copies"] == 2
    assert m.loc[10, "db_original"] == "wos" and m.loc[10, "db"] == "wos"
    assert m.loc[10, "n_chars"] == 11


def test_keyword_tagger_multilabel(entrymod):
    """Multilabel tagger: threshold-gated '; '-joined labels in class order,
    None when nothing clears; per-doc label count consistent."""
    out = _to_pandas(entrymod.queries()["keyword_tagger"](SF_DIR))
    assert len(out) == 500
    nn = out[out["pred_labels"].notna()]
    assert len(nn) > 0
    for _, row in nn.head(20).iterrows():
        labels = row["pred_labels"].split("; ")
        assert len(labels) == row["n_labels"]
        assert labels == sorted(labels)  # class order is sorted
    assert (out.loc[out["pred_labels"].isna(), "n_labels"] == 0).all()


def test_multilabel_training_recovers_own_labels():
    """A centroid trained on clearly-separated label vocabularies must tag a
    training-like text with its own label."""
    import ray

    from bibexpy_ray.pipelines.mlscore import (
        MultiLabelScorer,
        train_multilabel,
    )

    texts = ["apple banana cherry"] * 5 + ["delta echo foxtrot"] * 5
    labels = [["fruit"]] * 5 + [["nato"]] * 5
    model = train_multilabel(texts, labels)
    scorer = MultiLabelScorer.__new__(MultiLabelScorer)
    scorer.centroids, scorer.classes = model
    import numpy as np

    scorer.classes_arr = np.array(scorer.classes, dtype=object)
    scorer.threshold = 0.3
    out = scorer(
        pd.DataFrame({"doc_id": [1, 2], "text": ["apple cherry", "echo foxtrot"]})
    )
    assert out["pred_labels"].tolist() == ["fruit", "nato"]


def test_composite_dedup_null_text_and_null_nchars(tmp_path, entrymod):
    """Nulls must not crash the reducer and must match the oracle: null text
    keys as '' (coalesce), an all-null n_chars group yields NULL."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "doc_id": [1, 2, 3],
            "text": [None, "", "real text"],
            "lang": ["en", "en", "en"],
            "source": ["wos", "scopus", "wos"],
            "n_chars": pa.array([None, None, 9], type=pa.int64()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    out = (
        _to_pandas(entrymod.queries()["composite_dedup"](str(tmp_path)))
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # null text and blank text share the '' + lang key (1 group of 2)
    assert out["doc_id"].tolist() == [1, 3]
    m = out.set_index("doc_id")
    assert m.loc[1, "n_copies"] == 2 and m.loc[1, "db"] == "BIBEXPY"
    assert pd.isna(m.loc[1, "n_chars"])  # all-null group stays NULL
    assert m.loc[3, "n_chars"] == 9
    # the oracle groups identically
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    oracle = con.execute(entrymod.oracle_sql()["composite_dedup"]).df()
    assert sorted(oracle["doc_id"]) == [1, 3]
    assert pd.isna(oracle.set_index("doc_id").loc[1, "n_chars"])


def test_hll_estimate_within_tolerance(entrymod):
    """The HLL sketch estimate must land within 5% of the exact distinct
    count per event type (4096 registers → ~1.6% standard error)."""
    exact = _to_pandas(entrymod.queries()["distinct_users"](SF_DIR)).set_index(
        "event_type"
    )
    est = _to_pandas(entrymod.queries()["hll_distinct_users"](SF_DIR)).set_index(
        "event_type"
    )
    assert sorted(exact.index) == sorted(est.index)
    for et in exact.index:
        e, a = int(exact.loc[et, "n_users"]), int(est.loc[et, "n_users_est"])
        assert abs(a - e) <= max(2, int(0.05 * e)), (et, e, a)


def test_hll_registers_merge_associative():
    import numpy as np

    from bibexpy_ray.functions import hashing
    from bibexpy_ray.pipelines.relational import _hll_registers, hll_estimate

    h = hashing.splitmix64(np.arange(10_000, dtype=np.uint64))
    whole = _hll_registers(h)
    merged = np.maximum(_hll_registers(h[:3000]), _hll_registers(h[3000:]))
    assert (whole == merged).all()  # partials merge losslessly by max
    est = hll_estimate(whole)
    assert abs(est - 10_000) / 10_000 < 0.05


def test_asof_cogroup_tie_at_equal_timestamp(tmp_path, ray_session):
    """A probe at EXACTLY a build's timestamp must match it (at-or-before),
    and among equal-ts builds the max orderkey wins — the tie semantics the
    broadcast path and DuckDB ASOF both implement."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bibexpy_ray.pipelines.temporal import (
        asof_join_cogroup,
        asof_join_events_orders,
    )

    t0 = pd.Timestamp("2024-03-01")
    pq.write_table(
        pa.table(
            {
                "o_orderkey": [100, 101, 50],
                "o_custkey": [1, 1, 2],
                "o_orderdate": pa.array(
                    [t0, t0, t0 - pd.Timedelta(days=3)], type=pa.timestamp("us")
                ),
            }
        ),
        tmp_path / "orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "event_id": [5, 6, 7],
                "user_id": [1, 2, 2],
                "ts": pa.array(
                    [t0, t0 - pd.Timedelta(days=5), t0], type=pa.timestamp("us")
                ),
            }
        ),
        tmp_path / "events.parquet",
    )
    out = asof_join_cogroup(str(tmp_path)).set_index("event_id")
    # event 5 at exactly t0 matches the max-orderkey order at t0
    assert out.loc[5, "o_orderkey"] == 101
    # event 6 precedes customer 2's only order -> no match
    assert 6 not in out.index
    assert out.loc[7, "o_orderkey"] == 50
    # broadcast path agrees
    b = asof_join_events_orders(str(tmp_path)).set_index("event_id")
    pd.testing.assert_frame_equal(out.sort_index(), b.sort_index())


def test_tfidf_matches_sklearn_semantics():
    """Vocabulary, smooth idf and l2 norm must follow sklearn defaults
    (hand-computed on a toy corpus)."""
    from bibexpy_ray.pipelines.mlscore import TfidfModel

    docs = ["apple banana apple", "banana cherry", "apple cherry cherry dates"]
    m = TfidfModel()
    X = m.fit_transform(docs)
    assert sorted(m.vocab) == ["apple", "banana", "cherry", "dates"]
    n = 3
    import math

    def idf(df_):
        return math.log((1 + n) / (1 + df_)) + 1.0

    want_idf = {"apple": idf(2), "banana": idf(2), "cherry": idf(2), "dates": idf(1)}
    for t, j in m.vocab.items():
        assert abs(m.idf[j] - want_idf[t]) < 1e-12
    # row 0: apple x2, banana x1, l2-normalized
    v = np.zeros(4)
    v[m.vocab["apple"]] = 2 * want_idf["apple"]
    v[m.vocab["banana"]] = 1 * want_idf["banana"]
    v /= np.linalg.norm(v)
    assert np.allclose(X[0], v)
    # max_features keeps the corpus-frequency top terms
    m2 = TfidfModel(max_features=2)
    m2.fit(docs)
    assert sorted(m2.vocab) == ["apple", "cherry"]  # tf 3 each; banana/dates drop


def test_random_forest_recovers_separable_labels():
    from bibexpy_ray.pipelines.mlscore import RandomForest

    rng = np.random.default_rng(5)
    X = rng.normal(size=(200, 10))
    y = (X[:, 3] > 0.2).astype(np.float64)
    rf = RandomForest(n_estimators=12, seed=7).fit(X, y)
    p = rf.predict_proba(X)
    assert ((p >= 0.5) == y.astype(bool)).mean() > 0.95
    # deterministic given the seed
    p2 = RandomForest(n_estimators=12, seed=7).fit(X, y).predict_proba(X)
    assert np.array_equal(p, p2)


def test_keyword_tagger_rf_multilabel(entrymod):
    """TF-IDF + forest tagger: same output contract as the centroid path;
    the training rows must largely recover their own (lang, length) labels."""
    out = _to_pandas(entrymod.queries()["keyword_tagger_rf"](SF_DIR))
    assert list(out.columns) == ["doc_id", "pred_labels", "n_labels"]
    assert len(out) == 500
    import pyarrow.parquet as pq

    docs = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "lang"]
    ).to_pandas()
    merged = out.merge(docs, on="doc_id")
    has_lang = merged["pred_labels"].fillna("").str.split("; ").apply(set)
    recov = np.mean([
        l in s for l, s in zip(merged["lang"].astype(str), has_lang)
    ])
    assert recov > 0.6, f"lang-label recovery too low: {recov:.2f}"
