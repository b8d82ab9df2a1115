"""Stateful model-scoring stage: train-small, broadcast, score-at-scale.

The reference's ML enrichment trains TF-IDF + classifier on the non-missing
subset then predicts the missing rows (/root/reference/packages/bibex_core/
modules/ml_utils.py:104-222); the canonical Ray shape is: fit a small model on
a driver-side sample, broadcast it via ``ray.put``, score the full stream in
an actor pool whose ``__init__`` pulls the model once per actor.

No sklearn in this container, so two from-scratch numpy model families:
a hashed bag-of-words + nearest-centroid classifier (cheap default), and
the fidelity path mirroring the reference's actual stack — vocabulary
TF-IDF with sklearn-default semantics + per-label bootstrap random
forests (``train_multilabel_tfidf`` / ``keyword_tagger_rf``). Both are
small, deterministic, and exercise the exact same Ray plumbing.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from bibexpy_ray.functions import hashing
from bibexpy_ray.pipelines.tables import read_table

DIM = 256  # hashed feature dimension


def featurize(texts: list[str]) -> np.ndarray:
    """Hashed bag-of-words, L2-normalized (float64)."""
    out = np.zeros((len(texts), DIM), dtype=np.float64)
    for i, t in enumerate(texts):
        toks = (t or "").lower().split()
        if not toks:
            continue
        hs = hashing.text_hash_u64(toks) % np.uint64(DIM)
        np.add.at(out[i], hs.astype(np.int64), 1.0)
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return out / norms


def _label_centroids(
    feats: np.ndarray, classes: list[str], member_mask
) -> np.ndarray:
    """Normalized per-class centroids; ``member_mask(c)`` gives each class's
    membership over the rows (shared by the single- and multi-label models)."""
    cents = np.zeros((len(classes), DIM), dtype=np.float64)
    for k, c in enumerate(classes):
        mask = member_mask(c)
        if mask.any():
            cents[k] = feats[mask].mean(axis=0)
    norms = np.linalg.norm(cents, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return cents / norms


def train_centroids(texts: list[str], labels: list[str]) -> tuple[np.ndarray, list[str]]:
    """Nearest-centroid model: per-label mean of normalized feature vectors."""
    feats = featurize(texts)
    classes = sorted(set(labels))
    cents = _label_centroids(
        feats, classes, lambda c: np.array([l == c for l in labels])
    )
    return cents, classes


class CentroidScorer:
    """Actor-pool scorer: model fetched from the object store once per actor
    (the broadcast-model pattern; ml_utils.py row-loop predict scaled up)."""

    def __init__(self, model_ref):
        self.centroids, self.classes = ray.get(model_ref)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        feats = featurize(batch["text"].fillna("").tolist())
        sims = feats @ self.centroids.T
        pred = np.argmax(sims, axis=1)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(dtype=np.int64),
                "pred_source": np.array(self.classes, dtype=object)[pred],
                "score": np.round(sims[np.arange(len(pred)), pred], 6),
            }
        )


# ---------------------------------------------------------------------------
# Multilabel prediction (ml_utils.py:104-222 keyword/subject models)
# ---------------------------------------------------------------------------

PREDICT_THRESHOLD = 0.3  # ml_utils predict_* default


def preprocess_text(text) -> str:
    """ml_utils.preprocess_text parity (ml_utils.py:84-94): lowercase, strip
    non-letters, collapse whitespace, drop stopwords."""
    from bibexpy_ray.pipelines.textstats import STOPWORDS

    if text is None or (isinstance(text, float) and text != text):
        return ""
    s = "".join(c if c.isalpha() or c.isspace() else " " for c in str(text).lower())
    return " ".join(t for t in s.split() if t not in STOPWORDS)


def train_multilabel(
    texts: list[str], label_lists: list[list[str]]
) -> tuple[np.ndarray, list[str]]:
    """Per-label centroid model over preprocessed text (the MultiLabelBinarizer
    + per-label estimator analog): one normalized centroid per distinct label,
    fit from every row carrying that label."""
    feats = featurize([preprocess_text(t) for t in texts])
    classes = sorted({l for ls in label_lists for l in ls if l})
    cents = _label_centroids(
        feats, classes, lambda c: np.array([c in ls for ls in label_lists])
    )
    return cents, classes


class MultiLabelScorer:
    """Actor-pool multilabel tagger: every label whose per-label score clears
    the threshold is emitted, '; '-joined in class order; None when nothing
    clears — exactly ml_utils.predict_keywords' output contract
    (ml_utils.py:146-163)."""

    def __init__(self, model_ref, threshold: float = PREDICT_THRESHOLD):
        self.centroids, self.classes = ray.get(model_ref)
        self.classes_arr = np.array(self.classes, dtype=object)
        self.threshold = float(threshold)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        feats = featurize([preprocess_text(t) for t in batch["text"].tolist()])
        sims = feats @ self.centroids.T
        hits = sims >= self.threshold
        preds = [
            "; ".join(self.classes_arr[row]) if row.any() else None
            for row in hits
        ]
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(dtype=np.int64),
                "pred_labels": preds,
                "n_labels": hits.sum(axis=1).astype(np.int64),
            }
        )


# ---------------------------------------------------------------------------
# TF-IDF + random forest (ml_utils.py:104-222 fidelity path)
#
# The reference trains TfidfVectorizer(max_features=5000) +
# MultiOutputClassifier(RandomForestClassifier(n_estimators=100)) and
# thresholds per-label probabilities at 0.3. No sklearn here, so both are
# reimplemented from scratch in numpy: a vocabulary TF-IDF with sklearn's
# default semantics (token pattern \w\w+, smooth idf ln((1+n)/(1+df))+1,
# l2 norm, max_features by corpus term frequency) and a bootstrap forest
# of depth-capped gini trees with sqrt-feature subsampling. The intended
# per-label contract is kept (labels whose P(pos) clears the threshold,
# '; '-joined in class order, None when nothing clears); the reference's
# predict_* loop actually indexes mlb.classes_ by the CLASS axis of
# predict_proba (ml_utils.py:161-163) — a bug we do not reproduce.
# ---------------------------------------------------------------------------

import re as _re

_TOKEN_RE = _re.compile(r"(?u)\b\w\w+\b")


class TfidfModel:
    """sklearn-default TF-IDF: fit builds the (max_features-capped)
    vocabulary + smooth idf; transform returns dense l2-normalized rows."""

    def __init__(self, max_features: int = 5000):
        self.max_features = max_features
        self.vocab: dict[str, int] = {}
        self.idf: np.ndarray | None = None

    def _counts(self, texts: list[str]) -> list[dict[str, int]]:
        out = []
        for t in texts:
            c: dict[str, int] = {}
            for tok in _TOKEN_RE.findall((t or "").lower()):
                c[tok] = c.get(tok, 0) + 1
            out.append(c)
        return out

    def fit(self, texts: list[str]) -> "TfidfModel":
        counts = self._counts(texts)
        tf: dict[str, int] = {}
        df: dict[str, int] = {}
        for c in counts:
            for tok, n in c.items():
                tf[tok] = tf.get(tok, 0) + n
                df[tok] = df.get(tok, 0) + 1
        # max_features: keep the corpus-frequency top terms (ties by
        # alphabetical order — sklearn's behavior), vocab sorted by term
        terms = sorted(tf, key=lambda t: (-tf[t], t))[: self.max_features]
        self.vocab = {t: i for i, t in enumerate(sorted(terms))}
        n_docs = len(texts)
        self.idf = np.array(
            [
                np.log((1 + n_docs) / (1 + df[t])) + 1.0
                for t in sorted(terms)
            ],
            dtype=np.float64,
        )
        self._fit_counts = counts  # reused by fit_transform
        return self

    def transform(self, texts: list[str], _counts=None) -> np.ndarray:
        counts = _counts if _counts is not None else self._counts(texts)
        X = np.zeros((len(counts), len(self.vocab)), dtype=np.float64)
        for i, c in enumerate(counts):
            for tok, n in c.items():
                j = self.vocab.get(tok)
                if j is not None:
                    X[i, j] = n
        X *= self.idf
        norms = np.linalg.norm(X, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        return X / norms

    def fit_transform(self, texts: list[str]) -> np.ndarray:
        self.fit(texts)
        return self.transform(texts, _counts=self._fit_counts)


def _gini_best_split(Xs: np.ndarray, y: np.ndarray, feat_idx: np.ndarray):
    """Best (feature, threshold) by gini over the sampled features; returns
    (gain, feature, threshold) or None. Vectorized prefix-sum scan per
    feature (no Python loop over candidate thresholds)."""
    n = len(y)
    total_pos = int(y.sum())
    g_parent = 1.0 - ((total_pos / n) ** 2 + ((n - total_pos) / n) ** 2)
    best = None
    for f in feat_idx:
        x = Xs[:, f]
        order = np.argsort(x, kind="mergesort")
        xs, ys = x[order], y[order]
        pos = np.cumsum(ys)
        cnt = np.arange(1, n + 1)
        # valid split points: between distinct adjacent values
        valid = np.flatnonzero(xs[1:] != xs[:-1])
        if valid.size == 0:
            continue
        nl = cnt[valid].astype(np.float64)
        nr = n - nl
        pl = pos[valid].astype(np.float64)
        pr = total_pos - pl
        gl = 1.0 - ((pl / nl) ** 2 + ((nl - pl) / nl) ** 2)
        gr = 1.0 - ((pr / nr) ** 2 + ((nr - pr) / nr) ** 2)
        gain = g_parent - (nl / n) * gl - (nr / n) * gr
        k = int(np.argmax(gain))
        if gain[k] > 1e-12 and (best is None or gain[k] > best[0]):
            thr = (xs[valid[k]] + xs[valid[k] + 1]) / 2.0
            best = (float(gain[k]), int(f), float(thr))
    return best


class _TreeNode:
    __slots__ = ("feature", "threshold", "left", "right", "prob")

    def __init__(self, prob):
        self.feature = -1
        self.threshold = 0.0
        self.left = self.right = None
        self.prob = prob


def _grow_tree(X, y, rng, max_depth, min_leaf, n_feats):
    node = _TreeNode(float(y.mean()) if len(y) else 0.0)
    if len(y) < 2 * min_leaf or max_depth == 0 or y.min() == y.max():
        return node
    feat_idx = rng.choice(X.shape[1], size=min(n_feats, X.shape[1]), replace=False)
    best = _gini_best_split(X, y, feat_idx)
    if best is None:
        return node
    _, f, thr = best
    mask = X[:, f] <= thr
    if mask.sum() < min_leaf or (~mask).sum() < min_leaf:
        return node
    node.feature, node.threshold = f, thr
    node.left = _grow_tree(X[mask], y[mask], rng, max_depth - 1, min_leaf, n_feats)
    node.right = _grow_tree(X[~mask], y[~mask], rng, max_depth - 1, min_leaf, n_feats)
    return node


def _tree_proba(node: _TreeNode, X: np.ndarray) -> np.ndarray:
    out = np.empty(len(X), dtype=np.float64)
    idx = np.arange(len(X))
    stack = [(node, idx)]
    while stack:
        nd, ix = stack.pop()
        if nd.left is None:
            out[ix] = nd.prob
            continue
        mask = X[ix, nd.feature] <= nd.threshold
        stack.append((nd.left, ix[mask]))
        stack.append((nd.right, ix[~mask]))
    return out


class RandomForest:
    """Bootstrap forest of depth-capped gini trees (sqrt-feature
    subsampling); P(pos) = mean of per-tree leaf positive fractions.
    Deterministic given the seed."""

    def __init__(self, n_estimators: int = 16, max_depth: int = 8,
                 min_leaf: int = 1, seed: int = 0):
        self.n_estimators = n_estimators
        self.max_depth = max_depth
        self.min_leaf = min_leaf
        self.seed = seed
        self.trees: list[_TreeNode] = []

    def fit(self, X: np.ndarray, y: np.ndarray) -> "RandomForest":
        rng = np.random.default_rng(self.seed)
        n = len(y)
        n_feats = max(1, int(np.sqrt(X.shape[1])))
        self.trees = []
        for _ in range(self.n_estimators):
            boot = rng.integers(0, n, n)
            self.trees.append(
                _grow_tree(X[boot], y[boot], rng, self.max_depth,
                           self.min_leaf, n_feats)
            )
        return self

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        if not self.trees:
            return np.zeros(len(X), dtype=np.float64)
        return np.mean([_tree_proba(t, X) for t in self.trees], axis=0)


def train_multilabel_tfidf(
    texts: list[str],
    label_lists: list[list[str]],
    max_features: int = 5000,
    n_estimators: int = 16,
) -> tuple[TfidfModel, list["RandomForest"], list[str]]:
    """TF-IDF + one random forest per label (the MultiLabelBinarizer +
    MultiOutputClassifier(RandomForest) analog, ml_utils.py:104-144)."""
    vec = TfidfModel(max_features=max_features)
    X = vec.fit_transform([preprocess_text(t) for t in texts])
    classes = sorted({l for ls in label_lists for l in ls if l})
    forests = []
    for k, c in enumerate(classes):
        y = np.array([c in ls for ls in label_lists], dtype=np.float64)
        forests.append(
            RandomForest(n_estimators=n_estimators, seed=1000 + k).fit(X, y)
        )
    return vec, forests, classes


class TfidfForestScorer:
    """Actor-pool multilabel tagger over the TF-IDF + forest model: every
    label whose P(pos) clears the threshold is emitted, '; '-joined in
    class order; None when nothing clears (predict_keywords' intended
    contract, ml_utils.py:146-163)."""

    def __init__(self, model_ref, threshold: float = PREDICT_THRESHOLD):
        self.vec, self.forests, self.classes = ray.get(model_ref)
        self.classes_arr = np.array(self.classes, dtype=object)
        self.threshold = float(threshold)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        X = self.vec.transform(
            [preprocess_text(t) for t in batch["text"].tolist()]
        )
        probs = np.stack(
            [f.predict_proba(X) for f in self.forests], axis=1
        ) if self.forests else np.zeros((len(X), 0))
        hits = probs >= self.threshold
        preds = [
            "; ".join(self.classes_arr[row]) if row.any() else None
            for row in hits
        ]
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(dtype=np.int64),
                "pred_labels": preds,
                "n_labels": hits.sum(axis=1).astype(np.int64),
            }
        )


def keyword_tagger_rf(sf_dir: str, train_rows: int = 300) -> rd.Dataset:
    """keyword_tagger on the fidelity path: TF-IDF vocabulary features +
    per-label random forests instead of hashed-feature centroids — the
    same train-small / broadcast / actor-pool-score shape."""
    ds = read_table(sf_dir, "documents", ["doc_id", "text", "lang", "n_chars"])
    sample = ds.limit(train_rows).to_pandas()
    labels = [
        [str(lang), f"len_{int(n) // 200}"]
        for lang, n in zip(sample["lang"].fillna(""), sample["n_chars"].fillna(0))
    ]
    model = train_multilabel_tfidf(sample["text"].fillna("").tolist(), labels)
    model_ref = ray.put(model)
    cpus = int(ray.cluster_resources().get("CPU", 4))
    return ds.map_batches(
        TfidfForestScorer,
        fn_constructor_args=(model_ref,),
        batch_format="pandas",
        concurrency=(1, max(2, cpus - 1)),
    )


def keyword_tagger(sf_dir: str, train_rows: int = 300) -> rd.Dataset:
    """Multilabel enrichment query: train per-label centroids on a head
    sample whose label set is {lang, length-bucket} per document, broadcast
    once, tag the full stream in an actor pool (enrich_metadata_ml's
    train-on-known → predict-at-scale shape)."""
    ds = read_table(sf_dir, "documents", ["doc_id", "text", "lang", "n_chars"])
    sample = ds.limit(train_rows).to_pandas()
    labels = [
        [str(lang), f"len_{int(n) // 200}"]
        for lang, n in zip(sample["lang"].fillna(""), sample["n_chars"].fillna(0))
    ]
    model = train_multilabel(sample["text"].fillna("").tolist(), labels)
    model_ref = ray.put(model)
    cpus = int(ray.cluster_resources().get("CPU", 4))
    return ds.map_batches(
        MultiLabelScorer,
        fn_constructor_args=(model_ref,),
        batch_format="pandas",
        concurrency=(1, max(2, cpus - 1)),
    )


def source_classifier(sf_dir: str, train_rows: int = 300) -> rd.Dataset:
    """Train on a head sample (driver-side, small), score the whole table in
    an actor pool. Predicts the `source` label from document text."""
    ds = read_table(sf_dir, "documents", ["doc_id", "text", "source"])
    sample = ds.limit(train_rows).to_pandas()
    model = train_centroids(sample["text"].fillna("").tolist(), sample["source"].tolist())
    model_ref = ray.put(model)
    cpus = int(ray.cluster_resources().get("CPU", 4))
    return ds.map_batches(
        CentroidScorer,
        fn_constructor_args=(model_ref,),
        batch_format="pandas",
        concurrency=(1, max(2, cpus - 1)),
    )
