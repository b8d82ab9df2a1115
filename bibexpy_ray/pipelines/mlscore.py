"""Stateful model-scoring stage: train-small, broadcast, score-at-scale.

The reference's ML enrichment trains TF-IDF + classifier on the non-missing
subset then predicts the missing rows (/root/reference/packages/bibex_core/
modules/ml_utils.py:104-222); the canonical Ray shape is: fit a small model on
a driver-side sample, broadcast it via ``ray.put``, score the full stream in
an actor pool whose ``__init__`` pulls the model once per actor.

No sklearn in this container, so the model is a numpy hashed bag-of-words
TF-IDF + nearest-centroid classifier — small, deterministic, and exercising
the exact same Ray plumbing a real model would.
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
