"""Suffix-array containment pass: unit + integration tests."""

import numpy as np
import pandas as pd
import pytest

from bibexpy_ray.config import DedupConfig
from bibexpy_ray.stages.substring import (
    _suffix_array,
    containment_candidates,
    containment_pairs_partition,
)


def test_suffix_array_matches_naive():
    rng = np.random.default_rng(7)
    for _ in range(20):
        n = int(rng.integers(2, 60))
        s = rng.integers(0, 5, size=n).astype(np.uint8)
        sa = _suffix_array(s)
        b = bytes(s)
        naive = sorted(range(n), key=lambda i: b[i:])
        assert list(sa) == naive


def _part(ids, texts):
    return pd.DataFrame({"image_id": ids, "_norm_caption": texts})


def test_containment_partition_basic():
    cfg = DedupConfig()
    base = "a quick brown fox jumps over the lazy dog tonight"
    part = _part(
        ["a", "b", "c", "d"],
        [
            base,
            "prefix words here " + base,          # contains base mid/end
            base + " plus a suffix tail",          # contains base at start
            "completely different caption text here",
        ],
    )
    out = containment_pairs_partition(part, cfg)
    pairs = set(zip(out["id_a"], out["id_b"]))
    assert ("a", "b") in pairs
    assert ("a", "c") in pairs
    assert all("d" not in p for p in pairs)


def test_containment_partition_min_chars():
    cfg = DedupConfig()
    part = _part(["a", "b"], ["short", "short and longer text but short is tiny"])
    out = containment_pairs_partition(part, cfg)
    assert len(out) == 0  # below contained_min_chars floor


def test_containment_candidates_dataset():
    """Mid-string insertion containment — missed by prefix/suffix blocks,
    caught by the suffix-array pass through the rare-token partitioning."""
    import ray.data as rd

    cfg = DedupConfig()
    base = "zebra quantum fjord glyph vortex nimbus krypton"
    rows = [
        {"image_id": "x1", "_norm_caption": base},
        {"image_id": "x2", "_norm_caption": "intro words " + base + " outro words"},
        {"image_id": "x3", "_norm_caption": "unrelated caption about something else entirely"},
        {"image_id": "x4", "_norm_caption": "another distinct caption with its own words"},
    ]
    ds = rd.from_items(rows)
    out = containment_candidates(ds, cfg).to_pandas()
    pairs = set(zip(out["id_a"], out["id_b"]))
    assert ("x1", "x2") in pairs
