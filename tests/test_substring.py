"""Token-aligned suffix-sort containment pass: unit + integration tests."""

import pandas as pd
import pytest

from bibexpy_ray.config import DedupConfig
from bibexpy_ray.stages.substring import (
    containment_candidates,
    containment_pairs_bucket,
    containment_pairs_partition,
)


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


def test_containment_bucket_matches_bruteforce():
    """Bucket result == brute-force containment over captions sharing the token."""
    import itertools
    import random

    cfg = DedupConfig()
    rng = random.Random(3)
    words = ["alpha", "beta", "gamma", "delta", "omega", "zeta", "theta", "iota"]
    token = "sharedtok"
    texts, ids = [], []
    for i in range(40):
        base = " ".join(rng.choices(words, k=rng.randint(4, 9)))
        pos = rng.randint(0, 1)
        t = f"{token} {base}" if pos else f"{base} {token}"
        if rng.random() < 0.4 and texts:
            # embed an existing caption to force containment
            t = texts[rng.randrange(len(texts))] + " " + " ".join(rng.choices(words, k=2))
        texts.append(t)
        ids.append(f"r{i:03d}")
    # keep only captions containing the token and unique
    keep = [(i, t) for i, t in zip(ids, texts) if token in t]
    seen = set()
    ids2, texts2 = [], []
    for i, t in keep:
        if t in seen:
            continue
        seen.add(t)
        ids2.append(i)
        texts2.append(t)
    out = containment_pairs_bucket(ids2, texts2, token, cfg)
    got = set(zip(out["id_a"], out["id_b"]))
    want = set()
    for (ia, ta), (ib, tb) in itertools.combinations(zip(ids2, texts2), 2):
        short, long_ = (ta, tb) if len(ta) <= len(tb) else (tb, ta)
        sid, lid = (ia, ib) if len(ta) <= len(tb) else (ib, ia)
        if (
            len(short) >= cfg.contained_min_chars
            and len(short) < len(long_)
            and short in long_
        ):
            want.add(tuple(sorted((sid, lid))))
    assert got == want


def test_containment_range_cap_reports_drops():
    cfg = DedupConfig()
    token = "anchortok"
    base = f"{token} shared tail of respectable length for matching"
    ids = [f"r{i:03d}" for i in range(30)]
    texts = [f"unique{i} {base} extension{i}" for i in range(29)]
    texts.append(base)  # the pattern contained in all 29 others
    out = containment_pairs_bucket(ids, texts, token, cfg, range_cap=10)
    assert len(out) > 0
    assert (out["dropped"] > 0).any()  # truncation surfaced, not silent


def test_containment_candidates_dataset():
    """Mid-string insertion containment — missed by prefix/suffix blocks,
    caught by the token-aligned pass through the rare-token partitioning."""
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
