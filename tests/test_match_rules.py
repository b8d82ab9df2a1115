"""Ported decision-table tests for the staged matcher — the conformance spec.

Mirrors the reference's unit tests
(/root/reference/apps/api/tests/test_smart_merge.py): differing determinative
ids never match nor enter borderline, even when similarity stages would fire;
equal ids match at Stage 1 regardless of text; one-sided ids fall through to
similarity matching; etc. Here the determinative id is the image authority id,
pHash is the PMID analog, caption JW the title analog, containment the
journal+vol+page analog.
"""

import numpy as np
import pandas as pd
import pytest

from bibexpy_ray.config import DedupConfig
from bibexpy_ray.stages.verify import verify_edges_batch

CFG = DedupConfig()


def edge(
    cap_a="shared caption text for testing purposes",
    cap_b="shared caption text for testing purposes",
    ph_a=100,
    ph_b=100,
    auth_a=None,
    auth_b=None,
):
    return pd.DataFrame(
        {
            "id_a": ["a"],
            "id_b": ["b"],
            "_norm_caption_a": [cap_a],
            "_norm_caption_b": [cap_b],
            "phash_a": [ph_a],
            "phash_b": [ph_b],
            "_authority_a": [auth_a],
            "_authority_b": [auth_b],
        }
    )


def run(df):
    return verify_edges_batch(df, CFG)


def test_negative_rule_rejects_despite_everything():
    # identical captions AND identical phash but conflicting authority ids:
    # no match, no borderline (reference test :52-57, :70-77)
    out = run(edge(auth_a="x1", auth_b="x2"))
    assert len(out) == 0


def test_authority_exact_stage1():
    out = run(edge(cap_a="completely different", cap_b="text entirely", ph_a=1, ph_b=2,
                   auth_a="k", auth_b="k"))
    assert list(out["stage"]) == ["1_authority_exact"]
    assert out["confidence"].iloc[0] == 1.0


def test_one_sided_authority_falls_through():
    # one side carries an id -> falls through to similarity (reference :89-96)
    out = run(edge(auth_a="k", auth_b=None, ph_a=5, ph_b=5))
    assert list(out["stage"]) == ["2_phash_exact"]


def test_phash_exact_stage2():
    out = run(edge(cap_a="unrelated one", cap_b="other caption", ph_a=7, ph_b=7))
    assert list(out["stage"]) == ["2_phash_exact"]
    assert out["confidence"].iloc[0] == 0.99


def test_caption_sim_stage3():
    a = "quick brown fox jumps over lazy dog near river"
    b = a + "x"
    out = run(edge(cap_a=a, cap_b=b, ph_a=0b111, ph_b=0b101))  # hamming 1
    assert list(out["stage"]) == ["3_caption_sim"]
    assert out["confidence"].iloc[0] == 0.95


def test_caption_sim_blocked_by_hamming():
    a = "quick brown fox jumps over lazy dog near river"
    b = a + "x"
    far = int(np.uint64(0xFFFFFFFF00000000).view(np.int64))
    out = run(edge(cap_a=a, cap_b=b, ph_a=0, ph_b=far))
    # JW >= 0.92 but hamming way over tol; JW >= 0.92 also means NOT borderline
    assert len(out) == 0


def test_containment_stage4():
    a = "quick brown fox jumps over lazy dog near river"
    b = a + " with many extra trailing tokens appended here making it longer"
    out = run(edge(cap_a=a, cap_b=b, ph_a=3, ph_b=1))  # hamming 1
    row = out.iloc[0]
    assert row["stage"] in ("3_caption_sim", "4_contained")
    if row["stage"] == "4_contained":
        assert row["confidence"] == 0.90


def test_containment_requires_min_length():
    out = run(edge(cap_a="tiny text here now ok", cap_b="tiny", ph_a=3, ph_b=1))
    assert not (out["stage"] == "4_contained").any()


def test_borderline_band():
    a = "alpha beta gamma delta epsilon zeta eta theta iota"
    b = "alpha beta gamma delta epsilon zeta XXX YYY ZZZZZ"
    from bibexpy_ray.functions.similarity import jaro_winkler

    jw = jaro_winkler(a, b)
    assert 0.80 <= jw < 0.92, f"fixture drifted: jw={jw}"
    far = int(np.uint64(0x0F0F0F0F0F0F0F0F).view(np.int64))
    out = run(edge(cap_a=a, cap_b=b, ph_a=0, ph_b=far))
    assert list(out["stage"]) == ["5_borderline"]
    conf = out["confidence"].iloc[0]
    assert 0.70 <= conf <= 0.85


def test_borderline_confidence_linear():
    from bibexpy_ray.config import borderline_confidence

    assert borderline_confidence(0.80) == 0.70
    assert abs(borderline_confidence(0.92) - 0.85) < 1e-9
    assert borderline_confidence(0.86) == pytest.approx(0.775, abs=1e-3)


def test_negative_blocks_stage4_too():
    # reference :122-135 — DOI conflict blocks even a journal+vol+page match
    a = "quick brown fox jumps over lazy dog near river"
    b = a + " with many extra trailing tokens appended here"
    out = run(edge(cap_a=a, cap_b=b, ph_a=3, ph_b=1, auth_a="p", auth_b="q"))
    assert len(out) == 0


def test_empty_captions_skip_similarity_stages():
    out = run(edge(cap_a="", cap_b="", ph_a=1, ph_b=2))
    assert len(out) == 0
