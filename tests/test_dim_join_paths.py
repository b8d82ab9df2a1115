"""Dimension-join dual paths: the co-partition hash-join fallback (forced by
a zeroed DIM_BROADCAST_LIMIT) must equal the broadcast-dict default —
customer/part scale with SF, so the broadcast side is cap-gated like every
other broadcast in this repo."""

import pandas as pd

import bibexpy_ray.pipelines.relational as rel

SF_DIR = "/root/testdata/sf0.001"


def _both(monkeypatch, fn):
    base = fn(SF_DIR)
    monkeypatch.setattr(rel, "DIM_BROADCAST_LIMIT", 0)
    forced = fn(SF_DIR)
    monkeypatch.setattr(rel, "DIM_BROADCAST_LIMIT", 5_000_000)
    return base, forced


def test_revenue_by_nation_paths_equal(monkeypatch, ray_session):
    base, forced = _both(monkeypatch, rel.revenue_by_nation)
    pd.testing.assert_frame_equal(base, forced)
    assert len(base) > 0


def test_brand_revenue_paths_equal(monkeypatch, ray_session):
    base, forced = _both(monkeypatch, rel.brand_revenue)
    pd.testing.assert_frame_equal(base, forced)
    assert len(base) > 0


def test_top_orders_per_nation_paths_equal(monkeypatch, ray_session):
    base, forced = _both(monkeypatch, rel.top_orders_per_nation)
    pd.testing.assert_frame_equal(base, forced)
    assert len(base) > 0
