"""Tagged-text source/sink round-trip (WoS txt analog)."""

import pandas as pd
import ray.data as rd

from bibexpy_ray.sources.tagged_text import (
    format_records,
    parse_records,
    read_tagged_text,
    write_tagged_text,
)


def test_format_parse_roundtrip_unit():
    df = pd.DataFrame(
        {
            "image_id": ["a", "b"],
            "caption": ["hello world", "multi\nline caption"],
            "fmt": ["png", "jpeg"],
        }
    )
    text = format_records(df)
    back = parse_records(text)
    assert len(back) == 2
    assert back[0]["image_id"] == "a"
    assert back[1]["caption"] == "multi\nline caption"


def test_roundtrip_dataset(tmp_path):
    df = pd.DataFrame(
        {
            "image_id": [f"img_{i:04d}" for i in range(50)],
            "caption": [f"caption number {i} with words" for i in range(50)],
            "fmt": ["png"] * 50,
        }
    )
    ds = rd.from_pandas(df)
    out = str(tmp_path / "tagged")
    write_tagged_text(ds, out)
    back = read_tagged_text(out).to_pandas().sort_values("image_id").reset_index(drop=True)
    assert len(back) == 50
    pd.testing.assert_frame_equal(back[["image_id", "caption", "fmt"]], df)


def test_nulls_skipped():
    df = pd.DataFrame({"a": ["x"], "b": [None], "c": [float("nan")]})
    back = parse_records(format_records(df))
    assert back == [{"a": "x"}]
