"""Extension surface (SURVEY §2.14): callable merge policies, register_policy,
pluggable survivor rank — plain Python callables shipped into map_batches."""

import pandas as pd
import pyarrow as pa
import ray.data as rd

from bibexpy_ray.functions.fieldmerge import (
    available_policies,
    merge_record,
    register_policy,
)
from bibexpy_ray.stages.survivor import survivors_partition


ROWS = [
    {"image_id": "b", "caption": "short", "fmt": "jpeg"},
    {"image_id": "a", "caption": "a much longer caption", "fmt": "png"},
]


def test_callable_policy_ships_in_dict():
    merged, _ = merge_record(ROWS, policies={"caption": lambda vs: "|".join(sorted(v for v in vs if v))})
    assert merged["caption"] == "a much longer caption|short"


def test_register_policy_by_name():
    register_policy("shortest_wins", lambda vs: min((v for v in vs if v), key=len, default=""))
    merged, _ = merge_record(ROWS, policies={"caption": "shortest_wins"})
    assert merged["caption"] == "short"
    assert "shortest_wins" in available_policies()["value"]
    try:
        register_policy("bad", 42)
        raise AssertionError("expected TypeError")
    except TypeError:
        pass


def test_callable_policy_distributed(ray_session):
    # the callable rides the task closure — no worker-side registry needed
    from bibexpy_ray.stages.shuffle import hash_partition_apply

    ds = rd.from_arrow(
        pa.table(
            {
                "cluster_id": ["c1", "c1", "c2", "c2"],
                "image_id": ["a", "b", "c", "d"],
                "caption": ["xx", "yyy", "z", "wwww"],
            }
        )
    )
    pol = {"caption": lambda vs: max((v for v in vs if v), key=len, default="")}

    def merge_part(part: pd.DataFrame) -> pd.DataFrame:
        out = []
        for cid, g in part.groupby("cluster_id"):
            m, _ = merge_record(
                g.drop(columns=["cluster_id"]).to_dict("records"), policies=pol
            )
            m["cluster_id"] = cid
            out.append(m)
        return pd.DataFrame(out, columns=["image_id", "caption", "cluster_id"])

    got = (
        hash_partition_apply(
            ds, 2, merge_part,
            key_fn=lambda t: (pa.compute.binary_length(t.column("cluster_id")).to_numpy() * 0),
        )
        .to_pandas()
        .set_index("cluster_id")["caption"]
        .to_dict()
    )
    assert got == {"c1": "yyy", "c2": "wwww"}


def test_custom_survivor_rank():
    part = pd.DataFrame(
        {
            "cluster_id": ["c", "c", "c"],
            "image_id": ["i1", "i2", "i3"],
            "fmt": ["png", "jpeg", "jpeg"],
            "caption": ["aa", "bbbb", "c"],
        }
    )
    # default rank: png wins
    assert survivors_partition(part)["survivor_id"].iloc[0] == "i1"
    # custom rank: longest caption wins
    longest = survivors_partition(
        part, rank_fn=lambda p: pd.DataFrame({"r": -p["caption"].str.len()}, index=p.index)
    )
    assert longest["survivor_id"].iloc[0] == "i2"
    # members/size invariant under the rank function
    assert longest["cluster_size"].iloc[0] == 3
    assert longest["members"].iloc[0] == "i1|i2|i3"
