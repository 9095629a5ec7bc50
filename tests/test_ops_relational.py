"""Relational ops vs DuckDB oracles + join-miss semantics."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest
import ray

from nifi_processors_ray.ops import relational as R

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for v in ["events", "customer", "lineitem"]:
        c.sql(f"CREATE VIEW {v} AS SELECT * FROM read_parquet('{SF_DIR}/{v}.parquet')")
    return c


@pytest.mark.parametrize(
    "fn,sql",
    [
        (R.events_user_enrich, R.EVENTS_USER_ENRICH_SQL),
        (R.lineitem_pricing_summary, R.LINEITEM_PRICING_SQL),
    ],
    ids=["user_enrich", "pricing_summary"],
)
def test_relational_matches_sql(con, fn, sql):
    got = fn(SF_DIR).to_pandas()
    want = con.sql(sql).df()
    a = got[sorted(got.columns)].sort_values(sorted(got.columns)).reset_index(drop=True)
    b = want[sorted(want.columns)].sort_values(sorted(want.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_lookup_left_join_nulls_on_miss():
    dim = pa.table(
        {"k": pa.array([1, 2], pa.int64()), "name": pa.array(["one", "two"])}
    )
    batch = pa.table({"user_id": pa.array([2, 99, 1], pa.int64())})
    out = R._lookup_batch(batch, dim, key="user_id", cols=["name"]).to_pylist()
    assert [r["name"] for r in out] == ["two", None, "one"]
