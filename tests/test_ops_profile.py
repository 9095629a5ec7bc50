"""Table-profiling operator vs its DuckDB twin at sf0.001."""

import duckdb
import pytest

from nifi_processors_ray.ops import profile as P

SF_DIR = "/root/testdata/sf0.001"


def test_table_profile_matches_oracle(ray_session):
    out = P.table_profile(SF_DIR).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_DIR}/events.parquet')")
    ot = con.sql(P.TABLE_PROFILE_SQL).df()
    assert out.reset_index(drop=True).equals(ot.reset_index(drop=True))


def test_table_profile_counts_nulls(ray_session):
    import pyarrow as pa
    import ray.data

    ds = ray.data.from_arrow(
        pa.table({"event_type": pa.array(["a", None, "b", "a", None])})
    )
    st = P._col_stats(ds, "event_type", "event_type")
    assert int(st["n_nulls"]) == 2
    assert st["min_val"] == "a" and st["max_val"] == "b"
    assert P._col_distinct(ds, "event_type", "event_type") == 2
