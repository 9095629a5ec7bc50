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


def test_profile_partials_count_nulls_and_uniques():
    import pyarrow as pa

    batch = pa.table(
        {
            "event_type": pa.array(["a", None, "b", "a", None]),
            "user_id": pa.array([1, 2, 2, None, 3], pa.int64()),
            "value": pa.array([1.0, 1.0, None, 2.5, 2.5], pa.float64()),
        }
    )
    st = P._stats_partial(batch)
    assert st.column("event_type__nulls").to_pylist() == [2]
    assert st.column("event_type__min").to_pylist() == ["a"]
    assert st.column("event_type__max").to_pylist() == ["b"]
    assert st.column("value_cents__nulls").to_pylist() == [1]
    d = P._distinct_partial(batch).to_pydict()
    pairs = set(zip(d["col"], d["val"]))
    assert ("event_type", "a") in pairs and ("user_id", "3") in pairs
    assert ("value_cents", "100") in pairs and ("value_cents", "250") in pairs
    assert len([c for c in d["col"] if c == "event_type"]) == 2


def test_table_profile_null_heavy_end_to_end(ray_session, tmp_path):
    """Distributed profile over a null-bearing table — all-null value
    batches must survive the shared distinct exchange (typed col arrays)
    and the stats reduce, matching DuckDB."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "event_type": pa.array(["a", None, "b", "a"] * 50),
            "user_id": pa.array([1, None, 2, 3] * 50, pa.int64()),
            "value": pa.array([None, None, None, None] * 50, pa.float64()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = P.table_profile(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet')"
    )
    ot = con.sql(P.TABLE_PROFILE_SQL).df()
    assert out.reset_index(drop=True).equals(ot.reset_index(drop=True))
